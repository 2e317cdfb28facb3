"""Domain pipeline: the reference's accident/OSM dataflow, Spark-native.

Stages mirror the Airflow DAG's effective lineage (SURVEY.md §3.1):
ingest (CSV → cleaned accidents) → osm (raw bbox extracts → pivoted
infrastructure summary) → merge (grid-binned broadcast join + incremental
anti-filter) → star (dimensions + fact, operators/star.py).
"""

from . import ingest, merge, osm, overpass, star_domain  # noqa: F401
