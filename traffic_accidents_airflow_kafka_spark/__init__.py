"""PySpark-native analytics engine with the query and data-processing
capabilities of the reference pipeline (nicothinn/Traffic-Accidents-Airflow-Kafka),
re-expressed Spark-first.

Layout
------
- ``session``    : SparkSession factory (AQE, UTC, tuned shuffle partitions).
- ``schemas``    : explicit StructTypes (accidents/OSM/bbox summary,
                   SURVEY.md §1.3).
- ``sources``    : parquet table access (``tables``) and the write path
                   (``sinks``: parquet/CSV, upsert-append, bucketed tables,
                   memoized writes).
- ``functions``  : scalar-expression library F1-F15 (timestamp parse, date
                   parts, enum normalization, map parsing, binning, labels,
                   JSON, severity rank).
- ``operators``  : dedup (exact/Jaccard/MinHash-LSH/SimHash), similarity
                   search (cosine top-k, hyperplane LSH), text analysis,
                   multimodal plumbing, star-schema builders.
- ``pipeline``   : the domain dataflow (CSV ingest → OSM enrichment →
                   merge), golden-file-tested against the reference output.
- ``plans``      : the registered query catalog backing
                   ``__spark_entry__.queries()`` / ``oracle_sql()``.
- ``streaming``  : Structured Streaming surface (file/Kafka sources, window
                   aggregates, availableNow runner, payload contracts).

Everything is built on the public PySpark DataFrame/SQL API; no RDD code and
no row-at-a-time Python UDFs in hot paths.
"""

__version__ = "0.1.0"
