"""The end-to-end pipeline job — the reference's Airflow DAG wiring
(``dags/etl_crash_traffic.py:951-1005``: extract → transform →
api_transform → merge → star load) as driver-side orchestration of one
Spark application.

Task semantics match the scheduler contract the reference relied on
(``max_active_runs=1``, ``retries=1``):

- Every stage persists its output to parquet under ``out_dir`` — the
  task boundary the reference got from Postgres tables/XCom, so a rerun
  (Airflow retry, next daily run) resumes from materialized state
  instead of recomputing.
- Ingest and OSM-summary stages are **memoized** (skip if output
  exists, ``sources/sinks.py:memoized_write`` — the reference's
  ``os.path.exists`` guard).
- The wide-table and fact loads are **key-based upserts**
  (``upsert_append`` — the distributed ``INSERT … ON CONFLICT DO
  NOTHING``): replaying the same input writes zero new rows, so the
  whole job is idempotent end to end.
- Dimensions are rebuilt-and-overwritten each run: they are
  deterministic functions of the wide table (dropDuplicates +
  row_number surrogate keys), so overwrite ≡ ON CONFLICT DO NOTHING
  at a fraction of the bookkeeping.

Scale: each stage is one declarative plan (scan-project ingest,
pivot-with-pinned-vocabulary enrichment, broadcast merge join,
broadcast star joins); the orchestration layer moves no data — it only
sequences actions and records row counts, exactly what an external
scheduler (Airflow, cron) would do around spark-submit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..sources.sinks import memoized_write, upsert_append
from . import ingest, merge, osm
from .star_domain import build_dimensions, build_fact, fk_integrity_report


def run_pipeline(
    spark: SparkSession,
    accidents_csv: str,
    osm_glob: str,
    geocode_lookup: DataFrame,
    out_dir: str,
) -> dict:
    """Run the full DAG; return per-stage row counts + the FK report.

    ``geocode_lookup``: (bbox_label → city/county/state/postcode) — the
    S9 static lookup standing in for the reference's rate-limited
    Nominatim loop (dags/etl_crash_traffic.py:378-381).
    """
    report: dict = {}

    # Task 1-2: extract + transform (CSV → clean typed wide rows).
    clean_path = f"{out_dir}/accidents_clean"
    cleaned = ingest.clean_accidents(ingest.read_accidents_csv(spark, accidents_csv))
    report["ingest_wrote"] = memoized_write(cleaned, clean_path)
    cleaned = spark.read.parquet(clean_path)
    report["ingest_rows"] = cleaned.count()
    report["ingest_parse_failures"] = ingest.parse_failure_count(cleaned)

    # Task 3-4: api_extract/api_transform (OSM raw → enriched summary).
    summary_path = f"{out_dir}/bbox_summary"
    summary = osm.build_bbox_summary(spark, osm_glob, geocode_lookup)
    report["summary_wrote"] = memoized_write(summary, summary_path)
    summary = spark.read.parquet(summary_path)
    report["summary_rows"] = summary.count()

    # Task 5: merge (broadcast inner join) + incremental upsert of the
    # wide table (J4 + S6 — the ON CONFLICT DO NOTHING load).
    final_path = f"{out_dir}/accidents_final"
    merged = merge.merge_accidents(cleaned, summary)
    report["final_new_rows"] = upsert_append(merged, final_path, "id", spark)
    final = spark.read.parquet(final_path)
    report["final_rows"] = final.count()

    # Task 6-7: star schema — dims overwritten (deterministic), fact
    # upserted on the degenerate key.
    dims = build_dimensions(final)
    for name, dim in dims.items():
        dim.write.mode("overwrite").parquet(f"{out_dir}/{name}")
        report[f"{name}_rows"] = spark.read.parquet(f"{out_dir}/{name}").count()
    fact = build_fact(final, dims)
    report["fact_new_rows"] = upsert_append(fact, f"{out_dir}/fact_accidents", "id", spark)
    report["fact_rows"] = spark.read.parquet(f"{out_dir}/fact_accidents").count()

    # The FK-integrity check that replaced Postgres constraints.
    report["fk_violations"] = fk_integrity_report(final, dims)
    return report
