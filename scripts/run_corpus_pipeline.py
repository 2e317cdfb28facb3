"""CLI entry for the end-to-end corpus-curation pipeline — the
spark-submit-able job around pipeline/corpus_job.py (the LLM-data twin
of the reference's Airflow DAG trigger).

Usage:
    python scripts/run_corpus_pipeline.py [sf_dir] [out_dir]
    spark-submit scripts/run_corpus_pipeline.py /data/corpus /data/curated

Defaults: sf_dir=/root/testdata/sf0.01, out_dir=./corpus_out. Rerunning
over the same out_dir is a provable no-op (memoized ingest, keyed
upsert load) — the scheduler-retry contract.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from traffic_accidents_airflow_kafka_spark.pipeline.corpus_job import (  # noqa: E402
    curated_quality_report,
    run_corpus_pipeline,
)
from traffic_accidents_airflow_kafka_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out_dir = sys.argv[2] if len(sys.argv) > 2 else "./corpus_out"
    spark = get_spark(app_name="corpus-pipeline")
    spark.sparkContext.setLogLevel("ERROR")
    report = run_corpus_pipeline(spark, sf_dir, out_dir)
    print(json.dumps(report))
    curated_quality_report(spark, out_dir).show(truncate=False)
    spark.stop()


if __name__ == "__main__":
    main()
