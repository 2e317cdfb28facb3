"""Benchmark runner: executes the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) and prints ONE JSON line:

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Per-query time = wall clock of plan + execution to a driver-side count/collect
of the (small) aggregate result. A warmup run of the flagship query absorbs
JVM/codegen startup so numbers reflect steady-state execution.
"""

from __future__ import annotations

import json
import os
import time

from traffic_accidents_airflow_kafka_spark.plans import analytics
from traffic_accidents_airflow_kafka_spark.session import get_spark


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]

    spark = get_spark(app_name="bench")
    spark.sparkContext.setLogLevel("ERROR")

    registry = analytics.QUERY_REGISTRY

    # Warmup: run the flagship once to absorb JVM + codegen startup.
    analytics.pricing_summary(spark, sf_dir).collect()

    timings: dict[str, float] = {}
    for name, spec in registry.items():
        start = time.perf_counter()
        df = spec.fn(spark, sf_dir)
        rows = df.collect()
        timings[name] = round(time.perf_counter() - start, 4)
        del rows

    total = round(sum(timings.values()), 4)
    print(
        json.dumps(
            {
                "metric": "catalog_total_runtime",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "", 1).isdigit() else sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
