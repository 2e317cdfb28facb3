"""Per-query phase profiler (optimization round instrument, guide §1).

For each named catalog query, split one fresh-build run into:
  - build_s:   Python DataFrame construction (analysis happens lazily,
               so this is mostly plan-object building + any driver-side
               work the plan function does eagerly — artifact memos,
               schema reads, streaming drains hide here too)
  - plan_s:    .explain-equivalent cost — force analysis+optimization+
               physical planning via df._jdf.queryExecution().executedPlan()
  - exec_s:    .collect() on the already-planned DataFrame

All phases run in ONE warm session after an untimed warmup, mirroring
bench.py's steady-state shape, so the numbers decompose the bench's
timed region rather than a cold session.

Usage: python scripts/profile_phases.py <query> [<query> ...]
"""

from __future__ import annotations

import gc
import json
import sys
import time

from traffic_accidents_airflow_kafka_spark.plans import QUERY_REGISTRY
from traffic_accidents_airflow_kafka_spark.session import get_spark


def main() -> None:
    import os

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    names = sys.argv[1:]
    spark = get_spark(app_name="profile-phases")
    spark.sparkContext.setLogLevel("ERROR")
    out = {}
    for name in names:
        spec = QUERY_REGISTRY[name]
        spec.fn(spark, sf_dir).collect()  # warmup
        rows = []
        for _ in range(2):
            t0 = time.perf_counter()
            df = spec.fn(spark, sf_dir)
            t1 = time.perf_counter()
            df._jdf.queryExecution().executedPlan()
            t2 = time.perf_counter()
            df.collect()
            t3 = time.perf_counter()
            rows.append(
                {
                    "build_s": round(t1 - t0, 4),
                    "plan_s": round(t2 - t1, 4),
                    "exec_s": round(t3 - t2, 4),
                    "total_s": round(t3 - t0, 4),
                }
            )
            spark.catalog.clearCache()
            gc.collect()
        out[name] = rows
        print(name, json.dumps(rows), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
