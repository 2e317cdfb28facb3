"""Dump .explain('formatted') for named catalog queries to files.

Usage: python scripts/dump_plan.py <outdir> <suffix> <query> [<query> ...]

Writes <outdir>/<query>_<suffix>.txt for each query. Streaming entries
whose plan function RUNS the stream (foreachBatch drains) still produce
a plan for the returned (batch) DataFrame — for those the file carries
the merged-result plan, which is the judgeable artifact the entry
returns.
"""

from __future__ import annotations

import os
import sys

from traffic_accidents_airflow_kafka_spark.plans import QUERY_REGISTRY
from traffic_accidents_airflow_kafka_spark.session import get_spark


def main() -> None:
    outdir, suffix, names = sys.argv[1], sys.argv[2], sys.argv[3:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    os.makedirs(outdir, exist_ok=True)
    spark = get_spark(app_name="dump-plan")
    spark.sparkContext.setLogLevel("ERROR")
    for name in names:
        df = QUERY_REGISTRY[name].fn(spark, sf_dir)
        txt = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(txt)
        print(path, flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
