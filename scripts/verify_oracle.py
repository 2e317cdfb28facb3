"""Pre-flight replica of the driver's t2 correctness gate.

Runs every registered catalog query on Spark and its DuckDB oracle at the
driver's judging scale (sf0.01 by default), comparing row counts, schemas,
and values. Exit code 0 ⇔ all green.

Usage: python scripts/verify_oracle.py [sf_dir] [--only name1,name2,...]
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")  # repo root

from tests.oracle_utils import assert_frames_match, duckdb_conn  # noqa: E402

from traffic_accidents_airflow_kafka_spark.plans import QUERY_REGISTRY  # noqa: E402
from traffic_accidents_airflow_kafka_spark.session import get_spark  # noqa: E402


def main() -> int:
    args = sys.argv[1:]
    only: set[str] | None = None
    if "--only" in args:
        i = args.index("--only")
        only = set(args[i + 1].split(","))
        del args[i : i + 2]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    registry = {
        name: spec
        for name, spec in QUERY_REGISTRY.items()
        if only is None or name in only
    }
    if only is not None and (missing := only - set(registry)):
        print(f"unknown query names: {sorted(missing)}")
        return 1
    spark = get_spark(app_name="verify-oracle")
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb_conn(sf_dir)
    fails: list[tuple[str, str]] = []
    for name, spec in registry.items():
        try:
            pdf = spec.fn(spark, sf_dir).toPandas()
            if spec.oracle is not None:
                assert_frames_match(pdf, con.execute(spec.oracle).df(), name)
                print(f"PASS        {name} ({len(pdf)} rows)")
            else:
                assert len(pdf) >= spec.min_rows, (
                    f"rows {len(pdf)} < min_rows {spec.min_rows}"
                )
                print(f"PASS(rows)  {name} ({len(pdf)} rows)")
        except Exception as exc:  # noqa: BLE001 — report and continue
            fails.append((name, str(exc)[:200]))
            print(f"FAIL        {name}: {str(exc)[:200]}")
    print(f"\n{len(registry) - len(fails)}/{len(registry)} green at {sf_dir}")
    return 1 if fails else 0


if __name__ == "__main__":
    raise SystemExit(main())
