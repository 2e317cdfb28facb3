"""Pre-flight replica of the driver's t2 correctness gate.

Runs every registered catalog query on Spark and its DuckDB oracle at the
driver's judging scale (sf0.01 by default), comparing row counts, schemas,
and values. Exit code 0 ⇔ all green.

Usage: python scripts/verify_oracle.py [sf_dir]
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")  # repo root

from tests.oracle_utils import assert_frames_match, duckdb_conn  # noqa: E402

from traffic_accidents_airflow_kafka_spark.plans import QUERY_REGISTRY  # noqa: E402
from traffic_accidents_airflow_kafka_spark.session import get_spark  # noqa: E402


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark(app_name="verify-oracle")
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb_conn(sf_dir)
    fails: list[tuple[str, str]] = []
    for name, spec in QUERY_REGISTRY.items():
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
    print(f"\n{len(QUERY_REGISTRY) - len(fails)}/{len(QUERY_REGISTRY)} green at {sf_dir}")
    return 1 if fails else 0


if __name__ == "__main__":
    raise SystemExit(main())
