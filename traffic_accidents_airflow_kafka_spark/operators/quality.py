"""Data-quality constraint auditing — declarative expectations over a
DataFrame, evaluated in ONE aggregate pass.

The reference enforces its contracts through Postgres DDL (NOT NULL, FK,
UNIQUE — dags/etl_crash_traffic.py:50-147) and crashes on violation at
load time. A lakehouse table has no DDL enforcement, so pipelines audit
instead: count violations per named rule and gate/alert on the result
(the Deequ/expectations idiom, rebuilt minimally).

Two shapes, matching what can and cannot be a row predicate:

- :func:`violation_counts` — row-level rules (null, range, enum, regex)
  as named boolean Columns, summed in a single hash-aggregate scan: cost
  is one pass regardless of rule count.
- :func:`duplicate_key_count` — uniqueness needs a groupBy on the key;
  one extra shuffle keyed on the candidate key, counting rows beyond the
  first per key.

Both return counts, not row samples — at 100 TB the audit result must be
O(rules), never O(violations); drill-down queries fetch examples on
demand.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame


def violation_counts(df: DataFrame, checks: dict[str, Column]) -> DataFrame:
    """Count rows violating each named predicate (predicate = TRUE means
    the row VIOLATES the rule). One aggregate pass; output long-form
    (check_name, n_violations) for stable schemas as rules evolve."""
    aggs = [
        F.sum(F.when(pred, 1).otherwise(0)).alias(name)
        for name, pred in checks.items()
    ]
    wide = df.agg(*aggs)
    stack_args = ", ".join(f"'{name}', {name}" for name in checks)
    return wide.selectExpr(
        f"stack({len(checks)}, {stack_args}) AS (check_name, n_violations)"
    )


def duplicate_key_count(df: DataFrame, key_cols: list[str]) -> DataFrame:
    """Rows carrying a non-unique key, as (check_name, n_violations):
    total rows minus distinct keys — the UNIQUE-constraint audit."""
    dup = (
        df.groupBy(*key_cols)
        .agg(F.count(F.lit(1)).alias("n"))
        .agg(F.sum(F.col("n") - 1).alias("n_violations"))
    )
    name = "unique_" + "_".join(key_cols)
    return dup.select(F.lit(name).alias("check_name"), F.coalesce("n_violations", F.lit(0)).alias("n_violations"))
