"""The declared-query catalog: every operator class from SURVEY.md §2,
expressed on the driver's synthetic tables, each paired with a DuckDB
oracle SQL string (the t2 correctness gate).

Numeric-parity rules (so value hashes match the oracle bit-for-bit):

- Money/quantity sums: cast to DECIMAL(18,2) *before* SUM (exact decimal
  arithmetic in both engines), then cast the total to DOUBLE. Float sums are
  order-dependent; decimal sums are not.
- Averages: exact decimal SUM cast to double, divided by COUNT (identical
  doubles → identical quotient) — never engine AVG over floats.
- Inherently-float stats (stddev, corr, percentile): ROUND(x, 4) on both
  sides.
- Every computed column aliased identically in Spark and SQL (the driver
  sorts columns by name before hashing).

Scale notes are attached per query: what shuffles, what broadcasts, and why
the plan survives 100 TB.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..sources.tables import load_table

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None  # DuckDB SQL; None → driver runs rows-only check
    doc: str = ""


QUERY_REGISTRY: dict[str, QuerySpec] = {}


def register(name: str, oracle: str | None, doc: str = ""):
    def deco(fn: QueryFn) -> QueryFn:
        QUERY_REGISTRY[name] = QuerySpec(name=name, fn=fn, oracle=oracle, doc=doc)
        return fn

    return deco


def queries() -> dict[str, QueryFn]:
    return {name: spec.fn for name, spec in QUERY_REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    return {
        name: spec.oracle
        for name, spec in QUERY_REGISTRY.items()
        if spec.oracle is not None
    }


def _dec_sum(col: str | F.Column, alias: str) -> F.Column:
    """Exact decimal SUM surfaced as DOUBLE (see module docstring)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast("decimal(18,2)")).cast("double").alias(alias)


# ---------------------------------------------------------------------------
# A9/A1-style grouped aggregation — the flagship query.
# Reference analogue: the dashboard sum-by-group measures
# (dags/etl_crash_traffic.py fact table measures; Dashboard/dashProyecto02.pdf
# p.1 charts), re-expressed as a TPC-H-Q1-shaped pricing summary.
# ---------------------------------------------------------------------------


@register(
    "pricing_summary",
    oracle="""
    SELECT
      l_returnflag,
      l_linestatus,
      CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
      CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
               * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
        AS sum_disc_price,
      CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
      CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_price,
      COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2000-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
    doc="Grouped sums over the largest fact table (SURVEY §2.4 A9). "
    "Scale: single hash-aggregate with map-side partial aggregation; the "
    "shuffle carries only |groups| ≈ 6 rows per partition. Predicate and "
    "2-column pruning push to the parquet scan.",
)
def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    dec = lambda c: F.col(c).cast("decimal(18,2)")  # noqa: E731
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2000-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            _dec_sum("l_quantity", "sum_qty"),
            _dec_sum("l_extendedprice", "sum_base_price"),
            F.sum(dec("l_extendedprice") * (F.lit(1).cast("decimal(18,2)") - dec("l_discount")))
            .cast("double")
            .alias("sum_disc_price"),
            (F.sum(dec("l_quantity")).cast("double") / F.count(F.lit(1))).alias("avg_qty"),
            (F.sum(dec("l_extendedprice")).cast("double") / F.count(F.lit(1))).alias("avg_price"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )
