"""Extension queries beyond the reference's operator set: as-of joins,
rollup subtotals, approximate aggregates — the additions a feature/
training-data pipeline reaches for first (flagged as extensions, not
reference behavior)."""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..operators.asof import asof_join
from ..sources.tables import load_table
from .registry import dec_sum, register


@register(
    "asof_enrichment",
    oracle="""
    WITH purchases AS (
      SELECT user_id, ts AS p_ts, value AS p_value
      FROM events WHERE event_type = 'purchase'
    )
    SELECT e.event_type,
           COUNT(*) AS n_events,
           SUM(CASE WHEN p.p_value IS NOT NULL THEN 1 ELSE 0 END) AS n_with_prior,
           CAST(SUM(CAST(COALESCE(p.p_value, 0) AS DECIMAL(18,2))) AS DOUBLE)
             AS sum_prior_value
    FROM events e
    ASOF LEFT JOIN purchases p
      ON e.user_id = p.user_id AND e.ts >= p.p_ts
    GROUP BY e.event_type
    ORDER BY e.event_type
    """,
    doc="As-of (point-in-time) join: enrich every event with the user's "
    "most recent prior-or-equal purchase (operators/asof.py — the "
    "union-and-carry-forward composition: ONE shuffle, no quadratic "
    "range join; the feature-lookup-without-leakage primitive). Oracle: "
    "DuckDB's native ASOF LEFT JOIN.",
)
def asof_enrichment(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("ts").alias("p_ts"), F.col("value").alias("p_value")
    )
    enriched = asof_join(
        events.select("user_id", "ts", "event_type"),
        purchases,
        on=["user_id"],
        left_ts="ts",
        right_ts="p_ts",
    )
    return (
        enriched.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(
                F.when(F.col("asof_p_value").isNotNull(), 1).otherwise(0)
            ).alias("n_with_prior"),
            dec_sum(F.coalesce("asof_p_value", F.lit(0)), "sum_prior_value"),
        )
        .orderBy("event_type")
    )


@register(
    "rollup_status_priority",
    oracle="""
    SELECT COALESCE(o_orderstatus, 'ALL') AS status,
           COALESCE(o_orderpriority, 'ALL') AS priority,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_total
    FROM orders
    GROUP BY ROLLUP(o_orderstatus, o_orderpriority)
    ORDER BY status, priority
    """,
    doc="ROLLUP subtotal hierarchy (status → status×priority → grand "
    "total) — the multi-granularity dashboard read the reference computed "
    "as separate queries, in ONE pass (Catalyst expands grouping sets "
    "into a single shuffle).",
)
def rollup_status_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.rollup("o_orderstatus", "o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_orders"), dec_sum("o_totalprice", "sum_total"))
        .select(
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority"),
            "n_orders",
            "sum_total",
        )
        .orderBy("status", "priority")
    )


@register(
    "approx_aggregates",
    oracle=None,
    doc="Approximate aggregates — the 100 TB substitutes for exact "
    "count-distinct and percentiles: approx_count_distinct (HLL++, fixed "
    "memory vs a full dedup shuffle) and percentile_approx (t-digest-"
    "style sketch, mergeable across partitions). Rows-only: approximation "
    "is engine-specific by construction; the unit test bounds the error "
    "against exact values (tests/test_extensions.py).",
)
def approx_aggregates(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return events.agg(
        F.approx_count_distinct("user_id").alias("approx_users"),
        F.approx_count_distinct("event_id").alias("approx_events"),
        F.percentile_approx("value", 0.5, 10_000).alias("approx_median_value"),
        F.count(F.lit(1)).alias("n_rows"),
    )
