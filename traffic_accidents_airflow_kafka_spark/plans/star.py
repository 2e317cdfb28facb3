"""Star-schema catalog queries (SURVEY.md §2.9 context; reference
dags/etl_crash_traffic.py:50-147/693-885 re-expressed on the synthetic
tables: orders is the fact, its date/priority/customer-geography attributes
become dimensions)."""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..functions import scalar as fn
from ..operators import star
from ..sources.tables import load_table
from .registry import dec_sum, register


@register(
    "star_dim_date",
    oracle="""
    WITH dates AS (SELECT DISTINCT CAST(o_orderdate AS DATE) AS order_date FROM orders)
    SELECT ROW_NUMBER() OVER (ORDER BY order_date) AS date_id,
           strftime(order_date, '%Y-%m-%d') AS order_date,
           CAST(year(order_date) AS INT) AS y,
           CAST(month(order_date) AS INT) AS m,
           CAST(day(order_date) AS INT) AS d,
           dayname(order_date) AS day_name
    FROM dates
    ORDER BY date_id
    """,
    doc="dim_fecha analog (dags/etl_crash_traffic.py:51-58): distinct "
    "dates + deterministic row_number surrogate keys + date parts + full "
    "day name (F2/F3; 'EEEE' standardization per SURVEY §7). Scale: "
    "|dates| rows — the single-partition window is safe only because "
    "dims are low-cardinality by construction (operators/star.py).",
)
def star_dim_date(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").withColumn(
        "order_date", F.col("o_orderdate").cast("date")
    )
    dim = star.build_dimension(orders, ["order_date"], "date_id")
    return dim.select(
        "date_id",
        F.date_format("order_date", "yyyy-MM-dd").alias("order_date"),
        F.year("order_date").cast("int").alias("y"),
        F.month("order_date").cast("int").alias("m"),
        F.dayofmonth("order_date").cast("int").alias("d"),
        fn.day_name("order_date").alias("day_name"),
    ).orderBy("date_id")


@register(
    "star_fact_rollup",
    oracle="""
    WITH dim_priority AS (
      SELECT ROW_NUMBER() OVER (ORDER BY o_orderpriority) AS priority_id, o_orderpriority
      FROM (SELECT DISTINCT o_orderpriority FROM orders)
    ),
    dim_geo AS (
      SELECT ROW_NUMBER() OVER (ORDER BY c_custkey) AS geo_id, c_custkey, n_name
      FROM (SELECT DISTINCT c.c_custkey, n.n_name
            FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey)
    ),
    fact AS (
      SELECT p.priority_id, g.geo_id, g.n_name, p.o_orderpriority, o.o_totalprice
      FROM orders o
      LEFT JOIN dim_priority p ON o.o_orderpriority = p.o_orderpriority
      LEFT JOIN dim_geo g ON o.o_custkey = g.c_custkey
    )
    SELECT n_name, o_orderpriority,
           COUNT(*) AS n_facts,
           CAST(SUM(CASE WHEN priority_id IS NULL OR geo_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_fk_misses,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_total
    FROM fact
    GROUP BY n_name, o_orderpriority
    ORDER BY n_name, o_orderpriority
    """,
    doc="hechos_accidentes analog: fact FK resolution through broadcast "
    "left joins against row_number-keyed dimensions, then a rollup that "
    "also audits FK misses (null surrogate ids — the dict.get-miss "
    "semantics, dags/etl_crash_traffic.py:855-885; n_fk_misses must be 0). "
    "Scale: every dim side broadcast — the fact never shuffles for FK "
    "resolution; the only exchange is the final tiny rollup (J3).",
)
def star_fact_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")

    dim_priority = star.build_dimension(orders, ["o_orderpriority"], "priority_id")
    geo_src = customer.join(
        F.broadcast(nation), customer.c_nationkey == nation.n_nationkey
    ).select("c_custkey", "n_name")
    dim_geo = star.build_dimension(geo_src, ["c_custkey", "n_name"], "geo_id").select(
        "geo_id", "c_custkey", "n_name"
    )

    fact = star.resolve_fk(orders, dim_priority, ["o_orderpriority"], "priority_id")
    fact = fact.join(F.broadcast(dim_geo), fact.o_custkey == dim_geo.c_custkey, "left")
    miss = F.when(F.col("priority_id").isNull() | F.col("geo_id").isNull(), 1).otherwise(0)
    return (
        fact.groupBy("n_name", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_facts"),
            F.sum(miss).alias("n_fk_misses"),
            dec_sum("o_totalprice", "sum_total"),
        )
        .orderBy("n_name", "o_orderpriority")
    )
