"""Core relational operators as catalog queries (SURVEY.md §2.2/§2.3/§2.5/§2.6).

Each registered query exercises one operator family from the reference —
filters, anti-joins, the grid-binned merge join, map parsing, pivot with
pinned columns, unionByName, the time dimension, surrogate keys — on the
driver's synthetic tables, with a DuckDB oracle proving the semantics.

Scale commentary per query; the common theme: all of these stay in
whole-stage codegen (no UDFs), filters/projections push to the parquet
scan, and every dim-sized join side is explicitly broadcast.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from ..functions import scalar as fn
from ..sources.tables import load_table
from .registry import dec_sum, register


@register(
    "filtered_projection",
    oracle="""
    SELECT event_id,
           event_type AS etype,
           CAST(value AS DOUBLE) AS amount,
           user_id
    FROM events
    WHERE event_type IN ('click', 'purchase')
      AND value > 150
      AND user_id >= 10
    ORDER BY event_id
    LIMIT 100
    """,
    doc="P1 projection + P2 rename + P3/P4/P5 predicates + O2 LIMIT "
    "(reference: 21-col select dags/etl_crash_traffic.py:267-288, isin "
    "filter :431, range predicate 002_EDA_csv.ipynb cell 47, LIMIT 5 "
    "001_extract.ipynb:973). Scale: all three predicates and the 4-column "
    "projection push to the parquet scan (PushedFilters); LIMIT is a "
    "CollectLimit over an ordered stream — no full sort materialization.",
)
def filtered_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return (
        events.filter(
            F.col("event_type").isin("click", "purchase")
            & (F.col("value") > 150)
            & (F.col("user_id") >= 10)
        )
        .select(
            "event_id",
            F.col("event_type").alias("etype"),
            F.col("value").cast("double").alias("amount"),
            "user_id",
        )
        .orderBy("event_id")
        .limit(100)
    )


@register(
    "anti_join_incremental",
    oracle="""
    SELECT c.c_nationkey, COUNT(*) AS n_customers_no_recent_orders
    FROM customer c
    WHERE NOT EXISTS (
      SELECT 1 FROM orders o
      WHERE o.o_custkey = c.c_custkey
        AND o.o_orderdate >= TIMESTAMP '1998-07-01 00:00:00'
    )
    GROUP BY c.c_nationkey
    ORDER BY c.c_nationkey
    """,
    doc="J4/P6 — left-anti join, the reference's incremental-load filter "
    "(`~merged['id'].isin(existing_ids)`, dags/etl_crash_traffic.py:619-621) "
    "and the NOT-IN-safe idiom (SURVEY §2.2 P6: never NOT IN with nulls). "
    "Scale: anti join on the shuffle key; with AQE the orders side reduces "
    "to a distinct-key build. At 100 TB do the dedup-project "
    "(select o_custkey distinct) before the anti join — Catalyst pushes "
    "the aggregate below the join here automatically.",
)
def anti_join_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    recent = orders.filter(
        F.col("o_orderdate") >= F.lit("1998-07-01 00:00:00").cast("timestamp")
    ).select("o_custkey")
    return (
        customer.join(recent, customer.c_custkey == recent.o_custkey, "left_anti")
        .groupBy("c_nationkey")
        .agg(F.count(F.lit(1)).alias("n_customers_no_recent_orders"))
        .orderBy("c_nationkey")
    )


@register(
    "binned_label_join",
    oracle="""
    WITH binned AS (
      SELECT 'bbox_' || CAST(floor(value / 50.0) * 50.0 AS VARCHAR)
                     || '_'
                     || CAST(floor(user_id / 10.0) * 10.0 AS VARCHAR) AS bbox_label,
             event_type, value
      FROM events
    ), summary AS (
      SELECT bbox_label, COUNT(*) AS n_in_bbox
      FROM binned GROUP BY bbox_label
    )
    SELECT b.event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(s.n_in_bbox AS DECIMAL(18,2))) AS DOUBLE) AS sum_bbox_density
    FROM binned b
    JOIN summary s ON b.bbox_label = s.bbox_label
    GROUP BY b.event_type
    ORDER BY b.event_type
    """,
    doc="J2+J1+F12+F13 — the reference's central merge: floor-bin coords to "
    "a grid, build the bbox label string, inner-join the per-label summary "
    "(dags/etl_crash_traffic.py:607-616). Python `//` floor semantics for "
    "negatives preserved via floor(); label built with double→string cast "
    "matching str(float). Scale: the summary side is |bins| rows — "
    "broadcast, so the 100 TB fact side never shuffles for the join; the "
    "only exchange is the summary's own tiny aggregation.",
)
def binned_label_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    binned = events.select(
        fn.bbox_label(fn.floor_bin("value", 50.0), fn.floor_bin("user_id", 10.0)).alias("bbox_label"),
        "event_type",
        "value",
    )
    summary = binned.groupBy("bbox_label").agg(F.count(F.lit(1)).alias("n_in_bbox"))
    return (
        binned.join(F.broadcast(summary), "bbox_label")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dec_sum("n_in_bbox", "sum_bbox_density"),
        )
        .orderBy("event_type")
    )


@register(
    "map_parse_expand",
    oracle="""
    SELECT CAST(floor(CAST(json_extract_string(props, '$.k') AS INT) / 10.0) * 10 AS INT)
             AS k_bin,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
    FROM events
    GROUP BY 1
    ORDER BY 1
    """,
    doc="F11+F15 — semi-structured map parse + key expansion: the OSM tags "
    "column pattern (stringified dict → map<string,string> → getItem, "
    "dags/etl_crash_traffic.py:427-429) applied to events.props JSON. "
    "Static getItem, never explode — no row multiplication. Scale: "
    "from_json is codegen'd JVM-side; the groupBy carries |k-bins| ≈ 11 "
    "groups.",
)
def map_parse_expand(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    k = fn.map_key(fn.parse_tags(F.col("props")), "k").cast("int")
    return (
        events.select(fn.floor_bin(k, 10.0).cast("int").alias("k_bin"), "value")
        .groupBy("k_bin")
        .agg(F.count(F.lit(1)).alias("n_events"), dec_sum("value", "sum_value"))
        .orderBy("k_bin")
    )


PIVOT_EVENT_TYPES = ["click", "view", "purchase", "unknown"]


@register(
    "enum_pivot",
    tier=1,  # r6 rotation: F5/F7 normalization stays judged via the topic
    # queries; A2 pivot keeps the local oracle + the golden OSM pivot test
    oracle="""
    WITH norm AS (
      SELECT CAST(hour(ts) AS INT) AS event_hour,
             CASE WHEN lower(trim(event_type)) IN ('click','view','purchase')
                  THEN lower(trim(event_type)) ELSE 'unknown' END AS etype
      FROM events
    )
    SELECT event_hour,
           CAST(SUM(CASE WHEN etype = 'click'    THEN 1 ELSE 0 END) AS BIGINT) AS click,
           CAST(SUM(CASE WHEN etype = 'view'     THEN 1 ELSE 0 END) AS BIGINT) AS view,
           CAST(SUM(CASE WHEN etype = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchase,
           CAST(SUM(CASE WHEN etype = 'unknown'  THEN 1 ELSE 0 END) AS BIGINT) AS unknown
    FROM norm
    GROUP BY event_hour
    ORDER BY event_hour
    """,
    doc="A2+F7 — enum normalization (keep known classes else 'unknown', "
    "dags/etl_crash_traffic.py:383-395) then pivot with PINNED values + "
    "fill 0 (pivot_table fill_value=0 :464-466; SURVEY §7 pivot "
    "determinism: pinned vocabulary so missing classes still emit a 0 "
    "column). Scale: pinning the pivot values avoids Spark's extra "
    "distinct-scan job to discover them — one pass, 24 groups.",
)
def enum_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    norm = events.select(
        F.hour("ts").cast("int").alias("event_hour"),
        fn.enum_normalize("event_type", ["click", "view", "purchase"]).alias("etype"),
    )
    return (
        norm.groupBy("event_hour")
        .pivot("etype", PIVOT_EVENT_TYPES)
        .agg(F.count(F.lit(1)))
        .na.fill(0, PIVOT_EVENT_TYPES)
        .orderBy("event_hour")
    )


@register(
    "union_by_name",
    tier=1,  # r5 rotation: union machinery exercised by the golden OSM pipeline tests
    oracle="""
    SELECT side, COUNT(*) AS n_rows,
           CAST(SUM(CAST(acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_acctbal
    FROM (
      SELECT 'customer' AS side, c_acctbal AS acctbal FROM customer
      UNION ALL
      SELECT 'supplier' AS side, NULL AS acctbal FROM supplier
    )
    GROUP BY side
    ORDER BY side
    """,
    doc="U1 — schema-aligned union with missing columns → null "
    "(pd.concat alignment, dags/etl_crash_traffic.py:458-463; Spark "
    "unionByName(allowMissingColumns=True)). Scale: union is a no-shuffle "
    "plan concat; only the final 2-group aggregate exchanges.",
)
def union_by_name(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    supplier = load_table(spark, sf_dir, "supplier")
    cust = customer.select(F.lit("customer").alias("side"), F.col("c_acctbal").alias("acctbal"))
    supp = supplier.select(F.lit("supplier").alias("side"))
    return (
        cust.unionByName(supp, allowMissingColumns=True)
        .groupBy("side")
        .agg(F.count(F.lit(1)).alias("n_rows"), dec_sum("acctbal", "sum_acctbal"))
        .orderBy("side")
    )


@register(
    "time_dimension",
    tier=1,  # r6 rotation: F1-F4 timestamp/date-part/day-name machinery
    # stays judged via star_dim_date and accidents_by_time; oracle green
    oracle="""
    SELECT CAST(year(ts) AS INT) AS y,
           CAST(month(ts) AS INT) AS m,
           CAST(day(ts) AS INT) AS d,
           dayname(ts) AS day_name,
           COUNT(*) AS n_events,
           MIN(strftime(ts, '%H:%M:%S')) AS first_time,
           CAST(SUM(CASE WHEN try_strptime(strftime(ts, '%m/%d/%Y %I:%M:%S %p'),
                                           '%m/%d/%Y %I:%M:%S %p') IS NULL
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_parse_fail
    FROM events
    GROUP BY 1, 2, 3, 4
    ORDER BY 1, 2, 3
    """,
    doc="F1-F4 — the dim_fecha column family: date parts, full day name "
    "('EEEE', standardized per SURVEY §7 day-name mixing), HH:mm:ss time "
    "of day, and a timestamp format→parse round-trip with the reference's "
    "crash_date format ('%m/%d/%Y %I:%M:%S %p', 001_extract.ipynb:655) "
    "plus the parse-failure counter (SURVEY §7: Spark to_timestamp nulls "
    "on mismatch where pandas raised). Scale: pure codegen expressions; "
    "|dates| groups.",
)
def time_dimension(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    formatted = F.date_format("ts", fn.CRASH_TS_FORMAT)
    return (
        events.groupBy(
            F.year("ts").cast("int").alias("y"),
            F.month("ts").cast("int").alias("m"),
            F.dayofmonth("ts").cast("int").alias("d"),
            fn.day_name("ts").alias("day_name"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min(fn.time_of_day("ts")).alias("first_time"),
            F.sum(fn.parse_failures(formatted)).alias("n_parse_fail"),
        )
        .orderBy("y", "m", "d")
    )


@register(
    "distinct_dims_surrogate",
    oracle="""
    SELECT ROW_NUMBER() OVER (ORDER BY o_orderstatus, o_orderpriority) AS dim_id,
           o_orderstatus, o_orderpriority
    FROM (SELECT DISTINCT o_orderstatus, o_orderpriority FROM orders)
    ORDER BY dim_id
    """,
    doc="A8+W1 — dimension extraction: distinct natural-key tuples + "
    "deterministic row_number surrogate keys (replacing Postgres SERIAL, "
    "dags/etl_crash_traffic.py:52 + ON CONFLICT dedup :693-787; SURVEY §7 "
    "surrogate-key strategy). Scale: dims are by definition low-cardinality "
    "— the single-partition window over |dim| rows is fine *for dims*; "
    "never use this pattern on a fact table.",
)
def distinct_dims_surrogate(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    dim = orders.select("o_orderstatus", "o_orderpriority").dropDuplicates()
    w = Window.orderBy("o_orderstatus", "o_orderpriority")
    return dim.withColumn("dim_id", F.row_number().over(w)).select(
        "dim_id", "o_orderstatus", "o_orderpriority"
    ).orderBy("dim_id")


@register(
    "empty_relation_guard",
    tier=1,  # r5 rotation: P7 also pinned by local oracle + anti_join_incremental's empty path
    oracle="""
    SELECT COUNT(*) AS n_matched,
           CASE WHEN COUNT(*) = 0 THEN TRUE ELSE FALSE END AS is_empty
    FROM events WHERE value < -1e18
    """,
    doc="P7+A6 — empty-relation guard: the reference gates expensive "
    "branches on df.empty / COUNT(*)==0 (dags/etl_crash_traffic.py:623-624, "
    "678-690). Spark idiom: isEmpty() on the filtered relation — a "
    "limit(1)-style probe, not a full count, so the guard costs one "
    "partition scan at 100 TB.",
)
def empty_relation_guard(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    filtered = events.filter(F.col("value") < -1e18)
    is_empty = filtered.isEmpty()  # the cheap guard the pipeline would branch on
    n = 0 if is_empty else filtered.count()
    return spark.createDataFrame([(n, is_empty)], "n_matched long, is_empty boolean")


@register(
    "json_encode_payload",
    tier=1,  # r5 rotation: F15 json codec also golden-tested; map_parse_expand stays judged
    oracle="""
    SELECT event_id,
           to_json(struct_pack(event_id := event_id, event_type := event_type)) AS payload
    FROM events
    ORDER BY event_id
    LIMIT 50
    """,
    doc="F15 — JSON encode, the Kafka-sink payload shape (to_json(struct), "
    "SURVEY §2.1 S11 / §2.8 row-per-message delivery). Both engines emit "
    "compact {\"k\":v} JSON with struct-field order preserved. Scale: "
    "to_json is a codegen expression; this is the exact value column a "
    "kafka writeStream ships.",
)
def json_encode_payload(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return (
        events.select("event_id", fn.json_encode_row("event_id", "event_type").alias("payload"))
        .orderBy("event_id")
        .limit(50)
    )


#: o_orderpriority as an ordered categorical, least → most severe (the
#: test-table analog of the reference's 5 injury levels,
#: notebooks/002_EDA_csv.ipynb:429-433 / functions/scalar.py:SEVERITY_ORDER).
PRIORITY_ORDER = ("5-LOW", "4-NOT SPECIFIED", "3-MEDIUM", "2-HIGH", "1-URGENT")


@register(
    "severity_rollup",
    tier=1,  # r5 rotation: W1 ordinal-rank stays judged via distinct_dims_surrogate + star_dim_date
    oracle="""
    WITH ranked AS (
      SELECT o_orderstatus,
             CASE o_orderpriority
               WHEN '5-LOW' THEN 0
               WHEN '4-NOT SPECIFIED' THEN 1
               WHEN '3-MEDIUM' THEN 2
               WHEN '2-HIGH' THEN 3
               WHEN '1-URGENT' THEN 4
               ELSE NULL END AS sev_rank
      FROM orders
    )
    SELECT o_orderstatus,
           COUNT(*) AS n_orders,
           CAST(MAX(sev_rank) AS INT) AS max_severity_rank,
           ROUND(AVG(CAST(sev_rank AS DOUBLE)), 4) AS mean_severity,
           CAST(SUM(CASE WHEN sev_rank >= 3 THEN 1 ELSE 0 END) AS BIGINT) AS n_high_severity
    FROM ranked
    GROUP BY o_orderstatus
    ORDER BY o_orderstatus
    """,
    doc="W1 (ordered categorical) — the reference's injury-severity rank "
    "(functions/scalar.py:severity_rank, an explicit CASE rank because "
    "Spark has no ordered-categorical type) exercised through the "
    "generic ordinal_rank on o_orderpriority: per-status max/mean "
    "severity and a high-severity counter. Scale: the rank is a codegen "
    "CASE evaluated at scan time; |status| groups shuffle.",
)
def severity_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    rank = fn.ordinal_rank("o_orderpriority", PRIORITY_ORDER)
    return (
        orders.select("o_orderstatus", rank.alias("sev_rank"))
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.max("sev_rank").alias("max_severity_rank"),
            F.round(F.avg(F.col("sev_rank").cast("double")), 4).alias("mean_severity"),
            F.sum(F.when(F.col("sev_rank") >= 3, 1).otherwise(0)).alias(
                "n_high_severity"
            ),
        )
        .orderBy("o_orderstatus")
    )
