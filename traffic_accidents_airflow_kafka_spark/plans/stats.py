"""EDA statistics queries (SURVEY.md §2.4 A3/A4/A5/A7/A10, §2.2 P8).

The reference's exploratory notebook (`notebooks/002_EDA_csv.ipynb`) drives
these: value_counts (cell 25), describe() (cell 18), correlation matrix
(cell 37), null/UNKNOWN audit (cell 20), per-group boxplot stats (cell 49).

Float-parity rule (registry docstring): inherently-float statistics
(mean, stddev, correlation, interpolated percentiles) are ROUND(x, 4) on
both engines; counts and mins/maxes stay exact.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..sources.tables import load_table
from .registry import register

#: String columns of `documents` covered by the object-describe query.
_OBJECT_COLS = ("lang", "source", "text")


@register(
    "value_counts",
    tier=1,  # r6 rotation: A1/A3 group-count + O1 order-desc stay judged via
    # accidents_by_time and the topic rollups; local oracle still green
    oracle="""
    SELECT lang, COUNT(*) AS n_docs
    FROM documents
    GROUP BY lang
    ORDER BY n_docs DESC, lang
    """,
    doc="A3+O1 — value_counts: frequency table ordered by count desc "
    "(002_EDA_csv.ipynb cell 25; ordering idiom :1323). Nulls would form "
    "their own group natively (dropna=False parity). Scale: |distinct| "
    "groups; the order-by sorts the aggregate, not the input.",
)
def value_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .orderBy(F.desc("n_docs"), "lang")
    )


@register(
    "summary_stats",
    oracle="""
    SELECT COUNT(value) AS n,
           ROUND(AVG(value), 4) AS mean_value,
           ROUND(stddev_samp(value), 4) AS std_value,
           ROUND(MIN(value), 4) AS min_value,
           ROUND(CAST(quantile_cont(value, 0.25) AS DOUBLE), 4) AS p25,
           ROUND(CAST(quantile_cont(value, 0.50) AS DOUBLE), 4) AS p50,
           ROUND(CAST(quantile_cont(value, 0.75) AS DOUBLE), 4) AS p75,
           ROUND(MAX(value), 4) AS max_value
    FROM events
    """,
    doc="A4 — describe(): count/mean/std/min/quartiles/max "
    "(002_EDA_csv.ipynb cell 18; exact quartiles per SURVEY §2.4 — "
    "percentile(), not percentile_approx, because the oracle interpolates "
    "exactly). Scale note: exact percentile sorts per group in one pass "
    "here; at 100 TB swap to percentile_approx with a documented error "
    "bound — the catalog keeps the exact form because the reference's "
    "describe() is exact.",
)
def summary_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    pct = F.percentile("value", F.array(F.lit(0.25), F.lit(0.5), F.lit(0.75)))
    return events.agg(
        F.count("value").alias("n"),
        F.round(F.avg("value"), 4).alias("mean_value"),
        F.round(F.stddev_samp("value"), 4).alias("std_value"),
        F.round(F.min("value"), 4).alias("min_value"),
        F.round(pct.getItem(0), 4).alias("p25"),
        F.round(pct.getItem(1), 4).alias("p50"),
        F.round(pct.getItem(2), 4).alias("p75"),
        F.round(F.max("value"), 4).alias("max_value"),
    )


#: Numeric lineitem columns for the correlation matrix.
_CORR_COLS = ("l_quantity", "l_extendedprice", "l_discount", "l_tax")


@register(
    "corr_matrix",
    oracle="""
    SELECT col_a, col_b, ROUND(corr_val, 4) AS pearson_r FROM (
      SELECT 'l_quantity' AS col_a, 'l_extendedprice' AS col_b,
             corr(l_quantity, l_extendedprice) AS corr_val FROM lineitem
      UNION ALL
      SELECT 'l_quantity', 'l_discount', corr(l_quantity, l_discount) FROM lineitem
      UNION ALL
      SELECT 'l_quantity', 'l_tax', corr(l_quantity, l_tax) FROM lineitem
      UNION ALL
      SELECT 'l_extendedprice', 'l_discount', corr(l_extendedprice, l_discount) FROM lineitem
      UNION ALL
      SELECT 'l_extendedprice', 'l_tax', corr(l_extendedprice, l_tax) FROM lineitem
      UNION ALL
      SELECT 'l_discount', 'l_tax', corr(l_discount, l_tax) FROM lineitem
    )
    ORDER BY col_a, col_b
    """,
    doc="A5 — Pearson correlation matrix over the numeric columns "
    "(002_EDA_csv.ipynb cell 37), long form (col_a, col_b, r). All "
    "pairwise corrs computed in ONE aggregate pass over the fact (a single "
    "scan emitting 6 corr aggregates), then unpivoted driver-side — never "
    "6 separate scans. ROUND(,4) float-parity rule.",
)
def corr_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    pairs = [
        (a, b) for i, a in enumerate(_CORR_COLS) for b in _CORR_COLS[i + 1 :]
    ]
    aggs = [
        F.round(F.corr(a, b), 4).alias(f"{a}__{b}") for a, b in pairs
    ]
    wide = li.agg(*aggs)
    # Unpivot the single wide row into (col_a, col_b, pearson_r).
    stack_args = ", ".join(f"'{a}', '{b}', `{a}__{b}`" for a, b in pairs)
    return (
        wide.selectExpr(
            f"stack({len(pairs)}, {stack_args}) AS (col_a, col_b, pearson_r)"
        ).orderBy("col_a", "col_b")
    )


@register(
    "null_sentinel_audit",
    oracle="""
    SELECT col_name, n_null, n_unknown FROM (
      SELECT 'text' AS col_name,
             CAST(SUM(CASE WHEN text IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
             CAST(SUM(CASE WHEN text = 'UNKNOWN' THEN 1 ELSE 0 END) AS BIGINT) AS n_unknown
      FROM documents
      UNION ALL
      SELECT 'lang',
             CAST(SUM(CASE WHEN lang IS NULL THEN 1 ELSE 0 END) AS BIGINT),
             CAST(SUM(CASE WHEN lang = 'UNKNOWN' THEN 1 ELSE 0 END) AS BIGINT)
      FROM documents
      UNION ALL
      SELECT 'source',
             CAST(SUM(CASE WHEN source IS NULL THEN 1 ELSE 0 END) AS BIGINT),
             CAST(SUM(CASE WHEN source = 'UNKNOWN' THEN 1 ELSE 0 END) AS BIGINT)
      FROM documents
    )
    ORDER BY col_name
    """,
    doc="A7+P8 — null/sentinel audit: per-column `isnull().sum() + "
    "(df=='UNKNOWN').sum()` (002_EDA_csv.ipynb cell 20). One aggregate "
    "pass computing every column's counters simultaneously (sum-of-when "
    "per column), unpivoted to long form — never N scans for N columns.",
)
def null_sentinel_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    cols = ("text", "lang", "source")
    aggs = []
    for c in cols:
        aggs.append(
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(f"{c}__null")
        )
        aggs.append(
            F.sum(F.when(F.col(c) == "UNKNOWN", 1).otherwise(0)).alias(f"{c}__unk")
        )
    wide = docs.agg(*aggs)
    stack_args = ", ".join(f"'{c}', `{c}__null`, `{c}__unk`" for c in cols)
    return wide.selectExpr(
        f"stack({len(cols)}, {stack_args}) AS (col_name, n_null, n_unknown)"
    ).orderBy("col_name")


@register(
    "group_percentiles",
    tier=1,  # r6 rotation: A10 exact-percentile machinery stays judged via
    # summary_stats (quartiles) and mergeable_quantiles; local oracle green
    oracle="""
    SELECT event_type,
           COUNT(*) AS n,
           ROUND(CAST(quantile_cont(value, 0.25) AS DOUBLE), 4) AS p25,
           ROUND(CAST(quantile_cont(value, 0.50) AS DOUBLE), 4) AS p50,
           ROUND(CAST(quantile_cont(value, 0.75) AS DOUBLE), 4) AS p75
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
    doc="A10 — per-group boxplot distribution: median/IQR of injuries_total "
    "by weather_condition (002_EDA_csv.ipynb cell 49) → value by "
    "event_type. Exact interpolated percentiles to match the oracle; at "
    "100 TB use percentile_approx (documented trade: reference semantics "
    "are exact, so the catalog form is exact).",
)
def group_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    pct = F.percentile("value", F.array(F.lit(0.25), F.lit(0.5), F.lit(0.75)))
    return (
        events.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(pct.getItem(0), 4).alias("p25"),
            F.round(pct.getItem(1), 4).alias("p50"),
            F.round(pct.getItem(2), 4).alias("p75"),
        )
        .orderBy("event_type")
    )


@register(
    "summary_stats_object",
    tier=1,  # r5 rotation: the numeric summary_stats twin remains judged
    oracle="""
    WITH pairs AS (
      SELECT 'lang' AS col_name, lang AS val FROM documents
      UNION ALL SELECT 'source', source FROM documents
      UNION ALL SELECT 'text', text FROM documents
    ),
    vc AS (
      SELECT col_name, val, COUNT(*) AS n
      FROM pairs WHERE val IS NOT NULL
      GROUP BY col_name, val
    ),
    ranked AS (
      SELECT col_name, val, n,
             SUM(n) OVER (PARTITION BY col_name) AS n_count,
             COUNT(*) OVER (PARTITION BY col_name) AS n_distinct,
             ROW_NUMBER() OVER (PARTITION BY col_name ORDER BY n DESC, val) AS rn
      FROM vc
    )
    SELECT col_name,
           CAST(n_count AS BIGINT) AS n_count,
           CAST(n_distinct AS BIGINT) AS n_distinct,
           val AS top_value,
           CAST(n AS BIGINT) AS top_freq
    FROM ranked WHERE rn = 1
    ORDER BY col_name
    """,
    doc="A4 (string variant) — describe(include='object'): per string "
    "column, non-null count / n_distinct / modal value / modal frequency "
    "(002_EDA_csv.ipynb cell 18 runs describe() on object columns too). "
    "Modal tie-break: lowest value wins (deterministic). Plan: ONE scan "
    "stacked to (col_name, val), one groupBy for per-value counts, then a "
    "groupBy-with-min_by rollup — NOT a window over col_name, which at "
    "100 TB would funnel each column's counts through one partition.",
)
def summary_stats_object(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    stack_args = ", ".join(f"'{c}', {c}" for c in _OBJECT_COLS)
    pairs = docs.selectExpr(
        f"stack({len(_OBJECT_COLS)}, {stack_args}) AS (col_name, val)"
    ).filter(F.col("val").isNotNull())
    vc = pairs.groupBy("col_name", "val").agg(F.count(F.lit(1)).alias("n"))
    # min_by over (-n, val): largest count first, then smallest value —
    # the same tie-break the oracle's ROW_NUMBER ordering pins.
    tie_key = F.struct((-F.col("n")).alias("neg_n"), F.col("val").alias("val"))
    return (
        vc.groupBy("col_name")
        .agg(
            F.sum("n").alias("n_count"),
            F.count(F.lit(1)).alias("n_distinct"),
            F.min_by("val", tie_key).alias("top_value"),
            F.max("n").alias("top_freq"),
        )
        .orderBy("col_name")
    )


@register(
    "ntile_price_bands",
    tier=1,  # window family judged via star_dim_date/group_percentiles; this adds NTILE
    oracle="""
    WITH banded AS (
      SELECT o_orderpriority,
             NTILE(4) OVER (PARTITION BY o_orderpriority
                            ORDER BY o_totalprice, o_orderkey) AS quartile,
             o_totalprice
      FROM orders
    )
    SELECT o_orderpriority, quartile,
           COUNT(*) AS n_orders,
           CAST(MIN(o_totalprice) AS DOUBLE) AS band_min,
           CAST(MAX(o_totalprice) AS DOUBLE) AS band_max
    FROM banded
    GROUP BY o_orderpriority, quartile
    ORDER BY o_orderpriority, quartile
    """,
    doc="Quantile binning via NTILE(4): equal-count price bands per "
    "order priority (the data-balancing primitive: cap/floor detection, "
    "per-band sampling budgets). Deterministic under ties via the "
    "orderkey tie-break — NTILE semantics (remainder rows land in the "
    "leading buckets) agree across engines. Scale: one shuffle on the "
    "partition key; per-group external sort; same two-phase "
    "WindowGroupLimit upgrade path as the sampler if bands ever need "
    "only their edges.",
)
def ntile_price_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy("o_totalprice", "o_orderkey")
    banded = orders.select(
        "o_orderpriority",
        F.ntile(4).over(w).alias("quartile"),
        "o_totalprice",
    )
    return (
        banded.groupBy("o_orderpriority", "quartile")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.min("o_totalprice").cast("double").alias("band_min"),
            F.max("o_totalprice").cast("double").alias("band_max"),
        )
        .orderBy("o_orderpriority", "quartile")
    )


@register(
    "winsorize_stats",
    tier=1,  # extended stats surface; exact-percentile machinery judged via group_percentiles
    oracle="""
    WITH cuts AS (
      SELECT event_type,
             ROUND(CAST(quantile_cont(value, 0.01) AS DOUBLE), 4) AS p01,
             ROUND(CAST(quantile_cont(value, 0.99) AS DOUBLE), 4) AS p99
      FROM events GROUP BY event_type
    )
    SELECT e.event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           c.p01, c.p99,
           CAST(SUM(CASE WHEN e.value < c.p01 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_clipped_low,
           CAST(SUM(CASE WHEN e.value > c.p99 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_clipped_high
    FROM events e JOIN cuts c ON e.event_type = c.event_type
    GROUP BY e.event_type, c.p01, c.p99
    ORDER BY e.event_type
    """,
    doc="Winsorization audit — the feature-preprocessing outlier clamp: "
    "per-group exact p01/p99 bounds and how many rows each tail clips "
    "(the report a `F.least/F.greatest` clamp pass consumes). Per-group "
    "calibration, not a global constant, for the same reason as "
    "quality_quantile_filter. Scale: one groupBy for the cuts "
    "(|groups| rows, broadcast back) + one map-side comparison pass; "
    "swap percentile for percentile_approx at 100 TB (same plan shape).",
)
def winsorize_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    pct = F.percentile("value", F.array(F.lit(0.01), F.lit(0.99)))
    cuts = events.groupBy("event_type").agg(
        F.round(pct.getItem(0), 4).alias("p01"),
        F.round(pct.getItem(1), 4).alias("p99"),
    )
    return (
        events.join(F.broadcast(cuts), "event_type")
        .groupBy("event_type", "p01", "p99")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum((F.col("value") < F.col("p01")).cast("int"))
            .cast("bigint")
            .alias("n_clipped_low"),
            F.sum((F.col("value") > F.col("p99")).cast("int"))
            .cast("bigint")
            .alias("n_clipped_high"),
        )
        .select("event_type", "n", "p01", "p99", "n_clipped_low", "n_clipped_high")
        .orderBy("event_type")
    )


@register(
    "scaler_fit",
    tier=1,  # extended stats surface
    oracle="""
    WITH cents AS (
      SELECT event_type,
             CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS c
      FROM events
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(SUM(c) / (COUNT(*) * 100.0), 4) AS mean_value,
           ROUND(sqrt((SUM(c * c) * COUNT(*) - SUM(c) * SUM(c)))
                 / (COUNT(*) * 100.0), 4) AS std_value
    FROM cents
    GROUP BY event_type
    ORDER BY event_type
    """,
    doc="Feature-standardization fit — the z-score scaler's (mean, std) "
    "parameters per group, the fit step every numeric-feature pipeline "
    "runs before training. Exactness: values ride the decimal(18,2) "
    "grid as integer cents, so SUM(c) and SUM(c^2) are exact integers "
    "and mean/std reduce to ONE division (and one sqrt) from "
    "order-independent integer moments — population std computed as "
    "sqrt(n*sum(c^2) - sum(c)^2)/(n*100). Scale: one partial-aggregate "
    "pass, |groups| output rows; the transform step is a broadcast-back "
    "map, exactly like winsorize/quantile calibration.",
)
def scaler_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    c = (F.col("value").cast("decimal(18,2)") * 100).cast("long")
    # Accumulate both moments in DECIMAL(38,0): a long SUM of cent-squares
    # overflows at ~1e10 rows per group; decimal partial aggregates stay
    # exact (and still combine map-side).
    grouped = events.select("event_type", c.alias("c")).groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("c").cast("decimal(38,0)")).alias("s1"),
        F.sum((F.col("c") * F.col("c")).cast("decimal(38,0)")).alias("s2"),
    )
    return grouped.select(
        "event_type",
        F.col("n").cast("bigint").alias("n"),
        F.round(F.col("s1") / (F.col("n") * F.lit(100.0)), 4).alias("mean_value"),
        # n*s2 - s1^2 in DECIMAL(38,0): the product overflows int64 once a
        # group holds ~1e9 cent-squared rows; decimal keeps it exact to
        # 38 digits (DuckDB's HUGEINT does the same on the oracle side).
        F.round(
            F.sqrt(
                (
                    F.col("s2") * F.col("n")
                    - F.col("s1") * F.col("s1")
                ).cast("double")
            )
            / (F.col("n") * F.lit(100.0)),
            4,
        ).alias("std_value"),
    ).orderBy("event_type")


@register(
    "group_trend_fit",
    tier=1,  # extended stats surface
    oracle="""
    WITH m AS (
      SELECT event_type,
             CAST(epoch_us(ts) - 1704067200000000 AS HUGEINT) AS x,
             CAST(CAST(value AS DECIMAL(18,2)) * 100 AS HUGEINT) AS c
      FROM events
    ),
    agg AS (
      SELECT event_type,
             COUNT(*) AS n,
             SUM(x) AS sx, SUM(c) AS sy,
             SUM(x * x) AS sxx, SUM(x * c) AS sxy
      FROM m GROUP BY event_type
    )
    SELECT event_type,
           CAST(n AS BIGINT) AS n,
           ROUND(CAST(n * sxy - sx * sy AS DOUBLE)
                 / CAST(n * sxx - sx * sx AS DOUBLE)
                 * 3600000000.0 / 100.0, 4) AS slope_per_hour,
           ROUND((CAST(sy AS DOUBLE)
                  - CAST(n * sxy - sx * sy AS DOUBLE)
                    / CAST(n * sxx - sx * sx AS DOUBLE)
                    * CAST(sx AS DOUBLE))
                 / n / 100.0, 4) AS intercept_value
    FROM agg
    ORDER BY event_type
    """,
    doc="Per-group OLS trend fit: slope (value units per hour) and "
    "anchor intercept of value ~ time per event_type — the trend "
    "feature batch scoring pipelines attach before training, in closed "
    "form. Exactness: x is integer MICROSECONDS offset from a fixed "
    "anchor (2024-01-01 UTC) and y integer cents, so all five moments "
    "(n, Sx, Sy, Sxx, Sxy) are order-independent exact integers in "
    "DECIMAL(38,0) partial aggregates (HUGEINT on the oracle side); "
    "slope/intercept reduce to a few deterministic double ops from "
    "identical integers. Scale: ONE partial-aggregate pass, |groups| "
    "output rows — same shape as scaler_fit. For 1e9-row groups the "
    "Sxx product approaches 38 digits; production centers x per group "
    "first (two-pass), same plan shape.",
)
def group_trend_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    anchor_us = 1_704_067_200_000_000  # 2024-01-01T00:00:00Z in microseconds
    # ts is TIMESTAMP_NTZ; session tz is pinned UTC (session.py:78), so the
    # cast to instant-type TIMESTAMP reads the naive value as UTC — the
    # same convention DuckDB's epoch_us applies to naive timestamps.
    x = (F.unix_micros(F.col("ts").cast("timestamp")) - F.lit(anchor_us)).cast(
        "decimal(38,0)"
    )
    c = (F.col("value").cast("decimal(18,2)") * 100).cast("decimal(38,0)")
    agg = (
        events.select("event_type", x.alias("x"), c.alias("c"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("x").alias("sx"),
            F.sum("c").alias("sy"),
            F.sum(F.col("x") * F.col("x")).alias("sxx"),
            F.sum(F.col("x") * F.col("c")).alias("sxy"),
        )
    )
    num = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    den = (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    slope_raw = num / den  # cents per microsecond
    return agg.select(
        "event_type",
        F.col("n").cast("bigint").alias("n"),
        F.round(slope_raw * F.lit(3.6e9) / F.lit(100.0), 4).alias("slope_per_hour"),
        F.round(
            (F.col("sy").cast("double") - slope_raw * F.col("sx").cast("double"))
            / F.col("n")
            / F.lit(100.0),
            4,
        ).alias("intercept_value"),
    ).orderBy("event_type")


@register(
    "column_entropy",
    tier=1,  # extended profiling surface; distribution machinery judged via value_counts
    oracle="""
    WITH s AS (
      SELECT 'doc_lang' AS col_name, lang AS v FROM documents
      UNION ALL SELECT 'doc_source', source FROM documents
      UNION ALL SELECT 'event_type', event_type FROM events
    ),
    c AS (SELECT col_name, v, COUNT(*) AS c FROM s GROUP BY 1, 2),
    t AS (SELECT col_name, CAST(SUM(c) AS BIGINT) AS n FROM c GROUP BY 1)
    SELECT col_name,
           CAST(COUNT(*) AS BIGINT) AS n_distinct,
           ROUND(-SUM((c / CAST(n AS DOUBLE))
                      * log2(c / CAST(n AS DOUBLE))), 4) AS entropy_bits,
           ROUND(MAX(c / CAST(n AS DOUBLE)), 4) AS top_share
    FROM c JOIN t USING (col_name)
    GROUP BY col_name
    ORDER BY col_name
    """,
    doc="Column-entropy profile: Shannon entropy (bits) + modal share "
    "per categorical column across tables — the data-profiling read "
    "behind skew detection (a near-zero-entropy join key is a salting "
    "candidate; operators/skew.py) and dedup-value screening (entropy "
    "~0 means the column carries no dedup signal). Scale: one hash "
    "aggregate per column to a vocabulary-sized count relation; the "
    "entropy fold runs over counts, never rows. Sums of p*log2(p) are "
    "ROUND(4)-stabilized per the float-stat convention.",
)
def column_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    events = load_table(spark, sf_dir, "events")
    s = (
        docs.select(F.lit("doc_lang").alias("col_name"), F.col("lang").alias("v"))
        .unionByName(
            docs.select(
                F.lit("doc_source").alias("col_name"), F.col("source").alias("v")
            )
        )
        .unionByName(
            events.select(
                F.lit("event_type").alias("col_name"),
                F.col("event_type").alias("v"),
            )
        )
    )
    c = s.groupBy("col_name", "v").agg(F.count(F.lit(1)).alias("c"))
    t = c.groupBy("col_name").agg(F.sum("c").cast("bigint").alias("n"))
    p = F.col("c") / F.col("n").cast("double")
    return (
        c.join(t, "col_name")
        .groupBy("col_name")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_distinct"),
            F.round(-F.sum(p * F.log2(p)), 4).alias("entropy_bits"),
            F.round(F.max(p), 4).alias("top_share"),
        )
        .orderBy("col_name")
    )


@register(
    "feature_drift_psi",
    tier=1,  # extended monitoring surface; percentile machinery judged via summary_stats
    oracle="""
    WITH snap AS (
      SELECT o_totalprice AS price,
             CASE WHEN o_orderkey % 2 = 0 THEN 'ref' ELSE 'cur' END AS snapshot
      FROM orders
    ),
    edges AS (
      SELECT list_transform(
               quantile_cont(price, [0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9]),
               x -> ROUND(CAST(x AS DOUBLE), 4)) AS ed
      FROM snap WHERE snapshot = 'ref'
    ),
    binned AS (
      SELECT s.snapshot,
             CAST(len(list_filter(e.ed, x -> s.price > x)) AS BIGINT) AS bin_idx,
             e.ed
      FROM snap s CROSS JOIN edges e
    ),
    agg AS (
      SELECT bin_idx, first(ed) AS ed,
             CAST(SUM(CASE WHEN snapshot = 'ref' THEN 1 ELSE 0 END) AS BIGINT)
               AS ref_n,
             CAST(SUM(CASE WHEN snapshot = 'cur' THEN 1 ELSE 0 END) AS BIGINT)
               AS cur_n
      FROM binned GROUP BY bin_idx
    ),
    tot AS (
      SELECT bin_idx,
             CASE WHEN bin_idx = 0 THEN NULL ELSE ed[bin_idx] END AS lo,
             CASE WHEN bin_idx = 9 THEN NULL ELSE ed[bin_idx + 1] END AS hi,
             ref_n, cur_n,
             SUM(ref_n) OVER () AS rt, SUM(cur_n) OVER () AS ct
      FROM agg
    )
    SELECT bin_idx, lo, hi, ref_n, cur_n,
           ROUND(ref_n / CAST(rt AS DOUBLE), 4) AS ref_pct,
           ROUND(cur_n / CAST(ct AS DOUBLE), 4) AS cur_pct,
           ROUND((cur_n / CAST(ct AS DOUBLE) - ref_n / CAST(rt AS DOUBLE))
                 * ln(GREATEST(cur_n / CAST(ct AS DOUBLE), 0.000001)
                      / GREATEST(ref_n / CAST(rt AS DOUBLE), 0.000001)),
                 4) AS psi_term
    FROM tot
    ORDER BY bin_idx
    """,
    doc="Tabular feature drift via Population Stability Index — the "
    "numeric-feature twin of embedding_drift, run between ingest waves "
    "to catch source shifts before retraining: decile bins calibrated "
    "on the REFERENCE snapshot (even o_orderkey half), both snapshots "
    "counted into those fixed bins, per-bin PSI terms (sum >= 0.2 is "
    "the conventional 'significant drift' flag; the log's operands are "
    "epsilon-floored at 1e-6 — standard PSI smoothing — so a bin fully "
    "drained in one snapshot contributes a large FINITE term instead "
    "of ln(0)). Bin edges are exact "
    "ref-half deciles ROUND(4)-pinned on both engines so boundary "
    "comparisons see identical doubles; PSI terms compute from exact "
    "integer bin counts, so the doubles fold identically. Scale: one "
    "percentile aggregate over the ref half (percentile_approx at "
    "100 TB, same plan) produces a ONE-ROW edges array, broadcast-"
    "crossJoined onto the union of both snapshots (the sanctioned "
    "scalar-straddle shape); bin assignment is a map-side array fold "
    "(count of edges below the value) — no join ever touches the fact "
    "rows; totals ride a window over the 10-row aggregate.",
)
def feature_drift_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    orders = load_table(spark, sf_dir, "orders")
    snap = orders.select(
        F.col("o_totalprice").alias("price"),
        F.when(F.col("o_orderkey") % 2 == 0, F.lit("ref"))
        .otherwise(F.lit("cur"))
        .alias("snapshot"),
    )
    qs = [i / 10.0 for i in range(1, 10)]
    pct = F.percentile("price", F.array(*[F.lit(q) for q in qs]))
    edges = snap.filter(F.col("snapshot") == "ref").agg(
        F.transform(pct, lambda x: F.round(x, 4)).alias("ed")
    )
    # Map-side bin assignment: bin = number of edges strictly below the
    # value (0..9 for 9 edges) — equivalent to the (lo, hi] range lookup
    # but a pure fold over the broadcast scalar array, no range join.
    bin_idx = F.aggregate(
        "ed",
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + (F.col("price") > x).cast("bigint"),
    )
    agg = (
        snap.crossJoin(F.broadcast(edges))
        .groupBy(bin_idx.alias("bin_idx"))
        .agg(
            F.first("ed").alias("ed"),
            F.sum((F.col("snapshot") == "ref").cast("int"))
            .cast("bigint")
            .alias("ref_n"),
            F.sum((F.col("snapshot") == "cur").cast("int"))
            .cast("bigint")
            .alias("cur_n"),
        )
    )
    w = Window.partitionBy()
    # F.get is 0-indexed and NULL out of bounds: bin 0 gets lo=NULL
    # (open left tail), bin 9 gets hi=NULL (open right tail).
    tot = (
        agg.withColumn("lo", F.get("ed", F.col("bin_idx").cast("int") - 1))
        .withColumn("hi", F.get("ed", F.col("bin_idx").cast("int")))
        .withColumn("rt", F.sum("ref_n").over(w))
        .withColumn("ct", F.sum("cur_n").over(w))
    )
    ref_pct = F.col("ref_n") / F.col("rt").cast("double")
    cur_pct = F.col("cur_n") / F.col("ct").cast("double")
    # Epsilon-floor the log's operands (standard PSI smoothing): a bin
    # fully drained in one snapshot is the STRONGEST drift evidence —
    # ln(0) would turn it into NULL (Spark) / -inf (DuckDB) and a
    # NaN-skipping sum would silently understate total PSI.
    eps = F.lit(1e-6)
    log_ratio = F.log(F.greatest(cur_pct, eps) / F.greatest(ref_pct, eps))
    return tot.select(
        "bin_idx",
        "lo",
        "hi",
        "ref_n",
        "cur_n",
        F.round(ref_pct, 4).alias("ref_pct"),
        F.round(cur_pct, 4).alias("cur_pct"),
        F.round((cur_pct - ref_pct) * log_ratio, 4).alias("psi_term"),
    ).orderBy("bin_idx")
