"""OSM enrichment: raw bbox extracts → pivoted infrastructure summary.

Spark-native re-expression of ``transform_bbox_data``
(dags/etl_crash_traffic.py:363-494): tags parse (F11) → fillna 'unknown'
(F9) → category isin filter (P4) → enum normalization (F7) → three
group-counts (A1) → union (U1) → pivot with PINNED columns + fill 0 (A2)
→ geocode lookup join (S9, broadcast).

Where the reference loops file-by-file in pandas, this reads ALL bbox
files in one scan (Spark's CSV source globs; the per-file bbox label is
recovered from ``input_file_name``) — the whole summary is one job.

Geocoding (Nominatim, 1 req/s — dags/etl_crash_traffic.py:377-381) stays
out of the engine per SURVEY §2.1 S9: the lookup table (36 keys) arrives
as a static DataFrame and broadcast-joins on bbox_label, never a per-row
HTTP call.

Scale: counts are map-side partial aggregates over (label, group, value);
the pivot shuffles |bboxes| × 16 cells; the geocode join broadcasts 36
rows. At 1000 executors the only real data motion is the raw scan.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..functions import scalar as fn
from ..schemas import BBOX_COUNT_COLUMNS, OSM_RAW_SCHEMA

#: Categories the pipeline keeps (dags/etl_crash_traffic.py:431).
KEPT_CATEGORIES = ("school", "hospital", "traffic_signals", "crossing")


def read_osm_raw(spark: SparkSession, path_glob: str) -> DataFrame:
    """One scan over every bbox CSV; bbox_label derived from the FILENAME
    (``bbox_35.0_-81.0_osm.csv`` → ``bbox_35.0_-81.0``), matching the
    reference's per-file loop (:401-402) — the in-file bbox_label column
    lacks the prefix and is ignored, as in the reference."""
    raw = (
        spark.read.schema(OSM_RAW_SCHEMA)
        .option("header", "true")
        # RFC-4180 doubled-quote escaping (pandas to_csv convention in the
        # reference's files); Spark's default escape is backslash.
        .option("escape", '"')
        .csv(path_glob)
        .withColumn(
            "file_label",
            F.regexp_replace(
                F.element_at(F.split(F.input_file_name(), "/"), -1),
                "_osm\\.csv$",
                "",
            ),
        )
    )
    return raw.drop("bbox_label").withColumnRenamed("file_label", "bbox_label")


def classified_counts(raw: DataFrame) -> DataFrame:
    """Long-form (bbox_label, group, value, count) — the three grouped
    counts unioned (dags/etl_crash_traffic.py:434-463).

    The reference expands ALL tag keys then fills NaN with 'unknown'
    (:427-430); only the 'traffic_signals' and 'crossing' keys matter for
    counting, so the map-getItem + coalesce('unknown') is semantically
    identical without materializing a column per key.

    Uses :func:`parse_tags_exact` (the Arrow-batched ast.literal_eval
    escape hatch) — the golden-file gate requires parity on tag values
    that embed quote characters, which the native translate+from_json
    path cannot express (SURVEY §2.7).
    """
    tags = fn.parse_tags_exact("tags")
    base = raw.filter(F.col("category").isin(*KEPT_CATEGORIES)).select(
        "bbox_label",
        "category",
        F.coalesce(fn.map_key(tags, "traffic_signals"), F.lit("unknown")).alias("ts_val"),
        F.coalesce(fn.map_key(tags, "crossing"), F.lit("unknown")).alias("cr_val"),
    )
    sh = (
        base.filter(F.col("category").isin("school", "hospital"))
        .groupBy("bbox_label", F.col("category").alias("value"))
        .agg(F.count(F.lit(1)).alias("count"))
        .withColumn("group", F.lit("category"))
    )
    ts = (
        base.filter(F.col("category") == "traffic_signals")
        .groupBy("bbox_label", fn.map_traffic_signal("ts_val").alias("value"))
        .agg(F.count(F.lit(1)).alias("count"))
        .withColumn("group", F.lit("traffic_signals"))
    )
    cr = (
        base.filter(F.col("category") == "crossing")
        .groupBy("bbox_label", fn.map_crossing("cr_val").alias("value"))
        .agg(F.count(F.lit(1)).alias("count"))
        .withColumn("group", F.lit("crossing"))
    )
    return sh.unionByName(ts).unionByName(cr)


def pivot_summary(counts: DataFrame) -> DataFrame:
    """Pivot to one row per bbox with the PINNED 16-column vocabulary
    (SURVEY §7 pivot determinism: the reference's pivot_table emits only
    observed columns then defensively subsets, :488-490; pinning gives the
    full fact-table schema with zeros for missing classes — and skips
    Spark's values-discovery scan)."""
    keyed = counts.withColumn("col_name", F.concat_ws("_", "group", "value"))
    pivoted = (
        keyed.groupBy("bbox_label")
        .pivot("col_name", list(BBOX_COUNT_COLUMNS))
        .agg(F.first("count"))
        .na.fill(0, list(BBOX_COUNT_COLUMNS))
    )
    return pivoted.select(
        "bbox_label", *[F.col(c).cast("int").alias(c) for c in BBOX_COUNT_COLUMNS]
    )


def attach_geocode(
    summary: DataFrame, geocode_lookup: DataFrame
) -> DataFrame:
    """S9 — broadcast left join of the (bbox_label → city/county/state/
    postcode) lookup; misses → 'unknown'/'' per the reference's fillna
    (:471-474)."""
    out = summary.join(F.broadcast(geocode_lookup), "bbox_label", "left")
    return (
        out.withColumn("city", F.coalesce("city", F.lit("unknown")))
        .withColumn("county", F.coalesce("county", F.lit("unknown")))
        .withColumn("state", F.coalesce("state", F.lit("unknown")))
        .withColumn("postcode", F.coalesce("postcode", F.lit("")))
    )


def build_bbox_summary(
    spark: SparkSession, path_glob: str, geocode_lookup: DataFrame
) -> DataFrame:
    """The full OSM enrichment stage (the api_transform task, one plan)."""
    return attach_geocode(pivot_summary(classified_counts(read_osm_raw(spark, path_glob))), geocode_lookup)
