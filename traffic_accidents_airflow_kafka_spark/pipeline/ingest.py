"""Accidents CSV ingest + cleaning (SURVEY.md §2.1 S1, §2.6 F1/F2/F5/F8/F9).

Reference path: notebooks/001_extract.ipynb (CSV → parse timestamps →
NaN→None → Postgres) + the EDA notebook's derived columns. One lazy plan:
read with an EXPLICIT schema (inference is the correctness hazard the
reference hit — SURVEY §1.2), parse, derive, done — no per-row loops, no
batching; at 100 TB this is a single scan-project pipeline with zero
shuffles.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..functions import scalar as fn
from ..schemas import ACCIDENTS_RAW_SCHEMA


def read_accidents_csv(spark: SparkSession, path: str, encoding: str = "UTF-8") -> DataFrame:
    """S1 — CSV scan with explicit schema (latin1 fallback via ``encoding``,
    notebooks/prueva.ipynb cell 1)."""
    return (
        spark.read.schema(ACCIDENTS_RAW_SCHEMA)
        .option("header", "true")
        .option("encoding", encoding)
        .option("escape", '"')  # RFC-4180 doubled quotes (pandas convention)
        .csv(path)
    )


def clean_accidents(raw: DataFrame) -> DataFrame:
    """The cleaning pass, all native expressions:

    - F1: crash_date parse ('%m/%d/%Y %I:%M:%S %p') + failure flag
    - F2: date parts (year/month/day) re-derived from the parsed timestamp
    - F3/F4: full day name + HH:mm:ss time-of-day (dim_fecha keys)
    - F8: intersection indicator 0/1
    - F9: UNKNOWN→OTHER for weather/road_defect (README.md:30 rule)
    - severity_rank: the ordered-categorical encoding
    """
    ts = fn.parse_timestamp("crash_date")
    return (
        raw.withColumn("crash_ts", ts)
        .withColumn("crash_parse_failed", fn.parse_failures("crash_date"))
        .withColumn("crash_year", F.year("crash_ts"))
        .withColumn("crash_day", F.dayofmonth("crash_ts"))
        .withColumn("crash_day_name", fn.day_name("crash_ts"))
        .withColumn("crash_time", fn.time_of_day("crash_ts"))
        .withColumn("intersection_flag", fn.binary_indicator("intersection_related"))
        .withColumn("weather_condition", fn.unknown_to_other("weather_condition"))
        .withColumn("road_defect", fn.unknown_to_other("road_defect"))
        .withColumn("severity_rank", fn.severity_rank("most_severe_injury"))
        .drop("crash_date")
        .withColumnRenamed("crash_ts", "crash_date")
    )


def parse_failure_count(cleaned: DataFrame) -> int:
    """The SURVEY §7 parse-failure counter (pandas raised; we count)."""
    return cleaned.agg(F.sum("crash_parse_failed").alias("n")).collect()[0]["n"] or 0
