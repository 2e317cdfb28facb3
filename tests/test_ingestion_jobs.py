"""Overpass ingestion job (S8), JDBC connector config (S2/S5), and the
7-topic publisher dry-run (S11)."""

from __future__ import annotations

import csv
import json

import pytest

from traffic_accidents_airflow_kafka_spark.pipeline import osm, overpass
from traffic_accidents_airflow_kafka_spark.sources import jdbc
from traffic_accidents_airflow_kafka_spark.streaming import core as streaming
from traffic_accidents_airflow_kafka_spark.streaming import publisher

SF_DIR_SMOKE = "/root/testdata/sf0.001"


def fake_fetch(query: str):
    # Two nodes regardless of bbox: a school and a signal with quote-edge tags.
    assert '[out:json][timeout:25]' in query and 'node["amenity"="school"]' in query
    return [
        (35.1, -80.9, {"amenity": "school", "name": "Test School"}),
        (35.2, -80.8, {"highway": "traffic_signals", "traffic_signals": "signal"}),
    ]


def test_overpass_extraction_writes_parseable_csvs(spark, tmp_path):
    sleeps = []
    written = overpass.extract_bbox_osm(
        fake_fetch, str(tmp_path), bboxes=[(35.0, -81.0), (26.0, -80.5)],
        pacing_seconds=5.0, sleep=sleeps.append,
    )
    assert len(written) == 2
    assert sleeps == [5.0, 5.0]  # rate limiting honored (reference :225)
    with open(written[0], newline="") as fh:
        rows = list(csv.DictReader(fh))
    assert rows[0]["bbox_label"] == "35.0_-81.0"
    assert rows[0]["category"] == "school"
    assert rows[0]["tags"] == "{'amenity': 'school', 'name': 'Test School'}"
    # The engine-side reader consumes the job's output directly.
    raw = osm.read_osm_raw(spark, str(tmp_path / "bbox_*_osm.csv"))
    out = raw.collect()
    assert len(out) == 4 and {r["bbox_label"] for r in out} == {
        "bbox_35.0_-81.0", "bbox_26.0_-80.5"
    }


def test_overpass_extraction_is_idempotent(tmp_path):
    first = overpass.extract_bbox_osm(
        fake_fetch, str(tmp_path), bboxes=[(35.0, -81.0)], sleep=lambda s: None
    )
    second = overpass.extract_bbox_osm(
        fake_fetch, str(tmp_path), bboxes=[(35.0, -81.0)], sleep=lambda s: None
    )
    assert len(first) == 1 and second == []  # skip-if-exists (:170-173)


def test_jdbc_reader_requires_bounds_for_partitioning(spark):
    with pytest.raises(ValueError, match="lower_bound"):
        jdbc.jdbc_reader(spark, "jdbc:postgresql://db/x", "t", partition_column="id")
    # Fully-specified partitioned reader assembles without a database.
    reader = jdbc.jdbc_reader(
        spark, "jdbc:postgresql://db/x", "t",
        partition_column="id", lower_bound=0, upper_bound=1000, num_partitions=4,
    )
    assert reader is not None


def test_jdbc_writer_batches(spark):
    df = spark.range(3)
    writer = jdbc.jdbc_writer(df, "jdbc:postgresql://db/x", "t", batch_size=1000)
    assert writer is not None  # config assembles; .save() needs a live DB


def test_publisher_renders_all_seven_topics(spark):
    plans = publisher.publish_plan(spark, SF_DIR_SMOKE)
    assert set(plans) == set(streaming.TOPICS)
    # Row-per-message: one JSON object per aggregate row.
    msgs = plans["transit_signals_by_state"].collect()
    assert len(msgs) > 1
    decoded = json.loads(msgs[0]["value"])
    assert {"state_name", "n_orders", "sum_total"} <= set(decoded)


def test_publisher_array_envelope_mode(spark):
    plans = publisher.publish_plan(spark, SF_DIR_SMOKE, array_envelope=True)
    [msg] = plans["accidents_by_time"].collect()
    payload = json.loads(msg["value"])
    assert isinstance(payload, list) and len(payload) > 10  # one message, list of dicts


def test_jdbc_roundtrip_embedded_derby(spark, tmp_path):
    """REAL JDBC round-trip — no stub: Spark ships embedded Apache Derby
    (derby*.jar in pyspark/jars), so the connector's write path (batched
    INSERTs, table auto-create on append) and read path (partitioned scan
    + predicate pushdown to the database) genuinely move rows over JDBC.
    The same reader/writer config targets PostgreSQL in production — only
    the URL and driver change."""
    import pyspark.sql.functions as F

    url = f"jdbc:derby:{tmp_path}/rtdb;create=true"
    props = {"driver": "org.apache.derby.jdbc.EmbeddedDriver"}

    rows = spark.range(0, 100).select(
        F.col("id"),
        (F.col("id") % 7).alias("bucket"),
        F.concat(F.lit("name_"), F.col("id")).alias("name"),
    )
    jdbc.jdbc_writer(rows, url, "people", mode="append", batch_size=25,
                     properties=props).save()
    # Idempotence contract of plain append: a second save doubles rows
    # (upsert composes an anti-join upstream — sinks.py:70).
    jdbc.jdbc_writer(rows.filter(F.col("id") < 10), url, "people",
                     mode="append", batch_size=25, properties=props).save()

    back = jdbc.jdbc_reader(
        spark, url, "people",
        partition_column="id", lower_bound=0, upper_bound=100,
        num_partitions=4, properties=props,
    ).load()
    assert back.count() == 110
    assert back.rdd.getNumPartitions() == 4  # partitioned read, not 1 connection

    filtered = back.filter(F.col("id") >= 90).select("id", "bucket")
    got = sorted(r["id"] for r in filtered.collect())
    assert got == list(range(90, 100))
    # The range predicate must reach the database as SQL, not a Spark
    # post-filter over a full-table read.
    plan = filtered._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "GreaterThanOrEqual(id,90" in plan, plan
