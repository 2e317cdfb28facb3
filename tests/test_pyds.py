"""Python DataSource (Spark 4) Overpass source: registration, read,
partition-per-bbox layout, and bbox_label filter pushdown."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F
from pyspark.sql.datasource import EqualTo, In

from traffic_accidents_airflow_kafka_spark.sources.pyds import (
    BboxPartition,
    OverpassDataSource,
    OverpassReader,
    synthetic_fetch,
)
from traffic_accidents_airflow_kafka_spark.pipeline.overpass import (
    BBOXES,
    overpass_query,
)

TWO_BBOXES = json.dumps([[35.0, -81.0], [40.5, -74.0]])


@pytest.fixture(scope="module")
def registered(spark):
    spark.dataSource.register(OverpassDataSource)
    return spark


def test_synthetic_fetch_is_deterministic_and_in_bbox():
    q = overpass_query(35.0, -81.0)
    nodes = list(synthetic_fetch(q))
    assert nodes == list(synthetic_fetch(q))
    assert len(nodes) == 8
    for lat, lon, tags in nodes:
        assert 35.0 <= lat <= 35.5 and -81.0 <= lon <= -80.5
        assert ("amenity" in tags) or ("highway" in tags)


def test_reader_partitions_one_per_bbox():
    reader = OverpassReader({})
    parts = reader.partitions()
    assert len(parts) == len(BBOXES)
    assert all(isinstance(p, BboxPartition) for p in parts)


def test_push_filters_prunes_partitions_exactly():
    reader = OverpassReader({})
    leftover = list(
        reader.pushFilters([EqualTo(("bbox_label",), "bbox_35.0_-81.0")])
    )
    assert leftover == []  # equality on the partition column is absorbed
    parts = reader.partitions()
    assert [(p.min_lat, p.min_lon) for p in parts] == [(35.0, -81.0)]


def test_push_filters_in_list_and_intersection():
    reader = OverpassReader({})
    f_in = In(("bbox_label",), ("bbox_35.0_-81.0", "bbox_40.5_-74.0"))  # .value holds the tuple
    f_eq = EqualTo(("bbox_label",), "bbox_40.5_-74.0")
    assert list(reader.pushFilters([f_in, f_eq])) == []  # AND → intersect
    assert [(p.min_lat, p.min_lon) for p in reader.partitions()] == [(40.5, -74.0)]


def test_push_filters_yields_unsupported_back():
    reader = OverpassReader({})
    f_other = EqualTo(("category",), "school")
    assert list(reader.pushFilters([f_other])) == [f_other]
    assert len(reader.partitions()) == len(BBOXES)


def test_read_end_to_end_synthetic(registered):
    df = (
        registered.read.format("overpass")
        .option("bboxes", TWO_BBOXES)
        .load()
    )
    rows = df.collect()
    assert len(rows) == 16  # 2 bboxes x 8 synthetic nodes
    labels = {r["bbox_label"] for r in rows}
    assert labels == {"bbox_35.0_-81.0", "bbox_40.5_-74.0"}
    cats = sorted({r["category"] for r in rows})
    assert cats == ["crossing", "hospital", "school", "traffic_signals"]
    # tags survive as a real map column
    assert all(isinstance(r["tags"], dict) and "name" in r["tags"] for r in rows)


def test_read_with_label_filter_returns_only_that_bbox(registered):
    df = (
        registered.read.format("overpass")
        .option("bboxes", TWO_BBOXES)
        .load()
        .filter(F.col("bbox_label") == "bbox_35.0_-81.0")
    )
    rows = df.collect()
    assert len(rows) == 8
    assert {r["bbox_label"] for r in rows} == {"bbox_35.0_-81.0"}


def test_fetch_dotted_path_resolution(registered):
    # Inject a transport by import path — the production mechanism.
    df = (
        registered.read.format("overpass")
        .option("bboxes", TWO_BBOXES)
        .option("fetch", "tests.test_pyds:tiny_fetch")
        .load()
    )
    rows = df.collect()
    assert len(rows) == 2  # one node per bbox
    assert {r["category"] for r in rows} == {"school"}


def tiny_fetch(query: str):
    return [(35.1, -80.9, {"amenity": "school"})]
