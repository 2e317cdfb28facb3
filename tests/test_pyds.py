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


# ---------------------------------------------------------------------------
# Streaming replay source
# ---------------------------------------------------------------------------

from traffic_accidents_airflow_kafka_spark.sources.pyds import (  # noqa: E402
    EventReplayDataSource,
    EventReplayStreamReader,
)


def test_replay_reader_offsets_are_deterministic(sf_dir):
    path = f"{sf_dir}/events.parquet"
    r1 = EventReplayStreamReader({"path": path, "max_rows_per_read": "7"})
    r2 = EventReplayStreamReader({"path": path, "max_rows_per_read": "7"})
    assert r1.initialOffset() == {"row": 0}
    rows1, nxt1 = r1.read({"row": 0})
    rows2, nxt2 = r2.read({"row": 0})
    assert nxt1 == nxt2 == {"row": 7}
    assert list(rows1) == list(rows2)
    # replay-between must return the exact same slice a live read saw
    live = list(r1.read({"row": 7})[0])
    replay = list(r2.readBetweenOffsets({"row": 7}, {"row": 14}))
    assert live == replay and len(replay) == 7


def test_replay_reader_drains_all_when_uncapped(sf_dir):
    path = f"{sf_dir}/events.parquet"
    r = EventReplayStreamReader({"path": path})
    rows, nxt = r.read({"row": 0})
    n = len(list(rows))
    assert n == nxt["row"] and n > 0
    # sorted by (ts, event_id): a second full read agrees row-for-row
    again = list(r.readBetweenOffsets({"row": 0}, {"row": n}))
    assert len(again) == n


def test_replay_stream_resumes_from_checkpoint(registered, sf_dir, tmp_path):
    """Two availableNow runs over ONE checkpoint: run 2 must resume at
    run 1's committed offset, never re-delivering rows (exactly-once
    through the Python source's offset bookkeeping)."""
    registered.dataSource.register(EventReplayDataSource)
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")
    total = EventReplayStreamReader({"path": f"{sf_dir}/events.parquet"}).read(
        {"row": 0}
    )[1]["row"]
    cap = max(1, total // 3)

    def run_once():
        # File sink (memory sink can't recover from a checkpoint).
        df = (
            registered.readStream.format("eventreplay")
            .option("path", f"{sf_dir}/events.parquet")
            .option("max_rows_per_read", str(cap))
            .load()
        )
        q = (
            df.writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return registered.read.parquet(out).collect()

    first = run_once()
    second = run_once()
    assert 0 < len(first) <= cap
    ids1 = [r["event_id"] for r in first]
    assert len(ids1) == len(set(ids1))
    ids2 = [r["event_id"] for r in second]
    # run 2 resumed from the committed offset: strictly more rows,
    # and NO event delivered twice (exactly-once bookkeeping).
    assert len(ids2) > len(ids1)
    assert len(ids2) == len(set(ids2))


def test_replay_columns_projection_and_errors(sf_dir):
    """ADVICE r10 low: the pruned-schema path of the replay source —
    canonical reordering, value/offset identity vs the unpruned source,
    and the unknown-column error — had no coverage."""
    import pytest

    from traffic_accidents_airflow_kafka_spark.sources.pyds import (
        EventReplayStreamReader,
        _replay_columns,
    )

    # canonical reordering: a caller passing "value,ts_us" gets the
    # schema-order projection, not the requested order
    assert _replay_columns({"columns": "value,ts_us"}) == ["ts_us", "value"]
    with pytest.raises(ValueError, match="unknown replay columns"):
        _replay_columns({"columns": "ts_us,nope"})

    path = f"{sf_dir}/events.parquet"
    full = EventReplayStreamReader({"path": path})
    pruned = EventReplayStreamReader(
        {"path": path, "columns": "ts_us,event_type,value"}
    )
    rows_f, nxt_f = full.read({"row": 0})
    rows_p, nxt_p = pruned.read({"row": 0})
    rows_f, rows_p = list(rows_f), list(rows_p)
    # offsets advance identically (the (ts, event_id) order is computed
    # on SOURCE columns, so pruning cannot change the replay ranges)
    assert nxt_f == nxt_p and len(rows_f) == len(rows_p)
    # row-for-row: the pruned tuple is the (ts_us, event_type, value)
    # slice of the full canonical-order tuple (fields 1, 3, 4)
    assert all(
        (f[1], f[3], f[4]) == tuple(p) for f, p in zip(rows_f, rows_p)
    )
    # replay-between on the pruned reader returns the identical slice
    mid = len(rows_p) // 2 or 1
    again = list(pruned.readBetweenOffsets({"row": 0}, {"row": mid}))
    assert again == rows_p[:mid]
