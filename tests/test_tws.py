"""transformWithStateInPandas sessionizer (streaming/tws.py): drive a
real streaming query and assert it matches the applyInPandasWithState
twin event-for-event (the two stateful APIs share one contract; the
stream_sessions_tws catalog query additionally shares the stream_sessions
DuckDB oracle)."""

from __future__ import annotations

import datetime as dt
import tempfile
import uuid

import pytest

pytest.importorskip(
    "google.protobuf",
    reason="transformWithStateInPandas workers need protobuf (absent in "
    "this container; the stream_sessions_tws query gates on it too). "
    "Vendoring was probed and is impossible here (round 5): no protobuf "
    "wheel/sdist in site-packages or the pip HTTP cache (body scan of "
    "~/.cache/pip/http found zero protobuf artifacts), and `pip download "
    "protobuf` fails with 'no matching distribution' — the container has "
    "no index access. Re-probed round 6 with the same result (import "
    "fails, `pip download protobuf --no-deps` downloads nothing) — the "
    "item is CLOSED as environment-impossible; this skip is permanent "
    "for this container. The applyInPandasWithState and native "
    "session-window paths cover the semantics with green oracles.",
)

from traffic_accidents_airflow_kafka_spark.streaming import stateful, tws  # noqa: E402


def _ts(minute: int) -> dt.datetime:
    return dt.datetime(2024, 1, 1, 10, minute, 0)


@pytest.fixture(scope="module")
def session_source(spark, tmp_path_factory):
    rows = [
        (7, _ts(0), 1.0),
        (7, _ts(5), 2.0),
        (7, _ts(45), 4.0),
        (8, _ts(1), 8.0),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, value double")
    path = str(tmp_path_factory.mktemp("tws_sessions") / "events")
    df.coalesce(1).write.parquet(path)
    return path


def _run_append(sessions, spark):
    name = f"tws_{uuid.uuid4().hex[:8]}"
    q = (
        sessions.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", tempfile.mkdtemp())
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name).collect()


def _stream(spark, path):
    return (
        spark.readStream.schema("user_id long, ts timestamp, value double")
        .parquet(path)
        .withWatermark("ts", "10 minutes")
    )


def test_tws_sessionize_splits_on_gap(spark, session_source):
    out = _run_append(
        tws.sessionize_tws(_stream(spark, session_source), gap_seconds=1800), spark
    )
    closed = {(r["user_id"], r["closed_by"]): r for r in out}
    a = closed[(7, "gap")]
    assert a["n_events"] == 2 and a["sum_value"] == 3.0
    assert a["session_start"] == _ts(0) and a["session_end"] == _ts(5)
    assert (8, "gap") not in closed


def test_tws_matches_applyinpandaswithstate(spark, session_source):
    got_tws = sorted(
        map(tuple, _run_append(
            tws.sessionize_tws(_stream(spark, session_source), 1800), spark
        ))
    )
    got_aip = sorted(
        map(tuple, _run_append(
            stateful.sessionize(_stream(spark, session_source), 1800), spark
        ))
    )
    assert got_tws == got_aip and len(got_tws) >= 1
