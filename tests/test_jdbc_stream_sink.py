"""Exactly-once streaming -> JDBC delivery (streaming/jdbc_sink.py),
integration-tested for REAL against embedded Apache Derby: multi-batch
happy path, and a crash injected into the vulnerable window (rows written,
marker not yet committed) followed by a checkpoint-resumed replay that
must converge to exactly-once content."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from traffic_accidents_airflow_kafka_spark.sources import jdbc
from traffic_accidents_airflow_kafka_spark.streaming import core
from traffic_accidents_airflow_kafka_spark.streaming.jdbc_sink import (
    BATCH_ID_COL,
    exactly_once_jdbc_batch_fn,
)

PROPS = {"driver": "org.apache.derby.jdbc.EmbeddedDriver"}


def _write_source(spark, tmp_path, n_files=3, rows_per_file=40):
    """A directory of small parquet files (written once per test)."""
    src = tmp_path / "src"
    for i in range(n_files):
        (
            spark.range(i * rows_per_file, (i + 1) * rows_per_file)
            .select(
                F.col("id"),
                (F.col("id") % 5).alias("bucket"),
            )
            .coalesce(1)
            .write.mode("append")
            .parquet(str(src))
        )
    return src


def _read_stream(spark, src):
    """maxFilesPerTrigger=1 turns each file into its own micro-batch."""
    return (
        spark.readStream.schema("id bigint, bucket bigint")
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src))
    )


def _make_source(spark, tmp_path, n_files=3, rows_per_file=40):
    return _read_stream(spark, _write_source(spark, tmp_path, n_files, rows_per_file))


def _read_table(spark, url, table):
    return jdbc.jdbc_reader(spark, url, table, properties=PROPS).load()


def test_stream_jdbc_exactly_once_happy_path(spark, tmp_path):
    url = f"jdbc:derby:{tmp_path}/db1;create=true"
    stream = _make_source(spark, tmp_path)
    fn = exactly_once_jdbc_batch_fn(
        spark, url, "sink_rows", marker_table="markers1", properties=PROPS
    )
    core.run_foreach_batch(stream, spark, fn)
    back = _read_table(spark, url, "sink_rows")
    assert back.count() == 120
    assert back.select("id").distinct().count() == 120
    markers = _read_table(spark, url, "markers1")
    mrows = {r["BATCH_ID"]: r["N_ROWS"] for r in markers.collect()}
    assert sum(mrows.values()) == 120
    assert len(mrows) >= 2, "maxFilesPerTrigger must yield multiple batches"
    # Every delivered row is tagged with a marked batch id.
    tag_ids = {
        r[0] for r in back.select(BATCH_ID_COL).distinct().collect()
    }
    assert tag_ids == set(mrows)


def test_stream_jdbc_crash_replay_converges(spark, tmp_path):
    """Crash AFTER the rows append, BEFORE the marker commit — the
    at-least-once window. The checkpoint-resumed replay must DELETE the
    orphaned rows and land exactly-once content."""
    url = f"jdbc:derby:{tmp_path}/db2;create=true"
    ckpt = str(tmp_path / "ckpt")
    crashed = {"done": False}

    def crash_once(batch_id):
        if batch_id == 1 and not crashed["done"]:
            crashed["done"] = True
            raise RuntimeError("injected crash before marker commit")

    fn = exactly_once_jdbc_batch_fn(
        spark,
        url,
        "sink_rows",
        marker_table="markers2",
        properties=PROPS,
        fail_before_commit=crash_once,
    )
    stream = _make_source(spark, tmp_path)
    with pytest.raises(Exception, match="injected crash"):
        core.run_foreach_batch(stream, spark, fn, checkpoint=ckpt)

    # Orphaned rows of batch 1 are in the table, unmarked — the exact
    # state a real crash leaves.
    back = _read_table(spark, url, "sink_rows")
    orphans = back.filter(F.col(BATCH_ID_COL) == 1).count()
    assert orphans > 0, "crash must land in the vulnerable window"
    markers = _read_table(spark, url, "markers2")
    assert markers.filter(F.col("BATCH_ID") == 1).count() == 0

    # Resume from the SAME checkpoint: Spark replays batch 1; the sink
    # deletes the orphans and commits. Remaining batches follow.
    stream2 = _read_stream(spark, tmp_path / "src")  # same files, new plan
    core.run_foreach_batch(stream2, spark, fn, checkpoint=ckpt)
    back = _read_table(spark, url, "sink_rows")
    assert back.count() == 120, "replay must not duplicate the crashed batch"
    assert back.select("id").distinct().count() == 120
    markers = {r["BATCH_ID"]: r["N_ROWS"] for r in _read_table(
        spark, url, "markers2").collect()}
    assert sum(markers.values()) == 120


def test_stream_jdbc_marker_skips_redelivery(spark, tmp_path):
    """A batch whose marker exists is skipped outright — calling the
    batch fn again with the same id must not change the table."""
    url = f"jdbc:derby:{tmp_path}/db3;create=true"
    fn = exactly_once_jdbc_batch_fn(
        spark, url, "sink_rows", marker_table="markers3", properties=PROPS
    )
    batch = spark.range(0, 10).select(
        F.col("id"), (F.col("id") % 3).alias("bucket")
    )
    fn(batch, 0)
    fn(batch, 0)  # manual redelivery, marker present
    back = _read_table(spark, url, "sink_rows")
    assert back.count() == 10
