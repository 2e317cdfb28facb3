"""Incremental streaming semantics: checkpoint continuity across
availableNow runs, and watermark-driven late-data dropping — the two
behaviors that make the windowed plan safe to run forever (SURVEY §2.8)."""

from __future__ import annotations

import datetime as dt

import pyspark.sql.functions as F



def _run(spark, src, checkpoint, out_dir):
    stream = (
        spark.readStream.schema("user_id long, ts timestamp, value double")
        .parquet(src)
        .withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("ws"), "n")
    )
    q = (
        stream.writeStream.format("parquet")  # file sink: checkpoint-recoverable
        .outputMode("append")  # append: windows emit once, when the watermark closes them
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return {r["ws"]: r["n"] for r in spark.read.parquet(out_dir).collect()}


def test_checkpoint_continuity_and_late_data_drop(spark, tmp_path):
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    t0 = dt.datetime(2024, 1, 1, 10, 0)

    def write(rows):
        spark.createDataFrame(
            rows, "user_id long, ts timestamp, value double"
        ).coalesce(1).write.mode("append").parquet(src)

    # Batch 1: three events 10:xx, one 13:xx (advances the watermark to 12:00).
    out_dir = str(tmp_path / "out")
    write([(1, t0, 1.0), (1, t0.replace(minute=30), 1.0), (2, t0.replace(minute=59), 1.0),
           (1, t0.replace(hour=13), 1.0)])
    out1 = _run(spark, src, ckpt, out_dir)
    # Watermark (13:00 - 1h = 12:00) closed the 10:00 window → emitted once.
    assert out1[t0] == 3

    # Batch 2 through the SAME checkpoint: one valid 13:30 event, one event
    # for the already-closed 10:00 window (late beyond the watermark), and
    # a 15:00 event advancing the watermark past 13:xx.
    write([(3, t0.replace(hour=13, minute=30), 1.0), (9, t0.replace(minute=45), 1.0),
           (1, t0.replace(hour=15), 1.0)])
    out2 = _run(spark, src, ckpt, out_dir)
    # Only NEW files processed (checkpoint continuity): the 13:00 window
    # closes with both its events counted; the 10:00 straggler is DROPPED
    # — the closed window is never re-emitted with a bumped count.
    assert out2.get(t0.replace(hour=13)) == 2
    assert out2[t0] == 3  # still the batch-1 emission, not 4

def test_gram_index_stream_maintenance_matches_batch_build(spark, sf_dir, tmp_path):
    """Streamed maintenance of the gram-support index (foreachBatch,
    batch-id-guarded merges, durable checkpoint) converges to EXACTLY
    the index a one-shot batch build produces — including across TWO
    separate maintenance runs with files arriving in between (the
    daily-cron shape: the durable checkpoint keeps batch ids monotone
    and stops the source re-reading day-1 files on day 2)."""
    import pyspark.sql.functions as F

    from traffic_accidents_airflow_kafka_spark.operators import dedup
    from traffic_accidents_airflow_kafka_spark.sources.tables import load_table
    from traffic_accidents_airflow_kafka_spark.streaming import maintenance

    docs = load_table(spark, sf_dir, "documents")
    index_path = str(tmp_path / "gram_index")
    ckpt = str(tmp_path / "ckpt")
    src_dir = str(tmp_path / "stream_in")
    schema = docs.select("doc_id", "text").schema

    def stream():
        return (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(src_dir)
        )

    # Day 1: even docs arrive; drain run 1.
    docs.filter(F.col("doc_id") % 2 == 0).select("doc_id", "text").coalesce(
        1
    ).write.mode("append").parquet(src_dir)
    maintenance.maintain_gram_index(stream(), index_path, spark, ckpt)
    # Day 2: odd docs arrive; drain run 2 against the SAME checkpoint.
    docs.filter(F.col("doc_id") % 2 == 1).select("doc_id", "text").coalesce(
        1
    ).write.mode("append").parquet(src_dir)
    maintenance.maintain_gram_index(stream(), index_path, spark, ckpt)

    streamed = {
        r["__gh"]: r["n_docs"] for r in spark.read.parquet(index_path).collect()
    }
    batch = {
        r["__gh"]: r["n_docs"]
        for r in dedup.gram_support_index(docs, "doc_id", "text", k=8).collect()
    }
    assert streamed == batch and len(batch) > 0

    # The maintained index feeds the incremental miner directly and
    # reproduces the full-rescan result (support over history = index).
    arrivals = docs.filter(F.col("doc_id") % 5 == 4)
    history = docs.filter(F.col("doc_id") % 5 != 4)
    hist_index = dedup.gram_support_index(history, "doc_id", "text", k=8)
    via_index = sorted(
        tuple(r)
        for r in dedup.incremental_repeated_spans(
            None, arrivals, "doc_id", "text", k=8, history_index=hist_index
        ).collect()
    )
    via_rescan = sorted(
        tuple(r)
        for r in dedup.incremental_repeated_spans(
            history, arrivals, "doc_id", "text", k=8
        ).collect()
    )
    assert via_index == via_rescan


def test_gram_index_applier_drops_redelivered_batch(spark, sf_dir, tmp_path):
    """foreachBatch is at-least-once; the applier's batch-id marker makes
    the count-sum merge exactly-once — redelivering an applied batch id
    must change nothing."""
    from traffic_accidents_airflow_kafka_spark.sources.tables import load_table
    from traffic_accidents_airflow_kafka_spark.streaming import maintenance

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    index_path = str(tmp_path / "gram_index")
    apply_fn = maintenance.gram_index_applier(spark, index_path)

    apply_fn(docs, 0)
    first = sorted(
        (r["__gh"], r["n_docs"]) for r in spark.read.parquet(index_path).collect()
    )
    apply_fn(docs, 0)  # redelivery — must be a no-op, not a double count
    second = sorted(
        (r["__gh"], r["n_docs"]) for r in spark.read.parquet(index_path).collect()
    )
    assert first == second
    apply_fn(docs, 1)  # a genuinely new batch WITH the same docs doubles
    third = {r["__gh"]: r["n_docs"] for r in spark.read.parquet(index_path).collect()}
    assert all(third[g] == n * 2 for g, n in first)
