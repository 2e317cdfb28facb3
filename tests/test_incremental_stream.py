"""Incremental streaming semantics: checkpoint continuity across
availableNow runs, and watermark-driven late-data dropping — the two
behaviors that make the windowed plan safe to run forever (SURVEY §2.8)."""

from __future__ import annotations

import datetime as dt
import os

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
        r["__gh"]: r["n_docs"]
        for r in maintenance.read_gram_index(spark, index_path).collect()
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
        (r["__gh"], r["n_docs"])
        for r in maintenance.read_gram_index(spark, index_path).collect()
    )
    apply_fn(docs, 0)  # redelivery — must be a no-op, not a double count
    second = sorted(
        (r["__gh"], r["n_docs"])
        for r in maintenance.read_gram_index(spark, index_path).collect()
    )
    assert first == second
    apply_fn(docs, 1)  # a genuinely new batch WITH the same docs doubles
    third = {
        r["__gh"]: r["n_docs"]
        for r in maintenance.read_gram_index(spark, index_path).collect()
    }
    assert all(third[g] == n * 2 for g, n in first)


def test_gram_index_untouched_buckets_not_rewritten(spark, sf_dir, tmp_path):
    """The incremental-rewrite contract: a merge rewrites ONLY the hash
    buckets the batch's grams land in; every untouched bucket's parquet
    files are hard-linked from the previous version — byte-identical,
    same inode, zero data rewritten."""
    import pyspark.sql.functions as F

    from traffic_accidents_airflow_kafka_spark.sources.tables import load_table
    from traffic_accidents_airflow_kafka_spark.streaming import maintenance

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    index_path = str(tmp_path / "gram_index")
    apply_fn = maintenance.gram_index_applier(spark, index_path, n_buckets=64)

    # Batch 0: a broad corpus slice populates most of the 64 buckets.
    apply_fn(docs.filter(F.col("doc_id") % 2 == 0), 0)
    v0 = maintenance._current_version(index_path)
    before = {
        r["__gh"]: r["n_docs"]
        for r in maintenance.read_gram_index(spark, index_path).collect()
    }

    # Batch 1: ONE short document — its few grams touch few buckets.
    tiny = spark.createDataFrame(
        [(999_999, "alpha beta gamma delta epsilon zeta eta theta iota kappa")],
        "doc_id long, text string",
    )
    apply_fn(tiny, 1)
    v1 = maintenance._current_version(index_path)
    assert v1 != v0

    from traffic_accidents_airflow_kafka_spark.operators.dedup import (
        gram_support_index,
    )

    tiny_counts = {
        r["__gh"]: r["n_docs"]
        for r in gram_support_index(tiny, "doc_id", "text", k=8).collect()
    }
    touched = {gh % 64 for gh in tiny_counts}
    assert 0 < len(touched) < 64  # the premise: most buckets untouched

    old_dir = os.path.join(index_path, v0)
    new_dir = os.path.join(index_path, v1)
    checked = 0
    for entry in sorted(os.listdir(old_dir)):
        if not entry.startswith("__bucket="):
            continue
        b = int(entry.split("=")[1])
        if b in touched:
            continue
        old_b, new_b = os.path.join(old_dir, entry), os.path.join(new_dir, entry)
        assert os.path.isdir(new_b), f"untouched {entry} missing from {v1}"
        for fname in sorted(os.listdir(old_b)):
            old_f, new_f = os.path.join(old_b, fname), os.path.join(new_b, fname)
            st_old, st_new = os.stat(old_f), os.stat(new_f)
            assert st_old.st_ino == st_new.st_ino, f"{entry}/{fname} rewritten"
            with open(old_f, "rb") as a, open(new_f, "rb") as bfh:
                assert a.read() == bfh.read()
            checked += 1
    assert checked > 0

    # And the merge itself is still correct: old counts + the new doc's.
    after = {
        r["__gh"]: r["n_docs"]
        for r in maintenance.read_gram_index(spark, index_path).collect()
    }
    want = dict(before)
    for gh, n in tiny_counts.items():
        want[gh] = want.get(gh, 0) + n
    assert after == want


def test_gram_index_reader_always_sees_complete_version(spark, sf_dir, tmp_path):
    """ADVICE r4: a reader must never observe a missing/partial index.
    With versioned publish, the version resolved BEFORE a merge remains
    fully readable AFTER it (grace window), and the pointer always names
    a complete version."""
    import pyspark.sql.functions as F

    from traffic_accidents_airflow_kafka_spark.sources.tables import load_table
    from traffic_accidents_airflow_kafka_spark.streaming import maintenance

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    index_path = str(tmp_path / "gram_index")
    apply_fn = maintenance.gram_index_applier(spark, index_path)

    apply_fn(docs.filter(F.col("doc_id") % 3 == 0), 0)
    v0 = maintenance._current_version(index_path)
    # A reader resolves v0 and holds onto it across the next publish.
    held = spark.read.parquet(os.path.join(index_path, v0)).select(
        "__gh", "n_docs"
    )
    n_before = held.count()
    apply_fn(docs.filter(F.col("doc_id") % 3 == 1), 1)
    # v0 still fully readable (retained as the grace-window predecessor).
    assert os.path.isdir(os.path.join(index_path, v0))
    assert held.count() == n_before
    # The pointer names the new, complete version.
    v1 = maintenance._current_version(index_path)
    assert v1 != v0
    assert os.path.exists(os.path.join(index_path, v1, "_last_applied_batch_id"))
