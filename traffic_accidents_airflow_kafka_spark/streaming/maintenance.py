"""Streaming maintenance of the repeated-span gram-support index —
the production loop that keeps :func:`operators.dedup.
incremental_repeated_spans` cheap forever: every micro-batch of arriving
documents merges its per-gram distinct-doc counts into the persisted
index instead of ever re-mining history. The maintained index feeds the
miner directly via its ``history_index`` parameter.

The reference's closest analog is the consumer writing each Kafka
result batch into Postgres (kafka/consumer.py:26-36); this is the same
sink-per-batch shape via ``foreachBatch``, upgraded with the standard
transactional recipe: Spark's foreachBatch is AT-LEAST-ONCE per batch
id, and a count-sum merge is not idempotent, so the applier records the
last applied batch id INSIDE the index directory and skips redelivered
batches. Batch ids are only meaningful against a DURABLE streaming
checkpoint — ``maintain_gram_index`` therefore requires one
(``checkpoint_path``); an ephemeral checkpoint would restart ids at 0
every run and corrupt the merge in both directions (skipped new
batches AND re-merged old ones).

Scale: per batch, work is linear in the batch (gram explode + one
partial-aggregating shuffle) plus one index rewrite. The index itself is
corpus-VOCABULARY-sized — (8-byte hash, count) rows — orders of
magnitude smaller than the corpus; when even that rewrite grows heavy,
partition the index by hash range and overwrite only partitions the
batch touched (the same overwrite-by-partition idiom as
``run_foreach_batch``'s doc).
"""

from __future__ import annotations

import os
import shutil

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..operators.dedup import gram_support_index

_BATCH_MARKER = "_last_applied_batch_id"


def _read_marker(index_path: str) -> int:
    marker = os.path.join(index_path, _BATCH_MARKER)
    if os.path.exists(marker):
        with open(marker) as fh:
            return int(fh.read().strip())
    return -1


def _recover_swap(index_path: str) -> None:
    """Heal a crash inside a previous swap window. Invariants: the new
    index (with its marker) is staged COMPLETE in ``__tmp`` before any
    rename, so whatever the crash point, either the old or the new index
    is recoverable — never a mix, never a marker/index split."""
    old = index_path.rstrip("/") + "__old"
    tmp = index_path.rstrip("/") + "__tmp"
    if not os.path.isdir(index_path):
        if os.path.isdir(old):
            # Crashed between the two renames: old index moved aside but
            # the new one never landed. The old index is intact.
            os.rename(old, index_path)
        elif os.path.isdir(tmp) and os.path.exists(os.path.join(tmp, _BATCH_MARKER)):
            # First-ever build crashed after staging: tmp is complete.
            os.rename(tmp, index_path)
    # Leftover staging/backup dirs from a completed or healed swap.
    shutil.rmtree(old, ignore_errors=True)
    shutil.rmtree(tmp, ignore_errors=True)


def merge_gram_counts(existing: DataFrame | None, batch_counts: DataFrame) -> DataFrame:
    """Merge per-gram distinct-doc counts (sound for DISJOINT doc sets:
    counts add). ``existing=None`` bootstraps the index."""
    if existing is None:
        return batch_counts
    return (
        existing.unionByName(batch_counts)
        .groupBy("__gh")
        .agg(F.sum("n_docs").alias("n_docs"))
    )


def gram_index_applier(
    spark: SparkSession,
    index_path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
):
    """Build the ``foreachBatch`` function maintaining the index at
    ``index_path``. Exactly-once via the batch-id marker: a redelivered
    batch id is a no-op (tested). Crash contract: the new index AND its
    marker are staged complete in a temp dir before the rename swap, so
    they move together — a crash at any point leaves a recoverable old
    or new index (``_recover_swap`` heals on the next call), never a
    half-merged one. Single-writer assumption, as everywhere in this
    repo's sink layer.
    """

    def apply(batch_df: DataFrame, batch_id: int) -> None:
        _recover_swap(index_path)
        if batch_id <= _read_marker(index_path):
            return  # redelivery of an applied batch — drop it
        batch_counts = gram_support_index(batch_df, id_col, text_col, k)
        existing = (
            spark.read.parquet(index_path) if os.path.isdir(index_path) else None
        )
        merged = merge_gram_counts(existing, batch_counts)
        tmp = index_path.rstrip("/") + "__tmp"
        merged.write.mode("overwrite").parquet(tmp)
        # Marker goes INTO the staged dir: index + marker swap atomically.
        with open(os.path.join(tmp, _BATCH_MARKER), "w") as fh:
            fh.write(str(batch_id))
        old = index_path.rstrip("/") + "__old"
        if os.path.isdir(index_path):
            os.rename(index_path, old)
        os.rename(tmp, index_path)
        shutil.rmtree(old, ignore_errors=True)

    return apply


def maintain_gram_index(
    stream_docs: DataFrame,
    index_path: str,
    spark: SparkSession,
    checkpoint_path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
) -> None:
    """Drain the available document stream into the persisted index
    (availableNow — the bounded-replay termination contract; a live
    deployment drops the trigger). ``checkpoint_path`` MUST be durable
    and dedicated to this index: it is what makes batch ids monotone
    across runs (so the marker guard sees true redeliveries, not id
    collisions) and what stops the file source re-reading already-
    processed files on the next invocation."""
    q = (
        stream_docs.select(id_col, text_col)
        .writeStream.foreachBatch(
            gram_index_applier(spark, index_path, id_col, text_col, k)
        )
        .outputMode("append")
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
