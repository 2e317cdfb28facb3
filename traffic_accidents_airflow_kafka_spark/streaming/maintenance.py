"""Streaming maintenance of the repeated-span gram-support index —
the production loop that keeps :func:`operators.dedup.
incremental_repeated_spans` cheap forever: every micro-batch of arriving
documents merges its per-gram distinct-doc counts into the persisted
index instead of ever re-mining history.

The reference's closest analog is the consumer writing each Kafka
result batch into Postgres (kafka/consumer.py:26-36); this is the same
sink-per-batch shape via ``foreachBatch``, upgraded with the standard
transactional recipe: Spark's foreachBatch is AT-LEAST-ONCE per batch
id, and a count-sum merge is not idempotent, so the applier records the
last applied batch id NEXT TO the index and skips redelivered batches —
effectively-exactly-once without a transactional store.

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
from . import core as streaming

_BATCH_MARKER = "_last_applied_batch_id"


def _read_marker(index_path: str) -> int:
    marker = os.path.join(index_path, _BATCH_MARKER)
    if os.path.exists(marker):
        with open(marker) as fh:
            return int(fh.read().strip())
    return -1


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
    batch id is a no-op (tested), so the count-sum merge never double
    counts. The rewrite goes through a temp dir + rename swap (the
    compact_parquet crash contract: old or new layout, never a mix);
    the marker is written after the swap, so a crash between the two
    replays the batch into the OLD index — at-least-once collapses to
    exactly-once because the marker and the index move together.
    Single-writer assumption, as everywhere in this repo's sink layer.
    """

    def apply(batch_df: DataFrame, batch_id: int) -> None:
        if batch_id <= _read_marker(index_path):
            return  # redelivery of an applied batch — drop it
        batch_counts = gram_support_index(batch_df, id_col, text_col, k)
        existing = (
            spark.read.parquet(index_path) if os.path.isdir(index_path) else None
        )
        merged = merge_gram_counts(existing, batch_counts)
        tmp = index_path.rstrip("/") + "__tmp"
        merged.write.mode("overwrite").parquet(tmp)
        old = index_path.rstrip("/") + "__old"
        if os.path.isdir(index_path):
            os.rename(index_path, old)
        os.rename(tmp, index_path)
        shutil.rmtree(old, ignore_errors=True)
        with open(os.path.join(index_path, _BATCH_MARKER), "w") as fh:
            fh.write(str(batch_id))

    return apply


def maintain_gram_index(
    stream_docs: DataFrame,
    index_path: str,
    spark: SparkSession,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
) -> None:
    """Drain the available document stream into the persisted index
    (availableNow — the same bounded-replay termination contract as
    every stream in this repo; a live deployment drops the trigger)."""
    streaming.run_foreach_batch(
        stream_docs.select(id_col, text_col),
        spark,
        gram_index_applier(spark, index_path, id_col, text_col, k),
    )
