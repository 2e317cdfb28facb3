"""Slowly-changing-dimension (SCD type 2) history building.

The reference's star schema (SURVEY.md §1.3) keeps dimensions
current-state-only: re-running the DAG overwrites attributes, losing
history. The warehouse-standard fix is SCD2 — one row per (key, version)
with a validity interval — and at scale it must be built SET-WISE from a
change log, not row-by-row like `ON CONFLICT` upserts.

:func:`scd2_history` turns an ordered change feed (key, attrs, ts) into
versioned rows in two window passes over one shuffle on the key:

1. collapse consecutive duplicates — a row opens a new version iff its
   attribute tuple differs from the key's previous row (lag compare);
2. close each version with the next version's open time
   (``valid_to = lead(valid_from)``; null = current version).

Both passes share the (key × ts) sort, so Catalyst plans a single
Exchange + sort. At 100 TB the change feed is usually already bucketed by
key — then even that exchange disappears.
"""

from __future__ import annotations

from collections.abc import Sequence

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def scd2_history(
    df: DataFrame,
    key_cols: Sequence[str],
    attr_cols: Sequence[str],
    ts_col: str,
    tiebreak_cols: Sequence[str] = (),
) -> DataFrame:
    """Build SCD2 rows from a change feed.

    Returns one row per version: ``key_cols + attr_cols + valid_from +
    valid_to`` where ``valid_from`` is the first ``ts_col`` the attribute
    tuple held and ``valid_to`` is the next version's ``valid_from``
    (null for the open/current version). Consecutive feed rows with an
    unchanged attribute tuple extend the current version instead of
    opening a new one. Supply ``tiebreak_cols`` when ``ts_col`` is not
    unique per key — the order must be total for versions to be
    deterministic.
    """
    keys = list(key_cols)
    attrs = list(attr_cols)
    order = [F.col(ts_col), *[F.col(c) for c in tiebreak_cols]]
    w = Window.partitionBy(*keys).orderBy(*order)

    state = F.struct(*[F.col(c) for c in attrs])
    changed = (
        F.lag(state).over(w).isNull() | (state != F.lag(state).over(w))
    )
    versions = df.withColumn("__new_version", changed).filter(F.col("__new_version"))

    wv = Window.partitionBy(*keys).orderBy(*order)
    return (
        versions.withColumn("valid_from", F.col(ts_col))
        .withColumn("valid_to", F.lead("valid_from").over(wv))
        .select(*keys, *attrs, "valid_from", "valid_to")
    )


def apply_changes(
    snapshot: DataFrame,
    changes: DataFrame,
    key_cols: Sequence[str],
    seq_col: str,
    op_col: str,
    delete_op: str = "d",
) -> DataFrame:
    """Apply a CDC batch to a snapshot — lakehouse MERGE semantics,
    set-wise: the latest change per key wins (``seq_col`` order),
    ``delete_op`` rows remove the key, anything else upserts the row's
    payload. Complements :func:`scd2_history`: that builds HISTORY from
    a feed; this applies a feed to produce the new CURRENT state.

    ``changes`` must carry ``key_cols``, ``seq_col``, ``op_col``, and
    the snapshot's value columns (ignored for deletes). Keys absent
    from the batch pass through untouched.

    Scale shape: one shuffle on the key for the per-key latest-change
    window (the CDC batch, not the snapshot), one key-keyed left-anti
    join against the snapshot, and a union — snapshot rows never sort.
    This is the set-wise replacement for the reference's row-at-a-time
    ``ON CONFLICT`` loop (dags/etl_crash_traffic.py:693-787), and the
    plan MERGE INTO compiles to on lakehouse formats.
    """
    keys = list(key_cols)
    w = Window.partitionBy(*keys).orderBy(F.col(seq_col).desc())
    latest = (
        changes.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
    upserts = latest.filter(F.col(op_col) != delete_op).select(*snapshot.columns)
    touched = latest.select(*keys)
    kept = snapshot.join(touched, keys, "left_anti")
    return kept.unionByName(upserts)


def apply_changes_versioned(
    state: DataFrame,
    changes: DataFrame,
    key_cols: Sequence[str],
    seq_col: str,
    op_col: str,
) -> DataFrame:
    """One round of VERSION-GUARDED CDC merge — the streaming-safe
    sibling of :func:`apply_changes`.

    ``state`` and ``changes`` share one schema: ``key_cols`` + payload +
    ``seq_col`` + ``op_col``. The merge unions them and keeps, per key,
    the row with the HIGHEST ``seq_col`` (ties impossible when seq is
    the change-log offset) — including delete rows, which stay in the
    state as TOMBSTONES rather than being dropped.

    Those two choices buy exactly the guarantees a streaming CDC sink
    needs under Spark's at-least-once foreachBatch contract:

    - **Idempotent**: re-applying a delivered batch is a no-op (every
      row loses the max-seq comparison to itself — ``>`` on replay).
    - **Commutative**: micro-batches applied in ANY order converge to
      the same state (max over seq is order-free), so file-source
      listing order never matters.
    - **No resurrection**: a tombstone with seq 100 survives a late
      upsert with seq 50 — dropping deletes eagerly (what
      :func:`apply_changes` does, correctly, for a SINGLE totally-
      ordered batch) would let the stale upsert revive the key.

    Read the CURRENT state with :func:`current_state` (filters
    tombstones). Scale: one shuffle keyed on ``key_cols`` over
    |state| + |batch| rows; state is key-cardinality-bounded, and on a
    lakehouse table the same contract is MERGE INTO ... WHEN MATCHED
    AND source.seq > target.seq.
    """
    keys = list(key_cols)
    merged = state.unionByName(changes)
    w = Window.partitionBy(*keys).orderBy(F.col(seq_col).desc())
    return (
        merged.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def current_state(state: DataFrame, op_col: str, delete_op: str = "d") -> DataFrame:
    """The live rows of a versioned CDC state: everything that is not a
    tombstone."""
    return state.filter(F.col(op_col) != delete_op)
