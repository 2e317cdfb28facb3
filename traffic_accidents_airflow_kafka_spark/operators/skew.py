"""Skew mitigation: salted joins and two-phase aggregation.

AQE's skew-join handling (on in the session factory) splits oversized
partitions at runtime, but only for sort-merge joins it can observe.
Salting is the plan-level tool when you KNOW the hot keys: a hot fact key
is split across ``salt_buckets`` shuffle partitions; the dim side is
replicated once per bucket. Same result, no straggler task.

Two-phase aggregation handles the groupBy analog: aggregate on
(key, salt) first — spreading a hot group over many tasks — then
re-aggregate on key. For algebraic aggregates (sum/count/min/max) the
result is identical.
"""

from __future__ import annotations

from collections.abc import Sequence

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame


def with_salt(df: DataFrame, key: str, salt_buckets: int, salt_col: str = "__salt") -> DataFrame:
    """Deterministic pseudo-random salt in [0, salt_buckets) per row
    (hash of the full row's key + a spread column would do; pmod of
    xxhash64 over key and a uniform row id keeps it cheap and stable)."""
    return df.withColumn(
        salt_col,
        F.pmod(F.xxhash64(F.col(key), F.monotonically_increasing_id()), F.lit(salt_buckets)).cast("int"),
    )


def replicate_for_salt(dim: DataFrame, salt_buckets: int, salt_col: str = "__salt") -> DataFrame:
    """Dim side of a salted join: one copy per salt bucket (dim is small —
    that's why it's the replicated side)."""
    return dim.withColumn(
        salt_col, F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1)))
    ).withColumn(salt_col, F.col(salt_col).cast("int"))


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    on: str,
    salt_buckets: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skew-proof equi-join: fact rows spread over ``salt_buckets``
    sub-keys, dim replicated to match. Join keys become (on, salt) so a
    hot key's rows land on ``salt_buckets`` tasks instead of one."""
    f = with_salt(fact, on, salt_buckets)
    d = replicate_for_salt(dim, salt_buckets)
    return f.join(d, [on, "__salt"], how).drop("__salt")


def two_phase_agg(
    df: DataFrame,
    keys: Sequence[str],
    aggs: dict[str, Column],
    salt_buckets: int = 8,
) -> DataFrame:
    """Skew-proof sum/count aggregation: partial agg on (keys, salt), then
    final agg on keys. ``aggs`` maps output name → SUM-like column over
    the input (must be algebraically mergeable by SUM)."""
    salted = df.withColumn(
        "__salt", F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(salt_buckets))
    )
    partial = salted.groupBy(*keys, "__salt").agg(
        *[c.alias(f"__p_{name}") for name, c in aggs.items()]
    )
    return partial.groupBy(*keys).agg(
        *[F.sum(f"__p_{name}").alias(name) for name in aggs]
    )
