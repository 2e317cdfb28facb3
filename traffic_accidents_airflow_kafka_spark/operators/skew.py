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


def join_cardinality_stats(
    name: str, left: DataFrame, left_key: str, right: DataFrame, right_key: str
) -> DataFrame:
    """ONE row predicting an equi-join's EXACT output size before running
    it: for shared key k with c_l(k) x c_r(k) rows per side, the join
    emits sum(c_l * c_r) rows — computable from the two key-cardinality
    relations alone. The pre-flight guard for N:M explosions: an
    amplification (join rows / larger input) far above 1 means the join
    multiplies data and needs rethinking (pre-aggregate a side, bucket,
    or the key is wrong), BEFORE a 100 TB shuffle discovers it the hard
    way.

    Scale: two hash aggregates to key-cardinality relations, one
    key-keyed full-outer join of those (so disjoint keys still count
    into the side totals), one scalar rollup. Nothing corpus-sized
    survives past the first aggregates.
    """
    lc = left.groupBy(F.col(left_key).alias("k")).agg(
        F.count(F.lit(1)).alias("c_l")
    )
    rc = right.groupBy(F.col(right_key).alias("k")).agg(
        F.count(F.lit(1)).alias("c_r")
    )
    both = F.col("c_l").isNotNull() & F.col("c_r").isNotNull()
    pair_rows = F.when(both, F.col("c_l") * F.col("c_r")).otherwise(F.lit(0))
    stats = (
        lc.join(rc, "k", "full_outer")
        .agg(
            F.sum(F.coalesce("c_l", F.lit(0))).cast("bigint").alias("n_left"),
            F.sum(F.coalesce("c_r", F.lit(0))).cast("bigint").alias("n_right"),
            F.sum(both.cast("int")).cast("bigint").alias("n_common_keys"),
            F.sum(pair_rows).cast("bigint").alias("join_rows"),
            F.coalesce(F.max(F.when(both, F.col("c_l") * F.col("c_r"))), F.lit(0))
            .cast("bigint")
            .alias("top_pair_rows"),
        )
    )
    return stats.select(
        F.lit(name).alias("join_name"),
        "n_left",
        "n_right",
        "n_common_keys",
        "join_rows",
        F.round(
            F.col("join_rows").cast("double")
            / F.greatest("n_left", "n_right").cast("double"),
            4,
        ).alias("amplification"),
        "top_pair_rows",
    )
