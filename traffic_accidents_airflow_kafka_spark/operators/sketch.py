"""Count-min sketch: mergeable frequency summaries with a FULL oracle.

The HLL surface (`plans/extensions.py:mergeable_uniques`) demonstrates
mergeable *distinct-count* sketches but is rows-only judged — Apache
DataSketches has no DuckDB twin. This module is the *frequency* member
of the mergeable-sketch family built so the whole sketch IS replayable
in ANSI SQL: buckets come from the repo's md5-parity hash (the
`operators/sampling.py:split_key` / `encoding.py:fold_assign` idiom,
identical hex in Spark and DuckDB), and counts are exact integer sums —
every cell, merge, and estimate is bit-identical cross-engine, so a
sketch query can sit on the full value-hash correctness gate. That is
the deliberate trade: a seeded-xxhash CMS (Spark's builtin
`count_min_sketch` aggregate) would be faster per byte but opaque to
any second engine; md5 costs one digest per row per depth and buys an
auditable sketch.

Why CMS at 100 TB: the sketch is a fixed depth x width integer grid no
matter how many rows feed it. Per-partition partial aggregation
collapses each map task to <= depth*width cells before the shuffle, so
building costs one bounded-output pass; per-day (or per-file) sketches
persist as ~KB tables and MERGE BY ADDITION — answering "frequency of k
over any day range" touches |days|*depth*width integers, never the
corpus. Estimates overcount only (est >= true, est <= true + eps*N with
eps = e/width at the usual confidence), which is the safe direction for
hot-key detection: a key the sketch calls cold IS cold.

Shapes:
    cms_sketch(df, key)            -> (depth, bucket, w) cell counts
    cms_sketch(df, key, by=[...])  -> per-group cells (e.g. per day)
    cms_merge(sketches, by=[])     -> cells summed across groups
    cms_estimate(sketch, keys)     -> (key, est) via min over depths
    bloom_build(df, key)           -> set-bit relation (<= m rows)
    bloom_probe(df, key, bloom)    -> df + maybe_member (no false negatives)

No row ever carries its key past the bucket hash: the shuffle moves
(depth, bucket) cells, not keys — the same never-move-the-payload
discipline as the dedup operators (digests shuffle, text does not).

The Bloom pair is the MEMBERSHIP member of the family (HLL: distinct,
CMS: frequency): at 10^10 historical keys an exact digest set is tens of
GB — too big to broadcast — while ~10 bits/key of Bloom broadcasts fine
and answers "definitely new" with zero shuffle; only the maybe-members
(true members + the fpp tail) proceed to the exact anti-join. Merge is
bitwise OR — set-bit relations union — so per-partition blooms compose
exactly like the other sketches' partials. The set-bit-relation
representation (one row per set bit, <= m rows) is what keeps the whole
filter replayable in ANSI SQL; a production variant would pack bits into
m/64 int64 words with bit_or() — same semantics, denser transport.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, Window

from .sampling import split_key

#: Defaults sized so the sketch stays KB-scale while still colliding on
#: the test corpus (events has 150 users at sf0.01 vs width 256) — the
#: overestimate column in `cms_heavy_hitters` is exercised, not zero.
DEFAULT_DEPTH = 4
DEFAULT_WIDTH = 256


def cms_bucket(key_col: str, depth_i: int, width: int, seed: str) -> Column:
    """Bucket of ``key`` under hash row ``depth_i``: the 52-bit integer
    prefix of md5(f"{seed}-{i}|{key}") mod width — `encoding.fold_assign`
    with a per-depth seed. 52-bit mod-width bias < 2^-44 for any sane
    width; exact integer arithmetic in both engines."""
    h = F.conv(
        F.substring(split_key(key_col, f"{seed}-{depth_i}"), 1, 13), 16, 10
    ).cast("long")
    return (h % F.lit(width)).cast("int")


def cms_sketch(
    df: DataFrame,
    key_col: str,
    by: list[str] | None = None,
    depth: int = DEFAULT_DEPTH,
    width: int = DEFAULT_WIDTH,
    seed: str = "cms-v1",
) -> DataFrame:
    """(``by``*, depth, bucket, w): the cell counts of a count-min
    sketch of ``key_col``, one sketch per ``by`` group.

    One pass: each row expands to ``depth`` (depth, bucket) cells
    (posexplode of a depth-length array — map-side, no join), then ONE
    hash aggregate whose key space is |groups| x depth x width — the
    map-side partial collapse is what makes the build's shuffle output
    bounded by the sketch size, not the data size."""
    by = list(by or [])
    buckets = F.array(
        *[cms_bucket(key_col, i, width, seed) for i in range(depth)]
    )
    cells = df.select(*by, F.posexplode(buckets).alias("depth", "bucket"))
    return cells.groupBy(*by, "depth", "bucket").agg(
        F.count(F.lit(1)).alias("w")
    )


def cms_merge(sketches: DataFrame, by: list[str] | None = None) -> DataFrame:
    """Sum cell-wise across sketches (dropping the partition keys not in
    ``by``): CMS cells are plain counts, so union-of-sketches IS
    addition — the mergeability that lets per-day sketches answer
    arbitrary day-range frequency questions without rescanning days."""
    by = list(by or [])
    return sketches.groupBy(*by, "depth", "bucket").agg(
        F.sum("w").alias("w")
    )


def cms_estimate(
    sketch: DataFrame,
    keys: DataFrame,
    key_col: str,
    depth: int = DEFAULT_DEPTH,
    width: int = DEFAULT_WIDTH,
    seed: str = "cms-v1",
) -> DataFrame:
    """(key, est): the count-min estimate — min over the ``depth`` cell
    counts the key hashes into. ``keys`` is the (small) candidate
    relation; the sketch (<= depth*width rows) broadcasts, so probing N
    candidates is a map-side join of N*depth rows against a KB table."""
    buckets = F.array(
        *[cms_bucket(key_col, i, width, seed) for i in range(depth)]
    )
    probes = keys.select(
        F.col(key_col), F.posexplode(buckets).alias("depth", "bucket")
    )
    return (
        probes.join(F.broadcast(sketch), ["depth", "bucket"], "left")
        # A bucket no row ever hashed into has no cell row: its count is 0,
        # and min(..., 0) correctly floors the estimate for absent keys.
        .withColumn("w", F.coalesce("w", F.lit(0)))
        .groupBy(key_col)
        .agg(F.min("w").alias("est"))
    )


def histogram_bin(
    value_col: Column, lo: Column, hi: Column, n_bins: int
) -> Column:
    """Equi-width bin index in [0, n_bins): floor(((v-lo)/(hi-lo)) *
    n_bins), clamped so v == hi lands in the last bin. The EXACT IEEE
    operation order is part of the contract — the DuckDB replay performs
    the identical (v-lo), (hi-lo), divide, multiply, floor sequence, so
    bin assignment is bit-identical cross-engine (the same discipline as
    the PSI decile edges and the BM25 fixed-order sums). Both edges
    clamp — with a KNOWN-domain calibration (fixed lo/hi instead of a
    min/max scan), out-of-domain values land in the first/last bin
    rather than escaping [0, n_bins). A degenerate lo == hi domain
    (all values equal) collapses to bin 0. NULL values are the caller's
    job to filter first: least/greatest SKIP nulls (identically in
    Spark and DuckDB), so a NULL value would silently clamp into the
    last bin instead of staying NULL."""
    ratio = (value_col - lo) / (hi - lo)
    binned = F.greatest(
        F.lit(0),
        F.least(F.lit(n_bins - 1), F.floor(ratio * F.lit(float(n_bins)))),
    )
    return F.when(lo == hi, F.lit(0)).otherwise(binned).cast("int")


def histogram_sketch(
    df: DataFrame,
    value_col: str,
    lo: Column,
    hi: Column,
    by: list[str] | None = None,
    n_bins: int = 64,
) -> DataFrame:
    """(``by``*, bin, w): equi-width histogram counts per group — the
    QUANTILE member of the mergeable family. Against t-digest/KLL the
    trade is explicit: fixed edges cost a calibration pass (or a known
    domain) and bound quantile error by one bin width DETERMINISTICALLY,
    while staying exact-integer mergeable-by-addition and replayable in
    ANSI SQL. One hash aggregate, key space |groups| x n_bins — the
    map-side partial collapse bounds shuffle output by sketch size."""
    by = list(by or [])
    bins = df.select(
        *by, histogram_bin(F.col(value_col), lo, hi, n_bins).alias("bin")
    )
    return bins.groupBy(*by, "bin").agg(F.count(F.lit(1)).alias("w"))


def histogram_quantile_brackets(
    hist: DataFrame, quantiles: list[float]
) -> DataFrame:
    """(q, target_rank, bin, n_below, n_in_bin) for each requested
    quantile: the first bin whose cumulative count reaches
    ceil(q * N). Runs entirely on the <= n_bins-row merged histogram —
    a driver-scale relation; the corpus is long gone."""
    n = hist.agg(F.sum("w").alias("n"))
    cum = hist.select(
        "bin",
        F.col("w").alias("n_in_bin"),
        (
            F.sum("w").over(
                Window.orderBy("bin").rowsBetween(
                    Window.unboundedPreceding, -1
                )
            )
        ).alias("n_below"),
    ).na.fill({"n_below": 0})
    qs = F.array(*[F.lit(q) for q in quantiles])
    targets = n.select(
        F.explode(qs).alias("q"), F.col("n")
    ).select(
        "q", F.ceil(F.col("q") * F.col("n").cast("double")).alias("target_rank")
    )
    return (
        targets.join(
            cum,
            (F.col("n_below") + F.col("n_in_bin")) >= F.col("target_rank"),
            "inner",
        )
        .groupBy("q", "target_rank")
        .agg(
            F.min_by(F.struct("bin", "n_below", "n_in_bin"), "bin").alias("_b")
        )
        .select("q", "target_rank", "_b.bin", "_b.n_below", "_b.n_in_bin")
    )


#: Bloom defaults: 2048 bits / 3 hashes. At the test corpus's ~400
#: member keys the fill is ~44%, fpp ~9% — false positives actually
#: occur, so the probe's exact-check tail is exercised. Production
#: sizing is m ~ 10-15 bits per key for ~1% fpp.
DEFAULT_BLOOM_BITS = 2048
DEFAULT_BLOOM_HASHES = 3


def bloom_bit_positions(
    key_col: str, n_hashes: int, m: int, seed: str
) -> Column:
    """The ``n_hashes`` bit indexes of ``key`` — an array column, each
    element a `cms_bucket`-style md5-parity hash mod m."""
    return F.array(
        *[cms_bucket(key_col, i, m, seed) for i in range(n_hashes)]
    )


def bloom_build(
    df: DataFrame,
    key_col: str,
    n_hashes: int = DEFAULT_BLOOM_HASHES,
    m: int = DEFAULT_BLOOM_BITS,
    seed: str = "bloom-v1",
) -> DataFrame:
    """The filter as its set-bit relation: distinct ``bit`` values over
    the member keys' hash positions — <= m rows however many keys feed
    it. Merging filters built with the same (n_hashes, m, seed) is
    ``union().distinct()`` — bitwise OR."""
    bits = bloom_bit_positions(key_col, n_hashes, m, seed)
    return df.select(F.explode(bits).alias("bit")).distinct()


def bloom_probe(
    df: DataFrame,
    key_col: str,
    bloom: DataFrame,
    n_hashes: int = DEFAULT_BLOOM_HASHES,
    m: int = DEFAULT_BLOOM_BITS,
    seed: str = "bloom-v1",
) -> DataFrame:
    """``df`` + ``maybe_member``: true iff ALL the key's bits are set.
    No false negatives ever (a member's bits were all inserted); false
    positives at the documented fpp.

    Fully map-side: the filter collapses to ONE row holding its set-bit
    array (<= m elements), broadcast-crossJoined onto ``df``, and each
    row's k positions check membership with an array lookup — the
    probed corpus NEVER shuffles, which is the entire point of a Bloom
    pre-filter at 10^10 keys. The demo-scale lookup is a linear
    array_contains over the set bits; the production packing is the
    same plan with m/64 bit_or-packed int64 words and an O(1)
    element_at + bit test per position."""
    bits = bloom_bit_positions(key_col, n_hashes, m, seed)
    # One-row scalar: the whole filter as an array of its set bits
    # (order irrelevant for containment). The sanctioned ONE-ROW
    # broadcast crossJoin idiom — see tests/test_plan_shapes.py.
    filter_row = bloom.agg(F.collect_set("bit").alias("_bloom_bits"))
    return (
        df.crossJoin(F.broadcast(filter_row))
        .withColumn(
            "maybe_member",
            F.forall(bits, lambda b: F.array_contains("_bloom_bits", b)),
        )
        .drop("_bloom_bits")
    )
