"""Deterministic dataset splitting and sampling for training-data prep.

Two operators, both engine-stable (md5-keyed, no RNG) so every result is
reproducible run-to-run, stable under repartitioning/reordering, and
oracle-checkable in plain SQL:

- **hash_split** — train/val/test assignment by hashing the document id.
  ``randomSplit`` is the obvious Spark answer but is neither stable under
  resharding nor reproducible across engines; hashing the id is how
  production corpus pipelines pin membership (a doc's split never changes
  when the corpus grows, which is what prevents train/test contamination
  across dataset versions).
- **stratified_sample** — EXACT k rows per stratum via a window rank over
  an md5 ordering. ``df.sampleBy`` gives binomial (approximate) counts;
  training-data curation usually wants exact per-language / per-source
  budgets.

Scale notes (100 TB):
- hash_split is a pure map: no shuffle, no state, embarrassingly
  parallel, safe at any scale.
- stratified_sample shuffles once on the stratum key; per-stratum top-k
  via row_number needs the stratum to fit a single task's sort — true for
  per-language/per-source strata counts in the billions (sort is
  external). For extreme strata, swap the window for a two-phase
  per-partition top-k (operators/similarity.py does this for ANN re-rank).

Reference context: the reference pipeline has no sampling surface (its
dashboards cap points client-side, Dashboard/dashProyecto02.pdf p.1's
30k-point map cap); this family is part of the LLM-training-data
extension (SURVEY.md §7 step 8).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, Window

#: Hex alphabet of md5 output; string comparison over it is identical in
#: every engine (plain ASCII ordering), which is what makes the split
#: boundaries below engine-stable.
_MD5_BITS = 128


def split_key(id_col: str, seed: str) -> Column:
    """The 32-hex md5 of ``seed|id`` — uniform over [0, 2^128)."""
    return F.md5(
        F.concat(F.lit(f"{seed}|"), F.col(id_col).cast("string")).cast("binary")
    )


def split_thresholds(weights: dict[str, float]) -> list[tuple[str, str | None]]:
    """Cumulative split boundaries as 32-hex string literals.

    A fraction f maps to the hex representation of floor(f × 2^128);
    md5(seed|id) < threshold assigns the row. String-literal thresholds
    keep the comparison pure codegen (no hex→int parse on either engine).
    The last split gets ``None`` (catch-all ELSE).
    """
    total = sum(weights.values())
    out: list[tuple[str, str | None]] = []
    cum = 0.0
    items = list(weights.items())
    for name, w in items[:-1]:
        cum += w / total
        bound = format(int(cum * (1 << _MD5_BITS)), "032x")
        out.append((name, bound))
    out.append((items[-1][0], None))
    return out


def hash_split(
    df: DataFrame,
    id_col: str,
    weights: dict[str, float],
    seed: str = "split-v1",
) -> DataFrame:
    """Add a ``split`` column assigning each row to a named split.

    Deterministic in (id, seed): membership survives repartitioning,
    corpus growth, and engine changes. Change ``seed`` to draw a fresh
    assignment. Pure map-side expression — no shuffle at any scale.
    """
    key = split_key(id_col, seed)
    cases = split_thresholds(weights)
    result = F.lit(cases[-1][0])
    for name, bound in reversed(cases[:-1]):
        result = F.when(key < F.lit(bound), F.lit(name)).otherwise(result)
    return df.withColumn("split", result)


def global_cumsum(
    df: DataFrame,
    order_col: str,
    value_col: str,
    out_col: str = "cum_before",
    num_partitions: int | None = None,
    materialize: bool = False,
) -> DataFrame:
    """EXCLUSIVE prefix sum over a total order — without the single-task
    global sort a ``Window.orderBy`` with no partition key degenerates to.

    Two-phase (the classic Blelloch scan in DataFrame form): bucket the
    rows into contiguous order-key ranges, cumsum within each bucket,
    then add each bucket's broadcast offset (the sum of all earlier
    buckets). The offset relation is |buckets| rows — the only
    single-task step operates on that, never on the data. Identical
    output to the naive global window for any unique ``order_col``.

    Bucketing (r6 shuffle-count rework): for NUMERIC order columns the
    bucket is computed ARITHMETICALLY from a one-pass min/max scalar —
    ``floor((x - mn) / (mx - mn) * n)`` is monotone, so buckets are
    contiguous key ranges by construction and the corpus shuffles
    EXACTLY ONCE (the window's hash exchange on the bucket id). The
    previous ``repartitionByRange`` + ``spark_partition_id`` form
    shuffled the corpus twice (range exchange, then the window's hash
    exchange on ``__pid`` — Catalyst cannot know the physical range
    partitioning clusters ``__pid``) plus a sampling pass; it remains
    the fallback for non-numeric order columns (e.g. file-path strings
    in the compaction planner). Trade-off, documented: arithmetic
    buckets inherit the key distribution — heavily skewed keys load
    buckets unevenly (correctness unaffected; the window stays
    per-bucket), while range partitioning balanced by sampling. The
    catalog's order keys are dense ids, where the two are equivalent.
    """
    from pyspark.sql.types import DoubleType, FloatType, NumericType

    n = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    dt = df.schema[order_col].dataType
    # r10 optimization (guide §5 caching / §1.2 step 1): the input plan
    # is consumed THREE times — the eager min/max scalar below, the
    # per-bucket window, and the bucket-totals aggregate — so an
    # expensive upstream (e.g. curriculum_phases' bigram-LM scoring)
    # re-executed once per consumer; the phase profile read ~2.6 s of
    # the entry's time as exactly these replays. ``materialize=True``
    # checkpoints the input ONCE so every consumer scans the
    # materialized relation instead (paired A/B: curriculum_phases
    # 6.9 -> 3.5 s isolated). Opt-in, not default: for callers whose
    # input is a cheap scan (the token-count manifests of the packing/
    # sharding family) the eager checkpoint job COSTS more than the
    # replays it saves — epoch_shuffle_shards measured 1.47 -> 1.91 s
    # with it forced on, which is why the default stays off.
    if materialize:
        df = df.localCheckpoint()
    # float/double keys take the range-partition path: a NaN order key
    # sorts LAST in Spark's ordering but the arithmetic bucket formula
    # would clamp it to bucket 0 (NaN comparisons are false, so
    # greatest/least pick the bound), silently diverging from the naive
    # global-window contract; repartitionByRange places NaN in the last
    # range and stays correct (r6 ADVICE).
    if isinstance(dt, NumericType) and not isinstance(
        dt, (FloatType, DoubleType)
    ):
        # One bounded scalar pass (column-pruned min/max) fixes the
        # bucket boundaries; double arithmetic is monotone in the key,
        # which is all contiguity needs.
        row = df.agg(
            F.min(order_col).alias("mn"), F.max(order_col).alias("mx")
        ).first()
        mn, mx = row["mn"], row["mx"]
        if mn is None or mn == mx:
            bucket = F.lit(0)
        else:
            pos = (F.col(order_col).cast("double") - F.lit(float(mn))) / (
                F.lit(float(mx)) - F.lit(float(mn))
            )
            bucket = F.least(
                F.lit(n - 1),
                F.greatest(F.lit(0), F.floor(pos * n).cast("int")),
            )
        keyed = df.withColumn("__bkt", bucket)
    else:
        ranged = df.repartitionByRange(n, F.col(order_col))
        keyed = ranged.withColumn("__bkt", F.spark_partition_id())
    w = Window.partitionBy("__bkt").orderBy(F.col(order_col))
    local = keyed.withColumn(
        "__local_cum", F.sum(value_col).over(w) - F.col(value_col)
    )
    # |buckets| rows: map-side partial aggregation means only
    # (bucket, partial-sum) pairs shuffle here; the running offset is a
    # tiny single-task window, then broadcast back.
    totals = keyed.groupBy("__bkt").agg(F.sum(value_col).alias("__ptotal"))
    wo = Window.orderBy("__bkt").rowsBetween(Window.unboundedPreceding, -1)
    offsets = totals.withColumn(
        "__offset", F.coalesce(F.sum("__ptotal").over(wo), F.lit(0))
    ).select("__bkt", "__offset")
    return (
        local.join(F.broadcast(offsets), "__bkt")
        .withColumn(out_col, F.col("__local_cum") + F.col("__offset"))
        .drop("__bkt", "__local_cum", "__offset")
    )


def token_shards(
    df: DataFrame,
    order_col: str,
    token_col: str,
    budget: int,
    partition_col: str | None = None,
) -> DataFrame:
    """Assign each row to a ~``budget``-token shard — the manifest step
    that turns a curated corpus into bounded work units for a training
    run (one shard ≈ one data file / one loader task).

    Sequential cumulative packing: rows ordered by ``order_col`` within
    ``partition_col``; a row lands in shard ``floor(tokens_before /
    budget)``, so shards fill to the budget and can overflow by at most
    one document (the standard corpus-sharding approximation of bin
    packing — exact first-fit is inherently sequential and buys little
    for near-uniform doc lengths).

    Scale: with ``partition_col`` (e.g. language) the window partitions
    by it — per-stratum external sort, no global total order. Without
    one, the naive global window would funnel the whole corpus through a
    single task, so the global path routes through :func:`global_cumsum`
    (contiguous key buckets + per-bucket scan + broadcast offsets;
    one corpus shuffle for numeric keys) instead —
    same output, fully parallel.
    """
    if partition_col is None:
        cum = global_cumsum(df, order_col, token_col, out_col="__cb")
        return cum.withColumn(
            "shard_id", F.floor(F.col("__cb") / F.lit(budget)).cast("bigint")
        ).drop("__cb")
    w = Window.partitionBy(F.col(partition_col)).orderBy(F.col(order_col))
    cum_before = F.sum(token_col).over(w) - F.col(token_col)
    return df.withColumn(
        "shard_id", F.floor(cum_before / F.lit(budget)).cast("bigint")
    )


def pack_context_blocks(
    df: DataFrame,
    id_col: str,
    token_col: str,
    block_tokens: int,
    sep_tokens: int = 1,
) -> DataFrame:
    """GPT-style sequence packing manifest: docs concatenate in ``id_col``
    order (each followed by ``sep_tokens`` end-of-document markers) into
    one token stream, cut into fixed ``block_tokens`` context windows.
    One output row per (doc, block) the doc occupies — a boundary-
    crossing doc SPLITS into head/tail rows; nothing pads, nothing
    drops, so every block except the final one is exactly full (the
    training-efficiency property packing exists for; `token_shards` is
    the coarser file-granularity cousin that never splits docs).

    Columns: ``block_idx``, ``id_col``, ``start_in_block`` /
    ``end_in_block`` (the block-local token span), ``is_whole`` (doc fits
    this single block). Offsets use ``div`` integer arithmetic end to
    end — exact past 2^53 tokens where float floor-division would drift.

    Scale: the only shuffle is `global_cumsum`'s range exchange; the
    block expansion is a map-side sequence/explode emitting
    1 + boundary-crossings rows per doc.
    """
    b = F.lit(block_tokens)
    sized = df.select(
        id_col, (F.col(token_col) + F.lit(sep_tokens)).cast("long").alias("_len")
    )
    pos = global_cumsum(sized, id_col, "_len", out_col="_start")
    spans = pos.select(
        id_col,
        "_len",
        "_start",
        F.explode(
            F.sequence(
                F.expr(f"_start div {block_tokens}"),
                F.expr(f"(_start + _len - 1) div {block_tokens}"),
            )
        ).alias("block_idx"),
    )
    return spans.select(
        "block_idx",
        id_col,
        F.greatest(F.lit(0), F.col("_start") - F.col("block_idx") * b)
        .cast("long")
        .alias("start_in_block"),
        F.least(b.cast("long"), F.col("_start") + F.col("_len") - F.col("block_idx") * b)
        .cast("long")
        .alias("end_in_block"),
        (
            F.expr(f"_start div {block_tokens}")
            == F.expr(f"(_start + _len - 1) div {block_tokens}")
        ).alias("is_whole"),
    )


def stratified_sample(
    df: DataFrame,
    stratum_col: str,
    k: int,
    id_col: str,
    seed: str = "sample-v1",
) -> DataFrame:
    """Exactly min(k, |stratum|) rows per stratum, chosen by md5 order.

    The md5 of ``seed|id`` is a uniform random (but deterministic) sort
    key, so taking the first k per stratum is a uniform without-
    replacement sample with EXACT counts — what ``sampleBy``'s binomial
    draw can't give. Ties are impossible (md5 collisions aside), so the
    sample is total-order stable; ``id_col`` breaks the (never-hit) tie
    deterministically anyway.
    """
    key = split_key(id_col, seed)
    w = Window.partitionBy(stratum_col).orderBy(key, F.col(id_col))
    return (
        df.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= k)
        .drop("__rk")
    )


#: 2^52 — the first 13 md5 hex digits parse to a 52-bit integer, which a
#: double represents EXACTLY; dividing by the power of two is also exact,
#: so the uniform below is bit-identical on every engine.
_U52 = float(1 << 52)


def hash_uniform(id_col: str, seed: str) -> Column:
    """Deterministic uniform in [0, 1): the first 52 bits of
    ``md5(seed|id)`` scaled by 2^-52. Exact on every engine — the parse
    is integer arithmetic and the scale is a power of two — unlike
    ``rand()``, which is engine- and partitioning-dependent."""
    return (
        F.conv(F.substring(split_key(id_col, seed), 1, 13), 16, 10)
        .cast("long")
        .cast("double")
        / F.lit(_U52)
    )


def weighted_sample(
    df: DataFrame,
    k: int,
    id_col: str,
    weight_col: str | Column,
    seed: str = "wsample-v1",
) -> DataFrame:
    """Weight-proportional sample of ``k`` rows WITHOUT replacement
    (Efraimidis–Spirakis A-ES): each row draws key ``u^(1/w)`` with a
    deterministic uniform ``u``; the k largest keys are the sample.
    Ordering by ``u^(1/w)`` is equivalent to ordering by ``ln(u)/w``
    (monotone transform; ``ln(u) < 0``), which is the numerically safer
    form computed here as ``__wkey``.

    The curation use-case: sample a training subset where a document's
    inclusion probability is proportional to its quality/length weight,
    reproducibly (same seed ⇒ same sample, regardless of partitioning,
    row order, or engine — the md5 uniform is exact everywhere, and the
    single ``ln`` is the only float op in the key).

    Rows with ``weight <= 0`` or null are excluded (zero mass). Scale:
    the key is a pure map; top-k runs as per-partition top-k merged on
    the driver (TakeOrdered) — no global sort, no shuffle of the data.
    """
    w = F.col(weight_col) if isinstance(weight_col, str) else weight_col
    w = w.cast("double")
    key = F.log(hash_uniform(id_col, seed)) / w
    return (
        df.filter(w > 0)
        .withColumn("__wkey", key)
        .orderBy(F.desc("__wkey"), F.col(id_col))
        .limit(k)
    )


def temperature_mixture(
    per_group: DataFrame,
    group_col: str,
    tokens_col: str,
    budget: int,
    alpha: float = 0.5,
) -> DataFrame:
    """Temperature-scaled mixture plan over group token counts — the
    multilingual/domain-reweighting idiom (public methodology: mBERT /
    XLM-R exponential smoothing, p_g ∝ tokens_g^α): low-resource groups
    are upweighted relative to their raw share as α → 0.

    Input: one row per group with an exact token count. Output adds
    ``mix_share`` (normalized tokens^α, rounded to 6), ``planned_tokens``
    (share × ``budget``, rounded to BIGINT), and ``epochs`` (planned /
    available, rounded to 4 — values > 1 mean the group repeats).

    Cross-engine determinism: the normalizing denominator Σ tokens^α is
    a SEQUENTIAL double fold over the groups in ``group_col`` order
    (array_sort + aggregate — the same ordered-fold construction the
    cosine oracles use), not a parallel SUM, so it is bit-identical in
    any engine that replays the same fold. With the default α = 0.5 the
    power is computed as sqrt(), which IEEE 754 requires to be correctly
    rounded — bit-exact everywhere; other α values go through pow() and
    inherit its last-ulp engine variance.

    Scale: |groups| is sources/languages/domains — tens to thousands —
    so the fold input is a collect_list over a trivially small relation;
    the plan broadcasts back onto the corpus for the actual resampling
    pass (`weighted_sample` / `hash_split` per group).
    """
    t = F.col(tokens_col).cast("double")
    powered = F.sqrt(t) if alpha == 0.5 else F.pow(t, F.lit(alpha))
    scored = per_group.select(
        F.col(group_col), F.col(tokens_col), powered.alias("__pw")
    )
    denom = scored.agg(
        F.aggregate(
            F.array_sort(F.collect_list(F.struct(group_col, "__pw"))),
            F.lit(0.0),
            lambda acc, x: acc + x["__pw"],
        ).alias("__denom")
    )
    share = F.col("__pw") / F.col("__denom")
    return (
        scored.crossJoin(F.broadcast(denom))
        .select(
            group_col,
            tokens_col,
            F.round(share, 6).alias("mix_share"),
            F.round(share * F.lit(float(budget)), 0)
            .cast("bigint")
            .alias("planned_tokens"),
        )
        .withColumn(
            "epochs",
            F.round(
                F.col("planned_tokens") / F.col(tokens_col).cast("double"), 4
            ),
        )
    )


def pack_sequences(
    df: DataFrame,
    id_col: str,
    tokens_col: str,
    seq_len: int,
) -> DataFrame:
    """Pack documents into fixed-length training sequences — the GPT-style
    corpus packing step: concatenate docs in ``id_col`` order and cut the
    token stream every ``seq_len`` tokens. A document spanning a cut is
    SPLIT across consecutive sequences (the packing used when no
    document-boundary padding is wanted); emitted as one row per
    (doc, sequence) span.

    Output per span: ``seq_id``, ``offset`` (position of the span inside
    its sequence), ``span_tokens``, ``is_split`` (doc crosses ≥1 cut).
    Zero-token docs emit no spans.

    Scale: the only global coordination is the EXCLUSIVE prefix sum of
    token counts, computed by :func:`global_cumsum` (contiguous buckets +
    per-partition scan + |partitions|-row broadcast offsets — no
    single-task global window). Span expansion is a per-row
    ``sequence()`` explode: a doc touches ceil(tokens/seq_len)+1
    sequences at most, so the explode factor is bounded by document
    length, never corpus size.
    """
    L = F.lit(seq_len)
    t = F.col(tokens_col).cast("long")
    # Nonpositive token counts are excluded BEFORE the prefix sum — a
    # zero-or-negative row must not shift later documents' offsets.
    cum = global_cumsum(df.filter(t > 0), id_col, tokens_col, out_col="__start")
    spans = (
        cum
        .withColumn("__end", F.col("__start") + t)
        .withColumn("__first", F.floor(F.col("__start") / L))
        .withColumn("__last", F.floor((F.col("__end") - 1) / L))
        .select(
            id_col,
            tokens_col,
            F.explode(F.sequence("__first", "__last")).alias("seq_id"),
            "__start",
            "__end",
            (F.col("__last") > F.col("__first")).alias("is_split"),
        )
    )
    seq_start = F.col("seq_id") * L
    seq_end = seq_start + L
    return spans.select(
        id_col,
        "seq_id",
        (F.greatest(F.col("__start"), seq_start) - seq_start).alias("offset"),
        (
            F.least(F.col("__end"), seq_end)
            - F.greatest(F.col("__start"), seq_start)
        ).alias("span_tokens"),
        "is_split",
    )


def quota_cap(
    df: DataFrame,
    key_col: str,
    order_col,
    max_per_key: int,
    tiebreak_col: str | None = None,
    salt_buckets: int = 16,
) -> DataFrame:
    """Per-key quota capping — the domain-share limiter every curation
    run applies so no single source/domain dominates the training mix
    (the classic "cap any one domain at N documents" rule): keep the top
    ``max_per_key`` rows per ``key_col`` ranked by ``order_col``
    DESCENDING (quality first), deterministic under ties via
    ``tiebreak_col`` ASCENDING.

    Scale — two-phase salted top-N (the ``skew.py`` pattern): a single
    ``Window.partitionBy(key)`` would put EVERY row of a mega-domain on
    one task, which at 100 TB is a straggler-or-OOM, not a plan. Phase 1
    spreads each key over ``salt_buckets`` sub-partitions (deterministic
    content hash) and keeps the top ``max_per_key`` per (key, salt) —
    correct because a row in a key's true top N is in its salt bucket's
    top N for ANY salt assignment, so phase-1 survivors are a superset
    of the answer. Phase 2 re-ranks the ≤ max_per_key × salt_buckets
    survivors per key — a bounded partition no matter how hot the
    domain. Output is IDENTICAL to the single-window form (same final
    ordering; property-tested), the hot key's corpus-scale work just
    runs on ``salt_buckets`` tasks. Returns the input rows that survive
    the cap (no flag column: downstream unions never need the dropped
    side — recompute with a larger cap instead).
    """
    from pyspark.sql import Window

    order_c = F.col(order_col) if isinstance(order_col, str) else order_col
    ordering = [order_c.desc()]
    if tiebreak_col is not None:
        ordering.append(F.col(tiebreak_col).asc())
    # Deterministic per-row salt from the ordering content itself (salt
    # placement never changes the RESULT — any assignment yields the
    # same survivor superset — but a content hash keeps runs and
    # retried tasks byte-stable, unlike monotonically_increasing_id).
    salt_src = [F.col(key_col), order_c]
    if tiebreak_col is not None:
        salt_src.append(F.col(tiebreak_col))
    salted = df.withColumn(
        "__salt",
        F.pmod(F.xxhash64(*salt_src), F.lit(salt_buckets)).cast("int"),
    )
    w1 = Window.partitionBy(key_col, "__salt").orderBy(*ordering)
    survivors = (
        salted.withColumn("__rn", F.row_number().over(w1))
        .filter(F.col("__rn") <= max_per_key)
        .drop("__rn")
    )
    w2 = Window.partitionBy(key_col).orderBy(*ordering)
    return (
        survivors.withColumn("__rn", F.row_number().over(w2))
        .filter(F.col("__rn") <= max_per_key)
        .drop("__rn", "__salt")
    )
