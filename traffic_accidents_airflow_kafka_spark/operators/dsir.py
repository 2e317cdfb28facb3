"""DSIR-style data selection via importance resampling (public
methodology: Xie et al. 2023, "Data Selection for Language Models via
Importance Resampling") — score every raw document by how much more
likely its hashed bag-of-words is under a TARGET corpus distribution
than under the raw corpus distribution, then keep the top slice.

The published recipe: featurize documents into hashed n-gram buckets,
fit two bag-of-words models (target and raw), and weight each raw
document by ``log p_target(x) - log p_raw(x)`` summed over its tokens.
The reference pipeline has no data-selection stage at all; this is part
of the LLM-training-data surface the north-star brief mandates.

Cross-engine exactness — the same trick the unigram tokenizer uses
(operators/unigram.py): instead of float log-likelihoods we score in
INTEGER bit-surprisals, ``cost(b) = length(bin(total DIV cnt(b)))``
= 1 + floor(log2(total/cnt)), with add-one smoothing over the full
fixed bucket domain so no bucket has zero mass. A document's importance
score is then

    score_bits = sum over tokens t of (cost_raw(b(t)) - cost_tgt(b(t)))

— positive means the document looks more like the target than like the
average raw document, in whole bits. Every count, division, and sum is
integer, so Spark and DuckDB agree bit-for-bit and the catalog entry
carries a FULL value-hash oracle (a float-log implementation could only
be banded). The monotone map from log-ratio to bit-ratio preserves the
selection ORDER except within 1-bit quantization ties, which is exactly
the resolution the smoothed hashed model is honest about anyway.

Two scoring variants, matching the two deployment shapes:

- :func:`importance_scores` — both models learned in-job from a target
  PREDICATE over the corpus (the paper's formulation; pinned by a
  planted-distribution-shift unit test).
- :func:`importance_scores_vs_model` — the raw model learned from the
  corpus, the target model shipped as a literal cost table (production:
  the target corpus is fit once offline and distributed as an
  artifact, like the model_filter classifier weights). The catalog
  entry uses this form.

Scale shape: the raw bucket model is one vocabulary-sized hash
aggregate (bounded by ``n_buckets``, not the corpus), broadcast into a
single pass over the exploded token stream; the per-doc rollup is one
doc-keyed aggregate. Nothing larger than (doc_id, long) ever shuffles;
at 100 TB the model tables are still ``n_buckets`` rows.
"""

from __future__ import annotations

import hashlib

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

from .text import token_bucket


def doc_token_buckets(
    docs: DataFrame, text_col: str = "text", n_buckets: int = 64
) -> DataFrame:
    """(doc_id, lang, bucket): one row per token occurrence, feature-
    hashed into [0, n_buckets) via the engine-stable md5 bucket
    (operators/text.py:token_bucket). NULL text coalesces to '' (one
    empty-string token) so the join-based rollup and the fold-based
    :func:`inline_score` stay bit-identical on every row — without the
    coalesce, split(NULL) nulls the fold while the explode silently
    DROPS the doc from the join side."""
    tok = F.explode(
        F.split(F.coalesce(F.col(text_col), F.lit("")), " ")
    ).alias("tok")
    return docs.select("doc_id", "lang", tok).select(
        "doc_id", "lang", token_bucket(F.col("tok"), n_buckets).alias("bucket")
    )


def bucket_bit_costs(
    buckets: DataFrame, n_buckets: int = 64, alias: str = "cost"
) -> DataFrame:
    """(bucket, {alias}): add-one-smoothed integer bit-surprisal of each
    bucket of a (…, bucket) token relation — cost = length(bin(total
    DIV cnt)) over smoothed counts, the unigram-tokenizer integer-
    surprisal idiom. The full 0..n_buckets-1 domain is materialized so
    unseen buckets get the +1 floor (maximal surprisal) instead of
    disappearing."""
    spark = buckets.sparkSession
    domain = spark.range(n_buckets).select(F.col("id").alias("bucket"))
    cnt = buckets.groupBy("bucket").agg(F.count(F.lit(1)).alias("__c"))
    smoothed = domain.join(cnt, "bucket", "left").select(
        "bucket",
        (F.coalesce("__c", F.lit(0)) + F.lit(1)).cast("long").alias("__s"),
    )
    tot = smoothed.agg(F.sum("__s").alias("__t"))
    return smoothed.crossJoin(F.broadcast(tot)).select(
        "bucket",
        F.length(F.bin(F.expr("__t DIV __s"))).cast("long").alias(alias),
    )


def _rollup(
    toks: DataFrame, costs: DataFrame, select_centibits_per_token: int = 0
) -> DataFrame:
    """Per-doc importance rollup shared by both scoring variants.
    ``selected`` thresholds the per-token importance RATE — written as
    the cross-multiplied integer comparison ``score_bits * 100 >
    thresh * n_tokens`` so no negative integer division (floor vs
    truncate differs across engines) enters the contract; thresh = 0
    degenerates to the sign test score_bits > 0."""
    th = int(select_centibits_per_token)
    return (
        toks.join(F.broadcast(costs), "bucket")
        .groupBy("doc_id", "lang")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_tokens"),
            F.sum(F.col("raw_cost") - F.col("tgt_cost"))
            .cast("long")
            .alias("score_bits"),
        )
        .select(
            "doc_id",
            "lang",
            "n_tokens",
            "score_bits",
            (
                F.col("score_bits") * 100 > F.lit(th) * F.col("n_tokens")
            ).alias("selected"),
        )
    )


def importance_scores(
    docs: DataFrame,
    target_pred: Column,
    text_col: str = "text",
    n_buckets: int = 64,
) -> DataFrame:
    """(doc_id, lang, n_tokens, score_bits, selected): the paper-faithful
    two-learned-models form — ``target_pred`` is a boolean Column over
    the docs relation defining the target corpus ("make the raw mix
    look like this slice"); the raw model is fit on the WHOLE corpus.
    ``selected`` is the sign test score_bits > 0; callers wanting a
    fixed budget rank by (score_bits desc, doc_id) instead.

    Note the honest quantization: whole-bit costs resolve only
    distributional differences of >= 2x per bucket. A target slice that
    is lexically indistinguishable from the raw corpus (sampling noise
    only) scores ~0 everywhere — the planted-corpus unit test pins that
    a slice with a REAL distribution shift separates cleanly.
    """
    toks = doc_token_buckets(docs, text_col, n_buckets)
    tgt_toks = doc_token_buckets(
        docs.filter(target_pred), text_col, n_buckets
    )
    raw_cost = bucket_bit_costs(toks, n_buckets, "raw_cost")
    tgt_cost = bucket_bit_costs(tgt_toks, n_buckets, "tgt_cost")
    return _rollup(toks, raw_cost.join(tgt_cost, "bucket"))


def target_cost_model(
    n_buckets: int = 64,
    lo: int = 3,
    hi: int = 10,
    seed: str = "dsir-tgt-v1",
) -> list[int]:
    """Deterministic per-bucket integer bit costs standing in for an
    OFFLINE-trained target model — in production DSIR the target
    distribution (e.g. Wikipedia) is fit once and shipped as an
    artifact, exactly like the literal classifier weights
    model_filter_stats uses (operators/text.py:classifier_weights).
    cost(b) = lo + md5("{seed}|{b}") % (hi - lo + 1), engine-free
    (pure Python, embedded as a literal in both plans)."""
    return [
        lo
        + int(hashlib.md5(f"{seed}|{b}".encode()).hexdigest()[:8], 16)
        % (hi - lo + 1)
        for b in range(n_buckets)
    ]


def freeze_raw_costs(
    docs: DataFrame, text_col: str = "text", n_buckets: int = 64
) -> list[int]:
    """Collect the learned raw-model bucket costs into a plain list —
    the model-freeze step of a streaming deployment: the raw model is
    re-fit on history periodically (one bounded aggregate), frozen to
    ``n_buckets`` integers, and embedded as plan literals in the
    stateless arrival scorer (:func:`inline_score`). The collect is
    model-sized (64 longs), never data-sized."""
    rows = bucket_bit_costs(
        doc_token_buckets(docs, text_col, n_buckets), n_buckets, "cost"
    ).collect()
    out = [0] * n_buckets
    for r in rows:
        out[int(r["bucket"])] = int(r["cost"])
    return out


def inline_score(
    text_col: str,
    raw_costs: list[int],
    target_costs: list[int],
    select_centibits_per_token: int = 0,
) -> list[Column]:
    """Per-ROW importance scoring with both models as plan literals —
    (n_tokens, score_bits, selected) columns computed by a pure codegen
    fold over the token array: md5 bucket → literal-array cost lookup →
    running integer sum. ZERO shuffle and zero state, which is what
    makes the scorer safely streamable (append mode, no watermark, no
    state store) and exactly how a production stream scores arrivals
    against broadcast models. Bit-identical to the join-based
    :func:`importance_scores_vs_model` rollup by construction (same
    bucket hash, same integer costs, same NULL-text coalesce — NULL
    scores as one empty-string token on both paths)."""
    nb = len(raw_costs)
    assert len(target_costs) == nb
    raw_lit = F.array(*[F.lit(int(c)) for c in raw_costs])
    tgt_lit = F.array(*[F.lit(int(c)) for c in target_costs])
    toks = F.split(F.coalesce(F.col(text_col), F.lit("")), " ")

    def delta(t: Column) -> Column:
        idx = (token_bucket(t, nb) + 1).cast("int")
        return (
            F.element_at(raw_lit, idx) - F.element_at(tgt_lit, idx)
        ).cast("long")

    score = F.aggregate(
        F.transform(toks, delta),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    n_tokens = F.size(toks).cast("long")
    th = int(select_centibits_per_token)
    return [
        n_tokens.alias("n_tokens"),
        score.alias("score_bits"),
        (score * 100 > F.lit(th) * n_tokens).alias("selected"),
    ]


def importance_scores_vs_model(
    docs: DataFrame,
    target_costs: list[int],
    text_col: str = "text",
    n_buckets: int | None = None,
    select_centibits_per_token: int = 0,
) -> DataFrame:
    """(doc_id, lang, n_tokens, score_bits, selected): importance
    weights against a SHIPPED target model — the raw bucket model is
    learned from the corpus (add-one-smoothed integer bit costs), the
    target bucket costs arrive as a literal list (see
    :func:`target_cost_model`). The production deployment shape: the
    expensive side (the 100 TB raw corpus) is modeled in one bounded
    aggregate; the target model is an artifact."""
    nb = n_buckets if n_buckets is not None else len(target_costs)
    if len(target_costs) != nb:
        # Same contract inline_score asserts: a short target table would
        # silently NULL the scores of every doc touching the missing
        # buckets (element_at past the literal array's end).
        raise ValueError(
            f"target_costs has {len(target_costs)} entries for "
            f"n_buckets={nb}"
        )
    toks = doc_token_buckets(docs, text_col, nb)
    raw_cost = bucket_bit_costs(toks, nb, "raw_cost")
    tgt = F.element_at(
        F.array(*[F.lit(int(c)) for c in target_costs]),
        (F.col("bucket") + 1).cast("int"),
    ).cast("long")
    return _rollup(
        toks,
        raw_cost.select("bucket", "raw_cost", tgt.alias("tgt_cost")),
        select_centibits_per_token,
    )
