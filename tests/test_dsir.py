"""DSIR importance-resampling semantics (operators/dsir.py).

The catalog oracle (tests/test_catalog_oracle.py) value-hashes the
shipped-target-model entry end to end; these tests pin what the oracle
can't see on the uniform synthetic corpus:

- the paper-faithful two-learned-models form SEPARATES a target slice
  with a real distribution shift (planted disjoint vocabularies),
- the shipped-model scorer matches an independent pure-Python replay
  of the md5 bucketing + smoothed integer bit costs,
- the selection threshold is the cross-multiplied per-token rate.
"""

from __future__ import annotations

import hashlib

import pyspark.sql.functions as F

from traffic_accidents_airflow_kafka_spark.operators import dsir

NB = 64  # tokens below hash to disjoint buckets at 64 (asserted in-test)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, lang string, text string")


def test_planted_shift_separates(spark):
    """Target slice speaks a disjoint vocabulary -> target-like raw docs
    must outscore off-target docs under two learned models. The raw
    corpus is dominated by off-target mass so target-like tokens are
    genuinely RARER under the raw model than under the target model
    (score > 0), the regime DSIR selects in."""
    tgt_toks = ["alpha", "beta", "gamma", "delta"]
    off_toks = ["omega", "psi", "chi", "phi"]
    assert not {_py_bucket(t, NB) for t in tgt_toks} & {
        _py_bucket(t, NB) for t in off_toks
    }
    tgt_text = " ".join(tgt_toks * 2)
    off_text = " ".join(off_toks * 2)
    rows = (
        # the target slice itself (defines the target distribution)
        [(i, "tgt", tgt_text) for i in range(10)]
        # raw docs that look like the target
        + [(100 + i, "raw", tgt_text) for i in range(3)]
        # the dominant off-target raw mass
        + [(200 + i, "raw", off_text) for i in range(30)]
    )
    got = (
        dsir.importance_scores(
            _docs(spark, rows), F.col("lang") == "tgt", n_buckets=NB
        )
        .filter(F.col("lang") == "raw")
        .collect()
    )
    like = [r for r in got if r.doc_id < 200]
    unlike = [r for r in got if r.doc_id >= 200]
    assert min(r.score_bits for r in like) > max(r.score_bits for r in unlike)
    assert all(r.selected for r in like)
    assert not any(r.selected for r in unlike)


def _py_bucket(tok: str, nb: int) -> int:
    return int(hashlib.md5(tok.encode()).hexdigest()[:8], 16) % nb


def _py_cost(counts: dict[int, int], nb: int) -> dict[int, int]:
    smoothed = {b: counts.get(b, 0) + 1 for b in range(nb)}
    total = sum(smoothed.values())
    return {b: len(bin(total // s)) - 2 for b, s in smoothed.items()}


def test_vs_model_matches_python_replay(spark):
    rows = [
        (1, "en", "a b c a"),
        (2, "de", "c d e"),
        (3, "en", "f f f f f f"),
    ]
    tgt = dsir.target_cost_model(NB, seed="test-tgt")
    got = {
        r.doc_id: r
        for r in dsir.importance_scores_vs_model(
            _docs(spark, rows), tgt, n_buckets=NB
        ).collect()
    }
    # independent replay
    toks = {d: t.split(" ") for d, _, t in rows}
    counts: dict[int, int] = {}
    for ts in toks.values():
        for t in ts:
            b = _py_bucket(t, NB)
            counts[b] = counts.get(b, 0) + 1
    raw_cost = _py_cost(counts, NB)
    for doc_id, ts in toks.items():
        want = sum(raw_cost[_py_bucket(t, NB)] - tgt[_py_bucket(t, NB)] for t in ts)
        assert got[doc_id].score_bits == want
        assert got[doc_id].n_tokens == len(ts)
        assert got[doc_id].selected == (want > 0)


def test_threshold_is_per_token_rate(spark):
    """selected <=> score_bits * 100 > thresh * n_tokens, negative
    thresholds included (no negative integer division anywhere)."""
    rows = [(1, "en", "a a a a"), (2, "en", "zq zq")]
    tgt = [20] * NB  # absurdly expensive target -> strongly negative scores
    out = {
        r.doc_id: r
        for r in dsir.importance_scores_vs_model(
            _docs(spark, rows), tgt, n_buckets=NB,
            select_centibits_per_token=-2000,
        ).collect()
    }
    for r in out.values():
        assert r.score_bits < 0
        assert r.selected == (r.score_bits * 100 > -2000 * r.n_tokens)


def test_inline_score_equals_join_scorer(spark):
    """The streaming literal-fold scorer (freeze model -> plan-literal
    fold) must be BIT-identical to the join-based batch scorer on the
    same corpus — the contract that makes stream_dsir_scores' oracle
    (a join-side SQL replay) valid for the fold-side Spark plan.
    Exercises hash collisions (nb=8), repeated tokens, and a negative
    per-token threshold."""
    import pyspark.sql.functions as F2

    nb = 8
    rows = [
        (i, "en" if i % 2 else "de", " ".join(f"w{j % 13}" for j in range(3 + i)))
        for i in range(40)
    ]
    docs = _docs(spark, rows)
    tgt = dsir.target_cost_model(nb, seed="prop-tgt")
    th = -150
    join_side = {
        r.doc_id: (r.n_tokens, r.score_bits, r.selected)
        for r in dsir.importance_scores_vs_model(
            docs, tgt, n_buckets=nb, select_centibits_per_token=th
        ).collect()
    }
    frozen = dsir.freeze_raw_costs(docs, n_buckets=nb)
    fold_side = {
        r.doc_id: (r.n_tokens, r.score_bits, r.selected)
        for r in docs.select(
            "doc_id",
            *dsir.inline_score("text", frozen, tgt, select_centibits_per_token=th),
        ).collect()
    }
    assert fold_side == join_side
    # and the frozen model really is the join scorer's learned model
    learned = dsir.bucket_bit_costs(
        dsir.doc_token_buckets(docs, n_buckets=nb), nb, "cost"
    ).collect()
    assert frozen == [
        c for _, c in sorted((r["bucket"], r["cost"]) for r in learned)
    ]
    assert docs.select(
        "doc_id", *dsir.inline_score("text", frozen, tgt)
    ).filter(F2.col("n_tokens") <= 0).count() == 0


def test_target_cost_model_deterministic():
    a = dsir.target_cost_model(64)
    b = dsir.target_cost_model(64)
    assert a == b
    assert all(3 <= c <= 10 for c in a)
    assert len(set(a)) > 1  # spread, not a constant table
