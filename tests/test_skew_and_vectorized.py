"""Salted-join equivalence, two-phase aggregation equivalence, and the
vectorized cosine path agreeing with the exact fold."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from traffic_accidents_airflow_kafka_spark.operators import similarity, skew
from traffic_accidents_airflow_kafka_spark.sources.tables import load_table


@pytest.fixture(scope="module")
def skewed(spark):
    # 90% of fact rows share one hot key.
    fact = spark.range(1000).select(
        F.when(F.col("id") < 900, 7).otherwise(F.col("id") % 10).alias("k"),
        F.col("id").alias("v"),
    )
    dim = spark.createDataFrame([(i, f"name_{i}") for i in range(10)], "k long, name string")
    return fact, dim


def test_salted_join_matches_plain_join(spark, skewed):
    fact, dim = skewed
    plain = fact.join(dim, "k").groupBy("name").agg(F.count(F.lit(1)).alias("n"), F.sum("v").alias("s"))
    salted = (
        skew.salted_join(fact, dim, "k", salt_buckets=8)
        .groupBy("name")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("v").alias("s"))
    )
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_salt_actually_spreads_hot_key(spark, skewed):
    fact, _ = skewed
    spread = (
        skew.with_salt(fact, "k", 8)
        .filter(F.col("k") == 7)
        .groupBy("__salt")
        .count()
        .collect()
    )
    assert len(spread) == 8  # the 900 hot rows occupy all salt buckets
    assert max(r["count"] for r in spread) < 900


def test_two_phase_agg_matches_single_phase(spark, skewed):
    fact, _ = skewed
    direct = {
        (r["k"],): (r["n"], r["s"])
        for r in fact.groupBy("k").agg(F.count(F.lit(1)).alias("n"), F.sum("v").alias("s")).collect()
    }
    two = {
        (r["k"],): (r["n"], r["s"])
        for r in skew.two_phase_agg(
            fact, ["k"], {"n": F.count(F.lit(1)), "s": F.sum("v")}, salt_buckets=8
        ).collect()
    }
    assert direct == two


def test_join_cardinality_prediction_matches_reality(spark):
    """The guard's join_rows must equal the ACTUAL row count of the
    join it predicts — exact, not an estimate — including a planted
    hot-key blowup and keys private to each side."""
    left = spark.createDataFrame(
        [(k,) for k in [1] * 100 + [2] * 3 + [7]], "k long"
    )
    right = spark.createDataFrame(
        [(k,) for k in [1] * 50 + [2] * 2 + [9]], "k long"
    )
    [st] = skew.join_cardinality_stats("t", left, "k", right, "k").collect()
    actual = left.join(right, "k").count()
    assert st.join_rows == actual == 100 * 50 + 3 * 2
    assert st.top_pair_rows == 100 * 50
    assert st.n_left == 104 and st.n_right == 53  # private keys counted
    assert st.n_common_keys == 2


def test_vectorized_cosine_matches_fold(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    qids = emb.select("vec_id").filter(F.col("vec_id") < 5)
    exact = {
        (r["qid"], r["rank"]): (r["nid"], r["cosine"])
        for r in similarity.cosine_topk(emb, qids, k=3).collect()
    }
    vec = {
        (r["qid"], r["rank"]): (r["nid"], r["cosine"])
        for r in similarity.cosine_topk_vectorized(emb, qids, k=3).collect()
    }
    assert set(exact) == set(vec)
    for key, (nid, cos) in exact.items():
        vnid, vcos = vec[key]
        assert vnid == nid  # same neighbor ranking
        assert abs(vcos - cos) < 1e-6


def test_vectorized_cosine_caps_driver_collect(spark, sf_dir):
    """The query-side collect is bounded: exceeding max_queries raises
    instead of silently pulling a corpus to the driver — including the
    query_ids=None whole-table form."""
    import pytest

    emb = load_table(spark, sf_dir, "embeddings")
    with pytest.raises(ValueError, match="max_queries"):
        similarity.cosine_topk_vectorized(emb, None, k=3, max_queries=10)
    # A bounded query set under the cap still works.
    qids = emb.select("vec_id").filter(F.col("vec_id") < 3)
    rows = similarity.cosine_topk_vectorized(emb, qids, k=3, max_queries=10).collect()
    assert {r["qid"] for r in rows} == {0, 1, 2}


def test_ivf_ann_recall_vs_exact(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    exact_top1 = {
        r["qid"]: r["nid"]
        for r in similarity.cosine_topk(emb, k=1).collect()
    }
    ivf = similarity.ivf_ann_topk(emb, n_centroids=8, n_probe=3, k=1)
    ivf_top1 = {r["qid"]: r["nid"] for r in ivf.collect()}
    # Probing 3/8 cells must recover a solid share of true nearest
    # neighbors (recall is the tunable; the structure is what we assert).
    hits = sum(1 for q, n in exact_top1.items() if ivf_top1.get(q) == n)
    assert hits / len(exact_top1) > 0.5
    # Every query produced a candidate (probe cells are never empty here).
    assert set(ivf_top1) == set(exact_top1)


def test_ivf_vectorized_matches_exact_fold_path(spark, sf_dir):
    """The Arrow matmul path and the exact HOF-fold path share centroids,
    probing, and tie-breaks — same neighbors, cosines within float
    re-association tolerance."""
    emb = load_table(spark, sf_dir, "embeddings")
    vec = similarity.ivf_ann_topk(emb, n_centroids=8, n_probe=3, k=2)
    hof = similarity.ivf_ann_topk(
        emb, n_centroids=8, n_probe=3, k=2, vectorized=False
    )
    vec_rows = {(r["qid"], r["rank"]): r for r in vec.collect()}
    hof_rows = {(r["qid"], r["rank"]): r for r in hof.collect()}
    assert set(vec_rows) == set(hof_rows)
    agree = sum(
        1
        for key, r in vec_rows.items()
        if r["nid"] == hof_rows[key]["nid"]
        and abs(r["cosine"] - hof_rows[key]["cosine"]) < 1e-3
        and r["cell"] == hof_rows[key]["cell"]
    )
    # Identical modulo rounding-induced rank swaps on near-equal cosines.
    assert agree / len(vec_rows) > 0.95


def test_ivf_handles_empty_and_tiny_corpora(spark):
    """A 100 TB pipeline's first backfill starts empty — ANN build must
    not crash on empty or smaller-than-k corpora."""
    empty = spark.createDataFrame([], "vec_id long, embedding array<float>")
    assert similarity.ivf_ann_topk(empty, n_centroids=4, n_probe=2, k=1).count() == 0

    tiny = spark.createDataFrame(
        [(i, [float(i), 1.0]) for i in (1, 3, 5)],  # no id divisible by 4
        "vec_id long, embedding array<float>",
    )
    out = similarity.ivf_ann_topk(tiny, n_centroids=8, n_probe=8, k=1).collect()
    assert {r["qid"] for r in out} == {1, 3, 5}  # clamped centroids, all served


def test_ivf_training_sample_is_capped(spark, sf_dir):
    """The driver-side training collect must be bounded at any corpus
    size (round-2 finding: the modulus alone collects 25% of the corpus).
    A tiny cap must still yield a working quantizer over every query."""
    emb = load_table(spark, sf_dir, "embeddings")
    similarity.clear_ivf_centroid_cache()
    out = similarity.ivf_ann_topk(
        emb, n_centroids=4, n_probe=4, k=1, max_train_sample=16, refresh=True
    )
    got = {r["qid"] for r in out.collect()}
    assert got == {r["vec_id"] for r in emb.select("vec_id").collect()}
    # Centroid count is bounded by the capped sample, never above it.
    key = next(iter(similarity._IVF_CENTROID_CACHE))
    assert len(similarity._IVF_CENTROID_CACHE[key]) <= 16
    similarity.clear_ivf_centroid_cache()


def test_multiprobe_lsh_recall_at_least_single_probe(spark, sf_dir):
    """Probing the 6 Hamming-1 buckets on top of the home bucket can only
    ADD candidates, so top-1 recall vs the exact baseline must be >= the
    single-probe operator's — and queries that single-probe LSH leaves
    without candidates (lone vector in its bucket) get answers."""
    emb = load_table(spark, sf_dir, "embeddings")
    qids = emb.select("vec_id").filter(F.col("vec_id") < 100)
    exact_top1 = {
        r["qid"]: r["nid"]
        for r in similarity.cosine_topk(emb, qids, k=1).collect()
    }
    single = {
        r["qid"]: r["nid"]
        for r in similarity.lsh_ann_topk(emb, n_planes=6, k=1).collect()
        if r["qid"] < 100
    }
    multi = {
        r["qid"]: r["nid"]
        for r in similarity.lsh_ann_topk_multiprobe(
            emb, query_ids=qids, n_planes=6, k=1
        ).collect()
    }
    hits_single = sum(1 for q, n in exact_top1.items() if single.get(q) == n)
    hits_multi = sum(1 for q, n in exact_top1.items() if multi.get(q) == n)
    assert hits_multi >= hits_single
    assert set(multi) >= set(single)  # multiprobe never loses a query


def test_pq_ann_recall_and_compression(spark, sf_dir):
    """PQ ADC ranking must recover a solid share of true top-1 neighbors
    while answering every query, and the code payload must honor the
    m-codes compression contract."""
    emb = load_table(spark, sf_dir, "embeddings")
    qids = emb.select("vec_id").filter(F.col("vec_id") < 60)
    exact_top1 = {
        r["qid"]: r["nid"] for r in similarity.cosine_topk(emb, qids, k=1).collect()
    }
    pq = similarity.pq_ann_topk(emb, qids, m=32, n_codes=64, k=1)
    rows = pq.collect()
    pq_top1 = {r["qid"]: r["nid"] for r in rows}
    assert set(pq_top1) == set(exact_top1)  # every query answered
    hits = sum(1 for q, n in exact_top1.items() if pq_top1.get(q) == n)
    assert hits / len(exact_top1) > 0.5
    # Determinism: same seed, same answers.
    again = {r["qid"]: r["nid"] for r in
             similarity.pq_ann_topk(emb, qids, m=32, n_codes=64, k=1).collect()}
    assert again == pq_top1


def test_ivf_pq_recall_and_determinism(spark, sf_dir):
    """The composed IVF-PQ index answers every query deterministically and
    residual-PQ ADC over probed cells recovers a solid share of true
    top-1 neighbors. Residual encoding + generous probes should land in
    the same ballpark as flat PQ despite searching only a fraction of
    the corpus."""
    emb = load_table(spark, sf_dir, "embeddings")
    qids = emb.select("vec_id").filter(F.col("vec_id") < 60)
    exact_top1 = {
        r["qid"]: r["nid"] for r in similarity.cosine_topk(emb, qids, k=1).collect()
    }
    out = similarity.ivf_pq_ann_topk(
        emb, qids, n_centroids=8, n_probe=4, m=32, n_codes=64, k=1
    )
    got = {r["qid"]: r["nid"] for r in out.collect()}
    assert set(got) == set(exact_top1)  # n_probe=4 of 8 cells: all answered
    hits = sum(1 for q, n in exact_top1.items() if got.get(q) == n)
    assert hits / len(exact_top1) > 0.4
    again = {
        r["qid"]: r["nid"]
        for r in similarity.ivf_pq_ann_topk(
            emb, qids, n_centroids=8, n_probe=4, m=32, n_codes=64, k=1
        ).collect()
    }
    assert again == got


def test_pq_rerank_beats_plain_pq_recall(spark, sf_dir):
    """Exact re-ranking of a PQ shortlist must recover recall: top-1
    agreement with the exact baseline is >= plain PQ's, and with a
    generous shortlist it should be near-perfect."""
    emb = load_table(spark, sf_dir, "embeddings")
    qids = emb.select("vec_id").filter(F.col("vec_id") < 60)
    exact_top1 = {
        r["qid"]: r["nid"] for r in similarity.cosine_topk(emb, qids, k=1).collect()
    }
    plain = {
        r["qid"]: r["nid"]
        for r in similarity.pq_ann_topk(emb, qids, m=32, n_codes=64, k=1).collect()
    }
    rerank = {
        r["qid"]: r["nid"]
        for r in similarity.pq_rerank_topk(
            emb, qids, m=32, n_codes=64, candidates=50, k=1
        ).collect()
    }
    assert set(rerank) == set(exact_top1)
    hits_plain = sum(1 for q, n in exact_top1.items() if plain.get(q) == n)
    hits_rerank = sum(1 for q, n in exact_top1.items() if rerank.get(q) == n)
    assert hits_rerank >= hits_plain
    assert hits_rerank / len(exact_top1) > 0.8


def test_ivf_pq_rejects_indivisible_dim(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    qids = emb.select("vec_id").filter(F.col("vec_id") < 5)
    with pytest.raises(ValueError, match="not divisible"):
        similarity.ivf_pq_ann_topk(emb, qids, m=7)


def test_winsorize_and_scale_transform_composition(spark, sf_dir):
    """The consume side of the fit queries: clamp at the fitted bounds,
    then z-score with the fitted moments — every value lands in the
    clamp interval and standardized outliers are bounded."""
    from traffic_accidents_airflow_kafka_spark.plans.stats import (
        scaler_fit,
        winsorize_stats,
    )

    events = load_table(spark, sf_dir, "events")
    cuts = winsorize_stats(spark, sf_dir).select("event_type", "p01", "p99")
    fit = scaler_fit(spark, sf_dir).select("event_type", "mean_value", "std_value")
    out = (
        events.join(F.broadcast(cuts), "event_type")
        .join(F.broadcast(fit), "event_type")
        .withColumn(
            "clamped", F.least(F.greatest(F.col("value"), F.col("p01")), F.col("p99"))
        )
        .withColumn("z", (F.col("clamped") - F.col("mean_value")) / F.col("std_value"))
    )
    bad = out.filter(
        (F.col("clamped") < F.col("p01")) | (F.col("clamped") > F.col("p99"))
    ).count()
    assert bad == 0
    zmax = out.agg(F.max(F.abs("z"))).first()[0]
    assert zmax < 6  # clamped-then-scaled tail is bounded
