"""Johnson–Lindenstrauss projection: the two guarantees JL actually
makes, pinned against the planted-near-dup fixture and across out_dims.
(Exact rank parity with DuckDB is covered by the jl_* oracle gates;
top-k recall on i.i.d. Gaussian vectors is near-chance BY DESIGN of the
fixture — near-equidistant neighbors — and is deliberately not
asserted.)"""

from __future__ import annotations

import math

import pyspark.sql.functions as F

from traffic_accidents_airflow_kafka_spark.operators import similarity
from traffic_accidents_airflow_kafka_spark.sources.tables import load_table


def _cos(a, b) -> float:
    d = sum(x * y for x, y in zip(a, b))
    return d / (
        math.sqrt(sum(x * x for x in a)) * math.sqrt(sum(x * x for x in b))
    )


def test_jl_preserves_planted_similarity_signal(spark, sf_dir):
    """Planted near-dup pairs (original cosine >= 0.3) must stay clearly
    separated from background pairs after projection — in aggregate, the
    JL expectation guarantee."""
    emb = load_table(spark, sf_dir, "embeddings")
    planted = similarity.cosine_near_dup_pairs(
        emb, "vec_id", "embedding", threshold=0.3
    ).collect()
    assert len(planted) >= 5, "fixture should plant near-dup pairs"

    proj = {
        r["vec_id"]: list(r["proj"])
        for r in similarity.jl_project(emb, "vec_id", "embedding", 16, 11).collect()
    }
    planted_cos = [_cos(proj[r["d1"]], proj[r["d2"]]) for r in planted]
    ids = sorted(proj)
    background_cos = [
        _cos(proj[a], proj[b]) for a, b in zip(ids, ids[1:]) if abs(a - b) == 1
    ][: len(planted_cos) * 4]
    mean_planted = sum(planted_cos) / len(planted_cos)
    mean_background = sum(background_cos) / len(background_cos)
    assert mean_planted > mean_background + 0.15, (
        f"planted {mean_planted:.3f} vs background {mean_background:.3f}"
    )


def test_jl_distortion_concentrates_with_out_dim(spark, sf_dir):
    """Distortion ratio variance must shrink as out_dim grows (~2/k):
    the quantitative JL trade-off the out_dim knob buys."""
    emb = load_table(spark, sf_dir, "embeddings").where(F.col("vec_id") < 80)
    vecs = {
        r["vec_id"]: list(r["embedding"])
        for r in emb.select("vec_id", "embedding").collect()
    }

    def distortions(out_dim: int) -> list[float]:
        proj = {
            r["vec_id"]: list(r["proj"])
            for r in similarity.jl_project(
                emb, "vec_id", "embedding", out_dim, seed=11
            ).collect()
        }
        out = []
        ids = sorted(vecs)
        for a, b in zip(ids, ids[1:]):
            d2o = sum((x - y) ** 2 for x, y in zip(vecs[a], vecs[b]))
            d2p = sum((x - y) ** 2 for x, y in zip(proj[a], proj[b]))
            out.append(d2p / d2o)
        return out

    def var(xs: list[float]) -> float:
        m = sum(xs) / len(xs)
        return sum((x - m) ** 2 for x in xs) / len(xs)

    v8, v64 = var(distortions(8)), var(distortions(64))
    assert v64 < v8 / 2, f"var@64 {v64:.4f} not << var@8 {v8:.4f}"
    # and the mean distortion is unbiased-ish around 1 at the larger dim
    d64 = distortions(64)
    assert 0.7 < sum(d64) / len(d64) < 1.3
