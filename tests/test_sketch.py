"""Count-min sketch invariants (operators/sketch.py).

The catalog query `cms_heavy_hitters` rides the exact oracle gate; these
tests pin the STRUCTURAL guarantees the oracle cannot state: the
one-sided error direction, exact mergeability of partial sketches, and
that a planted heavy key surfaces at the top of the estimate ranking.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from traffic_accidents_airflow_kafka_spark.operators.sketch import (
    bloom_build,
    bloom_probe,
    cms_estimate,
    cms_merge,
    cms_sketch,
    histogram_sketch,
)
from traffic_accidents_airflow_kafka_spark.sources.tables import load_table


def _keyed(spark, sf_dir):
    return load_table(spark, sf_dir, "events").select(
        "user_id", F.date_trunc("day", "ts").alias("day")
    )


def test_estimate_never_undercounts(spark, sf_dir):
    """est >= true for EVERY key — the one-sided CMS error direction
    (collisions only add; a key the sketch calls cold IS cold)."""
    keyed = _keyed(spark, sf_dir)
    sketch = cms_sketch(keyed, "user_id")
    truth = keyed.groupBy("user_id").agg(F.count(F.lit(1)).alias("true_n"))
    joined = truth.join(
        cms_estimate(sketch, truth.select("user_id"), "user_id"), "user_id"
    ).collect()
    assert joined, "no keys probed"
    assert all(r.est >= r.true_n for r in joined)
    # Total mass bound: no estimate can exceed the row count.
    n = keyed.count()
    assert all(r.est <= n for r in joined)


def test_partial_sketches_merge_exactly(spark, sf_dir):
    """Sum of per-day sketches == the one-pass global sketch, cell for
    cell — the exact-addition mergeability that lets persisted daily
    sketches answer range queries without rescanning history."""
    keyed = _keyed(spark, sf_dir)
    merged = cms_merge(cms_sketch(keyed, "user_id", by=["day"]))
    direct = cms_sketch(keyed, "user_id")
    sym_diff = merged.select("depth", "bucket", "w").exceptAll(
        direct.select("depth", "bucket", "w")
    )
    assert sym_diff.isEmpty()
    assert merged.count() == direct.count()


def test_planted_heavy_key_ranks_first(spark, sf_dir):
    """A key planted with more rows than any real key must (a) estimate
    at >= its true count and (b) top the estimate ranking — the
    hot-key-detection use the overestimate direction is safe for."""
    keyed = _keyed(spark, sf_dir)
    n_heavy = keyed.count()  # strictly more than any existing key
    planted = spark.range(n_heavy).select(
        F.lit(999_999_999).alias("user_id"),
        F.lit("2024-01-01 00:00:00").cast("timestamp").alias("day"),
    )
    both = keyed.unionByName(planted)
    sketch = cms_sketch(both, "user_id")
    keys = both.select("user_id").distinct()
    top = (
        cms_estimate(sketch, keys, "user_id")
        .orderBy(F.desc("est"), "user_id")
        .first()
    )
    assert top.user_id == 999_999_999
    assert top.est >= n_heavy


def test_absent_key_estimate_is_collision_mass_only(spark, sf_dir):
    """Probing a key the data never contained returns only whatever
    collision mass shares its buckets — >= 0, and 0 whenever some depth
    has an untouched bucket (the left-join coalesce path)."""
    keyed = _keyed(spark, sf_dir)
    sketch = cms_sketch(keyed, "user_id")
    ghost = spark.createDataFrame([(123_456_789,)], "user_id long")
    [row] = cms_estimate(sketch, ghost, "user_id").collect()
    assert 0 <= row.est <= keyed.count()


def test_histogram_partials_merge_exactly(spark, sf_dir):
    """Sum of per-day histograms == the one-pass global histogram —
    the addition-mergeability that answers day-range quantiles from
    persisted daily partials."""
    ev = _keyed_values(spark, sf_dir)
    bounds = ev.agg(F.min("value").alias("lo"), F.max("value").alias("hi"))
    w = ev.crossJoin(F.broadcast(bounds))
    merged = (
        histogram_sketch(w, "value", F.col("lo"), F.col("hi"), by=["day"])
        .groupBy("bin")
        .agg(F.sum("w").alias("w"))
    )
    direct = histogram_sketch(w, "value", F.col("lo"), F.col("hi"))
    assert merged.exceptAll(direct).isEmpty()
    assert merged.count() == direct.count()


def test_quantile_brackets_bound_the_exact_quantile(spark, sf_dir):
    """Each bracket's DETERMINISTIC guarantee: the target rank falls
    inside the bin (n_below < rank <= n_below + n_in_bin), and the
    exact q-quantile value lies within [bin_lo, bin_hi]."""
    from traffic_accidents_airflow_kafka_spark.plans import QUERY_REGISTRY

    rows = QUERY_REGISTRY["mergeable_quantiles"].fn(spark, sf_dir).collect()
    assert len(rows) == 4
    vals = sorted(
        r.value
        for r in _keyed_values(spark, sf_dir).select("value").collect()
    )
    for r in rows:
        assert r.n_below < r.target_rank <= r.n_below + r.n_in_bin
        exact_q = vals[r.target_rank - 1]  # rank-ceil(qN) order statistic
        assert r.bin_lo <= exact_q <= r.bin_hi


def test_histogram_known_domain_clamps_both_edges(spark):
    """Known-domain calibration (fixed lo/hi, no min/max scan) must keep
    out-of-domain values inside [0, n_bins): below-lo rows clamp to bin
    0, above-hi rows to the last bin — never negative or overflow bins."""
    df = spark.createDataFrame(
        [(-5.0,), (0.0,), (50.0,), (100.0,), (250.0,)], "value double"
    )
    hist = histogram_sketch(
        df, "value", F.lit(0.0), F.lit(100.0), n_bins=64
    ).collect()
    bins = {r.bin: r.w for r in hist}
    assert set(bins) == {0, 32, 63}
    assert bins[0] == 2  # -5.0 clamps up, 0.0 is genuine
    assert bins[63] == 2  # 100.0 (v == hi) and 250.0 both clamp down


def test_histogram_degenerate_domain_single_bin(spark):
    """lo == hi (all values identical) must not divide by zero — the
    whole mass lands in bin 0."""
    df = spark.range(100).select(F.lit(7.5).alias("value"))
    hist = histogram_sketch(
        df, "value", F.lit(7.5), F.lit(7.5)
    ).collect()
    assert [(r.bin, r.w) for r in hist] == [(0, 100)]


def _keyed_values(spark, sf_dir):
    return load_table(spark, sf_dir, "events").select(
        F.date_trunc("day", "ts").alias("day"), "value"
    )


def _doc_digests(spark, sf_dir):
    return load_table(spark, sf_dir, "documents").select(
        "doc_id", F.md5(F.col("text").cast("binary")).alias("digest")
    )


def test_bloom_never_false_negative(spark, sf_dir):
    """Every inserted key probes back maybe_member=true — the one-sided
    Bloom guarantee; 'definitely new' verdicts are always safe."""
    members = _doc_digests(spark, sf_dir)
    bloom = bloom_build(members.select("digest"), "digest")
    probed = bloom_probe(members, "digest", bloom)
    assert probed.filter(~F.col("maybe_member")).isEmpty()


def test_bloom_merge_is_bitwise_or(spark, sf_dir):
    """bloom(all) == bloom(evens) OR bloom(odds), as set-bit relations —
    per-partition filters compose exactly like the other sketches."""
    members = _doc_digests(spark, sf_dir)
    whole = bloom_build(members.select("digest"), "digest")
    halves = (
        bloom_build(
            members.filter(F.col("doc_id") % 2 == 0).select("digest"),
            "digest",
        )
        .union(
            bloom_build(
                members.filter(F.col("doc_id") % 2 == 1).select("digest"),
                "digest",
            )
        )
        .distinct()
    )
    assert whole.exceptAll(halves).isEmpty()
    assert halves.exceptAll(whole).isEmpty()


def test_bloom_probe_handles_duplicate_keys(spark, sf_dir):
    """Regression: a member key appearing on MULTIPLE probe rows must
    still read maybe_member=true on every row (membership is a per-row
    array check, never a hit COUNT a duplicate could inflate)."""
    # Deterministic subset — limit() without order re-evaluates
    # differently per plan and would probe keys the filter never saw.
    members = _doc_digests(spark, sf_dir).filter(F.col("doc_id") < 50)
    bloom = bloom_build(members.select("digest"), "digest")
    n = members.count()
    doubled = members.union(members)  # every key twice
    probed = bloom_probe(doubled, "digest", bloom)
    assert probed.count() == 2 * n
    assert probed.filter(~F.col("maybe_member")).isEmpty()
