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
    still read maybe_member=true on every row (bit matches are counted
    over distinct (key, bit) pairs, not probe rows)."""
    members = _doc_digests(spark, sf_dir).limit(50)
    bloom = bloom_build(members.select("digest"), "digest")
    doubled = members.union(members)  # every key twice
    probed = bloom_probe(doubled, "digest", bloom)
    assert probed.count() == 100
    assert probed.filter(~F.col("maybe_member")).isEmpty()
