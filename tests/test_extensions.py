"""Extension-operator tests: as-of join semantics on planted rows;
approximate aggregates bounded against exact values."""

from __future__ import annotations

import datetime as dt

import pyspark.sql.functions as F

from traffic_accidents_airflow_kafka_spark.operators.asof import asof_join
from traffic_accidents_airflow_kafka_spark.sources.tables import load_table


def _t(minute):
    return dt.datetime(2024, 1, 1, 10, minute)


def test_asof_join_picks_latest_prior_row(spark):
    left = spark.createDataFrame(
        [(1, _t(0)), (1, _t(10)), (1, _t(20)), (2, _t(10))],
        "k long, ts timestamp",
    )
    right = spark.createDataFrame(
        [(1, _t(5), "a"), (1, _t(10), "b"), (1, _t(15), "c"), (3, _t(0), "z")],
        "k long, rts timestamp, v string",
    )
    out = {
        (r["k"], r["ts"]): r["asof_v"]
        for r in asof_join(left, right, ["k"], "ts", "rts").collect()
    }
    assert out[(1, _t(0))] is None  # nothing at-or-before 10:00
    assert out[(1, _t(10))] == "b"  # equality included; latest of {a,b}
    assert out[(1, _t(20))] == "c"  # carries past 10:15
    assert out[(2, _t(10))] is None  # key with no right rows → null (left join)


def test_asof_join_plan_has_single_shuffle(spark):
    left = spark.range(100).select(
        (F.col("id") % 5).alias("k"), F.col("id").cast("timestamp").alias("ts")
    )
    right = spark.range(20).select(
        (F.col("id") % 5).alias("k"),
        F.col("id").cast("timestamp").alias("rts"),
        F.col("id").alias("v"),
    )
    plan = (
        asof_join(left, right, ["k"], "ts", "rts")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # union-and-carry-forward: exactly one exchange (the window's), no join op.
    assert plan.count("Exchange") == 1, plan
    assert "Join" not in plan


def test_approx_aggregates_within_tolerance(spark, sf_dir):
    events = load_table(spark, sf_dir, "events")
    exact = events.agg(
        F.countDistinct("user_id").alias("u"),
        F.countDistinct("event_id").alias("e"),
        F.percentile("value", F.lit(0.5)).alias("m"),
    ).collect()[0]
    from traffic_accidents_airflow_kafka_spark.plans import QUERY_REGISTRY

    approx = QUERY_REGISTRY["approx_aggregates"].fn(spark, sf_dir).collect()[0]
    assert abs(approx["approx_users"] - exact["u"]) / exact["u"] < 0.05
    assert abs(approx["approx_events"] - exact["e"]) / exact["e"] < 0.05
    # percentile_approx with accuracy 10k is near-exact at this scale.
    assert abs(approx["approx_median_value"] - exact["m"]) / abs(exact["m"]) < 0.02


def test_banded_range_join_containment_semantics(spark):
    """Half-open [lo, hi) containment, overlapping intervals, negative
    values, and exactly one output row per (point, interval) pair."""
    from traffic_accidents_airflow_kafka_spark.operators.rangejoin import (
        banded_range_join,
    )

    points = spark.createDataFrame(
        [(-7.5,), (0.0,), (5.0,), (9.999,), (10.0,), (25.0,)], "p double"
    )
    intervals = spark.createDataFrame(
        [
            ("neg", -10.0, 0.0),   # negative band arithmetic
            ("a", 0.0, 10.0),      # [0, 10): contains 0.0, 5.0, 9.999 — NOT 10.0
            ("b", 5.0, 30.0),      # overlaps a: 5.0/9.999 match both
        ],
        "name string, lo double, hi double",
    )
    out = banded_range_join(points, intervals, "p", "lo", "hi", band_width=4.0)
    got = sorted((r["p"], r["name"]) for r in out.collect())
    assert got == [
        (-7.5, "neg"),
        (0.0, "a"),       # lo inclusive
        (5.0, "a"),
        (5.0, "b"),       # overlap → two matches, once each
        (9.999, "a"),
        (9.999, "b"),
        (10.0, "b"),      # hi exclusive for interval a
        (25.0, "b"),
    ]


def test_banded_range_join_avoids_nested_loop_plan(spark):
    """The band rewrite must plan as a hash/sort-merge equi-join, never
    the BroadcastNestedLoopJoin Spark picks for a raw theta join."""
    from traffic_accidents_airflow_kafka_spark.operators.rangejoin import (
        banded_range_join,
    )

    points = spark.range(1000).select((F.col("id") / 3.0).alias("p"))
    intervals = spark.range(50).select(
        F.col("id").alias("iv"),
        (F.col("id") * 7.0).alias("lo"),
        (F.col("id") * 7.0 + 20.0).alias("hi"),
    )
    out = banded_range_join(points, intervals, "p", "lo", "hi", band_width=10.0)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "Join" in plan


def test_scd2_history_collapses_and_closes_versions(spark):
    """Consecutive duplicate states extend a version; changes open a new
    one; valid_to chains to the next valid_from; the last version stays
    open (null); reverting to an earlier state is a NEW version."""
    from traffic_accidents_airflow_kafka_spark.operators.scd import scd2_history

    rows = [
        (1, _t(0), "a"),
        (1, _t(10), "a"),   # unchanged — extends version 1
        (1, _t(20), "b"),   # change — version 2
        (1, _t(30), "a"),   # revert — version 3 (history, not a merge)
        (2, _t(5), "x"),
    ]
    df = spark.createDataFrame(rows, "k long, ts timestamp, state string")
    out = sorted(
        (r["k"], r["state"], r["valid_from"], r["valid_to"])
        for r in scd2_history(df, ["k"], ["state"], "ts").collect()
    )
    assert out == [
        (1, "a", _t(0), _t(20)),
        (1, "a", _t(30), None),
        (1, "b", _t(20), _t(30)),
        (2, "x", _t(5), None),
    ]


def test_scd2_single_shuffle_plan(spark):
    """Both window passes must share one Exchange on the key — the
    set-wise promise over per-row upserts."""
    from traffic_accidents_airflow_kafka_spark.operators.scd import scd2_history

    df = spark.range(1000).select(
        (F.col("id") % 10).alias("k"),
        F.col("id").cast("timestamp").alias("ts"),
        (F.col("id") % 3).cast("string").alias("state"),
    )
    plan = (
        scd2_history(df, ["k"], ["state"], "ts")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange") == 1, plan


def test_quality_checks_count_planted_violations(spark):
    from traffic_accidents_airflow_kafka_spark.operators.quality import (
        duplicate_key_count,
        violation_counts,
    )

    df = spark.createDataFrame(
        [(1, 5.0), (2, -1.0), (2, None), (3, -2.0)], "k long, v double"
    )
    got = {
        r["check_name"]: r["n_violations"]
        for r in violation_counts(
            df, {"v_negative": F.col("v") < 0, "v_null": F.col("v").isNull()}
        ).collect()
    }
    assert got == {"v_negative": 2, "v_null": 1}

    [dup] = duplicate_key_count(df, ["k"]).collect()
    assert dup["check_name"] == "unique_k" and dup["n_violations"] == 1

    # A clean frame audits to zeros, not nulls.
    clean = spark.createDataFrame([(1, 1.0)], "k long, v double")
    [dup0] = duplicate_key_count(clean, ["k"]).collect()
    assert dup0["n_violations"] == 0


def test_funnel_stages_count_ordered_journeys(spark):
    """Stage N counts only users whose qualifying event is STRICTLY after
    their stage-N-1 timestamp — a purchase before the first view must not
    convert."""
    from datetime import datetime as dt

    rows = [
        # u1: full ordered journey view -> click -> purchase
        (1, dt(2024, 1, 1, 9), "view"),
        (1, dt(2024, 1, 1, 10), "click"),
        (1, dt(2024, 1, 1, 11), "purchase"),
        # u2: view then click, purchase BEFORE the view (no conversion)
        (2, dt(2024, 1, 1, 8), "purchase"),
        (2, dt(2024, 1, 1, 9), "view"),
        (2, dt(2024, 1, 1, 10), "click"),
        # u3: view only
        (3, dt(2024, 1, 1, 9), "view"),
        # u4: click/purchase but never views (not in funnel at all)
        (4, dt(2024, 1, 1, 9), "click"),
        (4, dt(2024, 1, 1, 10), "purchase"),
    ]
    events = spark.createDataFrame(
        [(i, ts, u, et, 1.0) for i, (u, ts, et) in enumerate(rows)],
        "event_id long, ts timestamp, user_id long, event_type string, value double",
    )

    import pyspark.sql.functions as F

    s1 = (
        events.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    assert s1.count() == 3  # u1, u2, u3
    # Replay the registered query's stage logic on the planted frame.
    clicks = (
        events.filter(F.col("event_type") == "click")
        .join(s1, "user_id")
        .filter(F.col("ts") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    assert sorted(r["user_id"] for r in clicks.collect()) == [1, 2]
    purchases = (
        events.filter(F.col("event_type") == "purchase")
        .join(clicks, "user_id")
        .filter(F.col("ts") > F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    assert [r["user_id"] for r in purchases.collect()] == [1]


def test_rolling_user_stats_frame_arithmetic(spark, sf_dir):
    """The 3-row trailing frame: row k's roll_sum covers rows
    max(0, k-2)..k in (ts, event_id) order, and delta is the lag-1
    difference (0.0 for the first row)."""
    from traffic_accidents_airflow_kafka_spark.plans.extensions import rolling_user_stats

    out = rolling_user_stats(spark, sf_dir).toPandas()
    assert (out["user_id"] < 40).all()
    # Per-user recompute in pandas over the same ordering.
    from traffic_accidents_airflow_kafka_spark.sources.tables import load_table

    ev = (
        load_table(spark, sf_dir, "events")
        .filter("user_id < 40")
        .select("user_id", "event_id", "ts", "value")
        .toPandas()
        .sort_values(["user_id", "ts", "event_id"])
    )
    for uid, grp in ev.groupby("user_id"):
        vals = [round(v, 2) for v in grp["value"]]  # decimal(18,2) semantics
        got = out[out["user_id"] == uid].reset_index(drop=True)
        # out is ordered by (user_id, event_id); reorder to frame order
        order = {e: i for i, e in enumerate(grp["event_id"])}
        got = got.sort_values("event_id", key=lambda s: s.map(order)).reset_index(drop=True)
        for k in range(len(vals)):
            lo = max(0, k - 2)
            expect = round(sum(vals[lo : k + 1]), 10)
            assert abs(got.at[k, "roll_sum"] - expect) < 1e-9, (uid, k)
        if len(vals) >= 2:
            raw = list(grp["value"])
            assert abs(got.at[1, "delta"] - round(raw[1] - raw[0], 4)) < 1e-9
        assert abs(got.at[0, "delta"]) < 1e-12
