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
    """The banded query's exact twins match an independent aggregation and
    every within-bound boolean holds (the raw 5%-rsd sketches comfortably
    clear the 10% band on this data)."""
    events = load_table(spark, sf_dir, "events")
    exact = events.agg(
        F.countDistinct("user_id").alias("u"),
        F.countDistinct("event_id").alias("e"),
    ).collect()[0]
    from traffic_accidents_airflow_kafka_spark.plans import QUERY_REGISTRY

    row = QUERY_REGISTRY["approx_aggregates"].fn(spark, sf_dir).collect()[0]
    assert row["exact_users"] == exact["u"]
    assert row["exact_events"] == exact["e"]
    assert row["users_within_10pct"] is True
    assert row["events_within_10pct"] is True
    assert row["median_in_p49_p51"] is True


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


def test_cohort_retention_offsets(spark, tmp_path):
    """User joining in week W and active in W and W+2 lands in offsets
    0 and 2 of cohort W; a W+1 joiner starts their own cohort at 0."""
    import os
    from datetime import datetime as dt
    import pyspark.sql.functions as F
    from traffic_accidents_airflow_kafka_spark.plans.extensions import cohort_retention

    rows = [
        (1, dt(2024, 1, 1, 9)),   # Monday, week A, offset 0
        (1, dt(2024, 1, 3, 9)),   # same week -> still offset 0
        (1, dt(2024, 1, 15, 9)),  # week A+2
        (2, dt(2024, 1, 8, 9)),   # week B (A+1), own cohort offset 0
    ]
    events = spark.createDataFrame(
        [(i, ts, u, "view", 1.0, "{}") for i, (u, ts) in enumerate(rows)],
        "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
    )
    sf = str(tmp_path / "sf")
    os.makedirs(sf, exist_ok=True)
    events.write.mode("overwrite").parquet(os.path.join(sf, "events.parquet"))
    out = cohort_retention(spark, sf).toPandas()
    got = {(r.cohort_week, r.week_offset): r.n_users for r in out.itertuples()}
    assert got == {
        ("2024-01-01", 0): 1,
        ("2024-01-01", 2): 1,
        ("2024-01-08", 0): 1,
    }


def test_event_transitions_probabilities(spark, tmp_path):
    """Per-user lag ordering: u1 emits view->click, click->view,
    view->purchase; transition rows and row-normalized probabilities
    follow the hand count."""
    import os
    from datetime import datetime as dt
    from traffic_accidents_airflow_kafka_spark.plans.extensions import event_transitions

    seq = ["view", "click", "view", "purchase"]
    rows = [(i, dt(2024, 1, 1, 9 + i), 1, t, 1.0, "{}") for i, t in enumerate(seq)]
    # second user: single event -> contributes no transitions
    rows.append((99, dt(2024, 1, 1, 9), 2, "view", 1.0, "{}"))
    events = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
    )
    sf = str(tmp_path / "sf")
    os.makedirs(sf, exist_ok=True)
    events.write.mode("overwrite").parquet(os.path.join(sf, "events.parquet"))
    out = event_transitions(spark, sf).toPandas()
    got = {(r.prev_type, r.next_type): (r.n, r.p_next) for r in out.itertuples()}
    assert got == {
        ("view", "click"): (1, 0.5),
        ("view", "purchase"): (1, 0.5),
        ("click", "view"): (1, 1.0),
    }


def test_unpivot_roundtrips_pivot_cells(spark, sf_dir):
    """Every nonzero long-form cell equals the direct groupBy count, and
    pivot fill-0 cells survive as explicit zeros."""
    import pyspark.sql.functions as F
    from traffic_accidents_airflow_kafka_spark.functions import scalar as fn
    from traffic_accidents_airflow_kafka_spark.plans.extensions import (
        unpivot_event_matrix,
    )

    out = unpivot_event_matrix(spark, sf_dir).toPandas()
    events = load_table(spark, sf_dir, "events")
    direct = (
        events.select(
            F.hour("ts").cast("int").alias("event_hour"),
            fn.enum_normalize("event_type", ["click", "view", "purchase"]).alias(
                "event_type"
            ),
        )
        .groupBy("event_hour", "event_type")
        .count()
        .toPandas()
    )
    want = {(r.event_hour, r.event_type): r.count for r in direct.itertuples()}
    for r in out.itertuples():
        assert r.n == want.get((r.event_hour, r.event_type), 0)
    # the long form is dense: hours x 4 types
    assert len(out) == out["event_hour"].nunique() * 4


def test_incremental_merge_equals_full_recompute(spark, sf_dir):
    """Merging base+delta partials is bit-identical to aggregating the
    whole table — COUNT and DECIMAL SUM are mergeable states."""
    import pyspark.sql.functions as F
    from traffic_accidents_airflow_kafka_spark.plans.extensions import (
        incremental_agg_merge,
    )

    merged = {
        r["event_type"]: (r["n_events"], r["sum_value"])
        for r in incremental_agg_merge(spark, sf_dir).collect()
    }
    full = {
        r["event_type"]: (r["n_events"], r["sum_value"])
        for r in load_table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)"))
            .cast("double")
            .alias("sum_value"),
        )
        .collect()
    }
    assert merged == full


def test_apply_changes_merge_semantics(spark):
    """Latest change per key wins; deletes remove the key; untouched keys
    pass through; a key new in the batch inserts."""
    from traffic_accidents_airflow_kafka_spark.operators.scd import apply_changes

    snapshot = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "k long, v string"
    )
    changes = spark.createDataFrame(
        [
            (1, "a1", 10, "u"),
            (1, "a2", 20, "u"),   # later seq wins
            (2, None, 5, "d"),    # delete key 2
            (4, "new", 1, "u"),   # insert unseen key
        ],
        "k long, v string, seq long, op string",
    )
    out = {r["k"]: r["v"] for r in apply_changes(snapshot, changes, ["k"], "seq", "op").collect()}
    assert out == {1: "a2", 3: "c", 4: "new"}


def test_apply_changes_delete_then_earlier_upsert_ignored(spark):
    """A delete with the HIGHEST seq beats earlier upserts in the same
    batch — only the latest op per key is applied."""
    from traffic_accidents_airflow_kafka_spark.operators.scd import apply_changes

    snapshot = spark.createDataFrame([(1, "a")], "k long, v string")
    changes = spark.createDataFrame(
        [(1, "x", 1, "u"), (1, None, 2, "d")], "k long, v string, seq long, op string"
    )
    assert apply_changes(snapshot, changes, ["k"], "seq", "op").count() == 0


def test_apply_changes_versioned_properties(spark):
    """The version-guarded merge holds the three streaming-sink
    guarantees: idempotent under replay, commutative under batch
    reorder, and a tombstone blocks resurrection by a stale upsert."""
    import itertools

    from traffic_accidents_airflow_kafka_spark.operators.scd import (
        apply_changes_versioned,
        current_state,
    )

    schema = "k long, v string, seq long, op string"
    state0 = spark.createDataFrame([(1, "a", -1, "u"), (2, "b", -1, "u")], schema)
    batches = [
        [(1, "a1", 10, "u"), (3, "c", 11, "u")],
        [(2, None, 20, "d"), (1, "a2", 30, "u")],
        [(2, "stale", 15, "u"), (3, "c2", 25, "u")],  # stale upsert for deleted 2
    ]

    def run(order, replay=None):
        st = state0
        seq_batches = [batches[i] for i in order]
        if replay is not None:
            seq_batches.insert(replay + 1, batches[order[replay]])
        for b in seq_batches:
            st = apply_changes_versioned(
                st, spark.createDataFrame(b, schema), ["k"], "seq", "op"
            )
        return {
            r["k"]: (r["v"], r["seq"])
            for r in current_state(st, "op").collect()
        }

    want = {1: ("a2", 30), 3: ("c2", 25)}  # 2 tombstoned at seq 20
    assert run([0, 1, 2]) == want
    # commutative: every batch order converges
    for order in itertools.permutations(range(3)):
        assert run(list(order)) == want, f"order {order} diverged"
    # idempotent: replaying any delivered batch is a no-op
    for i in range(3):
        assert run([0, 1, 2], replay=i) == want, f"replay of batch {i} diverged"


def test_group_trend_fit_recovers_planted_line(spark, tmp_path):
    """Events on an exact line value = 10 + 2*h recover slope 2.0/hour
    and intercept 10 at the 2024-01-01 anchor."""
    import os
    from datetime import datetime as dt, timedelta
    from traffic_accidents_airflow_kafka_spark.plans.stats import group_trend_fit

    base = dt(2024, 1, 1)
    rows = [
        (i, base + timedelta(hours=i), 1, "lin", 10.0 + 2.0 * i, "{}")
        for i in range(24)
    ]
    events = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
    )
    sf = str(tmp_path / "sf")
    os.makedirs(sf, exist_ok=True)
    events.write.mode("overwrite").parquet(os.path.join(sf, "events.parquet"))
    [r] = group_trend_fit(spark, sf).collect()
    assert r["event_type"] == "lin" and r["n"] == 24
    assert abs(r["slope_per_hour"] - 2.0) < 1e-9
    assert abs(r["intercept_value"] - 10.0) < 1e-9


def test_batch_sessions_cuts_at_gap_boundary(spark, tmp_path):
    """Planted journeys: gaps of exactly 1800 s stay in-session; 1801 s
    cuts. User 1: three events 30 min apart → one 2-event session (the
    1801 s gap cuts before the third). User 2: lone event → singleton."""
    import pyspark.sql.functions as F  # noqa: F811

    from traffic_accidents_airflow_kafka_spark.plans.extensions import (
        batch_sessions,
    )

    base = dt.datetime(2024, 3, 1, 12, 0, 0)
    rows = [
        (1, base, 101, "view", 0.0, "{}"),
        (1, base + dt.timedelta(seconds=1800), 102, "view", 0.0, "{}"),  # in
        (1, base + dt.timedelta(seconds=1800 + 1801), 103, "view", 0.0, "{}"),
        (2, base, 201, "click", 0.0, "{}"),
    ]
    df = spark.createDataFrame(
        [(eid, ts, uid, et, v, p) for uid, ts, eid, et, v, p in rows],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    sf_dir = str(tmp_path / "sess")
    df.coalesce(1).write.mode("overwrite").parquet(f"{sf_dir}/events.parquet")
    out = {
        r["session_len"]: (r["n_sessions"], r["total_duration_s"])
        for r in batch_sessions(spark, sf_dir).collect()
    }
    # Two singleton sessions (user 1's cut tail + user 2), one 2-event
    # session spanning exactly 1800 s.
    assert out == {1: (2, 0), 2: (1, 1800)}


def test_time_gapfill_carries_last_observation(spark, tmp_path):
    """User with events at hours 0, 1, and 4 of the same day: the grid is
    5 hours, hours 2-3 are filled, and the filled total proves hour 1's
    value (20) was carried into both holes: 10 + 20*3 + 40 = 90."""
    from traffic_accidents_airflow_kafka_spark.plans.extensions import (
        time_gapfill_locf,
    )

    rows = [
        (1, dt.datetime(2024, 3, 1, 0, 30), 7, "view", 10.0, "{}"),
        (1, dt.datetime(2024, 3, 1, 1, 30), 8, "view", 20.0, "{}"),
        (1, dt.datetime(2024, 3, 1, 4, 30), 9, "view", 40.0, "{}"),
    ]
    df = spark.createDataFrame(
        [(eid, ts, uid, et, v, p) for uid, ts, eid, et, v, p in rows],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    sf_dir = str(tmp_path / "gap")
    df.coalesce(1).write.mode("overwrite").parquet(f"{sf_dir}/events.parquet")
    [r] = time_gapfill_locf(spark, sf_dir).collect()
    assert (r["n_hours"], r["n_observed"], r["n_filled"]) == (5, 3, 2)
    assert r["locf_total"] == 10.0 + 20.0 * 3 + 40.0


def test_table_fingerprint_order_invariant_and_change_sensitive(
    spark, sf_dir, tmp_path
):
    """The fingerprint is a multiset digest: permuting row order (via a
    reversed-sort rewrite) must not move it; editing one cell must."""
    import os

    from traffic_accidents_airflow_kafka_spark.plans.extensions import (
        _FP_TABLES,
        table_fingerprint,
    )
    from traffic_accidents_airflow_kafka_spark.sources.tables import load_table

    base = table_fingerprint(spark, sf_dir)
    fp = {r["table_name"]: (r["n_rows"], r["fingerprint"]) for r in base.collect()}

    alt = str(tmp_path / "permuted")
    os.makedirs(alt, exist_ok=True)
    for tbl in _FP_TABLES:
        df = load_table(spark, sf_dir, tbl)
        key = df.columns[0]
        out = df.orderBy(F.desc(key)) if tbl != "nation" else df.orderBy(
            F.desc(key)
        ).withColumn(
            "n_name",
            F.when(F.col("n_nationkey") == 0, F.lit("TAMPERED")).otherwise(
                F.col("n_name")
            ),
        )
        out.repartition(3).write.mode("overwrite").parquet(
            f"{alt}/{tbl}.parquet"
        )
    fp2 = {
        r["table_name"]: (r["n_rows"], r["fingerprint"])
        for r in table_fingerprint(spark, alt).collect()
    }
    for tbl in _FP_TABLES:
        if tbl == "nation":
            assert fp2[tbl][0] == fp[tbl][0] and fp2[tbl][1] != fp[tbl][1]
        else:
            assert fp2[tbl] == fp[tbl]


def test_mergeable_uniques_error_and_mergeability(spark, sf_dir):
    """The banded query's exact twins match independent distinct counts,
    every within-bound boolean holds, and — at this SF's sparse-mode
    cardinality — the union of per-day sketches estimates EXACTLY the
    same value as one corpus-wide sketch (mergeability; at dense-mode
    cardinalities the union's HLL_8 gadget drifts <1%, which the
    query's 2% band covers — measured 0.73% at sf0.1)."""
    import pyspark.sql.functions as F

    from traffic_accidents_airflow_kafka_spark.plans.extensions import (
        mergeable_uniques,
    )

    events = load_table(spark, sf_dir, "events")
    out = mergeable_uniques(spark, sf_dir).toPandas()
    exact = {
        r["day"]: r["n"]
        for r in events.groupBy(F.date_trunc("day", "ts").alias("day"))
        .agg(F.count_distinct("user_id").alias("n"))
        .collect()
    }
    assert len(out) == len(exact) > 0
    for r in out.itertuples():
        assert r.exact_uniques == exact[r.day]
        assert r.est_within_5pct
        assert r.global_within_5pct
        assert r.union_within_2pct_of_single
    g_exact = events.select("user_id").distinct().count()
    assert out["global_exact"].iloc[0] == g_exact
    # Sparse-mode exact mergeability (stronger than the query's band).
    union_est = (
        events.groupBy(F.date_trunc("day", "ts").alias("day"))
        .agg(F.hll_sketch_agg("user_id").alias("sk"))
        .agg(F.hll_sketch_estimate(F.hll_union_agg("sk")))
        .first()[0]
    )
    single = events.agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("user_id"))
    ).first()[0]
    assert union_est == single


def test_bootstrap_ci_brackets_point_mean(spark, sf_dir):
    """The percentile-bootstrap interval must bracket the point estimate
    and weights must be genuine Poisson(1) draws (mean ~1)."""
    import pyspark.sql.functions as F

    from traffic_accidents_airflow_kafka_spark.operators.bootstrap import (
        replicate_weights,
    )
    from traffic_accidents_airflow_kafka_spark.plans.extensions import (
        bootstrap_value_ci,
    )

    out = bootstrap_value_ci(spark, sf_dir).collect()
    assert len(out) > 0
    for r in out:
        assert r.ci_lo <= r.point_mean <= r.ci_hi, r
        assert r.ci_lo < r.ci_hi

    df = spark.range(0, 5000).select(F.col("id").cast("string").alias("k"))
    w = df.select(F.explode(replicate_weights("k", 8, "t")).alias("w"))
    stats = w.agg(
        F.avg("w").alias("m"), F.max("w").alias("mx"), F.min("w").alias("mn")
    ).collect()[0]
    assert 0.93 < stats.m < 1.07, "Poisson(1) weights must average ~1"
    assert stats.mn == 0 and stats.mx <= 8


def test_bootstrap_tiny_groups_match_oracle(spark):
    """Singleton groups stress the empty-replicate guard: with 1 row, a
    replicate's Poisson weight sum is 0 with prob ~0.37 — Spark's guard
    yields NULL and the oracle's NULLIF yields NULL, so both engines drop
    those replicates identically (pre-fix, DuckDB's IEEE division gave
    inf and poisoned quantile_cont; the r5 ADVICE item)."""
    import duckdb
    import pandas as pd

    from traffic_accidents_airflow_kafka_spark.operators.bootstrap import (
        bootstrap_mean_ci,
    )
    from traffic_accidents_airflow_kafka_spark.plans.extensions import (
        _bootstrap_oracle,
    )

    rows = [
        (1, "solo", 10.0),  # singleton group — the stress case
        (2, "pair", 4.0),
        (3, "pair", 6.0),
    ]
    sdf = spark.createDataFrame(
        rows, "event_id bigint, event_type string, value double"
    )
    got = {
        r.event_type: r
        for r in bootstrap_mean_ci(
            sdf,
            "event_id",
            F.round(F.col("value") * 100, 0).cast("long"),
            ["event_type"],
            n_replicates=40,
            seed="boot-v2",
        ).collect()
    }
    for r in got.values():
        assert r.ci_lo is not None and r.ci_hi is not None, r
        assert r.ci_lo <= r.point_mean <= r.ci_hi, r

    con = duckdb.connect()
    con.register(
        "events",
        pd.DataFrame(rows, columns=["event_id", "event_type", "value"]),
    )
    for o in con.execute(_bootstrap_oracle()).fetchall():
        etype, n_rows, pm, lo, hi = o
        g = got[etype]
        assert (g.n_rows, g.point_mean, g.ci_lo, g.ci_hi) == (
            n_rows,
            pm,
            lo,
            hi,
        ), (o, g)


def test_bootstrap_flat_path_matches_reference(spark):
    """r10 optimization guard: bootstrap_mean_ci's flat hex-compare weight
    path must produce, per (group, replicate), EXACTLY the partial sums of
    the reference replicate_weights() array form — the quantities that
    fully determine the query output. Also pins the threshold math: each
    hex13 literal is ceil(cum * 2^52) and the string ladder agrees with
    the double ladder on both sides of every threshold."""
    import pyspark.sql.functions as F

    from traffic_accidents_airflow_kafka_spark.operators.bootstrap import (
        MAX_WEIGHT,
        POISSON1_CUM,
        POISSON1_CUM_HEX13,
        bootstrap_mean_ci,
        replicate_weights,
    )

    # Threshold derivation: K = ceil(cum * 2^52) exactly, and for every
    # integer i in {K-1, K}, (i/2^52 < cum) == (hex13(i) < hex13(K)).
    from fractions import Fraction

    for cum, h in zip(POISSON1_CUM, POISSON1_CUM_HEX13):
        f = Fraction(cum) * (1 << 52)
        K = -(-f.numerator // f.denominator)
        assert h == format(K, "013x")
        for i in (K - 1, K):
            num = i / float(1 << 52) < cum
            lex = format(i, "013x") < h
            assert num == lex, (cum, i)

    B = 8
    df = spark.range(0, 4000).select(
        F.col("id").alias("event_id"),
        (F.col("id") % 5).cast("string").alias("g"),
        (F.col("id") % 97).cast("long").alias("c"),
    )
    # Reference: array form -> per-replicate sums.
    ref_base = df.select(
        "g", "c", replicate_weights("event_id", B, "flatpin").alias("w")
    )
    ref = ref_base.groupBy("g").agg(
        *[F.sum(F.element_at("w", r + 1)).alias(f"n{r}") for r in range(B)],
        *[
            F.sum(F.element_at("w", r + 1) * F.col("c")).alias(f"s{r}")
            for r in range(B)
        ],
    )
    ref_rows = {r.g: r for r in ref.collect()}
    # Flat path: run the full operator and ALSO recompute its internal
    # sums via the same public API on a second seed-matched call — the
    # operator's output is the contract, so compare end-to-end against a
    # hand-built reference pipeline using the array form.
    got = bootstrap_mean_ci(
        df, "event_id", F.col("c"), ["g"], n_replicates=B, seed="flatpin"
    ).collect()
    # Rebuild the expected output from the reference partial sums.
    expected = {}
    for g, r in ref_rows.items():
        means = []
        for i in range(B):
            n = r[f"n{i}"]
            if n and n > 0:
                means.append(r[f"s{i}"] / n / 100)
        means.sort()

        def pct(p, xs):
            # Spark percentile: linear interpolation, (len-1)*p rank.
            rank = (len(xs) - 1) * p
            lo = int(rank)
            hi = min(lo + 1, len(xs) - 1)
            frac = rank - lo
            return xs[lo] + (xs[hi] - xs[lo]) * frac

        expected[g] = (round(pct(0.025, means), 4), round(pct(0.975, means), 4))
    for row in got:
        lo, hi = expected[row.g]
        assert (row.ci_lo, row.ci_hi) == (lo, hi), (row, expected[row.g])


def test_poisson_ladder_matches_inverse_cdf():
    """The CASE ladder IS the inverse CDF: for any uniform, the weight is
    the bisect index into the cumulative probabilities (pure reference,
    no Spark)."""
    import bisect

    from traffic_accidents_airflow_kafka_spark.operators.bootstrap import (
        MAX_WEIGHT,
        POISSON1_CUM,
        poisson1_weight_sql,
    )

    assert len(POISSON1_CUM) == 8
    assert 0.3678 < POISSON1_CUM[0] < 0.368  # e^-1
    assert POISSON1_CUM == sorted(POISSON1_CUM)
    assert POISSON1_CUM[-1] < 1.0

    sql = poisson1_weight_sql("U")
    # Every threshold literal appears verbatim in the SQL ladder — the
    # shared-literal contract with the Spark expression.
    for c in POISSON1_CUM:
        assert repr(c) in sql
    # Reference semantics: weight(u) = first k with u < cum[k], else cap.
    for u in [0.0, 0.1, 0.3678, 0.3679, 0.5, 0.73, 0.9, 0.99, 0.9999, 0.99999999, 1.0 - 1e-12]:
        expect = bisect.bisect_right(POISSON1_CUM, u)
        expect = expect if expect < len(POISSON1_CUM) else MAX_WEIGHT
        # The ladder returns k where u < cum[k]; bisect_right gives the
        # same index because cum is strictly increasing.
        ladder = next(
            (k for k in range(len(POISSON1_CUM)) if u < POISSON1_CUM[k]),
            MAX_WEIGHT,
        )
        assert ladder == expect, (u, ladder, expect)
