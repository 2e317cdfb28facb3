"""Topic fan-out streaming job (streaming/fanout.py): convergence under
at-least-once redelivery — the guarantee the batch-id-keyed overwrite
sinks exist for. The value-hash parity of the normal path is pinned by
the stream_topics_fanout catalog oracle; this test exercises the path
the oracle can't: a replayed batch id."""

from __future__ import annotations


def test_fanout_converges_under_redelivery(spark, sf_dir, monkeypatch):
    """Deliver every micro-batch TWICE (foreachBatch's at-least-once
    contract made concrete) — the batch=<id> overwrite sinks must
    rewrite identical partials instead of double-appending, so the
    merged dashboards still equal the batch topic plans exactly."""
    from traffic_accidents_airflow_kafka_spark.plans.registry import (
        QUERY_REGISTRY,
    )
    from traffic_accidents_airflow_kafka_spark.streaming import fanout

    orig = fanout.streaming.run_foreach_batch

    def redelivering(result, spark_, batch_fn, **kw):
        def twice(batch, batch_id):
            batch_fn(batch, batch_id)
            batch_fn(batch, batch_id)  # the redelivery

        return orig(result, spark_, twice, **kw)

    monkeypatch.setattr(fanout.streaming, "run_foreach_batch", redelivering)
    merged = fanout.run_topics_fanout(spark, sf_dir)

    # One dim-join topic and one binned-events topic cover both partial
    # shapes (additive sums and grain-partial re-distinct included via
    # hospitals below).
    for topic in (
        "transit_signals_by_state",
        "accidents_by_time",
        "hospitals_schools_vs_lesions",
    ):
        batch_df = QUERY_REGISTRY[topic].fn(spark, sf_dir)
        got = sorted(
            tuple(r)
            for r in merged[topic].select(*batch_df.columns).collect()
        )
        want = sorted(tuple(r) for r in batch_df.collect())
        assert got == want, f"{topic} diverged under redelivery"

    # Run metadata records WHICH topic-3 join path was active (the r9
    # silent-fallback lesson: a failed bucketed build must be visible
    # to gates, not just a stderr line) and carries a per-topic timing
    # breakdown for every sink.
    meta = fanout.last_run_metadata()
    assert meta["orders_join_path"] == "bucketed", meta
    assert set(meta["topic_sec"]) == set(fanout.streaming.TOPICS)
    assert all(v > 0 for v in meta["topic_sec"].values()), meta


def test_parity_collect_refuses_high_cardinality(spark, monkeypatch):
    """The parity baselines are driver-side row multisets, legal ONLY
    because dashboards are dimension-bounded. _bounded_collect enforces
    that contract (r8 VERDICT #6): a topic that grows a fact-sized key
    must fail loudly BEFORE the collect, not OOM the driver."""
    import pytest

    from traffic_accidents_airflow_kafka_spark.plans import streaming_plans

    monkeypatch.setattr(streaming_plans, "PARITY_COLLECT_CEILING", 50)
    small = spark.range(50)  # at the ceiling: allowed
    assert len(streaming_plans._bounded_collect(small, "ok_topic")) == 50
    big = spark.range(51)  # one past: refused
    with pytest.raises(ValueError, match="dimension-bounded"):
        streaming_plans._bounded_collect(big, "runaway_topic")


def test_bucketed_enrichment_no_exchange_on_orders_side(spark, sf_dir, tmp_path):
    """The SCALE.md promise at the fanout module head, made concrete:
    topic-3's per-batch lineitem-orders enrichment run against the
    BUCKETED orders table inside foreachBatch. Asserts (a) the at-rest
    orders side scans its co-located buckets with NO Exchange above it
    — only the arrival micro-batch shuffles — and (b) the merged
    partials still equal the batch topic plan exactly."""
    import os

    import pyspark.sql.functions as F

    from traffic_accidents_airflow_kafka_spark.plans.registry import (
        QUERY_REGISTRY,
    )
    from traffic_accidents_airflow_kafka_spark.streaming import fanout
    from traffic_accidents_airflow_kafka_spark.streaming.core import (
        run_foreach_batch,
    )

    table = fanout.prepare_bucketed_orders(spark, sf_dir, num_buckets=8)
    li_schema = spark.read.parquet(f"{sf_dir}/lineitem.parquet").schema
    li_stream = (
        spark.readStream.schema(li_schema)
        .option("pathGlobFilter", "lineitem.parquet")
        .parquet(sf_dir)
    )
    sink = str(tmp_path / "t3_bucketed")
    plans: list[str] = []
    # Disable broadcast so the join would otherwise shuffle BOTH sides —
    # the assert below then isolates what bucketing saves.
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

    def drain(batch, batch_id):
        enriched = fanout.enrich_lineitem_bucketed(batch, spark, sf_dir)
        plans.append(
            enriched._jdf.queryExecution().executedPlan().toString()
        )
        enriched.coalesce(1).write.mode("overwrite").parquet(
            os.path.join(sink, f"batch={batch_id}")
        )

    try:
        run_foreach_batch(li_stream, spark, drain)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
        spark.sql(f"DROP TABLE IF EXISTS {table}")

    assert plans, "stream delivered no batches"
    for plan in plans:
        # The bucketed orders scan is co-located: the bucket-selection
        # marker must be present...
        assert "SelectedBucketsCount" in plan, plan
        # ...and the only join-input Exchange is the micro-batch side's
        # shuffle into the bucket layout, plus the final partial-agg
        # exchange: an unbucketed orders side would add a third.
        n_exchanges = plan.count("Exchange hashpartitioning")
        assert n_exchanges <= 2, f"orders side still shuffles:\n{plan}"

    merged = (
        spark.read.parquet(sink)
        .groupBy("o_orderpriority", "l_returnflag", "l_linestatus")
        .agg(
            F.sum("n_items").alias("n_items"),
            F.sum("sum_disc_price").cast("double").alias("sum_disc_price"),
        )
    )
    batch_df = QUERY_REGISTRY["weather_light_surface"].fn(spark, sf_dir)
    got = sorted(tuple(r) for r in merged.select(*batch_df.columns).collect())
    want = sorted(tuple(r) for r in batch_df.collect())
    assert got == want, "bucketed enrichment diverged from the batch plan"


def test_fanout_broadcast_fallback_is_loud_and_correct(spark, sf_dir, monkeypatch, capfd):
    """When the bucketed build fails with one of the guarded classes,
    the drain must (a) still produce exactly the batch answers through
    the broadcast join, (b) say so on stderr, and (c) record
    orders_join_path='broadcast' in the run metadata — the r9
    silent-fallback bug, now pinned from the failure side."""
    from pyspark.errors import AnalysisException

    from traffic_accidents_airflow_kafka_spark.plans.registry import (
        QUERY_REGISTRY,
    )
    from traffic_accidents_airflow_kafka_spark.streaming import fanout

    def refuse(spark_, sf_dir_, num_buckets=8):
        raise AnalysisException("LOCATION_ALREADY_EXISTS (synthetic)")

    monkeypatch.setattr(fanout, "prepare_bucketed_orders", refuse)
    # Self-contained regardless of test order: clear the session memo
    # and the table so run_topics_fanout must actually call the
    # (refusing) build instead of reusing an earlier test's artifact.
    from traffic_accidents_airflow_kafka_spark.plans.llm import evict_artifacts

    evict_artifacts(sf_dir)
    spark.sql(
        f"DROP TABLE IF EXISTS {fanout.bucketed_orders_table(sf_dir)}"
    )
    merged = fanout.run_topics_fanout(spark, sf_dir)
    assert fanout.last_run_metadata()["orders_join_path"] == "broadcast"
    assert "falling back to the broadcast join" in capfd.readouterr().err
    topic = "weather_light_surface"  # the topic the join path feeds
    batch_df = QUERY_REGISTRY[topic].fn(spark, sf_dir)
    got = sorted(
        tuple(r) for r in merged[topic].select(*batch_df.columns).collect()
    )
    want = sorted(tuple(r) for r in batch_df.collect())
    assert got == want
