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
