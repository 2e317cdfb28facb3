"""Catalog-wide physical-plan tripwires: the perf regressions that creep
in silently (cartesian products, Python row-UDFs in SQL-expressible
queries, non-broadcast dim joins) fail here before they hit the bench."""

from __future__ import annotations

import pytest

from traffic_accidents_airflow_kafka_spark.plans import QUERY_REGISTRY

#: Queries allowed a BroadcastNestedLoopJoin: the brute-force cosine
#: baselines genuinely crossJoin a deliberately-tiny broadcast query set.
CROSS_JOIN_OK = {"embedding_topk"}

#: Streaming entries build a streaming plan — skipped here (their shape is
#: asserted in the streaming tests).
STREAMING = {"stream_window_counts"}

#: Queries allowed Arrow-batched Python stages (mapInPandas/pandas_udf):
#: the documented escape hatches, never row-at-a-time BatchEvalPython.
ARROW_OK = {"multimodal_meta"}


@pytest.mark.parametrize("name", sorted(set(QUERY_REGISTRY) - STREAMING))
def test_plan_has_no_scale_killers(spark, sf_dir, name):
    df = QUERY_REGISTRY[name].fn(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan, f"{name} plans a cartesian product"
    if name not in CROSS_JOIN_OK:
        assert "BroadcastNestedLoopJoin" not in plan, f"{name} plans a nested-loop join"
    # Row-at-a-time Python is banned everywhere; Arrow stages only where
    # sanctioned.
    assert "BatchEvalPython" not in plan, f"{name} uses a row-at-a-time Python UDF"
    if name not in ARROW_OK:
        assert "ArrowEvalPython" not in plan and "MapInPandas" not in plan, (
            f"{name} has an unsanctioned Python stage"
        )
