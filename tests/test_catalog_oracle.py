"""Every registered catalog query must hash-match its DuckDB oracle at
sf0.001 (the driver does the same at sf0.01). This is the local pre-flight
for the t2 correctness gate."""

from __future__ import annotations

import pytest

from traffic_accidents_airflow_kafka_spark.plans.analytics import QUERY_REGISTRY

from .oracle_utils import assert_frames_match, duckdb_conn

ORACLE_QUERIES = sorted(n for n, s in QUERY_REGISTRY.items() if s.oracle is not None)
ROWS_ONLY_QUERIES = sorted(n for n, s in QUERY_REGISTRY.items() if s.oracle is None)


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb_conn(sf_dir)
    yield con
    con.close()


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_query_matches_oracle(spark, sf_dir, duck, name):
    spec = QUERY_REGISTRY[name]
    spark_pdf = spec.fn(spark, sf_dir).toPandas()
    oracle_pdf = duck.execute(spec.oracle).df()
    assert_frames_match(spark_pdf, oracle_pdf, name)


@pytest.mark.parametrize("name", ROWS_ONLY_QUERIES)
def test_rows_only_query_runs(spark, sf_dir, name):
    # The driver's smoke gate requires rows > 0; deeper semantics for each
    # rows-only query live in its dedicated test (planted-duplicate
    # fixtures, ANN recall, sketch error bounds, multimodal plumbing).
    spec = QUERY_REGISTRY[name]
    df = spec.fn(spark, sf_dir)
    assert df.count() > 0, f"{name} returned no rows"
    assert len(df.schema.fields) > 0
