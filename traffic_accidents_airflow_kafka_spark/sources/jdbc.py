"""Optional JDBC connector (SURVEY.md §2.1 S2/S3/S5).

The reference's warehouse is PostgreSQL; this engine's native storage is
parquet (SURVEY §1.1), with JDBC kept as the optional interop connector.
These helpers assemble the reader/writer configuration; the terminal
``.load()`` / ``.save()`` runs against any JDBC database. The round-trip
is integration-tested for real against embedded Apache Derby (which ships
in Spark's own jars): batched writes, table auto-create, partitioned
reads, and predicate pushdown all exercised end-to-end
(tests/test_ingestion_jobs.py::test_jdbc_roundtrip_embedded_derby).

Scale notes baked into the defaults:

- Reads partition on a numeric column (``partitionColumn`` +
  lower/upper bound + numPartitions) — without it Spark reads the whole
  table through ONE connection.
- ``pushDownPredicate`` is on by default in Spark; projection + filters
  reach the database as SQL (the reference hand-wrote that pushdown,
  dags/etl_crash_traffic.py:266-290).
- Writes batch at ``batchsize`` rows per round-trip — the vectorized
  replacement for the reference's per-row INSERT loop (:647-653).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, DataFrameReader, SparkSession


def jdbc_reader(
    spark: SparkSession,
    url: str,
    table: str,
    partition_column: str | None = None,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    num_partitions: int = 8,
    fetch_size: int = 10_000,
    properties: dict[str, str] | None = None,
) -> DataFrameReader:
    """S2/S3 — configured reader; call ``.load()`` against a live DB."""
    reader = (
        spark.read.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("fetchsize", str(fetch_size))
    )
    if partition_column is not None:
        if lower_bound is None or upper_bound is None:
            raise ValueError("partitioned JDBC reads need lower_bound and upper_bound")
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
            .option("numPartitions", str(num_partitions))
        )
    for k, v in (properties or {}).items():
        reader = reader.option(k, v)
    return reader


def jdbc_writer(
    df: DataFrame,
    url: str,
    table: str,
    mode: str = "append",
    batch_size: int = 1_000,
    properties: dict[str, str] | None = None,
):
    """S5 — configured batch writer (batchsize mirrors the reference's
    manual 1000-row batching, dags/etl_crash_traffic.py:293); call
    ``.save()`` against a live DB. For insert-if-absent semantics compose
    with sinks.upsert-style anti-join first (no ON CONFLICT over JDBC)."""
    writer = (
        df.write.format("jdbc")
        .mode(mode)
        .option("url", url)
        .option("dbtable", table)
        .option("batchsize", str(batch_size))
    )
    for k, v in (properties or {}).items():
        writer = writer.option(k, v)
    return writer
