"""Z-order layout tests: Morton code correctness vs a Python reference,
and the measurable pruning benefit (narrow per-partition extents on both
dimensions) that justifies the layout step."""

from __future__ import annotations

import pyspark.sql.functions as F

from traffic_accidents_airflow_kafka_spark.operators import layout


def _morton_py(a: int, b: int, bits: int) -> int:
    z = 0
    for i in range(bits):
        z |= ((a >> i) & 1) << (2 * i)
        z |= ((b >> i) & 1) << (2 * i + 1)
    return z


def test_z_value_matches_python_reference(spark):
    rows = [(a, b) for a in [0, 1, 5, 255, 256, 65535] for b in [0, 2, 7, 511, 65535]]
    df = spark.createDataFrame(rows, "a long, b long")
    got = {
        (r["a"], r["b"]): r["z"]
        for r in df.withColumn("z", layout.z_value("a", "b", bits=16)).collect()
    }
    for (a, b), z in got.items():
        assert z == _morton_py(a, b, 16), (a, b)


def test_quantize_clamps_and_scales(spark):
    df = spark.createDataFrame([(-5.0,), (0.0,), (50.0,), (100.0,), (200.0,)], "v double")
    got = [r["q"] for r in df.withColumn("q", layout.quantize("v", 0.0, 100.0, bits=8)).collect()]
    assert got[0] == 0          # below lo clamps to 0
    assert got[1] == 0
    assert got[2] == 127        # midpoint of [0, 255]
    assert got[4] == 255        # above hi clamps to max cell
    assert all(0 <= q <= 255 for q in got)


def test_zorder_partitions_bound_both_dimensions(spark):
    """The point of the layout: after Z-order clustering, EVERY partition
    has narrow min-max extents on BOTH columns; ordering by one column
    alone leaves the other column's extent at full range in every
    partition. Compare total secondary-dimension extent across equal
    partition counts."""
    n = 4096
    df = spark.range(n).select(
        (F.col("id") % 64).cast("double").alias("x"),
        ((F.col("id") * 2654435761) % 64).cast("double").alias("y"),  # decorrelated
    )
    parts = 16

    zed = layout.cluster_by_zorder(
        df, "x", "y", (0.0, 64.0), (0.0, 64.0), num_partitions=parts, bits=8
    )
    z_ext = (
        zed.withColumn("pid", F.spark_partition_id())
        .groupBy("pid")
        .agg((F.max("y") - F.min("y")).alias("ey"), (F.max("x") - F.min("x")).alias("ex"))
        .agg(F.sum("ey").alias("sy"), F.sum("ex").alias("sx"))
        .first()
    )

    linear = df.repartitionByRange(parts, F.col("x")).sortWithinPartitions("x")
    l_ext = (
        linear.withColumn("pid", F.spark_partition_id())
        .groupBy("pid")
        .agg((F.max("y") - F.min("y")).alias("ey"))
        .agg(F.sum("ey").alias("sy"))
        .first()
    )

    # Linear-by-x leaves y at (almost) full range in every partition; the
    # Z-order layout must cut the summed y extent at least in half while
    # keeping x extents bounded too.
    assert z_ext["sy"] < l_ext["sy"] / 2
    assert z_ext["sx"] < 64.0 * parts  # x never degenerates to full range everywhere


def test_partitioned_write_gets_dynamic_partition_pruning(spark, tmp_path):
    """A date/enum-partitioned fact joined to a dim filtered on a
    NON-join column (so no static predicate can be inferred onto the
    fact) must plan a dynamicpruning subquery on the partition column —
    at 100 TB this is the difference between scanning 3 partitions and
    scanning the table. Runtime result checked against the hand sum."""
    from traffic_accidents_airflow_kafka_spark.sources.sinks import write_parquet

    fact = spark.range(10_000).select(
        "id", (F.col("id") % 20).alias("part_k"), (F.col("id") * 2).alias("value")
    )
    path = str(tmp_path / "fact")
    write_parquet(fact, path, partition_by=["part_k"])
    dim = spark.range(20).select(
        F.col("id").alias("part_k"), (F.col("id") < 3).alias("flag")
    )
    j = (
        spark.read.parquet(path)
        .join(dim.filter(F.col("flag")), "part_k")
        .agg(F.sum("value").alias("s"))
    )
    expected = sum(2 * i for i in range(10_000) if i % 20 < 3)
    assert j.collect()[0]["s"] == expected
    plan = j._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower(), "no DPP subquery on the fact scan"
