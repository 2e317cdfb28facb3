"""Data-layout operators: Z-order (Morton) clustering for scan pruning.

At 100 TB the scan you avoid is worth more than the scan you optimize:
parquet readers skip whole files/row-groups via min-max column statistics,
but those statistics are only selective if the writer CLUSTERED the data
so each file covers a narrow value range. Range-partitioning by one column
gives perfect pruning on that column and none on any other; interleaving
the bits of several columns into one Morton code gives good (not perfect)
pruning on EVERY interleaved column simultaneously — the standard
multi-dimensional layout trick (Morton 1966; the "Z-ORDER BY" of several
lakehouse engines, rebuilt here from first principles).

Everything is codegen bit arithmetic — no UDFs:

- :func:`quantize` maps a bounded numeric column onto ``2^bits`` integer
  cells (the grid resolution of the curve);
- :func:`z_value` interleaves two quantized columns bit-by-bit into one
  long (a.bit_i → z.bit_2i, b.bit_i → z.bit_2i+1);
- :func:`cluster_by_zorder` range-partitions + sorts by the Morton code —
  the write-side layout step. Each output file then covers a compact
  Z-range, which is a compact rectangle-ish region of (a, b) space, so
  BOTH columns' min-max stats are tight in every file.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame


def quantize(col: Column | str, lo: float, hi: float, bits: int = 16) -> Column:
    """Map ``[lo, hi]`` onto integer cells ``0 .. 2^bits - 1`` (clamped).

    The cell math is two float ops (subtract-divide, multiply) identical
    under IEEE rules on any engine, then a floor — deterministic and
    SQL-replicable.
    """
    c = F.col(col) if isinstance(col, str) else col
    cells = (1 << bits) - 1
    scaled = F.floor((c - F.lit(float(lo))) / F.lit(float(hi - lo)) * F.lit(float(cells)))
    return F.least(F.greatest(scaled, F.lit(0)), F.lit(cells)).cast("long")


def z_value(a: Column | str, b: Column | str, bits: int = 16) -> Column:
    """Morton code of two ``bits``-bit non-negative ints: bit *i* of ``a``
    lands at bit ``2i``, bit *i* of ``b`` at bit ``2i + 1``.

    Expanded as ``2 × bits`` shift-and-mask terms summed — pure codegen
    (the same static-expression style as the SimHash vote aggregate), no
    UDF, exact on every engine. ``bits <= 31`` keeps the result in a
    positive long.
    """
    if not 1 <= bits <= 31:
        raise ValueError(f"bits must be in [1, 31], got {bits}")
    ca = F.col(a) if isinstance(a, str) else a
    cb = F.col(b) if isinstance(b, str) else b
    z = F.lit(0).cast("long")
    for i in range(bits):
        z = z + F.shiftleft(F.shiftrightunsigned(ca, i).bitwiseAND(F.lit(1).cast("long")), 2 * i)
        z = z + F.shiftleft(F.shiftrightunsigned(cb, i).bitwiseAND(F.lit(1).cast("long")), 2 * i + 1)
    return z


def z_value_sql(a: str, b: str, bits: int = 16) -> str:
    """The identical Morton code as engine-portable SQL (DuckDB dialect:
    ``&`` and ``<<``/``>>`` over BIGINT) — the oracle-side twin of
    :func:`z_value`, generated from the same bit layout."""
    terms = []
    for i in range(bits):
        terms.append(f"((({a} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({b} >> {i}) & 1) << {2 * i + 1})")
    return "(" + " + ".join(terms) + ")"


def cluster_by_zorder(
    df: DataFrame,
    a: str,
    b: str,
    a_range: tuple[float, float],
    b_range: tuple[float, float],
    num_partitions: int,
    bits: int = 16,
    z_col: str = "__z",
) -> DataFrame:
    """Layout step: order ``df`` along the Z-curve of (``a``, ``b``).

    ``repartitionByRange`` on the Morton code puts contiguous Z-ranges in
    the same partition (one range exchange — the same shuffle a plain
    sorted write pays), and the within-partition sort makes row groups
    internally contiguous too. Write the result with any parquet sink;
    pruning then works on predicates over EITHER column. The Z column is
    kept (dropped by callers that don't want it persisted).
    """
    qa = quantize(a, *a_range, bits=bits)
    qb = quantize(b, *b_range, bits=bits)
    with_z = df.withColumn(z_col, z_value(qa, qb, bits=bits))
    return with_z.repartitionByRange(num_partitions, F.col(z_col)).sortWithinPartitions(
        z_col
    )


def file_manifest(spark, path: str, strip_scheme: bool = True) -> "DataFrame":
    """Per-file row counts of a parquet dataset, from the files themselves:
    (file, n_rows) via ``input_file_name()`` — the manifest a compaction
    pass plans over.

    At test scale this counts rows by scanning (cheap, and it makes the
    manifest oracle-checkable against DuckDB's ``filename=true`` scan of
    the SAME files); at 100 TB the identical relation comes for free from
    the table format's metadata layer (parquet footers / Iceberg manifest
    files / Delta log) — swap the source, keep the plan. ``strip_scheme``
    drops the ``file:`` URI prefix so paths compare byte-equal with
    engines that report plain filesystem paths.
    """
    df = spark.read.parquet(path)
    file_col = F.input_file_name()
    if strip_scheme:
        file_col = F.regexp_replace(file_col, "^file:(//)?", "")
    return df.groupBy(file_col.alias("file")).agg(
        F.count(F.lit(1)).alias("n_rows")
    )


def compaction_plan(
    manifest: "DataFrame",
    target_rows: int,
    file_col: str = "file",
    rows_col: str = "n_rows",
    out_col: str = "grp",
) -> "DataFrame":
    """Small-file compaction planner (the OPTIMIZE/rewrite step of every
    lakehouse maintenance loop): assign each input file to an output
    group of ~``target_rows`` rows, preserving file order.

    Cumulative-sum packing, same approximation as corpus sharding
    (operators/sampling.py:token_shards): a file lands in group
    ``floor(rows_before / target)``, so groups fill to the target and
    overflow by at most one file — and crucially the assignment is a
    PARALLEL prefix sum (sampling.global_cumsum: contiguous buckets, local
    scan, broadcast offsets), never a single-task global window, so the
    planner itself scales to a manifest of millions of files. Ordering by
    file path keeps hive-partition neighbors (e.g. hour=) in the same
    output group — compaction preserves locality instead of scrambling
    it. The executor of the plan is then one grouped write per ``grp``
    (each group's files re-read and rewritten as one file), embarrassingly
    parallel across groups.

    Relationship to ``sources/sinks.py:compact_parquet``: that is the
    flat-directory EXECUTOR (read → repartition(n) → atomic-swap write,
    one whole-directory rewrite); this planner is the metadata-level
    step for partitioned/huge datasets where a whole-dataset rewrite is
    not an option — plan groups here, rewrite each group with the
    executor.
    """
    from .sampling import global_cumsum

    if target_rows <= 0:
        raise ValueError(f"target_rows must be positive, got {target_rows}")
    planned = global_cumsum(manifest, file_col, rows_col, out_col="rows_before")
    return planned.withColumn(
        out_col, F.floor(F.col("rows_before") / F.lit(target_rows)).cast("int")
    )
