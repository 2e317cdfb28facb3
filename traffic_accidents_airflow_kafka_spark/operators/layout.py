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
