"""Banded range join — point-in-interval joins as equi-joins.

The reference has no range joins (SURVEY.md §2.3 "not present"); this is
the scale-path extension for the interval-containment joins a training
pipeline hits constantly (score band lookup, length buckets, time-range
tagging). Spark's own planner turns ``ON p >= lo AND p < hi`` with no
equality key into a BroadcastNestedLoopJoin — fine when the interval side
broadcasts, quadratic disaster when both sides are large.

The standard fix (e.g. the bucketed range-join idiom popularized by
engines like Databricks' range-join optimization, reimplemented here from
first principles): pick a fixed band width ``w``;

1. each point lands in exactly ONE band: ``floor(p / w)``;
2. each interval replicates to EVERY band it overlaps:
   ``sequence(floor(lo/w), floor(hi/w))`` + explode;
3. equi-join on the band id — a plain shuffle/broadcast hash join that
   AQE can size, skew-split, and reorder like any other;
4. re-apply the exact containment predicate ``lo <= p < hi`` to discard
   band-overlap false positives.

Because a point has exactly one band, a (point, interval) pair can match
in exactly one band — no duplicate pairs, no dropDuplicates pass.

Cost model: the interval side grows by ``width/w + 1`` copies per row;
the point side doesn't grow. Pick ``w`` near the median interval width
so the expansion stays O(1) while bands stay selective. Skewed bands
(many points in one band) are ordinary join skew — AQE's skew-join
splitting applies, unlike the nested-loop plan it replaces.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

BAND_COL = "__band"


def banded_range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    lo_col: str,
    hi_col: str,
    band_width: float,
) -> DataFrame:
    """Inner join of ``points`` to every interval containing them, with
    half-open containment ``lo <= point < hi``.

    Inner-only by contract: the band equi-join + post-filter composition
    does not preserve outer-join semantics (an unmatched left row would
    surface once per overlapped band, not once). Column sets must not
    collide. Intervals must satisfy ``lo <= hi``; ``sequence()`` throws
    at runtime otherwise, which is the desired loud failure.
    """
    w = float(band_width)
    if w <= 0:
        raise ValueError(f"band_width must be positive, got {band_width}")
    p = points.withColumn(BAND_COL, F.floor(F.col(point_col) / F.lit(w)).cast("long"))
    iv = intervals.withColumn(
        BAND_COL,
        F.explode(
            F.sequence(
                F.floor(F.col(lo_col) / F.lit(w)).cast("long"),
                F.floor(F.col(hi_col) / F.lit(w)).cast("long"),
            )
        ),
    )
    return (
        p.join(iv, BAND_COL)
        .filter((F.col(point_col) >= F.col(lo_col)) & (F.col(point_col) < F.col(hi_col)))
        .drop(BAND_COL)
    )
