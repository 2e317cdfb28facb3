"""As-of (point-in-time) join — a training-data-pipeline staple Spark has
no built-in for (feature lookup at label time without leakage).

Semantics: for each left row, attach the latest right row with
``right_ts <= left_ts`` within the same key (left-join: no match → nulls).

Implementation is the scalable union-and-carry-forward composition, NOT a
range self-join:

1. Tag and union both sides (right payload columns null on left rows).
2. One shuffle: partition by key, sort by (ts, side) — right rows sort
   before left rows at equal timestamps so equality matches.
3. ``last(payload, ignorenulls=True)`` over an unbounded-preceding window
   carries the most recent right payload forward.
4. Keep the left rows.

Cost: ONE shuffle of |left|+|right| rows and a per-partition sort — the
same price as a sort-merge join, versus the quadratic per-key blowup of
the naive ``left join on key and r.ts <= l.ts`` + row_number approach. At
100 TB both sides usually arrive bucketed/sorted by key already, which
drops the shuffle entirely.
"""

from __future__ import annotations

from collections.abc import Sequence

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str,
    right_ts: str,
    payload_prefix: str = "asof_",
) -> DataFrame:
    """Left as-of join; right payload columns arrive prefixed.

    Multiple right rows at the same (key, ts) resolve to the last in the
    sort order — deterministic only if the payload is; dedup the right
    side first when that matters.
    """
    on = list(on)
    payload_cols = [c for c in right.columns if c not in on and c != right_ts]

    l_tag = left.withColumn("__ts", F.col(left_ts)).withColumn("__side", F.lit(1))
    for c in payload_cols:
        l_tag = l_tag.withColumn(f"{payload_prefix}{c}", F.lit(None).cast(dict(right.dtypes)[c]))
    r_tag = right.withColumnRenamed(right_ts, "__rts").withColumn("__ts", F.col("__rts")).withColumn(
        "__side", F.lit(0)
    )
    for c in payload_cols:
        r_tag = r_tag.withColumnRenamed(c, f"{payload_prefix}{c}")
    for c in left.columns:
        if c not in r_tag.columns:
            r_tag = r_tag.withColumn(c, F.lit(None).cast(dict(left.dtypes)[c]))
    r_tag = r_tag.drop("__rts")

    cols = on + ["__ts", "__side"] + [c for c in left.columns if c not in on] + [
        f"{payload_prefix}{c}" for c in payload_cols
    ]
    unioned = l_tag.select(*cols).unionByName(r_tag.select(*cols))

    w = (
        Window.partitionBy(*on)
        .orderBy("__ts", "__side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned
    for c in payload_cols:
        carried = carried.withColumn(
            f"{payload_prefix}{c}", F.last(f"{payload_prefix}{c}", ignorenulls=True).over(w)
        )
    return carried.filter(F.col("__side") == 1).drop("__ts", "__side")
