"""Star-schema construction (SURVEY.md §1.3/§2.4 A8/§2.3 J3/§2.5 W1).

The reference builds 8 dimensions with ``ON CONFLICT DO NOTHING`` +
``SERIAL`` surrogate keys, then resolves fact FKs through hand-built
Python dict probes (dags/etl_crash_traffic.py:50-147, 693-787, 811-885).
The Spark-native equivalents:

- **Dimension build** — ``dropDuplicates`` over the natural key +
  ``row_number()`` ordered by the natural key: deterministic and
  re-runnable (SERIAL is neither; ``monotonically_increasing_id`` is
  partition-layout-dependent — SURVEY §7 surrogate-key strategy).
- **Fact FK resolution** — one broadcast LEFT join per dimension: dims are
  by definition small; left join preserves the ``dict.get`` miss → null
  semantics. The fact table never shuffles.
- **FK integrity** — an anti-join per FK replaces Postgres FK constraints
  (dags/etl_crash_traffic.py:138-145): violations = fact rows whose
  natural key resolves to no dimension row.

Scale: the only window function runs over a deduped *dimension*
(low-cardinality by construction). Never apply this to a fact —
row_number over an unpartitioned window is a single-task sort.
"""

from __future__ import annotations

from collections.abc import Sequence

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def build_dimension(
    source: DataFrame, natural_key: Sequence[str], id_col: str
) -> DataFrame:
    """Distinct natural-key tuples + deterministic surrogate key."""
    dim = source.select(*natural_key).dropDuplicates()
    w = Window.orderBy(*natural_key)
    return dim.withColumn(id_col, F.row_number().over(w)).select(id_col, *natural_key)


def resolve_fk(
    fact: DataFrame, dim: DataFrame, natural_key: Sequence[str], id_col: str
) -> DataFrame:
    """Attach the dimension's surrogate key to the fact via broadcast left
    join on the natural key (miss → null, matching dict.get)."""
    return fact.join(F.broadcast(dim), on=list(natural_key), how="left")


def fk_violations(
    fact: DataFrame, dim: DataFrame, natural_key: Sequence[str]
) -> DataFrame:
    """Fact rows whose natural key has no dimension row (anti-join FK
    check; empty ⇔ referential integrity holds)."""
    return fact.join(F.broadcast(dim), on=list(natural_key), how="left_anti")
