"""Data-quality constraint auditing — declarative expectations over a
DataFrame, evaluated in ONE aggregate pass.

The reference enforces its contracts through Postgres DDL (NOT NULL, FK,
UNIQUE — dags/etl_crash_traffic.py:50-147) and crashes on violation at
load time. A lakehouse table has no DDL enforcement, so pipelines audit
instead: count violations per named rule and gate/alert on the result
(the Deequ/expectations idiom, rebuilt minimally).

Two shapes, matching what can and cannot be a row predicate:

- :func:`violation_counts` — row-level rules (null, range, enum, regex)
  as named boolean Columns, summed in a single hash-aggregate scan: cost
  is one pass regardless of rule count.
- :func:`duplicate_key_count` — uniqueness needs a groupBy on the key;
  one extra shuffle keyed on the candidate key, counting rows beyond the
  first per key.

Both return counts, not row samples — at 100 TB the audit result must be
O(rules), never O(violations); drill-down queries fetch examples on
demand.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame


def violation_counts(df: DataFrame, checks: dict[str, Column]) -> DataFrame:
    """Count rows violating each named predicate (predicate = TRUE means
    the row VIOLATES the rule). One aggregate pass; output long-form
    (check_name, n_violations) for stable schemas as rules evolve."""
    aggs = [
        F.sum(F.when(pred, 1).otherwise(0)).alias(name)
        for name, pred in checks.items()
    ]
    wide = df.agg(*aggs)
    stack_args = ", ".join(f"'{name}', {name}" for name in checks)
    return wide.selectExpr(
        f"stack({len(checks)}, {stack_args}) AS (check_name, n_violations)"
    )


def duplicate_key_count(df: DataFrame, key_cols: list[str]) -> DataFrame:
    """Rows carrying a non-unique key, as (check_name, n_violations):
    total rows minus distinct keys — the UNIQUE-constraint audit."""
    dup = (
        df.groupBy(*key_cols)
        .agg(F.count(F.lit(1)).alias("n"))
        .agg(F.sum(F.col("n") - 1).alias("n_violations"))
    )
    name = "unique_" + "_".join(key_cols)
    return dup.select(F.lit(name).alias("check_name"), F.coalesce("n_violations", F.lit(0)).alias("n_violations"))


# ---------------------------------------------------------------------------
# Repetition-based quality filters (Gopher/MassiveText rule family: Rae et
# al. 2021 appendix A1.1; reused by RefinedWeb, FineWeb, Dolma). A document
# is low-quality when one n-gram dominates it (top n-gram coverage) or when
# a large fraction of its longer n-grams are internal repeats. Per-document
# aggregates over the doc's own n-gram multiset — no cross-document state.
#
# Spark shape: explode n-grams → two-level aggregate keyed by (doc, gram)
# then (doc). The (doc, gram) key is produced clustered by the explode, so
# the first aggregation combines almost entirely map-side; the second is
# |docs| keys. Document bodies never shuffle — only (id, gram-count) rows.
# This per-doc-distributed shape is deliberate: a higher-order-function
# version over the in-row token array would be O(len²) per doc and would
# serialize giant docs into single tasks, exactly what kills web-crawl
# corpora with MB-scale outlier documents.

from .decontam import word_ngrams


def repetition_stats(
    df: DataFrame,
    id_col: str,
    text_col: str,
    top_bigram_threshold: float = 0.18,
    dup_fivegram_threshold: float = 0.15,
) -> DataFrame:
    """Per-document repetition metrics + the composite ``repetitive`` flag.

    Output per doc: bigram profile (``bi_total``/``bi_distinct``/``bi_top``),
    5-gram profile (``five_*``), ``top_bigram_frac`` (tokens covered by the
    modal bigram / total tokens, the token-denominated Gopher coverage),
    ``dup_fivegram_frac`` (fraction of 5-gram instances that are repeats),
    ``repetitive`` (either fraction over its threshold). Short docs get
    zero-filled profiles and fractions of 0.0.

    Shape (r6 shuffle-count rework): ONE text scan emits both gram
    lengths as a tagged (n, gram) explode, so the whole profile is two
    hash-aggregates — groupBy(id, n, gram) then groupBy(id) with
    conditional aggregates — instead of the previous two independent
    explode→agg branches plus a three-way id join (3 text scans, 4 gram
    shuffles, 2 join exchanges). ``explode_outer`` keeps gram-less docs
    alive, preserving the zero-filled-profile contract without a
    rejoin. Still per-doc-distributed: only (id, n, gram-hashable)
    rows shuffle, never whole texts, and no O(len^2) in-row HOF.
    """
    tagged = F.concat(
        F.transform(
            word_ngrams(text_col, 2),
            lambda g: F.struct(F.lit(2).alias("n"), g.alias("gram")),
        ),
        F.transform(
            word_ngrams(text_col, 5),
            lambda g: F.struct(F.lit(5).alias("n"), g.alias("gram")),
        ),
    )
    rows = df.select(
        F.col(id_col),
        F.size(F.split(F.col(text_col), " ")).alias("n_tokens"),
        F.explode_outer(tagged).alias("t"),
    ).select(
        id_col,
        "n_tokens",
        F.col("t.n").alias("__n"),
        F.col("t.gram").alias("gram"),
    )
    per_gram = rows.groupBy(id_col, "__n", "gram").agg(
        F.max("n_tokens").alias("n_tokens"),
        F.count(F.lit(1)).alias("cnt"),
    )

    def _for(n: int, agg, zero=0):
        return agg(
            F.when(F.col("__n") == n, F.col("cnt")).otherwise(F.lit(zero))
        )

    prof = per_gram.groupBy(id_col).agg(
        F.max("n_tokens").alias("n_tokens"),
        _for(2, F.sum).alias("bi_total"),
        F.sum(F.when(F.col("__n") == 2, 1).otherwise(0)).alias("bi_distinct"),
        _for(2, F.max).alias("bi_top"),
        _for(5, F.sum).alias("five_total"),
        F.sum(F.when(F.col("__n") == 5, 1).otherwise(0)).alias(
            "five_distinct"
        ),
    )
    top_bigram_frac = F.when(
        F.col("n_tokens") > 0,
        F.col("bi_top") * 2 / F.col("n_tokens").cast("double"),
    ).otherwise(F.lit(0.0))
    dup_fivegram_frac = F.when(
        F.col("five_total") > 0,
        (F.col("five_total") - F.col("five_distinct"))
        / F.col("five_total").cast("double"),
    ).otherwise(F.lit(0.0))
    return prof.select(
        id_col,
        "n_tokens",
        "bi_total",
        "bi_distinct",
        "bi_top",
        "five_total",
        "five_distinct",
        top_bigram_frac.alias("top_bigram_frac"),
        dup_fivegram_frac.alias("dup_fivegram_frac"),
        (
            (top_bigram_frac > F.lit(top_bigram_threshold))
            | (dup_fivegram_frac > F.lit(dup_fivegram_threshold))
        ).alias("repetitive"),
    )
