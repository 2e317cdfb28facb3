"""Leakage-safe categorical feature encoding (out-of-fold target
encoding — the Kaggle/feature-store staple): replace a categorical with
the target mean computed EXCLUDING the row's own fold, so the encoding
never sees the row's own label (the train-time twin of the as-of join's
no-future-data rule).

For row in category c, fold f, with smoothing m toward the global mean g:

    te(c, f) = (S_c - S_cf + m * g) / (N_c - N_cf + m)

Scale shape: ONE hash aggregate over the fact table produces the
(|categories| x k)-row sufficient-statistics table; everything after —
category totals, global mean, the encoding formula — is arithmetic on
that tiny table, broadcast back onto rows. No second corpus shuffle.

Exactness contract (same discipline as the rest of the repo): target
sums are exact decimals, folds are md5-derived integers, and the final
expression applies the identical IEEE operation order in Spark and the
DuckDB oracle — bit-identical encodings, no rounding needed.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

from .sampling import split_key


def fold_assign(id_col: str, k: int, seed: str) -> Column:
    """Deterministic fold in [0, k): the 52-bit integer prefix of
    md5(seed|id) mod k. Integer arithmetic end to end (exact in any
    engine); the mod-k bias of a 52-bit range is < 2^-49 — irrelevant
    against fold-size noise."""
    h = F.conv(F.substring(split_key(id_col, seed), 1, 13), 16, 10).cast("long")
    return (h % F.lit(k)).cast("int")


def oof_encoding_table(
    df: DataFrame,
    cat_col: str,
    target_col: str,
    id_col: str,
    k: int = 5,
    smoothing: float = 20.0,
    seed: str = "te-folds-v1",
) -> DataFrame:
    """(category, fold, n_rows, oof_encoding): the sufficient-statistics
    table every row in (category, fold) looks its encoding up in."""
    t = F.col(target_col).cast("decimal(18,2)")
    folds = df.select(
        F.col(cat_col).alias("category"),
        fold_assign(id_col, k, seed).alias("fold"),
        t.alias("t"),
    )
    cf = folds.groupBy("category", "fold").agg(
        F.count(F.lit(1)).alias("n_cf"), F.sum("t").alias("s_cf")
    )
    c = cf.groupBy("category").agg(
        F.sum("n_cf").alias("n_c"), F.sum("s_cf").alias("s_c")
    )
    g = folds.agg(
        (F.sum("t").cast("double") / F.count(F.lit(1))).alias("gmean")
    )
    m = F.lit(float(smoothing))
    return (
        cf.join(c, "category")
        .crossJoin(F.broadcast(g))
        .select(
            "category",
            "fold",
            F.col("n_cf").cast("bigint").alias("n_rows"),
            (
                ((F.col("s_c") - F.col("s_cf")).cast("double") + m * F.col("gmean"))
                / ((F.col("n_c") - F.col("n_cf")).cast("double") + m)
            ).alias("oof_encoding"),
        )
    )


def encode_rows(
    df: DataFrame,
    cat_col: str,
    target_col: str,
    id_col: str,
    k: int = 5,
    smoothing: float = 20.0,
    seed: str = "te-folds-v1",
    out_col: str | None = None,
) -> DataFrame:
    """Row-level transform: attach the out-of-fold encoding to EVERY row
    (broadcast LEFT join against the |categories|xk stats table, row
    count preserved). Rows whose category or id is NULL can never match
    a join key — SQL NULL-equality — so they (like genuinely unseen
    serving-time categories) fall back to the smoothed global mean
    rather than silently dropping out of the training set."""
    out_col = out_col or f"te_{cat_col}"
    enc = oof_encoding_table(df, cat_col, target_col, id_col, k, smoothing, seed)
    g = df.agg(
        (
            F.sum(F.col(target_col).cast("decimal(18,2)")).cast("double")
            / F.count(F.lit(1))
        ).alias("__gmean")
    )
    keyed = df.withColumn("__fold", fold_assign(id_col, k, seed))
    return (
        keyed.join(
            F.broadcast(
                enc.select(
                    F.col("category").alias(cat_col),
                    F.col("fold").alias("__fold"),
                    F.col("oof_encoding").alias(out_col),
                )
            ),
            [cat_col, "__fold"],
            "left",
        )
        .crossJoin(F.broadcast(g))
        .withColumn(out_col, F.coalesce(F.col(out_col), F.col("__gmean")))
        .drop("__fold", "__gmean")
    )
