"""Deterministic Poisson bootstrap — uncertainty estimates in ONE pass.

The classic bootstrap resamples n rows WITH replacement B times — a
non-starter at 100 TB (B full shuffles of the dataset). The streaming
form (Chamandy et al. 2012, "Estimating Uncertainty for Massive Data
Streams"; the Poisson bootstrap) replaces resampling with weights: each
row receives, per replicate r, an independent Poisson(1) count w_r —
the limit of Binomial(n, 1/n) multiplicities — so every replicate's
statistic is a WEIGHTED aggregate computed in the same map-side pass,
and the shuffle carries B partial sums per group instead of B copies of
the data.

Determinism (the repo's oracle discipline): the per-(row, replicate)
uniform is the first 52 bits of md5(seed-r|id) scaled by 2^-52
(operators/sampling.py:hash_uniform — exact integer parse + power-of-two
scale on any engine), mapped through the Poisson(1) inverse CDF as a
CASE ladder over cumulative-probability literals shared verbatim with
the SQL oracle. Values aggregate as integer cents, so replicate sums are
exact int64 and the only float ops are the final mean divisions and the
percentile interpolation — both bit-identical cross-engine.

Weights cap at 8: P[Poisson(1) > 8] ≈ 1.1e-9, far below any effect on a
percentile over B replicates, and the cap keeps the ladder finite.
"""

from __future__ import annotations

import math

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

from .sampling import _U52, split_key

#: Cumulative Poisson(1) probabilities for k = 0..7 (weight 8 catches the
#: remaining ~1.1e-9 tail). repr() of these exact doubles is inlined in
#: BOTH the Spark literals and the SQL oracle — one source of truth.
POISSON1_CUM: list[float] = []
_acc = 0.0
for _k in range(8):
    _acc += math.exp(-1.0) / math.factorial(_k)
    POISSON1_CUM.append(_acc)

MAX_WEIGHT = 8


def poisson1_weight(u: Column) -> Column:
    """Poisson(1) inverse CDF over a uniform column, as a CASE ladder."""
    expr = F.lit(MAX_WEIGHT)
    for k in reversed(range(len(POISSON1_CUM))):
        expr = F.when(u < F.lit(POISSON1_CUM[k]), F.lit(k)).otherwise(expr)
    return expr.cast("long")


def poisson1_weight_sql(u_sql: str) -> str:
    """The identical ladder in SQL (same literals, same comparisons)."""
    cases = " ".join(
        f"WHEN {u_sql} < {POISSON1_CUM[k]!r} THEN {k}"
        for k in range(len(POISSON1_CUM))
    )
    return f"(CASE {cases} ELSE {MAX_WEIGHT} END)"


def replicate_weights(
    id_col: str, n_replicates: int, seed: str
) -> Column:
    """Array of ``n_replicates`` deterministic Poisson(1) weights for a
    row — element r uses the uniform from md5('{seed}-{r}|' || id)."""

    def u(r: int) -> Column:
        return (
            F.conv(F.substring(split_key(id_col, f"{seed}-{r}"), 1, 13), 16, 10)
            .cast("long")
            .cast("double")
            / F.lit(_U52)
        )

    return F.array(*[poisson1_weight(u(r)) for r in range(n_replicates)])


def bootstrap_mean_ci(
    df: DataFrame,
    id_col: str,
    cents_col: Column | str,
    group_cols: list[str],
    n_replicates: int = 40,
    seed: str = "boot-v1",
    alpha: float = 0.05,
) -> DataFrame:
    """Per-group mean of ``cents_col``/100 with a percentile-bootstrap
    [alpha/2, 1-alpha/2] confidence interval from ``n_replicates``
    Poisson replicates — one data pass, B×|groups| shuffled partials.

    ``cents_col`` must be an exact integer column (quantize floats to
    cents first) so replicate sums stay exact. Output: group_cols +
    (n_rows, point_mean, ci_lo, ci_hi), all value-unit doubles rounded
    to 4.
    """
    cents = F.col(cents_col) if isinstance(cents_col, str) else cents_col
    base = df.select(
        *group_cols,
        cents.alias("__cents"),
        replicate_weights(id_col, n_replicates, seed).alias("__w"),
    )
    rep = (
        base.select(
            *group_cols, "__cents", F.posexplode("__w").alias("__r", "__wt")
        )
        .groupBy(*group_cols, "__r")
        .agg(
            F.sum("__wt").alias("__n"),
            F.sum(F.col("__wt") * F.col("__cents")).alias("__s"),
        )
        .withColumn(
            "__mean", F.col("__s").cast("double") / F.col("__n") / 100
        )
    )
    ci = rep.groupBy(*group_cols).agg(
        F.percentile("__mean", F.lit(alpha / 2)).alias("__lo"),
        F.percentile("__mean", F.lit(1 - alpha / 2)).alias("__hi"),
    )
    point = df.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n_rows"),
        (F.sum(cents).cast("double") / F.count(F.lit(1)) / 100).alias(
            "__pm"
        ),
    )
    return (
        point.join(F.broadcast(ci), group_cols)
        .select(
            *group_cols,
            "n_rows",
            F.round("__pm", 4).alias("point_mean"),
            F.round("__lo", 4).alias("ci_lo"),
            F.round("__hi", 4).alias("ci_hi"),
        )
        .orderBy(*group_cols)
    )
