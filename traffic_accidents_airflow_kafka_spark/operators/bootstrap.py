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

Determinism (the repo's oracle discipline): each md5 digest yields TWO
per-(row, replicate) uniforms — replicate r reads 52 bits starting at
hex digit 1 + 13*(r%2) of md5(seed-(r//2)|id), scaled by 2^-52 (exact
integer parse + power-of-two scale on any engine; one digest has 128
independent bits, so splitting it halves the per-row hashing cost —
20 md5s for 40 replicates, measured 7.8 -> 6.1 s isolated on the
catalog entry at sf0.1; the residual cost is the inverse-CDF ladder and
the 2B partial-sum aggregates, both inherent to the design). The uniform maps through the Poisson(1) inverse CDF as
a CASE ladder over cumulative-probability literals shared verbatim with
the SQL oracle. Values aggregate as integer cents, so replicate sums are
exact int64 and the only float ops are the final mean divisions and the
percentile interpolation — both bit-identical cross-engine.

Weights cap at 8: P[Poisson(1) > 8] ≈ 1.1e-9, far below any effect on a
percentile over B replicates, and the cap keeps the ladder finite.
"""

from __future__ import annotations

import math
from fractions import Fraction

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

#: Exact hex-string ladder thresholds (r10 optimization). The uniform is
#: u = i / 2^52 where i is the integer value of 13 lowercase hex digits of
#: the md5, so every ladder comparison u < t reduces to an INTEGER
#: comparison: i/2^52 is an exact double (<= 52 mantissa bits), hence
#: u < t  <=>  i < t*2^52 over the reals  <=>  i < K_k where
#: K_k = ceil(t * 2^52) computed exactly via Fraction (Python floats are
#: exact rationals; ceil collapses both the integer and non-integer
#: t*2^52 cases because i is an integer). And for fixed-width lowercase
#: hex, byte-lexicographic order IS numeric order, so
#: i < K_k  <=>  hex13(i) < hex13(K_k) as strings — the ladder can probe
#: the md5 SUBSTRING directly against these literals, skipping the
#: conv(hex,16,10) + cast + divide per (row, replicate) that dominated
#: the profile (guide §1.1: measured layer-by-layer with the noop sink).
POISSON1_CUM_HEX13: list[str] = []
for _t in POISSON1_CUM:
    _f = Fraction(_t) * (1 << 52)
    _K = -(-_f.numerator // _f.denominator)  # exact ceil
    assert _K < (1 << 52)
    POISSON1_CUM_HEX13.append(format(_K, "013x"))


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
    row — replicate r draws its 52-bit uniform from hex digits
    ``1 + 13*(r%2) .. 13*(1 + r%2)`` of md5('{seed}-{r//2}|' || id)
    (two uniforms per digest; see the module docstring).

    This is the REFERENCE form (explicit uniforms through the double
    ladder, mirroring the oracle SQL literally); ``bootstrap_mean_ci``
    uses the equivalent flat hex-compare path for speed, and the
    equivalence is pinned by a dedicated test.

    Shape notes: the digests materialize as an array FIRST and
    everything downstream maps over lambda variables — inlining the md5
    into the ladder would duplicate it across every CASE rung (9
    evaluations per replicate instead of 1; measured 21 s -> 11 s on
    the catalog entry at sf0.1), and flatten(transform(...)) keeps each
    digest computed once while yielding both of its uniforms."""

    def pair(h: Column) -> Column:
        def u(off: int) -> Column:
            return (
                F.conv(F.substring(h, off, 13), 16, 10)
                .cast("long")
                .cast("double")
                / F.lit(_U52)
            )

        return F.array(u(1), u(14))

    digests = F.array(
        *[
            split_key(id_col, f"{seed}-{j}")
            for j in range((n_replicates + 1) // 2)
        ]
    )
    uniforms = F.slice(F.flatten(F.transform(digests, pair)), 1, n_replicates)
    return F.transform(uniforms, poisson1_weight)


def bootstrap_mean_ci(
    df: DataFrame,
    id_col: str,
    cents_col: Column | str,
    group_cols: list[str],
    n_replicates: int = 40,
    seed: str = "boot-v2",
    alpha: float = 0.05,
) -> DataFrame:
    """(Seed policy, r6 ADVICE: the default seed version bumps whenever
    the uniform-stream derivation changes — 'boot-v1' was one 52-bit
    uniform per md5 digest, 'boot-v2' splits each digest into two — so
    results recorded under different derivations are distinguishable by
    their seed string instead of silently diverging.)

    Per-group mean of ``cents_col``/100 with a percentile-bootstrap
    [alpha/2, 1-alpha/2] confidence interval from ``n_replicates``
    Poisson replicates — one data pass, B×|groups| shuffled partials.

    ``cents_col`` must be an exact integer column (quantize floats to
    cents first) so replicate sums stay exact. Output: group_cols +
    (n_rows, point_mean, ci_lo, ci_hi), all value-unit doubles rounded
    to 4.
    """
    cents = F.col(cents_col) if isinstance(cents_col, str) else cents_col
    # r10 fast path (guide §1.2 step 2, §4.1 "prefer built-ins"): the HOF
    # pipeline (transform over a digest array -> conv/cast/divide uniforms
    # -> transform ladder) evaluated interpreted per element; the noop-sink
    # layer profile at sf0.1 read scan 0.17 s, +digests 0.86 s,
    # +uniforms 3.40 s, +ladder 4.27 s — the uniform extraction and ladder
    # were ~80% of the cost. Restructured as stacked flat Projects:
    #   P1: each digest ONCE as its own column (referenced twice, so
    #       CollapseProject cannot inline/duplicate the md5 — SPARK-36718
    #       keeps multi-referenced non-cheap aliases in their own Project);
    #   P2: each replicate weight as a flat column whose CASE ladder
    #       compares the md5 hex substring against the exact
    #       POISSON1_CUM_HEX13 literals (see their docstring for the
    #       integer-equivalence proof) — no conv, no casts, no division,
    #       and for even replicates the full digest is compared against
    #       the threshold padded with 19 '0's (the minimal hex char), which
    #       equals the prefix-13 comparison, saving the substring too.
    # Weight values are bit-identical to replicate_weights() — pinned by
    # tests/test_extensions.py::test_bootstrap_flat_path_matches_reference.
    qid = f"`{id_col}`"
    digests = df.select(
        *group_cols,
        cents.alias("__cents"),
        *[
            F.expr(
                f"md5(cast(concat('{seed}-{j}|', cast({qid} as string)) "
                "as binary))"
            ).alias(f"__d{j}")
            for j in range((n_replicates + 1) // 2)
        ],
    )

    def _weight_sql(r: int) -> str:
        j, off = r // 2, 1 + 13 * (r % 2)
        if off == 1:
            probe, pad = f"__d{j}", "0" * 19
        else:
            probe, pad = f"substring(__d{j}, {off}, 13)", ""
        rungs = " ".join(
            f"WHEN {probe} < '{h}{pad}' THEN {k}L"
            for k, h in enumerate(POISSON1_CUM_HEX13)
        )
        return f"CASE {rungs} ELSE {MAX_WEIGHT}L END"

    base = digests.select(
        *group_cols,
        "__cents",
        *[F.expr(_weight_sql(r)).alias(f"__w{r}") for r in range(n_replicates)],
    )
    # Aggregate the replicate axis as 2B agg expressions instead of a
    # B-fold row explode: the shuffle input stays |rows|, not B x |rows|
    # (measured ~2x on the catalog entry), and the per-group output is
    # the same B partial-sum pairs.
    sums = base.groupBy(*group_cols).agg(
        *[
            F.sum(f"__w{r}").alias(f"__n{r}")
            for r in range(n_replicates)
        ],
        *[
            F.sum(F.col(f"__w{r}") * F.col("__cents")).alias(f"__s{r}")
            for r in range(n_replicates)
        ],
    )
    # Empty-replicate guard: for a tiny group, a replicate's Poisson
    # weight sum can be 0. Spark's Divide would yield NULL here anyway,
    # but DuckDB (the oracle engine) follows IEEE and yields ±inf, which
    # poisons quantile_cont. Guarding explicitly on BOTH sides (this
    # F.when + NULLIF in the oracle SQL) makes both engines drop empty
    # replicates identically — percentile/quantile_cont skip NULLs.
    rep = sums.select(
        *group_cols,
        F.explode(
            F.array(
                *[
                    F.when(
                        F.col(f"__n{r}") > 0,
                        F.col(f"__s{r}").cast("double")
                        / F.col(f"__n{r}")
                        / 100,
                    )
                    for r in range(n_replicates)
                ]
            )
        ).alias("__mean"),
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
