"""Balanced two-way ANOVA with exact integer sums of squares
(Fisher 1925 via the standard balanced-design identities) and
Cochran's C variance-outlier screen (Cochran 1941) — the factorial
companion of the one-way lanes (Kruskal-Wallis q337 ranks,
Brown-Forsythe q358 spread, eta-squared q379): does fetch latency
depend on mirror AND time-of-day, and do they INTERACT?

Balanced a x b x r design (every cell exactly r >= 2 reps — audited,
not assumed; imbalance surfaces status='unbalanced' with NULL Fs).
Every SS rides one consistent 1/N scaling (N = abr), so the cleared
numerators are exact integers:

  ssa = a * sum_i A_i^2 - T^2          (A_i row totals, T grand)
  ssb = b * sum_j B_j^2 - T^2
  sscell = a*b * sum_ij C_ij^2 / r ... cleared: (N div r) factor
           folds to a*b:  sscell = a*b * sum C_ij^2 - T^2   [r in
           the per-cell totals already]
  ssab = sscell - ssa - ssb
  sstot = N * sum y^2 - T^2
  sse  = sstot - sscell

(additivity sstot == ssa+ssb+ssab+sse is EXACT in integers —
pytest-pinned, no epsilon). F ratios are exact rationals cleared to
milli with DECIMAL/HUGEINT:

  f_a_milli  = 1000 * ssa * (a*b*(r-1)) div (sse * (a-1))
  f_b_milli  = analogous
  f_ab_milli = 1000 * ssab * (a*b*(r-1)) div (sse * (a-1)*(b-1))

Zero error SS (a perfectly deterministic y) surfaces NULL Fs with
status='perfect_fit'. Note sscell uses per-cell TOTALS C_ij (the sum
over r reps): a*b * sum C_ij^2 == N * sum C_ij^2 / r exactly, which
is how the r in the denominator folds away — stated for the oracle
twin.

Cochran's C with k equal-size groups (n each — equal sizes are the
tabled contract, audited): the per-group centered moments
A_g = n*Q_g - S_g^2 share one denominator, so it cancels and

  c_ppm = 10^6 * max(A_g) div sum(A_g)

is EXACT. All-equal variances give c_ppm ~ 10^6/k (exactly, when
the A_g are exactly equal — pinned); one inflated group drives it
toward 10^6. sum A == 0 (all constant) surfaces NULL.

Distributed shape: ANOVA is one per-cell aggregate + three tiny
rollups; Cochran is one per-group aggregate + one 1-row agg.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["two_way_anova", "cochran_c"]


def two_way_anova(
    df: DataFrame,
    a_col: str = "fa",
    b_col: str = "fb",
    y_col: str = "y",
) -> DataFrame:
    """(fa, fb, y int) -> ONE row (a_levels, b_levels, r, n, ssa,
    ssb, ssab, sse, f_a_milli, f_b_milli, f_ab_milli, status)."""
    y = F.col(y_col).cast("long")
    cells = df.groupBy(
        F.col(a_col).alias("fa"), F.col(b_col).alias("fb")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("r"),
        F.sum(y).alias("c"),
        F.sum(y * y).alias("q"),
    )
    rows_a = cells.groupBy("fa").agg(F.sum("c").alias("ai"))
    rows_b = cells.groupBy("fb").agg(F.sum("c").alias("bj"))
    tot = cells.groupBy().agg(
        F.countDistinct("fa").cast("long").alias("a"),
        F.countDistinct("fb").cast("long").alias("b"),
        F.count(F.lit(1)).cast("long").alias("n_cells"),
        F.min("r").alias("rmin"),
        F.max("r").alias("rmax"),
        F.sum("c").alias("t"),
        F.sum("q").alias("qtot"),
        F.sum(F.col("c") * F.col("c")).alias("c2"),
    )
    sa = rows_a.groupBy().agg(
        F.sum(F.col("ai") * F.col("ai")).alias("a2")
    )
    sb = rows_b.groupBy().agg(
        F.sum(F.col("bj") * F.col("bj")).alias("b2")
    )
    n = F.col("a") * F.col("b") * F.col("rmin")
    # N-scaled SS numerators (see docstring): divide the marginal
    # squares by the number of observations behind each total
    ssa = F.expr(
        "cast(a as decimal(38,0)) * a2 - cast(t as decimal(38,0)) * t"
    )
    ssb = F.expr(
        "cast(b as decimal(38,0)) * b2 - cast(t as decimal(38,0)) * t"
    )
    sscell = F.expr(
        "cast(a as decimal(38,0)) * b * c2"
        " - cast(t as decimal(38,0)) * t"
    )
    sstot = F.expr(
        "cast(a as decimal(38,0)) * b * rmin * qtot"
        " - cast(t as decimal(38,0)) * t"
    )
    base2 = (
        tot.crossJoin(F.broadcast(sa))
        .crossJoin(F.broadcast(sb))
        .select(
            F.col("a").alias("a_levels"),
            F.col("b").alias("b_levels"),
            F.col("rmin").alias("r"),
            n.alias("n"),
            (
                (F.col("rmin") == F.col("rmax"))
                & (F.col("n_cells") == F.col("a") * F.col("b"))
            ).alias("balanced"),
            ssa.alias("ssa"),
            ssb.alias("ssb"),
            (sscell - ssa - ssb).alias("ssab"),
            (sstot - sscell).alias("sse"),
        )
    )
    ok = F.col("balanced") & (F.col("r") >= 2)
    status = (
        F.when(~F.col("balanced") | (F.col("r") < 2), "unbalanced")
        .when(F.col("sse") == 0, "perfect_fit")
        .otherwise("ok")
    )
    dfe = "(a_levels * b_levels * (r - 1))"

    def fratio(ss: str, dfn: str):
        return F.expr(
            f"cast(1000 * {ss} * {dfe} div (sse * ({dfn})) as long)"
        )

    return base2.select(
        "a_levels",
        "b_levels",
        "r",
        "n",
        F.expr("cast(ssa as long)").alias("ssa"),
        F.expr("cast(ssb as long)").alias("ssb"),
        F.expr("cast(ssab as long)").alias("ssab"),
        F.expr("cast(sse as long)").alias("sse"),
        F.when(
            ok & (F.col("sse") > 0), fratio("ssa", "a_levels - 1")
        ).alias("f_a_milli"),
        F.when(
            ok & (F.col("sse") > 0), fratio("ssb", "b_levels - 1")
        ).alias("f_b_milli"),
        F.when(
            ok & (F.col("sse") > 0),
            fratio("ssab", "(a_levels - 1) * (b_levels - 1)"),
        ).alias("f_ab_milli"),
        status.alias("status"),
    )


def cochran_c(
    df: DataFrame, group_col: str = "grp", x_col: str = "x"
) -> DataFrame:
    """(grp, x int) equal group sizes -> ONE row (k, n_per_group,
    max_a, sum_a, c_ppm, status)."""
    x = F.col(x_col).cast("long")
    per = df.groupBy(F.col(group_col).alias("grp")).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(x).alias("s"),
        F.sum(x * x).alias("q"),
    )
    ag = per.select(
        "n",
        (F.col("n") * F.col("q") - F.col("s") * F.col("s")).alias(
            "a"
        ),
    )
    agg = ag.groupBy().agg(
        F.count(F.lit(1)).cast("long").alias("k"),
        F.min("n").alias("nmin"),
        F.max("n").alias("nmax"),
        F.max("a").alias("max_a"),
        F.sum("a").alias("sum_a"),
    )
    equal = F.col("nmin") == F.col("nmax")
    return agg.select(
        "k",
        F.col("nmin").alias("n_per_group"),
        "max_a",
        "sum_a",
        F.when(
            equal & (F.col("sum_a") > 0),
            F.expr("max_a * 1000000 div sum_a"),
        ).alias("c_ppm"),
        F.when(~equal, F.lit("unequal_sizes"))
        .when(F.col("sum_a") == 0, F.lit("all_constant"))
        .otherwise(F.lit("ok"))
        .alias("status"),
    )
