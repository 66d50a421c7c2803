"""Parametric two-sample and paired effect/test panels — Cohen's d,
Hedges' g, pooled and Welch t, Welch-Satterthwaite df (Cohen 1988;
Hedges 1981; Welch 1947), and the paired-differences t with its dz
effect size. The PARAMETRIC counterpart of the rank lanes: Cliff's
delta (q353) is the scale-free effect, Mann-Whitney (q246) the rank
verdict; dashboards still quote d and t, and meta-analysis wants g.

All statistics are SQUARES of the textbook quantities (the q354
sqrt-free discipline), each an exact integer rational before one
trunc. With per-group n_i, S_i = sum x, Q_i = sum x^2 and the
centered moments A_i = n_i*Q_i - S_i^2 (so s_i^2 = A_i/(n_i(n_i-1))):

  md_num   = S1*n2 - S2*n1            (mean diff, scale 1/(n1*n2))
  pooled s_p^2 = (A1/n1 + A2/n2) / (n1+n2-2)
  d2_milli = 1000 * md_num^2 * (n1+n2-2)
             div (n1 * n2 * (n2*A1 + n1*A2))
  g2_milli = d2 * (4*df-4)^2 / (4*df-1)^2, df = n1+n2-2 (Hedges'
             small-sample J^2, exact rational)
  t2_milli = 1000 * md_num^2 * (n1+n2-2) div ((n1+n2)*(n2*A1+n1*A2))
             (pooled t^2 = d^2 * n1 n2/(n1+n2))
  welch_t2 = 1000 * md_num^2 * (n1-1)(n2-1)
             div (n2^2*A1*(n2-1) + n1^2*A2*(n1-1))
  welch_df = (s1^2/n1 + s2^2/n2)^2 over its Satterthwaite sum,
             cleared to one DECIMAL/HUGEINT division (milli).

Paired panel, on differences d_i = after - before with Sd, Qd:

  t2_milli  = 1000 * Sd^2 * (n-1) div (n*Qd - Sd^2)
  dz2_milli = t2 / n  (cleared in one division, not two)

Degenerate lanes: any group with n < 2, or zero pooled/Welch
variance, surfaces NULL. The d-band (negligible < 0.2 <= small <
0.5 <= medium < 0.8 <= large, Cohen's conventions on |d| — squared
thresholds 40/250/640 milli) ships as a label. Long-bound contract:
md_num^2*(n+~) needs n*max|x| <= ~10^5 before the DECIMAL stages
(bounded slices, the q330 contract).

Distributed shape: ONE map-side-combinable aggregate each.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["two_sample_effect", "paired_effect"]


def two_sample_effect(
    df: DataFrame, group_col: str = "grp", x_col: str = "x"
) -> DataFrame:
    """(grp 0/1, x int) -> ONE row (n1, n2, md_num, d2_milli,
    g2_milli, t2_milli, welch_t2_milli, welch_df_milli, band,
    direction)."""
    g0 = F.col(group_col) == 0
    x = F.col(x_col).cast("long")
    agg = df.groupBy().agg(
        F.sum(g0.cast("long")).alias("n1"),
        F.sum((~g0).cast("long")).alias("n2"),
        F.sum(F.when(g0, x).otherwise(0)).alias("s1"),
        F.sum(F.when(~g0, x).otherwise(0)).alias("s2"),
        F.sum(F.when(g0, x * x).otherwise(0)).alias("q1"),
        F.sum(F.when(~g0, x * x).otherwise(0)).alias("q2"),
    )
    base = agg.select(
        "n1",
        "n2",
        (F.col("s1") * F.col("n2") - F.col("s2") * F.col("n1")).alias(
            "md_num"
        ),
        (F.col("n1") * F.col("q1") - F.col("s1") * F.col("s1")).alias(
            "a1"
        ),
        (F.col("n2") * F.col("q2") - F.col("s2") * F.col("s2")).alias(
            "a2"
        ),
    ).select(
        "*",
        # pooled-variance base (n2*A1 + n1*A2) and the Welch bases,
        # named once so Spark and the oracle share one clearing
        F.expr("n2 * a1 + n1 * a2").alias("pd"),
        F.expr(
            "cast(n2 as decimal(38,0)) * n2 * a1 * (n2 - 1)"
            " + cast(n1 as decimal(38,0)) * n1 * a2 * (n1 - 1)"
        ).alias("wd"),
        F.expr("cast(a1 as decimal(38,0)) * n2 * n2 * (n2 - 1)").alias(
            "w1"
        ),
        F.expr("cast(a2 as decimal(38,0)) * n1 * n1 * (n1 - 1)").alias(
            "w2"
        ),
    )
    ok = (F.col("n1") >= 2) & (F.col("n2") >= 2)
    md2 = "cast(md_num as decimal(38,0)) * md_num"
    d2 = F.expr(
        f"cast({md2} * 1000 * (n1 + n2 - 2)"
        " div (cast(n1 as decimal(38,0)) * n2 * pd) as long)"
    )
    g2 = F.expr(
        f"cast({md2} * 1000 * (n1 + n2 - 2)"
        " * (4 * (n1 + n2 - 2) - 4) * (4 * (n1 + n2 - 2) - 4)"
        " div (cast(n1 as decimal(38,0)) * n2 * pd"
        "      * (4 * (n1 + n2 - 2) - 1)"
        "      * (4 * (n1 + n2 - 2) - 1)) as long)"
    )
    t2 = F.expr(
        f"cast({md2} * 1000 * (n1 + n2 - 2)"
        " div (cast(n1 + n2 as decimal(38,0)) * pd) as long)"
    )
    welch_t2 = F.expr(
        f"cast({md2} * 1000 * (n1 - 1) * (n2 - 1) div wd as long)"
    )
    welch_df = F.expr(
        "cast((w1 + w2) * (w1 + w2) * (n1 - 1) * (n2 - 1) * 1000"
        " div ((n2 - 1) * w1 * w1 + (n1 - 1) * w2 * w2) as long)"
    )
    out = base.select(
        "n1",
        "n2",
        "md_num",
        F.when(ok & (F.col("pd") > 0), d2).alias("d2_milli"),
        F.when(ok & (F.col("pd") > 0), g2).alias("g2_milli"),
        F.when(ok & (F.col("pd") > 0), t2).alias("t2_milli"),
        F.when(ok & (F.col("wd") > 0), welch_t2).alias(
            "welch_t2_milli"
        ),
        F.when(
            ok & (F.col("w1") + F.col("w2") > 0)
            & ((F.col("a1") > 0) | (F.col("a2") > 0)),
            welch_df,
        ).alias("welch_df_milli"),
    )
    band = (
        F.when(F.col("d2_milli") < 40, F.lit("negligible"))
        .when(F.col("d2_milli") < 250, F.lit("small"))
        .when(F.col("d2_milli") < 640, F.lit("medium"))
        .otherwise(F.lit("large"))
    )
    return out.select(
        "*",
        F.when(F.col("d2_milli").isNotNull(), band).alias("band"),
        F.when(F.col("md_num") > 0, F.lit("group0_higher"))
        .when(F.col("md_num") < 0, F.lit("group1_higher"))
        .otherwise(F.lit("equal_means"))
        .alias("direction"),
    )


def paired_effect(
    df: DataFrame, before_col: str = "before", after_col: str = "after"
) -> DataFrame:
    """(before int, after int) one row per unit -> ONE row (n, sd,
    t2_milli, dz2_milli, direction): paired t^2 on the differences
    and its dz^2 effect, exact rationals."""
    d = (F.col(after_col) - F.col(before_col)).cast("long")
    agg = df.groupBy().agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(d).alias("sd"),
        F.sum(d * d).alias("qd"),
    )
    den = F.expr("n * qd - sd * sd")
    ok = (F.col("n") >= 2) & (den > 0)
    return agg.select(
        "n",
        "sd",
        F.when(
            ok,
            F.expr(
                "cast(cast(sd as decimal(38,0)) * sd * 1000 * (n - 1)"
                " div (n * qd - sd * sd) as long)"
            ),
        ).alias("t2_milli"),
        F.when(
            ok,
            F.expr(
                "cast(cast(sd as decimal(38,0)) * sd * 1000 * (n - 1)"
                " div (cast(n as decimal(38,0))"
                "      * (n * qd - sd * sd)) as long)"
            ),
        ).alias("dz2_milli"),
        F.when(F.col("sd") > 0, F.lit("increased"))
        .when(F.col("sd") < 0, F.lit("decreased"))
        .otherwise(F.lit("no_net_change"))
        .alias("direction"),
    )
