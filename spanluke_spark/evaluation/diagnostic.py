"""Diagnostic likelihood-ratio panel (Deeks & Altman 2004) and the
turning-point randomness test (Kendall 1973) — how USEFUL is a
binary detector independent of prevalence, and is a series even
random enough to chart? LR+/LR- are the prevalence-free numbers the
confusion lanes (MCC q354, threshold sweep q363, 2x2 effects q395)
do not report — they are what converts a prior into a posterior —
and the turning-point count is the lightest-weight randomness screen
beside runs (q349) and records (q429).

Diagnostic panel, exact one-trunc rationals on the confusion counts:

  sens_ppm  = 10^6 * tp div (tp + fn)
  spec_ppm  = 10^6 * tn div (tn + fp)
  lr_plus_milli  = 1000 * tp * (tn + fp) div ((tp + fn) * fp)
  lr_minus_milli = 1000 * fn * (tn + fp) div ((tp + fn) * tn)
  dor_milli      = 1000 * tp * tn div (fp * fn)

with the EXACT identity dor == lr+/lr- == the q395 odds ratio
(pytest-pinned against two_by_two_effects on the same table). A
zero denominator (perfect specificity -> LR+ infinite, etc.)
surfaces NULL — infinity is reported as NULL plus the zero cell
visible in the counts, never a sentinel number (stated).

Turning points, exact moments: T counts strict interior peaks and
troughs ((x_i - x_{i-1}) * (x_i - x_{i+1}) > 0); under randomness
E[T] = 2(n-2)/3 and Var[T] = (16n - 29)/90, so

  z2_milli = 10000 * (3T - 2(n-2))^2 div (16n - 29)

one exact division (the 9 and 90 fold into the 10000), chi-square(1)
verdict. Any adjacent tie violates the distinct-values assumption
and surfaces status='ties' with NULL verdict (audited, never
guessed); monotone series fire from BELOW (T == 0), rapid
alternation from ABOVE (T == n-2) — both pinned.

Distributed shape: the panel is ONE confusion aggregate; turning
points are one lag/lead window + one aggregate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["diagnostic_panel", "turning_points"]


def diagnostic_panel(
    df: DataFrame, truth_col: str = "truth", pred_col: str = "pred"
) -> DataFrame:
    """(truth bool, pred bool) -> ONE row (tp, fp, fn, tn, sens_ppm,
    spec_ppm, lr_plus_milli, lr_minus_milli, dor_milli)."""
    t = F.col(truth_col).cast("boolean")
    p = F.col(pred_col).cast("boolean")
    agg = df.groupBy().agg(
        F.sum((t & p).cast("long")).alias("tp"),
        F.sum((~t & p).cast("long")).alias("fp"),
        F.sum((t & ~p).cast("long")).alias("fn"),
        F.sum((~t & ~p).cast("long")).alias("tn"),
    )
    return agg.select(
        "tp",
        "fp",
        "fn",
        "tn",
        F.when(
            F.expr("tp + fn") > 0,
            F.expr("tp * 1000000 div (tp + fn)"),
        ).alias("sens_ppm"),
        F.when(
            F.expr("tn + fp") > 0,
            F.expr("tn * 1000000 div (tn + fp)"),
        ).alias("spec_ppm"),
        F.when(
            (F.expr("tp + fn") > 0) & (F.col("fp") > 0),
            F.expr("tp * (tn + fp) * 1000 div ((tp + fn) * fp)"),
        ).alias("lr_plus_milli"),
        F.when(
            (F.expr("tp + fn") > 0) & (F.col("tn") > 0),
            F.expr("fn * (tn + fp) * 1000 div ((tp + fn) * tn)"),
        ).alias("lr_minus_milli"),
        F.when(
            F.expr("fp * fn") > 0,
            F.expr("tp * tn * 1000 div (fp * fn)"),
        ).alias("dor_milli"),
    )


def turning_points(
    df: DataFrame, t_col: str = "t", x_col: str = "x"
) -> DataFrame:
    """(t order key, x int) -> ONE row (n, n_turning, n_adjacent_ties,
    z2_milli, sig05, status)."""
    s = df.select(
        F.col(t_col).cast("long").alias("t"),
        F.col(x_col).cast("long").alias("x"),
    )
    w = Window.orderBy("t")
    marked = s.select(
        F.lag("x").over(w).alias("prev"),
        F.col("x"),
        F.lead("x").over(w).alias("nxt"),
    )
    agg = marked.groupBy().agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(
            (
                F.col("prev").isNotNull()
                & F.col("nxt").isNotNull()
                & (
                    (F.col("x") - F.col("prev"))
                    * (F.col("x") - F.col("nxt"))
                    > 0
                )
            ).cast("long")
        ).alias("n_turning"),
        F.sum(
            (
                F.col("prev").isNotNull()
                & (F.col("x") == F.col("prev"))
            ).cast("long")
        ).alias("n_adjacent_ties"),
    )
    ok = (F.col("n") >= 3) & (F.col("n_adjacent_ties") == 0)
    z2 = F.expr(
        "10000 * (3 * n_turning - 2 * (n - 2))"
        " * (3 * n_turning - 2 * (n - 2)) div (16 * n - 29)"
    )
    return agg.select(
        "n",
        "n_turning",
        "n_adjacent_ties",
        F.when(ok, z2).alias("z2_milli"),
        F.when(ok, z2 > 3841).alias("sig05"),
        F.when(F.col("n") < 3, F.lit("too_small"))
        .when(F.col("n_adjacent_ties") > 0, F.lit("ties"))
        .otherwise(F.lit("ok"))
        .alias("status"),
    )
