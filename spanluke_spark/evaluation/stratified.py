"""Stratified two-group inference: the van Elteren test (van Elteren
1960) and the Mantel-Haenszel common odds ratio (Mantel & Haenszel
1959) — compare treatment vs control ACROSS strata without letting
the strata mix (the Simpson's-paradox-proof way to pool; q413 is
the tripwire, these are the correct pooled answers). van Elteren is
the continuous-outcome analogue of the CMH test (q323): a
locally-best weighted combination of per-stratum Wilcoxon rank
sums; MH-OR is the classic 2x2 pooled effect the crude OR (q395)
gets wrong under confounding.

van Elteren exactness (the q388 linear-rank engine PER STRATUM +
the q334 once-quantized cell discipline): per stratum with double
ranks DR (ties exact), group-0 size m, group-1 size n, N = m + n,
W2 = sum of group-0 double ranks, scores d = DR:

  dev_cell_milli = sign-split 1000 * (W2 - m*(N+1)) div (N+1)
  var_cell_micro = 10^6 * m * n * (N*sum d^2 - (sum d)^2)
                   div (N^2 * (N-1) * (N+1)^2)

(the 1/(N_s+1) locally-best weights are inside both cells), then

  z2_milli = 1000 * (sum dev)^2 div (sum var)    [DECIMAL/HUGEINT]

with the chi-square(1) verdict z2_milli > 3841 (the q388 constant).
Ties are handled exactly by the finite-population variance on
double-rank scores. Degenerate strata (m == 0 or n == 0 or constant
values) contribute NOTHING and are counted (n_degenerate — the
q347 skip-and-count convention); all-degenerate surfaces NULL.

MH common OR, once-quantized per-stratum cells:

  num_milli_s = 1000 * a_s * d_s div N_s
  den_milli_s = 1000 * b_s * c_s div N_s
  or_mh_ppm   = 10^6 * sum(num) div sum(den)   NULL when den == 0

plus the CRUDE pooled OR on the summed table for the confounding
contrast (kidney-stone lane pytest-pinned: MH stays on the
stratum-consistent side while the crude OR flips).

Distributed shape: one per-(stratum, value) class aggregate + one
bounded per-stratum rank window for van Elteren; one per-stratum
2x2 aggregate for MH — all map-side combinable, strata scale out.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["van_elteren", "mh_common_or"]


def van_elteren(
    df: DataFrame,
    stratum_col: str = "stratum",
    group_col: str = "grp",
    x_col: str = "x",
) -> DataFrame:
    """(stratum, grp 0/1, x int) -> ONE row (k_strata, n_degenerate,
    dev_milli, var_micro, z2_milli, sig05)."""
    s = df.select(
        F.col(stratum_col).alias("st"),
        (F.col(group_col) == 0).alias("is_a"),
        F.col(x_col).cast("long").alias("x"),
    )
    cls = s.groupBy("st", "x").agg(
        F.count(F.lit(1)).alias("c")
    )
    wv = (
        Window.partitionBy("st")
        .orderBy("x")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    ranked = cls.select(
        "st",
        "x",
        (
            2 * (F.sum("c").over(wv) - F.col("c")) + F.col("c") + 1
        ).alias("dr"),
    )
    rows = s.join(ranked, ["st", "x"])
    per = rows.groupBy("st").agg(
        F.sum(F.col("is_a").cast("long")).alias("m"),
        F.sum((~F.col("is_a")).cast("long")).alias("n"),
        F.count(F.lit(1)).cast("long").alias("nn"),
        F.sum(F.when(F.col("is_a"), F.col("dr")).otherwise(0)).alias(
            "w2"
        ),
        F.sum("dr").alias("dsum"),
        F.sum(F.col("dr") * F.col("dr")).alias("d2sum"),
    )
    svar = F.expr("nn * d2sum - dsum * dsum")
    usable = (F.col("m") > 0) & (F.col("n") > 0) & (svar > 0)
    devnum = F.expr("w2 - m * (nn + 1)")
    devmag = F.expr("abs(w2 - m * (nn + 1)) * 1000 div (nn + 1)")
    cells = per.select(
        usable.alias("usable"),
        F.when(
            usable,
            F.when(devnum < 0, -devmag).otherwise(devmag),
        ).alias("dev_cell"),
        F.when(
            usable,
            F.expr(
                "cast(1000000 * m * n as decimal(38,0))"
                " * (nn * d2sum - dsum * dsum)"
                " div (cast(nn as decimal(38,0)) * nn * (nn - 1)"
                "      * (nn + 1) * (nn + 1))"
            ).cast("long"),
        ).alias("var_cell"),
    )
    agg = cells.groupBy().agg(
        F.count(F.lit(1)).cast("long").alias("k_strata"),
        F.sum((~F.col("usable")).cast("long")).alias("n_degenerate"),
        F.sum("dev_cell").alias("dev_milli"),
        F.sum("var_cell").alias("var_micro"),
    )
    z2 = F.expr(
        "cast(1000 * cast(dev_milli as decimal(38,0)) * dev_milli"
        " div var_micro as long)"
    )
    return agg.select(
        "k_strata",
        "n_degenerate",
        "dev_milli",
        "var_micro",
        F.when(F.col("var_micro") > 0, z2).alias("z2_milli"),
        F.when(F.col("var_micro") > 0, z2 > 3841).alias("sig05"),
    )


def mh_common_or(
    df: DataFrame,
    stratum_col: str = "stratum",
    exposed_col: str = "exposed",
    positive_col: str = "positive",
) -> DataFrame:
    """(stratum, exposed bool, positive bool) -> ONE row (k_strata,
    mh_num_milli, mh_den_milli, or_mh_ppm, crude_or_ppm)."""
    e = F.col(exposed_col).cast("boolean")
    p = F.col(positive_col).cast("boolean")
    per = df.groupBy(F.col(stratum_col).alias("st")).agg(
        F.sum((e & p).cast("long")).alias("a"),
        F.sum((e & ~p).cast("long")).alias("b"),
        F.sum((~e & p).cast("long")).alias("c"),
        F.sum((~e & ~p).cast("long")).alias("d"),
    )
    cells = per.select(
        F.expr("a + b + c + d").alias("nt"),
        "a",
        "b",
        "c",
        "d",
    ).select(
        F.when(
            F.col("nt") > 0, F.expr("1000 * a * d div nt")
        ).otherwise(0).alias("numc"),
        F.when(
            F.col("nt") > 0, F.expr("1000 * b * c div nt")
        ).otherwise(0).alias("denc"),
        "a",
        "b",
        "c",
        "d",
    )
    agg = cells.groupBy().agg(
        F.count(F.lit(1)).cast("long").alias("k_strata"),
        F.sum("numc").alias("mh_num_milli"),
        F.sum("denc").alias("mh_den_milli"),
        F.sum("a").alias("ta"),
        F.sum("b").alias("tb"),
        F.sum("c").alias("tc"),
        F.sum("d").alias("td"),
    )
    return agg.select(
        "k_strata",
        "mh_num_milli",
        "mh_den_milli",
        F.when(
            F.col("mh_den_milli") > 0,
            F.expr("mh_num_milli * 1000000 div mh_den_milli"),
        ).alias("or_mh_ppm"),
        F.when(
            F.expr("tb * tc") > 0,
            F.expr("ta * td * 1000000 div (tb * tc)"),
        ).alias("crude_or_ppm"),
    )
