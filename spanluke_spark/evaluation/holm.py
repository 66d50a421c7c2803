"""Holm-Bonferroni step-down FWER control (Holm 1979) — the
familywise companion to the BH step-up (evaluation/fdr.py, q316):
when ANY false rejection is unacceptable (killing a crawl source,
flagging a host for legal review), control P(any false positive)
rather than the false-discovery RATE. Uniformly more powerful than
plain Bonferroni, never more liberal than BH (every Holm rejection is
a BH rejection — tested as a cross-lane invariant).

Shares the exact dyadic binomial tails of the BH lane
(``binom_tail_pvalues``): p_i = P(X >= x_i | n_i, 1/2) as the exact
rational (p_num, 2^n), ranked ascending by the common-denominator
integer key. The step-down rule: walking ranks i = 1..m upward,
reject while

  p_i  <=  alpha / (m - i + 1)

decided by the exact cross-multiplication
p_num·alpha_den·(m - i + 1) <= alpha_num·p_den; the FIRST failure
stops everything after it (prefix-AND = a running min over the pass
indicator). Adjusted p-values on the stated quantize-once contract:

  padj_ppm_i = running max over j <= i of
               min(10^6, (m - j + 1) · p_ppm_j)

with p_ppm the trunc-ppm of the exact rational. The hypothesis table
is group-sized; corpus rows reduce map-side in the shared groupBy.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from spanluke_spark.evaluation.fdr import binom_tail_pvalues

__all__ = ["holm_stepdown"]


def holm_stepdown(
    trials: DataFrame,
    alpha_num: int = 1,
    alpha_den: int = 10,
    group_col: str = "grp",
    fail_col: str = "fail",
) -> DataFrame:
    """(grp, fail: boolean) rows -> per grp: (grp, n, x, p_num, p_den,
    rank, reject, padj_ppm). Per-group trial counts <= 40."""
    p = binom_tail_pvalues(trials, group_col, fail_col)

    w = Window.orderBy("p_s", "grp")
    m = Window.partitionBy()
    ranked = p.select(
        "*",
        F.row_number().over(w).alias("rank"),
        F.count(F.lit(1)).over(m).alias("m"),
    )
    passes = (
        F.col("p_num") * F.lit(alpha_den) * (F.col("m") - F.col("rank") + 1)
        <= F.lit(alpha_num) * F.col("p_den")
    ).cast("int")
    prefix = Window.orderBy("p_s", "grp").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return ranked.select(
        "grp",
        F.col("n").cast("long").alias("n"),
        F.col("x").cast("long").alias("x"),
        "p_num",
        "p_den",
        F.col("rank").cast("long").alias("rank"),
        (F.min(passes).over(prefix) == 1).alias("reject"),
        F.max(
            F.least(
                F.lit(1_000_000).cast("long"),
                (F.col("m") - F.col("rank") + 1)
                * F.expr("p_num * 1000000 div p_den"),
            )
        )
        .over(prefix)
        .alias("padj_ppm"),
    )
