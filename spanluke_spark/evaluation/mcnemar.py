"""McNemar's exact paired test (McNemar 1947; exact binomial form) —
did classifier B actually improve on classifier A, judged on the SAME
items? The honest A/B gate for swapping a quality filter / langid /
PII model in the curation path: marginal accuracies can differ by
chance, only the DISCORDANT pairs carry evidence.

Per group: n01 (A wrong, B right), n10 (A right, B wrong),
nd = n01 + n10 discordant pairs. Under H0 the discordants split
Binomial(nd, 1/2); the exact two-sided p-value is pinned to

  p = min(1, 2 * P(X <= min(n01, n10)))         (p = 1 when nd = 0)

as the exact dyadic rational (p_num, p_den = 2^nd): the Pascal row
for nd is built by the same nd-step HOF fold as the BH lane
(evaluation/fdr.py), head-summed to slot k+1, doubled and clamped by
least() — the nd = 0 case falls out automatically (2*C(0,0) = 2
clamps to p_den = 1). Significance is decided by the exact
cross-multiplication p_num * alpha_den <= alpha_num * p_den; p_ppm is
the once-quantized trunc report, never the decision.

Requires nd <= 40 per group (exact longs: C(40,20) < 2^38). The
hypothesis table is group-sized, not corpus-sized — pair outcomes
reduce map-side in one groupBy.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["mcnemar_exact"]


def mcnemar_exact(
    pairs: DataFrame,
    alpha_num: int = 1,
    alpha_den: int = 20,
    group_col: str = "grp",
    a_col: str = "a_ok",
    b_col: str = "b_ok",
) -> DataFrame:
    """(grp, a_ok: boolean, b_ok: boolean) rows -> per grp:
    (grp, n00, n01, n10, n11, nd, k, p_num, p_den, p_ppm, signif)."""
    a, b = F.col(a_col), F.col(b_col)
    agg = pairs.groupBy(F.col(group_col).alias("grp")).agg(
        F.sum((~a & ~b).cast("int")).cast("long").alias("n00"),
        F.sum((~a & b).cast("int")).cast("long").alias("n01"),
        F.sum((a & ~b).cast("int")).cast("long").alias("n10"),
        F.sum((a & b).cast("int")).cast("long").alias("n11"),
    )
    nd = (F.col("n01") + F.col("n10")).alias("nd")
    k = F.least("n01", "n10").alias("k")
    t = agg.select("grp", "n00", "n01", "n10", "n11", nd, k)

    # Pascal row for nd (guarded: sequence(1, 0) would run DESCENDING)
    fold = F.aggregate(
        F.sequence(F.lit(1), F.col("nd")),
        F.array(F.lit(1).cast("long")),
        lambda row, _: F.concat(
            F.array(F.lit(1).cast("long")),
            F.zip_with(
                F.slice(row, 1, F.size(row) - 1),
                F.slice(row, 2, F.size(row) - 1),
                lambda x, y: x + y,
            ),
            F.array(F.lit(1).cast("long")),
        ),
    )
    pascal = F.when(F.col("nd") >= 1, fold).otherwise(
        F.array(F.lit(1).cast("long"))
    )
    head = F.aggregate(
        F.slice(pascal, 1, (F.col("k") + 1).cast("int")),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )
    out = t.select(
        "grp", "n00", "n01", "n10", "n11", "nd", "k",
        F.least(
            F.expr("shiftleft(cast(1 as bigint), cast(nd as int))"),
            (head * 2).cast("long"),
        ).alias("p_num"),
        F.expr("shiftleft(cast(1 as bigint), cast(nd as int))").alias(
            "p_den"
        ),
    )
    return out.select(
        "*",
        F.expr("p_num * 1000000 div p_den").alias("p_ppm"),
        (
            F.col("p_num") * F.lit(alpha_den)
            <= F.lit(alpha_num) * F.col("p_den")
        ).alias("signif"),
    )
