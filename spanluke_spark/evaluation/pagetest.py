"""Page's trend test (Page 1963) — the ORDERED counterpart of the
Friedman test (q340), exactly as Jonckheere (q352) is to
Kruskal-Wallis (q337): b blocks (documents, hosts, annotators) each
rank the same k treatments (model versions, recrawl rounds), and the
alternative is the a-priori ORDER "later versions score higher", not
just "some version differs". L = sum_j s_j * R_j weights each
treatment's rank sum by its hypothesized position.

Exactness: within-block ranks ride the integer double-rank machinery
(dr = 2*rank + cnt - 1), so L2 = sum s * dr = 2L is exact; blocks
that are incomplete (!= k rows) or contain within-block TIES are
DROPPED AND COUNTED (the q340 incomplete-block contract — Page's
null distribution assumes tie-free complete blocks). With b kept
blocks the df=1 chi-squared approximation

  chi2_L = (12L - 3bk(k+1)^2)^2 / (b k^2 (k+1)(k^2-1))

clears to ONE integer division via 12L - 3bk(k+1)^2 = 3*dev with
dev = 2*L2 - bk(k+1)^2:

  z2_milli = 9000 * dev^2 div (b k^2 (k+1)(k^2-1))

b = 0 surfaces NULL. Perfect within-block orderings give the exact
closed form dev = b*k(k+1)(2k+1)/3 - bk(k+1)^2 ... pinned numerically
by pytest (all-ordered blocks at k=5, b=20 give exactly z2 = 80000).
Direction is the exact sign of dev. Long bound: dev <= bk^2(k+1)
needs b*k^3 <= ~10^7 — bounded evaluation slices (q330 contract).

Distributed shape: one per-block validity aggregate, one within-block
rank window (partitioned — no global window), one final aggregate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["page_trend"]


def page_trend(
    samples: DataFrame,
    k: int,
    block_col: str = "block",
    score_col: str = "score",
    value_col: str = "value",
    crit_milli: int = 3841,
) -> DataFrame:
    """(block, score 1..k hypothesized order, value) -> ONE row
    (b_blocks, n_dropped, l2, dev, z2_milli, direction, sig)."""
    s = samples.select(
        F.col(block_col).alias("block"),
        F.col(score_col).cast("long").alias("s"),
        F.col(value_col).cast("long").alias("value"),
    )
    valid = s.groupBy("block").agg(
        (
            (F.count(F.lit(1)) == k)
            & (F.count_distinct(F.col("value")) == k)
        ).alias("ok")
    )
    w = Window.partitionBy("block").orderBy("value")
    c = Window.partitionBy("block", "value")
    ranked = s.join(valid, "block").select(
        "block",
        "ok",
        "s",
        (2 * F.rank().over(w) + F.count(F.lit(1)).over(c) - 1)
        .cast("long")
        .alias("dr"),
    )
    agg = ranked.groupBy().agg(
        F.count_distinct(
            F.when(F.col("ok"), F.col("block"))
        ).cast("long").alias("b_blocks"),
        F.count_distinct(
            F.when(~F.col("ok"), F.col("block"))
        ).cast("long").alias("n_dropped"),
        F.coalesce(
            F.sum(F.when(F.col("ok"), F.col("s") * F.col("dr"))),
            F.lit(0).cast("long"),
        ).alias("l2"),
    )
    kk = F.lit(k).cast("long")
    dev = 2 * F.col("l2") - F.col("b_blocks") * kk * (kk + 1) * (kk + 1)
    den = (
        F.col("b_blocks") * kk * kk * (kk + 1) * (kk * kk - 1)
    )
    x = agg.select(
        "b_blocks", "n_dropped", "l2", dev.alias("dev"), den.alias("d")
    )
    z2 = F.when(
        F.col("d") > 0,
        F.expr("9000 * dev * dev div d"),
    )
    x2 = x.select(
        "b_blocks", "n_dropped", "l2", "dev", z2.alias("z2_milli")
    )
    return x2.select(
        "*",
        F.when(F.col("z2_milli").isNull(), F.lit(None).cast("string"))
        .when(F.col("dev") > 0, F.lit("agrees_with_order"))
        .when(F.col("dev") < 0, F.lit("against_order"))
        .otherwise(F.lit("exact_expectation"))
        .alias("direction"),
        (F.col("z2_milli") >= F.lit(crit_milli)).alias("sig"),
    )
