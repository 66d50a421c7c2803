"""Wilcoxon signed-rank test + Hodges-Lehmann estimator (Wilcoxon
1945; Hodges & Lehmann 1963) — the PAIRED-differences counterparts of
the Mann-Kendall/Theil-Sen pair (q295/q348): did a recrawl/model swap
shift per-document quality, and by how much, using the same documents
before and after? The t-test's assumptions are wrong for heavy-tailed
quality scores; the signed-rank test and the pseudo-median are the
robust standard.

Signed-rank exactness (the q330 double-rank discipline): zero
differences are DROPPED AND COUNTED (the standard convention);
|d| double-ranks make the positive rank sum W2 = 2*W+ exact, and the
tie-corrected normal statistic collapses to ONE integer division —

  z^2 = 3 * (2*W2 - n(n+1))^2
        / (2*n(n+1)(2n+1) - sum(t^3 - t))

(the /4 of dev^2 and the /12 of Var cancel into the 3). z2_milli
gates at the caller's 3841 (1.96^2). All-tied-to-zero (n = 0) or a
zero variance surfaces NULL. Direction is the exact sign of
2*W2 - n(n+1).

Hodges-Lehmann exactness — NO quantization loss at all: each Walsh
average (d_i + d_j)/2 over i <= j is carried as the exact integer
(d_i + d_j) * 500 in milli units; the median is pinned lower by a
(walsh_milli, i, j) row_number. The definitional O(n^2) pair join is
gated to ``max_n`` (the kNN/LOF slice contract).

Distributed shape: signed-rank is one global rank window over |d|
plus one aggregate; HL is one bounded self-join plus one window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["wilcoxon_signed_rank", "hodges_lehmann"]


def wilcoxon_signed_rank(
    pairs: DataFrame,
    x_col: str = "x",
    y_col: str = "y",
    crit_milli: int = 3841,
) -> DataFrame:
    """(x, y) paired -> ONE row (n_nonzero, n_zero, w2_pos, tie_cube,
    z2_milli, direction, sig)."""
    d = pairs.select(
        (F.col(y_col).cast("long") - F.col(x_col).cast("long")).alias("d")
    )
    zero = d.groupBy().agg(
        F.sum((F.col("d") == 0).cast("int")).cast("long").alias("n_zero")
    )
    nz = d.where(F.col("d") != 0).select(
        "d", F.abs(F.col("d")).alias("ad")
    )
    w = Window.orderBy("ad")
    c = Window.partitionBy("ad")
    ranked = nz.select(
        "d",
        (2 * F.rank().over(w) + F.count(F.lit(1)).over(c) - 1)
        .cast("long")
        .alias("dr"),
    )
    ties = (
        nz.groupBy("ad")
        .agg(F.count(F.lit(1)).cast("long").alias("tc"))
        .groupBy()
        .agg(
            F.sum(F.col("tc") * F.col("tc") * F.col("tc") - F.col("tc"))
            .alias("tie_cube")
        )
    )
    agg = ranked.groupBy().agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.when(F.col("d") > 0, F.col("dr")).otherwise(0)).alias(
            "w2_pos"
        ),
    )
    x = (
        agg.crossJoin(F.broadcast(ties))
        .crossJoin(F.broadcast(zero))
        .select(
            F.col("n").alias("n_nonzero"),
            "n_zero",
            "w2_pos",
            F.coalesce(F.col("tie_cube"), F.lit(0).cast("long")).alias(
                "tie_cube"
            ),
        )
    )
    dev = 2 * F.col("w2_pos") - F.col("n_nonzero") * (F.col("n_nonzero") + 1)
    den = F.expr(
        "2 * n_nonzero * (n_nonzero + 1) * (2 * n_nonzero + 1) - tie_cube"
    )
    z2 = F.when(
        den > 0,
        F.expr(
            "3 * (2 * w2_pos - n_nonzero * (n_nonzero + 1))"
            " * (2 * w2_pos - n_nonzero * (n_nonzero + 1)) * 1000"
            " div (2 * n_nonzero * (n_nonzero + 1)"
            "      * (2 * n_nonzero + 1) - tie_cube)"
        ),
    )
    x2 = x.select("*", z2.alias("z2_milli"))
    return x2.select(
        "*",
        F.when(F.col("z2_milli").isNull(), F.lit(None).cast("string"))
        .when(dev > 0, F.lit("shift_up"))
        .when(dev < 0, F.lit("shift_down"))
        .otherwise(F.lit("exact_expectation"))
        .alias("direction"),
        (F.col("z2_milli") >= F.lit(crit_milli)).alias("sig"),
    )


def hodges_lehmann(
    pairs: DataFrame,
    x_col: str = "x",
    y_col: str = "y",
    max_n: int = 300,
) -> DataFrame:
    """(x, y) paired -> ONE row (n, n_walsh, hl_milli, lo_milli,
    hi_milli): the pseudo-median of Walsh averages, exact in milli
    units (no trunc — (d_i + d_j) * 500 is already an integer)."""
    d = pairs.select(
        (F.col(y_col).cast("long") - F.col(x_col).cast("long")).alias("d")
    ).limit(max_n)
    w0 = Window.orderBy(F.lit(1))
    idx = d.select("d", F.row_number().over(w0).alias("i"))
    b = idx.select(F.col("d").alias("dj"), F.col("i").alias("j"))
    walsh = idx.join(b, F.col("i") <= F.col("j")).select(
        "i",
        "j",
        ((F.col("d") + F.col("dj")) * 500).alias("walsh_milli"),
    )
    w = Window.orderBy("walsh_milli", "i", "j")
    ranked = walsh.select(
        "walsh_milli", F.row_number().over(w).alias("rn")
    )
    stats = ranked.groupBy().agg(
        F.count(F.lit(1)).cast("long").alias("n_walsh"),
        F.min("walsh_milli").alias("lo_milli"),
        F.max("walsh_milli").alias("hi_milli"),
    )
    med = (
        ranked.crossJoin(F.broadcast(stats))
        .where(F.col("rn") == F.expr("(n_walsh + 1) div 2"))
        .select(F.col("walsh_milli").alias("hl_milli"))
    )
    cnt = d.groupBy().agg(F.count(F.lit(1)).cast("long").alias("n"))
    return (
        cnt.crossJoin(F.broadcast(stats))
        .crossJoin(F.broadcast(med))
        .select("n", "n_walsh", "hl_milli", "lo_milli", "hi_milli")
    )
