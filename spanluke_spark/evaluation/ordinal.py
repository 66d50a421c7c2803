"""Ordinal-trend and ordinal-effect-size machinery: the
Jonckheere-Terpstra test (Terpstra 1952; Jonckheere 1954) and Cliff's
delta / Vargha-Delaney A (Cliff 1993; Vargha & Delaney 2000).

Web-scale use: crawl depth, recrawl round, or mirror tier is an
ORDERED factor — "does page quality degrade monotonically with crawl
depth?" is a Jonckheere question (Kruskal-Wallis, q337, ignores the
ordering and wastes its power), and "by HOW much does the treated
cohort dominate?" is exactly Cliff's delta — the robust, scale-free
effect size that the Mann-Whitney verdict (q246) does not report.

Jonckheere exactness: the statistic is carried as the DOUBLED count
J2 = sum over ordered group pairs u<v of (2*#{x<y} + #{x==y}) — exact
integers with ties at half credit. Instead of the definitional pair
join, J2 comes from a dense (value grid x group) cumulative window:
per (grp, value) cell, items of LATER groups at the same value see
2*cumless + cnt of this cell — one groupBy, one per-group window over
the bounded distinct-value grid, one aggregate; no O(n^2) anywhere.
With half = (n^2 - sum nj^2)/2 (an integer — the double sum is even),
h = J2 - half makes E[J] exact: h = 2*(J - E[J]). The tie-corrected
variance (Hollander & Wolfe eq. 6.19)

  Var = V1/72 + V2*V3/(36 n(n-1)(n-2)) + V4*V5/(8 n(n-1))

is cleared to ONE integer division over the common denominator
72 n(n-1)(n-2):

  z2_milli = 18000 * n(n-1)(n-2) * h^2
             div (V1*n(n-1)(n-2) + 2*V2*V3 + 9*(n-2)*V4*V5)

(the /4 of h = 2(J-E) folds the 72000/4 and the half-integer carry
into the 18000). With no ties V1 collapses to the classic
n^2(2n+3) - sum nj^2(2nj+3) (identity: n(n-1)(2n+5) = n^2(2n+3) - 5n
and sum nj = n — pinned by pytest). All-tied input (D <= 0) surfaces
NULL. Long-bound contract: 18000*n^3*h^2 with h <= (n^2-sum nj^2)/2
requires n <= ~170; the callers use bounded evaluation slices
(the q330/q350 contract).

Cliff's delta exactness: the q296 Mann-Whitney cumulative-rank
identity on integer DOUBLE-ranks — U2 = 2*gt + eq = DR_A - nA(nA+1)
where DR_A is the treatment group's double-rank sum, so

  delta = (gt - lt)/(nA*nB)   -> sign-split trunc ppm of U2 - nA*nB
  A_vd  = (gt + eq/2)/(nA*nB) -> trunc ppm of U2 / (2*nA*nB)

with the exact identity A = (delta+1)/2 surviving quantization to
within 1 ppm (gated). Magnitude bands follow Romano et al. 2006:
|delta| < 0.147 negligible, < 0.33 small, < 0.474 medium, else large.
One global rank window + one aggregate; no pair join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["jonckheere_terpstra", "cliffs_delta"]


def jonckheere_terpstra(
    samples: DataFrame,
    grp_col: str = "grp",
    value_col: str = "value",
    crit_milli: int = 3841,
) -> DataFrame:
    """(grp ordered ascending, value) -> ONE row (n, k, j2, h,
    z2_milli, direction, sig)."""
    s = samples.select(
        F.col(grp_col).cast("long").alias("grp"),
        F.col(value_col).cast("long").alias("value"),
    )
    counts = s.groupBy("value", "grp").agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    )
    vals = s.select("value").distinct()
    grps = s.select("grp").distinct()
    grid = (
        vals.crossJoin(F.broadcast(grps))
        .join(counts, ["value", "grp"], "left")
        .select(
            "value",
            "grp",
            F.coalesce(F.col("cnt"), F.lit(0).cast("long")).alias("cnt"),
        )
    )
    wl = (
        Window.partitionBy("grp")
        .orderBy("value")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    g = grid.select(
        "value",
        "grp",
        "cnt",
        F.coalesce(F.sum("cnt").over(wl), F.lit(0).cast("long")).alias(
            "cumless"
        ),
    )
    later = g.select(
        F.col("value").alias("value_v"),
        F.col("grp").alias("grp_v"),
        F.col("cnt").alias("cnt_v"),
    ).where(F.col("cnt_v") > 0)
    j2 = (
        g.join(
            later,
            (F.col("value") == F.col("value_v"))
            & (F.col("grp") < F.col("grp_v")),
        )
        .groupBy()
        .agg(
            F.coalesce(
                F.sum(
                    F.col("cnt_v")
                    * (2 * F.col("cumless") + F.col("cnt"))
                ),
                F.lit(0).cast("long"),
            ).alias("j2")
        )
    )
    per = s.groupBy("grp").agg(F.count(F.lit(1)).cast("long").alias("nj"))
    gstats = per.groupBy().agg(
        F.sum("nj").alias("n"),
        F.count(F.lit(1)).cast("long").alias("k"),
        F.sum(F.col("nj") * F.col("nj")).alias("sum_nj2"),
        F.sum(
            F.col("nj") * (F.col("nj") - 1) * (2 * F.col("nj") + 5)
        ).alias("g25"),
        F.sum(
            F.col("nj") * (F.col("nj") - 1) * (F.col("nj") - 2)
        ).alias("v2"),
        F.sum(F.col("nj") * (F.col("nj") - 1)).alias("v4"),
    )
    ties = (
        s.groupBy("value")
        .agg(F.count(F.lit(1)).cast("long").alias("tc"))
        .groupBy()
        .agg(
            F.sum(
                F.col("tc") * (F.col("tc") - 1) * (2 * F.col("tc") + 5)
            ).alias("t25"),
            F.sum(
                F.col("tc") * (F.col("tc") - 1) * (F.col("tc") - 2)
            ).alias("v3"),
            F.sum(F.col("tc") * (F.col("tc") - 1)).alias("v5"),
        )
    )
    x = (
        j2.crossJoin(F.broadcast(gstats))
        .crossJoin(F.broadcast(ties))
        .select(
            "n",
            "k",
            "j2",
            F.expr("j2 - (n * n - sum_nj2) div 2").alias("h"),
            (
                F.col("n") * (F.col("n") - 1) * (2 * F.col("n") + 5)
                - F.col("g25")
                - F.col("t25")
            ).alias("v1"),
            "v2",
            "v3",
            "v4",
            "v5",
        )
        .select(
            "n",
            "k",
            "j2",
            "h",
            F.expr(
                "v1 * n * (n - 1) * (n - 2) + 2 * v2 * v3"
                " + 9 * (n - 2) * v4 * v5"
            ).alias("d"),
        )
    )
    z2 = F.when(
        F.col("d") > 0,
        F.expr("18000 * n * (n - 1) * (n - 2) * h * h div d"),
    )
    x2 = x.select("n", "k", "j2", "h", z2.alias("z2_milli"))
    return x2.select(
        "*",
        F.when(F.col("z2_milli").isNull(), F.lit(None).cast("string"))
        .when(F.col("h") > 0, F.lit("increasing"))
        .when(F.col("h") < 0, F.lit("decreasing"))
        .otherwise(F.lit("exact_expectation"))
        .alias("direction"),
        (F.col("z2_milli") >= F.lit(crit_milli)).alias("sig"),
    )


def cliffs_delta(
    samples: DataFrame,
    grp_col: str = "grp",
    value_col: str = "value",
    treatment: int = 1,
) -> DataFrame:
    """(grp in {0 control, 1 treatment}, value) -> ONE row (n_a, n_b,
    u2, delta_ppm, a_ppm, magnitude): 2*gt + eq from the pooled
    double-rank sum of the treatment group — no pair join."""
    s = samples.select(
        (F.col(grp_col) == treatment).alias("is_a"),
        F.col(value_col).cast("long").alias("value"),
    )
    w = Window.orderBy("value")
    c = Window.partitionBy("value")
    ranked = s.select(
        "is_a",
        (2 * F.rank().over(w) + F.count(F.lit(1)).over(c) - 1)
        .cast("long")
        .alias("dr"),
    )
    agg = ranked.groupBy().agg(
        F.sum(F.col("is_a").cast("long")).alias("n_a"),
        F.sum((~F.col("is_a")).cast("long")).alias("n_b"),
        F.sum(F.when(F.col("is_a"), F.col("dr")).otherwise(0)).alias(
            "dra"
        ),
    )
    x = agg.select(
        "n_a",
        "n_b",
        F.expr("dra - n_a * (n_a + 1)").alias("u2"),
    )
    num = F.col("u2") - F.col("n_a") * F.col("n_b")
    mag = F.expr("abs(u2 - n_a * n_b) * 1000000 div (n_a * n_b)")
    delta = F.when(num < 0, -mag).otherwise(mag)
    x2 = x.select(
        "n_a",
        "n_b",
        "u2",
        delta.alias("delta_ppm"),
        F.expr("u2 * 1000000 div (2 * n_a * n_b)").alias("a_ppm"),
    )
    ad = F.abs(F.col("delta_ppm"))
    return x2.select(
        "*",
        F.when(ad < 147_000, F.lit("negligible"))
        .when(ad < 330_000, F.lit("small"))
        .when(ad < 474_000, F.lit("medium"))
        .otherwise(F.lit("large"))
        .alias("magnitude"),
    )
