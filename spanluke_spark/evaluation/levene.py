"""Brown-Forsythe test for variance homogeneity (Levene 1960; Brown &
Forsythe 1974 median variant) — are k crawl sources equally NOISY in
their quality scores? The location tests (Kruskal-Wallis q337,
Jonckheere q352) compare centers; pipeline regressions that widen the
SPREAD (a flaky extractor, a mixed-language shard) need a scale test,
and the median-based Brown-Forsythe variant is the robust standard
(the mean-based original is fragile under the same heavy tails that
motivate it).

Exactness (EQUAL group sizes m, pinned by contract): within-group
medians are carried as the exact integer DOUBLED median
med2_j = x_(ceil(m/2)) + x_(floor(m/2)+1) (sum of the two middle
order statistics — 2*median for odd m too), so every deviation
z2_ij = |2*x_ij - med2_j| is an exact integer and the doubling cancels
between the (2z)^2 numerator and denominator. With Zj the group sums,
Z the total, SS = sum z2^2 and N = k*m, the F statistic clears to ONE
integer division:

  f_milli = 1000 (N-k) * sum_j (N*Zj - m*Z)^2
            div ((k-1) * N^2 * (m*SS - sum_j Zj^2))

Equal sizes make every between-group deviation share the denominator
m*N^2 — the UNEQUAL-size statistic is a sum of unlike rationals with
no single-division clearing, so min(nj) != max(nj) surfaces NULL
(explicit contract, not silent wrongness). Zero within-group spread
(den = 0) also surfaces NULL. Location-shift invariance (adding a
constant to one whole group changes nothing — the property that makes
Levene a SCALE test) is pytest-gated. The F critical value is
CALLER-SUPPLIED milli (df = (k-1, N-k) is data-dependent — the
q327/q337 constant discipline).

Distributed shape: one per-group row_number window over the bounded
evaluation slice for the two middle order statistics, one broadcast
med2 join back, two aggregates. No pair joins, nothing driver-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["brown_forsythe"]


def brown_forsythe(
    samples: DataFrame,
    crit_milli: int,
    grp_col: str = "grp",
    value_col: str = "value",
) -> DataFrame:
    """(grp, value) with EQUAL group sizes -> ONE row (n, k, m, num,
    den, f_milli, sig); unequal sizes or zero spread -> NULL
    f_milli/sig."""
    s = samples.select(
        F.col(grp_col).alias("grp"),
        F.col(value_col).cast("long").alias("value"),
    )
    w = Window.partitionBy("grp").orderBy("value")
    ranked = s.select(
        "grp", "value", F.row_number().over(w).alias("rn")
    )
    sizes = s.groupBy("grp").agg(
        F.count(F.lit(1)).cast("long").alias("m")
    )
    med2 = (
        ranked.join(F.broadcast(sizes), "grp")
        .where(
            (F.col("rn") == F.expr("m div 2 + 1"))
            | (F.col("rn") == F.expr("(m + 1) div 2"))
        )
        .groupBy("grp")
        .agg(
            # odd m: the single middle row counted twice; even m: the
            # two middle rows summed once each.
            F.when(
                F.max("m") % 2 == 1, 2 * F.max("value")
            )
            .otherwise(F.sum("value"))
            .alias("med2")
        )
    )
    z = (
        s.join(F.broadcast(med2), "grp")
        .select(
            "grp",
            F.abs(2 * F.col("value") - F.col("med2")).alias("z2"),
        )
    )
    per = z.groupBy("grp").agg(
        F.count(F.lit(1)).cast("long").alias("mj"),
        F.sum("z2").alias("zj"),
        F.sum(F.col("z2") * F.col("z2")).alias("ssj"),
    )
    agg = per.groupBy().agg(
        F.sum("mj").alias("n"),
        F.count(F.lit(1)).cast("long").alias("k"),
        F.min("mj").alias("m_lo"),
        F.max("mj").alias("m_hi"),
        F.sum("zj").alias("z_tot"),
        F.sum("ssj").alias("ss"),
        F.sum(F.col("zj") * F.col("zj")).alias("sum_zj2"),
    )
    between = per.crossJoin(F.broadcast(agg)).groupBy().agg(
        F.sum(
            (F.col("n") * F.col("zj") - F.col("m_lo") * F.col("z_tot"))
            * (F.col("n") * F.col("zj") - F.col("m_lo") * F.col("z_tot"))
        ).alias("num_raw")
    )
    x = agg.crossJoin(F.broadcast(between)).select(
        "n",
        "k",
        F.col("m_lo").alias("m"),
        (F.col("m_lo") == F.col("m_hi")).alias("equal_sizes"),
        F.expr("1000 * (n - k) * num_raw").alias("num"),
        F.expr("(k - 1) * n * n * (m_lo * ss - sum_zj2)").alias("den"),
    )
    f = F.when(
        F.col("equal_sizes") & (F.col("den") > 0),
        F.expr("num div den"),
    )
    x2 = x.select("n", "k", "m", "num", "den", f.alias("f_milli"))
    return x2.select(
        "*", (F.col("f_milli") >= F.lit(crit_milli)).alias("sig")
    )
