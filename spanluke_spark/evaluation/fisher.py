"""Fisher's exact test for 2x2 tables (Fisher 1934) — the EXACT
small-count companion that completes the repo's association family:
chi-squared (q281) and G² (q324) are asymptotic and break down at the
sparse per-host tables where an exact hypergeometric tail is the only
honest answer; McNemar (q322) covers paired designs and CMH (q323)
pooled strata, this lane the single unpaired table.

Exactness discipline: with margins r1 = a+b, r2 = c+d, c1 = a+c, the
hypergeometric weights share the denominator C(n, c1), so only the
NUMERATORS w(k) = C(r1, k) * C(r2, c1-k) are ever materialized —
integers, computed from factorial(m <= 20) which both engines carry
exactly in 64/128-bit (20! = 2432902008176640000 < 2^63). The
two-sided p-value is the method of small P values on EXACT integers
(no float (1 + 1e-7) tie fudge):

  p = sum_{k : w(k) <= w(a)} w(k)  /  sum_k w(k)

where sum_k w(k) == C(n, c1) by Vandermonde — factorial(n > 20) is
never evaluated. Regime guard: rows with r1 > 20 or r2 > 20 surface
NULL (send large counts to the chi2/G2/CMH lanes); within the regime
every intermediate is <= 20!*2 and p_num * 10^6 <= C(40,20) * 10^6
~ 1.4e17, inside the long bound. Significance at alpha = 0.05 is the
cross-multiplied integer test 20 * p_num <= p_den.

Distributed shape: one bounded explode (<= 21 k-values per table) and
one (grp) groupBy — per-stratum work is constant, corpus-linear.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["fisher_exact"]


def fisher_exact(tables: DataFrame, grp_col: str = "grp") -> DataFrame:
    """(grp, a, b, c, d) one 2x2 table per row -> per grp:
    (grp, a, b, c, d, w_obs, p_num, p_den, p_ppm, sig05); NULL
    p/w/sig when either row margin exceeds the factorial-20 regime."""
    t = tables.select(
        F.col(grp_col).alias("grp"),
        *[F.col(c).cast("long").alias(c) for c in ("a", "b", "c", "d")],
    ).select(
        "*",
        (F.col("a") + F.col("b")).alias("r1"),
        (F.col("c") + F.col("d")).alias("r2"),
        (F.col("a") + F.col("c")).alias("c1"),
    )
    ok = (F.col("r1") <= 20) & (F.col("r2") <= 20)
    ks = t.select(
        "*",
        F.explode(
            F.when(
                ok,
                F.sequence(
                    F.greatest(F.lit(0), F.col("c1") - F.col("r2")),
                    F.least(F.col("r1"), F.col("c1")),
                ),
            ).otherwise(F.array(F.lit(None).cast("long")))
        ).alias("k"),
    )
    w = F.expr(
        "factorial(r1) div (factorial(k) * factorial(r1 - k))"
        " * (factorial(r2) div (factorial(c1 - k) * factorial(r2 - c1 + k)))"
    )
    wobs = F.expr(
        "factorial(r1) div (factorial(a) * factorial(r1 - a))"
        " * (factorial(r2) div (factorial(c1 - a) * factorial(r2 - c1 + a)))"
    )
    scored = ks.select(
        "grp", "a", "b", "c", "d",
        w.alias("w"),
        wobs.alias("w_obs"),
    )
    agg = scored.groupBy("grp").agg(
        F.max("a").alias("a"),
        F.max("b").alias("b"),
        F.max("c").alias("c"),
        F.max("d").alias("d"),
        F.max("w_obs").alias("w_obs"),
        F.sum(F.when(F.col("w") <= F.col("w_obs"), F.col("w"))).alias(
            "p_num"
        ),
        F.sum("w").alias("p_den"),
    )
    return agg.select(
        "grp", "a", "b", "c", "d", "w_obs", "p_num", "p_den",
        F.expr("p_num * 1000000 div p_den").alias("p_ppm"),
        (F.col("p_num") * 20 <= F.col("p_den")).alias("sig05"),
    )
