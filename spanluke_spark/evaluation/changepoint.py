"""Nonparametric change-point + trend detection: the Pettitt test
(Pettitt 1979) and the Cox-Stuart sign-trend test (Cox & Stuart
1955) — did a crawl-quality series SHIFT somewhere (Pettitt locates
the break), and is it drifting monotonically (Cox-Stuart, the
assumption-free cousin of Mann-Kendall q295)?

Pettitt exactness — NO pair join. The definitional statistic
U_t = sum_{i<=t} sum_{j>t} sgn(x_j - x_i) collapses, via the
Mann-Whitney cumulative-rank identity on integer DOUBLE ranks
(DR_i = 2*avg_rank_i = 2*less_i + eq_incl_i + 1, the q296
discipline), to

  U_t = t*(n+1) - sum_{i<=t} DR_i

(derivation: within-block ordered pairs telescope to t(t-1)/2, ties
carry half credit on both sides; pinned against the O(n^2)
definitional replay in pytest, ties included). So the whole scan is
ONE value-class rank window + ONE time-order cumulative window + ONE
aggregate: K = max_t |U_t| over t < n, the break at the smallest
argmax. The significance approximation p ~ 2*exp(-6K^2/(n^3+n^2))
(Pettitt 1979 eq. 10) ships as the exact-rational exponent
exp_milli = 6000*K^2 div (n^3+n^2) plus the alpha=0.05 verdict by
cross-multiplication: significant iff 6e6*K^2 > 3688879*(n^3+n^2)
(3.688879 = -1000*ln(0.025), constant quantized once, stated).
Long-bound contract: 6e6*K^2 with K <= n^2/4 needs n <= ~1200 —
bounded evaluation slices (the q330 contract).

Cox-Stuart exactness: pair x_i with x_{i+ceil(n/2)} (odd n drops the
middle), count S+ (rise) / S- (fall), drop ties; under no-trend
S+ ~ Binomial(m, 1/2), m = S+ + S-. The two-sided exact sign-test
p = min(1, 2 * sum_{k<=min(S+,S-)} C(m,k) / 2^m) stays ALL-integer:
the binomial prefix sum builds by the multiplicative recurrence
C(m,k) = C(m,k-1)*(m-k+1)/k (each step an EXACT integer division)
folded JVM-side with F.aggregate over sequence(1..kmin) — no
factorial overflow, valid to m <= 40 (2*sum*10^6 <= 2^40*10^6 <
2^63); m > 40 surfaces NULL (send long series to Mann-Kendall q295),
m == 0 (all ties) NULL. Significance by cross-multiplied
20*p_num <= p_den.

Distributed shape: Pettitt is two windows + one agg; Cox-Stuart is
one row_number window + ONE equi-join on the half-offset index +
one agg. Both linear; the global windows are the documented
bounded-slice contract.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window

__all__ = ["pettitt", "cox_stuart"]


def pettitt(
    df: DataFrame,
    t_col: str = "t",
    x_col: str = "x",
) -> DataFrame:
    """(t order key, x integer signal) -> ONE row (n, k_stat, t_star,
    u_at_break, exp_milli, sig05): Pettitt change-point scan via the
    double-rank identity; NULL verdict columns when n < 2."""
    s = df.select(
        F.col(t_col).cast("long").alias("t"),
        F.col(x_col).cast("long").alias("x"),
    )
    cls = s.groupBy("x").agg(F.count(F.lit(1)).alias("c"))
    wv = Window.orderBy("x").rowsBetween(Window.unboundedPreceding, 0)
    ranked = cls.select(
        "x",
        "c",
        (F.sum("c").over(wv) - F.col("c")).alias("less"),
    ).select(
        "x", (2 * F.col("less") + F.col("c") + 1).alias("dr")
    )
    rows = s.join(F.broadcast(ranked), "x")
    wt = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, 0)
    n_row = s.groupBy().agg(F.count(F.lit(1)).cast("long").alias("n"))
    u = (
        rows.select(
            F.row_number().over(Window.orderBy("t")).alias("idx"),
            F.sum("dr").over(wt).alias("cum_dr"),
        )
        .crossJoin(F.broadcast(n_row))
        .where(F.col("idx") < F.col("n"))
        .select(
            "n",
            "idx",
            (F.col("idx") * (F.col("n") + 1) - F.col("cum_dr")).alias(
                "u"
            ),
        )
    )
    kmax = u.groupBy("n").agg(F.max(F.abs(F.col("u"))).alias("k_stat"))
    star = (
        u.join(F.broadcast(kmax), "n")
        .where(F.abs(F.col("u")) == F.col("k_stat"))
        .groupBy("n", "k_stat")
        .agg(
            F.min("idx").alias("t_star"),
            F.min_by("u", "idx").alias("u_at_break"),
        )
    )
    return star.select(
        "n",
        "k_stat",
        "t_star",
        "u_at_break",
        F.when(
            F.col("n") > 1,
            F.expr(
                "6000 * k_stat * k_stat div (n * n * n + n * n)"
            ),
        ).alias("exp_milli"),
        F.when(
            F.col("n") > 1,
            F.expr(
                "6000000 * k_stat * k_stat"
                " > 3688879 * (n * n * n + n * n)"
            ),
        ).alias("sig05"),
    )


def cox_stuart(
    df: DataFrame,
    t_col: str = "t",
    x_col: str = "x",
) -> DataFrame:
    """(t order key, x integer signal) -> ONE row (n, n_pairs,
    s_plus, s_minus, m, p_num, p_den, p_ppm, direction, sig05):
    exact two-sided sign-trend test; ties dropped; m == 0 or m > 40
    -> NULL verdict columns."""
    s = df.select(
        F.col(t_col).cast("long").alias("t"),
        F.col(x_col).cast("long").alias("x"),
    )
    idxd = s.select(
        F.row_number().over(Window.orderBy("t")).alias("idx"), "x"
    ).localCheckpoint(eager=True)
    n_row = idxd.groupBy().agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    early = idxd.crossJoin(F.broadcast(n_row)).where(
        F.col("idx") <= F.expr("n div 2")
    )
    late = idxd.select(
        F.col("idx").alias("jdx"), F.col("x").alias("x_late")
    )
    pairs = early.join(
        late,
        F.col("jdx")
        == F.col("idx") + F.expr("n div 2 + n % 2"),
    )
    agg = pairs.groupBy("n").agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
        F.sum((F.col("x_late") > F.col("x")).cast("long")).alias(
            "s_plus"
        ),
        F.sum((F.col("x_late") < F.col("x")).cast("long")).alias(
            "s_minus"
        ),
    )
    base = agg.select(
        "n",
        "n_pairs",
        "s_plus",
        "s_minus",
        (F.col("s_plus") + F.col("s_minus")).alias("m"),
        F.least("s_plus", "s_minus").alias("kmin"),
    )
    valid = (F.col("m") >= 1) & (F.col("m") <= 40)
    # exact binomial prefix: fold C(m,k) = C(m,k-1)*(m-k+1) div k
    # sequence(1, 0) would DESCEND in Spark — guard kmin == 0 (the
    # prefix sum is then just C(m, 0) = 1)
    tail = F.when(
        F.col("kmin") >= 1,
        F.expr(
            "aggregate(sequence(1, cast(kmin as int)),"
            " named_struct('c', cast(1 as bigint),"
            "              's', cast(1 as bigint)),"
            " (acc, j) -> named_struct("
            "   'c', acc.c * (m - j + 1) div j,"
            "   's', acc.s + acc.c * (m - j + 1) div j),"
            " acc -> acc.s)"
        ),
    ).otherwise(F.lit(1).cast("long"))
    den = F.expr("cast(pow(2, m) as bigint)")
    out = base.select(
        "n",
        "n_pairs",
        "s_plus",
        "s_minus",
        "m",
        F.when(valid, F.least(2 * tail, den)).alias("p_num"),
        F.when(valid, den).alias("p_den"),
    ).select(
        "n",
        "n_pairs",
        "s_plus",
        "s_minus",
        "m",
        "p_num",
        "p_den",
        F.when(
            F.col("p_den").isNotNull(),
            F.expr("p_num * 1000000 div p_den"),
        ).alias("p_ppm"),
        F.when(F.col("s_plus") > F.col("s_minus"), F.lit("rising"))
        .when(F.col("s_plus") < F.col("s_minus"), F.lit("falling"))
        .otherwise(F.lit("balanced"))
        .alias("direction"),
        F.when(
            F.col("p_den").isNotNull(),
            20 * F.col("p_num") <= F.col("p_den"),
        ).alias("sig05"),
    )
    return out
