"""Exact conditional two-rate Poisson test (Przyborowski & Wilenski
1940, the C-test) — did source A emit incidents at a higher RATE than
source B, given unequal exposures? The small-count EXACT companion of
the two-proportion z (q373), exactly as Fisher (q332) is to
chi-squared (q281): with counts a, b over integer exposure weights
m1, m2, conditioning on k = a + b makes a | k ~ Binomial(k,
m1/(m1+m2)) under rate equality — a rational success probability, so
the whole test stays in integers.

Exactness (the q332 method-of-small-P discipline): the k+1 outcome
weights T_x = C(k, x) * m1^x * m2^(k-x) are exact integers —
C(k, x) from factorial(k <= 14) (inside the q332 factorial-20
regime), the powers <= max(m1,m2)^14 exact in the double pow before
the long cast; sum_x T_x == (m1+m2)^k by the binomial theorem
(pinned as a per-row invariant). Two-sided p = sum of T_x <= T_a
over (m1+m2)^k, significance by the cross-multiplied
20 * p_num <= p_den. Regime guard: k > 14 surfaces NULL (send big
counts to q373) — the binding bound is the ppm scaling
p_num * 10^6 <= (m1+m2)^14 * 10^6 ~ 4.4e18 < 2^63 at the maximal
exposure granularity m1 + m2 <= 8 (scale exposures to their
smallest integer ratio).

Observing the exact expectation (a*m2 == b*m1) yields p == 1
exactly; direction is the sign of a*m2 - b*m1. Distributed shape:
one aggregate, one bounded explode (<= 21 x-values), one groupBy —
constant work per tested pair.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["two_rate_poisson"]


def two_rate_poisson(
    rows: DataFrame,
    m1: int,
    m2: int,
    group_col: str = "grp",
) -> DataFrame:
    """(grp 0/1) one row per incident, exposures m1:m2 -> ONE row
    (a, b, k, t_obs, p_num, p_den, p_ppm, direction, sig05);
    k > 14 -> NULL test columns."""
    if m1 + m2 > 8 or m1 < 1 or m2 < 1:
        raise ValueError("exposure ratio must satisfy 1<=m1,m2, m1+m2<=8")
    s = rows.select((F.col(group_col) == 0).alias("is_a"))
    agg = s.groupBy().agg(
        F.sum(F.col("is_a").cast("long")).alias("a"),
        F.sum((~F.col("is_a")).cast("long")).alias("b"),
    ).select("a", "b", (F.col("a") + F.col("b")).alias("k"))
    ok = (F.col("k") >= 1) & (F.col("k") <= 14)
    xs = agg.select(
        "a",
        "b",
        "k",
        F.explode(
            F.when(ok, F.sequence(F.lit(0), F.col("k").cast("int")))
            .otherwise(F.array(F.lit(0)))
        ).alias("x"),
    )
    w = F.expr(
        "factorial(k) div (factorial(x) * factorial(k - x))"
        f" * cast(pow({m1}, x) as bigint)"
        f" * cast(pow({m2}, k - x) as bigint)"
    )
    wobs = F.expr(
        "factorial(k) div (factorial(a) * factorial(k - a))"
        f" * cast(pow({m1}, a) as bigint)"
        f" * cast(pow({m2}, k - a) as bigint)"
    )
    cells = xs.select(
        "a", "b", "k", w.alias("w"), wobs.alias("w_obs")
    )
    g = cells.groupBy("a", "b", "k").agg(
        F.max("w_obs").alias("t_obs"),
        F.sum(
            F.when(F.col("w") <= F.col("w_obs"), F.col("w")).otherwise(
                0
            )
        ).alias("p_num"),
        F.sum("w").alias("p_den"),
    )
    valid = (F.col("k") >= 1) & (F.col("k") <= 14)
    dev = F.col("a") * F.lit(m2) - F.col("b") * F.lit(m1)
    out = g.select(
        "a",
        "b",
        "k",
        F.when(valid, F.col("t_obs")).alias("t_obs"),
        F.when(valid, F.col("p_num")).alias("p_num"),
        F.when(valid, F.col("p_den")).alias("p_den"),
        F.when(valid, F.expr("p_num * 1000000 div p_den")).alias(
            "p_ppm"
        ),
        F.when(~valid, F.lit(None).cast("string"))
        .when(dev > 0, F.lit("a_rate_higher"))
        .when(dev < 0, F.lit("b_rate_higher"))
        .otherwise(F.lit("exact_expectation"))
        .alias("direction"),
        F.when(valid, 20 * F.col("p_num") <= F.col("p_den")).alias(
            "sig05"
        ),
    )
    return out
