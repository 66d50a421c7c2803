"""Wald-Wolfowitz runs test (Wald & Wolfowitz 1940) — is a binary
crawl outcome sequence (success/failure per fetch, cache hit/miss,
dup/novel) RANDOM in order, or does it clump (positive serial
dependence) or alternate (negative)? The order-randomness audit the
rate-based lanes can't see: a 50% success stream that fails in hour-
long blocks has the same marginal rate as a random one but a far
smaller run count. Companion to the SPRT monitor (q327, which
assumes i.i.d. trials — this lane CHECKS that assumption) and the
autocorrelation lane (q298).

Exactness discipline — fully exact, no quantization anywhere: with
n1 ones, n2 zeros (n = n1 + n2) and R observed runs (one lag window),

  E[R] = 1 + 2*n1*n2/n
  Var  = 2*n1*n2*(2*n1*n2 - n) / (n^2 * (n - 1))
  z^2  = (R*n - n - 2*n1*n2)^2 * (n - 1)
         / (2*n1*n2 * (2*n1*n2 - n))          (the n^2 cancels)

so z2_milli = num * 1000 div den is ONE integer division and the
two-sided 5% verdict is the gate z2_milli >= 3841 (1.96^2, the same
published constant as the chi-squared df=1 lanes). ``direction``
reports clumping (R below expectation, cross-multiplied R*n <
n + 2*n1*n2) vs alternation. A one-symbol sequence or a degenerate
variance (2*n1*n2 = n, e.g. n1 = n2 = 1) surfaces NULL. Overflow:
(R*n)^2 * n demands n <= ~10^3 per series; callers bound the slice.

Distributed shape: one lag window over the sequence order, one
aggregate — linear, and per-series parallel under a partitioned
window when a series key is added upstream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["runs_test", "ww_two_sample"]


def runs_test(
    seq: DataFrame,
    pos_col: str = "pos",
    x_col: str = "x",
    crit_milli: int = 3841,
) -> DataFrame:
    """(pos, x: boolean) -> ONE row (n, n1, n2, r, z2_milli,
    direction, sig)."""
    t = seq.select(
        F.col(pos_col).alias("pos"), F.col(x_col).cast("int").alias("x")
    )
    w = Window.orderBy("pos")
    flagged = t.select(
        "x",
        F.when(
            F.lag("x").over(w).isNull()
            | (F.lag("x").over(w) != F.col("x")),
            1,
        )
        .otherwise(0)
        .alias("new_run"),
    )
    agg = flagged.groupBy().agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("n1"),
        F.sum("new_run").cast("long").alias("r"),
    )
    m = agg.select(
        "n",
        "n1",
        (F.col("n") - F.col("n1")).alias("n2"),
        "r",
    )
    den = F.expr("2 * n1 * n2 * (2 * n1 * n2 - n)")
    z2 = F.when(
        den > 0,
        F.expr(
            "(r * n - n - 2 * n1 * n2) * (r * n - n - 2 * n1 * n2)"
            " * (n - 1) * 1000 div (2 * n1 * n2 * (2 * n1 * n2 - n))"
        ),
    )
    x = m.select("n", "n1", "n2", "r", z2.alias("z2_milli"))
    return x.select(
        "*",
        F.when(F.col("z2_milli").isNull(), F.lit(None).cast("string"))
        .when(
            F.col("r") * F.col("n")
            < F.col("n") + 2 * F.col("n1") * F.col("n2"),
            F.lit("clumping"),
        )
        .when(
            F.col("r") * F.col("n")
            > F.col("n") + 2 * F.col("n1") * F.col("n2"),
            F.lit("alternating"),
        )
        .otherwise(F.lit("exact_expectation"))
        .alias("direction"),
        (F.col("z2_milli") >= F.lit(crit_milli)).alias("sig"),
    )


def ww_two_sample(
    df: DataFrame, group_col: str = "grp", x_col: str = "x"
) -> DataFrame:
    """Two-sample Wald-Wolfowitz runs test (Wald & Wolfowitz 1940):
    pool both samples, sort by value, count RUNS of the group label —
    an omnibus test sensitive to ANY distributional difference
    (location, scale, shape): samples from the same distribution
    interleave (many runs), any systematic difference clumps the
    labels (few runs). The omnibus cousin of KS (q267) predating it
    in the runs form, and literally ``runs_test`` applied to the
    label sequence in VALUE order instead of arrival order — same
    exact moments, same one-division z^2, zero new arithmetic (the
    cross-module identity the pytest pins).

    NO-TIES contract (declared audit, q446/q455 precedent): a tied
    value makes the label order within the tie class undefined, so
    any pooled tie -> every statistic NULL, status 'ties'. Complete
    separation gives the minimum r == 2 and the maximal clumping
    z^2 — the fires lane; perfect interleaving fires the other tail
    (direction 'alternating'); same-distribution samples sit near
    E[R] = 1 + 2*n1*n2/n. Long-bound n <= ~10^3 per the runs_test
    contract (stated there).

    (grp 0/1, x int) -> ONE row (n, n1, n2, r, z2_milli, direction,
    sig, status)."""
    s = df.select(
        F.col(x_col).cast("long").alias("x"),
        (F.col(group_col) == 0).cast("int").alias("lab"),
    )
    ties = s.groupBy("x").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    ).groupBy().agg(
        F.sum(F.when(F.col("c") > 1, 1).otherwise(0)).alias(
            "n_tied"
        )
    )
    base = runs_test(s, pos_col="x", x_col="lab").crossJoin(
        F.broadcast(ties)
    )
    ok = F.col("n_tied") == 0
    return base.select(
        "n",
        F.when(ok, F.col("n1")).alias("n1"),
        F.when(ok, F.col("n2")).alias("n2"),
        F.when(ok, F.col("r")).alias("r"),
        F.when(ok, F.col("z2_milli")).alias("z2_milli"),
        F.when(ok, F.col("direction")).alias("direction"),
        F.when(ok, F.col("sig")).alias("sig"),
        F.when(~ok, F.lit("ties"))
        .otherwise(F.lit("ok"))
        .alias("status"),
    )
