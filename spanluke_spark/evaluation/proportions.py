"""Two-proportion z-test (the pooled-variance conversion-rate test) —
the missing BINARY member of the A/B family: the CUPED lane (q339)
and the bootstrap lane (q165) compare MEANS; "did the click/legal-hit
RATE move between control and treatment" is this test, and it is
algebraically the 2x2 Pearson chi-squared (pinned below).

Exactness: with conversions a of n1 and b of n2, N = n1 + n2,

  z^2 = (a/n1 - b/n2)^2 / (p(1-p)(1/n1 + 1/n2)),  p = (a+b)/N

clears to ONE integer division:

  z2_milli = 1000 * N * (a*n2 - b*n1)^2
             div (n1 * n2 * (a+b) * (N - a - b))

Degenerate pools (a+b = 0 or a+b = N: p in {0,1}) surface NULL.
Identities pinned by pytest: z^2 == the 2x2 Pearson chi-squared
EXACTLY (same integer formula after algebra — cross-checked in
floats), and z^2 == N/(N-1) times the Cochran-Armitage statistic at
scores {0,1} (q356's reduction, closing the triangle). Swapping the
groups flips the direction and keeps z^2; planted lift significant
vs equal-rate null. Long bound: (a*n2 - b*n1)^2 * 1000 * N needs
n1 + n2 <= ~1500 at these scalings (bounded-slice contract).

Distributed shape: ONE aggregate over (group, converted) rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["two_proportion_z"]


def two_proportion_z(
    rows: DataFrame,
    group_col: str = "grp",
    conv_col: str = "converted",
    crit_milli: int = 3841,
) -> DataFrame:
    """(grp 0/1, converted bool) -> ONE row (n1, n2, a, b, dev,
    z2_milli, direction, sig); treatment = grp 1."""
    s = rows.select(
        (F.col(group_col) == 1).alias("t"),
        F.col(conv_col).cast("boolean").alias("y"),
    )
    agg = s.groupBy().agg(
        F.sum((~F.col("t")).cast("long")).alias("n1"),
        F.sum(F.col("t").cast("long")).alias("n2"),
        F.sum((~F.col("t") & F.col("y")).cast("long")).alias("a"),
        F.sum((F.col("t") & F.col("y")).cast("long")).alias("b"),
    )
    x = agg.select(
        "n1", "n2", "a", "b",
        F.expr("b * n1 - a * n2").alias("dev"),
        F.expr(
            "n1 * n2 * (a + b) * (n1 + n2 - a - b)"
        ).alias("d"),
    )
    z2 = F.when(
        F.col("d") > 0,
        F.expr("1000 * (n1 + n2) * dev * dev div d"),
    )
    x2 = x.select("n1", "n2", "a", "b", "dev", z2.alias("z2_milli"))
    return x2.select(
        "*",
        F.when(F.col("z2_milli").isNull(), F.lit(None).cast("string"))
        .when(F.col("dev") > 0, F.lit("treatment_higher"))
        .when(F.col("dev") < 0, F.lit("treatment_lower"))
        .otherwise(F.lit("exact_expectation"))
        .alias("direction"),
        (F.col("z2_milli") >= F.lit(crit_milli)).alias("sig"),
    )
