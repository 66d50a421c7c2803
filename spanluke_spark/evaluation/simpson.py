"""Simpson's-paradox audit (Simpson 1951; Bickel et al. 1975) over a
stratified 2x2 design — does the pooled table's association REVERSE
what every stratum shows? The aggregation-bias tripwire a 100 TB
pipeline runs before quoting any pooled rate comparison: per-host or
per-language strata routinely carry confounded exposure mixes, and
the pooled number silently flips (the Berkeley admissions shape).
Companion of CMH (q323, the stratum-adjusted TEST) and the 2x2
effect panel (q395): this lane DETECTS when pooling was the bug.

Direction per table is the exact integer sign of ad - bc (the odds
direction; no division, no NULL hazards). Output, one row:

  k_strata, n_pos, n_neg, n_zero   per-stratum direction census
  agg_num, agg_direction           pooled ad - bc and its sign
  reversal_strata                  strata whose nonzero direction
                                   OPPOSES the nonzero aggregate
  paradox                          TRUE iff every nonzero stratum
                                   agrees on one direction and the
                                   nonzero aggregate opposes it —
                                   the strict textbook paradox

The kidney-stone closed form is pytest-pinned (both strata favor
treatment A, the pooled table favors B), plus the no-confounding
identity: if every stratum shares the SAME exposure split, pooling
can never reverse a unanimous direction (checked on a constructed
family). Long-bound contract: cells <= ~10^9 keep ad exact.

Distributed shape: one per-stratum aggregate (map-side combinable),
one 1-row pooled aggregate over it, one broadcast crossJoin.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["simpsons_audit"]


def simpsons_audit(
    df: DataFrame,
    stratum_col: str = "stratum",
    exposed_col: str = "exposed",
    positive_col: str = "positive",
) -> DataFrame:
    """(stratum, exposed bool, positive bool) one row per unit ->
    ONE row (k_strata, n_pos, n_neg, n_zero, agg_num,
    agg_direction, reversal_strata, paradox)."""
    e = F.col(exposed_col).cast("boolean")
    p = F.col(positive_col).cast("boolean")
    per = df.groupBy(F.col(stratum_col).alias("stratum")).agg(
        F.sum((e & p).cast("long")).alias("a"),
        F.sum((e & ~p).cast("long")).alias("b"),
        F.sum((~e & p).cast("long")).alias("c"),
        F.sum((~e & ~p).cast("long")).alias("d"),
    )
    sgn = F.signum(
        (F.col("a") * F.col("d") - F.col("b") * F.col("c")).cast(
            "double"
        )
    ).cast("int")
    decorated = per.select("a", "b", "c", "d", sgn.alias("s"))
    strata = decorated.groupBy().agg(
        F.count(F.lit(1)).cast("long").alias("k_strata"),
        F.sum((F.col("s") == 1).cast("long")).alias("n_pos"),
        F.sum((F.col("s") == -1).cast("long")).alias("n_neg"),
        F.sum((F.col("s") == 0).cast("long")).alias("n_zero"),
        F.sum("a").alias("ta"),
        F.sum("b").alias("tb"),
        F.sum("c").alias("tc"),
        F.sum("d").alias("td"),
    )
    agg_num = F.col("ta") * F.col("td") - F.col("tb") * F.col("tc")
    base = strata.select(
        "k_strata",
        "n_pos",
        "n_neg",
        "n_zero",
        agg_num.alias("agg_num"),
    )
    direction = (
        F.when(F.col("agg_num") > 0, F.lit("exposed_better"))
        .when(F.col("agg_num") < 0, F.lit("exposed_worse"))
        .otherwise(F.lit("no_association"))
    )
    reversal = (
        F.when(F.col("agg_num") > 0, F.col("n_neg"))
        .when(F.col("agg_num") < 0, F.col("n_pos"))
        .otherwise(F.lit(0).cast("long"))
    )
    paradox = (
        (F.col("agg_num") > 0)
        & (F.col("n_neg") > 0)
        & (F.col("n_pos") == 0)
    ) | (
        (F.col("agg_num") < 0)
        & (F.col("n_pos") > 0)
        & (F.col("n_neg") == 0)
    )
    return base.select(
        "*",
        direction.alias("agg_direction"),
        reversal.alias("reversal_strata"),
        paradox.alias("paradox"),
    )
