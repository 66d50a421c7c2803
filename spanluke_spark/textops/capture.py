"""Capture-recapture population estimation (Lincoln 1930; Petersen
1896; Chapman 1951) and the Chao1 unseen-richness estimator (Chao
1984) — HOW BIG is the web segment we are crawling, from the overlap
of two independent crawls, and how many distinct types exist that we
have never seen? The coverage-extrapolation pair beside the
describe-what-you-saw lanes: q288 measures coverage of a KNOWN
frontier, Good-Turing (q313) prices the unseen MASS, Chao1 counts
the unseen TYPES, and capture-recapture sizes the whole population.

Capture-recapture, exact one-trunc rationals on the overlap counts
(n1 = crawl-A pages, n2 = crawl-B pages, m = seen by both):

  lp_milli      = 1000 * n1 * n2 div m            [classic; NULL m=0]
  chapman_milli = 1000 * (n1+1) * (n2+1) div (m+1) - 1000
  var_chapman   = (n1+1)(n2+1)(n1-m)(n2-m) / ((m+1)^2 (m+2))
                  -> milli, DECIMAL/HUGEINT cleared

Chapman is defined even at m == 0 and never below max(n1, n2) on
real overlaps (bias-corrected — the property the raw LP lacks).
Exact lanes pytest-pinned: identical crawls (m == n1 == n2) give
BOTH estimators == n exactly (the +1s cancel: (n+1)(n+1)/(n+1) - 1
== n); nested crawls (B subset of A) give LP == n1 exactly; var == 0
whenever either crawl is fully recaptured.

Chao1 from the frequency spectrum (f1 singletons, f2 doubletons,
s_obs distinct), the bias-corrected form (defined at f2 == 0):

  chao1_milli = 1000 * s_obs + 1000 * f1 * (f1 - 1) div (2 * (f2+1))

Exact lanes: no singletons -> chao1 == s_obs exactly (nothing left
to extrapolate); every type seen once -> the maximal extrapolation
S + S(S-1)/2. Monotone sanity: chao1 >= s_obs always.

Distributed shape: capture-recapture is one boolean-pair aggregate
over the keyed union of the two crawls; Chao1 is the standard
two-level frequency-spectrum aggregate (groupBy key -> groupBy
count). Both fully map-side combinable — these run at corpus scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["capture_recapture", "chao1"]


def capture_recapture(
    df: DataFrame,
    key_col: str = "key",
    in_a_col: str = "in_a",
    in_b_col: str = "in_b",
) -> DataFrame:
    """one row per distinct key with membership booleans ->
    ONE row (n1, n2, m, lp_milli, chapman_milli, var_chapman_milli).
    Keys in neither crawl are ignored (they carry no information)."""
    a = F.col(in_a_col).cast("boolean")
    b = F.col(in_b_col).cast("boolean")
    agg = df.where(a | b).groupBy().agg(
        F.sum(a.cast("long")).alias("n1"),
        F.sum(b.cast("long")).alias("n2"),
        F.sum((a & b).cast("long")).alias("m"),
    )
    chapman = F.expr(
        "1000 * (n1 + 1) * (n2 + 1) div (m + 1) - 1000"
    )
    var_ch = F.expr(
        "cast(1000 * cast(n1 + 1 as decimal(38,0)) * (n2 + 1)"
        " * (n1 - m) * (n2 - m)"
        " div (cast(m + 1 as decimal(38,0)) * (m + 1) * (m + 2))"
        " as long)"
    )
    return agg.select(
        F.coalesce(F.col("n1"), F.lit(0)).alias("n1"),
        F.coalesce(F.col("n2"), F.lit(0)).alias("n2"),
        F.coalesce(F.col("m"), F.lit(0)).alias("m"),
        F.when(
            F.col("m") > 0, F.expr("1000 * n1 * n2 div m")
        ).alias("lp_milli"),
        chapman.alias("chapman_milli"),
        var_ch.alias("var_chapman_milli"),
    )


def chao1(
    df: DataFrame, key_col: str = "key"
) -> DataFrame:
    """one row per OBSERVATION (duplicates meaningful) -> ONE row
    (n_obs, s_obs, f1, f2, chao1_milli, unseen_milli)."""
    counts = df.groupBy(F.col(key_col).alias("k")).agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    agg = counts.groupBy().agg(
        F.sum("c").alias("n_obs"),
        F.count(F.lit(1)).cast("long").alias("s_obs"),
        F.sum((F.col("c") == 1).cast("long")).alias("f1"),
        F.sum((F.col("c") == 2).cast("long")).alias("f2"),
    )
    extra = F.expr("1000 * f1 * (f1 - 1) div (2 * (f2 + 1))")
    return agg.select(
        "n_obs",
        "s_obs",
        "f1",
        "f2",
        (1000 * F.col("s_obs") + extra).alias("chao1_milli"),
        extra.alias("unseen_milli"),
    )
