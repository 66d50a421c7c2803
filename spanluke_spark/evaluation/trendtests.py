"""Cochran-Armitage trend test (Cochran 1954; Armitage 1955) and
Bowker's symmetry test (Bowker 1948) — the two categorical-table
tests the paired/stratified family (McNemar q322, CMH q323, Cochran's
Q q342) still lacked.

Web-scale use: Cochran-Armitage asks "does the RATE of a binary page
property rise monotonically with an ordered exposure?" (legal-mention
rate vs crawl depth, spam rate vs redirect-chain length) — the
2 x k dose-response question a plain chi-squared (q281) wastes power
on. Bowker asks "when two models label the SAME pages, are their
disagreements directional?" — the k x k generalization of McNemar:
a systematic upgrade/downgrade drift between model versions shows up
as asymmetric off-diagonal cells.

Cochran-Armitage exactness: with column scores s_i, totals n_i,
positives r_i, T = sum s_i r_i, S1 = sum s_i n_i, S2 = sum s_i^2 n_i,
R positives among N, the exact conditional (hypergeometric) variance
Var(T) = R(N-R)(N*S2 - S1^2) / (N^2 (N-1)) clears to ONE integer
division:

  dev      = N*T - R*S1            (= N^2 * (T - E[T]) / N, exact)
  z2_milli = 1000 (N-1) dev^2 div (R(N-R)(N*S2 - S1^2))

Degenerate inputs (R = 0, R = N, or constant scores) surface NULL.
With scores {0,1} the statistic reduces to (N-1)/N times the 2x2
Pearson chi-squared — pinned by pytest. Long-bound contract:
dev <= N*T <= N^2*max_s needs N <= ~10^4 at small integer scores.

Bowker exactness (the once-quantized cell discipline of q346/q347):
every directed off-diagonal count folds onto its canonical unordered
pair (lo, hi) as (up, down); each pair contributes the once-quantized
milli cell 1000*(up-down)^2 div (up+down); chi2_milli is their exact
integer sum and df counts contributing pairs. The critical value is
CALLER-SUPPLIED (df is data-dependent — the q327 constant
discipline). df = 0 (diagonal-only table) surfaces NULL sig. With
k = 2 the single pair IS the uncorrected McNemar (b-c)^2/(b+c) —
pinned by pytest. Rater swap (transposing the table) swaps up/down
per pair and leaves every cell invariant — pinned.

Distributed shape: CA is one groupBy(score) + one aggregate; Bowker
is one groupBy(label pair) onto canonical pairs + one aggregate. No
windows, no joins, nothing driver-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["cochran_armitage", "bowker_symmetry"]


def cochran_armitage(
    dosed: DataFrame,
    score_col: str = "score",
    outcome_col: str = "outcome",
    crit_milli: int = 3841,
) -> DataFrame:
    """(score integer dose, outcome bool) -> ONE row (n, k, r, t, s1,
    s2, dev, z2_milli, direction, sig)."""
    s = dosed.select(
        F.col(score_col).cast("long").alias("s"),
        F.col(outcome_col).cast("boolean").alias("y"),
    )
    per = s.groupBy("s").agg(
        F.count(F.lit(1)).cast("long").alias("nj"),
        F.sum(F.col("y").cast("long")).alias("rj"),
    )
    agg = per.groupBy().agg(
        F.sum("nj").alias("n"),
        F.count(F.lit(1)).cast("long").alias("k"),
        F.sum("rj").alias("r"),
        F.sum(F.col("s") * F.col("rj")).alias("t"),
        F.sum(F.col("s") * F.col("nj")).alias("s1"),
        F.sum(F.col("s") * F.col("s") * F.col("nj")).alias("s2"),
    )
    x = agg.select(
        "n", "k", "r", "t", "s1", "s2",
        F.expr("n * t - r * s1").alias("dev"),
        F.expr("r * (n - r) * (n * s2 - s1 * s1)").alias("d"),
    )
    z2 = F.when(
        F.col("d") > 0,
        F.expr("1000 * (n - 1) * dev * dev div d"),
    )
    x2 = x.select(
        "n", "k", "r", "t", "s1", "s2", "dev", z2.alias("z2_milli")
    )
    return x2.select(
        "*",
        F.when(F.col("z2_milli").isNull(), F.lit(None).cast("string"))
        .when(F.col("dev") > 0, F.lit("rate_increasing"))
        .when(F.col("dev") < 0, F.lit("rate_decreasing"))
        .otherwise(F.lit("exact_expectation"))
        .alias("direction"),
        (F.col("z2_milli") >= F.lit(crit_milli)).alias("sig"),
    )


def bowker_symmetry(
    paired: DataFrame,
    a_col: str = "a",
    b_col: str = "b",
    crit_milli: int | None = None,
) -> DataFrame:
    """(a label, b label) paired -> ONE row (n_pairs_df, chi2_milli,
    n_disagree, sig): sum of once-quantized per-pair milli cells
    1000*(up-down)^2 div (up+down) over canonical unordered pairs."""
    s = paired.select(
        F.col(a_col).cast("long").alias("i"),
        F.col(b_col).cast("long").alias("j"),
    ).where(F.col("i") != F.col("j"))
    cells = (
        s.select(
            F.least("i", "j").alias("lo"),
            F.greatest("i", "j").alias("hi"),
            (F.col("i") < F.col("j")).cast("long").alias("is_up"),
        )
        .groupBy("lo", "hi")
        .agg(
            F.sum("is_up").alias("up"),
            F.sum(1 - F.col("is_up")).alias("down"),
        )
        .select(
            (F.col("up") + F.col("down")).alias("tot"),
            F.expr(
                "1000 * (up - down) * (up - down) div (up + down)"
            ).alias("cell_milli"),
        )
    )
    agg = cells.groupBy().agg(
        F.coalesce(F.count(F.lit(1)), F.lit(0)).cast("long").alias(
            "n_pairs_df"
        ),
        F.coalesce(F.sum("cell_milli"), F.lit(0).cast("long")).alias(
            "chi2_milli"
        ),
        F.coalesce(F.sum("tot"), F.lit(0).cast("long")).alias(
            "n_disagree"
        ),
    )
    sig = (
        F.lit(None).cast("boolean")
        if crit_milli is None
        else F.when(
            F.col("n_pairs_df") > 0,
            F.col("chi2_milli") >= F.lit(crit_milli),
        )
    )
    return agg.select("*", sig.alias("sig"))
