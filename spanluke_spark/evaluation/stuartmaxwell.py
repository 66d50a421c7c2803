"""Stuart-Maxwell marginal-homogeneity test (Stuart 1955; Maxwell
1970) for a PAIRED 3-category confusion — did the label DISTRIBUTION
move between two classifiers / crawl snapshots scored on the SAME
items? The k=3 generalization of McNemar (q322, k=2) and the
complement of Bowker's symmetry test (q-trendtests): marginal
homogeneity asks only whether row and column totals agree, not
whether the off-diagonal flow is symmetric.

Exactness — for k=3 the matrix form d' S^-1 d collapses to the
published closed form, and clearing the (n_ij + n_ji)/2 halves
leaves ONE exact integer rational (the adjugate never appears):

  d_i  = row_i - col_i            (sum d_i == 0, audited)
  m_ij = n_ij + n_ji              (discordant pair mass, exact)
  chi2 = (m_23 d_1^2 + m_13 d_2^2 + m_12 d_3^2)
         / (m_12 m_13 + m_12 m_23 + m_13 m_23)

quantized ONCE: chi2_milli = num * 1000 div den (both exact longs;
num <= 4 N^3 rides DECIMAL(38,0)/HUGEINT), df = 2, verdict gate
against chi-square(2) 0.95 = 5991 milli. The float matrix replay
(numpy solve of d' S^-1 d with S_ii = row_i + col_i - 2 n_ii,
S_ij = -(m_ij)) is the pytest cross-check — closed form == matrix
form is the Maxwell 1970 identity.

Lanes: a SYMMETRIC table (n_ij == n_ji) has every d_i == 0 ->
chi2 EXACTLY 0 even when Bowker-style flows are huge; a
diagonal-only table (perfect agreement) zeroes every m_ij -> den
== 0 -> NULL, status 'no_discordance' (no information about the
margins); den == 0 with some d_i != 0 is the SINGULAR lane (all
movement concentrated in one category pair), status 'singular';
categories outside {0,1,2} -> status 'out_of_regime' (the k=3
closed form is the contract; larger k belongs to a future adjugate
lane). A planted systematic 1 -> 2 relabel drift fires.

Distributed shape: ONE groupBy to the <= 9 confusion cells;
everything downstream runs on that 9-row frame. Nothing is sorted,
paired, or collected.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["stuart_maxwell"]


def stuart_maxwell(
    df: DataFrame, a_col: str = "cat_a", b_col: str = "cat_b"
) -> DataFrame:
    """(cat_a, cat_b) one row per item, categories 0/1/2 -> ONE row
    (n_items, d1, d2, d3, num, den, chi2_milli, df, crit_milli,
    sig05, status)."""
    s = df.select(
        F.col(a_col).cast("long").alias("a"),
        F.col(b_col).cast("long").alias("b"),
    )
    cells = s.groupBy("a", "b").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )

    def tot(pred, col="n"):
        return F.coalesce(
            F.sum(F.when(pred, F.col(col)).otherwise(0)), F.lit(0)
        )

    agg = cells.groupBy().agg(
        F.sum("n").alias("n_items"),
        tot(~F.col("a").between(0, 2) | ~F.col("b").between(0, 2)).alias(
            "n_oob"
        ),
        *[
            (
                tot(F.col("a") == i)
                - tot(F.col("b") == i)
            ).alias(f"d{i + 1}")
            for i in range(3)
        ],
        *[
            (
                tot((F.col("a") == i) & (F.col("b") == j))
                + tot((F.col("a") == j) & (F.col("b") == i))
            ).alias(f"m{i + 1}{j + 1}")
            for i in range(3)
            for j in range(3)
            if i < j
        ],
    )
    base = agg.select(
        "n_items",
        "n_oob",
        "d1",
        "d2",
        "d3",
        (
            F.col("m23") * F.col("d1") * F.col("d1")
            + F.col("m13") * F.col("d2") * F.col("d2")
            + F.col("m12") * F.col("d3") * F.col("d3")
        ).alias("num"),
        (
            F.col("m12") * F.col("m13")
            + F.col("m12") * F.col("m23")
            + F.col("m13") * F.col("m23")
        ).alias("den"),
        (F.col("m12") + F.col("m13") + F.col("m23")).alias("m_sum"),
    )
    ok = (F.col("n_oob") == 0) & (F.col("den") > 0)
    chi2 = F.expr(
        "cast(cast(num as decimal(38,0)) * 1000 div den as long)"
    )
    return base.select(
        "n_items",
        "d1",
        "d2",
        "d3",
        F.when(ok, F.col("num")).alias("num"),
        F.when(ok, F.col("den")).alias("den"),
        F.when(ok, chi2).alias("chi2_milli"),
        F.when(ok, F.lit(2)).alias("df"),
        F.when(ok, F.lit(5991)).alias("crit_milli"),
        F.when(ok, chi2 > 5991).alias("sig05"),
        F.when(F.col("n_oob") > 0, F.lit("out_of_regime"))
        .when(
            (F.col("den") == 0) & (F.col("m_sum") == 0),
            F.lit("no_discordance"),
        )
        .when(F.col("den") == 0, F.lit("singular"))
        .otherwise(F.lit("ok"))
        .alias("status"),
    )
