"""Total-variation and two-sample chi-square distance between two
corpora's token distributions — the LOG-FREE members of the
distribution-shift family (KL q275 and Jensen-Shannon q334 both need
ln cells): TVD is the sup-norm shift bound every drift monitor quotes
(half the L1 gap = the largest possible difference in probability any
event can see), and the two-sample chi-square statistic is its
classical significance companion.

Exactness — both clear WITHOUT logs:

  tv_ppm = 10^6 * sum_i |a_i*N_b - b_i*N_a| div (2*N_a*N_b)

is ONE exact integer division (the per-type share gap cross-
multiplied onto the common denominator N_a*N_b), and the two-sample
chi-square uses the identity

  chi2 = sum_i (a_i*N_b - b_i*N_a)^2 / (N_a*N_b*(a_i+b_i))

quantized ONCE per type (the q346/q357 cell discipline):

  cell_milli = 1000 * (a_i*N_b - b_i*N_a)^2 div (N_a*N_b*(a_i+b_i))

with chi2_milli their exact sum and df = shared-support types - 1
reported for a caller-side gate. Closed forms pinned by pytest:
identical corpora give exactly (0, 0); disjoint vocabularies give
tv_ppm exactly 10^6; A<->B swap leaves both invariant; duplicating
one corpus (b_i -> 2*b_i) leaves tv EXACTLY unchanged (both sides of
the division double). Long bound: (a_i*N_b)^2 needs
max_count * N <= ~3*10^9 per slice — documented contract.

Distributed shape: one token count per corpus, one full-outer join on
the type key, one aggregate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["distribution_distance"]


def distribution_distance(
    docs_a: DataFrame,
    docs_b: DataFrame,
    text_col: str = "text",
) -> DataFrame:
    """Two corpora -> ONE row (n_a, n_b, n_types, n_shared, n_only_a,
    n_only_b, tv_ppm, chi2_milli): token-distribution TVD (one exact
    division) and per-type once-quantized chi-square cells."""

    def _counts(docs: DataFrame, name: str) -> DataFrame:
        return (
            docs.select(
                F.explode(
                    F.filter(
                        F.split(F.col(text_col), " "), lambda t: t != ""
                    )
                ).alias("tok")
            )
            .groupBy("tok")
            .agg(F.count(F.lit(1)).cast("long").alias(name))
        )

    a = _counts(docs_a, "a")
    b = _counts(docs_b, "b")
    grid = a.join(b, "tok", "full").select(
        F.coalesce(F.col("a"), F.lit(0).cast("long")).alias("a"),
        F.coalesce(F.col("b"), F.lit(0).cast("long")).alias("b"),
    )
    tot = grid.groupBy().agg(
        F.sum("a").alias("n_a"), F.sum("b").alias("n_b")
    )
    cells = grid.crossJoin(F.broadcast(tot)).select(
        "n_a",
        "n_b",
        "a",
        "b",
        F.abs(F.col("a") * F.col("n_b") - F.col("b") * F.col("n_a"))
        .alias("l1_num"),
        F.expr(
            "1000 * (a * n_b - b * n_a) * (a * n_b - b * n_a)"
            " div (n_a * n_b * (a + b))"
        ).alias("cell_milli"),
    )
    agg = cells.groupBy().agg(
        F.max("n_a").alias("n_a"),
        F.max("n_b").alias("n_b"),
        F.count(F.lit(1)).cast("long").alias("n_types"),
        F.sum(((F.col("a") > 0) & (F.col("b") > 0)).cast("long")).alias(
            "n_shared"
        ),
        F.sum(((F.col("a") > 0) & (F.col("b") == 0)).cast("long")).alias(
            "n_only_a"
        ),
        F.sum(((F.col("a") == 0) & (F.col("b") > 0)).cast("long")).alias(
            "n_only_b"
        ),
        F.sum("l1_num").alias("l1_sum"),
        F.sum("cell_milli").alias("chi2_milli"),
    )
    tv = F.when(
        (F.col("n_a") > 0) & (F.col("n_b") > 0),
        F.expr("1000000 * l1_sum div (2 * n_a * n_b)"),
    )
    return agg.select(
        "n_a",
        "n_b",
        "n_types",
        "n_shared",
        "n_only_a",
        "n_only_b",
        tv.alias("tv_ppm"),
        "chi2_milli",
    )
