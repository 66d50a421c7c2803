"""Count-space corpus dissimilarities from community ecology:
Bray-Curtis (Bray & Curtis 1957), Canberra (Lance & Williams 1967)
and Morisita-Horn (Morisita 1959; Horn 1966) — the ABUNDANCE-based
family beside the share-based drift lanes (TVD/chi-square q367, PSI
q372): Bray-Curtis compares raw token counts (so corpus SIZE
differences count as dissimilarity — exactly what you want when
comparing two crawls that should be the same size), Canberra
up-weights rare types, and Morisita-Horn is the size-robust overlap
that ignores relative abundance scaling.

Exactness — all three are log-free:

  bc_ppm  = 10^6 * sum |a_i - b_i| div sum (a_i + b_i)   (ONE exact
                                                          division)
  canberra: per-type once-quantized cell
            1000 * |a_i - b_i| div (a_i + b_i), summed exactly
            (canberra_milli / n_types is the caller's normalization)
  mh_ppm  = 10^6 * 2 * sum(a_i*b_i) * Na * Nb
            div (sum(a^2) * Nb^2 + sum(b^2) * Na^2)       (ONE exact
                                                          division —
            the 1/Na^2 + 1/Nb^2 denominators cross-multiplied)

Closed forms pinned by pytest: identical corpora give bc = canberra
= 0 and mh exactly 10^6; disjoint vocabularies give bc exactly 10^6,
canberra exactly 1000 * n_types, mh exactly 0; Morisita-Horn is
EXACTLY invariant under duplicating one corpus (a -> 2a scales num
and den by 4) while Bray-Curtis is not — the property split that
justifies carrying both. A<->B symmetry is exact for all three.
Long bound: the Morisita-Horn numerator 2*10^6 * sum(ab) * Na * Nb
is the binding term — with a concentrated vocabulary it needs
Na, Nb <= ~10^3 tokens per compared slice (pre-aggregate to larger
units or sample before comparing bigger corpora); Bray-Curtis and
Canberra are safe far beyond that.

Distributed shape: one count per corpus, one full-outer type join,
one aggregate — the q367 plan with different final arithmetic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["ecological_distances"]


def ecological_distances(
    docs_a: DataFrame,
    docs_b: DataFrame,
    text_col: str = "text",
) -> DataFrame:
    """Two corpora -> ONE row (n_a, n_b, n_types, bc_ppm,
    canberra_milli, mh_ppm); an empty side surfaces NULL bc/mh."""

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

    grid = (
        _counts(docs_a, "a")
        .join(_counts(docs_b, "b"), "tok", "full")
        .select(
            F.coalesce(F.col("a"), F.lit(0).cast("long")).alias("a"),
            F.coalesce(F.col("b"), F.lit(0).cast("long")).alias("b"),
        )
    )
    agg = grid.groupBy().agg(
        F.sum("a").alias("n_a"),
        F.sum("b").alias("n_b"),
        F.count(F.lit(1)).cast("long").alias("n_types"),
        F.sum(F.abs(F.col("a") - F.col("b"))).alias("l1"),
        F.sum(
            F.expr("1000 * abs(a - b) div (a + b)")
        ).alias("canberra_milli"),
        F.sum(F.col("a") * F.col("b")).alias("sab"),
        F.sum(F.col("a") * F.col("a")).alias("saa"),
        F.sum(F.col("b") * F.col("b")).alias("sbb"),
    )
    bc = F.when(
        F.col("n_a") + F.col("n_b") > 0,
        F.expr("1000000 * l1 div (n_a + n_b)"),
    )
    mh = F.when(
        (F.col("n_a") > 0) & (F.col("n_b") > 0),
        F.expr(
            "1000000 * 2 * sab * n_a * n_b"
            " div (saa * n_b * n_b + sbb * n_a * n_a)"
        ),
    )
    return agg.select(
        "n_a",
        "n_b",
        "n_types",
        bc.alias("bc_ppm"),
        "canberra_milli",
        mh.alias("mh_ppm"),
    )
