"""Dunning log-likelihood-ratio keyword extraction (Dunning 1993,
"Accurate Methods for the Statistics of Surprise and Coincidence") —
which tokens are OVER-represented in a foreground slice vs the
background corpus? The statistically honest replacement for raw
frequency ratios on sparse counts, and the classic surprise score for
domain-term mining beside TF-IDF (q63) and TextRank (q268): G² is
valid at counts where chi-squared (q281) breaks down.

Per token, the 2x2 table is (a, c = NA - a) foreground vs
(b, d = NB - b) background; with column totals ct1 = a + b,
ct2 = c + d and N = NA + NB,

  G² = 2 · [ a·ln(aN/(NA·ct1)) + b·ln(bN/(NB·ct1))
           + c·ln(cN/(NA·ct2)) + d·ln(dN/(NB·ct2)) ]

Zero cells contribute 0 (the O·ln(O/E) limit). Each ln ratio is
quantized ONCE to round(ln · 10^6) per cell (the repo's ln-ppm
discipline, same as q307's entropy lane); the weighted cell sum and
the doubling are exact integers, so llr_ppm = G² · 10^6 exactly on
the quantized lns. Direction is decided exactly:
enriched = a·NB > b·NA (cross-multiplied foreground rate test).

Distributed shape: one token explode, one (token) groupBy with
conditional sums (the side axis folds into the agg — no pivot
shuffle), one broadcast of the 1-row totals, top-k by
(llr_ppm DESC, token ASC). Corpus-linear; the keyword table is
model-sized.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["llr_keywords"]


def _lnppm(num: Column, den: Column) -> Column:
    return F.round(F.log(num / den) * 1_000_000).cast("long")


def llr_keywords(
    tokens: DataFrame,
    top_k: int = 30,
    fg_col: str = "fg",
    token_col: str = "token",
) -> DataFrame:
    """(fg: boolean, token) one row per occurrence -> top_k rows:
    (token, a, b, llr_ppm, enriched, rnk) by (llr_ppm DESC, token)."""
    t = tokens.select(
        F.col(fg_col).alias("fg"), F.col(token_col).alias("token")
    )
    counts = t.groupBy("token").agg(
        F.sum(F.col("fg").cast("int")).cast("long").alias("a"),
        F.sum((~F.col("fg")).cast("int")).cast("long").alias("b"),
    )
    totals = t.groupBy().agg(
        F.sum(F.col("fg").cast("int")).cast("long").alias("na"),
        F.sum((~F.col("fg")).cast("int")).cast("long").alias("nb"),
    )
    x = counts.crossJoin(F.broadcast(totals))

    n = F.col("na") + F.col("nb")
    c = F.col("na") - F.col("a")
    d = F.col("nb") - F.col("b")
    ct1 = F.col("a") + F.col("b")
    ct2 = c + d

    def cell(o: Column, rt: Column, ct: Column) -> Column:
        return F.when(o > 0, o * _lnppm(o * n, rt * ct)).otherwise(
            F.lit(0).cast("long")
        )

    llr = 2 * (
        cell(F.col("a"), F.col("na"), ct1)
        + cell(F.col("b"), F.col("nb"), ct1)
        + cell(c, F.col("na"), ct2)
        + cell(d, F.col("nb"), ct2)
    )
    scored = x.select(
        "token",
        "a",
        "b",
        llr.alias("llr_ppm"),
        (F.col("a") * F.col("nb") > F.col("b") * F.col("na")).alias(
            "enriched"
        ),
    )
    # distributed TakeOrdered first (per-partition top-k + merge), so
    # the rank window only ever sees top_k rows — never the full vocab
    top = scored.orderBy(F.col("llr_ppm").desc(), F.col("token").asc()).limit(
        top_k
    )
    w = Window.orderBy(F.col("llr_ppm").desc(), F.col("token").asc())
    return top.withColumn("rnk", F.row_number().over(w))
