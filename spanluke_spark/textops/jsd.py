"""Jensen-Shannon divergence between two vocabulary distributions
(Lin 1991) — the SYMMETRIC, always-finite drift score that completes
the vocabulary-shift family: the smoothed bidirectional KL lane
(q275) needs an arbitrary smoothing floor to survive zero cells,
while JSD's mixture midpoint M = (P+Q)/2 is finite by construction,
so crawl-snapshot drift can be compared WITHOUT a smoothing
hyperparameter. Bounded in [0, ln 2] nats.

Exactness discipline: with token counts pi (total NP) and qi (total
NQ), the midpoint ratios reduce to INTEGER arguments —

  ln(P_i / M_i) = ln( 2*pi*NQ / (pi*NQ + qi*NP) )
  ln(Q_i / M_i) = ln( 2*qi*NP / (pi*NQ + qi*NP) )

— each quantized ONCE to round-ln-ppm (q307/q324 discipline); the
count-weighted sums are exact integers in NP- resp. NQ-scaled
1e6-nat units and the final

  jsd_ppm = (num_p * NQ + num_q * NP) div (2 * NP * NQ)

is one truncating division on a non-negative value (JSD >= 0; a
zero cell on one side contributes exactly ln 2 to the other, the
0*ln0 limit contributes 0). Identical distributions give EVERY cell
ratio exactly 1 -> jsd_ppm == 0 with no float luck; fully disjoint
vocabularies give every cell exactly round(ln 2 * 1e6) -> jsd_ppm ==
693147. Overflow: num_p <= NP * 693148, times NQ -> safe past 10^5
tokens per side.

Distributed shape: one (token) groupBy folding the side axis into
conditional sums (no pivot shuffle), one 1-row broadcast of totals,
one final aggregate — corpus-linear, identical to the LLR lane.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["jsd"]


def _lnppm(num: Column, den: Column) -> Column:
    return F.round(F.log(num / den) * 1_000_000).cast("long")


def jsd(
    tokens: DataFrame, fg_col: str = "fg", token_col: str = "token"
) -> DataFrame:
    """(fg: boolean, token) one row per occurrence -> ONE row
    (np_total, nq_total, n_tokens, num_p, num_q, jsd_ppm)."""
    t = tokens.select(
        F.col(fg_col).alias("fg"), F.col(token_col).alias("token")
    )
    counts = t.groupBy("token").agg(
        F.sum(F.col("fg").cast("int")).cast("long").alias("p"),
        F.sum((~F.col("fg")).cast("int")).cast("long").alias("q"),
    )
    totals = t.groupBy().agg(
        F.sum(F.col("fg").cast("int")).cast("long").alias("np_total"),
        F.sum((~F.col("fg")).cast("int")).cast("long").alias("nq_total"),
    )
    x = counts.crossJoin(F.broadcast(totals))
    mix = F.col("p") * F.col("nq_total") + F.col("q") * F.col("np_total")
    cell_p = F.when(
        F.col("p") > 0,
        F.col("p") * _lnppm(2 * F.col("p") * F.col("nq_total"), mix),
    ).otherwise(F.lit(0).cast("long"))
    cell_q = F.when(
        F.col("q") > 0,
        F.col("q") * _lnppm(2 * F.col("q") * F.col("np_total"), mix),
    ).otherwise(F.lit(0).cast("long"))
    agg = x.groupBy().agg(
        F.max("np_total").alias("np_total"),
        F.max("nq_total").alias("nq_total"),
        F.count(F.lit(1)).cast("long").alias("n_tokens"),
        F.sum(cell_p).alias("num_p"),
        F.sum(cell_q).alias("num_q"),
    )
    return agg.select(
        "np_total",
        "nq_total",
        "n_tokens",
        "num_p",
        "num_q",
        # sign-split trunc: the real JSD is >= 0, but quantized cells
        # can dip a few ppm-units negative near identity, where Spark
        # div (trunc) and DuckDB // (floor) would disagree
        F.when(
            F.expr("num_p * nq_total + num_q * np_total") < 0,
            -F.expr(
                "abs(num_p * nq_total + num_q * np_total)"
                " div (2 * np_total * nq_total)"
            ),
        )
        .otherwise(
            F.expr(
                "abs(num_p * nq_total + num_q * np_total)"
                " div (2 * np_total * nq_total)"
            )
        )
        .alias("jsd_ppm"),
    )
