"""Lexical-richness constants: Yule's characteristic K (Yule 1944)
and Simpson's repeat-rate D (Simpson 1949) from the token frequency
spectrum — the single-number "how repetitive is this corpus slice"
signals. Template-generated boilerplate and spun content push K and D
up an order of magnitude over natural prose, which makes them cheap
crawl-quality features next to the growth-curve view (Heaps q305) and
the frequency-of-frequencies view (Good-Turing q313).

With N tokens, type frequencies f, and S2 = sum f^2:

  K = 10^4 * (S2 - N) / N^2        -> k_milli = 10^7 (S2-N) div N^2
  D = sum f(f-1) / (N (N-1))       -> d_ppm = 10^6 sum f(f-1)
                                              div (N (N-1))

both exact integer rationals with one trunc each (K is Simpson's D
times 10^4 up to the N vs N-1 denominator — their near-identity
k_milli ~ 10*d_ppm*(N-1)/N is float-gated). The spectrum columns
(vocab size, hapax V1, dis legomena V2) are exact counts. Closed
forms pinned by pytest: all-distinct tokens give exactly K = D = 0
(S2 = N); a single repeated type gives exactly D = 10^6 and
k_milli = 10^7 (N^2-N) div N^2. Long-bound contract: S2 <= N^2 needs
N <= ~2*10^7 tokens per evaluated slice for the 10^7 scaling.

Distributed shape: one explode, one (token) aggregate, one global
aggregate — the q305/q313 plan with different final arithmetic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["lexical_richness"]


def lexical_richness(
    docs: DataFrame,
    text_col: str = "text",
) -> DataFrame:
    """documents(text) -> ONE row (n_tokens, v_types, v1_hapax,
    v2_dis, s2, k_milli, d_ppm); empty corpus or N < 2 surfaces
    NULL statistics."""
    toks = docs.select(
        F.explode(
            F.filter(F.split(F.col(text_col), " "), lambda t: t != "")
        ).alias("tok")
    )
    freq = toks.groupBy("tok").agg(
        F.count(F.lit(1)).cast("long").alias("f")
    )
    agg = freq.groupBy().agg(
        F.coalesce(F.sum("f"), F.lit(0).cast("long")).alias("n_tokens"),
        F.count(F.lit(1)).cast("long").alias("v_types"),
        F.sum((F.col("f") == 1).cast("long")).alias("v1_hapax"),
        F.sum((F.col("f") == 2).cast("long")).alias("v2_dis"),
        F.sum(F.col("f") * F.col("f")).alias("s2"),
        F.sum(F.col("f") * (F.col("f") - 1)).alias("rep"),
    )
    k = F.when(
        F.col("n_tokens") >= 2,
        F.expr("10000000 * (s2 - n_tokens) div (n_tokens * n_tokens)"),
    )
    d = F.when(
        F.col("n_tokens") >= 2,
        F.expr("1000000 * rep div (n_tokens * (n_tokens - 1))"),
    )
    return agg.select(
        "n_tokens",
        F.coalesce("v_types", F.lit(0)).alias("v_types"),
        F.coalesce("v1_hapax", F.lit(0)).alias("v1_hapax"),
        F.coalesce("v2_dis", F.lit(0)).alias("v2_dis"),
        F.coalesce("s2", F.lit(0)).alias("s2"),
        k.alias("k_milli"),
        d.alias("d_ppm"),
    )
