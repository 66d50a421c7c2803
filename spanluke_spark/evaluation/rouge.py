"""ROUGE-L (Lin 2004, "ROUGE: A Package for Automatic Evaluation of
Summaries", §3) — LCS-based candidate/reference overlap, the standard
summarization/compression eval beside the n-gram BLEU lane (q301).

LCS by the classic DP row fold, made shuffle-free and HOF-native with
the monotone-row identity: because every LCS DP row is non-decreasing,

  new[j] = max( old[j],
                max_{i <= j, ref[i] == c} (old[i-1] + 1) )

i.e. the usual ``new[j-1]`` dependency collapses into a prefix-max of
match candidates, so one ``transform`` per candidate token replaces the
inner sequential loop (prefix-max via ``array_max(slice(...))`` —
O(R^2) per token, exact, and identical on the DuckDB side). Fold is
over candidate tokens; the accumulator is the DP row (array<long>,
length R+1, row[1] = 0-prefix sentinel).

Scores, all exact integers / rationals:

  lcs                       longest common subsequence length
  p = lcs/C, r = lcs/R      precision / recall (ppm, trunc)
  F1 = 2·lcs / (C + R)      Lin's F with beta = 1 — carried as the
                            exact rational (f_num, f_den) + trunc-ppm

Empty candidates or references are dropped (score undefined).
Distributed shape: one projection, no shuffle; per-pair cost O(C·R^2)
— for eval-sized texts (sentences/summaries) this is model-sized work
per row, and the corpus axis is embarrassingly parallel.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["rouge_l"]


def rouge_l(
    pairs: DataFrame,
    pair_col: str = "pair_id",
    cand_col: str = "cand",
    ref_col: str = "ref",
) -> DataFrame:
    """(pair_id, cand: array<string>, ref: array<string>) ->
    (pair_id, c_len, r_len, lcs, p_ppm, r_ppm, f_num, f_den, f_ppm)."""
    d = pairs.where(
        (F.size(F.col(cand_col)) > 0) & (F.size(F.col(ref_col)) > 0)
    ).select(
        F.col(pair_col).alias("pair_id"),
        F.col(cand_col).alias("cand"),
        F.col(ref_col).alias("ref"),
    )

    rlen = F.size("ref")
    # row slots 1..R+1; row[j+1] covers ref[1..j], row[1] the 0-sentinel
    init = F.transform(
        F.sequence(F.lit(1), rlen + 1), lambda j: F.lit(0).cast("long")
    )

    def step(old: Column, c: Column) -> Column:
        # match candidate at ref position i (row slot i+1): old[i] + 1
        # (old[i] = row slot of the (i-1)-prefix), else LONG_MIN guard
        cands = F.transform(
            F.sequence(F.lit(1), rlen),
            lambda i: F.when(
                F.element_at(F.col("ref"), i) == c,
                F.element_at(old, i) + F.lit(1).cast("long"),
            ).otherwise(F.lit(-1).cast("long")),
        )
        return F.transform(
            F.sequence(F.lit(1), rlen + 1),
            lambda j: F.when(j == 1, F.lit(0).cast("long")).otherwise(
                F.greatest(
                    F.element_at(old, j),
                    F.array_max(F.slice(cands, 1, j - 1)),
                )
            ),
        )

    row = F.aggregate(F.col("cand"), init, step)
    lcs = F.element_at(row, rlen + 1)

    out = d.select(
        "pair_id",
        F.size("cand").cast("long").alias("c_len"),
        rlen.cast("long").alias("r_len"),
        lcs.alias("lcs"),
    )
    return out.select(
        "pair_id",
        "c_len",
        "r_len",
        "lcs",
        F.expr("lcs * 1000000 div c_len").alias("p_ppm"),
        F.expr("lcs * 1000000 div r_len").alias("r_ppm"),
        (F.col("lcs") * 2).alias("f_num"),
        (F.col("c_len") + F.col("r_len")).alias("f_den"),
        F.expr("lcs * 2 * 1000000 div (c_len + r_len)").alias("f_ppm"),
    )
