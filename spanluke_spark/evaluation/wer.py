"""Word error rate with operation counts — Levenshtein over token
sequences with the (substitutions, deletions, insertions) breakdown,
the ASR/OCR-style transcript QA beside chrF (q318), BLEU (q301) and
ROUGE-L (q315): WER = (S + D + I) / R over the reference length.

Alignment-count semantics are PINNED: among all minimum-distance
alignments, report the lexicographically minimal (d, s, dd, ii) —
fewest substitutions first, then fewest deletions (ii = d - s - dd is
then forced, but participates for full determinism).

The whole DP is one min-plus fold on PACKED integer keys:

  key = d·2^30 + s·2^20 + dd·2^10 + ii

Integer comparison of keys IS the lexicographic comparison of the
vectors, and integer addition IS component-wise addition while every
field stays < 1024 — guaranteed because each edit bumps d and exactly
one of s/dd/ii, so every field is <= d <= H + R (inputs are gated to
H + R <= 1000; larger pairs raise via an explicit filter contract).

The inner sequential dependency new[j] = min(cand[j], new[j-1] + DEL)
unrolls exactly like the ROUGE-L monotone-row trick: new[j] - j·DEL =
prefix-min of (cand[i] - i·DEL), so one ``transform`` per hypothesis
token replaces the in-row loop — shuffle-free, HOF-native, O(H·R^2)
per pair with the corpus axis embarrassingly parallel.

  cand[1]     = old[1] + INS
  cand[i>=2]  = least(old[i] + INS,
                      old[i-1] + (ref[i-1] == c ? 0 : SUB))
  new[j]      = min_{i<=j}(cand[i] + (j-i)·DEL)

Rows with an empty reference are dropped (WER undefined); an empty
hypothesis is legal and scores R deletions.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["wer"]

SUB = 1 << 30 | 1 << 20
DEL = 1 << 30 | 1 << 10
INS = 1 << 30 | 1

MAX_TOKENS = 1000  # H + R bound keeping every packed field < 1024


def wer(
    pairs: DataFrame,
    pair_col: str = "pair_id",
    hyp_col: str = "hyp",
    ref_col: str = "ref",
) -> DataFrame:
    """(pair_id, hyp: array<string>, ref: array<string>) ->
    (pair_id, h_len, r_len, dist, subs, dels, ins, wer_ppm)."""
    d = pairs.where(F.size(F.col(ref_col)) > 0).where(
        F.size(F.col(hyp_col)) + F.size(F.col(ref_col)) <= MAX_TOKENS
    ).select(
        F.col(pair_col).alias("pair_id"),
        F.col(hyp_col).alias("hyp"),
        F.col(ref_col).alias("ref"),
    )

    rlen = F.size("ref")
    # row slot i covers the ref prefix of length i-1; t=0 row is all
    # deletions: slot i = (i-1)·DEL
    init = F.transform(
        F.sequence(F.lit(1), rlen + 1),
        lambda i: ((i - 1).cast("long")) * F.lit(DEL).cast("long"),
    )

    def step(old: Column, c: Column) -> Column:
        cand = F.transform(
            F.sequence(F.lit(1), rlen + 1),
            lambda i: F.when(i == 1, F.element_at(old, 1) + INS).otherwise(
                F.least(
                    F.element_at(old, i) + INS,
                    F.element_at(old, i - 1)
                    + F.when(F.element_at(F.col("ref"), i - 1) == c, 0)
                    .otherwise(SUB)
                    .cast("long"),
                )
            ),
        )
        # transform's index is 0-based; slot numbers are 1-based
        shifted = F.transform(
            cand,
            lambda v, i: v - (i + 1).cast("long") * F.lit(DEL).cast("long"),
        )
        return F.transform(
            F.sequence(F.lit(1), rlen + 1),
            lambda j: F.array_min(F.slice(shifted, 1, j))
            + j.cast("long") * F.lit(DEL).cast("long"),
        )

    key = F.element_at(F.aggregate(F.col("hyp"), init, step), rlen + 1)

    out = d.select(
        "pair_id",
        F.size("hyp").cast("long").alias("h_len"),
        rlen.cast("long").alias("r_len"),
        key.alias("key"),
    ).select(
        "pair_id",
        "h_len",
        "r_len",
        F.expr("key div 1073741824").alias("dist"),
        F.expr("key div 1048576 % 1024").alias("subs"),
        F.expr("key div 1024 % 1024").alias("dels"),
        F.expr("key % 1024").alias("ins"),
    )
    return out.withColumn("wer_ppm", F.expr("dist * 1000000 div r_len"))
