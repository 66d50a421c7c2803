"""Needleman-Wunsch global alignment over token sequences (Needleman
& Wunsch 1970) — the END-TO-END companion of the Smith-Waterman local
lane (textops/swalign.py, q338): local alignment finds the best
island and ignores the rest; global alignment charges every token of
BOTH sequences, which is the right score for near-duplicate page
VERSIONS (template drift, boilerplate edits) where the whole body
must line up, not just a quote.

Same integer scheme (MATCH +2, MISMATCH -1, GAP -1) and the same
single max-plus fold shape as swalign — two changes make it global:
the init row carries the ref-axis gap penalties (slot j starts at
-(j-1)) and there is NO zero clamp anywhere:

  cand[1]    = old[1] - 1                   (hyp token vs empty ref)
  cand[j>=2] = greatest(old[j] - 1,
                        old[j-1] + (ref[j-1] == c ? 2 : -1))
  new[j]     = max_{i<=j}(cand[i] - (j-i))  (in-row gap chain,
                                             prefix-max unroll)

The score is the LAST slot of the final row (not max-over-cells, so
no best-carrying struct is needed). nw_ppm normalizes by the
perfect ceiling 2*min(h_len, r_len); an empty side scores exactly
-(other length) with NULL ppm. Identity pairs score exactly 2*len;
SW >= max(NW, 0) on every pair (a global alignment is one candidate
island) — both pytest-gated against the in-repo smith_waterman.
Pairs gate to H + R <= MAX_TOKENS; corpus axis embarrassingly
parallel, shuffle-free, no Python.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["needleman_wunsch"]

MAX_TOKENS = 600


def needleman_wunsch(
    pairs: DataFrame,
    pair_col: str = "pair_id",
    hyp_col: str = "hyp",
    ref_col: str = "ref",
) -> DataFrame:
    """(pair_id, hyp: array<string>, ref: array<string>) ->
    (pair_id, h_len, r_len, score, nw_ppm)."""
    d = pairs.where(
        F.size(F.col(hyp_col)) + F.size(F.col(ref_col)) <= MAX_TOKENS
    ).select(
        F.col(pair_col).alias("pair_id"),
        F.col(hyp_col).alias("hyp"),
        F.col(ref_col).alias("ref"),
    )
    rlen = F.size("ref")
    init = F.transform(
        F.sequence(F.lit(1), rlen + 1),
        lambda i: (1 - i).cast("long"),
    )

    def step(old: Column, c: Column) -> Column:
        cand = F.transform(
            F.sequence(F.lit(1), rlen + 1),
            lambda i: F.when(
                i == 1, F.element_at(old, 1) - 1
            ).otherwise(
                F.greatest(
                    F.element_at(old, i) - 1,
                    F.element_at(old, i - 1)
                    + F.when(F.element_at(F.col("ref"), i - 1) == c, 2)
                    .otherwise(-1)
                    .cast("long"),
                )
            ),
        )
        shifted = F.transform(cand, lambda v, i: v + (i + 1).cast("long"))
        return F.transform(
            F.sequence(F.lit(1), rlen + 1),
            lambda j: F.array_max(F.slice(shifted, 1, j)) - j.cast("long"),
        )

    score = F.element_at(
        F.aggregate(F.col("hyp"), init, step), rlen + 1
    )
    out = d.select(
        "pair_id",
        F.size("hyp").cast("long").alias("h_len"),
        rlen.cast("long").alias("r_len"),
        score.alias("score"),
    )
    return out.select(
        "*",
        F.when(
            F.least(F.col("h_len"), F.col("r_len")) > 0,
            F.expr("score * 1000000 div (2 * least(h_len, r_len))"),
        ).alias("nw_ppm"),
    )
