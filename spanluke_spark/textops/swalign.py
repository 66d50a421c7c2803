"""Smith-Waterman local alignment over token sequences (Smith &
Waterman 1981) — the quote/excerpt detector beside the global edit
distance of the WER lane (q320) and the winnowing containment lane:
WER charges every token of both sequences, so a clean 10-token quote
inside two long unrelated pages scores terribly; local alignment
finds the best-scoring ISLAND and ignores everything outside it.

Integer scoring MATCH = +2, MISMATCH = -1, GAP = -1 (the classic
2/-1/-1 scheme); score 0 is the local-alignment floor. The DP is one
max-plus fold in the WER lane's shape — slot j covers the ref prefix
of length j-1, the zero row is the init, and per hypothesis token:

  cand[1]    = 0                               (H[i][0] = 0)
  cand[j>=2] = greatest(0, old[j] - 1,
                        old[j-1] + (ref[j-1] == c ? 2 : -1))
  new[j]     = max_{i<=j}(cand[i] - (j-i))     (in-row gap chain)

The in-row dependency new[j] = max(cand[j], new[j-1] - 1) unrolls by
the monotone-row trick: new[j] + j = prefix-max of (cand[i] + i), so
one ``transform`` per token replaces the loop. The clamp at 0 lives
inside cand, so new[j] >= cand[j] >= 0 needs no second clamp. The
local-alignment score is the max over ALL cells; the fold carries a
(row, best) struct so no second pass is needed.

sw_ppm = score * 10^6 div (2 * min(h_len, r_len)) normalizes by the
perfect-quote ceiling (every token of the shorter side matched); an
empty side surfaces NULL there and score 0.

Shuffle-free: O(H * R^2) HOF work per pair with the corpus axis
embarrassingly parallel; pairs are gated to H + R <= 600 by an
explicit filter contract (larger pairs belong to the chunked
winnowing lane).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["smith_waterman"]

MAX_TOKENS = 600


def smith_waterman(
    pairs: DataFrame,
    pair_col: str = "pair_id",
    hyp_col: str = "hyp",
    ref_col: str = "ref",
) -> DataFrame:
    """(pair_id, hyp: array<string>, ref: array<string>) ->
    (pair_id, h_len, r_len, score, sw_ppm)."""
    d = pairs.where(
        F.size(F.col(hyp_col)) + F.size(F.col(ref_col)) <= MAX_TOKENS
    ).select(
        F.col(pair_col).alias("pair_id"),
        F.col(hyp_col).alias("hyp"),
        F.col(ref_col).alias("ref"),
    )
    rlen = F.size("ref")
    zero = F.lit(0).cast("long")
    init = F.struct(
        F.transform(F.sequence(F.lit(1), rlen + 1), lambda i: zero).alias(
            "row"
        ),
        zero.alias("best"),
    )

    def step(acc: Column, c: Column) -> Column:
        old = acc["row"]
        cand = F.transform(
            F.sequence(F.lit(1), rlen + 1),
            lambda i: F.when(i == 1, zero).otherwise(
                F.greatest(
                    zero,
                    F.element_at(old, i) - 1,
                    F.element_at(old, i - 1)
                    + F.when(F.element_at(F.col("ref"), i - 1) == c, 2)
                    .otherwise(-1)
                    .cast("long"),
                )
            ),
        )
        shifted = F.transform(cand, lambda v, i: v + (i + 1).cast("long"))
        new = F.transform(
            F.sequence(F.lit(1), rlen + 1),
            lambda j: F.array_max(F.slice(shifted, 1, j)) - j.cast("long"),
        )
        return F.struct(
            new.alias("row"),
            F.greatest(acc["best"], F.array_max(new)).alias("best"),
        )

    score = F.aggregate(F.col("hyp"), init, step)["best"]
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
        ).alias("sw_ppm"),
    )
