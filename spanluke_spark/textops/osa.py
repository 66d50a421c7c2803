"""Optimal-string-alignment (restricted Damerau-Levenshtein) distance
(Damerau 1964; Levenshtein 1966; the OSA restriction per Boytsov
2011) over token sequences — edit distance where swapping two
ADJACENT symbols costs 1, the dominant typo/OCR error class plain
Levenshtein (q147, the builtin) double-charges: "the court of appeal"
vs "the court appeal of" is one transposition, not two edits.
Semantics pinned: OSA, not unrestricted Damerau-Levenshtein — no
substring is edited after a transposition, so OSA("ca","abc") = 3
(true DL = 2) and the triangle inequality may fail; both are
pytest-gated.

The DP is the WER lane's single min-plus fold (evaluation/wer.py)
with the accumulator widened to a STRUCT carrying TWO rows — the
transposition candidate reads d[i-2][j-2], so the fold state is
(prevprev row, prev row, prev hyp symbol, step counter):

  cand[1]    = p[1] + 1
  cand[j>=2] = least(p[j] + 1,
                     p[j-1] + (ref[j-1] == c ? 0 : 1),
                     t >= 2 AND j >= 3 AND ref[j-2] == c
                            AND ref[j-1] == pc ? pp[j-2] + 1 : BIG)
  new[j]     = min_{i<=j}(cand[i] + (j - i))     -- the ROUGE-L
                                                 -- prefix-min unroll

All arithmetic is plain longs (unit costs, no packing needed); the
in-row deletion chain unrolls shuffle-free exactly as in wer(). Empty
hypothesis scores r_len, empty reference scores h_len (no drop).
Inputs are gated to h+r <= MAX_TOKENS via an explicit filter
contract. The corpus axis stays embarrassingly parallel — one Arrow-
free JVM stage, no shuffle, no Python.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["osa_distance"]

BIG = 1 << 40
MAX_TOKENS = 400


def osa_distance(
    pairs: DataFrame,
    pair_col: str = "pair_id",
    hyp_col: str = "hyp",
    ref_col: str = "ref",
) -> DataFrame:
    """(pair_id, hyp: array<string>, ref: array<string>) ->
    (pair_id, h_len, r_len, dist, osa_ppm = dist*1e6 div
    max(h_len, r_len); both-empty -> 0 distance, NULL ppm)."""
    d = pairs.where(
        F.size(F.col(hyp_col)) + F.size(F.col(ref_col)) <= MAX_TOKENS
    ).select(
        F.col(pair_col).alias("pair_id"),
        F.col(hyp_col).alias("hyp"),
        F.col(ref_col).alias("ref"),
    )
    rlen = F.size("ref")
    row0 = F.transform(
        F.sequence(F.lit(1), rlen + 1), lambda i: (i - 1).cast("long")
    )
    init = F.struct(
        row0.alias("pp"),
        row0.alias("p"),
        F.lit("").alias("pc"),
        F.lit(0).cast("long").alias("t"),
    )

    def step(acc: Column, c: Column) -> Column:
        p = acc.getField("p")
        pp = acc.getField("pp")
        pc = acc.getField("pc")
        t = acc.getField("t")
        cand = F.transform(
            F.sequence(F.lit(1), rlen + 1),
            lambda j: F.when(
                j == 1, F.element_at(p, 1) + 1
            ).otherwise(
                F.least(
                    F.element_at(p, j) + 1,
                    F.element_at(p, j - 1)
                    + F.when(
                        F.element_at(F.col("ref"), j - 1) == c, 0
                    )
                    .otherwise(1)
                    .cast("long"),
                    F.when(
                        (t >= 1)
                        & (j >= 3)
                        & (F.element_at(F.col("ref"), j - 2) == c)
                        & (F.element_at(F.col("ref"), j - 1) == pc),
                        F.element_at(pp, j - 2) + 1,
                    ).otherwise(F.lit(BIG).cast("long")),
                )
            ),
        )
        shifted = F.transform(
            cand, lambda v, i: v - (i + 1).cast("long")
        )
        new = F.transform(
            F.sequence(F.lit(1), rlen + 1),
            lambda j: F.array_min(F.slice(shifted, 1, j))
            + j.cast("long"),
        )
        return F.struct(
            p.alias("pp"), new.alias("p"), c.alias("pc"),
            (t + 1).alias("t"),
        )

    fin = F.aggregate(F.col("hyp"), init, step)
    dist = F.element_at(fin.getField("p"), rlen + 1)
    out = d.select(
        "pair_id",
        F.size("hyp").cast("long").alias("h_len"),
        rlen.cast("long").alias("r_len"),
        dist.alias("dist"),
    )
    ppm = F.when(
        F.greatest("h_len", "r_len") > 0,
        F.expr("dist * 1000000 div greatest(h_len, r_len)"),
    )
    return out.select("*", ppm.alias("osa_ppm"))
