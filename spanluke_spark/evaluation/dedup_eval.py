"""Dedup-recall evaluation: measure the PROBABILISTIC near-dup path
(MinHash+LSH candidate generation) against the EXACT ground truth (the
lossless prefix-filtered all-pairs join) on the same corpus — the audit a
production dedup pipeline owes its operators before anyone trusts an LSH
parameterization ("what fraction of true J >= t pairs does the banding
actually surface?"). The q113 LSH planner predicts this curve from the
(bands, rows) S-shape; this operator MEASURES it.

Both sides are existing engine operators (dedup.minhash_lsh_pairs with
portable hashes; textops.allpairs.allpairs_jaccard), so the report is one
left-semi join plus three counts — and the SQL oracle replays the entire
pipeline on both sides, signatures to verdict.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..dedup.dedup import minhash_lsh_pairs
from ..textops.allpairs import allpairs_jaccard, doc_term_sets

__all__ = ["lsh_recall_report"]


def lsh_recall_report(
    docs: DataFrame,
    t_num: int = 3,
    t_den: int = 5,
    shingle: int = 3,
    num_hashes: int = 32,
    bands: int = 8,
    portable: bool = True,
) -> DataFrame:
    """-> 1 row (n_true, n_candidates, n_hit, recall, precision):
    LSH candidate pairs vs exact Jaccard >= t_num/t_den truth.

    recall = found true pairs / all true pairs (the number that matters —
    misses are permanent duplicates in the corpus); precision counts how
    much of the candidate volume the verify stage must pay to filter.
    """
    truth = allpairs_jaccard(
        doc_term_sets(docs, shingle=shingle), t_num=t_num, t_den=t_den
    ).select("id_a", "id_b")
    cand = minhash_lsh_pairs(
        docs,
        n=shingle,
        num_hashes=num_hashes,
        bands=bands,
        verify_threshold=None,
        portable=portable,
    ).select("id_a", "id_b")

    hits = truth.join(cand, ["id_a", "id_b"], "left_semi")
    counts = (
        truth.agg(F.count("*").alias("n_true"))
        .crossJoin(cand.agg(F.count("*").alias("n_candidates")))
        .crossJoin(hits.agg(F.count("*").alias("n_hit")))
    )
    return counts.select(
        "n_true",
        "n_candidates",
        "n_hit",
        F.round(F.try_divide(F.col("n_hit"), F.col("n_true")), 6).alias("recall"),
        F.round(
            F.try_divide(F.col("n_hit"), F.col("n_candidates")), 6
        ).alias("precision"),
    )


def bcubed(
    items: DataFrame,
    id_col: str = "id",
    gold_col: str = "gold",
    sys_col: str = "sys",
) -> DataFrame:
    """B-cubed clustering evaluation (Bagga & Baldwin 1998; the Amigó et
    al. 2009 study's recommended extrinsic metric) of a system
    clustering against gold — per ITEM precision/recall averaged, so a
    giant wrong merge is punished in proportion to the items it swallows
    (pairwise F and purity are not; this is the standard scorecard for
    dedup survivor clusters and sameAs canonicalization).

        P(e) = |C_sys(e) ∩ C_gold(e)| / |C_sys(e)|,  R(e) symmetric
        precision = mean_e P(e),  recall = mean_e R(e),  f1 harmonic

    Exact relational closed form with NO pair join: every item in the
    (sys, gold) contingency CELL shares the same intersection size
    s_cg, so precision = (1/N) Σ_cells s_cg² / n_sys — one cell
    aggregate, two cluster-size joins, one sum. All counts exact
    integers; the three output ratios are the only floats. Cost is
    |cells| ≤ |items| rows after one groupBy: corpus-scale safe."""
    t = items.select(
        F.col(id_col).alias("id"),
        F.col(gold_col).alias("g"),
        F.col(sys_col).alias("s"),
    )
    cells = t.groupBy("g", "s").agg(F.count(F.lit(1)).alias("n_cell"))
    gold_sz = cells.groupBy("g").agg(F.sum("n_cell").alias("n_gold"))
    sys_sz = cells.groupBy("s").agg(F.sum("n_cell").alias("n_sys"))
    j = cells.join(gold_sz, "g").join(sys_sz, "s")
    agg = j.agg(
        F.sum("n_cell").alias("n_items"),
        F.sum(
            F.col("n_cell") * F.col("n_cell") / F.col("n_sys")
        ).alias("_psum"),
        F.sum(
            F.col("n_cell") * F.col("n_cell") / F.col("n_gold")
        ).alias("_rsum"),
    )
    p = F.col("_psum") / F.col("n_items")
    r = F.col("_rsum") / F.col("n_items")
    f1 = F.when(p + r > 0, 2 * p * r / (p + r)).otherwise(F.lit(0.0))
    return agg.select(
        "n_items",
        F.round(p, 6).alias("precision"),
        F.round(r, 6).alias("recall"),
        F.round(f1, 6).alias("f1"),
    )
