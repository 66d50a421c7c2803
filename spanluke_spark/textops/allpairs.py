"""Exact all-pairs set-similarity join with LOSSLESS prefix filtering
(PPJoin family: Chaudhuri et al. 2006 SSJoin; Xiao et al. 2008 PPJoin;
Bayardo et al. 2007 all-pairs) — find EVERY document pair with Jaccard
similarity >= t, guaranteed complete, without enumerating all pairs.

Why this exists next to dedup.ngram_jaccard_neardup: the MinHash/df-cap
paths are PROBABILISTIC/LOSSY candidate generators (tunable recall); this
operator is the exact one — the tool for "give me every pair above t,
provably" (benchmark-contamination audits, legal-dedup evidence, recall
ground truth for tuning the LSH planner).

Prefix-filter principle: order the vocabulary by ascending document
frequency (rarest first; ties by term). A document of size n keeps only
its first ``n - ceil(t*n) + 1`` terms as its PREFIX; two documents with
J >= t MUST share a prefix term (if they disagreed on all of both
prefixes, the overlap is too small to reach t). Candidates are the
equi-join of prefixes on the term, plus the length filter
``t_den*min(n) >= t_num*max(n)``; each candidate is then verified with an
exact intersection count. The threshold is a RATIONAL t_num/t_den so every
filter and the final accept test are integer arithmetic — bit-identical in
any engine (the q119/q120 rule).

Scale shape: the df agg and the per-doc prefix window partition by doc_id
(never a global sort); the prefix join's per-term fan-out is bounded
because rare-first ordering puts LOW-df terms in prefixes (a term with df
c contributes <= c(c-1)/2 candidates, and high-df terms almost never make
a prefix); verification touches candidate pairs only.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..dedup.dedup import word_shingles

__all__ = ["doc_term_sets", "allpairs_jaccard"]


def doc_term_sets(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text", shingle: int = 3
) -> DataFrame:
    """-> (doc_id, term): the distinct word-``shingle``-gram set per doc."""
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(word_shingles(F.col(text_col), n=shingle)).alias("term"),
    )


def allpairs_jaccard(
    sets: DataFrame,
    t_num: int = 3,
    t_den: int = 5,
) -> DataFrame:
    """(doc_id, term) -> (id_a, id_b, inter, uni, jac): every pair with
    Jaccard >= t_num/t_den, exact and complete. ``jac`` is the reported
    double (round 6); every DECISION is integer-only.
    """
    sets = sets.distinct()
    sizes = sets.groupBy("doc_id").agg(F.count("*").alias("n"))
    df_by_term = sets.groupBy("term").agg(F.count("*").alias("df"))

    ranked = sets.join(df_by_term, "term").join(sizes, "doc_id")
    w = Window.partitionBy("doc_id").orderBy("df", "term")
    # prefix length n - ceil(t*n) + 1, ceil done in integers
    prefix_len = F.col("n") - F.floor(
        (t_num * F.col("n") + t_den - 1) / t_den
    ) + 1
    prefix = ranked.withColumn("pos", F.row_number().over(w)).where(
        F.col("pos") <= prefix_len
    )

    a = prefix.select(
        F.col("doc_id").alias("id_a"), F.col("term"), F.col("n").alias("na")
    )
    b = prefix.select(
        F.col("doc_id").alias("id_b"), F.col("term"), F.col("n").alias("nb")
    )
    cands = (
        a.join(b, "term")
        .where(F.col("id_a") < F.col("id_b"))
        # J >= t forces t_den*min >= t_num*max
        .where(
            t_den * F.least(F.col("na"), F.col("nb"))
            >= t_num * F.greatest(F.col("na"), F.col("nb"))
        )
        .select("id_a", "id_b", "na", "nb")
        .distinct()
    )

    sa = sets.select(F.col("doc_id").alias("id_a"), "term")
    sb = sets.select(F.col("doc_id").alias("id_b"), "term")
    inter = (
        cands.join(sa, "id_a")
        .join(sb, ["id_b", "term"])
        .groupBy("id_a", "id_b", "na", "nb")
        .agg(F.count("*").alias("inter"))
    )
    return (
        inter.withColumn("uni", F.col("na") + F.col("nb") - F.col("inter"))
        .where(t_den * F.col("inter") >= t_num * F.col("uni"))
        .select(
            "id_a",
            "id_b",
            "inter",
            "uni",
            F.round(F.col("inter") / F.col("uni"), 6).alias("jac"),
        )
    )


def single_link_clusters(
    sets: DataFrame,
    thresholds: list[tuple[int, int]],
    all_ids: DataFrame | None = None,
) -> DataFrame:
    """Single-link (connected-components) clustering of the exact
    similarity graph at several Jaccard thresholds — the dendrogram cuts
    a FineWeb-style near-dup analysis reports. -> (doc_id, cluster_<n>_<d>
    per threshold), cluster id = min doc id of the component, singletons
    label themselves.

    Nesting invariant (tested): every cluster at a HIGHER threshold is
    contained in one cluster at any lower threshold — single-link merges
    monotonically as t drops. Composition: allpairs_jaccard (lossless
    candidate generation) feeds canon.cc.connected_components (the same
    CC that powers production dedup survivor selection).
    """
    from ..canon.cc import connected_components

    ids = (all_ids or sets.select("doc_id")).select("doc_id").distinct()
    out = ids
    for t_num, t_den in thresholds:
        pairs = allpairs_jaccard(sets, t_num=t_num, t_den=t_den).select(
            F.col("id_a").alias("src"), F.col("id_b").alias("dst")
        )
        labels = connected_components(pairs).select(
            F.col("node").alias("doc_id"),
            F.col("component").alias(f"cluster_{t_num}_{t_den}"),
        )
        out = out.join(labels, "doc_id", "left").withColumn(
            f"cluster_{t_num}_{t_den}",
            F.coalesce(F.col(f"cluster_{t_num}_{t_den}"), F.col("doc_id")),
        )
    return out
