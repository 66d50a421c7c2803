"""Entity co-occurrence statistics: PMI-weighted relatedness edges.

Before a KG has typed relations it has co-occurrence: entities mentioned
in the same document are related, and pointwise mutual information
(Church & Hanks 1990) separates signal pairs from frequency artifacts.
The PMI edge table is the standard untyped-relation layer industrial KGs
keep beside the typed triples (entity-relatedness features, link-
prediction priors, alias disambiguation context).

Relational decomposition (all equi-joins and reduced aggregates):

    per-doc DISTINCT entity list      (dedupe mentions first — one shuffle)
    pair enumeration: self-join on doc_id with ``e_a < e_b``
    pair doc-counts, entity doc-counts, corpus size N (1-row broadcast)
    pmi = ln(N · c_ab / (c_a · c_b))

The self-join on doc_id is the one skew hazard: a page mentioning k
entities emits k·(k-1)/2 pairs. ``max_entities_per_doc`` caps k by
dropping entity-stuffed outlier docs (directory pages, tag clouds) —
the same max_df move n-gram dedup uses (dedup/dedup.py) — so per-doc
fan-out is bounded by a constant, not by the worst page on the web.

Reference analogue: mention extraction emits (url, surface/label) rows
(pipeline.py); this is their pairwise read-side consumer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def cooccurrence_pmi(
    mentions: DataFrame,
    doc_col: str = "doc_id",
    ent_col: str = "entity",
    min_pair_docs: int = 1,
    max_entities_per_doc: int = 64,
) -> DataFrame:
    """(doc_id, entity) mention rows -> (e_a, e_b, n_docs, pmi) with
    e_a < e_b; ``pmi`` in nats. Docs carrying more than
    ``max_entities_per_doc`` distinct entities are dropped whole (their
    quadratic pair fan-out would dominate the shuffle; they are noise
    pages, not evidence)."""
    de = mentions.select(
        F.col(doc_col).alias("doc_id"), F.col(ent_col).alias("entity")
    ).distinct()
    doc_sizes = de.groupBy("doc_id").agg(F.count(F.lit(1)).alias("_k"))
    kept = de.join(
        doc_sizes.where(F.col("_k") <= max_entities_per_doc).select("doc_id"),
        "doc_id",
    )
    n_docs = kept.select("doc_id").distinct().agg(
        F.count(F.lit(1)).alias("_n")
    )
    ent_counts = kept.groupBy("entity").agg(F.count(F.lit(1)).alias("_c"))
    a = kept.select("doc_id", F.col("entity").alias("e_a"))
    b = kept.select("doc_id", F.col("entity").alias("e_b"))
    pairs = (
        a.join(b, "doc_id")
        .where(F.col("e_a") < F.col("e_b"))
        .groupBy("e_a", "e_b")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .where(F.col("n_docs") >= min_pair_docs)
    )
    ca = ent_counts.select(F.col("entity").alias("e_a"), F.col("_c").alias("_ca"))
    cb = ent_counts.select(F.col("entity").alias("e_b"), F.col("_c").alias("_cb"))
    return (
        pairs.join(ca, "e_a")
        .join(cb, "e_b")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "e_a",
            "e_b",
            "n_docs",
            F.log(
                F.col("n_docs").cast("double")
                * F.col("_n")
                / (F.col("_ca") * F.col("_cb"))
            ).alias("pmi"),
        )
    )
