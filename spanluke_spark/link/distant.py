"""Distant supervision: mine relation-extraction training candidates by
joining a (subject, object, relation) knowledge base against the corpus.

The Mintz et al. (ACL 2009) recipe every industrial KG bootstraps with:
any document containing BOTH entities of a known KB pair is a (noisy)
positive example for that pair's relation. The output feeds relation-
classifier training; here it is the candidate generator.

Scale shape — the naive formulation is a broadcast NESTED-LOOP join
(`docs CROSS JOIN kb WHERE contains AND contains`): O(docs × kb) contains
calls, fine for a thousand-pair KB, catastrophic at Wikidata scale. The
production shape implemented here is the INVERTED-INDEX block join:

    1. explode each document's distinct token set        (one shuffle-free pass)
    2. equi-join tokens against the KB's subject FIRST TOKEN (hash join,
       ordinary shuffle — candidate set is now per-token, not per-doc)
    3. verify both full surfaces with token-boundary `contains`
       (codegen, runs only on the blocked candidates)

Step 2's key skew (stopword-ish first tokens) is the usual hot-key story;
keep KB surface forms content-bearing or salt the join. Matching is
token-boundary exact (`' '||text||' '` contains `' '||surface||' '`) —
swap in the normalized-key matcher from link/alias.py for fuzzier
surfaces.

Reference analogue: SpanLuke links mentions against a fixed alias
dictionary (`link/alias.py`); distant supervision is the inverse feed —
the KB generates the labeled mentions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _padded(col: F.Column) -> F.Column:
    return F.concat(F.lit(" "), col, F.lit(" "))


def distant_supervision_candidates(
    docs: DataFrame,
    kb: DataFrame,
    doc_col: str = "doc_id",
    text_col: str = "text",
    broadcast_threshold: int = 100_000,
) -> DataFrame:
    """docs (doc_id, text) × kb (e1, e2, rel) -> (doc_id, e1, e2, rel)
    for every document whose text contains both surfaces as whole-token
    sequences. KB below ``broadcast_threshold`` rows is broadcast at the
    verify join; above it the join shuffles both sides (the blocked
    candidate set, never the full corpus)."""
    padded_text = _padded(F.col(text_col))
    toks = docs.select(
        F.col(doc_col).alias("doc_id"),
        padded_text.alias("_pt"),
        F.explode(
            F.array_distinct(F.split(F.trim(F.col(text_col)), r"\s+"))
        ).alias("_tok"),
    )
    kb_keyed = kb.select(
        "e1", "e2", "rel", F.split(F.col("e1"), r"\s+").getItem(0).alias("_tok")
    )
    # Probe bounded by LIMIT, not a full count (the dedup.py pattern).
    small = kb_keyed.limit(broadcast_threshold + 1).count() <= broadcast_threshold
    right = F.broadcast(kb_keyed) if small else kb_keyed
    return (
        toks.join(right, "_tok")
        .where(
            F.col("_pt").contains(_padded(F.col("e1")))
            & F.col("_pt").contains(_padded(F.col("e2")))
        )
        .select("doc_id", "e1", "e2", "rel")
        .distinct()
    )
