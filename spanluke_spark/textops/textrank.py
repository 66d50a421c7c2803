"""TextRank keyword extraction (Mihalcea & Tarau 2004, "TextRank:
Bringing Order into Texts") — PageRank over the word co-occurrence
graph: words vote for the words they appear next to, recursively, so a
word is important when important words co-occur with it. The
graph-recursive complement of the frequency-statistics keyphrase lanes
(textops/rake.py RAKE degree/frequency, textops/tfidf.py): TextRank
surfaces hub terms that never dominate raw counts.

Candidate filter: the reference algorithm keeps nouns/adjectives via a
POS tagger; no tagger ships in this sandbox, so the candidate filter is
the deterministic length proxy (alphabetic tokens of >= ``min_len``
chars) — stated, not hidden, and replayed identically by the SQL
oracle (q268).

Relational shape, built to the no-self-join discipline: token positions
come from one posexplode; window pairs come from ONE equi-join of the
position relation against its delta-shifted union (key = (doc, pos), a
co-partitioned join, never a theta-join over documents); the
co-occurrence graph collapses to DISTINCT undirected word pairs (vocab²
bounded, corpus-size independent); ranking is graph/pagerank.pagerank
on the symmetrized edge list — every word has out-edges, so no dangling
mass. Scale: the only relation proportional to the corpus is the token
stream itself; everything after the distinct is vocabulary-sized.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..graph.pagerank import pagerank

__all__ = ["cooccurrence_edges", "textrank_keywords"]


def cooccurrence_edges(
    docs: DataFrame,
    text_col: str = "text",
    doc_col: str = "doc_id",
    window: int = 2,
    min_len: int = 4,
) -> DataFrame:
    """-> distinct undirected (a, b) word pairs co-occurring within
    ``window`` ORIGINAL token positions (the filter keeps candidate
    words but distances are measured in the raw stream, per the paper)."""
    pos = (
        docs.select(
            F.col(doc_col).alias("d"),
            F.posexplode(
                F.split(F.lower(F.col(text_col)), "[^a-z]+")
            ).alias("i", "w"),
        )
        .where(F.length("w") >= min_len)
    )
    shifted = reduce(
        DataFrame.unionByName,
        [
            pos.select("d", (F.col("i") - delta).alias("i"), F.col("w").alias("wb"))
            for delta in range(1, window + 1)
        ],
    )
    pairs = pos.join(shifted, ["d", "i"]).where(F.col("w") != F.col("wb"))
    return pairs.select(
        F.least("w", "wb").alias("a"), F.greatest("w", "wb").alias("b")
    ).distinct()


def textrank_keywords(
    docs: DataFrame,
    text_col: str = "text",
    doc_col: str = "doc_id",
    window: int = 2,
    min_len: int = 4,
    iters: int = 3,
) -> DataFrame:
    """-> (node, rank): every candidate word with its TextRank score
    after ``iters`` power iterations. Callers take the top-k; the full
    relation is returned so ranking ties stay the caller's policy."""
    und = cooccurrence_edges(docs, text_col, doc_col, window, min_len)
    edges = und.select(
        F.col("a").alias("src"), F.col("b").alias("dst")
    ).unionByName(und.select(F.col("b").alias("src"), F.col("a").alias("dst")))
    return pagerank(edges, iters=iters)
