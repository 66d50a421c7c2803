"""Unigram LM quality scoring — the CCNet-style "perplexity filter" stand-in
(Wenzek et al. 2020 score documents with a KenLM model; with no model files
in this sandbox, the LM is a corpus-trained unigram with additive smoothing).

Two-pass, fully lazy, broadcast-shaped:
  pass 1: word -> count (one shuffle with map-side partial agg; the vocab is
          tiny relative to the corpus at any scale),
  pass 2: explode + broadcast-join the vocab + per-doc mean bits/token
          (one shuffle keyed by doc id).
No driver actions, no Python rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def unigram_lm_scores(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: float = 0.5,
    broadcast_vocab: bool = True,
) -> DataFrame:
    """(id, n_tokens, bits_per_token): mean -log2 p(w) under the corpus
    unigram LM with add-k smoothing over V+1 outcomes (unseen mass finite).
    High bits_per_token = improbable text (gibberish / wrong language);
    low = repetitive/templated — both ends are curation-filter targets.

    ``broadcast_vocab``: a curated vocab (cap via min-count or top-N before
    calling) broadcasts fine; the RAW web vocab at 10^12 docs is
    100M+ distinct tokens — pass False there and the score join becomes an
    ordinary shuffle join on the word key (both sides already exploded)."""
    words = df.select(F.col(id_col).alias("id"), F.explode(F.split(F.col(text_col), " ")).alias("w"))
    vocab = words.groupBy("w").agg(F.count(F.lit(1)).alias("c"))
    stats = vocab.agg(
        F.sum("c").alias("total"), F.count(F.lit(1)).alias("v")
    )
    denom = F.col("total") + F.lit(k) * (F.col("v") + 1)
    bits = -F.log2((F.col("c") + F.lit(k)) / denom)
    vocab_side = F.broadcast(vocab) if broadcast_vocab else vocab
    return (
        words.join(vocab_side, "w")
        .crossJoin(F.broadcast(stats))
        .groupBy("id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.round(F.avg(bits), 6).alias("bits_per_token"),
        )
        .withColumnRenamed("id", id_col)
    )
