"""Exact substring deduplication (Lee et al. 2022, "Deduplicating Training
Data Makes Language Models Better"; Google's released
deduplicate-text-datasets tool) at token-k-gram granularity.

The published method finds substrings of >= k tokens that occur more than
once ANYWHERE in the corpus (across documents or within one) and removes
every duplicated occurrence — the released suffix-array tool drops all
copies, noting keep-one changes results negligibly. The suffix array is a
single-machine construction; the Spark-native equivalent decomposes the
same predicate: a substring of length >= k repeats iff every one of its
token k-grams repeats, so duplicated maximal spans are exactly the merged
runs of globally-duplicated k-grams.

Pipeline (all JVM-side, no Python in the hot path):
  1. tokenize (whitespace) and slide k-grams with positions — one
     ``transform(sequence(...))`` over the token array, exploded;
  2. global duplicate test: window count over the 8-byte gram hash
     (one shuffle; ``by="text"`` groups the raw gram for hash-collision
     paranoia at test scale);
  3. merge overlapping/adjacent duplicated gram positions per document
     into maximal spans — gaps-and-islands with lag + running sum
     (shuffle carries only (doc, pos) hits, not documents);
  4. removal rebuilds the text with array HOFs (filter + exists) —
     documents never shuffle for removal; the span list joins to them.

Scale shape at 100 TB: the gram explode is the same k-times blowup the
MinHash shingle stage already pays; the duplicate test shuffles 16-byte
(hash, pos) rows with AQE handling hot grams (boilerplate k-grams are the
skew case — they are exactly what this operator exists to find); span
lists per document are bounded by n_tokens/(k+1)+1 disjoint islands.
Caveat shared with the released tool: removal concatenates the remaining
tokens, which can create new adjacencies; one pass removes every
originally-duplicated gram (tested) but is not a fixpoint.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_TOKENS = "_sub_t"


def _tokens(text_col: str) -> Column:
    # split(trim(x), '\\s+') so leading/trailing space yields no empty tokens;
    # fully-empty text becomes a single empty token and is len-gated below
    return F.split(F.trim(F.col(text_col)), r"\s+")


def duplicate_kgram_spans(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 50,
    by: str = "hash",
) -> DataFrame:
    """(docs) -> (id_col, tok_start, tok_end): maximal token spans whose
    every k-gram occurs >= 2 times corpus-wide (self-repeats included).

    ``by="hash"`` (production) compares 64-bit xxhash64 gram fingerprints —
    16-byte shuffle keys, collision odds ~n^2/2^65. ``by="text"`` compares
    raw k-gram strings (collision-free; test/oracle mode).
    """
    if by not in ("hash", "text"):
        raise ValueError(f"by must be 'hash' or 'text', got {by!r}")
    if k < 2:
        raise ValueError("k must be >= 2")
    gram = f"concat_ws(' ', slice({_TOKENS}, i + 1, {k}))"
    if by == "hash":
        gram = f"xxhash64({gram})"
    grams = (
        docs.select(F.col(id_col), _tokens(text_col).alias(_TOKENS))
        .where(F.size(F.col(_TOKENS)) >= k)
        .select(
            id_col,
            F.explode(
                F.expr(
                    f"transform(sequence(0, size({_TOKENS}) - {k}), "
                    f"i -> struct(i AS pos, {gram} AS g))"
                )
            ).alias("_g"),
        )
        .select(id_col, F.col("_g.pos").alias("pos"), F.col("_g.g").alias("g"))
    )
    # Global duplicate test as agg + join, NOT count().over(partitionBy(g)):
    # hot boilerplate grams (the exact skew this operator hunts) would pin a
    # whole window partition on one task, and AQE cannot split window
    # partitions. The aggregate collapses hot grams map-side (partial
    # combine), and AQE skew-join splits the join back onto the hits.
    dup_grams = (
        grams.groupBy("g")
        .agg(F.count("*").alias("_df"))
        .where(F.col("_df") >= 2)
        .select("g")
    )
    hits = grams.join(dup_grams, "g")
    w = Window.partitionBy(id_col).orderBy("pos")
    prev = F.lag("pos").over(w)
    island = F.sum(
        F.when(prev.isNull() | (F.col("pos") > prev + k), 1).otherwise(0)
    ).over(w)
    return (
        hits.select(id_col, "pos")
        .withColumn("_island", island)
        .groupBy(id_col, "_island")
        .agg(
            F.min("pos").alias("tok_start"),
            (F.max("pos") + k).alias("tok_end"),
        )
        .select(id_col, "tok_start", "tok_end")
    )


def remove_duplicate_substrings(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 50,
    by: str = "hash",
) -> DataFrame:
    """Rewrite ``text_col`` with every duplicated >= k-token span removed
    (all copies, matching the released tool). Other columns pass through;
    documents without duplicated spans are byte-identical."""
    spans = (
        duplicate_kgram_spans(docs, id_col, text_col, k=k, by=by)
        .groupBy(id_col)
        .agg(F.collect_list(F.struct("tok_start", "tok_end")).alias("_spans"))
        # bounded: islands are disjoint and >= k+1 apart, so
        # len(_spans) <= n_tokens/(k+1) + 1
    )
    rebuilt = F.expr(
        f"concat_ws(' ', transform(filter("
        f"  transform({_TOKENS}, (t, i) -> struct(t AS tok, i AS idx)),"
        f"  p -> NOT exists(_spans, s -> p.idx >= s.tok_start"
        f"                              AND p.idx < s.tok_end)"
        f"), p -> p.tok))"
    )
    out = (
        docs.join(spans, id_col, "left")
        .withColumn(_TOKENS, _tokens(text_col))
        .withColumn(
            text_col,
            F.when(F.col("_spans").isNull(), F.col(text_col)).otherwise(rebuilt),
        )
        .drop(_TOKENS, "_spans")
    )
    return out
