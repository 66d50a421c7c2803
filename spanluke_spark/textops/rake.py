"""RAKE keyphrase extraction (Rose, Engel, Cramer & Cowley 2010) —
multi-word keyphrases from single documents, no corpus statistics
needed: TF-IDF (textops/tfidf.py) ranks single TERMS against the
corpus; RAKE finds PHRASES ("summary judgment motion") from nothing but
the document and a stopword list, which is what entity-free headline
mining and query suggestion want.

The algorithm, exactly as published:
  candidate phrases = maximal runs of non-stopword tokens (stopwords
  and punctuation are the delimiters); for each word, freq = number of
  occurrences in candidates, degree = sum over its occurrences of the
  containing phrase's length (co-occurrence degree, self included);
  word score = degree/freq; phrase score = sum of its word scores
  (duplicate words count each time); top-k phrases per document by
  (round(score, 6) DESC, phrase ASC).

Relational lowering: tokens posexplode once; the phrase id is the
RUNNING COUNT of delimiters before the token (one per-doc window) —
the gaps-and-islands trick (etl/paragraphs.py, dedup/substring.py);
phrases rebuild with sort_array + array_join (order restored from
positions, never assumed). Word stats are per-(doc, word) aggregates —
RAKE is per-document, so every aggregate and join keys on the doc id:
one shuffle family, corpus-linear, no corpus-wide state at all.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["rake_keyphrases", "DEFAULT_STOPWORDS"]

DEFAULT_STOPWORDS = [
    "a", "an", "and", "are", "as", "at", "be", "by", "for", "from",
    "in", "is", "it", "of", "on", "or", "that", "the", "to", "was",
    "were", "with",
]


def rake_keyphrases(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    topk: int = 5,
    stopwords: list[str] | None = None,
) -> DataFrame:
    """(id, phrase, score, rank): top-k RAKE keyphrases per document."""
    stops = sorted(set(stopwords if stopwords is not None else DEFAULT_STOPWORDS))
    toks = df.select(
        F.col(id_col).alias("id"),
        F.posexplode(
            F.filter(
                F.split(F.lower(F.col(text_col)), r"[^a-z0-9]+"),
                lambda t: t != F.lit(""),
            )
        ).alias("pos", "w"),
    )
    is_stop = F.col("w").isin(stops)
    wseq = Window.partitionBy("id").orderBy("pos")
    words = (
        toks.withColumn(
            "phrase_id", F.sum(is_stop.cast("long")).over(wseq)
        )
        .filter(~is_stop)
    )
    phrases = words.groupBy("id", "phrase_id").agg(
        F.array_join(
            F.expr("transform(sort_array(collect_list(struct(pos, w))),"
                   " s -> s.w)"),
            " ",
        ).alias("phrase"),
        F.count(F.lit(1)).alias("plen"),
    )
    wstats = (
        words.join(phrases.select("id", "phrase_id", "plen"),
                   ["id", "phrase_id"])
        .groupBy("id", "w")
        .agg(
            F.count(F.lit(1)).alias("freq"),
            F.sum("plen").alias("degree"),
        )
        .select(
            "id", "w", (F.col("degree") / F.col("freq")).alias("wscore")
        )
    )
    pscores = (
        words.join(wstats, ["id", "w"])
        .groupBy("id", "phrase_id")
        .agg(F.round(F.sum("wscore"), 6).alias("score"))
        .join(phrases.select("id", "phrase_id", "phrase"),
              ["id", "phrase_id"])
        # identical phrases occurring twice in one doc keep one row
        # (same score by construction — word stats are doc-global)
        .select("id", "phrase", "score")
        .distinct()
    )
    wrank = Window.partitionBy("id").orderBy(
        F.col("score").desc(), F.col("phrase")
    )
    return (
        pscores.withColumn("rank", F.row_number().over(wrank))
        .filter(F.col("rank") <= topk)
        .withColumnRenamed("id", id_col)
        .select(id_col, "phrase", "score", "rank")
    )
