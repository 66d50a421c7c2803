"""TF-IDF keyword extraction: top-k characteristic terms per document.

Shapes: term frequencies are one explode + hash agg (map-side combine);
document frequencies aggregate the same exploded stream (distinct per doc);
the IDF join is broadcast-sized for curated vocabularies and degrades to a
shuffle join otherwise (same reasoning as lm_score); top-k is a window that
Spark executes as partial TakeOrdered per partition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def tfidf_topk(
    df: DataFrame,
    k: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
    broadcast_idf: bool = True,
) -> DataFrame:
    """-> (id, rank, term, tf, score): the k highest tf-idf terms per doc.

    idf = ln((N + 1) / (df + 1)) + 1 (smoothed); score = tf * idf, rounded
    to 6 places for cross-engine comparability. Ties break on the term
    (ascending) — fully deterministic.
    """
    words = df.select(
        F.col(id_col).alias("id"), F.explode(F.split(F.col(text_col), " ")).alias("w")
    )
    tf = words.groupBy("id", "w").agg(F.count(F.lit(1)).alias("tf"))
    docfreq = tf.groupBy("w").agg(F.count(F.lit(1)).alias("df"))
    n_docs = df.select(F.col(id_col)).distinct().agg(F.count(F.lit(1)).alias("n"))
    idf_side = F.broadcast(docfreq) if broadcast_idf else docfreq
    scored = (
        tf.join(idf_side, "w")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "score",
            F.round(
                F.col("tf")
                * (F.log((F.col("n") + 1) / (F.col("df") + 1)) + F.lit(1.0)),
                6,
            ),
        )
    )
    w = Window.partitionBy("id").orderBy(F.desc("score"), F.asc("w"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            F.col("id").alias(id_col), "rank", F.col("w").alias("term"), "tf", "score"
        )
    )
