"""Pseudo-relevance feedback (Rocchio 1971, in the RSJ/BM25 setting —
Robertson & Zaragoza 2009 §3.5): run the query, ASSUME the top-ranked
documents are relevant, mine their best terms, expand the query, run it
again. The standard one-knob recall lever for seed-query curation
(textops/bm25.py pulls in-domain documents for a training mixture; PRF
widens that net past the literal seed vocabulary without any embedding
model — complementary to the vector rerank in textops/retrieval.py).

Contract (every step oracle-replayable):
  1. BM25 round 1; the top ``n_fb`` docs per query are the feedback set.
  2. Candidate expansion terms = all terms of the feedback docs, scored
     per query by sum over feedback docs of tf * idf (the Rocchio
     centroid weight with the Lucene idf), original query terms
     excluded; top ``n_exp`` by (round(weight, 6) DESC, term ASC).
  3. BM25 round 2 over the UNION term set (qtf=1 like round 1); final
     (query_id, doc_id, score, rank) top-k.

Scale shape: both scoring passes are textops/bm25.bm25_scores — the
postings side never shuffles (broadcast query terms, broadcast per-term
df). The feedback set is |queries| x n_fb rows and the expansion-term
relation |queries| x n_exp — both broadcast. The only new join is
postings >< feedback-docs on doc_id, a broadcast hash join that touches
each feedback doc's posting rows once.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .bm25 import bm25_scores, build_postings, corpus_consts, terms_of

__all__ = ["prf_search"]


def prf_search(
    docs: DataFrame,
    queries: DataFrame,
    topk: int = 10,
    n_fb: int = 3,
    n_exp: int = 2,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """queries(query_id, query_text) -> (query_id, doc_id, score, rank):
    BM25 with one round of Rocchio pseudo-relevance feedback."""
    postings = build_postings(docs, id_col=id_col, text_col=text_col)
    consts = corpus_consts(docs, text_col=text_col)
    q1 = queries.select(
        "query_id", F.explode(terms_of(F.col("query_text"))).alias("term")
    ).distinct()

    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("doc_id")
    )
    fb = (
        bm25_scores(postings, q1, consts, k1=k1, b=b)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= n_fb)
        .select("query_id", "doc_id")
    )

    cand = postings.join(F.broadcast(fb), "doc_id")
    df_cand = (
        postings.join(
            F.broadcast(cand.select("term").distinct()), "term", "left_semi"
        )
        .groupBy("term")
        .agg(F.count("*").alias("df"))
    )
    idf = F.log(
        F.lit(1.0)
        + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
    )
    ww = Window.partitionBy("query_id").orderBy(
        F.col("wt").desc(), F.col("term")
    )
    expansion = (
        cand.join(F.broadcast(df_cand), "term")
        .crossJoin(F.broadcast(consts))
        .groupBy("query_id", "term")
        .agg(F.round(F.sum(F.col("tf") * idf), 6).alias("wt"))
        .join(F.broadcast(q1), ["query_id", "term"], "left_anti")
        .withColumn("_rn", F.row_number().over(ww))
        .filter(F.col("_rn") <= n_exp)
        .select("query_id", "term")
    )

    q2 = q1.unionByName(expansion)
    scored = bm25_scores(postings, q2, consts, k1=k1, b=b)
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= topk)
        .select("query_id", "doc_id", "score", "rank")
    )
