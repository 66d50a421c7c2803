"""Two-stage hybrid retrieval: BM25 lexical recall → embedding rerank —
the architecture of essentially every production search stack (and the
in-domain document selection loop for training mixtures): a cheap
inverted-index stage casts a wide candidate net, a vector stage reorders
the short list semantically.

Stage 1 is textops/bm25.bm25_topk (broadcast seed queries, postings never
shuffle, WindowGroupLimit top-N). Stage 2 joins ONLY the N candidates per
query against the embedding table (an equi-join on the doc id — the
corpus-scale vector table is touched once, filtered to candidates) and
scores by int8-quantized cosine (link/quantize.py, bit-reproducible),
re-ranking with a 1e-6-rounded key. The expensive stage therefore costs
O(|queries| * N) similarity evaluations, never O(|queries| * |corpus|).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..link.quantize import quantize_int8
from .bitext import _int_dot
from .bm25 import bm25_topk

__all__ = ["hybrid_search", "rrf_fuse"]


def rrf_fuse(
    rankings: list[DataFrame],
    k: int = 60,
    id_col: str = "doc_id",
    rank_col: str = "rank",
) -> DataFrame:
    """Reciprocal rank fusion (Cormack et al., SIGIR 2009): combine N
    ranked lists into one by score = sum over lists of 1/(k + rank) —
    the standard way to merge lexical and vector rankings WITHOUT score
    calibration (ranks are comparable across retrievers, raw scores are
    not; k=60 is the paper's constant). Items absent from a list simply
    contribute nothing — no outer-join NULL handling.

    -> (id, rrf_score, fused_rank), score rounded 1e-6 (sums of a
    handful of exact reciprocals — engine-stable), rank deterministic
    (score desc, id asc). Shape: union of the (tiny, top-N) candidate
    lists + one hash aggregate + one rank window over the fused
    candidates — the corpus is never touched."""
    if not rankings:
        raise ValueError("rrf_fuse needs at least one ranking")
    u = rankings[0].select(F.col(id_col).alias("id"), F.col(rank_col).alias("r"))
    for nxt in rankings[1:]:
        u = u.unionByName(
            nxt.select(F.col(id_col).alias("id"), F.col(rank_col).alias("r"))
        )
    scored = u.groupBy("id").agg(
        F.round(F.sum(1.0 / (F.lit(k) + F.col("r"))), 6).alias("rrf_score")
    )
    w = Window.orderBy(F.desc("rrf_score"), F.asc("id"))
    return scored.select(
        F.col("id").alias(id_col),
        "rrf_score",
        F.row_number().over(w).alias("fused_rank"),
    )


def hybrid_search(
    docs: DataFrame,
    queries: DataFrame,
    emb: DataFrame,
    query_vecs: DataFrame,
    recall_k: int = 50,
    final_k: int = 10,
) -> DataFrame:
    """-> (query_id, doc_id, bm25_score, sim, rank): final_k docs per
    query, BM25-recalled then cosine-reranked.

    ``emb`` = (vec_id, embedding) keyed by doc id; ``query_vecs`` =
    (query_id, embedding). Candidates lacking an embedding row are
    dropped (they cannot be reranked) — count them upstream if that
    matters for coverage.
    """
    cands = bm25_topk(docs, queries, topk=recall_k).select(
        "query_id", "doc_id", F.col("score").alias("bm25_score")
    )
    dq = quantize_int8(emb).select(
        F.col("vec_id").alias("doc_id"),
        F.col("q").alias("qd"),
        _int_dot(F.col("q"), F.col("q")).alias("nd2"),
    )
    qq = quantize_int8(query_vecs).select(
        "query_id",
        F.col("q").alias("qq"),
        _int_dot(F.col("q"), F.col("q")).alias("nq2"),
    )
    scored = (
        cands.join(dq, "doc_id")
        .join(F.broadcast(qq), "query_id")
        .withColumn(
            "sim",
            F.round(
                F.try_divide(
                    _int_dot(F.col("qq"), F.col("qd")),
                    F.sqrt(F.col("nq2").cast("double") * F.col("nd2").cast("double")),
                ),
                6,
            ),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("sim").desc(), F.col("doc_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= final_k)
        .select("query_id", "doc_id", "bm25_score", "sim", "rank")
    )
