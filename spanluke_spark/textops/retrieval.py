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

__all__ = ["hybrid_search", "rrf_fuse", "copeland"]


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


def copeland(
    rankings: DataFrame,
    ranker_col: str = "ranker",
    item_col: str = "item",
    rank_col: str = "rank",
) -> DataFrame:
    """Copeland rank aggregation — the Condorcet-style counterpart of
    rrf_fuse: instead of summing reciprocal-rank SCORES, every item
    pair fights a pairwise-majority duel (how many rankers put a above
    b?) and an item's Copeland score is duels won minus duels lost
    (ties contribute 0). Satisfies the Condorcet criterion (an item
    beating every other head-to-head is ranked first), which
    score-fusion methods do not — the engine's second opinion when
    fusing ranking signals whose scales disagree (PageRank vs citation
    authority vs BM25 positions).

    -> (item, wins, losses, copeland). A pair duels only over rankers
    ranking BOTH items (the join's natural semantics; partial rankings
    are first-class). All counts are exact integers — bit-identical in
    the DuckDB oracle (q269).

    Relational shape: one self-join of the ranking relation keyed on
    the ranker (never on items), aggregated to one row per unordered
    item pair, then a sign-aggregate per item. The quadratic term is
    items² per ranker — fusion inputs are top-k lists (k ≤ 10³), the
    same bounded-candidate contract as rrf_fuse; corpus-scale relations
    never enter a duel.
    """
    r = rankings.select(
        F.col(ranker_col).alias("r"),
        F.col(item_col).alias("item"),
        F.col(rank_col).alias("rank"),
    )
    a, b = r.alias("a"), r.alias("b")
    duels = (
        a.join(
            b,
            (F.col("a.r") == F.col("b.r")) & (F.col("a.item") < F.col("b.item")),
        )
        .groupBy(
            F.col("a.item").alias("ia"), F.col("b.item").alias("ib")
        )
        .agg(
            F.sum((F.col("a.rank") < F.col("b.rank")).cast("long")).alias("wa"),
            F.sum((F.col("b.rank") < F.col("a.rank")).cast("long")).alias("wb"),
        )
        .select(
            "ia",
            "ib",
            F.signum((F.col("wa") - F.col("wb")).cast("double")).cast("int").alias(
                "sgn"
            ),
        )
    )
    per_item = duels.select(
        F.col("ia").alias("item"), F.col("sgn").alias("s")
    ).unionByName(duels.select(F.col("ib").alias("item"), (-F.col("sgn")).alias("s")))
    return (
        per_item.groupBy("item")
        .agg(
            F.sum((F.col("s") == 1).cast("long")).alias("wins"),
            F.sum((F.col("s") == -1).cast("long")).alias("losses"),
            F.sum("s").alias("copeland"),
        )
    )
