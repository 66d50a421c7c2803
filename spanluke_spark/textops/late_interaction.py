"""Late-interaction retrieval (ColBERT MaxSim, Khattab & Zaharia
2020): score(q, d) = sum over query tokens t of max over doc tokens u
of <t, u>. Token-level interaction is what single-vector retrieval
(link/ann.py cosine_topk, textops/bm25.py) structurally can't express —
each query token independently finds its best-matching doc token, so
multi-aspect queries don't collapse into one averaged vector.

Relational decomposition: query token vectors are a handful of rows →
broadcast; every doc token meets every query token in a broadcast
nested-loop (the standard late-interaction scan — the big side never
shuffles to score), dots are the repo's EXACT integer-quantized inner
products (q253 discipline: round(x*scale) BIGINTs, so the max/top-k
ranking cannot flip on a float tie between engines), then

  groupBy (q, doc, q_tok) max(dot)   -- map-side combinable
  groupBy (q, doc)       sum(max)    -- map-side combinable
  window top-k per query             -- ties break to smaller doc_id

At crawl scale the nested-loop pre-filters through an ANN candidate
stage (link/ann.lsh_topk per query token, union, then exact MaxSim on
candidates only) — the generator-agnostic contract used by every pair
pipeline here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["maxsim_topk"]


def maxsim_topk(
    query_tokens: DataFrame,
    doc_tokens: DataFrame,
    k: int = 10,
    scale: int = 64,
    d: int | None = None,
) -> DataFrame:
    """query_tokens (q_id, tok_id, vec), doc_tokens (doc_id, tok_id,
    vec) -> (q_id, rank, doc_id, score): top-k docs per query by MaxSim
    on exact integer-quantized dots."""

    def _q(df: DataFrame, idc: str, out: str) -> DataFrame:
        vec = F.col("vec") if d is None else F.slice(F.col("vec"), 1, d)
        return df.select(
            F.col(idc).alias(out),
            F.col("tok_id").alias(f"{out}_tok"),
            F.transform(
                vec, lambda x: F.round(x.cast("double") * scale).cast("long")
            ).alias(f"{out}_v"),
        )

    qt = _q(query_tokens, "q_id", "q")
    dt = _q(doc_tokens, "doc_id", "doc")
    dot = (
        dt.join(F.broadcast(qt))
        .select(
            "q",
            "doc",
            "q_tok",
            F.aggregate(
                F.zip_with(
                    F.col("q_v"), F.col("doc_v"), lambda a, b: a * b
                ),
                F.lit(0).cast("long"),
                lambda acc, x: acc + x,
            ).alias("dot"),
        )
    )
    per_tok = dot.groupBy("q", "doc", "q_tok").agg(F.max("dot").alias("best"))
    per_doc = per_tok.groupBy("q", "doc").agg(F.sum("best").alias("score"))
    w = Window.partitionBy("q").orderBy(F.desc("score"), F.asc("doc"))
    return (
        per_doc.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            F.col("q").alias("q_id"),
            "rank",
            F.col("doc").alias("doc_id"),
            "score",
        )
    )
