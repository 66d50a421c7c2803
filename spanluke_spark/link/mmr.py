"""Maximal Marginal Relevance reranking (Carbonell & Goldstein 1998) — the
standard diversity-aware rerank between ANN retrieval and a RAG/context
window: greedily pick the candidate maximizing

    lambda * rel(c, query) - (1 - lambda) * max_{s in selected} sim(c, s)

so the final k are relevant AND mutually non-redundant.

Scale shape: MMR is a POST-RETRIEVAL rerank — its input is the bounded
candidate pool an ANN stage (link/ann.py, link/pq.py) already produced,
never the corpus. Selection is inherently sequential in k; each of the k
rounds is one Spark action over the pool (argmax by 6-dp-rounded score,
id tie-break — the repo's reproducible-ranking convention) plus a codegen
running-max similarity update against the 1 selected vector, collected
driver-side (k rows total — the same bounded-collect budget as the IVF
centroid fetch). All cosines are zip_with/aggregate over array columns —
no explode, no Python per row.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["mmr_rerank"]


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _cos(a: Column, b: Column) -> Column:
    return F.round(_dot(a, b) / (F.sqrt(_dot(a, a)) * F.sqrt(_dot(b, b))), 6)


def _lit_vec(vals) -> Column:
    return F.array(*[F.lit(float(v)) for v in vals])


def mmr_rerank(
    cand: DataFrame,
    query_vec,
    k: int = 5,
    lam: float = 0.7,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """-> (rank, id_col, rel, max_sim, mmr_score): the k MMR selections
    from the candidate pool, in selection order. ``query_vec`` is a plain
    list/array (the query embedding)."""
    spark = cand.sparkSession
    q = _lit_vec(query_vec)
    cur = cand.select(
        id_col,
        vec_col,
        _cos(F.col(vec_col), q).alias("rel"),
        F.lit(0.0).alias("max_sim"),
    ).localCheckpoint(eager=True)

    out = []
    for r in range(k):
        pick = (
            cur.withColumn(
                "mmr_score",
                F.round(lam * F.col("rel") - (1.0 - lam) * F.col("max_sim"), 6),
            )
            .orderBy(F.desc("mmr_score"), F.asc(id_col))
            .limit(1)
            .collect()
        )
        if not pick:
            break
        p = pick[0]
        out.append((r + 1, p[id_col], p["rel"], p["max_sim"], p["mmr_score"]))
        sv = _lit_vec(p[vec_col])
        cur = (
            cur.where(F.col(id_col) != F.lit(p[id_col]))
            .withColumn(
                "max_sim", F.greatest("max_sim", _cos(F.col(vec_col), sv))
            )
            .localCheckpoint(eager=True)
        )
    return spark.createDataFrame(
        out, f"rank int, {id_col} long, rel double, max_sim double, mmr_score double"
    )
