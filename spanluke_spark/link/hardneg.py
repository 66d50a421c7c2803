"""Hard-negative mining for embedding training — for each anchor, the
top-k most-similar items that are NOT known positives (and not the anchor
itself): the standard contrastive-training data step (DPR, Karpukhin et
al. 2020 §4.2 — "hard negatives from the retriever itself" — and every
sentence-embedding pipeline since).

Similarity is int8-quantized cosine (link/quantize.py, the q119/q120
scheme): integer dot and norms, one float sqrt at the end, ROUNDED to
1e-6 before ranking with a candidate-id tie-break — the ranking is
engine-portable.

Scale shape: pass ``candidates`` (anchor, cand) from the ANN candidate
generator (link/ann.py LSH/IVF buckets) at corpus scale — this operator
scores and ranks WHATEVER candidate set it is given. The default
(candidates=None) broadcasts the anchor set against the full embedding
table — one pass over embeddings per anchor batch, the brute baseline,
right whenever |anchors| is training-set-sized rather than corpus-sized.
Known positives are removed by an equi anti-join; the per-anchor top-k is
a WindowGroupLimit partial.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..textops.bitext import _int_dot
from .quantize import quantize_int8

__all__ = ["hard_negatives"]


def hard_negatives(
    emb: DataFrame,
    positives: DataFrame,
    k: int = 5,
    candidates: DataFrame | None = None,
) -> DataFrame:
    """emb(vec_id, embedding) x positives(anchor, pos) ->
    (anchor, cand, sim, rank): top-k hard negatives per distinct anchor.
    """
    q = quantize_int8(emb).select(
        "vec_id", "q", _int_dot(F.col("q"), F.col("q")).alias("norm2")
    )
    anchors = positives.select(F.col("anchor")).distinct()
    if candidates is None:
        candidates = q.select(F.col("vec_id").alias("cand")).crossJoin(
            F.broadcast(anchors)
        )
    cand = (
        candidates.select("anchor", "cand")
        .where(F.col("anchor") != F.col("cand"))
        .join(
            positives.select("anchor", F.col("pos").alias("cand")).distinct(),
            ["anchor", "cand"],
            "left_anti",
        )
        .join(
            q.select(
                F.col("vec_id").alias("anchor"),
                F.col("q").alias("qa"),
                F.col("norm2").alias("na2"),
            ),
            "anchor",
        )
        .join(
            q.select(
                F.col("vec_id").alias("cand"),
                F.col("q").alias("qc"),
                F.col("norm2").alias("nc2"),
            ),
            "cand",
        )
        .withColumn(
            "sim",
            F.round(
                F.try_divide(
                    _int_dot(F.col("qa"), F.col("qc")),
                    F.sqrt(F.col("na2").cast("double") * F.col("nc2").cast("double")),
                ),
                6,
            ),
        )
    )
    w = Window.partitionBy("anchor").orderBy(F.col("sim").desc(), F.col("cand"))
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("anchor", "cand", "sim", "rank")
    )
