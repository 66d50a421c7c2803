"""J8: approximate-nearest-neighbor embedding rerank.

Two paths over ``embeddings(vec_id, embedding: array<float>, label)``:

- ``cosine_topk``: exact brute-force top-k — broadcast the candidate set,
  JVM-side dot product via ``F.zip_with`` + ``F.aggregate`` (no Python),
  window row_number <= k. Baseline + correctness oracle.
- ``lsh_topk``: random-hyperplane LSH — deterministic hash-derived planes,
  banded signature buckets, shuffle join on (band, bucket), exact cosine
  rerank within buckets. The scale path: candidate pairs ~ bucket collisions,
  not |Q| x |C|.
"""

from __future__ import annotations

import hashlib

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _norm_col(vec: str) -> F.Column:
    return F.sqrt(
        F.aggregate(vec, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x)
    )


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y), F.lit(0.0), lambda acc, x: acc + x
    )


def cosine_topk(
    queries: DataFrame,
    candidates: DataFrame,
    k: int = 5,
    q_id: str = "q_id",
    c_id: str = "c_id",
    q_vec: str = "q_vec",
    c_vec: str = "c_vec",
) -> DataFrame:
    """Exact top-k by cosine similarity; candidates broadcast (small dim table).

    Ties break on candidate id ascending — deterministic output.
    """
    q = queries.select(q_id, F.col(q_vec).alias("_qv"), _norm_col(q_vec).alias("_qn"))
    c = candidates.select(c_id, F.col(c_vec).alias("_cv"), _norm_col(c_vec).alias("_cn"))
    pairs = q.crossJoin(F.broadcast(c)).withColumn(
        "cos_sim",
        F.when(
            (F.col("_qn") > 0) & (F.col("_cn") > 0),
            _dot(F.col("_qv"), F.col("_cv")) / (F.col("_qn") * F.col("_cn")),
        ).otherwise(F.lit(0.0)),
    )
    w = Window.partitionBy(q_id).orderBy(F.desc("cos_sim"), F.asc(c_id))
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(q_id, c_id, "cos_sim", "rank")
    )


def _deterministic_planes(dim: int, n_planes: int, seed: str = "spanluke-lsh") -> list[list[float]]:
    """Hyperplanes from a counter-mode blake2b stream — identical on every
    worker/run, no RNG state."""
    out = []
    for p in range(n_planes):
        vals = []
        for d in range(dim):
            h = hashlib.blake2b(f"{seed}:{p}:{d}".encode(), digest_size=8).digest()
            u = int.from_bytes(h, "little") / 2.0**64
            vals.append(float(np.float32(2.0 * u - 1.0)))
        out.append(vals)
    return out


def lsh_topk(
    queries: DataFrame,
    candidates: DataFrame,
    k: int = 5,
    n_planes: int = 16,
    n_bands: int = 4,
    q_id: str = "q_id",
    c_id: str = "c_id",
    q_vec: str = "q_vec",
    c_vec: str = "c_vec",
) -> DataFrame:
    """Random-hyperplane LSH: sign-bit signature split into bands; vectors
    sharing any band bucket become candidate pairs; exact cosine rerank.

    Recall < 1 by construction (ANN); bucket join is an equi-join on
    (band, bucket) so Catalyst shuffles only colliding pairs.
    """
    dim = 64  # driver embeddings are dim-64; planes are sliced if shorter
    planes = _deterministic_planes(dim, n_planes)
    bits_per_band = n_planes // n_bands

    def signature(df: DataFrame, id_col: str, vec: str, side: str) -> DataFrame:
        sig_bits = [
            F.when(_dot(F.col(vec), F.array(*[F.lit(v) for v in plane])) >= 0, 1).otherwise(0)
            for plane in planes
        ]
        bands = []
        for b in range(n_bands):
            expr = F.lit(0)
            for i in range(bits_per_band):
                expr = expr * 2 + sig_bits[b * bits_per_band + i]
            bands.append(expr.alias(f"_band{b}"))
        wide = df.select(id_col, F.col(vec).alias(f"_{side}v"), _norm_col(vec).alias(f"_{side}n"), *bands)
        stacked = wide.select(
            id_col,
            f"_{side}v",
            f"_{side}n",
            F.posexplode(F.array(*[F.col(f"_band{b}") for b in range(n_bands)])).alias(
                "band", "bucket"
            ),
        )
        return stacked

    qs = signature(queries, q_id, q_vec, "q")
    cs = signature(candidates, c_id, c_vec, "c")
    pairs = (
        qs.join(cs, ["band", "bucket"])
        .select(q_id, c_id, "_qv", "_cv", "_qn", "_cn")
        .dropDuplicates([q_id, c_id])
        .withColumn(
            "cos_sim",
            F.when(
                (F.col("_qn") > 0) & (F.col("_cn") > 0),
                _dot(F.col("_qv"), F.col("_cv")) / (F.col("_qn") * F.col("_cn")),
            ).otherwise(F.lit(0.0)),
        )
    )
    w = Window.partitionBy(q_id).orderBy(F.desc("cos_sim"), F.asc(c_id))
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(q_id, c_id, "cos_sim", "rank")
    )
