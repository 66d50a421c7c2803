"""Embedding quantization for ANN at memory scale — symmetric per-vector
int8 (the FAISS SQ8 scheme): a 10^12-vector index at float32 is 4x the
RAM of int8, and recall loss at 8 bits is typically <1% for cosine
retrieval, so this is the default production trade.

q_i = round(x_i / scale), scale = max|x| / 127 — one pass of element-
wise HOF expressions (transform / zip_with / aggregate), no Python, no
shuffle; every operation is per-element IEEE arithmetic, so results are
bit-identical across engines (the SQL oracle replays them exactly —
only ORDER-dependent float reductions can diverge, and none are used).
Zero vectors quantize to all-zero with scale 0.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _scale(vec: Column) -> Column:
    return F.array_max(F.transform(vec, lambda x: F.abs(x))) / 127.0


def quantize_int8(
    emb: DataFrame, vec_col: str = "embedding"
) -> DataFrame:
    """Adds ``q`` (array<int> in [-127, 127]), ``scale`` (double), and
    keeps the original vector for evaluation joins."""
    vec = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    scale = _scale(vec)
    q = F.transform(
        vec,
        lambda x: F.when(scale == 0, F.lit(0)).otherwise(
            F.round(x / scale, 0).cast("int")
        ),
    )
    return emb.withColumn("scale", scale).withColumn("q", q)


def dequantize() -> Column:
    """Reconstruction expression over a quantize_int8 output row:
    x_hat_i = q_i * scale (array<double>)."""
    return F.transform(F.col("q"), lambda qi: qi * F.col("scale"))


def quantization_report(
    emb: DataFrame, vec_col: str = "embedding"
) -> DataFrame:
    """Per-vector quantization audit: (vec_id, n_dims, scale, sum_q,
    max_abs_err). max_abs_err <= scale/2 by construction — the row-level
    invariant a 10^12-vector run asserts before swapping the index."""
    qd = quantize_int8(emb, vec_col)
    vec = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    err = F.zip_with(
        vec, F.col("q"), lambda x, qi: F.abs(x - qi * F.col("scale"))
    )
    return qd.select(
        "vec_id",
        F.size(vec_col).alias("n_dims"),
        "scale",
        F.aggregate(
            "q", F.lit(0).cast("long"), lambda acc, v: acc + v
        ).alias("sum_q"),
        F.array_max(err).alias("max_abs_err"),
    )
