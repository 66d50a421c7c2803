"""int8 embedding quantization: numpy parity, invariants, ANN recall."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from spanluke_spark.link.quantize import quantization_report, quantize_int8


def test_quantize_matches_numpy(spark, sf_dir):
    from spanluke_spark.link.quantize import dequantize

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").limit(50)
    rows = quantize_int8(emb).withColumn("xhat", dequantize()).collect()
    for r in rows:
        assert r.xhat == pytest.approx([qi * r.scale for qi in r.q])
    for r in rows:
        x = np.array(r.embedding, dtype=np.float64)
        scale = np.abs(x).max() / 127.0
        assert r.scale == pytest.approx(scale)
        ref = np.round(x / scale).astype(int) if scale else np.zeros(len(x), int)
        assert list(r.q) == list(ref)
        assert max(abs(v) for v in r.q) <= 127


def test_quantization_report_invariants(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    rep = quantization_report(emb)
    bad = rep.where(
        (F.col("max_abs_err") > F.col("scale") / 2 + 1e-12)
        | (F.col("scale") < 0)
    ).count()
    assert bad == 0
    assert rep.count() == emb.count()


def test_zero_vector_quantizes_to_zero(spark):
    emb = spark.createDataFrame(
        [(1, [0.0, 0.0, 0.0])], "vec_id long, embedding array<float>"
    )
    r = quantization_report(emb).collect()[0]
    assert (r.scale, r.sum_q, r.max_abs_err) == (0.0, 0, 0.0)


def test_recall_at_10_after_quantization(spark, sf_dir):
    # exact cosine top-10 vs dequantized top-10 for 20 query vectors
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    rows = emb.collect()
    X = np.array([r.embedding for r in rows], dtype=np.float64)
    ids = np.array([r.vec_id for r in rows])
    scale = np.abs(X).max(axis=1, keepdims=True) / 127.0
    Xq = np.round(X / np.where(scale == 0, 1, scale)) * scale

    def topk(M, qv, k=10):
        sims = M @ qv / (np.linalg.norm(M, axis=1) * np.linalg.norm(qv) + 1e-12)
        return set(ids[np.argsort(-sims)[:k]])

    recalls = []
    for qi in range(20):
        exact = topk(X, X[qi])
        approx = topk(Xq, Xq[qi])
        recalls.append(len(exact & approx) / 10)
    assert np.mean(recalls) >= 0.9  # int8 keeps cosine neighborhoods
