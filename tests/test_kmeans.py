"""Deterministic distributed k-means vs a numpy Lloyd replay."""

from __future__ import annotations

import numpy as np

from spanluke_spark.link.kmeans import kmeans_assignments


def _np_lloyd(vecs: np.ndarray, k: int, iters: int) -> np.ndarray:
    cent = vecs[:k].astype("float64").copy()  # lowest-id seeds (rows sorted by id)
    assign = None
    for it in range(iters):
        d2 = ((vecs[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
        d2 = np.round(d2, 6)
        assign = d2.argmin(axis=1)  # argmin takes lowest index on ties
        if it < iters - 1:
            for c in range(k):
                m = vecs[assign == c]
                if len(m):
                    cent[c] = m.mean(axis=0)
    return assign


def test_kmeans_matches_numpy(spark):
    rng = np.random.RandomState(3)
    centers = rng.randn(4, 6) * 4
    vecs = np.vstack([centers[i % 4] + rng.randn(6) * 0.4 for i in range(80)]).astype(
        "float32"
    )
    rows = [(i, [float(x) for x in vecs[i]]) for i in range(80)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = {
        r["vec_id"]: r["cluster"]
        for r in kmeans_assignments(df, k=4, iters=3).collect()
    }
    exp = _np_lloyd(vecs.astype("float64"), 4, 3)
    assert got == {i: int(exp[i]) for i in range(80)}
    assert len(set(got.values())) == 4  # all clusters populated


def test_kmeans_deterministic(spark):
    rows = [(i, [float((i * 7 + j) % 13) for j in range(5)]) for i in range(30)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    a = sorted(kmeans_assignments(df, k=3, iters=2).collect())
    b = sorted(kmeans_assignments(df, k=3, iters=2).collect())
    assert a == b
