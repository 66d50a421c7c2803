"""PCA power iteration — numpy eigendecomposition parity (dominant
eigenvector recovered on well-separated spectra), planted-direction
recovery, exact-integer Gram verification, sign-pin determinism, and
variance-share sanity."""

from __future__ import annotations

import math
import random

import numpy as np
import pytest

from spanluke_spark.link.pca import pca_power, py_power_iteration, quantized_scatter


def _mk_df(spark, vecs):
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id: long, embedding: array<float>",
    )


def test_scatter_matches_numpy_exact(spark):
    rng = random.Random(3)
    vecs = [[rng.uniform(-1, 1) for _ in range(6)] for _ in range(40)]
    df = _mk_df(spark, vecs)
    scatter, n = quantized_scatter(df, "embedding", d=6, scale=64)
    q = np.round(np.array(vecs, dtype=np.float32).astype(np.float64) * 64)
    g = q.T @ q
    s = q.sum(axis=0)
    want = g - np.outer(s, s) / len(vecs)
    assert n == 40
    assert np.allclose(np.array(scatter), want, atol=1e-9)


def test_planted_direction_recovered(spark):
    # points along a fixed direction + small deterministic noise
    rng = random.Random(7)
    d = 8
    direction = [1.0, -2.0, 0.5, 3.0, -1.0, 0.25, 2.0, -0.5]
    nrm = math.sqrt(sum(x * x for x in direction))
    unit = [x / nrm for x in direction]
    vecs = []
    for _ in range(200):
        t = rng.uniform(-4, 4)
        vecs.append([t * u + rng.uniform(-0.05, 0.05) for u in unit])
    df = _mk_df(spark, vecs)
    got = {r["dim"]: r["loading"] for r in pca_power(df, d=d, rounds=12).collect()}
    # compare up to the pinned sign convention
    sign = 1.0 if got[3] * unit[3] > 0 else -1.0
    for i in range(d):
        assert got[i] == pytest.approx(sign * unit[i], abs=0.02), i


def test_matches_numpy_dominant_eigvec():
    rng = random.Random(11)
    d = 5
    m = [[0.0] * d for _ in range(d)]
    for i in range(d):
        for j in range(i, d):
            m[i][j] = m[j][i] = rng.uniform(-1, 1)
    for i in range(d):
        m[i][i] += 3.0 * (i + 1)  # separate the spectrum
    v, eig, share = py_power_iteration(m, rounds=60)
    w, vecs = np.linalg.eigh(np.array(m))
    top = vecs[:, int(np.argmax(w))]
    if top[int(np.argmax(np.abs(top)))] < 0:
        top = -top
    assert np.allclose(v, top, atol=1e-6)
    assert eig == pytest.approx(float(np.max(w)), abs=1e-6)
    assert share == pytest.approx(float(np.max(w) / np.trace(np.array(m))), abs=1e-9)


def test_sign_pin_deterministic():
    m = [[4.0, 0.0], [0.0, 1.0]]
    v, _, _ = py_power_iteration(m, rounds=5)
    assert v[0] > 0  # max-|loading| component forced positive


def test_ev_share_bounds(spark):
    rng = random.Random(5)
    vecs = [[rng.uniform(-1, 1) for _ in range(4)] for _ in range(60)]
    df = _mk_df(spark, vecs)
    rows = pca_power(df, d=4, rounds=10).collect()
    share = rows[0]["ev_share"]
    assert 0.25 <= share <= 1.0  # PC1 of a 4-dim cloud explains >= 1/4
    assert all(r["ev_share"] == share for r in rows)
    assert sum(r["loading"] ** 2 for r in rows) == pytest.approx(1.0, abs=1e-4)


def test_zero_matrix_raises():
    with pytest.raises(ValueError):
        py_power_iteration([[0.0, 0.0], [0.0, 0.0]], rounds=3)


def test_gram_pass_plan_audit(spark):
    """The data-sized pass must be one flat projection + one partial+final
    hash aggregate: no join, no window, no cartesian anywhere."""
    from spanluke_spark.link.pca import gram_cells_agg

    df = _mk_df(spark, [[float(i + j) for j in range(6)] for i in range(20)])
    plan = gram_cells_agg(df, d=6)._jdf.queryExecution().executedPlan().toString()
    assert "partial_sum" in plan
    for bad in ("SortMergeJoin", "BroadcastHashJoin", "CartesianProduct", "Window"):
        assert bad not in plan, bad
