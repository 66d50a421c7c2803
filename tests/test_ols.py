"""OLS — numpy lstsq parity, exact recovery of a noiseless planted
relation (R^2 = 1), singularity contract, partitioning invariance."""

from __future__ import annotations

import random

import numpy as np
import pytest

from spanluke_spark.link.ols import ols_fit


def _fit(spark, rows, feats=("x1", "x2"), parts=None):
    df = spark.createDataFrame(
        rows, ", ".join(f"{c}: long" for c in (*feats, "y"))
    )
    if parts:
        df = df.repartition(parts)
    return {r["term"]: r["value"] for r in ols_fit(df, list(feats), "y").collect()}


def test_numpy_lstsq_parity(spark):
    rng = random.Random(42)
    rows = []
    for _ in range(200):
        x1, x2 = rng.randrange(20), rng.randrange(15)
        y = 5 * x1 - 3 * x2 + 11 + rng.randrange(-4, 5)
        rows.append((x1, x2, y))
    got = _fit(spark, rows)
    a = np.array([[1.0, r[0], r[1]] for r in rows])
    yv = np.array([float(r[2]) for r in rows])
    beta, *_ = np.linalg.lstsq(a, yv, rcond=None)
    assert got["intercept"] == pytest.approx(beta[0], abs=1e-6)
    assert got["x1"] == pytest.approx(beta[1], abs=1e-6)
    assert got["x2"] == pytest.approx(beta[2], abs=1e-6)
    pred = a @ beta
    ss_res = float(((yv - pred) ** 2).sum())
    ss_tot = float(((yv - yv.mean()) ** 2).sum())
    assert got["r2"] == pytest.approx(1 - ss_res / ss_tot, abs=1e-6)


def test_noiseless_relation_recovered_exactly(spark):
    rows = [
        (x1, x2, 7 * x1 - 2 * x2 + 3)
        for x1 in range(6)
        for x2 in range(5)
    ]
    got = _fit(spark, rows)
    assert got["x1"] == 7.0 and got["x2"] == -2.0
    assert got["intercept"] == 3.0 and got["r2"] == 1.0


def test_collinear_features_raise(spark):
    rows = [(x, 2 * x, x + 1) for x in range(10)]
    with pytest.raises(ValueError, match="singular"):
        _fit(spark, rows)


def test_partitioning_invariant(spark):
    rng = random.Random(7)
    rows = [
        (rng.randrange(9), rng.randrange(9), rng.randrange(50)) for _ in range(120)
    ]
    assert _fit(spark, rows, parts=1) == _fit(spark, rows, parts=7)


def test_single_feature(spark):
    rows = [(x, 4 * x + 1) for x in range(8)]
    df = spark.createDataFrame(rows, "x: long, y: long")
    got = {r["term"]: r["value"] for r in ols_fit(df, ["x"], "y").collect()}
    assert got == {"intercept": 1.0, "x": 4.0, "r2": 1.0}
