"""Mann-Whitney U — scipy-free parity against a textbook Python
implementation (midranks, tie-corrected variance), closed-form anchors
(identical groups -> U = n1 n2 / 2, complete separation -> U extreme),
U1 + U2 = n1 n2 invariant, and empty-group NULL contract."""

from __future__ import annotations

import math
import random

import pytest

from pyspark.sql import functions as F

from spanluke_spark.textops.abtest import mann_whitney_u


def _py_mwu(a, b):
    pooled = sorted([(v, 0) for v in a] + [(v, 1) for v in b])
    # midranks
    ranks = {}
    i = 0
    pos = 1
    vals = [v for v, _ in pooled]
    while i < len(vals):
        j = i
        while j < len(vals) and vals[j] == vals[i]:
            j += 1
        mid = (pos + (pos + (j - i) - 1)) / 2
        ranks[vals[i]] = mid
        pos += j - i
        i = j
    r1 = sum(ranks[v] for v in a)
    n1, n2 = len(a), len(b)
    u1 = r1 - n1 * (n1 + 1) / 2
    n = n1 + n2
    ties = 0
    for v in set(vals):
        t = vals.count(v)
        ties += t**3 - t
    sigma2 = (n1 * n2 / 12) * ((n + 1) - ties / (n * (n - 1)))
    mu = n1 * n2 / 2
    z = (u1 - mu) / math.sqrt(sigma2) if sigma2 > 0 else None
    return n1, n2, u1, n1 * n2 - u1, z, 2 * u1 / (n1 * n2) - 1


def _spark_mwu(spark, a, b):
    rows = [(v, True) for v in a] + [(v, False) for v in b]
    df = spark.createDataFrame(rows, "v: double, t: boolean")
    r = mann_whitney_u(df, F.col("t"), F.col("v")).collect()[0]
    return r["n1"], r["n2"], r["u1"], r["u2"], r["z"], r["rank_biserial"]


def test_python_parity_with_heavy_ties(spark):
    rng = random.Random(8)
    for _ in range(3):
        a = [float(rng.randint(0, 12)) for _ in range(40)]
        b = [float(rng.randint(2, 14)) for _ in range(55)]
        got = _spark_mwu(spark, a, b)
        want = _py_mwu(a, b)
        assert got[:2] == want[:2]
        for g, w in zip(got[2:], want[2:]):
            assert g == pytest.approx(w, abs=1e-6)


def test_identical_groups_center(spark):
    a = [1.0, 2.0, 3.0, 4.0]
    got = _spark_mwu(spark, a, a)
    assert got[2] == pytest.approx(len(a) ** 2 / 2)  # U1 = n1 n2 / 2
    assert got[4] == pytest.approx(0.0, abs=1e-9)
    assert got[5] == pytest.approx(0.0, abs=1e-9)


def test_complete_separation(spark):
    a = [10.0, 11.0, 12.0]
    b = [1.0, 2.0, 3.0]
    n1, n2, u1, u2, z, rb = _spark_mwu(spark, a, b)
    assert (u1, u2) == (9.0, 0.0)  # treatment wins every comparison
    assert rb == 1.0
    assert z > 1.9


def test_u1_plus_u2_invariant(spark):
    rng = random.Random(3)
    a = [float(rng.randint(0, 5)) for _ in range(20)]
    b = [float(rng.randint(0, 5)) for _ in range(30)]
    n1, n2, u1, u2, _, _ = _spark_mwu(spark, a, b)
    assert u1 + u2 == pytest.approx(n1 * n2)


def test_empty_group_nulls(spark):
    df = spark.createDataFrame([(1.0, True), (2.0, True)], "v: double, t: boolean")
    r = mann_whitney_u(df, F.col("t"), F.col("v")).collect()[0]
    assert r["n2"] == 0 and r["z"] is None and r["rank_biserial"] is None


def test_all_tied_degenerate_variance(spark):
    df = spark.createDataFrame(
        [(5.0, True)] * 3 + [(5.0, False)] * 4, "v: double, t: boolean"
    )
    r = mann_whitney_u(df, F.col("t"), F.col("v")).collect()[0]
    assert r["z"] is None  # sigma^2 = 0 -> no z
    assert r["u1"] == pytest.approx(6.0)  # all comparisons are halves
