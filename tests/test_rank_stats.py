"""Kendall tau-b and KS two-sample — scipy-formula replay in pure
Python, perfect agreement/disagreement poles, tie handling, identical
distributions, and exact-integer D."""

from __future__ import annotations

import math
import random

import pytest

from pyspark.sql import functions as F

from spanluke_spark.textops.abtest import kendall_tau_b, ks_two_sample


def _py_tau_b(pairs):
    n = len(pairs)
    c = d = 0
    for i in range(n):
        for j in range(i + 1, n):
            s = (pairs[i][0] - pairs[j][0]) * (pairs[i][1] - pairs[j][1])
            c += s > 0
            d += s < 0
    n0 = n * (n - 1) / 2
    tx = {}
    ty = {}
    for x, y in pairs:
        tx[x] = tx.get(x, 0) + 1
        ty[y] = ty.get(y, 0) + 1
    n1 = sum(t * (t - 1) / 2 for t in tx.values())
    n2 = sum(t * (t - 1) / 2 for t in ty.values())
    den = math.sqrt((n0 - n1) * (n0 - n2))
    return c, d, (c - d) / den if den > 0 else None


def _spark_tau(spark, pairs):
    df = spark.createDataFrame(pairs, "x: long, y: long")
    return kendall_tau_b(df, F.col("x"), F.col("y")).collect()[0]


def test_tau_python_parity(spark):
    rng = random.Random(31)
    pairs = [(rng.randrange(8), rng.randrange(6)) for _ in range(80)]
    row = _spark_tau(spark, pairs)
    c, d, tau = _py_tau_b(pairs)
    assert (row["concordant"], row["discordant"]) == (c, d)
    assert row["tau_b"] == pytest.approx(tau, abs=1e-6)
    assert row["n"] == 80


def test_tau_perfect_agreement_and_reversal(spark):
    inc = [(i, 2 * i) for i in range(12)]
    assert _spark_tau(spark, inc)["tau_b"] == 1.0
    dec = [(i, -3 * i) for i in range(12)]
    assert _spark_tau(spark, dec)["tau_b"] == -1.0


def test_tau_all_tied_is_null(spark):
    row = _spark_tau(spark, [(1, y) for y in range(5)])
    assert row["tau_b"] is None  # zero x-variance -> undefined


def _py_ks(vals1, vals2):
    support = sorted(set(vals1) | set(vals2))
    n1, n2 = len(vals1), len(vals2)
    dnum = 0
    for x in support:
        c1 = sum(v <= x for v in vals1)
        c2 = sum(v <= x for v in vals2)
        dnum = max(dnum, abs(c1 * n2 - c2 * n1))
    return dnum, dnum / (n1 * n2)


def _spark_ks(spark, vals1, vals2):
    rows = [(v, 1) for v in vals1] + [(v, 0) for v in vals2]
    df = spark.createDataFrame(rows, "v: long, g: int")
    return ks_two_sample(df, F.col("g") == 1, F.col("v")).collect()[0]


def test_ks_python_parity(spark):
    rng = random.Random(17)
    v1 = [rng.randrange(30) for _ in range(60)]
    v2 = [rng.randrange(25, 55) for _ in range(45)]
    row = _spark_ks(spark, v1, v2)
    dnum, d = _py_ks(v1, v2)
    assert row["d_num"] == dnum
    assert row["d"] == pytest.approx(d, abs=1e-6)
    assert row["ks_stat"] == pytest.approx(
        math.sqrt(60 * 45 / 105) * d, abs=1e-6
    )


def test_ks_identical_distributions_zero(spark):
    v = list(range(20)) * 2
    row = _spark_ks(spark, v, v)
    assert row["d_num"] == 0 and row["d"] == 0.0


def test_ks_disjoint_supports_one(spark):
    row = _spark_ks(spark, [1, 2, 3], [10, 11])
    assert row["d"] == 1.0


def test_ks_empty_group_null(spark):
    df = spark.createDataFrame([(5, 1), (6, 1)], "v: long, g: int")
    row = ks_two_sample(df, F.col("g") == 1, F.col("v")).collect()[0]
    assert row["d"] is None and row["ks_stat"] is None
