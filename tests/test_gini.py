"""Gini concentration — closed-form anchors (perfect equality -> 0,
single-owner -> (n-1)/n), Python replay parity on random values, and
the zero-total NULL contract."""

from __future__ import annotations

import random

import pytest

from spanluke_spark.textops.profile import gini_concentration


def _py_gini(values):
    xs = sorted(values)
    n = len(xs)
    tot = sum(xs)
    if tot == 0:
        return None
    return round(
        2 * sum((i + 1) * x for i, x in enumerate(xs)) / (n * tot)
        - (n + 1) / n,
        6,
    )


def _spark_gini(spark, values):
    df = spark.createDataFrame(
        [(f"k{i}", float(v)) for i, v in enumerate(values)],
        "host: string, n_pages: double",
    )
    r = gini_concentration(df, "n_pages", "host").collect()[0]
    return r["n"], r["total"], r["gini"]


def test_equality_and_monopoly_anchors(spark):
    n, tot, g = _spark_gini(spark, [5.0] * 8)
    assert (n, tot, g) == (8, 40.0, 0.0)
    n, tot, g = _spark_gini(spark, [0.0] * 9 + [100.0])
    assert g == pytest.approx((10 - 1) / 10, abs=1e-6)


def test_matches_python_replay(spark):
    for seed in (1, 5):
        rng = random.Random(seed)
        vals = [rng.randrange(0, 50) for _ in range(30)]
        got = _spark_gini(spark, vals)[2]
        assert got == pytest.approx(_py_gini(vals), abs=2e-6)


def test_zero_total_gives_null(spark):
    assert _spark_gini(spark, [0.0, 0.0])[2] is None


def test_more_skew_more_gini(spark):
    even = _spark_gini(spark, [10.0] * 10)[2]
    mild = _spark_gini(spark, [5.0] * 9 + [55.0])[2]
    harsh = _spark_gini(spark, [1.0] * 9 + [91.0])[2]
    assert even < mild < harsh
