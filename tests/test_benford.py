"""Benford audit — Python replay parity on random magnitudes, the
conformity direction (log-uniform magnitudes conform, uniform ones
don't), zero-filled digit spine, and the non-positive-value filter."""

from __future__ import annotations

import math
import random
from collections import Counter

import pytest

from spanluke_spark.textops.profile import benford_audit


def _py_benford(values):
    digs = [int(str(int(v))[0]) for v in values if v >= 1]
    counts = Counter(digs)
    t = len(digs)
    rows = {}
    chi = mad = 0.0
    for d in range(1, 10):
        p = math.log10(1 + 1 / d)
        n = counts.get(d, 0)
        chi += (n - t * p) ** 2 / (t * p)
        mad += abs(n / t - p) / 9
        rows[d] = (n, round(n / t, 6), round(p, 6))
    return rows, round(chi, 6), round(mad, 6)


def _spark_benford(spark, values):
    df = spark.createDataFrame([(float(v),) for v in values], "v: double")
    out = {
        r["digit"]: (r["n_obs"], r["obs_p"], r["exp_p"], r["chi2"], r["mad"])
        for r in benford_audit(df, "v").collect()
    }
    return out


def test_matches_python_replay(spark):
    rng = random.Random(3)
    values = [10 ** (rng.random() * 4) for _ in range(400)]
    got = _spark_benford(spark, values)
    rows, chi, mad = _py_benford(values)
    assert set(got) == set(range(1, 10))
    for d in rows:
        assert got[d][0] == rows[d][0]
        assert got[d][1] == pytest.approx(rows[d][1], abs=2e-6)
        assert got[d][3] == pytest.approx(chi, abs=2e-4)
        assert got[d][4] == pytest.approx(mad, abs=2e-6)


def test_log_uniform_conforms_uniform_does_not(spark):
    rng = random.Random(7)
    natural = [10 ** (rng.random() * 5) for _ in range(3000)]
    fabricated = [rng.uniform(1, 10000) for _ in range(3000)]
    mad_nat = _spark_benford(spark, natural)[1][4]
    mad_fab = _spark_benford(spark, fabricated)[1][4]
    assert mad_nat < 0.01 < mad_fab


def test_spine_zero_fill_and_positive_filter(spark):
    got = _spark_benford(spark, [1.0, 1.5, 19.0, -5.0, 0.0, 0.3])
    assert got[1][0] == 3  # 1, 1.5, 19; negatives/zeros/sub-1 dropped
    assert all(d in got for d in range(1, 10))
    assert got[7][0] == 0
