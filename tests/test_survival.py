"""Kaplan-Meier — parity with a textbook product-limit replay
(lifelines-style) on random censored lifetimes, the no-censoring
degenerate case (KM == empirical survival), censoring-shrinks-risk-set
semantics, and the whole-risk-set-dies zero branch."""

from __future__ import annotations

import math
import random
from collections import Counter

import pytest

from spanluke_spark.etl.survival import kaplan_meier


def _py_km(obs):
    """obs: list of (duration, event). -> {t: (n_risk, d, c, S(t))}."""
    deaths = Counter(t for t, e in obs if e)
    cens = Counter(t for t, e in obs if not e)
    times = sorted(set(deaths) | set(cens))
    out = {}
    s = 1.0
    for t in times:
        n = sum(1 for u, _ in obs if u >= t)
        d = deaths.get(t, 0)
        f = 1 - d / n
        s = 0.0 if (s == 0.0 or f <= 0) else s * f
        out[t] = (n, d, cens.get(t, 0), round(s, 6))
    return out


def _spark_km(spark, obs, cohort="x"):
    rows = [(cohort, t, e) for t, e in obs]
    df = spark.createDataFrame(rows, "host: string, duration: long, event: int")
    res = kaplan_meier(df, cohort_col="host")
    return {
        r["t"]: (r["n_risk"], r["deaths"], r["censored"], r["survival"])
        for r in res.collect()
    }


@pytest.mark.parametrize("seed", [1, 4])
def test_matches_textbook_replay(spark, seed):
    rng = random.Random(seed)
    obs = [(rng.randrange(10), int(rng.random() < 0.75)) for _ in range(200)]
    got = _spark_km(spark, obs)
    want = _py_km(obs)
    assert set(got) == set(want)
    for t in want:
        assert got[t][:3] == want[t][:3]
        assert got[t][3] == pytest.approx(want[t][3], abs=2e-6)


def test_no_censoring_equals_empirical_survival(spark):
    obs = [(t, 1) for t in [1, 1, 2, 3, 3, 3, 5, 8]]
    got = _spark_km(spark, obs)
    n = len(obs)
    for t, row in got.items():
        alive = sum(1 for u, _ in obs if u > t)
        assert row[3] == pytest.approx(alive / n, abs=2e-6)


def test_censoring_removes_from_risk_set_without_death(spark):
    # one death at t=2 out of 3 at risk (the t=1 censor already left)
    obs = [(1, 0), (2, 1), (3, 1), (4, 0)]
    got = _spark_km(spark, obs)
    assert got[1] == (4, 0, 1, 1.0)
    assert got[2][0] == 3 and got[2][3] == pytest.approx(2 / 3, abs=2e-6)


def test_whole_risk_set_dies_hits_exact_zero(spark):
    obs = [(1, 1), (2, 1), (2, 1)]
    got = _spark_km(spark, obs)
    assert got[2][3] == 0.0
