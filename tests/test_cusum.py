"""CUSUM change-point detection — the closed form must equal the
textbook recursion (Python replay, random series), a planted persistent
mean shift must alarm AFTER the shift and never before, and the
fixed-target mode must bypass self-calibration."""

from __future__ import annotations

import random

import pytest

from spanluke_spark.etl.bursts import cusum_changepoints


def _py_cusum(xs, mu, k):
    sp = sm = 0.0
    out = []
    for x in xs:
        sp = max(0.0, sp + (x - mu) - k)
        sm = max(0.0, sm - (x - mu) - k)
        out.append((round(sp, 6), round(sm, 6)))
    return out


def _spark_cusum(spark, rows, **kw):
    df = spark.createDataFrame(rows, "key: string, t: long, x: double")
    res = cusum_changepoints(df, **kw)
    return {
        (r["key"], r["t"]): (r["s_plus"], r["s_minus"], r["alarm"])
        for r in res.collect()
    }


@pytest.mark.parametrize("seed", [1, 5])
def test_closed_form_equals_recursion(spark, seed):
    rng = random.Random(seed)
    rows = []
    series = {}
    for key in ("a", "b", "c"):
        xs = [rng.randrange(-4, 9) / 2.0 for _ in range(30)]
        series[key] = xs
        rows += [(key, t, x) for t, x in enumerate(xs)]
    got = _spark_cusum(spark, rows, k=0.5, h=3.0)
    for key, xs in series.items():
        mu = sum(xs) / len(xs)
        want = _py_cusum(xs, mu, 0.5)
        for t, (sp, sm) in enumerate(want):
            g = got[(key, t)]
            assert g[0] == pytest.approx(sp, abs=2e-6)
            assert g[1] == pytest.approx(sm, abs=2e-6)
            assert g[2] == (sp > 3.0 or sm > 3.0)


def test_planted_shift_alarms_after_not_before(spark):
    # steady 5.0 for 20 steps, then a persistent +1.5 drift; target
    # pinned to the in-control mean so calibration can't absorb it
    xs = [5.0] * 20 + [6.5] * 15
    rows = [("h", t, x) for t, x in enumerate(xs)]
    got = _spark_cusum(spark, rows, k=0.5, h=4.0, target=5.0)
    alarms = sorted(t for (k_, t), v in got.items() if v[2])
    assert alarms and min(alarms) > 20
    assert all(t >= 24 for t in alarms)  # needs ceil(4/(1.5-0.5)) steps


def test_downward_shift_hits_s_minus(spark):
    xs = [5.0] * 10 + [3.0] * 10
    rows = [("h", t, x) for t, x in enumerate(xs)]
    got = _spark_cusum(spark, rows, k=0.5, h=3.0, target=5.0)
    assert any(v[1] > 3.0 for v in got.values())
    assert all(v[0] == 0.0 for v in got.values())
