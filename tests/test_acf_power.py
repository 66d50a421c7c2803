"""ACF (etl/acf.py) and voting power (graph/power.py) gates: brute
Python replay of the n^2-scaled integer ACF on planted periodic /
trending / constant / noise series, lag-gap semantics, and the
classic Shapley-Shubik anchors — the 49/49/2 equal-power parliament,
the dictator-and-dummies game, the efficiency axiom sum(ss_num) = n!."""

from __future__ import annotations

import pytest

from spanluke_spark.etl.acf import acf
from spanluke_spark.graph.power import MAX_PLAYERS, voting_power


def py_acf(values, max_lag):
    n = len(values)
    s = sum(values)
    c = [n * x - s for x in values]
    den = sum(v * v for v in c)
    out = {}
    for lag in range(1, max_lag + 1):
        pairs = [(c[t], c[t + lag]) for t in range(n - lag)]
        if not pairs:
            continue
        num = sum(a * b for a, b in pairs)
        if den == 0:
            ppm = None
        else:
            mag = abs(num) * 1_000_000 // den
            ppm = -mag if num < 0 else mag
        out[lag] = (len(pairs), num, den, ppm)
    return out


def acf_fixture():
    return {
        "periodic": [(i % 3) * 10 for i in range(30)],       # period 3
        "trend": list(range(24)),
        "flat": [5] * 12,
        "noise": [(i * 2654435761) % 101 for i in range(40)],
    }


def test_acf_matches_python_replay(spark):
    fx = acf_fixture()
    rows = [(k, b, v) for k, vals in fx.items() for b, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "key string, bucket int, x long")
    got = {
        (r["key"], r["lag"]): r
        for r in acf(df, max_lag=6).collect()
    }
    for k, vals in fx.items():
        want = py_acf(vals, 6)
        for lag, (n_pairs, num, den, ppm) in want.items():
            r = got[(k, lag)]
            assert (r["n_pairs"], r["acf_num"], r["acf_den"]) == (
                n_pairs,
                num,
                den,
            ), (k, lag)
            assert r["acf_ppm"] == ppm, (k, lag)
    # structure: periodic spikes at its period, trend decays slowly
    assert got[("periodic", 3)]["acf_ppm"] > 800_000
    assert got[("periodic", 1)]["acf_ppm"] < 0
    assert got[("trend", 1)]["acf_ppm"] > 800_000
    assert got[("flat", 1)]["acf_ppm"] is None
    assert abs(got[("noise", 1)]["acf_ppm"]) < 300_000


def test_acf_bucket_gap_drops_pairs(spark):
    # buckets 0,1,2,4 -> lag-1 pairs are (0,1),(1,2) only; lag-2 gets (2,4)
    rows = [("g", b, x) for b, x in [(0, 1), (1, 4), (2, 2), (4, 9)]]
    df = spark.createDataFrame(rows, "key string, bucket int, x long")
    got = {r["lag"]: r for r in acf(df, max_lag=3).collect()}
    assert got[1]["n_pairs"] == 2
    assert got[2]["n_pairs"] == 2  # (0,2) and (2,4)
    assert got[3]["n_pairs"] == 1  # (1,4)


def test_acf_rejects_bad_lag(spark):
    df = spark.createDataFrame([("g", 0, 1)], "key string, bucket int, x long")
    with pytest.raises(ValueError):
        acf(df, max_lag=0)


# ------------------------------------------------------------ power


def test_power_49_49_2_equal_power(spark):
    df = spark.createDataFrame(
        [("a", 49), ("b", 49), ("c", 2)], "id string, w long"
    )
    got = {r["id"]: r for r in voting_power(df).collect()}
    for i in "abc":
        r = got[i]
        assert (r["ss_num"], r["ss_den"]) == (2, 6)  # 1/3 each
        assert (r["bz_num"], r["bz_den"]) == (2, 4)
        assert r["quota"] == 51
    assert got["c"]["ss_ppm"] == got["a"]["ss_ppm"] == 333_333


def test_power_dictator_and_dummies(spark):
    df = spark.createDataFrame(
        [("a", 4), ("b", 2), ("c", 1)], "id string, w long"
    )
    got = {r["id"]: r for r in voting_power(df, quota=4).collect()}
    assert got["a"]["ss_num"] == 6 and got["a"]["ss_ppm"] == 1_000_000
    for i in "bc":
        assert got[i]["ss_num"] == 0 and got[i]["bz_num"] == 0


def test_power_efficiency_axiom_and_symmetry(spark):
    df = spark.createDataFrame(
        [(f"p{i}", 10 + (i * 7) % 5) for i in range(6)], "id string, w long"
    )
    rows = voting_power(df).collect()
    assert sum(r["ss_num"] for r in rows) == 720  # 6!
    # equal weights -> equal power
    eq = spark.createDataFrame(
        [(f"p{i}", 3) for i in range(5)], "id string, w long"
    )
    got = voting_power(eq).collect()
    assert len({(r["ss_num"], r["bz_num"]) for r in got}) == 1
    assert sum(r["ss_num"] for r in got) == 120


def test_power_bounds(spark):
    too_many = spark.createDataFrame(
        [(f"p{i}", 1) for i in range(MAX_PLAYERS + 1)], "id string, w long"
    )
    with pytest.raises(ValueError):
        voting_power(too_many)
