"""Priority sampling (textops/psample.py) and Mann-Kendall trend
(etl/trend.py) gates: bit-exact Python replay of priorities/tau/
estimates, the small-population exact case, subset-sum sanity, planted
monotone/constant/noisy series verdicts, tie-corrected variance
replay, and the exact-integer significance inequality."""

from __future__ import annotations

import hashlib
from collections import Counter

import pytest

from spanluke_spark.etl.trend import mann_kendall
from spanluke_spark.textops.psample import SCALE, priority_sample


def py_hash(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def psample_fixture(n=200):
    # skewed weights 1..~60
    return [(i, 1 + (i * i) % 60) for i in range(n)]


def py_priorities(rows, salt="psample"):
    out = []
    for i, w in rows:
        u = py_hash(f"{i}|{salt}") % SCALE + 1
        out.append((w * SCALE * SCALE // u, i, w, u))
    return sorted(out, key=lambda t: (-t[0], t[1]))


def test_priority_sample_matches_python_replay(spark):
    rows = psample_fixture()
    df = spark.createDataFrame(rows, "id long, weight long")
    k = 50
    got = {r["id"]: r for r in priority_sample(df, k).collect()}
    pri = py_priorities(rows)
    want_sample = pri[:k]
    tau = pri[k][0]
    assert len(got) == k
    for p, i, w, u in want_sample:
        r = got[i]
        assert (r["priority"], r["weight"], r["u_scaled"]) == (p, w, u)
        assert r["tau"] == tau
        assert r["w_hat"] == max(w, tau // SCALE)


def test_priority_sample_small_population_exact(spark):
    rows = psample_fixture(30)
    df = spark.createDataFrame(rows, "id long, weight long")
    got = priority_sample(df, 50).collect()
    assert len(got) == 30
    for r in got:
        assert r["tau"] == 0 and r["w_hat"] == r["weight"]
    assert sum(r["w_hat"] for r in got) == sum(w for _, w in rows)


def test_priority_sample_subset_sum_sanity(spark):
    rows = psample_fixture()
    total = sum(w for _, w in rows)
    df = spark.createDataFrame(rows, "id long, weight long")
    got = priority_sample(df, 60).collect()
    est_total = sum(r["w_hat"] for r in got)
    assert 0.5 * total <= est_total <= 2.0 * total
    # subset predicate: even ids — estimate from the sample only
    sub_true = sum(w for i, w in rows if i % 2 == 0)
    sub_est = sum(r["w_hat"] for r in got if r["id"] % 2 == 0)
    assert 0.35 * sub_true <= sub_est <= 2.5 * sub_true


def py_mk(values):
    s = 0
    n = len(values)
    for i in range(n):
        for j in range(i + 1, n):
            s += (values[j] > values[i]) - (values[j] < values[i])
    ties = Counter(values)
    tie_term = sum(t * (t - 1) * (2 * t + 5) for t in ties.values())
    var18 = n * (n - 1) * (2 * n + 5) - tie_term
    return s, var18


def trend_fixture():
    series = {
        "up": [i + (i * 7) % 3 for i in range(24)],           # monotone-ish
        "down": [100 - 4 * i + (i * 5) % 3 for i in range(24)],
        "flat": [7] * 24,                                       # all tied
        "noise": [(i * 2654435761) % 97 for i in range(24)],    # hash noise
    }
    rows = []
    for k, vals in series.items():
        rows += [(k, b, v) for b, v in enumerate(vals)]
    return series, rows


def test_mann_kendall_verdicts_and_replay(spark):
    series, rows = trend_fixture()
    df = spark.createDataFrame(rows, "key string, bucket int, x long")
    got = {r["key"]: r for r in mann_kendall(df, "key", "bucket", "x").collect()}
    for k, vals in series.items():
        s, var18 = py_mk(vals)
        r = got[k]
        assert (r["n"], r["s"], r["var18"]) == (len(vals), s, var18), k
        sig = abs(s) >= 2 and (abs(s) - 1) ** 2 * 18 * 10**6 > var18 * 3841459
        want = "no_trend" if not sig else ("increasing" if s > 0 else "decreasing")
        assert r["trend"] == want, (k, s, var18)
    assert got["up"]["trend"] == "increasing"
    assert got["down"]["trend"] == "decreasing"
    assert got["flat"]["trend"] == "no_trend" and got["flat"]["var18"] == 0
    assert got["noise"]["trend"] == "no_trend"


def test_mann_kendall_99_stricter_than_95(spark):
    # a weak trend significant at 95 but not 99: search a small planted
    # series deterministically, then assert the two confidences differ
    _, rows = trend_fixture()
    weak = [(0, 1), (1, 3), (2, 2), (3, 4), (4, 3), (5, 5), (6, 4), (7, 6), (8, 5)]
    rows = [("weak", b, v) for b, v in weak]
    s, var18 = py_mk([v for _, v in weak])
    sig95 = (abs(s) - 1) ** 2 * 18 * 10**6 > var18 * 3841459
    sig99 = (abs(s) - 1) ** 2 * 18 * 10**6 > var18 * 6634897
    assert sig95 and not sig99  # fixture pinned to the gap
    df = spark.createDataFrame(rows, "key string, bucket int, x long")
    r95 = mann_kendall(df, confidence=95).collect()[0]
    r99 = mann_kendall(df, confidence=99).collect()[0]
    assert r95["trend"] == "increasing" and r99["trend"] == "no_trend"


def test_mann_kendall_invalid_confidence(spark):
    _, rows = trend_fixture()
    df = spark.createDataFrame(rows, "key string, bucket int, x long")
    with pytest.raises(ValueError):
        mann_kendall(df, confidence=90)
