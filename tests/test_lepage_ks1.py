"""Gates for scaletests.lepage and evaluation/ks1.ks_uniform:
Lepage against the sum of its own replayed components, the
location-only / scale-only decomposition (each firing its half),
the joint alternative beating both single tests, constant NULL;
KS-uniform against an exact replay, the balanced exact-zero lane,
the one-bucket pileup closed form (K-1)/K, a smooth drift KS
catches, out-of-range and empty statuses."""

from __future__ import annotations

from spanluke_spark.evaluation.ks1 import ks_uniform
from spanluke_spark.evaluation.scaletests import (
    ansari_bradley,
    lepage,
)

# ---------------------------------------------------- python replays


def _drs(values):
    out = {}
    for v in set(values):
        less = sum(1 for u in values if u < v)
        eq = sum(1 for u in values if u == v)
        out[v] = 2 * less + eq + 1
    return out


def py_linear_z2(rows, kind):
    nn = len(rows)
    dr = _drs([x for _, x in rows])

    def score(x):
        if kind == "wilcoxon":
            return dr[x]
        return min(dr[x], 2 * (nn + 1) - dr[x])

    m = sum(1 for g, _ in rows if g == 0)
    n = nn - m
    t = sum(score(x) for g, x in rows if g == 0)
    s_all = sum(score(x) for _, x in rows)
    s2 = sum(score(x) ** 2 for _, x in rows)
    num = (nn * t - m * s_all) ** 2 * (nn - 1)
    den = m * n * (nn * s2 - s_all * s_all)
    if m == 0 or n == 0 or den <= 0:
        return None
    return num * 1000 // den


def py_ks(buckets, k):
    from collections import Counter

    c = Counter(buckets)
    n = len(buckets)
    cum = 0
    mx = 0
    for b in range(k):
        cum += c.get(b, 0)
        mx = max(mx, abs(k * cum - n * (b + 1)))
    return {
        "n": n,
        "k": k,
        "max_d_num": mx,
        "d_ppm": mx * 10**6 // (n * k),
        "sig05": 10**6 * mx * mx * n > 1844164 * (n * k) ** 2,
        "status": "ok",
    }


def _run_lepage(spark, rows):
    df = spark.createDataFrame(list(rows), "grp long, x long")
    return lepage(df).collect()[0].asDict()


def _run_ks(spark, buckets, k):
    df = spark.createDataFrame([(int(b),) for b in buckets], "bucket long")
    return ks_uniform(df, k).collect()[0].asDict()


LOC = [(0, 20 + (i * 3) % 7) for i in range(25)] + [
    (1, 14 + (i * 3) % 7) for i in range(25)
]
SCALE = [(0, (i * 17) % 40) for i in range(30)] + [
    (1, 15 + (i * 17) % 10) for i in range(30)
]
# overlap matters: a fully separated shift leaves the folded AB
# scores perfectly symmetric (zero scale power) — offset 10 keeps
# both a real shift and a real spread difference in play
BOTH = [(0, 10 + (i * 17) % 40) for i in range(30)] + [
    (1, 15 + (i * 17) % 10) for i in range(30)
]


def test_lepage_is_sum_of_components(spark):
    for rows in (LOC, SCALE, BOTH):
        got = _run_lepage(spark, rows)
        assert got["z2_w_milli"] == py_linear_z2(rows, "wilcoxon")
        assert got["z2_ab_milli"] == py_linear_z2(rows, "ansari")
        assert got["l_milli"] == got["z2_w_milli"] + got["z2_ab_milli"]


def test_lepage_decomposition(spark):
    loc = _run_lepage(spark, LOC)
    sca = _run_lepage(spark, SCALE)
    assert loc["z2_w_milli"] > 10 * max(loc["z2_ab_milli"], 1)
    assert sca["z2_ab_milli"] > 10 * max(sca["z2_w_milli"], 1)
    assert loc["sig05"] is True and sca["sig05"] is True


def test_lepage_joint_beats_parts(spark):
    both = _run_lepage(spark, BOTH)
    assert both["l_milli"] > both["z2_w_milli"]
    assert both["l_milli"] > both["z2_ab_milli"]
    assert both["sig05"] is True


def test_lepage_constant_null(spark):
    got = _run_lepage(spark, [(i % 2, 7) for i in range(20)])
    assert got["l_milli"] is None and got["sig05"] is None


def test_ks_matches_replay_and_drift(spark):
    drift = [min(int((i / 60) ** 2 * 8), 7) for i in range(60)]
    got = _run_ks(spark, drift, 8)
    assert got == py_ks(drift, 8)
    assert got["sig05"] is True  # smooth right-shift: KS territory


def test_ks_balanced_exact_zero(spark):
    got = _run_ks(spark, [i % 8 for i in range(64)], 8)
    assert got["d_ppm"] == 0 and got["sig05"] is False


def test_ks_pileup_closed_form(spark):
    got = _run_ks(spark, [3] * 40, 8)
    assert got == py_ks([3] * 40, 8)
    # cumulative jumps to n at bucket 3: D = 1 - (3+1)/8 = (K-4)/K;
    # the generic worst case 1 - 1/K happens at bucket 0
    got0 = _run_ks(spark, [0] * 40, 8)
    assert got0["d_ppm"] == 10**6 * 7 // 8


def test_ks_status_lanes(spark):
    got = _run_ks(spark, [1, 2, 99], 8)
    assert got["status"] == "out_of_range" and got["d_ppm"] is None
    empty = spark.createDataFrame([], "bucket long")
    got2 = ks_uniform(empty, 8).collect()[0].asDict()
    assert got2["status"] == "empty"
