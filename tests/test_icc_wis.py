"""Gates for ICC(1,1) (evaluation/icc.py) and weighted interval
scheduling (etl/wis.py): ICC against a bit-exact replay AND the float
mean-squares definition, perfect agreement exactly 1e6, global-shift
invariance, pure-noise negative, unequal-k NULL; WIS against a python
DP replay, BRUTE-FORCE optimality over every subset of 12-interval
instances, non-overlapping == sum-of-all, same-slot pile == max, and
a fixture where greedy-by-end-time is strictly beaten."""

from __future__ import annotations

from itertools import combinations

from spanluke_spark.etl.wis import weighted_interval_schedule
from spanluke_spark.evaluation.icc import icc_oneway

# ---------------------------------------------------- python replays


def py_icc(groups):
    b = len(groups)
    ks = {len(v) for v in groups.values()}
    k = min(ks)
    t = sum(sum(v) for v in groups.values())
    a = sum(sum(v) ** 2 for v in groups.values())
    s = sum(x * x for v in groups.values() for x in v)
    num = (b * a - t * t) * (k - 1) - (k * s - a) * (b - 1)
    den = (k - 1) * ((b * a - t * t) + (k * s - a) * (b - 1))
    ppm = (
        (abs(num) * 10**6 // den) * (1 if num >= 0 else -1)
        if len(ks) == 1 and den > 0
        else None
    )
    return {"b": b, "k": k, "num": num, "den": den, "icc_ppm": ppm}


def py_wis(intervals):
    iv = sorted(
        [(e, s, w) for s, e, w in intervals if e > s]
    )
    n = len(iv)
    p = [0] * (n + 1)
    for i in range(1, n + 1):
        e_i, s_i, _ = iv[i - 1]
        p[i] = sum(1 for ee, _, _ in iv if ee <= s_i)
    m = [0] * (n + 1)
    for i in range(1, n + 1):
        m[i] = max(m[i - 1], iv[i - 1][2] + m[p[i]])
    total = sum(w for _, _, w in iv)
    return {
        "n_intervals": n,
        "total_weight": total,
        "best_weight": m[n],
        "util_ppm": m[n] * 10**6 // total if total else None,
    }


def brute_best(intervals):
    iv = [t for t in intervals if t[1] > t[0]]
    best = 0
    for r in range(len(iv) + 1):
        for sub in combinations(iv, r):
            ok = all(
                a[1] <= b[0] or b[1] <= a[0]
                for a, b in combinations(sub, 2)
            )
            if ok:
                best = max(best, sum(w for _, _, w in sub))
    return best


def _run_icc(spark, groups):
    rows = [(d, x) for d, vs in groups.items() for x in vs]
    df = spark.createDataFrame(rows, "doc long, value long")
    return icc_oneway(df).collect()[0].asDict()


def _run_wis(spark, intervals):
    df = spark.createDataFrame(
        intervals, "start long, end long, weight long"
    )
    return weighted_interval_schedule(df).collect()[0].asDict()


GROUPS = {
    d: [(d * 7) % 30 + (d * 3 + r * 5) % 4 for r in range(3)]
    for d in range(40)
}


# ----------------------------------------------------------------- icc


def test_icc_matches_replay_and_float(spark):
    got = _run_icc(spark, GROUPS)
    assert got == py_icc(GROUPS)
    b, k = 40, 3
    t = sum(sum(v) for v in GROUPS.values())
    a = sum(sum(v) ** 2 for v in GROUPS.values())
    s = sum(x * x for v in GROUPS.values() for x in v)
    ssb = a / k - t * t / (b * k)
    ssw = s - a / k
    msb, msw = ssb / (b - 1), ssw / (b * (k - 1))
    f = (msb - msw) / (msb + (k - 1) * msw)
    assert got["icc_ppm"] == int(f * 10**6)


def test_icc_perfect_agreement(spark):
    g = {d: [(d * 7) % 30] * 3 for d in range(30)}
    assert _run_icc(spark, g)["icc_ppm"] == 10**6


def test_icc_global_shift_invariance(spark):
    shifted = {d: [x + 100 for x in v] for d, v in GROUPS.items()}
    a, b = _run_icc(spark, GROUPS), _run_icc(spark, shifted)
    assert a["num"] == b["num"] and a["den"] == b["den"]


def test_icc_pure_noise_negative(spark):
    g = {
        d: [((d * 3 + r * 11 + d * r) * 7) % 30 for r in range(3)]
        for d in range(40)
    }
    assert _run_icc(spark, g)["icc_ppm"] < 0


def test_icc_unequal_k_null(spark):
    g = dict(GROUPS)
    g[0] = g[0] + [5]
    assert _run_icc(spark, g)["icc_ppm"] is None


# ----------------------------------------------------------------- wis

INTERVALS = [
    ((e * 7) % 240, (e * 7) % 240 + 3 + (e * 5) % 20, 1 + (e * 3) % 10)
    for e in range(120)
]


def test_wis_matches_replay(spark):
    assert _run_wis(spark, INTERVALS) == py_wis(INTERVALS)


def test_wis_brute_force_optimality(spark):
    for seed in (3, 5, 11):
        iv = [
            ((e * seed) % 40,
             (e * seed) % 40 + 1 + (e * 7) % 9,
             1 + (e * 5) % 6)
            for e in range(12)
        ]
        got = _run_wis(spark, iv)
        assert got["best_weight"] == brute_best(iv)


def test_wis_non_overlapping_takes_all(spark):
    iv = [(10 * i, 10 * i + 8, 2 + i % 3) for i in range(15)]
    got = _run_wis(spark, iv)
    assert got["best_weight"] == got["total_weight"]
    assert got["util_ppm"] == 10**6


def test_wis_same_slot_takes_max(spark):
    iv = [(0, 10, w) for w in (3, 9, 4, 7)]
    got = _run_wis(spark, iv)
    assert got["best_weight"] == 9


def test_wis_beats_greedy_by_end(spark):
    """Greedy-by-end picks [0,2)+... the cheap early enders; the DP
    takes the one heavy long window."""
    iv = [(0, 2, 1), (2, 4, 1), (0, 10, 50)]
    got = _run_wis(spark, iv)
    assert got["best_weight"] == 50  # greedy-by-end would score 2


def test_wis_half_open_compatibility(spark):
    """end == next start is compatible: [0,5)+[5,10) both taken."""
    iv = [(0, 5, 4), (5, 10, 4)]
    assert _run_wis(spark, iv)["best_weight"] == 8
