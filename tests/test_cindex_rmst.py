"""Gates for etl/survival.c_index and rmst: c-index against an
O(n^2) replay implementing the Harrell permissibility rules, the
perfect-risk exact-1e6 lane, constant-risk exact-500000, reversal
complement, censoring-shrinks-permissible, empty-permissible NULL;
RMST against a float step-integral replay, no-deaths == tau,
everyone-dies-at-t1 == t1, tau monotonicity and the tau bound."""

from __future__ import annotations

from spanluke_spark.etl.survival import c_index, rmst

# ---------------------------------------------------- python replays


def py_cindex(rows):
    n = len(rows)
    perm = conc = ties = 0
    for ti, ei, ri in rows:
        for tj, ej, rj in rows:
            ok = (ti < tj and ei == 1) or (
                ti == tj and ei == 1 and ej == 0
            )
            if not ok:
                continue
            perm += 1
            if ri > rj:
                conc += 1
            elif ri == rj:
                ties += 1
    return {
        "n": n,
        "permissible": perm,
        "concordant": conc,
        "risk_ties": ties,
        "c_ppm": (
            (2 * conc + ties) * 10**6 // (2 * perm) if perm else None
        ),
    }


def py_rmst(pairs, tau):
    from collections import Counter

    per = {}
    for t, e in pairs:
        d = per.setdefault(t, [0, 0])
        d[0] += e
        d[1] += 1
    times = sorted(per)
    at_risk = len(pairs)
    s = 1.0
    area = min(times[0], tau) if times else tau
    surv = []
    for t in times:
        deaths, arrivals = per[t]
        s *= 1 - deaths / at_risk
        surv.append((t, round(s, 6)))
        at_risk -= arrivals
    for i, (t, sv) in enumerate(surv):
        t_next = surv[i + 1][0] if i + 1 < len(surv) else tau
        area += sv * max(min(t_next, tau) - min(t, tau), 0)
    return round(area, 6)


def _run_ci(spark, rows):
    df = spark.createDataFrame(
        list(rows), "duration long, event long, risk long"
    )
    return c_index(df).collect()[0].asDict()


def _run_rmst(spark, pairs, tau):
    df = spark.createDataFrame(list(pairs), "duration long, event long")
    return rmst(df, tau).collect()[0].asDict()


ROWS = [
    ((i * 7) % 11 + 1, 0 if i % 5 == 0 else 1, (i * 3) % 9)
    for i in range(40)
]


def test_cindex_matches_replay(spark):
    assert _run_ci(spark, ROWS) == py_cindex(ROWS)


def test_cindex_exact_lanes(spark):
    perfect = [(t, 1, 100 - t) for t in range(1, 21)]
    got = _run_ci(spark, perfect)
    assert got["c_ppm"] == 10**6
    const = [(t, 1, 5) for t in range(1, 21)]
    assert _run_ci(spark, const)["c_ppm"] == 500_000
    reversed_ = [(t, 1, t) for t in range(1, 21)]
    assert _run_ci(spark, reversed_)["c_ppm"] == 0


def test_cindex_censoring_shrinks_and_null(spark):
    full = [(t, 1, 50 - t) for t in range(1, 16)]
    censored = [(t, 1 if t % 2 else 0, 50 - t) for t in range(1, 16)]
    a = _run_ci(spark, full)
    b = _run_ci(spark, censored)
    assert b == py_cindex(censored)
    assert b["permissible"] < a["permissible"]
    none = _run_ci(spark, [(5, 0, 1), (7, 0, 2)])
    assert none["c_ppm"] is None


def test_rmst_matches_replay(spark):
    pairs = [((i * 7) % 11 + 1, 0 if i % 5 == 0 else 1)
             for i in range(40)]
    got = _run_rmst(spark, pairs, 8)
    assert abs(got["rmst"] - py_rmst(pairs, 8)) <= 2e-6


def test_rmst_closed_forms(spark):
    no_deaths = [(t % 6 + 1, 0) for t in range(20)]
    got = _run_rmst(spark, no_deaths, 10)
    assert got["rmst"] == 10.0
    sudden = [(4, 1)] * 15
    got2 = _run_rmst(spark, sudden, 10)
    assert got2["rmst"] == 4.0


def test_rmst_monotone_and_bounded(spark):
    pairs = [((i * 5) % 9 + 1, 1 if i % 4 else 0) for i in range(30)]
    vals = [_run_rmst(spark, pairs, tau)["rmst"] for tau in (3, 6, 12)]
    assert vals[0] <= vals[1] <= vals[2]
    assert all(v <= tau for v, tau in zip(vals, (3, 6, 12)))
