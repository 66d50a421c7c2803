"""Gates for Brown-Forsythe (evaluation/levene.py) and Nelson-Aalen
(etl/survival.py): BF against a bit-exact doubled-median replay AND a
float F cross-check, planted scale difference significant vs
equal-spread null, location-shift invariance (the property that makes
it a scale test), unequal-size NULL contract, zero-spread NULL;
NA against a replay, the censoring contract (censored rows shrink
risk sets but emit no step), the no-censoring harmonic closed form,
monotonicity, and exp(-H) >= S_KM (Breslow >= product-limit)."""

from __future__ import annotations

import math
import statistics
from collections import Counter

from spanluke_spark.etl.survival import nelson_aalen
from spanluke_spark.evaluation.levene import brown_forsythe

# ---------------------------------------------------- python replays


def py_bf(rows, crit_milli=2_642):
    groups = sorted(set(g for g, _ in rows))
    data = {g: sorted(v for gg, v in rows if gg == g) for g in groups}
    sizes = [len(v) for v in data.values()]
    k = len(groups)
    n = sum(sizes)
    m_lo, m_hi = min(sizes), max(sizes)
    med2 = {
        g: vs[(len(vs) + 1) // 2 - 1] + vs[len(vs) // 2]
        for g, vs in data.items()
    }
    z = {g: [abs(2 * v - med2[g]) for v in vs] for g, vs in data.items()}
    zj = {g: sum(vs) for g, vs in z.items()}
    z_tot = sum(zj.values())
    ss = sum(v * v for vs in z.values() for v in vs)
    sum_zj2 = sum(v * v for v in zj.values())
    num = 1000 * (n - k) * sum(
        (n * zj[g] - m_lo * z_tot) ** 2 for g in groups
    )
    den = (k - 1) * n * n * (m_lo * ss - sum_zj2)
    if m_lo != m_hi or den <= 0:
        f = sig = None
    else:
        f = num // den
        sig = f >= crit_milli
    return {
        "n": n, "k": k, "m": m_lo, "num": num, "den": den,
        "f_milli": f, "sig": sig,
    }


def py_na(obs):
    tot = Counter(t for t, _ in obs)
    ev = Counter(t for t, e in obs if e)
    rem = len(obs)
    out = []
    h = v = 0
    for t in sorted(tot):
        n = rem
        rem -= tot[t]
        d = ev.get(t, 0)
        if d >= 1:
            h += d * 10**6 // n
            v += d * (n - d) * 10**9 // (n * n * n)
            out.append(
                {
                    "t": t, "n_risk": n, "deaths": d,
                    "h_step_ppm": d * 10**6 // n,
                    "h_ppm": h, "var_ppb": v,
                }
            )
    return out


def _run_bf(spark, rows, **kw):
    df = spark.createDataFrame(rows, "grp long, value long")
    return brown_forsythe(df, crit_milli=2_642, **kw).collect()[0].asDict()


def _run_na(spark, obs):
    df = spark.createDataFrame(obs, "duration long, event int")
    rows = nelson_aalen(df).orderBy("t").collect()
    return [r.asDict() for r in rows]


PLANTED = [
    (e % 4, (e * 13) % 60 if e % 4 == 3 else (e * 13) % 20)
    for e in range(240)
]


# ------------------------------------------------------ brown-forsythe


def test_bf_matches_replay_and_float(spark):
    got = _run_bf(spark, PLANTED)
    assert got == py_bf(PLANTED)
    # float BF from first principles
    groups = sorted(set(g for g, _ in PLANTED))
    data = {g: [v for gg, v in PLANTED if gg == g] for g in groups}
    k = len(groups)
    n = sum(len(v) for v in data.values())
    z = {
        g: [abs(v - statistics.median(vs)) for v in vs]
        for g, vs in ((g, data[g]) for g in groups)
    }
    zbar = {g: sum(vs) / len(vs) for g, vs in z.items()}
    zall = sum(sum(vs) for vs in z.values()) / n
    b = sum(len(z[g]) * (zbar[g] - zall) ** 2 for g in groups)
    w = sum((x - zbar[g]) ** 2 for g in groups for x in z[g])
    f = (n - k) / (k - 1) * b / w
    assert got["f_milli"] == int(f * 1000)
    assert got["sig"] is True


def test_bf_equal_spread_null(spark):
    rows = [(e % 4, (e * 17) % 30) for e in range(240)]
    got = _run_bf(spark, rows)
    assert got["sig"] is False


def test_bf_location_shift_invariant(spark):
    """Adding a constant to one whole group changes nothing — BF is a
    SCALE test, immune to the location differences q337/q352 detect."""
    shifted = [(g, v + (1000 if g == 2 else 0)) for g, v in PLANTED]
    a, b = _run_bf(spark, PLANTED), _run_bf(spark, shifted)
    assert a["f_milli"] == b["f_milli"]


def test_bf_unequal_sizes_null(spark):
    rows = PLANTED + [(0, 7)]
    got = _run_bf(spark, rows)
    assert got["f_milli"] is None and got["sig"] is None


def test_bf_zero_spread_null(spark):
    rows = [(e % 2, e % 2) for e in range(40)]
    got = _run_bf(spark, rows)
    assert got["f_milli"] is None


def test_bf_odd_group_size_median(spark):
    """Odd m: med2 is twice the single middle order statistic."""
    rows = [(0, v) for v in (1, 5, 9, 2, 7)] + [
        (1, v) for v in (3, 3, 8, 1, 30)
    ]
    got = _run_bf(spark, rows)
    assert got == py_bf(rows)


# -------------------------------------------------------- nelson-aalen

OBS = [((e * 7) % 40 + 1, 1 if e % 5 != 0 else 0) for e in range(300)]


def test_na_matches_replay(spark):
    assert _run_na(spark, OBS) == py_na(OBS)


def test_na_monotone_and_bounds(spark):
    rows = _run_na(spark, OBS)
    for a, b in zip(rows, rows[1:]):
        assert b["h_ppm"] > a["h_ppm"] and b["var_ppb"] >= a["var_ppb"]
        assert a["n_risk"] > b["n_risk"]


def test_na_censoring_contract(spark):
    """A censor-only time emits no step but shrinks later risk sets:
    dropping the censored rows must CHANGE later hazards."""
    with_c = [(5, 1), (7, 0), (7, 0), (10, 1), (12, 1)]
    a = _run_na(spark, with_c)
    # censor-only time 7 emits no step...
    assert [r["t"] for r in a] == [5, 10, 12]
    # ...but the censored pair counts at risk at t=5 (n=5) and is
    # gone by t=10 (n=2): exactly the two-smaller risk set vs the
    # censoring-free version of the same deaths.
    assert [r["n_risk"] for r in a] == [5, 2, 1]
    b = _run_na(spark, [(5, 1), (10, 1), (12, 1)])
    assert [r["n_risk"] for r in b] == [3, 2, 1]
    assert a[0]["h_step_ppm"] == 200_000  # 1/5
    assert b[0]["h_step_ppm"] == 333_333  # 1/3: censoring changed it


def test_na_no_censor_harmonic_closed_form(spark):
    """All-distinct death times, no censoring: the i-th step is
    1e6 div (n - i + 1) — the harmonic tail."""
    n = 12
    obs = [(i + 1, 1) for i in range(n)]
    rows = _run_na(spark, obs)
    for i, r in enumerate(rows):
        assert r["h_step_ppm"] == 10**6 // (n - i)


def test_na_breslow_dominates_km(spark):
    """exp(-H) >= S_KM at every step (exp(-x) >= 1-x per factor)."""
    rows = _run_na(spark, OBS)
    # KM survival replay in floats on the same data
    tot = Counter(t for t, _ in OBS)
    ev = Counter(t for t, e in OBS if e)
    rem = len(OBS)
    s = 1.0
    km = {}
    for t in sorted(tot):
        n = rem
        rem -= tot[t]
        d = ev.get(t, 0)
        if d:
            s *= 1 - d / n
            km[t] = s
    for r in rows:
        assert math.exp(-r["h_ppm"] / 1e6) >= km[r["t"]] - 1e-9
