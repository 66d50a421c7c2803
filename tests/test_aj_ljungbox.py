"""Gates for aalen_johansen (etl/survival.py) and ljung_box
(etl/acf.py): AJ against a float replay, the no-censoring partition
cif1 + cif2 + survival == 1 at every time, the single-cause collapse
cif1 == 1 - KM survival, monotone CIFs, censor-only times unchanged;
Ljung-Box against an exact quantized replay AND the float statistic,
the slow-wave-fires / scramble-stays-quiet pair, constant NULL, and
the h-truncation on short series."""

from __future__ import annotations

import math
from collections import Counter

from spanluke_spark.etl.acf import acf, ljung_box
from spanluke_spark.etl.survival import aalen_johansen, kaplan_meier

# ---------------------------------------------------- python replays


def py_aj(pairs):
    per = {}
    for t, cause in pairs:
        d = per.setdefault(t, [0, 0, 0])
        d[cause if cause in (1, 2) else 0] += 0  # placeholder
    per = {}
    for t, cause in pairs:
        d = per.setdefault(t, {"d1": 0, "d2": 0, "c": 0})
        if cause == 1:
            d["d1"] += 1
        elif cause == 2:
            d["d2"] += 1
        else:
            d["c"] += 1
    times = sorted(per)
    total = len(pairs)
    out = {}
    s = 1.0
    cif1 = cif2 = 0.0
    at_risk = total
    for t in times:
        d1, d2, c = per[t]["d1"], per[t]["d2"], per[t]["c"]
        s_prev = s
        cif1 += s_prev * d1 / at_risk
        cif2 += s_prev * d2 / at_risk
        s = s * (1 - (d1 + d2) / at_risk)
        out[t] = {
            "n_risk": at_risk,
            "d1": d1,
            "d2": d2,
            "censored": c,
            "survival": round(s, 6),
            "cif1": round(cif1, 6),
            "cif2": round(cif2, 6),
        }
        at_risk -= d1 + d2 + c
    return out


def py_ljung_box(xs, h):
    n = len(xs)
    sx = sum(xs)
    c = [n * v - sx for v in xs]
    den = sum(v * v for v in c)
    if den == 0:
        return None
    cells = []
    for k in range(1, h + 1):
        num = sum(c[t] * c[t + k] for t in range(n - k))
        cells.append(num * num * 10**9 // (den * den * (n - k)))
    return n * (n + 2) * sum(cells) // 10**6


def _run_aj(spark, pairs):
    df = spark.createDataFrame(
        [(int(t), int(cz)) for t, cz in pairs], "duration long, cause long"
    )
    return {
        r["t"]: {k: v for k, v in r.asDict().items() if k != "t"}
        for r in aalen_johansen(df).collect()
    }


def _run_lb(spark, xs, h=6):
    df = spark.createDataFrame(
        [(0, i, int(v)) for i, v in enumerate(xs)],
        "key long, bucket long, x long",
    )
    return ljung_box(acf(df, max_lag=h), h=h).collect()[0].asDict()


PAIRS = [
    ((i * 7) % 10 + 1, (0 if i % 7 == 0 else 1 if i % 3 else 2))
    for i in range(60)
]


# -------------------------------------------------------------- AJ


def test_aj_matches_replay(spark):
    got = _run_aj(spark, PAIRS)
    exp = py_aj(PAIRS)
    assert set(got) == set(exp)
    for t in got:
        for k in ("n_risk", "d1", "d2", "censored"):
            assert got[t][k] == exp[t][k], (t, k)
        for k in ("survival", "cif1", "cif2"):
            assert abs(got[t][k] - exp[t][k]) <= 2e-6, (t, k)


def test_aj_no_censoring_partitions_unity(spark):
    pairs = [((i * 3) % 8 + 1, 1 if i % 2 else 2) for i in range(40)]
    got = _run_aj(spark, pairs)
    for t, row in got.items():
        assert abs(row["survival"] + row["cif1"] + row["cif2"] - 1.0) < 1e-5


def test_aj_single_cause_collapses_to_km(spark):
    pairs = [((i * 7) % 9 + 1, 0 if i % 5 == 0 else 1) for i in range(45)]
    got = _run_aj(spark, pairs)
    km_df = spark.createDataFrame(
        [(int(t), 1 if cz == 1 else 0) for t, cz in pairs],
        "duration long, event long",
    )
    km = {r["t"]: r["survival"] for r in kaplan_meier(km_df).collect()}
    for t, row in got.items():
        assert row["cif2"] == 0.0
        assert abs(row["cif1"] - (1 - km[t])) <= 2e-6
        assert abs(row["survival"] - km[t]) <= 2e-6


def test_aj_monotone_and_censor_only_flat(spark):
    pairs = [(1, 1), (2, 0), (2, 0), (3, 2), (4, 1), (5, 0), (6, 2)]
    got = _run_aj(spark, pairs)
    ts = sorted(got)
    for a, b in zip(ts, ts[1:]):
        assert got[b]["cif1"] >= got[a]["cif1"]
        assert got[b]["cif2"] >= got[a]["cif2"]
    # t=2 is censor-only: both CIFs unchanged from t=1
    assert got[2]["cif1"] == got[1]["cif1"]
    assert got[2]["cif2"] == got[1]["cif2"]


# -------------------------------------------------------- ljung-box


WAVE = [20 + (10 if (i // 5) % 2 == 0 else -10) for i in range(40)]
SCRAMBLE = [(i * i * 31 + i * 17) % 23 for i in range(40)]


def test_lb_matches_replay_and_float(spark):
    got = _run_lb(spark, WAVE)
    assert got["q_milli"] == py_ljung_box(WAVE, 6)
    n = len(WAVE)
    mean = sum(WAVE) / n
    c = [v - mean for v in WAVE]
    den = sum(v * v for v in c)
    q = n * (n + 2) * sum(
        (sum(c[t] * c[t + k] for t in range(n - k)) / den) ** 2 / (n - k)
        for k in range(1, 7)
    )
    assert abs(got["q_milli"] - q * 1000) <= 25  # h once-quantized cells


def test_lb_wave_fires_scramble_quiet(spark):
    assert _run_lb(spark, WAVE)["sig05"] is True
    got = _run_lb(spark, SCRAMBLE)
    assert got["q_milli"] == py_ljung_box(SCRAMBLE, 6)
    assert got["sig05"] is False


def test_lb_constant_null(spark):
    got = _run_lb(spark, [5] * 30)
    assert got["q_milli"] is None and got["sig05"] is None


def test_lb_short_series_truncates_h(spark):
    got = _run_lb(spark, [3, 9, 1, 7], h=6)
    assert got["h"] == 3  # only lags 1..3 have pairs
    assert got["crit_milli"] == 7815
