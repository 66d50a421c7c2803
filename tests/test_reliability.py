"""Gates for evaluation/reliability.py: alpha against an exact
integer replay AND the float textbook formula, the parallel-items
EXACT-1000 lane, adding a pure-noise item drags alpha down,
negative alpha on anti-correlated items, constant-totals NULL;
item-rest against replay, the sum-of-others exact-1e6 lane, the
reversed-item negative lane, constant-item NULL, and the
noise-item-scores-lowest ordering the panel exists to expose."""

from __future__ import annotations

from collections import defaultdict

from spanluke_spark.evaluation.reliability import (
    cronbach_alpha,
    item_rest_panel,
)

# ---------------------------------------------------- python replays


def py_alpha(rows):
    per = defaultdict(list)
    totals = defaultdict(int)
    for u, i, s in rows:
        per[i].append(s)
        totals[u] += s
    k = len(per)
    n = len(totals)
    sum_a = sum(
        len(v) * sum(x * x for x in v) - sum(v) ** 2 for v in per.values()
    )
    ts = list(totals.values())
    a_tot = n * sum(t * t for t in ts) - sum(ts) ** 2
    if k < 2 or a_tot <= 0:
        milli = None
    else:
        num = k * (a_tot - sum_a)
        mag = abs(num) * 1000 // ((k - 1) * a_tot)
        milli = -mag if num < 0 else mag
    return {
        "n_units": n,
        "k_items": k,
        "sum_item_a": sum_a,
        "a_tot": a_tot,
        "alpha_milli": milli,
    }


def py_item_rest(rows):
    totals = defaultdict(int)
    for u, _, s in rows:
        totals[u] += s
    per = defaultdict(list)
    for u, i, s in rows:
        per[i].append((s, totals[u] - s))
    out = {}
    for i, pairs in per.items():
        n = len(pairs)
        ss = sum(s for s, _ in pairs)
        sr = sum(r for _, r in pairs)
        a_item = n * sum(s * s for s, _ in pairs) - ss * ss
        a_rest = n * sum(r * r for _, r in pairs) - sr * sr
        num = n * sum(s * r for s, r in pairs) - ss * sr
        if a_item > 0 and a_rest > 0:
            mag = num * num * 10**6 // (a_item * a_rest)
            r2 = -mag if num < 0 else mag
        else:
            r2 = None
        out[i] = {
            "n": n, "a_item": a_item, "a_rest": a_rest,
            "num": num, "r2_ppm": r2,
        }
    return out


def _run_alpha(spark, rows):
    df = spark.createDataFrame(
        list(rows), "unit long, item string, score long"
    )
    return cronbach_alpha(df).collect()[0].asDict()


def _run_panel(spark, rows):
    df = spark.createDataFrame(
        list(rows), "unit long, item string, score long"
    )
    out = {}
    for r in item_rest_panel(df).collect():
        d = r.asDict()
        item = d.pop("item")
        out[item] = d
    return out


def _coherent(n=40):
    """three items tracking one trait + mild item noise"""
    rows = []
    for u in range(n):
        trait = (u * 7) % 11
        rows.append((u, "i1", trait + u % 2))
        rows.append((u, "i2", 2 * trait + (u * 3) % 3))
        rows.append((u, "i3", trait + 1 + (u * 5) % 2))
    return rows


def test_alpha_matches_replay_and_float(spark):
    rows = _coherent()
    got = _run_alpha(spark, rows)
    exp = py_alpha(rows)
    assert got == exp
    per = defaultdict(list)
    totals = defaultdict(int)
    for u, i, s in rows:
        per[i].append(s)
        totals[u] += s
    k, n = len(per), len(totals)

    def var(xs):
        m = sum(xs) / len(xs)
        return sum((x - m) ** 2 for x in xs) / len(xs)

    alpha = k / (k - 1) * (
        1 - sum(var(v) for v in per.values()) / var(list(totals.values()))
    )
    assert abs(got["alpha_milli"] - alpha * 1000) <= 1


def test_alpha_parallel_items_exact_one(spark):
    rows = []
    for u in range(20):
        v = (u * 3) % 7
        for it in ("a", "b", "c", "d"):
            rows.append((u, it, v))
    assert _run_alpha(spark, rows)["alpha_milli"] == 1000


def test_alpha_noise_item_drags_down(spark):
    base = _coherent()
    noisy = base + [(u, "junk", (u * u * 13) % 17) for u in range(40)]
    assert (
        _run_alpha(spark, noisy)["alpha_milli"]
        < _run_alpha(spark, base)["alpha_milli"]
    )


def test_alpha_anticorrelated_negative(spark):
    rows = []
    for u in range(20):
        v = (u * 3) % 9
        rows.append((u, "up", v))
        rows.append((u, "down", 8 - v + u % 3))
    got = _run_alpha(spark, rows)
    assert got == py_alpha(rows)
    assert got["alpha_milli"] < 0


def test_alpha_constant_totals_null(spark):
    rows = []
    for u in range(10):
        v = u % 5
        rows.append((u, "a", v))
        rows.append((u, "b", 4 - v))  # totals constant at 4
    assert _run_alpha(spark, rows)["alpha_milli"] is None


def test_item_rest_matches_replay_and_orders(spark):
    rows = _coherent() + [
        (u, "junk", (u * u * 13) % 17) for u in range(40)
    ]
    got = _run_panel(spark, rows)
    assert got == py_item_rest(rows)
    assert got["junk"]["r2_ppm"] == min(
        v["r2_ppm"] for v in got.values()
    )


def test_item_rest_sum_item_exact_one(spark):
    rows = []
    for u in range(15):
        a = (u * 3) % 5
        b = (u * 7) % 4
        rows += [(u, "a", a), (u, "b", b), (u, "sum", a + b)]
    got = _run_panel(spark, rows)
    assert got["sum"]["r2_ppm"] == 10**6


def test_item_rest_reversed_negative_constant_null(spark):
    rows = []
    for u in range(15):
        v = (u * 3) % 7
        rows += [(u, "x", v), (u, "y", v + u % 2), (u, "rev", 10 - v),
                 (u, "const", 4)]
    got = _run_panel(spark, rows)
    assert got["rev"]["r2_ppm"] < 0
    assert got["const"]["r2_ppm"] is None
