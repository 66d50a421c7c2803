"""Gates for evaluation/concord2.py: circular triads against a
brute-force triple enumeration, the transitive zeta == 1e6 and
3-cycle zeta == 0 exact lanes, incomplete audit; Kendall's W against
a textbook float replay (ties included), perfect agreement == 1000
exactly, two opposite rankers == 0 exactly, the Friedman bridge
chi2 == m(k-1)W against the exact chi2 column, and the incomplete
audit."""

from __future__ import annotations

from itertools import combinations

from spanluke_spark.evaluation.concord2 import circular_triads, kendalls_w

# ---------------------------------------------------- python replays


def py_triads(duels):
    items = sorted({w for w, _ in duels} | {l for _, l in duels})
    k = len(items)
    beats = set(duels)
    c = 0
    for a, b, cc in combinations(items, 3):
        edges = [
            (a, b) in beats,
            (b, cc) in beats,
            (cc, a) in beats,
        ]
        # circular iff the 3-cycle orientation is consistent
        if all(edges) or not any(edges):
            c += 1
    return c


def py_w(rows):
    from collections import defaultdict

    by_ranker = defaultdict(dict)
    for r, it, sc in rows:
        by_ranker[r][it] = sc
    m = len(by_ranker)
    items = sorted({it for _, it, _ in rows})
    k = len(items)
    ranks = defaultdict(float)
    t_raw = 0
    for r, scores in by_ranker.items():
        vals = sorted(scores.values())
        from collections import Counter

        cnt = Counter(vals)
        for c in cnt.values():
            t_raw += c**3 - c
        for it in items:
            v = scores[it]
            less = sum(1 for u in vals if u < v)
            eq = cnt[v]
            ranks[it] += less + (eq + 1) / 2
    s = sum((ranks[it] - m * (k + 1) / 2) ** 2 for it in items)
    w = 12 * s / (m * m * (k**3 - k) - m * t_raw)
    return w, m, k, t_raw


def _run_triads(spark, duels):
    df = spark.createDataFrame(list(duels), "winner long, loser long")
    return circular_triads(df).collect()[0].asDict()


def _run_w(spark, rows):
    df = spark.createDataFrame(
        list(rows), "ranker long, item long, score long"
    )
    return kendalls_w(df).collect()[0].asDict()


def _tournament(k, flip):
    duels = []
    for a in range(k):
        for b in range(a + 1, k):
            if (a, b) in flip:
                duels.append((b, a))
            else:
                duels.append((a, b))
    return duels


def test_triads_matches_brute_force(spark):
    duels = _tournament(7, {(0, 3), (1, 4), (2, 6), (3, 5)})
    got = _run_triads(spark, duels)
    assert got["c_triads"] == py_triads(duels)
    assert got["status"] == "ok"


def test_triads_exact_lanes(spark):
    total_order = _tournament(6, set())
    got = _run_triads(spark, total_order)
    assert got["c_triads"] == 0 and got["zeta_ppm"] == 10**6
    cycle = [(0, 1), (1, 2), (2, 0)]
    got3 = _run_triads(spark, cycle)
    assert got3["c_triads"] == 1 and got3["c_max"] == 1
    assert got3["zeta_ppm"] == 0


def test_triads_incomplete_audit(spark):
    got = _run_triads(spark, [(0, 1), (1, 2)])  # missing 0 vs 2
    assert got["status"] == "incomplete"
    assert got["zeta_ppm"] is None


def test_w_matches_float_and_bridge(spark):
    rows = []
    for r in range(4):
        for it in range(6):
            rows.append((r, it, (it * 3 + r + (it + r) % 2) % 11))
    got = _run_w(spark, rows)
    w, m, k, t_raw = py_w(rows)
    assert got["t_raw"] == t_raw
    assert abs(got["w_milli"] - w * 1000) <= 1
    assert abs(got["chi2_milli"] - m * (k - 1) * w * 1000) <= m * (
        k - 1
    )


def test_w_perfect_and_opposite(spark):
    perfect = [(r, it, it * 5) for r in range(3) for it in range(5)]
    got = _run_w(spark, perfect)
    assert got["w_milli"] == 1000
    opposite = [(0, it, it) for it in range(5)] + [
        (1, it, 10 - it) for it in range(5)
    ]
    got2 = _run_w(spark, opposite)
    assert got2["w_milli"] == 0


def test_w_incomplete_audit(spark):
    rows = [(0, 0, 1), (0, 1, 2), (1, 0, 3)]  # ranker 1 skips item 1
    got = _run_w(spark, rows)
    assert got["status"] == "incomplete"
    assert got["w_milli"] is None
