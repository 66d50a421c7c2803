"""Gates for 1-D Wasserstein-1 (textops/wasserstein.py) and
Kruskal-Wallis (evaluation/kruskal.py): W1 against an exact integer
replay, the point-mass |a-b| closed form, identity 0, and the
translation property W1(P, P+c) = c exactly; Kruskal-Wallis against a
bit-exact staged-integer replay AND a float tie-corrected H
cross-check, the k=1 exact-zero lane, the all-tied NULL contract, a
planted-shift significant fixture and a permutation-null
insignificant one (published chi-squared df=3 gate 7.815)."""

from __future__ import annotations

from collections import Counter

from spanluke_spark.evaluation.kruskal import kruskal_wallis
from spanluke_spark.textops.wasserstein import wasserstein_1d

# ---------------------------------------------------------- wasserstein


def py_w1(pairs):
    p, q = Counter(), Counter()
    for side, v in pairs:
        (p if side else q)[v] += 1
    np_, nq = sum(p.values()), sum(q.values())
    grid = sorted(set(p) | set(q))
    cp = cq = 0
    num = 0
    for i, v in enumerate(grid):
        cp += p[v]
        cq += q[v]
        gap = grid[i + 1] - v if i + 1 < len(grid) else 0
        num += abs(cp * nq - cq * np_) * gap
    return {
        "np_total": np_,
        "nq_total": nq,
        "n_values": len(grid),
        "w1_num": num,
        "w1_milli": num * 1000 // (np_ * nq),
    }


def _run_w1(spark, pairs):
    df = spark.createDataFrame(pairs, "p_side boolean, value long")
    return wasserstein_1d(df).collect()[0].asDict()


def test_w1_matches_integer_replay(spark):
    pairs = [(i % 3 == 0, (i * 17) % 40 + (i % 3) * 2) for i in range(300)]
    assert _run_w1(spark, pairs) == py_w1(pairs)


def test_w1_point_masses_and_identity(spark):
    got = _run_w1(spark, [(True, 12)] * 7 + [(False, 37)] * 5)
    assert got["w1_num"] == 25 * 7 * 5 and got["w1_milli"] == 25_000
    same = _run_w1(spark, [(s, v % 9) for s in (True, False)
                           for v in range(45)])
    assert same["w1_num"] == 0 and same["w1_milli"] == 0


def test_w1_translation_property(spark):
    """Shifting one side by c costs exactly c (in milli: 1000c)."""
    base = [(i * 7) % 23 for i in range(60)]
    for c in (1, 5, 40):
        got = _run_w1(
            spark,
            [(True, v) for v in base] + [(False, v + c) for v in base],
        )
        assert got["w1_milli"] == 1000 * c, c


# -------------------------------------------------------------- kruskal


def double_ranks(vals):
    order = sorted(vals)
    first = {}
    for i, v in enumerate(order):
        first.setdefault(v, i + 1)
    cnt = Counter(order)
    return [2 * first[v] + cnt[v] - 1 for v in vals]


def py_kw(samples, crit_ppm):
    vals = [v for _, v in samples]
    drs = double_ranks(vals)
    per = {}
    for (g, _), dr in zip(samples, drs):
        nj, drj = per.get(g, (0, 0))
        per[g] = (nj + 1, drj + dr)
    n = len(samples)
    sum_rj2q = sum(drj * drj * 250000 // nj for nj, drj in per.values())
    h_ppm = 12 * sum_rj2q // (n * (n + 1)) - 3 * (n + 1) * 1_000_000
    tie = sum(t**3 - t for t in Counter(vals).values())
    den = n**3 - n - tie
    if den <= 0:
        hc = sig = None
    else:
        mag = abs(h_ppm) * (n**3 - n) // den
        hc = -mag if h_ppm < 0 else mag
        sig = hc >= crit_ppm
    return {
        "n": n,
        "k": len(per),
        "sum_rj2q": sum_rj2q,
        "h_ppm": h_ppm,
        "tie_cube": tie,
        "hc_ppm": hc,
        "sig": sig,
    }


def float_kw(samples):
    """Textbook tie-corrected H with average ranks, in floats."""
    vals = [v for _, v in samples]
    avg = {v: d / 2 for v, d in zip(vals, double_ranks(vals))}
    per = {}
    for g, v in samples:
        per.setdefault(g, []).append(avg[v])
    n = len(samples)
    h = 12 / (n * (n + 1)) * sum(
        sum(r) ** 2 / len(r) for r in per.values()
    ) - 3 * (n + 1)
    tie = sum(t**3 - t for t in Counter(vals).values())
    return h / (1 - tie / (n**3 - n))


def _run_kw(spark, samples, crit_ppm=7_815_000):
    df = spark.createDataFrame(samples, "grp long, value long")
    return kruskal_wallis(df, crit_ppm=crit_ppm).collect()[0].asDict()


def test_kw_matches_staged_replay_and_float(spark):
    samples = [
        (i % 4, (i * 13) % 50 + (i % 4) * 6) for i in range(160)
    ]
    got = _run_kw(spark, samples)
    assert got == py_kw(samples, 7_815_000)
    assert abs(got["hc_ppm"] / 1e6 - float_kw(samples)) < 0.01


def test_kw_planted_shift_significant_null_not(spark):
    shifted = [(i % 4, (i * 7) % 30 + (i % 4) * 25) for i in range(200)]
    assert _run_kw(spark, shifted)["sig"] is True
    # same marginal distribution in every group -> tiny H
    null = [(i % 4, (i // 4) % 30) for i in range(240)]
    got = _run_kw(spark, null)
    assert got["sig"] is False and abs(got["hc_ppm"]) < 7_815_000


def test_kw_single_group_is_exact_zero(spark):
    got = _run_kw(spark, [(0, (i * 3) % 11) for i in range(50)])
    assert got["k"] == 1 and got["h_ppm"] == 0 and got["hc_ppm"] == 0


def test_kw_all_tied_is_null(spark):
    got = _run_kw(spark, [(i % 3, 42) for i in range(30)])
    assert got["tie_cube"] == 30**3 - 30
    assert got["hc_ppm"] is None and got["sig"] is None
