"""Gates for Cochran-Armitage and Bowker (evaluation/trendtests.py):
CA against a bit-exact replay AND a float hypergeometric-variance
cross-check, the 2x2 reduction z^2 == (N-1)/N * Pearson chi^2, score
reversal antisymmetry, planted dose-response significant vs flat
null, and degenerate NULLs (all-positive outcome, constant score);
Bowker against replay, the k=2 uncorrected-McNemar identity, rater
swap invariance, exact-symmetry zero, diagonal-only NULL, and a
planted drift firing."""

from __future__ import annotations

from collections import Counter

from spanluke_spark.evaluation.trendtests import (
    bowker_symmetry,
    cochran_armitage,
)

# ---------------------------------------------------- python replays


def py_ca(rows, crit_milli=3841):
    per = {}
    for s, y in rows:
        nj, rj = per.get(s, (0, 0))
        per[s] = (nj + 1, rj + (1 if y else 0))
    n = sum(nj for nj, _ in per.values())
    k = len(per)
    r = sum(rj for _, rj in per.values())
    t = sum(s * rj for s, (_, rj) in per.items())
    s1 = sum(s * nj for s, (nj, _) in per.items())
    s2 = sum(s * s * nj for s, (nj, _) in per.items())
    dev = n * t - r * s1
    d = r * (n - r) * (n * s2 - s1 * s1)
    if d <= 0:
        z2 = direction = sig = None
    else:
        z2 = 1000 * (n - 1) * dev * dev // d
        direction = (
            "rate_increasing" if dev > 0
            else "rate_decreasing" if dev < 0 else "exact_expectation"
        )
        sig = z2 >= crit_milli
    return {
        "n": n, "k": k, "r": r, "t": t, "s1": s1, "s2": s2,
        "dev": dev, "z2_milli": z2, "direction": direction, "sig": sig,
    }


def py_bowker(rows, crit_milli=None):
    cnt = Counter((i, j) for i, j in rows if i != j)
    pairs = {}
    for (i, j), m in cnt.items():
        lo, hi = min(i, j), max(i, j)
        up, down = pairs.get((lo, hi), (0, 0))
        if i < j:
            up += m
        else:
            down += m
        pairs[(lo, hi)] = (up, down)
    chi2 = sum(
        1000 * (u - d) ** 2 // (u + d) for u, d in pairs.values()
    )
    df = len(pairs)
    sig = None if crit_milli is None or df == 0 else chi2 >= crit_milli
    return {
        "n_pairs_df": df,
        "chi2_milli": chi2,
        "n_disagree": sum(u + d for u, d in pairs.values()),
        "sig": sig,
    }


def _run_ca(spark, rows, **kw):
    df = spark.createDataFrame(rows, "score long, outcome boolean")
    return cochran_armitage(df, **kw).collect()[0].asDict()


def _run_bowker(spark, rows, **kw):
    df = spark.createDataFrame(rows, "a long, b long")
    return bowker_symmetry(df, **kw).collect()[0].asDict()


# ---------------------------------------------------------------- ca


def test_ca_matches_replay_and_float(spark):
    rows = [(e % 4, (e * 13) % 100 < 30 + 8 * (e % 4))
            for e in range(400)]
    got = _run_ca(spark, rows)
    exp = py_ca(rows)
    assert got == exp
    n, r = exp["n"], exp["r"]
    t, s1, s2 = exp["t"], exp["s1"], exp["s2"]
    p = r / n
    var_t = r * (n - r) * (n * s2 - s1 * s1) / (n * n * (n - 1))
    z2f = (t - p * s1) ** 2 / var_t
    assert got["z2_milli"] == int(z2f * 1000)


def test_ca_2x2_pearson_reduction(spark):
    """Scores {0,1}: CA z^2 == (N-1)/N * Pearson chi^2 on the 2x2."""
    rows = [(e % 2, (e * 7) % 10 < 4 + 3 * (e % 2)) for e in range(100)]
    got = _run_ca(spark, rows)
    a = sum(1 for s, y in rows if s == 0 and y)
    b = sum(1 for s, y in rows if s == 1 and y)
    c = sum(1 for s, y in rows if s == 0 and not y)
    d = sum(1 for s, y in rows if s == 1 and not y)
    n = len(rows)
    chi2 = n * (a * d - c * b) ** 2 / (
        (a + b) * (c + d) * (a + c) * (b + d)
    )
    assert got["z2_milli"] == int((n - 1) / n * chi2 * 1000)


def test_ca_score_reversal(spark):
    rows = [(e % 4, (e * 13) % 100 < 30 + 8 * (e % 4))
            for e in range(400)]
    rev = [(3 - s, y) for s, y in rows]
    a, b = _run_ca(spark, rows), _run_ca(spark, rev)
    assert a["dev"] == -b["dev"] and a["z2_milli"] == b["z2_milli"]
    assert a["direction"] == "rate_increasing"
    assert b["direction"] == "rate_decreasing"


def test_ca_planted_vs_null(spark):
    planted = [(e % 4, (e * 13) % 100 < 30 + 8 * (e % 4))
               for e in range(400)]
    flat = [(e % 4, (e * 13) % 100 < 50) for e in range(400)]
    assert _run_ca(spark, planted)["sig"] is True
    assert _run_ca(spark, flat)["sig"] is False


def test_ca_degenerate_nulls(spark):
    all_pos = [(e % 4, True) for e in range(80)]
    got = _run_ca(spark, all_pos)
    assert got["z2_milli"] is None and got["sig"] is None
    const_score = [(2, e % 3 == 0) for e in range(60)]
    assert _run_ca(spark, const_score)["z2_milli"] is None


# ------------------------------------------------------------ bowker


def test_bowker_matches_replay(spark):
    rows = [((e * 3) % 4, ((e * 3) % 4 + (1 if e % 7 < 2 else 0)) % 4)
            for e in range(300)]
    got = _run_bowker(spark, rows, crit_milli=12_592)
    assert got == py_bowker(rows, crit_milli=12_592)
    assert got["sig"] is True


def test_bowker_k2_is_uncorrected_mcnemar(spark):
    """k = 2: the single pair cell is 1000*(b-c)^2 div (b+c)."""
    rows = [(e % 2, (e + (1 if e % 5 < 2 else 0)) % 2)
            for e in range(120)]
    got = _run_bowker(spark, rows)
    b = sum(1 for i, j in rows if i == 0 and j == 1)
    c = sum(1 for i, j in rows if i == 1 and j == 0)
    assert got["n_pairs_df"] == 1
    assert got["chi2_milli"] == 1000 * (b - c) ** 2 // (b + c)


def test_bowker_rater_swap_invariant(spark):
    rows = [((e * 3) % 4, ((e * 3) % 4 + (1 if e % 7 < 2 else 0)) % 4)
            for e in range(300)]
    a = _run_bowker(spark, rows)
    b = _run_bowker(spark, [(j, i) for i, j in rows])
    assert a["chi2_milli"] == b["chi2_milli"]
    assert a["n_pairs_df"] == b["n_pairs_df"]


def test_bowker_exact_symmetry_zero(spark):
    rows = [(0, 1), (1, 0), (2, 3), (3, 2), (0, 0)] * 10
    got = _run_bowker(spark, rows, crit_milli=12_592)
    assert got["chi2_milli"] == 0 and got["sig"] is False


def test_bowker_diagonal_only_null(spark):
    rows = [(e % 4, e % 4) for e in range(40)]
    got = _run_bowker(spark, rows, crit_milli=12_592)
    assert got["n_pairs_df"] == 0 and got["sig"] is None
    assert got["chi2_milli"] == 0 and got["n_disagree"] == 0
