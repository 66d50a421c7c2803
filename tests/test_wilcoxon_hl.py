"""Gates for the Wilcoxon signed-rank test and Hodges-Lehmann
estimator (evaluation/wilcoxon.py): signed-rank against a bit-exact
double-rank replay AND a float z^2 cross-check, the zero-difference
drop-and-count convention, symmetry (negating every difference flips
the direction, same z^2), planted-shift significant vs a symmetric
null, and degenerate NULLs; HL against an exact Walsh-median replay,
the constant-difference closed form (HL == the constant exactly),
shift equivariance (adding c to every diff adds exactly 1000c milli),
and outlier robustness."""

from __future__ import annotations

from collections import Counter

from spanluke_spark.evaluation.wilcoxon import (
    hodges_lehmann,
    wilcoxon_signed_rank,
)

# ------------------------------------------------------------- wilcoxon


def double_ranks(vals):
    order = sorted(vals)
    first = {}
    for i, v in enumerate(order):
        first.setdefault(v, i + 1)
    cnt = Counter(order)
    return [2 * first[v] + cnt[v] - 1 for v in vals]


def py_wsr(diffs, crit_milli=3841):
    n_zero = sum(1 for d in diffs if d == 0)
    nz = [d for d in diffs if d != 0]
    n = len(nz)
    drs = double_ranks([abs(d) for d in nz])
    w2 = sum(dr for d, dr in zip(nz, drs) if d > 0)
    tie = sum(t**3 - t for t in Counter(abs(d) for d in nz).values())
    dev = 2 * w2 - n * (n + 1)
    den = 2 * n * (n + 1) * (2 * n + 1) - tie
    if den <= 0:
        z2 = direction = sig = None
    else:
        z2 = 3 * dev * dev * 1000 // den
        direction = (
            "shift_up" if dev > 0
            else "shift_down" if dev < 0 else "exact_expectation"
        )
        sig = z2 >= crit_milli
    return {
        "n_nonzero": n,
        "n_zero": n_zero,
        "w2_pos": w2,
        "tie_cube": tie,
        "z2_milli": z2,
        "direction": direction,
        "sig": sig,
    }


def float_z2(diffs):
    nz = [d for d in diffs if d != 0]
    n = len(nz)
    avg = {v: dr / 2 for v, dr in zip(
        [abs(d) for d in nz], double_ranks([abs(d) for d in nz])
    )}
    wplus = sum(avg[abs(d)] for d in nz if d > 0)
    e = n * (n + 1) / 4
    tie = sum(t**3 - t for t in Counter(abs(d) for d in nz).values())
    v = n * (n + 1) * (2 * n + 1) / 24 - tie / 48
    return (wplus - e) ** 2 / v


def _run_wsr(spark, diffs):
    rows = [(0, d) for d in diffs]
    df = spark.createDataFrame(rows, "x long, y long")
    return wilcoxon_signed_rank(df).collect()[0].asDict()


def test_wsr_matches_replay_and_float(spark):
    diffs = [0 if i % 10 == 3 else (1 + (i * 7) % 9) * (1 if i % 4 else -1)
             for i in range(250)]
    got = _run_wsr(spark, diffs)
    assert got == py_wsr(diffs)
    assert abs(got["z2_milli"] / 1000 - float_z2(diffs)) < 0.01


def test_wsr_negation_symmetry(spark):
    diffs = [(1 + (i * 5) % 7) * (1 if i % 3 else -1) for i in range(90)]
    up = _run_wsr(spark, diffs)
    dn = _run_wsr(spark, [-d for d in diffs])
    assert up["z2_milli"] == dn["z2_milli"]
    assert {up["direction"], dn["direction"]} == {"shift_up", "shift_down"}


def test_wsr_planted_shift_and_symmetric_null(spark):
    shift = [5 + (i * 3) % 4 for i in range(100)]  # all positive
    got = _run_wsr(spark, shift)
    assert got["sig"] is True and got["direction"] == "shift_up"
    # exactly mirrored diffs -> W2 is half the total, dev = 0
    null = [v for i in range(40) for v in (1 + i % 6, -(1 + i % 6))]
    got = _run_wsr(spark, null)
    assert got["direction"] == "exact_expectation"
    assert got["z2_milli"] == 0 and got["sig"] is False


def test_wsr_degenerate_null(spark):
    got = _run_wsr(spark, [0] * 20)
    assert got["n_nonzero"] == 0 and got["n_zero"] == 20
    assert got["z2_milli"] is None and got["sig"] is None


# ------------------------------------------------------- hodges-lehmann


def py_hl(diffs):
    walsh = sorted(
        (diffs[i] + diffs[j]) * 500
        for i in range(len(diffs))
        for j in range(i, len(diffs))
    )
    m = len(walsh)
    return {
        "n": len(diffs),
        "n_walsh": m,
        "hl_milli": walsh[(m + 1) // 2 - 1],
        "lo_milli": walsh[0],
        "hi_milli": walsh[-1],
    }


def _run_hl(spark, diffs):
    df = spark.createDataFrame([(0, d) for d in diffs], "x long, y long")
    return hodges_lehmann(df).collect()[0].asDict()


def test_hl_matches_replay(spark):
    diffs = [0 if i % 10 == 3 else 1 + (i * 7) % 9 for i in range(120)]
    assert _run_hl(spark, diffs) == py_hl(diffs)


def test_hl_constant_and_shift_equivariance(spark):
    assert _run_hl(spark, [4] * 30)["hl_milli"] == 4000
    base = [(i * 7) % 11 - 5 for i in range(60)]
    h0 = _run_hl(spark, base)["hl_milli"]
    h9 = _run_hl(spark, [d + 9 for d in base])["hl_milli"]
    assert h9 - h0 == 9000


def test_hl_outlier_robust(spark):
    base = [3 + i % 3 for i in range(50)]
    clean = _run_hl(spark, base)["hl_milli"]
    dirty = _run_hl(spark, base[:-3] + [10_000, 10_000, 10_000])["hl_milli"]
    assert abs(dirty - clean) <= 1000  # pseudo-median barely moves
