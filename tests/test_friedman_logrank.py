"""Gates for the Friedman test (evaluation/friedman.py) and the
two-group log-rank test (etl/survival.py log_rank): Friedman against
a bit-exact staged-integer replay AND a textbook float cross-check,
the Conover worked-example shape (strong treatment effect ->
significant, W near 1), the no-effect permutation null, the
incomplete-block drop contract, and the all-tied NULL; log-rank
against a bit-exact cell replay AND a float chi2 cross-check, the
identical-curves null (same durations in both groups -> chi2 ~ 0),
a strong planted separation -> significant, and the all-censored
NULL contract."""

from __future__ import annotations

from collections import Counter, defaultdict

from spanluke_spark.etl.survival import log_rank
from spanluke_spark.evaluation.friedman import friedman

# ------------------------------------------------------------- friedman


def block_double_ranks(vals):
    order = sorted(vals)
    first = {}
    for i, v in enumerate(order):
        first.setdefault(v, i + 1)
    cnt = Counter(order)
    return [2 * first[v] + cnt[v] - 1 for v in vals]


def py_friedman(rows, k, crit_ppm):
    """rows: [(block, trt, value)] -> the module's dict."""
    blocks = defaultdict(list)
    for b, t, v in rows:
        blocks[b].append((t, v))
    kept = {b: g for b, g in blocks.items() if len(g) == k}
    n_dropped = len(blocks) - len(kept)
    drj = defaultdict(int)
    tie = 0
    for g in kept.values():
        drs = block_double_ranks([v for _, v in g])
        for (t, _), dr in zip(g, drs):
            drj[t] += dr
        tie += sum(c**3 - c for c in Counter(v for _, v in g).values())
    n = len(kept)
    sum_drj2 = sum(d * d for d in drj.values())
    chi2 = 3 * sum_drj2 * 1_000_000 // (n * k * (k + 1)) - 3 * n * (
        k + 1
    ) * 1_000_000
    den = n * (k**3 - k) - tie
    if den <= 0:
        chi2c = w = sig = None
    else:
        mag = abs(chi2) * (n * (k**3 - k)) // den
        chi2c = -mag if chi2 < 0 else mag
        wmag = abs(chi2c) // (n * (k - 1))
        w = -wmag if chi2c < 0 else wmag
        sig = chi2c >= crit_ppm
    return {
        "n_blocks": n,
        "k": k,
        "n_dropped": n_dropped,
        "sum_drj2": sum_drj2,
        "tie_cube": tie,
        "chi2_ppm": chi2,
        "chi2c_ppm": chi2c,
        "w_ppm": w,
        "sig": sig,
    }


def float_friedman(rows, k):
    blocks = defaultdict(list)
    for b, t, v in rows:
        blocks[b].append((t, v))
    kept = [g for g in blocks.values() if len(g) == k]
    rj = defaultdict(float)
    for g in kept:
        drs = block_double_ranks([v for _, v in g])
        for (t, _), dr in zip(g, drs):
            rj[t] += dr / 2
    n = len(kept)
    chi2 = 12 / (n * k * (k + 1)) * sum(r * r for r in rj.values()) - 3 * n * (
        k + 1
    )
    tie = sum(
        c**3 - c
        for g in kept
        for c in Counter(v for _, v in g).values()
    )
    return chi2 / (1 - tie / (n * (k**3 - k)))


def _run_fr(spark, rows, k=4, crit_ppm=7_815_000):
    df = spark.createDataFrame(rows, "block long, trt long, value long")
    return friedman(df, k=k, crit_ppm=crit_ppm).collect()[0].asDict()


def fixture(n_blocks, effect):
    return [
        (b, t, (b * 7) % 30 + t * effect + (b * t * 5) % 7)
        for b in range(n_blocks)
        for t in range(4)
    ]


def test_friedman_matches_replay_and_float(spark):
    rows = fixture(50, 3) + [(50, 0, 1), (50, 1, 2)]  # incomplete block
    got = _run_fr(spark, rows)
    assert got == py_friedman(rows, 4, 7_815_000)
    assert got["n_dropped"] == 1
    assert abs(got["chi2c_ppm"] / 1e6 - float_friedman(rows, 4)) < 0.01


def test_friedman_strong_effect_significant_w_high(spark):
    """trt strictly orders every block -> perfect concordance W = 1
    (no within-block ties, chi2 = n*(k-1))."""
    rows = [(b, t, t * 100 + b) for b in range(30) for t in range(4)]
    got = _run_fr(spark, rows)
    assert got["sig"] is True
    assert got["w_ppm"] == 1_000_000
    assert got["chi2_ppm"] == 30 * 3 * 1_000_000


def test_friedman_null_not_significant(spark):
    """Treatment label independent of value -> small chi2."""
    rows = [
        (b, t, ((b * 5 + t * 7 + b * t) % 13)) for b in range(60)
        for t in range(4)
    ]
    got = _run_fr(spark, rows)
    assert got["sig"] is False


def test_friedman_all_tied_is_null(spark):
    rows = [(b, t, 9) for b in range(10) for t in range(4)]
    got = _run_fr(spark, rows)
    assert got["tie_cube"] == 10 * (4**3 - 4)
    assert got["chi2c_ppm"] is None and got["sig"] is None


# ------------------------------------------------------------- log-rank


def tz(a, b):
    return -(abs(a) // b) if a < 0 else a // b


def py_logrank(subjects, crit_milli=3841):
    """subjects: [(duration, event, grp)]."""
    per = defaultdict(lambda: [0, 0, 0, 0])  # arr, arr1, d, d1
    for t, e, g in subjects:
        per[t][0] += 1
        per[t][1] += g
        per[t][2] += e
        per[t][3] += e * g
    nj = n1j = 0
    S = V = n_times = 0
    for t in sorted(per, reverse=True):
        arr, arr1, d, d1 = per[t]
        nj += arr
        n1j += arr1
        if d >= 1:
            n_times += 1
            S += tz((d1 * nj - d * n1j) * 1000, nj)
            if nj > 1:
                V += (
                    d * n1j * (nj - n1j) * (nj - d) * 1_000_000
                    // (nj * nj * (nj - 1))
                )
    chi2 = S * S * 1000 // V if V > 0 else None
    return {
        "n_times": n_times,
        "oe_sum_milli": S,
        "var_sum_micro": V,
        "chi2_milli": chi2,
        "sig": None if chi2 is None else chi2 >= crit_milli,
    }


def float_logrank(subjects):
    per = defaultdict(lambda: [0, 0, 0, 0])
    for t, e, g in subjects:
        per[t][0] += 1
        per[t][1] += g
        per[t][2] += e
        per[t][3] += e * g
    nj = n1j = 0
    S = V = 0.0
    for t in sorted(per, reverse=True):
        arr, arr1, d, d1 = per[t]
        nj += arr
        n1j += arr1
        if d >= 1:
            S += d1 - d * n1j / nj
            if nj > 1:
                V += d * n1j * (nj - n1j) * (nj - d) / (nj * nj * (nj - 1))
    return S * S / V


def _run_lr(spark, subjects):
    df = spark.createDataFrame(subjects, "duration long, event long, grp long")
    return log_rank(df).collect()[0].asDict()


def test_logrank_matches_replay_and_float(spark):
    subs = [
        (1 + (i * 13) % 40 + (i % 2) * 4, 1 if (i * 7) % 10 < 8 else 0, i % 2)
        for i in range(300)
    ]
    got = _run_lr(spark, subs)
    assert got == py_logrank(subs)
    assert abs(got["chi2_milli"] / 1e3 - float_logrank(subs)) < 0.05


def test_logrank_identical_curves_null(spark):
    """Same duration/event stream in both groups -> oe cells vanish
    and chi2 ~ 0, not significant."""
    base = [(1 + (i * 3) % 20, 1 if i % 5 else 0) for i in range(100)]
    subs = [(t, e, 0) for t, e in base] + [(t, e, 1) for t, e in base]
    got = _run_lr(spark, subs)
    assert got["sig"] is False and abs(got["chi2_milli"]) < 100


def test_logrank_strong_separation_significant(spark):
    subs = [(5 + (i % 7), 1, 0) for i in range(80)] + [
        (40 + (i % 7), 1, 1) for i in range(80)
    ]
    got = _run_lr(spark, subs)
    assert got["sig"] is True and got["chi2_milli"] > 100_000


def test_logrank_all_censored_is_null(spark):
    subs = [(1 + i % 9, 0, i % 2) for i in range(50)]
    got = _run_lr(spark, subs)
    assert got["n_times"] == 0
    assert got["chi2_milli"] is None and got["sig"] is None
