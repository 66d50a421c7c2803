"""Gates for textops/capture.py: capture-recapture against an
integer replay, the identical-crawls-exact-n lane (the +1s cancel),
nested-crawl LP == n1, full-recapture zero variance, m == 0
LP-NULL-Chapman-defined, neither-crawl rows ignored; Chao1 against
replay, no-singletons == s_obs exactly, all-singletons maximal
extrapolation, chao1 >= s_obs monotonicity, and
more-duplication-shrinks-the-unseen-estimate."""

from __future__ import annotations

from collections import Counter

from spanluke_spark.textops.capture import capture_recapture, chao1

# ---------------------------------------------------- python replays


def py_cr(rows):
    rows = [(k, a, b) for k, a, b in rows if a or b]
    n1 = sum(1 for _, a, _ in rows if a)
    n2 = sum(1 for _, _, b in rows if b)
    m = sum(1 for _, a, b in rows if a and b)
    return {
        "n1": n1,
        "n2": n2,
        "m": m,
        "lp_milli": 1000 * n1 * n2 // m if m else None,
        "chapman_milli": 1000 * (n1 + 1) * (n2 + 1) // (m + 1) - 1000,
        "var_chapman_milli": (
            1000 * (n1 + 1) * (n2 + 1) * (n1 - m) * (n2 - m)
            // ((m + 1) * (m + 1) * (m + 2))
        ),
    }


def py_chao(keys):
    c = Counter(keys)
    f1 = sum(1 for v in c.values() if v == 1)
    f2 = sum(1 for v in c.values() if v == 2)
    s = len(c)
    extra = 1000 * f1 * (f1 - 1) // (2 * (f2 + 1))
    return {
        "n_obs": len(keys),
        "s_obs": s,
        "f1": f1,
        "f2": f2,
        "chao1_milli": 1000 * s + extra,
        "unseen_milli": extra,
    }


def _run_cr(spark, rows):
    df = spark.createDataFrame(
        list(rows), "key long, in_a boolean, in_b boolean"
    )
    return capture_recapture(df).collect()[0].asDict()


def _run_chao(spark, keys):
    df = spark.createDataFrame([(int(k),) for k in keys], "key long")
    return chao1(df).collect()[0].asDict()


MIXED = [
    (k, k % 2 == 0 or k % 5 == 0, k % 3 == 0 or k % 5 == 0)
    for k in range(120)
]


def test_cr_matches_replay(spark):
    got = _run_cr(spark, MIXED)
    assert got == py_cr(MIXED)


def test_cr_identical_crawls_exact(spark):
    rows = [(k, True, True) for k in range(37)]
    got = _run_cr(spark, rows)
    assert got["lp_milli"] == 37_000
    assert got["chapman_milli"] == 37_000  # the +1s cancel exactly
    assert got["var_chapman_milli"] == 0


def test_cr_nested_and_m0(spark):
    nested = [(k, True, k < 20) for k in range(50)]
    got = _run_cr(spark, nested)
    assert got == py_cr(nested)
    assert got["lp_milli"] == 50_000  # LP == n1 when B subset of A
    disjoint = [(k, k < 10, k >= 10) for k in range(20)]
    got2 = _run_cr(spark, disjoint)
    assert got2["lp_milli"] is None
    assert got2["chapman_milli"] == py_cr(disjoint)["chapman_milli"]


def test_cr_neither_rows_ignored(spark):
    rows = MIXED + [(1000 + k, False, False) for k in range(30)]
    assert _run_cr(spark, rows) == py_cr(MIXED)


def test_chao_matches_replay_and_lanes(spark):
    keys = [k % 40 for k in range(100)] + list(range(200, 215))
    got = _run_chao(spark, keys)
    assert got == py_chao(keys)
    assert got["chao1_milli"] >= 1000 * got["s_obs"]


def test_chao_no_singletons_exact(spark):
    keys = [k % 20 for k in range(60)]  # every type seen 3x
    got = _run_chao(spark, keys)
    assert got["f1"] == 0
    assert got["chao1_milli"] == 1000 * got["s_obs"]
    assert got["unseen_milli"] == 0


def test_chao_all_singletons_maximal(spark):
    keys = list(range(12))
    got = _run_chao(spark, keys)
    assert got == py_chao(keys)
    assert got["unseen_milli"] == 1000 * 12 * 11 // 2


def test_chao_duplication_shrinks_unseen(spark):
    sparse = list(range(30)) + [0, 1]
    dense = [k % 30 for k in range(90)] + [0, 1]
    a = _run_chao(spark, sparse)
    b = _run_chao(spark, dense)
    assert a["unseen_milli"] > b["unseen_milli"]
