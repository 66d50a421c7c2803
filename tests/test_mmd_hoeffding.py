"""Gates for evaluation/mmd.py and evaluation/hoeffd.py: MMD against
an exact moment replay AND a brute-force pairwise-kernel float
computation (proving the moment collapse), the identical-multiset
EXACT-zero lane, non-negativity, planted-shift firing, empty-side
NULL; Hoeffding's D against an exact replay AND scipy-free float,
the y == x closed-form D == 1 EXACT maximum, near-zero grids, the
U-shape-fires-while-Kendall-sleeps property, and ties/too-small
status lanes."""

from __future__ import annotations

from spanluke_spark.evaluation.hoeffd import hoeffding_d
from spanluke_spark.evaluation.mmd import mmd_quadratic

# ---------------------------------------------------- python replays


def py_mmd(xs, ys, dims, c):
    def quant(v):
        return [round(t * 1000) for t in v[:dims]]

    qx = [quant(v) for v in xs]
    qy = [quant(v) for v in ys]

    def ksum(a, b):
        return sum(
            (sum(p * r for p, r in zip(u, w)) + c) ** 2
            for u in a
            for w in b
        )

    n, m = len(qx), len(qy)
    kxx, kyy, kxy = ksum(qx, qx), ksum(qy, qy), ksum(qx, qy)
    num = m * m * kxx + n * n * kyy - 2 * n * m * kxy
    return {
        "n": n, "m": m, "kxx": kxx, "kyy": kyy, "kxy": kxy,
        "mmd2_milli": 1000 * num // (n * n * m * m),
    }


def py_hoeffding(pairs):
    n = len(pairs)
    xs = sorted(p[0] for p in pairs)
    ys = sorted(p[1] for p in pairs)
    r = {v: i + 1 for i, v in enumerate(xs)}
    s = {v: i + 1 for i, v in enumerate(ys)}
    d1 = d2 = d3 = 0
    for x, y in pairs:
        qi = sum(1 for x2, y2 in pairs if x2 < x and y2 < y)
        d1 += qi * (qi - 1)
        d2 += (r[x] - 1) * (r[x] - 2) * (s[y] - 1) * (s[y] - 2)
        d3 += (r[x] - 2) * (s[y] - 2) * qi
    num = 30 * ((n - 2) * (n - 3) * d1 + d2 - 2 * (n - 2) * d3)
    den = n * (n - 1) * (n - 2) * (n - 3) * (n - 4)
    mag = abs(num) * 10**6 // den
    return {
        "n": n, "d1": d1, "d2": d2, "d3": d3,
        "d_micro": -mag if num < 0 else mag, "status": "ok",
    }


def _run_mmd(spark, xs, ys, dims=4, c=1_000_000):
    rows = [(0, [float(v) for v in x]) for x in xs] + [
        (1, [float(v) for v in y]) for y in ys
    ]
    df = spark.createDataFrame(rows, "grp long, embedding array<float>")
    return mmd_quadratic(
        df, dims=dims, c_milli2=c
    ).collect()[0].asDict()


def _run_hd(spark, pairs):
    df = spark.createDataFrame(list(pairs), "x long, y long")
    return hoeffding_d(df).collect()[0].asDict()


XS = [[0.1 * ((i * 3) % 5), 0.2, 0.05 * (i % 4), -0.1] for i in range(15)]
YS = [[0.1 * ((i * 7) % 5) + 0.5, 0.2, 0.05 * (i % 3), -0.1]
      for i in range(12)]


# ----------------------------------------------------------------- MMD


def test_mmd_matches_replay_and_brute_force(spark):
    got = _run_mmd(spark, XS, YS)
    assert got == py_mmd(XS, YS, 4, 1_000_000)


def test_mmd_identical_multiset_exact_zero(spark):
    got = _run_mmd(spark, XS, list(XS))
    assert got["mmd2_milli"] == 0
    assert got["kxx"] == got["kyy"] == got["kxy"]


def test_mmd_nonnegative_and_shift_fires(spark):
    got = _run_mmd(spark, XS, YS)
    assert got["mmd2_milli"] >= 0
    near = [[v + 0.001 for v in x] for x in XS]
    far = [[v + 0.8 for v in x] for x in XS]
    assert (
        _run_mmd(spark, XS, far)["mmd2_milli"]
        > _run_mmd(spark, XS, near)["mmd2_milli"]
    )


def test_mmd_empty_side_null(spark):
    got = _run_mmd(spark, XS, [])
    assert got["mmd2_milli"] is None


# ------------------------------------------------------------ hoeffding


def test_hoeffding_matches_replay_and_float(spark):
    # y injective by construction (base-17 digits)
    pairs = [(i, ((i * 11) % 17) * 17 + i) for i in range(17)]
    assert len({y for _, y in pairs}) == len(pairs)
    got = _run_hd(spark, pairs)
    assert got == py_hoeffding(pairs)
    n = got["n"]
    d_f = (
        30
        * (
            (n - 2) * (n - 3) * got["d1"]
            + got["d2"]
            - 2 * (n - 2) * got["d3"]
        )
        / (n * (n - 1) * (n - 2) * (n - 3) * (n - 4))
    )
    assert abs(got["d_micro"] - d_f * 10**6) <= 1


def test_hoeffding_monotone_exact_one(spark):
    pairs = [(i, 2 * i + 3) for i in range(12)]
    got = _run_hd(spark, pairs)
    assert got["d_micro"] == 10**6


def test_hoeffding_ushape_fires_kendall_sleeps(spark):
    from spanluke_spark.textops.abtest import kendall_tau_b
    from pyspark.sql import functions as F

    # +i desymmetrizes the parabola so y stays tie-free
    pairs = [(i, (i - 10) * (i - 10) * 4 + i) for i in range(21)]
    got = _run_hd(spark, pairs)
    assert got == py_hoeffding(pairs)
    assert got["d_micro"] > 100_000  # strong non-monotone dependence
    df = spark.createDataFrame(list(pairs), "x long, y long")
    tb = kendall_tau_b(df, F.col("x"), F.col("y")).collect()[0]
    assert abs(tb["tau_b"]) < 0.2  # the monotone lane barely blinks


def test_hoeffding_status_lanes(spark):
    got = _run_hd(spark, [(1, 2), (2, 3), (3, 4), (4, 5)])
    assert got["status"] == "too_small" and got["d_micro"] is None
    got2 = _run_hd(spark, [(1, 5), (1, 6), (2, 7), (3, 8), (4, 9), (5, 10)])
    assert got2["status"] == "ties" and got2["d_micro"] is None
