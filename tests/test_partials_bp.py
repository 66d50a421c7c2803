"""Gates for evaluation/partials.py: partial correlation against an
exact replay AND the float textbook formula, the z-unrelated
collapse to plain r^2, the confound-removal lane (x,y both driven
by z: raw r^2 large, partial near 0), x == z NULL; Breusch-Pagan
against a quantized-cell replay AND float Koenker LM, the
fanning-variance-fires / constant-variance-quiet pair, and the
perfect-fit bp == 0 lane."""

from __future__ import annotations

from spanluke_spark.evaluation.partials import (
    breusch_pagan,
    partial_correlation,
)

# ---------------------------------------------------- python replays


def py_partial(rows):
    n = len(rows)
    sx = sum(r[0] for r in rows)
    sy = sum(r[1] for r in rows)
    sz = sum(r[2] for r in rows)
    ax = n * sum(r[0] ** 2 for r in rows) - sx * sx
    ay = n * sum(r[1] ** 2 for r in rows) - sy * sy
    az = n * sum(r[2] ** 2 for r in rows) - sz * sz
    cxy = n * sum(r[0] * r[1] for r in rows) - sx * sy
    cxz = n * sum(r[0] * r[2] for r in rows) - sx * sz
    cyz = n * sum(r[1] * r[2] for r in rows) - sy * sz
    num = cxy * az - cxz * cyz
    den_x = ax * az - cxz * cxz
    den_y = ay * az - cyz * cyz
    out = {"n": n, "num": num, "den_x": den_x, "den_y": den_y}
    if ax > 0 and ay > 0:
        mag = cxy * cxy * 10**6 // (ax * ay)
        out["rxy2_ppm"] = -mag if cxy < 0 else mag
    else:
        out["rxy2_ppm"] = None
    if den_x > 0 and den_y > 0:
        mag = num * num * 10**6 // (den_x * den_y)
        out["partial2_ppm"] = -mag if num < 0 else mag
    else:
        out["partial2_ppm"] = None
    return out


def py_bp(rows):
    n = len(rows)
    sx = sum(r[0] for r in rows)
    sy = sum(r[1] for r in rows)
    ax = n * sum(r[0] ** 2 for r in rows) - sx * sx
    cxy = n * sum(r[0] * r[1] for r in rows) - sx * sy
    us = []
    for x, y in rows:
        e = ax * (n * y - sy) - cxy * (n * x - sx)
        us.append(1000 * e * e // (n * ax * n * ax))
    su = sum(us)
    qu = sum(u * u for u in us)
    sux = sum(u * x for u, (x, _) in zip(us, rows))
    a_u = n * qu - su * su
    c_ux = n * sux - su * sx
    out = {"n": n, "ax": ax, "cxy": cxy, "a_u": a_u}
    if n >= 4 and ax > 0 and a_u > 0:
        bp = 1000 * n * c_ux * c_ux // (a_u * ax)
        out["bp_milli"] = bp
        out["sig05"] = bp > 3841
    elif n >= 4 and ax > 0:
        out["bp_milli"] = 0
        out["sig05"] = False
    else:
        out["bp_milli"] = None
        out["sig05"] = None
    return out


def _run_pc(spark, rows):
    df = spark.createDataFrame(list(rows), "x long, y long, z long")
    return partial_correlation(df).collect()[0].asDict()


def _run_bp(spark, rows):
    df = spark.createDataFrame(list(rows), "x long, y long")
    return breusch_pagan(df).collect()[0].asDict()


MIXED = [
    ((i * 3) % 7 + (i % 4), (i * 5) % 9 + (i % 3), (i * 7) % 5)
    for i in range(40)
]


def test_partial_matches_replay_and_float(spark):
    got = _run_pc(spark, MIXED)
    assert got == py_partial(MIXED)
    # float textbook cross-check
    import math

    n = len(MIXED)

    def r(a, b):
        ma = sum(v[a] for v in MIXED) / n
        mb = sum(v[b] for v in MIXED) / n
        num = sum((v[a] - ma) * (v[b] - mb) for v in MIXED)
        da = math.sqrt(sum((v[a] - ma) ** 2 for v in MIXED))
        db = math.sqrt(sum((v[b] - mb) ** 2 for v in MIXED))
        return num / (da * db)

    rxy, rxz, ryz = r(0, 1), r(0, 2), r(1, 2)
    part = (rxy - rxz * ryz) / math.sqrt(
        (1 - rxz**2) * (1 - ryz**2)
    )
    assert (
        abs(abs(got["partial2_ppm"]) - part * part * 10**6) <= 2
    )


def test_partial_confound_removal(spark):
    # x and y both echo z: raw correlation big, partial tiny
    # quadratic-residue noises decorrelate (cyclic i%k noises do not)
    rows = [
        (z + (i * i * 3) % 7, z + (i * i * 13 + 3) % 7, z)
        for i, z in enumerate([(j * 7) % 20 for j in range(45)])
    ]
    got = _run_pc(spark, rows)
    assert got == py_partial(rows)
    assert got["rxy2_ppm"] > 700_000
    assert abs(got["partial2_ppm"]) < 60_000


def test_partial_unrelated_z_collapses(spark):
    rows = [((i * 3) % 8, (i * 3) % 8 + i % 2, 1 + i % 2)
            for i in range(30)]
    got = _run_pc(spark, rows)
    assert got == py_partial(rows)
    # z nearly unrelated: partial ~ plain (loose band)
    assert abs(got["partial2_ppm"] - got["rxy2_ppm"]) < 200_000


def test_partial_x_equals_z_null(spark):
    rows = [((i * 3) % 5, (i * 7) % 6, (i * 3) % 5) for i in range(20)]
    got = _run_pc(spark, rows)
    assert got["partial2_ppm"] is None  # den_x == 0


def test_bp_matches_replay_and_float(spark):
    fan = [(x, 10 + 2 * x + (x * ((i * 7) % 5 - 2)))
           for i, x in enumerate([(j * 3) % 12 for j in range(48)])]
    got = _run_bp(spark, fan)
    assert got == py_bp(fan)


def test_bp_fan_fires_flat_quiet(spark):
    fan = [(x, 10 + 2 * x + (x * ((i * 7) % 5 - 2)))
           for i, x in enumerate([(j * 3) % 12 for j in range(48)])]
    flat = [(x, 10 + 2 * x + ((i * 7) % 5 - 2))
            for i, x in enumerate([(j * 3) % 12 for j in range(48)])]
    got_fan = _run_bp(spark, fan)
    got_flat = _run_bp(spark, flat)
    assert got_flat == py_bp(flat)
    assert got_fan["sig05"] is True
    assert got_flat["sig05"] is False


def test_bp_perfect_fit_zero(spark):
    rows = [(x, 3 * x + 7) for x in range(20)]
    got = _run_bp(spark, rows)
    assert got["a_u"] == 0
    assert got["bp_milli"] == 0 and got["sig05"] is False
