"""Gates for the Theil/Hoover inequality panel
(textops/inequality.py) and the bivariate Mahalanobis audit
(link/mahalanobis.py): the panel against a half-away-round ln-ppm
replay, equal-shares exact 0 / full-concentration exact ln(n) and
(n-1)/n closed forms, and scale invariance of Hoover; Mahalanobis
against an exact integer replay, the EXACT trace identity
sum(num_i) == 2*n*det (population covariance in 2-D), a planted
far-outlier flag with near-mean points passing, correlation
awareness (a point inside both marginal fences but off the ellipse
axis flags), and the collinear-degenerate NULL contract."""

from __future__ import annotations

import math
from collections import Counter

from spanluke_spark.link.mahalanobis import mahalanobis2
from spanluke_spark.textops.inequality import inequality_panel


def rnd(x: float) -> int:
    return int(math.floor(x + 0.5)) if x >= 0 else int(math.ceil(x - 0.5))


# ------------------------------------------------------------ inequality


def py_panel(weights):
    cnt = Counter()
    for u, w in weights:
        cnt[u] += w
    n, s = len(cnt), sum(cnt.values())
    theil = sum(
        x * rnd(math.log(x * n / s) * 1_000_000) for x in cnt.values() if x > 0
    )
    hoover = sum(abs(n * x - s) for x in cnt.values())
    tmag = abs(theil) // s
    return {
        "n_units": n,
        "total": s,
        "theil_num": theil,
        "theil_ppm": -tmag if theil < 0 else tmag,
        "hoover_num": hoover,
        "hoover_ppm": hoover * 1_000_000 // (2 * n * s),
    }


def _run_panel(spark, weights):
    df = spark.createDataFrame(weights, "unit long, w long")
    return inequality_panel(df).collect()[0].asDict()


def test_panel_matches_replay(spark):
    weights = [((i * i) % 23, 1 + i % 3) for i in range(400)]
    assert _run_panel(spark, weights) == py_panel(weights)


def test_panel_equal_shares_zero(spark):
    got = _run_panel(spark, [(u, 7) for u in range(20)])
    assert got["theil_num"] == 0 and got["theil_ppm"] == 0
    assert got["hoover_num"] == 0 and got["hoover_ppm"] == 0


def test_panel_full_concentration_closed_forms(spark):
    """One unit holds everything (others present with 0 weight):
    Theil = ln(n) exactly in quantized units, Hoover = (n-1)/n."""
    weights = [(0, 120)] + [(u, 0) for u in range(1, 16)]
    got = _run_panel(spark, weights)
    assert got["n_units"] == 16
    assert got["theil_ppm"] == rnd(math.log(16) * 1_000_000) == 2_772_589
    assert got["hoover_ppm"] == 15 * 1_000_000 // 16


def test_panel_hoover_scale_invariant(spark):
    a = _run_panel(spark, [(u, 3 + (u * u) % 7) for u in range(12)])
    b = _run_panel(spark, [(u, (3 + (u * u) % 7) * 10) for u in range(12)])
    assert a["hoover_ppm"] == b["hoover_ppm"]


# ----------------------------------------------------------- mahalanobis


def py_mahal(pts, crit_milli=5991):
    n = len(pts)
    sx = sum(x for _, x, _ in pts)
    sy = sum(y for _, _, y in pts)
    sxx = n * sum(x * x for _, x, _ in pts) - sx * sx
    sxy = n * sum(x * y for _, x, y in pts) - sx * sy
    syy = n * sum(y * y for _, _, y in pts) - sy * sy
    det = sxx * syy - sxy * sxy
    out = {}
    for i, x, y in pts:
        u, v = n * x - sx, n * y - sy
        num = syy * u * u - 2 * sxy * u * v + sxx * v * v
        d2 = num * 1000 // det if det > 0 else None
        out[i] = (num, det, d2, None if d2 is None else d2 >= crit_milli)
    return out


def _run_mahal(spark, pts, crit_milli=5991):
    df = spark.createDataFrame(pts, "id long, x long, y long")
    return {
        r["id"]: (r["num"], r["det"], r["d2_milli"], r["outlier"])
        for r in mahalanobis2(df, crit_milli=crit_milli).collect()
    }


def test_mahal_matches_replay_and_trace_identity(spark):
    pts = [(i, (i * 7) % 21 - 10, ((i * 7) % 21 - 10) + (i * 5) % 7 - 3)
           for i in range(100)]
    got = _run_mahal(spark, pts)
    exp = py_mahal(pts)
    assert got == exp
    # population-covariance trace identity: sum d2_i == p*n == 2n,
    # exactly: sum(num_i) == 2*n*det
    det = next(iter(got.values()))[1]
    assert sum(v[0] for v in got.values()) == 2 * len(pts) * det


def test_mahal_flags_far_outlier_only(spark):
    pts = [(i, (i * 3) % 7 - 3, (i * 5) % 7 - 3) for i in range(60)]
    pts.append((60, 40, -40))
    got = _run_mahal(spark, pts)
    assert got[60][3] is True
    near_mean = [i for i, x, y in pts[:60] if abs(x) <= 1 and abs(y) <= 1]
    assert near_mean and all(got[i][3] is False for i in near_mean)


def test_mahal_sees_correlation_structure(spark):
    """Tight y ~ x cloud: the point (3, -3) sits inside both marginal
    ranges but far off the ellipse axis -> flagged; (3, 3) on the
    axis is not."""
    pts = [(i, v, v + (i % 3) - 1) for i, v in enumerate(
        ((j * 7) % 11) - 5 for j in range(80)
    )]
    pts += [(80, 3, -3), (81, 3, 3)]
    got = _run_mahal(spark, pts)
    assert got[80][2] > got[81][2]
    assert got[80][3] is True and got[81][3] is False


def test_mahal_collinear_is_null(spark):
    pts = [(i, i, 2 * i) for i in range(30)]
    got = _run_mahal(spark, pts)
    assert all(v[1] == 0 and v[2] is None and v[3] is None
               for v in got.values())
