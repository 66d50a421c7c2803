"""Gates for Jensen-Shannon divergence (textops/jsd.py) and the
silhouette coefficient (link/silhouette.py): JSD against a
half-away-round ln-ppm replay, the identical-distributions exact-0
lane, the disjoint-vocabulary exact-ln2 lane (693147 ppm with no
float luck), symmetry under side swap, and the ln2 upper bound;
silhouette against a full Python replay of the once-quantized
pipeline, perfectly-separated-clusters s ~ 1, the singleton s = 0
convention, the k=1 NULL-b contract, and coincident-point 0."""

from __future__ import annotations

import math
from collections import Counter, defaultdict

from spanluke_spark.link.silhouette import silhouette
from spanluke_spark.textops.jsd import jsd

LN2_PPM = 693_147


def rnd(x: float) -> int:
    return int(math.floor(x + 0.5)) if x >= 0 else int(math.ceil(x - 0.5))


# ------------------------------------------------------------------ jsd


def py_jsd(pairs):
    """pairs: [(fg, token)] -> dict of the module's fields."""
    p, q = Counter(), Counter()
    for fg, tok in pairs:
        (p if fg else q)[tok] += 1
    np_, nq = sum(p.values()), sum(q.values())
    toks = set(p) | set(q)
    num_p = num_q = 0
    for t in toks:
        pi, qi = p[t], q[t]
        mix = pi * nq + qi * np_
        if pi > 0:
            num_p += pi * rnd(math.log(2 * pi * nq / mix) * 1_000_000)
        if qi > 0:
            num_q += qi * rnd(math.log(2 * qi * np_ / mix) * 1_000_000)
    raw = num_p * nq + num_q * np_
    mag = abs(raw) // (2 * np_ * nq)
    return {
        "np_total": np_,
        "nq_total": nq,
        "n_tokens": len(toks),
        "num_p": num_p,
        "num_q": num_q,
        "jsd_ppm": -mag if raw < 0 else mag,
    }


def _run_jsd(spark, pairs):
    df = spark.createDataFrame(pairs, "fg boolean, token string")
    return jsd(df).collect()[0].asDict()


def test_jsd_matches_lnppm_replay(spark):
    pairs = [
        (i % 3 == 0, f"t{(i * 7) % 40 if i % 3 == 0 else (i * 11) % 25}")
        for i in range(600)
    ]
    got = _run_jsd(spark, pairs)
    assert got == py_jsd(pairs)
    assert 0 < got["jsd_ppm"] < LN2_PPM  # non-degenerate fixture


def test_jsd_identical_distributions_is_exactly_zero(spark):
    """Same per-token shares on both sides (different totals) ->
    every midpoint ratio is exactly 1 -> 0 with no float luck."""
    pairs = [(True, f"t{i % 8}") for i in range(160)] + [
        (False, f"t{i % 8}") for i in range(240)
    ]
    got = _run_jsd(spark, pairs)
    assert got["num_p"] == got["num_q"] == 0
    assert got["jsd_ppm"] == 0


def test_jsd_disjoint_vocabularies_is_exactly_ln2(spark):
    pairs = [(True, f"a{i % 5}") for i in range(100)] + [
        (False, f"b{i % 7}") for i in range(140)
    ]
    got = _run_jsd(spark, pairs)
    assert got["jsd_ppm"] == LN2_PPM


def test_jsd_symmetric_and_bounded(spark):
    pairs = [(i % 4 == 0, f"t{(i * 11) % 20}") for i in range(400)]
    a = _run_jsd(spark, pairs)
    b = _run_jsd(spark, [(not fg, t) for fg, t in pairs])
    assert a["jsd_ppm"] == b["jsd_ppm"]
    assert 0 <= a["jsd_ppm"] <= LN2_PPM


# ----------------------------------------------------------- silhouette


def py_silhouette(rows):
    """rows: [(id, cluster, vec)] -> {id: (a_ppm, b_ppm, s_ppm)}."""
    sums, cnts = defaultdict(int), defaultdict(int)
    for i, _, vi in rows:
        for j, cj, vj in rows:
            if i == j:
                continue
            d2 = sum((x - y) ** 2 for x, y in zip(vi, vj))
            sums[(i, cj)] += d2
            cnts[(i, cj)] += 1
    out = {}
    for i, ci, _ in rows:
        a = (
            sums[(i, ci)] * 1_000_000 // cnts[(i, ci)]
            if cnts[(i, ci)]
            else None
        )
        others = [
            sums[(i, c)] * 1_000_000 // cnts[(i, c)]
            for (ii, c) in cnts
            if ii == i and c != ci
        ]
        b = min(others) if others else None
        if a is None or (b is not None and max(a, b) <= 0):
            s = 0
        elif b is None:
            s = None
        else:
            mag = abs(b - a) * 1_000_000 // max(a, b)
            s = -mag if b < a else mag
        out[i] = (a, b, s)
    return out


def _run_sil(spark, rows):
    df = spark.createDataFrame(
        rows, "id long, cluster long, vec array<long>"
    )
    return {
        r["id"]: (r["a_ppm"], r["b_ppm"], r["s_ppm"])
        for r in silhouette(df).collect()
    }


def test_silhouette_matches_python_replay(spark):
    rows = [
        (i, (i * 3) % 4, [(i * 7 + d * 13) % 30 for d in range(6)])
        for i in range(60)
    ]
    assert _run_sil(spark, rows) == py_silhouette(rows)


def test_silhouette_separated_clusters_near_one(spark):
    """Two tight, far-apart blobs: every s close to 1e6 and positive."""
    rows = [(i, 0, [i % 3, 0]) for i in range(6)] + [
        (i + 6, 1, [1000 + i % 3, 0]) for i in range(6)
    ]
    got = _run_sil(spark, rows)
    assert all(v[2] > 990_000 for v in got.values())


def test_silhouette_singleton_is_zero_and_k1_is_null(spark):
    rows = [(0, 0, [0, 0]), (1, 0, [4, 0]), (2, 1, [100, 0])]
    got = _run_sil(spark, rows)
    assert got[2][0] is None and got[2][2] == 0  # singleton cluster
    assert got[0][2] < 0 or got[0][2] > 0  # well-defined for others
    k1 = _run_sil(spark, [(0, 0, [1, 2]), (1, 0, [3, 4])])
    assert k1[0] == (8_000_000, None, None)  # d2 = 2^2 + 2^2 = 8


def test_silhouette_coincident_points_zero(spark):
    rows = [(0, 0, [5, 5]), (1, 0, [5, 5]), (2, 1, [5, 5]), (3, 1, [5, 5])]
    got = _run_sil(spark, rows)
    assert all(v == (0, 0, 0) for v in got.values())
