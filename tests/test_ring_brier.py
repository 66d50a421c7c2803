"""Gates for the consistent-hash ring (etl/ring.py) and the Murphy
Brier decomposition (evaluation/brier.py): the ring against a bisect
Python replay of the clockwise-successor rule plus the two Karger
minimal-disruption theorems (a removed node's keys are the ONLY keys
that move; an added node only ATTRACTS keys); Brier against an exact
integer replay of the once-quantized milli gaps, the perfect-forecast
zero lane, the constant-forecast RES=0 lane, and the BS = REL - RES +
UNC identity on milli-exact class rates."""

from __future__ import annotations

import bisect
import hashlib

from spanluke_spark.etl.ring import ring_assign
from spanluke_spark.evaluation.brier import brier_decomposition


def h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


# ---------------------------------------------------------------- ring


def py_ring(nodes, vnodes):
    pts = sorted(
        (h60(f"{n}:{v}"), n, v) for n in nodes for v in range(vnodes)
    )
    return pts


def py_assign(pts, key):
    kh = h60(key)
    i = bisect.bisect_left(pts, (kh, "", -1))
    pt = pts[i] if i < len(pts) else pts[0]
    return kh, pt[1], pt[0]


def _assign(spark, keys, nodes, vnodes=8):
    df = spark.createDataFrame([(k,) for k in keys], "key string")
    return {
        r["key"]: (r["kh"], r["node"], r["point_ph"])
        for r in ring_assign(df, nodes, vnodes=vnodes).collect()
    }


def test_ring_matches_bisect_replay(spark):
    nodes = [f"n{i}" for i in range(5)]
    keys = [f"host-{i}" for i in range(200)]
    got = _assign(spark, keys, nodes, vnodes=8)
    pts = py_ring(nodes, 8)
    for k in keys:
        assert got[k] == py_assign(pts, k), k


def test_ring_wraps_to_head(spark):
    """At least one key must exercise the wrap branch (kh above every
    point), and its assignment is the ring head."""
    nodes = [f"n{i}" for i in range(3)]
    pts = py_ring(nodes, 4)
    top = pts[-1][0]
    wrap_keys = [f"k{i}" for i in range(3000) if h60(f"k{i}") > top]
    assert wrap_keys, "fixture must reach the wrap branch"
    got = _assign(spark, wrap_keys[:5], nodes, vnodes=4)
    for k, (kh, node, ph) in got.items():
        assert (ph, node) == (pts[0][0], pts[0][1])


def test_ring_remove_node_minimal_disruption(spark):
    """Karger invariant: removing n2 moves ONLY keys n2 owned — no key
    migrates between two surviving nodes."""
    nodes = [f"n{i}" for i in range(5)]
    keys = [f"host-{i}" for i in range(300)]
    before = _assign(spark, keys, nodes, vnodes=8)
    after = _assign(spark, keys, [n for n in nodes if n != "n2"], vnodes=8)
    moved = [k for k in keys if before[k][1] != after[k][1]]
    assert moved, "n2 must own some keys in the fixture"
    for k in moved:
        assert before[k][1] == "n2", (k, before[k], after[k])
    for k in keys:
        if before[k][1] != "n2":
            assert after[k] == before[k]


def test_ring_add_node_only_attracts(spark):
    """Adding n5 only moves keys TO n5; surviving arcs are untouched."""
    nodes = [f"n{i}" for i in range(5)]
    keys = [f"host-{i}" for i in range(300)]
    before = _assign(spark, keys, nodes, vnodes=8)
    after = _assign(spark, keys, nodes + ["n5"], vnodes=8)
    moved = [k for k in keys if before[k][1] != after[k][1]]
    assert moved, "n5 must capture some arcs in the fixture"
    for k in moved:
        assert after[k][1] == "n5", (k, before[k], after[k])


# --------------------------------------------------------------- brier


def tz(a: int, b: int) -> int:
    """Sign-split truncating division (b > 0) — Spark div semantics."""
    return -(abs(a) // b) if a < 0 else a // b


def py_brier(pairs):
    """pairs: [(f_ppm, outcome)] -> dict of the module's ppm fields,
    replayed with identical integer arithmetic."""
    from collections import defaultdict

    cnt, pos = defaultdict(int), defaultdict(int)
    for f, o in pairs:
        cnt[f] += 1
        pos[f] += int(o)
    n, x = sum(cnt.values()), sum(pos.values())
    rel = res = bs = 0
    for f, nk in cnt.items():
        xk = pos[f]
        d = tz(f * nk - 1_000_000 * xk, 1000 * nk)
        e = tz((xk * n - x * nk) * 1000, nk * n)
        rel += nk * d * d
        res += nk * e * e
        bs += xk * (f - 1_000_000) ** 2 + (nk - xk) * f * f
    out = {
        "n": n,
        "n_bins": len(cnt),
        "bs_ppm": bs // (1_000_000 * n),
        "rel_ppm": rel // n,
        "res_ppm": res // n,
        "unc_ppm": x * (n - x) * 1_000_000 // (n * n),
    }
    out["decomp_gap_ppm"] = out["bs_ppm"] - (
        out["rel_ppm"] - out["res_ppm"] + out["unc_ppm"]
    )
    return out


def _run_brier(spark, pairs):
    df = spark.createDataFrame(pairs, "f_ppm long, outcome boolean")
    return brier_decomposition(df).collect()[0].asDict()


def test_brier_matches_integer_replay(spark):
    pairs = [
        (((i * 37) % 10) * 100_000, (i * 7919 + 13) % 1000 < (i * 37) % 10 * 70)
        for i in range(500)
    ]
    assert _run_brier(spark, pairs) == py_brier(pairs)


def test_brier_perfect_forecaster_is_zero(spark):
    # n = 100 so obar = 0.25 is milli-exact and RES == UNC survives
    # the milli quantization of the per-class e gaps
    pairs = [(1_000_000 if i % 4 == 0 else 0, i % 4 == 0) for i in range(100)]
    got = _run_brier(spark, pairs)
    assert got["bs_ppm"] == 0 and got["rel_ppm"] == 0
    # RES == UNC for a perfect forecaster (o_k in {0,1}), so gap = 0
    assert got["res_ppm"] == got["unc_ppm"] == 187_500
    assert got["decomp_gap_ppm"] == 0


def test_brier_constant_forecast_has_zero_resolution(spark):
    """One bin: o_k == obar exactly, so RES = 0 and REL is the squared
    calibration gap of the single class."""
    pairs = [(250_000, i % 4 == 0) for i in range(400)]
    got = _run_brier(spark, pairs)
    assert got["n_bins"] == 1 and got["res_ppm"] == 0
    # f = 250000 ppm and obar = 0.25 exactly -> perfectly calibrated
    assert got["rel_ppm"] == 0
    assert got["decomp_gap_ppm"] == 0
    assert got["unc_ppm"] == 187_500  # 0.25 * 0.75


def test_brier_identity_on_milli_exact_rates(spark):
    """When every class rate and gap is milli-exact the quantized
    decomposition is the textbook identity: gap == 0."""
    pairs = (
        [(100_000, i % 5 == 0) for i in range(200)]  # o = 0.2, f = 0.1
        + [(900_000, i % 2 == 0) for i in range(200)]  # o = 0.5, f = 0.9
    )
    got = _run_brier(spark, pairs)
    assert got == py_brier(pairs)
    assert got["decomp_gap_ppm"] == 0
