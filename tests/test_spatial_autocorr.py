"""Gates for graph spatial autocorrelation (graph/spatial.py):
Moran's I / Geary's C against a bit-exact integer replay AND the
float textbook formulas, the closed forms — perfectly smooth ring
(I -> +, C < 1000), alternating anti-correlated ring (I < 0,
C > 1000), constant attribute NULL, empty edge list NULL — plus
self-loop immunity; join counts against replay, conservation
BB + WW + BW == W, all-black (BW = 0, BB = W) and expected-fraction
sum == 10^6 (up to trunc slack)."""

from __future__ import annotations

from spanluke_spark.graph.spatial import join_counts, moran_geary

# ---------------------------------------------------- python replays


def py_moran_geary(xs, edges):
    n = len(xs)
    sx = sum(xs.values())
    sxx = sum(v * v for v in xs.values())
    pairs = [(s, d) for s, d in edges if s != d]
    w = len(pairs)
    cross = sum((n * xs[s] - sx) * (n * xs[d] - sx) for s, d in pairs)
    dd = sum((xs[s] - xs[d]) ** 2 for s, d in pairs)
    szz = n * sxx - sx * sx
    moran = (
        (abs(cross) * 10**6 // (w * szz)) * (1 if cross >= 0 else -1)
        if w > 0 and szz > 0
        else None
    )
    geary = (
        n * (n - 1) * dd * 1000 // (2 * w * szz)
        if w > 0 and szz > 0
        else None
    )
    return {
        "n_nodes": n,
        "w_edges": w,
        "cross_num": cross,
        "geary_d": dd,
        "moran_ppm": moran,
        "expected_i_ppm": -(10**6 // (n - 1)) if n > 1 else None,
        "geary_milli": geary,
    }


def py_join_counts(bs, edges):
    n = len(bs)
    nb = sum(bs.values())
    pairs = [(s, d) for s, d in edges if s != d]
    w = len(pairs)
    bb = sum(1 for s, d in pairs if bs[s] and bs[d])
    ww = sum(1 for s, d in pairs if not bs[s] and not bs[d])
    bw = w - bb - ww
    den = n * (n - 1)
    ok = w > 0 and n > 1
    return {
        "n_nodes": n,
        "n_black": nb,
        "w_edges": w,
        "bb": bb,
        "ww": ww,
        "bw": bw,
        "expected_bb_ppm": nb * (nb - 1) * 10**6 // den if ok else None,
        "expected_ww_ppm": (
            (n - nb) * (n - nb - 1) * 10**6 // den if ok else None
        ),
        "expected_bw_ppm": 2 * nb * (n - nb) * 10**6 // den if ok else None,
    }


def _run_mg(spark, xs, edges):
    nodes = spark.createDataFrame(
        [(k, v) for k, v in xs.items()], "node long, x long"
    )
    e = spark.createDataFrame(list(edges), "src long, dst long")
    return moran_geary(nodes, e).collect()[0].asDict()


def _run_jc(spark, bs, edges):
    nodes = spark.createDataFrame(
        [(k, v) for k, v in bs.items()], "node long, b long"
    )
    e = spark.createDataFrame(list(edges), "src long, dst long")
    return join_counts(nodes, e).collect()[0].asDict()


def _ring(n, step=1):
    return [(i, (i + step) % n) for i in range(n)]


# ------------------------------------------------------------- moran


def test_moran_matches_replay_and_float(spark):
    xs = {i: abs(i - 20) + (i * 7) % 5 for i in range(40)}
    edges = _ring(40) + [(i, (i * i + 3) % 40) for i in range(40)]
    got = _run_mg(spark, xs, edges)
    exp = py_moran_geary(xs, edges)
    assert got == exp
    # float textbook cross-check
    n = 40
    mean = sum(xs.values()) / n
    z = {i: xs[i] - mean for i in xs}
    pairs = [(s, d) for s, d in edges if s != d]
    w = len(pairs)
    szz = sum(v * v for v in z.values())
    i_f = (n / w) * sum(z[s] * z[d] for s, d in pairs) / szz
    c_f = ((n - 1) / (2 * w)) * sum(
        (xs[s] - xs[d]) ** 2 for s, d in pairs
    ) / szz
    assert abs(got["moran_ppm"] - i_f * 10**6) <= 2
    assert abs(got["geary_milli"] - c_f * 1000) <= 2


def test_moran_smooth_ring_positive(spark):
    # triangle wave along the ring: neighbours nearly equal
    xs = {i: abs(i - 15) for i in range(30)}
    got = _run_mg(spark, xs, _ring(30))
    assert got["moran_ppm"] > 800_000
    assert got["geary_milli"] < 1000


def test_moran_alternating_ring_negative(spark):
    # perfect checkerboard: every neighbour pair anti-correlated
    xs = {i: i % 2 for i in range(30)}
    got = _run_mg(spark, xs, _ring(30))
    assert got["moran_ppm"] < -900_000
    assert got["geary_milli"] > 1900


def test_moran_constant_null(spark):
    xs = {i: 7 for i in range(10)}
    got = _run_mg(spark, xs, _ring(10))
    assert got["moran_ppm"] is None and got["geary_milli"] is None
    assert got["expected_i_ppm"] == -(10**6 // 9)


def test_moran_self_loops_dropped(spark):
    xs = {i: abs(i - 5) for i in range(12)}
    base = _run_mg(spark, xs, _ring(12))
    withloops = _run_mg(spark, xs, _ring(12) + [(3, 3), (7, 7)])
    assert base == withloops


# ------------------------------------------------------- join counts


def test_join_counts_matches_replay(spark):
    bs = {i: 1 if i % 3 == 0 else 0 for i in range(30)}
    edges = _ring(30) + _ring(30, step=7)
    got = _run_jc(spark, bs, edges)
    assert got == py_join_counts(bs, edges)
    assert got["bb"] + got["ww"] + got["bw"] == got["w_edges"]
    # period-3 labels: step-1 has no BB, step-7 (7 % 3 != 0) none either
    assert got["bb"] == 0


def test_join_counts_step3_all_black_adjacency(spark):
    # step-3 chords connect same-residue nodes: every black edge BB
    bs = {i: 1 if i % 3 == 0 else 0 for i in range(30)}
    got = _run_jc(spark, bs, _ring(30, step=3))
    assert got["bb"] == 10 and got["bw"] == 0 and got["ww"] == 20


def test_join_counts_all_black(spark):
    bs = {i: 1 for i in range(15)}
    got = _run_jc(spark, bs, _ring(15))
    assert got["bb"] == got["w_edges"] == 15
    assert got["ww"] == got["bw"] == 0
    assert got["expected_bb_ppm"] == 10**6
    assert got["expected_ww_ppm"] == got["expected_bw_ppm"] == 0


def test_join_counts_expected_fractions_sum(spark):
    bs = {i: 1 if i % 4 == 0 else 0 for i in range(29)}
    got = _run_jc(spark, bs, _ring(29))
    tot = (
        got["expected_bb_ppm"]
        + got["expected_ww_ppm"]
        + got["expected_bw_ppm"]
    )
    assert 10**6 - 3 <= tot <= 10**6
