"""Gates for Needleman-Wunsch (textops/nwalign.py) and the dispersion
index (textops/fano.py): NW against a full python DP replay, the
identity pair scoring exactly 2*len, empty sides scoring -(other
len), hyp/ref symmetry, and the SW >= max(NW, 0) cross-lane
domination against the in-repo smith_waterman; Fano against a replay
AND a float VMR cross-check, constant-count zero, the
single-loaded-bucket vmr = 1000*c closed form, planted burst
overdispersed vs md5-spread underdispersed-or-near-1 direction."""

from __future__ import annotations

from spanluke_spark.textops.fano import dispersion_index
from spanluke_spark.textops.nwalign import needleman_wunsch
from spanluke_spark.textops.swalign import smith_waterman

# ---------------------------------------------------- python replays


def py_nw(hyp, ref):
    lh, lr = len(hyp), len(ref)
    d = [[0] * (lr + 1) for _ in range(lh + 1)]
    for i in range(lh + 1):
        d[i][0] = -i
    for j in range(lr + 1):
        d[0][j] = -j
    for i in range(1, lh + 1):
        for j in range(1, lr + 1):
            m = 2 if hyp[i - 1] == ref[j - 1] else -1
            d[i][j] = max(
                d[i - 1][j] - 1, d[i][j - 1] - 1, d[i - 1][j - 1] + m
            )
    return d[lh][lr]


def py_fano(xs):
    n = len(xs)
    sx = sum(xs)
    sxx = sum(x * x for x in xs)
    if n < 2 or sx == 0:
        return {"n": n, "sx": sx, "sxx": sxx, "chi2_milli": None,
                "vmr_milli": None, "direction": None}
    chi2 = 1000 * (n * sxx - sx * sx) // sx
    vmr = 1000 * (n * sxx - sx * sx) // ((n - 1) * sx)
    direction = (
        "overdispersed" if vmr > 1000
        else "underdispersed" if vmr < 1000 else "poisson_consistent"
    )
    return {"n": n, "sx": sx, "sxx": sxx, "chi2_milli": chi2,
            "vmr_milli": vmr, "direction": direction}


def _run_nw(spark, pairs):
    rows = [(i, h, r) for i, (h, r) in enumerate(pairs)]
    df = spark.createDataFrame(
        rows, "pair_id long, hyp array<string>, ref array<string>"
    )
    return [
        r["score"]
        for r in needleman_wunsch(df).orderBy("pair_id").collect()
    ]


def _run_fano(spark, xs):
    df = spark.createDataFrame([(x,) for x in xs], "x long")
    return dispersion_index(df).collect()[0].asDict()


# ------------------------------------------------------------------ nw


def test_nw_matches_replay(spark):
    pairs = [
        (list("gattaca"), list("gcatgcu")),
        ("the court held the appeal".split(),
         "court held an appeal today".split()),
        (list("abc"), list("abc")),
        (list(""), list("abcd")),
        (list("xyz"), list("")),
        (list("aaaa"), list("bbbb")),
    ]
    assert _run_nw(spark, pairs) == [py_nw(h, r) for h, r in pairs]


def test_nw_identity_and_empty(spark):
    got = _run_nw(spark, [(list("abcdefgh"), list("abcdefgh")),
                          (list(""), list("abcde"))])
    assert got == [16, -5]


def test_nw_symmetry(spark):
    a, b = list("kitten"), list("sitting")
    assert _run_nw(spark, [(a, b)]) == _run_nw(spark, [(b, a)])


def test_nw_dominated_by_sw(spark):
    """SW >= max(NW, 0): the global alignment is one candidate local
    island. Checked via both in-repo lanes on shared windows."""
    rows = [
        (i, ["tok%d" % ((i * 7 + j) % 9) for j in range(20)])
        for i in range(12)
    ]
    pairs = [(i, toks[0:10], toks[4:16]) for i, toks in rows]
    sdf = spark.createDataFrame(
        pairs, "pair_id long, hyp array<string>, ref array<string>"
    )
    nw = {
        r["pair_id"]: r["score"]
        for r in needleman_wunsch(sdf).collect()
    }
    sw = {
        r["pair_id"]: r["score"]
        for r in smith_waterman(sdf).collect()
    }
    for i in nw:
        assert sw[i] >= max(nw[i], 0)


# ---------------------------------------------------------------- fano


def test_fano_matches_replay_and_float(spark):
    xs = [20 if b % 5 == 0 else 3 for b in range(50)]
    got = _run_fano(spark, xs)
    assert got == py_fano(xs)
    n, sx = len(xs), sum(xs)
    mean = sx / n
    var = sum((x - mean) ** 2 for x in xs) / (n - 1)
    assert got["vmr_milli"] == int(var / mean * 1000)


def test_fano_constant_zero(spark):
    got = _run_fano(spark, [4] * 30)
    assert got["chi2_milli"] == 0 and got["vmr_milli"] == 0
    assert got["direction"] == "underdispersed"


def test_fano_single_loaded_bucket(spark):
    n, c = 25, 12
    got = _run_fano(spark, [c] + [0] * (n - 1))
    assert got["vmr_milli"] == 1000 * c  # maximal burst closed form
    assert got["direction"] == "overdispersed"


def test_fano_all_zero_null(spark):
    got = _run_fano(spark, [0] * 10)
    assert got["vmr_milli"] is None and got["direction"] is None


def test_fano_spread_near_one(spark):
    """md5-spread arrivals over buckets: VMR lands near 1000 (the
    Poisson-consistent band), far from the planted burst's value."""
    import hashlib

    buckets = [0] * 40
    for e in range(200):
        h = int(hashlib.md5(str(e).encode()).hexdigest(), 16) % 40
        buckets[h] += 1
    got = _run_fano(spark, buckets)
    assert 500 <= got["vmr_milli"] <= 1800
    burst = _run_fano(spark, [20 if b % 5 == 0 else 3 for b in range(50)])
    assert burst["vmr_milli"] > 5000
