"""LOF — brute-force definitional parity (pure-python replay of the
Breunig chain on quantized integers), the uniform-region ~1 / planted
outlier >> 1 separation, tie-inclusive neighborhoods, and the
duplicate-cluster NULL contract."""

from __future__ import annotations

from pyspark.sql import functions as F

from spanluke_spark.link.lof import lof

# a tight 3x3-ish grid cluster plus one far outlier; integer coords so
# quantization (scale=1) is the identity
CLUSTER = [
    (0, 0.0, 0.0), (1, 1.0, 0.0), (2, 2.0, 0.0),
    (3, 0.0, 1.0), (4, 1.0, 1.0), (5, 2.0, 1.0),
    (6, 0.0, 2.0), (7, 1.0, 2.0), (8, 2.0, 2.0),
    (9, 30.0, 30.0),
]


def _df(spark, rows):
    return spark.createDataFrame(
        [(i, [x, y]) for i, x, y in rows], "id: long, vec: array<float>"
    )


def _py_lof(rows, k):
    pts = {i: (x, y) for i, x, y in rows}
    d2 = lambda a, b: (pts[a][0] - pts[b][0]) ** 2 + (pts[a][1] - pts[b][1]) ** 2
    kdist, neigh = {}, {}
    for p in pts:
        ds = sorted((d2(p, o), o) for o in pts if o != p)
        kdist[p] = ds[k - 1][0]
        neigh[p] = [o for dd, o in ds if dd <= kdist[p]]
    lrd = {
        p: len(neigh[p]) / sum(max(kdist[o], d2(p, o)) for o in neigh[p])
        for p in pts
    }
    return {
        p: sum(lrd[o] for o in neigh[p]) / (len(neigh[p]) * lrd[p]) for p in pts
    }, lrd, {p: len(neigh[p]) for p in pts}


def test_definitional_parity_and_outlier_separation(spark):
    got = {r["id"]: r for r in lof(_df(spark, CLUSTER), k=3, scale=1).collect()}
    want_lof, want_lrd, want_n = _py_lof(CLUSTER, k=3)
    assert set(got) == set(want_lof)
    for p in want_lof:
        assert got[p]["lof"] == round(want_lof[p], 6)
        assert got[p]["lrd"] == round(want_lrd[p], 6)
        assert got[p]["n_neighbors"] == want_n[p]
    # cluster interior ~1, planted outlier dominates
    assert got[9]["lof"] > 5 * max(got[p]["lof"] for p in range(9))
    # the grid CENTER is denser than its edge neighbors -> lof < 1 is
    # correct; all cluster points stay in a tame band around 1
    assert all(0.3 < got[p]["lof"] < 2.0 for p in range(9))


def test_tie_inclusive_neighborhood(spark):
    # point 0 at the center of a symmetric cross: all 4 neighbors at
    # d2=1; with k=3 the value-based neighborhood keeps ALL 4 ties
    rows = [(0, 0.0, 0.0), (1, 1.0, 0.0), (2, -1.0, 0.0),
            (3, 0.0, 1.0), (4, 0.0, -1.0)]
    got = {r["id"]: r for r in lof(_df(spark, rows), k=3, scale=1).collect()}
    assert got[0]["n_neighbors"] == 4 and got[0]["kdist2"] == 1


def test_duplicate_cluster_yields_null_not_underestimate(spark):
    # three exact copies: each copy's kdist (k=2) is 0 -> lrd NULL; the
    # nearby point whose neighborhood contains them gets NULL lof too
    # (never a silently-lower score)
    rows = [(0, 0.0, 0.0), (1, 0.0, 0.0), (2, 0.0, 0.0), (3, 1.0, 0.0),
            (4, 5.0, 0.0), (5, 6.0, 0.0)]
    got = {r["id"]: r for r in lof(_df(spark, rows), k=2, scale=1).collect()}
    for dup in (0, 1, 2):
        assert got[dup]["lrd"] is None and got[dup]["lof"] is None
    assert got[3]["lof"] is None  # poisoned neighborhood surfaces as NULL
    assert got[4]["lof"] is not None  # far pair unaffected... its
    # neighborhood is {5, 3}: 3 has a real lrd, so 4 stays computable


def test_vector_truncation(spark):
    df = spark.createDataFrame(
        [(i, [float(i), 100.0 * i, -50.0 * i]) for i in range(8)],
        "id: long, vec: array<float>",
    )
    # d=1 ignores the wild trailing dims; the line is uniform density
    out = lof(df, k=2, scale=1, d=1).where(F.col("id").isin(3, 4)).collect()
    for r in out:
        assert abs(r["lof"] - 1.0) < 0.5
