"""Gates for link/clusterquality.py: CH against an exact
quantized-cell replay AND the float sklearn-style formula,
well-separated >> shuffled-labels ordering, single-cluster NULL,
collapsed-clusters NULL; Dunn against an O(n^2) replay, the
separated-clusters dunn2 > 1000 lane, the straggler pair collapsing
it, duplicate-only-cluster NULL, and CH/Dunn agreeing on which of
two labellings is better."""

from __future__ import annotations

from collections import defaultdict

from spanluke_spark.link.clusterquality import calinski_harabasz, dunn_index

# ---------------------------------------------------- python replays


def _quant(vecs, dims):
    return {
        i: [round(v * 1000) for v in vec[:dims]]
        for i, (vec, _) in vecs.items()
    }


def py_ch(vecs, dims=16):
    q = _quant(vecs, dims)
    labs = {i: lab for i, (_, lab) in vecs.items()}
    by_lab = defaultdict(list)
    for i in q:
        by_lab[labs[i]].append(q[i])
    n = len(q)
    k = len(by_lab)
    d = len(next(iter(q.values())))
    sg = [sum(q[i][t] for i in q) for t in range(d)]
    w_sum = b_sum = 0
    for lab, rows in by_lab.items():
        nc = len(rows)
        w_num = 0
        b_num = 0
        for t in range(d):
            s = sum(r[t] for r in rows)
            qq = sum(r[t] * r[t] for r in rows)
            w_num += nc * qq - s * s
            b_num += (n * s - nc * sg[t]) ** 2
        w_sum += 1000 * w_num // nc
        b_sum += b_num * 1000 // (nc * n * n)
    ch = (
        1000 * b_sum * (n - k) // (w_sum * (k - 1))
        if k >= 2 and w_sum > 0
        else None
    )
    return {"n": n, "k": k, "w_milli": w_sum, "b_milli": b_sum,
            "ch_milli": ch}


def py_dunn(vecs, dims=16):
    q = _quant(vecs, dims)
    labs = {i: lab for i, (_, lab) in vecs.items()}
    ids = sorted(q)
    inter, intra = [], []
    for x in range(len(ids)):
        for y in range(x + 1, len(ids)):
            i, j = ids[x], ids[y]
            d2 = sum((a - b) ** 2 for a, b in zip(q[i], q[j]))
            (intra if labs[i] == labs[j] else inter).append(d2)
    mi = min(inter) if inter else None
    ma = max(intra) if intra else None
    return {
        "n": len(ids),
        "k": len(set(labs.values())),
        "min_inter_d2": mi,
        "max_intra_d2": ma,
        "dunn2_milli": 1000 * mi // ma if ma else None,
    }


def _df(spark, vecs):
    rows = [
        (i, [float(v) for v in vec], int(lab))
        for i, (vec, lab) in vecs.items()
    ]
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )


def _sep_clusters():
    """three tight, well-separated 4-dim clusters"""
    vecs = {}
    centers = [(0.0, 0.0, 0.0, 0.0), (1.0, 1.0, 0.0, 0.5),
               (-1.0, 0.5, 1.0, -0.5)]
    i = 0
    for lab, c in enumerate(centers):
        for jit in range(6):
            vecs[i] = (
                [c[t] + 0.01 * ((jit + t) % 3 - 1) for t in range(4)],
                lab,
            )
            i += 1
    return vecs


def test_ch_matches_replay_and_float(spark):
    vecs = _sep_clusters()
    got = calinski_harabasz(_df(spark, vecs), dims=4).collect()[0].asDict()
    assert got == py_ch(vecs, dims=4)
    # float formula on the quantized ints
    q = _quant(vecs, 4)
    labs = {i: lab for i, (_, lab) in vecs.items()}
    n, k = len(q), 3
    mu = [sum(q[i][t] for i in q) / n for t in range(4)]
    by = defaultdict(list)
    for i in q:
        by[labs[i]].append(q[i])
    W = sum(
        sum(
            (r[t] - sum(x[t] for x in rows) / len(rows)) ** 2
            for r in rows
            for t in range(4)
        )
        for rows in by.values()
    )
    B = sum(
        len(rows)
        * sum(
            (sum(x[t] for x in rows) / len(rows) - mu[t]) ** 2
            for t in range(4)
        )
        for rows in by.values()
    )
    ch = (B / (k - 1)) / (W / (n - k))
    assert abs(got["ch_milli"] - ch * 1000) / max(ch * 1000, 1) < 0.01


def test_ch_separated_beats_shuffled(spark):
    vecs = _sep_clusters()
    shuffled = {i: (vec, i % 3) for i, (vec, _) in vecs.items()}
    good = calinski_harabasz(_df(spark, vecs), dims=4).collect()[0]
    bad = calinski_harabasz(_df(spark, shuffled), dims=4).collect()[0]
    assert good["ch_milli"] > 100 * bad["ch_milli"]


def test_ch_degenerate_nulls(spark):
    vecs = _sep_clusters()
    one = {i: (vec, 0) for i, (vec, _) in vecs.items()}
    got = calinski_harabasz(_df(spark, one), dims=4).collect()[0]
    assert got["ch_milli"] is None  # k == 1
    collapsed = {
        i: ([float(lab), 0.0], lab) for i, (_, lab) in vecs.items()
    }
    got2 = calinski_harabasz(_df(spark, collapsed), dims=2).collect()[0]
    assert got2["ch_milli"] is None  # zero within-dispersion


def test_dunn_matches_replay_and_separation(spark):
    vecs = _sep_clusters()
    got = dunn_index(_df(spark, vecs), dims=4).collect()[0].asDict()
    assert got == py_dunn(vecs, dims=4)
    assert got["dunn2_milli"] > 1000  # separation beats diameter


def test_dunn_straggler_collapses(spark):
    vecs = _sep_clusters()
    # one cluster-0 point parked next to cluster 1
    vecs[99] = ([0.99, 0.99, 0.01, 0.49], 0)
    got = dunn_index(_df(spark, vecs), dims=4).collect()[0].asDict()
    assert got == py_dunn(vecs, dims=4)
    assert got["dunn2_milli"] < 10


def test_dunn_duplicate_only_null(spark):
    vecs = {
        0: ([1.0, 2.0], 0), 1: ([1.0, 2.0], 0),
        2: ([5.0, 5.0], 1), 3: ([5.0, 5.0], 1),
    }
    got = dunn_index(_df(spark, vecs), dims=2).collect()[0]
    assert got["max_intra_d2"] == 0
    assert got["dunn2_milli"] is None


def test_indices_agree_on_ordering(spark):
    vecs = _sep_clusters()
    shuffled = {i: (vec, i % 3) for i, (vec, _) in vecs.items()}
    ch_g = calinski_harabasz(_df(spark, vecs), dims=4).collect()[0]
    ch_b = calinski_harabasz(_df(spark, shuffled), dims=4).collect()[0]
    du_g = dunn_index(_df(spark, vecs), dims=4).collect()[0]
    du_b = dunn_index(_df(spark, shuffled), dims=4).collect()[0]
    assert ch_g["ch_milli"] > ch_b["ch_milli"]
    assert du_g["dunn2_milli"] > du_b["dunn2_milli"]
