"""DBSCAN — sklearn-free Python replay parity (planted blobs + noise),
role semantics (core/border/noise), min-border determinism, eps/min_pts
contracts, and the cross-cluster bridge case (a border point between
two clusters pins to the smaller cluster id)."""

from __future__ import annotations

import random

from spanluke_spark.link.dbscan import dbscan


def _py_dbscan(points, eps2, min_pts, scale=64):
    q = {pid: [round(x * scale) for x in v] for pid, v in points}
    ids = sorted(q)
    nbr = {i: set() for i in ids}
    for i in ids:
        for j in ids:
            if i < j and sum((a - b) ** 2 for a, b in zip(q[i], q[j])) <= eps2:
                nbr[i].add(j)
                nbr[j].add(i)
    core = {i for i in ids if len(nbr[i]) + 1 >= min_pts}
    # CC over core-core edges
    comp = {}
    for c in sorted(core):
        if c in comp:
            continue
        stack, root = [c], c
        comp[c] = root
        while stack:
            x = stack.pop()
            for y in nbr[x]:
                if y in core and y not in comp:
                    comp[y] = root
                    stack.append(y)
    # normalize to min member
    groups = {}
    for n, r in comp.items():
        groups.setdefault(r, []).append(n)
    lab = {}
    for mem in groups.values():
        m = min(mem)
        for n in mem:
            lab[n] = m
    out = {}
    for i in ids:
        if i in core:
            out[i] = ("core", lab[i])
        else:
            adj = [lab[j] for j in nbr[i] if j in core]
            out[i] = ("border", min(adj)) if adj else ("noise", None)
    return out


def _spark_dbscan(spark, points, eps2, min_pts):
    df = spark.createDataFrame(points, "id: long, vec: array<float>")
    rows = dbscan(df, eps2=eps2, min_pts=min_pts).collect()
    return {r["id"]: (r["role"], r["cluster"]) for r in rows}


def test_python_replay_parity_random(spark):
    rng = random.Random(2)
    pts = []
    for i in range(60):
        c = i % 3
        pts.append(
            (i, [c * 10.0 + rng.uniform(-0.3, 0.3), rng.uniform(-0.3, 0.3)])
        )
    for i in range(60, 66):  # far-out noise
        pts.append((i, [100.0 + i, 50.0]))
    for eps2, mp in [(800, 4), (300, 6), (1500, 10)]:
        assert _spark_dbscan(spark, pts, eps2, mp) == _py_dbscan(pts, eps2, mp)


def test_three_blobs_and_noise(spark):
    pts = []
    for i in range(15):
        pts.append((i, [0.0 + 0.01 * i, 0.0]))
        pts.append((100 + i, [30.0 + 0.01 * i, 0.0]))
    pts.append((999, [500.0, 500.0]))
    got = _spark_dbscan(spark, pts, eps2=10000, min_pts=5)
    assert got[999] == ("noise", None)
    assert {got[i][1] for i in range(15)} == {0}
    assert {got[100 + i][1] for i in range(15)} == {100}
    assert all(got[i][0] == "core" for i in range(15))


def test_border_between_clusters_pins_min(spark):
    # two 5-point cliques (x = 0..0.4 and 1.2..1.6), a lone bridge at 0.8
    # that sees exactly ONE core from each clique -> border, pinned to
    # the min adjacent cluster id; the cliques stay separate clusters
    pts = [(i, [0.1 * i, 0.0]) for i in range(5)]
    pts += [(10 + i, [1.2 + 0.1 * i, 0.0]) for i in range(5)]
    pts.append((99, [0.8, 0.0]))
    got = _spark_dbscan(spark, pts, eps2=700, min_pts=5)
    assert all(got[i] == ("core", 0) for i in range(5))
    assert all(got[10 + i] == ("core", 10) for i in range(5))
    assert got[99] == ("border", 0)  # min of the two adjacent cluster ids
    py = _py_dbscan(pts, 700, 5)
    assert got == py


def test_min_pts_counts_self(spark):
    # two points within eps: degree 1 + self = 2 -> core iff min_pts <= 2
    pts = [(1, [0.0, 0.0]), (2, [0.05, 0.0])]
    got2 = _spark_dbscan(spark, pts, eps2=100, min_pts=2)
    assert got2[1] == ("core", 1) and got2[2] == ("core", 1)
    got3 = _spark_dbscan(spark, pts, eps2=100, min_pts=3)
    assert got3[1] == ("noise", None) and got3[2] == ("noise", None)


def test_isolated_core_is_own_cluster(spark):
    # a tight clique far from everything: cores with no OTHER core
    pts = [(5, [0.0, 0.0])]
    got = _spark_dbscan(spark, pts, eps2=100, min_pts=1)
    assert got[5] == ("core", 5)
