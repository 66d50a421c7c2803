"""Graph re-identification risk — Python replay parity on random
graphs, the H2-refines-H1 invariant (H2 can only have MORE unique
nodes), a fully-symmetric graph with zero uniques, and the hub-cap
soundness property (truncation only merges classes)."""

from __future__ import annotations

import random
from collections import Counter, defaultdict

from spanluke_spark.graph.privacy import reidentification_risk


def _py_risk(edges, cap=64):
    adj = defaultdict(set)
    for a, b in edges:
        if a != b:
            adj[a].add(b)
            adj[b].add(a)
    deg = {u: len(vs) for u, vs in adj.items()}
    h1 = Counter(Counter(str(d) for d in deg.values()).values())
    sigs = Counter(
        f"{deg[u]}|" + ",".join(str(d) for d in sorted(deg[v] for v in vs)[:cap])
        for u, vs in adj.items()
    )
    out = {}
    for size, ncls in h1.items():
        out[("h1", size)] = (ncls, size * ncls)
    for size, ncls in Counter(sigs.values()).items():
        out[("h2", size)] = (ncls, size * ncls)
    return out


def _spark_risk(spark, edges, **kw):
    df = spark.createDataFrame(edges, "src: long, dst: long")
    return {
        (r["level"], r["class_size"]): (r["n_classes"], r["n_nodes"])
        for r in reidentification_risk(df, **kw).collect()
    }


def test_matches_python_replay(spark):
    for seed in (2, 9):
        rng = random.Random(seed)
        edges = [(rng.randrange(30), rng.randrange(30)) for _ in range(50)]
        assert _spark_risk(spark, edges) == _py_risk(edges), seed


def test_h2_has_at_least_as_many_uniques_as_h1(spark):
    rng = random.Random(5)
    edges = [(rng.randrange(40), rng.randrange(40)) for _ in range(70)]
    got = _spark_risk(spark, edges)
    u1 = got.get(("h1", 1), (0, 0))[1]
    u2 = got.get(("h2", 1), (0, 0))[1]
    assert u2 >= u1


def test_symmetric_graph_has_no_uniques(spark):
    # a 6-cycle: every node is structurally identical at H1 and H2
    edges = [(i, (i + 1) % 6) for i in range(6)]
    got = _spark_risk(spark, edges)
    assert got == {("h1", 6): (1, 6), ("h2", 6): (1, 6)}


def test_hub_cap_only_merges_classes(spark):
    # a star: capping the hub's signature can only shrink the number of
    # distinct H2 classes, never split one
    edges = [(0, j) for j in range(1, 20)]
    full = _spark_risk(spark, edges, max_neighbors=64)
    capped = _spark_risk(spark, edges, max_neighbors=4)
    n_classes_full = sum(v[0] for (lvl, _), v in full.items() if lvl == "h2")
    n_classes_cap = sum(v[0] for (lvl, _), v in capped.items() if lvl == "h2")
    assert n_classes_cap <= n_classes_full
    assert capped[("h2", 1)][1] >= 1  # the hub stays unique
