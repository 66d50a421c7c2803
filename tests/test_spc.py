"""SPC main-path analysis — closed forms on a diamond DAG, Python DP
parity on random leveled DAGs (every edge's SPC equals the brute-force
count of source-to-sink paths through it), the main-path tie contract,
and determinism across partitionings."""

from __future__ import annotations

import random
from collections import defaultdict

from spanluke_spark.graph.citations import spc_weights


def _spark_spc(spark, edges, rounds=5, parts=None):
    df = spark.createDataFrame(edges, "src: string, dst: string")
    if parts:
        df = df.repartition(parts)
    return {
        (r["src"], r["dst"]): (r["spc"], r["is_main"])
        for r in spc_weights(df, rounds=rounds).collect()
    }


def _brute_spc(edges):
    out_adj, in_deg, out_deg = defaultdict(list), defaultdict(int), defaultdict(int)
    nodes = set()
    for u, v in edges:
        out_adj[u].append(v)
        in_deg[v] += 1
        out_deg[u] += 1
        nodes |= {u, v}
    sources = [n for n in nodes if in_deg[n] == 0]
    counts: dict = defaultdict(int)

    def walk(path):
        u = path[-1]
        if not out_adj[u]:
            for a, b in zip(path, path[1:]):
                counts[(a, b)] += 1
            return
        for v in out_adj[u]:
            walk(path + [v])

    for s in sources:
        walk([s])
    return counts


def test_diamond_closed_form(spark):
    edges = [("s", "a"), ("s", "b"), ("a", "t"), ("b", "t"), ("a", "c"), ("c", "t")]
    got = _spark_spc(spark, edges)
    assert got[("s", "a")] == (2, True)
    assert got[("s", "b")] == (1, False)
    assert got[("a", "t")][0] == 1 and got[("a", "c")][0] == 1
    assert got[("a", "t")][1] and got[("a", "c")][1]  # tie: both main


def test_matches_bruteforce_on_random_leveled_dags(spark):
    for seed in (1, 7):
        rng = random.Random(seed)
        levels = {f"n{i}": i % 4 for i in range(24)}
        edges = []
        for _ in range(60):
            u, v = rng.sample(list(levels), 2)
            if levels[v] == levels[u] + 1:
                edges.append((u, v))
        edges = sorted(set(edges))
        got = _spark_spc(spark, edges, rounds=5)
        want = _brute_spc(edges)
        assert set(got) == set(edges)
        for k in got:
            assert got[k][0] == want[k], (seed, k)


def test_determinism_across_partitionings(spark):
    edges = [("s", "a"), ("s", "b"), ("a", "t"), ("b", "t"), ("b", "c"), ("c", "t")]
    assert _spark_spc(spark, edges, parts=1) == _spark_spc(
        spark, edges, parts=5
    )
