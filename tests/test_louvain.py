"""Parity-staggered Louvain sweeps — Python replay parity, two-clique
recovery, modularity improvement on the planted fixture, determinism."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from spanluke_spark.graph.partitioning import louvain_rounds, modularity


def _py_louvain(edges, rounds=2):
    und = sorted({(min(u, v), max(u, v)) for u, v in edges if u != v})
    nbrs = {}
    for a, b in und:
        nbrs.setdefault(a, []).append(b)
        nbrs.setdefault(b, []).append(a)
    deg = {n: len(v) for n, v in nbrs.items()}
    m = len(und)
    comm = {n: n for n in nbrs}
    for rnd in range(rounds):
        tot = {}
        for n, c in comm.items():
            tot[c] = tot.get(c, 0) + deg[n]
        nxt = {}
        for n in nbrs:
            if n % 2 != rnd % 2:
                nxt[n] = comm[n]
                continue
            kic = {}
            for w in nbrs[n]:
                kic[comm[w]] = kic.get(comm[w], 0) + 1
            a = comm[n]
            kia = kic.get(a, 0)
            best = None
            for c, k in kic.items():
                if c == a:
                    continue
                gain2 = 2 * m * (k - kia) - deg[n] * (tot[c] - (tot[a] - deg[n]))
                if gain2 > 0 and (
                    best is None or (gain2, -c) > (best[0], -best[1])
                ):
                    best = (gain2, c)
            nxt[n] = best[1] if best else a
        comm = nxt
    return comm


def _spark_louvain(spark, edges, rounds=2):
    df = spark.createDataFrame(edges, "src: long, dst: long")
    return {
        r["node"]: r["community"]
        for r in louvain_rounds(df, rounds=rounds).collect()
    }


def test_python_replay_parity(spark):
    rng = random.Random(41)
    edges = [(rng.randrange(25), rng.randrange(25)) for _ in range(60)]
    edges = [(u, v) for u, v in edges if u != v]
    for rounds in (1, 2):
        assert _spark_louvain(spark, edges, rounds) == _py_louvain(edges, rounds)


def test_two_cliques_with_bridge_found(spark):
    clique = lambda base: [  # noqa: E731
        (base + i, base + j) for i in range(4) for j in range(i + 1, 4)
    ]
    edges = clique(0) + clique(10) + [(0, 10)]
    got = _spark_louvain(spark, edges, rounds=4)
    left = {got[n] for n in (0, 1, 2, 3)}
    right = {got[n] for n in (10, 11, 12, 13)}
    assert len(left) == 1 and len(right) == 1 and left != right


def test_moves_do_not_decrease_modularity_on_planted_blocks(spark):
    edges = []
    for u in range(40):
        block = u - (u % 10)
        edges.append((u, block + ((u * 3 + 1) % 10)))
        edges.append((u, block + ((u * 7 + 5) % 10)))
    df = spark.createDataFrame(edges, "src: long, dst: long")

    def q_of(membership):
        rows = modularity(df, membership).collect()
        return sum(r["q_contrib"] for r in rows)

    singletons = df.selectExpr("src AS node").union(
        df.selectExpr("dst AS node")
    ).distinct().select("node", F.col("node").alias("community"))
    after = louvain_rounds(df, rounds=4)
    assert q_of(after) > q_of(singletons)


def test_deterministic(spark):
    rng = random.Random(3)
    edges = [(rng.randrange(20), rng.randrange(20)) for _ in range(45)]
    edges = [(u, v) for u, v in edges if u != v]
    assert _spark_louvain(spark, edges) == _spark_louvain(spark, edges)
