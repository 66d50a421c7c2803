"""Consensus clustering — union-find brute-force parity on random
perturbed runs, the noise-suppression property (one disagreeing run
cannot split the majority), unanimity at min_agree = k, and singleton
handling for never-agreeing nodes."""

from __future__ import annotations

import random
from collections import defaultdict

from spanluke_spark.canon.consensus import consensus_clusters


def _py_consensus(assignments, m):
    count = defaultdict(int)
    nodes = set()
    by_rc = defaultdict(list)
    for r, n, c in assignments:
        nodes.add(n)
        by_rc[(r, c)].append(n)
    for members in by_rc.values():
        ms = sorted(set(members))
        for i, a in enumerate(ms):
            for b in ms[i + 1 :]:
                count[(a, b)] += 1
    parent = {n: n for n in nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for (a, b), c in count.items():
        if c >= m:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in nodes}


def _spark_consensus(spark, assignments, m):
    df = spark.createDataFrame(
        assignments, "run: long, node: long, cluster: long"
    )
    return {
        r["node"]: r["consensus"]
        for r in consensus_clusters(df, min_agree=m).collect()
    }


def test_matches_union_find(spark):
    for seed in (1, 7):
        rng = random.Random(seed)
        assignments = []
        for r in range(4):
            for n in range(40):
                base = n % 5
                c = (base + (1 if rng.random() < 0.2 else 0)) % 5
                assignments.append((r, n, c))
        got = _spark_consensus(spark, assignments, 3)
        want = _py_consensus(assignments, 3)
        assert got == want, seed


def test_one_noisy_run_cannot_break_majority(spark):
    assignments = []
    for r in range(3):
        for n in range(20):
            c = n % 4 if r < 2 else (n * 7) % 4  # run 2 is garbage
            assignments.append((r, n, c))
    got = _spark_consensus(spark, assignments, 2)
    by_cluster = defaultdict(set)
    for n, c in got.items():
        by_cluster[c].add(n)
    # the two agreeing runs' partition survives exactly
    assert {frozenset(v) for v in by_cluster.values()} == {
        frozenset(range(i, 20, 4)) for i in range(4)
    }


def test_unanimity_required_at_full_min_agree(spark):
    assignments = [
        (0, 1, 0), (0, 2, 0),
        (1, 1, 0), (1, 2, 0),
        (2, 1, 0), (2, 2, 1),  # run 2 dissents on node 2
    ]
    got = _spark_consensus(spark, assignments, 3)
    assert got[1] != got[2]
    got2 = _spark_consensus(spark, assignments, 2)
    assert got2[1] == got2[2]


def test_never_agreeing_nodes_are_singletons(spark):
    assignments = [
        (0, 1, 0), (1, 1, 1), (2, 1, 2),  # node 1 wanders alone
        (0, 5, 9), (1, 5, 9), (2, 5, 9),
        (0, 6, 9), (1, 6, 9), (2, 6, 9),
    ]
    got = _spark_consensus(spark, assignments, 2)
    assert got[1] == 1 and got[5] == got[6] == 5
