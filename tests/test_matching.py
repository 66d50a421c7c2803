"""Locally-dominant greedy matching — sequential-greedy parity on random
weighted graphs (the Preis equivalence), one-to-one invariant, duplicate
pair max-weight collapse, the decreasing-path worst case, and the 1/2
approximation bound against brute-force optimum on small graphs."""

from __future__ import annotations

import itertools
import random

from spanluke_spark.graph.matching import greedy_matching, py_greedy_matching


def _spark_match(spark, edges):
    df = spark.createDataFrame(edges, "src: long, dst: long, weight: double")
    return {
        (r["src"], r["dst"], r["weight"]) for r in greedy_matching(df).collect()
    }


def test_sequential_greedy_parity_random(spark):
    for seed, n, m in [(1, 12, 30), (2, 24, 60), (3, 40, 80)]:
        rng = random.Random(seed)
        edges = [
            (rng.randrange(n), rng.randrange(n), float(rng.randrange(1, 1000)))
            for _ in range(m)
        ]
        assert _spark_match(spark, edges) == py_greedy_matching(edges), seed


def test_one_to_one(spark):
    rng = random.Random(9)
    edges = [
        (rng.randrange(20), rng.randrange(20), float(rng.randrange(1, 50)))
        for _ in range(60)
    ]
    got = _spark_match(spark, edges)
    nodes = [x for a, b, _ in got for x in (a, b)]
    assert len(nodes) == len(set(nodes))


def test_duplicate_pairs_keep_max_weight(spark):
    edges = [(1, 2, 5.0), (2, 1, 9.0), (1, 2, 3.0)]
    assert _spark_match(spark, edges) == {(1, 2, 9.0)}


def test_decreasing_path_locks_one_per_round(spark):
    # worst case for round count: path with strictly decreasing weights
    edges = [(i, i + 1, float(100 - i)) for i in range(9)]
    got = _spark_match(spark, edges)
    assert got == py_greedy_matching(edges)
    assert got == {(i, i + 1, float(100 - i)) for i in range(0, 9, 2)}


def test_half_approximation_bound(spark):
    rng = random.Random(21)
    for _ in range(3):
        n = 8
        edges = [
            (a, b, float(rng.randrange(1, 100)))
            for a, b in itertools.combinations(range(n), 2)
            if rng.random() < 0.6
        ]
        if not edges:
            continue
        greedy_w = sum(w for _, _, w in _spark_match(spark, edges))
        # brute-force optimum
        best = 0.0
        for r in range(1, n // 2 + 1):
            for combo in itertools.combinations(edges, r):
                nodes = [x for a, b, _ in combo for x in (a, b)]
                if len(nodes) == len(set(nodes)):
                    best = max(best, sum(w for _, _, w in combo))
        assert greedy_w >= 0.5 * best


def test_tie_break_smallest_pair(spark):
    edges = [(1, 2, 7.0), (1, 3, 7.0), (2, 3, 7.0)]
    assert _spark_match(spark, edges) == {(1, 2, 7.0)}
