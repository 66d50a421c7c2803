"""Partition-quality diagnostic + cross-source duplication matrix."""

from __future__ import annotations

import hashlib

import pytest

from spanluke_spark.dedup.dedup import cross_source_matrix
from spanluke_spark.graph.partitioning import partition_quality


def _ph(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def test_partition_quality_matches_python(spark):
    edges = [(f"n{i}", f"n{(i * 7 + 3) % 40}") for i in range(100)]
    df = spark.createDataFrame(edges, "src string, dst string")
    row = partition_quality(df, 8).collect()[0]

    cut = sum(1 for s, d in edges if _ph(s) % 8 != _ph(d) % 8)
    nodes = {n for e in edges for n in e}
    loads: dict[int, int] = {}
    for n in nodes:
        loads[_ph(n) % 8] = loads.get(_ph(n) % 8, 0) + 1
    assert (row.n_edges, row.cut_edges) == (100, cut)
    assert row.cut_frac == pytest.approx(cut / 100)
    assert row.n_nodes == len(nodes)
    assert row.max_part_nodes == max(loads.values())
    assert row.node_balance == pytest.approx(
        max(loads.values()) / (len(nodes) / len(loads))
    )


def test_partition_quality_single_partition_no_cut(spark):
    df = spark.createDataFrame(
        [("a", "b"), ("b", "c")], "src string, dst string"
    )
    row = partition_quality(df, 1).collect()[0]
    assert row.cut_edges == 0 and row.cut_frac == 0.0
    assert row.node_balance == 1.0


def test_cross_source_matrix_hand_computed(spark):
    rows = [
        # key k1 in A(2 copies), B(1): AA=1 pair, AB=2 pairs
        ("k1", "A"), ("k1", "A"), ("k1", "B"),
        # key k2 in B(3): BB=3 pairs
        ("k2", "B"), ("k2", "B"), ("k2", "B"),
        # unique key: no pairs anywhere
        ("k3", "A"),
    ]
    df = spark.createDataFrame(rows, "k string, source string")
    got = {
        (r.source_a, r.source_b): (r.n_keys, r.n_pairs)
        for r in cross_source_matrix(df, "k").collect()
    }
    assert got == {
        ("A", "A"): (1, 1),
        ("A", "B"): (1, 2),
        ("B", "B"): (1, 3),
    }


def test_cross_source_matrix_pair_conservation(spark):
    # total pairs across the matrix == sum over keys of C(n_k, 2)
    rows = [(f"k{i % 5}", f"s{(i * 3) % 4}") for i in range(40)]
    df = spark.createDataFrame(rows, "k string, source string")
    total = sum(
        r.n_pairs for r in cross_source_matrix(df, "k").collect()
    )
    from collections import Counter

    per_key = Counter(k for k, _ in rows)
    assert total == sum(n * (n - 1) // 2 for n in per_key.values())
