"""Shard rebalancing analysis: mod vs rendezvous placement."""

from __future__ import annotations

import hashlib

from spanluke_spark.graph.partitioning import shard_move_analysis


def _ph(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _hrw(k: str, n: int) -> int:
    return max(range(n), key=lambda s: (_ph(f"{k}#{s}"), s))


def test_shard_moves_match_python_reference(spark):
    keys = [f"url{i}" for i in range(300)]
    df = spark.createDataFrame([(k,) for k in keys], "k string")
    rows = {r.scheme: r for r in
            shard_move_analysis(df, "k", 8, 10).collect()}

    mod_moved = sum(1 for k in keys if _ph(k) % 8 != _ph(k) % 10)
    hrw_moved = sum(1 for k in keys if _hrw(k, 8) != _hrw(k, 10))
    assert rows["mod"].n_moved == mod_moved
    assert rows["rendezvous"].n_moved == hrw_moved
    assert rows["mod"].n_keys == rows["rendezvous"].n_keys == 300


def test_rendezvous_moves_only_to_new_shards(spark):
    # HRW monotonicity: a key relocates ONLY if a newly added shard wins
    keys = [f"k{i}" for i in range(500)]
    for k in keys:
        before, after = _hrw(k, 8), _hrw(k, 10)
        if before != after:
            assert after >= 8
    df = spark.createDataFrame([(k,) for k in keys], "k string")
    rows = {r.scheme: r for r in
            shard_move_analysis(df, "k", 8, 10).collect()}
    # minimal-disruption bound: ~2/10 of keys, far below mod's ~0.9
    assert rows["rendezvous"].move_frac < 0.35
    assert rows["mod"].move_frac > 0.7
    assert rows["rendezvous"].move_frac < rows["mod"].move_frac
