"""SemDeDup semantic deduplication (dedup/semdedup.py)."""

from __future__ import annotations

import numpy as np

from spanluke_spark.dedup.semdedup import semdedup


def _emb(spark, vecs):
    rows = [(i, [float(x) for x in v]) for i, v in enumerate(vecs)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_planted_duplicate_groups(spark):
    rng = np.random.RandomState(3)
    base_a = rng.randn(8)
    base_b = -base_a + rng.randn(8) * 0.01  # opposite cluster
    vecs = []
    # ids 0-2: jittered copies of base_a (near-dups)
    for i in range(3):
        vecs.append(base_a + rng.randn(8) * 0.001)
    # ids 3-4: jittered copies of base_b
    for i in range(2):
        vecs.append(base_b + rng.randn(8) * 0.001)
    # ids 5-6: two distinct singletons
    vecs.append(rng.randn(8) * 5)
    vecs.append(rng.randn(8) * 5)

    out = semdedup(_emb(spark, vecs), k=2, iters=2, threshold=0.95).collect()
    by_id = {r.vec_id: r for r in out}
    # near-dup copies share a group labelled by the min id
    assert by_id[0].group_id == by_id[1].group_id == by_id[2].group_id == 0
    assert by_id[3].group_id == by_id[4].group_id == 3
    # exactly one keeper per group
    assert sum(by_id[i].keep for i in (0, 1, 2)) == 1
    assert sum(by_id[i].keep for i in (3, 4)) == 1
    # singletons keep themselves
    assert by_id[5].keep == 1 and by_id[5].group_id == 5
    assert by_id[6].keep == 1 and by_id[6].group_id == 6


def test_keeper_is_lowest_centroid_cosine(spark):
    rng = np.random.RandomState(11)
    base = rng.randn(8)
    vecs = [base + rng.randn(8) * 0.002 for _ in range(4)]
    out = semdedup(_emb(spark, vecs), k=1, iters=1, threshold=0.9).collect()
    grp = [r for r in out if r.group_id == 0]
    assert len(grp) == 4
    keeper = [r for r in grp if r.keep == 1]
    assert len(keeper) == 1
    min_cos = min(r.cos_centroid for r in grp)
    assert keeper[0].cos_centroid == min_cos


def test_threshold_one_keeps_everything_distinct(spark):
    rng = np.random.RandomState(5)
    vecs = [rng.randn(8) for _ in range(6)]
    out = semdedup(_emb(spark, vecs), k=2, iters=1, threshold=1.0).collect()
    assert all(r.keep == 1 for r in out)
    assert all(r.group_id == r.vec_id for r in out)


def test_max_cluster_size_guard_fires_on_planted_mega_cluster(spark):
    """r6 scale guard: a cell larger than max_cluster_size must fail the job
    with the required-k message BEFORE the O(c^2) pair join runs, and a
    bound that the planted cluster respects must leave results untouched."""
    import pytest

    rng = np.random.RandomState(7)
    base = rng.randn(8)
    # 40 jittered copies -> with k=1 everything lands in one 40-member cell
    vecs = [base + rng.randn(8) * 0.001 for _ in range(40)]
    df = _emb(spark, vecs)

    with pytest.raises(Exception, match="max_cluster_size"):
        semdedup(df, k=1, iters=1, threshold=0.99, max_cluster_size=10).collect()

    # identical call with an adequate bound: guard adds no rows, loses none
    guarded = semdedup(df, k=1, iters=1, threshold=0.99, max_cluster_size=40).collect()
    unguarded = semdedup(df, k=1, iters=1, threshold=0.99, max_cluster_size=None).collect()
    key = lambda r: (r.vec_id, r.cluster, r.group_id, r.cos_centroid, r.keep)
    assert sorted(map(key, guarded)) == sorted(map(key, unguarded))
