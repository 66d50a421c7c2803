"""MMR diversity reranking (link/mmr.py)."""

from __future__ import annotations

import numpy as np

from spanluke_spark.link.mmr import mmr_rerank


def _pool(spark, vecs):
    rows = [(i, [float(x) for x in v]) for i, v in enumerate(vecs)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def _py_mmr(vecs, q, k, lam):
    def cos(a, b):
        a, b = np.asarray(a, float), np.asarray(b, float)
        return round(float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b))), 6)

    rel = {i: cos(v, q) for i, v in enumerate(vecs)}
    ms = {i: 0.0 for i in rel}
    remaining = set(rel)
    picks = []
    for _ in range(k):
        score = {
            i: round(lam * rel[i] - (1.0 - lam) * ms[i], 6) for i in remaining
        }
        best = min(remaining, key=lambda i: (-score[i], i))
        picks.append((best, rel[best], ms[best], score[best]))
        remaining.discard(best)
        for i in remaining:
            ms[i] = max(ms[i], cos(vecs[i], vecs[best]))
    return picks


def test_matches_python_replay(spark):
    rng = np.random.RandomState(9)
    vecs = [rng.randn(6) for _ in range(20)]
    q = rng.randn(6)
    got = mmr_rerank(_pool(spark, vecs), q, k=5, lam=0.7).orderBy("rank").collect()
    # float32 storage: replay from the values Spark actually holds
    stored = {
        r.vec_id: r.embedding
        for r in _pool(spark, vecs).collect()
    }
    want = _py_mmr([stored[i] for i in range(20)], q, 5, 0.7)
    assert [r.vec_id for r in got] == [w[0] for w in want]
    for r, w in zip(got, want):
        assert abs(r.mmr_score - w[3]) < 1e-9


def test_diversity_beats_pure_relevance(spark):
    # two tight clusters near the query; pure top-3 by relevance would take
    # all three members of cluster A — MMR must mix in cluster B
    a = np.array([1.0, 0.02, 0.0, 0.0])
    b = np.array([0.9, 0.4, 0.0, 0.0])
    vecs = [
        a,
        a + np.array([0.0, 0.001, 0.0, 0.0]),
        a + np.array([0.0, 0.002, 0.0, 0.0]),
        b,
    ]
    q = np.array([1.0, 0.05, 0.0, 0.0])
    got = mmr_rerank(_pool(spark, vecs), q, k=3, lam=0.5).collect()
    picked = {r.vec_id for r in got}
    assert 3 in picked  # the cluster-B representative makes the cut


def test_first_pick_is_pure_relevance_argmax(spark):
    rng = np.random.RandomState(2)
    vecs = [rng.randn(5) for _ in range(10)]
    q = vecs[7] + rng.randn(5) * 0.01
    got = mmr_rerank(_pool(spark, vecs), q, k=2, lam=0.7).orderBy("rank").collect()
    assert got[0].vec_id == 7
    assert got[0].max_sim == 0.0
