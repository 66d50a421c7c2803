"""Gates for nDCG@k (evaluation/ranking.py): Python reference parity on
random graded result sets (exact same tie-breaks), perfect-ranking == 1,
inverted-ranking < 1, zero-relevance queries report 0, junk-at-the-top
is penalized, and k clipping.
"""

import math

import numpy as np
import pytest

from spanluke_spark.evaluation.ranking import ndcg_at_k


def ref_ndcg(rows, k):
    """rows: (q, d, score, rel) -> {q: ndcg@k} with (score desc, d asc)
    system order and (rel desc, d asc) ideal order."""
    byq = {}
    for q, d, s, g in rows:
        byq.setdefault(q, []).append((d, s, g))
    out = {}
    for q, items in byq.items():
        sys_order = sorted(items, key=lambda t: (-t[1], t[0]))
        ideal = sorted(items, key=lambda t: (-t[2], t[0]))
        dcg = sum(
            (2.0 ** g - 1) / math.log2(i + 2)
            for i, (_, _, g) in enumerate(sys_order[:k])
        )
        idcg = sum(
            (2.0 ** g - 1) / math.log2(i + 2)
            for i, (_, _, g) in enumerate(ideal[:k])
        )
        out[q] = dcg / idcg if idcg > 0 else 0.0
    return out


def run(spark, rows, k):
    df = spark.createDataFrame(rows, ["query_id", "doc_id", "score", "rel"])
    return {r["query_id"]: r["ndcg"] for r in ndcg_at_k(df, k=k).collect()}


def test_ndcg_random_parity(spark):
    rng = np.random.default_rng(209)
    rows = [
        (int(q), int(d), float(s), float(g))
        for q, d, s, g in zip(
            rng.integers(0, 5, 200),
            range(200),
            rng.integers(0, 20, 200),
            rng.integers(0, 4, 200),
        )
    ]
    for k in (1, 5, 50):
        assert run(spark, rows, k) == pytest.approx(ref_ndcg(rows, k))


def test_ndcg_perfect_and_inverted(spark):
    perfect = [(1, d, 10.0 - d, float(3 - min(d, 3))) for d in range(6)]
    assert run(spark, perfect, 5)[1] == pytest.approx(1.0)
    inverted = [(1, d, float(d), float(3 - min(d, 3))) for d in range(6)]
    assert run(spark, inverted, 5)[1] < 1.0


def test_ndcg_zero_relevance_query(spark):
    rows = [(7, d, float(d), 0.0) for d in range(4)]
    assert run(spark, rows, 5) == {7: 0.0}


def test_ndcg_junk_at_top_costs(spark):
    # same document set, junk scored above gold: rank-2 discount applies
    good_top = [(1, 0, 2.0, 3.0), (1, 1, 1.0, 0.0)]
    junk_top = [(1, 0, 1.0, 3.0), (1, 1, 2.0, 0.0)]
    g = run(spark, good_top, 5)[1]
    j = run(spark, junk_top, 5)[1]
    assert g == pytest.approx(1.0)
    assert j == pytest.approx(1.0 / math.log2(3))
