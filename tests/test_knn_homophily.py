"""Batch-5 session-11 lanes: k-NN label vote (planted-cluster recovery,
Python replay parity on exact integer dots, tie contracts) and
categorical assortativity (closed-form anchors: perfect homophily 1,
perfect disassortativity negative, networkx-formula parity)."""

from __future__ import annotations

import random

import pytest

from spanluke_spark.graph.partitioning import attribute_assortativity
from spanluke_spark.link.ann import knn_label_vote


def _mk(spark, rows, schema):
    return spark.createDataFrame(rows, schema)


def _py_knn(queries, index, k=5, scale=64):
    out = {}
    qz = {qid: [round(x * scale) for x in v] for qid, v in queries}
    cz = [(cid, lab, [round(x * scale) for x in v]) for cid, v, lab in index]
    for qid, q in qz.items():
        scored = sorted(
            ((sum(a * b for a, b in zip(q, c)), cid, lab) for cid, lab, c in cz),
            key=lambda t: (-t[0], t[1]),
        )[:k]
        votes = {}
        best = {}
        for dot, cid, lab in scored:
            votes[lab] = votes.get(lab, 0) + 1
            best[lab] = max(best.get(lab, dot), dot)
        lab = sorted(votes, key=lambda l: (-votes[l], l))[0]
        out[qid] = (lab, votes[lab], best[lab])
    return out


def test_knn_python_parity(spark):
    rng = random.Random(17)
    index = [
        (i, [rng.uniform(-1, 1) for _ in range(8)], i % 3) for i in range(60)
    ]
    queries = [(100 + i, [rng.uniform(-1, 1) for _ in range(8)]) for i in range(20)]
    qdf = _mk(spark, queries, "q_id: long, q_vec: array<float>")
    cdf = _mk(spark, index, "c_id: long, c_vec: array<float>, label: int")
    # quantize float32 storage the same way python sees it
    import numpy as np

    q32 = [(qid, [float(np.float32(x)) for x in v]) for qid, v in queries]
    c32 = [(cid, [float(np.float32(x)) for x in v], lab) for cid, v, lab in index]
    got = {
        r["q_id"]: (r["label"], r["votes"], r["best_dot"])
        for r in knn_label_vote(qdf, cdf, k=5).collect()
    }
    assert got == _py_knn(q32, c32)


def test_knn_planted_clusters(spark):
    # two tight clusters around +e1 and -e1: votes must be unanimous
    index = []
    for i in range(10):
        index.append((i, [1.0, 0.01 * i, 0.0, 0.0], 7))
        index.append((100 + i, [-1.0, 0.0, 0.01 * i, 0.0], 9))
    queries = [(1000, [0.9, 0.05, 0.0, 0.0]), (1001, [-0.95, 0.0, 0.02, 0.0])]
    qdf = _mk(spark, queries, "q_id: long, q_vec: array<float>")
    cdf = _mk(spark, index, "c_id: long, c_vec: array<float>, label: int")
    got = {
        r["q_id"]: (r["label"], r["votes"])
        for r in knn_label_vote(qdf, cdf, k=5).collect()
    }
    assert got == {1000: (7, 5), 1001: (9, 5)}


def test_knn_vote_tie_breaks_to_smaller_label(spark):
    index = [
        (1, [1.0, 0.0], 5),
        (2, [1.0, 0.0], 5),
        (3, [1.0, 0.0], 2),
        (4, [1.0, 0.0], 2),
    ]
    queries = [(9, [1.0, 0.0])]
    qdf = _mk(spark, queries, "q_id: long, q_vec: array<float>")
    cdf = _mk(spark, index, "c_id: long, c_vec: array<float>, label: int")
    r = knn_label_vote(qdf, cdf, k=4).collect()[0]
    assert (r["label"], r["votes"]) == (2, 2)  # 2-2 tie -> smaller label


def _assort(spark, edges, attrs):
    e = _mk(spark, edges, "src: long, dst: long")
    a = _mk(spark, attrs, "node: long, attr: string")
    return attribute_assortativity(e, a).collect()[0]


def test_homophily_perfect_is_one(spark):
    edges = [(0, 1), (1, 0), (2, 3), (3, 2)]
    attrs = [(0, "a"), (1, "a"), (2, "b"), (3, "b")]
    r = _assort(spark, edges, attrs)
    assert r["r_assort"] == 1.0
    assert r["n_edges"] == 4 and r["n_cats"] == 2


def test_disassortative_is_negative(spark):
    edges = [(0, 1), (1, 0), (2, 1), (1, 2)]
    attrs = [(0, "a"), (1, "b"), (2, "a")]
    r = _assort(spark, edges, attrs)
    assert r["r_assort"] < 0


def test_matches_newman_formula(spark):
    rng = random.Random(5)
    edges = [(rng.randrange(12), rng.randrange(12)) for _ in range(60)]
    attrs = [(i, "c%d" % (i % 3)) for i in range(12)]
    cat = {i: a for i, a in attrs}
    from collections import Counter

    e = Counter((cat[u], cat[v]) for u, v in edges)
    m = sum(e.values())
    eii = sum(n for (a, b), n in e.items() if a == b) / m
    rowm = Counter()
    colm = Counter()
    for (a, b), n in e.items():
        rowm[a] += n
        colm[b] += n
    aibi = sum(rowm[c] * colm.get(c, 0) for c in rowm) / (m * m)
    want = (eii - aibi) / (1 - aibi)
    got = _assort(spark, edges, attrs)
    assert got["r_assort"] == pytest.approx(want, abs=1e-6)


def test_single_category_degenerate_null(spark):
    edges = [(0, 1), (1, 0)]
    attrs = [(0, "a"), (1, "a")]
    assert _assort(spark, edges, attrs)["r_assort"] is None
