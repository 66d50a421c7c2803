"""DSIR importance resampling (textops/dsir.py)."""

from __future__ import annotations

import hashlib
import math

from spanluke_spark.textops.dsir import dsir_select, dsir_weights

RAW = [
    (0, "spark join shuffle join spark"),
    (1, "spark join agg window spark"),
    (2, "cat dog bird cat dog"),
    (3, "bird cat dog bird cat"),
    (4, "spark cat join dog"),
]
TARGET = [
    (10, "spark join shuffle agg"),
    (11, "spark join window agg"),
]


def _py_weights(raw, target, buckets=64, alpha=1.0):
    def grams(t):
        ws = t.split()
        return [f"{a} {b}" for a, b in zip(ws, ws[1:])]

    def bkt(g):
        return int(hashlib.md5(g.encode()).hexdigest()[:15], 16) % buckets

    raw_b = {i: [bkt(g) for g in grams(t)] for i, t in raw}
    tgt_counts: dict[int, int] = {}
    for _, t in target:
        for g in grams(t):
            tgt_counts[bkt(g)] = tgt_counts.get(bkt(g), 0) + 1
    raw_counts: dict[int, int] = {}
    for bs in raw_b.values():
        for b in bs:
            raw_counts[b] = raw_counts.get(b, 0) + 1
    tr = sum(raw_counts.values())
    tt = sum(tgt_counts.values())
    out = {}
    for i, bs in raw_b.items():
        w = sum(
            math.log((tgt_counts.get(b, 0) + alpha) / (tt + alpha * buckets))
            - math.log((raw_counts[b] + alpha) / (tr + alpha * buckets))
            for b in bs
        )
        out[i] = (len(bs), w)
    return out


def test_weights_match_python_replay(spark):
    raw = spark.createDataFrame(RAW, "doc_id long, text string")
    tgt = spark.createDataFrame(TARGET, "doc_id long, text string")
    got = {
        r.doc_id: (r.n_grams, r.log_weight)
        for r in dsir_weights(raw, tgt, buckets=64).collect()
    }
    want = _py_weights(RAW, TARGET, buckets=64)
    assert set(got) == set(want)
    for i in want:
        assert got[i][0] == want[i][0]
        assert abs(got[i][1] - want[i][1]) < 1e-9


def test_target_like_docs_rank_higher_and_topk(spark):
    raw = spark.createDataFrame(RAW, "doc_id long, text string")
    tgt = spark.createDataFrame(TARGET, "doc_id long, text string")
    rows = dsir_select(raw, tgt, k=2, buckets=64).collect()
    by_id = {r.doc_id: r for r in rows}
    # spark-domain docs 0/1 beat animal docs 2/3
    assert by_id[0].log_weight > by_id[2].log_weight
    assert by_id[1].log_weight > by_id[3].log_weight
    assert {r.doc_id for r in rows if r.selected == 1} == {0, 1}


def test_short_docs_excluded(spark):
    raw = spark.createDataFrame(
        [(0, "one"), (1, "two words here")], "doc_id long, text string"
    )
    tgt = spark.createDataFrame(TARGET, "doc_id long, text string")
    got = {r.doc_id for r in dsir_weights(raw, tgt, buckets=64).collect()}
    assert got == {1}  # single-token doc has no bigram, no weight row
