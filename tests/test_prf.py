"""Rocchio pseudo-relevance feedback — full Python replay parity
(both BM25 passes + expansion selection), the vocabulary-bridge recall
property PRF exists for, and determinism across partitionings."""

from __future__ import annotations

import math
import re
from collections import Counter

import pytest

from spanluke_spark.textops.prf import prf_search

K1, B = 1.2, 0.75


def _terms(s: str) -> list[str]:
    return [t for t in re.split(r"[^a-z0-9]+", s.lower()) if t]


def _py_prf(docs, queries, topk, n_fb, n_exp):
    toks = {d: _terms(t) for d, t in docs}
    n = len(toks)
    avgdl = sum(len(t) for t in toks.values()) / n
    tf = {d: Counter(t) for d, t in toks.items()}
    df: Counter = Counter()
    for t in toks.values():
        for w in set(t):
            df[w] += 1

    def idf(w):
        return math.log(1 + (n - df[w] + 0.5) / (df[w] + 0.5))

    def score(qterms):
        out = {}
        for d in toks:
            s = 0.0
            for w in qterms:
                if tf[d][w]:
                    dl = len(toks[d])
                    s += (
                        idf(w)
                        * tf[d][w]
                        * (K1 + 1)
                        / (tf[d][w] + K1 * (1 - B + B * dl / avgdl))
                    )
            if s > 0:
                out[d] = round(s, 6)
        return out

    final = {}
    for qid, qtext in queries:
        q1 = sorted(set(_terms(qtext)))
        s1 = score(q1)
        fb = sorted(s1, key=lambda d: (-s1[d], d))[:n_fb]
        wt: Counter = Counter()
        for d in fb:
            for w, c in tf[d].items():
                if w not in q1:
                    wt[w] += c * idf(w)
        wts = {w: round(v, 6) for w, v in wt.items()}
        exp = sorted(wts, key=lambda w: (-wts[w], w))[:n_exp]
        s2 = score(sorted(set(q1) | set(exp)))
        ranked = sorted(s2, key=lambda d: (-s2[d], d))[:topk]
        for r, d in enumerate(ranked, 1):
            final[(qid, d)] = (s2[d], r)
    return final


DOCS = [
    (0, "alpha beta court"),
    (1, "alpha beta ruling"),
    (2, "beta gamma ruling court"),
    (3, "gamma delta motion"),
    (4, "alpha alpha appeal"),
    (5, "beta gamma gamma appeal"),
    (6, "delta epsilon order"),
    (7, "epsilon alpha beta order court"),
]
QUERIES = [(1, "alpha"), (2, "delta order")]


def _spark_prf(spark, docs, queries, parts=None, **kw):
    df = spark.createDataFrame(docs, "doc_id: long, text: string")
    if parts:
        df = df.repartition(parts)
    qdf = spark.createDataFrame(queries, "query_id: int, query_text: string")
    return {
        (r["query_id"], r["doc_id"]): (r["score"], r["rank"])
        for r in prf_search(df, qdf, **kw).collect()
    }


def test_matches_python_replay(spark):
    got = _spark_prf(spark, DOCS, QUERIES, topk=5, n_fb=2, n_exp=2)
    want = _py_prf(DOCS, QUERIES, topk=5, n_fb=2, n_exp=2)
    assert set(got) == set(want)
    for k in want:
        assert got[k][1] == want[k][1]
        assert got[k][0] == pytest.approx(want[k][0], abs=2e-6)


def test_vocabulary_bridge_recall(spark):
    """Query 'alpha' cannot reach doc 2/5 (no 'alpha') in round 1; the
    feedback docs carry 'beta', expansion adds it, round 2 retrieves
    them — the recall win PRF exists for."""
    before = _spark_prf(spark, DOCS, [(1, "alpha")], topk=8, n_fb=3, n_exp=0)
    got = _spark_prf(spark, DOCS, [(1, "alpha")], topk=8, n_fb=3, n_exp=3)
    assert {2, 5}.isdisjoint({d for (_, d) in before})
    docs_hit = {d for (_, d) in got}
    assert 2 in docs_hit and 5 in docs_hit


def test_determinism_across_partitionings(spark):
    a = _spark_prf(spark, DOCS, QUERIES, parts=1, topk=6, n_fb=3, n_exp=2)
    b = _spark_prf(spark, DOCS, QUERIES, parts=7, topk=6, n_fb=3, n_exp=2)
    assert a == b
