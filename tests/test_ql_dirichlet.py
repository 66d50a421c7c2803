"""Dirichlet query likelihood — Python replay parity (including the
smoothing-only contribution of unmatched query terms and the
collection-absent-term drop rule), the length-normalization property,
and BM25/QL candidate-set agreement."""

from __future__ import annotations

import math
import re
from collections import Counter

import pytest

from spanluke_spark.textops.bm25 import bm25_topk, ql_dirichlet_topk

MU = 100.0


def _terms(s):
    return [t for t in re.split(r"[^a-z0-9]+", s.lower()) if t]


def _py_ql(docs, queries, topk, mu=MU):
    toks = {d: _terms(t) for d, t in docs}
    tf = {d: Counter(t) for d, t in toks.items()}
    cf: Counter = Counter()
    for t in toks.values():
        cf.update(t)
    ctot = sum(cf.values())
    out = {}
    for qid, qtext in queries:
        qt = sorted({w for w in _terms(qtext) if cf[w] > 0})
        scores = {}
        for d in toks:
            if not any(tf[d][w] for w in qt):
                continue
            dl = len(toks[d])
            scores[d] = round(
                sum(
                    math.log((tf[d][w] + mu * cf[w] / ctot) / (dl + mu))
                    for w in qt
                ),
                6,
            )
        ranked = sorted(scores, key=lambda d: (-scores[d], d))[:topk]
        for r, d in enumerate(ranked, 1):
            out[(qid, d)] = (scores[d], r)
    return out


DOCS = [
    (0, "hash join merge join hash"),
    (1, "hash partition scan"),
    (2, "merge sort run"),
    (3, "window stream stream"),
    (4, "hash hash hash hash hash hash hash hash hash filler filler"),
    (5, "join"),
]
QUERIES = [(1, "hash join"), (2, "merge zzz-oov")]


def _spark_ql(spark, docs, queries, **kw):
    df = spark.createDataFrame(docs, "doc_id: long, text: string")
    qdf = spark.createDataFrame(queries, "query_id: int, query_text: string")
    return {
        (r["query_id"], r["doc_id"]): (r["score"], r["rank"])
        for r in ql_dirichlet_topk(df, qdf, **kw).collect()
    }


def test_matches_python_replay(spark):
    got = _spark_ql(spark, DOCS, QUERIES, topk=6, mu=MU)
    want = _py_ql(DOCS, QUERIES, 6)
    assert set(got) == set(want)
    for k in want:
        assert got[k][1] == want[k][1]
        assert got[k][0] == pytest.approx(want[k][0], abs=2e-6)


def test_oov_only_query_returns_nothing(spark):
    got = _spark_ql(spark, DOCS, [(9, "zzz-oov qqq-oov")], topk=5)
    assert got == {}


def test_short_exact_doc_beats_long_spam(spark):
    """Doc 0 (short, balanced tf for both terms) must outrank doc 4
    (long, one term stuffed) on 'hash join' — the dl + mu denominator
    is the spam guard."""
    got = _spark_ql(spark, DOCS, [(1, "hash join")], topk=6)
    ranks = {d: v[1] for (q, d), v in got.items()}
    assert ranks[0] < ranks[4]


def test_candidates_match_bm25_candidates(spark):
    df = spark.createDataFrame(DOCS, "doc_id: long, text: string")
    qdf = spark.createDataFrame(
        [(1, "hash join")], "query_id: int, query_text: string"
    )
    ql_docs = {r["doc_id"] for r in ql_dirichlet_topk(df, qdf, topk=99).collect()}
    bm_docs = {r["doc_id"] for r in bm25_topk(df, qdf, topk=99).collect()}
    assert ql_docs == bm_docs
