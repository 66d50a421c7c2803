"""BM25 retrieval: hand-computed parity on a tiny corpus, rank contract,
and the broadcast-join plan shape that keeps the postings side shuffle-free
for the query join."""

from __future__ import annotations

import math

import pytest

from spanluke_spark.textops.bm25 import bm25_topk, build_postings


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (0, "hash join hash join probe"),
        (1, "sort merge join spill"),
        (2, "window stream state"),
        (3, "hash table build side"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _expected_score(tf, df, dl, n_docs, avgdl, k1=1.2, b=0.75):
    idf = math.log(1 + (n_docs - df + 0.5) / (df + 0.5))
    return idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / avgdl))


def test_postings_shape(corpus):
    post = {(r.term, r.doc_id): (r.tf, r.dl) for r in build_postings(corpus).collect()}
    assert post[("hash", 0)] == (2, 5)
    assert post[("join", 1)] == (1, 4)
    assert ("probe", 0) in post and ("state", 2) in post
    # no empty-string term ever minted
    assert all(t for (t, _) in post)


def test_bm25_hand_computed(spark, corpus):
    queries = spark.createDataFrame([(1, "hash join")], "query_id int, query_text string")
    got = {r.doc_id: (r.score, r.rank) for r in bm25_topk(corpus, queries, topk=10).collect()}

    n_docs, avgdl = 4.0, (5 + 4 + 3 + 4) / 4.0
    # doc 0: hash tf=2 df=2, join tf=2 df=2, dl=5
    exp0 = _expected_score(2, 2, 5, n_docs, avgdl) * 2
    # doc 1: join tf=1 df=2, dl=4
    exp1 = _expected_score(1, 2, 4, n_docs, avgdl)
    # doc 3: hash tf=1 df=2, dl=4
    exp3 = _expected_score(1, 2, 4, n_docs, avgdl)

    assert got[0][0] == pytest.approx(exp0, abs=1e-6)
    assert got[1][0] == pytest.approx(exp1, abs=1e-6)
    assert got[3][0] == pytest.approx(exp3, abs=1e-6)
    assert 2 not in got  # no query term -> never scored
    assert got[0][1] == 1  # highest score ranks first
    # equal scores tie-break by doc_id
    assert got[1][1] == 2 and got[3][1] == 3


def test_bm25_topk_caps_and_plan(spark, corpus):
    queries = spark.createDataFrame(
        [(1, "hash join"), (2, "stream window")], "query_id int, query_text string"
    )
    out = bm25_topk(corpus, queries, topk=1)
    rows = out.collect()
    assert sorted((r.query_id, r.rank) for r in rows) == [(1, 1), (2, 1)]

    plan = out._jdf.queryExecution().executedPlan().toString()
    # the query-term join and the df join must both broadcast; the postings
    # relation (10^12-doc side at scale) never shuffles for them
    assert plan.count("BroadcastHashJoin") >= 2
    assert "SortMergeJoin" not in plan
