"""Sliding-window chunking and TF-IDF top-k: Python-oracle parity + plan."""

from __future__ import annotations

import math
from collections import Counter

import pytest
from pyspark.sql import functions as F

from spanluke_spark.textops.chunking import chunk_documents
from spanluke_spark.textops.tfidf import tfidf_topk


def _py_chunks(text: str, chunk: int, overlap: int):
    toks = text.split(" ")
    stride = chunk - overlap
    out = []
    if len(toks) <= chunk:
        n_chunks = 1
    else:
        n_chunks = -(-(len(toks) - chunk) // stride) + 1
    for i in range(n_chunks):
        piece = toks[i * stride : i * stride + chunk]
        out.append((i, i * stride, len(piece), " ".join(piece)))
    return out


def test_chunking_matches_python_oracle(spark):
    rows = [
        (1, " ".join(f"w{i}" for i in range(300))),
        (2, " ".join(f"w{i}" for i in range(128))),   # exactly one chunk
        (3, " ".join(f"w{i}" for i in range(129))),   # one full + one tail
        (4, "short doc"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = chunk_documents(df, chunk_tokens=128, overlap=16).collect()
    by_doc: dict = {}
    for r in got:
        by_doc.setdefault(r["doc_id"], []).append(
            (r["chunk_id"], r["chunk_start"], r["n_chunk_tokens"], r["chunk_text"])
        )
    for doc_id, text in rows:
        assert sorted(by_doc[doc_id]) == _py_chunks(text, 128, 16), doc_id
    # coverage: every token index of doc 1 appears in some chunk
    covered = set()
    for _, start, n, _ in by_doc[1]:
        covered.update(range(start, start + n))
    assert covered == set(range(300))


def test_chunking_rejects_bad_overlap(spark):
    df = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    with pytest.raises(ValueError):
        chunk_documents(df, chunk_tokens=8, overlap=8)


def test_chunking_no_shuffle(spark):
    df = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    plan = chunk_documents(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "Python" not in plan


def test_tfidf_matches_python_oracle(spark):
    rows = [
        (1, "apple banana apple cherry"),
        (2, "banana banana durian"),
        (3, "cherry cherry cherry apple"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r["doc_id"], r["rank"]): (r["term"], r["tf"], r["score"])
        for r in tfidf_topk(df, k=2).collect()
    }
    tfs = {d: Counter(t.split(" ")) for d, t in rows}
    dfreq = Counter(w for c in tfs.values() for w in c)
    n = len(rows)
    for doc_id, _ in rows:
        scored = sorted(
            (
                (round(tf * (math.log((n + 1) / (dfreq[w] + 1)) + 1.0), 6), w, tf)
                for w, tf in tfs[doc_id].items()
            ),
            key=lambda x: (-x[0], x[1]),
        )
        for rank, (score, w, tf) in enumerate(scored[:2], start=1):
            term, got_tf, got_score = got[(doc_id, rank)]
            assert term == w and got_tf == tf, (doc_id, rank)
            assert abs(got_score - score) < 1e-9


def test_chunking_coverage_property(spark):
    """Hypothesis: for any (n_tokens, chunk, overlap), chunks cover every
    token, starts advance by stride, and only the final chunk is short."""
    from hypothesis import given, settings, strategies as st

    cases = []

    @settings(max_examples=30, deadline=None)
    @given(
        n=st.integers(min_value=1, max_value=400),
        chunk=st.integers(min_value=2, max_value=64),
        overlap=st.integers(min_value=0, max_value=32),
    )
    def collect(n, chunk, overlap):
        if overlap < chunk:
            cases.append((n, chunk, overlap))

    collect()
    # chunk params vary per case -> one Spark job per distinct (chunk, overlap)
    from collections import defaultdict
    by_params = defaultdict(list)
    for i, (n, chunk, overlap) in enumerate(cases):
        by_params[(chunk, overlap)].append((i, n))
    for (chunk, overlap), docs in by_params.items():
        df = spark.createDataFrame(
            [(i, " ".join(f"t{j}" for j in range(n))) for i, n in docs],
            "doc_id long, text string",
        )
        got = chunk_documents(df, chunk_tokens=chunk, overlap=overlap).collect()
        by_doc = defaultdict(list)
        for r in got:
            by_doc[r["doc_id"]].append(r)
        stride = chunk - overlap
        for i, n in docs:
            rs = sorted(by_doc[i], key=lambda r: r["chunk_id"])
            covered = set()
            for r in rs:
                assert r["chunk_start"] == r["chunk_id"] * stride
                assert 1 <= r["n_chunk_tokens"] <= chunk
                covered.update(range(r["chunk_start"], r["chunk_start"] + r["n_chunk_tokens"]))
            assert covered == set(range(n)), (i, n, chunk, overlap)
            for r in rs[:-1]:
                assert r["n_chunk_tokens"] == chunk  # only the tail may be short
