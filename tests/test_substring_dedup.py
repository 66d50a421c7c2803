"""Exact substring dedup gates (dedup/substring.py — Lee et al. 2022
semantics at token-k-gram granularity): planted duplicates with exact
boundaries, within-doc repeats, island merging, a brute-force Python
parity sweep, hash==text mode agreement, and the pass-through contract.
"""

from collections import Counter

import numpy as np
import pytest

from spanluke_spark.dedup.substring import (
    duplicate_kgram_spans,
    remove_duplicate_substrings,
)

K = 5


def ref_spans(docs, k):
    grams = Counter()
    toks = {d: t.split() for d, t in docs}
    for t in toks.values():
        for i in range(len(t) - k + 1):
            grams[tuple(t[i : i + k])] += 1
    spans = []
    for d, t in toks.items():
        merged = []
        last_pos = None
        for p in range(len(t) - k + 1):
            if grams[tuple(t[p : p + k])] < 2:
                continue
            if merged and p <= last_pos + k:
                merged[-1][1] = p + k
            else:
                merged.append([p, p + k])
            last_pos = p
        spans.extend((d, s, e) for s, e in merged)
    return set(spans)


def ref_removed(docs, k):
    spans = ref_spans(docs, k)
    out = {}
    for d, t in docs:
        toks = t.split()
        cover = set()
        for dd, s, e in spans:
            if dd == d:
                cover.update(range(s, e))
        out[d] = " ".join(tok for i, tok in enumerate(toks) if i not in cover)
    return out


def words(rng, n, vocab=5000):
    return " ".join(f"w{v}" for v in rng.integers(0, vocab, n))


@pytest.fixture(scope="module")
def corpus(spark):
    rng = np.random.default_rng(42)
    shared = words(rng, 8)  # 8-token passage shared by d0/d1 (> K)
    self_rep = words(rng, K)  # exact K-gram repeated inside d4
    docs = [
        ("d0", f"{words(rng, 12)} {shared} {words(rng, 9)}"),
        ("d1", f"{words(rng, 6)} {shared} {words(rng, 15)}"),
        ("d2", words(rng, 30)),  # clean
        ("d3", words(rng, K - 1)),  # shorter than K: pass-through
        ("d4", f"{self_rep} {words(rng, 7)} {self_rep} {words(rng, 3)}"),
    ]
    df = spark.createDataFrame(docs, "doc_id string, text string").repartition(4)
    return docs, df


def test_planted_spans_exact_boundaries(corpus):
    docs, df = corpus
    got = {
        (r["doc_id"], r["tok_start"], r["tok_end"])
        for r in duplicate_kgram_spans(df, k=K).collect()
    }
    assert got == ref_spans(docs, K)
    # the shared 8-token passage sits at tokens [12, 20) of d0 and [6, 14) of d1
    assert ("d0", 12, 20) in got and ("d1", 6, 14) in got
    # d4's self-repeat flags both occurrences
    d4 = sorted((s, e) for d, s, e in got if d == "d4")
    assert d4 == [(0, K), (K + 7, 2 * K + 7)]


def test_removal_matches_reference(corpus):
    docs, df = corpus
    expected = ref_removed(docs, K)
    got = {
        r["doc_id"]: r["text"]
        for r in remove_duplicate_substrings(df, k=K).collect()
    }
    assert got == expected
    assert got["d2"] == dict(docs)["d2"]  # untouched docs byte-identical
    assert got["d3"] == dict(docs)["d3"]
    for d in ("d0", "d1"):  # the shared passage is gone from every copy
        for tok in dict(docs)["d0"].split()[12:20]:
            assert tok not in got[d].split()


def test_no_original_duplicate_gram_survives(corpus):
    docs, df = corpus
    cleaned = remove_duplicate_substrings(df, k=K)
    again = duplicate_kgram_spans(cleaned, k=K).collect()
    # one pass removes every originally-duplicated gram; on this corpus no
    # new adjacency creates a fresh duplicate either
    assert again == []


def test_adjacent_islands_merge(spark):
    # one doc: X A X where the K-gram at pos 0 and pos K+len(A) repeat
    # elsewhere; a doc containing X X (adjacent) merges into one span
    rng = np.random.default_rng(7)
    x = words(rng, K)
    other = words(rng, 6)
    df = spark.createDataFrame(
        [("a", f"{x} {x} {other}"), ("b", f"{words(rng, 4)} {x} {words(rng, 4)}")],
        "doc_id string, text string",
    )
    got = {
        (r["doc_id"], r["tok_start"], r["tok_end"])
        for r in duplicate_kgram_spans(df, k=K).collect()
    }
    assert ("a", 0, 2 * K) in got  # both copies merge into one island
    assert ("b", 4, 4 + K) in got


def test_hash_and_text_modes_agree(corpus):
    docs, df = corpus
    h = {tuple(r) for r in duplicate_kgram_spans(df, k=K, by="hash").collect()}
    t = {tuple(r) for r in duplicate_kgram_spans(df, k=K, by="text").collect()}
    assert h == t


def test_random_corpora_brute_force_parity(spark):
    rng = np.random.default_rng(123)
    for trial in range(3):
        # small vocab forces accidental duplicate k-grams (k=3 here)
        k = 3
        docs = [
            (f"t{i}", " ".join(f"v{v}" for v in rng.integers(0, 6, rng.integers(3, 25))))
            for i in range(12)
        ]
        df = spark.createDataFrame(docs, "doc_id string, text string")
        got = {
            (r["doc_id"], r["tok_start"], r["tok_end"])
            for r in duplicate_kgram_spans(df, k=k).collect()
        }
        assert got == ref_spans(docs, k), (trial, docs)
        removed = {
            r["doc_id"]: r["text"]
            for r in remove_duplicate_substrings(df, k=k).collect()
        }
        assert removed == ref_removed(docs, k), trial


def test_invalid_args(corpus):
    _, df = corpus
    with pytest.raises(ValueError, match="by must be"):
        duplicate_kgram_spans(df, by="bogus")
    with pytest.raises(ValueError, match="k must be"):
        duplicate_kgram_spans(df, k=1)
