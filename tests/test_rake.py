"""RAKE keyphrases — the paper's worked behavior on a hand-checkable
sentence, Python replay parity on random token streams, duplicate-
phrase collapse, and determinism across partitionings."""

from __future__ import annotations

import random
from collections import Counter, defaultdict

import pytest

from spanluke_spark.textops.rake import DEFAULT_STOPWORDS, rake_keyphrases

STOPS = set(DEFAULT_STOPWORDS)


def _py_rake(text: str, topk: int):
    import re

    toks = [t for t in re.split(r"[^a-z0-9]+", text.lower()) if t]
    phrases: list[list[str]] = []
    cur: list[str] = []
    for t in toks:
        if t in STOPS:
            if cur:
                phrases.append(cur)
            cur = []
        else:
            cur.append(t)
    if cur:
        phrases.append(cur)
    freq: Counter = Counter()
    degree: Counter = Counter()
    for p in phrases:
        for w in p:
            freq[w] += 1
            degree[w] += len(p)
    scored = defaultdict(float)
    seen = set()
    out = []
    for p in phrases:
        key = " ".join(p)
        s = round(sum(degree[w] / freq[w] for w in p), 6)
        if key not in seen:
            seen.add(key)
            out.append((key, s))
        scored[key] = s
    out.sort(key=lambda x: (-x[1], x[0]))
    return [
        (phrase, s, r + 1) for r, (phrase, s) in enumerate(out[:topk])
    ]


def _spark_rake(spark, docs, topk=5, parts=None):
    df = spark.createDataFrame(docs, "doc_id: long, text: string")
    if parts:
        df = df.repartition(parts)
    return {
        (r["doc_id"], r["rank"]): (r["phrase"], r["score"])
        for r in rake_keyphrases(df, topk=topk).collect()
    }


def test_worked_example(spark):
    text = (
        "The summary judgment motion was denied by the appellate court, "
        "and the summary judgment standard is strict."
    )
    got = _spark_rake(spark, [(0, text)], topk=3)
    assert got[(0, 1)] == ("summary judgment motion", 9.0)
    assert got[(0, 2)] == ("summary judgment standard", 9.0)
    assert got[(0, 3)] == ("appellate court", 4.0)


@pytest.mark.parametrize("seed", [1, 4, 8])
def test_matches_python_replay(spark, seed):
    rng = random.Random(seed)
    vocab = ["court", "judge", "motion", "order", "appeal", "the", "of",
             "and", "a", "x1", "x2"]
    docs = [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randrange(5, 60))))
        for i in range(25)
    ]
    got = _spark_rake(spark, docs, topk=4)
    for did, text in docs:
        want = _py_rake(text, 4)
        for phrase, s, r in want:
            assert got[(did, r)][0] == phrase
            assert got[(did, r)][1] == pytest.approx(s, abs=2e-6)


def test_duplicate_phrases_collapse(spark):
    got = _spark_rake(spark, [(0, "alpha beta of alpha beta of gamma")], topk=9)
    phrases = [v[0] for v in got.values()]
    assert phrases.count("alpha beta") == 1 and "gamma" in phrases


def test_determinism_across_partitionings(spark):
    rng = random.Random(3)
    vocab = ["court", "the", "order", "a", "motion"]
    docs = [
        (i, " ".join(rng.choice(vocab) for _ in range(30))) for i in range(15)
    ]
    assert _spark_rake(spark, docs, parts=1) == _spark_rake(
        spark, docs, parts=6
    )
