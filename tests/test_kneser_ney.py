"""Interpolated Kneser-Ney bigram LM — Python replay parity with a
train-on-A-score-on-B split that drives EVERY branch (seen bigram,
unseen bigram under a seen context, unseen context, word never seen as
a continuation), plus ranking sanity and broadcast/shuffle agreement."""

from __future__ import annotations

import math
from collections import Counter

import pytest

from spanluke_spark.textops.lm_score import kneser_ney_scores

D, K = 0.75, 0.5


def _py_kn(train_texts, score_texts):
    toks_tr = [t.split(" ") for t in train_texts]
    vocab = Counter(w for t in toks_tr for w in t)
    bc: Counter = Counter()
    for t in toks_tr:
        for i in range(1, len(t)):
            bc[(t[i - 1], t[i])] += 1
    ca: Counter = Counter()
    n1f: Counter = Counter()
    n1r: Counter = Counter()
    for (a, b), c in bc.items():
        ca[a] += c
        n1f[a] += 1
        n1r[b] += 1
    nbig, v = len(bc), len(vocab)

    def pcont(b):
        return (n1r.get(b, 0) + K) / (nbig + K * (v + 1))

    out = {}
    for did, t in enumerate(s.split(" ") for s in score_texts):
        bits = [-math.log2(pcont(t[0]))]
        for i in range(1, len(t)):
            a, b = t[i - 1], t[i]
            if a in ca:
                p = max(bc.get((a, b), 0) - D, 0) / ca[a] + D * n1f[a] / ca[
                    a
                ] * pcont(b)
            else:
                p = pcont(b)
            bits.append(-math.log2(p))
        out[did] = (len(t), round(sum(bits) / len(bits), 6))
    return out


TRAIN = [
    "the court held the motion",
    "the court denied the motion",
    "a judge held a hearing",
    "the judge held the hearing",
]
# drives: seen bigrams; unseen bigram w/ seen ctx ("court hearing");
# unseen context ("zzz"); word never a continuation ("the" doc-initial
# only in one case — and OOV "qqq").
SCORE = [
    "the court held the motion",
    "the court hearing a judge",
    "zzz the court",
    "qqq zzz qqq",
    "motion",
]


def _spark_kn(spark, train, score, **kw):
    tr = spark.createDataFrame(
        [(i, t) for i, t in enumerate(train)], "doc_id: long, text: string"
    )
    sc = spark.createDataFrame(
        [(i, t) for i, t in enumerate(score)], "doc_id: long, text: string"
    )
    res = kneser_ney_scores(sc, train_df=tr, **kw)
    return {
        r["doc_id"]: (r["n_tokens"], r["bits_per_token"]) for r in res.collect()
    }


@pytest.mark.parametrize("broadcast_model", [True, False])
def test_all_branches_match_python(spark, broadcast_model):
    got = _spark_kn(spark, TRAIN, SCORE, broadcast_model=broadcast_model)
    want = _py_kn(TRAIN, SCORE)
    assert set(got) == set(want)
    for did in want:
        assert got[did][0] == want[did][0]
        assert got[did][1] == pytest.approx(want[did][1], abs=2e-6)


def test_gibberish_scores_higher_than_in_domain(spark):
    got = _spark_kn(spark, TRAIN, ["the court held the motion", "qqq zzz qqq"])
    assert got[1][1] > got[0][1]


def test_self_train_matches_python(spark):
    """The q211 fixture path: train_df omitted (self-trained)."""
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(TRAIN)], "doc_id: long, text: string"
    )
    res = kneser_ney_scores(df)
    got = {
        r["doc_id"]: (r["n_tokens"], r["bits_per_token"]) for r in res.collect()
    }
    want = _py_kn(TRAIN, TRAIN)
    for did in want:
        assert got[did][0] == want[did][0]
        assert got[did][1] == pytest.approx(want[did][1], abs=2e-6)
