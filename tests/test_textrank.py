"""TextRank — edge-construction golden checks (window semantics over
RAW positions, candidate filter, symmetry) and rank sanity (hub word
outranks peripherals; scores are a probability distribution)."""

from __future__ import annotations

import pytest

from spanluke_spark.textops.textrank import cooccurrence_edges, textrank_keywords


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id: long, text: string"
    )


def _edges(spark, texts, **kw):
    return {
        (r["a"], r["b"])
        for r in cooccurrence_edges(_docs(spark, texts), **kw).collect()
    }


def test_window_pairs_on_raw_positions(spark):
    # 'of' is dropped by the length filter but still occupies a position:
    # alpha..of..gamma are 2 apart -> within window 2
    got = _edges(spark, ["alpha of gamma"])
    assert got == {("alpha", "gamma")}
    # three positions apart -> out of window
    assert _edges(spark, ["alpha of the gamma"]) == set()


def test_short_words_never_nodes(spark):
    # 'cat' (3 chars) is no candidate; lion/tiger pair up
    assert _edges(spark, ["cat lion tiger"]) == {("lion", "tiger")}
    # a candidate with no candidate neighbors yields an empty graph
    assert _edges(spark, ["elephant cat dog"]) == set()


def test_case_and_punctuation_fold(spark):
    got = _edges(spark, ["Alpha, GAMMA! alpha gamma"])
    assert got == {("alpha", "gamma")}


def test_duplicate_pairs_collapse(spark):
    got = cooccurrence_edges(_docs(spark, ["word next word next word next"]))
    assert got.count() == 1


def test_hub_word_wins(spark):
    texts = [
        "spark engine spark cluster spark shuffle",
        "spark partition spark executor",
    ]
    ranks = {
        r["node"]: r["rank"]
        for r in textrank_keywords(_docs(spark, texts)).collect()
    }
    hub = ranks.pop("spark")
    assert all(hub > v for v in ranks.values())
    assert sum(ranks.values()) + hub == pytest.approx(1.0, abs=1e-9)
