"""Hearst-pattern taxonomy induction (etl/hearst.py)."""

from __future__ import annotations

import pytest

from spanluke_spark.etl.hearst import hearst_isa_pairs, taxonomy_support


def _pairs(spark, texts):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    rows = hearst_isa_pairs(df).collect()
    return {(r.hyponym, r.hypernym, r.pattern) for r in rows}


def test_such_as_multi_item_list(spark):
    got = _pairs(spark, ["animals such as cats, dogs and ferrets run."])
    assert got == {
        ("cats", "animals", "such_as"),
        ("dogs", "animals", "such_as"),
        ("ferrets", "animals", "such_as"),
    }


def test_including_and_especially(spark):
    got = _pairs(
        spark,
        [
            "metals, including copper and zinc, conduct.",
            "cities, especially paris, sprawl.",
        ],
    )
    assert ("copper", "metals", "including") in got
    assert ("zinc", "metals", "including") in got
    assert ("paris", "cities", "especially") in got


def test_and_other_list_head_on_right(spark):
    got = _pairs(spark, ["bronze, iron or other alloys tarnish."])
    assert got == {
        ("bronze", "alloys", "other"),
        ("iron", "alloys", "other"),
    }


def test_or_list_and_case_folding(spark):
    got = _pairs(spark, ["Herbs such as Basil or Thyme grow."])
    assert got == {
        ("basil", "herbs", "such_as"),
        ("thyme", "herbs", "such_as"),
    }


def test_self_loop_dropped_and_no_pattern_no_rows(spark):
    got = _pairs(
        spark,
        ["things such as things persist.", "plain text with no pattern at all"],
    )
    assert got == set()


def test_support_aggregation(spark):
    df = spark.createDataFrame(
        [
            (1, "animals such as cats and dogs play."),
            (2, "animals such as cats sleep. cats or other animals purr."),
        ],
        "doc_id long, text string",
    )
    sup = {
        (r.hyponym, r.hypernym): (r.n_docs, r.n_mentions, r.n_patterns)
        for r in taxonomy_support(hearst_isa_pairs(df)).collect()
    }
    # cats<animals seen in both docs, via two distinct patterns, 3 mentions
    assert sup[("cats", "animals")] == (2, 3, 2)
    assert sup[("dogs", "animals")] == (1, 1, 1)


@pytest.mark.parametrize(
    "text,expect",
    [
        # single-item list
        ("tools such as hammers work.", {("hammers", "tools", "such_as")}),
        # oxford comma before and
        (
            "fruits such as apples, pears, and plums ripen.",
            {
                ("apples", "fruits", "such_as"),
                ("pears", "fruits", "such_as"),
                ("plums", "fruits", "such_as"),
            },
        ),
    ],
)
def test_list_grammar_variants(spark, text, expect):
    assert _pairs(spark, [text]) == expect
