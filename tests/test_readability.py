"""Readability features: hand-computed Flesch on known text, syllable
rules (vowel groups, silent e, minimum one), sentence counting."""

from __future__ import annotations

import pytest

from spanluke_spark.textops.quality import readability_features


def _feat(spark, text):
    df = spark.createDataFrame([(text,)], "text string")
    return readability_features(df).collect()[0]


def test_syllable_rules(spark):
    # "code" -> co|de vowel groups o,e = 2, silent e -> 1
    # "idea" -> i|ea = 2 groups, no silent e -> 2
    # "rhythm" -> y = 1 group -> 1; "tv" -> 0 groups -> min 1
    r = _feat(spark, "code idea rhythm tv")
    assert r.n_words == 4
    assert r.n_syllables == 1 + 2 + 1 + 1


def test_sentences_and_formula(spark):
    text = "The cat sat. The dog ran! Did it run?"
    r = _feat(spark, text)
    assert r.n_sentences == 3 and r.n_words == 9
    syll = r.n_syllables
    ease = 206.835 - 1.015 * (9 / 3) - 84.6 * (syll / 9)
    assert r.flesch_ease == pytest.approx(round(ease, 6))
    grade = 0.39 * (9 / 3) + 11.8 * (syll / 9) - 15.59
    assert r.fk_grade == pytest.approx(round(grade, 6))


def test_no_punctuation_is_one_sentence(spark):
    r = _feat(spark, "plain words with no stops at all")
    assert r.n_sentences == 1


def test_simple_beats_complex_on_ease(spark):
    simple = _feat(spark, "The cat sat. The dog ran. It was fun.")
    complex_ = _feat(
        spark,
        "Notwithstanding considerable jurisdictional heterogeneity, "
        "constitutional interpretation necessitates extraordinary deliberation.",
    )
    assert simple.flesch_ease > complex_.flesch_ease
    assert simple.fk_grade < complex_.fk_grade
