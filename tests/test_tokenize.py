"""Python str.split() parity for the tokenizer kernels (SURVEY.md §2.8 F1)."""

import string

from hypothesis import given, settings
from hypothesis import strategies as st

from spanluke_spark.etl.tokenize import (
    py_tokenize_offsets,
    py_word_index,
    token_rows,
    map_tokenize,
)

texts = st.text(
    alphabet=string.ascii_letters + string.digits + " \t\n\r\x0b\x0c.,;()'é—",
    max_size=200,
)


@given(texts)
@settings(max_examples=300, deadline=None)
def test_tokenize_matches_str_split(text):
    toks = py_tokenize_offsets(text)
    assert [t for t, _, _ in toks] == text.split()
    for t, s, e in toks:
        assert text[s:e] == t


@given(texts, st.integers(min_value=0, max_value=220))
@settings(max_examples=200, deadline=None)
def test_word_index_matches_reference(text, pos):
    pos = min(pos, len(text))
    assert py_word_index(text, pos) == len(text[:pos].split())


def test_token_rows_spark(spark):
    rows = [
        (1, "The Supreme Court of India"),
        (2, "  leading  spaces\tand tabs\n"),
        (3, ""),
        (4, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r.doc_id, r.tok_idx): (r.token, r.start, r.end)
        for r in token_rows(df, ["doc_id"]).collect()
    }
    assert got[(1, 0)] == ("The", 0, 3)
    assert got[(1, 4)] == ("India", 21, 26)
    assert got[(2, 0)] == ("leading", 2, 9)
    assert all(k[0] != 3 and k[0] != 4 for k in got)

    got2 = {
        (r.doc_id, r.tok_idx): (r.token, r.start, r.end)
        for r in map_tokenize(df, ["doc_id"]).collect()
    }
    assert got == got2


def test_char_offsets_matches_tokenize_offsets():
    """r6 lazy-offset walk: py_char_offsets must reproduce the offsets of
    py_tokenize_offsets for any prefix, including repeated substrings and
    exotic whitespace."""
    from spanluke_spark.etl.tokenize import (
        py_char_offsets,
        py_tokenize_offsets,
        py_tokenize_words,
    )

    cases = [
        "a ab a aba ab",
        "  leading and   double  spaces ",
        "ab a\tab\na ab",
        " nbsp em space tok tok",
        "",
        "   ",
        "same same same same",
        "x" * 50 + " " + "x" * 3 + " x",
    ]
    for text in cases:
        toks = py_tokenize_offsets(text)
        words = py_tokenize_words(text)
        assert words == [t for t, _, _ in toks]
        for upto in (0, 1, len(words) // 2, len(words)):
            starts, ends = py_char_offsets(text, words, upto)
            assert starts == [s for _, s, _ in toks[:upto]]
            assert ends == [e for _, _, e in toks[:upto]]
