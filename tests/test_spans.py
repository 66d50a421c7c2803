"""Span enumeration: reference order + closed-form span_idx (SURVEY §2.9)."""

from hypothesis import given, settings
from hypothesis import strategies as st

from spanluke_spark.ner.spans import ENTITY_MAX_LENGTH, py_enumerate_spans


@given(st.integers(min_value=0, max_value=40), st.integers(min_value=1, max_value=8))
@settings(max_examples=200, deadline=None)
def test_enumeration_order_and_bounds(n, L):
    spans = py_enumerate_spans(n, L)
    # reference order: starts ascending, ends ascending within start
    assert spans == sorted(spans)
    for s, e in spans:
        assert 0 <= s < e <= n and e - s <= L
    # count: sum over s of min(L, n - s)
    assert len(spans) == sum(min(L, n - s) for s in range(n))


def test_relational_span_idx_matches_enumeration(spark):
    """The closed-form span_idx in enumerate_spans_relational must equal the
    position in py_enumerate_spans for every (num_words, span)."""
    from spanluke_spark.ner.spans import enumerate_spans_relational

    rows = [(n, n) for n in range(1, 25)]
    df = spark.createDataFrame(rows, "doc_id int, num_words int")
    got = enumerate_spans_relational(df, "num_words", max_length=ENTITY_MAX_LENGTH).collect()
    by_doc = {}
    for r in got:
        by_doc.setdefault(r.doc_id, {})[(r.w_start, r.w_end)] = r.span_idx
    for n in range(1, 25):
        expected = {sp: i for i, sp in enumerate(py_enumerate_spans(n, ENTITY_MAX_LENGTH))}
        assert by_doc.get(n, {}) == expected, n
