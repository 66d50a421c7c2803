"""Numbered-paragraph segmentation (etl/paragraphs.py)."""

from __future__ import annotations

from spanluke_spark.etl.paragraphs import split_paragraphs


def _rows(spark, texts):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    out = split_paragraphs(df).orderBy("doc_id", "para_no")
    return [(r.para_no, r.char_start, r.body) for r in out.collect()]


def test_basic_segmentation_with_preamble(spark):
    text = "CAUSE TITLE\n1. First para.\n2. Second para."
    got = _rows(spark, [text])
    assert got == [
        (1, text.index("1."), "First para."),
        (2, text.index("2."), "Second para."),
    ]


def test_no_preamble_starts_at_zero(spark):
    got = _rows(spark, ["1. Only para."])
    assert got == [(1, 0, "Only para.")]


def test_inline_numbers_do_not_split(spark):
    # "25. " mid-line (a date fragment, a citation) must not open a para
    text = "1. The order dated 25. March was set aside.\n2. Next."
    got = _rows(spark, [text])
    assert [g[0] for g in got] == [1, 2]
    assert got[0][2] == "The order dated 25. March was set aside."


def test_offsets_reconstruct_markers(spark):
    text = "x\n3. aaa\n17. bbbb\n21. c"
    got = _rows(spark, [text])
    for para_no, start, _ in got:
        assert text[start:].startswith(f"{para_no}.")


def test_unnumbered_document_empty(spark):
    assert _rows(spark, ["no numbering anywhere in this text"]) == []
