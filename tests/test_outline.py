"""HTML heading-outline extraction (etl/outline.py)."""

from __future__ import annotations

from spanluke_spark.etl.outline import heading_outline


def _outline(spark, html):
    df = spark.createDataFrame([(1, html)], "doc_id long, html string")
    rows = heading_outline(df, id_col="doc_id").orderBy("pos").collect()
    return [(r.pos, r.level, r.heading, r.parent_pos) for r in rows]


def test_nested_sections(spark):
    got = _outline(
        spark,
        "<h1>A</h1><h2>B</h2><h3>C</h3><h2>D</h2><h3>E</h3>",
    )
    assert got == [
        (1, 1, "A", None),
        (2, 2, "B", 1),
        (3, 3, "C", 2),
        (4, 2, "D", 1),
        (5, 3, "E", 4),
    ]


def test_parent_is_nearest_smaller_not_largest_level(spark):
    # h2 then h1 then h3: the h3's parent is the MORE RECENT h1 (pos 2),
    # not the older h2, even though level 2 > level 1
    got = _outline(spark, "<h2>x</h2><h1>y</h1><h3>z</h3>")
    assert got == [(1, 2, "x", None), (2, 1, "y", None), (3, 3, "z", 2)]


def test_level_skips_and_attrs_and_case(spark):
    got = _outline(
        spark,
        '<H1 class="t">Top</H1><h4 id="d">Deep</h4><h4>Deep2</h4>',
    )
    assert got == [
        (1, 1, "Top", None),
        (2, 4, "Deep", 1),
        (3, 4, "Deep2", 1),
    ]


def test_no_headings_and_binary_column(spark):
    df = spark.createDataFrame(
        [(1, bytearray(b"<p>none</p>")), (2, bytearray(b"<h2> T </h2>"))],
        "doc_id long, html binary",
    )
    rows = heading_outline(df, id_col="doc_id").collect()
    assert len(rows) == 1
    assert rows[0].heading == "T"  # trimmed
    assert rows[0].parent_pos is None  # no smaller level anywhere
