"""HTML table extraction lanes beyond the q131 oracle corpus."""

from __future__ import annotations

from spanluke_spark.etl.webtables import table_cells, table_facts


def _pages(spark, html):
    return spark.createDataFrame([("u", html)], "url string, html string")


def test_multiple_tables_and_positions(spark):
    html = (
        "<table><tr><th>A</th></tr><tr><td>1</td></tr></table>"
        "<p>x</p>"
        "<TABLE><TR><TH>B</TH></TR><TR><TD>2</TD><TD>3</TD></TR></TABLE>"
    )
    cells = table_cells(_pages(spark, html)).collect()
    got = {(r.table_idx, r.row_idx, r.col_idx): (r.cell, r.is_header) for r in cells}
    assert got[(0, 0, 0)] == ("A", True)
    assert got[(0, 1, 0)] == ("1", False)
    assert got[(1, 0, 0)] == ("B", True)
    assert got[(1, 1, 1)] == ("3", False)


def test_headerless_table_yields_no_facts(spark):
    html = "<table><tr><td>just</td><td>data</td></tr></table>"
    assert table_facts(_pages(spark, html)).count() == 0


def test_entity_decode_order_and_tag_strip(spark):
    html = (
        "<table><tr><th>K</th></tr>"
        "<tr><td> a &amp;lt; b <b>bold</b>&nbsp;&quot;q&quot; </td></tr></table>"
    )
    r = table_facts(_pages(spark, html)).collect()[0]
    # &amp;lt; decodes to the LITERAL "&lt;" (ampersand replaced last)
    assert r.value == 'a &lt; b bold "q"'


def test_extra_data_columns_without_header_are_dropped(spark):
    html = (
        "<table><tr><th>Only</th></tr>"
        "<tr><td>kept</td><td>orphan</td></tr></table>"
    )
    rows = table_facts(_pages(spark, html)).collect()
    assert [(r.header, r.value) for r in rows] == [("Only", "kept")]
