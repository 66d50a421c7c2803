"""Microdata extraction lanes beyond the q135 oracle corpus: value rules,
typeless scopes, flat-scope nesting, pages without markup."""

from __future__ import annotations

from spanluke_spark.etl.microdata import microdata_items


def _rows(spark, html):
    pages = spark.createDataFrame([("u", html)], "url string, html string")
    return microdata_items(pages).collect()


def test_three_value_rules(spark):
    html = (
        '<div itemscope itemtype="https://schema.org/Book">'
        '<meta itemprop="isbn" content="978-3">'
        '<a itemprop="publisher" href="https://pub.example/">Pub</a>'
        '<link itemprop="sameAs" href="https://wd.example/Q1">'
        '<SPAN ITEMPROP="name">  A   Title </SPAN></div>'
    )
    got = {(r.prop, r.value) for r in _rows(spark, html)}
    assert got == {
        ("isbn", "978-3"),
        ("publisher", "https://pub.example/"),
        ("sameAs", "https://wd.example/Q1"),
        ("name", "A Title"),  # whitespace collapsed + trimmed
    }


def test_typeless_scope_and_item_order(spark):
    html = (
        '<p itemscope><span itemprop="a">1</span></p>'
        '<p itemscope itemtype="T"><span itemprop="b">2</span></p>'
    )
    got = {(r.item_idx, r.item_type, r.prop) for r in _rows(spark, html)}
    assert got == {(0, None, "a"), (1, "T", "b")}


def test_nested_scope_owns_its_props(spark):
    html = (
        '<div itemscope itemtype="Outer"><span itemprop="x">ox</span>'
        '<div itemscope itemtype="Inner"><span itemprop="y">iy</span></div>'
        "</div>"
    )
    got = {(r.item_type, r.prop, r.value) for r in _rows(spark, html)}
    # flat-scope model: y belongs to Inner, never leaks to Outer
    assert got == {("Outer", "x", "ox"), ("Inner", "y", "iy")}


def test_no_markup_no_rows(spark):
    assert _rows(spark, "<html><body><p itemprop=orphan>x</p></body></html>") == []
