"""Sitemap parsing, learned type constraints, degree assortativity."""

from __future__ import annotations

import datetime

import pytest

from spanluke_spark.etl.sitemaps import parse_sitemaps
from spanluke_spark.graph.partitioning import degree_assortativity
from spanluke_spark.graph.schema_induce import learn_type_constraints

_URLSET = """<?xml version="1.0" encoding="UTF-8"?>
<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
  <url>
    <loc>https://ex.com/a?x=1&amp;y=2</loc>
    <lastmod>2024-03-01T12:00:00+00:00</lastmod>
    <changefreq>daily</changefreq>
    <priority>0.8</priority>
  </url>
  <url><loc>https://ex.com/b</loc><lastmod>2024-04-05</lastmod></url>
  <url><lastmod>2024-01-01</lastmod></url>
  <url><loc>https://ex.com/c</loc><priority>high</priority></url>
</urlset>"""

_INDEX = """<sitemapindex>
  <sitemap><loc>https://ex.com/maps/s1.xml</loc></sitemap>
  <sitemap><loc>https://ex.com/maps/s2.xml</loc>
    <lastmod>2024-05-01</lastmod></sitemap>
</sitemapindex>"""


def test_parse_urlset_fields_and_entities(spark):
    df = spark.createDataFrame(
        [("ex.com", _URLSET)], "host string, xml string"
    )
    rows = {r.loc: r for r in parse_sitemaps(df).collect()}
    # entry without <loc> dropped
    assert set(rows) == {
        "https://ex.com/a?x=1&y=2", "https://ex.com/b", "https://ex.com/c"
    }
    a = rows["https://ex.com/a?x=1&y=2"]
    assert not a.is_index
    assert a.lastmod == datetime.date(2024, 3, 1)
    assert a.changefreq == "daily" and a.priority == 0.8
    b = rows["https://ex.com/b"]
    assert b.lastmod == datetime.date(2024, 4, 5)
    assert b.changefreq is None and b.priority is None
    # malformed priority -> NULL, not a cast error
    assert rows["https://ex.com/c"].priority is None


def test_parse_sitemapindex(spark):
    df = spark.createDataFrame(
        [("ex.com", _INDEX)], "host string, xml string"
    )
    rows = sorted(
        (r.loc, r.is_index, r.lastmod) for r in parse_sitemaps(df).collect()
    )
    assert rows == [
        ("https://ex.com/maps/s1.xml", True, None),
        ("https://ex.com/maps/s2.xml", True, datetime.date(2024, 5, 1)),
    ]


def test_learn_type_constraints(spark):
    triples = spark.createDataFrame(
        [
            ("c1", "decided_by", "j1"),
            ("c2", "decided_by", "j2"),
            ("o1", "decided_by", "j1"),   # minority subject type
            ("c1", "cites", "u_untyped"),  # untyped obj: no range vote
        ],
        "subj string, pred string, obj string",
    )
    types = spark.createDataFrame(
        [("c1", "case"), ("c2", "case"), ("o1", "org"),
         ("j1", "judge"), ("j2", "judge")],
        "entity string, type string",
    )
    rows = {r.pred: r for r in
            learn_type_constraints(triples, types).collect()}
    d = rows["decided_by"]
    assert (d.domain_type, d.domain_support) == ("case", 2)
    assert d.domain_conf == pytest.approx(2 / 3)
    assert (d.range_type, d.range_conf) == ("judge", 1.0)
    c = rows["cites"]
    assert c.domain_type == "case"
    assert c.range_type is None  # only untyped objects: no evidence


def test_degree_assortativity_star_is_negative(spark):
    # star graph: hub degree n, leaves degree 1 -> perfectly disassortative
    edges = spark.createDataFrame(
        [("hub", f"leaf{i}") for i in range(6)], "src string, dst string"
    )
    row = degree_assortativity(edges).collect()[0]
    assert row.assortativity == pytest.approx(-1.0)
    assert row.n_edges == 6 and row.n_nodes == 7


def test_degree_assortativity_regular_graph_is_null(spark):
    # ring: every node degree 2, zero variance -> NULL (SQL corr
    # semantics), never an ANSI divide-by-zero
    edges = spark.createDataFrame(
        [(f"n{i}", f"n{(i + 1) % 5}") for i in range(5)],
        "src string, dst string",
    )
    row = degree_assortativity(edges).collect()[0]
    assert row.assortativity is None and row.n_edges == 5


def test_degree_assortativity_matches_numpy(spark):
    import numpy as np

    edges = [(f"n{i}", f"n{(i * 3 + 1) % 9}") for i in range(20)]
    df = spark.createDataFrame(edges, "src string, dst string")
    got = degree_assortativity(df).collect()[0].assortativity

    deg: dict[str, int] = {}
    for a, b in edges:
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
    xs, ys = [], []
    for a, b in edges:
        xs += [deg[a], deg[b]]
        ys += [deg[b], deg[a]]
    ref = np.corrcoef(xs, ys)[0, 1]
    assert got == pytest.approx(ref)
