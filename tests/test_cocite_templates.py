"""Co-citation/coupling semantics and URL template mining edge cases."""

from __future__ import annotations

from spanluke_spark.graph.linkpred import cocitation_counts
from spanluke_spark.textops.urls import url_templates


def test_cocitation_vs_coupling(spark):
    # s1 -> {a, b}; a -> t, b -> t
    e = spark.createDataFrame(
        [(100, 1), (100, 2), (1, 50), (2, 50)], "src long, dst long"
    )
    got = {(r.u, r.v): (r.cocited, r.coupled) for r in cocitation_counts(e).collect()}
    assert got[(1, 2)] == (1, 1)  # co-cited by 100 AND both cite 50
    assert len(got) == 1


def test_cocitation_hub_cap(spark):
    hub = [(0, i) for i in range(1, 8)] + [(9, 1), (9, 2)]
    e = spark.createDataFrame(hub, "src long, dst long")
    capped = {(r.u, r.v) for r in cocitation_counts(e, max_deg=3).collect()}
    # the hub 0 is capped as a CO-CITATION middle; pair (0,9) still appears
    # via the COUPLING wedge (both cite targets 1 and 2, in-degree 2 <= cap)
    assert capped == {(1, 2), (0, 9)}
    full = cocitation_counts(e).count()
    assert full == 7 * 6 // 2 + 1  # uncapped: 21 hub pairs + (0,9) coupling


def test_url_templates_classes_and_traps(spark):
    urls = [
        ("https://Ex.com/item/123/view",),
        ("https://ex.com/item/9/view",),
        ("https://ex.com/item/deadbeef00/view",),  # long hex -> {h}
        ("https://ex.com/a/a/b/a",),               # 'a' x3 -> trap
        ("https://ex.com/a/b/a",),                 # only x2 -> not a trap
        ("https://ex.com",),                       # no path -> template "/"
    ]
    df = spark.createDataFrame(urls, "url string")
    got = {r.template: r for r in url_templates(df).collect()}
    assert got["/item/{n}/view"].n_urls == 2
    assert got["/item/{n}/view"].example_url == "https://Ex.com/item/123/view"
    assert "/item/{h}/view" in got
    assert got["/a/a/b/a"].n_trap_urls == 1 and got["/a/a/b/a"].max_depth == 4
    assert got["/a/b/a"].n_trap_urls == 0
    assert got["/"].n_urls == 1
