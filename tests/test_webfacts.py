"""Lane union composition: each lane contributes, plan stays scan-side."""

from __future__ import annotations

from spanluke_spark.etl.webfacts import extract_web_facts


def test_all_lanes_contribute_and_compose(spark):
    html = (
        '<script type="application/ld+json">{"@id":"e","p":"v"}</script>'
        '<i itemscope itemtype="T"><b itemprop="q">w</b></i>'
        "<table><tr><th>H</th></tr><tr><td>z</td></tr></table>"
    )
    pages = spark.createDataFrame([("u", html)], "url string, html string")
    out = extract_web_facts(pages)
    got = {(r.lane, r.subj, r.pred, r.obj) for r in out.collect()}
    assert ("jsonld", "e", "p", "v") in got
    assert ("microdata", "md:u#0", "q", "w") in got
    assert ("microdata", "md:u#0", "rdf:type", "T") in got
    assert ("table", "tbl:u#0.1", "H", "z") in got

    plan = out._jdf.queryExecution().executedPlan().toString()
    final = plan.split("== Initial Plan ==")[0]
    # only the microdata item-numbering windows (one per microdata branch)
    # shuffle, keyed on the url; table facts derive headers in-row and
    # jsonld is a pure projection — no global sort, no join anywhere
    assert "Python" not in final
    assert final.count("Exchange hashpartitioning") <= 2
    assert "Exchange SinglePartition" not in final and "SortMergeJoin" not in final


def test_page_with_no_markup_yields_nothing(spark):
    pages = spark.createDataFrame(
        [("u", "<html><body><p>plain</p></body></html>")],
        "url string, html string",
    )
    assert extract_web_facts(pages).count() == 0
