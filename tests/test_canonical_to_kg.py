"""End-to-end canonical-collapse seam: a crawl where the same judgment
is served under tracking-parameter variants and a 301-moved alias, each
variant declaring rel=canonical — the collapse picks one representative
per canonical key BEFORE extraction, so the legal-facts pipeline scores
each document once and every emitted fact carries the canonical URL.
The dedup operators never see the trivial duplicates at all.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from spanluke_spark.etl.canonical import canonicalize_urls
from spanluke_spark.kg import read_legal_facts, run_legal_facts_pipeline

_BODY = (
    '<html><head><link rel="canonical" href="{canon}"></head><body>'
    "<h1>IN THE SUPREME COURT OF INDIA</h1>"
    "<p>Criminal Appeal No. {n} of 2001. the appeal is allowed.</p>"
    "</body></html>"
)


def _pages(spark, rows):
    return spark.createDataFrame(rows, "url string, html string, text string")


def test_canonical_collapse_before_extraction(spark, tmp_path):
    canon_a = "https://court.example/case/1"
    canon_b = "https://court.example/case/2"
    rows = [
        # three variants of case/1, all declaring the same canonical
        (canon_a, _BODY.format(canon=canon_a, n=1), ""),
        (canon_a + "?utm_source=x", _BODY.format(canon=canon_a, n=1), ""),
        (canon_a + "?ref=rss", _BODY.format(canon=canon_a, n=1), ""),
        # case/2 crawled only under its old (redirected) host
        ("https://old.example/case/2", _BODY.format(canon=canon_b, n=2), ""),
    ]
    pages = _pages(spark, rows).withColumn(
        "text", F.expr("cast(html as string)")
    )
    redirects = spark.createDataFrame(
        [("https://old.example/case/2", canon_b)], "src string, dst string"
    )

    keys = canonicalize_urls(pages, redirects)
    # one representative per canonical key: min crawl url, deterministic
    w = Window.partitionBy("canonical_key").orderBy("url")
    reps = (
        keys.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .select("url", "canonical_key")
    )
    collapsed = (
        pages.join(reps, "url")
        .select(F.col("canonical_key").alias("url"), "html", "text")
    )
    assert collapsed.count() == 2  # 4 crawled pages -> 2 documents

    out = str(tmp_path / "kg")
    stats = run_legal_facts_pipeline(spark, collapsed, out, run_id="c1")
    assert stats["n_pages"] == 2

    facts = read_legal_facts(spark, out)
    by_url = {
        r.url for r in facts.where(facts.pred == "docketed_as").collect()
    }
    # facts exist once per CANONICAL url; no variant url ever appears
    assert by_url == {canon_a, canon_b}
    dockets = {
        (r.url, r.obj)
        for r in facts.where(facts.pred == "docketed_as").collect()
    }
    assert (canon_a, "criminalappeal:1:2001") in dockets
    assert (canon_b, "criminalappeal:2:2001") in dockets
