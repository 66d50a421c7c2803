"""DUST rule mining — "Do not crawl in the DUST: different URLs with
similar text" (Bar-Yossef, Keidar & Schonfeld, WWW 2007): learn URL
rewrite rules ("add www.", "append /index.html", "http -> https") from
observed duplicate-content clusters, so the frontier can canonicalize
BEFORE fetching instead of deduplicating after. The page-author
complement is rel=canonical (etl/canonical.py); the content-side
fallback is the dedup family (dedup/dedup.py) — this lane turns their
output into crawl-avoidance rules.

DustBuster's core signal, made relational: for every pair of URLs that
share a content fingerprint, the unique SUBSTRING SUBSTITUTION
transforming one into the other is (alpha -> beta) where the pair is
p·alpha·q and p·beta·q with p the longest common prefix and q the
longest common suffix (capped so p and q never overlap). Rules that
recur across many independent content clusters are real rewrite laws
of the site; pair-specific middles (support 1) are noise the support
threshold drops.

Shape at 10^12 pages: cluster by the content key (one shuffle — the
same key exact_dedup already computes), rank members per cluster and
keep the first ``max_cluster`` URLs (deterministic cap: giant
boilerplate clusters would otherwise emit O(c^2) pairs — the identical
trap VERDICT r4 #1 flagged for LSH, closed here by construction), then
a within-cluster self-join produces bounded pairs. LCP/LCS are
monotone prefix counts — size(filter(sequence, prefix-equal)) — pure
native HOFs, O(L^2) char work per pair on URL-bounded L (~hundreds),
no UDF, no Python. Rule aggregation is one map-side-combinable
groupBy on (alpha, beta).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["common_prefix_len", "mine_dust_rules"]


def common_prefix_len(u: Column, v: Column) -> Column:
    """Length of the longest common prefix — prefix equality is
    monotone in the length, so the count of prefix-equal lengths IS
    the maximum such length (no early-exit fold needed)."""
    n = F.least(F.length(u), F.length(v))
    # guard n = 0: Spark's sequence(1, 0) DESCENDS to [1, 0] instead of
    # being empty
    return F.when(n < 1, F.lit(0)).otherwise(
        F.size(
            F.filter(
                F.sequence(F.lit(1), n),
                lambda i: u.substr(F.lit(1), i) == v.substr(F.lit(1), i),
            )
        )
    ).cast("long")


def mine_dust_rules(
    pages: DataFrame,
    url_col: str = "url",
    content_col: str = "content_key",
    min_support: int = 2,
    max_cluster: int = 8,
) -> DataFrame:
    """(url, content_key) -> (alpha, beta, support, n_clusters): the
    substring-substitution rules observed across duplicate-content
    clusters, with support = #pairs and n_clusters = #distinct content
    clusters exhibiting the rule, filtered to support >= min_support.

    Pairs are ordered u < v lexicographically, so rule direction is
    deterministic; alpha may be '' (pure insertion rules such as
    '' -> 'www.'). Each cluster contributes at most
    C(max_cluster, 2) pairs regardless of its true size."""
    urls = pages.select(
        F.col(content_col).alias("ck"), F.col(url_col).alias("url")
    ).distinct()
    w = Window.partitionBy("ck").orderBy("url")
    capped = (
        urls.withColumn("r", F.row_number().over(w))
        .where(F.col("r") <= max_cluster)
        .drop("r")
    )
    a = capped.select("ck", F.col("url").alias("u"))
    b = capped.select("ck", F.col("url").alias("v"))
    pairs = a.join(b, "ck").where(F.col("u") < F.col("v"))

    u, v = F.col("u"), F.col("v")
    l1, l2 = F.length(u), F.length(v)
    feat = pairs.select(
        "ck",
        "u",
        "v",
        l1.alias("l1"),
        l2.alias("l2"),
        common_prefix_len(u, v).alias("lcp"),
        common_prefix_len(F.reverse(u), F.reverse(v)).alias("lcs"),
    )
    # cap the suffix so prefix and suffix never overlap
    s = F.least(F.col("lcs"), F.least(F.col("l1"), F.col("l2")) - F.col("lcp"))
    rules = feat.select(
        "ck",
        F.col("u")
        .substr(F.col("lcp") + 1, F.col("l1") - F.col("lcp") - s)
        .alias("alpha"),
        F.col("v")
        .substr(F.col("lcp") + 1, F.col("l2") - F.col("lcp") - s)
        .alias("beta"),
    )
    return (
        rules.groupBy("alpha", "beta")
        .agg(
            F.count(F.lit(1)).alias("support"),
            F.countDistinct("ck").alias("n_clusters"),
        )
        .where(F.col("support") >= min_support)
    )
