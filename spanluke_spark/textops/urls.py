"""URL normalization + host-level statistics — the standard Common-Crawl
curation step (dedupe-by-canonical-url, per-domain quotas, blocklists) over
the pages table of the north_rule.

All pure codegen (regexp_extract / split / slice) so at 10^12 pages the
normalization fuses into the scan; the per-host aggregate is the only
shuffle, keyed on the (low-cardinality relative to pages) host.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_HOST_RE = r"^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]+)"
_PATH_RE = r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]+([^?#]*)"


def host_of(url: Column) -> Column:
    """Lower-cased authority component (host[:port])."""
    return F.lower(F.regexp_extract(url, _HOST_RE, 1))


def path_of(url: Column) -> Column:
    """Path component with query string and fragment stripped."""
    return F.regexp_extract(url, _PATH_RE, 1)


def registered_domain(host: Column) -> Column:
    """Last two DNS labels — the eTLD+1 approximation used for per-domain
    quotas when no public-suffix list is shipped (none in this sandbox)."""
    labels = F.split(host, r"\.")
    return F.when(
        F.size(labels) >= 2, F.concat_ws(".", F.slice(labels, -2, 2))
    ).otherwise(host)


def normalize_urls(df: DataFrame, url_col: str = "url") -> DataFrame:
    """Adds ``host``, ``path``, ``registered_domain``, and ``url_canonical``
    (scheme-normalized, query/fragment stripped) columns."""
    u = F.col(url_col)
    host = host_of(u)
    path = path_of(u)
    return df.select(
        "*",
        host.alias("host"),
        path.alias("path"),
        registered_domain(host).alias("registered_domain"),
        F.concat(F.lit("https://"), host, path).alias("url_canonical"),
    )


def host_stats(df: DataFrame, url_col: str = "url", text_col: str = "text") -> DataFrame:
    """Per-registered-domain curation stats: page count, distinct hosts,
    total/avg text bytes — the inputs to a per-domain sampling quota.

    One shuffle keyed by registered_domain; partial aggregation below it
    (Spark's hash-agg does map-side combine automatically), so at 100 TB the
    exchange carries one row per (task, domain), not per page.
    """
    n = normalize_urls(df, url_col)
    return (
        n.groupBy("registered_domain")
        .agg(
            F.count(F.lit(1)).alias("n_pages"),
            F.countDistinct("host").alias("n_hosts"),
            F.sum(F.length(F.col(text_col))).alias("sum_text_chars"),
            F.round(F.avg(F.length(F.col(text_col))), 6).alias("avg_text_chars"),
        )
    )


def url_templates(df: DataFrame, url_col: str = "url") -> DataFrame:
    """URL path-template mining — collapse id-carrying segments so
    /item/8231/view and /item/77/view share the template /item/{n}/view:
    the standard crawl-frontier analysis for finding infinite URL spaces
    (calendars, session ids, spider traps) and for per-template sampling
    quotas.

    -> (host, template, n_urls, max_depth, n_trap_urls, example_url):
    one row per (host, template). Segment classes: all-digits -> {n},
    long hex (>= 8 chars) -> {h}, else the literal segment lowercased.
    A url is trap-flagged when one segment value repeats >= 3 times in
    its own path (the /a/a/a/... self-link pattern). Pure codegen
    (split + transform + rlike), one map-side-combinable groupBy.
    """
    path = path_of(F.col(url_col))
    segs = F.filter(F.split(path, "/"), lambda s: s != F.lit(""))
    tmpl_segs = F.transform(
        segs,
        lambda s: F.when(s.rlike("^[0-9]+$"), F.lit("{n}"))
        .when(s.rlike("^[0-9a-fA-F]{8,}$"), F.lit("{h}"))
        .otherwise(F.lower(s)),
    )
    depth = F.size(segs)
    # a path with any segment repeated >= 3 times: after sorting, some
    # value occupies positions i and i+2
    sorted_segs = F.array_sort(segs)
    # CASE guards the probe: sequence(1, d-2) is DESCENDING for d < 3
    has_rep3 = F.when(
        depth >= 3,
        F.exists(
            F.sequence(F.lit(1), depth - 2),
            lambda i: F.try_element_at(sorted_segs, i)
            == F.try_element_at(sorted_segs, i + 2),
        ),
    ).otherwise(F.lit(False))

    rows = df.select(
        host_of(F.col(url_col)).alias("host"),
        F.concat(F.lit("/"), F.array_join(tmpl_segs, "/")).alias("template"),
        depth.alias("depth"),
        has_rep3.cast("long").alias("is_trap"),
        F.col(url_col).alias("url"),
    )
    return rows.groupBy("host", "template").agg(
        F.count("*").alias("n_urls"),
        F.max("depth").alias("max_depth"),
        F.sum("is_trap").alias("n_trap_urls"),
        F.min("url").alias("example_url"),
    )
