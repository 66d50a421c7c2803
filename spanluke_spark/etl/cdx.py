"""SURT URL canonicalization + CDX capture-index construction — the
Common-Crawl / Internet-Archive index format (the public cc-index is
exactly this: SURT-keyed, timestamp-sorted capture rows; see the pywb
"SURT" convention and the CDXJ spec).

SURT (Sort-friendly URI Reordering Transform) turns
``https://www.Example.com:443/A/b?x=1`` into ``com,example)/a/b?x=1`` so a
lexicographic sort clusters every capture of a host — and every subdomain
of a domain — contiguously. That key is what makes the crawl index
range-scannable: "all captures under com,example" is one contiguous slice,
which at 10^12 captures means partition pruning instead of a full scan.

All pure codegen (split / reverse / concat / sha2): the key derivation
fuses into the page scan; building the index is one sort-on-write
(partitionBy prefix + sortWithinPartitions in a real deployment). The
digest is sha256 of the page body — content-addressed dedup across
captures falls out of a groupBy on (surt_key, digest).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["surt_key", "build_cdx"]

_HOST_RE = r"^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]+)"
_REST_RE = r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]+([^#]*)"


def surt_key(url: Column) -> Column:
    """URL -> SURT key: lowercase, scheme and fragment dropped, leading
    ``www.`` and default ports stripped, host components reversed and
    comma-joined, then ``)/`` + path?query.

    ``http://www.Example.com/A/b?x=1`` -> ``com,example)/a/b?x=1``.
    """
    u = F.lower(url)
    host = F.regexp_extract(u, _HOST_RE, 1)
    host = F.regexp_replace(host, r"^www\.", "")
    host = F.regexp_replace(host, r":(80|443)$", "")
    # non-default port survives AFTER the reversed host: com,example:8080)/
    port = F.regexp_extract(host, r"(:\d+)$", 1)
    bare = F.regexp_replace(host, r":\d+$", "")
    rev = F.array_join(F.reverse(F.split(bare, r"\.")), ",")
    rest = F.regexp_extract(u, _REST_RE, 1)
    rest = F.when(rest == "", F.lit("/")).otherwise(rest)
    return F.concat(rev, port, F.lit(")"), rest)


def build_cdx(
    pages: DataFrame,
    url_col: str = "url",
    ts_col: str = "warc_ts",
    body_col: str = "html",
) -> DataFrame:
    """-> (surt_key, ts, url, digest, length): one capture-index row per
    page, the CDX(J) relation. Sorting/bucketing by surt_key prefix is the
    writer's job (storage.tables handles partition transforms); this
    derivation is shuffle-free."""
    return pages.select(
        surt_key(F.col(url_col)).alias("surt_key"),
        F.col(ts_col).alias("ts"),
        F.col(url_col).alias("url"),
        F.sha2(F.col(body_col).cast("binary"), 256).alias("digest"),
        F.length(F.col(body_col)).alias("length"),
    )
