"""Redirect-chain resolution — collapse HTTP 3xx chains (u -> v -> w)
to each URL's final landing target before dedup/canonicalization, so a
crawl's 10^10 redirect records become one (src, final) lookup.

The redirect map is a FUNCTIONAL graph (<=1 out-edge per src after the
deterministic min-dst dedupe), so resolution is pointer jumping: each
round composes the partial map with itself, halving every remaining
chain — O(log longest-chain) self-joins instead of O(chain) sequential
lookups, the classic parallel list-ranking formulation. Rounds close
with a localCheckpoint whose changed-row count doubles as the fixpoint
test (same discipline as graph/closure.py).

Nodes still pointing at a redirecting URL after ``max_rounds`` are
cycles (redirect loops DO exist in real crawls); they are flagged, not
dropped, and their hop count is reported as NULL because a loop has no
meaningful chain length.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def resolve_redirects(
    redirects: DataFrame,
    max_rounds: int = 16,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """redirects(src, dst) -> (src, final, hops, is_cycle): the landing
    URL, the true chain length, and the redirect-loop flag per source.
    Duplicate out-edges for one src resolve to min(dst). ``max_rounds``
    = 16 resolves chains up to 2^16 hops."""
    import math

    m = (
        redirects.groupBy(F.col(src).alias("src"))
        .agg(F.min(F.col(dst)).alias("cur"))
        .withColumn("hops", F.lit(1).cast("long"))
        .localCheckpoint(eager=True)
    )
    # no acyclic chain can be longer than the map itself, and pointer
    # jumping resolves distance-d chains in ceil(log2(d)) rounds — so
    # cap rounds at ceil(log2(n)): without this, a single redirect LOOP
    # keeps "moving" forever and forces all max_rounds rounds even when
    # every real chain resolved in round 1
    n_srcs = m.count()
    rounds = min(max_rounds, max(1, math.ceil(math.log2(max(n_srcs, 2)))))
    for _ in range(rounds):
        nxt = m.select(
            F.col("src").alias("_s"),
            F.col("cur").alias("_c"),
            F.col("hops").alias("_h"),
        )
        stepped = (
            m.join(nxt, m.cur == nxt._s, "left")
            .select(
                "src",
                F.coalesce("_c", "cur").alias("cur"),
                (F.col("hops") + F.coalesce("_h", F.lit(0))).alias("hops"),
                F.col("_s").isNotNull().alias("_moved"),
            )
            .localCheckpoint(eager=True)
        )
        moved = stepped.filter(F.col("_moved")).count()
        m = stepped.drop("_moved")
        if moved == 0:
            break
    # a src whose final target still redirects after the fixpoint/cap is
    # inside (or feeding) a redirect loop
    srcs = m.select(F.col("src").alias("_loop"))
    return (
        m.join(srcs, m.cur == srcs._loop, "left")
        .select(
            "src",
            F.col("cur").alias("final"),
            F.when(F.col("_loop").isNull(), F.col("hops")).alias("hops"),
            F.col("_loop").isNotNull().alias("is_cycle"),
        )
    )
