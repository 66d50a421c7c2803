"""Transitive closure / reachability via path doubling — the KG
"ontology closure" op: propagate instance_of through subclass_of chains,
same_as through equivalence hops, or any bounded-depth reachability a
triple store materializes.

Path doubling joins the CLOSURE-SO-FAR with itself each round, so after
r rounds every path of length <= 2^r is present: O(log diameter) joins
instead of O(diameter) for naive edge-at-a-time semi-naive iteration —
the classic distributed formulation. Each round is one equi-join + one
distinct (both AQE-managed), lineage truncated by an eager
localCheckpoint whose count() doubles as the fixpoint test.

Scale honesty: the OUTPUT is the closure — O(sum of reach-set sizes).
For the KG hierarchies this exists for (type/ontology DAGs: shallow,
narrow fan-in) that is small; for a raw web graph you would never
materialize a closure, you'd answer per-query with k-hop joins
(graph/analytics.path_motifs) or connected components (canon/cc.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def transitive_closure(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_rounds: int = 20,
) -> DataFrame:
    """edges -> every (src, dst) with a directed path src ->+ dst
    (self-pairs appear only via genuine cycles, matching SQL's recursive
    UNION semantics). Fixpoint reached when a doubling round adds no new
    pair; ``max_rounds`` = 20 covers diameters to 2^20."""
    p = (
        edges.select(src, dst)
        .where(F.col(src) != F.col(dst))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n = p.count()
    for _ in range(max_rounds):
        hop = (
            p.alias("a")
            .join(p.alias("b"), F.col(f"a.{dst}") == F.col(f"b.{src}"))
            .select(F.col(f"a.{src}").alias(src), F.col(f"b.{dst}").alias(dst))
        )
        grown = p.unionByName(hop).distinct().localCheckpoint(eager=True)
        m = grown.count()
        if m == n:
            break
        p, n = grown, m
    return p


def hop_distance(
    edges: DataFrame,
    seeds: DataFrame,
    max_hops: int = 3,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Minimum hop count from a seed set — frontier BFS as iterative
    relational rounds: (node, dist) for every node reachable from
    seeds(node) in <= max_hops directed hops (seeds at dist 0).

    Per round: one equi-join of the CURRENT FRONTIER (not the full
    visited set) against the edge table, one distinct, one left_anti
    against visited — the textbook distributed BFS whose per-round cost
    is O(frontier-adjacent edges). The round-closing count() doubles as
    the early-exit test, so diameters smaller than max_hops stop early.
    Use for trust-depth ("how many hops from a vetted seed is this
    host?"), crawl-frontier distance caps, and bounded provenance
    reachability.
    """
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    dist = (
        seeds.select("node")
        .distinct()
        .withColumn("dist", F.lit(0))
        .localCheckpoint(eager=True)
    )
    frontier = dist.select("node")
    for h in range(1, max_hops + 1):
        reached = (
            frontier.join(e, frontier.node == e.src)
            .select(F.col("dst").alias("node"))
            .distinct()
        )
        new = (
            reached.join(dist, "node", "left_anti")
            .withColumn("dist", F.lit(h))
            .localCheckpoint(eager=True)
        )
        if new.count() == 0:
            break
        dist = dist.unionByName(new).localCheckpoint(eager=True)
        frontier = new.select("node")
    return dist
