"""Greedy maximum-weight matching by locally-dominant edges (Preis 1999;
Manne & Bisseling 2007 — the distributed formulation used by every
parallel matching system): the ONE-TO-ONE assignment step of entity
alignment — after canon/align/fuzzy scoring produce many-to-many
candidate pairs with similarity weights, each entity may be matched to
at most one partner, maximizing weight greedily.

An edge is LOCALLY DOMINANT when it is the best incident edge of BOTH
endpoints (best = max weight, ties to the smallest (a, b) — a total
order, so the result is unique and engine-independent). Accepting all
locally-dominant edges simultaneously each round and deleting their
endpoints yields EXACTLY the sequential greedy matching (the classic
equivalence: the globally best remaining edge is always locally
dominant, and locally-dominant choices never conflict), with a 1/2
approximation guarantee to the optimum.

Scale shape: per round one incidence projection (2 rows per edge), one
map-side-combinable max(struct) per node, one join back to edges, two
anti-joins to shrink the live set — no windows over the full edge list,
no driver state beyond the fixpoint probe. Expected O(log n) rounds on
weight-generic graphs (each round removes a constant fraction of edges
in expectation); ``max_rounds`` guards adversarial weight orderings
(e.g. a strictly-decreasing path, which locks one edge per round).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["greedy_matching", "py_greedy_matching"]


def greedy_matching(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    weight: str = "weight",
    max_rounds: int = 40,
) -> DataFrame:
    """(src, dst, weight) candidate pairs (undirected; src/dst ids share
    one space and each node is matched at most once) -> the greedy
    matching (src, dst, weight). Self-pairs ignored; duplicate pairs
    keep the max weight."""
    e = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("a"),
            F.greatest(F.col(src), F.col(dst)).alias("b"),
            F.col(weight).alias("w"),
        )
        .where(F.col("a") != F.col("b"))
        .groupBy("a", "b")
        .agg(F.max("w").alias("w"))
        .localCheckpoint(eager=True)
    )
    spark = edges.sparkSession
    matched = spark.createDataFrame([], e.schema)

    for _ in range(max_rounds):
        if e.limit(1).count() == 0:
            break
        inc = e.select(F.col("a").alias("node"), "a", "b", "w").unionByName(
            e.select(F.col("b").alias("node"), "a", "b", "w")
        )
        best = inc.groupBy("node").agg(
            F.max(F.struct("w", (-F.col("a")).alias("na"), (-F.col("b")).alias("nb"))).alias(
                "best"
            )
        )
        dom = (
            e.join(
                best.select(F.col("node").alias("a"), F.col("best").alias("_ba")), "a"
            )
            .join(
                best.select(F.col("node").alias("b"), F.col("best").alias("_bb")), "b"
            )
            .where(
                (F.col("_ba.w") == F.col("w"))
                & (F.col("_ba.na") == -F.col("a"))
                & (F.col("_ba.nb") == -F.col("b"))
                & (F.col("_bb.w") == F.col("w"))
                & (F.col("_bb.na") == -F.col("a"))
                & (F.col("_bb.nb") == -F.col("b"))
            )
            .select("a", "b", "w")
            .localCheckpoint(eager=True)
        )
        matched = matched.unionByName(dom).localCheckpoint(eager=True)
        hit = dom.select(F.col("a").alias("node")).unionByName(
            dom.select(F.col("b").alias("node"))
        )
        e = (
            e.join(hit.withColumnRenamed("node", "a"), "a", "left_anti")
            .join(hit.withColumnRenamed("node", "b"), "b", "left_anti")
            .select("a", "b", "w")
            .localCheckpoint(eager=True)
        )
    else:
        if e.limit(1).count() != 0:
            raise ValueError("greedy_matching: round budget exhausted")
    return matched.select(
        F.col("a").alias(src), F.col("b").alias(dst), F.col("w").alias(weight)
    )


def py_greedy_matching(
    edges: list[tuple[int, int, float]]
) -> set[tuple[int, int, float]]:
    """Sequential greedy oracle: scan edges by (weight desc, a, b), take
    an edge iff both endpoints are free — the matching the distributed
    locally-dominant rounds must reproduce exactly."""
    norm: dict[tuple[int, int], float] = {}
    for u, v, w in edges:
        if u == v:
            continue
        a, b = min(u, v), max(u, v)
        if (a, b) not in norm or norm[(a, b)] < w:
            norm[(a, b)] = w
    free: set[int] = set()
    for a, b in norm:
        free.add(a)
        free.add(b)
    out: set[tuple[int, int, float]] = set()
    for (a, b), w in sorted(norm.items(), key=lambda kv: (-kv[1], kv[0])):
        if a in free and b in free:
            out.add((a, b, w))
            free.discard(a)
            free.discard(b)
    return out
