"""Minimum spanning forest (Borůvka) and single-linkage clustering.

The scale path for HIERARCHICAL dedup/canonicalization: a near-dup
similarity graph (dedup/dedup.py pair generators with their verified
distances) supports many reasonable cut thresholds, and re-running
connected components per threshold re-shuffles the full pair set every
time. The MSF is the whole dendrogram in <= |V|-1 edges: computed once,
ANY threshold cut is a filter over the forest plus a CC over what
remains — the standard single-linkage-at-scale construction (cut-at-t
over the MSF yields exactly the components of the t-thresholded graph).

Borůvka, relationally: per round every component picks its minimum
incident cross-component edge — `min(struct(w, a, b, ...))` is
lexicographic and algebraic; struct buffers are not hash-mutable so
Spark lowers it to a partial SortAggregate (per-task sort + map-side
combine — reduce input stays capped at #map-partitions rows per
component, and there is no skew-prone global window) — the chosen
edges join the forest, and the touched components merge. Component merging reuses
the hardened alternating-star machinery (canon/cc.py: driver fallback
for collision-sized rounds, hub salting, O(log^2 n) bound); the merge
graph has at most one edge per live component, so it halves per round
and Borůvka terminates in <= ceil(log2 |V|) rounds. Ties are broken by
the full (w, a, b) tuple, which makes edge weights totally ordered and
the forest unique and deterministic — the same forest Kruskal with that
tie-break produces (the pytest oracle).

Node ids are cast to long (the cc.py convention — dedup graphs are
keyed by doc_id); per-round localCheckpoint keeps plans flat.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..canon.cc import connected_components

__all__ = ["boruvka_msf", "single_linkage"]


def _canonical(edges: DataFrame, src: str, dst: str, weight: str) -> DataFrame:
    """Distinct canonical weighted edges (a < b, min weight per pair)."""
    e = edges.select(
        F.col(src).cast("long").alias("s"),
        F.col(dst).cast("long").alias("d"),
        F.col(weight).cast("double").alias("w"),
    )
    return (
        e.where(F.col("s") != F.col("d"))
        .select(
            F.least("s", "d").alias("a"),
            F.greatest("s", "d").alias("b"),
            F.col("w"),
        )
        .groupBy("a", "b")
        .agg(F.min("w").alias("w"))
    )


def boruvka_msf(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    weight: str = "w",
    stats: dict | None = None,
) -> DataFrame:
    """edges(src, dst, weight) -> the minimum spanning forest as
    (a, b, w), a < b. Parallel edges collapse to their cheapest copy;
    self-loops are dropped; every tree of the forest spans one component
    of the input. Deterministic: ties broken by (w, a, b).
    """
    e0 = _canonical(edges, src, dst, weight).localCheckpoint(eager=True)
    nodes = (
        e0.select(F.col("a").alias("node"))
        .unionByName(e0.select(F.col("b").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n = nodes.count()
    max_rounds = max(1, math.ceil(math.log2(n + 1)))
    comp = nodes.select("node", F.col("node").alias("comp"))
    spark = edges.sparkSession
    forest = spark.createDataFrame([], "a long, b long, w double")

    rounds = 0
    for _ in range(max_rounds):
        ec = (
            e0.join(
                comp.select(F.col("node").alias("a"), F.col("comp").alias("ca")), "a"
            )
            .join(
                comp.select(F.col("node").alias("b"), F.col("comp").alias("cb")), "b"
            )
            .where(F.col("ca") != F.col("cb"))
        )
        pick = F.struct("w", "a", "b", "ca", "cb").alias("pick")
        cand = ec.select(F.col("ca").alias("owner"), pick).unionByName(
            ec.select(F.col("cb").alias("owner"), pick)
        )
        sel = (
            cand.groupBy("owner")
            .agg(F.min("pick").alias("p"))
            .select("p.*")
            .distinct()
            .localCheckpoint(eager=True)
        )
        if sel.limit(1).count() == 0:
            break
        rounds += 1
        forest = forest.unionByName(sel.select("a", "b", "w"))
        merged = connected_components(
            sel.select(F.col("ca").alias("src"), F.col("cb").alias("dst"))
        ).withColumnRenamed("node", "comp")
        comp = (
            comp.join(merged, "comp", "left")
            .select(
                "node", F.coalesce("component", F.col("comp")).alias("comp")
            )
            .localCheckpoint(eager=True)
        )
    if stats is not None:
        stats.update(rounds=rounds, n_nodes=n)
    return forest


def single_linkage(
    edges: DataFrame,
    threshold: float,
    src: str = "src",
    dst: str = "dst",
    weight: str = "w",
) -> DataFrame:
    """edges(src, dst, weight) -> (node, cluster): single-linkage
    clusters at distance ``threshold`` — cluster = min node id, nodes
    never linked at <= threshold cluster alone. Computed as the MSF cut
    at the threshold (identical to components of the thresholded graph,
    but the forest is reusable across thresholds).
    """
    msf = boruvka_msf(edges, src=src, dst=dst, weight=weight)
    cut = msf.where(F.col("w") <= F.lit(float(threshold)))
    cl = connected_components(cut, src="a", dst="b").withColumnRenamed(
        "component", "cluster"
    )
    e = edges.select(
        F.col(src).cast("long").alias("s"), F.col(dst).cast("long").alias("d")
    )
    nodes = (
        e.select(F.col("s").alias("node"))
        .unionByName(e.select(F.col("d").alias("node")))
        .distinct()
    )
    return nodes.join(cl, "node", "left").select(
        "node", F.coalesce("cluster", F.col("node")).alias("cluster")
    )
