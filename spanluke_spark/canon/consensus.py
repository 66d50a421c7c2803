"""Consensus clustering by co-association evidence accumulation
(Strehl & Ghosh JMLR 2002; Fred & Jain PAMI 2005) — combine SEVERAL
cheap clusterings into one robust one. This repo now ships four
clustering lowerings (connected components, pivot correlation
clustering, single-linkage, k-means); each has failure modes on noisy
match graphs. The consensus rule is the standard fix: a pair belongs
together iff >= ``min_agree`` of the k runs co-clustered it, and the
consensus clusters are the components of that majority-pair graph.

Shape: per (run, cluster) self-join emits co-clustered pairs —
quadratic in CLUSTER size, run-linear (the canonical co-association
cost; cap upstream cluster sizes for pathological runs) — one count
aggregate keyed on the pair, then the hardened CC of canon/cc.py
(driver fallback, hub salting) over majority pairs only. Nodes never
reaching the majority with anyone become singletons via one anti-join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["consensus_clusters"]


def consensus_clusters(
    assignments: DataFrame,
    min_agree: int,
    run_col: str = "run",
    id_col: str = "node",
    cluster_col: str = "cluster",
) -> DataFrame:
    """assignments(run, node, cluster) over k runs -> (node, consensus)
    with consensus = min node id of the majority-pair component (the
    cc.py labeling); nodes co-clustered with nobody >= min_agree times
    keep themselves."""
    from .cc import connected_components

    a = assignments.select(
        F.col(run_col).alias("r"),
        F.col(id_col).alias("na"),
        F.col(cluster_col).alias("c"),
    )
    b = assignments.select(
        F.col(run_col).alias("r"),
        F.col(id_col).alias("nb"),
        F.col(cluster_col).alias("c"),
    )
    pairs = (
        a.join(b, ["r", "c"])
        .filter(F.col("na") < F.col("nb"))
        .groupBy("na", "nb")
        .agg(F.count(F.lit(1)).alias("n_agree"))
        .filter(F.col("n_agree") >= min_agree)
    )
    comp = connected_components(
        pairs.select(F.col("na").alias("src"), F.col("nb").alias("dst"))
    ).select(F.col("node"), F.col("component").alias("consensus"))
    singletons = (
        assignments.select(F.col(id_col).alias("node"))
        .distinct()
        .join(comp.select("node"), "node", "left_anti")
        .select("node", F.col("node").alias("consensus"))
    )
    return comp.unionByName(singletons)
