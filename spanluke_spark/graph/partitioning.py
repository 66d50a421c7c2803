"""Graph partitioning quality diagnostic — before shipping a 10^12-edge
graph job, measure what the default hash partitioner actually does to
it: the edge-cut fraction (cut edges = network traffic in every
iterative algorithm: PageRank, CC, BFS all pay one message per cut edge
per round) and the partition load balance (the straggler bound).

One pass over the edge list with codegen hash expressions + two small
aggregates — no shuffle of the edge list itself beyond the per-partition
rollups. Uses the portable md5-derived hash so the measurement is
engine-reproducible (and SQL-oracle-checkable); swap portable_hash64 for
F.xxhash64 when measuring Spark's own HashPartitioner placement.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..dedup.dedup import portable_hash64


def partition_quality(
    edges: DataFrame,
    n_partitions: int,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """edges(src, dst) -> one row: (n_partitions, n_edges, cut_edges,
    cut_frac, n_nodes, max_part_nodes, avg_part_nodes, node_balance)
    for hash placement node -> h(node) % n_partitions. node_balance =
    max/avg partition population (1.0 = perfect)."""
    e = edges.select(
        (portable_hash64(F.col(src)) % n_partitions).alias("p_src"),
        (portable_hash64(F.col(dst)) % n_partitions).alias("p_dst"),
    )
    edge_stats = e.agg(
        F.count(F.lit(1)).alias("n_edges"),
        F.sum(
            (F.col("p_src") != F.col("p_dst")).cast("long")
        ).alias("cut_edges"),
    )
    nodes = (
        edges.select(F.col(src).alias("node"))
        .unionByName(edges.select(F.col(dst).alias("node")))
        .distinct()
        .select((portable_hash64(F.col("node")) % n_partitions).alias("p"))
    )
    loads = nodes.groupBy("p").agg(F.count(F.lit(1)).alias("n"))
    node_stats = loads.agg(
        F.sum("n").alias("n_nodes"),
        F.max("n").alias("max_part_nodes"),
        (F.sum("n") / F.count(F.lit(1))).alias("avg_part_nodes"),
    )
    return (
        edge_stats.crossJoin(F.broadcast(node_stats))
        .select(
            F.lit(n_partitions).alias("n_partitions"),
            "n_edges",
            "cut_edges",
            (F.col("cut_edges") / F.col("n_edges")).alias("cut_frac"),
            "n_nodes",
            "max_part_nodes",
            "avg_part_nodes",
            (F.col("max_part_nodes") / F.col("avg_part_nodes")).alias(
                "node_balance"
            ),
        )
    )
