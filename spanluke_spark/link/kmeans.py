"""Deterministic distributed k-means (Lloyd's) over an embedding column —
the trainer behind IVF partitions and embedding-space diagnostics.

Fully relational, like canon/cc.py for graphs: centroids live as
(cid, dim, value) rows, distances are one broadcast join + hash agg, and
each round ends in a localCheckpoint so plans stay flat. Deterministic
everywhere: seeds are the k lowest-id vectors, ties rank (distance, cid).

Cost shape per round: |vectors| x dims x k product rows through a map-side
partial agg — the standard relational Lloyd cost; centroids are broadcast
(k*dims rows), so nothing reshuffles the corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _assign(pos: DataFrame, cent: DataFrame) -> DataFrame:
    """(vid, cid): nearest centroid by squared L2, ties -> lowest cid.
    Distances rounded to 6 places so the ranking is reproducible across
    engines (same convention as the ANN oracles)."""
    d = (
        pos.join(F.broadcast(cent), "pos")
        .groupBy("vid", "cid")
        .agg(F.round(F.sum((F.col("v") - F.col("c")) ** 2), 6).alias("d2"))
    )
    w = Window.partitionBy("vid").orderBy(F.asc("d2"), F.asc("cid"))
    return (
        d.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select("vid", "cid")
    )


def kmeans_assignments(
    emb: DataFrame,
    k: int = 4,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """-> (vec_id, cluster) after ``iters`` Lloyd rounds from deterministic
    seeds (the k lowest-id vectors). An empty cluster keeps its previous
    centroid (no re-seeding), matching the unrolled SQL oracle."""
    pos = emb.select(
        F.col(id_col).alias("vid"), F.posexplode(F.col(vec_col)).alias("pos", "v")
    ).localCheckpoint(eager=True)
    seed_w = Window.orderBy("vid")
    seeds = (
        pos.select("vid")
        .distinct()
        .orderBy("vid")
        .limit(k)
        .withColumn("cid", F.row_number().over(seed_w) - 1)
    )
    cent = (
        pos.join(seeds, "vid")
        .select("cid", "pos", F.col("v").cast("double").alias("c"))
        .localCheckpoint(eager=True)
    )
    assign = None
    for _ in range(iters):
        assign = _assign(pos, cent)
        new_cent = (
            pos.join(assign, "vid")
            .groupBy("cid", "pos")
            .agg(F.avg("v").alias("c"))
        )
        # empty clusters: keep the old centroid row
        cent = new_cent.unionByName(
            cent.join(new_cent.select("cid").distinct(), "cid", "left_anti")
        ).localCheckpoint(eager=True)
    assert assign is not None
    return assign.select(F.col("vid").alias(id_col), F.col("cid").alias("cluster"))
