"""SemDeDup — semantic deduplication in embedding space (Abbas et al.
2023, "SemDeDup: Data-efficient learning at web-scale through semantic
deduplication"; used to prune LAION/web corpora 50% with no quality loss).

Pipeline: (1) k-means the embeddings (the repo's deterministic relational
Lloyd, link/kmeans.py); (2) WITHIN each cluster, find pairs above a cosine
threshold; (3) group duplicates (connected components over the pair
graph, canon/cc.py); (4) keep ONE representative per group — following
the paper, the member with the LOWEST cosine to its cluster centroid
(maximally atypical, preserving diversity), id as tie-break.

Why clustering first is the scale story: pairwise cosine over a corpus is
O(n²); SemDeDup's observation is that semantic duplicates share a cluster,
so the pair join runs per-cluster — O(sum c_i²) where cluster sizes are
bounded by growing k with n (k ~ n/const keeps cells constant). The pair
join here is a self-join ON the cluster key (one shuffle co-locating each
cluster), cosines are codegen ``zip_with``+``aggregate`` over the two
array columns — no position explode, no Python. Centroid cosines reuse
one broadcast of the k x dims centroid relation.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..canon.cc import connected_components
from ..link.kmeans import kmeans_assignments

__all__ = ["semdedup"]


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _cosine(a: Column, b: Column) -> Column:
    return _dot(a, b) / (F.sqrt(_dot(a, a)) * F.sqrt(_dot(b, b)))


def semdedup(
    emb: DataFrame,
    k: int = 4,
    iters: int = 2,
    threshold: float = 0.6,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_cluster_size: int | None = 100_000,
) -> DataFrame:
    """-> (id_col, cluster, group_id, cos_centroid, keep): every vector
    with its cluster, its duplicate group (min member id; singletons map
    to themselves), its cosine to the cluster centroid (round-6), and
    keep=1 for the group representative (lowest cos_centroid, id ties).

    ``max_cluster_size`` (r6 scale guard): the within-cluster pair join is
    O(sum c_i^2) — the paper's contract is that k grows with n so cells
    stay constant-sized, but nothing used to enforce it: ``k=4`` on a 10^9
    corpus meant one ~2.5*10^8-row cell and ~3*10^16 candidate pairs. The
    guard joins the (k-row, broadcast) post-assignment cluster sizes under
    the pair join and fails the JOB with the required-k message the moment
    any cell exceeds the bound — lazily, inside the plan, so the function
    stays action-free and a compliant run pays one broadcast of k rows.
    ``None`` disables (exact pre-guard behavior)."""
    assign = kmeans_assignments(emb, k=k, iters=iters, id_col=id_col, vec_col=vec_col)
    e = emb.select(id_col, vec_col).join(assign, id_col)
    if max_cluster_size is not None:
        sizes = assign.groupBy("cluster").agg(F.count(F.lit(1)).alias("_csize"))
        guard = F.when(
            F.col("_csize") > F.lit(int(max_cluster_size)),
            F.raise_error(
                F.format_string(
                    "semdedup: cluster %d has %d members > max_cluster_size "
                    f"{int(max_cluster_size)}; the within-cluster pair join is "
                    "O(c^2) — increase k so that every cell fits (k >= "
                    "ceil(n / max_cluster_size)), or raise/disable "
                    "max_cluster_size explicitly",
                    F.col("cluster"),
                    F.col("_csize"),
                )
            ),
        ).otherwise(F.lit(1))
        e = (
            e.join(F.broadcast(sizes), "cluster")
            .where(guard == 1)
            .drop("_csize")
        )

    # centroid = mean of members (the post-assignment half-step; the SQL
    # twin replays the same definition)
    cpos = (
        e.select(
            "cluster", F.posexplode(F.col(vec_col)).alias("pos", "v")
        )
        .groupBy("cluster", "pos")
        .agg(F.avg(F.col("v").cast("double")).alias("c"))
    )
    cent = cpos.groupBy("cluster").agg(
        F.array_sort(
            F.collect_list(F.struct(F.col("pos"), F.col("c")))
        ).alias("_pc")
    ).select(
        "cluster", F.transform("_pc", lambda s: s.getField("c")).alias("_cvec")
    )
    scored = e.join(F.broadcast(cent), "cluster").select(
        id_col,
        "cluster",
        vec_col,
        F.round(_cosine(F.col(vec_col), F.col("_cvec")), 6).alias("cos_centroid"),
    )

    a = scored.select(
        F.col("cluster"), F.col(id_col).alias("_ida"), F.col(vec_col).alias("_va")
    )
    b = scored.select(
        F.col("cluster"), F.col(id_col).alias("_idb"), F.col(vec_col).alias("_vb")
    )
    pairs = (
        a.join(b, "cluster")
        .where(F.col("_ida") < F.col("_idb"))
        .where(F.round(_cosine(F.col("_va"), F.col("_vb")), 6) >= threshold)
        .select(F.col("_ida").alias("src"), F.col("_idb").alias("dst"))
    )
    comp = connected_components(pairs)  # (node, component) — paired nodes only

    out = scored.join(
        comp.select(F.col("node").alias(id_col), F.col("component").alias("group_id")),
        id_col,
        "left",
    ).withColumn("group_id", F.coalesce("group_id", F.col(id_col)))
    w = Window.partitionBy("group_id").orderBy(
        F.asc("cos_centroid"), F.asc(id_col)
    )
    return out.select(
        id_col,
        "cluster",
        "group_id",
        "cos_centroid",
        (F.row_number().over(w) == 1).cast("int").alias("keep"),
    )
