"""DBSCAN (Ester et al. 1996) over embedding vectors — density-based
clustering for the curation jobs centroid k-means mishandles: duplicate
constellations, template families, and "everything else is noise"
semantics (k-means forces every outlier into a cluster; DBSCAN labels it
noise, which is exactly what a near-dup/template detector wants).

Relational decomposition (the standard distributed DBSCAN shape):
  1. eps-neighbor pairs. Here an exact integer-quantized squared-L2
     self-join (round(x*scale) BIGINTs, so the eps test is an integer
     comparison — bit-identical in the oracle, no float-tie ambiguity).
     At crawl scale this stage swaps for the banded candidate
     generators (link/ann.lsh_threshold_pairs / dedup MinHash) exactly
     like every other pair pipeline in this repo — the downstream
     core/CC/border logic is generator-agnostic.
  2. core points: neighbor degree + 1 >= min_pts (one count agg).
  3. clusters: connected components over CORE-CORE pairs only
     (canon/cc.py alternating-star, skew-salted) — density-reachability
     restricted to cores is exactly CC of the core subgraph.
  4. border points: non-core with a core neighbor join to the SMALLEST
     adjacent core cluster id (textbook DBSCAN leaves this arbitrary;
     pinning min makes the output engine-independent).
  5. everything else: noise.

-> (id, role in {core, border, noise}, cluster — NULL for noise).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["dbscan"]


def dbscan(
    points: DataFrame,
    id_col: str = "id",
    vec_col: str = "vec",
    eps2: int = 400,
    min_pts: int = 6,
    scale: int = 64,
    d: int | None = None,
) -> DataFrame:
    """(id, vec: array<float>) -> (id, role, cluster). ``eps2`` is the
    squared-L2 threshold IN QUANTIZED UNITS ((x*scale) integers);
    ``min_pts`` counts the point itself, per the paper. ``d`` truncates
    vectors to the first d dims (None = full width)."""
    vec = F.col(vec_col) if d is None else F.slice(F.col(vec_col), 1, d)
    q = points.select(
        F.col(id_col).alias("id"),
        F.transform(
            vec, lambda x: F.round(x.cast("double") * scale).cast("long")
        ).alias("v"),
    ).localCheckpoint(eager=True)
    diff2 = lambda a, b: (a - b) * (a - b)  # noqa: E731
    pairs = (
        q.alias("a")
        .join(q.alias("b"), F.col("a.id") < F.col("b.id"))
        .select(
            F.col("a.id").alias("ia"),
            F.col("b.id").alias("ib"),
            F.aggregate(
                F.zip_with(F.col("a.v"), F.col("b.v"), diff2),
                F.lit(0).cast("long"),
                lambda acc, x: acc + x,
            ).alias("d2"),
        )
        .where(F.col("d2") <= eps2)
        .select("ia", "ib")
        .localCheckpoint(eager=True)
    )
    sym = pairs.unionByName(
        pairs.select(F.col("ib").alias("ia"), F.col("ia").alias("ib"))
    )
    deg = sym.groupBy(F.col("ia").alias("id")).agg(
        F.count(F.lit(1)).alias("_deg")
    )
    roles = q.join(deg, "id", "left").select(
        "id",
        F.when(F.coalesce(F.col("_deg"), F.lit(0)) + 1 >= min_pts, F.lit("core"))
        .otherwise(F.lit("none"))
        .alias("_r"),
    ).localCheckpoint(eager=True)
    cores = roles.where(F.col("_r") == "core").select("id")
    core_pairs = pairs.join(
        cores.withColumnRenamed("id", "ia"), "ia", "left_semi"
    ).join(cores.withColumnRenamed("id", "ib"), "ib", "left_semi")

    from ..canon.cc import connected_components

    comp = connected_components(core_pairs, src="ia", dst="ib")
    # isolated cores (no core neighbor) are their own cluster
    core_clusters = (
        cores.join(comp.withColumnRenamed("node", "id"), "id", "left")
        .select("id", F.coalesce(F.col("component"), F.col("id")).alias("cluster"))
        .localCheckpoint(eager=True)
    )
    border = (
        sym.withColumnRenamed("ia", "nid")
        .withColumnRenamed("ib", "id")
        .join(roles.where(F.col("_r") != "core").select("id"), "id", "left_semi")
        .join(
            core_clusters.select(
                F.col("id").alias("nid"), F.col("cluster")
            ),
            "nid",
        )
        .groupBy("id")
        .agg(F.min("cluster").alias("cluster"))
    )
    out_core = core_clusters.select(
        "id", F.lit("core").alias("role"), "cluster"
    )
    out_border = border.select("id", F.lit("border").alias("role"), "cluster")
    out_noise = (
        q.select("id")
        .join(out_core.select("id"), "id", "left_anti")
        .join(out_border.select("id"), "id", "left_anti")
        .select(
            "id", F.lit("noise").alias("role"), F.lit(None).cast("long").alias("cluster")
        )
    )
    return out_core.unionByName(out_border).unionByName(out_noise)
