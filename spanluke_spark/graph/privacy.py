"""Graph re-identification risk — vertex-refinement signature
uniqueness (Hay et al., VLDB 2008; Liu & Terzi's k-degree anonymity):
publishing an "anonymized" interaction graph leaks identity through
STRUCTURE — an adversary who knows a target's degree (H1) or the
multiset of its neighbors' degrees (H2) re-identifies every node whose
signature class has size 1. The tabular audit (textops/privacy.py)
can't see this; the quasi-identifier here is the topology itself.

Shape: one degree aggregate; H2 signatures are each node's sorted
neighbor-degree list (one join of the symmetric edge list onto the
degree relation + one collect-per-node — the array is DEGREE-sized, so
``max_neighbors`` caps hub signatures: the truncated-sorted-prefix +
exact degree remains a deterministic, weaker-but-sound refinement:
truncation only MERGES classes, so flagged uniques are still unique);
class sizes by one aggregate per level, reported as a histogram
(class_size -> how many nodes), which is bounded by the class-size
range rather than the node count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["reidentification_risk"]


def reidentification_risk(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_neighbors: int = 64,
) -> DataFrame:
    """edges -> (level, class_size, n_classes, n_nodes): the anonymity
    histogram at H1 (degree) and H2 (degree + sorted neighbor degrees,
    capped). class_size 1 rows are the re-identifiable population."""
    e = edges.select(F.col(src).alias("u"), F.col(dst).alias("v")).filter(
        F.col("u") != F.col("v")
    )
    sym = e.unionByName(
        e.select(F.col("v").alias("u"), F.col("u").alias("v"))
    ).distinct()
    deg = sym.groupBy("u").agg(F.count(F.lit(1)).alias("d"))

    def _hist(classes: DataFrame, level: str) -> DataFrame:
        return (
            classes.groupBy("sig")
            .agg(F.count(F.lit(1)).alias("class_size"))
            .groupBy("class_size")
            .agg(F.count(F.lit(1)).alias("n_classes"))
            .select(
                F.lit(level).alias("level"),
                "class_size",
                "n_classes",
                (F.col("class_size") * F.col("n_classes")).alias(
                    "n_nodes"
                ),
            )
        )

    h1 = _hist(deg.select(F.col("d").cast("string").alias("sig")), "h1")
    nbr = (
        sym.join(deg.select(F.col("u").alias("v"), F.col("d").alias("dv")), "v")
        .groupBy("u")
        .agg(
            F.slice(
                F.sort_array(F.collect_list("dv")), 1, max_neighbors
            ).alias("nd")
        )
        .join(deg, "u")
        .select(
            F.concat_ws(
                "|",
                F.col("d").cast("string"),
                F.concat_ws(",", F.col("nd").cast("array<string>")),
            ).alias("sig")
        )
    )
    h2 = _hist(nbr, "h2")
    return h1.unionByName(h2)
