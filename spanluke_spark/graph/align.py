"""Instance-based ontology/schema alignment (PARIS, Suchanek et al. 2011;
instance-level matchers in the Rahm–Bernstein schema-matching survey):
when two KGs extracted from different sources must be merged, classes are
aligned by the overlap of their INSTANCE sets — two classes denote the
same concept if they contain largely the same things, whatever they are
named.

Input: two (class, instance) extent relations. Output: mutual-best
alignments by Jaccard overlap.

Scale shape: the pair overlap is an inverted-index join ON THE INSTANCE
key — only co-occurring class pairs are ever materialized, never the
class-pair cross product. Extent sizes are one aggregate each; Jaccard,
per-direction top-1 windows, and the mutual join all run on the pair
relation, which is bounded by sum-of-instance-degrees. A promiscuous
instance that belongs to thousands of classes on both sides would inflate
the pair join quadratically — ``max_df`` drops instances shared by more
than that many classes per side (the IDF argument: ubiquitous members
carry no alignment signal), exactly like dedup.ngram_jaccard_pairs caps
stop-shingles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["align_classes"]


def align_classes(
    extents_a: DataFrame,
    extents_b: DataFrame,
    class_col: str = "cls",
    instance_col: str = "inst",
    min_jaccard: float = 0.0,
    max_df: int | None = None,
) -> DataFrame:
    """extents_* = (class_col, instance_col) membership relations.
    -> (class_a, class_b, n_a, n_b, n_common, jaccard) for MUTUAL top-1
    pairs with jaccard >= min_jaccard (round-6 ranking, class tie-break)."""
    a = extents_a.select(
        F.col(class_col).alias("class_a"), F.col(instance_col).alias("_i")
    ).distinct()
    b = extents_b.select(
        F.col(class_col).alias("class_b"), F.col(instance_col).alias("_i")
    ).distinct()
    if max_df is not None:
        cap_a = a.groupBy("_i").agg(F.count("*").alias("_df")).where(
            F.col("_df") <= max_df
        )
        cap_b = b.groupBy("_i").agg(F.count("*").alias("_df")).where(
            F.col("_df") <= max_df
        )
        a = a.join(cap_a.select("_i"), "_i", "left_semi")
        b = b.join(cap_b.select("_i"), "_i", "left_semi")

    na = a.groupBy("class_a").agg(F.count("*").alias("n_a"))
    nb = b.groupBy("class_b").agg(F.count("*").alias("n_b"))
    inter = (
        a.join(b, "_i")
        .groupBy("class_a", "class_b")
        .agg(F.count("*").alias("n_common"))
    )
    pairs = (
        inter.join(na, "class_a")
        .join(nb, "class_b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("n_common")
                / (F.col("n_a") + F.col("n_b") - F.col("n_common")),
                6,
            ),
        )
        .where(F.col("jaccard") >= min_jaccard)
    )
    wa = Window.partitionBy("class_a").orderBy(
        F.desc("jaccard"), F.asc("class_b")
    )
    wb = Window.partitionBy("class_b").orderBy(
        F.desc("jaccard"), F.asc("class_a")
    )
    best = (
        pairs.withColumn("_ra", F.row_number().over(wa))
        .withColumn("_rb", F.row_number().over(wb))
        .where((F.col("_ra") == 1) & (F.col("_rb") == 1))
    )
    return best.select("class_a", "class_b", "n_a", "n_b", "n_common", "jaccard")
