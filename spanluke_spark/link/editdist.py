"""Edit-distance near-match join — the fuzzy-string verify lane of entity
canonicalization (complements canon/canonicalize.py's normalization-key
blocking): find every pair of names within Levenshtein distance d, without
the all-pairs cross join.

Candidate generation is LOSSLESS for the length dimension: |len(a) -
len(b)| <= d is necessary for distance <= d, so names are bucketed by
length and each bucket joins only its d-neighborhood of buckets (a band
join on the length key — 2d+1 bucket pairs per bucket, never |V|²).
Verification is the exact JVM levenshtein — no Python anywhere.

At 10^9 names the length-band join is the right first cut within a name
blocking key; for heavier workloads layer the q113 LSH planner's
character-shingle bands in front and keep this operator as the verifier.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["levenshtein_pairs"]


def levenshtein_pairs(
    names: DataFrame,
    d: int = 2,
    id_col: str = "id",
    name_col: str = "name",
) -> DataFrame:
    """(id, name) -> (id_a, id_b, name_a, name_b, dist): every unordered
    pair with Levenshtein distance <= d. Length-banded candidates, exact
    verification, integer decisions only."""
    n = names.select(
        F.col(id_col).alias("id"),
        F.col(name_col).alias("name"),
        F.length(name_col).alias("len"),
    )
    offsets = list(range(-d, d + 1))
    a = n.select(
        F.col("id").alias("id_a"),
        F.col("name").alias("name_a"),
        F.col("len").alias("len_a"),
    )
    b = n.select(
        F.col("id").alias("id_b"),
        F.col("name").alias("name_b"),
        F.col("len").alias("len_b"),
        F.explode(
            F.array(*[F.col("len") + o for o in offsets])
        ).alias("len_a"),
    )
    cands = a.join(b, ["len_a"]).where(F.col("id_a") < F.col("id_b"))
    dist = F.levenshtein(F.col("name_a"), F.col("name_b"))
    return (
        cands.withColumn("dist", dist)
        .where(F.col("dist") <= d)
        .select("id_a", "id_b", "name_a", "name_b", "dist")
    )
