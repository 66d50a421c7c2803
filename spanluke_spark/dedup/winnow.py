"""Winnowing fingerprints (Schleimer, Wilkerson & Aiken, SIGMOD 2003 —
the MOSS algorithm): local document fingerprinting with a GUARANTEE the
other dedup sketches here don't give — any shared substring of length
>= w + k - 1 between two documents is caught by at least one shared
fingerprint (MinHash/SimHash are whole-document resemblance sketches;
winnowing localizes).

The selection rule, exactly as published: hash every char k-gram, slide
a window of w consecutive hashes, record the window minimum, breaking
ties by the RIGHTMOST position (rule 2 of the paper — it minimizes new
selections as the window slides). Expected density 2/(w+1). Documents
shorter than one full window select the minimum of the grams they have.

Scale shape: the whole computation is array higher-order functions in
ONE projection — grams, windows, and argmin selection all happen inside
the row, so document text NEVER shuffles (the q64 substring-dedup
discipline); only the tiny (doc_id, pos, fp) fingerprint rows leave the
stage. O(m*w) comparisons per document, w is a small constant. The gram
hash is the portable 60-bit md5 (dedup/dedup.py:33), so the DuckDB
oracle replays every selection bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["winnow_fingerprints", "winnow_pairs"]

_LONG_MAX = 9223372036854775807


def _gram_hash_sql(text: str, k: int) -> str:
    return (
        f"CAST(conv(substring(md5(substring({text}, i + 1, {k})), 1, 15),"
        " 16, 10) AS BIGINT)"
    )


def winnow_fingerprints(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 5,
    w: int = 4,
) -> DataFrame:
    """(id, pos, fp): the winnowed fingerprint set of each document —
    pos is the 0-based char position of the selected k-gram, fp its
    portable hash. Documents shorter than k chars yield no rows."""
    grams = F.expr(
        f"CASE WHEN length({text_col}) >= {k} THEN"
        f" transform(sequence(0, length({text_col}) - {k}),"
        f" i -> {_gram_hash_sql(text_col, k)})"
        " ELSE array() END"
    )
    # rightmost-min argmin over each window [greatest(0, p-w+1) .. p]:
    # <= in the fold prefers the later index (paper tie rule 2).
    sel = F.expr(
        "CASE WHEN size(_g) > 0 THEN transform("
        f" sequence(least({w}, size(_g)) - 1, size(_g) - 1),"
        f" p -> aggregate(sequence(greatest(0, p - {w} + 1), p),"
        f"   named_struct('h', CAST({_LONG_MAX} AS BIGINT),"
        "    'j', CAST(-1 AS BIGINT)),"
        "   (acc, j) -> IF(_g[j] <= acc.h,"
        "     named_struct('h', _g[j], 'j', CAST(j AS BIGINT)), acc)))"
        " ELSE array() END"
    )
    return (
        df.select(F.col(id_col).alias("id"), F.col(text_col).alias(text_col))
        .withColumn("_g", grams)
        .select("id", F.explode(sel).alias("_s"))
        .select(
            F.col("id").alias(id_col),
            F.col("_s.j").alias("pos"),
            F.col("_s.h").alias("fp"),
        )
        .distinct()
    )


def winnow_pairs(
    fps: DataFrame,
    id_col: str = "doc_id",
    min_shared: int = 2,
) -> DataFrame:
    """fingerprints -> candidate near-duplicate pairs (id_a, id_b,
    n_shared): equi-join on the fingerprint VALUE (positions differ when
    the shared chunk moved — that's the point of local fingerprints).
    Same banded-join discipline as the LSH candidate generators: only
    ids travel through the join; callers verify candidates on text."""
    a = fps.select(F.col(id_col).alias("id_a"), F.col("fp").alias("fp")).distinct()
    b = fps.select(F.col(id_col).alias("id_b"), F.col("fp").alias("fp")).distinct()
    return (
        a.join(b, "fp")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
    )


def containment_pairs(
    docs: DataFrame,
    pairs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 5,
) -> DataFrame:
    """Exact k-gram CONTAINMENT for candidate pairs — the asymmetric
    near-dup measure (Broder 1997's containment, the quote-inclusion
    detector): C(A in B) = |S_A ∩ S_B| / |S_A| over distinct char
    k-gram sets. Jaccard dilutes when a small document is embedded in a
    large one (the syndication/quotation case); containment reads 1.0.

    pairs(id_a, id_b) is a CANDIDATE set (winnow_pairs, LSH buckets —
    never all-pairs); shingle sets are joined pair-scoped, so the work
    is sum over candidate pairs of |S_A| — candidate-linear, exactly
    the verify discipline of dedup/dedup.py's LSH path.

    Returns (id_a, id_b, inter, size_a, size_b, containment_a_in_b,
    containment_b_in_a), containments rounded 1e-6.
    """
    sh = docs.select(
        F.col(id_col).alias("id"),
        F.explode(
            F.expr(
                f"CASE WHEN length({text_col}) >= {k} THEN"
                f" transform(sequence(0, length({text_col}) - {k}),"
                f" i -> substring({text_col}, i + 1, {k}))"
                " ELSE array() END"
            )
        ).alias("sh"),
    ).distinct()
    sizes = sh.groupBy("id").agg(F.count(F.lit(1)).alias("sz"))
    p = pairs.select("id_a", "id_b")
    inter = (
        p.join(sh.select(F.col("id").alias("id_a"), "sh"), "id_a")
        .join(sh.select(F.col("id").alias("id_b"), "sh"), ["id_b", "sh"])
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    return (
        p.join(inter, ["id_a", "id_b"], "left")
        .join(sizes.select(F.col("id").alias("id_a"), F.col("sz").alias("size_a")), "id_a")
        .join(sizes.select(F.col("id").alias("id_b"), F.col("sz").alias("size_b")), "id_b")
        .select(
            "id_a",
            "id_b",
            F.coalesce("inter", F.lit(0)).alias("inter"),
            "size_a",
            "size_b",
            F.round(
                F.coalesce("inter", F.lit(0)) / F.col("size_a"), 6
            ).alias("containment_a_in_b"),
            F.round(
                F.coalesce("inter", F.lit(0)) / F.col("size_b"), 6
            ).alias("containment_b_in_a"),
        )
    )
