"""Knowledge-graph-embedding link-prediction evaluation (TransE protocol,
Bordes et al. 2013, "Translating Embeddings for Modeling Multi-relational
Data"): for each test triple (s, r, o), score every entity as a candidate
tail by ||e_s + e_r - e_c||_1 and report the FILTERED rank of the true
tail — the standard MRR / Hits@k harness every KG-embedding pipeline runs
after training.

Engine-portable scoring: embeddings are quantized to fixed-point longs
(round(x * scale), the q119/q120 trick) BEFORE any arithmetic, so the L1
distance is an integer sum — associative, order-free, and bit-identical in
any engine. Ranks (and therefore MRR/Hits@k) can never flip on float
summation order.

Scale shape: the test set is the small side and is BROADCAST onto the
entity table — the candidate relation is one pass over entities per test
batch (|test| × |E| rows streamed through a codegen'd zip_with/aggregate,
never materialized); the filter against known-true triples is an equi
anti-join keyed on (s, r, candidate); the rank is a map-side-combinable
count. At 10^8 entities you shard the test set and sweep entity blocks —
the same plan, batched; nothing here is quadratic in the CORPUS, only in
|test| × |E| which is the protocol's own cost.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["quantize_vec", "transe_filtered_ranks", "ranking_metrics"]


def quantize_vec(vec: Column, scale: int = 1000) -> Column:
    """array<float> -> array<long> fixed-point (round(x * scale))."""
    return F.transform(
        vec, lambda x: F.round(x.cast("double") * scale).cast("long")
    )


def _l1(a: Column, b: Column, c: Column) -> Column:
    """sum_i |a_i + b_i - c_i| over equal-length long arrays — exact."""
    return F.aggregate(
        F.zip_with(F.zip_with(a, b, lambda x, y: x + y), c, lambda xy, z: xy - z),
        F.lit(0).cast("long"),
        lambda acc, d: acc + F.abs(d),
    )


def transe_filtered_ranks(
    entities: DataFrame,
    relations: DataFrame,
    test: DataFrame,
    truth: DataFrame,
    scale: int = 1000,
) -> DataFrame:
    """-> (s, rel, o, rank): filtered tail rank per test triple.

    ``entities`` = (entity_id, vec), ``relations`` = (rel, vec),
    ``test``/``truth`` = (s, rel, o). rank = 1 + #{candidates strictly
    closer, or equally close with a smaller id, after removing candidates
    that form a KNOWN-true triple (s, rel, c) from ``truth``}. The true
    tail never counts against itself under this rule, so test ⊆ truth is
    safe (and is the standard protocol).
    """
    ent_q = entities.select(
        F.col("entity_id"), quantize_vec(F.col("vec"), scale).alias("qv")
    )
    rel_q = relations.select(
        F.col("rel"), quantize_vec(F.col("vec"), scale).alias("qr")
    )

    scored_test = (
        test.join(ent_q.withColumnRenamed("entity_id", "s"), "s")
        .withColumnRenamed("qv", "qs")
        .join(rel_q, "rel")
        .join(ent_q.withColumnRenamed("entity_id", "o"), "o")
        .withColumnRenamed("qv", "qo")
        .withColumn("d_true", _l1(F.col("qs"), F.col("qr"), F.col("qo")))
        .select("s", "rel", "o", "qs", "qr", "d_true")
    )

    cand = (
        ent_q.withColumnRenamed("entity_id", "cand")
        .withColumnRenamed("qv", "qc")
        # test side broadcast: entities (the 10^8-row side) never shuffle
        .crossJoin(F.broadcast(scored_test))
        .withColumn("d_cand", _l1(F.col("qs"), F.col("qr"), F.col("qc")))
        # filtered protocol: drop candidates that are themselves true
        .join(
            truth.select(
                F.col("s"), F.col("rel"), F.col("o").alias("cand")
            ).distinct(),
            ["s", "rel", "cand"],
            "left_anti",
        )
    )

    better = (F.col("d_cand") < F.col("d_true")) | (
        (F.col("d_cand") == F.col("d_true")) & (F.col("cand") < F.col("o"))
    )
    return (
        cand.groupBy("s", "rel", "o")
        .agg((F.lit(1) + F.sum(better.cast("long"))).alias("rank"))
        .select("s", "rel", "o", "rank")
    )


def ranking_metrics(ranks: DataFrame, by_rel: bool = True) -> DataFrame:
    """(s, rel, o, rank) -> per-relation (or overall) MRR and Hits@{1,3,10}."""
    keys = ["rel"] if by_rel else []
    return ranks.groupBy(*keys).agg(
        F.count("*").alias("n_test"),
        F.round(F.avg(1.0 / F.col("rank")), 6).alias("mrr"),
        F.round(F.avg((F.col("rank") <= 1).cast("double")), 6).alias("hits1"),
        F.round(F.avg((F.col("rank") <= 3).cast("double")), 6).alias("hits3"),
        F.round(F.avg((F.col("rank") <= 10).cast("double")), 6).alias("hits10"),
    )
