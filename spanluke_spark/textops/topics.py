"""PLSA topic decomposition (Hofmann 1999) by fixed-point EM — the
corpus-structure op of a training-data pipeline: decompose the document
stream into K latent topics for mixture balancing (textops/mixture.py
weights by OBSERVED source; this learns the LATENT grouping), domain
drift monitoring, and per-topic sampling quotas.

Relational EM with the K topics FOLDED INTO COLUMNS (no explode, no
K-times blowup of the nnz relation): per round the E-step is the counts
relation joined to p(z|d) on doc (hash join, co-partitioned by doc) and
to p(w|z) on word (broadcast — the vocab-side factor is K columns by V
rows), responsibilities computed row-locally; the M-step is one agg by
doc and one agg by word plus a 1-row topic-total broadcast. Two
shuffles per round regardless of K, lineage truncated per round
(localCheckpoint — the IPF raking lesson: a twice-referenced lazy
relation doubles the plan per round).

Bit-reproducibility discipline: E-step responsibilities are QUANTIZED
to integers (round(n * share * 2^20)) before aggregation, so every
cross-row sum is exact in any order — the EM trajectory is then
bit-identical between Spark and the DuckDB oracle, because all float
arithmetic is row-local over identical operands. M-step estimates are
Laplace-smoothed (+1 per cell) so no probability ever hits zero (a
zero p(w|z) row for every topic would make an E-step denominator 0).
Init is hash-deterministic: integer masses 1 + h(key:z) % 7.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..dedup.dedup import portable_hash64

__all__ = ["plsa_topics"]


def _init_mass(key: Column, z: int) -> Column:
    return 1 + portable_hash64(F.concat(key.cast("string"), F.lit(f":{z}"))) % 7


def plsa_topics(
    counts: DataFrame,
    doc_col: str = "d",
    word_col: str = "w",
    count_col: str = "n",
    k: int = 3,
    rounds: int = 4,
    quant: int = 1 << 20,
) -> tuple[DataFrame, DataFrame]:
    """counts = (doc, word, n) term frequencies ->
    (pwz, pzd): p(word|topic) as (w, q1..qK) with sum_w q_z = 1, and
    p(topic|doc) as (d, p1..pK) with row sums 1. Deterministic: hash
    init, fixed rounds, integer-quantized responsibilities."""
    ks = list(range(1, k + 1))
    c = counts.select(
        F.col(doc_col).alias("d"),
        F.col(word_col).alias("w"),
        F.col(count_col).cast("long").alias("n"),
    ).localCheckpoint(eager=True)

    pzd = c.select("d").distinct().select(
        "d", *[_init_mass(F.col("d"), z).alias(f"m{z}") for z in ks]
    )
    tot = sum(F.col(f"m{z}") for z in ks)
    pzd = pzd.select(
        "d", *[(F.col(f"m{z}") / tot).alias(f"p{z}") for z in ks]
    ).localCheckpoint(eager=True)

    wm = c.select("w").distinct().select(
        "w", *[_init_mass(F.col("w"), z).alias(f"m{z}") for z in ks]
    )
    wt = wm.agg(*[F.sum(f"m{z}").alias(f"t{z}") for z in ks])
    pwz = (
        wm.crossJoin(F.broadcast(wt))
        .select("w", *[(F.col(f"m{z}") / F.col(f"t{z}")).alias(f"q{z}") for z in ks])
        .localCheckpoint(eager=True)
    )

    for _ in range(rounds):
        joined = c.join(pzd, "d").join(F.broadcast(pwz), "w")
        prod = [F.col(f"p{z}") * F.col(f"q{z}") for z in ks]
        denom = sum(prod)
        ew = joined.select(
            "d",
            "w",
            *[
                F.round(F.col("n") * (prod[i] / denom) * quant)
                .cast("long")
                .alias(f"a{z}")
                for i, z in enumerate(ks)
            ],
        )
        dm = ew.groupBy("d").agg(*[F.sum(f"a{z}").alias(f"s{z}") for z in ks])
        dtot = sum(F.col(f"s{z}") + 1 for z in ks)
        pzd = dm.select(
            "d", *[((F.col(f"s{z}") + 1) / dtot).alias(f"p{z}") for z in ks]
        ).localCheckpoint(eager=True)

        wmass = ew.groupBy("w").agg(*[F.sum(f"a{z}").alias(f"s{z}") for z in ks])
        wtot = wmass.agg(
            *[(F.sum(f"s{z}") + F.count(F.lit(1))).alias(f"t{z}") for z in ks]
        )
        pwz = (
            wmass.crossJoin(F.broadcast(wtot))
            .select(
                "w",
                *[((F.col(f"s{z}") + 1) / F.col(f"t{z}")).alias(f"q{z}") for z in ks],
            )
            .localCheckpoint(eager=True)
        )
    return pwz, pzd
