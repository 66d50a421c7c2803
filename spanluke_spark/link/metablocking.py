"""Meta-blocking for entity resolution (Papadakis et al., TKDE 2014):
turn cheap token blocks into a PRUNED candidate-pair set before the
expensive match step (link/fellegi.py, link/editdist.py).

At 10^12 mentions, naive token blocking emits O(sum block^2) pairs and
one stop-token ("inc", "llc", "the") block alone is quadratic death.
The standard two-stage defense, both relational here:

* block purging — drop blocks above a size cap (a token shared by
  100k entities has no discriminative power; this is the same
  hot-shingle cap dedup/ngram_jaccard_pairs uses), and singleton
  blocks (no pair can come from them);
* weighted node pruning (WNP) — weight every surviving candidate pair
  by how many blocks it co-occurs in (CBS: common blocks scheme), then
  keep a pair only if its weight reaches the mean weight of at least
  one endpoint's neighborhood. Redundancy IS evidence: true matches
  share many blocks, coincidental pairs share one.

The mean comparison is done in exact integer arithmetic
(w * n_pairs >= sum_w) so results are bit-stable across engines and
cluster sizes — no float summation-order drift.

Shapes: token explode -> size agg -> semi-join purge -> per-block
self-equi-join (bounded by the cap: <= cap-1 mates per row) -> pair
count agg -> two endpoint aggs + one join. Every join is an equi-join
on (token) or (id); nothing is ever all-pairs across blocks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def token_blocks(
    df: DataFrame,
    id_col: str = "id",
    text_col: str = "name",
    min_len: int = 2,
    max_block_size: int = 50,
) -> DataFrame:
    """-> (token, id): one row per (entity, distinct lowercase token),
    keeping only blocks with 2..max_block_size members. Tokens shorter
    than ``min_len`` are noise and dropped up front."""
    toks = df.select(
        F.col(id_col).alias("id"),
        F.explode(
            F.array_distinct(F.split(F.lower(F.col(text_col)), r"[^a-z0-9]+"))
        ).alias("token"),
    ).where(F.length("token") >= min_len)
    kept = (
        toks.groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
        .where((F.col("n") >= 2) & (F.col("n") <= max_block_size))
        .select("token")
    )
    return toks.join(kept, "token", "left_semi")


def metablock_pairs(
    df: DataFrame,
    id_col: str = "id",
    text_col: str = "name",
    min_len: int = 2,
    max_block_size: int = 50,
) -> DataFrame:
    """-> (id_a, id_b, weight): WNP-pruned candidate pairs, id_a < id_b,
    weight = CBS (number of purge-surviving blocks the pair shares). A
    pair survives when weight >= the mean pair-weight of EITHER
    endpoint's neighborhood (the classic keep-if-either-keeps rule)."""
    blocks = token_blocks(df, id_col, text_col, min_len, max_block_size)
    lhs = blocks.select("token", F.col("id").alias("id_a"))
    rhs = blocks.select("token", F.col("id").alias("id_b"))
    pairs = (
        lhs.join(rhs, "token")
        .where(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("weight"))
    )
    ends = pairs.select(F.col("id_a").alias("id"), "weight").unionByName(
        pairs.select(F.col("id_b").alias("id"), "weight")
    )
    stats = ends.groupBy("id").agg(
        F.sum("weight").alias("sum_w"), F.count(F.lit(1)).alias("n_w")
    )
    a_stats = stats.select(
        F.col("id").alias("id_a"),
        F.col("sum_w").alias("sum_a"),
        F.col("n_w").alias("n_a"),
    )
    b_stats = stats.select(
        F.col("id").alias("id_b"),
        F.col("sum_w").alias("sum_b"),
        F.col("n_w").alias("n_b"),
    )
    return (
        pairs.join(a_stats, "id_a")
        .join(b_stats, "id_b")
        # exact-integer mean test: w >= sum/n  <=>  w*n >= sum
        .where(
            (F.col("weight") * F.col("n_a") >= F.col("sum_a"))
            | (F.col("weight") * F.col("n_b") >= F.col("sum_b"))
        )
        .select("id_a", "id_b", "weight")
    )
