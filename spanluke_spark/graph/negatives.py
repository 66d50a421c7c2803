"""Filtered negative sampling for KG-embedding training data (the
corruption step of TransE-family training, Bordes et al. NeurIPS 2013):
for each true triple emit ``n_neg`` corrupted copies whose object is
swapped for another entity, then FILTER out corruptions that happen to
be true facts elsewhere in the graph (the standard "filtered" setting —
unfiltered negatives teach the model that true facts are false).

Everything is deterministic and hash-driven (no rand(), so resumable
partitions re-emit identical negatives) and scale-shaped:

* the entity universe gets a dense per-bucket index: hash-bucket into
  ``n_buckets`` fixed buckets, row_number INSIDE each bucket — every
  window partition is |E| / n_buckets, never global;
* each corruption picks (bucket, index) from a 60-bit md5-derived hash
  of (subj, pred, obj, k, salt) — the portable hash whose DuckDB twin is
  ``('0x' || substr(md5(s), 1, 15))::BIGINT``, so the oracle replays the
  exact pick;
* the replacement lands via one equi-join on (bucket, idx) against the
  indexed entity table and one broadcastable join for bucket sizes;
  the final filter is a left_anti against the true-triple set on the
  corrupted key — all linear, no driver loops.

Sampling is uniform within each bucket and proportional to bucket
population across buckets — i.e. uniform over entities up to hash
balance (buckets are md5-balanced, so skew is O(sqrt(|E|/B)) relative).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..dedup.dedup import portable_hash64


def corrupt_triples(
    triples: DataFrame,
    n_neg: int = 2,
    salt: str = "neg",
    n_buckets: int = 64,
) -> DataFrame:
    """triples(subj, pred, obj) -> (subj, pred, obj_neg, k) filtered
    negatives: k in [0, n_neg) indexes the corruption attempt. Attempts
    that draw the original object or a true fact are dropped (filtered
    setting), so a triple can yield fewer than ``n_neg`` rows.
    """
    t = triples.select("subj", "pred", "obj").distinct()

    entities = (
        t.select(F.col("subj").alias("entity"))
        .unionByName(t.select(F.col("obj").alias("entity")))
        .distinct()
        .withColumn("bucket", portable_hash64(F.col("entity")) % n_buckets)
    )
    w = Window.partitionBy("bucket").orderBy("entity")
    indexed = entities.withColumn("idx", F.row_number().over(w) - 1)
    # the draw must range over POPULATED buckets only (with few entities
    # most of the n_buckets hash range is empty and a draw into an empty
    # bucket would silently vanish in the inner join) — dense-rank the
    # populated buckets; sizes has <= n_buckets rows, so the global
    # window and the broadcasts are O(n_buckets), a constant
    sizes = (
        indexed.groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .withColumn(
            "brank", F.row_number().over(Window.orderBy("bucket")) - 1
        )
    )
    npop = sizes.agg(F.count(F.lit(1)).alias("n_pop"))

    attempts = t.select(
        "subj",
        "pred",
        "obj",
        F.explode(
            F.array(*[F.lit(k) for k in range(n_neg)])
        ).alias("k"),
    ).withColumn(
        "h",
        portable_hash64(
            F.concat_ws("|", "subj", "pred", "obj", "k", F.lit(salt))
        ),
    )
    # h is 60-bit: / would route through double (53-bit mantissa) and
    # corrupt the pick — `div` stays in exact long arithmetic
    placed = (
        attempts.crossJoin(F.broadcast(npop))
        .withColumn("brank", F.col("h") % F.col("n_pop"))
        .join(F.broadcast(sizes), "brank")
        .withColumn(
            "idx", F.expr(f"h div {int(n_buckets)}") % F.col("cnt")
        )
    )

    drawn = placed.join(indexed, ["bucket", "idx"]).select(
        "subj", "pred", "obj", "k", F.col("entity").alias("obj_neg")
    )
    candidates = drawn.where(F.col("obj_neg") != F.col("obj")).select(
        "subj", "pred", F.col("obj_neg"), "k"
    )
    true_facts = t.select(
        "subj", "pred", F.col("obj").alias("obj_neg")
    )
    return candidates.join(
        true_facts, ["subj", "pred", "obj_neg"], "left_anti"
    )
