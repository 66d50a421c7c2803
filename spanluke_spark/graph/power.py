"""Shapley-Shubik and Banzhaf voting-power indices for a bounded
player set (Shapley & Shubik 1954; Banzhaf 1965) — "which sources
actually control the vote?" for the engine's majority-style fusion
lanes (truth discovery q90, Copeland fusion q269, consensus q236):
a source's WEIGHT share is not its POWER share (a 49/49/2 split gives
the 2 as much power as each 49), and the power indices are the audit
number for source-dominance in weighted voting.

Exact combinatorics, no sampling: all 2^n coalitions are enumerated
relationally (n <= MAX_PLAYERS = 16 — the indices are only defined /
interesting for a bounded panel; 16! and all subset sums fit a long).

  swing(i, S): i not in S, w(S) < quota <= w(S) + w_i
  banzhaf_num(i) = #swings(i),              banzhaf_den = 2^(n-1)
  shapley_num(i) = sum over swings |S|! (n-1-|S|)!,  shapley_den = n!

Distributed shape: a range(2^n) mask relation crossJoined with the
broadcast n-row player dim; membership by shiftright(mask, idx) % 2;
one groupBy(mask) for coalition weight+size; one more agg per player.
Work is 2^n * n rows — independent of any corpus, a driver-bounded
fixture computation by design (the PLAYERS come from a corpus-scale
agg; the power solve itself is panel-sized). Factorials are native
HOF products with the sequence(1,0) descending-edge guard (s = 0 -> 1,
the q290 lesson).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

__all__ = ["voting_power", "MAX_PLAYERS"]

MAX_PLAYERS = 16


def _fact(col: str) -> F.Column:
    # native-HOF factorial; sequence(1, 0) would generate [1, 0]
    # DESCENDING, so guard the empty product explicitly
    return F.when(F.col(col) <= 0, F.lit(1).cast("long")).otherwise(
        F.expr(
            f"aggregate(sequence(1, {col}), cast(1 as bigint),"
            " (a, x) -> a * x)"
        )
    )


def voting_power(
    players: DataFrame,
    id_col: str = "id",
    weight_col: str = "w",
    quota: int | None = None,
) -> DataFrame:
    """players (id, w) with n <= 16 rows -> per player:
    (id, w, quota, bz_num, bz_den, ss_num, ss_den, bz_ppm, ss_ppm).
    Default quota = strict majority (total div 2 + 1). Dummy players
    (never a swing) get exact zeros."""
    spark = players.sparkSession
    rows = players.select(
        F.col(id_col).alias("id"), F.col(weight_col).cast("long").alias("w")
    )
    n = rows.count()
    if n == 0 or n > MAX_PLAYERS:
        raise ValueError(f"voting_power needs 1..{MAX_PLAYERS} players, got {n}")
    if quota is None:
        total = rows.agg(F.sum("w")).collect()[0][0]
        quota = total // 2 + 1
    dim = rows.withColumn(
        "idx",
        F.row_number().over(Window.orderBy(F.col("id").asc())) - 1,
    )
    masks = spark.range(0, 2**n).select(F.col("id").alias("mask"))
    member = masks.join(
        F.broadcast(dim),
        F.expr("shiftright(mask, idx) % 2 = 1"),
    )
    # empty coalition has no member rows -> restore it via left join
    mw = masks.join(
        member.groupBy("mask").agg(
            F.sum("w").alias("sw"), F.count(F.lit(1)).alias("sz")
        ),
        "mask",
        "left",
    ).select(
        "mask",
        F.coalesce(F.col("sw"), F.lit(0)).alias("sw"),
        F.coalesce(F.col("sz"), F.lit(0)).cast("int").alias("sz"),
    )
    swings = (
        mw.join(
            F.broadcast(dim), F.expr("shiftright(mask, idx) % 2 = 0")
        )
        .where(
            (F.col("sw") < F.lit(quota))
            & (F.col("sw") + F.col("w") >= F.lit(quota))
        )
        .withColumn("n1s", F.lit(n - 1) - F.col("sz"))
        .withColumn("perms", _fact("sz") * _fact("n1s"))
        .groupBy("id")
        .agg(
            F.count(F.lit(1)).alias("bz_num"),
            F.sum("perms").alias("ss_num"),
        )
    )
    n_fact = 1
    for i in range(2, n + 1):
        n_fact *= i
    out = (
        dim.join(swings, "id", "left")
        .select(
            "id",
            "w",
            F.lit(quota).cast("long").alias("quota"),
            F.coalesce(F.col("bz_num"), F.lit(0)).cast("long").alias("bz_num"),
            F.lit(2 ** (n - 1)).cast("long").alias("bz_den"),
            F.coalesce(F.col("ss_num"), F.lit(0)).cast("long").alias("ss_num"),
            F.lit(n_fact).cast("long").alias("ss_den"),
        )
    )
    return out.withColumn(
        "bz_ppm", F.expr("bz_num * 1000000 div bz_den")
    ).withColumn("ss_ppm", F.expr("ss_num * 1000000 div ss_den"))
