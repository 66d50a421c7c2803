"""Crawl-source selection as a best-arm-identification bandit —
successive elimination (Even-Dar, Mannor & Mansour 2002) in uniform
exploration rounds: every surviving source gets its next batch of
pulls, then any source whose upper bound falls below the leader's
lower bound stops being crawled. The BATCHED bandit is the one that is
actually distributed: per round ONE aggregate over the new batch per
arm (map-side combinable), then the elimination test runs on the
#arms-row summary — unlike UCB1's one-pull-at-a-time loop, which is
driver-sequential by definition.

Exact-integer elimination contract (no floats anywhere): rewards are
integers (permille quality), so cumulative (s, n) are exact. Means are
quantized to exact ppm-of-unit-quality integers m = (s * 1000) div n
(permille rewards x 1000 = ppm; quantization error < 1 ppm, absorbed
into alpha); arm a is eliminated by leader b
when

    m_b - m_a > 2 * alpha / sqrt(min(n_a, n_b))     [alpha in ppm]

evaluated as the equivalent integer predicate

    m_b - m_a > 0   AND   (m_b - m_a)^2 * min(n_a, n_b) > 4 * alpha^2

— the conservative min-n radius (2a/sqrt(min n) >= a/sqrt(n_a) +
a/sqrt(n_b), so every elimination the exact rule makes is safe under
this one too). int64 headroom: m <= 10^6 (permille rewards), so the
squared test stays within 2^63 to ~9*10^6 pulls per arm — no
sf-dependent overflow cliff. The leader is the max-mean surviving
arm, argmax by the finer integer key (s * 10^9) div n with
arm-ascending tie break — fully deterministic and cross-engine
replayable.

Eliminated arms stop accumulating pulls (their later batches are never
crawled): state is (arm, s, n, alive) and the recurrence is unrolled
by the oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["successive_elimination"]


def successive_elimination(
    pulls: DataFrame,
    rounds: int,
    alpha: int = 50000,
    arm_col: str = "arm",
    round_col: str = "round",
    reward_col: str = "reward",
) -> DataFrame:
    """pulls(arm, round, reward-int) -> one row per (round, arm) that
    was still alive ENTERING the round: (round, arm, n, s, mean_ppm,
    is_leader, eliminated). ``eliminated`` marks the arms killed by
    this round's test; they take no further pulls."""
    pulls = pulls.select(
        F.col(arm_col).alias("arm"),
        F.col(round_col).alias("round"),
        F.col(reward_col).cast("long").alias("reward"),
    )
    batches = (
        pulls.groupBy("arm", "round")
        .agg(F.count("*").alias("bn"), F.sum("reward").alias("bs"))
        .localCheckpoint(eager=True)
    )
    arms = batches.select("arm").distinct()
    state = arms.select(
        "arm",
        F.lit(0).cast("long").alias("n"),
        F.lit(0).cast("long").alias("s"),
    ).localCheckpoint(eager=True)
    out = None
    for r in range(rounds):
        b = batches.where(F.col("round") == r).select("arm", "bn", "bs")
        state = (
            state.join(b, "arm", "left")
            .select(
                "arm",
                (F.col("n") + F.coalesce("bn", F.lit(0))).alias("n"),
                (F.col("s") + F.coalesce("bs", F.lit(0))).alias("s"),
            )
            .where(F.col("n") > 0)
        )
        # exact int64 division (non-negative), == DuckDB's //
        key = F.expr("s * 1000000000L div n")
        w = Window.orderBy(F.desc("mean_key"), F.asc("arm"))
        scored = state.withColumn("mean_key", key).withColumn(
            "is_leader", F.row_number().over(w) == 1
        )
        scored = scored.withColumn(
            "mean_ppm", F.expr("s * 1000L div n")
        )
        leader = scored.where("is_leader").select(
            F.col("mean_ppm").alias("lm"), F.col("n").alias("ln")
        )
        gap = F.col("lm") - F.col("mean_ppm")
        test = (gap > 0) & (
            gap * gap * F.least("n", "ln") > F.lit(4 * alpha * alpha)
        )
        round_rows = (
            scored.crossJoin(F.broadcast(leader))
            .select(
                F.lit(r).alias("round"),
                "arm",
                "n",
                "s",
                "mean_ppm",
                "is_leader",
                (test & ~F.col("is_leader")).alias("eliminated"),
            )
            .localCheckpoint(eager=True)
        )
        out = round_rows if out is None else out.unionByName(round_rows)
        state = (
            round_rows.where(~F.col("eliminated"))
            .select("arm", "n", "s")
            .localCheckpoint(eager=True)
        )
    return out
