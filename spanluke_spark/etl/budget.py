"""Crawl-budget apportionment: split an integer fetch budget across hosts
proportionally to a quality/demand score so the quotas sum EXACTLY to the
budget — Hamilton's largest-remainder method (the apportionment scheme
with no population paradox inside a single allocation, used for exactly
this by crawl schedulers that must hand each fetcher an integer quota).

quota(h) = floor(B * s_h / S) + 1 for the hosts with the largest
fractional remainders (as many as needed to reach B), ties broken by host
id — fully deterministic, replayable in SQL.

Scale note: the only global ordering runs on the HOST AGGREGATE (one row
per host — 10^6-ish), not the page stream (10^12); the per-host score agg
is the usual map-side-combinable groupBy, and the budget total rides in
as a 1-row broadcast crossJoin (the tfidf.py pattern).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["apportion_budget", "divisor_apportionment"]


def apportion_budget(
    scores: DataFrame,
    total_budget: int,
    key: str = "host",
    score_col: str = "score",
) -> DataFrame:
    """(host, score) -> (host, quota): integer quotas summing to
    ``total_budget``. Scores must be non-negative with a positive sum;
    zero-score hosts can still receive a remainder seat only if every
    remainder above theirs is exhausted (standard Hamilton behavior)."""
    tot = scores.agg(F.sum(score_col).alias("_tot"))
    ideal = (
        scores.select(F.col(key).alias("host"), F.col(score_col).alias("score"))
        .crossJoin(F.broadcast(tot))
        .withColumn("ideal", F.lit(total_budget) * F.col("score") / F.col("_tot"))
        .withColumn("base", F.floor("ideal"))
        .withColumn("rem", F.col("ideal") - F.col("base"))
    )
    allocated = ideal.agg(F.sum("base").alias("_alloc"))
    w = Window.orderBy(F.col("rem").desc(), F.col("host"))
    return (
        ideal.crossJoin(F.broadcast(allocated))
        .withColumn("_rk", F.row_number().over(w))
        .withColumn(
            "quota",
            (
                F.col("base")
                + (F.col("_rk") <= F.lit(total_budget) - F.col("_alloc")).cast("long")
            ),
        )
        .select("host", "quota")
    )


def divisor_apportionment(
    scores: DataFrame,
    total_budget: int,
    key: str = "host",
    score_col: str = "score",
) -> DataFrame:
    """Highest-averages (divisor) apportionment, both classic divisor
    sequences at once (Gallagher 1992): D'Hondt (divisors 1, 2, 3,
    ... — favors large parties; used by most EU parliaments) and
    Sainte-Lague (1, 3, 5, ... — near-unbiased). The divisor-family
    companion of Hamilton's largest remainder (``apportion_budget``):
    divisor methods are house- and vote-monotone (no Alabama
    paradox), which matters when the crawl budget B changes between
    rounds and quotas must never move against a host's score.

    Each host generates B quotients score/d over its divisor
    sequence; the B largest quotients across all hosts win one seat
    each. Determinism: quotient ties break by (score DESC, host ASC,
    divisor ASC) — stated, replayed by the oracle. The quotient
    ordering is computed in doubles but is EXACT for the stated
    contract score <= ~10^9, B <= ~10^3: distinct rationals v1/d1 <>
    v2/d2 differ by >= 1/(d1*d2) >= 1/B^2 relative to v <= 1e9,
    ~1e-15-proof headroom over IEEE rounding of a correctly-rounded
    division; equal rationals round to the identical double.

    -> (host, score, seats_dhondt, seats_sainte_lague); each column
    sums exactly to ``total_budget`` (pytest-pinned), zero-score
    hosts get zero (their quotients are all 0 and lose every
    tie-break against positive scores).

    Scale shape: the quotient grid is hosts x B — dimension-sized
    (the page stream never appears); one global window per method
    over that grid."""
    if total_budget < 1:
        raise ValueError("total_budget must be >= 1")
    base = scores.select(
        F.col(key).alias("host"),
        F.col(score_col).cast("long").alias("score"),
    )
    ranks = F.explode(
        F.sequence(F.lit(1), F.lit(total_budget))
    ).alias("r")
    grid = base.select("host", "score", ranks)

    def seats(divisor_expr: str, alias: str) -> DataFrame:
        q = grid.select(
            "host",
            "score",
            F.col("r"),
            F.expr(f"cast(score as double) / ({divisor_expr})").alias(
                "quot"
            ),
        )
        w = Window.orderBy(
            F.col("quot").desc(),
            F.col("score").desc(),
            F.col("host").asc(),
            F.col("r").asc(),
        )
        won = q.withColumn("rk", F.row_number().over(w)).where(
            F.col("rk") <= total_budget
        )
        return won.groupBy("host").agg(
            F.count(F.lit(1)).cast("long").alias(alias)
        )

    dh = seats("r", "seats_dhondt")
    sl = seats("2 * r - 1", "seats_sainte_lague")
    return (
        base.join(dh, "host", "left")
        .join(sl, "host", "left")
        .select(
            "host",
            "score",
            F.coalesce(F.col("seats_dhondt"), F.lit(0).cast("long")).alias(
                "seats_dhondt"
            ),
            F.coalesce(
                F.col("seats_sainte_lague"), F.lit(0).cast("long")
            ).alias("seats_sainte_lague"),
        )
    )
