"""Bradley-Terry preference aggregation — THE model behind
reward-model training data: given pairwise duels (annotator A/B
choices, model-arena votes, quality duels between crawl sources),
recover latent strengths pi_i with P(i beats j) = pi_i/(pi_i + pi_j)
(Bradley & Terry 1952), fitted by Hunter's (2004) MM iteration

    pi_i  <-  W_i / sum_{j != i} n_ij / (pi_i + pi_j)

W_i = total wins of i, n_ij = games between i and j.

Integer-quantized replay convention: strengths are ppm BIGINTs and
EVERY step is integer arithmetic — per-pair term
T_ij = (n_ij * 10^12) // (p_i + p_j), denominator S_i = sum_j T_ij
(exact integer sum), update p_i = (W_i * 10^12) // S_i, then one
normalization p_i = (p_i * K * 10^6) // sum(p) pinning total mass to
K * 10^6 (MM is scale-invariant; without the pin quantization drift
compounds). No floats anywhere, so the fixed-round result is
bit-identical across engines and the oracle simply unrolls the rounds.
int64 headroom: n_ij < 9 * 10^6 and K * 10^6 * max_p within 2^63 —
far beyond any fixture; stated contract at scale.

Standard MM caveat (documented, asserted by the fixture pytest): the
comparison graph must be connected and every item needs >= 1 win,
else strengths degenerate to 0 (exactly as in the unquantized MM).

Scale shape: duels aggregate once into the (i, j, n_ij) pair table
(map-side combinable); each round is two joins of the PAIR table
against the #items-row strength state plus one items aggregate — the
raw duel log is never re-scanned.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["bradley_terry"]


def bradley_terry(
    duels: DataFrame,
    rounds: int = 4,
    winner_col: str = "winner",
    loser_col: str = "loser",
    scale: int = 10**6,
) -> DataFrame:
    """duels(winner, loser) one row per game -> (item, strength_ppm,
    wins, games): fixed-round quantized MM strengths, total mass pinned
    to n_items * scale."""
    d = duels.select(
        F.col(winner_col).alias("w"), F.col(loser_col).alias("l")
    )
    # undirected game counts (i < j canonical) + per-item wins
    pairs = (
        d.select(
            F.least("w", "l").alias("i"), F.greatest("w", "l").alias("j")
        )
        .groupBy("i", "j")
        .agg(F.count("*").alias("n"))
        .localCheckpoint(eager=True)
    )
    wins = d.groupBy(F.col("w").alias("item")).agg(
        F.count("*").alias("wins")
    )
    items = (
        d.select(F.col("w").alias("item"))
        .unionByName(d.select(F.col("l").alias("item")))
        .groupBy("item")
        .agg(F.count("*").alias("games"))
        .join(wins, "item", "left")
        .select(
            "item",
            F.coalesce("wins", F.lit(0)).alias("wins"),
            "games",
        )
        .localCheckpoint(eager=True)
    )
    state = items.select(
        "item", F.lit(scale).cast("long").alias("p")
    ).localCheckpoint(eager=True)
    both = pairs.select(
        F.col("i").alias("item"), F.col("j").alias("other"), "n"
    ).unionByName(
        pairs.select(
            F.col("j").alias("item"), F.col("i").alias("other"), "n"
        )
    )
    for _ in range(rounds):
        terms = (
            both.join(state, "item")
            .join(
                state.select(
                    F.col("item").alias("other"), F.col("p").alias("po")
                ),
                "other",
            )
            .select(
                "item",
                # `div` = exact int64 division (all operands non-negative,
                # so trunc == floor == DuckDB's //); float floor would
                # lose exactness past 2^53
                F.expr("n * 1000000000000L div (p + po)").alias("t"),
            )
        )
        denom = terms.groupBy("item").agg(F.sum("t").alias("s"))
        raw = items.join(denom, "item").select(
            "item",
            F.expr("wins * 1000000000000L div s").alias("p"),
        )
        mass = raw.agg(
            F.sum("p").alias("tot"), F.count("*").alias("k")
        )
        state = (
            raw.crossJoin(F.broadcast(mass))
            .select(
                "item",
                F.expr(f"p * k * {scale}L div tot").alias("p"),
            )
            .localCheckpoint(eager=True)
        )
    return items.join(state, "item").select(
        "item", F.col("p").alias("strength_ppm"), "wins", "games"
    )
