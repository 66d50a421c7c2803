"""Ranked-ballot aggregation: exhaustive instant-runoff (IRV; Hare
1859 as used in ranked-choice elections) and the Schulze beatpath
method (Schulze 2011) — the two standard ways to fuse FULL preference
orders, complementing the positional/pairwise fusions already in the
engine (RRF q200, Copeland q269, Bradley-Terry q285). Web-scale use:
aggregating per-annotator or per-model preference rankings (RLHF
comparison data) into one consensus order where plurality would
split the vote.

IRV (exhaustive-runoff variant): each round tallies every ballot's
top surviving candidate, then eliminates the lowest tally
(deterministic tie-break, stated: larger candidate id goes first).
Elimination runs to the last survivor — a majority holder's tally
only grows as transfers arrive, so it can never hold the round
minimum (min <= mean < half), making the final survivor identical to
majority-stop IRV while keeping the plan fully deterministic. Output
is the complete per-round tally with per-row status
(active/eliminated/winner) — counts only, no floats at all.

Schulze: from pairwise duel counts d[a][b] (ballots ranking a above
b), the strongest-path strength p[a][b] is the widest-bottleneck
path in the directed win graph (edges only where d[a][b] > d[b][a]).
k-1 rounds of the max-min relaxation p = max(p, max_m min(p[a][m],
p[m][b])) reach the fixpoint for k candidates; the winner beats every
rival on path strength (p[w][x] >= p[x][w] for all x). All counts
exact integers; both the duel matrix and every relaxation are
equi-joins on candidate ids.

Distributed shape: ballots group to (ballot, top-choice) via min_by
— one shuffle per round, k-1 rounds, k small (the panel/candidate
count, NOT the corpus: ballots can be billions of rows, candidates
are a dimension). The per-round loser is a 1-row broadcast; nothing
driver-side, no collect. Schulze's relaxation joins are k^2-row
dimension tables — broadcast territory end to end after the one
big duel aggregation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["instant_runoff", "schulze"]


def instant_runoff(
    ballots: DataFrame,
    n_cands: int,
    ballot_col: str = "ballot",
    pos_col: str = "pos",
    cand_col: str = "cand",
) -> DataFrame:
    """ballots (ballot, pos, cand) — pos 0 = most preferred, each
    ballot a (partial) permutation — -> (round, cand, votes, status)
    for rounds 1..n_cands-1; status in active/eliminated/winner."""
    b = ballots.select(
        F.col(ballot_col).alias("ballot"),
        F.col(pos_col).cast("long").alias("pos"),
        F.col(cand_col).cast("long").alias("cand"),
    ).localCheckpoint(eager=True)
    cands = b.select("cand").distinct()
    eliminated = None
    rounds = []
    for r in range(1, n_cands):
        if eliminated is None:
            active_ballots, active_cands = b, cands
        else:
            active_ballots = b.join(
                F.broadcast(eliminated), "cand", "left_anti"
            )
            active_cands = cands.join(
                F.broadcast(eliminated), "cand", "left_anti"
            )
        first = active_ballots.groupBy("ballot").agg(
            F.min_by("cand", "pos").alias("cand")
        )
        tally = (
            active_cands.join(
                first.groupBy("cand").agg(
                    F.count(F.lit(1)).cast("long").alias("votes")
                ),
                "cand",
                "left",
            )
            .select(
                "cand",
                F.coalesce(F.col("votes"), F.lit(0).cast("long")).alias(
                    "votes"
                ),
            )
            .localCheckpoint(eager=True)
        )
        loser = (
            tally.orderBy(F.col("votes").asc(), F.col("cand").desc())
            .limit(1)
            .select("cand")
        )
        is_last = r == n_cands - 1
        status = (
            F.when(F.col("is_loser"), F.lit("eliminated"))
            .otherwise(F.lit("winner" if is_last else "active"))
            .alias("status")
        )
        rounds.append(
            tally.join(
                F.broadcast(loser.withColumn("is_loser", F.lit(True))),
                "cand",
                "left",
            )
            .select(
                F.lit(r).cast("long").alias("round"),
                "cand",
                "votes",
                F.coalesce(F.col("is_loser"), F.lit(False)).alias(
                    "is_loser"
                ),
            )
            .select("round", "cand", "votes", status)
        )
        eliminated = (
            loser if eliminated is None else eliminated.unionAll(loser)
        )
    out = rounds[0]
    for extra in rounds[1:]:
        out = out.unionAll(extra)
    return out


def schulze(
    ballots: DataFrame,
    n_cands: int,
    ballot_col: str = "ballot",
    pos_col: str = "pos",
    cand_col: str = "cand",
) -> DataFrame:
    """ballots (ballot, pos, cand) -> one row per ordered candidate
    pair (a, b, d_ab, p_ab, a_beats_b) plus the derived per-candidate
    panel is left to the caller; a_beats_b = p_ab >= p_ba (the
    Schulze relation)."""
    b = ballots.select(
        F.col(ballot_col).alias("ballot"),
        F.col(pos_col).cast("long").alias("pos"),
        F.col(cand_col).cast("long").alias("cand"),
    )
    l, r = b.alias("l"), b.alias("r")
    duels = (
        l.join(
            r,
            (F.col("l.ballot") == F.col("r.ballot"))
            & (F.col("l.cand") != F.col("r.cand")),
        )
        .where(F.col("l.pos") < F.col("r.pos"))
        .groupBy(
            F.col("l.cand").alias("a"), F.col("r.cand").alias("b")
        )
        .agg(F.count(F.lit(1)).cast("long").alias("d_ab"))
    )
    # dense pair grid so absent duels count 0
    cands = b.select(F.col("cand")).distinct()
    grid = (
        cands.select(F.col("cand").alias("a"))
        .crossJoin(cands.select(F.col("cand").alias("b")))
        .where(F.col("a") != F.col("b"))
    )
    dmat = grid.join(duels, ["a", "b"], "left").select(
        "a",
        "b",
        F.coalesce(F.col("d_ab"), F.lit(0).cast("long")).alias("d_ab"),
    )
    rev = dmat.select(
        F.col("a").alias("b2"),
        F.col("b").alias("a2"),
        F.col("d_ab").alias("d_ba"),
    )
    p = (
        dmat.join(
            rev,
            (F.col("a") == F.col("a2")) & (F.col("b") == F.col("b2")),
        )
        .select(
            "a",
            "b",
            "d_ab",
            F.when(
                F.col("d_ab") > F.col("d_ba"), F.col("d_ab")
            )
            .otherwise(F.lit(0).cast("long"))
            .alias("p_ab"),
        )
        .localCheckpoint(eager=True)
    )
    for _ in range(n_cands - 1):
        left = p.select(
            F.col("a").alias("i"),
            F.col("b").alias("m"),
            F.col("p_ab").alias("p_im"),
        )
        right = p.select(
            F.col("a").alias("m"),
            F.col("b").alias("j"),
            F.col("p_ab").alias("p_mj"),
        )
        via = (
            left.join(right, "m")
            .where(F.col("i") != F.col("j"))
            .groupBy(F.col("i").alias("a"), F.col("j").alias("b"))
            .agg(
                F.max(F.least(F.col("p_im"), F.col("p_mj"))).alias(
                    "p_via"
                )
            )
        )
        p = (
            p.join(via, ["a", "b"], "left")
            .select(
                "a",
                "b",
                "d_ab",
                F.greatest(
                    F.col("p_ab"),
                    F.coalesce(F.col("p_via"), F.lit(0).cast("long")),
                ).alias("p_ab"),
            )
            .localCheckpoint(eager=True)
        )
    pr = p.select(
        F.col("a").alias("b2"),
        F.col("b").alias("a2"),
        F.col("p_ab").alias("p_ba"),
    )
    return (
        p.join(
            pr,
            (F.col("a") == F.col("a2")) & (F.col("b") == F.col("b2")),
        )
        .select(
            "a",
            "b",
            "d_ab",
            "p_ab",
            (F.col("p_ab") >= F.col("p_ba")).alias("a_beats_b"),
        )
    )
