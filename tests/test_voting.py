"""Gates for textops/voting.py: IRV against an exact elimination
replay (including the larger-id tie-break and zero-vote actives), the
classic center-squeeze election where the plurality leader LOSES the
runoff, first-round-majority preservation, and transfer conservation
(total votes constant across rounds); Schulze against a
Floyd-Warshall widest-path replay, the Condorcet-winner consistency
property, and the wiki-style cycle where the beatpath relation stays
total."""

from __future__ import annotations

from collections import Counter

from spanluke_spark.textops.voting import instant_runoff, schulze

# ---------------------------------------------------- python replays


def py_irv(ballots, k):
    """ballots: list of preference tuples (cand ids, best first)."""
    eliminated = set()
    out = []
    cands = sorted({c for b in ballots for c in b})
    for r in range(1, k):
        active = [c for c in cands if c not in eliminated]
        tally = Counter()
        for b in ballots:
            for c in b:
                if c not in eliminated:
                    tally[c] += 1
                    break
        rows = {c: tally.get(c, 0) for c in active}
        loser = min(rows, key=lambda c: (rows[c], -c))
        for c in active:
            status = (
                "eliminated"
                if c == loser
                else ("winner" if r == k - 1 else "active")
            )
            out.append((r, c, rows[c], status))
        eliminated.add(loser)
    return sorted(out)


def py_schulze(ballots, k):
    cands = sorted({c for b in ballots for c in b})
    d = {
        (a, b): 0 for a in cands for b in cands if a != b
    }
    for bal in ballots:
        pos = {c: i for i, c in enumerate(bal)}
        for a in cands:
            for b in cands:
                if a != b and pos[a] < pos[b]:
                    d[(a, b)] += 1
    p = {
        (a, b): d[(a, b)] if d[(a, b)] > d[(b, a)] else 0
        for a in cands
        for b in cands
        if a != b
    }
    for m in cands:
        for a in cands:
            for b in cands:
                if a != b and a != m and b != m:
                    p[(a, b)] = max(
                        p[(a, b)], min(p[(a, m)], p[(m, b)])
                    )
    return sorted(
        (a, b, d[(a, b)], p[(a, b)], p[(a, b)] >= p[(b, a)])
        for a in cands
        for b in cands
        if a != b
    )


def _ballot_df(spark, ballots):
    rows = [
        (i, pos, cand)
        for i, b in enumerate(ballots)
        for pos, cand in enumerate(b)
    ]
    return spark.createDataFrame(rows, "ballot long, pos long, cand long")


def _run_irv(spark, ballots, k):
    df = instant_runoff(_ballot_df(spark, ballots), k)
    return sorted(tuple(r) for r in df.collect())


def _run_schulze(spark, ballots, k):
    df = schulze(_ballot_df(spark, ballots), k)
    return sorted(tuple(r) for r in df.collect())


PERMS = [(0, 1, 2, 3, 4), (1, 3, 0, 4, 2), (4, 2, 3, 1, 0),
         (2, 0, 4, 1, 3), (3, 4, 1, 0, 2), (1, 0, 2, 4, 3)]
BALLOTS = [PERMS[i % 6] for i in range(60)] + [
    PERMS[(i * i) % 6] for i in range(30)
]


# ---------------------------------------------------------------- IRV


def test_irv_matches_replay(spark):
    assert _run_irv(spark, BALLOTS, 5) == py_irv(BALLOTS, 5)


def test_irv_center_squeeze(spark):
    # 8x A>B>C, 7x C>B>A, 5x B>C>A: plurality leader A loses the
    # runoff 8:12 after B's elimination transfers to C
    ballots = [(0, 1, 2)] * 8 + [(2, 1, 0)] * 7 + [(1, 2, 0)] * 5
    got = _run_irv(spark, ballots, 3)
    assert got == py_irv(ballots, 3)
    winner = [r for r in got if r[3] == "winner"]
    assert winner == [(2, 2, 12, "winner")]


def test_irv_first_round_majority_survives(spark):
    ballots = [(0, 1, 2)] * 11 + [(1, 2, 0)] * 5 + [(2, 0, 1)] * 4
    got = _run_irv(spark, ballots, 3)
    winner = [r for r in got if r[3] == "winner"][0]
    assert winner[1] == 0


def test_irv_transfer_conservation(spark):
    got = _run_irv(spark, BALLOTS, 5)
    per_round = Counter()
    for rnd, _, votes, _ in got:
        per_round[rnd] += votes
    assert set(per_round.values()) == {len(BALLOTS)}


def test_irv_tie_break_larger_id_first(spark):
    # perfectly symmetric 2x2: both candidates tie at 2; larger id out
    ballots = [(0, 1)] * 2 + [(1, 0)] * 2
    got = _run_irv(spark, ballots, 2)
    assert (1, 1, 2, "eliminated") in got
    assert (1, 0, 2, "winner") in got


# ------------------------------------------------------------ Schulze


def test_schulze_matches_replay(spark):
    assert _run_schulze(spark, BALLOTS, 5) == py_schulze(BALLOTS, 5)


def test_schulze_condorcet_consistency(spark):
    # candidate 0 pairwise-beats everyone -> must beat all on paths
    ballots = [(0, 1, 2, 3)] * 6 + [(0, 2, 3, 1)] * 5 + [
        (1, 2, 0, 3)
    ] * 4 + [(3, 0, 2, 1)] * 3
    got = _run_schulze(spark, ballots, 4)
    assert got == py_schulze(ballots, 4)
    zero_rows = [r for r in got if r[0] == 0]
    assert all(r[4] for r in zero_rows)


def test_schulze_cycle_relation_total(spark):
    # rock-paper-scissors duels: beatpath still yields a total relation
    ballots = [(0, 1, 2)] * 5 + [(1, 2, 0)] * 4 + [(2, 0, 1)] * 3
    got = _run_schulze(spark, ballots, 3)
    assert got == py_schulze(ballots, 3)
    rel = {(a, b): w for a, b, _, _, w in got}
    for a in range(3):
        for b in range(3):
            if a != b:
                assert rel[(a, b)] or rel[(b, a)]
