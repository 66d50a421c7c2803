"""Maximal independent set — deterministic Luby rounds over the
conflict graph.

Luby's algorithm (Luby 1986, "A Simple Parallel Algorithm for the
Maximal Independent Set Problem") with the repo-wide no-RNG discipline:
instead of fresh random priorities per round, every node carries a FIXED
priority — Knuth's multiplicative hash of its id, tie-broken by the id
itself so the order is total and strict. Per round, a live node enters
the MIS iff its (priority, id) pair is a strict local minimum among live
neighbors; MIS winners and their neighbors leave the live set. Isolated
live nodes win vacuously. The result is independent (two adjacent nodes
can't both be local minima) and maximal (a node only leaves the live set
when it or a neighbor entered the MIS).

Where it runs in the engine: one-per-cluster representative selection
over conflict edges (near-duplicate pairs, sameAs suggestions that must
not chain), and parallel-safe scheduling (crawl politeness: pick a
maximal set of hosts with no shared rate-limit edge per wave). The
sibling of matching.greedy_matching — locally-dominant VERTICES instead
of locally-dominant edges.

Relational shape per round: one live-edge semi-restriction (two hash
joins on the live set), one min-aggregate per node over packed neighbor
priorities (map-side combinable), one left join to test local minimum,
one left_anti to shrink the live set, one localCheckpoint. With fixed
hash priorities the expected round count is O(log n) on bounded-degree
graphs — the same budget every other fixpoint module here runs on
(canon/cc.py, graph/scc.py).

Determinism: priorities are a pure affine-mod function of the id; no
rand(), no monotonically_increasing_id. The unrolled SQL oracle replays
every round bit-exactly (q263).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["maximal_independent_set", "mis_priority"]

# Knuth's 2^32/phi multiplicative constant; modulus 2^31-1 (prime).
_PRIO_MULT = 2654435761
_PRIO_ADD = 12345
_P31 = 2147483647


def mis_priority(node: Column) -> Column:
    """Packed (hash-priority, id) key — one BIGINT whose ordering is the
    strict total order Luby rounds compare on. Requires non-negative ids
    below 2^31 (the engine's canonical node-id domain after
    canonicalization); the id low bits make the order total even across
    hash collisions. Max value (2^31-2)*2^31 + (2^31-1) < 2^62: no
    overflow in Spark or DuckDB BIGINTs.
    """
    prio = (node.cast("long") * _PRIO_MULT + _PRIO_ADD) % _P31
    return prio * F.lit(2147483648).cast("long") + node.cast("long")


def maximal_independent_set(
    edges: DataFrame,
    rounds: int = 8,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """edges(src, dst) -> (node, mis_round) for every MIS member, with
    mis_round the 1-based round the node won. Edges are undirected-ized;
    self-loops are dropped (a self-looped node conflicts only with
    itself and may still be selected). Ids must be non-negative and fit
    31 bits (mis_priority's packing contract).

    ``rounds`` is a fixed budget, not a fixpoint probe — the job count
    is bounded and the unrolled oracle replays it; an early count probe
    exits once the live set empties. If the budget is exhausted with
    live nodes remaining the result is independent but possibly not
    maximal; callers needing the guarantee raise ``rounds`` (pytest
    gates maximality on every fixture).
    """
    und = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("a"),
            F.greatest(F.col(src), F.col(dst)).alias("b"),
        )
        .where(F.col("a") != F.col("b"))
        .distinct()
    )
    nbr = und.unionByName(
        und.select(F.col("b").alias("a"), F.col("a").alias("b"))
    ).localCheckpoint(eager=True)
    live = (
        edges.select(F.col(src).alias("node"))
        .unionByName(edges.select(F.col(dst).alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    spark = edges.sparkSession
    mis = spark.createDataFrame([], "node long, mis_round int")
    for r in range(1, rounds + 1):
        if live.isEmpty():
            break
        live_nbr = (
            nbr.join(live.select(F.col("node").alias("a")), "a")
            .join(live.select(F.col("node").alias("b")), "b")
            .select("a", "b")
        )
        min_nbr = live_nbr.groupBy(F.col("a").alias("node")).agg(
            F.min(mis_priority(F.col("b"))).alias("_mn")
        )
        winners = (
            live.join(min_nbr, "node", "left")
            .where(F.col("_mn").isNull() | (mis_priority(F.col("node")) < F.col("_mn")))
            .select("node")
            .localCheckpoint(eager=True)
        )
        mis = mis.unionByName(
            winners.select(F.col("node").cast("long"), F.lit(r).alias("mis_round"))
        )
        removed = winners.unionByName(
            live_nbr.join(winners.select(F.col("node").alias("a")), "a").select(
                F.col("b").alias("node")
            )
        ).distinct()
        live = live.join(removed, "node", "left_anti").localCheckpoint(eager=True)
    return mis
