"""Random-walk corpus generation (the first stage of DeepWalk, Perozzi et
al. 2014 / node2vec, Grover & Leskovec 2016): emit fixed-length walks over
the graph, later fed to a skip-gram trainer as "sentences".

Determinism contract (the engine-wide rule — no rand()): the step taken at
node u on walk w's step t is ``portable_hash64(w || ':' || t || ':' || u)
mod out_degree(u)`` over the dst-sorted neighbor list. Re-runs, retries and
the SQL oracle re-derive the identical corpus — a property real pipelines
want anyway for reproducible embeddings.

Scale shape: adjacency gets a per-src neighbor ordinal once (one window
over the edge list, the same shuffle a groupBy adjacency build costs);
each of the L steps is ONE equi-join of the walk frontier against the
adjacency keyed on the current node, with the hash-mod ordinal selecting
the neighbor inside the join — per-step cost O(|frontier|), total
O(L * walks), never materializing neighbor lists as arrays (a hub with
10^7 out-links stays row-shaped and AQE-splittable). Walks stop early at
dangling nodes, exactly like the reference samplers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..dedup.dedup import portable_hash64

__all__ = ["deterministic_walks"]


def deterministic_walks(
    edges: DataFrame,
    starts: DataFrame,
    length: int = 4,
    repeats: int = 2,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """-> (walk_id, step, node): ``repeats`` hash-driven walks of up to
    ``length`` steps from every node in ``starts`` (column ``node``).

    walk_id = "<start>#<r>"; step 0 is the start node. A walk that reaches
    a node with no out-edges ends there (fewer than ``length`` rows).
    """
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst")).distinct()
    w = Window.partitionBy("src").orderBy("dst")
    adj = e.select(
        "src",
        "dst",
        (F.row_number().over(w) - 1).alias("ord"),
        F.count("*").over(Window.partitionBy("src")).alias("deg"),
    )

    reps = F.explode(F.sequence(F.lit(0), F.lit(repeats - 1))).alias("r")
    cur = (
        starts.select("node")
        .distinct()
        .select("node", reps)
        .select(
            F.concat(
                F.col("node").cast("string"), F.lit("#"), F.col("r").cast("string")
            ).alias("walk_id"),
            F.col("node"),
            F.lit(0).alias("step"),
        )
    )

    out = cur
    frontier = cur
    for t in range(1, length + 1):
        pick = portable_hash64(
            F.concat(
                F.col("walk_id"),
                F.lit(":"),
                F.lit(str(t)),
                F.lit(":"),
                F.col("node").cast("string"),
            )
        ) % F.col("deg")
        nxt = (
            frontier.join(adj, frontier.node == adj.src)
            .where(F.col("ord") == pick)
            .select("walk_id", F.col("dst").alias("node"), F.lit(t).alias("step"))
        )
        out = out.unionByName(nxt)
        frontier = nxt
    return out.select("walk_id", "step", "node")


def skipgram_pairs(walks: DataFrame, window: int = 2) -> DataFrame:
    """(walk_id, step, node) -> (center, context, cnt): the skip-gram
    training pairs a word2vec-style embedding trainer consumes, counted
    over the whole walk corpus.

    One self-join per corpus keyed on walk_id with a |step delta| in
    [1, window] band predicate — walks are short (length L), so each walk
    contributes <= 2*L*window rows and the join key (walk_id) is uniform
    by construction (no hub skew possible). The final count is a
    map-side-combinable groupBy on the (center, context) vocabulary.
    """
    a = walks.select(
        F.col("walk_id"), F.col("step").alias("sa"), F.col("node").alias("center")
    )
    b = walks.select(
        F.col("walk_id"), F.col("step").alias("sb"), F.col("node").alias("context")
    )
    return (
        a.join(b, "walk_id")
        .where(
            (F.col("sa") != F.col("sb"))
            & (F.abs(F.col("sa") - F.col("sb")) <= window)
        )
        .groupBy("center", "context")
        .agg(F.count("*").alias("cnt"))
    )
