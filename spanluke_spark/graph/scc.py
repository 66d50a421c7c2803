"""Strongly connected components — the DIRECTED counterpart of
canon/cc.py, for the cycle structure of redirect chains, citation loops,
link farms, and the condensation DAG of a crawl graph.

bowtie.scc_of_pivot extracts ONE giant SCC (Broder's two-BFS trick);
this module labels EVERY node with its SCC so the condensation (the DAG
of SCCs) can be materialized — the form needed to find all redirect
cycles, mutually-citing case clusters, and reciprocal-link spam rings at
once, not just the core.

Algorithm: trimming + forward-max coloring (Orzan 2004; the FW-BW/Trim
family used by every distributed SCC system, e.g. Pregel/Giraph SCC):

  1. TRIM: repeatedly peel nodes with no in-edge or no out-edge in the
     live subgraph — each is its own singleton SCC. A DAG (most of a web
     crawl's periphery) disappears entirely here, in rounds proportional
     to its depth, each round two semi-joins + one anti-join.
  2. COLOR: propagate color(u) = max node id forward-reachable from u
     (init = own id; per round one edge join + one map-side-combinable
     max agg). Every occupied color c satisfies color(c) = c — c is the
     pivot of its class.
  3. DETECT: SCC(c) = { u : color(u) = c AND c forward-reaches u }.
     (color(u) = c already implies u reaches c, since the max of u's
     reach set is attained; the forward BFS from all pivots at once,
     restricted to targets of the same color, supplies the other
     direction. Every intermediate node on such a path provably has
     color c, so the restriction loses nothing.)
  4. Peel the detected SCCs, go to 1. Each peel removes at least every
     pivot's whole class-reachable SCC; on web-shaped graphs a handful
     of peels suffice (the giant SCC falls in peel 1 with overwhelming
     probability because the max-id node concentrates there).

Scale shape: no transitive closure is ever materialized — state is one
row per live node (color) plus frontier rows during detection; every
round is an equi-join + aggregate pair, lineage truncated by eager
localCheckpoints, fixpoint tested by the closing count. Labels are
relabeled to min-member-id at the end (one extra agg + join) so the
output contract is engine-independent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["strongly_connected_components", "condensation_edges", "py_scc"]


def _live_edges(edges: DataFrame, live: DataFrame) -> DataFrame:
    return (
        edges.join(live.select(F.col("node").alias("src")), "src", "left_semi")
        .join(live.select(F.col("node").alias("dst")), "dst", "left_semi")
        .select("src", "dst")
    )


def strongly_connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_peels: int = 40,
    max_rounds: int = 64,
) -> DataFrame:
    """edges (directed, self-loops ignored — a node appearing ONLY in
    self-loops is excluded) -> (node, scc_id), scc_id = MIN node id in
    the SCC. Singletons (acyclic nodes) get scc_id = node.

    ``max_rounds`` bounds each inner fixpoint (trim depth / color
    diameter / detection BFS); ``max_peels`` bounds outer peels. Both
    raise if exhausted rather than return a wrong labeling.
    """
    e0 = (
        edges.select(F.col(src).cast("long").alias("src"), F.col(dst).cast("long").alias("dst"))
        .where(F.col("src") != F.col("dst"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    live = (
        e0.select(F.col("src").alias("node"))
        .unionByName(e0.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    spark = edges.sparkSession
    # Assignment parts stay LAZY until the end: every input they reference
    # (e, live, members) is an immutable localCheckpoint, so deferring the
    # union costs nothing and saves one eager materialization per round —
    # at toy scale that is the dominant cost (many tiny jobs).
    assigned_parts: list[DataFrame] = []
    e = e0

    for _ in range(max_peels):
        n_live = live.count()
        if n_live == 0:
            break

        # 1. TRIM — peel no-in / no-out nodes (singleton SCCs) to fixpoint.
        for _ in range(max_rounds):
            e = _live_edges(e, live).localCheckpoint(eager=True)
            has_in = e.select(F.col("dst").alias("node")).distinct()
            has_out = e.select(F.col("src").alias("node")).distinct()
            core = live.join(has_in, "node", "left_semi").join(
                has_out, "node", "left_semi"
            )
            n_core = core.count()
            if n_core == n_live:
                break
            core = core.localCheckpoint(eager=True)
            assigned_parts.append(
                live.join(core, "node", "left_anti").select(
                    "node", F.col("node").alias("scc_id")
                )
            )
            live = core
            n_live = n_core
        if n_live == 0:
            continue

        # 2. COLOR — color(u) = max forward-reachable id, to fixpoint.
        color = live.select("node", F.col("node").alias("color")).localCheckpoint(
            eager=True
        )
        for r in range(max_rounds + 1):
            nxt = (
                e.join(color.select(F.col("node").alias("dst"), "color"), "dst")
                .groupBy(F.col("src").alias("node"))
                .agg(F.max("color").alias("_nc"))
            )
            # change flag computed in the same pass, so the convergence
            # probe is a trivial scan of the checkpoint, not a re-join
            grown = (
                color.join(nxt, "node", "left")
                .select(
                    "node",
                    F.greatest(
                        F.col("color"), F.coalesce(F.col("_nc"), F.col("color"))
                    ).alias("color"),
                    (F.coalesce(F.col("_nc"), F.col("color")) > F.col("color")).alias(
                        "_chg"
                    ),
                )
                .localCheckpoint(eager=True)
            )
            changed = grown.where(F.col("_chg")).limit(1).count()
            color = grown.select("node", "color")
            if changed == 0:
                break
        else:
            raise ValueError("scc: color propagation did not converge")

        # 3. DETECT — forward BFS from all pivots, restricted to same color.
        frontier = color.where(F.col("node") == F.col("color")).select(
            "node", "color"
        ).localCheckpoint(eager=True)
        members = frontier
        for _ in range(max_rounds):
            step = (
                frontier.select(F.col("node").alias("src"), "color")
                .join(e, "src")
                .select(F.col("dst").alias("node"), "color")
                .distinct()
                .join(color.withColumnRenamed("color", "_c"), "node")
                .where(F.col("color") == F.col("_c"))
                .select("node", "color")
                .join(members, "node", "left_anti")
                .localCheckpoint(eager=True)
            )
            if step.limit(1).count() == 0:
                break
            members = members.unionByName(step).localCheckpoint(eager=True)
            frontier = step
        assigned_parts.append(
            members.select("node", F.col("color").alias("scc_id"))
        )
        live = live.join(members, "node", "left_anti").localCheckpoint(eager=True)
    else:
        if live.limit(1).count() != 0:
            raise ValueError("scc: peel budget exhausted")

    # Relabel to min member id — engine-independent contract.
    if not assigned_parts:
        return spark.createDataFrame([], "node long, scc_id long")
    assigned = assigned_parts[0]
    for part in assigned_parts[1:]:
        assigned = assigned.unionByName(part)
    relabel = assigned.groupBy("scc_id").agg(F.min("node").alias("_min"))
    return (
        assigned.join(relabel, "scc_id")
        .select("node", F.col("_min").alias("scc_id"))
    )


def condensation_edges(
    edges: DataFrame,
    labels: DataFrame,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """-> distinct (scc_src, scc_dst) edges of the condensation DAG
    (cross-SCC edges only): two broadcast-sized label joins + distinct."""
    lab_s = labels.select(F.col("node").alias(src), F.col("scc_id").alias("scc_src"))
    lab_d = labels.select(F.col("node").alias(dst), F.col("scc_id").alias("scc_dst"))
    return (
        edges.select(src, dst)
        .join(lab_s, src)
        .join(lab_d, dst)
        .where(F.col("scc_src") != F.col("scc_dst"))
        .select("scc_src", "scc_dst")
        .distinct()
    )


def py_scc(edges: list[tuple[int, int]]) -> dict[int, int]:
    """Iterative Tarjan oracle for tests: node -> min member id."""
    adj: dict[int, list[int]] = {}
    nodes: set[int] = set()
    for u, v in edges:
        if u == v:
            continue
        nodes.add(u)
        nodes.add(v)
        adj.setdefault(u, []).append(v)
    index: dict[int, int] = {}
    low: dict[int, int] = {}
    on_stack: set[int] = set()
    stack: list[int] = []
    out: dict[int, int] = {}
    counter = [0]

    for root in sorted(nodes):
        if root in index:
            continue
        work = [(root, 0)]
        while work:
            node, pi = work[-1]
            if pi == 0:
                index[node] = low[node] = counter[0]
                counter[0] += 1
                stack.append(node)
                on_stack.add(node)
            recurse = False
            kids = adj.get(node, [])
            for i in range(pi, len(kids)):
                w = kids[i]
                if w not in index:
                    work[-1] = (node, i + 1)
                    work.append((w, 0))
                    recurse = True
                    break
                if w in on_stack:
                    low[node] = min(low[node], index[w])
            if recurse:
                continue
            if low[node] == index[node]:
                comp = []
                while True:
                    w = stack.pop()
                    on_stack.discard(w)
                    comp.append(w)
                    if w == node:
                        break
                m = min(comp)
                for w in comp:
                    out[w] = m
            work.pop()
            if work:
                parent = work[-1][0]
                low[parent] = min(low[parent], low[node])
    return out
