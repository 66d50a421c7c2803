"""Graph analytics over the extracted web-link / KG edge set: triangle
counting, label-propagation communities, and path-motif queries — the
standard relational decompositions, shaped for a 100 TB edge table.

Triangle counting uses DEGREE ORIENTATION (the compact-forward /
Latapy-style trick every distributed implementation relies on): orient
each undirected edge from its lower-(degree, id) endpoint to the higher
one, enumerate wedges only OUT of each node, and close them against the
oriented edge set. Wedge count is then bounded by sum(min-deg per edge)
— O(m^1.5) worst case — instead of sum(deg^2), which a hub node (every
web graph has one) would otherwise blow up quadratically. The triangle
SET is orientation-invariant, so the DuckDB oracle can verify with the
simpler id-ordering formulation: identical output, different plan.

Label propagation is the synchronous variant with a deterministic
tie-break (max count, then min label) so results are reproducible across
cluster sizes — per round one edge->label join + one (node, label) count
agg + one window top-1; lineage truncated per round like pagerank.py.

Reference analogue: canonicalization/community structure over the
entity-link graph (SpanLuke emits flat triples; these are the graft's
graph-side consumers of them).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _undirected(edges: DataFrame, src: str, dst: str) -> DataFrame:
    """Distinct undirected edge set as (a, b), a != b, canonical a < b."""
    e = edges.select(F.col(src).alias("s"), F.col(dst).alias("d"))
    return (
        e.where(F.col("s") != F.col("d"))
        .select(
            F.least("s", "d").alias("a"),
            F.greatest("s", "d").alias("b"),
        )
        .distinct()
    )


def _oriented_triangles(und: DataFrame) -> DataFrame:
    """Canonical undirected edges (a < b) -> one row per triangle as
    (pivot, x, y) with x < y, via degree-oriented wedge enumeration
    (see module docstring): wedge count bounded by sum(min-deg per edge)
    = O(m^1.5), hub-safe. Shared by triangle_count and k_truss."""
    deg = (
        und.select(F.col("a").alias("n"))
        .unionByName(und.select(F.col("b").alias("n")))
        .groupBy("n")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    # orient {u,v} from lower (deg, id) to higher (deg, id)
    oriented = (
        und.join(deg.select(F.col("n").alias("a"), F.col("deg").alias("da")), "a")
        .join(deg.select(F.col("n").alias("b"), F.col("deg").alias("db")), "b")
        .select(
            F.when(
                (F.col("da") < F.col("db"))
                | ((F.col("da") == F.col("db")) & (F.col("a") < F.col("b"))),
                F.struct(F.col("a").alias("lo"), F.col("b").alias("hi")),
            )
            .otherwise(F.struct(F.col("b").alias("lo"), F.col("a").alias("hi")))
            .alias("e")
        )
        .select(F.col("e.lo").alias("lo"), F.col("e.hi").alias("hi"))
    )
    l1 = oriented.select(F.col("lo").alias("pivot"), F.col("hi").alias("x"))
    l2 = oriented.select(F.col("lo").alias("pivot"), F.col("hi").alias("y"))
    wedges = l1.join(l2, "pivot").where(F.col("x") < F.col("y"))
    # close the wedge against the canonical undirected set (the oriented
    # edges re-canonicalized ARE und, so no second orientation pass)
    closing = und.select(F.col("a").alias("x"), F.col("b").alias("y"))
    return wedges.join(closing, ["x", "y"]).select("pivot", "x", "y")


def triangle_count(
    edges: DataFrame, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """edges -> (node, triangles): per-node triangle membership counts
    (nodes in no triangle are omitted; self-loops and edge direction /
    multiplicity ignored, the standard convention).

    Shape: degree-oriented wedge join — both joins are equi-joins on
    (node) / (node, node) keys, so AQE handles residual skew; no
    all-pairs stage anywhere.
    """
    tris = _oriented_triangles(_undirected(edges, src, dst))
    return (
        tris.select(F.explode(F.array("pivot", "x", "y")).alias("node"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("triangles"))
    )


def _edge_support(und: DataFrame) -> DataFrame:
    """Canonical undirected edges -> (a, b, support): the number of
    triangles each edge participates in. Every triangle (pivot, x, y)
    contributes one to each of its three canonical edges; edges in no
    triangle are omitted (support 0)."""
    tris = _oriented_triangles(und)
    contrib = tris.select(
        F.explode(
            F.array(
                F.struct(
                    F.least("pivot", "x").alias("a"),
                    F.greatest("pivot", "x").alias("b"),
                ),
                F.struct(
                    F.least("pivot", "y").alias("a"),
                    F.greatest("pivot", "y").alias("b"),
                ),
                # x < y already canonical
                F.struct(F.col("x").alias("a"), F.col("y").alias("b")),
            )
        ).alias("e")
    )
    return contrib.groupBy(F.col("e.a").alias("a"), F.col("e.b").alias("b")).agg(
        F.count(F.lit(1)).alias("support")
    )


def k_truss(
    edges: DataFrame,
    k: int,
    src: str = "src",
    dst: str = "dst",
    max_rounds: int = 50,
) -> DataFrame:
    """k-truss decomposition membership: the maximal subgraph in which
    every EDGE lies in >= k-2 triangles -> (a, b, support) over canonical
    undirected edges, support measured on the final truss subgraph. The
    truss is the edge-cohesion analogue of k_core and the standard
    link-farm / citation-clique extractor: a k-truss is always inside the
    (k-1)-core but far denser, so it isolates genuinely tight communities
    that degree alone (k_core) cannot.

    Like the k-core, truss peeling is CONFLUENT (the k-truss is unique
    regardless of peel order), so the relational fixpoint — drop ALL
    under-supported edges simultaneously, recompute supports on the
    induced subgraph, repeat — terminates at the sequential answer.
    Each round is one degree-oriented triangle enumeration (O(m^1.5)
    wedges, hub-safe) + one per-edge count + one filter over the
    SHRINKING edge set; the round-closing count() doubles as the fixpoint
    test and lineage is truncated per round (localCheckpoint), exactly
    the k_core/pagerank iteration discipline. Power-law graphs shed most
    edges in round 1 (an edge between two leaf pages is in no triangle
    at all), so rounds stay small at crawl scale.
    """
    if k < 3:
        raise ValueError(f"k-truss requires k >= 3, got {k}")
    und = _undirected(edges, src, dst).localCheckpoint(eager=True)
    n_prev = und.count()
    for _ in range(max_rounds):
        kept = (
            _edge_support(und)
            .where(F.col("support") >= k - 2)
            .select("a", "b")
            .localCheckpoint(eager=True)
        )
        n_now = kept.count()
        und = kept
        if n_now == n_prev or n_now == 0:
            break
        n_prev = n_now
    return _edge_support(und).where(F.col("support") >= k - 2)


def label_propagation(
    edges: DataFrame, iters: int = 2, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """edges -> (node, label) community assignment after ``iters``
    synchronous label-propagation rounds. Initial label = node id; each
    round every node adopts the most frequent label among its neighbors
    (count desc, then label asc — fully deterministic), isolated or
    tie-free nodes keep their current label only via the vote (a node is
    NOT its own neighbor, per the classic formulation)."""
    und = _undirected(edges, src, dst)
    both = und.select(F.col("a").alias("n"), F.col("b").alias("m")).unionByName(
        und.select(F.col("b").alias("n"), F.col("a").alias("m"))
    )
    nodes = both.select("n").distinct()
    labels = nodes.select("n", F.col("n").alias("label")).localCheckpoint(
        eager=False
    )
    w = Window.partitionBy("n").orderBy(F.desc("votes"), F.asc("label"))
    for _ in range(iters):
        votes = (
            both.join(
                labels.select(F.col("n").alias("m"), "label"), "m"
            )
            .groupBy("n", "label")
            .agg(F.count(F.lit(1)).alias("votes"))
        )
        labels = (
            votes.withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") == 1)
            .select("n", "label")
            .localCheckpoint(eager=False)
        )
    return labels.select(F.col("n").alias("node"), "label")


def path_motifs(
    edges: DataFrame, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """Directed 2-hop motif query (the SPARQL-ish ``(a)->(x)->(c)``
    pattern over a triple/link table): -> (src, dst, n_paths) for every
    ordered pair connected by at least one length-2 directed path through
    any intermediate, endpoints distinct. One self-equi-join on the
    intermediate node + one hash agg — the exact shape a Catalyst-planned
    triple-pattern join has at any scale."""
    e = edges.select(F.col(src).alias("s"), F.col(dst).alias("d")).distinct()
    hop1 = e.select(F.col("s").alias("src"), F.col("d").alias("mid"))
    hop2 = e.select(F.col("s").alias("mid"), F.col("d").alias("dst"))
    return (
        hop1.join(hop2, "mid")
        .where(F.col("src") != F.col("dst"))
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).alias("n_paths"))
    )


def k_core(
    edges: DataFrame,
    k: int,
    src: str = "src",
    dst: str = "dst",
    max_rounds: int = 50,
) -> DataFrame:
    """k-core decomposition membership: the maximal subgraph in which
    every node has (undirected) degree >= k -> (node, core_degree).
    The crawl-graph densest-region extractor: link farms and genuine
    topic hubs both live in high cores, while the long tail of
    leaf pages (most of a 10^12-node web graph) peels away in the
    first rounds.

    Iterative peeling is CONFLUENT (the k-core is unique regardless of
    peel order), so the relational fixpoint — drop all nodes with
    degree < k simultaneously, recompute degrees on the induced
    subgraph, repeat — terminates at the same answer as sequential
    peeling. Each round is one degree aggregate + two semi-joins on the
    shrinking edge set; the round-closing count() doubles as the
    fixpoint test. Rounds are bounded by the peeling depth, which is
    tiny for power-law graphs (most mass leaves in round 1).
    """
    und = _undirected(edges, src, dst)
    # symmetrize so one groupBy("a") sees every endpoint's full degree
    e = und.unionByName(
        und.select(F.col("b").alias("a"), F.col("a").alias("b"))
    ).localCheckpoint(eager=True)
    n_prev = e.count()
    for _ in range(max_rounds):
        deg = e.groupBy(F.col("a").alias("node")).agg(
            F.count(F.lit(1)).alias("deg")
        )
        survivors = deg.where(F.col("deg") >= k).select("node")
        e2 = (
            e.join(survivors.withColumnRenamed("node", "a"), "a", "left_semi")
            .join(
                survivors.withColumnRenamed("node", "b"), "b", "left_semi"
            )
            .select("a", "b")
            .localCheckpoint(eager=True)
        )
        n_now = e2.count()
        e = e2
        if n_now == n_prev or n_now == 0:
            break
        n_prev = n_now
    return e.groupBy(F.col("a").alias("node")).agg(
        F.count(F.lit(1)).alias("core_degree")
    ).where(F.col("core_degree") >= k)


def densest_subgraph_trace(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_rounds: int = 50,
) -> DataFrame:
    """Charikar's greedy 2-approximation for the densest subgraph,
    returned as its peel TRACE: one row per round with (round, n_nodes,
    n_edges, density = m/n) of the subgraph ENTERING that round. Each
    round removes every node whose degree <= the current average
    (2m/n), so rounds are O(log n) — the max-density row identifies the
    (>= OPT/2) densest prefix, and density spikes across rounds are the
    link-farm/citation-cabal alarm at crawl scale (a k-core needs k
    chosen in advance; density does not).

    Relational fixpoint discipline matches k_core/k_truss: one degree
    aggregate + two semi-joins per round on the shrinking edge set,
    localCheckpoint lineage truncation, counts double as the loop test.
    """
    und = _undirected(edges, src, dst).localCheckpoint(eager=True)
    sym = und.unionByName(
        und.select(F.col("b").alias("a"), F.col("a").alias("b"))
    ).localCheckpoint(eager=True)
    rows = []
    for rnd in range(max_rounds):
        m2 = sym.count()  # 2 * edges
        if m2 == 0:
            break
        deg = sym.groupBy(F.col("a").alias("node")).agg(
            F.count(F.lit(1)).alias("deg")
        )
        n = deg.count()
        rows.append((rnd, n, m2 // 2, round((m2 / 2) / n, 6)))
        # average degree = 2m/n; exact integer comparison deg * n <= 2m
        survivors = deg.where(F.col("deg") * n > m2).select("node")
        sym = (
            sym.join(survivors.withColumnRenamed("node", "a"), "a", "left_semi")
            .join(survivors.withColumnRenamed("node", "b"), "b", "left_semi")
            .select("a", "b")
            .localCheckpoint(eager=True)
        )
    spark = edges.sparkSession
    return spark.createDataFrame(
        rows, "round int, n_nodes long, n_edges long, density double"
    )


def clustering_coefficient(
    edges: DataFrame, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """-> (node, deg, triangles, coefficient): Watts-Strogatz local
    clustering coefficient = triangles(n) / C(deg(n), 2) over the
    undirected simple graph (0.0 for degree-1 nodes; the web-spam
    literature's link-farm signal — farms cluster, organic pages don't).

    Composes triangle_count (degree-oriented wedge join — no all-pairs)
    with the degree relation; one extra equi-join, coefficient rounded
    to 1e-6.
    """
    und = _undirected(edges, src, dst)
    deg = (
        und.select(F.col("a").alias("node"))
        .unionByName(und.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    tri = triangle_count(edges, src=src, dst=dst)
    wedges = (F.col("deg") * (F.col("deg") - 1) / 2).cast("double")
    return (
        deg.join(tri, "node", "left")
        .withColumn("triangles", F.coalesce(F.col("triangles"), F.lit(0)))
        .withColumn(
            "coefficient",
            F.when(F.col("deg") >= 2, F.round(F.col("triangles") / wedges, 6))
            .otherwise(F.lit(0.0)),
        )
        .select("node", "deg", "triangles", "coefficient")
    )


def bipartiteness(
    edges: DataFrame,
    rounds: int = 8,
    src: str = "src",
    dst: str = "dst",
    checkpoint: bool = True,
) -> DataFrame:
    """Per-component bipartiteness audit via BFS 2-coloring — is this
    graph really two-mode? Host<->entity and doc<->term relations are
    bipartite BY CONSTRUCTION; after joins, canonical collapses, or a
    buggy edge build, same-side edges leak in silently and every
    butterfly/k-wing count downstream (graph/bipartite.py) is quietly
    wrong. This lane makes the assumption checkable: color = parity of
    the shortest distance from the component's minimum node, and every
    same-parity edge is an odd-cycle witness.

    Shape: connected components (canon/cc.py, with its driver fallback
    and hub salting) label each node; one multi-root BFS over ALL
    components at once (components are disjoint, so no per-source state
    — just (node, dist) with the q218 frontier/anti-join discipline and
    per-round localCheckpoint); one parity self-join counts conflict
    edges. ``rounds`` must cover the component radius from the min
    node — the same bounded-round contract as graph/paths.py.

    Returns (component, n_nodes, n_conflicts, is_bipartite).
    """
    from ..canon.cc import connected_components

    e = edges.select(F.col(src).alias("u"), F.col(dst).alias("v")).filter(
        F.col("u") != F.col("v")
    )
    sym = e.unionByName(
        e.select(F.col("v").alias("u"), F.col("u").alias("v"))
    ).distinct()
    if checkpoint:
        sym = sym.localCheckpoint(eager=True)
    comp = connected_components(sym, src="u", dst="v")
    if checkpoint:
        comp = comp.localCheckpoint(eager=True)

    frontier = comp.select(F.col("component").alias("node")).distinct()
    frontier = frontier.select("node", F.lit(0).alias("dist"))
    visited = frontier
    for lvl in range(1, rounds + 1):
        nxt = (
            frontier.join(sym, frontier.node == sym.u)
            .select(F.col("v").alias("node"))
            .distinct()
            .join(visited.select("node"), "node", "left_anti")
            .select("node", F.lit(lvl).alias("dist"))
        )
        if checkpoint:
            nxt = nxt.localCheckpoint(eager=True)
        if nxt.limit(1).count() == 0:
            break
        visited = visited.unionByName(nxt)
        if checkpoint:
            visited = visited.localCheckpoint(eager=True)
        frontier = nxt

    color = visited.select(
        "node", (F.col("dist") % 2).alias("par")
    )
    conflicts = (
        sym.filter(F.col("u") < F.col("v"))
        .join(color.select(F.col("node").alias("u"), F.col("par").alias("pu")), "u")
        .join(color.select(F.col("node").alias("v"), F.col("par").alias("pv")), "v")
        .filter(F.col("pu") == F.col("pv"))
        .join(comp.select(F.col("node").alias("u"), "component"), "u")
        .groupBy("component")
        .agg(F.count(F.lit(1)).alias("n_conflicts"))
    )
    sizes = comp.groupBy("component").agg(F.count(F.lit(1)).alias("n_nodes"))
    return (
        sizes.join(conflicts, "component", "left")
        .select(
            "component",
            "n_nodes",
            F.coalesce("n_conflicts", F.lit(0)).alias("n_conflicts"),
            (F.coalesce("n_conflicts", F.lit(0)) == 0).alias(
                "is_bipartite"
            ),
        )
    )
