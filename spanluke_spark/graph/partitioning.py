"""Graph partitioning quality diagnostic — before shipping a 10^12-edge
graph job, measure what the default hash partitioner actually does to
it: the edge-cut fraction (cut edges = network traffic in every
iterative algorithm: PageRank, CC, BFS all pay one message per cut edge
per round) and the partition load balance (the straggler bound).

One pass over the edge list with codegen hash expressions + two small
aggregates — no shuffle of the edge list itself beyond the per-partition
rollups. Uses the portable md5-derived hash so the measurement is
engine-reproducible (and SQL-oracle-checkable); swap portable_hash64 for
F.xxhash64 when measuring Spark's own HashPartitioner placement.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..dedup.dedup import portable_hash64


def partition_quality(
    edges: DataFrame,
    n_partitions: int,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """edges(src, dst) -> one row: (n_partitions, n_edges, cut_edges,
    cut_frac, n_nodes, max_part_nodes, avg_part_nodes, node_balance)
    for hash placement node -> h(node) % n_partitions. node_balance =
    max/avg partition population (1.0 = perfect)."""
    e = edges.select(
        (portable_hash64(F.col(src)) % n_partitions).alias("p_src"),
        (portable_hash64(F.col(dst)) % n_partitions).alias("p_dst"),
    )
    edge_stats = e.agg(
        F.count(F.lit(1)).alias("n_edges"),
        F.sum(
            (F.col("p_src") != F.col("p_dst")).cast("long")
        ).alias("cut_edges"),
    )
    nodes = (
        edges.select(F.col(src).alias("node"))
        .unionByName(edges.select(F.col(dst).alias("node")))
        .distinct()
        .select((portable_hash64(F.col("node")) % n_partitions).alias("p"))
    )
    loads = nodes.groupBy("p").agg(F.count(F.lit(1)).alias("n"))
    node_stats = loads.agg(
        F.sum("n").alias("n_nodes"),
        F.max("n").alias("max_part_nodes"),
        (F.sum("n") / F.count(F.lit(1))).alias("avg_part_nodes"),
    )
    return (
        edge_stats.crossJoin(F.broadcast(node_stats))
        .select(
            F.lit(n_partitions).alias("n_partitions"),
            "n_edges",
            "cut_edges",
            (F.col("cut_edges") / F.col("n_edges")).alias("cut_frac"),
            "n_nodes",
            "max_part_nodes",
            "avg_part_nodes",
            (F.col("max_part_nodes") / F.col("avg_part_nodes")).alias(
                "node_balance"
            ),
        )
    )


def degree_assortativity(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Degree assortativity coefficient (Newman 2002) of the undirected
    view of the graph -> one row (assortativity, n_edges, n_nodes):
    Pearson correlation of endpoint degrees over the symmetrized edge
    list. Social graphs are assortative (r > 0); the web graph is
    famously DISassortative (hubs link to leaves, r < 0) — a quick
    sanity signal that an extracted link graph looks like a real web
    graph rather than a parser artifact.

    Shape: endpoint-degree aggregate, two equi-joins to decorate each
    edge with its endpoint degrees, one moments aggregate. The Pearson
    ratio is computed from explicit sums with try_divide so a
    degree-REGULAR graph (zero variance — e.g. a ring) yields NULL, the
    same answer SQL corr() gives, instead of an ANSI divide-by-zero.
    The ratio form makes sample-vs-population conventions cancel, so
    the SQL oracle matches exactly.
    """
    e = edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    sym = e.unionByName(
        e.select(F.col("b").alias("a"), F.col("a").alias("b"))
    )
    deg = sym.groupBy(F.col("a").alias("node")).agg(
        F.count(F.lit(1)).alias("deg")
    )
    decorated = (
        sym.join(deg.withColumnRenamed("node", "a"), "a")
        .withColumnRenamed("deg", "deg_a")
        .join(
            deg.select(
                F.col("node").alias("b"), F.col("deg").alias("deg_b")
            ),
            "b",
        )
        .select(
            "a",
            F.col("deg_a").cast("double").alias("x"),
            F.col("deg_b").cast("double").alias("y"),
        )
    )
    moments = decorated.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.countDistinct("a").alias("n_nodes"),
    )
    r = F.try_divide(
        F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy"),
        F.sqrt(
            (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"))
            * (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy"))
        ),
    )
    return moments.select(
        r.alias("assortativity"),
        (F.col("n") / 2).cast("long").alias("n_edges"),
        "n_nodes",
    )


def shard_move_analysis(
    df: DataFrame,
    key_col: str,
    n_before: int,
    n_after: int,
) -> DataFrame:
    """Rebalancing cost of growing a cluster from ``n_before`` to
    ``n_after`` shards, for two placement schemes -> two rows
    (scheme, n_keys, n_moved, move_frac):

    * ``mod``: shard = h(key) % n — the naive scheme; nearly EVERY key
      moves when n changes (move_frac -> 1 - 1/lcm-ish), which at 10^12
      keys means a full-corpus reshuffle on every resize;
    * ``rendezvous``: highest-random-weight placement (Thaler-Ravishankar
      1998) — shard = argmax over shards of h(key, shard); growing the
      cluster moves EXACTLY the keys the new shards win, ~ (n_after -
      n_before) / n_after of them, the provable minimum.

    The HRW argmax is a bounded explode (n_after scores per key, shards
    are a constant) + one max_by — no windows over the key stream, and
    the whole analysis is one linear pass per scheme. Hashes are the
    portable md5 family, so the SQL oracle replays placement exactly.
    """
    keys = df.select(F.col(key_col).cast("string").alias("k")).distinct()

    def _mod(n: int):
        return portable_hash64(F.col("k")) % n

    def _hrw(n: int):
        scores = F.array(
            *[
                F.struct(
                    portable_hash64(
                        F.concat_ws("#", F.col("k"), F.lit(str(s)))
                    ).alias("score"),
                    F.lit(s).alias("shard"),
                )
                for s in range(n)
            ]
        )
        return F.array_max(scores)["shard"]

    assigned = keys.select(
        "k",
        _mod(n_before).alias("mod_before"),
        _mod(n_after).alias("mod_after"),
        _hrw(n_before).alias("hrw_before"),
        _hrw(n_after).alias("hrw_after"),
    )
    mod_row = assigned.agg(
        F.lit("mod").alias("scheme"),
        F.count(F.lit(1)).alias("n_keys"),
        F.sum(
            (F.col("mod_before") != F.col("mod_after")).cast("long")
        ).alias("n_moved"),
    )
    hrw_row = assigned.agg(
        F.lit("rendezvous").alias("scheme"),
        F.count(F.lit(1)).alias("n_keys"),
        F.sum(
            (F.col("hrw_before") != F.col("hrw_after")).cast("long")
        ).alias("n_moved"),
    )
    return (
        mod_row.unionByName(hrw_row)
        .withColumn("move_frac", F.col("n_moved") / F.col("n_keys"))
    )


def attribute_assortativity(
    edges: DataFrame,
    attrs: DataFrame,
    src: str = "src",
    dst: str = "dst",
    node_col: str = "node",
    attr_col: str = "attr",
) -> DataFrame:
    """Categorical (attribute) assortativity (Newman 2003, eq. 2) — the
    homophily coefficient of the link graph by a discrete node attribute
    (language, TLD, topic): r = (sum_i e_ii - sum_i a_i b_i) /
    (1 - sum_i a_i b_i), where e_ij is the fraction of DIRECTED edges
    from category i to category j, a_i / b_i its row / column sums.
    r = 1 means perfectly homophilous linking ("English pages only link
    English pages"), 0 random mixing, negative disassortative. NULL when
    the denominator degenerates (all edges in one category).

    Shape: two attribute joins onto the edge list, one category-pair
    aggregate (bounded by |categories|^2), all ratio arithmetic on the
    tiny pair relation — exact integer counts in, single float
    expressions out. -> one row (r_assort, n_edges, n_cats).
    """
    a_s = attrs.select(F.col(node_col).alias(src), F.col(attr_col).alias("ca"))
    a_d = attrs.select(F.col(node_col).alias(dst), F.col(attr_col).alias("cb"))
    pair = (
        edges.select(src, dst)
        .join(a_s, src)
        .join(a_d, dst)
        .groupBy("ca", "cb")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    tot = pair.agg(
        F.sum("n").alias("m"),
        F.countDistinct("ca").alias("nca"),
        F.countDistinct("cb").alias("ncb"),
    )
    diag = pair.where(F.col("ca") == F.col("cb")).agg(
        F.coalesce(F.sum("n"), F.lit(0)).alias("diag")
    )
    row_m = pair.groupBy("ca").agg(F.sum("n").alias("ra"))
    col_m = pair.groupBy("cb").agg(F.sum("n").alias("rb"))
    ab = (
        row_m.join(col_m, F.col("ca") == F.col("cb"))
        .agg(F.coalesce(F.sum(F.col("ra") * F.col("rb")), F.lit(0)).alias("sab"))
    )
    joined = tot.crossJoin(F.broadcast(diag)).crossJoin(F.broadcast(ab))
    m = F.col("m")
    e_ii = F.col("diag") / m
    aibi = F.col("sab") / (m * m)
    r = F.when(aibi < 1.0, (e_ii - aibi) / (1.0 - aibi))
    return joined.select(
        F.round(r, 6).alias("r_assort"),
        m.alias("n_edges"),
        F.greatest(F.col("nca"), F.col("ncb")).alias("n_cats"),
    )


def modularity(
    edges: DataFrame,
    membership: DataFrame,
    src: str = "src",
    dst: str = "dst",
    node_col: str = "node",
    community_col: str = "community",
) -> DataFrame:
    """Newman-Girvan modularity of a GIVEN partition (the quality score
    for q66's label-propagation communities, k-core shells, or any
    clustering): per community c over the undirected simple graph,
    Q_c = intra_c / m - (deg_c / 2m)^2, and Q = sum_c Q_c in [-1/2, 1).

    -> (community, n_nodes, intra_edges, deg_sum, q_contrib). Exact
    integer counts in (undirected edge count, intra counts, degree
    sums), two float expressions out — bit-identical in the oracle.
    Shape: one dedup of the edge list, two membership joins, aggregates
    keyed by community; the only global value is the 1-row edge count
    (broadcast crossJoin, the pagerank discipline)."""
    und = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("a"),
            F.greatest(F.col(src), F.col(dst)).alias("b"),
        )
        .where(F.col("a") != F.col("b"))
        .distinct()
    )
    mem = membership.select(
        F.col(node_col).alias("node"), F.col(community_col).alias("c")
    )
    m_row = und.agg(F.count(F.lit(1)).alias("m"))
    deg = (
        und.select(F.col("a").alias("node"))
        .unionByName(und.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    comm = (
        deg.join(mem, "node")
        .groupBy("c")
        .agg(
            F.count(F.lit(1)).alias("n_nodes"),
            F.sum("deg").alias("deg_sum"),
        )
    )
    intra = (
        und.join(mem.select(F.col("node").alias("a"), F.col("c").alias("ca")), "a")
        .join(mem.select(F.col("node").alias("b"), F.col("c").alias("cb")), "b")
        .where(F.col("ca") == F.col("cb"))
        .groupBy(F.col("ca").alias("c"))
        .agg(F.count(F.lit(1)).alias("intra_edges"))
    )
    out = comm.join(intra, "c", "left").crossJoin(F.broadcast(m_row))
    q = (
        F.coalesce(F.col("intra_edges"), F.lit(0)) / F.col("m")
        - (F.col("deg_sum") / (2.0 * F.col("m")))
        * (F.col("deg_sum") / (2.0 * F.col("m")))
    )
    return out.select(
        F.col("c").alias(community_col),
        "n_nodes",
        F.coalesce(F.col("intra_edges"), F.lit(0)).alias("intra_edges"),
        "deg_sum",
        F.round(q, 6).alias("q_contrib"),
    )


def louvain_rounds(
    edges: DataFrame,
    rounds: int = 2,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Synchronous Louvain phase-1 sweeps (Blondel et al. 2008, "Fast
    unfolding of communities in large networks") — ``rounds`` rounds of
    simultaneous best-modularity-gain moves from singleton communities
    over the undirected simple graph. The MOVE step that modularity()
    scores: each node weighs joining each NEIGHBOR community C against
    leaving its current one A,

        gain(i, A -> C)  ∝  2m·(k_iC - k_iA\\i) - k_i·(Σtot_C - Σtot_A\\i)

    carried as that EXACT scaled integer (the float ΔQ divides by the
    positive constant 2m², which cannot change the argmax), so move
    decisions — the discrete output — are bit-reproducible and the SQL
    oracle replays every round (q270). Ties break to the smallest
    community id; a node moves only on strictly positive gain.

    Classic Louvain sweeps nodes SEQUENTIALLY; naive all-at-once
    parallel moves are known to oscillate and can DECREASE modularity
    (two communities swapping members against the same snapshot). The
    standard distributed mitigation is to stagger movers into disjoint
    classes per sub-round (Grappolo's coloring heuristic —
    Lu/Halappanavar/Kalyanaraman 2015, "Parallel heuristics for
    scalable community detection"); this implementation uses the
    2-class parity relaxation: round r moves only nodes with
    node % 2 == r % 2, everyone else holds. On the planted-block pytest
    fixtures this is monotone in Q and converges to the blocks;
    deterministic at every fixed round count, which is what the engine
    contracts — callers gate quality with modularity(), and the phase-2
    graph coarsening is a groupBy once labels stabilize.

    Relational shape per round: one community-size aggregate, one
    neighbor-community count (equi-join of the symmetric edge list
    against the label relation, map-side-combinable count), one keyed
    window for the per-node argmax, one localCheckpoint. -> (node,
    community)."""
    und = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("a"),
            F.greatest(F.col(src), F.col(dst)).alias("b"),
        )
        .where(F.col("a") != F.col("b"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    nbr = und.unionByName(
        und.select(F.col("b").alias("a"), F.col("a").alias("b"))
    ).localCheckpoint(eager=True)
    deg = nbr.groupBy(F.col("a").alias("node")).agg(F.count(F.lit(1)).alias("ki"))
    m = und.count()
    comm = deg.select("node", F.col("node").alias("community"))
    for r in range(rounds):
        st = (
            comm.join(deg, "node")
            .groupBy("community")
            .agg(F.sum("ki").alias("tot"))
        )
        kc = (
            nbr.join(
                comm.select(F.col("node").alias("b"), "community"), "b"
            )
            .groupBy(F.col("a").alias("node"), "community")
            .agg(F.count(F.lit(1)).alias("kic"))
        )
        cur = (
            comm.select("node", F.col("community").alias("cur_comm"))
            .join(deg, "node")
            .join(
                kc.select(
                    "node",
                    F.col("community").alias("cur_comm"),
                    F.col("kic").alias("kia"),
                ),
                ["node", "cur_comm"],
                "left",
            )
            .withColumn("kia", F.coalesce("kia", F.lit(0)))
            .join(
                st.select(
                    F.col("community").alias("cur_comm"), F.col("tot").alias("tota")
                ),
                "cur_comm",
            )
        )
        cand = (
            kc.join(cur, "node")
            .where(F.col("community") != F.col("cur_comm"))
            .where((F.col("node") % 2) == (r % 2))
            .join(st, "community")
            .select(
                "node",
                "community",
                "cur_comm",
                (
                    F.lit(2 * m) * (F.col("kic") - F.col("kia"))
                    - F.col("ki")
                    * (F.col("tot") - (F.col("tota") - F.col("ki")))
                ).alias("gain2"),
            )
            .where(F.col("gain2") > 0)
        )
        w = Window.partitionBy("node").orderBy(
            F.col("gain2").desc(), F.col("community").asc()
        )
        best = (
            cand.withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") == 1)
            .select("node", F.col("community").alias("new_comm"))
        )
        comm = (
            comm.join(best, "node", "left")
            .select(
                "node", F.coalesce("new_comm", "community").alias("community")
            )
            .localCheckpoint(eager=True)
        )
    return comm
