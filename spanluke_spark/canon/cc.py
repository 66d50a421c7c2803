"""Connected components for entity canonicalization (SURVEY.md §4.6).

Hand-rolled alternating large-star/small-star (Kiveris et al., "Connected
Components in MapReduce and Beyond", SoCC'14) on plain DataFrames — no
GraphFrames dependency. Converges in O(log^2 n) rounds even on skewed/giant
components; every round is two hash shuffles. ``localCheckpoint`` per round
truncates the lineage so plans don't grow unboundedly.

Also ships a pure-Python union-find oracle for tests (SURVEY.md §5.2.4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _star_round(
    edges: DataFrame,
    large: bool,
    hot: list[int] | None = None,
    salt: int = 16,
) -> DataFrame:
    """One large-star (emit (v, m) for v > u) or small-star (v <= u) round.

    edges: symmetric (u, v) pairs. m = min(N(u) ∪ {u}).

    Skew: the neighbor-min ``groupBy`` itself is safe at any degree — min is
    algebraic, so Catalyst's map-side partial aggregation caps reduce input
    per key at #map-partitions rows. The hot spot is the JOIN back onto the
    edges: a hub's entire adjacency hashes to ONE join task. When ``hot``
    (hub node ids from the per-round degree probe) is non-empty, those
    keys' edges join on (u, xxhash64(v) % salt) against their nbr_min rows
    replicated ``salt`` times — a hub's rows spread across ``salt`` tasks —
    while every cold key takes the plain join untouched.
    """
    nbr_min = edges.groupBy("u").agg(F.min("v").alias("_mv")).select(
        "u", F.least(F.col("_mv"), F.col("u")).alias("m")
    )
    if hot:
        hot_col = F.col("u").isin([int(h) for h in hot])
        nbr_rep = nbr_min.filter(hot_col).select(
            "u", "m", F.explode(F.sequence(F.lit(0), F.lit(salt - 1))).alias("_s")
        )
        joined_hot = (
            edges.filter(hot_col)
            .withColumn("_s", F.pmod(F.xxhash64("v"), F.lit(salt)).cast("int"))
            .join(nbr_rep, ["u", "_s"])
            .drop("_s")
        )
        joined = (
            edges.filter(~hot_col).join(nbr_min.filter(~hot_col), "u")
            .unionByName(joined_hot)
        )
    else:
        joined = edges.join(nbr_min, "u")
    if large:
        out = joined.filter(F.col("v") > F.col("u")).select(
            F.col("v").alias("a"), F.col("m").alias("b")
        )
    else:
        out = joined.filter(F.col("v") <= F.col("u")).select(
            F.col("v").alias("a"), F.col("m").alias("b")
        )
        # keep (u, m) too so u stays attached to its min
        out = out.unionByName(joined.select(F.col("u").alias("a"), F.col("m").alias("b")))
    sym = out.filter(F.col("a") != F.col("b"))
    return (
        sym.select(F.col("a").alias("u"), F.col("b").alias("v"))
        .unionByName(sym.select(F.col("b").alias("u"), F.col("a").alias("v")))
        .distinct()
    )


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 50,
    driver_threshold: int = 100_000,
    skew_degree_threshold: int = 500_000,
    skew_salt: int = 16,
    stats: dict | None = None,
) -> DataFrame:
    """edges(src, dst) -> (node, component) with component = min node id.

    Iterates large-star/small-star to fixpoint (checksum-stable edge set),
    then reads components off the final star edges. Isolated self-loop-only
    nodes map to themselves.

    Hybrid execution (same idea as Spark's broadcast-join threshold): an
    edge set at or below ``driver_threshold`` is collected and resolved with
    union-find on the driver — each star round costs several full Spark jobs,
    which dwarfs a tiny graph. Dedup/canonicalization pair graphs are usually
    exactly that: collision-sized, not corpus-sized. Above the threshold the
    distributed alternating-star algorithm runs unchanged; 0 disables the
    driver path.

    ``stats`` (optional dict) is filled in-place with convergence evidence:
    {"mode": "driver"|"distributed", "rounds": k, "edges_initial": n,
    "edges_final": n} — the giant-component stress test asserts the round
    count stays O(log^2 n) (tests/test_cc_stress.py).
    """
    base = edges.select(
        F.col(src).cast("long").alias("u"), F.col(dst).cast("long").alias("v")
    )
    # ONE checkpoint feeds both the node universe and the working edge set:
    # deriving nodes from the raw input would re-evaluate the whole upstream
    # pair-generation pipeline a second time (measured ~2x the q45 dedup
    # block). The symmetric union keeps self-loop rows so isolated
    # self-loop-only nodes still appear as u.
    sym_all = (
        base.unionByName(base.selectExpr("v as u", "u as v"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    nodes = sym_all.select(F.col("u").alias("node")).distinct()
    e = sym_all.filter(F.col("u") != F.col("v"))

    if driver_threshold:
        # r6: ONE limited collect both probes the size and (when small)
        # delivers the edges — the previous limit+count then collect pair
        # spent two jobs on the same checkpointed set
        probe_rows = e.limit(driver_threshold + 1).collect()
        if len(probe_rows) <= driver_threshold:
            if stats is not None:
                stats.update(mode="driver", rounds=0, edges_initial=len(probe_rows))
            spark = edges.sparkSession
            pairs = [(r["u"], r["v"]) for r in probe_rows]
            comp = py_union_find(pairs)
            # r6 (guide §3.1): in driver mode the whole result is bounded by
            # construction (nodes <= 2 * driver_threshold rows of longs), so
            # hint it broadcastable — downstream consumers (dedup_keep's
            # left_anti survivor pass) then join it map-side instead of
            # shuffling the corpus. The distributed path below stays unhinted.
            if not comp:
                return F.broadcast(nodes.select("node", F.col("node").alias("component")))
            mapping = spark.createDataFrame(
                list(comp.items()), "node long, component long"
            )
            return F.broadcast(
                nodes.join(mapping, "node", "left")
                .withColumn("component", F.coalesce("component", F.col("node")))
                .select("node", "component")
            )

    def signature(df: DataFrame) -> tuple:
        row = df.agg(
            F.count(F.lit(1)).alias("n"),
            # modular sum: order-insensitive and overflow-free under ANSI mode
            F.sum(F.pmod(F.xxhash64("u", "v"), F.lit(2147483647))).alias("h"),
        ).first()
        return (row["n"], row["h"])

    def hot_keys(df: DataFrame) -> list[int]:
        """Per-round hub probe: node ids whose degree exceeds
        skew_degree_threshold (top 1000 — beyond that the cold path still
        works, just unsalted). Re-probed every round because star
        contraction MOVES the hub: the component min accumulates the
        collapsed component's adjacency, so a round-0 snapshot goes stale.
        One small two-stage agg job per round; threshold 0 disables."""
        if not skew_degree_threshold:
            return []
        rows = (
            df.groupBy("u")
            .agg(F.count(F.lit(1)).alias("d"))
            .filter(F.col("d") > skew_degree_threshold)
            .orderBy(F.desc("d"))
            .limit(1000)
            .collect()
        )
        return [int(r["u"]) for r in rows]

    # One action per round: the checksum agg doubles as the emptiness check
    # (n == 0), so no separate isEmpty() job.
    prev_sig = signature(e)
    rounds = 0
    edges_initial = prev_sig[0]
    ever_salted = False
    for _ in range(max_iter):
        if prev_sig[0] == 0:
            break
        hot = hot_keys(e)
        ever_salted = ever_salted or bool(hot)
        e = _star_round(e, large=True, hot=hot, salt=skew_salt)
        e = _star_round(e, large=False, hot=hot, salt=skew_salt).localCheckpoint(
            eager=True
        )
        rounds += 1
        sig = signature(e)
        if sig == prev_sig:
            break
        prev_sig = sig
    if stats is not None:
        stats.update(
            mode="distributed",
            rounds=rounds,
            edges_initial=edges_initial,
            edges_final=prev_sig[0],
            salted=ever_salted,
        )

    # At fixpoint every edge connects a node to its component min.
    comp = e.groupBy(F.col("u").alias("node")).agg(F.min("v").alias("component"))
    comp = comp.withColumn(
        "component", F.least(F.col("component"), F.col("node"))
    )
    return (
        nodes.join(comp, "node", "left")
        .withColumn("component", F.coalesce("component", F.col("node")))
        .select("node", "component")
    )


def py_union_find(edges: list[tuple[int, int]]) -> dict[int, int]:
    """Oracle: component = min node id, pure-Python union-find."""
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        for n in (a, b):
            parent.setdefault(n, n)
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # normalize to min-id representative
    out = {}
    for n in parent:
        out[n] = find(n)
    return out


def incremental_cc(
    labels: DataFrame,
    new_edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    **cc_kwargs,
) -> DataFrame:
    """Incremental connected components: fold a batch of NEW edges into an
    existing (node, component) labeling without re-running CC over the
    full edge set — the daily-crawl-delta case, where the pair graph is
    10^11 edges but a day adds 10^7.

    Method (the contraction step of incremental CC, cf. FastSV-style
    batch updates): map each new edge through the current labels
    (left join — unseen nodes label themselves), giving an edge set over
    COMPONENT REPRESENTATIVES; run the ordinary CC over that contracted
    graph (its size is bounded by the delta, never the corpus); compose
    the old labeling through the contraction's relabeling. Because both
    CC passes label with the MIN node id, the composed labeling is
    IDENTICAL to a from-scratch CC over old ∪ new edges — a property the
    q141 oracle re-proves every round.

    Cost: two broadcast-sized joins against the delta + one CC over the
    contracted delta graph + ONE equi-join to relabel the (node,
    component) table — the only pass that touches corpus-scale data, and
    it is join-only (no iteration).
    """
    e = new_edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    lab_s = labels.select(
        F.col("node").alias("src"), F.col("component").alias("src_rep")
    )
    lab_d = labels.select(
        F.col("node").alias("dst"), F.col("component").alias("dst_rep")
    )
    contracted = (
        e.join(lab_s, "src", "left")
        .join(lab_d, "dst", "left")
        .select(
            F.coalesce(F.col("src_rep"), F.col("src")).alias("src"),
            F.coalesce(F.col("dst_rep"), F.col("dst")).alias("dst"),
        )
    )
    delta_cc = connected_components(contracted, **cc_kwargs).select(
        F.col("node").alias("component"), F.col("component").alias("new_rep")
    )
    # relabel old table; components untouched by the delta keep their label
    relabeled = labels.join(delta_cc, "component", "left").select(
        "node", F.coalesce(F.col("new_rep"), F.col("component")).alias("component")
    )
    # nodes that are brand new (appear only in the delta)
    known = labels.select("node")
    new_nodes = (
        contracted.selectExpr("src AS node")
        .union(contracted.selectExpr("dst AS node"))
        .distinct()
        .join(known, "node", "left_anti")
        .withColumnRenamed("node", "component_key")
    )
    fresh = (
        new_nodes.join(
            delta_cc.withColumnRenamed("component", "component_key"),
            "component_key",
            "left",
        )
        .select(
            F.col("component_key").alias("node"),
            F.coalesce(F.col("new_rep"), F.col("component_key")).alias("component"),
        )
    )
    return relabeled.unionByName(fresh)
