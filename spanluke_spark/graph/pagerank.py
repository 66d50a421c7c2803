"""Relational PageRank — power iteration as join + aggregate, the canonical
web-scale iterative algorithm over the extracted link graph (links.py).

Per round: one broadcastable join of ranks onto edges, one hash agg by dst
(map-side partial), plus a tiny dangling-mass aggregate; localCheckpoint
truncates lineage so the plan stays flat across iterations (same discipline
as canon/cc.py and link/kmeans.py). Deterministic: no RNG, fixed iteration
count, stable initial rank 1/N.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    iters: int = 2,
    damping: float = 0.85,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """edges(src, dst) -> (node, rank) after ``iters`` power iterations.

    rank'(v) = (1-d)/N + d * (sum_{u->v} rank(u)/outdeg(u) + dangling/N)
    where dangling = total rank of nodes with no out-edges (their mass
    redistributes uniformly — the standard correction). Parallel edges
    carry proportional weight.
    """
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n_total = nodes.count()  # one scalar; the iteration stays lazy per round
    outdeg = e.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))

    ranks = nodes.withColumn("rank", F.lit(1.0 / n_total))
    for _ in range(iters):
        with_deg = ranks.join(outdeg, ranks.node == outdeg.src, "left").select(
            "node", "rank", "outdeg"
        )
        # dangling mass stays IN the plan as a broadcast 1-row aggregate —
        # no driver action per round; the only action is the round-closing
        # localCheckpoint that truncates lineage.
        dangling = with_deg.filter(F.col("outdeg").isNull()).agg(
            F.coalesce(F.sum("rank"), F.lit(0.0)).alias("m")
        )
        contrib = (
            e.join(
                with_deg.filter(F.col("outdeg").isNotNull()).select(
                    F.col("node").alias("src"),
                    (F.col("rank") / F.col("outdeg")).alias("share"),
                ),
                "src",
            )
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum("share").alias("inflow"))
        )
        rank_expr = (
            F.lit((1.0 - damping) / n_total)
            + F.lit(damping) * F.col("m") / F.lit(float(n_total))
        ) + F.lit(damping) * F.coalesce("inflow", F.lit(0.0))
        ranks = (
            nodes.join(contrib, "node", "left")
            .crossJoin(F.broadcast(dangling))
            .select("node", rank_expr.alias("rank"))
            .localCheckpoint(eager=True)
        )
    return ranks


def hits(
    edges: DataFrame,
    iters: int = 2,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """HITS hubs & authorities (Kleinberg) -> (node, hub, auth) after
    ``iters`` mutual-reinforcement rounds over the DISTINCT edge set:
    auth(v) = Σ hub(u) over u→v, then hub(u) = Σ auth(v) over u→v, each
    L2-normalized per round (1-row broadcast aggregate — same shape as
    PageRank's dangling-mass correction). Deterministic: all-ones init,
    fixed round count, no RNG; per-round localCheckpoint keeps the plan
    flat. The web-graph complement to PageRank: authorities are what good
    hubs point at — the classic seed-set signal for crawl frontier and
    alias-source selection."""
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst")).distinct()
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    hub = nodes.withColumn("hub", F.lit(1.0))

    def _norm(df: DataFrame, col: str) -> DataFrame:
        n = df.agg(F.sqrt(F.sum(F.col(col) * F.col(col))).alias("_n"))
        return df.crossJoin(F.broadcast(n)).select(
            "node", (F.col(col) / F.col("_n")).alias(col)
        )

    auth = None
    for _ in range(iters):
        auth = (
            e.join(hub.withColumnRenamed("node", "src"), "src")
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum("hub").alias("auth"))
        )
        auth = _norm(
            nodes.join(auth, "node", "left").fillna(0.0, ["auth"]), "auth"
        ).localCheckpoint(eager=True)
        hub = (
            e.join(auth.withColumnRenamed("node", "dst"), "dst")
            .groupBy(F.col("src").alias("node"))
            .agg(F.sum("auth").alias("hub"))
        )
        hub = _norm(
            nodes.join(hub, "node", "left").fillna(0.0, ["hub"]), "hub"
        ).localCheckpoint(eager=True)
    return hub.join(auth, "node")


def trustrank(
    edges: DataFrame,
    seeds: DataFrame,
    iters: int = 2,
    damping: float = 0.85,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Seed-biased PageRank (TrustRank, Gyongyi et al. VLDB 2004): the
    teleport vector concentrates on a hand-vetted trusted seed set, so
    trust flows OUT of the seeds along links and link-spam islands that
    good pages never cite get ~0 — the standard crawl-frontier spam
    demotion signal.

    rank'(v) = (1-d)*t(v) + d * (inflow(v) + dangling * t(v)) with
    t(v) = 1/|S| on seeds(node), else 0 (dangling mass re-teleports
    through t, preserving total mass = 1). Same relational shape as
    ``pagerank``: per round one edge join + one hash agg + a 1-row
    dangling broadcast; the seed set is broadcast onto nodes once.
    Deterministic: fixed rounds, no RNG.
    """
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    s = seeds.select("node").distinct().localCheckpoint(eager=True)
    n_seeds = s.count()
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .unionByName(s)
        .distinct()
        .localCheckpoint(eager=True)
    )
    teleport = nodes.join(
        F.broadcast(s.withColumn("_s", F.lit(1))), "node", "left"
    ).select(
        "node",
        F.when(F.col("_s").isNotNull(), 1.0 / n_seeds)
        .otherwise(0.0)
        .alias("t"),
    ).localCheckpoint(eager=True)
    outdeg = e.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))

    ranks = teleport.select("node", F.col("t").alias("rank"))
    for _ in range(iters):
        with_deg = ranks.join(outdeg, ranks.node == outdeg.src, "left").select(
            "node", "rank", "outdeg"
        )
        dangling = with_deg.filter(F.col("outdeg").isNull()).agg(
            F.coalesce(F.sum("rank"), F.lit(0.0)).alias("m")
        )
        contrib = (
            e.join(
                with_deg.filter(F.col("outdeg").isNotNull()).select(
                    F.col("node").alias("src"),
                    (F.col("rank") / F.col("outdeg")).alias("share"),
                ),
                "src",
            )
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum("share").alias("inflow"))
        )
        rank_expr = (
            F.lit(1.0 - damping) * F.col("t")
            + F.lit(damping)
            * (F.coalesce("inflow", F.lit(0.0)) + F.col("m") * F.col("t"))
        )
        ranks = (
            teleport.join(contrib, "node", "left")
            .crossJoin(F.broadcast(dangling))
            .select("node", rank_expr.alias("rank"))
            .localCheckpoint(eager=True)
        )
    return ranks


def opic(
    edges: DataFrame,
    rounds: int = 5,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """OPIC — On-line Page Importance Computation (Abiteboul, Preda &
    Cobena, WWW'03), the importance measure DESIGNED for crawl
    scheduling: every page holds cash; each round a page credits its
    cash to its history and distributes it equally over its out-links
    (dangling cash is split uniformly, the paper's virtual-node trick).
    Importance = (history + cash) / total — unlike PageRank there is no
    damping and cash is CONSERVED (sum stays n every round), so after R
    rounds the denominator is the closed form n * (R + 1) and the
    estimate never needs a normalization pass.

    -> (node, history, cash, importance). Per round: one equi-join +
    one map-side-combinable sum + a 1-row dangling aggregate broadcast
    back (the pagerank discipline), lineage truncated per round. The
    fixed-round synchronous form of the paper's asynchronous process —
    deterministic, oracle-unrollable.
    """
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst")).where(
        F.col("src") != F.col("dst")
    ).distinct().localCheckpoint(eager=True)
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n = nodes.count()
    outdeg = e.groupBy(F.col("src").alias("node")).agg(
        F.count(F.lit(1)).alias("outdeg")
    )
    state = nodes.select(
        "node", F.lit(1.0).alias("cash"), F.lit(0.0).alias("history")
    )
    for _ in range(rounds):
        with_deg = state.join(outdeg, "node", "left")
        dangling = with_deg.where(F.col("outdeg").isNull()).agg(
            F.coalesce(F.sum("cash"), F.lit(0.0)).alias("_dang")
        )
        contrib = (
            e.join(
                with_deg.where(F.col("outdeg").isNotNull()).select(
                    F.col("node").alias("src"),
                    (F.col("cash") / F.col("outdeg")).alias("_share"),
                ),
                "src",
            )
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum("_share").alias("_in"))
        )
        state = (
            state.join(contrib, "node", "left")
            .crossJoin(F.broadcast(dangling))
            .select(
                "node",
                (
                    F.coalesce(F.col("_in"), F.lit(0.0))
                    + F.col("_dang") / n
                ).alias("cash"),
                (F.col("history") + F.col("cash")).alias("history"),
            )
            .localCheckpoint(eager=True)
        )
    total = float(n * (rounds + 1))
    return state.select(
        "node",
        F.round("history", 6).alias("history"),
        F.round("cash", 6).alias("cash"),
        F.round((F.col("history") + F.col("cash")) / total, 6).alias("importance"),
    )


def weighted_pagerank(
    edges: DataFrame,
    iters: int = 3,
    damping: float = 0.85,
    src: str = "src",
    dst: str = "dst",
    weight: str = "weight",
) -> DataFrame:
    """Edge-weighted PageRank — the anchor-text / link-prominence form:
    a page splits its vote PROPORTIONALLY to edge weights (repeated or
    prominent links carry more) instead of uniformly over out-links.

    rank'(v) = (1-d)/N + d * (sum_{u->v} rank(u) * w(u,v)/W(u) + dangling/N)
    with W(u) the out-weight sum and dangling the mass of zero-out-weight
    nodes. Same shape as the unweighted form: per round one equi-join,
    one map-side-combinable sum, a 1-row dangling broadcast, a
    localCheckpoint. Parallel (u, v) duplicates are pre-summed so the
    share join stays one row per edge. Non-positive weights raise — a
    silent zero row would corrupt the vote split.
    """
    e = (
        edges.select(
            F.col(src).alias("src"),
            F.col(dst).alias("dst"),
            F.col(weight).cast("double").alias("w"),
        )
        .groupBy("src", "dst")
        .agg(F.sum("w").alias("w"))
        .localCheckpoint(eager=True)
    )
    if e.where(F.col("w") <= 0).limit(1).count() != 0:
        raise ValueError("weighted_pagerank: weights must be positive")
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n_total = nodes.count()
    outw = e.groupBy(F.col("src").alias("node")).agg(F.sum("w").alias("outw"))
    ranks = nodes.withColumn("rank", F.lit(1.0 / n_total))
    for _ in range(iters):
        with_w = ranks.join(outw, "node", "left")
        dangling = with_w.filter(F.col("outw").isNull()).agg(
            F.coalesce(F.sum("rank"), F.lit(0.0)).alias("m")
        )
        contrib = (
            e.join(
                with_w.filter(F.col("outw").isNotNull()).select(
                    F.col("node").alias("src"),
                    (F.col("rank") / F.col("outw")).alias("_per_w"),
                ),
                "src",
            )
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum(F.col("_per_w") * F.col("w")).alias("inflow"))
        )
        rank_expr = (
            F.lit((1.0 - damping) / n_total)
            + F.lit(damping) * F.col("m") / F.lit(float(n_total))
        ) + F.lit(damping) * F.coalesce("inflow", F.lit(0.0))
        ranks = (
            nodes.join(contrib, "node", "left")
            .crossJoin(F.broadcast(dangling))
            .select("node", rank_expr.alias("rank"))
            .localCheckpoint(eager=True)
        )
    return ranks


def personalized_pagerank(
    edges: DataFrame,
    seeds: DataFrame,
    iters: int = 3,
    damping: float = 0.85,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Random walk with restart — PageRank whose teleport vector is
    uniform over ``seeds(node)`` instead of over all nodes (Haveliwala
    2002 topic-sensitive PageRank; Jeh & Widom 2003 "Scaling
    Personalized Web Search"). The stationary mass is a
    proximity-to-the-seed-set score: the engine's relatedness signal for
    entity-linking disambiguation (seeds = a mention's unambiguous
    context entities) and trust-biased crawl frontier ordering (seeds =
    the curated whitelist, the same seed discipline as trustrank()).

        rank'(v) = (1-d)·p(v) + d·(inflow(v) + dangling·p(v))

    with p uniform on the seeds — BOTH leak channels (teleport and
    dangling mass) re-enter at the seeds, so total mass stays 1 and
    pages unreachable from the seed set end at exactly 0, unlike
    pagerank() where every node keeps a (1-d)/N floor. Initial rank is
    p itself (the walk starts at the seeds).

    Same per-round relational shape as pagerank(): one equi-join of
    ranks onto edges, one map-side-combinable sum by dst, a 1-row
    dangling broadcast, a localCheckpoint to keep the plan flat.
    Parallel edges carry proportional weight. Seeds that never appear
    in the edge list still hold their restart mass (unioned into the
    node set). Empty seed set raises — there is no walk to restart.
    """
    e = (
        edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).cast("double").alias("w"))
        .localCheckpoint(eager=True)
    )
    s = seeds.select(F.col("node")).distinct().localCheckpoint(eager=True)
    n_seeds = s.count()
    if n_seeds == 0:
        raise ValueError("personalized_pagerank: seed set is empty")
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .unionByName(s)
        .distinct()
    )
    # restart vector, carried alongside every rank row (0 off the seeds)
    base = nodes.join(
        s.withColumn("_p", F.lit(1.0 / n_seeds)), "node", "left"
    ).select("node", F.coalesce("_p", F.lit(0.0)).alias("p"))
    base = base.localCheckpoint(eager=True)
    outw = e.groupBy(F.col("src").alias("node")).agg(F.sum("w").alias("outw"))
    ranks = base.withColumn("rank", F.col("p"))
    for _ in range(iters):
        with_w = ranks.join(outw, "node", "left")
        dangling = with_w.filter(F.col("outw").isNull()).agg(
            F.coalesce(F.sum("rank"), F.lit(0.0)).alias("m")
        )
        contrib = (
            e.join(
                with_w.filter(F.col("outw").isNotNull()).select(
                    F.col("node").alias("src"),
                    (F.col("rank") / F.col("outw")).alias("_per_w"),
                ),
                "src",
            )
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum(F.col("_per_w") * F.col("w")).alias("inflow"))
        )
        rank_expr = (
            F.lit(1.0 - damping) * F.col("p")
            + F.lit(damping) * F.col("m") * F.col("p")
            + F.lit(damping) * F.coalesce("inflow", F.lit(0.0))
        )
        ranks = (
            base.join(contrib, "node", "left")
            .crossJoin(F.broadcast(dangling))
            .select("node", "p", rank_expr.alias("rank"))
            .localCheckpoint(eager=True)
        )
    return ranks.select("node", "rank")
