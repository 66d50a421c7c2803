"""Structural link prediction over the web/KG graph: common-neighbor and
Adamic-Adar scores (Adamic & Adar 2003; the standard baselines of
Liben-Nowell & Kleinberg 2007, "The Link-Prediction Problem for Social
Networks"). Used for suggesting missing KG edges and crawl frontier
prioritization ("pages co-cited with what we trust").

Relational shape: candidate pairs are OPEN WEDGES — the self-join of the
neighbor list keyed on the shared middle node — so the work is
sum-over-nodes deg² , never |V|² . That sum is dominated by hubs; the
``max_deg`` cap drops middle nodes above the cap before the self-join
(the q112 hub-cap pattern): a 10^6-degree hub would alone contribute
10^12 wedges while adding only 1/ln(10^6) ≈ 0.07 per pair — capping is
both the scale fix and standard practice. Capped nodes are reported via
``dropped_hubs`` so the truncation is never silent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["adamic_adar", "hub_capped_neighbors"]


def _undirected(edges: DataFrame, src: str, dst: str) -> DataFrame:
    e = edges.select(
        F.least(F.col(src), F.col(dst)).alias("a"),
        F.greatest(F.col(src), F.col(dst)).alias("b"),
    ).where(F.col("a") != F.col("b"))
    return e.distinct()


def hub_capped_neighbors(
    edges: DataFrame, max_deg: int | None, src: str = "src", dst: str = "dst"
) -> tuple[DataFrame, DataFrame]:
    """-> (nbr, dropped_hubs): symmetric (node, nbr) pairs with middle
    nodes of degree > max_deg removed, and the removed hubs (node, deg)."""
    und = _undirected(edges, src, dst)
    nbr = und.select(F.col("a").alias("node"), F.col("b").alias("nbr")).unionByName(
        und.select(F.col("b").alias("node"), F.col("a").alias("nbr"))
    )
    deg = nbr.groupBy("node").agg(F.count("*").alias("deg"))
    if max_deg is None:
        return nbr.join(deg, "node"), deg.limit(0)
    keep = deg.where(F.col("deg") <= max_deg)
    dropped = deg.where(F.col("deg") > max_deg)
    return nbr.join(keep, "node"), dropped


def adamic_adar(
    edges: DataFrame,
    max_deg: int | None = None,
    min_common: int = 1,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """-> (u, v, common, aa) for every NON-edge pair sharing >= min_common
    neighbors; aa = sum over shared middles w of 1/ln(deg(w)), rounded to
    1e-6 (integer ``common`` breaks engine ties). Treats the graph as
    undirected; existing edges are anti-joined out.

    Degree-1 middles are excluded (1/ln(1) diverges — a degree-1 node
    cannot be a wedge middle anyway once self-pairs are removed).
    """
    nbrdeg, _ = hub_capped_neighbors(edges, max_deg, src=src, dst=dst)
    left = nbrdeg.select(
        F.col("node").alias("w"), F.col("nbr").alias("u"), F.col("deg")
    )
    right = nbrdeg.select(F.col("node").alias("w"), F.col("nbr").alias("v"))
    wedges = left.join(right, "w").where(F.col("u") < F.col("v"))

    scored = wedges.groupBy("u", "v").agg(
        F.count("*").alias("common"),
        F.round(F.sum(1.0 / F.log(F.col("deg"))), 6).alias("aa"),
    )
    und = _undirected(edges, src, dst).select(
        F.col("a").alias("u"), F.col("b").alias("v")
    )
    return (
        scored.join(und, ["u", "v"], "left_anti")
        .where(F.col("common") >= min_common)
        .select("u", "v", "common", "aa")
    )


def cocitation_counts(
    edges: DataFrame,
    min_count: int = 1,
    max_deg: int | None = None,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """-> (u, v, cocited, coupled): directed co-citation and bibliographic
    coupling counts per unordered page pair (Small 1973; Kessler 1963 —
    the relatedness signals behind "related pages" on a web/citation
    graph, and a KG same-as feature).

    cocited(u,v)  = # sources s with s->u AND s->v (wedge on the source);
    coupled(u,v)  = # targets t with u->t AND v->t (wedge on the target).

    Same scale shape as adamic_adar: self-joins keyed on the shared
    middle node; ``max_deg`` caps middle fan-out (out-degree for
    co-citation, in-degree for coupling) before the join — the hub-cap
    mitigation, since a 10^6-out-link hub alone would mint 10^12 pairs.
    """
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst")).distinct()

    def _wedges(key: str, val: str, name: str) -> DataFrame:
        deg = e.groupBy(key).agg(F.count("*").alias("_deg"))
        base = e.join(deg, key)
        if max_deg is not None:
            base = base.where(F.col("_deg") <= max_deg)
        left = base.select(F.col(key).alias("w"), F.col(val).alias("u"))
        right = base.select(F.col(key).alias("w"), F.col(val).alias("v"))
        return (
            left.join(right, "w")
            .where(F.col("u") < F.col("v"))
            .groupBy("u", "v")
            .agg(F.count("*").alias(name))
        )

    cc = _wedges("src", "dst", "cocited")
    bc = _wedges("dst", "src", "coupled")
    return (
        cc.join(bc, ["u", "v"], "full_outer")
        .fillna(0, ["cocited", "coupled"])
        .where((F.col("cocited") >= min_count) | (F.col("coupled") >= min_count))
    )


def simrank(
    edges: DataFrame,
    rounds: int = 3,
    c: float = 0.75,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """All-pairs SimRank (Jeh & Widom 2002, "SimRank: A Measure of
    Structural-Context Similarity") by fixed-round iteration:

        s(a,a) = 1
        s(a,b) = c / (|I(a)|·|I(b)|) · Σ_{i∈I(a), j∈I(b)} s_prev(i,j)

    with I(·) the in-neighbor set on the deduplicated simple graph and
    s_0 the identity. "Two pages are similar when similar pages link to
    them" — the recursive counterpart of the one-hop co-citation score
    (citations.py) and the structural sibling of adamic_adar; the engine
    uses it to rank sameAs candidates between entities that share no
    surface form. Default c=0.75 is dyadic so per-term products stay
    exactly representable (the repo's bit-exact-replay discipline);
    rounds is fixed, so the unrolled SQL oracle replays every iteration.

    Relational shape per round: the score relation joins the in-edge
    list twice (i->a, j->b) and re-aggregates by (a, b) — each round is
    two hash joins plus one map-side-combinable sum, localCheckpoint
    keeping the plan flat. Scale note, stated rather than hidden:
    all-pairs SimRank state is Θ(pairs with co-reachable ancestors) and
    quadratic in the worst case BY DEFINITION. This exact form is for
    bounded node sets (entity-cluster cores after blocking, ≤10^4
    nodes); the 10^12-page path is seed-scoped personalized_pagerank or
    blocking first — the same contract as dedup's brute-force lane.
    Nodes with no in-edges score 0 against everything (empty sum):
    their rows are simply absent, the relation stays sparse.
    """
    e = (
        edges.select(F.col(src).alias("i"), F.col(dst).alias("node"))
        .where(F.col("i") != F.col("node"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    nodes = (
        e.select(F.col("i").alias("node"))
        .unionByName(e.select("node"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    indeg = e.groupBy("node").agg(F.count(F.lit(1)).alias("ind"))
    diag = nodes.select(
        F.col("node").alias("a"), F.col("node").alias("b"), F.lit(1.0).alias("s")
    )
    s = diag
    for _ in range(rounds):
        summed = (
            s.join(e.select(F.col("i").alias("a"), F.col("node").alias("na")), "a")
            .join(e.select(F.col("i").alias("b"), F.col("node").alias("nb")), "b")
            .where(F.col("na") != F.col("nb"))
            .groupBy(F.col("na").alias("a"), F.col("nb").alias("b"))
            .agg(F.sum("s").alias("_sum"))
        )
        offdiag = (
            summed.join(indeg.select(F.col("node").alias("a"), F.col("ind").alias("_ia")), "a")
            .join(indeg.select(F.col("node").alias("b"), F.col("ind").alias("_ib")), "b")
            .select(
                "a",
                "b",
                (F.lit(c) * F.col("_sum") / (F.col("_ia") * F.col("_ib"))).alias("s"),
            )
        )
        s = diag.unionByName(offdiag).localCheckpoint(eager=True)
    return s


def milne_witten(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    min_common: int = 1,
) -> DataFrame:
    """Milne-Witten wikilink relatedness DISTANCE (Milne & Witten,
    AAAI-WikiAI 2008 — the normalized Google distance of Cilibrasi &
    Vitanyi 2007 applied to inlink sets): the standard pairwise
    entity-coherence signal for TAGME-style linking, 0 = identical
    inlink neighborhoods, ~1 = unrelated.

      mw(u,v) = (ln max(d_u,d_v) - ln common) / (ln N - ln min(d_u,d_v))

    with d_x = in-degree, common = |inlinks(u) ∩ inlinks(v)|, N =
    distinct nodes. Exact carry: integer counts plus mw_ppm from
    ONCE-quantized round(ln·10⁶) terms combined by integer div — no
    float accumulation, bit-identical in SQL. mw_ppm is NULL on the
    degenerate ln N == ln min (one page linking everything).

    Same scale shape as adamic_adar/cocitation: one wedge self-join on
    the shared inlink (pairs exist only where common >= 1), degree
    joins, and a 1-row broadcast crossJoin for N (the pagerank
    dangling-mass pattern). Pairs with zero common inlinks are
    undefined under MW and excluded by construction.
    """
    e = edges.select(F.col(src).alias("s"), F.col(dst).alias("d")).distinct()
    inl = e.select(F.col("d").alias("node"), F.col("s").alias("inlink"))
    deg = inl.groupBy("node").agg(F.count(F.lit(1)).alias("deg"))
    nodes = (
        e.select(F.col("s").alias("n"))
        .unionByName(e.select(F.col("d").alias("n")))
        .distinct()
    )
    n_row = nodes.agg(F.count(F.lit(1)).alias("n_nodes"))
    left = inl.select(F.col("inlink").alias("w"), F.col("node").alias("u"))
    right = inl.select(F.col("inlink").alias("w"), F.col("node").alias("v"))
    pairs = (
        left.join(right, "w")
        .where(F.col("u") < F.col("v"))
        .groupBy("u", "v")
        .agg(F.count(F.lit(1)).alias("common"))
        .where(F.col("common") >= min_common)
    )
    du = deg.select(F.col("node").alias("u"), F.col("deg").alias("deg_u"))
    dv = deg.select(F.col("node").alias("v"), F.col("deg").alias("deg_v"))
    out = (
        pairs.join(du, "u")
        .join(dv, "v")
        .crossJoin(F.broadcast(n_row))
    )

    def lnppm(c):
        return F.round(F.log(c.cast("double")) * 1_000_000).cast("long")

    out = (
        out.withColumn(
            "num_ppm",
            lnppm(F.greatest("deg_u", "deg_v")) - lnppm(F.col("common")),
        )
        .withColumn(
            "den_ppm",
            lnppm(F.col("n_nodes")) - lnppm(F.least("deg_u", "deg_v")),
        )
    )
    return out.select(
        "u",
        "v",
        "common",
        "deg_u",
        "deg_v",
        "n_nodes",
        F.when(
            F.col("den_ppm") > 0,
            F.expr("num_ppm * 1000000 div den_ppm"),
        ).alias("mw_ppm"),
    )
