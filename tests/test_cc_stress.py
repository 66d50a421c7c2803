"""Giant-component / hub-skew stress for distributed connected components.

The 100x-scale failure modes this pins down:
- a HUB node of huge degree (the place the per-node neighbor-min would bite
  without map-side partial aggregation — groupBy(u).min(v) combines
  per-map-task, so the hub ships one row per task, not one row per edge);
- a GIANT component spanning half the nodes (alternating large-star/
  small-star must collapse it in O(log^2 n) rounds, not diameter rounds);
- long chains (the round-count adversary: distance halves per round).

Graph (deterministic, generated distributed via spark.range — never
collected): node 0 is a hub with 100k spokes, 850k extra pseudo-random
edges inside the spoke set, and 1000 disjoint 100-node chains =
~1.05M edges over 200k nodes, giant component = 50% of nodes.
"""

from __future__ import annotations

import time

from pyspark.sql import functions as F

from spanluke_spark.canon.cc import connected_components

N_SPOKES = 100_000
CHAIN_NODES = 100_000
CHAIN_LEN = 100
N_EXTRA = 850_000


def _edges(spark):
    hub = spark.range(1, N_SPOKES + 1).select(
        F.lit(0).cast("long").alias("src"), F.col("id").alias("dst")
    )
    # pseudo-random intra-giant edges (deterministic xxhash endpoints —
    # multiplicative-mod pairs cycle and collapse under distinct())
    extra = spark.range(N_EXTRA).select(
        (F.pmod(F.xxhash64("id"), F.lit(N_SPOKES)) + 1).alias("src"),
        (F.pmod(F.xxhash64("id", F.lit(1)), F.lit(N_SPOKES)) + 1).alias("dst"),
    )
    # chains: nodes N_SPOKES+1 .. N_SPOKES+CHAIN_NODES in runs of CHAIN_LEN
    chain_base = spark.range(N_SPOKES + 1, N_SPOKES + CHAIN_NODES + 1)
    chains = chain_base.filter(
        (F.col("id") - (N_SPOKES + 1)) % CHAIN_LEN != CHAIN_LEN - 1
    ).select(F.col("id").alias("src"), (F.col("id") + 1).alias("dst"))
    return hub.unionByName(extra).unionByName(chains)


def test_giant_component_converges_in_log_rounds(spark):
    stats: dict = {}
    t0 = time.perf_counter()
    comp = connected_components(_edges(spark), stats=stats).localCheckpoint(
        eager=True
    )
    wall = time.perf_counter() - t0

    assert stats["mode"] == "distributed"
    assert stats["edges_initial"] >= 1_000_000
    # O(log^2 n) convergence: for n = 2*10^5 a chain-heavy graph must close
    # well under 20 alternating rounds (observed: ~8); diameter-propagation
    # (label-prop style) would need ~CHAIN_LEN rounds on the chains alone.
    assert 1 <= stats["rounds"] <= 20, stats

    # correctness without collecting the graph: every expected membership is
    # checked as a distributed predicate with zero violations
    giant_bad = comp.filter(
        (F.col("node") <= N_SPOKES) & (F.col("component") != 0)
    ).count()
    assert giant_bad == 0
    chain_head = (
        (F.col("node") - (N_SPOKES + 1)) - (F.col("node") - (N_SPOKES + 1)) % CHAIN_LEN
        + (N_SPOKES + 1)
    )
    chain_bad = comp.filter(
        (F.col("node") > N_SPOKES) & (F.col("component") != chain_head)
    ).count()
    assert chain_bad == 0
    n_comp = comp.select("component").distinct().count()
    assert n_comp == 1 + CHAIN_NODES // CHAIN_LEN

    # emit the evidence line BASELINE.md records
    print(
        f"\nCC_STRESS {{'rounds': {stats['rounds']}, "
        f"'edges_initial': {stats['edges_initial']}, "
        f"'edges_final': {stats['edges_final']}, 'wall_sec': {wall:.1f}, "
        f"'hub_degree': {N_SPOKES}, 'giant_fraction': 0.5}}"
    )


def test_megahub_triggers_salted_star_rounds(spark):
    """r3 action item 7: a 1.2M-degree hub (above skew_degree_threshold)
    must flip the star rounds onto the salted replicate join, converge, and
    produce correct components. The spread assertion pins the salting math:
    the hub's join input per (u, salt) group is ~degree/salt, so no single
    task ever receives the whole adjacency."""
    hub_degree = 1_200_000
    stats: dict = {}
    hub = spark.range(1, hub_degree + 1).select(
        F.lit(0).cast("long").alias("src"), F.col("id").alias("dst")
    )
    # a few chains so the graph isn't ONLY the star
    chains = spark.range(hub_degree + 1, hub_degree + 5_000).filter(
        (F.col("id") - (hub_degree + 1)) % 50 != 49
    ).select(F.col("id").alias("src"), (F.col("id") + 1).alias("dst"))
    edges = hub.unionByName(chains)

    comp = connected_components(edges, stats=stats)
    assert stats["mode"] == "distributed"
    assert stats["salted"] is True, stats
    assert 1 <= stats["rounds"] <= 20, stats
    bad = comp.filter((F.col("node") <= hub_degree) & (F.col("component") != 0)).count()
    assert bad == 0

    # salting spread: max join-group size for the hub under salt=16
    sym = edges.selectExpr("src as u", "dst as v").unionByName(
        edges.selectExpr("dst as u", "src as v")
    )
    max_group = (
        sym.groupBy("u", F.pmod(F.xxhash64("v"), F.lit(16)).alias("s"))
        .count()
        .agg(F.max("count").alias("m"))
        .first()["m"]
    )
    assert max_group <= hub_degree // 8, max_group  # ~degree/16, never whole
