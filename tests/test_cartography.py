"""Gates for graph/cartography.py: node roles against an exact
python replay, the all-internal P == 0 and even-split
P == (1 - 1/m) exact lanes, hub detection on a planted star,
single-node-community NULL z2; knn spectrum against replay, the
star closed form (leaves see k=n-1, hub sees 1), and
direction-consistency with degree assortativity (q107) on a
disassortative graph."""

from __future__ import annotations

from collections import defaultdict

from spanluke_spark.graph.cartography import avg_neighbor_degree, node_roles

# ---------------------------------------------------- python replays


def py_node_roles(edges, comm):
    adj = defaultdict(list)
    for u, v in edges:
        if u != v:
            adj[u].append(v)
            adj[v].append(u)
    out = {}
    kin = {}
    for u, nbrs in adj.items():
        per = defaultdict(int)
        for v in nbrs:
            per[comm[v]] += 1
        k = len(nbrs)
        k2 = sum(c * c for c in per.values())
        kin[u] = per.get(comm[u], 0)
        out[u] = {
            "community": comm[u],
            "degree": k,
            "internal_degree": kin[u],
            "p_ppm": (k * k - k2) * 10**6 // (k * k),
        }
    groups = defaultdict(list)
    for u in adj:
        groups[comm[u]].append(kin[u])
    for u in adj:
        xs = groups[comm[u]]
        ns, s, q = len(xs), sum(xs), sum(v * v for v in xs)
        svar = ns * q - s * s
        dev = ns * kin[u] - s
        if svar > 0:
            mag = 1000 * dev * dev // svar
            out[u]["z2_milli"] = -mag if dev < 0 else mag
        else:
            out[u]["z2_milli"] = None
        z2 = out[u]["z2_milli"] or 0
        p = out[u]["p_ppm"]
        if z2 >= 6250:
            out[u]["role"] = (
                "provincial_hub"
                if p < 300_000
                else "connector_hub"
                if p < 750_000
                else "kinless_hub"
            )
        else:
            out[u]["role"] = (
                "ultra_peripheral"
                if p < 50_000
                else "peripheral"
                if p < 625_000
                else "connector"
                if p < 800_000
                else "kinless"
            )
    return out


def py_knn(edges):
    adj = defaultdict(list)
    for u, v in edges:
        if u != v:
            adj[u].append(v)
            adj[v].append(u)
    deg = {u: len(vs) for u, vs in adj.items()}
    per_k = defaultdict(lambda: [0, 0])
    for u, vs in adj.items():
        per_k[deg[u]][0] += 1
        per_k[deg[u]][1] += sum(deg[v] for v in vs)
    return {
        k: {
            "n_nodes": n,
            "knn_milli": 1000 * tot // (k * n),
        }
        for k, (n, tot) in per_k.items()
    }


def _run_roles(spark, edges, comm):
    e = spark.createDataFrame(list(edges), "src long, dst long")
    n = spark.createDataFrame(
        [(u, c) for u, c in comm.items()], "node long, community string"
    )
    out = {}
    for r in node_roles(e, n).collect():
        d = r.asDict()
        node = d.pop("node")
        out[node] = d
    return out


def _run_knn(spark, edges):
    e = spark.createDataFrame(list(edges), "src long, dst long")
    out = {}
    for r in avg_neighbor_degree(e).collect():
        d = r.asDict()
        k = d.pop("k")
        out[k] = d
    return out


def _two_cliques_bridge():
    """cliques {0..4} and {10..14}, bridge node 20 touching both."""
    edges = []
    for base in (0, 10):
        for a in range(base, base + 5):
            for b in range(a + 1, base + 5):
                edges.append((a, b))
    edges += [(20, 0), (20, 1), (20, 10), (20, 11)]
    comm = {u: "A" for u in range(5)}
    comm.update({u: "B" for u in range(10, 15)})
    comm[20] = "A"
    return edges, comm


def test_roles_match_replay(spark):
    edges, comm = _two_cliques_bridge()
    assert _run_roles(spark, edges, comm) == py_node_roles(edges, comm)


def test_roles_internal_zero_even_split_exact(spark):
    edges, comm = _two_cliques_bridge()
    got = _run_roles(spark, edges, comm)
    assert got[3]["p_ppm"] == 0  # clique-internal node
    assert got[20]["p_ppm"] == 500_000  # exact 2-way even split


def test_roles_star_hub(spark):
    # one community: hub 0 touching 11 leaves, plus a leaf-leaf edge
    edges = [(0, i) for i in range(1, 12)] + [(1, 2)]
    comm = {u: "S" for u in range(12)}
    got = _run_roles(spark, edges, comm)
    assert got == py_node_roles(edges, comm)
    assert got[0]["z2_milli"] >= 6250
    assert got[0]["role"] == "provincial_hub"
    assert got[5]["role"] == "ultra_peripheral"


def test_roles_single_node_community_null_z(spark):
    edges = [(0, 1), (1, 2), (2, 0), (3, 0)]
    comm = {0: "A", 1: "A", 2: "A", 3: "LONE"}
    got = _run_roles(spark, edges, comm)
    assert got == py_node_roles(edges, comm)
    assert got[3]["z2_milli"] is None
    # P sums over ALL communities: one (foreign) module still means
    # P == 0 — ultra-peripheral by the G-A definition
    assert got[3]["p_ppm"] == 0
    assert got[3]["role"] == "ultra_peripheral"


def test_knn_matches_replay_and_star(spark):
    edges, _ = _two_cliques_bridge()
    assert _run_knn(spark, edges) == py_knn(edges)
    star = [(0, i) for i in range(1, 8)]
    got = _run_knn(spark, star)
    assert got[1]["knn_milli"] == 7000  # leaves see the hub (k=7)
    assert got[7]["knn_milli"] == 1000  # hub sees leaves (k=1)


def test_knn_direction_matches_assortativity(spark):
    from spanluke_spark.graph.partitioning import degree_assortativity

    star = [(0, i) for i in range(1, 8)] + [(1, 2), (3, 4)]
    got = _run_knn(spark, star)
    ks = sorted(got)
    assert got[ks[0]]["knn_milli"] > got[ks[-1]]["knn_milli"]
    e = spark.createDataFrame(star, "src long, dst long")
    a = degree_assortativity(e).collect()[0]
    assert a["assortativity"] < 0  # disassortative, matching the drop
