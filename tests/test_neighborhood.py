"""KMV-ball neighborhood estimation: exactness below k, sketch-size bound,
the estimator lane, and determinism."""

from __future__ import annotations

from spanluke_spark.graph.neighborhood import kmv_ball


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src long, dst long")


def test_exact_below_k_on_path_graph(spark):
    # 0->1->2->3->4: ball(0, r=2) = {0,1,2}, ball(3) = {3,4}, ball(4) = {4}
    e = _edges(spark, [(i, i + 1) for i in range(4)])
    got = {r.node: (r.n_kept, r.ball_estimate) for r in kmv_ball(e, radius=2, k=16).collect()}
    assert got[0] == (3, 3.0)
    assert got[3] == (2, 2.0)
    assert got[4] == (1, 1.0)


def test_radius_zero_is_self_only(spark):
    e = _edges(spark, [(0, 1)])
    got = {r.node: r.n_kept for r in kmv_ball(e, radius=0, k=8).collect()}
    assert got == {0: 1, 1: 1}


def test_estimator_lane_bounded_and_plausible(spark):
    # star hub reaches 80 nodes at r=1 with k=16 -> estimator engages
    e = _edges(spark, [(0, i) for i in range(1, 81)])
    got = {r.node: r for r in kmv_ball(e, radius=1, k=16).collect()}
    hub = got[0]
    assert hub.n_kept == 16  # sketch never exceeds k rows
    assert 30 <= hub.ball_estimate <= 250  # true 81; KMV k=16 is coarse
    # leaves have no out-edges: ball stays {self}
    assert got[5].n_kept == 1 and got[5].ball_estimate == 1.0


def test_deterministic_reruns(spark):
    e = _edges(spark, [(i, (i * 3 + 1) % 20) for i in range(20)])
    a = sorted(map(tuple, kmv_ball(e, radius=2, k=8).collect()))
    b = sorted(map(tuple, kmv_ball(e, radius=2, k=8).collect()))
    assert a == b


def test_ball_curve_and_harmonic_exact_small(spark):
    from spanluke_spark.graph.neighborhood import ball_curve, harmonic_centrality

    # 0->1->2: exact below k. B(0): 1,2,3 at r=0,1,2 -> HC(0)=1/1+1/2=1.5
    e = _edges(spark, [(0, 1), (1, 2)])
    curve = {(r.node, r.r): r.ball_estimate for r in ball_curve(e, radius=2, k=8).collect()}
    assert curve[(0, 0)] == 1.0 and curve[(0, 1)] == 2.0 and curve[(0, 2)] == 3.0
    assert curve[(2, 2)] == 1.0
    hc = {r.node: r.harmonic for r in harmonic_centrality(e, radius=2, k=8).collect()}
    assert hc[0] == 1.5 and hc[1] == 1.0 and hc[2] == 0.0
