"""Funnel strict-ordering semantics and Fellegi-Sunter decision bands."""

from __future__ import annotations

from datetime import datetime
from math import log2

import pytest

from spanluke_spark.etl.funnel import funnel
from spanluke_spark.link.fellegi import FieldParams, fs_score


def _ev(spark, rows):
    return spark.createDataFrame(
        [(u, datetime(2024, 1, 1, 0, 0, s), t) for u, s, t in rows],
        "user_id long, ts timestamp, event_type string",
    )


def test_funnel_strict_order(spark):
    ev = _ev(
        spark,
        [
            (1, 0, "view"), (1, 10, "click"), (1, 20, "purchase"),  # full
            (2, 10, "click"), (2, 20, "view"),                       # click BEFORE view
            (3, 0, "view"),                                          # stops at 1
            (4, 5, "purchase"), (4, 6, "view"), (4, 7, "click"),     # purchase too early
        ],
    )
    got = {r.user_id: r for r in funnel(ev, ["view", "click", "purchase"]).collect()}
    assert got[1].steps_completed == 3
    assert got[2].steps_completed == 1 and got[2].t2 is None  # strict order
    assert got[3].steps_completed == 1
    assert got[4].steps_completed == 2 and got[4].t3 is None
    assert 5 not in got  # no step-1 event -> no row


def test_funnel_equal_timestamp_not_counted(spark):
    # strictly-after: a click AT the view instant does not advance
    ev = _ev(spark, [(1, 0, "view"), (1, 0, "click")])
    r = funnel(ev, ["view", "click"]).collect()[0]
    assert r.steps_completed == 1 and r.t2 is None


def test_funnel_earliest_chain(spark):
    # t2 = earliest click after t1 even if a later view exists
    ev = _ev(spark, [(1, 0, "view"), (1, 30, "view"), (1, 10, "click")])
    r = funnel(ev, ["view", "click"]).collect()[0]
    assert r.t1.second == 0 and r.t2.second == 10


def test_fs_score_bands_and_null_rule(spark):
    pairs = spark.createDataFrame(
        [(1, True, True), (2, False, False), (3, None, True), (4, True, False)],
        "pid long, a1 boolean, a2 boolean",
    )
    fields = [FieldParams("a1", 0.9, 0.1), FieldParams("a2", 0.8, 0.2)]
    w1a, w1d = log2(9), log2(0.1 / 0.9)
    w2a, w2d = log2(4), log2(0.2 / 0.8)
    got = {r.pid: (r.score, r.decision) for r in
           fs_score(pairs, fields, upper=5.0, lower=0.0).collect()}
    assert got[1] == (pytest.approx(round(w1a + w2a, 6)), "link")
    assert got[2] == (pytest.approx(round(w1d + w2d, 6)), "non_link")
    assert got[3] == (pytest.approx(round(w2a, 6)), "possible")  # NULL adds 0
    assert got[4][1] == "possible"


def test_fs_rejects_bad_params(spark):
    with pytest.raises(ValueError):
        FieldParams("x", 0.5, 0.5)
    with pytest.raises(ValueError):
        FieldParams("x", 0.1, 0.9)


def test_transition_matrix_counts_and_probs(spark):
    from spanluke_spark.etl.funnel import transition_matrix

    rows = [
        (1, 1, 0, "a"), (2, 1, 1, "b"), (3, 1, 2, "a"), (4, 1, 3, "b"),
        (5, 2, 0, "a"), (6, 2, 1, "a"),
    ]
    ev = spark.createDataFrame(
        [(eid, u, datetime(2024, 1, 1, 0, 0, s), t) for eid, u, s, t in rows],
        "event_id long, user_id long, ts timestamp, event_type string",
    )
    got = {(r.prev_type, r.event_type): (r.n, r.p) for r in transition_matrix(ev).collect()}
    # user1: a->b, b->a, a->b; user2: a->a — prev 'a' has 3 transitions
    assert got[("a", "b")] == (2, 0.666667)
    assert got[("a", "a")] == (1, 0.333333)
    assert got[("b", "a")] == (1, 1.0)
    # first event of each user contributes no transition
    assert sum(n for n, _ in got.values()) == 4


def test_session_likelihood_flags_weird_sessions(spark):
    from math import log2 as _l2

    from spanluke_spark.etl.funnel import session_likelihood

    # 10 organic users alternate a->b; one bot repeats the rare b->b
    rows = []
    eid = 0
    for u in range(10):
        for s, t in enumerate(["a", "b", "a", "b"]):
            rows.append((eid, u, s, t)); eid += 1
    for s, t in enumerate(["b", "b", "b", "b"]):
        rows.append((eid, 99, s, t)); eid += 1
    ev = spark.createDataFrame(
        [(e, u, datetime(2024, 1, 1, 0, 0, s), t) for e, u, s, t in rows],
        "event_id long, user_id long, ts timestamp, event_type string",
    )
    got = {r.user_id: r for r in session_likelihood(ev).collect()}
    assert got[99].n_transitions == 3
    # the bot's transitions are corpus-rare -> lower avg log-likelihood
    assert got[99].avg_log2_p < got[0].avg_log2_p
    # organic users all share one score
    assert len({got[u].avg_log2_p for u in range(10)}) == 1
    # hand-check one organic value: transitions a->b (20+bot?) ...
    # a->b observed 20, b->a 10, b->b 3; k=3 distinct next types? next
    # types seen: b (from a), a and b (from b) -> k counts DISTINCT
    # event_type in tr = {a, b} -> k=2
    p_ab = round((20 + 0.5) / (20 + 0.5 * 2), 6)
    p_ba = round((10 + 0.5) / (13 + 0.5 * 2), 6)
    exp = round((2 * _l2(p_ab) + _l2(p_ba)) / 3, 6)
    assert abs(got[0].avg_log2_p - exp) < 2e-6
