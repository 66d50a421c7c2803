"""Ordered-funnel analysis over the event stream — the standard product /
crawl-operations query ("of the users who viewed, how many then clicked,
then purchased — in that order?"), same semantics as ClickHouse's
``windowFunnel`` with strict ordering and no window cap.

Step semantics: t1 = the user's earliest step-1 event; t_i = the earliest
step-i event STRICTLY AFTER t_{i-1}. Users keep their longest prefix
(left-join chain), so per-step conversion falls out of a count.

Scale shape: one map-side-combinable groupBy per step, each keyed on the
user — k steps = k aggs + k-1 equi-joins on the same key, so after the
first shuffle every later stage reuses the (user) partitioning (no
re-exchange under AQE); the event table is filtered to one step's type
BEFORE each join (predicate pushdown into the scan). No windows, no
per-user sorting, no event-list materialization — a user with 10^6 events
costs min-agg rows, not an array.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["funnel"]


def funnel(
    events: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """-> (user_id, t1..tk, steps_completed): per-user earliest strict-order
    completion times for ``steps``; t_i is NULL once the chain breaks."""
    if not steps:
        raise ValueError("funnel needs at least one step")

    u, ts, et = F.col(user_col), F.col(ts_col), F.col(type_col)
    per_step: list[DataFrame] = []
    prev: DataFrame | None = None
    for i, s in enumerate(steps, start=1):
        e = events.where(et == s).select(u.alias("user_id"), ts.alias("ts"))
        if prev is None:
            cur = e.groupBy("user_id").agg(F.min("ts").alias(f"t{i}"))
        else:
            cur = (
                e.join(prev.select("user_id", f"t{i-1}"), "user_id")
                .where(F.col("ts") > F.col(f"t{i-1}"))
                .groupBy("user_id")
                .agg(F.min("ts").alias(f"t{i}"))
            )
        per_step.append(cur)
        prev = cur

    out = per_step[0]
    for nxt in per_step[1:]:
        out = out.join(nxt, "user_id", "left")
    completed = F.lit(1)
    for i in range(2, len(steps) + 1):
        completed = completed + F.col(f"t{i}").isNotNull().cast("int")
    return out.withColumn("steps_completed", completed)


def transition_matrix(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """First-order Markov transition counts/probabilities over each user's
    time-ordered event stream: -> (prev_type, event_type, n, p) with p
    normalized per prev_type — the "what happens after a click" model
    behind next-action prediction and anomaly scoring on session streams.

    One window keyed on the user (partition size = that user's events,
    never global) for the lag, then a map-side-combinable count on the
    (prev, next) pair — output is |types|² rows, tiny. Ties in ts are
    ordered by (ts, event id) so the lag is deterministic under re-runs.
    """
    from pyspark.sql import Window

    w = Window.partitionBy(user_col).orderBy(ts_col, "event_id")
    seq = events.withColumn("prev_type", F.lag(type_col).over(w)).where(
        F.col("prev_type").isNotNull()
    )
    counts = seq.groupBy(
        F.col("prev_type"), F.col(type_col).alias("event_type")
    ).agg(F.count("*").alias("n"))
    total = Window.partitionBy("prev_type")
    return counts.withColumn(
        "p", F.round(F.col("n") / F.sum("n").over(total), 6)
    )


def session_likelihood(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    laplace: float = 0.5,
) -> DataFrame:
    """Score each user's event stream by its average per-transition log2
    likelihood under the corpus transition matrix — bot/anomaly detection
    on session streams (an automated scraper's transition pattern scores
    far from the organic model). -> (user_id, n_transitions, avg_log2_p),
    most-anomalous = most-negative.

    Laplace-smoothed over the observed next-type alphabet so unseen
    transitions score finitely; the matrix is |types|² rows and rides in
    as a broadcast. Deterministic: same lag ordering as
    transition_matrix, probabilities rounded at 1e-6 before the log.
    """
    from pyspark.sql import Window

    tm = transition_matrix(
        events, user_col=user_col, ts_col=ts_col, type_col=type_col
    )
    n_types = tm.select("event_type").distinct().count()
    totals = Window.partitionBy("prev_type")
    smoothed = tm.withColumn(
        "p_s",
        F.round(
            (F.col("n") + laplace)
            / (F.sum("n").over(totals) + laplace * n_types),
            6,
        ),
    ).select("prev_type", "event_type", "p_s")
    prev_totals = tm.groupBy("prev_type").agg(F.sum("n").alias("t_prev"))

    w = Window.partitionBy(user_col).orderBy(ts_col, "event_id")
    seq = events.withColumn("prev_type", F.lag(type_col).over(w)).where(
        F.col("prev_type").isNotNull()
    )
    scored = (
        seq.join(F.broadcast(smoothed), ["prev_type", type_col], "left")
        .join(F.broadcast(prev_totals), "prev_type")
        .withColumn(
            "log2p",
            F.log2(
                F.coalesce(
                    F.col("p_s"),
                    # (prev, next) never co-observed: the pure-smoothing
                    # mass for that prev's row of the matrix
                    F.round(
                        laplace / (F.col("t_prev") + laplace * n_types), 6
                    ),
                )
            ),
        )
    )
    return scored.groupBy(F.col(user_col).alias("user_id")).agg(
        F.count("*").alias("n_transitions"),
        F.round(F.avg("log2p"), 6).alias("avg_log2_p"),
    )
