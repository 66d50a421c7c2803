"""Sequential monitoring charts: EWMA control chart (Roberts 1959;
Lucas & Saccucci 1990) and the Page-Hinkley drift detector (Page
1954; the fixed-reference variant) — the ALWAYS-ON companions of the
batch change detectors (Pettitt q386 locates a break after the
fact; CUSUM q222 accumulates; these raise the alarm AS the stream
drifts, which is what a crawl-quality monitor actually runs).

EWMA, lambda = 1/4 and L = 3 (the classic smoothing/limit pair,
stated): the recursion is carried in ONCE-QUANTIZED milli units so
both engines replay it bit-exactly (the q334 discipline applied to
a RECURSION — each step truncates once):

  z_0 = mu0_milli  (baseline mean of the first k steps, trunc)
  z_t = (3 * z_{t-1} + 1000 * x_t) div 4

with the steady-state 3-sigma alarm squared sqrt-free (Var(z) ->
sigma^2 * lambda/(2 - lambda) = sigma^2/7):

  alarm_t iff (z_t - mu0_milli)^2 * 7 > 9 * s2m
  s2m = 10^6 * (k*Q_k - S_k^2) div (k * (k - 1))   [baseline
        variance in milli^2 units, one trunc]

Page-Hinkley (fixed-reference variant, stated — the textbook
running-mean version is not one-trunc replayable; the baseline mean
stands in as the reference):

  m_t = sum_{i=k+1..t} (1000 * x_i - mu0_milli - delta_milli)
  gap_t = m_t - min_{j<=t} m_j,    alarm iff gap > lambda_milli

pure cumulative windows — no fold at all. Both report the alarm
census and the FIRST alarm time; a drift-free stream stays silent
and a planted level shift alarms shortly after onset
(pytest-pinned, with the EWMA-beats-PH-on-small-shifts and
PH-beats-on-jumps flavor left to the replay).

Degenerate lanes: k < 2 or zero baseline variance (EWMA) surface
NULL; n <= k (nothing to monitor) reports zero alarms.

Distributed shape: EWMA is one ordered fold over the collected
bounded series (the q430 contract: a monitoring window is a
dimension, not the corpus); PH is two stacked windows. Keys would
scale out per monitored series.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["ewma_chart", "page_hinkley"]


def ewma_chart(
    df: DataFrame,
    baseline_k: int = 20,
    t_col: str = "t",
    x_col: str = "x",
) -> DataFrame:
    """(t order key, x int) -> ONE row (n, k, mu0_milli, s2m,
    n_alarms, first_alarm_t)."""
    if baseline_k < 2:
        raise ValueError("baseline_k must be >= 2")
    s = df.select(
        F.col(t_col).cast("long").alias("t"),
        F.col(x_col).cast("long").alias("x"),
    )
    w = Window.orderBy("t")
    idxd = s.select(
        "t", "x", F.row_number().over(w).alias("i")
    ).localCheckpoint(eager=True)
    base = idxd.where(F.col("i") <= baseline_k).groupBy().agg(
        F.count(F.lit(1)).cast("long").alias("k"),
        F.sum("x").alias("sk"),
        F.sum(F.col("x") * F.col("x")).alias("qk"),
    )
    packed = idxd.groupBy().agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sort_array(F.collect_list(F.struct("i", "t", "x"))).alias(
            "seq"
        ),
    ).crossJoin(F.broadcast(base))
    mu0 = F.expr("1000 * sk div k")
    s2m = F.expr("1000000 * (k * qk - sk * sk) div (k * (k - 1))")
    wide = packed.select(
        "n",
        "k",
        "seq",
        mu0.alias("mu0_milli"),
        F.when(F.col("k") >= 2, s2m).alias("s2m"),
    )
    # fold: z in milli, alarms collected as (t) list past baseline
    alarms = F.expr(
        "aggregate(seq,"
        " named_struct('z', mu0_milli,"
        "              'hits', cast(array() as array<bigint>)),"
        " (acc, e) -> named_struct("
        "   'z', (3 * acc.z + 1000 * e.x) div 4,"
        "   'hits', CASE WHEN e.i > k"
        "       AND ((3 * acc.z + 1000 * e.x) div 4 - mu0_milli)"
        "           * ((3 * acc.z + 1000 * e.x) div 4 - mu0_milli)"
        "           * 7 > 9 * s2m"
        "     THEN concat(acc.hits, array(e.t))"
        "     ELSE acc.hits END),"
        " acc -> acc.hits)"
    )
    ok = (F.col("k") >= 2) & (F.col("s2m") > 0)
    out = wide.select(
        "n",
        "k",
        "mu0_milli",
        "s2m",
        F.when(ok, alarms).alias("_hits"),
    )
    return out.select(
        "n",
        "k",
        "mu0_milli",
        "s2m",
        F.when(
            F.col("_hits").isNotNull(), F.size("_hits").cast("long")
        ).alias("n_alarms"),
        F.when(
            F.col("_hits").isNotNull() & (F.size("_hits") > 0),
            F.element_at("_hits", 1),
        ).alias("first_alarm_t"),
    )


def page_hinkley(
    df: DataFrame,
    baseline_k: int = 20,
    delta_milli: int = 500,
    lambda_milli: int = 30_000,
    t_col: str = "t",
    x_col: str = "x",
) -> DataFrame:
    """(t order key, x int) -> ONE row (n, k, mu0_milli, max_gap,
    n_alarms, first_alarm_t)."""
    if baseline_k < 1:
        raise ValueError("baseline_k must be >= 1")
    s = df.select(
        F.col(t_col).cast("long").alias("t"),
        F.col(x_col).cast("long").alias("x"),
    )
    w = Window.orderBy("t")
    idxd = s.select("t", "x", F.row_number().over(w).alias("i"))
    base = idxd.where(F.col("i") <= baseline_k).groupBy().agg(
        F.count(F.lit(1)).cast("long").alias("k"),
        F.sum("x").alias("sk"),
    )
    mon = (
        idxd.crossJoin(F.broadcast(base))
        .where(F.col("i") > F.col("k"))
        .select(
            "t",
            "k",
            (
                1000 * F.col("x")
                - F.expr("1000 * sk div k")
                - F.lit(delta_milli)
            ).alias("step"),
            F.expr("1000 * sk div k").alias("mu0_milli"),
        )
    )
    wc = Window.orderBy("t").rowsBetween(
        Window.unboundedPreceding, 0
    )
    stepped = mon.select(
        "t",
        "k",
        "mu0_milli",
        F.sum("step").over(wc).alias("m"),
    ).select(
        "t",
        "k",
        "mu0_milli",
        (F.col("m") - F.min("m").over(wc)).alias("gap"),
    )
    # global agg so an empty monitored set still yields one row
    agg = stepped.groupBy().agg(
        F.count(F.lit(1)).cast("long").alias("n_mon"),
        F.coalesce(F.max("gap"), F.lit(0).cast("long")).alias(
            "max_gap"
        ),
        F.coalesce(
            F.sum((F.col("gap") > lambda_milli).cast("long")),
            F.lit(0).cast("long"),
        ).alias("n_alarms"),
        F.min(
            F.when(F.col("gap") > lambda_milli, F.col("t"))
        ).alias("first_alarm_t"),
    )
    meta = base.select(
        "k", F.expr("1000 * sk div k").alias("mu0_milli")
    )
    return agg.crossJoin(F.broadcast(meta)).select(
        (F.col("n_mon") + F.col("k")).alias("n"),
        "k",
        "mu0_milli",
        "max_gap",
        "n_alarms",
        "first_alarm_t",
    )
