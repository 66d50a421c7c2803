"""Empirical Markov entropy rate of an event stream (Shannon 1948;
Cover & Thomas ch. 4) — how many nats does the NEXT event type cost
once you know the previous one, and how much does that memory save?
The information-theoretic summary over the q150 transition matrix:
entropy rate H(X_t | X_{t-1}) is the compressibility floor of the
stream, and the saving H(X) - H(X|prev) is exactly the mutual
information between consecutive events — a burst/session structure
detector in one number (complements the ACF q298 for categorical
streams).

Empirical plug-in, exact (the q372/q393 once-quantized ln cells):
with lag-1 transition counts n_ij, row sums n_i., column... marginal
counts m_s over the SAME transition table (current-symbol marginal),
and N transitions,

  h_rate_micro = sum_ij n_ij * round(ln(n_i. / n_ij) * 10^6) div N
  h_marg_micro = sum_s  m_s  * round(ln(N / m_s) * 10^6)     div N
  mi_micro     = h_marg_micro - h_rate_micro

every cell an integer-argument rational quantized once. Exact lanes
pytest-pinned: a DETERMINISTIC chain (every prev has one successor)
gives h_rate == 0 with no rounding (every cell argument is 1); an
iid product table makes mi == 0 exactly (cell rationals coincide);
mi >= -(cells) rounding slack only — asserted non-negative within
the documented |cells| quantization budget. The first observation
has no predecessor and is dropped (stated, the q417 convention).

Distributed shape: one ordered lag window (per stream key if given),
one transition groupBy, two marginal rollups — the q150 plan plus
two tiny aggregates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["entropy_rate"]


def entropy_rate(
    df: DataFrame,
    t_col: str = "t",
    sym_col: str = "sym",
) -> DataFrame:
    """(t order key, sym) -> ONE row (n_transitions, n_states,
    h_rate_micro, h_marg_micro, mi_micro)."""
    s = df.select(
        F.col(t_col).cast("long").alias("t"),
        F.col(sym_col).cast("string").alias("sym"),
    )
    w = Window.orderBy("t")
    trans = s.select(
        F.lag("sym").over(w).alias("prev"), F.col("sym")
    ).where(F.col("prev").isNotNull())
    counts = trans.groupBy("prev", "sym").agg(
        F.count(F.lit(1)).cast("long").alias("nij")
    )
    rows_ = counts.groupBy("prev").agg(F.sum("nij").alias("ni"))
    marg = counts.groupBy("sym").agg(F.sum("nij").alias("ms"))
    tot = counts.groupBy().agg(
        F.sum("nij").alias("n"),
        F.countDistinct("sym").cast("long").alias("n_states"),
    )
    rate_cells = (
        counts.join(F.broadcast(rows_), "prev")
        .select(
            (
                F.col("nij")
                * F.round(
                    F.log(F.col("ni") / F.col("nij")) * 1_000_000
                ).cast("long")
            ).alias("cell")
        )
        .groupBy()
        .agg(F.coalesce(F.sum("cell"), F.lit(0)).alias("rate_sum"))
    )
    marg_cells = (
        marg.crossJoin(F.broadcast(tot.select("n")))
        .select(
            (
                F.col("ms")
                * F.round(
                    F.log(F.col("n") / F.col("ms")) * 1_000_000
                ).cast("long")
            ).alias("cell")
        )
        .groupBy()
        .agg(F.coalesce(F.sum("cell"), F.lit(0)).alias("marg_sum"))
    )
    base = (
        tot.crossJoin(F.broadcast(rate_cells))
        .crossJoin(F.broadcast(marg_cells))
    )
    return base.select(
        F.col("n").alias("n_transitions"),
        "n_states",
        F.when(
            F.col("n") > 0, F.expr("rate_sum div n")
        ).alias("h_rate_micro"),
        F.when(
            F.col("n") > 0, F.expr("marg_sum div n")
        ).alias("h_marg_micro"),
        F.when(
            F.col("n") > 0,
            F.expr("marg_sum div n - rate_sum div n"),
        ).alias("mi_micro"),
    )
