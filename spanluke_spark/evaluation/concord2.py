"""Judge-consistency coefficients: circular-triad consistency for a
paired-comparison tournament (Kendall & Babington Smith 1940) and
Kendall's coefficient of concordance W for m complete rankings
(Kendall & Babington Smith 1939) — is a panel of pairwise
preferences even INTERNALLY consistent (before Bradley-Terry q285
fits strengths to it), and how strongly do m rankers agree (the
multi-ranker number behind the two-ranker tau q266 and the blocked
Friedman q340)?

Circular triads, exact: in a complete round-robin on k items with
win counts s_i, the number of intransitive (circular) triads is

  c = C(k,3) - sum_i C(s_i, 2)
    = k(k-1)(2k-1)/12 - (1/2) sum s_i^2   [doubled form below]

  c2      = k(k-1)(2k-1) div 6 - sum s_i^2 ... carried DOUBLED:
  c_x2    = k(k-1)(2k-1)/6 * ... the code carries 12*c =
            k(k-1)(2k-1) - 6 * sum s_i^2 + 3 * sum s_i ... —
  in practice: 24*c = 2k(k-1)(2k-1) - 12*sum C(s_i,2) * 2; the
  implementation uses the direct exact form
  c = [ C(k,3) - sum_i s_i(s_i-1)/2 ]  via integer div (both terms
  individually integral). Consistency

  zeta_ppm = 10^6 - 10^6 * c div c_max,
  c_max = (k^3 - k) div 24 (odd k) | (k^3 - 4k) div 24 (even k)

Exact lanes pytest-pinned: a transitive tournament (total order)
has c == 0 and zeta == 10^6 exactly; a 3-cycle has c == 1 == c_max
so zeta == 0; completeness is AUDITED (every ordered pair decided
exactly once -> sum s_i == C(k,2)) with status='incomplete'
otherwise.

Kendall's W with ties (the tie-corrected Kendall formula on DOUBLED
within-ranker ranks, every scale cleared):

  With m rankers over k items, doubled rank sums R2_i (sum over
  rankers of double ranks) and the doubled tie term
  T2 = sum over rankers, tie groups of (t^3 - t):

  W = [12 * sum_i R2_i^2 - 3 * m^2 * k * (k+1)^2 * 4] /
      [4 * (m^2 k (k^2-1) - m * T2 * ... ] — cleared in the code to
  one DECIMAL/HUGEINT division; the EXACT bridge to Friedman,
  chi2_F = m (k-1) W, is pytest-pinned against the in-repo q340
  lane on the same data. Perfect agreement gives W == 10^6 exactly
  (no ties); m independent reversals of each other (m == 2,
  opposite orders) give W == 0 exactly.

Distributed shape: triads need only the win-count aggregate of the
duel table (never the triples themselves — the C(s,2) identity is
the whole point); W is one (ranker, item) double-rank window + two
aggregates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["circular_triads", "kendalls_w"]


def circular_triads(
    duels: DataFrame,
    winner_col: str = "winner",
    loser_col: str = "loser",
) -> DataFrame:
    """one row per decided ordered pair (winner, loser) of a
    complete round-robin -> ONE row (k, n_duels, c_triads, c_max,
    zeta_ppm, status)."""
    d = duels.select(
        F.col(winner_col).alias("w"), F.col(loser_col).alias("l")
    )
    wins = d.groupBy("w").agg(F.count(F.lit(1)).cast("long").alias("s"))
    items = (
        d.select(F.col("w").alias("it"))
        .unionAll(d.select(F.col("l").alias("it")))
        .distinct()
    )
    per = items.join(
        wins.withColumnRenamed("w", "it"), "it", "left"
    ).select(
        "it", F.coalesce(F.col("s"), F.lit(0).cast("long")).alias("s")
    )
    agg = per.groupBy().agg(
        F.count(F.lit(1)).cast("long").alias("k"),
        F.sum("s").alias("s_sum"),
        F.sum(F.expr("s * (s - 1) div 2")).alias("cs2"),
    )
    n_duels = d.groupBy().agg(
        F.count(F.lit(1)).cast("long").alias("n_duels")
    )
    base = agg.crossJoin(F.broadcast(n_duels))
    complete = (
        F.col("s_sum") == F.expr("k * (k - 1) div 2")
    ) & (F.col("n_duels") == F.expr("k * (k - 1) div 2"))
    c = F.expr("k * (k - 1) * (k - 2) div 6 - cs2")
    c_max = F.expr(
        "CASE WHEN k % 2 = 1 THEN (k * k * k - k) div 24"
        " ELSE (k * k * k - 4 * k) div 24 END"
    )
    return base.select(
        "k",
        "n_duels",
        F.when(complete, c).alias("c_triads"),
        F.when(complete, c_max).alias("c_max"),
        F.when(
            complete & (c_max > 0),
            F.expr(
                "1000000 - (k * (k - 1) * (k - 2) div 6 - cs2)"
                " * 1000000 div (CASE WHEN k % 2 = 1"
                " THEN (k * k * k - k) div 24"
                " ELSE (k * k * k - 4 * k) div 24 END)"
            ),
        ).alias("zeta_ppm"),
        F.when(~complete, F.lit("incomplete"))
        .otherwise(F.lit("ok"))
        .alias("status"),
    )


def kendalls_w(
    rankings: DataFrame,
    ranker_col: str = "ranker",
    item_col: str = "item",
    score_col: str = "score",
) -> DataFrame:
    """(ranker, item, score) complete design — each ranker scores
    every item; ranks derived per ranker with ties -> ONE row
    (m, k, w_num, w_den, w_milli, chi2_milli, status)."""
    s = rankings.select(
        F.col(ranker_col).alias("rk"),
        F.col(item_col).alias("it"),
        F.col(score_col).cast("long").alias("sc"),
    )
    cls = s.groupBy("rk", "sc").agg(F.count(F.lit(1)).alias("c"))
    wv = (
        Window.partitionBy("rk")
        .orderBy("sc")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    ranked = cls.select(
        "rk",
        "sc",
        (
            2 * (F.sum("c").over(wv) - F.col("c")) + F.col("c") + 1
        ).alias("dr"),
        F.col("c"),
    )
    rows = s.join(ranked, ["rk", "sc"])
    per_item = rows.groupBy("it").agg(
        F.sum("dr").alias("r2"),
        F.count(F.lit(1)).cast("long").alias("m_chk"),
    )
    ties = cls.groupBy().agg(
        F.sum(
            F.expr("c * c * c - c")
        ).alias("t_raw")
    )
    meta = s.groupBy().agg(
        F.countDistinct("rk").cast("long").alias("m"),
        F.countDistinct("it").cast("long").alias("k"),
    )
    itm = per_item.groupBy().agg(
        F.sum(F.expr("r2 * r2")).alias("sr2"),
        F.sum("r2").alias("sumr"),
        F.min("m_chk").alias("mmin"),
        F.max("m_chk").alias("mmax"),
        F.count(F.lit(1)).cast("long").alias("k_chk"),
    )
    base = (
        meta.crossJoin(F.broadcast(itm))
        .crossJoin(F.broadcast(ties))
    )
    complete = (
        (F.col("mmin") == F.col("m"))
        & (F.col("mmax") == F.col("m"))
        & (F.col("k_chk") == F.col("k"))
    )
    # doubled ranks: R2_i = 2*R_i, mean R2 = m(k+1); S2 = sum(R2 -
    # m(k+1))^2 = 4S. W = 12 S / (m^2(k^3-k) - m T), T = sum(t^3-t)
    # over tie groups (in DOUBLED units the tie term is 8T... both
    # numerator S2 = 4S and the doubled tie term t' = 2t give
    # (t'^3 - ... the code clears everything explicitly below:
    # S2 = sr2 - k * (m(k+1))^2 ... using sum identity; den2 =
    # 4 * (m^2 (k^3 - k) - m * T) with T from SINGLE ranks, but tie
    # groups counted on dr share the same c, so t_raw == T * 1 (the
    # c values are counts, not doubled) — t_raw IS sum(c^3 - c).
    s2_expr = (
        "(cast(sr2 as decimal(38,0))"
        " - cast(k as decimal(38,0)) * (m * (k + 1)) * (m * (k + 1)))"
    )
    den_expr = (
        "(cast(m as decimal(38,0)) * m * (k * k * k - k)"
        " - cast(m as decimal(38,0)) * t_raw)"
    )
    w_expr = F.expr(
        f"cast(3000 * {s2_expr} div {den_expr} as long)"
    )
    chi2_expr = F.expr(
        f"cast(3000 * (m * (k - 1)) * {s2_expr}"
        f" div {den_expr} as long)"
    )
    ok = complete & (F.expr(den_expr) > 0)
    return base.select(
        "m",
        "k",
        F.expr("cast(sr2 as long)").alias("sr2"),
        "t_raw",
        F.when(ok, w_expr).alias("w_milli"),
        F.when(ok, chi2_expr).alias("chi2_milli"),
        F.when(~complete, F.lit("incomplete"))
        .otherwise(F.lit("ok"))
        .alias("status"),
    )
