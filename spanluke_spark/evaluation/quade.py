"""Quade test (Quade 1979) and the records test (Foster & Stuart
1954) — two more distribution-free trend/treatment detectors. Quade
is the better-powered small-k alternative to Friedman (q340): blocks
with LARGER spread get more say (weighted by the rank of the block
range), which Friedman's flat weighting throws away. The records
test is the zero-parameter trend check: in an exchangeable series
the number of running records is ~H_n; a drifting series sets
records constantly (the q387 Cox-Stuart's even simpler cousin).

Quade exactness (doubled ranks twice over, every scale cancels):
within-block doubled ranks DR_ij (ties exact), block-range doubled
ranks QD_i (ranking range_i = max_j - min_j across blocks), and

  S~_ij = QD_i * (DR_ij - (k + 1))     [= 4 * Quade's S_ij]
  S_j   = sum_i S~_ij
  t3_milli = 1000 * (b - 1) * sum_j S_j^2
             div (b * sum_ij S~_ij^2 - sum_j S_j^2)

an exact integer rational (the 16x scale cancels top and bottom),
cleared in DECIMAL/HUGEINT; report with df1 = k-1,
df2 = (b-1)(k-1). A == B (every block ranks the treatments
identically — the perfectly consistent ordering) makes the
denominator 0: status='perfect_consistency' with NULL t3
(T3 -> infinity; pytest-pinned). Incomplete blocks surface
status='incomplete'.

Records test exactness (the q420 floor-cell harmonic discipline):
R = #{t : x_t > max of all earlier} (first observation counts, ties
do NOT set records — stated), and under exchangeability

  E[R]  -> e_micro = sum_j (10^6 div j)
  Var[R]-> v_micro = sum_j (10^6 div j - 10^6 div (j*j))
  z2_milli = 1000 * (10^6 * R - e_micro)^2
             div (10^6 * v_micro)              [DECIMAL/HUGEINT]

both moments as exact floor-cell integers both engines replay;
verdict at chi-square(1) 3841. Monotone series (R == n) fires high,
reversed series (R == 1) fires from below; n < 2 NULL.

Distributed shape: Quade is two bounded rank windows (within block,
across blocks) + two aggregates; records is one running-max window
+ one aggregate with a generated 1..n harmonic join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["quade_test", "records_test"]


def quade_test(
    df: DataFrame,
    block_col: str = "block",
    treatment_col: str = "treatment",
    y_col: str = "y",
) -> DataFrame:
    """(block, treatment, y int) complete design -> ONE row (b, k,
    a_sum, b_sum, t3_milli, df1, df2, status)."""
    s = df.select(
        F.col(block_col).alias("blk"),
        F.col(treatment_col).alias("trt"),
        F.col(y_col).cast("long").alias("y"),
    )
    # within-block doubled ranks (value classes per block)
    cls = s.groupBy("blk", "y").agg(F.count(F.lit(1)).alias("c"))
    wv = (
        Window.partitionBy("blk")
        .orderBy("y")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    ranked = cls.select(
        "blk",
        "y",
        (
            2 * (F.sum("c").over(wv) - F.col("c")) + F.col("c") + 1
        ).alias("dr"),
    )
    rows = s.join(ranked, ["blk", "y"])
    # block ranges and their doubled ranks across blocks
    ranges = s.groupBy("blk").agg(
        (F.max("y") - F.min("y")).alias("rng"),
        F.count(F.lit(1)).cast("long").alias("k_in_block"),
    )
    rcls = ranges.groupBy("rng").agg(F.count(F.lit(1)).alias("c"))
    wr = Window.orderBy("rng").rowsBetween(
        Window.unboundedPreceding, 0
    )
    rranked = rcls.select(
        "rng",
        (
            2 * (F.sum("c").over(wr) - F.col("c")) + F.col("c") + 1
        ).alias("qd"),
    )
    blocks = ranges.join(F.broadcast(rranked), "rng")
    meta = blocks.groupBy().agg(
        F.count(F.lit(1)).cast("long").alias("b"),
        F.min("k_in_block").alias("kmin"),
        F.max("k_in_block").alias("kmax"),
    )
    dec = rows.join(
        F.broadcast(blocks.select("blk", "qd")), "blk"
    ).crossJoin(F.broadcast(meta))
    cells = dec.select(
        "b",
        "kmin",
        "kmax",
        "trt",
        (
            F.col("qd") * (F.col("dr") - (F.col("kmin") + 1))
        ).alias("s_cell"),
    )
    per_trt = cells.groupBy("b", "kmin", "kmax", "trt").agg(
        F.sum("s_cell").alias("sj"),
        F.sum(F.col("s_cell") * F.col("s_cell")).alias("a_part"),
    )
    agg = per_trt.groupBy("b", "kmin", "kmax").agg(
        F.sum("a_part").alias("a_sum"),
        F.sum(F.col("sj") * F.col("sj")).alias("b_raw"),
    )
    complete = F.col("kmin") == F.col("kmax")
    den = F.expr("b * a_sum - b_raw")
    status = (
        F.when(~complete, "incomplete")
        .when(den == 0, "perfect_consistency")
        .otherwise("ok")
    )
    t3 = F.expr(
        "cast(1000 * cast(b - 1 as decimal(38,0)) * b_raw"
        " div (cast(b as decimal(38,0)) * a_sum - b_raw) as long)"
    )
    return agg.select(
        "b",
        F.col("kmin").alias("k"),
        "a_sum",
        F.col("b_raw").alias("b_sum"),
        F.when(complete & (den > 0), t3).alias("t3_milli"),
        (F.col("kmin") - 1).alias("df1"),
        ((F.col("b") - 1) * (F.col("kmin") - 1)).alias("df2"),
        status.alias("status"),
    )


def records_test(
    df: DataFrame, t_col: str = "t", x_col: str = "x"
) -> DataFrame:
    """(t order key, x int) -> ONE row (n, n_records, e_micro,
    v_micro, z2_milli, sig05, direction)."""
    s = df.select(
        F.col(t_col).cast("long").alias("t"),
        F.col(x_col).cast("long").alias("x"),
    )
    w = Window.orderBy("t").rowsBetween(
        Window.unboundedPreceding, -1
    )
    marked = s.select(
        F.when(
            F.max("x").over(w).isNull()
            | (F.col("x") > F.max("x").over(w)),
            1,
        )
        .otherwise(0)
        .cast("long")
        .alias("is_rec")
    )
    agg = marked.groupBy().agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("is_rec").alias("r"),
    )
    # harmonic floor cells generated 1..n from the aggregate itself
    harm = agg.select(
        "n",
        "r",
        F.explode(F.sequence(F.lit(1), F.col("n").cast("int"))).alias(
            "j"
        ),
    ).groupBy("n", "r").agg(
        F.sum(F.expr("1000000 div j")).alias("e_micro"),
        F.sum(
            F.expr("1000000 div j - 1000000 div (j * j)")
        ).alias("v_micro"),
    )
    devnum = F.expr("1000000 * r - e_micro")
    z2 = F.expr(
        "cast(1000 * cast(1000000 * r - e_micro as decimal(38,0))"
        " * (1000000 * r - e_micro)"
        " div (cast(1000000 as decimal(38,0)) * v_micro) as long)"
    )
    ok = (F.col("n") >= 2) & (F.col("v_micro") > 0)
    return harm.select(
        "n",
        F.col("r").alias("n_records"),
        "e_micro",
        "v_micro",
        F.when(ok, z2).alias("z2_milli"),
        F.when(ok, z2 > 3841).alias("sig05"),
        F.when(devnum > 0, F.lit("record_rich"))
        .when(devnum < 0, F.lit("record_poor"))
        .otherwise(F.lit("as_expected"))
        .alias("direction"),
    )
