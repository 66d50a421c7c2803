"""Bhattacharyya coefficient + (squared) Hellinger distance between
two corpus type distributions (Bhattacharyya 1943; Hellinger 1909) —
the bounded, symmetric geometric companion of the divergence lanes
(KL drift q275, JSD, PSI): BC = sum_i sqrt(p_i q_i) measures overlap
of the two unit vectors sqrt(p), sqrt(q) on the probability simplex,
H^2 = 1 - BC is a true metric's square (unlike KL it never blows up
on disjoint support), and the Bhattacharyya distance -ln BC is the
classifier-error bound classic.

Exactness discipline — the repo's sqrt lanes lean on the ONE libm
operation IEEE 754 guarantees correctly rounded (unlike ln/exp):
per union-type cell, with a_i, b_i the two raw counts and A, B the
corpus totals,

  cell_ppm_i = floor( ieee_sqrt( (a_i * b_i * 10^12) div (A * B) ) )

— an integer `div` then one correctly-rounded sqrt then one floor,
bit-identical in Spark and DuckDB while the div result stays below
2^53 (the caller's contract: A*B and a_i*b_i*10^12 ride
DECIMAL(38,0)/HUGEINT, the QUOTIENT is <= 10^12 always, so the
double hop is value-preserving unconditionally — the regime
statement is about the operands, not the quotient). Then

  bc_ppm  = sum_i cell_ppm_i          (exact integer sum)
  h2_ppm  = 10^6 - bc_ppm             (exact complement BY
                                       CONSTRUCTION: the pytest
                                       asserts bc + h2 == 1e6)
  bd_micro = lnq(10^6) - lnq(bc_ppm)  (micro-nat integer-argument
                                       ln cells, q421 discipline;
                                       NULL when bc_ppm == 0 —
                                       disjoint support)

Closed-form lanes: IDENTICAL corpora with A | a_i * 10^6 make every
div exact and every argument a perfect square -> bc_ppm == 10^6 and
h2_ppm == 0 EXACTLY; DISJOINT corpora zero every product ->
bc_ppm == 0, h2_ppm == 10^6 exactly, bd NULL; swapping the corpora
is exact symmetry (commutative products). Per-cell floor-of-sqrt
bias is downward and < 1 ppm per union type (stated).

Distributed shape: ONE groupBy over the union vocabulary with
conditional partial sums (no join between the corpora at all), two
broadcast totals, one final aggregate. Either corpus empty -> NULL
row with status.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["bhattacharyya_hellinger"]


def bhattacharyya_hellinger(
    df: DataFrame,
    src_col: str = "src",
    term_col: str = "term",
    cnt_col: str = "c",
) -> DataFrame:
    """(src 0/1, term, c) -> ONE row (n_types, a_tot, b_tot, bc_ppm,
    h2_ppm, bd_micro, status). src == 0 is corpus A; counts must be
    positive (the caller's contract, audited: nonpositive counts ->
    status 'bad_counts')."""
    s = df.select(
        (F.col(src_col) == 0).alias("is_a"),
        F.col(term_col).alias("t"),
        F.col(cnt_col).cast("long").alias("c"),
    )
    cells = s.groupBy("t").agg(
        F.sum(F.when(F.col("is_a"), F.col("c")).otherwise(0)).alias(
            "a"
        ),
        F.sum(
            F.when(~F.col("is_a"), F.col("c")).otherwise(0)
        ).alias("b"),
        F.sum(F.when(F.col("c") <= 0, 1).otherwise(0)).alias("bad"),
    )
    tot = cells.groupBy().agg(
        F.count(F.lit(1)).cast("long").alias("n_types"),
        F.sum("a").alias("a_tot"),
        F.sum("b").alias("b_tot"),
        F.sum("bad").alias("n_bad"),
    )
    scored = cells.crossJoin(F.broadcast(tot)).select(
        F.expr(
            "cast(floor(sqrt(cast("
            "cast(a as decimal(38,0)) * b * 1000000000000"
            " div (cast(a_tot as decimal(38,0)) * b_tot)"
            " as double))) as long)"
        ).alias("cell")
    )
    bc = scored.groupBy().agg(F.sum("cell").alias("bc_ppm"))
    out = tot.crossJoin(F.broadcast(bc))
    ok = (
        (F.col("a_tot") > 0)
        & (F.col("b_tot") > 0)
        & (F.col("n_bad") == 0)
    )
    lnq = lambda e: F.expr(
        f"cast(round(ln(cast(({e}) as double)) * 1000000) as long)"
    )
    return out.select(
        "n_types",
        "a_tot",
        "b_tot",
        F.when(ok, F.col("bc_ppm")).alias("bc_ppm"),
        F.when(ok, 1000000 - F.col("bc_ppm")).alias("h2_ppm"),
        F.when(
            ok & (F.col("bc_ppm") > 0),
            lnq("1000000") - lnq("bc_ppm"),
        ).alias("bd_micro"),
        F.when(F.col("n_bad") > 0, F.lit("bad_counts"))
        .when(~ok, F.lit("degenerate"))
        .otherwise(F.lit("ok"))
        .alias("status"),
    )
