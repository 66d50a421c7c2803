"""Good-Turing frequency-of-frequencies table with the raw Turing
re-estimates (Good 1953; the Gale & Sampson 1995 presentation) — the
count-calibration companion to the missing-mass estimate (q158,
which reports only N_1/N): for every observed frequency class r the
table says how much an r-count word's frequency is OVERSTATED, the
standard input to any smoothed LM (Katz backoff, simple GT) and the
honest answer to "how trustworthy is a count of 2 in this slice?".

  N_r   = number of distinct words seen exactly r times
  r*    = (r + 1) N_{r+1} / N_r     (the Turing estimate; NULL when
                                     N_{r+1} = 0 — the raw table does
                                     not smooth, it reports the gap)
  mass_r = r N_r / N                (share of tokens in class r)

Exact carry: all counts integer; r* as the exact rational
(rstar_num, rstar_den) = ((r+1) N_{r+1}, N_r) plus trunc-ppm;
mass_ppm = r N_r 10^6 div N.

Distributed shape: two combinable groupBys (word counts, then
frequency-of-frequencies) + one self-join on r+1 — output is
O(distinct frequencies) ~ O(sqrt N) rows per group, model-sized.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["good_turing"]


def good_turing(
    docs: DataFrame,
    group_col: str = "grp",
    text_col: str = "text",
) -> DataFrame:
    """(group, text) -> per (group, r): (grp, r, n_r, n_r_next,
    rstar_num, rstar_den, rstar_ppm, mass_ppm)."""
    words = docs.select(
        F.col(group_col).alias("grp"),
        F.explode(
            F.filter(F.split(F.col(text_col), " "), lambda t: t != "")
        ).alias("w"),
    )
    freq = words.groupBy("grp", "w").agg(F.count(F.lit(1)).alias("r"))
    nof = freq.groupBy("grp", "r").agg(
        F.count(F.lit(1)).cast("long").alias("n_r")
    )
    tot = nof.groupBy("grp").agg(
        F.sum(F.col("r") * F.col("n_r")).cast("long").alias("n")
    )
    nxt = nof.select(
        "grp", (F.col("r") - 1).alias("r"), F.col("n_r").alias("n_r_next")
    )
    out = (
        nof.join(nxt, ["grp", "r"], "left")
        .join(tot, "grp")
        .select(
            "grp",
            F.col("r").cast("long").alias("r"),
            "n_r",
            F.coalesce("n_r_next", F.lit(0)).cast("long").alias("n_r_next"),
            "n",
        )
    )
    out = (
        out.withColumn(
            "rstar_num",
            ((F.col("r") + 1) * F.col("n_r_next")).cast("long"),
        )
        .withColumn("rstar_den", F.col("n_r"))
        .withColumn(
            "rstar_ppm",
            F.when(
                F.col("n_r_next") > 0,
                F.expr("rstar_num * 1000000 div rstar_den"),
            ),
        )
        .withColumn(
            "mass_ppm", F.expr("r * n_r * 1000000 div n")
        )
    )
    return out.select(
        "grp",
        "r",
        "n_r",
        "n_r_next",
        "rstar_num",
        "rstar_den",
        "rstar_ppm",
        "mass_ppm",
    )
