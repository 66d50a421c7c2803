"""Iterative proportional fitting (raking; Deming & Stephan 1940) —
calibrate corpus cell weights to TARGET marginals on two axes at once.
The mixture tooling here (textops/mixture.py) reweights along ONE axis
(temperature over language shares); real training-data specs pin BOTH
margins ("match this language distribution AND this domain
distribution"), and the joint that satisfies both while staying closest
(in KL) to the observed joint is exactly the IPF fixpoint.

One round = two half-steps: scale every cell so row marginals match the
row targets, then so column marginals match the column targets. Each
half-step is one tiny aggregate over the CELL table (|rows| x |cols|
entries — langs x domains, hundreds at most) joined back broadcast; the
corpus is touched ONCE to build the cell counts, never again. Rounds
are a fixed parameter (IPF converges geometrically on strictly positive
tables), so the unrolled oracle replays every half-step bit-for-bit.

Zero cells stay zero (standard IPF); a target marginal whose entire
row/column is zero in the data is unreachable and surfaces as a NULL
scale — caller-visible rather than silently wrong.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["ipf_weights"]


def ipf_weights(
    df: DataFrame,
    row_targets: dict[str, float],
    col_targets: dict[str, float],
    row_col: str = "lang",
    col_col: str = "domain",
    rounds: int = 3,
    checkpoint: bool = True,
) -> DataFrame:
    """df rows (one per document) -> (row, col, n, weight): per-cell
    multiplicative weights such that the weighted joint's marginals
    match the targets after ``rounds`` IPF rounds. Weights are relative
    frequencies (the weighted cells sum to 1 across the table); multiply
    by n to get expected sample mass. Cells absent from the data are
    absent from the output; cells whose row/col has no target get
    target 0 and rake to weight 0."""
    cells = (
        df.groupBy(
            F.col(row_col).alias("_r"), F.col(col_col).alias("_c")
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )
    total = cells.agg(F.sum("n").alias("_tot"))
    w = cells.crossJoin(F.broadcast(total)).select(
        "_r", "_c", "n", (F.col("n") / F.col("_tot")).alias("w")
    )
    if checkpoint:
        # the weight relation feeds BOTH the marginal aggregate and the
        # rake join every half-step — without per-round truncation the
        # lazy plan doubles per half-step (2^(2*rounds) copies of the
        # base), which stalls Catalyst long before any data moves. The
        # relation is |cells| rows, so eager checkpointing is free.
        w = w.localCheckpoint(eager=True)
    rt: F.Column = F.lit(0.0)
    for k, v in sorted(row_targets.items()):
        rt = F.when(F.col("_r") == k, F.lit(float(v))).otherwise(rt)
    ct: F.Column = F.lit(0.0)
    for k, v in sorted(col_targets.items()):
        ct = F.when(F.col("_c") == k, F.lit(float(v))).otherwise(ct)

    for _ in range(rounds):
        rm = w.groupBy("_r").agg(F.sum("w").alias("_rm"))
        w = (
            w.join(F.broadcast(rm), "_r")
            .select(
                "_r", "_c", "n",
                F.when(rt == 0, F.lit(0.0))
                .otherwise(
                    F.col("w") * F.try_divide(rt, F.col("_rm"))
                )
                .alias("w"),
            )
        )
        cm = w.groupBy("_c").agg(F.sum("w").alias("_cm"))
        w = (
            w.join(F.broadcast(cm), "_c")
            .select(
                "_r", "_c", "n",
                F.when(ct == 0, F.lit(0.0))
                .otherwise(
                    F.col("w") * F.try_divide(ct, F.col("_cm"))
                )
                .alias("w"),
            )
        )
        if checkpoint:
            w = w.localCheckpoint(eager=True)
    return w.select(
        F.col("_r").alias(row_col),
        F.col("_c").alias(col_col),
        "n",
        F.round("w", 6).alias("weight"),
    )
