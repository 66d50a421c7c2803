"""As-of (temporal) join — an operator Spark's DataFrame API lacks natively,
composed from union + ordered window so it stays one shuffle.

Each left row picks the most recent right row with the same key and
right.ts <= left.ts. The naive formulation (range theta-join + row_number)
explodes to |L|x|R| per key; this implementation interleaves both sides in
ONE window ordered by (ts, side) and carries the latest right values
forward with last(ignorenulls) — cost is a single hash shuffle on the key
plus an in-partition sort, independent of match fan-out. The same shape
backs backfills, slowly-changing-dimension lookups, and "state at event
time" queries over the events table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    ts_col: str = "ts",
    value_cols: list[str] | None = None,
    tolerance: str | None = None,
) -> DataFrame:
    """-> left rows + ``right_ts`` + the right ``value_cols`` as-of left.ts
    (inclusive). Rights sharing (key, ts) must be pre-aggregated by the
    caller if a deterministic single match matters (mirrors the ambiguity
    in native ASOF implementations). ``tolerance`` (an INTERVAL string,
    e.g. '1 hour') nulls matches older than left.ts - tolerance.
    """
    value_cols = value_cols or [c for c in right.columns if c not in (on, ts_col)]
    l_marked = left.select(
        F.col(on),
        F.col(ts_col),
        F.lit(1).alias("_side"),
        F.struct(*[F.col(c) for c in left.columns]).alias("_l"),
        F.lit(None).cast("timestamp").alias("_r_ts"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_r_{c}") for c in value_cols],
    )
    r_marked = right.select(
        F.col(on),
        F.col(ts_col),
        F.lit(0).alias("_side"),
        F.lit(None).cast(l_marked.schema["_l"].dataType).alias("_l"),
        F.col(ts_col).alias("_r_ts"),
        *[F.col(c).alias(f"_r_{c}") for c in value_cols],
    )
    w = (
        Window.partitionBy(on)
        .orderBy(F.col(ts_col).asc(), F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = l_marked.unionByName(r_marked).select(
        "*",
        F.last("_r_ts", ignorenulls=True).over(w).alias("right_ts"),
        *[
            F.last(f"_r_{c}", ignorenulls=True).over(w).alias(f"right_{c}")
            for c in value_cols
        ],
    )
    out = carried.filter(F.col("_side") == 1).select(
        F.col("_l.*"), "right_ts", *[F.col(f"right_{c}") for c in value_cols]
    )
    if tolerance is not None:
        stale = F.col("right_ts") < F.col(ts_col) - F.expr(f"INTERVAL {tolerance}")
        out = out.select(
            *left.columns,
            F.when(stale, F.lit(None).cast("timestamp")).otherwise(F.col("right_ts")).alias("right_ts"),
            *[
                F.when(stale, F.lit(None).cast(right.schema[c].dataType))
                .otherwise(F.col(f"right_{c}"))
                .alias(f"right_{c}")
                for c in value_cols
            ],
        )
    return out
