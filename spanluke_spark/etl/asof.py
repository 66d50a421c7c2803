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
    # Carry (ts, value_cols) as ONE struct with one last(ignorenulls): the
    # struct is non-null whenever a right row exists, so a genuinely-NULL
    # value column rides along with its own row's ts instead of being
    # skipped in favor of an older non-null value (native ASOF semantics:
    # all right_* fields come from the same matched row).
    r_struct = F.struct(
        F.col(ts_col).alias("ts"), *[F.col(c).alias(c) for c in value_cols]
    )
    l_marked = left.select(
        F.col(on),
        F.col(ts_col),
        F.lit(1).alias("_side"),
        F.struct(*[F.col(c) for c in left.columns]).alias("_l"),
        F.lit(None).cast(
            right.select(r_struct.alias("_r")).schema["_r"].dataType
        ).alias("_r"),
    )
    r_marked = right.select(
        F.col(on),
        F.col(ts_col),
        F.lit(0).alias("_side"),
        F.lit(None).cast(l_marked.schema["_l"].dataType).alias("_l"),
        r_struct.alias("_r"),
    )
    w = (
        Window.partitionBy(on)
        .orderBy(F.col(ts_col).asc(), F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = l_marked.unionByName(r_marked).select(
        "*", F.last("_r", ignorenulls=True).over(w).alias("_m")
    )
    out = carried.filter(F.col("_side") == 1).select(
        F.col("_l.*"),
        F.col("_m.ts").alias("right_ts"),
        *[F.col(f"_m.{c}").alias(f"right_{c}") for c in value_cols],
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
