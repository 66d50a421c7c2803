"""Slowly-changing-dimension type-2 history over a CDC update stream —
the standard way a crawl pipeline versions per-URL state (content hash,
lang, quality tier) across re-crawls: one row per (key, change) with
``[valid_from, valid_to)`` validity and NULL valid_to marking the
current version.

Shape at 100 TB: every window below shares ``partitionBy(key)``, so the
whole build is ONE shuffle on the key; change-collapse drops unchanged
re-crawls (the overwhelmingly common case) before the interval windows,
and nothing ever materializes per-key arrays. ``snapshot_at`` is a pure
codegen filter over the history table — time travel without an engine.

Reference analogue: the Iceberg page-table seam (storage/tables.py) —
this is the relational history the seam's snapshots would expose.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def scd2_history(
    updates: DataFrame,
    key: str,
    ts: str,
    attrs: list[str],
) -> DataFrame:
    """(updates) -> (key, *attrs, valid_from, valid_to, version).

    1. same-instant ties collapse deterministically (max attr tuple wins);
    2. consecutive updates with unchanged attrs collapse (null-safe
       struct compare — a re-crawl that changed nothing is not a version);
    3. valid_from = change ts, valid_to = next change ts (NULL = current),
       version = 1-based change index per key.
    """
    w_tie = Window.partitionBy(key, ts).orderBy(*[F.desc(a) for a in attrs])
    u = (
        updates.select(key, ts, *attrs)
        .withColumn("_rn", F.row_number().over(w_tie))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )
    w = Window.partitionBy(key).orderBy(ts)
    changed = u.withColumn(
        "_prev", F.lag(F.struct(*attrs)).over(w)
    ).where(~F.struct(*attrs).eqNullSafe(F.col("_prev")))
    w2 = Window.partitionBy(key).orderBy(ts)
    return (
        changed.select(
            key,
            *attrs,
            F.col(ts).alias("valid_from"),
            F.lead(ts).over(w2).alias("valid_to"),
            F.row_number().over(w2).alias("version"),
        )
    )


def snapshot_at(history: DataFrame, as_of) -> DataFrame:
    """History rows valid at ``as_of`` (``valid_from <= as_of <
    valid_to``): the dimension exactly as it stood at that instant. Pure
    filter — pushed to the scan when the history table is stored
    partitioned/sorted by valid_from."""
    t = F.lit(as_of).cast("timestamp")
    return history.where(
        (F.col("valid_from") <= t)
        & (F.col("valid_to").isNull() | (F.col("valid_to") > t))
    ).drop("valid_to")
