"""Temporal KG: per-crawl snapshots and cross-crawl diffs.

A Common-Crawl-style KG is rebuilt per crawl; what downstream consumers
ingest is the DELTA (new facts, retracted facts, changed values), not the
10^12-triple snapshot. Two operators:

* ``latest_snapshot``: latest-wins per (subj, pred) by observation
  timestamp — ``max_by`` with a total-order tie-break (ts, then obj) so
  the snapshot is deterministic under same-timestamp re-observations.
  One two-phase aggregate; the heavy obj strings ride inside the
  ``max_by`` struct, never a window.
* ``snapshot_diff``: full outer join of two snapshots on (subj, pred)
  with status ``added`` / ``removed`` / ``changed`` (unchanged rows are
  dropped — at crawl scale they are ~99% of the join and nobody reads
  them). Shuffles the two reduced snapshots only.

Reference analogue: `graph/triples.py` materializes per-run triples with
provenance; this is the cross-run consumer (the north_rule's resumable
per-crawl build implies exactly this read-side diff).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def latest_snapshot(
    triples: DataFrame, ts_col: str = "warc_ts"
) -> DataFrame:
    """(subj, pred, obj, ts) -> (subj, pred, obj, ts): the latest
    observation per (subj, pred); ties on ts broken by max obj."""
    return (
        triples.groupBy("subj", "pred")
        .agg(F.max(F.struct(F.col(ts_col).alias("ts"), "obj")).alias("_m"))
        .select("subj", "pred", "_m.obj", F.col("_m.ts").alias(ts_col))
    )


def snapshot_diff(old: DataFrame, new: DataFrame) -> DataFrame:
    """Two (subj, pred, obj) snapshots -> (subj, pred, old_obj, new_obj,
    status) where status ∈ {added, removed, changed}; identical rows are
    omitted."""
    o = old.select("subj", "pred", F.col("obj").alias("old_obj"))
    n = new.select("subj", "pred", F.col("obj").alias("new_obj"))
    joined = o.join(n, ["subj", "pred"], "full_outer")
    status = (
        F.when(F.col("old_obj").isNull(), F.lit("added"))
        .when(F.col("new_obj").isNull(), F.lit("removed"))
        .when(F.col("old_obj") != F.col("new_obj"), F.lit("changed"))
    )
    return (
        joined.withColumn("status", status)
        .where(F.col("status").isNotNull())
        .select("subj", "pred", "old_obj", "new_obj", "status")
    )


def validity_intervals(
    triples: DataFrame, ts_col: str = "warc_ts"
) -> DataFrame:
    """Coalesce per-fact observations into maximal validity intervals
    (gaps-and-islands): within each (subj, pred) ordered by observation
    time, consecutive observations of the SAME obj form one interval;
    an intervening different obj closes it. Output one row per interval:
    (subj, pred, obj, valid_from, valid_to, n_obs).

    This is how a temporal KG turns a raw re-crawl log into
    "fact f held from t1 to t2" edges (Wikidata-style qualifiers).
    The window partition is (subj, pred) whose size is bounded by the
    number of crawls that observed the key (~10^2), NOT by corpus size,
    so the sort-based window is safe at 10^12 observations. Ties on the
    timestamp are ordered by obj so the islands are a pure function of
    the input set.
    """
    from pyspark.sql import Window

    w = Window.partitionBy("subj", "pred").orderBy(ts_col, "obj")
    changed = (
        F.lag("obj").over(w).isNull() | (F.lag("obj").over(w) != F.col("obj"))
    ).cast("int")
    island = F.sum(changed).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        triples.select("subj", "pred", "obj", ts_col)
        .withColumn("_island", island)
        .groupBy("subj", "pred", "_island", "obj")
        .agg(
            F.min(ts_col).alias("valid_from"),
            F.max(ts_col).alias("valid_to"),
            F.count(F.lit(1)).alias("n_obs"),
        )
        .drop("_island")
    )


def snapshot_churn(old: DataFrame, new: DataFrame) -> DataFrame:
    """Per-predicate churn between two crawl snapshots: how volatile is
    each relation across re-crawls? -> (pred, n_old, n_added, n_removed,
    n_changed, churn) with churn = (added + removed + changed) / n_old
    (NULL for predicates absent from the old snapshot). The KG-ops
    dashboard row that decides re-crawl cadence per relation: a pred
    with churn 0.9 needs fresh crawls, one at 0.001 can be cached.

    Cost: the snapshot_diff join (unchanged rows already dropped) plus
    two predicate-keyed aggregates — the diff is usually ~1% of the
    snapshot, so this is nearly free next to the snapshots themselves.
    """
    diff = snapshot_diff(old, new)
    counts = diff.groupBy("pred").agg(
        F.count(F.when(F.col("status") == "added", 1)).alias("n_added"),
        F.count(F.when(F.col("status") == "removed", 1)).alias("n_removed"),
        F.count(F.when(F.col("status") == "changed", 1)).alias("n_changed"),
    )
    n_old = old.groupBy("pred").agg(F.count(F.lit(1)).alias("n_old"))
    joined = n_old.join(counts, "pred", "full_outer")
    z = F.lit(0).cast("long")
    return joined.select(
        "pred",
        F.coalesce("n_old", z).alias("n_old"),
        F.coalesce("n_added", z).alias("n_added"),
        F.coalesce("n_removed", z).alias("n_removed"),
        F.coalesce("n_changed", z).alias("n_changed"),
        (
            (
                F.coalesce("n_added", z)
                + F.coalesce("n_removed", z)
                + F.coalesce("n_changed", z)
            )
            / F.col("n_old")
        ).alias("churn"),
    )
