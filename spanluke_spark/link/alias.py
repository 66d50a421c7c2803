"""J7: broadcast alias-dictionary entity linking + explicit skew handling.

The alias dict (FIXTURES.md §4) is small (≤ millions of rows) vs 10^12
mentions: broadcast-hash join, no shuffle of the mention stream. Skew shows up
downstream when aggregating per canonical entity ("Supreme Court" appears in a
large fraction of pages) — handled with salted two-phase aggregation
(SURVEY.md §4.4), not AQE luck.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def normalize_key(col: Column | str) -> Column:
    """Normalization key shared by both join sides: lower, trim, collapse
    internal whitespace (F13)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_replace(F.lower(F.trim(c)), r"\s+", " ")


def link_mentions(
    mentions: DataFrame,
    alias_dict: DataFrame,
    surface_col: str = "surface",
    type_guard: bool = True,
) -> DataFrame:
    """mentions + alias_dict -> mentions with (canonical_id, canonical_name).

    Broadcast-hash join on the normalized surface; ``type_guard`` also requires
    the dictionary entity_type to match the mention label (drops homonyms
    across types). Unlinked mentions keep NULL canonical_id (left join) — the
    canonicalizer may still cluster them by fuzzy key.
    """
    from pyspark.sql import Window

    # Resolve alias ambiguity on the SMALL side before the join: one winner
    # per (alias, type) — prior desc, canonical_id asc. The mention stream is
    # then joined 1:1 broadcast-hash with ZERO shuffles and no window over
    # 10^12 rows (a mention-side window measured 42s on just 2M rows).
    d = alias_dict.select(
        normalize_key("alias").alias("_k"),
        "canonical_id",
        "canonical_name",
        F.col("entity_type").alias("_etype"),
        "prior",
    )
    part_keys = ["_k", "_etype"] if type_guard else ["_k"]
    w = Window.partitionBy(*part_keys).orderBy(
        F.desc_nulls_last("prior"), F.asc_nulls_last("canonical_id")
    )
    d_best = (
        d.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn", "prior")
    )

    m = mentions.withColumn("_k", normalize_key(surface_col))
    if type_guard:
        cond = (m["_k"] == d_best["_k"]) & (m["label"] == d_best["_etype"])
        joined = m.join(F.broadcast(d_best), cond, "left").drop(d_best["_k"])
    else:
        joined = m.join(F.broadcast(d_best), on="_k", how="left")
    return joined.drop("_etype", "_k")


def salted_count(
    df: DataFrame, key_cols: list[str], salt_buckets: int = 16, salt_source: str | None = None
) -> DataFrame:
    """A8-adjacent: two-phase (salted) count for skewed keys.

    Phase 1 aggregates per (key, salt) — spreading a hot key over
    ``salt_buckets`` reducers — phase 2 sums the partials per key. The salt is
    derived from a high-cardinality column (default: all columns) via xxhash64,
    so it is deterministic, not random.
    """
    salt_col = (
        F.pmod(F.xxhash64(*([salt_source] if salt_source else df.columns)), F.lit(salt_buckets))
    ).alias("_salt")
    partial = df.groupBy(*key_cols, salt_col).agg(F.count(F.lit(1)).alias("_partial"))
    return partial.groupBy(*key_cols).agg(F.sum("_partial").alias("n"))


def skew_report(
    df: DataFrame, key_cols: list[str], top_n: int = 10, salt_buckets: int = 16
) -> DataFrame:
    """Shuffle-key skew diagnostic — the measurement you run BEFORE choosing
    salting/AQE knobs for a join or agg keyed on ``key_cols``.

    One row per top-N heaviest key plus a '__stats__' summary row carrying
    distinct-key count, total rows, max/avg frequency and the skew ratio
    (max/avg — >~ salt_buckets means one reducer holds many buckets' worth).
    Built on the salted two-phase count so measuring a hot key does not
    itself hot-spot a reducer.
    """
    counts = salted_count(df, key_cols, salt_buckets=salt_buckets)
    key_str = F.concat_ws("|", *[F.col(c).cast("string") for c in key_cols])
    top = (
        counts.orderBy(F.desc("n"), *key_cols)
        .limit(top_n)
        .select(key_str.alias("key"), F.col("n"), F.lit(None).cast("double").alias("skew_ratio"))
    )
    stats = counts.agg(
        F.lit("__stats__").alias("key"),
        F.count(F.lit(1)).alias("n_distinct_keys"),
        F.sum("n").alias("n_rows"),
        F.max("n").alias("max_freq"),
        F.avg("n").alias("avg_freq"),
    ).select(
        "key",
        F.col("n_rows").alias("n"),
        F.round(F.col("max_freq") / F.col("avg_freq"), 6).alias("skew_ratio"),
    )
    return top.unionByName(stats)
