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
    m = mentions.withColumn("_k", normalize_key(surface_col))
    d = alias_dict.select(
        normalize_key("alias").alias("_k"),
        "canonical_id",
        "canonical_name",
        F.col("entity_type").alias("_etype"),
        "prior",
    )
    joined = m.join(F.broadcast(d), on="_k", how="left")
    if type_guard:
        joined = joined.withColumn(
            "canonical_id",
            F.when(F.col("_etype") == F.col("label"), F.col("canonical_id")),
        ).withColumn(
            "canonical_name",
            F.when(F.col("_etype") == F.col("label"), F.col("canonical_name")),
        )
    # Ambiguous aliases (same surface, several canonicals): keep the highest
    # prior, tie-break on canonical_id — deterministic.
    from pyspark.sql import Window

    w = Window.partitionBy(*mentions.columns, "_k").orderBy(
        # surviving links first (type_guard nulls mismatches), then best prior
        F.col("canonical_id").isNull().cast("int"),
        F.desc_nulls_last("prior"),
        F.asc_nulls_last("canonical_id"),
    )
    deduped = (
        joined.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn", "_etype", "prior", "_k")
    )
    return deduped


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
