"""Z-order (Morton) clustering for multi-column file pruning — the
plain-parquet twin of Iceberg's ``rewrite_data_files(strategy =>
'sort', sort_order => 'zorder(a, b)')``.

A 10^12-row fact/event table is usually filtered on TWO axes at once
(host + crawl day, user + time window). Range-clustering by one column
prunes only that axis; interleaving the bits of both keys gives every
file a tight bounding BOX in (a, b) space, so parquet min/max stats
exclude most files for any 2-D predicate — the difference between
touching 4 files and touching all of them, per query, forever.

All codegen: the Morton key is a fixed chain of shift/and/or
expressions (no UDF), the layout write is one repartitionByRange + a
within-partition sort (the same sampled range shuffle any sorted write
costs), and reads need NO cooperation — pruning happens in the parquet
reader's row-group stats, proven by tests/test_zorder.py counting the
files that actually contain matching rows.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def morton_key(a: Column, b: Column, bits: int = 10) -> Column:
    """Interleave the low ``bits`` of two non-negative int columns into
    a single Z-order key (a's bit i lands at position 2i+1, b's at 2i).
    Callers bucket raw values into [0, 2^bits) first — modulo for ids,
    day/hour bucketing for timestamps."""
    one = F.lit(1).cast("long")  # bitwiseAND needs matching operand types
    z = F.lit(0).cast("long")
    for i in range(bits):
        za = F.shiftleft(F.shiftright(a.cast("long"), i).bitwiseAND(one), 2 * i + 1)
        zb = F.shiftleft(F.shiftright(b.cast("long"), i).bitwiseAND(one), 2 * i)
        z = z.bitwiseOR(za).bitwiseOR(zb)
    return z


def write_zordered(
    df: DataFrame,
    path: str,
    a: Column,
    b: Column,
    n_files: int = 16,
    bits: int = 10,
) -> None:
    """Cluster ``df`` by the Morton key of (a, b) into ``n_files``
    range-partitioned, internally sorted parquet files. Each file then
    covers a compact Z-curve segment = a small bounding box in (a, b),
    so min/max stats prune it for any predicate outside the box."""
    keyed = df.withColumn("_z", morton_key(a, b, bits))
    (
        keyed.repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
        .parquet(path)
    )


def files_with_matches(df: DataFrame) -> int:
    """How many distinct physical files contain rows surviving ``df``'s
    filters — the honest pruning metric (a file the scan can exclude via
    stats never produces a row)."""
    return (
        df.select(F.input_file_name().alias("f")).distinct().count()
    )
