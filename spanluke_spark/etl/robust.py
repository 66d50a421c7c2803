"""Fault-tolerant JSONL ingestion (S2 at web scale).

The reference reads trusted, hand-curated JSON (legal_ner/utils/dataset.py:
96-107 — a bad line raises and kills the run). A 10^12-row crawl feed always
contains torn/truncated/mis-encoded records; dropping the whole partition
for one bad line is not an option. PERMISSIVE mode + a corrupt-record column
classifies every line as good or quarantined in the same single pass — no
second scan, no Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

CORRUPT_COL = "_corrupt_record"


def read_jsonl_robust(
    spark: SparkSession, path: str, schema: str
) -> tuple[DataFrame, DataFrame]:
    """-> (good, quarantine): good rows parsed to ``schema``; quarantine
    keeps the raw text of every unparseable line for triage/replay.

    ``schema`` must be explicit (DDL string) — schema inference would make
    a second pass over 100 TB and can silently widen types on dirty data.

    SHARP EDGE: Spark rejects any query over this scan whose referenced
    columns prune down to ONLY the corrupt column — which is exactly what a
    bare ``good.count()`` / ``quarantine.count()`` does (count prunes every
    projection; the corrupt filter is all that remains). Real queries touch
    data columns and are unaffected; for counting, use ``split_counts``.
    """
    df = spark.read.schema(f"{schema}, {CORRUPT_COL} string").option(
        "mode", "PERMISSIVE"
    ).option("columnNameOfCorruptRecord", CORRUPT_COL).json(path)
    good = df.filter(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
    # Quarantine keeps the (all-null) parsed columns alongside raw_line:
    # Spark refuses a JSON-scan query whose referenced columns are ONLY the
    # corrupt column, so downstream consumers must reference a data column
    # too (e.g. sum(coalesce(doc_id, 0)) next to the count) — keeping the
    # columns here makes that possible without caching the 100 TB scan.
    quarantine = df.filter(F.col(CORRUPT_COL).isNotNull()).withColumnRenamed(
        CORRUPT_COL, "raw_line"
    )
    return good, quarantine


def _safe_count(df: DataFrame, skip: tuple[str, ...]) -> int:
    """Count rows keeping one data-column reference INSIDE the aggregate so
    column pruning cannot reduce the scan to the corrupt column alone."""
    data_cols = [c for c in df.columns if c not in skip]
    if not data_cols:
        return df.count()
    # pmod keeps each term < 2^31 so the LongType partial sums can never
    # overflow (ANSI mode would raise ARITHMETIC_OVERFLOW on raw 64-bit
    # hashes after a handful of rows — same guard as canon/cc.py checksum).
    row = df.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.pmod(F.xxhash64(F.col(data_cols[0])), F.lit(2147483647))).alias("_keep"),
    ).first()
    return row["n"]


def quarantine_count(quarantine: DataFrame) -> int:
    return _safe_count(quarantine, skip=("raw_line",))


def split_counts(good: DataFrame, quarantine: DataFrame) -> tuple[int, int]:
    """(n_good, n_quarantined) — the count shape the corrupt-column
    restriction breaks, done safely (see read_jsonl_robust docstring)."""
    return _safe_count(good, skip=()), quarantine_count(quarantine)
