"""Data-contract validation — the ingest gate a production lake runs
before letting a 100 TB drop join the warehouse (Great-Expectations-
style, relationally): every check returns the same report row shape
(check, n_rows, n_violations, violation_frac, passed) so a whole
contract is one unioned DataFrame you can sink next to the lineage.

Three primitives, each with the cheapest possible plan:

* ``validate_rows``: N row predicates folded into ONE scan — a single
  aggregate of conditional sums, zero shuffles (map-side only);
* ``validate_unique``: duplicate mass of a key, one hash aggregate;
* ``validate_ref_integrity``: orphaned foreign keys via left_anti on
  the DISTINCT child keys (the anti-join input is pre-shrunk so a
  10^12-row fact table contributes only its key cardinality).

Checks never throw: a contract REPORTS, the caller decides whether to
fail the batch (compose with storage/lineage.py to quarantine).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_REPORT_COLS = ["check", "n_rows", "n_violations", "violation_frac", "passed"]


def _report(counts: DataFrame) -> DataFrame:
    return counts.select(
        "check",
        "n_rows",
        "n_violations",
        F.try_divide(F.col("n_violations"), F.col("n_rows")).alias(
            "violation_frac"
        ),
        (F.col("n_violations") == 0).alias("passed"),
    )


def validate_rows(df: DataFrame, checks: dict[str, Column]) -> DataFrame:
    """checks: name -> boolean Column that must hold per row (NULL
    counts as a violation). All names are evaluated in one scan."""
    aggs = [F.count(F.lit(1)).alias("_n")]
    for name, cond in checks.items():
        aggs.append(
            F.sum(
                (~F.coalesce(cond, F.lit(False))).cast("long")
            ).alias(f"_v_{name}")
        )
    row = df.agg(*aggs)
    # unpivot the 1-row aggregate with a single explode — a per-check
    # union would re-execute the full-table aggregate once per check
    entries = F.array(
        *[
            F.struct(
                F.lit(name).alias("check"),
                F.col(f"_v_{name}").alias("n_violations"),
            )
            for name in checks
        ]
    )
    out = row.select(
        F.col("_n").alias("n_rows"), F.explode(entries).alias("_e")
    ).select("_e.check", "n_rows", "_e.n_violations")
    return _report(out)


def validate_unique(
    df: DataFrame, key_cols: list[str], name: str | None = None
) -> DataFrame:
    """Rows beyond the first per key are violations."""
    name = name or "unique_" + "_".join(key_cols)
    per = df.groupBy(*key_cols).agg(F.count(F.lit(1)).alias("_c"))
    counts = per.agg(
        F.lit(name).alias("check"),
        F.sum("_c").alias("n_rows"),
        F.sum(F.col("_c") - 1).alias("n_violations"),
    )
    return _report(counts)


def validate_ref_integrity(
    child: DataFrame,
    parent: DataFrame,
    child_key: str,
    parent_key: str,
    name: str | None = None,
) -> DataFrame:
    """Child rows whose key has no parent are violations (NULL child
    keys are skipped — compose a not-null row check for those)."""
    name = name or f"ref_{child_key}_to_{parent_key}"
    keys = (
        child.where(F.col(child_key).isNotNull())
        .select(F.col(child_key).alias("_k"))
    )
    orphan_keys = keys.distinct().join(
        parent.select(F.col(parent_key).alias("_k")).distinct(),
        "_k",
        "left_anti",
    )
    orphans = keys.join(orphan_keys, "_k", "left_semi")
    counts = keys.agg(F.count(F.lit(1)).alias("n_rows")).crossJoin(
        orphans.agg(F.count(F.lit(1)).alias("n_violations"))
    ).select(F.lit(name).alias("check"), "n_rows", "n_violations")
    return _report(counts)
