"""Deterministic, reproducible sampling for training-data curation:
per-stratum quota sampling and train/val/test hash splits.

Both are keyed on the portable md5-derived hash of the document id, NOT
`rand()`: the sample is identical across reruns, executors, partitionings,
and engines (the DuckDB twin of the hash is exact), which is what lineage
and resume require. Pure codegen — a filter/case over the scan, no shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..dedup.dedup import portable_hash64

_BUCKETS = 1_000_000


def _unit_hash(id_col: Column, salt: str) -> Column:
    """Deterministic uniform [0, 1) from (salt, id) — portable_hash64 is
    non-negative (60-bit), so pmod-free % is safe."""
    h = portable_hash64(F.concat(F.lit(salt + ":"), id_col.cast("string")))
    return (h % _BUCKETS) / F.lit(float(_BUCKETS))


def stratified_sample(
    df: DataFrame,
    rates: dict[str, float],
    strata_col: str = "lang",
    id_col: str = "doc_id",
    salt: str = "sample",
    default_rate: float = 0.0,
) -> DataFrame:
    """Keep each row with its stratum's probability, deterministically:
    row survives iff unit_hash(salt, id) < rate[stratum]. Strata absent
    from ``rates`` get ``default_rate``."""
    u = _unit_hash(F.col(id_col), salt)
    rate: Column = F.lit(default_rate)
    for stratum, r in sorted(rates.items()):
        rate = F.when(F.col(strata_col) == stratum, F.lit(r)).otherwise(rate)
    return df.filter(u < rate)


def hash_split(
    df: DataFrame,
    weights: dict[str, float],
    id_col: str = "doc_id",
    salt: str = "split",
    out_col: str = "split",
) -> DataFrame:
    """Assign every row to exactly one named split (e.g. train/val/test)
    by cumulative weight intervals over the unit hash. Weights must sum
    to 1 (validated). Disjoint, exhaustive, reproducible."""
    total = sum(weights.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"split weights must sum to 1, got {total}")
    u = _unit_hash(F.col(id_col), salt)
    expr: Column | None = None
    cum = 0.0
    items = sorted(weights.items())
    for name, w in items[:-1]:
        cum += w
        expr = (
            F.when(u < cum, F.lit(name))
            if expr is None
            else expr.when(u < cum, F.lit(name))
        )
    last = items[-1][0]
    expr = F.lit(last) if expr is None else expr.otherwise(F.lit(last))
    return df.withColumn(out_col, expr)
