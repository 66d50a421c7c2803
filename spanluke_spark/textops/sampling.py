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


def weighted_sample_per_group(
    df: DataFrame,
    k: int,
    weight_col: str,
    group_col: str = "lang",
    id_col: str = "doc_id",
    salt: str = "wsample",
) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement, k rows per
    group, inclusion probability proportional to ``weight_col``
    (Efraimidis-Spirakis A-ES, IPL 2006): each row gets key =
    ln(u) / w with u a deterministic unit hash of (salt, id), and the
    k LARGEST keys per group win — exactly equivalent to sequential
    weighted draws, but embarrassingly parallel and reproducible.

    The quality-weighted curation sampler: "keep the best-ish 100k pages
    per language, biased by quality score, same set on every rerun."
    Rows with non-positive weight are excluded. The per-group top-k is a
    rank window, which Spark executes with WindowGroupLimit partial
    top-k below the shuffle — each task forwards at most k rows per
    group, so a 10^12-row corpus shuffles ~k * n_groups rows, not the
    corpus."""
    # (0, 1]: +1 dodges ln(0) = -inf
    h = portable_hash64(
        F.concat(F.lit(salt + ":"), F.col(id_col).cast("string"))
    )
    u = (h % _BUCKETS + 1) / F.lit(float(_BUCKETS))
    key = F.log(u) / F.col(weight_col)
    from pyspark.sql import Window

    w = Window.partitionBy(group_col).orderBy(
        F.desc("_es_key"), F.col(id_col)
    )
    return (
        df.where(F.col(weight_col) > 0)
        .withColumn("_es_key", key)
        .withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= k)
        .drop("_es_key", "_rn")
    )
