"""Quantile normalization across sources (Bolstad et al. 2003 — the
microarray standard, equally at home on quality scores): three quality
models score the same corpus on incompatible scales; rank-based
calibration (evaluation/calibration.py measures miscalibration, this
FIXES comparability) replaces each score with the pooled average of
its quantile bin, so every source's distribution becomes the same
reference distribution and a single threshold means one thing.

Exact contract (engine-portable): within each source, rows rank by
(score ASC, id ASC — the deterministic tie order) into ``n_bins``
ntile buckets (SQL-standard ntile: remainder rows go to the earlier
buckets, identical in Spark and DuckDB); the reference value of bin b
is the mean score over ALL sources' rows in bin b; every row's
normalized score is its bin's reference value.

Shape: one window per source partition (single shuffle on the source
key), one bin-keyed aggregate (n_bins rows), one broadcast join back.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["quantile_normalize"]


def quantile_normalize(
    df: DataFrame,
    source_col: str = "source",
    score_col: str = "score",
    id_col: str = "doc_id",
    n_bins: int = 10,
) -> DataFrame:
    """-> input rows + (bin, score_norm): rank-calibrated scores
    comparable across sources."""
    w = Window.partitionBy(source_col).orderBy(
        F.col(score_col).asc(), F.col(id_col).asc()
    )
    binned = df.withColumn("bin", F.ntile(n_bins).over(w))
    ref = binned.groupBy("bin").agg(
        F.avg(F.col(score_col)).alias("_ref")
    )
    return (
        binned.join(F.broadcast(ref), "bin")
        .select(
            source_col,
            id_col,
            score_col,
            "bin",
            F.round("_ref", 6).alias("score_norm"),
        )
    )
