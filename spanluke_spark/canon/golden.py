"""Golden-record survivorship — consolidate each canonicalized entity
cluster's conflicting attribute rows into ONE record. The canon chain
so far produces cluster MEMBERSHIP (cc.py, corrclust.py) and dedup
picks a surviving ROW (dedup_keep's min-id rule); master-data
consolidation is different: each ATTRIBUTE survives independently, so
the golden name may come from the high-priority registry source while
the golden address comes from the freshest crawl row.

Survivorship rule, per cluster per attribute, over non-null values
only: lowest source priority wins; ties break to the HIGHEST recency;
remaining ties to the smallest value (total order, so reruns agree).
That is one `min(struct(priority, -recency, value))` per attribute —
a single hash aggregate over the cluster key with map-side partial
combine (the Borůvka pick shape, plan-audited there); attribute
conflicts stay visible through per-attribute distinct counts.

One shuffle total, keyed on the cluster id; no windows, no joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["golden_records"]


def golden_records(
    df: DataFrame,
    attr_cols: list[str],
    cluster_col: str = "cluster",
    priority_col: str = "priority",
    recency_col: str = "recency",
) -> DataFrame:
    """(cluster, n_records, <attr>..., <attr>_n_distinct...): the
    surviving value per attribute (NULL if every row's value is NULL)
    plus the distinct non-null value count (conflict signal).
    ``priority_col``: smaller = more trusted; ``recency_col``: larger =
    fresher (numeric)."""
    aggs = [F.count(F.lit(1)).alias("n_records")]
    for a in attr_cols:
        key = F.when(
            F.col(a).isNotNull(),
            F.struct(
                F.col(priority_col).alias("p"),
                (-F.col(recency_col)).alias("r"),
                F.col(a).alias("v"),
            ),
        )
        aggs.append(F.min(key).getField("v").alias(a))
        aggs.append(F.count_distinct(F.col(a)).alias(f"{a}_n_distinct"))
    return df.groupBy(F.col(cluster_col).alias("cluster")).agg(*aggs)
