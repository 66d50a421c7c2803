"""Greedy set cover — pick K documents that together cover the most
entities/topics/n-gram buckets: the classic (1 - 1/e)-approximation
(Nemhauser et al. 1978 submodularity bound) and the standard shape for
eval-set selection, annotation budgeting, and dedup-cluster
representative picking ("give me 50 pages that exercise every template
family"). Sampling lanes (textops/sampling.py) draw by hash — coverage
selection OPTIMIZES what the sample touches.

Per round: one anti-join of the element relation against the covered
set (uncovered residual), one map-side-combinable count per candidate
set, one deterministic argmax (count DESC, set id ASC — a 1-row
limit(1) collect, the bounded-collect discipline of link/kmeans.py's k
centroid rows: K rows total over the whole run, never data-sized), and
one covered-set union with per-round ``localCheckpoint``. K is a fixed
small budget, so the job count is bounded and the oracle unrolls every
round.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["greedy_set_cover"]


def greedy_set_cover(
    df: DataFrame,
    k: int,
    set_col: str = "doc_id",
    elem_col: str = "entity",
    checkpoint: bool = True,
) -> DataFrame:
    """df(set, elem) -> (round, set id, new_covered, total_covered):
    the greedy K-round cover trace. Stops early when everything is
    covered (fewer than K output rows). Ties break to the smallest set
    id, so the trace is deterministic and SQL-replayable."""
    spark = df.sparkSession
    u = df.select(
        F.col(set_col).alias("s"), F.col(elem_col).alias("e")
    ).distinct()
    if checkpoint:
        u = u.localCheckpoint(eager=True)
    picks: list[tuple[int, object, int, int]] = []
    total = 0
    for rnd in range(1, k + 1):
        top = (
            u.groupBy("s")
            .agg(F.count(F.lit(1)).alias("c"))
            .orderBy(F.col("c").desc(), F.col("s").asc())
            .limit(1)
            .collect()
        )
        if not top:
            break
        s_id, c = top[0]["s"], top[0]["c"]
        total += c
        picks.append((rnd, s_id, c, total))
        covered = u.filter(F.col("s") == s_id).select("e")
        u = u.join(covered, "e", "left_anti")
        if checkpoint:
            u = u.localCheckpoint(eager=True)
    schema_set_type = dict(df.dtypes)[set_col]
    return spark.createDataFrame(
        picks,
        f"round int, {set_col} {schema_set_type}, "
        "new_covered long, total_covered long",
    )
