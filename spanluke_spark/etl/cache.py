"""LRU cache hit-ratio curves from exact reuse (stack) distances —
Mattson et al. 1970's one-pass-for-every-size result, re-expressed
relationally: size a per-host fetch/render cache by computing, for
EVERY candidate capacity at once, the exact hit ratio an LRU cache of
that capacity would have had on the access trace.

The imperative LRU stack disappears behind two window functions and
one range join:

  prev_b  = lag(pos)  over (host, key)   — previous access to b's key
  next_j  = lead(pos) over (host, key)   — next access to j's key
  sd(b)   = 1 + #{ j : prev_b < j < b, next_j >= b or NULL }

because an access j strictly inside (prev_b, b) contributes its key to
the LRU stack depth of b iff j is the LAST access to that key before b
(next_j lands at/after b) — each intervening distinct key is counted
exactly once, at its final pre-b occurrence. First touches of a key
(no prev) are cold misses with sd NULL.

LRU hits at capacity C are exactly the accesses with sd <= C (the
inclusion property of stack algorithms), so one histogram serves every
capacity: hits(C) = sum over the sd histogram, no per-C simulation.

Distributed shape: windows and the range join are all keyed by host —
the per-host trace is the unit of work, hosts are the parallel axis.
The (b, j) range join is bounded by per-key reuse gaps, not the trace
length squared, whenever keys recur (the only regime where a cache
matters); a pathological never-reusing host costs O(t^2) — band by
session/day first at crawl scale (documented contract).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["lru_hit_curve", "stack_distances"]


def stack_distances(
    accesses: DataFrame,
    host_col: str = "host",
    pos_col: str = "pos",
    key_col: str = "key",
) -> DataFrame:
    """(host, pos, key) -> (host, pos, key, sd) with sd NULL on cold
    (first-touch) misses; positions must be unique per host."""
    w = Window.partitionBy(host_col).orderBy(pos_col)
    wk = Window.partitionBy(host_col, key_col).orderBy(pos_col)
    acc = accesses.select(
        F.col(host_col).alias("host"),
        F.col(pos_col).alias("pos"),
        F.col(key_col).alias("key"),
        F.lag(pos_col).over(wk).alias("prev"),
        F.lead(pos_col).over(wk).alias("nxt"),
    )
    b = acc.select("host", "pos", "key", "prev").where(
        F.col("prev").isNotNull()
    )
    j = acc.select(
        F.col("host").alias("host_j"),
        F.col("pos").alias("pos_j"),
        F.col("nxt").alias("nxt_j"),
    )
    inner = (
        b.join(
            j,
            (F.col("host") == F.col("host_j"))
            & (F.col("pos_j") > F.col("prev"))
            & (F.col("pos_j") < F.col("pos"))
            & (F.col("nxt_j").isNull() | (F.col("nxt_j") >= F.col("pos"))),
        )
        .groupBy("host", "pos")
        .agg(F.count(F.lit(1)).alias("between"))
    )
    warm = b.join(inner, ["host", "pos"], "left").select(
        "host",
        "pos",
        "key",
        (F.coalesce(F.col("between"), F.lit(0)) + 1).cast("long").alias("sd"),
    )
    cold = acc.where(F.col("prev").isNull()).select(
        "host", "pos", "key", F.lit(None).cast("long").alias("sd")
    )
    return warm.unionByName(cold)


def lru_hit_curve(
    accesses: DataFrame,
    capacities: list[int],
    host_col: str = "host",
    pos_col: str = "pos",
    key_col: str = "key",
) -> DataFrame:
    """(host, pos, key) -> per (host, capacity): (host, c, hits, total,
    hit_ppm). Cold misses count in total, never in hits."""
    sd = stack_distances(accesses, host_col, pos_col, key_col)
    # histogram first: the curve costs O(distinct sd x |capacities|)
    # per host, not O(trace x |capacities|)
    hist = sd.groupBy("host", "sd").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    tot = hist.groupBy("host").agg(F.sum("n").cast("long").alias("total"))
    caps = F.explode(
        F.array(*[F.lit(int(c)) for c in sorted(capacities)])
    ).alias("c")
    frame = tot.select("host", "total", caps)
    hits = (
        frame.join(
            hist.where(F.col("sd").isNotNull()).select(
                F.col("host").alias("host_h"), "sd", "n"
            ),
            (F.col("host") == F.col("host_h"))
            & (F.col("sd") <= F.col("c")),
            "left",
        )
        .groupBy("host", "c", "total")
        .agg(F.coalesce(F.sum("n"), F.lit(0)).cast("long").alias("hits"))
    )
    return hits.select(
        "host",
        F.col("c").cast("long").alias("c"),
        "hits",
        "total",
        F.expr("hits * 1000000 div total").alias("hit_ppm"),
    )
