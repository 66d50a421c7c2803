"""KMV (k-minimum-values) distinct-count sketch — the mergeable cardinality
sketch (Bar-Yossef et al. 2002) built on the engine's deterministic hashes,
so unlike HLL implementations it is EXACTLY replayable in the SQL oracle.

Estimator: hash items uniformly into [0, M); keep the k smallest distinct
hash values per group; if fewer than k distinct items exist the sketch is
exact, else estimate = (k - 1) / (kth_min / M). Relational shape: one
distinct-agg + one windowed top-k per group — map-side combine does the
heavy lifting, the shuffle carries at most k rows per (task, group).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..dedup.dedup import portable_hash64

M60 = float(1 << 60)  # portable_hash64 range


def kmv_distinct(
    df: DataFrame,
    group_col: str,
    item: Column,
    k: int = 64,
) -> DataFrame:
    """-> (group_col, n_kept, kth_min, kmv_estimate): per-group distinct
    cardinality estimate. ``item`` is any expression; deterministic by
    construction (portable md5 hash, no RNG)."""
    hashed = (
        df.select(F.col(group_col).alias("g"), portable_hash64(item).alias("h"))
        .distinct()
    )
    w = Window.partitionBy("g").orderBy(F.asc("h"))
    topk = hashed.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") <= k)
    return (
        topk.groupBy(F.col("g").alias(group_col))
        .agg(
            F.count(F.lit(1)).alias("n_kept"),
            F.max("h").alias("kth_min"),
        )
        .withColumn(
            "kmv_estimate",
            F.round(
                F.when(F.col("n_kept") < k, F.col("n_kept").cast("double")).otherwise(
                    (k - 1) / (F.col("kth_min") / F.lit(M60))
                ),
                6,
            ),
        )
    )


def _hll_alpha(m: int) -> float:
    """Flajolet et al. 2007 bias constants (m = register count >= 16)."""
    if m == 16:
        return 0.673
    if m == 32:
        return 0.697
    if m == 64:
        return 0.709
    return 0.7213 / (1 + 1.079 / m)


def hll_distinct(
    df: DataFrame,
    group_col: str,
    item: Column,
    p: int = 6,
) -> DataFrame:
    """HyperLogLog distinct-count (Flajolet, Fusy, Gandouet & Meunier 2007)
    as a relation: -> (group_col, n_regs, hll_estimate).

    Register layout on the deterministic 60-bit ``portable_hash64``: the
    low ``p`` bits pick one of m = 2^p registers, the remaining 60-p bits
    supply rho = leading-zero count + 1. Per group the state is <= m
    (bucket, max rho) rows — a max agg, so map-side combine caps shuffle
    input at m rows per task per group regardless of item count, and
    sketches merge by re-aggregating the max (union two periods' register
    relations and re-agg). vs kmv_distinct: same O(1) state, but HLL's
    register relation is mergeable WITHOUT re-ranking (pure max), the form
    used for per-shard/per-day rollups.

    Exact-replay discipline: rho arithmetic is integer-only (bit lengths),
    and the indicator sum is carried as the EXACT integer
    sum(2^(55-rho))*... + absent-register mass, so the single float
    division at the end is order-independent — bit-identical in the
    DuckDB oracle, unlike engine-native approx_count_distinct whose HLL
    is implementation-specific. Small-range linear counting per the
    paper: E <= 2.5m with empty registers -> m*ln(m/V).
    """
    regs = hll_registers(df, group_col, item, p)
    return hll_estimate_from_registers(regs, group_col, p)


def hll_registers(
    df: DataFrame,
    group_col: str,
    item: Column,
    p: int = 6,
) -> DataFrame:
    """-> (group_col, bucket, mrho): the HLL register relation. A plain
    max aggregate, so this SAME function runs on a STREAMING DataFrame —
    Spark's streaming agg state is exactly the register table, merged by
    max across micro-batches (tests/test_streaming_hll.py proves
    stream == batch bit-for-bit). Sketches for different periods/shards
    union + re-agg through here too."""
    m = 1 << p
    width = 60 - p  # rho counts leading zeros in this many bits
    h = portable_hash64(item)
    w = F.shiftright(h, p)
    rho = F.when(w == 0, F.lit(width + 1)).otherwise(
        F.lit(width + 1) - F.length(F.bin(w))
    )
    return (
        df.select(
            F.col(group_col).alias(group_col),
            (h % m).alias("bucket"),
            rho.alias("rho"),
        )
        .groupBy(group_col, "bucket")
        .agg(F.max("rho").alias("mrho"))
    )


def hll_estimate_from_registers(
    regs: DataFrame, group_col: str, p: int = 6
) -> DataFrame:
    """Register relation -> (group_col, n_regs, hll_estimate)."""
    m = 1 << p
    width = 60 - p
    agg = regs.groupBy(F.col(group_col)).agg(
        F.count(F.lit(1)).alias("n_regs"),
        F.sum(
            F.expr(f"shiftleft(CAST(1 AS BIGINT), {width + 1} - mrho)")
        ).alias("_sum_int"),
    )
    scale = float(1 << (width + 1))
    alpha_mm = _hll_alpha(m) * m * m
    total = F.col("_sum_int") + (m - F.col("n_regs")) * F.lit(1 << (width + 1)).cast(
        "long"
    )
    raw = F.lit(alpha_mm) * F.lit(scale) / total
    est = F.when(
        (raw <= 2.5 * m) & (F.col("n_regs") < m),
        F.lit(float(m)) * F.log(F.lit(float(m)) / (m - F.col("n_regs"))),
    ).otherwise(raw)
    return agg.select(group_col, "n_regs", F.round(est, 6).alias("hll_estimate"))


def _cms_cell(item: Column, i: int, w: int) -> Column:
    """Row-i count-min column for ``item``: portable md5-derived hash mod w
    (salted with the row index) — identical in Spark and the SQL oracle."""
    return portable_hash64(F.concat(F.lit(f"{i}:"), item)) % w


def cms_build(df: DataFrame, item: Column, d: int = 3, w: int = 256) -> DataFrame:
    """Count-min sketch (Cormode & Muthukrishnan 2005) as a relation:
    -> (hrow, col, cnt), at most d*w rows.

    The scale story: frequency estimation over an UNBOUNDED key space with
    FIXED shuffle width — the groupBy key is the (hrow, col) cell, so
    map-side combine collapses every task to <= d*w partial rows no matter
    how many distinct items flow through (vs an exact groupBy whose shuffle
    is O(distinct items)). Sketches merge by cell-wise addition, so
    per-day/per-shard sketches union + re-agg. Estimates only ever
    OVER-count (by <= 2N/w with probability 1 - (1/2)^d).
    """
    it = df.select(item.alias("item"))
    cells = it.select(
        F.posexplode(
            F.array(*[_cms_cell(F.col("item"), i, w) for i in range(d)])
        ).alias("hrow", "col")
    )
    return cells.groupBy("hrow", "col").agg(F.count("*").alias("cnt"))


def cms_estimate(
    sketch: DataFrame, probes: DataFrame, d: int = 3, w: int = 256
) -> DataFrame:
    """Point-query the sketch: -> (item, est) = min over the d cells.

    ``probes`` is (item); d and w must match the build. The sketch is at
    most d*w rows, so the join side is broadcast-sized by construction;
    an empty cell reads as 0.
    """
    pc = probes.select(
        "item",
        F.posexplode(
            F.array(*[_cms_cell(F.col("item"), i, w) for i in range(d)])
        ).alias("hrow", "col"),
    )
    return (
        pc.join(F.broadcast(sketch), ["hrow", "col"], "left")
        .groupBy("item")
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("est"))
    )


def kmv_setops(
    df: DataFrame,
    group_col: str,
    item: Column,
    k: int = 32,
) -> DataFrame:
    """KMV set operations (Beyer, Haas, Reinwald, Sismanis & Gemulla,
    SIGMOD 2007): pairwise union / intersection / Jaccard estimates for
    every group pair, from per-group k-min sketches ONLY — the sketches
    are the sole shuffle payload (k rows per group), never the corpora,
    which is why two 10^11-distinct-item corpora can be compared on a
    driver-sized join.

    Per pair (ga < gb): K = the k smallest distinct hashes of the sketch
    union, theta = max(K); c = |{h in K present in BOTH sketches}|.
      union_est   = (k-1) / (theta / M)      (exact |K| when |K| < k)
      jaccard     = c / |K|   (emitted exactly as jacc_ppm = c*10^6 div |K|)
      inter_est   = round(c * union_est / |K|, 6)
    Deterministic by construction (portable md5 hash) so the whole chain
    replays bit-identically in the SQL oracle, exact-regime branch
    included.
    """
    hashed = (
        df.select(
            F.col(group_col).alias("g"), portable_hash64(item).alias("h")
        )
        .distinct()
    )
    w = Window.partitionBy("g").orderBy(F.asc("h"))
    sk = (
        hashed.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .select("g", "h")
    )
    groups = sk.select("g").distinct()
    pairs = (
        groups.select(F.col("g").alias("ga"))
        .join(groups.select(F.col("g").alias("gb")))
        .where(F.col("ga") < F.col("gb"))
    )
    au = sk.join(pairs, sk["g"] == pairs["ga"]).select(
        "ga", "gb", "h", F.lit(1).alias("in_a")
    )
    bu = sk.join(pairs, sk["g"] == pairs["gb"]).select(
        "ga", "gb", "h", F.lit(1).alias("in_b")
    )
    u = (
        au.join(bu, ["ga", "gb", "h"], "full_outer")
        .select(
            "ga",
            "gb",
            "h",
            F.coalesce(F.col("in_a"), F.lit(0)).alias("in_a"),
            F.coalesce(F.col("in_b"), F.lit(0)).alias("in_b"),
        )
    )
    wu = Window.partitionBy("ga", "gb").orderBy(F.asc("h"))
    topu = u.withColumn("_rn", F.row_number().over(wu)).filter(
        F.col("_rn") <= k
    )
    agg = topu.groupBy("ga", "gb").agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.max("h").alias("theta"),
        F.sum(F.col("in_a") * F.col("in_b")).cast("long").alias("inter_kept"),
    )
    union_est = F.round(
        F.when(F.col("n_kept") < k, F.col("n_kept").cast("double")).otherwise(
            (k - 1) / (F.col("theta") / F.lit(M60))
        ),
        6,
    )
    out = agg.withColumn("union_est", union_est).withColumn(
        "jacc_ppm", F.expr("inter_kept * 1000000 div n_kept")
    )
    return out.withColumn(
        "inter_est",
        F.round(
            F.col("inter_kept") * F.col("union_est") / F.col("n_kept"), 6
        ),
    )
