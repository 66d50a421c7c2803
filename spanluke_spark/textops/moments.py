"""Second frequency moment (F2) — exact and AMS-sketched. F2 =
sum_x f_x^2 over the token/key frequency vector is THE skew number: it
is the exact self-join size, the quantity a join-size estimator needs,
and the "repeat mass" that predicts shuffle hot keys (textops/
profile.py reads the head of the distribution; F2 summarizes the whole
tail in one value).

The sketch is Alon-Matias-Szegedy's tug-of-war estimator (AMS 1996,
Gödel-prize lineage; also the diagonal of Count-Sketch, Charikar,
Chen & Farach-Colton 2002): draw d ±1 hash sign functions s_r, keep
Z_r = sum_x s_r(x) * f_x, and E[Z_r^2] = F2. Each Z_r is LINEAR in the
stream — sum over occurrences of s_r(token), one map-side-combinable
aggregate, no per-key state, mergeable across partitions/streams by
plain addition (the property CMS/HLL/KMV share; this completes the
classic sketch quartet). The estimate is the exact-integer median of
the d squared counters.

Determinism contract: signs come from the portable md5-derived 60-bit
hash (dedup/dedup.py convention — DuckDB twin
('0x' || substr(md5(s), 1, 15))::BIGINT), salted with the estimator
index, so the whole sketch — every Z_r, every square, the median — is
bit-identical across engines and replayable in SQL. |Z_r| is bounded
by the occurrence count N, so Z_r^2 fits a long for N < 3e9; the
exact-F2 twin is the ground truth the sketch's relative error is
gated against in tests.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from spanluke_spark.dedup.dedup import portable_hash64

__all__ = ["exact_f2", "ams_f2"]


def exact_f2(occurrences: DataFrame, key_col: str = "item") -> DataFrame:
    """One row (n_occurrences, n_distinct, f2_exact): the exact second
    moment via one groupBy — f2_exact is also the exact size of the
    key self-join."""
    counts = occurrences.groupBy(F.col(key_col).alias("k")).agg(
        F.count(F.lit(1)).alias("c")
    )
    return counts.agg(
        F.sum("c").alias("n_occurrences"),
        F.count(F.lit(1)).alias("n_distinct"),
        F.sum(F.col("c") * F.col("c")).alias("f2_exact"),
    )


def _sign(key: Column, r: int) -> Column:
    """±1 sign of estimator r for a key — low bit of the portable
    salted hash."""
    h = portable_hash64(F.concat(key.cast("string"), F.lit(f"|ams{r}")))
    return (h % 2) * 2 - 1


def ams_f2(
    occurrences: DataFrame, key_col: str = "item", d: int = 9
) -> DataFrame:
    """d rows (r, z, est) + broadcast exact/median columns: tug-of-war
    counters Z_r = sum of signs over OCCURRENCES (linear — never
    materializes per-key counts), est_r = Z_r^2, est_median = exact
    integer median of the d estimates (d odd), gated against f2_exact.

    One wide aggregate computes all d counters in a single pass; the
    d-row pivot, the median and the exact twin are O(d) driver-scale
    broadcast joins."""
    if d % 2 == 0:
        raise ValueError("d must be odd so the median is a data value")
    key = F.col(key_col)
    wide = occurrences.agg(
        *[F.sum(_sign(key, r)).cast("long").alias(f"z{r}") for r in range(d)]
    )
    rows = wide.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).alias("r"),
                        F.col(f"z{r}").alias("z"),
                        (F.col(f"z{r}") * F.col(f"z{r}")).alias("est"),
                    )
                    for r in range(d)
                ]
            )
        ).alias("s")
    ).select("s.r", "s.z", "s.est")
    med = rows.agg(
        F.element_at(
            F.sort_array(F.collect_list("est")), (d + 1) // 2
        ).alias("est_median")
    )
    exact = exact_f2(occurrences, key_col)
    return (
        rows.crossJoin(F.broadcast(med))
        .crossJoin(F.broadcast(exact))
        .orderBy("r")
    )
