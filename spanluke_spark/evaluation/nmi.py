"""Normalized mutual information between two clusterings (Strehl &
Ghosh 2002, arithmetic-mean normalization — chosen over the sqrt form
so the whole score stays in exact integer arithmetic) — the
information-theoretic companion to ARI (q311) and B-cubed (q274) for
comparing a dedup/canonicalization partition against a gold one.

With contingency cells nij, marginals ai, bj, total n, all ln ratios
are quantized ONCE to round(ln * 10^6) per cell (the repo's ln-ppm
discipline, q307/q324), after which everything is exact integers in
units of n * 10^6 nats:

  mi_num = sum_ij nij * lnppm(nij * n, ai * bj)      (cells nij > 0)
  ha_num = sum_i  ai  * lnppm(n, ai)
  hb_num = sum_j  bj  * lnppm(n, bj)
  nmi_ppm = sign-split trunc (2 * mi_num * 10^6) div (ha_num + hb_num)

Identical clusterings give mi_num == ha_num == hb_num exactly (the
cell ratio IS the marginal ratio), so nmi_ppm == 10^6 with no float
luck; exact-independence grids give every cell lnppm = 0. Two
constant clusterings (ha + hb = 0) surface NULL. Overflow:
|mi_num| <= n * ln(n) * 10^6, safe past 10^5 items.

Distributed shape: one (a, b) groupBy for cells, two label-sized
marginal aggregates broadcast back onto the cells, ONE final
aggregate — no window, no pivot; corpus-linear.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["nmi"]


def _lnppm(num: Column, den: Column) -> Column:
    return F.round(F.log(num / den) * 1_000_000).cast("long")


def nmi(
    items: DataFrame, a_col: str = "a", b_col: str = "b"
) -> DataFrame:
    """(a, b) cluster labels, one row per item -> ONE row
    (n, n_cells, mi_num, ha_num, hb_num, nmi_ppm)."""
    t = items.select(F.col(a_col).alias("a"), F.col(b_col).alias("b"))
    cells = t.groupBy("a", "b").agg(
        F.count(F.lit(1)).cast("long").alias("nij")
    )
    am = cells.groupBy("a").agg(F.sum("nij").alias("ai"))
    bm = cells.groupBy("b").agg(F.sum("nij").alias("bj"))
    tot = cells.groupBy().agg(F.sum("nij").alias("n"))

    x = (
        cells.join(F.broadcast(am), "a")
        .join(F.broadcast(bm), "b")
        .crossJoin(F.broadcast(tot))
    )
    mi = x.groupBy().agg(
        F.max("n").alias("n"),
        F.count(F.lit(1)).cast("long").alias("n_cells"),
        F.sum(
            F.col("nij")
            * _lnppm(F.col("nij") * F.col("n"), F.col("ai") * F.col("bj"))
        ).alias("mi_num"),
    )
    ha = am.crossJoin(F.broadcast(tot)).groupBy().agg(
        F.sum(F.col("ai") * _lnppm(F.col("n"), F.col("ai"))).alias("ha_num")
    )
    hb = bm.crossJoin(F.broadcast(tot)).groupBy().agg(
        F.sum(F.col("bj") * _lnppm(F.col("n"), F.col("bj"))).alias("hb_num")
    )
    out = mi.crossJoin(F.broadcast(ha)).crossJoin(F.broadcast(hb))
    hsum = F.col("ha_num") + F.col("hb_num")
    mag = F.expr("abs(2 * mi_num * 1000000) div (ha_num + hb_num)")
    return out.select(
        "n",
        "n_cells",
        "mi_num",
        "ha_num",
        "hb_num",
        F.when(
            hsum > 0,
            F.when(F.col("mi_num") < 0, -mag).otherwise(mag),
        ).alias("nmi_ppm"),
    )
