"""Frequent itemset mining (Apriori, Agrawal & Srikant VLDB'94) over
basket -> item relations — which entities/citations/hosts co-occur as a
SET, not just pairwise (graph/cooccur.py stops at PMI pairs): the
support base for association rules, co-mention canonicalization
evidence, and template detection (a 3-set of boilerplate entities on
thousands of hosts is a mirror-farm signal).

The relational lowering is the SON/Apriori shape every distributed
implementation uses:
  L1: one hash aggregate over distinct (basket, item);
  L2: baskets RESTRICTED to L1 items (left_semi — the anti-monotone
      prune), per-basket self-join with item_a < item_b, one aggregate;
  L3: per-basket frequent-pair occurrences extended by one L1 item with
      ALL THREE sub-pairs required frequent (the textbook candidate
      prune — each as a left_semi join) before the counting aggregate.

Scale shape: per-basket self-joins are quadratic in BASKET SIZE, not
corpus size — the L1/L2 semi-joins shrink baskets before any pairing,
and ``max_basket`` hard-caps pathological baskets (a page mentioning
10^4 entities is boilerplate, not signal — same policy as dedup's
max_df shingle cap). All joins are equi-joins on the basket key; counts
get map-side partial aggregation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["frequent_itemsets"]


def frequent_itemsets(
    df: DataFrame,
    min_support: int,
    basket_col: str = "basket",
    item_col: str = "item",
    max_size: int = 3,
    max_basket: int = 200,
) -> DataFrame:
    """(size, itemset, support): all itemsets of size 1..max_size (<= 3)
    appearing in >= min_support distinct baskets; itemset is the
    '|'-joined item list in ascending item order. Baskets larger than
    ``max_basket`` distinct frequent items are dropped whole (cap
    documented above)."""
    if not 1 <= max_size <= 3:
        raise ValueError("max_size must be 1, 2 or 3")
    b = (
        df.select(
            F.col(basket_col).alias("bid"), F.col(item_col).alias("i")
        )
        .distinct()
    )
    l1 = b.groupBy("i").agg(F.count(F.lit(1)).alias("support")).filter(
        F.col("support") >= min_support
    )
    out = l1.select(
        F.lit(1).alias("size"),
        F.col("i").alias("itemset"),
        "support",
    )
    if max_size == 1:
        return out

    bf = b.join(l1.select("i"), "i", "left_semi")
    ok = (
        bf.groupBy("bid")
        .agg(F.count(F.lit(1)).alias("_n"))
        .filter(F.col("_n") <= max_basket)
        .select("bid")
    )
    bf = bf.join(ok, "bid", "left_semi")

    p = (
        bf.select("bid", F.col("i").alias("i1"))
        .join(bf.select("bid", F.col("i").alias("i2")), "bid")
        .filter(F.col("i1") < F.col("i2"))
    )
    l2 = p.groupBy("i1", "i2").agg(F.count(F.lit(1)).alias("support")).filter(
        F.col("support") >= min_support
    )
    out = out.unionByName(
        l2.select(
            F.lit(2).alias("size"),
            F.concat_ws("|", "i1", "i2").alias("itemset"),
            "support",
        )
    )
    if max_size == 2:
        return out

    fp = p.join(l2.select("i1", "i2"), ["i1", "i2"], "left_semi")
    t = (
        fp.join(bf.select("bid", F.col("i").alias("i3")), "bid")
        .filter(F.col("i2") < F.col("i3"))
        # Apriori prune: (i1,i3) and (i2,i3) must also be frequent pairs
        .join(
            l2.select(F.col("i1"), F.col("i2").alias("i3")),
            ["i1", "i3"],
            "left_semi",
        )
        .join(
            l2.select(F.col("i1").alias("i2"), F.col("i2").alias("i3")),
            ["i2", "i3"],
            "left_semi",
        )
    )
    l3 = (
        t.groupBy("i1", "i2", "i3")
        .agg(F.count(F.lit(1)).alias("support"))
        .filter(F.col("support") >= min_support)
    )
    return out.unionByName(
        l3.select(
            F.lit(3).alias("size"),
            F.concat_ws("|", "i1", "i2", "i3").alias("itemset"),
            "support",
        )
    )
