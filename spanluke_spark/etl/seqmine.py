"""Frequent sequential patterns (Agrawal & Srikant, ICDE 1995; the
2/3-length core of GSP/PrefixSpan) over per-user event streams —
ORDER-sensitive co-occurrence: q213's itemsets say "these pages occur
together", sequences say "login THEN search THEN docket view", the
difference between a basket and a funnel hypothesis. Support counts
USERS containing the subsequence (not occurrences), the standard
sequence-mining semantics.

The subsequence test needs no positional self-join explosion —
occurrence STATISTICS suffice, exactly:
  <a, b>    in stream  iff  min_pos(a) < max_pos(b)   (a == b: needs
            two occurrences, the same inequality on one item's stats);
  <a, b, c> in stream  iff  some b-occurrence p satisfies
            min_pos(a) < p < max_pos(c)  — exact for ALL repeat
            patterns because positions are distinct.
So level 2 is a per-user join of the (user, item, min, max) stats
relation with itself, and level 3 joins each b-OCCURRENCE against the
a/c stats, Apriori-pruned by frequent pairs (left_semi, the q213
discipline) before any counting. All joins key on the user; supports
aggregate with map-side partials.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["frequent_sequences"]


def frequent_sequences(
    events: DataFrame,
    min_support: int,
    user_col: str = "user",
    ts_col: str = "ts",
    item_col: str = "item",
    max_len: int = 3,
) -> DataFrame:
    """(size, sequence, support): all '>'-joined sequential patterns of
    length 1..max_len (<= 3) contained in >= min_support user streams.
    Timestamps must be unique per user (pre-rank if not)."""
    if not 1 <= max_len <= 3:
        raise ValueError("max_len must be 1, 2 or 3")
    occ = events.select(
        F.col(user_col).alias("u"),
        F.col(item_col).alias("i"),
        F.col(ts_col).alias("p"),
    )
    stats = occ.groupBy("u", "i").agg(
        F.min("p").alias("minp"),
        F.max("p").alias("maxp"),
    )
    l1 = stats.groupBy("i").agg(F.count(F.lit(1)).alias("support")).filter(
        F.col("support") >= min_support
    )
    out = l1.select(
        F.lit(1).alias("size"), F.col("i").alias("sequence"), "support"
    )
    if max_len == 1:
        return out

    sf = stats.join(l1.select("i"), "i", "left_semi")
    pa = sf.select("u", F.col("i").alias("a"), F.col("minp").alias("ma"))
    pb = sf.select("u", F.col("i").alias("b"), F.col("maxp").alias("mb"))
    sup2 = (
        pa.join(pb, "u")
        .filter(F.col("ma") < F.col("mb"))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("support"))
    )
    l2 = sup2.filter(F.col("support") >= min_support)
    out = out.unionByName(
        l2.select(
            F.lit(2).alias("size"),
            F.concat_ws(">", "a", "b").alias("sequence"),
            "support",
        )
    )
    if max_len == 2:
        return out

    occ_f = occ.join(l1.select("i"), "i", "left_semi")
    tri = (
        occ_f.select("u", F.col("i").alias("b"), "p")
        .join(pa, "u")
        .filter(F.col("p") > F.col("ma"))
        .join(
            sf.select(
                "u", F.col("i").alias("c"), F.col("maxp").alias("mc")
            ),
            "u",
        )
        .filter(F.col("p") < F.col("mc"))
        # Apriori prune: <a,b> and <b,c> must themselves be frequent
        .join(l2.select("a", "b"), ["a", "b"], "left_semi")
        .join(
            l2.select(F.col("a").alias("b"), F.col("b").alias("c")),
            ["b", "c"],
            "left_semi",
        )
        .select("u", "a", "b", "c")
        .distinct()
    )
    l3 = tri.groupBy("a", "b", "c").agg(
        F.count(F.lit(1)).alias("support")
    ).filter(F.col("support") >= min_support)
    return out.unionByName(
        l3.select(
            F.lit(3).alias("size"),
            F.concat_ws(">", "a", "b", "c").alias("sequence"),
            "support",
        )
    )
