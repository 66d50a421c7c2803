"""Edit-distance near-match join — the fuzzy-string verify lane of entity
canonicalization (complements canon/canonicalize.py's normalization-key
blocking): find every pair of names within Levenshtein distance d without
the all-pairs cross join.

Candidate generation is Pass-Join segment signatures (Li, Deng & Feng
2011, "PASS-JOIN: A Partition-based Method for Similarity Joins"):
partition every string into d+1 segments — by pigeonhole, two strings
within distance d must agree on at least one segment, and that segment
can only sit within ±d of its home position in the partner. So the index
side emits its d+1 segments keyed (len, segment_idx, text); the probe
side emits, for each partner length in [len-d, len+d] and each segment
slot, the (2d+1) position-shifted substrings of the partner segment
length — a CONSTANT fan-out of at most (d+1)(2d+1)² keys per string
(75 for d=2). The join key carries the segment TEXT, so selectivity is
content-driven (unlike a bare length-band join, whose key cardinality is
the handful of distinct lengths — a skew bomb at 10^9 names).
Verification is the exact JVM levenshtein — no Python anywhere.

Strings shorter than d+1 characters cannot be partitioned into d+1
non-empty segments; they are routed through a direct length-band join —
at crawl scale that lane is the handful of 1-2-char names, negligible.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["levenshtein_pairs", "symspell_correct"]


def _seg_pos(i: Column, length: Column, d: int) -> Column:
    """0-based start of segment i when a string of ``length`` is split
    into d+1 segments (first ``length mod (d+1)`` segments one longer)."""
    base = F.floor(length / (d + 1))
    rem = length % (d + 1)
    return (i * base + F.least(i, rem)).cast("int")


def _seg_len(i: Column, length: Column, d: int) -> Column:
    base = F.floor(length / (d + 1))
    rem = length % (d + 1)
    return (base + (i < rem).cast("int")).cast("int")


def levenshtein_pairs(
    names: DataFrame,
    d: int = 2,
    id_col: str = "id",
    name_col: str = "name",
) -> DataFrame:
    """(id, name) -> (id_a, id_b, name_a, name_b, dist): every unordered
    pair with Levenshtein distance <= d. Pass-Join segment candidates
    (lossless by pigeonhole), exact verification."""
    n = names.select(
        F.col(id_col).alias("id"),
        F.col(name_col).alias("name"),
        F.length(name_col).cast("int").alias("len"),
    )
    long_n = n.where(F.col("len") >= d + 1)
    short_n = n.where(F.col("len") < d + 1)

    i_col = F.explode(F.sequence(F.lit(0), F.lit(d))).alias("i")
    index = long_n.select("id", "name", "len", i_col).select(
        F.col("id").alias("id_i"),
        F.col("name").alias("name_i"),
        F.col("len").alias("len_i"),
        "i",
        F.substring(
            F.col("name"), _seg_pos(F.col("i"), F.col("len"), d) + 1,
            _seg_len(F.col("i"), F.col("len"), d),
        ).alias("seg"),
    )

    probe = (
        long_n.select("id", "name", "len", i_col)
        .select(
            "id", "name", "len", "i",
            F.explode(
                F.sequence(F.greatest(F.col("len") - d, F.lit(d + 1)), F.col("len") + d)
            ).alias("plen"),
        )
        .select(
            "id", "name", "len", "i", "plen",
            F.explode(F.sequence(F.lit(-d), F.lit(d))).alias("shift"),
        )
        .select(
            F.col("id").alias("id_p"),
            F.col("name").alias("name_p"),
            F.col("len").alias("len_p"),
            "i",
            F.col("plen"),
            (_seg_pos(F.col("i"), F.col("plen"), d) + F.col("shift")).alias("start"),
            _seg_len(F.col("i"), F.col("plen"), d).alias("slen"),
        )
        .where(
            (F.col("start") >= 0)
            & (F.col("start") + F.col("slen") <= F.col("len_p"))
            & (F.col("slen") > 0)
        )
        .select(
            "id_p", "name_p", "len_p", "i", "plen",
            F.substring(F.col("name_p"), F.col("start") + 1, F.col("slen")).alias(
                "seg"
            ),
        )
    )

    seg_cands = (
        index.join(
            probe,
            (index.i == probe.i)
            & (index.seg == probe.seg)
            & (index.len_i == probe.plen),
        )
        .where(F.col("id_i") != F.col("id_p"))
        .select(
            F.least("id_i", "id_p").alias("id_a"),
            F.greatest("id_i", "id_p").alias("id_b"),
            F.when(F.col("id_i") < F.col("id_p"), F.col("name_i"))
            .otherwise(F.col("name_p"))
            .alias("name_a"),
            F.when(F.col("id_i") < F.col("id_p"), F.col("name_p"))
            .otherwise(F.col("name_i"))
            .alias("name_b"),
        )
        .distinct()
    )

    # short-string lane: strings that cannot host d+1 segments join any
    # name within the length band directly (tiny by construction)
    short_cands = (
        short_n.select(
            F.col("id").alias("id_s"),
            F.col("name").alias("name_s"),
            F.explode(
                F.sequence(F.greatest(F.col("len") - d, F.lit(0)), F.col("len") + d)
            ).alias("len"),
        )
        .join(n.select("id", "name", "len"), "len")
        .where(F.col("id_s") != F.col("id"))
        .select(
            F.least("id_s", "id").alias("id_a"),
            F.greatest("id_s", "id").alias("id_b"),
            F.when(F.col("id_s") < F.col("id"), F.col("name_s"))
            .otherwise(F.col("name"))
            .alias("name_a"),
            F.when(F.col("id_s") < F.col("id"), F.col("name"))
            .otherwise(F.col("name_s"))
            .alias("name_b"),
        )
        .distinct()
    )

    cands = seg_cands.unionByName(short_cands).distinct()
    dist = F.levenshtein(F.col("name_a"), F.col("name_b"))
    return (
        cands.withColumn("dist", dist)
        .where(F.col("dist") <= d)
        .select("id_a", "id_b", "name_a", "name_b", "dist")
    )


def _delete1_keys(col: Column) -> Column:
    """Array of the string itself plus every single-character deletion,
    de-duplicated ("aa" deletes to one "a") — the SymSpell key set."""
    deletes = F.transform(
        F.sequence(F.lit(1), F.length(col)),
        lambda i: F.concat(
            F.substring(col, 1, i - 1),
            col.substr(i + 1, F.length(col)),
        ),
    )
    return F.array_distinct(F.concat(F.array(col), deletes))


def symspell_correct(
    dictionary: DataFrame,
    queries: DataFrame,
    term_col: str = "term",
    freq_col: str = "freq",
    query_col: str = "query",
    max_len: int = 24,
) -> DataFrame:
    """SymSpell (Garbe) delete-neighborhood correction — the ASYMMETRIC
    sibling of levenshtein_pairs: map each noisy query token to its best
    dictionary term within Levenshtein distance 1, the
    typo-canonicalization step for entity gazetteers / host whitelists.

    Two strings within distance 1 always share a delete-1 key (the
    shorter string is itself a delete of the longer, or both delete the
    differing position), so the equi-join on delete keys is LOSSLESS for
    d=1; colliding keys can reach distance 2, so candidates are verified
    with the exact JVM levenshtein. Fan-out is len+1 keys per string
    (bounded by ``max_len``; longer strings are dropped — at crawl scale
    those are URLs/hashes, not vocabulary), the join key is content-
    driven (no length-band skew), and the winner per query is one
    row_number window over (dist ASC, freq DESC, term ASC).

    -> (query, term, dist, freq): at most one row per query token that
    has a candidate; queries already in the dictionary correct to
    themselves at dist 0.
    """
    d_keys = (
        dictionary.select(
            F.col(term_col).alias("term"), F.col(freq_col).alias("freq")
        )
        .where(F.length("term") <= max_len)
        .select("term", "freq", F.explode(_delete1_keys(F.col("term"))).alias("k"))
    )
    q_keys = (
        queries.select(F.col(query_col).alias("query"))
        .distinct()
        .where(F.length("query") <= max_len)
        .select("query", F.explode(_delete1_keys(F.col("query"))).alias("k"))
    )
    cands = (
        q_keys.join(d_keys, "k")
        .select("query", "term", "freq")
        .distinct()
        .withColumn("dist", F.levenshtein(F.col("query"), F.col("term")))
        .where(F.col("dist") <= 1)
    )
    w = Window.partitionBy("query").orderBy(
        F.asc("dist"), F.desc("freq"), F.asc("term")
    )
    return (
        cands.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .select("query", "term", "dist", "freq")
    )
