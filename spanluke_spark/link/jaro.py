"""Jaro-Winkler similarity as a pure native-function Column expression —
the record-linkage verify metric (Winkler 1990, building on Jaro 1989)
beside the edit-distance lane (link/editdist.py): Levenshtein counts
edits, Jaro-Winkler rewards matched characters within a sliding window
and boosts shared prefixes, which is why it is the default comparator in
census/ER practice (Fellegi-Sunter pipelines score name fields with it;
link/fellegi.py consumes exactly such comparators).

Everything is JVM-side higher-order functions over the position arrays —
zero Python, zero UDFs, whole-stage codegen eligible:

- the Jaro match phase is the published greedy scan: for each position i
  of s1 (left to right), match the SMALLEST unmatched position j of s2
  inside the window |i-j| <= max(len1,len2)/2 - 1 with s2[j] == s1[i].
  One ``F.aggregate`` over ``sequence(0, len1-1)`` carries the matched-j
  list as the accumulator (insertion order = s1 order, so the
  transposition count falls out of comparing against its sorted self).
- transpositions t = floor(#mismatched positions / 2) — the integer
  halving every mainstream implementation uses (DuckDB, jellyfish,
  strsim; pinned by the published-vector pytest).
- Winkler boost: jw = j + 0.1 * L * (1 - j) with L = common prefix
  length capped at 4, applied only when j > 0.7 (the boost threshold of
  Winkler's original code) — behavior verified identical to DuckDB's
  independent built-in ``jaro_winkler_similarity`` on published vectors
  (MARTHA/MARHTA 0.961111, DIXON/DICKSONX 0.813333, DWAYNE/DUANE 0.84,
  JONES/JOHNSON 0.832381) and on the full fixture cross product.
- empty-string convention: either side empty -> 0.0 (DuckDB's choice;
  some libraries return 1.0 for two empties — documented deviation
  surface, pinned by a pytest).

The pair join blocks on the first ``block_prefix`` characters plus a
length band — the standard Jaro-Winkler blocking key (the metric itself
privileges prefixes; a high-similarity pair with different first
characters, e.g. CRATE/TRACE at 0.733, is BELOW every practical match
threshold, and the fixture pytest quantifies blocking recall against
the unblocked brute force). The blocked join is an equi-join on the
prefix key: at 10^9 names the shuffle key is content-driven (prefix),
never a cross join.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["jaro_similarity", "jaro_winkler_similarity", "jaro_winkler_pairs"]


def _matched_js(c1: Column, c2: Column, l1: Column, l2: Column) -> Column:
    """Greedy Jaro match scan -> array of matched s2 positions (0-based),
    in s1-scan order. c1/c2 are single-char arrays of s1/s2."""
    win = F.greatest(
        (F.floor(F.greatest(l1, l2) / 2) - 1).cast("int"), F.lit(0)
    )

    def step(acc: Column, i: Column) -> Column:
        lo = F.greatest(i - win, F.lit(0))
        hi = F.least(i + win, l2 - 1)
        cands = F.when(
            lo <= hi,
            F.filter(
                F.sequence(lo, hi),
                lambda j: (F.get(c2, j) == F.get(c1, i))
                & ~F.array_contains(acc, j),
            ),
        ).otherwise(F.array().cast("array<int>"))
        j0 = F.get(cands, 0)
        return F.when(j0.isNull(), acc).otherwise(
            F.concat(acc, F.array(j0))
        )

    return F.aggregate(
        F.sequence(F.lit(0), (l1 - 1).cast("int")),
        F.array().cast("array<int>"),
        step,
    )


def jaro_similarity(s1: Column, s2: Column) -> Column:
    """Jaro similarity (double in [0, 1]); either side empty -> 0.0."""
    c1, c2 = F.split(s1, ""), F.split(s2, "")
    l1 = F.length(s1).cast("int")
    l2 = F.length(s2).cast("int")
    js = _matched_js(c1, c2, l1, l2)
    m = F.size(js)
    # s1-order matched chars vs s2-order matched chars: s1[i] == s2[j]
    # for every matched pair, so both sequences read off c2 by j.
    mism = F.aggregate(
        F.zip_with(
            F.transform(js, lambda j: F.get(c2, j)),
            F.transform(F.array_sort(js), lambda j: F.get(c2, j)),
            lambda x, y: F.when(x == y, F.lit(0)).otherwise(F.lit(1)),
        ),
        F.lit(0),
        lambda a, x: a + x,
    )
    t = F.floor(mism / 2).cast("int")
    md = m.cast("double")
    jaro = (
        md / l1.cast("double")
        + md / l2.cast("double")
        + (md - t.cast("double")) / md
    ) / F.lit(3.0)
    return F.when((l1 == 0) | (l2 == 0) | (m == 0), F.lit(0.0)).otherwise(
        jaro
    )


def jaro_winkler_similarity(
    s1: Column,
    s2: Column,
    prefix_weight: float = 0.1,
    boost_threshold: float = 0.7,
    max_prefix: int = 4,
) -> Column:
    """Jaro-Winkler similarity (double in [0, 1]), standard parameters."""
    c1, c2 = F.split(s1, ""), F.split(s2, "")
    l1 = F.length(s1).cast("int")
    l2 = F.length(s2).cast("int")
    j = jaro_similarity(s1, s2)
    cap = F.least(F.lit(max_prefix), l1, l2)
    # prefix equality is monotone in k, so counting the k with equal
    # k-prefixes IS the (capped) common-prefix length.
    ell = F.when(
        cap >= 1,
        F.size(
            F.filter(
                F.sequence(F.lit(1), cap),
                lambda k: F.slice(c1, 1, k) == F.slice(c2, 1, k),
            )
        ),
    ).otherwise(F.lit(0))
    return F.when(
        j > F.lit(boost_threshold),
        j + F.lit(prefix_weight) * ell.cast("double") * (F.lit(1.0) - j),
    ).otherwise(j)


def jaro_winkler_pairs(
    names: DataFrame,
    threshold: float = 0.86,
    id_col: str = "id",
    name_col: str = "name",
    block_prefix: int = 1,
    len_band: int = 3,
) -> DataFrame:
    """(id, name) -> (id_a, id_b, name_a, name_b, jw_sim): unordered
    pairs with jaro_winkler >= threshold among candidates sharing the
    first ``block_prefix`` chars with |len difference| <= len_band (the
    standard JW blocking contract — see module docstring)."""
    n = names.select(
        F.col(id_col).alias("id"),
        F.col(name_col).alias("name"),
        F.substring(name_col, 1, block_prefix).alias("blk"),
        F.length(name_col).cast("int").alias("len"),
    )
    a = n.select(
        F.col("id").alias("id_a"),
        F.col("name").alias("name_a"),
        "blk",
        F.col("len").alias("len_a"),
    )
    b = n.select(
        F.col("id").alias("id_b"),
        F.col("name").alias("name_b"),
        "blk",
        F.col("len").alias("len_b"),
    )
    jw = jaro_winkler_similarity(F.col("name_a"), F.col("name_b"))
    return (
        a.join(b, "blk")
        .where(F.col("id_a") < F.col("id_b"))
        .where(
            F.abs(F.col("len_a") - F.col("len_b")) <= F.lit(len_band)
        )
        .withColumn("jw_sim", jw)
        .where(F.col("jw_sim") >= F.lit(threshold))
        .select("id_a", "id_b", "name_a", "name_b", "jw_sim")
    )
