"""Deduplication family for web-scale training-data pipelines:

- exact_dedup:        hash-groupBy on normalized content (partial+final agg)
- ngram_jaccard_pairs: word-shingle blocking self-join + exact Jaccard
- minhash_lsh_pairs:  MinHash signatures (xxhash64 family) + banded LSH join
- simhash:            64-bit sign-aggregated token-hash fingerprint
- embedding_neardup:  cosine-threshold pairs over an embedding column

Everything is DataFrame-native: hashes via xxhash64 (JVM), shingles via
split/transform (codegen) — no Python in any hot path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

def normalize_text(col: Column) -> Column:
    return F.regexp_replace(F.lower(F.trim(col)), r"\s+", " ")


def exact_dedup(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Exact duplicates by normalized content: (canonical_id, n_dups, members).
    One partial+final hash aggregate; canonical = min id (deterministic)."""
    return (
        df.groupBy(normalize_text(F.col(text_col)).alias("_norm"))
        .agg(
            F.min(id_col).alias("canonical_id"),
            F.count(F.lit(1)).alias("n_copies"),
            F.sort_array(F.collect_list(id_col)).alias("members"),
        )
        .drop("_norm")
    )


def word_shingles(text: Column, n: int = 3) -> Column:
    """Distinct word n-gram shingles, pure codegen:
    split -> transform(sequence) -> concat_ws -> array_distinct."""
    toks = F.split(F.trim(text), r"\s+")
    k = F.size(toks)
    idx = F.sequence(F.lit(0), F.greatest(k - n, F.lit(0)))
    sh = F.transform(
        idx, lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n))
    )
    return F.when(k >= n, F.array_distinct(sh)).otherwise(F.array())


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.8,
) -> DataFrame:
    """Near-duplicate pairs by exact n-gram Jaccard, blocked on shared
    shingles (pairs with zero common shingles never shuffle)."""
    base = df.select(
        F.col(id_col).alias("id"), word_shingles(F.col(text_col), n).alias("sh")
    ).withColumn("sh_count", F.size("sh"))
    ex = base.select("id", "sh_count", F.explode("sh").alias("shingle"))
    a = ex.select(F.col("id").alias("id_a"), F.col("sh_count").alias("cnt_a"), "shingle")
    b = ex.select(F.col("id").alias("id_b"), F.col("sh_count").alias("cnt_b"), "shingle")
    inter = (
        a.join(b, "shingle")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b", "cnt_a", "cnt_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    jac = inter.withColumn(
        "jaccard",
        F.col("n_common").cast("double")
        / (F.col("cnt_a") + F.col("cnt_b") - F.col("n_common")),
    )
    return jac.filter(F.col("jaccard") >= threshold).select(
        "id_a", "id_b", "n_common", "jaccard"
    )


def minhash_signature(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num_hashes: int = 32,
) -> DataFrame:
    """MinHash signature per doc: h_i(s) = (a_i * xxhash64(s) + b_i) mod M61,
    min per hash family — all in one exploded aggregate (partial+final min).
    (a_i, b_i) derive from a fixed seed via xxhash64 of literals: deterministic
    on every worker, no RNG state."""
    sh = df.select(
        F.col(id_col).alias("id"), F.explode(word_shingles(F.col(text_col), n)).alias("shingle")
    )
    # 31-bit universal hashing: (a*h + b) mod p with h,a,b < 2^31 keeps every
    # intermediate below 2^62 — no ANSI long overflow, still JVM codegen.
    P31 = 2147483647  # Mersenne prime 2^31 - 1
    base_h = F.pmod(F.xxhash64("shingle"), F.lit(P31))
    aggs = []
    for i in range(num_hashes):
        a = ((i * 2 + 1) * 0x9E3779B9) % P31 or 1
        b = (i * 0xC2B2AE3D + 0x165667B1) % P31
        aggs.append(
            F.min(F.pmod(base_h * F.lit(a) + F.lit(b), F.lit(P31))).alias(f"mh_{i}")
        )
    return sh.groupBy("id").agg(*aggs)


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num_hashes: int = 32,
    bands: int = 8,
    verify_threshold: float | None = 0.7,
) -> DataFrame:
    """MinHash + banded LSH near-dup candidates; optional exact-Jaccard verify.

    Docs agreeing on ALL rows of any band become candidates (equi-join on
    (band, xxhash64(band rows))) — candidate volume ~ collisions, not |D|^2.
    """
    sig = minhash_signature(df, id_col, text_col, n, num_hashes)
    rows_per_band = num_hashes // bands
    band_cols = [
        F.xxhash64(*[F.col(f"mh_{b * rows_per_band + r}") for r in range(rows_per_band)]).alias(
            f"band_{b}"
        )
        for b in range(bands)
    ]
    banded = sig.select("id", *band_cols)
    stacked = banded.select(
        "id",
        F.posexplode(F.array(*[F.col(f"band_{b}") for b in range(bands)])).alias(
            "band", "bucket"
        ),
    )
    a = stacked.select(F.col("id").alias("id_a"), "band", "bucket")
    b = stacked.select(F.col("id").alias("id_b"), "band", "bucket")
    cand = (
        a.join(b, ["band", "bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    if verify_threshold is None:
        return cand
    # exact verify: join back shingle sets for candidates only
    sh = df.select(
        F.col(id_col).alias("id"), word_shingles(F.col(text_col), n).alias("sh")
    )
    verified = (
        cand.join(sh.select(F.col("id").alias("id_a"), F.col("sh").alias("sh_a")), "id_a")
        .join(sh.select(F.col("id").alias("id_b"), F.col("sh").alias("sh_b")), "id_b")
        .withColumn(
            "jaccard",
            F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
            / F.size(F.array_union("sh_a", "sh_b")),
        )
        .filter(F.col("jaccard") >= verify_threshold)
        .select("id_a", "id_b", "jaccard")
    )
    return verified


def simhash(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """64-bit SimHash over whitespace tokens: per bit, sign of the sum of
    (+1/-1) votes from each token's xxhash64 — expressed as 64 conditional
    sums in ONE aggregate (no Python, no explode-per-bit)."""
    toks = df.select(
        F.col(id_col).alias("id"), F.explode(F.split(F.trim(text_col), r"\s+")).alias("tok")
    ).withColumn("h", F.xxhash64("tok"))
    # bit test via unsigned shift — a literal 1<<63 would overflow signed long
    bit_aggs = [
        F.sum(
            F.when(F.shiftrightunsigned(F.col("h"), i).bitwiseAND(F.lit(1)) != 0, 1).otherwise(-1)
        ).alias(f"b{i}")
        for i in range(64)
    ]
    votes = toks.groupBy("id").agg(*bit_aggs)
    sim = F.lit(0).cast("long")
    for i in range(63):  # top bit left 0 to stay in signed range
        sim = sim + F.when(F.col(f"b{i}") > 0, F.lit(1 << i)).otherwise(F.lit(0))
    return votes.select("id", sim.alias("simhash"))


def hamming64(a: Column, b: Column) -> Column:
    return F.bit_count(a.bitwiseXOR(b))


def embedding_neardup_pairs(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
) -> DataFrame:
    """Cosine-threshold near-dup pairs over an embedding column (brute-force
    with broadcast; swap in link.ann.lsh_topk for the billion-row path)."""
    norm = F.sqrt(F.aggregate(vec_col, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x))
    base = emb.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"), norm.alias("n"))
    a = base.select(F.col("id").alias("id_a"), F.col("v").alias("va"), F.col("n").alias("na"))
    b = base.select(F.col("id").alias("id_b"), F.col("v").alias("vb"), F.col("n").alias("nb"))
    dot = F.aggregate(
        F.zip_with("va", "vb", lambda x, y: x.cast("double") * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return (
        a.crossJoin(F.broadcast(b))
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn(
            "cos_sim",
            F.when((F.col("na") > 0) & (F.col("nb") > 0), dot / (F.col("na") * F.col("nb"))).otherwise(
                F.lit(0.0)
            ),
        )
        .filter(F.col("cos_sim") >= threshold)
        .select("id_a", "id_b", "cos_sim")
    )
