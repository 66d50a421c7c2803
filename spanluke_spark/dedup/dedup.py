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


# ---------------------------------------------------------------------------
# Hash plumbing: xxhash64 (fast JVM default) vs a portable md5-derived hash
# whose DuckDB twin is ('0x' || substr(md5(s),1,15))::BIGINT — bit-identical
# across engines (60-bit, non-negative), enabling exact SQL oracles for the
# MinHash/SimHash family.
# ---------------------------------------------------------------------------

P31 = 2147483647  # Mersenne prime 2^31 - 1
BUCKET_BASE = 1_000_003  # polynomial band combiner (portable mode)


def portable_hash64(col: Column) -> Column:
    """60-bit deterministic hash computable identically in Spark and DuckDB."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def universal_hash_constants(num_hashes: int) -> list[tuple[int, int]]:
    """(a_i, b_i) for the 31-bit universal family h_i(x) = (a_i*x + b_i) mod
    P31 — derived from fixed multiplicative constants, identical everywhere
    (shared by the Spark plan and the generated oracle SQL)."""
    out = []
    for i in range(num_hashes):
        a = ((i * 2 + 1) * 0x9E3779B9) % P31 or 1
        b = (i * 0xC2B2AE3D + 0x165667B1) % P31
        out.append((a, b))
    return out


def exact_dedup(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    by_hash: bool = False,
    max_members: int | None = 100,
) -> DataFrame:
    """Exact duplicates by normalized content: (canonical_id, n_copies,
    members). Canonical = min id (deterministic).

    ``by_hash=True`` groups on (length, xxhash64) of the normalized text
    instead of the text itself — the 100 TB mode: the shuffle carries 16
    bytes per row instead of the whole corpus. A cross-document collision
    needs identical 64-bit hash AND identical length (~n^2/2^64 at equal
    length); acceptable for dedup, use the default for adjudication.

    ``max_members`` bounds ``members`` to the smallest-id ``max_members``
    copies (``n_copies`` always carries the true count). This is a MEMORY
    bound, not just an output truncation: one boilerplate key with 10^6+
    copies would otherwise build the whole array in a single aggregation
    buffer / result row — executor OOM on exactly the input that needs
    dedup most. The cap is enforced with a window-rank BEFORE the collect,
    so the per-group buffer never exceeds ``max_members`` ids (the sort
    underneath the window spills to disk; an array-slice after collect_list
    would still buffer every copy). ``max_members=None`` restores the
    single partial+final hash aggregate with unbounded members — cheapest
    plan (map-side combine collapses copies pre-shuffle), safe when no key
    is pathologically hot."""
    key = normalize_text(F.col(text_col))
    if by_hash:
        key_cols = [F.length(key).alias("_len"), F.xxhash64(key).alias("_h")]
    else:
        key_cols = [key.alias("_norm")]
    proj = df.select(*key_cols, F.col(id_col))
    key_names = [c for c in proj.columns if c != id_col]
    if max_members is None:
        grouped = proj.groupBy(*key_names).agg(
            F.min(id_col).alias("canonical_id"),
            F.count(F.lit(1)).alias("n_copies"),
            F.sort_array(F.collect_list(id_col)).alias("members"),
        )
    else:
        from pyspark.sql import Window

        w = Window.partitionBy(*key_names).orderBy(id_col)
        # collect_list skips NULLs, so ranks past the cap never enter the
        # buffer; the groupBy reuses the window's hash partitioning (one
        # exchange total — verified by plan audit)
        grouped = (
            proj.withColumn("_rn", F.row_number().over(w))
            .groupBy(*key_names)
            .agg(
                F.min(id_col).alias("canonical_id"),
                F.count(F.lit(1)).alias("n_copies"),
                F.sort_array(
                    F.collect_list(F.when(F.col("_rn") <= max_members, F.col(id_col)))
                ).alias("members"),
            )
        )
    return grouped.drop("_norm", "_len", "_h")


def word_shingles(text: Column, n: int = 3) -> Column:
    """Distinct word n-gram shingles, pure codegen and LINEAR per doc:
    n shifted slices zipped together (each slice is one O(k) copy). The
    obvious transform(sequence, i -> concat_ws(slice(toks, i+1, n)))
    formulation re-slices the token array per shingle — O(k^2) per doc,
    measured 25x slower at 300-word docs."""
    toks = F.split(F.trim(text), r"\s+")
    k = F.size(toks)
    m = F.greatest(k - n + 1, F.lit(1))
    parts = [F.slice(toks, i + 1, m) for i in range(n)]
    sh = parts[0]
    for p in parts[1:]:
        sh = F.zip_with(sh, p, lambda a, b: F.concat(a, F.lit(" "), b))
    return F.when(k >= n, F.array_distinct(sh)).otherwise(
        F.array().cast("array<string>")
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.8,
    max_df: int | None = 1000,
) -> DataFrame:
    """Near-duplicate pairs by exact n-gram Jaccard, blocked on shared
    shingles (pairs with zero common shingles never shuffle).

    ``max_df`` caps shingle document-frequency BEFORE the self-join: one
    stop-phrase shingle shared by 10^6 docs would otherwise emit ~10^12
    candidate pairs. Shingles above the cap are dropped from the universe on
    BOTH the intersection and the per-doc counts, so the result is the exact
    Jaccard over the df-filtered shingle space (identical to the unfiltered
    Jaccard whenever no shingle exceeds the cap, e.g. at test SF)."""
    ex = df.select(
        F.col(id_col).alias("id"),
        F.explode(word_shingles(F.col(text_col), n)).alias("shingle"),
    )
    if max_df is not None:
        dfreq = ex.groupBy("shingle").agg(F.count(F.lit(1)).alias("_df"))
        ex = ex.join(dfreq.filter(F.col("_df") <= max_df).select("shingle"), "shingle")
    counted = ex.join(
        ex.groupBy("id").agg(F.count(F.lit(1)).alias("sh_count")), "id"
    )
    a = counted.select(F.col("id").alias("id_a"), F.col("sh_count").alias("cnt_a"), "shingle")
    b = counted.select(F.col("id").alias("id_b"), F.col("sh_count").alias("cnt_b"), "shingle")
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
    portable: bool = False,
) -> DataFrame:
    """MinHash signature per doc: h_i(s) = (a_i * base_h(s) + b_i) mod P31,
    min per hash family — all in one exploded aggregate (partial+final min).
    (a_i, b_i) are fixed constants: deterministic on every worker, no RNG.

    base_h = xxhash64 (default; fastest, JVM codegen) or the portable
    md5-derived hash (``portable=True``) whose DuckDB twin is exact — used
    by the correctness oracle. 31-bit universal hashing keeps every
    intermediate below 2^62 — no ANSI long overflow, still codegen.

    Plan-shape note (measured): a shuffle-free per-row alternative
    (transform + array_min over the shingle array, zero exchanges) computes
    identical rows but runs ~30% SLOWER — higher-order functions are
    interpreted, while this explode+aggregate stays inside whole-stage
    codegen, and its exchange is harmless at any scale: map-side partial
    aggregation collapses to one row per (map partition, id) BEFORE the
    shuffle, so the wire carries ~|docs| signature rows, never per-shingle
    rows."""
    sh = df.select(
        F.col(id_col).alias("id"), F.explode(word_shingles(F.col(text_col), n)).alias("shingle")
    )
    raw = portable_hash64(F.col("shingle")) if portable else F.xxhash64("shingle")
    # Materialize the base hash in the projection BELOW the aggregate: agg
    # functions get no cross-function subexpression elimination, so an
    # xxhash64/md5 referenced inside all 32 min()s would run 32x per shingle.
    hashed = sh.select("id", F.pmod(raw, F.lit(P31)).alias("_bh"))
    aggs = [
        F.min(F.pmod(F.col("_bh") * F.lit(a) + F.lit(b), F.lit(P31))).alias(f"mh_{i}")
        for i, (a, b) in enumerate(universal_hash_constants(num_hashes))
    ]
    return hashed.groupBy("id").agg(*aggs)


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num_hashes: int = 32,
    bands: int = 8,
    verify_threshold: float | None = 0.7,
    portable: bool = False,
) -> DataFrame:
    """MinHash + banded LSH near-dup candidates; optional exact-Jaccard verify.

    Docs agreeing on ALL rows of any band become candidates (equi-join on
    (band, bucket)) — candidate volume ~ collisions, not |D|^2. Bucket =
    xxhash64 of the band's signature rows (default) or a polynomial
    combiner mod P31 (``portable=True``, SQL-oracle-expressible).
    """
    sig = minhash_signature(df, id_col, text_col, n, num_hashes, portable=portable)
    rows_per_band = num_hashes // bands

    def band_bucket(b: int) -> Column:
        cols = [F.col(f"mh_{b * rows_per_band + r}") for r in range(rows_per_band)]
        if not portable:
            return F.xxhash64(*cols)
        acc: Column = F.lit(0).cast("long")
        for c in cols:
            # acc < 2^31, acc*BASE < 2^51, +mh < 2^51 — overflow-free
            acc = F.pmod(acc * F.lit(BUCKET_BASE) + c, F.lit(P31))
        return acc

    band_cols = [band_bucket(b).alias(f"band_{b}") for b in range(bands)]
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


def simhash(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", portable: bool = False
) -> DataFrame:
    """SimHash over whitespace tokens: per bit, sign of the sum of (+1/-1)
    votes from each token's hash — expressed as N conditional sums in ONE
    aggregate (no Python, no explode-per-bit). Default: 63 bits of xxhash64;
    ``portable=True``: 60 bits of the md5-derived hash (exact DuckDB twin)."""
    n_bits = 60 if portable else 63
    toks = df.select(
        F.col(id_col).alias("id"), F.explode(F.split(F.trim(text_col), r"\s+")).alias("tok")
    ).withColumn("h", portable_hash64(F.col("tok")) if portable else F.xxhash64("tok"))
    # bit test via unsigned shift — a literal 1<<63 would overflow signed long
    bit_aggs = [
        F.sum(
            F.when(F.shiftrightunsigned(F.col("h"), i).bitwiseAND(F.lit(1)) != 0, 1).otherwise(-1)
        ).alias(f"b{i}")
        for i in range(n_bits)
    ]
    votes = toks.groupBy("id").agg(*bit_aggs)
    sim = F.lit(0).cast("long")
    for i in range(n_bits):
        sim = sim + F.when(F.col(f"b{i}") > 0, F.lit(1 << i)).otherwise(F.lit(0))
    return votes.select("id", sim.alias("simhash"))


def hamming64(a: Column, b: Column) -> Column:
    return F.bit_count(a.bitwiseXOR(b))


def simhash_neardup_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_distance: int = 3,
    portable: bool = False,
) -> DataFrame:
    """(id_a, id_b, hamming) pairs within ``max_distance`` bits — the SCALE
    path for SimHash (the bare fingerprint needs an all-pairs XOR).

    Pigeonhole blocking: the fingerprint is split into ``max_distance + 1``
    bit-bands; two fingerprints differing in <= max_distance bits must agree
    EXACTLY on at least one band (k differences cannot touch k+1 bands), so
    candidates are an equi-join on (band_index, band_bits) — zero false
    negatives, candidate volume ~ band collisions, never |D|^2. A final
    bit_count XOR filter removes the false positives. Same shape as the
    MinHash banded join, so the same AQE skew handling covers hot bands."""
    n_bits = 60 if portable else 63
    bands = max_distance + 1
    width = -(-n_bits // bands)  # ceil: last band may be narrower
    # The expensive simhash lineage (explode + 60-odd conditional-sum aggs)
    # feeds both sides of the self-join below — materialize it once so it
    # executes once, not twice (same pattern as canon/cc.py).
    fp = simhash(df, id_col, text_col, portable=portable).localCheckpoint(eager=True)

    def band_bits(i: int) -> Column:
        lo = i * width
        w = min(width, n_bits - lo)
        mask = (1 << w) - 1
        return F.shiftrightunsigned(F.col("simhash"), lo).bitwiseAND(F.lit(mask))

    stacked = fp.select(
        "id",
        "simhash",
        F.posexplode(F.array(*[band_bits(i) for i in range(bands)])).alias(
            "band", "bits"
        ),
    )
    a = stacked.select(
        F.col("id").alias("id_a"), F.col("simhash").alias("fp_a"), "band", "bits"
    )
    b = stacked.select(
        F.col("id").alias("id_b"), F.col("simhash").alias("fp_b"), "band", "bits"
    )
    return (
        a.join(b, ["band", "bits"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", hamming64(F.col("fp_a"), F.col("fp_b")).alias("hamming"))
        .distinct()
        .filter(F.col("hamming") <= max_distance)
    )


def embedding_neardup_pairs(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    method: str = "auto",
    brute_limit: int = 50_000,
) -> DataFrame:
    """Cosine-threshold near-dup pairs over an embedding column.

    method="brute": exact all-pairs with a broadcast side — fine for small
    candidate tables, a scale-killer as a default. method="lsh": banded
    hyperplane LSH (link.ann.lsh_threshold_pairs) — candidates ~ bucket
    collisions. method="auto" (default) counts the table once and switches
    to LSH above ``brute_limit`` rows, so the scale path is the default
    rather than an opt-in. The size probe is limit(brute_limit+1).count()
    — same pattern as canon.cc — which short-circuits after scanning at
    most brute_limit+1 rows instead of a full count of a 100 TB table."""
    if method not in ("auto", "brute", "lsh"):
        raise ValueError(f"unknown method {method!r}")
    if method == "auto":
        probe = emb.limit(brute_limit + 1).count()
        method = "brute" if probe <= brute_limit else "lsh"
    if method == "lsh":
        from ..link.ann import lsh_threshold_pairs

        return lsh_threshold_pairs(emb, id_col, vec_col, threshold)
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


def exact_collapse(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_words: int = 3,
) -> DataFrame:
    """Byte-identical-content collapse: one representative row (min id) per
    distinct text, full schema preserved — the mandatory stage BEFORE any
    LSH self-join on crawl data, where the dominant duplication mode is
    millions of byte-identical boilerplate pages. Without it every copy of
    an identical cluster lands in the same bucket in ALL bands and the band
    self-join emits O(c^2) pairs per cluster (10^6 copies -> ~10^12
    candidate pairs); after it the cluster contributes ONE row to LSH.

    Shape: a single partial+final ``min_by`` aggregate keyed on
    (length, xxhash64) of the raw text — map-side combine collapses each
    identical cluster to at most one row per map partition before the
    shuffle, so the wire carries ~|distinct| rows even when the corpus is
    dominated by copies. No join-back pass.

    Docs with fewer than ``min_words`` whitespace tokens keep their own key
    (keyed by id): they have no ``n``-shingles, so the LSH stage can never
    pair them, and collapsing them would CHANGE the near-dup semantics
    (identical short docs all survive today). Keying them by id keeps
    ``neardup_keep`` bit-identical to the uncollapsed pipeline.
    """
    t = F.col(text_col)
    # r6: split with limit min_words+1 — the >= test only needs to see
    # whether that many fields exist, not the full token array (the last
    # limited field swallows the rest, which cannot lower the count).
    long_enough = F.size(F.split(F.trim(t), r"\s+", min_words + 1)) >= min_words
    key = F.when(
        long_enough,
        F.struct(
            F.lit(0).alias("short"),
            F.length(t).cast("long").alias("a"),
            F.xxhash64(t).alias("b"),
        ),
    ).otherwise(
        F.struct(
            F.lit(1).alias("short"),
            F.col(id_col).cast("long").alias("a"),
            F.lit(0).cast("long").alias("b"),
        )
    )
    return (
        df.groupBy(key.alias("_k"))
        .agg(F.min_by(F.struct(*df.columns), F.col(id_col)).alias("_rep"))
        .select("_rep.*")
    )


def neardup_keep(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num_hashes: int = 32,
    bands: int = 8,
    verify_threshold: float | None = 0.7,
    portable: bool = False,
) -> DataFrame:
    """FineWeb-style two-tier near-dup survivor selection: exact-collapse to
    unique representatives, MinHash-LSH + connected components over the
    representatives ONLY, survivors out.

    Output is IDENTICAL to ``dedup_keep(df, minhash_lsh_pairs(df, ...))``:
    byte-identical docs share every band bucket and verify at Jaccard 1.0,
    so an exact cluster is always one CC component whose survivor is its min
    id — exactly the representative ``exact_collapse`` keeps; docs shorter
    than ``n`` words never enter LSH in either formulation. The collapse
    only removes the O(c^2) identical-cluster candidate blowup, it cannot
    change the survivor set. (That equivalence is what lets the SQL oracle
    keep replaying the single-tier formulation.)
    """
    # reps has THREE consumers (the shingle/signature stage, the candidate
    # verify join, and the final left_anti) — materialize the collapse once
    # instead of betting on exchange reuse across all three subtrees
    # (measured: min 3.9 s vs 4.4 s at sf0.1, and far lower spread)
    reps = exact_collapse(
        df, id_col=id_col, text_col=text_col, min_words=n
    ).localCheckpoint(eager=True)
    # r6 (guide §2.5): AQE sizes the collapse output by BYTES, but the
    # downstream shingle-explode + signature stage costs ~n_hashes ops per
    # shingle — a few-MB-per-partition coalesce (8 partitions at sf1)
    # serializes it. Probe the width on the CHECKPOINT (its RDD already
    # exists, so .rdd is conversion-only — probing the INPUT df instead
    # would make AQE materialize the whole upstream) and re-spread only
    # when narrower than the core count; at cluster scale the collapse
    # output is wide already and this no-ops.
    target = df.sparkSession.sparkContext.defaultParallelism
    if reps.rdd.getNumPartitions() < target:
        reps = reps.repartition(target, id_col).localCheckpoint(eager=True)
    pairs = minhash_lsh_pairs(
        reps,
        id_col=id_col,
        text_col=text_col,
        n=n,
        num_hashes=num_hashes,
        bands=bands,
        verify_threshold=verify_threshold,
        portable=portable,
    )
    return dedup_keep(reps, pairs, id_col=id_col)


def dedup_keep(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    a_col: str = "id_a",
    b_col: str = "id_b",
) -> DataFrame:
    """Survivor selection: given near-duplicate candidate ``pairs`` (from
    minhash_lsh_pairs / simhash / embedding_neardup_pairs), cluster them with
    connected components and keep exactly one document per cluster — the one
    with the minimum id (deterministic). Docs in no pair survive untouched.

    Scale shape: CC runs only over the PAIRS graph (tiny relative to the
    corpus — collisions, not documents), and the final pass is a left_anti
    join of the corpus against the loser set, which Spark/AQE broadcast when
    small. No full-corpus shuffle beyond what the pair generator already did.
    """
    from ..canon.cc import connected_components

    edges = pairs.select(F.col(a_col).alias("src"), F.col(b_col).alias("dst"))
    cc = connected_components(edges)
    losers = cc.filter(F.col("node") != F.col("component")).select(
        F.col("node").alias(id_col)
    )
    return df.join(losers, id_col, "left_anti")


def cross_source_matrix(
    df: DataFrame,
    key_col: str,
    source_col: str = "source",
) -> DataFrame:
    """Cross-source duplication matrix: for documents grouped by a
    content key (exact hash, MinHash cluster id, URL — caller's
    choice), count duplicate PAIRS per ordered source pair ->
    (source_a, source_b, n_keys, n_pairs) with source_a <= source_b.
    The training-mixture diagnostic: "how much of source B is a copy of
    source A" decides dedup order and mixture weights before a 10^12-doc
    run.

    Shape: one (key, source) count aggregate, a self-join on the key
    (per-key fan-out is bounded by the number of SOURCES, a constant,
    regardless of how hot the key is), and a final aggregate. Pair
    arithmetic, never pair enumeration: c_a * c_b cross-source,
    c * (c-1) / 2 within-source.
    """
    per = df.groupBy(
        F.col(key_col).alias("k"), F.col(source_col).alias("s")
    ).agg(F.count(F.lit(1)).alias("c"))
    a = per.select(
        "k", F.col("s").alias("source_a"), F.col("c").alias("ca")
    )
    b = per.select(
        "k", F.col("s").alias("source_b"), F.col("c").alias("cb")
    )
    joined = a.join(b, "k").where(F.col("source_a") <= F.col("source_b"))
    pairs = F.when(
        F.col("source_a") == F.col("source_b"),
        (F.col("ca") * (F.col("ca") - 1) / 2).cast("long"),
    ).otherwise(F.col("ca") * F.col("cb"))
    return (
        joined.select("k", "source_a", "source_b", pairs.alias("pairs"))
        .where(F.col("pairs") > 0)
        .groupBy("source_a", "source_b")
        .agg(
            F.count(F.lit(1)).alias("n_keys"),
            F.sum("pairs").alias("n_pairs"),
        )
    )


def lsh_parameter_plan(
    spark,
    n_hashes: int,
    target_jaccard: float,
    similarities: list[float] | None = None,
) -> DataFrame:
    """MinHash-LSH tuning table: for every (bands b, rows r) split of
    ``n_hashes`` (b * r = n_hashes), the S-curve collision probability
    P(candidate | jaccard s) = 1 - (1 - s^r)^b at each probe similarity,
    plus the threshold (1/b)^(1/r) where the curve crosses ~0.5 and the
    false-positive/negative mass around ``target_jaccard``. The planner
    you consult BEFORE burning a 10^12-doc pass with the wrong banding:
    pick the row whose threshold brackets the dedup bar and whose
    p_at_target is acceptable.

    Pure closed-form arithmetic over a constant-sized config table
    (divisor count of n_hashes x probe points) — built as a DataFrame so
    it composes with the rest of the planning pipeline, costs nothing,
    and stays SQL-oracle-checkable.
    """
    sims = similarities or [0.1 * i for i in range(1, 10)]
    rows = []
    for b in range(1, n_hashes + 1):
        if n_hashes % b:
            continue
        r = n_hashes // b
        for s in sims:
            rows.append((b, r, round(s, 6)))
    df = spark.createDataFrame(rows, "bands int, rows int, s double")
    p = 1.0 - F.pow(1.0 - F.pow(F.col("s"), F.col("rows")), F.col("bands"))
    thr = F.pow(1.0 / F.col("bands"), 1.0 / F.col("rows"))
    return df.select(
        "bands",
        "rows",
        "s",
        p.alias("p_candidate"),
        thr.alias("threshold"),
        (
            F.lit(1.0)
            - F.pow(
                1.0 - F.pow(F.lit(float(target_jaccard)), F.col("rows")),
                F.col("bands"),
            )
        ).alias("p_at_target"),
    )
