"""J8: approximate-nearest-neighbor embedding rerank.

Two paths over ``embeddings(vec_id, embedding: array<float>, label)``:

- ``cosine_topk``: exact brute-force top-k — broadcast the candidate set,
  JVM-side dot product via ``F.zip_with`` + ``F.aggregate`` (no Python),
  window row_number <= k. Baseline + correctness oracle.
- ``lsh_topk``: random-hyperplane LSH — deterministic hash-derived planes,
  banded signature buckets, shuffle join on (band, bucket), exact cosine
  rerank within buckets. The scale path: candidate pairs ~ bucket collisions,
  not |Q| x |C|.
"""

from __future__ import annotations

import hashlib

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _norm_col(vec: str) -> F.Column:
    return F.sqrt(
        F.aggregate(vec, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x)
    )


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y), F.lit(0.0), lambda acc, x: acc + x
    )


def cosine_topk(
    queries: DataFrame,
    candidates: DataFrame,
    k: int = 5,
    q_id: str = "q_id",
    c_id: str = "c_id",
    q_vec: str = "q_vec",
    c_vec: str = "c_vec",
) -> DataFrame:
    """Exact top-k by cosine similarity; candidates broadcast (small dim table).

    Ties break on candidate id ascending — deterministic output.
    """
    q = queries.select(q_id, F.col(q_vec).alias("_qv"), _norm_col(q_vec).alias("_qn"))
    c = candidates.select(c_id, F.col(c_vec).alias("_cv"), _norm_col(c_vec).alias("_cn"))
    pairs = q.crossJoin(F.broadcast(c)).withColumn(
        "cos_sim",
        F.when(
            (F.col("_qn") > 0) & (F.col("_cn") > 0),
            _dot(F.col("_qv"), F.col("_cv")) / (F.col("_qn") * F.col("_cn")),
        ).otherwise(F.lit(0.0)),
    )
    w = Window.partitionBy(q_id).orderBy(F.desc("cos_sim"), F.asc(c_id))
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(q_id, c_id, "cos_sim", "rank")
    )


def _deterministic_planes(dim: int, n_planes: int, seed: str = "spanluke-lsh") -> list[list[float]]:
    """Hyperplanes from a counter-mode blake2b stream — identical on every
    worker/run, no RNG state."""
    out = []
    for p in range(n_planes):
        vals = []
        for d in range(dim):
            h = hashlib.blake2b(f"{seed}:{p}:{d}".encode(), digest_size=8).digest()
            u = int.from_bytes(h, "little") / 2.0**64
            vals.append(float(np.float32(2.0 * u - 1.0)))
        out.append(vals)
    return out


def _plane_dot(vec: str | F.Column, plane: list[float]) -> F.Column:
    """Dot of a vector column with a literal hyperplane, dimension-safe:
    both sides are sliced to min(len(vec), len(plane)) so a non-64-dim
    embedding degrades to the leading dims instead of NULLing every bit
    (zip_with pads the shorter array with nulls otherwise)."""
    p = F.array(*[F.lit(v) for v in plane])
    n = F.least(F.size(vec) if isinstance(vec, str) else F.size(vec), F.lit(len(plane)))
    return F.aggregate(
        F.zip_with(
            F.slice(vec, F.lit(1), n),
            F.slice(p, F.lit(1), n),
            lambda x, y: x.cast("double") * y,
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def hyperplane_signature(
    df: DataFrame,
    id_col: str,
    vec: str,
    side: str,
    n_planes: int = 16,
    n_bands: int = 4,
    dim: int = 64,
) -> DataFrame:
    """Sign-bit random-hyperplane signature split into bands, stacked to
    (id, _<side>v, _<side>n, band, bucket) rows — the shared LSH front-end
    for top-k search and threshold near-dup pairing."""
    planes = _deterministic_planes(dim, n_planes)
    bits_per_band = n_planes // n_bands
    sig_bits = [
        F.when(_plane_dot(vec, plane) >= 0, 1).otherwise(0) for plane in planes
    ]
    bands = []
    for b in range(n_bands):
        expr = F.lit(0)
        for i in range(bits_per_band):
            expr = expr * 2 + sig_bits[b * bits_per_band + i]
        bands.append(expr.alias(f"_band{b}"))
    wide = df.select(
        id_col, F.col(vec).alias(f"_{side}v"), _norm_col(vec).alias(f"_{side}n"), *bands
    )
    return wide.select(
        id_col,
        f"_{side}v",
        f"_{side}n",
        F.posexplode(F.array(*[F.col(f"_band{b}") for b in range(n_bands)])).alias(
            "band", "bucket"
        ),
    )


def lsh_topk(
    queries: DataFrame,
    candidates: DataFrame,
    k: int = 5,
    n_planes: int = 16,
    n_bands: int = 4,
    q_id: str = "q_id",
    c_id: str = "c_id",
    q_vec: str = "q_vec",
    c_vec: str = "c_vec",
    dim: int = 64,
) -> DataFrame:
    """Random-hyperplane LSH: sign-bit signature split into bands; vectors
    sharing any band bucket become candidate pairs; exact cosine rerank.

    Recall < 1 by construction (ANN); bucket join is an equi-join on
    (band, bucket) so Catalyst shuffles only colliding pairs.
    """
    qs = hyperplane_signature(queries, q_id, q_vec, "q", n_planes, n_bands, dim)
    cs = hyperplane_signature(candidates, c_id, c_vec, "c", n_planes, n_bands, dim)
    # ids-only through the band join: selecting vectors here would carry
    # every embedding n_bands times through the exchange (the same shuffle
    # shape incremental._stack documents); Catalyst prunes _qv/_qn off the
    # signature scan, and the vectors re-join on the collision-sized pair set.
    cand = (
        qs.select(q_id, "band", "bucket")
        .join(cs.select(c_id, "band", "bucket"), ["band", "bucket"])
        .select(q_id, c_id)
        .dropDuplicates([q_id, c_id])
    )
    qv = queries.select(q_id, F.col(q_vec).alias("_qv"), _norm_col(q_vec).alias("_qn"))
    cv = candidates.select(c_id, F.col(c_vec).alias("_cv"), _norm_col(c_vec).alias("_cn"))
    pairs = (
        cand.join(qv, q_id)
        .join(cv, c_id)
        .withColumn(
            "cos_sim",
            F.when(
                (F.col("_qn") > 0) & (F.col("_cn") > 0),
                _dot(F.col("_qv"), F.col("_cv")) / (F.col("_qn") * F.col("_cn")),
            ).otherwise(F.lit(0.0)),
        )
    )
    w = Window.partitionBy(q_id).orderBy(F.desc("cos_sim"), F.asc(c_id))
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(q_id, c_id, "cos_sim", "rank")
    )


def ivf_topk(
    queries: DataFrame,
    candidates: DataFrame,
    k: int = 5,
    n_cells: int = 16,
    n_probe: int = 4,
    q_id: str = "q_id",
    c_id: str = "c_id",
    q_vec: str = "q_vec",
    c_vec: str = "c_vec",
    train_iters: int = 0,
) -> DataFrame:
    """IVF (inverted-file) ANN: coarse-quantize candidates into n_cells
    cells (nearest of n_cells deterministic centroids by dot product), probe
    the query's n_probe nearest cells, exact cosine rerank inside them.

    Centroids are the n_cells candidates with the smallest xxhash64(id) — a
    stable pseudo-random sample, no RNG state (collected once; n_cells rows
    is driver-trivial). ``train_iters`` > 0 refines them with that many
    Lloyd rounds (relational: assignment expression -> dim-wise avg -> tiny
    k x dims collect per round) — balanced cells concentrate true neighbors
    into fewer probes. Search cost ~ |C| * n_probe / n_cells per query;
    recall < 1 by construction (a neighbor quantized into an unprobed cell
    is missed) — the IVF twin of the LSH path, trading one tiny driver
    action for tunable probe-based recall.
    """
    cents = (
        candidates.select(c_id, c_vec)
        .orderBy(F.xxhash64(c_id), c_id)
        .limit(n_cells)
        .collect()
    )
    centroids = [list(r[1]) for r in cents]

    def nearest_cell(vec: str) -> F.Column:
        dots = [_plane_dot(vec, c) for c in centroids]
        best = F.greatest(*dots) if len(dots) > 1 else dots[0]
        cell = F.lit(len(dots) - 1)
        for i in range(len(dots) - 2, -1, -1):  # lowest index wins ties
            cell = F.when(dots[i] == best, F.lit(i)).otherwise(cell)
        return cell

    for _ in range(train_iters):
        refined = (
            candidates.select(nearest_cell(c_vec).alias("cell"), F.posexplode(c_vec).alias("pos", "v"))
            .groupBy("cell", "pos")
            .agg(F.avg("v").alias("c"))
            .collect()
        )
        by_cell: dict[int, dict[int, float]] = {}
        for r in refined:
            by_cell.setdefault(r["cell"], {})[r["pos"]] = r["c"]
        centroids = [
            [by_cell.get(i, {}).get(p, centroids[i][p]) for p in range(len(centroids[i]))]
            for i in range(len(centroids))
        ]

    def probe_cells(vec: str) -> F.Column:
        scored = F.array(
            *[
                F.struct(_plane_dot(vec, c).alias("d"), F.lit(i).alias("cell"))
                for i, c in enumerate(centroids)
            ]
        )
        top = F.slice(F.sort_array(scored, asc=False), 1, n_probe)
        return F.transform(top, lambda s: s.getField("cell"))

    cs = candidates.select(
        c_id,
        F.col(c_vec).alias("_cv"),
        _norm_col(c_vec).alias("_cn"),
        nearest_cell(c_vec).alias("cell"),
    )
    qs = queries.select(
        q_id,
        F.col(q_vec).alias("_qv"),
        _norm_col(q_vec).alias("_qn"),
        F.explode(probe_cells(q_vec)).alias("cell"),
    )
    pairs = qs.join(cs, "cell").withColumn(
        "cos_sim",
        F.when(
            (F.col("_qn") > 0) & (F.col("_cn") > 0),
            _dot(F.col("_qv"), F.col("_cv")) / (F.col("_qn") * F.col("_cn")),
        ).otherwise(F.lit(0.0)),
    )
    w = Window.partitionBy(q_id).orderBy(F.desc("cos_sim"), F.asc(c_id))
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(q_id, c_id, "cos_sim", "rank")
    )


def lsh_threshold_pairs(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    n_planes: int = 16,
    n_bands: int = 4,
    dim: int = 64,
) -> DataFrame:
    """Cosine-threshold near-dup pairs via banded hyperplane LSH — the
    billion-row path for dedup.embedding_neardup_pairs: candidate volume is
    bucket collisions, not |D|^2 (approximate: pairs missing every band
    bucket are not recalled)."""
    sig = hyperplane_signature(emb, id_col, vec_col, "a", n_planes, n_bands, dim)
    # ids-only band self-join (see lsh_topk): the billion-row claim in this
    # docstring only holds if the exchange carries (id, band, bucket) rows,
    # not n_bands copies of every embedding vector.
    a = sig.select(F.col(id_col).alias("id_a"), "band", "bucket")
    b = sig.select(F.col(id_col).alias("id_b"), "band", "bucket")
    cand = (
        a.join(b, ["band", "bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .dropDuplicates(["id_a", "id_b"])
    )
    va = emb.select(
        F.col(id_col).alias("id_a"), F.col(vec_col).alias("_av"), _norm_col(vec_col).alias("_an")
    )
    vb = emb.select(
        F.col(id_col).alias("id_b"), F.col(vec_col).alias("_bv"), _norm_col(vec_col).alias("_bn")
    )
    dot = F.aggregate(
        F.zip_with("_av", "_bv", lambda x, y: x.cast("double") * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return (
        cand.join(va, "id_a")
        .join(vb, "id_b")
        .withColumn(
            "cos_sim",
            F.when(
                (F.col("_an") > 0) & (F.col("_bn") > 0), dot / (F.col("_an") * F.col("_bn"))
            ).otherwise(F.lit(0.0)),
        )
        .filter(F.col("cos_sim") >= threshold)
        .select("id_a", "id_b", "cos_sim")
    )


def label_centroids_cosine(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """Per-label centroid quality: (label, n_vecs, avg_cos) where avg_cos is
    the mean cosine of each vector to its label centroid — the class-
    prototype / k-means-E-step building block, done RELATIONALLY:

      posexplode -> (label, dim) avg  = centroid, one partial+final agg
      join back on (label, dim)       = per-element products
      groupBy vec                     = dot and norms in one agg
      groupBy label                   = the report

    No vectors are ever rebuilt driver-side; every step is a hash agg or an
    equi-join, so the plan scales with rows x dims, not with k or |D|^2.
    """
    pos = emb.select(
        F.col(id_col).alias("vid"),
        F.col(label_col).alias("lbl"),
        F.posexplode(F.col(vec_col)).alias("pos", "v"),
    )
    cent = pos.groupBy("lbl", "pos").agg(F.avg("v").alias("c"))
    per_vec = (
        pos.join(cent, ["lbl", "pos"])
        .groupBy("vid", "lbl")
        .agg(
            F.sum(F.col("v") * F.col("c")).alias("dot"),
            F.sqrt(F.sum(F.col("v") * F.col("v"))).alias("nv"),
            F.sqrt(F.sum(F.col("c") * F.col("c"))).alias("nc"),
        )
    )
    cos = F.when(
        (F.col("nv") > 0) & (F.col("nc") > 0), F.col("dot") / (F.col("nv") * F.col("nc"))
    ).otherwise(F.lit(0.0))
    return (
        per_vec.groupBy(F.col("lbl").alias(label_col))
        .agg(
            F.count(F.lit(1)).alias("n_vecs"),
            F.round(F.avg(cos), 6).alias("avg_cos"),
        )
    )


def knn_label_vote(
    queries: DataFrame,
    index: DataFrame,
    k: int = 5,
    q_id: str = "q_id",
    q_vec: str = "q_vec",
    c_id: str = "c_id",
    c_vec: str = "c_vec",
    label_col: str = "label",
    scale: int = 64,
) -> DataFrame:
    """Semi-supervised label assignment by embedding k-NN majority vote —
    the domain/quality-label propagation step of a curation pipeline
    (label a handful of docs, vote labels onto the rest).

    Engine-independence discipline (the q240 PCA trick): both sides are
    quantized to integers (round(x * scale)), similarity is the EXACT
    integer inner product (MIPS), so the top-k ranking can never flip on
    a float tie between engines — ties break on candidate id, votes on
    (count desc, label asc). The labeled index is broadcast (it is the
    small curated side); at crawl scale swap the candidate generator for
    lsh_topk/ivf_topk and keep the vote stage unchanged.

    -> (q_id, label, votes, best_dot): one row per query — the winning
    label, its vote count among the k neighbours, and the winner's best
    (max) integer dot product as an auditable confidence proxy.
    """
    qz = queries.select(
        F.col(q_id).alias("q_id"),
        F.transform(
            F.col(q_vec), lambda x: F.round(x.cast("double") * scale).cast("long")
        ).alias("_q"),
    )
    cz = index.select(
        F.col(c_id).alias("c_id"),
        F.col(label_col).alias("label"),
        F.transform(
            F.col(c_vec), lambda x: F.round(x.cast("double") * scale).cast("long")
        ).alias("_c"),
    )
    pairs = qz.crossJoin(F.broadcast(cz)).withColumn(
        "dot",
        F.aggregate(
            F.zip_with(F.col("_q"), F.col("_c"), lambda a, b: a * b),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        ),
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("dot"), F.asc("c_id"))
    topk = pairs.withColumn("_rn", F.row_number().over(w)).where(F.col("_rn") <= k)
    votes = topk.groupBy("q_id", "label").agg(
        F.count(F.lit(1)).alias("votes"), F.max("dot").alias("best_dot")
    )
    wv = Window.partitionBy("q_id").orderBy(
        F.desc("votes"), F.asc("label")
    )
    return (
        votes.withColumn("_rv", F.row_number().over(wv))
        .where(F.col("_rv") == 1)
        .select("q_id", "label", "votes", "best_dot")
    )
