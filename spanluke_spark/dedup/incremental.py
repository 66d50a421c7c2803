"""Incremental near-dup dedup for a continuously-growing corpus (the
crawl-feed pattern): survivors' MinHash SIGNATURES are the stored state; a
new delta computes its own signatures, LSH-joins them against the stored
index and itself, and drops newcomers that collide — incumbent text is
never rescanned.

Verification uses the signature-estimated Jaccard (fraction of agreeing
minhash components — the standard unbiased estimator), so the index needs
only ``num_hashes`` longs per kept doc, not shingle sets.

Incremental == batch: when ids are assigned in arrival order (earlier run
=> smaller id), running deltas through ``incremental_dedup`` yields exactly
the survivors of the one-shot ``dedup_keep`` under the same estimated-
Jaccard pair rule — PROVIDED clusters that span deltas are cliques under
the pair rule (near-copies of a common ancestor, the overwhelmingly common
case). The one divergence is inherent to append-only dedup: a LATER
arrival that chains two EARLIER survivors (edges to both, no edge between
them) merges their batch components retroactively, but shipped survivors
cannot be unshipped — incremental keeps both and drops the newcomer. The
tests and the q56 oracle pin down the equality on clique-structured dups.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .dedup import BUCKET_BASE, P31, minhash_signature


def _band_cols(num_hashes: int, bands: int, portable: bool) -> list[Column]:
    rows = num_hashes // bands
    out = []
    for b in range(bands):
        cols = [F.col(f"mh_{b * rows + r}") for r in range(rows)]
        if not portable:
            out.append(F.xxhash64(*cols).alias(f"band_{b}"))
        else:
            acc: Column = F.lit(0).cast("long")
            for c in cols:
                acc = F.pmod(acc * F.lit(BUCKET_BASE) + c, F.lit(P31))
            out.append(acc.alias(f"band_{b}"))
    return out


def _stack(sig: DataFrame, num_hashes: int, bands: int, portable: bool) -> DataFrame:
    """(id, band, bucket) only — the band self/cross join must NOT carry the
    full signature through its exchange (8 bands would duplicate every
    signature 8x in the shuffle); signatures re-join on the candidate pairs,
    which are collision-sized."""
    banded = sig.select("id", *_band_cols(num_hashes, bands, portable))
    return banded.select(
        "id",
        F.posexplode(F.array(*[F.col(f"band_{b}") for b in range(bands)])).alias(
            "band", "bucket"
        ),
    )


def _est_jaccard(num_hashes: int) -> Column:
    agree = sum(
        F.when(F.col(f"a_mh_{i}") == F.col(f"b_mh_{i}"), 1).otherwise(0)
        for i in range(num_hashes)
    )
    return (agree.cast("double") / num_hashes).alias("est_jaccard")


def signature_index(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num_hashes: int = 32,
    portable: bool = False,
) -> DataFrame:
    """The stored dedup state: (id, mh_0..mh_{H-1}) for every KEPT doc."""
    return minhash_signature(df, id_col, text_col, n, num_hashes, portable=portable)


def estimated_pairs(
    sig_a: DataFrame,
    sig_b: DataFrame,
    num_hashes: int = 32,
    bands: int = 8,
    threshold: float = 0.5,
    portable: bool = False,
    anti_symmetric: bool = True,
    keep_equal: bool = False,
) -> DataFrame:
    """(id_a, id_b, est_jaccard): banded-LSH candidates between two
    signature sets whose estimated Jaccard clears ``threshold``.
    ``anti_symmetric`` keeps id_a < id_b (for self-joins); ``keep_equal``
    (cross-set only) treats id_a == id_b as a valid pair — required when a
    re-crawled document can arrive under the SAME id it was indexed with,
    so it still collides with its own stored signature."""
    sa = _stack(sig_a, num_hashes, bands, portable)
    sb = _stack(sig_b, num_hashes, bands, portable)
    j = sa.select(F.col("id").alias("id_a"), "band", "bucket").join(
        sb.select(F.col("id").alias("id_b"), "band", "bucket"), ["band", "bucket"]
    )
    if anti_symmetric:
        j = j.filter(F.col("id_a") < F.col("id_b"))
    elif not keep_equal:
        j = j.filter(F.col("id_a") != F.col("id_b"))
    cand = j.select("id_a", "id_b").distinct()
    a_sig = sig_a.select(F.col("id").alias("id_a"),
                         *[F.col(f"mh_{i}").alias(f"a_mh_{i}") for i in range(num_hashes)])
    b_sig = sig_b.select(F.col("id").alias("id_b"),
                         *[F.col(f"mh_{i}").alias(f"b_mh_{i}") for i in range(num_hashes)])
    return (
        cand.join(a_sig, "id_a")
        .join(b_sig, "id_b")
        .select("id_a", "id_b", _est_jaccard(num_hashes))
        .filter(F.col("est_jaccard") >= threshold)
    )


def incremental_dedup(
    new_docs: DataFrame,
    index: DataFrame | None,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num_hashes: int = 32,
    bands: int = 8,
    threshold: float = 0.5,
    portable: bool = False,
) -> tuple[DataFrame, DataFrame]:
    """-> (kept_new_docs, new_index).

    Semantics match the one-shot batch ``dedup_keep`` when ids are assigned
    in arrival order: the delta's pair graph is clustered with connected
    components over ALL new docs, every component touching an incumbent hit
    is dropped WHOLE (its batch min-id would be the incumbent — and a doc
    linked to an incumbent only THROUGH another dropped doc must die too),
    and clean components keep their min id. Everything joins on
    (band, bucket); the index is signatures only.
    """
    from ..canon.cc import connected_components

    sig_new = signature_index(new_docs, id_col, text_col, n, num_hashes, portable)
    sig_new = sig_new.localCheckpoint(eager=True)

    within = estimated_pairs(sig_new, sig_new, num_hashes, bands, threshold, portable)
    cc = connected_components(
        within.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
    )
    membership = (
        sig_new.select(F.col("id"))
        .join(cc.withColumnRenamed("node", "id"), "id", "left")
        .withColumn("comp", F.coalesce("component", F.col("id")))
        .select("id", "comp")
    )

    if index is not None:
        # keep_equal: a re-crawl re-ingested under its ORIGINAL id must hit
        # its own stored signature (est_jaccard 1.0), else the duplicate
        # survives and its signature lands in the index twice.
        cross = estimated_pairs(
            index, sig_new, num_hashes, bands, threshold, portable,
            anti_symmetric=False, keep_equal=True,
        )
        hits = cross.select(F.col("id_b").alias("id")).distinct()
        bad_comps = membership.join(hits, "id", "left_semi").select("comp").distinct()
        membership = membership.join(bad_comps, "comp", "left_anti")

    keep_ids = membership.groupBy("comp").agg(F.min("id").alias("id")).select("id")
    # docs too short to shingle have no signature -> cannot collide -> kept
    no_sig = new_docs.join(
        sig_new.select(F.col("id").alias(id_col)), id_col, "left_anti"
    )
    kept = new_docs.join(
        keep_ids.withColumnRenamed("id", id_col), id_col, "left_semi"
    ).unionByName(no_sig)
    kept_sig = sig_new.join(keep_ids, "id", "left_semi")
    if index is None:
        new_index = kept_sig
    else:
        # upsert: a re-crawled id whose CHANGED text survives dedup replaces
        # its stored signature (anti-join out the stale row) — the index
        # holds exactly one signature per id, ever.
        new_index = index.join(kept_sig.select("id"), "id", "left_anti").unionByName(
            kept_sig
        )
    return kept, new_index
