"""Entity canonicalization: exact/fuzzy-match edges + connected components
(north_rule: 'canonicalize'; SURVEY.md §2.3 J9, §4.6).

Works on the distinct entity keys coming out of linking:

1. Nodes: distinct subjects (ent:<id> and surf:<norm>), densely numbered.
2. Exact edges: same normalization key (e.g. an unlinked surface equal to a
   canonical name) — equi-join on the key.
3. Fuzzy edges: blocking on (first char, length bucket) then
   levenshtein <= threshold — a bounded theta-join, never all-pairs.
4. Connected components (large-star/small-star) -> canonical_key per cluster:
   the lexicographically smallest member (deterministic).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .cc import connected_components


def entity_nodes(triples_or_linked: DataFrame, subj_col: str = "subj") -> DataFrame:
    """Distinct entity keys with numeric node ids via xxhash64(key) — fully
    partition-parallel (the earlier dense_rank over a global Window funneled
    every key through ONE task; at web scale that single Exchange is the
    bottleneck). Collisions (~n^2/2^64) are asserted against in
    canonicalize_entities; CC correctness is id-agnostic."""
    keys = triples_or_linked.select(F.col(subj_col).alias("key")).distinct()
    return keys.withColumn("node", F.xxhash64("key"))


def deletion_variants(name: F.Column) -> F.Column:
    """All strings obtained by deleting one character, plus the string itself
    — the deletion neighborhood. Two strings are within levenshtein 1 iff
    their neighborhoods intersect (equality, substitution: delete the same
    position; insert/delete: one's identity equals the other's deletion), so
    an equi-join on variants is EXACT blocking for distance <= 1."""
    idx = F.sequence(F.lit(1), F.length(name))
    dels = F.transform(
        idx,
        lambda i: F.concat(
            name.substr(F.lit(1), i - 1),
            name.substr(i + 1, F.length(name) - i),
        ),
    )
    return F.array_distinct(F.array_union(dels, F.array(name)))


def levenshtein1_pairs(
    df: DataFrame, id_col: str, name_col: str
) -> DataFrame:
    """Exact levenshtein<=1 pairs via deletion-neighborhood blocking:
    O(n * len) join keys instead of the O(n^2) all-pairs theta-join, with
    identical results (the neighborhood join is lossless for distance 1;
    the final levenshtein filter removes the few false candidates).
    Returns (id_a, name_a, id_b, name_b)."""
    v = df.select(F.col(id_col).alias("id"), F.col(name_col).alias("nm"))
    variants = v.select(
        "id", "nm", F.explode(deletion_variants(F.col("nm"))).alias("var")
    )
    a = variants.select(F.col("id").alias("id_a"), F.col("nm").alias("name_a"), "var")
    b = variants.select(F.col("id").alias("id_b"), F.col("nm").alias("name_b"), "var")
    cand = (
        a.join(b, "var")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "name_a", "id_b", "name_b")
        .distinct()
    )
    return cand.filter(F.levenshtein("name_a", "name_b") <= 1)


def fuzzy_edges(
    nodes: DataFrame, max_distance: int = 2, strip_prefix: bool = True
) -> DataFrame:
    """Candidate same-entity pairs: block on (first letter, length//4), verify
    with levenshtein <= max_distance. Returns (src, dst) node-id pairs."""
    base = nodes.withColumn(
        "name",
        F.regexp_replace(F.col("key"), r"^(ent|surf):", "") if strip_prefix else F.col("key"),
    ).withColumn(
        "block",
        F.concat(F.substring("name", 1, 1), F.lit("#"), (F.length("name") / 4).cast("int")),
    )
    a = base.select(
        F.col("node").alias("src"), F.col("name").alias("name_a"), "block"
    )
    b = base.select(
        F.col("node").alias("dst"), F.col("name").alias("name_b"), "block"
    )
    return (
        a.join(b, "block")
        .filter(F.col("src") < F.col("dst"))
        .filter(F.levenshtein("name_a", "name_b") <= max_distance)
        .select("src", "dst")
    )


def exact_edges(nodes: DataFrame) -> DataFrame:
    """Same stripped name across distinct keys -> edge.

    NOTE: on the normalized ``surf:``-only key space of
    ``canonicalize_entities`` this is provably EMPTY (the stripped name IS
    the distinct key suffix), so the pipeline no longer calls it there —
    it exists for callers canonicalizing keys whose stripped names are not
    injective (e.g. mixed raw/normalized vocabularies)."""
    named = nodes.withColumn(
        "name", F.regexp_replace(F.col("key"), r"^(ent|surf):", "")
    )
    a = named.select(F.col("node").alias("src"), "name")
    b = named.select(F.col("node").alias("dst"), "name")
    return a.join(b, "name").filter(F.col("src") < F.col("dst")).select("src", "dst")


def canonicalize_entities(
    linked_or_triples: DataFrame,
    subj_col: str = "subj",
    max_distance: int = 1,
) -> DataFrame:
    """subject keys -> (key, canonical_key) via exact+fuzzy edges and CC.

    canonical_key = min key (lexicographic) of each component — stable under
    any partitioning.

    Only ``surf:`` keys participate in fuzzy/exact matching: ``ent:`` keys
    were already canonicalized by the alias dictionary, and edit distance on
    their numeric ids is meaningless (ent:10 ~ ent:12 must NOT merge).
    """
    nodes = entity_nodes(linked_or_triples, subj_col).persist()
    # xxhash64 collision assert: node ids must be unique per key (cheap on
    # the persisted entity vocab; a collision would silently merge clusters).
    n_keys, n_ids = nodes.agg(
        F.count(F.lit(1)).alias("k"), F.countDistinct("node").alias("n")
    ).first()
    if n_keys != n_ids:
        raise RuntimeError(
            f"entity_nodes xxhash64 collision: {n_keys} keys -> {n_ids} ids"
        )
    surf_nodes = nodes.filter(F.col("key").startswith("surf:"))
    if max_distance == 1:
        # exact lossless blocking (no first-char/length-bucket misses)
        named = surf_nodes.withColumn(
            "name", F.regexp_replace(F.col("key"), r"^(ent|surf):", "")
        )
        fz = levenshtein1_pairs(named, "node", "name").select(
            F.col("id_a").alias("src"), F.col("id_b").alias("dst")
        )
    else:
        fz = fuzzy_edges(surf_nodes, max_distance)
    # No exact_edges union: distinct surf: keys always carry distinct
    # stripped names (the key IS "surf:" + normalized name), so that join
    # matched nothing — one shuffle per run for provably zero edges.
    comp = connected_components(fz, "src", "dst")
    labeled = nodes.join(comp, "node", "left").withColumn(
        "component", F.coalesce("component", F.col("node"))
    )
    reps = (
        labeled.groupBy("component")
        .agg(F.min("key").alias("canonical_key"))
    )
    out = labeled.join(reps, "component").select("key", "canonical_key")
    # Truncate the mapping's lineage BEFORE releasing the nodes cache: the
    # mapping is consumed by several downstream actions (apply + counts +
    # writes), and without this every one of them would re-derive
    # entity_nodes -> the full upstream extraction. The mapping is one row
    # per distinct entity key — the canonical vocabulary — so materializing
    # it is cheap at any corpus size.
    out = out.localCheckpoint(eager=True)
    nodes.unpersist()
    return out


def apply_canonicalization(triples: DataFrame, mapping: DataFrame) -> DataFrame:
    """Rewrite triple subjects (and same_as objects) to canonical keys, then
    re-dedupe. Broadcast the mapping — entity vocab << triple count."""
    m = F.broadcast(mapping)
    out = (
        triples.join(m.withColumnRenamed("key", "subj"), "subj", "left")
        .withColumn("subj", F.coalesce("canonical_key", F.col("subj")))
        .drop("canonical_key")
    )
    return out.dropDuplicates(["subj", "pred", "obj", "url"])
