"""Entity canonicalization: fuzzy edges + CC clustering (north_rule stage)."""

from pyspark.sql import functions as F

from spanluke_spark.canon.canonicalize import (
    apply_canonicalization,
    canonicalize_entities,
    fuzzy_edges,
    entity_nodes,
)


def _subjects(spark, keys):
    return spark.createDataFrame([(k,) for k in keys], "subj string")


def test_canonicalize_clusters_typos(spark):
    keys = [
        "surf:supreme court",
        "surf:supreme courts",   # lev 1 -> same cluster
        "surf:supreme cour",     # lev 1 of first -> same cluster
        "surf:high court",
        "surf:high courd",       # lev 1 -> clusters with high court
        "surf:totally different thing",
    ]
    mapping = {r.key: r.canonical_key for r in canonicalize_entities(_subjects(spark, keys)).collect()}
    assert mapping["surf:supreme court"] == mapping["surf:supreme courts"]
    assert mapping["surf:supreme court"] == mapping["surf:supreme cour"]
    assert mapping["surf:high court"] == mapping["surf:high courd"]
    assert mapping["surf:high court"] != mapping["surf:supreme court"]
    assert mapping["surf:totally different thing"] == "surf:totally different thing"
    # canonical = lexicographic min of the cluster
    assert mapping["surf:supreme courts"] == "surf:supreme cour"


def test_fuzzy_edges_blocking(spark):
    nodes = entity_nodes(_subjects(spark, ["surf:abcd", "surf:abce", "surf:zzzz"]))
    edges = fuzzy_edges(nodes, max_distance=1).collect()
    assert len(edges) == 1  # abcd~abce only; zzzz in a different block


def test_apply_canonicalization_rewrites_and_dedupes(spark):
    triples = spark.createDataFrame(
        [
            ("surf:spark", "instance_of", "ORG", "u1", 0, 5),
            ("surf:sparc", "instance_of", "ORG", "u1", 9, 14),
            ("surf:sparc", "instance_of", "ORG", "u2", 0, 5),
        ],
        "subj string, pred string, obj string, url string, start int, end int",
    )
    mapping = canonicalize_entities(triples)
    out = apply_canonicalization(triples, mapping).collect()
    subs = {r.subj for r in out}
    assert subs == {"surf:sparc"}  # lexicographic min of {spark, sparc}
    # (u1) rows merge into one per (subj,pred,obj,url)
    assert len(out) == 2


def test_levenshtein1_pairs_exact_blocking(spark):
    """Deletion-neighborhood blocking is LOSSLESS for distance<=1 — including
    first-character edits and length+-1 pairs the (first char, length bucket)
    blocking missed — and equals the brute-force all-pairs result."""
    from spanluke_spark.canon.canonicalize import levenshtein1_pairs

    names = [
        (1, "spark"), (2, "spork"),      # substitution mid-word
        (3, "park"),                     # deletion of first char of spark
        (4, "sparkk"),                   # insertion at end
        (5, "apark"),                    # first-char substitution
        (6, "totally different"),
        (7, "spark"),                    # exact duplicate string, new id
    ]
    df = spark.createDataFrame(names, "id long, name string")
    got = {(r.id_a, r.id_b) for r in levenshtein1_pairs(df, "id", "name").collect()}

    import itertools

    def lev(a, b):
        dp = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            prev, dp[0] = dp[0], i
            for j, cb in enumerate(b, 1):
                prev, dp[j] = dp[j], min(dp[j] + 1, dp[j - 1] + 1, prev + (ca != cb))
        return dp[len(b)]

    want = {
        (i, j)
        for (i, a), (j, b) in itertools.combinations(names, 2)
        if lev(a, b) <= 1
    }
    assert got == want
    assert (1, 3) in want and (1, 5) in want  # the cases first-char blocking misses
