"""Legal citation extraction and precedent-authority scoring.

The reference's KG links mentions of PRECEDENT entities (SpanLuke's
LegalNER label set includes PRECEDENT and STATUTE, see
`/root/reference/legal_ner/` data config); at web scale the citation
NETWORK — which opinions cite which precedents — is the authority signal
legal search ranks by (the legal analogue of PageRank over case law).

Two stages, both pure codegen:

* ``extract_citations``: one regexp pass over the raw text pulls US
  reporter citations (``410 U.S. 113``, ``123 F.3d 456``,
  ``98 S.Ct. 2733``) into normalized ``vol REPORTER page`` keys — the
  same single-pass `regexp_extract_all` contract as
  ``graph/links.extract_links`` (no Python, no shuffle; the heavy text
  column never leaves the scan stage).
* ``citation_authority``: per-citation distinct-citing-document counts +
  a deterministic dense rank. Count-distinct shuffles 16-byte keys only.

At 10^12 pages the extraction is embarrassingly parallel and the
aggregate is a standard two-phase count-distinct; no skew beyond what a
mega-cited precedent (Roe, Miranda) produces — bounded by one long in a
partial agg per partition, not by row width.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# volume, reporter, page. Reporter alternatives cover the federal
# reporters; extend the alternation for state reporters as needed.
CITATION_RE = r"(\d{1,4})\s+(U\.S\.|S\.Ct\.|F\.2d|F\.3d|F\.4th|F\. Supp\.)\s+(\d{1,5})"


def extract_citations(
    docs: DataFrame, doc_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """docs -> (doc_id, citation) — one row per citation OCCURRENCE
    (duplicates within a document preserved; callers dedupe as their
    semantics demand). Citation key is normalized ``vol REPORTER page``
    with single spaces."""
    t = F.col(text_col)
    lit = F.lit(CITATION_RE)
    parts = F.arrays_zip(
        F.regexp_extract_all(t, lit, 1),
        F.regexp_extract_all(t, lit, 2),
        F.regexp_extract_all(t, lit, 3),
    )
    return docs.select(
        F.col(doc_col).alias("doc_id"), F.explode(parts).alias("_c")
    ).select(
        "doc_id",
        F.concat_ws(" ", F.col("_c.0"), F.col("_c.1"), F.col("_c.2")).alias(
            "citation"
        ),
    )


# A case-name party: capitalized tokens (words or dotted initials like
# "K.S.") joined by optional lowercase connectors; every connector run
# must END in a capitalized token so the party cannot absorb a trailing
# "the"/"of" from the surrounding sentence.
_CAP = r"(?:[A-Z](?:\.[A-Z])*\.|[A-Z]\w*)"
_PARTY = rf"{_CAP}(?:(?:\s+(?:of|the|and))*\s+{_CAP})*"
CASE_RE = rf"({_PARTY})\s+(?:[Vv]s?\.?|versus)\s+({_PARTY})"
# sentence openers that greedy left-party matching absorbs ("In Roe v.
# Wade" -> petitioner "In Roe"); stripped post-extraction, the standard
# eyecite-style heuristic
_OPENERS = r"^(?:In|On|At|See|As|The)\s+"


def case_mentions(
    docs: DataFrame, doc_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """docs -> (doc_id, idx, petitioner, respondent, case_key): one row
    per ``X v. Y`` case-name mention in DOCUMENT ORDER (idx), the
    precedent-mention surface form the reference's PRECEDENT label marks
    (LegalNER labels, `/root/reference/legal_ner/` data config). The
    ``case_key`` is the canonical node id: lowercased, dots stripped,
    whitespace collapsed, parties joined by `` v `` — so "K.S. Puttaswamy
    v. Union of India" and "KS Puttaswamy vs Union of India" key the
    same precedent.

    Same scale shape as extract_citations: one regexp pass at the scan,
    classification codegen, no shuffle."""
    mention = F.posexplode(
        F.regexp_extract_all(F.col(text_col), F.lit(CASE_RE), F.lit(0))
    ).alias("idx", "_m")
    m = F.col("_m")
    pet = F.regexp_replace(F.regexp_extract(m, CASE_RE, 1), _OPENERS, "")
    resp = F.regexp_extract(m, CASE_RE, 2)

    def norm(c):
        return F.lower(
            F.regexp_replace(F.regexp_replace(c, r"\.", " "), r"\s+", " ")
        )

    key = F.concat(F.trim(norm(pet)), F.lit(" v "), F.trim(norm(resp)))
    return docs.select(F.col(doc_col).alias("doc_id"), mention).select(
        "doc_id",
        "idx",
        pet.alias("petitioner"),
        resp.alias("respondent"),
        key.alias("case_key"),
    )


# precedent-treatment verbs, the citator signal (followed/overruled/
# distinguished/... are the treatment classes legal citators publish)
_TREAT = r"(?i:overruled|followed|distinguished|relied\s+upon|referred\s+to|affirmed|reversed)"
TREAT_RX = rf"({_TREAT})\s+(?i:in|by)\s+({_PARTY})\s+(?:[Vv]s?\.?|versus)\s+({_PARTY})"


def case_treatments(
    docs: DataFrame, doc_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """docs -> (doc_id, idx, treatment, case_key): one row per
    treatment-verb-plus-case-name construction ("the ratio was followed
    in X v. Y") in document order. ``treatment`` is the lowercased head
    verb (followed/overruled/distinguished/relied/referred/affirmed/
    reversed); ``case_key`` uses the same canonicalization as
    :func:`case_mentions`, so treatment edges join the mention graph.

    Same scan-side shape as the other extractors: one regexp pass,
    codegen classification, zero shuffle."""
    mention = F.posexplode(
        F.regexp_extract_all(F.col(text_col), F.lit(TREAT_RX), F.lit(0))
    ).alias("idx", "_m")
    m = F.col("_m")
    treatment = F.regexp_extract(
        F.lower(F.regexp_extract(m, TREAT_RX, 1)), r"^(\w+)", 1
    )
    pet = F.regexp_extract(m, TREAT_RX, 2)
    resp = F.regexp_extract(m, TREAT_RX, 3)

    def norm(c):
        return F.trim(
            F.lower(
                F.regexp_replace(F.regexp_replace(c, r"\.", " "), r"\s+", " ")
            )
        )

    key = F.concat(norm(pet), F.lit(" v "), norm(resp))
    return docs.select(F.col(doc_col).alias("doc_id"), mention).select(
        "doc_id",
        "idx",
        treatment.alias("treatment"),
        key.alias("case_key"),
    )


def citation_authority(cites: DataFrame) -> DataFrame:
    """(doc_id, citation) -> (citation, n_citing_docs, auth_rank):
    distinct citing documents per citation, dense-ranked descending
    (rank ties broken only by count — equal-authority precedents share a
    rank, the convention citator services use)."""
    counts = (
        cites.select("doc_id", "citation")
        .distinct()
        .groupBy("citation")
        .agg(F.count(F.lit(1)).alias("n_citing_docs"))
    )
    # dense_rank over ALL citations would be a single-partition global
    # window — a serial stage at 10^9 distinct citations. But dense rank
    # by count is just the rank of the DISTINCT count value, and the
    # number of distinct count values is O(sqrt(total cites)) (counts
    # summing to N admit at most ~sqrt(2N) distinct values): rank that
    # tiny set, broadcast it back.
    w = Window.orderBy(F.desc("n_citing_docs"))
    value_ranks = (
        counts.select("n_citing_docs")
        .distinct()
        .withColumn("auth_rank", F.row_number().over(w))
    )
    return counts.join(F.broadcast(value_ranks), "n_citing_docs").select(
        "citation", "n_citing_docs", "auth_rank"
    )


def spc_weights(
    edges: DataFrame,
    rounds: int = 4,
    src: str = "src",
    dst: str = "dst",
    checkpoint: bool = True,
) -> DataFrame:
    """Search Path Count main-path analysis (Hummon & Doreian 1989;
    Batagelj 2003) over a citation DAG — WHICH citation edges carry the
    field's main line of development: SPC(u, v) = (# source-to-u paths)
    * (# v-to-sink paths) counts every source->sink path through the
    edge, and the max-SPC out-edge per node traces the main path.
    citation_authority ranks NODES by in-degree; SPC ranks EDGES by
    through-traffic — the difference between "much-cited case" and "the
    doctrinal chain".

    Both path-count relations are the bounded DP unroll (graph/paths.py
    discipline): np_0 = sinks at 1; np_{i+1}(v) = sum of np_i over
    out-neighbors (sinks stay 1) — exact once ``rounds`` >= the DAG
    height, a well-defined bounded-length path count at any rounds
    (cycles leak no infinities because rounds are fixed). nm mirrors it
    from the sources over reversed edges. Per round: one equi-join +
    one map-side-combinable sum; per-round localCheckpoint.

    Returns (src, dst, spc, is_main) with is_main marking each node's
    max-SPC out-edge (ties: all tied edges flagged — the deterministic
    union of main paths).
    """
    e = (
        edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )
    if checkpoint:
        e = e.localCheckpoint(eager=True)
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    sinks = nodes.join(
        e.select(F.col("src").alias("node")), "node", "left_anti"
    ).select("node", F.lit(1).cast("long").alias("c"))
    sources = nodes.join(
        e.select(F.col("dst").alias("node")), "node", "left_anti"
    ).select("node", F.lit(1).cast("long").alias("c"))

    def _counts(base: DataFrame, fwd: bool) -> DataFrame:
        cur = base
        join_col, out_col = ("dst", "src") if fwd else ("src", "dst")
        for _ in range(rounds):
            step = (
                e.join(cur, e[join_col] == cur.node)
                .groupBy(F.col(out_col).alias("node"))
                .agg(F.sum("c").alias("c"))
            )
            cur = base.unionByName(step)
            if checkpoint:
                cur = cur.localCheckpoint(eager=True)
        return cur

    np_rel = _counts(sinks, fwd=True).select(
        F.col("node").alias("dst"), F.col("c").alias("_cp")
    )
    nm_rel = _counts(sources, fwd=False).select(
        F.col("node").alias("src"), F.col("c").alias("_cm")
    )
    spc = (
        e.join(nm_rel, "src")
        .join(np_rel, "dst")
        .select("src", "dst", (F.col("_cm") * F.col("_cp")).alias("spc"))
    )
    from pyspark.sql import Window

    wmax = Window.partitionBy("src")
    return spc.select(
        "src",
        "dst",
        "spc",
        (F.col("spc") == F.max("spc").over(wmax)).alias("is_main"),
    )
