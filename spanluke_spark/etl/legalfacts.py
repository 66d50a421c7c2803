"""Unified legal-fact extraction: run every legal surface lane — statute
citations, case-name precedents, Justice mentions, in-text dates, quote
attributions — over a judgment/page stream and emit ONE normalized
(doc_id, subj, pred, obj, lane) fact relation, the legal analogue of
etl/webfacts.py (which unions the three Web Data Commons markup lanes).

This is the KG-construction join point for the reference's LegalNER
label set (`/root/reference/legal_ner/` data config): STATUTE/PROVISION
become ``charged_under`` edges, PRECEDENT becomes ``cites_case``, JUDGE
becomes ``heard_by``, dates become ``dated`` validity anchors, and quote
attributions carry speaker-as-subject ``stated`` claims with the
document as provenance.

Scale shape: every lane is a pure-codegen scan-side extraction (see the
lane modules); the union is plan concatenation, not a shuffle, and the
only exchange in an extract->dedupe job is the closing ``distinct()``
on the already-tiny fact relation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dates import extract_dates
from .judges import judge_mentions
from .quotes import quote_attributions
from .statutes import statute_citations
from ..graph.citations import case_mentions

__all__ = ["legal_facts", "legal_facts_extended", "legal_facts_onepass"]


def legal_facts(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """-> (doc_id, subj, pred, obj, lane), distinct. The document node
    ``doc:<id>`` is the subject everywhere except the quote lane, where
    the SPEAKER is the subject (a quote is the speaker's claim; the
    doc_id column carries provenance)."""
    doc_node = F.concat(F.lit("doc:"), F.col(id_col).cast("string"))

    st = statute_citations(docs, text_col, id_col).select(
        F.col(id_col),
        doc_node.alias("subj"),
        F.lit("charged_under").alias("pred"),
        F.concat(
            F.col("statute"),
            F.when(F.col("kind") == "article", F.lit(" art.")).otherwise(
                F.lit(" s.")
            ),
            F.col("provision"),
        ).alias("obj"),
        F.lit("statute").alias("lane"),
    )
    # case_mentions fixes its id column name to "doc_id"; alias it back
    ca = case_mentions(docs, id_col, text_col).select(
        F.col("doc_id").alias(id_col),
        F.concat(F.lit("doc:"), F.col("doc_id").cast("string")).alias("subj"),
        F.lit("cites_case").alias("pred"),
        F.col("case_key").alias("obj"),
        F.lit("precedent").alias("lane"),
    )
    ju = judge_mentions(docs, text_col, id_col).select(
        F.col(id_col),
        doc_node.alias("subj"),
        F.lit("heard_by").alias("pred"),
        F.col("judge_key").alias("obj"),
        F.lit("bench").alias("lane"),
    )
    dt = (
        extract_dates(docs, text_col, id_col)
        .where(F.col("iso").isNotNull())
        .select(
            F.col(id_col),
            doc_node.alias("subj"),
            F.lit("dated").alias("pred"),
            F.col("iso").cast("string").alias("obj"),
            F.lit("date").alias("lane"),
        )
    )
    qu = quote_attributions(docs, text_col, id_col).select(
        F.col(id_col),
        F.col("speaker").alias("subj"),
        F.lit("stated").alias("pred"),
        F.col("quote").alias("obj"),
        F.lit("quote").alias("lane"),
    )
    out = st
    for lane in (ca, ju, dt, qu):
        out = out.unionByName(lane)
    return out.distinct()


def legal_facts_extended(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """The five core lanes plus the forum/docket/outcome/witness/org/
    penalty lanes — the full fact surface a judgment page yields:

      heard_in      canonical court key        (etl/courts.py)
      docketed_as   canonical docket key       (etl/dockets.py)
      disposed_as   operative outcome          (etl/outcomes.py, LAST rule)
      heard_witness pw/dw/cw + number          (etl/courts.py)
      mentions_org  canonical org key          (etl/orgs.py)
      sentenced_to  regime:months              (etl/money.py)
      awards        currency:amount            (etl/money.py)

    Same plan shape: every added lane is scan-side codegen; the outcome
    lane alone adds one keyed aggregate (its max_by reduction), and the
    closing distinct remains the union's only other shuffle."""
    from .courts import court_mentions, witness_refs
    from .dockets import docket_refs
    from .money import money_amounts, sentence_terms
    from .orgs import org_mentions
    from .outcomes import doc_outcome, outcome_mentions

    def lane(extracted: DataFrame, pred: str, obj, lane_name: str) -> DataFrame:
        return extracted.select(
            F.col(id_col),
            F.concat(F.lit("doc:"), F.col(id_col).cast("string")).alias("subj"),
            F.lit(pred).alias("pred"),
            obj.alias("obj"),
            F.lit(lane_name).alias("lane"),
        )

    co = lane(
        court_mentions(docs, text_col, id_col), "heard_in", F.col("court"), "court"
    )
    dk = lane(
        docket_refs(docs, text_col, id_col),
        "docketed_as",
        F.col("docket_key"),
        "docket",
    )
    oc = lane(
        doc_outcome(outcome_mentions(docs, text_col, id_col), id_col),
        "disposed_as",
        F.col("outcome"),
        "outcome",
    )
    wt = lane(
        witness_refs(docs, text_col, id_col),
        "heard_witness",
        F.concat_ws(":", F.col("side"), F.col("witness_no").cast("string")),
        "witness",
    )
    og = lane(
        org_mentions(docs, text_col, id_col),
        "mentions_org",
        F.col("org_key"),
        "org",
    )
    sn = lane(
        sentence_terms(docs, text_col, id_col),
        "sentenced_to",
        F.concat_ws(":", F.col("regime"), F.col("term_months").cast("string")),
        "penalty",
    )
    mo = lane(
        money_amounts(docs, text_col, id_col),
        "awards",
        F.concat_ws(
            ":",
            F.col("currency"),
            F.col("amount").cast("decimal(20,2)").cast("string"),
        ),
        "money",
    )

    out = legal_facts(docs, text_col, id_col)
    for extra in (co, dk, oc, wt, og, sn, mo):
        out = out.unionByName(extra)
    return out.distinct()


def legal_facts_onepass(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Output-identical to :func:`legal_facts_extended`, computed in ONE
    scan of the page table.

    The union formulation re-reads the text column once per lane — 12
    scans of a 100 TB table. Here every lane is an ARRAY TRANSFORM
    (``transform(regexp_extract_all(...), x -> struct(...))``) over the
    same row, the per-lane arrays concatenate, and a single explode
    yields the fact rows — so the plan is scan -> project -> generate ->
    distinct: one pass over the data, zero Python, and the distinct
    remains the only shuffle. The operative-outcome LAST rule needs no
    aggregate either: ``element_at(matches, -1)`` picks it inside the
    row (the union formulation spends a keyed max_by shuffle on this).
    """
    from ..graph import citations as _cit
    from . import courts as _courts
    from . import orgs as _orgs
    from .dates import _COMBINED as _DATE_COMBINED
    from .dates import snippet_iso
    from .dockets import DOCKET_RX
    from .judges import JUDGE_RX
    from .money import _UNIT_FACTOR, MONEY_RX, TERM_RX
    from .outcomes import OUTCOME_RX
    from .quotes import QUOTE_PATTERNS
    from .statutes import CITE_RX, NUM_RX, canonical_statute

    text = F.col(text_col)
    dn = F.concat(F.lit("doc:"), F.col(id_col).cast("string"))

    def fact(subj, pred: str, obj, lane_name: str):
        return F.struct(
            subj.alias("subj"),
            F.lit(pred).alias("pred"),
            obj.alias("obj"),
            F.lit(lane_name).alias("lane"),
        )

    def matches(rx: str):
        return F.regexp_extract_all(text, F.lit(rx), F.lit(0))

    def norm_key(c):
        return F.trim(
            F.lower(F.regexp_replace(F.regexp_replace(c, r"\.", " "), r"\s+", " "))
        )

    # statute: nested transform flattens the provision list per citation
    st = F.flatten(
        F.transform(
            matches(CITE_RX),
            lambda c: F.transform(
                F.regexp_extract_all(
                    F.regexp_extract(c, CITE_RX, 2), F.lit(NUM_RX), F.lit(0)
                ),
                lambda p: fact(
                    dn,
                    "charged_under",
                    F.concat(
                        canonical_statute(F.regexp_extract(c, CITE_RX, 3)),
                        F.when(
                            F.lower(F.regexp_extract(c, CITE_RX, 1)).startswith(
                                "art"
                            ),
                            F.lit(" art."),
                        ).otherwise(F.lit(" s.")),
                        p,
                    ),
                    "statute",
                ),
            ),
        )
    )
    ca = F.transform(
        matches(_cit.CASE_RE),
        lambda m: fact(
            dn,
            "cites_case",
            F.concat(
                norm_key(
                    F.regexp_replace(
                        F.regexp_extract(m, _cit.CASE_RE, 1), _cit._OPENERS, ""
                    )
                ),
                F.lit(" v "),
                norm_key(F.regexp_extract(m, _cit.CASE_RE, 2)),
            ),
            "precedent",
        ),
    )
    ju = F.transform(
        matches(JUDGE_RX),
        lambda m: fact(
            dn, "heard_by", norm_key(F.regexp_extract(m, JUDGE_RX, 1)), "bench"
        ),
    )
    dt = F.filter(
        F.transform(
            matches(_DATE_COMBINED),
            lambda m: fact(dn, "dated", snippet_iso(m).cast("string"), "date"),
        ),
        lambda s: s["obj"].isNotNull(),
    )

    def quote_part(m, which: str):
        out = F.lit(None).cast("string")
        for n, (rx, sg, qg) in reversed(QUOTE_PATTERNS.items()):
            hit = F.regexp_extract(m, rx, 0) != F.lit("")
            grp = sg if which == "speaker" else qg
            out = F.when(hit, F.regexp_extract(m, rx, grp)).otherwise(out)
        return out

    _QUOTE_COMBINED = "|".join(f"(?:{rx})" for rx, _, _ in QUOTE_PATTERNS.values())
    qu = F.filter(
        F.transform(
            matches(_QUOTE_COMBINED),
            lambda m: fact(
                quote_part(m, "speaker"),
                "stated",
                F.regexp_replace(quote_part(m, "quote"), r"[,.!?]+$", ""),
                "quote",
            ),
        ),
        lambda s: F.length(s["obj"]) > 0,
    )

    def court_key(m):
        g = lambda i: F.regexp_extract(m, _courts.COURT_RX, i)  # noqa: E731
        return (
            F.when(g(1) != "", F.lit("supreme court of india"))
            .when(g(2) != "", F.concat(F.lit("high court of "), F.lower(g(2))))
            .when(g(3) != "", F.lit("sessions court"))
            .when(
                g(4) != "", F.concat(F.lit("district court of "), F.lower(g(4)))
            )
            .otherwise(F.lit("district court"))
        )

    co = F.transform(
        matches(_courts.COURT_RX),
        lambda m: fact(dn, "heard_in", court_key(m), "court"),
    )

    def witness_obj(m):
        kind = F.upper(F.regexp_extract(m, _courts.WITNESS_RX, 1))
        side = (
            F.when(kind == "PW", F.lit("prosecution"))
            .when(kind == "DW", F.lit("defence"))
            .otherwise(F.lit("court"))
        )
        return F.concat_ws(
            ":",
            side,
            F.regexp_extract(m, _courts.WITNESS_RX, 2).cast("int").cast("string"),
        )

    wt = F.transform(
        matches(_courts.WITNESS_RX),
        lambda m: fact(dn, "heard_witness", witness_obj(m), "witness"),
    )
    dk = F.transform(
        matches(DOCKET_RX),
        lambda m: fact(
            dn,
            "docketed_as",
            F.concat_ws(
                ":",
                F.regexp_replace(
                    F.lower(F.regexp_extract(m, DOCKET_RX, 1)), r"[.\s()]+", ""
                ),
                F.regexp_extract(m, DOCKET_RX, 2),
                F.regexp_extract(m, DOCKET_RX, 3),
            ),
            "docket",
        ),
    )
    og = F.transform(
        matches(_orgs.ORG_RX),
        lambda m: fact(
            dn,
            "mentions_org",
            F.concat_ws(
                " ",
                norm_key(F.regexp_extract(m, _orgs.ORG_RX, 1)),
                _orgs._canon_suffix(F.regexp_extract(m, _orgs.ORG_RX, 2)),
            ),
            "org",
        ),
    )

    def money_obj(m):
        cur = F.upper(F.regexp_extract(m, MONEY_RX, 1))
        currency = F.when(cur.isin("$", "USD"), F.lit("USD")).otherwise(
            F.lit("INR")
        )
        base = F.regexp_replace(F.regexp_extract(m, MONEY_RX, 2), ",", "").cast(
            "double"
        )
        unit = F.lower(F.regexp_extract(m, MONEY_RX, 3))
        factor = F.lit(1.0)
        for u, f in _UNIT_FACTOR.items():
            factor = F.when(unit.startswith(u), F.lit(f)).otherwise(factor)
        return F.concat_ws(
            ":", currency, (base * factor).cast("decimal(20,2)").cast("string")
        )

    mo = F.transform(
        matches(MONEY_RX), lambda m: fact(dn, "awards", money_obj(m), "money")
    )

    def term_obj(m):
        count = F.regexp_extract(m, TERM_RX, 2).cast("int")
        unit = F.lower(F.regexp_extract(m, TERM_RX, 3))
        months = (
            F.when(unit.startswith("year"), count * 12)
            .when(unit.startswith("month"), count)
            .otherwise(F.floor(count / 30).cast("int"))
        )
        return F.concat_ws(
            ":",
            F.lower(F.regexp_extract(m, TERM_RX, 1)),
            months.cast("int").cast("string"),
        )

    pe = F.transform(
        matches(TERM_RX), lambda m: fact(dn, "sentenced_to", term_obj(m), "penalty")
    )

    # operative outcome: LAST disposition statement, inside the row
    # (slice(-1, 1) is empty on no matches, so no when/otherwise typing)
    oc = F.transform(
        F.slice(matches(OUTCOME_RX), -1, 1),
        lambda m: fact(
            dn,
            "disposed_as",
            F.regexp_replace(
                F.lower(F.regexp_extract(m, OUTCOME_RX, 2)), r"\s+", "_"
            ),
            "outcome",
        ),
    )

    all_facts = F.concat(st, ca, ju, dt, qu, co, wt, dk, og, mo, pe, oc)
    return (
        docs.select(F.col(id_col), F.explode(all_facts).alias("_f"))
        .select(id_col, "_f.subj", "_f.pred", "_f.obj", "_f.lane")
        .distinct()
    )
