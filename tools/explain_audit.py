"""Physical-plan audit: verify the plans are the plans we want at scale.

Checks (printed as PASS/FAIL lines):
  1. Parquet scan with filter -> PushedFilters non-empty + pruned ReadSchema.
  2. Alias link -> BroadcastHashJoin (no shuffle of the mention stream).
  3. Fused extraction -> exactly one Exchange (the explicit size-balancing
     repartition) before the Python stage, none after until the dedupe.
  4. q01 agg -> partial+final hash aggregate (map-side combine present).

Usage: python tools/explain_audit.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def main() -> None:
    from spanluke_spark.fixtures import PIPELINE_GAZETTEER, TOKEN_GAZETTEER
    from spanluke_spark.link.alias import link_mentions
    from spanluke_spark.pipeline import extract_mentions_token
    from spanluke_spark.session import get_spark

    sf_dir = os.environ.get("SF_DIR", "/root/testdata/sf0.01")
    spark = get_spark(app_name="explain_audit", master="local[4]", shuffle_partitions=8)
    failures = 0

    def check(name: str, ok: bool, detail: str = "") -> None:
        nonlocal failures
        print(f"{'PASS' if ok else 'FAIL'} {name} {detail}")
        failures += 0 if ok else 1

    # 1. pushdown + column pruning
    li = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))
    plan = (
        li.filter(F.col("l_shipdate") <= "1998-09-02")
        .select("l_returnflag", "l_quantity")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    check(
        "scan_pushdown",
        "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan,
    )
    check(
        "column_pruning",
        "l_extendedprice" not in plan.split("ReadSchema")[-1],
        "(ReadSchema carries only selected+filter columns)",
    )

    # 2. broadcast link join
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    mentions = extract_mentions_token(docs, ["doc_id"], TOKEN_GAZETTEER)
    alias_df = spark.createDataFrame(
        [("spark", 1, "Apache Spark", "ORG", 0.9)],
        "alias string, canonical_id long, canonical_name string, entity_type string, prior double",
    )
    linked_plan = link_mentions(mentions, alias_df)._jdf.queryExecution().executedPlan().toString()
    check("broadcast_link_join", "BroadcastHashJoin" in linked_plan)
    check(
        "no_mention_shuffle_for_link",
        "Exchange hashpartitioning" not in linked_plan.split("BroadcastHashJoin")[0],
        "(no hash exchange above the join)",
    )

    # 3. fused extraction plan shape
    from spanluke_spark.etl.pages import synthesize_pages
    from spanluke_spark.pipeline import extract_mentions_from_pages

    pages = synthesize_pages(docs)
    m = extract_mentions_from_pages(pages, ["url"], PIPELINE_GAZETTEER, parallelism=8)
    mplan = m._jdf.queryExecution().executedPlan().toString()
    check(
        "one_python_stage",
        mplan.count("MapInPandas") == 1 and mplan.count("ArrowEvalPython") == 0,
    )
    check("explicit_repartition", mplan.count("Exchange") == 1)

    # 3b. canonicalization: no single-partition Exchange (the old global
    # Window dense_rank forced every entity key through ONE task)
    from spanluke_spark.canon.canonicalize import canonicalize_entities

    trip = spark.createDataFrame(
        [(f"surf:entity {i}",) for i in range(50)] + [("ent:1",), ("ent:2",)],
        "subj string",
    )
    cplan = canonicalize_entities(trip)._jdf.queryExecution().executedPlan().toString()
    check(
        "canonicalize_no_global_window",
        "Exchange SinglePartition" not in cplan and "dense_rank" not in cplan,
        "(entity ids via xxhash64, fully partition-parallel)",
    )

    # 4. partial aggregation
    q1 = (
        li.groupBy("l_returnflag")
        .agg(F.sum("l_quantity").alias("s"))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    check("partial_agg", "partial_sum" in q1 or "HashAggregate(keys=[l_returnflag" in q1)

    # 5. curation ops stay shuffle-free / Python-free where promised
    from spanluke_spark.textops.pii import redact_pii
    from spanluke_spark.textops.quality import repetition_features
    from spanluke_spark.textops.sampling import stratified_sample

    rplan = repetition_features(docs)._jdf.queryExecution().executedPlan().toString()
    check(
        "repetition_no_shuffle_no_python",
        "Exchange" not in rplan and "Python" not in rplan,
        "(HOF aggregate per row, single scan-project)",
    )
    pplan = redact_pii(docs)._jdf.queryExecution().executedPlan().toString()
    check("pii_no_shuffle_no_python", "Exchange" not in pplan and "Python" not in pplan)
    splan = (
        stratified_sample(docs, {"en": 0.5})
        .select("doc_id")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    check(
        "sample_is_scan_filter",
        "Exchange" not in splan and "Python" not in splan,
        "(deterministic hash filter fused into the scan stage)",
    )

    # 12. real-BPE token counting: exactly one Arrow Python stage fused onto
    # the scan, zero shuffles before the per-doc count exists
    from spanluke_spark.etl.bpe import bpe_token_count

    bplan = (
        bpe_token_count(docs.select("lang", "text"))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    check(
        "bpe_count_single_python_stage",
        bplan.count("ArrowEvalPython") == 1 and "Exchange" not in bplan,
        "(vectorized pandas UDF on the scan, shuffle-free)",
    )

    # 13. LSH band join shuffles ids only — never n_bands copies of the
    # embedding vectors (forced to shuffle-join so the exchange is visible)
    from spanluke_spark.link.ann import lsh_threshold_pairs

    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    prev_thr = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        lplan = (
            lsh_threshold_pairs(emb, threshold=0.9)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev_thr)
    # the exchange's payload is EXACTLY its immediate child Project's output
    # list (the line right below it) — deeper lines legitimately reference
    # the embedding column to COMPUTE the bands, so only line 1 is checked.
    # Negative control: the vector-carrying formulation puts _av/_an in that
    # Project and fails this predicate.
    band_exchanges = [
        seg for seg in lplan.split("Exchange hashpartitioning(")[1:] if seg.startswith("band")
    ]
    def _child_ok(seg: str) -> bool:
        child = seg.split("\n")[1] if "\n" in seg else ""
        return (
            "Project" in child
            and "_av" not in child and "_bv" not in child and "embedding" not in child
        )

    check(
        "lsh_band_join_ids_only",
        bool(band_exchanges) and all(_child_ok(seg) for seg in band_exchanges),
        "(band exchange carries (id, band, bucket); vectors re-join on the pair set)",
    )

    # 14. RDFS entailment: the ontology closures broadcast onto the
    # instance triples — a 10^12-row table must never sort-merge against
    # a 10^2-row hierarchy
    from spanluke_spark.graph.entailment import rdfs_entail

    onto = spark.createDataFrame(
        [
            ("court", "subclass_of", "authority"),
            ("decided_by", "subproperty_of", "involves"),
            ("decided_by", "domain", "case"),
            ("decided_by", "range", "court"),
        ],
        "subj string, pred string, obj string",
    )
    inst = docs.select(
        F.concat(F.lit("i"), F.col("doc_id")).alias("subj"),
        F.lit("decided_by").alias("pred"),
        F.concat(F.lit("j"), F.col("doc_id")).alias("obj"),
    )
    eplan = (
        rdfs_entail(inst, onto)._jdf.queryExecution().executedPlan().toString()
    )
    check(
        "entailment_broadcasts_ontology",
        "BroadcastHashJoin" in eplan and "SortMergeJoin" not in eplan,
        "(hierarchy closures broadcast; instance stream shuffles only at distinct)",
    )

    # 15. truth discovery: the per-fact belief normalization is agg+join,
    # never a window over the claim stream (a hot fact with 10^7
    # asserting pages would serialize through one window task)
    from spanluke_spark.graph.truth import truth_discovery

    claims = docs.select(
        F.concat(F.lit("h"), F.col("doc_id") % 7).alias("source"),
        F.concat(F.lit("e"), F.col("doc_id") % 25).alias("subj"),
        F.lit("p").alias("pred"),
        F.concat(F.lit("v"), (F.col("doc_id") * 3) % 4).alias("obj"),
    )
    tfacts, _ = truth_discovery(claims, rounds=1)
    tplan = tfacts._jdf.queryExecution().executedPlan().toString()
    check(
        "truth_discovery_no_window",
        "Window" not in tplan and "Exchange SinglePartition" not in tplan,
        "(belief normalize = two hash aggs + equi-join)",
    )

    # 16. validity intervals: window partitioned by the fact key (bounded
    # by re-crawl count), never a single global sort
    from spanluke_spark.graph.snapshot import validity_intervals

    obs = docs.select(
        F.concat(F.lit("s"), F.col("doc_id") % 60).alias("subj"),
        F.lit("p").alias("pred"),
        F.concat(F.lit("o"), F.col("doc_id") % 3).alias("obj"),
        F.col("doc_id").alias("warc_ts"),
    )
    vplan = (
        validity_intervals(obs)._jdf.queryExecution().executedPlan().toString()
    )
    check(
        "validity_window_is_keyed",
        "Exchange SinglePartition" not in vplan
        and "Exchange hashpartitioning(subj" in vplan,
        "(islands window keyed on (subj, pred))",
    )

    # 17. weighted sampling: the per-group top-k must run as a
    # WindowGroupLimit pair (Partial below the shuffle, Final above) so
    # each task forwards at most k rows per group — not the corpus
    from spanluke_spark.textops.sampling import weighted_sample_per_group

    wplan = (
        weighted_sample_per_group(docs, 20, "n_chars")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    check(
        "weighted_sample_partial_topk",
        "WindowGroupLimit" in wplan and "Partial" in wplan,
        "(rank filter pushed below the exchange)",
    )

    # 18. BM25: query-term and df joins broadcast (the postings side never
    # shuffles for them); per-query top-k is a WindowGroupLimit partial
    from spanluke_spark.textops.bm25 import bm25_topk

    queries = spark.createDataFrame(
        [(1, "hash join"), (2, "stream window")], "query_id int, query_text string"
    )
    bplan = (
        bm25_topk(docs, queries, topk=10)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    check(
        "bm25_broadcast_and_partial_topk",
        bplan.count("BroadcastHashJoin") >= 2
        and "SortMergeJoin" not in bplan
        and "WindowGroupLimit" in bplan,
    )

    # 19. JSON-LD extraction: pure codegen projection — zero Python, zero
    # Exchange before the caller's dedupe
    from spanluke_spark.etl.jsonld import jsonld_triples

    pages = docs.select(
        F.concat(F.lit("https://ex.org/d"), F.col("doc_id")).alias("url"),
        F.concat(
            F.lit('<script type="application/ld+json">{"@id":"e'),
            F.col("doc_id") % 7,
            F.lit('","name":"x"}</script>'),
        ).alias("html"),
    )
    jplan = jsonld_triples(pages)._jdf.queryExecution().executedPlan().toString()
    check(
        "jsonld_no_shuffle_no_python",
        "Exchange" not in jplan and "Python" not in jplan,
    )

    # 20. all-pairs prefix filter: the prefix window is keyed per doc
    # (never a single global sort) and no cartesian product anywhere
    from spanluke_spark.textops.allpairs import allpairs_jaccard, doc_term_sets

    aplan = (
        allpairs_jaccard(doc_term_sets(docs), 3, 5)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    check(
        "allpairs_keyed_window_no_cartesian",
        "Exchange hashpartitioning(doc_id" in aplan
        and "Exchange SinglePartition" not in aplan
        and "CartesianProduct" not in aplan,
    )

    # 21. TransE candidates: the test side rides in as a broadcast nested
    # loop; the entity table is never shuffled for candidate generation
    from spanluke_spark.graph.kge_eval import transe_filtered_ranks

    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    entities = emb.select(
        F.col("vec_id").alias("entity_id"), F.col("embedding").alias("vec")
    )
    relations = emb.where(F.col("vec_id") < 2).select(
        F.concat(F.lit("r"), F.col("vec_id")).alias("rel"),
        F.col("embedding").alias("vec"),
    )
    test = spark.createDataFrame([(0, "r0", 1)], "s long, rel string, o long")
    kplan = (
        transe_filtered_ranks(entities, relations, test, test)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    check("transe_candidates_broadcast", "BroadcastNestedLoopJoin" in kplan)

    # 22. CDX derivation: shuffle-free pure projection
    from spanluke_spark.etl.cdx import build_cdx

    cpages = docs.select(
        F.concat(F.lit("https://ex.org/"), F.col("doc_id")).alias("url"),
        F.col("doc_id").alias("warc_ts"),
        F.col("text").alias("html"),
    )
    cplan = build_cdx(cpages)._jdf.queryExecution().executedPlan().toString()
    check("cdx_no_shuffle", "Exchange" not in cplan and "Python" not in cplan)

    # 23. legal extraction lanes (quotes/statutes/cases/judges/dates/
    # courts/outcomes): every lane is scan-side codegen — no Exchange,
    # no Python stage; the generate+project pipeline dies at the scan
    from spanluke_spark.etl.courts import court_mentions, witness_refs
    from spanluke_spark.etl.dates import extract_dates
    from spanluke_spark.etl.judges import judge_mentions
    from spanluke_spark.etl.outcomes import outcome_mentions
    from spanluke_spark.etl.quotes import quote_attributions
    from spanluke_spark.etl.statutes import statute_citations
    from spanluke_spark.graph.citations import case_mentions, case_treatments

    for lane_name, lane in [
        ("quotes", quote_attributions),
        ("statutes", statute_citations),
        ("cases", lambda d: case_mentions(d)),
        ("treatments", lambda d: case_treatments(d)),
        ("judges", judge_mentions),
        ("dates", extract_dates),
        ("courts", court_mentions),
        ("witnesses", witness_refs),
        ("outcomes", outcome_mentions),
    ]:
        lplan = lane(docs)._jdf.queryExecution().executedPlan().toString()
        check(
            f"legal_lane_scan_side[{lane_name}]",
            "Exchange" not in lplan and "Python" not in lplan,
        )

    # 24. unified legal facts: the five-lane union is plan concatenation;
    # the ONLY exchange is the closing distinct's hash aggregation
    from spanluke_spark.etl.legalfacts import legal_facts

    fplan = legal_facts(docs)._jdf.queryExecution().executedPlan().toString()
    check(
        "legal_facts_single_exchange",
        fplan.count("Exchange hashpartitioning") <= 2  # partial/final agg pair
        and "Exchange SinglePartition" not in fplan
        and "Python" not in fplan,
        "(union concatenates; distinct is the only shuffle)",
    )

    # 25. pronoun coref: exactly one keyed window exchange per document id
    from spanluke_spark.etl.quotes import (
        quote_attributions_ordered,
        resolve_pronoun_speakers,
    )

    qplan = (
        resolve_pronoun_speakers(quote_attributions_ordered(docs))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    check(
        "coref_one_keyed_window",
        qplan.count("Exchange") == 1
        and "Exchange hashpartitioning(doc_id" in qplan,
    )

    # 26. one-pass fact extraction: ONE parquet scan (vs 14 in the union
    # formulation), no join, and the distinct is the only exchange
    from spanluke_spark.etl.legalfacts import legal_facts_onepass

    oplan = (
        legal_facts_onepass(docs)._jdf.queryExecution().executedPlan().toString()
    )
    check(
        "legal_facts_onepass_single_scan",
        oplan.count("Scan parquet") == 1
        and oplan.count("Exchange") == 1
        and "Join" not in oplan
        and "Python" not in oplan,
        "(scan -> project -> generate -> distinct)",
    )

    # 27. feed parsing: scan-side codegen — one generate (entry explode),
    # zero shuffles, zero Python; 10^8 feeds parallelize as input splits
    from spanluke_spark.etl.feeds import parse_feeds

    feeds_df = spark.createDataFrame(
        [("u", "<rss><channel><item><guid>g</guid></item></channel></rss>")],
        "url string, xml string",
    )
    fplan = parse_feeds(feeds_df)._jdf.queryExecution().executedPlan().toString()
    check(
        "feeds_no_shuffle_no_python",
        "Exchange" not in fplan and "Python" not in fplan
        and "Generate" in fplan,
    )

    # 28. canonical extraction: pure codegen projection; the full
    # canonicalize composes ONE left equi-join against the (tiny)
    # resolved-redirect map — the page side never shuffles for it
    from spanluke_spark.etl.canonical import canonicalize_urls, extract_canonical

    pages_df = spark.createDataFrame(
        [("https://a/p", '<link rel="canonical" href="https://a/c">')],
        "url string, html string",
    )
    explan = (
        extract_canonical(pages_df)._jdf.queryExecution().executedPlan().toString()
    )
    check(
        "canonical_extract_no_shuffle_no_python",
        "Exchange" not in explan and "Python" not in explan,
    )

    # 29. meta-blocking: every join is an equi-join on (token)/(id) —
    # no all-pairs stage (nested-loop/cartesian) anywhere in the plan
    from spanluke_spark.link.metablocking import metablock_pairs

    ents_df = docs.select(
        F.col("doc_id").alias("id"),
        F.concat(F.lit("e"), (F.col("doc_id") % 25).cast("string")).alias("name"),
    )
    mbplan = (
        metablock_pairs(ents_df)._jdf.queryExecution().executedPlan().toString()
    )
    check(
        "metablocking_equi_joins_only",
        "NestedLoop" not in mbplan and "Cartesian" not in mbplan
        and "Python" not in mbplan,
    )

    # 30. trending sliding windows: partial+final hash aggregate around a
    # single (window, entity) exchange; window fan-out is a generator,
    # not a join; no Python anywhere
    from spanluke_spark.streaming.stream import sliding_entity_counts

    ev_df = spark.read.parquet(os.path.join(sf_dir, "events.parquet")).select(
        "ts", F.col("event_type").alias("entity")
    )
    tplan = (
        sliding_entity_counts(ev_df)._jdf.queryExecution().executedPlan().toString()
    )
    check(
        "trending_partial_agg_single_exchange",
        tplan.count("Exchange") == 1 and "Join" not in tplan
        and "Python" not in tplan,
    )

    # 31. hreflang reciprocity: ONE left-semi equi-join on the reversed
    # key — no nested-loop/cartesian, no Python
    from spanluke_spark.etl.hreflang import reciprocal_alternates

    hpages = spark.createDataFrame(
        [("u", '<link rel="alternate" hreflang="de" href="v"/>')],
        "url string, html string",
    )
    hplan = (
        reciprocal_alternates(hpages)._jdf.queryExecution().executedPlan().toString()
    )
    check(
        "hreflang_semi_equi_join_only",
        "NestedLoop" not in hplan and "Cartesian" not in hplan
        and "Python" not in hplan and "LeftSemi" in hplan,
    )

    # 32. metatags: scan-side codegen projection — zero shuffles, zero
    # Python (the whole metadata bundle is one pass over the html bytes)
    from spanluke_spark.etl.metatags import extract_metatags

    mtplan = (
        extract_metatags(hpages)._jdf.queryExecution().executedPlan().toString()
    )
    check(
        "metatags_no_shuffle_no_python",
        "Exchange" not in mtplan and "Python" not in mtplan,
    )

    # 33. entity salience: one (doc, entity) hash aggregate, one equi-join
    # back to docs, one keyed window — and nothing else
    from spanluke_spark.link.salience import entity_salience

    sm = spark.createDataFrame([(1, "e", 0)], "doc_id long, entity string, start long")
    sd = spark.createDataFrame([(1, 10, "t")], "doc_id long, n_chars long, title string")
    splan = (
        entity_salience(sm, sd)._jdf.queryExecution().executedPlan().toString()
    )
    check(
        "salience_keyed_agg_join_window",
        "NestedLoop" not in splan and "Cartesian" not in splan
        and "Python" not in splan and "Window" in splan,
    )

    # 34. butterfly counting: pair co-degrees are equi-join + hash
    # aggregates only — no all-pairs stage, no window, no Python
    from spanluke_spark.graph.bipartite import butterfly_counts

    be = spark.createDataFrame([("l1", "r1")], "left string, right string")
    bplan = (
        butterfly_counts(be)._jdf.queryExecution().executedPlan().toString()
    )
    check(
        "butterfly_equijoin_hashagg_only",
        "NestedLoop" not in bplan and "Cartesian" not in bplan
        and "Python" not in bplan and "Window" not in bplan
        and "HashAggregate" in bplan,
    )

    # 35. bounded Bellman-Ford (checkpoint=False keeps all rounds in ONE
    # lazy plan): per round an equi-join + a partial/final min aggregate —
    # map-side combine present, nothing quadratic, nothing Python
    from spanluke_spark.graph.paths import sssp as _sssp

    pe = spark.createDataFrame([(1, 2, 1.0)], "src long, dst long, w double")
    ps = spark.createDataFrame([(1,)], "node long")
    pplan = (
        _sssp(pe, ps, rounds=3, weight="w", checkpoint=False)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    check(
        "sssp_equijoin_partial_min",
        "NestedLoop" not in pplan and "Cartesian" not in pplan
        and "Python" not in pplan and "partial_min" in pplan,
    )

    # 36. Boruvka per-component edge pick: min(struct) must keep its
    # map-side partial combine (partial_min) even though struct buffers
    # force the sort-based aggregate — reduce input stays capped at
    # #map-partitions rows per component
    me = spark.createDataFrame(
        [(1, 2, 1.0, 10, 20)], "a long, b long, w double, ca long, cb long"
    )
    cand = me.select(
        F.col("ca").alias("owner"), F.struct("w", "a", "b", "ca", "cb").alias("pick")
    )
    mplan = (
        cand.groupBy("owner")
        .agg(F.min("pick").alias("p"))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    check(
        "boruvka_pick_partial_combine",
        "partial_min" in mplan and "Window" not in mplan,
    )

    # 37. winnowing (q212): the only Exchange is the final fingerprint
    # dedup keyed on (id, pos, fp) — document TEXT never shuffles (the
    # grams/windows/argmin all run inside the row as array HOFs)
    import re as _re

    from spanluke_spark.dedup.winnow import winnow_fingerprints

    wdf = spark.createDataFrame(
        [(0, "abcdefghijklmno")], "doc_id long, text string"
    )
    wplan = (
        winnow_fingerprints(wdf)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    wkeys = _re.findall(r"Exchange hashpartitioning\(([^)]*)\)", wplan)
    check(
        "winnow_text_never_shuffles",
        len(wkeys) == 1 and "fp" in wkeys[0] and "text" not in wkeys[0],
        f"(exchange keys: {wkeys})",
    )

    # 38. confident joint (q216): the per-class thresholds ride in via
    # BroadcastExchange; the probability vectors never key a shuffle
    from spanluke_spark.evaluation.noise import confident_joint

    ndf = spark.createDataFrame(
        [(0, [0.5, 0.5])], "noisy_label long, probs array<double>"
    )
    nplan = (
        confident_joint(ndf)._jdf.queryExecution().executedPlan().toString()
    )
    nkeys = " ".join(
        _re.findall(r"Exchange hashpartitioning\(([^)]*)\)", nplan)
    )
    check(
        "confident_joint_thresholds_broadcast",
        "BroadcastExchange" in nplan and "probs" not in nkeys,
    )

    # 39. Rocchio PRF (q219): every postings-side join is a broadcast
    # hash join — the corpus-scale inverted index never sort-merge joins
    from spanluke_spark.textops.prf import prf_search

    pdocs = spark.createDataFrame(
        [(0, "alpha beta"), (1, "beta gamma")], "doc_id long, text string"
    )
    pq = spark.createDataFrame(
        [(1, "alpha")], "query_id int, query_text string"
    )
    pplan = (
        prf_search(pdocs, pq, topk=3, n_fb=1, n_exp=1)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    check("prf_postings_broadcast_only", "SortMergeJoin" not in pplan)

    # 40. betweenness (q218) forward round: the sigma sum keeps its
    # map-side partial combine, so hub frontiers cannot flood one task
    fr = spark.createDataFrame(
        [(1, 2, 1.0)], "source long, node long, sigma double"
    )
    be = spark.createDataFrame([(2, 3)], "src long, dst long")
    bplan = (
        fr.join(be, fr.node == be.src)
        .groupBy("source", "dst")
        .agg(F.sum("sigma").alias("sigma"))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    check("betweenness_sigma_partial_combine", "partial_sum" in bplan)

    # 41. pivot clustering (q210) neighbor-min: min(struct) keeps the
    # partial combine (the cc.py skew argument applies verbatim)
    pe = spark.createDataFrame([(1, 2, 5)], "u long, v long, pv long")
    pplan2 = (
        pe.groupBy("u")
        .agg(F.min(F.struct("pv", "v")).alias("mn"))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    check("pivot_nbrmin_partial_combine", "partial_min" in pplan2)

    # 42. Kneser-Ney (q211): with broadcast_model=True the three model
    # tables attach without any sort-merge join on the token stream
    from spanluke_spark.textops.lm_score import kneser_ney_scores

    kdf = spark.createDataFrame(
        [(0, "a b a c"), (1, "b c")], "doc_id long, text string"
    )
    kplan2 = (
        kneser_ney_scores(kdf)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    check("kneser_ney_model_broadcast", "SortMergeJoin" not in kplan2)

    # 43. golden records (q224): every per-attribute min(struct) keeps
    # its map-side partial combine — one cluster-keyed aggregate total
    from spanluke_spark.canon.golden import golden_records

    gdf = spark.createDataFrame(
        [(1, 1, 1, "a", "b")],
        "cluster long, priority long, recency long, name string, country string",
    )
    gplan = (
        golden_records(gdf, ["name", "country"])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    check(
        "golden_record_partial_combine",
        "partial_min" in gplan and "Window" not in gplan
        and "Join" not in gplan,
    )

    # 44. CUSUM (q222, fixed-target mode): both stacked windows share
    # ONE key partitioning — exactly one Exchange in the whole plan
    from spanluke_spark.etl.bursts import cusum_changepoints

    cdf = spark.createDataFrame(
        [("h", 0, 1.0)], "key string, t long, x double"
    )
    cplan2 = (
        cusum_changepoints(cdf, target=0.0)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    check("cusum_single_shuffle", cplan2.count("Exchange hashpartitioning") == 1)

    # 45. SPC (q223) per-round path-count step: equi-join + partial_sum
    spc_np = spark.createDataFrame([(1, 1)], "node long, c long")
    spc_e = spark.createDataFrame([(0, 1)], "src long, dst long")
    splan = (
        spc_e.join(spc_np, spc_e.dst == spc_np.node)
        .groupBy("src")
        .agg(F.sum("c").alias("c"))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    check("spc_round_partial_combine", "partial_sum" in splan)

    # 46. Dirichlet QL (q225): model tables (qterms, cf, ctot) attach
    # broadcast; at most the tf candidate-matrix join may shuffle
    from spanluke_spark.textops.bm25 import ql_dirichlet_topk

    qldocs = spark.createDataFrame(
        [(0, "alpha beta"), (1, "beta gamma")], "doc_id long, text string"
    )
    qlq = spark.createDataFrame(
        [(1, "alpha")], "query_id int, query_text string"
    )
    qlplan = (
        ql_dirichlet_topk(qldocs, qlq, topk=3)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    check(
        "ql_model_broadcast",
        "BroadcastExchange" in qlplan
        and qlplan.count("SortMergeJoin") <= 1,
    )

    spark.stop()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
