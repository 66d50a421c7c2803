"""Value checks for every query outside the 50-row driver registry:
nothing outside the registry may silently rot — every implemented query
keeps a per-round value gate (VERDICT r4 'What's missing' item 3),
covering ALL local extras (q01-q03 retirees + q64-q197).

Runs at sf0.001 so the whole file stays cheap; ``tools/check_oracle.py``
re-runs the same comparison at sf0.01 (187 queries total)."""

from __future__ import annotations

import math
import os

import duckdb
import pytest

SF_DIR = "/root/testdata/sf0.001"

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def _norm_cell(v):
    if isinstance(v, float):
        return "nan" if math.isnan(v) else round(v, 6)
    if hasattr(v, "isoformat"):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(_norm_cell(x) for x in v)
    return v


def _norm(cols, rows):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    normed = [tuple(_norm_cell(r[i]) for i in idx) for r in rows]
    return sorted(normed, key=lambda row: tuple((v is None, str(v)) for v in row))


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(SF_DIR, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    return con


EXTRA_NAMES = [
        "q01_pricing_summary",
        "q02_top_revenue_customers",
        "q03_largest_order_per_customer",
        "q64_substring_dedup",
        "q65_triangle_count",
        "q66_label_propagation",
        "q67_two_hop_motifs",
        "q68_session_windows",
        "q69_interval_join",
        "q70_scd2_history",
        "q71_corpus_cube",
        "q72_group_percentiles",
        "q73_event_pivot",
        "q74_moving_average",
        "q75_transitive_closure",
        "q76_bigram_lm",
        "q77_anchor_aliases",
        "q78_hits",
        "q79_citation_authority",
        "q80_functional_violations",
        "q81_predicate_stats",
        "q82_distant_supervision",
        "q83_cooccurrence_pmi",
        "q84_kg_snapshot_diff",
        "q85_mixture_weights",
        "q86_mixture_sample",
        "q87_robots_frontier",
        "q88_key_skew_profile",
        "q89_streaming_kg_upsert",
        "q90_truth_discovery",
        "q91_fact_validity",
        "q92_rdfs_entail",
        "q93_trustrank",
        "q94_kg_negatives",
        "q95_blocking_metrics",
        "q96_schema_induction",
        "q97_seed_hop_distance",
        "q98_redirect_resolution",
        "q99_boilerplate_strip",
        "q100_weighted_sample",
        "q101_snapshot_churn",
        "q102_zipf_fit",
        "q103_partition_quality",
        "q104_cross_source_dups",
        "q105_sitemap_parse",
        "q106_type_constraints",
        "q107_assortativity",
        "q108_k_core",
        "q109_cohen_kappa",
        "q110_burst_detection",
        "q111_shard_moves",
        "q112_rule_mining",
        "q113_lsh_plan",
        "q114_contract_report",
        "q115_sparql_bgp",
        "q116_politeness_schedule",
        "q117_ntriples_roundtrip",
        "q118_sparql_path",
        "q119_quantization",
        "q120_bitext_mining",
        "q121_bm25_topk",
        "q122_jsonld_triples",
        "q123_bowtie",
        "q124_transe_eval",
        "q125_cms_frequency",
        "q126_walk_corpus",
        "q127_adamic_adar",
        "q128_skipgram_pairs",
        "q129_allpairs_jaccard",
        "q130_cdx_index",
        "q131_webtable_facts",
        "q132_event_funnel",
        "q133_fellegi_sunter",
        "q134_recrawl_schedule",
        "q135_microdata",
        "q136_web_facts_union",
        "q137_kmv_ball",
        "q138_entity_disambig",
        "q139_crawl_budget",
        "q140_harmonic_centrality",
        "q141_incremental_cc",
        "q142_single_link",
        "q143_cocitation",
        "q144_url_templates",
        "q145_readability",
        "q146_hard_negatives",
        "q147_levenshtein_pairs",
        "q148_calibration",
        "q149_wl_colors",
        "q150_transition_matrix",
        "q151_sparql_path_forms",
        "q152_clustering_coefficient",
        "q153_hybrid_search",
        "q154_lsh_recall",
        "q155_cdc_chunks",
        "q156_mad_outliers",
        "q157_session_likelihood",
        "q158_missing_mass",
        "q159_log_odds",
        "q160_corpus_report_card",
        "q161_hearst_taxonomy",
        "q162_dsir_selection",
        "q163_bloom_semi_join",
        "q164_heading_outline",
        "q165_bootstrap_ci",
        "q166_pq_adc_topk",
        "q167_semdedup",
        "q168_mmr_rerank",
        "q169_ontology_align",
        "q170_quote_attribution",
        "q171_quote_coref",
        "q172_statute_citations",
        "q173_case_mentions",
        "q174_date_extraction",
        "q175_bench_composition",
        "q176_legal_facts",
        "q177_court_mentions",
        "q178_witness_refs",
        "q179_paragraph_segmentation",
        "q180_optimal_span_select",
        "q181_acronym_mining",
        "q182_case_treatments",
        "q183_doc_outcome",
        "q184_case_timeline",
        "q185_docket_refs",
        "q186_para_crossrefs",
        "q187_money_amounts",
        "q188_sentence_terms",
        "q189_org_mentions",
        "q190_legal_facts_extended",
        "q191_legal_facts_onepass",
        "q192_k_truss",
        "q193_feed_parse",
        "q194_canonical_collapse",
        "q195_metablocking",
        "q196_trending_entities",
        "q197_hreflang_reciprocal",
        "q198_metatags",
        "q199_entity_salience",
        "q200_rrf_fusion",
        "q201_feed_discovery",
        "q202_densest_subgraph",
        "q203_host_authority",
        "q204_butterflies",
        "q205_seed_distance",
        "q206_single_linkage",
        "q207_temporal_reach",
        "q208_k_wing",
        "q209_ndcg",
        "q210_corr_clustering",
        "q211_kneser_ney",
        "q212_winnowing",
        "q213_frequent_itemsets",
        "q214_allen_intervals",
        "q215_k_anonymity",
        "q216_label_noise",
        "q217_krippendorff",
        "q218_betweenness",
        "q219_rocchio_prf",
        "q220_ipf_raking",
        "q221_rake_keyphrases",
        "q222_cusum",
        "q223_spc_main_path",
        "q224_golden_record",
        "q225_ql_dirichlet",
        "q226_containment",
        "q227_set_cover",
        "q228_kaplan_meier",
        "q229_bipartiteness",
        "q230_skyline",
        "q231_benford",
        "q232_quantile_norm",
        "q233_attribution",
        "q234_seq_patterns",
        "q235_reid_risk",
        "q236_consensus",
        "q237_gini",
        "q238_scc",
        "q239_hll",
        "q240_pca",
        "q241_symspell",
        "q242_matching",
        "q243_plsa",
        "q244_sparql_optional",
        "q245_sorted_neighborhood",
        "q246_mann_whitney",
        "q247_katz",
        "q248_novelty",
        "q249_sameas_audit",
        "q250_inverse_rules",
        "q251_bpe_fertility",
        "q252_streaming_hll",
        "q253_knn_classify",
        "q254_homophily",
        "q255_dbscan",
        "q256_host_health",
        "q257_map_eval",
        "q258_audio_qa",
        "q259_opic",
        "q260_modularity",
        "q261_weighted_pagerank",
        "q262_personalized_pagerank",
        "q263_mis",
        "q264_simrank",
        "q265_ols",
        "q266_kendall",
        "q267_ks_test",
        "q268_textrank",
        "q269_copeland",
        "q270_louvain",
        "q271_image_dhash",
        "q272_reach_curve",
        "q273_soundex_blocks",
        "q274_bcubed",
        "q275_vocab_kl",
        "q276_rendezvous",
        "q277_lof",
        "q278_maxsim",
        "q279_stable_matching",
        "q280_jaro_winkler",
        "q281_chi_squared",
        "q282_hitting_probability",
        "q283_salsa",
        "q284_source_bandit",
        "q285_bradley_terry",
        "q286_geo_blocking",
        "q287_conformal",
        "q288_crawl_coverage",
        "q289_luhn_cards",
        "q290_dust_rules",
        "q291_ams_f2",
        "q292_disruption",
        "q293_fs_em",
        "q294_priority_sample",
        "q295_mann_kendall",
        "q296_roc_auc",
        "q297_naive_bayes",
        "q298_acf",
        "q299_voting_power",
        "q300_kmv_setops",
        "q301_bleu",
        "q302_milne_witten",
        "q303_gazetteer",
        "q304_rbo",
        "q305_heaps",
        "q306_texttiling",
        "q307_bigram_entropy",
        "q308_forecast_backtest",
        "q309_dyad_census",
        "q310_directed_triangles",
        "q311_adjusted_rand",
        "q312_robustness",
        "q313_good_turing",
        "q314_viterbi",
        "q315_rouge_l",
        "q316_bh_fdr",
        "q317_isotonic",
        "q318_chrf",
        "q319_lru_hit_curve",
        "q320_wer",
        "q321_misra_gries",
        "q322_mcnemar",
        "q323_cmh",
        "q324_llr_keywords",
        "q325_holm",
        "q326_fleiss",
        "q327_sprt",
        "q328_ring_assign",
        "q329_brier_decomp",
        "q330_spearman",
        "q331_nmi",
        "q332_fisher_exact",
        "q333_conductance",
        "q334_jsd",
        "q335_silhouette",
        "q336_wasserstein",
        "q337_kruskal_wallis",
        "q338_smith_waterman",
        "q339_cuped",
        "q340_friedman",
        "q341_log_rank",
        "q342_cochran_q",
        "q343_weighted_kappa",
        "q344_inequality",
        "q345_mahalanobis",
        "q346_dispersion",
        "q347_umass_coherence",
        "q348_theil_sen",
        "q349_runs_test",
]


def test_extras_list_is_complete():
    """Every extra_queries() entry must be in the parametrized gate —
    a new lane that forgets to register here would otherwise silently
    skip its per-round pytest value check."""
    import __spark_entry__ as entrymod

    assert set(EXTRA_NAMES) == set(entrymod.extra_queries())


@pytest.mark.parametrize("name", EXTRA_NAMES)
def test_retired_query_matches_oracle(spark, duck, name):
    import __spark_entry__ as entrymod

    sdf = entrymod.extra_queries()[name](spark, SF_DIR)
    srows, scols = sdf.collect(), sdf.columns
    cur = duck.execute(entrymod.extra_oracle_sql()[name])
    dcols = [d[0] for d in cur.description]
    drows = cur.fetchall()
    assert sorted(scols) == sorted(dcols)
    assert len(srows) == len(drows) and len(srows) > 0
    assert _norm(scols, [tuple(r) for r in srows]) == _norm(dcols, drows)
