"""Corpus-wide physical-plan hygiene: every declared query's plan is
built and screened for the anti-patterns that kill 100 TB runs.

- ``CartesianProduct`` (non-broadcast cross product): allowed only for
  queries that DECLARE a cross join.
- ``BatchEvalPython`` (row-at-a-time Python UDF): allowed only for the
  documented API-parity demo / Python UDTF queries — everything else
  must stay JVM-side or Arrow-batched (``ArrowEvalPython`` /
  ``MapInPandas`` / ``FlatMapGroupsInPandas`` are fine).
- exact ``percentile``/``median`` AGGREGATES: their final merge builds
  a value->count map of every distinct input value on ONE reducer
  (measured: 9.2 s over 2.9M distinct doubles) — allowed only where
  the input's distinct-value count is structurally bounded (calendar
  days, a bounded integer domain, per-entity groups); everything else
  must use ``operators.exact_quantiles`` (two-pass range-partitioned
  rank) or ``approx_percentile`` with a declared tolerance.

Building a plan is cheap (no execution) except for the iterative
queries, which run their loops eagerly — they are exempted here and
covered by their own tests/oracles.
"""

from __future__ import annotations

import contextlib
import io as _io
import re

from gcp_etl_spark.queries import load_all
from tests.conftest import SF_SMALL

# queries whose BUILD executes jobs (iterative localCheckpoint loops,
# pipeline side effects) — plan hygiene for these is asserted by their
# dedicated tests; skipping keeps this sweep cheap
_EAGER_BUILD = {
    "dedup_clusters",
    "dedup_cluster_exact",
    "dedup_semantic",  # connected-components loop (localCheckpoint)
    "graph_pagerank",
    "ref_pipeline_e2e",
    "catalog_insert_overwrite",
    "join_bucketed_smb",
    "ann_cosine_topk_ivf",  # KMeans fit on a bounded sample at build
    "embedding_pca_project",  # driver-side eigensolve on bounded cov at build
    # r6 iterative trainers: GD / merge-learning loops run eagerly at
    # build (bounded driver state); pinned by tests/test_r6.py
    "train_quality_logreg",
    "quality_calibration_bins",
    "bpe_train_merges",
    "ann_ivf_pq_rerank",  # IVF/PQ quantizer fits on bounded samples
    "ann_ivf_partitioned_probe",  # index write + quantizer fit at build
    # r10 iterative trainers: distributed Lloyd / EM loops run eagerly
    # at build (bounded driver state); pinned by tests/test_r10.py
    "train_kmeans_lloyd",
    "ann_cosine_topk_ivf_refined",
    "train_unigram_lm",
    "unigram_fertility_roundtrip",
    "io_merge_schema_evolution",  # managed-store MERGE writes at build
}

# declared cross joins — CartesianProduct is the point
_CROSS_OK = {"join_cross"}

# matches the exact percentile/median aggregates in formatted plans but
# NOT percentile_approx/approx_percentile/percentile_disc
_EXACT_PCT = re.compile(r"(?<![\w.])(?:percentile|median)\(")

# the deliberate row-at-a-time anti-pattern demo and Python UDTFs
_PY_ROW_OK = {
    "udf_python_row",
    "udtf_split_sentences",
    # declared-API demo of the Spark 4 polymorphic (analyze()) UDTF —
    # row-Python by the API's nature, same policy as its siblings
    "udtf_polymorphic_analyze",
}

# exact percentile/median aggregates whose input distinct-value count
# is STRUCTURALLY bounded — the single-reducer value map stays small at
# any corpus size. Every other query must use operators.exact_quantiles
# (r4 verdict ask #1).
_EXACT_PCT_OK = {
    # calendar-bounded inputs (distinct values = days of history)
    "analytics_theil_sen",    # intercept median over the daily relation
    "analytics_runs_test",    # median of daily sums
    "dq_value_drift_psi",     # median-DATE split (decile edges use exact_quantiles)
    "part_brand_share_shift", # median-shipdate split
    # bounded integer domain (l_quantity ∈ 1..50 — ≤50 map entries/group)
    "agg_median",
    # per-entity groups: unbounded GROUP count, bounded values PER group
    # (each customer's own order gaps) — percentile is the right tool here
    "orders_reorder_interval",
    "customers_overdue_alert",
}


def test_no_cartesian_or_python_row_in_declared_plans(spark):
    # pin the 100 TB-regime plans: exact_quantiles' adaptive gate would
    # pick the percentile AGGREGATE at this fixture scale (correctly —
    # the inputs are tiny), but this sweep exists to screen the plans
    # the same queries produce when the gate says "unbounded", so force
    # the rank path module-wide for the build
    import gcp_etl_spark.operators.quantiles as Q

    specs = load_all()
    offenders: list[str] = []
    old_force = Q.FORCE_STRATEGY
    Q.FORCE_STRATEGY = "rank"
    try:
        _sweep(spark, specs, offenders)
    finally:
        Q.FORCE_STRATEGY = old_force
    assert not offenders, "\n".join(offenders)


def _sweep(spark, specs, offenders):
    for name, spec in sorted(specs.items()):
        if name in _EAGER_BUILD:
            continue
        try:
            df = spec.fn(spark, SF_SMALL)
            buf = _io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain(mode="formatted")
            plan = buf.getvalue()
        except Exception as exc:  # noqa: BLE001
            offenders.append(f"{name}: plan build failed: {exc}")
            continue
        if "CartesianProduct" in plan and name not in _CROSS_OK:
            offenders.append(f"{name}: CartesianProduct")
        if "BatchEvalPython" in plan and name not in _PY_ROW_OK:
            offenders.append(f"{name}: row-at-a-time BatchEvalPython")
        if (
            _EXACT_PCT.search(plan)
            and name not in _EXACT_PCT_OK
        ):
            offenders.append(
                f"{name}: exact percentile/median aggregate over a "
                "relation not declared cardinality-bounded — use "
                "operators.exact_quantiles"
            )


# ---------------------------------------------------------------------
# Plan-shape regression CI (r7 verdict ask #8): the top-20 most
# expensive queries (by BENCH_DETAIL_r07) get a committed physical-plan
# FINGERPRINT — exchange count, join-strategy multiset, parquet scan
# count, RDD scan count — and the test fails when any metric GROWS
# past the snapshot. This is what catches a localCheckpoint-style
# constant landing on a hot path before the bench does (the r7 dedup
# regression's failure mode). Shrinkage (a plan got cheaper) passes but
# the snapshot should be refreshed: SPARK_GRAFT_REGEN_FINGERPRINTS=1.
# Iterative queries are fingerprinted on their FINAL (post-loop) plan,
# which is where a stray materialization would appear anyway.

_FP_FILE = "tests/plan_fingerprints.json"

# EVERY query >= 1 s in the latest full bench detail (r8 + r9), union
# the original r7 top-20 and the r9 second-batch queries >= 1 s warm
# at sf0.1 — 175 plans; pinned as a literal so a bench reshuffle
# cannot silently change what this test covers. Regen:
# SPARK_GRAFT_REGEN_FINGERPRINTS=1 python -m pytest
#   tests/test_plan_hygiene.py -k fingerprints
_FP_QUERIES = [
    "graph_link_prediction", "io_python_datasource_stream",
    "stats_gamma_somers", "io_parquet_codecs", "text_burrows_delta",
    "ab_test_proportions", "agg_bitmap_distinct", "agg_corr",
    "agg_map_from_entries", "agg_median", "agg_ols_two_feature",
    "agg_percentile_disc", "agg_regr_covar", "agg_skew_kurt", "agg_stats",
    "agg_weighted_median", "agg_weighted_quantiles", "agg_winsorized_stats",
    "analytics_abc_pareto", "analytics_bootstrap_ci",
    "analytics_cohort_ltv", "analytics_gini_index", "analytics_heaps_law",
    "analytics_lttb_downsample", "analytics_mann_whitney",
    "analytics_multitouch_attribution", "analytics_pareto_8020",
    "analytics_price_index", "analytics_robust_means",
    "analytics_seasonal_zscore", "analytics_theil_sen",
    "analytics_top_paths", "analytics_weighted_median",
    "ann_cosine_topk_ivf", "ann_cosine_topk_lsh", "ann_cosine_topk_pq",
    "ann_hard_negatives", "ann_ivf_nprobe_sweep",
    "ann_ivf_partitioned_probe", "ann_ivf_pq_rerank", "ann_matryoshka_eval",
    "anomaly_ewma_control", "anomaly_mad_robust", "asof_join_events_orders",
    "basket_cooccurrence", "bpe_fertility_by_lang",
    "bpe_roundtrip_identity", "bpe_train_merges", "bpe_vocab_export",
    "curation_url_funnel", "customer_value_trajectory",
    "customers_overdue_alert", "decontaminate_bloom_verified",
    "decontaminate_ngram_overlap", "dedup_cluster_exact",
    "dedup_cluster_twophase", "dedup_clusters", "dedup_containment",
    "dedup_minhash", "dedup_minhash_incremental", "dedup_ngram_jaccard",
    "dedup_ngram_jaccard_dfcap", "dedup_prefix_filter", "dedup_semantic",
    "dedup_simhash", "dedup_substring_spans", "dedup_substring_tokens",
    "dedup_substring_tokens_dfcap", "dedup_survivorship",
    "dedup_weighted_jaccard", "diag_skew_report",
    "dq_reconcile_order_totals", "dq_referential_integrity",
    "dq_uniqueness_profile", "dq_value_drift_psi",
    "dsir_importance_weights", "embedding_covariance",
    "embedding_distance_histogram", "embedding_pca_project",
    "event_transition_lift", "geo_geohash_grid",
    "geo_haversine_nearest_hub", "global_row_number_twopass",
    "graph_adamic_adar", "graph_clustering_coefficient", "graph_hits",
    "graph_jaccard_neighbors", "graph_k_core", "graph_label_propagation",
    "graph_pagerank", "graph_shortest_path", "graph_triangle_count",
    "interval_max_concurrency", "io_merge_upsert", "io_parquet_partitioned",
    "join_bucketed_smb", "join_interval_banded", "join_interval_overlap",
    "join_range_lookup_broadcast", "join_skew_salted", "join_theta_pairs",
    "mine_bitext_margin", "mine_bitext_margin_ann",
    "multimodal_audio_decode", "multimodal_image_augment",
    "nation_trade_matrix", "orders_reorder_interval", "orders_sla_ship_lag",
    "part_brand_share_shift", "pii_luhn_validate", "prep_leakage_split",
    "prep_woe_iv", "profile_columns", "q11_important_stock",
    "q1_pricing_summary", "q20_full_derived_partsupp", "q21_waiting_orders",
    "q5_region_revenue", "q8_market_share", "q9_full_derived_partsupp",
    "q9_product_profit", "quality_calibration_bins",
    "quality_ccnet_buckets", "quality_composite_score",
    "quality_compression_ratio", "quality_dup_shingle_ratio",
    "quality_fk_audit", "quality_gopher_rules", "ref_pipeline_e2e",
    "ref_sql_star_hinted", "retention_triangle", "scalar_json",
    "sketch_kmv_jaccard", "sketch_kmv_overlap", "stats_cliffs_delta",
    "stats_fleiss_kappa", "stats_friedman_test", "stats_kruskal_wallis",
    "stats_ks_two_sample", "stats_permutation_test", "stats_qq_deciles",
    "stats_wilcoxon_signed_rank", "stream_ann_probe",
    "stream_dedup_minhash", "stream_session", "subq_correlated", "subq_cte",
    "subq_lateral_topk", "subq_recursive_cte", "subq_recursive_hierarchy",
    "subq_scalar", "text_bigram_lm", "text_burstiness",
    "text_char_bigram_entropy", "text_collocations_pmi",
    "text_distinct_ngram_ratio", "text_hapax_ratio",
    "text_kneser_ney_bigram", "text_ngram_novelty",
    "text_perplexity_heldout", "text_phrase_search", "text_rake_keywords",
    "text_repetition_ratio", "text_rolling_hash", "text_sentiment_lexicon",
    "text_source_divergence", "text_tfidf_topk",
    "text_winnowing_fingerprint", "train_quality_logreg",
    "udf_apply_in_pandas", "udtf_polymorphic_analyze",
    "window_groups_frame", "window_range_frame",
    "window_range_frame_bucketed", "window_rolling_median_wide",
    # r10 heavy additions (>= 1 s warm at sf0.1); the unigram pair is
    # excluded — their FINAL plans are a driver-side createDataFrame /
    # one agg over mapInPandas, so a fingerprint would pin nothing
    "train_kmeans_lloyd", "dedup_minhash_banding_curve",
    "dedup_edit_distance_banded", "io_merge_schema_evolution",
    # r11 additions (>= ~1 s warm at sf0.1) + the re-planned Mondrian
    # conformal (its two-pass range-partitioned rank is exactly the
    # shape this CI exists to protect)
    "ann_ivf_refine_recall_curve", "agg_kll_quantile_sketch",
    "analytics_kaplan_meier", "dedup_cdc_chunks", "dedup_lines_corpus",
    "eval_ndcg_at_k", "eval_average_precision",
    "stream_quantile_monitor", "stats_partial_correlation",
    "stats_chow_test", "ml_conformal_mondrian",
    # r12 additions: the per-bucket-rank batching curve (re-planned by
    # the r11 ADVICE fix) and the windowed-KLL sketch tier (its
    # per-window cumulative window must stay partitioned by w_start)
    "prep_length_bucket_batching", "stream_kll_window_quantiles",
    # r12 surface heavies (>= ~1 s warm at sf0.1): the two-rank fusion,
    # the triple self-join, the two-pass prefix SPRT, the bounded-grid
    # iterative pair (IPF/BT), and the gram-join BLEU
    "eval_rank_fusion_rrf", "basket_frequent_triples",
    "stats_sprt_sequential", "analytics_ipf_raking",
    "analytics_bradley_terry", "eval_bleu_lite", "eval_mrr",
    "prep_krippendorff_alpha", "analytics_markov_removal_effect",
    "analytics_ips_offpolicy", "graph_rich_club",
    "analytics_newsvendor",
]

_FP_MARKS = {
    "exchanges": re.compile(r"(?<!Reused)Exchange"),
    "bhj": re.compile(r"BroadcastHashJoin"),
    "smj": re.compile(r"SortMergeJoin"),
    "shj": re.compile(r"ShuffledHashJoin"),
    "bnlj": re.compile(r"BroadcastNestedLoopJoin"),
    "cartesian": re.compile(r"CartesianProduct"),
    "parquet_scans": re.compile(r"Scan parquet"),
    "rdd_scans": re.compile(r"Scan ExistingRDD"),
}


def _fingerprint(plan: str) -> dict[str, int]:
    return {k: len(rx.findall(plan)) for k, rx in _FP_MARKS.items()}


def test_expensive_plan_fingerprints_do_not_grow(spark):
    import json
    import os

    # Plan text is coupled to the session's CacheManager: any relation
    # .cache()'d by a query built EARLIER in this session substitutes
    # as InMemoryTableScan into later plans whose subtree matches
    # (e.g. graph_bfs_layers' cached undirected edge relation used to
    # swallow one lineitem scan + two exchanges out of
    # graph_link_prediction's fingerprint — making the counts depend
    # on WHICH TESTS RAN FIRST in the pytest process, not on the
    # query's code). Clear it so the fingerprints this gate records
    # are a function of the code alone; intra-loop coupling that
    # remains is deterministic because _FP_QUERIES order is fixed.
    spark.catalog.clearCache()

    specs = load_all()
    got: dict[str, dict[str, int]] = {}
    for name in _FP_QUERIES:
        df = specs[name].fn(spark, SF_SMALL)
        buf = _io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain(mode="formatted")
        got[name] = _fingerprint(buf.getvalue())

    if os.environ.get("SPARK_GRAFT_REGEN_FINGERPRINTS") == "1":
        with open(_FP_FILE, "w") as f:
            json.dump(got, f, indent=1, sort_keys=True)
        return

    with open(_FP_FILE) as f:
        want = json.load(f)
    grew: list[str] = []
    for name, fp in got.items():
        base = want.get(name)
        if base is None:
            grew.append(f"{name}: no committed fingerprint — regen")
            continue
        for k, v in fp.items():
            if v > base.get(k, 0):
                grew.append(
                    f"{name}: {k} grew {base.get(k, 0)} -> {v} "
                    "(new shuffle/scan/join on a hot path — either fix "
                    "the plan or regen fingerprints WITH justification)"
                )
    assert not grew, "\n".join(grew)
