"""Declared query surface: name -> (spark, sf_dir) -> DataFrame, plus DuckDB oracles.

Aggregated from submodules by domain:
- relational     — engine-native Catalyst surface (scans, joins, aggs, windows,
                   set ops, scalar functions).  No reference analog (flume does
                   no relational processing); declared per SURVEY.md §2.3-2.7.
- queue_semantics — SQL-checkable analogs of the reference's queue operators
                   (due-filter, top-K-due, counts, backoff, md5 ledger,
                   windowed rate counts, batch grouping) per SURVEY.md §2.
- llm_ops        — dedup / similarity / text-analysis / multimodal operators
                   for LLM-data pipelines (SURVEY.md §7 phase 3).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from flume_spark.queries import (
    analytics,
    llm_ext,
    llm_ops,
    queue_semantics,
    relational,
    relational_ext,
    temporal,
    tpch_extra,
)

QueryFn = Callable[[SparkSession, str], DataFrame]


# The driver's correctness gate checks a bounded prefix of the declared dict
# (50 entries per round, in dict order).  Order therefore matters: queries
# that do not yet have a driver-confirmed row go FIRST (cheapest first, so a
# time budget also admits the most rows); queries already driver-checked in
# CORRECTNESS_r01..r04.json go last.  New queries absent from both lists land
# in the middle group and get checked next round automatically.
# tests/test_registry.py asserts both lists stay consistent with the merged
# query dict (no typos, no overlap, full coverage).
# Round-10 re-tier: all 50 CORRECTNESS_r09 rows (49 hash-green + 1
# rows-only-by-design, including the three round-9 additions) folded into
# _DRIVER_CHECKED — the cumulative union r01-r09 covers every previously
# declared query.  _NEEDS_DRIVER_ROW is the round-10 new set; new queries
# absent from both lists land in the middle (fresh) group automatically.
# tests/test_registry.py fails loudly on typos/overlap.
_NEEDS_DRIVER_ROW = [  # round-10 additions, ascending expected sf0.01 runtime
    # ANALYZE-style one-pass column profile (single fused Aggregate)
    "stats_profile",
    # model-based filtering cycle: broadcast linear-classifier inference
    # and the all-integer distributed perceptron trainer (3 unrolled
    # iterations in the oracle)
    "text_classifier_score",
    "text_classifier_train",
    # the full cycle in one hash-checked row: train -> score with the
    # trained weights -> exact-integer confusion matrix
    "text_classifier_eval",
    # ONLINE perceptron through the real ledger-guarded ingestor
    # (hashing-trick features, one integer update per micro-batch,
    # re-delivered batch skipped) — oracle unrolls the batch schedule
    "stream_classifier_train",
    # the curation funnel run STREAMING through the real LshIngestor /
    # SubstrIngestor / SemanticIngestor stores with a re-delivered batch
    # per ledger; oracle replays every stage under batch-prefix
    # seniority.  The last batch-only capability seam — and the most
    # expensive new row, so it goes last in the prefix.
    "stream_corpus_funnel",
]

# Union of CORRECTNESS_r01..r09 keys: 209 oracled hash-green at latest
# check, 6 rows-only by design (approx_distinct, ann_topk_lsh,
# embedding_kmeans, approx_percentiles, graph_pagerank,
# dedup_semantic_hier), MINUS any query whose semantics changed since its
# driver row — those move back into _NEEDS_DRIVER_ROW.  Do NOT "restore"
# a name to this set without removing it from the re-verify list.
_DRIVER_CHECKED = frozenset(
    {
        "agg_conditional", "agg_count_distinct_salted", "agg_cube",
        "agg_distinct", "agg_grouping_sets", "agg_histogram", "agg_minmax_by",
        "agg_percentiles", "agg_rollup", "agg_stats", "ann_range_cells",
        "ann_range_search", "ann_topk_bruteforce", "ann_topk_int8",
        "ann_topk_ivf", "ann_topk_ivfpq", "ann_topk_lsh",
        "ann_pq_drift", "ann_topk_multiprobe", "ann_topk_pq", "approx_distinct",
        "approx_percentiles", "array_agg_sorted", "backoff_expr",
        "case_when_bucketing", "channel_running_compare",
        "channel_share_gsets", "cohort_retention", "corpus_curate_spans",
        "corpus_funnel",
        "corpus_shard_manifest", "corpus_shuffle", "corpus_split",
        "corpus_split_leakage_safe", "correlated_subquery",
        "curation_pipeline", "date_spine_fill", "dedup_canonical_best",
        "dedup_components", "dedup_containment", "dedup_embedding_cosine",
        "dedup_exact", "dedup_incremental", "dedup_lsh_verified",
        "dedup_minhash_lsh", "dedup_ngram_jaccard",
        "dedup_ngram_jaccard_capped", "dedup_passage", "dedup_prefix_filter",
        "dedup_multimodal_cosine", "dedup_prefix_incremental",
        "dedup_rate_by_source", "dedup_semantic",
        "dedup_semantic_hier", "dedup_simhash", "dedup_source_mirrors",
        "dedup_substring_clean", "dedup_substring_exact",
        "dedup_substring_hot", "dedup_substring_incremental",
        "dedup_substring_maxspan", "due_filter", "embedding_centroids",
        "embedding_kmeans", "embedding_quantize", "embedding_truncate",
        "events_anomaly_mad", "events_funnel", "events_gap_islands",
        "events_path_trigrams", "events_transitions", "explode_tokens",
        "filter_project", "fuzzy_part_names", "graph_bfs_hops", "graph_kcore",
        "graph_pagerank", "graph_pagerank_k", "graph_pagerank_step",
        "graph_sssp_k", "graph_triangles", "group_args_nested",
        "histogram_quantiles", "interval_coverage", "job_counts", "join_anti",
        "join_asof", "join_broadcast", "join_interval", "join_lateral",
        "join_null_safe", "join_outer", "join_range", "join_semi",
        "join_skew_salted", "kmeans_assign", "lsh_buckets",
        "lsh_label_purity", "md5_ledger_key", "mixture_weights",
        "multimodal_feature_extract", "multimodal_frame_sample",
        "multimodal_meta", "multimodal_resize", "orders_market_basket",
        "orders_monthly_remerge", "orders_seasonality", "pack_bpe_budget",
        "pack_sequences", "percentiles_exact", "pivot_returnflag",
        "privacy_k_anonymity", "q10_returned_items", "q11_important_stock",
        "q12_priority_lineclass", "q13_customer_distribution",
        "q14_promo_revenue", "q15_top_supplier", "q16_supplier_part_counts",
        "q17_small_quantity_revenue", "q18_large_volume",
        "q19_discounted_revenue", "q1_pricing_summary",
        "q20_volume_suppliers", "q21_sole_returned_supplier",
        "q22_dormant_customers", "q2_min_cost_supplier",
        "q3_shipping_priority", "q4_order_priority", "q5_local_supplier",
        "q6_forecast_revenue", "q7_volume_shipping", "q8_market_share",
        "q9_product_profit", "queue_heavy_users_cms", "queue_hll_daily_jids",
        "queue_latency_hist", "queue_log_diff", "queue_pending_counts",
        "rate_window_count", "revenue_share_rollup", "rfm_segments",
        "rollup_topk_window", "running_distinct_users", "sample_stratified",
        "sample_weighted", "scalar_array_funcs", "scalar_bitwise_funcs",
        "scalar_date_funcs", "scalar_json_funcs", "scalar_math_funcs",
        "scalar_null_funcs", "scalar_regex_funcs", "scalar_string_funcs",
        "scalar_subquery", "scd2_fact_join", "scd2_incremental",
        "scd2_snapshot_counts", "scd2_user_history", "set_except",
        "set_except_all", "set_intersect", "set_intersect_all", "set_union",
        "sketch_countmin", "sketch_histogram", "sketch_hll",
        "skew_report_lineitem", "snapshot_diff_orders", "source_cap",
        "stream_contract_orders", "stream_semantic_dedup",
        "stream_substr_dedup", "supplier_balance_outliers",
        "table_checks_orders", "text_bigram_rarity", "text_bm25_topk",
        "text_bpe_tokens", "text_chunk_sliding", "text_commonness",
        "text_decontaminate", "text_fingerprint", "text_lang_id",
        "text_length_histogram", "text_normalize", "text_novelty_by_source",
        "text_pii_scrub", "text_quality_score", "text_repetition",
        "text_rolling_fingerprint", "text_subword_tokens", "text_tfidf_topk",
        "text_token_count", "time_weighted_avg", "topk_due", "topk_orders",
        "ts_sax_words", "ts_sax_znorm", "ts_similar_users", "unpivot_orders",
        "visibility_timeout_scan", "vocab_topk", "weighted_median_price",
        "window_first_last", "window_lag_lead", "window_moving_agg",
        "window_ntile_dist", "window_range_frame", "window_rank",
        "window_running_sum", "window_session", "window_sliding",
        "window_topk_users", "window_tumbling", "zorder_orders",
    }
)


def _reorder(merged: dict) -> dict:
    prio = [n for n in _NEEDS_DRIVER_ROW if n in merged]
    prio_set = set(prio)
    fresh = [n for n in merged if n not in prio_set and n not in _DRIVER_CHECKED]
    rest = [n for n in merged if n in _DRIVER_CHECKED and n not in prio_set]
    return {n: merged[n] for n in (*prio, *fresh, *rest)}


def all_queries() -> dict[str, QueryFn]:
    out: dict[str, QueryFn] = {}
    for mod in (
        relational,
        queue_semantics,
        llm_ops,
        temporal,
        tpch_extra,
        analytics,
        llm_ext,
        relational_ext,
    ):
        out.update(mod.QUERIES)
    return _reorder(out)


def all_oracles() -> dict[str, str]:
    out: dict[str, str] = {}
    for mod in (
        relational,
        queue_semantics,
        llm_ops,
        temporal,
        tpch_extra,
        analytics,
        llm_ext,
        relational_ext,
    ):
        out.update(mod.ORACLES)
    return _reorder(out)
