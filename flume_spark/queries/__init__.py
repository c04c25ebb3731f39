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
# Round-7 re-tier done: all 50 CORRECTNESS_r06 rows (50/50 hash-green)
# folded into _DRIVER_CHECKED.  This list is now the round-7 new/changed
# set.  Round-8 note: CORRECTNESS_r07.json never materialized (the judge
# last ran at round 6), so the round-7 set CARRIES OVER unchecked and
# stays first; round-8 additions land in the middle group right behind it
# (14 carried + round-8 news fit comfortably inside the 50-entry prefix).
# ROUND-9 RE-TIERING (do this first next round): once a new
# CORRECTNESS_r{N}.json lands, fold ALL its rows into _DRIVER_CHECKED,
# then rebuild this list from that round's changes.  tests/test_registry.py
# fails loudly on typos/overlap.
_NEEDS_DRIVER_ROW = [  # round-7 additions/changes, ascending expected sf0.01 runtime
    # graph_triangles re-verify: edge orientation changed from id-order to
    # (degree, id)-rank order (skew-safe wedge plan); triangles are
    # orientation-invariant so the recursive-CTE oracle must stay hash-green.
    "graph_triangles",
    # graph_sssp_k re-verify: weighted edge list now staged once instead of
    # re-executing the basket self-join every relaxation round (values
    # unchanged — pure plan work, 8.0s -> 4.2s warm at sf0.1).
    "graph_sssp_k",
    # new round-7: time-travel reads on the commit log — log_diff of two
    # stored versions vs the oracle's declarative replay of both prefixes
    # (hash-equality pins reader isolation through the REAL store).
    "queue_log_diff",
    # new round-7: real BPE apply (rank-ordered merge rounds, one codegen
    # replace per rule) vs the oracle replaying the SAME merge table.
    "text_bpe_tokens",
    # new round-7: distinct jids per queue per day from the REAL
    # HllIngestor (3 micro-batches + one REPLAYED batch) vs a one-level
    # register replay in DuckDB — slice-merge == whole AND replay-noop.
    "queue_hll_daily_jids",
    # new round-7: k-core peeling (the deletion fixpoint) vs an oracle
    # that unrolls the identical rounds with MATERIALIZED CTEs.
    "graph_kcore",
    # new round-7: product-quantization ADC top-k — exact-integer
    # codebook training (sign seed + 1 Lloyd round) AND search, oracle
    # replays the whole pipeline (unrolled rounds, materialized CTEs).
    "ann_topk_pq",
    # new round-7: packing in real-tokenizer units (BPE counts through
    # the generalized pack_by_counts); pack_sequences itself re-verifies
    # after the pack_by_counts refactor (same expressions, new seam).
    "pack_bpe_budget",
    "pack_sequences",
    # new round-7: decontaminated split — the seeded draw keys on the
    # near-dup COMPONENT so a dup cluster can never straddle train/test;
    # oracle replays the closure recursively + the identical integer draw.
    "corpus_split_leakage_safe",
    # new round-7: IVF-PQ — coarse cell prunes, PQ ADC ranks; the oracle
    # replays the cell restriction so the hash pins membership pruning.
    "ann_topk_ivfpq",
    # new round-7: the remaining two sketch-family queue-telemetry
    # compositions (HLL=distinct above; CMS=heavy hitters with the
    # never-undercount bound visible; Hist=latency percentiles), each
    # through the REAL ingestor with a replayed batch vs one-level replay.
    "queue_heavy_users_cms",
    "queue_latency_hist",
    # new round-7: the warehouse fact-to-SCD2 join — each fact row
    # enriched with the dimension version valid at the fact's own ts
    # (half-open boundary: a change event lands in the regime it OPENED).
    "scd2_fact_join",
]

# Union of CORRECTNESS_r01..r06 keys: 184 hash-green at latest check,
# 5 rows-only by design (approx_distinct, ann_topk_lsh, embedding_kmeans,
# approx_percentiles, graph_pagerank), MINUS any query whose semantics
# changed since its driver row — those move back into _NEEDS_DRIVER_ROW
# (round 7: graph_triangles via the degree-ordered orientation).  Do NOT
# "restore" a name to this set without removing it from the re-verify list.
_DRIVER_CHECKED = frozenset(
    {
        "corpus_shard_manifest", "dedup_prefix_filter",
        "dedup_prefix_incremental", "due_filter", "graph_bfs_hops",
        "histogram_quantiles",
        "join_null_safe", "privacy_k_anonymity", "rate_window_count",
        "scd2_incremental", "scd2_snapshot_counts", "scd2_user_history",
        "sketch_hll", "snapshot_diff_orders", "text_novelty_by_source",
        "topk_due", "ts_sax_znorm", "weighted_median_price",
        "channel_running_compare", "channel_share_gsets", "corpus_shuffle",
        "events_path_trigrams", "graph_pagerank_k", "graph_pagerank_step",
        "lsh_label_purity", "orders_monthly_remerge", "rollup_topk_window",
        "set_except_all", "set_intersect_all", "sketch_histogram",
        "stream_contract_orders", "table_checks_orders", "ts_sax_words",
        "ts_similar_users",
        "agg_conditional", "agg_count_distinct_salted", "agg_cube",
        "agg_distinct", "agg_grouping_sets", "agg_histogram", "agg_minmax_by",
        "agg_percentiles", "agg_rollup", "agg_stats", "ann_range_cells",
        "ann_range_search", "ann_topk_bruteforce", "ann_topk_int8",
        "ann_topk_ivf", "ann_topk_lsh", "ann_topk_multiprobe",
        "approx_distinct", "approx_percentiles", "array_agg_sorted",
        "backoff_expr", "case_when_bucketing", "cohort_retention",
        "corpus_split", "correlated_subquery", "curation_pipeline",
        "date_spine_fill", "dedup_canonical_best", "dedup_components",
        "dedup_containment", "dedup_embedding_cosine", "dedup_exact",
        "dedup_incremental", "dedup_lsh_verified", "dedup_minhash_lsh",
        "dedup_ngram_jaccard", "dedup_ngram_jaccard_capped", "dedup_passage",
        "dedup_rate_by_source", "dedup_simhash",
        "embedding_centroids", "embedding_kmeans", "embedding_quantize",
        "embedding_truncate", "events_anomaly_mad", "events_funnel",
        "events_gap_islands", "events_transitions", "explode_tokens",
        "filter_project", "fuzzy_part_names", "graph_pagerank",
        "group_args_nested", "interval_coverage", "job_counts", "join_anti",
        "join_asof", "join_broadcast", "join_interval", "join_lateral",
        "join_outer", "join_range", "join_semi", "join_skew_salted",
        "kmeans_assign", "lsh_buckets", "md5_ledger_key", "mixture_weights",
        "multimodal_feature_extract", "multimodal_frame_sample",
        "multimodal_meta", "multimodal_resize", "orders_market_basket",
        "orders_seasonality", "percentiles_exact",
        "pivot_returnflag", "q10_returned_items", "q11_important_stock",
        "q12_priority_lineclass", "q13_customer_distribution",
        "q14_promo_revenue", "q15_top_supplier", "q16_supplier_part_counts",
        "q17_small_quantity_revenue", "q18_large_volume",
        "q19_discounted_revenue", "q1_pricing_summary",
        "q20_volume_suppliers", "q21_sole_returned_supplier",
        "q22_dormant_customers", "q2_min_cost_supplier",
        "q3_shipping_priority", "q4_order_priority", "q5_local_supplier",
        "q6_forecast_revenue", "q7_volume_shipping", "q8_market_share",
        "q9_product_profit", "queue_pending_counts",
        "revenue_share_rollup", "rfm_segments", "running_distinct_users",
        "sample_stratified", "sample_weighted", "scalar_array_funcs",
        "scalar_bitwise_funcs", "scalar_date_funcs", "scalar_json_funcs",
        "scalar_math_funcs", "scalar_null_funcs", "scalar_regex_funcs",
        "scalar_string_funcs", "scalar_subquery", "set_except",
        "set_intersect", "set_union", "sketch_countmin",
        "skew_report_lineitem", "source_cap", "supplier_balance_outliers",
        "text_bm25_topk", "text_chunk_sliding", "text_commonness",
        "text_decontaminate", "text_fingerprint", "text_lang_id",
        "text_length_histogram", "text_normalize", "text_pii_scrub",
        "text_quality_score", "text_repetition", "text_rolling_fingerprint",
        "text_subword_tokens", "text_tfidf_topk", "text_token_count",
        "time_weighted_avg", "topk_orders", "unpivot_orders",
        "visibility_timeout_scan", "vocab_topk", "window_first_last",
        "window_lag_lead", "window_moving_agg", "window_ntile_dist",
        "window_range_frame", "window_rank", "window_running_sum",
        "window_session", "window_sliding", "window_topk_users",
        "window_tumbling", "zorder_orders"
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
