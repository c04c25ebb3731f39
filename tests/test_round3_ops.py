"""Behavior + plan gates for the round-3 additions (analytics, llm_ext,
relational_ext).  Correctness vs DuckDB is covered by test_oracle.py
(auto-parametrized); these pin semantics on hand-built micro-inputs and the
physical-plan properties that make each operator scale."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from flume_spark.operators import dedup, similarity, text
from flume_spark.plans import explain_str, n_nodes, n_shuffles
from flume_spark.queries import all_queries
from tests.conftest import SF_ORACLE

QUERIES = all_queries()


# ---------------------------------------------------------------------------
# chunk_sliding
# ---------------------------------------------------------------------------


def test_chunk_sliding_covers_all_tokens_with_overlap(spark):
    df = spark.createDataFrame([(1, " ".join(f"w{i}" for i in range(80)),)], "id long, text string")
    out = text.chunk_sliding(df, "id", "text", size=32, stride=24).collect()
    # 80 tokens, size 32, stride 24 -> chunks start at 0, 24, 48 -> 3 chunks
    assert [r.chunk_idx for r in out] == [0, 1, 2]
    assert [r.n_chunk_tokens for r in out] == [32, 32, 32]
    # overlap: chunk1 starts at token 24, inside chunk0's [0, 32)
    assert out[1].chunk_text.split()[0] == "w24"
    # last token covered
    assert out[2].chunk_text.split()[-1] == "w79"


def test_chunk_sliding_short_doc_single_chunk(spark):
    df = spark.createDataFrame([(1, "a b c")], "id long, text string")
    out = text.chunk_sliding(df, "id", "text", size=32, stride=24).collect()
    assert len(out) == 1 and out[0].n_chunk_tokens == 3


def test_chunk_sliding_is_map_only(spark):
    plan = explain_str(QUERIES["text_chunk_sliding"](spark, SF_ORACLE))
    assert "Exchange" not in plan, "chunker must not shuffle"


# ---------------------------------------------------------------------------
# repetition_ratio
# ---------------------------------------------------------------------------


def test_repetition_ratio_flags_boilerplate(spark):
    df = spark.createDataFrame(
        [(1, "spam spam spam spam spam"), (2, "all words here are unique"), (3, "one")],
        "id long, text string",
    )
    rows = {r.id: r for r in text.repetition_ratio(df, "id", "text").collect()}
    assert rows[1].dup_ratio == 0.75  # 4 bigrams, 1 distinct
    assert rows[2].dup_ratio == 0.0
    assert rows[3].n_bigrams == 0 and rows[3].dup_ratio == 0.0


# ---------------------------------------------------------------------------
# bm25
# ---------------------------------------------------------------------------


def test_bm25_ranks_term_dense_doc_first(spark):
    df = spark.createDataFrame(
        [
            (1, "spark spark spark join"),
            (2, "spark filler filler filler filler filler filler filler"),
            (3, "nothing relevant at all"),
        ],
        "id long, text string",
    )
    out = text.bm25_topk(df, "id", "text", terms=["spark", "join"], k=3).collect()
    assert out[0].id == 1
    assert out[-1].bm25 == 0.0  # doc 3 matches nothing


def test_bm25_single_corpus_pass_no_smj(spark):
    df = QUERIES["text_bm25_topk"](spark, SF_ORACLE)
    plan = explain_str(df)
    assert "SortMergeJoin" not in plan
    assert n_nodes(df, "BroadcastNestedLoopJoin") >= 1  # 1-row stats joined in
    # documents scanned once for tf+stats, once for the rejoin — never more
    assert n_nodes(plan, "Scan parquet") <= 2


# ---------------------------------------------------------------------------
# vocab_topk
# ---------------------------------------------------------------------------


def test_vocab_topk_deterministic_tiebreak(spark):
    df = spark.createDataFrame([(1, "b a b a c")], "id long, text string")
    out = text.vocab_topk(df, "text", k=3).collect()
    assert [(r.word, r.freq) for r in out] == [("a", 2), ("b", 2), ("c", 1)]


# ---------------------------------------------------------------------------
# canonical_best
# ---------------------------------------------------------------------------


def test_canonical_best_keeps_highest_quality(spark):
    prefix = " ".join(f"p{i}" for i in range(16))
    df = spark.createDataFrame(
        [
            (1, prefix + " short", 10.0),
            (2, prefix + " a much longer continuation", 99.0),
            (3, "totally different document body here", 5.0),
        ],
        "id long, text string, q double",
    )
    out = dedup.canonical_best(df, "id", "text", F.col("q")).collect()
    by_size = {r.n_members: r for r in out}
    assert by_size[2].keep_id == 2 and by_size[2].best_quality == 99.0
    assert by_size[1].keep_id == 3


def test_canonical_best_tie_breaks_lowest_id(spark):
    prefix = " ".join(f"p{i}" for i in range(16))
    df = spark.createDataFrame(
        [(7, prefix, 1.0), (4, prefix, 1.0)], "id long, text string, q double"
    )
    out = dedup.canonical_best(df, "id", "text", F.col("q")).collect()
    assert len(out) == 1 and out[0].keep_id == 4


def test_canonical_best_single_shuffle(spark):
    assert n_shuffles(QUERIES["dedup_canonical_best"](spark, SF_ORACLE)) == 1


# ---------------------------------------------------------------------------
# quantize / range search
# ---------------------------------------------------------------------------


def test_quantize_int8_roundtrip_error_bounded(spark):
    df = spark.createDataFrame(
        [(1, [0.5, -1.0, 0.25, 0.0])], "vec_id long, embedding array<float>"
    )
    row = similarity.quantize_int8(df).collect()[0]
    assert row.scale == 1.0
    assert row.q_csv == "64,-127,32,0"


def test_range_search_threshold_inclusive_on_rounded(spark):
    df = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [1.0, 0.0]), (2, [0.0, 1.0])],
        "vec_id long, embedding array<float>",
    )
    out = similarity.range_search(df, F.col("vec_id") == 0, threshold=0.9).collect()
    assert [(r.query_id, r.neighbor_id) for r in out] == [(0, 1)]
    assert out[0].cosine == 1.0


def test_range_search_broadcasts_queries(spark):
    df = QUERIES["ann_range_search"](spark, SF_ORACLE)
    plan = explain_str(df)
    assert "BroadcastNestedLoopJoin" in plan
    assert "CartesianProduct" not in plan and "SortMergeJoin" not in plan


# ---------------------------------------------------------------------------
# analytics plan gates
# ---------------------------------------------------------------------------


def test_q11_broadcasts_total_single_fact_shuffle(spark):
    df = QUERIES["q11_important_stock"](spark, SF_ORACLE)
    plan = explain_str(df)
    assert "SortMergeJoin" not in plan and "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" in plan


def test_cohort_retention_no_cartesian(spark):
    plan = explain_str(QUERIES["cohort_retention"](spark, SF_ORACLE))
    assert "CartesianProduct" not in plan


def test_time_weighted_avg_exact_integer_core(spark, monkeypatch):
    """The SHIPPED time_weighted_avg equals the hand-computed step integral
    on a micro input (T monkeypatched so the real query body runs):
    10s @ 10.0 + 30s @ 20.0 over 40s = (100 + 600) / 40 = 17.5."""
    import datetime as dt

    from flume_spark.queries import analytics

    rows = [
        (1, 1, dt.datetime(2024, 1, 1, 0, 0, 0), 10.0),
        (2, 1, dt.datetime(2024, 1, 1, 0, 0, 10), 20.0),
        (3, 1, dt.datetime(2024, 1, 1, 0, 0, 40), 0.0),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, value double"
    )
    monkeypatch.setattr(analytics, "T", lambda s, d, n: df)
    out = analytics.time_weighted_avg(spark, "ignored").collect()
    assert len(out) == 1
    assert out[0].twa_value == 17.5 and out[0].span_s == 40.0


def test_rfm_segments_quartiles_are_int(spark):
    df = QUERIES["rfm_segments"](spark, SF_ORACLE)
    types = dict(df.dtypes)
    assert types["r_q"] == "int" and types["f_q"] == "int" and types["m_q"] == "int"


# ---------------------------------------------------------------------------
# batch 2: int8 ANN, commonness, anomaly MAD, market basket
# ---------------------------------------------------------------------------


def test_int8_topk_matches_obvious_neighbor(spark):
    df = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.9, 0.1]), (2, [-1.0, 0.0])],
        "vec_id long, embedding array<float>",
    )
    out = similarity.int8_topk(df, F.col("vec_id") == 0, k=2).collect()
    assert [r.neighbor_id for r in out] == [1, 2]
    # codes(0)=[127,0] s=1.0, codes(1)=[127,14] s=0.9 -> score recovers
    # the approximate float dot: 127*127 * 1.0 * 0.9 / 127^2 = 0.9
    assert abs(out[0].score - 0.9) < 1e-6
    assert abs(out[1].score - (-1.0)) < 1e-6


def test_int8_topk_scale_aware_ranking(spark):
    """A small-magnitude neighbor must NOT outrank a truly closer one
    (codes alone are max-norm directions; the scale rescale fixes it)."""
    df = spark.createDataFrame(
        [(0, [1.0, 0.1]), (1, [1.0, 0.0]), (2, [0.05, 0.05])],
        "vec_id long, embedding array<float>",
    )
    out = similarity.int8_topk(df, F.col("vec_id") == 0, k=2).collect()
    assert [r.neighbor_id for r in out] == [1, 2]


def test_quantize_zero_vector_keeps_dimensionality(spark):
    df = spark.createDataFrame(
        [(1, [0.0, 0.0, 0.0])], "vec_id long, embedding array<float>"
    )
    row = similarity.quantize_int8(df).collect()[0]
    assert row.scale == 0.0 and row.q_csv == "0,0,0"


def test_int8_topk_broadcasts_queries(spark):
    df = QUERIES["ann_topk_int8"](spark, SF_ORACLE)
    plan = explain_str(df)
    assert "BroadcastNestedLoopJoin" in plan and "SortMergeJoin" not in plan


def test_commonness_rare_vocab_scores_low(spark, monkeypatch):
    from flume_spark.queries import llm_ext

    df = spark.createDataFrame(
        [(1, "common common words"), (2, "common words"), (3, "zzz qqq")],
        "doc_id long, text string",
    )
    monkeypatch.setattr(llm_ext, "T", lambda s, d, n: df)
    got = {
        r.doc_id: r.mean_df
        for r in llm_ext.text_commonness(spark, "ignored").collect()
    }
    assert got[3] == 1.0          # unique vocabulary
    assert got[1] == 2.0 and got[2] == 2.0  # both tokens appear in 2 docs
    assert got[3] < got[1]


def test_anomaly_mad_flags_planted_outlier(spark, monkeypatch):
    from flume_spark.queries import analytics

    rows = [(i, "click", 10.0 + (i % 3) * 0.01) for i in range(20)]
    rows.append((99, "click", 500.0))
    df = spark.createDataFrame(rows, "event_id long, event_type string, value double")
    monkeypatch.setattr(analytics, "T", lambda s, d, n: df)
    out = analytics.events_anomaly_mad(spark, "ignored").collect()
    assert [r.event_id for r in out] == [99]
    assert out[0].median_value == 10.01


def test_market_basket_pairs_are_ordered_and_distinct(spark, monkeypatch):
    from flume_spark.queries import analytics

    df = spark.createDataFrame(
        [(1, 10), (1, 20), (1, 10), (2, 10), (2, 20), (3, 30)],
        "l_orderkey long, l_partkey long",
    )
    monkeypatch.setattr(analytics, "T", lambda s, d, n: df)
    pairs = analytics.orders_market_basket(spark, "ignored").collect()
    # duplicate (1, 10) line must not inflate support; pair emitted once a<b
    assert [(r.part_a, r.part_b, r.support) for r in pairs] == [(10, 20, 2)]


# ---------------------------------------------------------------------------
# passage dedup
# ---------------------------------------------------------------------------


def test_passage_dedup_detects_shared_block(spark):
    block = " ".join(f"b{i}" for i in range(16))
    unique1 = " ".join(f"u{i}" for i in range(16))
    unique2 = " ".join(f"v{i}" for i in range(16))
    df = spark.createDataFrame(
        [
            (1, block + " " + unique1),   # chunk0 = block (shared), chunk1 unique
            (2, block + " " + unique2),
            (3, "totally separate words only here"),
        ],
        "id long, text string",
    )
    rows = {r.id: r for r in dedup.passage_dedup_stats(df, "id", "text", 16).collect()}
    assert rows[1].n_chunks == 2 and rows[1].n_shared_chunks == 1
    assert rows[1].shared_ratio == 0.5
    assert rows[2].shared_ratio == 0.5
    assert rows[3].n_shared_chunks == 0


def test_passage_dedup_internal_repeat_not_cross_doc(spark):
    """A doc repeating its own passage is NOT flagged (shared = other docs)."""
    block = " ".join(f"r{i}" for i in range(16))
    df = spark.createDataFrame([(1, block + " " + block)], "id long, text string")
    row = dedup.passage_dedup_stats(df, "id", "text", 16).collect()[0]
    assert row.n_chunks == 2 and row.n_shared_chunks == 0


# ---------------------------------------------------------------------------
# review-fix regression tests
# ---------------------------------------------------------------------------


def test_canonical_best_works_with_string_ids(spark):
    """Tie-break must stay deterministic for non-numeric ids (negating a
    string id would implicit-cast to NULL)."""
    prefix = " ".join(f"p{i}" for i in range(16))
    df = spark.createDataFrame(
        [("doc-b", prefix, 1.0), ("doc-a", prefix, 1.0), ("doc-c", prefix, 9.0)],
        "id string, text string, q double",
    )
    out = dedup.canonical_best(df, "id", "text", F.col("q")).collect()
    assert len(out) == 1 and out[0].keep_id == "doc-c"
    tie = df.filter(F.col("q") == 1.0)
    out2 = dedup.canonical_best(tie, "id", "text", F.col("q")).collect()
    assert out2[0].keep_id == "doc-a"


def test_bm25_rejects_empty_terms_and_accepts_any_token(spark):
    df = spark.createDataFrame(
        [(1, "don't stop c++ café"), (2, "plain words only here")],
        "id long, text string",
    )
    with pytest.raises(ValueError):
        text.bm25_topk(df, "id", "text", terms=[])
    # quoted/unicode/punctuated tokens are parameterized, not SQL-inlined
    out = text.bm25_topk(df, "id", "text", terms=["don't", "c++", "café"], k=2).collect()
    assert out[0].id == 1 and out[0].bm25 > out[1].bm25


def test_passage_dedup_reuses_chunk_exchange(spark):
    """The chunk/md5 map stage must run ONCE: both consumers read the same
    h-exchange (ReusedExchange in the AQE final plan)."""
    df = QUERIES["dedup_passage"](spark, SF_ORACLE)
    df.collect()
    plan = explain_str(df)
    assert "isFinalPlan=true" in plan
    assert "ReusedExchange" in plan


def test_gap_islands_fold_multi_streak(spark, monkeypatch):
    """Shipped gap-islands query: days {1,2,3, 7, 9,10} -> 3 streaks,
    longest 3, via the single-shuffle array fold."""
    import datetime as dt

    from flume_spark.queries import analytics

    days = [1, 2, 3, 7, 9, 10]
    rows = [
        (i, 5, dt.datetime(2024, 1, d, 12, 0, 0), 1.0) for i, d in enumerate(days)
    ]
    # duplicate events on one day must not affect streaks
    rows.append((99, 5, dt.datetime(2024, 1, 2, 18, 0, 0), 1.0))
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, value double"
    )
    monkeypatch.setattr(analytics, "T", lambda s, d, n: df)
    out = analytics.events_gap_islands(spark, "ignored").collect()
    assert len(out) == 1
    r = out[0]
    assert r.n_active_days == 6 and r.n_streaks == 3 and r.longest_streak == 3


def test_gap_islands_single_user_shuffle(spark):
    """One exchange for the per-user fold + nothing else on the agg path."""
    df = QUERIES["events_gap_islands"](spark, SF_ORACLE)
    assert n_shuffles(df) == 1


def test_cohort_retention_single_user_shuffle_plus_rollup(spark):
    df = QUERIES["cohort_retention"](spark, SF_ORACLE)
    assert n_shuffles(df) == 2  # user agg + tiny (cohort, offset) rollup


def test_canonical_best_null_quality_never_wins(spark):
    """A NULL-quality member must not beat scored members (struct compare
    sorts NULL first ascending — guarded by the -inf coalesce)."""
    prefix = " ".join(f"p{i}" for i in range(16))
    df = spark.createDataFrame(
        [(1, prefix, 1.0), (2, prefix, 5.0), (3, prefix, None)],
        "id long, text string, q double",
    )
    out = dedup.canonical_best(df, "id", "text", F.col("q")).collect()
    assert len(out) == 1
    assert out[0].keep_id == 2 and out[0].best_quality == 5.0


def test_quantize_plan_materializes_scale_once(spark):
    """The max-abs aggregate must appear ONCE in the optimized plan —
    inlined into the code lambda it re-runs per vector element (O(d²))."""
    df = spark.createDataFrame([(1, [0.5, -1.0])], "vec_id long, embedding array<float>")
    out = similarity.quantize_int8(df)
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    assert plan.count("aggregate(") == 1


# ---------------------------------------------------------------------------
# incremental LSH dedup
# ---------------------------------------------------------------------------


def _near_dup_corpus(spark):
    base = " ".join(f"w{i}" for i in range(40))
    variant = base.replace("w3 ", "w3x ")
    other = " ".join(f"z{i}" for i in range(40))
    hist = spark.createDataFrame(
        [(1, base), (2, other)], "doc_id long, text string"
    )
    new = spark.createDataFrame(
        [(10, variant), (11, variant + " tail"), (12, "unrelated words entirely qq")],
        "doc_id long, text string",
    )
    return hist, new


def test_incremental_lsh_links_new_to_history_and_new(spark):
    hist, new = _near_dup_corpus(spark)
    pairs = {
        (r.doc_new, r.doc_match)
        for r in dedup.incremental_lsh_candidates(
            hist, new, "doc_id", "text", shingle_n=2, num_hashes=16, bands=4
        ).collect()
    }
    assert (10, 1) in pairs           # new near-dup of a history doc
    assert (10, 11) in pairs          # new-new pair, emitted once, ordered
    assert (11, 10) not in pairs
    assert not any(m == 2 and n == 12 for n, m in pairs)  # unrelated stays out
    # history x history never appears as a result pair
    assert all(n in (10, 11, 12) for n, _ in pairs)


def test_incremental_lsh_precomputed_index_matches_inline(spark):
    """Passing the persisted banded index must give identical candidates
    to banding history in-plan (the compute-once contract)."""
    hist, new = _near_dup_corpus(spark)
    idx = dedup.banded_signatures(hist, "doc_id", "text", 2, 16, 4)
    inline = {
        (r.doc_new, r.doc_match)
        for r in dedup.incremental_lsh_candidates(
            hist, new, "doc_id", "text", 2, 16, 4
        ).collect()
    }
    precomp = {
        (r.doc_new, r.doc_match)
        for r in dedup.incremental_lsh_candidates(
            hist, new, "doc_id", "text", 2, 16, 4, history_banded=idx
        ).collect()
    }
    assert inline == precomp and inline


def test_incremental_lsh_reingested_id_no_self_pair(spark):
    """A doc re-ingested under its OWN id (disjointness violated) must not
    emit the degenerate (X, X) pair."""
    base = " ".join(f"w{i}" for i in range(40))
    hist = spark.createDataFrame([(1, base)], "doc_id long, text string")
    new = spark.createDataFrame([(1, base)], "doc_id long, text string")
    pairs = dedup.incremental_lsh_candidates(
        hist, new, "doc_id", "text", shingle_n=2, num_hashes=16, bands=4
    ).collect()
    assert pairs == []


def test_approx_percentiles_within_tolerance(spark):
    """The quantile sketch must land within 1% relative error of the exact
    percentiles at accuracy=10000 (its documented bound is far looser —
    this pins the practical quality the pipeline relies on)."""
    exact = {
        r.event_type: r
        for r in QUERIES["agg_percentiles"](spark, SF_ORACLE).collect()
    }
    approx = {
        r.event_type: r
        for r in QUERIES["approx_percentiles"](spark, SF_ORACLE).collect()
    }
    assert set(exact) == set(approx)
    for et, ex in exact.items():
        ap = approx[et]
        for e, a in [(ex.p50, ap.ap50), (ex.p90, ap.ap90), (ex.p99, ap.ap99)]:
            assert abs(a - e) <= max(0.01 * abs(e), 0.05), (et, e, a)


# ---------------------------------------------------------------------------
# corpus shuffle + shard export
# ---------------------------------------------------------------------------


def test_corpus_shuffle_is_deterministic_permutation(spark):
    df = spark.createDataFrame([(i,) for i in range(200)], "doc_id long")
    a = text.corpus_shuffle(df, "doc_id").collect()
    b = text.corpus_shuffle(df, "doc_id").collect()
    ranks_a = {r.doc_id: r.shuffle_rank for r in a}
    ranks_b = {r.doc_id: r.shuffle_rank for r in b}
    assert ranks_a == ranks_b                       # reproducible
    assert sorted(ranks_a.values()) == list(range(1, 201))  # a permutation
    assert ranks_a != {i: i + 1 for i in range(200)}        # actually shuffled
    # a different seed yields a different permutation
    c = {r.doc_id: r.shuffle_rank for r in text.corpus_shuffle(df, "doc_id", seed="other").collect()}
    assert c != ranks_a


def test_write_shards_bounds_files_and_orders_rows(spark, tmp_path):
    df = spark.createDataFrame([(i, f"doc {i}") for i in range(500)], "doc_id long, text string")
    shuffled = text.corpus_shuffle(df, "doc_id", buckets=8).join(df, "doc_id")
    ranks = {r.doc_id: r.shuffle_rank for r in shuffled.collect()}
    out = str(tmp_path / "shards")
    n_files = text.write_shards(shuffled, out, max_records_per_file=100)
    assert n_files >= 5  # 500 rows / 100-row cap
    back = spark.read.parquet(out)
    assert back.count() == 500
    # per-file row bound holds, and concatenating part files in filename
    # order reproduces the shuffle_rank permutation EXACTLY (the bucket is
    # an order-preserving key prefix — a mod-hash bucket would break this)
    import os

    import pyarrow.parquet as pq

    concat_ids = []
    part_files = sorted(
        os.path.join(dirpath, f)
        for dirpath, _, files in os.walk(out)
        for f in files
        if f.endswith(".parquet")
    )
    for path in part_files:
        pf = pq.ParquetFile(path)
        assert pf.metadata.num_rows <= 100
        concat_ids.extend(pf.read(columns=["doc_id"])["doc_id"].to_pylist())
    expected = [doc for doc, _ in sorted(ranks.items(), key=lambda kv: kv[1])]
    assert concat_ids == expected


# ---------------------------------------------------------------------------
# remaining plan gates for session queries
# ---------------------------------------------------------------------------


def test_anomaly_mad_broadcasts_stats(spark):
    """The 5-row median/MAD stats must broadcast back — an SMJ here would
    shuffle the full events table twice for a handful of scalars."""
    plan = explain_str(QUERIES["events_anomaly_mad"](spark, SF_ORACLE))
    assert "SortMergeJoin" not in plan
    assert "BroadcastHashJoin" in plan


def test_incremental_dedup_band_equijoin_no_smj_explosion(spark):
    """The incremental probe must stay a band-keyed equi-join: no
    cartesian, and the probe side joins on (band_idx, band_hash)."""
    df = QUERIES["dedup_incremental"](spark, SF_ORACLE)
    plan = explain_str(df)
    assert "CartesianProduct" not in plan
    assert "band_hash" in plan  # the equi-key reached the join
