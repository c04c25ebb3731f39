#!/usr/bin/env python
"""Benchmark harness — the FINAL stdout line is ONE compact JSON record:
{"metric": ..., "value": <total sec>, "unit": "sec", "queries": {...}, "sf": ...}
The per-sample transparency record ({"samples": {...}}) is printed on its own
EARLIER line and mirrored to bench_samples.json — never embedded in the final
line, so a bounded tail capture of the last line cannot truncate it.

Headline relational + LLM-op queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS], plus a queue-engine
throughput section mirroring the reference's redis_benchmark shape
(bulk_enqueue across 20 queues + claim-dispatch-ack loop —
/root/reference/lib/mix/tasks/redis_benchmark.ex:11-19).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from flume_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

HEADLINE = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier",
    "q6_forecast_revenue",
    "q10_returned_items",
    "q14_promo_revenue",
    "q18_large_volume",
    "agg_stats",
    "join_broadcast",
    "agg_distinct",
    "window_rank",
    "topk_orders",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_ngram_jaccard",
    "dedup_ngram_jaccard_capped",
    "dedup_simhash",
    "dedup_embedding_cosine",
    "ann_topk_bruteforce",
    "ann_topk_ivf",
    "text_quality_score",
    "text_fingerprint",
    "text_subword_tokens",
    "multimodal_meta",
    "window_tumbling",
    "window_session",
    "join_asof",
    "agg_percentiles",
    # round-3 session-2 additions (absent from earlier BENCH rounds — the
    # like-for-like baseline comparison excludes them; see BASELINE.md)
    "text_bm25_topk",
    "dedup_passage",
    "ann_topk_int8",
    "cohort_retention",
    "orders_market_basket",
    # the two flagship near-dup paths (blessed composed default +
    # incremental ingest) — no earlier-round baseline rows
    "dedup_lsh_verified",
    "dedup_incremental",
    # round-4 additions — no earlier-round baseline rows
    "dedup_containment",
    "ann_topk_multiprobe",
    "ann_range_cells",
    "zorder_orders",
    "corpus_split",
    "percentiles_exact",
    "embedding_truncate",
    "sketch_countmin",
    "skew_report_lineitem",
    "graph_pagerank_step",
    # round-5 additions — no earlier-round baseline rows
    "graph_pagerank_k",
    "rollup_topk_window",
    "channel_share_gsets",
    "orders_monthly_remerge",
    "sketch_histogram",
    "histogram_quantiles",
    "channel_running_compare",
    "lsh_label_purity",
    # round-6 additions — no earlier-round baseline rows
    "ts_sax_znorm",
    "graph_bfs_hops",
    "sketch_hll",
    "dedup_prefix_filter",
    "scd2_user_history",
    # round-7 additions (VERDICT item 4): the heavy correctness-only tail —
    # the most expensive declared plans were invisible to the BENCH record,
    # so a perf regression there would go unrecorded
    "graph_sssp_k",
    "graph_triangles",
    "scd2_incremental",
    "snapshot_diff_orders",
    # round-8 additions — no earlier-round baseline rows
    "dedup_substring_exact",
    "dedup_semantic",
    "dedup_substring_incremental",
    "dedup_substring_clean",
    # round-9 additions (VERDICT item 5): the round-8 tail that had driver
    # oracles but no bench row — the composed curate-spans report is the
    # most expensive previously-unbenched plan, and multimodal_cosine is
    # the re-planned (cluster-banded) pairing leg
    "dedup_substring_maxspan",
    "corpus_curate_spans",
    "dedup_source_mirrors",
    "text_bigram_rarity",
    "dedup_multimodal_cosine",
    "ann_pq_drift",
    # round-10 additions (VERDICT items 1+5): the flagship composed
    # curation plan — the most expensive declared query had zero perf
    # record — plus the real-ingestor streaming dedup runs and the
    # hierarchical-router semantic variant
    "corpus_funnel",
    "stream_substr_dedup",
    "stream_semantic_dedup",
    "dedup_semantic_hier",
    "stream_corpus_funnel",
    # round-10 new modalities: model-based quality filtering (broadcast
    # linear-classifier inference + the matching perceptron trainer) and
    # the ANALYZE-style table profile
    "text_classifier_score",
    "text_classifier_train",
    "text_classifier_eval",
    "stream_classifier_train",
    "stats_profile",
    # round-11 additions (VERDICT item 6): the remaining heavy-plan rows
    # with zero regression visibility — dedup_prefix_incremental is the
    # widest plan in PLAN_AUDIT (12 exchanges), curation_pipeline the
    # composed five-stage job — plus the new LM perplexity filter
    "dedup_prefix_incremental",
    "graph_kcore",
    "curation_pipeline",
    "ann_topk_ivfpq",
    "text_lm_perplexity",
    "stream_lm_perplexity",
    "text_lm_backoff",
    "text_lm_buckets",
    "text_classifier_train_hashed",
    "multimodal_phash",
    "stream_phash_dedup",
    "multimodal_frame_phash",
    "multimodal_audio_energy",
    "multimodal_audio_fingerprint",
    "media_funnel",
    # round-12 additions: the two new streaming media modalities (audio
    # near-dup through the parameterized PhashIngestor; the media funnel
    # through the real ingestor store)
    "stream_audio_dedup",
    "stream_media_funnel",
    "stream_frame_dedup",
    "multimodal_audio_meta",
    # round-13 additions: the cross-modal (caption, media) alignment
    # filter — the CLIP-score gate (VERDICT item 2) — plus its per-source
    # stats sibling (sharded)
    "multimodal_align",
    "multimodal_align_stats",
    "multimodal_align_sweep",
    # the retrieval direction (caption -> top-k media via the frozen
    # cluster candidate stage)
    "multimodal_retrieval_topk",
    # the decoupled-caption streaming arm (AlignIngestor: media-key
    # equi-join against the persisted feature index, mid-stream fold)
    "stream_align_ingest",
    # the final pre-training assembly step: temperature mixture -> E-S
    # draw -> BPE-budget packing, composed from three oracled stages
    "corpus_mixture_pack",
    # curriculum assembly: perplexity-tercile-ordered BPE packing
    "corpus_curriculum_pack",
    # round-14: streaming retrieval maintenance (RetrievalIngestor —
    # per-caption top-k under media ingest, mid-stream tiered fold)
    "stream_retrieval_topk",
    # round-14: the one-shot training-run assembly capstone (curate ->
    # mixture select -> BPE pack -> physical shard export + manifest)
    "corpus_training_run",
]

# Final-line overflow shard (round-7): the driver's bounded tail capture
# (2000 chars, BENCH_r04 post-mortem) budgets the FINAL line at 1700
# worst-case; adding the round-7 heavy-tail entries overflows it.  Per the
# contract test's own prescription, the record is SHARDED rather than the
# margin shaved: these entries — each a near-duplicate sibling of an entry
# that stays official (ngram_jaccard uncapped / channel_share_gsets /
# ann_topk_multiprobe) and none with a BASELINE.md table row — move to a
# dedicated non-final {"queries_overflow": ...} line.  They are still timed
# every run, still min-of-N, still in the samples line AND the committed
# bench_samples.json sidecar; only the driver's parsed final line omits
# them.  The final line's "value" remains the total over ALL entries,
# overflow included.
SHARDED = [
    "dedup_ngram_jaccard_capped",
    "channel_running_compare",
    "ann_range_cells",
    # round-8 growth (contract test fired on the new headline entries):
    # all are near-duplicate siblings of entries that stay official
    # (graph_pagerank_k / histogram_quantiles / dedup_lsh_verified /
    # ann_topk_ivf) and none has a BASELINE.md table row
    "graph_pagerank_step",
    "sketch_histogram",
    "dedup_incremental",
    "ann_topk_multiprobe",
    "scd2_user_history",
    # round-9 growth (contract test fired again): siblings of officials
    # (dedup_substring_exact / graph_sssp_k / sketch_countmin /
    # rollup_topk_window / percentiles_exact / ann_topk_ivf), none with a
    # baseline row; the NEW round-9 modalities stay official
    "dedup_substring_maxspan",
    "graph_bfs_hops",
    "sketch_hll",
    "channel_share_gsets",
    "histogram_quantiles",
    "lsh_label_purity",
    # round-10 growth: the three new siblings-with-no-baseline ride the
    # shard (stream_substr_dedup / stream_semantic_dedup /
    # dedup_semantic_hier are the ingestor/router forms of the official
    # dedup_substring_exact / dedup_semantic rows); the NEW composed
    # modality — corpus_funnel — stays official
    "stream_substr_dedup",
    "stream_semantic_dedup",
    "dedup_semantic_hier",
    "stream_corpus_funnel",  # (corpus_funnel)
    # round-10 re-shard (contract headroom): every entry below is a
    # near-duplicate sibling of an entry that STAYS official (named in
    # parens) and none has a BASELINE.md round-1 table row — the 24
    # baseline-gated entries all remain official
    "dedup_containment",  # (dedup_lsh_verified)
    "corpus_split",  # (corpus_curate_spans)
    "percentiles_exact",  # (agg_percentiles)
    "embedding_truncate",  # (ann_topk_int8)
    "zorder_orders",  # (orders_monthly_remerge)
    "dedup_source_mirrors",  # (dedup_exact)
    "text_bigram_rarity",  # (text_fingerprint)
    "snapshot_diff_orders",  # (scd2_incremental)
    "dedup_prefix_filter",  # (dedup_ngram_jaccard)
    "dedup_substring_incremental",  # (dedup_substring_exact)
    "skew_report_lineitem",  # (agg_stats)
    "orders_market_basket",  # (cohort_retention)
    "text_classifier_train",  # (text_classifier_score)
    "text_classifier_eval",  # (text_classifier_score)
    "stream_classifier_train",  # (text_classifier_train)
    # round-11 growth (contract headroom): siblings of entries that stay
    # official — the NEW modalities text_lm_perplexity and
    # stream_lm_perplexity remain official
    "text_lm_backoff",  # (text_lm_perplexity)
    "text_lm_buckets",  # (text_lm_perplexity)
    "text_classifier_train_hashed",  # (text_classifier_score)
    "multimodal_phash",  # (dedup_simhash)
    "stream_phash_dedup",  # (multimodal_phash)
    "multimodal_frame_phash",  # (multimodal_frame_sample)
    "multimodal_audio_energy",  # (multimodal_feature_extract)
    "multimodal_audio_fingerprint",  # (multimodal_audio_energy)
    # round-12 growth (contract headroom): metadata sibling of the
    # official multimodal_meta; the NEW round-12 streaming modalities
    # (stream_audio_dedup / stream_media_funnel / stream_frame_dedup)
    # stay official
    "multimodal_audio_meta",  # (multimodal_meta)
    # round-13 growth: the per-source stats aggregate is a near-duplicate
    # sibling of the official multimodal_align (same CTE, one groupBy on
    # top); the NEW modality row stays official.  Contract headroom also
    # moves stream_frame_dedup — the exact-join arm of the same
    # parameterized media-ingestor path as the official stream_audio_dedup
    # / stream_media_funnel rows, r12-recorded but with no BASELINE
    # round-1 table row
    "multimodal_align_stats",  # (multimodal_align)
    "multimodal_align_sweep",  # (multimodal_align)
    "stream_frame_dedup",  # (stream_audio_dedup)
    # headroom for the official stream_align_ingest row: the streaming
    # funnel twin rides the shard next to its official batch form
    "stream_media_funnel",  # (media_funnel)
    # headroom for the official corpus_mixture_pack row: the streaming LM
    # twin rides the shard next to its official batch form
    "stream_lm_perplexity",  # (text_lm_perplexity)
    # headroom for the official multimodal_retrieval_topk row: the
    # IVF-candidate media pairing twin rides the shard (same frozen
    # cluster stage + exact-integer scoring as the new official row)
    "dedup_multimodal_cosine",  # (multimodal_retrieval_topk)
    # headroom for the official corpus_curriculum_pack row: the LM-score
    # sibling of the official text_lm_perplexity rides the shard, plus
    # the windowed-clean sibling of the official dedup_substring_exact
    "text_lm_buckets",  # (text_lm_perplexity)
    "dedup_substring_clean",  # (dedup_substring_exact)
    # headroom for the official stream_retrieval_topk row (round-14): the
    # curriculum pack is the tercile-ordered sibling of the official
    # corpus_mixture_pack (same E-S draw + BPE-budget packing law),
    # r13-recorded, no BASELINE round-1 row
    "corpus_curriculum_pack",  # (corpus_mixture_pack)
    # headroom for the official corpus_training_run row (round-14): the
    # curate stage rides INSIDE the capstone verbatim (LSH-verify ->
    # components -> quality gate), so the standalone pipeline row is its
    # strict-subset sibling; no BASELINE round-1 row
    "curation_pipeline",  # (corpus_training_run)
]

QUEUE_JOBS = int(os.environ.get("SPARK_GRAFT_QUEUE_JOBS", "2000"))
QUEUE_FANOUT = 20  # queues, mirroring redis_benchmark defaults


def executed_plan_counts(df) -> dict[str, int] | None:
    """Join/exchange node counts from the EXECUTED (AQE-final) physical
    plan — round-14's drift forensics (r13 VERDICT item 6).  PLAN_AUDIT
    records the COMPILED plan on the builder host; the r13 driver-record
    mystery (three entries 3-7x over band on unchanged code and clean
    compiled plans) was undiagnosable because nothing recorded what the
    runtime actually ran.  Capturing the post-execution plan string from
    the same DataFrame the timed run collected turns any future
    band-breach into a one-artifact diagnosis: counts moved => the
    RUNTIME plan changed (AQE non-conversion, lost broadcast); counts
    flat => the host moved.  Counts, not plan text: stable across id
    renumbering, small enough for the sidecar."""
    try:
        plan = df._jdf.queryExecution().executedPlan().toString()
    except Exception:
        return None
    # AdaptiveSparkPlan.toString() appends the pre-AQE "== Initial Plan =="
    # section after the final one; counting the whole string conflates
    # planned-but-replaced nodes with executed ones (round-14 measurement
    # fix: curation_pipeline showed smj:1 from the Initial section while
    # the Final plan ran a BroadcastHashJoin — exactly the drift signal
    # this counter exists to isolate).  Count only the final section.
    cut = plan.find("== Initial Plan ==")
    if cut != -1:
        plan = plan[:cut]
    return {
        "smj": plan.count("SortMergeJoin"),
        "bhj": plan.count("BroadcastHashJoin"),
        "shj": plan.count("ShuffledHashJoin"),
        "bnlj": plan.count("BroadcastNestedLoopJoin"),
        "cart": plan.count("CartesianProduct"),
        # shuffle exchanges only (BroadcastExchange counted via bex): in
        # the executed string AQE rewrites reused stages, so count every
        # partitioning spelling
        "exch": sum(
            plan.count(s)
            for s in (
                "Exchange hashpartitioning",
                "Exchange rangepartitioning",
                "Exchange SinglePartition",
            )
        ),
        "bex": plan.count("BroadcastExchange"),
    }


def bench_queries(
    spark,
) -> tuple[dict[str, float], dict[str, list[float]], dict[str, dict]]:
    from flume_spark.queries import all_queries

    queries = all_queries()
    # warm the JVM / parquet reader / Arrow path once so the first timed
    # query isn't charged for session startup
    spark.read.parquet(os.path.join(SF_DIR, "nation.parquet")).count()
    # JIT warm-up: run every headline query once at the SMALLEST scale so
    # whole-stage-codegen compilation happens outside the timed run — the
    # timed numbers then measure execution at SF_DIR, not first-call
    # compilation (which dominated the expression-heavy queries: bm25
    # measured 18s cold vs 0.7s warm on an idle host; see BASELINE.md).
    warm_dir = os.environ.get(
        "SPARK_GRAFT_WARM_DIR",
        os.path.join(os.path.dirname(SF_DIR.rstrip("/")), "sf0.001"),
    )
    if os.path.isdir(warm_dir) and os.path.abspath(warm_dir) != os.path.abspath(SF_DIR):
        for name in HEADLINE:
            try:
                queries[name](spark, warm_dir).collect()
            except Exception:
                pass  # warm-up is best-effort; the timed run surfaces errors
    else:
        print(
            f"WARNING: warm-up dir {warm_dir} unavailable — timings include "
            "first-call codegen (see BASELINE.md methodology note)",
            file=sys.stderr,
        )
    # Steal-robust timing (round-3 VERDICT item 1): this host documents
    # 4-20x hypervisor-steal spikes on identical code (BASELINE.md —
    # queue_process 2.1s->44.8s; r03's dedup_minhash_lsh 63.5s vs ~4.3s on a
    # plan unchanged since round 1).  One stolen window must not invalidate
    # a round, so each query runs SAMPLES times and reports the per-query
    # MIN — the best-case sample is the one that reflects the plan, not the
    # scheduler.  All samples ship in a "samples" field for transparency.
    samples_n = int(os.environ.get("SPARK_GRAFT_BENCH_SAMPLES", "3"))
    timings: dict[str, float] = {}
    samples: dict[str, list[float]] = {}
    plans: dict[str, dict] = {}
    import gc

    for name in HEADLINE:
        # Per-entry session hygiene (round-13, the graph_pagerank_k
        # post-mortem): operators legitimately .cache()/.localCheckpoint()
        # inside a run and the references leak across entries — after ~47
        # entries x 4 runs the accumulated pinned blocks held pagerank_k at
        # a 5.2s floor in-suite vs 2.4s isolated (same plan, same host).
        # Dropping dead python refs + clearing the cache between entries
        # makes each timing measure ITS plan, not the suite's junk; measured
        # recovery 3.8/3.0/2.1 -> 2.3/1.8/1.8 on a polluted session.
        spark.catalog.clearCache()
        gc.collect()
        fn = queries[name]
        runs: list[float] = []
        df = None
        for _ in range(samples_n):
            start = time.perf_counter()
            df = fn(spark, SF_DIR)
            rows = df.collect()
            runs.append(round(time.perf_counter() - start, 3))
            assert rows is not None
        timings[name] = min(runs)
        samples[name] = runs
        # executed-plan forensics from the LAST timed run's DataFrame (the
        # collect above finalized its AQE plan) — see executed_plan_counts
        counts = executed_plan_counts(df)
        if counts is not None:
            plans[name] = counts
    return timings, samples, plans


def bench_queue(spark, jobs: int | None = None) -> dict[str, float]:
    from flume_spark.queue import JobStore, QueueManager, WorkerRegistry
    from flume_spark.queue.manager import Pipeline

    jobs = QUEUE_JOBS if jobs is None else jobs
    tmp = tempfile.mkdtemp(prefix="flume_bench_")
    try:
        registry = WorkerRegistry()
        registry.register("NoopWorker", lambda *args: None)
        store = JobStore(spark, os.path.join(tmp, "jobs"))
        pipelines = [
            Pipeline(name=f"p{i}", queue=f"q{i}", max_demand=500)
            for i in range(QUEUE_FANOUT)
        ]
        manager = QueueManager(spark, store, registry, pipelines)

        start = time.perf_counter()
        per_queue = max(1, jobs // QUEUE_FANOUT)
        n_seeded = per_queue * QUEUE_FANOUT  # actual total (integer dust)
        payload = ["x" * 500]  # ~0.5 kB payload tier from the reference bench
        for i in range(QUEUE_FANOUT):
            manager.bulk_enqueue(
                f"q{i}", [("NoopWorker", "perform", payload)] * per_queue
            )
        enqueue_s = time.perf_counter() - start

        start = time.perf_counter()
        names = [f"p{i}" for i in range(QUEUE_FANOUT)]
        done = 0
        while done < n_seeded:  # drain: demand caps each trigger at 500/queue
            got = manager.run_many(names)["succeeded"]
            if got == 0:
                break
            done += got
        process_s = time.perf_counter() - start
        assert done == n_seeded, f"processed {done}/{n_seeded}"

        # interleaved enqueue/dequeue — the contended third scenario of the
        # reference bench (redis_benchmark.ex:48-89): producers keep
        # appending while the drain loop claims.  Exercises concurrent
        # append + claim + auto-compaction on one live log.
        import threading

        store2 = JobStore(spark, os.path.join(tmp, "jobs_interleaved"))
        manager2 = QueueManager(spark, store2, registry, pipelines)
        pre = jobs // 2  # pre-seed x1 tier, half the volume up front
        pre_seeded = (pre // QUEUE_FANOUT) * QUEUE_FANOUT  # actual total
        for i in range(QUEUE_FANOUT):
            manager2.bulk_enqueue(
                f"q{i}", [("NoopWorker", "perform", payload)] * (pre // QUEUE_FANOUT)
            )
        expected2 = pre_seeded + (jobs - pre)

        def producer() -> None:
            remaining, qi, chunk = jobs - pre, 0, 100
            while remaining > 0:
                n = min(chunk, remaining)
                manager2.bulk_enqueue(
                    f"q{qi % QUEUE_FANOUT}", [("NoopWorker", "perform", payload)] * n
                )
                remaining -= n
                qi += 1
                time.sleep(0.005)

        start = time.perf_counter()
        t = threading.Thread(target=producer)
        t.start()
        done2 = 0
        for _ in range(1000):  # bounded; normally exits by the break below
            done2 += manager2.run_many(names)["succeeded"]
            if done2 >= expected2 and not t.is_alive():
                break
        t.join()
        interleaved_s = time.perf_counter() - start
        assert done2 == expected2, f"interleaved processed {done2}/{expected2}"
        return {
            "queue_enqueue": round(enqueue_s, 3),
            "queue_process": round(process_s, 3),
            "queue_interleaved": round(interleaved_s, 3),
        }
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def bench_stream_latency(spark) -> dict[str, float]:
    """Enqueue→ack latency through the LIVE streaming pipeline (2 s trigger,
    rate-limit governor active) — quantifies the micro-batch latency floor
    SURVEY.md hard-part #3 concedes (reference dispatches within its ~2 s
    GenStage poll; sub-100 ms is out of scope for both).  Jobs arrive one at
    a time over ~8 s; latency per job = ack's finished_at minus the enqueue
    wall-clock, reported as p50/p95 seconds.
    """
    from datetime import timezone

    from flume_spark.queue import JobStore, QueueManager, WorkerRegistry
    from flume_spark.queue.manager import Pipeline
    from flume_spark.streaming.pipeline import PipelineRunner

    n_jobs = int(os.environ.get("SPARK_GRAFT_LATENCY_JOBS", "24"))
    tmp = tempfile.mkdtemp(prefix="flume_bench_lat_")
    try:
        registry = WorkerRegistry()
        registry.register("NoopWorker", lambda *args: None)
        store = JobStore(spark, os.path.join(tmp, "jobs"))
        pipeline = Pipeline(
            name="lat",
            queue="lat",
            max_demand=500,
            rate_limit_count=1000,  # governor active, budget un-binding
            rate_limit_scale=1000,
        )
        manager = QueueManager(spark, store, registry, pipelines=[pipeline])
        runner = PipelineRunner(
            spark,
            manager,
            pipeline,
            checkpoint_dir=os.path.join(tmp, "ckpt"),
            trigger_seconds=2.0,  # the reference's @default_interval poll
        )
        runner.start()
        try:
            enq_at: dict[str, float] = {}
            for i in range(n_jobs):
                jid = manager.enqueue("lat", "NoopWorker", [i])
                enq_at[jid] = time.time()
                time.sleep(8.0 / n_jobs)
            deadline = time.time() + 60
            while time.time() < deadline:
                runner.await_idle()
                rows = (
                    manager.current()
                    .filter("status = 'succeeded'")
                    .select("jid", "finished_at")
                    .collect()
                )
                if len(rows) >= n_jobs:
                    break
                time.sleep(0.5)
            assert len(rows) == n_jobs, f"acked {len(rows)}/{n_jobs}"
        finally:
            runner.stop()
        import math

        lats = sorted(
            r["finished_at"].replace(tzinfo=timezone.utc).timestamp() - enq_at[r["jid"]]
            for r in rows
        )
        # ceil-based order statistic: index ceil(q*n)-1 (int(q*n)-1 would
        # report ~p90 at n=24)
        p95_idx = max(0, math.ceil(len(lats) * 0.95) - 1)
        return {
            "queue_stream_latency_p50": round(lats[len(lats) // 2], 3),
            "queue_stream_latency_p95": round(lats[p95_idx], 3),
        }
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def spread_record(samples: dict[str, list[float]]) -> dict[str, list[float]]:
    """Per-entry [min, median, max] — the drift-tripwire sidecar summary
    (round-13 VERDICT item 5).  Median is the lower-middle order statistic
    so every reported value is an actually-observed sample."""
    out: dict[str, list[float]] = {}
    for name, runs in samples.items():
        s = sorted(runs)
        out[name] = [s[0], s[(len(s) - 1) // 2], s[-1]]
    return out


def check_drift(
    mins: dict[str, float], bands: dict[str, float], factor: float = 1.5
) -> list[tuple[str, float, float, float]]:
    """Drift tripwire: entries whose current MIN exceeds `factor` x their
    recorded band (bench_bands.json = best calm-host min on an unchanged
    plan).  Returns (name, current_min, band, ratio) rows, worst first.
    Entries without a band (new this round) are skipped — they earn a band
    when first recorded.  Sub-0.3s bands are noise-floored to 0.3s: the
    documented host wobble on sub-second entries is +-0.1s (BASELINE.md's
    round-12 note records 1.3-1.4x moves on such rows as ambient), so a
    0.18s->0.28s scheduler blip must not fail a round."""
    drifted = []
    for name, band in bands.items():
        cur = mins.get(name)
        if cur is None:
            continue
        floor = max(band, 0.3)
        if cur > factor * floor:
            drifted.append((name, cur, band, round(cur / floor, 2)))
    return sorted(drifted, key=lambda r: -r[3])


def emit_records(
    timings: dict[str, float], samples: dict[str, list[float]], sf: str
) -> tuple[str, str, str]:
    """Build the three output lines: (samples_line, shard_line, final_line).

    Transparency channel (round-4 VERDICT item 1): the full per-sample
    record goes on its OWN earlier line (and a sidecar file); the FINAL
    line stays compact (metric/value/queries/sf, compact separators) so a
    bounded tail capture of the last line never truncates the official
    record — embedding samples in the final line is what made
    BENCH_r04.json unparseable.  Round-7: SHARDED entries ride a dedicated
    non-final {"queries_overflow": ...} line (see SHARDED for why); the
    final line's "value" still totals ALL entries.  Contract pinned by
    tests/test_bench_contract.py.
    """
    samples_line = json.dumps({"samples": samples}, separators=(",", ":"))
    # Final-line timings at 2dp (samples keep full precision): per-query
    # noise on this host is >> 10 ms, and the saved character per entry is
    # what keeps 60+ queries inside the driver's bounded tail capture.
    compact = {n: round(v, 2) for n, v in timings.items()}
    overflow = {n: compact.pop(n) for n in SHARDED if n in compact}
    shard_line = json.dumps({"queries_overflow": overflow}, separators=(",", ":"))
    final_line = json.dumps(
        {
            "metric": "headline_suite_seconds",
            "value": round(sum(compact.values()) + sum(overflow.values()), 2),
            "unit": "sec",
            "queries": compact,
            "sf": sf,
        },
        separators=(",", ":"),
    )
    return samples_line, shard_line, final_line


def main() -> None:
    spark = get_spark(app_name="flume_spark_bench")
    timings, samples, plans = bench_queries(spark)
    # warm the queue engine's codegen/claim path at 1/10 volume first — the
    # query warm-up above doesn't touch it, and cold-JIT inflates
    # queue_process ~7x (10.7s cold vs 1.4s warm on an idle host), the same
    # execution-not-compilation methodology as the sf0.001 query warm-up
    bench_queue(spark, jobs=max(QUEUE_FANOUT, QUEUE_JOBS // 10))
    # min-of-N for the queue section too (round-4 VERDICT item 2): a steal
    # spike in one queue_process sample must not invalidate a round.  Each
    # sample is an independent tmpdir-backed store, so repeats are isolated.
    queue_samples_n = int(os.environ.get("SPARK_GRAFT_QUEUE_SAMPLES", "3"))
    queue_runs = [bench_queue(spark) for _ in range(queue_samples_n)]
    for key in queue_runs[0]:
        vals = [r[key] for r in queue_runs]
        timings[key] = min(vals)
        samples[key] = vals
    # latency entries join `samples` too (single-sample lists): the
    # --check gate derives mins from the sidecar samples record, so an
    # entry absent there could never fail its band (round-13 review)
    latency = bench_stream_latency(spark)
    timings.update(latency)
    for key, val in latency.items():
        samples[key] = [val]
    samples_line, shard_line, final_line = emit_records(
        timings, samples, SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    )
    spread_line = json.dumps(
        {"spread": spread_record(samples)}, separators=(",", ":")
    )
    # executed-plan record (round-14): per-entry AQE-FINAL node counts on
    # its own non-final line + the sidecar, so a band breach in any later
    # record is diagnosable as plan-delta vs host-delta from artifacts
    # alone (the r13 gap).  bench_plans.json holds the committed
    # known-good counts; --check compares.
    plans_line = json.dumps({"plans": plans}, separators=(",", ":"))
    print(samples_line)
    print(spread_line)
    print(plans_line)
    print(shard_line)
    sidecar = os.environ.get(
        "SPARK_GRAFT_BENCH_SIDECAR",
        os.path.join(os.path.dirname(os.path.abspath(__file__)), "bench_samples.json"),
    )
    try:
        with open(sidecar, "w") as fh:
            fh.write(samples_line + "\n")
            fh.write(spread_line + "\n")
            fh.write(plans_line + "\n")
    except OSError:
        pass  # sidecar is best-effort; the stdout line is the durable copy
    # drift tripwire (round-13 VERDICT item 5): advisory on a normal run —
    # print drifted entries so a regression is visible in the round record
    # without failing the bench itself; `bench.py --check` is the gating arm
    drifted = check_drift(timings, _load_bands())
    if drifted:
        print(
            json.dumps({"drift": [list(r) for r in drifted]}, separators=(",", ":")),
            file=sys.stderr,
        )
    print(final_line)


def _load_bands() -> dict[str, float]:
    path = os.environ.get(
        "SPARK_GRAFT_BENCH_BANDS",
        os.path.join(os.path.dirname(os.path.abspath(__file__)), "bench_bands.json"),
    )
    try:
        with open(path) as fh:
            return {k: float(v) for k, v in json.load(fh).items()}
    except (OSError, ValueError):
        return {}


def _load_expected_plans() -> dict[str, dict]:
    path = os.environ.get(
        "SPARK_GRAFT_BENCH_PLANS",
        os.path.join(os.path.dirname(os.path.abspath(__file__)), "bench_plans.json"),
    )
    try:
        with open(path) as fh:
            return json.load(fh)
    except (OSError, ValueError):
        return {}


def plan_delta_note(
    name: str, recorded: dict[str, dict], expected: dict[str, dict]
) -> str:
    """One-line diagnosis for a drifted entry: did the EXECUTED plan's
    node counts move vs the committed known-good record (plan-delta — a
    runtime regression: lost broadcast, AQE non-conversion) or not
    (time-only — the host moved, the plan didn't)?  This is the message
    split the r13 mystery lacked."""
    got = recorded.get(name)
    want = expected.get(name)
    if got is None or want is None:
        return "no-plan-record"
    diffs = {
        k: (want.get(k), got.get(k))
        for k in sorted(set(want) | set(got))
        if want.get(k) != got.get(k)
    }
    if diffs:
        pretty = ",".join(f"{k}:{w}->{g}" for k, (w, g) in diffs.items())
        return f"PLAN-DELTA {pretty}"
    return "time-only (executed plan unchanged — host/suite-state, not code)"


def check_main() -> int:
    """`bench.py --check`: compare the LAST RECORDED run (bench_samples.json
    sidecar) against bench_bands.json; exit 1 listing any entry whose min
    drifted >1.5x its band, each annotated plan-delta vs time-only from the
    executed-plan record (bench_plans.json = committed known-good counts).
    No Spark session — this reads artifacts, so it can gate a round after
    the real run completes."""
    sidecar = os.environ.get(
        "SPARK_GRAFT_BENCH_SIDECAR",
        os.path.join(os.path.dirname(os.path.abspath(__file__)), "bench_samples.json"),
    )
    samples: dict[str, list[float]] = {}
    recorded_plans: dict[str, dict] = {}
    with open(sidecar) as fh:
        for line in fh:
            try:
                rec = json.loads(line)
            except ValueError:
                continue
            samples = rec.get("samples", samples)
            recorded_plans = rec.get("plans", recorded_plans)
    mins = {k: min(v) for k, v in samples.items()}
    drifted = check_drift(mins, _load_bands())
    if drifted:
        expected = _load_expected_plans()
        for name, cur, band, ratio in drifted:
            note = plan_delta_note(name, recorded_plans, expected)
            print(f"DRIFT {name}: min {cur}s vs band {band}s ({ratio}x) [{note}]")
        return 1
    print(f"OK: {len(mins)} entries within 1.5x of their bands")
    return 0


def record_plans_main() -> int:
    """`bench.py --record-plans`: promote the last recorded run's executed-
    plan counts (sidecar) to bench_plans.json — run after a calm run whose
    plan changes are INTENTIONAL (new entries, a deliberate plan change),
    then commit the file.  Refresh discipline mirrors bench_bands.json."""
    sidecar = os.environ.get(
        "SPARK_GRAFT_BENCH_SIDECAR",
        os.path.join(os.path.dirname(os.path.abspath(__file__)), "bench_samples.json"),
    )
    plans: dict[str, dict] = {}
    with open(sidecar) as fh:
        for line in fh:
            try:
                rec = json.loads(line)
            except ValueError:
                continue
            plans = rec.get("plans", plans)
    if not plans:
        print("no plans record in sidecar — run bench.py first", file=sys.stderr)
        return 1
    path = os.environ.get(
        "SPARK_GRAFT_BENCH_PLANS",
        os.path.join(os.path.dirname(os.path.abspath(__file__)), "bench_plans.json"),
    )
    with open(path, "w") as fh:
        json.dump(plans, fh, indent=0, sort_keys=True, separators=(",", ": "))
        fh.write("\n")
    print(f"recorded executed-plan counts for {len(plans)} entries -> {path}")
    return 0


if __name__ == "__main__":
    if "--check" in sys.argv[1:]:
        sys.exit(check_main())
    if "--record-plans" in sys.argv[1:]:
        sys.exit(record_plans_main())
    main()
