#!/usr/bin/env python
"""Scale probes for the blessed 100 TB near-dup paths.

Replicates the sf0.1 corpus by a factor f with PERTURBED content — half the
tokens salted per replica (docs) / circular vector shift + alternating sign
(embeddings) — so the corpus grows without creating cross-replica near-dup
clusters: output size stays ~linear in the corpus and wall-clock measures
PLAN scaling, not output explosion (the round-2 x10 probe conflated the
two; see BASELINE.md).

Probed operators (the blessed scale paths):
- minhash_lsh_candidates  — banded candidate join, O(docs x bands)
- lsh_verified_pairs      — the composed default: LSH candidates ->
                            exact-Jaccard verification of candidates only
- cosine_pairs            — block-matrix matmul similarity join; blocks
                            chosen ~ sqrt(f) so per-group submatrices stay
                            near-constant while group count grows ~ N

Usage: python probe_scale.py [factor ...]   (default: 1 10 50)
Prints one JSON line per (operator, factor) and a summary with the fitted
wall-clock exponent log(t_f/t_1)/log(f) — ~1.0 = linear, 2.0 = quadratic.

`python probe_scale.py --ingest [factor ...]` runs the incremental-ingest
amortization probe instead: per-ingest cost of probing a fixed 5k-doc
batch against a PERSISTED band index at each history factor, comparing
the plain-parquet index (probe join shuffles both sides) against the
band-key-bucketed table (index side exchange-free — the layout
BASELINE.md names for 100 TB).

`python probe_scale.py --cms [factor ...]` runs the streaming count-min
merge probe: whole-history estimate cost and the eps*N error bound as
the per-batch sketch history grows x1 -> x50 (flat state per batch,
cell-wise-exact merge).

`python probe_scale.py --graph [factor ...]` runs the PageRank edge-layout
probe: per-iteration wall-clock off the src-bucketed+degree-decorated
edge index vs plain parquet as the edge table grows — the timed evidence
behind the exchange-free plan gate (test_round5_ops.py).

`python probe_scale.py --substr [factor ...]` runs the exact-substring
dedup probe: whole-corpus window stats (expect ~linear) and the
at-ingest cost of a fixed batch against a persisted bucketed window
index as history grows (expect ~flat).

`python probe_scale.py --semantic [factor ...]` runs the SemDeDup probe
with cluster count grown with the corpus (k = 4f), the discipline that
keeps the within-cluster pairwise leg ~linear.

`python probe_scale.py --classifier [factor ...]` runs the broadcast
linear-classifier inference probe: `classifier_score` wall over salted
replica corpora (expect ~linear — constant-size broadcast weights, no
pairwise leg).

`python probe_scale.py --funnel [factor ...]` runs the corpus-funnel
composition probe: per-stage isolated cost, composed end-to-end wall,
the stage-additivity ratio, and the report-share re-inlining detector.

`python probe_scale.py --phash [factor ...]` runs the streaming
perceptual-hash ingest probe: per-ingest cost of a fixed payload batch
against the band-bucket-partitioned fingerprint index as history grows,
compacted base vs raw per-batch trees (expect both ~flat probe reads;
compaction bounds the directory-listing growth).

`python probe_scale.py --frame [factor ...]` runs the same ingest probe
for the frame-containment FrameIngestor (exact fhash equi-join probe).

`python probe_scale.py --ts [factor ...]` runs the time-series
similarity-search probe: users replicated with per-replica value shifts
(cross-replica words differ, so candidate pairs stay ~linear in users —
the output-linear perturbation discipline), wall-clock exponent of the
full PAA -> SAX -> block -> verify pipeline.
"""

from __future__ import annotations

import atexit
import json
import math
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402

from flume_spark.operators import dedup  # noqa: E402
from flume_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def scaled_docs(spark, factor: int):
    """f perturbed replicas: every even-position token gets a per-replica
    salt suffix, so replicas of one doc share ~no 2-gram shingles and the
    near-dup structure of the base corpus is preserved, not multiplied."""
    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet")).select(
        "doc_id", "text"
    )
    reps = spark.range(factor).withColumnRenamed("id", "rep")
    out = docs.crossJoin(reps).select(
        (F.col("doc_id") + F.col("rep") * 10_000_000).alias("doc_id"),
        F.expr(
            "array_join(transform(split(lower(trim(text)), '\\\\s+'), "
            "(w, j) -> IF(j % 2 = 0, concat(w, '_r', cast(rep as string)), w)), ' ')"
        ).alias("text"),
    )
    return out.localCheckpoint(eager=True)  # corpus synthesis outside timings


def scaled_embeddings(spark, factor: int):
    """f perturbed replicas via a per-replica Rademacher (diagonal ±1)
    transform: element i of replica r flips sign iff xxhash64(r, i) is odd.
    A shared diagonal ±1 preserves every within-replica pairwise cosine
    (cos(Da, Db) = cos(a, b) since D² = I), while two replicas' different
    sign patterns decorrelate cross-replica cosines for EVERY pair of
    replicas — unlike a circular shift, which repeats every `dim` replicas
    and silently duplicated vectors at factors > dim (earlier probe bug)."""
    emb = spark.read.parquet(os.path.join(SF_DIR, "embeddings.parquet")).select(
        "vec_id", "embedding"
    )
    reps = spark.range(factor).withColumnRenamed("id", "rep")
    out = emb.crossJoin(reps).select(
        (F.col("vec_id") + F.col("rep") * 10_000_000).alias("vec_id"),
        F.expr(
            "transform(embedding, (x, i) -> "
            "IF(pmod(xxhash64(rep, i), 2) = 1, -x, x))"
        ).alias("embedding"),
    )
    return out.localCheckpoint(eager=True)


def probe(name: str, fn) -> tuple[float, int]:
    t0 = time.perf_counter()
    n = fn().count()
    dt = time.perf_counter() - t0
    print(json.dumps({"probe": name, "sec": round(dt, 2), "rows": n}), flush=True)
    return dt, n


def main() -> None:
    factors = [int(a) for a in sys.argv[1:]] or [1, 10, 50]
    spark = get_spark(app_name="flume_probe_scale")
    results: dict[str, dict[int, float]] = {}
    for f in factors:
        docs = scaled_docs(spark, f)
        emb = scaled_embeddings(spark, f)
        n_docs, n_vecs = docs.count(), emb.count()
        print(json.dumps({"factor": f, "docs": n_docs, "vectors": n_vecs}), flush=True)
        blocks = max(8, 8 * int(math.sqrt(f)))
        ops = {
            "minhash_lsh": lambda d=docs: dedup.minhash_lsh_candidates(
                d, "doc_id", "text", shingle_n=2, num_hashes=16, bands=4
            ),
            "lsh_verified": lambda d=docs: dedup.lsh_verified_pairs(
                d, "doc_id", "text", shingle_n=2, num_hashes=16, bands=4, threshold=0.3
            ),
            "cosine_block": lambda e=emb, b=blocks: dedup.cosine_pairs(
                e, "vec_id", "embedding", threshold=0.4, blocks=b
            ),
            # passage-level dedup (round-3): chunk-hash shuffle should be
            # ~linear in corpus tokens; the salted perturbation keeps
            # cross-replica chunks distinct so output stays ~linear too
            "passage_dedup": lambda d=docs: dedup.passage_dedup_stats(
                d, "doc_id", "text", chunk_tokens=16
            ),
        }
        for op, make in ops.items():
            dt, _ = probe(f"{op}@x{f}", make)
            results.setdefault(op, {})[f] = dt
        docs.unpersist()
        emb.unpersist()
        # release the shingle index lsh_verified_pairs cached for this factor
        # so later factors' timings aren't skewed by LRU churn
        spark.catalog.clearCache()
    base = factors[0]
    summary = {}
    for op, times in results.items():
        t1 = times[base]
        exps = {
            f: round(math.log(times[f] / t1) / math.log(f / base), 2)
            for f in factors
            if f != base and times[f] > 0
        }
        summary[op] = {"sec": {k: round(v, 2) for k, v in times.items()}, "exponent": exps}
    print(json.dumps({"summary": summary}), flush=True)


def main_ingest() -> None:
    """Per-ingest cost vs history size, plain vs bucketed persisted index.

    Timed span per ingest = band the batch in-plan + probe the persisted
    index (the work a pipeline pays per arriving batch); min-of-3 after a
    warm run, so one stolen scheduler window can't fake a regression.
    Index build time is reported separately (the amortized one-time cost).
    """
    import tempfile

    factors = [int(a) for a in sys.argv[2:]] or [1, 10, 50]
    spark = get_spark(app_name="flume_probe_ingest")
    tmp = tempfile.mkdtemp(prefix="ingest_probe_")
    batch = (
        spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
        .select((F.col("doc_id") + 900_000_000).alias("doc_id"), "text")
        .limit(5000)
        .localCheckpoint(eager=True)
    )
    for f in factors:
        hist = scaled_docs(spark, f)
        hb = dedup.banded_signatures(hist, "doc_id", "text", 2, 16, 4)
        plain_path = os.path.join(tmp, f"idx_plain_x{f}")
        t0 = time.perf_counter()
        dedup.with_band_key(hb).select("id", "band_key").write.parquet(plain_path)
        build_plain = time.perf_counter() - t0
        tbl = f"ingest_probe_idx_x{f}"
        spark.sql(f"DROP TABLE IF EXISTS {tbl}")
        t0 = time.perf_counter()
        dedup.write_band_index(
            hb, tbl, os.path.join(tmp, f"idx_bucket_x{f}"), buckets=32
        )
        build_bucket = time.perf_counter() - t0
        variants = {
            "plain": lambda: spark.read.parquet(plain_path),
            "bucketed": lambda: dedup.read_band_index(spark, tbl),
        }
        out = {"factor": f, "index_rows": dedup.read_band_index(spark, tbl).count(),
               "build_plain_s": round(build_plain, 2),
               "build_bucket_s": round(build_bucket, 2)}
        for name, idx in variants.items():
            samples = []
            for i in range(4):  # first run warms; min of the last 3
                t0 = time.perf_counter()
                n = dedup.incremental_lsh_candidates(
                    None, None, "doc_id", "text", 2, 16, 4,
                    history_banded=idx(),
                    new_banded=dedup.banded_signatures(
                        batch, "doc_id", "text", 2, 16, 4
                    ),
                ).count()
                samples.append(round(time.perf_counter() - t0, 2))
            out[f"ingest_{name}_s"] = min(samples[1:])
            out[f"ingest_{name}_samples"] = samples
            out["pairs"] = n
        print(json.dumps(out), flush=True)
        spark.sql(f"DROP TABLE IF EXISTS {tbl}")
        hist.unpersist()
    import shutil

    shutil.rmtree(tmp, ignore_errors=True)


def main_cms() -> None:
    """Streaming count-min merge-at-scale probe: per-QUERY cost of the
    whole-history estimate, and the CMS error bound, as the slice count
    grows x1 -> x50 (the LshIngestor amortization treatment applied to
    CmsIngestor).

    The point being measured: state per micro-batch is depth x width
    counters REGARDLESS of key cardinality, so a history of f slices
    merges f*d*w rows (256/slice at the 4x64 default) — the estimate's
    wall-clock should stay ~flat (fixed-overhead-dominated) while the
    history grows 50x, and every key's over-count must stay within
    eps*N (eps = e/width) of f x its per-slice truth, because cell-wise
    merge is EXACT for the sketch (merge-then-estimate ==
    estimate-then-sum bounds).
    """
    import math as _math
    import shutil
    import tempfile

    from flume_spark.streaming.sketch import CmsIngestor

    factors = sorted(int(a) for a in sys.argv[2:]) or [1, 10, 50]
    spark = get_spark(app_name="flume_probe_cms")
    tmp = tempfile.mkdtemp(prefix="cms_probe_")
    try:
        # one fixed 20k-key batch, replayed as every slice: true count
        # after f slices = f x per-slice truth — exactly checkable
        batch = (
            spark.read.parquet(os.path.join(SF_DIR, "orders.parquet"))
            .select(F.col("o_custkey").alias("key"))
            .limit(20_000)
            .localCheckpoint(eager=True)
        )
        n_batch = batch.count()
        per_slice = {
            r["key"]: r["n"]
            for r in batch.groupBy("key").agg(F.count(F.lit(1)).alias("n")).collect()
        }
        keys = batch.distinct().localCheckpoint(eager=True)
        width = 64
        ing = CmsIngestor(
            spark,
            os.path.join(tmp, "sk"),
            os.path.join(tmp, "lg"),
            key_col="key",
            depth=4,
            width=width,
        )
        done = 0
        for f in factors:
            while done < f:
                ing.process(batch, done)
                done += 1
            samples = []
            for _ in range(4):  # first warms; min of the last 3
                t0 = time.perf_counter()
                est_rows = ing.estimate(keys).collect()
                samples.append(round(time.perf_counter() - t0, 2))
            est = {r["key"]: r["freq_estimate"] for r in est_rows}
            n_total = f * n_batch
            eps_bound = _math.e / width * n_total
            worst_over = 0
            for k, t in per_slice.items():
                true_f = f * t
                assert est[k] >= true_f, (k, est[k], true_f)  # never under
                worst_over = max(worst_over, est[k] - true_f)
            assert worst_over <= eps_bound, (worst_over, eps_bound)
            print(
                json.dumps(
                    {
                        "probe": f"cms_estimate@x{f}",
                        "slices": f,
                        "merged_rows": f * 4 * width,
                        "sec": min(samples[1:]),
                        "samples": samples,
                        "worst_overcount": int(worst_over),
                        "eps_bound": int(eps_bound),
                    }
                ),
                flush=True,
            )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def main_graph() -> None:
    """Per-iteration PageRank cost: bucketed+decorated edge index vs plain
    parquet, at growing edge counts.

    The edge table is a deterministic synthetic expander (each vertex ->
    16 pseudo-random targets via a multiplicative hash) scaled by vertex
    count, so |E| grows linearly and no vertex is a hub.  Timed span =
    ONE exact-integer iteration (pagerank_k_exact iters=1, collect-free
    count), min-of-3 after a warm run.  The bucketed layout pays 2
    exchanges (rank vector + dst partial-agg); plain parquet re-shuffles
    the edge table per iteration — the wall-clock gap should WIDEN with
    |E| while the bucketed per-iteration cost tracks the rank vector.
    """
    import shutil
    import tempfile

    from flume_spark.operators import graph

    factors = sorted(int(a) for a in sys.argv[2:]) or [1, 10, 50]
    spark = get_spark(app_name="flume_probe_graph")
    # buckets == shuffle partitions: the layout's deployment contract
    buckets = int(spark.conf.get("spark.sql.shuffle.partitions"))
    tmp = tempfile.mkdtemp(prefix="graph_probe_")
    base_v = 20_000
    try:
        for f in factors:
            n_v = base_v * f
            edges = (
                spark.range(n_v)
                .select(
                    F.col("id").alias("src"),
                    F.explode(F.sequence(F.lit(1), F.lit(16))).alias("j"),
                )
                .select(
                    "src",
                    ((F.col("src") * 2654435761 + F.col("j") * 40503) % n_v)
                    .alias("dst"),
                )
                .filter(F.col("src") != F.col("dst"))
            )
            plain_path = os.path.join(tmp, f"edges_plain_x{f}")
            edges.write.mode("overwrite").parquet(plain_path)
            tbl = f"graph_probe_eidx_x{f}"
            spark.sql(f"DROP TABLE IF EXISTS {tbl}")
            t0 = time.perf_counter()
            graph.write_edge_index(
                spark.read.parquet(plain_path),
                tbl,
                os.path.join(tmp, f"edges_idx_x{f}"),
                buckets=buckets,
            )
            build_s = time.perf_counter() - t0
            out = {
                "probe": f"pagerank_iter@x{f}",
                "edges": spark.table(tbl).count(),
                "build_index_s": round(build_s, 2),
            }
            for name, edge_df in (
                ("plain", spark.read.parquet(plain_path)),
                ("bucketed", spark.table(tbl)),
            ):
                samples = []
                for _ in range(4):  # first warms; min of the last 3
                    t0 = time.perf_counter()
                    graph.pagerank_k_exact(edge_df, iters=1).count()
                    samples.append(round(time.perf_counter() - t0, 2))
                out[f"iter_{name}_s"] = min(samples[1:])
                out[f"iter_{name}_samples"] = samples
            print(json.dumps(out), flush=True)
            spark.sql(f"DROP TABLE IF EXISTS {tbl}")
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def main_tri() -> None:
    """Triangle-orientation skew probe: id-order vs (degree, id)-order on a
    planted-hub power-law graph.

    Generator: n_v vertices with a sparse deterministic expander background
    (4 pseudo-random out-targets per vertex, ~8 undirected degree) plus ONE
    hub planted at id n_v/2 with degree hub_deg = 2000·f.  Under id
    ordering the hub id sits mid-range, so ~deg/2 of its edges orient into
    it and ~deg/2 out — the wedge join's middle-vertex key at the hub
    carries in·out ≈ deg²/4 candidates in ONE task, growing f² while the
    graph grows f.  Under degree ordering the hub is the highest rank, its
    oriented out-degree is ~0, and its middle-key candidate count
    collapses; the global bound is Σ deg·O(√m).

    Per factor, prints: wedge totals and the max single-key candidate
    count for both orientations (the skew number), wall-clock of the full
    triangle count both ways (min of 3 after a warm run), and the triangle
    total from both plans — equality is the orientation-invariance check.
    """
    from flume_spark.operators import graph

    factors = sorted(int(a) for a in sys.argv[2:]) or [1, 2, 4]
    spark = get_spark(app_name="flume_probe_tri")
    for f in factors:
        n_v = 20_000 * f
        hub = n_v // 2
        hub_deg = 2_000 * f
        bg = (
            spark.range(n_v)
            .select(
                F.col("id").alias("a"),
                F.explode(F.sequence(F.lit(1), F.lit(4))).alias("j"),
            )
            .select(
                "a",
                ((F.col("a") * 2654435761 + F.col("j") * 40503) % n_v).alias("b"),
            )
        )
        hub_edges = spark.range(hub_deg).select(
            F.lit(hub).cast("long").alias("a"),
            ((F.col("id") * 7919 + 13) % n_v).alias("b"),
        )
        und = (
            bg.unionByName(hub_edges)
            .filter(F.col("a") != F.col("b"))
            .select(F.least("a", "b").alias("a"), F.greatest("a", "b").alias("b"))
            .distinct()
        )
        edges = (
            und.unionByName(und.select(F.col("b").alias("a"), F.col("a").alias("b")))
            .toDF("src", "dst")
            .localCheckpoint(eager=True)
        )
        out = {"probe": f"triangle_orient@x{f}", "edges_undirected": edges.count() // 2}
        for mode in ("id", "degree"):
            lo = graph.oriented_edges(edges, by=mode).localCheckpoint(eager=True)
            inn = lo.groupBy("y").agg(F.count(F.lit(1)).alias("n_in"))
            outd = lo.groupBy(F.col("x").alias("y")).agg(
                F.count(F.lit(1)).alias("n_out")
            )
            stats = (
                inn.join(outd, "y")
                .select((F.col("n_in") * F.col("n_out")).alias("w"))
                .agg(F.sum("w").alias("total"), F.max("w").alias("max_key"))
                .collect()[0]
            )
            out[f"wedges_{mode}"] = int(stats["total"] or 0)
            out[f"wedges_{mode}_max_key"] = int(stats["max_key"] or 0)

            def run_tri(lo_df=lo):
                wedges = lo_df.join(
                    lo_df.select(F.col("x").alias("y"), F.col("y").alias("z")), "y"
                )
                tri = wedges.join(
                    lo_df.select("x", F.col("y").alias("z")), ["x", "z"], "left_semi"
                )
                return tri.count()

            def run_tri_adj(lo_df=lo):
                # the shipped compact-forward close (graph.triangle_count):
                # adjacency-array intersects materialize only triangles,
                # never wedge candidates
                adj = lo_df.groupBy("x").agg(F.collect_list("y").alias("nbrs"))
                e2 = (
                    lo_df.join(adj, "x")
                    .withColumnRenamed("nbrs", "nx")
                    .join(
                        adj.select(
                            F.col("x").alias("y"), F.col("nbrs").alias("ny")
                        ),
                        "y",
                        "left",
                    )
                )
                return e2.select(
                    F.explode(
                        F.array_intersect("nx", F.coalesce("ny", F.array()))
                    ).alias("z")
                ).count()

            samples, n_tri = [], 0
            for _ in range(4):  # first warms; min of the last 3
                t0 = time.perf_counter()
                n_tri = run_tri()
                samples.append(round(time.perf_counter() - t0, 2))
            out[f"tri_{mode}"] = n_tri
            out[f"sec_{mode}"] = min(samples[1:])
            out[f"sec_{mode}_samples"] = samples
            adj_samples, n_tri_adj = [], 0
            for _ in range(4):
                t0 = time.perf_counter()
                n_tri_adj = run_tri_adj()
                adj_samples.append(round(time.perf_counter() - t0, 2))
            out[f"tri_{mode}_adj"] = n_tri_adj
            out[f"sec_{mode}_adj"] = min(adj_samples[1:])
        out["invariant_ok"] = (
            out["tri_id"] == out["tri_degree"] == out["tri_degree_adj"]
        )
        print(json.dumps(out), flush=True)


def main_claim() -> None:
    """Hot-queue claim scale probe (round-6 two-phase top-K evidence).

    One queue's backlog grows x1 -> x100 while demand stays 500 (the
    reference's default max_demand): the claim must behave like the
    reference's O(demand) LRANGE head-take, not like a global sort of the
    backlog.  Phase 1 spreads the backlog across claim_salts tasks (the
    single-queue key is maximally skewed — the exact shape the salted
    exchange exists for); phase 2 sorts only <= salts x demand survivors.
    Cost is dominated by the linear log scan + salted window, so the
    fitted exponent should sit well BELOW 1 at these sizes (fixed job
    overheads amortize) and, critically, per-task sort input stays
    backlog/salts, never the backlog.  Backlog is ingested via
    enqueue_from in distinct-timestamp batches so FIFO order is real.
    Prints claim seconds per factor (min-of-3 after warm) + exponent.
    """
    import tempfile

    from flume_spark.queue import JobStore, QueueManager

    factors = [int(a) for a in sys.argv[2:]] or [1, 10, 100]
    spark = get_spark(app_name="flume_probe_claim")
    base_rows = 20_000
    times: dict[int, float] = {}
    t0 = 1_700_000_000.0
    for f in factors:
        root = tempfile.mkdtemp(prefix=f"claimprobe_x{f}_")
        atexit.register(shutil.rmtree, root, ignore_errors=True)
        store = JobStore(spark, root + "/jobs")
        mgr = QueueManager(spark, store)
        n = base_rows * f
        batches = 10
        for b in range(batches):
            batch = spark.range(n // batches).select(
                (F.col("id") + b * (n // batches)).alias("args")
            )
            mgr.enqueue_from(batch, "hot", "W", "args", now=t0 + b)
        samples = []
        for _ in range(4):
            t = time.perf_counter()
            got = mgr.claim_plan({"hot": 500}, t0 + 100, 99).count()
            samples.append(time.perf_counter() - t)
        assert got == 500, got
        # shared-rate arm: the joint FIFO rank's input is pre-bounded to
        # min(demand, budget) per queue, so the one task a hot
        # rate_limit_key gets must stay flat as the backlog grows too
        shared_samples = []
        for _ in range(3):
            t = time.perf_counter()
            got_s = mgr.claim_plan(
                {"hot": 500}, t0 + 100, 99, shared_budgets={"hot": ("k1", 250)}
            ).count()
            shared_samples.append(time.perf_counter() - t)
        assert got_s == 250, got_s
        times[f] = min(samples[1:])  # drop the cold first sample
        out = {
            "probe": "claim_hot_queue",
            "factor": f,
            "backlog": n,
            "demand": 500,
            "sec": round(times[f], 3),
            "samples": [round(s, 3) for s in samples],
            "shared_key_sec": round(min(shared_samples), 3),
        }
        base = factors[0]
        if f != base and times[base] > 0:
            out["exponent"] = round(
                math.log(times[f] / times[base]) / math.log(f / base), 2
            )
        print(json.dumps(out), flush=True)


def main_ts() -> None:
    """Time-series similarity-search scale probe.

    Corpus = events users replicated x f, every value shifted by a
    user-, replica- AND day-dependent offset
    ((user_id * 37 + r * 101 + day * 13) mod 350): the day term gives
    each user a distinct SHAPE, not just a level — the raw synthetic
    series are time-uniform, so without it every user's word is one
    symbol repeated and blocking collapses to the handful of level
    bands (quadratic pairs, as the first probe design measured).
    Resolution discipline: the word space must exceed the corpus size or
    blocks grow linearly and the verify join goes quadratic — exactly the
    LSH band-count rule — so the probe runs at 8 segments x 4 symbols
    (65k words), the resolution a 75k-user corpus needs (the declared
    sf0.01 query keeps 4x3: 150 users in an 81-word space obeys the same
    rule).  Timed span = full PAA -> words -> block-join -> exact-verify,
    min-of-3 after a warm run; prints wall-clock exponent
    log(t_f/t_1)/log(f) (~1.0 = linear) and pairs per user (flat =
    output-linear blocking)."""
    from flume_spark.operators import timeseries

    factors = sorted(int(a) for a in sys.argv[2:]) or [1, 10, 50]
    spark = get_spark(app_name="flume_probe_ts")
    from flume_spark.queries._util import T

    ev = T(spark, SF_DIR, "events").select("user_id", "ts", "value")
    times: dict[int, float] = {}
    for f in factors:
        reps = [
            ev.select(
                (F.col("user_id") + r * 10_000_000).alias("user_id"),
                "ts",
                (
                    F.col("value")
                    + (
                        (
                            F.col("user_id") * 37
                            + r * 101
                            + F.expr(
                                "datediff(to_date(ts), DATE'2024-01-01')"
                            )
                            * 13
                        )
                        % 350
                    ).cast("double")
                ).alias("value"),
            )
            for r in range(f)
        ]
        corpus = reps[0]
        for rdf in reps[1:]:
            corpus = corpus.unionByName(rdf)
        corpus = corpus.localCheckpoint(eager=True)
        n_users = corpus.select("user_id").distinct().count()
        # AUTO-RESOLUTION (round 6): derive the word-space size from the
        # corpus via the documented occupancy rule instead of a fixed 8 —
        # at x50 this lands on the same 8 segments BASELINE.md names, and
        # at smaller factors it demonstrates pairs/user staying in a band
        # rather than growing with the corpus (the round-5 fixed-8 table
        # grew 4.9 -> 256 because resolution stood still... which that
        # probe ran on purpose to show; this one shows the fix).
        from flume_spark.operators.sizing import suggest_sax_resolution

        # alphabet 4 = 3 breakpoints on the absolute micro scale
        n_segments = suggest_sax_resolution(n_users, target_block=4, alphabet=4)

        def run(c=corpus, n_seg=n_segments):
            paa = timeseries.paa_segments(
                c, "user_id", "ts", "value", "2024-01-01", 32, n_seg
            )
            words = timeseries.sax_words(
                paa, [1_500_000, 2_500_000, 3_500_000]
            )
            return timeseries.ts_similar_pairs(paa, words, 10**12)

        samples, n_pairs = [], 0
        for _ in range(4):  # first warms; min of the last 3
            t0 = time.perf_counter()
            n_pairs = run().count()
            samples.append(round(time.perf_counter() - t0, 2))
        times[f] = min(samples[1:])
        out = {
            "probe": f"ts_search@x{f}",
            "users": n_users,
            "n_segments": n_segments,
            "pairs": n_pairs,
            "pairs_per_user": round(n_pairs / n_users, 2),
            "sec": times[f],
            "samples": samples,
        }
        base = factors[0]
        if f != base and times[base] > 0:
            out["exponent"] = round(
                math.log(times[f] / times[base]) / math.log(f / base), 2
            )
        print(json.dumps(out), flush=True)
        corpus.unpersist()


def main_znorm() -> None:
    """Blocking-quality probe: z-normalized vs absolute-scale SAX words on
    OFFSET-SHIFTED series (the verdict's missing evidence row).

    Corpus = sf0.1 events users replicated x f where replica r adds a
    CONSTANT per-(user, replica) offset ((user*37 + r*101) % 350) to every
    value — same shape, shifted level: each base user's f replicas are
    shape-twins that a shape search must block together.  Metrics:

    - twin_recall: fraction of same-base-user replica pairs whose words
      match (candidate-join would recover them).  znorm should be ~1.0
      (offset cancels in z-space, up to the floor-sqrt boundary);
      absolute-scale splits twins across level bands.
    - pairs_per_user: total word-block candidate pairs / users — blocking
      stays bounded for both (no quadratic blowup), so the recall gain is
      not bought with candidate explosion.
    """
    from flume_spark.operators import timeseries
    from flume_spark.queries._util import T

    factors = sorted(int(a) for a in sys.argv[2:]) or [4]
    spark = get_spark(app_name="flume_probe_znorm")
    ev = T(spark, SF_DIR, "events").select("user_id", "ts", "value")
    for f in factors:
        reps = [
            ev.select(
                (F.col("user_id") + r * 10_000_000).alias("user_id"),
                "ts",
                (
                    F.col("value")
                    + ((F.col("user_id") * 37 + r * 101) % 350).cast("double")
                ).alias("value"),
            )
            for r in range(f)
        ]
        corpus = reps[0]
        for rdf in reps[1:]:
            corpus = corpus.unionByName(rdf)
        corpus = corpus.localCheckpoint(eager=True)
        n_users = corpus.select("user_id").distinct().count()
        paa = timeseries.paa_segments(
            corpus, "user_id", "ts", "value", "2024-01-01", 32, 8
        )
        variants = {
            "absolute": timeseries.sax_words(
                paa, [1_500_000, 2_500_000, 3_500_000]
            ),
            "znorm": timeseries.sax_words_znorm(
                paa, [(-6745, 10000), (0, 1), (6745, 10000)], 8
            ),
        }
        for name, words in variants.items():
            w = words.withColumn(
                "base", F.col("key") % 10_000_000
            ).localCheckpoint(eager=True)
            # shape twins recovered: same base user, same word
            twin_hits = (
                w.groupBy("base", "word")
                .count()
                .select(F.sum(F.expr("count * (count - 1) / 2")))
                .collect()[0][0]
                or 0
            )
            twin_total = n_users / f * (f * (f - 1) / 2)
            cand_pairs = (
                w.groupBy("word")
                .count()
                .select(F.sum(F.expr("count * (count - 1) / 2")))
                .collect()[0][0]
                or 0
            )
            print(
                json.dumps(
                    {
                        "probe": f"znorm_blocking@x{f}",
                        "variant": name,
                        "users": n_users,
                        "twin_recall": round(float(twin_hits) / twin_total, 3)
                        if twin_total
                        else None,
                        "pairs_per_user": round(float(cand_pairs) / n_users, 2),
                    }
                ),
                flush=True,
            )
        corpus.unpersist()


def main_backend() -> None:
    """Storage-backend throughput probe: the flock parquet log vs the
    lock-free optimistic commit log on the SAME engine workload
    (bulk_enqueue N jobs across 4 queues -> drain via claim/dispatch/ack
    triggers).  Quantifies the price of conditional-commit visibility
    (one commit per enqueue batch / claim / ack, plus the claim-lock
    lease commits) relative to the flock baseline — the number an
    object-store deployment trades against not having flock at all.
    """
    import tempfile

    from flume_spark.queue import (
        JobStore,
        OptimisticLogStore,
        QueueManager,
        WorkerRegistry,
    )
    from flume_spark.queue.manager import Pipeline

    jobs = int(sys.argv[2]) if len(sys.argv) > 2 else 2000
    spark = get_spark(app_name="flume_probe_backend")
    fanout = 4
    for label, make in (
        ("parquet_log", JobStore),
        ("optimistic_commit", OptimisticLogStore),
    ):
        root = tempfile.mkdtemp(prefix=f"bprobe_{label}_")
        atexit.register(shutil.rmtree, root, ignore_errors=True)
        registry = WorkerRegistry()
        registry.register("NoopWorker", lambda *a: None)
        store = make(spark, root + "/jobs")
        pipes = [
            Pipeline(name=f"p{i}", queue=f"q{i}", max_demand=500)
            for i in range(fanout)
        ]
        mgr = QueueManager(spark, store, registry, pipes)
        # warm cycle on a throwaway store: the first claim/dispatch pays
        # whole-stage codegen + Arrow path init; without this the backend
        # that runs FIRST eats ~7s of JIT that has nothing to do with
        # storage (the round-6 first measurement showed exactly that)
        wstore = make(spark, root + "/warm")
        wmgr = QueueManager(spark, wstore, registry, pipes)
        wmgr.bulk_enqueue("q0", [("NoopWorker", "perform", ["w"])] * 10)
        wmgr.run_many(["p0"])
        per_queue = jobs // fanout
        t0 = time.perf_counter()
        for i in range(fanout):
            mgr.bulk_enqueue(
                f"q{i}", [("NoopWorker", "perform", ["x" * 500])] * per_queue
            )
        enqueue_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        done = 0
        while done < per_queue * fanout:
            got = mgr.run_many([f"p{i}" for i in range(fanout)])["succeeded"]
            if got == 0:
                break
            done += got
        process_s = time.perf_counter() - t0
        assert done == per_queue * fanout, (label, done)
        print(
            json.dumps(
                {
                    "probe": "backend_throughput",
                    "backend": label,
                    "jobs": done,
                    "enqueue_sec": round(enqueue_s, 2),
                    "process_sec": round(process_s, 2),
                    "jobs_per_sec": round(done / (enqueue_s + process_s), 0),
                }
            ),
            flush=True,
        )


def main_scd2() -> None:
    """SCD2 incremental-merge scale probe.

    The store grows x1 -> x50 (more keys, same per-key raw event count)
    while the merge batch stays FIXED (1,000 events over 500 keys).  The
    store is the RAW event log (operators/scd.py) — merge cost is the
    touched buckets' rows, whatever their compaction state.  The claim is the
    ASYMPTOTE, stated exactly: a merge reads at most (batch's touched
    buckets) x (bucket size), and with the resolution rule n_buckets =
    keys/256 the bucket size is a CONSTANT (~256 keys' change rows), so
    merge cost is bounded by batch_keys x const — independent of store
    size — once n_buckets >> batch_keys.  Below that regime hash
    scattering makes a 500-key batch touch most buckets, so the curve
    rises toward the bound and then flattens; the probe's x10 -> x50 leg
    is the flat part (wall exponent well below the store's growth), which
    is the 100 TB story: a trillion-key store at keys/256 buckets still
    pays only ~500 x 2,560 rows per 500-key merge.  Same resolution law
    as LSH bands / SAX word-space: granularity must grow with the corpus.
    Prints merge seconds per factor (min-of-3 after a warm merge).
    """
    import tempfile

    from flume_spark.operators import scd

    factors = [int(a) for a in sys.argv[2:]] or [1, 10, 50]
    spark = get_spark(app_name="flume_probe_scd2")
    base_keys = 20_000
    changes_per_key = 10
    for f in factors:
        n_keys = base_keys * f
        n_buckets = max(8, n_keys // 256)
        root = tempfile.mkdtemp(prefix=f"scd2probe_x{f}_")
        atexit.register(shutil.rmtree, root, ignore_errors=True)
        path = root + "/store"
        events = (
            spark.range(n_keys * changes_per_key)
            .select(
                (F.col("id") % n_keys).alias("uid"),
                F.concat(F.lit("t"), (F.col("id") % 7).cast("string")).alias("tier"),
                F.timestamp_seconds(
                    F.lit(1_700_000_000) + (F.col("id") / n_keys).cast("long") * 3600
                ).alias("ts"),
                F.col("id").alias("eid"),
            )
        )
        scd.scd2_write(spark, path, events, "uid", "tier", "ts", "eid",
                       n_buckets=n_buckets)
        batch = (
            spark.range(1_000)
            .select(
                (F.col("id") % 500).alias("uid"),
                F.concat(F.lit("z"), (F.col("id") % 3).cast("string")).alias("tier"),
                F.timestamp_seconds(
                    F.lit(1_700_500_000) + F.col("id")
                ).alias("ts"),
                (F.col("id") + 10_000_000).alias("eid"),
            )
            .localCheckpoint(eager=True)
        )
        samples = []
        for i in range(4):
            t = time.perf_counter()
            scd.scd2_merge(
                spark, path, batch, "uid", "tier", "ts", "eid",
                n_buckets=n_buckets, swap_commit=True,
            )
            samples.append(time.perf_counter() - t)
        out = {
            "probe": "scd2_merge",
            "factor": f,
            "store_keys": n_keys,
            "store_events": n_keys * changes_per_key,
            "n_buckets": n_buckets,
            "batch_events": 1000,
            "sec": round(min(samples[1:]), 3),
            "samples": [round(s, 3) for s in samples],
        }
        print(json.dumps(out), flush=True)


def main_pq() -> None:
    """PQ index scale probe: fixed codebooks (trained ONCE on the x1
    slice — the at-ingest shape), corpus replicated x1/x10/x50 via the
    cosine-preserving Rademacher perturbation, measuring (a) encode cost
    — must be ~linear in corpus (per-row map + broadcast argmin), and
    (b) ADC search cost over the encoded index for 2 queries — one
    broadcast-LUT join + partial-agg sum over the codes table, the
    memory-bound linear scan IVF cells would prune at 100 TB.  Neither
    leg may shuffle the corpus: encode's argmin and search's LUT join
    are both broadcast-side."""
    from flume_spark.operators import similarity as S

    factors = sorted(int(a) for a in sys.argv[2:]) or [1, 10, 50]
    spark = get_spark(app_name="flume_probe_pq")
    base = spark.read.parquet(os.path.join(SF_DIR, "embeddings.parquet")).select(
        "vec_id", "embedding"
    )
    cb = S.pq_codebooks(base, refine_rounds=1).localCheckpoint(eager=True)
    results: dict[str, dict[int, float]] = {}
    for f in factors:
        emb = scaled_embeddings(spark, f)
        n = emb.count()
        t0 = time.perf_counter()
        # the production encode path (numpy over Arrow batches): exact
        # encode is O(cells x dim) per vector either way, but the
        # vectorized matmul beats Catalyst lambdas ~12x (pq_encode at
        # x10 took 74s where arrow takes ~6; equivalence is test-pinned)
        codes = S.pq_encode_arrow(emb, cb).localCheckpoint(eager=True)
        n_codes = codes.count()
        encode_s = round(time.perf_counter() - t0, 2)
        samples = []
        for _ in range(4):  # first warms; min of the last 3
            t0 = time.perf_counter()
            S.pq_adc_topk(
                emb, F.col("vec_id") < 2, k=10, codebooks=cb, codes=codes
            ).count()
            samples.append(round(time.perf_counter() - t0, 2))
        search_s = min(samples[1:])
        results.setdefault("encode", {})[f] = encode_s
        results.setdefault("search", {})[f] = search_s
        print(json.dumps({
            "probe": f"pq@x{f}", "vectors": n, "code_rows": n_codes,
            "encode_s": encode_s, "search_s": search_s,
            "search_samples": samples,
        }), flush=True)
        emb.unpersist()
    base_f = factors[0]
    summary = {}
    for leg, times in results.items():
        t1 = times[base_f]
        exps = {
            f: round(math.log(times[f] / t1) / math.log(f / base_f), 2)
            for f in factors
            if f != base_f and times[f] > 0 and t1 > 0
        }
        summary[leg] = {"sec": times, "exponent": exps}
    print(json.dumps({"summary": summary}), flush=True)


def main_scd2_compact() -> None:
    """SCD2 compaction payoff probe: a CHATTY no-change stream.

    Generator: per key, `events_per_key` raw events but only ~3 attr
    REGIMES (the attribute changes twice, then keeps re-asserting itself)
    — the telemetry/heartbeat shape where the raw log dwarfs the change
    log.  Measures the full-history read (scd2_read_history -> count,
    collapse-on-read) against the RAW store, then runs scd2_compact with
    watermark = max ts + 1 (everything settled) and measures the same
    read again, plus raw row counts both sides.  The claim: compaction
    restores the read cost of the CHANGE log (rows drop ~events_per_key/3
    x; read time follows), while correctness is untouched — the
    late-arrival counterexample that forced the raw-store design stays
    pinned by the hypothesis regression suite (tests/test_round6b_ops),
    and the read path is identical pre/post by construction
    (scd2_read_history collapses on read either way; the probe asserts
    the collapsed HISTORY row count is unchanged by compaction).
    """
    import tempfile

    from flume_spark.operators import scd

    factors = [int(a) for a in sys.argv[2:]] or [1, 10, 50]
    spark = get_spark(app_name="flume_probe_scd2c")
    base_keys = 4_000
    events_per_key = 50
    for f in factors:
        n_keys = base_keys * f
        n_buckets = max(8, n_keys // 256)
        root = tempfile.mkdtemp(prefix=f"scd2cprobe_x{f}_")
        atexit.register(shutil.rmtree, root, ignore_errors=True)
        path = root + "/store"
        # regime = 0,0,...,0,1,1,...,1,2,...: changes only at two borders;
        # every other event re-asserts the current attr (no-change row)
        events = spark.range(n_keys * events_per_key).select(
            (F.col("id") % n_keys).alias("uid"),
            F.concat(
                F.lit("t"),
                ((F.col("id") / n_keys).cast("long") * 3 / events_per_key)
                .cast("long")
                .cast("string"),
            ).alias("tier"),
            F.timestamp_seconds(
                F.lit(1_700_000_000)
                + (F.col("id") / n_keys).cast("long") * 3600
            ).alias("ts"),
            F.col("id").alias("eid"),
        )
        scd.scd2_write(spark, path, events, "uid", "tier", "ts", "eid",
                       n_buckets=n_buckets)

        def read_cost():
            samples = []
            hist_rows = 0
            for _ in range(4):  # first warms; min of the last 3
                t0 = time.perf_counter()
                hist_rows = scd.scd2_read_history(
                    spark, path, "uid", "tier", "ts", "eid"
                ).count()
                samples.append(round(time.perf_counter() - t0, 3))
            return min(samples[1:]), samples, hist_rows

        raw_rows = spark.read.parquet(path).count()
        raw_sec, raw_samples, hist_raw = read_cost()
        t0 = time.perf_counter()
        scd.scd2_compact(
            spark, path,
            F.timestamp_seconds(F.lit(1_700_000_000 + events_per_key * 3600)),
            "uid", "tier", "ts", "eid", n_buckets=n_buckets,
        )
        compact_sec = round(time.perf_counter() - t0, 3)
        compacted_rows = spark.read.parquet(path).count()
        comp_sec, comp_samples, hist_comp = read_cost()
        print(json.dumps({
            "probe": f"scd2_compact@x{f}",
            "store_keys": n_keys,
            "rows_raw": raw_rows,
            "rows_compacted": compacted_rows,
            "history_rows_equal": hist_raw == hist_comp,
            "read_raw_s": raw_sec,
            "read_raw_samples": raw_samples,
            "read_compacted_s": comp_sec,
            "read_compacted_samples": comp_samples,
            "compact_s": compact_sec,
        }), flush=True)


def main_prefix() -> None:
    """Prefix-filter join scale probe: wall-clock of the full
    prefix_filter_pairs pipeline and the candidate-count comparison
    (prefix candidates vs the unfiltered inverted-index join) as the
    corpus grows with output-linear perturbation.  The claim under test:
    candidate volume tracks sum-over-PREFIX-shingles(df^2), which the
    rarity-first ordering keeps ~linear in docs when near-dup structure
    is ~linear, while the unfiltered index pays every stop-shingle's
    df^2."""
    factors = [int(a) for a in sys.argv[2:]] or [1, 10, 50]
    spark = get_spark(app_name="flume_probe_prefix")
    spark.sparkContext.setLogLevel("ERROR")
    times: dict[int, float] = {}
    for f in factors:
        docs = scaled_docs(spark, f)
        n_docs = docs.count()
        sh = dedup.word_shingles(docs, "doc_id", "text", 2).cache()
        n_cand = dedup.prefix_candidates(sh, 4, 5).count()

        # Join COST on both sides as the cheap exact aggregate
        # sum-over-shingles C(df,2) — the pair rows the self-join
        # shuffles.  The full index cost is deliberately NOT
        # materialized: at x50 it is the quadratic blow-up the prefix
        # filter exists to avoid paying.
        def join_cost(index) -> int:
            return (
                index.groupBy("shingle")
                .agg(F.count(F.lit(1)).alias("df"))
                .agg(F.sum(F.expr("df * (df - 1) div 2")).alias("cost"))
                .collect()[0][0]
            )

        index_cost = join_cost(sh)
        prefix_cost = join_cost(dedup.prefix_index(sh, 4, 5))
        sh.unpersist()
        t0 = time.perf_counter()
        n_pairs = dedup.prefix_filter_pairs(
            docs, "doc_id", "text", n=2, t_num=4, t_den=5
        ).count()
        dt = time.perf_counter() - t0
        times[f] = dt
        print(
            json.dumps(
                {
                    "probe": f"prefix_filter@x{f}",
                    "docs": n_docs,
                    "sec": round(dt, 2),
                    "result_pairs": n_pairs,
                    "prefix_candidates": n_cand,
                    "prefix_join_cost": prefix_cost,
                    "index_join_cost": index_cost,
                    "prune_ratio": round(1 - prefix_cost / max(index_cost, 1), 3),
                }
            ),
            flush=True,
        )
        docs.unpersist()
        spark.catalog.clearCache()
    base = factors[0]
    exps = {
        f: round(math.log(times[f] / times[base]) / math.log(f / base), 2)
        for f in factors
        if f != base and times[f] > 0
    }
    print(json.dumps({"summary": {"prefix_filter": {"exponent": exps}}}), flush=True)


def main_substr() -> None:
    """Exact-substring dedup scale probe.  Whole-corpus stats should be
    ~LINEAR in corpus tokens (exponent ~1: one window-hash exchange, no
    pairwise leg — the salted perturbation keeps cross-replica windows
    distinct so output stays linear too).  The at-ingest path probes a
    FIXED base-corpus batch against a PERSISTED bucketed window index at
    each history factor: per-ingest cost should stay ~flat (probe side is
    O(batch), index side reads exchange-free from its buckets)."""
    import shutil

    factors = [int(a) for a in sys.argv[2:]] or [1, 10, 50]
    spark = get_spark(app_name="flume_probe_substr")
    whole_t: dict[int, float] = {}
    clean_t: dict[int, float] = {}
    ingest_t: dict[int, float] = {}
    batch = scaled_docs(spark, 1).select(
        (F.col("doc_id") + 900_000_000).alias("doc_id"), "text"
    )
    batch = batch.localCheckpoint(eager=True)
    n_batch = batch.count()
    for f in factors:
        docs = scaled_docs(spark, f)
        n_docs = docs.count()
        print(json.dumps({"factor": f, "docs": n_docs, "batch": n_batch}), flush=True)
        dt, _ = probe(
            f"substring_stats@x{f}",
            lambda d=docs: dedup.substring_dup_stats(d, "doc_id", "text", k=8),
        )
        whole_t[f] = dt
        dt, _ = probe(
            f"substring_clean@x{f}",
            lambda d=docs: dedup.substring_dedup_clean(d, "doc_id", "text", k=8),
        )
        clean_t[f] = dt
        hw = dedup.substring_windows(docs, "doc_id", "text", k=8).select(
            "id", F.col("h").alias("band_key")
        )
        spark.sql("DROP TABLE IF EXISTS probe_win_idx")
        dedup.write_band_index(
            hw, "probe_win_idx", f"/tmp/probe_win_idx_x{f}", buckets=32
        )
        idx = dedup.read_band_index(spark, "probe_win_idx").select(
            "id", F.col("band_key").alias("h")
        )
        dt, _ = probe(
            f"substring_ingest@x{f}",
            lambda b=batch, i=idx: dedup.incremental_substring_stats(
                b, "doc_id", "text", k=8, history_windows=i
            ),
        )
        ingest_t[f] = dt
        spark.sql("DROP TABLE IF EXISTS probe_win_idx")
        shutil.rmtree(f"/tmp/probe_win_idx_x{f}", ignore_errors=True)
        docs.unpersist()
        spark.catalog.clearCache()
    base = factors[0]
    summary = {
        "substring_stats": {
            "sec": {k: round(v, 2) for k, v in whole_t.items()},
            "exponent": {
                f: round(math.log(whole_t[f] / whole_t[base]) / math.log(f / base), 2)
                for f in factors
                if f != base and whole_t[f] > 0
            },
        },
        "substring_clean": {
            "sec": {k: round(v, 2) for k, v in clean_t.items()},
            "exponent": {
                f: round(math.log(clean_t[f] / clean_t[base]) / math.log(f / base), 2)
                for f in factors
                if f != base and clean_t[f] > 0
            },
        },
        "substring_ingest_fixed_batch": {
            "sec": {k: round(v, 2) for k, v in ingest_t.items()},
            "exponent": {
                f: round(
                    math.log(ingest_t[f] / ingest_t[base]) / math.log(f / base), 2
                )
                for f in factors
                if f != base and ingest_t[f] > 0
            },
        },
    }
    print(json.dumps({"summary": summary}), flush=True)


def main_semantic() -> None:
    """SemDeDup scale probe: cluster count GROWS with the corpus (k = 4f,
    the paper's discipline — cluster populations stay ~constant), so the
    within-cluster pairwise leg stays ~linear overall.  The Rademacher
    perturbation keeps cross-replica cosines decorrelated, so dup output
    stays ~linear in the corpus too.  A fixed k would send the exponent
    toward 2 — that trap is documented in BASELINE.md, not probed at x50."""
    factors = [int(a) for a in sys.argv[2:]] or [1, 10, 50]
    spark = get_spark(app_name="flume_probe_semantic")
    times: dict[int, float] = {}
    hier_t: dict[int, float] = {}
    for f in factors:
        emb = scaled_embeddings(spark, f)
        n_vecs = emb.count()
        k = 4 * f
        print(json.dumps({"factor": f, "vectors": n_vecs, "k": k}), flush=True)
        dt, _ = probe(
            f"semantic_dedup@x{f}",
            lambda e=emb, kk=k: dedup.semantic_dedup(
                e, "vec_id", "embedding", k=kk, threshold=0.4
            ),
        )
        times[f] = dt
        dt, _ = probe(
            f"semantic_dedup_hier@x{f}",
            lambda e=emb, kk=k: dedup.semantic_dedup(
                e, "vec_id", "embedding", k=kk, threshold=0.4,
                assign="hierarchical",
            ),
        )
        hier_t[f] = dt
        emb.unpersist()
        spark.catalog.clearCache()
    base = factors[0]
    exps = {
        f: round(math.log(times[f] / times[base]) / math.log(f / base), 2)
        for f in factors
        if f != base and times[f] > 0
    }
    print(
        json.dumps(
            {
                "summary": {
                    "semantic_dedup": {
                        "sec": {k: round(v, 2) for k, v in times.items()},
                        "exponent": exps,
                    },
                    "semantic_dedup_hier": {
                        "sec": {k: round(v, 2) for k, v in hier_t.items()},
                        "exponent": {
                            f: round(
                                math.log(hier_t[f] / hier_t[base])
                                / math.log(f / base), 2)
                            for f in factors
                            if f != base and hier_t[f] > 0
                        },
                    },
                }
            }
        ),
        flush=True,
    )


def main_semingest() -> None:
    """SemanticIngestor per-batch cost vs history size: one FIXED 500-vector
    batch timed against history x1/x10/x50, frozen-k (the round-8 ship)
    vs per_cluster_cap epochs (the round-9 fix).  Frozen k means cluster
    populations grow with history -> per-batch matmul grows ~linearly;
    the capped ingestor rolls epochs (k grown with the corpus, index
    reassigned once, amortized O(1)) so the timed batch stays ~flat.
    The roll itself is reported separately (maintenance cost, not
    per-batch cost — the compact_index convention)."""
    import shutil
    import tempfile

    factors = [int(a) for a in sys.argv[2:]] or [1, 10, 50]
    spark = get_spark(app_name="flume_probe_semingest")
    from flume_spark.operators.similarity import md5_init_centroids
    from flume_spark.streaming.dedup import SemanticIngestor

    base_emb = spark.read.parquet(
        os.path.join(SF_DIR, "embeddings.parquet")
    ).select("vec_id", "embedding")
    k0 = max(4, base_emb.count() // 125)
    cents = md5_init_centroids(base_emb, "vec_id", "embedding", k=k0)
    # fixed probe batch: the full 2000-vector base table (large enough that
    # the per-cluster matmul term rises above Spark's fixed per-batch
    # overhead), ids displaced out of every replica band
    fixed = (
        base_emb
        .select(
            (F.col("vec_id") + 900_000_000).alias("vec_id"),
            F.expr(
                "transform(embedding, (x, i) -> "
                "IF(pmod(xxhash64(987, i), 2) = 1, -x, x))"
            ).alias("embedding"),
        )
        .localCheckpoint(eager=True)
    )
    frozen_t: dict[int, float] = {}
    capped_t: dict[int, float] = {}
    roll_t: dict[int, float] = {}
    for f in factors:
        hist = scaled_embeddings(spark, f)
        n_hist = hist.count()
        seeds = [hist.filter(F.col("vec_id") % 4 == s) for s in range(4)]
        row: dict[str, float] = {}
        for mode, cap in (("frozen", None), ("capped", 125)):
            root = tempfile.mkdtemp(prefix=f"semingest_{mode}_")
            ing = SemanticIngestor(
                spark,
                cents,
                index_dir=f"{root}/index",
                marks_dir=f"{root}/marks",
                ledger_dir=f"{root}/ledger",
                threshold=0.4,
                per_cluster_cap=cap,
            )
            for s, sdf in enumerate(seeds):  # history build: untimed
                ing.process(sdf, s)
            t0 = time.perf_counter()
            rolled = ing.maybe_roll_epoch()  # maintenance: timed separately
            dt_roll = time.perf_counter() - t0
            t0 = time.perf_counter()
            ing.process(fixed, 4)
            dt = time.perf_counter() - t0
            row[mode] = dt
            if mode == "capped":
                roll_t[f] = dt_roll
                print(
                    json.dumps(
                        {
                            "factor": f,
                            "history": n_hist,
                            "epoch": ing.epoch,
                            "k": ing.k,
                            "rolled_at_maintenance": rolled,
                            "roll_sec": round(dt_roll, 2),
                            "ingest_sec": round(dt, 2),
                        }
                    ),
                    flush=True,
                )
            else:
                print(
                    json.dumps(
                        {
                            "factor": f,
                            "history": n_hist,
                            "mode": "frozen",
                            "k": k0,
                            "ingest_sec": round(dt, 2),
                        }
                    ),
                    flush=True,
                )
            shutil.rmtree(root, ignore_errors=True)
        frozen_t[f] = row["frozen"]
        capped_t[f] = row["capped"]
        hist.unpersist()
        spark.catalog.clearCache()
    base = factors[0]

    def exps(times: dict[int, float]) -> dict[int, float]:
        return {
            f: round(math.log(times[f] / times[base]) / math.log(f / base), 2)
            for f in times
            if f != base and times[f] > 0
        }

    print(
        json.dumps(
            {
                "summary": {
                    "semingest_frozen": {
                        "sec": {k: round(v, 2) for k, v in frozen_t.items()},
                        "exponent": exps(frozen_t),
                    },
                    "semingest_capped": {
                        "sec": {k: round(v, 2) for k, v in capped_t.items()},
                        "exponent": exps(capped_t),
                    },
                    "roll_sec": {k: round(v, 2) for k, v in roll_t.items()},
                }
            }
        ),
        flush=True,
    )


def main_multimodal() -> None:
    """Multimodal near-dup pairing probe: the k-means candidate stage vs the
    raw all-pairs block matmul.  Clustered cost is sum(cluster_pop^2) with
    k grown n/125 (populations ~constant) -> expect exponent ~1; all-pairs
    is Theta(n^2/blocks) -> expect ~2, so it only runs at the small factors
    (at x50 = 250k features the all-pairs leg is the 100 TB trap this probe
    exists to document, not to wait on)."""
    factors = [int(a) for a in sys.argv[2:]] or [1, 10, 50]
    allpairs_cap = 10  # all-pairs leg only below this factor
    spark = get_spark(app_name="flume_probe_multimodal")
    from flume_spark.operators import multimodal, similarity

    clus_t: dict[int, float] = {}
    raw_t: dict[int, float] = {}
    for f in factors:
        docs = scaled_docs(spark, f)
        payloads = multimodal.to_binary_payload(docs, "doc_id", "text")
        feats = multimodal.feature_extract_stub(payloads).localCheckpoint(
            eager=True
        )
        n = feats.count()
        k = max(4, n // 125)
        print(json.dumps({"factor": f, "features": n, "k": k}), flush=True)

        def clustered(fe=feats, kk=k):
            assigned = similarity.kmeans_assign_vectorized(
                fe, "id", "features", k=int(kk)
            ).select("id", "cluster")
            return dedup.cosine_pairs(
                fe.join(assigned, "id"), "id", "features",
                threshold=0.999, blocks=4, group_col="cluster",
            )

        dt, _ = probe(f"multimodal_clustered@x{f}", clustered)
        clus_t[f] = dt
        if f <= allpairs_cap:
            dt, _ = probe(
                f"multimodal_allpairs@x{f}",
                lambda fe=feats: dedup.cosine_pairs(
                    fe, "id", "features", threshold=0.999, blocks=4
                ),
            )
            raw_t[f] = dt
        docs.unpersist()
        feats.unpersist()
        spark.catalog.clearCache()
    base = factors[0]

    def exps(times: dict[int, float]) -> dict[int, float]:
        return {
            f: round(math.log(times[f] / times[base]) / math.log(f / base), 2)
            for f in times
            if f != base and times[f] > 0
        }

    print(
        json.dumps(
            {
                "summary": {
                    "multimodal_clustered": {
                        "sec": {k: round(v, 2) for k, v in clus_t.items()},
                        "exponent": exps(clus_t),
                    },
                    "multimodal_allpairs": {
                        "sec": {k: round(v, 2) for k, v in raw_t.items()},
                        "exponent": exps(raw_t),
                    },
                }
            }
        ),
        flush=True,
    )


def main_funnel() -> None:
    """Corpus-funnel composition probe (round-10 VERDICT item 1): drives
    `funnel_report` — the exact composition behind the declared
    `corpus_funnel` query — over salted replica corpora.

    Per factor it records:
    - stage_sec: each stage's isolated wall-clock via the timings hook
      (every stage reads only the previous stage's eager checkpoint, so
      time-around-checkpoint IS that stage's cost);
    - composed_sec: a SECOND, uninstrumented end-to-end run;
    - additivity: composed_sec / (sum of stage_sec + report_sec) — the
      stage-additivity check.  ~1.0 means the composed wall tracks the
      sum of its stage probes; since round-15 the span-clean and
      semantic stages run OVERLAPPED inside funnel_report (and the two
      threads' timings overlap in wall-clock), so SUB-additive ratios
      (< 1) are the expected healthy reading — the detector this probe
      exists for is the super-additive direction (re-inlining);
    - report_share: report_sec / first-run total.  The re-inlining
      detector: with staging intact the six per-stage aggregates read
      checkpoints and the share stays small; a broken stage boundary
      re-executes the upstream chain once per aggregate (the round-8
      composition trap) and the share explodes toward ~1.
    """
    factors = [int(a) for a in sys.argv[2:]] or [1, 10, 50]
    spark = get_spark(app_name="flume_probe_funnel")
    from flume_spark.queries.llm_ext import funnel_report

    comp_t: dict[int, float] = {}
    add_r: dict[int, float] = {}
    share: dict[int, float] = {}
    stages_all: dict[int, dict[str, float]] = {}
    for f in factors:
        docs = (
            scaled_docs(spark, f)
            .withColumn(
                "source",
                F.concat(F.lit("src"), (F.col("doc_id") % 4).cast("string")),
            )
            .localCheckpoint(eager=True)
        )
        n = docs.count()
        print(json.dumps({"factor": f, "docs": n}), flush=True)
        timings: dict[str, float] = {}
        t0 = time.perf_counter()
        staged = funnel_report(spark, docs, timings=timings)
        t_stages = time.perf_counter()
        n_rows = staged.count()
        t_report = time.perf_counter() - t_stages
        total_instrumented = time.perf_counter() - t0
        sum_stages = sum(timings.values())
        dt, _ = probe(f"funnel_composed@x{f}", lambda d=docs: funnel_report(spark, d))
        comp_t[f] = dt
        add_r[f] = round(dt / max(1e-9, sum_stages + t_report), 2)
        share[f] = round(t_report / max(1e-9, total_instrumented), 3)
        stages_all[f] = dict(timings)
        print(
            json.dumps(
                {
                    "probe": f"funnel_stages@x{f}",
                    "stage_sec": timings,
                    "report_sec": round(t_report, 2),
                    "rows": n_rows,
                    "additivity": add_r[f],
                    "report_share": share[f],
                }
            ),
            flush=True,
        )
        docs.unpersist()
        spark.catalog.clearCache()
    base = factors[0]
    print(
        json.dumps(
            {
                "summary": {
                    "funnel_composed": {
                        "sec": {k: round(v, 2) for k, v in comp_t.items()},
                        "exponent": {
                            f: round(
                                math.log(comp_t[f] / comp_t[base])
                                / math.log(f / base),
                                2,
                            )
                            for f in comp_t
                            if f != base and comp_t[f] > 0
                        },
                    },
                    "additivity": add_r,
                    "report_share": share,
                    "stage_sec": stages_all,
                }
            }
        ),
        flush=True,
    )


def main_ctable() -> None:
    """Centroid-table probe (round-10): `kmeans_assign_table` (fine
    centroids stay a DataFrame; only sqrt(k) coarse rows reach the
    driver) vs the list path (`kmeans_assign_hierarchical` closing over a
    collected k x dim Python list) as k grows.  The list path stops at
    LIST_CAP — past it the k-proportional driver list / task closure is
    the semantic family's first hard wall (VERDICT r09 missing#2); the
    table path keeps running.  Outputs are bit-equal where both run
    (pinned by tests at k=4/64/1024); agreement is re-checked here at
    every shared k."""
    ks = [int(a) for a in sys.argv[2:]] or [1024, 16384, 131072, 524288]
    list_cap = int(os.environ.get("SPARK_GRAFT_CTABLE_LIST_CAP", "150000"))
    dim = 16
    spark = get_spark(app_name="flume_probe_ctable")
    from flume_spark.operators import similarity as S

    list_t: dict[int, float] = {}
    table_t: dict[int, float] = {}
    for k in ks:
        n = k  # assign the drawn corpus itself: n x ~2 sqrt(k) evals
        emb = (
            spark.range(n)
            .select(
                F.col("id"),
                F.expr(
                    f"transform(sequence(0, {dim - 1}), "
                    "j -> (pmod(xxhash64(id, j), 1000) - 500) / 100.0)"
                ).alias("v"),
            )
            .localCheckpoint(eager=True)
        )
        print(json.dumps({"k": k, "points": n, "dim": dim}), flush=True)
        t0 = time.perf_counter()
        cdf = S.md5_init_centroids_df(emb, "id", "v", k=k)
        out_t = S.kmeans_assign_table(emb, "id", "v", centroids_df=cdf)
        n_t = out_t.count()
        table_t[k] = time.perf_counter() - t0
        print(
            json.dumps(
                {"probe": f"ctable_table@k{k}", "sec": round(table_t[k], 2), "rows": n_t}
            ),
            flush=True,
        )
        if k <= list_cap:
            t0 = time.perf_counter()
            cents = S.md5_init_centroids(emb, "id", "v", k=k)
            out_l = S.kmeans_assign_hierarchical(emb, "id", "v", k=k, centroids=cents)
            n_l = out_l.count()
            list_t[k] = time.perf_counter() - t0
            list_bytes = k * dim * 8
            print(
                json.dumps(
                    {
                        "probe": f"ctable_list@k{k}",
                        "sec": round(list_t[k], 2),
                        "rows": n_l,
                        "driver_list_mb": round(list_bytes / 1e6, 1),
                    }
                ),
                flush=True,
            )
            mism = (
                out_t.withColumnRenamed("cluster", "ct")
                .withColumnRenamed("dist2", "dt")
                .join(out_l, "id")
                .filter("ct != cluster OR dt != dist2")
                .count()
            )
            print(
                json.dumps({"probe": f"ctable_agree@k{k}", "mismatches": mism}),
                flush=True,
            )
        else:
            print(
                json.dumps(
                    {
                        "probe": f"ctable_list@k{k}",
                        "skipped": f"k > LIST_CAP {list_cap}: the k-proportional "
                        "driver list is the wall this probe documents",
                    }
                ),
                flush=True,
            )
        emb.unpersist()
        spark.catalog.clearCache()
    print(
        json.dumps(
            {
                "summary": {
                    "ctable_table_sec": {k: round(v, 2) for k, v in table_t.items()},
                    "ctable_list_sec": {k: round(v, 2) for k, v in list_t.items()},
                }
            }
        ),
        flush=True,
    )


def main_semtable() -> None:
    """SemanticIngestor table-mode probe (round-11): the `--ctable` probe
    showed the assignment KERNEL's list wall; this one drives the actual
    at-scale consumer — the INGESTOR — at a k the list path can't hold.
    Each arm pre-seeds the persisted `_epochs/epoch=0` centroid table
    (written distributed, never through the constructor's seed list),
    constructs the ingestor on its restart path (only k, a count, reaches
    the driver), and times one 2000-vector `process`.  The list arm
    (assign='hierarchical': restart collects all k centroids into the
    driver list) stops at LIST_CAP; the table arm keeps running.  Marks
    are re-checked identical at every shared k."""
    import shutil
    import tempfile

    ks = [int(a) for a in sys.argv[2:]] or [4096, 131072, 524288]
    list_cap = int(os.environ.get("SPARK_GRAFT_CTABLE_LIST_CAP", "150000"))
    dim = 16
    spark = get_spark(app_name="flume_probe_semtable")
    from flume_spark.streaming.dedup import SemanticIngestor

    batch = (
        spark.range(2000)
        .select(
            F.col("id").alias("vec_id"),
            F.expr(
                f"transform(sequence(0, {dim - 1}), "
                "j -> (pmod(xxhash64(id + 77, j), 1000) - 500) / 100.0)"
            ).alias("embedding"),
        )
        .localCheckpoint(eager=True)
    )
    table_t: dict[int, float] = {}
    list_t: dict[int, float] = {}
    for k in ks:
        marks: dict[str, set] = {}
        for mode in ("table", "hierarchical"):
            if mode == "hierarchical" and k > list_cap:
                print(
                    json.dumps(
                        {
                            "probe": f"semtable_list@k{k}",
                            "skipped": f"k > LIST_CAP {list_cap}: the "
                            "k-proportional driver centroid list is the wall "
                            "this probe documents",
                        }
                    ),
                    flush=True,
                )
                continue
            root = tempfile.mkdtemp(prefix=f"semtable_{mode}_")
            spark.range(k).select(
                F.col("id").cast("int").alias("cluster"),
                F.expr(
                    f"transform(sequence(0, {dim - 1}), "
                    "j -> (pmod(xxhash64(id, j), 1000) - 500) / 100.0)"
                ).alias("vec"),
            ).write.mode("overwrite").parquet(f"{root}/index/_epochs/epoch=0")
            t0 = time.perf_counter()
            ing = SemanticIngestor(
                spark,
                [],
                index_dir=f"{root}/index",
                marks_dir=f"{root}/marks",
                ledger_dir=f"{root}/ledger",
                threshold=0.9,
                assign=mode,
            )
            ing.process(batch, 0)
            dt = time.perf_counter() - t0
            marks[mode] = {tuple(r) for r in ing.dup_marks().collect()}
            (table_t if mode == "table" else list_t)[k] = dt
            print(
                json.dumps(
                    {
                        "probe": f"semtable_{'table' if mode == 'table' else 'list'}@k{k}",
                        "sec": round(dt, 2),
                        "k": ing.k,
                        "driver_list_mb": (
                            0.0
                            if mode == "table"
                            else round(k * dim * 8 / 1e6, 1)
                        ),
                    }
                ),
                flush=True,
            )
            shutil.rmtree(root, ignore_errors=True)
        if len(marks) == 2:
            same = marks["table"] == marks["hierarchical"]
            print(
                json.dumps({"probe": f"semtable_agree@k{k}", "identical": same}),
                flush=True,
            )
        spark.catalog.clearCache()
    print(
        json.dumps(
            {
                "summary": {
                    "semtable_table_sec": {k: round(v, 2) for k, v in table_t.items()},
                    "semtable_list_sec": {k: round(v, 2) for k, v in list_t.items()},
                }
            }
        ),
        flush=True,
    )


def main_classifier() -> None:
    """Broadcast linear-classifier inference probe (round-10 new op):
    `classifier_score` over salted replica corpora.  Expected ~linear —
    the plan is token-explode + tf agg + a 256-row broadcast join + one
    per-doc integer agg; nothing in it is pairwise, and the weights table
    size is constant in the corpus.  The vocab-selection leg (doc-freq
    agg + TakeOrdered 256) is the only global step and is itself linear
    with a constant-size result."""
    from flume_spark.operators.text import classifier_score

    factors = [int(a) for a in sys.argv[2:]] or [1, 10, 50]
    spark = get_spark(app_name="flume_probe_classifier")
    times: dict[int, float] = {}
    for f in factors:
        docs = scaled_docs(spark, f)
        n = docs.count()
        print(json.dumps({"factor": f, "docs": n}), flush=True)
        # force the FULL scoring plan: a bare count() lets Catalyst prune
        # the row-preserving left join (z is provably unique-keyed) and
        # would time only the corpus scan
        t0 = time.perf_counter()
        row = (
            classifier_score(docs, "doc_id", "text")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum("z_int").alias("sz"),
                F.sum("score").alias("ss"),
            )
            .collect()[0]
        )
        dt = time.perf_counter() - t0
        assert row["n"] == n, "every doc must survive scoring"
        print(
            json.dumps(
                {"probe": f"classifier@x{f}", "sec": round(dt, 2), "rows": row["n"]}
            ),
            flush=True,
        )
        times[f] = dt
        docs.unpersist()
        spark.catalog.clearCache()
    base = factors[0]
    exps = {
        f: round(math.log(times[f] / times[base]) / math.log(f / base), 2)
        for f in factors
        if f != base and times[f] > 0
    }
    print(
        json.dumps(
            {
                "summary": {
                    "classifier_sec": {k: round(v, 2) for k, v in times.items()},
                    "exponent": exps,
                }
            }
        ),
        flush=True,
    )


def main_lm() -> None:
    """Bigram-LM perplexity probe (round-11 new op): `lm_perplexity` over
    salted replica corpora with the REFERENCE SLICE HELD FIXED (the CCNet
    shape: the model trains on a curated reference, not the corpus being
    filtered), so model size is constant while the corpus scales.
    Expected ~linear: bigram explode + tf agg + one model-sided hash join
    + integer per-doc agg; nothing pairwise.  The same count()-prunes-
    the-join trap as the classifier probe applies — the probe aggregates
    sum(lp_int)+sum(ppl) to force the full scoring plan."""
    from flume_spark.operators.text import lm_perplexity

    factors = [int(a) for a in sys.argv[2:]] or [1, 10, 50]
    spark = get_spark(app_name="flume_probe_lm")
    ref = (
        scaled_docs(spark, 1)
        .filter(F.col("doc_id") % 4 == 0)
        .localCheckpoint(eager=True)
    )
    times: dict[int, float] = {}
    for f in factors:
        docs = scaled_docs(spark, f)
        n = docs.count()
        print(json.dumps({"factor": f, "docs": n}), flush=True)
        t0 = time.perf_counter()
        row = (
            lm_perplexity(docs, "doc_id", "text", ref_df=ref)
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum("lp_int").alias("sl"),
                F.sum("ppl").alias("sp"),
            )
            .collect()[0]
        )
        dt = time.perf_counter() - t0
        assert row["n"] == n, "every doc must survive scoring"
        print(
            json.dumps({"probe": f"lm@x{f}", "sec": round(dt, 2), "rows": row["n"]}),
            flush=True,
        )
        times[f] = dt
        docs.unpersist()
        spark.catalog.clearCache()
    base = factors[0]
    exps = {
        f: round(math.log(times[f] / times[base]) / math.log(f / base), 2)
        for f in factors
        if f != base and times[f] > 0
    }
    print(
        json.dumps(
            {
                "summary": {
                    "lm_sec": {k: round(v, 2) for k, v in times.items()},
                    "exponent": exps,
                }
            }
        ),
        flush=True,
    )


def main_lmingest() -> None:
    """LmIngestor per-batch cost vs history size: one FIXED 500-doc batch
    timed against history x1/x10/x50 ingested as 16 micro-batches,
    compacted vs raw state.  Expected ~flat-ish: the scoring join's model
    side is DISTINCT-bigram-sized (vocabulary plateaus while the corpus
    grows), and compaction bounds the prefix read at a few files; the raw
    arm pays a growing per-batch partition listing + re-aggregate of more
    (pre-aggregated) partitions."""
    import shutil
    import tempfile

    factors = [int(a) for a in sys.argv[2:]] or [1, 10, 50]
    n_hist_batches = 16
    spark = get_spark(app_name="flume_probe_lmingest")
    from flume_spark.streaming.lm import LmIngestor

    fixed = (
        scaled_docs(spark, 1)
        .filter(F.col("doc_id") % 10 == 0)
        .select((F.col("doc_id") + 900_000_000).alias("doc_id"), "text")
        .localCheckpoint(eager=True)
    )
    raw_t: dict[int, float] = {}
    comp_t: dict[int, float] = {}
    for f in factors:
        hist = scaled_docs(spark, f).select("doc_id", "text")
        n_hist = hist.count()
        batches = [
            hist.filter(F.col("doc_id") % n_hist_batches == b)
            for b in range(n_hist_batches)
        ]
        for mode in ("raw", "compacted"):
            root = tempfile.mkdtemp(prefix=f"lmingest_{mode}_")
            ing = LmIngestor(
                spark,
                state_dir=f"{root}/state",
                marks_dir=f"{root}/marks",
                ledger_dir=f"{root}/ledger",
            )
            for b, bdf in enumerate(batches):
                ing.process(bdf, b)
            if mode == "compacted":
                t0 = time.perf_counter()
                ing.compact_state()
                dt_comp = time.perf_counter() - t0
            t0 = time.perf_counter()
            ing.process(fixed, n_hist_batches)
            dt = time.perf_counter() - t0
            (raw_t if mode == "raw" else comp_t)[f] = dt
            out = {
                "factor": f,
                "history": n_hist,
                "mode": mode,
                "ingest_sec": round(dt, 2),
            }
            if mode == "compacted":
                out["compact_sec"] = round(dt_comp, 2)
            print(json.dumps(out), flush=True)
            shutil.rmtree(root, ignore_errors=True)
        hist.unpersist()
        spark.catalog.clearCache()
    base = factors[0]

    def exps(times: dict[int, float]) -> dict[int, float]:
        return {
            f: round(math.log(times[f] / times[base]) / math.log(f / base), 2)
            for f in times
            if f != base and times[f] > 0
        }

    print(
        json.dumps(
            {
                "summary": {
                    "lmingest_raw": {
                        "sec": {k: round(v, 2) for k, v in raw_t.items()},
                        "exponent": exps(raw_t),
                    },
                    "lmingest_compacted": {
                        "sec": {k: round(v, 2) for k, v in comp_t.items()},
                        "exponent": exps(comp_t),
                    },
                }
            }
        ),
        flush=True,
    )


def _media_ingest_probe(make_ingestor, label: str) -> None:
    """Shared scaffold for the streaming media-ingestor probes (--phash /
    --frame): one FIXED 1000-doc payload batch timed against history
    x1/x10/x50 (ingested as 16 micro-batches), compacted index vs raw
    per-batch trees.  Expected ~flat-ish per-batch cost: probes read only
    their touched band directories, and compaction bounds the directory
    LISTING at one tree regardless of trigger count — the raw arm pays a
    growing per-batch listing over 16f trees (the --lmingest raw-arm
    signature)."""
    import shutil
    import tempfile

    from flume_spark.operators.multimodal import to_binary_payload

    factors = [int(a) for a in sys.argv[2:]] or [1, 10, 50]
    n_hist_batches = 16
    spark = get_spark(app_name=f"flume_probe_{label}")

    fixed = to_binary_payload(
        scaled_docs(spark, 1).filter(F.col("doc_id") % 10 == 0).select(
            (F.col("doc_id") + 900_000_000).alias("doc_id"), "text"
        ),
        "doc_id",
        "text",
    ).localCheckpoint(eager=True)
    raw_t: dict[int, float] = {}
    comp_t: dict[int, float] = {}
    for f in factors:
        hist = to_binary_payload(
            scaled_docs(spark, f), "doc_id", "text"
        ).localCheckpoint(eager=True)
        n_hist = hist.count()
        batches = [
            hist.filter(F.col("id") % n_hist_batches == b)
            for b in range(n_hist_batches)
        ]
        for mode in ("raw", "compacted"):
            root = tempfile.mkdtemp(prefix=f"{label}_{mode}_")
            ing = make_ingestor(spark, root)
            for b, bdf in enumerate(batches):
                ing.process(bdf, b)
            if mode == "compacted":
                t0 = time.perf_counter()
                ing.compact_index()
                dt_comp = time.perf_counter() - t0
            t0 = time.perf_counter()
            ing.process(fixed, n_hist_batches)
            dt = time.perf_counter() - t0
            (raw_t if mode == "raw" else comp_t)[f] = dt
            out = {
                "factor": f,
                "history": n_hist,
                "mode": mode,
                "ingest_sec": round(dt, 2),
            }
            if mode == "compacted":
                out["compact_sec"] = round(dt_comp, 2)
            print(json.dumps(out), flush=True)
            shutil.rmtree(root, ignore_errors=True)
        hist.unpersist()
        spark.catalog.clearCache()
    base = factors[0]

    def exps(times: dict[int, float]) -> dict[int, float]:
        return {
            f: round(math.log(times[f] / times[base]) / math.log(f / base), 2)
            for f in times
            if f != base and times[f] > 0
        }

    print(
        json.dumps(
            {
                "summary": {
                    f"{label}_raw": {
                        "sec": {k: round(v, 2) for k, v in raw_t.items()},
                        "exponent": exps(raw_t),
                    },
                    f"{label}_compacted": {
                        "sec": {k: round(v, 2) for k, v in comp_t.items()},
                        "exponent": exps(comp_t),
                    },
                }
            }
        ),
        flush=True,
    )


def main_phash() -> None:
    """PhashIngestor per-batch cost vs history size (_media_ingest_probe)
    — verifies the band-bucket layout's flat-per-batch claim the round-11
    verdict called 'design-asserted, never measured'."""
    from flume_spark.streaming.dedup import PhashIngestor

    _media_ingest_probe(
        lambda spark, root: PhashIngestor(
            spark,
            index_dir=f"{root}/index",
            marks_dir=f"{root}/marks",
            ledger_dir=f"{root}/ledger",
            id_col="id",
        ),
        "phash",
    )


def main_frame() -> None:
    """FrameIngestor per-batch cost vs history size (_media_ingest_probe)
    — the frame-containment twin: an EXACT fhash equi-join probe whose
    index side reads only touched fband directories."""
    from flume_spark.streaming.dedup import FrameIngestor

    _media_ingest_probe(
        lambda spark, root: FrameIngestor(
            spark,
            index_dir=f"{root}/index",
            marks_dir=f"{root}/marks",
            ledger_dir=f"{root}/ledger",
            id_col="id",
        ),
        "frame",
    )



def main_align() -> None:
    """AlignIngestor per-batch cost vs history size: one FIXED 1000-doc
    caption batch (refs spread uniformly over rep-0 history media) timed
    against history x1/x10/x50 ingested as 16 micro-batches, compacted
    index vs raw trees.  The probe is a media-key EQUI-JOIN: kbucket
    directory pruning + the batch's media_id IN (...) row-group
    predicate bound the index read by the batch's own ref set, so the
    expected shape is ~flat per-batch cost with the raw arm paying the
    growing 16f-tree directory listing (the --phash signature)."""
    import shutil
    import tempfile

    from flume_spark.operators.multimodal import to_binary_payload
    from flume_spark.streaming.dedup import AlignIngestor

    factors = [int(a) for a in sys.argv[2:]] or [1, 10, 50]
    n_hist_batches = 16
    spark = get_spark(app_name="flume_probe_align")

    def align_frame(docs, ref_expr: str):
        pay = to_binary_payload(docs, "doc_id", "text")
        return (
            pay.select("id", "payload")
            .join(
                docs.select(
                    F.col("doc_id").alias("id"),
                    F.col("text").alias("caption"),
                ),
                "id",
            )
            .withColumn("media_ref", F.expr(ref_expr))
        )

    n_base = scaled_docs(spark, 1).count()
    # fixed probe batch: 1000 synthetic captions whose refs fan out over
    # the rep-0 history media ids (id*7 mod n_base — touches every kbucket)
    fixed = align_frame(
        scaled_docs(spark, 1).filter(F.col("doc_id") % 10 == 0).select(
            (F.col("doc_id") + 900_000_000).alias("doc_id"), "text"
        ),
        f"pmod(id * 7, {n_base})",
    ).localCheckpoint(eager=True)
    raw_t: dict[int, float] = {}
    comp_t: dict[int, float] = {}
    for f in factors:
        hist = align_frame(scaled_docs(spark, f), "id").localCheckpoint(
            eager=True
        )
        n_hist = hist.count()
        batches = [
            hist.filter(F.col("id") % n_hist_batches == b)
            for b in range(n_hist_batches)
        ]
        for mode in ("raw", "compacted"):
            root = tempfile.mkdtemp(prefix=f"align_{mode}_")
            ing = AlignIngestor(
                spark,
                index_dir=f"{root}/index",
                marks_dir=f"{root}/marks",
                ledger_dir=f"{root}/ledger",
                id_col="id",
            )
            for b, bdf in enumerate(batches):
                ing.process(bdf, b)
            if mode == "compacted":
                t0 = time.perf_counter()
                ing.compact_index()
                dt_comp = time.perf_counter() - t0
            t0 = time.perf_counter()
            ing.process(fixed, n_hist_batches)
            dt = time.perf_counter() - t0
            (raw_t if mode == "raw" else comp_t)[f] = dt
            out = {
                "factor": f,
                "history": n_hist,
                "mode": mode,
                "ingest_sec": round(dt, 2),
            }
            if mode == "compacted":
                out["compact_sec"] = round(dt_comp, 2)
            print(json.dumps(out), flush=True)
            shutil.rmtree(root, ignore_errors=True)
        hist.unpersist()
        spark.catalog.clearCache()
    base = factors[0]

    def exps(times: dict[int, float]) -> dict[int, float]:
        return {
            f: round(math.log(times[f] / times[base]) / math.log(f / base), 2)
            for f in times
            if f != base and times[f] > 0
        }

    print(
        json.dumps(
            {
                "summary": {
                    "align_raw": {
                        "sec": {k: round(v, 2) for k, v in raw_t.items()},
                        "exponent": exps(raw_t),
                    },
                    "align_compacted": {
                        "sec": {k: round(v, 2) for k, v in comp_t.items()},
                        "exponent": exps(comp_t),
                    },
                }
            }
        ),
        flush=True,
    )


def main_retrieval() -> None:
    """RetrievalIngestor per-batch cost vs history size: one FIXED
    1000-doc batch (media + captions) timed against history x1/x10/x50
    ingested as 16 micro-batches.  Each factor constructs its ingestor
    with k ~ n_hist/125 frozen centroids (the SemDeDup k-proportional
    discipline a real deployment sizes at — or maintains via epoch
    rolls), so mean cluster population stays ~constant and the expected
    shape is ~flat per-batch cost: leg 1 is new_captions x their cluster
    populations, leg 2 is touched-cluster captions x new media, both
    O(batch x n/k).  A frozen UNDERSIZED k would instead show the linear
    growth this probe exists to catch."""
    import shutil
    import tempfile

    from flume_spark.operators.multimodal import to_binary_payload
    from flume_spark.streaming.dedup import RetrievalIngestor

    factors = [int(a) for a in sys.argv[2:]] or [1, 10, 50]
    n_hist_batches = 16
    spark = get_spark(app_name="flume_probe_retrieval")

    def retr_frame(docs):
        pay = to_binary_payload(docs, "doc_id", "text")
        return pay.select("id", "payload").join(
            docs.select(
                F.col("doc_id").alias("id"), F.col("text").alias("caption")
            ),
            "id",
        )

    fixed = retr_frame(
        scaled_docs(spark, 1).filter(F.col("doc_id") % 10 == 0).select(
            (F.col("doc_id") + 900_000_000).alias("doc_id"), "text"
        )
    ).localCheckpoint(eager=True)
    times: dict[int, float] = {}
    for f in factors:
        hist = retr_frame(scaled_docs(spark, f)).localCheckpoint(eager=True)
        n_hist = hist.count()
        kc = max(4, n_hist // 125)
        from flume_spark.operators.multimodal import feature_extract_stub

        cents = [
            list(r["features"])
            for r in feature_extract_stub(hist.select("id", "payload"))
            .orderBy(F.md5(F.col("id").cast("string")), "id")
            .limit(kc)
            .select("features")
            .collect()
        ]
        batches = [
            hist.filter(F.col("id") % n_hist_batches == b)
            for b in range(n_hist_batches)
        ]
        root = tempfile.mkdtemp(prefix="retr_probe_")
        ing = RetrievalIngestor(
            spark,
            index_dir=f"{root}/index",
            caps_dir=f"{root}/caps",
            topk_dir=f"{root}/topk",
            ledger_dir=f"{root}/ledger",
            centroids=cents,
            id_col="id",
            auto_compact_every=4,
        )
        for b, bdf in enumerate(batches):
            ing.process(bdf, b)
        t0 = time.perf_counter()
        ing.process(fixed, n_hist_batches)
        dt = time.perf_counter() - t0
        times[f] = dt
        print(
            json.dumps(
                {
                    "factor": f,
                    "history": n_hist,
                    "k": kc,
                    "ingest_sec": round(dt, 2),
                }
            ),
            flush=True,
        )
        shutil.rmtree(root, ignore_errors=True)
        hist.unpersist()
        spark.catalog.clearCache()
    base = factors[0]
    print(
        json.dumps(
            {
                "summary": {
                    "retrieval_ingest": {
                        "sec": {k: round(v, 2) for k, v in times.items()},
                        "exponent": {
                            f: round(
                                math.log(times[f] / times[base])
                                / math.log(f / base),
                                2,
                            )
                            for f in times
                            if f != base and times[f] > 0
                        },
                    }
                }
            }
        ),
        flush=True,
    )


def main_mixpack() -> None:
    """corpus_mixture_pack pack-stage cost vs selected-doc count (the
    round-12 VERDICT item 7 done-criterion: pack cost LINEAR in docs):
    the corpus AND the draw size both scale with the factor (k_total =
    200*f over f perturbed replicas), so the packed selection grows
    linearly; the timed leg is the BPE count + shard-window cumsum +
    pack aggregate over the selection.  Expected exponent ~1.0 —
    per-doc codegen BPE replace and one bounded window per shard."""
    import flume_spark.operators.text as text_ops

    factors = [int(a) for a in sys.argv[2:]] or [1, 4, 16]
    spark = get_spark(app_name="flume_probe_mixpack")
    base_lang = (
        spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
        .select(F.col("doc_id").alias("base_id"), "lang")
        .localCheckpoint(eager=True)
    )
    times: dict[int, float] = {}
    sizes: dict[int, int] = {}
    for f in factors:
        # scaled_docs carries (doc_id, text) only; a replica inherits its
        # base doc's language (base_id = doc_id % 10M, the replica stride)
        docs = (
            scaled_docs(spark, f)
            .withColumn("base_id", F.pmod(F.col("doc_id"), F.lit(10_000_000)))
            .join(F.broadcast(base_lang), "base_id")
            .drop("base_id")
            .localCheckpoint(eager=True)
        )
        k_total = 200 * f
        mw = text_ops.mixture_weights(docs, "lang", "text", alpha=0.3)
        quota = mw.select(
            "lang",
            F.floor(F.col("weight") * 1e6 + F.lit(0.5)).cast("long").alias("wq"),
        ).select("lang", F.expr(f"({k_total} * wq) div 1000000").alias("quota"))
        toks = text_ops.token_count(docs, "doc_id", "text").select(
            "doc_id", "n_tokens"
        )
        d = (
            docs.select("doc_id", "lang")
            .join(toks, "doc_id")
            .filter(F.col("n_tokens") > 0)
        )
        h = F.conv(
            F.substring(text_ops.seeded_key("flume", "doc_id"), 1, 12), 16, 10
        ).cast("double")
        u = (h + F.lit(1.0)) / F.lit(float(1 << 48))
        keyed = d.withColumn("_key", -F.log(u) / F.col("n_tokens").cast("double"))
        from pyspark.sql.window import Window

        rn = F.row_number().over(Window.partitionBy("lang").orderBy("_key", "doc_id"))
        sel = (
            keyed.withColumn("rn", rn)
            .join(F.broadcast(quota), "lang")
            .filter(F.col("rn") <= F.col("quota"))
            .select("doc_id")
            .localCheckpoint(eager=True)  # draw staged: time the PACK leg only
        )
        n_sel = sel.count()
        picked = docs.join(sel, "doc_id").localCheckpoint(eager=True)

        def run(p=picked):
            counted = text_ops.bpe_token_count(
                p, "doc_id", "text", text_ops.EN_MERGES_DEMO
            )
            packed = text_ops.pack_by_counts(
                counted, "doc_id", "n_bpe_tokens", budget=256, shards=8
            )
            return packed.groupBy("shard", "pack_id").agg(
                F.count(F.lit(1)).alias("n_docs")
            )

        run().count()  # warm codegen
        dt, _ = probe(f"mixpack_x{f}", run)
        times[f], sizes[f] = dt, n_sel
        print(
            json.dumps(
                {"factor": f, "selected": n_sel, "pack_sec": round(dt, 2)}
            ),
            flush=True,
        )
        spark.catalog.clearCache()
    base = factors[0]
    exps = {
        f: round(
            math.log(times[f] / times[base])
            / math.log(sizes[f] / sizes[base]),
            2,
        )
        for f in factors
        if f != base and times[f] > 0 and sizes[f] != sizes[base]
    }
    print(
        json.dumps(
            {
                "summary": {
                    "mixpack_pack": {
                        "sec": {k: round(v, 2) for k, v in times.items()},
                        "selected": sizes,
                        "exponent": exps,
                    }
                }
            }
        ),
        flush=True,
    )


def main_tiered() -> None:
    """Cumulative MAINTENANCE cost of the two fold modes over a long
    schedule (round-13 VERDICT item 4): 64 batches through PhashIngestor,
    one maintenance call per batch (>= 64 folds per arm), comparing the
    monolithic full fold (rewrites the ENTIRE base each time — O(n^2)
    cumulative bytes) against the tiered LSM fold (each row rewritten
    once per level — O(n log n)).  Bytes are measured by NEW INODES after
    each fold (hardlinked survivors keep their inodes, so the tiered
    arm's linked carry-over correctly counts zero).  Checkpoints at
    n = 16/32/64 report cumulative fold seconds + bytes; sublinear
    bytes-per-index-byte for the tiered arm is the pass criterion."""
    import shutil
    import tempfile

    from flume_spark.operators.multimodal import to_binary_payload
    from flume_spark.streaming.dedup import PhashIngestor

    n_batches = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    spark = get_spark(app_name="flume_probe_tiered")
    docs = scaled_docs(spark, 2)
    pay = to_binary_payload(docs, "doc_id", "text").localCheckpoint(eager=True)
    batches = [
        pay.filter(F.col("id") % n_batches == b).localCheckpoint(eager=True)
        for b in range(n_batches)
    ]

    def inode_bytes(d: str) -> dict[int, int]:
        out: dict[int, int] = {}
        for root, _dirs, files in os.walk(d):
            for fn in files:
                st = os.stat(os.path.join(root, fn))
                out[st.st_ino] = st.st_size
        return out

    results = {}
    for mode in ("full", "tiered"):
        root = tempfile.mkdtemp(prefix=f"tiered_{mode}_")
        ing = PhashIngestor(
            spark,
            index_dir=f"{root}/index",
            marks_dir=f"{root}/marks",
            ledger_dir=f"{root}/ledger",
            id_col="id",
            fanout=4,
        )
        cum_sec, cum_bytes, checkpoints = 0.0, 0, {}
        for b, bdf in enumerate(batches):
            ing.process(bdf, b)
            before = inode_bytes(ing.index_dir)
            t0 = time.perf_counter()
            folded = (
                ing.compact_index() if mode == "full" else ing.compact_step()
            )
            cum_sec += time.perf_counter() - t0
            after = inode_bytes(ing.index_dir)
            cum_bytes += sum(
                sz for ino, sz in after.items() if ino not in before
            )
            assert folded >= 0
            if (b + 1) in (16, 32, n_batches):
                idx_bytes = sum(after.values())
                checkpoints[b + 1] = {
                    "cum_fold_sec": round(cum_sec, 2),
                    "cum_fold_mb": round(cum_bytes / 1e6, 2),
                    "index_mb": round(idx_bytes / 1e6, 2),
                    "write_amp": round(cum_bytes / max(idx_bytes, 1), 1),
                }
                print(
                    json.dumps({"mode": mode, "n": b + 1, **checkpoints[b + 1]}),
                    flush=True,
                )
        results[mode] = checkpoints
        shutil.rmtree(root, ignore_errors=True)
    print(json.dumps({"summary": results}), flush=True)


def main_profile() -> None:
    """Table-profile probe (round-10 stats_profile): exact-NDV profile
    (multi-count-distinct -> ONE Expand, map-side rows x (ndv_cols + 1))
    vs the approx profile (approx_count_distinct HLL sketches, no
    Expand) over replicated orders.  Quantifies the docstring's 100 TB
    guidance: both are one-scan/one-shuffle linear plans; the Expand
    multiplies the map-side row volume by a constant, so the exact form
    stays viable until that constant times the scan dominates — the
    probe records the actual ratio."""
    factors = [int(a) for a in sys.argv[2:]] or [1, 10, 50]
    spark = get_spark(app_name="flume_probe_profile")
    from flume_spark.operators.quality import profile_table

    base = spark.read.parquet(os.path.join(SF_DIR, "orders.parquet")).select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority", "o_totalprice"
    )
    ndv_cols = ["o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority"]
    exact_t: dict[int, float] = {}
    approx_t: dict[int, float] = {}
    for f in factors:
        reps = spark.range(f).withColumnRenamed("id", "rep")
        # keys remapped per replica so NDV grows with the corpus like a
        # real release would (statuses/priorities stay low-cardinality)
        orders = base.crossJoin(reps).select(
            (F.col("o_orderkey") + F.col("rep") * 1_000_000_000).alias("o_orderkey"),
            (F.col("o_custkey") + F.col("rep") * 1_000_000_000).alias("o_custkey"),
            "o_orderstatus",
            "o_orderpriority",
            "o_totalprice",
        ).localCheckpoint(eager=True)
        n = orders.count()
        print(json.dumps({"factor": f, "rows": n}), flush=True)
        t0 = time.perf_counter()
        profile_table(orders, ndv_cols, min_max_cols=["o_totalprice"]).collect()
        exact_t[f] = time.perf_counter() - t0
        t0 = time.perf_counter()
        orders.agg(
            F.count(F.lit(1)).alias("n_rows"),
            *[F.approx_count_distinct(c).alias(f"andv_{c}") for c in ndv_cols],
            F.min("o_totalprice"),
            F.max("o_totalprice"),
        ).collect()
        approx_t[f] = time.perf_counter() - t0
        print(
            json.dumps(
                {
                    "probe": f"profile@x{f}",
                    "exact_sec": round(exact_t[f], 2),
                    "approx_sec": round(approx_t[f], 2),
                }
            ),
            flush=True,
        )
        orders.unpersist()
    b = factors[0]
    print(
        json.dumps(
            {
                "summary": {
                    "profile_exact_sec": {k: round(v, 2) for k, v in exact_t.items()},
                    "profile_approx_sec": {k: round(v, 2) for k, v in approx_t.items()},
                    "exact_exponent": {
                        f: round(math.log(exact_t[f] / exact_t[b]) / math.log(f / b), 2)
                        for f in factors
                        if f != b
                    },
                }
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--ingest":
        main_ingest()
    elif len(sys.argv) > 1 and sys.argv[1] == "--cms":
        main_cms()
    elif len(sys.argv) > 1 and sys.argv[1] == "--graph":
        main_graph()
    elif len(sys.argv) > 1 and sys.argv[1] == "--tri":
        main_tri()
    elif len(sys.argv) > 1 and sys.argv[1] == "--ts":
        main_ts()
    elif len(sys.argv) > 1 and sys.argv[1] == "--claim":
        main_claim()
    elif len(sys.argv) > 1 and sys.argv[1] == "--znorm":
        main_znorm()
    elif len(sys.argv) > 1 and sys.argv[1] == "--backend":
        main_backend()
    elif len(sys.argv) > 1 and sys.argv[1] == "--prefix":
        main_prefix()
    elif len(sys.argv) > 1 and sys.argv[1] == "--substr":
        main_substr()
    elif len(sys.argv) > 1 and sys.argv[1] == "--semantic":
        main_semantic()
    elif len(sys.argv) > 1 and sys.argv[1] == "--multimodal":
        main_multimodal()
    elif len(sys.argv) > 1 and sys.argv[1] == "--semingest":
        main_semingest()
    elif len(sys.argv) > 1 and sys.argv[1] == "--funnel":
        main_funnel()
    elif len(sys.argv) > 1 and sys.argv[1] == "--ctable":
        main_ctable()
    elif len(sys.argv) > 1 and sys.argv[1] == "--semtable":
        main_semtable()
    elif len(sys.argv) > 1 and sys.argv[1] == "--classifier":
        main_classifier()
    elif len(sys.argv) > 1 and sys.argv[1] == "--lm":
        main_lm()
    elif len(sys.argv) > 1 and sys.argv[1] == "--lmingest":
        main_lmingest()
    elif len(sys.argv) > 1 and sys.argv[1] == "--phash":
        main_phash()
    elif len(sys.argv) > 1 and sys.argv[1] == "--frame":
        main_frame()
    elif len(sys.argv) > 1 and sys.argv[1] == "--align":
        main_align()
    elif len(sys.argv) > 1 and sys.argv[1] == "--retrieval":
        main_retrieval()
    elif len(sys.argv) > 1 and sys.argv[1] == "--tiered":
        main_tiered()
    elif len(sys.argv) > 1 and sys.argv[1] == "--mixpack":
        main_mixpack()
    elif len(sys.argv) > 1 and sys.argv[1] == "--profile":
        main_profile()
    elif len(sys.argv) > 1 and sys.argv[1] == "--scd2":
        main_scd2()
    elif len(sys.argv) > 1 and sys.argv[1] == "--scd2compact":
        main_scd2_compact()
    elif len(sys.argv) > 1 and sys.argv[1] == "--pq":
        main_pq()
    else:
        main()
