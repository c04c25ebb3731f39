"""Round-6 operator tests: z-normalized SAX, claim-plan scale shape
adjuncts, and the auto-resolution sizing helpers."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from flume_spark.operators import timeseries

GAUSS4 = [(-6745, 10000), (0, 1), (6745, 10000)]


@pytest.fixture()
def no_broadcast(spark):
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def _paa_from_rows(spark, rows):
    """rows: list of (key, [v0..v_{n-1}]) -> a PAA-shaped frame."""
    data = [
        (k, s, int(v)) for k, vals in rows for s, v in enumerate(vals)
    ]
    return spark.createDataFrame(data, "key string, seg long, mean_micro long")


def _words(df):
    return {r["key"]: r["word"] for r in df.collect()}


def test_znorm_offset_invariance(spark):
    """The whole point of z-normalization: adding a constant offset to a
    series must not change its word, while the absolute-scale variant
    (correctly) separates the levels."""
    base = [10, 20, 30, 40, 50, 60, 70, 80]
    paa = _paa_from_rows(
        spark,
        [
            ("lo", base),
            ("hi", [v + 100000 for v in base]),
            ("mid", [v + 5000 for v in base]),
        ],
    )
    zw = _words(timeseries.sax_words_znorm(paa, GAUSS4, 8))
    assert zw["lo"] == zw["hi"] == zw["mid"]
    aw = _words(timeseries.sax_words(paa, [50, 100000]))
    assert aw["lo"] != aw["hi"]  # absolute scale is level-sensitive


def test_znorm_amplitude_invariance(spark):
    """Positive scaling leaves z-scores unchanged (up to the one floor-sqrt
    boundary): 10x amplitude -> same word."""
    base = [100, 250, 400, 900, 400, 250, 100, 50]
    paa = _paa_from_rows(
        spark, [("x1", base), ("x10", [v * 10 for v in base])]
    )
    zw = _words(timeseries.sax_words_znorm(paa, GAUSS4, 8))
    assert zw["x1"] == zw["x10"]


def test_znorm_flat_series_share_one_block(spark):
    """v = 0 (zero variance) collapses to the last symbol repeated for
    every flat series — one shared block, documented behavior."""
    paa = _paa_from_rows(
        spark, [("f0", [7] * 8), ("f1", [12345] * 8), ("shaped", [0, 0, 0, 0, 9, 9, 9, 9])]
    )
    zw = _words(timeseries.sax_words_znorm(paa, GAUSS4, 8))
    assert zw["f0"] == zw["f1"] == "d" * 8
    assert zw["shaped"] != zw["f0"]


def test_znorm_matches_float_reference(spark):
    """The integer algebra must agree with a plain float z-norm SAX on
    cases away from the rounding boundary."""
    import math

    rows = [
        ("a", [10, 40, 90, 160, 250, 360, 490, 640]),
        ("b", [640, 490, 360, 250, 160, 90, 40, 10]),
        ("c", [5, 900, 5, 900, 5, 900, 5, 900]),
    ]
    paa = _paa_from_rows(spark, rows)
    zw = _words(timeseries.sax_words_znorm(paa, GAUSS4, 8))

    def ref_word(vals):
        n = len(vals)
        mu = sum(vals) / n
        sd = math.sqrt(sum((v - mu) ** 2 for v in vals) / n)
        out = []
        for v in vals:
            z = (v - mu) / sd
            if z < -0.6745:
                out.append("a")
            elif z < 0:
                out.append("b")
            elif z < 0.6745:
                out.append("c")
            else:
                out.append("d")
        return "".join(out)

    for k, vals in rows:
        assert zw[k] == ref_word(vals), k


def test_znorm_rejects_empty_and_bad_breakpoints(spark):
    paa = _paa_from_rows(spark, [("a", [1, 2, 3, 4])])
    with pytest.raises(ValueError):
        timeseries.sax_words_znorm(paa, [], 4)
    with pytest.raises(ValueError):
        timeseries.sax_words_znorm(paa, [(1, 0)], 4)


# ---------------------------------------------------------------------------
# training-shard export (operators/export.py)
# ---------------------------------------------------------------------------


def test_write_training_shards_roundtrip(spark, tmp_path):
    """The physical export equals the logical manifest: written files
    partition by the same pmod assignment, every doc lands in exactly one
    shard, re-read content matches the source, and manifest.json numbers
    match shard_stats (the oracled query's frame)."""
    from flume_spark.operators import export
    from flume_spark.queries._util import T

    docs = T(spark, "/root/testdata/sf0.001", "documents").select(
        "doc_id", "text"
    )
    path = str(tmp_path / "shards")
    manifest = export.write_training_shards(docs, path, shards=8)
    assert manifest["shards"] == 8
    assert manifest["n_docs"] == docs.count()
    back = spark.read.parquet(path)
    assert back.count() == docs.count()
    # every row's stored shard matches the deterministic assignment
    bad = back.filter(
        F.col("shard") != F.pmod(F.col("doc_id"), F.lit(8)).cast("int")
    ).count()
    assert bad == 0
    # content round-trips exactly
    assert (
        back.select("doc_id", "text")
        .exceptAll(docs)
        .unionByName(docs.exceptAll(back.select("doc_id", "text")))
        .count()
        == 0
    )
    # manifest numbers == the logical stats frame
    stats = {
        str(r["shard"]): (r["n_docs"], r["n_tokens"], r["n_chars"])
        for r in export.shard_stats(docs, "doc_id", "text", 8).collect()
    }
    for k, v in manifest["per_shard"].items():
        assert stats[k] == (v["n_docs"], v["n_tokens"], v["n_chars"])
    # one data file per shard: the loader-facing contract
    import glob

    for k in stats:
        files = glob.glob(f"{path}/shard={k}/*.parquet")
        assert len(files) == 1, (k, files)
    assert export.read_manifest(path) == manifest


# ---------------------------------------------------------------------------
# BFS shortest path (graph.bfs_hops)
# ---------------------------------------------------------------------------


def test_bfs_hops_path_graph(spark):
    """Known distances on a directed path + an unreachable island + a
    shortcut: min-hop semantics, max_hops cap, early frontier stop."""
    from flume_spark.operators import graph

    # 0->1->2->3->4->5 (path), 0->3 (shortcut), 10->11 (island)
    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3), (3, 4), (4, 5), (0, 3), (10, 11)],
        "src long, dst long",
    )
    sources = spark.createDataFrame([(0,)], "v long")
    got = {
        r["vertex"]: r["dist"]
        for r in graph.bfs_hops(edges, sources, max_hops=8).collect()
    }
    assert got == {0: 0, 1: 1, 2: 2, 3: 1, 4: 2, 5: 3}  # shortcut wins, island absent
    capped = {
        r["vertex"]: r["dist"]
        for r in graph.bfs_hops(edges, sources, max_hops=2).collect()
    }
    assert capped == {0: 0, 1: 1, 2: 2, 3: 1, 4: 2}  # 5 is beyond the cap
    multi = {
        r["vertex"]: r["dist"]
        for r in graph.bfs_hops(
            edges, spark.createDataFrame([(0,), (10,)], "v long"), max_hops=8
        ).collect()
    }
    assert multi[10] == 0 and multi[11] == 1 and multi[5] == 3


def test_sssp_k_exact_weighted(spark):
    """Bounded Bellman-Ford on a known weighted graph: a cheap long route
    beats an expensive direct edge only once k admits enough edges."""
    from flume_spark.operators import graph

    # 0->3 direct cost 10; 0->1->2->3 cost 3; island 9
    edges = spark.createDataFrame(
        [(0, 3, 10), (0, 1, 1), (1, 2, 1), (2, 3, 1), (9, 9, 1)],
        "src long, dst long, w long",
    )
    sources = spark.createDataFrame([(0,)], "v long")

    def run(k):
        return {
            r["vertex"]: r["dist"]
            for r in graph.sssp_k_exact(edges, sources, k=k).collect()
        }

    assert run(1) == {0: 0, 1: 1, 3: 10}  # only direct edges
    assert run(3) == {0: 0, 1: 1, 2: 2, 3: 3}  # long route wins at k>=3
    assert run(8) == {0: 0, 1: 1, 2: 2, 3: 3}  # stable past convergence


def test_triangle_count_known_graph(spark):
    """Kite graph: triangle (0,1,2) + triangle (1,2,3) sharing edge 1-2;
    vertex 4 hangs off with no triangle.  Directed both ways (the
    co-purchase convention)."""
    from flume_spark.operators import graph

    und = [(0, 1), (0, 2), (1, 2), (1, 3), (2, 3), (3, 4)]
    both = und + [(b, a) for a, b in und]
    edges = spark.createDataFrame(both, "src long, dst long")
    got = {
        r["vertex"]: r["n_tri"] for r in graph.triangle_count(edges).collect()
    }
    assert got == {0: 1, 1: 2, 2: 2, 3: 1}


# ---------------------------------------------------------------------------
# auto-resolution sizing helpers (operators/sizing.py)
# ---------------------------------------------------------------------------


def test_sizing_reproduces_repo_settings():
    """The helpers must land on the resolutions the repo already validated:
    the declared SAX query (150 users, alphabet 3, block 2 -> 4 segments),
    the BASELINE x50 probe corpus (75k users, alphabet 4, block 4 -> 8),
    and both LSH configurations (8 hashes @0.5 -> 4 bands, 16 @0.7 -> 4)."""
    from flume_spark.operators import sizing

    assert sizing.suggest_sax_resolution(150, target_block=2, alphabet=3) == 4
    assert sizing.suggest_sax_resolution(75_000, target_block=4, alphabet=4) == 8
    assert sizing.suggest_lsh_bands(8, 0.5) == 4
    assert sizing.suggest_lsh_bands(16, 0.7) == 4


def test_sizing_monotonicity_properties():
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from flume_spark.operators import sizing

    @settings(max_examples=200, deadline=None)
    @given(
        n=st.integers(0, 10**9),
        block=st.integers(1, 10**6),
        alpha=st.integers(2, 26),
    )
    def sax_props(n, block, alpha):
        s = sizing.suggest_sax_resolution(n, block, alpha)
        # sufficiency: the suggested space covers the need
        assert alpha**s >= max(1, -(-n // block))
        # minimality: one fewer segment would not
        assert s == 1 or alpha ** (s - 1) < max(1, -(-n // block))
        # monotone in corpus size and (anti) in target block
        assert sizing.suggest_sax_resolution(n + max(1, n), block, alpha) >= s
        assert sizing.suggest_sax_resolution(n, block + 1, alpha) <= s

    @settings(max_examples=200, deadline=None)
    @given(h=st.integers(1, 512), t=st.floats(0.01, 1.0))
    def lsh_props(h, t):
        b = sizing.suggest_lsh_bands(h, t)
        assert h % b == 0
        # lower threshold never yields fewer bands (recall direction)
        assert sizing.suggest_lsh_bands(h, max(0.01, t * 0.5)) >= b

    @settings(max_examples=200, deadline=None)
    @given(n=st.integers(0, 10**9), p=st.integers(1, 10**9))
    def block_props(n, p):
        w = sizing.suggest_block_space(n, p)
        # expected pairs under uniform blocking stays within target
        assert n < 2 or n * n / (2 * w) <= p + 1
        assert sizing.suggest_cosine_blocks(n, p) >= 1

    sax_props()
    lsh_props()
    block_props()


def test_sizing_wired_into_declared_lsh_queries():
    """The declared dedup queries now derive their band count from the
    helper; the oracle SQL pins 4, so the helper must agree — this test
    is the tripwire if either side drifts."""
    import inspect

    from flume_spark.operators.sizing import suggest_lsh_bands
    from flume_spark.queries import llm_ops

    assert suggest_lsh_bands(16, 0.7) == 4  # what the oracle SQL pins
    for fn in (llm_ops.dedup_minhash_lsh, llm_ops.dedup_lsh_verified):
        assert "suggest_lsh_bands" in inspect.getsource(fn)


# ---------------------------------------------------------------------------
# edge-index refresh: append + degree-merge compaction (graph.py)
# ---------------------------------------------------------------------------


def _ring_edges(spark, n=60, k=3, start=0):
    rows = [
        (i, (i + j) % n) for i in range(start, n) for j in range(1, k + 1)
    ]
    return spark.createDataFrame(rows, "src long, dst long")


def test_edge_index_append_replay_converges(spark, tmp_path):
    """A graph built by 3 appends must iterate IDENTICALLY to the same
    graph written as one snapshot — through read_edge_index before
    compaction (window-derived degrees), and through the raw table after
    compact_edge_index (merged stored degrees).  The LSH-ingestor
    replay-convergence treatment applied to graphs."""
    from flume_spark.operators import graph

    full = _ring_edges(spark, n=60, k=3)
    thirds = [
        full.filter((F.col("src") % 3) == r).localCheckpoint(eager=True)
        for r in range(3)
    ]
    buckets = int(spark.conf.get("spark.sql.shuffle.partitions"))
    try:
        graph.write_edge_index(
            full, "r6_ref", str(tmp_path / "ref"), buckets=buckets
        )
        expected = sorted(
            map(tuple, graph.pagerank_k_exact(spark.table("r6_ref"), iters=2).collect())
        )
        graph.write_edge_index(
            thirds[0], "r6_grow", str(tmp_path / "grow"), buckets=buckets
        )
        for b, part in enumerate(thirds[1:], start=1):
            graph.append_edge_index(part, "r6_grow", ingest_batch=b)
        # pre-compaction: the raw table's stored out_deg is batch-local
        # (stale), read_edge_index's derived degrees are correct
        live = graph.read_edge_index(spark, "r6_grow")
        got_live = sorted(
            map(tuple, graph.pagerank_k_exact(live, iters=2).collect())
        )
        assert got_live == expected
        # replay exclusion: dropping the last batch = the 2-batch graph
        partial = graph.read_edge_index(spark, "r6_grow", exclude_batch=2)
        two = thirds[0].unionByName(thirds[1])
        graph.write_edge_index(
            two, "r6_two", str(tmp_path / "two"), buckets=buckets
        )
        assert sorted(
            map(tuple, graph.pagerank_k_exact(partial, iters=2).collect())
        ) == sorted(
            map(tuple, graph.pagerank_k_exact(spark.table("r6_two"), iters=2).collect())
        )
        # compaction merges degrees: the RAW table is now equivalent, and
        # per-append file growth collapses back to `buckets`
        n_files_before = len(spark.table("r6_grow").inputFiles())
        n_files = graph.compact_edge_index(
            spark, "r6_grow", str(tmp_path / "grow"), buckets=buckets
        )
        assert n_files <= buckets < n_files_before
        got_compacted = sorted(
            map(tuple, graph.pagerank_k_exact(spark.table("r6_grow"), iters=2).collect())
        )
        assert got_compacted == expected
    finally:
        for t in ("r6_ref", "r6_grow", "r6_two", "r6_grow__compacting"):
            spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_edge_index_read_view_stays_exchange_free(spark, tmp_path, no_broadcast):
    """read_edge_index's window-derived degrees must not cost the layout
    its plan property: the per-iteration join still reads the edge side
    straight from its buckets (SelectedBucketsCount present, marginal
    exchanges per extra iteration unchanged at 2 = rank vector + dst
    partial-agg), even on an index that has live appends."""
    from flume_spark.operators import graph
    from flume_spark.plans import explain_str, n_shuffles

    buckets = int(spark.conf.get("spark.sql.shuffle.partitions"))
    try:
        graph.write_edge_index(
            _ring_edges(spark, n=40, k=2),
            "r6_exfree",
            str(tmp_path / "exfree"),
            buckets=buckets,
        )
        graph.append_edge_index(
            _ring_edges(spark, n=40, k=1, start=20), "r6_exfree", ingest_batch=1
        )
        live = graph.read_edge_index(spark, "r6_exfree")
        plan1 = graph.pagerank_k_exact(live, iters=1)
        assert "SelectedBucketsCount" in explain_str(plan1)
        marginal = n_shuffles(
            graph.pagerank_k_exact(live, iters=2)
        ) - n_shuffles(plan1)
        assert marginal == 2, marginal
    finally:
        spark.sql("DROP TABLE IF EXISTS r6_exfree")


def test_edge_ingestor_replay_and_compaction_converge(spark, tmp_path):
    """Streaming edge ingest (EdgeIngestor): 3 micro-batches == one
    snapshot for pagerank; a crash-window replay (same batch_id again,
    below the ledger) is skipped by the partition check instead of
    doubling degrees; compaction preserves the fixpoint."""
    from flume_spark.operators import graph
    from flume_spark.streaming.graph import EdgeIngestor

    full = _ring_edges(spark, n=45, k=2)
    batches = [
        full.filter((F.col("src") % 3) == r).localCheckpoint(eager=True)
        for r in range(3)
    ]
    buckets = int(spark.conf.get("spark.sql.shuffle.partitions"))
    try:
        graph.write_edge_index(
            full, "r6_ing_ref", str(tmp_path / "ref"), buckets=buckets
        )
        expected = sorted(
            map(
                tuple,
                graph.pagerank_k_exact(
                    spark.table("r6_ing_ref"), iters=2
                ).collect(),
            )
        )
        ing = EdgeIngestor(
            spark,
            "r6_ing",
            str(tmp_path / "ing"),
            ledger_dir=str(tmp_path / "ledger"),
            buckets=buckets,
        )
        for b, part in enumerate(batches):
            ing.process(part, b)
        # ledger-level replay: marker present -> no-op
        ing.process(batches[1], 1)
        # crash-window replay: bypass the ledger; the ingestor's own
        # commit marker skips the re-append
        ing._process(batches[2], 2)
        n_edges = spark.table("r6_ing").count()
        assert n_edges == full.count(), "replay doubled a batch"
        # crash DURING the append: marker lost + partition partially
        # visible (simulated by deleting the marker and one data file) —
        # the replay must drop the partial partition and re-append whole
        import glob
        import os as _os

        _os.unlink(ing._marker_path(2))
        part_files = glob.glob(str(tmp_path / "ing" / "ingest_batch=2" / "*.parquet"))
        assert part_files
        _os.unlink(part_files[0])
        spark.sql("REFRESH TABLE r6_ing")
        assert spark.table("r6_ing").count() < full.count()  # truncated
        ing._process(batches[2], 2)
        assert spark.table("r6_ing").count() == full.count(), "partial not healed"
        got = sorted(
            map(tuple, graph.pagerank_k_exact(ing.edges(), iters=2).collect())
        )
        assert got == expected
        ing.compact()
        got2 = sorted(
            map(
                tuple,
                graph.pagerank_k_exact(spark.table("r6_ing"), iters=2).collect(),
            )
        )
        assert got2 == expected
    finally:
        for t in ("r6_ing_ref", "r6_ing", "r6_ing__compacting"):
            spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_znorm_single_shuffle(spark):
    """Stats ride a key-partitioned window, not a join: one exchange for
    the whole words plan beyond the PAA input."""
    from flume_spark.plans import n_nodes

    paa = _paa_from_rows(spark, [("a", [1, 2, 3, 4]), ("b", [4, 3, 2, 1])])
    words = timeseries.sax_words_znorm(paa, GAUSS4, 4)
    assert n_nodes(words, "Exchange") <= 2  # parallelize input + key grain
