"""Round-5 additions: lazy corpus-shuffle rank offsets (pure plan, no
call-time job), the bucketed-edge PageRank layout (exchange-free
per-iteration join), and the k-step exact-integer PageRank core.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from flume_spark.plans import explain_str


@pytest.fixture()
def no_broadcast(spark):
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


# ---------------------------------------------------------------------------
# corpus_shuffle: rank offsets computed lazily in-plan (round-4 ADVICE)
# ---------------------------------------------------------------------------


def test_corpus_shuffle_rank_is_lazy(spark):
    """corpus_shuffle must return a PURE lazy plan — no Spark job at call
    time (round-4 ADVICE: the eager per-bucket count collect froze offsets
    at build time, so a frame built before the underlying data changed
    mixed stale offsets with fresh per-bucket row_numbers).  Pin it with a
    poisoned input: building the frame over rows whose computation raises
    must succeed; only the ACTION may blow up."""
    import pytest

    from flume_spark.operators import text

    def boom(_):
        raise RuntimeError("corpus_shuffle materialized its input at call time")

    rdd = spark.sparkContext.parallelize([(1,)], 2).map(boom)
    df = spark.createDataFrame(rdd, "doc_id long")  # explicit schema: no sampling job
    ranked = text.corpus_shuffle(df, "doc_id", buckets=8)  # must NOT raise
    with pytest.raises(Exception, match="materialized its input"):
        ranked.collect()


def _ring_edges(spark, n=60, k=3):
    """Deterministic test graph: each vertex i points to i+1..i+k (mod n)."""
    rows = [(i, (i + j) % n) for i in range(n) for j in range(1, k + 1)]
    return spark.createDataFrame(rows, "src long, dst long")


# ---------------------------------------------------------------------------
# bucketed-edge PageRank layout (write_edge_index)
# ---------------------------------------------------------------------------


def test_edge_index_iteration_join_is_edge_side_exchange_free(
    spark, tmp_path, no_broadcast
):
    """THE plan gate for the claim at graph.py:12: with the edge table
    bucketed by src, the per-iteration ranks ⋈ edges join reads the edge
    side straight from its buckets — the bucketed plan loses the edge-side
    Exchanges that the plain-parquet layout pays EVERY round (degs join +
    rank join, both keyed on src), and only the rank vector shuffles."""
    from flume_spark.operators import graph
    from flume_spark.plans import n_shuffles

    edges = _ring_edges(spark)
    try:
        # buckets == spark.sql.shuffle.partitions (the deployment contract
        # the docstring states: mismatched counts make EnsureRequirements
        # re-shuffle the edge-sized side to align partition counts).  Read
        # the LIVE conf: the first declared query in a shared session
        # normalizes it via tune_session (8 -> 32 mid-suite).
        buckets = int(spark.conf.get("spark.sql.shuffle.partitions"))
        graph.write_edge_index(
            edges, "r5_eidx", str(tmp_path / "eidx"), buckets=buckets
        )
        edges.write.parquet(str(tmp_path / "eplain"))

        def shuffles(edge_df, iters):
            return n_shuffles(graph.pagerank_k_exact(edge_df, iters=iters))

        plain_df = spark.read.parquet(str(tmp_path / "eplain"))
        assert "SelectedBucketsCount" in explain_str(
            graph.pagerank_k_exact(spark.table("r5_eidx"), iters=1)
        )
        # the MARGINAL cost of an iteration is what compounds at scale:
        # bucketed pays exactly 2 exchanges per extra round (the O(|V|)
        # rank vector + the dst partial-agg), plain pays those PLUS the
        # edge-sized degs/contributions shuffles every round
        marginal_bucketed = shuffles(spark.table("r5_eidx"), 2) - shuffles(
            spark.table("r5_eidx"), 1
        )
        marginal_plain = shuffles(plain_df, 2) - shuffles(plain_df, 1)
        assert marginal_bucketed == 2, marginal_bucketed
        assert marginal_plain >= marginal_bucketed + 2, (
            marginal_bucketed,
            marginal_plain,
        )
        # layout changes the plan, never the numbers
        assert sorted(
            map(tuple, graph.pagerank_k_exact(spark.table("r5_eidx"), iters=2).collect())
        ) == sorted(map(tuple, graph.pagerank_k_exact(plain_df, iters=2).collect()))
    finally:
        spark.sql("DROP TABLE IF EXISTS r5_eidx")


def test_float_pagerank_rides_edge_index_too(spark, tmp_path, no_broadcast):
    """The production float loop gets the same treatment: pagerank() over
    the bucketed table engages the bucketed scan (every iteration)."""
    from flume_spark.operators import graph

    edges = _ring_edges(spark)
    try:
        buckets = int(spark.conf.get("spark.sql.shuffle.partitions"))
        graph.write_edge_index(
            edges, "r5_eidx2", str(tmp_path / "eidx2"), buckets=buckets
        )
        ranks = graph.pagerank(spark.table("r5_eidx2"), iters=2)
        assert "SelectedBucketsCount" in explain_str(ranks)
        total = sum(r["rank"] for r in ranks.collect())
        assert abs(total - 1.0) < 1e-9  # mass conserved, same as plain
    finally:
        spark.sql("DROP TABLE IF EXISTS r5_eidx2")


# ---------------------------------------------------------------------------
# k-step exact-integer PageRank
# ---------------------------------------------------------------------------


def test_pagerank_k_exact_tracks_float_pagerank(spark):
    """The integer fixed point is the float loop's value to ~1e-12: compare
    r_micro/MICRO against N * float-rank after the same number of steps on
    a dangling-free graph (identical semantics there)."""
    from flume_spark.operators import graph
    from flume_spark.operators.graph import MICRO

    edges = _ring_edges(spark, n=40, k=2)
    n = 40
    exact = {
        r.vertex: r.r_micro / MICRO
        for r in graph.pagerank_k_exact(edges, iters=3).collect()
    }
    flt = {
        r.vertex: n * r.rank
        for r in graph.pagerank(edges, iters=3, checkpoint_every=10).collect()
    }
    assert set(exact) == set(flt)
    for v in exact:
        assert abs(exact[v] - flt[v]) < 1e-6, (v, exact[v], flt[v])


def test_pagerank_k_exact_is_deterministic_across_partitionings(spark):
    """Integer sums are aggregation-order-independent: the same graph
    through wildly different partition counts yields bit-identical
    r_micro — the property the hash gate depends on."""
    from flume_spark.operators import graph

    edges = _ring_edges(spark, n=50, k=3)
    a = sorted(map(tuple, graph.pagerank_k_exact(edges, iters=3).collect()))
    b = sorted(
        map(
            tuple,
            graph.pagerank_k_exact(edges.repartition(17), iters=3).collect(),
        )
    )
    assert a == b


def test_corpus_shuffle_plan_has_no_single_partition_exchange(spark):
    """The lazy offset subplan (broadcast theta-join running sum over the
    ≤buckets-row aggregate) must not reintroduce the single-partition
    window the two-pass rank exists to avoid."""
    from flume_spark.operators import text

    df = spark.range(1000).select(F.col("id").alias("doc_id"))
    plan = explain_str(text.corpus_shuffle(df, "doc_id", buckets=8))
    assert "Exchange SinglePartition" not in plan


# ---------------------------------------------------------------------------
# fixed-bin histogram sketch (operators/skew.py) + HistIngestor
# ---------------------------------------------------------------------------


def test_histogram_quantile_rank_property(spark):
    """est_hi must sit at or above the true q-quantile and within one bin
    width of it: rank(values <= est_hi) >= ceil(q*N), and the bin's LOWER
    edge must sit strictly below the rank target (the crossing bin is the
    first to reach it)."""
    import math

    from flume_spark.operators.skew import histogram_quantile_est, histogram_table

    df = spark.createDataFrame(
        [(float(i * i % 997),) for i in range(5000)], "v double"
    )
    lo, hi, bins = 0.0, 1000.0, 64
    table = histogram_table(df, "v", lo, hi, bins=bins)
    ests = histogram_quantile_est(table, [0.5, 0.9, 0.99], lo, hi, bins).collect()
    vals = sorted(r.v for r in df.collect())
    n = len(vals)
    binw = (hi - lo) / bins
    assert len(ests) == 3
    for r in ests:
        target = math.ceil(r.q * n)
        n_le = sum(1 for v in vals if v <= r.est_hi)
        assert n_le >= target, (r.q, n_le, target)
        true_q = vals[target - 1]
        assert r.est_hi >= true_q
        assert r.est_hi - true_q <= binw + 1e-9, (r.q, r.est_hi, true_q)


def test_histogram_merge_equals_whole_build(spark):
    """Cell-wise merge of per-slice histograms == the single-pass build
    over the union — the re-aggregability that makes per-day sketches
    answer any-range quantile questions without rescans."""
    from flume_spark.operators.skew import histogram_merge, histogram_table

    slices = [
        spark.createDataFrame([(float(i),) for i in range(lo, hi)], "v double")
        for lo, hi in ((0, 300), (300, 700), (700, 1000))
    ]
    parts = [histogram_table(s, "v", 0.0, 1000.0, bins=32) for s in slices]
    merged = parts[0]
    for p in parts[1:]:
        merged = merged.unionByName(p)
    got = sorted(map(tuple, histogram_merge(merged).collect()))
    whole = histogram_table(
        slices[0].unionByName(slices[1]).unionByName(slices[2]),
        "v", 0.0, 1000.0, bins=32,
    )
    assert got == sorted(map(tuple, whole.collect()))


def test_hist_ingestor_replay_converges(spark, tmp_path):
    """HistIngestor: replayed batch is a no-op (ledger), merged history
    equals the union build, quantiles answer from merged state."""
    from flume_spark.operators.skew import histogram_table
    from flume_spark.streaming.sketch import HistIngestor

    ing = HistIngestor(
        spark, str(tmp_path / "sk"), str(tmp_path / "lg"),
        value_col="v", lo=0.0, hi=100.0, bins=16,
    )
    b0 = spark.createDataFrame([(float(i % 100),) for i in range(500)], "v double")
    b1 = spark.createDataFrame([(float((i * 7) % 100),) for i in range(300)], "v double")
    ing.process(b0, 0)
    ing.process(b1, 1)
    ing.process(b1, 1)  # replay: must not double-count
    got = sorted(map(tuple, ing.merged().collect()))
    whole = histogram_table(b0.unionByName(b1), "v", 0.0, 100.0, bins=16)
    assert got == sorted(map(tuple, whole.collect()))
    qs = {r.q: r for r in ing.quantiles([0.5]).collect()}
    assert qs[0.5].n_total == 800


# ---------------------------------------------------------------------------
# property tests (hypothesis) — the numeric cores behind the round-5 ops
# ---------------------------------------------------------------------------

from fractions import Fraction

from hypothesis import given, settings
from hypothesis import strategies as st


@given(
    x=st.integers(min_value=0, max_value=10**15),
    y=st.integers(min_value=1, max_value=10**12),
)
@settings(max_examples=200, deadline=None)
def test_integer_round_half_up_identity(x, y):
    """(2x + y) div (2y) == round-half-up(x / y) for non-negative x,
    positive y — the pure-integer trick every pagerank_k_exact step rests
    on.  Checked against exact rational arithmetic (no float), including
    the exact-half boundary."""
    frac = Fraction(x, y)
    expected = int(frac) + (1 if frac - int(frac) >= Fraction(1, 2) else 0)
    assert (2 * x + y) // (2 * y) == expected


@given(
    x=st.floats(min_value=-1e7, max_value=1e7, allow_nan=False),
    lo=st.floats(min_value=-1e6, max_value=0.0, allow_nan=False),
    span=st.floats(min_value=1e-3, max_value=1e6, allow_nan=False),
    bins_pow=st.integers(min_value=1, max_value=12),
)
@settings(max_examples=100, deadline=None)
def test_histogram_bin_sql_matches_python_and_clamps(x, lo, span, bins_pow):
    """The DuckDB bin expression (histogram_bin_sql) equals a Python
    evaluation of the SAME IEEE expression tree and always lands in
    [0, bins-1] — the engine-identity + clamp contract the hash-green
    histogram queries rest on.  (Spark-side identity is covered by the
    oracle hash checks; this pins the SQL emitter itself across the whole
    parameter space, not just the declared query's constants.)"""
    import math

    import duckdb

    from flume_spark.operators.skew import histogram_bin_sql

    hi = lo + span
    bins = 2 ** bins_pow
    sql = histogram_bin_sql(repr(x), lo, hi, bins)
    got = duckdb.connect().execute(f"SELECT {sql}").fetchone()[0]
    raw = math.floor((x - lo) * float(bins) / (hi - lo))
    expected = min(max(raw, 0), bins - 1)
    assert got == expected, (x, lo, hi, bins, got, expected)
    assert 0 <= got <= bins - 1


# ---------------------------------------------------------------------------
# time-series similarity search (operators/timeseries.py)
# ---------------------------------------------------------------------------


def test_ts_words_fixed_length_and_zero_fill(spark):
    """Every key's word has exactly n_segments symbols, even when the key
    has no rows in some segments (zero-filled — absent activity is zero
    activity, and equal-length words are what make the block join
    meaningful)."""
    from flume_spark.operators import timeseries

    rows = [
        ("u1", "2024-01-02 00:00:00", 10.0),   # only segment 0
        ("u2", "2024-01-02 00:00:00", 90.0),
        ("u2", "2024-01-28 00:00:00", 90.0),   # segments 0 and 3
    ]
    df = spark.createDataFrame(rows, "k string, ts string, v double").select(
        "k", F.col("ts").cast("timestamp").alias("ts"), "v"
    )
    paa = timeseries.paa_segments(df, "k", "ts", "v", "2024-01-01", 32, 4)
    words = {r.key: r.word for r in timeseries.sax_words(
        paa, [350000, 650000]).collect()}
    assert all(len(w) == 4 for w in words.values()), words
    assert words["u1"] == "aaaa"   # 10.0 < 35 -> a; empty -> 0 -> a
    assert words["u2"] == "caac"   # 90.0 >= 65 -> c in segs 0 and 3


def test_ts_similar_pairs_exact_distance_and_blocking(spark):
    """Identical series pair at distance 0; a pair in different word
    blocks is never even a candidate (blocking, not all-pairs)."""
    from flume_spark.operators import timeseries

    rows = [
        ("a", "2024-01-02 00:00:00", 10.0),
        ("b", "2024-01-02 00:00:00", 10.0),   # identical to a
        ("z", "2024-01-02 00:00:00", 400.0),  # different block
    ]
    df = spark.createDataFrame(rows, "k string, ts string, v double").select(
        "k", F.col("ts").cast("timestamp").alias("ts"), "v"
    )
    paa = timeseries.paa_segments(df, "k", "ts", "v", "2024-01-01", 32, 4)
    words = timeseries.sax_words(paa, [350000, 650000])
    pairs = {
        (r.key_a, r.key_b): r.dist_micro2
        for r in timeseries.ts_similar_pairs(paa, words, 10**15).collect()
    }
    assert pairs == {("a", "b"): 0}  # z blocked out before any distance


def test_ts_pipeline_has_no_cartesian(spark):
    """The full search plans block joins only — no CartesianProduct even
    with the n_segments spine crossJoin (bounded broadcast form)."""
    from flume_spark.operators import timeseries
    from tests.conftest import SF_ORACLE

    ev = spark.read.parquet(SF_ORACLE + "/events.parquet")
    # events.parquet needs the nanos conf; reuse the query path instead
    from flume_spark.queries._util import T

    ev = T(spark, SF_ORACLE, "events")
    paa = timeseries.paa_segments(ev, "user_id", "ts", "value", "2024-01-01", 32, 4)
    words = timeseries.sax_words(paa, [350000, 650000])
    plan = explain_str(timeseries.ts_similar_pairs(paa, words, 10**12))
    assert "CartesianProduct" not in plan
