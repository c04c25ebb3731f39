"""Round-4 additions: the persisted band-key-bucketed LSH index (the last
unbuilt piece of the 100 TB ingest story named by BASELINE.md), its plan
gate (index-side exchange-free probe), and the ingestor's bucketed mode.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from flume_spark.operators import dedup
from flume_spark.plans import explain_str, n_shuffles


def _corpus(spark, lo: int, hi: int):
    rows = [(i, " ".join(f"w{(i * 7 + j) % 97}" for j in range(30))) for i in range(lo, hi)]
    return spark.createDataFrame(rows, "doc_id long, text string")


@pytest.fixture()
def no_broadcast(spark):
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


# ---------------------------------------------------------------------------
# persisted bucketed band index
# ---------------------------------------------------------------------------


def test_band_index_roundtrip_and_append(spark, tmp_path):
    hist = _corpus(spark, 0, 50)
    more = _corpus(spark, 50, 80)
    hb = dedup.banded_signatures(hist, "doc_id", "text", 2, 16, 4)
    mb = dedup.banded_signatures(more, "doc_id", "text", 2, 16, 4)
    try:
        dedup.write_band_index(
            hb, "r4_idx", str(tmp_path / "idx"), buckets=4, ingest_batch=0
        )
        dedup.write_band_index(
            mb, "r4_idx", str(tmp_path / "idx"), buckets=4, ingest_batch=1,
            mode="append",
        )
        idx = dedup.read_band_index(spark, "r4_idx")
        # every (id, band) row survives, as single-column band keys
        assert idx.count() == hb.count() + mb.count()
        assert set(idx.columns) == {"id", "band_key"}
        # exclusion drops exactly the excluded batch's rows (partition-pruned)
        excl = dedup.read_band_index(spark, "r4_idx", exclude_batch=1)
        assert excl.count() == hb.count()
    finally:
        spark.sql("DROP TABLE IF EXISTS r4_idx")


def test_band_index_probe_is_index_side_exchange_free(
    spark, tmp_path, no_broadcast
):
    """THE plan gate for the 100 TB ingest shape (BASELINE.md: 'bucketing
    by band_hash removes the remaining index-side shuffle from the probe
    join'): with the history side read from storage either way, the
    bucketed table loses exactly the index-side Exchange — only the small
    batch side shuffles."""
    hist = _corpus(spark, 0, 200)
    new = _corpus(spark, 200, 220)
    hb = dedup.banded_signatures(hist, "doc_id", "text", 2, 16, 4)
    nb = dedup.banded_signatures(new, "doc_id", "text", 2, 16, 4)
    try:
        dedup.write_band_index(hb, "r4_idx_gate", str(tmp_path / "idx"), buckets=4)
        # the round-3 shape: the same index persisted as PLAIN parquet
        dedup.with_band_key(hb).select("id", "band_key").write.parquet(
            str(tmp_path / "idx_plain")
        )
        probe = dedup.with_band_key(nb).select("id", "band_key")

        def hist_join(history):
            return probe.alias("a").join(
                history.alias("b"),
                (F.col("a.band_key") == F.col("b.band_key"))
                & (F.col("a.id") != F.col("b.id")),
            )

        bucketed = hist_join(dedup.read_band_index(spark, "r4_idx_gate"))
        plain = hist_join(spark.read.parquet(str(tmp_path / "idx_plain")))
        plan = explain_str(bucketed)
        assert "SelectedBucketsCount" in plan  # bucketed scan engaged
        # identical plans except the index side's Exchange is GONE
        assert n_shuffles(bucketed) == n_shuffles(plain) - 1
        # the full incremental path engages the bucketed scan too, and the
        # candidate results agree with the in-plan history baseline
        full = dedup.incremental_lsh_candidates(
            None, None, "doc_id", "text", 2, 16, 4,
            history_banded=dedup.read_band_index(spark, "r4_idx_gate"),
            new_banded=nb,
        )
        assert "SelectedBucketsCount" in explain_str(full)
        baseline = dedup.incremental_lsh_candidates(
            None, None, "doc_id", "text", 2, 16, 4,
            history_banded=hb, new_banded=nb,
        )
        assert sorted(map(tuple, full.collect())) == sorted(
            map(tuple, baseline.collect())
        )
    finally:
        spark.sql("DROP TABLE IF EXISTS r4_idx_gate")


def test_band_key_is_injective_on_band_pairs(spark):
    """(band_idx, band_hash) equality must be exactly band_key equality —
    the md5 is fixed-width, so ':' makes the concat injective."""
    df = spark.createDataFrame(
        [(1, 0, "a" * 32), (2, 0, "a" * 32), (3, 1, "a" * 32)],
        "id long, band_idx int, band_hash string",
    )
    keyed = dedup.with_band_key(df).collect()
    keys = {r.id: r.band_key for r in keyed}
    assert keys[1] == keys[2]
    assert keys[1] != keys[3]  # same hash, different band -> different key


# ---------------------------------------------------------------------------
# bucketed-cell range search (the radius-query scale path)
# ---------------------------------------------------------------------------


def test_range_cells_is_cell_equijoin(spark):
    """ann_range_cells must be a hash equi-join on the IVF cell key — never
    the |Q|·|N| nested loop of the broadcast-Q baseline."""
    from tests.conftest import SF_ORACLE
    from flume_spark.queries import all_queries

    plan = explain_str(all_queries()["ann_range_cells"](spark, SF_ORACLE))
    assert "BroadcastHashJoin" in plan  # hash join, keyed
    assert "NestedLoop" not in plan and "CartesianProduct" not in plan
    assert "__cell" in plan  # the cell key reached the join


def test_range_cells_subset_of_exact_range(spark):
    """Every cell-path hit is a true within-radius pair (precision 1.0);
    recall loss is only cross-cell neighbors — the documented trade."""
    from tests.conftest import SF_ORACLE
    from flume_spark.operators import similarity

    emb = spark.read.parquet(SF_ORACLE + "/embeddings.parquet")
    pred = F.col("vec_id") < 25
    cells = {
        (r.query_id, r.neighbor_id)
        for r in similarity.range_search_cells(emb, pred, 0.3).collect()
    }
    exact = {
        (r.query_id, r.neighbor_id)
        for r in similarity.range_search(emb, pred, 0.3).collect()
    }
    assert cells and cells <= exact


def test_lsh_ingestor_bucketed_table_matches_plain(spark, tmp_path):
    """The bucketed-index ingestor mode finds EXACTLY the pairs the plain
    parquet mode finds, across multiple ingests."""
    from flume_spark.streaming.dedup import LshIngestor

    batches = [_corpus(spark, 0, 30), _corpus(spark, 30, 50), _corpus(spark, 50, 60)]
    plain = LshIngestor(
        spark,
        str(tmp_path / "idx_plain"),
        str(tmp_path / "pairs_plain"),
        str(tmp_path / "ledger_plain"),
        shingle_n=2, num_hashes=16, bands=4,
    )
    try:
        bucketed = LshIngestor(
            spark,
            str(tmp_path / "idx_bk"),
            str(tmp_path / "pairs_bk"),
            str(tmp_path / "ledger_bk"),
            shingle_n=2, num_hashes=16, bands=4,
            index_table="r4_ing_idx", index_buckets=4,
        )
        for i, b in enumerate(batches):
            plain.process(b, i)
            bucketed.process(b, i)
        p = {tuple(r) for r in plain.candidate_pairs().collect()}
        q = {tuple(r) for r in bucketed.candidate_pairs().collect()}
        assert p == q and p  # identical, non-empty
        # replay of the last batch converges (no new/duplicated pairs)
        bucketed._process(batches[-1], 2)
        q2 = {tuple(r) for r in bucketed.candidate_pairs().collect()}
        assert q2 == q
        # mid-life compaction: index collapses, future ingests still match
        n_before = len(spark.table("r4_ing_idx").inputFiles())
        n_after = bucketed.compact_index()
        assert n_after < n_before
        extra = _corpus(spark, 60, 70)
        plain.process(extra, 3)
        bucketed.process(extra, 3)
        p3 = {tuple(r) for r in plain.candidate_pairs().collect()}
        q3 = {tuple(r) for r in bucketed.candidate_pairs().collect()}
        assert p3 == q3 and len(p3) > len(p)
    finally:
        spark.sql("DROP TABLE IF EXISTS r4_ing_idx")
        spark.sql("DROP TABLE IF EXISTS r4_ing_idx__compacting")


# ---------------------------------------------------------------------------
# multi-probe IVF + containment dedup
# ---------------------------------------------------------------------------


def test_multiprobe_recall_at_least_single_probe(spark):
    """probes=2 must find every pair probes=1 finds per query (superset
    candidates), and probes=1 must equal plain ivf_topk's cell semantics
    for queries whose nearest centroid IS their own cell."""
    from tests.conftest import SF_ORACLE
    from flume_spark.operators import similarity

    emb = spark.read.parquet(SF_ORACLE + "/embeddings.parquet")
    pred = F.col("vec_id") < 15

    def pairs(probes):
        # k beyond any cell size -> no top-k truncation, so the comparison
        # is over the raw candidate sets (truncated top-k sets are NOT
        # monotone in probes: better candidates can displace old ones)
        return {
            (r.query_id, r.neighbor_id)
            for r in similarity.ivf_multiprobe_topk(
                emb, pred, k=100_000, probes=probes
            ).collect()
        }

    p1, p2 = pairs(1), pairs(2)
    assert p1 <= p2        # widening probes only adds candidates
    assert len(p2) > len(p1)  # and it actually does on this corpus


def test_multiprobe_is_cell_equijoin(spark):
    from tests.conftest import SF_ORACLE
    from flume_spark.queries import all_queries

    plan = explain_str(all_queries()["ann_topk_multiprobe"](spark, SF_ORACLE))
    assert "CartesianProduct" not in plan
    # the candidate join keys on the cell; only the tiny centroid frame is
    # allowed a nested-loop (broadcast cross join against <=cells rows)
    assert "__cell" in plan
    assert "BroadcastHashJoin" in plan


def test_containment_detects_doc_in_doc(spark):
    """A short doc fully embedded in a long one: containment_a = 1.0 even
    though Jaccard is far below any useful threshold."""
    from flume_spark.operators import dedup

    quote = " ".join(f"q{i}" for i in range(12))
    article = quote + " " + " ".join(f"w{i}" for i in range(300))
    df = spark.createDataFrame(
        [(1, quote), (2, article), (3, "totally unrelated text corpus")],
        "doc_id long, text string",
    )
    rows = dedup.containment_pairs(df, "doc_id", "text", n=3, threshold=0.9).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r.doc_a, r.doc_b) == (1, 2)
    assert r.containment_a == 1.0     # all of the quote's shingles are in the article
    assert r.containment_b < 0.1      # the article is NOT contained in the quote
    # symmetric Jaccard would have rejected this pair at any real threshold
    jac = dedup.ngram_jaccard_pairs(df, "doc_id", "text", n=3, threshold=0.5).collect()
    assert jac == []


# ---------------------------------------------------------------------------
# scalable corpus-shuffle rank (no single-partition window)
# ---------------------------------------------------------------------------


def test_corpus_shuffle_rank_matches_global_window(spark):
    """The two-pass bucket-offset rank must equal the single-partition
    global-window rank row for row — same values, scalable plan."""
    from pyspark.sql.window import Window

    from flume_spark.operators import text

    df = spark.createDataFrame([(i,) for i in range(500)], "doc_id long")
    out = text.corpus_shuffle(df, "doc_id", buckets=8)
    w = Window.orderBy("shuffle_key", "doc_id")
    check = out.withColumn("global_rank", F.row_number().over(w))
    mismatches = check.filter(F.col("shuffle_rank") != F.col("global_rank")).count()
    assert mismatches == 0
    # and the plan's windows are all bucket-partitioned (the global-window
    # probe above is test-only): re-derive and inspect
    plan = explain_str(out)
    assert "Window" in plan
    assert plan.count("Exchange SinglePartition") == 0


# ---------------------------------------------------------------------------
# z-order clustering (operators/zorder.py)
# ---------------------------------------------------------------------------


def test_z_value_interleave_exact():
    """Morton key ground truth: z(0b11, 0b00)=0b0101, z(0,y) puts y's bits
    at odd positions, and the key preserves box locality ordering."""
    from flume_spark.operators import zorder

    import pyspark.sql.functions as Fx

    # evaluate through a tiny local frame (z_value is a Column expr)
    from flume_spark.session import get_spark

    spark = get_spark(app_name="flume_spark_tests", shuffle_partitions=8)
    df = spark.createDataFrame(
        [(3, 0), (0, 3), (5, 2), (65535, 65535)], "x long, y long"
    )
    got = {
        (r.x, r.y): r.z
        for r in df.select(
            "x", "y", zorder.z_value(Fx.col("x"), Fx.col("y")).alias("z")
        ).collect()
    }
    assert got[(3, 0)] == 0b0101
    assert got[(0, 3)] == 0b1010
    assert got[(5, 2)] == 0b011001  # x=101, y=010 -> y2x2 y1x1 y0x0 = 01 10 01
    assert got[(65535, 65535)] == (1 << 32) - 1


def test_zorder_layout_prunes_both_dims(spark, tmp_path):
    """The point of z-ordering, measured on real parquet footers: files
    written in z-order each cover a bounded rectangle in (custkey, date)
    space, so a 2-d box predicate overlaps FEW files on BOTH dimensions —
    while a custkey-only sort leaves every file spanning all dates (a date
    filter prunes nothing)."""
    from tests.conftest import SF_ORACLE

    import pyarrow.parquet as pq

    from flume_spark.operators import zorder
    from flume_spark.queries import all_queries

    keyed = all_queries()["zorder_orders"](spark, SF_ORACLE)
    orders = spark.read.parquet(SF_ORACLE + "/orders.parquet").select(
        "o_orderkey", "o_custkey", "o_orderdate"
    )
    full = keyed.join(orders, "o_orderkey")

    zdir, ldir = str(tmp_path / "z"), str(tmp_path / "linear")
    n_z = zorder.zorder_write(full, zdir, "z_key", max_records_per_file=1000)
    (
        full.repartitionByRange(F.col("xb"))
        .sortWithinPartitions("xb")
        .write.option("maxRecordsPerFile", 1000)
        .mode("overwrite")
        .parquet(ldir)
    )

    def overlap_fraction(path):
        import os

        files = [
            os.path.join(dp, f)
            for dp, _, fs in os.walk(path)
            for f in fs
            if f.endswith(".parquet")
        ]
        hit = 0
        for p in files:
            md = pq.ParquetFile(p).metadata
            lo_x = hi_x = lo_y = hi_y = None
            for rg in range(md.num_row_groups):
                row = md.row_group(rg)
                for ci in range(row.num_columns):
                    col = row.column(ci)
                    name = col.path_in_schema
                    st = col.statistics
                    if st is None:
                        continue
                    if name == "xb":
                        lo_x = st.min if lo_x is None else min(lo_x, st.min)
                        hi_x = st.max if hi_x is None else max(hi_x, st.max)
                    if name == "yb":
                        lo_y = st.min if lo_y is None else min(lo_y, st.min)
                        hi_y = st.max if hi_y is None else max(hi_y, st.max)
            # 2-d box inside the data: custkey ~458-916 x ~1995-1996 dates
            if not (hi_x < 30 or lo_x > 60 or hi_y < 20000 or lo_y > 25000):
                hit += 1
        return hit / len(files), len(files)

    z_frac, zn = overlap_fraction(zdir)
    l_frac, ln = overlap_fraction(ldir)
    assert zn >= 8 and ln >= 8  # enough files for pruning to be meaningful
    # z-order: both dims bounded per file -> the box touches a minority;
    # custkey-sort: date unbounded per file -> custkey alone decides, and
    # within the matching custkey files NOTHING else prunes
    assert z_frac < l_frac
    assert z_frac < 0.5


# ---------------------------------------------------------------------------
# count-min frequency sketch (operators/skew.py)
# ---------------------------------------------------------------------------


def test_countmin_estimate_bounds(spark):
    """CMS guarantees: estimate >= true count (over-count only), and
    over-count <= eps*N with eps = e/width at the tested confidence —
    asserted for every key in a skewed corpus."""
    import math

    from flume_spark.operators import skew

    rows = [(f"k{i % 50}",) for i in range(2000)] + [("hot",)] * 500
    df = spark.createDataFrame(rows, "k string")
    true = {r.k: r.n for r in df.groupBy("k").agg(F.count("*").alias("n")).collect()}
    n_total = sum(true.values())
    table = skew.countmin_table(df, "k", depth=4, width=64)
    keys = df.select("k").distinct()
    est = {
        r.k: r.freq_estimate
        for r in skew.countmin_estimate(table, keys, "k", depth=4, width=64).collect()
    }
    eps = math.e / 64
    for k, t in true.items():
        assert est[k] >= t, (k, est[k], t)          # never under-counts
        assert est[k] <= t + eps * n_total, (k, est[k], t)


def test_countmin_merge_equals_whole(spark):
    """Cell-wise merge of per-slice sketches == the sketch of the union —
    the mergeability a per-day 100 TB pipeline relies on."""
    from flume_spark.operators import skew

    a = spark.createDataFrame([(f"k{i % 7}",) for i in range(300)], "k string")
    b = spark.createDataFrame([(f"k{i % 11}",) for i in range(200)], "k string")
    whole = skew.countmin_table(a.unionByName(b), "k")
    merged = skew.countmin_merge(
        skew.countmin_table(a, "k").unionByName(skew.countmin_table(b, "k"))
    )
    as_map = lambda df: {(r["row"], r.bucket): r.counter for r in df.collect()}
    assert as_map(whole) == as_map(merged)


# ---------------------------------------------------------------------------
# deterministic corpus split
# ---------------------------------------------------------------------------


def test_split_stable_under_corpus_growth(spark):
    """THE property the hash split exists for: a document's split never
    changes when the corpus grows (randomSplit re-deals; this must not)."""
    from flume_spark.operators import text

    small = spark.createDataFrame([(i,) for i in range(500)], "doc_id long")
    big = spark.createDataFrame([(i,) for i in range(1000)], "doc_id long")
    s = {
        r.doc_id: r.split
        for r in text.train_val_test_split(small, "doc_id").collect()
    }
    b = {
        r.doc_id: r.split
        for r in text.train_val_test_split(big, "doc_id").collect()
    }
    assert all(b[k] == v for k, v in s.items())
    # and the proportions land near the requested 80/10/10
    from collections import Counter

    c = Counter(b.values())
    assert 0.7 < c["train"] / 1000 < 0.9
    assert 0.05 < c["val"] / 1000 < 0.15
    assert 0.05 < c["test"] / 1000 < 0.15


# ---------------------------------------------------------------------------
# PageRank (operators/graph.py)
# ---------------------------------------------------------------------------


def test_pagerank_invariants(spark):
    """Mass conservation with a DANGLING vertex, hub dominance, and
    agreement with the exact-step core on the first iteration."""
    from flume_spark.operators import graph

    # star into 1 (hub, itself dangling), a chain, and 9 -> dangling 99
    edges = spark.createDataFrame(
        [(2, 1), (3, 1), (4, 1), (5, 1), (6, 7), (7, 8), (9, 99)],
        "src long, dst long",
    )
    ranks = {r.vertex: r["rank"] for r in graph.pagerank(edges, iters=12).collect()}
    assert abs(sum(ranks.values()) - 1.0) < 1e-9  # dangling mass not lost
    assert ranks[1] == max(ranks.values())        # the hub dominates
    assert ranks[1] > 3 * ranks[6]                # ...by a wide margin
    # exact-step core agrees with one float iteration within quantization
    one = {
        r.vertex: r.n_rank1 / 10  # N=10 vertices -> rank = n_rank1 / N
        for r in graph.pagerank_step_exact(edges).collect()
    }
    flo = {r.vertex: r["rank"] for r in graph.pagerank(edges, iters=1).collect()}
    # the float step redistributes dangling mass, the exact core doesn't
    # (it is a pure contribution step) — compare only inflow-bearing nodes
    for v in (1, 7, 8):
        assert abs(one[v] - flo[v]) < 0.05, (v, one[v], flo[v])


def test_pagerank_converges(spark):
    """Successive iterations move less and less (power-iteration
    contraction) — the property that makes a bounded iters choice sane."""
    from flume_spark.operators import graph

    # irregular in-degrees (a regular graph is already stationary at
    # uniform and would converge in zero steps)
    edges = spark.createDataFrame(
        [(i, 0) for i in range(1, 12)] +
        [(i, (i * i + 1) % 15) for i in range(15)] +
        [(0, 1), (0, 2)],
        "src long, dst long",
    )
    def ranks(iters):
        return {
            r.vertex: r["rank"]
            for r in graph.pagerank(edges, iters=iters).collect()
        }
    r2, r4, r8 = ranks(2), ranks(4), ranks(8)
    d24 = sum(abs(r2[v] - r4[v]) for v in r2)
    d48 = sum(abs(r4[v] - r8[v]) for v in r4)
    assert d48 < d24  # contraction


def test_compact_band_index(spark, tmp_path, no_broadcast):
    """Compaction collapses the per-batch partitions into one, preserves
    every row and the exchange-free probe, shrinks the file count, and
    cleans the old location."""
    import os

    batches = [_corpus(spark, 0, 40), _corpus(spark, 40, 70), _corpus(spark, 70, 90)]
    path = str(tmp_path / "cidx")
    try:
        for i, b in enumerate(batches):
            dedup.write_band_index(
                dedup.banded_signatures(b, "doc_id", "text", 2, 16, 4),
                "r4_cidx", path, buckets=4, ingest_batch=i,
                mode="overwrite" if i == 0 else "append",
            )
        before_rows = dedup.read_band_index(spark, "r4_cidx").count()
        before_files = len(spark.table("r4_cidx").inputFiles())
        probe = dedup.with_band_key(
            dedup.banded_signatures(_corpus(spark, 90, 95), "doc_id", "text", 2, 16, 4)
        ).select("id", "band_key")
        pairs_before = sorted(
            map(tuple, dedup.incremental_lsh_candidates(
                None, None, "doc_id", "text", 2, 16, 4,
                history_banded=dedup.read_band_index(spark, "r4_cidx"),
                new_banded=probe,
            ).collect())
        )

        n_files = dedup.compact_band_index(spark, "r4_cidx", path, buckets=4)
        assert dedup.read_band_index(spark, "r4_cidx").count() == before_rows
        assert n_files < before_files          # 3 batches x 4 buckets -> 4
        assert not os.path.exists(path)        # old location cleaned
        after = dedup.incremental_lsh_candidates(
            None, None, "doc_id", "text", 2, 16, 4,
            history_banded=dedup.read_band_index(spark, "r4_cidx"),
            new_banded=probe,
        )
        assert "SelectedBucketsCount" in explain_str(after)  # still bucketed
        assert sorted(map(tuple, after.collect())) == pairs_before
    finally:
        spark.sql("DROP TABLE IF EXISTS r4_cidx")
        spark.sql("DROP TABLE IF EXISTS r4_cidx__compacting")


# ---------------------------------------------------------------------------
# declarative data-quality checks (operators/quality.py)
# ---------------------------------------------------------------------------


def test_check_rules_counts_violations(spark):
    from flume_spark.operators.quality import Rule, check_rules

    df = spark.createDataFrame(
        [(1, "A", 5.0), (2, "B", -1.0), (2, "C", 50.0), (None, "A", 5.0)],
        "id long, status string, v double",
    )
    out = {
        r.rule: r.n_violations
        for r in check_rules(df, [
            Rule("id_not_null", "not_null", "id"),
            Rule("id_unique", "unique", "id"),
            Rule("status_ok", "accepted_values", "status", values=("A", "B")),
            Rule("v_range", "in_range", "v", lo=0.0, hi=10.0),
            Rule("custom", "expr", expr="v = 50.0"),
        ]).collect()
    }
    assert out == {
        "id_not_null": 1,   # the NULL id
        "id_unique": 1,     # id=2 twice (NULLs don't count toward unique)
        "status_ok": 1,     # the 'C'
        "v_range": 2,       # -1.0 and 50.0
        "custom": 1,        # v = 50
    }


def test_check_rules_empty_input_reports_zero_not_null(spark):
    """An empty input (e.g. an empty streaming micro-batch) is vacuously
    clean: every rule must report n_violations = 0, never NULL — a NULL
    would make downstream `n_violations == 0` gates misclassify the batch
    (round-4 ADVICE)."""
    from flume_spark.operators.quality import Rule, check_rules

    empty = spark.createDataFrame([], "id long, status string, v double")
    rows = check_rules(empty, [
        Rule("id_not_null", "not_null", "id"),
        Rule("id_unique", "unique", "id"),
        Rule("status_ok", "accepted_values", "status", values=("A",)),
        Rule("v_range", "in_range", "v", lo=0.0, hi=10.0),
        Rule("custom", "expr", expr="v = 50.0"),
    ]).collect()
    assert len(rows) == 5
    for r in rows:
        assert r.n_violations == 0, f"{r.rule}: {r.n_violations!r} (want 0)"


def test_check_rules_single_scan_for_row_rules(spark):
    """All row-level rules must fuse into ONE aggregate over one scan —
    the whole point vs running N separate validation queries."""
    from flume_spark.operators.quality import Rule, check_rules
    from tests.conftest import SF_ORACLE

    orders = spark.read.parquet(SF_ORACLE + "/orders.parquet")
    out = check_rules(orders, [
        Rule("a", "not_null", "o_orderkey"),
        Rule("b", "in_range", "o_totalprice", lo=0.0, hi=1e9),
        Rule("c", "accepted_values", "o_orderstatus", values=("O", "F", "P")),
    ])
    from flume_spark.plans import n_nodes

    plan = explain_str(out)
    assert n_nodes(plan, "Scan parquet") == 1


def test_streaming_checks_reports_per_batch(spark, tmp_path):
    """The streaming data contract: per-batch violation reports, keyed by
    batch, replay-convergent."""
    from flume_spark.operators.quality import Rule, streaming_checks

    rules = [
        Rule("id_not_null", "not_null", "id"),
        Rule("v_range", "in_range", "v", lo=0.0, hi=10.0),
    ]
    handler = streaming_checks(
        spark, str(tmp_path / "reports"), str(tmp_path / "rl"), rules
    )
    clean = spark.createDataFrame([(1, 5.0), (2, 6.0)], "id long, v double")
    dirty = spark.createDataFrame([(None, 50.0), (3, 7.0)], "id long, v double")
    handler(clean, 0)
    handler(dirty, 1)
    handler(dirty, 1)  # ledger: replay is a no-op
    got = {
        (r.ingest_batch, r.rule): r.n_violations
        for r in spark.read.parquet(str(tmp_path / "reports")).collect()
    }
    assert got == {
        (0, "id_not_null"): 0, (0, "v_range"): 0,
        (1, "id_not_null"): 1, (1, "v_range"): 1,
    }
