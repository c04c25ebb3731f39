"""Round-10 hardening tests: null group keys through the grouped Arrow
kernel (VERDICT r09 wrong#2), embeddings-coverage accounting in
curate_corpus(semantic=True) (ADVICE medium), the SemanticIngestor
persisted population state + quiesced roll (VERDICT next#2, ADVICE low),
and the table-resident fine-centroid router (VERDICT next#6)."""

from __future__ import annotations

import pandas as pd
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st


# -- kernels: null group keys --------------------------------------------------


def test_grouped_arrow_apply_keeps_null_key_group(spark):
    """Spark's groupBy().applyInPandas delivers the null-key group to fn;
    the kernel must match, not silently drop those rows (VERDICT r09
    wrong#2: plain == carry mask is always False for NaN and pandas
    groupby defaults to dropna=True)."""
    rows = [(None, 1), (None, 2), ("a", 3), ("a", 4), ("b", 5)]
    df = spark.createDataFrame(rows, "g string, v int")

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        g = pdf["g"].iloc[0]
        return pd.DataFrame(
            {"g": [None if pd.isna(g) else g], "n": [len(pdf)], "s": [int(pdf["v"].sum())]}
        )

    schema = "g string, n int, s long"
    from flume_spark.operators.kernels import grouped_arrow_apply

    key = lambda t: (t[0] is None, t[0] or "")  # noqa: E731
    expect = sorted(
        [
            (r["g"], r["n"], r["s"])
            for r in df.groupBy("g").applyInPandas(fn, schema).collect()
        ],
        key=key,
    )
    got = sorted(
        [
            (r["g"], r["n"], r["s"])
            for r in grouped_arrow_apply(df, ["g"], fn, schema).collect()
        ],
        key=key,
    )
    assert got == expect
    assert (None, 2, 3) in got


@given(
    sizes=st.lists(st.integers(min_value=1, max_value=9), min_size=1, max_size=10),
    cuts=st.lists(st.integers(min_value=1, max_value=80), max_size=8),
    null_at=st.integers(min_value=0, max_value=9),
)
@settings(max_examples=100, deadline=None)
def test_walk_groups_carry_invariant_with_null_key(sizes, cuts, null_at):
    """The round-9 carry property, extended with one group whose key is
    None: fn is still applied exactly once per group — including the
    null-key group — wherever the batch boundaries fall."""
    from flume_spark.operators.kernels import walk_groups

    null_g = null_at % len(sizes)
    rows = []
    for g, n in enumerate(sizes):
        key = None if g == null_g else f"g{g}"
        rows += [(key, g * 1000 + i) for i in range(n)]
    df = pd.DataFrame(rows, columns=["g", "v"])
    total = len(df)
    bounds = sorted({c % (total + 1) for c in cuts} | {0, total})
    batches = [
        df.iloc[a:b].reset_index(drop=True) for a, b in zip(bounds, bounds[1:])
    ]

    seen: dict[object, list[int]] = {}

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        key = pdf["g"].iloc[0]
        key = "<null>" if pd.isna(key) else key
        assert key not in seen, f"group {key} handed to fn twice"
        seen[key] = sorted(int(v) for v in pdf["v"])
        return pd.DataFrame({"g": [key], "n": [len(pdf)]})

    list(walk_groups(iter(batches), ["g"], fn))
    for g, n in enumerate(sizes):
        key = "<null>" if g == null_g else f"g{g}"
        assert seen[key] == [g * 1000 + i for i in range(n)]
    assert len(seen) == len(sizes)


# -- curation: embeddings coverage accounting ----------------------------------


def test_curate_corpus_semantic_uncovered_docs_pass_through(spark):
    """A caller-supplied embeddings table that misses some kept docs must
    NOT silently drop them (ADVICE r09 medium): uncovered docs pass
    through as non-duplicates and the exclusion is counted."""
    from flume_spark.curation import curate_corpus

    rows = [
        (1, " ".join(f"a{i}" for i in range(30))),
        (2, " ".join(f"b{i}" for i in range(30))),
        (3, " ".join(f"c{i}" for i in range(30))),
        (4, " ".join(f"d{i}" for i in range(30))),  # no embedding row
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    emb = spark.createDataFrame(
        [
            (1, [1.0, 0.0]),
            (2, [0.9999, 0.0001]),  # near-identical to doc 1 -> dropped
            (3, [0.0, 1.0]),
        ],
        "doc_id long, embedding array<double>",
    )
    curated, counts = curate_corpus(
        spark, docs, min_quality=0.0, semantic=True, embeddings=emb
    )
    assert counts["semantic_uncovered"] == 1
    assert counts["semantic"] == 3  # 1, 3 survive dedup; 4 passes through
    survivors = {r["doc_id"] for r in curated.collect()}
    assert survivors == {1, 3, 4}


# -- SemanticIngestor: persisted population state + quiesced roll --------------

_SEM_SCHEMA = "vec_id long, embedding array<double>"


def _axis_vecs(ids, dim=8):
    return [(i, [1.0 if j == i % dim else 0.0 for j in range(dim)]) for i in ids]


def _capped_ing(spark, root, cap=2):
    from flume_spark.streaming.dedup import SemanticIngestor

    return SemanticIngestor(
        spark,
        [v for _, v in _axis_vecs([0, 1])],
        index_dir=f"{root}/idx",
        marks_dir=f"{root}/marks",
        ledger_dir=f"{root}/ledger",
        threshold=0.9,
        per_cluster_cap=cap,
    )


def test_semantic_roll_trigger_reads_no_index_in_steady_state(spark, tmp_path):
    """The plan gate for VERDICT r09 wrong#1: with the population under
    the cap, maybe_roll_epoch must decide from the running count alone —
    zero index reads, so the per-batch trigger cost cannot grow with the
    number of ingested files.  And a steady _process must only ever read
    the index bucket-pruned (buckets is never None)."""
    ing = _capped_ing(spark, str(tmp_path), cap=100)
    ing.process(spark.createDataFrame(_axis_vecs(range(6)), _SEM_SCHEMA), 0)
    assert ing._pop == 6

    reads: list[object] = []
    orig = type(ing)._read_index

    def spy(self, exclude_batch_id, buckets=None):
        reads.append(buckets)
        return orig(self, exclude_batch_id, buckets=buckets)

    try:
        type(ing)._read_index = spy
        assert ing.maybe_roll_epoch() is False
        assert reads == []  # under-cap trigger never touched the index
        ing.process(spark.createDataFrame(_axis_vecs([10]), _SEM_SCHEMA), 1)
        assert all(b is not None for b in reads), "unpruned index read in _process"
    finally:
        type(ing)._read_index = orig
    assert ing._pop == 7


def test_semantic_population_recount_excludes_crash_window(spark, tmp_path):
    """A restarted ingestor recomputes the population from ACKED batches
    only: a written-but-unacknowledged partition (the crash window) is
    invisible to the roll trigger, so the replayed batch sees the same
    decision the original run saw."""
    import os

    ing = _capped_ing(spark, str(tmp_path), cap=100)
    ing.process(spark.createDataFrame(_axis_vecs(range(6)), _SEM_SCHEMA), 0)
    ing.process(spark.createDataFrame(_axis_vecs([10, 11]), _SEM_SCHEMA), 1)
    assert ing._pop == 8
    os.remove(f"{tmp_path}/ledger/batch-1.done")  # crash window for batch 1
    fresh = _capped_ing(spark, str(tmp_path), cap=100)
    assert fresh._pop == 6
    # replay through the ledger wrapper re-marks and re-counts batch 1
    fresh.process(spark.createDataFrame(_axis_vecs([10, 11]), _SEM_SCHEMA), 1)
    assert fresh._pop == 8
    marks = {r["vec_id"]: r["dup_of"] for r in fresh.dup_marks().collect()}
    assert marks[10] == 2 and marks[11] == 3  # same-axis seniors


def test_semantic_roll_raises_on_non_quiesced_stream(spark, tmp_path):
    """ADVICE r09: a maintenance-window roll while a written-but-unacked
    batch exists must raise (carrying it would duplicate its rows on
    ledger replay) — the reencode_epoch quiesce contract.  The batch
    being (re)processed stays exempt via exclude_batch."""
    import os

    import pytest as _pytest

    # ingest with a cap high enough that nothing rolls yet
    ing = _capped_ing(spark, str(tmp_path), cap=100)
    ing.process(spark.createDataFrame(_axis_vecs(range(6)), _SEM_SCHEMA), 0)
    ing.process(spark.createDataFrame(_axis_vecs([10, 11]), _SEM_SCHEMA), 1)
    os.remove(f"{tmp_path}/ledger/batch-1.done")
    fresh = _capped_ing(spark, str(tmp_path), cap=2)
    assert fresh._pop == 6  # over cap*k = 2*2 -> the trigger fires
    with _pytest.raises(RuntimeError, match="non-quiesced"):
        fresh.maybe_roll_epoch()
    # the replay path itself is exempt: rolling with batch 1 excluded is
    # exactly what the original _process(batch 1) would have done
    assert fresh.maybe_roll_epoch(exclude_batch=1) is True
    assert fresh.epoch == 1
    assert fresh._pop == 6  # the carry preserved every acked row


# -- table-resident fine centroids (VERDICT r09 missing#2 / next#6) ------------


def _synth_emb(spark, n=1500, dim=8):
    """Deterministic pseudo-random vectors: coord (i, j) from xxhash64 —
    enough spread that clusters/routing are non-trivial."""
    from pyspark.sql import functions as F

    return spark.range(n).select(
        F.col("id"),
        F.expr(
            f"transform(sequence(0, {dim - 1}), "
            "j -> (pmod(xxhash64(id, j), 1000) - 500) / 100.0)"
        ).alias("v"),
    ).localCheckpoint(eager=True)


def test_md5_init_centroids_df_matches_list_draw(spark):
    from flume_spark.operators import similarity as S

    emb = _synth_emb(spark, n=300)
    want = S.md5_init_centroids(emb, "id", "v", k=40)
    got = (
        S.md5_init_centroids_df(emb, "id", "v", k=40)
        .orderBy("cluster")
        .collect()
    )
    assert [list(r["cvec"]) for r in got] == want
    assert [r["cluster"] for r in got] == list(range(40))


@pytest.mark.parametrize("k", [4, 64, 1024])
def test_kmeans_assign_table_bit_equal_to_list_path(spark, k):
    """The distributed fine-centroid router must be BIT-EQUAL to
    kmeans_assign_hierarchical over the same centroid table: same router
    fit (sorted-member means), same 6dp-round-before-argmin, same probe
    merge — so swapping the k-proportional driver list for a table is a
    pure scale change, not a semantics change."""
    from flume_spark.operators import similarity as S

    emb = _synth_emb(spark, n=1500)
    cents = S.md5_init_centroids(emb, "id", "v", k=k)
    want = {
        r["id"]: (r["cluster"], r["dist2"])
        for r in S.kmeans_assign_hierarchical(
            emb, "id", "v", k=k, centroids=cents
        ).collect()
    }
    cdf = S.md5_init_centroids_df(emb, "id", "v", k=k)
    got = {
        r["id"]: (r["cluster"], r["dist2"])
        for r in S.kmeans_assign_table(emb, "id", "v", centroids_df=cdf).collect()
    }
    assert got == want  # exact: clusters AND raw float dist2


# -- video frame-sample real-decode seam (VERDICT next#7) -----------------------


@pytest.mark.skipif(
    not __import__("importlib.util", fromlist=["util"]).find_spec("PIL"),
    reason="PIL not installed",
)
def test_frame_sample_real_path_on_animated_gif(spark):
    """With PIL installed, a multi-frame payload (animated GIF — the
    in-container video stand-in) takes the REAL path: evenly-spaced
    source frames, frame_off = source frame index, frame_len = 1; a
    synthetic blob in the same batch still falls back to the byte-slice
    stub, so the declared query's oracle semantics are untouched."""
    import io

    from PIL import Image

    from flume_spark.operators import multimodal

    frames = [Image.new("P", (4, 4), color=c) for c in range(8)]
    buf = io.BytesIO()
    frames[0].save(
        buf, format="GIF", save_all=True, append_images=frames[1:], duration=50
    )
    gif = buf.getvalue()
    blob = b"\x00" * 40  # undecodable: stub path
    df = spark.createDataFrame(
        [(1, bytearray(gif), len(gif), "video"), (2, bytearray(blob), 40, "blob")],
        "id long, payload binary, n_bytes int, media_type string",
    )
    rows = {
        (r["id"], r["frame_idx"]): (r["frame_off"], r["frame_len"])
        for r in multimodal.frame_sample_stub(df, n_frames=4).collect()
    }
    # real path: 8 source frames sampled at 0, 2, 4, 6; one frame each
    assert {k: v for k, v in rows.items() if k[0] == 1} == {
        (1, 0): (0, 1),
        (1, 1): (2, 1),
        (1, 2): (4, 1),
        (1, 3): (6, 1),
    }
    # stub path: byte-slice coordinates, 40 // 4 = 10
    assert {k: v for k, v in rows.items() if k[0] == 2} == {
        (2, 0): (0, 10),
        (2, 1): (10, 10),
        (2, 2): (20, 10),
        (2, 3): (30, 10),
    }


def test_frame_sample_stub_path_unchanged_without_real_media(spark):
    """Synthetic payloads (no decodable multi-frame media) produce exactly
    the pre-seam byte-slice record — the declared query's oracle contract."""
    from flume_spark.operators import multimodal

    df = spark.createDataFrame(
        [(7, bytearray(b"\x01" * 23), 23, "blob")],
        "id long, payload binary, n_bytes int, media_type string",
    )
    got = sorted(
        (r["frame_idx"], r["frame_off"], r["frame_len"])
        for r in multimodal.frame_sample_stub(df, n_frames=4).collect()
    )
    assert got == [(0, 0, 5), (1, 5, 5), (2, 10, 5), (3, 15, 5)]


# -- round-10 new declared ops: classifier inference + table profile ----------


def test_classifier_score_matches_bruteforce(spark):
    """z_int must equal the brute-force python computation: tf-weighted sum
    of md5-derived weights over the top-V-by-doc-freq vocabulary, and a doc
    with no vocab token passes through with z_int = 0 (never dropped)."""
    import hashlib

    from flume_spark.operators.text import classifier_score

    rows = [
        (1, "alpha beta alpha gamma"),
        (2, "beta beta delta"),
        (3, "zzz-only-token"),  # outside a V=3 vocab -> z_int 0, label drop
        (4, "alpha delta delta delta"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r["doc_id"]: r
        for r in classifier_score(df, "doc_id", "text", vocab_size=3).collect()
    }
    assert set(out) == {1, 2, 3, 4}

    # brute-force replay
    toks = {i: t.lower().strip().split() for i, t in rows}
    from collections import Counter

    dfreq = Counter()
    for ws in toks.values():
        dfreq.update(set(ws))
    vocab = sorted(dfreq.items(), key=lambda kv: (-kv[1], kv[0]))[:3]

    def w_int(tok: str) -> int:
        h = int(hashlib.md5(f"flume-cls:{tok}".encode()).hexdigest()[:8], 16)
        return h % 2001 - 1000

    weights = {t: w_int(t) for t, _ in vocab}
    for i, ws in toks.items():
        z = sum(Counter(ws)[t] * w for t, w in weights.items())
        assert out[i]["z_int"] == z, (i, out[i]["z_int"], z)
        assert out[i]["label"] == ("keep" if z > 0 else "drop")
        assert out[i]["n_tokens"] == len(ws)


def test_classifier_score_plan_broadcasts_weights(spark, tmp_path):
    """The weights table must reach the token join as a broadcast — the
    100 TB inference shape is corpus-side streaming through a map-side
    hash join, never a shuffle keyed on token."""
    from flume_spark.operators.text import classifier_score

    df = spark.createDataFrame(
        [(i, f"tok{i % 7} tok{i % 3}") for i in range(100)],
        "doc_id long, text string",
    )
    plan = classifier_score(df, "doc_id", "text")._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_profile_table_exact_counts(spark):
    """Profile stats must be exact: NDV ignores nulls (Spark and SQL
    count-distinct semantics), null counts are per-column, min/max keep
    native types."""
    from flume_spark.operators.quality import profile_table

    rows = [
        (1, "a", 10.0),
        (2, "a", 5.0),
        (3, None, 7.5),
        (None, "b", None),
        (2, "c", 7.5),
    ]
    df = spark.createDataFrame(rows, "k long, s string, v double")
    r = profile_table(df, ndv_cols=["k", "s"], min_max_cols=["v"]).collect()[0]
    assert r["n_rows"] == 5
    assert r["ndv_k"] == 3 and r["nulls_k"] == 1
    assert r["ndv_s"] == 3 and r["nulls_s"] == 1
    assert r["min_v"] == 5.0 and r["max_v"] == 10.0


def test_profile_table_single_fused_aggregate(spark):
    """All stats ride ONE scan: the plan must contain exactly one Expand
    (the shared multi-distinct rewrite) and no join/union of per-column
    subplans."""
    from flume_spark.operators.quality import profile_table

    df = spark.range(100).selectExpr("id AS a", "id % 7 AS b", "id * 1.5 AS c")
    plan = (
        profile_table(df, ndv_cols=["a", "b"], min_max_cols=["c"])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Expand") >= 1
    assert "Join" not in plan and "Union" not in plan


@given(
    corpus=st.lists(
        st.lists(
            st.sampled_from(["alpha", "beta", "gamma", "delta", "eps", "zeta"]),
            min_size=1,
            max_size=8,
        ),
        min_size=1,
        max_size=10,
    ),
    vocab_size=st.integers(min_value=1, max_value=4),
)
@settings(max_examples=8, deadline=None)
def test_classifier_score_property_bruteforce(spark, corpus, vocab_size):
    """For any small corpus and vocab size, z_int / n_tokens / label must
    equal the brute-force replay of the contract: top-V-by-doc-freq vocab
    (tie-break token asc), md5 weights, tf-weighted integer logit."""
    import hashlib
    from collections import Counter

    from flume_spark.operators.text import classifier_score

    rows = [(i, " ".join(ws)) for i, ws in enumerate(corpus)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r["doc_id"]: r
        for r in classifier_score(
            df, "doc_id", "text", vocab_size=vocab_size
        ).collect()
    }
    assert set(out) == set(range(len(corpus)))

    dfreq = Counter()
    for ws in corpus:
        dfreq.update(set(ws))
    vocab = sorted(dfreq.items(), key=lambda kv: (-kv[1], kv[0]))[:vocab_size]
    weights = {
        t: int(hashlib.md5(f"flume-cls:{t}".encode()).hexdigest()[:8], 16) % 2001
        - 1000
        for t, _ in vocab
    }
    for i, ws in enumerate(corpus):
        z = sum(Counter(ws)[t] * w for t, w in weights.items())
        assert out[i]["z_int"] == z
        assert out[i]["n_tokens"] == len(ws)
        assert out[i]["label"] == ("keep" if z > 0 else "drop")


@given(
    data=st.lists(
        st.tuples(
            st.lists(
                st.sampled_from(["aa", "bb", "cc", "dd", "ee"]),
                min_size=1,
                max_size=6,
            ),
            st.integers(min_value=0, max_value=1),
        ),
        min_size=1,
        max_size=8,
    ),
    vocab_size=st.integers(min_value=1, max_value=5),
    iters=st.integers(min_value=1, max_value=3),
)
@settings(max_examples=6, deadline=None)
def test_classifier_train_property_bruteforce(spark, data, vocab_size, iters):
    """classifier_train must equal the brute-force batch perceptron for any
    corpus, label assignment, vocab size, and iteration count — integer
    updates, lr 1, prediction sign(z), w0 = 0."""
    from collections import Counter

    from flume_spark.operators.text import classifier_train

    rows = [(i, " ".join(ws), y) for i, (ws, y) in enumerate(data)]
    df = spark.createDataFrame(rows, "doc_id long, text string, y int")
    out = {
        r["tok"]: r["w_int"]
        for r in classifier_train(
            df, "doc_id", "text", "y", vocab_size=vocab_size, iters=iters
        ).collect()
    }

    toks = {i: ws for i, (ws, _) in enumerate(data)}
    ys = {i: y for i, (_, y) in enumerate(data)}
    dfreq = Counter()
    for ws in toks.values():
        dfreq.update(set(ws))
    vocab = [
        t for t, _ in sorted(dfreq.items(), key=lambda kv: (-kv[1], kv[0]))[:vocab_size]
    ]
    w = dict.fromkeys(vocab, 0)
    for _ in range(iters):
        delta = Counter()
        for i, ws in toks.items():
            c = Counter(ws)
            z = sum(c[t] * w[t] for t in vocab)
            err = ys[i] - (1 if z > 0 else 0)
            for t in vocab:
                if c[t]:
                    delta[t] += c[t] * err
        for t in vocab:
            w[t] += delta[t]
    assert out == w


def test_classifier_train_then_score_separable_corpus(spark):
    """Train-infer interop: perceptron weights fed back through
    classifier_score(weights=...) must reach 100% training accuracy on a
    linearly separable corpus (perceptron convergence guarantee), wiring
    the TRAINED model through the inference op end to end.

    (The driver's synthetic documents table is deliberately NOT used
    here: its tokens are drawn from one shared vocabulary independent of
    `lang`, so the label is unlearnable by any linear model there — the
    declared text_classifier_train query checks the ARITHMETIC on that
    table; this test checks LEARNING on data where learning is
    possible.)"""
    from pyspark.sql import functions as F

    from flume_spark.operators.text import classifier_score, classifier_train

    rows = []
    for i in range(30):
        if i % 2 == 0:
            rows.append((i, f"good clean prose sample{i % 5} text", 1))
        else:
            rows.append((i, f"spam junk noise sample{i % 5} text", 0))
    docs = spark.createDataFrame(rows, "doc_id long, text string, y int")
    weights = classifier_train(docs, "doc_id", "text", "y", vocab_size=16, iters=5)
    scored = classifier_score(docs, "doc_id", "text", weights=weights)
    agg = (
        scored.join(docs.select("doc_id", "y"), "doc_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(
                ((F.col("label") == "keep").cast("int") == F.col("y")).cast("int")
            ).alias("correct"),
        )
        .collect()[0]
    )
    assert agg["correct"] == agg["n"] == 30, (agg["correct"], agg["n"])


def test_classifier_eval_confusion_on_separable_corpus(spark):
    """classifier_eval must report a perfect confusion matrix where the
    perceptron converges (separable corpus) — tp + tn = n, fp = fn = 0 —
    and the counts must be exact partitions of the corpus."""
    from flume_spark.operators.text import classifier_eval

    rows = []
    for i in range(30):
        if i % 2 == 0:
            rows.append((i, f"good clean prose sample{i % 5} text", 1))
        else:
            rows.append((i, f"spam junk noise sample{i % 5} text", 0))
    docs = spark.createDataFrame(rows, "doc_id long, text string, y int")
    r = classifier_eval(docs, "doc_id", "text", "y", vocab_size=16, iters=5).collect()[0]
    assert r["n_docs"] == 30
    assert r["tp"] == 15 and r["tn"] == 15 and r["fp"] == 0 and r["fn"] == 0


def test_curate_corpus_model_filter_stage(spark):
    """curate_corpus(classifier_weights=...) applies the trained linear
    model right after the heuristic gate: docs the model scores z <= 0
    are dropped and counted; with no weights the pipeline is unchanged."""
    from flume_spark.curation import curate_corpus
    from flume_spark.operators.text import classifier_train

    rows = []
    for i in range(20):
        if i % 2 == 0:
            rows.append((i, "the good clean prose " + " ".join(f"u{i}w{j}" for j in range(20)), 1))
        else:
            rows.append((i, "the spam junk noise " + " ".join(f"u{i}w{j}" for j in range(20)), 0))
    docs = spark.createDataFrame(rows, "doc_id long, text string, y int")
    weights = classifier_train(docs, "doc_id", "text", "y", vocab_size=8, iters=5)

    curated, counts = curate_corpus(
        spark,
        docs.drop("y"),
        min_quality=0.0,
        classifier_weights=weights,
    )
    assert counts["model_filter"] == 10
    survivors = {r["doc_id"] for r in curated.select("doc_id").collect()}
    assert survivors == {i for i in range(20) if i % 2 == 0}

    _, counts_off = curate_corpus(spark, docs.drop("y"), min_quality=0.0)
    assert "model_filter" not in counts_off


@given(
    data=st.lists(
        st.tuples(
            st.one_of(st.none(), st.integers(min_value=-5, max_value=5)),
            st.one_of(st.none(), st.sampled_from(["a", "b", "c"])),
            st.one_of(st.none(), st.floats(min_value=-10, max_value=10,
                                           allow_nan=False)),
        ),
        min_size=1,
        max_size=20,
    )
)
@settings(max_examples=8, deadline=None)
def test_profile_table_property_reference(spark, data):
    """profile_table must agree with a direct python computation for any
    null mix: n_rows, per-column null counts, NDV over non-null values,
    min/max over non-null values (None when the column is all-null)."""
    from flume_spark.operators.quality import profile_table

    df = spark.createDataFrame(data, "k long, s string, v double")
    r = profile_table(df, ndv_cols=["k", "s"], min_max_cols=["v"]).collect()[0]
    ks = [t[0] for t in data]
    ss = [t[1] for t in data]
    vs = [t[2] for t in data if t[2] is not None]
    assert r["n_rows"] == len(data)
    assert r["ndv_k"] == len({x for x in ks if x is not None})
    assert r["nulls_k"] == sum(x is None for x in ks)
    assert r["ndv_s"] == len({x for x in ss if x is not None})
    assert r["nulls_s"] == sum(x is None for x in ss)
    assert r["min_v"] == (min(vs) if vs else None)
    assert r["max_v"] == (max(vs) if vs else None)


# -- streaming online perceptron ------------------------------------------------


def _hash_bucket(tok: str, n: int = 64, seed: str = "flume-hash") -> int:
    import hashlib

    return int(hashlib.md5(f"{seed}:{tok}".encode()).hexdigest()[:8], 16) % n


def _online_reference(batches, n=64):
    """Brute-force online perceptron over hashed features, one update per
    batch in order."""
    from collections import Counter

    w = [0] * n
    for batch in batches:
        delta = Counter()
        for _, text, y in batch:
            c = Counter(_hash_bucket(t) for t in text.lower().strip().split())
            z = sum(tf * w[b] for b, tf in c.items())
            err = y - (1 if z > 0 else 0)
            for b, tf in c.items():
                delta[b] += tf * err
        for b, d in delta.items():
            w[b] += d
    return w


def test_perceptron_ingestor_matches_online_reference(spark, tmp_path):
    """Three micro-batches through the real ingestor must reproduce the
    brute-force online schedule exactly (order-dependent by design), and a
    re-delivered batch id must be a no-op on the weights."""
    from flume_spark.streaming.classifier import PerceptronIngestor

    batches = [
        [(1, "good clean text", 1), (2, "spam junk text", 0)],
        [(3, "good clean prose", 1), (4, "junk noise spam", 0)],
        [(5, "clean good words", 1)],
    ]
    ing = PerceptronIngestor(
        spark, state_dir=str(tmp_path / "st"), ledger_dir=str(tmp_path / "lg")
    )
    for b, rows in enumerate(batches):
        ing.process(spark.createDataFrame(rows, "doc_id long, text string, y int"), b)
    assert ing.weights == _online_reference(batches)

    before = list(ing.weights)
    ing.process(
        spark.createDataFrame(batches[1], "doc_id long, text string, y int"), 1
    )
    assert ing.weights == before  # ledger skipped the re-delivery


def test_perceptron_ingestor_crash_window_replay(spark, tmp_path):
    """Weights snapshot written but marker lost (the crash window): a
    fresh ingestor must recover the PRIOR acked state, and replaying the
    batch must land byte-identical weights."""
    import json
    import os

    from flume_spark.streaming.classifier import PerceptronIngestor

    batches = [
        [(1, "good clean text", 1), (2, "spam junk text", 0)],
        [(3, "good clean prose", 1), (4, "junk noise spam", 0)],
    ]
    st, lg = str(tmp_path / "st"), str(tmp_path / "lg")
    ing = PerceptronIngestor(spark, state_dir=st, ledger_dir=lg)
    for b, rows in enumerate(batches):
        ing.process(spark.createDataFrame(rows, "doc_id long, text string, y int"), b)
    final = list(ing.weights)
    os.remove(f"{lg}/batch-1.done")  # crash between snapshot and marker

    fresh = PerceptronIngestor(spark, state_dir=st, ledger_dir=lg)
    assert fresh.weights == _online_reference(batches[:1])  # prior acked state
    fresh.process(
        spark.createDataFrame(batches[1], "doc_id long, text string, y int"), 1
    )
    assert fresh.weights == final
    with open(f"{st}/weights-1.json") as fh:
        assert [int(x) for x in json.load(fh)] == final
