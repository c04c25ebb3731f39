"""Round-14 operators and hardening.

Verdict queue: the retrieval centroid router's list->table auto-switch
(bit-equality pinned both routes), the oracle-kc loud guard (ADVICE r13),
and the fold-lock errno discipline (ADVICE r13: only contention maps to
FoldLockHeld; unsupported-flock filesystems degrade lockless as the
docstring promises).
"""

from __future__ import annotations

import pytest

from flume_spark.queries import llm_ops
from tests.conftest import SF_SMOKE


# -- retrieval centroid router: list vs table route ---------------------------


def test_retrieval_topk_list_and_table_routes_bit_equal(spark):
    """In the all-cells-probed regime (kc = 4 -> n_coarse = 2 <=
    n_probe = 2) the two routes must return IDENTICAL rows: same
    distance/tie law, centroid table merely kept distributed.  (Past
    that regime the table route is the documented IVF candidate
    approximation — membership, never arithmetic — so exact frame
    equality is only asserted here, where it genuinely holds.)"""
    lst = llm_ops.multimodal_retrieval_topk(
        spark, SF_SMOKE, table_threshold=10**9
    )
    tab = llm_ops.multimodal_retrieval_topk(spark, SF_SMOKE, table_threshold=1)
    key = lambda r: (r["caption_id"], r["rank"])  # noqa: E731
    lrows = sorted(lst.collect(), key=key)
    trows = sorted(tab.collect(), key=key)
    assert lrows == trows
    assert len(lrows) > 0


def test_retrieval_topk_table_route_has_no_driver_centroid_list(spark):
    """Past the threshold the plan must carry the table router's cogrouped
    Arrow kernel (points meet fine centroids in an exchange, never a
    driver-collected closure list).  The list route's plan has exactly the
    flat per-side assignment kernels and NO cogroup."""
    from flume_spark.plans import explain_str

    tab = llm_ops.multimodal_retrieval_topk(spark, SF_SMOKE, table_threshold=1)
    plan = explain_str(tab)
    assert "FlatMapCoGroupsInPandas" in plan, plan
    lst = llm_ops.multimodal_retrieval_topk(
        spark, SF_SMOKE, table_threshold=10**9
    )
    assert "FlatMapCoGroupsInPandas" not in explain_str(lst)


def test_retrieval_oracle_kc_constant_matches_driver_scale():
    """ADVICE r13: the oracle SQL derives its centroid LIMIT from
    RETRIEVAL_ORACLE_KC; this pins that the Spark-side kc formula at the
    driver's oracle scale still lands on that constant, so an oracle-scale
    change breaks HERE (loudly) instead of as a hash-red driver row."""
    import pyarrow.parquet as pq

    from tests.conftest import SF_ORACLE

    n = pq.read_metadata(SF_ORACLE + "/documents.parquet").num_rows
    assert max(4, n // 125) == llm_ops.RETRIEVAL_ORACLE_KC
    assert (
        f"LIMIT {llm_ops.RETRIEVAL_ORACLE_KC}" in llm_ops.MULTIMODAL_RETRIEVAL_SQL
    )
    assert "__ORACLE_KC__" not in llm_ops.MULTIMODAL_RETRIEVAL_SQL


# -- fold-lock errno discipline (ADVICE r13) ----------------------------------


def _flock_raiser(err):
    import fcntl as real_fcntl

    def fake(fd, op):
        if op & real_fcntl.LOCK_UN:
            return None
        raise OSError(err, "fake")

    return fake


def test_fold_lock_contention_errnos_raise_held(tmp_path, monkeypatch):
    import errno
    import fcntl

    from flume_spark.streaming import state

    for err in (errno.EWOULDBLOCK, errno.EAGAIN, errno.EACCES):
        monkeypatch.setattr(fcntl, "flock", _flock_raiser(err))
        with pytest.raises(state.FoldLockHeld):
            state._acquire_fold_lock(str(tmp_path / "s"))


def test_fold_lock_unsupported_filesystem_degrades_lockless(
    tmp_path, monkeypatch
):
    """ENOLCK/EOPNOTSUPP/ENOSYS (flock-less network mounts) must NOT read
    as contention: the module docstring promises best-effort degradation,
    and mapping them to FoldLockHeld would make every ingestor __init__
    (recover_fold) and every fold raise permanently."""
    import errno
    import fcntl
    import os

    from flume_spark.streaming import state

    for err in (errno.ENOLCK, errno.EOPNOTSUPP, errno.ENOSYS):
        monkeypatch.setattr(fcntl, "flock", _flock_raiser(err))
        fd = state._acquire_fold_lock(str(tmp_path / "s"))
        assert fd == -1
        state._release_if_held(fd)  # no-op, must not blow up
        # the full healing path works lockless end-to-end
        d = str(tmp_path / f"state_{err}")
        os.makedirs(d)
        state.recover_fold(d)


def test_fold_lock_real_io_errors_propagate(tmp_path, monkeypatch):
    import errno
    import fcntl

    from flume_spark.streaming import state

    monkeypatch.setattr(fcntl, "flock", _flock_raiser(errno.EIO))
    with pytest.raises(OSError) as ei:
        state._acquire_fold_lock(str(tmp_path / "s"))
    assert ei.value.errno == errno.EIO


# -- AlignIngestor ref-collect bound (ADVICE r13) -----------------------------


def _align_ing(spark, tmp_path, **kw):
    from flume_spark.streaming.dedup import AlignIngestor

    return AlignIngestor(
        spark,
        index_dir=str(tmp_path / "index"),
        marks_dir=str(tmp_path / "marks"),
        ledger_dir=str(tmp_path / "ledger"),
        id_col="id",
        **kw,
    )


def _align_frame(spark, rows):
    from flume_spark.operators import multimodal

    df = spark.createDataFrame(rows, "id long, text string, media_ref long")
    pay = multimodal.to_binary_payload(df, "id", "text")
    return pay.select("id", "payload").join(
        df.select(
            "id", multimodal.F.col("text").alias("caption"), "media_ref"
        ),
        "id",
    )


def test_align_ingestor_ref_overflow_arm_bit_equal(spark, tmp_path, monkeypatch):
    """A micro-batch with more distinct refs than _PUSH_REFS_CAP must (a)
    never collect the full ref list driver-side — the limit(cap+1) probe
    detects overflow — and (b) produce byte-identical marks through the
    kbucket-only pruning arm (the isin predicate is an optimization, the
    kbucket directory pruning is the correctness boundary)."""
    from flume_spark.streaming.dedup import AlignIngestor

    rows0 = [(i, f"media doc {i}", i) for i in range(6)]
    # batch 1: 5 distinct refs (> the forced cap of 3), mix of hits/misses
    rows1 = [(10 + j, f"caption number {j}", j) for j in range(5)]
    a = _align_ing(spark, tmp_path / "a")
    a.process(_align_frame(spark, rows0), 0)
    a.process(_align_frame(spark, rows1), 1)
    monkeypatch.setattr(AlignIngestor, "_PUSH_REFS_CAP", 3)
    b = _align_ing(spark, tmp_path / "b")
    b.process(_align_frame(spark, rows0), 0)
    b.process(_align_frame(spark, rows1), 1)
    ra = sorted(map(tuple, a.align_marks().collect()))
    rb = sorted(map(tuple, b.align_marks().collect()))
    assert ra == rb
    assert len(ra) == 11


# -- RetrievalIngestor: streaming per-caption top-k ---------------------------


def _retr_ing(spark, tmp_path, cents, **kw):
    from flume_spark.streaming.dedup import RetrievalIngestor

    return RetrievalIngestor(
        spark,
        index_dir=str(tmp_path / "index"),
        caps_dir=str(tmp_path / "caps"),
        topk_dir=str(tmp_path / "topk"),
        ledger_dir=str(tmp_path / "ledger"),
        centroids=cents,
        id_col="id",
        **kw,
    )


def _retr_frame(spark, rows):
    from flume_spark.operators import multimodal

    df = spark.createDataFrame(rows, "id long, text string")
    pay = multimodal.to_binary_payload(df, "id", "text")
    return pay.select("id", "payload").join(
        df.select("id", multimodal.F.col("text").alias("caption")), "id"
    )


def _batch_topk(spark, rows, cents, k=3):
    """Reference: the batch retrieval law over the full corpus in the
    same frozen centroid space."""
    from pyspark.sql.window import Window

    from flume_spark.operators import multimodal, similarity

    df = spark.createDataFrame(rows, "id long, text string")
    pay = multimodal.to_binary_payload(df, "id", "text")
    mf = multimodal.feature_extract_stub(pay.select("id", "payload"))
    tf = multimodal.caption_features(df, "id", "text")
    am = similarity.kmeans_assign_vectorized(
        mf, "id", "features", k=len(cents), centroids=cents
    ).select(multimodal.F.col("id").alias("media_id"), "cluster")
    at = similarity.kmeans_assign_vectorized(
        tf, "id", "t_features", k=len(cents), centroids=cents
    ).select(multimodal.F.col("id").alias("caption_id"), "cluster")
    F = multimodal.F
    tq = multimodal.quantized_feature_cols(
        tf, "t_features", "t", id_out="caption_id"
    ).join(at, "caption_id")
    mq = multimodal.quantized_feature_cols(
        mf, "features", "m", id_out="media_id"
    ).join(am, "media_id")
    d_col, align_q, _keep = multimodal.align_q_cols()
    scored = (
        tq.join(mq, "cluster")
        .withColumn("__align_d", d_col)
        .withColumn("align_q", align_q)
    )
    rn = F.row_number().over(
        Window.partitionBy("caption_id").orderBy(
            F.col("align_q").desc(), "media_id"
        )
    )
    return (
        scored.withColumn("rank", rn)
        .filter(F.col("rank") <= k)
        .select(
            F.col("caption_id").alias("id"), "media_id", "rank", "align_q"
        )
    )


def _cents_from(spark, rows, kc=4):
    from flume_spark.operators import multimodal

    df = spark.createDataFrame(rows, "id long, text string")
    pay = multimodal.to_binary_payload(df, "id", "text")
    mf = multimodal.feature_extract_stub(pay.select("id", "payload"))
    init = (
        mf.orderBy(multimodal.F.md5(multimodal.F.col("id").cast("string")), "id")
        .limit(kc)
        .select("features")
        .collect()
    )
    return [list(r["features"]) for r in init]


_RETR_ROWS = [
    (i, t)
    for i, t in enumerate(
        [
            "alpha beam over the quiet river",
            "bravo current in a long canyon",
            "charlie delta echoes at dawn",
            "delta frame with painted walls",
            "echo garden of stone lanterns",
            "foxtrot harbor lights at night",
            "golf index of forgotten maps",
            "hotel jacket weather forecast",
            "india kilo lima morning train",
            "juliet mountain north of town",
            "kilo november paper lanterns",
            "lima oscar quebec silent film",
        ]
    )
]


def test_retrieval_ingestor_matches_batch_law(spark, tmp_path):
    """After N batches the maintained state must equal the batch query
    over the full ingested corpus (the heap-merge invariant): later
    media genuinely displace earlier top-k rows, proven by comparing
    against the one-shot recompute."""
    cents = _cents_from(spark, _RETR_ROWS)
    ing = _retr_ing(spark, tmp_path, cents)
    for b in range(3):
        ing.process(
            _retr_frame(spark, [r for r in _RETR_ROWS if r[0] % 3 == b]), b
        )
    got = sorted(map(tuple, ing.retrieval_topk().collect()))
    want = sorted(map(tuple, _batch_topk(spark, _RETR_ROWS, cents).collect()))
    assert got == want
    assert len(got) > 0


def test_retrieval_ingestor_replay_and_fold_neutral(spark, tmp_path):
    cents = _cents_from(spark, _RETR_ROWS)
    a = _retr_ing(spark, tmp_path / "a", cents)
    b = _retr_ing(spark, tmp_path / "b", cents, auto_compact_every=2)
    batches = [
        _retr_frame(spark, [r for r in _RETR_ROWS if r[0] % 3 == i])
        for i in range(3)
    ]
    for ing in (a, b):
        for i, bdf in enumerate(batches):
            ing.process(bdf, i)
        ing.process(batches[1], 1)  # ledger re-delivery: must be skipped
    ra = sorted(map(tuple, a.retrieval_topk().collect()))
    rb = sorted(map(tuple, b.retrieval_topk().collect()))
    assert ra == rb
    # and both equal the batch recompute
    want = sorted(map(tuple, _batch_topk(spark, _RETR_ROWS, cents).collect()))
    assert ra == want


def test_retrieval_ingestor_full_and_tiered_folds_agree(spark, tmp_path):
    cents = _cents_from(spark, _RETR_ROWS)
    a = _retr_ing(spark, tmp_path / "a", cents, auto_compact_every=2,
                  compact_mode="full")
    b = _retr_ing(spark, tmp_path / "b", cents, auto_compact_every=2,
                  compact_mode="tiered")
    for ing in (a, b):
        for i in range(3):
            ing.process(
                _retr_frame(spark, [r for r in _RETR_ROWS if r[0] % 3 == i]), i
            )
    assert sorted(map(tuple, a.retrieval_topk().collect())) == sorted(
        map(tuple, b.retrieval_topk().collect())
    )


# -- FrameIngestor ambient accounting parity (r13 VERDICT item 8) -------------


def test_frame_ingestor_ambient_hashes_accounting(spark, tmp_path):
    """The streaming max_df gate must leave an audit trail matching the
    batch `frame_ambient_hashes` convention: every dropped hash appears
    in `ambient_hashes()` with its df AS OF the batch that gated it;
    ungated runs return None."""
    from tests.test_round12_ops import _clip, _frame_ing, _pay

    gated = _frame_ing(spark, tmp_path, tag="_g", min_shared=2, max_df=3)
    plain = _frame_ing(spark, tmp_path, tag="_p", min_shared=2)
    b0 = [(1, _clip(100, 1, 2, 3)), (2, _clip(100, 9, 8, 7))]
    b1 = [(3, _clip(100, 1, 2, 30)), (4, _clip(100, 50, 2, 60))]
    for b, rows in enumerate([b0, b1]):
        gated.process(_pay(spark, rows), b)
        plain.process(_pay(spark, rows), b)
    amb = gated.ambient_hashes()
    assert amb is not None
    rows = amb.collect()
    # the shared w100 hash crossed max_df=3 at batch 1 (df = 4)
    assert [(r["df"], r["ingest_batch"]) for r in rows] == [(4, 1)]
    # the ungated twin has no trail, and its marks table stays readable
    assert plain.ambient_hashes() is None
    assert len(plain.dup_marks().collect()) == 4


# -- frozen-centroid assignment: codegen expression twin ----------------------


def test_kmeans_assign_expr_matches_kernel(spark):
    """Round-14 optimization pin: `kmeans_assign_expr` (the zero-boundary
    codegen Column the RetrievalIngestor fuses into its quantization
    projection) must reproduce `kmeans_assign_vectorized`'s cluster for
    every point, including exact-tie rows (6dp round BEFORE the argmin,
    ties -> lowest cluster index)."""
    from pyspark.sql import functions as F

    from flume_spark.operators.similarity import (
        ASSIGN_EXPR_MAX_K,
        kmeans_assign_expr,
        kmeans_assign_vectorized,
    )

    cents = [
        [0.0, 0.0, 0.0, 0.0],
        [1.0, 0.0, 0.0, 0.0],
        [0.25, 0.25, 0.25, 0.25],
    ]
    rows = [
        # exact midpoint of centroids 0 and 1: dist2 ties at 0.25 -> cluster 0
        (1, [0.5, 0.0, 0.0, 0.0]),
        # clear winners
        (2, [0.9, 0.1, 0.0, 0.0]),
        (3, [0.26, 0.24, 0.25, 0.25]),
        (4, [-3.5, 2.0, 7.25, 0.125]),
        # sub-6dp jitter that rounds back onto the tie -> still cluster 0
        (5, [0.5 + 2e-8, 0.0, 0.0, 0.0]),
        (6, [0.0, 0.0, 0.0, 0.0]),
    ]
    assert len(cents) <= ASSIGN_EXPR_MAX_K
    df = spark.createDataFrame(rows, "id long, vec array<double>")
    got = {
        r["id"]: r["c"]
        for r in df.select(
            "id", kmeans_assign_expr("vec", cents).alias("c")
        ).collect()
    }
    want = {
        r["id"]: r["cluster"]
        for r in kmeans_assign_vectorized(
            df, "id", "vec", k=len(cents), centroids=cents
        ).collect()
    }
    assert got == want
    assert got[1] == 0 and got[5] == 0  # the tie law, explicitly


def test_assign_expr_budget_rejects_wide_vectors():
    """The round-14 A/B: at k x dim = 256 (k=4, dim-64 embeddings) the
    unrolled expression left codegen and ran 25x slower than the kernel —
    the gate must reject that regime and keep the measured-fast dim-4
    lattice cases."""
    from flume_spark.operators.similarity import assign_expr_ok

    assert assign_expr_ok([[0.0] * 4] * 4)         # the retrieval regime
    assert assign_expr_ok([[0.0] * 4] * 6)         # 24 terms: the edge
    assert not assign_expr_ok([[0.0] * 4] * 8)     # kernel wins from k=8
    assert not assign_expr_ok([[0.0] * 4] * 40)    # expr 2.37s vs 0.32s
    assert not assign_expr_ok([[0.0] * 64] * 4)    # the interpreted cliff
    assert not assign_expr_ok([[0.0] * 4] * 65)    # k past the hard cap
    assert not assign_expr_ok([])


def test_substring_dup_stats_accepts_prebuilt_windows(spark):
    """The `windows=` reuse seam (the verify_candidate_pairs `shingles=`
    convention): stats computed from a caller-built window index must be
    row-identical to the self-built default — corpus_curate_spans feeds
    ONE checkpointed index into both its stats and clean legs."""
    from pyspark.sql import functions as F

    from flume_spark.operators import dedup

    docs = spark.createDataFrame(
        [
            (1, "a b c d e f g h i j"),
            (2, "a b c d e f g h x y"),
            (3, "z z z z z z z z z z"),
            (4, "too short"),
        ],
        "doc_id long, text string",
    )
    wins = dedup.substring_windows(dedup._spread(docs), "doc_id", "text", k=8)
    got = sorted(
        dedup.substring_dup_stats(
            docs, "doc_id", "text", k=8, windows=wins
        ).collect()
    )
    want = sorted(dedup.substring_dup_stats(docs, "doc_id", "text", k=8).collect())
    assert got == want
    # the anti-join survivor form the curate-spans query uses is
    # row-identical to re-windowing the surviving docs
    rejected = docs.filter(F.col("doc_id") == 3).select(
        F.col("doc_id").alias("id")
    )
    via_anti = sorted(
        wins.join(rejected, "id", "left_anti").collect()
    )
    via_rewindow = sorted(
        dedup.substring_windows(
            docs.filter(F.col("doc_id") != 3), "doc_id", "text", k=8
        ).collect()
    )
    assert via_anti == via_rewindow


def test_classifier_tf0_vocab_matches_classifier_vocab(spark):
    """The shared-tokenization refactor: the vocabulary derived from the
    one tf0 table (plain count per token) must equal classifier_vocab's
    explode(array_distinct) doc-frequency top-k, tie-break included."""
    from pyspark.sql import functions as F

    from flume_spark.operators import text as T

    docs = spark.createDataFrame(
        [
            (1, "en", "the cat sat on the mat"),
            (2, "en", "the dog sat"),
            (3, "de", "der hund sass"),
            (4, "en", "cat dog mat sass"),
        ],
        "doc_id long, lang string, text string",
    ).withColumn("y", (F.col("lang") == "en").cast("int"))
    tf0 = T._classifier_tf0(docs, "doc_id", "text", "y")
    vocab, _ = T._train_from_tf0(tf0, "doc_id", vocab_size=5, iters=1)
    got = [r["tok"] for r in vocab.collect()]
    want = [
        r["tok"]
        for r in T.classifier_vocab(docs, "doc_id", "text", 5).collect()
    ]
    assert got == want


def _maxspan_docs(spark):
    """Edge grid for the substring family: >=32 words, 16..31, 8..15,
    < 8 (no windows at any width), empty text ('' -> ['']), NULL text
    (tokenizes to a NULL array — round-15 ADVICE)."""
    long = " ".join(f"w{i}" for i in range(40))
    mid = " ".join(f"w{i}" for i in range(20))
    return spark.createDataFrame(
        [
            (1, long),
            (2, long),  # mirrors doc 1 at every width
            (3, mid),
            (4, mid + " tail differs here truly"),
            (5, "a b c d e f g h"),  # exactly 8 words
            (6, "a b c d e f g h"),
            (7, "too short"),
            (8, ""),
            (9, None),  # NULL text: w is NULL, size(w) is NULL
        ],
        "doc_id long, text string",
    )


def test_maxspan_fused_pass_matches_union(spark):
    """substring_max_dup_span's fused single-scan window pass must return
    the same severity ladder as the per-width union it replaced (and the
    per-width window frames themselves must agree, multiplicity
    included)."""
    from pyspark.sql import functions as F

    from flume_spark.operators import dedup

    docs = _maxspan_docs(spark)
    ks = (8, 16, 32)
    got = sorted(
        dedup.substring_max_dup_span(docs, "doc_id", "text", ks=ks).collect()
    )
    # reference: the pre-fusion union-of-widths formulation
    ref_wins = None
    for kk in ks:
        part = dedup.substring_windows(docs, "doc_id", "text", k=kk).select(
            "id", "h", F.lit(kk).alias("k")
        )
        ref_wins = part if ref_wins is None else ref_wins.unionByName(part)
    hot = (
        ref_wins.groupBy("k", "h")
        .agg(F.count_distinct("id").alias("nd"))
        .filter(F.col("nd") > 1)
        .select("k", "h")
    )
    hits = (
        ref_wins.join(hot, ["k", "h"], "left_semi")
        .select("id", "k")
        .distinct()
    )
    agg = hits.groupBy("id").agg(F.max("k").alias("max_dup_span"))
    want = sorted(
        docs.select(F.col("doc_id").alias("id"))
        .join(agg, "id", "left")
        .select(
            F.col("id").alias("doc_id"),
            F.coalesce("max_dup_span", F.lit(0))
            .cast("int")
            .alias("max_dup_span"),
        )
        .collect()
    )
    assert got == want
    # 1/2 mirror at 32; 3/4 share their 20 leading words (16, not 32);
    # 5/6 mirror at exactly 8; 7/8 too short for any width
    assert {r["max_dup_span"] for r in got} == {0, 8, 16, 32}


def test_substring_windows_tokens_seam(spark):
    """substring_windows(tokens=) — the tokenize-once seam
    substring_dedup_clean rides — must be row-identical to the self-
    tokenizing default, pos and multiplicity included."""
    from pyspark.sql import functions as F

    from flume_spark.operators import dedup

    docs = _maxspan_docs(spark)
    toks = docs.select(
        F.col("doc_id").alias("id"),
        dedup.norm_words_expr("text").alias("w"),
    )
    got = sorted(
        dedup.substring_windows(
            None, "doc_id", "text", k=8, tokens=toks
        ).collect()
    )
    want = sorted(
        dedup.substring_windows(docs, "doc_id", "text", k=8).collect()
    )
    assert got == want and len(got) > 0
    # both staging routes of the clean action are row-identical (the
    # composed funnels pass stage_tokens=False over checkpointed inputs)
    staged = sorted(
        dedup.substring_dedup_clean(docs, "doc_id", "text", k=8).collect()
    )
    lazy = sorted(
        dedup.substring_dedup_clean(
            docs, "doc_id", "text", k=8, stage_tokens=False
        ).collect()
    )
    assert staged == lazy


def test_substring_dedup_clean_null_text_row(spark):
    """A NULL-text doc must still get an (n_words=0, n_kept=0,
    clean_text='') row — the docstring's "every document" contract.
    Before the round-15 coalesce, sum(size(w)) over the NULL token
    array emitted the doc with n_words=NULL (round-15 ADVICE)."""
    from flume_spark.operators import dedup

    docs = _maxspan_docs(spark)
    rows = {
        r["doc_id"]: r
        for r in dedup.substring_dedup_clean(
            docs, "doc_id", "text", k=8
        ).collect()
    }
    assert 9 in rows
    r9 = rows[9]
    assert (r9["n_words"], r9["n_kept"], r9["clean_text"]) == (0, 0, "")
