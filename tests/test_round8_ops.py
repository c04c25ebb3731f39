"""Round-8 operator tests: exact substring (span) dedup — the windowed-hash
analog of the Lee et al. 2022 suffix-array pass — and SemDeDup semantic
dedup (cluster-restricted cosine pruning with a deterministic keep rule)."""

from __future__ import annotations

from pyspark.sql import functions as F

from flume_spark.operators import dedup
from tests.conftest import SF_ORACLE

SPAN = "alpha bravo charlie delta echo foxtrot golf hotel"  # exactly 8 words


def _docs(spark):
    rows = [
        (1, f"intro {SPAN} outro one"),  # shares SPAN with doc 2
        (2, f"different lead-in {SPAN} tail"),  # punctuation must normalize away
        (3, "unique words only here nothing shared at all nine ten"),
        (4, "too short"),  # < 8 words -> no windows at all
        (5, " ".join(["rep"] * 20)),  # within-doc repetition is NOT cross-dup
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_substring_dup_stats_counts_cross_doc_windows(spark):
    got = {
        r["doc_id"]: (r["n_windows"], r["n_dup_windows"], r["dup_frac"])
        for r in dedup.substring_dup_stats(_docs(spark), "doc_id", "text", k=8)
        .collect()
    }
    # doc 1: 11 words -> 4 windows, exactly the SPAN window shared with doc 2
    assert got[1] == (4, 1, round(1 / 4, 6))
    # doc 2: "lead-in" normalizes to two words -> 12 words -> 5 windows
    assert got[2] == (5, 1, round(1 / 5, 6))
    # doc 3: 10 unique words -> 3 windows, none shared
    assert got[3] == (3, 0, 0.0)
    # doc 5: 13 identical windows, but only ONE distinct doc -> not dup
    assert got[5] == (13, 0, 0.0)
    # doc 4 emits no windows (shorter than k) and is absent
    assert 4 not in got


def test_substring_hot_spans_reports_shared_span(spark):
    rows = dedup.substring_hot_spans(_docs(spark), "doc_id", "text", k=8).collect()
    assert len(rows) == 1
    (r,) = rows
    assert r["example_span"] == SPAN
    assert r["n_docs"] == 2
    assert r["n_occurrences"] == 2


def test_substring_windows_respect_normalization(spark):
    """Case and punctuation differences must not break span identity."""
    df = spark.createDataFrame(
        [(1, SPAN.upper().replace(" ", ", ")), (2, SPAN)],
        "doc_id long, text string",
    )
    stats = {
        r["doc_id"]: r["n_dup_windows"]
        for r in dedup.substring_dup_stats(df, "doc_id", "text", k=8).collect()
    }
    assert stats == {1: 1, 2: 1}


def test_semantic_dedup_keeps_lowest_id(spark):
    emb = spark.createDataFrame(
        [
            (1, [1.0, 0.0]),
            (2, [0.9999, 0.01]),  # near-dup of 1
            (3, [0.0, 1.0]),  # orthogonal: never a dup at t=0.9
        ],
        "vec_id long, embedding array<double>",
    )
    got = {
        r["vec_id"]: (r["dup_of"], r["is_dup"])
        for r in dedup.semantic_dedup(
            emb, "vec_id", "embedding", k=1, threshold=0.9
        ).collect()
    }
    assert got[1] == (None, False)  # the representative survives
    assert got[2] == (1, True)
    assert got[3] == (None, False)


def test_semantic_dedup_pairs_are_same_cluster_and_over_threshold(spark):
    """Self-consistency on real data: every marked duplicate names a
    lower-id partner in the SAME cluster with cosine >= threshold."""
    from flume_spark.operators.similarity import cosine_expr, kmeans_assign_step

    emb = spark.read.parquet(f"{SF_ORACLE}/embeddings.parquet")
    marked = dedup.semantic_dedup(emb, "vec_id", "embedding", k=4, threshold=0.4)
    dups = marked.filter("is_dup").select(
        F.col("vec_id").alias("id_b"), F.col("dup_of").alias("id_a")
    )
    assign = kmeans_assign_step(emb, "vec_id", "embedding", k=4).select(
        "id", "cluster"
    )
    vecs = emb.select(F.col("vec_id").alias("id"), F.col("embedding").alias("v"))
    joined = (
        dups.join(
            assign.select(F.col("id").alias("id_a"), F.col("cluster").alias("ca")),
            "id_a",
        )
        .join(
            assign.select(F.col("id").alias("id_b"), F.col("cluster").alias("cb")),
            "id_b",
        )
        .join(vecs.select(F.col("id").alias("id_a"), F.col("v").alias("va")), "id_a")
        .join(vecs.select(F.col("id").alias("id_b"), F.col("v").alias("vb")), "id_b")
        .withColumn("cosine", F.round(cosine_expr("va", "vb"), 6))
    )
    assert joined.count() > 0, "sf0.01 embeddings should contain semantic dups"
    bad = joined.filter(
        (F.col("ca") != F.col("cb"))
        | (F.col("cosine") < 0.4)
        | (F.col("id_a") >= F.col("id_b"))
    )
    assert bad.count() == 0


# ---------------------------------------------------------------------------
# incremental substring dedup (at-ingest path + persisted window index)
# ---------------------------------------------------------------------------


def _span_corpus(spark):
    """Docs 1 and 3 are odd (the batch), doc 2 is even (history); SPAN
    appears in all three, so a batch occurrence is matched BOTH by history
    and by the batch itself — the double-evidence case (id, pos) dedups."""
    rows = [
        (1, f"intro {SPAN} outro one"),
        (2, f"different lead in {SPAN} tail"),
        (3, f"third copy here {SPAN} closing words now"),
        (5, "unique odd words only here nothing shared at all"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_incremental_substring_matches_whole_rebuild(spark):
    docs = _span_corpus(spark)
    inc = dedup.incremental_substring_stats(
        docs.filter("doc_id % 2 = 1"),
        "doc_id",
        "text",
        k=8,
        history=docs.filter("doc_id % 2 = 0"),
    )
    whole = dedup.substring_dup_stats(docs, "doc_id", "text", k=8).filter(
        "doc_id % 2 = 1"
    )
    got = {tuple(r) for r in inc.collect()}
    want = {tuple(r) for r in whole.collect()}
    assert got == want
    # the triple-shared SPAN counts each batch occurrence ONCE despite
    # matching both history (doc 2) and the batch (docs 1<->3)
    by_id = {r["doc_id"]: r["n_dup_windows"] for r in inc.collect()}
    assert by_id[1] == 1 and by_id[3] == 1


def test_incremental_substring_requires_exactly_one_history(spark):
    docs = _span_corpus(spark)
    import pytest

    with pytest.raises(ValueError):
        dedup.incremental_substring_stats(docs, "doc_id", "text", k=8)
    with pytest.raises(ValueError):
        dedup.incremental_substring_stats(
            docs, "doc_id", "text", k=8, history=docs, history_windows=docs
        )


def test_incremental_substring_persisted_index_path(spark, tmp_path):
    """The production shape: history windows persisted through the SAME
    bucketed band-key machinery the LSH index uses (band_key = window
    hash).  The probe engages the bucketed scan (index side exchange-free)
    and the results equal the in-plan history baseline."""
    from flume_spark.plans import explain_str

    docs = spark.read.parquet(f"{SF_ORACLE}/documents.parquet")
    hist = docs.filter("doc_id % 2 = 0")
    new = docs.filter("doc_id % 2 = 1")
    hw = dedup.substring_windows(hist, "doc_id", "text", k=8).select(
        "id", F.col("h").alias("band_key")
    )
    try:
        dedup.write_band_index(hw, "r8_win_idx", str(tmp_path / "widx"), buckets=4)
        idx = dedup.read_band_index(spark, "r8_win_idx").select(
            "id", F.col("band_key").alias("h")
        )
        inc = dedup.incremental_substring_stats(
            new, "doc_id", "text", k=8, history_windows=idx
        )
        assert "SelectedBucketsCount" in explain_str(inc)
        baseline = dedup.incremental_substring_stats(
            new, "doc_id", "text", k=8, history=hist
        )
        assert {tuple(r) for r in inc.collect()} == {
            tuple(r) for r in baseline.collect()
        }
    finally:
        spark.sql("DROP TABLE IF EXISTS r8_win_idx")


def test_substring_dedup_clean_keeps_one_canonical_occurrence(spark):
    got = {
        r["doc_id"]: (r["n_words"], r["n_kept"], r["clean_text"])
        for r in dedup.substring_dedup_clean(
            _docs(spark), "doc_id", "text", k=8
        ).collect()
    }
    # doc 1 holds the canonical (lowest (id, pos)) SPAN occurrence: intact
    assert got[1] == (11, 11, f"intro {SPAN} outro one")
    # doc 2 loses the 8 SPAN words, keeps its own frame
    assert got[2] == (12, 4, "different lead in tail")
    # doc 3 has no duplicated window: unchanged
    assert got[3] == (10, 10, "unique words only here nothing shared at all nine ten")
    # doc 4 is below k words (no windows) and survives whole
    assert got[4] == (2, 2, "too short")
    # doc 5 is 20x the same word: 13 identical windows collapse to the
    # canonical at pos 0 — every position covered by a non-canonical
    # occurrence (1..19) is dropped
    assert got[5] == (20, 1, "rep")


def test_kmeans_assign_vectorized_matches_expression_path(spark):
    """The numpy mapInPandas assignment must reproduce the oracled
    crossJoin+fold step EXACTLY (same init, 6dp rounding before argmin,
    ties to lowest cluster) — at the oracle k and at SemDeDup-regime k."""
    from flume_spark.operators.similarity import (
        kmeans_assign_step,
        kmeans_assign_vectorized,
    )

    emb = spark.read.parquet(f"{SF_ORACLE}/embeddings.parquet")
    for k in (4, 16):
        expr_rows = {
            r["id"]: (r["cluster"], r["dist2"])
            for r in kmeans_assign_step(emb, "vec_id", "embedding", k=k).collect()
        }
        vec_rows = {
            r["id"]: (r["cluster"], r["dist2"])
            for r in kmeans_assign_vectorized(
                emb, "vec_id", "embedding", k=k
            ).collect()
        }
        assert vec_rows == expr_rows, f"k={k}: vectorized assignment diverged"


def test_bigram_rarity_flags_word_salad(spark):
    """A doc reusing another doc's transitions scores 0; a doc pairing the
    same vocabulary in novel orders scores high."""
    from flume_spark.operators import text as text_ops

    rows = [
        (1, "the quick brown fox jumps"),
        (2, "the quick brown fox jumps"),  # every transition shared with 1
        (3, "brown the fox quick jumps"),  # same words, unique transitions
        (4, "solo"),  # single token: no bigrams, excluded
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_bigrams"], r["n_unique_bigrams"], r["rare_frac"])
        for r in text_ops.bigram_rarity(df, "doc_id", "text").collect()
    }
    assert got[1] == (4, 0, 0.0)
    assert got[2] == (4, 0, 0.0)
    assert got[3] == (4, 4, 1.0)
    assert 4 not in got


# ---------------------------------------------------------------------------
# hypothesis property suites: operators vs brute-force Python references
# ---------------------------------------------------------------------------


def _ref_norm_words(text: str) -> list[str]:
    import re

    return re.sub(r"[^a-z0-9]+", " ", text.lower()).strip().split(" ")


def _ref_windows(docs: dict[int, str], k: int):
    wins: dict[tuple[int, int], tuple[str, ...]] = {}
    for i, t in docs.items():
        w = _ref_norm_words(t)
        if len(w) >= k:
            for p in range(len(w) - k + 1):
                wins[(i, p)] = tuple(w[p : p + k])
    return wins


def test_substring_stats_match_python_reference(spark):
    """substring_dup_stats == the brute-force definition on random tiny-
    vocab corpora (small vocab forces genuine cross-doc and within-doc
    window collisions, including the repeated-window-in-one-doc case)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    word = st.sampled_from(["a", "b", "c"])
    doc = st.lists(word, min_size=0, max_size=14).map(" ".join)
    corpus = st.lists(doc, min_size=2, max_size=6)
    k = 3

    @given(texts=corpus)
    @settings(max_examples=25, deadline=None)
    def check(texts):
        docs = dict(enumerate(texts))
        wins = _ref_windows(docs, k)
        holders: dict[tuple[str, ...], set[int]] = {}
        for (i, _p), win in wins.items():
            holders.setdefault(win, set()).add(i)
        want = {}
        for i in docs:
            occ = [win for (j, _p), win in wins.items() if j == i]
            if occ:
                nd = sum(1 for win in occ if len(holders[win]) > 1)
                want[i] = (len(occ), nd)
        df = spark.createDataFrame(list(docs.items()), "doc_id long, text string")
        got = {
            r["doc_id"]: (r["n_windows"], r["n_dup_windows"])
            for r in dedup.substring_dup_stats(df, "doc_id", "text", k=k).collect()
        }
        assert got == want

    check()


def test_substring_clean_matches_python_reference(spark):
    """substring_dedup_clean == the brute-force keep-one-canonical removal:
    for every GLOBALLY repeated window (cross-doc or within-doc), all
    occurrences except the (id, pos)-smallest have their k positions
    dropped; kept words rejoin in order."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    word = st.sampled_from(["a", "b", "c"])
    doc = st.lists(word, min_size=0, max_size=14).map(" ".join)
    corpus = st.lists(doc, min_size=1, max_size=5)
    k = 3

    @given(texts=corpus)
    @settings(max_examples=25, deadline=None)
    def check(texts):
        docs = dict(enumerate(texts))
        wins = _ref_windows(docs, k)
        occs: dict[tuple[str, ...], list[tuple[int, int]]] = {}
        for (i, p), win in wins.items():
            occs.setdefault(win, []).append((i, p))
        covered: dict[int, set[int]] = {i: set() for i in docs}
        for win, where in occs.items():
            if len(where) > 1:
                for i, p in sorted(where)[1:]:  # every non-canonical occurrence
                    covered[i].update(range(p, p + k))
        want = {}
        for i, t in docs.items():
            w = _ref_norm_words(t)
            kept = [x for pos, x in enumerate(w) if pos not in covered[i]]
            want[i] = (len(w), len(kept), " ".join(kept))
        df = spark.createDataFrame(list(docs.items()), "doc_id long, text string")
        got = {
            r["doc_id"]: (r["n_words"], r["n_kept"], r["clean_text"])
            for r in dedup.substring_dedup_clean(
                df, "doc_id", "text", k=k
            ).collect()
        }
        assert got == want

    check()


def test_semantic_dedup_matches_python_reference(spark):
    """semantic_dedup (k=1: clustering trivial, the keep rule in isolation)
    == the brute-force rule: dup_of = smallest lower id whose 6dp-rounded
    cosine clears the threshold."""
    import numpy as np
    from hypothesis import given, settings
    from hypothesis import strategies as st

    coord = st.integers(min_value=-3, max_value=3)
    vec = st.tuples(coord, coord).filter(lambda v: v != (0, 0))
    vecs = st.lists(vec, min_size=2, max_size=7)
    thr = st.sampled_from([0.3, 0.7, 0.95])

    @given(vs=vecs, threshold=thr)
    @settings(max_examples=25, deadline=None)
    def check(vs, threshold):
        ids = list(range(len(vs)))
        arr = np.asarray(vs, dtype=np.float64)
        norms = np.sqrt((arr * arr).sum(1))
        cos = np.round((arr @ arr.T) / np.outer(norms, norms), 6)
        want = {}
        for j in ids:
            lower = [i for i in ids[:j] if cos[i, j] >= threshold]
            want[j] = min(lower) if lower else None
        df = spark.createDataFrame(
            [(i, [float(x) for x in v]) for i, v in zip(ids, vs)],
            "vec_id long, embedding array<double>",
        )
        got = {
            r["vec_id"]: r["dup_of"]
            for r in dedup.semantic_dedup(
                df, "vec_id", "embedding", k=1, threshold=threshold
            ).collect()
        }
        assert got == want

    check()


def test_substring_maxspan_ladder(spark):
    """Severity is the LARGEST shared width: a 16-word mirror scores 16
    (not 8), an 8-word-only overlap scores 8, unique docs score 0."""
    long_span = " ".join(f"s{i}" for i in range(16))
    rows = [
        (1, f"lead {long_span} tail"),
        (2, f"other frame {long_span} ending"),  # 16-word mirror of 1
        (3, f"x1 x2 x3 {SPAN} y1 y2"),
        (4, f"z1 z2 {SPAN} q1 q2 q3"),  # shares only the 8-word SPAN with 3
        (5, "totally unique words here without any shared span at all"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: r["max_dup_span"]
        for r in dedup.substring_max_dup_span(
            df, "doc_id", "text", ks=(8, 16, 32)
        ).collect()
    }
    assert got == {1: 16, 2: 16, 3: 8, 4: 8, 5: 0}


def test_curate_corpus_span_clean_stage(spark, tmp_path):
    """substring_clean=True edits documents in place: survivor counts are
    unchanged, packing bills the cleaned text, and the removed-word total
    is reported."""
    from flume_spark.curation import curate_corpus

    filler_a = " ".join(f"fa{i}" for i in range(12))
    filler_b = " ".join(f"fb{i}" for i in range(12))
    rows = [
        (1, f"{filler_a} {SPAN}"),
        (2, f"{filler_b} {SPAN}"),  # shares only SPAN: below near-dup radar
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    curated, counts = curate_corpus(
        spark, docs, min_quality=0.0, substring_clean=True
    )
    assert counts["span_tokens_removed"] == 8  # one SPAN occurrence dropped
    assert counts["packed"] == 2  # both docs survive
    toks = {r["doc_id"]: r["n_tokens"] for r in curated.collect()}
    assert toks[1] == 20  # canonical keeper: 12 filler + 8 span words
    assert toks[2] == 12  # cleaned doc: filler only


def test_hierarchical_assignment_agreement_floor(spark):
    """The two-level IVF-style router must agree with exact assignment on
    nearly every point even on UNCLUSTERED uniform vectors (the hardest
    routing case — real embeddings are easier); exact agreement on
    separated data is pinned below."""
    from flume_spark.operators.similarity import (
        kmeans_assign_hierarchical,
        kmeans_assign_vectorized,
    )

    emb = spark.read.parquet(f"{SF_ORACLE}/embeddings.parquet")
    exact = {
        r["id"]: r["cluster"]
        for r in kmeans_assign_vectorized(emb, "vec_id", "embedding", k=16).collect()
    }
    hier = {
        r["id"]: r["cluster"]
        for r in kmeans_assign_hierarchical(
            emb, "vec_id", "embedding", k=16, n_probe=3
        ).collect()
    }
    agree = sum(1 for i in exact if exact[i] == hier[i]) / len(exact)
    assert agree >= 0.95, f"agreement {agree:.3f} below floor"


def test_semantic_dedup_hierarchical_on_separated_data(spark):
    """On well-separated groups the router is exact, so hierarchical mode
    reproduces the exact mode's dup marking verbatim."""
    rows = []
    for g in range(4):  # 4 far-apart groups of 3 near-identical vectors
        base = [0.0] * 8
        base[g] = 100.0
        for j in range(3):
            v = list(base)
            v[(g + 1) % 8] = 0.01 * j
            rows.append((g * 10 + j, v))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    kw = dict(k=4, threshold=0.99)
    exact = {
        r["vec_id"]: (r["cluster"], r["dup_of"])
        for r in dedup.semantic_dedup(emb, "vec_id", "embedding", **kw).collect()
    }
    hier = {
        r["vec_id"]: (r["cluster"], r["dup_of"])
        for r in dedup.semantic_dedup(
            emb, "vec_id", "embedding", assign="hierarchical", **kw
        ).collect()
    }
    assert exact == hier
    # marking is group-faithful: a duplicate always names a LOWER id from
    # its own separated group (never cross-group at threshold 0.99), and
    # every group keeps at least one representative (the md5-seeded init
    # may SPLIT a group across clusters, so a group can keep more than one
    # — but each group's lowest id is always a keeper)
    for vid, (_, dup) in exact.items():
        if dup is not None:
            assert dup < vid and dup // 10 == vid // 10
    assert all(exact[g * 10][1] is None for g in range(4))


def test_incremental_substring_matches_rebuild_property(spark):
    """Merge-equals-rebuild under random corpora and a random parity
    split: the at-ingest path must equal the whole-corpus stats restricted
    to the batch on EVERY input, not just the planted fixtures."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    word = st.sampled_from(["a", "b", "c"])
    doc = st.lists(word, min_size=0, max_size=12).map(" ".join)
    corpus = st.lists(doc, min_size=2, max_size=6)
    k = 3

    @given(texts=corpus, split=st.integers(min_value=2, max_value=3))
    @settings(max_examples=12, deadline=None)
    def check(texts, split):
        docs = spark.createDataFrame(
            list(enumerate(texts)), "doc_id long, text string"
        )
        inc = dedup.incremental_substring_stats(
            docs.filter(f"doc_id % {split} = 1"),
            "doc_id",
            "text",
            k=k,
            history=docs.filter(f"doc_id % {split} != 1"),
        )
        whole = dedup.substring_dup_stats(docs, "doc_id", "text", k=k).filter(
            f"doc_id % {split} = 1"
        )
        assert {tuple(r) for r in inc.collect()} == {
            tuple(r) for r in whole.collect()
        }

    check()


def test_streaming_semantic_matches_prefix_reference(spark):
    """The SemanticIngestor's per-batch marks equal the brute-force
    batch-prefix rule (earlier batch, or lower id within the batch; frozen
    centroids) on random small vector sets — the streaming analog of the
    merge-equals-rebuild property."""
    import tempfile

    import numpy as np
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from flume_spark.streaming.dedup import SemanticIngestor

    coord = st.integers(min_value=-2, max_value=2)
    vec = st.tuples(coord, coord).filter(lambda v: v != (0, 0))
    vecs = st.lists(vec, min_size=3, max_size=8)
    cents = [[1.0, 0.0], [0.0, 1.0]]
    t = 0.7

    @given(vs=vecs)
    @settings(max_examples=8, deadline=None)
    def check(vs):
        ids = list(range(len(vs)))
        arr = np.asarray(vs, dtype=np.float64)
        c = np.asarray(cents)
        d = np.round(
            ((arr[:, None, :] - c[None, :, :]) ** 2).sum(-1), 6
        )
        cluster = d.argmin(1)
        norms = np.sqrt((arr * arr).sum(1))
        cos = np.round((arr @ arr.T) / np.outer(norms, norms), 6)
        want = {}
        for j in ids:
            cands = [
                i
                for i in ids
                if i != j
                and cluster[i] == cluster[j]
                and cos[i, j] >= t
                and (i % 3 < j % 3 or (i % 3 == j % 3 and i < j))
            ]
            want[j] = min(cands) if cands else None
        root = tempfile.mkdtemp(prefix="sem_prop_")
        try:
            ing = SemanticIngestor(
                spark,
                cents,
                index_dir=f"{root}/idx",
                marks_dir=f"{root}/marks",
                ledger_dir=f"{root}/ledger",
                threshold=t,
            )
            df = spark.createDataFrame(
                [(i, [float(x) for x in v]) for i, v in zip(ids, vs)],
                "vec_id long, embedding array<double>",
            )
            for b in range(3):
                ing._process(df.filter(f"vec_id % 3 = {b}"), batch_id=b)
            got = {
                r["vec_id"]: r["dup_of"] for r in ing.dup_marks().collect()
            }
        finally:
            import shutil

            shutil.rmtree(root, ignore_errors=True)
        assert got == want

    check()
