"""Round-13 operators and hardening.

ADVICE regressions: wav_fmt canonical strictness (duplicate chunks and
trailing junk reject — no last-wins veto/rescue), audio_meta BIGINT
n_bytes, frame_containment_pairs exact-by-default + ambient-hash
observability, and the fold-window lock sentinel.
"""

from __future__ import annotations

import multiprocessing
import os
import struct

import pytest

from flume_spark.operators import multimodal
from flume_spark.streaming import state


def _wav_bytes(samples, extra_chunk: bytes = b"", audio_format: int = 1,
               bits_per: int = 16) -> bytes:
    data = struct.pack(f"<{len(samples)}h", *samples)
    fmt = struct.pack("<HHIIHH", audio_format, 1, 8000, 16000, 2, bits_per)
    body = b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += extra_chunk
    body += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body


def _pay(spark, rows):
    return multimodal.to_binary_payload(
        spark.createDataFrame(rows, "doc_id long, text string"),
        "doc_id",
        "text",
        encoding="ISO-8859-1",
    )


# -- wav_fmt canonical strictness (round-13 ADVICE) ----------------------------


def test_wav_fmt_rejects_duplicate_fmt_chunk():
    good = _wav_bytes([1, 2, 3, 4])
    assert multimodal.wav_fmt(good) is not None
    # a SECOND valid fmt chunk makes the container non-canonical
    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16)
    dup = b"fmt " + struct.pack("<I", len(fmt)) + fmt
    assert multimodal.wav_fmt(_wav_bytes([1, 2, 3, 4], extra_chunk=dup)) is None


def test_wav_fmt_invalid_fmt_is_never_rescued_by_a_later_valid_one():
    # first fmt declares IEEE float (invalid); a later PCM fmt must NOT
    # rescue acceptance (the old last-wins parse did exactly that)
    bad_fmt = struct.pack("<HHIIHH", 3, 1, 8000, 16000, 2, 16)
    lead = b"fmt " + struct.pack("<I", len(bad_fmt)) + bad_fmt
    samples = [5, 6, 7, 8]
    data = struct.pack("<4h", *samples)
    good_fmt = struct.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16)
    body = (
        lead
        + b"fmt " + struct.pack("<I", len(good_fmt)) + good_fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    wav = b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body
    assert multimodal.wav_fmt(wav) is None


def test_wav_fmt_rejects_duplicate_data_chunk():
    extra = b"data" + struct.pack("<I", 4) + struct.pack("<2h", 9, 9)
    assert multimodal.wav_fmt(_wav_bytes([1, 2, 3, 4], extra_chunk=extra)) is None


def test_wav_fmt_rejects_trailing_junk():
    good = _wav_bytes([1, 2, 3, 4])
    for junk in (b"\x00", b"junk", b"RIFFxxx"):  # 1..7 bytes, no full header
        assert multimodal.wav_fmt(good + junk) is None
    # a full well-formed trailing chunk is still fine (LIST metadata)
    trailer = b"LIST" + struct.pack("<I", 4) + b"info"
    assert multimodal.wav_fmt(good + trailer) is not None


# -- audio_meta BIGINT n_bytes (round-13 ADVICE) --------------------------------


def test_audio_meta_n_bytes_is_bigint(spark):
    meta = multimodal.audio_meta(_pay(spark, [(1, "abcdef")]))
    field = dict((f.name, f.dataType.simpleString()) for f in meta.schema.fields)
    assert field["n_bytes"] == "bigint"
    row = meta.collect()[0]
    assert row["n_bytes"] == 6 and row["n_samples"] == 3


# -- frame containment: exact by default, ambient hashes observable ------------


def test_frame_containment_default_is_exact_ungated(spark):
    import inspect

    sig = inspect.signature(multimodal.frame_containment_pairs)
    assert sig.parameters["max_df"].default is None
    # degenerate sub-n_frames payloads all hash 0 -> quadratic pairing is
    # the EXACT rule's answer, and the default must reproduce it
    rows = [(10 + i, "xy") for i in range(4)]
    pairs = multimodal.frame_containment_pairs(_pay(spark, rows), min_shared=3)
    assert pairs.count() == 6  # 4*3/2


def test_frame_ambient_hashes_surfaces_gated_mass(spark):
    rows = [(10 + i, "xy") for i in range(6)]  # all share fhash 0
    pay = _pay(spark, rows)
    amb = multimodal.frame_ambient_hashes(pay, max_df=4).collect()
    assert [(r["fhash"], r["df"]) for r in amb] == [(0, 6)]
    assert multimodal.frame_ambient_hashes(pay, max_df=None).count() == 0
    # and the gated pairing drops exactly that mass
    gated = multimodal.frame_containment_pairs(pay, min_shared=3, max_df=4)
    assert gated.count() == 0


# -- fold-window lock sentinel (round-13 ADVICE) --------------------------------


def test_fold_lock_held_raises(tmp_path):
    d = str(tmp_path / "state")
    os.makedirs(d)
    fd = state._acquire_fold_lock(d)  # hold the flock (same-process fd
    # counts: flock is per-open-file-description)
    try:
        with pytest.raises(state.FoldLockHeld):
            state.recover_fold(d)
        with pytest.raises(state.FoldLockHeld):
            state.atomic_fold_swap(d, lambda tmp: os.makedirs(tmp))
    finally:
        state._release_fold_lock(fd)
    state.recover_fold(d)  # released: acquirable again


def test_fold_lock_crashed_owner_never_blocks(tmp_path):
    """flock IS the staleness story: a leftover lockfile whose owner died
    (kernel released the flock) must not block — including the unstamped
    crash window and a dead pid stamp.  There is no unlink-based reclaim
    to race (the round-13 review's TOCTOU)."""
    d = str(tmp_path / "state")
    os.makedirs(d)
    open(os.path.join(d, "part"), "w").write("x")

    def crash_holding_lock(path):
        import fcntl as f

        fd = os.open(path + ".foldlock", os.O_CREAT | os.O_RDWR, 0o644)
        f.flock(fd, f.LOCK_EX)  # die without releasing: kernel cleans up

    p = multiprocessing.Process(target=crash_holding_lock, args=(d,))
    p.start()
    p.join()
    state.recover_fold(d)  # not held anymore: proceeds, no reclaim needed
    # the sentinel file persists by design (never unlinked)
    assert os.path.exists(d + ".foldlock")


def test_fold_lock_released_after_swap_and_protects_staging(tmp_path):
    d = str(tmp_path / "state")
    os.makedirs(d)
    open(os.path.join(d, "part"), "w").write("old")

    def write_merged(tmp):
        os.makedirs(tmp)
        open(os.path.join(tmp, "folded"), "w").write("new")
        # mid-fold, a concurrent recover_fold must refuse, leaving the
        # staging dir intact
        with pytest.raises(state.FoldLockHeld):
            state.recover_fold(d)
        assert os.path.isdir(tmp)

    state.atomic_fold_swap(d, write_merged)
    assert os.listdir(d) == ["folded"]
    # lock released (file persists, flock free): next window acquirable
    fd = state._acquire_fold_lock(d)
    state._release_fold_lock(fd)


# -- cross-modal alignment (round-13 VERDICT item 2) ---------------------------


def _align(spark, t_vecs, m_vecs, **kw):
    rows = [(i, t, m) for i, (t, m) in enumerate(zip(t_vecs, m_vecs))]
    df = spark.createDataFrame(
        rows, "id long, t_features array<double>, m_features array<double>"
    )
    return {
        r["id"]: (r["align_q"], r["keep"])
        for r in multimodal.cross_modal_align(
            df, text_col="t_features", media_col="m_features", **kw
        ).collect()
    }


def test_cross_modal_align_matches_float_cosine_reference(spark):
    import math
    import random

    rng = random.Random(13)
    t_vecs, m_vecs = [], []
    for _ in range(64):
        t_vecs.append([rng.randrange(256) / 256.0 for _ in range(4)])
        m_vecs.append([rng.randrange(256) / 256.0 for _ in range(4)])
    got = _align(spark, t_vecs, m_vecs)
    for i, (t, m) in enumerate(zip(t_vecs, m_vecs)):
        d = sum(a * b for a, b in zip(t, m))
        na, nb = math.sqrt(sum(a * a for a in t)), math.sqrt(sum(b * b for b in m))
        if na == 0 or nb == 0:
            assert got[i] == (0, False)
            continue
        cos = d / (na * nb)
        # align_q is floor(cos^2 * 1e6) exactly (all quantities integral
        # after the exact x256 lift); keep is cos >= 0.95
        want_q = (
            int(round(d * 256 * 256)) ** 2 * 10**6
            // (int(round(na * na * 256 * 256)) * int(round(nb * nb * 256 * 256)))
        )
        assert got[i][0] == want_q
        assert abs(got[i][0] / 1e6 - cos * cos) < 1e-5
        assert got[i][1] == (cos >= 0.95) or abs(cos - 0.95) < 1e-9


def test_cross_modal_align_sign_and_zero_norm(spark):
    # anti-aligned pair: negative dot -> negative align_q, never kept
    got = _align(
        spark,
        [[1.0, 0.0], [0.0, 0.0], [1.0, 0.0]],
        [[-1.0, 0.0], [1.0, 0.0], [1.0, 0.0]],
    )
    assert got[0] == (-1_000_000, False)  # cos = -1
    assert got[1] == (0, False)  # zero-norm caption side
    assert got[2] == (1_000_000, True)  # cos = +1


def test_cross_modal_align_threshold_is_exact_rational(spark):
    # construct cos exactly at the 19/20 boundary: t=(19,something)...
    # simpler: t=[a,b], m=[1,0] -> cos = a/sqrt(a^2+b^2); pick (19, sqrt(39))
    # not lattice-exact — instead verify strictness around the boundary by
    # quantized integer vectors: cos^2 = d^2/(a2*b2) vs 361/400
    t = [[19 / 256.0, 0.0], [18 / 256.0, 6 / 256.0]]
    m = [[20 / 256.0, 0.0], [1.0, 0.0]]
    got = _align(spark, t, m)
    assert got[0] == (1_000_000, True)  # colinear: cos=1
    # cos^2 = 324/360 = 0.9 < 0.9025 -> dropped
    assert got[1] == (900_000, False)


def test_caption_features_normalization(spark):
    df = spark.createDataFrame(
        [(1, "Hello, World!"), (2, ""), (3, "!!!")],
        "doc_id long, text string",
    )
    rows = {
        r["id"]: r["t_features"]
        for r in multimodal.caption_features(df, "doc_id", "text").collect()
    }
    # "helloworld": len 10, first 'h'(104), last 'd'(100), 10*7%256=70
    assert rows[1] == [10 / 256.0, 104 / 256.0, 100 / 256.0, 70 / 256.0]
    assert rows[2] == [0.0, 0.0, 0.0, 0.0]
    assert rows[3] == [0.0, 0.0, 0.0, 0.0]  # normalizes to empty


# -- AlignIngestor: streaming cross-modal alignment ----------------------------


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
    """rows: (id, text, media_ref) — payload and caption both from text."""
    df = spark.createDataFrame(rows, "id long, text string, media_ref long")
    pay = multimodal.to_binary_payload(df, "id", "text")
    return (
        pay.select("id", "payload")
        .join(df.select("id", multimodal.F.col("text").alias("caption"),
                        "media_ref"), "id")
    )


def test_align_ingestor_matches_then_pins_unmatched(spark, tmp_path):
    ing = _align_ing(spark, tmp_path)
    # batch 0: doc 0 (self-ref, matched); doc 2 refs media 4 (not arrived)
    ing.process(_align_frame(spark, [(0, "hello world", 0),
                                     (2, "caption two", 4)]), 0)
    # batch 1: media 4 arrives, and doc 5 refs it (matched same-batch)
    ing.process(_align_frame(spark, [(4, "media four", 4),
                                     (5, "caption five", 4)]), 1)
    got = {r["id"]: (r["matched"], r["keep"]) for r in ing.align_marks().collect()}
    assert got[0][0] is True
    assert got[2] == (False, False)  # pinned at ingest: never revisited
    assert got[4][0] is True and got[5][0] is True
    # self-aligned doc 0: caption and media derive from the same text —
    # correlated but not identical embeddings; score must be a real value
    aq = {r["id"]: r["align_q"] for r in ing.align_marks().collect()}
    assert 0 < aq[0] <= 1_000_000


def test_align_ingestor_ledger_replay_is_idempotent(spark, tmp_path):
    ing = _align_ing(spark, tmp_path)
    ing.process(_align_frame(spark, [(0, "alpha beta", 0)]), 0)
    ing.process(_align_frame(spark, [(3, "gamma delta", 0)]), 1)
    before = sorted(map(tuple, ing.align_marks().collect()))
    ing.process(_align_frame(spark, [(3, "gamma delta", 0)]), 1)  # re-delivery
    after = sorted(map(tuple, ing.align_marks().collect()))
    assert before == after


def test_align_ingestor_fold_changes_no_verdict(spark, tmp_path):
    rows0 = [(0, "first media doc", 0), (2, "second doc here", 0)]
    rows1 = [(1, "third caption x", 0), (4, "fourth one here", 2)]
    rows2 = [(7, "late caption yz", 4), (6, "even anchor doc", 6)]
    a = _align_ing(spark, tmp_path / "a")
    b = _align_ing(spark, tmp_path / "b", auto_compact_every=2)
    for ing in (a, b):
        ing.process(_align_frame(spark, rows0), 0)
        ing.process(_align_frame(spark, rows1), 1)  # b folds after this
        ing.process(_align_frame(spark, rows2), 2)  # b probes the base
    ra = sorted(map(tuple, a.align_marks().collect()))
    rb = sorted(map(tuple, b.align_marks().collect()))
    assert ra == rb
    # the fold actually happened: batches 0-1 folded into maintenance
    # output (a tiered level-run under the round-14 default; the -9 base
    # under compact_mode="full"), only the post-fold batch-2 partition
    # rides alongside as fresh state
    from flume_spark.streaming import state as st

    parts = sorted(st.ingest_partitions(str(tmp_path / "b" / "index")))
    assert [p for p in parts if p >= 0] == [2], parts
    assert any(p < 0 for p in parts), parts


def test_align_ingestor_quiesce_guard(spark, tmp_path):
    ing = _align_ing(spark, tmp_path)
    ing.process(_align_frame(spark, [(0, "doc zero", 0)]), 0)
    # simulate a written-but-unacked batch: write index partition, no marker
    import os

    df = ing._media_features(_align_frame(spark, [(9, "unacked doc", 9)]))
    df.write.mode("overwrite").partitionBy("kbucket").parquet(
        os.path.join(str(tmp_path / "index"), "ingest_batch=7")
    )
    with pytest.raises(RuntimeError, match="non-quiesced"):
        ing.compact_index()


# -- tiered (LSM) fold compaction (round-13 VERDICT item 4) --------------------


def test_plan_tiered_fold_levels_and_cascade():
    from flume_spark.streaming import state as st

    # fresh trees fold at level0_min
    assert st.plan_tiered_fold([0, 1], fanout=8) == ([0, 1], -(st.RUN_STRIDE + 1))
    assert st.plan_tiered_fold([0], fanout=8) is None
    # level-1 runs fold at fanout into a level-2 run with a fresh seq
    runs = [-(st.RUN_STRIDE + s) for s in (1, 2, 3)]
    assert st.plan_tiered_fold(runs, fanout=3) == (
        sorted(runs),
        -(2 * st.RUN_STRIDE + 4),
    )
    assert st.plan_tiered_fold(runs[:2], fanout=3) is None
    # the legacy base is terminal: never folded by a tiered step
    assert st.plan_tiered_fold([-9], fanout=1) is None
    # lowest due level folds first
    mixed = [0, 1, *runs]
    assert st.plan_tiered_fold(mixed, fanout=3)[0] == [0, 1]


def test_run_level_encoding():
    from flume_spark.streaming import state as st

    assert st.run_level(0) == 0 and st.run_level(17) == 0
    assert st.run_level(-(st.RUN_STRIDE + 5)) == 1
    assert st.run_level(-(3 * st.RUN_STRIDE + 12)) == 3
    assert st.run_level(-9) > 100  # legacy base above every tier


def test_link_tree_is_hardlink_copy(tmp_path):
    import os

    from flume_spark.streaming import state as st

    src = tmp_path / "src" / "nested"
    os.makedirs(src)
    (src / "a.parquet").write_text("data")
    st.link_tree(str(tmp_path / "src"), str(tmp_path / "dst"))
    dst_file = tmp_path / "dst" / "nested" / "a.parquet"
    assert dst_file.read_text() == "data"
    assert os.stat(dst_file).st_ino == os.stat(src / "a.parquet").st_ino


_TIER_ROWS = [
    [(1, "abcdefgh" * 8), (2, "ijklmnop" * 8)],
    [(3, "abcdefgh" * 8)],             # dup of 1
    [(4, "qrstuvwx" * 8), (5, "ijklmnop" * 8)],  # 5 dups 2
    [(6, "abcdefgi" * 8)],             # near-dup of 1's family
    [(7, "yz" * 32)],
    [(8, "qrstuvwx" * 8)],             # dup of 4
]


def test_phash_tiered_marks_equal_full_fold_twin(spark, tmp_path):
    """compact_mode='tiered' produces EXACTLY the marks of a
    never-compacted twin over a multi-fold schedule, while the index
    layout becomes level runs (no monolithic base rewrite)."""
    from flume_spark.streaming import state as st
    from flume_spark.streaming.dedup import PhashIngestor

    def ing(tag, **kw):
        return PhashIngestor(
            spark,
            index_dir=str(tmp_path / f"idx{tag}"),
            marks_dir=str(tmp_path / f"mk{tag}"),
            ledger_dir=str(tmp_path / f"lg{tag}"),
            id_col="id",
            **kw,
        )

    tiered = ing("t", auto_compact_every=2, compact_mode="tiered", fanout=2)
    plain = ing("p")
    for b, rows in enumerate(_TIER_ROWS):
        tiered.process(_pay(spark, rows), b)
        plain.process(_pay(spark, rows), b)
    assert {tuple(r) for r in tiered.dup_marks().collect()} == {
        tuple(r) for r in plain.dup_marks().collect()
    }
    parts = st.ingest_partitions(str(tmp_path / "idxt"))
    # folds happened AND cascaded: with fanout=2 and 3 level-1 folds, at
    # least one level-2 run must exist; no fresh trees remain unfolded
    # beyond the cadence bound
    assert any(st.run_level(p) >= 2 for p in parts), parts
    assert sum(1 for p in parts if p >= 0) < len(_TIER_ROWS)
    # the probe still sees every doc: ingest a final twin of doc 7
    tiered.process(_pay(spark, [(9, "yz" * 32)]), len(_TIER_ROWS))
    marks = {r["id"]: r["dup_of"] for r in tiered.dup_marks().collect()}
    assert marks[9] == 7


def test_lm_tiered_counts_equal_full_fold(spark, tmp_path):
    """Additive counts: a tiered groupBy-sum fold schedule yields the
    SAME perplexity marks as the monolithic compact_state twin."""
    from flume_spark.streaming.lm import LmIngestor

    rows = [
        [(1, "the cat sat on the mat")],
        [(2, "the dog sat on the log")],
        [(3, "a cat and a dog")],
        [(4, "the cat sat again")],
    ]

    def ing(tag, **kw):
        return LmIngestor(
            spark,
            state_dir=str(tmp_path / f"st{tag}"),
            marks_dir=str(tmp_path / f"mk{tag}"),
            ledger_dir=str(tmp_path / f"lg{tag}"),
            id_col="id",
            text_col="text",
            **kw,
        )

    tiered = ing("t", auto_compact_every=2, compact_mode="tiered", fanout=2)
    plain = ing("p")
    for b, r in enumerate(rows):
        df = spark.createDataFrame(r, "id long, text string")
        tiered.process(df, b)
        plain.process(df, b)
    assert sorted(map(tuple, tiered.marks().collect())) == sorted(
        map(tuple, plain.marks().collect())
    )


def test_align_tiered_marks_equal_full(spark, tmp_path):
    rows0 = [(0, "first media doc", 0), (2, "second doc here", 0)]
    rows1 = [(1, "third caption x", 0), (4, "fourth one here", 2)]
    rows2 = [(7, "late caption yz", 4), (6, "even anchor doc", 6)]
    rows3 = [(9, "final caption q", 6)]
    a = _align_ing(spark, tmp_path / "full")
    b = _align_ing(
        spark, tmp_path / "tier", auto_compact_every=2,
        compact_mode="tiered", fanout=2,
    )
    for i, rows in enumerate((rows0, rows1, rows2, rows3)):
        a.process(_align_frame(spark, rows), i)
        b.process(_align_frame(spark, rows), i)
    assert sorted(map(tuple, a.align_marks().collect())) == sorted(
        map(tuple, b.align_marks().collect())
    )


# -- round-13 review regressions ----------------------------------------------


def test_full_fold_after_tiered_runs_succeeds(spark, tmp_path):
    """A full compact_index on a dir holding tiered RUN partitions must
    fold them into the base, not raise 'non-quiesced' (run ids have no
    ledger markers and never will — review finding #2)."""
    from flume_spark.streaming import state as st
    from flume_spark.streaming.dedup import PhashIngestor

    ing = PhashIngestor(
        spark,
        index_dir=str(tmp_path / "idx"),
        marks_dir=str(tmp_path / "mk"),
        ledger_dir=str(tmp_path / "lg"),
        id_col="id",
        fanout=2,
    )
    for b, rows in enumerate(_TIER_ROWS[:4]):
        ing.process(_pay(spark, rows), b)
    assert ing.compact_step() > 0
    parts = st.ingest_partitions(str(tmp_path / "idx"))
    assert any(p < 0 and p != -9 for p in parts)  # tiered runs live
    before = {tuple(r) for r in ing.dup_marks().collect()}
    assert ing.compact_index() > 0  # regression: raised RuntimeError
    assert st.ingest_partitions(str(tmp_path / "idx")) == [-9]
    # and the squashed index still probes identically
    ing.process(_pay(spark, [(9, "abcdefgh" * 8)]), 9)
    marks = {r["id"]: r["dup_of"] for r in ing.dup_marks().collect()}
    assert marks[9] == 1
    assert before <= {tuple(r) for r in ing.dup_marks().collect()}


def test_align_null_media_ref_is_unmatched(spark, tmp_path):
    """A caption with media_ref NULL must be marked unmatched, not crash
    the trigger (review finding #3: int(None) in the kbucket derivation)."""
    ing = _align_ing(spark, tmp_path)
    ing.process(_align_frame(spark, [(0, "media zero doc", 0)]), 0)
    rows = [(1, "refless caption", None), (2, "good caption xx", 0)]
    df = spark.createDataFrame(rows, "id long, text string, media_ref long")
    pay = multimodal.to_binary_payload(df, "id", "text")
    frame = pay.select("id", "payload").join(
        df.select("id", multimodal.F.col("text").alias("caption"), "media_ref"),
        "id",
    )
    ing.process(frame, 1)
    got = {r["id"]: (r["matched"], r["keep"]) for r in ing.align_marks().collect()}
    assert got[1] == (False, False)
    assert got[2][0] is True


def test_align_dim_param_keeps_norm_consistent(spark, tmp_path):
    """With a longer encoder output, scoring is the projection onto the
    first `dim` components with norms over the SAME slice — never a
    mismatched-norm cosine (review finding #4)."""

    def enc8(b):
        return [1.0, 0.0, 0.0, 0.0, 1.0, 1.0, 1.0, 1.0]

    ing = _align_ing(spark, tmp_path, encoder=enc8, dim=4)
    # caption 'a...' normalizes nonempty; media features sliced to 4 dims
    ing.process(_align_frame(spark, [(0, "aaaa", 0)]), 0)
    row = ing.align_marks().collect()[0]
    # media slice = [256,0,0,0] -> b2 must be 256^2 (not the 8-dim sum)
    idx = spark.read.parquet(str(tmp_path / "index")).collect()[0]
    assert idx["b2"] == 256 * 256
    assert row["matched"] is True


def test_next_run_id_wraps_instead_of_overflowing():
    from flume_spark.streaming import state as st

    near = -(1 * st.RUN_STRIDE + (st.RUN_STRIDE - 1))  # seq at stride-1
    rid = st.next_run_id([near], level=2)
    assert st.run_level(rid) == 2  # stayed in level-2 id space
    assert (-rid) % st.RUN_STRIDE == 1  # wrapped to the smallest unused


def test_frame_ambient_default_mirrors_pairing_default():
    import inspect

    amb = inspect.signature(multimodal.frame_ambient_hashes)
    pair = inspect.signature(multimodal.frame_containment_pairs)
    assert (
        amb.parameters["max_df"].default
        == pair.parameters["max_df"].default
        is None
    )


def test_align_sweep_consistent_with_keep_gate(spark):
    """The 0.95 sweep column must equal the declared keep gate's count,
    and keep counts must be monotone non-increasing in tau."""
    from flume_spark.queries.llm_ops import (
        multimodal_align,
        multimodal_align_sweep,
    )

    sf = "/root/testdata/sf0.001"
    scored = multimodal_align(spark, sf)
    kept_95 = scored.filter("keep").count()
    sweep = multimodal_align_sweep(spark, sf).collect()
    by_tau = {}
    for r in sweep:
        by_tau[r["tau"]] = by_tau.get(r["tau"], 0) + r["n_keep"]
    assert by_tau["0.95"] == kept_95
    taus = sorted(by_tau)  # string sort == numeric here
    assert all(by_tau[a] >= by_tau[b] for a, b in zip(taus, taus[1:]))


def test_align_dim_longer_than_encoder_zero_pads(spark, tmp_path):
    """dim > encoder output must zero-pad (F.get is NULL out-of-bounds
    even under ANSI; element_at would throw ArrayIndexOutOfBounds)."""

    def enc2(b):
        return [1.0, 0.0]

    ing = _align_ing(spark, tmp_path, encoder=enc2, dim=6)
    ing.process(_align_frame(spark, [(0, "aaaa", 0)]), 0)
    row = ing.align_marks().collect()[0]
    assert row["matched"] is True
    idx = spark.read.parquet(str(tmp_path / "index")).collect()[0]
    assert idx["b2"] == 256 * 256  # norm over the 2 real components only
    assert idx["m2"] == 0 and idx["m5"] == 0


def test_cross_modal_align_mismatched_lengths_score_on_overlap(spark):
    """Mismatched encoder lengths score the COMMON slice — the true
    projection cosine with norms over exactly the scored components,
    byte-identical to the streaming AlignIngestor law (review finding:
    a full-length norm against a truncated dot is a silently skewed
    cosine that can flip keep between batch and stream)."""
    rows = [(0, [1.0, 0.0], [1.0, 0.0, 3.0, 4.0])]
    df = spark.createDataFrame(
        rows, "id long, t_features array<double>, m_features array<double>"
    )
    r = multimodal.cross_modal_align(
        df, text_col="t_features", media_col="m_features"
    ).collect()[0]
    # overlap = 2 components: perfectly aligned on the shared subspace
    assert r["align_q"] == 10**6 and r["keep"] is True
    # explicit dim pins the slice like the ingestor's dim param
    r4 = multimodal.cross_modal_align(
        df, text_col="t_features", media_col="m_features", dim=4
    ).collect()[0]
    # caption zero-pads beyond its 2 real components: D=256^2, A=256^2,
    # B=26*256^2 -> the ingestor's zero-pad semantics exactly
    assert r4["align_q"] == 10**6 // 26 and r4["keep"] is False


def test_cross_modal_align_null_component_counts_as_zero(spark):
    # one NULL element must not zero the dot but poison a norm: keep is
    # a real boolean, never NULL (review finding: half-applied hardening
    # made keep NULL and the row vanished from BOTH filter sides)
    rows = [(0, [0.5, None, 0.25, 0.0], [0.5, 0.5, 0.25, 0.0])]
    df = spark.createDataFrame(
        rows, "id long, t_features array<double>, m_features array<double>"
    )
    r = multimodal.cross_modal_align(
        df, text_col="t_features", media_col="m_features"
    ).collect()[0]
    # t -> [128, 0, 64, 0]; m -> [128, 128, 64, 0]
    dd = 128 * 128 + 64 * 64
    a2 = 128 * 128 + 64 * 64
    b2 = 128 * 128 + 128 * 128 + 64 * 64
    assert r["align_q"] == dd * dd * 10**6 // (a2 * b2)
    assert r["keep"] in (True, False)  # never NULL
    assert r["keep"] == (dd * dd * 400 >= 361 * a2 * b2)


def test_multimodal_retrieval_topk_matches_cluster_brute_force(spark):
    """Top-3 per caption must equal a python brute force restricted to
    the same frozen-centroid clusters (the IVF trade: candidates are
    approximate, the ranking math is exact)."""
    from flume_spark.operators import similarity
    from flume_spark.queries.llm_ops import multimodal_retrieval_topk

    sf = "/root/testdata/sf0.001"
    got = {}
    for r in multimodal_retrieval_topk(spark, sf).collect():
        got.setdefault(r["caption_id"], []).append(
            (r["rank"], r["media_id"], r["align_q"])
        )

    docs = spark.read.parquet(f"{sf}/documents.parquet").select(
        "doc_id", "text"
    )
    pay = multimodal.to_binary_payload(docs, "doc_id", "text")
    mf = {r["id"]: r["features"]
          for r in multimodal.feature_extract_stub(pay).collect()}
    tf = {r["id"]: r["t_features"]
          for r in multimodal.caption_features(docs, "doc_id", "text").collect()}
    kc = max(4, len(mf) // 125)
    # the centroid draw replayed in python from the already-collected
    # features (md5 of the decimal id string — the md5_init convention)
    import hashlib

    order = sorted(
        mf, key=lambda i: (hashlib.md5(str(i).encode()).hexdigest(), i)
    )
    cents = [list(mf[i]) for i in order[:kc]]

    def assign(vec):
        best = None
        for ci, cv in enumerate(cents):
            d2 = round(sum((a - b) ** 2 for a, b in zip(vec, cv)), 6)
            if best is None or (d2, ci) < best:
                best = (d2, ci)
        return best[1]

    am = {i: assign(v) for i, v in mf.items()}
    at = {i: assign(v) for i, v in tf.items()}

    def align_q(t, m):
        qt = [int(x * 256 + 0.5) for x in t]
        qm = [int(x * 256 + 0.5) for x in m]
        d = sum(a * b for a, b in zip(qt, qm))
        a2 = sum(a * a for a in qt)
        b2 = sum(b * b for b in qm)
        if a2 == 0 or b2 == 0:
            return 0
        s = 1 if d >= 0 else -1
        return s * (d * d * 10**6 // (a2 * b2))

    for cid, t in tf.items():
        cands = [
            (align_q(t, mf[mid]), mid)
            for mid in mf
            if am[mid] == at[cid]
        ]
        cands.sort(key=lambda p: (-p[0], p[1]))
        want = [(i + 1, mid, q) for i, (q, mid) in enumerate(cands[:3])]
        have = sorted(got.get(cid, []))
        assert have == want, (cid, have, want)


def test_frame_tiered_marks_equal_full_fold_twin(spark, tmp_path):
    """FrameIngestor compact_mode='tiered': marks equal a never-compacted
    twin across a multi-fold schedule (completing the tiered-equality
    matrix: Phash/Lm/Align/Frame)."""
    from flume_spark.streaming.dedup import FrameIngestor

    def w(seed):
        import hashlib

        h = hashlib.md5(str(seed).encode()).digest() * 2
        return "".join(chr(33 + b % 90) for b in h)

    def clip(*seeds):
        return "".join(w(s) for s in seeds)

    rows = [
        [(1, clip(1, 2, 3, 4)), (2, clip(5, 6, 7, 8))],
        [(3, clip(1, 2, 3, 40))],          # 3 shared frames -> dup of 1
        [(4, clip(9, 10, 11, 12))],
        [(5, clip(5, 6, 7, 8))],           # re-encode -> dup of 2
        [(6, clip(13, 14, 15, 16))],
        [(7, clip(9, 10, 11, 99))],        # clip of 4
    ]

    def ing(tag, **kw):
        return FrameIngestor(
            spark,
            index_dir=str(tmp_path / f"idx{tag}"),
            marks_dir=str(tmp_path / f"mk{tag}"),
            ledger_dir=str(tmp_path / f"lg{tag}"),
            id_col="id",
            **kw,
        )

    tiered = ing("t", auto_compact_every=2, compact_mode="tiered", fanout=2)
    plain = ing("p")
    for b, r in enumerate(rows):
        tiered.process(_pay(spark, r), b)
        plain.process(_pay(spark, r), b)
    t_marks = sorted(map(tuple, tiered.dup_marks().collect()))
    p_marks = sorted(map(tuple, plain.dup_marks().collect()))
    assert t_marks == p_marks
    dups = {r[0]: r[1] for r in t_marks}
    assert dups[3] == 1 and dups[5] == 2 and dups[7] == 4


def test_corpus_curriculum_pack_is_bucket_monotone(spark):
    """Within each shard, packs must be difficulty-monotone: pack p's
    hardest bucket <= pack p+1's easiest (the curriculum property the
    order_cols knob exists for), and pack token sums must equal the
    plain packing's totals (ordering moves docs between packs, never
    drops or double-counts them)."""
    from flume_spark.queries.llm_ops import corpus_curriculum_pack

    sf = "/root/testdata/sf0.001"
    rows = corpus_curriculum_pack(spark, sf).collect()
    by_shard = {}
    tot_docs = tot_tokens = 0
    for r in rows:
        by_shard.setdefault(r["shard"], []).append(
            (r["pack_id"], r["b_min"], r["b_max"])
        )
        tot_docs += r["n_docs"]
        tot_tokens += r["pack_tokens"]
    for shard, packs in by_shard.items():
        packs.sort()
        for (p1, _, hi1), (p2, lo2, _) in zip(packs, packs[1:]):
            assert hi1 <= lo2, (shard, p1, p2, hi1, lo2)
    # conservation vs the un-ordered BPE packing of the same corpus
    from flume_spark.operators import text as text_ops
    from flume_spark.queries._util import T as _T

    docs = _T(spark, sf, "documents")
    counted = text_ops.bpe_token_count(
        docs, "doc_id", "text", text_ops.EN_MERGES_DEMO
    )
    assert tot_docs == counted.count()
    assert tot_tokens == counted.agg(
        multimodal.F.sum("n_bpe_tokens")
    ).first()[0]
