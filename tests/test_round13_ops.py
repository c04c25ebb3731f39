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


def test_fold_lock_live_owner_raises(tmp_path):
    d = str(tmp_path / "state")
    os.makedirs(d)
    open(d + ".foldlock", "w").write(f"{os.getpid()}\n")  # this pid: live
    with pytest.raises(state.FoldLockHeld):
        state.recover_fold(d)
    with pytest.raises(state.FoldLockHeld):
        state.atomic_fold_swap(d, lambda tmp: os.makedirs(tmp))
    os.unlink(d + ".foldlock")


def test_fold_lock_stale_owner_is_reclaimed(tmp_path):
    d = str(tmp_path / "state")
    os.makedirs(d)
    open(os.path.join(d, "part"), "w").write("x")
    # a pid that is certainly gone: spawn a child that exits immediately
    p = multiprocessing.Process(target=lambda: None)
    p.start()
    p.join()
    open(d + ".foldlock", "w").write(f"{p.pid}\n")
    state.recover_fold(d)  # reclaims the stale lock instead of raising
    assert not os.path.exists(d + ".foldlock")
    # empty/unstamped sentinel (crash between create and stamp) is stale too
    open(d + ".foldlock", "w").close()
    state.recover_fold(d)
    assert not os.path.exists(d + ".foldlock")


def test_fold_lock_released_after_swap_and_protects_staging(tmp_path):
    d = str(tmp_path / "state")
    os.makedirs(d)
    open(os.path.join(d, "part"), "w").write("old")

    def write_merged(tmp):
        os.makedirs(tmp)
        open(os.path.join(tmp, "folded"), "w").write("new")
        # mid-fold, the lock exists and names this process
        assert os.path.exists(d + ".foldlock")
        # a concurrent recover_fold inside the window must refuse,
        # leaving the staging dir intact
        with pytest.raises(state.FoldLockHeld):
            state.recover_fold(d)
        assert os.path.isdir(tmp)

    state.atomic_fold_swap(d, write_merged)
    assert os.listdir(d) == ["folded"]
    assert not os.path.exists(d + ".foldlock")


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
