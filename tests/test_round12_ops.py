"""Round-12 operator tests.

Covers:
- The real-WAV decode arm of the audio seam (wav_pcm_data: canonical
  RIFF/WAVE 16-bit PCM parse, strict well-formedness, raw fallback).
- The vectorized numpy PCM kernels staying bit-identical to the
  per-sample int16 law (the round-11 pinned references re-verify the
  raw arm; here the WAV arm gets its own pinned reference).
- Two's-complement top-bit wrap at 64-bit fingerprints (pHash and the
  audio energy-profile hash) and their flow through the pigeonhole
  hamming engine.
- The frame-containment max_df frequency cap gating degenerate /
  ambient frame hashes before the equi-join.
- LmIngestor crash-window quiesce (marker-file-only acks, the round-11
  ADVICE medium) and the auto_compact_every maintenance cadence.
- PhashIngestor compact_index (fold exactness, quiesce guard, replay
  convergence), auto-compaction bound, and the pluggable-fingerprint
  audio arm vs a brute-force batch-prefix reference.
- FrameIngestor (streaming frame-containment video dedup): clip-twin
  semantics across batches, replay + fold convergence, single-batch
  equality to frame_containment_pairs.
"""

from __future__ import annotations

import struct

import pytest

from flume_spark.operators import multimodal


def _wav_bytes(samples, extra_chunk: bytes = b"", audio_format: int = 1,
               bits_per: int = 16) -> bytes:
    """A canonical RIFF/WAVE container around little-endian int16 PCM."""
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
        encoding="ISO-8859-1",  # latin-1 round-trips bytes 0-255
    )


# -- real-WAV decode arm -------------------------------------------------------


def test_wav_pcm_data_parses_canonical_wav():
    samples = list(range(-64, 64))
    wav = _wav_bytes(samples)
    data = multimodal.wav_pcm_data(wav)
    assert data == struct.pack("<128h", *samples)


def test_wav_pcm_data_skips_odd_sized_chunks_word_aligned():
    # an odd-sized LIST chunk before data exercises the RIFF 2-byte
    # alignment rule (chunk bodies are padded to even offsets)
    samples = [5, -5, 7, -7]
    wav = _wav_bytes(samples, extra_chunk=b"LIST" + struct.pack("<I", 3) + b"abc\x00")
    assert multimodal.wav_pcm_data(wav) == struct.pack("<4h", *samples)


@pytest.mark.parametrize(
    "payload",
    [
        b"",  # empty
        b"not a wav at all, just text bytes padded to length 48........",
        _wav_bytes([1, 2, 3, 4], audio_format=3),  # IEEE float, not PCM
        _wav_bytes([1, 2, 3, 4], bits_per=8),  # 8-bit, not 16
        _wav_bytes([1] * 64)[:-10],  # truncated data chunk
        b"RIFF" + b"\x00" * 60,  # RIFF magic but no WAVE form
    ],
)
def test_wav_pcm_data_rejects_malformed(payload):
    assert multimodal.wav_pcm_data(payload) is None


def test_audio_energy_real_wav_arm_windows_the_data_chunk(spark):
    """A well-formed WAV payload must be windowed over its DATA CHUNK
    SAMPLES (header skipped) — pinned against a direct int16 reference;
    a raw payload of the same bytes-minus-header stays on the raw arm
    and produces the same energies, proving the arms agree on the law."""
    samples = [1000 * ((i % 7) - 3) for i in range(64)]
    wav = _wav_bytes(samples)
    rows = [(1, wav.decode("ISO-8859-1")), (2, struct.pack("<64h", *samples).decode("ISO-8859-1"))]
    got = {
        (r["id"], r["window_idx"]): (r["n_samples"], r["energy"], r["is_silence"])
        for r in multimodal.audio_energy_stub(_pay(spark, rows), n_windows=8).collect()
    }
    wl = 64 // 8
    for i in range(8):
        win = samples[i * wl : (i + 1) * wl]
        e = sum(v * v for v in win)
        want = (wl, e, e <= 1000 * wl)
        assert got[(1, i)] == want, (i, got[(1, i)])  # WAV arm: header skipped
        assert got[(2, i)] == want, (i, got[(2, i)])  # raw arm: same law


def test_audio_fingerprint_wav_equals_raw_pcm_fingerprint(spark):
    """The energy-profile hash of a WAV and of its bare data chunk must
    be identical — the container parse changes where the samples come
    from, never the fingerprint law."""
    samples = [3000] * 64 + [10] * 64 + [2000] * 64 + [0] * 64
    wav = _wav_bytes(samples)
    raw = struct.pack(f"<{len(samples)}h", *samples)
    rows = [(1, wav.decode("ISO-8859-1")), (2, raw.decode("ISO-8859-1"))]
    fp = {
        r["id"]: r["ahash"]
        for r in multimodal.audio_fingerprint_stub(_pay(spark, rows)).collect()
    }
    assert fp[1] == fp[2] and fp[1] != 0


# -- 64-bit top-bit two's-complement wrap --------------------------------------


def test_phash_64bit_top_bit_wraps_and_pairs(spark):
    """bits=64: a fingerprint with bit 63 set must wrap to a negative
    BIGINT (no int64 overflow) and still pair correctly through the
    pigeonhole hamming engine (arithmetic shiftright + mask reads the
    blocks of a negative long correctly)."""
    a = bytes([0] * 63 + [255])  # s_i = b[i]; only s_63 beats the mean
    b = bytes([255] + [0] * 62 + [255])  # bits 0 and 63 beat the mean
    rows = [(1, a.decode("ISO-8859-1")), (2, b.decode("ISO-8859-1"))]
    pay = _pay(spark, rows)
    fp = {
        r["id"]: r["phash"]
        for r in multimodal.perceptual_hash_stub(pay, bits=64).collect()
    }
    assert fp[1] == -(1 << 63)  # wrapped, not crashed
    assert fp[2] == 1 - (1 << 63)
    pairs = multimodal.phash_pairs(pay, bits=64, max_hamming=3, blocks=8).collect()
    assert [(r["doc_a"], r["doc_b"], r["hamming"]) for r in pairs] == [(1, 2, 1)]


def test_audio_fingerprint_64_windows_top_bit_wraps(spark):
    """n_windows=64: only the last window loud -> bit 63 -> the hash must
    come out as the wrapped negative two's-complement value."""
    samples = [0] * (63 * 4) + [1000, -1000, 1000, -1000]
    rows = [(1, struct.pack(f"<{len(samples)}h", *samples).decode("ISO-8859-1"))]
    fp = multimodal.audio_fingerprint_stub(_pay(spark, rows), n_windows=64).collect()
    assert fp[0]["ahash"] == -(1 << 63)


# -- frame-containment frequency cap -------------------------------------------


def test_frame_containment_max_df_gates_degenerate_hashes(spark):
    """Sub-n_frames payloads all hash 0 per frame — the degenerate hot
    key.  With the cap they are gated out BEFORE the join (no quadratic
    fan-out, no degenerate pairs); real clip twins still pair at full
    n_matched.  With max_df=None the old behavior (quadratic degenerate
    pairing) is still reachable."""
    # varied 32-byte windows -> four NONZERO, distinct frame hashes (a
    # constant-byte window hashes 0 — the ambient value the cap gates)
    def w(seed):
        return "".join(chr(33 + (seed * 7 + j * 13) % 90) for j in range(32))

    twin = w(1) + w(2) + w(3) + w(4)
    rows = [(1, twin), (2, twin)] + [(10 + i, "xy") for i in range(8)]
    pay = _pay(spark, rows)
    capped = {
        (r["doc_a"], r["doc_b"]): r["n_matched"]
        for r in multimodal.frame_containment_pairs(
            pay, min_shared=3, max_df=4
        ).collect()
    }
    assert capped == {(1, 2): 4}  # twins pair; degenerate zero-hash gated
    uncapped = multimodal.frame_containment_pairs(
        pay, min_shared=3, max_df=None
    ).collect()
    # without the cap the 8 degenerate docs pair quadratically (8*7/2)
    assert len(uncapped) == 1 + 28


# -- LmIngestor: crash-window quiesce + auto-compaction cadence ----------------


_LM_BATCHES = [
    [(0, "the cat sat on the mat")],
    [(1, "the cat sat on the log"), (2, "zzz qqq")],
    [(3, "the cat sat on the mat"), (4, "the dog")],
    [(5, "the dog sat"), (6, "cat cat cat")],
    [(7, "the mat the log")],
    [(8, "dog on the mat"), (9, "qqq zzz qqq")],
]


def _lm_df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_lm_compact_quiesce_guard_holds_in_crash_window_same_session(
    spark, tmp_path
):
    """The round-11 ADVICE scenario: _process returns but the marker write
    fails (simulated by deleting the marker).  A SAME-SESSION
    compact_state must still raise — an in-memory ack would fold the
    unacked batch into the base, and the ledger replay would then
    double-count its bigrams.  After the replay lands the marker,
    compaction proceeds and the model is exact."""
    import os

    import pytest as _pytest

    from flume_spark.streaming.lm import LmIngestor

    ing = LmIngestor(
        spark,
        state_dir=str(tmp_path / "st"),
        marks_dir=str(tmp_path / "mk"),
        ledger_dir=str(tmp_path / "lg"),
    )
    for b in range(2):
        ing.process(_lm_df(spark, _LM_BATCHES[b]), b)
    os.remove(str(tmp_path / "lg") + "/batch-1.done")  # marker write "failed"

    with _pytest.raises(RuntimeError, match="non-quiesced"):
        ing.compact_state()  # same instance: memory must not defeat the guard

    ing.process(_lm_df(spark, _LM_BATCHES[1]), 1)  # ledger replay re-lands it
    model_before = {tuple(r) for r in ing.model().collect()}
    assert ing.compact_state() == 4
    assert {tuple(r) for r in ing.model().collect()} == model_before


def test_lm_auto_compact_bounds_state_files_scores_unchanged(spark, tmp_path):
    """auto_compact_every=2 on a 6-batch schedule: the count-partition
    directory stays bounded (never more than compact_every + 1 live
    partitions) and every verdict equals a never-compacted twin's."""
    import os

    from flume_spark.streaming.lm import LmIngestor

    auto = LmIngestor(
        spark,
        state_dir=str(tmp_path / "a_st"),
        marks_dir=str(tmp_path / "a_mk"),
        ledger_dir=str(tmp_path / "a_lg"),
        auto_compact_every=2,
    )
    plain = LmIngestor(
        spark,
        state_dir=str(tmp_path / "p_st"),
        marks_dir=str(tmp_path / "p_mk"),
        ledger_dir=str(tmp_path / "p_lg"),
    )
    for b, rows in enumerate(_LM_BATCHES):
        auto.process(_lm_df(spark, rows), b)
        plain.process(_lm_df(spark, rows), b)
        parts = [
            d
            for d in os.listdir(str(tmp_path / "a_st" / "bigrams"))
            if d.startswith("ingest_batch=")
        ]
        assert len(parts) <= 3  # base + at most compact_every live batches
    assert {tuple(r) for r in auto.marks().collect()} == {
        tuple(r) for r in plain.marks().collect()
    }
    assert {tuple(r) for r in auto.model().collect()} == {
        tuple(r) for r in plain.model().collect()
    }


# -- PhashIngestor: compaction, cadence, pluggable fingerprint -----------------


def _phash_ing(spark, tmp_path, tag="", **kw):
    from flume_spark.streaming.dedup import PhashIngestor

    return PhashIngestor(
        spark,
        index_dir=str(tmp_path / f"idx{tag}"),
        marks_dir=str(tmp_path / f"marks{tag}"),
        ledger_dir=str(tmp_path / f"lg{tag}"),
        id_col="id",
        **kw,
    )


_MEDIA_ROWS = [
    [(1, "abcdefgh" * 8), (2, "zzzz" + "qqqq" * 15)],
    [(3, "abcdefgh" * 8), (4, "mnopqrst" * 9)],
    [(5, "zzzz" + "qqqq" * 15), (6, "abcdefgi" * 8)],
]


def test_phash_compact_index_exact_and_quiesce_guarded(spark, tmp_path):
    """compact_index folds acked batch trees into the base partition:
    existing marks are untouched, the NEXT batch marks exactly as an
    uncompacted twin's, the fold is bband-partitioned (pruning survives),
    and a written-but-unacked batch blocks the fold."""
    import os

    ing = _phash_ing(spark, tmp_path)
    twin = _phash_ing(spark, tmp_path, tag="_twin")
    for b, rows in enumerate(_MEDIA_ROWS[:2]):
        ing.process(_pay(spark, rows), b)
        twin.process(_pay(spark, rows), b)
    before = {tuple(r) for r in ing.dup_marks().collect()}

    assert ing.compact_index() == 2
    assert {tuple(r) for r in ing.dup_marks().collect()} == before
    base = str(tmp_path / "idx") + "/ingest_batch=-9"
    assert os.path.isdir(base)
    assert any(d.startswith("bband=") for d in os.listdir(base))
    assert ing._index_partitions() == [-9]

    ing.process(_pay(spark, _MEDIA_ROWS[2]), 2)
    twin.process(_pay(spark, _MEDIA_ROWS[2]), 2)
    assert {tuple(r) for r in ing.dup_marks().collect()} == {
        tuple(r) for r in twin.dup_marks().collect()
    }
    # marks: 3 dups 1 (twin payload), 5 dups 2, 6 near-dups 1's family
    marks = {r["id"]: r["dup_of"] for r in ing.dup_marks().collect()}
    assert marks[3] == 1 and marks[5] == 2

    # quiesce guard: simulate the crash window on a fresh batch
    ing._process(_pay(spark, [(9, "freshpayload" * 6)]), 9)  # no marker
    with pytest.raises(RuntimeError, match="non-quiesced"):
        ing.compact_index()


def test_phash_replay_across_compaction_converges(spark, tmp_path):
    """The LshIngestor convention: a crash-window replay of a batch whose
    marker was lost AFTER other batches were compacted must re-mark
    identically — its own rows are not in the folded base (quiesce blocks
    folding unacked batches), so the probe still excludes them."""
    import os

    ing = _phash_ing(spark, tmp_path)
    for b, rows in enumerate(_MEDIA_ROWS):
        ing.process(_pay(spark, rows), b)
    first = {tuple(r) for r in ing.dup_marks().collect()}
    assert ing.compact_index() == 3

    # marker of batch 2 lost; a restarted instance replays it: its own
    # rows are inside the base now, but the batch was ACKED when folded —
    # the ledger skip is what protects acked batches, so simulate the
    # true crash window instead: batch 3 written, marker lost, replayed
    ing.process(_pay(spark, [(7, "abcdefgh" * 8)]), 3)
    os.remove(str(tmp_path / "lg") + "/batch-3.done")
    re_ing = _phash_ing(spark, tmp_path)
    re_ing.process(_pay(spark, [(7, "abcdefgh" * 8)]), 3)
    marks = {r["id"]: r["dup_of"] for r in re_ing.dup_marks().collect()}
    assert marks[7] == 1  # senior across the compacted history
    assert first <= {tuple(r) for r in re_ing.dup_marks().collect()}


def test_phash_auto_compact_bounds_index_partitions(spark, tmp_path):
    """auto_compact_every=2 keeps the index at a bounded number of
    ingest_batch trees over a long schedule, with marks identical to a
    never-compacted twin's.  Under the tiered default (round-14) the
    bound is the LSM invariant: at most compact_every fresh level-0
    trees and fewer than `fanout` runs at every level >= 1 (the old
    `<= 2 live trees` assertion was the monolithic-fold bound)."""
    from flume_spark.streaming.state import run_level

    auto = _phash_ing(spark, tmp_path, tag="_a", auto_compact_every=2)
    plain = _phash_ing(spark, tmp_path, tag="_p")
    sched = _MEDIA_ROWS + [
        [(10, "abcdefgh" * 8)],
        [(11, "wxyz" * 16), (12, "zzzz" + "qqqq" * 15)],
        [(13, "wxyz" * 16)],
    ]
    for b, rows in enumerate(sched):
        auto.process(_pay(spark, rows), b)
        plain.process(_pay(spark, rows), b)
        live = [p for p in auto._index_partitions() if p != -9]
        by_level: dict[int, int] = {}
        for p in live:
            by_level[run_level(p)] = by_level.get(run_level(p), 0) + 1
        assert by_level.get(0, 0) <= 2  # <= compact_every fresh trees
        for level, n_runs in by_level.items():
            if level >= 1:
                assert n_runs < auto.fanout  # < fanout runs per level
    assert {tuple(r) for r in auto.dup_marks().collect()} == {
        tuple(r) for r in plain.dup_marks().collect()
    }


def test_phash_ingestor_audio_fingerprint_arm(spark, tmp_path):
    """The pluggable fingerprint makes the SAME ingestor a streaming
    AUDIO deduper: marks must equal the brute-force batch-prefix
    seniority rule over audio_fingerprint_stub hashes."""
    import struct

    from pyspark.sql import functions as F

    from flume_spark.operators import multimodal

    def tone(profile):
        out = []
        for a in profile:
            out += [a, -a] * 4
        return struct.pack(f"<{len(out)}h", *out).decode("ISO-8859-1")

    loud_quiet = [3000] * 16 + [10] * 16
    batches = [
        [(1, tone(loud_quiet)), (2, tone([10] * 16 + [3000] * 16))],
        [(3, tone([int(a * 0.9) for a in loud_quiet]))],  # re-encode of 1
        [(4, tone([2900] * 16 + [12] * 16))],             # near 1's envelope
    ]

    def audio_fp(pay):
        return multimodal.audio_fingerprint_stub(pay, n_windows=32).select(
            "id", F.col("ahash").alias("phash")
        )

    ing = _phash_ing(spark, tmp_path, fingerprint=audio_fp)
    for b, rows in enumerate(batches):
        ing.process(_pay(spark, rows), b)
    got = {r["id"]: r["dup_of"] for r in ing.dup_marks().collect()}

    # brute-force reference: batch-prefix seniority over collected hashes
    all_rows = [(i, t, b) for b, rs in enumerate(batches) for i, t in rs]
    fp = {
        r["id"]: r["phash"]
        for r in audio_fp(
            _pay(spark, [(i, t) for i, t, _ in all_rows])
        ).collect()
    }
    batch_of = {i: b for i, _, b in all_rows}
    want = {}
    for i in fp:
        seniors = [
            j
            for j in fp
            if (batch_of[j] < batch_of[i] or (batch_of[j] == batch_of[i] and j < i))
            and bin(fp[i] ^ fp[j]).count("1") <= 3
        ]
        want[i] = min(seniors) if seniors else None
    assert got == want
    assert want[3] == 1  # the re-encode is caught across batches


# -- FrameIngestor: streaming frame-containment video dedup --------------------


def _frame_ing(spark, tmp_path, tag="", **kw):
    from flume_spark.streaming.dedup import FrameIngestor

    return FrameIngestor(
        spark,
        index_dir=str(tmp_path / f"fidx{tag}"),
        marks_dir=str(tmp_path / f"fmarks{tag}"),
        ledger_dir=str(tmp_path / f"flg{tag}"),
        id_col="id",
        **kw,
    )


def _clip(w1, w2, w3, w4):
    # md5-derived window bytes: uncorrelated above-mean profiles, so
    # distinct seeds give distinct frame hashes (a linear-congruential
    # generator's windows share above-mean PATTERNS across seeds and
    # collide under the pHash rule)
    import hashlib

    def w(seed):
        raw = (
            hashlib.md5(f"frame{seed}a".encode()).digest()
            + hashlib.md5(f"frame{seed}b".encode()).digest()
        )
        return "".join(chr(33 + b % 90) for b in raw)

    return w(w1) + w(w2) + w(w3) + w(w4)


def test_frame_ingestor_clip_twins_across_batches(spark, tmp_path):
    """A re-encode arriving in a LATER batch dup_of's the senior clip;
    a half-overlapping clip (2 shared windows) passes at min_shared=3;
    within-batch seniority is lower-id; marks are pinned at ingest."""
    ing = _frame_ing(spark, tmp_path)
    b0 = [(1, _clip(1, 2, 3, 4)), (2, _clip(9, 8, 7, 6))]
    b1 = [(3, _clip(1, 2, 3, 4)),  # full re-encode of 1
          (4, _clip(1, 2, 30, 40))]  # shares only 2 windows with 1
    b2 = [(5, _clip(9, 8, 7, 60)),  # 3 of clip 2's windows
          (6, _clip(9, 8, 7, 60))]  # same-batch twin of 5
    for b, rows in enumerate([b0, b1, b2]):
        ing.process(_pay(spark, rows), b)
    marks = {r["id"]: r["dup_of"] for r in ing.dup_marks().collect()}
    # 6 dups 2, not its same-batch twin 5: dup_of is the SMALLEST senior
    # across both legs (history doc 2 contains it too)
    assert marks == {1: None, 2: None, 3: 1, 4: None, 5: 2, 6: 2}


def test_frame_ingestor_replay_and_compaction_converge(spark, tmp_path):
    """Crash-window replay re-marks identically (its own index partition
    excluded); compact_index folds acked trees without changing any
    existing or future verdict; quiesce guard blocks folding an unacked
    batch."""
    import os

    ing = _frame_ing(spark, tmp_path)
    twin = _frame_ing(spark, tmp_path, tag="_twin")
    b0 = [(1, _clip(1, 2, 3, 4)), (2, _clip(9, 8, 7, 6))]
    b1 = [(3, _clip(1, 2, 3, 4))]
    b2 = [(5, _clip(9, 8, 7, 6))]
    for b, rows in enumerate([b0, b1]):
        ing.process(_pay(spark, rows), b)
        twin.process(_pay(spark, rows), b)
    first = {tuple(r) for r in ing.dup_marks().collect()}

    # crash-window replay of batch 1
    os.remove(str(tmp_path / "flg") + "/batch-1.done")
    re_ing = _frame_ing(spark, tmp_path)
    re_ing.process(_pay(spark, b1), 1)
    assert {tuple(r) for r in re_ing.dup_marks().collect()} == first

    # fold, then the next batch marks exactly as the unfolded twin
    assert re_ing.compact_index() == 2
    assert {tuple(r) for r in re_ing.dup_marks().collect()} == first
    re_ing.process(_pay(spark, b2), 2)
    twin.process(_pay(spark, b2), 2)
    assert {tuple(r) for r in re_ing.dup_marks().collect()} == {
        tuple(r) for r in twin.dup_marks().collect()
    }
    marks = {r["id"]: r["dup_of"] for r in re_ing.dup_marks().collect()}
    assert marks[5] == 2  # senior found through the folded base

    # quiesce guard
    re_ing._process(_pay(spark, [(9, _clip(5, 5, 5, 5))]), 9)  # no marker
    with pytest.raises(RuntimeError, match="non-quiesced"):
        re_ing.compact_index()


def test_frame_ingestor_matches_batch_containment_rule(spark, tmp_path):
    """Single-batch ingest must reproduce frame_containment_pairs'
    keep-lowest verdicts exactly (same rule, seniority = id order)."""
    rows = [
        (1, _clip(1, 2, 3, 4)),
        (2, _clip(1, 2, 3, 40)),   # 3 shared -> dup of 1
        (3, _clip(50, 60, 70, 80)),
        (4, _clip(1, 2, 3, 4)),    # re-encode -> dup of 1
    ]
    ing = _frame_ing(spark, tmp_path)
    ing.process(_pay(spark, rows), 0)
    got = {r["id"]: r["dup_of"] for r in ing.dup_marks().collect()}

    pairs = multimodal.frame_containment_pairs(
        _pay(spark, rows), min_shared=3, max_df=None
    ).collect()
    want = {i: None for i, _ in rows}
    for r in pairs:
        a, b = r["doc_a"], r["doc_b"]
        want[b] = a if want[b] is None else min(want[b], a)
    assert got == want and want[2] == 1 and want[4] == 1


# -- property: WAV container round-trip ----------------------------------------


from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=60, deadline=None)
@given(
    samples=st.lists(
        st.integers(min_value=-32768, max_value=32767), min_size=1, max_size=64
    ),
    pre_chunk=st.binary(min_size=0, max_size=9),
)
def test_wav_round_trip_property(samples, pre_chunk):
    """Any int16 sample vector wrapped in a canonical WAV parses back to
    exactly its data chunk, regardless of extra well-formed chunks before
    `data`; and the raw PCM view of the parsed chunk equals the samples."""
    import numpy as np

    extra = b"LIST" + struct.pack("<I", len(pre_chunk)) + pre_chunk
    if len(pre_chunk) % 2:
        extra += b"\x00"  # RIFF word alignment
    wav = _wav_bytes(samples, extra_chunk=extra)
    data = multimodal.wav_pcm_data(wav)
    assert data == struct.pack(f"<{len(samples)}h", *samples)
    assert list(np.frombuffer(data, dtype="<i2").astype(int)) == samples


@settings(max_examples=60, deadline=None)
@given(blob=st.binary(min_size=0, max_size=128))
def test_wav_parser_never_crashes_property(blob):
    """Arbitrary bytes: the parser returns a bytes data-chunk or None,
    never raises — and anything without the full RIFF/WAVE + PCM-fmt +
    data structure is None (raw fallback)."""
    out = multimodal.wav_pcm_data(blob)
    assert out is None or isinstance(out, bytes)
    if not (blob[:4] == b"RIFF" and blob[8:12] == b"WAVE"):
        assert out is None


# -- audio_meta: typed audio metadata ------------------------------------------


def test_audio_meta_real_wav_and_raw_arms(spark):
    """A mono 8 kHz WAV reports its REAL rate/channels/frames/duration; a
    stereo WAV divides frames by the channel count; raw payloads take the
    stub view (mono @16 kHz, n_bytes // 2 samples); empty is not-ok."""
    mono = _wav_bytes([100, -100] * 40)  # 80 frames @ 8000 Hz -> 10 ms
    data = struct.pack("<64h", *([7, -7] * 32))  # 64 samples interleaved
    fmt = struct.pack("<HHIIHH", 1, 2, 44100, 176400, 4, 16)  # stereo 44.1k
    stereo = (
        b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(data)) + b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    raw = struct.pack("<32h", *range(32))
    rows = [
        (1, mono.decode("ISO-8859-1")),
        (2, stereo.decode("ISO-8859-1")),
        (3, raw.decode("ISO-8859-1")),
        (4, ""),
    ]
    got = {
        r["id"]: (
            r["sample_rate"], r["n_channels"], r["n_samples"],
            r["duration_ms"], r["ok"],
        )
        for r in multimodal.audio_meta(_pay(spark, rows)).collect()
    }
    assert got[1] == (8000, 1, 80, 1000 * 80 // 8000, True)
    assert got[2] == (44100, 2, 32, 1000 * 32 // 44100, True)  # 64 / 2 ch
    assert got[3] == (16000, 1, 32, 1000 * 32 // 16000, True)
    assert got[4] == (16000, 1, 0, 0, False)


# -- crash-safe fold swap (state.atomic_fold_swap / recover_fold) --------------


def test_lm_fold_crash_window_recovers_model(spark, tmp_path):
    """Simulate the one crash window of the fold protocol (between the
    two renames: live dir missing, .foldold holds pre-fold state): a
    restarted ingestor must heal it and report the EXACT same model —
    additive counts can afford neither loss nor double-count."""
    import os

    from flume_spark.streaming.lm import LmIngestor

    def mk():
        return LmIngestor(
            spark,
            state_dir=str(tmp_path / "st"),
            marks_dir=str(tmp_path / "mk"),
            ledger_dir=str(tmp_path / "lg"),
        )

    ing = mk()
    for b in range(3):
        ing.process(_lm_df(spark, _LM_BATCHES[b]), b)
    model = {tuple(r) for r in ing.model().collect()}

    big = str(tmp_path / "st" / "bigrams")
    os.rename(big, big + ".foldold")  # crash between rename 3 and 4
    healed = mk()
    assert {tuple(r) for r in healed.model().collect()} == model
    assert not os.path.isdir(big + ".foldold")
    # and a real fold still works afterwards, exactly
    assert healed.compact_state() > 0
    assert {tuple(r) for r in healed.model().collect()} == model


def test_phash_fold_crash_window_recovers_index(spark, tmp_path):
    """Same protocol on the fingerprint index: the rename-window crash is
    healed at construction, and marks of a post-recovery batch equal an
    uncrashed twin's."""
    import os

    ing = _phash_ing(spark, tmp_path)
    twin = _phash_ing(spark, tmp_path, tag="_twin")
    for b, rows in enumerate(_MEDIA_ROWS[:2]):
        ing.process(_pay(spark, rows), b)
        twin.process(_pay(spark, rows), b)
    idx = str(tmp_path / "idx")
    os.rename(idx, idx + ".foldold")  # crash between rename 3 and 4
    healed = _phash_ing(spark, tmp_path)
    healed.process(_pay(spark, _MEDIA_ROWS[2]), 2)
    twin.process(_pay(spark, _MEDIA_ROWS[2]), 2)
    assert {tuple(r) for r in healed.dup_marks().collect()} == {
        tuple(r) for r in twin.dup_marks().collect()
    }


def test_wav_fmt_rejects_insane_rates_and_channels(spark):
    """A 'well-formed' WAV declaring a rate >= 2^31, rate 0, or zero
    channels is rejected (raw fallback) instead of overflowing the INT32
    sample_rate column downstream — one hostile payload must degrade,
    not fail the Arrow task."""
    data = struct.pack("<8h", *([1] * 8))

    def wav_with(rate, n_ch):
        byte_rate = (rate * 2) % (1 << 32)  # header field is uint32
        fmt = struct.pack("<HHIIHH", 1, n_ch, rate, byte_rate, 2, 16)
        return (
            b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(data))
            + b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(data)) + data
        )

    assert multimodal.wav_fmt(wav_with(3_000_000_000 % (1 << 32), 1)) is None
    assert multimodal.wav_fmt(wav_with(0, 1)) is None
    assert multimodal.wav_fmt(wav_with(8000, 0)) is None
    assert multimodal.wav_fmt(wav_with(8000, 1)) is not None
    # the hostile payload flows through audio_meta on the STUB arm
    rows = [(1, wav_with(3_000_000_000 % (1 << 32), 1).decode("ISO-8859-1"))]
    got = multimodal.audio_meta(_pay(spark, rows)).collect()[0]
    assert (got["sample_rate"], got["n_channels"]) == (16000, 1)


def test_frame_ingestor_max_df_gates_ambient_hash_as_of_ingest(spark, tmp_path):
    """The streaming skew gate: an ambient window hash (carried by every
    doc) crosses max_df as history accumulates — from then on it stops
    counting toward containment, while pair-specific windows still
    match.  Marks stay one-row-per-doc even for fully-gated docs."""
    def clip4(a, b, c, d):
        return _clip(a, b, c, d)

    gated = _frame_ing(
        spark, tmp_path, tag="_g", min_shared=2, max_df=3
    )
    plain = _frame_ing(spark, tmp_path, tag="_p", min_shared=2)
    b0 = [(1, clip4(100, 1, 2, 3)), (2, clip4(100, 9, 8, 7))]
    # batch 1: df(w100) = {3,4} + {1,2} = 4 > 3 -> ambient, gated;
    # df(w2) = {3,4} + {1} = 3 stays under the cap
    b1 = [(3, clip4(100, 1, 2, 30)),   # shares w1,w2 with doc 1 -> dup anyway
          (4, clip4(100, 50, 2, 60))]  # amb + w2 only: dup ONLY if amb counts
    for b, rows in enumerate([b0, b1]):
        gated.process(_pay(spark, rows), b)
        plain.process(_pay(spark, rows), b)
    g = {r["id"]: r["dup_of"] for r in gated.dup_marks().collect()}
    p = {r["id"]: r["dup_of"] for r in plain.dup_marks().collect()}
    assert g[3] == 1 and p[3] == 1        # real twin caught either way
    assert g[4] is None and p[4] == 1     # ambient-only pair gated out
    assert set(g) == {1, 2, 3, 4}          # marks keep every ingested doc
