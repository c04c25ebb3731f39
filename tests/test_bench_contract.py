"""Bench output-record contract (no Spark needed).

BENCH_r04.json went `"parsed": null` because the final stdout line embedded
the full per-sample record and outgrew the driver's bounded tail capture
(2000 chars).  These tests pin the two-line contract so the failure mode
cannot regress silently as the headline suite grows.
"""

from __future__ import annotations

import importlib.util
import json
import sys
from pathlib import Path

# import bench.py without triggering a Spark session (module-level code only
# reads env vars)
_spec = importlib.util.spec_from_file_location(
    "bench", str(Path(__file__).resolve().parent.parent / "bench.py")
)
bench = importlib.util.module_from_spec(_spec)
sys.modules.setdefault("bench", bench)
_spec.loader.exec_module(bench)

# the driver's tail capture observed in BENCH_r0{3,4}.json
DRIVER_TAIL_CHARS = 2000


def _representative_records():
    """Timings/samples shaped like a real run: every headline entry plus
    the queue and latency keys, worst-case float widths (xx.xxx)."""
    names = list(bench.HEADLINE) + [
        "queue_enqueue",
        "queue_process",
        "queue_interleaved",
        "queue_stream_latency_p50",
        "queue_stream_latency_p95",
    ]
    timings = {n: 99.999 for n in names}
    samples = {n: [99.999, 99.999, 99.999] for n in names}
    return timings, samples


def test_final_line_is_compact_and_parseable():
    timings, samples = _representative_records()
    samples_line, shard_line, final_line = bench.emit_records(
        timings, samples, "0.1"
    )
    rec = json.loads(final_line)
    assert set(rec) == {"metric", "value", "unit", "queries", "sf"}
    assert "samples" not in rec, "samples must NEVER ride the final line"
    # round-7 shard: the SHARDED overflow entries ride their own non-final
    # line; final-line queries + overflow together cover every timing
    overflow = json.loads(shard_line)["queries_overflow"]
    assert set(overflow) == set(bench.SHARDED)
    assert set(rec["queries"]) | set(overflow) == set(timings)
    assert not set(rec["queries"]) & set(overflow)
    # the whole official record must survive a bounded tail capture with
    # headroom for ~10 more headline entries (~30 chars each) before anyone
    # has to think; when this fires, GROW the shard (move more near-duplicate
    # no-baseline entries into SHARDED) rather than shaving the margin
    assert len(final_line) <= DRIVER_TAIL_CHARS - 300, (
        f"final line {len(final_line)} chars — approaching the driver's "
        f"{DRIVER_TAIL_CHARS}-char tail capture; grow the SHARDED overflow"
    )
    # samples stay fully recoverable from their own line — INCLUDING the
    # sharded entries (the sidecar mirrors this line verbatim)
    assert json.loads(samples_line)["samples"] == samples


def test_sharded_entries_are_still_timed():
    """Sharding must never silently drop an entry from the run itself."""
    assert set(bench.SHARDED) <= set(bench.HEADLINE)


def test_final_line_total_is_sum_of_mins():
    timings = {"a": 1.0, "b": 2.5}
    _, _, final_line = bench.emit_records(timings, {"a": [1.0], "b": [2.5]}, "0.01")
    assert json.loads(final_line)["value"] == 3.5


def test_final_line_total_includes_overflow():
    """The headline total stays like-for-like with pre-shard rounds: it
    sums ALL entries, sharded ones included."""
    name = bench.SHARDED[0]
    timings = {"a": 1.0, name: 2.0}
    _, shard_line, final_line = bench.emit_records(
        timings, {k: [v] for k, v in timings.items()}, "0.01"
    )
    rec = json.loads(final_line)
    assert rec["value"] == 3.0
    assert name not in rec["queries"]
    assert json.loads(shard_line)["queries_overflow"][name] == 2.0
