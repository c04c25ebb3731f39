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


def test_spread_record_is_min_median_max_of_observed_samples():
    spread = bench.spread_record({"a": [3.0, 1.0, 2.0], "b": [5.0]})
    assert spread == {"a": [1.0, 2.0, 3.0], "b": [5.0, 5.0, 5.0]}
    # even-length: the lower-middle order statistic (an observed sample)
    assert bench.spread_record({"c": [4.0, 1.0, 3.0, 2.0]})["c"] == [1.0, 2.0, 4.0]


def test_drift_tripwire_catches_synthetic_slowdown():
    """Round-13 VERDICT item 5: a >1.5x min-drift must be flagged."""
    bands = {"fast": 1.0, "ok": 2.0, "tiny": 0.18}
    mins = {"fast": 1.6, "ok": 2.9, "tiny": 0.28, "new_entry": 9.9}
    drifted = bench.check_drift(mins, bands)
    names = [r[0] for r in drifted]
    assert "fast" in names  # 1.6x > 1.5x -> flagged
    assert "ok" not in names  # 1.45x -> inside the band
    # sub-noise-floor bands cannot fire on scheduler wobble
    assert "tiny" not in names
    # entries with no recorded band are skipped, not errors
    assert "new_entry" not in names
    fast = next(r for r in drifted if r[0] == "fast")
    assert fast[1:] == (1.6, 1.0, 1.6)


def test_drift_tripwire_clean_run_passes():
    assert bench.check_drift({"a": 1.4}, {"a": 1.0}) == []


def test_bands_file_covers_every_recorded_entry():
    """bench_bands.json exists and carries a band for the headline suite
    (new-this-round entries may lag one round — they earn a band when first
    recorded)."""
    bands_path = Path(__file__).resolve().parent.parent / "bench_bands.json"
    bands = json.loads(bands_path.read_text())
    assert len(bands) > 80
    missing = set(bench.HEADLINE) - set(bands)
    # allow only entries introduced this round (no recorded run yet)
    assert len(missing) <= 8, f"stale bands file — missing {sorted(missing)}"
    for v in bands.values():
        assert isinstance(v, (int, float)) and v > 0


def test_plan_delta_note_distinguishes_plan_from_host():
    """The round-14 forensics split: a drifted entry whose EXECUTED node
    counts moved vs the committed record reads PLAN-DELTA (runtime
    regression); unchanged counts read time-only (host); a missing record
    on either side is explicit, never a silent pass."""
    rec = {"q": {"smj": 2, "bhj": 4, "exch": 10}}
    exp = {"q": {"smj": 0, "bhj": 6, "exch": 10}}
    note = bench.plan_delta_note("q", rec, exp)
    assert note.startswith("PLAN-DELTA")
    assert "smj:0->2" in note and "bhj:6->4" in note and "exch" not in note
    same = bench.plan_delta_note("q", exp, exp)
    assert same.startswith("time-only")
    assert bench.plan_delta_note("missing", rec, exp) == "no-plan-record"


def test_check_main_reads_multiline_sidecar(tmp_path, monkeypatch):
    """--check must recover samples AND plans from the sidecar regardless
    of line order, and annotate each drifted row."""
    sidecar = tmp_path / "bench_samples.json"
    sidecar.write_text(
        json.dumps({"samples": {"q": [9.0, 9.5]}})
        + "\n"
        + json.dumps({"spread": {"q": [9.0, 9.2, 9.5]}})
        + "\n"
        + json.dumps({"plans": {"q": {"smj": 2, "bhj": 0}}})
        + "\n"
    )
    bands = tmp_path / "bench_bands.json"
    bands.write_text(json.dumps({"q": 1.0}))
    plans = tmp_path / "bench_plans.json"
    plans.write_text(json.dumps({"q": {"smj": 0, "bhj": 2}}))
    monkeypatch.setenv("SPARK_GRAFT_BENCH_SIDECAR", str(sidecar))
    monkeypatch.setenv("SPARK_GRAFT_BENCH_BANDS", str(bands))
    monkeypatch.setenv("SPARK_GRAFT_BENCH_PLANS", str(plans))
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        rc = bench.check_main()
    out = buf.getvalue()
    assert rc == 1
    assert "DRIFT q" in out and "PLAN-DELTA" in out and "smj:0->2" in out


def test_record_plans_promotes_sidecar(tmp_path, monkeypatch):
    sidecar = tmp_path / "bench_samples.json"
    sidecar.write_text(json.dumps({"plans": {"q": {"smj": 0}}}) + "\n")
    plans = tmp_path / "bench_plans.json"
    monkeypatch.setenv("SPARK_GRAFT_BENCH_SIDECAR", str(sidecar))
    monkeypatch.setenv("SPARK_GRAFT_BENCH_PLANS", str(plans))
    import contextlib
    import io

    with contextlib.redirect_stdout(io.StringIO()):
        assert bench.record_plans_main() == 0
    assert json.loads(plans.read_text()) == {"q": {"smj": 0}}
