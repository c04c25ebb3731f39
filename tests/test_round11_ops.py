"""Round-11 operator tests.

Covers:
- PerceptronIngestor hardening: snapshot GC keep-window, fsync-backed
  raise-on-missing-acked-snapshot recovery, sequential-contract
  enforcement, in-session crash-window replay determinism.
"""

from __future__ import annotations

import json
import os

import pytest


def _mk_batch(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string, y int")


BATCHES = [
    [(1, "good clean text", 1), (2, "spam junk text", 0)],
    [(3, "good clean prose", 1), (4, "junk noise spam", 0)],
    [(5, "clean good words", 1), (6, "noise junk blob", 0)],
    [(7, "prose words clean", 1)],
    [(8, "junk spam junk", 0), (9, "good text prose", 1)],
    [(10, "clean clean clean", 1)],
]


def test_perceptron_snapshot_gc_bounds_state_dir(spark, tmp_path):
    """A long stream must hold a bounded snapshot directory: only the
    newest keep_snapshots acked snapshots (plus the in-flight one)
    survive, and crash-window recovery is still green afterwards."""
    from flume_spark.streaming.classifier import PerceptronIngestor

    st, lg = str(tmp_path / "st"), str(tmp_path / "lg")
    ing = PerceptronIngestor(spark, state_dir=st, ledger_dir=lg, keep_snapshots=2)
    for b, rows in enumerate(BATCHES):
        ing.process(_mk_batch(spark, rows), b)

    snaps = sorted(
        int(f[len("weights-") : -len(".json")])
        for f in os.listdir(st)
        if f.startswith("weights-")
    )
    # newest 2 acked (3, 4) + the just-written batch 5; 0..2 pruned
    assert snaps == [3, 4, 5]

    # crash window on the newest batch: marker lost, snapshot kept
    final = list(ing.weights)
    os.remove(f"{lg}/batch-5.done")
    fresh = PerceptronIngestor(
        spark, state_dir=st, ledger_dir=lg, keep_snapshots=2
    )
    with open(f"{st}/weights-4.json") as fh:
        assert fresh.weights == [int(x) for x in json.load(fh)]
    fresh.process(_mk_batch(spark, BATCHES[5]), 5)
    assert fresh.weights == final


def test_perceptron_raises_on_missing_acked_snapshot(spark, tmp_path):
    """The newest ACKED snapshot going missing is corruption (it is
    fsync'd before the marker), not a crash window — recovery must raise
    loudly instead of silently regressing to an older model while the
    ledger suppresses the batch's replay."""
    from flume_spark.streaming.classifier import PerceptronIngestor

    st, lg = str(tmp_path / "st"), str(tmp_path / "lg")
    ing = PerceptronIngestor(spark, state_dir=st, ledger_dir=lg)
    for b, rows in enumerate(BATCHES[:2]):
        ing.process(_mk_batch(spark, rows), b)
    os.remove(f"{st}/weights-1.json")  # marker batch-1.done still present

    with pytest.raises(RuntimeError, match="no weights snapshot"):
        PerceptronIngestor(spark, state_dir=st, ledger_dir=lg)


def test_perceptron_rejects_out_of_order_batch(spark, tmp_path):
    """The sequential contract is enforced, not just documented: a batch
    id that is neither next-expected nor the newest-unacked replay
    raises instead of silently diverging from the batch-prefix oracle."""
    from flume_spark.streaming.classifier import PerceptronIngestor

    st, lg = str(tmp_path / "st"), str(tmp_path / "lg")
    ing = PerceptronIngestor(spark, state_dir=st, ledger_dir=lg)
    ing.process(_mk_batch(spark, BATCHES[0]), 0)
    with pytest.raises(RuntimeError, match="out-of-order batch 3"):
        ing.process(_mk_batch(spark, BATCHES[1]), 3)  # skipped 1, 2
    # a stale id with an existing marker is ledger-skipped, not an error
    before = list(ing.weights)
    ing.process(_mk_batch(spark, BATCHES[0]), 0)
    assert ing.weights == before


def test_perceptron_in_session_replay_recomputes_from_prev(spark, tmp_path):
    """Marker write lost AFTER _process succeeded, same live object: the
    replayed id must recompute from the pre-batch weights (not
    double-apply) and land byte-identical state."""
    from flume_spark.streaming.classifier import PerceptronIngestor

    st, lg = str(tmp_path / "st"), str(tmp_path / "lg")
    ing = PerceptronIngestor(spark, state_dir=st, ledger_dir=lg)
    ing.process(_mk_batch(spark, BATCHES[0]), 0)
    ing.process(_mk_batch(spark, BATCHES[1]), 1)
    final = list(ing.weights)
    os.remove(f"{lg}/batch-1.done")  # marker lost; object still live
    ing.process(_mk_batch(spark, BATCHES[1]), 1)  # streaming replays id 1
    assert ing.weights == final
    with open(f"{st}/weights-1.json") as fh:
        assert [int(x) for x in json.load(fh)] == final
    # and the lineage continues normally afterwards
    ing.process(_mk_batch(spark, BATCHES[2]), 2)
