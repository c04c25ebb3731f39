"""Effectively-once foreachBatch sinks via a batch-id ledger.

Structured Streaming's contract is at-least-once for arbitrary foreachBatch
writers: after a crash between the sink write and the checkpoint commit,
the SAME (batch_id, data) is replayed.  The standard upgrade (Spark docs'
"use batchId to deduplicate") is to make the writer idempotent per
batch_id.  This module packages that: a marker ledger skips batches already
fully written, and the writer is handed a deterministic per-batch location
so a half-written batch is overwritten in place on replay rather than
appended twice.

At scale the ledger is one tiny marker file per micro-batch (prunable
below any retention horizon); on Delta the equivalent is the
txnAppId/txnVersion idempotent-write option.
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame


def idempotent_foreach_batch(
    write_fn: Callable[[DataFrame, int], None],
    ledger_dir: str,
) -> Callable[[DataFrame, int], None]:
    """Wrap a foreachBatch writer so replayed batch_ids are no-ops.

    `write_fn(df, batch_id)` must be deterministic-per-batch (write to a
    location derived from batch_id, or overwrite): the marker is committed
    only AFTER write_fn returns, so a crash mid-write leaves the batch
    unmarked and the replay re-runs write_fn over the same data.

    LIFECYCLE CONTRACT: `ledger_dir` must live and die with the query's
    CHECKPOINT — batch_ids are only unique within one checkpoint lineage.
    Resetting the checkpoint while keeping the ledger makes restarted
    batch_ids 0..N collide with old markers and silently drop new data;
    sharing one ledger_dir between two queries does the same.  One ledger
    per (query, checkpoint), deleted together.  (Delta's txnAppId/
    txnVersion option carries the same per-writer scoping.)
    """
    os.makedirs(ledger_dir, exist_ok=True)

    def wrapped(df: DataFrame, batch_id: int) -> None:
        marker = os.path.join(ledger_dir, f"batch-{batch_id}.done")
        if os.path.exists(marker):
            return
        write_fn(df, batch_id)
        with open(marker, "w") as fh:
            fh.write("done")

    return wrapped
