"""Streaming SCD Type-2 ingest — a foreachBatch handler that folds each
micro-batch of attribute-change events into the persisted RAW event-log
store (`operators/scd.py`; history collapses on read, compaction is
watermark-gated), the dimension-maintenance sibling of LshIngestor /
EdgeIngestor.

Exactly-once needs LESS machinery here than the edge index, because
`scd2_merge` is IDEMPOTENT and ORDER-FREE: the store is a set union of
events, so re-merging an already-folded batch is a no-op (hypothesis
property tests in tests/test_round6b_ops.py).  So the layers are:
1. the batch-id ledger (streaming/sink.py) skips cleanly-committed
   batches without touching the store;
2. for the crash window below the ledger, `scd2_heal` first restores any
   bucket parked mid-swap (the merge runs with `swap_commit=True`, so
   every bucket is always a complete old or new state, never a partial
   file set), then the batch simply re-merges — idempotency does the
   rest.  No partial-partition drop step exists because no state the
   heal can produce is partial.

No reference analog (the reference moves opaque payloads; SURVEY.md
§2.5) — engine-native streaming-warehouse surface.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame


class Scd2Ingestor:
    """Usage:
        ing = Scd2Ingestor(spark, path, ledger_dir,
                           key="user_id", attr="tier", ts="ts",
                           tiebreak="event_id", n_buckets=32)
        stream.writeStream.foreachBatch(ing.process).start()
        ...
        ing.history()   # SCD2 view: key, version, attr, valid_from/to
    """

    def __init__(
        self,
        spark,
        path: str,
        ledger_dir: str,
        key: str,
        attr: str,
        ts: str,
        tiebreak: str,
        n_buckets: int = 32,
    ) -> None:
        from flume_spark.operators.scd import scd2_heal
        from flume_spark.streaming.sink import idempotent_foreach_batch

        self.spark = spark
        self.path = path
        self.key, self.attr, self.ts, self.tiebreak = key, attr, ts, tiebreak
        self.n_buckets = n_buckets
        scd2_heal(path)  # recover anything a crashed run left parked
        self.process = idempotent_foreach_batch(self._process, ledger_dir)

    def _process(self, batch_df: DataFrame, batch_id: int) -> None:
        from flume_spark.operators import scd

        if batch_df.isEmpty():
            return
        scd.scd2_heal(self.path)
        args = (self.key, self.attr, self.ts, self.tiebreak)
        if not self._has_committed_data():
            # first write, or a replay of a first write that crashed.  The
            # branch condition is COMMITTED DATA (a pbucket= dir), never a
            # bare isdir: a crash inside the first write can leave the dir
            # with only _temporary litter, and a merge against that would
            # fail schema inference forever — the write arm's overwrite
            # clears it.  If the crash DID commit some buckets, the merge
            # arm below converges instead: every visible row derives from
            # this same batch (the committer only exposes task-complete
            # files), and set-union merge makes (subset ∪ batch) == batch
            scd.scd2_write(
                self.spark, self.path, batch_df, *args, n_buckets=self.n_buckets
            )
            return
        scd.scd2_merge(
            self.spark,
            self.path,
            batch_df,
            *args,
            n_buckets=self.n_buckets,
            swap_commit=True,
        )

    def _has_committed_data(self) -> bool:
        from flume_spark.operators.scd import BUCKET

        if not os.path.isdir(self.path):
            return False
        return any(d.startswith(f"{BUCKET}=") for d in os.listdir(self.path))

    def compact(self, watermark) -> None:
        """Collapse the settled prefix (event ts < `watermark`) to change
        rows — the maintenance pass bounding log growth for chatty keys.
        The caller promises no future batch delivers an event below the
        watermark (the same contract as withWatermark); see
        operators/scd.scd2_compact.  Run between triggers — the pass
        swaps the whole store directory, so it must not race a merge
        (single-writer, like band-index compaction)."""
        from flume_spark.operators.scd import scd2_compact

        scd2_compact(
            self.spark, self.path, watermark,
            self.key, self.attr, self.ts, self.tiebreak,
            n_buckets=self.n_buckets,
        )

    def history(self) -> DataFrame:
        from flume_spark.operators.scd import scd2_read_history

        return scd2_read_history(
            self.spark, self.path, self.key, self.attr, self.ts, self.tiebreak
        )
