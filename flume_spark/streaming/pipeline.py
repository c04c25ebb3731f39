"""PipelineRunner — live job processing via Structured Streaming.

Reference topology: per-pipeline GenStage chain (Producer → ProducerConsumer
→ ConsumerSupervisor → Workers) polling Redis every 2 s with demand-driven
fetch (lib/flume/pipeline/event/producer.ex:16-17,117-152).

Spark shape: one streaming query per pipeline.  `readStream` over the job
log is the arrival signal; each micro-batch invokes the same transactional
`QueueManager.run_once` the batch path uses (claim → dispatch → ack).
Admission control:
- poll cadence    ≙ Trigger.ProcessingTime (default 2 s, like @default_interval)
- max_demand      ≙ the claim LIMIT inside run_once
- maxFilesPerTrigger bounds arrival processing per micro-batch
- rate limiting   ≙ the driver-side sliding-window governor in run_once

Exactly-once: Spark checkpoints the stream progress; run_once itself is
at-least-once per job (claim records + visibility timeout reclaim), the
same guarantee the reference provides (processing zset + requeue —
SURVEY.md §2.8 ST2).
"""

from __future__ import annotations

import threading

from pyspark.sql import SparkSession

from flume_spark.queue.manager import Pipeline, QueueManager
from flume_spark.queue.schema import JOB_LOG_SCHEMA


class PipelineRunner:
    """Runs one pipeline as a streaming query over the job log."""

    def __init__(
        self,
        spark: SparkSession,
        manager: QueueManager,
        pipeline: Pipeline,
        checkpoint_dir: str,
        trigger_seconds: float = 2.0,
        max_files_per_trigger: int = 100,
    ):
        self.spark = spark
        self.manager = manager
        self.pipeline = pipeline
        self.checkpoint_dir = checkpoint_dir
        self.trigger_seconds = trigger_seconds
        self.max_files_per_trigger = max_files_per_trigger
        self.query = None
        self._lock = threading.Lock()
        self.batches_run = 0

    def _on_batch(self, batch_df, batch_id: int) -> None:
        # The arriving records are only the wake-up signal; run_once reads
        # authoritative state from the store so replays are harmless.
        with self._lock:
            if self.manager.is_paused(self.pipeline):
                return  # F3 pause gate (producer.ex:111-115): skip fetch
            self.manager.run_once(self.pipeline)
            self.batches_run += 1

    def start(self):
        stream = (
            self.spark.readStream.schema(JOB_LOG_SCHEMA)
            .option("maxFilesPerTrigger", str(self.max_files_per_trigger))
            .parquet(self.manager.store.path)
        )
        self.query = (
            stream.writeStream.queryName(f"flume_{self.pipeline.name}")
            .option("checkpointLocation", self.checkpoint_dir)
            .trigger(processingTime=f"{self.trigger_seconds} seconds")
            .foreachBatch(self._on_batch)
            .start()
        )
        return self.query

    def stop(self) -> None:
        """ST6 pause semantics: stop fetching; the in-flight micro-batch
        completes first (query.stop waits for the active batch)."""
        if self.query is not None:
            self.query.stop()

    def await_idle(self, timeout_s: float = 30.0) -> None:
        self.query.processAllAvailable()
