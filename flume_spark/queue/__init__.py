"""The job queue engine — Spark-first rebuild of scripbox/flume's core.

Reference model (see SURVEY.md §1): Redis lists/zsets hold serialized JSON
jobs; GenStage pipelines pull, execute, ack/retry.  Our model: a
**log-structured jobs table** (append-only parquet; Delta/Iceberg in
production for ACID + compaction) where every state transition appends a new
record and current state is last-writer-wins per jid.  Structured-Streaming
micro-batches (or synchronous `run_once` triggers) claim due jobs, dispatch
them to registered Python workers via Arrow batches, and append the
resulting status records.

Why log-structured at 100 TB: status flips never rewrite data files, claims
are a bounded ordered-take per trigger, and state reconstruction is one
window function that partition-prunes on jid buckets.  Compaction
(`JobStore.compact`) bounds read amplification.
"""

from flume_spark.queue.backend import LogBackend
from flume_spark.queue.manager import QueueManager
from flume_spark.queue.optimistic import OptimisticLogStore
from flume_spark.queue.store import JobStore
from flume_spark.queue.workers import WorkerRegistry

__all__ = [
    "LogBackend",
    "QueueManager",
    "JobStore",
    "OptimisticLogStore",
    "WorkerRegistry",
]
