"""flume_spark — a PySpark-native rebuild of the capabilities of scripbox/flume.

The reference (/root/reference, scripbox/flume) is a Redis-backed,
GenStage-driven job-processing system.  This package re-expresses that
capability surface Spark-first:

- ``flume_spark.queue``     — the job table + queue manager (enqueue /
  dequeue-claim / ack / retry / DLQ / scheduled promotion), modeled as a
  log-structured parquet table instead of Redis lists/zsets
  (reference: lib/flume/queue/manager.ex).
- ``flume_spark.streaming`` — Structured-Streaming pipeline runner with
  demand control and the sliding-window rate-limit governor
  (reference: lib/flume/pipeline/*, lib/flume/redis/bulk_dequeue.ex).
- ``flume_spark.operators`` — relational + LLM-data-pipeline operators
  (dedup, similarity search, text analysis, multimodal plumbing).
- ``flume_spark.functions`` — scalar expression helpers mirroring the
  reference's support functions (backoff, time math, md5 ledger keys).

Everything is DataFrame/Catalyst-first; Python UDFs only where built-ins
genuinely cannot express the semantics (and then Arrow-vectorized).
"""

from flume_spark.app import FlumeApp, from_config
from flume_spark.session import get_spark

__all__ = ["FlumeApp", "from_config", "get_spark"]
__version__ = "0.1.0"
