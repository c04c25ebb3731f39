"""Job record schema — Flume's Event (reference: lib/flume/event.ex:24-54)
plus the queue-state columns our table-based design needs (FIXTURES.md §1).

`args` stays a raw JSON string so arbitrary payloads round-trip exactly
(the reference keeps the original JSON for the same reason —
lib/flume/event.ex:57).  Parse with `from_json` only when a worker needs
typed access.
"""

from __future__ import annotations

from pyspark.sql import types as T

# Lifecycle states (reference semantics: pending list / processing zset /
# retry zset / dead zset — lib/flume/queue/manager.ex:267-287).
PENDING = "pending"
PROCESSING = "processing"
SUCCEEDED = "succeeded"
RETRY = "retry"
DEAD = "dead"

JOB_LOG_SCHEMA = T.StructType(
    [
        # identity + payload (event.ex:24-38)
        T.StructField("jid", T.StringType(), False),
        T.StructField("queue", T.StringType(), False),
        T.StructField("class", T.StringType(), False),
        T.StructField("function", T.StringType(), False),
        T.StructField("args", T.StringType(), False),  # raw JSON array text
        T.StructField("context", T.MapType(T.StringType(), T.StringType()), True),
        # lifecycle (event.ex:46-52 + our status/lease columns)
        T.StructField("status", T.StringType(), False),
        T.StructField("retry_count", T.IntegerType(), False),
        T.StructField("enqueued_at", T.TimestampType(), False),
        T.StructField("scheduled_at", T.TimestampType(), True),
        T.StructField("leased_at", T.TimestampType(), True),
        T.StructField("retry_at", T.TimestampType(), True),
        T.StructField("finished_at", T.TimestampType(), True),
        T.StructField("failed_at", T.TimestampType(), True),
        T.StructField("error_message", T.StringType(), True),
        T.StructField("error_backtrace", T.StringType(), True),
        # log ordering: strictly increasing per writer; last wins per jid
        T.StructField("seq", T.LongType(), False),
    ]
)

# Dispatch result rows coming back from executor workers.
DISPATCH_RESULT_SCHEMA = (
    "jid string, ok boolean, error_message string, error_backtrace string, "
    "duration_ms double"
)
