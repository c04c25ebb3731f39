"""Telemetry — reference parity for lib/flume/instrumentation.ex:1-40 and
the event points at queue/manager.ex:23-27,45-49, pipeline/event/
producer.ex:158-164, pipeline/event/worker.ex:37-42,57-67 (SURVEY.md §2.10).

The reference emits :telemetry events ([:queue,:enqueue]{payload_size},
[:queue,:dequeue]{count,latency,payload_size}, [:pipeline,:worker]{duration});
here handlers attach to a Telemetry bus the QueueManager emits into, and a
StreamingListener bridges Structured Streaming progress (numInputRows,
batch durations) onto the same bus — the Spark-native analog of attaching
telemetry to the producer stage.

Measurement collection is piggy-backed on actions the trigger already runs
(the ack outcome aggregation carries sum(duration_ms)); no extra Spark jobs.
"""

from __future__ import annotations

import logging
import time
from collections.abc import Callable
from dataclasses import dataclass, field

logger = logging.getLogger("flume_spark")

Handler = Callable[[tuple[str, ...], dict, dict], None]


@dataclass
class Telemetry:
    """In-process telemetry bus.  attach() a handler; emit() fans out.

    Handler signature: (event, measurements, metadata) — mirroring
    :telemetry.execute/3.  Handlers must not raise; failures are logged and
    dropped (the reference detaches crashing handlers; we isolate instead).
    """

    handlers: list[Handler] = field(default_factory=list)
    events: list[tuple[tuple[str, ...], dict, dict]] = field(default_factory=list)
    keep_events: bool = False

    def attach(self, handler: Handler) -> None:
        self.handlers.append(handler)

    def emit(
        self, event: tuple[str, ...], measurements: dict, metadata: dict | None = None
    ) -> None:
        metadata = metadata or {}
        if self.keep_events:
            self.events.append((event, measurements, metadata))
        for h in self.handlers:
            try:
                h(event, measurements, metadata)
            except Exception:  # noqa: BLE001 — handler isolation
                logger.exception("telemetry handler failed for %s", event)

    def span(self, event: tuple[str, ...], metadata: dict | None = None):
        """Context manager emitting `event + ('stop',)` with duration_ms."""
        return _Span(self, event, metadata or {})


class _Span:
    def __init__(self, bus: Telemetry, event: tuple[str, ...], metadata: dict):
        self.bus, self.event, self.metadata = bus, event, metadata

    def __enter__(self):
        self.t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        dur = (time.perf_counter() - self.t0) * 1000.0
        self.bus.emit(self.event + ("stop",), {"duration_ms": dur}, self.metadata)
        return False


def attach_streaming_listener(spark, telemetry: Telemetry):
    """Bridge StreamingQueryListener progress onto the telemetry bus
    ([:pipeline, :progress] with rows/sec — ≙ producer-stage telemetry)."""
    from pyspark.sql.streaming import StreamingQueryListener

    class _Listener(StreamingQueryListener):
        def onQueryStarted(self, event):
            telemetry.emit(("pipeline", "started"), {}, {"name": event.name})

        def onQueryProgress(self, event):
            p = event.progress
            telemetry.emit(
                ("pipeline", "progress"),
                {
                    "numInputRows": p.numInputRows,
                    "inputRowsPerSecond": p.inputRowsPerSecond or 0.0,
                },
                {"name": p.name},
            )

        def onQueryTerminated(self, event):
            telemetry.emit(("pipeline", "terminated"), {}, {"id": str(event.id)})

        def onQueryIdle(self, event):
            pass

    listener = _Listener()
    spark.streams.addListener(listener)
    return listener
