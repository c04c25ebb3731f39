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

    Named handlers (`attach_named`/`detach`) mirror :telemetry.attach_many
    as the reference uses it per pipeline (pipeline/event.ex:6-28 +
    instrumentation/event_handler.ex): a handler id bound to an explicit
    event list, receiving a 4th `config` argument, detachable by id.
    """

    handlers: list[Handler] = field(default_factory=list)
    named: dict[str, tuple[frozenset[tuple[str, ...]], Callable, object]] = field(
        default_factory=dict
    )
    events: list[tuple[tuple[str, ...], dict, dict]] = field(default_factory=list)
    keep_events: bool = False

    def attach(self, handler: Handler) -> None:
        self.handlers.append(handler)

    def attach_named(
        self,
        handler_id: str,
        events: list[tuple[str, ...]],
        handler: Callable[[tuple[str, ...], dict, dict, object], None],
        config: object = None,
    ) -> bool:
        """Attach `handler` under `handler_id` for exactly `events`.
        Returns False if the id is already attached (:telemetry returns
        {:error, :already_exists}); the existing handler is kept."""
        if handler_id in self.named:
            return False
        self.named[handler_id] = (frozenset(tuple(e) for e in events), handler, config)
        return True

    def detach(self, handler_id: str) -> bool:
        """Detach by id; False if it was not attached (≙ {:error, :not_found})."""
        return self.named.pop(handler_id, None) is not None

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
        for hid, (evset, h, config) in list(self.named.items()):
            if event not in evset:
                continue
            try:
                h(event, measurements, metadata, config)
            except Exception:  # noqa: BLE001 — handler isolation
                logger.exception("telemetry handler %r failed for %s", hid, event)

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


def default_event_handler(
    event: tuple[str, ...], measurements: dict, metadata: dict, config: object = None
) -> None:
    """The DefaultEventHandler analog (instrumentation/
    default_event_handler.ex): log '<app_name>/<event-path> - <value>' per
    measurement at INFO.  `config` may carry {'app_name': ...} like the
    reference's `metadata: [app_name: :flume]` config entry."""
    app = None
    if isinstance(config, dict):
        app = config.get("app_name")
    prefix = f"{app}/" if app else ""
    path = "/".join(event)
    for key, value in measurements.items():
        logger.info("%s%s/%s - %s", prefix, path, key, value)


# The event names a pipeline's instrumentation observes — the repo analog of
# the four names attach_instrumentation subscribes per pipeline
# (pipeline/event.ex:10-18: [name,:worker], [name,:worker,:job],
# [queue,:enqueue], [queue,:dequeue]).
PIPELINE_EVENTS: list[tuple[str, ...]] = [
    ("queue", "enqueue"),
    ("queue", "dequeue"),
    ("pipeline", "worker"),
]


def attach_pipeline_instrumentation(
    telemetry: Telemetry,
    pipeline,
    handler: Callable[[tuple[str, ...], dict, dict, object], None] | None = None,
    config: object = None,
) -> bool:
    """Attach a named per-pipeline handler (≙ EventPipeline.
    attach_instrumentation, pipeline/event.ex:6-28): handler id is the
    pipeline name, events are PIPELINE_EVENTS, and the handler only sees
    events whose metadata involves the pipeline's queue (the reference gets
    this scoping from per-pipeline event NAMES; the bus here emits shared
    names with queue metadata, so the filter lives in the wrapper).
    Respects `instrument: false` (pipeline.ex) by not attaching.
    Detach with telemetry.detach(pipeline.name)."""
    if not getattr(pipeline, "instrument", True):
        return False
    fn = handler or default_event_handler
    queue = pipeline.queue

    def scoped(event, measurements, metadata, cfg):
        queues = metadata.get("queues")
        if queues is not None and queue not in queues:
            return
        if metadata.get("queue") not in (None, queue) and queues is None:
            return
        # aggregate events carry a per-queue breakdown: deliver THIS
        # pipeline's slice, not the trigger-wide totals
        mine = metadata.get("per_queue", {}).get(queue)
        fn(event, mine if mine is not None else measurements, metadata, cfg)

    return telemetry.attach_named(pipeline.name, PIPELINE_EVENTS, scoped, config)


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
