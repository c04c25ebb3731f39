"""Config-driven boot — build the whole pipeline topology from one dict.

Reference analog: the app config (config/config.exs `pipelines:`,
`instrumentation:`, `max_retries:` ...) drives Flume.Supervisor
(lib/flume/supervisor.ex:17-41), which boots one GenStage chain per
configured pipeline via Flume.Support.Pipelines.list
(lib/flume/support/pipelines.ex:11-27), attaching instrumentation per
pipeline (lib/flume/pipeline/event.ex:6-28).

Spark shape: one QueueManager over a shared JobStore, one PipelineRunner
(streaming query) per pipeline, per-pipeline named telemetry handlers.
Workers are code, not config — pass the WorkerRegistry alongside the dict
(the reference's config names worker MODULES for the same reason).

Config keys (all optional except store_path / pipelines):

    {
      "store_path": "/data/jobs",            # job log location (required)
      "checkpoint_dir": "/data/checkpoints", # default: <store_path>.checkpoints
      "max_retries": 5,                      # config.ex @max_retries
      "visibility_timeout_s": 600,           # config.ex:23
      "backoff_initial_ms": 500,             # config.exs backoff_initial
      "backoff_max_ms": 10000,               # config.exs backoff_max
      "idempotence": False,
      "trigger_seconds": 2.0,                # producer @default_interval
      "max_files_per_trigger": 100,
      "compact_max_files": 256,              # auto-compaction threshold
      "compact_grace_s": 30.0,               # default 30 when >1 pipeline,
                                             # 0 for a single pipeline
      "archive_succeeded": False,
      "instrumentation": {                   # config.exs instrumentation:
        "handler": callable(event, measurements, metadata, config) or None
                   (None -> default_event_handler),
        "config": {"app_name": "myapp"},     # ≙ metadata: [app_name: ...]
      },
      "logger": <FlumeLogger impl>,          # config.ex:7 `logger:` —
                                             # default DefaultLogger
      "debug_log": False,                    # config.ex debug_log gate
                                             # (applies to the default
                                             # logger only)
      "pipelines": [                         # config.exs pipelines:
        {"name": "default_pipeline", "queue": "default", "max_demand": 1000,
         "batch_size": 10, "rate_limit_count": 1000, "rate_limit_scale": 5000,
         "rate_limit_key": "shared", "instrument": False},
      ],
    }
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field

from pyspark.sql import SparkSession

from flume_spark.queue.instrumentation import (
    Telemetry,
    attach_pipeline_instrumentation,
)
from flume_spark.queue.logger import DefaultLogger
from flume_spark.queue.manager import Pipeline, QueueManager
from flume_spark.queue.store import JobStore
from flume_spark.queue.workers import WorkerRegistry
from flume_spark.streaming.pipeline import PipelineRunner

# derived from the dataclass so a new Pipeline field never drifts out of sync
_PIPELINE_KEYS = frozenset(f.name for f in dataclasses.fields(Pipeline))

_TOP_LEVEL_KEYS = frozenset(
    {
        "store_path",
        "checkpoint_dir",
        "max_retries",
        "visibility_timeout_s",
        "backoff_initial_ms",
        "backoff_max_ms",
        "idempotence",
        "trigger_seconds",
        "max_files_per_trigger",
        "compact_max_files",
        "compact_grace_s",
        "archive_succeeded",
        "instrumentation",
        "logger",
        "debug_log",
        "pipelines",
    }
)


@dataclass
class FlumeApp:
    """The booted topology: shared manager + one streaming runner per
    pipeline.  start()/stop() mirror the supervisor lifecycle (in-flight
    micro-batches complete before stop returns — ST6 semantics)."""

    manager: QueueManager
    runners: dict[str, PipelineRunner]
    telemetry: Telemetry
    started: bool = field(default=False)

    def start(self) -> "FlumeApp":
        for runner in self.runners.values():
            runner.start()
        self.started = True
        return self

    def stop(self) -> None:
        for runner in self.runners.values():
            runner.stop()
        self.started = False

    def await_idle(self, timeout_s: float = 30.0) -> None:
        for runner in self.runners.values():
            runner.await_idle(timeout_s)


def from_config(
    spark: SparkSession,
    config: dict,
    registry: WorkerRegistry | None = None,
) -> FlumeApp:
    """Build (without starting) the full topology from `config`.

    Call .start() to launch the streaming queries; manager-level batch APIs
    (enqueue, run_once, job_counts, pause_all, ...) work either way.
    """
    unknown_top = set(config) - _TOP_LEVEL_KEYS
    if unknown_top:
        raise ValueError(f"unknown config keys: {sorted(unknown_top)}")
    if "store_path" not in config:
        raise ValueError("config requires 'store_path'")
    pipeline_cfgs = config.get("pipelines") or []
    if not pipeline_cfgs:
        raise ValueError("config requires a non-empty 'pipelines' list")
    pipelines = []
    for p in pipeline_cfgs:
        unknown = set(p) - _PIPELINE_KEYS
        if unknown:
            raise ValueError(f"unknown pipeline config keys: {sorted(unknown)}")
        pipelines.append(Pipeline(**p))

    telemetry = Telemetry()
    instr = config.get("instrumentation")
    if instr is not None:
        for pipeline in pipelines:
            attach_pipeline_instrumentation(
                telemetry,
                pipeline,
                handler=instr.get("handler"),
                config=instr.get("config"),
            )

    store = JobStore(spark, config["store_path"])
    # Multiple streaming runners share ONE store: one runner's end-of-trigger
    # auto-compaction must not unlink claim files (or GC markers) a sibling's
    # in-flight dispatch is still reading, so a shared-store deployment
    # defaults to a 30 s compaction grace (QueueManager docstring contract);
    # a single pipeline keeps the immediate-compact default.
    default_grace = 30.0 if len(pipelines) > 1 else 0.0
    manager = QueueManager(
        spark,
        store,
        registry or WorkerRegistry(),
        pipelines=pipelines,
        max_retries=config.get("max_retries", 5),
        visibility_timeout_s=config.get("visibility_timeout_s", 600),
        backoff_initial_ms=config.get("backoff_initial_ms", 500),
        backoff_max_ms=config.get("backoff_max_ms", 10_000),
        telemetry=telemetry,
        idempotence=config.get("idempotence", False),
        compact_max_files=config.get("compact_max_files", 256),
        compact_grace_s=config.get("compact_grace_s", default_grace),
        archive_succeeded=config.get("archive_succeeded", False),
        logger=config.get("logger")
        or DefaultLogger(debug_log=config.get("debug_log", False)),
    )
    checkpoint_dir = config.get(
        "checkpoint_dir", config["store_path"].rstrip("/") + ".checkpoints"
    )
    runners = {
        p.name: PipelineRunner(
            spark,
            manager,
            p,
            checkpoint_dir=f"{checkpoint_dir}/{p.name}",
            trigger_seconds=config.get("trigger_seconds", 2.0),
            max_files_per_trigger=config.get("max_files_per_trigger", 100),
        )
        for p in pipelines
    }
    return FlumeApp(manager=manager, runners=runners, telemetry=telemetry)
