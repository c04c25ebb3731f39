"""Structured Streaming pipeline tests (SURVEY.md §2.8 ST1/ST5/ST6).

Mirrors the reference's end-to-end pipeline tests (test/flume_test.exs):
enqueued jobs get picked up by the running stream, processed, and acked;
a paused pipeline admits nothing until resumed.
"""

from __future__ import annotations

import time

import pytest
from pyspark.sql import functions as F

from flume_spark.queue import JobStore, QueueManager, WorkerRegistry
from flume_spark.queue.manager import Pipeline
from flume_spark.streaming.pipeline import PipelineRunner


@pytest.fixture()
def runner_env(spark, tmp_path):
    registry = WorkerRegistry()
    registry.register("NoopWorker", lambda *args: None)
    store = JobStore(spark, str(tmp_path / "jobs"))
    pipeline = Pipeline(name="stream", queue="sq", max_demand=500)
    manager = QueueManager(spark, store, registry, pipelines=[pipeline])
    runner = PipelineRunner(
        spark,
        manager,
        pipeline,
        checkpoint_dir=str(tmp_path / "ckpt"),
        trigger_seconds=0.25,
    )
    yield manager, runner
    runner.stop()


def _status_counts(manager):
    rows = manager.current().groupBy("status").count().collect()
    return {r["status"]: r["count"] for r in rows}


def test_stream_processes_enqueued_jobs(runner_env):
    manager, runner = runner_env
    manager.bulk_enqueue("sq", [("NoopWorker", "perform", [i]) for i in range(5)])
    runner.start()
    runner.await_idle()
    assert _status_counts(manager) == {"succeeded": 5}
    assert runner.batches_run >= 1


def test_stream_picks_up_late_arrivals(runner_env):
    manager, runner = runner_env
    runner.start()
    runner.await_idle()  # stream running, nothing to do yet
    manager.enqueue("sq", "NoopWorker", ["late"])
    runner.await_idle()
    assert _status_counts(manager) == {"succeeded": 1}


def test_stream_pause_gate(runner_env):
    manager, runner = runner_env
    manager.pause("stream")
    manager.bulk_enqueue("sq", [("NoopWorker", "perform", [i]) for i in range(3)])
    runner.start()
    runner.await_idle()
    # paused: arrivals seen, nothing admitted (producer.ex:111-115)
    assert _status_counts(manager) == {"pending": 3}

    manager.resume("stream")
    manager.enqueue("sq", "NoopWorker", ["wake"])  # new arrival wakes the stream
    runner.await_idle()
    assert _status_counts(manager) == {"succeeded": 4}


def test_streaming_listener_bridges_progress(runner_env, spark):
    from flume_spark.queue.instrumentation import Telemetry, attach_streaming_listener

    manager, runner = runner_env
    bus = Telemetry(keep_events=True)
    listener = attach_streaming_listener(spark, bus)
    try:
        manager.enqueue("sq", "NoopWorker", [1])
        runner.start()
        runner.await_idle()
        names = {e[0] for e in bus.events}
        assert ("pipeline", "started") in names
        assert ("pipeline", "progress") in names
    finally:
        spark.streams.removeListener(listener)
