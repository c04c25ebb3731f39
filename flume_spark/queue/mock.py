"""Mock mode — reference parity for Flume.Mock (lib/flume/mock.ex:1-27,
queue/mock_api.ex:1-111, config.ex:98-116; SURVEY.md §2.9 U4) and the
pipeline-side mock (pipeline/mock_api.ex:1-13).

The reference's `mock: true` swaps the queue API for one that sends the
would-be Redis ops to the test process as messages, AND swaps the pipeline
control API for one that records pause/resume calls.  Here `mock(manager)`
is a context manager that swaps both on the manager: enqueues are captured
(and assertable) instead of landing in the job log, and pause/resume are
captured instead of flipping pipeline state/flags.
"""

from __future__ import annotations

import contextlib
from dataclasses import dataclass, field


@dataclass
class MockCall:
    queue: str
    cls: str
    function: str
    args: list
    delay_s: float = 0.0


@dataclass
class MockControl:
    """One recorded pipeline-control call — the message shape
    pipeline/mock_api.ex:4-12 sends ({pipeline_name, action, options})."""

    pipeline_name: str
    action: str  # "pause" | "resume"
    options: dict


@dataclass
class MockRecorder:
    calls: list[MockCall] = field(default_factory=list)
    control: list[MockControl] = field(default_factory=list)

    def assert_enqueued(
        self,
        queue: str,
        cls: str,
        args: list | None = None,
        delay_s: float | None = None,
    ) -> None:
        """`delay_s` asserts the schedule offset too — the enqueue_in 'mock
        works' block (test/flume_test.exs:176-190 asserts schedule_in)."""
        for c in self.calls:
            if (
                c.queue == queue
                and c.cls == cls
                and (args is None or c.args == args)
                and (delay_s is None or c.delay_s == delay_s)
            ):
                return
        raise AssertionError(
            f"no enqueue matching queue={queue} class={cls} args={args} "
            f"delay_s={delay_s}; saw {self.calls}"
        )

    def assert_control(self, pipeline_name: str, action: str) -> None:
        for c in self.control:
            if c.pipeline_name == pipeline_name and c.action == action:
                return
        raise AssertionError(
            f"no {action} recorded for pipeline {pipeline_name}; "
            f"saw {self.control}"
        )


@contextlib.contextmanager
def mock(manager):
    """Swap `manager`'s write path AND control API for a recorder; restore
    on exit.

    Mirrors `with Flume.Mock.with_mock(...)` test usage: code under test
    calls the same `enqueue`/`bulk_enqueue`/`enqueue_in`/`pause`/`resume`
    API, assertions go against the recorder instead of the store —
    pause/resume recording is the Pipeline.MockAPI analog
    (pipeline/mock_api.ex:1-13), so orchestration code that pauses
    pipelines is testable without touching real pipeline state.
    """
    recorder = MockRecorder()
    real_bulk = manager.bulk_enqueue
    real_pause, real_resume = manager.pause, manager.resume

    def mock_bulk(queue, jobs, context=None, now=None, delay_s=0.0):
        jids = []
        for cls, function, args in jobs:
            if isinstance(args, dict):  # reference rejects object args
                args = []
            recorder.calls.append(MockCall(queue, cls, function, args, delay_s))
            jids.append(f"mock-{len(recorder.calls)}")
        return jids

    def mock_pause(name, temporary=True):
        recorder.control.append(
            MockControl(name, "pause", {"temporary": temporary})
        )

    def mock_resume(name, temporary=True):
        recorder.control.append(
            MockControl(name, "resume", {"temporary": temporary})
        )

    manager.bulk_enqueue = mock_bulk
    manager.pause, manager.resume = mock_pause, mock_resume
    try:
        yield recorder
    finally:
        manager.bulk_enqueue = real_bulk
        manager.pause, manager.resume = real_pause, real_resume
