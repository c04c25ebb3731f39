"""Mock mode — reference parity for Flume.Mock (lib/flume/mock.ex:1-27,
queue/mock_api.ex:1-111, config.ex:98-116; SURVEY.md §2.9 U4).

The reference's `mock: true` swaps the queue API for one that sends the
would-be Redis ops to the test process as messages.  Here `mock(manager)`
is a context manager that swaps the manager's write path for a recorder:
enqueues are captured (and assertable) instead of landing in the job log.
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
class MockRecorder:
    calls: list[MockCall] = field(default_factory=list)

    def assert_enqueued(self, queue: str, cls: str, args: list | None = None) -> None:
        for c in self.calls:
            if c.queue == queue and c.cls == cls and (args is None or c.args == args):
                return
        raise AssertionError(
            f"no enqueue matching queue={queue} class={cls} args={args}; "
            f"saw {self.calls}"
        )


@contextlib.contextmanager
def mock(manager):
    """Swap `manager`'s write path for a recorder; restore on exit.

    Mirrors `with Flume.Mock.with_mock(...)` test usage: code under test
    calls the same `enqueue`/`bulk_enqueue`/`enqueue_in` API, assertions go
    against the recorder instead of the store.
    """
    recorder = MockRecorder()
    real_bulk = manager.bulk_enqueue

    def mock_bulk(queue, jobs, context=None, now=None, delay_s=0.0):
        jids = []
        for cls, function, args in jobs:
            if isinstance(args, dict):  # reference rejects object args
                args = []
            recorder.calls.append(MockCall(queue, cls, function, args, delay_s))
            jids.append(f"mock-{len(recorder.calls)}")
        return jids

    manager.bulk_enqueue = mock_bulk
    try:
        yield recorder
    finally:
        manager.bulk_enqueue = real_bulk
