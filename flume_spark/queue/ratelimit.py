"""Sliding-window rate-limit governor — the one reference component with no
Catalyst built-in (SURVEY.md §4: redis/bulk_dequeue.ex:79-163,196-224).

Reference semantics: before each dequeue, count events in the trailing
window (`ZCOUNT limit_zset [now-scale, now]`), fetch at most
`max_count - in_window`, record each dequeued job into the ledger, prune
entries older than the window (`ZREMRANGEBYSCORE`).  A `rate_limit_key`
shares one ledger across pipelines (queue/manager.ex:285-287).

Spark placement: admission control is a *driver-side* concern — the driver
is the single trigger scheduler, so the ledger is driver state that caps
each micro-batch's claim size (≙ dynamic maxOffsetsPerTrigger).  This
matches the reference's global-limit guarantee ("processing N jobs within
X without," README.md:216-265) without any distributed state.  For
multi-driver deployments the ledger would move to a small shared table
with the same prune/count/record contract.
"""

from __future__ import annotations

import os
import threading
import uuid
from collections import deque
from contextlib import contextmanager
from dataclasses import dataclass, field
from urllib.parse import quote


@dataclass
class SlidingWindowLimiter:
    """Per-key trailing-window event ledger (driver-local)."""

    ledgers: dict[str, deque] = field(default_factory=dict)
    _locks: dict[str, threading.Lock] = field(default_factory=dict)

    def _prune(self, key: str, scale_ms: int, now: float) -> deque:
        ledger = self.ledgers.setdefault(key, deque())
        horizon = now - scale_ms / 1000.0
        while ledger and ledger[0] <= horizon:
            ledger.popleft()
        return ledger

    def remaining(self, key: str, max_count: int, scale_ms: int, now: float) -> int:
        """How many more events the window admits right now."""
        ledger = self._prune(key, scale_ms, now)
        return max(0, max_count - len(ledger))

    def record(self, key: str, n: int, now: float) -> None:
        ledger = self.ledgers.setdefault(key, deque())
        ledger.extend([now] * n)

    def in_window(self, key: str, scale_ms: int, now: float) -> int:
        return len(self._prune(key, scale_ms, now))

    @contextmanager
    def lock(self, key: str):
        """Serialize remaining->record against concurrent triggers of this
        process (several PipelineRunner foreachBatch threads can share one
        manager)."""
        lk = self._locks.setdefault(key, threading.Lock())
        with lk:
            yield


class SharedLedgerLimiter:
    """Multi-driver sliding-window ledger on shared storage.

    Same prune/count/record contract as the reference's Redis limit zset
    (redis/bulk_dequeue.ex:196-224,242-247,297-299): each record is one
    tiny file `<ts>-<uuid>` holding a count, `remaining` sums counts inside
    the trailing window, pruning unlinks entries that fell out of it.  The
    per-key `lock()` is an exclusive flock held across a trigger's
    remaining->claim->record span — the analog of the reference's
    `bulk_dequeue_lock` (redis/lock.ex:8-24, SURVEY §2.1 S6), which exists
    for exactly this multi-instance case.  On a production cluster the same
    contract lands on a Delta control table (record = append, prune/count =
    one small scan) or an external store.
    """

    def __init__(self, path: str):
        self.path = path
        os.makedirs(path, exist_ok=True)

    def _key_dir(self, key: str) -> str:
        d = os.path.join(self.path, quote(key, safe=""))
        os.makedirs(d, exist_ok=True)
        return d

    def record(self, key: str, n: int, now: float) -> None:
        if n <= 0:
            return
        d = self._key_dir(key)
        name = f"{now:017.6f}-{uuid.uuid4().hex}"
        tmp = os.path.join(d, f".{name}.tmp")
        with open(tmp, "w") as f:
            f.write(str(n))
        os.rename(tmp, os.path.join(d, name))

    def _entries(self, key: str, scale_ms: int, now: float) -> int:
        """Prune expired entries, return the in-window event count."""
        d = self._key_dir(key)
        horizon = now - scale_ms / 1000.0
        total = 0
        for name in os.listdir(d):
            if name.startswith(".") or name.endswith(".lock"):
                continue
            try:
                ts = float(name.split("-", 1)[0])
            except ValueError:
                continue
            path = os.path.join(d, name)
            if ts <= horizon:
                try:  # another instance may prune concurrently
                    os.unlink(path)
                except FileNotFoundError:
                    pass
                continue
            try:
                with open(path) as f:
                    total += int(f.read() or 0)
            except (FileNotFoundError, ValueError):
                pass
        return total

    def remaining(self, key: str, max_count: int, scale_ms: int, now: float) -> int:
        return max(0, max_count - self._entries(key, scale_ms, now))

    def in_window(self, key: str, scale_ms: int, now: float) -> int:
        return self._entries(key, scale_ms, now)

    @contextmanager
    def lock(self, key: str):
        import fcntl

        path = os.path.join(self._key_dir(key), ".key.lock")
        with open(path, "w") as fd:
            fcntl.flock(fd, fcntl.LOCK_EX)
            try:
                yield
            finally:
                fcntl.flock(fd, fcntl.LOCK_UN)
