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

from collections import deque
from dataclasses import dataclass, field


@dataclass
class SlidingWindowLimiter:
    """Per-key trailing-window event ledger."""

    ledgers: dict[str, deque] = field(default_factory=dict)

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
