"""Overlap independent Spark actions from driver threads (guide §2.6).

Spark's scheduler happily runs several jobs at once inside one
application; actions are only sequential because driver code calls them
sequentially.  At micro-batch/bench grain most of an entry's wall-clock
is per-action fixed overhead (planning, scheduling, a 1-3-partition
stage that leaves 29+ cores idle), so two INDEPENDENT actions — writes
to disjoint state directories, eager checkpoints of disjoint stages —
run in the same wall window nearly for free.  At 100 TB the same seams
back-fill executors freed by the first job's straggler tail, which is
the guide's stated reason this pattern scales (it is not a local[32]
trick: FIFO scheduling gives the earlier job resources first and the
later one the leftovers).

Use ONLY for actions with no data dependency and no shared output
location.  Result order matches thunk order; the first exception
propagates (both thunks always complete or fail independently — no
cancellation, matching the sequential failure semantics where an
earlier write may have committed before a later one failed).
"""

from __future__ import annotations

from collections.abc import Callable
from concurrent.futures import ThreadPoolExecutor
from typing import Any

__all__ = ["overlap"]


def overlap(*thunks: Callable[[], Any]) -> list[Any]:
    """Run each zero-arg thunk in its own driver thread; return their
    results in thunk order.  Job descriptions/groups are thread-local in
    Spark, so each thunk may label its own jobs without clobbering the
    others."""
    if len(thunks) <= 1:
        return [t() for t in thunks]
    with ThreadPoolExecutor(max_workers=len(thunks)) as pool:
        futures = [pool.submit(t) for t in thunks]
        # collect in submission order; .result() re-raises the thunk's
        # exception after every future has at least been scheduled
        return [f.result() for f in futures]
