"""Custom stateful streaming operators (applyInPandasWithState).

The reference's only cross-batch state is the rate-limit ledger and the
processing backup set; Structured Streaming generalizes both: arbitrary
per-key state with TTL, checkpointed with the query (SURVEY.md §2.8).
These operators are the `applyInPandasWithState` pattern the engine uses
wherever built-in windows can't express the semantics.

Scale notes: state lives in the executor state store (RocksDB-backed on a
real cluster), partitioned by key — the shuffle is one hash exchange on
the grouping key per micro-batch.  TTL (processing-time timeout) bounds
state size, mirroring the reference's ZREMRANGEBYSCORE ledger pruning
(SURVEY.md §7 hard part 5).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

RUNNING_TOTALS_SCHEMA = "key string, n_events long, total double"
_STATE_SCHEMA = "n long, total double"


def running_totals(
    grouped,
    timeout_ms: int | None = None,
) -> DataFrame:
    """Per-key running (count, sum) across micro-batches.

    `grouped` is `df.groupBy(key_col)` on a streaming DataFrame whose rows
    carry (`key`, `value`).  Emits the updated running totals for every key
    seen in the batch.  With `timeout_ms`, idle keys are evicted and
    re-emitted once with their final totals (TTL state, ledger-prune
    analog).
    """

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            n, total = state.get
            state.remove()
            yield pd.DataFrame({"key": [key[0]], "n_events": [n], "total": [total]})
            return
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].sum())
        state.update((n, total))
        if timeout_ms is not None:
            state.setTimeoutDuration(timeout_ms)
        yield pd.DataFrame({"key": [key[0]], "n_events": [n], "total": [total]})

    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if timeout_ms is not None
        else GroupStateTimeout.NoTimeout
    )
    return grouped.applyInPandasWithState(
        update,
        outputStructType=RUNNING_TOTALS_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=timeout,
    )
