"""Stream-stream joins with event-time interval bounds (SURVEY.md §2.8).

A stream-stream join buffers both sides in the state store; the interval
condition + watermarks are what make that state BOUNDED — each side can
evict rows once the other side's watermark passes the interval's reach.
Without the time bound the state grows forever; this module makes the bound
part of the operator signature so it can't be forgotten.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    within: str,
    left_watermark: str,
    right_watermark: str,
    how: str = "inner",
) -> DataFrame:
    """Join rows sharing `key` where `right_ts` falls in
    [left_ts, left_ts + within].  `within` is a SQL interval string
    (e.g. "1 hour").  Both sides must be streaming DataFrames with
    event-time columns; state is evicted once watermarks clear the
    interval."""
    lw = left.withWatermark(left_ts, left_watermark)
    rw = right.withWatermark(right_ts, right_watermark)
    # bounds built from dataframe-qualified columns, never bare names —
    # both sides commonly call their event-time column "ts", and a bare
    # F.expr reference would be ambiguous over the joined plan
    cond = (
        (lw[key] == rw[key])
        & (rw[right_ts] >= lw[left_ts])
        & (rw[right_ts] <= lw[left_ts] + F.expr(f"INTERVAL {within}"))
    )
    joined = lw.join(rw, cond, how)
    # single output key: in right/full outer joins an unmatched right row
    # has lw[key] = NULL, so dropping rw[key] alone would lose WHICH key the
    # row belonged to — coalesce both sides into one column instead
    return (
        joined.withColumn("__key", F.coalesce(lw[key], rw[key]))
        .drop(lw[key])
        .drop(rw[key])
        .withColumnRenamed("__key", key)
    )
