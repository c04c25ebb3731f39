"""Retry backoff — reference: lib/flume/queue/backoff.ex:6-16
(`min(round(initial * count * 1.5), max)`), defaults 500 ms initial /
10 s max from lib/flume/config.ex:8-10."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DEFAULT_INITIAL_MS = 500
DEFAULT_MAX_MS = 10_000


def backoff_ms(retry_count: int, initial: int = DEFAULT_INITIAL_MS, maximum: int = DEFAULT_MAX_MS) -> int:
    return min(round(initial * retry_count * 1.5), maximum)


def backoff_ms_col(
    retry_count: Column, initial: int = DEFAULT_INITIAL_MS, maximum: int = DEFAULT_MAX_MS
) -> Column:
    """Columnar form — whole-stage-codegen'd, used when scheduling retries
    for a whole failed batch in one expression."""
    return F.least(
        F.round(F.lit(initial) * retry_count * 1.5, 0).cast("bigint"),
        F.lit(maximum).cast("bigint"),
    )
