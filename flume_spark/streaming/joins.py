"""Streaming joins (SURVEY.md §2.8): stream-static enrichment and
stream-stream interval joins.

A stream-stream join buffers both sides in the state store; the interval
condition + watermarks are what make that state BOUNDED — each side can
evict rows once the other side's watermark passes the interval's reach.
Without the time bound the state grows forever; this module makes the bound
part of the operator signature so it can't be forgotten.  Stream-STATIC
joins (enrich_stream) buffer nothing — the static side re-resolves per
micro-batch — and are the right tool whenever one side is a dimension.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def enrich_stream(
    stream_df: DataFrame,
    dim_df: DataFrame,
    key: str,
    how: str = "left",
    broadcast_dim: bool = True,
) -> DataFrame:
    """Stream-static dimension enrichment: join each arriving micro-batch
    against a STATIC (batch) DataFrame — the stateless workhorse join of
    streaming pipelines (attach customer attributes, config, allow-lists
    to a stream).

    Scale semantics worth pinning, because both are easy to get wrong:
    - STATELESS: unlike a stream-stream join, nothing is buffered in the
      state store — each micro-batch joins and forgets.  No watermark
      needed on either side.
    - SLOWLY-CHANGING dim, the classic trap: a file-source `dim_df` is
      SNAPSHOTTED for the lifetime of the streaming query — its file
      listing (InMemoryFileIndex) is resolved into the query's plan, so
      files added to the dimension directory are invisible to later
      micro-batches, and `spark.catalog.refreshByPath` does NOT reach a
      running query's plan either.  To pick up dim changes: restart the
      query (new plan, new listing — gated in
      test_enrich_stream_dim_snapshot_per_query), or do the join inside
      foreachBatch where the dim is re-read per batch, or use a Delta
      table (its snapshot resolution is per-batch by design).
    - `broadcast_dim` (default): dims are the small side by definition —
      broadcasting keeps every micro-batch shuffle-free on the stream
      side.  Disable only for a genuinely large dim (then the stream side
      shuffles per batch; consider pre-bucketing the dim instead).

    `how="left"` keeps unmatched stream rows (enrichment columns NULL) —
    an inner join would silently DROP events when the dim is late, which
    is rarely what a pipeline wants; pass "inner" to filter instead.
    """
    dim = F.broadcast(dim_df) if broadcast_dim else dim_df
    return stream_df.join(dim, key, how)


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
