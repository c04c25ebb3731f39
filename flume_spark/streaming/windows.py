"""Event-time streaming aggregations (SURVEY.md §2.8 ST8/ST9).

The reference has no event-time processing (its only window is the
rate-limit ledger), so these are engine-native: the SAME window expressions
as `queries/temporal.py` run under `readStream` with a watermark bounding
state.  Batch/stream parity is the point of Structured Streaming — one
logical plan, two execution modes.

Scale notes: state size is O(open windows x groups), bounded by the
watermark horizon; late rows beyond the watermark are dropped (counted in
`stateOperators.numRowsDroppedByWatermark` in query progress).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def streaming_tumbling_counts(
    spark: SparkSession,
    source_dir: str,
    schema,
    ts_col: str = "ts",
    key_col: str = "event_type",
    window: str = "1 hour",
    watermark: str = "2 hours",
    max_files_per_trigger: int = 10,
) -> DataFrame:
    """Tumbling-window counts per key over a parquet-file stream.

    Returns the unstarted streaming DataFrame; callers pick the sink
    (`.writeStream.outputMode("update")...`).  Append mode emits a window
    only once the watermark passes its end — the correct semantics for
    downstream exactly-once consumers.
    """
    from flume_spark.sources import read_stream

    return (
        read_stream(
            spark, source_dir, schema, max_files_per_trigger=max_files_per_trigger
        )
        .withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window).alias("w"), F.col(key_col))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            key_col,
            "n_events",
        )
    )


def streaming_session_counts(
    spark: SparkSession,
    source_dir: str,
    schema,
    ts_col: str = "ts",
    key_col: str = "user_id",
    gap: str = "4 hours",
    watermark: str = "8 hours",
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Session windows (inactivity gap) per key over a parquet-file stream —
    Spark merges open sessions in the state store as events arrive."""
    from flume_spark.sources import read_stream

    return (
        read_stream(
            spark, source_dir, schema, max_files_per_trigger=max_files_per_trigger
        )
        .withWatermark(ts_col, watermark)
        .groupBy(F.session_window(ts_col, gap).alias("w"), F.col(key_col))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            key_col,
            "n_events",
        )
    )
