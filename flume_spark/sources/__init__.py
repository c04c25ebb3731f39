"""Sources & sinks — the engine's I/O layer.

The reference's only storage is Redis (lists/zsets of JSON strings); this
engine's equivalents are the job log (`flume_spark.queue.store.JobStore`)
plus generic columnar table I/O declared here.  Everything is
`spark.read`/`df.write` so Catalyst keeps pushdown/pruning, and every
reader has a `readStream` twin for the streaming surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from flume_spark.queries._util import T, register_views  # noqa: F401 (re-export)
from flume_spark.session import load_tables  # noqa: F401 (re-export)
from flume_spark.sources.merge import merge_upsert  # noqa: F401 (re-export)

_BATCH_FORMATS = {"parquet", "json", "csv", "orc"}


def read_table(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
    schema=None,
    **options,
) -> DataFrame:
    """Batch read with format-appropriate defaults.

    CSV/JSON run PERMISSIVE so malformed rows never fail the job — the
    relational analog of the job decoder's reject-don't-crash rule
    (SURVEY.md §2.2 F4).  To actually QUARANTINE malformed payloads
    (rather than have their fields nulled), the caller-supplied schema must
    include a `_corrupt_record` string field — Spark only captures the raw
    line when the column exists in the schema; the column name is
    pre-wired via columnNameOfCorruptRecord below.
    """
    if fmt not in _BATCH_FORMATS:
        raise ValueError(f"unsupported format {fmt!r}; one of {sorted(_BATCH_FORMATS)}")
    reader = spark.read.format(fmt)
    if schema is not None:
        reader = reader.schema(schema)
    if fmt == "csv":
        options.setdefault("header", "true")
    if fmt in ("csv", "json"):
        options.setdefault("mode", "PERMISSIVE")
        options.setdefault("columnNameOfCorruptRecord", "_corrupt_record")
    return reader.options(**options).load(path)


def read_stream(
    spark: SparkSession,
    path: str,
    schema,
    fmt: str = "parquet",
    max_files_per_trigger: int | None = None,
    **options,
) -> DataFrame:
    """Streaming twin of read_table (file sources need an explicit schema)."""
    reader = spark.readStream.format(fmt).schema(schema)
    if max_files_per_trigger is not None:
        options["maxFilesPerTrigger"] = str(max_files_per_trigger)
    return reader.options(**options).load(path)


def write_table(
    df: DataFrame,
    path: str,
    fmt: str = "parquet",
    mode: str = "append",
    partition_by: list[str] | None = None,
    buckets: tuple[int, str] | None = None,
    table_name: str | None = None,
    **options,
) -> None:
    """Batch write.  `partition_by` prunes at read time (partition columns
    become directories); `buckets=(n, col)` pre-shuffles so later joins and
    latest-per-key windows on that column are exchange-free (requires a
    table name — bucketing metadata lives in the catalog)."""
    if fmt == "csv":
        options.setdefault("header", "true")
    writer = df.write.format(fmt).mode(mode).options(**options)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    if buckets is not None:
        n, col = buckets
        assert table_name, "bucketed writes need saveAsTable"
        writer.bucketBy(n, col).sortBy(col).option("path", path).saveAsTable(
            table_name
        )
        return
    writer.save(path)
