"""Z-order (Morton) multi-dimensional clustering — the lakehouse layout
technique for making parquet min/max (file/row-group) statistics effective
on MORE THAN ONE filter column at once.

A file sorted by `custkey` alone gives tight custkey ranges per file but
every file spans all dates: a date filter prunes nothing.  Interleaving
the bits of both dimensions into one sort key gives every file a bounded
rectangle in (custkey, date) space, so a 2-d box predicate overlaps only
the files whose rectangle intersects it — both dimensions prune.  This is
what Delta/Iceberg `OPTIMIZE ... ZORDER BY` does; here it is expressed as
plain Catalyst integer arithmetic (shift/and/or — whole-stage codegen,
engine-reproducible, no UDF) plus the same range-partition + sort-within
write pattern as text.write_shards.

At 100 TB: z-ordering is a one-time (or per-compaction) layout cost — one
range-partitioned sort — paid to turn every subsequent 2-d scan into a
file-pruned scan.  The interleave is exact integer math, so the key can
also serve as a deterministic bucketing/sampling key.

This is the CANONICAL interleave definition (operators/layout.py's
morton_key/cluster_by delegate here): z_value_sql is generated from the
same loop, which is what lets the `zorder_orders` oracle hash-check the
key math cross-engine.  `bucketize` uses FIXED bounds (ingest-stable);
layout.cluster_by derives bounds from the data (one-shot convenience).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def z_value(x: Column, y: Column, bits: int = 16) -> Column:
    """Interleave the low `bits` bits of two non-negative ints: bit i of x
    lands at position 2i, bit i of y at 2i+1.  Callers normalize their
    dimensions into [0, 2^bits) first (see bucketize) — values outside
    the range would silently collide after masking, so normalize, don't
    truncate.  Returns a non-negative long (2*bits <= 62)."""
    assert 0 < bits <= 31
    # Column.__and__/__or__ are LOGICAL operators in PySpark; bitwise needs
    # the explicit methods (same long width on both operands)
    one = F.lit(1).cast("long")
    xe = x.cast("long")
    ye = y.cast("long")
    z = F.lit(0).cast("long")
    for i in range(bits):
        z = z.bitwiseOR(F.shiftleft(F.shiftright(xe, i).bitwiseAND(one), 2 * i))
        z = z.bitwiseOR(
            F.shiftleft(F.shiftright(ye, i).bitwiseAND(one), 2 * i + 1)
        )
    return z


def z_value_sql(x_sql: str, y_sql: str, bits: int = 16) -> str:
    """The identical interleave as ANSI SQL (DuckDB-compatible) — generated
    from the same loop so the two definitions cannot drift."""
    terms = []
    for i in range(bits):
        terms.append(f"((({x_sql} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({y_sql} >> {i}) & 1) << {2 * i + 1})")
    return " | ".join(terms)


def bucketize(col: Column, lo: int, hi: int, bits: int = 16) -> Column:
    """Order-preserving normalization of an integer dimension into
    [0, 2^bits): linear bucket of (col - lo) over [lo, hi], clamped.
    Fixed bounds (not per-corpus min/max aggregates) keep the key
    deterministic and stable across ingests — the property an incremental
    z-ordered table needs (per-batch min/max would re-map old keys)."""
    n = (1 << bits) - 1
    span = max(1, hi - lo)
    scaled = ((col.cast("long") - F.lit(lo)) * F.lit(n)) / F.lit(span)
    return F.greatest(F.lit(0), F.least(F.lit(n), F.floor(scaled))).cast("long")


def bucketize_sql(col_sql: str, lo: int, hi: int, bits: int = 16) -> str:
    n = (1 << bits) - 1
    span = max(1, hi - lo)
    return (
        f"greatest(0, least({n}, CAST(floor"
        f"((CAST({col_sql} AS BIGINT) - {lo}) * {n} / {span}) AS BIGINT)))"
    )


def zorder_write(
    df: DataFrame,
    out_dir: str,
    z_col: str = "z_key",
    max_records_per_file: int = 100_000,
) -> int:
    """Write `df` clustered by its z-key: range-partition on the key, sort
    within partitions, bound file sizes — every output file then covers a
    contiguous z-range, i.e. a bounded rectangle in the original
    dimensions, which is what makes min/max pruning bite on both.
    Returns the number of files written."""
    spark = df.sparkSession
    (
        df.repartitionByRange(F.col(z_col))
        .sortWithinPartitions(z_col)
        .write.option("maxRecordsPerFile", max_records_per_file)
        .mode("overwrite")
        .parquet(out_dir)
    )
    return len(spark.read.parquet(out_dir).inputFiles())
