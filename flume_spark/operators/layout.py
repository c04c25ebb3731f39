"""Data-layout optimization — multi-column (Z-order) clustering for writes.

At 100 TB the cheapest predicate is the one that never reads the data:
parquet row-group min/max stats prune I/O, but only if the written layout
actually clusters the filtered columns.  Sorting clusters ONE column;
Z-ordering (Morton-interleaving the bits of several columns) gives every
interleaved column locality, so row-group stats stay tight for each and
multi-dimensional filters skip most of the file.

`cluster_by` is the writer-side half: compute the Morton key, range-
partition on it (so files cover disjoint key ranges), sort within
partitions, then write.  The reader-side half is free — Spark's parquet
scan consults row-group stats for any pushed filter.

No reference analog (Redis has no columnar layout); engine-native per the
scale mandate.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_BITS = 16  # per-column resolution; 2 cols x 16 bits = 32-bit Morton key


def _bucket(c: Column, lo: Column, hi: Column) -> Column:
    """Map a numeric column to [0, 2^_BITS) linearly over [lo, hi]."""
    n = 1 << _BITS
    scaled = (c.cast("double") - lo) / F.when(hi == lo, F.lit(1.0)).otherwise(hi - lo)
    return F.least(
        F.lit(n - 1),
        F.greatest(F.lit(0), F.floor(scaled * n).cast("bigint")),
    )


def morton_key(b1: Column, b2: Column) -> Column:
    """Interleave the low _BITS bits of two bucket ids: b1 on even bit
    positions, b2 on odd — pure codegen bit arithmetic, no UDF."""
    parts = []
    for i in range(_BITS):
        parts.append(F.shiftleft(F.shiftright(b1, i).bitwiseAND(F.lit(1)), 2 * i))
        parts.append(F.shiftleft(F.shiftright(b2, i).bitwiseAND(F.lit(1)), 2 * i + 1))
    return reduce(lambda a, b: a.bitwiseOR(b), parts)


def cluster_by(df: DataFrame, col1: str, col2: str, n_partitions: int) -> DataFrame:
    """Z-order `df` by two numeric columns: range-partition + sort on the
    Morton key so every output file covers a tight range of BOTH columns.

    The min/max bounds come from one bounded aggregate (4 scalars to the
    driver).  Write the result with `df.write.parquet(...)` — one file per
    partition, row-group stats tight in both dimensions.
    """
    lo1, hi1, lo2, hi2 = df.agg(
        F.min(F.col(col1).cast("double")),
        F.max(F.col(col1).cast("double")),
        F.min(F.col(col2).cast("double")),
        F.max(F.col(col2).cast("double")),
    ).first()
    key = morton_key(
        _bucket(F.col(col1), F.lit(lo1), F.lit(hi1)),
        _bucket(F.col(col2), F.lit(lo2), F.lit(hi2)),
    )
    return (
        df.withColumn("__zkey", key)
        .repartitionByRange(n_partitions, "__zkey")
        .sortWithinPartitions("__zkey")
        .drop("__zkey")
    )
