"""Data-layout optimization — multi-column (Z-order) clustering for writes.

At 100 TB the cheapest predicate is the one that never reads the data:
parquet row-group min/max stats prune I/O, but only if the written layout
actually clusters the filtered columns.  Sorting clusters ONE column;
Z-ordering (Morton-interleaving the bits of several columns) gives every
interleaved column locality, so row-group stats stay tight for each and
multi-dimensional filters skip most of the file.

This module is the convenience wrapper for ONE-SHOT layout jobs: bounds
are derived from the data (one 4-scalar aggregate).  The canonical
interleave lives in `operators/zorder.py` (single definition, shared with
its SQL twin so the `zorder_orders` oracle can hash-check the math);
`zorder.bucketize` with FIXED bounds is the ingest-stable variant — use
it when batches append to one clustered table, because data-derived
bounds re-map old keys whenever the corpus's min/max moves.

No reference analog (Redis has no columnar layout); engine-native per the
scale mandate.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from flume_spark.operators.zorder import z_value

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
    positions, b2 on odd.  Delegates to zorder.z_value — one interleave
    definition in the package (its SQL twin is what the oracle checks)."""
    return z_value(b1, b2, bits=_BITS)


def cluster_by(df: DataFrame, col1: str, col2: str, n_partitions: int) -> DataFrame:
    """Z-order `df` by two numeric columns: range-partition + sort on the
    Morton key so every output file covers a tight range of BOTH columns.

    The min/max bounds come from one bounded aggregate (4 scalars to the
    driver) — convenient for one-shot jobs; incremental tables should use
    zorder.bucketize with fixed bounds instead (see module docstring).
    Write the result with `df.write.parquet(...)` — one file per
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
