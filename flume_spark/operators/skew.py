"""Skew mitigation — salted joins and salted distinct aggregation.

At 100 TB a handful of hot keys (a viral document, a default tenant id, a
null-ish sentinel) can put >100x the median load on one reducer.  AQE's
skew-join handles the sort-merge case at runtime; these operators are the
declarative fallback for when you know the skew up front or need it for
aggregation shapes AQE can't split:

- ``salted_join``: replicate the small side ``n_salt`` times and scatter the
  big side's hot keys across ``(key, salt)`` sub-partitions.  Result set is
  identical to the plain join (oracle-checked by the `join_skew_salted`
  declared query); only the physical distribution changes.
- ``salted_count_distinct``: two-phase exact distinct count.  Phase 1
  partitions each key's VALUE space by hash into ``n_salt`` disjoint slices
  (so per-slice distinct counts are additive); phase 2 sums the slices.
  Turns one giant per-key distinct hash table into ``n_salt`` bounded ones.

The reference engine has no relational surface (Redis job queue); these are
part of the engine-native scale toolkit mandated by SURVEY.md §2.3/§2.5.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SALT = "__flume_salt"


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: list[str],
    salt_src: str,
    n_salt: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Join a skew-keyed big side to a replicable small side.

    ``salt_src`` is a big-side column (ideally unique-ish, e.g. the fact
    table's line id) hashed to pick the salt deterministically — same input,
    same plan, same partitioning, run after run.  The small side is exploded
    ``n_salt``x, so its shuffle volume grows by that factor: keep ``n_salt``
    around the skew ratio you're flattening, not higher.

    Equi-join semantics only (inner/left): every (key, salt) pair on the big
    side finds exactly the one replicated small-side row for its salt, so
    multiplicities match the unsalted join row-for-row.
    """
    assert how in ("inner", "left"), "salted_join is for equi inner/left joins"
    b = big.withColumn(
        SALT, F.pmod(F.crc32(F.col(salt_src).cast("string")), F.lit(n_salt)).cast("int")
    )
    s = small.select(
        "*", F.explode(F.sequence(F.lit(0), F.lit(n_salt - 1))).alias(SALT)
    )
    return b.join(s, on=[*on, SALT], how=how).drop(SALT)


def salted_count_distinct(
    df: DataFrame,
    keys: list[str],
    value: str,
    n_salt: int = 64,
    out_col: str = "n_distinct",
) -> DataFrame:
    """Exact COUNT(DISTINCT value) per key, skew-proof.

    ``xxhash64(value) % n_salt`` slices each key's value space into disjoint
    buckets; distinct counts of disjoint sets are additive, so the per-slice
    partial counts sum to the exact global distinct count.  Both phases are
    ordinary hash aggregations with map-side partials — no single reducer
    ever holds a hot key's full distinct set.
    """
    phase1 = df.groupBy(
        *keys, F.pmod(F.xxhash64(F.col(value)), F.lit(n_salt)).alias(SALT)
    ).agg(F.count_distinct(F.col(value)).alias("__partial"))
    return phase1.groupBy(*keys).agg(F.sum("__partial").alias(out_col))


def sketch_distinct(
    df: DataFrame,
    keys: list[str],
    value: str,
    lg_k: int = 12,
    out_col: str = "sketch",
) -> DataFrame:
    """Per-key mergeable HLL sketch of DISTINCT(value) — the incremental
    form of distinct counting.  Where `salted_count_distinct` recomputes
    exactly, sketches persist: compute one sketch per key per ingest slice
    (day, partition, source), store the binary, and answer "distinct over
    any slice union" later by merging — no rescan of history.  Merge order
    is irrelevant (register state is max-per-bucket); merged and
    whole-corpus estimates agree to within the sketch's error bound, not
    bit-exactly (datasketches' sparse->dense transitions differ by path)."""
    return df.groupBy(*keys).agg(
        F.hll_sketch_agg(F.col(value), F.lit(lg_k)).alias(out_col)
    )


def merge_sketch_estimate(
    sketches: DataFrame,
    keys: list[str],
    sketch_col: str = "sketch",
    out_col: str = "n_distinct_approx",
) -> DataFrame:
    """Union per-key sketches (e.g. across ingest slices) and estimate."""
    return sketches.groupBy(*keys).agg(
        F.hll_sketch_estimate(F.hll_union_agg(F.col(sketch_col))).alias(out_col)
    )
