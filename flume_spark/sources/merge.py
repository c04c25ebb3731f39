"""Upsert/merge into a parquet table — the incremental-corpus maintenance op.

A 100 TB training corpus is not rebuilt; it's merged into: new crawl
snapshots upsert on document key, takedowns delete.  Production target is
Delta/Iceberg MERGE INTO (ACID, file-level conflict detection) — same
stance as the job store (store.py) — but the parquet-dir variant below has
the same shape and the same scale property: **only partitions touched by
the updates are rewritten**, found by partition-pruned reads, never a
full-table rewrite.

Semantics (match MERGE WHEN MATCHED UPDATE / NOT MATCHED INSERT /
`_deleted` WHEN MATCHED DELETE):
- update rows replace target rows sharing `key` (updates win),
- unmatched update rows are inserted,
- update rows with boolean column `_deleted` true remove the target row.
"""

from __future__ import annotations

import os
import shutil
import uuid
from urllib.parse import unquote

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DELETED = "_deleted"


def _merged(target: DataFrame, updates: DataFrame, key: str) -> DataFrame:
    upserts = updates.filter(~F.coalesce(F.col(DELETED), F.lit(False))) if (
        DELETED in updates.columns
    ) else updates
    survivors = target.join(updates.select(key), key, "left_anti")
    return survivors.unionByName(upserts.drop(DELETED) if DELETED in upserts.columns else upserts)


def merge_upsert(
    spark: SparkSession,
    path: str,
    updates: DataFrame,
    key: str,
    partition_col: str | None = None,
) -> None:
    """Merge `updates` into the parquet table at `path` on `key`.

    Partitioned tables: the distinct partition values present in the
    updates (a bounded collect — one scalar per touched partition) prune
    the read, and dynamic partition overwrite rewrites ONLY those
    partitions; untouched partition directories are never read or written.
    Keys must not move between partitions (the usual constraint — Delta's
    MERGE has the same file-scoping assumption when pruning).

    Unpartitioned tables: full merge through a staging directory swapped
    in with two renames (crash window documented; Delta is the ACID path).
    """
    if partition_col is not None:
        # NB: partition values must be non-null (isin() never matches NULL,
        # so a __HIVE_DEFAULT_PARTITION__ row can't be addressed by a merge).
        full_target = spark.read.parquet(path)
        t_type = dict(full_target.dtypes).get(partition_col)
        u_type = dict(updates.dtypes)[partition_col]
        if t_type != u_type:
            # A widening union would put survivor values and value_to_dir
            # keys in different type domains, so every touched partition
            # would look emptied and be rmtree'd WITH live data — refuse.
            raise TypeError(
                f"partition_col {partition_col!r} type mismatch: target is "
                f"{t_type}, updates is {u_type} — cast the updates frame"
            )
        parts = [r[0] for r in updates.select(partition_col).distinct().collect()]
        target = full_target.filter(F.col(partition_col).isin(parts))
        # Encoded directory names of the touched partitions, taken from the
        # files Spark ACTUALLY read — never a hand-built f"{col}={value}"
        # path, whose encoding diverges from Hive's for URL-escaped chars,
        # spaces, and date/float formatting (round-2 ADVICE).  One value per
        # touched partition dir; bounded by the update batch.
        dir_expr = F.element_at(F.split(F.input_file_name(), "/"), -2)
        # input_file_name() is a URI: its path components are URL-encoded ON
        # TOP of the on-disk Hive escaping (disk "p=a b%3Ac" appears as
        # "p=a%20b%253Ac"), so unquote exactly once to get the dir name back
        value_to_dir = {
            r[0]: unquote(r[1])
            for r in target.select(F.col(partition_col), dir_expr)
            .distinct()
            .collect()
        }
        merged = _merged(target, updates, key)
        # break lineage from the files about to be overwritten
        merged = merged.localCheckpoint(eager=True)
        # dynamic overwrite only rewrites partitions PRESENT in the output:
        # a partition whose every key was deleted produces zero rows and
        # would silently survive — record the surviving values from the
        # OUTPUT frame (a post-write re-read would still see the stale dir)
        survivors = {r[0] for r in merged.select(partition_col).distinct().collect()}
        prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        try:
            merged.write.mode("overwrite").partitionBy(partition_col).parquet(path)
        finally:
            spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
        prefix = f"{partition_col}="
        for value, d in value_to_dir.items():
            if value in survivors:
                continue
            part_dir = os.path.join(path, d)
            if d.startswith(prefix) and os.path.isdir(part_dir):
                shutil.rmtree(part_dir)
        return

    target = spark.read.parquet(path)
    merged = _merged(target, updates, key)
    staging = f"{path}.staging-{uuid.uuid4().hex[:8]}"
    merged.write.parquet(staging)
    old = f"{path}.old-{uuid.uuid4().hex[:8]}"
    os.rename(path, old)
    os.rename(staging, path)
    shutil.rmtree(old)


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key: str,
    compare_cols: list[str],
) -> DataFrame:
    """Row-level diff between two releases of a keyed table: one row per
    key present in either side, with `status` in
    {'added','removed','changed','unchanged'} — the audit view behind
    merge_upsert (what WILL this merge do?) and dataset-release QA (what
    changed between corpus v1 and v2?).

    `changed` is null-safe per column (NULL -> x, x -> NULL, and value
    edits all count; NULL -> NULL does not), so a nullable metadata column
    can't silently hide an edit.

    Plan: ONE full-outer sort-merge join on `key` (presence markers, not
    outer-side null-probing of data columns, decide added/removed — a
    legitimately all-NULL row is still 'present').  At 100 TB both sides
    shuffle once on the key; with both releases stored key-bucketed
    (sources.write_table(buckets=(n, key))) the exchanges vanish and the
    diff is a zip-merge of co-located buckets — plan-gated in
    tests/test_round6b_ops.py.  Output is key + status + both sides'
    compared columns (old_/new_ prefixed), so downstream can aggregate or
    materialize the delta without re-joining.
    """
    o = old.select(
        F.col(key),
        F.lit(1).alias("__in_old"),
        F.struct(*[F.col(c) for c in compare_cols]).alias("__old"),
    )
    n = new.select(
        F.col(key),
        F.lit(1).alias("__in_new"),
        F.struct(*[F.col(c) for c in compare_cols]).alias("__new"),
    )
    j = o.join(n, on=key, how="full_outer")
    status = (
        F.when(F.col("__in_old").isNull(), F.lit("added"))
        .when(F.col("__in_new").isNull(), F.lit("removed"))
        .when(~F.col("__old").eqNullSafe(F.col("__new")), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    return j.select(
        F.col(key),
        status.alias("status"),
        *[F.col(f"__old.{c}").alias(f"old_{c}") for c in compare_cols],
        *[F.col(f"__new.{c}").alias(f"new_{c}") for c in compare_cols],
    )
