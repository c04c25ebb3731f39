"""Persisted SCD Type-2 event-log store: bucket-pruned incremental merge,
watermark-gated compaction.

Storage design: the durable artifact is the RAW attribute-event log — one
row per (key, attr, ts, tiebreak), exact duplicates removed — NOT the
collapsed change log, and NOT the materialized history:
- append-friendly: a merge only ever adds rows (and drops exact-duplicate
  redeliveries).  Storing valid_to would rewrite the previous open version
  on every change.
- late-arrival-safe: collapsing "no-change" rows away is LOSSY under
  unbounded lateness.  Counterexample (found by the hypothesis property
  test in tests/test_round6b_ops.py): stream a@1, a@2 for one key
  collapses to [a@1]; a late b arriving at ts 1.5 makes a@2 a change
  again (regime a | b | a), but the collapsed log has forgotten it — the
  rebuilt history shows b open forever.  So events may only be collapsed
  once no earlier event can still arrive — a WATERMARK promise, exactly
  Structured Streaming's lateness contract.  `scd2_compact(path,
  watermark)` collapses each key's settled prefix (ts < watermark) and
  keeps everything newer raw; history derived on read is unchanged
  because dropping a no-change row from a span nothing can land inside
  anymore never alters the collapse.

Layout: parquet partitioned by `pbucket = pmod(hash(key), n_buckets)`.
An incremental merge partition-prunes its read to the buckets its new
events hash into and rewrites ONLY those buckets — the same
only-touched-partitions property as sources/merge.merge_upsert and the
band-index ingest (operators/dedup.write_band_index).  At 100 TB raise
n_buckets with corpus size; keys never move buckets (hash is Spark's
stable Murmur3), which is the pruning contract.

The reference has no dimension processing (flume moves opaque job
payloads; SURVEY.md §2.5) — this is engine-native warehouse surface, the
incremental sibling of operators/temporal.scd2_history.
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

BUCKET = "pbucket"


def compact_changes(
    df: DataFrame, key: str, attr: str, ts: str, tiebreak: str
) -> DataFrame:
    """Collapse an event stream to its change rows (first row per key +
    every null-safe attr change), keeping the tiebreak so downstream
    ordering stays deterministic.  One shuffle on key.

    ONLY safe on a SETTLED stream — one no earlier event can still join
    (see the module header's late-arrival counterexample).  scd2_compact
    applies it to the below-watermark prefix; scd2_incremental applies it
    at a time-ordered batch cutoff, which is the same promise."""
    w = Window.partitionBy(key).orderBy(ts, tiebreak)
    marked = (
        df.select(key, attr, ts, tiebreak)
        .withColumn("__rn", F.row_number().over(w))
        .withColumn("__prev", F.lag(attr).over(w))
    )
    return marked.filter(
        (F.col("__rn") == 1) | ~F.col(attr).eqNullSafe(F.col("__prev"))
    ).drop("__rn", "__prev")


def _bucketed(df: DataFrame, key: str, n_buckets: int) -> DataFrame:
    return df.withColumn(BUCKET, F.pmod(F.hash(F.col(key)), F.lit(n_buckets)))


def _write_partitioned(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """partitionBy write with each bucket pre-gathered into one task: a
    plain partitionBy(BUCKET) write emits one file per (task x bucket) —
    up to tasks x touched_buckets small files PER MERGE, the same
    fragmentation law write_band_index pre-shuffles away.  Repartitioning
    on the bucket column lands each bucket in exactly one task -> one
    file per bucket dir."""
    df.repartition(F.col(BUCKET)).write.mode(mode).partitionBy(BUCKET).parquet(path)


def scd2_write(
    spark: SparkSession,
    path: str,
    events: DataFrame,
    key: str,
    attr: str,
    ts: str,
    tiebreak: str,
    n_buckets: int = 32,
) -> None:
    """Full build: write the raw event log (exact duplicates dropped)
    partitioned by key bucket.  `tiebreak` must be unique per (key, ts) —
    it is what makes every ordering (and therefore every read-time
    collapse) deterministic across rebuilds and merges.  No collapse
    happens here: a later merge may legally deliver an event INSIDE this
    batch's time span, which is exactly the case collapse cannot survive
    (module header); run scd2_compact behind a watermark instead."""
    ev = (
        events.select(key, attr, ts, tiebreak)
        .dropDuplicates([key, ts, tiebreak])
    )
    _write_partitioned(_bucketed(ev, key, n_buckets), path)


def scd2_merge(
    spark: SparkSession,
    path: str,
    new_events: DataFrame,
    key: str,
    attr: str,
    ts: str,
    tiebreak: str,
    n_buckets: int = 32,
    swap_commit: bool = False,
) -> None:
    """Fold new events (including late arrivals and redeliveries) into the
    stored event log, touching only affected buckets.

    Plan: the distinct buckets of the batch (a bounded collect, <=
    n_buckets scalars) prune the stored read; affected keys' rows are
    split out with a semi/anti join against the batch's distinct keys
    (never a collect of keys); (affected stored rows ∪ batch) dedupes
    exact redeliveries on (key, ts, tiebreak) — cost is the affected
    keys' rows, not the table.  Untouched keys in the same bucket are
    carried through unchanged, and only the touched bucket directories
    are rewritten.  `n_buckets` must match the value the store was
    written with (keys must not move buckets).

    Merge is IDEMPOTENT (re-merging any already-folded batch is a no-op)
    and ORDER-FREE (merging batches in any order yields the same store:
    it is set union of events) — the two properties the streaming
    ingestor's replay safety rides on, pinned by the hypothesis property
    tests in tests/test_round6b_ops.py.

    Commit modes:
    - default: dynamic partition overwrite — simplest, but Spark's commit
      deletes-then-moves per partition, so a crash mid-commit can leave a
      bucket with a SUBSET of its files (untouched keys lost until the
      next full rebuild).  Fine for batch jobs that rerun from source.
    - `swap_commit=True` (what Scd2Ingestor uses): staged write + per-
      bucket atomic rename.  Every bucket is at all times either its old
      or its new complete state except inside the two-rename window,
      where the old dir is parked at `<bucket>.old-<token>` — `scd2_heal`
      restores or clears parked dirs, and merge idempotency makes
      heal-then-replay converge from a crash at ANY point.
      Rename-atomicity is a filesystem property; on object storage the
      ACID path is a Delta/Iceberg table (same stance as queue/store.py).
    """
    # pin the batch once: the lineage below consumes it several times
    # (bucket collect, semi join, anti join, union-dedup) and a streaming
    # micro-batch source would otherwise be re-read for each
    ev = _bucketed(
        new_events.select(key, attr, ts, tiebreak), key, n_buckets
    ).localCheckpoint(eager=True)
    buckets = [r[0] for r in ev.select(BUCKET).distinct().collect()]
    stored = spark.read.parquet(path).filter(F.col(BUCKET).isin(buckets))
    keys = ev.select(key).distinct()
    affected = stored.join(keys, key, "semi").drop(BUCKET)
    untouched = stored.join(keys, key, "left_anti").drop(BUCKET)
    merged = (
        affected.unionByName(ev.drop(BUCKET))
        .dropDuplicates([key, ts, tiebreak])
    )
    out = _bucketed(untouched.unionByName(merged), key, n_buckets)
    # break lineage from the files about to be overwritten (same stance as
    # sources/merge.merge_upsert)
    out = out.localCheckpoint(eager=True)
    if swap_commit:
        staging = f"{path.rstrip('/')}.staging-{uuid.uuid4().hex[:8]}"
        _write_partitioned(out, staging)
        for b in buckets:
            live = os.path.join(path, f"{BUCKET}={b}")
            staged = os.path.join(staging, f"{BUCKET}={b}")
            if not os.path.isdir(staged):
                continue
            parked = f"{live}.old-{uuid.uuid4().hex[:8]}"
            had_old = os.path.isdir(live)
            if had_old:
                os.rename(live, parked)
            os.rename(staged, live)
            if had_old:
                shutil.rmtree(parked)
        shutil.rmtree(staging, ignore_errors=True)
        return
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        _write_partitioned(out, path)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)


def scd2_compact(
    spark: SparkSession,
    path: str,
    watermark,
    key: str,
    attr: str,
    ts: str,
    tiebreak: str,
    n_buckets: int = 32,
) -> None:
    """Collapse each key's SETTLED prefix — rows with ts < `watermark` —
    to change rows, keeping everything at or after the watermark raw.
    The maintenance pass that bounds log growth for chatty keys whose
    attribute rarely changes.

    CONTRACT (caller's promise, the same one Structured Streaming's
    withWatermark makes): no future merge will deliver an event with
    ts < watermark.  Under it the collapse is exact: a dropped no-change
    row could only ever matter again if a later event landed BEFORE it
    (module header's counterexample), which the promise rules out.  The
    boundary is also safe: the prefix's last CHANGE row survives carrying
    the regime's attr and start, so post-watermark rows compare against
    exactly what a full-history collapse would see.

    Whole-store rewrite through a staging swap (the compact_band_index
    protocol): staging is re-runnable before the swap; a crash between
    the two renames leaves the data parked at `<path>.old-<token>`, which
    `scd2_heal` restores automatically (Scd2Ingestor heals before every
    batch, so a crashed compaction can never make the ingestor
    re-initialize an apparently-missing store).
    """
    wm = F.lit(watermark) if not isinstance(watermark, F.Column) else watermark
    # one parquet scan, not one per branch: both the settled and the
    # recent filter read from the pinned copy (which also parallels
    # scd2_merge's lineage-break stance for the swap below)
    log = spark.read.parquet(path).localCheckpoint(eager=True)
    wm = wm.cast(log.schema[ts].dataType)
    # NULL-ts rows belong to neither `< wm` nor `>= wm` under SQL
    # three-valued logic — route them to the RAW side explicitly (they
    # sort before everything in the read-time collapse and must never be
    # silently dropped, nor collapsed: the watermark promise says nothing
    # about null-ts arrivals)
    below = F.coalesce(F.col(ts) < wm, F.lit(False))
    settled = compact_changes(log.filter(below), key, attr, ts, tiebreak)
    recent = log.filter(~below).select(key, attr, ts, tiebreak)
    out = _bucketed(settled.unionByName(recent), key, n_buckets)
    out = out.localCheckpoint(eager=True)
    staging = f"{path.rstrip('/')}.compacting-{uuid.uuid4().hex[:8]}"
    _write_partitioned(out, staging)
    old = f"{path.rstrip('/')}.old-{uuid.uuid4().hex[:8]}"
    os.rename(path, old)
    os.rename(staging, path)
    shutil.rmtree(old)


def scd2_heal(path: str) -> tuple[int, int]:
    """Recover from a crash inside scd2_merge's swap commit: for every
    parked `pbucket=K.old-<token>` dir, restore it if its live dir is
    missing (crash between the two renames) or clear it if the live dir
    exists (crash after the swap, before cleanup).  Also reclaims
    orphaned `<path>.staging-*` sibling dirs — a crash before/inside the
    swap loop strands one, and every replayed merge writes a fresh one,
    so stale stagings are always dead data.  Returns (restored, cleared);
    safe to run unconditionally — a clean store is a no-op."""
    restored = cleared = 0
    parent, base = os.path.split(path.rstrip("/"))
    if os.path.isdir(parent or "."):
        olds = []
        for d in sorted(os.listdir(parent or ".")):
            if d.startswith(f"{base}.staging-") or d.startswith(
                f"{base}.compacting-"
            ):
                # merge staging and compaction staging are both
                # re-runnable: stale copies are always dead data
                shutil.rmtree(os.path.join(parent, d), ignore_errors=True)
            elif d.startswith(f"{base}.old-"):
                olds.append(d)
        for d in olds:
            # scd2_compact parks the WHOLE store at <path>.old-<token>
            # between its two renames; a crash there leaves no live dir —
            # restore it (re-running the compaction is always safe),
            # never let an ingestor silently re-initialize from scratch.
            if os.path.isdir(path):
                shutil.rmtree(os.path.join(parent, d))
                cleared += 1
            else:
                os.rename(os.path.join(parent, d), path)
                restored += 1
    if not os.path.isdir(path):
        return restored, cleared
    for d in sorted(os.listdir(path)):
        if not (d.startswith(f"{BUCKET}=") and ".old-" in d):
            continue
        live = os.path.join(path, d.split(".old-")[0])
        parked = os.path.join(path, d)
        if os.path.isdir(live):
            shutil.rmtree(parked)
            cleared += 1
        else:
            os.rename(parked, live)
            restored += 1
    return restored, cleared


def scd2_read_history(
    spark: SparkSession, path: str, key: str, attr: str, ts: str, tiebreak: str
) -> DataFrame:
    """Materialize the stored event log as SCD2 history: key, version
    (1-based), attr, valid_from, valid_to (NULL = current).  The change
    collapse, version numbering, and validity lead all happen on read —
    so the storage never goes stale on append, and a compacted and an
    uncompacted store read identically.

    Delegates to `operators.temporal.scd2_history` so the SCD2 semantics
    live in exactly one place."""
    from flume_spark.operators.temporal import scd2_history

    return scd2_history(
        spark.read.parquet(path), key, attr, ts, tiebreak=tiebreak
    )
