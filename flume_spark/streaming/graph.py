"""Streaming graph ingest — the edge-index refresh path driven by a
Structured-Streaming foreachBatch, mirroring `streaming.dedup.LshIngestor`
(persisted bucketed index, batch-id ledger, periodic compaction).

No reference analog (the reference processes no graphs); engine-native
per the LLM-pipeline/scale mandate — a continuously-growing interaction
graph (co-purchases, citations, link graphs) whose analytics (PageRank /
BFS / SSSP over `operators.graph`) must not pay a full edge rewrite per
snapshot.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame


class EdgeIngestor:
    """foreachBatch handler that appends each micro-batch of edges to the
    src-bucketed edge index (`operators.graph.append_edge_index`) under
    `ingest_batch = batch_id`, with degree correctness delegated to
    `read_edge_index` (window-derived, exchange-free) until `compact()`
    merges degrees back into the stored decoration.

    Exactly-once is TWO layers deep, because duplicated edges — unlike the
    LshIngestor's duplicate candidate rows — would NOT be collapsed by a
    downstream distinct() (they double degrees):
    1. the batch-id ledger (streaming/sink.py) skips a batch whose ledger
       marker landed;
    2. for the crash window BETWEEN the index append and the ledger
       marker, the ingestor keeps its OWN per-batch commit marker,
       written (atomic rename) only after the append's job returns.  A
       partition's mere presence is NOT trusted — Spark's file committers
       can expose a partially-committed partition (v1 moves task outputs
       in one at a time; v2 exposes each task as it commits), so a
       replay that finds the marker absent DROPS any partial
       `ingest_batch=<id>` partition (metadata + files) and re-appends
       the whole batch.  Replays therefore converge to exactly-once
       edges under a crash at ANY point.

    Usage:
        ing = EdgeIngestor(spark, "edges_idx", path, ledger_dir, buckets=32)
        stream.writeStream.foreachBatch(ing.process).start()
        ...
        ranks = pagerank_k_exact(ing.edges(), iters=3)
        ing.compact()   # periodic: degree-merge + file-count reset
    """

    def __init__(
        self,
        spark,
        table_name: str,
        path: str,
        ledger_dir: str,
        buckets: int = 8,
        src: str = "src",
        dst: str = "dst",
    ) -> None:
        self.spark = spark
        self.table_name = table_name
        self.path = path
        self.buckets = buckets
        self.src = src
        self.dst = dst
        from flume_spark.streaming.sink import idempotent_foreach_batch

        self.process = idempotent_foreach_batch(self._process, ledger_dir)

    def _marker_path(self, batch_id: int) -> str:
        return os.path.join(self.path.rstrip("/") + ".batches", str(batch_id))

    def _mark_committed(self, batch_id: int) -> None:
        marker = self._marker_path(batch_id)
        os.makedirs(os.path.dirname(marker), exist_ok=True)
        tmp = marker + ".tmp"
        with open(tmp, "w") as f:
            f.write("done")
        os.rename(tmp, marker)

    def _drop_partial_partition(self, batch_id: int) -> None:
        """Remove any partially-committed `ingest_batch=<id>` partition
        left by a crashed append: catalog entry AND files (the compaction
        pass reads the location with partition discovery, so orphaned
        files must go too)."""
        self.spark.sql(
            f"ALTER TABLE {self.table_name} DROP IF EXISTS "
            f"PARTITION (ingest_batch={batch_id})"
        )
        part_dir = os.path.join(self.path, f"ingest_batch={batch_id}")
        try:
            jpath = self.spark._jvm.org.apache.hadoop.fs.Path(part_dir)
            fs = jpath.getFileSystem(self.spark._jsc.hadoopConfiguration())
            fs.delete(jpath, True)
        except Exception:
            pass  # nothing there, or scheme quirk: the DROP already hides it

    def _process(self, batch_df: DataFrame, batch_id: int) -> None:
        from flume_spark.operators import graph

        if batch_df.isEmpty():
            return
        if os.path.exists(self._marker_path(batch_id)):
            return  # crash-window replay: the append fully committed
        if not self.spark.catalog.tableExists(self.table_name):
            graph.write_edge_index(
                batch_df,
                self.table_name,
                self.path,
                buckets=self.buckets,
                src=self.src,
                dst=self.dst,
                ingest_batch=batch_id,
            )
            self._mark_committed(batch_id)
            return
        # no marker: any existing partition for this id is a partial
        # write from a crashed attempt — drop it, then re-append
        self._drop_partial_partition(batch_id)
        graph.append_edge_index(
            batch_df, self.table_name, batch_id, src=self.src, dst=self.dst
        )
        self._mark_committed(batch_id)

    def edges(self, exclude_batch: int | None = None) -> DataFrame:
        """Iteration-ready (src, dst, out_deg) with always-correct degrees
        (graph.read_edge_index); None-safe: raises if nothing ingested."""
        from flume_spark.operators import graph

        return graph.read_edge_index(
            self.spark, self.table_name, exclude_batch=exclude_batch
        )

    def compact(self) -> int:
        """Degree-merge compaction (graph.compact_edge_index): collapses
        per-batch partitions, restores the stored out_deg decoration, and
        resets file growth to `buckets`.  Run periodically on a long-lived
        stream (each trigger appends `buckets` files)."""
        from flume_spark.operators import graph

        return graph.compact_edge_index(
            self.spark, self.table_name, self.path, buckets=self.buckets
        )
