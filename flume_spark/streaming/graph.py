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

from pyspark.sql import DataFrame


class EdgeIngestor:
    """foreachBatch handler that appends each micro-batch of edges to the
    src-bucketed edge index (`operators.graph.append_edge_index`) under
    `ingest_batch = batch_id`, with degree correctness delegated to
    `read_edge_index` (window-derived, exchange-free) until `compact()`
    merges degrees back into the stored decoration.

    Exactly-once is TWO layers deep, because stale degrees — unlike the
    LshIngestor's duplicate candidate rows — would NOT be collapsed by a
    downstream distinct():
    1. the batch-id ledger (streaming/sink.py) skips a batch whose marker
       landed;
    2. for the crash window BETWEEN the index append and the marker, the
       replay checks the table's partition listing first — Spark's write
       commit protocol makes a partition visible only when its job
       committed, so `ingest_batch=<id>` present ⇒ the append completed
       ⇒ the replay skips it instead of doubling every edge (and degree)
       of that batch.

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

    def _committed_batches(self) -> set[int]:
        rows = self.spark.sql(f"SHOW PARTITIONS {self.table_name}").collect()
        return {int(r[0].split("=", 1)[1]) for r in rows}

    def _process(self, batch_df: DataFrame, batch_id: int) -> None:
        from flume_spark.operators import graph

        if batch_df.isEmpty():
            return
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
            return
        if batch_id in self._committed_batches():
            return  # crash-window replay: the append already committed
        graph.append_edge_index(
            batch_df, self.table_name, batch_id, src=self.src, dst=self.dst
        )

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
