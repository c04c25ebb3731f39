"""Streaming frequency telemetry — per-micro-batch count-min sketches.

The streaming realization of operators/skew.countmin_table for an
unbounded stream: each micro-batch's keys are sketched into a d x w
counter table written to a per-batch partition, and any reader answers
"how often has key k appeared so far / in this slice range" by cell-wise
merging the partitions it cares about (countmin_merge) — O(d*w) state
per batch regardless of key cardinality, no stream-side stateful
operator at all.

This is the heavy-hitter telemetry shape for a 100 TB ingest: frequency
questions over any time slice without retaining the keys themselves.
Exactly-once per the streaming/sink.py ledger contract: per-batch
OVERWRITE locations make a replayed batch converge instead of
double-counting.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F


class CmsIngestor:
    """foreachBatch handler: sketch each arriving batch, append the table.

    Usage:
        ing = CmsIngestor(spark, sketch_dir, ledger_dir, key_col="user_id")
        stream.writeStream.foreachBatch(ing.process).start()
        ...
        ing.merged()          # whole-history sketch table
        ing.estimate(keys_df) # per-key frequency estimates so far
    """

    def __init__(
        self,
        spark,
        sketch_dir: str,
        ledger_dir: str,
        key_col: str,
        depth: int = 4,
        width: int = 64,
        seed: str = "flume",
        weight_col: str | None = None,
    ) -> None:
        self.spark = spark
        self.sketch_dir = sketch_dir
        self.key_col = key_col
        self.depth = depth
        self.width = width
        self.seed = seed
        self.weight_col = weight_col
        os.makedirs(sketch_dir, exist_ok=True)
        from flume_spark.streaming.sink import idempotent_foreach_batch

        self.process = idempotent_foreach_batch(self._process, ledger_dir)

    def _process(self, batch_df, batch_id: int) -> None:
        from flume_spark.operators.skew import countmin_table

        table = countmin_table(
            batch_df,
            self.key_col,
            depth=self.depth,
            width=self.width,
            seed=self.seed,
            weight_col=self.weight_col,
        )
        # per-batch OVERWRITE partition (sink.py determinism contract):
        # a crash between this write and the ledger marker replays the
        # batch, and the overwrite converges where an append would
        # double-count the batch's events
        table.write.mode("overwrite").parquet(
            os.path.join(self.sketch_dir, f"ingest_batch={batch_id}")
        )

    def _has_parquet(self) -> bool:
        return any(
            f.endswith(".parquet")
            for dirpath, _, files in os.walk(self.sketch_dir)
            if "_temporary" not in dirpath
            for f in files
        )

    def merged(self):
        """The whole-history sketch (None before the first batch)."""
        from flume_spark.operators.skew import countmin_merge

        if not self._has_parquet():
            return None
        slices = self.spark.read.parquet(self.sketch_dir).select(
            "row", "bucket", "counter"
        )
        return countmin_merge(slices)

    def estimate(self, keys_df):
        """Frequency estimates for each key seen so far (CMS bounds:
        never under-counts, over-counts <= eps*N)."""
        from flume_spark.operators.skew import countmin_estimate

        table = self.merged()
        if table is None:
            return keys_df.select(
                F.col(self.key_col), F.lit(0).cast("long").alias("freq_estimate")
            ).filter(F.lit(False))
        return countmin_estimate(
            table,
            keys_df,
            self.key_col,
            depth=self.depth,
            width=self.width,
            seed=self.seed,
        )


class HistIngestor:
    """foreachBatch handler: histogram each arriving batch, append the
    (bin, counter) table — per-batch quantile telemetry with O(bins)
    state per slice (the CmsIngestor treatment applied to the fixed-bin
    histogram sketch, operators/skew.py histogram_table).

    Usage:
        ing = HistIngestor(spark, dir, ledger, value_col="v", lo=0, hi=1e6)
        stream.writeStream.foreachBatch(ing.process).start()
        ...
        ing.merged()                  # whole-history histogram
        ing.quantiles([0.5, 0.99])    # estimates, error <= one bin width
    """

    def __init__(
        self,
        spark,
        sketch_dir: str,
        ledger_dir: str,
        value_col: str,
        lo: float,
        hi: float,
        bins: int = 256,
        weight_col: str | None = None,
    ) -> None:
        self.spark = spark
        self.sketch_dir = sketch_dir
        self.value_col = value_col
        self.lo = lo
        self.hi = hi
        self.bins = bins
        self.weight_col = weight_col
        os.makedirs(sketch_dir, exist_ok=True)
        from flume_spark.streaming.sink import idempotent_foreach_batch

        self.process = idempotent_foreach_batch(self._process, ledger_dir)

    def _process(self, batch_df, batch_id: int) -> None:
        from flume_spark.operators.skew import histogram_table

        table = histogram_table(
            batch_df,
            self.value_col,
            self.lo,
            self.hi,
            bins=self.bins,
            weight_col=self.weight_col,
        )
        # per-batch OVERWRITE partition: replayed batches converge
        # (sink.py determinism contract, same as CmsIngestor)
        table.write.mode("overwrite").parquet(
            os.path.join(self.sketch_dir, f"ingest_batch={batch_id}")
        )

    def _has_parquet(self) -> bool:
        return any(
            f.endswith(".parquet")
            for dirpath, _, files in os.walk(self.sketch_dir)
            if "_temporary" not in dirpath
            for f in files
        )

    def merged(self):
        """The whole-history histogram (None before the first batch)."""
        from flume_spark.operators.skew import histogram_merge

        if not self._has_parquet():
            return None
        slices = self.spark.read.parquet(self.sketch_dir).select("bin", "counter")
        return histogram_merge(slices)

    def quantiles(self, qs: list[float]):
        """(q, n_total, bin, est_hi) over everything seen so far; the
        estimate is the crossing bin's upper edge (error <= one bin
        width — never under the true quantile)."""
        from flume_spark.operators.skew import histogram_quantile_est

        table = self.merged()
        if table is None:
            return None
        return histogram_quantile_est(table, qs, self.lo, self.hi, self.bins)


class HllIngestor:
    """foreachBatch handler: deterministic-HLL registers per batch, merged
    on read — the DISTINCT-count member of the streaming sketch family
    (CmsIngestor = frequency, HistIngestor = quantiles).

    Each micro-batch writes its own register table (<= 2^p rows per key)
    to a per-batch OVERWRITE partition; `estimate()` max-merges all
    partitions.  Register max is idempotent, so this ingestor is doubly
    replay-safe: the ledger skips acknowledged batches, and even a
    replayed-then-overwritten batch merges to the identical registers —
    distinct counting never double-counts by construction, which is why
    HLL (not a counter) is the right distinct telemetry for at-least-once
    ingest at 100 TB.
    """

    def __init__(
        self,
        spark,
        sketch_dir: str,
        ledger_dir: str,
        keys: list[str],
        value_col: str,
        p: int = 8,
        seed: str = "hll",
    ) -> None:
        self.spark = spark
        self.sketch_dir = sketch_dir
        self.keys = list(keys)
        self.value_col = value_col
        self.p = p
        self.seed = seed
        os.makedirs(sketch_dir, exist_ok=True)
        from flume_spark.streaming.sink import idempotent_foreach_batch

        self.process = idempotent_foreach_batch(self._process, ledger_dir)

    def _process(self, batch_df, batch_id: int) -> None:
        from flume_spark.operators.skew import hll_table

        table = hll_table(
            batch_df, self.keys, self.value_col, p=self.p, seed=self.seed
        )
        table.write.mode("overwrite").parquet(
            os.path.join(self.sketch_dir, f"ingest_batch={batch_id}")
        )

    def _has_parquet(self) -> bool:
        return any(
            f.endswith(".parquet")
            for dirpath, _, files in os.walk(self.sketch_dir)
            if "_temporary" not in dirpath
            for f in files
        )

    def registers(self):
        """Whole-history register table (None before the first batch)."""
        from flume_spark.operators.skew import hll_merge

        if not self._has_parquet():
            return None
        slices = self.spark.read.parquet(self.sketch_dir).select(
            *self.keys, "bucket", "reg"
        )
        return hll_merge(slices, self.keys)

    def estimate(self):
        """Per-key distinct estimates over everything ingested so far."""
        from flume_spark.operators.skew import hll_estimate

        regs = self.registers()
        if regs is None:
            return None
        return hll_estimate(regs, self.keys, p=self.p)


class PqIngestor:
    """foreachBatch handler: encode arriving vectors against codebooks
    FROZEN per EPOCH and append their codes — the streaming continuation
    of the PQ index (operators/similarity.py): codebooks train once at
    setup (pq_codebooks over a seed corpus), after which encoding is
    per-row and batch-parallel, so the codes table grows append-only
    while staying searchable at any point
    (pq_adc_topk(..., codebooks=ing.codebooks, codes=ing.codes())).

    Replay contract matches the other ingestors: per-batch OVERWRITE
    partition + acknowledgment ledger, and encoding is a pure per-row
    function of (vector, codebooks), so a replayed batch rewrites
    byte-identical codes — doubly convergent.

    Drift response: quantization error vs the frozen codebooks
    (`drift_stats`) rises as arriving data drifts from the training
    corpus.  `reencode_epoch(emb_df)` answers it — retrain codebooks on
    the caller-supplied corpus (the raw vectors live upstream; the codes
    table deliberately doesn't store them — that is the whole point of
    PQ) and re-encode into a NEW epoch namespace, exactly the
    SemanticIngestor roll discipline.  The method REQUIRES a quiesced
    stream (every written batch acknowledged in the ledger) and enforces
    it, because a crash-window replay after a roll would re-encode a
    carried batch into the new epoch twice.  Codebooks persist per epoch
    in a `_epochs` table inside the codes dir, so a restarted ingestor
    resumes the live epoch, not the constructor seed.
    """

    def __init__(
        self,
        spark,
        codes_dir: str,
        ledger_dir: str,
        codebooks,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
        m: int = 8,
        dim: int = 64,
    ) -> None:
        self.spark = spark
        self.codes_dir = codes_dir
        self.ledger_dir = ledger_dir
        self.id_col = id_col
        self.vec_col = vec_col
        self.m = m
        self.dim = dim
        self._epochs_dir = os.path.join(codes_dir, "_epochs")
        os.makedirs(codes_dir, exist_ok=True)
        persisted = self._latest_epoch()
        if persisted is None:
            self.epoch = 0
            self.codebooks = codebooks.localCheckpoint(eager=True)
            self._persist_codebooks()
        else:
            self.epoch, self.codebooks = persisted
        from flume_spark.streaming.sink import idempotent_foreach_batch

        self.process = idempotent_foreach_batch(self._process, ledger_dir)

    # -- epoch state ---------------------------------------------------------

    def _latest_epoch(self):
        if not os.path.isdir(self._epochs_dir):
            return None
        epochs = [
            int(d.split("=", 1)[1])
            for d in os.listdir(self._epochs_dir)
            if d.startswith("epoch=")
        ]
        if not epochs:
            return None
        e = max(epochs)
        cb = self.spark.read.parquet(
            os.path.join(self._epochs_dir, f"epoch={e}")
        ).localCheckpoint(eager=True)
        return e, cb

    def _persist_codebooks(self) -> None:
        self.codebooks.coalesce(1).write.mode("overwrite").parquet(
            os.path.join(self._epochs_dir, f"epoch={self.epoch}")
        )

    def _epoch_path(self) -> str:
        return os.path.join(self.codes_dir, f"epoch={self.epoch}")

    def reencode_epoch(self, emb_df, sign_bits: int = 8, refine_rounds: int = 1):
        """Retrain codebooks on `emb_df` (which must cover every ingested
        vector — the caller owns the raw vectors) and re-encode it into a
        fresh epoch namespace.  Raises if any written batch is
        unacknowledged: the roll must run on a quiesced stream, same
        maintenance-window contract as compact/vacuum.  Returns the new
        epoch number."""
        from flume_spark.operators.similarity import pq_codebooks, pq_encode_arrow

        if os.path.isdir(self._epoch_path()):
            for d in os.listdir(self._epoch_path()):
                if not d.startswith("ingest_batch="):
                    continue
                b = d.split("=", 1)[1]
                marker = os.path.join(self.ledger_dir, f"batch-{b}.done")
                if b != "-9" and not os.path.exists(marker):
                    raise RuntimeError(
                        f"reencode_epoch on a non-quiesced stream: batch {b} "
                        "is written but unacknowledged — let the stream "
                        "drain (or replay) before rolling codebooks"
                    )
        cb = pq_codebooks(
            emb_df,
            id_col=self.id_col,
            vec_col=self.vec_col,
            m=self.m,
            dim=self.dim,
            sign_bits=sign_bits,
            refine_rounds=refine_rounds,
        ).localCheckpoint(eager=True)
        codes = pq_encode_arrow(
            emb_df, cb, self.id_col, self.vec_col, m=self.m, dim=self.dim
        )
        self.epoch += 1
        self.codebooks = cb
        # carry first, codebook table last: a crash mid-roll leaves the
        # old epoch current and the deterministic roll simply re-runs
        codes.write.mode("overwrite").parquet(
            os.path.join(self._epoch_path(), "ingest_batch=-9")
        )
        self._persist_codebooks()
        return self.epoch

    def vacuum_epochs(self) -> int:
        """Delete codes trees and codebook tables of rolled-past epochs
        (reads only touch the current epoch).  Maintenance-window
        contract; returns directories removed."""
        import shutil

        removed = 0
        for root in (self.codes_dir, self._epochs_dir):
            if not os.path.isdir(root):
                continue
            for d in os.listdir(root):
                if d.startswith("epoch=") and int(d.split("=", 1)[1]) < self.epoch:
                    shutil.rmtree(os.path.join(root, d), ignore_errors=True)
                    if root == self.codes_dir:
                        removed += 1
        return removed

    def _process(self, batch_df, batch_id: int) -> None:
        from flume_spark.operators.similarity import pq_encode

        codes = pq_encode(
            batch_df,
            self.codebooks,
            self.id_col,
            self.vec_col,
            m=self.m,
            dim=self.dim,
        )
        codes.write.mode("overwrite").parquet(
            os.path.join(self._epoch_path(), f"ingest_batch={batch_id}")
        )

    def _has_parquet(self) -> bool:
        return any(
            f.endswith(".parquet")
            for dirpath, _, files in os.walk(self._epoch_path())
            if "_temporary" not in dirpath
            for f in files
        )

    def codes(self):
        """The current epoch's whole-history codes table (None before the
        first batch).  After a `reencode_epoch`, history rides in the
        carried `ingest_batch=-9` partition."""
        if not self._has_parquet():
            return None
        return self.spark.read.parquet(self._epoch_path()).select(
            self.id_col, "sub", "code", "dist"
        )

    def drift_stats(self):
        """Per-ingest-batch quantization-error totals — the codebook drift
        monitor: (ingest_batch, n_vectors, total_err2), all exact integers
        aggregated from the distances the index already stores (the
        vectors are never re-scanned).  total_err2 / n_vectors rising
        across batches means arriving data has drifted from the training
        corpus; the response is `reencode_epoch` (the SemanticIngestor
        roll discipline).  None before the first batch."""
        if not self._has_parquet():
            return None
        from pyspark.sql import functions as F

        return (
            self.spark.read.parquet(self._epoch_path())
            .groupBy("ingest_batch")
            .agg(
                F.count_distinct(self.id_col).alias("n_vectors"),
                F.sum("dist").cast("long").alias("total_err2"),
            )
        )
