"""Streaming ONLINE perceptron — model-based filtering that learns as the
corpus arrives.

The batch trainer (operators/text.py::classifier_train) needs a corpus-wide
vocabulary pass before the first update; a stream cannot have one.  The
standard fix is the HASHING TRICK: the feature space is fixed up front as
``bucket = md5(seed:token) % n_buckets`` — no vocabulary, no growth, every
future token already has a slot.  Each micro-batch then applies ONE batch-
perceptron update against the current weights:

    z(doc)    = sum_bucket tf * w[bucket]
    err(doc)  = y - [z > 0]                 in {-1, 0, 1}
    w[bucket] += sum_doc tf * err           (lr = 1)

All arithmetic is INTEGER, so a replayed batch recomputes byte-identical
state — the property that makes the whole stream batch-prefix oracle-able
(the declared `stream_classifier_train` query unrolls the batches as CTEs).

State is the weight vector itself: ``n_buckets`` BIGINTs (a few hundred
bytes), snapshotted per acked batch and recovered from the newest ACKED
snapshot at restart — the crash window (weights written, marker not)
replays against the prior snapshot and overwrites deterministically.
The snapshot is fsync'd (file + directory entry) BEFORE ``_process``
returns, so the wrapper's ack marker can never become durable while the
snapshot it points at is not; a missing newest-acked snapshot at
recovery is therefore corruption and raises instead of silently falling
back to an older model.  Acked snapshots older than ``keep_snapshots``
are pruned after each batch (recovery only ever reads the newest acked
one), so an infinite stream holds a bounded state directory — the same
keep-window discipline as the queue stores' compactors.
Scale shape per batch: one map-side hash of the batch's tokens (the
weights ride into the executors as a 64-element array LITERAL — cheaper
than any join), one per-doc integer aggregate, one bucket-keyed update
aggregate whose result is n_buckets rows (bounded driver collect).

SEQUENTIAL CONTRACT: online training is order-dependent by definition —
process() must see batch ids in increasing order (Structured Streaming's
foreachBatch guarantees this within one checkpoint lineage); the only
replay the ledger admits is the newest unacked batch, which is exactly
the crash-window case the snapshot discipline covers.

No reference analog (the queue trains nothing); engine-native per the
LLM-pipeline mandate — the SemanticIngestor/PqIngestor epoch discipline
applied to a model the stream is LEARNING, not just serving.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from flume_spark.operators.text import tokens_col


def hashed_bucket_col(tok_col: str, n_buckets: int, seed: str) -> "F.Column":
    """The hashing-trick feature index: md5(seed:token) first-8-hex as an
    integer, mod n_buckets.  Identical in DuckDB as
    ``('0x' || substr(md5('<seed>:' || tok), 1, 8))::BIGINT % <n>``."""
    return (
        F.conv(
            F.substring(F.md5(F.concat(F.lit(seed + ":"), F.col(tok_col))), 1, 8),
            16,
            10,
        ).cast("long")
        % n_buckets
    )


class PerceptronIngestor:
    """foreachBatch online perceptron over hashed token features.

    Usage:
        ing = PerceptronIngestor(spark, state_dir, ledger_dir)
        stream.writeStream.foreachBatch(ing.process).start()
        ...
        ing.weights_df()   # (bucket, w_int) — the current model
    """

    def __init__(
        self,
        spark,
        state_dir: str,
        ledger_dir: str,
        id_col: str = "doc_id",
        text_col: str = "text",
        label_col: str = "y",
        n_buckets: int = 64,
        seed: str = "flume-hash",
        keep_snapshots: int = 8,
    ) -> None:
        if keep_snapshots < 1:
            raise ValueError("keep_snapshots must be >= 1")
        self.spark = spark
        self.state_dir = state_dir
        self.ledger_dir = ledger_dir
        self.id_col = id_col
        self.text_col = text_col
        self.label_col = label_col
        self.n_buckets = n_buckets
        self.seed = seed
        self.keep_snapshots = keep_snapshots
        os.makedirs(state_dir, exist_ok=True)
        # SEQUENTIAL CONTRACT enforcement: _process raises on any batch id
        # that is not _last_applied+1 (the next id) or _last_applied itself
        # (the crash-window replay: _process succeeded but the wrapper's
        # ack-marker write failed, so the unmarked batch comes back).  Acked
        # replays never reach _process — the ledger wrapper short-circuits
        # them on the marker.
        acked = self._acked_batches()
        self._max_acked: int | None = acked[-1] if acked else None
        self._last_applied: int | None = self._max_acked
        self.weights: list[int] = self._recover_weights()
        # weights BEFORE the last applied batch — the base a crash-window
        # replay of _last_applied must recompute from (deterministic
        # integer arithmetic makes the recompute byte-identical).
        self._weights_prev: list[int] = list(self.weights)
        from flume_spark.streaming.sink import idempotent_foreach_batch

        self.process = idempotent_foreach_batch(self._process, ledger_dir)

    # -- state -----------------------------------------------------------

    def _snapshot_path(self, batch_id: int) -> str:
        return os.path.join(self.state_dir, f"weights-{batch_id}.json")

    def _acked_batches(self) -> list[int]:
        if not os.path.isdir(self.ledger_dir):
            return []
        out = []
        for f in os.listdir(self.ledger_dir):
            if f.startswith("batch-") and f.endswith(".done"):
                out.append(int(f[len("batch-") : -len(".done")]))
        return sorted(out)

    def _recover_weights(self) -> list[int]:
        """Newest ACKED snapshot, or zeros.  An unacked snapshot (crash
        window) is ignored — its batch replays and overwrites it.

        The newest acked snapshot MUST exist: _process fsyncs it before
        the ack marker is written, so its absence means state corruption
        (e.g. a manually deleted file or a foreign ledger dir).  Falling
        back to an older snapshot here would silently diverge — the ledger
        marker suppresses the batch's replay while its weight update is
        lost — so we raise instead.  Older acked snapshots are expected to
        be pruned (keep_snapshots) and are never read."""
        if self._max_acked is None:
            return [0] * self.n_buckets
        path = self._snapshot_path(self._max_acked)
        if not os.path.exists(path):
            raise RuntimeError(
                f"acked batch {self._max_acked} has no weights snapshot at "
                f"{path}: state is corrupt (the snapshot is fsync'd before "
                "the ack marker, so this cannot be a crash window)"
            )
        with open(path) as fh:
            w = json.load(fh)
        if len(w) != self.n_buckets:
            raise RuntimeError(
                f"snapshot {path} holds {len(w)} weights, expected "
                f"{self.n_buckets}: n_buckets changed mid-lineage?"
            )
        return [int(x) for x in w]

    def _prune_snapshots(self, current_batch: int) -> None:
        """Drop acked snapshots beyond the newest ``keep_snapshots`` —
        recovery only ever reads the newest acked one, so older files are
        dead weight an infinite stream would otherwise accumulate forever
        (mirrors the queue stores' keep-window compaction).  The snapshot
        just written (``current_batch``, not yet acked) and the newest
        acked snapshots are never touched, so the raise-on-missing
        recovery invariant holds through any crash window."""
        acked = [b for b in self._acked_batches() if b != current_batch]
        for b in acked[: -self.keep_snapshots] if len(acked) > self.keep_snapshots else []:
            try:
                os.remove(self._snapshot_path(b))
            except FileNotFoundError:
                pass  # already pruned by an earlier pass

    def weights_df(self) -> DataFrame:
        """The current model as a (bucket, w_int) DataFrame — every bucket
        present, zeros included (matches the oracle's bucket spine)."""
        from flume_spark.session import local_rows

        return local_rows(
            self.spark,
            [(b, int(w)) for b, w in enumerate(self.weights)],
            "bucket long, w_int long",
        )

    # -- per-batch update --------------------------------------------------

    def _process(self, df: DataFrame, batch_id: int) -> None:
        # Online training is order-dependent: legal ids are _last_applied+1
        # (the next batch) or _last_applied itself (in-session crash-window
        # replay — the marker write failed after we returned; recompute
        # from the pre-batch weights, byte-identical by determinism).  Any
        # other id means a foreign checkpoint or a skipped batch — applying
        # it would silently diverge from the batch-prefix oracle.
        if self._last_applied is None or batch_id == self._last_applied + 1:
            base = self.weights
        elif batch_id == self._last_applied:
            base = self._weights_prev
        else:
            raise RuntimeError(
                f"out-of-order batch {batch_id}: expected "
                f"{self._last_applied + 1} (or a crash-window replay of "
                f"{self._last_applied}); newest acked is {self._max_acked}"
            )
        tf = (
            df.select(
                F.col(self.id_col),
                F.col(self.label_col).cast("long").alias("__y"),
                F.explode(tokens_col(self.text_col)).alias("tok"),
            )
            .withColumn(
                "bucket", hashed_bucket_col("tok", self.n_buckets, self.seed)
            )
            .groupBy(self.id_col, "__y", "bucket")
            .agg(F.count(F.lit(1)).alias("tf"))
        )
        # weights ride in as an array LITERAL (n_buckets ints — far below
        # any broadcast threshold, and no join to plan)
        w_arr = F.array(*[F.lit(int(w)) for w in base])
        z = tf.groupBy(self.id_col, "__y").agg(
            F.sum(F.col("tf") * F.element_at(w_arr, F.col("bucket").cast("int") + 1))
            .alias("z")
        )
        err = z.select(
            F.col(self.id_col),
            (F.col("__y") - F.when(F.col("z") > 0, 1).otherwise(0)).alias("err"),
        )
        delta_rows = (
            tf.join(err, self.id_col)
            .groupBy("bucket")
            .agg(F.sum(F.col("tf") * F.col("err")).alias("d"))
            .collect()  # bounded: <= n_buckets rows
        )
        new_w = list(base)
        for r in delta_rows:
            new_w[int(r["bucket"])] += int(r["d"])
        # Durability order: snapshot file fsync'd, then its directory entry,
        # BEFORE we return — only then may the wrapper write the ack marker,
        # so a durable marker implies a durable snapshot (the property
        # _recover_weights relies on to treat a missing acked snapshot as
        # corruption rather than a crash window).
        path = self._snapshot_path(batch_id)
        with open(path, "w") as fh:
            json.dump(new_w, fh)
            fh.flush()
            os.fsync(fh.fileno())
        dir_fd = os.open(self.state_dir, os.O_RDONLY)
        try:
            os.fsync(dir_fd)
        finally:
            os.close(dir_fd)
        self._weights_prev = list(base)
        self._last_applied = batch_id
        self.weights = new_w
        self._prune_snapshots(batch_id)
