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
    ) -> None:
        self.spark = spark
        self.state_dir = state_dir
        self.ledger_dir = ledger_dir
        self.id_col = id_col
        self.text_col = text_col
        self.label_col = label_col
        self.n_buckets = n_buckets
        self.seed = seed
        os.makedirs(state_dir, exist_ok=True)
        self.weights: list[int] = self._recover_weights()
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
        window) is ignored — its batch replays and overwrites it."""
        for b in reversed(self._acked_batches()):
            path = self._snapshot_path(b)
            if os.path.exists(path):
                with open(path) as fh:
                    w = json.load(fh)
                assert len(w) == self.n_buckets
                return [int(x) for x in w]
        return [0] * self.n_buckets

    def weights_df(self) -> DataFrame:
        """The current model as a (bucket, w_int) DataFrame — every bucket
        present, zeros included (matches the oracle's bucket spine)."""
        return self.spark.createDataFrame(
            [(b, int(w)) for b, w in enumerate(self.weights)],
            "bucket long, w_int long",
        )

    # -- per-batch update --------------------------------------------------

    def _process(self, df: DataFrame, batch_id: int) -> None:
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
        w_arr = F.array(*[F.lit(int(w)) for w in self.weights])
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
        new_w = list(self.weights)
        for r in delta_rows:
            new_w[int(r["bucket"])] += int(r["d"])
        with open(self._snapshot_path(batch_id), "w") as fh:
            json.dump(new_w, fh)
        # commit in-memory state only after the snapshot is durable; the
        # ledger marker (written by the wrapper AFTER we return) makes it
        # the recovery point
        self.weights = new_w
