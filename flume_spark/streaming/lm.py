"""Streaming ONLINE bigram LM — perplexity-based quality filtering that
learns from the corpus as it arrives.

The batch form (operators/text.py::lm_perplexity) trains on a fixed
reference slice; a stream often has no reference yet — the online form
scores each arriving micro-batch against the add-k bigram counts
accumulated from STRICTLY EARLIER batches (at-ingest verdicts, pinned to
their ingest time and never revisited — the SemanticIngestor mark
discipline applied to a GENERATIVE model), then appends its own counts.
The very first batch has no evidence: its docs score lp_int = 0,
ppl = 1.0, by definition.

Counts are a pure additive integer monoid, so unlike the perceptron
(order-dependent updates needing the sequential contract) the model
state is shuffle-order- and merge-order-immune; what stays order-
dependent is the VERDICT (which prefix a doc was scored against), which
is exactly what the ledger + per-batch mark partitions pin.  The same
exact-integer discipline as the batch op applies — each bigram's
log-prob quantized once to a scaled BIGINT, per-doc scores accumulated
as integer sums — so the declared `stream_lm_perplexity` query is
batch-prefix oracle-able (the DuckDB oracle unrolls one scoring CTE per
batch prefix).

State layout (outside the checkpoint, the LshIngestor contract):
  state_dir/bigrams/ingest_batch=B   (w1, w2, c12)  per-batch counts
  state_dir/unigrams/ingest_batch=B  (tok, c)       per-batch counts
  marks_dir/ingest_batch=B           (id, n_bigrams, lp_int, ppl)
A replayed batch re-scores identically (its own partitions are excluded
by the strict `ingest_batch < batch_id` prefix filter) and overwrites
its own partitions in place; acked replays are ledger-skipped.

Scale shape per batch: one bigram explode + tf aggregate over the batch,
one prefix-count aggregate + hash join whose size is the MODEL (distinct
bigram types — vocabulary-bounded, it plateaus while the corpus grows),
never the corpus.  `compact_state` merges acked count partitions into
one base partition (ingest_batch=-9) so the per-batch prefix read stays
a few files regardless of stream length — same quiesce contract as
SemanticIngestor.maybe_roll_epoch / reencode_epoch.

No reference analog (the queue trains nothing); engine-native per the
LLM-pipeline mandate.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from flume_spark.operators.text import bigram_pairs, tokens_col
from flume_spark.streaming import state
from flume_spark.streaming.state import BASE_PARTITION  # noqa: F401 (re-export)


class LmIngestor:
    """foreachBatch online bigram-LM scorer/trainer.

    Usage:
        ing = LmIngestor(spark, state_dir, marks_dir, ledger_dir)
        stream.writeStream.foreachBatch(ing.process).start()
        ...
        ing.marks()   # (id, n_bigrams, lp_int, ppl) as-of-ingest verdicts
    """

    def __init__(
        self,
        spark,
        state_dir: str,
        marks_dir: str,
        ledger_dir: str,
        id_col: str = "doc_id",
        text_col: str = "text",
        add_k: int = 1,
        scale: int = 1_000_000,
        auto_compact_every: int | None = None,
        compact_mode: str = "tiered",
        fanout: int = 8,
    ) -> None:
        assert compact_mode in ("full", "tiered")
        self.spark = spark
        self.state_dir = state_dir
        self.marks_dir = marks_dir
        self.ledger_dir = ledger_dir
        self.id_col = id_col
        self.text_col = text_col
        self.add_k = add_k
        self.scale = scale
        self.auto_compact_every = auto_compact_every
        self.fanout = fanout
        self.big_dir = os.path.join(state_dir, "bigrams")
        self.uni_dir = os.path.join(state_dir, "unigrams")
        os.makedirs(self.big_dir, exist_ok=True)
        os.makedirs(self.uni_dir, exist_ok=True)
        os.makedirs(marks_dir, exist_ok=True)
        # heal a fold that crashed between its two renames (state.py)
        state.recover_fold(self.big_dir)
        state.recover_fold(self.uni_dir)
        from flume_spark.streaming.sink import idempotent_foreach_batch

        # maintenance cadence (BASELINE.md --lmingest guidance: "run
        # compact_state on a cadence, not never"): a long-lived stream's
        # prefix read stays a few files without anyone remembering to
        # schedule it (the snapshot-GC discipline)
        self.process = state.with_auto_compact(
            idempotent_foreach_batch(self._process, ledger_dir),
            auto_compact_every,
            self.compact_step if compact_mode == "tiered" else self.compact_state,
        )

    # -- state -------------------------------------------------------------

    @staticmethod
    def _has_parquet(path: str) -> bool:
        from flume_spark.streaming.dedup import LshIngestor

        return LshIngestor._has_parquet(path)

    def _prefix_big(self, batch_id: int) -> DataFrame | None:
        """Aggregated bigram counts of strictly earlier batches (the
        compacted base partition is always part of the prefix: compaction
        requires quiesce, so everything in it precedes any live batch)."""
        if not self._has_parquet(self.big_dir):
            return None
        return (
            self.spark.read.parquet(self.big_dir)
            .filter(F.col("ingest_batch") < batch_id)
            .groupBy("w1", "w2")
            .agg(F.sum("c12").alias("c12"))
        )

    def _prefix_vocab(self, batch_id: int) -> DataFrame | None:
        """One-row (v) frame: distinct prefix tokens — rides the scoring
        plan as a broadcast, never a driver value."""
        if not self._has_parquet(self.uni_dir):
            return None
        return (
            self.spark.read.parquet(self.uni_dir)
            .filter(F.col("ingest_batch") < batch_id)
            .agg(F.count_distinct("tok").alias("v"))
        )

    def _batch_acked(self, batch_id: int) -> bool:
        """The ledger MARKER FILE alone (state.batch_acked) — an
        in-memory ack set would defeat the quiesce guard in the crash
        window: _process returns, the marker write fails, a same-session
        compact_state folds the unacked batch, and the ledger replay
        then double-counts its bigrams (round-11 ADVICE).  Unlike the
        SemanticIngestor (whose carried rows stay src_batch-tagged, so
        its probe excludes a replayed batch's copies either way), LM
        counts carry no provenance after the fold — the marker is the
        only safe ack."""
        return state.batch_acked(self.ledger_dir, batch_id)

    def _count_partitions(self, d: str) -> list[int]:
        return state.ingest_partitions(d)

    # -- per-batch score-then-learn ---------------------------------------

    def _process(self, batch_df: DataFrame, batch_id: int) -> None:
        k, scale = self.add_k, self.scale
        # cached, not recomputed per consumer (round-14): the per-doc
        # bigram tf feeds BOTH the scoring leg (marks write) and the
        # learn leg (count write) — uncached, each write re-ran the
        # bigram explode + aggregate over the batch (the LshIngestor
        # nb.cache discipline)
        tf = (
            bigram_pairs(batch_df, self.id_col, self.text_col)
            .groupBy(self.id_col, "w1", "w2")
            .agg(F.count(F.lit(1)).alias("tf"))
            .cache()
        )
        big = self._prefix_big(batch_id)
        vdf = self._prefix_vocab(batch_id)
        if big is None or vdf is None:
            # no prefix dirs at all: every doc scores 0 (v = 0 below
            # covers the empty-prefix case once dirs exist)
            doc = tf.groupBy(self.id_col).agg(
                F.lit(0).cast("long").alias("lp_int")
            )
        else:
            ctx = big.groupBy("w1").agg(F.sum("c12").alias("c1"))
            joined = (
                tf.join(big, ["w1", "w2"], "left")
                .join(F.broadcast(ctx), "w1", "left")
                .crossJoin(F.broadcast(vdf))
            )
            p = (F.coalesce(F.col("c12"), F.lit(0)) + F.lit(k)) / (
                F.coalesce(F.col("c1"), F.lit(0)) + F.lit(k) * F.col("v")
            ).cast("double")
            lp_int = F.when(F.col("v") == 0, F.lit(0).cast("long")).otherwise(
                F.round(F.log(p) * scale).cast("long")
            )
            doc = joined.groupBy(self.id_col).agg(
                F.sum(F.col("tf") * lp_int).alias("lp_int")
            )
        base = batch_df.select(
            F.col(self.id_col).alias("id"),
            F.greatest(
                F.size(tokens_col(self.text_col)) - 1, F.lit(0)
            ).alias("n_bigrams"),
        )
        marks = base.join(
            doc.select(F.col(self.id_col).alias("id"), "lp_int"), "id", "left"
        ).select(
            "id",
            "n_bigrams",
            F.coalesce(F.col("lp_int"), F.lit(0)).cast("long").alias("lp_int"),
            F.round(
                F.exp(
                    -F.coalesce(F.col("lp_int"), F.lit(0))
                    / (F.lit(float(scale)) * F.greatest("n_bigrams", F.lit(1)))
                ),
                6,
            ).alias("ppl"),
        )
        try:
            # the three per-batch writes are mutually independent — marks
            # (scoring, strict-prefix model reads constructed above),
            # bigram counts (off the cached tf), unigram counts (off
            # batch_df) — and target disjoint dirs: overlap them (§2.6,
            # round-15).  Learning stays deterministic per batch — a
            # replay overwrites the same partitions with the same rows.
            from flume_spark.operators.concurrency import overlap

            overlap(
                lambda: marks.write.mode("overwrite").parquet(
                    os.path.join(self.marks_dir, f"ingest_batch={batch_id}")
                ),
                lambda: tf.groupBy("w1", "w2")
                .agg(F.sum("tf").alias("c12"))
                .write.mode("overwrite")
                .parquet(
                    os.path.join(self.big_dir, f"ingest_batch={batch_id}")
                ),
                lambda: batch_df.select(
                    F.explode(tokens_col(self.text_col)).alias("tok")
                )
                .groupBy("tok")
                .agg(F.count(F.lit(1)).alias("c"))
                .write.mode("overwrite")
                .parquet(
                    os.path.join(self.uni_dir, f"ingest_batch={batch_id}")
                ),
            )
        finally:
            # a long-running stream would otherwise accumulate one dead
            # cached frame per trigger
            tf.unpersist()

    # -- reads / maintenance ----------------------------------------------

    def marks(self) -> DataFrame | None:
        """(id, n_bigrams, lp_int, ppl) for every ingested doc, as of its
        OWN ingest time (None if nothing ingested)."""
        if not self._has_parquet(self.marks_dir):
            return None
        return self.spark.read.parquet(self.marks_dir).select(
            F.col("id").alias(self.id_col), "n_bigrams", "lp_int", "ppl"
        )

    def model(self) -> DataFrame | None:
        """The full accumulated bigram model (w1, w2, c12) — e.g. to seed
        a batch lm_perplexity pass or a downstream frozen-model scorer."""
        if not self._has_parquet(self.big_dir):
            return None
        return (
            self.spark.read.parquet(self.big_dir)
            .groupBy("w1", "w2")
            .agg(F.sum("c12").alias("c12"))
        )

    def model_frames(self):
        """The (bigrams, contexts, vocab) triple in lm_perplexity's
        ``model=`` shape — the stream->batch handoff: everything this
        ingestor has learned becomes a frozen batch scorer, equal by
        construction to lm_bigram_model over the same ingested docs
        (counts are an additive monoid).  None if nothing ingested."""
        big = self.model()
        if big is None:
            return None
        ctx = big.groupBy("w1").agg(F.sum("c12").alias("c1"))
        vocab = (
            self.spark.read.parquet(self.uni_dir)
            .agg(F.count_distinct("tok").alias("v"))
        )
        return big, ctx, vocab

    def compact_state(self) -> int:
        """Merge ACKED count partitions into the base partition so the
        per-batch prefix read stays a few files regardless of stream
        length.  Counts are an additive monoid, so the merge is exact by
        construction.  Quiesce contract (the maybe_roll_epoch /
        reencode_epoch convention): raises if any written batch is
        unacknowledged — compacting it would double its rows when the
        ledger replays it.

        Crash safety (state.atomic_fold_swap): the merged counts are
        materialized, written OUTSIDE the read path, and swapped in with
        two atomic renames — additive state can afford neither the
        delete-before-write order (a crash loses the model) nor
        write-base-then-delete (a crash double-counts every folded
        partition); the one rename window is healed at the next
        construction or fold (`recover_fold`).  Returns partitions
        removed."""
        state.quiesce_or_raise(
            sorted(
                {
                    b
                    for d in (self.big_dir, self.uni_dir)
                    for b in self._count_partitions(d)
                }
            ),
            self.ledger_dir,
            "compact_state",
        )
        removed = 0
        for d, keys, cnt in (
            (self.big_dir, ["w1", "w2"], "c12"),
            (self.uni_dir, ["tok"], "c"),
        ):
            parts = self._count_partitions(d)
            if len(parts) <= 1:
                continue
            merged = (
                self.spark.read.parquet(d)
                .groupBy(*keys)
                .agg(F.sum(cnt).alias(cnt))
                .localCheckpoint(eager=True)
            )
            state.atomic_fold_swap(
                d,
                lambda tmp, m=merged: m.write.parquet(
                    os.path.join(tmp, f"ingest_batch={BASE_PARTITION}")
                ),
            )
            removed += len(parts)
        return removed

    def compact_step(self, fanout: int | None = None) -> int:
        """Tiered (LSM-style) maintenance round over BOTH count
        directories — the long-lived alternative to the monolithic
        `compact_state` (which re-sums the ENTIRE model every fold,
        O(model^2/N) cumulative): fresh acked count partitions merge by
        groupBy-SUM into a level-1 run (counts are an additive monoid,
        so a partial merge is exact); `fanout` runs at a level fold one
        level up (state.tiered_compact — hardlinked staging, the same
        atomic_fold_swap crash contract per step).  Runs on the
        auto_compact_every cadence BY DEFAULT (compact_mode="tiered",
        round-14 — the measured-sublinear arm); compact_mode="full"
        restores the monolithic re-sum."""
        from flume_spark.streaming import state as st

        removed = 0
        for d, keys, cnt in (
            (self.big_dir, ["w1", "w2"], "c12"),
            (self.uni_dir, ["tok"], "c"),
        ):

            def merge_write(fold_ids, run_dir, d=d, keys=keys, cnt=cnt):
                (
                    self.spark.read.parquet(d)
                    .filter(F.col("ingest_batch").isin(fold_ids))
                    .groupBy(*keys)
                    .agg(F.sum(cnt).alias(cnt))
                    .write.parquet(run_dir)
                )

            removed += st.tiered_compact(
                d,
                self.ledger_dir,
                merge_write,
                fanout=self.fanout if fanout is None else fanout,
                what="compact_step",
            )
        return removed
