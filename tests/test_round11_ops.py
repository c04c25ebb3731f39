"""Round-11 operator tests.

Covers:
- PerceptronIngestor hardening: snapshot GC keep-window, fsync-backed
  raise-on-missing-acked-snapshot recovery, sequential-contract
  enforcement, in-session crash-window replay determinism.
- SemanticIngestor table-resident centroid arm: bit-equality vs the
  list-path router across batches, rolls, and restarts; no driver-side
  centroid list in table mode.
"""

from __future__ import annotations

import json
import os

import pytest


def _mk_batch(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string, y int")


BATCHES = [
    [(1, "good clean text", 1), (2, "spam junk text", 0)],
    [(3, "good clean prose", 1), (4, "junk noise spam", 0)],
    [(5, "clean good words", 1), (6, "noise junk blob", 0)],
    [(7, "prose words clean", 1)],
    [(8, "junk spam junk", 0), (9, "good text prose", 1)],
    [(10, "clean clean clean", 1)],
]


def test_perceptron_snapshot_gc_bounds_state_dir(spark, tmp_path):
    """A long stream must hold a bounded snapshot directory: only the
    newest keep_snapshots acked snapshots (plus the in-flight one)
    survive, and crash-window recovery is still green afterwards."""
    from flume_spark.streaming.classifier import PerceptronIngestor

    st, lg = str(tmp_path / "st"), str(tmp_path / "lg")
    ing = PerceptronIngestor(spark, state_dir=st, ledger_dir=lg, keep_snapshots=2)
    for b, rows in enumerate(BATCHES):
        ing.process(_mk_batch(spark, rows), b)

    snaps = sorted(
        int(f[len("weights-") : -len(".json")])
        for f in os.listdir(st)
        if f.startswith("weights-")
    )
    # newest 2 acked (3, 4) + the just-written batch 5; 0..2 pruned
    assert snaps == [3, 4, 5]

    # crash window on the newest batch: marker lost, snapshot kept
    final = list(ing.weights)
    os.remove(f"{lg}/batch-5.done")
    fresh = PerceptronIngestor(
        spark, state_dir=st, ledger_dir=lg, keep_snapshots=2
    )
    with open(f"{st}/weights-4.json") as fh:
        assert fresh.weights == [int(x) for x in json.load(fh)]
    fresh.process(_mk_batch(spark, BATCHES[5]), 5)
    assert fresh.weights == final


def test_perceptron_raises_on_missing_acked_snapshot(spark, tmp_path):
    """The newest ACKED snapshot going missing is corruption (it is
    fsync'd before the marker), not a crash window — recovery must raise
    loudly instead of silently regressing to an older model while the
    ledger suppresses the batch's replay."""
    from flume_spark.streaming.classifier import PerceptronIngestor

    st, lg = str(tmp_path / "st"), str(tmp_path / "lg")
    ing = PerceptronIngestor(spark, state_dir=st, ledger_dir=lg)
    for b, rows in enumerate(BATCHES[:2]):
        ing.process(_mk_batch(spark, rows), b)
    os.remove(f"{st}/weights-1.json")  # marker batch-1.done still present

    with pytest.raises(RuntimeError, match="no weights snapshot"):
        PerceptronIngestor(spark, state_dir=st, ledger_dir=lg)


def test_perceptron_rejects_out_of_order_batch(spark, tmp_path):
    """The sequential contract is enforced, not just documented: a batch
    id that is neither next-expected nor the newest-unacked replay
    raises instead of silently diverging from the batch-prefix oracle."""
    from flume_spark.streaming.classifier import PerceptronIngestor

    st, lg = str(tmp_path / "st"), str(tmp_path / "lg")
    ing = PerceptronIngestor(spark, state_dir=st, ledger_dir=lg)
    ing.process(_mk_batch(spark, BATCHES[0]), 0)
    with pytest.raises(RuntimeError, match="out-of-order batch 3"):
        ing.process(_mk_batch(spark, BATCHES[1]), 3)  # skipped 1, 2
    # a stale id with an existing marker is ledger-skipped, not an error
    before = list(ing.weights)
    ing.process(_mk_batch(spark, BATCHES[0]), 0)
    assert ing.weights == before


def test_perceptron_in_session_replay_recomputes_from_prev(spark, tmp_path):
    """Marker write lost AFTER _process succeeded, same live object: the
    replayed id must recompute from the pre-batch weights (not
    double-apply) and land byte-identical state."""
    from flume_spark.streaming.classifier import PerceptronIngestor

    st, lg = str(tmp_path / "st"), str(tmp_path / "lg")
    ing = PerceptronIngestor(spark, state_dir=st, ledger_dir=lg)
    ing.process(_mk_batch(spark, BATCHES[0]), 0)
    ing.process(_mk_batch(spark, BATCHES[1]), 1)
    final = list(ing.weights)
    os.remove(f"{lg}/batch-1.done")  # marker lost; object still live
    ing.process(_mk_batch(spark, BATCHES[1]), 1)  # streaming replays id 1
    assert ing.weights == final
    with open(f"{st}/weights-1.json") as fh:
        assert [int(x) for x in json.load(fh)] == final
    # and the lineage continues normally afterwards
    ing.process(_mk_batch(spark, BATCHES[2]), 2)


# -- SemanticIngestor table-resident centroid arm ------------------------------


def _sem_ing_assign(spark, base, centroids, cap, assign):
    from flume_spark.streaming.dedup import SemanticIngestor

    return SemanticIngestor(
        spark,
        centroids,
        index_dir=os.path.join(base, "idx"),
        marks_dir=os.path.join(base, "marks"),
        ledger_dir=os.path.join(base, "ledger"),
        threshold=0.9,
        per_cluster_cap=cap,
        assign=assign,
    )


def test_semantic_ingestor_table_arm_bit_equal_to_list(spark, tmp_path):
    """assign='table' must reproduce the list-path router EXACTLY over the
    same batch schedule — marks, epochs, k, and the persisted centroid
    table — including through an epoch roll (the roll draw goes through
    md5_init_centroids_df instead of the driver list, and the carry
    reassignment through kmeans_assign_table)."""
    from tests.test_streaming import _SEM_SCHEMA, _axis_vecs

    seed = [v for _, v in _axis_vecs([0, 1])]
    batches = [
        _axis_vecs([0, 1, 2, 3, 4, 5]),  # fills k=2 past cap -> next rolls
        _axis_vecs([10, 11]),            # roll happens at head of this one
        _axis_vecs([13, 20]),            # post-roll marks vs carried index
    ]
    ings = {
        mode: _sem_ing_assign(spark, str(tmp_path / mode), seed, 2, mode)
        for mode in ("hierarchical", "table")
    }
    for b, rows in enumerate(batches):
        for ing in ings.values():
            ing._process(spark.createDataFrame(rows, _SEM_SCHEMA), batch_id=b)

    hier, tab = ings["hierarchical"], ings["table"]
    assert tab.epoch == hier.epoch == 1
    assert tab.k == hier.k > 2
    hm = {tuple(r) for r in hier.dup_marks().collect()}
    tm = {tuple(r) for r in tab.dup_marks().collect()}
    assert tm == hm
    # the persisted epoch centroid tables are row-identical
    ch = sorted(
        (r["cluster"], tuple(r["vec"]))
        for r in hier._read_epoch_table().collect()
    )
    ct = sorted(
        (r["cluster"], tuple(r["vec"]))
        for r in tab._read_epoch_table().collect()
    )
    assert ct == ch
    # table mode never materialized the centroid list on the driver
    assert tab._centroid_list is None


def test_semantic_ingestor_table_arm_restart_stays_table_resident(spark, tmp_path):
    """A restarted table-mode ingestor resumes from the persisted epoch
    table without ever collecting it (only k, a count, reaches the
    driver) and keeps marking correctly against pre-restart history."""
    from tests.test_streaming import _SEM_SCHEMA, _axis_vecs

    seed = [v for _, v in _axis_vecs([0, 1])]
    base = str(tmp_path / "t")
    ing = _sem_ing_assign(spark, base, seed, 2, "table")
    ing._process(
        spark.createDataFrame(_axis_vecs(range(6)), _SEM_SCHEMA), batch_id=0
    )
    ing._process(
        spark.createDataFrame(_axis_vecs([10]), _SEM_SCHEMA), batch_id=1
    )
    assert ing.epoch == 1

    re = _sem_ing_assign(spark, base, seed, 2, "table")
    assert re.epoch == 1 and re.k == ing.k
    assert re._centroid_list is None
    re._process(
        spark.createDataFrame(_axis_vecs([13]), _SEM_SCHEMA), batch_id=2
    )
    marks = {r["vec_id"]: r["dup_of"] for r in re.dup_marks().collect()}
    assert marks[13] == 5  # axis 5: dup of pre-restart, pre-roll id 5
    assert re._centroid_list is None  # still no driver-side list


def test_semantic_auto_mode_escalates_to_table(spark, tmp_path):
    """auto resolves exact -> hierarchical -> table as k crosses the
    thresholds; the default table_threshold keeps today's small-k streams
    on the list paths (hash-green queries unchanged)."""
    from tests.test_streaming import _axis_vecs

    ing = _sem_ing_assign(
        spark, str(tmp_path / "a"), [v for _, v in _axis_vecs([0, 1])], 2, "auto"
    )
    assert ing._mode(2) == "exact"
    assert ing._mode(64) == "exact"
    assert ing._mode(65) == "hierarchical"
    assert ing._mode(ing.table_threshold) == "hierarchical"
    assert ing._mode(ing.table_threshold + 1) == "table"


# -- bigram LM perplexity filter ----------------------------------------------


def _lm_reference(rows, ref_ids, scale=1_000_000):
    """Brute-force add-1 bigram LM: token/bigram semantics mirror
    tokens_col (regex \\s+ split of lower(trim(text)) — an empty text
    yields [''])."""
    import math
    import re

    def toks(t):
        return re.split(r"\s+", t.strip().lower())

    def rnd(x):
        return int(math.floor(x + 0.5)) if x >= 0 else int(math.ceil(x - 0.5))

    big, ctx, vocab = {}, {}, set()
    for i, t in rows:
        if i in ref_ids:
            ts = toks(t)
            vocab.update(ts)
            for w1, w2 in zip(ts, ts[1:]):
                big[(w1, w2)] = big.get((w1, w2), 0) + 1
                ctx[w1] = ctx.get(w1, 0) + 1
    v = len(vocab)
    out = {}
    for i, t in rows:
        ts = toks(t)
        lp = sum(
            rnd(
                math.log(
                    (big.get((w1, w2), 0) + 1) / float(ctx.get(w1, 0) + v)
                )
                * scale
            )
            for w1, w2 in zip(ts, ts[1:])
        )
        nb = max(len(ts) - 1, 0)
        out[i] = (nb, lp, round(math.exp(-lp / (scale * max(nb, 1))), 6))
    return out


def test_lm_perplexity_matches_bruteforce_reference(spark):
    """lm_perplexity must agree with the brute-force python LM on a mix
    of seen bigrams, unseen bigrams with seen contexts, and fully unseen
    contexts; lp_int exactly (the hash-checked column), ppl to 6dp."""
    from flume_spark.operators.text import lm_perplexity

    rows = [
        (0, "the cat sat on the mat"),
        (1, "the cat ate the hat"),
        (2, "the dog sat on the log"),       # 'dog'/'log' unseen in ref
        (3, "zzz qqq zzz"),                  # fully unseen contexts
        (4, "the cat sat"),
        (5, "single"),                       # no bigrams
        (6, ""),                             # empty text -> [''] token
    ]
    ref_ids = {0, 1, 4}
    df = spark.createDataFrame(rows, "doc_id long, text string")
    ref = df.filter("doc_id IN (0, 1, 4)")
    got = {
        r["doc_id"]: (r["n_bigrams"], r["lp_int"], r["ppl"])
        for r in lm_perplexity(df, "doc_id", "text", ref_df=ref).collect()
    }
    want = _lm_reference(rows, ref_ids)
    assert set(got) == set(want)
    for i in want:
        assert got[i][0] == want[i][0], (i, got[i], want[i])
        assert got[i][1] == want[i][1], (i, got[i], want[i])
        assert abs(got[i][2] - want[i][2]) < 2e-6, (i, got[i], want[i])


def test_lm_perplexity_property_reference(spark):
    """Randomized corpora over a small alphabet: lp_int must equal the
    brute-force LM bit-for-bit (integer accumulation is shuffle-order
    immune), across every seen/unseen tier hypothesis finds."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from flume_spark.operators.text import lm_perplexity

    @given(
        texts=st.lists(
            st.lists(
                st.sampled_from(["aa", "bb", "cc", "dd"]), max_size=6
            ).map(" ".join),
            min_size=1,
            max_size=12,
        )
    )
    @settings(max_examples=10, deadline=None)
    def run(texts):
        rows = list(enumerate(texts))
        ref_ids = {i for i, _ in rows if i % 2 == 0}
        df = spark.createDataFrame(rows, "doc_id long, text string")
        got = {
            r["doc_id"]: r["lp_int"]
            for r in lm_perplexity(
                df, "doc_id", "text", ref_df=df.filter("doc_id % 2 = 0")
            ).collect()
        }
        want = _lm_reference(rows, ref_ids)
        assert got == {i: w[1] for i, w in want.items()}

    run()


def test_curate_corpus_lm_filter_stage(spark):
    """curate_corpus(lm_max_ppl=...) drops high-perplexity docs against
    the reference-slice LM and records the stage count; without the
    threshold the pipeline is unchanged."""
    from flume_spark.curation import curate_corpus
    from flume_spark.operators.text import lm_perplexity

    rows = []
    base = "the cat sat on the mat and the dog ran to the log "
    for i in range(12):
        if i % 3 == 2:
            # scrambled junk: no bigram ever seen in the reference slice
            rows.append((i, " ".join(f"x{i}y{j}" for j in range(14))))
        else:
            rows.append((i, base + f"tail{i % 2}"))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    ref = docs.filter("doc_id % 3 = 0")

    ppl = {
        r["doc_id"]: r["ppl"]
        for r in lm_perplexity(docs, "doc_id", "text", ref_df=ref).collect()
    }
    cut = sorted(ppl.values())[len(ppl) // 2]  # keep the natural half
    curated, counts = curate_corpus(
        spark, docs, min_quality=0.0, lm_max_ppl=cut, lm_ref=ref
    )
    expect_keep = {i for i, p in ppl.items() if p <= cut}
    assert counts["lm_filter"] == len(expect_keep)
    assert all(i % 3 != 2 for i in expect_keep)  # junk is what gets cut

    _, counts_off = curate_corpus(spark, docs, min_quality=0.0)
    assert "lm_filter" not in counts_off


# -- batch vs stream funnel divergence ----------------------------------------


def test_funnel_divergence_pinned(spark):
    """The batch funnel (CC near-dup canonicals, global semantic marks)
    and the streaming funnel (at-ingest seniority, frozen pre-drawn
    centroids) intentionally diverge; this pins HOW MUCH on the sf0.001
    corpus so an operator choosing the streaming path has the number
    (VERDICT r10 item 5).  quality/exact agree exactly; near_dup
    disagrees on 5+5 docs (CC collapses transitive chains to one global
    canonical, seniority keeps batch-local canonicals); semantic is the
    big one (different clusterings: batch re-clusters nd-survivors,
    streaming freezes the full-corpus draw)."""
    from flume_spark.queries.llm_ext import funnel_divergence

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(
        "doc_id", "source", "text"
    )
    d = funnel_divergence(spark, docs)
    assert d["quality"] == {"batch_only": 0, "stream_only": 0, "shared": 228}
    assert d["exact"] == {"batch_only": 0, "stream_only": 0, "shared": 228}
    assert d["near_dup"] == {"batch_only": 5, "stream_only": 5, "shared": 209}
    assert d["semantic"] == {"batch_only": 29, "stream_only": 26, "shared": 81}


# -- batch/online hashed-feature trainer parity -------------------------------


def test_hashed_trainer_one_batch_parity_property(spark, tmp_path):
    """classifier_train_hashed(iters=1) and the streaming
    PerceptronIngestor under a ONE-batch schedule share the feature space
    AND the update rule, so their weight vectors must be IDENTICAL for
    any corpus — the bridge that makes batch and online models directly
    comparable (VERDICT r10 item 8)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from flume_spark.operators.text import classifier_train_hashed
    from flume_spark.streaming.classifier import PerceptronIngestor

    case = [0]

    @given(
        rows=st.lists(
            st.tuples(
                st.lists(
                    st.sampled_from(["good", "spam", "text", "junk"]),
                    min_size=1,
                    max_size=5,
                ).map(" ".join),
                st.integers(min_value=0, max_value=1),
            ),
            min_size=1,
            max_size=10,
        )
    )
    @settings(max_examples=8, deadline=None)
    def run(rows):
        docs = spark.createDataFrame(
            [(i, t, y) for i, (t, y) in enumerate(rows)],
            "doc_id long, text string, y int",
        )
        bw = {
            r["bucket"]: r["w_int"]
            for r in classifier_train_hashed(
                docs, "doc_id", "text", "y", iters=1
            ).collect()
        }
        case[0] += 1
        ing = PerceptronIngestor(
            spark,
            state_dir=str(tmp_path / f"st{case[0]}"),
            ledger_dir=str(tmp_path / f"lg{case[0]}"),
        )
        ing.process(docs, 0)
        assert bw == dict(enumerate(ing.weights))

    run()


def test_hashed_trainer_multi_batch_schedules_diverge(spark, tmp_path):
    """The documented divergence: under a MULTI-batch online schedule the
    streaming model's later batches see weights the single-update batch
    trainer never holds.  Constructed case: batch trainer sums errs over
    the whole corpus at w=0 (the y=0 doc contributes nothing, z=0); the
    online model first learns +w from the y=1 doc, then the y=0 doc
    scores z>0 and subtracts — final weights differ."""
    from flume_spark.operators.text import classifier_train_hashed
    from flume_spark.streaming.classifier import PerceptronIngestor

    b0 = [(1, "spam spam", 1)]
    b1 = [(2, "spam spam", 0)]
    docs = spark.createDataFrame(b0 + b1, "doc_id long, text string, y int")
    bw = {
        r["bucket"]: r["w_int"]
        for r in classifier_train_hashed(
            docs, "doc_id", "text", "y", iters=1
        ).collect()
    }
    ing = PerceptronIngestor(
        spark, state_dir=str(tmp_path / "st"), ledger_dir=str(tmp_path / "lg")
    )
    ing.process(spark.createDataFrame(b0, "doc_id long, text string, y int"), 0)
    ing.process(spark.createDataFrame(b1, "doc_id long, text string, y int"), 1)
    ow = dict(enumerate(ing.weights))
    assert ow != bw  # schedules are semantically different — by design
    assert sum(bw.values()) == 2  # one +2 update (y=1 doc), y=0 doc inert
    assert sum(ow.values()) == 0  # +2 then -2: the online correction


# -- streaming online bigram LM (streaming/lm.LmIngestor) ---------------------


def _lm_ing(spark, tmp_path, tag=""):
    from flume_spark.streaming.lm import LmIngestor

    return LmIngestor(
        spark,
        state_dir=str(tmp_path / f"lm_state{tag}"),
        marks_dir=str(tmp_path / f"lm_marks{tag}"),
        ledger_dir=str(tmp_path / f"lm_ledger{tag}"),
    )


_LM_BATCHES = [
    [(0, "the cat sat on the mat")],
    [(1, "the cat sat on the log"), (2, "zzz qqq")],
    [(3, "the cat sat on the mat"), (4, "the dog")],
]


def _lm_schema(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_lm_ingestor_scores_against_batch_prefix(spark, tmp_path):
    """Verdicts are at-ingest-time: batch 0 scores 0/1.0 (no evidence);
    later batches score against strictly-earlier counts and their marks
    equal the batch operator trained on exactly that prefix."""
    from flume_spark.operators.text import lm_perplexity

    ing = _lm_ing(spark, tmp_path)
    for b, rows in enumerate(_LM_BATCHES):
        ing.process(_lm_schema(spark, rows), b)

    marks = {r["doc_id"]: (r["lp_int"], r["ppl"]) for r in ing.marks().collect()}
    assert marks[0] == (0, 1.0)
    # batch 2's verdicts == batch op with ref = batches 0+1
    ref = _lm_schema(spark, _LM_BATCHES[0] + _LM_BATCHES[1])
    b2 = _lm_schema(spark, _LM_BATCHES[2])
    want = {
        r["doc_id"]: (r["lp_int"], r["ppl"])
        for r in lm_perplexity(b2, "doc_id", "text", ref_df=ref).collect()
    }
    for i in (3, 4):
        assert marks[i] == want[i]


def test_lm_ingestor_replay_and_redelivery_converge(spark, tmp_path):
    """A crash-window replay re-scores identically (its own count
    partitions are excluded by the strict prefix filter); an acked
    re-delivery is ledger-skipped; the accumulated model is unchanged."""
    ing = _lm_ing(spark, tmp_path)
    for b, rows in enumerate(_LM_BATCHES):
        ing.process(_lm_schema(spark, rows), b)
    marks1 = {tuple(r) for r in ing.marks().collect()}
    model1 = {tuple(r) for r in ing.model().collect()}

    # acked re-delivery: ledger skips
    ing.process(_lm_schema(spark, _LM_BATCHES[1]), 1)
    assert {tuple(r) for r in ing.marks().collect()} == marks1

    # crash-window replay: marker removed, _process re-runs batch 2
    import os

    os.remove(str(tmp_path / "lm_ledger") + "/batch-2.done")
    re_ing = _lm_ing(spark, tmp_path)
    re_ing.process(_lm_schema(spark, _LM_BATCHES[2]), 2)
    assert {tuple(r) for r in re_ing.marks().collect()} == marks1
    assert {tuple(r) for r in re_ing.model().collect()} == model1


def test_lm_ingestor_compaction_exact_and_quiesce_guarded(spark, tmp_path):
    """compact_state merges acked count partitions into the base
    partition without changing any future verdict (counts are an additive
    monoid), and raises on a non-quiesced stream."""
    import os

    ing = _lm_ing(spark, tmp_path)
    for b, rows in enumerate(_LM_BATCHES[:2]):
        ing.process(_lm_schema(spark, rows), b)
    model_before = {tuple(r) for r in ing.model().collect()}

    removed = ing.compact_state()
    assert removed == 4  # 2 bigram + 2 unigram partitions merged
    assert {tuple(r) for r in ing.model().collect()} == model_before

    # post-compaction batch scores exactly as the uncompacted twin
    twin = _lm_ing(spark, tmp_path, tag="_twin")
    for b, rows in enumerate(_LM_BATCHES[:2]):
        twin.process(_lm_schema(spark, rows), b)
    ing.process(_lm_schema(spark, _LM_BATCHES[2]), 2)
    twin.process(_lm_schema(spark, _LM_BATCHES[2]), 2)
    assert {tuple(r) for r in ing.marks().collect()} == {
        tuple(r) for r in twin.marks().collect()
    }

    # quiesce guard: an unacked written batch blocks compaction
    os.remove(str(tmp_path / "lm_ledger") + "/batch-2.done")
    fresh = _lm_ing(spark, tmp_path)  # no in-memory ack for batch 2
    with pytest.raises(RuntimeError, match="non-quiesced"):
        fresh.compact_state()


# -- trigram stupid-backoff LM ------------------------------------------------


def test_lm_backoff_matches_bruteforce_reference(spark):
    """lm_backoff_score must agree with a brute-force stupid-backoff
    implementation across all three tiers (seen trigram, bigram backoff,
    unigram-floor backoff); lp_int exactly."""
    import math
    import re

    from flume_spark.operators.text import lm_backoff_score

    rows = [
        (0, "the cat sat on the mat"),
        (1, "the cat sat on the hat"),
        (2, "the cat ran on the mat"),    # 'cat ran' backs off to bigram tier
        (3, "zzz qqq ppp"),               # unigram-floor tier
        (4, "the cat"),                   # no trigrams
    ]
    ref_ids = {0, 1}
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_trigrams"], r["lp_int"])
        for r in lm_backoff_score(
            df, "doc_id", "text", ref_df=df.filter("doc_id <= 1")
        ).collect()
    }

    def toks(t):
        return re.split(r"\s+", t.strip().lower())

    def rnd(x):
        return int(math.floor(x + 0.5)) if x >= 0 else int(math.ceil(x - 0.5))

    tri, bctx, bi, uctx, uni = {}, {}, {}, {}, {}
    n_tot, vocab = 0, set()
    for i, t in rows:
        if i not in ref_ids:
            continue
        ts = toks(t)
        n_tot += len(ts)
        vocab.update(ts)
        for a, b, c in zip(ts, ts[1:], ts[2:]):
            tri[(a, b, c)] = tri.get((a, b, c), 0) + 1
            bctx[(a, b)] = bctx.get((a, b), 0) + 1
        for a, b in zip(ts, ts[1:]):
            bi[(a, b)] = bi.get((a, b), 0) + 1
            uctx[a] = uctx.get(a, 0) + 1
        for a in ts:
            uni[a] = uni.get(a, 0) + 1
    v = len(vocab)
    for i, t in rows:
        ts = toks(t)
        lp = 0
        for a, b, c in zip(ts, ts[1:], ts[2:]):
            if tri.get((a, b, c), 0) > 0:
                s = tri[(a, b, c)] / float(bctx[(a, b)])
            elif bi.get((b, c), 0) > 0:
                s = (2 * bi[(b, c)]) / float(5 * uctx[b])
            else:
                s = (4 * (uni.get(c, 0) + 1)) / float(25 * (n_tot + v))
            lp += rnd(math.log(s) * 1_000_000)
        assert got[i] == (max(len(ts) - 2, 0), lp), (i, got[i], lp)


def test_lm_quality_buckets_two_arms_agree(spark):
    """The exact ntile arm and the broadcast-cuts arm (fed the exact
    arm's own boundaries) must agree whenever ppl values are distinct at
    the boundaries; exact-arm bucket sizes differ by at most 1."""
    from collections import Counter

    from flume_spark.operators.text import lm_quality_buckets

    rows = [(i, 10.0 + i) for i in range(11)]  # distinct ppls
    scored = spark.createDataFrame(rows, "doc_id long, ppl double")
    exact = lm_quality_buckets(scored).collect()
    sizes = Counter(r["bucket"] for r in exact)
    assert max(sizes.values()) - min(sizes.values()) <= 1
    cut1 = max(r["ppl"] for r in exact if r["bucket"] == 1)
    cut2 = max(r["ppl"] for r in exact if r["bucket"] == 2)
    cuts_arm = {
        r["doc_id"]: (r["bucket"], r["label"])
        for r in lm_quality_buckets(scored, cuts=(cut1, cut2)).collect()
    }
    assert cuts_arm == {r["doc_id"]: (r["bucket"], r["label"]) for r in exact}


def test_lm_stream_to_batch_model_handoff(spark, tmp_path):
    """An LmIngestor's accumulated counts, exported via model_frames(),
    must score a batch corpus EXACTLY like lm_perplexity trained on the
    same docs as a reference slice (counts are an additive monoid — the
    stream's per-batch partitions sum to the batch trainer's counts)."""
    from flume_spark.operators.text import lm_perplexity

    ing = _lm_ing(spark, tmp_path, tag="_handoff")
    for b, rows in enumerate(_LM_BATCHES):
        ing.process(_lm_schema(spark, rows), b)

    all_rows = [r for batch in _LM_BATCHES for r in batch]
    ref = _lm_schema(spark, all_rows)
    target = _lm_schema(
        spark, [(100, "the cat sat on the log"), (101, "unseen stuff here")]
    )
    via_stream = {
        tuple(r)
        for r in lm_perplexity(
            target, "doc_id", "text", model=ing.model_frames()
        ).collect()
    }
    via_batch = {
        tuple(r)
        for r in lm_perplexity(target, "doc_id", "text", ref_df=ref).collect()
    }
    assert via_stream == via_batch


def test_curate_corpus_lm_scorer_backoff_arm(spark):
    """curate_corpus(lm_scorer='backoff') routes the LM stage through the
    trigram stupid-backoff scorer; unknown scorers raise."""
    from flume_spark.curation import curate_corpus
    from flume_spark.operators.text import lm_backoff_score

    rows = []
    base = "the cat sat on the mat and the dog ran to the log "
    for i in range(9):
        if i % 3 == 2:
            rows.append((i, " ".join(f"x{i}y{j}" for j in range(14))))
        else:
            rows.append((i, base + f"tail{i % 2}"))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    ref = docs.filter("doc_id % 3 = 0")
    ppl = {
        r["doc_id"]: r["ppl"]
        for r in lm_backoff_score(docs, "doc_id", "text", ref_df=ref).collect()
    }
    cut = sorted(ppl.values())[len(ppl) // 2]
    _, counts = curate_corpus(
        spark, docs, min_quality=0.0, lm_max_ppl=cut, lm_ref=ref,
        lm_scorer="backoff",
    )
    assert counts["lm_filter"] == sum(1 for p in ppl.values() if p <= cut)

    with pytest.raises(ValueError, match="unknown lm_scorer"):
        curate_corpus(
            spark, docs, min_quality=0.0, lm_max_ppl=1.0, lm_scorer="nope"
        )


def test_lm_perplexity_pruned_model_degrades_to_backoff_tier(spark):
    """prune_min_count drops rare bigrams from the model JOIN side but
    keeps their mass in the context denominators: a pruned bigram scores
    exactly the unseen tier k/(c1+kV) (contexts summed BEFORE pruning),
    and bigrams at/above the floor score identically to the unpruned
    model."""
    import math

    from flume_spark.operators.text import lm_perplexity

    ref_rows = [
        (0, "a b a b a b"),   # (a,b) x3, (b,a) x2
        (1, "c d"),           # (c,d) x1 -> pruned at floor 2
    ]
    ref = spark.createDataFrame(ref_rows, "doc_id long, text string")
    target = spark.createDataFrame(
        [(10, "a b"), (11, "c d")], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: r["lp_int"]
        for r in lm_perplexity(
            target, "doc_id", "text", ref_df=ref, prune_min_count=2
        ).collect()
    }
    unpruned = {
        r["doc_id"]: r["lp_int"]
        for r in lm_perplexity(target, "doc_id", "text", ref_df=ref).collect()
    }

    def rnd(x):
        return int(math.floor(x + 0.5)) if x >= 0 else int(math.ceil(x - 0.5))

    v = 4  # vocab: a b c d
    # (a,b): c12=3, c1(a)=3 — survives the floor -> same as unpruned
    assert got[10] == unpruned[10] == rnd(math.log((3 + 1) / (3 + v)) * 1e6)
    # (c,d): pruned -> unseen tier k/(c1+kV) with c1(c) still 1 (pre-prune sum)
    assert got[11] == rnd(math.log(1 / (1 + v)) * 1e6)
    assert got[11] != unpruned[11]


def _backoff_reference(rows, ref_ids, scale=1_000_000):
    """Brute-force stupid-backoff scorer mirroring lm_backoff_score."""
    import math
    import re

    def toks(t):
        return re.split(r"\s+", t.strip().lower())

    def rnd(x):
        return int(math.floor(x + 0.5)) if x >= 0 else int(math.ceil(x - 0.5))

    tri, bctx, bi, uctx, uni = {}, {}, {}, {}, {}
    n_tot, vocab = 0, set()
    for i, t in rows:
        if i not in ref_ids:
            continue
        ts = toks(t)
        n_tot += len(ts)
        vocab.update(ts)
        for a, b, c in zip(ts, ts[1:], ts[2:]):
            tri[(a, b, c)] = tri.get((a, b, c), 0) + 1
            bctx[(a, b)] = bctx.get((a, b), 0) + 1
        for a, b in zip(ts, ts[1:]):
            bi[(a, b)] = bi.get((a, b), 0) + 1
            uctx[a] = uctx.get(a, 0) + 1
        for a in ts:
            uni[a] = uni.get(a, 0) + 1
    v = len(vocab)
    out = {}
    for i, t in rows:
        ts = toks(t)
        lp = 0
        for a, b, c in zip(ts, ts[1:], ts[2:]):
            if tri.get((a, b, c), 0) > 0:
                s = tri[(a, b, c)] / float(bctx[(a, b)])
            elif bi.get((b, c), 0) > 0:
                s = (2 * bi[(b, c)]) / float(5 * uctx[b])
            else:
                s = (4 * (uni.get(c, 0) + 1)) / float(25 * (n_tot + v))
            lp += rnd(math.log(s) * scale)
        out[i] = (max(len(ts) - 2, 0), lp)
    return out


def test_lm_backoff_property_reference(spark):
    """Randomized corpora over a small alphabet: lp_int must equal the
    brute-force stupid-backoff scorer bit-for-bit across whatever tier
    mix hypothesis generates."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from flume_spark.operators.text import lm_backoff_score

    @given(
        texts=st.lists(
            st.lists(
                st.sampled_from(["aa", "bb", "cc"]), max_size=6
            ).map(" ".join),
            min_size=1,
            max_size=10,
        )
    )
    @settings(max_examples=8, deadline=None)
    def run(texts):
        rows = list(enumerate(texts))
        ref_ids = {i for i, _ in rows if i % 2 == 0}
        df = spark.createDataFrame(rows, "doc_id long, text string")
        got = {
            r["doc_id"]: r["lp_int"]
            for r in lm_backoff_score(
                df, "doc_id", "text", ref_df=df.filter("doc_id % 2 = 0")
            ).collect()
        }
        want = _backoff_reference(rows, ref_ids)
        assert got == {i: w[1] for i, w in want.items()}

    run()


def test_stream_semantic_reconcile_as_batch_epoch(spark):
    """BASELINE.md's guidance made measurable: an operator needing
    batch-equivalent semantic verdicts on a streaming corpus runs the
    batch semantic rule as a periodic epoch over the STREAMING survivors.
    Doing so collapses the semantic divergence from 29/26 (at-ingest
    marks, frozen full-corpus centroids) to 4/5 — entirely induced by the
    upstream near-dup membership delta (5/5), i.e. the semantic rule
    itself reconciles exactly."""
    import shutil

    from pyspark.sql import functions as F

    from flume_spark.operators import dedup, multimodal
    from flume_spark.queries.llm_ext import funnel_report, stream_funnel_frames

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(
        "doc_id", "source", "text"
    )
    bf: dict = {}
    funnel_report(spark, docs, frames=bf)
    sframes, root = stream_funnel_frames(spark, docs)
    nd_s = sframes["nd"]
    feats = multimodal.feature_extract_stub(
        multimodal.to_binary_payload(nd_s, "doc_id", "text")
    ).localCheckpoint(eager=True)
    k = max(4, feats.count() // 125)
    marks = dedup.semantic_dedup(feats, "id", "features", k=int(k), threshold=0.999)
    sem_rec = nd_s.join(
        marks.filter(~F.col("is_dup")).select(F.col("id").alias("doc_id")),
        "doc_id",
    )
    b = bf["sem"].select("doc_id")
    s = sem_rec.select("doc_id")
    assert b.join(s, "doc_id", "left_anti").count() == 4
    assert s.join(b, "doc_id", "left_anti").count() == 5
    assert b.join(s, "doc_id", "semi").count() == 106
    shutil.rmtree(root, ignore_errors=True)


# -- perceptual-hash media near-dup -------------------------------------------


def test_phash_pairs_pigeonhole_is_exact(spark):
    """The block join must find EXACTLY the brute-force all-pairs result
    within the hamming budget (pigeonhole guarantee) — recall 1 by
    construction, verified against collected fingerprints."""
    from itertools import combinations

    from flume_spark.operators import multimodal

    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).select("doc_id", "text")
    pay = multimodal.to_binary_payload(docs, "doc_id", "text")
    fp = {
        r["id"]: r["phash"]
        for r in multimodal.perceptual_hash_stub(pay).collect()
    }
    want = {
        (a, b, bin(fp[a] ^ fp[b]).count("1"))
        for a, b in combinations(sorted(fp), 2)
        if bin(fp[a] ^ fp[b]).count("1") <= 3
    }
    got = {
        tuple(r)
        for r in multimodal.phash_pairs(pay, max_hamming=3).collect()
    }
    assert got == want
    assert len(want) > 0  # the corpus actually exercises the join


def test_perceptual_hash_stub_integer_mean_rule(spark):
    """The fingerprint follows the exact-integer downsample-vs-mean rule
    (bits*s_i > sum(samples)) including the empty-payload zero case."""
    from flume_spark.operators import multimodal

    rows = [(1, "abcd" * 16), (2, "")]
    pay = multimodal.to_binary_payload(
        spark.createDataFrame(rows, "doc_id long, text string"), "doc_id", "text"
    )
    got = {
        r["id"]: r["phash"]
        for r in multimodal.perceptual_hash_stub(pay).collect()
    }
    b = ("abcd" * 16).encode()
    n = len(b)
    s = [b[(i * n) // 32] for i in range(32)]
    tot = sum(s)
    want = sum(1 << i for i, v in enumerate(s) if 32 * v > tot)
    assert got == {1: want, 2: 0}


def test_phash_ingestor_marks_and_replay_converge(spark, tmp_path):
    """At-ingest marks: a later near-identical payload dup_of's the
    senior; a crash-window replay (marker lost) re-marks identically
    because the batch's own index partition is excluded from its probe."""
    import os

    from flume_spark.operators import multimodal
    from flume_spark.streaming.dedup import PhashIngestor

    rows = [(1, "abcdefgh" * 8), (2, "zzzz" + "qqqq" * 15)]
    rows2 = [(3, "abcdefgh" * 8)]  # exact payload twin of id 1
    mk = lambda rs: multimodal.to_binary_payload(
        spark.createDataFrame(rs, "doc_id long, text string"), "doc_id", "text"
    )
    ing = PhashIngestor(
        spark,
        index_dir=str(tmp_path / "idx"),
        marks_dir=str(tmp_path / "marks"),
        ledger_dir=str(tmp_path / "lg"),
        id_col="id",
    )
    ing.process(mk(rows), 0)
    ing.process(mk(rows2), 1)
    marks = {r["id"]: r["dup_of"] for r in ing.dup_marks().collect()}
    assert marks[1] is None and marks[3] == 1

    first = {tuple(r) for r in ing.dup_marks().collect()}
    os.remove(str(tmp_path / "lg") + "/batch-1.done")
    re_ing = PhashIngestor(
        spark,
        index_dir=str(tmp_path / "idx"),
        marks_dir=str(tmp_path / "marks"),
        ledger_dir=str(tmp_path / "lg"),
        id_col="id",
    )
    re_ing.process(mk(rows2), 1)
    assert {tuple(r) for r in re_ing.dup_marks().collect()} == first
    # the index layout is band-bucket partitioned (file-level pruning):
    # every ingest partition holds bband= subdirectories
    b0 = str(tmp_path / "idx") + "/ingest_batch=0"
    assert any(d.startswith("bband=") for d in os.listdir(b0)), os.listdir(b0)


def test_frame_containment_pairs_on_clip_twins(spark):
    """Video-dedup semantics on constructed clips: a re-encode sharing
    all 4 frame windows pairs at n_matched=4; a half-overlapping clip
    (2 shared windows) pairs only when min_shared allows it; an
    unrelated payload never pairs."""
    from flume_spark.operators import multimodal

    a = "AAAAAAAA" * 4 + "BBBBBBBB" * 4 + "CCCCCCCC" * 4 + "DDDDDDDD" * 4
    clip = (
        "AAAAAAAA" * 4 + "BBBBBBBB" * 4 + "XYZWXYZW" * 4 + "QRSTQRST" * 4
    )  # shares windows 0,1 with a
    other = "mnopqrst" * 16
    rows = [(1, a), (2, a), (3, clip), (4, other)]
    pay = multimodal.to_binary_payload(
        spark.createDataFrame(rows, "doc_id long, text string"), "doc_id", "text"
    )
    strict = {
        (r["doc_a"], r["doc_b"]): r["n_matched"]
        for r in multimodal.frame_containment_pairs(pay, min_shared=3).collect()
    }
    assert strict == {(1, 2): 4}  # only the full re-encode
    loose = {
        (r["doc_a"], r["doc_b"]): r["n_matched"]
        for r in multimodal.frame_containment_pairs(pay, min_shared=2).collect()
    }
    assert loose[(1, 2)] == 4 and loose[(1, 3)] == 2 and loose[(2, 3)] == 2
    assert not any(4 in p for p in loose)  # unrelated payload never pairs


def test_audio_energy_stub_pcm_reference(spark):
    """The window energy must equal a direct little-endian int16
    computation, including negative samples, the <= silence rule, and
    zero-length windows from sub-16-sample payloads."""
    import struct

    from flume_spark.operators import multimodal

    # 32 samples: a loud ramp then silence-ish noise
    samples = [1000 * i - 8000 for i in range(16)] + [1, -1] * 8
    pcm = struct.pack("<32h", *samples)
    rows = [(1, pcm.decode("latin-1")), (2, "ab")]  # doc 2: 1 sample -> wl 0
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    # latin-1 round-trips bytes 0-255, so payload bytes == pcm bytes
    pay = multimodal.to_binary_payload(docs, "doc_id", "text", encoding="ISO-8859-1")
    got = {
        (r["id"], r["window_idx"]): (r["n_samples"], r["energy"], r["is_silence"])
        for r in multimodal.audio_energy_stub(pay, n_windows=8).collect()
    }
    wl = 32 // 8
    for i in range(8):
        win = samples[i * wl : (i + 1) * wl]
        e = sum(v * v for v in win)
        assert got[(1, i)] == (wl, e, e <= 1000 * wl), (i, got[(1, i)])
    for i in range(8):
        assert got[(2, i)] == (0, 0, True)  # empty windows are silent


def test_semantic_dedup_table_arm_equals_hierarchical(spark):
    """semantic_dedup(assign='table') — the batch twin of the ingestor's
    table arm — must produce marks identical to the hierarchical list
    router (same fine centroids, bit-equal routing)."""
    from flume_spark.operators.dedup import semantic_dedup

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    k = max(4, emb.count() // 25)  # big enough k to exercise routing
    h = {
        tuple(r)
        for r in semantic_dedup(
            emb, "vec_id", "embedding", k=int(k), threshold=0.4,
            assign="hierarchical",
        ).collect()
    }
    t = {
        tuple(r)
        for r in semantic_dedup(
            emb, "vec_id", "embedding", k=int(k), threshold=0.4,
            assign="table",
        ).collect()
    }
    assert t == h


def test_audio_pairs_on_constructed_reencodes(spark):
    """Audio near-dup on constructed signals: a level-shifted re-encode
    keeps its energy envelope (small hamming, pairs); an inverted-envelope
    signal does not pair; pigeonhole result equals brute-force hamming."""
    import math
    import struct
    from itertools import combinations

    from flume_spark.operators import multimodal

    def tone(amp_profile, samples_per_window=8):
        # 32 windows; window i holds a constant-amplitude square wave
        out = []
        for a in amp_profile:
            out += [a, -a] * (samples_per_window // 2)
        return struct.pack(f"<{len(out)}h", *out).decode("ISO-8859-1")

    loud_then_quiet = [3000] * 16 + [10] * 16
    rows = [
        (1, tone(loud_then_quiet)),
        (2, tone([int(a * 0.9) for a in loud_then_quiet])),  # re-encode
        (3, tone([10] * 16 + [3000] * 16)),                  # inverted envelope
    ]
    pay = multimodal.to_binary_payload(
        spark.createDataFrame(rows, "doc_id long, text string"),
        "doc_id",
        "text",
        encoding="ISO-8859-1",
    )
    fp = {
        r["id"]: r["ahash"]
        for r in multimodal.audio_fingerprint_stub(pay).collect()
    }
    assert fp[1] == fp[2]          # envelope survives the level shift
    assert fp[1] != fp[3]
    got = {
        (r["doc_a"], r["doc_b"]): r["hamming"]
        for r in multimodal.audio_pairs(pay, max_hamming=3).collect()
    }
    want = {
        (a, b): bin(fp[a] ^ fp[b]).count("1")
        for a, b in combinations(sorted(fp), 2)
        if bin(fp[a] ^ fp[b]).count("1") <= 3
    }
    assert got == want and (1, 2) in got and (1, 3) not in got
