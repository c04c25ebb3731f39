"""Round-10 hardening tests: null group keys through the grouped Arrow
kernel (VERDICT r09 wrong#2), embeddings-coverage accounting in
curate_corpus(semantic=True) (ADVICE medium), the SemanticIngestor
persisted population state + quiesced roll (VERDICT next#2, ADVICE low),
and the table-resident fine-centroid router (VERDICT next#6)."""

from __future__ import annotations

import pandas as pd
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st


# -- kernels: null group keys --------------------------------------------------


def test_grouped_arrow_apply_keeps_null_key_group(spark):
    """Spark's groupBy().applyInPandas delivers the null-key group to fn;
    the kernel must match, not silently drop those rows (VERDICT r09
    wrong#2: plain == carry mask is always False for NaN and pandas
    groupby defaults to dropna=True)."""
    rows = [(None, 1), (None, 2), ("a", 3), ("a", 4), ("b", 5)]
    df = spark.createDataFrame(rows, "g string, v int")

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        g = pdf["g"].iloc[0]
        return pd.DataFrame(
            {"g": [None if pd.isna(g) else g], "n": [len(pdf)], "s": [int(pdf["v"].sum())]}
        )

    schema = "g string, n int, s long"
    from flume_spark.operators.kernels import grouped_arrow_apply

    key = lambda t: (t[0] is None, t[0] or "")  # noqa: E731
    expect = sorted(
        [
            (r["g"], r["n"], r["s"])
            for r in df.groupBy("g").applyInPandas(fn, schema).collect()
        ],
        key=key,
    )
    got = sorted(
        [
            (r["g"], r["n"], r["s"])
            for r in grouped_arrow_apply(df, ["g"], fn, schema).collect()
        ],
        key=key,
    )
    assert got == expect
    assert (None, 2, 3) in got


@given(
    sizes=st.lists(st.integers(min_value=1, max_value=9), min_size=1, max_size=10),
    cuts=st.lists(st.integers(min_value=1, max_value=80), max_size=8),
    null_at=st.integers(min_value=0, max_value=9),
)
@settings(max_examples=100, deadline=None)
def test_walk_groups_carry_invariant_with_null_key(sizes, cuts, null_at):
    """The round-9 carry property, extended with one group whose key is
    None: fn is still applied exactly once per group — including the
    null-key group — wherever the batch boundaries fall."""
    from flume_spark.operators.kernels import walk_groups

    null_g = null_at % len(sizes)
    rows = []
    for g, n in enumerate(sizes):
        key = None if g == null_g else f"g{g}"
        rows += [(key, g * 1000 + i) for i in range(n)]
    df = pd.DataFrame(rows, columns=["g", "v"])
    total = len(df)
    bounds = sorted({c % (total + 1) for c in cuts} | {0, total})
    batches = [
        df.iloc[a:b].reset_index(drop=True) for a, b in zip(bounds, bounds[1:])
    ]

    seen: dict[object, list[int]] = {}

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        key = pdf["g"].iloc[0]
        key = "<null>" if pd.isna(key) else key
        assert key not in seen, f"group {key} handed to fn twice"
        seen[key] = sorted(int(v) for v in pdf["v"])
        return pd.DataFrame({"g": [key], "n": [len(pdf)]})

    list(walk_groups(iter(batches), ["g"], fn))
    for g, n in enumerate(sizes):
        key = "<null>" if g == null_g else f"g{g}"
        assert seen[key] == [g * 1000 + i for i in range(n)]
    assert len(seen) == len(sizes)


# -- curation: embeddings coverage accounting ----------------------------------


def test_curate_corpus_semantic_uncovered_docs_pass_through(spark):
    """A caller-supplied embeddings table that misses some kept docs must
    NOT silently drop them (ADVICE r09 medium): uncovered docs pass
    through as non-duplicates and the exclusion is counted."""
    from flume_spark.curation import curate_corpus

    rows = [
        (1, " ".join(f"a{i}" for i in range(30))),
        (2, " ".join(f"b{i}" for i in range(30))),
        (3, " ".join(f"c{i}" for i in range(30))),
        (4, " ".join(f"d{i}" for i in range(30))),  # no embedding row
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    emb = spark.createDataFrame(
        [
            (1, [1.0, 0.0]),
            (2, [0.9999, 0.0001]),  # near-identical to doc 1 -> dropped
            (3, [0.0, 1.0]),
        ],
        "doc_id long, embedding array<double>",
    )
    curated, counts = curate_corpus(
        spark, docs, min_quality=0.0, semantic=True, embeddings=emb
    )
    assert counts["semantic_uncovered"] == 1
    assert counts["semantic"] == 3  # 1, 3 survive dedup; 4 passes through
    survivors = {r["doc_id"] for r in curated.collect()}
    assert survivors == {1, 3, 4}


# -- SemanticIngestor: persisted population state + quiesced roll --------------

_SEM_SCHEMA = "vec_id long, embedding array<double>"


def _axis_vecs(ids, dim=8):
    return [(i, [1.0 if j == i % dim else 0.0 for j in range(dim)]) for i in ids]


def _capped_ing(spark, root, cap=2):
    from flume_spark.streaming.dedup import SemanticIngestor

    return SemanticIngestor(
        spark,
        [v for _, v in _axis_vecs([0, 1])],
        index_dir=f"{root}/idx",
        marks_dir=f"{root}/marks",
        ledger_dir=f"{root}/ledger",
        threshold=0.9,
        per_cluster_cap=cap,
    )


def test_semantic_roll_trigger_reads_no_index_in_steady_state(spark, tmp_path):
    """The plan gate for VERDICT r09 wrong#1: with the population under
    the cap, maybe_roll_epoch must decide from the running count alone —
    zero index reads, so the per-batch trigger cost cannot grow with the
    number of ingested files.  And a steady _process must only ever read
    the index bucket-pruned (buckets is never None)."""
    ing = _capped_ing(spark, str(tmp_path), cap=100)
    ing.process(spark.createDataFrame(_axis_vecs(range(6)), _SEM_SCHEMA), 0)
    assert ing._pop == 6

    reads: list[object] = []
    orig = type(ing)._read_index

    def spy(self, exclude_batch_id, buckets=None):
        reads.append(buckets)
        return orig(self, exclude_batch_id, buckets=buckets)

    try:
        type(ing)._read_index = spy
        assert ing.maybe_roll_epoch() is False
        assert reads == []  # under-cap trigger never touched the index
        ing.process(spark.createDataFrame(_axis_vecs([10]), _SEM_SCHEMA), 1)
        assert all(b is not None for b in reads), "unpruned index read in _process"
    finally:
        type(ing)._read_index = orig
    assert ing._pop == 7


def test_semantic_population_recount_excludes_crash_window(spark, tmp_path):
    """A restarted ingestor recomputes the population from ACKED batches
    only: a written-but-unacknowledged partition (the crash window) is
    invisible to the roll trigger, so the replayed batch sees the same
    decision the original run saw."""
    import os

    ing = _capped_ing(spark, str(tmp_path), cap=100)
    ing.process(spark.createDataFrame(_axis_vecs(range(6)), _SEM_SCHEMA), 0)
    ing.process(spark.createDataFrame(_axis_vecs([10, 11]), _SEM_SCHEMA), 1)
    assert ing._pop == 8
    os.remove(f"{tmp_path}/ledger/batch-1.done")  # crash window for batch 1
    fresh = _capped_ing(spark, str(tmp_path), cap=100)
    assert fresh._pop == 6
    # replay through the ledger wrapper re-marks and re-counts batch 1
    fresh.process(spark.createDataFrame(_axis_vecs([10, 11]), _SEM_SCHEMA), 1)
    assert fresh._pop == 8
    marks = {r["vec_id"]: r["dup_of"] for r in fresh.dup_marks().collect()}
    assert marks[10] == 2 and marks[11] == 3  # same-axis seniors


def test_semantic_roll_raises_on_non_quiesced_stream(spark, tmp_path):
    """ADVICE r09: a maintenance-window roll while a written-but-unacked
    batch exists must raise (carrying it would duplicate its rows on
    ledger replay) — the reencode_epoch quiesce contract.  The batch
    being (re)processed stays exempt via exclude_batch."""
    import os

    import pytest as _pytest

    # ingest with a cap high enough that nothing rolls yet
    ing = _capped_ing(spark, str(tmp_path), cap=100)
    ing.process(spark.createDataFrame(_axis_vecs(range(6)), _SEM_SCHEMA), 0)
    ing.process(spark.createDataFrame(_axis_vecs([10, 11]), _SEM_SCHEMA), 1)
    os.remove(f"{tmp_path}/ledger/batch-1.done")
    fresh = _capped_ing(spark, str(tmp_path), cap=2)
    assert fresh._pop == 6  # over cap*k = 2*2 -> the trigger fires
    with _pytest.raises(RuntimeError, match="non-quiesced"):
        fresh.maybe_roll_epoch()
    # the replay path itself is exempt: rolling with batch 1 excluded is
    # exactly what the original _process(batch 1) would have done
    assert fresh.maybe_roll_epoch(exclude_batch=1) is True
    assert fresh.epoch == 1
    assert fresh._pop == 6  # the carry preserved every acked row
