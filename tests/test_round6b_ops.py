"""Round-6 late additions: exact prefix-filter similarity join
(operators/dedup.prefix_filter_pairs) and the deterministic HLL sketch
family (operators/skew.hll_* + streaming HllIngestor)."""

from __future__ import annotations

from itertools import combinations

import pytest

from flume_spark.operators import dedup, skew


# ---------------------------------------------------------------------------
# prefix filtering — losslessness is the whole contract
# ---------------------------------------------------------------------------


def _shingles(text: str, n: int = 2) -> set[str]:
    ws = text.lower().strip().split()
    return {" ".join(ws[i : i + n]) for i in range(len(ws) - n + 1)}


CORPUS = [
    (1, "the quick brown fox jumps over the lazy dog today"),
    (2, "the quick brown fox jumps over the lazy dog today"),  # exact dup
    (3, "the quick brown fox jumps over the lazy cat today"),  # near dup
    (4, "a completely different sentence about spark plans"),
    (5, "a completely different sentence about spark plans here"),  # near dup
    (6, "yet another unrelated document with its own words"),
    (7, "the quick brown fox naps under the lazy dog today"),  # medium sim
]


def _brute_pairs(t_num: int, t_den: int) -> set[tuple[int, int, int, int]]:
    out = set()
    for (ia, ta), (ib, tb) in combinations(CORPUS, 2):
        sa, sb = _shingles(ta), _shingles(tb)
        inter = len(sa & sb)
        union = len(sa | sb)
        if inter * t_den >= t_num * union:  # J >= t
            out.add((ia, ib, inter, union))
    return out


@pytest.mark.parametrize("t_num,t_den", [(1, 2), (4, 5)])
def test_prefix_filter_lossless_vs_bruteforce(spark, t_num, t_den):
    """prefix_filter_pairs == brute-force all-pairs Jaccard at the same
    threshold: recall exactly 1 (the prefix/length prunes are lossless)
    and precision exactly 1 (the verify stage removes false positives)."""
    df = spark.createDataFrame(CORPUS, "doc_id int, text string")
    got = {
        (r.doc_a, r.doc_b, r.inter, r.union_sz)
        for r in dedup.prefix_filter_pairs(
            df, "doc_id", "text", n=2, t_num=t_num, t_den=t_den
        ).collect()
    }
    assert got == _brute_pairs(t_num, t_den)


def test_prefix_filter_jaccard_is_exact_ratio(spark):
    df = spark.createDataFrame(CORPUS, "doc_id int, text string")
    for r in dedup.prefix_filter_pairs(df, "doc_id", "text", t_num=1, t_den=2).collect():
        assert r.jaccard == r.inter / r.union_sz
        assert 0.5 <= r.jaccard <= 1.0


def test_prefix_filter_rejects_bad_threshold(spark):
    df = spark.createDataFrame(CORPUS, "doc_id int, text string")
    with pytest.raises(ValueError):
        dedup.prefix_filter_pairs(df, "doc_id", "text", t_num=5, t_den=5)
    with pytest.raises(ValueError):
        dedup.prefix_filter_pairs(df, "doc_id", "text", t_num=0, t_den=5)


# ---------------------------------------------------------------------------
# deterministic HLL — merge identity, accuracy, replay idempotence
# ---------------------------------------------------------------------------


def test_hll_merge_equals_whole_build(spark):
    """Register tables built per slice and max-merged equal the one-shot
    build over the union — the property that lets per-day sketches answer
    any range without rescans (and the one the sketch_hll oracle pins
    cross-engine)."""
    rows = [(f"g{i % 3}", f"v{i % 511}") for i in range(4000)]
    df = spark.createDataFrame(rows, "grp string, v string")
    whole = skew.hll_table(df, ["grp"], "v", p=6)
    slices = [
        skew.hll_table(df.filter(f"pmod(hash(v), 4) = {s}"), ["grp"], "v", p=6)
        for s in range(4)
    ]
    merged = slices[0]
    for s in slices[1:]:
        merged = merged.unionByName(s)
    got = sorted(map(tuple, skew.hll_merge(merged, ["grp"]).collect()))
    assert got == sorted(map(tuple, whole.collect()))


def test_hll_estimate_within_error_bound(spark):
    """Raw estimate within 3 sigma (sigma ~= 1.04/sqrt(m)) of the true
    cardinality for n >> 2.5m (the raw estimator's valid range)."""
    n_true = 5000
    df = spark.createDataFrame([(f"k{i}",) for i in range(n_true)], "v string")
    est = skew.hll_estimate(skew.hll_table(df, [], "v", p=8), [], p=8).collect()[0]
    sigma = 1.04 / (256**0.5)
    assert abs(est.hll_est - n_true) <= 3 * sigma * n_true
    # harmonic_sum is exact integer state: deterministic across rebuilds
    est2 = skew.hll_estimate(skew.hll_table(df, [], "v", p=8), [], p=8).collect()[0]
    assert est.harmonic_sum == est2.harmonic_sum and est.hll_est == est2.hll_est


def test_hll_register_range(spark):
    """reg in [1, 53] for p=8 (60-bit hash, 52 rho bits + 1) and bucket in
    [0, 255] — the invariants the exact-integer harmonic sum relies on to
    never overflow BIGINT."""
    df = spark.createDataFrame([(str(i),) for i in range(2000)], "v string")
    regs = skew.hll_table(df, [], "v", p=8).collect()
    assert all(0 <= r.bucket < 256 for r in regs)
    assert all(1 <= r.reg <= 53 for r in regs)


def test_hll_estimate_empty_input_is_floor_not_null(spark):
    """A keyless estimate over zero register rows yields the
    all-registers-zero harmonic sum (m * 2^scale) and the raw
    estimator's alpha*m floor — never NULL (the empty-batch aggregate
    class from round-5 ADVICE)."""
    empty = spark.createDataFrame([], "bucket long, reg int")
    est = skew.hll_estimate(empty, [], p=8).collect()[0]
    assert est.n_hit == 0
    assert est.harmonic_sum == 256 * (1 << 53)
    assert est.hll_est is not None and 150 < est.hll_est < 200


def test_hll_ingestor_replay_converges(spark, tmp_path):
    """HllIngestor: ledger skips a replayed batch; merged registers equal
    the one-shot batch build over the union; estimates answer from merged
    state.  Register max is idempotent, so even a forced re-process (new
    ledger) converges to identical state."""
    from flume_spark.streaming.sketch import HllIngestor

    ing = HllIngestor(
        spark, str(tmp_path / "sk"), str(tmp_path / "lg"), keys=["grp"],
        value_col="v", p=6,
    )
    b0 = spark.createDataFrame(
        [(f"g{i % 2}", f"v{i}") for i in range(600)], "grp string, v string"
    )
    b1 = spark.createDataFrame(
        [(f"g{i % 2}", f"v{i + 300}") for i in range(400)], "grp string, v string"
    )
    ing.process(b0, 0)
    ing.process(b1, 1)
    ing.process(b1, 1)  # replay: ledger no-op
    got = sorted(map(tuple, ing.registers().collect()))
    whole = skew.hll_table(b0.unionByName(b1), ["grp"], "v", p=6)
    assert got == sorted(map(tuple, whole.collect()))
    ests = {r.grp: r.hll_est for r in ing.estimate().collect()}
    # ~500 distinct per group (600/2 + 400/2 with 150 overlapping per group)
    for g in ("g0", "g1"):
        assert 250 <= ests[g] <= 750


def test_hll_empty_ingestor_returns_none(spark, tmp_path):
    from flume_spark.streaming.sketch import HllIngestor

    ing = HllIngestor(
        spark, str(tmp_path / "sk"), str(tmp_path / "lg"), keys=[], value_col="v"
    )
    assert ing.registers() is None and ing.estimate() is None


# ---------------------------------------------------------------------------
# engine-identity of the SQL emitters (no Spark needed)
# ---------------------------------------------------------------------------


def test_hll_rho_sql_matches_python():
    """The DuckDB register expression (same shape hll_table emits) equals
    a pure-Python rho over random-ish hashes — pins the bitlength-via-
    bin() trick on both engines' exact semantics."""
    import duckdb

    m, scale = 256, 53
    vals = [0, 1, 2, 255, 256, 12345, 2**52 - 1, 2**59, 2**60 - 1]
    con = duckdb.connect()
    for h60 in vals:
        w = h60 // m
        expected = scale if w == 0 else scale - w.bit_length()
        got = con.execute(
            f"SELECT CASE WHEN {h60} // {m} = 0 THEN {scale} "
            f"ELSE {scale} - length(bin({h60} // {m})) END"
        ).fetchone()[0]
        assert got == expected, h60


# ---------------------------------------------------------------------------
# property test: the prefix-filter pigeonhole bound itself (pure Python)
# ---------------------------------------------------------------------------

from hypothesis import given, settings
from hypothesis import strategies as st


@given(
    data=st.data(),
    t_num=st.integers(min_value=1, max_value=9),
)
@settings(max_examples=300, deadline=None)
def test_prefix_bound_is_lossless_on_random_sets(data, t_num):
    """For random token sets and any global ordering by (frequency, token),
    every pair with J >= t shares a token within BOTH docs' prefixes of
    length n - ceil(t*n) + 1 — the exact pigeonhole
    prefix_filter_pairs stakes its recall on, checked over the whole
    threshold grid t = t_num/10 rather than the two declared settings."""
    t_den = 10
    universe = list(range(20))
    a = data.draw(st.sets(st.sampled_from(universe), min_size=1, max_size=12))
    b = data.draw(st.sets(st.sampled_from(universe), min_size=1, max_size=12))
    inter = len(a & b)
    union = len(a | b)
    if inter * t_den < t_num * union:  # J < t: nothing to guarantee
        return
    # global rarity-first order: df over the 2-doc corpus, token tie-break
    df = {tok: (tok in a) + (tok in b) for tok in a | b}
    order = lambda s: sorted(s, key=lambda tok: (df[tok], tok))

    def prefix(s):
        n = len(s)
        p = n - ((t_num * n + t_den - 1) // t_den) + 1
        return set(order(s)[:p])

    assert prefix(a) & prefix(b), (a, b, t_num)


# ---------------------------------------------------------------------------
# incremental prefix candidates (hash-ordered static prefixes)
# ---------------------------------------------------------------------------


def test_incremental_prefix_candidates_lossless_across_split(spark):
    """Every true J >= t pair that touches a NEW doc appears among the
    candidates (recall 1 across the history/new split), regardless of
    which side each endpoint landed on."""
    df = spark.createDataFrame(CORPUS, "doc_id int, text string")
    history = df.filter("doc_id % 2 = 1")
    new = df.filter("doc_id % 2 = 0")
    cand = {
        (r.doc_new, r.doc_match)
        for r in dedup.incremental_prefix_candidates(
            new, "doc_id", "text", n=2, t_num=1, t_den=2, history=history
        ).collect()
    }
    for a, b, _, _ in _brute_pairs(1, 2):
        if a % 2 == 0:
            assert (a, b) in cand or (b, a) in cand, (a, b)
        elif b % 2 == 0:
            assert (b, a) in cand or (a, b) in cand, (a, b)


def test_hash_ordered_prefix_is_corpus_independent(spark):
    """The append-only property itself: a doc's static-order prefix rows
    are identical whether computed within a 2-doc corpus or the full
    corpus — so per-batch index appends never go stale."""
    full = spark.createDataFrame(CORPUS, "doc_id int, text string")
    sub = full.filter("doc_id <= 2")
    pref = lambda d: sorted(
        map(
            tuple,
            dedup.hash_ordered_prefix(
                dedup.word_shingles(d, "doc_id", "text", 2), 4, 5
            ).collect(),
        )
    )
    full_rows = [r for r in pref(full) if r[0] <= 2]
    assert pref(sub) == full_rows


def test_incremental_prefix_requires_exactly_one_history_arg(spark):
    df = spark.createDataFrame(CORPUS, "doc_id int, text string")
    with pytest.raises(ValueError):
        dedup.incremental_prefix_candidates(df, "doc_id", "text")
    with pytest.raises(ValueError):
        dedup.incremental_prefix_candidates(
            df, "doc_id", "text", history=df, history_prefix=df
        )


# ---------------------------------------------------------------------------
# suggest_hll_p (operators/sizing.py)
# ---------------------------------------------------------------------------


def test_suggest_hll_p_reproduces_declared_setting():
    from flume_spark.operators import sizing

    # the declared sketch_hll query: ~1300 distinct per group at p=8
    # (sigma 6.5%) — a 7% target with that cardinality lands on p=8
    assert sizing.suggest_hll_p(1300, rel_err=0.07) == 8


@given(
    n=st.integers(min_value=0, max_value=10**12),
    err_pct=st.integers(min_value=1, max_value=99),
)
@settings(max_examples=300, deadline=None)
def test_suggest_hll_p_properties(n, err_pct):
    """p in [4,16]; meets the error law unless capped (by 16 or by the
    raw-regime rule); tighter error never yields fewer bits; larger n
    never yields fewer bits (the raw-regime cap only ever relaxes)."""
    from flume_spark.operators.sizing import suggest_hll_p

    err = err_pct / 100
    p = suggest_hll_p(n, err)
    assert 4 <= p <= 16
    capped = p == 16 or (n > 0 and 2.5 * (1 << (p + 1)) > n)
    if not capped:
        assert 1.04 / (1 << p) ** 0.5 <= err
    assert suggest_hll_p(n, err / 2) >= p
    assert suggest_hll_p(n * 2, err) >= p


# ---------------------------------------------------------------------------
# SCD Type-2 history build + point-in-time snapshot (operators/temporal)
# ---------------------------------------------------------------------------


def _scd2_frame(spark):
    rows = [
        # user 1: gold -> gold (collapse) -> silver -> gold
        (1, "gold", "2024-01-01 00:00:00", 1),
        (1, "gold", "2024-01-02 00:00:00", 2),
        (1, "silver", "2024-01-03 00:00:00", 3),
        (1, "gold", "2024-01-05 00:00:00", 4),
        # user 2: null -> null (collapse, null-safe) -> bronze -> null
        (2, None, "2024-01-01 00:00:00", 5),
        (2, None, "2024-01-02 00:00:00", 6),
        (2, "bronze", "2024-01-04 00:00:00", 7),
        (2, None, "2024-01-06 00:00:00", 8),
        # user 3: single event -> one open version
        (3, "gold", "2024-01-10 00:00:00", 9),
    ]
    df = spark.createDataFrame(rows, "uid int, tier string, ts string, eid int")
    return df.withColumn("ts", df.ts.cast("timestamp"))


def test_scd2_history_versions(spark):
    from flume_spark.operators.temporal import scd2_history

    hist = scd2_history(_scd2_frame(spark), "uid", "tier", "ts", tiebreak="eid")
    got = {
        (r.uid, r.version): (r.tier, str(r.valid_from), r.valid_to and str(r.valid_to))
        for r in hist.collect()
    }
    assert got == {
        (1, 1): ("gold", "2024-01-01 00:00:00", "2024-01-03 00:00:00"),
        (1, 2): ("silver", "2024-01-03 00:00:00", "2024-01-05 00:00:00"),
        (1, 3): ("gold", "2024-01-05 00:00:00", None),
        (2, 1): (None, "2024-01-01 00:00:00", "2024-01-04 00:00:00"),
        (2, 2): ("bronze", "2024-01-04 00:00:00", "2024-01-06 00:00:00"),
        (2, 3): (None, "2024-01-06 00:00:00", None),
        (3, 1): ("gold", "2024-01-10 00:00:00", None),
    }


def test_scd2_snapshot_pointwise(spark):
    from pyspark.sql import functions as F

    from flume_spark.operators.temporal import scd2_history, scd2_snapshot

    hist = scd2_history(_scd2_frame(spark), "uid", "tier", "ts", tiebreak="eid")

    def at(s):
        return {
            (r.uid, r.tier)
            for r in scd2_snapshot(hist, F.lit(s).cast("timestamp")).collect()
        }

    # before any history: empty
    assert at("2023-12-31 00:00:00") == set()
    # mid-range: version boundaries are half-open [from, to)
    assert at("2024-01-03 00:00:00") == {(1, "silver"), (2, None)}
    assert at("2024-01-04 12:00:00") == {(1, "silver"), (2, "bronze")}
    # after everything: each user's open version
    assert at("2024-02-01 00:00:00") == {(1, "gold"), (2, None), (3, "gold")}


def test_scd2_history_single_exchange(spark):
    """The whole history build (change lag + version row_number + validity
    lead) shares one hash partitioning on the key: exactly ONE Exchange."""
    from flume_spark.operators.temporal import scd2_history
    from flume_spark.plans import explain_str, n_nodes

    plan = explain_str(
        scd2_history(_scd2_frame(spark), "uid", "tier", "ts", tiebreak="eid")
    )
    assert n_nodes(plan, "Exchange") == 1, plan


# ---------------------------------------------------------------------------
# snapshot_diff — release-to-release table diff (sources/merge.py)
# ---------------------------------------------------------------------------


def test_snapshot_diff_statuses(spark):
    from flume_spark.sources.merge import snapshot_diff

    old = spark.createDataFrame(
        [
            (1, "a", 10.0),
            (2, "b", 20.0),   # price changes in new
            (3, None, 30.0),  # NULL -> value change
            (4, "d", 40.0),   # removed in new
            (5, None, None),  # all-NULL compare cols, unchanged
        ],
        "k int, tag string, price double",
    )
    new = spark.createDataFrame(
        [
            (1, "a", 10.0),
            (2, "b", 25.0),
            (3, "c", 30.0),
            (5, None, None),
            (6, "f", 60.0),   # added
        ],
        "k int, tag string, price double",
    )
    got = {
        r.k: r.status
        for r in snapshot_diff(old, new, "k", ["tag", "price"]).collect()
    }
    assert got == {
        1: "unchanged",
        2: "changed",
        3: "changed",
        4: "removed",
        # presence markers, not data-null probing: an all-NULL row is
        # still PRESENT on both sides -> unchanged (NULL -> NULL no change)
        5: "unchanged",
        6: "added",
    }


def test_snapshot_diff_carries_both_sides(spark):
    from flume_spark.sources.merge import snapshot_diff

    old = spark.createDataFrame([(1, 10.0)], "k int, price double")
    new = spark.createDataFrame([(1, 12.5)], "k int, price double")
    row = snapshot_diff(old, new, "k", ["price"]).collect()[0]
    assert (row.status, row.old_price, row.new_price) == ("changed", 10.0, 12.5)


# ---------------------------------------------------------------------------
# weighted median — distinct-value compaction vs brute-force definition
# ---------------------------------------------------------------------------


def test_weighted_median_matches_bruteforce(spark):
    """Lower weighted median == least value v with sum(w | x <= v) * 2 >=
    total, checked against expanding every row weight into unit rows."""
    import random

    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    rng = random.Random(7)
    rows = [
        (g, float(rng.randint(1, 20)), rng.randint(1, 9))
        for g in ("a", "b") for _ in range(50)
    ]

    def brute(g):
        units = sorted(
            v for gg, v, w in rows if gg == g for _ in range(w)
        )
        # lower median of the expanded multiset
        return units[(len(units) - 1) // 2]

    df = spark.createDataFrame(rows, "g string, v double, w int")
    agg = df.groupBy("g", "v").agg(F.sum(F.col("w").cast("long")).alias("wt"))
    cum = Window.partitionBy("g").orderBy("v")
    tot = Window.partitionBy("g")
    c = agg.withColumn("cumw", F.sum("wt").over(cum)).withColumn(
        "total", F.sum("wt").over(tot)
    )
    got = {
        r.g: r.wm
        for r in c.filter(2 * F.col("cumw") >= F.col("total"))
        .groupBy("g")
        .agg(F.min("v").alias("wm"))
        .collect()
    }
    assert got == {"a": brute("a"), "b": brute("b")}


# ---------------------------------------------------------------------------
# persisted SCD2 change-log store (operators/scd.py)
# ---------------------------------------------------------------------------


def _ev(spark, rows):
    df = spark.createDataFrame(rows, "uid int, tier string, ts string, eid int")
    return df.withColumn("ts", df.ts.cast("timestamp"))


def _hist_rows(spark, path):
    from flume_spark.operators.scd import scd2_read_history

    return {
        (r.uid, r.version, r.tier, str(r.valid_from), r.valid_to and str(r.valid_to))
        for r in scd2_read_history(spark, path, "uid", "tier", "ts", "eid").collect()
    }


ALL_EVENTS = [
    (1, "gold", "2024-01-01 00:00:00", 1),
    (1, "gold", "2024-01-02 00:00:00", 2),
    (1, "silver", "2024-01-03 00:00:00", 3),
    (1, "gold", "2024-01-05 00:00:00", 4),
    (2, None, "2024-01-01 00:00:00", 5),
    (2, "bronze", "2024-01-04 00:00:00", 6),
    (3, "gold", "2024-01-10 00:00:00", 7),
    (4, "iron", "2024-01-02 00:00:00", 8),
]


def test_scd2_store_replay_converges(spark, tmp_path):
    from flume_spark.operators.scd import scd2_merge, scd2_write

    full, incr = str(tmp_path / "full"), str(tmp_path / "incr")
    scd2_write(spark, full, _ev(spark, ALL_EVENTS), "uid", "tier", "ts", "eid")
    # incremental: three arbitrary batches, out of key order
    scd2_write(spark, incr, _ev(spark, ALL_EVENTS[:3]), "uid", "tier", "ts", "eid")
    scd2_merge(spark, incr, _ev(spark, ALL_EVENTS[3:6]), "uid", "tier", "ts", "eid")
    scd2_merge(spark, incr, _ev(spark, ALL_EVENTS[6:]), "uid", "tier", "ts", "eid")
    assert _hist_rows(spark, incr) == _hist_rows(spark, full)


def test_scd2_merge_late_arrival_and_redelivery(spark, tmp_path):
    from flume_spark.operators.scd import scd2_merge, scd2_write

    full, incr = str(tmp_path / "full"), str(tmp_path / "incr")
    late = (1, "bronze", "2024-01-04 00:00:00", 99)  # lands between changes
    scd2_write(
        spark, full, _ev(spark, ALL_EVENTS + [late]), "uid", "tier", "ts", "eid"
    )
    scd2_write(spark, incr, _ev(spark, ALL_EVENTS), "uid", "tier", "ts", "eid")
    scd2_merge(spark, incr, _ev(spark, [late]), "uid", "tier", "ts", "eid")
    # redelivery of an already-folded batch is a no-op
    scd2_merge(spark, incr, _ev(spark, [late] + ALL_EVENTS[:2]), "uid", "tier", "ts", "eid")
    assert _hist_rows(spark, incr) == _hist_rows(spark, full)


def test_scd2_merge_prunes_untouched_buckets(spark, tmp_path):
    import os

    from flume_spark.operators.scd import BUCKET, scd2_merge, scd2_write

    path = str(tmp_path / "store")
    scd2_write(
        spark, path, _ev(spark, ALL_EVENTS), "uid", "tier", "ts", "eid", n_buckets=8
    )

    def bucket_files():
        out = {}
        for d in os.listdir(path):
            if d.startswith(f"{BUCKET}="):
                full = os.path.join(path, d)
                out[d] = {
                    (f, os.path.getmtime(os.path.join(full, f)))
                    for f in os.listdir(full)
                    if f.endswith(".parquet")
                }
        return out

    before = bucket_files()
    # one new event for uid=1 only -> exactly one bucket rewritten
    scd2_merge(
        spark,
        path,
        _ev(spark, [(1, "platinum", "2024-02-01 00:00:00", 100)]),
        "uid", "tier", "ts", "eid", n_buckets=8,
    )
    after = bucket_files()
    changed = [d for d in before if before[d] != after.get(d)]
    assert len(changed) == 1, (changed, before.keys())
    # and the merge actually landed
    assert (1, 4, "platinum", "2024-02-01 00:00:00", None) in _hist_rows(spark, path)


def test_scd2_merge_swap_commit_equivalent(spark, tmp_path):
    from flume_spark.operators.scd import scd2_merge, scd2_write

    dyn, swap = str(tmp_path / "dyn"), str(tmp_path / "swap")
    late = [(1, "bronze", "2024-01-04 00:00:00", 99),
            (5, "new", "2024-01-01 00:00:00", 100)]
    for p, use_swap in ((dyn, False), (swap, True)):
        scd2_write(spark, p, _ev(spark, ALL_EVENTS), "uid", "tier", "ts", "eid")
        scd2_merge(
            spark, p, _ev(spark, late), "uid", "tier", "ts", "eid",
            swap_commit=use_swap,
        )
    assert _hist_rows(spark, swap) == _hist_rows(spark, dyn)
    # no staging or parked debris left behind
    import os
    assert not [d for d in os.listdir(tmp_path) if ".staging-" in d]
    assert not [d for d in os.listdir(swap) if ".old-" in d]


def test_scd2_heal_restores_and_clears(spark, tmp_path):
    import os
    import shutil

    from flume_spark.operators.scd import scd2_heal, scd2_write

    path = str(tmp_path / "store")
    scd2_write(
        spark, path, _ev(spark, ALL_EVENTS), "uid", "tier", "ts", "eid", n_buckets=8
    )
    want = _hist_rows(spark, path)
    bdirs = [d for d in os.listdir(path) if d.startswith("pbucket=")]
    # crash between the two renames: live missing, old parked
    os.rename(os.path.join(path, bdirs[0]), os.path.join(path, bdirs[0] + ".old-abc"))
    # crash after swap, before cleanup: both present (park a COPY)
    shutil.copytree(
        os.path.join(path, bdirs[1]), os.path.join(path, bdirs[1] + ".old-def")
    )
    assert scd2_heal(path) == (1, 1)
    assert _hist_rows(spark, path) == want
    assert scd2_heal(path) == (0, 0)  # idempotent


def test_scd2_ingestor_replay_converges(spark, tmp_path):
    """3 micro-batches == one full build; ledger replay and crash-window
    replay (marker bypassed, parked bucket) both converge."""
    import os

    from flume_spark.operators.scd import scd2_write
    from flume_spark.streaming.scd import Scd2Ingestor

    ref = str(tmp_path / "ref")
    scd2_write(spark, ref, _ev(spark, ALL_EVENTS), "uid", "tier", "ts", "eid")
    want = _hist_rows(spark, ref)

    path = str(tmp_path / "ing")
    ing = Scd2Ingestor(
        spark, path, str(tmp_path / "ledger"),
        key="uid", attr="tier", ts="ts", tiebreak="eid", n_buckets=8,
    )
    batches = [ALL_EVENTS[:3], ALL_EVENTS[3:6], ALL_EVENTS[6:]]
    for b, rows in enumerate(batches):
        ing.process(_ev(spark, rows), b)
    assert _hist_rows(spark, path) == want
    # ledger replay: no-op
    ing.process(_ev(spark, batches[1]), 1)
    assert _hist_rows(spark, path) == want
    # crash-window replay below the ledger: park one bucket (simulated
    # mid-swap crash), then re-run the batch handler directly
    bdirs = [d for d in os.listdir(path) if d.startswith("pbucket=")]
    os.rename(os.path.join(path, bdirs[0]), os.path.join(path, bdirs[0] + ".old-x"))
    ing._process(_ev(spark, batches[2]), 2)
    assert _hist_rows(spark, path) == want


def test_scd2_heal_reclaims_stale_staging(spark, tmp_path):
    import os

    from flume_spark.operators.scd import scd2_heal, scd2_merge, scd2_write

    path = str(tmp_path / "store")
    scd2_write(spark, path, _ev(spark, ALL_EVENTS), "uid", "tier", "ts", "eid")
    os.makedirs(path + ".staging-deadbeef/pbucket=0")
    scd2_heal(path)
    assert not os.path.isdir(path + ".staging-deadbeef")
    # a subsequent swap merge is unaffected
    scd2_merge(
        spark, path, _ev(spark, [(9, "new", "2024-02-01 00:00:00", 200)]),
        "uid", "tier", "ts", "eid", swap_commit=True,
    )
    assert (9, 1, "new", "2024-02-01 00:00:00", None) in _hist_rows(spark, path)


def test_scd2_ingestor_first_write_crash_recovers(spark, tmp_path):
    """A batch-0 crash that created the store dir but committed NO bucket
    (only committer litter) must NOT wedge the stream: the replay takes
    the write arm (branch is committed-data, not isdir)."""
    import os

    from flume_spark.streaming.scd import Scd2Ingestor

    path = str(tmp_path / "ing")
    os.makedirs(os.path.join(path, "_temporary"))  # simulated crash state
    ing = Scd2Ingestor(
        spark, path, str(tmp_path / "ledger"),
        key="uid", attr="tier", ts="ts", tiebreak="eid", n_buckets=8,
    )
    ing._process(_ev(spark, ALL_EVENTS), 0)
    ref = str(tmp_path / "ref")
    from flume_spark.operators.scd import scd2_write

    scd2_write(spark, ref, _ev(spark, ALL_EVENTS), "uid", "tier", "ts", "eid")
    assert _hist_rows(spark, path) == _hist_rows(spark, ref)


# ---------------------------------------------------------------------------
# SCD2 property tests — store semantics on random streams (ties, nulls,
# arbitrary splits, redelivery).  These found the round-6 design bug that
# forced the store from "compacted change log" to "raw log + watermark
# compaction": unconditional collapse is LOSSY under late arrivals
# (see operators/scd.py module header for the counterexample).
# ---------------------------------------------------------------------------

from hypothesis import given, settings
from hypothesis import strategies as st


def _model_changes(events):
    """Pure-python reference of operators/scd.compact_changes: per key,
    (ts, tiebreak)-ordered, keep the first row and every null-safe attr
    change.  Events are (key, attr, ts, tb) with tb unique."""
    out = []
    for key in sorted({e[0] for e in events}):
        seq = sorted((e for e in events if e[0] == key), key=lambda e: (e[2], e[3]))
        last = ...  # sentinel distinct from any attr incl. None
        for e in seq:
            if e[1] != last:
                out.append(e)
                last = e[1]
    return out


def _dedup(events):
    seen, out = set(), []
    for e in events:
        k = (e[0], e[2], e[3])
        if k not in seen:
            seen.add(k)
            out.append(e)
    return out


_EVENTS = st.lists(
    st.tuples(
        st.integers(1, 3),                      # key — few keys, many collisions
        st.sampled_from([None, "a", "b"]),      # attr — nulls included
        st.integers(1, 5),                      # ts — heavy ties across events
    ),
    min_size=1,
    max_size=12,
).map(lambda rows: [(k, a, t, i) for i, (k, a, t) in enumerate(rows)])


class TestScd2Properties:
    @settings(max_examples=300, deadline=None)
    @given(ev=_EVENTS, split=st.integers(0, 12), redeliver=st.booleans())
    def test_raw_store_merge_equals_rebuild(self, ev, split, redeliver):
        """The fixed design's theorem: a RAW store is a set union of
        events, so merge order, split point, and redelivery cannot change
        the read-time history.  (The collapsed-log variant of this
        property is FALSE — hypothesis produced a late-arrival
        counterexample, now the regression test below.)"""
        split = min(split, len(ev))
        b1, b2 = ev[:split], ev[split:]
        replay = list(b1) if redeliver else []
        store = _dedup(_dedup(b1) + b2 + replay)
        assert _model_changes(store) == _model_changes(ev)

    @settings(max_examples=300, deadline=None)
    @given(ev=_EVENTS, wm=st.integers(1, 6))
    def test_watermark_compaction_preserves_history(self, ev, wm):
        """scd2_compact's contract at the model level: collapsing the
        settled prefix (ts < wm) and keeping >= wm raw reads identically
        to the raw log, PROVIDED no event later lands below wm — here
        guaranteed by compacting the full stream's own prefix."""
        settled = _model_changes([e for e in ev if e[2] < wm])
        recent = [e for e in ev if e[2] >= wm]
        assert _model_changes(settled + recent) == _model_changes(ev)

    @settings(max_examples=300, deadline=None)
    @given(ev=_EVENTS)
    def test_model_compact_idempotent(self, ev):
        once = _model_changes(ev)
        assert _model_changes(once) == once


def test_compact_changes_matches_model(spark):
    """Spark compact_changes == the python model on adversarial streams
    (ties, nulls, a late insert, duplicate attrs) — pins the Spark
    implementation to the model the properties above explore."""
    from pyspark.sql import functions as F

    from flume_spark.operators.scd import compact_changes

    streams = [
        # the hypothesis counterexample stream (late b between a-dups)
        [(1, "a", 1, 0), (1, "a", 2, 1), (1, "b", 1, 2)],
        # nulls + ties + interleaved keys
        [(1, None, 1, 0), (2, "a", 1, 1), (1, None, 1, 2), (1, "b", 1, 3),
         (2, None, 2, 4), (1, "b", 3, 5), (2, "a", 2, 6)],
    ]
    for ev in streams:
        df = spark.createDataFrame(
            ev, "uid int, tier string, tss int, eid int"
        ).select("uid", "tier", F.timestamp_seconds("tss").alias("ts"), "eid")
        got = sorted(
            (
                (r.uid, r.tier, int(r.ts.timestamp()), r.eid)
                for r in compact_changes(df, "uid", "tier", "ts", "eid").collect()
            ),
            key=repr,  # None is not orderable against str
        )
        assert got == sorted(_model_changes(ev), key=repr), ev


def test_scd2_store_late_arrival_counterexample(spark, tmp_path):
    """END-TO-END regression for the bug the property test found: events
    a@1, a@2 then a LATE b@1.5 must rebuild regimes a | b | a.  The
    collapsed-log store forgot a@2 and answered 'b open forever'; the raw
    store + read-time collapse answers correctly."""
    from flume_spark.operators.scd import scd2_merge, scd2_write

    path = str(tmp_path / "store")
    scd2_write(
        spark, path,
        _ev(spark, [(1, "a", "2024-01-01 00:00:00", 0),
                    (1, "a", "2024-01-02 00:00:00", 1)]),
        "uid", "tier", "ts", "eid",
    )
    scd2_merge(
        spark, path,
        _ev(spark, [(1, "b", "2024-01-01 12:00:00", 2)]),
        "uid", "tier", "ts", "eid",
    )
    assert _hist_rows(spark, path) == {
        (1, 1, "a", "2024-01-01 00:00:00", "2024-01-01 12:00:00"),
        (1, 2, "b", "2024-01-01 12:00:00", "2024-01-02 00:00:00"),
        (1, 3, "a", "2024-01-02 00:00:00", None),
    }


def test_scd2_compact_settles_prefix_and_preserves_history(spark, tmp_path):
    """scd2_compact shrinks the stored rows (no-change rows below the
    watermark vanish) without changing the read history; rows at/after
    the watermark stay raw so late arrivals >= wm still merge exactly."""
    from flume_spark.operators.scd import scd2_compact, scd2_merge, scd2_write

    path = str(tmp_path / "store")
    chatty = [(1, "a", f"2024-01-0{d} 00:00:00", d) for d in range(1, 6)]
    chatty += [(1, "b", "2024-01-06 00:00:00", 6),
               (2, "x", "2024-01-02 00:00:00", 7)]
    scd2_write(
        spark, path, _ev(spark, chatty), "uid", "tier", "ts", "eid", n_buckets=8
    )
    want = _hist_rows(spark, path)
    before = spark.read.parquet(path).count()
    scd2_compact(
        spark, path, "2024-01-06 00:00:00", "uid", "tier", "ts", "eid",
        n_buckets=8,
    )
    after = spark.read.parquet(path).count()
    assert after < before  # the four no-change a-rows below wm collapsed
    assert _hist_rows(spark, path) == want
    # a late arrival AT the watermark still merges exactly (contract edge)
    scd2_merge(
        spark, path,
        _ev(spark, [(1, "c", "2024-01-06 00:00:00", 99)]),
        "uid", "tier", "ts", "eid", n_buckets=8,
    )
    got = {(r[0], r[2]) for r in _hist_rows(spark, path)}
    assert (1, "c") in got


def test_scd2_ingestor_live_stream(spark, tmp_path):
    """Scd2Ingestor wired into a real readStream + writeStream.foreachBatch
    (maxFilesPerTrigger=1, so the events arrive across several
    micro-batches, the second of which carries a LATE event): the stored
    history equals the one-shot batch build."""
    from flume_spark.operators.scd import scd2_write
    from flume_spark.streaming.scd import Scd2Ingestor

    src = tmp_path / "scd_src"
    src.mkdir()
    schema = "uid int, tier string, ts timestamp, eid int"
    batches = [
        ALL_EVENTS[:4],
        ALL_EVENTS[4:] + [(1, "bronze", "2024-01-04 00:00:00", 99)],  # late
    ]
    for rows in batches:
        _ev(spark, rows).coalesce(1).write.mode("append").parquet(str(src))

    path = str(tmp_path / "scd_store")
    ing = Scd2Ingestor(
        spark, path, str(tmp_path / "scd_ledger"),
        key="uid", attr="tier", ts="ts", tiebreak="eid", n_buckets=8,
    )
    q = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src))
        .writeStream.foreachBatch(ing.process)
        .option("checkpointLocation", str(tmp_path / "scd_ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    ref = str(tmp_path / "scd_ref")
    scd2_write(
        spark, ref,
        _ev(spark, ALL_EVENTS + [(1, "bronze", "2024-01-04 00:00:00", 99)]),
        "uid", "tier", "ts", "eid",
    )
    assert _hist_rows(spark, path) == _hist_rows(spark, ref)
    # maintenance compaction behind a watermark preserves the history
    ing.compact("2024-02-01 00:00:00")
    assert _hist_rows(spark, path) == _hist_rows(spark, ref)


def test_snapshot_diff_bucketed_is_exchange_free(spark, tmp_path):
    """The 100 TB shape claimed in snapshot_diff's docstring: both
    releases stored bucketed on the key -> the full-outer diff plans with
    ZERO exchanges (zip-merge of co-located buckets)."""
    from pyspark.sql import functions as F

    from flume_spark.plans import n_shuffles
    from flume_spark.sources import write_table
    from flume_spark.sources.merge import snapshot_diff

    old = spark.range(0, 500).select(
        F.col("id").alias("k"), (F.col("id") * 2.0).alias("price")
    )
    new = spark.range(0, 520).select(
        F.col("id").alias("k"),
        F.when(F.col("id") % 9 == 0, F.col("id") * 3.0)
        .otherwise(F.col("id") * 2.0)
        .alias("price"),
    )
    try:
        write_table(old, str(tmp_path / "rel_a"), buckets=(8, "k"),
                    table_name="diff_rel_a", mode="overwrite")
        write_table(new, str(tmp_path / "rel_b"), buckets=(8, "k"),
                    table_name="diff_rel_b", mode="overwrite")
        prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            diff = snapshot_diff(
                spark.table("diff_rel_a"), spark.table("diff_rel_b"),
                "k", ["price"],
            )
            assert n_shuffles(diff) == 0
            got = {r.status for r in diff.collect()}
            assert got == {"added", "changed", "unchanged"}
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    finally:
        for t in ("diff_rel_a", "diff_rel_b"):
            spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_k_anonymity_report_semantics(spark):
    from flume_spark.operators.quality import k_anonymity_report

    rows = [
        # class (1, "a"): 3 rows, 2 sensitive values
        (1, "a", "x"), (1, "a", "y"), (1, "a", "x"),
        # class (2, "a"): 1 row -> risky at k=2
        (2, "a", "x"),
        # class (3, "b"): 2 rows, 1 sensitive value -> l = 1
        (3, "b", "z"), (3, "b", "z"),
    ]
    df = spark.createDataFrame(rows, "uid int, grp string, s string")
    got = {
        r.grp: (r.n_classes, r.risky_classes, r.risky_rows, r.min_l_diversity)
        for r in k_anonymity_report(df, ["uid", "grp"], "s", k=2, by="grp").collect()
    }
    assert got == {"a": (2, 1, 1, 1), "b": (1, 0, 0, 1)}
    # global (no `by`): one row, no grouping column
    g = k_anonymity_report(df, ["uid", "grp"], "s", k=2).collect()
    assert len(g) == 1 and g[0].n_classes == 3 and g[0].risky_classes == 1

    import pytest as _pytest

    with _pytest.raises(ValueError):
        k_anonymity_report(df, ["uid"], "s", k=2, by="grp")


def test_scd2_heal_restores_compaction_crash(spark, tmp_path):
    """A crash between scd2_compact's two renames leaves NO live store
    (the old log parked at <path>.old-*, the compacted output at
    <path>.compacting-*): heal must restore the parked log — never let
    an ingestor re-initialize from scratch — and clear the staging."""
    import os

    from flume_spark.operators.scd import scd2_heal, scd2_write

    path = str(tmp_path / "store")
    scd2_write(spark, path, _ev(spark, ALL_EVENTS), "uid", "tier", "ts", "eid")
    want = _hist_rows(spark, path)
    # simulate the crash window: live renamed away, staging left behind
    os.rename(path, path + ".old-tok1")
    os.makedirs(path + ".compacting-tok2/pbucket=0")
    restored, _ = scd2_heal(path)
    assert restored == 1
    assert not os.path.isdir(path + ".compacting-tok2")
    assert _hist_rows(spark, path) == want


def test_scd2_compact_keeps_null_ts_rows(spark, tmp_path):
    """NULL-ts events are outside any watermark promise: compaction must
    route them to the raw side, never drop them (SQL three-valued logic
    makes them fail BOTH ts < wm and ts >= wm)."""
    from flume_spark.operators.scd import scd2_compact, scd2_write

    path = str(tmp_path / "store")
    rows = [(1, "a", "2024-01-01 00:00:00", 0), (1, "b", None, 1)]
    scd2_write(spark, path, _ev(spark, rows), "uid", "tier", "ts", "eid",
               n_buckets=4)
    want = _hist_rows(spark, path)
    scd2_compact(spark, path, "2024-02-01 00:00:00",
                 "uid", "tier", "ts", "eid", n_buckets=4)
    assert spark.read.parquet(path).filter("ts IS NULL").count() == 1
    assert _hist_rows(spark, path) == want
