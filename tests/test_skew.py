"""Skew toolkit (operators/skew.py) + bucketed co-located join plan gates.

Salting must be semantically invisible (same rows as the unsalted plan) while
changing only the physical distribution; bucketing must make the co-located
join exchange-free.  Both are core 100 TB levers (SURVEY.md §2.3).
"""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from flume_spark.operators.skew import SALT, salted_count_distinct, salted_join
from flume_spark.plans import explain_str, n_shuffles


@pytest.fixture()
def skewed(spark):
    # 80% of fact rows on one hot key, the rest spread across 9 keys
    rows = [Row(k=1 if i % 10 < 8 else (i % 10), uid=i, v=float(i)) for i in range(2000)]
    return spark.createDataFrame(rows)


@pytest.fixture()
def dim(spark):
    return spark.createDataFrame([Row(k=i, name=f"dim{i}") for i in range(12)])


def _sorted_rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_salted_join_matches_plain_inner(skewed, dim):
    plain = skewed.join(dim, "k")
    salted = salted_join(skewed, dim, on=["k"], salt_src="uid", n_salt=8)
    assert _sorted_rows(salted.select(*plain.columns)) == _sorted_rows(plain)


def test_salted_join_matches_plain_left(spark, skewed):
    # dim missing keys 5..9 -> left join must keep unmatched fact rows
    small_dim = spark.createDataFrame([Row(k=i, name=f"dim{i}") for i in range(5)])
    plain = skewed.join(small_dim, "k", "left")
    salted = salted_join(skewed, small_dim, on=["k"], salt_src="uid", how="left", n_salt=4)
    assert _sorted_rows(salted.select(*plain.columns)) == _sorted_rows(plain)


def test_salted_join_joins_on_salt(skewed, dim):
    """The physical join key must include the salt column (that's the point),
    and the salt must not leak into the output schema."""
    salted = salted_join(skewed, dim, on=["k"], salt_src="uid", n_salt=8)
    assert SALT in explain_str(salted)
    assert SALT not in salted.columns


def test_salted_join_multiplicity(spark):
    """Duplicate keys on BOTH sides: salted multiplicities must match the
    plain join (each big row meets each matching small row exactly once)."""
    big = spark.createDataFrame([Row(k=1, uid=i) for i in range(6)])
    small = spark.createDataFrame([Row(k=1, tag="a"), Row(k=1, tag="b")])
    plain = big.join(small, "k")
    salted = salted_join(big, small, on=["k"], salt_src="uid", n_salt=4)
    assert salted.count() == plain.count() == 12


def test_salted_count_distinct_exact(skewed):
    exact = {
        r["k"]: r["n"]
        for r in skewed.groupBy("k").agg(F.count_distinct("v").alias("n")).collect()
    }
    salted = {
        r["k"]: r["n_distinct"]
        for r in salted_count_distinct(skewed, ["k"], "v", n_salt=16).collect()
    }
    assert salted == exact


def test_salted_count_distinct_counts_duplicates_once(spark):
    df = spark.createDataFrame(
        [Row(k="a", v=x) for x in [1, 1, 2, 2, 2, 3]] + [Row(k="b", v=9)]
    )
    out = {r["k"]: r["n_distinct"] for r in salted_count_distinct(df, ["k"], "v").collect()}
    assert out == {"a": 3, "b": 1}


# ---------------------------------------------------------------------------
# Bucketed co-located join — exchange-free (sources.write_table buckets=)
# ---------------------------------------------------------------------------


def test_bucketed_join_is_exchange_free(spark, tmp_path):
    from flume_spark.sources import write_table

    left = spark.range(0, 1000).withColumn("v", F.col("id") * 2)
    right = spark.range(0, 1000).withColumn("w", F.col("id") % 7)
    try:
        write_table(
            left, str(tmp_path / "tl"), buckets=(8, "id"),
            table_name="bk_left", mode="overwrite",
        )
        write_table(
            right, str(tmp_path / "tr"), buckets=(8, "id"),
            table_name="bk_right", mode="overwrite",
        )
        prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            joined = spark.table("bk_left").join(spark.table("bk_right"), "id")
            # same bucket count + key on both sides -> no shuffle at all
            assert n_shuffles(joined) == 0
            assert joined.count() == 1000
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    finally:
        spark.sql("DROP TABLE IF EXISTS bk_left")
        spark.sql("DROP TABLE IF EXISTS bk_right")


# ---------------------------------------------------------------------------
# TF-IDF operator sanity (full oracle check lives in test_oracle.py)
# ---------------------------------------------------------------------------


def test_tfidf_ranks_rare_terms_first(spark):
    from flume_spark.operators.text import tfidf_topk

    docs = spark.createDataFrame(
        [
            Row(doc_id=1, text="common rare1 common"),
            Row(doc_id=2, text="common other common"),
            Row(doc_id=3, text="common thing common"),
        ]
    )
    top = tfidf_topk(docs, "doc_id", "text", k=1)
    by_doc = {r["doc_id"]: r["term"] for r in top.collect()}
    # 'common' appears in every doc (idf=1); each doc's unique term wins
    assert by_doc == {1: "rare1", 2: "other", 3: "thing"}


def test_plan_report_summarizes_scale_properties(spark):
    from flume_spark.plans import plan_report
    from flume_spark.queries.relational import join_broadcast, q6_forecast_revenue

    rep = plan_report(join_broadcast(spark, "/root/testdata/sf0.001"))
    assert rep["broadcast_hash_joins"] >= 1
    assert rep["cartesian_products"] == 0
    rep6 = plan_report(q6_forecast_revenue(spark, "/root/testdata/sf0.001"))
    assert any(rep6["pushed_filters"])  # q6 filters reach the scan
    assert rep6["python_boundary_nodes"] == 0


# ---------------------------------------------------------------------------
# Mergeable HLL distinct sketches
# ---------------------------------------------------------------------------


def test_sketch_merge_of_slices_equals_sketch_of_whole(spark):
    """Merging per-slice sketches must track the whole-corpus sketch
    closely (sparse->dense path differences allowed) and land within 5% of
    exact; merge ORDER must not matter."""
    from flume_spark.operators.skew import merge_sketch_estimate, sketch_distinct

    orders = spark.read.parquet("/root/testdata/sf0.01/orders.parquet")
    whole = sketch_distinct(orders, ["o_orderpriority"], "o_custkey")
    whole_est = {
        r["o_orderpriority"]: r["n_distinct_approx"]
        for r in merge_sketch_estimate(whole, ["o_orderpriority"]).collect()
    }
    # slice by order year, sketch each slice, merge
    sliced = orders.withColumn("yr", F.year("o_orderdate"))
    per_slice = sketch_distinct(sliced, ["o_orderpriority", "yr"], "o_custkey")
    merged_est = {
        r["o_orderpriority"]: r["n_distinct_approx"]
        for r in merge_sketch_estimate(per_slice, ["o_orderpriority"]).collect()
    }
    for k in whole_est:
        assert abs(merged_est[k] - whole_est[k]) / whole_est[k] < 0.02
    # merge order irrelevant: reversed slice order gives identical estimates
    reversed_est = {
        r["o_orderpriority"]: r["n_distinct_approx"]
        for r in merge_sketch_estimate(
            per_slice.orderBy(F.desc("yr")), ["o_orderpriority"]
        ).collect()
    }
    assert reversed_est == merged_est
    exact = {
        r["o_orderpriority"]: r["n"]
        for r in orders.groupBy("o_orderpriority")
        .agg(F.count_distinct("o_custkey").alias("n"))
        .collect()
    }
    for k, est in merged_est.items():
        assert abs(est - exact[k]) / exact[k] < 0.05, (k, est, exact[k])
