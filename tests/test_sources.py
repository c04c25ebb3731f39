"""I/O layer tests: format round-trips, corrupt-record quarantine,
partitioned writes pruning at read time."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from flume_spark.sources import read_table, write_table


def test_csv_json_roundtrip(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, "a"), (2, "b")], "id long, name string"
    )
    for fmt in ("csv", "json", "parquet", "orc"):
        path = str(tmp_path / fmt)
        write_table(df, path, fmt=fmt, mode="overwrite")
        back = read_table(spark, path, fmt=fmt, schema="id long, name string")
        assert sorted((r["id"], r["name"]) for r in back.collect()) == [
            (1, "a"),
            (2, "b"),
        ]


def test_json_corrupt_record_quarantined(spark, tmp_path):
    path = tmp_path / "bad.json"
    path.write_text('{"id": 1}\n{not json at all\n{"id": 3}\n')
    df = read_table(
        spark,
        str(path),
        fmt="json",
        schema="id long, _corrupt_record string",
    )
    rows = df.collect()
    good = [r["id"] for r in rows if r["_corrupt_record"] is None]
    bad = [r for r in rows if r["_corrupt_record"] is not None]
    assert good == [1, 3] and len(bad) == 1


def test_partitioned_write_prunes_scan(spark, tmp_path):
    df = spark.createDataFrame(
        [(i, "even" if i % 2 == 0 else "odd") for i in range(10)],
        "id long, parity string",
    )
    path = str(tmp_path / "bypart")
    write_table(df, path, partition_by=["parity"], mode="overwrite")
    back = read_table(spark, path).filter(F.col("parity") == "even")
    assert back.count() == 5
    # partition pruning: only the even directory is in the scan
    import io, contextlib

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        back.explain("formatted")
    assert "PartitionFilters: [isnotnull(parity" in buf.getvalue()


def test_merge_upsert_unpartitioned(spark, tmp_path):
    """Update + insert + delete semantics on a plain parquet table."""
    from flume_spark.sources.merge import merge_upsert

    path = str(tmp_path / "t")
    spark.createDataFrame(
        [(i, f"v{i}") for i in range(5)], "k long, v string"
    ).write.parquet(path)
    updates = spark.createDataFrame(
        [(1, "v1-new", False), (2, None, True), (9, "v9", False)],
        "k long, v string, _deleted boolean",
    )
    merge_upsert(spark, path, updates, key="k")
    got = {(r["k"], r["v"]) for r in spark.read.parquet(path).collect()}
    assert got == {(0, "v0"), (1, "v1-new"), (3, "v3"), (4, "v4"), (9, "v9")}


def test_merge_upsert_rewrites_only_touched_partitions(spark, tmp_path):
    """Partition-scoped merge: untouched partition files are not rewritten."""
    import glob
    import os

    from flume_spark.sources.merge import merge_upsert

    path = str(tmp_path / "pt")
    spark.createDataFrame(
        [(i, i % 3, f"v{i}") for i in range(30)], "k long, p int, v string"
    ).write.partitionBy("p").parquet(path)

    untouched_before = {
        f: os.path.getmtime(f) for f in glob.glob(f"{path}/p=2/*.parquet")
    }
    updates = spark.createDataFrame(
        [(0, 0, "patched", False), (100, 0, "new", False), (3, 0, None, True)],
        "k long, p int, v string, _deleted boolean",
    )
    merge_upsert(spark, path, updates, key="k", partition_col="p")

    after = spark.read.parquet(path)
    assert after.filter("k = 0").first()["v"] == "patched"
    assert after.filter("k = 100").first()["v"] == "new"
    assert after.filter("k = 3").count() == 0
    assert after.filter("p = 1").count() == 10  # untouched partition intact
    assert after.count() == 30  # 30 - 1 deleted + 1 inserted

    untouched_after = {
        f: os.path.getmtime(f) for f in glob.glob(f"{path}/p=2/*.parquet")
    }
    assert untouched_after == untouched_before  # p=2 never rewritten


def test_merge_upsert_creates_new_partition(spark, tmp_path):
    """Updates may land in a partition value the table has never seen."""
    from flume_spark.sources.merge import merge_upsert

    path = str(tmp_path / "npt")
    spark.createDataFrame(
        [(1, 0, "a"), (2, 1, "b")], "k long, p int, v string"
    ).write.partitionBy("p").parquet(path)
    updates = spark.createDataFrame([(3, 9, "new-part")], "k long, p int, v string")
    merge_upsert(spark, path, updates, key="k", partition_col="p")
    after = spark.read.parquet(path)
    assert after.count() == 3
    assert after.filter("p = 9").first()["v"] == "new-part"


def test_merge_upsert_removes_delete_only_partition(spark, tmp_path):
    """A partition whose every key is deleted must disappear — dynamic
    overwrite alone would never touch it (zero output rows)."""
    from flume_spark.sources.merge import merge_upsert

    path = str(tmp_path / "dpt")
    spark.createDataFrame(
        [(1, 0, "a"), (2, 1, "b"), (3, 1, "c")], "k long, p int, v string"
    ).write.partitionBy("p").parquet(path)
    updates = spark.createDataFrame(
        [(1, 0, None, True)], "k long, p int, v string, _deleted boolean"
    )
    merge_upsert(spark, path, updates, key="k", partition_col="p")
    after = spark.read.parquet(path)
    assert after.count() == 2
    assert after.filter("p = 0").count() == 0
    import os
    assert not os.path.isdir(f"{path}/p=0")


def test_merge_upsert_removes_hive_encoded_partition(spark, tmp_path):
    """Partition values needing Hive path-encoding (spaces, ':') must still
    have their emptied directories removed — the cleanup derives encoded dir
    names from the files Spark read, never from f-string construction
    (round-2 ADVICE)."""
    import os

    from flume_spark.sources.merge import merge_upsert

    path = str(tmp_path / "henc")
    spark.createDataFrame(
        [(1, "a b:c", "x"), (2, "plain", "y")], "k long, p string, v string"
    ).write.partitionBy("p").parquet(path)
    encoded = [d for d in os.listdir(path) if d.startswith("p=") and "%" in d]
    assert encoded, "fixture should produce a URL-escaped partition dir"
    updates = spark.createDataFrame(
        [(1, "a b:c", None, True)], "k long, p string, v string, _deleted boolean"
    )
    merge_upsert(spark, path, updates, key="k", partition_col="p")
    assert not any(d.startswith(encoded[0]) for d in os.listdir(path)), (
        "emptied encoded partition dir left behind"
    )
    rows = spark.read.parquet(path).collect()
    assert [(r["k"], r["p"]) for r in rows] == [(2, "plain")]
