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
