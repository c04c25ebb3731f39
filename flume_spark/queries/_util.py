"""Shared helpers for declared queries."""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def T(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one driver-provided parquet table.

    Reads only the columns later selected (Catalyst prunes), and filters push
    down to the parquet scan.

    `events.parquet` is written with TIMESTAMP(NANOS), which Spark's vectorized
    reader rejects; read it as int64 nanos (legacy conf) and convert to a
    microsecond timestamp.  (At scale you'd land µs timestamps instead — the
    conversion costs pushdown on `ts`.)
    """
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
        if dict(df.dtypes).get("ts") == "bigint":
            df = df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
        return df
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def register_views(spark: SparkSession, sf_dir: str, *names: str) -> None:
    for name in names:
        T(spark, sf_dir, name).createOrReplaceTempView(name)
