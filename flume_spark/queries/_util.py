"""Shared helpers for declared queries."""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


_RUNTIME_CONF = {
    # The declared queries may run under a caller-built SparkSession (the
    # driver's correctness gate).  These are the runtime-settable confs our
    # replica gate and bench run with — identical plans/speed either way.
    "spark.sql.shuffle.partitions": os.environ.get("SPARK_GRAFT_CPUS", "32"),
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
}


def tune_session(spark: SparkSession) -> None:
    """Apply runtime-settable scale confs once per session (idempotent).

    The already-tuned check is a conf sentinel on the session itself, not a
    driver-side id() set: a stopped session's id can be reused by a new
    one, which would silently skip tuning (UTC timezone alone changes
    timestamp results vs the oracles).
    """
    try:
        if spark.conf.get("spark.flume_spark.tuned", None) == "1":
            return
    except Exception:  # pragma: no cover - exotic conf backends
        pass
    for key, value in _RUNTIME_CONF.items():
        try:
            spark.conf.set(key, value)
        except Exception:  # pragma: no cover - conf locked by the host
            pass
    try:
        spark.conf.set("spark.flume_spark.tuned", "1")
    except Exception:  # pragma: no cover
        pass


def T(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one driver-provided parquet table.

    Reads only the columns later selected (Catalyst prunes), and filters push
    down to the parquet scan.

    `events.parquet` is written with TIMESTAMP(NANOS), which Spark's vectorized
    reader rejects; read it as int64 nanos (legacy conf) and convert to a
    microsecond timestamp.  (At scale you'd land µs timestamps instead — the
    conversion costs pushdown on `ts`.)
    """
    tune_session(spark)
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
