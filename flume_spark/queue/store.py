"""Log-structured job store: append-only parquet + last-writer-wins state.

Production target is Delta/Iceberg (ACID appends, optimistic concurrency,
background compaction); plain parquet-dir appends have the same shape and
are what the test container supports.  Reference analog: the Redis key
layout at lib/flume/queue/manager.ex:267-287 — one list/zset per state —
collapsed into one table with a `status` column.
"""

from __future__ import annotations

import os
import threading
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from flume_spark.queue.schema import JOB_LOG_SCHEMA


class JobStore:
    """Append-only job log with last-writer-wins current-state view.

    `seq` is strictly increasing per store instance (driver-side counter —
    the Spark driver is the single trigger scheduler, mirroring the
    reference where dequeue is serialized per queue by a Redis lock,
    redis/lock.ex:8-24; multi-writer deployments would take seq from the
    Delta commit version instead).
    """

    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path
        os.makedirs(path, exist_ok=True)
        self._lock = threading.Lock()
        self._seq = int(time.time() * 1000) << 20

    def next_seq(self, n: int = 1) -> int:
        with self._lock:
            start = self._seq
            self._seq += n
            return start

    def append(self, df: DataFrame) -> None:
        df.write.mode("append").parquet(self.path)

    def append_rows(self, rows: list[dict]) -> None:
        if not rows:
            return
        df = self.spark.createDataFrame(rows, schema=JOB_LOG_SCHEMA)  # type: ignore[arg-type]
        self.append(df)

    def is_empty(self) -> bool:
        return not any(
            name.endswith(".parquet") for name in os.listdir(self.path)
        )

    def log(self) -> DataFrame:
        return self.spark.read.schema(JOB_LOG_SCHEMA).parquet(self.path)

    def current(self) -> DataFrame:
        """Latest record per jid — the live job table.

        One shuffle on jid; at scale the log is bucketed by jid so this
        collapses to a per-bucket local window (no exchange), and compaction
        keeps the log short.
        """
        w = Window.partitionBy("jid").orderBy(F.col("seq").desc())
        return (
            self.log()
            .withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
        )

    def compact(self) -> None:
        """Rewrite the log to one record per jid (latest state).

        Bounds read amplification; in Delta this is OPTIMIZE + vacuum.
        Terminal-state rows could also be aged out to an archive table.
        """
        snapshot = self.current().collect()
        tmp = self.path.rstrip("/") + ".compact.tmp"
        df = self.spark.createDataFrame(snapshot, schema=JOB_LOG_SCHEMA)
        df.write.mode("overwrite").parquet(tmp)
        old = self.path.rstrip("/") + ".compact.old"
        os.rename(self.path, old)
        os.rename(tmp, self.path)
        import shutil

        shutil.rmtree(old)
