"""SQL-checkable analogs of the reference's queue operators (SURVEY.md §2).

Each query maps a flume operator to the relational shape our engine uses for
it, expressed over the driver's `events`/`documents` tables so the DuckDB
oracle can verify it.  The *live* queue implementation (stateful, on the jobs
table) lives in `flume_spark.queue`; these declare the per-operator semantics.

Reference citations are in each docstring (paths relative to /root/reference).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flume_spark.queries._util import T


def due_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1 — due-job range predicate.

    Reference: ZRANGEBYSCORE 0..now over scheduled/retry zsets
    (redis/job.ex:160-190).  Spark shape: a time-range filter that pushes
    down to the parquet scan (min/max row-group pruning at scale).
    """
    ev = T(spark, sf_dir, "events")
    return ev.filter(F.col("ts") <= F.lit("2024-01-05 00:00:00").cast("timestamp")).select(
        "event_id", "ts", "event_type", "user_id"
    )


DUE_FILTER_SQL = """
SELECT event_id, ts, event_type, user_id
FROM events WHERE ts <= TIMESTAMP '2024-01-05 00:00:00'
"""


def topk_due(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W2 — ordered take of the K most-overdue jobs.

    Reference: ZRANGEBYSCORE ... LIMIT 0 K (enqueue_processing_jobs.lua:15).
    Spark plans TakeOrderedAndProject — no global sort.
    """
    ev = T(spark, sf_dir, "events")
    return (
        ev.orderBy("ts", "event_id").select("event_id", "ts", "event_type").limit(100)
    )


TOPK_DUE_SQL = """
SELECT event_id, ts, event_type FROM events ORDER BY ts, event_id LIMIT 100
"""


def job_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S7 — pipelined LLEN per queue (queue/manager.ex:69-81).

    Spark shape: partial-aggregated count per key; one narrow shuffle.
    """
    ev = T(spark, sf_dir, "events")
    return ev.groupBy(F.col("event_type").alias("queue")).agg(
        F.count(F.lit(1)).alias("n_jobs")
    )


JOB_COUNTS_SQL = """
SELECT event_type AS queue, count(*) AS n_jobs FROM events GROUP BY event_type
"""


def backoff_expr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C5 — exponential backoff: min(round(initial*count*1.5), max)
    (queue/backoff.ex:6-16; initial=500ms, max=10s per config.ex:8-10).

    Pure columnar expression — whole-stage codegen, no UDF.
    """
    ev = T(spark, sf_dir, "events").filter(F.col("event_id") < 200)
    rc = (F.col("event_id") % 6).alias("retry_count")
    backoff = F.least(
        F.round(F.lit(500) * (F.col("event_id") % 6) * 1.5, 0).cast("bigint"),
        F.lit(10000).cast("bigint"),
    )
    return ev.select("event_id", rc, backoff.alias("backoff_ms"))


BACKOFF_SQL = """
SELECT event_id, event_id % 6 AS retry_count,
       least(CAST(round(500 * (event_id % 6) * 1.5) AS BIGINT), 10000) AS backoff_ms
FROM events WHERE event_id < 200
"""


def md5_ledger_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4 — md5 member key for the rate-limit ledger
    (redis/bulk_dequeue.ex:269: Odgn.Jsonata md5 of the job payload)."""
    docs = T(spark, sf_dir, "documents")
    return docs.select("doc_id", F.md5(F.col("text")).alias("job_md5"))


MD5_LEDGER_SQL = """
SELECT doc_id, md5(text) AS job_md5 FROM documents
"""


def rate_window_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3/W3 — events processed per window per key (the rate-limit count:
    ZCOUNT limit_zset over the window, redis/bulk_dequeue.ex:196-219).

    Spark shape: tumbling-window count per user — partial agg then one
    shuffle on (user, window).
    """
    ev = T(spark, sf_dir, "events")
    return ev.groupBy(
        "user_id", F.date_trunc("hour", F.col("ts")).alias("window_start")
    ).agg(F.count(F.lit(1)).alias("n_events"))


RATE_WINDOW_SQL = """
SELECT user_id, date_trunc('hour', ts) AS window_start, count(*) AS n_events
FROM events GROUP BY 1, 2
"""


def group_args_nested(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1 — batch grouping by class (producer_consumer.ex:51-61): collect the
    member ids per group, deterministically ordered (reference nests args as
    [[args...]] per BulkEvent — bulk_event.ex:42)."""
    ev = T(spark, sf_dir, "events")
    return ev.groupBy(F.col("event_type").alias("job_class")).agg(
        # JSON-stringified so every oracled output column is scalar (the
        # driver harness canonicalizes via pandas and can't hash lists).
        F.to_json(F.sort_array(F.collect_list("event_id"))).alias("member_ids"),
        F.count(F.lit(1)).alias("n_members"),
    )


GROUP_ARGS_SQL = """
SELECT event_type AS job_class,
       CAST(to_json(list_sort(list(event_id))) AS VARCHAR) AS member_ids,
       count(*) AS n_members
FROM events GROUP BY event_type
"""


def visibility_timeout_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F2/ST2 — stuck-job scan: claimed longer ago than the visibility
    timeout (priv/scripts/enqueue_processing_jobs.lua:15, 600s default at
    config.ex:23).  Here: events older than (max ts - 1 day) per type, the
    same bounded ordered-take shape."""
    ev = T(spark, sf_dir, "events")
    cutoff = F.lit("2024-01-30 00:00:00").cast("timestamp")
    return (
        ev.filter(F.col("ts") < cutoff)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_stuck"),
            F.max("ts").alias("newest_stuck"),
        )
    )


VISIBILITY_SQL = """
SELECT event_type, count(*) AS n_stuck, max(ts) AS newest_stuck
FROM events WHERE ts < TIMESTAMP '2024-01-30 00:00:00'
GROUP BY event_type
"""


def queue_pending_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4 — pending/in-flight counts across configured pipelines
    (flume.ex:80-83, pipeline/event.ex:57-64): per-queue count of jobs in
    each lifecycle state.  The live API is QueueManager.pending_jobs_count;
    this declares its relational shape: ONE partial-agg shuffle with
    conditional counts (never a scan per status)."""
    ev = T(spark, sf_dir, "events")
    status = F.element_at(
        F.array(
            F.lit("pending"), F.lit("processing"), F.lit("succeeded"), F.lit("dead")
        ),
        (F.col("event_id") % 4 + 1).cast("int"),
    )
    return (
        ev.select(F.col("event_type").alias("queue"), status.alias("status"))
        .groupBy("queue")
        .agg(
            F.count(F.when(F.col("status") == "pending", 1)).alias("n_pending"),
            F.count(F.when(F.col("status") == "processing", 1)).alias("n_processing"),
            F.count(F.lit(1)).alias("n_total"),
        )
    )


QUEUE_PENDING_SQL = """
WITH j AS (
  SELECT event_type AS queue,
         (['pending', 'processing', 'succeeded', 'dead'])[event_id % 4 + 1] AS status
  FROM events
)
SELECT queue,
       count(CASE WHEN status = 'pending' THEN 1 END)    AS n_pending,
       count(CASE WHEN status = 'processing' THEN 1 END) AS n_processing,
       count(*)                                          AS n_total
FROM j GROUP BY queue
"""


def queue_log_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-travel audit of the queue's own commit log, exercised through
    the REAL OptimisticLogStore: batch A (every event_id < 2000 as a
    pending job) is appended and its commit version captured, batch B
    (every 3rd job succeeds, every 5th event id lands as a brand-new job)
    is appended after, then `log_diff(v_A)` reads BOTH versions back via
    the snapshot commits and release-diffs them (sources/merge.py
    snapshot_diff on jid).  The oracle replays the two prefixes
    declaratively — hash-equality pins that the stored-version reader
    returns exactly the pre-batch-B state even though newer commits
    exist (reader isolation), and that the version routing is exact.

    The store lives in a per-call temp dir that must outlive the returned
    lazy frame (same contract as stream_contract_orders): an atexit hook
    reclaims it at process exit.

    Result: (status, n_rows, key_sum) — 'removed' cannot occur on an
    append-only log, so three rows: added/changed/unchanged."""
    import atexit
    import os as _os
    import shutil
    import tempfile

    from flume_spark.queue.optimistic import OptimisticLogStore

    ev = (
        T(spark, sf_dir, "events")
        .filter(F.col("event_id") < 2000)
        .dropDuplicates(["event_id"])
    )

    def jobs(df, jid_col, status: str, seq_col):
        return df.select(
            jid_col.cast("string").alias("jid"),
            F.col("event_type").alias("queue"),
            F.lit("Worker").alias("class"),
            F.lit("perform").alias("function"),
            F.lit("[]").alias("args"),
            F.lit(None).cast("map<string,string>").alias("context"),
            F.lit(status).alias("status"),
            F.lit(0).cast("int").alias("retry_count"),
            F.lit("2024-01-01 00:00:00").cast("timestamp").alias("enqueued_at"),
            F.lit(None).cast("timestamp").alias("scheduled_at"),
            F.lit(None).cast("timestamp").alias("leased_at"),
            F.lit(None).cast("timestamp").alias("retry_at"),
            F.lit(None).cast("timestamp").alias("finished_at"),
            F.lit(None).cast("timestamp").alias("failed_at"),
            F.lit(None).cast("string").alias("error_message"),
            F.lit(None).cast("string").alias("error_backtrace"),
            seq_col.cast("long").alias("seq"),
        )

    eid = F.col("event_id")
    batch_a = jobs(ev, eid, "pending", eid * 2)
    batch_b = jobs(
        ev.filter(eid % 3 == 0), eid, "succeeded", eid * 2 + 1
    ).unionByName(
        jobs(ev.filter(eid % 5 == 0), eid + 10_000_000, "pending", eid * 2 + 1)
    )

    tmp = tempfile.mkdtemp(prefix="flume_logdiff_")
    atexit.register(shutil.rmtree, tmp, ignore_errors=True)
    store = OptimisticLogStore(spark, _os.path.join(tmp, "log"))
    store.append(batch_a)
    v_from = store.version()
    store.append(batch_b)
    diff = store.log_diff(v_from, compare_cols=["status"])
    return diff.groupBy("status").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("jid").cast("long")).alias("key_sum"),
    )


QUEUE_LOG_DIFF_SQL = """
WITH base AS (
  SELECT DISTINCT event_id FROM events WHERE event_id < 2000
),
a AS (
  SELECT CAST(event_id AS VARCHAR) AS jid, 'pending' AS st FROM base
),
snap_b AS (
  SELECT a.jid,
         CASE WHEN u.event_id IS NOT NULL THEN 'succeeded' ELSE 'pending' END AS st
  FROM a LEFT JOIN (SELECT event_id FROM base WHERE event_id % 3 = 0) u
    ON a.jid = CAST(u.event_id AS VARCHAR)
  UNION ALL
  SELECT CAST(event_id + 10000000 AS VARCHAR) AS jid, 'pending' AS st
  FROM base WHERE event_id % 5 = 0
),
d AS (
  SELECT coalesce(a.jid, b.jid) AS jid,
         CASE WHEN a.jid IS NULL THEN 'added'
              WHEN b.jid IS NULL THEN 'removed'
              WHEN a.st <> b.st THEN 'changed'
              ELSE 'unchanged' END AS status
  FROM a FULL OUTER JOIN snap_b b ON a.jid = b.jid
)
SELECT status, count(*) AS n_rows,
       CAST(sum(CAST(jid AS BIGINT)) AS BIGINT) AS key_sum
FROM d GROUP BY status
"""


def queue_hll_daily_jids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct jids processed per queue per day — the operational metric
    a queue owner asks of at-least-once telemetry, answered from the REAL
    HllIngestor (streaming/sketch.py): the event stream replays as three
    micro-batches through the idempotent foreachBatch handler, batch 1 is
    DELIVERED TWICE (the at-least-once case), and the answer max-merges
    the per-batch register tables.  The oracle builds the registers
    one-level over the whole stream via the shared hll_h60_sql —
    hash-equality proves slice-merge == whole-corpus AND that the
    replayed batch changed nothing (register max is idempotent; a counter
    would have double-counted).  Exact distinct rides alongside on the
    skew-proof salted two-phase count.

    Sketch dirs live in a per-call temp dir reclaimed at process exit
    (same contract as stream_contract_orders)."""
    import atexit
    import os as _os
    import shutil
    import tempfile

    from flume_spark.operators import skew
    from flume_spark.streaming.sketch import HllIngestor

    ev = (
        T(spark, sf_dir, "events")
        .filter(F.col("ts").isNotNull())
        .select(
            F.col("event_type").alias("queue"),
            F.date_format("ts", "yyyy-MM-dd").alias("day"),
            F.col("event_id").cast("string").alias("jid"),
            F.col("event_id").alias("eid"),
        )
    )
    tmp = tempfile.mkdtemp(prefix="flume_hllq_")
    atexit.register(shutil.rmtree, tmp, ignore_errors=True)
    ing = HllIngestor(
        spark,
        _os.path.join(tmp, "sketch"),
        _os.path.join(tmp, "ledger"),
        ["queue", "day"],
        "jid",
        p=8,
        seed="hll",
    )
    for b in range(3):
        ing.process(ev.filter(F.col("eid") % 3 == b).drop("eid"), b)
    ing.process(ev.filter(F.col("eid") % 3 == 1).drop("eid"), 1)  # replay: no-op
    exact = skew.salted_count_distinct(
        ev.select("queue", "day", "jid"),
        ["queue", "day"],
        "jid",
        out_col="exact_distinct",
    )
    return ing.estimate().join(exact, ["queue", "day"])


def _queue_hll_sql(p: int = 8, seed: str = "hll") -> str:
    from flume_spark.operators.skew import _HLL_HASH_BITS, hll_h60_sql

    m = 1 << p
    rho_bits = _HLL_HASH_BITS - p
    scale = rho_bits + 1
    alpha = 0.7213 / (1 + 1.079 / m)
    c = alpha * m * m * float(1 << scale)
    h60 = hll_h60_sql("CAST(event_id AS VARCHAR)", seed)
    return f"""
WITH h AS (
  SELECT event_type AS queue, strftime(ts, '%Y-%m-%d') AS day,
         {h60} AS h60, event_id
  FROM events WHERE ts IS NOT NULL
),
regs AS (
  SELECT queue, day, h60 % {m} AS bucket,
         max(CASE WHEN h60 // {m} = 0 THEN {scale}
                  ELSE {scale} - length(bin(h60 // {m})) END) AS reg
  FROM h GROUP BY 1, 2, 3
),
agg AS (
  SELECT queue, day, count(*) AS n_hit,
         sum(1::BIGINT << ({scale} - reg))::BIGINT
           + ({m} - count(*)) * (1::BIGINT << {scale}) AS harmonic_sum
  FROM regs GROUP BY 1, 2
),
ex AS (
  SELECT queue, day, CAST(count(DISTINCT event_id) AS BIGINT) AS exact_distinct
  FROM h GROUP BY 1, 2
)
SELECT a.queue, a.day, n_hit, harmonic_sum,
       CAST({c!r} AS DOUBLE) / CAST(harmonic_sum AS DOUBLE) AS hll_est,
       exact_distinct
FROM agg a JOIN ex USING (queue, day)
"""


QUEUE_HLL_DAILY_SQL = _queue_hll_sql()


def queue_heavy_users_cms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heavy-hitter telemetry from the REAL CmsIngestor — the FREQUENCY
    member of the sketch family composed with the queue story the way
    queue_hll_daily_jids composes the distinct member: the event stream
    replays as three micro-batches (batch 1 delivered TWICE; the ledger
    + per-batch-overwrite contract makes the replay a no-op where a
    naive counter append would double-count), the per-batch sketch
    tables sum-merge, and the merged sketch answers point queries for
    the top-20 exact-heaviest users.  The oracle builds the sketch
    one-level over the whole stream (countmin_bucket_sql — identical
    bucket expressions) — hash-equality is slice-merge == whole AND
    replay-noop, and freq_estimate >= exact_n row-by-row is the CMS
    never-undercount bound made visible in the result."""
    import atexit
    import os as _os
    import shutil
    import tempfile

    from flume_spark.streaming.sketch import CmsIngestor

    ev = T(spark, sf_dir, "events").select("event_id", "user_id")
    tmp = tempfile.mkdtemp(prefix="flume_cmsq_")
    atexit.register(shutil.rmtree, tmp, ignore_errors=True)
    ing = CmsIngestor(
        spark,
        _os.path.join(tmp, "sketch"),
        _os.path.join(tmp, "ledger"),
        key_col="user_id",
        depth=4,
        width=64,
    )
    for b in range(3):
        ing.process(ev.filter(F.col("event_id") % 3 == b), b)
    ing.process(ev.filter(F.col("event_id") % 3 == 1), 1)  # replay: no-op
    top = (
        ev.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("exact_n"))
        .orderBy(F.desc("exact_n"), F.asc("user_id"))
        .limit(20)
    )
    est = ing.estimate(top.select("user_id"))
    return top.join(est, "user_id")


def _queue_cms_sql(depth: int = 4, width: int = 64, seed: str = "flume") -> str:
    from flume_spark.operators.skew import countmin_bucket_sql

    build = "\nUNION ALL\n".join(
        f'SELECT {r} AS "row", '
        + countmin_bucket_sql("user_id", r, width, seed)
        + " AS bucket, 1 AS w FROM events"
        for r in range(depth)
    )
    probes = "\nUNION ALL\n".join(
        f'SELECT user_id, {r} AS "row", '
        + countmin_bucket_sql("user_id", r, width, seed)
        + " AS bucket FROM top"
        for r in range(depth)
    )
    return f"""
WITH cms AS MATERIALIZED (
  SELECT "row", bucket, CAST(sum(w) AS BIGINT) AS counter
  FROM ({build}) GROUP BY 1, 2
),
top AS MATERIALIZED (
  SELECT user_id, count(*) AS exact_n FROM events
  GROUP BY 1 ORDER BY exact_n DESC, user_id LIMIT 20
),
probes AS ({probes})
SELECT t.user_id, t.exact_n,
       CAST(e.freq_estimate AS BIGINT) AS freq_estimate
FROM top t JOIN (
  SELECT p.user_id, min(coalesce(c.counter, 0)) AS freq_estimate
  FROM probes p LEFT JOIN cms c ON p."row" = c."row" AND p.bucket = c.bucket
  GROUP BY 1
) e ON t.user_id = e.user_id
"""


QUEUE_CMS_SQL = _queue_cms_sql()


def queue_latency_hist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Latency-percentile telemetry from the REAL HistIngestor — the
    QUANTILE member of the sketch family over the queue stream (HLL =
    distinct jids, CMS = heavy users, this = p50/p90/p99): a
    deterministic per-event latency proxy (event_id mod 1000 ms) flows
    through three micro-batches plus one REPLAYED batch (per-batch
    overwrite + ledger converge), the per-batch histograms sum-merge,
    and the quantile estimate reads the merged table (first bin whose
    running count reaches ceil(q*N), reported as the bin's upper edge —
    error <= one bin width).  Oracle: one-level histogram over the whole
    stream, identical bin expression and quantile probe."""
    import atexit
    import os as _os
    import shutil
    import tempfile

    from flume_spark.streaming.sketch import HistIngestor

    ev = T(spark, sf_dir, "events").select(
        "event_id",
        (F.col("event_id") % 1000).cast("double").alias("latency_ms"),
    )
    tmp = tempfile.mkdtemp(prefix="flume_histq_")
    atexit.register(shutil.rmtree, tmp, ignore_errors=True)
    ing = HistIngestor(
        spark,
        _os.path.join(tmp, "sketch"),
        _os.path.join(tmp, "ledger"),
        value_col="latency_ms",
        lo=0.0,
        hi=1000.0,
        bins=64,
    )
    for b in range(3):
        ing.process(ev.filter(F.col("event_id") % 3 == b), b)
    ing.process(ev.filter(F.col("event_id") % 3 == 1), 1)  # replay: no-op
    return ing.quantiles([0.5, 0.9, 0.99])


def _queue_hist_sql(bins: int = 64, hi: float = 1000.0) -> str:
    from flume_spark.operators.skew import histogram_bin_sql

    bin_sql = histogram_bin_sql(
        "CAST(event_id % 1000 AS DOUBLE)", 0.0, hi, bins
    )
    return f"""
WITH h AS (
  SELECT {bin_sql} AS bin, CAST(count(*) AS BIGINT) AS counter
  FROM events GROUP BY 1
),
c AS (
  SELECT bin, counter,
         CAST(sum(counter) OVER (ORDER BY bin) AS BIGINT) AS cum,
         CAST(sum(counter) OVER () AS BIGINT) AS n_total
  FROM h
),
q AS (SELECT * FROM (VALUES (CAST(0.5 AS DOUBLE)), (CAST(0.9 AS DOUBLE)),
                            (CAST(0.99 AS DOUBLE))) v(q))
SELECT q, n_total, min(bin) AS bin,
       0.0 + (min(bin) + 1) * (({hi!r} - 0.0) / {float(bins)!r}) AS est_hi
FROM c JOIN q ON c.cum >= CAST(ceil(q * n_total) AS BIGINT)
GROUP BY q, n_total
"""


QUEUE_HIST_SQL = _queue_hist_sql()


QUERIES = {
    "due_filter": due_filter,
    "topk_due": topk_due,
    "job_counts": job_counts,
    "backoff_expr": backoff_expr,
    "md5_ledger_key": md5_ledger_key,
    "rate_window_count": rate_window_count,
    "group_args_nested": group_args_nested,
    "visibility_timeout_scan": visibility_timeout_scan,
    "queue_pending_counts": queue_pending_counts,
    "queue_log_diff": queue_log_diff,
    "queue_hll_daily_jids": queue_hll_daily_jids,
    "queue_heavy_users_cms": queue_heavy_users_cms,
    "queue_latency_hist": queue_latency_hist,
}

ORACLES = {
    "due_filter": DUE_FILTER_SQL,
    "topk_due": TOPK_DUE_SQL,
    "job_counts": JOB_COUNTS_SQL,
    "backoff_expr": BACKOFF_SQL,
    "md5_ledger_key": MD5_LEDGER_SQL,
    "rate_window_count": RATE_WINDOW_SQL,
    "group_args_nested": GROUP_ARGS_SQL,
    "visibility_timeout_scan": VISIBILITY_SQL,
    "queue_pending_counts": QUEUE_PENDING_SQL,
    "queue_log_diff": QUEUE_LOG_DIFF_SQL,
    "queue_hll_daily_jids": QUEUE_HLL_DAILY_SQL,
    "queue_heavy_users_cms": QUEUE_CMS_SQL,
    "queue_latency_hist": QUEUE_HIST_SQL,
}
