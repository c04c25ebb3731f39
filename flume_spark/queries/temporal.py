"""Event-time temporal queries over the `events` table, with DuckDB oracles.

Engine-native (the reference has no event-time processing — SURVEY.md §2.5,
§2.8 ST9): tumbling / sliding / session windows, backward as-of join, exact
percentiles.  In streaming mode the same window expressions run under
`readStream` + `withWatermark` (see flume_spark/streaming); batch and stream
share the plan, which is the point of Structured Streaming.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flume_spark.operators.temporal import asof_join
from flume_spark.queries._util import T

# ---------------------------------------------------------------------------
# Tumbling window (F.window) — maps to GROUP BY time_bucket
# ---------------------------------------------------------------------------


def window_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = T(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.window("ts", "1 hour").alias("w"), F.col("event_type")
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


WINDOW_TUMBLING_SQL = """
SELECT time_bucket(INTERVAL '1 hour', ts)                    AS window_start,
       time_bucket(INTERVAL '1 hour', ts) + INTERVAL '1 hour' AS window_end,
       event_type,
       count(*)             AS n_events,
       round(sum(value), 4) AS sum_value
FROM events
GROUP BY 1, 2, 3
"""


# ---------------------------------------------------------------------------
# Sliding window (F.window with slide) — each event lands in size/slide windows
# ---------------------------------------------------------------------------


def window_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = T(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            # sum, not avg: input has exactly 2 decimals, so a 4dp round of
            # the sum can never land on a half boundary (avg can — e.g.
            # sum/8 = x.xxx75 — where Spark HALF_UP and DuckDB binary
            # rounding disagree)
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "n_events",
            "sum_value",
        )
    )


WINDOW_SLIDING_SQL = """
WITH assigned AS (
  SELECT time_bucket(INTERVAL '30 minutes', ts)
           - k * (INTERVAL '30 minutes') AS window_start,
         value
  FROM events, unnest([0, 1]) AS u(k)
)
SELECT window_start,
       window_start + INTERVAL '1 hour' AS window_end,
       count(*)             AS n_events,
       round(sum(value), 4) AS sum_value
FROM assigned
GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# Session window (F.session_window) — gaps-and-islands in the oracle
# ---------------------------------------------------------------------------

_SESSION_GAP = "4 hours"


def window_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user sessions with a 4h inactivity gap.  Spark's session_window
    end = last event + gap."""
    ev = T(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.session_window("ts", _SESSION_GAP).alias("w"), F.col("user_id")
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            "sum_value",
        )
    )


WINDOW_SESSION_SQL = """
WITH flagged AS (
  SELECT user_id, ts, value,
         CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   > INTERVAL '4 hours'
              OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
              THEN 1 ELSE 0 END AS new_session
  FROM events
),
islands AS (
  SELECT user_id, ts, value,
         sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                ROWS UNBOUNDED PRECEDING) AS session_id
  FROM flagged
)
SELECT user_id,
       min(ts)                       AS session_start,
       max(ts) + INTERVAL '4 hours'  AS session_end,
       count(*)                      AS n_events,
       round(sum(value), 4)          AS sum_value
FROM islands
GROUP BY user_id, session_id
"""


# ---------------------------------------------------------------------------
# As-of join — DuckDB ASOF JOIN oracle
# ---------------------------------------------------------------------------


def join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Each 'purchase' event joined to the user's latest prior (<=) 'click'."""
    ev = T(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id",
        F.col("ts").alias("click_ts"),
        F.col("value").alias("click_value"),
    )
    return asof_join(
        purchases,
        clicks,
        on="user_id",
        left_ts="ts",
        right_ts="click_ts",
        right_cols=["click_ts", "click_value"],
    ).select("event_id", "user_id", "ts", "value", "click_ts", "click_value")


JOIN_ASOF_SQL = """
SELECT p.event_id, p.user_id, p.ts, p.value,
       c.ts    AS click_ts,
       c.value AS click_value
FROM (SELECT * FROM events WHERE event_type = 'purchase') p
ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
  ON p.user_id = c.user_id AND c.ts <= p.ts
"""


# ---------------------------------------------------------------------------
# Exact percentiles (interpolated, = DuckDB quantile_cont)
# ---------------------------------------------------------------------------


def agg_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = T(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.round(F.expr("percentile(value, 0.5)"), 4).alias("p50"),
        F.round(F.expr("percentile(value, 0.9)"), 4).alias("p90"),
        F.round(F.expr("percentile(value, 0.99)"), 4).alias("p99"),
        F.round(F.min("value"), 4).alias("min_v"),
        F.round(F.max("value"), 4).alias("max_v"),
    )


AGG_PERCENTILES_SQL = """
SELECT event_type,
       round(quantile_cont(value, 0.5), 4)  AS p50,
       round(quantile_cont(value, 0.9), 4)  AS p90,
       round(quantile_cont(value, 0.99), 4) AS p99,
       round(min(value), 4) AS min_v,
       round(max(value), 4) AS max_v
FROM events
GROUP BY event_type
"""


# ---------------------------------------------------------------------------
# Ordered-sequence funnel — view -> click -> purchase
# ---------------------------------------------------------------------------


def events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strictly-ordered funnel: each user's earliest view, earliest click
    AFTER that view, earliest purchase AFTER that click.

    All three stages aggregate and join on `user_id`, so at scale one hash
    partitioning is reused across the whole plan (no re-shuffle between
    stages); the stage outputs are per-user scalars, orders of magnitude
    smaller than the event log they summarize."""
    ev = T(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    views = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("view_ts"))
    )
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .join(views, "user_id")
        .filter(F.col("ts") > F.col("view_ts"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("click_ts"))
    )
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .join(clicks, "user_id")
        .filter(F.col("ts") > F.col("click_ts"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("purchase_ts"))
    )
    return views.join(clicks, "user_id", "left").join(purchases, "user_id", "left")


EVENTS_FUNNEL_SQL = """
WITH v AS (
  SELECT user_id, min(ts) AS view_ts
  FROM events WHERE event_type = 'view' GROUP BY 1
),
c AS (
  SELECT e.user_id, min(e.ts) AS click_ts
  FROM events e JOIN v ON e.user_id = v.user_id
  WHERE e.event_type = 'click' AND e.ts > v.view_ts GROUP BY 1
),
p AS (
  SELECT e.user_id, min(e.ts) AS purchase_ts
  FROM events e JOIN c ON e.user_id = c.user_id
  WHERE e.event_type = 'purchase' AND e.ts > c.click_ts GROUP BY 1
)
SELECT v.user_id, v.view_ts, c.click_ts, p.purchase_ts
FROM v
LEFT JOIN c ON v.user_id = c.user_id
LEFT JOIN p ON v.user_id = p.user_id
"""


# ---------------------------------------------------------------------------
# Interval (overlap) join — binned equi-join, no cartesian
# ---------------------------------------------------------------------------


def join_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Attribution pairs with NO equi-key: every click inside any purchase's
    1-hour window [purchase_ts, purchase_ts + 1h).  Catalyst would plan a
    pure range join as a nested loop; `temporal.interval_join` bins time
    into 1-hour buckets so the pair space is an equi-join on the bucket id
    (shuffle linear in rows, never |purchases| x |clicks|) — plan-gated in
    tests/test_plans.py."""
    from flume_spark.operators.temporal import interval_join

    ev = T(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("start_ts"),
        (F.col("ts") + F.expr("INTERVAL 1 HOUR")).alias("end_ts"),
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"), F.col("ts").alias("click_ts")
    )
    pairs = interval_join(
        purchases, clicks, "start_ts", "end_ts", "click_ts", bin_seconds=3600
    )
    return pairs.select("purchase_id", "click_id", "click_ts")


JOIN_INTERVAL_SQL = """
WITH p AS (
  SELECT event_id AS purchase_id, ts AS start_ts,
         ts + INTERVAL 1 HOUR AS end_ts
  FROM events WHERE event_type = 'purchase'
),
c AS (
  SELECT event_id AS click_id, ts AS click_ts
  FROM events WHERE event_type = 'click'
)
SELECT p.purchase_id, c.click_id, c.click_ts
FROM p JOIN c ON c.click_ts >= p.start_ts AND c.click_ts < p.end_ts
"""




def approx_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable quantile sketch (approx_percentile) per event type — the
    sketch-family counterpart of approx_distinct's HLL.  Approximate by
    design, so NO oracle (driver records rows-only); its deterministic
    core IS hash-checked, twice: agg_percentiles (exact percentile over
    the same grouping and points) and llm_ext.percentiles_exact, plus
    test_approx_percentiles_within_tolerance bounds this sketch against
    the exact values.  At 100 TB this is the path: the sketch is
    partial-aggregable and mergeable, so percentiles come from one
    map-side-combined pass instead of a full sort."""
    ev = T(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.expr(
            "approx_percentile(value, array(0.5D, 0.9D, 0.99D), 10000)"
        ).alias("approx_p"),
    ).select(
        "event_type",
        F.col("approx_p")[0].alias("ap50"),
        F.col("approx_p")[1].alias("ap90"),
        F.col("approx_p")[2].alias("ap99"),
    )


def scd2_fact_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """THE warehouse join: each fact row enriched with the SCD2 dimension
    version that was valid AT THE FACT'S OWN TIMESTAMP — equi-join on the
    key plus a half-open interval predicate (valid_from <= ts < valid_to,
    NULL-open current regime).  Here both sides derive from events (the
    event stream is its own dimension), which bakes in the boundary
    case: an event that CAUSED a regime change must land in the regime
    it opened (ts == valid_from), not the one it closed — exactly what
    the half-open convention guarantees, and one reason the hash is
    sensitive to the interval arithmetic.  Every fact matches exactly
    one regime, so total n_events equals the fact count.

    Plan: SMJ on user_id with the range predicates as join residue —
    per-user history is short, so the within-key scan is bounded; at
    100 TB the same query over a persisted dimension uses the
    scd2_snapshot date-bucket pruning (operators/scd.py) before the
    join.  Summarized per (regime attr, version) with exact id sums."""
    from flume_spark.operators.temporal import scd2_history

    ev = T(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    hist = scd2_history(
        ev, "user_id", "event_type", "ts", tiebreak="event_id"
    ).alias("h")
    fact = ev.select("user_id", "ts", "event_id").alias("f")
    j = fact.join(
        hist,
        (F.col("f.user_id") == F.col("h.user_id"))
        & (F.col("h.valid_from") <= F.col("f.ts"))
        & (F.col("h.valid_to").isNull() | (F.col("f.ts") < F.col("h.valid_to"))),
    )
    return j.groupBy(
        F.col("h.event_type").alias("regime_attr"), F.col("h.version").alias("version")
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum("f.event_id").alias("event_sum"),
    )


def scd2_user_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD Type-2 dimension build over the event stream: collapse each
    user's (ts, event_id)-ordered event_type sequence into versioned
    regime rows with half-open [valid_from, valid_to) validity, then
    summarize per event_type (raw history is |changes| rows — bulky for a
    value hash; the summary pins count, open-version count, and the EXACT
    total regime duration in microseconds, so any mis-collapsed or
    mis-bounded version row flips the hash).  Plan: one hash shuffle on
    user_id; change-lag, version row_number, and validity lead share the
    partitioning (single Exchange), then a 7-group agg.  At 100 TB the
    window cost is per-user history, never a global sort."""
    from flume_spark.operators.temporal import scd2_history

    ev = T(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    hist = scd2_history(ev, "user_id", "event_type", "ts", tiebreak="event_id")
    return _scd2_summary(hist)


def _scd2_summary(hist: DataFrame) -> DataFrame:
    """Per-event_type regime summary shared by scd2_user_history and
    scd2_incremental — both check against SCD2_USER_HISTORY_SQL, so the
    aggregate block must be literally the same expression tree."""
    return hist.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_versions"),
        F.count(F.when(F.col("valid_to").isNull(), 1)).alias("n_open"),
        F.sum(
            F.unix_micros(F.col("valid_to").cast("timestamp"))
            - F.unix_micros(F.col("valid_from").cast("timestamp"))
        ).alias("total_regime_us"),
    )


# Shared CTE chain: ordered -> changes -> hist mirrors scd2_history exactly
# (rn=1 OR IS DISTINCT FROM == the null-safe change filter).
_SCD2_HIST_CTE = """
WITH ordered AS (
  SELECT user_id, event_type, ts, event_id,
         row_number() OVER w AS rn,
         lag(event_type) OVER w AS prev
  FROM events WHERE ts IS NOT NULL
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
changes AS (
  SELECT user_id, event_type, ts, rn
  FROM ordered WHERE rn = 1 OR prev IS DISTINCT FROM event_type
),
hist AS (
  SELECT user_id, event_type,
         row_number() OVER w2 AS version,
         ts AS valid_from,
         lead(ts) OVER w2 AS valid_to
  FROM changes
  WINDOW w2 AS (PARTITION BY user_id ORDER BY rn)
)
"""

SCD2_USER_HISTORY_SQL = (
    _SCD2_HIST_CTE
    + """
SELECT event_type,
       count(*) AS n_versions,
       count(CASE WHEN valid_to IS NULL THEN 1 END) AS n_open,
       CAST(sum(epoch_us(valid_to) - epoch_us(valid_from)) AS BIGINT)
         AS total_regime_us
FROM hist
GROUP BY event_type
"""
)


SCD2_FACT_JOIN_SQL = (
    _SCD2_HIST_CTE
    + """
SELECT h.event_type AS regime_attr, h.version, count(*) AS n_events,
       CAST(sum(f.event_id) AS BIGINT) AS event_sum
FROM (SELECT user_id, ts, event_id FROM events WHERE ts IS NOT NULL) f
JOIN hist h ON f.user_id = h.user_id AND h.valid_from <= f.ts
           AND (h.valid_to IS NULL OR f.ts < h.valid_to)
GROUP BY 1, 2
"""
)


def scd2_snapshot_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time read of the SCD2 history: which event_type regime was
    each user in at 2024-01-15T00:00:00 (mid-range of the event stream)?
    Exercises the snapshot filter arm (valid_from <= at < valid_to with
    NULL-open current versions) — a pure filter over the history, so at
    scale it partition-prunes on a valid_from date bucket instead of
    joining.  version_sum is the exact integer fingerprint: a wrong
    version numbering or a version leaking past its valid_to flips it."""
    from flume_spark.operators.temporal import scd2_history, scd2_snapshot

    ev = T(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    hist = scd2_history(ev, "user_id", "event_type", "ts", tiebreak="event_id")
    at = F.lit("2024-01-15 00:00:00").cast(hist.schema["valid_from"].dataType)
    return (
        scd2_snapshot(hist, at)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_users"),
            F.sum("version").alias("version_sum"),
        )
    )


SCD2_SNAPSHOT_SQL = (
    _SCD2_HIST_CTE
    + """
SELECT event_type,
       count(*) AS n_users,
       CAST(sum(version) AS BIGINT) AS version_sum
FROM hist
WHERE valid_from <= TIMESTAMP '2024-01-15 00:00:00'
  AND (valid_to IS NULL OR TIMESTAMP '2024-01-15 00:00:00' < valid_to)
GROUP BY event_type
"""
)


def scd2_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental SCD2 convergence, driver-checked: events before
    2024-01-20 are compacted to change rows FIRST (scd2_compact's settled
    prefix, the cutoff serving as the watermark — every event in the
    second batch is >= cutoff, which is exactly the lateness promise that
    makes compaction exact; operators/scd.py header has the
    counterexample for why an UNWATERMARKED compaction would be lossy),
    then the late batch folds in via the merge dataflow (semi/anti split
    on affected keys, union), all in-plan.  The oracle is the FULL
    rebuild over all events — hash-equality IS compact-then-merge ==
    rebuild, checked end-to-end by the driver on real data.  Same
    summary shape as scd2_user_history."""
    from flume_spark.operators.scd import compact_changes
    from flume_spark.operators.temporal import scd2_history

    ev = T(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    cutoff = F.lit("2024-01-20 00:00:00").cast(ev.schema["ts"].dataType)
    log = compact_changes(
        ev.filter(F.col("ts") < cutoff), "user_id", "event_type", "ts", "event_id"
    )
    batch = ev.filter(F.col("ts") >= cutoff).select(
        "user_id", "event_type", "ts", "event_id"
    )
    keys = batch.select("user_id").distinct()
    untouched = log.join(keys, "user_id", "left_anti")
    recompacted = compact_changes(
        log.join(keys, "user_id", "semi").unionByName(batch),
        "user_id", "event_type", "ts", "event_id",
    )
    merged_log = untouched.unionByName(recompacted)
    # derive history from the merged log (version/valid_to on read) and
    # summarize exactly like scd2_user_history
    hist = scd2_history(merged_log, "user_id", "event_type", "ts", tiebreak="event_id")
    return _scd2_summary(hist)


QUERIES = {
    "approx_percentiles": approx_percentiles,
    "join_interval": join_interval,
    "scd2_user_history": scd2_user_history,
    "scd2_snapshot_counts": scd2_snapshot_counts,
    "scd2_incremental": scd2_incremental,
    "scd2_fact_join": scd2_fact_join,
    "window_tumbling": window_tumbling,
    "events_funnel": events_funnel,
    "window_sliding": window_sliding,
    "window_session": window_session,
    "join_asof": join_asof,
    "agg_percentiles": agg_percentiles,
}

ORACLES = {
    "join_interval": JOIN_INTERVAL_SQL,
    "scd2_user_history": SCD2_USER_HISTORY_SQL,
    "scd2_snapshot_counts": SCD2_SNAPSHOT_SQL,
    # incremental path must equal the full rebuild: same oracle by design
    "scd2_incremental": SCD2_USER_HISTORY_SQL,
    "scd2_fact_join": SCD2_FACT_JOIN_SQL,
    "window_tumbling": WINDOW_TUMBLING_SQL,
    "events_funnel": EVENTS_FUNNEL_SQL,
    "window_sliding": WINDOW_SLIDING_SQL,
    "window_session": WINDOW_SESSION_SQL,
    "join_asof": JOIN_ASOF_SQL,
    "agg_percentiles": AGG_PERCENTILES_SQL,
}
