"""Temporal operators: as-of join and event-time windowing helpers.

The reference has no temporal operators (scripbox/flume moves opaque job
strings; SURVEY.md §2.5 — the only windowing is the rate-limit ledger), so
these are engine-native, designed for the LLM-pipeline / analytics surface.

`asof_join` is the classic time-series join Spark lacks as a primitive.
Implemented as union + per-key ordered window (`last(_, ignoreNulls)`) —
ONE shuffle on the join key, no per-row subquery, no range explosion:
the same plan shape survives a 100x scale-up because cost is
O((|L|+|R|) log) within each key partition, and AQE handles key skew.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    right_cols: list[str] | None = None,
    inclusive: bool = True,
) -> DataFrame:
    """Backward as-of join: for each left row, the latest right row with
    `right_ts <= left_ts` (or `<` when inclusive=False) and equal `on` key.

    Returns all left columns plus the requested right columns (null when no
    prior right row exists — left outer semantics, like DuckDB ASOF LEFT
    JOIN / pandas merge_asof).

    Plan: tag both sides, union, then `last(right_struct, ignoreNulls)` over
    (partition by key, order by ts with right-before-left on ties when
    inclusive).  Single hash-partition shuffle on `on`; sort is local.
    """
    right_cols = right_cols or [c for c in right.columns if c not in (on, right_ts)]
    rstruct = F.struct(*[F.col(c) for c in right_cols])
    lstruct = F.struct(*[F.col(c) for c in left.columns])

    r = right.select(
        F.col(on).alias("__key"),
        F.col(right_ts).alias("__ts"),
        F.lit(1).alias("__is_right"),
        rstruct.alias("__r"),
        F.lit(None).cast(
            left.select(lstruct.alias("x")).schema["x"].dataType
        ).alias("__l"),
    )
    l = left.select(
        F.col(on).alias("__key"),
        F.col(left_ts).alias("__ts"),
        F.lit(0).alias("__is_right"),
        F.lit(None).cast(
            right.select(rstruct.alias("x")).schema["x"].dataType
        ).alias("__r"),
        lstruct.alias("__l"),
    )
    # ties: inclusive -> right sorts before left at equal ts (is_right desc);
    # exclusive -> left first, so an equal-ts right row is not yet visible.
    order = [
        F.col("__ts"),
        F.col("__is_right").desc() if inclusive else F.col("__is_right").asc(),
    ]
    w = (
        Window.partitionBy("__key")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        l.unionByName(r)
        .withColumn("__match", F.last("__r", ignorenulls=True).over(w))
        .filter(F.col("__is_right") == 0)
        .select(
            *[F.col(f"__l.{c}").alias(c) for c in left.columns],
            *[F.col(f"__match.{c}").alias(c) for c in right_cols],
        )
    )


def interval_join(
    intervals: DataFrame,
    events: DataFrame,
    start_col: str,
    end_col: str,
    ts_col: str,
    bin_seconds: int,
) -> DataFrame:
    """Overlap join with NO equi-key: every (interval, event) pair where
    `start <= ts < end` — the shape Catalyst can only plan as a nested-loop
    (cartesian with a range filter) when no equality condition exists.

    Scale strategy (the classic range-join binning optimization): time is
    cut into `bin_seconds` buckets; each interval explodes to one row per
    bucket it covers, each event maps to its single bucket, and the pair
    space is an EQUI-join on the bucket id followed by the exact range
    filter.  Shuffle volume is O(Σ interval_span / bin + |events|) — linear,
    never |intervals| x |events|.  Choose bin_seconds near the median
    interval span: too small explodes intervals, too large fattens buckets
    (both still correct; distinct below dedupes nothing since an event's
    single bin meets each interval's covering row at most once).

    Returns all interval columns + all event columns (inner join).
    """
    # double-precision epoch seconds: a long cast truncates sub-second
    # boundaries and can drop the final covered bin of a fractional-second
    # interval end.  Last covered bin of half-open [s, e) is ceil(e/bin)-1
    # (exact both when e sits on a bin boundary and when it doesn't).
    # TIMESTAMP_NTZ has no direct double cast — hop through timestamp
    # (session tz is UTC, so the epoch value is unambiguous).
    def _secs(col: str):
        return F.col(col).cast("timestamp").cast("double")

    s = _secs(start_col)
    e = _secs(end_col)
    ivl_bins = intervals.withColumn(
        "__bin",
        F.explode(
            F.sequence(F.floor(s / bin_seconds), F.ceil(e / bin_seconds) - F.lit(1))
        ),
    )
    ev_bins = events.withColumn("__bin", F.floor(_secs(ts_col) / bin_seconds))
    return (
        ivl_bins.join(ev_bins, "__bin")
        .filter(
            (F.col(ts_col) >= F.col(start_col)) & (F.col(ts_col) < F.col(end_col))
        )
        .drop("__bin")
    )


def scd2_history(
    df: DataFrame,
    key: str,
    attr: str,
    ts: str,
    tiebreak: str | None = None,
) -> DataFrame:
    """Collapse a change-event stream into an SCD Type-2 versioned history:
    one row per (key, attribute regime) with half-open validity
    `[valid_from, valid_to)` and `valid_to IS NULL` for the current version.

    The warehouse-standard "slowly changing dimension" build the reference
    never needs (flume moves opaque job payloads; SURVEY.md §2.5) but any
    analytics user of this engine will: consecutive events whose `attr`
    value is unchanged are collapsed into the earlier version (idempotent
    re-sends cost nothing), and a change re-opens a new version row.

    Plan: ONE hash shuffle on `key`, one local sort on (ts, tiebreak);
    the change-detection lag, the version row_number, and the validity
    lead all run over that same partitioning (Catalyst plans a single
    Exchange — gated in tests/test_round6b_ops.py).  At 100 TB the
    window is per-key, so cost is the busiest key's history, not a
    global sort; NULL attr values are handled null-safely (NULL -> NULL
    is "no change", NULL -> x and x -> NULL are changes).

    Columns out: key, version (1-based per key), attr, valid_from,
    valid_to (NULL = current).
    """
    order = [F.col(ts)] + ([F.col(tiebreak)] if tiebreak else [])
    w = Window.partitionBy(key).orderBy(*order)
    cols = [key, attr, ts] + ([tiebreak] if tiebreak else [])
    marked = (
        df.select(*cols)
        .withColumn("__rn", F.row_number().over(w))
        .withColumn("__prev", F.lag(attr).over(w))
    )
    changes = marked.filter(
        (F.col("__rn") == 1) | ~F.col(attr).eqNullSafe(F.col("__prev"))
    )
    # same partitioning + __rn preserves the original order: no new shuffle
    w2 = Window.partitionBy(key).orderBy("__rn")
    return changes.select(
        F.col(key),
        F.row_number().over(w2).alias("version"),
        F.col(attr),
        F.col(ts).alias("valid_from"),
        F.lead(ts).over(w2).alias("valid_to"),
    )


def scd2_snapshot(history: DataFrame, at) -> DataFrame:
    """Point-in-time read of an SCD2 history: the version of each key that
    was current at `at` (a timestamp literal or Column) — `valid_from <=
    at < valid_to`, open versions matching any `at >= valid_from`.

    A pure filter: partition-prunable when the history is stored
    partitioned on a date bucket of valid_from, and never a join — the
    as-of-JOIN case (per-row `at`) is `asof_join` above.
    """
    at = F.lit(at) if not isinstance(at, F.Column) else at
    return history.filter(
        (F.col("valid_from") <= at)
        & (F.col("valid_to").isNull() | (at < F.col("valid_to")))
    )
