"""Declarative data-quality checks — the dbt/Great-Expectations-style
constraint pass every production table needs before anything downstream
trusts it: not-null, uniqueness, accepted values, numeric ranges.

One scan for all row-level rules (each rule is a sum-of-CASE aggregate
fused into the same Aggregate), plus one count-distinct pass per
uniqueness rule (exact; inherently its own shuffle).  The report is one
row per rule with its violation count — exact integers, so it
hash-checks cross-engine.

No reference analog (the queue validates job payloads, not tables);
engine-native per the pipeline mandate.
"""

from __future__ import annotations

from collections.abc import Sequence
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Rule:
    name: str          # report key, e.g. "orderkey_not_null"
    kind: str          # not_null | unique | accepted_values | in_range | expr
    column: str | None = None
    values: tuple = ()          # accepted_values
    lo: float | None = None     # in_range (inclusive)
    hi: float | None = None
    expr: str | None = None     # kind="expr": SQL boolean, True = VIOLATION


def _violation_expr(rule: Rule) -> Column:
    c = F.col(rule.column) if rule.column else None
    if rule.kind == "not_null":
        return c.isNull()
    if rule.kind == "accepted_values":
        return ~c.isin(list(rule.values)) | c.isNull()
    if rule.kind == "in_range":
        return c.isNull() | (c < rule.lo) | (c > rule.hi)
    if rule.kind == "expr":
        return F.expr(rule.expr)
    raise ValueError(f"unknown rule kind {rule.kind!r}")


def check_rules(df: DataFrame, rules: list[Rule]) -> DataFrame:
    """Evaluate every rule; returns (rule, n_violations) with one row per
    rule (0 = clean).  Row-level rules share ONE aggregate over one scan;
    each `unique` rule costs one exact count-distinct (its own shuffle —
    at extreme cardinality swap in approx_count_distinct and accept the
    sketch error, the standard trade).
    """
    spark = df.sparkSession
    row_rules = [r for r in rules if r.kind != "unique"]
    uniq_rules = [r for r in rules if r.kind == "unique"]

    reports = []
    if row_rules:
        # coalesce(sum, 0): over an EMPTY input sum(CASE..) is NULL, and an
        # empty streaming micro-batch is vacuously clean — downstream
        # "batch N was clean" gates compare n_violations == 0, which NULL
        # would silently fail (round-4 ADVICE).  Oracles must match
        # (coalesce(sum(...), 0) in TABLE_CHECKS_SQL).
        aggs = [
            F.coalesce(
                F.sum(F.when(_violation_expr(r), F.lit(1)).otherwise(F.lit(0))),
                F.lit(0),
            ).alias(r.name)
            for r in row_rules
        ]
        wide = df.agg(*aggs)
        # unpivot the 1-row wide frame into (rule, n_violations)
        stack = ", ".join(f"'{r.name}', {r.name}" for r in row_rules)
        reports.append(
            wide.selectExpr(
                f"stack({len(row_rules)}, {stack}) AS (rule, n_violations)"
            )
        )
    for r in uniq_rules:
        reports.append(
            df.agg(
                (F.count(r.column) - F.count_distinct(F.col(r.column)))
                .alias("n_violations")
            ).select(F.lit(r.name).alias("rule"), "n_violations")
        )
    if not reports:
        return spark.createDataFrame([], "rule string, n_violations long")
    out = reports[0]
    for extra in reports[1:]:
        out = out.unionByName(extra)
    return out


def streaming_checks(
    spark,
    report_dir: str,
    ledger_dir: str,
    rules: list[Rule],
):
    """foreachBatch handler enforcing the rules as a STREAMING data
    contract: each micro-batch's violation report lands in a per-batch
    partition of `report_dir` (overwrite — replay-convergent under the
    streaming/sink.py ledger), so downstream consumers can gate on
    "batch N was clean" or alert on a rising violation rate without the
    stream itself ever blocking.

    Usage:
        handler = streaming_checks(spark, report_dir, ledger_dir, rules)
        stream.writeStream.foreachBatch(handler).start()
        spark.read.parquet(report_dir)   # (rule, n_violations, ingest_batch)
    """
    import os

    from flume_spark.streaming.sink import idempotent_foreach_batch

    os.makedirs(report_dir, exist_ok=True)

    def _process(batch_df, batch_id: int) -> None:
        report = check_rules(batch_df, rules)
        report.write.mode("overwrite").parquet(
            os.path.join(report_dir, f"ingest_batch={batch_id}")
        )

    return idempotent_foreach_batch(_process, ledger_dir)


def k_anonymity_report(
    df: DataFrame,
    quasi_cols: list[str],
    sensitive_col: str,
    k: int,
    by: str | None = None,
) -> DataFrame:
    """Privacy audit over a quasi-identifier combination: per `by` group
    (or one global row), how many quasi-identifier equivalence classes
    exist, how many are SMALLER than `k` (k-anonymity violations — rows
    in them are re-identifiable by joining the quasi columns against an
    external dataset), how many rows sit in violating classes, and the
    worst l-diversity (min distinct sensitive values per class — a
    k-anonymous class is still disclosive when everyone in it shares the
    sensitive value; Machanavajjhala et al., l-diversity).

    `by` (optional) must be ONE OF `quasi_cols` — the report then rolls
    up per value of that column instead of one global row.

    Releasing a "scrubbed" training corpus is exactly this exposure:
    text_pii_scrub removes direct identifiers, this measures the
    INDIRECT ones.  Plan: one shuffle on the quasi columns (map-side
    combinable counts + distinct-sensitive agg), then a tiny rollup —
    never a self-join, so it scales as a plain two-level aggregation.
    All outputs are exact integers.
    """
    if by is not None and by not in quasi_cols:
        raise ValueError("`by` must be one of quasi_cols")
    class_stats = df.groupBy(*quasi_cols).agg(
        F.count(F.lit(1)).alias("__n"),
        F.countDistinct(sensitive_col).alias("__l"),
    )
    grouped = class_stats.groupBy(F.lit(1).alias("__all") if by is None else by)
    out = grouped.agg(
        F.count(F.lit(1)).alias("n_classes"),
        F.count(F.when(F.col("__n") < k, 1)).alias("risky_classes"),
        F.sum(F.when(F.col("__n") < k, F.col("__n")).otherwise(0)).alias(
            "risky_rows"
        ),
        F.min("__l").alias("min_l_diversity"),
    )
    return out if by is not None else out.drop("__all")


def profile_table(
    df: DataFrame,
    ndv_cols: Sequence[str],
    min_max_cols: Sequence[str] = (),
) -> DataFrame:
    """ANALYZE-style one-pass table profile: row count, per-column null
    count and exact distinct count for ``ndv_cols``, min/max for
    ``min_max_cols`` — the statistics a warehouse keeps per table for
    CBO join ordering, file-pruning sanity checks, and drift monitoring
    between corpus releases.

    Plan shape: ONE fused Aggregate over one scan — the exact NDVs share
    a single Expand (Spark rewrites multiple count-distincts into one
    expand + two-level aggregate, map-side partials intact), nulls and
    min/max ride the same pass for free.  At 100 TB the Expand multiplies
    map-side rows by len(ndv_cols)+1; when that matters, swap
    count_distinct for approx_count_distinct (the `approx_distinct`
    sibling query) — same plan minus the Expand.  Min/max stay native-typed
    (no string casts), so the profile hash-checks cross-engine exactly.
    """
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in ndv_cols:
        aggs.append(F.count_distinct(F.col(c)).alias(f"ndv_{c}"))
        aggs.append(
            F.sum(F.col(c).isNull().cast("long")).alias(f"nulls_{c}")
        )
    for c in min_max_cols:
        aggs.append(F.min(F.col(c)).alias(f"min_{c}"))
        aggs.append(F.max(F.col(c)).alias(f"max_{c}"))
    return df.agg(*aggs)
