"""Declared query surface: name -> (spark, sf_dir) -> DataFrame, plus DuckDB oracles.

Aggregated from submodules by domain:
- relational     — engine-native Catalyst surface (scans, joins, aggs, windows,
                   set ops, scalar functions).  No reference analog (flume does
                   no relational processing); declared per SURVEY.md §2.3-2.7.
- queue_semantics — SQL-checkable analogs of the reference's queue operators
                   (due-filter, top-K-due, counts, backoff, md5 ledger,
                   windowed rate counts, batch grouping) per SURVEY.md §2.
- llm_ops        — dedup / similarity / text-analysis / multimodal operators
                   for LLM-data pipelines (SURVEY.md §7 phase 3).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from flume_spark.queries import llm_ops, queue_semantics, relational, temporal, tpch_extra

QueryFn = Callable[[SparkSession, str], DataFrame]


def all_queries() -> dict[str, QueryFn]:
    out: dict[str, QueryFn] = {}
    for mod in (relational, queue_semantics, llm_ops, temporal, tpch_extra):
        out.update(mod.QUERIES)
    return out


def all_oracles() -> dict[str, str]:
    out: dict[str, str] = {}
    for mod in (relational, queue_semantics, llm_ops, temporal, tpch_extra):
        out.update(mod.ORACLES)
    return out
