"""Plan introspection — programmatic access to the physical plan.

The engine's optimizer IS Catalyst (SURVEY.md §4: the reference has no
optimizer; every rewrite we rely on — pushdown, pruning, broadcast
selection, AQE — is Catalyst's).  This module makes those properties
checkable: tests and operators assert the plan they require instead of
hoping for it.  `tests/test_plans.py` consumes these.
"""

from __future__ import annotations

import contextlib
import io
import re

from pyspark.sql import DataFrame


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    """df.explain() as a string."""
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode)
    return buf.getvalue()


def n_nodes(df_or_plan: DataFrame | str, kind: str) -> int:
    """Count physical-plan NODES of a kind (formatted output mentions each
    node twice — tree line + detail header; count detail headers only)."""
    plan = df_or_plan if isinstance(df_or_plan, str) else explain_str(df_or_plan)
    return len(re.findall(rf"^\(\d+\) {kind}", plan, flags=re.MULTILINE))


def n_shuffles(df: DataFrame) -> int:
    return n_nodes(df, "Exchange")


def pushed_filters(df_or_plan: DataFrame | str) -> list[str]:
    """The PushedFilters lists of every scan in the plan."""
    plan = df_or_plan if isinstance(df_or_plan, str) else explain_str(df_or_plan)
    return re.findall(r"PushedFilters: \[(.*?)\]", plan)


def read_schemas(df_or_plan: DataFrame | str) -> list[str]:
    """The ReadSchema struct of every scan — the column-pruning witness."""
    plan = df_or_plan if isinstance(df_or_plan, str) else explain_str(df_or_plan)
    return re.findall(r"ReadSchema: (struct<[^\n]*)", plan)


def uses_broadcast_join(df: DataFrame) -> bool:
    return n_nodes(df, "BroadcastHashJoin") > 0


def falls_back_to_smj(df: DataFrame) -> bool:
    return n_nodes(df, "SortMergeJoin") > 0


def plan_report(df: DataFrame) -> dict:
    """One-call scale audit of a plan — the properties every operator here
    is reviewed against, as data: shuffle count, join strategies, scan
    pushdown/pruning, and Python-boundary nodes (the slow path at 100 TB).
    Tests pin plans with the individual helpers; users get this summary.
    """
    plan = explain_str(df)
    return {
        "exchanges": n_nodes(plan, "Exchange"),
        "broadcast_hash_joins": n_nodes(plan, "BroadcastHashJoin"),
        "sort_merge_joins": n_nodes(plan, "SortMergeJoin"),
        "broadcast_nested_loop_joins": n_nodes(plan, "BroadcastNestedLoopJoin"),
        "cartesian_products": n_nodes(plan, "CartesianProduct"),
        "take_ordered": n_nodes(plan, "TakeOrderedAndProject"),
        "python_boundary_nodes": sum(
            n_nodes(plan, k)
            for k in ("ArrowEvalPython", "BatchEvalPython", "MapInPandas", "FlatMapGroupsInPandas")
        ),
        "pushed_filters": pushed_filters(plan),
        "read_schemas": read_schemas(plan),
    }
