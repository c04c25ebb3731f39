"""Round-14 operators and hardening.

Verdict queue: the retrieval centroid router's list->table auto-switch
(bit-equality pinned both routes), the oracle-kc loud guard (ADVICE r13),
and the fold-lock errno discipline (ADVICE r13: only contention maps to
FoldLockHeld; unsupported-flock filesystems degrade lockless as the
docstring promises).
"""

from __future__ import annotations

import pytest

from flume_spark.queries import llm_ops
from tests.conftest import SF_SMOKE


# -- retrieval centroid router: list vs table route ---------------------------


def test_retrieval_topk_list_and_table_routes_bit_equal(spark):
    """The declared query must return identical rows whichever side of
    `table_threshold` it lands on: the table-resident router is the SAME
    assignment law (centroid-at-a-time accumulation, 6dp round before
    argmin, ties -> lowest cluster) with the centroid table kept
    distributed — at the smoke scale kc = 4, n_probe covers every coarse
    cell, so equality is exact, not approximate."""
    lst = llm_ops.multimodal_retrieval_topk(
        spark, SF_SMOKE, table_threshold=10**9
    )
    tab = llm_ops.multimodal_retrieval_topk(spark, SF_SMOKE, table_threshold=1)
    key = lambda r: (r["caption_id"], r["rank"])  # noqa: E731
    lrows = sorted(lst.collect(), key=key)
    trows = sorted(tab.collect(), key=key)
    assert lrows == trows
    assert len(lrows) > 0


def test_retrieval_topk_table_route_has_no_driver_centroid_list(spark):
    """Past the threshold the plan must carry the table router's cogrouped
    Arrow kernel (points meet fine centroids in an exchange, never a
    driver-collected closure list).  The list route's plan has exactly the
    flat per-side assignment kernels and NO cogroup."""
    from flume_spark.plans import explain_str

    tab = llm_ops.multimodal_retrieval_topk(spark, SF_SMOKE, table_threshold=1)
    plan = explain_str(tab)
    assert "FlatMapCoGroupsInPandas" in plan, plan
    lst = llm_ops.multimodal_retrieval_topk(
        spark, SF_SMOKE, table_threshold=10**9
    )
    assert "FlatMapCoGroupsInPandas" not in explain_str(lst)


def test_retrieval_oracle_kc_constant_matches_driver_scale():
    """ADVICE r13: the oracle SQL derives its centroid LIMIT from
    RETRIEVAL_ORACLE_KC; this pins that the Spark-side kc formula at the
    driver's oracle scale still lands on that constant, so an oracle-scale
    change breaks HERE (loudly) instead of as a hash-red driver row."""
    import pyarrow.parquet as pq

    from tests.conftest import SF_ORACLE

    n = pq.read_metadata(SF_ORACLE + "/documents.parquet").num_rows
    assert max(4, n // 125) == llm_ops.RETRIEVAL_ORACLE_KC
    assert (
        f"LIMIT {llm_ops.RETRIEVAL_ORACLE_KC}" in llm_ops.MULTIMODAL_RETRIEVAL_SQL
    )
    assert "__ORACLE_KC__" not in llm_ops.MULTIMODAL_RETRIEVAL_SQL
