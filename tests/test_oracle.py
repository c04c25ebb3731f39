"""Driver-gate replica: every declared query vs its DuckDB oracle at sf0.01."""

from __future__ import annotations

import pytest

from flume_spark.queries import all_oracles, all_queries
from tests.conftest import SF_ORACLE
from tests.oracle_harness import compare, duckdb_con

QUERIES = all_queries()
ORACLES = all_oracles()


@pytest.fixture(scope="module")
def con():
    return duckdb_con(SF_ORACLE)


def test_every_oracle_has_query():
    missing = set(ORACLES) - set(QUERIES)
    assert not missing, f"oracles without queries: {missing}"


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_match(name, spark, con):
    spark_df = QUERIES[name](spark, SF_ORACLE)
    oracle_df = con.execute(ORACLES[name]).fetchdf()
    compare(spark_df, oracle_df, name)


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLES)))
def test_rows_only(name, spark, con):
    """Queries without oracles must still run and return a stable schema."""
    df = QUERIES[name](spark, SF_ORACLE)
    assert df.columns
    assert df.count() >= 0
