"""Local replica of the driver's DuckDB-oracle correctness gate.

Runs a declared Spark query and its oracle SQL on the same parquet tables,
then compares row count, column names, and an order-insensitive canonical
form of every value (columns sorted by name, rows sorted by value tuple).
Stricter than a hash compare: mismatches show the first differing row.
"""

from __future__ import annotations

import datetime as dt
import math
import os
from decimal import Decimal

import duckdb
import numpy as np
import pandas as pd

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def duckdb_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    return con


def _canon(v):
    """Canonicalize one cell for cross-engine comparison."""
    if v is None:
        return None
    if isinstance(v, (np.ndarray, list, tuple)):
        return tuple(_canon(x) for x in v)
    if isinstance(v, np.datetime64):
        if np.isnat(v):
            return None
        return pd.Timestamp(v).to_pydatetime().replace(tzinfo=None).isoformat()
    if isinstance(v, np.generic):
        v = v.item()
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # exact: distinguishes 0.1 from 0.1000000001
        return ("f", repr(v))
    if isinstance(v, Decimal):
        return ("f", repr(float(v)))
    if isinstance(v, pd.Timestamp):
        return v.to_pydatetime().replace(tzinfo=None).isoformat()
    if isinstance(v, dt.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, dt.date):
        return v.isoformat()
    if isinstance(v, (bytes, bytearray)):
        return ("b", bytes(v).hex())
    if isinstance(v, bool):
        return ("i", int(v))
    if isinstance(v, int):
        return ("i", v)
    return v


def _frame_to_rows(df: pd.DataFrame) -> list[tuple]:
    cols = sorted(df.columns)
    recs = df[cols].to_records(index=False)
    rows = [tuple(_canon(v) for v in rec) for rec in recs]
    rows.sort(key=lambda r: tuple(repr(x) for x in r))
    return rows


def compare(spark_df, oracle_df: pd.DataFrame, name: str) -> None:
    spdf = spark_df.toPandas()
    assert sorted(spdf.columns) == sorted(oracle_df.columns), (
        f"{name}: column mismatch spark={sorted(spdf.columns)} "
        f"oracle={sorted(oracle_df.columns)}"
    )
    assert len(spdf) == len(oracle_df), (
        f"{name}: row count spark={len(spdf)} oracle={len(oracle_df)}"
    )
    srows = _frame_to_rows(spdf)
    orows = _frame_to_rows(oracle_df)
    for i, (s, o) in enumerate(zip(srows, orows)):
        assert s == o, (
            f"{name}: first differing row #{i}:\n  spark : {s}\n  oracle: {o}"
        )
