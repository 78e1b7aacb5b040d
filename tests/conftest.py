"""Shared fixtures: one SparkSession per test session, a DuckDB connection with
the testdata views pre-registered, and the oracle comparison helper that
mirrors the driver's check (row-count + schema names + order-insensitive
values, compared exactly after 6-dp float rounding)."""

from __future__ import annotations

import math
import os
from datetime import datetime, date

import duckdb
import pandas as pd
import pytest

from bigdata_streaming_absa_vehicle_spark.session import get_spark
from bigdata_streaming_absa_vehicle_spark.tables import TABLE_NAMES

ORACLE_SF_DIR = os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01")
SMOKE_SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    spark = get_spark("pytest")
    yield spark


@pytest.fixture(scope="session")
def duck():
    con = duckdb.connect()
    extra = os.environ.get("SPARK_GRAFT_TEST_SF_DIR")
    for sf_dir in {ORACLE_SF_DIR, SMOKE_SF_DIR} | ({extra} if extra else set()):
        schema = "sf" + sf_dir.rstrip("/").split("sf")[-1].replace(".", "_")
        con.execute(f"CREATE SCHEMA IF NOT EXISTS {schema}")
        for t in TABLE_NAMES:
            con.execute(
                f"CREATE VIEW {schema}.{t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
            )
    yield con
    con.close()


def duck_sql(con: duckdb.DuckDBPyConnection, sql: str, sf_dir: str) -> pd.DataFrame:
    schema = "sf" + sf_dir.rstrip("/").split("sf")[-1].replace(".", "_")
    con.execute(f"USE memory.{schema}")
    return con.sql(sql).df()


def _canon_value(v):
    if v is None:
        return ""
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return format(round(v, 6), ".6f")
    if isinstance(v, (datetime, pd.Timestamp)):
        return pd.Timestamp(v).isoformat()
    if isinstance(v, date):
        return v.isoformat()
    if isinstance(v, (list, tuple)) or hasattr(v, "tolist"):
        seq = v.tolist() if hasattr(v, "tolist") else v
        return "[" + ",".join(_canon_value(x) for x in seq) + "]"
    if isinstance(v, (bool,)):
        return str(bool(v))
    if isinstance(v, bytes):
        return v.hex()
    return str(v)


def canonicalize(df: pd.DataFrame) -> list[tuple]:
    """Columns sorted by name, every value stringified (floats at 6 dp),
    rows sorted — the order-insensitive form the driver hashes."""
    cols = sorted(df.columns)
    out = []
    for row in df[cols].itertuples(index=False):
        out.append(tuple(_canon_value(v) for v in row))
    out.sort()
    return out


def assert_frames_match(spark_df: pd.DataFrame, oracle_df: pd.DataFrame, name: str = "?"):
    assert sorted(spark_df.columns) == sorted(oracle_df.columns), (
        f"{name}: column mismatch spark={sorted(spark_df.columns)} oracle={sorted(oracle_df.columns)}"
    )
    assert len(spark_df) == len(oracle_df), (
        f"{name}: row count spark={len(spark_df)} oracle={len(oracle_df)}"
    )
    a, b = canonicalize(spark_df), canonicalize(oracle_df)
    if a != b:
        diffs = [(x, y) for x, y in zip(a, b) if x != y][:5]
        raise AssertionError(f"{name}: value mismatch, first diffs {diffs}")
