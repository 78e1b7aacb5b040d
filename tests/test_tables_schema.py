"""Environment-compat canary — FIRST suite alphabetically-ish and cheapest:
load all 10 testdata tables through the canonical loader and assert every
declared schema (schemas.TESTDATA_SCHEMAS) field-for-field.

Why this exists: between rounds 2 and 3 the sandbox's Spark moved from a
version where `spark.sql.legacy.parquet.nanosAsLong` worked to PySpark 4.1.2
where it is a silent no-op and events.parquet's TIMESTAMP(NANOS) arrives as
TIMESTAMP_NTZ — which broke 51 tests in 6 different files at once. This one
test makes any future engine/testdata drift fail in exactly one obvious place.
"""

from __future__ import annotations

import pytest

from bigdata_streaming_absa_vehicle_spark.schemas import TESTDATA_SCHEMAS
from bigdata_streaming_absa_vehicle_spark.tables import TABLE_NAMES, load

SMOKE_SF_DIR = "/root/testdata/sf0.001"


@pytest.mark.parametrize("name", TABLE_NAMES)
def test_table_loads_with_declared_schema(spark, name):
    df = load(spark, SMOKE_SF_DIR, name)
    declared = TESTDATA_SCHEMAS[name]
    got = [(f.name, f.dataType) for f in df.schema.fields]
    want = [(f.name, f.dataType) for f in declared.fields]
    assert got == want, f"{name}: loader schema drifted from declared schema"
    # The table must actually be readable, not just plannable.
    assert df.limit(1).count() >= 0


def test_events_ts_is_session_timestamp_at_micros(spark):
    """events.ts must arrive as the session-default TIMESTAMP regardless of
    how the engine version decodes parquet TIMESTAMP(NANOS) — this is the
    exact contract the round-3 Spark upgrade broke."""
    from pyspark.sql.types import TimestampType

    df = load(spark, SMOKE_SF_DIR, "events")
    assert isinstance(df.schema["ts"].dataType, TimestampType)
    row = df.orderBy("event_id").limit(1).collect()[0]
    assert row.ts.year >= 2020


def test_events_ts_matches_duckdb_truncation(spark, duck):
    """ns->us flooring parity with the DuckDB oracle on raw values."""
    df = load(spark, SMOKE_SF_DIR, "events")
    got = {
        r.event_id: r.ts for r in df.orderBy("event_id").limit(20).collect()
    }
    want = dict(
        duck.execute(
            f"SELECT event_id, ts FROM read_parquet('{SMOKE_SF_DIR}/events.parquet') "
            "ORDER BY event_id LIMIT 20"
        ).fetchall()
    )
    assert got == want
