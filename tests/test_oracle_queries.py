"""The correctness gate, run locally: every registered query with an oracle is
executed on Spark and on DuckDB over the same parquet tables and compared
exactly (after canonicalization). Mirrors the driver's CORRECTNESS check.

Runs at sf0.01 by default — the driver's own oracle scale — so a green run
is evidence at the scale the driver checks. Set
SPARK_GRAFT_TEST_SF_DIR=/root/testdata/sf0.001 for a faster smoke pass while
iterating.
"""

from __future__ import annotations

import os

import pytest

from bigdata_streaming_absa_vehicle_spark.queries import all_queries

from conftest import assert_frames_match, duck_sql

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.01")

SPECS = all_queries()


@pytest.mark.parametrize("name", sorted(SPECS))
def test_query_matches_oracle(name, spark, duck):
    spec = SPECS[name]
    result = spec.fn(spark, SF_DIR).toPandas()
    if spec.oracle is None:
        # rows-only check (driver does the same for non-SQL-expressible ops)
        assert result is not None
        return
    expected = duck_sql(duck, spec.oracle, SF_DIR)
    assert_frames_match(result, expected, name)
