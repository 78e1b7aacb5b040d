"""Driver contract for the spark-graft builder (PySpark target).

Thin adapter over the engine's query registry
(`bigdata_streaming_absa_vehicle_spark.queries`): every declared operator from
SURVEY.md §2 is one registry entry bundling the PySpark implementation with
its DuckDB oracle SQL, so `queries()` and `oracle_sql()` stay in lockstep by
construction.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from bigdata_streaming_absa_vehicle_spark.queries import all_queries  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H-Q1-shaped pricing summary) on sf0.001."""
    spec = all_queries()["q09_pricing_summary"]
    return spec.fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: spec.fn for name, spec in all_queries().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for each hash-checkable query; non-SQL-expressible
    ops (streaming state, LSH candidate generation) are omitted on purpose —
    the driver records the weaker rows-only check for those."""
    return {name: spec.oracle for name, spec in all_queries().items() if spec.oracle is not None}
