"""JDBC batch source (SURVEY.md S-04).

The reference's dashboards read result tables straight from Postgres
(projects/absa_streaming/streamlit/streamlit_app.py:42,
projects/vehicle_count/streamlit/streamlit_app.py:43-50 — single-threaded
pandas.read_sql). Here the same read is a Spark scan:

  - a plain read is ONE partition (one executor pinned to the DB) — fine for
    dashboard-sized result tables, wrong for anything big;
  - with `partition_column` + bounds, Spark issues `num_partitions` stride
    queries in parallel — the shape you use to lift a large table off a
    warehouse at scale;
  - with `predicates`, one partition per predicate (e.g. one per day) —
    parallelism plus WHERE-clause pushdown in the same breath.

Filters and column pruning on the returned DataFrame are pushed into the
remote SQL by Catalyst (JDBCScan shows PushedFilters), so `read_jdbc(...)
.filter(...).select(...)` ships only the needed rows/columns over the wire.

Tested end-to-end against the embedded Derby that ships inside Spark's JVM
(tests/test_sources.py) — no external database required.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def read_jdbc(
    spark: SparkSession,
    url: str,
    table: str,
    properties: dict[str, str] | None = None,
    *,
    predicates: list[str] | None = None,
    partition_column: str | None = None,
    lower_bound: int | str | None = None,
    upper_bound: int | str | None = None,
    num_partitions: int | None = None,
) -> DataFrame:
    """Read a database table (or `(subquery) alias`) as a DataFrame.

    Exactly one parallelism mode applies:
      * `partition_column` (+ `lower_bound`/`upper_bound`/`num_partitions`):
        stride-partitioned parallel scan on a numeric/date column;
      * `predicates`: one partition per WHERE fragment;
      * neither: single-partition read.
    """
    if predicates is not None and partition_column is not None:
        raise ValueError("pass either predicates or partition_column, not both")
    props = dict(properties or {})
    if partition_column is not None:
        if lower_bound is None or upper_bound is None or num_partitions is None:
            raise ValueError(
                "partition_column requires lower_bound, upper_bound and num_partitions"
            )
        return spark.read.jdbc(
            url,
            table,
            column=partition_column,
            lowerBound=lower_bound,
            upperBound=upper_bound,
            numPartitions=num_partitions,
            properties=props,
        )
    if predicates is not None:
        return spark.read.jdbc(url, table, predicates=predicates, properties=props)
    return spark.read.jdbc(url, table, properties=props)
