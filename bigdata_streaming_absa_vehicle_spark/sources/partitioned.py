"""Hive-style partitioned parquet tables (S-12): directory partitioning +
static partition pruning + dynamic partition pruning (DPP).

`partitionBy(col)` at write time lays data out as one directory per
partition value; a filter on the partition column then prunes whole
directories at PLANNING time (static pruning — the scan never lists the
other directories), and a JOIN whose dimension side is filtered prunes
them at RUNTIME via dynamic partition pruning (Spark broadcasts the dim,
collects the surviving join keys, and injects them as a partition filter
into the fact scan). Both behaviors are plan-asserted in
tests/test_sources.py (test_partitioned_static_pruning,
test_partitioned_dynamic_partition_pruning).

Reference anchor: the reference's Postgres tables lean on B-tree indexes
for the dashboards' time filters (db/init.sql:14-15); date/directory
partitioning is the Spark-native replacement — at 100 TB, a date filter
that prunes 97% of partitions is the difference between scanning 3 TB and
100 TB, before a single row is read.

Sizing notes for cluster use:
- Partition on LOW-cardinality, always-filtered columns (date, region);
  high-cardinality partition keys create millions of small files.
- Target >= 1 GB of parquet per partition directory; combine with
  bucketing (S-10) inside partitions for join co-location.
- DPP needs the dim side broadcastable and the fact join key to BE the
  partition column (`spark.sql.optimizer.dynamicPartitionPruning.enabled`
  is on by default).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

# single implementation — tables.write_partitioned predates this module and
# test_plans.py::test_partitioned_write_enables_partition_pruning pins it
from ..tables import write_partitioned  # noqa: F401


def read_partitioned(spark: SparkSession, path: str) -> DataFrame:
    """Read a partitioned parquet tree; partition columns come back as
    regular columns reconstructed from the directory names."""
    return spark.read.parquet(path)
