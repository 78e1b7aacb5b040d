"""Bucketed tables (S-10): pre-shuffled, co-located storage for the joins and
aggregations you run repeatedly at 100 TB.

`bucketBy(n, key)` hash-partitions rows into a fixed number of files per
partition at WRITE time; every subsequent join or aggregation on the bucket
key reads the buckets as pre-shuffled input and skips its Exchange entirely —
the same hash-partition contract a shuffle would establish, paid once at
ingest instead of per query. The bucketed-join elimination is plan-asserted in
tests/test_sources.py::test_bucketed_join_skips_shuffle.

Reference anchor: the reference app re-reads its Postgres result tables per
dashboard query (streamlit_app.py) — bucketing is the Spark-native answer to
"this key is joined every time".

Notes for cluster use:
- Both join sides must be bucketed with the SAME bucket count on the join
  key (or one side's count a divisor of the other with
  spark.sql.bucketing.coalesceBucketsInJoin.enabled).
- `sortBy` within buckets additionally removes the per-task sort of a
  sort-merge join.
- Choose bucket counts so one bucket of the FACT table fits an executor
  task comfortably: e.g. 100 TB / 4096 buckets ≈ 25 GB per bucket — too
  big; 65536 buckets ≈ 1.5 GB — right order. Bucket counts are a write-time
  commitment; pick for the largest consumer.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: Sequence[str],
    n_buckets: int,
    sort_cols: Sequence[str] | None = None,
    path: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist `df` as a bucketed parquet table registered in the session
    catalog. `path` makes it an external table (data at that location);
    without it the session warehouse dir is used."""
    w = df.write.mode(mode).format("parquet").bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    if path is not None:
        w = w.option("path", path)
    w.saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed table back with its bucket spec intact (plain
    `spark.read.parquet(path)` would DROP the bucketing metadata — always
    read through the catalog)."""
    return spark.table(table)
