"""Testdata table loaders (TESTDATA.md: parquet at /root/testdata/sf*/).

Loads are plain `spark.read.parquet` — columnar, predicate-pushdown- and
column-pruning-friendly; Catalyst prunes to the referenced columns so a
2-column projection never scans all 11 lineitem columns.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLE_NAMES = (
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
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
SMOKE_SF_DIR = "/root/testdata/sf0.001"
ORACLE_SF_DIR = "/root/testdata/sf0.01"


def _ship_package(spark: SparkSession) -> None:
    """Make this package importable on executor Python workers regardless of
    how the session was built. Our own session factory exports PYTHONPATH to
    executors, but the driver contract hands us ARBITRARY vanilla sessions —
    there, workers resolve package-referencing UDF closures only if the
    process cwd happens to be the repo root. addPyFile is the runtime
    equivalent of --py-files: zip the package once per session and ship it,
    so cloudpickle's by-reference module lookups succeed everywhere."""
    sc = spark.sparkContext
    if getattr(sc, "_graft_pkg_shipped", False):
        return
    import tempfile
    import zipfile

    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    root = os.path.dirname(pkg_dir)
    zpath = os.path.join(
        tempfile.gettempdir(), f"bigdata_streaming_absa_vehicle_spark_{os.getpid()}.zip"
    )
    with zipfile.ZipFile(zpath, "w") as z:
        for dirpath, _, files in os.walk(pkg_dir):
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(dirpath, f)
                    z.write(full, os.path.relpath(full, root))
    sc.addPyFile(zpath)
    sc._graft_pkg_shipped = True


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLE_NAMES:
        raise KeyError(f"unknown table {name!r}; known: {TABLE_NAMES}")
    _ship_package(spark)
    # Harmless no-op on Spark 4.1+ (which reads TIMESTAMP(NANOS) natively),
    # but required for a VANILLA session on Spark <= 4.0 to read
    # events.parquet at all — without it the scan throws PARQUET_TYPE_ILLEGAL
    # before the dtype branch in _canonical_timestamps can run.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    df = _canonical_timestamps(df, name)
    return df


def _canonical_timestamps(df: DataFrame, name: str) -> DataFrame:
    """Normalize every timestamp column to the session-default TIMESTAMP type
    at µs precision, version-robustly.

    The testdata stores `events.ts` as parquet TIMESTAMP(NANOS) and the date
    columns as TIMESTAMP(MICROS) with isAdjustedToUTC=false. How those arrive
    depends on the engine: Spark <= 4.0 with
    spark.sql.legacy.parquet.nanosAsLong=true reads nanos as an epoch-nanos
    LONG, while Spark 4.1+ ignores that conf (silently) and reads both
    flavors natively as TIMESTAMP_NTZ. Branching on the ACTUAL dtype instead
    of the engine version means a future Spark bump fails the one schema
    canary test instead of 50 queries: LONG ts -> timestamp_micros(ts DIV
    1000) (integer flooring, matching DuckDB's ns->µs truncation; native
    nanos decode floors identically), TIMESTAMP_NTZ -> cast to TIMESTAMP
    (wall-clock-preserving under the canonical UTC session timezone)."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType, TimestampNTZType

    if name == "events" and isinstance(df.schema["ts"].dataType, LongType):
        return df.withColumn("ts", F.expr("timestamp_micros(ts DIV 1000)"))
    ntz = [f.name for f in df.schema.fields if isinstance(f.dataType, TimestampNTZType)]
    for c in ntz:
        df = df.withColumn(c, F.col(c).cast("timestamp"))
    return df


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every testdata table as a temp view for spark.sql queries."""
    for name in TABLE_NAMES:
        load(spark, sf_dir, name).createOrReplaceTempView(name)


def write_partitioned(
    df: DataFrame, path: str, partition_cols: list[str], mode: str = "overwrite"
) -> None:
    """Write a result table hive-partitioned on its natural pruning key —
    the engine's replacement for the reference's Postgres B-tree indexes
    (db/init.sql:14-15): a date/camera filter then prunes whole directories
    at planning time (PartitionFilters in the scan) instead of scanning and
    filtering. At 100 TB, partition on the dominant filter column (event
    date, camera, lang) and keep files ~128 MB-1 GB via AQE coalesce."""
    df.write.mode(mode).partitionBy(*partition_cols).parquet(path)
