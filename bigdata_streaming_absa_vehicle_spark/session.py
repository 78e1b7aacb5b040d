"""SparkSession factory.

Tuned so the same code runs on local[N] for tests and on a multi-executor
cluster unchanged: AQE on (runtime coalesce + skew-join splitting), Arrow on
for every pandas boundary (the reference disables it in one variant,
consumer_postgres_streaming.py:34 — we reverse that), UTC session timezone so
timestamp semantics match the DuckDB oracle.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def default_parallelism() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))


def _repo_root() -> str:
    return os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def get_spark(app_name: str = "bigdata-streaming-absa-vehicle-spark",
              extra_conf: dict[str, str] | None = None) -> SparkSession:
    """Build (or reuse) the engine SparkSession.

    shuffle.partitions is sized to the local core count; on a real cluster it
    is overridden by AQE's coalesce, so the setting is a ceiling not a constant.
    """
    cpus = default_parallelism()
    # Python workers unpickle UDF closures that reference this package; make
    # sure they can import it regardless of the driver's cwd. On a cluster
    # the same is done with --py-files / spark.submit.pyFiles.
    root = _repo_root()
    pythonpath = os.environ.get("PYTHONPATH", "")
    if root not in pythonpath.split(os.pathsep):
        os.environ["PYTHONPATH"] = f"{root}{os.pathsep}{pythonpath}" if pythonpath else root
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.default.parallelism", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.executorEnv.PYTHONPATH", os.environ["PYTHONPATH"])
        .config("spark.sql.autoBroadcastJoinThreshold", str(32 * 1024 * 1024))
        # testdata events.parquet stores TIMESTAMP(NANOS); read as epoch-nanos
        # long and convert in the loader (tables.load) — Spark has no ns type.
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # InferFiltersFromGenerate synthesizes size(arr)>0 below every
        # non-outer explode and pushes it through projections, re-inlining
        # (and so double-evaluating) expensive array expressions — a net
        # loss whenever building the array costs more than generating zero
        # rows from it (q68's hash-derived detections). Semantics-neutral.
        .config(
            "spark.sql.optimizer.excludedRules",
            "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate",
        )
        # Streaming state at scale: RocksDB-backed state store (SURVEY 7.3.2).
        .config(
            "spark.sql.streaming.stateStore.providerClass",
            "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
        )
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
