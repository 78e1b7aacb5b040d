"""File sources (SURVEY.md S-02/S-03/S-08) and the file-based stream replay
used by the streaming tests.

The replay writes a table out as N parquet files and streams them back with
maxFilesPerTrigger=1, giving deterministic micro-batches without a broker —
the same envelope/parse/window code paths as the Kafka source (S-01), which
differs only in the source format string.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def read_csv(spark: SparkSession, path: str, schema: T.StructType) -> DataFrame:
    """CSV with declared schema (S-02; reference reads with pandas,
    producer.py:44 — here the scan is distributed and schema-checked)."""
    return spark.read.csv(path, header=True, schema=schema)


def read_binary_files(spark: SparkSession, path: str, glob: str = "*") -> DataFrame:
    """binaryFile source (S-08): (path, modificationTime, length, content) —
    the batch twin of the reference's MP4->frame producer input side."""
    return spark.read.format("binaryFile").option("pathGlobFilter", glob).load(path)


def replay_as_stream(
    spark: SparkSession,
    df: DataFrame,
    staging_dir: str,
    n_files: int = 8,
    schema: T.StructType | None = None,
    order_col: str | None = None,
) -> DataFrame:
    """Write df as n_files parquet files and read them back as a stream,
    one file per micro-batch. With order_col set, files are range-partitioned
    on it so replay is quasi-ordered (intra-batch disorder, inter-batch
    progress) — the shape watermarks are designed for; a fully shuffled
    replay would declare half the data late."""
    if order_col is not None:
        staged = df.repartitionByRange(n_files, order_col)
    else:
        staged = df.repartition(n_files)
    staged.write.mode("overwrite").parquet(staging_dir)
    if order_col is not None:
        # FileStreamSource batches oldest-modification-time first; stamp
        # ascending mtimes in part-file (= range) order so micro-batches
        # arrive in event-time order like a real stream would.
        import os
        import time

        parts = sorted(
            f for f in os.listdir(staging_dir) if f.startswith("part-") and f.endswith(".parquet")
        )
        base = time.time() - len(parts) * 10
        for i, fname in enumerate(parts):
            os.utime(os.path.join(staging_dir, fname), (base + i * 10, base + i * 10))
    schema = schema or df.schema
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(staging_dir)
    )


def events_stream(spark: SparkSession, sf_dir: str, staging_dir: str, n_files: int = 8) -> DataFrame:
    """The events table replayed as a micro-batched stream (the testdata twin
    of the Kafka topics, FIXTURES.md §C)."""
    from ..tables import load

    return replay_as_stream(
        spark, load(spark, sf_dir, "events"), staging_dir, n_files, order_col="ts"
    )


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: T.StructType | str,
    mode: str = "FAILFAST",
    corrupt_col: str | None = None,
) -> DataFrame:
    """JSON-lines source with a DECLARED schema (S-02 extension): the
    interchange format web-scale text corpora actually ship in. Schema
    inference is refused on purpose — at 100 TB an inference pass is a full
    extra scan, and drifting inferred types break downstream plans; declare
    the schema and let malformed lines fail fast (default) or land in
    `corrupt_col` (mode='PERMISSIVE') for quarantine-and-continue pipelines.
    Line-delimited JSON splits by newline, so a single file still fans out
    across executors."""
    reader = spark.read.schema(schema).option("mode", mode)
    if corrupt_col is not None:
        reader = reader.option("columnNameOfCorruptRecord", corrupt_col)
    return reader.json(path)
