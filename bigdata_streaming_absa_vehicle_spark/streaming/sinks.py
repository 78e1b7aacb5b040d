"""Sinks (SURVEY.md S-05/S-06 + §4.3.4).

The reference appends blindly to Postgres inside foreachBatch and DROPS the
batch on failure (spark_kafka_consumer_dag.py:177-180) — at-most-once — while
crash-restart replays batches — at-least-once. Net effect: silent loss AND
duplicates. This module replaces that with a batch-id-keyed idempotent sink:
every row carries the micro-batch id, and a replayed batch first deletes its
own id's rows (parquet: partition overwrite; JDBC: DELETE WHERE batch_id)
making the write exactly-once end-to-end given a checkpointed source.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def idempotent_parquet_writer(out_dir: str) -> Callable[[DataFrame, int], None]:
    """foreachBatch function: write each micro-batch to a batch_id partition
    with dynamic partition overwrite — replaying batch N overwrites exactly
    partition N, never duplicating and never touching other batches."""

    def write(batch_df: DataFrame, batch_id: int) -> None:
        (
            batch_df.withColumn("batch_id", F.lit(batch_id))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(out_dir)
        )

    return write


def idempotent_jdbc_writer(
    url: str, table: str, properties: dict[str, str]
) -> Callable[[DataFrame, int], None]:
    """JDBC variant (S-05): delete-then-append keyed by batch_id. Optional —
    exercised only when a JDBC driver and database exist (the tests use the
    parquet variant; same contract)."""

    _MISSING_TABLE_MARKERS = ("does not exist", "doesn't exist", "not found", "unknown table")

    def write(batch_df: DataFrame, batch_id: int) -> None:
        import py4j  # noqa: F401  (jvm bridge always present under pyspark)

        spark = batch_df.sparkSession
        # delete any previous attempt of this batch; a failed delete (other
        # than table-missing on first write) MUST abort the batch — swallowing
        # it and appending anyway would duplicate the replayed rows, the exact
        # failure mode this sink exists to prevent
        try:
            conn_props = dict(properties)
            jvm_props = spark.sparkContext._jvm.java.util.Properties()
            for k, v in conn_props.items():
                jvm_props.setProperty(k, v)
            conn = spark.sparkContext._jvm.java.sql.DriverManager.getConnection(url, jvm_props)
            try:
                stmt = conn.createStatement()
                stmt.executeUpdate(f"DELETE FROM {table} WHERE batch_id = {int(batch_id)}")  # noqa: S608
                stmt.close()
            finally:
                conn.close()
        except Exception as e:
            if not any(m in str(e).lower() for m in _MISSING_TABLE_MARKERS):
                raise  # let the stream fail and retry this batch from checkpoint
        (
            batch_df.withColumn("batch_id", F.lit(batch_id))
            .write.mode("append")
            .jdbc(url, table, properties=properties)
        )

    return write


def console_preview_writer(num_rows: int = 5) -> Callable[[DataFrame, int], None]:
    """Debug sink (S-06) — the reference prints per-batch previews
    (spark_kafka_consumer_dag.py:156-157)."""

    def write(batch_df: DataFrame, batch_id: int) -> None:
        # one pass over the lineage: cache before the two actions, else the
        # whole batch transform (inference included) runs twice
        batch_df.persist()
        try:
            print(f"[batch {batch_id}] {batch_df.count()} rows")
            batch_df.show(num_rows, truncate=80)
        finally:
            batch_df.unpersist()

    return write
