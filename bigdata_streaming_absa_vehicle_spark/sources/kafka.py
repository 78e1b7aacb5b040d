"""Kafka source/sink builders (SURVEY.md S-01/S-07).

Mirrors the reference consumers' envelope handling
(spark_kafka_consumer_dag.py:37-54: readStream kafka -> CAST(value AS STRING)
-> from_json(fixed schema) -> select("d.*")) and pulls the reference's
kafka-python producer loop (producer.py:38-53) into the engine as a
to_json/writeStream sink.

No broker exists in the test container, so these builders are exercised up to
plan construction in tests; the parse stage (the part with semantics) is the
same `parse_envelope` used by the file-replay source, which IS hash-tested.

Scale notes: one Kafka partition maps to one Spark input partition — topic
partitioning is the parallelism ceiling; maxOffsetsPerTrigger bounds
micro-batch size (back-pressure), exactly as the reference configures
(50/trigger, spark_kafka_consumer_dag.py:43).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def kafka_options(
    brokers: str,
    topic: str,
    starting_offsets: str = "latest",
    max_offsets_per_trigger: int | None = None,
) -> dict[str, str]:
    """The exact option dict the reference consumer passes to its kafka
    readStream (spark_kafka_consumer_dag.py:37-45: bootstrap.servers,
    subscribe, startingOffsets, maxOffsetsPerTrigger). Pure function so the
    contract is unit-testable without a broker — the one source path that
    can never run live in this sandbox."""
    opts = {
        "kafka.bootstrap.servers": brokers,
        "subscribe": topic,
        "startingOffsets": starting_offsets,
    }
    if max_offsets_per_trigger is not None:
        opts["maxOffsetsPerTrigger"] = str(max_offsets_per_trigger)
    return opts


def read_stream(
    spark: SparkSession,
    brokers: str,
    topic: str,
    starting_offsets: str = "latest",
    max_offsets_per_trigger: int | None = None,
):
    """Kafka stream reader with the reference's options (S-01)."""
    reader = spark.readStream.format("kafka")
    for k, v in kafka_options(
        brokers, topic, starting_offsets, max_offsets_per_trigger
    ).items():
        reader = reader.option(k, v)
    return reader


def parse_envelope(kafka_df: DataFrame, schema: T.StructType) -> DataFrame:
    """CAST(value AS STRING) -> from_json(declared schema) -> flatten.
    Schema is declared, never inferred on the stream (SURVEY §1.3); a
    mismatched envelope yields nulls, which downstream filters route to a
    dead-letter path instead of crashing the query."""
    return (
        kafka_df.selectExpr("CAST(value AS STRING) AS json_str")
        .select(F.from_json("json_str", schema).alias("d"))
        .select("d.*")
    )


def parse_with_dead_letter(
    kafka_df: DataFrame, schema: T.StructType, required: list[str] | None = None
) -> tuple[DataFrame, DataFrame]:
    """Envelope parse with a dead-letter path: rows whose required fields
    parse to null (schema drift — the reference shipped exactly this bug,
    producer writing {"Review"} while the consumer expected {id, review},
    SURVEY §3.1.1) go to a (raw_value, offset-ish) dead-letter frame for
    replay/inspection instead of silently flowing nulls downstream or
    crashing the stream. Both returned frames work in batch and streaming."""
    required = required or [f.name for f in schema.fields]
    tagged = kafka_df.selectExpr("CAST(value AS STRING) AS raw_value").select(
        "raw_value", F.from_json("raw_value", schema).alias("d")
    )
    ok = None
    for name in required:
        cond = F.col(f"d.{name}").isNotNull()
        ok = cond if ok is None else (ok & cond)
    valid = tagged.filter(ok).select("d.*")
    dead = tagged.filter(~ok).select("raw_value")
    return valid, dead


def kafka_payload(df: DataFrame) -> DataFrame:
    """All columns JSON-serialized into the Kafka value envelope — the
    engine-native form of the reference's producer loop (producer.py:38-53:
    json.dumps(dict) -> utf-8 bytes). Unit-testable without a broker: the
    round trip payload -> parse_envelope is identity."""
    return df.select(F.to_json(F.struct(*df.columns)).cast("binary").alias("value"))


def to_kafka_sink(df: DataFrame, brokers: str, topic: str, checkpoint: str):
    """JSON-serialize all columns onto a topic (S-07)."""
    return (
        kafka_payload(df)
        .writeStream.format("kafka")
        .option("kafka.bootstrap.servers", brokers)
        .option("topic", topic)
        .option("checkpointLocation", checkpoint)
    )
