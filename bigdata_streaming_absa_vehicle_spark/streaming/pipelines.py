"""The two reference pipelines as engine-native streaming graphs
(SURVEY.md §3.1/§3.2), parameterized by source so the same graph runs against
Kafka in production and the file-replay source in tests.

ABSA:    envelope {id, review} -> normalize -> batched inference (8 aspect
         labels) -> absa_results rows -> idempotent sink.
Vehicle: envelope {camera_id, timestamp, frame_data} -> decode stub ->
         detection struct -> vehicle_counts rows -> idempotent sink;
         per-minute trend computed IN-STREAM (T-05), not in the dashboard.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.inference import with_absa_columns
from ..schemas import FRAME_ENVELOPE, REVIEW_ENVELOPE
from ..sources.kafka import parse_envelope


def absa_transform(parsed: DataFrame, model_version: str = "v0") -> DataFrame:
    """Parsed review envelope -> absa_results rows (FIXTURES §B2). Works on
    streaming and batch frames alike (the batch twin is hash-checked)."""
    normalized = parsed.select(
        F.col("id").alias("review_id"),
        F.coalesce(F.col("review"), F.lit("")).alias("review_text"),
    ).withColumn(
        "review_norm",
        F.trim(F.regexp_replace(F.lower(F.col("review_text")), r"\s+", " ")),
    )
    return with_absa_columns(normalized, text_col="review_norm", version=model_version).drop(
        "review_norm"
    )


def absa_stream(kafka_df: DataFrame, model_version: str = "v0") -> DataFrame:
    return absa_transform(parse_envelope(kafka_df, REVIEW_ENVELOPE), model_version)


VEHICLE_CLASSES = ("car", "bus", "truck", "motorbike")


def detected_classes_from_hash(frame_hash_col) -> "F.Column":
    """Per-class membership array from a PRECOMPUTED md5(frame) column.

    Formulated as concat(when(bit_c, [c]) ...) rather than a filter() HOF:
    every branch stays inside whole-stage codegen (array lambdas are
    interpreted), and the hash column is referenced once per class, which
    stops CollapseProject from inlining (and so recomputing) the content
    md5 per class — see with_detections for the two-step projection."""
    h = F.col(frame_hash_col) if isinstance(frame_hash_col, str) else frame_hash_col
    empty = F.array().cast("array<string>")
    parts = [
        F.when(
            F.conv(F.substring(F.md5(F.concat(h, F.lit(c))), 1, 4), 16, 10)
            .cast("long")
            .bitwiseAND(1)
            == 1,
            F.array(F.lit(c)),
        ).otherwise(empty)
        for c in VEHICLE_CLASSES
    ]
    return F.concat(*parts)


def with_detections(df: DataFrame, frame_data_col: str = "frame_data") -> DataFrame:
    """df + `picked` array<string>: the deterministic detection contract
    shared by the pipeline and the UDTF/explode surface (D-07) — per-class
    presence bits from the frame content hash (the real YOLO model swaps in
    behind the same array<string> contract, D-01). The frame hash gets its
    own projection and |classes| downstream references, so it materializes
    once per row."""
    return (
        df.withColumn("frame_hash_", F.md5(F.unbase64(frame_data_col)))
        .withColumn("picked", detected_classes_from_hash("frame_hash_"))
        .drop("frame_hash_")
    )


def detected_classes(frame_data_col: str = "frame_data"):
    """Single-expression form of the detection contract (recomputes the
    content hash per class); prefer with_detections in per-row hot paths."""
    return detected_classes_from_hash(F.md5(F.unbase64(frame_data_col)))


def vehicle_transform(parsed: DataFrame) -> DataFrame:
    """Parsed frame envelope -> vehicle_counts rows (db/init.sql:4-11 shape).

    The YOLO detection is represented by its deterministic contract: a
    struct<count int, vehicle_types string> derived from the frame content
    hash (the real model swaps in behind the same struct, D-01). Relational
    work the reference buried in the UDF — class filtering, type-string
    assembly (vehicle_consumer.py:94-98) — happens in engine expressions."""
    detection = F.struct(
        F.size("picked").cast("int").alias("count"),
        F.concat_ws(",", "picked").alias("vehicle_types"),
    )
    return (
        with_detections(parsed)
        .withColumn("detection", detection)
        .filter(F.col("detection.count") > 0)
        .select(
            "camera_id",
            F.col("detection.vehicle_types").alias("vehicle_type"),
            F.col("detection.count").alias("count"),
            F.timestamp_seconds(F.col("timestamp")).alias("frame_time"),
            F.current_timestamp().alias("processed_at"),
        )
    )


def vehicle_stream(kafka_df: DataFrame) -> DataFrame:
    return vehicle_transform(parse_envelope(kafka_df, FRAME_ENVELOPE))
