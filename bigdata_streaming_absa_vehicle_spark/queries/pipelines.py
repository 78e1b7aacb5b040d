"""End-to-end pipeline batch twins (SURVEY.md §3): the ABSA and vehicle
streaming graphs run over batch frames and hash-checked — the correctness
anchor for the streaming runs (which tests/test_streaming.py compares against
these same transforms), plus batch forms of the event-time windows
(T-05/T-06/T-07).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.partitioning import fan_out
from ..operators.inference import oracle_absa_pred
from ..schemas import ABSA_ASPECTS
from ..streaming.event_time import session_counts, sliding_counts, tumbling_counts
from ..streaming.pipelines import absa_transform, vehicle_transform
from ..tables import load
from .registry import query

_NORM = "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))"


def _documents_as_reviews(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents -> the {id, review} envelope (FIXTURES §A1)."""
    docs = load(spark, sf_dir, "documents")
    return docs.select(
        F.col("doc_id").cast("string").alias("id"), F.col("text").alias("review")
    )


def _absa_oracle() -> str:
    pred_cols = ",\n           ".join(
        f"{oracle_absa_pred(_NORM, aspect)} AS {aspect}_pred" for aspect in ABSA_ASPECTS
    )
    return f"""
    SELECT CAST(doc_id AS VARCHAR) AS review_id,
           text AS review_text,
           {pred_cols},
           'v0' AS model_version
    FROM documents
    ORDER BY CAST(review_id AS BIGINT)
    """


@query("q60_absa_inference_batch", oracle=_absa_oracle(), tags=("D-02", "F-01", "S-05"))
def q60_absa_inference_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full ABSA pipeline transform (normalize -> Arrow-batched pandas_udf
    inference -> absa_results row shape) on batch input. The stub model is
    md5-derived, so the ENTIRE pandas_udf path — Arrow transfer, per-worker
    model cache, argmax tie-breaks — is hash-checked against a SQL oracle
    (reference path: spark_kafka_consumer_dag.py:137-175, rebuilt
    executor-side per consumer_postgres_streaming.py:74-91)."""
    reviews = _documents_as_reviews(spark, sf_dir)
    return absa_transform(reviews, model_version="v0").transform(pin).orderBy(
        F.col("review_id").cast("long")
    )


def _absa_counts_oracle() -> str:
    unions = "\n        UNION ALL\n        ".join(
        f"SELECT '{aspect}' AS aspect, {oracle_absa_pred(_NORM, aspect)} AS label FROM documents"
        for aspect in ABSA_ASPECTS
    )
    return f"""
    WITH long_form AS (
        {unions}
    )
    SELECT aspect, label, COUNT(*) AS n
    FROM long_form
    GROUP BY aspect, label
    ORDER BY aspect, label
    """


@query("q61_absa_sentiment_counts", oracle=_absa_counts_oracle(), tags=("A-02", "A-10", "D-03"))
def q61_absa_sentiment_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ABSA dashboard aggregation (sentiment counts per aspect, absa
    streamlit_app.py:76-94) computed engine-side off the inference output."""
    preds = absa_transform(_documents_as_reviews(spark, sf_dir), model_version="v0")
    stack_expr = ", ".join(f"'{a}', {a}_pred" for a in ABSA_ASPECTS)
    return (
        preds.selectExpr(f"stack({len(ABSA_ASPECTS)}, {stack_expr}) AS (aspect, label)")
        .groupBy("aspect", "label")
        .agg(F.count("*").alias("n"))
        .transform(pin).orderBy("aspect", "label")
    )


from ..streaming.pipelines import VEHICLE_CLASSES as _VEHICLE_CLASSES  # noqa: E402
from ..functions.ordering import pin


def _vehicle_oracle() -> str:
    bit = (
        "(CAST(('0x' || substr(md5(md5(props) || '{c}'), 1, 4)) AS BIGINT) & 1) = 1"
    )
    classes_lit = "[" + ",".join(f"'{c}'" for c in _VEHICLE_CLASSES) + "]"
    picked = (
        f"list_filter({classes_lit}, c -> CASE "
        + " ".join(
            f"WHEN c = '{c}' THEN " + bit.format(c=c) for c in _VEHICLE_CLASSES
        )
        + " END)"
    )
    return f"""
    WITH frames AS (
        SELECT 'CAM_' || CAST(user_id % 2 AS VARCHAR) AS camera_id,
               date_trunc('second', ts) AS frame_time,
               {picked} AS picked
        FROM events
    )
    SELECT camera_id,
           array_to_string(picked, ',') AS vehicle_type,
           CAST(len(picked) AS INTEGER) AS count,
           frame_time
    FROM frames
    WHERE len(picked) > 0
    ORDER BY camera_id, frame_time, vehicle_type
    """


@query("q62_vehicle_pipeline_batch", oracle=_vehicle_oracle(), tags=("D-01", "P-03", "F-08"))
def q62_vehicle_pipeline_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The vehicle pipeline transform on batch input: events dressed as frame
    envelopes (camera_id, epoch seconds, base64 payload) -> detection struct
    -> vehicle_counts rows (processed_at excluded from the hash — it is
    processing time by definition, FIXTURES §D4).

    fan_out (guide §2, r13): vehicle_transform runs one md5 per (row,
    class) before its first exchange, and the sf0.1 events scan is one
    parquet split — the kernel serialized on one core (opt_sqlprof r13:
    1 task, 1.58 s of 2.0 s). No-op on a many-split production scan; the
    streaming path keeps its own micro-batch parallelism untouched."""
    ev = fan_out(load(spark, sf_dir, "events"))
    envelope = ev.select(
        F.concat(F.lit("CAM_"), (F.col("user_id") % 2).cast("string")).alias("camera_id"),
        F.unix_timestamp("ts").cast("double").alias("timestamp"),
        F.base64(F.col("props").cast("binary")).alias("frame_data"),
    )
    return (
        vehicle_transform(envelope)
        .drop("processed_at")
        .transform(pin).orderBy("camera_id", "frame_time", "vehicle_type")
    )


@query(
    "q63_tumbling_window_batch",
    oracle=f"""
    SELECT date_trunc('minute', ts) AS window_start,
           date_trunc('minute', ts) + INTERVAL 1 MINUTE AS window_end,
           event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(28,2))) AS DOUBLE) AS total_value
    FROM events
    GROUP BY 1, 2, 3
    ORDER BY window_start, event_type
    """,
    tags=("T-05", "A-06"),
)
def q63_tumbling_window_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of the T-05 tumbling window — same function the streaming
    test runs with a watermark; window() semantics vs explicit date_trunc."""
    ev = load(spark, sf_dir, "events")
    return tumbling_counts(ev).transform(pin).orderBy("window_start", "event_type")


@query(
    "q64_sliding_window_batch",
    oracle="""
    WITH expanded AS (
        SELECT date_trunc('minute', ts) - o.o * INTERVAL 1 MINUTE AS window_start
        FROM events, range(0, 10) o(o)
    )
    SELECT window_start,
           window_start + INTERVAL 10 MINUTE AS window_end,
           COUNT(*) AS n_events
    FROM expanded
    GROUP BY 1, 2
    ORDER BY window_start
    """,
    tags=("T-06",),
)
def q64_sliding_window_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of the T-06 sliding window (10 min window, 1 min slide:
    every event lands in 10 windows — the oracle expands via range join)."""
    ev = load(spark, sf_dir, "events")
    return sliding_counts(ev).transform(pin).orderBy("window_start")


@query(
    "q65_session_window_batch",
    oracle="""
    WITH marked AS (
        SELECT user_id, ts,
               CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts)
                         <= INTERVAL 30 MINUTE THEN 0 ELSE 1 END AS new_session
        FROM events
    ), numbered AS (
        SELECT user_id, ts,
               SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                      ROWS UNBOUNDED PRECEDING) AS session_no
        FROM marked
    )
    SELECT MIN(ts) AS session_start,
           MAX(ts) + INTERVAL 30 MINUTE AS session_end,
           user_id,
           COUNT(*) AS n_events
    FROM numbered
    GROUP BY user_id, session_no
    ORDER BY user_id, session_start
    """,
    tags=("T-07",),
)
def q65_session_window_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of the T-07 session window (30-minute gap): session_window()
    vs the oracle's gaps-and-islands formulation — same sessions, same
    boundaries (end = last event + gap)."""
    ev = load(spark, sf_dir, "events")
    return session_counts(ev).transform(pin).orderBy("user_id", "session_start")
