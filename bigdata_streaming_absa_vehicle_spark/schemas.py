"""Every declared schema in one module (SURVEY.md section 1.3: schemas are fixed
and hand-declared at every boundary — never inferred on a stream).

Streaming envelopes mirror the reference's Kafka JSON payloads:
  - review envelope: reference spark_kafka_consumer_dag.py:49-54
  - frame envelope:  reference vehicle_consumer.py:44-48
Result-table schemas mirror the reference's Postgres DDL (db/init.sql:4-11).
"""

from __future__ import annotations

from pyspark.sql import types as T

# --------------------------------------------------------------------------
# Streaming envelopes (FIXTURES.md section A)
# --------------------------------------------------------------------------

#: ABSA review message: {"id": "...", "review": "..."}
REVIEW_ENVELOPE = T.StructType(
    [
        T.StructField("id", T.StringType(), True),
        T.StructField("review", T.StringType(), True),
    ]
)

#: Variant envelope {"Review": "..."} (reference new_producer.py:51) — kept to
#: exercise schema-mismatch handling (from_json yields nulls on mismatch).
REVIEW_ENVELOPE_VARIANT = T.StructType([T.StructField("Review", T.StringType(), True)])

#: Vehicle frame message: {"camera_id", "timestamp" (unix seconds), "frame_data" (base64 JPEG)}
FRAME_ENVELOPE = T.StructType(
    [
        T.StructField("camera_id", T.StringType(), True),
        T.StructField("timestamp", T.DoubleType(), True),
        T.StructField("frame_data", T.StringType(), True),
    ]
)

#: Synthetic events stream envelope — the driver testdata `events` table serialized
#: to JSON plays the role of the Kafka value in streaming tests (TESTDATA.md).
EVENT_ENVELOPE = T.StructType(
    [
        T.StructField("event_id", T.LongType(), True),
        T.StructField("ts", T.TimestampType(), True),
        T.StructField("user_id", T.LongType(), True),
        T.StructField("event_type", T.StringType(), True),
        T.StructField("value", T.DoubleType(), True),
        T.StructField("props", T.StringType(), True),
    ]
)

#: JSON document carried inside events.props, e.g. '{"k": 87}'
EVENT_PROPS = T.StructType([T.StructField("k", T.LongType(), True)])

# --------------------------------------------------------------------------
# Result tables (FIXTURES.md section B)
# --------------------------------------------------------------------------

#: vehicle_counts sink table (reference db/init.sql:4-11, minus the serial id)
VEHICLE_COUNTS = T.StructType(
    [
        T.StructField("camera_id", T.StringType(), False),
        T.StructField("vehicle_type", T.StringType(), False),
        T.StructField("count", T.IntegerType(), False),
        T.StructField("frame_time", T.TimestampType(), False),
        T.StructField("processed_at", T.TimestampType(), False),
    ]
)

#: detection struct returned by the vehicle UDF (reference vehicle_consumer.py:106-109)
DETECTION = T.StructType(
    [
        T.StructField("count", T.IntegerType(), True),
        T.StructField("vehicle_types", T.StringType(), True),
    ]
)

#: ABSA aspects (reference models/saved_absa_model/absa_config.json:6-15)
ABSA_ASPECTS = (
    "Price",
    "Shipping",
    "Outlook",
    "Quality",
    "Size",
    "Shop_Service",
    "General",
    "Others",
)
ABSA_NUM_CLASSES = 4
ABSA_SENTIMENTS = ("NEG", "NEU", "POS")  # decode map, consumer_postgres_streaming.py:96-112

# --------------------------------------------------------------------------
# Driver testdata tables (FIXTURES.md section C) — declared, not inferred.
# --------------------------------------------------------------------------

TESTDATA_SCHEMAS: dict[str, T.StructType] = {
    "region": T.StructType(
        [
            T.StructField("r_regionkey", T.IntegerType()),
            T.StructField("r_name", T.StringType()),
        ]
    ),
    "nation": T.StructType(
        [
            T.StructField("n_nationkey", T.IntegerType()),
            T.StructField("n_name", T.StringType()),
            T.StructField("n_regionkey", T.IntegerType()),
        ]
    ),
    "customer": T.StructType(
        [
            T.StructField("c_custkey", T.LongType()),
            T.StructField("c_name", T.StringType()),
            T.StructField("c_nationkey", T.IntegerType()),
            T.StructField("c_acctbal", T.DoubleType()),
            T.StructField("c_mktsegment", T.StringType()),
        ]
    ),
    "supplier": T.StructType(
        [
            T.StructField("s_suppkey", T.LongType()),
            T.StructField("s_name", T.StringType()),
            T.StructField("s_nationkey", T.IntegerType()),
            T.StructField("s_acctbal", T.DoubleType()),
        ]
    ),
    "part": T.StructType(
        [
            T.StructField("p_partkey", T.LongType()),
            T.StructField("p_name", T.StringType()),
            T.StructField("p_brand", T.StringType()),
            T.StructField("p_type", T.StringType()),
            T.StructField("p_size", T.IntegerType()),
            T.StructField("p_retailprice", T.DoubleType()),
        ]
    ),
    "orders": T.StructType(
        [
            T.StructField("o_orderkey", T.LongType()),
            T.StructField("o_custkey", T.LongType()),
            T.StructField("o_orderstatus", T.StringType()),
            T.StructField("o_totalprice", T.DoubleType()),
            T.StructField("o_orderdate", T.TimestampType()),
            T.StructField("o_orderpriority", T.StringType()),
        ]
    ),
    "lineitem": T.StructType(
        [
            T.StructField("l_orderkey", T.LongType()),
            T.StructField("l_partkey", T.LongType()),
            T.StructField("l_suppkey", T.LongType()),
            T.StructField("l_linenumber", T.IntegerType()),
            T.StructField("l_quantity", T.DoubleType()),
            T.StructField("l_extendedprice", T.DoubleType()),
            T.StructField("l_discount", T.DoubleType()),
            T.StructField("l_tax", T.DoubleType()),
            T.StructField("l_returnflag", T.StringType()),
            T.StructField("l_linestatus", T.StringType()),
            T.StructField("l_shipdate", T.TimestampType()),
        ]
    ),
    "events": EVENT_ENVELOPE,
    "documents": T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
            T.StructField("lang", T.StringType()),
            T.StructField("source", T.StringType()),
            T.StructField("n_chars", T.LongType()),
        ]
    ),
    "embeddings": T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("embedding", T.ArrayType(T.FloatType())),
            T.StructField("label", T.IntegerType()),
        ]
    ),
}

EMBEDDING_DIM = 64
