"""Scalar-function surface (SURVEY.md §2C, F-01..F-13): text normalization,
regex, JSON parse/serialize, base64/binary, array math. These are the
reference's per-row transforms (normalize_text spark_kafka_consumer_dag.py:104-108,
aspect regexes consumer_postgres_streaming.py:115-116, base64 frames
vehicle_consumer.py:81) lifted from Python loops into JVM-side, codegen'd
expressions — no Python worker in the hot path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.deterministic import dsum
from ..functions.deterministic import oracle_dsum as odsum
from ..tables import load
from .registry import query
from ..functions.ordering import pin
from ..functions.partitioning import fan_out


@query(
    "q28_normalize_text",
    oracle=r"""
    SELECT doc_id,
           trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'),
                               '\s+', ' ', 'g')) AS norm_text
    FROM documents
    ORDER BY doc_id
    """,
    tags=("F-01", "F-02"),
)
def q28_normalize_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """normalize_text (reference spark_kafka_consumer_dag.py:104-108): lower,
    strip disallowed chars (explicit char class — portable unicode semantics),
    collapse whitespace, trim. Spark regexp_replace is replace-all by default;
    the DuckDB oracle needs the 'g' flag to match."""
    docs = load(spark, sf_dir, "documents")
    norm = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(F.col("text")), "[^a-z0-9 ]", ""), r"\s+", " "
        )
    )
    return docs.select("doc_id", norm.alias("norm_text")).transform(pin).orderBy("doc_id")


@query(
    "q29_regexp_extract",
    oracle=r"""
    SELECT doc_id,
           regexp_extract(text, '(sp\w+)', 1) AS first_sp_word,
           regexp_extract(text, '(\d+)', 1) AS first_number
    FROM documents
    ORDER BY doc_id
    """,
    tags=("F-03",),
)
def q29_regexp_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Group extraction (reference '{Aspect}:(\\w+)' parse,
    consumer_postgres_streaming.py:115-116). Both engines return '' on
    no-match — verified, not assumed."""
    docs = load(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.regexp_extract("text", r"(sp\w+)", 1).alias("first_sp_word"),
        F.regexp_extract("text", r"(\d+)", 1).alias("first_number"),
    ).transform(pin).orderBy("doc_id")


@query(
    "q30_json_extract",
    oracle=f"""
    SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) % 10 AS k_bucket,
           COUNT(*) AS n,
           {odsum('value')} AS total_value
    FROM events
    GROUP BY 1
    ORDER BY k_bucket
    """,
    tags=("F-06",),
)
def q30_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON field extraction from the props payload (the batch twin of the
    Kafka-envelope from_json parse, spark_kafka_consumer_dag.py:49-54),
    bucketed to exercise the extracted value relationally."""
    ev = load(spark, sf_dir, "events")
    return (
        ev.withColumn("k", F.get_json_object("props", "$.k").cast("long"))
        .groupBy((F.col("k") % 10).alias("k_bucket"))
        .agg(F.count("*").alias("n"), dsum("value").alias("total_value"))
        .transform(pin).orderBy("k_bucket")
    )


@query(
    "q30b_from_json_struct",
    oracle="""
    SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
    FROM events
    WHERE CAST(json_extract_string(props, '$.k') AS BIGINT) > 90
    ORDER BY event_id
    """,
    tags=("F-06", "P-03"),
)
def q30b_from_json_struct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """from_json with the declared fixed schema + nested-struct dot access
    (P-03) — schema is declared, never inferred on the stream (SURVEY §1.3)."""
    from ..schemas import EVENT_PROPS

    ev = load(spark, sf_dir, "events")
    return (
        ev.withColumn("parsed", F.from_json("props", EVENT_PROPS))
        .select("event_id", F.col("parsed.k").alias("k"))
        .filter(F.col("k") > 90)
        .transform(pin).orderBy("event_id")
    )


@query(
    "q31_json_roundtrip",
    oracle="""
    SELECT event_id, event_type AS type_rt, user_id AS user_rt
    FROM events
    ORDER BY event_id
    """,
    tags=("F-07", "F-06"),
)
def q31_json_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """to_json(struct(...)) then from_json back (producer-side serialization,
    reference producer.py:40): the round-trip must be lossless. The oracle
    checks the recovered fields, not the JSON text (whose formatting is
    engine-specific)."""
    from pyspark.sql import types as T

    # fan_out (guide §2, r13): to_json + from_json is per-row CPU
    # amplification on a single-split sf0.1 scan (serialized on one core);
    # no-op on a many-split production scan.
    ev = fan_out(load(spark, sf_dir, "events"))
    schema = T.StructType(
        [
            T.StructField("event_type", T.StringType()),
            T.StructField("user_id", T.LongType()),
        ]
    )
    serialized = ev.select(
        "event_id", F.to_json(F.struct("event_type", "user_id")).alias("payload")
    )
    return (
        serialized.withColumn("parsed", F.from_json("payload", schema))
        .select(
            "event_id",
            F.col("parsed.event_type").alias("type_rt"),
            F.col("parsed.user_id").alias("user_rt"),
        )
        .transform(pin).orderBy("event_id")
    )


@query(
    "q32_base64_binary",
    oracle="""
    SELECT doc_id,
           substr(base64(encode(text)), 1, 24) AS b64_prefix,
           md5(text) AS content_md5,
           octet_length(encode(text)) AS n_bytes
    FROM documents
    ORDER BY doc_id
    """,
    tags=("F-08", "X-05"),
)
def q32_base64_binary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """base64 encode + content hash + byte length over a binary payload column
    — the multimodal frame_data pattern (vehicle_producer.py:23-26 encodes,
    vehicle_consumer.py:81 decodes); md5 is the content-addressing hash."""
    docs = load(spark, sf_dir, "documents")
    payload = F.col("text").cast("binary")
    return docs.select(
        "doc_id",
        F.substring(F.base64(payload), 1, 24).alias("b64_prefix"),
        F.md5(payload).alias("content_md5"),
        F.octet_length(payload).alias("n_bytes"),
    ).transform(pin).orderBy("doc_id")


@query(
    "q32b_unbase64_roundtrip",
    oracle="""
    SELECT doc_id, md5(text) AS roundtrip_md5, TRUE AS intact
    FROM documents
    ORDER BY doc_id
    """,
    tags=("F-08", "X-05"),
)
def q32b_unbase64_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Encode -> decode round-trip with an in-engine integrity check
    (unbase64(base64(x)) == x), the vehicle-frame wire format end-to-end."""
    docs = load(spark, sf_dir, "documents")
    payload = F.col("text").cast("binary")
    rt = F.unbase64(F.base64(payload))
    return docs.select(
        "doc_id",
        F.md5(rt).alias("roundtrip_md5"),
        (F.md5(rt) == F.md5(payload)).alias("intact"),
    ).transform(pin).orderBy("doc_id")


@query(
    "q33_string_assembly",
    oracle="""
    SELECT doc_id,
           lang || ':' || source AS lang_source,
           format('{}#{}', lang, CAST(n_chars AS VARCHAR)) AS tagged
    FROM documents
    ORDER BY doc_id
    """,
    tags=("F-10", "F-09"),
)
def q33_string_assembly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Label assembly f'{asp}:{s}' (consumer_postgres_streaming.py:110) via
    concat / format_string."""
    docs = load(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.concat_ws(":", "lang", "source").alias("lang_source"),
        F.format_string("%s#%s", F.col("lang"), F.col("n_chars").cast("string")).alias("tagged"),
    ).transform(pin).orderBy("doc_id")


@query(
    "q34_split_tokens",
    oracle=r"""
    SELECT doc_id,
           len(string_split_regex(trim(text), '\s+')) AS n_tokens,
           len(list_distinct(string_split_regex(trim(text), '\s+'))) AS n_distinct_tokens
    FROM documents
    ORDER BY doc_id
    """,
    tags=("F-09", "X-04"),
)
def q34_split_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace tokenization + distinct-token count (split is the inverse of
    the reference's ','.join at vehicle_consumer.py:98)."""
    docs = load(spark, sf_dir, "documents")
    toks = F.split(F.trim(F.col("text")), r"\s+")
    return docs.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_distinct_tokens"),
    ).transform(pin).orderBy("doc_id")


@query(
    "q35_argmax_array",
    oracle="""
    SELECT vec_id,
           list_position(embedding, list_aggregate(embedding, 'max')) AS argmax_idx,
           ROUND(CAST(list_aggregate(embedding, 'max') AS DOUBLE), 6) AS max_val
    FROM embeddings
    ORDER BY vec_id
    """,
    tags=("F-11",),
)
def q35_argmax_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    """argmax over an array column in pure SQL — the sentiment-pick over the
    probability vector (consumer_postgres_streaming.py:105-110) without a UDF.
    array_position/list_position are both 1-based; first-max wins in both."""
    emb = load(spark, sf_dir, "embeddings")
    return emb.select(
        "vec_id",
        F.array_position("embedding", F.array_max("embedding")).alias("argmax_idx"),
        F.round(F.array_max("embedding").cast("double"), 6).alias("max_val"),
    ).transform(pin).orderBy("vec_id")


@query(
    "q36_sigmoid_math",
    oracle="""
    SELECT event_id,
           ROUND(1.0 / (1.0 + exp(-(value - 100.0) / 50.0)), 6) AS sigmoid_score
    FROM events
    ORDER BY event_id
    """,
    tags=("F-12",),
)
def q36_sigmoid_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sigmoid post-processing (consumer_postgres_streaming.py:88-89) as a
    codegen'd expression; rounded to 6 dp to absorb libm ulp differences."""
    ev = load(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.round(1.0 / (1.0 + F.exp(-(F.col("value") - 100.0) / 50.0)), 6).alias("sigmoid_score"),
    ).transform(pin).orderBy("event_id")


@query(
    "q37_epoch_roundtrip",
    oracle="""
    SELECT event_id,
           CAST(floor(epoch(ts)) AS BIGINT) AS epoch_s,
           date_trunc('second', ts) AS ts_rt,
           strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour_bucket
    FROM events
    ORDER BY event_id
    """,
    tags=("F-04", "P-05"),
)
def q37_epoch_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Epoch seconds <-> timestamp round trip (reference
    from_unixtime(col('timestamp')).cast('timestamp'), vehicle_consumer.py:122)
    + hour truncation for the dashboard trend."""
    ev = load(spark, sf_dir, "events")
    epoch_s = F.unix_timestamp("ts")
    return ev.select(
        "event_id",
        epoch_s.alias("epoch_s"),
        F.timestamp_seconds(epoch_s).alias("ts_rt"),
        F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:mm:ss").alias("hour_bucket"),
    ).transform(pin).orderBy("event_id")


# ---------------------------------------------------------------------------
# F-06 (cont.): envelope parse-health audit over corrupt input
# ---------------------------------------------------------------------------

_PARSE_ORACLE = """
    WITH feed AS (
        SELECT CAST(FLOOR(epoch(date_trunc('day', ts))) AS BIGINT) // 86400 AS d,
               CASE WHEN event_id % 19 = 0 THEN '{' || props ELSE props END
                   AS raw
        FROM events
    ),
    parsed AS (
        SELECT d, raw,
               CASE WHEN json_valid(raw)
                    THEN CAST(json_extract(raw, '$.k') AS BIGINT)
                    ELSE NULL END AS k,
               CASE WHEN json_valid(raw) THEN 0 ELSE 1 END AS corrupt
        FROM feed
    )
    SELECT d,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(corrupt) AS BIGINT) AS n_corrupt,
           ROUND(CAST(SUM(corrupt) AS DOUBLE) / COUNT(*), 6) AS corrupt_share,
           CAST(SUM(k) AS BIGINT) AS sum_k_valid
    FROM parsed GROUP BY d ORDER BY d
"""


@query("q378_parse_health", oracle=_PARSE_ORACLE, tags=("F-06", "X-24"))
def q378_parse_health(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Envelope parse-health audit: the JSON payload feed with a
    deterministic corruption injected (every 19th envelope gets a
    leading stray brace — the q117/q372 simulation discipline), parsed in
    PERMISSIVE mode and scored per day: row count, unparseable count
    and share, and the extracted-field sum over the rows that DID
    parse. This certifies the failure path of the F-06 envelope parser
    the happy-path queries (q30/q30b) never touch — from_json returning
    NULL instead of killing the stream is exactly what PERMISSIVE mode
    promises, and the per-day corrupt share is the dead-letter-rate
    dashboard every ingest pipeline watches.

    Determinism: the corruption is pure key arithmetic; parse validity
    agrees across engines on this feed (valid JSON stays valid, a
    leading stray brace is invalid everywhere (trailing garbage would
    NOT be — Spark's Jackson parser stops after the first valid value,
    so the corruption must break the first token)); counts and the extracted sum
    are exact integers; one division, 6 dp.

    Scale shape: corruption, parse, and field extraction are MAP-ONLY
    (from_json in codegen); ONE map-side-combined rollup onto the
    calendar-bounded day relation. In the streaming twin this exact
    aggregate runs per micro-batch and feeds the q355-style alert.

    Reference parity: the reference's consumer crashes the batch on a
    malformed envelope (no bad-record branch in
    consumer_postgres_streaming.py); this is the engine-grade version."""
    feed = load(spark, sf_dir, "events").select(
        (F.unix_timestamp(F.date_trunc("day", F.col("ts"))) / F.lit(86400))
        .cast("long")
        .alias("d"),
        F.when(
            F.col("event_id") % 19 == 0, F.concat(F.lit("{"), F.col("props"))
        )
        .otherwise(F.col("props"))
        .alias("raw"),
    )
    # PERMISSIVE mode yields a struct with a populated _corrupt_record
    # column on parse failure (never a null struct) — the canonical
    # bad-record channel
    parsed = feed.select(
        "d",
        F.from_json(
            F.col("raw"),
            "k BIGINT, _corrupt_record STRING",
            {"columnNameOfCorruptRecord": "_corrupt_record"},
        ).alias("p"),
    ).select(
        "d",
        F.col("p.k").alias("k"),
        F.col("p._corrupt_record").isNotNull().cast("int").alias("corrupt"),
    )
    return (
        parsed.groupBy("d")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.sum("corrupt").cast("long").alias("n_corrupt"),
            F.round(F.sum("corrupt").cast("double") / F.count(F.lit(1)), 6).alias(
                "corrupt_share"
            ),
            F.sum("k").cast("long").alias("sum_k_valid"),
        )
        .transform(pin)
        .orderBy("d")
    )
