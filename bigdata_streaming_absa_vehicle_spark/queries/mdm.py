"""Identity-resolution survivorship / golden-record consolidation
(SURVEY.md §2K extension X-28): collapse every observation of an entity
into ONE master record using per-attribute survivorship rules — the MDM
step that follows X-01/X-02 dedup (dedup finds that records co-refer;
survivorship decides which field values the merged record keeps).

Rules exercised (the standard trio): RECENCY (latest value wins, under
the (ts, event_id) total order), FREQUENCY (most common categorical wins,
count-desc then lexicographic tie-break), and AGGREGATE (lifetime totals
and first/last timestamps).  All rules are deterministic total orders, so
the golden record is reproducible from any replay of the same data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..tables import load
from .registry import query


@query(
    "q181_user_golden_record",
    oracle="""
    WITH base AS (
        SELECT user_id,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               MIN(ts) AS first_seen,
               MAX(ts) AS last_seen,
               CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS total_cents
        FROM events GROUP BY user_id
    ),
    latest AS (
        SELECT user_id, value AS last_value
        FROM (
            SELECT user_id, value,
                   ROW_NUMBER() OVER (
                       PARTITION BY user_id ORDER BY ts DESC, event_id DESC
                   ) AS rn
            FROM events
        ) WHERE rn = 1
    ),
    freq AS (
        SELECT user_id, event_type AS top_type
        FROM (
            SELECT user_id, event_type,
                   ROW_NUMBER() OVER (
                       PARTITION BY user_id
                       ORDER BY COUNT(*) DESC, event_type ASC
                   ) AS rn
            FROM events GROUP BY user_id, event_type
        ) WHERE rn = 1
    )
    SELECT base.user_id AS user_id, n_events, first_seen, last_seen,
           ROUND(CAST(total_cents AS DOUBLE) / 100, 2) AS total_value,
           ROUND(last_value, 2) AS last_value, top_type
    FROM base
    JOIN latest ON base.user_id = latest.user_id
    JOIN freq ON base.user_id = freq.user_id
    ORDER BY user_id
    """,
    tags=("X-28", "A-08", "W-01"),
)
def q181_user_golden_record(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Golden record per user: lifetime aggregates (count/first/last/
    total), the most recent value (RECENCY survivorship under the
    (ts, event_id) total order), and the dominant event type (FREQUENCY
    survivorship, count-desc + lexicographic tie-break).  The master
    record an identity-resolution pipeline materializes after X-02
    clustering decides which rows co-refer.

    Scale shape: all three legs shuffle ONCE each on the SAME 8-byte
    entity key and join co-partitioned on it — the aggregate leg is
    map-side combined; the recency leg is the grouped-top-k plan (q13:
    in-partition sort, no global sort); the frequency leg rolls up to
    the bounded (user × ≤5 types) relation before its window.  Nothing
    ever reshuffles on a different key (every Exchange in the plan hashes
    the entity id — plan-asserted), so the three legs pipeline into
    co-partitioned joins with zero re-keying at 100 TB."""
    ev = load(spark, sf_dir, "events")
    cents = F.round(F.col("value") * 100).cast("long")
    base = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.min("ts").alias("first_seen"),
        F.max("ts").alias("last_seen"),
        F.sum(cents).cast("long").alias("total_cents"),
    )
    w_rec = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    latest = (
        ev.select("user_id", "value", "ts", "event_id")
        .withColumn("rn", F.row_number().over(w_rec))
        .where(F.col("rn") == 1)
        .select("user_id", F.col("value").alias("last_value"))
    )
    w_freq = Window.partitionBy("user_id").orderBy(
        F.col("cnt").desc(), F.col("event_type").asc()
    )
    freq = (
        ev.groupBy("user_id", "event_type")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .withColumn("rn", F.row_number().over(w_freq))
        .where(F.col("rn") == 1)
        .select("user_id", F.col("event_type").alias("top_type"))
    )
    return (
        base.join(latest, "user_id")
        .join(freq, "user_id")
        .select(
            "user_id",
            "n_events",
            "first_seen",
            "last_seen",
            F.round(F.col("total_cents").cast("double") / 100, 2).alias("total_value"),
            F.round("last_value", 2).alias("last_value"),
            "top_type",
        )
        .orderBy("user_id")
    )
