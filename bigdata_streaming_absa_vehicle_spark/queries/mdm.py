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

from ..functions.ordering import pin, stage
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


# ---------------------------------------------------------------------------
# X-124: consistent-hashing ring rebalance audit
# ---------------------------------------------------------------------------

_CH_NODES = 16  #: virtual ring positions (node i at hash('node:i'))
_CH_LEAVING = 7  #: the node whose departure is audited


def _ch_ring_sql() -> str:
    from ..operators.dedup import oracle_hash64

    rows = []
    for i in range(_CH_NODES):
        lit = "'" + f"node:{i}" + "'"
        rows.append(
            f"SELECT {i} AS node, {oracle_hash64('ring', lit)} AS pos"
        )
    return " UNION ALL ".join(rows)


_CH_ORACLE = f"""
    WITH ring AS ({_ch_ring_sql()}),
    keys AS (
        SELECT DISTINCT user_id,
               CAST(('0x' || substr(md5('key:' || CAST(user_id AS VARCHAR)),
                                    1, 15)) AS BIGINT) AS kpos
        FROM events
    ),
    owner AS (
        SELECT k.user_id, k.kpos,
               COALESCE(MIN(CASE WHEN r.pos >= k.kpos THEN r.node END),
                        (SELECT node FROM ring ORDER BY pos LIMIT 1))
                   AS node
        FROM keys k CROSS JOIN ring r
        GROUP BY k.user_id, k.kpos
    ),
    owner2 AS (
        SELECT k.user_id,
               COALESCE(MIN(CASE WHEN r.pos >= k.kpos AND r.node <> {_CH_LEAVING}
                            THEN r.node END),
                        (SELECT node FROM ring WHERE node <> {_CH_LEAVING}
                         ORDER BY pos LIMIT 1)) AS node
        FROM keys k CROSS JOIN ring r
        GROUP BY k.user_id, k.kpos
    )
    SELECT o2.node AS node,
           CAST(COUNT(*) AS BIGINT) AS keys_after,
           CAST(SUM(CASE WHEN o1.node = {_CH_LEAVING} THEN 1 ELSE 0 END)
                AS BIGINT) AS keys_received,
           CAST(SUM(CASE WHEN o1.node <> o2.node
                         AND o1.node <> {_CH_LEAVING} THEN 1 ELSE 0 END)
                AS BIGINT) AS keys_stolen_wrongly
    FROM owner o1 JOIN owner2 o2 USING (user_id)
    GROUP BY o2.node
    ORDER BY node
"""


@query("q334_consistent_hash_rebalance", oracle=_CH_ORACLE, tags=("X-124", "X-16"))
def q334_consistent_hash_rebalance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Consistent-hashing ring rebalance audit: place 16 nodes and every
    user key on the md5 ring (clockwise successor ownership), remove
    node {_CH_LEAVING}, and report per surviving node how many keys it
    now owns, how many it RECEIVED from the leaver, and — the property
    consistent hashing exists to guarantee — how many keys moved
    between two SURVIVING nodes (must be 0: only the leaver's keys
    remap). The shard-assignment audit for stateful-stream/store
    topology changes; the keys_stolen_wrongly column is the invariant
    certificate.

    Determinism: ring positions and key positions are md5-derived
    exact integers; ownership is a MIN over integer comparisons with
    the wraparound pinned to the smallest-position node; every count is
    exact.

    Scale shape: keys distinct-reduce first; ownership is a bounded
    16-row broadcast cross join with a MIN rollup per key (at scale:
    a range join against the sorted ring, same result); the audit is
    one keyed rollup.

    Reference parity: beyond-reference; infrastructure-layer math for
    the T-family's stateful shards."""
    from ..operators.dedup import hash64

    ring = spark.createDataFrame(
        [
            (
                i,
                int(
                    __import__("hashlib")
                    .md5(f"ring:node:{i}".encode())
                    .hexdigest()[:15],
                    16,
                ),
            )
            for i in range(_CH_NODES)
        ],
        "node int, pos long",
    )
    keys = (
        load(spark, sf_dir, "events")
        .select("user_id")
        .distinct()
        .select("user_id", hash64("key", F.col("user_id").cast("string")).alias("kpos"))
        .transform(stage)  # both ownership passes share it
    )
    wrap1 = ring.orderBy("pos").limit(1).select(F.col("node").alias("wnode"))
    wrap2 = (
        ring.filter(F.col("node") != _CH_LEAVING)
        .orderBy("pos")
        .limit(1)
        .select(F.col("node").alias("wnode"))
    )

    def owners(r: DataFrame, wrap: DataFrame) -> DataFrame:
        return (
            keys.crossJoin(F.broadcast(r))
            .groupBy("user_id")
            .agg(
                F.min(
                    F.when(F.col("pos") >= F.col("kpos"), F.col("node"))
                ).alias("succ")
            )
            .crossJoin(F.broadcast(wrap))
            .select(
                "user_id", F.coalesce("succ", "wnode").alias("node")
            )
        )

    o1 = owners(ring, wrap1)
    o2 = owners(ring.filter(F.col("node") != _CH_LEAVING), wrap2)
    return (
        o1.withColumnRenamed("node", "n1")
        .join(o2.withColumnRenamed("node", "n2"), "user_id")
        .groupBy(F.col("n2").alias("node"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("keys_after"),
            F.sum(F.when(F.col("n1") == _CH_LEAVING, 1).otherwise(0))
            .cast("long")
            .alias("keys_received"),
            F.sum(
                F.when(
                    (F.col("n1") != F.col("n2"))
                    & (F.col("n1") != _CH_LEAVING),
                    1,
                ).otherwise(0)
            )
            .cast("long")
            .alias("keys_stolen_wrongly"),
        )
        .transform(pin)
        .orderBy("node")
    )
