"""Training-set assembly operators (SURVEY.md §2K extensions, X-16 / X-17):
the steps between a cleaned corpus and a training run — temporal and
group-aware train/val/test splitting with leakage accounting, deterministic
per-key reservoir sampling, sequence-length bucketing for batch packing, and
class-balance weighting.

The reference app has none of these (its pipeline ends at Postgres inserts,
e.g. consumer_postgres_streaming.py:120-135); they are declared engine
surface for the 100 TB training-data use case. Everything is deterministic:
splits are pure functions of (timestamp | md5(key)), sample priorities are
md5 hashes, and the only double math is a final share/weight division whose
operands are bit-identical in both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.ordering import pin, stage
from ..tables import load
from .registry import query

# ---------------------------------------------------------------------------
# X-16: dataset splitting — temporal, with cross-split leakage accounting
# ---------------------------------------------------------------------------

_SPLIT_BOUNDS = ("2024-01-22", "2024-01-26")  # train < b0 <= val < b1 <= test


@query(
    "q131_temporal_split",
    oracle=f"""
    WITH base AS (
        SELECT user_id, ts,
               CASE WHEN ts < TIMESTAMP '{_SPLIT_BOUNDS[0]}' THEN 'train'
                    WHEN ts < TIMESTAMP '{_SPLIT_BOUNDS[1]}' THEN 'val'
                    ELSE 'test' END AS split,
               CASE WHEN ts < TIMESTAMP '{_SPLIT_BOUNDS[0]}' THEN 0
                    WHEN ts < TIMESTAMP '{_SPLIT_BOUNDS[1]}' THEN 1
                    ELSE 2 END AS split_rank
        FROM events
    ),
    stats AS (
        SELECT split, COUNT(*) AS n_rows, COUNT(DISTINCT user_id) AS n_users,
               MIN(ts) AS min_ts, MAX(ts) AS max_ts
        FROM base GROUP BY split
    ),
    user_splits AS (SELECT DISTINCT user_id, split, split_rank FROM base),
    leak AS (
        SELECT split, COUNT(*) AS n_leaked_users
        FROM (
            SELECT split, split_rank,
                   MIN(split_rank) OVER (PARTITION BY user_id) AS first_rank
            FROM user_splits
        )
        WHERE split_rank > first_rank
        GROUP BY split
    )
    SELECT s.split, s.n_rows, s.n_users,
           COALESCE(l.n_leaked_users, 0) AS n_leaked_users,
           s.min_ts, s.max_ts
    FROM stats s LEFT JOIN leak l ON s.split = l.split
    ORDER BY s.split
    """,
    tags=("X-16", "A-04", "J-04"),
)
def q131_temporal_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temporal train/val/test split with leakage accounting: events are
    assigned to splits by timestamp boundary, and each split reports how
    many of its users ALSO appear in an earlier split — the cross-split
    contamination a time-based split of user data must surface before
    training (a user in both train and test leaks future behavior).

    Scale shape: split assignment is a map-only CASE on the scan; the
    per-split stats are one groupBy on a 3-value key; leakage needs one
    shuffle on user_id (distinct (user, split) pairs, then a min-rank
    window over each user's <=3 rows) — the fact payload never travels,
    only (user_id, split_rank) pairs."""
    b0, b1 = _SPLIT_BOUNDS
    ev = load(spark, sf_dir, "events").select("user_id", "ts")
    base = ev.withColumn(
        "split",
        F.when(F.col("ts") < b0, "train").when(F.col("ts") < b1, "val").otherwise("test"),
    ).withColumn(
        "split_rank",
        F.when(F.col("ts") < b0, 0).when(F.col("ts") < b1, 1).otherwise(2),
    )
    stats = base.groupBy("split").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count_distinct("user_id").alias("n_users"),
        F.min("ts").alias("min_ts"),
        F.max("ts").alias("max_ts"),
    )
    user_splits = base.select("user_id", "split", "split_rank").distinct()
    first = Window.partitionBy("user_id")
    leak = (
        user_splits.withColumn("first_rank", F.min("split_rank").over(first))
        .filter(F.col("split_rank") > F.col("first_rank"))
        .groupBy("split")
        .agg(F.count(F.lit(1)).alias("n_leaked_users"))
    )
    return (
        stats.join(F.broadcast(leak), "split", "left")
        .select(
            "split",
            "n_rows",
            "n_users",
            F.coalesce("n_leaked_users", F.lit(0).cast("long")).alias("n_leaked_users"),
            "min_ts",
            "max_ts",
        )
        .transform(pin)
        .orderBy("split")
    )


# ---------------------------------------------------------------------------
# X-16: group-aware (hash-bucketed) split — every key wholly in one split
# ---------------------------------------------------------------------------

#: first hex nibble of md5(user_id) -> bucket 0..15; 12/2/2 train/val/test.
_BUCKET_EXPR = "instr('0123456789abcdef', substr(md5(cast(user_id as {t})), 1, 1)) - 1"


@query(
    "q132_group_hash_split",
    oracle=f"""
    WITH base AS (
        SELECT user_id,
               {_BUCKET_EXPR.format(t='VARCHAR')} AS bucket
        FROM events
    ),
    tagged AS (
        SELECT user_id,
               CASE WHEN bucket < 12 THEN 'train'
                    WHEN bucket < 14 THEN 'val'
                    ELSE 'test' END AS split,
               bucket
        FROM base
    )
    SELECT split, COUNT(*) AS n_rows, COUNT(DISTINCT user_id) AS n_users,
           CAST(MIN(bucket) AS INT) AS min_bucket,
           CAST(MAX(bucket) AS INT) AS max_bucket,
           ROUND(CAST(COUNT(*) AS DOUBLE) / COUNT(DISTINCT user_id), 6)
               AS events_per_user
    FROM tagged
    GROUP BY split
    ORDER BY split
    """,
    tags=("X-16", "O-03"),
)
def q132_group_hash_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Group-aware train/val/test split: the split is a pure function of
    md5(user_id) (first hex nibble -> 16 buckets -> 12/2/2), so every
    user's events land wholly in ONE split by construction — the
    group-integrity guarantee a per-row random split cannot give, and the
    standard way to keep a user's future interactions out of eval.

    Scale shape: assignment is map-only (hash of the key, no state, no
    join); reproducible across engines, runs, and backfills because the
    hash replaces a seeded RNG. The stats aggregate shuffles once on the
    3-value split key with distinct-user counting."""
    bucket = F.expr(_BUCKET_EXPR.format(t="string"))
    tagged = (
        load(spark, sf_dir, "events")
        .select("user_id")
        .withColumn("bucket", bucket)
        .withColumn(
            "split",
            F.when(F.col("bucket") < 12, "train")
            .when(F.col("bucket") < 14, "val")
            .otherwise("test"),
        )
    )
    return (
        tagged.groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.count_distinct("user_id").alias("n_users"),
            F.min("bucket").cast("int").alias("min_bucket"),
            F.max("bucket").cast("int").alias("max_bucket"),
            F.round(
                F.count(F.lit(1)).cast("double") / F.count_distinct("user_id"), 6
            ).alias("events_per_user"),
        )
        .transform(pin)
        .orderBy("split")
    )


# ---------------------------------------------------------------------------
# X-16: deterministic per-key reservoir sample (uniform A-res with md5 keys)
# ---------------------------------------------------------------------------


@query(
    "q133_reservoir_sample_per_key",
    oracle="""
    SELECT lang, doc_id, priority, CAST(rk AS INT) AS rk
    FROM (
        SELECT lang, doc_id, priority,
               ROW_NUMBER() OVER (PARTITION BY lang ORDER BY priority, doc_id) AS rk
        FROM (
            SELECT lang, doc_id,
                   md5(lang || ':' || CAST(doc_id AS VARCHAR)) AS priority
            FROM documents
        )
    )
    WHERE rk <= 5
    ORDER BY lang, rk
    """,
    tags=("X-16", "O-05"),
)
def q133_reservoir_sample_per_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-key reservoir sample: exactly k=5 documents per
    language, chosen by md5 priority — Efraimidis-Spirakis A-res with the
    seeded RNG replaced by a content hash, so the "random" sample is
    reproducible across engines, runs, and incremental backfills (a new
    document displaces the max-priority member iff its hash is smaller,
    exactly the reservoir update rule).

    Scale shape: priorities are map-only; selection is grouped top-k — here
    a row_number window (one shuffle on the key), and because top-k-by-
    priority is a mergeable aggregate, at 100 TB the same query runs as
    partial per-partition reservoirs merged at the final agg (the q13
    grouped-top-k pattern) with only k rows per key crossing the wire."""
    pri = (
        load(spark, sf_dir, "documents")
        .select("lang", "doc_id")
        .withColumn(
            "priority", F.md5(F.concat(F.col("lang"), F.lit(":"), F.col("doc_id").cast("string")))
        )
    )
    w = Window.partitionBy("lang").orderBy("priority", "doc_id")
    return (
        pri.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 5)
        .select("lang", "doc_id", "priority", "rk")
        .transform(pin)
        .orderBy("lang", "rk")
    )


# ---------------------------------------------------------------------------
# X-17: sequence-length bucketing + padding-waste accounting
# ---------------------------------------------------------------------------


@query(
    "q134_seq_length_buckets",
    oracle="""
    WITH tok AS (
        SELECT CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT) AS n_tokens
        FROM documents
    ),
    bucketed AS (
        SELECT n_tokens,
               CASE WHEN n_tokens <= 16 THEN 16
                    WHEN n_tokens <= 32 THEN 32
                    WHEN n_tokens <= 64 THEN 64
                    WHEN n_tokens <= 128 THEN 128
                    WHEN n_tokens <= 256 THEN 256
                    WHEN n_tokens <= 512 THEN 512
                    ELSE 1024 END AS bucket_cap
        FROM tok
    )
    SELECT CAST(bucket_cap AS INT) AS bucket_cap,
           COUNT(*) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS sum_tokens,
           CAST(bucket_cap * COUNT(*) - SUM(n_tokens) AS BIGINT) AS padding_waste,
           ROUND(CAST(bucket_cap * COUNT(*) - SUM(n_tokens) AS DOUBLE)
                 / (bucket_cap * COUNT(*)), 6) AS waste_pct
    FROM bucketed
    GROUP BY bucket_cap
    ORDER BY bucket_cap
    """,
    tags=("X-17", "X-04"),
)
def q134_seq_length_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence-length bucketing: documents grouped into power-of-two token
    buckets with exact padding-waste accounting (pad-to-cap tokens burned
    per bucket, and as a fraction) — the batch-shaping decision data a
    training pipeline needs to pick packing vs padding per length class.

    Scale shape: tokenization and bucket assignment are map-only whitespace
    splits in codegen (same `\\s+` twin as the q47/q121 token family); the
    aggregate shuffles 7 bucket rows. All arithmetic is integer-exact; the
    one double division has bit-identical operands in both engines."""
    tok = load(spark, sf_dir, "documents").select(
        F.size(F.split(F.trim(F.col("text")), r"\s+")).cast("long").alias("n_tokens")
    )
    cap = (
        F.when(F.col("n_tokens") <= 16, 16)
        .when(F.col("n_tokens") <= 32, 32)
        .when(F.col("n_tokens") <= 64, 64)
        .when(F.col("n_tokens") <= 128, 128)
        .when(F.col("n_tokens") <= 256, 256)
        .when(F.col("n_tokens") <= 512, 512)
        .otherwise(1024)
    )
    bucketed = tok.withColumn("bucket_cap", cap)
    waste = F.col("bucket_cap") * F.count(F.lit(1)) - F.sum("n_tokens")
    return (
        bucketed.groupBy("bucket_cap")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("sum_tokens"),
            waste.cast("long").alias("padding_waste"),
            F.round(
                waste.cast("double") / (F.col("bucket_cap") * F.count(F.lit(1))), 6
            ).alias("waste_pct"),
        )
        .transform(pin)
        .orderBy("bucket_cap")
    )


# ---------------------------------------------------------------------------
# X-09: class-balance weights (inverse-frequency, sklearn "balanced" form)
# ---------------------------------------------------------------------------


@query(
    "q135_class_balance_weights",
    oracle="""
    WITH c AS (SELECT label, COUNT(*) AS n FROM embeddings GROUP BY label),
    t AS (SELECT CAST(SUM(n) AS BIGINT) AS total, COUNT(*) AS n_classes FROM c)
    SELECT c.label, CAST(c.n AS BIGINT) AS n_rows,
           ROUND(CAST(c.n AS DOUBLE) / t.total, 6) AS share,
           ROUND(CAST(t.total AS DOUBLE) / (t.n_classes * c.n), 6) AS class_weight
    FROM c, t
    ORDER BY c.label
    """,
    tags=("X-09", "A-02"),
)
def q135_class_balance_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverse-frequency class weights (sklearn's "balanced" heuristic,
    weight = total / (n_classes * n_c)) plus each label's share — the
    imbalance correction computed over the label column before training a
    classifier on skewed data.

    Scale shape: one groupBy on the label key produces the bounded
    per-class relation; the grand total is a second aggregate over those
    FEW rows (not a second scan) broadcast back via a 1-row cross join.
    The weight divisions are double math on bit-identical operands."""
    counts = (
        load(spark, sf_dir, "embeddings").groupBy("label").agg(F.count(F.lit(1)).alias("n"))
    )
    totals = counts.agg(
        F.sum("n").alias("total"), F.count(F.lit(1)).alias("n_classes")
    )
    return (
        counts.crossJoin(F.broadcast(totals))
        .select(
            "label",
            F.col("n").alias("n_rows"),
            F.round(F.col("n").cast("double") / F.col("total"), 6).alias("share"),
            F.round(
                F.col("total").cast("double") / (F.col("n_classes") * F.col("n")), 6
            ).alias("class_weight"),
        )
        .transform(pin)
        .orderBy("label")
    )


# ---------------------------------------------------------------------------
# X-16 / J-11: leakage-safe point-in-time feature join
# ---------------------------------------------------------------------------


@query(
    "q149_point_in_time_join",
    oracle="""
    WITH daily AS (
        SELECT user_id,
               date_trunc('day', ts) + INTERVAL 1 DAY AS eff_ts,
               CAST(SUM(CAST(value AS DECIMAL(28,2))) AS DOUBLE) AS feat_value,
               COUNT(*) AS feat_n
        FROM events GROUP BY user_id, date_trunc('day', ts)
    ),
    labels AS (
        SELECT event_id, user_id, ts, value AS label_value
        FROM events WHERE event_type = 'purchase'
    ),
    j AS (
        SELECT l.event_id, l.user_id, l.ts, l.label_value,
               d.feat_value, d.feat_n,
               ROW_NUMBER() OVER (PARTITION BY l.event_id
                                  ORDER BY d.eff_ts DESC) AS rn
        FROM labels l
        LEFT JOIN daily d ON l.user_id = d.user_id AND d.eff_ts <= l.ts
    )
    SELECT event_id, user_id, ts, label_value, feat_value, feat_n
    FROM j WHERE rn = 1 ORDER BY event_id
    """,
    tags=("X-16", "J-11"),
)
def q149_point_in_time_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-safe point-in-time feature join — the training-set assembly
    step that attaches to every label event the FEATURE SNAPSHOT that was
    actually available when the label happened: per-user daily activity
    features become effective at the NEXT day's midnight (a feature
    computed over day D cannot be known during day D — joining on the same
    day is the classic label-leakage bug), and each purchase label takes
    the latest effective snapshot at or before its timestamp; early labels
    keep NULL features rather than peeking forward.

    Scale shape: executed with the J-11 as-of machinery
    (operators/asof.py) — tagged union of snapshots and labels, ONE
    shuffle on user_id, one in-partition sort, running last(ignorenulls)
    — no per-label range probe and no (label x versions) candidate
    fan-out; the oracle spells the naive interval join + row_number the
    operator replaces."""
    from ..operators.asof import asof_join

    ev = load(spark, sf_dir, "events")
    daily = ev.groupBy(
        "user_id", F.date_trunc("day", F.col("ts")).alias("day")
    ).agg(
        F.sum(F.col("value").cast("decimal(28,2)")).cast("double").alias("feat_value"),
        F.count(F.lit(1)).alias("feat_n"),
    ).select(
        "user_id",
        (F.col("day") + F.expr("INTERVAL 1 DAY")).alias("eff_ts"),
        "feat_value",
        "feat_n",
    )
    labels = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", F.col("value").alias("label_value")
    )
    joined = asof_join(
        labels, daily, key="user_id", left_time="ts", right_time="eff_ts",
        value_cols=["feat_value", "feat_n"],
    )
    return (
        joined.select("event_id", "user_id", "ts", "label_value", "feat_value", "feat_n")
        .transform(pin)
        .orderBy("event_id")
    )


# ---------------------------------------------------------------------------
# X-16 capstone: composed training-set assembly pipeline
# ---------------------------------------------------------------------------

_ASM_MIN_TOKENS = 16  #: quality gate
_ASM_K = 8  #: reservoir size per length bucket


@query(
    "q155_training_assembly",
    oracle=rf"""
    WITH base AS (
        SELECT doc_id, text,
               len(string_split_regex(trim(text), '\s+')) AS n_tokens
        FROM documents
        WHERE text IS NOT NULL
          AND len(string_split_regex(trim(text), '\s+')) >= {_ASM_MIN_TOKENS}
    ),
    dedup AS (
        SELECT doc_id, n_tokens,
               ROW_NUMBER() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
        FROM base
    ),
    train AS (
        SELECT doc_id, n_tokens
        FROM dedup
        WHERE rn = 1 AND substr(md5('split:' || CAST(doc_id AS VARCHAR)), 1, 1) < 'c'
    ),
    bucketed AS (
        SELECT doc_id, n_tokens,
               CASE WHEN n_tokens <= 16 THEN 16
                    WHEN n_tokens <= 32 THEN 32
                    WHEN n_tokens <= 64 THEN 64
                    WHEN n_tokens <= 128 THEN 128
                    ELSE 256 END AS bucket,
               md5('res:' || CAST(doc_id AS VARCHAR)) AS priority
        FROM train
    ),
    ranked AS (
        SELECT bucket, doc_id, n_tokens,
               ROW_NUMBER() OVER (PARTITION BY bucket
                                  ORDER BY priority, doc_id) AS rank
        FROM bucketed
    )
    SELECT bucket, rank, doc_id, n_tokens
    FROM ranked WHERE rank <= {_ASM_K}
    ORDER BY bucket, rank
    """,
    tags=("X-16", "X-01", "X-17"),
)
def q155_training_assembly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Capstone composition — the whole batch-assembly tail of a training
    pipeline as ONE Catalyst plan: quality gate (>=16 tokens) -> exact
    text dedup keep-smallest-id (X-01) -> deterministic 75% hash split
    (X-16, md5 nibble so membership is reproducible across engines and
    backfills) -> power-of-two sequence-length buckets (X-17) ->
    per-bucket Efraimidis-Spirakis reservoir of 8 docs (md5 priorities,
    X-16). Returns each bucket's selected sample with its rank.

    Scale shape: the gate and split are map-only on the scan; dedup is
    one shuffle on the 16-byte text hash; the reservoir is grouped top-k
    (one shuffle on the tiny bucket key, TakeOrdered-style) — Catalyst
    pipelines the whole thing with no intermediate materialization,
    which IS the argument for expressing pipelines declaratively rather
    than as staged jobs."""
    from pyspark.sql.window import Window as W2

    docs = load(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    base = docs.select(
        "doc_id", "text", F.size(F.split(F.trim("text"), r"\s+")).alias("n_tokens")
    ).filter(F.col("n_tokens") >= _ASM_MIN_TOKENS)
    dedup = base.withColumn(
        "rn",
        F.row_number().over(W2.partitionBy(F.md5("text")).orderBy("doc_id")),
    )
    train = dedup.filter(
        (F.col("rn") == 1)
        & (
            F.substring(F.md5(F.concat(F.lit("split:"), F.col("doc_id").cast("string"))), 1, 1)
            < "c"
        )
    ).select("doc_id", "n_tokens")
    bucketed = train.select(
        "doc_id",
        "n_tokens",
        F.when(F.col("n_tokens") <= 16, 16)
        .when(F.col("n_tokens") <= 32, 32)
        .when(F.col("n_tokens") <= 64, 64)
        .when(F.col("n_tokens") <= 128, 128)
        .otherwise(256)
        .alias("bucket"),
        F.md5(F.concat(F.lit("res:"), F.col("doc_id").cast("string"))).alias("priority"),
    )
    ranked = bucketed.withColumn(
        "rank",
        F.row_number().over(W2.partitionBy("bucket").orderBy("priority", "doc_id")),
    )
    return (
        ranked.filter(F.col("rank") <= _ASM_K)
        .select("bucket", "rank", "doc_id", "n_tokens")
        .transform(pin)
        .orderBy("bucket", "rank")
    )


_NEG_BUCKETS = 16  #: hash-bucket count for candidate generation
_NEG_K = 3  #: negatives drawn per anchor


@query(
    "q163_negative_sampling",
    oracle=f"""
    WITH d AS (
        SELECT doc_id,
               instr('0123456789abcdef',
                     substr(md5('ns:' || CAST(doc_id AS VARCHAR)), 1, 1)) - 1
                   AS bucket
        FROM documents
    ),
    cand AS (
        SELECT a.doc_id AS anchor_id, b.doc_id AS neg_id,
               md5('neg:' || CAST(a.doc_id AS VARCHAR) || ':'
                   || CAST(b.doc_id AS VARCHAR)) AS priority
        FROM d a JOIN d b ON a.bucket = b.bucket AND a.doc_id <> b.doc_id
    ),
    ranked AS (
        SELECT anchor_id, neg_id,
               ROW_NUMBER() OVER (
                   PARTITION BY anchor_id ORDER BY priority, neg_id
               ) AS rank
        FROM cand
    )
    SELECT anchor_id, neg_id, CAST(rank AS BIGINT) AS rank
    FROM ranked WHERE rank <= {_NEG_K}
    ORDER BY anchor_id, rank
    """,
    tags=("X-16", "O-05", "J-01"),
)
def q163_negative_sampling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic in-batch negative sampling for contrastive training:
    every document draws K pseudo-random negatives from its md5-derived
    hash bucket, ranked by a per-pair md5 priority — RNG-free, so the
    same corpus always yields the same (anchor, negative) pairs and a
    resumed/backfilled run reproduces its batches exactly. The X-16
    sampling family's PAIR-generating member (q133 samples rows; this
    samples partners).

    Scale shape: candidates come from a self-join CO-PARTITIONED on the
    hash bucket — per-anchor fan-out is the bucket occupancy (~N/B, with
    B scaled so buckets stay batch-sized), never the corpus; selection
    is the O-05 grouped-top-k under a (priority, id) total order, no
    global sort. Only (doc_id, bucket) enters the join — document
    payloads never move."""
    d = (
        load(spark, sf_dir, "documents")
        .select(
            "doc_id",
            (
                F.instr(
                    F.lit("0123456789abcdef"),
                    F.substring(
                        F.md5(F.concat(F.lit("ns:"), F.col("doc_id").cast("string"))),
                        1,
                        1,
                    ),
                )
                - 1
            ).alias("bucket"),
        )
        .transform(stage)  # both sides of the bucket self-join
    )
    a, b = d.alias("a"), d.alias("b")
    cand = a.join(
        b,
        (F.col("a.bucket") == F.col("b.bucket"))
        & (F.col("a.doc_id") != F.col("b.doc_id")),
    ).select(
        F.col("a.doc_id").alias("anchor_id"),
        F.col("b.doc_id").alias("neg_id"),
        F.md5(
            F.concat(
                F.lit("neg:"),
                F.col("a.doc_id").cast("string"),
                F.lit(":"),
                F.col("b.doc_id").cast("string"),
            )
        ).alias("priority"),
    )
    ranked = cand.withColumn(
        "rank",
        F.row_number().over(Window.partitionBy("anchor_id").orderBy("priority", "neg_id")),
    )
    return (
        ranked.filter(F.col("rank") <= _NEG_K)
        .select("anchor_id", "neg_id", F.col("rank").cast("long").alias("rank"))
        .transform(pin)
        .orderBy("anchor_id", "rank")
    )


# ---------------------------------------------------------------------------
# X-38: leakage-safe future-window label generation
# ---------------------------------------------------------------------------

_LABEL_WEEKS = 2  #: label = any purchase within 2 weeks after the obs week


@query(
    "q198_label_windows",
    oracle=f"""
    WITH obs AS (
        SELECT DISTINCT user_id, date_trunc('week', ts) AS wk FROM events
    ),
    labeled AS (
        SELECT DISTINCT user_id,
               date_trunc('week', ts) - INTERVAL (7 * k.k) DAY AS wk
        FROM events
        CROSS JOIN (SELECT unnest(range(1, {_LABEL_WEEKS} + 1)) AS k) k
        WHERE event_type = 'purchase'
    )
    SELECT o.wk AS week_start,
           COUNT(*) AS n_obs,
           CAST(SUM(CASE WHEN l.user_id IS NOT NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_pos,
           ROUND(CAST(SUM(CASE WHEN l.user_id IS NOT NULL THEN 1 ELSE 0 END)
                 AS DOUBLE) / COUNT(*), 6) AS pos_rate
    FROM obs o
    LEFT JOIN labeled l ON l.user_id = o.user_id AND l.wk = o.wk
    GROUP BY o.wk
    ORDER BY o.wk
    """,
    tags=("X-38", "X-16", "J-04"),
)
def q198_label_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-safe FUTURE-WINDOW label generation: every (user, week)
    with any activity is an observation point; its label is 1 iff the
    user makes a purchase inside the label window [week_end,
    week_end + 14d) — strictly AFTER the observation week closes, so a
    model trained on q149-style point-in-time features with these labels
    cannot peek forward. Reported as the per-week observation count,
    positive count and positive rate (the label-prevalence curve whose
    trailing right-censored weeks a q131 temporal split must drop).

    Scale shape: the interval condition "purchase within 14d after week
    w" is rewritten by the BOUNDED EXPLODE reduction (q175 pattern):
    each purchase fans out map-only to EXACTLY the 2 week-points it
    labels (week(t)-7d, week(t)-14d) — fan-out = window width in weeks,
    never a time-range join; both sides reduce by DISTINCT on the same
    (user, wk) key, the label join is co-partitioned on that key, and
    the readout rolls up onto the bounded week spine."""
    ev = load(spark, sf_dir, "events")
    wk = F.date_trunc("week", F.col("ts"))
    obs = ev.select("user_id", wk.alias("wk")).distinct()
    labeled = (
        ev.filter(F.col("event_type") == "purchase")
        .select(
            "user_id",
            F.explode(
                F.array(
                    *[
                        wk - F.expr(f"INTERVAL {7 * k} DAYS")
                        for k in range(1, _LABEL_WEEKS + 1)
                    ]
                )
            ).alias("wk"),
        )
        .distinct()
        .withColumn("lab", F.lit(1))
    )
    return (
        obs.join(labeled, ["user_id", "wk"], "left_outer")
        .groupBy(F.col("wk").alias("week_start"))
        .agg(
            F.count(F.lit(1)).alias("n_obs"),
            F.sum(F.coalesce(F.col("lab"), F.lit(0))).cast("long").alias("n_pos"),
            F.round(
                F.sum(F.coalesce(F.col("lab"), F.lit(0))).cast("double")
                / F.count(F.lit(1)),
                6,
            ).alias("pos_rate"),
        )
        .orderBy("week_start")
    )


# ---------------------------------------------------------------------------
# X-41: token-budget corpus selection (quality-ranked greedy prefix)
# ---------------------------------------------------------------------------

_BUDGET_PCT = 50  #: select the best docs until 50% of corpus tokens are spent
_QM_BUCKET = 10_000  #: prefix-sum bucket = 0.01 of quality (quality in 1e-6 units)


def _budget_oracle() -> str:
    from ..operators import text_analysis as ta

    return f"""
    WITH d AS (
        SELECT doc_id, source,
               CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT) AS tok,
               CAST(ROUND({ta.oracle_quality_score("text")} * 1000000) AS BIGINT) AS qm
        FROM documents
    ),
    tot AS (SELECT CAST(SUM(tok) AS BIGINT) AS t FROM d),
    cum AS (
        SELECT doc_id, source, tok, qm,
               CAST(COALESCE(SUM(tok) OVER (
                   ORDER BY qm DESC, doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
               ), 0) AS BIGINT) AS tok_before
        FROM d
    ),
    sel AS (
        SELECT cum.*,
               CASE WHEN tok_before < (t * {_BUDGET_PCT}) // 100 THEN 1 ELSE 0 END AS s
        FROM cum CROSS JOIN tot
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(s) AS BIGINT) AS n_selected,
           CAST(SUM(tok) AS BIGINT) AS tokens,
           CAST(SUM(tok * s) AS BIGINT) AS tokens_selected,
           ROUND(CAST(SUM(tok * s) AS DOUBLE) / SUM(tok), 6) AS selected_share
    FROM sel GROUP BY source ORDER BY source
    """


@query("q201_token_budget_selection", oracle=_budget_oracle(), tags=("X-41", "X-04"))
def q201_token_budget_selection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-ranked token-budget selection: sort the corpus by the X-04
    quality score (ties by doc_id) and keep the greedy prefix whose
    cumulative token count stays under a budget (50% of corpus tokens) —
    the data-selection step between scoring and training when compute,
    not data, is the binding constraint ("train on the best half").
    Reports the per-source keep rate, which is how selection bias across
    sources is audited before the X-16 mixing plan rebalances them.

    Scale shape: scoring and tokenizing are map-only codegen; the
    corpus-order prefix sum NEVER global-sorts the documents — quality
    quantizes to 1e-6 integers and buckets at 0.01 width, within-bucket
    windows run per bucket and the <=101-row bucket-total relation
    broadcasts its running offsets back (the q84/q148/q174 two-level
    prefix sum, descending); the budget is one broadcast scalar and the
    keep decision is an exact integer compare. The final rollup is
    map-side combined onto the bounded source relation."""
    from ..operators import text_analysis as ta

    d = load(spark, sf_dir, "documents").select(
        "doc_id",
        "source",
        ta.whitespace_token_count(F.col("text")).cast("long").alias("tok"),
        (ta.quality_score(F.col("text")) * 1_000_000)
        .cast("decimal(18,0)")
        .cast("long")
        .alias("qm"),
    )
    d = d.withColumn("qb", F.expr(f"qm DIV {_QM_BUCKET}")).transform(stage)
    within = d.withColumn(
        "wb",
        F.coalesce(
            F.sum("tok").over(
                Window.partitionBy("qb")
                .orderBy(F.desc("qm"), F.asc("doc_id"))
                .rowsBetween(Window.unboundedPreceding, -1)
            ),
            F.lit(0),
        ).cast("long"),
    )
    btot = d.groupBy("qb").agg(F.sum("tok").cast("long").alias("bt"))
    offs = btot.select(
        "qb",
        F.coalesce(
            F.sum("bt").over(
                Window.orderBy(F.desc("qb")).rowsBetween(Window.unboundedPreceding, -1)
            ),
            F.lit(0),
        ).cast("long").alias("off"),
    )
    tot = d.agg(F.sum("tok").cast("long").alias("t"))
    sel = (
        within.join(F.broadcast(offs), "qb")
        .crossJoin(F.broadcast(tot))
        .select(
            "source",
            "tok",
            F.when(
                F.col("wb") + F.col("off") < F.expr(f"(t * {_BUDGET_PCT}) DIV 100"),
                F.lit(1),
            )
            .otherwise(0)
            .alias("s"),
        )
    )
    return (
        sel.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("s").cast("long").alias("n_selected"),
            F.sum("tok").cast("long").alias("tokens"),
            F.sum(F.col("tok") * F.col("s")).cast("long").alias("tokens_selected"),
            F.round(
                F.sum(F.col("tok") * F.col("s")).cast("double") / F.sum("tok"),
                6,
            ).alias("selected_share"),
        )
        .transform(pin)
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# X-16 (cont.): WEIGHTED deterministic reservoir (A-ExpJ with hash RNG)
# ---------------------------------------------------------------------------

_WRES_K = 5
_H48 = 1 << 48  #: 48-bit hash domain — (h+1)/2^48 is exact in a double


@query(
    "q213_weighted_reservoir",
    oracle=f"""
    WITH d AS (
        SELECT source, doc_id,
               GREATEST(CAST(len(string_split_regex(trim(text), '\\s+'))
                             AS BIGINT), 1) AS w,
               CAST(('0x' || substr(md5('wres:' || CAST(doc_id AS VARCHAR)), 1, 15))
                    AS BIGINT) % {_H48} AS h48
        FROM documents
    ),
    keyed AS (
        SELECT source, doc_id, w,
               ROUND(ln((CAST(h48 AS DOUBLE) + 1) / {_H48}), 9) / w AS wkey
        FROM d
    )
    SELECT source, CAST(rk AS INT) AS rk, doc_id, w AS tokens
    FROM (
        SELECT source, doc_id, w, wkey,
               ROW_NUMBER() OVER (
                   PARTITION BY source ORDER BY wkey DESC, doc_id
               ) AS rk
        FROM keyed
    )
    WHERE rk <= {_WRES_K}
    ORDER BY source, rk
    """,
    tags=("X-16", "O-05"),
)
def q213_weighted_reservoir(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WEIGHTED deterministic reservoir sample: k=5 docs per source drawn
    with probability proportional to token count — Efraimidis-Spirakis
    A-ExpJ (key = u^(1/w), compared as ln(u)/w) with the RNG replaced by
    a 48-bit content hash, so heavy documents are favored exactly as the
    algorithm prescribes yet every run, engine, and incremental backfill
    picks the same sample. The weighted complement of q133's uniform
    reservoir — the sampler a token-budgeted eval-set draw actually
    wants (sampling documents uniformly UNDER-represents long ones in
    token space).

    Determinism: u = (h48+1)/2^48 is a ratio of exact integers (both
    representable in a double), ln rounds at 9 dp (the q120 cross-libm
    precedent), the /w divides that bit-identical operand by an exact
    integer, and doc_id breaks any residual tie.

    Scale shape: hashing/keying is map-only; selection is grouped top-k
    on the source key (one shuffle); because max-k-by-key is a mergeable
    aggregate, at 100 TB the same query runs as per-partition partial
    reservoirs merged at the final agg — only k rows per key cross."""
    from ..operators.dedup import hash64

    d = load(spark, sf_dir, "documents").select(
        "source",
        "doc_id",
        F.greatest(
            F.size(F.split(F.trim(F.col("text")), r"\s+")).cast("long"), F.lit(1)
        ).alias("w"),
        (hash64("wres", F.col("doc_id").cast("string")) % _H48).alias("h48"),
    )
    keyed = d.select(
        "source",
        "doc_id",
        "w",
        (
            F.round(F.log((F.col("h48").cast("double") + 1) / _H48), 9) / F.col("w")
        ).alias("wkey"),
    )
    wnd = Window.partitionBy("source").orderBy(F.desc("wkey"), "doc_id")
    return (
        keyed.withColumn("rk", F.row_number().over(wnd))
        .filter(F.col("rk") <= _WRES_K)
        .select("source", F.col("rk").cast("int").alias("rk"), "doc_id", F.col("w").alias("tokens"))
        .transform(pin)
        .orderBy("source", "rk")
    )


# ---------------------------------------------------------------------------
# X-80: cold-start coverage audit (unseen-entity exposure across a split)
# ---------------------------------------------------------------------------

_CS_CUT = "2000-01-01"  #: train < cut <= test on the shipping/order calendar


def _cs_leg(entity: str, key_sql: str, rel_sql: str, rev_sql: str) -> str:
    return f"""
        SELECT '{entity}' AS entity,
               CAST(COUNT(DISTINCT CASE WHEN NOT seen THEN k END) AS BIGINT)
                   AS n_unseen,
               CAST(COUNT(DISTINCT k) AS BIGINT) AS n_test,
               CAST(SUM(CASE WHEN NOT seen THEN cents ELSE 0 END) AS BIGINT)
                   AS unseen_cents,
               CAST(SUM(cents) AS BIGINT) AS test_cents
        FROM (
            SELECT t.k, t.cents,
                   t.k IN (SELECT {key_sql} FROM {rel_sql}
                           WHERE dt < TIMESTAMP '{_CS_CUT}') AS seen
            FROM (SELECT {key_sql} AS k, {rev_sql} AS cents, dt
                  FROM {rel_sql}) t
            WHERE t.dt >= TIMESTAMP '{_CS_CUT}'
        )
    """


_CS_ORACLE = f"""
    WITH li AS (
        SELECT l_partkey, l_suppkey, p_brand, l_shipdate AS dt,
               CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT) AS cents
        FROM lineitem JOIN part ON l_partkey = p_partkey
    ),
    ord AS (
        SELECT o_custkey, o_orderdate AS dt,
               CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
        FROM orders
    ),
    legs AS (
        {_cs_leg("brand", "p_brand", "li", "cents")}
        UNION ALL
        {_cs_leg("customer", "o_custkey", "ord", "cents")}
        UNION ALL
        {_cs_leg("part", "l_partkey", "li", "cents")}
        UNION ALL
        {_cs_leg("supplier", "l_suppkey", "li", "cents")}
    )
    SELECT entity, n_test, n_unseen,
           ROUND(CAST(n_unseen AS DOUBLE) / n_test, 6) AS unseen_entity_share,
           ROUND(CAST(unseen_cents AS DOUBLE) / test_cents, 6)
               AS unseen_revenue_share
    FROM legs ORDER BY entity
"""


@query("q280_cold_start_coverage", oracle=_CS_ORACLE, tags=("X-80", "X-16", "J-06"))
def q280_cold_start_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cold-start coverage audit across the temporal split: for each
    entity class (part, supplier, brand, customer), how many TEST-period
    entities never appear in train, and what share of test revenue they
    carry — the recommender/forecaster pre-flight that says how much of
    the evaluation a model with no history for an entity cannot
    personalize (q131 audits user leakage INTO test; this audits the
    opposite gap, entities missing FROM train).

    Determinism: all counts and cents are exact integers; the two shares
    are single IEEE divisions rounded 6 dp.

    Scale shape: per entity class, the fact reduces to (key, cents,
    side) and the seen-set semi-join keys on the entity id — train keys
    distinct-reduce BEFORE the join (dimension-scale build side), the
    anti/semi distinction rides one boolean, and each class emits one
    row from a map-side-combined aggregate; the part dim joins
    broadcast."""
    li = (
        load(spark, sf_dir, "lineitem")
        .join(
            F.broadcast(
                load(spark, sf_dir, "part").select("p_partkey", "p_brand")
            ),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .select(
            "l_partkey",
            "l_suppkey",
            "p_brand",
            F.col("l_shipdate").alias("dt"),
            F.floor(F.col("l_extendedprice") * 100 + 0.5).cast("long").alias("cents"),
        )
        .transform(stage)  # three entity legs read it
    )
    ord_ = load(spark, sf_dir, "orders").select(
        "o_custkey",
        F.col("o_orderdate").alias("dt"),
        F.floor(F.col("o_totalprice") * 100 + 0.5).cast("long").alias("cents"),
    )
    cut = F.lit(_CS_CUT).cast("timestamp")

    def leg(entity: str, rel: DataFrame, key: str) -> DataFrame:
        train_keys = (
            rel.filter(F.col("dt") < cut).select(F.col(key).alias("tk")).distinct()
        )
        test = rel.filter(F.col("dt") >= cut).select(
            F.col(key).alias("k"), "cents"
        )
        flagged = test.join(
            train_keys.withColumn("seen", F.lit(True)),
            test.k == F.col("tk"),
            "left",
        ).select("k", "cents", F.coalesce(F.col("seen"), F.lit(False)).alias("seen"))
        return flagged.agg(
            F.lit(entity).alias("entity"),
            F.count_distinct("k").cast("long").alias("n_test"),
            F.count_distinct(F.when(~F.col("seen"), F.col("k")))
            .cast("long")
            .alias("n_unseen"),
            F.sum(F.when(~F.col("seen"), F.col("cents")).otherwise(0))
            .cast("long")
            .alias("unseen_cents"),
            F.sum("cents").cast("long").alias("test_cents"),
        )
    legs = (
        leg("brand", li, "p_brand")
        .unionByName(leg("customer", ord_, "o_custkey"))
        .unionByName(leg("part", li, "l_partkey"))
        .unionByName(leg("supplier", li, "l_suppkey"))
    )
    return (
        legs.select(
            "entity",
            "n_test",
            "n_unseen",
            F.round(F.col("n_unseen").cast("double") / F.col("n_test"), 6).alias(
                "unseen_entity_share"
            ),
            F.round(
                F.col("unseen_cents").cast("double") / F.col("test_cents"), 6
            ).alias("unseen_revenue_share"),
        )
        .transform(pin)
        .orderBy("entity")
    )


# ---------------------------------------------------------------------------
# X-82: out-of-fold target encoding (leakage-free categorical features)
# ---------------------------------------------------------------------------

_TE_FOLDS = 5
_TE_SMOOTH = 20  #: Bayesian smoothing pseudo-count toward the global prior

#: fold = md5 nibble of the order key mod _TE_FOLDS — rows of one order
#: stay in one fold (the grouped-split discipline of X-16)
_TE_FOLD_SQL = (
    "instr('0123456789abcdef', "
    "substr(md5(CAST(l_orderkey AS {t})), 1, 1)) - 1"
)

_TE_ORACLE = f"""
    WITH rows_f AS (
        SELECT p_brand AS brand,
               ({_TE_FOLD_SQL.format(t="VARCHAR")}) % {_TE_FOLDS} AS fold,
               CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT) AS cents
        FROM lineitem JOIN part ON l_partkey = p_partkey
    ),
    bf AS (
        SELECT brand, fold, CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(cents) AS BIGINT) AS s
        FROM rows_f GROUP BY 1, 2
    ),
    btot AS (SELECT brand, CAST(SUM(n) AS BIGINT) AS bn,
                    CAST(SUM(s) AS BIGINT) AS bs
             FROM bf GROUP BY 1),
    gf AS (SELECT fold, CAST(SUM(n) AS BIGINT) AS gn,
                  CAST(SUM(s) AS BIGINT) AS gs
           FROM bf GROUP BY 1),
    gtot AS (SELECT CAST(SUM(n) AS BIGINT) AS tn,
                    CAST(SUM(s) AS BIGINT) AS ts
             FROM bf)
    SELECT bf.brand, CAST(bf.fold AS BIGINT) AS fold,
           bf.n AS n_in_fold,
           btot.bn - bf.n AS n_loo,
           ROUND(CAST(gtot.ts - gf.gs AS DOUBLE) / (gtot.tn - gf.gn) / 100, 6)
               AS prior_loo,
           ROUND((CAST(btot.bs - bf.s AS DOUBLE)
                  + {_TE_SMOOTH} * (CAST(gtot.ts - gf.gs AS DOUBLE)
                                    / (gtot.tn - gf.gn)))
                 / (btot.bn - bf.n + {_TE_SMOOTH}) / 100, 6) AS encoding
    FROM bf
    JOIN btot USING (brand)
    JOIN gf USING (fold)
    CROSS JOIN gtot
    ORDER BY brand, fold
"""


@query("q285_oof_target_encoding", oracle=_TE_ORACLE, tags=("X-82", "X-16", "A-14"))
def q285_oof_target_encoding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Out-of-fold target encoding of brand -> mean revenue: for each
    (brand, fold), the encoding a row in that fold may see is the
    smoothed mean computed from the OTHER {_TE_FOLDS - 1} folds —
    (brand_loo_sum + m*prior_loo) / (brand_loo_n + m), prior = the
    leave-fold-out GLOBAL mean, m = {_TE_SMOOTH} — the leakage-free
    categorical encoder every tabular-ML pipeline ships (naive target
    encoding leaks the row's own label; OOF is the fix), with folds
    keyed by md5 of the ORDER so an order's lineitems never straddle
    folds (the X-16 grouped-split discipline).

    Determinism: fold assignment is a pure md5 function; all partial
    counts/sums are exact integers, every leave-fold-out value is
    total-minus-fold on exact integers, and each encoding is IEEE on
    bit-identical operands rounded 6 dp.

    Scale shape: the A-14 mergeable-partials payoff — ONE fact rollup
    to the bounded (brand x fold) partial relation; brand totals, fold
    totals, and the grand total all DERIVE from those partials (never a
    second fact scan, never a per-fold rescan), and every join runs on
    the bounded relation."""
    rows_f = (
        load(spark, sf_dir, "lineitem")
        .join(
            F.broadcast(load(spark, sf_dir, "part").select("p_partkey", "p_brand")),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .select(
            F.col("p_brand").alias("brand"),
            (F.expr(_TE_FOLD_SQL.format(t="STRING")) % _TE_FOLDS).alias("fold"),
            F.floor(F.col("l_extendedprice") * 100 + 0.5).cast("long").alias("cents"),
        )
    )
    bf = (
        rows_f.groupBy("brand", "fold")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("cents").cast("long").alias("s"),
        )
        .transform(stage)  # brand/fold/grand totals all derive from it
    )
    btot = bf.groupBy("brand").agg(
        F.sum("n").cast("long").alias("bn"), F.sum("s").cast("long").alias("bs")
    )
    gf = bf.groupBy("fold").agg(
        F.sum("n").cast("long").alias("gn"), F.sum("s").cast("long").alias("gs")
    )
    gtot = bf.agg(
        F.sum("n").cast("long").alias("tn"), F.sum("s").cast("long").alias("ts")
    )
    prior = (F.col("ts") - F.col("gs")).cast("double") / (F.col("tn") - F.col("gn"))
    enc = (
        ((F.col("bs") - F.col("s")).cast("double") + _TE_SMOOTH * prior)
        / (F.col("bn") - F.col("n") + _TE_SMOOTH)
        / 100
    )
    return (
        bf.join(F.broadcast(btot), "brand")
        .join(F.broadcast(gf), "fold")
        .crossJoin(F.broadcast(gtot))
        .select(
            "brand",
            F.col("fold").cast("long").alias("fold"),
            F.col("n").alias("n_in_fold"),
            (F.col("bn") - F.col("n")).alias("n_loo"),
            F.round(prior / 100, 6).alias("prior_loo"),
            F.round(enc, 6).alias("encoding"),
        )
        .transform(pin)
        .orderBy("brand", "fold")
    )


# ---------------------------------------------------------------------------
# X-16 (cont.): stratified k-fold assignment with exact balance
# ---------------------------------------------------------------------------

_SKF_FOLDS = 5

_SKF_ORACLE = f"""
    WITH ranked AS (
        SELECT o_orderpriority AS class,
               CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS cents,
               ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                                  ORDER BY md5(CAST(o_orderkey AS VARCHAR)),
                                           o_orderkey) AS rk
        FROM orders
    )
    SELECT class, CAST((rk - 1) % {_SKF_FOLDS} AS BIGINT) AS fold,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(cents) AS BIGINT) AS sum_cents
    FROM ranked GROUP BY 1, 2 ORDER BY class, fold
"""


@query("q290_stratified_kfold", oracle=_SKF_ORACLE, tags=("X-16", "W-01"))
def q290_stratified_kfold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified {_SKF_FOLDS}-fold assignment with EXACT per-class
    balance: within each order-priority class, orders rank under the
    (md5, key) total order and fold = (rank-1) mod {_SKF_FOLDS}, so
    every class's fold sizes differ by at most one — the property
    plain hash-mod folds (q132) only achieve in expectation, and the
    assignment every stratified cross-validation needs.

    Determinism: ranks are exact integers under a pure-function total
    order; counts and cents are exact integers — no float anywhere.

    Scale shape: the within-class rank NEVER runs as one window per
    class (a single reducer per class at 100 TB): the md5-PREFIX bucket
    (256 values) splits each class, within-(class, bucket) windows rank
    locally, per-bucket counts roll up to a bounded (class x 256)
    offset relation whose prefix sums BROADCAST back — the q174/q84
    two-level prefix-rank idiom, proven rank-identical to the oracle's
    flat window because the bucket is a prefix of the sort key."""
    h = F.md5(F.col("o_orderkey").cast("string"))
    rows = load(spark, sf_dir, "orders").select(
        F.col("o_orderpriority").alias("class"),
        F.floor(F.col("o_totalprice") * 100 + 0.5).cast("long").alias("cents"),
        h.alias("h"),
        (F.substring(h, 1, 2)).alias("bucket"),
        "o_orderkey",
    )
    w_in = (
        Window.partitionBy("class", "bucket").orderBy("h", "o_orderkey")
    )
    within = rows.select(
        "class",
        "bucket",
        "cents",
        F.row_number().over(w_in).cast("long").alias("wrk"),
    ).transform(stage)  # bucket totals + the fold readout both read it
    btot = within.groupBy("class", "bucket").agg(
        F.count(F.lit(1)).cast("long").alias("bc")
    )
    offs = btot.select(
        "class",
        "bucket",
        F.coalesce(
            F.sum("bc").over(
                Window.partitionBy("class")
                .orderBy("bucket")
                .rowsBetween(Window.unboundedPreceding, -1)
            ),
            F.lit(0),
        )
        .cast("long")
        .alias("off"),
    )
    return (
        within.join(F.broadcast(offs), ["class", "bucket"])
        .select(
            "class",
            "cents",
            ((F.col("off") + F.col("wrk") - 1) % _SKF_FOLDS).alias("fold"),
        )
        .groupBy("class", F.col("fold").cast("long").alias("fold"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            F.sum("cents").cast("long").alias("sum_cents"),
        )
        .transform(pin)
        .orderBy("class", "fold")
    )


# ---------------------------------------------------------------------------
# X-16 (cont.): balanced class downsampling to the minority-class count
# ---------------------------------------------------------------------------


@query(
    "q344_class_downsample",
    oracle="""
    WITH counts AS (
        SELECT label, CAST(COUNT(*) AS BIGINT) AS n FROM embeddings GROUP BY label
    ),
    floor_n AS (SELECT MIN(n) AS min_n FROM counts),
    ranked AS (
        SELECT vec_id, label,
               ROW_NUMBER() OVER (
                   PARTITION BY label
                   ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id
               ) AS rk
        FROM embeddings
    )
    SELECT r.label,
           c.n AS n_before,
           CAST(COUNT(*) AS BIGINT) AS n_after,
           CAST(MIN(r.vec_id) AS BIGINT) AS min_kept_id,
           CAST(MAX(r.vec_id) AS BIGINT) AS max_kept_id
    FROM ranked r
    CROSS JOIN floor_n f
    JOIN counts c ON c.label = r.label
    WHERE r.rk <= f.min_n
    GROUP BY r.label, c.n
    ORDER BY r.label
    """,
    tags=("X-16", "O-05"),
)
def q344_class_downsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Balanced class downsampling: every class cut to the minority
    class's count by keeping each class's lowest-md5-priority members —
    the deterministic version of 'downsample the majority classes', the
    step a classification training set takes when q135's class weights
    aren't enough (weights rebalance the loss; downsampling rebalances
    the GRADIENT BATCHES and the storage bill). Selection by content
    hash (the q133 Efraimidis-Spirakis discipline) makes the kept set
    reproducible across engines, runs, and incremental backfills.

    Determinism: the minority count is an exact integer MIN; per-class
    ranking orders by (md5, vec_id) — total order, no RNG anywhere.

    Scale shape: class counts are ONE map-side-combined rollup onto the
    bounded label relation; the floor broadcasts as a single row; the
    keep-set is per-class top-k by priority — WindowGroupLimit partial
    top-k per partition here, and at 100 TB the same selection runs as
    the q13 mergeable grouped-top-k with only min_n rows per class
    crossing the wire. The verification rollup lands on |labels| rows.

    Reference parity: beyond-reference; completes X-16's sampling kit
    (q131 temporal, q132 hash split, q133 per-key reservoir, q213
    weighted, q290 stratified k-fold, q332 Neyman, q333 PPS) with the
    class-balance case."""
    emb = load(spark, sf_dir, "embeddings").select("vec_id", "label")
    counts = emb.groupBy("label").agg(F.count(F.lit(1)).cast("long").alias("n"))
    floor_n = counts.agg(F.min("n").alias("min_n"))
    ranked = emb.withColumn(
        "rk",
        F.row_number().over(
            Window.partitionBy("label").orderBy(
                F.md5(F.col("vec_id").cast("string")), "vec_id"
            )
        ),
    )
    kept = ranked.join(F.broadcast(floor_n)).filter(F.col("rk") <= F.col("min_n"))
    return (
        kept.groupBy("label")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_after"),
            F.min("vec_id").cast("long").alias("min_kept_id"),
            F.max("vec_id").cast("long").alias("max_kept_id"),
        )
        .join(F.broadcast(counts), "label")
        .select(
            "label",
            F.col("n").alias("n_before"),
            "n_after",
            "min_kept_id",
            "max_kept_id",
        )
        .transform(pin)
        .orderBy("label")
    )


# ---------------------------------------------------------------------------
# X-16 (cont.): coherent cross-table sampling with closure audit
# ---------------------------------------------------------------------------

#: keep a customer iff their id's md5 starts with nibble 0-2 (~3/16 sample)
_COHERENT_PRED = (
    "instr('0123456789abcdef', substr(md5(CAST({key} AS {t})), 1, 1)) <= 3"
)


@query(
    "q359_coherent_sample",
    oracle=f"""
    WITH sc AS (
        SELECT c_custkey FROM customer
        WHERE {_COHERENT_PRED.format(key="c_custkey", t="VARCHAR")}
    ),
    so AS (
        SELECT o_orderkey, o_custkey FROM orders
        WHERE {_COHERENT_PRED.format(key="o_custkey", t="VARCHAR")}
    ),
    sl AS (
        SELECT l.l_orderkey FROM lineitem l JOIN so ON so.o_orderkey = l.l_orderkey
    )
    SELECT 'customer' AS table_name,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM sc) AS n_sampled,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM customer) AS n_total,
           CAST(0 AS BIGINT) AS n_orphans
    UNION ALL
    SELECT 'orders',
           (SELECT CAST(COUNT(*) AS BIGINT) FROM so),
           (SELECT CAST(COUNT(*) AS BIGINT) FROM orders),
           (SELECT CAST(COUNT(*) AS BIGINT) FROM so
            WHERE o_custkey NOT IN (SELECT c_custkey FROM sc))
    UNION ALL
    SELECT 'lineitem',
           (SELECT CAST(COUNT(*) AS BIGINT) FROM sl),
           (SELECT CAST(COUNT(*) AS BIGINT) FROM lineitem),
           CAST(0 AS BIGINT)
    ORDER BY table_name
    """,
    tags=("X-16", "X-24"),
)
def q359_coherent_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Coherent cross-table sampling: a ~3/16 customer sample taken by
    the SAME hash predicate on the SAME entity key in every table
    (customers by c_custkey, orders by o_custkey; lineitem follows its
    order), so the sampled star is a self-consistent mini-warehouse —
    the staging-environment / integration-test dataset recipe, where
    independent per-table sampling would orphan nearly every FK. The
    closure AUDIT rides along: orphaned sampled orders (customer absent
    from the sample) must be zero BY CONSTRUCTION of the shared
    predicate, and the query proves it (a nonzero orphan count means
    someone sampled a table by the wrong key).

    Determinism: the predicate is a pure function of md5(entity id)
    (X-16 discipline); counts exact.

    Scale shape: the customer/orders predicates are map-only and push to
    their scans; lineitem inherits membership through ONE orderkey-keyed
    semi-style join (at 100 TB: co-partitioned bucket join on the
    orderkey); the closure probe runs on the two sampled key sets. No
    global state, no driver set — the sample is reproducible shard by
    shard.

    Reference parity: beyond-reference; extends X-16 (q132 hash split)
    across table boundaries with the FK-closure guarantee made
    checkable."""
    pred_c = _COHERENT_PRED.format(key="c_custkey", t="string")
    pred_o = _COHERENT_PRED.format(key="o_custkey", t="string")
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    sc = cust.filter(F.expr(pred_c)).select("c_custkey").transform(stage)
    so = orders.filter(F.expr(pred_o)).select("o_orderkey", "o_custkey").transform(
        stage
    )
    sl = li.select("l_orderkey").join(
        so.select("o_orderkey"), F.col("l_orderkey") == F.col("o_orderkey"), "left_semi"
    )
    orphans = so.join(
        sc, so.o_custkey == sc.c_custkey, "left_anti"
    ).agg(F.count(F.lit(1)).cast("long").alias("n"))

    def leg(name, sampled_cnt, total_df, orphan_col):
        return sampled_cnt.join(F.broadcast(total_df)).join(
            F.broadcast(orphan_col)
        ).select(
            F.lit(name).alias("table_name"),
            F.col("ns").alias("n_sampled"),
            F.col("nt").alias("n_total"),
            F.col("no").alias("n_orphans"),
        )

    zero = sc.limit(0).agg(F.count(F.lit(1)).cast("long").alias("no")).select(
        F.lit(0).cast("long").alias("no")
    )
    legs = [
        leg(
            "customer",
            sc.agg(F.count(F.lit(1)).cast("long").alias("ns")),
            cust.agg(F.count(F.lit(1)).cast("long").alias("nt")),
            zero,
        ),
        leg(
            "orders",
            so.agg(F.count(F.lit(1)).cast("long").alias("ns")),
            orders.agg(F.count(F.lit(1)).cast("long").alias("nt")),
            orphans.select(F.col("n").alias("no")),
        ),
        leg(
            "lineitem",
            sl.agg(F.count(F.lit(1)).cast("long").alias("ns")),
            li.agg(F.count(F.lit(1)).cast("long").alias("nt")),
            zero,
        ),
    ]
    out = legs[0]
    for l in legs[1:]:
        out = out.unionByName(l)
    return out.transform(pin).orderBy("table_name")
