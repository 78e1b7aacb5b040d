"""Feature-engineering query surface (SURVEY.md §2K extensions, W-04 /
X-09 / X-10): the operations a training-data pipeline runs between raw
tables and model-ready features — time-windowed rolling features, per-group
normalization, histograms and equi-depth binning, embedding quantization,
BM25 relevance scoring, and SCD-2 dimension upserts.

Everything is deterministic end-to-end: double SUMs go through the
decimal-exact helpers (functions/deterministic.py), per-row IEEE double math
is identical operand-for-operand in Spark and DuckDB, and every query ends
in a pinned total-order sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.ordering import pin
from ..tables import load
from .registry import query

# ---------------------------------------------------------------------------
# W-04: time-range window frames (RANGE BETWEEN INTERVAL ... PRECEDING)
# ---------------------------------------------------------------------------


@query(
    "q100_time_range_window",
    oracle="""
    SELECT event_id, user_id, ts,
           CAST(SUM(CAST(value AS DECIMAL(28,2))) OVER w AS DOUBLE) AS rolling_sum_1h,
           COUNT(*) OVER w AS rolling_cnt_1h
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
                 RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
    ORDER BY event_id
    """,
    tags=("W-04", "W-03"),
)
def q100_time_range_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user rolling 1-hour sum/count — the time-range window frame
    (RANGE on event time, not ROWS) behind "activity in the last hour"
    features. The frame is keyed on epoch-µs so both engines bound it
    identically; peers (equal timestamps) share a frame by definition, so
    no tie-break is needed. The sum is decimal-exact (frame order is
    engine-dependent).

    Scale shape: one shuffle on user_id, then a per-partition sort —
    identical cost to any per-user window; no self-join, no range join.
    At 100 TB this is THE shape for temporal features: the alternative
    events-x-events interval self-join is quadratic per user."""
    ev = load(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros("ts"))
        .rangeBetween(-3_600_000_000, 0)
    )
    return (
        ev.select(
            "event_id",
            "user_id",
            "ts",
            F.sum(F.col("value").cast("decimal(28,2)"))
            .over(w)
            .cast("double")
            .alias("rolling_sum_1h"),
            F.count(F.lit(1)).over(w).alias("rolling_cnt_1h"),
        )
        .transform(pin)
        .orderBy("event_id")
    )


# ---------------------------------------------------------------------------
# X-09: per-group normalization (z-score)
# ---------------------------------------------------------------------------


@query(
    "q101_group_zscore",
    oracle="""
    WITH s AS (
        SELECT event_type, COUNT(*) AS n,
               CAST(SUM(CAST(value AS DECIMAL(14,2))) AS DOUBLE) AS s1,
               CAST(SUM(CAST(value AS DECIMAL(14,2)) * CAST(value AS DECIMAL(14,2))) AS DOUBLE) AS s2
        FROM events GROUP BY event_type
    )
    SELECT e.event_id, e.event_type, e.value,
           ROUND((e.value - s.s1 / s.n)
                 / sqrt(s.s2 / s.n - (s.s1 / s.n) * (s.s1 / s.n)), 6) AS zscore
    FROM events e JOIN s USING (event_type)
    ORDER BY e.event_id
    """,
    tags=("X-09", "A-08"),
)
def q101_group_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group z-score normalization — the standard feature-scaling step.
    Group mean/variance come from exact decimal SUM and SUM-of-squares
    (value is 2-dp, its square 4-dp, both exactly representable in
    decimal(29,4)); the final (x - mean)/std runs in IEEE double with
    bit-identical operands in both engines.

    Scale shape: stats are a 5-row aggregate that BROADCASTS back onto the
    events scan — the normalization itself is map-only, no second shuffle
    of the fact table. Same stats-then-broadcast shape as q88's heavy
    hitters."""
    ev = load(spark, sf_dir, "events")
    d = F.col("value").cast("decimal(14,2)")
    stats = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(d).cast("double").alias("s1"),
        F.sum(d * d).cast("double").alias("s2"),
    )
    mean = F.col("s1") / F.col("n")
    var = F.col("s2") / F.col("n") - mean * mean
    return (
        ev.join(F.broadcast(stats), "event_type")
        .select(
            "event_id",
            "event_type",
            "value",
            F.round((F.col("value") - mean) / F.sqrt(var), 6).alias("zscore"),
        )
        .transform(pin)
        .orderBy("event_id")
    )


# ---------------------------------------------------------------------------
# X-09: fixed-width histogram
# ---------------------------------------------------------------------------


@query(
    "q102_histogram",
    oracle="""
    SELECT event_type,
           CAST(FLOOR(value / 10) AS INT) AS bucket,
           COUNT(*) AS n,
           MIN(value) AS lo,
           MAX(value) AS hi
    FROM events
    GROUP BY event_type, bucket
    ORDER BY event_type, bucket
    """,
    tags=("X-09", "A-01"),
)
def q102_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram (bucket = floor(value/10)) per event type — the
    distribution profile run before choosing normalization/clipping for a
    feature. MIN/MAX of doubles are order-independent, counts are exact;
    nothing needs the decimal detour.

    Scale shape: single partial+final hash aggregate on a ~170-key space —
    map-side combine collapses each partition to the bucket count before
    the shuffle, so shuffle volume is O(buckets), not O(rows)."""
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy(
            "event_type",
            F.floor(F.col("value") / 10).cast("int").alias("bucket"),
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("value").alias("lo"),
            F.max("value").alias("hi"),
        )
        .transform(pin)
        .orderBy("event_type", "bucket")
    )


# ---------------------------------------------------------------------------
# X-09: equi-depth (decile) binning
# ---------------------------------------------------------------------------


@query(
    "q103_equidepth_bins",
    oracle="""
    WITH edges AS (
        SELECT quantile_cont(value, [0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9]) AS es
        FROM events
    ),
    b AS (
        SELECT e.value,
               1 + len(list_filter(edges.es, x -> e.value > x)) AS bin
        FROM events e, edges
    )
    SELECT bin, COUNT(*) AS n, MIN(value) AS lo, MAX(value) AS hi
    FROM b GROUP BY bin ORDER BY bin
    """,
    tags=("X-09", "A-12"),
)
def q103_equidepth_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-depth decile binning: exact decile edges, then each row assigned
    bin = 1 + (# edges strictly below its value) — the discretization step
    for quantile features / calibration buckets. Spark's exact
    `percentile` and DuckDB's `quantile_cont` share the same definition
    (linear interpolation at rank p*(n-1)), so the edges are bit-identical.

    Scale shape: the edge computation is ONE aggregate (percentile merges
    per-partition), the 9-edge array broadcasts, and bin assignment is
    map-only — the naive alternative (global ntile) is a single-partition
    window over the whole table. At 100 TB swap the exact percentile for
    approx_percentile and keep the identical broadcast+map shape."""
    ev = load(spark, sf_dir, "events")
    edges = ev.agg(
        F.expr(
            "percentile(value, array(0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9))"
        ).alias("es")
    )
    binned = ev.join(F.broadcast(edges)).select(
        "value",
        (
            F.lit(1)
            + F.size(F.filter("es", lambda x: F.col("value") > x))
        ).alias("bin"),
    )
    return (
        binned.groupBy("bin")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("value").alias("lo"),
            F.max("value").alias("hi"),
        )
        .transform(pin)
        .orderBy("bin")
    )


# ---------------------------------------------------------------------------
# X-09: embedding int8 quantization
# ---------------------------------------------------------------------------


@query(
    "q104_embed_quantize",
    oracle="""
    WITH q AS (
        SELECT vec_id,
               list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) / 127.0 AS scale,
               list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
        FROM embeddings
    )
    SELECT vec_id,
           ROUND(scale, 6) AS scale,
           CAST(list_sum(list_transform(e, x -> CAST(FLOOR(x / scale + 0.5) AS BIGINT))) AS BIGINT) AS qsum,
           ROUND(list_max(list_transform(e, x -> abs(FLOOR(x / scale + 0.5) * scale - x))), 6) AS max_err
    FROM q
    ORDER BY vec_id
    """,
    tags=("X-09", "X-03"),
)
def q104_embed_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric int8 embedding quantization: per-vector scale = max|x|/127,
    q_i = floor(x_i/scale + 0.5), plus the max dequantization error — the
    compression step before shipping an embedding corpus to an ANN index.
    floor(x+0.5) is used instead of round() because round() half-way rules
    differ across engines while floor is pure IEEE arithmetic.

    Scale shape: map-only over the embeddings table, all inside JVM
    higher-order array functions (transform/aggregate) — no Python
    boundary, no shuffle until the presentation sort."""
    emb = load(spark, sf_dir, "embeddings")
    e = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    scale = F.array_max(F.transform(e, lambda x: F.abs(x))) / F.lit(127.0)
    # Internal name `_scale` is deliberately distinct from the output alias:
    # Spark 3.4+ lateral column aliases make a later select item resolve
    # `col("scale")` to the ROUNDED alias earlier in the same list, which
    # would quantize against the rounded scale and corrupt max_err.
    df = emb.select("vec_id", e.alias("e"), scale.alias("_scale"))
    quant = F.transform(F.col("e"), lambda x: F.floor(x / F.col("_scale") + F.lit(0.5)))
    return (
        df.select(
            "vec_id",
            F.round("_scale", 6).alias("scale"),
            F.aggregate(
                quant, F.lit(0).cast("bigint"), lambda acc, q: acc + q
            ).alias("qsum"),
            F.round(
                F.array_max(
                    F.zip_with(
                        quant,
                        F.col("e"),
                        lambda q, x: F.abs(q * F.col("_scale") - x),
                    )
                ),
                6,
            ).alias("max_err"),
        )
        .transform(pin)
        .orderBy("vec_id")
    )


# ---------------------------------------------------------------------------
# X-09: BM25 relevance scoring
# ---------------------------------------------------------------------------

#: fixed query terms (present in the synthetic corpus vocabulary)
_BM25_TERMS = ("spark", "join", "window")
_BM25_K1 = 1.2
_BM25_B = 0.75


@query(
    "q105_bm25",
    oracle=f"""
    WITH tok AS (
        SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS token
        FROM documents
    ),
    dl AS (
        SELECT doc_id, COUNT(*) AS dl FROM tok GROUP BY doc_id
    ),
    corpus AS (
        SELECT COUNT(*) AS n,
               CAST(SUM(dl) AS DOUBLE) / COUNT(*) AS avgdl
        FROM dl
    ),
    tf AS (
        SELECT doc_id, token, COUNT(*) AS tf FROM tok
        WHERE token IN ('spark', 'join', 'window')
        GROUP BY doc_id, token
    ),
    df AS (
        SELECT token, COUNT(*) AS df FROM tf GROUP BY token
    ),
    scored AS (
        SELECT tf.doc_id,
               ROUND(
                   ln(1 + (corpus.n - df.df + 0.5) / (df.df + 0.5))
                   * (tf.tf * ({_BM25_K1} + 1))
                   / (tf.tf + {_BM25_K1} * (1 - {_BM25_B} + {_BM25_B} * dl.dl / corpus.avgdl)),
                   6) AS term_score
        FROM tf
        JOIN df USING (token)
        JOIN dl USING (doc_id)
        CROSS JOIN corpus
    )
    SELECT doc_id,
           CAST(SUM(CAST(term_score AS DECIMAL(28,6))) AS DOUBLE) AS bm25,
           COUNT(*) AS n_terms_hit
    FROM scored GROUP BY doc_id ORDER BY doc_id
    """,
    tags=("X-09", "X-04"),
)
def q105_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 relevance of every document against a fixed query
    ('spark join window') — the classic retrieval scorer used for
    data-selection and hard-negative mining over a training corpus.
    Per-term scores are IEEE-double with identical operands in both
    engines, rounded to 6 dp, and the per-doc sum goes through exact
    decimal so term addition order cannot flake the hash.

    Scale shape: tokenize+explode is map-only; tf is a (doc, term) hash
    aggregate over ONLY the matching terms (the IN filter prunes before
    the shuffle); df and corpus stats are tiny aggregates that BROADCAST
    back; scoring is map-only. No corpus-sized join ever shuffles text."""
    from ..operators.dedup import tokens

    docs = load(spark, sf_dir, "documents")
    tok = docs.select("doc_id", F.explode(tokens("text")).alias("token"))
    dl = tok.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dl"))
    corpus = dl.agg(
        F.count(F.lit(1)).alias("n"),
        (F.sum("dl").cast("double") / F.count(F.lit(1))).alias("avgdl"),
    )
    tf = (
        tok.filter(F.col("token").isin(*_BM25_TERMS))
        .groupBy("doc_id", "token")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    df_t = tf.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    k1, b = F.lit(_BM25_K1), F.lit(_BM25_B)
    idf = F.log(F.lit(1) + (F.col("n") - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5)))
    term_score = F.round(
        idf
        * (F.col("tf") * (k1 + F.lit(1)))
        / (F.col("tf") + k1 * (F.lit(1) - b + b * F.col("dl") / F.col("avgdl"))),
        6,
    )
    scored = (
        tf.join(F.broadcast(df_t), "token")
        .join(dl, "doc_id")
        .join(F.broadcast(corpus))
        .select("doc_id", term_score.alias("term_score"))
    )
    return (
        scored.groupBy("doc_id")
        .agg(
            F.sum(F.col("term_score").cast("decimal(28,6)")).cast("double").alias("bm25"),
            F.count(F.lit(1)).alias("n_terms_hit"),
        )
        .transform(pin)
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# X-10: SCD-2 dimension upsert (MERGE semantics)
# ---------------------------------------------------------------------------


@query(
    "q106_scd2_upsert",
    oracle="""
    WITH upd AS (
        SELECT c_custkey, c_acctbal + 100 AS new_acctbal
        FROM customer WHERE c_custkey % 10 = 0
    )
    SELECT c.c_custkey, c.c_name, c.c_acctbal AS acctbal, 0 AS version,
           CASE WHEN u.c_custkey IS NULL THEN TRUE ELSE FALSE END AS is_current
    FROM customer c LEFT JOIN upd u USING (c_custkey)
    UNION ALL
    SELECT c.c_custkey, c.c_name, u.new_acctbal AS acctbal, 1 AS version,
           TRUE AS is_current
    FROM customer c JOIN upd u USING (c_custkey)
    ORDER BY c_custkey, version
    """,
    tags=("X-10", "J-04"),
)
def q106_scd2_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD-2 dimension upsert (MERGE INTO semantics re-expressed as joins):
    a deterministic change-set (every 10th customer gets +100 balance) is
    merged into the customer dimension — matched rows close their current
    version (is_current=false) and append a new version row; unmatched
    rows pass through untouched. This is the warehouse "slowly changing
    dimension" maintenance op the reference's Postgres side would do with
    UPDATE+INSERT.

    Scale shape: the change-set is usually ≪ the dimension, so it
    BROADCASTS into both the close and the append legs; the union is
    read-once per leg with column pruning. No full-dimension shuffle —
    exactly how MERGE executes on a real lakehouse table format."""
    cust = load(spark, sf_dir, "customer").select("c_custkey", "c_name", "c_acctbal")
    upd = cust.filter(F.col("c_custkey") % 10 == 0).select(
        "c_custkey", (F.col("c_acctbal") + F.lit(100)).alias("new_acctbal")
    )
    upd_keys = F.broadcast(upd.select("c_custkey", F.lit(True).alias("_hit")))
    existing = cust.join(upd_keys, "c_custkey", "left").select(
        "c_custkey",
        "c_name",
        F.col("c_acctbal").alias("acctbal"),
        F.lit(0).alias("version"),
        F.col("_hit").isNull().alias("is_current"),
    )
    appended = cust.join(F.broadcast(upd), "c_custkey").select(
        "c_custkey",
        "c_name",
        F.col("new_acctbal").alias("acctbal"),
        F.lit(1).alias("version"),
        F.lit(True).alias("is_current"),
    )
    return (
        existing.unionByName(appended)
        .transform(pin)
        .orderBy("c_custkey", "version")
    )


# ---------------------------------------------------------------------------
# X-09: time-series resample + forward fill
# ---------------------------------------------------------------------------


@query(
    "q123_resample_ffill",
    oracle="""
    WITH obs AS (
        SELECT user_id, CAST(ts AS DATE) AS day, value,
               ROW_NUMBER() OVER (PARTITION BY user_id, CAST(ts AS DATE)
                                  ORDER BY ts DESC, event_id DESC) AS rn
        FROM events
    ),
    daily AS (SELECT user_id, day, value FROM obs WHERE rn = 1),
    grid AS (
        SELECT u.user_id, g.day
        FROM (SELECT DISTINCT user_id FROM events) u,
             (SELECT unnest(generate_series(DATE '2024-01-01', DATE '2024-01-30',
                                            INTERVAL 1 DAY))::DATE AS day) g
    )
    SELECT g.user_id, CAST(g.day AS VARCHAR) AS day,
           last_value(d.value IGNORE NULLS) OVER (
               PARTITION BY g.user_id ORDER BY g.day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS value_ffill,
           CASE WHEN d.value IS NULL THEN 0 ELSE 1 END AS observed
    FROM grid g LEFT JOIN daily d USING (user_id, day)
    ORDER BY user_id, day
    """,
    tags=("X-09", "W-03"),
)
def q123_resample_ffill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series resampling to a daily grid with forward fill — the
    gap-filling step that turns irregular event streams into the regular
    per-entity feature matrix a model trains on: one row per (user, day)
    for the full month, carrying the day's LAST observed value (ties
    broken by event_id) forward across unobserved days.

    Scale shape: the daily last-observation is a per-(user, day) window
    (one shuffle); the calendar grid is a LITERAL 30-element array
    exploded against the distinct-user relation (never a range join); the
    fill is one more per-user window pass. Rows out = users x days —
    dense, but that IS the deliverable feature matrix; nothing
    intermediate exceeds it."""
    from pyspark.sql.window import Window

    ev = load(spark, sf_dir, "events")
    day = F.col("ts").cast("date")
    w_rn = Window.partitionBy("user_id", "day").orderBy(
        F.desc("ts"), F.desc("event_id")
    )
    daily = (
        ev.select("user_id", day.alias("day"), "value", "ts", "event_id")
        .withColumn("rn", F.row_number().over(w_rn))
        .filter(F.col("rn") == 1)
        .select("user_id", "day", "value")
    )
    grid = (
        ev.select("user_id")
        .distinct()
        .select(
            "user_id",
            F.explode(
                F.sequence(
                    F.lit("2024-01-01").cast("date"),
                    F.lit("2024-01-30").cast("date"),
                    F.expr("INTERVAL 1 DAY"),
                )
            ).alias("day"),
        )
    )
    w_ff = (
        Window.partitionBy("user_id")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        grid.join(daily, ["user_id", "day"], "left")
        .select(
            "user_id",
            # string label: DuckDB DATE round-trips to pandas as midnight
            # datetime, so a typed date column can never hash-match — the
            # grid label is the portable form
            F.col("day").cast("string").alias("day"),
            F.last("value", ignorenulls=True).over(w_ff).alias("value_ffill"),
            F.when(F.col("value").isNull(), 0).otherwise(1).alias("observed"),
        )
        .transform(pin)
        .orderBy("user_id", "day")
    )


# ---------------------------------------------------------------------------
# X-61: log-log demand elasticity (grouped OLS on ln-transformed pairs)
# ---------------------------------------------------------------------------

_ELASTICITY_ORACLE = """
    WITH pq AS (
        SELECT l_partkey,
               CAST(SUM(CAST(l_quantity AS DECIMAL(28,2))) AS DOUBLE) AS qty
        FROM lineitem GROUP BY l_partkey
    ),
    obs AS (
        SELECT p_brand AS brand,
               CAST(ROUND(ln(p_retailprice), 6) AS DECIMAL(16,6)) AS x,
               CAST(ROUND(ln(qty), 6) AS DECIMAL(16,6)) AS y
        FROM pq JOIN part ON l_partkey = p_partkey
    ),
    m AS (
        SELECT brand, CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(x) AS DECIMAL(28,6)) AS sx,
               CAST(SUM(y) AS DECIMAL(28,6)) AS sy,
               CAST(SUM(x * y) AS DECIMAL(38,12)) AS sxy,
               CAST(SUM(x * x) AS DECIMAL(38,12)) AS sxx,
               CAST(SUM(y * y) AS DECIMAL(38,12)) AS syy
        FROM obs GROUP BY brand
    )
    SELECT brand, n AS n_parts,
           ROUND((n * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * sy)
                 / (n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * sx), 6)
               AS elasticity,
           ROUND((n * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * sy)
                 * (n * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * sy)
                 / ((n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * sx)
                    * (n * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * sy)), 6)
               AS r_squared
    FROM m
    WHERE n >= 3
      AND n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * sx <> 0
      AND n * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * sy <> 0
    ORDER BY brand
"""


@query("q256_price_elasticity", oracle=_ELASTICITY_ORACLE, tags=("X-61", "X-31"))
def q256_price_elasticity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Log-log demand elasticity per brand: OLS slope of ln(quantity sold)
    on ln(retail price) across the brand's parts — the constant-elasticity
    demand model (slope = % quantity change per % price change) that
    pricing teams fit before any price move, with r² as fit quality.
    The ln-transformed twin of q154's linear trend: q154 certifies OLS on
    raw integer moments; this certifies it on TRANSFORMED features where
    float determinism must be manufactured — each ln enters rounded at
    6 dp (the q179/q183 cross-libm idiom), so all five moments are exact
    decimals and the closed-form slope divides bit-identical operands.

    Scale shape: one shuffle rolls lineitem up to per-part quantities
    (map-side combined); the part dimension joins BROADCAST; moments are
    one grouped pass over the bounded per-part relation, 5 decimal
    accumulators per brand — the A-14 mergeable-partial shape, so the
    same plan fits 100 TB of lineitem unchanged."""
    pq = (
        load(spark, sf_dir, "lineitem")
        .groupBy("l_partkey")
        .agg(
            F.sum(F.col("l_quantity").cast("decimal(28,2)"))
            .cast("double")
            .alias("qty")
        )
    )
    p = load(spark, sf_dir, "part").select(
        "p_partkey", F.col("p_brand").alias("brand"), "p_retailprice"
    )
    obs = pq.join(F.broadcast(p), pq.l_partkey == p.p_partkey).select(
        "brand",
        F.round(F.log("p_retailprice"), 6).cast("decimal(16,6)").alias("x"),
        F.round(F.log("qty"), 6).cast("decimal(16,6)").alias("y"),
    )
    m = obs.groupBy("brand").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("decimal(28,6)").alias("sx"),
        F.sum("y").cast("decimal(28,6)").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("decimal(38,12)").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("decimal(38,12)").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast("decimal(38,12)").alias("syy"),
    )
    num = F.col("n") * F.col("sxy").cast("double") - F.col("sx").cast("double") * F.col("sy")
    den_x = F.col("n") * F.col("sxx").cast("double") - F.col("sx").cast("double") * F.col("sx")
    den_y = F.col("n") * F.col("syy").cast("double") - F.col("sy").cast("double") * F.col("sy")
    return (
        m.filter((F.col("n") >= 3) & (den_x != 0) & (den_y != 0))
        .select(
            "brand",
            F.col("n").alias("n_parts"),
            F.round(num / den_x, 6).alias("elasticity"),
            F.round(num * num / (den_x * den_y), 6).alias("r_squared"),
        )
        .transform(pin)
        .orderBy("brand")
    )


# ---------------------------------------------------------------------------
# X-114: what-if price simulation from fitted elasticities
# ---------------------------------------------------------------------------

#: pinned ln(1.10) / ln(0.90) literals — no libm ln runs in either engine
_WI_LN_UP = 0.09531
_WI_LN_DN = -0.105361

_WHATIF_ORACLE = f"""
    WITH pq AS (
        SELECT l_partkey,
               CAST(SUM(CAST(l_quantity AS DECIMAL(28,2))) AS DOUBLE) AS qty,
               CAST(SUM(CAST(l_extendedprice * 100 AS DECIMAL(28,0)))
                    AS BIGINT) AS rev_cents
        FROM lineitem GROUP BY l_partkey
    ),
    obs AS (
        SELECT p_brand AS brand,
               CAST(ROUND(ln(p_retailprice), 6) AS DECIMAL(16,6)) AS x,
               CAST(ROUND(ln(qty), 6) AS DECIMAL(16,6)) AS y,
               rev_cents
        FROM pq JOIN part ON l_partkey = p_partkey
    ),
    m AS (
        SELECT brand, CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(x) AS DECIMAL(28,6)) AS sx,
               CAST(SUM(y) AS DECIMAL(28,6)) AS sy,
               CAST(SUM(x * y) AS DECIMAL(38,12)) AS sxy,
               CAST(SUM(x * x) AS DECIMAL(38,12)) AS sxx,
               CAST(SUM(rev_cents) AS BIGINT) AS rev
        FROM obs GROUP BY brand
    ),
    el AS (
        SELECT brand, n, rev,
               ROUND((n * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * sy)
                     / (n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * sx), 6)
                   AS eps
        FROM m
        WHERE n >= 3 AND n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * sx <> 0
    )
    SELECT brand, n AS n_parts, eps AS elasticity, rev AS rev_now_cents,
           ROUND(exp((1 + eps) * {_WI_LN_UP}) - 1, 6) AS rev_delta_up10,
           ROUND(exp((1 + eps) * {_WI_LN_DN}) - 1, 6) AS rev_delta_dn10
    FROM el
    ORDER BY brand
"""


@query("q324_price_whatif", oracle=_WHATIF_ORACLE, tags=("X-114", "X-61"))
def q324_price_whatif(spark: SparkSession, sf_dir: str) -> DataFrame:
    """What-if price simulation: under each brand's fitted constant
    elasticity (the q256 log-log OLS slope), the revenue impact of a
    +/-10% price move — Rev' = Rev * (1+d)^(1+eps), so a brand with
    eps < -1 LOSES revenue on a price hike and the readout says which
    ones — the counterfactual pricing decision the elasticity fit
    exists to feed (fit: q256; decide: here; measure after shipping:
    q310's causal impact).

    Determinism: the elasticity enters 6-dp rounded (q256's published
    precision); ln(1.1)/ln(0.9) are pinned Python literals so NO libm
    ln runs; the single exp per brand is the q203/q299 libm idiom with
    the result rounded 6 dp; revenue bases are exact integer cents.

    Scale shape: one partkey rollup, one brand-keyed moment rollup
    (A-14 mergeable), map-only scalar readouts per brand row.

    Reference parity: beyond-reference."""
    li = load(spark, sf_dir, "lineitem")
    pq = li.groupBy("l_partkey").agg(
        F.sum(F.col("l_quantity").cast("decimal(28,2)"))
        .cast("double")
        .alias("qty"),
        F.sum((F.col("l_extendedprice") * 100).cast("decimal(28,0)"))
        .cast("long")
        .alias("rev_cents"),
    )
    obs = pq.join(
        load(spark, sf_dir, "part"), pq.l_partkey == F.col("p_partkey")
    ).select(
        F.col("p_brand").alias("brand"),
        F.round(F.log("p_retailprice"), 6).cast("decimal(16,6)").alias("x"),
        F.round(F.log("qty"), 6).cast("decimal(16,6)").alias("y"),
        "rev_cents",
    )
    m = obs.groupBy("brand").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("decimal(28,6)").alias("sx"),
        F.sum("y").cast("decimal(28,6)").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("decimal(38,12)").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("decimal(38,12)").alias("sxx"),
        F.sum("rev_cents").cast("long").alias("rev"),
    )
    den = F.col("n") * F.col("sxx").cast("double") - F.col("sx").cast(
        "double"
    ) * F.col("sx").cast("double")
    eps = F.round(
        (
            F.col("n") * F.col("sxy").cast("double")
            - F.col("sx").cast("double") * F.col("sy").cast("double")
        )
        / den,
        6,
    )
    el = m.filter((F.col("n") >= 3) & (den != 0)).select(
        "brand", "n", "rev", eps.alias("eps")
    )
    return (
        el.select(
            "brand",
            F.col("n").alias("n_parts"),
            F.col("eps").alias("elasticity"),
            F.col("rev").alias("rev_now_cents"),
            F.round(
                F.exp((1 + F.col("eps")) * F.lit(_WI_LN_UP)) - 1, 6
            ).alias("rev_delta_up10"),
            F.round(
                F.exp((1 + F.col("eps")) * F.lit(_WI_LN_DN)) - 1, 6
            ).alias("rev_delta_dn10"),
        )
        .transform(pin)
        .orderBy("brand")
    )


# ---------------------------------------------------------------------------
# X-135: Johnson-Lindenstrauss random-projection compression + distortion audit
# ---------------------------------------------------------------------------

_JL_K = 16  #: target dimension (64 -> 16, a 4x embedding compression)
_JL_D = 64  #: source embedding dimension
_JL_SAMPLE = 40  #: vectors in the audit sample -> 780 pairs


def _jl_sign(j: int, i: int) -> int:
    """+-1 from md5(f"jl:{j}:{i}") — the X-16 RNG-free discipline; the same
    literal matrix is inlined into both engines."""
    import hashlib as _hl

    h = _hl.md5(f"jl:{j}:{i}".encode()).hexdigest()
    return 1 if int(h[0], 16) < 8 else -1


_JL_SIGNS = [[_jl_sign(j, i) for i in range(_JL_D)] for j in range(_JL_K)]


def _jl_oracle_dot(signs: list[int], vec: str) -> str:
    lit = "[" + ", ".join(f"{s}.0" for s in signs) + "]"
    return (
        f"list_reduce(list_transform(range(1, {len(signs) + 1}), "
        f"i -> ({lit})[i] * {vec}[i]), (x, y) -> x + y)"
    )


_JL_ORACLE = f"""
    WITH base AS (
        SELECT vec_id, embedding::DOUBLE[] AS ve
        FROM embeddings WHERE vec_id < {_JL_SAMPLE}
    ),
    proj AS (
        SELECT vec_id, ve,
               [{", ".join(_jl_oracle_dot(row, "ve") for row in _JL_SIGNS)}] AS y
        FROM base
    ),
    pairs AS (
        SELECT a.vec_id AS va, b.vec_id AS vb,
               a.ve AS ave, b.ve AS bve, a.y AS ya, b.y AS yb
        FROM proj a JOIN proj b ON a.vec_id < b.vec_id
    ),
    d AS (
        SELECT va, vb,
               list_reduce(list_transform(range(1, {_JL_D + 1}),
                   i -> (ave[i] - bve[i]) * (ave[i] - bve[i])),
                   (x, y) -> x + y) AS d2o,
               list_reduce(list_transform(range(1, {_JL_K + 1}),
                   i -> (ya[i] - yb[i]) * (ya[i] - yb[i])),
                   (x, y) -> x + y) AS d2p
        FROM pairs
    )
    SELECT va AS vec_a, vb AS vec_b,
           ROUND(d2o, 6) AS d2_orig, ROUND(d2p, 6) AS d2_proj,
           ROUND(d2p / ({_JL_K} * d2o), 6) AS distortion
    FROM d WHERE d2o > 0
    ORDER BY vec_a, vec_b
"""


@query("q410_jl_projection", oracle=_JL_ORACLE, tags=("X-135", "X-03"))
def q410_jl_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Johnson-Lindenstrauss random projection (64 -> 16 dims via a +-1
    sign matrix) with a pairwise DISTORTION AUDIT: for every pair in a
    deterministic 40-vector sample, the ratio
    ||Sx_a - Sx_b||^2 / (k * ||x_a - x_b||^2) — the unbiasedness check of
    the JL estimator (E = 1 for +-1 matrices). This is the dimension-
    reduction front-end for the X-03 vector-search family: projecting
    embeddings 4x before q46's LSH / q46b's IVF cuts candidate-scoring
    FLOPs and shuffle bytes 4x while the audit quantifies exactly how much
    neighbor geometry was spent, and the same audit gates any future
    learned-compression swap (q351's PQ audit is the codebook sibling).

    Determinism: the sign matrix is md5-derived (RNG-free, X-16) and
    inlined into BOTH engines as literals; every projection and distance
    is a SEQUENTIAL left fold over double arrays (F.aggregate/zip_with on
    the Spark side, list_reduce/list_transform on DuckDB — the q45
    idiom), so operands are bit-identical; readouts round 6 dp.

    Scale shape: projection is MAP-ONLY (16 literal-weighted dots per
    vector, no shuffle — the q46 plane-dot shape); at corpus scale the
    projected table is what ships to ANN. The quadratic pair audit runs
    only on the bounded sample (780 pairs via one broadcast self-join);
    the corpus-wide audit would reuse X-02's banded candidates instead of
    all pairs.

    Reference parity: beyond-reference; completes the embedding kit
    (q104 int8 quantization, q351 PQ audit, q362 isotropy) with the
    projection-compression primitive."""
    base = (
        load(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id") < _JL_SAMPLE)
        .select(
            "vec_id",
            F.transform("embedding", lambda x: x.cast("double")).alias("ve"),
        )
    )

    def dot(signs: list[int]):
        warr = F.array(*[F.lit(float(s)) for s in signs])
        return F.aggregate(
            F.zip_with(warr, F.col("ve"), lambda w, x: w * x),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )

    proj = base.select(
        "vec_id", "ve", F.array(*[dot(row) for row in _JL_SIGNS]).alias("y")
    )
    a, b = proj.alias("a"), proj.alias("b")
    pairs = a.join(F.broadcast(b), F.col("a.vec_id") < F.col("b.vec_id")).select(
        F.col("a.vec_id").alias("va"),
        F.col("b.vec_id").alias("vb"),
        F.col("a.ve").alias("ave"),
        F.col("b.ve").alias("bve"),
        F.col("a.y").alias("ya"),
        F.col("b.y").alias("yb"),
    )
    sqdist = lambda u, v: F.aggregate(  # noqa: E731 — sequential fold, q45 idiom
        F.zip_with(u, v, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    d = pairs.select(
        "va",
        "vb",
        sqdist(F.col("ave"), F.col("bve")).alias("d2o"),
        sqdist(F.col("ya"), F.col("yb")).alias("d2p"),
    ).filter(F.col("d2o") > 0)
    return (
        d.select(
            F.col("va").alias("vec_a"),
            F.col("vb").alias("vec_b"),
            F.round("d2o", 6).alias("d2_orig"),
            F.round("d2p", 6).alias("d2_proj"),
            F.round(F.col("d2p") / (_JL_K * F.col("d2o")), 6).alias("distortion"),
        )
        .transform(pin)
        .orderBy("vec_a", "vec_b")
    )
