"""Behavioral-analytics query surface (SURVEY.md §2, X-08): funnel
conversion, cohort retention, heavy-hitter key profiling over the `events`
stream — the OLAP workload an event-analytics engine runs at 100 TB.

All three are expressed as single-pass window/agg plans: no self-joins, no
per-step joins, no driver-side loops. The funnel in particular replaces the
textbook k-way self-join (O(events^k) candidates) with one per-user ordered
window scan — the shape that survives a 1000-executor corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ..functions.ordering import pin, stage
from ..tables import load
from .registry import query

#: funnel step gap: each step must follow the previous within this window
_FUNNEL_GAP_MIN = 30


def funnel_per_user(ev: DataFrame, gap_min: int = _FUNNEL_GAP_MIN) -> DataFrame:
    """(user_id, s1, s2, s3) funnel-step flags — the single-window-scan core
    of q86 (property-tested against the naive join formulation in
    tests/test_properties.py)."""
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    gap = F.expr(f"INTERVAL {gap_min} MINUTES")
    e = ev.withColumn(
        "last_view", F.max(F.when(F.col("event_type") == "view", F.col("ts"))).over(w)
    )
    qclick = (
        (F.col("event_type") == "click")
        & F.col("last_view").isNotNull()
        & (F.col("ts") <= F.col("last_view") + gap)
    )
    e = e.withColumn("last_qclick", F.max(F.when(qclick, F.col("ts"))).over(w))
    completed = (
        (F.col("event_type") == "purchase")
        & F.col("last_qclick").isNotNull()
        & (F.col("ts") <= F.col("last_qclick") + gap)
    )
    return e.groupBy("user_id").agg(
        F.max(F.when(F.col("event_type") == "view", 1).otherwise(0)).alias("s1"),
        F.max(F.when(qclick, 1).otherwise(0)).alias("s2"),
        F.max(F.when(completed, 1).otherwise(0)).alias("s3"),
    )


@query(
    "q86_funnel",
    oracle=f"""
    WITH e AS (
        SELECT user_id, event_id, event_type, ts,
               MAX(CASE WHEN event_type = 'view' THEN ts END) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
               ) AS last_view
        FROM events
    ),
    c AS (
        SELECT user_id, event_type, ts, last_view,
               MAX(CASE WHEN event_type = 'click'
                         AND last_view IS NOT NULL
                         AND ts - last_view <= INTERVAL {_FUNNEL_GAP_MIN} MINUTE
                        THEN ts END) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
               ) AS last_qclick
        FROM e
    ),
    per_user AS (
        SELECT user_id,
               MAX(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS s1,
               MAX(CASE WHEN event_type = 'click' AND last_view IS NOT NULL
                         AND ts - last_view <= INTERVAL {_FUNNEL_GAP_MIN} MINUTE
                        THEN 1 ELSE 0 END) AS s2,
               MAX(CASE WHEN event_type = 'purchase' AND last_qclick IS NOT NULL
                         AND ts - last_qclick <= INTERVAL {_FUNNEL_GAP_MIN} MINUTE
                        THEN 1 ELSE 0 END) AS s3
        FROM c GROUP BY user_id
    )
    SELECT step, step_name, n_users FROM (
        SELECT 1 AS step, 'view' AS step_name, CAST(SUM(s1) AS BIGINT) AS n_users FROM per_user
        UNION ALL
        SELECT 2, 'click_after_view', CAST(SUM(s2) AS BIGINT) FROM per_user
        UNION ALL
        SELECT 3, 'purchase_after_click', CAST(SUM(s3) AS BIGINT) FROM per_user
    ) ORDER BY step
    """,
    tags=("X-08", "W-02"),
)

def q86_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Funnel conversion (view -> click -> purchase, each step within 30
    minutes of the previous): how many users reach each step.

    Scale shape: ONE window scan per user ordered by (ts, event_id) — the
    tie-broken total order keeps the ROWS frame deterministic across
    engines — instead of the k-way self-join. Each user's events shuffle
    once on the 8-byte user_id; the per-user state is two running MAX
    timestamps, so skewed users cost memory O(1), not O(events^2)."""
    per_user = funnel_per_user(load(spark, sf_dir, "events"))
    steps = per_user.agg(
        F.sum("s1").alias("n1"), F.sum("s2").alias("n2"), F.sum("s3").alias("n3")
    ).select(
        F.explode(
            F.array(
                F.struct(
                    F.lit(1).alias("step"),
                    F.lit("view").alias("step_name"),
                    F.col("n1").alias("n_users"),
                ),
                F.struct(
                    F.lit(2).alias("step"),
                    F.lit("click_after_view").alias("step_name"),
                    F.col("n2").alias("n_users"),
                ),
                F.struct(
                    F.lit(3).alias("step"),
                    F.lit("purchase_after_click").alias("step_name"),
                    F.col("n3").alias("n_users"),
                ),
            )
        ).alias("s")
    ).select("s.step", "s.step_name", "s.n_users")
    return steps.transform(pin).orderBy("step")


@query(
    "q87_cohort_retention",
    oracle="""
    WITH u AS (
        SELECT user_id, ts,
               MIN(CAST(ts AS DATE)) OVER (PARTITION BY user_id) AS cohort_day
        FROM events
    )
    SELECT cohort_day,
           datediff('day', cohort_day, CAST(ts AS DATE)) AS day_offset,
           COUNT(DISTINCT user_id) AS n_users
    FROM u
    GROUP BY cohort_day, day_offset
    ORDER BY cohort_day, day_offset
    """,
    tags=("X-08", "A-04"),
)
def q87_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention: users grouped by first-seen day, counted distinct
    on each subsequent active day offset — the engagement matrix behind
    every retention curve.

    Scale shape: the cohort assignment is an unordered per-user window MIN
    (one hash shuffle on user_id, no sort), then a (date, smallint)-keyed
    distinct-count agg with map-side partials. No join back against the
    user dimension."""
    ev = load(spark, sf_dir, "events")
    u = ev.withColumn(
        "cohort_day",
        F.min(F.to_date("ts")).over(W.partitionBy("user_id")),
    )
    return (
        u.select(
            # cast date->timestamp for the comparison harness: DuckDB DATE
            # lands in pandas as datetime64, Spark DateType as date objects
            F.col("cohort_day").cast("timestamp").alias("cohort_day"),
            F.datediff(F.to_date("ts"), F.col("cohort_day")).alias("day_offset"),
            "user_id",
        )
        .groupBy("cohort_day", "day_offset")
        .agg(F.count_distinct("user_id").alias("n_users"))
        .transform(pin)
        .orderBy("cohort_day", "day_offset")
    )


@query(
    "q88_heavy_hitters",
    oracle="""
    WITH c AS (
        SELECT user_id, COUNT(*) AS n_events FROM events GROUP BY user_id
    ),
    t AS (SELECT SUM(n_events) AS total FROM c)
    SELECT user_id, n_events,
           CAST(n_events AS DOUBLE) / CAST(total AS DOUBLE) AS share
    FROM c, t
    ORDER BY n_events DESC, user_id ASC
    LIMIT 20
    """,
    tags=("X-08", "O-01"),
)
def q88_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heavy-hitter key profile: the 20 hottest user_ids with their share of
    all events — the diagnostic that tells you whether a join/agg on this
    key needs salting or AQE skew handling before you run it at 100 TB.

    Scale shape: per-key counts with map-side partials, the grand total as
    a 1-row agg broadcast back (never an unpartitioned window over the key
    space), TakeOrderedAndProject for the deterministic top-20."""
    ev = load(spark, sf_dir, "events")
    c = ev.groupBy("user_id").agg(F.count("*").alias("n_events"))
    total = c.agg(F.sum("n_events").alias("total"))
    return (
        c.crossJoin(F.broadcast(total))
        .select(
            "user_id",
            "n_events",
            (F.col("n_events").cast("double") / F.col("total").cast("double")).alias(
                "share"
            ),
        )
        .orderBy(F.desc("n_events"), F.asc("user_id"))
        .limit(20)
    )


@query(
    "q90_hll_mergeable_rollup",
    oracle="""
    SELECT date_trunc('week', CAST(ts AS DATE)) AS week,
           COUNT(DISTINCT user_id) AS exact_users,
           TRUE AS within_tol
    FROM events
    GROUP BY week
    ORDER BY week
    """,
    tags=("A-13", "A-05"),
)
def q90_hll_mergeable_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable-sketch rollup (A-13): per-DAY HyperLogLog sketches of
    distinct users, merged up to per-WEEK estimates WITHOUT rescanning the
    events — the re-aggregation pattern that makes 100 TB dashboards cheap:
    daily sketches are a few KB each, so the weekly (or monthly, or
    all-time) rollup merges O(days) sketches instead of shuffling O(events)
    keys again.

    The hash-checked contract is the q07b pattern: exact weekly distincts
    plus an in-engine 5%-tolerance assertion on the merged-sketch estimate
    (lgConfigK=14 => ~1% expected error). Sketch build and merge are
    deterministic: fixed hash seed, commutative register-max merge."""
    ev = load(spark, sf_dir, "events")
    day = F.date_trunc("week", F.to_date("ts")).alias("week")
    daily = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.hll_sketch_agg("user_id", 14).alias("sk"),
        F.count_distinct("user_id").alias("exact_day_users"),
    )
    weekly_sketch = daily.groupBy(
        F.date_trunc("week", "day").alias("week")
    ).agg(F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("approx_users"))
    weekly_exact = ev.groupBy(day).agg(
        F.count_distinct("user_id").alias("exact_users")
    )
    return (
        weekly_exact.join(weekly_sketch, "week")
        .select(
            "week",
            "exact_users",
            (
                F.abs(F.col("approx_users") - F.col("exact_users"))
                <= 0.05 * F.col("exact_users")
            ).alias("within_tol"),
        )
        .transform(pin)
        .orderBy("week")
    )


#: q91 inactivity gap that closes a session
_SESSION_GAP_MIN = 30


@query(
    "q91_sessionize",
    oracle=f"""
    WITH g AS (
        SELECT user_id, ts, event_id,
               CASE WHEN ts - LAG(ts) OVER (
                        PARTITION BY user_id ORDER BY ts, event_id
                    ) <= INTERVAL {_SESSION_GAP_MIN} MINUTE
                    THEN 0 ELSE 1 END AS new_session
        FROM events
    ),
    s AS (
        SELECT user_id, ts,
               SUM(new_session) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS session_idx
        FROM g
    )
    SELECT user_id, CAST(session_idx AS BIGINT) AS session_idx,
           COUNT(*) AS n_events,
           MIN(ts) AS session_start,
           epoch_us(MAX(ts)) - epoch_us(MIN(ts)) AS duration_us
    FROM s
    GROUP BY user_id, session_idx
    ORDER BY user_id, session_idx
    """,
    tags=("X-08", "T-07", "W-02"),
)
def q91_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event session ASSIGNMENT by 30-minute inactivity gap — the batch
    twin of the T-07 session window that also hands back which session each
    event belongs to (session ids, starts, durations), which the windowed
    agg alone cannot.

    Scale shape: the classic gaps-and-islands plan — one shuffle on
    user_id, one per-user sort, two running windows (lag flag + running
    sum), then an agg keyed by (user_id, session_idx). No self-join, no
    session-count blowup; a skewed user costs one task's sort, not O(n^2).
    The (ts, event_id) tie-broken order keeps every engine's frame
    identical."""
    return (
        sessionize_events(load(spark, sf_dir, "events"))
        .transform(pin)
        .orderBy("user_id", "session_idx")
    )


def sessionize_events(ev: DataFrame, gap_min: int = _SESSION_GAP_MIN) -> DataFrame:
    """(user_id, session_idx, n_events, session_start, duration_us) — the
    gaps-and-islands core of q91 (property-tested against a pure-python
    per-user simulation in tests/test_properties.py)."""
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.expr(f"INTERVAL {gap_min} MINUTES")
    g = ev.withColumn(
        "new_session",
        F.when(F.col("ts") <= F.lag("ts").over(w) + gap, 0).otherwise(1),
    )
    s = g.withColumn(
        "session_idx",
        F.sum("new_session").over(w.rowsBetween(W.unboundedPreceding, 0)),
    )
    return s.groupBy("user_id", "session_idx").agg(
        F.count("*").alias("n_events"),
        F.min("ts").alias("session_start"),
        (F.unix_micros(F.max("ts")) - F.unix_micros(F.min("ts"))).alias("duration_us"),
    )


@query(
    "q93_cube_grouping",
    oracle="""
    SELECT event_type,
           CAST(CAST(ts AS DATE) AS TIMESTAMP) AS day,
           COUNT(*) AS n_events,
           GROUPING(event_type) AS g_type,
           GROUPING(CAST(ts AS DATE)) AS g_day
    FROM events
    GROUP BY CUBE(event_type, CAST(ts AS DATE))
    ORDER BY g_type, g_day, event_type, day
    """,
    tags=("A-09",),
)
def q93_cube_grouping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE with GROUPING flags — A-09's missing half beyond rollup: all
    four (type, day) aggregation levels in one pass, each row labelled with
    per-column GROUPING indicators so consumers can tell a real NULL from a
    subtotal. Spark executes cube as a single Expand + hash agg — one
    shuffle for all granularities, not one scan per level."""
    ev = load(spark, sf_dir, "events")
    day = F.to_date("ts")
    return (
        ev.select(F.col("event_type"), day.alias("day"))
        .cube("event_type", "day")
        .agg(
            F.count("*").alias("n_events"),
            F.grouping("event_type").alias("g_type"),
            F.grouping("day").alias("g_day"),
        )
        .select(
            "event_type",
            F.col("day").cast("timestamp").alias("day"),
            "n_events",
            F.col("g_type").cast("int").alias("g_type"),
            F.col("g_day").cast("int").alias("g_day"),
        )
        .transform(pin)
        .orderBy("g_type", "g_day", "event_type", "day")
    )


@query(
    "q94_approx_percentiles",
    oracle="""
    SELECT event_type,
           quantile_cont(value, 0.5) AS exact_p50,
           quantile_cont(value, 0.95) AS exact_p95,
           TRUE AS p50_ok, TRUE AS p95_ok
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
    tags=("A-12", "A-05"),
)
def q94_approx_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate grouped percentiles — A-12's 100 TB path: exact
    percentiles need a per-group sort (or at least a full value shuffle);
    `approx_percentile` runs a mergeable KLL-style summary with map-side
    partials, one narrow agg. Contract is the q07b/q90 pattern: the exact
    values hash-check against DuckDB quantile_cont (interpolation bit-exact,
    proven by q75), and the sketch estimate carries an in-engine assertion
    that it lands within 10% of the group's value range."""
    ev = load(spark, sf_dir, "events")
    agg = ev.groupBy("event_type").agg(
        F.expr("percentile(value, 0.5)").alias("exact_p50"),
        F.expr("percentile(value, 0.95)").alias("exact_p95"),
        F.expr("approx_percentile(value, 0.5, 1000)").alias("ap50"),
        F.expr("approx_percentile(value, 0.95, 1000)").alias("ap95"),
        (F.max("value") - F.min("value")).alias("rng"),
    )
    tol = 0.10
    return (
        agg.select(
            "event_type",
            "exact_p50",
            "exact_p95",
            (F.abs(F.col("ap50") - F.col("exact_p50")) <= tol * F.col("rng")).alias(
                "p50_ok"
            ),
            (F.abs(F.col("ap95") - F.col("exact_p95")) <= tol * F.col("rng")).alias(
                "p95_ok"
            ),
        )
        .transform(pin)
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# X-08: last-touch attribution
# ---------------------------------------------------------------------------

_ATTR_WINDOW_US = 3 * 86_400 * 1_000_000  #: 3-day lookback, exact microseconds


@query(
    "q152_last_touch_attribution",
    oracle=f"""
    WITH src AS (
        SELECT user_id, ts, MAX(event_type) AS src_type
        FROM events WHERE event_type <> 'purchase'
        GROUP BY user_id, ts
    ),
    lab AS (
        SELECT event_id, user_id, ts, value
        FROM events WHERE event_type = 'purchase'
    ),
    j AS (
        SELECT l.event_id, l.ts, l.value, s.src_type, s.ts AS src_ts,
               ROW_NUMBER() OVER (PARTITION BY l.event_id ORDER BY s.ts DESC) AS rn
        FROM lab l
        LEFT JOIN src s ON l.user_id = s.user_id AND s.ts <= l.ts
    ),
    attributed AS (
        SELECT CASE WHEN src_ts IS NOT NULL
                     AND epoch_us(ts) - epoch_us(src_ts) <= {_ATTR_WINDOW_US}
                    THEN src_type ELSE 'unattributed' END AS channel,
               value
        FROM j WHERE rn = 1
    )
    SELECT channel, COUNT(*) AS n_purchases,
           CAST(SUM(CAST(value AS DECIMAL(28,2))) AS DOUBLE) AS revenue
    FROM attributed GROUP BY channel ORDER BY channel
    """,
    tags=("X-08", "J-11"),
)
def q152_last_touch_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch attribution: every purchase is credited to the user's
    most recent non-purchase event within a 3-day lookback (else
    'unattributed'), reporting purchases and decimal-exact revenue per
    channel — the marketing-analytics read of the funnel data (q86 tells
    you users convert; this tells you which touchpoint gets the credit).

    Scale shape: the most-recent-touch lookup is the J-11 as-of machinery
    (one shuffle on user_id + in-partition sort + running
    last(ignorenulls)) — never a per-purchase range probe; the 3-day
    bound is an exact integer microsecond comparison applied AFTER the
    as-of, and the final rollup groups on the tiny channel key. The
    oracle spells the naive interval join + row_number this replaces."""
    from ..operators.asof import asof_join

    ev = load(spark, sf_dir, "events")
    src = (
        ev.filter(F.col("event_type") != "purchase")
        .groupBy("user_id", "ts")
        .agg(F.max("event_type").alias("src_type"))
        .select("user_id", F.col("ts").alias("src_ts"), "src_type")
    )
    lab = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    # the matched touch TIME rides along as a second value column so the
    # lookback bound can be applied after the as-of
    j2 = asof_join(
        lab, src.withColumn("src_ts_v", F.col("src_ts")),
        key="user_id", left_time="ts", right_time="src_ts",
        value_cols=["src_type", "src_ts_v"],
    )
    in_window = (
        F.col("src_ts_v").isNotNull()
        & (F.unix_micros("ts") - F.unix_micros("src_ts_v") <= _ATTR_WINDOW_US)
    )
    return (
        j2.select(
            F.when(in_window, F.col("src_type")).otherwise("unattributed").alias(
                "channel"
            ),
            "value",
        )
        .groupBy("channel")
        .agg(
            F.count(F.lit(1)).alias("n_purchases"),
            F.sum(F.col("value").cast("decimal(28,2)")).cast("double").alias("revenue"),
        )
        .transform(pin)
        .orderBy("channel")
    )


@query(
    "q170_funnel_latency",
    oracle="""
    WITH o AS (
        SELECT user_id, ts, event_type,
               MIN(CASE WHEN event_type = 'view' THEN ts END) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS rm_view
        FROM events
    ),
    u AS (
        SELECT user_id,
               MIN(CASE WHEN event_type = 'view' THEN ts END) AS fv,
               MIN(CASE WHEN event_type = 'purchase' AND rm_view IS NOT NULL
                   THEN ts END) AS fp
        FROM o GROUP BY user_id
    ),
    lat AS (
        SELECT user_id, epoch_us(fp) - epoch_us(fv) AS latency_us
        FROM u WHERE fp IS NOT NULL
    )
    SELECT (SELECT COUNT(*) FROM u) AS n_users,
           (SELECT COUNT(fv) FROM u) AS n_viewers,
           COUNT(*) AS n_converted,
           CAST(quantile_disc(latency_us, 0.5) AS BIGINT) AS p50_us,
           CAST(quantile_disc(latency_us, 0.9) AS BIGINT) AS p90_us,
           CAST(quantile_disc(latency_us, 0.99) AS BIGINT) AS p99_us
    FROM lat
    """,
    tags=("X-08", "A-12", "W-03"),
)
def q170_funnel_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Funnel time-to-convert: for each user, the latency from their FIRST
    view to their first purchase that FOLLOWS a view, summarized as exact
    p50/p90/p99 across converted users — q86 reports THAT users convert,
    this reports HOW LONG conversion takes, the number an on-call growth
    team actually watches.

    Scale shape: one shuffle on user_id feeds a single ordered window
    pass (running min of view-time, so "purchase after a view" is a
    per-row test — no self-join of the funnel steps) and the per-user
    rollup; the percentile aggregation runs over one latency row per
    CONVERTED user (A-12 family; at extreme user counts swap
    approx_percentile on the identical dataflow). Latencies are exact
    integer microseconds and the percentiles are DISCRETE (an actual
    observed element, SQL-standard percentile_disc in both engines) —
    interpolating between ~1e12-µs int64s costs a last-ulp double
    hazard that the discrete form removes entirely."""
    ev = load(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        W.unboundedPreceding, 0
    )
    o = ev.select(
        "user_id",
        "ts",
        "event_type",
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).over(w).alias(
            "rm_view"
        ),
    )
    u = o.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).alias("fv"),
        F.min(
            F.when(
                (F.col("event_type") == "purchase") & F.col("rm_view").isNotNull(),
                F.col("ts"),
            )
        ).alias("fp"),
    ).transform(stage)  # feeds totals AND the converted-latency percentiles
    lat = u.filter(F.col("fp").isNotNull()).select(
        (F.unix_micros("fp") - F.unix_micros("fv")).alias("latency_us")
    )
    totals = u.agg(
        F.count(F.lit(1)).alias("n_users"), F.count("fv").alias("n_viewers")
    )
    pct = lat.agg(
        F.count(F.lit(1)).alias("n_converted"),
        F.expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY latency_us)")
        .cast("long")
        .alias("p50_us"),
        F.expr("percentile_disc(0.9) WITHIN GROUP (ORDER BY latency_us)")
        .cast("long")
        .alias("p90_us"),
        F.expr("percentile_disc(0.99) WITHIN GROUP (ORDER BY latency_us)")
        .cast("long")
        .alias("p99_us"),
    )
    return totals.crossJoin(F.broadcast(pct)).select(
        "n_users", "n_viewers", "n_converted", "p50_us", "p90_us", "p99_us"
    )


@query(
    "q171_linear_attribution",
    oracle=f"""
    WITH touch AS (
        SELECT user_id, ts AS tts, event_type AS channel
        FROM events WHERE event_type IN ('view', 'click')
    ),
    pur AS (
        SELECT event_id, user_id, ts AS pts, CAST(ROUND(value * 100) AS BIGINT) AS cents
        FROM events WHERE event_type = 'purchase'
    ),
    pairs AS (
        SELECT p.event_id, p.cents, t.channel
        FROM pur p JOIN touch t
          ON p.user_id = t.user_id
         AND t.tts <= p.pts
         AND epoch_us(p.pts) - epoch_us(t.tts) <= {_ATTR_WINDOW_US}
    ),
    per_p AS (
        SELECT event_id, cents, channel, COUNT(*) AS cnt,
               CAST(SUM(COUNT(*)) OVER (PARTITION BY event_id) AS BIGINT) AS n_touch
        FROM pairs GROUP BY event_id, cents, channel
    )
    SELECT channel,
           CAST(SUM(CAST(ROUND(CAST(cnt AS DOUBLE) / n_touch, 9)
                         AS DECIMAL(28,9))) AS DOUBLE) AS credited_purchases,
           CAST(SUM(CAST(ROUND(cents * CAST(cnt AS DOUBLE) / n_touch / 100, 6)
                         AS DECIMAL(28,6))) AS DOUBLE) AS credited_revenue
    FROM per_p
    GROUP BY channel
    ORDER BY channel
    """,
    tags=("X-08", "J-10", "W-03"),
)
def q171_linear_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear multi-touch attribution: every purchase splits its credit
    (1 unit + its revenue) EQUALLY across all view/click touchpoints in
    the 3-day lookback — the even-handed counterpart of q152's
    winner-takes-all last-touch, and the first model a marketing team
    compares it against. Reports fractional purchases and revenue per
    channel.

    Determinism: per-(purchase, channel) credit terms are one IEEE
    division of exact integers rounded at 9/6 dp (the q120 precedent),
    then summed as exact decimal — order-independent despite the
    fractional weights.

    Scale shape: the purchase×touch pairing is an equi-join
    CO-PARTITIONED on user_id with the time bound as a join-level range
    predicate — fan-out is each user's own touches-within-3-days, never
    cross-user; the per-purchase touch total comes from a window over
    the per-purchase channel counts (a bounded <=2-channel relation per
    purchase), and the final rollup groups on the tiny channel key."""
    ev = load(spark, sf_dir, "events")
    touch = ev.filter(F.col("event_type").isin("view", "click")).select(
        F.col("user_id").alias("t_user"),
        F.col("ts").alias("tts"),
        F.col("event_type").alias("channel"),
    )
    pur = ev.filter(F.col("event_type") == "purchase").select(
        "event_id",
        "user_id",
        F.col("ts").alias("pts"),
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    pairs = pur.join(
        touch,
        (F.col("user_id") == F.col("t_user"))
        & (F.col("tts") <= F.col("pts"))
        & (F.unix_micros("pts") - F.unix_micros("tts") <= _ATTR_WINDOW_US),
    )
    per_p = pairs.groupBy("event_id", "cents", "channel").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    per_p = per_p.withColumn(
        "n_touch",
        F.sum("cnt").over(W.partitionBy("event_id")).cast("long"),
    )
    frac = F.col("cnt").cast("double") / F.col("n_touch")
    # parenthesized exactly as the oracle parses it — ((cents*cnt)/n)/100,
    # not cents*(cnt/n)/100; the associations differ in the last IEEE bits
    rev_term = F.col("cents") * F.col("cnt").cast("double") / F.col("n_touch") / 100
    return (
        per_p.groupBy("channel")
        .agg(
            F.sum(F.round(frac, 9).cast("decimal(28,9)"))
            .cast("double")
            .alias("credited_purchases"),
            F.sum(F.round(rev_term, 6).cast("decimal(28,6)"))
            .cast("double")
            .alias("credited_revenue"),
        )
        .transform(pin)
        .orderBy("channel")
    )


@query(
    "q186_session_paths",
    oracle=f"""
    WITH g AS (
        SELECT user_id, ts, event_id, event_type,
               CASE WHEN ts - LAG(ts) OVER (
                        PARTITION BY user_id ORDER BY ts, event_id
                    ) <= INTERVAL {_SESSION_GAP_MIN} MINUTE
                    THEN 0 ELSE 1 END AS new_session
        FROM events
    ),
    s AS (
        SELECT user_id, ts, event_id, event_type,
               SUM(new_session) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS session_idx
        FROM g
    ),
    paths AS (
        SELECT array_to_string(
                   (list(event_type ORDER BY ts, event_id))[1:3], '>'
               ) AS path
        FROM s GROUP BY user_id, session_idx
    )
    SELECT path, CAST(COUNT(*) AS BIGINT) AS n_sessions
    FROM paths GROUP BY path
    ORDER BY n_sessions DESC, path LIMIT 20
    """,
    tags=("X-08", "W-02", "A-11", "O-05"),
)
def q186_session_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top navigation paths: the first three event types of every
    30-minute-gap session (the q91 gaps-and-islands assignment), ranked
    by how many sessions follow each path — the "how do users actually
    move" product-analytics readout that the first-order q118 transition
    matrix cannot answer (it forgets everything before the previous
    step; a path keeps the ordered prefix).

    Scale shape: ONE shuffle on user_id drives the lag flag, the running
    session sum, and the per-session ordered collect (the per-session
    array is bounded by session length, and only its first 3 elements
    survive the slice); the path rollup is map-side combined on the
    bounded distinct-path relation and the final ranking is TakeOrdered
    top-20, never a global sort."""
    ev = load(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.expr(f"INTERVAL {_SESSION_GAP_MIN} MINUTES")
    g = ev.withColumn(
        "new_session",
        F.when(F.col("ts") - F.lag("ts").over(w) <= gap, 0).otherwise(1),
    )
    s = g.withColumn(
        "session_idx",
        F.sum("new_session").over(w.rowsBetween(W.unboundedPreceding, 0)),
    )
    paths = (
        s.groupBy("user_id", "session_idx")
        .agg(
            F.concat_ws(
                ">",
                F.transform(
                    F.slice(
                        F.array_sort(
                            F.collect_list(F.struct("ts", "event_id", "event_type"))
                        ),
                        1,
                        3,
                    ),
                    lambda x: x["event_type"],
                ),
            ).alias("path")
        )
    )
    return (
        paths.groupBy("path")
        .agg(F.count(F.lit(1)).cast("long").alias("n_sessions"))
        .orderBy(F.col("n_sessions").desc(), "path")
        .limit(20)
    )


@query(
    "q188_sketch_overlap",
    oracle="""
    WITH a AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'view'),
    b AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'),
    x AS (
        SELECT CAST((SELECT COUNT(*) FROM a) AS BIGINT) AS n_a,
               CAST((SELECT COUNT(*) FROM b) AS BIGINT) AS n_b,
               CAST((SELECT COUNT(*) FROM a JOIN b USING (user_id)) AS BIGINT)
                   AS overlap_exact,
               CAST((SELECT COUNT(DISTINCT user_id) FROM events
                     WHERE event_type IN ('view', 'purchase')) AS BIGINT)
                   AS union_exact
    )
    SELECT n_a, n_b, overlap_exact, union_exact,
           ROUND(CAST(overlap_exact AS DOUBLE) / union_exact, 6) AS jaccard,
           TRUE AS within_tol
    FROM x
    """,
    tags=("A-13", "A-04", "U-02"),
)
def q188_sketch_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audience-overlap via SKETCH ALGEBRA: how many users are in both
    the 'view' and the 'purchase' segment, estimated by
    inclusion-exclusion over mergeable HLL sketches
    (|A∩B| ~ |A| + |B| − |A∪B|, where |A∪B| is one register-max merge)
    — the cross-segment question ad/audience platforms answer from
    stored per-segment sketches WITHOUT rescanning raw events.  The
    hash-checked contract is the q90 pattern: exact sizes, exact
    overlap, exact Jaccard, plus an in-engine tolerance assertion that
    the sketch-estimated overlap lands within 5% of the exact union
    (inclusion-exclusion compounds ~1% per-sketch error; the tolerance
    is stated against the union, the estimator's natural scale).

    Scale shape: segment sketches build in ONE map-side-combined pass
    each (a few KB crosses the exchange); the union is a sketch merge,
    never a data union; the exact twins ride the same scans so the
    whole readout is one bounded single-row join."""
    ev = load(spark, sf_dir, "events")
    ska = ev.where(F.col("event_type") == "view").agg(
        F.hll_sketch_agg("user_id", 14).alias("sk_a"),
        F.count_distinct("user_id").cast("long").alias("n_a"),
    )
    skb = ev.where(F.col("event_type") == "purchase").agg(
        F.hll_sketch_agg("user_id", 14).alias("sk_b"),
        F.count_distinct("user_id").cast("long").alias("n_b"),
    )
    exact = (
        ev.where(F.col("event_type").isin("view", "purchase"))
        .groupBy("user_id")
        .agg(
            F.max(F.when(F.col("event_type") == "view", 1).otherwise(0)).alias("in_a"),
            F.max(F.when(F.col("event_type") == "purchase", 1).otherwise(0)).alias(
                "in_b"
            ),
        )
        .agg(
            F.sum(F.col("in_a") * F.col("in_b")).cast("long").alias("overlap_exact"),
            F.count(F.lit(1)).cast("long").alias("union_exact"),
        )
    )
    est_union = F.hll_sketch_estimate(
        F.hll_union("sk_a", "sk_b", allowDifferentLgConfigK=False)
    )
    return (
        ska.crossJoin(F.broadcast(skb))
        .crossJoin(F.broadcast(exact))
        .select(
            "n_a",
            "n_b",
            "overlap_exact",
            "union_exact",
            F.round(
                F.col("overlap_exact").cast("double") / F.col("union_exact"), 6
            ).alias("jaccard"),
            (
                F.abs(
                    (F.col("n_a") + F.col("n_b") - est_union)
                    - F.col("overlap_exact")
                )
                <= 0.05 * F.col("union_exact")
            ).alias("within_tol"),
        )
    )


# ---------------------------------------------------------------------------
# X-44: skyline / Pareto-frontier query
# ---------------------------------------------------------------------------

_SKY_BUCKET = 100  #: prefix-max bucket width over price cents ($1 bands)


@query(
    "q205_pareto_frontier",
    oracle="""
    WITH a AS (
        SELECT p_partkey, CAST(ROUND(p_retailprice * 100) AS BIGINT) AS pc, p_size
        FROM part
    )
    SELECT p_partkey, ROUND(CAST(pc AS DOUBLE) / 100, 2) AS price, p_size
    FROM a
    WHERE NOT EXISTS (
        SELECT 1 FROM a b
        WHERE b.pc <= a.pc AND b.p_size >= a.p_size
          AND (b.pc < a.pc OR b.p_size > a.p_size)
    )
    ORDER BY p_partkey
    """,
    tags=("X-44", "SQ-01"),
)
def q205_pareto_frontier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skyline (Pareto-frontier) query: the parts for which no other part
    is both cheaper-or-equal AND larger-or-equal with at least one
    strict — the classic multi-criteria shortlist ('show me every offer
    not strictly beaten on BOTH price and capacity') that no single
    ORDER BY can express. Ties on both axes survive together; the oracle
    states the textbook NOT EXISTS dominance directly, proving the
    rewrite below loses nothing.

    Scale shape: the quadratic dominance test REWRITES into a prefix
    max — a part survives iff its size equals the max at its exact
    price (same-price dominance) AND strictly exceeds the max size over
    all strictly-cheaper prices (cheaper dominance). The relation first
    collapses to DISTINCT price cents with per-price max size (bounded
    by the cents domain, not the table), the strictly-cheaper running
    max is the q84/q148/q174 two-level bucketed prefix scan over that
    bounded relation, and the bounded (price -> threshold) table
    BROADCASTS back onto the part scan for a map-only keep decision —
    the fact never self-joins and never reshuffles. All integers; no
    ties to adjudicate beyond the exact compares."""
    p = load(spark, sf_dir, "part").select(
        "p_partkey",
        F.round(F.col("p_retailprice") * 100).cast("long").alias("pc"),
        "p_size",
    )
    v = (
        p.groupBy("pc")
        .agg(F.max("p_size").alias("smax"))
        .withColumn("bucket", F.expr(f"pc DIV {_SKY_BUCKET}"))
        .transform(stage)  # bounded distinct-price relation, reused 3x
    )
    within = v.withColumn(
        "wmax",
        F.max("smax").over(
            W.partitionBy("bucket")
            .orderBy("pc")
            .rowsBetween(W.unboundedPreceding, -1)
        ),
    )
    bmax = v.groupBy("bucket").agg(F.max("smax").alias("bm"))
    offs = bmax.select(
        "bucket",
        F.max("bm")
        .over(W.orderBy("bucket").rowsBetween(W.unboundedPreceding, -1))
        .alias("om"),
    )
    thresh = within.join(F.broadcast(offs), "bucket").select(
        "pc",
        "smax",
        F.greatest(
            F.coalesce(F.col("wmax"), F.lit(-1)), F.coalesce(F.col("om"), F.lit(-1))
        ).alias("best_below"),
    )
    return (
        p.join(F.broadcast(thresh), "pc")
        .where((F.col("p_size") == F.col("smax")) & (F.col("p_size") > F.col("best_below")))
        .select(
            "p_partkey",
            F.round(F.col("pc").cast("double") / 100, 2).alias("price"),
            "p_size",
        )
        .transform(pin)
        .orderBy("p_partkey")
    )


# ---------------------------------------------------------------------------
# X-45: RFM customer segmentation
# ---------------------------------------------------------------------------

_RFM_PS = (0.2, 0.4, 0.6, 0.8)


def _rfm_oracle() -> str:
    def edges(metric: str) -> str:
        return ", ".join(
            f"quantile_cont({metric}, {p}) AS {metric[0]}e{int(p * 100)}"
            for p in _RFM_PS
        )

    def bucket(metric: str) -> str:
        return " + ".join(
            [f"1"]
            + [
                f"CASE WHEN {metric} > {metric[0]}e{int(p * 100)} THEN 1 ELSE 0 END"
                for p in _RFM_PS
            ]
        )

    return f"""
    WITH cust AS (
        SELECT o_custkey,
               CAST(COUNT(*) AS BIGINT) AS freq,
               CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS mon,
               MAX(CAST(o_orderdate AS DATE)) AS last_day
        FROM orders GROUP BY o_custkey
    ),
    ref AS (SELECT MAX(last_day) AS ref_day FROM cust),
    rfm AS (
        SELECT o_custkey, freq, mon,
               CAST(date_diff('day', last_day, ref_day) AS BIGINT) AS rec
        FROM cust CROSS JOIN ref
    ),
    e AS (
        SELECT {edges("rec")}, {edges("freq")}, {edges("mon")} FROM rfm
    ),
    scored AS (
        SELECT CAST(6 - ({bucket("rec")}) AS INT) AS r_score,
               CAST({bucket("freq")} AS INT) AS f_score,
               CAST({bucket("mon")} AS INT) AS m_score,
               mon
        FROM rfm CROSS JOIN e
    )
    SELECT r_score, f_score, m_score,
           CAST(COUNT(*) AS BIGINT) AS n_customers,
           ROUND(CAST(SUM(mon) AS DOUBLE) / 100, 2) AS monetary_total
    FROM scored GROUP BY r_score, f_score, m_score
    ORDER BY r_score, f_score, m_score
    """


@query("q211_rfm_segmentation", oracle=_rfm_oracle(), tags=("X-45", "A-12"))
def q211_rfm_segmentation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation — the classic CRM grid: per customer, Recency
    (days since last order, scored 5 = most recent), Frequency (order
    count) and Monetary (exact-cents lifetime revenue) each bucketed
    into corpus quintiles, customers rolled up by (R, F, M) cell. The
    '555 champions / 111 lost' readout every lifecycle-marketing and
    churn playbook keys off; the quintile edges reuse the A-12 exact
    percentile path proven bit-equal to DuckDB's quantile_cont (q75).

    Determinism: recency/frequency/monetary are exact integers; the
    interpolated quintile edges are IEEE-identical in both engines
    (q75); each score is 1 + a count of exact 'value > edge' compares
    (integers vs bit-identical doubles), so no boundary can flake.

    Scale shape: ONE customer-keyed rollup reduces the fact; the
    reference day and the 12 quintile edges are single-row aggregates
    over that relation CROSS-broadcast back; scoring is map-only; the
    final rollup is map-side combined onto the <=125-cell grid."""
    cust = (
        load(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).cast("long").alias("freq"),
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
            .cast("long")
            .alias("mon"),
            F.max(F.col("o_orderdate").cast("date")).alias("last_day"),
        )
    )
    ref = cust.agg(F.max("last_day").alias("ref_day"))
    rfm = (
        cust.crossJoin(F.broadcast(ref))
        .select(
            "freq",
            "mon",
            F.datediff(F.col("ref_day"), F.col("last_day")).cast("long").alias("rec"),
        )
        .transform(stage)  # feeds the edge agg AND the scoring pass
    )
    e = rfm.agg(
        *[
            F.expr(f"percentile({m}, {p})").alias(f"{m[0]}e{int(p * 100)}")
            for m in ("rec", "freq", "mon")
            for p in _RFM_PS
        ]
    )

    def bucket(metric: str):
        s = F.lit(1)
        for p in _RFM_PS:
            s = s + (F.col(metric) > F.col(f"{metric[0]}e{int(p * 100)}")).cast("int")
        return s

    scored = rfm.crossJoin(F.broadcast(e)).select(
        (6 - bucket("rec")).cast("int").alias("r_score"),
        bucket("freq").cast("int").alias("f_score"),
        bucket("mon").cast("int").alias("m_score"),
        "mon",
    )
    return (
        scored.groupBy("r_score", "f_score", "m_score")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_customers"),
            F.round(F.sum("mon").cast("double") / 100, 2).alias("monetary_total"),
        )
        .transform(pin)
        .orderBy("r_score", "f_score", "m_score")
    )


# ---------------------------------------------------------------------------
# X-08 (cont.): time-decay attribution (completes the last-touch / linear /
# time-decay model trio)
# ---------------------------------------------------------------------------

#: integer decay weights by touch age in days (0.5 half-life per day,
#: scaled 2^(window_days-1) so every weight is an exact integer)
_DECAY_W = {0: 4, 1: 2, 2: 1}


@query(
    "q212_time_decay_attribution",
    oracle=f"""
    WITH touch AS (
        SELECT user_id, ts AS tts, event_type AS channel
        FROM events WHERE event_type IN ('view', 'click')
    ),
    pur AS (
        SELECT event_id, user_id, ts AS pts, CAST(ROUND(value * 100) AS BIGINT) AS cents
        FROM events WHERE event_type = 'purchase'
    ),
    pairs AS (
        SELECT p.event_id, p.cents, t.channel,
               CASE (epoch_us(p.pts) - epoch_us(t.tts)) // {86_400 * 1_000_000}
                    WHEN 0 THEN {_DECAY_W[0]} WHEN 1 THEN {_DECAY_W[1]}
                    ELSE {_DECAY_W[2]} END AS iw
        FROM pur p JOIN touch t
          ON p.user_id = t.user_id
         AND t.tts <= p.pts
         AND epoch_us(p.pts) - epoch_us(t.tts) <= {3 * 86_400 * 1_000_000}
    ),
    per_p AS (
        SELECT event_id, cents, channel, CAST(SUM(iw) AS BIGINT) AS cw,
               CAST(SUM(SUM(iw)) OVER (PARTITION BY event_id) AS BIGINT) AS tw
        FROM pairs GROUP BY event_id, cents, channel
    )
    SELECT channel,
           CAST(SUM(CAST(ROUND(CAST(cw AS DOUBLE) / tw, 9)
                         AS DECIMAL(28,9))) AS DOUBLE) AS credited_purchases,
           CAST(SUM(CAST(ROUND(cents * CAST(cw AS DOUBLE) / tw / 100, 6)
                         AS DECIMAL(28,6))) AS DOUBLE) AS credited_revenue
    FROM per_p
    GROUP BY channel
    ORDER BY channel
    """,
    tags=("X-08", "W-03"),
)
def q212_time_decay_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-decay multi-touch attribution: purchases split credit across
    their 3-day view/click touchpoints with a one-day half-life — a
    touch from today counts 4, yesterday 2, two days ago 1 — completing
    the attribution trio with q152 (last-touch, winner-takes-all) and
    q171 (linear, even split). The decay weights are exact INTEGERS
    (0.5^age scaled by 2^(window-1)), so per-purchase shares are ratios
    of exact integers divided once and rounded 9/6 dp (the q171
    discipline), then decimal-summed order-independently.

    Scale shape: identical to q171 — the purchase×touch pairing is an
    equi-join CO-PARTITIONED on user_id with the time bound as a range
    predicate (fan-out bounded by each user's own 3-day touches), the
    per-purchase weight total is a window over the bounded per-purchase
    channel relation, and the final rollup groups on the channel key."""
    ev = load(spark, sf_dir, "events")
    touch = ev.filter(F.col("event_type").isin("view", "click")).select(
        F.col("user_id").alias("t_user"),
        F.col("ts").alias("tts"),
        F.col("event_type").alias("channel"),
    )
    pur = ev.filter(F.col("event_type") == "purchase").select(
        "event_id",
        "user_id",
        F.col("ts").alias("pts"),
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    age_days = F.expr(
        f"(unix_micros(pts) - unix_micros(tts)) DIV {86_400 * 1_000_000}"
    )
    iw = (
        F.when(age_days == 0, _DECAY_W[0])
        .when(age_days == 1, _DECAY_W[1])
        .otherwise(_DECAY_W[2])
    )
    pairs = pur.join(
        touch,
        (F.col("user_id") == F.col("t_user"))
        & (F.col("tts") <= F.col("pts"))
        & (F.unix_micros("pts") - F.unix_micros("tts") <= 3 * 86_400 * 1_000_000),
    ).select("event_id", "cents", "channel", iw.alias("iw"))
    per_p = pairs.groupBy("event_id", "cents", "channel").agg(
        F.sum("iw").cast("long").alias("cw")
    )
    per_p = per_p.withColumn(
        "tw", F.sum("cw").over(W.partitionBy("event_id")).cast("long")
    )
    frac = F.col("cw").cast("double") / F.col("tw")
    # revenue term parenthesized exactly as the oracle parses it —
    # ((cents * cw) / tw) / 100, not cents * (cw / tw) / 100; the two
    # associations differ in the last IEEE bits and can flip a 6-dp round
    rev_term = F.col("cents") * F.col("cw").cast("double") / F.col("tw") / 100
    return (
        per_p.groupBy("channel")
        .agg(
            F.sum(F.round(frac, 9).cast("decimal(28,9)"))
            .cast("double")
            .alias("credited_purchases"),
            F.sum(F.round(rev_term, 6).cast("decimal(28,6)"))
            .cast("double")
            .alias("credited_revenue"),
        )
        .transform(pin)
        .orderBy("channel")
    )


# ---------------------------------------------------------------------------
# X-08 (cont.): cohort lifetime-value (LTV) curve
# ---------------------------------------------------------------------------


@query(
    "q214_cohort_ltv",
    oracle="""
    WITH first_wk AS (
        SELECT o_custkey, date_trunc('week', MIN(CAST(o_orderdate AS DATE))) AS cohort
        FROM orders GROUP BY o_custkey
    ),
    sizes AS (
        SELECT cohort, CAST(COUNT(*) AS BIGINT) AS cohort_size
        FROM first_wk GROUP BY cohort
    ),
    rev AS (
        SELECT f.cohort,
               CAST(date_diff('day', f.cohort, date_trunc('week', CAST(o.o_orderdate AS DATE)))
                    AS BIGINT) // 7 AS offset_w,
               CAST(SUM(CAST(ROUND(o.o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
        FROM orders o JOIN first_wk f ON o.o_custkey = f.o_custkey
        GROUP BY 1, 2
    )
    SELECT CAST(r.cohort AS DATE) AS cohort_week, r.offset_w, s.cohort_size,
           ROUND(CAST(CAST(SUM(r.cents) OVER (
                     PARTITION BY r.cohort ORDER BY r.offset_w
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                 ) AS BIGINT) AS DOUBLE) / 100, 2) AS cum_revenue,
           CAST((CAST(SUM(r.cents) OVER (
                     PARTITION BY r.cohort ORDER BY r.offset_w
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                 ) AS BIGINT) * 1000000) // s.cohort_size AS DOUBLE) / 100000000
               AS ltv
    FROM rev r JOIN sizes s ON r.cohort = s.cohort
    ORDER BY cohort_week, offset_w
    """,
    tags=("X-08", "W-03", "A-06"),
)
def q214_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort lifetime-value curve: customers grouped by first-order week,
    and each cohort's CUMULATIVE revenue per week-offset divided by
    cohort size — the money counterpart of q87's presence-only retention
    matrix, and the curve payback-period / CAC decisions actually read
    ('week-0 cohorts reach $X per customer by week N'). Revenue is exact
    cents end-to-end; the two divisions happen once, on bit-identical
    operands.

    Scale shape: ONE customer rollup finds cohorts; the fact joins its
    own per-customer cohort co-partitioned on the customer key and
    reduces map-side onto the CALENDAR-bounded (cohort x offset)
    relation — the cumulative window and the size join run there, not
    on orders (the q179/q209 bounded-relation window precedent)."""
    orders = load(spark, sf_dir, "orders")
    first_wk = orders.groupBy("o_custkey").agg(
        F.date_trunc("week", F.min(F.col("o_orderdate").cast("date"))).alias("cohort")
    )
    sizes = first_wk.groupBy("cohort").agg(
        F.count(F.lit(1)).cast("long").alias("cohort_size")
    )
    rev = (
        orders.join(first_wk, "o_custkey")
        .groupBy(
            "cohort",
            F.expr(
                "CAST(datediff(date_trunc('week', CAST(o_orderdate AS DATE)), cohort)"
                " AS BIGINT) DIV 7"
            ).alias("offset_w"),
        )
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
            .cast("long")
            .alias("cents")
        )
    )
    wc = (
        W.partitionBy("cohort")
        .orderBy("offset_w")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    cum = rev.withColumn("cum_cents", F.sum("cents").over(wc).cast("long"))
    return (
        cum.join(F.broadcast(sizes), "cohort")
        .select(
            # date->timestamp for the comparison harness (the q87 precedent:
            # DuckDB DATE lands in pandas as datetime64)
            F.col("cohort").cast("timestamp").alias("cohort_week"),
            "offset_w",
            "cohort_size",
            F.round(F.col("cum_cents").cast("double") / 100, 2).alias("cum_revenue"),
            # micro-cents-per-customer as an exact integer floor-div, then one
            # exact-operand double division — ROUND here would flake on the
            # representable .5 ties that /cohort_size (often a power of two)
            # creates at the 6th decimal (Spark rounds the shortest repr,
            # DuckDB the true binary value)
            (
                F.expr("(cum_cents * 1000000) DIV cohort_size").cast("double")
                / 100_000_000
            ).alias("ltv"),
        )
        .transform(pin)
        .orderBy("cohort_week", "offset_w")
    )


# ---------------------------------------------------------------------------
# X-08 (cont.): consecutive-day activity streaks (gaps-and-islands on days)
# ---------------------------------------------------------------------------


@query(
    "q226_activity_streaks",
    oracle="""
    WITH days AS (
        SELECT DISTINCT user_id, date_trunc('day', ts) AS day FROM events
    ),
    isl AS (
        SELECT user_id, day,
               day - INTERVAL 1 DAY * ROW_NUMBER() OVER (
                   PARTITION BY user_id ORDER BY day
               ) AS island
        FROM days
    ),
    runs AS (
        SELECT user_id, island, CAST(COUNT(*) AS BIGINT) AS run_len
        FROM isl GROUP BY user_id, island
    )
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_streaks,
           CAST(MAX(run_len) AS BIGINT) AS longest_streak,
           CAST(SUM(run_len) AS BIGINT) AS active_days
    FROM runs GROUP BY user_id ORDER BY user_id
    """,
    tags=("X-08", "W-01"),
)
def q226_activity_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Consecutive-day activity streaks per user — longest run, streak
    count, total active days — via the classic gaps-and-islands
    rank-difference trick: within a user, day minus row_number-days is
    CONSTANT exactly along a consecutive run, so one subtraction turns
    streaks into group keys and no self-join or iterative chaining ever
    happens. The day-granular engagement metric (Duolingo-style streaks,
    SLA uptime runs) that q91's timestamp-gap sessionization doesn't
    give.

    Scale shape: the fact reduces to DISTINCT (user, day) in one
    map-side-combined rollup; ONE user-keyed window pass assigns island
    keys; both the run rollup and the per-user summary ride the same
    user-keyed shuffle (co-partitioned). All integers and dates — no
    tie-break subtleties (day is unique per user after the distinct)."""
    ev = load(spark, sf_dir, "events")
    days = ev.select(
        "user_id", F.date_trunc("day", F.col("ts")).alias("day")
    ).distinct()
    rn = F.row_number().over(W.partitionBy("user_id").orderBy("day"))
    isl = days.select(
        "user_id",
        "day",
        (F.col("day") - F.expr("INTERVAL 1 DAY") * rn).alias("island"),
    )
    runs = isl.groupBy("user_id", "island").agg(
        F.count(F.lit(1)).cast("long").alias("run_len")
    )
    return (
        runs.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_streaks"),
            F.max("run_len").cast("long").alias("longest_streak"),
            F.sum("run_len").cast("long").alias("active_days"),
        )
        .transform(pin)
        .orderBy("user_id")
    )


# ---------------------------------------------------------------------------
# X-08 (cont.): bitmap-index day-over-day retention (bitset AND + popcount)
# ---------------------------------------------------------------------------

_BM_BITS = 63  #: user bits per bucket word (staying under the int64 sign bit)


@query(
    "q227_bitmap_retention",
    oracle=f"""
    WITH bm AS (
        SELECT date_trunc('day', ts) AS day,
               user_id // {_BM_BITS} AS bucket,
               CAST(bit_or(CAST(1 AS BIGINT) << CAST(user_id % {_BM_BITS} AS INT))
                    AS BIGINT) AS w
        FROM events
        GROUP BY date_trunc('day', ts), user_id // {_BM_BITS}
    ),
    pairs AS (
        SELECT a.day AS day, b.day AS next_day, a.bucket,
               a.w AS wa, b.w AS wb
        FROM bm a
        JOIN bm b ON b.bucket = a.bucket AND b.day = a.day + INTERVAL 1 DAY
    )
    SELECT day, next_day,
           CAST(SUM(bit_count(wa & wb)) AS BIGINT) AS retained
    FROM pairs
    GROUP BY day, next_day ORDER BY day
    """,
    tags=("X-08", "A-14", "A-13"),
)
def q227_bitmap_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-over-day retained-user counts by BITMAP algebra: each day's
    active-user set compresses into int64 words (user bit = id mod 63,
    word = id div 63), and 'retained tomorrow' is popcount(today AND
    tomorrow) summed over words — the roaring-bitmap/bitset technique
    engagement warehouses use so set intersections cost bitwise ops on
    |users|/63 words instead of a distinct self-join of the fact. The
    bitmap equals the user set exactly (no sketch error), words OR
    together across shards/days (A-14 mergeability for free), and any
    boolean set combination (AND/OR/ANDNOT for churned/new/resurrected)
    reuses the same words without touching events again.
    tests/test_round5_properties.py::test_bitmap_retention_equals_set_intersection
    pins the semantics to the naive distinct-join.

    Scale shape: ONE map-side-combined rollup builds the (day, word)
    bitmap relation — bounded by days x users/63, thousands of times
    smaller than the fact; the day-pair join is co-keyed on the word
    bucket; everything downstream is bitwise integer ops. No sign-bit
    hazard: bits stay in [0, 62]."""
    ev = load(spark, sf_dir, "events")
    bm = ev.groupBy(
        F.date_trunc("day", F.col("ts")).alias("day"),
        F.expr(f"user_id DIV {_BM_BITS}").alias("bucket"),
    ).agg(
        F.expr(
            f"bit_or(shiftleft(CAST(1 AS BIGINT), CAST(user_id % {_BM_BITS} AS INT)))"
        )
        .cast("long")
        .alias("w")
    )
    a = bm.select("day", "bucket", F.col("w").alias("wa"))
    b = bm.select(
        (F.col("day") - F.expr("INTERVAL 1 DAY")).alias("day"),
        "bucket",
        F.col("w").alias("wb"),
    )
    pairs = a.join(b, ["day", "bucket"]).select(
        "day",
        (F.col("day") + F.expr("INTERVAL 1 DAY")).alias("next_day"),
        F.bit_count(F.expr("wa & wb")).alias("pc"),
    )
    return (
        pairs.groupBy("day", "next_day")
        .agg(F.sum("pc").cast("long").alias("retained"))
        .transform(pin)
        .orderBy("day")
    )


# ---------------------------------------------------------------------------
# X-08 (cont.): funnel conversion by experiment arm
# ---------------------------------------------------------------------------

#: md5-nibble arm assignment (the X-16 hash-split idiom): nibble < 8 -> 'A'
_ARM_NIBBLE = "instr('0123456789abcdef', substr(md5(cast(user_id as {t})), 1, 1)) - 1"


@query(
    "q229_funnel_by_arm",
    oracle=f"""
    WITH e AS (
        SELECT user_id, event_id, event_type, ts,
               MAX(CASE WHEN event_type = 'view' THEN ts END) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
               ) AS last_view
        FROM events
    ),
    c AS (
        SELECT user_id, event_type, ts, last_view,
               MAX(CASE WHEN event_type = 'click'
                         AND last_view IS NOT NULL
                         AND ts - last_view <= INTERVAL {_FUNNEL_GAP_MIN} MINUTE
                        THEN ts END) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
               ) AS last_qclick
        FROM e
    ),
    per_user AS (
        SELECT user_id,
               CASE WHEN {_ARM_NIBBLE.format(t="VARCHAR")} < 8
                    THEN 'A' ELSE 'B' END AS arm,
               MAX(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS s1,
               MAX(CASE WHEN event_type = 'click' AND last_view IS NOT NULL
                         AND ts - last_view <= INTERVAL {_FUNNEL_GAP_MIN} MINUTE
                        THEN 1 ELSE 0 END) AS s2,
               MAX(CASE WHEN event_type = 'purchase' AND last_qclick IS NOT NULL
                         AND ts - last_qclick <= INTERVAL {_FUNNEL_GAP_MIN} MINUTE
                        THEN 1 ELSE 0 END) AS s3
        FROM c GROUP BY user_id
    ),
    arms AS (
        SELECT arm, CAST(COUNT(*) AS BIGINT) AS n_users,
               CAST(SUM(s1) AS BIGINT) AS n1,
               CAST(SUM(s2) AS BIGINT) AS n2,
               CAST(SUM(s3) AS BIGINT) AS n3
        FROM per_user GROUP BY arm
    )
    SELECT arm, step, step_name, n_users, n_step,
           ROUND(CAST(n_step AS DOUBLE) / n_users, 6) AS rate
    FROM (
        SELECT arm, 1 AS step, 'view' AS step_name, n_users, n1 AS n_step FROM arms
        UNION ALL
        SELECT arm, 2, 'click_after_view', n_users, n2 FROM arms
        UNION ALL
        SELECT arm, 3, 'purchase_after_click', n_users, n3 FROM arms
    )
    ORDER BY arm, step
    """,
    tags=("X-08", "X-23"),
)
def q229_funnel_by_arm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Funnel conversion SPLIT BY EXPERIMENT ARM: q86's windowed
    view->click->purchase funnel computed per deterministic hash-split
    arm (the X-16 md5-nibble assignment, A/B at 8/8 nibbles) — the
    experiment readout that says WHERE in the funnel a treatment moved
    users, which q169's single conversion flag cannot localize. Rates
    divide exact integers once, round 6.

    Scale shape: the q86 single-window-scan funnel core is unchanged
    (one user-keyed shuffle, running-MAX state); arm assignment is
    map-only hash; the arm rollup is map-side combined onto 2 rows and
    the per-step report explodes from them."""
    ev = load(spark, sf_dir, "events")
    per_user = funnel_per_user(ev)
    arm = F.when(
        F.expr(_ARM_NIBBLE.format(t="string")) < 8, F.lit("A")
    ).otherwise("B")
    arms = (
        per_user.withColumn("arm", arm)
        .groupBy("arm")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_users"),
            F.sum("s1").cast("long").alias("n1"),
            F.sum("s2").cast("long").alias("n2"),
            F.sum("s3").cast("long").alias("n3"),
        )
    )
    steps = [
        (1, "view", "n1"),
        (2, "click_after_view", "n2"),
        (3, "purchase_after_click", "n3"),
    ]
    rows = arms.select(
        "arm",
        "n_users",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(s).alias("step"),
                        F.lit(name).alias("step_name"),
                        F.col(c).alias("n_step"),
                    )
                    for s, name, c in steps
                ]
            )
        ).alias("r"),
    ).select("arm", "r.step", "r.step_name", "n_users", "r.n_step")
    return (
        rows.select(
            "arm",
            "step",
            "step_name",
            "n_users",
            "n_step",
            F.round(F.col("n_step").cast("double") / F.col("n_users"), 6).alias("rate"),
        )
        .transform(pin)
        .orderBy("arm", "step")
    )


# ---------------------------------------------------------------------------
# X-08 (cont.): inter-purchase interval distribution
# ---------------------------------------------------------------------------


@query(
    "q242_purchase_intervals",
    oracle="""
    WITH p AS (
        SELECT user_id, ts, event_id,
               LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
        FROM events WHERE event_type = 'purchase'
    ),
    gaps AS (
        SELECT user_id,
               CAST(epoch_us(ts) - epoch_us(prev_ts) AS BIGINT) AS gap_us
        FROM p WHERE prev_ts IS NOT NULL
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_intervals,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_repeat_buyers,
           ROUND(quantile_cont(gap_us, 0.5) / 3600000000.0, 6) AS p50_hours,
           ROUND(quantile_cont(gap_us, 0.9) / 3600000000.0, 6) AS p90_hours,
           ROUND(CAST(MIN(gap_us) AS DOUBLE) / 3600000000.0, 6) AS min_hours,
           ROUND(CAST(MAX(gap_us) AS DOUBLE) / 3600000000.0, 6) AS max_hours
    FROM gaps
    """,
    tags=("X-08", "W-02", "A-12"),
)
def q242_purchase_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-purchase interval distribution: per repeat buyer, the gaps
    between consecutive purchases (exact integer microseconds from ONE
    user-keyed lag pass), summarized with exact percentiles in hours —
    the repurchase-cadence number that calibrates churn definitions
    ('inactive' should mean several p50s, not a guess) and the offset
    the q198 label windows should match. The purchase-only complement
    of q91's all-event sessionization gaps.

    Determinism: gaps are exact integers; percentiles ride the proven
    A-12 interpolation; the /3.6e9 hour conversions divide exact
    operands identically in both engines, round 6.

    Scale shape: the fact prunes to purchases at the scan (predicate
    pushdown), ONE window pass per user ordered by the tie-broken total
    order, then a single ungrouped percentile agg — one row out."""
    ev = load(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    gaps = (
        ev.select("user_id", "ts", "event_id")
        .withColumn("prev_ts", F.lag("ts").over(w))
        .filter(F.col("prev_ts").isNotNull())
        .select(
            "user_id",
            (F.unix_micros("ts") - F.unix_micros("prev_ts")).alias("gap_us"),
        )
    )
    hours = 3_600_000_000.0
    return gaps.agg(
        F.count(F.lit(1)).cast("long").alias("n_intervals"),
        F.count_distinct("user_id").cast("long").alias("n_repeat_buyers"),
        F.round(F.expr("percentile(gap_us, 0.5)") / hours, 6).alias("p50_hours"),
        F.round(F.expr("percentile(gap_us, 0.9)") / hours, 6).alias("p90_hours"),
        F.round(F.min("gap_us").cast("double") / hours, 6).alias("min_hours"),
        F.round(F.max("gap_us").cast("double") / hours, 6).alias("max_hours"),
    )


# ---------------------------------------------------------------------------
# X-70: monthly price index (Laspeyres / Paasche / Fisher)
# ---------------------------------------------------------------------------

_PIDX_ORACLE = """
    WITH pm AS (
        SELECT CAST(date_part('year', l_shipdate) * 100
                    + date_part('month', l_shipdate) AS BIGINT) AS ym,
               l_partkey,
               CAST(SUM(CAST(FLOOR(l_quantity + 0.5) AS BIGINT)) AS BIGINT) AS qty,
               CAST(SUM(CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT))
                    AS BIGINT) AS rev_cents
        FROM lineitem GROUP BY 1, 2
    ),
    up AS (SELECT ym, l_partkey, qty,
                  rev_cents * 1000000 // qty AS up_micro
           FROM pm),
    base AS (SELECT l_partkey, qty AS q0, up_micro AS up0
             FROM up WHERE ym = (SELECT MIN(ym) FROM up)),
    terms AS (
        SELECT up.ym,
               CAST(COUNT(*) AS BIGINT) AS n_items,
               CAST(SUM(CAST(up.up_micro AS DECIMAL(19,0)) * base.q0)
                    AS DECIMAL(38,0)) AS l_num,
               CAST(SUM(CAST(base.up0 AS DECIMAL(19,0)) * base.q0)
                    AS DECIMAL(38,0)) AS l_den,
               CAST(SUM(CAST(up.up_micro AS DECIMAL(19,0)) * up.qty)
                    AS DECIMAL(38,0)) AS p_num,
               CAST(SUM(CAST(base.up0 AS DECIMAL(19,0)) * up.qty)
                    AS DECIMAL(38,0)) AS p_den
        FROM up JOIN base USING (l_partkey)
        GROUP BY 1
    ),
    idx AS (
        SELECT ym, n_items,
               ROUND(CAST(l_num AS DOUBLE) / CAST(l_den AS DOUBLE), 6) AS laspeyres,
               ROUND(CAST(p_num AS DOUBLE) / CAST(p_den AS DOUBLE), 6) AS paasche
        FROM terms
    )
    SELECT ym, n_items, laspeyres, paasche,
           ROUND(sqrt(laspeyres * paasche), 6) AS fisher
    FROM idx
    ORDER BY ym
"""


@query("q266_price_index", oracle=_PIDX_ORACLE, tags=("X-70", "A-01", "J-02"))
def q266_price_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monthly price-index series vs the first shipping month:
    Laspeyres (base-quantity weights, sum p_t*q_0 / sum p_0*q_0),
    Paasche (current-quantity weights), and Fisher (their geometric
    mean — the superlative index statistical agencies publish) over the
    common basket of parts shipped in both months — the inflation /
    price-drift readout a pricing team runs on transaction data, and a
    weighted-ratio shape (two paired weighted sums per group) no earlier
    query exercises.

    Determinism: per-(month, part) unit prices are exact integer
    micro-cents (floor-div of exact cents by exact integer quantity, the
    q263 micro-rate idiom); all four index terms accumulate as exact
    decimal integer products; Laspeyres/Paasche divide bit-identical
    operands once and round 6 dp; Fisher is one IEEE sqrt on the product
    of the ROUNDED pair.

    Scale shape: ONE map-side-combined fact rollup reduces lineitem to
    the dimension-scale (month, part) relation; the base-month slice
    broadcasts into the basket join keyed by part; the per-month term
    aggregate is map-side combined onto the bounded month grid."""
    pm = (
        load(spark, sf_dir, "lineitem")
        .groupBy(
            (F.year("l_shipdate") * 100 + F.month("l_shipdate"))
            .cast("long")
            .alias("ym"),
            "l_partkey",
        )
        .agg(
            F.sum(F.floor(F.col("l_quantity") + 0.5).cast("long"))
            .cast("long")
            .alias("qty"),
            F.sum(F.floor(F.col("l_extendedprice") * 100 + 0.5).cast("long"))
            .cast("long")
            .alias("rev_cents"),
        )
        .withColumn("up_micro", F.expr("rev_cents * 1000000 DIV qty"))
        .transform(stage)  # base slice + the basket join both read it
    )
    base_ym = pm.agg(F.min("ym").alias("b"))
    base = (
        pm.join(F.broadcast(base_ym), pm.ym == F.col("b"))
        .select("l_partkey", F.col("qty").alias("q0"), F.col("up_micro").alias("up0"))
    )
    d19 = "decimal(19,0)"
    terms = (
        pm.join(F.broadcast(base), "l_partkey")
        .groupBy("ym")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_items"),
            F.sum(F.col("up_micro").cast(d19) * F.col("q0"))
            .cast("decimal(38,0)")
            .alias("l_num"),
            F.sum(F.col("up0").cast(d19) * F.col("q0"))
            .cast("decimal(38,0)")
            .alias("l_den"),
            F.sum(F.col("up_micro").cast(d19) * F.col("qty"))
            .cast("decimal(38,0)")
            .alias("p_num"),
            F.sum(F.col("up0").cast(d19) * F.col("qty"))
            .cast("decimal(38,0)")
            .alias("p_den"),
        )
    )
    idx = terms.select(
        "ym",
        "n_items",
        F.round(F.col("l_num").cast("double") / F.col("l_den").cast("double"), 6).alias(
            "laspeyres"
        ),
        F.round(F.col("p_num").cast("double") / F.col("p_den").cast("double"), 6).alias(
            "paasche"
        ),
    )
    return (
        idx.select(
            "ym",
            "n_items",
            "laspeyres",
            "paasche",
            F.round(F.sqrt(F.col("laspeyres") * F.col("paasche")), 6).alias("fisher"),
        )
        .transform(pin)
        .orderBy("ym")
    )


# ---------------------------------------------------------------------------
# X-77: Markov removal-effect attribution (absorbing-chain, unrolled)
# ---------------------------------------------------------------------------

_MKA_ITERS = 8  #: absorption-probability iterations (geometric convergence)
_MKA_CHANNELS = ("click", "error", "signup", "view")  #: non-conversion types


def _mka_oracle() -> str:
    scen_sel = " UNION ALL ".join(
        ["SELECT 'FULL' AS scenario"]
        + [f"SELECT '{c}'" for c in _MKA_CHANNELS]
    )
    prev = "p0"
    iters = ""
    for i in range(1, _MKA_ITERS + 1):
        iters += f""",
    p{i} AS (
        SELECT e.scenario, e.src AS state,
               CAST(SUM(CAST(ROUND(e.n * (CASE WHEN e.dst = 'CONV' THEN 1.0
                                               WHEN e.dst = 'NULLSTATE' THEN 0.0
                                               ELSE COALESCE(pp.p, 0.0) END)
                                   / e.rt, 12) AS DECIMAL(28,12)))
                    AS DOUBLE) AS p
        FROM sedges e
        LEFT JOIN {prev} pp ON pp.scenario = e.scenario AND pp.state = e.dst
        GROUP BY 1, 2
    )"""
        prev = f"p{i}"
    return f"""
    WITH seq AS (
        SELECT user_id, event_type, ts, event_id,
               COALESCE(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                   OVER (PARTITION BY user_id ORDER BY ts, event_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                   AS prior_p
        FROM events
    ),
    kept AS (SELECT user_id, event_type, ts, event_id
             FROM seq WHERE prior_p = 0),
    trans0 AS (
        SELECT COALESCE(LAG(event_type) OVER (PARTITION BY user_id
                                              ORDER BY ts, event_id),
                        'START') AS src,
               CASE WHEN event_type = 'purchase' THEN 'CONV'
                    ELSE event_type END AS dst,
               ROW_NUMBER() OVER (PARTITION BY user_id
                                  ORDER BY ts DESC, event_id DESC) AS rn_last,
               event_type
        FROM kept
    ),
    edges AS (
        SELECT src, dst FROM trans0
        UNION ALL
        SELECT event_type, 'NULLSTATE' FROM trans0
        WHERE rn_last = 1 AND event_type <> 'purchase'
    ),
    counts AS (SELECT src, dst, CAST(COUNT(*) AS BIGINT) AS n
               FROM edges GROUP BY 1, 2),
    tot AS (SELECT src, CAST(SUM(n) AS BIGINT) AS rt FROM counts GROUP BY 1),
    scen AS ({scen_sel}),
    sedges AS (
        SELECT s.scenario, c.src, c.dst, c.n, t.rt
        FROM counts c JOIN tot t USING (src) CROSS JOIN scen s
        WHERE s.scenario = 'FULL'
           OR (c.src <> s.scenario AND c.dst <> s.scenario)
    ),
    p0 AS (SELECT DISTINCT scenario, src AS state, 0.0 AS p FROM sedges){iters},
    readout AS (
        SELECT (SELECT p FROM {prev}
                WHERE scenario = 'FULL' AND state = 'START') AS p_full
    ),
    re AS (
        SELECT ch.c AS channel, p_full,
               COALESCE((SELECT p FROM {prev}
                         WHERE scenario = ch.c AND state = 'START'), 0.0)
                   AS p_removed
        FROM (SELECT UNNEST(['{"','".join(_MKA_CHANNELS)}']) AS c) ch
        CROSS JOIN readout
    ),
    eff AS (
        SELECT channel, p_full, p_removed,
               ROUND(1.0 - p_removed / p_full, 6) AS removal_effect
        FROM re
    )
    SELECT channel,
           ROUND(p_full, 6) AS p_conversion,
           ROUND(p_removed, 6) AS p_without_channel,
           removal_effect,
           ROUND(removal_effect
                 / SUM(removal_effect) OVER (), 6) AS attribution_share
    FROM eff
    ORDER BY channel
    """


@query("q273_markov_attribution", oracle=_mka_oracle(), tags=("X-77", "X-13", "W-02"))
def q273_markov_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Markov removal-effect attribution: model each user's journey to
    first purchase as an absorbing Markov chain (START -> channel
    states -> CONV / NULL), compute the chain's conversion probability
    by {_MKA_ITERS} unrolled absorption iterations, then re-run it with
    each channel REMOVED (its mass redirected to NULL) — a channel's
    attribution share is its normalized removal effect
    1 - p_removed/p_full.  The data-driven multi-touch model that
    last-touch (q152), linear (q171) and time-decay (q212) heuristics
    approximate: removal effect credits a channel by what conversions
    would be LOST without it, which none of the positional rules can see.

    Determinism: transition counts and row totals are exact integers;
    each iteration's per-edge term n*v/rt is IEEE on bit-identical
    operands ROUNDED at 12 dp into an exact decimal sum (the q221
    per-iteration re-rounding idiom), so every p is engine-identical;
    the readout rounds at 6 dp and shares normalize over ROUNDED
    effects.

    Scale shape: ONE fact shuffle (the per-user journey window + pair
    rollup, map-side combined) reduces events to the bounded
    |states|^2 transition matrix; the scenario expansion (1 + removal
    per channel), all {_MKA_ITERS} iterations, and the readout run on
    that bounded relation — iteration joins touch <= |scenarios| x
    |states|^2 rows regardless of fact size."""
    from pyspark.sql.window import Window as Wd

    ev = load(spark, sf_dir, "events")
    w_ord = Wd.partitionBy("user_id").orderBy("ts", "event_id")
    w_prior = w_ord.rowsBetween(Wd.unboundedPreceding, -1)
    w_last = Wd.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    kept = ev.select(
        "user_id",
        "event_type",
        "ts",
        "event_id",
        F.coalesce(
            F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0)).over(
                w_prior
            ),
            F.lit(0),
        ).alias("prior_p"),
    ).filter(F.col("prior_p") == 0)
    trans0 = kept.select(
        F.coalesce(F.lag("event_type").over(w_ord), F.lit("START")).alias("src"),
        F.when(F.col("event_type") == "purchase", "CONV")
        .otherwise(F.col("event_type"))
        .alias("dst"),
        F.row_number().over(w_last).alias("rn_last"),
        "event_type",
    )
    edges = trans0.select("src", "dst").unionByName(
        trans0.filter(
            (F.col("rn_last") == 1) & (F.col("event_type") != "purchase")
        ).select(F.col("event_type").alias("src"), F.lit("NULLSTATE").alias("dst"))
    )
    counts = edges.groupBy("src", "dst").agg(F.count(F.lit(1)).cast("long").alias("n"))
    tot = counts.groupBy("src").agg(F.sum("n").cast("long").alias("rt"))
    scen = spark.createDataFrame(
        [("FULL",)] + [(c,) for c in _MKA_CHANNELS], "scenario string"
    )
    sedges = (
        counts.join(F.broadcast(tot), "src")
        .crossJoin(F.broadcast(scen))
        .filter(
            (F.col("scenario") == "FULL")
            | ((F.col("src") != F.col("scenario")) & (F.col("dst") != F.col("scenario")))
        )
        .transform(stage)  # every iteration re-reads the bounded matrix
    )
    p = sedges.select("scenario", F.col("src").alias("state")).distinct().withColumn(
        "p", F.lit(0.0)
    )
    for _ in range(_MKA_ITERS):
        pe = sedges.join(
            p.select(
                F.col("scenario").alias("psc"),
                F.col("state").alias("pst"),
                F.col("p").alias("pp"),
            ),
            (F.col("scenario") == F.col("psc")) & (F.col("dst") == F.col("pst")),
            "left",
        )
        v = (
            F.when(F.col("dst") == "CONV", F.lit(1.0))
            .when(F.col("dst") == "NULLSTATE", F.lit(0.0))
            .otherwise(F.coalesce(F.col("pp"), F.lit(0.0)))
        )
        p = (
            pe.groupBy("scenario", F.col("src").alias("state"))
            .agg(
                F.sum(
                    F.round(F.col("n") * v / F.col("rt"), 12).cast("decimal(28,12)")
                )
                .cast("double")
                .alias("p")
            )
        )
    p = p.transform(stage)  # full + removal readouts both scan it
    p_full = p.filter(
        (F.col("scenario") == "FULL") & (F.col("state") == "START")
    ).select(F.col("p").alias("p_full"))
    chans = spark.createDataFrame([(c,) for c in _MKA_CHANNELS], "channel string")
    removed = p.filter(F.col("state") == "START").select(
        F.col("scenario").alias("channel"), F.col("p").alias("p_removed")
    )
    eff = (
        chans.join(F.broadcast(removed), "channel", "left")
        .crossJoin(F.broadcast(p_full))
        .select(
            "channel",
            "p_full",
            F.coalesce(F.col("p_removed"), F.lit(0.0)).alias("p_removed"),
        )
        .withColumn(
            "removal_effect", F.round(1.0 - F.col("p_removed") / F.col("p_full"), 6)
        )
    )
    return (
        eff.select(
            "channel",
            F.round("p_full", 6).alias("p_conversion"),
            F.round("p_removed", 6).alias("p_without_channel"),
            "removal_effect",
            F.round(
                F.col("removal_effect")
                / F.sum("removal_effect").over(Wd.partitionBy()),
                6,
            ).alias("attribution_share"),
        )
        .transform(pin)
        .orderBy("channel")
    )


# ---------------------------------------------------------------------------
# X-08 (cont.): position-based (U-shaped) attribution
# ---------------------------------------------------------------------------

_POS_ORACLE = f"""
    WITH touch AS (
        SELECT user_id AS t_user, ts AS tts, event_id AS t_eid,
               event_type AS channel
        FROM events WHERE event_type IN ('view', 'click')
    ),
    pur AS (
        SELECT event_id, user_id, ts AS pts,
               CAST(ROUND(value * 100) AS BIGINT) AS cents
        FROM events WHERE event_type = 'purchase'
    ),
    pairs AS (
        SELECT p.event_id, p.cents, t.channel,
               ROW_NUMBER() OVER (PARTITION BY p.event_id
                                  ORDER BY t.tts, t.t_eid) AS rk,
               COUNT(*) OVER (PARTITION BY p.event_id) AS n_touch
        FROM pur p JOIN touch t
          ON p.user_id = t.t_user AND t.tts <= p.pts
         AND epoch_us(p.pts) - epoch_us(t.tts) <= {_ATTR_WINDOW_US}
    ),
    wt AS (
        SELECT event_id, cents, channel,
               CASE WHEN n_touch = 1 THEN 1.0
                    WHEN n_touch = 2 THEN 0.5
                    WHEN rk = 1 OR rk = n_touch THEN 0.4
                    ELSE 0.2 / (n_touch - 2) END AS w
        FROM pairs
    )
    SELECT channel,
           CAST(SUM(CAST(ROUND(w, 9) AS DECIMAL(28,9))) AS DOUBLE)
               AS credited_purchases,
           CAST(SUM(CAST(ROUND(cents * w / 100, 6) AS DECIMAL(28,6))) AS DOUBLE)
               AS credited_revenue
    FROM wt GROUP BY channel ORDER BY channel
"""


@query("q276_position_attribution", oracle=_POS_ORACLE, tags=("X-08", "W-01"))
def q276_position_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Position-based (U-shaped, 40/20/40) multi-touch attribution: each
    purchase credits 40% to the FIRST touch in its 3-day lookback, 40%
    to the LAST, and splits 20% evenly across the middle (1 touch keeps
    100%, 2 touches split 50/50) — the introducer-and-closer compromise
    completing the attribution family: last-touch (q152), linear
    (q171), time-decay (q212), and the data-driven Markov removal
    effect (q273) that these heuristics approximate.

    Determinism: touch positions rank under the (ts, event_id) total
    order; weights are exact literals except the middle split's ONE IEEE
    division, each credit term rounds at 9/6 dp into exact decimal sums
    (the q171 idiom).

    Scale shape: identical join geometry to q171 — the purchase×touch
    pairing is CO-PARTITIONED on user_id with the lookback as a
    join-level range predicate (fan-out bounded per user), the position
    window partitions by purchase id, and the final rollup groups on the
    2-value channel key."""
    ev = load(spark, sf_dir, "events")
    touch = ev.filter(F.col("event_type").isin("view", "click")).select(
        F.col("user_id").alias("t_user"),
        F.col("ts").alias("tts"),
        F.col("event_id").alias("t_eid"),
        F.col("event_type").alias("channel"),
    )
    pur = ev.filter(F.col("event_type") == "purchase").select(
        "event_id",
        "user_id",
        F.col("ts").alias("pts"),
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    pairs = pur.join(
        touch,
        (F.col("user_id") == F.col("t_user"))
        & (F.col("tts") <= F.col("pts"))
        & (F.unix_micros("pts") - F.unix_micros("tts") <= _ATTR_WINDOW_US),
    ).select(
        "event_id",
        "cents",
        "channel",
        F.row_number()
        .over(W.partitionBy("event_id").orderBy("tts", "t_eid"))
        .alias("rk"),
        F.count(F.lit(1)).over(W.partitionBy("event_id")).alias("n_touch"),
    )
    w = (
        F.when(F.col("n_touch") == 1, F.lit(1.0))
        .when(F.col("n_touch") == 2, F.lit(0.5))
        .when((F.col("rk") == 1) | (F.col("rk") == F.col("n_touch")), F.lit(0.4))
        .otherwise(F.lit(0.2) / (F.col("n_touch") - 2))
    )
    return (
        pairs.select("channel", "cents", w.alias("w"))
        .groupBy("channel")
        .agg(
            F.sum(F.round(F.col("w"), 9).cast("decimal(28,9)"))
            .cast("double")
            .alias("credited_purchases"),
            F.sum(
                F.round(F.col("cents") * F.col("w") / 100, 6).cast("decimal(28,6)")
            )
            .cast("double")
            .alias("credited_revenue"),
        )
        .transform(pin)
        .orderBy("channel")
    )


# ---------------------------------------------------------------------------
# X-70 (cont.): revenue bridge — price/volume decomposition between periods
# ---------------------------------------------------------------------------

_BRIDGE_ORACLE = """
    WITH per AS (
        SELECT p.p_brand AS brand,
               year(l.l_shipdate) AS y,
               CAST(SUM(CAST(l.l_quantity AS BIGINT)) AS BIGINT) AS q,
               CAST(SUM(CAST(ROUND(l.l_extendedprice * 100) AS BIGINT))
                    AS BIGINT) AS rev
        FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
        WHERE year(l.l_shipdate) IN (1996, 1997)
        GROUP BY 1, 2
    ),
    wide AS (
        SELECT brand,
               MAX(CASE WHEN y = 1996 THEN q END) AS q1,
               MAX(CASE WHEN y = 1996 THEN rev END) AS rev1,
               MAX(CASE WHEN y = 1997 THEN q END) AS q2,
               MAX(CASE WHEN y = 1997 THEN rev END) AS rev2
        FROM per GROUP BY brand
    )
    SELECT brand, q1, q2, rev1, rev2,
           rev2 - rev1 AS delta_cents,
           ROUND(CAST(CAST(rev1 AS DECIMAL(38,0)) * (q2 - q1) AS DOUBLE) / q1, 6)
               AS volume_effect_cents,
           ROUND(rev2 - CAST(CAST(rev1 AS DECIMAL(38,0)) * q2 AS DOUBLE) / q1, 6)
               AS price_effect_cents
    FROM wide
    WHERE q1 IS NOT NULL AND q2 IS NOT NULL AND q1 > 0 AND q2 > 0
    ORDER BY brand
"""


@query("q350_revenue_bridge", oracle=_BRIDGE_ORACLE, tags=("X-70", "A-01", "J-02"))
def q350_revenue_bridge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue bridge: the year-over-year revenue change per brand
    decomposed into a VOLUME effect (base-year prices x quantity change,
    Laspeyres) and a PRICE effect (current-year quantities x price
    change, Paasche) — the pairing that makes the bridge EXACTLY
    additive: volume + price = delta with no residual mix term, which is
    why finance teams report this decomposition. q266 indexes prices
    against a base month; this explains a revenue delta — 'did we sell
    more, or sell dearer?'.

    Determinism: quantities and revenue cents are exact integers; each
    effect is one decimal-exact product cast to double and divided once
    by an integer (identical operands, identical parenthesization in
    both engines), rounded 6 dp; additivity holds exactly in the
    pre-rounding reals by construction.

    Scale shape: the part dim joins BROADCAST; ONE map-side-combined
    fact rollup onto the bounded (brand, year) relation (the year filter
    pushes to the scan); the pivot and both effects run on <= |brands|
    rows. A-14-mergeable partials.

    Reference parity: beyond-reference; extends X-70 (q266 price index)
    and the what-if family (q324)."""
    li = (
        load(spark, sf_dir, "lineitem")
        .filter(F.year("l_shipdate").isin(1996, 1997))
        .select(
            "l_partkey",
            F.year("l_shipdate").alias("y"),
            F.col("l_quantity").cast("long").alias("qty"),
            F.round(F.col("l_extendedprice") * 100).cast("long").alias("cents"),
        )
    )
    p = load(spark, sf_dir, "part").select("p_partkey", F.col("p_brand").alias("brand"))
    per = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("brand", "y")
        .agg(
            F.sum("qty").cast("long").alias("q"),
            F.sum("cents").cast("long").alias("rev"),
        )
    )

    def _side(col, yr):
        return F.max(F.when(F.col("y") == yr, F.col(col)))

    wide = per.groupBy("brand").agg(
        _side("q", 1996).alias("q1"),
        _side("rev", 1996).alias("rev1"),
        _side("q", 1997).alias("q2"),
        _side("rev", 1997).alias("rev2"),
    )
    vol = F.round(
        F.expr("CAST(CAST(rev1 AS DECIMAL(38,0)) * (q2 - q1) AS DOUBLE)")
        / F.col("q1"),
        6,
    )
    price = F.round(
        F.col("rev2")
        - F.expr("CAST(CAST(rev1 AS DECIMAL(38,0)) * q2 AS DOUBLE)") / F.col("q1"),
        6,
    )
    return (
        wide.filter(
            F.col("q1").isNotNull()
            & F.col("q2").isNotNull()
            & (F.col("q1") > 0)
            & (F.col("q2") > 0)
        )
        .select(
            "brand",
            "q1",
            "q2",
            "rev1",
            "rev2",
            (F.col("rev2") - F.col("rev1")).alias("delta_cents"),
            vol.alias("volume_effect_cents"),
            price.alias("price_effect_cents"),
        )
        .transform(pin)
        .orderBy("brand")
    )


# ---------------------------------------------------------------------------
# O-05 (cont.): grouped top-k with an OTHERS rollup (the dashboard pattern)
# ---------------------------------------------------------------------------

_TOPK_OTHERS_K = 3

_TOPK_OTHERS_ORACLE = f"""
    WITH rev AS (
        SELECT n.n_name AS nation, p.p_brand AS brand,
               CAST(SUM(CAST(ROUND(l.l_extendedprice * 100) AS BIGINT))
                    AS BIGINT) AS rev_cents
        FROM lineitem l
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        JOIN nation n ON n.n_nationkey = s.s_nationkey
        JOIN part p ON p.p_partkey = l.l_partkey
        GROUP BY 1, 2
    ),
    ranked AS (
        SELECT nation, brand, rev_cents,
               ROW_NUMBER() OVER (PARTITION BY nation
                                  ORDER BY rev_cents DESC, brand) AS rk
        FROM rev
    )
    SELECT nation, brand, CAST(rk AS BIGINT) AS rk, rev_cents
    FROM ranked WHERE rk <= {_TOPK_OTHERS_K}
    UNION ALL
    SELECT nation, 'OTHERS' AS brand,
           CAST({_TOPK_OTHERS_K + 1} AS BIGINT) AS rk,
           CAST(SUM(rev_cents) AS BIGINT) AS rev_cents
    FROM ranked WHERE rk > {_TOPK_OTHERS_K}
    GROUP BY nation
    ORDER BY nation, rk
"""


@query(
    "q352_topk_with_others",
    oracle=_TOPK_OTHERS_ORACLE,
    tags=("O-05", "A-01", "J-02"),
)
def q352_topk_with_others(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped top-k with an OTHERS rollup: each nation's top-3 brands by
    revenue plus one OTHERS row absorbing the remainder — the dashboard/
    report pattern a plain grouped top-k (q13) leaves half-done (a pie
    chart that silently drops the tail misreports shares; OTHERS keeps
    the group total reconcilable to q04's full rollup).

    Determinism: revenue is exact integer cents; ranking ties break by
    brand; the OTHERS row is an exact sum of the untaken remainder.

    Scale shape: both dims BROADCAST into the fact; ONE map-side-combined
    rollup onto the bounded (nation, brand) relation; the rank and the
    OTHERS aggregation both run on that bounded relation (the window is
    per-nation over <= |brands| rows, never over the fact), and the two
    legs share the ranked relation via one stage — no second fact scan,
    no anti-join.

    Reference parity: beyond-reference; completes O-05 (q13 plain, q222
    diversified) with the reconcilable-report form."""
    li = load(spark, sf_dir, "lineitem").select(
        "l_suppkey",
        "l_partkey",
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("cents"),
    )
    s = load(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = load(spark, sf_dir, "nation").select(
        "n_nationkey", F.col("n_name").alias("nation")
    )
    p = load(spark, sf_dir, "part").select(
        "p_partkey", F.col("p_brand").alias("brand")
    )
    rev = (
        li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), F.col("s_nationkey") == n.n_nationkey)
        .join(F.broadcast(p), F.col("l_partkey") == p.p_partkey)
        .groupBy("nation", "brand")
        .agg(F.sum("cents").cast("long").alias("rev_cents"))
    )
    ranked = rev.withColumn(
        "rk",
        F.row_number().over(
            W.partitionBy("nation").orderBy(F.desc("rev_cents"), "brand")
        ),
    ).transform(stage)  # top-k leg + OTHERS leg share one ranked build
    top = ranked.filter(F.col("rk") <= _TOPK_OTHERS_K).select(
        "nation", "brand", F.col("rk").cast("long").alias("rk"), "rev_cents"
    )
    others = (
        ranked.filter(F.col("rk") > _TOPK_OTHERS_K)
        .groupBy("nation")
        .agg(F.sum("rev_cents").cast("long").alias("rev_cents"))
        .select(
            "nation",
            F.lit("OTHERS").alias("brand"),
            F.lit(_TOPK_OTHERS_K + 1).cast("long").alias("rk"),
            "rev_cents",
        )
    )
    return top.unionByName(others).transform(pin).orderBy("nation", "rk")


# ---------------------------------------------------------------------------
# X-08 (cont.): growth accounting (new / retained / resurrected / churned)
# ---------------------------------------------------------------------------

_GROWTH_ORACLE = """
    WITH active AS (
        SELECT DISTINCT user_id,
               CAST(FLOOR(epoch(date_trunc('day', ts))) AS BIGINT) // 86400 AS d
        FROM events
    ),
    first_day AS (
        SELECT user_id, MIN(d) AS d0 FROM active GROUP BY user_id
    ),
    bounds AS (SELECT MAX(d) AS dmax FROM active),
    flags AS (
        SELECT a.d, a.user_id,
               CASE WHEN f.d0 = a.d THEN 1 ELSE 0 END AS is_new,
               CASE WHEN p.user_id IS NOT NULL THEN 1 ELSE 0 END AS is_retained,
               CASE WHEN f.d0 < a.d AND p.user_id IS NULL THEN 1 ELSE 0 END
                   AS is_resurrected
        FROM active a
        JOIN first_day f ON f.user_id = a.user_id
        LEFT JOIN active p ON p.user_id = a.user_id AND p.d = a.d - 1
    ),
    churn AS (
        SELECT a.d + 1 AS d, CAST(COUNT(*) AS BIGINT) AS n_churned
        FROM active a
        LEFT JOIN active nxt ON nxt.user_id = a.user_id AND nxt.d = a.d + 1
        CROSS JOIN bounds b
        WHERE nxt.user_id IS NULL AND a.d + 1 <= b.dmax
        GROUP BY a.d + 1
    ),
    daily AS (
        SELECT d,
               CAST(SUM(is_new) AS BIGINT) AS n_new,
               CAST(SUM(is_retained) AS BIGINT) AS n_retained,
               CAST(SUM(is_resurrected) AS BIGINT) AS n_resurrected
        FROM flags GROUP BY d
    )
    SELECT daily.d, n_new, n_retained, n_resurrected,
           CAST(COALESCE(churn.n_churned, 0) AS BIGINT) AS n_churned,
           CAST(n_new + n_resurrected - COALESCE(churn.n_churned, 0) AS BIGINT)
               AS net_change
    FROM daily LEFT JOIN churn ON churn.d = daily.d
    ORDER BY daily.d
"""


@query("q358_growth_accounting", oracle=_GROWTH_ORACLE, tags=("X-08", "X-21"))
def q358_growth_accounting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Growth accounting (the canonical DAU decomposition): every day's
    active users split into NEW (first day ever), RETAINED (also active
    yesterday), and RESURRECTED (seen before, inactive yesterday), with
    CHURNED (active yesterday, absent today) attributed to today and the
    identity DAU_t - DAU_{t-1} = new + resurrected - churned holding
    exactly — the scoreboard growth teams read before any cohort drill-
    down. q87's cohort matrix follows one signup class forward; q227's
    bitmap gives day-pair retention; this reconciles the TOTAL day-over-
    day movement.

    Determinism: exact integer day keys and counts; churn on the day
    after the last observed day is excluded (no claim about the unseen
    future — the q223 discipline).

    Scale shape: the fact reduces ONCE to distinct (user, day); first
    days are a user-keyed rollup co-partitioned with the activity
    relation; yesterday/tomorrow presence are self-joins of that same
    reduced relation keyed (user, day) — at 100 TB these are
    co-partitioned bucket joins on the same key, never fact joins; all
    rollups land on the calendar-bounded day relation.

    Reference parity: beyond-reference; completes X-08/X-21's engagement
    kit (q87 cohorts, q175 WAU, q209 growth curve, q226 streaks, q227
    bitmap retention, q228 stickiness) with the reconciling ledger."""
    ev = load(spark, sf_dir, "events")
    active = (
        ev.select(
            "user_id",
            (F.unix_timestamp(F.date_trunc("day", F.col("ts"))) / F.lit(86400))
            .cast("long")
            .alias("d"),
        )
        .groupBy("user_id", "d")
        .agg(F.count(F.lit(1)).alias("_n"))
        .select("user_id", "d")
        .transform(stage)  # first-day, prev, next, bounds legs share one build
    )
    first_day = active.groupBy("user_id").agg(F.min("d").alias("d0"))
    bounds = active.agg(F.max("d").alias("dmax"))
    prev = active.select("user_id", (F.col("d") + 1).alias("d"), F.lit(1).alias("p"))
    flags = (
        active.join(first_day, "user_id")
        .join(prev, ["user_id", "d"], "left")
        .select(
            "d",
            (F.col("d0") == F.col("d")).cast("int").alias("is_new"),
            F.coalesce(F.col("p"), F.lit(0)).alias("is_retained"),
            ((F.col("d0") < F.col("d")) & F.col("p").isNull())
            .cast("int")
            .alias("is_resurrected"),
        )
    )
    nxt = active.select("user_id", (F.col("d") - 1).alias("d"), F.lit(1).alias("nx"))
    churn = (
        active.join(nxt, ["user_id", "d"], "left")
        .filter(F.col("nx").isNull())
        .join(F.broadcast(bounds))
        .filter(F.col("d") + 1 <= F.col("dmax"))
        .groupBy((F.col("d") + 1).alias("d"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_churned"))
    )
    daily = flags.groupBy("d").agg(
        F.sum("is_new").cast("long").alias("n_new"),
        F.sum("is_retained").cast("long").alias("n_retained"),
        F.sum("is_resurrected").cast("long").alias("n_resurrected"),
    )
    return (
        daily.join(churn, "d", "left")
        .select(
            "d",
            "n_new",
            "n_retained",
            "n_resurrected",
            F.coalesce(F.col("n_churned"), F.lit(0)).cast("long").alias("n_churned"),
            (
                F.col("n_new")
                + F.col("n_resurrected")
                - F.coalesce(F.col("n_churned"), F.lit(0))
            )
            .cast("long")
            .alias("net_change"),
        )
        .transform(pin)
        .orderBy("d")
    )


# ---------------------------------------------------------------------------
# A-09 composition: percent-of-parent hierarchical contribution
# ---------------------------------------------------------------------------

_POP_ORACLE = """
    WITH rev AS (
        SELECT r.r_name AS region, n.n_name AS nation,
               CAST(SUM(CAST(ROUND(l.l_extendedprice * 100) AS BIGINT))
                    AS BIGINT) AS rev_cents
        FROM lineitem l
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        JOIN nation n ON n.n_nationkey = s.s_nationkey
        JOIN region r ON r.r_regionkey = n.n_regionkey
        GROUP BY 1, 2
    )
    SELECT region, nation, rev_cents,
           ROUND(CAST(rev_cents AS DOUBLE)
                 / SUM(rev_cents) OVER (PARTITION BY region), 6)
               AS share_of_region,
           ROUND(CAST(rev_cents AS DOUBLE) / SUM(rev_cents) OVER (), 6)
               AS share_of_total
    FROM rev ORDER BY region, nation
"""


@query("q360_percent_of_parent", oracle=_POP_ORACLE, tags=("A-09", "W-03", "J-02"))
def q360_percent_of_parent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Percent-of-parent hierarchical contribution: each nation's revenue
    with its share of its region and of the grand total — the
    percent-of-parent readout every BI hierarchy drill renders next to
    q10's ROLLUP subtotals (ROLLUP gives the parents' absolute numbers;
    this normalizes each child against them without emitting extra
    grouping rows).

    Determinism: revenue is exact integer cents; both shares divide
    exact integers (window sums of exact longs) once, rounded 6 dp.

    Scale shape: all three dims BROADCAST; ONE map-side-combined fact
    rollup onto the bounded (region, nation) relation; both parent sums
    are windows over that <= |nations| relation (the ungrouped total
    window runs on bounded rows — the q120 precedent), so the hierarchy
    math costs nothing at any fact scale.

    Reference parity: beyond-reference; composes A-09 (q10/q93) with
    W-03 frames into the standard drill-down normalization."""
    li = load(spark, sf_dir, "lineitem").select(
        "l_suppkey",
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("cents"),
    )
    s = load(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = load(spark, sf_dir, "nation").select(
        "n_nationkey", "n_regionkey", F.col("n_name").alias("nation")
    )
    r = load(spark, sf_dir, "region").select(
        "r_regionkey", F.col("r_name").alias("region")
    )
    rev = (
        li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), F.col("s_nationkey") == n.n_nationkey)
        .join(F.broadcast(r), F.col("n_regionkey") == r.r_regionkey)
        .groupBy("region", "nation")
        .agg(F.sum("cents").cast("long").alias("rev_cents"))
    )
    w_region = W.partitionBy("region")
    w_all = W.partitionBy()  # bounded: <= |nations| rows
    return (
        rev.select(
            "region",
            "nation",
            "rev_cents",
            F.round(
                F.col("rev_cents").cast("double")
                / F.sum("rev_cents").over(w_region),
                6,
            ).alias("share_of_region"),
            F.round(
                F.col("rev_cents").cast("double") / F.sum("rev_cents").over(w_all),
                6,
            ).alias("share_of_total"),
        )
        .transform(pin)
        .orderBy("region", "nation")
    )


# ---------------------------------------------------------------------------
# X-08 (cont.): spend-quintile migration matrix (week over week)
# ---------------------------------------------------------------------------

_MIGR_ORACLE = """
    WITH weekly AS (
        SELECT user_id,
               CAST(FLOOR(epoch(date_trunc('day', ts))) AS BIGINT) // 604800 AS w,
               CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
                   AS cents
        FROM events WHERE event_type = 'purchase'
        GROUP BY 1, 2
    ),
    bucketed AS (
        SELECT user_id, w,
               NTILE(5) OVER (PARTITION BY w ORDER BY cents, user_id) AS q
        FROM weekly
    )
    SELECT a.q AS q_from, b.q AS q_to, CAST(COUNT(*) AS BIGINT) AS n_users
    FROM bucketed a JOIN bucketed b
      ON b.user_id = a.user_id AND b.w = a.w + 1
    GROUP BY a.q, b.q
    ORDER BY q_from, q_to
"""


@query("q366_decile_migration", oracle=_MIGR_ORACLE, tags=("X-08", "W-01"))
def q366_decile_migration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spend-quintile migration matrix: users bucketed into weekly spend
    quintiles (NTILE over the total (cents, user_id) order — equal-size
    buckets, engine-identical under a total order), and the week-over-
    week transition counts between buckets — the CRM value-migration
    readout ('are my top spenders staying top?') that q211's static RFM
    snapshot and q118's event-type transitions both miss: this tracks
    MOVEMENT of the value distribution itself.

    Determinism: weekly cents exact; NTILE over a total order is
    deterministic and identically defined in both engines; transition
    counts exact.

    Scale shape: ONE map-side-combined fact rollup onto the (user, week)
    relation; NTILE partitions by week (parallelism = weeks, each
    partition the bounded weekly-active user set — at extreme user
    counts swap to the q103/q162 broadcast-edges + map-only assignment
    on the same dataflow); the migration join is a self-join of that
    reduced relation co-keyed on user; the matrix rollup lands on <= 25
    cells.

    Reference parity: beyond-reference; completes X-08's engagement kit
    (q358 growth ledger, q87 cohorts) with the value-migration matrix."""
    weekly = (
        load(spark, sf_dir, "events")
        .filter(F.col("event_type") == "purchase")
        .groupBy(
            "user_id",
            (
                F.unix_timestamp(F.date_trunc("day", F.col("ts"))) / F.lit(604800)
            )
            .cast("long")
            .alias("w"),
        )
        .agg(
            F.sum(F.floor(F.col("value") * 100 + 0.5).cast("long"))
            .cast("long")
            .alias("cents")
        )
    )
    bucketed = weekly.select(
        "user_id",
        "w",
        F.ntile(5)
        .over(W.partitionBy("w").orderBy("cents", "user_id"))
        .alias("q"),
    ).transform(stage)  # both sides of the migration self-join share one build
    a = bucketed.select("user_id", "w", F.col("q").alias("q_from"))
    b = bucketed.select(
        "user_id", (F.col("w") - 1).alias("w"), F.col("q").alias("q_to")
    )
    return (
        a.join(b, ["user_id", "w"])
        .groupBy("q_from", "q_to")
        .agg(F.count(F.lit(1)).cast("long").alias("n_users"))
        .transform(pin)
        .orderBy("q_from", "q_to")
    )


# ---------------------------------------------------------------------------
# X-08 (cont.): attribution lookback-window sensitivity
# ---------------------------------------------------------------------------

_AWS_WINDOWS_H = (1, 24, 168)  #: candidate lookback caps, hours

_AWS_ORACLE = f"""
    WITH conv AS (
        SELECT user_id, ts AS conv_ts, event_id AS conv_id
        FROM events WHERE event_type = 'purchase'
    ),
    touch AS (
        SELECT user_id, event_type AS channel, ts AS touch_ts,
               event_id AS touch_id
        FROM events WHERE event_type <> 'purchase'
    ),
    last_touch AS (
        SELECT conv_id, channel, lag_us FROM (
            SELECT c.conv_id, t.channel,
                   epoch_us(c.conv_ts) - epoch_us(t.touch_ts) AS lag_us,
                   ROW_NUMBER() OVER (
                       PARTITION BY c.conv_id
                       ORDER BY t.touch_ts DESC, t.touch_id DESC
                   ) AS rn
            FROM conv c JOIN touch t
              ON t.user_id = c.user_id
             AND (t.touch_ts < c.conv_ts
                  OR (t.touch_ts = c.conv_ts AND t.touch_id < c.conv_id))
        ) WHERE rn = 1
    ),
    tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_conv FROM conv)
    SELECT w.window_h, lt.channel,
           CAST(COUNT(*) AS BIGINT) AS n_attributed,
           ROUND(CAST(COUNT(*) AS DOUBLE) / ANY_VALUE(tot.n_conv), 6)
               AS share_of_conversions
    FROM last_touch lt
    CROSS JOIN (SELECT unnest([{", ".join(map(str, _AWS_WINDOWS_H))}])
                AS window_h) w
    CROSS JOIN tot
    WHERE lt.lag_us <= w.window_h * 3600000000
    GROUP BY w.window_h, lt.channel
    ORDER BY window_h, channel
"""


@query(
    "q367_attribution_window_sensitivity",
    oracle=_AWS_ORACLE,
    tags=("X-08", "W-01"),
)
def q367_attribution_window_sensitivity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Attribution lookback-window sensitivity: last-touch credit per
    channel recomputed under 1-hour, 24-hour, and 7-day lookback caps,
    with each cell's share of ALL conversions — the robustness table
    that shows whether q152's channel ranking is a fact or an artifact
    of the window someone picked (credit that evaporates when the cap
    tightens was never causal). Conversions whose last touch falls
    outside a cap simply drop from that cap's rows, so column sums
    reveal the unattributed share per window.

    Determinism: the last touch is unique under the (ts, event_id)
    total order; lags are exact integer micros; window membership is an
    exact integer comparison; one exact division per cell, 6 dp.

    Scale shape: ONE user-co-keyed conversion-touch join ranked by the
    q13 grouped-top-1 (the q152 dataflow, shared — the sensitivity
    sweep adds NO new fact work: the 3-window fan-out is a map-only
    explode on the one-row-per-conversion last-touch relation); rollup
    onto the bounded (window, channel) grid; the conversion total
    cross-broadcasts one row.

    Reference parity: beyond-reference; hardens the X-08 attribution
    family (q152/q171/q212/q273/q276/q312) with the window-sensitivity
    audit every marketing-mix review asks for first."""
    ev = load(spark, sf_dir, "events")
    conv = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("ts").alias("conv_ts"),
        F.col("event_id").alias("conv_id"),
    )
    touch = ev.filter(F.col("event_type") != "purchase").select(
        "user_id",
        F.col("event_type").alias("channel"),
        F.col("ts").alias("touch_ts"),
        F.col("event_id").alias("touch_id"),
    )
    joined = conv.join(touch, "user_id").filter(
        (F.col("touch_ts") < F.col("conv_ts"))
        | (
            (F.col("touch_ts") == F.col("conv_ts"))
            & (F.col("touch_id") < F.col("conv_id"))
        )
    )
    rn = F.row_number().over(
        W.partitionBy("conv_id").orderBy(
            F.desc("touch_ts"), F.desc("touch_id")
        )
    )
    last_touch = (
        joined.withColumn("rn", rn)
        .filter(F.col("rn") == 1)
        .select(
            "conv_id",
            "channel",
            (F.unix_micros("conv_ts") - F.unix_micros("touch_ts")).alias("lag_us"),
        )
    )
    tot = conv.agg(F.count(F.lit(1)).cast("long").alias("n_conv"))
    fanned = last_touch.select(
        "channel",
        "lag_us",
        F.explode(
            F.array(*[F.lit(h) for h in _AWS_WINDOWS_H])
        ).alias("window_h"),
    ).filter(F.col("lag_us") <= F.col("window_h") * F.lit(3600000000))
    return (
        fanned.groupBy("window_h", "channel")
        .agg(F.count(F.lit(1)).cast("long").alias("n_attributed"))
        .join(F.broadcast(tot))
        .select(
            "window_h",
            "channel",
            "n_attributed",
            F.round(
                F.col("n_attributed").cast("double") / F.col("n_conv"), 6
            ).alias("share_of_conversions"),
        )
        .transform(pin)
        .orderBy("window_h", "channel")
    )


# ---------------------------------------------------------------------------
# X-08 (cont.): sessionization gap-parameter sweep
# ---------------------------------------------------------------------------

_GAP_SWEEP_MIN = (5, 15, 30, 60)  #: candidate inactivity gaps, minutes

_GAP_SWEEP_ORACLE = f"""
    WITH gaps AS (
        SELECT user_id,
               epoch_us(ts) - LAG(epoch_us(ts)) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
               ) AS gap_us
        FROM events
    ),
    fanned AS (
        SELECT g.user_id, w.gap_min,
               CASE WHEN g.gap_us IS NULL
                         OR g.gap_us > CAST(w.gap_min AS BIGINT) * 60000000
                    THEN 1 ELSE 0 END AS is_start
        FROM gaps g
        CROSS JOIN (SELECT unnest([{", ".join(map(str, _GAP_SWEEP_MIN))}])
                    AS gap_min) w
    )
    SELECT gap_min,
           CAST(SUM(is_start) AS BIGINT) AS n_sessions,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           ROUND(CAST(COUNT(*) AS DOUBLE) / SUM(is_start), 6)
               AS events_per_session
    FROM fanned GROUP BY gap_min ORDER BY gap_min
"""


@query("q368_session_gap_sweep", oracle=_GAP_SWEEP_ORACLE, tags=("X-08", "W-02"))
def q368_session_gap_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization gap-parameter sweep: session counts and mean events
    per session under 5/15/30/60-minute inactivity thresholds — the
    tuning table behind q91's fixed 30-minute choice (a knee in this
    curve is where the gap parameter stops mattering; no knee means
    session counts are an artifact of the threshold, which is worth
    knowing before anyone reports 'sessions' as a KPI). Session count =
    number of gap-exceeding boundaries + first events, counted WITHOUT
    materializing any session ids.

    Determinism: gaps are exact integer micros from the (ts, event_id)
    total order; boundary tests are exact integer comparisons; one
    division per row, 6 dp.

    Scale shape: ONE per-user window pass computes every gap ONCE; the
    4-threshold sweep is a map-only fan-out over the gap relation (the
    q367 discipline — parameter sweeps must not rescan); the rollup
    lands on 4 rows. Same single-shuffle cost as one sessionization.

    Reference parity: beyond-reference; hardens X-08's q91/q65 session
    machinery with the parameter-sensitivity audit."""
    ev = load(spark, sf_dir, "events")
    gaps = ev.select(
        "user_id",
        (
            F.unix_micros("ts")
            - F.lag(F.unix_micros("ts")).over(
                W.partitionBy("user_id").orderBy("ts", "event_id")
            )
        ).alias("gap_us"),
    )
    fanned = gaps.select(
        F.explode(F.array(*[F.lit(m) for m in _GAP_SWEEP_MIN])).alias("gap_min"),
        "gap_us",
    ).select(
        "gap_min",
        F.when(
            F.col("gap_us").isNull()
            | (F.col("gap_us") > F.col("gap_min").cast("long") * F.lit(60000000)),
            1,
        )
        .otherwise(0)
        .alias("is_start"),
    )
    return (
        fanned.groupBy("gap_min")
        .agg(
            F.sum("is_start").cast("long").alias("n_sessions"),
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.round(
                F.count(F.lit(1)).cast("double") / F.sum("is_start"), 6
            ).alias("events_per_session"),
        )
        .transform(pin)
        .orderBy("gap_min")
    )


# ---------------------------------------------------------------------------
# X-08 (cont.): churn-signature contrast (final-week event mix vs retained)
# ---------------------------------------------------------------------------

_CHURN_ORACLE = """
    WITH bounds AS (
        SELECT MAX(CAST(FLOOR(epoch(date_trunc('day', ts))) AS BIGINT) // 86400)
               AS dmax
        FROM events
    ),
    ev AS (
        SELECT user_id, event_type,
               CAST(FLOOR(epoch(date_trunc('day', ts))) AS BIGINT) // 86400 AS d
        FROM events
    ),
    status AS (
        SELECT e.user_id,
               CAST(CASE WHEN MAX(e.d) < b.dmax THEN 1 ELSE 0 END AS INT)
                   AS churned,
               MAX(e.d) AS last_d
        FROM ev e CROSS JOIN bounds b
        GROUP BY e.user_id, b.dmax
    ),
    final_week AS (
        SELECT e.user_id, e.event_type, s.churned
        FROM ev e JOIN status s ON s.user_id = e.user_id
        WHERE e.d > s.last_d - 7
    ),
    mix AS (
        SELECT churned, event_type, CAST(COUNT(*) AS BIGINT) AS n
        FROM final_week GROUP BY churned, event_type
    ),
    tot AS (
        SELECT churned, CAST(SUM(n) AS BIGINT) AS t FROM mix GROUP BY churned
    ),
    shares AS (
        SELECT m.event_type, m.churned,
               ROUND(CAST(m.n AS DOUBLE) / t.t, 6) AS share
        FROM mix m JOIN tot t ON t.churned = m.churned
    )
    SELECT c.event_type,
           c.share AS churned_share,
           r.share AS retained_share,
           ROUND(c.share / r.share, 6) AS lift
    FROM (SELECT * FROM shares WHERE churned = 1) c
    JOIN (SELECT * FROM shares WHERE churned = 0) r
      ON r.event_type = c.event_type
    ORDER BY c.event_type
"""


@query("q374_churn_signature", oracle=_CHURN_ORACLE, tags=("X-08", "X-14"))
def q374_churn_signature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Churn-signature contrast: the event-type mix of lapsed users'
    FINAL active week (lapsed = absent on the dataset's newest day — the
    tightest horizon this near-daily-active synthetic corpus supports;
    on production data the same query runs with a 7/30-day horizon, one
    literal) against still-active users' final-week mix, with the lift
    per type — 'churners error out and stop
    purchasing' read as a table. The descriptive precursor to q197's
    predictive backtest and the feature-selection hint for q297/q299:
    types with lift far from 1 are the churn features worth encoding.

    Determinism: churn status and week membership are exact integer day
    comparisons under data-derived bounds; shares and lift divide exact
    counts, 6 dp.

    Scale shape: ONE fact rollup derives per-user status (max day rides
    the same user-keyed shuffle); the final-week filter is a
    co-partitioned join back on user_id; mix/total/lift land on the
    bounded (2 x |types|) relation.

    Reference parity: beyond-reference; completes the X-08 lifecycle kit
    (q358 ledger counts churn, q179 curves it, this EXPLAINS it)."""
    ev = (
        load(spark, sf_dir, "events")
        .select(
            "user_id",
            "event_type",
            (F.unix_timestamp(F.date_trunc("day", F.col("ts"))) / F.lit(86400))
            .cast("long")
            .alias("d"),
        )
        .transform(stage)  # status leg + final-week leg share one build
    )
    bounds = ev.agg(F.max("d").alias("dmax"))
    status = (
        ev.groupBy("user_id")
        .agg(F.max("d").alias("last_d"))
        .join(F.broadcast(bounds))
        .select(
            "user_id",
            "last_d",
            (F.col("last_d") < F.col("dmax")).cast("int").alias("churned"),
        )
    )
    final_week = ev.join(status, "user_id").filter(
        F.col("d") > F.col("last_d") - 7
    )
    mix = final_week.groupBy("churned", "event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    tot = mix.groupBy("churned").agg(F.sum("n").cast("long").alias("t"))
    shares = mix.join(tot, "churned").select(
        "event_type",
        "churned",
        F.round(F.col("n").cast("double") / F.col("t"), 6).alias("share"),
    )
    c = shares.filter(F.col("churned") == 1).select(
        "event_type", F.col("share").alias("churned_share")
    )
    r = shares.filter(F.col("churned") == 0).select(
        "event_type", F.col("share").alias("retained_share")
    )
    return (
        c.join(r, "event_type")
        .select(
            "event_type",
            "churned_share",
            "retained_share",
            F.round(F.col("churned_share") / F.col("retained_share"), 6).alias(
                "lift"
            ),
        )
        .transform(pin)
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# X-08 (cont.): landing/exit/bounce session report
# ---------------------------------------------------------------------------

_BOUNCE_ORACLE = """
    WITH marked AS (
        SELECT user_id, event_type, ts, event_id,
               CASE WHEN epoch_us(ts) - LAG(epoch_us(ts)) OVER w > 1800000000
                         OR LAG(ts) OVER w IS NULL
                    THEN 1 ELSE 0 END AS is_start
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sess AS (
        SELECT user_id, event_type, ts, event_id,
               SUM(is_start) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id
                                   ROWS UNBOUNDED PRECEDING) AS sid
        FROM marked
    ),
    per_sess AS (
        SELECT user_id, sid,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               FIRST(event_type ORDER BY ts, event_id) AS landing
        FROM sess GROUP BY user_id, sid
    )
    SELECT landing,
           CAST(COUNT(*) AS BIGINT) AS n_sessions,
           CAST(SUM(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_bounces,
           ROUND(CAST(SUM(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS DOUBLE)
                 / COUNT(*), 6) AS bounce_rate,
           ROUND(CAST(SUM(n_events) AS DOUBLE) / COUNT(*), 6)
               AS avg_session_events
    FROM per_sess GROUP BY landing ORDER BY landing
"""


@query("q376_bounce_report", oracle=_BOUNCE_ORACLE, tags=("X-08", "W-02"))
def q376_bounce_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Landing-type session report with bounce rate: sessions (30-minute
    inactivity gap, the q91 semantics) grouped by their LANDING event
    type, with session counts, single-event BOUNCE share, and mean
    session depth — the web-analytics table q91's raw sessionization
    feeds ('sessions that START with an error bounce at 80%' is an
    actionable sentence; a session count alone is not).

    Determinism: session boundaries and the landing/exit picks use the
    (ts, event_id) total order; counts exact; two divisions, 6 dp.

    Scale shape: ONE user-keyed window pass marks boundaries and one
    running sum assigns session ids (the q91 dataflow); the per-session
    rollup rides the same user partitioning; the landing rollup lands on
    the bounded type relation. The fact shuffles once.

    Reference parity: beyond-reference; composes q91 sessionization into
    the report layer (q186 top paths, q368 parameter sweep, this the
    entry/exit quality read)."""
    from pyspark.sql import Window as W

    wu = W.partitionBy("user_id").orderBy("ts", "event_id")
    marked = load(spark, sf_dir, "events").select(
        "user_id",
        "event_type",
        "ts",
        "event_id",
        F.when(
            F.lag("ts").over(wu).isNull()
            | (
                F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(wu))
                > 1800000000
            ),
            1,
        )
        .otherwise(0)
        .alias("is_start"),
    )
    sess = marked.withColumn(
        "sid", F.sum("is_start").over(wu.rowsBetween(W.unboundedPreceding, 0))
    )
    per_sess = sess.groupBy("user_id", "sid").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.min(F.struct("ts", "event_id", "event_type")).alias("first_ev"),
    )
    bounced = (F.col("n_events") == 1).cast("int")
    return (
        per_sess.select(
            F.col("first_ev.event_type").alias("landing"),
            "n_events",
            bounced.alias("b"),
        )
        .groupBy("landing")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_sessions"),
            F.sum("b").cast("long").alias("n_bounces"),
            F.round(F.sum("b").cast("double") / F.count(F.lit(1)), 6).alias(
                "bounce_rate"
            ),
            F.round(
                F.sum("n_events").cast("double") / F.count(F.lit(1)), 6
            ).alias("avg_session_events"),
        )
        .transform(pin)
        .orderBy("landing")
    )


# ---------------------------------------------------------------------------
# A-14 (cont.): rollup-chain validity audit (additive vs distinct re-agg)
# ---------------------------------------------------------------------------

_CHAIN_ORACLE = """
    WITH daily AS (
        SELECT CAST(FLOOR(epoch(date_trunc('day', ts))) AS BIGINT) // 86400 AS d,
               CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
                   AS cents,
               CAST(COUNT(DISTINCT user_id) AS BIGINT) AS dau
        FROM events GROUP BY d
    ),
    weekly_from_daily AS (
        SELECT d // 7 AS w,
               CAST(SUM(cents) AS BIGINT) AS cents_chained,
               CAST(SUM(dau) AS BIGINT) AS users_naive_chained
        FROM daily GROUP BY w
    ),
    weekly_direct AS (
        SELECT CAST(FLOOR(epoch(date_trunc('day', ts))) AS BIGINT) // 86400 // 7
                   AS w,
               CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
                   AS cents_direct,
               CAST(COUNT(DISTINCT user_id) AS BIGINT) AS users_direct
        FROM events GROUP BY w
    )
    SELECT c.w, c.cents_chained, d.cents_direct,
           CAST(CASE WHEN c.cents_chained = d.cents_direct THEN 1 ELSE 0 END
                AS BIGINT) AS additive_ok,
           c.users_naive_chained, d.users_direct,
           CAST(c.users_naive_chained - d.users_direct AS BIGINT)
               AS distinct_overcount
    FROM weekly_from_daily c JOIN weekly_direct d USING (w)
    ORDER BY c.w
"""


@query("q396_rollup_chain_audit", oracle=_CHAIN_ORACLE, tags=("A-14", "A-04"))
def q396_rollup_chain_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rollup-chain validity audit: weekly metrics computed BY
    RE-AGGREGATING the stored daily rollup, side by side with the
    direct-from-fact truth — the additive measure (revenue cents)
    matches exactly by A-14 mergeability, while the naive chained
    distinct (summing DAUs into a 'WAU') OVERCOUNTS by exactly the
    cross-day repeat visitors, and the audit reports that overcount per
    week. This is the most common silent dashboard bug in any
    materialized-rollup warehouse, stated as a query: which measures
    may legally roll up from rollups (sums/counts/sketches — q90's HLL
    chain is the fix for distinct) and which must go back to the fact.

    Determinism: exact cents and counts; the divergence is an exact
    integer difference.

    Scale shape: the chained leg reads ONLY the calendar-bounded daily
    relation (that is the point — at 100 TB it never rescans the
    fact); the direct leg is one fact rollup; the comparison joins two
    bounded weekly relations.

    Reference parity: beyond-reference; the negative-space certification
    of A-14 (q114/q191 prove mergeable paths correct; this pins where
    the naive path is provably WRONG and by how much)."""
    ev = load(spark, sf_dir, "events").select(
        (F.unix_timestamp(F.date_trunc("day", F.col("ts"))) / F.lit(86400))
        .cast("long")
        .alias("d"),
        "user_id",
        F.floor(F.col("value") * 100 + 0.5).cast("long").alias("cents"),
    ).transform(stage)  # daily leg + direct leg share one reduction
    daily = ev.groupBy("d").agg(
        F.sum("cents").cast("long").alias("cents"),
        F.countDistinct("user_id").cast("long").alias("dau"),
    )
    chained = daily.groupBy(F.expr("d DIV 7").alias("w")).agg(
        F.sum("cents").cast("long").alias("cents_chained"),
        F.sum("dau").cast("long").alias("users_naive_chained"),
    )
    direct = ev.groupBy(F.expr("d DIV 7").alias("w")).agg(
        F.sum("cents").cast("long").alias("cents_direct"),
        F.countDistinct("user_id").cast("long").alias("users_direct"),
    )
    return (
        chained.join(direct, "w")
        .select(
            "w",
            "cents_chained",
            "cents_direct",
            (F.col("cents_chained") == F.col("cents_direct"))
            .cast("long")
            .alias("additive_ok"),
            "users_naive_chained",
            "users_direct",
            (F.col("users_naive_chained") - F.col("users_direct"))
            .cast("long")
            .alias("distinct_overcount"),
        )
        .transform(pin)
        .orderBy("w")
    )


# ---------------------------------------------------------------------------
# X-140: raking / iterative proportional fitting (2 rounds) to population margins
# ---------------------------------------------------------------------------

_RAKE_ORACLE = """
    WITH samp AS (
        SELECT event_type AS etype,
               dayofweek(date_trunc('day', ts)) + 1 AS dow,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM events WHERE user_id % 7 = 0 GROUP BY 1, 2
    ),
    trow AS (
        SELECT event_type AS etype, CAST(COUNT(*) AS BIGINT) AS tgt
        FROM events GROUP BY 1
    ),
    tcol AS (
        SELECT dayofweek(date_trunc('day', ts)) + 1 AS dow,
               CAST(COUNT(*) AS BIGINT) AS tgt
        FROM events GROUP BY 1
    ),
    w0 AS (SELECT etype, dow, n, CAST(1 AS DECIMAL(18,9)) AS w FROM samp),
    r1 AS (
        SELECT w0.etype, w0.dow, w0.n,
               CAST(ROUND(w0.w * f.f, 9) AS DECIMAL(18,9)) AS w
        FROM w0 JOIN (
            SELECT w0.etype,
                   ROUND(CAST(t.tgt AS DOUBLE)
                         / CAST(SUM(w0.n * w0.w) AS DOUBLE), 9) AS f
            FROM w0 JOIN trow t USING (etype) GROUP BY w0.etype, t.tgt
        ) f USING (etype)
    ),
    c1 AS (
        SELECT r1.etype, r1.dow, r1.n,
               CAST(ROUND(r1.w * f.f, 9) AS DECIMAL(18,9)) AS w
        FROM r1 JOIN (
            SELECT r1.dow,
                   ROUND(CAST(t.tgt AS DOUBLE)
                         / CAST(SUM(r1.n * r1.w) AS DOUBLE), 9) AS f
            FROM r1 JOIN tcol t USING (dow) GROUP BY r1.dow, t.tgt
        ) f USING (dow)
    ),
    r2 AS (
        SELECT c1.etype, c1.dow, c1.n,
               CAST(ROUND(c1.w * f.f, 9) AS DECIMAL(18,9)) AS w
        FROM c1 JOIN (
            SELECT c1.etype,
                   ROUND(CAST(t.tgt AS DOUBLE)
                         / CAST(SUM(c1.n * c1.w) AS DOUBLE), 9) AS f
            FROM c1 JOIN trow t USING (etype) GROUP BY c1.etype, t.tgt
        ) f USING (etype)
    ),
    c2 AS (
        SELECT r2.etype, r2.dow, r2.n,
               CAST(ROUND(r2.w * f.f, 9) AS DECIMAL(18,9)) AS w
        FROM r2 JOIN (
            SELECT r2.dow,
                   ROUND(CAST(t.tgt AS DOUBLE)
                         / CAST(SUM(r2.n * r2.w) AS DOUBLE), 9) AS f
            FROM r2 JOIN tcol t USING (dow) GROUP BY r2.dow, t.tgt
        ) f USING (dow)
    )
    SELECT etype, dow, n AS n_sample,
           CAST(w AS DOUBLE) AS weight,
           ROUND(CAST(n * w AS DOUBLE), 3) AS weighted_count
    FROM c2
    ORDER BY etype, dow
"""


@query("q415_raking_weights", oracle=_RAKE_ORACLE, tags=("X-140", "A-02"))
def q415_raking_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAKING (iterative proportional fitting, two full row/column
    rounds): reweight a 1-in-7 user panel's (event type x day-of-week)
    cell counts to the FULL population's type and weekday marginals —
    the survey/panel calibration step every platform needs before
    reading metrics off a sampled or skewed panel (q305 aligns
    distributions by quantiles; raking aligns CATEGORICAL margins and
    yields per-cell weights downstream aggregations can carry). Two
    rounds suffice to certify the mechanism; more rounds repeat the
    same dataflow.

    Determinism: cell counts and marginal targets are exact integers;
    weights live in DECIMAL(18,9) — each factor is ONE IEEE division
    (integer target / exact-decimal-sum-cast-double) ROUNDED 9 dp (the
    q120 pinned-rounding discipline), each weight update one decimal
    multiply re-rounded 9 dp — so both engines iterate on bit-identical
    operands and the cross-cell marginal sums are order-independent
    exact decimals.

    Scale shape: TWO map-side-combined fact rollups (sample cells,
    population margins) and then four factor steps over the BOUNDED
    35-cell grid with broadcast factor joins — iteration cost is
    O(cells), independent of fact size; the weight table re-enters
    production aggregates as a broadcast.

    Reference parity: beyond-reference; the calibration sibling of
    q332's Neyman allocation (which sizes a future sample; raking
    corrects the one you already have)."""
    ev = load(spark, sf_dir, "events")
    dow = F.dayofweek(F.date_trunc("day", F.col("ts")))
    samp = (
        ev.filter(F.col("user_id") % 7 == 0)
        .groupBy(F.col("event_type").alias("etype"), dow.alias("dow"))
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    trow = ev.groupBy(F.col("event_type").alias("etype")).agg(
        F.count(F.lit(1)).cast("long").alias("tgt")
    )
    tcol = ev.groupBy(dow.alias("dow")).agg(
        F.count(F.lit(1)).cast("long").alias("tgt")
    )
    d189 = "decimal(18,9)"
    cur = samp.withColumn("w", F.lit(1).cast(d189)).transform(stage)
    for axis, tgt in (("etype", trow), ("dow", tcol), ("etype", trow), ("dow", tcol)):
        factors = (
            cur.join(F.broadcast(tgt), axis)
            .groupBy(axis, "tgt")
            .agg(F.sum(F.col("n") * F.col("w")).alias("cursum"))
            .select(
                axis,
                F.round(
                    F.col("tgt").cast("double") / F.col("cursum").cast("double"), 9
                ).alias("f"),
            )
        )
        cur = cur.join(F.broadcast(factors), axis).select(
            "etype",
            "dow",
            "n",
            F.round(F.col("w") * F.col("f"), 9).cast(d189).alias("w"),
        )
    return (
        cur.select(
            "etype",
            "dow",
            F.col("n").alias("n_sample"),
            F.col("w").cast("double").alias("weight"),
            F.round((F.col("n") * F.col("w")).cast("double"), 3).alias("weighted_count"),
        )
        .transform(pin)
        .orderBy("etype", "dow")
    )
