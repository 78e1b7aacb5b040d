"""Interval & time-weighted analytics (SURVEY.md §2K extension X-21):
peak-concurrency sweep over session intervals and per-entity
time-weighted averages — the occupancy/load questions a fleet or
traffic operator asks of the reference's event streams (the reference
dashboards plot per-minute vehicle counts, vehicle streamlit_app.py;
"how many sessions were open AT ONCE, and when?" is the occupancy
derivative of exactly that data).

Determinism: both operators run on integer microseconds and integer
cents end-to-end; the only double math is a final division on
bit-identical exact operands. The sweep's running sum is ordered by a
(t, delta, user, session) TOTAL order so every engine scans the same
event permutation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.ordering import pin, stage
from ..tables import load
from .analytics import _SESSION_GAP_MIN, sessionize_events
from .registry import query

_DAY_US = 86_400_000_000  #: sweep prefix-sum bucket width (1 day in µs)

_SESSIONS_CTE = f"""
    g AS (
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
    ),
    sess AS (
        SELECT user_id, CAST(session_idx AS BIGINT) AS session_idx,
               epoch_us(MIN(ts)) AS a_us, epoch_us(MAX(ts)) AS b_us
        FROM s GROUP BY user_id, session_idx
    )
"""


@query(
    "q167_peak_concurrency",
    oracle=f"""
    WITH {_SESSIONS_CTE},
    pts AS (
        SELECT user_id, session_idx, a_us AS t_us, 1 AS delta FROM sess
        UNION ALL
        SELECT user_id, session_idx, b_us AS t_us, -1 AS delta FROM sess
    ),
    c AS (
        SELECT t_us,
               CAST(SUM(delta) OVER (
                   ORDER BY t_us, delta DESC, user_id, session_idx
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS BIGINT) AS conc
        FROM pts
    ),
    mx AS (SELECT MAX(conc) AS peak FROM c)
    SELECT (SELECT COUNT(*) FROM sess) AS n_sessions,
           mx.peak AS peak_concurrency,
           (SELECT MIN(t_us) FROM c WHERE c.conc = mx.peak) AS peak_at_us
    FROM mx
    """,
    tags=("X-21", "X-08", "W-03"),
)
def q167_peak_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak concurrency over session intervals — the classic sweep-line:
    each session [start, end] (30-min-gap sessions, the q91 machinery)
    emits +1 at its start and -1 at its end, the running sum of deltas
    over the global (t, delta DESC, user, session) total order is the
    number of simultaneously-open sessions after each endpoint, and the
    answer is its max plus the earliest instant achieving it. Arrivals
    sort before departures at equal timestamps, so touching intervals
    count as concurrent in both engines.

    Scale shape: the global running sum is the q84/q148 TWO-LEVEL
    bucketed prefix sum — a within-bucket window partitioned by
    floor(t/day) plus a bucket-offset pass over the BOUNDED per-day
    relation — never a single-partition window over all endpoints. The
    endpoint relation is 2 rows per session (not per event), the final
    max/argmax is an ungrouped map-side-combined agg, and one scalar
    crosses to the driver."""
    sess = sessionize_events(load(spark, sf_dir, "events")).select(
        "user_id",
        "session_idx",
        F.unix_micros("session_start").alias("a_us"),
        (F.unix_micros("session_start") + F.col("duration_us")).alias("b_us"),
    )
    arrive = sess.select(
        "user_id", "session_idx", F.col("a_us").alias("t_us"), F.lit(1).alias("delta")
    )
    depart = sess.select(
        "user_id", "session_idx", F.col("b_us").alias("t_us"), F.lit(-1).alias("delta")
    )
    pts = arrive.unionAll(depart).withColumn(
        "bucket", F.expr(f"t_us DIV {_DAY_US}")  # exact integer division
    )
    order = [F.col("t_us"), F.col("delta").desc(), F.col("user_id"), F.col("session_idx")]
    within = pts.withColumn(
        "w",
        F.sum("delta").over(
            Window.partitionBy("bucket")
            .orderBy(*order)
            .rowsBetween(Window.unboundedPreceding, 0)
        ),
    ).transform(stage)  # feeds bucket totals AND the cum join
    btot = within.groupBy("bucket").agg(F.sum("delta").alias("bsum"))
    # offset = totals of all PRECEDING buckets (one row per day: the
    # ungrouped window runs over the bounded bucket relation only)
    offs = btot.select(
        "bucket",
        F.coalesce(
            F.sum("bsum").over(
                Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, -1)
            ),
            F.lit(0),
        ).alias("off"),
    )
    c = within.join(F.broadcast(offs), "bucket").select(
        "t_us", (F.col("w") + F.col("off")).alias("conc")
    ).transform(stage)  # scanned twice: max then argmax
    mx = c.agg(F.max("conc").alias("peak"))
    at = (
        c.join(F.broadcast(mx), F.col("conc") == F.col("peak"))
        .agg(F.min("t_us").alias("peak_at_us"))
    )
    n = sess.agg(F.count(F.lit(1)).alias("n_sessions"))
    return n.crossJoin(F.broadcast(mx)).crossJoin(F.broadcast(at)).select(
        "n_sessions", F.col("peak").alias("peak_concurrency"), "peak_at_us"
    )


@query(
    "q160_time_weighted_avg",
    oracle="""
    WITH o AS (
        SELECT user_id, epoch_us(ts) AS t_us,
               CAST(ROUND(value * 100) AS BIGINT) AS c,
               LEAD(epoch_us(ts)) OVER w AS t2,
               LEAD(CAST(ROUND(value * 100) AS BIGINT)) OVER w AS c2
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    a AS (
        SELECT user_id,
               COUNT(*) AS n_events,
               MAX(t_us) - MIN(t_us) AS span_us,
               CAST(SUM(CASE WHEN t2 IS NOT NULL THEN
                        CAST(c + c2 AS DECIMAL(19,0)) *
                        CAST(t2 - t_us AS DECIMAL(19,0))
                    ELSE 0 END) AS DECIMAL(38,0)) AS area2
        FROM o GROUP BY user_id
    )
    SELECT user_id, n_events, span_us,
           ROUND(CAST(area2 AS DOUBLE) / 2 / span_us / 100, 6) AS twap
    FROM a WHERE span_us > 0
    ORDER BY user_id
    """,
    tags=("X-21", "W-02", "A-14"),
)
def q160_time_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-entity time-weighted average (TWAP): trapezoidal integration
    of each user's value series over its observed span — the estimate a
    metering/billing pipeline needs when samples are irregular and the
    plain mean over-weights bursty periods. Area accumulates as EXACT
    decimal(38,0) in (cents x microseconds); the final divide is one
    IEEE double op on bit-identical operands in both engines.

    Scale shape: one shuffle on user_id, one lead() window pass per
    user's ordered series, then a map-side-combined grouped agg —
    millions of independent small series, no self-join, and only
    (key, 4 numbers) crosses the final exchange. Single-point series
    (zero span) are excluded by an integer-exact test."""
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    d19 = "decimal(19,0)"
    o = ev.select(
        "user_id",
        F.unix_micros("ts").alias("t_us"),
        F.round(F.col("value") * 100).cast("long").alias("c"),
        "ts",
        "event_id",
    ).select(
        "user_id",
        "t_us",
        "c",
        F.lead("t_us").over(w).alias("t2"),
        F.lead("c").over(w).alias("c2"),
    )
    a = o.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        (F.max("t_us") - F.min("t_us")).alias("span_us"),
        F.sum(
            F.when(
                F.col("t2").isNotNull(),
                (F.col("c") + F.col("c2")).cast(d19)
                * (F.col("t2") - F.col("t_us")).cast(d19),
            ).otherwise(F.lit(0).cast(d19) * F.lit(0).cast(d19))
        ).alias("area2"),
    )
    return (
        a.filter(F.col("span_us") > 0)
        .select(
            "user_id",
            "n_events",
            "span_us",
            F.round(
                F.col("area2").cast("double") / 2 / F.col("span_us") / 100, 6
            ).alias("twap"),
        )
        .transform(pin)
        .orderBy("user_id")
    )


_ROLL_DAYS = 7  #: trailing window width for rolling active users


@query(
    "q175_rolling_active_users",
    oracle=f"""
    WITH du AS (
        SELECT DISTINCT CAST(CAST(ts AS DATE) AS TIMESTAMP) AS day, user_id
        FROM events
    ),
    spine AS (SELECT DISTINCT day FROM du),
    expanded AS (
        SELECT DISTINCT du.day + o.o * INTERVAL 1 DAY AS tday, du.user_id
        FROM du CROSS JOIN (SELECT range AS o FROM range({_ROLL_DAYS})) o
    )
    SELECT s.day,
           COUNT(*) AS active_{_ROLL_DAYS}d
    FROM spine s JOIN expanded e ON s.day = e.tday
    GROUP BY s.day
    ORDER BY s.day
    """,
    tags=("X-21", "A-04", "A-06"),
)
def q175_rolling_active_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 7-day active users per day (the WAU curve): for each
    calendar day with data, the count of distinct users seen in the
    trailing 7-day window — the growth metric every product dashboard
    leads with, and the canonical "sliding distinct" that naive SQL
    writes as a per-day range self-join.

    Scale shape: the fact reduces to DISTINCT (day, user) once (one
    shuffle, map-side combined); each activity row then fans out
    MAP-ONLY to the <=7 future days it keeps the user active for (the
    bounded-explode reduction of the range join — fan-out is the window
    width, never the day count); a second distinct collapses multi-day
    users per window and the final count groups per day. The day spine
    join is broadcast. Works identically as an HLL-sketch merge (A-13)
    when exact distincts get too wide — same dataflow, swap the agg."""
    ev = load(spark, sf_dir, "events")
    du = (
        ev.select(F.date_trunc("day", F.col("ts")).alias("day"), "user_id")
        .distinct()
        .transform(stage)  # reused by the spine AND the fan-out
    )
    spine = du.select("day").distinct()
    offsets = spark.range(_ROLL_DAYS).select(F.col("id").cast("int").alias("o"))
    expanded = (
        du.crossJoin(F.broadcast(offsets))
        .select(F.expr("timestampadd(DAY, o, day)").alias("tday"), "user_id")
        .distinct()
    )
    return (
        expanded.join(F.broadcast(spine), F.col("tday") == F.col("day"), "left_semi")
        .groupBy(F.col("tday").alias("day"))
        .agg(F.count(F.lit(1)).alias(f"active_{_ROLL_DAYS}d"))
        .transform(pin)
        .orderBy("day")
    )


# ---------------------------------------------------------------------------
# X-21 (cont.): cumulative-distinct growth curve (new users by first activity)
# ---------------------------------------------------------------------------


@query(
    "q209_new_user_growth",
    oracle="""
    WITH first_day AS (
        SELECT user_id, MIN(date_trunc('day', ts)) AS day
        FROM events GROUP BY user_id
    ),
    daily AS (
        SELECT day, CAST(COUNT(*) AS BIGINT) AS new_users
        FROM first_day GROUP BY day
    )
    SELECT day, new_users,
           CAST(SUM(new_users) OVER (
               ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS BIGINT) AS cum_users
    FROM daily ORDER BY day
    """,
    tags=("X-21", "W-03"),
)
def q209_new_user_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative-distinct growth curve: per day, how many users were seen
    for the FIRST time, and the running total — i.e. count(distinct user)
    over an ever-growing prefix, rewritten so no day re-scans history:
    distinct-over-growing-window collapses to min(day) per user + a
    cumulative sum (each user contributes exactly once, on their first
    day). The acquisition complement of q175's rolling active-users curve
    (q175: how many are CURRENTLY active; this: how many have EVER been).

    Scale shape: ONE user-keyed rollup (map-side combined) reduces the
    fact to one row per user; the per-day counts and the running sum then
    live on the CALENDAR-bounded day relation — more data adds rows to
    the rollup, not days to the curve, so the single cumulative window
    scans a few-hundred-row relation (the q179 bounded-relation window
    precedent). All integers; no ties to break (day is the sort key)."""
    ev = load(spark, sf_dir, "events")
    first_day = ev.groupBy("user_id").agg(
        F.min(F.date_trunc("day", F.col("ts"))).alias("day")
    )
    daily = first_day.groupBy("day").agg(
        F.count(F.lit(1)).cast("long").alias("new_users")
    )
    wcum = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    return (
        daily.select(
            "day",
            "new_users",
            F.sum("new_users").over(wcum).cast("long").alias("cum_users"),
        )
        .transform(pin)
        .orderBy("day")
    )


# ---------------------------------------------------------------------------
# X-21 (cont.): DAU/WAU stickiness ratio
# ---------------------------------------------------------------------------


@query(
    "q228_stickiness",
    oracle=f"""
    WITH du AS (
        SELECT DISTINCT CAST(CAST(ts AS DATE) AS TIMESTAMP) AS day, user_id
        FROM events
    ),
    dau AS (
        SELECT day, CAST(COUNT(*) AS BIGINT) AS dau FROM du GROUP BY day
    ),
    spine AS (SELECT DISTINCT day FROM du),
    expanded AS (
        SELECT DISTINCT du.day + o.o * INTERVAL 1 DAY AS tday, du.user_id
        FROM du CROSS JOIN (SELECT range AS o FROM range({_ROLL_DAYS})) o
    ),
    wau AS (
        SELECT s.day, CAST(COUNT(*) AS BIGINT) AS wau
        FROM spine s JOIN expanded e ON s.day = e.tday
        GROUP BY s.day
    )
    SELECT dau.day, dau.dau, wau.wau,
           ROUND(CAST(dau.dau AS DOUBLE) / wau.wau, 6) AS stickiness
    FROM dau JOIN wau ON dau.day = wau.day
    ORDER BY dau.day
    """,
    tags=("X-21", "A-04"),
)
def q228_stickiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAU/WAU stickiness: per day, daily actives over trailing-7-day
    actives — the engagement-frequency ratio ("what share of this week's
    users showed up today") product teams track beside the raw q175
    curve; near 1/7 means once-a-week usage, near 1 means daily habits.

    Scale shape: both counts derive from the SAME distinct (day, user)
    relation — DAU as its per-day rollup, WAU via q175's bounded-explode
    reduction of the trailing window (fan-out = window width, never day
    count); the final join is on the calendar-bounded day spine. One
    exact division, round 6."""
    ev = load(spark, sf_dir, "events")
    du = (
        ev.select(
            F.col("ts").cast("date").cast("timestamp").alias("day"), "user_id"
        )
        .distinct()
        .transform(stage)  # feeds DAU, the spine, and the WAU expansion
    )
    dau = du.groupBy("day").agg(F.count(F.lit(1)).cast("long").alias("dau"))
    spine = du.select("day").distinct()
    offsets = spark.range(_ROLL_DAYS).select(F.col("id").cast("int").alias("o"))
    expanded = (
        du.crossJoin(F.broadcast(offsets))
        .select(F.expr("timestampadd(DAY, o, day)").alias("tday"), "user_id")
        .distinct()
    )
    wau = (
        expanded.join(F.broadcast(spine), F.col("tday") == F.col("day"), "left_semi")
        .groupBy(F.col("tday").alias("day"))
        .agg(F.count(F.lit(1)).cast("long").alias("wau"))
    )
    return (
        dau.join(wau, "day")
        .select(
            "day",
            "dau",
            "wau",
            F.round(F.col("dau").cast("double") / F.col("wau"), 6).alias("stickiness"),
        )
        .transform(pin)
        .orderBy("day")
    )


# ---------------------------------------------------------------------------
# X-51: interval union / coverage (merge overlapping activity windows)
# ---------------------------------------------------------------------------

_ACT_WIN_S = 1800  #: each event opens a 30-minute activity interval


_COVERAGE_ORACLE = f"""
    WITH e AS (
        SELECT user_id, event_id,
               CAST(FLOOR(epoch(ts)) AS BIGINT) AS es
        FROM events
    ),
    flags AS (
        SELECT user_id, es,
               CASE WHEN MAX(es + {_ACT_WIN_S}) OVER
                        (PARTITION BY user_id ORDER BY es, event_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                        IS NULL
                      OR es > MAX(es + {_ACT_WIN_S}) OVER
                        (PARTITION BY user_id ORDER BY es, event_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                    THEN 1 ELSE 0 END AS new_island,
               event_id
        FROM e
    ),
    isl AS (
        SELECT user_id, es,
               CAST(SUM(new_island) OVER
                    (PARTITION BY user_id ORDER BY es, event_id
                     ROWS UNBOUNDED PRECEDING) AS BIGINT) AS island
        FROM flags
    ),
    merged AS (
        SELECT user_id, island,
               CAST(COUNT(*) AS BIGINT) AS n_ev,
               MAX(es) + {_ACT_WIN_S} - MIN(es) AS len_s
        FROM isl GROUP BY user_id, island
    )
    SELECT user_id,
           CAST(SUM(n_ev) AS BIGINT) AS n_events,
           CAST(COUNT(*) AS BIGINT) AS n_islands,
           CAST(SUM(len_s) AS BIGINT) AS covered_s,
           MAX(len_s) AS max_island_s
    FROM merged GROUP BY user_id ORDER BY user_id
"""


@query("q247_interval_coverage", oracle=_COVERAGE_ORACLE, tags=("X-51", "W-03"))
def q247_interval_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval union (overlapping-interval merge): every event opens a
    30-minute activity window; overlapping/touching windows coalesce, and
    each user reports merged-interval count, total covered seconds, and
    the longest contiguous stretch.  The continuous-time generalization
    of q226's day-granularity streaks — billing engines (covered minutes),
    SLA monitors (outage union), and ad-exposure models all need the UNION
    of intervals, which a naive sum of window lengths double-counts.

    Declarative merge, no per-key loop: an interval starts a new island
    exactly when its start exceeds the running MAX of all previous ends
    (classic gaps-and-islands over a running max), the island id is the
    running sum of those flags, and a grouped rollup per island yields the
    merged extents.

    Scale shape: ONE hash exchange (user_id) — both windows share the
    (user, es, event_id) sort and both rollups group the already
    co-located key, the q246 single-exchange discipline.  Pure int64
    epoch-second arithmetic end to end, so engine-exact at any scale."""
    e = load(spark, sf_dir, "events").select(
        "user_id", "event_id", F.unix_timestamp("ts").alias("es")
    )
    w = Window.partitionBy("user_id").orderBy("es", "event_id")
    prev_end = F.max(F.col("es") + _ACT_WIN_S).over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    flagged = e.withColumn(
        "new_island",
        F.when(prev_end.isNull() | (F.col("es") > prev_end), 1).otherwise(0),
    )
    isl = flagged.withColumn(
        "island",
        F.sum("new_island").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    merged = isl.groupBy("user_id", "island").agg(
        F.count(F.lit(1)).cast("long").alias("n_ev"),
        (F.max("es") + _ACT_WIN_S - F.min("es")).alias("len_s"),
    )
    return (
        merged.groupBy("user_id")
        .agg(
            F.sum("n_ev").cast("long").alias("n_events"),
            F.count(F.lit(1)).cast("long").alias("n_islands"),
            F.sum("len_s").cast("long").alias("covered_s"),
            F.max("len_s").alias("max_island_s"),
        )
        .transform(pin)
        .orderBy("user_id")
    )
