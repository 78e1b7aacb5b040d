"""Time-series smoothing and robust anomaly detection (SURVEY.md §2K
extension X-20): finite-lookback exponential moving average and
median/MAD outlier flagging — the monitoring-grade feature ops a metrics
pipeline runs over event streams (the reference's dashboards plot raw
per-minute counts, vehicle streamlit_app.py:111-124; smoothing and
anomaly flags are the obvious next derivative and declared engine
surface here).

Determinism: EWMA runs entirely in scaled INTEGER arithmetic (values in
cents, weights 0.5^j as 5^j*10^(7-j)) with one final double division, so
no decimal-typing or float-order hazard exists in either engine;
median/MAD reuse the A-12 exact-percentile path proven bit-equal to
DuckDB's quantile_cont (q75), and the 3*MAD comparison is IEEE-identical
in both engines because its operands are.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.deterministic import oracle_dsum
from ..functions.ordering import pin, stage
from ..tables import load
from .registry import query

_EWMA_LAGS = 8  #: current value + 7 lags
_WSCALE = 10**7  #: weight denominator: w_j = 5^j * 10^(7-j) over 10^7

#: integer weights, exactly 0.5^j * 10^7 for j = 0..7
_IW = [5**j * 10 ** (7 - j) for j in range(_EWMA_LAGS)]


def _ewma_oracle() -> str:
    lag_cols = ",\n               ".join(
        f"lag(xc, {j}) OVER w AS xc{j}" for j in range(1, _EWMA_LAGS)
    )
    num = " + ".join(
        [f"xc * {_IW[0]}"]
        + [f"COALESCE(xc{j} * {_IW[j]}, 0)" for j in range(1, _EWMA_LAGS)]
    )
    den = " + ".join(
        [f"{_IW[0]}"]
        + [
            f"CASE WHEN xc{j} IS NOT NULL THEN {_IW[j]} ELSE 0 END"
            for j in range(1, _EWMA_LAGS)
        ]
    )
    return f"""
    WITH daily AS (
        SELECT user_id, date_trunc('day', ts) AS day,
               SUM(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)) AS xc
        FROM events GROUP BY user_id, date_trunc('day', ts)
    ),
    lagged AS (
        SELECT user_id, day, xc,
               {lag_cols}
        FROM daily
        WINDOW w AS (PARTITION BY user_id ORDER BY day)
    )
    SELECT user_id, day,
           ROUND(CAST(xc AS DOUBLE) / 100, 2) AS x,
           ROUND(CAST({num} AS DOUBLE) / CAST({den} AS DOUBLE) / 100, 6) AS ewma
    FROM lagged ORDER BY user_id, day
    """


@query("q141_ewma_smoothing", oracle=_ewma_oracle(), tags=("X-20", "W-02"))
def q141_ewma_smoothing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Finite-lookback EWMA (alpha=0.5, 8 taps) over each user's daily
    value series: ewma_t = sum_j 0.5^j * x_{t-j} / sum_j 0.5^j, the sums
    running only over taps that exist (series starts are renormalized,
    not zero-padded). The recursive EWMA truncated at 8 taps differs
    from the infinite one by < 0.5^8 of the signal — and unlike the
    recursion it is expressible as a pure window computation, no
    sequential scan. All arithmetic is scaled-integer (values in cents,
    weights 5^j*10^(7-j)), so both engines divide bit-identical operands.

    Scale shape: one shuffle for the daily rollup (map-side combined),
    one window pass per user ordered by day (the partition key is the
    user — millions of small independent series, no global sort; max
    term magnitude ~1e13, far inside int64). Lag-based = 'previous
    OBSERVED day' semantics; calendar regularization is q123's resample
    operator, composable upstream."""
    ev = load(spark, sf_dir, "events")
    daily = ev.groupBy(
        "user_id", F.date_trunc("day", F.col("ts")).alias("day")
    ).agg(
        F.sum((F.col("value").cast("decimal(18,2)") * 100).cast("long")).alias("xc")
    )
    w = Window.partitionBy("user_id").orderBy("day")
    lagged = daily
    for j in range(1, _EWMA_LAGS):
        lagged = lagged.withColumn(f"xc{j}", F.lag("xc", j).over(w))
    num = F.col("xc") * _IW[0]
    den = F.lit(_IW[0]).cast("long")
    for j in range(1, _EWMA_LAGS):
        num = num + F.coalesce(F.col(f"xc{j}") * _IW[j], F.lit(0).cast("long"))
        den = den + F.when(F.col(f"xc{j}").isNotNull(), _IW[j]).otherwise(0)
    return (
        lagged.select(
            "user_id",
            "day",
            F.round(F.col("xc").cast("double") / 100, 2).alias("x"),
            F.round(num.cast("double") / den.cast("double") / 100, 6).alias("ewma"),
        )
        .transform(pin)
        .orderBy("user_id", "day")
    )


@query(
    "q142_mad_outliers",
    oracle=f"""
    WITH med AS (
        SELECT event_type, quantile_cont(value, 0.5) AS med
        FROM events GROUP BY event_type
    ),
    dev AS (
        SELECT e.event_type, e.value, m.med, ABS(e.value - m.med) AS dev
        FROM events e JOIN med m USING (event_type)
    ),
    mad AS (
        SELECT event_type, quantile_cont(dev, 0.5) AS mad
        FROM dev GROUP BY event_type
    )
    SELECT d.event_type,
           COUNT(*) AS n_rows,
           ROUND(MIN(d.med), 6) AS med,
           ROUND(MIN(m.mad), 6) AS mad,
           COUNT(CASE WHEN d.dev > 3 * m.mad THEN 1 END) AS n_outliers,
           {oracle_dsum("CASE WHEN d.dev > 3 * m.mad THEN d.value ELSE 0 END", 2)}
               AS outlier_value_sum
    FROM dev d JOIN mad m USING (event_type)
    GROUP BY d.event_type
    ORDER BY d.event_type
    """,
    tags=("X-20", "A-12"),
)
def q142_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust per-group outlier detection: flag values whose absolute
    deviation from the group MEDIAN exceeds 3x the group MAD (median
    absolute deviation) — the monitoring-standard detector that, unlike
    z-scores (q101), is not itself dragged by the outliers it hunts.
    Reports per-group row count, median, MAD, outlier count and the
    decimal-exact sum of outlying values.

    Scale shape: two grouped exact-percentile aggregations (the A-12
    path, one shuffle each on the small group key) with the per-group
    scalars BROADCAST back onto the fact rows both times — the fact
    relation itself never reshuffles; flagging and the final rollup are
    map-side combined. At 100 TB swap the exact percentile for
    approx_percentile and keep the identical dataflow."""
    ev = load(spark, sf_dir, "events").select("event_type", "value")
    med = ev.groupBy("event_type").agg(F.expr("percentile(value, 0.5)").alias("med"))
    dev = ev.join(F.broadcast(med), "event_type").withColumn(
        "dev", F.abs(F.col("value") - F.col("med"))
    )
    mad = dev.groupBy("event_type").agg(F.expr("percentile(dev, 0.5)").alias("mad"))
    flagged = dev.join(F.broadcast(mad), "event_type")
    out = F.col("dev") > 3 * F.col("mad")
    return (
        flagged.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.round(F.min("med"), 6).alias("med"),
            F.round(F.min("mad"), 6).alias("mad"),
            F.sum(F.when(out, 1).otherwise(0)).alias("n_outliers"),
            F.sum(F.when(out, F.col("value")).otherwise(F.lit(0)).cast("decimal(28,2)"))
            .cast("double")
            .alias("outlier_value_sum"),
        )
        .transform(pin)
        .orderBy("event_type")
    )


@query(
    "q153_winsorized_mean",
    oracle=f"""
    WITH cuts AS (
        SELECT event_type,
               quantile_cont(value, 0.05) AS lo,
               quantile_cont(value, 0.95) AS hi
        FROM events GROUP BY event_type
    ),
    clipped AS (
        SELECT e.event_type,
               CASE WHEN e.value < c.lo THEN c.lo
                    WHEN e.value > c.hi THEN c.hi
                    ELSE e.value END AS v
        FROM events e JOIN cuts c USING (event_type)
    )
    SELECT cl.event_type,
           COUNT(*) AS n_rows,
           ROUND(MIN(c.lo), 6) AS lo,
           ROUND(MIN(c.hi), 6) AS hi,
           ROUND(CAST(SUM(CAST(ROUND(cl.v * 100) AS BIGINT)) AS DOUBLE)
                 / COUNT(*) / 100, 6) AS winsorized_mean
    FROM clipped cl JOIN cuts c USING (event_type)
    GROUP BY cl.event_type
    ORDER BY cl.event_type
    """,
    tags=("X-20", "A-12"),
)
def q153_winsorized_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorized mean per group: values clipped to the exact [p05, p95]
    percentile band before averaging — the robust location estimate that,
    unlike trimming, keeps the sample size (clipped rows pull to the
    fence instead of vanishing). The metric to report when q142's MAD
    pass shows the plain mean is outlier-dragged.

    Determinism: the fences come from the A-12 exact-percentile path
    (bit-equal interpolation in both engines, q75); clipped values are
    quantized to cents (exact 2-dp inputs, and the fences' sub-cent
    interpolation rounds identically under HALF-AWAY in both engines)
    and accumulate as exact int64, with one final double division.

    Scale shape: one grouped percentile agg (small group key), fences
    BROADCAST back onto the fact scan, clip + quantize map-only in
    codegen, final rollup map-side combined — the fact never reshuffles."""
    ev = load(spark, sf_dir, "events").select("event_type", "value")
    cuts = ev.groupBy("event_type").agg(
        F.expr("percentile(value, 0.05)").alias("lo"),
        F.expr("percentile(value, 0.95)").alias("hi"),
    )
    clipped = ev.join(F.broadcast(cuts), "event_type").select(
        "event_type",
        "lo",
        "hi",
        F.when(F.col("value") < F.col("lo"), F.col("lo"))
        .when(F.col("value") > F.col("hi"), F.col("hi"))
        .otherwise(F.col("value"))
        .alias("v"),
    )
    return (
        clipped.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.round(F.min("lo"), 6).alias("lo"),
            F.round(F.min("hi"), 6).alias("hi"),
            F.round(
                F.sum(F.round(F.col("v") * 100).cast("long")).cast("double")
                / F.count(F.lit(1))
                / 100,
                6,
            ).alias("winsorized_mean"),
        )
        .transform(pin)
        .orderBy("event_type")
    )


@query(
    "q154_group_trend",
    oracle="""
    WITH m AS (
        SELECT user_id,
               COUNT(*) AS n,
               CAST(SUM((epoch_us(ts) - 1704067200000000) // 1000000)
                    AS BIGINT) AS sx,
               CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS sy,
               CAST(SUM(CAST((epoch_us(ts) - 1704067200000000) // 1000000
                        AS DECIMAL(19,0))
                        * CAST((epoch_us(ts) - 1704067200000000) // 1000000
                          AS DECIMAL(19,0))) AS DECIMAL(38,0)) AS sxx,
               CAST(SUM(CAST((epoch_us(ts) - 1704067200000000) // 1000000
                        AS DECIMAL(19,0))
                        * CAST(CAST(ROUND(value * 100) AS BIGINT) AS DECIMAL(19,0)))
                    AS DECIMAL(38,0)) AS sxy
        FROM events GROUP BY user_id
    )
    SELECT user_id, n,
           ROUND((n * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * sy)
                 / (n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * sx)
                 * 864, 6) AS slope_cents_per_day,
           ROUND(CAST(sy AS DOUBLE) / n / 100, 6) AS mean_value
    FROM m
    WHERE n >= 2 AND n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * sx <> 0
    ORDER BY user_id
    """,
    tags=("X-20", "A-14"),
)
def q154_group_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-entity OLS trend: the least-squares slope of each user's value
    over time (reported in cents/day) from EXACT integer moments — x in
    whole seconds since 2024-01-01, y in cents, so n, Σx, Σy are int64
    and Σx², Σxy exact decimal(38,0); the slope division is one IEEE
    double op on bit-identical operands. The per-KEY counterpart of
    q122's ungrouped moment engine: this is how 'is this metric drifting
    per customer?' runs over a billion entities.

    Scale shape: ONE map-side-combined grouped aggregate — the five
    moments are algebraically mergeable (A-14), so shards/days combine
    without rescanning, and nothing but (key, 5 numbers) crosses the
    exchange. Degenerate series (n<2 or zero time variance) are excluded
    identically in both engines by integer-exact tests.

    (864 = 86400 seconds/day ÷ 100 cents: converts cents/second·100 to
    cents/day.)"""
    ev = load(spark, sf_dir, "events")
    x = ((F.unix_micros("ts") - F.lit(1704067200000000)) / 1000000).cast("long")
    y = F.round(F.col("value") * 100).cast("long")
    d19 = "decimal(19,0)"
    m = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x).alias("sx"),
        F.sum(y).alias("sy"),
        F.sum(x.cast(d19) * x.cast(d19)).alias("sxx"),
        F.sum(x.cast(d19) * y.cast(d19)).alias("sxy"),
    )
    den = F.col("n") * F.col("sxx").cast("double") - F.col("sx").cast("double") * F.col("sx")
    num = F.col("n") * F.col("sxy").cast("double") - F.col("sx").cast("double") * F.col("sy")
    return (
        m.filter((F.col("n") >= 2) & (den != 0))
        .select(
            "user_id",
            "n",
            F.round(num / den * 864, 6).alias("slope_cents_per_day"),
            F.round(F.col("sy").cast("double") / F.col("n") / 100, 6).alias("mean_value"),
        )
        .transform(pin)
        .orderBy("user_id")
    )


@query(
    "q180_seasonal_profile",
    oracle="""
    WITH cells AS (
        SELECT CAST(dayofweek(ts) + 1 AS INT) AS dow,
               CAST(hour(ts) AS INT) AS hr,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS cents
        FROM events GROUP BY 1, 2
    ),
    tot AS (SELECT CAST(SUM(n) AS BIGINT) AS total FROM cells)
    SELECT dow, hr, n,
           ROUND(CAST(cents AS DOUBLE) / (100.0 * n), 6) AS avg_value,
           ROUND(CAST(n * 168 AS DOUBLE) / total, 6) AS load_index
    FROM cells CROSS JOIN tot
    ORDER BY dow, hr
    """,
    tags=("X-20", "A-06", "A-08"),
)
def q180_seasonal_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-of-week x hour-of-day seasonal load profile: event count, mean
    value, and load index (cell traffic vs the uniform-168-cell
    expectation; 1.0 = average hour, 2.0 = double load) — the seasonality
    baseline a capacity planner or anomaly detector normalizes against
    before flagging deviations (the X-20 EWMA/MAD ops flag points; this
    is the calendar structure they should first be de-trended by).

    Scale shape: dow/hour extraction is map-only codegen; the rollup is
    map-side combined onto the BOUNDED 7x24 = 168-cell relation; the
    grand total derives from those 168 rows and broadcasts back.  Mean
    value accumulates exact integer cents with ONE final division; the
    load index is exact-integer n*168 over the total, one division."""
    ev = load(spark, sf_dir, "events").select(
        F.dayofweek("ts").alias("dow"),
        F.hour("ts").alias("hr"),
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    cells = ev.groupBy("dow", "hr").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("cents").cast("long").alias("cents"),
    )
    tot = cells.agg(F.sum("n").cast("long").alias("total"))
    return (
        cells.crossJoin(F.broadcast(tot))
        .select(
            "dow",
            "hr",
            "n",
            F.round(F.col("cents").cast("double") / (100.0 * F.col("n")), 6).alias(
                "avg_value"
            ),
            F.round((F.col("n") * 168).cast("double") / F.col("total"), 6).alias(
                "load_index"
            ),
        )
        .orderBy("dow", "hr")
    )


@query(
    "q184_seasonal_anomaly",
    oracle="""
    WITH f AS (
        SELECT CAST(dayofweek(ts) + 1 AS INT) AS dow,
               CAST(hour(ts) AS INT) AS hr,
               CAST(ROUND(value * 100) AS BIGINT) AS cents
        FROM events
    ),
    cells AS (
        SELECT dow, hr,
               CAST(COUNT(*) AS DECIMAL(38,0)) AS n,
               CAST(SUM(cents) AS DECIMAL(38,0)) AS s,
               CAST(SUM(CAST(cents AS DECIMAL(38,0)) * cents) AS DECIMAL(38,0)) AS s2
        FROM f GROUP BY dow, hr
    ),
    flagged AS (
        SELECT f.dow, f.hr,
               CASE WHEN (n * cents - s) * (n * cents - s)
                         > 9 * (n * s2 - s * s)
                    THEN 1 ELSE 0 END AS anom
        FROM f JOIN cells ON f.dow = cells.dow AND f.hr = cells.hr
    )
    SELECT dow, hr, CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(anom) AS BIGINT) AS n_anom,
           ROUND(CAST(SUM(anom) AS DOUBLE) / COUNT(*), 6) AS anom_rate
    FROM flagged GROUP BY dow, hr
    ORDER BY dow, hr
    """,
    tags=("X-20", "A-08", "J-02"),
)
def q184_seasonal_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonality-aware anomaly counts: each event is tested against ITS
    OWN calendar cell's mean/std (q180's dow x hour baseline) instead of
    a global threshold — |v - mean| > 3 sigma rewritten into the EXACT
    integer inequality (n*cents - s)^2 > 9*(n*s2 - s^2), so the flag
    needs no division, no sqrt, and no float anywhere (the q142 MAD
    op flags against a global robust center; this one de-trends by
    calendar cell first).

    Scale shape: the classic two-pass — one map-side-combined moments
    rollup onto the BOUNDED 168-cell relation (staged), then the fact
    re-scans once and joins those stats by BROADCAST, flag map-only, and
    the final rollup is again map-side combined onto 168 cells.  The
    fact never shuffles."""
    f = load(spark, sf_dir, "events").select(
        F.dayofweek("ts").alias("dow"),
        F.hour("ts").alias("hr"),
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    d38 = "decimal(38,0)"
    cells = (
        f.groupBy("dow", "hr")
        .agg(
            F.count(F.lit(1)).cast(d38).alias("n"),
            F.sum("cents").cast(d38).alias("s"),
            F.sum(F.col("cents").cast(d38) * F.col("cents")).cast(d38).alias("s2"),
        )
        .transform(stage)
    )
    dev = F.col("n") * F.col("cents") - F.col("s")
    anom = F.when(
        dev * dev > 9 * (F.col("n") * F.col("s2") - F.col("s") * F.col("s")), 1
    ).otherwise(0)
    flagged = f.join(F.broadcast(cells), ["dow", "hr"]).select(
        "dow", "hr", anom.alias("anom")
    )
    return (
        flagged.groupBy("dow", "hr")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("anom").cast("long").alias("n_anom"),
        )
        .select(
            "dow",
            "hr",
            "n",
            "n_anom",
            F.round(F.col("n_anom").cast("double") / F.col("n"), 6).alias("anom_rate"),
        )
        .orderBy("dow", "hr")
    )


# ---------------------------------------------------------------------------
# X-20 (cont.): autocorrelation function of the daily series
# ---------------------------------------------------------------------------

_ACF_LAGS = (1, 2, 3)


def _acf_oracle() -> str:
    lag_structs = ", ".join(
        f"{{'lag': {k}, 'x': xc, 'y': lag(xc, {k}) OVER w}}" for k in _ACF_LAGS
    )
    return f"""
    WITH daily AS (
        SELECT event_type, date_trunc('day', ts) AS day,
               SUM(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)) AS xc
        FROM events GROUP BY event_type, date_trunc('day', ts)
    ),
    pairs AS (
        SELECT event_type, p.lag AS lag, p.x AS x, p.y AS y
        FROM (
            SELECT event_type, unnest([{lag_structs}]) AS p
            FROM daily
            WINDOW w AS (PARTITION BY event_type ORDER BY day)
        )
        WHERE p.y IS NOT NULL
    ),
    m AS (
        SELECT event_type, lag,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CAST(x AS HUGEINT)) AS HUGEINT) AS sx,
               CAST(SUM(CAST(y AS HUGEINT)) AS HUGEINT) AS sy,
               CAST(SUM(CAST(x AS HUGEINT) * y) AS HUGEINT) AS sxy,
               CAST(SUM(CAST(x AS HUGEINT) * x) AS HUGEINT) AS sx2,
               CAST(SUM(CAST(y AS HUGEINT) * y) AS HUGEINT) AS sy2
        FROM pairs GROUP BY event_type, lag
    )
    SELECT event_type, lag, n AS n_pairs,
           CASE WHEN n * sx2 - sx * sx > 0 AND n * sy2 - sy * sy > 0 THEN
               ROUND(CAST(n * sxy - sx * sy AS DOUBLE)
                     / (sqrt(CAST(n * sx2 - sx * sx AS DOUBLE))
                        * sqrt(CAST(n * sy2 - sy * sy AS DOUBLE))), 6)
           END AS acf
    FROM m ORDER BY event_type, lag
    """


@query("q207_autocorrelation", oracle=_acf_oracle(), tags=("X-20", "W-02", "A-14"))
def q207_autocorrelation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Autocorrelation function (lags 1-3) of each event type's daily
    value series — THE seasonality/persistence read a forecasting
    pipeline runs before picking model order (high ACF(1): momentum;
    ACF(7) spikes: weekly cycle), and the statistic that tells q141's
    EWMA whether smoothing is even warranted. Lag-k pairs follow q141's
    'previous OBSERVED day' semantics (calendar regularization is q123's
    resample, composable upstream); Pearson r computes from EXACT integer
    moments (cents; sums as decimal(38,0) / HUGEINT in the oracle), so
    both engines divide and sqrt bit-identical operands — round 6 dp.

    Scale shape: the fact reduces map-side to the bounded (type x day)
    daily relation; ONE window pass per type builds all three lag pairs
    (the lag structs explode map-only, fan-out = |lags|); the moment agg
    is A-14-mergeable (6 numbers per (type, lag) cross the exchange).
    Zero-variance series yield NULL identically in both engines."""
    ev = load(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.date_trunc("day", F.col("ts")).alias("day")
    ).agg(
        F.sum((F.col("value").cast("decimal(18,2)") * 100).cast("long")).alias("xc")
    )
    w = Window.partitionBy("event_type").orderBy("day")
    lagged = daily.select(
        "event_type",
        "xc",
        *[F.lag("xc", k).over(w).alias(f"l{k}") for k in _ACF_LAGS],
    )
    pairs = (
        lagged.select(
            "event_type",
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(k).alias("lag"),
                            F.col("xc").alias("x"),
                            F.col(f"l{k}").alias("y"),
                        )
                        for k in _ACF_LAGS
                    ]
                )
            ).alias("p"),
        )
        .select("event_type", "p.lag", "p.x", "p.y")
        .where(F.col("y").isNotNull())
    )
    d0 = "decimal(38,0)"
    m = pairs.groupBy("event_type", "lag").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.col("x").cast(d0)).cast(d0).alias("sx"),
        F.sum(F.col("y").cast(d0)).cast(d0).alias("sy"),
        F.sum((F.col("x").cast(d0) * F.col("y"))).cast(d0).alias("sxy"),
        F.sum((F.col("x").cast(d0) * F.col("x"))).cast(d0).alias("sx2"),
        F.sum((F.col("y").cast(d0) * F.col("y"))).cast(d0).alias("sy2"),
    )
    n = F.col("n").cast(d0)
    vx = n * F.col("sx2") - F.col("sx") * F.col("sx")
    vy = n * F.col("sy2") - F.col("sy") * F.col("sy")
    cov = n * F.col("sxy") - F.col("sx") * F.col("sy")
    return (
        m.select(
            "event_type",
            "lag",
            F.col("n").alias("n_pairs"),
            F.when(
                (vx > 0) & (vy > 0),
                F.round(
                    cov.cast("double")
                    / (F.sqrt(vx.cast("double")) * F.sqrt(vy.cast("double"))),
                    6,
                ),
            ).alias("acf"),
        )
        .transform(pin)
        .orderBy("event_type", "lag")
    )


# ---------------------------------------------------------------------------
# X-20 (cont.): seasonal-naive forecast backtest (MAE / sMAPE skill read)
# ---------------------------------------------------------------------------

_SN_LAG_DAYS = 7


@query(
    "q219_seasonal_naive_backtest",
    oracle=f"""
    WITH daily AS (
        SELECT event_type, date_trunc('day', ts) AS day,
               SUM(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)) AS xc
        FROM events GROUP BY event_type, date_trunc('day', ts)
    ),
    paired AS (
        SELECT a.event_type, a.day, a.xc, f.xc AS fc
        FROM daily a
        JOIN daily f ON f.event_type = a.event_type
                    AND f.day = a.day - INTERVAL {_SN_LAG_DAYS} DAY
    ),
    terms AS (
        SELECT event_type,
               abs(xc - fc) AS ae,
               ROUND(2.0 * abs(xc - fc) / (abs(xc) + abs(fc)), 9) AS smape_t
        FROM paired
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_days,
           ROUND(CAST(SUM(CAST(ae AS HUGEINT)) AS DOUBLE) / COUNT(*) / 100, 6)
               AS mae,
           ROUND(CAST(SUM(CAST(smape_t AS DECIMAL(28,9))) AS DOUBLE) / COUNT(*), 6)
               AS smape
    FROM terms GROUP BY event_type ORDER BY event_type
    """,
    tags=("X-20", "J-01"),
)
def q219_seasonal_naive_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal-naive forecast backtest: predict each day's per-type total
    with the value from 7 CALENDAR days earlier and score the prediction
    with MAE and sMAPE — the baseline skill number every real forecast
    model must beat (q154's OLS trend and q141's EWMA are candidate
    models; this is the yardstick; q207's ACF says whether a weekly
    seasonal naive is even the right baseline). Days whose day-7
    predecessor has no data drop out (no forecast exists), which is the
    honest backtest convention.

    Determinism: absolute errors are exact integer cents; each sMAPE
    term is one division of exact integers rounded 9 dp then
    decimal-summed (the q120 discipline); the two final divisions run
    on bit-identical operands.

    Scale shape: ONE map-side-combined rollup reduces the fact to the
    calendar-bounded daily relation; the forecast pairing is a self-join
    of that bounded relation CO-KEYED on event_type (never a fact
    self-join); the skill rollup is map-side combined onto |types|
    rows."""
    ev = load(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.date_trunc("day", F.col("ts")).alias("day")
    ).agg(
        F.sum((F.col("value").cast("decimal(18,2)") * 100).cast("long")).alias("xc")
    ).transform(stage)  # bounded daily relation, feeds both join legs
    f = daily.select(
        "event_type",
        (F.col("day") + F.expr(f"INTERVAL {_SN_LAG_DAYS} DAYS")).alias("day"),
        F.col("xc").alias("fc"),
    )
    paired = daily.join(f, ["event_type", "day"])
    ae = F.abs(F.col("xc") - F.col("fc"))
    smape_t = F.round(
        2.0 * ae / (F.abs(F.col("xc")) + F.abs(F.col("fc"))), 9
    )
    terms = paired.select("event_type", ae.alias("ae"), smape_t.alias("smape_t"))
    return (
        terms.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_days"),
            F.round(
                F.sum(F.col("ae").cast("decimal(38,0)")).cast("double")
                / F.count(F.lit(1))
                / 100,
                6,
            ).alias("mae"),
            F.round(
                F.sum(F.col("smape_t").cast("decimal(28,9)")).cast("double")
                / F.count(F.lit(1)),
                6,
            ).alias("smape"),
        )
        .transform(pin)
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# X-20 (cont.): one-way ANOVA seasonality strength
# ---------------------------------------------------------------------------


@query(
    "q233_anova_seasonality",
    oracle="""
    WITH c AS (
        SELECT CAST(dayofweek(ts) + 1 AS INT) AS dow,
               CAST(date_part('hour', ts) AS INT) AS hr,
               CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS vc
        FROM events
    ),
    cell AS (
        SELECT dow, hr,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CAST(vc AS HUGEINT)) AS HUGEINT) AS s,
               CAST(SUM(CAST(vc AS HUGEINT) * vc) AS HUGEINT) AS s2
        FROM c GROUP BY dow, hr
    ),
    terms AS (
        SELECT n, s, s2,
               ROUND(CAST(s * s AS DOUBLE) / n, 6) AS sq_over_n
        FROM cell
    ),
    tot AS (
        SELECT CAST(SUM(n) AS BIGINT) AS nn,
               CAST(COUNT(*) AS BIGINT) AS k,
               CAST(SUM(s) AS HUGEINT) AS ss,
               CAST(SUM(s2) AS HUGEINT) AS ss2,
               CAST(SUM(CAST(sq_over_n AS DECIMAL(28,6))) AS DECIMAL(28,6)) AS sqn
        FROM terms
    )
    SELECT nn AS n_events, k AS n_cells,
           ROUND(CAST(sqn AS DOUBLE) - CAST(ss * ss AS DOUBLE) / nn, 2) AS ssb,
           ROUND(CAST(ss2 AS DOUBLE) - CAST(sqn AS DOUBLE), 2) AS ssw,
           ROUND(((CAST(sqn AS DOUBLE) - CAST(ss * ss AS DOUBLE) / nn) / (k - 1))
                 / ((CAST(ss2 AS DOUBLE) - CAST(sqn AS DOUBLE)) / (nn - k)), 6)
               AS f_stat
    FROM tot
    """,
    tags=("X-20", "X-22", "A-14"),
)
def q233_anova_seasonality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-way ANOVA F-statistic for calendar seasonality strength: the
    event values grouped by their 168 (day-of-week x hour) cells,
    F = between-cell variance over within-cell variance — the single
    number that says whether q180's seasonal profile carries real signal
    or noise (large F: the calendar explains the variance; F near 1:
    flat), and the variance-decomposition companion to q210's count-based
    chi-square. Sums of squares use the computational identities
    SSB = sum(s_c^2/n_c) - S^2/N and SSW = sum(s2_c) - sum(s_c^2/n_c),
    so everything derives from per-cell (n, sum, sum-of-squares).

    Determinism: per-cell moments are EXACT integers (cents; HUGEINT /
    decimal(38,0) squares); each s_c^2/n_c divides exact operands once
    and rounds at 6 dp before the decimal sum (the q120 discipline); the
    final F assembles from bit-identical doubles.

    Scale shape: ONE map-side-combined rollup onto the BOUNDED 168-cell
    relation; the 5-number cell moments are A-14-mergeable, so per-shard
    seasonality tests combine with no rescan; one scalar row out."""
    ev = load(spark, sf_dir, "events")
    d0 = "decimal(38,0)"
    cell = ev.select(
        F.dayofweek("ts").alias("dow"),
        F.hour("ts").alias("hr"),
        (F.col("value").cast("decimal(18,2)") * 100).cast("long").alias("vc"),
    ).groupBy("dow", "hr").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.col("vc").cast(d0)).cast(d0).alias("s"),
        F.sum(F.col("vc").cast(d0) * F.col("vc")).cast(d0).alias("s2"),
    )
    terms = cell.select(
        "n",
        "s",
        "s2",
        F.round((F.col("s") * F.col("s")).cast("double") / F.col("n"), 6).alias(
            "sq_over_n"
        ),
    )
    tot = terms.agg(
        F.sum("n").cast("long").alias("nn"),
        F.count(F.lit(1)).cast("long").alias("k"),
        F.sum("s").cast(d0).alias("ss"),
        F.sum("s2").cast(d0).alias("ss2"),
        F.sum(F.col("sq_over_n").cast("decimal(28,6)"))
        .cast("decimal(28,6)")
        .alias("sqn"),
    )
    ssb = F.col("sqn").cast("double") - (F.col("ss") * F.col("ss")).cast(
        "double"
    ) / F.col("nn")
    ssw = F.col("ss2").cast("double") - F.col("sqn").cast("double")
    return tot.select(
        F.col("nn").alias("n_events"),
        F.col("k").alias("n_cells"),
        F.round(ssb, 2).alias("ssb"),
        F.round(ssw, 2).alias("ssw"),
        F.round((ssb / (F.col("k") - 1)) / (ssw / (F.col("nn") - F.col("k"))), 6).alias(
            "f_stat"
        ),
    )


# ---------------------------------------------------------------------------
# X-20 (cont.): CUSUM changepoint detection
# ---------------------------------------------------------------------------


@query(
    "q237_cusum_changepoint",
    oracle="""
    WITH daily AS (
        SELECT event_type, date_trunc('day', ts) AS day,
               CAST(SUM(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT))
                    AS BIGINT) AS xc
        FROM events GROUP BY event_type, date_trunc('day', ts)
    ),
    m AS (
        SELECT event_type, CAST(COUNT(*) AS BIGINT) AS nd,
               CAST(SUM(xc) AS BIGINT) AS s
        FROM daily GROUP BY event_type
    ),
    dev AS (
        SELECT d.event_type, d.day,
               CAST(d.xc AS HUGEINT) * m.nd - m.s AS dev_scaled
        FROM daily d JOIN m ON d.event_type = m.event_type
    ),
    cusum AS (
        SELECT event_type, day,
               CAST(SUM(dev_scaled) OVER (
                   PARTITION BY event_type ORDER BY day
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS HUGEINT) AS c
        FROM dev
    ),
    peak AS (
        SELECT event_type, day, c,
               ROW_NUMBER() OVER (
                   PARTITION BY event_type ORDER BY abs(c) DESC, day
               ) AS rk
        FROM cusum
    )
    SELECT p.event_type, p.day AS change_day,
           ROUND(CAST(p.c AS DOUBLE) / m.nd / 100, 2) AS peak_cusum,
           m.nd AS n_days
    FROM peak p JOIN m ON m.event_type = p.event_type
    WHERE p.rk = 1
    ORDER BY p.event_type
    """,
    tags=("X-20", "W-03"),
)
def q237_cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM changepoint detection: per series, the running sum of
    deviations from the series mean peaks (in absolute value) exactly
    where the level shifts — the classic offline changepoint locator a
    monitoring pipeline runs before alerting on 'the metric moved'
    (q184 flags pointwise anomalies; this finds the STRUCTURAL break).
    Deviations are scaled by n (dev = x*n - S) so every operand stays an
    exact integer — no mean division enters the cumulative sum at all —
    and the one division happens at readout.

    Scale shape: the fact reduces map-side to the calendar-bounded daily
    relation; the cumulative window and the argmax rank run per series
    on that bounded relation (the q179/q209 precedent); series stats
    join back on the tiny type key. Ties on |peak| break by earliest
    day, deterministically."""
    ev = load(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.date_trunc("day", F.col("ts")).alias("day")
    ).agg(
        F.sum((F.col("value").cast("decimal(18,2)") * 100).cast("long"))
        .cast("long")
        .alias("xc")
    ).transform(stage)  # bounded daily relation feeds stats AND the scan
    m = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("nd"),
        F.sum("xc").cast("long").alias("s"),
    )
    d0 = "decimal(38,0)"
    dev = daily.join(F.broadcast(m), "event_type").select(
        "event_type",
        "day",
        "nd",
        (F.col("xc").cast(d0) * F.col("nd") - F.col("s")).cast(d0).alias("dev_scaled"),
    )
    wc = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cusum = dev.withColumn("c", F.sum("dev_scaled").over(wc).cast(d0))
    rk = F.row_number().over(
        Window.partitionBy("event_type").orderBy(F.abs(F.col("c")).desc(), "day")
    )
    return (
        cusum.withColumn("rk", rk)
        .filter(F.col("rk") == 1)
        .select(
            "event_type",
            F.col("day").alias("change_day"),
            F.round(F.col("c").cast("double") / F.col("nd") / 100, 2).alias(
                "peak_cusum"
            ),
            F.col("nd").alias("n_days"),
        )
        .transform(pin)
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# X-49: composition-spike trend detection (brand momentum)
# ---------------------------------------------------------------------------

_MOMENTUM_ORACLE = """
    WITH mb AS (
        SELECT strftime(o_orderdate, '%Y-%m') AS month, p_brand AS brand,
               CAST(COUNT(*) AS BIGINT) AS n_items
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN part   ON l_partkey = p_partkey
        GROUP BY 1, 2
    ),
    sh AS (
        SELECT month, brand, n_items,
               n_items * 1000000000
                   // CAST(SUM(n_items) OVER (PARTITION BY month) AS BIGINT)
                   AS share_ppb
        FROM mb
    ),
    tr AS (
        SELECT month, brand, n_items, share_ppb,
               CAST(COALESCE(SUM(share_ppb) OVER w3, 0) AS BIGINT) AS trail3_ppb,
               CAST(COUNT(*) OVER w3 AS BIGINT) AS n_trail
        FROM sh
        WINDOW w3 AS (PARTITION BY brand ORDER BY month
                      ROWS BETWEEN 3 PRECEDING AND 1 PRECEDING)
    )
    SELECT month, brand, n_items, share_ppb, trail3_ppb, n_trail,
           n_trail = 3 AND 2 * 3 * share_ppb > 2 * trail3_ppb + trail3_ppb
               AS spike
    FROM tr
    ORDER BY month, brand
"""


@query("q245_brand_momentum", oracle=_MOMENTUM_ORACLE, tags=("X-49", "W-03", "J-02"))
def q245_brand_momentum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composition-spike detection: each brand's share of the month's line
    items, compared against its own trailing-3-month average share — a
    brand is flagged when its current share exceeds 1.5x that baseline
    (3*share > 1.5*sum3  <=>  6*share > 3*trail3, kept in integer ppb so
    the threshold never touches a float).  The merchandising/trend-alert
    readout ("what is suddenly selling"), and the categorical twin of the
    q184 numeric seasonal-anomaly flag: q184 scores a metric against the
    calendar, this scores a SHARE against the entity's own history, which
    is what catches mix shifts that total-volume monitors miss.

    Scale shape: one fact shuffle onto (month, brand) with map-side
    partial counts — the orders join carries only (orderkey -> month) and
    the part join BROADCASTS (brand dimension).  Every window below runs
    on the bounded month x brand relation (< |brands| * |months| rows
    regardless of fact size), so the month-total and trailing windows are
    post-reduction and free at any scale.  Integer ppb shares make every
    comparison exact in both engines."""
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    o = load(spark, sf_dir, "orders").select(
        "o_orderkey", F.date_format("o_orderdate", "yyyy-MM").alias("month")
    )
    p = load(spark, sf_dir, "part").select("p_partkey", F.col("p_brand").alias("brand"))
    mb = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("month", "brand")
        .agg(F.count(F.lit(1)).cast("long").alias("n_items"))
    )
    wm = Window.partitionBy("month")
    w3 = Window.partitionBy("brand").orderBy("month").rowsBetween(-3, -1)
    sh = mb.withColumn(
        "mt", F.sum("n_items").over(wm)
    ).withColumn("share_ppb", F.expr("n_items * 1000000000 DIV mt"))
    tr = (
        sh.withColumn("trail3_ppb", F.coalesce(F.sum("share_ppb").over(w3), F.lit(0)))
        .withColumn("n_trail", F.count(F.lit(1)).over(w3).cast("long"))
    )
    return (
        tr.select(
            "month",
            "brand",
            "n_items",
            "share_ppb",
            "trail3_ppb",
            "n_trail",
            (
                (F.col("n_trail") == 3)
                & (6 * F.col("share_ppb") > 3 * F.col("trail3_ppb"))
            ).alias("spike"),
        )
        .transform(pin)
        .orderBy("month", "brand")
    )


# ---------------------------------------------------------------------------
# X-50: floor-clamped running balance via the Lindley reflection identity
# ---------------------------------------------------------------------------

#: drain divisor: 1 cent of backlog drains per 8 elapsed seconds, chosen so
#: mean drain (~4.8k cents at the generator's ~38ks mean gap) sits at the
#: mean event size (~5k cents) and both regimes — resets to zero AND
#: sustained backlog growth — actually occur in the data.
_DRAIN_DIV = 8

_BACKLOG_ORACLE = f"""
    WITH e AS (
        SELECT user_id, ts, event_id,
               CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS cents,
               CAST(FLOOR(epoch(ts)) AS BIGINT) AS es
        FROM events
    ),
    d AS (
        SELECT user_id, ts, event_id,
               cents - COALESCE(es - LAG(es) OVER w, 0) // {_DRAIN_DIV} AS delta
        FROM e
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    s AS (
        SELECT user_id, ROW_NUMBER() OVER w AS rn,
               CAST(SUM(delta)
                    OVER (w ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS BIGINT) AS s
        FROM d
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    b AS (
        SELECT user_id, rn,
               s - LEAST(0, MIN(s) OVER (PARTITION BY user_id ORDER BY rn
                                         ROWS UNBOUNDED PRECEDING)) AS b
        FROM s
    )
    SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events,
           arg_max(b, rn) AS final_backlog,
           MAX(b) AS peak_backlog,
           CAST(COUNT(CASE WHEN b = 0 THEN 1 END) AS BIGINT) AS zero_resets
    FROM b GROUP BY user_id ORDER BY user_id
"""


@query("q246_capped_backlog", oracle=_BACKLOG_ORACLE, tags=("X-50", "W-03", "T-10"))
def q246_capped_backlog(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Floor-clamped running balance (Lindley recurrence) per user: each
    event adds its value (cents) to a backlog that drains at 1 cent per
    {_DRAIN_DIV} elapsed seconds and can never go below zero —
    B_i = max(B_(i-1) + delta_i, 0).  The waiting-time/inventory/credit
    recurrence that naive window SUMs get WRONG (the clamp is non-linear),
    usually "fixed" with a per-key sequential loop.  Here it stays fully
    declarative via the reflection identity
    B_i = S_i - min(0, min_(j<=i) S_j):
    a running sum, a running min of that sum, one subtraction — proven
    per-user by construction and pinned against DuckDB computing the same
    identity.  Per user: final backlog, peak backlog, and how often the
    clamp actually bound (zero_resets).

    Scale shape: ONE shuffle keyed by user; all three windows share the
    same (user, ts, event_id) sort order so they evaluate in a single
    window stage over each partition, then one grouped rollup on the key
    already co-located — no second exchange.  Pure int64 arithmetic end to
    end (cents via FLOOR(x*100+.5), epoch-second gaps, integer floor-div
    drain), so the recurrence is bit-exact in any engine at any scale."""
    ev = load(spark, sf_dir, "events").select(
        "user_id",
        "ts",
        "event_id",
        F.floor(F.col("value") * 100 + 0.5).cast("long").alias("cents"),
        F.unix_timestamp("ts").alias("es"),
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wrun = w.rowsBetween(Window.unboundedPreceding, 0)
    d = ev.withColumn(
        "delta",
        F.col("cents")
        - F.expr(f"COALESCE(es - lag(es) OVER (PARTITION BY user_id ORDER BY ts, event_id), 0) DIV {_DRAIN_DIV}"),
    )
    s = d.withColumn("s", F.sum("delta").over(wrun)).withColumn(
        "rn", F.row_number().over(w)
    )
    wrn = Window.partitionBy("user_id").orderBy("rn").rowsBetween(
        Window.unboundedPreceding, 0
    )
    b = s.withColumn("b", F.col("s") - F.least(F.lit(0), F.min("s").over(wrn)))
    return (
        b.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.expr("max_by(b, rn)").alias("final_backlog"),
            F.max("b").alias("peak_backlog"),
            F.count(F.when(F.col("b") == 0, 1)).cast("long").alias("zero_resets"),
        )
        .transform(pin)
        .orderBy("user_id")
    )


# ---------------------------------------------------------------------------
# X-53: leaderboard stability (month-over-month top-k rank churn)
# ---------------------------------------------------------------------------

_TOPK = 10  #: leaderboard size

_CHURN_ORACLE = f"""
    WITH mb AS (
        SELECT strftime(o_orderdate, '%Y-%m') AS month, p_brand AS brand,
               CAST(COUNT(*) AS BIGINT) AS n_items
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN part   ON l_partkey = p_partkey
        GROUP BY 1, 2
    ),
    t AS (
        SELECT month, brand FROM (
            SELECT month, brand,
                   ROW_NUMBER() OVER (PARTITION BY month
                                      ORDER BY n_items DESC, brand) AS rk
            FROM mb
        ) WHERE rk <= {_TOPK}
    ),
    mi AS (
        SELECT month, CAST(ROW_NUMBER() OVER (ORDER BY month) AS BIGINT) AS idx
        FROM (SELECT DISTINCT month FROM mb)
    ),
    tt AS (SELECT t.month, idx, brand FROM t JOIN mi ON t.month = mi.month),
    sz AS (
        SELECT idx, month, CAST(COUNT(*) AS BIGINT) AS n FROM tt GROUP BY idx, month
    ),
    com AS (
        SELECT c.idx, CAST(COUNT(*) AS BIGINT) AS n_common
        FROM tt c JOIN tt p ON c.idx = p.idx + 1 AND c.brand = p.brand
        GROUP BY c.idx
    )
    SELECT c.month, p.month AS prev_month, c.n AS n_cur, p.n AS n_prev,
           COALESCE(n_common, 0) AS n_common,
           c.n - COALESCE(n_common, 0) AS n_entered,
           p.n - COALESCE(n_common, 0) AS n_exited,
           COALESCE(n_common, 0) * 1000000000
               // (c.n + p.n - COALESCE(n_common, 0)) AS jaccard_ppb
    FROM sz c
    JOIN sz p ON c.idx = p.idx + 1
    LEFT JOIN com ON com.idx = c.idx
    ORDER BY c.month
"""


@query("q248_rank_churn", oracle=_CHURN_ORACLE, tags=("X-53", "O-05"))
def q248_rank_churn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leaderboard stability: the month-over-month churn of the top-10
    brand leaderboard — per consecutive month pair, how many leaders are
    shared, entered, exited, and the set Jaccard (integer ppb) — the
    readout that distinguishes a stable franchise ranking from a volatile
    one and alerts when a data bug (or a real shock) replaces the board
    overnight.  Ranking ties break (count DESC, brand ASC) so the
    leaderboard itself is total-ordered and engine-identical.

    Scale shape: one fact shuffle onto (month, brand) with the part
    dimension BROADCAST — everything after runs on the bounded
    month x brand relation: the per-month top-k is the q13 grouped-top-k
    window, month indexing and the consecutive-pair joins touch only the
    (months x k)-row leaderboard. Set overlap is computed by EQUI-join
    on (idx, brand) — never array materialization — so the same plan
    holds for a top-10000 leaderboard."""
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    o = load(spark, sf_dir, "orders").select(
        "o_orderkey", F.date_format("o_orderdate", "yyyy-MM").alias("month")
    )
    p = load(spark, sf_dir, "part").select("p_partkey", F.col("p_brand").alias("brand"))
    mb = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("month", "brand")
        .agg(F.count(F.lit(1)).cast("long").alias("n_items"))
        .transform(stage)  # reused by the top-k and the month index
    )
    rk = F.row_number().over(
        Window.partitionBy("month").orderBy(F.col("n_items").desc(), "brand")
    )
    top = mb.withColumn("rk", rk).filter(F.col("rk") <= _TOPK).select("month", "brand")
    mi = (
        mb.select("month")
        .distinct()
        .withColumn(
            "idx", F.row_number().over(Window.orderBy("month")).cast("long")
        )  # bounded: one row per month
    )
    tt = top.join(F.broadcast(mi), "month").transform(stage)  # reused 4x below
    sz = tt.groupBy("idx", "month").agg(F.count(F.lit(1)).cast("long").alias("n"))
    c_t = tt.select(F.col("idx").alias("ci"), "brand")
    p_t = tt.select((F.col("idx") + 1).alias("ci"), F.col("brand").alias("pb"))
    com = (
        c_t.join(p_t, (c_t.ci == p_t.ci) & (c_t.brand == p_t.pb))
        .groupBy(c_t.ci)
        .agg(F.count(F.lit(1)).cast("long").alias("n_common"))
    )
    cur = sz.select(F.col("idx").alias("ci"), F.col("month"), F.col("n").alias("n_cur"))
    prev = sz.select(
        (F.col("idx") + 1).alias("ci"),
        F.col("month").alias("prev_month"),
        F.col("n").alias("n_prev"),
    )
    out = (
        cur.join(prev, "ci")
        .join(com, "ci", "left")
        .withColumn("n_common", F.coalesce(F.col("n_common"), F.lit(0)))
    )
    return (
        out.select(
            "month",
            "prev_month",
            "n_cur",
            "n_prev",
            "n_common",
            (F.col("n_cur") - F.col("n_common")).alias("n_entered"),
            (F.col("n_prev") - F.col("n_common")).alias("n_exited"),
            F.expr(
                "n_common * 1000000000 DIV (n_cur + n_prev - n_common)"
            ).alias("jaccard_ppb"),
        )
        .transform(pin)
        .orderBy("month")
    )


# ---------------------------------------------------------------------------
# X-52: Theil-Sen robust trend (median of pairwise slopes)
# ---------------------------------------------------------------------------

_TS_ORACLE = """
    WITH daily AS (
        SELECT event_type,
               CAST(FLOOR(epoch(date_trunc('day', ts))) AS BIGINT) // 86400 AS d,
               CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS y
        FROM events GROUP BY 1, 2
    ),
    slopes AS (
        SELECT a.event_type,
               CAST(b.y - a.y AS DOUBLE) / (b.d - a.d) AS slope
        FROM daily a JOIN daily b
          ON a.event_type = b.event_type AND b.d > a.d
    ),
    nd AS (
        SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_days
        FROM daily GROUP BY event_type
    )
    SELECT s.event_type, n_days,
           CAST(COUNT(*) AS BIGINT) AS n_pairs,
           ROUND(quantile_cont(slope, 0.5), 6) AS theil_sen_slope
    FROM slopes s JOIN nd ON s.event_type = nd.event_type
    GROUP BY s.event_type, n_days
    ORDER BY s.event_type
"""


@query("q249_theil_sen_trend", oracle=_TS_ORACLE, tags=("X-52", "A-12"))
def q249_theil_sen_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil-Sen robust trend per event type: the MEDIAN of all pairwise
    slopes (y_j - y_i)/(d_j - d_i) over the daily value series — the
    outlier-immune complement to q154's least-squares trend (one corrupted
    day moves OLS arbitrarily but shifts the slope median not at all;
    Theil-Sen tolerates ~29% contamination).  The estimator monitoring
    pipelines use when spikes are expected in the data itself.

    Scale shape: the fact reduces FIRST to the bounded (type, day) daily
    relation (one map-side-combined shuffle); the pairwise self-join runs
    only on that bounded relation — O(T * D^2) pairs where D = days in
    window, independent of fact row count (a monitoring window is
    30-90 days, so ~4k pairs per series; for multi-year series switch the
    pair generator to the repartition-range variant).  The median rides
    the A-12 exact-percentile path.  Slopes are exact-integer-operand IEEE
    divisions; pair slopes reduced over day-deltas <= 2^5 have <= 5
    significant fractional decimal digits when binary-terminating, so the
    6-dp rounding of the median can never land on a representational tie."""
    ev = load(spark, sf_dir, "events").select(
        "event_type",
        (F.unix_timestamp(F.date_trunc("day", F.col("ts"))) / F.lit(86400))
        .cast("long")
        .alias("d"),
        F.floor(F.col("value") * 100 + 0.5).cast("long").alias("cents"),
    )
    daily = (
        ev.groupBy("event_type", "d")
        .agg(F.sum("cents").alias("y"))
        .transform(stage)  # both self-join legs + the day count read it
    )
    a = daily.select("event_type", F.col("d").alias("d1"), F.col("y").alias("y1"))
    b = daily.select(
        F.col("event_type").alias("et2"), F.col("d").alias("d2"), F.col("y").alias("y2")
    )
    slopes = (
        a.join(b, (a.event_type == b.et2) & (b.d2 > a.d1))
        .select(
            "event_type",
            ((F.col("y2") - F.col("y1")).cast("double") / (F.col("d2") - F.col("d1"))).alias(
                "slope"
            ),
        )
    )
    nd = daily.groupBy("event_type").agg(F.count(F.lit(1)).cast("long").alias("n_days"))
    agg = slopes.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
        F.round(F.expr("percentile(slope, 0.5)"), 6).alias("theil_sen_slope"),
    )
    return (
        agg.join(F.broadcast(nd), "event_type")
        .select("event_type", "n_days", "n_pairs", "theil_sen_slope")
        .transform(pin)
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# X-63: lead-lag cross-correlation between daily metric series
# ---------------------------------------------------------------------------

_XC_MAX_LAG = 3  #: lags scanned: -3..+3 days

_XCORR_ORACLE = f"""
    WITH daily AS (
        SELECT event_type,
               CAST(FLOOR(epoch(date_trunc('day', ts))) AS BIGINT) // 86400 AS d,
               CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS y
        FROM events GROUP BY 1, 2
    ),
    lags AS (SELECT CAST(u.k AS BIGINT) AS k
             FROM UNNEST(range(-{_XC_MAX_LAG}, {_XC_MAX_LAG} + 1)) AS u(k)),
    m AS (
        SELECT a.event_type AS type_a, b.event_type AS type_b, k,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(a.y) AS BIGINT) AS sx,
               CAST(SUM(b.y) AS BIGINT) AS sy,
               CAST(SUM(CAST(a.y AS DECIMAL(19,0)) * CAST(b.y AS DECIMAL(19,0)))
                    AS DECIMAL(38,0)) AS sxy,
               CAST(SUM(CAST(a.y AS DECIMAL(19,0)) * CAST(a.y AS DECIMAL(19,0)))
                    AS DECIMAL(38,0)) AS sxx,
               CAST(SUM(CAST(b.y AS DECIMAL(19,0)) * CAST(b.y AS DECIMAL(19,0)))
                    AS DECIMAL(38,0)) AS syy
        FROM daily a
        CROSS JOIN lags
        JOIN daily b ON b.event_type > a.event_type AND b.d = a.d + k
        GROUP BY 1, 2, 3
    ),
    c AS (
        SELECT type_a, type_b, k AS lag_days, n,
               ROUND((n * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * sy)
                     / sqrt((n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * sx)
                            * (n * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * sy)),
                     6) AS xcorr
        FROM m
        WHERE n >= 5
          AND n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * sx > 0
          AND n * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * sy > 0
    )
    SELECT type_a, type_b, lag_days, n, xcorr,
           ROW_NUMBER() OVER (PARTITION BY type_a, type_b
                              ORDER BY xcorr DESC, lag_days) = 1 AS best
    FROM c
    ORDER BY type_a, type_b, lag_days
"""


@query("q259_leadlag_xcorr", oracle=_XCORR_ORACLE, tags=("X-63", "X-31"))
def q259_leadlag_xcorr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lead-lag cross-correlation: Pearson correlation of every event-type
    pair's daily value series at lags -{_XC_MAX_LAG}..+{_XC_MAX_LAG} days,
    with the best-aligned lag flagged per pair — the metric-causality scan
    ("errors today predict refunds in two days") that tells an alerting
    system WHICH series is the leading indicator; q207's autocorrelation
    is the self-pair special case of exactly this.

    Determinism: daily totals are exact cents; the five co-moments per
    (pair, lag) accumulate through exact decimal products (the q154/q256
    moment idiom), the closed-form correlation divides bit-identical
    operands and rounds at 6 dp, and the best-lag argmax orders by the
    ROUNDED value with the lag as total-order tie-break.

    Scale shape: ONE fact shuffle (the (type, day) rollup, map-side
    combined, bounded by types x days); the lag expansion is a 7-row
    broadcast cross join, the shifted self-join runs on the bounded daily
    relation keyed by day, and the argmax window spans 7 rows per pair."""
    daily = (
        load(spark, sf_dir, "events")
        .select(
            "event_type",
            (F.unix_timestamp(F.date_trunc("day", F.col("ts"))) / F.lit(86400))
            .cast("long")
            .alias("d"),
            F.floor(F.col("value") * 100 + 0.5).cast("long").alias("cents"),
        )
        .groupBy("event_type", "d")
        .agg(F.sum("cents").alias("y"))
        .transform(stage)  # both legs of the lag join read it
    )
    lags = spark.range(-_XC_MAX_LAG, _XC_MAX_LAG + 1).select(F.col("id").alias("k"))
    a = daily.select(F.col("event_type").alias("type_a"), "d", F.col("y").alias("ya"))
    b = daily.select(
        F.col("event_type").alias("type_b"), F.col("d").alias("db"), F.col("y").alias("yb")
    )
    d19 = "decimal(19,0)"
    m = (
        a.crossJoin(F.broadcast(lags))
        .join(b, (F.col("type_b") > F.col("type_a")) & (F.col("db") == F.col("d") + F.col("k")))
        .groupBy("type_a", "type_b", "k")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("ya").cast("long").alias("sx"),
            F.sum("yb").cast("long").alias("sy"),
            F.sum(F.col("ya").cast(d19) * F.col("yb").cast(d19))
            .cast("decimal(38,0)")
            .alias("sxy"),
            F.sum(F.col("ya").cast(d19) * F.col("ya").cast(d19))
            .cast("decimal(38,0)")
            .alias("sxx"),
            F.sum(F.col("yb").cast(d19) * F.col("yb").cast(d19))
            .cast("decimal(38,0)")
            .alias("syy"),
        )
    )
    num = F.col("n") * F.col("sxy").cast("double") - F.col("sx").cast("double") * F.col("sy")
    den_x = F.col("n") * F.col("sxx").cast("double") - F.col("sx").cast("double") * F.col("sx")
    den_y = F.col("n") * F.col("syy").cast("double") - F.col("sy").cast("double") * F.col("sy")
    c = (
        m.filter((F.col("n") >= 5) & (den_x > 0) & (den_y > 0))
        .select(
            "type_a",
            "type_b",
            F.col("k").alias("lag_days"),
            "n",
            F.round(num / F.sqrt(den_x * den_y), 6).alias("xcorr"),
        )
        .transform(stage)  # the argmax window and the output read it
    )
    best = F.row_number().over(
        Window.partitionBy("type_a", "type_b").orderBy(F.col("xcorr").desc(), "lag_days")
    )
    return (
        c.withColumn("best", best == 1)
        .transform(pin)
        .orderBy("type_a", "type_b", "lag_days")
    )


# ---------------------------------------------------------------------------
# X-64: burstiness (Goh-Barabasi) of per-user inter-event gaps
# ---------------------------------------------------------------------------

_BURSTY_ORACLE = """
    WITH e AS (
        SELECT user_id, CAST(FLOOR(epoch(ts)) AS BIGINT) AS es, event_id
        FROM events
    ),
    g AS (
        SELECT user_id,
               es - LAG(es) OVER (PARTITION BY user_id
                                  ORDER BY es, event_id) AS gap
        FROM e
    ),
    m AS (
        SELECT user_id, CAST(COUNT(gap) AS BIGINT) AS n,
               CAST(SUM(gap) AS BIGINT) AS s,
               CAST(SUM(CAST(gap AS DECIMAL(19,0)) * CAST(gap AS DECIMAL(19,0)))
                    AS DECIMAL(38,0)) AS s2
        FROM g WHERE gap IS NOT NULL GROUP BY user_id
    )
    SELECT user_id, n AS n_gaps,
           s * 1000 // n AS mean_gap_ms,
           ROUND((sqrt(CAST(n * s2 - CAST(s AS DECIMAL(19,0)) * s AS DOUBLE)) - s)
                 / (sqrt(CAST(n * s2 - CAST(s AS DECIMAL(19,0)) * s AS DOUBLE)) + s),
                 6) AS burstiness,
           CASE WHEN (sqrt(CAST(n * s2 - CAST(s AS DECIMAL(19,0)) * s AS DOUBLE)) - s)
                     / (sqrt(CAST(n * s2 - CAST(s AS DECIMAL(19,0)) * s AS DOUBLE)) + s)
                     > 0.1 THEN 'bursty'
                WHEN (sqrt(CAST(n * s2 - CAST(s AS DECIMAL(19,0)) * s AS DOUBLE)) - s)
                     / (sqrt(CAST(n * s2 - CAST(s AS DECIMAL(19,0)) * s AS DOUBLE)) + s)
                     < -0.1 THEN 'regular'
                ELSE 'poissonian' END AS bclass
    FROM m WHERE n >= 2 AND s > 0
    ORDER BY user_id
"""


@query("q261_burstiness", oracle=_BURSTY_ORACLE, tags=("X-64", "W-02"))
def q261_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Goh-Barabasi burstiness of each user's inter-event gaps:
    B = (sigma - mu)/(sigma + mu) in [-1, 1] — B near +1 = heavy bursts
    with long silences (human-like), near 0 = Poisson, negative =
    pacemaker-regular (bot-like).  The temporal-signature feature that
    session statistics miss: two users with identical event counts and
    session lengths can sit at opposite burstiness poles, and bot
    detection keys off exactly that.

    Determinism: gaps are integer epoch seconds; mu and sigma share the
    divisor n, so B reduces to (sqrt(A) - S)/(sqrt(A) + S) with
    A = n*S2 - S^2 exact integers — one sqrt on a bit-identical operand,
    one division, classification thresholds compared on the RAW double
    (identical in both engines), 6-dp rounding for display only.

    Scale shape: one user-keyed exchange shared by the lag window and the
    moment rollup (the q246 single-shuffle discipline); three integer
    accumulators per user, decimal-exact squares."""
    e = load(spark, sf_dir, "events").select(
        "user_id", F.unix_timestamp("ts").alias("es"), "event_id"
    )
    w = Window.partitionBy("user_id").orderBy("es", "event_id")
    g = e.withColumn("gap", F.col("es") - F.lag("es").over(w)).filter(
        F.col("gap").isNotNull()
    )
    d19 = "decimal(19,0)"
    m = g.groupBy("user_id").agg(
        F.count("gap").cast("long").alias("n"),
        F.sum("gap").cast("long").alias("s"),
        F.sum(F.col("gap").cast(d19) * F.col("gap").cast(d19))
        .cast("decimal(38,0)")
        .alias("s2"),
    )
    root = F.sqrt(
        F.expr(f"CAST(n * s2 - CAST(s AS {d19}) * s AS DOUBLE)")
    )
    burst = (root - F.col("s")) / (root + F.col("s"))
    return (
        m.filter((F.col("n") >= 2) & (F.col("s") > 0))
        .select(
            "user_id",
            F.col("n").alias("n_gaps"),
            F.expr("s * 1000 DIV n").alias("mean_gap_ms"),
            F.round(burst, 6).alias("burstiness"),
            F.when(burst > 0.1, "bursty")
            .when(burst < -0.1, "regular")
            .otherwise("poissonian")
            .alias("bclass"),
        )
        .transform(pin)
        .orderBy("user_id")
    )


# ---------------------------------------------------------------------------
# X-68: rank correlation (Spearman rho + Kendall tau-b) of two daily series
# ---------------------------------------------------------------------------

_RANKCORR_ORACLE = """
    WITH daily AS (
        SELECT CAST(FLOOR(epoch(date_trunc('day', ts))) AS BIGINT) // 86400 AS d,
               CAST(COUNT(*) AS BIGINT) AS x,
               CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS y
        FROM events GROUP BY 1
    ),
    ranked AS (
        SELECT d, x, y,
               CAST(2 * RANK() OVER (ORDER BY x)
                    + COUNT(*) OVER (PARTITION BY x) - 1 AS BIGINT) AS rx2,
               CAST(2 * RANK() OVER (ORDER BY y)
                    + COUNT(*) OVER (PARTITION BY y) - 1 AS BIGINT) AS ry2
        FROM daily
    ),
    mom AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(rx2) AS BIGINT) AS sx, CAST(SUM(ry2) AS BIGINT) AS sy,
               CAST(SUM(CAST(rx2 AS DECIMAL(19,0)) * CAST(ry2 AS DECIMAL(19,0)))
                    AS DECIMAL(38,0)) AS sxy,
               CAST(SUM(CAST(rx2 AS DECIMAL(19,0)) * CAST(rx2 AS DECIMAL(19,0)))
                    AS DECIMAL(38,0)) AS sxx,
               CAST(SUM(CAST(ry2 AS DECIMAL(19,0)) * CAST(ry2 AS DECIMAL(19,0)))
                    AS DECIMAL(38,0)) AS syy
        FROM ranked
    ),
    pairs AS (
        SELECT CAST(SUM(CASE WHEN (a.x < b.x AND a.y < b.y)
                               OR (a.x > b.x AND a.y > b.y)
                        THEN 1 ELSE 0 END) AS BIGINT) AS conc,
               CAST(SUM(CASE WHEN (a.x < b.x AND a.y > b.y)
                               OR (a.x > b.x AND a.y < b.y)
                        THEN 1 ELSE 0 END) AS BIGINT) AS disc
        FROM daily a JOIN daily b ON a.d < b.d
    ),
    ties AS (
        SELECT CAST(COALESCE((SELECT SUM(c * (c - 1) / 2) FROM (
                   SELECT COUNT(*) AS c FROM daily GROUP BY x) tx), 0) AS BIGINT) AS n1,
               CAST(COALESCE((SELECT SUM(c * (c - 1) / 2) FROM (
                   SELECT COUNT(*) AS c FROM daily GROUP BY y) ty), 0) AS BIGINT) AS n2
    )
    SELECT n AS n_days,
           ROUND((n * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * sy)
                 / sqrt((n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * sx)
                        * (n * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * sy)),
                 6) AS spearman_rho,
           conc AS concordant, disc AS discordant,
           ROUND(CAST(conc - disc AS DOUBLE)
                 / sqrt(CAST(n * (n - 1) / 2 - n1 AS DOUBLE)
                        * CAST(n * (n - 1) / 2 - n2 AS DOUBLE)), 6) AS kendall_tau_b
    FROM mom CROSS JOIN pairs CROSS JOIN ties
"""


@query("q264_rank_correlation", oracle=_RANKCORR_ORACLE, tags=("X-68", "X-31"))
def q264_rank_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rank correlation between the daily event-count series and the
    daily total-value series: Spearman's rho (Pearson on tie-averaged
    ranks) and Kendall's tau-b (concordant-minus-discordant pairs with
    the tie correction) — the monotone-association measures that q122's
    Pearson matrix misses when the relationship is nonlinear or the
    series are heavy-tailed, and the standard robustness companion any
    metrics-correlation readout ships.

    Determinism: tie-averaged ranks carry denominator <= 2, so
    double-ranks 2*min_rank + ties - 1 are EXACT integers; Spearman's
    five moments accumulate as exact decimal products (the q259 idiom)
    and divide once in IEEE; Kendall's concordant/discordant/tie counts
    are exact integers with one IEEE sqrt+divide; both round at 6 dp.

    Scale shape: ONE map-side-combined fact rollup reduces events to the
    bounded daily relation; the rank windows, the O(days^2) concordance
    self-join, and the tie rollups all run on that bounded relation
    (days, not events, squared — the q249 Theil-Sen precedent); a single
    row reaches the driver."""
    daily = (
        load(spark, sf_dir, "events")
        .select(
            (F.unix_timestamp(F.date_trunc("day", F.col("ts"))) / F.lit(86400))
            .cast("long")
            .alias("d"),
            F.floor(F.col("value") * 100 + 0.5).cast("long").alias("cents"),
        )
        .groupBy("d")
        .agg(
            F.count(F.lit(1)).cast("long").alias("x"),
            F.sum("cents").cast("long").alias("y"),
        )
        .transform(stage)  # ranks, concordance join, and tie rollups read it
    )
    rx2 = (
        2 * F.rank().over(Window.orderBy("x"))
        + F.count(F.lit(1)).over(Window.partitionBy("x"))
        - 1
    ).cast("long")
    ry2 = (
        2 * F.rank().over(Window.orderBy("y"))
        + F.count(F.lit(1)).over(Window.partitionBy("y"))
        - 1
    ).cast("long")
    d19 = "decimal(19,0)"
    mom = (
        daily.select(rx2.alias("rx2"), ry2.alias("ry2"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("rx2").cast("long").alias("sx"),
            F.sum("ry2").cast("long").alias("sy"),
            F.sum(F.col("rx2").cast(d19) * F.col("ry2").cast(d19))
            .cast("decimal(38,0)")
            .alias("sxy"),
            F.sum(F.col("rx2").cast(d19) * F.col("rx2").cast(d19))
            .cast("decimal(38,0)")
            .alias("sxx"),
            F.sum(F.col("ry2").cast(d19) * F.col("ry2").cast(d19))
            .cast("decimal(38,0)")
            .alias("syy"),
        )
    )
    a = daily.select(F.col("d").alias("da"), F.col("x").alias("xa"), F.col("y").alias("ya"))
    b = daily.select(F.col("d").alias("db"), F.col("x").alias("xb"), F.col("y").alias("yb"))
    pairs = a.join(b, F.col("da") < F.col("db")).agg(
        F.sum(
            F.when(
                ((F.col("xa") < F.col("xb")) & (F.col("ya") < F.col("yb")))
                | ((F.col("xa") > F.col("xb")) & (F.col("ya") > F.col("yb"))),
                1,
            ).otherwise(0)
        )
        .cast("long")
        .alias("conc"),
        F.sum(
            F.when(
                ((F.col("xa") < F.col("xb")) & (F.col("ya") > F.col("yb")))
                | ((F.col("xa") > F.col("xb")) & (F.col("ya") < F.col("yb"))),
                1,
            ).otherwise(0)
        )
        .cast("long")
        .alias("disc"),
    )
    tie = lambda c: (  # noqa: E731 — sum over groups of c(c-1)/2
        F.coalesce(
            F.sum((F.col("c") * (F.col("c") - 1) / 2).cast("long")), F.lit(0)
        ).cast("long")
    )
    n1 = (
        daily.groupBy("x")
        .agg(F.count(F.lit(1)).alias("c"))
        .agg(tie("c").alias("n1"))
    )
    n2 = (
        daily.groupBy("y")
        .agg(F.count(F.lit(1)).alias("c"))
        .agg(tie("c").alias("n2"))
    )
    num_s = F.col("n") * F.col("sxy").cast("double") - F.col("sx").cast("double") * F.col("sy")
    den_sx = F.col("n") * F.col("sxx").cast("double") - F.col("sx").cast("double") * F.col("sx")
    den_sy = F.col("n") * F.col("syy").cast("double") - F.col("sy").cast("double") * F.col("sy")
    n0 = (F.col("n") * (F.col("n") - 1) / 2).cast("long")
    return (
        mom.crossJoin(F.broadcast(pairs))
        .crossJoin(F.broadcast(n1))
        .crossJoin(F.broadcast(n2))
        .select(
            F.col("n").alias("n_days"),
            F.round(num_s / F.sqrt(den_sx * den_sy), 6).alias("spearman_rho"),
            F.col("conc").alias("concordant"),
            F.col("disc").alias("discordant"),
            F.round(
                (F.col("conc") - F.col("disc")).cast("double")
                / F.sqrt(
                    (n0 - F.col("n1")).cast("double")
                    * (n0 - F.col("n2")).cast("double")
                ),
                6,
            ).alias("kendall_tau_b"),
        )
    )


# ---------------------------------------------------------------------------
# X-73: quantile-forecast backtest (pinball loss + coverage)
# ---------------------------------------------------------------------------

_PB_TRAIN_DAYS = 21  #: train on the first 21 days of the horizon, test the rest

_PINBALL_ORACLE = f"""
    WITH daily AS (
        SELECT event_type,
               CAST(FLOOR(epoch(date_trunc('day', ts))) AS BIGINT) // 86400 AS d,
               CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS y
        FROM events GROUP BY 1, 2
    ),
    cut AS (SELECT MIN(d) + {_PB_TRAIN_DAYS} AS c FROM daily),
    train AS (
        SELECT event_type, y,
               ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY y, d) AS rk,
               COUNT(*) OVER (PARTITION BY event_type) AS n_train
        FROM daily CROSS JOIN cut WHERE d < c
    ),
    fc AS (
        SELECT event_type, q, n_train, y AS f
        FROM train CROSS JOIN (SELECT UNNEST([50, 90]) AS q)
        WHERE rk = CAST(CEIL(n_train * q / 100.0) AS BIGINT)
    ),
    test AS (SELECT event_type, d, y FROM daily CROSS JOIN cut WHERE d >= c),
    scored AS (
        SELECT t.event_type, q, n_train, f,
               CAST(CASE WHEN t.y >= f THEN q * (t.y - f)
                         ELSE (100 - q) * (f - t.y) END AS BIGINT) AS l100,
               CASE WHEN t.y <= f THEN 1 ELSE 0 END AS covered
        FROM test t JOIN fc USING (event_type)
    )
    SELECT event_type, CAST(q AS BIGINT) AS quantile,
           CAST(MAX(n_train) AS BIGINT) AS n_train,
           CAST(COUNT(*) AS BIGINT) AS n_test,
           CAST(MAX(f) AS BIGINT) AS forecast_cents,
           ROUND(CAST(SUM(l100) AS DOUBLE) / 100 / COUNT(*), 6)
               AS avg_pinball_cents,
           ROUND(CAST(SUM(covered) AS DOUBLE) / COUNT(*), 6) AS coverage
    FROM scored GROUP BY 1, 2 ORDER BY event_type, quantile
"""


@query("q269_pinball_backtest", oracle=_PINBALL_ORACLE, tags=("X-73", "X-20", "A-12"))
def q269_pinball_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile-forecast backtest: per event type, forecast the daily
    total's P50 and P90 from the first {_PB_TRAIN_DAYS} days (discrete
    quantile — the value at rank ceil(n*q/100), so the forecast IS a
    training observation, no interpolation), then score the remaining
    days with the pinball (quantile) loss and empirical coverage — the
    proper scoring rule for quantile forecasts that q219's MAE/sMAPE
    can't judge (MAE rewards the median only; pinball at q=0.9 is what a
    P90 capacity forecast must minimize, and coverage says whether 90%
    really lands under it).

    Determinism: daily totals are exact cents; the discrete-quantile
    rank is an exact integer; each pinball term q*(y-f) or
    (100-q)*(f-y) is an exact integer in centi-cents summed as integers
    with ONE IEEE division per readout row, rounded 6 dp.

    Scale shape: ONE map-side-combined fact rollup to the bounded
    (type, day) relation; the train-window quantile ranks, the 2-level
    forecast relation, and the test-day scoring join all run on that
    bounded relation (forecasts re-enter broadcast); 2 rows per type out."""
    daily = (
        load(spark, sf_dir, "events")
        .select(
            "event_type",
            (F.unix_timestamp(F.date_trunc("day", F.col("ts"))) / F.lit(86400))
            .cast("long")
            .alias("d"),
            F.floor(F.col("value") * 100 + 0.5).cast("long").alias("cents"),
        )
        .groupBy("event_type", "d")
        .agg(F.sum("cents").cast("long").alias("y"))
        .transform(stage)  # cut, train ranks, and test scoring read it
    )
    cut = daily.agg((F.min("d") + _PB_TRAIN_DAYS).alias("c"))
    w_rk = Window.partitionBy("event_type").orderBy("y", "d")
    w_n = Window.partitionBy("event_type")
    train = (
        daily.crossJoin(F.broadcast(cut))
        .filter(F.col("d") < F.col("c"))
        .select(
            "event_type",
            "y",
            F.row_number().over(w_rk).alias("rk"),
            F.count(F.lit(1)).over(w_n).alias("n_train"),
        )
    )
    qlevels = spark.range(0).sparkSession.createDataFrame(
        [(50,), (90,)], "q int"
    )
    fc = (
        train.crossJoin(F.broadcast(qlevels))
        .filter(
            F.col("rk")
            == F.ceil(F.col("n_train") * F.col("q") / F.lit(100.0)).cast("long")
        )
        .select("event_type", "q", "n_train", F.col("y").alias("f"))
    )
    test = daily.crossJoin(F.broadcast(cut)).filter(F.col("d") >= F.col("c"))
    scored = test.join(F.broadcast(fc), "event_type").select(
        "event_type",
        "q",
        "n_train",
        "f",
        F.when(
            F.col("y") >= F.col("f"), F.col("q") * (F.col("y") - F.col("f"))
        )
        .otherwise((100 - F.col("q")) * (F.col("f") - F.col("y")))
        .cast("long")
        .alias("l100"),
        F.when(F.col("y") <= F.col("f"), 1).otherwise(0).alias("covered"),
    )
    return (
        scored.groupBy("event_type", F.col("q").cast("long").alias("quantile"))
        .agg(
            F.max("n_train").cast("long").alias("n_train"),
            F.count(F.lit(1)).cast("long").alias("n_test"),
            F.max("f").cast("long").alias("forecast_cents"),
            F.round(
                F.sum("l100").cast("double") / 100 / F.count(F.lit(1)), 6
            ).alias("avg_pinball_cents"),
            F.round(F.sum("covered").cast("double") / F.count(F.lit(1)), 6).alias(
                "coverage"
            ),
        )
        .transform(pin)
        .orderBy("event_type", "quantile")
    )


# ---------------------------------------------------------------------------
# X-76: Gumbel extreme-value fit + return levels (capacity planning)
# ---------------------------------------------------------------------------

#: data-independent Gumbel constants, precomputed in Python and injected as
#: identical literals into BOTH engines so no libm ln/pi runs anywhere:
#: z_N = -ln(-ln(1 - 1/N)); SQRT6_PI = sqrt(6)/pi; EULER = Euler-Mascheroni
_GUM_Z = {30: 3.3842944934992527, 90: 4.494228221802722, 365: 5.8985259242227315}
_GUM_SQRT6_PI = 0.779696801233676
_GUM_EULER = 0.5772156649015329

_GUMBEL_ORACLE = f"""
    WITH dmax AS (
        SELECT event_type,
               CAST(FLOOR(epoch(date_trunc('day', ts))) AS BIGINT) // 86400 AS d,
               MAX(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) AS m
        FROM events GROUP BY 1, 2
    ),
    mom AS (
        SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(m) AS BIGINT) AS s,
               CAST(SUM(CAST(m AS DECIMAL(19,0)) * CAST(m AS DECIMAL(19,0)))
                    AS DECIMAL(38,0)) AS s2
        FROM dmax GROUP BY 1
    ),
    fit AS (
        SELECT event_type, n,
               CAST(s AS DOUBLE) / n AS mean_c,
               sqrt(CAST(n * s2 - CAST(s AS DECIMAL(19,0)) * s AS DOUBLE)
                    / n / (n - 1)) AS sd_c
        FROM mom WHERE n >= 3
    ),
    gum AS (
        SELECT event_type, n, mean_c, sd_c,
               sd_c * {_GUM_SQRT6_PI} AS beta,
               mean_c - sd_c * {_GUM_SQRT6_PI} * {_GUM_EULER} AS mu
        FROM fit
    )
    SELECT event_type, CAST(h.n_days AS BIGINT) AS horizon_days,
           n AS n_obs,
           ROUND(mean_c, 6) AS mean_cents,
           ROUND(sd_c, 6) AS sd_cents,
           ROUND(mu, 6) AS gumbel_mu,
           ROUND(beta, 6) AS gumbel_beta,
           ROUND(mu + beta * h.z, 6) AS return_level_cents
    FROM gum CROSS JOIN (SELECT UNNEST([30, 90, 365]) AS n_days,
                                UNNEST([{_GUM_Z[30]}, {_GUM_Z[90]},
                                        {_GUM_Z[365]}]) AS z) h
    ORDER BY event_type, horizon_days
"""


@query("q272_gumbel_return_levels", oracle=_GUMBEL_ORACLE, tags=("X-76", "X-20"))
def q272_gumbel_return_levels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extreme-value capacity planning: fit a Gumbel distribution to each
    event type's DAILY MAXIMUM value by method of moments
    (beta = sd*sqrt(6)/pi, mu = mean - Euler*beta) and read off the
    30/90/365-day return levels mu + beta*z_N — "the largest daily spike
    you should expect once per quarter/year", the tail question P99s
    can't answer because return periods extrapolate BEYOND the observed
    range (block-maxima EVT, the same math behind flood design levels).

    Determinism: daily maxima are exact cents; mean and sd come from the
    exact integer k*S2-S^2 collapse with IEEE division/sqrt; sqrt(6)/pi,
    Euler's gamma, and every z_N = -ln(-ln(1-1/N)) are DATA-INDEPENDENT
    literals precomputed in Python and injected identically into both
    engines — no libm ln or pi evaluation ever runs; rounds at 6 dp.

    Scale shape: ONE map-side-combined fact rollup to the bounded
    (type, day) maxima, a per-type two-moment aggregate on it, and a
    3-row broadcast horizon grid — the A-14 mergeable shape."""
    dmax = (
        load(spark, sf_dir, "events")
        .select(
            "event_type",
            (F.unix_timestamp(F.date_trunc("day", F.col("ts"))) / F.lit(86400))
            .cast("long")
            .alias("d"),
            F.floor(F.col("value") * 100 + 0.5).cast("long").alias("cents"),
        )
        .groupBy("event_type", "d")
        .agg(F.max("cents").alias("m"))
    )
    d19 = "decimal(19,0)"
    mom = dmax.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("m").cast("long").alias("s"),
        F.sum(F.col("m").cast(d19) * F.col("m").cast(d19))
        .cast("decimal(38,0)")
        .alias("s2"),
    )
    mean_c = F.col("s").cast("double") / F.col("n")
    sd_c = F.sqrt(
        F.expr(f"CAST(n * s2 - CAST(s AS {d19}) * s AS DOUBLE)")
        / F.col("n")
        / (F.col("n") - 1)
    )
    gum = mom.filter(F.col("n") >= 3).select(
        "event_type",
        "n",
        mean_c.alias("mean_c"),
        sd_c.alias("sd_c"),
        (sd_c * F.lit(_GUM_SQRT6_PI)).alias("beta"),
        (mean_c - sd_c * F.lit(_GUM_SQRT6_PI) * F.lit(_GUM_EULER)).alias("mu"),
    )
    horizons = spark.createDataFrame(
        [(n, z) for n, z in _GUM_Z.items()], "n_days long, z double"
    )
    return (
        gum.crossJoin(F.broadcast(horizons))
        .select(
            "event_type",
            F.col("n_days").alias("horizon_days"),
            F.col("n").alias("n_obs"),
            F.round("mean_c", 6).alias("mean_cents"),
            F.round("sd_c", 6).alias("sd_cents"),
            F.round("mu", 6).alias("gumbel_mu"),
            F.round("beta", 6).alias("gumbel_beta"),
            F.round(F.col("mu") + F.col("beta") * F.col("z"), 6).alias(
                "return_level_cents"
            ),
        )
        .transform(pin)
        .orderBy("event_type", "horizon_days")
    )


# ---------------------------------------------------------------------------
# X-81: Value-at-Risk / CVaR of daily revenue changes
# ---------------------------------------------------------------------------

_VAR_LEVELS = (90, 95)  #: loss quantile levels (per cent)

_VAR_ORACLE = f"""
    WITH daily AS (
        SELECT CAST(FLOOR(epoch(date_trunc('day', ts))) AS BIGINT) // 86400 AS d,
               CAST(SUM(CASE WHEN event_type = 'purchase'
                        THEN CAST(FLOOR(value * 100 + 0.5) AS BIGINT)
                        ELSE 0 END) AS BIGINT) AS rev
        FROM events GROUP BY 1
    ),
    chg AS (
        SELECT d, rev - LAG(rev) OVER (ORDER BY d) AS delta
        FROM daily
    ),
    loss AS (SELECT d, -delta AS loss FROM chg WHERE delta IS NOT NULL),
    ranked AS (
        SELECT loss,
               ROW_NUMBER() OVER (ORDER BY loss, d) AS rk,
               COUNT(*) OVER () AS n
        FROM loss
    ),
    lv AS (SELECT UNNEST([{", ".join(str(x) for x in _VAR_LEVELS)}]) AS level),
    var_q AS (
        SELECT level, n, loss AS var_cents,
               CAST(CEIL(n * level / 100.0) AS BIGINT) AS var_rank
        FROM ranked CROSS JOIN lv
        WHERE rk = CAST(CEIL(n * level / 100.0) AS BIGINT)
    ),
    es AS (
        SELECT v.level, v.n, v.var_cents,
               CAST(COUNT(*) AS BIGINT) AS n_tail,
               CAST(SUM(r.loss) AS BIGINT) AS tail_sum
        FROM var_q v JOIN ranked r ON r.rk >= v.var_rank
        GROUP BY 1, 2, 3
    )
    SELECT CAST(level AS BIGINT) AS level, n AS n_days, var_cents, n_tail,
           ROUND(CAST(tail_sum AS DOUBLE) / n_tail, 6) AS cvar_cents
    FROM es ORDER BY level
"""


@query("q281_var_cvar", oracle=_VAR_ORACLE, tags=("X-81", "X-20", "A-12"))
def q281_var_cvar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Value-at-Risk and CVaR (expected shortfall) of day-over-day
    revenue CHANGES: the loss distribution is the negated daily revenue
    delta; VaR_q is its discrete quantile (value at rank ceil(n*q/100),
    rank-ordered with the day as tie-break) and CVaR_q the mean loss at
    or beyond that rank — the finance-standard tail pair ("how bad is a
    bad day, and how bad is the average bad day beyond it") that a
    percentile readout of LEVELS (q75/q94) doesn't give, because risk
    lives in the CHANGES.

    Determinism: daily revenues, deltas, and losses are exact cents; the
    VaR rank is an exact integer under the (loss, day) total order; CVaR
    is one IEEE division of an exact integer tail sum, rounded 6 dp.

    Scale shape: ONE map-side-combined fact rollup to the bounded daily
    relation; the delta lag, rank window, and the tail join (rank range
    against the 2-row broadcast VaR relation) all run on that bounded
    relation; 2 rows out."""
    daily = (
        load(spark, sf_dir, "events")
        .select(
            (F.unix_timestamp(F.date_trunc("day", F.col("ts"))) / F.lit(86400))
            .cast("long")
            .alias("d"),
            F.when(
                F.col("event_type") == "purchase",
                F.floor(F.col("value") * 100 + 0.5).cast("long"),
            )
            .otherwise(0)
            .alias("cents"),
        )
        .groupBy("d")
        .agg(F.sum("cents").cast("long").alias("rev"))
    )
    w = Window.orderBy("d")
    loss = (
        daily.select("d", (F.col("rev") - F.lag("rev").over(w)).alias("delta"))
        .filter(F.col("delta").isNotNull())
        .select("d", (-F.col("delta")).alias("loss"))
    )
    ranked = loss.select(
        "loss",
        F.row_number().over(Window.orderBy("loss", "d")).alias("rk"),
        F.count(F.lit(1)).over(Window.partitionBy()).alias("n"),
    ).transform(stage)  # the VaR pick and the tail join both read it
    lv = spark.createDataFrame([(x,) for x in _VAR_LEVELS], "level int")
    var_q = (
        ranked.crossJoin(F.broadcast(lv))
        .withColumn(
            "var_rank", F.ceil(F.col("n") * F.col("level") / F.lit(100.0)).cast("long")
        )
        .filter(F.col("rk") == F.col("var_rank"))
        .select("level", "n", F.col("loss").alias("var_cents"), "var_rank")
    )
    es = (
        ranked.select(F.col("rk").alias("rrk"), F.col("loss").alias("rloss"))
        .join(F.broadcast(var_q), F.col("rrk") >= F.col("var_rank"))
        .groupBy("level", "n", "var_cents")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_tail"),
            F.sum("rloss").cast("long").alias("tail_sum"),
        )
    )
    return (
        es.select(
            F.col("level").cast("long").alias("level"),
            F.col("n").alias("n_days"),
            "var_cents",
            "n_tail",
            F.round(F.col("tail_sum").cast("double") / F.col("n_tail"), 6).alias(
                "cvar_cents"
            ),
        )
        .transform(pin)
        .orderBy("level")
    )


# ---------------------------------------------------------------------------
# X-73 (cont.): split-conformal prediction intervals for the naive forecast
# ---------------------------------------------------------------------------

_CF_ALPHA_PCT = 90  #: nominal coverage level

_CONFORMAL_ORACLE = f"""
    WITH daily AS (
        SELECT event_type,
               CAST(FLOOR(epoch(date_trunc('day', ts))) AS BIGINT) // 86400 AS d,
               CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS y
        FROM events GROUP BY 1, 2
    ),
    cut AS (SELECT MIN(d) + {_PB_TRAIN_DAYS} AS c FROM daily),
    paired AS (
        SELECT a.event_type, a.d, a.y, f.y AS fc, c
        FROM daily a
        JOIN daily f ON f.event_type = a.event_type AND f.d = a.d - {_SN_LAG_DAYS}
        CROSS JOIN cut
    ),
    cal AS (
        SELECT event_type, abs(y - fc) AS r,
               ROW_NUMBER() OVER (PARTITION BY event_type
                                  ORDER BY abs(y - fc), d) AS rk,
               COUNT(*) OVER (PARTITION BY event_type) AS n_cal
        FROM paired WHERE d < c
    ),
    qhat AS (
        SELECT event_type, n_cal, r AS q_cents
        FROM cal
        WHERE rk = LEAST(CAST(CEIL((n_cal + 1) * {_CF_ALPHA_PCT} / 100.0)
                              AS BIGINT), n_cal)
    ),
    test AS (
        SELECT p.event_type, q.n_cal, q.q_cents,
               CAST(COUNT(*) AS BIGINT) AS n_test,
               CAST(SUM(CASE WHEN abs(p.y - p.fc) <= q.q_cents
                        THEN 1 ELSE 0 END) AS BIGINT) AS covered
        FROM paired p JOIN qhat q USING (event_type)
        WHERE p.d >= p.c
        GROUP BY 1, 2, 3
    )
    SELECT event_type, n_cal, q_cents, n_test,
           ROUND(CAST(covered AS DOUBLE) / n_test, 6) AS empirical_coverage
    FROM test ORDER BY event_type
"""


@query("q283_conformal_intervals", oracle=_CONFORMAL_ORACLE, tags=("X-73", "X-20"))
def q283_conformal_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split-conformal prediction intervals around the seasonal-naive
    forecast: calibration days (before the q269 cut) yield the
    finite-sample-corrected residual quantile q_hat = the
    ceil((n+1)*{_CF_ALPHA_PCT}/100)-th smallest |y - f|, the interval is
    f ± q_hat, and the held-out days report empirical coverage — the
    distribution-free guarantee ("≥{_CF_ALPHA_PCT}% coverage for ANY
    data") that q269's pinball quantiles don't carry, and the standard
    way to put honest error bars on a point forecaster.

    Determinism: residuals are exact cents ranked under the (|r|, day)
    total order; the conformal rank applies the exact integer
    finite-sample correction (clamped to n_cal); coverage is one IEEE
    division rounded 6 dp.

    Scale shape: the q269 geometry — ONE fact rollup to the bounded
    daily relation, the forecast pairing a 7-day-shifted self-join on
    it, calibration ranks per type, q_hat re-entering broadcast; one row
    per type."""
    daily = (
        load(spark, sf_dir, "events")
        .select(
            "event_type",
            (F.unix_timestamp(F.date_trunc("day", F.col("ts"))) / F.lit(86400))
            .cast("long")
            .alias("d"),
            F.floor(F.col("value") * 100 + 0.5).cast("long").alias("cents"),
        )
        .groupBy("event_type", "d")
        .agg(F.sum("cents").cast("long").alias("y"))
        .transform(stage)  # both legs of the pairing join read it
    )
    cut = daily.agg((F.min("d") + _PB_TRAIN_DAYS).alias("c"))
    f_leg = daily.select(
        F.col("event_type").alias("f_type"), F.col("d").alias("fd"), F.col("y").alias("fc")
    )
    paired = (
        daily.join(
            f_leg,
            (F.col("f_type") == F.col("event_type"))
            & (F.col("fd") == F.col("d") - _SN_LAG_DAYS),
        )
        .crossJoin(F.broadcast(cut))
        .select("event_type", "d", "y", "fc", "c")
        .transform(stage)  # calibration and test both read it
    )
    w_rk = Window.partitionBy("event_type").orderBy(F.abs(F.col("y") - F.col("fc")), "d")
    w_n = Window.partitionBy("event_type")
    cal = paired.filter(F.col("d") < F.col("c")).select(
        "event_type",
        F.abs(F.col("y") - F.col("fc")).alias("r"),
        F.row_number().over(w_rk).alias("rk"),
        F.count(F.lit(1)).over(w_n).alias("n_cal"),
    )
    qhat = cal.filter(
        F.col("rk")
        == F.least(
            F.ceil((F.col("n_cal") + 1) * _CF_ALPHA_PCT / F.lit(100.0)).cast("long"),
            F.col("n_cal").cast("long"),
        )
    ).select("event_type", "n_cal", F.col("r").alias("q_cents"))
    test = (
        paired.filter(F.col("d") >= F.col("c"))
        .join(F.broadcast(qhat), "event_type")
        .groupBy("event_type", "n_cal", "q_cents")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_test"),
            F.sum(
                F.when(F.abs(F.col("y") - F.col("fc")) <= F.col("q_cents"), 1).otherwise(
                    0
                )
            )
            .cast("long")
            .alias("covered"),
        )
    )
    return (
        test.select(
            "event_type",
            "n_cal",
            "q_cents",
            "n_test",
            F.round(F.col("covered").cast("double") / F.col("n_test"), 6).alias(
                "empirical_coverage"
            ),
        )
        .transform(pin)
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# X-83: anomaly-consensus ensemble (MAD + seasonal z + CUSUM in one plan)
# ---------------------------------------------------------------------------

_AC_ORACLE = """
    WITH daily AS (
        SELECT event_type,
               CAST(FLOOR(epoch(date_trunc('day', ts))) AS BIGINT) // 86400 AS d,
               CAST(dayofweek(date_trunc('day', ts)) + 1 AS BIGINT) AS dow,
               CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS y
        FROM events GROUP BY 1, 2, 3
    ),
    rob AS (
        SELECT event_type, quantile_cont(y, 0.5) AS med
        FROM daily GROUP BY 1
    ),
    mad AS (
        SELECT d.event_type, quantile_cont(abs(d.y - r.med), 0.5) AS mad
        FROM daily d JOIN rob r USING (event_type) GROUP BY 1
    ),
    dowm AS (
        SELECT event_type, dow, CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(y) AS BIGINT) AS s,
               CAST(SUM(CAST(y AS DECIMAL(19,0)) * CAST(y AS DECIMAL(19,0)))
                    AS DECIMAL(38,0)) AS s2
        FROM daily GROUP BY 1, 2
    ),
    cus AS (
        SELECT event_type, d,
               ABS(CAST(SUM(CAST(y AS DECIMAL(19,0)) * nn) OVER w
                        - CAST(SUM(CAST(y AS DECIMAL(19,0))) OVER w
                               AS DECIMAL(38,0)) * ss / nn AS DOUBLE)) AS adev
        FROM (SELECT event_type, d, y,
                     CAST(COUNT(*) OVER (PARTITION BY event_type) AS BIGINT) AS nn,
                     CAST(SUM(y) OVER (PARTITION BY event_type) AS BIGINT) AS ss
              FROM daily)
        WINDOW w AS (PARTITION BY event_type ORDER BY d
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    ),
    brk AS (
        SELECT event_type, d FROM (
            SELECT event_type, d,
                   ROW_NUMBER() OVER (PARTITION BY event_type
                                      ORDER BY adev DESC, d) AS rn
            FROM cus
        ) WHERE rn = 1
    ),
    flagged AS (
        SELECT dl.event_type, dl.d, dl.y,
               CAST(abs(dl.y - r.med) > 3 * m.mad AS BOOLEAN) AS mad_flag,
               CAST(CASE WHEN dm.n >= 3 THEN
                    CAST((dm.n * dl.y - dm.s) AS DECIMAL(38,0))
                    * (dm.n * dl.y - dm.s)
                    > 4 * dm.n * (dm.n * dm.s2
                                  - CAST(dm.s AS DECIMAL(19,0)) * dm.s)
                    ELSE FALSE END AS BOOLEAN) AS seasonal_flag,
               CAST(b.d IS NOT NULL AS BOOLEAN) AS cusum_break
        FROM daily dl
        JOIN rob r USING (event_type)
        JOIN mad m USING (event_type)
        JOIN dowm dm ON dm.event_type = dl.event_type AND dm.dow = dl.dow
        LEFT JOIN brk b ON b.event_type = dl.event_type AND b.d = dl.d
    )
    SELECT event_type, d, y, mad_flag, seasonal_flag, cusum_break,
           CAST(CAST(mad_flag AS INT) + CAST(seasonal_flag AS INT)
                + CAST(cusum_break AS INT) AS BIGINT) AS n_flags
    FROM flagged
    WHERE mad_flag OR seasonal_flag OR cusum_break
    ORDER BY event_type, d
"""


@query("q287_anomaly_consensus", oracle=_AC_ORACLE, tags=("X-83", "X-20"))
def q287_anomaly_consensus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anomaly-consensus ensemble: every (type, day) total is tested by
    THREE detectors composed into ONE Catalyst plan — the q142 robust
    gate (|y - median| > 3*MAD), a day-of-week z-gate in the q184 exact
    integer form ((n*y - S)^2 > 4n(n*S2 - S^2), i.e. 2-sigma against
    the day's own weekday baseline, skipped when the cell has <3 obs),
    and the q237 CUSUM break day — flagged days report which detectors
    fired and the vote count, because a day two detectors agree on is
    an incident while a single-detector day is a review item.  The
    composability certificate: three certified operators fuse without
    leaving the optimizer.

    Determinism: daily totals are exact cents; median/MAD ride the A-12
    exact-percentile path (q75-proven bit-equal to quantile_cont); the
    seasonal gate is the exact integer inequality (no division/sqrt);
    the CUSUM deviations are n-scaled exact decimals with the argmax
    under an (|dev| DESC, day) total order.

    Scale shape: ONE map-side-combined fact rollup to the bounded
    (type, day, dow) relation; all three detectors, their joins, and
    the readout run on that staged bounded relation — the fact is
    scanned once per staged branch and never joined at event grain."""
    d19 = "decimal(19,0)"
    daily = (
        load(spark, sf_dir, "events")
        .select(
            "event_type",
            (F.unix_timestamp(F.date_trunc("day", F.col("ts"))) / F.lit(86400))
            .cast("long")
            .alias("d"),
            F.dayofweek(F.date_trunc("day", F.col("ts"))).cast("long").alias("dow"),
            F.floor(F.col("value") * 100 + 0.5).cast("long").alias("cents"),
        )
        .groupBy("event_type", "d", "dow")
        .agg(F.sum("cents").cast("long").alias("y"))
        .transform(stage)  # all three detectors + the readout share it
    )
    rob = daily.groupBy("event_type").agg(
        F.expr("percentile(y, CAST(0.5 AS DOUBLE))").alias("med")
    )
    mad = (
        daily.join(F.broadcast(rob), "event_type")
        .groupBy("event_type")
        .agg(F.expr("percentile(abs(y - med), CAST(0.5 AS DOUBLE))").alias("mad"))
    )
    dowm = daily.groupBy("event_type", "dow").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("y").cast("long").alias("s"),
        F.sum(F.col("y").cast(d19) * F.col("y").cast(d19))
        .cast("decimal(38,0)")
        .alias("s2"),
    )
    w_tot = Window.partitionBy("event_type")
    w_run = w_tot.orderBy("d").rowsBetween(Window.unboundedPreceding, 0)
    base = daily.select(
        "event_type",
        "d",
        "y",
        F.count(F.lit(1)).over(w_tot).cast("long").alias("nn"),
        F.sum("y").over(w_tot).cast("long").alias("ss"),
    )
    cus = base.select(
        "event_type",
        "d",
        F.abs(
            (
                F.sum(F.col("y").cast(d19) * F.col("nn")).over(w_run)
                - F.sum(F.col("y").cast(d19)).over(w_run).cast("decimal(38,0)")
                * F.col("ss")
                / F.col("nn")
            ).cast("double")
        ).alias("adev"),
    )
    brk = (
        cus.withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("event_type").orderBy(F.col("adev").desc(), "d")
            ),
        )
        .filter(F.col("rn") == 1)
        .select("event_type", F.col("d").alias("bd"))
    )
    dm = dowm.select(
        F.col("event_type").alias("det"),
        F.col("dow").alias("ddow"),
        "n",
        "s",
        "s2",
    )
    seasonal = (
        F.when(
            F.col("n") >= 3,
            (F.col("n") * F.col("y") - F.col("s")).cast("decimal(38,0)")
            * (F.col("n") * F.col("y") - F.col("s"))
            > 4
            * F.col("n")
            * (F.col("n") * F.col("s2") - F.col("s").cast(d19) * F.col("s")),
        ).otherwise(F.lit(False))
    )
    flagged = (
        daily.join(F.broadcast(rob), "event_type")
        .join(F.broadcast(mad), "event_type")
        .join(
            F.broadcast(dm),
            (F.col("det") == F.col("event_type")) & (F.col("ddow") == F.col("dow")),
        )
        .join(
            F.broadcast(brk.withColumnRenamed("event_type", "bet")),
            (F.col("bet") == F.col("event_type")) & (F.col("bd") == F.col("d")),
            "left",
        )
        .select(
            "event_type",
            "d",
            "y",
            (F.abs(F.col("y") - F.col("med")) > 3 * F.col("mad")).alias("mad_flag"),
            seasonal.alias("seasonal_flag"),
            F.col("bd").isNotNull().alias("cusum_break"),
        )
    )
    return (
        flagged.filter(
            F.col("mad_flag") | F.col("seasonal_flag") | F.col("cusum_break")
        )
        .withColumn(
            "n_flags",
            (
                F.col("mad_flag").cast("int")
                + F.col("seasonal_flag").cast("int")
                + F.col("cusum_break").cast("int")
            ).cast("long"),
        )
        .transform(pin)
        .orderBy("event_type", "d")
    )


# ---------------------------------------------------------------------------
# X-83 (cont.): weekend effect via Welch's unequal-variance t-test
# ---------------------------------------------------------------------------

_WELCH_ORACLE = """
    WITH daily AS (
        SELECT event_type,
               CAST(FLOOR(epoch(date_trunc('day', ts))) AS BIGINT) // 86400 AS d,
               CASE WHEN dayofweek(date_trunc('day', ts)) + 1 IN (1, 7)
                    THEN 1 ELSE 0 END AS we,
               CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS y
        FROM events GROUP BY 1, 2, 3
    ),
    m AS (
        SELECT event_type, we, CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(y) AS BIGINT) AS s,
               CAST(SUM(CAST(y AS DECIMAL(19,0)) * CAST(y AS DECIMAL(19,0)))
                    AS DECIMAL(38,0)) AS s2
        FROM daily GROUP BY 1, 2
    ),
    wide AS (
        SELECT event_type,
               MAX(CASE WHEN we = 0 THEN n END) AS n0,
               MAX(CASE WHEN we = 0 THEN s END) AS s0,
               MAX(CASE WHEN we = 0 THEN s2 END) AS q0,
               MAX(CASE WHEN we = 1 THEN n END) AS n1,
               MAX(CASE WHEN we = 1 THEN s END) AS s1,
               MAX(CASE WHEN we = 1 THEN s2 END) AS q1
        FROM m GROUP BY 1
    ),
    est AS (
        SELECT event_type, n0, n1,
               CAST(s0 AS DOUBLE) / n0 AS m0,
               CAST(s1 AS DOUBLE) / n1 AS m1,
               CAST(n0 * q0 - CAST(s0 AS DECIMAL(19,0)) * s0 AS DOUBLE)
                   / n0 / n0 / (n0 - 1) / n0 AS se0sq,
               CAST(n1 * q1 - CAST(s1 AS DECIMAL(19,0)) * s1 AS DOUBLE)
                   / n1 / n1 / (n1 - 1) / n1 AS se1sq
        FROM wide WHERE n0 >= 2 AND n1 >= 2
    )
    SELECT event_type, n0 AS n_weekday, n1 AS n_weekend,
           ROUND(m0, 6) AS mean_weekday_cents,
           ROUND(m1, 6) AS mean_weekend_cents,
           ROUND(m1 - m0, 6) AS effect_cents,
           ROUND((m1 - m0) / sqrt(se0sq + se1sq), 6) AS welch_t,
           ROUND((se0sq + se1sq) * (se0sq + se1sq)
                 / (se0sq * se0sq / (n0 - 1) + se1sq * se1sq / (n1 - 1)), 6)
               AS welch_df
    FROM est ORDER BY event_type
"""


@query("q288_weekend_effect", oracle=_WELCH_ORACLE, tags=("X-83", "X-31"))
def q288_weekend_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekend effect via Welch's unequal-variance t-test: per event
    type, weekend vs weekday daily totals compared with the t statistic
    AND the Welch-Satterthwaite effective degrees of freedom — the
    correct two-sample test when group variances differ (the pooled
    Student t silently assumes they don't; weekend traffic variance
    rarely matches weekday's), and the calendar-effect readout behind
    q233's ANOVA (ANOVA says WHETHER day-of-week matters; this sizes
    the weekend/weekday contrast with honest error bars).

    Determinism: daily totals are exact cents; per-group means and
    squared standard errors come from the exact integer k*S2-S^2
    collapse with fixed division order; t and df are IEEE expressions
    on bit-identical operands rounded 6 dp.

    Scale shape: ONE map-side-combined fact rollup to the bounded
    (type, day) relation, a 2-cell-per-type moment rollup, and a pivot
    to one row per type — the A-14 mergeable shape end to end."""
    d19 = "decimal(19,0)"
    daily = (
        load(spark, sf_dir, "events")
        .select(
            "event_type",
            (F.unix_timestamp(F.date_trunc("day", F.col("ts"))) / F.lit(86400))
            .cast("long")
            .alias("d"),
            F.when(
                F.dayofweek(F.date_trunc("day", F.col("ts"))).isin(1, 7), 1
            )
            .otherwise(0)
            .alias("we"),
            F.floor(F.col("value") * 100 + 0.5).cast("long").alias("cents"),
        )
        .groupBy("event_type", "d", "we")
        .agg(F.sum("cents").cast("long").alias("y"))
    )
    m = daily.groupBy("event_type", "we").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("y").cast("long").alias("s"),
        F.sum(F.col("y").cast(d19) * F.col("y").cast(d19))
        .cast("decimal(38,0)")
        .alias("s2"),
    )

    def _side(col, v):
        return F.max(F.when(F.col("we") == v, F.col(col)))

    wide = m.groupBy("event_type").agg(
        _side("n", 0).alias("n0"),
        _side("s", 0).alias("s0"),
        _side("s2", 0).alias("q0"),
        _side("n", 1).alias("n1"),
        _side("s", 1).alias("s1"),
        _side("s2", 1).alias("q1"),
    )
    m0 = F.col("s0").cast("double") / F.col("n0")
    m1 = F.col("s1").cast("double") / F.col("n1")
    se0sq = (
        F.expr(f"CAST(n0 * q0 - CAST(s0 AS {d19}) * s0 AS DOUBLE)")
        / F.col("n0")
        / F.col("n0")
        / (F.col("n0") - 1)
        / F.col("n0")
    )
    se1sq = (
        F.expr(f"CAST(n1 * q1 - CAST(s1 AS {d19}) * s1 AS DOUBLE)")
        / F.col("n1")
        / F.col("n1")
        / (F.col("n1") - 1)
        / F.col("n1")
    )
    est = wide.filter((F.col("n0") >= 2) & (F.col("n1") >= 2)).select(
        "event_type",
        "n0",
        "n1",
        m0.alias("m0"),
        m1.alias("m1"),
        se0sq.alias("se0sq"),
        se1sq.alias("se1sq"),
    )
    sesum = F.col("se0sq") + F.col("se1sq")
    return (
        est.select(
            "event_type",
            F.col("n0").alias("n_weekday"),
            F.col("n1").alias("n_weekend"),
            F.round("m0", 6).alias("mean_weekday_cents"),
            F.round("m1", 6).alias("mean_weekend_cents"),
            F.round(F.col("m1") - F.col("m0"), 6).alias("effect_cents"),
            F.round((F.col("m1") - F.col("m0")) / F.sqrt(sesum), 6).alias("welch_t"),
            F.round(
                sesum
                * sesum
                / (
                    F.col("se0sq") * F.col("se0sq") / (F.col("n0") - 1)
                    + F.col("se1sq") * F.col("se1sq") / (F.col("n1") - 1)
                ),
                6,
            ).alias("welch_df"),
        )
        .transform(pin)
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# X-84: v-optimal segmentation via relational dynamic programming
# ---------------------------------------------------------------------------

_VO_SEGS = 4  #: number of variance-optimal segments


def _vo_oracle() -> str:
    # dp_b(i) = min_{j} dp_{b-1}(j) + sse(j, i), argmin tie-broken by j
    dp_cte = ""
    for b in range(2, _VO_SEGS + 1):
        dp_cte += f""",
    dp{b} AS (
        SELECT i, dp, j FROM (
            SELECT s.i, p.dp + s.sse AS dp, s.j,
                   ROW_NUMBER() OVER (PARTITION BY s.i
                                      ORDER BY p.dp + s.sse, s.j) AS rn
            FROM sse s JOIN dp{b - 1} p ON p.i = s.j
            WHERE s.j >= {b - 1} AND s.i >= {b}
        ) WHERE rn = 1
    )"""
    # backtrack the boundary chain from the full horizon, one CTE per hop
    chain_ctes = f",\n    chain{_VO_SEGS} AS (SELECT d AS e{_VO_SEGS} FROM horizon)"
    carry = [f"e{_VO_SEGS}"]
    for b in range(_VO_SEGS, 1, -1):
        cols = ", ".join(f"c.{c}" for c in carry)
        chain_ctes += (
            f",\n    chain{b - 1} AS (SELECT {cols}, dp{b}.j AS e{b - 1}"
            f" FROM chain{b} c JOIN dp{b} ON dp{b}.i = c.e{b})"
        )
        carry.append(f"e{b - 1}")
    seg_sel = " UNION ALL ".join(
        f"SELECT {k} AS seg, e{k - 1} AS s, e{k} AS e FROM chain"
        if k > 1
        else "SELECT 1 AS seg, 0 AS s, e1 AS e FROM chain"
        for k in range(1, _VO_SEGS + 1)
    )
    return f"""
    WITH daily AS (
        SELECT CAST(FLOOR(epoch(date_trunc('day', ts))) AS BIGINT) // 86400
                   - (SELECT MIN(CAST(FLOOR(epoch(date_trunc('day', ts)))
                                      AS BIGINT) // 86400) FROM events) + 1 AS i,
               CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS y
        FROM events GROUP BY 1
    ),
    pre AS (
        SELECT i, y,
               CAST(SUM(y) OVER (ORDER BY i) AS BIGINT) AS p,
               CAST(SUM(CAST(y AS DECIMAL(19,0)) * CAST(y AS DECIMAL(19,0)))
                    OVER (ORDER BY i) AS DECIMAL(38,0)) AS q
        FROM daily
    ),
    pre0 AS (
        SELECT i, p, q FROM pre
        UNION ALL SELECT 0, 0, 0
    ),
    sse AS (
        SELECT a.i AS j, b.i AS i,
               CAST(b.q - a.q AS DOUBLE)
                   - CAST(b.p - a.p AS DOUBLE) * (b.p - a.p) / (b.i - a.i) AS sse
        FROM pre0 a JOIN pre0 b ON a.i < b.i
    ),
    dp1 AS (SELECT i, sse AS dp, 0 AS j FROM sse WHERE j = 0){dp_cte},
    horizon AS (SELECT MAX(i) AS d FROM pre){chain_ctes},
    chain AS (SELECT * FROM chain1),
    segs AS ({seg_sel}),
    readout AS (
        SELECT seg, s + 1 AS start_day, e AS end_day, e - s AS n_days,
               (SELECT CAST(pb.p - pa.p AS BIGINT)
                FROM pre0 pa, pre0 pb WHERE pa.i = s AND pb.i = e) AS seg_cents,
               (SELECT sse FROM sse WHERE sse.j = s AND sse.i = e) AS seg_sse
        FROM segs
    )
    SELECT CAST(seg AS BIGINT) AS seg, CAST(start_day AS BIGINT) AS start_day,
           CAST(end_day AS BIGINT) AS end_day, CAST(n_days AS BIGINT) AS n_days,
           seg_cents, seg_sse,
           (SELECT dp FROM dp{_VO_SEGS}
            JOIN horizon ON dp{_VO_SEGS}.i = horizon.d) AS total_sse
    FROM readout ORDER BY seg
    """


@query("q289_voptimal_segments", oracle=_vo_oracle(), tags=("X-84", "X-20"))
def q289_voptimal_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """V-optimal segmentation of the daily revenue series: the
    {_VO_SEGS}-segment partition minimizing total within-segment squared
    error, computed by RELATIONAL dynamic programming — dp_b(i) =
    min_j dp_(b-1)(j) + sse(j,i) unrolls into {_VO_SEGS - 1} joins of
    the O(D^2) sse grid against the previous dp table, and the boundary
    chain backtracks through the stored argmins — the v-optimal
    histogram construction (the principled sibling of q102's equi-width
    buckets) and the multi-changepoint generalization of q237's single
    CUSUM break.

    Determinism: prefix sums are exact integers/decimals; each sse is
    one IEEE expression on exact-integer operands and each dp value a
    SINGLE addition of two such doubles — bit-identical in both engines
    with NO intermediate rounding (a 9-dp ROUND here would *introduce*
    divergence: engines implement double-rounding differently at 1e12
    magnitudes, the sf0.1 hash sweep caught exactly that); every argmin
    orders by (dp, j) — a total order on identical doubles.

    Scale shape: ONE map-side-combined fact rollup to the bounded daily
    relation; the sse grid, all dp levels, and the backtrack joins run
    on O(D^2) bounded relations (D = days, never events)."""
    d19 = "decimal(19,0)"
    daily = (
        load(spark, sf_dir, "events")
        .select(
            (F.unix_timestamp(F.date_trunc("day", F.col("ts"))) / F.lit(86400))
            .cast("long")
            .alias("abs_d"),
            F.floor(F.col("value") * 100 + 0.5).cast("long").alias("cents"),
        )
        .groupBy("abs_d")
        .agg(F.sum("cents").cast("long").alias("y"))
    )
    dmin = daily.agg(F.min("abs_d").alias("d0"))
    idx = daily.crossJoin(F.broadcast(dmin)).select(
        (F.col("abs_d") - F.col("d0") + 1).alias("i"), "y"
    )
    w = Window.orderBy("i")
    pre = idx.select(
        "i",
        F.sum("y").over(w).cast("long").alias("p"),
        F.sum(F.col("y").cast(d19) * F.col("y").cast(d19))
        .over(w)
        .cast("decimal(38,0)")
        .alias("q"),
    )
    pre0 = pre.unionByName(
        pre.sparkSession.createDataFrame(
            [(0, 0, 0)], "i long, p long, q_raw long"
        ).select("i", "p", F.col("q_raw").cast("decimal(38,0)").alias("q"))
    ).transform(stage)  # the sse grid reads both legs; readout re-reads it
    a = pre0.select(
        F.col("i").alias("j"), F.col("p").alias("pa"), F.col("q").alias("qa")
    )
    b = pre0.select("i", F.col("p").alias("pb"), F.col("q").alias("qb"))
    sse = (
        a.join(F.broadcast(b), F.col("j") < F.col("i"))
        .select(
            "j",
            "i",
            (
                (F.col("qb") - F.col("qa")).cast("double")
                - (F.col("pb") - F.col("pa")).cast("double")
                * (F.col("pb") - F.col("pa"))
                / (F.col("i") - F.col("j"))
            ).alias("sse"),
        )
        .transform(stage)  # every dp level + the readout read it
    )
    dp = sse.filter(F.col("j") == 0).select("i", F.col("sse").alias("dp"), "j")
    dps = {1: dp}
    for lvl in range(2, _VO_SEGS + 1):
        prev = dps[lvl - 1].select(F.col("i").alias("pj"), F.col("dp").alias("pdp"))
        cand = (
            sse.filter((F.col("j") >= lvl - 1) & (F.col("i") >= lvl))
            .join(F.broadcast(prev), F.col("pj") == F.col("j"))
            .select("i", "j", (F.col("pdp") + F.col("sse")).alias("dp"))
        )
        rn = F.row_number().over(Window.partitionBy("i").orderBy("dp", "j"))
        dps[lvl] = (
            cand.withColumn("rn", rn).filter(F.col("rn") == 1).select("i", "dp", "j")
        )
    horizon = pre.agg(F.max("i").alias("d"))
    # backtrack: e_SEGS = D; e_{b-1} = argmin j stored at dp_b(e_b)
    chain = horizon.select(F.col("d").alias(f"e{_VO_SEGS}"))
    for lvl in range(_VO_SEGS, 1, -1):
        bp = dps[lvl].select(
            F.col("i").alias(f"bi{lvl}"), F.col("j").alias(f"e{lvl - 1}")
        )
        chain = chain.join(
            F.broadcast(bp), F.col(f"e{lvl}") == F.col(f"bi{lvl}")
        ).drop(f"bi{lvl}")
    chain = chain.withColumn("e0", F.lit(0)).transform(stage)
    segs = None
    for k in range(1, _VO_SEGS + 1):
        part = chain.select(
            F.lit(k).alias("seg"),
            F.col(f"e{k - 1}").alias("s"),
            F.col(f"e{k}").alias("e"),
        )
        segs = part if segs is None else segs.unionByName(part)
    pa2 = pre0.select(F.col("i").alias("sa"), F.col("p").alias("ps"))
    pb2 = pre0.select(F.col("i").alias("sb"), F.col("p").alias("pe"))
    sse2 = sse.select(
        F.col("j").alias("sj"), F.col("i").alias("si"), F.col("sse").alias("seg_sse")
    )
    total = (
        dps[_VO_SEGS]
        .join(F.broadcast(horizon), F.col("i") == F.col("d"))
        .select(F.col("dp").alias("total_sse"))
    )
    return (
        segs.join(F.broadcast(pa2), F.col("s") == F.col("sa"))
        .join(F.broadcast(pb2), F.col("e") == F.col("sb"))
        .join(
            F.broadcast(sse2),
            (F.col("sj") == F.col("s")) & (F.col("si") == F.col("e")),
        )
        .crossJoin(F.broadcast(total))
        .select(
            F.col("seg").cast("long").alias("seg"),
            (F.col("s") + 1).cast("long").alias("start_day"),
            F.col("e").cast("long").alias("end_day"),
            (F.col("e") - F.col("s")).cast("long").alias("n_days"),
            (F.col("pe") - F.col("ps")).cast("long").alias("seg_cents"),
            "seg_sse",
            "total_sse",
        )
        .transform(pin)
        .orderBy("seg")
    )


# ---------------------------------------------------------------------------
# X-81 (cont.): maximum drawdown of cumulative revenue
# ---------------------------------------------------------------------------

_DD_ORACLE = """
    WITH daily AS (
        SELECT CAST(FLOOR(epoch(date_trunc('day', ts))) AS BIGINT) // 86400 AS d,
               CAST(SUM(CASE WHEN event_type = 'purchase'
                        THEN CAST(FLOOR(value * 100 + 0.5) AS BIGINT)
                        ELSE -CAST(FLOOR(value * 100 + 0.5) AS BIGINT) // 10
                        END) AS BIGINT) AS flow
        FROM events GROUP BY 1
    ),
    cum AS (
        SELECT d, flow,
               CAST(SUM(flow) OVER (ORDER BY d) AS BIGINT) AS equity
        FROM daily
    ),
    dd AS (
        SELECT d, equity,
               CAST(MAX(equity) OVER (ORDER BY d) AS BIGINT) AS peak,
               CAST(MAX(equity) OVER (ORDER BY d) - equity AS BIGINT) AS drawdown
        FROM cum
    ),
    worst AS (
        SELECT d, equity, peak, drawdown,
               ROW_NUMBER() OVER (ORDER BY drawdown DESC, d) AS rn
        FROM dd
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_days,
           CAST(MAX(CASE WHEN rn = 1 THEN d END) AS BIGINT) AS trough_day,
           CAST(MAX(CASE WHEN rn = 1 THEN peak END) AS BIGINT) AS peak_cents,
           CAST(MAX(CASE WHEN rn = 1 THEN equity END) AS BIGINT) AS trough_cents,
           CAST(MAX(drawdown) AS BIGINT) AS max_drawdown_cents,
           ROUND(CAST(MAX(CASE WHEN rn = 1 THEN drawdown END) AS DOUBLE)
                 / MAX(CASE WHEN rn = 1 THEN peak END), 6)
               AS max_drawdown_frac
    FROM worst
"""


@query("q292_max_drawdown", oracle=_DD_ORACLE, tags=("X-81", "W-03"))
def q292_max_drawdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximum drawdown of the cumulative net-revenue curve (purchases
    minus a 10% cost haircut on all other activity): the largest
    peak-to-trough fall of the running equity, located by day — the
    path-dependent risk number that q281's VaR cannot see (VaR scores
    single-day changes; a drawdown is a RUN of bad days compounding),
    and the standard worst-case readout for any cumulative KPI.

    Determinism: flows and the equity curve are exact integer cents; the
    running max and the drawdown are integer window expressions; the
    trough picks under a (drawdown DESC, day) total order; one IEEE
    division for the fractional readout, rounded 6 dp.

    Scale shape: ONE map-side-combined fact rollup to the bounded daily
    relation; the cumulative, running-max, and argmax windows all run on
    that bounded relation; a single row reaches the driver."""
    cents = F.floor(F.col("value") * 100 + 0.5).cast("long")
    daily = (
        load(spark, sf_dir, "events")
        .select(
            (F.unix_timestamp(F.date_trunc("day", F.col("ts"))) / F.lit(86400))
            .cast("long")
            .alias("d"),
            F.when(F.col("event_type") == "purchase", cents)
            .otherwise(-F.expr("CAST(FLOOR(value * 100 + 0.5) AS BIGINT) DIV 10"))
            .alias("flow"),
        )
        .groupBy("d")
        .agg(F.sum("flow").cast("long").alias("flow"))
    )
    w = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, 0)
    dd = daily.select(
        "d", F.sum("flow").over(w).cast("long").alias("equity")
    ).select(
        "d",
        "equity",
        F.max("equity").over(w).cast("long").alias("peak"),
        (F.max("equity").over(w) - F.col("equity")).cast("long").alias("drawdown"),
    )
    worst = dd.withColumn(
        "rn", F.row_number().over(Window.orderBy(F.col("drawdown").desc(), "d"))
    )
    pick = lambda c: F.max(F.when(F.col("rn") == 1, F.col(c)))  # noqa: E731
    return worst.agg(
        F.count(F.lit(1)).cast("long").alias("n_days"),
        pick("d").cast("long").alias("trough_day"),
        pick("peak").cast("long").alias("peak_cents"),
        pick("equity").cast("long").alias("trough_cents"),
        F.max("drawdown").cast("long").alias("max_drawdown_cents"),
        F.round(
            pick("drawdown").cast("double") / pick("peak"), 6
        ).alias("max_drawdown_frac"),
    )


# ---------------------------------------------------------------------------
# X-85: multiple OLS (trend + weekend) by exact normal equations
# ---------------------------------------------------------------------------

_OLS_ORACLE = """
    WITH daily AS (
        SELECT CAST(FLOOR(epoch(date_trunc('day', ts))) AS BIGINT) // 86400 AS d,
               CAST(SUM(CASE WHEN event_type = 'purchase'
                        THEN CAST(FLOOR(value * 100 + 0.5) AS BIGINT)
                        ELSE 0 END) AS BIGINT) AS y
        FROM events GROUP BY 1
    ),
    xt AS (
        SELECT d - (SELECT MIN(d) FROM daily) AS t,
               CASE WHEN (d + 4) % 7 IN (0, 6) THEN 1 ELSE 0 END AS wk,
               y
        FROM daily
    ),
    m AS (
        SELECT CAST(COUNT(*) AS HUGEINT) AS n,
               CAST(SUM(t) AS HUGEINT) AS st,
               CAST(SUM(t * t) AS HUGEINT) AS st2,
               CAST(SUM(wk) AS HUGEINT) AS sw,
               CAST(SUM(t * wk) AS HUGEINT) AS stw,
               CAST(SUM(y) AS HUGEINT) AS sy,
               CAST(SUM(t * y) AS HUGEINT) AS sty,
               CAST(SUM(wk * y) AS HUGEINT) AS swy,
               CAST(SUM(y * y) AS HUGEINT) AS sy2
        FROM xt
    ),
    dets AS (
        SELECT n, sy, sty, swy, sy2,
               n * (st2 * sw - stw * stw) - st * (st * sw - stw * sw)
                   + sw * (st * stw - st2 * sw) AS det,
               sy * (st2 * sw - stw * stw) - st * (sty * sw - stw * swy)
                   + sw * (sty * stw - st2 * swy) AS det0,
               n * (sty * sw - stw * swy) - sy * (st * sw - stw * sw)
                   + sw * (st * swy - sty * sw) AS det1,
               n * (st2 * swy - sty * stw) - st * (st * swy - sty * sw)
                   + sy * (st * stw - st2 * sw) AS det2
        FROM m
    ),
    beta AS (
        SELECT n, sy, sty, swy, sy2,
               CAST(det0 AS DOUBLE) / CAST(det AS DOUBLE) AS b0,
               CAST(det1 AS DOUBLE) / CAST(det AS DOUBLE) AS b1,
               CAST(det2 AS DOUBLE) / CAST(det AS DOUBLE) AS b2
        FROM dets
    )
    SELECT CAST(n AS BIGINT) AS n_days, b0 AS beta_intercept,
           b1 AS beta_trend_per_day, b2 AS beta_weekend,
           1 - (CAST(sy2 AS DOUBLE)
                - (b0 * CAST(sy AS DOUBLE) + b1 * CAST(sty AS DOUBLE)
                   + b2 * CAST(swy AS DOUBLE)))
               / (CAST(sy2 AS DOUBLE)
                  - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) / CAST(n AS DOUBLE))
               AS r_squared
    FROM beta
"""


@query("q295_ols_trend_weekend", oracle=_OLS_ORACLE, tags=("X-85", "A-14"))
def q295_ols_trend_weekend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiple OLS of daily purchase revenue on a linear trend AND a
    weekend dummy, solved in closed form from the normal equations —
    the two-covariate regression that separates growth from the weekly
    cycle (q249's Theil-Sen fits the trend alone and is biased when
    weekends are systematically low; q288's Welch test detects the
    weekend gap but cannot de-trend it; this estimates both jointly),
    plus the centered R^2. beta = (X'X)^-1 X'y by Cramer's rule on the
    3x3 cross-moment matrix.

    Determinism: the nine cross-moments are exact integers (y in cents,
    t a day index, wk a 0/1 dummy); all four 3x3 determinants expand in
    exact HUGEINT/decimal integer arithmetic; each beta is ONE IEEE
    division of bit-identical exact operands, and R^2 is a fixed-shape
    IEEE expression over the betas and moments — no float accumulates
    across rows anywhere, so no summation-order hazard exists. Readouts
    are raw doubles (the q291 lesson: never engine-ROUND a readout).

    Scale shape: ONE map-side-combined fact rollup to the bounded daily
    relation, one 9-moment rollup onto a single row (the A-14 mergeable
    shape — this is the classic 'OLS as an aggregation' distributed
    pattern: moments merge associatively, the solve is driver-trivial),
    and scalar readout expressions. Adding covariates grows the moment
    vector, never the pass count.

    Reference parity: beyond-reference capability (the reference's
    dashboards have no regression layer)."""
    d = (
        (F.unix_timestamp(F.date_trunc("day", F.col("ts"))) / F.lit(86400))
        .cast("long")
        .alias("d")
    )
    cents = F.when(
        F.col("event_type") == "purchase",
        F.floor(F.col("value") * 100 + 0.5).cast("long"),
    ).otherwise(0)
    daily = (
        load(spark, sf_dir, "events")
        .select(d, cents.alias("c"))
        .groupBy("d")
        .agg(F.sum("c").cast("long").alias("y"))
    )
    dmin = daily.agg(F.min("d").alias("dmin"))
    xt = daily.crossJoin(F.broadcast(dmin)).select(
        (F.col("d") - F.col("dmin")).alias("t"),
        F.when(F.pmod(F.col("d") + 4, F.lit(7)).isin(0, 6), 1)
        .otherwise(0)
        .alias("wk"),
        "y",
    )
    d38 = "decimal(38,0)"
    m = xt.agg(
        F.count(F.lit(1)).cast(d38).alias("n"),
        F.sum("t").cast(d38).alias("st"),
        F.sum(F.col("t") * F.col("t")).cast(d38).alias("st2"),
        F.sum("wk").cast(d38).alias("sw"),
        F.sum(F.col("t") * F.col("wk")).cast(d38).alias("stw"),
        F.sum("y").cast(d38).alias("sy"),
        F.sum(F.col("t") * F.col("y")).cast(d38).alias("sty"),
        F.sum(F.col("wk") * F.col("y")).cast(d38).alias("swy"),
        F.sum(F.col("y") * F.col("y")).cast(d38).alias("sy2"),
    )
    dets = m.select(
        "n",
        "sy",
        "sty",
        "swy",
        "sy2",
        F.expr(
            "n * (st2 * sw - stw * stw) - st * (st * sw - stw * sw)"
            " + sw * (st * stw - st2 * sw)"
        ).alias("det"),
        F.expr(
            "sy * (st2 * sw - stw * stw) - st * (sty * sw - stw * swy)"
            " + sw * (sty * stw - st2 * swy)"
        ).alias("det0"),
        F.expr(
            "n * (sty * sw - stw * swy) - sy * (st * sw - stw * sw)"
            " + sw * (st * swy - sty * sw)"
        ).alias("det1"),
        F.expr(
            "n * (st2 * swy - sty * stw) - st * (st * swy - sty * sw)"
            " + sy * (st * stw - st2 * sw)"
        ).alias("det2"),
    )
    b0 = F.col("det0").cast("double") / F.col("det").cast("double")
    b1 = F.col("det1").cast("double") / F.col("det").cast("double")
    b2 = F.col("det2").cast("double") / F.col("det").cast("double")
    sy_d = F.col("sy").cast("double")
    sy2_d = F.col("sy2").cast("double")
    bty = (
        b0 * sy_d + b1 * F.col("sty").cast("double") + b2 * F.col("swy").cast("double")
    )
    return dets.select(
        F.col("n").cast("long").alias("n_days"),
        b0.alias("beta_intercept"),
        b1.alias("beta_trend_per_day"),
        b2.alias("beta_weekend"),
        (
            F.lit(1)
            - (sy2_d - bty)
            / (sy2_d - sy_d * sy_d / F.col("n").cast("double"))
        ).alias("r_squared"),
    )


# ---------------------------------------------------------------------------
# X-94: additive seasonal decomposition (trend / day-of-week / remainder)
# ---------------------------------------------------------------------------

_STL_ORACLE = """
    WITH daily AS (
        SELECT CAST(FLOOR(epoch(date_trunc('day', ts))) AS BIGINT) // 86400 AS d,
               CAST(SUM(CASE WHEN event_type = 'purchase'
                        THEN CAST(FLOOR(value * 100 + 0.5) AS BIGINT)
                        ELSE 0 END) AS BIGINT) AS y
        FROM events GROUP BY 1
    ),
    ma AS (
        SELECT d, y, (d + 4) % 7 AS dow,
               CASE WHEN COUNT(*) OVER w = 7
                    THEN CAST(SUM(y) OVER w AS BIGINT) // 7 END AS trend
        FROM daily
        WINDOW w AS (ORDER BY d ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
    ),
    det AS (
        SELECT dow, y - trend AS dt FROM ma WHERE trend IS NOT NULL
    ),
    season AS (
        SELECT dow, CAST(COUNT(*) AS BIGINT) AS n_days,
               CAST(SUM(dt) AS BIGINT) // COUNT(*) AS s
        FROM det GROUP BY dow
    ),
    strength AS (
        SELECT CAST(SUM(CAST(d.dt AS HUGEINT) * d.dt) AS DOUBLE) AS ssd,
               CAST(SUM(CAST(d.dt - se.s AS HUGEINT) * (d.dt - se.s)) AS DOUBLE)
                   AS ssr
        FROM det d JOIN season se USING (dow)
    )
    SELECT se.dow, se.n_days, CAST(se.s AS BIGINT) AS seasonal_cents,
           1 - st.ssr / st.ssd AS seasonal_strength
    FROM season se, strength st
    ORDER BY se.dow
"""


@query("q304_seasonal_decomposition", oracle=_STL_ORACLE, tags=("X-94", "W-03"))
def q304_seasonal_decomposition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Additive seasonal decomposition of daily revenue (STL-lite):
    trend = centered 7-row moving average (full windows only),
    day-of-week seasonal = mean of the detrended series per weekday,
    remainder = what neither explains — with the seasonal-strength
    readout 1 - SS_remainder/SS_detrended saying how much of the
    non-trend variation the weekly cycle owns. The decomposition
    UNDERNEATH q180's seasonal profile and q219's seasonal-naive
    forecast: those assume the weekly cycle matters; this measures it
    against the trend alternative.

    Determinism: daily flows exact cents; the moving-average trend and
    per-dow seasonal means are truncating integer divisions (Spark div
    = DuckDB // toward zero, incl. negative detrended sums), so trend,
    detrended, seasonal, and remainder are ALL exact integers; the two
    sums of squares stay below 2^63 (single correctly-rounded
    conversion) and feed one fixed-shape IEEE ratio. The trend frame is
    ROW-based over the day-ordered relation — identical semantics in
    both engines, gaps included.

    Scale shape: ONE map-side-combined fact rollup to the bounded daily
    relation; every window and rollup after it runs on that bounded
    relation (the q292/q295 discipline).

    Reference parity: beyond-reference; completes the X-33/X-83
    calendar family with the decomposition those tests presuppose."""
    daily = (
        load(spark, sf_dir, "events")
        .select(
            (F.unix_timestamp(F.date_trunc("day", F.col("ts"))) / F.lit(86400))
            .cast("long")
            .alias("d"),
            F.when(
                F.col("event_type") == "purchase",
                F.floor(F.col("value") * 100 + 0.5).cast("long"),
            )
            .otherwise(0)
            .alias("c"),
        )
        .groupBy("d")
        .agg(F.sum("c").cast("long").alias("y"))
    )
    w7 = Window.orderBy("d").rowsBetween(-3, 3)
    ma = daily.select(
        "d",
        "y",
        F.pmod(F.col("d") + 4, F.lit(7)).alias("dow"),
        F.when(
            F.count(F.lit(1)).over(w7) == 7,
            F.expr("CAST(sum(y) OVER (ORDER BY d ROWS BETWEEN 3 PRECEDING"
                   " AND 3 FOLLOWING) AS BIGINT)"),
        ).alias("wsum"),
    )
    det = (
        ma.filter(F.col("wsum").isNotNull())
        .select("dow", (F.col("y") - F.expr("wsum div 7")).alias("dt"))
        .transform(stage)  # seasonal means + both SS passes share it
    )
    season = det.groupBy("dow").agg(
        F.count(F.lit(1)).cast("long").alias("n_days"),
        F.expr("CAST(SUM(dt) AS BIGINT) div COUNT(*)").alias("s"),
    )
    d20 = "decimal(20,0)"
    strength = (
        det.join(F.broadcast(season.select("dow", "s")), "dow")
        .agg(
            F.sum((F.col("dt").cast(d20) * F.col("dt")).cast("decimal(38,0)"))
            .cast("decimal(38,0)")
            .alias("ssd"),
            F.sum(
                (
                    (F.col("dt") - F.col("s")).cast(d20)
                    * (F.col("dt") - F.col("s"))
                ).cast("decimal(38,0)")
            )
            .cast("decimal(38,0)")
            .alias("ssr"),
        )
        .select(
            (
                F.lit(1)
                - F.col("ssr").cast("double") / F.col("ssd").cast("double")
            ).alias("seasonal_strength")
        )
    )
    return (
        season.crossJoin(F.broadcast(strength))
        .select(
            "dow",
            "n_days",
            F.col("s").cast("long").alias("seasonal_cents"),
            "seasonal_strength",
        )
        .transform(pin)
        .orderBy("dow")
    )


# ---------------------------------------------------------------------------
# X-98: newsvendor stocking level at the critical fractile
# ---------------------------------------------------------------------------

_NV_CU = 3  #: underage cost (lost margin per unsold-out unit)
_NV_CO = 1  #: overage cost (per unit stocked but unsold)

_NV_ORACLE = f"""
    WITH daily AS (
        SELECT CAST(FLOOR(epoch(date_trunc('day', ts))) AS BIGINT) // 86400 AS d,
               CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                    AS BIGINT) AS dem
        FROM events GROUP BY 1
    ),
    da AS (
        SELECT dem, CAST(COUNT(*) AS BIGINT) AS cnt FROM daily GROUP BY dem
    ),
    cum AS (
        SELECT dem, CAST(SUM(cnt) OVER (ORDER BY dem) AS BIGINT) AS c FROM da
    ),
    nn AS (SELECT CAST(SUM(cnt) AS BIGINT) AS n FROM da),
    qs AS (
        SELECT
            (SELECT MIN(dem) FROM cum, nn
             WHERE ({_NV_CU + _NV_CO}) * c >= {_NV_CU} * nn.n) AS q_star,
            (SELECT CAST(CAST(SUM(dem * cnt) AS BIGINT) // SUM(cnt) AS BIGINT) FROM da) AS q_mean
    ),
    prof AS (
        SELECT
            CAST(SUM({_NV_CU} * LEAST(d.dem, q.q_star)
                     - {_NV_CO} * GREATEST(q.q_star - d.dem, 0)) AS BIGINT)
                AS profit_star,
            CAST(SUM({_NV_CU} * LEAST(d.dem, q.q_mean)
                     - {_NV_CO} * GREATEST(q.q_mean - d.dem, 0)) AS BIGINT)
                AS profit_mean
        FROM daily d, qs q
    )
    SELECT nn.n AS n_days, q.q_star, q.q_mean,
           p.profit_star, p.profit_mean,
           CAST(p.profit_star - p.profit_mean AS BIGINT) AS profit_gain
    FROM qs q, prof p, nn
"""


@query("q308_newsvendor", oracle=_NV_ORACLE, tags=("X-98", "A-12"))
def q308_newsvendor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Newsvendor stocking level: the order quantity q* at the critical
    fractile cu/(cu+co) = 3/4 of the daily-demand distribution (the
    provably profit-optimal quantile under under/overage costs), scored
    against the naive mean-demand stocking rule by replaying both
    against every observed day — the inventory-optimization readout
    that turns A-12's percentile machinery into a DECISION with a
    money-valued gain. The mean rule understocks right-skewed demand;
    the replay quantifies exactly what that costs.

    Determinism: the fractile selection is 'min demand whose cumulative
    day count reaches ceil(0.75 n)' in the cross-multiplied integer
    form (cu+co)*c >= cu*n — no float fractile; q_mean is a truncating
    integer division; both replay profits are exact integer sums. Every
    output column is an exact integer.

    Scale shape: one fact rollup to bounded daily demand, a rollup to
    the bounded distinct-demand relation, a cumulative window on it,
    and two single-row replay aggregates (the q292 discipline).

    Reference parity: beyond-reference; the ops-facing twin of q246's
    capped-backlog simulation."""
    daily = (
        load(spark, sf_dir, "events")
        .select(
            (F.unix_timestamp(F.date_trunc("day", F.col("ts"))) / F.lit(86400))
            .cast("long")
            .alias("d"),
            F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("p"),
        )
        .groupBy("d")
        .agg(F.sum("p").cast("long").alias("dem"))
        .transform(stage)  # fractile selection + both replays share it
    )
    da = daily.groupBy("dem").agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    w = Window.orderBy("dem").rowsBetween(Window.unboundedPreceding, 0)
    cum = da.select("dem", F.sum("cnt").over(w).cast("long").alias("c"))
    nn = da.agg(F.sum("cnt").cast("long").alias("n"))
    q_star = (
        cum.crossJoin(F.broadcast(nn))
        .filter(
            F.lit(_NV_CU + _NV_CO) * F.col("c") >= F.lit(_NV_CU) * F.col("n")
        )
        .agg(F.min("dem").alias("q_star"))
    )
    q_mean = da.agg(
        F.expr("CAST(SUM(dem * cnt) AS BIGINT) div SUM(cnt)").alias("q_mean")
    )
    qs = q_star.crossJoin(F.broadcast(q_mean))
    prof = daily.crossJoin(F.broadcast(qs)).agg(
        F.sum(
            F.lit(_NV_CU) * F.least(F.col("dem"), F.col("q_star"))
            - F.lit(_NV_CO) * F.greatest(F.col("q_star") - F.col("dem"), F.lit(0))
        )
        .cast("long")
        .alias("profit_star"),
        F.sum(
            F.lit(_NV_CU) * F.least(F.col("dem"), F.col("q_mean"))
            - F.lit(_NV_CO) * F.greatest(F.col("q_mean") - F.col("dem"), F.lit(0))
        )
        .cast("long")
        .alias("profit_mean"),
        F.min("q_star").alias("q_star"),
        F.min("q_mean").alias("q_mean"),
    )
    return prof.crossJoin(F.broadcast(nn)).select(
        F.col("n").alias("n_days"),
        "q_star",
        "q_mean",
        "profit_star",
        "profit_mean",
        (F.col("profit_star") - F.col("profit_mean")).cast("long").alias(
            "profit_gain"
        ),
    )


# ---------------------------------------------------------------------------
# X-100: causal-impact estimate from a control series
# ---------------------------------------------------------------------------

_CI_ORACLE = """
    WITH daily AS (
        SELECT CAST(FLOOR(epoch(date_trunc('day', ts))) AS BIGINT) // 86400 AS d,
               CAST(SUM(CASE WHEN event_type = 'purchase'
                        THEN CAST(FLOOR(value * 100 + 0.5) AS BIGINT)
                        ELSE 0 END) AS BIGINT) AS y,
               CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
                    AS BIGINT) AS xv
        FROM events GROUP BY 1
    ),
    cut AS (
        SELECT MIN(d) + (MAX(d) - MIN(d)) * 7 // 10 AS t0 FROM daily
    ),
    pre AS (
        SELECT CAST(COUNT(*) AS HUGEINT) AS n,
               CAST(SUM(xv) AS HUGEINT) AS sx,
               CAST(SUM(xv * xv) AS HUGEINT) AS sx2,
               CAST(SUM(y) AS HUGEINT) AS sy,
               CAST(SUM(xv * y) AS HUGEINT) AS sxy,
               CAST(SUM(y * y) AS HUGEINT) AS sy2
        FROM daily, cut WHERE d <= t0
    ),
    beta AS (
        SELECT n, sy, sy2, sx, sxy,
               CAST(sx2 * sy - sx * sxy AS DOUBLE)
                   / CAST(n * sx2 - sx * sx AS DOUBLE) AS a,
               CAST(n * sxy - sx * sy AS DOUBLE)
                   / CAST(n * sx2 - sx * sx AS DOUBLE) AS b
        FROM pre
    ),
    post AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_post,
               CAST(SUM(y) AS BIGINT) AS sy_post,
               CAST(SUM(xv) AS BIGINT) AS sx_post
        FROM daily, cut WHERE d > t0
    )
    SELECT CAST(b.n AS BIGINT) AS n_pre, p.n_post,
           b.a AS alpha, b.b AS beta_control,
           1 - (CAST(b.sy2 AS DOUBLE)
                - (b.a * CAST(b.sy AS DOUBLE) + b.b * CAST(b.sxy AS DOUBLE)))
               / (CAST(b.sy2 AS DOUBLE)
                  - CAST(b.sy AS DOUBLE) * CAST(b.sy AS DOUBLE)
                    / CAST(b.n AS DOUBLE)) AS pre_r2,
           p.sy_post AS actual_post_cents,
           p.n_post * b.a + b.b * CAST(p.sx_post AS DOUBLE)
               AS predicted_post_cents,
           CAST(p.sy_post AS DOUBLE)
               - (p.n_post * b.a + b.b * CAST(p.sx_post AS DOUBLE))
               AS abs_effect_cents,
           (CAST(p.sy_post AS DOUBLE)
            - (p.n_post * b.a + b.b * CAST(p.sx_post AS DOUBLE)))
               / (p.n_post * b.a + b.b * CAST(p.sx_post AS DOUBLE))
               AS rel_effect
    FROM beta b, post p
"""


@query("q310_causal_impact", oracle=_CI_ORACLE, tags=("X-100", "X-85"))
def q310_causal_impact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Causal-impact estimate of the post-period revenue lift against a
    counterfactual built from a CONTROL series: fit revenue ~ view
    volume on the first 70% of days (simple OLS by exact normal
    equations), project it over the held-out tail, and read the
    cumulative gap actual - predicted as the effect — the
    control-series causal design q267's DiD needs two groups for, run
    with a covariate series instead (the CausalImpact construction,
    linear-model core). pre_r2 reports whether the counterfactual is
    even credible.

    Determinism: all six pre-period moments and the post-period totals
    are exact integers; alpha/beta are single IEEE divisions of exact
    cross-moment determinants; and the CUMULATIVE effect never sums
    per-day floats — it collapses algebraically to
    Sy_post - n_post*a - b*Sx_post, two IEEE products on exact
    operands, so no summation-order hazard exists (the q291 lesson
    applied by ELIMINATING the sum instead of ordering it).

    Scale shape: ONE fact rollup to the bounded daily relation; the
    fit, the projection, and the readout are single-row aggregates of
    it (the A-14 mergeable-moment OLS shape of q295).

    Reference parity: beyond-reference; completes the causal family
    (q267 DiD, q279 MH odds ratio, q300 off-policy IPS) with the
    time-series counterfactual design."""
    daily = (
        load(spark, sf_dir, "events")
        .select(
            (F.unix_timestamp(F.date_trunc("day", F.col("ts"))) / F.lit(86400))
            .cast("long")
            .alias("d"),
            F.when(
                F.col("event_type") == "purchase",
                F.floor(F.col("value") * 100 + 0.5).cast("long"),
            )
            .otherwise(0)
            .alias("c"),
            F.when(F.col("event_type") == "view", 1).otherwise(0).alias("v"),
        )
        .groupBy("d")
        .agg(
            F.sum("c").cast("long").alias("y"),
            F.sum("v").cast("long").alias("xv"),
        )
        .transform(stage)  # the cut, the fit, and the post totals share it
    )
    cut = daily.agg(
        F.expr("MIN(d) + (MAX(d) - MIN(d)) * 7 div 10").alias("t0")
    )
    d38 = "decimal(38,0)"
    pre = (
        daily.crossJoin(F.broadcast(cut))
        .filter(F.col("d") <= F.col("t0"))
        .agg(
            F.count(F.lit(1)).cast(d38).alias("n"),
            F.sum("xv").cast(d38).alias("sx"),
            F.sum(F.col("xv") * F.col("xv")).cast(d38).alias("sx2"),
            F.sum("y").cast(d38).alias("sy"),
            F.sum(F.col("xv") * F.col("y")).cast(d38).alias("sxy"),
            F.sum(F.col("y") * F.col("y")).cast(d38).alias("sy2"),
        )
    )
    a = F.expr("CAST(sx2 * sy - sx * sxy AS DOUBLE)") / F.expr(
        "CAST(n * sx2 - sx * sx AS DOUBLE)"
    )
    b = F.expr("CAST(n * sxy - sx * sy AS DOUBLE)") / F.expr(
        "CAST(n * sx2 - sx * sx AS DOUBLE)"
    )
    beta = pre.select(
        "n", "sy", "sy2", "sxy", a.alias("a"), b.alias("b")
    )
    post = (
        daily.crossJoin(F.broadcast(cut))
        .filter(F.col("d") > F.col("t0"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_post"),
            F.sum("y").cast("long").alias("sy_post"),
            F.sum("xv").cast("long").alias("sx_post"),
        )
    )
    pred = F.col("n_post") * F.col("a") + F.col("b") * F.col("sx_post").cast(
        "double"
    )
    sy_d = F.col("sy").cast("double")
    return beta.crossJoin(F.broadcast(post)).select(
        F.col("n").cast("long").alias("n_pre"),
        "n_post",
        F.col("a").alias("alpha"),
        F.col("b").alias("beta_control"),
        (
            F.lit(1)
            - (
                F.col("sy2").cast("double")
                - (
                    F.col("a") * sy_d
                    + F.col("b") * F.col("sxy").cast("double")
                )
            )
            / (
                F.col("sy2").cast("double")
                - sy_d * sy_d / F.col("n").cast("double")
            )
        ).alias("pre_r2"),
        F.col("sy_post").alias("actual_post_cents"),
        pred.alias("predicted_post_cents"),
        (F.col("sy_post").cast("double") - pred).alias("abs_effect_cents"),
        ((F.col("sy_post").cast("double") - pred) / pred).alias("rel_effect"),
    )


# ---------------------------------------------------------------------------
# X-103: forecast ensemble backtest (seasonal-naive / trend / dow-mean)
# ---------------------------------------------------------------------------

_FE_ORACLE = """
    WITH daily AS (
        SELECT CAST(FLOOR(epoch(date_trunc('day', ts))) AS BIGINT) // 86400 AS d,
               CAST(SUM(CASE WHEN event_type = 'purchase'
                        THEN CAST(FLOOR(value * 100 + 0.5) AS BIGINT)
                        ELSE 0 END) AS BIGINT) AS y
        FROM events GROUP BY 1
    ),
    idx AS (
        SELECT d, y, (d + 4) % 7 AS dow,
               ROW_NUMBER() OVER (ORDER BY d) AS rn,
               LAG(y, 7) OVER (ORDER BY d) AS m1
        FROM daily
    ),
    nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
                  CAST(COUNT(*) AS BIGINT) * 7 // 10 AS n_train
           FROM daily),
    tr AS (
        SELECT CAST(COUNT(*) AS HUGEINT) AS k,
               CAST(SUM(rn - 1) AS HUGEINT) AS st,
               CAST(SUM(CAST(rn - 1 AS HUGEINT) * (rn - 1)) AS HUGEINT) AS st2,
               CAST(SUM(y) AS HUGEINT) AS sy,
               CAST(SUM(CAST(rn - 1 AS HUGEINT) * y) AS HUGEINT) AS sty
        FROM idx, nn WHERE rn <= nn.n_train
    ),
    ab AS (
        SELECT CAST((st2 * sy - st * sty) * 1000000
                    // (k * st2 - st * st) AS HUGEINT) AS a6,
               ((k * sty - st * sy) * 1000000) // (k * st2 - st * st) AS b6
        FROM tr
    ),
    dowm AS (
        SELECT i.dow,
               CAST(CAST(SUM(i.y) AS HUGEINT) // COUNT(*) AS BIGINT) AS m3
        FROM idx i, nn WHERE i.rn <= nn.n_train
        GROUP BY i.dow
    ),
    test AS (
        SELECT i.y, i.m1,
               CAST((ab.a6 + ab.b6 * (i.rn - 1)) // 1000000 AS BIGINT) AS m2,
               w.m3
        FROM idx i JOIN dowm w USING (dow), nn, ab
        WHERE i.rn > nn.n_train AND i.m1 IS NOT NULL
    ),
    sc AS (
        SELECT y, m1, m2, m3,
               GREATEST(LEAST(m1, m2), LEAST(GREATEST(m1, m2), m3)) AS ens
        FROM test
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_test,
           CAST(SUM(abs(y - m1)) AS BIGINT) AS ae_seasonal_naive,
           CAST(SUM(abs(y - m2)) AS BIGINT) AS ae_trend,
           CAST(SUM(abs(y - m3)) AS BIGINT) AS ae_dow_mean,
           CAST(SUM(abs(y - ens)) AS BIGINT) AS ae_ensemble,
           CAST(SUM(abs(y - ens)) AS DOUBLE) / COUNT(*) AS mae_ensemble_cents
    FROM sc
"""


@query("q313_forecast_ensemble", oracle=_FE_ORACLE, tags=("X-103", "X-94"))
def q313_forecast_ensemble(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forecast-ensemble backtest on the 30% held-out tail of daily
    revenue: three base models — seasonal naive (value 7 rows back),
    a linear trend fit on the training window by exact normal
    equations, and the per-day-of-week training mean — combined by the
    per-day MEDIAN (the robust combination that wins forecast
    competitions: the ensemble can't be dragged by whichever single
    model breaks), all scored by absolute error on the same tail.
    The model-selection readout q219's single-model backtest cannot
    give: it shows whether combining beats every component.

    Determinism: EVERY forecast is an exact integer — the trend model's
    (a, b) live as micro-unit integer floor-divisions of exact
    cross-moment determinants, the dow-mean and seasonal-naive are
    integer division/lag, and the median-of-3 is the exact min/max
    identity — so all error sums are exact integers and the single
    double is the final MAE division (the q303 discipline: integer
    models make float-free backtests).

    Scale shape: one fact rollup to the bounded daily relation; the
    fit, the per-dow means, and the scoring all run on it.

    Reference parity: beyond-reference; composes X-85 (regression),
    X-94 (seasonality), and q219's backtest protocol into a
    model-selection harness."""
    daily = (
        load(spark, sf_dir, "events")
        .select(
            (F.unix_timestamp(F.date_trunc("day", F.col("ts"))) / F.lit(86400))
            .cast("long")
            .alias("d"),
            F.when(
                F.col("event_type") == "purchase",
                F.floor(F.col("value") * 100 + 0.5).cast("long"),
            )
            .otherwise(0)
            .alias("c"),
        )
        .groupBy("d")
        .agg(F.sum("c").cast("long").alias("y"))
    )
    w = Window.orderBy("d")
    idx = daily.select(
        "d",
        "y",
        F.pmod(F.col("d") + 4, F.lit(7)).alias("dow"),
        F.row_number().over(w).alias("rn"),
        F.lag("y", 7).over(w).alias("m1"),
    ).transform(stage)  # the fit, dow means, and scoring share it
    nn = idx.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.expr("CAST(COUNT(*) * 7 div 10 AS BIGINT)").alias("n_train"),
    )
    d38 = "decimal(38,0)"
    tr = (
        idx.crossJoin(F.broadcast(nn))
        .filter(F.col("rn") <= F.col("n_train"))
        .agg(
            F.count(F.lit(1)).cast(d38).alias("k"),
            F.sum(F.col("rn") - 1).cast(d38).alias("st"),
            F.sum((F.col("rn") - 1).cast("long") * (F.col("rn") - 1))
            .cast(d38)
            .alias("st2"),
            F.sum("y").cast(d38).alias("sy"),
            F.sum((F.col("rn") - 1).cast("long") * F.col("y"))
            .cast(d38)
            .alias("sty"),
        )
    )
    ab = tr.select(
        F.expr(
            "CAST((st2 * sy - st * sty) * 1000000 div (k * st2 - st * st)"
            " AS DECIMAL(38,0))"
        ).alias("a6"),
        F.expr(
            "CAST((k * sty - st * sy) * 1000000 div (k * st2 - st * st)"
            " AS DECIMAL(38,0))"
        ).alias("b6"),
    )
    dowm = (
        idx.crossJoin(F.broadcast(nn))
        .filter(F.col("rn") <= F.col("n_train"))
        .groupBy("dow")
        .agg(F.expr("CAST(CAST(SUM(y) AS DECIMAL(38,0)) div COUNT(*)"
                    " AS BIGINT)").alias("m3"))
    )
    test = (
        idx.join(F.broadcast(dowm), "dow")
        .crossJoin(F.broadcast(nn))
        .crossJoin(F.broadcast(ab))
        .filter((F.col("rn") > F.col("n_train")) & F.col("m1").isNotNull())
        .select(
            "y",
            "m1",
            F.expr("CAST((a6 + b6 * (rn - 1)) div 1000000 AS BIGINT)").alias(
                "m2"
            ),
            "m3",
        )
    )
    ens = F.greatest(
        F.least(F.col("m1"), F.col("m2")),
        F.least(F.greatest(F.col("m1"), F.col("m2")), F.col("m3")),
    )
    sc = test.select("y", "m1", "m2", "m3", ens.alias("ens"))
    return sc.agg(
        F.count(F.lit(1)).cast("long").alias("n_test"),
        F.sum(F.abs(F.col("y") - F.col("m1"))).cast("long").alias(
            "ae_seasonal_naive"
        ),
        F.sum(F.abs(F.col("y") - F.col("m2"))).cast("long").alias("ae_trend"),
        F.sum(F.abs(F.col("y") - F.col("m3"))).cast("long").alias("ae_dow_mean"),
        F.sum(F.abs(F.col("y") - F.col("ens"))).cast("long").alias("ae_ensemble"),
        (
            F.sum(F.abs(F.col("y") - F.col("ens"))).cast("double")
            / F.count(F.lit(1))
        ).alias("mae_ensemble_cents"),
    )


# ---------------------------------------------------------------------------
# X-109: XmR control chart (statistical process control)
# ---------------------------------------------------------------------------

_SPC_ORACLE = """
    WITH daily AS (
        SELECT CAST(FLOOR(epoch(date_trunc('day', ts))) AS BIGINT) // 86400 AS d,
               CAST(SUM(CASE WHEN event_type = 'purchase'
                        THEN CAST(FLOOR(value * 100 + 0.5) AS BIGINT)
                        ELSE 0 END) AS BIGINT) AS y
        FROM events GROUP BY 1
    ),
    mr AS (
        SELECT d, y, abs(y - LAG(y) OVER (ORDER BY d)) AS r
        FROM daily
    ),
    lim AS (
        SELECT CAST(CAST(SUM(y) AS HUGEINT) * 1000 // COUNT(*) AS BIGINT)
                   AS cl_milli,
               CAST(CAST(SUM(r) AS HUGEINT) * 1000 // COUNT(r) AS BIGINT)
                   AS mrbar_milli
        FROM mr
    ),
    flags AS (
        SELECT m.d, m.y, l.cl_milli, l.mrbar_milli,
               CASE WHEN 1000 * m.y > l.cl_milli + (2660 * l.mrbar_milli) // 1000
                    THEN 1 ELSE 0 END AS above_ucl,
               CASE WHEN 1000 * m.y < l.cl_milli - (2660 * l.mrbar_milli) // 1000
                    THEN 1 ELSE 0 END AS below_lcl
        FROM mr m, lim l
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_days,
           CAST(MAX(cl_milli) AS DOUBLE) / 1e3 AS center_cents,
           CAST(MAX(cl_milli) + (2660 * MAX(mrbar_milli)) // 1000 AS DOUBLE)
               / 1e3 AS ucl_cents,
           CAST(MAX(cl_milli) - (2660 * MAX(mrbar_milli)) // 1000 AS DOUBLE)
               / 1e3 AS lcl_cents,
           CAST(SUM(above_ucl) AS BIGINT) AS n_above_ucl,
           CAST(SUM(below_lcl) AS BIGINT) AS n_below_lcl,
           CAST(MIN(CASE WHEN above_ucl = 1 OR below_lcl = 1 THEN d END)
                AS BIGINT) AS first_signal_day
    FROM flags
"""


@query("q319_xmr_control_chart", oracle=_SPC_ORACLE, tags=("X-109", "W-02"))
def q319_xmr_control_chart(spark: SparkSession, sf_dir: str) -> DataFrame:
    """XmR (individuals / moving-range) control chart over daily
    revenue: center line = mean, control limits = mean +/- 2.66 * mean
    moving range (the Shewhart individuals-chart constant), and the
    out-of-control day count + first signal day — the SPC monitoring
    discipline behind every ops dashboard, DISTINCT from the X-20/X-83
    anomaly gates: control limits derive from short-term (day-to-day)
    variation, so a slow drift that inflates the overall sigma still
    signals here.

    Determinism: the center and mean moving range are exact integer
    milli-cent floor divisions; the 2.66 constant enters as the exact
    integer ratio 2660/1000, so every limit comparison is pure integer
    arithmetic — no float decides a signal; display values are scaled
    at readout only.

    Scale shape: one fact rollup to the bounded daily relation; the
    lag, limits, and flags all run on it (q292 discipline).

    Reference parity: beyond-reference; the reference's dashboards
    plot counts with no control limits at all."""
    daily = (
        load(spark, sf_dir, "events")
        .select(
            (F.unix_timestamp(F.date_trunc("day", F.col("ts"))) / F.lit(86400))
            .cast("long")
            .alias("d"),
            F.when(
                F.col("event_type") == "purchase",
                F.floor(F.col("value") * 100 + 0.5).cast("long"),
            )
            .otherwise(0)
            .alias("c"),
        )
        .groupBy("d")
        .agg(F.sum("c").cast("long").alias("y"))
    )
    mr = daily.select(
        "d",
        "y",
        F.abs(F.col("y") - F.lag("y").over(Window.orderBy("d"))).alias("r"),
    ).transform(stage)  # limits + flags share it
    lim = mr.agg(
        F.expr(
            "CAST(CAST(SUM(y) AS DECIMAL(38,0)) * 1000 div COUNT(*) AS BIGINT)"
        ).alias("cl_milli"),
        F.expr(
            "CAST(CAST(SUM(r) AS DECIMAL(38,0)) * 1000 div COUNT(r) AS BIGINT)"
        ).alias("mrbar_milli"),
    )
    flags = mr.crossJoin(F.broadcast(lim)).select(
        "d",
        "cl_milli",
        "mrbar_milli",
        F.when(
            1000 * F.col("y")
            > F.col("cl_milli") + F.expr("(2660 * mrbar_milli) div 1000"),
            1,
        )
        .otherwise(0)
        .alias("above_ucl"),
        F.when(
            1000 * F.col("y")
            < F.col("cl_milli") - F.expr("(2660 * mrbar_milli) div 1000"),
            1,
        )
        .otherwise(0)
        .alias("below_lcl"),
    )
    return flags.agg(
        F.count(F.lit(1)).cast("long").alias("n_days"),
        (F.max("cl_milli").cast("double") / F.lit(1e3)).alias("center_cents"),
        (
            (
                F.max("cl_milli") + F.expr("(2660 * MAX(mrbar_milli)) div 1000")
            ).cast("double")
            / F.lit(1e3)
        ).alias("ucl_cents"),
        (
            (
                F.max("cl_milli") - F.expr("(2660 * MAX(mrbar_milli)) div 1000")
            ).cast("double")
            / F.lit(1e3)
        ).alias("lcl_cents"),
        F.sum("above_ucl").cast("long").alias("n_above_ucl"),
        F.sum("below_lcl").cast("long").alias("n_below_lcl"),
        F.min(
            F.when(
                (F.col("above_ucl") == 1) | (F.col("below_lcl") == 1), F.col("d")
            )
        )
        .cast("long")
        .alias("first_signal_day"),
    )


# ---------------------------------------------------------------------------
# X-112: multivariate (Mahalanobis) daily anomaly detection
# ---------------------------------------------------------------------------

_MH_TOPK = 5

_MAHA_ORACLE = f"""
    WITH daily AS (
        SELECT CAST(FLOOR(epoch(date_trunc('day', ts))) AS BIGINT) // 86400 AS d,
               CAST(SUM(CASE WHEN event_type = 'purchase'
                        THEN CAST(FLOOR(value * 100 + 0.5) AS BIGINT)
                        ELSE 0 END) AS BIGINT) AS rev,
               CAST(COUNT(*) AS BIGINT) AS ev,
               CAST(COUNT(DISTINCT user_id) AS BIGINT) AS us
        FROM events GROUP BY 1
    ),
    mu AS (
        SELECT CAST(SUM(rev) AS HUGEINT) // COUNT(*) AS m_rev,
               CAST(SUM(ev) AS HUGEINT) // COUNT(*) AS m_ev,
               CAST(SUM(us) AS HUGEINT) // COUNT(*) AS m_us
        FROM daily
    ),
    pm AS (
        SELECT d.d,
               CAST(d.rev * 1000 // m.m_rev AS BIGINT) AS x1,
               CAST(d.ev * 1000 // m.m_ev AS BIGINT) AS x2,
               CAST(d.us * 1000 // m.m_us AS BIGINT) AS x3
        FROM daily d, mu m
    ),
    mom AS (
        SELECT CAST(COUNT(*) AS HUGEINT) AS n,
               CAST(SUM(x1) AS HUGEINT) AS s1, CAST(SUM(x2) AS HUGEINT) AS s2,
               CAST(SUM(x3) AS HUGEINT) AS s3,
               CAST(SUM(x1 * x1) AS HUGEINT) AS s11,
               CAST(SUM(x1 * x2) AS HUGEINT) AS s12,
               CAST(SUM(x1 * x3) AS HUGEINT) AS s13,
               CAST(SUM(x2 * x2) AS HUGEINT) AS s22,
               CAST(SUM(x2 * x3) AS HUGEINT) AS s23,
               CAST(SUM(x3 * x3) AS HUGEINT) AS s33
        FROM pm
    ),
    cov AS (
        SELECT n,
               n * s11 - s1 * s1 AS a, n * s12 - s1 * s2 AS b,
               n * s13 - s1 * s3 AS c, n * s22 - s2 * s2 AS dd,
               n * s23 - s2 * s3 AS e, n * s33 - s3 * s3 AS f,
               s1, s2, s3
        FROM mom
    ),
    dets AS (
        SELECT *,
               a * (dd * f - e * e) - b * (b * f - c * e)
                   + c * (b * e - c * dd) AS det
        FROM cov
    ),
    scored AS (
        SELECT p.d, p.x1, p.x2, p.x3,
               CAST((
                   (c2.n * p.x1 - c2.s1) * (c2.n * p.x1 - c2.s1)
                       * (c2.dd * c2.f - c2.e * c2.e)
                   + (c2.n * p.x2 - c2.s2) * (c2.n * p.x2 - c2.s2)
                       * (c2.a * c2.f - c2.c * c2.c)
                   + (c2.n * p.x3 - c2.s3) * (c2.n * p.x3 - c2.s3)
                       * (c2.a * c2.dd - c2.b * c2.b)
                   + 2 * (c2.n * p.x1 - c2.s1) * (c2.n * p.x2 - c2.s2)
                       * (c2.c * c2.e - c2.b * c2.f)
                   + 2 * (c2.n * p.x1 - c2.s1) * (c2.n * p.x3 - c2.s3)
                       * (c2.b * c2.e - c2.c * c2.dd)
                   + 2 * (c2.n * p.x2 - c2.s2) * (c2.n * p.x3 - c2.s3)
                       * (c2.b * c2.c - c2.a * c2.e)
               ) * (c2.n - 1) * 1000 // (c2.det * c2.n) AS BIGINT) AS d2_milli
        FROM pm p, dets c2
    )
    SELECT d AS day, x1 AS rev_permille, x2 AS events_permille,
           x3 AS users_permille,
           CAST(d2_milli AS DOUBLE) / 1e3 AS mahalanobis_sq
    FROM scored
    ORDER BY d2_milli DESC, day
    LIMIT {_MH_TOPK}
"""


@query("q322_mahalanobis_anomaly", oracle=_MAHA_ORACLE, tags=("X-112", "A-14"))
def q322_mahalanobis_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multivariate daily anomaly detection by Mahalanobis distance over
    three correlated health metrics (revenue, events, distinct users,
    each normalized to per-mille-of-mean so the statistic is
    scale-invariant): the top-5 days whose JOINT position is farthest
    from the center under the inverse covariance — the anomaly class
    every univariate gate (X-20 MAD, X-83 consensus, q319 SPC) misses:
    a day where revenue is normal-high but users are normal-low is
    jointly bizarre while each margin looks fine.

    Determinism: per-mille metrics are exact integer floor-divisions;
    the 3x3 scatter matrix entries n*Sxy - Sx*Sy, its adjugate (each
    entry a 2x2 integer determinant), its determinant, and the
    quadratic form (n*x - S)' adj (n*x - S) are ALL exact integers —
    Mahalanobis d^2 collapses to ONE integer floor-division per day
    (times the n-1 bias factor), ranked under a (d2, day) total order.
    The per-mille pre-normalization also bounds every intermediate
    below decimal(38) at ANY data scale.

    Scale shape: one fact rollup to the bounded daily relation; one
    10-moment single-row rollup (A-14 mergeable); scoring is map-only
    over the bounded relation with the moment row broadcast.

    Reference parity: beyond-reference."""
    daily = (
        load(spark, sf_dir, "events")
        .groupBy(
            (F.unix_timestamp(F.date_trunc("day", F.col("ts"))) / F.lit(86400))
            .cast("long")
            .alias("d")
        )
        .agg(
            F.sum(
                F.when(
                    F.col("event_type") == "purchase",
                    F.floor(F.col("value") * 100 + 0.5).cast("long"),
                ).otherwise(0)
            )
            .cast("long")
            .alias("rev"),
            F.count(F.lit(1)).cast("long").alias("ev"),
            F.countDistinct("user_id").cast("long").alias("us"),
        )
    )
    mu = daily.agg(
        F.expr("CAST(CAST(SUM(rev) AS DECIMAL(38,0)) div COUNT(*) AS BIGINT)")
        .alias("m_rev"),
        F.expr("CAST(CAST(SUM(ev) AS DECIMAL(38,0)) div COUNT(*) AS BIGINT)")
        .alias("m_ev"),
        F.expr("CAST(CAST(SUM(us) AS DECIMAL(38,0)) div COUNT(*) AS BIGINT)")
        .alias("m_us"),
    )
    pm = daily.crossJoin(F.broadcast(mu)).select(
        "d",
        F.expr("CAST(rev * 1000 div m_rev AS BIGINT)").alias("x1"),
        F.expr("CAST(ev * 1000 div m_ev AS BIGINT)").alias("x2"),
        F.expr("CAST(us * 1000 div m_us AS BIGINT)").alias("x3"),
    ).transform(stage)  # the moment rollup + scoring share it
    d38 = "decimal(38,0)"
    mom = pm.agg(
        F.count(F.lit(1)).cast(d38).alias("n"),
        F.sum("x1").cast(d38).alias("s1"),
        F.sum("x2").cast(d38).alias("s2"),
        F.sum("x3").cast(d38).alias("s3"),
        F.sum(F.col("x1") * F.col("x1")).cast(d38).alias("s11"),
        F.sum(F.col("x1") * F.col("x2")).cast(d38).alias("s12"),
        F.sum(F.col("x1") * F.col("x3")).cast(d38).alias("s13"),
        F.sum(F.col("x2") * F.col("x2")).cast(d38).alias("s22"),
        F.sum(F.col("x2") * F.col("x3")).cast(d38).alias("s23"),
        F.sum(F.col("x3") * F.col("x3")).cast(d38).alias("s33"),
    )
    cov = mom.select(
        "n",
        "s1",
        "s2",
        "s3",
        F.expr("n * s11 - s1 * s1").alias("a"),
        F.expr("n * s12 - s1 * s2").alias("b"),
        F.expr("n * s13 - s1 * s3").alias("c"),
        F.expr("n * s22 - s2 * s2").alias("dd"),
        F.expr("n * s23 - s2 * s3").alias("e"),
        F.expr("n * s33 - s3 * s3").alias("f"),
    ).withColumn(
        "det",
        F.expr(
            "a * (dd * f - e * e) - b * (b * f - c * e)"
            " + c * (b * e - c * dd)"
        ),
    )
    scored = pm.crossJoin(F.broadcast(cov)).select(
        "d",
        "x1",
        "x2",
        "x3",
        F.expr(
            "CAST(("
            " (n * x1 - s1) * (n * x1 - s1) * (dd * f - e * e)"
            " + (n * x2 - s2) * (n * x2 - s2) * (a * f - c * c)"
            " + (n * x3 - s3) * (n * x3 - s3) * (a * dd - b * b)"
            " + 2 * (n * x1 - s1) * (n * x2 - s2) * (c * e - b * f)"
            " + 2 * (n * x1 - s1) * (n * x3 - s3) * (b * e - c * dd)"
            " + 2 * (n * x2 - s2) * (n * x3 - s3) * (b * c - a * e)"
            ") * (n - 1) * 1000 div (det * n) AS BIGINT)"
        ).alias("d2_milli"),
    )
    return (
        scored.select(
            F.col("d").alias("day"),
            F.col("x1").alias("rev_permille"),
            F.col("x2").alias("events_permille"),
            F.col("x3").alias("users_permille"),
            (F.col("d2_milli").cast("double") / F.lit(1e3)).alias(
                "mahalanobis_sq"
            ),
        )
        .transform(pin)
        .orderBy(F.col("mahalanobis_sq").desc(), "day")
        .limit(_MH_TOPK)
    )


# ---------------------------------------------------------------------------
# X-115: Erlang-C capacity planning from the peak arrival rate
# ---------------------------------------------------------------------------

_EC_KMAX = 16  #: unrolled Erlang-B recurrence depth (covers c_min+4 <= 13)


def _erlang_chain_ctes() -> str:
    """b1..bK as MATERIALIZED chained CTEs — lateral column aliases (or
    inlined CTEs) expand each b_{k-1} reference twice per level, an
    exponential optimizer blowup measured at ~95 s; materializing each
    level keeps it linear."""
    out = ""
    prev = "base"
    for k in range(1, _EC_KMAX + 1):
        out += f""",
    ch{k} AS MATERIALIZED (
        SELECT *, CAST((a_milli * b{k-1})
             // (1000 * {k} + (a_milli * b{k-1}) // 1000) AS BIGINT) AS b{k}
        FROM {prev}
    )"""
        prev = f"ch{k}"
    return out


def _erlang_b_case() -> str:
    arms = " ".join(f"WHEN {k} THEN b{k}" for k in range(1, _EC_KMAX + 1))
    return f"CASE c {arms} END"


_ERLANG_ORACLE = f"""
    WITH hourly AS (
        SELECT CAST(FLOOR(epoch(ts)) AS BIGINT) // 3600 AS h,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM events GROUP BY 1
    ),
    peak AS (SELECT CAST(MAX(n) AS BIGINT) AS lam FROM hourly),
    base AS (
        SELECT lam, (lam + 7) // 8 AS mu,
               CAST(lam * 1000 // ((lam + 7) // 8) AS BIGINT) AS a_milli,
               CAST(1000 AS BIGINT) AS b0
        FROM peak
    ){_erlang_chain_ctes()},
    grid AS (
        SELECT ch.*, CAST(ch.a_milli // 1000 + 1 + o.off AS BIGINT) AS c
        FROM ch{_EC_KMAX} ch CROSS JOIN (SELECT unnest(range(0, 5)) AS off) o
    ),
    ec AS (
        SELECT lam, mu, a_milli, c, {_erlang_b_case()} AS bc
        FROM grid
    )
    SELECT c AS agents, lam AS peak_per_hour, mu AS per_agent_per_hour,
           CAST(a_milli AS DOUBLE) / 1e3 AS offered_load,
           CAST(CAST(1000 * c * bc AS HUGEINT)
                // (1000 * c - (a_milli * (1000 - bc)) // 1000) AS DOUBLE)
               / 1e3 AS prob_wait
    FROM ec
    ORDER BY agents
"""


@query("q325_erlang_c_staffing", oracle=_ERLANG_ORACLE, tags=("X-115", "A-06"))
def q325_erlang_c_staffing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Erlang-C capacity planning: from the PEAK hourly arrival rate
    and a per-agent service rate pegged at an eighth of peak (offered
    load ~= 8 Erlangs at any data scale), the probability an arrival
    must WAIT for each staffing level c = ceil(a)+1 .. +5 — the
    M/M/c staffing table behind every support-desk / worker-pool sizing
    decision, and the queueing-theory complement of q246's Lindley
    backlog replay (that simulates one policy; this gives the whole
    staffing curve from two rates).

    Determinism: the Erlang-B recurrence B_k = aB/(k + aB) runs as an
    unrolled exact integer milli-unit chain with DEFINED floors at
    every step (both engines compute the identical integers — the
    q221/q299 discipline applied to a numeric recurrence), and the
    B-to-C conversion is one more integer floor-division; the two
    doubles are display scalings. Pegging mu to lam/8 bounds the
    recurrence depth at any scale.

    Scale shape: one fact rollup to bounded hours, a single-row chain
    of {_EC_KMAX} scalar columns, a 5-row grid.

    Reference parity: beyond-reference."""
    hourly = (
        load(spark, sf_dir, "events")
        .groupBy(
            F.expr("CAST(FLOOR(unix_timestamp(ts)) AS BIGINT) div 3600").alias(
                "h"
            )
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    lam = int(hourly.agg(F.max("n").alias("lam")).first()["lam"])
    # the recurrence is scalar work on ONE collected integer (the X-15
    # bounded-driver-traffic discipline); a relational withColumn chain
    # was measured 50x slower — CollapseProject inlines each b_{k-1}
    # reference twice per level, an exponential expression blowup.
    mu = (lam + 7) // 8
    a_milli = lam * 1000 // mu
    b = [1000]
    for k in range(1, _EC_KMAX + 1):
        b.append((a_milli * b[k - 1]) // (1000 * k + (a_milli * b[k - 1]) // 1000))
    c_min = a_milli // 1000 + 1
    rows = []
    for off in range(5):
        c = c_min + off
        bc = b[c]
        pw_milli = (1000 * c * bc) // (1000 * c - (a_milli * (1000 - bc)) // 1000)
        rows.append(
            (c, lam, mu, float(a_milli) / 1e3, float(pw_milli) / 1e3)
        )
    out = spark.createDataFrame(
        rows,
        "agents long, peak_per_hour long, per_agent_per_hour long, "
        "offered_load double, prob_wait double",
    )
    return out.transform(pin).orderBy("agents")


# ---------------------------------------------------------------------------
# X-83 (cont.): paired t-test — within-user weekend vs weekday contrast
# ---------------------------------------------------------------------------

_PAIRED_T_ORACLE = """
    WITH per_user AS (
        SELECT user_id,
               CAST(SUM(CASE WHEN dayofweek(date_trunc('day', ts)) + 1 IN (1, 7)
                        THEN CAST(FLOOR(value * 100 + 0.5) AS BIGINT)
                        ELSE 0 END) AS BIGINT) AS we_cents,
               CAST(SUM(CASE WHEN dayofweek(date_trunc('day', ts)) + 1 IN (1, 7)
                        THEN 0
                        ELSE CAST(FLOOR(value * 100 + 0.5) AS BIGINT)
                        END) AS BIGINT) AS wd_cents,
               MAX(CASE WHEN dayofweek(date_trunc('day', ts)) + 1 IN (1, 7)
                   THEN 1 ELSE 0 END) AS has_we,
               MAX(CASE WHEN dayofweek(date_trunc('day', ts)) + 1 IN (1, 7)
                   THEN 0 ELSE 1 END) AS has_wd
        FROM events WHERE event_type = 'purchase'
        GROUP BY user_id
    ),
    d AS (
        SELECT we_cents - wd_cents AS di FROM per_user
        WHERE has_we = 1 AND has_wd = 1
    ),
    m AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(di) AS BIGINT) AS s,
               CAST(SUM(CAST(di AS DECIMAL(19,0)) * CAST(di AS DECIMAL(19,0)))
                    AS DECIMAL(38,0)) AS s2
        FROM d
    )
    SELECT n AS n_pairs, s AS sum_diff_cents,
           ROUND(CAST(s AS DOUBLE) / n, 6) AS mean_diff_cents,
           CASE WHEN n < 2 OR n * s2 = CAST(s AS DECIMAL(19,0)) * s THEN NULL
                ELSE ROUND((CAST(s AS DOUBLE) / n)
                     / sqrt(CAST(n * s2 - CAST(s AS DECIMAL(19,0)) * s AS DOUBLE)
                            / n / (n - 1) / n), 6) END AS paired_t
    FROM m
"""


@query("q342_paired_ttest", oracle=_PAIRED_T_ORACLE, tags=("X-83", "X-23"))
def q342_paired_ttest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Paired t-test of the weekend effect: each user is their OWN
    control — per-user weekend purchase cents minus weekday purchase
    cents (users observed on both sides only), tested against zero with
    the one-sample t on the differences. The within-subject complement
    of q288's Welch test: Welch compares two independent day samples and
    pays for between-user variance; pairing differences it away, which
    is why matched designs detect smaller effects at the same n.

    Determinism: differences are exact integer cents; Σd and Σd² are
    exact (BIGINT / decimal(38,0)); the t statistic is a fixed-order
    IEEE expression over those integers (one sqrt, correctly rounded),
    rounded 6 dp; a degenerate spread (n < 2 or all differences equal)
    yields NULL identically in both engines via an exact integer
    predicate.

    Scale shape: ONE map-side-combined user-keyed rollup (conditional
    sums — the fact shuffles once), then ONE ungrouped A-14-mergeable
    moment aggregate; three numbers cross the final exchange and one row
    reaches the driver.

    Reference parity: beyond-reference; completes the calendar-contrast
    family (q288 Welch, q233 ANOVA, q180/q184 seasonal baseline)."""
    d19 = "decimal(19,0)"
    is_we = F.dayofweek(F.date_trunc("day", F.col("ts"))).isin(1, 7)
    cents = F.floor(F.col("value") * 100 + 0.5).cast("long")
    per_user = (
        load(spark, sf_dir, "events")
        .filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(
            F.sum(F.when(is_we, cents).otherwise(0)).cast("long").alias("we_cents"),
            F.sum(F.when(is_we, 0).otherwise(cents)).cast("long").alias("wd_cents"),
            F.max(F.when(is_we, 1).otherwise(0)).alias("has_we"),
            F.max(F.when(is_we, 0).otherwise(1)).alias("has_wd"),
        )
    )
    d = per_user.filter((F.col("has_we") == 1) & (F.col("has_wd") == 1)).select(
        (F.col("we_cents") - F.col("wd_cents")).alias("di")
    )
    m = d.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("di").cast("long").alias("s"),
        F.sum(F.col("di").cast(d19) * F.col("di").cast(d19))
        .cast("decimal(38,0)")
        .alias("s2"),
    )
    mean = F.col("s").cast("double") / F.col("n")
    var_num = F.expr(f"CAST(n * s2 - CAST(s AS {d19}) * s AS DOUBLE)")
    degenerate = (F.col("n") < 2) | F.expr(f"n * s2 = CAST(s AS {d19}) * s")
    return m.select(
        F.col("n").alias("n_pairs"),
        F.col("s").alias("sum_diff_cents"),
        F.round(mean, 6).alias("mean_diff_cents"),
        F.when(degenerate, F.lit(None).cast("double"))
        .otherwise(
            F.round(
                mean
                / F.sqrt(var_num / F.col("n") / (F.col("n") - 1) / F.col("n")),
                6,
            )
        )
        .alias("paired_t"),
    )


# ---------------------------------------------------------------------------
# X-20 (cont.): rolling windowed OLS trend per series
# ---------------------------------------------------------------------------

_ROLLTREND_ORACLE = """
    WITH daily AS (
        SELECT event_type,
               CAST(FLOOR(epoch(date_trunc('day', ts))) AS BIGINT) // 86400 AS d,
               CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS y
        FROM events GROUP BY 1, 2
    ),
    win AS (
        SELECT event_type, d,
               CAST(COUNT(*) OVER w AS BIGINT) AS n,
               CAST(SUM(d) OVER w AS DECIMAL(38,0)) AS sx,
               CAST(SUM(y) OVER w AS DECIMAL(38,0)) AS sy,
               CAST(SUM(CAST(d AS DECIMAL(19,0)) * y) OVER w AS DECIMAL(38,0)) AS sxy,
               CAST(SUM(CAST(d AS DECIMAL(19,0)) * d) OVER w AS DECIMAL(38,0)) AS sxx
        FROM daily
        WINDOW w AS (PARTITION BY event_type ORDER BY d
                     RANGE BETWEEN 13 PRECEDING AND CURRENT ROW)
    )
    SELECT event_type, d, n AS n_days,
           CASE WHEN n < 2 OR n * sxx = sx * sx THEN NULL
                ELSE ROUND(CAST(n * sxy - sx * sy AS DOUBLE)
                           / CAST(n * sxx - sx * sx AS DOUBLE), 6)
           END AS slope_cents_per_day
    FROM win ORDER BY event_type, d
"""


@query("q347_rolling_trend", oracle=_ROLLTREND_ORACLE, tags=("X-20", "W-04"))
def q347_rolling_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling trailing-14-day OLS slope of each event type's daily
    revenue — the windowed version of q154's whole-series trend and the
    feature a forecasting/alerting model actually consumes (the slope AT
    each day, not one slope for all time). Day index is the x variable,
    exact daily cents the y; the slope is the textbook
    (nΣxy−ΣxΣy)/(nΣx²−(Σx)²) where every moment is an exact-integer SUM
    over a RANGE frame keyed on the integer day — peers share frames by
    definition, no tie-break, no float accumulation anywhere; the single
    division runs on exact decimal operands cast to double and rounds at
    6 dp; a degenerate window (n<2, impossible here but pinned anyway)
    yields NULL identically in both engines via an exact predicate.

    Scale shape: ONE map-side-combined fact rollup onto the
    calendar-bounded (type, day) relation; the four moment windows share
    one frame over that bounded relation (more data adds cents, not
    rows), so window cost is independent of fact size — the W-04
    time-range discipline applied to regression features.

    Reference parity: beyond-reference; completes X-20's trend kit (q154
    global slope, q249 Theil-Sen, q141 EWMA) with the rolling form."""
    d19 = "decimal(19,0)"
    daily = (
        load(spark, sf_dir, "events")
        .select(
            "event_type",
            (F.unix_timestamp(F.date_trunc("day", F.col("ts"))) / F.lit(86400))
            .cast("long")
            .alias("d"),
            F.floor(F.col("value") * 100 + 0.5).cast("long").alias("cents"),
        )
        .groupBy("event_type", "d")
        .agg(F.sum("cents").cast("long").alias("y"))
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("d")
        .rangeBetween(-13, 0)
    )
    win = daily.select(
        "event_type",
        "d",
        F.count(F.lit(1)).over(w).cast("long").alias("n"),
        F.sum("d").over(w).cast("decimal(38,0)").alias("sx"),
        F.sum("y").over(w).cast("decimal(38,0)").alias("sy"),
        F.sum(F.col("d").cast(d19) * F.col("y")).over(w)
        .cast("decimal(38,0)")
        .alias("sxy"),
        F.sum(F.col("d").cast(d19) * F.col("d")).over(w)
        .cast("decimal(38,0)")
        .alias("sxx"),
    )
    degenerate = (F.col("n") < 2) | F.expr("n * sxx = sx * sx")
    slope = F.round(
        F.expr("CAST(n * sxy - sx * sy AS DOUBLE)")
        / F.expr("CAST(n * sxx - sx * sx AS DOUBLE)"),
        6,
    )
    return (
        win.select(
            "event_type",
            "d",
            F.col("n").alias("n_days"),
            F.when(degenerate, F.lit(None).cast("double"))
            .otherwise(slope)
            .alias("slope_cents_per_day"),
        )
        .transform(pin)
        .orderBy("event_type", "d")
    )


# ---------------------------------------------------------------------------
# X-24 / W-04: SLO error-budget burn rate with multiwindow paging flag
# ---------------------------------------------------------------------------

_SLO_BUDGET_PCT = 5  #: SLO 95% non-error -> 5% error budget

_SLO_ORACLE = """
    WITH hourly AS (
        SELECT CAST(FLOOR(epoch(date_trunc('hour', ts))) AS BIGINT) // 3600 AS h,
               CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
                    AS BIGINT) AS errors,
               CAST(COUNT(*) AS BIGINT) AS total
        FROM events GROUP BY 1
    ),
    win AS (
        SELECT h, errors, total,
               CAST(SUM(errors) OVER w AS BIGINT) AS e6,
               CAST(SUM(total) OVER w AS BIGINT) AS t6
        FROM hourly
        WINDOW w AS (ORDER BY h RANGE BETWEEN 5 PRECEDING AND CURRENT ROW)
    )
    SELECT h, errors, total,
           ROUND(20.0 * errors / total, 6) AS burn_1h,
           ROUND(20.0 * e6 / t6, 6) AS burn_6h,
           CAST(CASE WHEN 25 * errors >= 18 * total
                      AND 10 * e6 >= 3 * t6 THEN 1 ELSE 0 END
                AS BIGINT) AS page_flag
    FROM win ORDER BY h
"""


def hourly_error_counts(df):
    """(h, errors, total) per hour — ONE mergeable map-side-combined
    groupBy, so the identical code path runs over the batch table and a
    streaming source (complete-mode agg): the streamable state beneath
    q355's burn-rate readout (the RANGE-frame trailing windows run on
    this bounded relation downstream, per micro-batch)."""
    return (
        df.select(
            (F.unix_timestamp(F.date_trunc("hour", F.col("ts"))) / F.lit(3600))
            .cast("long")
            .alias("h"),
            (F.col("event_type") == "error").cast("int").alias("is_err"),
        )
        .groupBy("h")
        .agg(
            F.sum("is_err").cast("long").alias("errors"),
            F.count(F.lit(1)).cast("long").alias("total"),
        )
    )


@query("q355_slo_burn_rate", oracle=_SLO_ORACLE, tags=("X-24", "W-04"))
def q355_slo_burn_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SLO error-budget burn rate (the SRE multiwindow alert): per hour,
    the error share against a 95% SLO expressed as a burn-rate multiple
    (burn = error_rate / 5% budget; burn 1.0 = spending the budget
    exactly on schedule), over both the 1-hour window and the trailing
    6-hour window, with the paging flag requiring BOTH windows hot
    (fast window >= 14.4x AND slow window >= 6x — the multiwindow
    construction that stops one bad minute from paging while still
    catching sustained burns). The alerting layer on top of q354's gap
    detection and q184's anomaly flags.

    Determinism: hourly counts are exact integers; burn rates divide
    exact integers once (the 20.0 factor is 1/0.05 as an exact literal)
    and round at 6 dp; the paging thresholds are rewritten to the EXACT
    integer inequalities 25*errors >= 18*total and 10*e6 >= 3*t6 — no
    float boundary decides an alert.

    Scale shape: ONE map-side-combined fact rollup onto the
    calendar-bounded hourly relation; both trailing sums ride one RANGE
    frame over that bounded relation (window cost independent of fact
    size — the W-04 discipline); at 100 TB this is a streaming twin of
    the T-06 sliding window with the same hourly state.

    Reference parity: beyond-reference; the reference's consumer logs
    errors but never aggregates them into an operational signal."""
    hourly = hourly_error_counts(load(spark, sf_dir, "events"))
    w = Window.orderBy("h").rangeBetween(-5, 0)
    win = hourly.select(
        "h",
        "errors",
        "total",
        F.sum("errors").over(w).cast("long").alias("e6"),
        F.sum("total").over(w).cast("long").alias("t6"),
    )
    page = (25 * F.col("errors") >= 18 * F.col("total")) & (
        10 * F.col("e6") >= 3 * F.col("t6")
    )
    return (
        win.select(
            "h",
            "errors",
            "total",
            F.round(F.lit(20.0) * F.col("errors") / F.col("total"), 6).alias(
                "burn_1h"
            ),
            F.round(F.lit(20.0) * F.col("e6") / F.col("t6"), 6).alias("burn_6h"),
            page.cast("long").alias("page_flag"),
        )
        .transform(pin)
        .orderBy("h")
    )


# ---------------------------------------------------------------------------
# X-20 (cont.): linear-interpolation gap fill for hourly series
# ---------------------------------------------------------------------------

_LERP_ORACLE = """
    WITH known AS (
        SELECT event_type,
               CAST(FLOOR(epoch(date_trunc('hour', ts))) AS BIGINT) // 3600 AS h,
               CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS cents
        FROM events GROUP BY 1, 2
    ),
    bounds AS (
        SELECT event_type, MIN(h) AS lo, MAX(h) AS hi FROM known GROUP BY 1
    ),
    spine AS (
        SELECT b.event_type, u.h
        FROM bounds b, LATERAL (SELECT unnest(range(b.lo, b.hi + 1)) AS h) u
    ),
    joined AS (
        SELECT s.event_type, s.h, k.cents
        FROM spine s LEFT JOIN known k
          ON k.event_type = s.event_type AND k.h = s.h
    ),
    bracketed AS (
        SELECT event_type, h, cents,
               LAST_VALUE(cents IGNORE NULLS) OVER wp AS vp,
               LAST_VALUE(CASE WHEN cents IS NOT NULL THEN h END IGNORE NULLS)
                   OVER wp AS hp,
               FIRST_VALUE(cents IGNORE NULLS) OVER wn AS vn,
               FIRST_VALUE(CASE WHEN cents IS NOT NULL THEN h END IGNORE NULLS)
                   OVER wn AS hn
        FROM joined
        WINDOW wp AS (PARTITION BY event_type ORDER BY h
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
               wn AS (PARTITION BY event_type ORDER BY h
                      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
    )
    SELECT event_type, h,
           CAST(CASE WHEN cents IS NOT NULL THEN 0 ELSE 1 END AS BIGINT)
               AS interpolated,
           CASE WHEN cents IS NOT NULL THEN ROUND(CAST(cents AS DOUBLE), 6)
                ELSE ROUND(vp + CAST((vn - vp) * (h - hp) AS DOUBLE)
                                / (hn - hp), 6)
           END AS cents_filled
    FROM bracketed
    ORDER BY event_type, h
"""


@query("q361_linear_interpolation", oracle=_LERP_ORACLE, tags=("X-20", "X-09"))
def q361_linear_interpolation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear-interpolation gap fill: each event type's hourly revenue
    series completed over its own calendar spine, missing hours filled
    by exact linear interpolation between the bracketing known points —
    the numeric companion of q123's forward fill (ffill holds a level;
    interpolation respects trend, which is what a downstream
    rate-of-change feature needs) over exactly the gaps q354 detects.
    Interior gaps always have both brackets (the spine spans [min, max]
    of KNOWN points), so no fill is ever NULL.

    Determinism: known values are exact cents; the interpolation
    numerator (vn-vp)*(h-hp) is an exact integer, divided once by the
    exact integer bracket width and added to the exact base — identical
    IEEE operands in both engines, rounded 6 dp.

    Scale shape: ONE map-side-combined fact rollup onto the
    calendar-bounded hourly relation; the spine explodes map-only from
    |types| bound rows; the four bracket lookups are two window passes
    (backward last-non-null, forward first-non-null) over that bounded
    relation — the q123 ffill discipline doubled, never a self-join or
    per-gap probe.

    Reference parity: beyond-reference; completes the X-20 smoothing kit
    (q141 EWMA, q123 ffill, q304 seasonal decomposition) with the
    trend-respecting fill."""
    known = (
        load(spark, sf_dir, "events")
        .select(
            "event_type",
            (F.unix_timestamp(F.date_trunc("hour", F.col("ts"))) / F.lit(3600))
            .cast("long")
            .alias("h"),
            F.floor(F.col("value") * 100 + 0.5).cast("long").alias("c"),
        )
        .groupBy("event_type", "h")
        .agg(F.sum("c").cast("long").alias("cents"))
        .transform(stage)  # bounds leg + join leg share one build
    )
    bounds = known.groupBy("event_type").agg(
        F.min("h").alias("lo"), F.max("h").alias("hi")
    )
    spine = bounds.select(
        "event_type", F.explode(F.sequence("lo", "hi")).alias("h")
    )
    joined = spine.join(known, ["event_type", "h"], "left")
    wp = (
        Window.partitionBy("event_type")
        .orderBy("h")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wn = (
        Window.partitionBy("event_type")
        .orderBy("h")
        .rowsBetween(0, Window.unboundedFollowing)
    )
    known_h = F.when(F.col("cents").isNotNull(), F.col("h"))
    br = joined.select(
        "event_type",
        "h",
        "cents",
        F.last("cents", ignorenulls=True).over(wp).alias("vp"),
        F.last(known_h, ignorenulls=True).over(wp).alias("hp"),
        F.first("cents", ignorenulls=True).over(wn).alias("vn"),
        F.first(known_h, ignorenulls=True).over(wn).alias("hn"),
    )
    lerp = F.round(
        F.col("vp")
        + ((F.col("vn") - F.col("vp")) * (F.col("h") - F.col("hp"))).cast("double")
        / (F.col("hn") - F.col("hp")),
        6,
    )
    return (
        br.select(
            "event_type",
            "h",
            F.col("cents").isNull().cast("long").alias("interpolated"),
            F.when(
                F.col("cents").isNotNull(), F.round(F.col("cents").cast("double"), 6)
            )
            .otherwise(lerp)
            .alias("cents_filled"),
        )
        .transform(pin)
        .orderBy("event_type", "h")
    )


# ---------------------------------------------------------------------------
# X-20 (cont.): calendar-mix-adjusted week-over-week growth
# ---------------------------------------------------------------------------

_CMIX_ORACLE = """
    WITH daily AS (
        SELECT CAST(FLOOR(epoch(date_trunc('day', ts))) AS BIGINT) // 86400 AS d,
               CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
                   AS cents
        FROM events WHERE event_type = 'purchase' GROUP BY 1
    ),
    tagged AS (
        SELECT d, d // 7 AS w, d % 7 AS dow, cents FROM daily
    ),
    dowstats AS (
        SELECT dow, CAST(SUM(cents) AS BIGINT) AS s,
               CAST(COUNT(*) AS BIGINT) AS c
        FROM tagged GROUP BY dow
    ),
    wk_dow AS (
        SELECT w, dow, CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(cents) AS BIGINT) AS actual_part
        FROM tagged GROUP BY w, dow
    ),
    expected AS (
        SELECT w,
               CAST(SUM(CAST(ROUND(CAST(ds.s AS DOUBLE) * wd.n / ds.c, 6)
                    AS DECIMAL(28,6))) AS DOUBLE) AS expected_cents,
               CAST(SUM(wd.actual_part) AS BIGINT) AS actual_cents
        FROM wk_dow wd JOIN dowstats ds ON ds.dow = wd.dow
        GROUP BY w
    )
    SELECT w, actual_cents,
           ROUND(expected_cents, 6) AS expected_cents,
           ROUND(actual_cents / expected_cents, 6) AS mix_adjusted_index,
           ROUND(CAST(actual_cents AS DOUBLE)
                 / LAG(actual_cents) OVER (ORDER BY w), 6) AS raw_wow
    FROM expected ORDER BY w
"""


@query("q369_calendar_adjusted_growth", oracle=_CMIX_ORACLE, tags=("X-20", "W-02"))
def q369_calendar_adjusted_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar-mix-adjusted weekly revenue index: each week's actual
    revenue against what the global day-of-week profile PREDICTS for the
    days that week actually contains, plus the raw week-over-week ratio
    — the adjustment that stops a week with an extra weekend (or a
    partial first/last week, which raw WoW always misreads) from
    looking like growth. Index > 1 means genuinely above the calendar
    expectation; raw_wow swinging while the index is flat is pure
    calendar mix.

    Determinism: daily cents exact; expected = sum over dows of
    (dow total x days present / dow day-count), each term one exact-
    operand division rounded 6 dp then DECIMAL-summed (the q120
    cross-libm discipline applied to IEEE term ordering); ratios round
    6 dp; the first week's raw_wow is NULL in both engines.

    Scale shape: ONE map-side-combined fact rollup onto the calendar-
    bounded daily relation; everything downstream (dow profile, weekly
    rollup, expected join, lag) runs on bounded relations.

    Reference parity: beyond-reference; the seasonality-aware growth
    read on top of q180's profile and q358's ledger."""
    daily = (
        load(spark, sf_dir, "events")
        .filter(F.col("event_type") == "purchase")
        .groupBy(
            (F.unix_timestamp(F.date_trunc("day", F.col("ts"))) / F.lit(86400))
            .cast("long")
            .alias("d")
        )
        .agg(
            F.sum(F.floor(F.col("value") * 100 + 0.5).cast("long"))
            .cast("long")
            .alias("cents")
        )
        .select(
            "d",
            F.expr("d DIV 7").alias("w"),
            F.expr("d % 7").alias("dow"),
            "cents",
        )
        .transform(stage)  # dow profile + weekly legs share one build
    )
    dowstats = daily.groupBy("dow").agg(
        F.sum("cents").cast("long").alias("s"),
        F.count(F.lit(1)).cast("long").alias("c"),
    )
    wk_dow = daily.groupBy("w", "dow").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("cents").cast("long").alias("actual_part"),
    )
    term = F.round(
        F.col("s").cast("double") * F.col("n") / F.col("c"), 6
    ).cast("decimal(28,6)")
    expected = (
        wk_dow.join(F.broadcast(dowstats), "dow")
        .groupBy("w")
        .agg(
            F.sum(term).cast("double").alias("expected_cents"),
            F.sum("actual_part").cast("long").alias("actual_cents"),
        )
    )
    lag_actual = F.lag("actual_cents").over(Window.partitionBy().orderBy("w"))
    return (
        expected.select(
            "w",
            "actual_cents",
            F.round("expected_cents", 6).alias("expected_cents"),
            F.round(
                F.col("actual_cents") / F.col("expected_cents"), 6
            ).alias("mix_adjusted_index"),
            F.round(F.col("actual_cents").cast("double") / lag_actual, 6).alias(
                "raw_wow"
            ),
        )
        .transform(pin)
        .orderBy("w")
    )


# ---------------------------------------------------------------------------
# X-83 (cont.): two-way factorial ANOVA with interaction
# ---------------------------------------------------------------------------

_ANOVA2_ORACLE = """
    WITH cells AS (
        SELECT event_type AS a, dayofweek(date_trunc('day', ts)) + 1 AS b,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT))
                    AS HUGEINT) AS s,
               CAST(SUM(CAST(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)
                             AS HUGEINT)
                        * CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT))
                    AS HUGEINT) AS s2
        FROM events GROUP BY 1, 2
    ),
    cell_terms AS (
        SELECT a, b, n, s, s2,
               CAST(ROUND(CAST(s * s AS DOUBLE) / n, 6) AS DECIMAL(28,6))
                   AS sq_over_n
        FROM cells
    ),
    marg_a AS (
        SELECT a, CAST(SUM(n) AS BIGINT) AS n, CAST(SUM(s) AS HUGEINT) AS s
        FROM cells GROUP BY a
    ),
    marg_b AS (
        SELECT b, CAST(SUM(n) AS BIGINT) AS n, CAST(SUM(s) AS HUGEINT) AS s
        FROM cells GROUP BY b
    ),
    tots AS (
        SELECT CAST(SUM(n) AS BIGINT) AS nn,
               CAST(SUM(s) AS HUGEINT) AS t,
               CAST(SUM(s2) AS HUGEINT) AS ss2,
               CAST(SUM(sq_over_n) AS DECIMAL(28,6)) AS sq_cells,
               CAST(COUNT(*) AS BIGINT) AS n_cells,
               (SELECT CAST(SUM(CAST(ROUND(CAST(s * s AS DOUBLE) / n, 6)
                                AS DECIMAL(28,6))) AS DECIMAL(28,6))
                FROM marg_a) AS sq_a,
               (SELECT CAST(COUNT(*) AS BIGINT) FROM marg_a) AS ka,
               (SELECT CAST(SUM(CAST(ROUND(CAST(s * s AS DOUBLE) / n, 6)
                                AS DECIMAL(28,6))) AS DECIMAL(28,6))
                FROM marg_b) AS sq_b,
               (SELECT CAST(COUNT(*) AS BIGINT) FROM marg_b) AS kb
        FROM cell_terms
    )
    SELECT nn AS n_events, ka AS a_levels, kb AS b_levels,
           ROUND(CAST(sq_a AS DOUBLE) - CAST(t * t AS DOUBLE) / nn, 2) AS ss_a,
           ROUND(CAST(sq_b AS DOUBLE) - CAST(t * t AS DOUBLE) / nn, 2) AS ss_b,
           ROUND(CAST(sq_cells AS DOUBLE) - CAST(sq_a AS DOUBLE)
                 - CAST(sq_b AS DOUBLE) + CAST(t * t AS DOUBLE) / nn, 2)
               AS ss_ab,
           ROUND(CAST(ss2 AS DOUBLE) - CAST(sq_cells AS DOUBLE), 2) AS ss_w,
           ROUND(((CAST(sq_a AS DOUBLE) - CAST(t * t AS DOUBLE) / nn)
                  / (ka - 1))
                 / ((CAST(ss2 AS DOUBLE) - CAST(sq_cells AS DOUBLE))
                    / (nn - n_cells)), 6) AS f_a,
           ROUND(((CAST(sq_b AS DOUBLE) - CAST(t * t AS DOUBLE) / nn)
                  / (kb - 1))
                 / ((CAST(ss2 AS DOUBLE) - CAST(sq_cells AS DOUBLE))
                    / (nn - n_cells)), 6) AS f_b,
           ROUND(((CAST(sq_cells AS DOUBLE) - CAST(sq_a AS DOUBLE)
                   - CAST(sq_b AS DOUBLE) + CAST(t * t AS DOUBLE) / nn)
                  / ((ka - 1) * (kb - 1)))
                 / ((CAST(ss2 AS DOUBLE) - CAST(sq_cells AS DOUBLE))
                    / (nn - n_cells)), 6) AS f_ab
    FROM tots
"""


@query("q399_two_way_anova", oracle=_ANOVA2_ORACLE, tags=("X-83", "A-14"))
def q399_two_way_anova(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-way factorial ANOVA with interaction: event value variance
    decomposed over type x day-of-week — main-effect sums of squares
    for each factor, the INTERACTION term (does the weekday effect
    differ BY type — the question q233's one-way F and q288's pairwise
    contrast cannot ask), and the within-cell residual, all via the
    classical computational identities from one pass of exact cell
    moments (the balanced-design hand-calculation decomposition,
    evaluated on these cells; regression ANOVA is the refinement for
    strongly unbalanced designs).

    Determinism: cell and marginal moments are exact integers; each
    s^2/n term divides exact operands once, rounds 6 dp, decimal-sums
    (the q233/q120 discipline); SS and F assembly is a fixed-order IEEE
    expression over those bit-identical doubles.

    Scale shape: ONE map-side-combined rollup onto the bounded
    (types x 7) cell grid; marginals and totals derive FROM the cells
    (never a second fact scan); one scalar row out; cell moments are
    A-14-mergeable across shards.

    Reference parity: beyond-reference; completes the variance-analysis
    kit (q233 one-way, q288 Welch pair, q342 paired t) with the
    factorial form."""
    d0 = "decimal(38,0)"
    cells = (
        load(spark, sf_dir, "events")
        .select(
            F.col("event_type").alias("a"),
            F.dayofweek(F.date_trunc("day", F.col("ts"))).alias("b"),
            (F.col("value").cast("decimal(18,2)") * 100).cast("long").alias("vc"),
        )
        .groupBy("a", "b")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(F.col("vc").cast(d0)).cast(d0).alias("s"),
            F.sum(F.col("vc").cast(d0) * F.col("vc")).cast(d0).alias("s2"),
        )
        .transform(stage)  # marginals + totals all derive from one build
    )
    sq = lambda: F.sum(
        F.round((F.col("s") * F.col("s")).cast("double") / F.col("n"), 6).cast(
            "decimal(28,6)"
        )
    ).cast("decimal(28,6)")
    marg_a = cells.groupBy("a").agg(
        F.sum("n").cast("long").alias("n"), F.sum("s").cast(d0).alias("s")
    )
    marg_b = cells.groupBy("b").agg(
        F.sum("n").cast("long").alias("n"), F.sum("s").cast(d0).alias("s")
    )
    tots = cells.agg(
        F.sum("n").cast("long").alias("nn"),
        F.sum("s").cast(d0).alias("t"),
        F.sum("s2").cast(d0).alias("ss2"),
        sq().alias("sq_cells"),
        F.count(F.lit(1)).cast("long").alias("n_cells"),
    )
    a_stats = marg_a.agg(
        sq().alias("sq_a"), F.count(F.lit(1)).cast("long").alias("ka")
    )
    b_stats = marg_b.agg(
        sq().alias("sq_b"), F.count(F.lit(1)).cast("long").alias("kb")
    )
    j = tots.join(F.broadcast(a_stats)).join(F.broadcast(b_stats))
    cf = (F.col("t") * F.col("t")).cast("double") / F.col("nn")
    ss_a = F.col("sq_a").cast("double") - cf
    ss_b = F.col("sq_b").cast("double") - cf
    ss_ab = (
        F.col("sq_cells").cast("double")
        - F.col("sq_a").cast("double")
        - F.col("sq_b").cast("double")
        + cf
    )
    ss_w = F.col("ss2").cast("double") - F.col("sq_cells").cast("double")
    msw = ss_w / (F.col("nn") - F.col("n_cells"))
    return j.select(
        F.col("nn").alias("n_events"),
        F.col("ka").alias("a_levels"),
        F.col("kb").alias("b_levels"),
        F.round(ss_a, 2).alias("ss_a"),
        F.round(ss_b, 2).alias("ss_b"),
        F.round(ss_ab, 2).alias("ss_ab"),
        F.round(ss_w, 2).alias("ss_w"),
        F.round((ss_a / (F.col("ka") - 1)) / msw, 6).alias("f_a"),
        F.round((ss_b / (F.col("kb") - 1)) / msw, 6).alias("f_b"),
        F.round(
            (ss_ab / ((F.col("ka") - 1) * (F.col("kb") - 1))) / msw, 6
        ).alias("f_ab"),
    )
