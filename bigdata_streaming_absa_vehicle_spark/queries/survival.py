"""Survival analysis (SURVEY.md §2K extension X-27): the Kaplan-Meier
estimator over customer order-activity lifetimes — the churn-analytics
primitive behind every retention dashboard.  Tenure = days between a
customer's first and last order; customers still ordering in the final
180 days of the observation window are RIGHT-CENSORED (they haven't
churned, we just stopped watching), everyone else's tenure ends in an
observed churn event.  KM is the standard estimator that uses the
censored subjects correctly (they leave the at-risk set without counting
as churn) instead of dropping them — the naive "average lifetime of
churned users" is biased short.

Determinism: all counts (deaths d_t, censors c_t, at-risk n_t) are exact
integers via exclusive cumulative sums; per-death-time hazard factors
enter as ln(1 - d/n) ROUNDED AT 6 DP then summed in exact DECIMAL(20,6)
(the q120/q165 cross-libm precedent — order-independent by exactness),
and survival = round(exp(sum), 6) with the d == n full-extinction row
pinned to exactly 0.0 in both engines (Spark's ln(0) is NULL, DuckDB's is
-inf; neither is allowed to reach the output).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.ordering import stage
from ..tables import load
from .registry import query

_CENSOR_DAYS = 180  #: still ordering this close to the end => right-censored


@query(
    "q179_survival_curve",
    oracle=f"""
    WITH b AS (
        SELECT CAST(MAX(o_orderdate) AS DATE) AS end_d FROM orders
    ),
    u AS (
        SELECT o_custkey,
               date_diff('day', CAST(MIN(o_orderdate) AS DATE),
                         CAST(MAX(o_orderdate) AS DATE)) AS lt,
               CAST(MAX(o_orderdate) AS DATE) AS last_d
        FROM orders GROUP BY o_custkey
    ),
    ev AS (
        SELECT lt,
               CAST(SUM(CASE WHEN last_d >= end_d - {_CENSOR_DAYS}
                        THEN 0 ELSE 1 END) AS BIGINT) AS n_death,
               CAST(SUM(CASE WHEN last_d >= end_d - {_CENSOR_DAYS}
                        THEN 1 ELSE 0 END) AS BIGINT) AS n_censor
        FROM u CROSS JOIN b GROUP BY lt
    ),
    tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM u),
    risk AS (
        SELECT lt, n_death, n_censor,
               n - CAST(COALESCE(SUM(n_death + n_censor) OVER (
                   ORDER BY lt ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
               ), 0) AS BIGINT) AS n_risk
        FROM ev CROSS JOIN tot
    ),
    terms AS (
        SELECT lt, n_death, n_censor, n_risk,
               CASE WHEN n_death = 0 OR n_death >= n_risk
                    THEN CAST(0 AS DECIMAL(20,6))
                    ELSE CAST(ROUND(ln(1 - CAST(n_death AS DOUBLE) / n_risk), 6)
                              AS DECIMAL(20,6)) END AS term,
               (n_death >= n_risk) AS extinct
        FROM risk
    ),
    km AS (
        SELECT lt, n_death, n_censor, n_risk,
               SUM(term) OVER (
                   ORDER BY lt ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS cum,
               MAX(CASE WHEN extinct THEN 1 ELSE 0 END) OVER (
                   ORDER BY lt ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS dead
        FROM terms
    )
    SELECT lt AS lt_days, n_risk, n_death, n_censor,
           CASE WHEN dead = 1 THEN 0.0
                ELSE ROUND(exp(CAST(cum AS DOUBLE)), 6) END AS survival
    FROM km WHERE n_death > 0
    ORDER BY lt_days
    """,
    tags=("X-27", "A-06", "W-03"),
)
def q179_survival_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier survival curve of customer order-activity tenure with
    right-censoring: one row per churn time t — at-risk count n_t, churn
    events d_t, censored-at-t c_t, and S(t) = prod_{t_i<=t}(1 - d_i/n_i).

    Scale shape: the fact reduces in ONE map-side-combined groupBy per
    customer, then again onto the (distinct tenure-day) relation — which
    is CALENDAR-bounded (<= days of history; 100 TB of orders adds rows,
    not days), so the two cumulative windows run over a few-thousand-row
    bounded relation, never anything corpus-sized (the q162 bounded-
    window precedent).  Totals and the observation end broadcast; hazard
    terms are 6-dp-rounded ln values summed in exact decimal, ONE exp +
    round at the end."""
    o = load(spark, sf_dir, "orders").select(
        "o_custkey", F.col("o_orderdate").cast("date").alias("d")
    )
    b = o.agg(F.max("d").alias("end_d"))
    u = o.groupBy("o_custkey").agg(
        F.datediff(F.max("d"), F.min("d")).alias("lt"),
        F.max("d").alias("last_d"),
    ).transform(stage)  # per-customer relation; feeds both ev and tot
    censored = F.col("last_d") >= F.date_sub(F.col("end_d"), _CENSOR_DAYS)
    ev = (
        u.crossJoin(F.broadcast(b))
        .groupBy("lt")
        .agg(
            F.sum(F.when(censored, 0).otherwise(1)).cast("long").alias("n_death"),
            F.sum(F.when(censored, 1).otherwise(0)).cast("long").alias("n_censor"),
        )
    )
    tot = u.agg(F.count(F.lit(1)).cast("long").alias("n"))
    w_excl = Window.orderBy("lt").rowsBetween(Window.unboundedPreceding, -1)
    w_incl = Window.orderBy("lt").rowsBetween(Window.unboundedPreceding, 0)
    risk = ev.crossJoin(F.broadcast(tot)).withColumn(
        "n_risk",
        (
            F.col("n")
            - F.coalesce(
                F.sum(F.col("n_death") + F.col("n_censor")).over(w_excl), F.lit(0)
            )
        ).cast("long"),
    )
    dec = "decimal(20,6)"
    terms = risk.withColumn(
        "term",
        F.when(
            (F.col("n_death") == 0) | (F.col("n_death") >= F.col("n_risk")),
            F.lit(0).cast(dec),
        ).otherwise(
            F.round(
                F.log(1 - F.col("n_death").cast("double") / F.col("n_risk")), 6
            ).cast(dec)
        ),
    ).withColumn("extinct", (F.col("n_death") >= F.col("n_risk")).cast("int"))
    km = terms.withColumn("cum", F.sum("term").over(w_incl)).withColumn(
        "dead", F.max("extinct").over(w_incl)
    )
    return (
        km.where(F.col("n_death") > 0)
        .select(
            F.col("lt").alias("lt_days"),
            "n_risk",
            "n_death",
            "n_censor",
            F.when(F.col("dead") == 1, F.lit(0.0))
            .otherwise(F.round(F.exp(F.col("cum").cast("double")), 6))
            .alias("survival"),
        )
        .orderBy("lt_days")
    )


# ---------------------------------------------------------------------------
# X-62: two-sample log-rank test (survival-curve difference significance)
# ---------------------------------------------------------------------------

from ..functions.ordering import pin  # noqa: E402  (late import, module tail)

#: first md5 hex nibble of the customer key: 0..7 -> cohort 'a', else 'b'
#: ({t} = STRING on Spark, VARCHAR on DuckDB)
_LR_ARM = (
    "CASE WHEN instr('0123456789abcdef', "
    "substr(md5(CAST(o_custkey AS {t})), 1, 1)) - 1 < 8 "
    "THEN 'a' ELSE 'b' END"
)

_LOGRANK_ORACLE = f"""
    WITH b AS (
        SELECT CAST(MAX(o_orderdate) AS DATE) AS end_d FROM orders
    ),
    u AS (
        SELECT o_custkey, {_LR_ARM.format(t="VARCHAR")} AS arm,
               date_diff('day', CAST(MIN(o_orderdate) AS DATE),
                         CAST(MAX(o_orderdate) AS DATE)) AS lt,
               CAST(MAX(o_orderdate) AS DATE) AS last_d
        FROM orders GROUP BY o_custkey
    ),
    ev AS (
        SELECT lt,
               CAST(SUM(CASE WHEN arm = 'a' AND last_d < end_d - {_CENSOR_DAYS}
                        THEN 1 ELSE 0 END) AS BIGINT) AS d_a,
               CAST(SUM(CASE WHEN arm = 'b' AND last_d < end_d - {_CENSOR_DAYS}
                        THEN 1 ELSE 0 END) AS BIGINT) AS d_b,
               CAST(SUM(CASE WHEN arm = 'a' AND last_d >= end_d - {_CENSOR_DAYS}
                        THEN 1 ELSE 0 END) AS BIGINT) AS c_a,
               CAST(SUM(CASE WHEN arm = 'b' AND last_d >= end_d - {_CENSOR_DAYS}
                        THEN 1 ELSE 0 END) AS BIGINT) AS c_b
        FROM u CROSS JOIN b GROUP BY lt
    ),
    tot AS (
        SELECT CAST(COUNT(CASE WHEN arm = 'a' THEN 1 END) AS BIGINT) AS na,
               CAST(COUNT(CASE WHEN arm = 'b' THEN 1 END) AS BIGINT) AS nb
        FROM u
    ),
    risk AS (
        SELECT lt, d_a, d_b,
               na - CAST(COALESCE(SUM(d_a + c_a) OVER (ORDER BY lt
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                    AS BIGINT) AS nra,
               nb - CAST(COALESCE(SUM(d_b + c_b) OVER (ORDER BY lt
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                    AS BIGINT) AS nrb
        FROM ev CROSS JOIN tot
    ),
    terms AS (
        SELECT d_a,
               CAST(ROUND(CAST(d_a + d_b AS DOUBLE) * nra / (nra + nrb), 6)
                    AS DECIMAL(20,6)) AS ea,
               CAST(ROUND(CAST(d_a + d_b AS DOUBLE) * nra * nrb
                          * (nra + nrb - d_a - d_b)
                          / (CAST(nra + nrb AS DOUBLE) * (nra + nrb)
                             * (nra + nrb - 1)), 9)
                    AS DECIMAL(28,9)) AS vt
        FROM risk
        WHERE d_a + d_b > 0 AND nra + nrb > 1
    ),
    s AS (
        SELECT CAST(SUM(d_a) AS BIGINT) AS observed_a,
               CAST(SUM(ea) AS DECIMAL(28,6)) AS expected_a,
               CAST(SUM(vt) AS DECIMAL(38,9)) AS variance
        FROM terms
    )
    SELECT na AS n_a, nb AS n_b, observed_a,
           CAST(expected_a AS DOUBLE) AS expected_a,
           CAST(variance AS DOUBLE) AS variance,
           CASE WHEN variance > 0 THEN
               (observed_a - CAST(expected_a AS DOUBLE))
                   / sqrt(CAST(variance AS DOUBLE)) END AS z
    FROM s CROSS JOIN tot
"""


@query("q257_logrank_test", oracle=_LOGRANK_ORACLE, tags=("X-62", "X-27"))
def q257_logrank_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample log-rank test: do the two (hash-split) customer cohorts
    share a survival curve?  At each churn time the test compares cohort
    A's observed churn events against the expectation under the pooled
    hazard (e = d * nA/n) and accumulates the hypergeometric variance;
    z = (O - E)/sqrt(V) is the standard significance readout a retention
    experiment reports NEXT TO q179's curves — KM shows the curves,
    log-rank says whether they differ.  Censoring follows q179's rule
    (active in the final {_CENSOR_DAYS} days = censored: leaves the
    at-risk set, never counts as churn).

    Determinism: at-risk counts come from exact exclusive cumulative
    sums; each per-time expectation/variance term is one IEEE expression
    on integer operands, rounded at 6/9 dp (the q179 term idiom) and
    summed in exact decimal; the final z is one subtract/sqrt/divide on
    bit-identical operands.

    Scale shape: the fact reduces in ONE customer-keyed rollup; the
    per-lifetime event relation is bounded by the tenure domain (days),
    every window and aggregate after runs on that bounded grid, and the
    cohort totals are a single-row cross-broadcast."""
    o = load(spark, sf_dir, "orders")
    end_d = o.agg(F.max(F.col("o_orderdate").cast("date")).alias("end_d"))
    u = (
        o.groupBy("o_custkey")
        .agg(
            F.expr(_LR_ARM.format(t="STRING")).alias("arm"),
            F.datediff(
                F.max(F.col("o_orderdate").cast("date")),
                F.min(F.col("o_orderdate").cast("date")),
            ).alias("lt"),
            F.max(F.col("o_orderdate").cast("date")).alias("last_d"),
        )
        .crossJoin(F.broadcast(end_d))
        .withColumn(
            "censored",
            F.col("last_d") >= F.date_sub(F.col("end_d"), _CENSOR_DAYS),
        )
        .transform(stage)  # event grid + cohort totals read it
    )
    ev = u.groupBy("lt").agg(
        F.sum(F.when((F.col("arm") == "a") & ~F.col("censored"), 1).otherwise(0))
        .cast("long")
        .alias("d_a"),
        F.sum(F.when((F.col("arm") == "b") & ~F.col("censored"), 1).otherwise(0))
        .cast("long")
        .alias("d_b"),
        F.sum(F.when((F.col("arm") == "a") & F.col("censored"), 1).otherwise(0))
        .cast("long")
        .alias("c_a"),
        F.sum(F.when((F.col("arm") == "b") & F.col("censored"), 1).otherwise(0))
        .cast("long")
        .alias("c_b"),
    )
    tot = u.agg(
        F.count(F.when(F.col("arm") == "a", 1)).cast("long").alias("na"),
        F.count(F.when(F.col("arm") == "b", 1)).cast("long").alias("nb"),
    )
    wx = Window.orderBy("lt").rowsBetween(Window.unboundedPreceding, -1)
    risk = ev.crossJoin(F.broadcast(tot)).select(
        "lt",
        "d_a",
        "d_b",
        (
            F.col("na")
            - F.coalesce(F.sum(F.col("d_a") + F.col("c_a")).over(wx), F.lit(0))
        )
        .cast("long")
        .alias("nra"),
        (
            F.col("nb")
            - F.coalesce(F.sum(F.col("d_b") + F.col("c_b")).over(wx), F.lit(0))
        )
        .cast("long")
        .alias("nrb"),
    )
    terms = risk.filter(
        (F.col("d_a") + F.col("d_b") > 0) & (F.col("nra") + F.col("nrb") > 1)
    ).select(
        "d_a",
        F.round(
            (F.col("d_a") + F.col("d_b")).cast("double")
            * F.col("nra")
            / (F.col("nra") + F.col("nrb")),
            6,
        )
        .cast("decimal(20,6)")
        .alias("ea"),
        F.round(
            (F.col("d_a") + F.col("d_b")).cast("double")
            * F.col("nra")
            * F.col("nrb")
            * (F.col("nra") + F.col("nrb") - F.col("d_a") - F.col("d_b"))
            / (
                (F.col("nra") + F.col("nrb")).cast("double")
                * (F.col("nra") + F.col("nrb"))
                * (F.col("nra") + F.col("nrb") - 1)
            ),
            9,
        )
        .cast("decimal(28,9)")
        .alias("vt"),
    )
    s = terms.agg(
        F.sum("d_a").cast("long").alias("observed_a"),
        F.sum("ea").cast("decimal(28,6)").alias("expected_a"),
        F.sum("vt").cast("decimal(38,9)").alias("variance"),
    )
    return s.crossJoin(F.broadcast(tot)).select(
        F.col("na").alias("n_a"),
        F.col("nb").alias("n_b"),
        "observed_a",
        F.col("expected_a").cast("double").alias("expected_a"),
        F.col("variance").cast("double").alias("variance"),
        F.when(
            F.col("variance") > 0,
            (F.col("observed_a") - F.col("expected_a").cast("double"))
            / F.sqrt(F.col("variance").cast("double")),
        ).alias("z"),
    )


# ---------------------------------------------------------------------------
# X-110: exponential retention decay fit + half-life
# ---------------------------------------------------------------------------

_RD_K = 14  #: daily offsets fitted (1.._RD_K)

_RD_ORACLE = f"""
    WITH uw AS (
        SELECT DISTINCT user_id,
               CAST(FLOOR(epoch(date_trunc('day', ts))) AS BIGINT) // 86400 AS w
        FROM events
    ),
    u0 AS (SELECT user_id, MIN(w) AS w0 FROM uw GROUP BY user_id),
    mx AS (SELECT MAX(w) AS maxw FROM uw),
    cohort AS (
        SELECT u0.user_id, u0.w0 FROM u0, mx WHERE u0.w0 <= mx.maxw - {_RD_K}
    ),
    nrisk AS (SELECT CAST(COUNT(*) AS BIGINT) AS at_risk FROM cohort),
    act AS (
        SELECT uw.w - c.w0 AS k, CAST(COUNT(DISTINCT uw.user_id) AS BIGINT)
                   AS n_active
        FROM uw JOIN cohort c USING (user_id)
        WHERE uw.w - c.w0 BETWEEN 1 AND {_RD_K}
        GROUP BY 1
    ),
    pts AS (
        SELECT a.k, a.n_active, r.at_risk,
               CAST(a.n_active * 1000000 // r.at_risk AS BIGINT) AS r_micro,
               CAST(ROUND(ROUND(ln(CAST(a.n_active AS DOUBLE) / r.at_risk), 6)
                          * 1e6) AS BIGINT) AS lnr6
        FROM act a, nrisk r
    ),
    fit AS (
        SELECT CAST(COUNT(*) AS HUGEINT) AS kk,
               CAST(SUM(k) AS HUGEINT) AS sk,
               CAST(SUM(k * k) AS HUGEINT) AS sk2,
               CAST(SUM(lnr6) AS HUGEINT) AS sl,
               CAST(SUM(k * lnr6) AS HUGEINT) AS skl
        FROM pts
    ),
    co AS (
        SELECT CAST((kk * skl - sk * sl) // (kk * sk2 - sk * sk) AS BIGINT)
                   AS b6,
               CAST((sk2 * sl - sk * skl) // (kk * sk2 - sk * sk) AS BIGINT)
                   AS a6
        FROM fit
    )
    SELECT p.k AS day_offset, p.at_risk, p.n_active,
           CAST(p.r_micro AS DOUBLE) / 1e6 AS retention,
           c.b6 AS slope_micro_nats, c.a6 AS intercept_micro_nats,
           CASE WHEN c.b6 < 0
                THEN CAST(CAST(-693147000 AS BIGINT) // c.b6 AS DOUBLE)
                     / 1e3 END AS half_life_days
    FROM pts p, co c
    ORDER BY day_offset
"""


@query("q320_retention_decay_fit", oracle=_RD_ORACLE, tags=("X-110", "X-85"))
def q320_retention_decay_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponential retention decay fit: pooled DAILY retention of the
    fully-observed cohort (users with >= 14 observable days), log-linear
    least squares over ln(r_k) = a + b*k, and the HALF-LIFE ln(2)/(-b)
    — the one-number retention summary product teams quote, which
    q87's raw retention matrix and q179's survival curve display but
    never compress: the half-life makes two products comparable in a
    way 16 matrix cells don't.

    Determinism: retention ratios and their pinned-ln values are exact
    micro integers (the q291/q316 idiom); the 2-parameter fit runs on
    exact integer moments of the <=14-point relation with truncating
    divisions (engine-identical on the negative slope); the half-life
    is one exact integer division of the pinned ln(2) constant; the
    only doubles are display scalings.

    Scale shape: distinct (user, week) reduction, one user rollup for
    cohort entry, one keyed join + offset rollup onto the bounded
    14-row relation; the fit is single-row.

    Reference parity: beyond-reference; closes the retention family
    (q87 matrix, q179 survival, q214 LTV, q227 bitmap) with the decay
    MODEL."""
    uw = (
        load(spark, sf_dir, "events")
        .select(
            "user_id",
            F.expr(
                "CAST(FLOOR(unix_timestamp(date_trunc('day', ts)) / 86400)"
                " AS BIGINT)"
            ).alias("w"),
        )
        .distinct()
        .transform(stage)  # cohort entry + the offset join share it
    )
    u0 = uw.groupBy("user_id").agg(F.min("w").alias("w0"))
    mx = uw.agg(F.max("w").alias("maxw"))
    cohort = (
        u0.crossJoin(F.broadcast(mx))
        .filter(F.col("w0") <= F.col("maxw") - _RD_K)
        .select("user_id", "w0")
    )
    nrisk = cohort.agg(F.count(F.lit(1)).cast("long").alias("at_risk"))
    act = (
        uw.join(cohort, "user_id")
        .select((F.col("w") - F.col("w0")).alias("k"), "user_id")
        .filter((F.col("k") >= 1) & (F.col("k") <= _RD_K))
        .groupBy("k")
        .agg(F.countDistinct("user_id").cast("long").alias("n_active"))
    )
    pts = act.crossJoin(F.broadcast(nrisk)).select(
        "k",
        "n_active",
        "at_risk",
        F.expr("CAST(n_active * 1000000 div at_risk AS BIGINT)").alias("r_micro"),
        F.round(
            F.round(
                F.log(F.col("n_active").cast("double") / F.col("at_risk")), 6
            )
            * F.lit(1e6)
        )
        .cast("long")
        .alias("lnr6"),
    ).transform(stage)  # the fit + the per-row readout share it
    d38 = "decimal(38,0)"
    fit = pts.agg(
        F.count(F.lit(1)).cast(d38).alias("kk"),
        F.sum("k").cast(d38).alias("sk"),
        F.sum(F.col("k") * F.col("k")).cast(d38).alias("sk2"),
        F.sum("lnr6").cast(d38).alias("sl"),
        F.sum(F.col("k") * F.col("lnr6")).cast(d38).alias("skl"),
    )
    co = fit.select(
        F.expr(
            "CAST((kk * skl - sk * sl) div (kk * sk2 - sk * sk) AS BIGINT)"
        ).alias("b6"),
        F.expr(
            "CAST((sk2 * sl - sk * skl) div (kk * sk2 - sk * sk) AS BIGINT)"
        ).alias("a6"),
    )
    return (
        pts.crossJoin(F.broadcast(co))
        .select(
            F.col("k").cast("long").alias("day_offset"),
            "at_risk",
            "n_active",
            (F.col("r_micro").cast("double") / F.lit(1e6)).alias("retention"),
            F.col("b6").alias("slope_micro_nats"),
            F.col("a6").alias("intercept_micro_nats"),
            F.when(
                F.col("b6") < 0,
                F.expr("CAST(CAST(-693147000 AS BIGINT) div b6 AS DOUBLE)")
                / F.lit(1e3),
            ).alias("half_life_days"),
        )
        .transform(pin)
        .orderBy("day_offset")
    )
