"""Statistical-inference & sketch extensions (SURVEY.md §2K rows
X-127..X-132 + X-138): the nonparametric / multiple-testing / spectral /
regularized / robust / second-moment layer a measurement platform needs
once the parametric basics (X-23 z-test, X-33 ANOVA, X-83 Welch/factorial)
are in place —

- q400: Mann-Whitney U rank-sum test (weekend vs weekday purchase values)
  with exact tie-corrected ranks computed on the DISTINCT-VALUE relation,
  never per-row ranks;
- q401: Benjamini-Hochberg FDR control across the (type x day-of-week)
  grid of binomial deviation tests — p-values via the Abramowitz-Stegun
  7.1.26 erfc polynomial evaluated identically in both engines;
- q402: DFT periodogram of DEMEANED daily revenue over an integer period
  grid — completely libm-free: the mean is removed by exact integer
  round-half-up and cos/sin enter BOTH engines as the same Python-
  precomputed 12-dp decimal literals, so every spectral sum is exact
  decimal arithmetic;
- q403: ridge regression regularization path by Cramer's rule on the
  exact cross-moment matrix (the penalized extension of q295's OLS);
- q404: Huber M-estimator of location per event type by 2 IRLS rounds on
  the value-compressed relation;
- q405: AMS tug-of-war F2 sketch vs the exact second frequency moment —
  the join/self-join size estimator that complements X-40's quantile and
  A-13's cardinality sketches;
- q413: Wilcoxon signed-rank test of per-user weekend-vs-weekday spend —
  the PAIRED nonparametric twin of q400's independent-sample U, on exact
  integer differences with the same half-unit midrank discipline.

Determinism: counts, ranks, moments, counters are exact integers or
decimals; every libm call (exp in q401) follows the q120/q203 pinned-
rounding precedent; sqrt is IEEE correctly-rounded (no cross-libm risk);
final float readouts are raw IEEE expressions over bit-identical operands.
"""

from __future__ import annotations

import math
from decimal import Decimal

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import DecimalType, IntegerType, StructField, StructType
from pyspark.sql.window import Window

from ..functions.ordering import pin, stage
from ..tables import load
from .registry import query

# ---------------------------------------------------------------------------
# X-127: Mann-Whitney U / Wilcoxon rank-sum test
# ---------------------------------------------------------------------------

#: cents expression shared by the purchase-value tests (the q399 idiom)
_CENTS_SQL = "CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)"

_MANN_WHITNEY_ORACLE = f"""
    WITH pv AS (
        SELECT {_CENTS_SQL} AS v,
               CASE WHEN dayofweek(date_trunc('day', ts)) + 1 IN (1, 7)
                    THEN 1 ELSE 0 END AS g
        FROM events WHERE event_type = 'purchase'
    ),
    cnt AS (
        SELECT v, CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(g) AS BIGINT) AS nw
        FROM pv GROUP BY v
    ),
    rk AS (
        SELECT v, n, nw,
               CAST(COALESCE(SUM(n) OVER (ORDER BY v
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                   AS BIGINT) AS cum
        FROM cnt
    ),
    agg AS (
        SELECT CAST(SUM(CAST(nw AS HUGEINT) * (2 * cum + n + 1)) AS HUGEINT)
                   AS r2w,
               CAST(SUM(nw) AS BIGINT) AS n1,
               CAST(SUM(n - nw) AS BIGINT) AS n2,
               CAST(SUM(CAST(n AS HUGEINT) * n * n - n) AS HUGEINT) AS tie3,
               CAST(COUNT(*) AS BIGINT) AS n_values
        FROM rk
    )
    SELECT n1 AS n_weekend, n2 AS n_weekday, n_values,
           CAST(r2w - n1 * (CAST(n1 AS HUGEINT) + 1) AS DOUBLE) / 2 AS u_stat,
           CAST(CAST(n1 AS HUGEINT) * n2 AS DOUBLE) AS u_mean_x2,
           (CAST(r2w - n1 * (CAST(n1 AS HUGEINT) + 1) AS DOUBLE)
            - CAST(CAST(n1 AS HUGEINT) * n2 AS DOUBLE))
           / (2 * sqrt(CAST(CAST(n1 AS HUGEINT) * n2 AS DOUBLE) / 12
                       * ((n1 + n2 + 1)
                          - CAST(tie3 AS DOUBLE)
                            / (CAST(CAST(n1 AS HUGEINT) + n2 AS DOUBLE)
                               * (n1 + n2 - 1))))) AS z_score
    FROM agg
"""


@query("q400_mann_whitney", oracle=_MANN_WHITNEY_ORACLE, tags=("X-127", "A-12"))
def q400_mann_whitney(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Whitney U (Wilcoxon rank-sum) test of weekend vs weekday
    purchase values — the NONPARAMETRIC two-sample location test that
    stays valid when revenue distributions are skewed or heavy-tailed
    (q288's Welch t assumes near-normal means; U compares the full rank
    distribution and is what you reach for on long-tail basket values),
    with the exact tie correction in the normal approximation. Also the
    inferential reading of q166's AUC: U / (n1*n2) IS the AUC between
    the two samples.

    Determinism: tie-averaged ranks are held in HALF-UNITS (2*rank is
    always an exact integer: 2*cum_before + n + 1), so the rank sum,
    U statistic, and the tie term sum(t^3 - t) are all exact integers;
    the z-score is one fixed-shape IEEE expression over those integers
    (sqrt is correctly rounded — no libm risk); U itself is emitted as
    an exact half-integer double, and u_mean_x2 = n1*n2 is computed in
    decimal(38,0) and read out as a DOUBLE like u_stat (ADVICE r5: a
    BIGINT readout would overflow once n1, n2 > ~3e9 — the very scale
    the exact-integer pipeline targets — while the double readout never
    overflows and keeps 2^-53 relative precision).

    Scale shape: the fact reduces MAP-SIDE to the distinct-value
    relation (v, n, n_weekend) — ranks come from a cumulative window
    over that bounded relation (purchase cents have a bounded domain),
    NEVER a per-row rank over the fact table; one 5-term rollup emits a
    single row. The tie machinery costs nothing extra: ties ARE the
    value-compression.

    Reference parity: beyond-reference; completes the two-sample kit
    (q169 proportions, q288 means, q148 KS distribution shape) with the
    rank-based location test."""
    cents = (F.col("value").cast("decimal(18,2)") * 100).cast("long")
    pv = (
        load(spark, sf_dir, "events")
        .filter(F.col("event_type") == "purchase")
        .select(
            cents.alias("v"),
            F.when(
                F.dayofweek(F.date_trunc("day", F.col("ts"))).isin(1, 7), 1
            )
            .otherwise(0)
            .alias("g"),
        )
    )
    cnt = pv.groupBy("v").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("g").cast("long").alias("nw"),
    )
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, -1)
    d38 = "decimal(38,0)"
    rk = cnt.select(
        "v",
        "n",
        "nw",
        F.coalesce(F.sum("n").over(w), F.lit(0)).cast("long").alias("cum"),
    )
    agg = rk.agg(
        F.sum(F.col("nw").cast(d38) * (2 * F.col("cum") + F.col("n") + 1))
        .cast(d38)
        .alias("r2w"),
        F.sum("nw").cast("long").alias("n1"),
        F.sum(F.col("n") - F.col("nw")).cast("long").alias("n2"),
        F.sum(F.col("n").cast(d38) * F.col("n") * F.col("n") - F.col("n"))
        .cast(d38)
        .alias("tie3"),
        F.count(F.lit(1)).cast("long").alias("n_values"),
    )
    n1h = F.col("n1").cast(d38)
    u2 = (F.col("r2w") - F.col("n1") * (n1h + 1)).cast(d38)  # 2*U exact
    prod = (n1h * F.col("n2")).cast(d38)  # n1*n2 exact
    var = (
        prod.cast("double")
        / 12
        * (
            (F.col("n1") + F.col("n2") + 1)
            - F.col("tie3").cast("double")
            / ((n1h + F.col("n2")).cast("double") * (F.col("n1") + F.col("n2") - 1))
        )
    )
    return agg.select(
        F.col("n1").alias("n_weekend"),
        F.col("n2").alias("n_weekday"),
        "n_values",
        (u2.cast("double") / 2).alias("u_stat"),
        prod.cast("double").alias("u_mean_x2"),
        ((u2.cast("double") - prod.cast("double")) / (2 * F.sqrt(var))).alias(
            "z_score"
        ),
    )


# ---------------------------------------------------------------------------
# X-128: Benjamini-Hochberg FDR over the (type x day-of-week) test grid
# ---------------------------------------------------------------------------

#: Abramowitz-Stegun 7.1.26 erf coefficients — the same literals appear in
#: both engines, so the polynomial runs on bit-identical operands.
_AS_P = "0.3275911"
_AS_A = ("0.254829592", "-0.284496736", "1.421413741", "-1.453152027", "1.061405429")
#: 1/sqrt(2) as a literal (never computed via libm at query time)
_INV_SQRT2 = "0.7071067811865476"
_BH_ALPHA = "0.10"

def _p_value_sql(z_col: str) -> str:
    """erfc(|z|/sqrt2) with x and t spelled inline so the oracle and Spark
    share one expression text (both engines parse the identical tree)."""
    x = f"(abs({z_col}) * {_INV_SQRT2})"
    t = f"(1.0 / (1.0 + {_AS_P} * {x}))"
    return (
        f"ROUND({t} * ({_AS_A[0]} + {t} * ({_AS_A[1]} + {t} * ({_AS_A[2]}"
        f" + {t} * ({_AS_A[3]} + {t} * {_AS_A[4]})))) * exp(-{x} * {x}), 9)"
    )


_BH_ORACLE = f"""
    WITH cell AS (
        SELECT event_type AS etype,
               dayofweek(date_trunc('day', ts)) + 1 AS dow,
               CAST(COUNT(*) AS BIGINT) AS k
        FROM events GROUP BY 1, 2
    ),
    bytype AS (
        SELECT etype, CAST(SUM(k) AS BIGINT) AS n FROM cell GROUP BY etype
    ),
    bydow AS (
        SELECT dow, CAST(SUM(k) AS BIGINT) AS kd FROM cell GROUP BY dow
    ),
    tot AS (SELECT CAST(SUM(k) AS BIGINT) AS nn FROM cell),
    z AS (
        SELECT c.etype, c.dow, c.k, b.n,
               CAST(d.kd AS DOUBLE) / t.nn AS p0,
               ROUND((c.k - b.n * (CAST(d.kd AS DOUBLE) / t.nn))
                     / sqrt(b.n * (CAST(d.kd AS DOUBLE) / t.nn)
                            * (1 - CAST(d.kd AS DOUBLE) / t.nn)), 6) AS z6
        FROM cell c
        JOIN bytype b USING (etype)
        JOIN bydow d USING (dow)
        CROSS JOIN tot t
    ),
    p AS (
        SELECT etype, dow, k, n, z6, {_p_value_sql("z6")} AS p_value
        FROM z
    ),
    ranked AS (
        SELECT *, CAST(ROW_NUMBER() OVER (ORDER BY p_value, etype, dow)
                       AS BIGINT) AS i,
               CAST(COUNT(*) OVER () AS BIGINT) AS m
        FROM p
    ),
    flagged AS (
        SELECT *,
               CASE WHEN p_value <= CAST({_BH_ALPHA} AS DOUBLE) * i / m
                    THEN i ELSE 0 END AS hit
        FROM ranked
    ),
    kstar AS (SELECT MAX(hit) AS ks FROM flagged)
    SELECT etype, dow, k, n, z6 AS z_score, p_value, i AS p_rank,
           ROUND(CAST({_BH_ALPHA} AS DOUBLE) * i / m, 9) AS bh_threshold,
           CASE WHEN i <= ks THEN 1 ELSE 0 END AS discovery
    FROM flagged CROSS JOIN kstar
    ORDER BY i
"""


@query("q401_bh_fdr", oracle=_BH_ORACLE, tags=("X-128", "A-01"))
def q401_bh_fdr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benjamini-Hochberg FDR control across the 35-test grid of
    (event type x day-of-week) binomial deviation tests — each cell asks
    whether that type's events over/under-index on that weekday vs the
    pooled weekday mix, and BH converts 35 raw p-values into a
    discovery set with controlled false-discovery rate (the multiple-
    testing step q169/q288/q399 all stop short of: run 35 tests at
    alpha=0.1 uncorrected and ~3 false positives are EXPECTED).

    Determinism: cell/margin counts are exact integers, p0 and each z
    are fixed-shape IEEE expressions (z rounded 6 dp), the two-sided
    p-value is the Abramowitz-Stegun 7.1.26 erfc polynomial — identical
    literals, identical parenthesization in both engines — with its one
    libm exp() pinned by 9-dp rounding (the q120/q203 precedent); the
    BH step-up compares those ROUNDED p-values to exact-operand
    thresholds alpha*i/m under a (p, type, dow) total order, so the
    discovery set is engine-identical.

    Scale shape: ONE map-side-combined fact rollup onto the bounded
    35-cell grid; margins and totals DERIVE from the cells (no second
    fact scan); ranking and the step-up max run as windows over the
    bounded grid. m grows with the grid, never the data.

    Reference parity: beyond-reference; the experimentation-platform
    layer above q169 (single test) and q346 (SRM) — what turns a metric
    sweep into a trustworthy anomaly shortlist."""
    cell = (
        load(spark, sf_dir, "events")
        .groupBy(
            F.col("event_type").alias("etype"),
            F.dayofweek(F.date_trunc("day", F.col("ts"))).alias("dow"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("k"))
        .transform(stage)  # margins + totals all derive from one build
    )
    bytype = cell.groupBy("etype").agg(F.sum("k").cast("long").alias("n"))
    bydow = cell.groupBy("dow").agg(F.sum("k").cast("long").alias("kd"))
    tot = cell.agg(F.sum("k").cast("long").alias("nn"))
    p0 = F.col("kd").cast("double") / F.col("nn")
    z6 = F.round(
        (F.col("k") - F.col("n") * p0) / F.sqrt(F.col("n") * p0 * (1 - p0)), 6
    )
    p = (
        cell.join(F.broadcast(bytype), "etype")
        .join(F.broadcast(bydow), "dow")
        .crossJoin(F.broadcast(tot))
        .select("etype", "dow", "k", "n", z6.alias("z6"))
        .withColumn("p_value", F.expr(_p_value_sql("z6")))
    )
    wrank = Window.orderBy("p_value", "etype", "dow")
    ranked = p.select(
        "*",
        F.row_number().over(wrank).cast("long").alias("i"),
        F.count(F.lit(1)).over(Window.partitionBy()).cast("long").alias("m"),
    ).withColumn(
        "hit",
        F.when(
            F.col("p_value") <= F.expr(f"CAST({_BH_ALPHA} AS DOUBLE) * i / m"),
            F.col("i"),
        ).otherwise(F.lit(0)),
    )
    flagged = ranked.withColumn(
        "ks", F.max("hit").over(Window.partitionBy())
    )
    return (
        flagged.select(
            "etype",
            "dow",
            "k",
            "n",
            F.col("z6").alias("z_score"),
            "p_value",
            F.col("i").alias("p_rank"),
            F.round(
                F.expr(f"CAST({_BH_ALPHA} AS DOUBLE) * i / m"), 9
            ).alias("bh_threshold"),
            F.when(F.col("i") <= F.col("ks"), 1).otherwise(0).alias("discovery"),
        )
        .transform(pin)
        .orderBy("p_rank")
    )


# ---------------------------------------------------------------------------
# X-129: DFT periodogram over an integer period grid (libm-free)
# ---------------------------------------------------------------------------

_PERIODS = tuple(range(2, 15))
#: (period, day mod period, cos, sin) at 12 dp — Python-precomputed once at
#: import, injected into BOTH engines as identical decimal literals so no
#: trigonometric libm call ever runs at query time (the q272 Gumbel
#: precedent, extended from scalars to a whole basis table).
_TRIG = [
    (
        p,
        r,
        f"{math.cos(2.0 * math.pi * r / p):.12f}",
        f"{math.sin(2.0 * math.pi * r / p):.12f}",
    )
    for p in _PERIODS
    for r in range(p)
]

_TRIG_VALUES = ",\n        ".join(
    f"({p}, {r}, CAST('{c}' AS DECIMAL(14,12)), CAST('{s}' AS DECIMAL(14,12)))"
    for p, r, c, s in _TRIG
)

_PERIODOGRAM_ORACLE = f"""
    WITH daily AS (
        SELECT CAST(FLOOR(epoch(date_trunc('day', ts))) AS BIGINT) // 86400
                   AS d,
               CAST(SUM(CASE WHEN event_type = 'purchase'
                        THEN {_CENTS_SQL} ELSE 0 END) AS BIGINT) AS y
        FROM events GROUP BY 1
    ),
    bar AS (
        SELECT CAST((2 * SUM(y) + COUNT(*)) // (2 * COUNT(*)) AS BIGINT)
                   AS ybar
        FROM daily
    ),
    resid AS (
        SELECT d.d, CAST(d.y - b.ybar AS BIGINT) AS yr
        FROM daily d CROSS JOIN bar b
    ),
    trig(p, r, c, s) AS (VALUES
        {_TRIG_VALUES}
    ),
    terms AS (
        SELECT t.p,
               CAST(SUM(d.yr * t.c) AS DECIMAL(38,12)) AS a,
               CAST(SUM(d.yr * t.s) AS DECIMAL(38,12)) AS b,
               CAST(COUNT(*) AS BIGINT) AS n_days
        FROM resid d
        JOIN trig t ON t.r = d.d % t.p
        GROUP BY t.p
    ),
    pw AS (
        SELECT p, n_days,
               CAST(a AS DOUBLE) AS a, CAST(b AS DOUBLE) AS b,
               CAST(a AS DOUBLE) * CAST(a AS DOUBLE)
                   + CAST(b AS DOUBLE) * CAST(b AS DOUBLE) AS power
        FROM terms
    ),
    tot AS (SELECT SUM(power) AS tp FROM pw)
    SELECT p AS period_days, n_days,
           ROUND(a, 2) AS cos_sum, ROUND(b, 2) AS sin_sum,
           ROUND(power, 2) AS power,
           ROUND(power / tp, 6) AS power_share,
           CAST(ROW_NUMBER() OVER (ORDER BY power DESC, p) AS BIGINT)
               AS power_rank
    FROM pw CROSS JOIN tot
    ORDER BY p
"""


@query("q402_dft_periodogram", oracle=_PERIODOGRAM_ORACLE, tags=("X-129", "A-06"))
def q402_dft_periodogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DFT periodogram of DEMEANED daily purchase revenue over the
    integer period grid 2..14 days — spectral power
    |sum_d (y_d - ybar) e^(-2pi i d/p)|^2 per candidate period,
    normalized shares, and the power ranking of candidate cycles — the
    FREQUENCY-domain seasonality detector next to q207's time-domain
    autocorrelation (the periodogram separates close periods, e.g. 6 vs
    7 days, that autocorrelation smears) and beneath q304's fixed-7
    decomposition. The series mean is subtracted first (ADVICE r5):
    without demeaning, the large positive mean leaks into every period
    that does not evenly divide the day count and the ranking reads off
    divisibility artifacts, not cycles. ybar is rounded to the NEAREST
    CENT by pure integer arithmetic ((2*sum+n) div (2*n)), so residuals
    stay exact integers; the sub-cent remainder leaks < 0.5 cent/day of
    DC — orders of magnitude below any real seasonal component.

    Determinism: completely libm-free — cos/sin values enter BOTH
    engines as the SAME Python-precomputed 12-dp decimal literals (the
    q272 constant-injection precedent extended to a basis table), so
    every spectral sum is EXACT decimal arithmetic (integer residual
    cents x decimal(14,12)); the demeaning constant is an exact integer
    in both engines; power and shares are fixed-shape IEEE expressions
    over those exact sums; the rank is a total order on (power, p).

    Scale shape: ONE map-side-combined fact rollup to the bounded daily
    relation; the 13-period expansion is a broadcast join against the
    104-row trig table keyed on (p, d mod p) — fan-out 13x on the DAILY
    relation, never the fact table; per-period sums are A-14-mergeable
    decimals. At 100 TB the daily relation is still ~days-sized.

    Reference parity: beyond-reference (the reference has no spectral
    layer)."""
    daily = (
        load(spark, sf_dir, "events")
        .select(
            (F.unix_timestamp(F.date_trunc("day", F.col("ts"))) / F.lit(86400))
            .cast("long")
            .alias("d"),
            F.when(
                F.col("event_type") == "purchase",
                (F.col("value").cast("decimal(18,2)") * 100).cast("long"),
            )
            .otherwise(0)
            .alias("c"),
        )
        .groupBy("d")
        .agg(F.sum("c").cast("long").alias("y"))
    )
    bar = daily.agg(
        # demeaning sum in decimal(38,0): SUM(long) wraps silently in
        # non-ANSI Spark at extreme totals while the DuckDB oracle promotes
        # to HUGEINT — same overflow discipline as q400/q405 (ADVICE r6)
        F.expr(
            "CAST((2 * SUM(CAST(y AS DECIMAL(38,0))) + COUNT(*))"
            " DIV (2 * COUNT(*)) AS BIGINT)"
        ).alias("ybar")
    )
    daily = daily.crossJoin(F.broadcast(bar)).select(
        "d", (F.col("y") - F.col("ybar")).cast("long").alias("y")
    )
    trig_schema = StructType(
        [
            StructField("p", IntegerType()),
            StructField("r", IntegerType()),
            StructField("c", DecimalType(14, 12)),
            StructField("s", DecimalType(14, 12)),
        ]
    )
    trig = daily.sparkSession.createDataFrame(
        [(p, r, Decimal(c), Decimal(s)) for p, r, c, s in _TRIG], trig_schema
    )
    periods = daily.sparkSession.createDataFrame(
        [(p,) for p in _PERIODS], "p int"
    )
    d3812 = "decimal(38,12)"
    terms = (
        daily.crossJoin(F.broadcast(periods))
        .withColumn("r", (F.col("d") % F.col("p")).cast("int"))
        .join(F.broadcast(trig), ["p", "r"])
        .groupBy("p")
        .agg(
            F.sum(F.col("y") * F.col("c")).cast(d3812).alias("a"),
            F.sum(F.col("y") * F.col("s")).cast(d3812).alias("b"),
            F.count(F.lit(1)).cast("long").alias("n_days"),
        )
    )
    pw = terms.select(
        "p",
        "n_days",
        F.col("a").cast("double").alias("a"),
        F.col("b").cast("double").alias("b"),
        (
            F.col("a").cast("double") * F.col("a").cast("double")
            + F.col("b").cast("double") * F.col("b").cast("double")
        ).alias("power"),
    ).transform(stage)  # total + rank + readout share one build
    tot = pw.agg(F.sum("power").alias("tp"))
    return (
        pw.crossJoin(F.broadcast(tot))
        .select(
            F.col("p").alias("period_days"),
            "n_days",
            F.round("a", 2).alias("cos_sum"),
            F.round("b", 2).alias("sin_sum"),
            F.round("power", 2).alias("power"),
            F.round(F.col("power") / F.col("tp"), 6).alias("power_share"),
            F.row_number()
            .over(Window.orderBy(F.col("power").desc(), "p"))
            .cast("long")
            .alias("power_rank"),
        )
        .transform(pin)
        .orderBy("period_days")
    )


# ---------------------------------------------------------------------------
# X-130: ridge regularization path by exact Cramer solve
# ---------------------------------------------------------------------------

_LAMBDAS = (0, 1000, 10000, 100000)

_RIDGE_ORACLE = f"""
    WITH daily AS (
        SELECT CAST(FLOOR(epoch(date_trunc('day', ts))) AS BIGINT) // 86400
                   AS d,
               CAST(SUM(CASE WHEN event_type = 'purchase'
                        THEN {_CENTS_SQL} ELSE 0 END) AS BIGINT) AS y
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
               CAST(SUM(wk * y) AS HUGEINT) AS swy
        FROM xt
    ),
    grid AS (
        SELECT CAST(unnest(ARRAY{list(_LAMBDAS)}) AS HUGEINT) AS lam
    ),
    dets AS (
        SELECT lam, n,
               n * ((st2 + lam) * (sw + lam) - stw * stw)
                   - st * (st * (sw + lam) - stw * sw)
                   + sw * (st * stw - (st2 + lam) * sw) AS det,
               sy * ((st2 + lam) * (sw + lam) - stw * stw)
                   - st * (sty * (sw + lam) - stw * swy)
                   + sw * (sty * stw - (st2 + lam) * swy) AS det0,
               n * (sty * (sw + lam) - stw * swy)
                   - sy * (st * (sw + lam) - stw * sw)
                   + sw * (st * swy - sty * sw) AS det1,
               n * ((st2 + lam) * swy - sty * stw)
                   - st * (st * swy - sty * sw)
                   + sy * (st * stw - (st2 + lam) * sw) AS det2
        FROM m CROSS JOIN grid
    )
    SELECT CAST(lam AS BIGINT) AS lam,
           CAST(n AS BIGINT) AS n_days,
           CAST(det0 AS DOUBLE) / CAST(det AS DOUBLE) AS beta_intercept,
           CAST(det1 AS DOUBLE) / CAST(det AS DOUBLE) AS beta_trend_per_day,
           CAST(det2 AS DOUBLE) / CAST(det AS DOUBLE) AS beta_weekend,
           sqrt((CAST(det1 AS DOUBLE) / CAST(det AS DOUBLE))
                * (CAST(det1 AS DOUBLE) / CAST(det AS DOUBLE))
                + (CAST(det2 AS DOUBLE) / CAST(det AS DOUBLE))
                  * (CAST(det2 AS DOUBLE) / CAST(det AS DOUBLE)))
               AS coef_l2_norm
    FROM dets
    ORDER BY lam
"""


@query("q403_ridge_path", oracle=_RIDGE_ORACLE, tags=("X-130", "A-14"))
def q403_ridge_path(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ridge regression regularization path for daily revenue on
    (trend, weekend): beta(lambda) = (X'X + lambda*I')^-1 X'y with the
    intercept unpenalized, solved by Cramer's rule at each lambda in
    {0, 1e3, 1e4, 1e5} — the shrinkage path that shows how the trend
    and weekend coefficients attenuate as the penalty grows (model
    selection for q295's OLS, whose solution IS the lambda=0 row; the
    classic remedy when covariates correlate and OLS variance blows up).

    Determinism: daily cents use the shared _CENTS_SQL DECIMAL(18,2)
    idiom (ADVICE r5: the FLOOR(v*100+0.5) variant could diverge from
    q402's daily series on double-representation edge cases); the eight
    cross-moments are exact integers (the q295
    A-14 rollup); lambda joins as an exact integer; all four 3x3
    determinants expand in exact HUGEINT/decimal arithmetic with
    IDENTICAL parenthesization in both engines; each beta is ONE IEEE
    division of bit-identical operands and the L2 norm is sqrt
    (correctly rounded) of their fixed-shape combination.

    Scale shape: ONE map-side-combined fact rollup to the bounded daily
    relation, ONE 8-moment rollup to a single row (mergeable partials —
    the moments are computed ONCE for every lambda), then a 4-row
    broadcast lambda grid cross-join; adding lambdas or covariates
    grows literals and the moment vector, never the pass count.

    Reference parity: beyond-reference; extends X-85 (q295) with the
    penalized path."""
    d = (
        (F.unix_timestamp(F.date_trunc("day", F.col("ts"))) / F.lit(86400))
        .cast("long")
        .alias("d")
    )
    cents = F.when(
        F.col("event_type") == "purchase",
        (F.col("value").cast("decimal(18,2)") * 100).cast("long"),
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
    )
    grid = daily.sparkSession.createDataFrame(
        [(lam,) for lam in _LAMBDAS], "lam long"
    ).select(F.col("lam").cast(d38).alias("lam"))
    dets = m.crossJoin(F.broadcast(grid)).select(
        "lam",
        "n",
        F.expr(
            "n * ((st2 + lam) * (sw + lam) - stw * stw)"
            " - st * (st * (sw + lam) - stw * sw)"
            " + sw * (st * stw - (st2 + lam) * sw)"
        ).alias("det"),
        F.expr(
            "sy * ((st2 + lam) * (sw + lam) - stw * stw)"
            " - st * (sty * (sw + lam) - stw * swy)"
            " + sw * (sty * stw - (st2 + lam) * swy)"
        ).alias("det0"),
        F.expr(
            "n * (sty * (sw + lam) - stw * swy)"
            " - sy * (st * (sw + lam) - stw * sw)"
            " + sw * (st * swy - sty * sw)"
        ).alias("det1"),
        F.expr(
            "n * ((st2 + lam) * swy - sty * stw)"
            " - st * (st * swy - sty * sw)"
            " + sy * (st * stw - (st2 + lam) * sw)"
        ).alias("det2"),
    )
    b1 = F.col("det1").cast("double") / F.col("det").cast("double")
    b2 = F.col("det2").cast("double") / F.col("det").cast("double")
    return (
        dets.select(
            F.col("lam").cast("long").alias("lam"),
            F.col("n").cast("long").alias("n_days"),
            (F.col("det0").cast("double") / F.col("det").cast("double")).alias(
                "beta_intercept"
            ),
            b1.alias("beta_trend_per_day"),
            b2.alias("beta_weekend"),
            F.sqrt(b1 * b1 + b2 * b2).alias("coef_l2_norm"),
        )
        .transform(pin)
        .orderBy("lam")
    )


# ---------------------------------------------------------------------------
# X-131: Huber M-estimator of location by IRLS
# ---------------------------------------------------------------------------

_HUBER_ORACLE = f"""
    WITH vt AS (
        SELECT event_type AS etype, {_CENTS_SQL} AS v,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM events GROUP BY 1, 2
    ),
    c1 AS (
        SELECT *, CAST(SUM(n) OVER (PARTITION BY etype ORDER BY v
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                      AS BIGINT) AS cum,
               CAST(SUM(n) OVER (PARTITION BY etype) AS BIGINT) AS nt
        FROM vt
    ),
    med AS (
        SELECT etype, MIN(CASE WHEN cum >= (nt + 1) // 2 THEN v END) AS med,
               MAX(nt) AS nt
        FROM c1 GROUP BY etype
    ),
    dev AS (
        SELECT v.etype, abs(v.v - m.med) AS dv, CAST(SUM(v.n) AS BIGINT) AS n
        FROM vt v JOIN med m USING (etype) GROUP BY 1, 2
    ),
    c2 AS (
        SELECT *, CAST(SUM(n) OVER (PARTITION BY etype ORDER BY dv
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                      AS BIGINT) AS cum,
               CAST(SUM(n) OVER (PARTITION BY etype) AS BIGINT) AS nt
        FROM dev
    ),
    mad AS (
        SELECT etype, MIN(CASE WHEN cum >= (nt + 1) // 2 THEN dv END) AS mad
        FROM c2 GROUP BY etype
    ),
    par AS (
        SELECT m.etype, m.med, m.nt, d.mad,
               CAST(1345 * d.mad AS BIGINT) AS k_milli
        FROM med m JOIN mad d USING (etype)
    ),
    it1 AS (
        SELECT p.etype, p.med, p.nt, p.mad, p.k_milli,
               ROUND(
                   CAST(SUM(CAST(ROUND(
                       (CASE WHEN 1000 * abs(v.v - p.med) <= p.k_milli
                             THEN 1.0
                             ELSE ROUND(CAST(p.k_milli AS DOUBLE)
                                        / (1000 * abs(v.v - p.med)), 9) END)
                       * CAST(v.n * v.v AS DOUBLE), 6)
                       AS DECIMAL(28,6))) AS DOUBLE)
                   / CAST(SUM(CAST(ROUND(
                       (CASE WHEN 1000 * abs(v.v - p.med) <= p.k_milli
                             THEN 1.0
                             ELSE ROUND(CAST(p.k_milli AS DOUBLE)
                                        / (1000 * abs(v.v - p.med)), 9) END)
                       * v.n, 9) AS DECIMAL(28,9))) AS DOUBLE), 6) AS m1
        FROM vt v JOIN par p USING (etype)
        GROUP BY 1, 2, 3, 4, 5
    ),
    it2 AS (
        SELECT i.etype, i.med, i.nt, i.mad, i.m1,
               ROUND(
                   CAST(SUM(CAST(ROUND(
                       (CASE WHEN 1000 * abs(CAST(v.v AS DOUBLE) - i.m1)
                                  <= CAST(i.k_milli AS DOUBLE)
                             THEN 1.0
                             ELSE ROUND(CAST(i.k_milli AS DOUBLE)
                                        / (1000 * abs(CAST(v.v AS DOUBLE)
                                                      - i.m1)), 9) END)
                       * CAST(v.n * v.v AS DOUBLE), 6)
                       AS DECIMAL(28,6))) AS DOUBLE)
                   / CAST(SUM(CAST(ROUND(
                       (CASE WHEN 1000 * abs(CAST(v.v AS DOUBLE) - i.m1)
                                  <= CAST(i.k_milli AS DOUBLE)
                             THEN 1.0
                             ELSE ROUND(CAST(i.k_milli AS DOUBLE)
                                        / (1000 * abs(CAST(v.v AS DOUBLE)
                                                      - i.m1)), 9) END)
                       * v.n, 9) AS DECIMAL(28,9))) AS DOUBLE), 6) AS m2
        FROM vt v JOIN it1 i USING (etype)
        GROUP BY 1, 2, 3, 4, 5
    ),
    mean_ AS (
        SELECT etype,
               ROUND(CAST(SUM(CAST(n AS HUGEINT) * v) AS DOUBLE)
                     / SUM(n), 6) AS mean_cents
        FROM vt GROUP BY etype
    )
    SELECT i.etype, i.nt AS n_events, i.med AS median_cents,
           i.mad AS mad_cents, a.mean_cents, i.m1 AS huber_m1,
           i.m2 AS huber_m2
    FROM it2 i JOIN mean_ a USING (etype)
    ORDER BY i.etype
"""


@query("q404_huber_mean", oracle=_HUBER_ORACLE, tags=("X-131", "A-12"))
def q404_huber_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Huber M-estimator of location per event type by two IRLS rounds
    from a median/MAD start (tuning constant k = 1.345*MAD, the 95%-
    efficiency choice) — the robust center that, unlike the mean, does
    not chase heavy-tail outliers, and unlike the median, still uses
    the bulk's arithmetic information; the location counterpart to
    q142's MAD outlier GATE (q142 flags points; this estimates the
    center with them down-weighted, which is what a KPI dashboard
    should plot when values are contaminated).

    Determinism: median and MAD are exact k-th order statistics under
    cumulative-count windows (never interpolated — the q387 lesson);
    k_milli = 1345*MAD is an exact integer so the w=1 branch decision
    1000*|v-m| <= k_milli is INTEGER arithmetic in round 1; each
    fractional weight is one IEEE division rounded 9 dp, each weighted
    term rounds 6 dp before its exact decimal sum (the q120
    discipline), and m1 rounds 6 dp before feeding round 2 so both
    engines iterate from bit-identical operands.

    Scale shape: the fact reduces MAP-SIDE to the (type, value, count)
    compressed relation ONCE; medians, MADs, and BOTH reweighting
    rounds run on that bounded relation (weights depend only on the
    value, so each distinct value is reweighted once, not once per
    row); per-type parameters re-enter via broadcast joins. Iterations
    add passes over the compressed relation, never over the fact.

    Reference parity: beyond-reference; completes the robust-statistics
    kit (q142 MAD gate, q153 winsorized mean, q249 Theil-Sen slope)
    with the textbook M-estimator."""
    cents = (F.col("value").cast("decimal(18,2)") * 100).cast("long")
    vt = (
        load(spark, sf_dir, "events")
        .groupBy(F.col("event_type").alias("etype"), cents.alias("v"))
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .transform(stage)  # median, MAD, and both IRLS rounds reuse it
    )
    wcum = (
        Window.partitionBy("etype")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wall = Window.partitionBy("etype")
    c1 = vt.select(
        "*",
        F.sum("n").over(wcum).cast("long").alias("cum"),
        F.sum("n").over(wall).cast("long").alias("nt"),
    )
    med = c1.groupBy("etype").agg(
        F.min(
            F.when(F.col("cum") >= F.expr("(nt + 1) DIV 2"), F.col("v"))
        ).alias("med"),
        F.max("nt").alias("nt"),
    )
    dev = (
        vt.join(F.broadcast(med), "etype")
        .groupBy("etype", F.abs(F.col("v") - F.col("med")).alias("dv"))
        .agg(F.sum("n").cast("long").alias("n"))
    )
    wcum2 = (
        Window.partitionBy("etype")
        .orderBy("dv")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    c2 = dev.select(
        "*",
        F.sum("n").over(wcum2).cast("long").alias("cum"),
        F.sum("n").over(wall).cast("long").alias("nt"),
    )
    mad = c2.groupBy("etype").agg(
        F.min(
            F.when(F.col("cum") >= F.expr("(nt + 1) DIV 2"), F.col("dv"))
        ).alias("mad")
    )
    par = med.join(F.broadcast(mad), "etype").select(
        "etype",
        "med",
        "nt",
        "mad",
        (F.lit(1345) * F.col("mad")).cast("long").alias("k_milli"),
    )

    w1 = F.expr(
        "CASE WHEN 1000 * abs(v - med) <= k_milli THEN 1.0 "
        "ELSE ROUND(CAST(k_milli AS DOUBLE) / (1000 * abs(v - med)), 9) END"
    )
    it1 = (
        vt.join(F.broadcast(par), "etype")
        .groupBy("etype", "med", "nt", "mad", "k_milli")
        .agg(
            F.round(
                F.sum(
                    F.round(w1 * F.expr("CAST(n * v AS DOUBLE)"), 6).cast(
                        "decimal(28,6)"
                    )
                ).cast("double")
                / F.sum(F.round(w1 * F.col("n"), 9).cast("decimal(28,9)")).cast(
                    "double"
                ),
                6,
            ).alias("m1")
        )
    )
    w2 = F.expr(
        "CASE WHEN 1000 * abs(CAST(v AS DOUBLE) - m1) <= CAST(k_milli AS DOUBLE)"
        " THEN 1.0 ELSE ROUND(CAST(k_milli AS DOUBLE)"
        " / (1000 * abs(CAST(v AS DOUBLE) - m1)), 9) END"
    )
    it2 = (
        vt.join(F.broadcast(it1), "etype")
        .groupBy("etype", "med", "nt", "mad", "m1")
        .agg(
            F.round(
                F.sum(
                    F.round(w2 * F.expr("CAST(n * v AS DOUBLE)"), 6).cast(
                        "decimal(28,6)"
                    )
                ).cast("double")
                / F.sum(F.round(w2 * F.col("n"), 9).cast("decimal(28,9)")).cast(
                    "double"
                ),
                6,
            ).alias("m2")
        )
    )
    mean_ = vt.groupBy("etype").agg(
        F.round(
            F.sum(F.col("n").cast("decimal(38,0)") * F.col("v")).cast("double")
            / F.sum("n"),
            6,
        ).alias("mean_cents")
    )
    return (
        it2.join(F.broadcast(mean_), "etype")
        .select(
            "etype",
            F.col("nt").alias("n_events"),
            F.col("med").alias("median_cents"),
            F.col("mad").alias("mad_cents"),
            "mean_cents",
            F.col("m1").alias("huber_m1"),
            F.col("m2").alias("huber_m2"),
        )
        .transform(pin)
        .orderBy("etype")
    )


# ---------------------------------------------------------------------------
# X-132: AMS tug-of-war F2 sketch vs exact second frequency moment
# ---------------------------------------------------------------------------

_AMS_ORACLE = """
    WITH f AS (
        SELECT user_id AS u, CAST(COUNT(*) AS BIGINT) AS fc
        FROM events GROUP BY user_id
    ),
    expanded AS (
        SELECT u, fc, CAST(unnest(generate_series(0, 15)) AS BIGINT) AS j
        FROM f
    ),
    signed AS (
        SELECT j, fc,
               CASE WHEN instr('0123456789abcdef',
                        substr(md5(concat(CAST(u AS VARCHAR), ':',
                                          CAST(j AS VARCHAR))), 1, 1)) - 1 < 8
                    THEN 1 ELSE -1 END AS s
        FROM expanded
    ),
    counters AS (
        SELECT j, CAST(SUM(s * fc) AS BIGINT) AS c FROM signed GROUP BY j
    ),
    ests AS (
        SELECT j, j // 4 AS g,
               CAST(CAST(c AS HUGEINT) * c AS DECIMAL(38,0)) AS est
        FROM counters
    ),
    groups AS (
        SELECT g, CAST(SUM(est) AS DOUBLE) / 4 AS mean4
        FROM ests GROUP BY g
    ),
    gmed AS (
        SELECT (MAX(CASE WHEN rn = 2 THEN mean4 END)
                + MAX(CASE WHEN rn = 3 THEN mean4 END)) / 2 AS est_median
        FROM (SELECT mean4,
                     ROW_NUMBER() OVER (ORDER BY mean4, g) AS rn
              FROM groups)
    ),
    summary AS (
        SELECT CAST((SELECT COUNT(*) FROM f) AS BIGINT) AS n_users,
               CAST((SELECT SUM(CAST(fc AS HUGEINT) * fc) FROM f)
                    AS DOUBLE) AS f2_exact,
               CAST((SELECT SUM(est) FROM ests) AS DOUBLE) / 16 AS est_mean,
               (SELECT est_median FROM gmed) AS est_median
    )
    SELECT n_users, CAST(16 AS BIGINT) AS n_counters, f2_exact,
           ROUND(est_mean, 2) AS est_mean, ROUND(est_median, 2) AS est_median,
           ROUND((est_mean - f2_exact) / f2_exact, 6) AS rel_err_mean,
           ROUND((est_median - f2_exact) / f2_exact, 6) AS rel_err_median
    FROM summary
"""


@query("q405_ams_f2_sketch", oracle=_AMS_ORACLE, tags=("X-132", "A-14"))
def q405_ams_f2_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AMS 'tug-of-war' sketch of the second frequency moment F2 =
    sum_u f_u^2 of the per-user event counts — 16 sign-hashed counters
    C_j = sum_u s_j(u)*f_u whose squares estimate F2 (mean of 16, and
    the variance-robust median of 4 group means), reported against the
    EXACT F2 with relative errors. F2 is the self-join size: this
    sketch answers 'how big would events JOIN events on user_id be'
    from one tiny mergeable state — the skew/join-planning companion to
    A-13's HLL (distinct count = F0), X-40's quantile histogram, and
    q218's sampled join estimate, and the third classic sketch beside
    A-15's Count-Min.

    Determinism: the sign function is a pure md5-nibble function of
    (user, counter) — RNG-free, the X-16 discipline; counters, their
    squares, and exact F2 are exact integers computed in decimal(38,0)
    (at 1e12-row scale both C_j^2 and F2 reach ~1e24 and must not
    overflow a long — ADVICE r5 caught the f2_exact readout still
    casting to BIGINT; like est_mean it now reads out as a DOUBLE,
    which never overflows); the 4-group means and
    the median-of-4 (mean of
    the 2 middle order statistics under a (mean, group) total order)
    are fixed-shape IEEE expressions over exact operands.

    Scale shape: ONE fact rollup to (user, count); the 16-way counter
    expansion is a MAP-ONLY explode of that compressed relation
    followed by a map-side-combined rollup onto 16 rows — the counters
    are A-14-MERGEABLE (per-shard counters sum associatively), which is
    the entire point of AMS: shards exchange 16 longs, never user
    vectors, to estimate a 100 TB self-join.

    Reference parity: beyond-reference; completes the sketch family
    (A-13 HLL / A-15 CMS / X-40 HDR / q339 KMV) with the frequency-
    moment estimator."""
    f = (
        load(spark, sf_dir, "events")
        .groupBy(F.col("user_id").alias("u"))
        .agg(F.count(F.lit(1)).cast("long").alias("fc"))
    )
    signed = f.select(
        "u",
        "fc",
        F.explode(F.sequence(F.lit(0), F.lit(15))).alias("j0"),
    ).select(
        "u", "fc", F.col("j0").cast("long").alias("j")
    ).withColumn(
        "s",
        F.expr(
            "CASE WHEN instr('0123456789abcdef', substr(md5(concat("
            "CAST(u AS STRING), ':', CAST(j AS STRING))), 1, 1)) - 1 < 8 "
            "THEN 1 ELSE -1 END"
        ),
    )
    counters = signed.groupBy("j").agg(
        F.sum(F.col("s") * F.col("fc")).cast("long").alias("c")
    )
    ests = counters.select(
        "j",
        F.expr("j DIV 4").alias("g"),
        (F.col("c").cast("decimal(38,0)") * F.col("c"))
        .cast("decimal(38,0)")
        .alias("est"),
    ).transform(stage)  # mean-of-16 and the 4 group means share one build
    groups = ests.groupBy("g").agg(
        (F.sum("est").cast("double") / 4).alias("mean4")
    )
    ranked = groups.select(
        "mean4", F.row_number().over(Window.orderBy("mean4", "g")).alias("rn")
    )
    gmed = ranked.agg(
        (
            (
                F.max(F.when(F.col("rn") == 2, F.col("mean4")))
                + F.max(F.when(F.col("rn") == 3, F.col("mean4")))
            )
            / 2
        ).alias("est_median")
    )
    exact = f.agg(
        F.count(F.lit(1)).cast("long").alias("n_users"),
        F.sum(F.col("fc").cast("decimal(38,0)") * F.col("fc"))
        .cast("double")
        .alias("f2_exact"),
    )
    est_mean = ests.agg((F.sum("est").cast("double") / 16).alias("est_mean"))
    return (
        exact.crossJoin(F.broadcast(est_mean))
        .crossJoin(F.broadcast(gmed))
        .select(
            "n_users",
            F.lit(16).cast("long").alias("n_counters"),
            "f2_exact",
            F.round("est_mean", 2).alias("est_mean"),
            F.round("est_median", 2).alias("est_median"),
            F.round(
                (F.col("est_mean") - F.col("f2_exact")) / F.col("f2_exact"), 6
            ).alias("rel_err_mean"),
            F.round(
                (F.col("est_median") - F.col("f2_exact")) / F.col("f2_exact"), 6
            ).alias("rel_err_median"),
        )
    )


# ---------------------------------------------------------------------------
# X-138: Wilcoxon signed-rank test (paired weekend-vs-weekday per user)
# ---------------------------------------------------------------------------

_SIGNED_RANK_ORACLE = f"""
    WITH pu AS (
        SELECT user_id,
               CAST(SUM(CASE WHEN dayofweek(date_trunc('day', ts)) + 1 IN (1, 7)
                        THEN {_CENTS_SQL} ELSE 0 END) AS BIGINT)
               - CAST(SUM(CASE WHEN dayofweek(date_trunc('day', ts)) + 1 IN (1, 7)
                          THEN 0 ELSE {_CENTS_SQL} END) AS BIGINT) AS d
        FROM events WHERE event_type = 'purchase'
        GROUP BY user_id
    ),
    nz AS (SELECT d FROM pu WHERE d <> 0),
    grp AS (
        SELECT abs(d) AS a,
               CAST(COUNT(*) AS BIGINT) AS n_a,
               CAST(SUM(CASE WHEN d > 0 THEN 1 ELSE 0 END) AS BIGINT) AS npos
        FROM nz GROUP BY 1
    ),
    rk AS (
        SELECT a, n_a, npos,
               CAST(COALESCE(SUM(n_a) OVER (ORDER BY a
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                   AS BIGINT) AS cum
        FROM grp
    ),
    agg AS (
        SELECT CAST(SUM(n_a) AS BIGINT) AS n,
               CAST(SUM(npos) AS BIGINT) AS n_pos,
               CAST(SUM(CAST(npos AS HUGEINT) * (2 * cum + n_a + 1))
                    AS HUGEINT) AS w2,
               CAST(SUM(CAST(n_a AS HUGEINT) * n_a * n_a - n_a)
                    AS HUGEINT) AS tie3
        FROM rk
    )
    SELECT n AS n_nonzero, n_pos, CAST(n - n_pos AS BIGINT) AS n_neg,
           CAST(w2 AS DOUBLE) / 2 AS w_plus,
           (2 * CAST(w2 AS DOUBLE) - CAST(n AS DOUBLE) * (n + 1))
           / (4 * sqrt((2.0 * n * (n + 1) * (2 * n + 1)
                        - CAST(tie3 AS DOUBLE)) / 48)) AS z_score
    FROM agg
"""


@query("q413_signed_rank_test", oracle=_SIGNED_RANK_ORACLE, tags=("X-138", "A-12"))
def q413_signed_rank_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wilcoxon SIGNED-RANK test of per-user weekend-vs-weekday purchase
    spend — the PAIRED nonparametric location test (each user is their
    own control: d_u = weekend cents - weekday cents, exact integers),
    completing the rank-test kit: X-127's Mann-Whitney compares two
    INDEPENDENT samples, q342's paired t assumes near-normal
    differences, this ranks the within-pair differences and stays valid
    on heavy-tailed spend. Standard treatment: zero differences drop,
    ties midrank, W+ = rank-sum of positive differences, normal
    approximation with the tie correction.

    Determinism (the q400 half-unit discipline): differences are exact
    integer cents, so |d| groups exactly; 2*midrank = 2*cum_before +
    n_a + 1 is an exact integer, hence 2*W+ and the tie term sum(t^3-t)
    are exact integers; z = (4W - n(n+1)) / (4*sqrt((2n(n+1)(2n+1) -
    tie3)/48)) is ONE fixed-shape IEEE expression over those integers
    (sqrt correctly rounded — no libm risk); W+ reads out as an exact
    half-integer double.

    Scale shape: ONE map-side-combined fact rollup to per-user signed
    integer differences, a second rollup to the DISTINCT-|d| relation
    (ties ARE the value compression — never a per-row rank), a
    cumulative window over that bounded relation, and a 4-term rollup
    to a single row.

    Reference parity: beyond-reference; the paired sibling of X-127."""
    cents = (F.col("value").cast("decimal(18,2)") * 100).cast("long")
    wk = F.dayofweek(F.date_trunc("day", F.col("ts"))).isin(1, 7)
    pu = (
        load(spark, sf_dir, "events")
        .filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(
            (
                F.sum(F.when(wk, cents).otherwise(0))
                - F.sum(F.when(wk, F.lit(0)).otherwise(cents))
            )
            .cast("long")
            .alias("d")
        )
    )
    grp = (
        pu.filter(F.col("d") != 0)
        .groupBy(F.abs(F.col("d")).alias("a"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_a"),
            F.sum(F.when(F.col("d") > 0, 1).otherwise(0)).cast("long").alias("npos"),
        )
    )
    w = Window.orderBy("a").rowsBetween(Window.unboundedPreceding, -1)
    d38 = "decimal(38,0)"
    rk = grp.select(
        "a", "n_a", "npos", F.coalesce(F.sum("n_a").over(w), F.lit(0)).cast("long").alias("cum")
    )
    agg = rk.agg(
        F.sum("n_a").cast("long").alias("n"),
        F.sum("npos").cast("long").alias("n_pos"),
        F.sum(F.col("npos").cast(d38) * (2 * F.col("cum") + F.col("n_a") + 1))
        .cast(d38)
        .alias("w2"),
        F.sum(F.col("n_a").cast(d38) * F.col("n_a") * F.col("n_a") - F.col("n_a"))
        .cast(d38)
        .alias("tie3"),
    )
    nD = F.col("n").cast("double")
    return agg.select(
        F.col("n").alias("n_nonzero"),
        "n_pos",
        (F.col("n") - F.col("n_pos")).cast("long").alias("n_neg"),
        (F.col("w2").cast("double") / 2).alias("w_plus"),
        (
            (2 * F.col("w2").cast("double") - nD * (F.col("n") + 1))
            / (
                4
                * F.sqrt(
                    (
                        2.0 * F.col("n") * (F.col("n") + 1) * (2 * F.col("n") + 1)
                        - F.col("tie3").cast("double")
                    )
                    / 48
                )
            )
        ).alias("z_score"),
    )
