"""Experiment & model-evaluation analytics (SURVEY.md §2K extension
X-23): A/B two-proportion z-test, decile gains/calibration table, and
EXACT AUC via the Mann-Whitney rank-sum — the measurement layer that
turns the engine's event streams into ship/no-ship decisions (the
reference's dashboards stop at raw counts; every experimentation stack
runs exactly these three on the same data).

Determinism: assignment is a pure function of md5(user_id) (the X-16
group-hash-split machinery, RNG-free); all counts and the AUC rank sums
are exact integers/decimals with ONE final IEEE division; z-score uses
sqrt (IEEE-754 correctly rounded, hence engine-identical on identical
operands) and rounds at 6 dp.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.ordering import stage
from ..functions.partitioning import fan_out
from ..tables import load
from .registry import query

#: first md5 hex nibble of the unit id: 0..7 -> arm 'a', 8..f -> arm 'b'
_ARM_EXPR = (
    "CASE WHEN instr('0123456789abcdef', "
    "substr(md5(CAST(user_id AS {t})), 1, 1)) - 1 < 8 "
    "THEN 'a' ELSE 'b' END"
)

_AUC_BUCKET = 5000  #: prefix-sum bucket width over the cents score domain
_CONV_MIN = 150  #: conversion = any purchase over this value (~45% of users)


@query(
    "q169_ab_test_z",
    oracle=f"""
    WITH u AS (
        SELECT user_id, {_ARM_EXPR.format(t="VARCHAR")} AS arm,
               MAX(CASE WHEN event_type = 'purchase' AND value > {_CONV_MIN}
                   THEN 1 ELSE 0 END) AS conv
        FROM events GROUP BY user_id
    ),
    agg AS (
        SELECT COUNT(CASE WHEN arm = 'a' THEN 1 END) AS users_a,
               CAST(SUM(CASE WHEN arm = 'a' THEN conv ELSE 0 END) AS BIGINT) AS conv_a,
               COUNT(CASE WHEN arm = 'b' THEN 1 END) AS users_b,
               CAST(SUM(CASE WHEN arm = 'b' THEN conv ELSE 0 END) AS BIGINT) AS conv_b
        FROM u
    )
    SELECT users_a, conv_a, users_b, conv_b,
           ROUND(CAST(conv_a AS DOUBLE) / users_a, 6) AS rate_a,
           ROUND(CAST(conv_b AS DOUBLE) / users_b, 6) AS rate_b,
           ROUND(CAST(conv_a AS DOUBLE) / users_a
                 - CAST(conv_b AS DOUBLE) / users_b, 6) AS abs_lift,
           CASE WHEN conv_a + conv_b = 0
                     OR conv_a + conv_b = users_a + users_b THEN NULL
                ELSE ROUND((CAST(conv_a AS DOUBLE) / users_a
                            - CAST(conv_b AS DOUBLE) / users_b)
                 / sqrt((CAST(conv_a + conv_b AS DOUBLE) / (users_a + users_b))
                        * (1 - CAST(conv_a + conv_b AS DOUBLE) / (users_a + users_b))
                        * (1.0 / users_a + 1.0 / users_b)), 6) END AS z_score
    FROM agg
    """,
    tags=("X-23", "X-16", "A-03"),
)
def q169_ab_test_z(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-proportion A/B test: users deterministically hash-split into
    arms (md5 first nibble, the X-16 group-hash assignment — RNG-free,
    backfill-reproducible, every user wholly in one arm), conversion =
    "any purchase over 150" (non-degenerate ~45% base rate on this
    data), and the pooled two-proportion z-score decides significance
    (|z| > 1.96 ~ p < .05). The single-row readout an experimentation
    platform computes per metric per experiment; a saturated metric
    (0% or 100% pooled) yields NULL z identically in both engines.

    Scale shape: one shuffle keyed by user for the per-unit conversion
    rollup (map-side combined MAX), then ONE ungrouped conditional agg
    — four integers cross the final exchange; arm assignment is map-only
    codegen. sqrt is IEEE-correctly-rounded, so both engines divide and
    root bit-identical operands."""
    ev = load(spark, sf_dir, "events")
    u = (
        ev.groupBy("user_id")
        .agg(
            F.max(
                F.when(
                    (F.col("event_type") == "purchase") & (F.col("value") > _CONV_MIN),
                    1,
                ).otherwise(0)
            ).alias("conv")
        )
        .select(F.expr(_ARM_EXPR.format(t="string")).alias("arm"), "conv")
    )
    agg = u.agg(
        F.count(F.when(F.col("arm") == "a", 1)).alias("users_a"),
        F.sum(F.when(F.col("arm") == "a", F.col("conv")).otherwise(0))
        .cast("long")
        .alias("conv_a"),
        F.count(F.when(F.col("arm") == "b", 1)).alias("users_b"),
        F.sum(F.when(F.col("arm") == "b", F.col("conv")).otherwise(0))
        .cast("long")
        .alias("conv_b"),
    )
    pa = F.col("conv_a").cast("double") / F.col("users_a")
    pb = F.col("conv_b").cast("double") / F.col("users_b")
    pool = (F.col("conv_a") + F.col("conv_b")).cast("double") / (
        F.col("users_a") + F.col("users_b")
    )
    se = F.sqrt(
        pool * (1 - pool) * (1.0 / F.col("users_a") + 1.0 / F.col("users_b"))
    )
    return agg.select(
        "users_a",
        "conv_a",
        "users_b",
        "conv_b",
        F.round(pa, 6).alias("rate_a"),
        F.round(pb, 6).alias("rate_b"),
        F.round(pa - pb, 6).alias("abs_lift"),
        F.when(
            (F.col("conv_a") + F.col("conv_b") == 0)
            | (F.col("conv_a") + F.col("conv_b") == F.col("users_a") + F.col("users_b")),
            F.lit(None).cast("double"),
        )
        .otherwise(F.round((pa - pb) / se, 6))
        .alias("z_score"),
    )


@query(
    "q162_gains_table",
    oracle="""
    WITH e AS (
        SELECT quantile_cont(value, 0.1) AS e1, quantile_cont(value, 0.2) AS e2,
               quantile_cont(value, 0.3) AS e3, quantile_cont(value, 0.4) AS e4,
               quantile_cont(value, 0.5) AS e5, quantile_cont(value, 0.6) AS e6,
               quantile_cont(value, 0.7) AS e7, quantile_cont(value, 0.8) AS e8,
               quantile_cont(value, 0.9) AS e9
        FROM events
    ),
    binned AS (
        SELECT CAST((value > e1) AS INT) + CAST((value > e2) AS INT)
             + CAST((value > e3) AS INT) + CAST((value > e4) AS INT)
             + CAST((value > e5) AS INT) + CAST((value > e6) AS INT)
             + CAST((value > e7) AS INT) + CAST((value > e8) AS INT)
             + CAST((value > e9) AS INT) AS decile,
               CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS pos
        FROM events CROSS JOIN e
    ),
    b AS (
        SELECT decile, COUNT(*) AS n,
               CAST(SUM(pos) AS BIGINT) AS n_pos
        FROM binned GROUP BY decile
    ),
    t AS (SELECT CAST(SUM(n_pos) AS BIGINT) AS total_pos FROM b)
    SELECT decile, n, n_pos,
           ROUND(CAST(n_pos AS DOUBLE) / n, 6) AS pos_rate,
           ROUND(CAST(CAST(SUM(n_pos) OVER (
                     ORDER BY decile DESC
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                 ) AS BIGINT) AS DOUBLE) / t.total_pos, 6) AS cum_capture
    FROM b CROSS JOIN t
    ORDER BY decile DESC
    """,
    tags=("X-23", "A-12", "W-03"),
)
def q162_gains_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decile gains/calibration table: events ranked by score (= value)
    into equi-depth deciles, per-decile positive rate (calibration) and
    top-down cumulative capture of all positives (the gains curve — "the
    top 2 deciles capture X% of conversions"). The tabular form of
    ROC/lift that model-eval dashboards render.

    Scale shape: decile EDGES come from one exact-percentile agg (A-12)
    and BROADCAST back; bin assignment is a map-only chain of nine
    comparisons — never a global ntile sort of the fact. The per-decile
    rollup is map-side combined, and the cumulative window runs over the
    BOUNDED 10-row decile relation only."""
    ev = load(spark, sf_dir, "events").select("value", "event_type")
    # ONE array-percentile aggregate instead of nine scalar ones: each
    # percentile(value, p) call is its own aggregate function with its own
    # per-value counts map, so the 9-edge form built (and merged) nine
    # identical maps per partition; percentile(value, array(...)) computes
    # all nine edges from a single map (guide §1.2 "per-task work" — same
    # result, ninth the aggregation state). Measured 0.79 s -> 0.42 s at
    # sf0.1 (median of 5).
    edges = F.expr(
        "percentile(value, array(0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9))"
    ).alias("es")
    e = ev.agg(edges).select(
        *[F.element_at("es", q).alias(f"e{q}") for q in range(1, 10)]
    )
    decile = sum(
        (F.col("value") > F.col(f"e{q}")).cast("int") for q in range(1, 10)
    )
    binned = ev.crossJoin(F.broadcast(e)).select(
        decile.alias("decile"),
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("pos"),
    )
    b = binned.groupBy("decile").agg(
        F.count(F.lit(1)).alias("n"), F.sum("pos").cast("long").alias("n_pos")
    )
    t = b.agg(F.sum("n_pos").cast("long").alias("total_pos"))
    cum = (
        F.sum("n_pos")
        .over(
            Window.orderBy(F.col("decile").desc()).rowsBetween(
                Window.unboundedPreceding, 0
            )
        )
        .cast("long")
    )
    return (
        b.crossJoin(F.broadcast(t))
        .select(
            "decile",
            "n",
            "n_pos",
            F.round(F.col("n_pos").cast("double") / F.col("n"), 6).alias("pos_rate"),
            F.round(cum.cast("double") / F.col("total_pos"), 6).alias("cum_capture"),
        )
        .orderBy(F.col("decile").desc())
    )


@query(
    "q166_exact_auc",
    oracle=f"""
    WITH s AS (
        SELECT CAST(ROUND(value * 100) AS BIGINT) AS c,
               CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS pos
        FROM events
    ),
    v AS (
        SELECT c, CAST(SUM(pos) AS BIGINT) AS pos_v,
               CAST(SUM(1 - pos) AS BIGINT) AS neg_v
        FROM s GROUP BY c
    ),
    cumn AS (
        SELECT c, pos_v, neg_v,
               CAST(COALESCE(SUM(neg_v) OVER (
                   ORDER BY c ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
               ), 0) AS BIGINT) AS neg_below
        FROM v
    )
    SELECT CAST(SUM(pos_v) AS BIGINT) AS n_pos,
           CAST(SUM(neg_v) AS BIGINT) AS n_neg,
           ROUND(CAST(SUM(CAST(pos_v AS DECIMAL(19,0))
                           * CAST(2 * neg_below + neg_v AS DECIMAL(19,0)))
                      AS DOUBLE)
                 / (2 * CAST(SUM(pos_v) AS DOUBLE) * SUM(neg_v)), 6) AS auc
    FROM cumn
    """,
    tags=("X-23", "A-12", "W-03"),
)
def q166_exact_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT ROC-AUC by Mann-Whitney rank-sum, tie-corrected: group rows
    by distinct score (cents), accumulate negatives strictly below each
    score, and U2 = sum pos_v * (2*neg_below + neg_v) counts each
    (pos, neg) pair twice for a win and once for a tie — AUC = U2 /
    (2 * n_pos * n_neg). Every operand is an exact integer/decimal until
    the single final division, so no sampling, no libm, no threshold
    sweep approximation.

    Scale shape: the fact reduces to ONE map-side-combined groupBy on
    the score value — the working relation is bounded by the score
    DOMAIN (distinct cents), not the corpus. The cumulative
    negatives-below uses the q84/q148 TWO-LEVEL bucketed prefix sum
    (within-bucket window + bounded bucket-offset pass), never a
    single-partition window; pair products accumulate as decimal(38,0)
    so 1e10-per-cell counts cannot overflow."""
    ev = load(spark, sf_dir, "events")
    s = ev.select(
        F.round(F.col("value") * 100).cast("long").alias("c"),
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("pos"),
    )
    v = (
        s.groupBy("c")
        .agg(
            F.sum("pos").cast("long").alias("pos_v"),
            F.sum(1 - F.col("pos")).cast("long").alias("neg_v"),
        )
        .withColumn("bucket", F.expr(f"c DIV {_AUC_BUCKET}"))
    )
    within = v.withColumn(
        "w",
        F.coalesce(
            F.sum("neg_v").over(
                Window.partitionBy("bucket")
                .orderBy("c")
                .rowsBetween(Window.unboundedPreceding, -1)
            ),
            F.lit(0),
        ),
    ).transform(stage)  # feeds bucket totals AND the final agg
    btot = within.groupBy("bucket").agg(F.sum("neg_v").alias("bneg"))
    offs = btot.select(
        "bucket",
        F.coalesce(
            F.sum("bneg").over(
                Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, -1)
            ),
            F.lit(0),
        ).alias("off"),
    )
    d19 = "decimal(19,0)"
    cumn = within.join(F.broadcast(offs), "bucket").select(
        "pos_v", "neg_v", (F.col("w") + F.col("off")).alias("neg_below")
    )
    return cumn.agg(
        F.sum("pos_v").cast("long").alias("n_pos"),
        F.sum("neg_v").cast("long").alias("n_neg"),
        F.round(
            F.sum(
                F.col("pos_v").cast(d19)
                * (2 * F.col("neg_below") + F.col("neg_v")).cast(d19)
            ).cast("double")
            / (
                2
                * F.sum("pos_v").cast("long").cast("double")
                * F.sum("neg_v").cast("long")
            ),
            6,
        ).alias("auc"),
    )


#: two-sided alpha=.05 and 80%-power normal quantiles, 6 dp (fixed
#: constants, not libm calls, so both engines consume identical literals)
_Z_ALPHA = 1.959964
_Z_POWER = 0.841621


@query(
    "q189_mde_power",
    oracle=f"""
    WITH u AS (
        SELECT user_id, {_ARM_EXPR.format(t="VARCHAR")} AS arm,
               MAX(CASE WHEN event_type = 'purchase' AND value > {_CONV_MIN}
                   THEN 1 ELSE 0 END) AS conv
        FROM events GROUP BY user_id
    ),
    agg AS (
        SELECT COUNT(CASE WHEN arm = 'a' THEN 1 END) AS users_a,
               COUNT(CASE WHEN arm = 'b' THEN 1 END) AS users_b,
               CAST(SUM(conv) AS BIGINT) AS conv_all,
               COUNT(*) AS users_all
        FROM u
    )
    SELECT users_a, users_b,
           ROUND(CAST(conv_all AS DOUBLE) / users_all, 6) AS base_rate,
           ROUND(({_Z_ALPHA} + {_Z_POWER})
                 * sqrt((CAST(conv_all AS DOUBLE) / users_all)
                        * (1 - CAST(conv_all AS DOUBLE) / users_all)
                        * (1.0 / users_a + 1.0 / users_b)), 6) AS mde_abs,
           ROUND((({_Z_ALPHA} + {_Z_POWER})
                 * sqrt((CAST(conv_all AS DOUBLE) / users_all)
                        * (1 - CAST(conv_all AS DOUBLE) / users_all)
                        * (1.0 / users_a + 1.0 / users_b)))
                 / (CAST(conv_all AS DOUBLE) / users_all), 6) AS mde_rel
    FROM agg
    """,
    tags=("X-23", "A-03"),
)
def q189_mde_power(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Minimum detectable effect for the q169 experiment design: given
    the arm sizes the hash split actually produces and the pooled base
    conversion rate, the smallest absolute (and relative) lift a
    two-sided alpha=.05 test detects with 80% power — the pre-launch
    readout that tells an experimenter whether the test is even worth
    running at this traffic level (run q189 BEFORE q169 reads the
    result).  z-quantiles enter as fixed 6-dp literals, not libm calls.

    Scale shape: identical to q169 — one user-keyed rollup
    (map-side-combined MAX), one ungrouped conditional agg, four
    integers cross the final exchange; sqrt is IEEE-correctly-rounded
    on bit-identical operands."""
    ev = load(spark, sf_dir, "events")
    u = (
        ev.groupBy("user_id")
        .agg(
            F.max(
                F.when(
                    (F.col("event_type") == "purchase") & (F.col("value") > _CONV_MIN),
                    1,
                ).otherwise(0)
            ).alias("conv")
        )
        .select(F.expr(_ARM_EXPR.format(t="string")).alias("arm"), "conv")
    )
    agg = u.agg(
        F.count(F.when(F.col("arm") == "a", 1)).alias("users_a"),
        F.count(F.when(F.col("arm") == "b", 1)).alias("users_b"),
        F.sum("conv").cast("long").alias("conv_all"),
        F.count(F.lit(1)).alias("users_all"),
    )
    p = F.col("conv_all").cast("double") / F.col("users_all")
    mde = (_Z_ALPHA + _Z_POWER) * F.sqrt(
        p * (1 - p) * (1.0 / F.col("users_a") + 1.0 / F.col("users_b"))
    )
    return agg.select(
        "users_a",
        "users_b",
        F.round(p, 6).alias("base_rate"),
        F.round(mde, 6).alias("mde_abs"),
        F.round(mde / p, 6).alias("mde_rel"),
    )


# ---------------------------------------------------------------------------
# X-33: resampling-based uncertainty — deterministic half-sample CI
# ---------------------------------------------------------------------------

from .audit import _nibble_int  # noqa: E402  (48-bit md5 int, shared idiom)

#: exact integer floor-div valid in BOTH engines (q190 idiom): the
#: numerator is made divisible by d first, so the IEEE division is exact.
_FLOORDIV_EVAL = "CAST((({x}) - ({x}) % {d}) / {d} AS BIGINT)"

_B = 16  #: number of half-sample replicates = usable independent md5 bits

#: 48-bit integer from md5(order key) — one hash per row, bits reused as
#: the {b}-th replicate's membership coin.
_H48 = _nibble_int("md5(CAST(o_orderkey AS {t}))")


@query(
    "q193_half_sample_ci",
    oracle=f"""
    WITH keyed AS (
        SELECT CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents,
               {_H48.format(t="VARCHAR")} AS h
        FROM orders
    ),
    full_stats AS (
        SELECT COUNT(*) AS n_all, CAST(SUM(cents) AS BIGINT) AS s_all
        FROM keyed
    ),
    rep AS (
        SELECT r.rep, COUNT(*) AS n_b, CAST(SUM(k.cents) AS BIGINT) AS s_b
        FROM keyed k
        CROSS JOIN (SELECT unnest(range({_B})) AS rep) r
        WHERE ((k.h >> r.rep) & 1) = 1
        GROUP BY r.rep
    ),
    terms AS (
        SELECT CAST(ROUND(
                 (CAST(s_b AS DOUBLE) / (100.0 * n_b) - CAST(s_all AS DOUBLE) / (100.0 * n_all))
               * (CAST(s_b AS DOUBLE) / (100.0 * n_b) - CAST(s_all AS DOUBLE) / (100.0 * n_all)), 6)
               AS DECIMAL(38,6)) AS term
        FROM rep CROSS JOIN full_stats
    ),
    var_est AS (SELECT SUM(term) AS ss FROM terms)
    SELECT n_all AS n_orders,
           {_B} AS n_replicates,
           ROUND(CAST(s_all AS DOUBLE) / (100.0 * n_all), 6) AS mean_total,
           ROUND(sqrt(CAST(ss AS DOUBLE) / {_B}), 6) AS se,
           ROUND(ROUND(CAST(s_all AS DOUBLE) / (100.0 * n_all), 6)
                 - 1.959964 * ROUND(sqrt(CAST(ss AS DOUBLE) / {_B}), 6), 6)
               AS ci_lo,
           ROUND(ROUND(CAST(s_all AS DOUBLE) / (100.0 * n_all), 6)
                 + 1.959964 * ROUND(sqrt(CAST(ss AS DOUBLE) / {_B}), 6), 6)
               AS ci_hi
    FROM full_stats CROSS JOIN var_est
    """,
    tags=("X-33", "A-08"),
)
def q193_half_sample_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic half-sample replication CI for a pipeline metric
    (mean order total): each of 16 replicates keeps the rows whose b-th
    md5 bit is set (an RNG-free ~half-sample, the X-16 hash-assignment
    idiom), the spread of replicate means estimates the sampling
    variance (SE = sqrt(mean squared deviation from the full-sample
    mean)), and a 95% normal CI brackets the point estimate — the
    "error bars on any dashboard number" primitive that bootstrap
    resampling provides, made backfill-reproducible because membership
    is a pure function of the row key.

    Determinism: replicate membership and counts/sums are exact; the
    per-replicate squared deviations are rounded at 6 dp and summed as
    DECIMAL (order-independent); sqrt is IEEE-correctly-rounded; the z
    quantile is a fixed 6 dp literal (q189 precedent, never libm).

    Scale shape: ONE pass — per row one md5 plus 16 bit-tests feeding 34
    conditional aggregates in a single map-side-combined ungrouped agg
    (measured 3x faster than the explode-then-filter formulation, whose
    16x row fan-out costs real CPU even though combine keeps the
    exchange thin); the replicate table then EXPLODES FROM THE ONE
    RESULT ROW, so everything after runs on a 16-row relation. fan_out
    spreads the raw rows first when the parquet split count is narrower
    than the cluster (the scan-rooted md5 stage is CPU-amplifying;
    no-op on a many-split table). All 34 partials merge across shards
    (A-14) for free."""
    keyed = fan_out(load(spark, sf_dir, "orders")).select(
        F.expr("CAST(ROUND(o_totalprice * 100) AS BIGINT)").alias("cents"),
        F.expr(_H48.format(t="STRING")).alias("h"),
    )
    rep_aggs = []
    for b in range(_B):
        bit = F.expr(f"(shiftright(h, {b}) & 1) = 1")
        rep_aggs.append(F.sum(F.when(bit, 1).otherwise(0)).cast("long").alias(f"n_{b}"))
        rep_aggs.append(F.sum(F.when(bit, F.col("cents"))).cast("long").alias(f"s_{b}"))
    wide = stage(
        keyed.agg(
            F.count(F.lit(1)).alias("n_all"),
            F.sum("cents").cast("long").alias("s_all"),
            *rep_aggs,
        )
    )
    rep_structs = [
        F.struct(F.col(f"n_{b}").alias("n_b"), F.col(f"s_{b}").alias("s_b"))
        for b in range(_B)
    ]
    rep = wide.select(
        "n_all", "s_all", F.explode(F.array(*rep_structs)).alias("r")
    ).select("n_all", "s_all", F.col("r.n_b").alias("n_b"), F.col("r.s_b").alias("s_b"))
    dev = "(CAST(s_b AS DOUBLE) / (100.0 * n_b) - CAST(s_all AS DOUBLE) / (100.0 * n_all))"
    terms = rep.select(
        F.expr(f"CAST(ROUND({dev} * {dev}, 6) AS DECIMAL(38,6))").alias("term")
    )
    var_est = terms.agg(F.sum("term").alias("ss"))
    full_stats = wide.select("n_all", "s_all")
    mean_sql = "ROUND(CAST(s_all AS DOUBLE) / (100.0 * n_all), 6)"
    se_sql = f"ROUND(sqrt(CAST(ss AS DOUBLE) / {_B}), 6)"
    return (
        full_stats.crossJoin(F.broadcast(var_est))
        .select(
            F.col("n_all").alias("n_orders"),
            F.lit(_B).alias("n_replicates"),
            F.expr(mean_sql).alias("mean_total"),
            F.expr(se_sql).alias("se"),
            F.expr(f"ROUND({mean_sql} - 1.959964 * {se_sql}, 6)").alias("ci_lo"),
            F.expr(f"ROUND({mean_sql} + 1.959964 * {se_sql}, 6)").alias("ci_hi"),
        )
    )


# ---------------------------------------------------------------------------
# X-34: probabilistic-score calibration — Brier decomposition
# ---------------------------------------------------------------------------

_S_MAX = 1023  #: integer score domain 0..1023 -> p = s / 1023
_N_BINS = 10

#: integer score of a deterministic "model": 512 points if the order
#: predates 1995 (old orders are mostly status F, so the score has real
#: resolution), plus 9 md5 noise bits — a pure function of the row.
_SCORE = (
    "(({h} % 512) + CASE WHEN o_orderdate < DATE '1995-01-01' "
    "THEN 512 ELSE 0 END)"
)


@query(
    "q194_brier_calibration",
    oracle=f"""
    WITH scored AS (
        SELECT CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS y,
               {_SCORE.format(h=_H48.format(t="VARCHAR"))} AS s
        FROM orders
    ),
    binned AS (
        SELECT {_FLOORDIV_EVAL.format(x=f"s * {_N_BINS}", d=_S_MAX + 1)} AS bin,
               COUNT(*) AS n_k,
               CAST(SUM(y) AS BIGINT) AS sy_k,
               CAST(SUM(s) AS BIGINT) AS ss_k,
               CAST(SUM((s - {_S_MAX} * y) * (s - {_S_MAX} * y)) AS BIGINT) AS sq_k
        FROM scored GROUP BY 1
    ),
    tot AS (
        SELECT CAST(SUM(n_k) AS BIGINT) AS n,
               CAST(SUM(sy_k) AS BIGINT) AS y_tot,
               CAST(SUM(sq_k) AS BIGINT) AS sq
        FROM binned
    ),
    terms AS (
        SELECT
          CAST(ROUND(CAST(ss_k - {_S_MAX} * sy_k AS DOUBLE) * CAST(ss_k - {_S_MAX} * sy_k AS DOUBLE)
               / ({_S_MAX}.0 * {_S_MAX}.0 * CAST(n_k AS DOUBLE)), 9) AS DECIMAL(38,9)) AS rel_t,
          CAST(ROUND(n_k * (CAST(sy_k AS DOUBLE) / n_k - CAST(y_tot AS DOUBLE) / n)
               * (CAST(sy_k AS DOUBLE) / n_k - CAST(y_tot AS DOUBLE) / n), 9)
               AS DECIMAL(38,9)) AS res_t
        FROM binned CROSS JOIN tot
    ),
    parts AS (
        SELECT SUM(rel_t) AS rel_s, SUM(res_t) AS res_s FROM terms
    )
    SELECT n AS n_orders,
           y_tot AS n_positive,
           ROUND(CAST(sq AS DOUBLE) / ({_S_MAX}.0 * {_S_MAX}.0 * CAST(n AS DOUBLE)), 6) AS brier,
           ROUND(CAST(rel_s AS DOUBLE) / n, 6) AS reliability,
           ROUND(CAST(res_s AS DOUBLE) / n, 6) AS resolution,
           ROUND(CAST(y_tot * (n - y_tot) AS DOUBLE)
                 / (CAST(n AS DOUBLE) * n), 6) AS uncertainty
    FROM tot CROSS JOIN parts
    """,
    tags=("X-34", "X-23"),
)
def q194_brier_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brier-score calibration decomposition (Murphy 1973): a
    deterministic integer-scored "model" (s/1023, 512 points for
    pre-1995 orders + 9 md5 noise bits) predicts order status F; the
    mean squared error decomposes over 10 probability bins into
    RELIABILITY (calibration gap: predicted vs observed rate per bin),
    RESOLUTION (how far bin outcome rates spread from the base rate),
    and UNCERTAINTY (base-rate variance), with Brier = REL − RES + UNC
    up to rounding — the model-quality audit that separates "scores are
    miscalibrated" from "scores carry no signal", which a single
    accuracy number (the reference's promotion gate,
    train_retrain.py:38-63) cannot.

    Determinism: scores, labels, bins, the Brier numerator Σ(s−1023y)²
    and the reliability numerators are exact integers; per-bin terms
    round at 9 dp and sum as DECIMAL (order-independent); each output is
    ONE division rounded at 6 dp on identically-parenthesized operands.

    Scale shape: ONE fact scan, map-side combined onto the bounded
    10-bin relation (four integer partials per bin); totals derive from
    those 10 rows and broadcast back; everything after the first
    exchange is bounded arithmetic."""
    h = _H48.format(t="STRING")
    scored = load(spark, sf_dir, "orders").select(
        F.expr("CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END").alias("y"),
        F.expr(_SCORE.format(h=h)).alias("s"),
    )
    binned = stage(
        scored.groupBy(
            F.expr(
                _FLOORDIV_EVAL.format(x=f"s * {_N_BINS}", d=_S_MAX + 1)
            ).alias("bin")
        ).agg(
            F.count(F.lit(1)).alias("n_k"),
            F.sum("y").cast("long").alias("sy_k"),
            F.sum("s").cast("long").alias("ss_k"),
            F.expr(
                f"CAST(SUM((s - {_S_MAX} * y) * (s - {_S_MAX} * y)) AS BIGINT)"
            ).alias("sq_k"),
        )
    )
    tot = binned.agg(
        F.sum("n_k").cast("long").alias("n"),
        F.sum("sy_k").cast("long").alias("y_tot"),
        F.sum("sq_k").cast("long").alias("sq"),
    )
    terms = binned.crossJoin(F.broadcast(tot)).select(
        F.expr(
            f"CAST(ROUND(CAST(ss_k - {_S_MAX} * sy_k AS DOUBLE) * CAST(ss_k - {_S_MAX} * sy_k AS DOUBLE)"
            f" / ({_S_MAX}.0 * {_S_MAX}.0 * CAST(n_k AS DOUBLE)), 9) AS DECIMAL(38,9))"
        ).alias("rel_t"),
        F.expr(
            f"CAST(ROUND(n_k * (CAST(sy_k AS DOUBLE) / n_k - CAST(y_tot AS DOUBLE) / n)"
            f" * (CAST(sy_k AS DOUBLE) / n_k - CAST(y_tot AS DOUBLE) / n), 9)"
            f" AS DECIMAL(38,9))"
        ).alias("res_t"),
    )
    parts = terms.agg(F.sum("rel_t").alias("rel_s"), F.sum("res_t").alias("res_s"))
    return tot.crossJoin(F.broadcast(parts)).select(
        F.col("n").alias("n_orders"),
        F.col("y_tot").alias("n_positive"),
        F.expr(
            f"ROUND(CAST(sq AS DOUBLE) / ({_S_MAX}.0 * {_S_MAX}.0 * CAST(n AS DOUBLE)), 6)"
        ).alias("brier"),
        F.expr("ROUND(CAST(rel_s AS DOUBLE) / n, 6)").alias("reliability"),
        F.expr("ROUND(CAST(res_s AS DOUBLE) / n, 6)").alias("resolution"),
        F.expr(
            "ROUND(CAST(y_tot * (n - y_tot) AS DOUBLE) / (CAST(n AS DOUBLE) * n), 6)"
        ).alias("uncertainty"),
    )


# ---------------------------------------------------------------------------
# X-54: nearest-centroid classifier evaluation (confusion matrix + F1)
# ---------------------------------------------------------------------------

from ..functions.ordering import pin  # noqa: E402  (late import, module tail)

_NCQ = 10**6  #: component quantization: 1e-6 integers on the scan (q145 idiom)

_NC_ORACLE = f"""
    WITH flat AS (
        SELECT vec_id, label,
               CAST(u.i AS INTEGER) AS pos,
               CAST(ROUND(CAST(embedding[u.i + 1] AS DOUBLE) * {_NCQ}) AS BIGINT) AS qv
        FROM embeddings, UNNEST(range(0, len(embedding))) AS u(i)
    ),
    cent AS (
        SELECT label AS cl, pos, CAST(SUM(qv) AS BIGINT) AS s
        FROM flat GROUP BY label, pos
    ),
    cn AS (
        SELECT cl, SUM(CAST(s AS DECIMAL(19,0)) * CAST(s AS DECIMAL(19,0))) AS nc2
        FROM cent GROUP BY cl
    ),
    scores AS (
        SELECT f.vec_id, f.label, c.cl,
               SUM(CAST(f.qv AS DECIMAL(19,0)) * CAST(c.s AS DECIMAL(19,0))) AS dot
        FROM flat f JOIN cent c ON f.pos = c.pos
        GROUP BY f.vec_id, f.label, c.cl
    ),
    pred AS (
        SELECT vec_id, label, cl AS predicted FROM (
            SELECT s.vec_id, s.label, s.cl,
                   ROW_NUMBER() OVER (
                       PARTITION BY s.vec_id
                       ORDER BY CAST(s.dot AS DOUBLE) / sqrt(CAST(n.nc2 AS DOUBLE))
                                    DESC,
                                s.cl) AS rk
            FROM scores s JOIN cn n ON s.cl = n.cl
        ) WHERE rk = 1
    ),
    conf AS (
        SELECT label, predicted, CAST(COUNT(*) AS BIGINT) AS n
        FROM pred GROUP BY label, predicted
    ),
    per_true AS (
        SELECT label, CAST(SUM(n) AS BIGINT) AS support,
               CAST(SUM(CASE WHEN label = predicted THEN n ELSE 0 END) AS BIGINT)
                   AS tp
        FROM conf GROUP BY label
    ),
    per_pred AS (
        SELECT predicted, CAST(SUM(n) AS BIGINT) AS n_pred
        FROM conf GROUP BY predicted
    )
    SELECT t.label, support, tp,
           COALESCE(n_pred, 0) - tp AS fp,
           support - tp AS fn,
           CASE WHEN COALESCE(n_pred, 0) > 0
                THEN tp * 1000000000 // n_pred END AS precision_ppb,
           tp * 1000000000 // support AS recall_ppb,
           2 * tp * 1000000000 // (2 * tp + COALESCE(n_pred, 0) - tp + support - tp)
               AS f1_ppb
    FROM per_true t LEFT JOIN per_pred p ON t.label = p.predicted
    ORDER BY t.label
"""


@query("q250_nearest_centroid_eval", oracle=_NC_ORACLE, tags=("X-54", "X-03"))
def q250_nearest_centroid_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-centroid classifier evaluation: every embedding is scored
    against each label's centroid by cosine, assigned to the best, and the
    resulting confusion rolls up to per-class support / tp / fp / fn with
    precision, recall, and F1 as exact integer-ppb ratios — the standard
    separability scorecard for an embedding space (Rocchio
    resubstitution), and the per-class refinement of q232's scalar k-NN
    accuracy: it names WHICH classes bleed into which.

    Determinism: components quantize to 1e-6 integers on the scan (q145
    idiom) so centroid sums are exact int64 and dot/norm accumulations
    exact decimal(38,0); each candidate score dot/sqrt(nc2) is one IEEE
    division of bit-identical operands (the probe's own norm cancels
    across candidates and is never computed), and the argmax breaks exact
    ties by label.  F1 = 2tp/(2tp+fp+fn) needs only ONE integer
    floor-division.

    Scale shape: the centroid relation is bounded (labels x dims) and
    BROADCASTS to the component join; partial aggregation collapses each
    vector's 64 component-products per candidate before the exchange, so
    the only fact-sized shuffle carries N x L compact (vec, label, dot)
    rows; the argmax window spans L rows per vector; the confusion matrix
    and both rollups are bounded by L². IVF assignment (q46b) runs this
    exact dataflow — this query doubles as its accuracy audit."""
    emb = load(spark, sf_dir, "embeddings")
    flat = emb.select(
        "vec_id",
        "label",
        F.posexplode("embedding").alias("pos", "v"),
    ).select(
        "vec_id",
        "label",
        "pos",
        F.round(F.col("v").cast("double") * _NCQ).cast("long").alias("qv"),
    )
    cent = (
        flat.groupBy(F.col("label").alias("cl"), "pos")
        .agg(F.sum("qv").alias("s"))
        .transform(stage)  # bounded labels x dims; read by scores + norms
    )
    d19 = "decimal(19,0)"
    cn = cent.groupBy("cl").agg(
        F.sum(F.col("s").cast(d19) * F.col("s").cast(d19)).alias("nc2")
    )
    scores = (
        flat.join(F.broadcast(cent.select("cl", "pos", "s")), "pos")
        .groupBy("vec_id", "label", "cl")
        .agg(F.sum(F.col("qv").cast(d19) * F.col("s").cast(d19)).alias("dot"))
    )
    sc = F.col("dot").cast("double") / F.sqrt(F.col("nc2").cast("double"))
    rk = F.row_number().over(
        Window.partitionBy("vec_id").orderBy(sc.desc(), "cl")
    )
    pred = (
        scores.join(F.broadcast(cn), "cl")
        .withColumn("rk", rk)
        .filter(F.col("rk") == 1)
        .select("vec_id", "label", F.col("cl").alias("predicted"))
    )
    conf = pred.groupBy("label", "predicted").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    ).transform(stage)  # bounded L x L; read by both rollups
    per_true = conf.groupBy("label").agg(
        F.sum("n").cast("long").alias("support"),
        F.sum(F.when(F.col("label") == F.col("predicted"), F.col("n")).otherwise(0))
        .cast("long")
        .alias("tp"),
    )
    per_pred = conf.groupBy(F.col("predicted")).agg(
        F.sum("n").cast("long").alias("n_pred")
    )
    out = (
        per_true.join(
            F.broadcast(per_pred), per_true.label == per_pred.predicted, "left"
        )
        .withColumn("n_pred", F.coalesce(F.col("n_pred"), F.lit(0)))
        .select(
            "label",
            "support",
            "tp",
            (F.col("n_pred") - F.col("tp")).alias("fp"),
            (F.col("support") - F.col("tp")).alias("fn"),
            F.when(
                F.col("n_pred") > 0, F.expr("tp * 1000000000 DIV n_pred")
            ).alias("precision_ppb"),
            F.expr("tp * 1000000000 DIV support").alias("recall_ppb"),
            F.expr(
                "2 * tp * 1000000000 DIV (2 * tp + (n_pred - tp) + (support - tp))"
            ).alias("f1_ppb"),
        )
    )
    return out.transform(pin).orderBy("label")


# ---------------------------------------------------------------------------
# X-59: cluster-robust (delete-one-group jackknife) SE of a ratio metric
# ---------------------------------------------------------------------------

_JK_ORACLE = """
    WITH u AS (
        SELECT user_id,
               CAST(COUNT(*) AS BIGINT) AS x,
               CAST(SUM(CASE WHEN event_type = 'purchase'
                        THEN CAST(FLOOR(value * 100 + 0.5) AS BIGINT)
                        ELSE 0 END) AS BIGINT) AS y
        FROM events GROUP BY user_id
    ),
    tot AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(x) AS BIGINT) AS tx,
               CAST(SUM(y) AS BIGINT) AS ty
        FROM u
    ),
    r AS (
        SELECT n, tx, ty, (ty - y) * 1000000 // (tx - x) AS r
        FROM u CROSS JOIN tot
    ),
    s AS (
        SELECT n, tx, ty,
               CAST(SUM(r) AS BIGINT) AS sr,
               CAST(SUM(CAST(r AS HUGEINT) * r) AS HUGEINT) AS sr2
        FROM r GROUP BY n, tx, ty
    )
    SELECT n AS n_clusters, ty AS total_cents, tx AS total_events,
           CAST(ty AS DOUBLE) / tx AS ratio_cents_per_event,
           sqrt(CAST((n - 1) * (n * sr2 - CAST(sr AS HUGEINT) * sr) AS DOUBLE))
               / n / n / 1000000 AS jackknife_se_cents
    FROM s
"""


@query("q255_jackknife_ratio_se", oracle=_JK_ORACLE, tags=("X-59", "X-23"))
def q255_jackknife_ratio_se(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster-robust standard error of a ratio metric via the delete-one-
    group jackknife: the metric is revenue-per-event R = sum(y)/sum(x)
    clustered by USER, each leave-one-user-out replicate
    R_(i) = (Y-y_i)/(X-x_i) enters as an exact integer micro-ratio
    (floor-div — no float ever accumulates), and
    SE = sqrt((n-1)/n * sum (R_(i) - mean)^2) collapses to the exact
    integer form sqrt((n-1)(n*Sr2 - Sr^2))/n^2.  THE standard error every
    experimentation platform must use for per-event metrics — the naive
    iid SE is wrong because events cluster within users; q169/q189 handle
    per-USER binary metrics, this handles ratio-of-sums metrics.

    Scale shape: one user-keyed rollup (map-side combined), a single-row
    totals cross-broadcast back onto the bounded per-user relation, and
    ONE final single-row aggregate — the replicate loop that a naive
    implementation runs n times is algebraically collapsed into two
    integer moments.  Headroom: micro-ratio squares stay inside
    decimal(38,0)/HUGEINT up to ~1e9 clusters; Spark-side products ride
    the decimal(19,0) idiom.

    Determinism: every accumulated quantity is an exact integer; the two
    final operations (one sqrt, one division) run on bit-identical
    operands in both engines."""
    u = (
        load(spark, sf_dir, "events")
        .select(
            "user_id",
            F.when(
                F.col("event_type") == "purchase",
                F.floor(F.col("value") * 100 + 0.5).cast("long"),
            )
            .otherwise(0)
            .alias("cents"),
        )
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("x"),
            F.sum("cents").cast("long").alias("y"),
        )
        .transform(stage)  # totals + replicate scan both read it
    )
    tot = u.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("tx"),
        F.sum("y").cast("long").alias("ty"),
    )
    r = u.crossJoin(F.broadcast(tot)).select(
        "n", "tx", "ty", F.expr("(ty - y) * 1000000 DIV (tx - x)").alias("r")
    )
    s = r.groupBy("n", "tx", "ty").agg(
        F.sum("r").cast("long").alias("sr"),
        F.sum(F.col("r").cast("decimal(19,0)") * F.col("r").cast("decimal(19,0)"))
        .cast("decimal(38,0)")
        .alias("sr2"),
    )
    return s.select(
        F.col("n").alias("n_clusters"),
        F.col("ty").alias("total_cents"),
        F.col("tx").alias("total_events"),
        (F.col("ty").cast("double") / F.col("tx")).alias("ratio_cents_per_event"),
        (
            F.sqrt(
                F.expr(
                    "CAST((n - 1) * (n * sr2 - CAST(sr AS DECIMAL(19,0))"
                    " * CAST(sr AS DECIMAL(19,0))) AS DOUBLE)"
                )
            )
            / F.col("n")
            / F.col("n")
            / F.lit(1000000)
        ).alias("jackknife_se_cents"),
    )


# ---------------------------------------------------------------------------
# X-60: Simpson's-paradox audit (segmented vs pooled lift sign)
# ---------------------------------------------------------------------------

_SIMPSON_ORACLE = f"""
    WITH u AS (
        SELECT user_id, {_ARM_EXPR.format(t="VARCHAR")} AS arm,
               CAST(COUNT(*) AS BIGINT) AS c,
               MAX(CASE WHEN event_type = 'purchase' AND value > {_CONV_MIN}
                   THEN 1 ELSE 0 END) AS conv
        FROM events GROUP BY user_id
    ),
    edges AS (
        SELECT quantile_cont(c, CAST(1 AS DOUBLE) / 3) AS t1,
               quantile_cont(c, CAST(2 AS DOUBLE) / 3) AS t2
        FROM u
    ),
    seg AS (
        SELECT CASE WHEN c <= t1 THEN 'low'
                    WHEN c <= t2 THEN 'mid' ELSE 'high' END AS segment,
               arm, conv
        FROM u CROSS JOIN edges
    ),
    rows_all AS (
        SELECT segment,
               CAST(COUNT(CASE WHEN arm = 'a' THEN 1 END) AS BIGINT) AS users_a,
               CAST(SUM(CASE WHEN arm = 'a' THEN conv ELSE 0 END) AS BIGINT) AS conv_a,
               CAST(COUNT(CASE WHEN arm = 'b' THEN 1 END) AS BIGINT) AS users_b,
               CAST(SUM(CASE WHEN arm = 'b' THEN conv ELSE 0 END) AS BIGINT) AS conv_b
        FROM seg GROUP BY segment
        UNION ALL
        SELECT 'overall',
               CAST(COUNT(CASE WHEN arm = 'a' THEN 1 END) AS BIGINT),
               CAST(SUM(CASE WHEN arm = 'a' THEN conv ELSE 0 END) AS BIGINT),
               CAST(COUNT(CASE WHEN arm = 'b' THEN 1 END) AS BIGINT),
               CAST(SUM(CASE WHEN arm = 'b' THEN conv ELSE 0 END) AS BIGINT)
        FROM seg
    ),
    signed AS (
        SELECT *, CAST(sign(conv_a * users_b - conv_b * users_a) AS BIGINT)
                      AS lift_sign
        FROM rows_all
    ),
    flag AS (
        SELECT (o.lift_sign > 0 AND s.mx <= 0) OR (o.lift_sign < 0 AND s.mn >= 0)
                   AS paradox
        FROM (SELECT lift_sign FROM signed WHERE segment = 'overall') o,
             (SELECT MAX(lift_sign) AS mx, MIN(lift_sign) AS mn
              FROM signed WHERE segment <> 'overall') s
    )
    SELECT segment, users_a, conv_a, users_b, conv_b, lift_sign, paradox
    FROM signed CROSS JOIN flag
    ORDER BY segment
"""


@query("q258_simpsons_audit", oracle=_SIMPSON_ORACLE, tags=("X-60", "X-23", "A-12"))
def q258_simpsons_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Simpson's-paradox audit of an A/B conversion comparison: the pooled
    arm-lift sign beside the per-segment signs (segments = activity
    terciles of the users themselves), with a paradox flag when the
    pooled conclusion's sign is contradicted by EVERY segment — the
    classic aggregation trap (pooled 'B wins' while B loses in each
    stratum because arms are unevenly exposed across strata).  The audit
    every experiment readout should ship next to q169's z-score.

    Determinism: lift comparisons never divide — sign(conv_a*users_b -
    conv_b*users_a) is exact integer cross-multiplication, degenerate
    empty-arm segments yield sign 0 gracefully, and the tercile edges
    ride the A-12 exact-percentile path.

    Scale shape: one user-keyed rollup; the tercile edges are a
    single-row broadcast; segment/overall aggregates are 4 rows from one
    map-side-combined pass each, and the paradox flag is a cross-join of
    two single-row relations."""
    u = (
        load(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.expr(_ARM_EXPR.format(t="STRING")).alias("arm"),
            F.count(F.lit(1)).cast("long").alias("c"),
            F.max(
                F.when(
                    (F.col("event_type") == "purchase") & (F.col("value") > _CONV_MIN),
                    1,
                ).otherwise(0)
            ).alias("conv"),
        )
        .transform(stage)  # edges + both rollups read it
    )
    edges = u.agg(
        F.expr("percentile(c, CAST(1 AS DOUBLE) / 3)").alias("t1"),
        F.expr("percentile(c, CAST(2 AS DOUBLE) / 3)").alias("t2"),
    )
    seg = u.crossJoin(F.broadcast(edges)).select(
        F.when(F.col("c") <= F.col("t1"), "low")
        .when(F.col("c") <= F.col("t2"), "mid")
        .otherwise("high")
        .alias("segment"),
        "arm",
        "conv",
    )

    def _arm_rollup(df, label_col):
        return df.groupBy(label_col).agg(
            F.count(F.when(F.col("arm") == "a", 1)).cast("long").alias("users_a"),
            F.sum(F.when(F.col("arm") == "a", F.col("conv")).otherwise(0))
            .cast("long")
            .alias("conv_a"),
            F.count(F.when(F.col("arm") == "b", 1)).cast("long").alias("users_b"),
            F.sum(F.when(F.col("arm") == "b", F.col("conv")).otherwise(0))
            .cast("long")
            .alias("conv_b"),
        )

    seg = seg.transform(stage)  # segment + overall rollups share it
    per_seg = _arm_rollup(seg, "segment")
    overall = _arm_rollup(seg.withColumn("segment", F.lit("overall")), "segment")
    signed = per_seg.unionByName(overall).withColumn(
        "lift_sign",
        F.signum(
            (F.col("conv_a") * F.col("users_b") - F.col("conv_b") * F.col("users_a"))
            .cast("double")
        ).cast("long"),
    ).transform(stage)  # read by the flag relation and the output
    o = signed.filter(F.col("segment") == "overall").select(
        F.col("lift_sign").alias("so")
    )
    mm = signed.filter(F.col("segment") != "overall").agg(
        F.max("lift_sign").alias("mx"), F.min("lift_sign").alias("mn")
    )
    flag = o.crossJoin(mm).select(
        (
            ((F.col("so") > 0) & (F.col("mx") <= 0))
            | ((F.col("so") < 0) & (F.col("mn") >= 0))
        ).alias("paradox")
    )
    return (
        signed.crossJoin(F.broadcast(flag))
        .select(
            "segment", "users_a", "conv_a", "users_b", "conv_b", "lift_sign", "paradox"
        )
        .transform(pin)
        .orderBy("segment")
    )


# ---------------------------------------------------------------------------
# X-65: capture-recapture (Chapman) population estimate
# ---------------------------------------------------------------------------

_CR_THR = 100  #: a "capture" is a purchase over this value
_CR_SPLIT1 = "2024-01-06"  #: window A: before this day
_CR_SPLIT2 = "2024-01-11"  #: window B: [split1, split2)

_CHAPMAN_ORACLE = f"""
    WITH cap AS (
        SELECT user_id,
               MAX(CASE WHEN ts < TIMESTAMP '{_CR_SPLIT1}' THEN 1 ELSE 0 END) AS in_a,
               MAX(CASE WHEN ts >= TIMESTAMP '{_CR_SPLIT1}'
                         AND ts < TIMESTAMP '{_CR_SPLIT2}' THEN 1 ELSE 0 END) AS in_b
        FROM events
        WHERE event_type = 'purchase' AND value > {_CR_THR}
        GROUP BY user_id
    ),
    tru AS (SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_true FROM events),
    s AS (
        SELECT CAST(SUM(in_a) AS BIGINT) AS n_a,
               CAST(SUM(in_b) AS BIGINT) AS n_b,
               CAST(SUM(in_a * in_b) AS BIGINT) AS m
        FROM cap
    )
    SELECT n_a, n_b, m,
           (n_a + 1) * (n_b + 1) * 1000 // (m + 1) - 1000 AS chapman_milli,
           n_true
    FROM s CROSS JOIN tru
"""


@query("q260_capture_recapture", oracle=_CHAPMAN_ORACLE, tags=("X-65", "A-04"))
def q260_capture_recapture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Capture-recapture population estimate (Chapman's bias-corrected
    Lincoln-Petersen): two disjoint observation windows each "capture"
    the users making a qualifying purchase; the overlap m between the two
    capture sets yields N-hat = (nA+1)(nB+1)/(m+1) - 1, the mark-recapture
    estimator — the standard tool for "how many entities exist that BOTH
    our partial observations missed" (total-population sizing from
    incomplete logs, dark-traffic estimation, dedup-completeness audits).
    Reported beside the true distinct-user count so the estimator's bias
    under capture-dependence is visible in the same row (independence is
    the method's known assumption; repeat purchasers violate it here
    exactly as repeat-visible entities do in production).

    Determinism & scale shape: one filtered user rollup (predicate pushed
    to the scan), one 3-integer aggregate, the estimate as an exact
    integer milli-count floor-div, and the ground-truth distinct count as
    a second single-row leg cross-joined in — nothing but single-row
    relations after the first exchange."""
    ev = load(spark, sf_dir, "events")
    cap = (
        ev.filter((F.col("event_type") == "purchase") & (F.col("value") > _CR_THR))
        .groupBy("user_id")
        .agg(
            F.max(F.when(F.col("ts") < _CR_SPLIT1, 1).otherwise(0)).alias("in_a"),
            F.max(
                F.when(
                    (F.col("ts") >= _CR_SPLIT1) & (F.col("ts") < _CR_SPLIT2), 1
                ).otherwise(0)
            ).alias("in_b"),
        )
    )
    s = cap.agg(
        F.sum("in_a").cast("long").alias("n_a"),
        F.sum("in_b").cast("long").alias("n_b"),
        F.sum(F.col("in_a") * F.col("in_b")).cast("long").alias("m"),
    )
    tru = ev.agg(F.countDistinct("user_id").cast("long").alias("n_true"))
    return s.crossJoin(F.broadcast(tru)).select(
        "n_a",
        "n_b",
        "m",
        F.expr("(n_a + 1) * (n_b + 1) * 1000 DIV (m + 1) - 1000").alias(
            "chapman_milli"
        ),
        "n_true",
    )


# ---------------------------------------------------------------------------
# X-67: empirical-Bayes shrinkage of per-entity rates
# ---------------------------------------------------------------------------

_EB_ORACLE = f"""
    WITH u AS (
        SELECT user_id,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CASE WHEN event_type = 'purchase' AND value > {_CONV_MIN}
                        THEN 1 ELSE 0 END) AS BIGINT) AS s
        FROM events GROUP BY user_id
    ),
    r AS (SELECT user_id, n, s, s * 1000000 // n AS rm FROM u),
    pool AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS k,
               CAST(SUM(n) AS BIGINT) AS tn,
               CAST(SUM(s) AS BIGINT) AS ts,
               CAST(SUM(rm) AS BIGINT) AS sr,
               CAST(SUM(CAST(rm AS DECIMAL(19,0)) * CAST(rm AS DECIMAL(19,0)))
                    AS DECIMAL(38,0)) AS sr2
        FROM r
    ),
    prior AS (
        SELECT k, tn, ts, sr, sr2,
               CAST(ts AS DOUBLE) / tn AS pbar,
               CAST(k * sr2 - CAST(sr AS DECIMAL(19,0)) * sr AS DOUBLE)
                   / k / k / 1e12 AS var_rates
        FROM pool
    ),
    m AS (
        SELECT *, CASE WHEN var_rates > 0
                       THEN greatest(pbar * (1 - pbar) / var_rates - 1, 1.0)
                       END AS strength
        FROM prior
    )
    SELECT user_id, n AS n_trials, s AS successes, rm AS raw_ppm,
           ROUND(CAST(k * sr2 - CAST(sr AS DECIMAL(19,0)) * sr AS DOUBLE)
                 / k / k / 1e12, 9) AS var_rates,
           CASE WHEN strength IS NOT NULL
                THEN ROUND((s + strength * pbar) / (n + strength), 6) END
               AS shrunk_rate
    FROM r CROSS JOIN m
    ORDER BY user_id
"""


@query("q263_eb_shrinkage", oracle=_EB_ORACLE, tags=("X-67", "A-14"))
def q263_eb_shrinkage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Empirical-Bayes shrinkage of per-user conversion rates: every
    user's raw rate pulls toward the pooled mean with a data-estimated
    prior strength M = pbar(1-pbar)/var_between - 1 (beta-binomial method
    of moments, floored at 1), shrunk = (s + M*pbar)/(n + M).  THE fix
    for small-sample leaderboards — a 1/1 user no longer outranks a
    40/50 user — and the estimator behind every "adjusted rating".

    Determinism: per-user rates enter the between-variance as exact
    integer micro-rates (floor-div), the variance numerator is the exact
    integer k*Sr2 - Sr^2 (q255's two-moment collapse), and the pooled
    mean is a ratio of exact integers — so M and every shrunk rate are
    IEEE expressions on bit-identical operands, rounded for display
    only.

    Scale shape: one user-keyed rollup; prior estimation is ONE
    single-row aggregate over the bounded per-user relation,
    cross-broadcast back — two passes total, no window, no join wider
    than a single-row broadcast."""
    u = (
        load(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(
                F.when(
                    (F.col("event_type") == "purchase") & (F.col("value") > _CONV_MIN),
                    1,
                ).otherwise(0)
            )
            .cast("long")
            .alias("s"),
        )
        .withColumn("rm", F.expr("s * 1000000 DIV n"))
        .transform(stage)  # prior + per-user output read it
    )
    d19 = "decimal(19,0)"
    pool = u.agg(
        F.count(F.lit(1)).cast("long").alias("k"),
        F.sum("n").cast("long").alias("tn"),
        F.sum("s").cast("long").alias("ts"),
        F.sum("rm").cast("long").alias("sr"),
        F.sum(F.col("rm").cast(d19) * F.col("rm").cast(d19))
        .cast("decimal(38,0)")
        .alias("sr2"),
    )
    var_rates = (
        F.expr(f"CAST(k * sr2 - CAST(sr AS {d19}) * sr AS DOUBLE)")
        / F.col("k")
        / F.col("k")
        / F.lit(1e12)
    )
    pbar = F.col("ts").cast("double") / F.col("tn")
    m = pool.select(
        "k",
        "sr",
        "sr2",
        pbar.alias("pbar"),
        var_rates.alias("var_rates"),
        F.when(
            var_rates > 0, F.greatest(pbar * (1 - pbar) / var_rates - 1, F.lit(1.0))
        ).alias("strength"),
    )
    return (
        u.crossJoin(F.broadcast(m))
        .select(
            "user_id",
            F.col("n").alias("n_trials"),
            F.col("s").alias("successes"),
            F.col("rm").alias("raw_ppm"),
            F.round(F.col("var_rates"), 9).alias("var_rates"),
            F.when(
                F.col("strength").isNotNull(),
                F.round(
                    (F.col("s") + F.col("strength") * F.col("pbar"))
                    / (F.col("n") + F.col("strength")),
                    6,
                ),
            ).alias("shrunk_rate"),
        )
        .transform(pin)
        .orderBy("user_id")
    )


# ---------------------------------------------------------------------------
# X-71: difference-in-differences estimator on the hash-split panel
# ---------------------------------------------------------------------------

_DID_ORACLE = f"""
    WITH bounds AS (
        SELECT MIN(CAST(FLOOR(epoch(date_trunc('day', ts))) AS BIGINT) // 86400)
                   AS dmin,
               MAX(CAST(FLOOR(epoch(date_trunc('day', ts))) AS BIGINT) // 86400)
                   AS dmax
        FROM events
    ),
    cut AS (SELECT dmin + (dmax - dmin + 1) // 2 AS c FROM bounds),
    u AS (
        SELECT user_id, {_ARM_EXPR.format(t="VARCHAR")} AS arm,
               CAST(SUM(CASE WHEN CAST(FLOOR(epoch(date_trunc('day', ts)))
                                       AS BIGINT) // 86400 < c
                             AND event_type = 'purchase'
                        THEN CAST(FLOOR(value * 100 + 0.5) AS BIGINT)
                        ELSE 0 END) AS BIGINT) AS pre_cents,
               CAST(SUM(CASE WHEN CAST(FLOOR(epoch(date_trunc('day', ts)))
                                       AS BIGINT) // 86400 >= c
                             AND event_type = 'purchase'
                        THEN CAST(FLOOR(value * 100 + 0.5) AS BIGINT)
                        ELSE 0 END) AS BIGINT) AS post_cents,
               MAX(CASE WHEN CAST(FLOOR(epoch(date_trunc('day', ts)))
                                  AS BIGINT) // 86400 < c
                        THEN 1 ELSE 0 END) AS act_pre,
               MAX(CASE WHEN CAST(FLOOR(epoch(date_trunc('day', ts)))
                                  AS BIGINT) // 86400 >= c
                        THEN 1 ELSE 0 END) AS act_post
        FROM events CROSS JOIN cut
        GROUP BY 1, 2
    ),
    panel AS (
        SELECT arm, post_cents - pre_cents AS diff, pre_cents, post_cents
        FROM u WHERE act_pre = 1 AND act_post = 1
    ),
    cell AS (
        SELECT arm, CAST(COUNT(*) AS BIGINT) AS k,
               CAST(SUM(pre_cents) AS BIGINT) AS s_pre,
               CAST(SUM(post_cents) AS BIGINT) AS s_post,
               CAST(SUM(diff) AS BIGINT) AS s,
               CAST(SUM(CAST(diff AS DECIMAL(19,0)) * CAST(diff AS DECIMAL(19,0)))
                    AS DECIMAL(38,0)) AS s2
        FROM panel GROUP BY 1
    ),
    wide AS (
        SELECT MAX(CASE WHEN arm = 'a' THEN k END) AS n_a,
               MAX(CASE WHEN arm = 'b' THEN k END) AS n_b,
               MAX(CASE WHEN arm = 'a' THEN s_pre END) AS spre_a,
               MAX(CASE WHEN arm = 'a' THEN s_post END) AS spost_a,
               MAX(CASE WHEN arm = 'b' THEN s_pre END) AS spre_b,
               MAX(CASE WHEN arm = 'b' THEN s_post END) AS spost_b,
               MAX(CASE WHEN arm = 'a' THEN s END) AS s_a,
               MAX(CASE WHEN arm = 'b' THEN s END) AS s_b,
               MAX(CASE WHEN arm = 'a' THEN s2 END) AS s2_a,
               MAX(CASE WHEN arm = 'b' THEN s2 END) AS s2_b
        FROM cell
    ),
    est AS (
        SELECT n_a, n_b,
               ROUND(CAST(spre_a AS DOUBLE) / n_a, 6) AS pre_mean_a,
               ROUND(CAST(spost_a AS DOUBLE) / n_a, 6) AS post_mean_a,
               ROUND(CAST(spre_b AS DOUBLE) / n_b, 6) AS pre_mean_b,
               ROUND(CAST(spost_b AS DOUBLE) / n_b, 6) AS post_mean_b,
               CAST(s_b AS DOUBLE) / n_b - CAST(s_a AS DOUBLE) / n_a AS did,
               CAST(n_a * s2_a - CAST(s_a AS DECIMAL(19,0)) * s_a AS DOUBLE)
                   / n_a / n_a / (n_a - 1) AS var_a,
               CAST(n_b * s2_b - CAST(s_b AS DECIMAL(19,0)) * s_b AS DOUBLE)
                   / n_b / n_b / (n_b - 1) AS var_b
        FROM wide
    )
    SELECT n_a, n_b, pre_mean_a, post_mean_a, pre_mean_b, post_mean_b,
           ROUND(did, 6) AS did_cents,
           ROUND(sqrt(var_a + var_b), 6) AS se_cents,
           ROUND(did / sqrt(var_a + var_b), 6) AS t_stat
    FROM est
"""


@query("q267_did_estimator", oracle=_DID_ORACLE, tags=("X-71", "X-23", "X-16"))
def q267_did_estimator(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Difference-in-differences on the hash-split user panel: users
    active in BOTH halves of the event horizon (cut = midpoint day,
    derived from the data bounds) form a balanced panel; the estimate is
    the arm-B-minus-arm-A difference of mean per-user spend CHANGE
    (post minus pre purchase cents), with its two-sample standard error
    and t statistic — the parallel-trends causal readout that separates
    a treatment effect from a level difference, computed the paired way
    (per-user deltas, so within-user correlation nets out; q169's z-test
    is the cross-sectional special case).

    Determinism: per-user pre/post cents are exact integers, so each
    delta is an exact integer; per-arm variances collapse to the exact
    integer k*S2 - S^2 (the q255 idiom) with IEEE division; DiD, SE and
    t divide/root bit-identical operands and round at 6 dp.

    Scale shape: one single-row bounds aggregate cross-broadcast into
    the fact scan, ONE user-keyed rollup (map-side combined conditional
    sums), then ONE ungrouped conditional aggregate — ten integers cross
    the final exchange; arm assignment is map-only codegen."""
    ev = load(spark, sf_dir, "events")
    day = (F.unix_timestamp(F.date_trunc("day", F.col("ts"))) / F.lit(86400)).cast(
        "long"
    )
    bounds = ev.select(day.alias("d")).agg(
        (F.min("d") + ((F.max("d") - F.min("d") + 1) / 2).cast("long")).alias("c")
    )
    cents = F.floor(F.col("value") * 100 + 0.5).cast("long")
    is_pre = day < F.col("c")
    is_purch = F.col("event_type") == "purchase"
    u = (
        ev.crossJoin(F.broadcast(bounds))
        .groupBy("user_id")
        .agg(
            F.sum(F.when(is_pre & is_purch, cents).otherwise(0))
            .cast("long")
            .alias("pre_cents"),
            F.sum(F.when((~is_pre) & is_purch, cents).otherwise(0))
            .cast("long")
            .alias("post_cents"),
            F.max(F.when(is_pre, 1).otherwise(0)).alias("act_pre"),
            F.max(F.when(~is_pre, 1).otherwise(0)).alias("act_post"),
        )
    )
    panel = (
        u.filter((F.col("act_pre") == 1) & (F.col("act_post") == 1))
        .select(
            F.expr(_ARM_EXPR.format(t="string")).alias("arm"),
            "pre_cents",
            "post_cents",
            (F.col("post_cents") - F.col("pre_cents")).alias("diff"),
        )
    )
    d19 = "decimal(19,0)"

    def _arm(col, a):
        return F.max(F.when(F.col("arm") == a, F.col(col)))

    cell = panel.groupBy("arm").agg(
        F.count(F.lit(1)).cast("long").alias("k"),
        F.sum("pre_cents").cast("long").alias("s_pre"),
        F.sum("post_cents").cast("long").alias("s_post"),
        F.sum("diff").cast("long").alias("s"),
        F.sum(F.col("diff").cast(d19) * F.col("diff").cast(d19))
        .cast("decimal(38,0)")
        .alias("s2"),
    )
    wide = cell.agg(
        _arm("k", "a").alias("n_a"),
        _arm("k", "b").alias("n_b"),
        _arm("s_pre", "a").alias("spre_a"),
        _arm("s_post", "a").alias("spost_a"),
        _arm("s_pre", "b").alias("spre_b"),
        _arm("s_post", "b").alias("spost_b"),
        _arm("s", "a").alias("s_a"),
        _arm("s", "b").alias("s_b"),
        _arm("s2", "a").alias("s2_a"),
        _arm("s2", "b").alias("s2_b"),
    )
    did = F.col("s_b").cast("double") / F.col("n_b") - F.col("s_a").cast(
        "double"
    ) / F.col("n_a")
    var_a = (
        F.expr(f"CAST(n_a * s2_a - CAST(s_a AS {d19}) * s_a AS DOUBLE)")
        / F.col("n_a")
        / F.col("n_a")
        / (F.col("n_a") - 1)
    )
    var_b = (
        F.expr(f"CAST(n_b * s2_b - CAST(s_b AS {d19}) * s_b AS DOUBLE)")
        / F.col("n_b")
        / F.col("n_b")
        / (F.col("n_b") - 1)
    )
    return wide.select(
        "n_a",
        "n_b",
        F.round(F.col("spre_a").cast("double") / F.col("n_a"), 6).alias("pre_mean_a"),
        F.round(F.col("spost_a").cast("double") / F.col("n_a"), 6).alias("post_mean_a"),
        F.round(F.col("spre_b").cast("double") / F.col("n_b"), 6).alias("pre_mean_b"),
        F.round(F.col("spost_b").cast("double") / F.col("n_b"), 6).alias("post_mean_b"),
        F.round(did, 6).alias("did_cents"),
        F.round(F.sqrt(var_a + var_b), 6).alias("se_cents"),
        F.round(did / F.sqrt(var_a + var_b), 6).alias("t_stat"),
    )


# ---------------------------------------------------------------------------
# X-79: Mantel-Haenszel stratified odds ratio
# ---------------------------------------------------------------------------

_MH_ORACLE = f"""
    WITH u AS (
        SELECT user_id, {_ARM_EXPR.format(t="VARCHAR")} AS arm,
               CAST(COUNT(*) AS BIGINT) AS c,
               MAX(CASE WHEN event_type = 'purchase' AND value > {_CONV_MIN}
                   THEN 1 ELSE 0 END) AS conv
        FROM events GROUP BY user_id
    ),
    edges AS (
        SELECT quantile_cont(c, CAST(1 AS DOUBLE) / 3) AS t1,
               quantile_cont(c, CAST(2 AS DOUBLE) / 3) AS t2
        FROM u
    ),
    seg AS (
        SELECT CASE WHEN c <= t1 THEN 'low'
                    WHEN c <= t2 THEN 'mid' ELSE 'high' END AS stratum,
               arm, conv
        FROM u CROSS JOIN edges
    ),
    tab AS (
        SELECT stratum,
               CAST(SUM(CASE WHEN arm = 'a' THEN conv ELSE 0 END) AS BIGINT) AS a,
               CAST(SUM(CASE WHEN arm = 'a' THEN 1 - conv ELSE 0 END) AS BIGINT) AS b,
               CAST(SUM(CASE WHEN arm = 'b' THEN conv ELSE 0 END) AS BIGINT) AS c,
               CAST(SUM(CASE WHEN arm = 'b' THEN 1 - conv ELSE 0 END) AS BIGINT) AS d
        FROM seg GROUP BY stratum
    ),
    strat AS (
        SELECT stratum, a, b, c, d,
               CASE WHEN b * c > 0
                    THEN ROUND(CAST(a AS DOUBLE) * d / (CAST(b AS DOUBLE) * c), 6)
                    END AS odds_ratio
        FROM tab
    ),
    mh AS (
        SELECT CAST(SUM(a) AS BIGINT) AS a, CAST(SUM(b) AS BIGINT) AS b,
               CAST(SUM(c) AS BIGINT) AS c, CAST(SUM(d) AS BIGINT) AS d,
               CAST(SUM(CAST(ROUND(CAST(a AS DOUBLE) * d / (a + b + c + d), 9)
                             AS DECIMAL(28,9))) AS DOUBLE) AS r,
               CAST(SUM(CAST(ROUND(CAST(b AS DOUBLE) * c / (a + b + c + d), 9)
                             AS DECIMAL(28,9))) AS DOUBLE) AS s
        FROM tab
    )
    SELECT stratum, a AS conv_a, b AS noconv_a, c AS conv_b, d AS noconv_b,
           odds_ratio
    FROM strat
    UNION ALL
    SELECT 'pooled_mh', a, b, c, d, ROUND(r / s, 6) FROM mh
    ORDER BY stratum
"""


@query("q279_mantel_haenszel", oracle=_MH_ORACLE, tags=("X-79", "X-23", "A-12"))
def q279_mantel_haenszel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mantel-Haenszel stratified odds ratio: the A/B conversion 2x2
    table per activity tercile (the q258 strata), each stratum's odds
    ratio, and the MH pooled estimate sum(a_i*d_i/n_i)/sum(b_i*c_i/n_i)
    — the confounder-adjusted effect size that q258's sign-based
    Simpson audit flags but cannot QUANTIFY (MH weights strata by
    information instead of letting exposure imbalance distort the crude
    ratio; the epidemiology-standard companion to q169's z-test).

    Determinism: all eight cell counts are exact integers; stratum odds
    ratios divide exact-integer products once in IEEE; the MH terms
    a*d/n and b*c/n round at 9 dp into exact decimal sums (the q120
    idiom) with one final IEEE division, all rounded 6 dp.

    Scale shape: one user-keyed rollup (the q258 plan: edges as a
    single-row broadcast, segment rollup map-side combined onto 3
    strata); the MH pooling is one aggregate over those 3 rows."""
    u = (
        load(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.expr(_ARM_EXPR.format(t="STRING")).alias("arm"),
            F.count(F.lit(1)).cast("long").alias("c"),
            F.max(
                F.when(
                    (F.col("event_type") == "purchase") & (F.col("value") > _CONV_MIN),
                    1,
                ).otherwise(0)
            ).alias("conv"),
        )
        .transform(stage)  # edges + the stratum rollup read it
    )
    edges = u.agg(
        F.expr("percentile(c, CAST(1 AS DOUBLE) / 3)").alias("t1"),
        F.expr("percentile(c, CAST(2 AS DOUBLE) / 3)").alias("t2"),
    )
    seg = u.crossJoin(F.broadcast(edges)).select(
        F.when(F.col("c") <= F.col("t1"), "low")
        .when(F.col("c") <= F.col("t2"), "mid")
        .otherwise("high")
        .alias("stratum"),
        "arm",
        "conv",
    )
    tab = (
        seg.groupBy("stratum")
        .agg(
            F.sum(F.when(F.col("arm") == "a", F.col("conv")).otherwise(0))
            .cast("long")
            .alias("a"),
            F.sum(F.when(F.col("arm") == "a", 1 - F.col("conv")).otherwise(0))
            .cast("long")
            .alias("b"),
            F.sum(F.when(F.col("arm") == "b", F.col("conv")).otherwise(0))
            .cast("long")
            .alias("c"),
            F.sum(F.when(F.col("arm") == "b", 1 - F.col("conv")).otherwise(0))
            .cast("long")
            .alias("d"),
        )
        .transform(stage)  # stratum readout + MH pooling both read it
    )
    strat = tab.select(
        "stratum",
        F.col("a").alias("conv_a"),
        F.col("b").alias("noconv_a"),
        F.col("c").alias("conv_b"),
        F.col("d").alias("noconv_b"),
        F.when(
            F.col("b") * F.col("c") > 0,
            F.round(
                F.col("a").cast("double") * F.col("d")
                / (F.col("b").cast("double") * F.col("c")),
                6,
            ),
        ).alias("odds_ratio"),
    )
    n_i = F.col("a") + F.col("b") + F.col("c") + F.col("d")
    mh = tab.agg(
        F.sum("a").cast("long").alias("a"),
        F.sum("b").cast("long").alias("b"),
        F.sum("c").cast("long").alias("c"),
        F.sum("d").cast("long").alias("d"),
        F.sum(
            F.round(F.col("a").cast("double") * F.col("d") / n_i, 9).cast(
                "decimal(28,9)"
            )
        )
        .cast("double")
        .alias("r"),
        F.sum(
            F.round(F.col("b").cast("double") * F.col("c") / n_i, 9).cast(
                "decimal(28,9)"
            )
        )
        .cast("double")
        .alias("s"),
    ).select(
        F.lit("pooled_mh").alias("stratum"),
        F.col("a").alias("conv_a"),
        F.col("b").alias("noconv_a"),
        F.col("c").alias("conv_b"),
        F.col("d").alias("noconv_b"),
        F.round(F.col("r") / F.col("s"), 6).alias("odds_ratio"),
    )
    return strat.unionByName(mh).transform(pin).orderBy("stratum")


# ---------------------------------------------------------------------------
# X-34 (cont.): isotonic calibration via the exact minimax formula
# ---------------------------------------------------------------------------

_ISO_ORACLE = f"""
    WITH scored AS (
        SELECT CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS y,
               {_SCORE.format(h=_H48.format(t="VARCHAR"))} AS s
        FROM orders
    ),
    binned AS (
        SELECT {_FLOORDIV_EVAL.format(x=f"s * {_N_BINS}", d=_S_MAX + 1)} AS bin,
               CAST(COUNT(*) AS BIGINT) AS n_k,
               CAST(SUM(y) AS BIGINT) AS sy_k,
               CAST(SUM(s) AS BIGINT) AS ss_k
        FROM scored GROUP BY 1
    ),
    pre AS (
        SELECT bin, n_k, sy_k, ss_k,
               CAST(SUM(n_k) OVER (ORDER BY bin) AS BIGINT) AS pn,
               CAST(SUM(sy_k) OVER (ORDER BY bin) AS BIGINT) AS py
        FROM binned
    ),
    ranges AS (
        SELECT j.bin AS j, k.bin AS k,
               ROUND(CAST(k.py - j.py + j.sy_k AS DOUBLE)
                     / (k.pn - j.pn + j.n_k), 9) AS avg_jk
        FROM pre j JOIN pre k ON j.bin <= k.bin
    ),
    mins AS (
        SELECT r.j, i.bin AS i, MIN(r.avg_jk) AS m
        FROM ranges r JOIN pre i ON r.j <= i.bin AND i.bin <= r.k
        GROUP BY 1, 2
    ),
    iso AS (SELECT i AS bin, MAX(m) AS iso_rate FROM mins GROUP BY 1)
    SELECT p.bin, p.n_k AS n,
           ROUND(CAST(p.ss_k AS DOUBLE) / p.n_k / {_S_MAX}, 6) AS mean_score,
           ROUND(CAST(p.sy_k AS DOUBLE) / p.n_k, 6) AS raw_rate,
           ROUND(iso.iso_rate, 6) AS isotonic_rate
    FROM pre p JOIN iso USING (bin)
    ORDER BY p.bin
"""


@query("q286_isotonic_calibration", oracle=_ISO_ORACLE, tags=("X-34", "X-23"))
def q286_isotonic_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Isotonic calibration of the q194 score via the EXACT minimax
    identity: the pool-adjacent-violators fit at bin i equals
    max_(j<=i) min_(k>=i) weightedAvg(bins j..k) — computed in closed
    form over all O(B^3) range combinations of the {_N_BINS} score
    bins, so the usual data-dependent PAV merge loop (whose iteration
    count can't be unrolled) becomes three bounded relational steps.
    The monotone recalibration map every score-shipping model needs
    when q194 reports a reliability gap (raw bin rates may zig-zag;
    isotonic_rate is the best non-decreasing fit under squared loss).

    Determinism: bin counts and prefix sums are exact integers; each
    range average is ONE IEEE division rounded at 9 dp, and MIN/MAX
    over identical rounded doubles are engine-exact; readout rounds at
    6 dp.

    Scale shape: ONE fact scan map-side combined onto the {_N_BINS}
    bins; prefix sums, the range grid, the min-per-(j,i) rollup, and
    the max-per-i rollup all run on the bounded bin relation (10, 55,
    and 1000-row intermediates) — the fact is never rescanned."""
    h = _H48.format(t="STRING")
    scored = load(spark, sf_dir, "orders").select(
        F.expr("CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END").alias("y"),
        F.expr(_SCORE.format(h=h)).alias("s"),
    )
    binned = scored.groupBy(
        F.expr(_FLOORDIV_EVAL.format(x=f"s * {_N_BINS}", d=_S_MAX + 1)).alias("bin")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_k"),
        F.sum("y").cast("long").alias("sy_k"),
        F.sum("s").cast("long").alias("ss_k"),
    )
    w = Window.orderBy("bin")
    pre = binned.select(
        "bin",
        "n_k",
        "sy_k",
        "ss_k",
        F.sum("n_k").over(w).cast("long").alias("pn"),
        F.sum("sy_k").over(w).cast("long").alias("py"),
    ).transform(stage)  # ranges, the i-grid, and the readout all read it
    j = pre.select(
        F.col("bin").alias("j"),
        F.col("pn").alias("jpn"),
        F.col("py").alias("jpy"),
        F.col("n_k").alias("jn"),
        F.col("sy_k").alias("jsy"),
    )
    k = pre.select(
        F.col("bin").alias("k"), F.col("pn").alias("kpn"), F.col("py").alias("kpy")
    )
    ranges = j.join(F.broadcast(k), F.col("j") <= F.col("k")).select(
        "j",
        "k",
        F.round(
            (F.col("kpy") - F.col("jpy") + F.col("jsy")).cast("double")
            / (F.col("kpn") - F.col("jpn") + F.col("jn")),
            9,
        ).alias("avg_jk"),
    )
    i = pre.select(F.col("bin").alias("i"))
    mins = (
        ranges.join(
            F.broadcast(i), (F.col("j") <= F.col("i")) & (F.col("i") <= F.col("k"))
        )
        .groupBy("j", "i")
        .agg(F.min("avg_jk").alias("m"))
    )
    iso = mins.groupBy(F.col("i").alias("bin")).agg(F.max("m").alias("iso_rate"))
    return (
        pre.join(F.broadcast(iso), "bin")
        .select(
            "bin",
            F.col("n_k").alias("n"),
            F.round(F.col("ss_k").cast("double") / F.col("n_k") / _S_MAX, 6).alias(
                "mean_score"
            ),
            F.round(F.col("sy_k").cast("double") / F.col("n_k"), 6).alias("raw_rate"),
            F.round(F.col("iso_rate"), 6).alias("isotonic_rate"),
        )
        .transform(pin)
        .orderBy("bin")
    )


# ---------------------------------------------------------------------------
# X-79 (cont.): overdispersion test + negative-binomial fit
# ---------------------------------------------------------------------------

_NB_TYPES = ("click", "error", "purchase", "signup", "view")

_NB_ORACLE = f"""
    WITH u AS (
        SELECT user_id,
               {", ".join(f"CAST(SUM(CASE WHEN event_type = '{t}' THEN 1 ELSE 0 END) AS BIGINT) AS c_{t}" for t in _NB_TYPES)}
        FROM events GROUP BY user_id
    ),
    longf AS (
        {" UNION ALL ".join(f"SELECT '{t}' AS event_type, c_{t} AS c FROM u" for t in _NB_TYPES)}
    ),
    m AS (
        SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(c) AS BIGINT) AS s,
               CAST(SUM(CAST(c AS DECIMAL(19,0)) * CAST(c AS DECIMAL(19,0)))
                    AS DECIMAL(38,0)) AS s2
        FROM longf GROUP BY 1
    ),
    est AS (
        SELECT event_type, n,
               CAST(s AS DOUBLE) / n AS mean_c,
               CAST(n * s2 - CAST(s AS DECIMAL(19,0)) * s AS DOUBLE)
                   / n / (n - 1) / n AS var_c
        FROM m WHERE n >= 2
    )
    SELECT event_type, n AS n_users,
           ROUND(mean_c, 6) AS mean_events,
           ROUND(var_c, 6) AS var_events,
           ROUND(var_c / mean_c, 6) AS dispersion,
           CASE WHEN var_c > mean_c
                THEN ROUND(mean_c * mean_c / (var_c - mean_c), 6) END AS nb_r,
           CASE WHEN var_c > mean_c
                THEN ROUND(mean_c / var_c, 6) END AS nb_p
    FROM est ORDER BY event_type
"""


@query("q293_nb_overdispersion", oracle=_NB_ORACLE, tags=("X-79", "A-14"))
def q293_nb_overdispersion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overdispersion test + negative-binomial fit of per-user event
    counts: per type, the variance-to-mean dispersion index (Poisson
    predicts exactly 1; user heterogeneity pushes it above) and the NB
    method-of-moments parameters r = m^2/(v-m), p = m/v when
    overdispersed — the count-model selection step before any rate
    forecast or anomaly threshold (a Poisson threshold on overdispersed
    counts fires constantly; q261's burstiness is the within-user TIME
    version, this is the across-user COUNT version). Zero counts are
    INCLUDED: one user rollup holds all per-type conditional counts, so
    a user with no clicks contributes c=0 to the click moments.

    Determinism: per-user counts are exact integers; variance is the
    exact k*S2-S^2 collapse with fixed division order; every readout is
    IEEE on bit-identical operands rounded 6 dp.

    Scale shape: ONE user-keyed rollup (5 conditional counts, map-side
    combined), a map-only unpivot, and a per-type moment rollup onto 5
    rows — the A-14 mergeable shape; no join anywhere."""
    u = (
        load(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            *[
                F.sum(F.when(F.col("event_type") == t, 1).otherwise(0))
                .cast("long")
                .alias(f"c_{t}")
                for t in _NB_TYPES
            ]
        )
    )
    stack_expr = "stack({n}, {args}) AS (event_type, c)".format(
        n=len(_NB_TYPES),
        args=", ".join(f"'{t}', c_{t}" for t in _NB_TYPES),
    )
    longf = u.select(F.expr(stack_expr))
    d19 = "decimal(19,0)"
    m = longf.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("c").cast("long").alias("s"),
        F.sum(F.col("c").cast(d19) * F.col("c").cast(d19))
        .cast("decimal(38,0)")
        .alias("s2"),
    )
    mean_c = F.col("s").cast("double") / F.col("n")
    var_c = (
        F.expr(f"CAST(n * s2 - CAST(s AS {d19}) * s AS DOUBLE)")
        / F.col("n")
        / (F.col("n") - 1)
        / F.col("n")
    )
    est = m.filter(F.col("n") >= 2).select(
        "event_type", "n", mean_c.alias("mean_c"), var_c.alias("var_c")
    )
    over = F.col("var_c") > F.col("mean_c")
    return (
        est.select(
            "event_type",
            F.col("n").alias("n_users"),
            F.round("mean_c", 6).alias("mean_events"),
            F.round("var_c", 6).alias("var_events"),
            F.round(F.col("var_c") / F.col("mean_c"), 6).alias("dispersion"),
            F.when(
                over,
                F.round(
                    F.col("mean_c") * F.col("mean_c")
                    / (F.col("var_c") - F.col("mean_c")),
                    6,
                ),
            ).alias("nb_r"),
            F.when(over, F.round(F.col("mean_c") / F.col("var_c"), 6)).alias("nb_p"),
        )
        .transform(pin)
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# X-59 (cont.): one-pass Poisson bootstrap SE of total revenue
# ---------------------------------------------------------------------------

_BOOT_B = 64  #: bootstrap replicas — fan-out factor of the ONE weighted pass

#: Poisson(1) CDF breakpoints scaled to the 48-bit hash domain
#: (floor(cdf_k * 2^48), Python-precomputed so both engines compare the
#: SAME exact integers; P(w > 8) < 1.1e-5 truncates to w = 8 identically).
_POIS1_T48 = (
    103548857136060,
    207097714272121,
    258872142840152,
    276130285696162,
    280444821410164,
    281307728552965,
    281451546410098,
    281472091818260,
)


def _pois1_case(h: str) -> str:
    arms = " ".join(
        f"WHEN {h} < {t} THEN {k}" for k, t in enumerate(_POIS1_T48)
    )
    return f"CASE {arms} ELSE 8 END"


_BOOT_ORACLE = f"""
    WITH u AS (
        SELECT user_id,
               CAST(SUM(CASE WHEN event_type = 'purchase'
                        THEN CAST(FLOOR(value * 100 + 0.5) AS BIGINT)
                        ELSE 0 END) AS BIGINT) AS cents
        FROM events GROUP BY user_id
    ),
    rep AS (
        SELECT u.user_id, u.cents, t.r,
               CAST(('0x' || substr(md5('boot:' || CAST(u.user_id AS VARCHAR)
                                        || ':' || CAST(t.r AS VARCHAR)), 1, 15))
                    AS BIGINT) % {1 << 48} AS h48
        FROM u CROSS JOIN (SELECT unnest(range(0, {_BOOT_B})) AS r) t
    ),
    tr AS (
        SELECT r, SUM(CAST({_pois1_case("h48")} AS HUGEINT) * cents) AS t_total
        FROM rep GROUP BY r
    ),
    mom AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS b,
               SUM(t_total) AS s1,
               SUM(t_total * t_total) AS s2
        FROM tr
    ),
    act AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
               CAST(SUM(cents) AS BIGINT) AS total_cents
        FROM u
    )
    SELECT a.n_users, a.total_cents,
           CAST(m.s1 AS DOUBLE) / {_BOOT_B} AS boot_mean_cents,
           sqrt(CAST({_BOOT_B} * m.s2 - m.s1 * m.s1 AS DOUBLE)
                / {_BOOT_B} / {_BOOT_B - 1} / {_BOOT_B}) AS boot_se_cents,
           sqrt(CAST({_BOOT_B} * m.s2 - m.s1 * m.s1 AS DOUBLE)
                / {_BOOT_B} / {_BOOT_B - 1} / {_BOOT_B})
               / (CAST(m.s1 AS DOUBLE) / {_BOOT_B}) AS rel_se
    FROM act a, mom m
"""


@query("q294_poisson_bootstrap_se", oracle=_BOOT_ORACLE, tags=("X-59", "X-16"))
def q294_poisson_bootstrap_se(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-pass Poisson bootstrap SE of total purchase revenue with the
    USER as the resampling unit: each of B=64 replicas reweights every
    user's revenue by an iid Poisson(1) draw (the large-N limit of
    multinomial resampling), and the replica spread is the bootstrap SE
    — the third leg of the resampling triad (q255 delete-one jackknife,
    q193 half-sample CI), and THE at-scale form: no statistic recompute
    per replica, just one weighted pass with a B-way map-side fan-out.
    Cluster (per-user) resampling keeps within-user correlation intact,
    exactly like q255's cluster jackknife.

    Determinism: the Poisson draw is inverse-CDF on the exact integer
    48-bit md5 hash against Python-precomputed integer breakpoints — no
    RNG, no float compare; replica totals and both moments are exact
    integer sums; readouts are raw doubles from fixed-order IEEE on
    bit-identical operands (sqrt is IEEE-correctly-rounded).

    Scale shape: ONE user-keyed fact rollup, a map-only 64x fan-out of
    the (user, cents) relation, and a 64-group map-side-combined rollup;
    the moment collapse runs on 64 rows. At 100 TB the fan-out is the
    only multiplier and it rides the rollup, never the fact table.

    Reference parity: beyond-reference capability (the reference stack
    has no uncertainty quantification at all)."""
    u = (
        load(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.sum(
                F.when(
                    F.col("event_type") == "purchase",
                    F.floor(F.col("value") * 100 + 0.5).cast("long"),
                ).otherwise(0)
            )
            .cast("long")
            .alias("cents")
        )
        .transform(stage)  # actual total + the 64-replica fan-out share it
    )
    rep = u.select(
        "user_id",
        "cents",
        F.explode(F.sequence(F.lit(0), F.lit(_BOOT_B - 1))).alias("r"),
    ).select(
        "cents",
        "r",
        (
            F.conv(
                F.substring(
                    F.md5(
                        F.concat(
                            F.lit("boot:"),
                            F.col("user_id").cast("string"),
                            F.lit(":"),
                            F.col("r").cast("string"),
                        )
                    ),
                    1,
                    15,
                ),
                16,
                10,
            ).cast("long")
            % (1 << 48)
        ).alias("h48"),
    )
    tr = (
        rep.select(
            "r",
            (F.expr(_pois1_case("h48")).cast("decimal(20,0)") * F.col("cents"))
            .cast("decimal(38,0)")
            .alias("wc"),
        )
        .groupBy("r")
        .agg(F.sum("wc").cast("decimal(38,0)").alias("t_total"))
    )
    mom = tr.agg(
        F.sum("t_total").cast("decimal(38,0)").alias("s1"),
        F.sum(F.col("t_total") * F.col("t_total"))
        .cast("decimal(38,0)")
        .alias("s2"),
    )
    act = u.agg(
        F.count(F.lit(1)).cast("long").alias("n_users"),
        F.sum("cents").cast("long").alias("total_cents"),
    )
    b = F.lit(_BOOT_B)
    mean = F.col("s1").cast("double") / b
    se = F.sqrt(
        (b.cast("decimal(20,0)") * F.col("s2") - F.col("s1") * F.col("s1"))
        .cast("double")
        / b
        / F.lit(_BOOT_B - 1)
        / b
    )
    return act.crossJoin(F.broadcast(mom)).select(
        "n_users",
        "total_cents",
        mean.alias("boot_mean_cents"),
        se.alias("boot_se_cents"),
        (se / mean).alias("rel_se"),
    )


# ---------------------------------------------------------------------------
# X-90: off-policy evaluation (IPS / SNIPS) of a targeting rule
# ---------------------------------------------------------------------------

_OPE_ORACLE = f"""
    WITH u AS (
        SELECT user_id,
               {_ARM_EXPR.format(t="VARCHAR")} AS logged_arm,
               CAST(COUNT(*) AS BIGINT) AS n_ev,
               MAX(CASE WHEN event_type = 'purchase' AND value > {_CONV_MIN}
                   THEN 1 ELSE 0 END) AS r
        FROM events GROUP BY user_id
    ),
    pol AS (
        SELECT user_id, logged_arm, r,
               CASE WHEN n_ev >= 16 THEN 'a' ELSE 'b' END AS target_arm
        FROM u
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
           CAST(SUM(CASE WHEN logged_arm = target_arm THEN 1 ELSE 0 END)
                AS BIGINT) AS n_matched,
           CAST(SUM(CASE WHEN logged_arm = target_arm THEN r ELSE 0 END)
                AS BIGINT) AS matched_reward,
           CAST(SUM(r) AS DOUBLE) / COUNT(*) AS v_logged,
           2 * CAST(SUM(CASE WHEN logged_arm = target_arm THEN r ELSE 0 END)
                    AS DOUBLE) / COUNT(*) AS v_ips,
           CASE WHEN SUM(CASE WHEN logged_arm = target_arm THEN 1 ELSE 0 END) > 0
                THEN CAST(SUM(CASE WHEN logged_arm = target_arm THEN r ELSE 0 END)
                          AS DOUBLE)
                     / SUM(CASE WHEN logged_arm = target_arm THEN 1 ELSE 0 END)
           END AS v_snips,
           CAST(SUM(CASE WHEN logged_arm = target_arm THEN 1 ELSE 0 END)
                AS DOUBLE) / COUNT(*) AS match_rate
    FROM pol
"""


@query("q300_offpolicy_ips", oracle=_OPE_ORACLE, tags=("X-90", "X-23"))
def q300_offpolicy_ips(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Off-policy evaluation of a deterministic targeting rule ('treat
    heavy users: arm a iff activity >= 16') from logged randomized
    exposure: the IPS estimate V(pi) = mean(1{logged=pi(u)} * r / 0.5)
    and its self-normalized SNIPS variant, next to the logged policy's
    value — the counterfactual 'what would this rule have earned'
    readout every experimentation platform needs BEFORE shipping a
    targeting change, computed from the same md5-randomized arms as
    q169's A/B test (known propensity 0.5 per arm makes the importance
    weight an exact constant 2).

    Determinism: arms are the X-23 md5-nibble assignment (RNG-free);
    match indicators, rewards, and all sums are exact integers; the
    four value readouts are raw-double IEEE divisions on bit-identical
    operands.

    Scale shape: ONE user-keyed fact rollup and one ungrouped
    5-aggregate readout — the A-14 mergeable shape; the policy rule is
    a map-only CASE.

    Reference parity: beyond-reference (the reference has no
    counterfactual evaluation surface)."""
    u = (
        load(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_ev"),
            F.max(
                F.when(
                    (F.col("event_type") == "purchase")
                    & (F.col("value") > _CONV_MIN),
                    1,
                ).otherwise(0)
            ).alias("r"),
        )
        .select(
            F.expr(_ARM_EXPR.format(t="STRING")).alias("logged_arm"),
            F.when(F.col("n_ev") >= 16, "a").otherwise("b").alias("target_arm"),
            "r",
        )
    )
    m = F.when(F.col("logged_arm") == F.col("target_arm"), 1).otherwise(0)
    mr = F.when(F.col("logged_arm") == F.col("target_arm"), F.col("r")).otherwise(0)
    n = F.count(F.lit(1))
    return u.agg(
        n.cast("long").alias("n_users"),
        F.sum(m).cast("long").alias("n_matched"),
        F.sum(mr).cast("long").alias("matched_reward"),
        (F.sum("r").cast("double") / n).alias("v_logged"),
        (F.lit(2) * F.sum(mr).cast("double") / n).alias("v_ips"),
        F.when(F.sum(m) > 0, F.sum(mr).cast("double") / F.sum(m)).alias("v_snips"),
        (F.sum(m).cast("double") / n).alias("match_rate"),
    )


# ---------------------------------------------------------------------------
# X-92: distribution-free median CI by order statistics
# ---------------------------------------------------------------------------

_Z95 = 1.959964  #: pinned literal — no libm inverse-CDF in either engine
_MCI_BUCKET = 1000  #: cents bucket width for the two-level prefix sum

_MCI_ORACLE = f"""
    WITH u AS (
        SELECT user_id,
               CAST(SUM(CASE WHEN event_type = 'purchase'
                        THEN CAST(FLOOR(value * 100 + 0.5) AS BIGINT)
                        ELSE 0 END) AS BIGINT) AS cents
        FROM events GROUP BY user_id
    ),
    va AS (
        SELECT cents, CAST(COUNT(*) AS BIGINT) AS cnt FROM u GROUP BY cents
    ),
    cum AS (
        SELECT cents,
               CAST(SUM(cnt) OVER (ORDER BY cents) AS BIGINT) AS c
        FROM va
    ),
    nn AS (SELECT CAST(SUM(cnt) AS BIGINT) AS n FROM va),
    rk AS (
        SELECT n,
               GREATEST(1, CAST(FLOOR((n - {_Z95} * sqrt(CAST(n AS DOUBLE))) / 2)
                                AS BIGINT)) AS lo_rank,
               LEAST(n, CAST(CEIL((n + {_Z95} * sqrt(CAST(n AS DOUBLE))) / 2) + 1
                             AS BIGINT)) AS hi_rank,
               (n + 1) // 2 AS m1, n // 2 + 1 AS m2
        FROM nn
    )
    SELECT r.n AS n_users, r.lo_rank, r.hi_rank,
           CAST(MIN(CASE WHEN c.c >= r.lo_rank THEN c.cents END) AS BIGINT)
               AS ci_lo_cents,
           CAST(MIN(CASE WHEN c.c >= r.hi_rank THEN c.cents END) AS BIGINT)
               AS ci_hi_cents,
           (CAST(MIN(CASE WHEN c.c >= r.m1 THEN c.cents END) AS DOUBLE)
            + MIN(CASE WHEN c.c >= r.m2 THEN c.cents END)) / 2 AS median_cents
    FROM cum c, rk r
    GROUP BY r.n, r.lo_rank, r.hi_rank
"""


@query("q302_median_ci", oracle=_MCI_ORACLE, tags=("X-92", "A-12"))
def q302_median_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-free 95% confidence interval for the MEDIAN of
    per-user purchase revenue, by the binomial order-statistic bound:
    the interval [X_(l), X_(u)] with l = floor((n - z*sqrt(n))/2),
    u = ceil((n + z*sqrt(n))/2) + 1 covers the true median with >= 95%
    probability under NO distributional assumption — the uncertainty
    companion A-12's point percentiles lack (a median without a CI is
    uninterpretable across cohorts of different sizes), and the
    rank-based sibling of q255/q294's moment-based SEs, valid where
    means fail (heavy-tailed revenue).

    Determinism: order statistics select by 'min value whose cumulative
    count reaches rank k' on exact integers; the ranks derive from one
    IEEE sqrt on bit-identical n with a pinned z literal, through
    floor/ceil (exact on identical doubles). The only readout double is
    the even-n median midpoint.

    Scale shape: user rollup, value rollup, and the q84/q148 TWO-LEVEL
    bucketed prefix sum for cumulative counts (no single-partition
    window over the distinct-value set); rank selection is conditional
    aggregation over that relation.

    Reference parity: beyond-reference (no uncertainty quantification
    in the reference)."""
    u = (
        load(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.sum(
                F.when(
                    F.col("event_type") == "purchase",
                    F.floor(F.col("value") * 100 + 0.5).cast("long"),
                ).otherwise(0)
            )
            .cast("long")
            .alias("cents")
        )
    )
    va = (
        u.groupBy("cents")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
        .withColumn("bucket", F.floor(F.col("cents") / _MCI_BUCKET))
        .transform(stage)  # within-bucket scan + bucket totals share it
    )
    wb = (
        Window.partitionBy("bucket")
        .orderBy("cents")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    within = va.select(
        "bucket", "cents", F.sum("cnt").over(wb).alias("wc")
    )
    btot = va.groupBy("bucket").agg(F.sum("cnt").alias("bc"))
    offs = btot.select(
        "bucket",
        F.sum("bc")
        .over(
            Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, -1)
        )
        .alias("off"),
    )
    nn = va.agg(F.sum("cnt").cast("long").alias("n"))
    zr = F.lit(_Z95) * F.sqrt(F.col("n").cast("double"))
    rk = nn.select(
        "n",
        F.greatest(
            F.lit(1).cast("long"),
            F.floor((F.col("n") - zr) / 2).cast("long"),
        ).alias("lo_rank"),
        F.least(
            F.col("n"),
            (F.ceil((F.col("n") + zr) / 2) + 1).cast("long"),
        ).alias("hi_rank"),
        F.expr("(n + 1) div 2").alias("m1"),
        F.expr("n div 2 + 1").alias("m2"),
    )
    cum = (
        within.join(F.broadcast(offs), "bucket")
        .select(
            "cents",
            (F.coalesce("off", F.lit(0)) + F.col("wc")).cast("long").alias("c"),
        )
        .crossJoin(F.broadcast(rk))
    )

    def pick(rank_col: str):
        return F.min(F.when(F.col("c") >= F.col(rank_col), F.col("cents")))

    return cum.groupBy("n", "lo_rank", "hi_rank").agg(
        pick("lo_rank").cast("long").alias("ci_lo_cents"),
        pick("hi_rank").cast("long").alias("ci_hi_cents"),
        (
            (pick("m1").cast("double") + pick("m2")) / 2
        ).alias("median_cents"),
    ).select(
        F.col("n").alias("n_users"),
        "lo_rank",
        "hi_rank",
        "ci_lo_cents",
        "ci_hi_cents",
        "median_cents",
    )


# ---------------------------------------------------------------------------
# X-101: always-valid sequential A/B monitoring (mSPRT)
# ---------------------------------------------------------------------------

_MSPRT_TAU = 0.0001  #: mixture variance of the mSPRT prior, pinned literal

_MSPRT_ORACLE = f"""
    WITH u AS (
        SELECT user_id, {_ARM_EXPR.format(t="VARCHAR")} AS arm,
               CAST(MIN(FLOOR(epoch(date_trunc('day', ts))) // 86400) AS BIGINT)
                   AS d0,
               MAX(CASE WHEN event_type = 'purchase' AND value > {_CONV_MIN}
                   THEN 1 ELSE 0 END) AS conv
        FROM events GROUP BY user_id
    ),
    byday AS (
        SELECT d0 AS d,
               CAST(SUM(CASE WHEN arm = 'a' THEN 1 ELSE 0 END) AS BIGINT) AS ua,
               CAST(SUM(CASE WHEN arm = 'a' THEN conv ELSE 0 END) AS BIGINT) AS ca,
               CAST(SUM(CASE WHEN arm = 'b' THEN 1 ELSE 0 END) AS BIGINT) AS ub,
               CAST(SUM(CASE WHEN arm = 'b' THEN conv ELSE 0 END) AS BIGINT) AS cb
        FROM u GROUP BY d0
    ),
    cum AS (
        SELECT d,
               CAST(SUM(ua) OVER w AS BIGINT) AS na,
               CAST(SUM(ca) OVER w AS BIGINT) AS xa,
               CAST(SUM(ub) OVER w AS BIGINT) AS nb,
               CAST(SUM(cb) OVER w AS BIGINT) AS xb
        FROM byday
        WINDOW w AS (ORDER BY d ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    ),
    lam AS (
        SELECT d, na, xa, nb, xb,
               CASE WHEN na = 0 OR nb = 0
                         OR xa + xb = 0 OR xa + xb = na + nb THEN 1.0
                    ELSE sqrt(
                        (CAST(xa + xb AS DOUBLE) / (na + nb)
                         * (1 - CAST(xa + xb AS DOUBLE) / (na + nb))
                         * (1.0 / na + 1.0 / nb))
                        / (CAST(xa + xb AS DOUBLE) / (na + nb)
                           * (1 - CAST(xa + xb AS DOUBLE) / (na + nb))
                           * (1.0 / na + 1.0 / nb) + {_MSPRT_TAU}))
                    * exp(
                        (CAST(xa AS DOUBLE) / na - CAST(xb AS DOUBLE) / nb)
                        * (CAST(xa AS DOUBLE) / na - CAST(xb AS DOUBLE) / nb)
                        * {_MSPRT_TAU}
                        / (2 * (CAST(xa + xb AS DOUBLE) / (na + nb)
                                * (1 - CAST(xa + xb AS DOUBLE) / (na + nb))
                                * (1.0 / na + 1.0 / nb))
                           * ((CAST(xa + xb AS DOUBLE) / (na + nb)
                               * (1 - CAST(xa + xb AS DOUBLE) / (na + nb))
                               * (1.0 / na + 1.0 / nb)) + {_MSPRT_TAU})))
               END AS lam
        FROM cum
    )
    SELECT d AS day, na AS n_a, xa AS conv_a, nb AS n_b, xb AS conv_b,
           1 / lam AS inv_lambda,
           MIN(LEAST(1 / lam, 1.0)) OVER
               (ORDER BY d ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS always_valid_p
    FROM lam
    ORDER BY day
"""


@query("q311_msprt_monitor", oracle=_MSPRT_ORACLE, tags=("X-101", "X-23"))
def q311_msprt_monitor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Always-valid sequential A/B monitoring by the mixture SPRT: for
    every day of the experiment, the mSPRT likelihood ratio of the
    two-proportion difference (normal approximation, mixture prior
    tau^2) and the running always-valid p-value min(1, 1/Lambda) — the
    peeking-safe monitor that lets an experimenter look EVERY day
    without inflating false positives, which q169's fixed-horizon
    z-test forbids. Users enter on their first active day; arms are the
    same md5 assignment as q169, so this is literally q169's experiment
    under continuous monitoring.

    Determinism: cumulative counts are exact integers via a running
    window over the bounded daily relation; each day's Lambda is one
    fixed-shape IEEE expression (sqrt/exp on bit-identical operands;
    degenerate days pinned to Lambda=1); the always-valid p is a
    RUNNING MIN — min is exactly associative/commutative on doubles, so
    unlike a float sum it has no ordering hazard.

    Scale shape: one user rollup, one rollup to the bounded daily
    relation, and windows on that bounded relation only.

    Reference parity: beyond-reference; completes the X-23/X-101
    experimentation family with sequential inference."""
    u = (
        load(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.min(
                F.expr("CAST(FLOOR(unix_timestamp(date_trunc('day', ts)) / 86400)"
                       " AS BIGINT)")
            ).alias("d0"),
            F.max(
                F.when(
                    (F.col("event_type") == "purchase")
                    & (F.col("value") > _CONV_MIN),
                    1,
                ).otherwise(0)
            ).alias("conv"),
            F.first(F.expr(_ARM_EXPR.format(t="STRING"))).alias("arm"),
        )
    )
    byday = u.groupBy(F.col("d0").alias("d")).agg(
        F.sum(F.when(F.col("arm") == "a", 1).otherwise(0)).cast("long").alias("ua"),
        F.sum(F.when(F.col("arm") == "a", F.col("conv")).otherwise(0))
        .cast("long")
        .alias("ca"),
        F.sum(F.when(F.col("arm") == "b", 1).otherwise(0)).cast("long").alias("ub"),
        F.sum(F.when(F.col("arm") == "b", F.col("conv")).otherwise(0))
        .cast("long")
        .alias("cb"),
    )
    w = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, 0)
    cum = byday.select(
        "d",
        F.sum("ua").over(w).cast("long").alias("na"),
        F.sum("ca").over(w).cast("long").alias("xa"),
        F.sum("ub").over(w).cast("long").alias("nb"),
        F.sum("cb").over(w).cast("long").alias("xb"),
    )
    pbar = F.col("xa").cast("double") + F.col("xb")
    pbar = pbar / (F.col("na") + F.col("nb"))
    v = pbar * (1 - pbar) * (
        F.lit(1.0) / F.col("na") + F.lit(1.0) / F.col("nb")
    )
    delta = F.col("xa").cast("double") / F.col("na") - F.col("xb").cast(
        "double"
    ) / F.col("nb")
    tau = F.lit(_MSPRT_TAU)
    lam_expr = F.sqrt(v / (v + tau)) * F.exp(
        delta * delta * tau / (2 * v * (v + tau))
    )
    degenerate = (
        (F.col("na") == 0)
        | (F.col("nb") == 0)
        | (F.col("xa") + F.col("xb") == 0)
        | (F.col("xa") + F.col("xb") == F.col("na") + F.col("nb"))
    )
    lam = cum.select(
        "d",
        "na",
        "xa",
        "nb",
        "xb",
        F.when(degenerate, F.lit(1.0)).otherwise(lam_expr).alias("lam"),
    )
    return (
        lam.select(
            F.col("d").alias("day"),
            F.col("na").alias("n_a"),
            F.col("xa").alias("conv_a"),
            F.col("nb").alias("n_b"),
            F.col("xb").alias("conv_b"),
            (F.lit(1.0) / F.col("lam")).alias("inv_lambda"),
            F.min(F.least(F.lit(1.0) / F.col("lam"), F.lit(1.0)))
            .over(Window.orderBy("d").rowsBetween(Window.unboundedPreceding, 0))
            .alias("always_valid_p"),
        )
        .transform(pin)
        .orderBy("day")
    )


# ---------------------------------------------------------------------------
# X-102: exact Shapley-value channel attribution
# ---------------------------------------------------------------------------

#: Shapley weights k/6 for 3 players, keyed by |S| of the coalition the
#: channel joins: |S|=0 -> 2/6, |S|=1 -> 1/6, |S|=2 -> 2/6.
_SHAP_TERMS = {
    "view": ((1, 0, 2), (3, 2, 1), (5, 4, 1), (7, 6, 2)),
    "click": ((2, 0, 2), (3, 1, 1), (6, 4, 1), (7, 5, 2)),
    "signup": ((4, 0, 2), (5, 1, 1), (6, 2, 1), (7, 3, 2)),
}


def _shap_phi_sql(ch: str) -> str:
    terms = " + ".join(
        f"{k} * (v{a} - v{b})" for a, b, k in _SHAP_TERMS[ch]
    )
    return f"CAST(({terms}) // 6 AS BIGINT)"


_SHAP_ORACLE = f"""
    WITH u AS (
        SELECT user_id,
               MAX(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
               + 2 * MAX(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
               + 4 * MAX(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END)
                   AS mask,
               MAX(CASE WHEN event_type = 'purchase' AND value > {_CONV_MIN}
                   THEN 1 ELSE 0 END) AS conv
        FROM events GROUP BY user_id
    ),
    mk AS (
        SELECT mask, CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(conv) AS BIGINT) AS c
        FROM u GROUP BY mask
    ),
    vv AS (
        SELECT {", ".join(
            f"CAST(COALESCE(MAX(CASE WHEN mask = {m} THEN "
            f"CASE WHEN n = 0 THEN 0 ELSE c * 1000000 // n END END), 0) "
            f"AS BIGINT) AS v{m}" for m in range(8))},
               {", ".join(
            f"CAST(COALESCE(MAX(CASE WHEN mask = {m} THEN n END), 0) "
            f"AS BIGINT) AS n{m}" for m in range(8))}
        FROM mk
    ),
    phi AS (
        SELECT {_shap_phi_sql("view")} AS p_view,
               {_shap_phi_sql("click")} AS p_click,
               {_shap_phi_sql("signup")} AS p_signup,
               v7, v0,
               n1 + n3 + n5 + n7 AS e_view,
               n2 + n3 + n6 + n7 AS e_click,
               n4 + n5 + n6 + n7 AS e_signup
        FROM vv
    )
    SELECT t.channel,
           CAST(t.phi AS DOUBLE) / 1e6 AS shapley_lift,
           t.n_exposed,
           CAST(p.v7 - p.v0 AS DOUBLE) / 1e6 AS full_minus_null
    FROM phi p,
         LATERAL (VALUES ('view', p.p_view, p.e_view),
                         ('click', p.p_click, p.e_click),
                         ('signup', p.p_signup, p.e_signup))
             AS t(channel, phi, n_exposed)
    ORDER BY t.channel
"""


@query("q312_shapley_attribution", oracle=_SHAP_ORACLE, tags=("X-102", "X-23"))
def q312_shapley_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact Shapley-value attribution over the three pre-purchase
    channels (view/click/signup): each user's exposure set is a 3-bit
    mask, coalition value v(S) is the conversion rate of users with
    exactly that set, and each channel's Shapley value is the exact
    weighted average of its marginal contributions over the 8-subset
    lattice — the game-theoretically fair split of conversion credit
    that completes the attribution family (q152 last-touch, q171
    linear, q212 time-decay, q273 Markov removal, q276 U-shaped): it
    is the ONLY one of those satisfying efficiency + symmetry + null-
    player, and full_minus_null is the efficiency check the three
    values sum to.

    Determinism: exposure masks, per-mask counts, and micro-rates
    (c*1e6 floor-div n, empty masks pinned to 0) are exact integers;
    the Shapley sums use integer weights k/6 with ONE truncating
    division (Spark div = DuckDB // toward zero, incl. negative
    marginals); readouts are exact micro values scaled at display.

    Scale shape: ONE user-keyed fact rollup onto the 8-row mask
    relation; the entire lattice computation is a single-row pivot of
    those 8 rows.

    Reference parity: beyond-reference."""
    u = (
        load(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            (
                F.max(F.when(F.col("event_type") == "view", 1).otherwise(0))
                + 2 * F.max(F.when(F.col("event_type") == "click", 1).otherwise(0))
                + 4 * F.max(F.when(F.col("event_type") == "signup", 1).otherwise(0))
            ).alias("mask"),
            F.max(
                F.when(
                    (F.col("event_type") == "purchase")
                    & (F.col("value") > _CONV_MIN),
                    1,
                ).otherwise(0)
            ).alias("conv"),
        )
    )
    mk = u.groupBy("mask").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("conv").cast("long").alias("c"),
    )
    vv = mk.agg(
        *[
            F.coalesce(
                F.max(
                    F.when(
                        F.col("mask") == m,
                        F.when(F.col("n") == 0, 0).otherwise(
                            F.expr("c * 1000000 div n")
                        ),
                    )
                ),
                F.lit(0),
            )
            .cast("long")
            .alias(f"v{m}")
            for m in range(8)
        ],
        *[
            F.coalesce(F.max(F.when(F.col("mask") == m, F.col("n"))), F.lit(0))
            .cast("long")
            .alias(f"n{m}")
            for m in range(8)
        ],
    )

    def phi(ch: str):
        terms = " + ".join(f"{k} * (v{a} - v{b})" for a, b, k in _SHAP_TERMS[ch])
        return F.expr(f"CAST(({terms}) div 6 AS BIGINT)")

    wide = vv.select(
        phi("view").alias("p_view"),
        phi("click").alias("p_click"),
        phi("signup").alias("p_signup"),
        "v7",
        "v0",
        (F.col("n1") + F.col("n3") + F.col("n5") + F.col("n7")).alias("e_view"),
        (F.col("n2") + F.col("n3") + F.col("n6") + F.col("n7")).alias("e_click"),
        (F.col("n4") + F.col("n5") + F.col("n6") + F.col("n7")).alias(
            "e_signup"
        ),
    )
    stacked = wide.select(
        F.expr(
            "stack(3, 'view', p_view, e_view,"
            " 'click', p_click, e_click,"
            " 'signup', p_signup, e_signup)"
            " AS (channel, phi, n_exposed)"
        ),
        "v7",
        "v0",
    )
    return (
        stacked.select(
            "channel",
            (F.col("phi").cast("double") / F.lit(1e6)).alias("shapley_lift"),
            F.col("n_exposed").cast("long").alias("n_exposed"),
            ((F.col("v7") - F.col("v0")).cast("double") / F.lit(1e6)).alias(
                "full_minus_null"
            ),
        )
        .transform(pin)
        .orderBy("channel")
    )


# ---------------------------------------------------------------------------
# X-108: segment uplift (T-learner) + Qini-style targeting readout
# ---------------------------------------------------------------------------

_UPL_ORACLE = f"""
    WITH u AS (
        SELECT user_id, {_ARM_EXPR.format(t="VARCHAR")} AS arm,
               CASE WHEN COUNT(*) < 8 THEN 0
                    WHEN COUNT(*) < 32 THEN 1 ELSE 2 END AS seg,
               MAX(CASE WHEN event_type = 'purchase' AND value > {_CONV_MIN}
                   THEN 1 ELSE 0 END) AS conv
        FROM events GROUP BY user_id
    ),
    seg AS (
        SELECT seg,
               CAST(SUM(CASE WHEN arm = 'a' THEN 1 ELSE 0 END) AS BIGINT) AS nt,
               CAST(SUM(CASE WHEN arm = 'a' THEN conv ELSE 0 END) AS BIGINT) AS ct,
               CAST(SUM(CASE WHEN arm = 'b' THEN 1 ELSE 0 END) AS BIGINT) AS nc,
               CAST(SUM(CASE WHEN arm = 'b' THEN conv ELSE 0 END) AS BIGINT) AS cc
        FROM u GROUP BY seg
    ),
    up AS (
        SELECT seg, nt, ct, nc, cc,
               CAST(ct * 1000000 // nt - cc * 1000000 // nc AS BIGINT)
                   AS uplift_micro
        FROM seg
    ),
    ranked AS (
        SELECT *, ROW_NUMBER() OVER (ORDER BY uplift_micro DESC, seg) AS rk
        FROM up
    ),
    cum AS (
        SELECT seg, rk, nt, ct, nc, cc, uplift_micro,
               CAST(SUM(nt) OVER w AS BIGINT) AS cnt,
               CAST(SUM(ct) OVER w AS BIGINT) AS cct,
               CAST(SUM(nc) OVER w AS BIGINT) AS cnc,
               CAST(SUM(cc) OVER w AS BIGINT) AS ccc
        FROM ranked
        WINDOW w AS (ORDER BY rk ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    )
    SELECT seg, rk AS target_order, nt AS n_treat, ct AS conv_treat,
           nc AS n_control, cc AS conv_control,
           CAST(uplift_micro AS DOUBLE) / 1e6 AS uplift,
           CAST(cct - CAST(CAST(ccc AS HUGEINT) * cnt // cnc AS BIGINT)
                AS BIGINT) AS qini_incremental
    FROM cum
    ORDER BY target_order
"""


@query("q318_segment_uplift_qini", oracle=_UPL_ORACLE, tags=("X-108", "X-23"))
def q318_segment_uplift_qini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Segment-level uplift modeling (T-learner) with a Qini-style
    targeting readout: per activity segment, the treatment-minus-
    control conversion gap from the q169 randomized arms, segments
    ranked by estimated uplift, and the cumulative Qini increment
    (treated conversions minus the control conversions scaled to the
    treated count) when targeting top segments first — the
    WHO-to-treat question q169's average effect and q300's policy value
    both skip: uplift is heterogeneous, and targeting order is the
    deliverable.

    Determinism: all cell counts are exact integers; uplift scores are
    exact micro floor-division differences ranked under a total order;
    the Qini increment is one exact integer floor-division per row; the
    only double is the display-scaled uplift.

    Scale shape: ONE user rollup onto the 3-segment relation; ranking,
    cumulating, and the Qini arithmetic run on 3 rows.

    Reference parity: beyond-reference; completes the experimentation
    family (q169 ATE, q300 OPE, q311 sequential) with heterogeneous
    effects."""
    u = (
        load(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_ev"),
            F.max(
                F.when(
                    (F.col("event_type") == "purchase")
                    & (F.col("value") > _CONV_MIN),
                    1,
                ).otherwise(0)
            ).alias("conv"),
        )
        .select(
            F.expr(_ARM_EXPR.format(t="STRING")).alias("arm"),
            F.when(F.col("n_ev") < 8, 0)
            .when(F.col("n_ev") < 32, 1)
            .otherwise(2)
            .alias("seg"),
            "conv",
        )
    )
    seg = u.groupBy("seg").agg(
        F.sum(F.when(F.col("arm") == "a", 1).otherwise(0)).cast("long").alias("nt"),
        F.sum(F.when(F.col("arm") == "a", F.col("conv")).otherwise(0))
        .cast("long")
        .alias("ct"),
        F.sum(F.when(F.col("arm") == "b", 1).otherwise(0)).cast("long").alias("nc"),
        F.sum(F.when(F.col("arm") == "b", F.col("conv")).otherwise(0))
        .cast("long")
        .alias("cc"),
    )
    up = seg.select(
        "seg",
        "nt",
        "ct",
        "nc",
        "cc",
        F.expr(
            "CAST(ct * 1000000 div nt - cc * 1000000 div nc AS BIGINT)"
        ).alias("uplift_micro"),
    )
    ranked = up.withColumn(
        "rk",
        F.row_number().over(Window.orderBy(F.col("uplift_micro").desc(), "seg")),
    )
    w = Window.orderBy("rk").rowsBetween(Window.unboundedPreceding, 0)
    cum = ranked.select(
        "seg",
        "rk",
        "nt",
        "ct",
        "nc",
        "cc",
        "uplift_micro",
        F.sum("nt").over(w).cast("long").alias("cnt"),
        F.sum("ct").over(w).cast("long").alias("cct"),
        F.sum("nc").over(w).cast("long").alias("cnc"),
        F.sum("cc").over(w).cast("long").alias("ccc"),
    )
    return (
        cum.select(
            "seg",
            F.col("rk").cast("long").alias("target_order"),
            F.col("nt").alias("n_treat"),
            F.col("ct").alias("conv_treat"),
            F.col("nc").alias("n_control"),
            F.col("cc").alias("conv_control"),
            (F.col("uplift_micro").cast("double") / F.lit(1e6)).alias("uplift"),
            F.expr(
                "CAST(cct - CAST(CAST(ccc AS DECIMAL(20,0)) * cnt div cnc"
                " AS BIGINT) AS BIGINT)"
            ).alias("qini_incremental"),
        )
        .transform(pin)
        .orderBy("target_order")
    )


# ---------------------------------------------------------------------------
# X-117: experiment health check (SRM + novelty-effect drift)
# ---------------------------------------------------------------------------

_EH_ORACLE = f"""
    WITH u AS (
        SELECT user_id, {_ARM_EXPR.format(t="VARCHAR")} AS arm,
               CAST(MIN(FLOOR(epoch(date_trunc('day', ts))) // 86400) AS BIGINT)
                   AS d0,
               MAX(CASE WHEN event_type = 'purchase' AND value > {_CONV_MIN}
                   THEN 1 ELSE 0 END) AS conv
        FROM events GROUP BY user_id
    ),
    half AS (
        SELECT u.*, CASE WHEN u.d0 <= m.mid THEN 0 ELSE 1 END AS h
        FROM u, (SELECT (MIN(d0) + MAX(d0)) // 2 AS mid FROM u) m
    ),
    cell AS (
        SELECT h,
               CAST(SUM(CASE WHEN arm = 'a' THEN 1 ELSE 0 END) AS BIGINT) AS na,
               CAST(SUM(CASE WHEN arm = 'a' THEN conv ELSE 0 END) AS BIGINT) AS ca,
               CAST(SUM(CASE WHEN arm = 'b' THEN 1 ELSE 0 END) AS BIGINT) AS nb,
               CAST(SUM(CASE WHEN arm = 'b' THEN conv ELSE 0 END) AS BIGINT) AS cb
        FROM half GROUP BY h
    ),
    tot AS (
        SELECT CAST(SUM(na) AS BIGINT) AS na, CAST(SUM(ca) AS BIGINT) AS ca,
               CAST(SUM(nb) AS BIGINT) AS nb, CAST(SUM(cb) AS BIGINT) AS cb
        FROM cell
    ),
    srm AS (
        SELECT na, nb,
               CAST((na - nb) AS HUGEINT) * (na - nb) * 1000000
                   // (na + nb) AS chisq_micro
        FROM tot
    ),
    lift AS (
        SELECT h,
               CAST(ca * 1000000 // na - cb * 1000000 // nb AS BIGINT)
                   AS lift_micro
        FROM cell
    )
    SELECT s.na AS n_arm_a, s.nb AS n_arm_b,
           CAST(s.chisq_micro AS DOUBLE) / 1e6 AS srm_chisq,
           CASE WHEN s.chisq_micro > 3841459 THEN 1 ELSE 0 END AS srm_alarm,
           CAST(e.lift_micro AS DOUBLE) / 1e6 AS lift_early,
           CAST(l.lift_micro AS DOUBLE) / 1e6 AS lift_late,
           CAST(e.lift_micro - l.lift_micro AS DOUBLE) / 1e6
               AS novelty_drift
    FROM srm s,
         (SELECT lift_micro FROM lift WHERE h = 0) e,
         (SELECT lift_micro FROM lift WHERE h = 1) l
"""


@query("q327_experiment_health", oracle=_EH_ORACLE, tags=("X-117", "X-23"))
def q327_experiment_health(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Experiment health check: (1) SAMPLE-RATIO MISMATCH — the 1-df
    chi-square (na-nb)^2/(na+nb) of the arm counts against the designed
    50/50 split, alarmed at the 95% critical value 3.841459 (an SRM
    means the randomization itself is broken and every downstream
    readout is invalid — the first gate real platforms check); and
    (2) NOVELTY DRIFT — the treatment lift among early-entering users
    vs late-entering users, whose gap flags novelty/primacy effects
    that make the launch-week lift unrepresentative. Both are
    preconditions for trusting q169/q311/q318.

    Determinism: all counts exact integers; the chi-square and lifts
    are exact micro floor-divisions (the critical value enters as the
    exact integer 3841459); doubles are display scalings only.

    Scale shape: ONE user rollup, a 2x2x2 cell rollup, single-row
    readout arithmetic.

    Reference parity: beyond-reference."""
    u = (
        load(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.min(
                F.expr(
                    "CAST(FLOOR(unix_timestamp(date_trunc('day', ts)) / 86400)"
                    " AS BIGINT)"
                )
            ).alias("d0"),
            F.max(
                F.when(
                    (F.col("event_type") == "purchase")
                    & (F.col("value") > _CONV_MIN),
                    1,
                ).otherwise(0)
            ).alias("conv"),
        )
        .select(
            F.expr(_ARM_EXPR.format(t="STRING")).alias("arm"), "d0", "conv"
        )
        .transform(stage)  # the midpoint + the cell rollup share it
    )
    mid = u.agg(F.expr("(MIN(d0) + MAX(d0)) div 2").alias("mid"))
    half = u.crossJoin(F.broadcast(mid)).select(
        "arm",
        "conv",
        F.when(F.col("d0") <= F.col("mid"), 0).otherwise(1).alias("h"),
    )
    cell = half.groupBy("h").agg(
        F.sum(F.when(F.col("arm") == "a", 1).otherwise(0)).cast("long").alias("na"),
        F.sum(F.when(F.col("arm") == "a", F.col("conv")).otherwise(0))
        .cast("long")
        .alias("ca"),
        F.sum(F.when(F.col("arm") == "b", 1).otherwise(0)).cast("long").alias("nb"),
        F.sum(F.when(F.col("arm") == "b", F.col("conv")).otherwise(0))
        .cast("long")
        .alias("cb"),
    ).transform(stage)  # totals + both half lifts share it
    tot = cell.agg(
        F.sum("na").cast("long").alias("na"),
        F.sum("ca").cast("long").alias("ca"),
        F.sum("nb").cast("long").alias("nb"),
        F.sum("cb").cast("long").alias("cb"),
    )
    srm = tot.select(
        "na",
        "nb",
        F.expr(
            "CAST(CAST(na - nb AS DECIMAL(20,0)) * (na - nb) * 1000000"
            " div (na + nb) AS BIGINT)"
        ).alias("chisq_micro"),
    )
    lift = cell.select(
        "h",
        F.expr(
            "CAST(ca * 1000000 div na - cb * 1000000 div nb AS BIGINT)"
        ).alias("lift_micro"),
    )
    early = lift.filter(F.col("h") == 0).select(
        F.col("lift_micro").alias("le")
    )
    late = lift.filter(F.col("h") == 1).select(F.col("lift_micro").alias("ll"))
    return (
        srm.crossJoin(F.broadcast(early))
        .crossJoin(F.broadcast(late))
        .select(
            F.col("na").alias("n_arm_a"),
            F.col("nb").alias("n_arm_b"),
            (F.col("chisq_micro").cast("double") / F.lit(1e6)).alias(
                "srm_chisq"
            ),
            F.when(F.col("chisq_micro") > 3841459, 1).otherwise(0).alias(
                "srm_alarm"
            ),
            (F.col("le").cast("double") / F.lit(1e6)).alias("lift_early"),
            (F.col("ll").cast("double") / F.lit(1e6)).alias("lift_late"),
            ((F.col("le") - F.col("ll")).cast("double") / F.lit(1e6)).alias(
                "novelty_drift"
            ),
        )
    )


# ---------------------------------------------------------------------------
# X-122: Neyman-optimal stratified sampling allocation
# ---------------------------------------------------------------------------

_NA_BUDGET = 10000  #: total sample budget to allocate

_NEYMAN_ORACLE = f"""
    WITH u AS (
        SELECT event_type AS stratum,
               CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS cents
        FROM events
    ),
    m AS (
        SELECT stratum, CAST(COUNT(*) AS BIGINT) AS nh,
               CAST(SUM(cents) AS HUGEINT) AS s1,
               CAST(SUM(CAST(cents AS HUGEINT) * cents) AS HUGEINT) AS s2
        FROM u GROUP BY stratum
    ),
    sd AS (
        SELECT stratum, nh,
               CAST(FLOOR(sqrt(CAST((nh * s2 - s1 * s1) // nh // GREATEST(nh - 1, 1)
                                    AS DOUBLE))) AS BIGINT) AS sh
        FROM m
    ),
    tot AS (SELECT CAST(SUM(CAST(nh AS HUGEINT) * sh) AS HUGEINT) AS z FROM sd)
    SELECT s.stratum, s.nh AS stratum_size, s.sh AS stratum_sd_cents,
           CAST(CAST({_NA_BUDGET} AS HUGEINT) * s.nh * s.sh // t.z AS BIGINT)
               AS neyman_alloc,
           CAST(CAST({_NA_BUDGET} AS HUGEINT) * s.nh
                // (SELECT SUM(nh) FROM sd) AS BIGINT) AS proportional_alloc
    FROM sd s, tot t
    ORDER BY s.stratum
"""


@query("q332_neyman_allocation", oracle=_NEYMAN_ORACLE, tags=("X-122", "O-06"))
def q332_neyman_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Neyman-optimal stratified sampling allocation: given a 10k-row
    sample budget across event-type strata, allocate n_h proportional
    to N_h * sigma_h (the variance-minimizing design for estimating the
    mean transaction value), next to naive proportional allocation —
    the survey-sampling design step BEHIND O-06's stratified sampler:
    that operator executes a given allocation; this computes the one
    worth executing. High-variance strata get oversampled, which is
    exactly the audit-sampling / labeling-budget logic of a training-
    data pipeline.

    Determinism: per-stratum moments are exact integers; the stratum
    SD is floor(sqrt(integer variance)) — sqrt is IEEE
    correctly-rounded in both engines on identical operands, so unlike
    ln/exp it carries NO cross-libm risk; allocations are exact integer
    floor divisions of exact products. No display double exists at all.

    Scale shape: one map-side-combined moment rollup onto the bounded
    stratum relation; everything after runs on ~5 rows.

    Reference parity: beyond-reference."""
    u = load(spark, sf_dir, "events").select(
        F.col("event_type").alias("stratum"),
        F.floor(F.col("value") * 100 + 0.5).cast("long").alias("cents"),
    )
    d38 = "decimal(38,0)"
    m = u.groupBy("stratum").agg(
        F.count(F.lit(1)).cast("long").alias("nh"),
        F.sum("cents").cast(d38).alias("s1"),
        F.sum((F.col("cents").cast("decimal(19,0)") * F.col("cents")))
        .cast(d38)
        .alias("s2"),
    )
    sd = m.select(
        "stratum",
        "nh",
        F.floor(
            F.sqrt(
                F.expr(
                    "CAST((nh * s2 - s1 * s1) div nh"
                    " div GREATEST(nh - 1, 1) AS DOUBLE)"
                )
            )
        )
        .cast("long")
        .alias("sh"),
    ).transform(stage)  # the total + both allocations share it
    tot = sd.agg(
        F.sum(F.col("nh").cast("decimal(19,0)") * F.col("sh"))
        .cast(d38)
        .alias("z"),
        F.sum("nh").cast("long").alias("n_all"),
    )
    return (
        sd.crossJoin(F.broadcast(tot))
        .select(
            "stratum",
            F.col("nh").alias("stratum_size"),
            F.col("sh").alias("stratum_sd_cents"),
            F.expr(
                f"CAST(CAST({_NA_BUDGET} AS DECIMAL(20,0)) * nh * sh div z"
                " AS BIGINT)"
            ).alias("neyman_alloc"),
            F.expr(
                f"CAST(CAST({_NA_BUDGET} AS DECIMAL(20,0)) * nh div n_all"
                " AS BIGINT)"
            ).alias("proportional_alloc"),
        )
        .transform(pin)
        .orderBy("stratum")
    )


# ---------------------------------------------------------------------------
# X-123: systematic PPS (probability-proportional-to-size) sampling
# ---------------------------------------------------------------------------

_PPS_K = 20  #: sample size drawn systematically

_PPS_ORACLE = f"""
    WITH sz AS (
        SELECT user_id, CAST(COUNT(*) AS BIGINT) AS size
        FROM events GROUP BY user_id
    ),
    cum AS (
        SELECT user_id, size,
               CAST(SUM(size) OVER (ORDER BY user_id) AS BIGINT) AS c
        FROM sz
    ),
    tot AS (SELECT CAST(SUM(size) AS BIGINT) AS t FROM sz),
    marks AS (
        SELECT k.k,
               (2 * CAST(k.k AS HUGEINT) + 1) * t.t // (2 * {_PPS_K}) AS m
        FROM (SELECT unnest(range(0, {_PPS_K})) AS k) k, tot t
    ),
    hits AS (
        SELECT m.k, CAST(MIN(c.user_id) AS BIGINT) AS user_id
        FROM marks m JOIN cum c ON c.c > m.m
        GROUP BY m.k
    )
    SELECT h.k AS draw, h.user_id, s.size AS user_events,
           CAST(s.size * 1000000 // t.t AS BIGINT)
               AS inclusion_ppm_per_draw
    FROM hits h JOIN sz s USING (user_id), tot t
    ORDER BY draw
"""


@query("q333_systematic_pps_sample", oracle=_PPS_ORACLE, tags=("X-123", "O-03"))
def q333_systematic_pps_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Systematic PPS sampling: draw 20 users with probability
    proportional to their event volume by walking equally-spaced marks
    (2k+1)T/2K through the cumulative size line — the audit/labeling
    draw that weights heavy users correctly where O-03's uniform keyed
    sample under-represents them, and the classic deterministic
    companion of q213's randomized weighted reservoir (systematic PPS
    is the textbook design when a REPRODUCIBLE pps panel is wanted).
    Each draw reports its exact inclusion weight for Horvitz-Thompson
    reweighting downstream.

    Determinism: sizes, the cumulative line (over the total user order),
    the marks, and the mark-to-user assignment (min user whose
    cumulative strictly exceeds the mark) are all exact integers — the
    draw is a pure function of the data.

    Scale shape: one user rollup; the cumulative line uses a keyed
    window over the user order (at 100 TB: the q84 two-level bucketed
    prefix by user-id range); the 20 marks broadcast into a bounded
    range join.

    Reference parity: beyond-reference."""
    sz = (
        load(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).cast("long").alias("size"))
    )
    w = Window.orderBy("user_id").rowsBetween(Window.unboundedPreceding, 0)
    cum = sz.select(
        "user_id", "size", F.sum("size").over(w).cast("long").alias("c")
    ).transform(stage)  # marks join + the size readout share it
    tot = sz.agg(F.sum("size").cast("long").alias("t"))
    ks = spark.createDataFrame([(k,) for k in range(_PPS_K)], "k int")
    marks = ks.crossJoin(F.broadcast(tot)).select(
        "k",
        F.expr(
            f"CAST((2 * CAST(k AS DECIMAL(20,0)) + 1) * t div (2 * {_PPS_K})"
            " AS BIGINT)"
        ).alias("m"),
        "t",
    )
    hits = (
        cum.crossJoin(F.broadcast(marks))
        .filter(F.col("c") > F.col("m"))
        .groupBy("k", "t")
        .agg(F.min("user_id").cast("long").alias("user_id"))
    )
    return (
        hits.join(sz, "user_id")
        .select(
            F.col("k").cast("long").alias("draw"),
            "user_id",
            F.col("size").alias("user_events"),
            F.expr("CAST(size * 1000000 div t AS BIGINT)").alias(
                "inclusion_ppm_per_draw"
            ),
        )
        .transform(pin)
        .orderBy("draw")
    )


# ---------------------------------------------------------------------------
# X-23 extension: UCB1 bandit allocation audit
# ---------------------------------------------------------------------------

_N_ARMS = 4
#: md5 first nibble mod 4 -> arm label: the X-16 hash assignment widened to a
#: 4-arm bandit (every unit wholly in one arm, RNG-free, backfill-stable).
_ARM4_EXPR = (
    "concat('arm_', CAST((instr('0123456789abcdef', "
    "substr(md5(CAST(user_id AS {t})), 1, 1)) - 1) % {k} AS {t}))"
)


@query(
    "q338_ucb1_allocation",
    oracle=f"""
    WITH u AS (
        SELECT {_ARM4_EXPR.format(t="VARCHAR", k=_N_ARMS)} AS arm,
               MAX(CASE WHEN event_type = 'purchase' AND value > {_CONV_MIN}
                   THEN 1 ELSE 0 END) AS conv
        FROM events GROUP BY user_id
    ),
    a AS (
        SELECT arm, COUNT(*) AS n_users,
               CAST(SUM(conv) AS BIGINT) AS conversions
        FROM u GROUP BY arm
    ),
    s AS (
        SELECT arm, n_users, conversions,
               SUM(n_users) OVER () AS total_n
        FROM a
    ),
    sc AS (
        SELECT arm, n_users, conversions,
               ROUND(CAST(conversions AS DOUBLE) / n_users, 6) AS mean_rate,
               ROUND(CAST(conversions AS DOUBLE) / n_users
                     + sqrt(2.0 * ROUND(ln(CAST(total_n AS DOUBLE)), 6)
                            / n_users), 6) AS ucb_score
        FROM s
    )
    SELECT arm, n_users, conversions, mean_rate, ucb_score,
           CAST(RANK() OVER (ORDER BY ucb_score DESC, arm) = 1
                AS BIGINT) AS chosen
    FROM sc ORDER BY arm
    """,
    tags=("X-23", "X-16"),
)
def q338_ucb1_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UCB1 bandit allocation audit: units hash-split into 4 arms (md5
    nibble mod 4 — the X-16 assignment widened from A/B to a bandit),
    per-arm conversion means, and the UCB1 exploration score
    mean + sqrt(2·ln(N)/n) that names the arm a bandit policy would play
    next. The q169 z-test answers "did the completed experiment win?";
    this is the adaptive-allocation readout an experimentation platform
    computes BETWEEN batches — which arm is under-explored relative to
    its observed rate.

    Determinism: counts are exact integers; ln(N) is the one libm call,
    rounded at 6 dp (the q120 cross-libm precedent) before the IEEE-exact
    2·/n and sqrt (correctly rounded on identical operands); the final
    score rounds at 6 dp, and the chosen flag ranks with an arm-label
    tie-break.

    Scale shape: one user-keyed shuffle for the per-unit conversion
    rollup (map-side combined MAX), one map-side-combined rollup onto the
    BOUNDED 4-row arm relation; the total-N window, scoring, and rank all
    run on those 4 rows. Partials are A-14-mergeable, so per-shard arm
    counts sum without rescanning — the bandit update costs one pass over
    the new batch at any scale.

    Reference parity: beyond-reference (the reference retrains on a fixed
    schedule, `train_retrain.py`); completes the X-23 experiment family
    (q169 z-test, q189 MDE, q311 mSPRT sequential monitor) with the
    allocation-policy side."""
    ev = load(spark, sf_dir, "events")
    u = (
        ev.groupBy("user_id")
        .agg(
            F.max(
                F.when(
                    (F.col("event_type") == "purchase") & (F.col("value") > _CONV_MIN),
                    1,
                ).otherwise(0)
            ).alias("conv")
        )
        .select(
            F.expr(_ARM4_EXPR.format(t="string", k=_N_ARMS)).alias("arm"), "conv"
        )
    )
    a = u.groupBy("arm").agg(
        F.count(F.lit(1)).alias("n_users"),
        F.sum("conv").cast("long").alias("conversions"),
    )
    w_all = Window.partitionBy()  # bounded: exactly _N_ARMS rows
    mean = F.col("conversions").cast("double") / F.col("n_users")
    bonus = F.sqrt(
        F.lit(2.0)
        * F.round(F.log(F.col("total_n").cast("double")), 6)
        / F.col("n_users")
    )
    sc = (
        a.withColumn("total_n", F.sum("n_users").over(w_all))
        .withColumn("mean_rate", F.round(mean, 6))
        .withColumn("ucb_score", F.round(mean + bonus, 6))
    )
    return (
        sc.withColumn(
            "chosen",
            (
                F.rank().over(
                    Window.partitionBy().orderBy(F.col("ucb_score").desc(), "arm")
                )
                == 1
            ).cast("long"),
        )
        .select("arm", "n_users", "conversions", "mean_rate", "ucb_score", "chosen")
        .transform(pin)
        .orderBy("arm")
    )


# ---------------------------------------------------------------------------
# X-23 extension: SEGMENTED sample-ratio-mismatch (SRM) drill-down
# ---------------------------------------------------------------------------


@query(
    "q346_srm_by_segment",
    oracle=f"""
    WITH u AS (
        SELECT event_type, user_id, {_ARM_EXPR.format(t="VARCHAR")} AS arm
        FROM events GROUP BY event_type, user_id
    ),
    agg AS (
        SELECT event_type,
               CAST(COUNT(CASE WHEN arm = 'a' THEN 1 END) AS BIGINT) AS n_a,
               CAST(COUNT(CASE WHEN arm = 'b' THEN 1 END) AS BIGINT) AS n_b
        FROM u GROUP BY event_type
    )
    SELECT event_type, n_a, n_b,
           ROUND(CAST(n_a AS DOUBLE) / (n_a + n_b), 6) AS share_a,
           ROUND(CAST((n_a - n_b) * (n_a - n_b) AS DOUBLE) / (n_a + n_b), 6)
               AS srm_chi2,
           CAST(CASE WHEN CAST((n_a - n_b) * (n_a - n_b) AS DOUBLE)
                          / (n_a + n_b) > 3.841459 THEN 1 ELSE 0 END
                AS BIGINT) AS srm_flag
    FROM agg
    ORDER BY event_type
    """,
    tags=("X-23", "X-16", "X-24"),
)
def q346_srm_by_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SEGMENTED sample-ratio-mismatch drill-down: the SRM chi-square
    (for equal expected counts exactly (n_a-n_b)^2/(n_a+n_b), 1-dof 5%
    literal 3.841459) computed PER EVENT-TYPE segment over the users
    exposed in that segment — the localization step after q327's global
    SRM gate fires. A global mismatch rarely explains itself; platforms
    re-run the ratio test per logging surface because the usual culprit
    is ONE event type dropping one arm's exposures (a client build that
    stopped firing 'view' for arm b), and the broken segment's flag
    names the surface to fix.

    Determinism: pure integer counts per segment; one exact-ratio
    division rounded 6 dp; exact comparison against a literal.

    Scale shape: one (type, user)-keyed map-side-combined rollup — the
    fact shuffles once — then a rollup onto the bounded type relation;
    two integers per segment cross the final exchange. A-14-mergeable,
    so per-shard segment counts sum without rescanning.

    Reference parity: beyond-reference; extends q327 (global SRM +
    novelty) with the per-segment localization an incident review needs."""
    ev = load(spark, sf_dir, "events")
    u = (
        ev.groupBy("event_type", "user_id")
        .agg(F.count(F.lit(1)).alias("_n"))
        .select("event_type", F.expr(_ARM_EXPR.format(t="string")).alias("arm"))
    )
    agg = u.groupBy("event_type").agg(
        F.count(F.when(F.col("arm") == "a", 1)).cast("long").alias("n_a"),
        F.count(F.when(F.col("arm") == "b", 1)).cast("long").alias("n_b"),
    )
    tot = F.col("n_a") + F.col("n_b")
    chi2 = ((F.col("n_a") - F.col("n_b")) * (F.col("n_a") - F.col("n_b"))).cast(
        "double"
    ) / tot
    return (
        agg.select(
            "event_type",
            "n_a",
            "n_b",
            F.round(F.col("n_a").cast("double") / tot, 6).alias("share_a"),
            F.round(chi2, 6).alias("srm_chi2"),
            F.when(chi2 > 3.841459, 1).otherwise(0).cast("long").alias("srm_flag"),
        )
        .transform(pin)
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# X-23 (cont.): Wilson score intervals for segment conversion rates
# ---------------------------------------------------------------------------

_WILSON_Z = 1.959964  #: 95% normal quantile as a fixed literal (no libm)


@query(
    "q363_wilson_intervals",
    oracle=f"""
    WITH u AS (
        SELECT user_id,
               ANY_VALUE(dow0) AS segment_dow,
               MAX(CASE WHEN event_type = 'purchase' AND value > {_CONV_MIN}
                   THEN 1 ELSE 0 END) AS conv
        FROM (
            SELECT user_id, ts, event_type, value,
                   FIRST_VALUE(dayofweek(date_trunc('day', ts)) + 1) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                   ) AS dow0
            FROM events
        )
        GROUP BY user_id
    ),
    seg AS (
        SELECT segment_dow, CAST(COUNT(*) AS BIGINT) AS n_users,
               CAST(SUM(conv) AS BIGINT) AS conversions
        FROM u GROUP BY segment_dow
    )
    SELECT segment_dow, n_users, conversions,
           ROUND(CAST(conversions AS DOUBLE) / n_users, 6) AS rate,
           ROUND(((CAST(conversions AS DOUBLE) / n_users
                   + {_WILSON_Z} * {_WILSON_Z} / (2.0 * n_users))
                  - {_WILSON_Z} * sqrt((CAST(conversions AS DOUBLE) / n_users)
                        * (1 - CAST(conversions AS DOUBLE) / n_users) / n_users
                        + {_WILSON_Z} * {_WILSON_Z}
                          / (4.0 * n_users * n_users)))
                 / (1 + {_WILSON_Z} * {_WILSON_Z} / n_users), 6) AS ci_lo,
           ROUND(((CAST(conversions AS DOUBLE) / n_users
                   + {_WILSON_Z} * {_WILSON_Z} / (2.0 * n_users))
                  + {_WILSON_Z} * sqrt((CAST(conversions AS DOUBLE) / n_users)
                        * (1 - CAST(conversions AS DOUBLE) / n_users) / n_users
                        + {_WILSON_Z} * {_WILSON_Z}
                          / (4.0 * n_users * n_users)))
                 / (1 + {_WILSON_Z} * {_WILSON_Z} / n_users), 6) AS ci_hi
    FROM seg ORDER BY segment_dow
    """,
    tags=("X-23", "W-01"),
)
def q363_wilson_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wilson score intervals for per-segment conversion rates (segments =
    day-of-week of each user's FIRST event, the acquisition-channel
    proxy): the small-n-safe 95% CI a dashboard should draw instead of
    the Wald interval, which collapses to zero width at 0%/100% and
    goes negative at small n — Wilson stays inside [0,1] and stays
    honest at n=5 (exactly the segment sizes real funnels produce).
    q169 tests two arms against each other; this brackets EVERY
    segment's rate so an eyeballed difference can be dismissed when the
    intervals overlap.

    Determinism: segment assignment uses the (ts, event_id) total order;
    counts exact; z enters as a fixed 6-dp literal (no libm quantile);
    the interval is one fixed-parenthesization IEEE expression over
    exact operands (one sqrt, correctly rounded), rounded 6 dp.

    Scale shape: one user-keyed window pass assigns segments (the same
    shuffle the conversion rollup rides); ONE map-side-combined rollup
    onto the bounded 7-row segment relation; interval math runs on 7
    rows.

    Reference parity: beyond-reference; completes X-23's uncertainty kit
    (q193 half-sample SE, q302 median CI, q283 conformal) with the
    proportion case."""
    from pyspark.sql import Window as W

    ev = load(spark, sf_dir, "events")
    dow0 = F.first(
        F.dayofweek(F.date_trunc("day", F.col("ts")))
    ).over(W.partitionBy("user_id").orderBy("ts", "event_id"))
    u = (
        ev.withColumn("dow0", dow0)
        .groupBy("user_id")
        .agg(
            F.any_value(F.col("dow0")).alias("segment_dow"),
            F.max(
                F.when(
                    (F.col("event_type") == "purchase") & (F.col("value") > _CONV_MIN),
                    1,
                ).otherwise(0)
            ).alias("conv"),
        )
    )
    seg = u.groupBy("segment_dow").agg(
        F.count(F.lit(1)).cast("long").alias("n_users"),
        F.sum("conv").cast("long").alias("conversions"),
    )
    z = F.lit(_WILSON_Z)
    p = F.col("conversions").cast("double") / F.col("n_users")
    n = F.col("n_users")
    center = p + z * z / (F.lit(2.0) * n)
    half = z * F.sqrt(
        p * (F.lit(1) - p) / n + z * z / (F.lit(4.0) * n * n)
    )
    denom = F.lit(1) + z * z / n
    return (
        seg.select(
            "segment_dow",
            "n_users",
            "conversions",
            F.round(p, 6).alias("rate"),
            F.round((center - half) / denom, 6).alias("ci_lo"),
            F.round((center + half) / denom, 6).alias("ci_hi"),
        )
        .transform(pin)
        .orderBy("segment_dow")
    )


# ---------------------------------------------------------------------------
# X-33 (cont.): leaderboard rank stability under half-sample replicates
# ---------------------------------------------------------------------------

_STAB_TOPK = 5


@query(
    "q364_topk_stability",
    oracle=f"""
    WITH keyed AS (
        SELECT p.p_brand AS brand,
               CAST(ROUND(l.l_extendedprice * 100) AS BIGINT) AS cents,
               {_nibble_int("md5(CAST(l.l_orderkey AS VARCHAR))")} AS h
        FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    ),
    full_rank AS (
        SELECT brand,
               ROW_NUMBER() OVER (ORDER BY SUM(cents) DESC, brand) AS rk,
               CAST(SUM(cents) AS BIGINT) AS rev_cents
        FROM keyed GROUP BY brand
    ),
    rep_rev AS (
        SELECT r.rep, brand, SUM(cents) AS rev
        FROM keyed k CROSS JOIN (SELECT unnest(range({_B})) AS rep) r
        WHERE ((k.h >> r.rep) & 1) = 1
        GROUP BY r.rep, brand
    ),
    rep_top AS (
        SELECT rep, brand FROM (
            SELECT rep, brand,
                   ROW_NUMBER() OVER (PARTITION BY rep
                                      ORDER BY rev DESC, brand) AS rk
            FROM rep_rev
        ) WHERE rk <= {_STAB_TOPK}
    )
    SELECT f.brand, CAST(f.rk AS BIGINT) AS full_rank, f.rev_cents,
           CAST(COUNT(t.brand) AS BIGINT) AS replicates_in_top{_STAB_TOPK},
           ROUND(CAST(COUNT(t.brand) AS DOUBLE) / {_B}, 6) AS stability
    FROM full_rank f LEFT JOIN rep_top t ON t.brand = f.brand
    WHERE f.rk <= 10
    GROUP BY f.brand, f.rk, f.rev_cents
    ORDER BY full_rank
    """,
    tags=("X-33", "O-05"),
)
def q364_topk_stability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leaderboard rank stability: the full-data top-10 brands by revenue,
    each scored by how many of 16 deterministic half-sample replicates
    (q193's md5-bit membership, whole ORDERS in or out so replicates
    respect the clustering unit — the q255 discipline) still place it in
    the top-5. A brand at rank 4 with stability 6/16 is a coin flip, not
    a fact; q248 measures rank churn BETWEEN periods, this measures rank
    UNCERTAINTY within one — the number that belongs next to any top-k
    chart before someone reorganizes a product line over it.

    Determinism: replicate membership is a pure md5-bit function of the
    order key; revenues exact cents; ranking ties break by brand.

    Scale shape: ONE dim-broadcast fact rollup to (brand, orderkey-hash)
    rows, the 16-way replicate fan-out runs map-only on rows already
    REDUCED per (order, brand), each replicate's rollup lands on the
    bounded brand relation, per-replicate top-5 is the WindowGroupLimit
    partial top-k, and the stability join runs on 25 x 16 rows.

    Reference parity: beyond-reference; composes X-33 resampling with
    O-05 grouped top-k into the rank-uncertainty readout."""
    from pyspark.sql import Window as W

    li = load(spark, sf_dir, "lineitem").select(
        "l_partkey",
        "l_orderkey",
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("cents"),
    )
    p = load(spark, sf_dir, "part").select(
        "p_partkey", F.col("p_brand").alias("brand")
    )
    keyed = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy(
            "brand",
            F.expr(_nibble_int("md5(CAST(l_orderkey AS string))")).alias("h"),
        )
        .agg(F.sum("cents").cast("long").alias("cents"))
        .transform(stage)  # full-rank leg + replicate legs share one build
    )
    full_rank = (
        keyed.groupBy("brand")
        .agg(F.sum("cents").cast("long").alias("rev_cents"))
        .withColumn(
            "full_rank",
            F.row_number()
            .over(W.partitionBy().orderBy(F.desc("rev_cents"), "brand"))
            .cast("long"),
        )
        .filter(F.col("full_rank") <= 10)
    )
    reps = keyed.select(
        "brand",
        "cents",
        F.explode(
            F.expr(
                f"filter(transform(sequence(0, {_B - 1}), "
                "b -> CASE WHEN (h >> b) & 1 = 1 THEN b END), "
                "x -> x IS NOT NULL)"
            )
        ).alias("rep"),
    )
    rep_rev = reps.groupBy("rep", "brand").agg(F.sum("cents").alias("rev"))
    rep_top = (
        rep_rev.withColumn(
            "rk",
            F.row_number().over(
                W.partitionBy("rep").orderBy(F.desc("rev"), "brand")
            ),
        )
        .filter(F.col("rk") <= _STAB_TOPK)
        .select("rep", "brand")
    )
    hits = rep_top.groupBy("brand").agg(
        F.count(F.lit(1)).cast("long").alias(f"replicates_in_top{_STAB_TOPK}")
    )
    return (
        full_rank.join(F.broadcast(hits), "brand", "left")
        .select(
            "brand",
            "full_rank",
            "rev_cents",
            F.coalesce(F.col(f"replicates_in_top{_STAB_TOPK}"), F.lit(0))
            .cast("long")
            .alias(f"replicates_in_top{_STAB_TOPK}"),
            F.round(
                F.coalesce(F.col(f"replicates_in_top{_STAB_TOPK}"), F.lit(0)).cast(
                    "double"
                )
                / F.lit(_B),
                6,
            ).alias("stability"),
        )
        .transform(pin)
        .orderBy("full_rank")
    )


# ---------------------------------------------------------------------------
# X-139: stratified (subclassification) ATE with common-support audit
# ---------------------------------------------------------------------------

_SATE_ORACLE = """
    WITH u AS (
        SELECT user_id,
               CAST(MAX(CASE WHEN event_type = 'signup'
                             AND ts < TIMESTAMP '2024-01-03 00:00:00'
                        THEN 1 ELSE 0 END) AS BIGINT) AS t,
               CAST(SUM(CASE WHEN event_type = 'purchase'
                        THEN CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)
                        ELSE 0 END) AS BIGINT) AS y,
               CAST(SUM(CASE WHEN event_type NOT IN ('purchase', 'signup')
                        THEN 1 ELSE 0 END) AS BIGINT) AS act
        FROM events GROUP BY user_id
    ),
    s AS (SELECT *, LEAST(act // 10, 9) AS strat FROM u),
    cell AS (
        SELECT strat,
               CAST(SUM(t) AS BIGINT) AS n_t,
               CAST(SUM(1 - t) AS BIGINT) AS n_c,
               CAST(SUM(CASE WHEN t = 1 THEN y ELSE 0 END) AS BIGINT) AS y_t,
               CAST(SUM(CASE WHEN t = 0 THEN y ELSE 0 END) AS BIGINT) AS y_c
        FROM s GROUP BY strat
    ),
    supp AS (SELECT * FROM cell WHERE n_t > 0 AND n_c > 0),
    ate AS (
        SELECT CAST(SUM(n_t + n_c) AS BIGINT) AS n_common,
               CAST(COUNT(*) AS BIGINT) AS n_support_strata,
               CAST(SUM(
                   CAST(ROUND(CAST(y_t AS DOUBLE) / n_t
                              - CAST(y_c AS DOUBLE) / n_c, 6)
                        AS DECIMAL(28,6)) * (n_t + n_c)) AS DOUBLE)
               / SUM(n_t + n_c) AS ate_cents
        FROM supp
    ),
    naive AS (
        SELECT ROUND(CAST(SUM(CASE WHEN t = 1 THEN y ELSE 0 END) AS DOUBLE)
                         / SUM(t)
                     - CAST(SUM(CASE WHEN t = 0 THEN y ELSE 0 END) AS DOUBLE)
                         / SUM(1 - t), 6) AS naive_diff_cents,
               CAST(COUNT(*) AS BIGINT) AS n_users,
               CAST(SUM(t) AS BIGINT) AS n_treated,
               CAST(COUNT(*) - SUM(t) AS BIGINT) AS n_control,
               CAST(COUNT(DISTINCT LEAST(act // 10, 9)) AS BIGINT) AS n_strata
        FROM s
    )
    SELECT n_users, n_treated, n_control, n_strata, n_support_strata,
           n_common,
           ROUND(CAST(n_common AS DOUBLE) / n_users, 6) AS support_share,
           naive_diff_cents,
           ROUND(ate_cents, 6) AS ate_cents
    FROM naive CROSS JOIN ate
"""


@query("q414_stratified_ate", oracle=_SATE_ORACLE, tags=("X-139", "X-71", "A-12"))
def q414_stratified_ate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified (subclassification) AVERAGE TREATMENT EFFECT with a
    common-support audit — the workhorse observational-causal estimator
    between q267's difference-in-differences (needs a before/after) and
    q279's Mantel-Haenszel (binary outcomes): treatment = EARLY signup
    (within the window's first two days — both arms exist at every test
    scale factor; the exposure-window design is standard when everyone
    eventually converts), outcome = lifetime purchase cents, strata =
    activity deciles over NON-outcome events (the confounder: active
    users both sign up earlier and buy more). Within each stratum the treated-minus-
    control mean difference is (approximately) confounder-free; the ATE
    re-weights those differences by stratum size OVER THE COMMON SUPPORT
    only (strata holding both arms), and the report carries the naive
    unadjusted difference beside it — the audit row every causal readout
    should ship: no-support strata are EXCLUDED and counted, never
    silently extrapolated.

    Determinism: outcomes are exact integer cents; each within-stratum
    difference is ROUNDED 6 dp then held in decimal(28,6) for the
    stratum-weighted sum (the q120 discipline — the cross-strata sum is
    order-independent exact decimal), divided once by the common-support
    size; the naive contrast is one fixed-shape IEEE expression.

    Scale shape: ONE map-side-combined fact rollup to per-user
    (treatment, outcome, activity), a second rollup onto the BOUNDED
    stratum grid (10 cells x 4 sums, A-14-mergeable), and scalar
    readouts. Nothing scales with users except the two rollups.

    Reference parity: beyond-reference; completes the causal kit (q267
    DiD, q279 MH odds, q273 removal effects, q300 IPS, q310 control-
    series, q312 Shapley, q318 uplift) with the stratification
    estimator."""
    cents = (F.col("value").cast("decimal(18,2)") * 100).cast("long")
    u = (
        load(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.max(
                F.when(
                    (F.col("event_type") == "signup")
                    & (F.col("ts") < F.lit("2024-01-03 00:00:00").cast("timestamp")),
                    1,
                ).otherwise(0)
            )
            .cast("long")
            .alias("t"),
            F.sum(F.when(F.col("event_type") == "purchase", cents).otherwise(0))
            .cast("long")
            .alias("y"),
            F.sum(
                F.when(~F.col("event_type").isin("purchase", "signup"), 1).otherwise(0)
            )
            .cast("long")
            .alias("act"),
        )
        .withColumn("strat", F.least(F.expr("act DIV 10"), F.lit(9)))
        .transform(stage)  # the stratum grid and the naive contrast reuse it
    )
    cell = u.groupBy("strat").agg(
        F.sum("t").cast("long").alias("n_t"),
        F.sum(1 - F.col("t")).cast("long").alias("n_c"),
        F.sum(F.when(F.col("t") == 1, F.col("y")).otherwise(0)).cast("long").alias("y_t"),
        F.sum(F.when(F.col("t") == 0, F.col("y")).otherwise(0)).cast("long").alias("y_c"),
    )
    supp = cell.filter((F.col("n_t") > 0) & (F.col("n_c") > 0))
    ate = supp.agg(
        F.sum(F.col("n_t") + F.col("n_c")).cast("long").alias("n_common"),
        F.count(F.lit(1)).cast("long").alias("n_support_strata"),
        (
            F.sum(
                F.round(
                    F.col("y_t").cast("double") / F.col("n_t")
                    - F.col("y_c").cast("double") / F.col("n_c"),
                    6,
                ).cast("decimal(28,6)")
                * (F.col("n_t") + F.col("n_c"))
            ).cast("double")
            / F.sum(F.col("n_t") + F.col("n_c"))
        ).alias("ate_raw"),
    )
    naive = u.agg(
        F.round(
            F.sum(F.when(F.col("t") == 1, F.col("y")).otherwise(0)).cast("double")
            / F.sum("t")
            - F.sum(F.when(F.col("t") == 0, F.col("y")).otherwise(0)).cast("double")
            / F.sum(1 - F.col("t")),
            6,
        ).alias("naive_diff_cents"),
        F.count(F.lit(1)).cast("long").alias("n_users"),
        F.sum("t").cast("long").alias("n_treated"),
        (F.count(F.lit(1)) - F.sum("t")).cast("long").alias("n_control"),
        F.countDistinct("strat").cast("long").alias("n_strata"),
    )
    return naive.crossJoin(F.broadcast(ate)).select(
        "n_users",
        "n_treated",
        "n_control",
        "n_strata",
        "n_support_strata",
        "n_common",
        F.round(F.col("n_common").cast("double") / F.col("n_users"), 6).alias(
            "support_share"
        ),
        "naive_diff_cents",
        F.round(F.col("ate_raw"), 6).alias("ate_cents"),
    )
