"""Model TRAINING as aggregation (SURVEY.md §2K extensions X-87/X-88/
X-89): decision-stump split search, Naive Bayes fit + holdout eval, and
logistic regression by IRLS — the three classic classifiers whose
training loops collapse to exactly the mergeable-aggregate shapes this
engine already certifies (prefix sums, count tables, moment rollups).
The point at 100 TB: none of these needs a learning framework — the
sufficient statistics ARE group-bys, so training rides the same
partial-aggregation machinery as any revenue rollup.

Determinism: labels and features derive from md5 hashes and exact
integer counts (no RNG); split scores, count tables, and Newton steps
run in exact integer/decimal arithmetic with total-order argmaxes;
the only libm surface is the q203 idiom (ln/exp results rounded to a
fixed decimal grid before any cross-row sum).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.ordering import pin, stage
from ..tables import load
from .registry import query

#: conversion label — any purchase strictly above this value (same
#: threshold as the X-23 A/B machinery, ~45% positive rate).
_CONV_MIN = 150

_STUMP_ORACLE = f"""
    WITH u AS (
        SELECT user_id, CAST(COUNT(*) AS BIGINT) AS x,
               MAX(CASE WHEN event_type = 'purchase' AND value > {_CONV_MIN}
                   THEN 1 ELSE 0 END) AS y
        FROM events GROUP BY user_id
    ),
    xa AS (
        SELECT x, CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(y) AS BIGINT) AS pos
        FROM u GROUP BY x
    ),
    tot AS (
        SELECT CAST(SUM(n) AS BIGINT) AS nt, CAST(SUM(pos) AS BIGINT) AS post
        FROM xa
    ),
    cum AS (
        SELECT x,
               CAST(SUM(n) OVER (ORDER BY x) AS BIGINT) AS n_l,
               CAST(SUM(pos) OVER (ORDER BY x) AS BIGINT) AS pos_l
        FROM xa
    ),
    sc AS (
        SELECT c.x AS threshold, c.n_l, c.pos_l,
               t.nt - c.n_l AS n_r, t.post - c.pos_l AS pos_r,
               CAST(((CAST(c.pos_l AS HUGEINT) * c.pos_l
                      + CAST(c.n_l - c.pos_l AS HUGEINT) * (c.n_l - c.pos_l))
                         * (t.nt - c.n_l)
                     + (CAST(t.post - c.pos_l AS HUGEINT) * (t.post - c.pos_l)
                        + CAST((t.nt - c.n_l) - (t.post - c.pos_l) AS HUGEINT)
                              * ((t.nt - c.n_l) - (t.post - c.pos_l)))
                         * c.n_l) * 1000000
                    // (CAST(c.n_l AS HUGEINT) * (t.nt - c.n_l))
                    AS BIGINT) AS s_micro
        FROM cum c, tot t
        WHERE c.n_l < t.nt
    ),
    best AS (
        SELECT threshold, n_l, pos_l, n_r, pos_r, s_micro,
               ROW_NUMBER() OVER (ORDER BY s_micro DESC, threshold) AS rn
        FROM sc
    )
    SELECT b.threshold, b.n_l AS n_left, b.pos_l AS pos_left,
           b.n_r AS n_right, b.pos_r AS pos_right,
           CAST(b.pos_l AS DOUBLE) / b.n_l AS rate_left,
           CAST(b.pos_r AS DOUBLE) / b.n_r AS rate_right,
           CAST(b.s_micro AS DOUBLE) / 1e6 / t.nt AS purity_score,
           t.nt AS n_users
    FROM best b, tot t WHERE b.rn = 1
"""


@query("q297_decision_stump", oracle=_STUMP_ORACLE, tags=("X-88", "W-03"))
def q297_decision_stump(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact decision-stump training: the best 'activity <= t' split of
    users for predicting conversion, by minimum weighted Gini impurity
    over EVERY candidate threshold — the CART inner loop (and the weak
    learner of every boosting stack) as a relational prefix-sum: one
    pass builds the per-value (count, positives) table, a cumulative
    window turns it into left/right contingency tables for all
    thresholds at once, and the argmin is a total-order top-1. No
    gradient, no sampling of candidate splits — at any scale the split
    search is exact.

    Minimizing weighted Gini is equivalent to maximizing
    S = (pos_l^2 + neg_l^2)/n_l + (pos_r^2 + neg_r^2)/n_r (the
    n*G = n - S identity), which this computes over the common
    denominator n_l*n_r as ONE exact integer floor-division to micro
    resolution — the argmax runs on exact integers under a
    (s_micro DESC, threshold) total order, so no float comparison ever
    decides the split. Readout rates/score are raw-double IEEE on exact
    operands.

    Scale shape: ONE user-keyed fact rollup, one x-keyed rollup to the
    bounded distinct-activity relation, a cumulative window + argmax on
    that bounded relation. The 100 TB cost is the first rollup; the
    split search itself is O(|distinct x|).

    Reference parity: beyond-reference capability (the reference has no
    model-training surface)."""
    u = (
        load(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("x"),
            F.max(
                F.when(
                    (F.col("event_type") == "purchase")
                    & (F.col("value") > _CONV_MIN),
                    1,
                ).otherwise(0)
            ).alias("y"),
        )
    )
    xa = (
        u.groupBy("x")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("y").cast("long").alias("pos"),
        )
        .transform(stage)  # totals + the cumulative scan share it
    )
    tot = xa.agg(
        F.sum("n").cast("long").alias("nt"),
        F.sum("pos").cast("long").alias("post"),
    )
    w = Window.orderBy("x").rowsBetween(Window.unboundedPreceding, 0)
    cum = xa.select(
        "x",
        F.sum("n").over(w).cast("long").alias("n_l"),
        F.sum("pos").over(w).cast("long").alias("pos_l"),
    )
    d20 = "decimal(20,0)"
    neg_l = F.col("n_l") - F.col("pos_l")
    n_r = F.col("nt") - F.col("n_l")
    pos_r = F.col("post") - F.col("pos_l")
    neg_r = n_r - pos_r
    s_micro = (
        (
            (
                F.col("pos_l").cast(d20) * F.col("pos_l")
                + neg_l.cast(d20) * neg_l
            )
            * n_r
            + (pos_r.cast(d20) * pos_r + neg_r.cast(d20) * neg_r)
            * F.col("n_l")
        ).cast("decimal(38,0)")
        * F.lit(1000000)
    ).alias("s_num")
    sc = (
        cum.crossJoin(F.broadcast(tot))
        .filter(F.col("n_l") < F.col("nt"))
        .select(
            F.col("x").alias("threshold"),
            "n_l",
            "pos_l",
            n_r.alias("n_r"),
            pos_r.alias("pos_r"),
            "nt",
            s_micro,
            (F.col("n_l").cast(d20) * n_r).cast("decimal(38,0)").alias("s_den"),
        )
        .select(
            "threshold",
            "n_l",
            "pos_l",
            "n_r",
            "pos_r",
            "nt",
            F.expr("CAST(s_num div s_den AS BIGINT)").alias("s_micro"),
        )
    )
    best = sc.withColumn(
        "rn",
        F.row_number().over(Window.orderBy(F.col("s_micro").desc(), "threshold")),
    ).filter(F.col("rn") == 1)
    return best.select(
        "threshold",
        F.col("n_l").alias("n_left"),
        F.col("pos_l").alias("pos_left"),
        F.col("n_r").alias("n_right"),
        F.col("pos_r").alias("pos_right"),
        (F.col("pos_l").cast("double") / F.col("n_l")).alias("rate_left"),
        (F.col("pos_r").cast("double") / F.col("n_r")).alias("rate_right"),
        (F.col("s_micro").cast("double") / F.lit(1e6) / F.col("nt")).alias(
            "purity_score"
        ),
        F.col("nt").alias("n_users"),
    )


# ---------------------------------------------------------------------------
# X-89: Naive Bayes fit + holdout evaluation
# ---------------------------------------------------------------------------

#: user features — FIXED activity buckets (x<8, x<32, else) and a
#: majority-weekend flag; fixed boundaries keep the feature map a pure
#: function of the user's own rows (no train-dependent quantile edges).
_NB_FEAT = """
    SELECT user_id,
           CASE WHEN n_ev < 8 THEN 0 WHEN n_ev < 32 THEN 1 ELSE 2 END AS f1,
           CASE WHEN 2 * wk_ev >= n_ev THEN 1 ELSE 0 END AS f2,
           y,
           CASE WHEN substr(md5('nb:' || CAST(user_id AS VARCHAR)), 1, 1) < 'c'
                THEN 1 ELSE 0 END AS is_train
    FROM (
        SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_ev,
               CAST(SUM(CASE WHEN ({dow}) IN (0, 6) THEN 1 ELSE 0 END)
                    AS BIGINT) AS wk_ev,
               MAX(CASE WHEN event_type = 'purchase' AND value > {conv}
                   THEN 1 ELSE 0 END) AS y
        FROM events GROUP BY user_id
    )
"""

_NBAYES_ORACLE = f"""
    WITH feat AS (
        {_NB_FEAT.format(dow="(CAST(FLOOR(epoch(date_trunc('day', ts))) AS BIGINT) // 86400 + 4) % 7", conv=_CONV_MIN)}
    ),
    train AS (SELECT * FROM feat WHERE is_train = 1),
    cls AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_tr,
               CAST(SUM(y) AS BIGINT) AS n1
        FROM train
    ),
    g1 AS (
        SELECT c.c, v.v, CAST(COUNT(t.user_id) AS BIGINT) AS cnt
        FROM (VALUES (0), (1)) c(c)
        CROSS JOIN (VALUES (0), (1), (2)) v(v)
        LEFT JOIN train t ON t.y = c.c AND t.f1 = v.v
        GROUP BY c.c, v.v
    ),
    g2 AS (
        SELECT c.c, v.v, CAST(COUNT(t.user_id) AS BIGINT) AS cnt
        FROM (VALUES (0), (1)) c(c)
        CROSS JOIN (VALUES (0), (1)) v(v)
        LEFT JOIN train t ON t.y = c.c AND t.f2 = v.v
        GROUP BY c.c, v.v
    ),
    lp1 AS (
        SELECT g.c, g.v,
               CAST(ROUND(ln(CAST(g.cnt + 1 AS DOUBLE)
                             / (CASE WHEN g.c = 1 THEN s.n1
                                     ELSE s.n_tr - s.n1 END + 3)), 6)
                    AS DECIMAL(12,6)) AS lnp
        FROM g1 g, cls s
    ),
    lp2 AS (
        SELECT g.c, g.v,
               CAST(ROUND(ln(CAST(g.cnt + 1 AS DOUBLE)
                             / (CASE WHEN g.c = 1 THEN s.n1
                                     ELSE s.n_tr - s.n1 END + 2)), 6)
                    AS DECIMAL(12,6)) AS lnp
        FROM g2 g, cls s
    ),
    pri AS (
        SELECT CAST(ROUND(ln(CAST(s.n_tr - s.n1 + 1 AS DOUBLE) / (s.n_tr + 2)), 6)
                    AS DECIMAL(12,6)) AS pri0,
               CAST(ROUND(ln(CAST(s.n1 + 1 AS DOUBLE) / (s.n_tr + 2)), 6)
                    AS DECIMAL(12,6)) AS pri1
        FROM cls s
    ),
    scored AS (
        SELECT f.y,
               CASE WHEN (p.pri1 + a1.lnp + b1.lnp)
                         > (p.pri0 + a0.lnp + b0.lnp)
                    THEN 1 ELSE 0 END AS yhat
        FROM feat f
        CROSS JOIN pri p
        JOIN lp1 a0 ON a0.c = 0 AND a0.v = f.f1
        JOIN lp1 a1 ON a1.c = 1 AND a1.v = f.f1
        JOIN lp2 b0 ON b0.c = 0 AND b0.v = f.f2
        JOIN lp2 b1 ON b1.c = 1 AND b1.v = f.f2
        WHERE f.is_train = 0
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_test,
           CAST(SUM(CASE WHEN y = 1 AND yhat = 1 THEN 1 ELSE 0 END) AS BIGINT) AS tp,
           CAST(SUM(CASE WHEN y = 0 AND yhat = 1 THEN 1 ELSE 0 END) AS BIGINT) AS fp,
           CAST(SUM(CASE WHEN y = 1 AND yhat = 0 THEN 1 ELSE 0 END) AS BIGINT) AS fn,
           CAST(SUM(CASE WHEN y = 0 AND yhat = 0 THEN 1 ELSE 0 END) AS BIGINT) AS tn,
           CAST(SUM(CASE WHEN y = yhat THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*)
               AS accuracy,
           CASE WHEN SUM(CASE WHEN yhat = 1 THEN 1 ELSE 0 END) > 0
                THEN CAST(SUM(CASE WHEN y = 1 AND yhat = 1 THEN 1 ELSE 0 END)
                          AS DOUBLE)
                     / SUM(CASE WHEN yhat = 1 THEN 1 ELSE 0 END) END AS precision_,
           CASE WHEN SUM(CASE WHEN y = 1 THEN 1 ELSE 0 END) > 0
                THEN CAST(SUM(CASE WHEN y = 1 AND yhat = 1 THEN 1 ELSE 0 END)
                          AS DOUBLE)
                     / SUM(CASE WHEN y = 1 THEN 1 ELSE 0 END) END AS recall_
    FROM scored
"""


@query("q298_naive_bayes", oracle=_NBAYES_ORACLE, tags=("X-89", "X-16"))
def q298_naive_bayes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Naive Bayes classifier trained on a 75% md5 holdout split and
    evaluated on the remaining 25%: Laplace-smoothed class-conditional
    count tables over two user features (fixed activity bucket,
    majority-weekend flag) predicting conversion, with confusion-matrix
    counts and accuracy/precision/recall — the complete train/score/eval
    loop of the simplest real classifier, expressed as what it actually
    is at scale: ONE user rollup, a handful of BOUNDED count tables, and
    a map-only broadcast-join scorer (the 'model' is six smoothed
    log-ratios — it broadcasts like any small dimension).

    Determinism: the split is the X-16 md5-nibble hash (RNG-free); all
    counts are exact integers; each smoothed log-likelihood is the q203
    idiom (ln of a ratio of exact integers, rounded 6 dp into
    decimal(12,6)); scores are 3-term exact decimal sums compared
    exactly, with ties broken to class 0 by the strict '>' — no float
    comparison anywhere in the decision.

    Scale shape: one user-keyed fact rollup; training is two
    grid-completed rollups onto <=6-row relations; scoring joins only
    broadcast parameter tables (map-only); evaluation is one ungrouped
    confusion rollup. Nothing but the first rollup touches fact scale.

    Reference parity: beyond-reference (the reference consumes model
    outputs from torch; it cannot train anything)."""
    dow = F.pmod(
        (F.unix_timestamp(F.date_trunc("day", F.col("ts"))) / F.lit(86400))
        .cast("long")
        + 4,
        F.lit(7),
    )
    feat = (
        load(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_ev"),
            F.sum(F.when(dow.isin(0, 6), 1).otherwise(0))
            .cast("long")
            .alias("wk_ev"),
            F.max(
                F.when(
                    (F.col("event_type") == "purchase")
                    & (F.col("value") > _CONV_MIN),
                    1,
                ).otherwise(0)
            ).alias("y"),
        )
        .select(
            "user_id",
            F.when(F.col("n_ev") < 8, 0)
            .when(F.col("n_ev") < 32, 1)
            .otherwise(2)
            .alias("f1"),
            F.when(7 * F.col("wk_ev") >= 2 * F.col("n_ev"), 1)
            .otherwise(0)
            .alias("f2"),
            "y",
            F.when(
                F.substring(
                    F.md5(F.concat(F.lit("nb:"), F.col("user_id").cast("string"))),
                    1,
                    1,
                )
                < "c",
                1,
            )
            .otherwise(0)
            .alias("is_train"),
        )
        .transform(stage)  # training rollups + the scorer share it
    )
    train = feat.filter(F.col("is_train") == 1)
    cls = train.agg(
        F.count(F.lit(1)).cast("long").alias("n_tr"),
        F.sum("y").cast("long").alias("n1"),
    )

    def _lp(grid_vals: list[int], col: str, k: int) -> DataFrame:
        grid = spark.createDataFrame(
            [(c, v) for c in (0, 1) for v in grid_vals], "c int, v int"
        )
        cnt = (
            grid.join(
                train.groupBy(
                    F.col("y").alias("c"), F.col(col).alias("v")
                ).agg(F.count(F.lit(1)).cast("long").alias("cnt")),
                ["c", "v"],
                "left",
            )
            .na.fill({"cnt": 0})
            .crossJoin(F.broadcast(cls))
        )
        nc = F.when(F.col("c") == 1, F.col("n1")).otherwise(
            F.col("n_tr") - F.col("n1")
        )
        return cnt.select(
            "c",
            "v",
            F.round(
                F.log((F.col("cnt") + 1).cast("double") / (nc + k)), 6
            )
            .cast("decimal(12,6)")
            .alias("lnp"),
        )

    lp1, lp2 = _lp([0, 1, 2], "f1", 3), _lp([0, 1], "f2", 2)
    pri = cls.select(
        F.round(
            F.log(
                (F.col("n_tr") - F.col("n1") + 1).cast("double")
                / (F.col("n_tr") + 2)
            ),
            6,
        )
        .cast("decimal(12,6)")
        .alias("pri0"),
        F.round(
            F.log((F.col("n1") + 1).cast("double") / (F.col("n_tr") + 2)), 6
        )
        .cast("decimal(12,6)")
        .alias("pri1"),
    )

    def _side(tab: DataFrame, c: int, fcol: str, out: str) -> DataFrame:
        return tab.filter(F.col("c") == c).select(
            F.col("v").alias(fcol), F.col("lnp").alias(out)
        )

    scored = (
        feat.filter(F.col("is_train") == 0)
        .crossJoin(F.broadcast(pri))
        .join(F.broadcast(_side(lp1, 0, "f1", "a0")), "f1")
        .join(F.broadcast(_side(lp1, 1, "f1", "a1")), "f1")
        .join(F.broadcast(_side(lp2, 0, "f2", "b0")), "f2")
        .join(F.broadcast(_side(lp2, 1, "f2", "b1")), "f2")
        .select(
            "y",
            F.when(
                (F.col("pri1") + F.col("a1") + F.col("b1"))
                > (F.col("pri0") + F.col("a0") + F.col("b0")),
                1,
            )
            .otherwise(0)
            .alias("yhat"),
        )
    )
    y1h1 = F.sum(F.when((F.col("y") == 1) & (F.col("yhat") == 1), 1).otherwise(0))
    h1 = F.sum(F.when(F.col("yhat") == 1, 1).otherwise(0))
    y1 = F.sum(F.when(F.col("y") == 1, 1).otherwise(0))
    return scored.agg(
        F.count(F.lit(1)).cast("long").alias("n_test"),
        y1h1.cast("long").alias("tp"),
        F.sum(F.when((F.col("y") == 0) & (F.col("yhat") == 1), 1).otherwise(0))
        .cast("long")
        .alias("fp"),
        F.sum(F.when((F.col("y") == 1) & (F.col("yhat") == 0), 1).otherwise(0))
        .cast("long")
        .alias("fn"),
        F.sum(F.when((F.col("y") == 0) & (F.col("yhat") == 0), 1).otherwise(0))
        .cast("long")
        .alias("tn"),
        (
            F.sum(F.when(F.col("y") == F.col("yhat"), 1).otherwise(0)).cast(
                "double"
            )
            / F.count(F.lit(1))
        ).alias("accuracy"),
        F.when(h1 > 0, y1h1.cast("double") / h1).alias("precision_"),
        F.when(y1 > 0, y1h1.cast("double") / y1).alias("recall_"),
    )


# ---------------------------------------------------------------------------
# X-87: logistic regression by IRLS (Newton) in exact integer pico-units
# ---------------------------------------------------------------------------

_IRLS_ITERS = 3
_X_CAP = 10000  #: activity feature cap — bounds every integer product below


def _tdiv(a: int, b: int) -> int:
    """Truncating integer division (DuckDB HUGEINT `//` semantics: round
    toward zero), vs Python's flooring `//` — they differ on negative
    numerators, and the Newton numerators can be negative."""
    q = a // b
    if q < 0 and q * b != a:
        q += 1
    return q


def _irls_u_cte() -> str:
    return f"""
    u AS (
        SELECT user_id,
               LEAST(CAST(COUNT(*) AS BIGINT), {_X_CAP}) AS xc,
               MAX(CASE WHEN event_type = 'purchase' AND value > {_CONV_MIN}
                   THEN 1 ELSE 0 END) AS y
        FROM events GROUP BY user_id
    )"""


def _irls_iter_ctes() -> tuple[str, str]:
    ctes = ""
    prev = "beta0"
    for t in range(1, _IRLS_ITERS + 1):
        ctes += f""",
    mom{t} AS (
        SELECT SUM(p * (1 - p)) AS sw,
               SUM(p * (1 - p) * CAST(xc AS DECIMAL(5,0))) AS swx,
               SUM(p * (1 - p) * CAST(xc * xc AS DECIMAL(9,0))) AS swx2,
               SUM(y - p) AS sr,
               SUM((y - p) * CAST(xc AS DECIMAL(5,0))) AS srx
        FROM (
            SELECT u.xc, u.y,
                   CAST(ROUND(1 / (1 + exp(-(CAST(b.b0 + b.b1 * u.xc AS DOUBLE)
                                             / 1e12))), 9)
                        AS DECIMAL(10,9)) AS p
            FROM u CROSS JOIN {prev} b
        )
    ),
    nm{t} AS (
        SELECT CAST(FLOOR(sw * 1000000000) AS HUGEINT) AS nw,
               CAST(FLOOR(swx * 1000000000) AS HUGEINT) AS nwx,
               CAST(FLOOR(swx2 * 1000000000) AS HUGEINT) AS nwx2,
               CAST(FLOOR(sr * 1000000000) AS HUGEINT) AS nr,
               CAST(FLOOR(srx * 1000000000) AS HUGEINT) AS nrx
        FROM mom{t}
    ),
    beta{t} AS (
        SELECT b.b0 + CAST((((n.nwx2 * n.nr - n.nwx * n.nrx) // 1000000000000)
                            * 1000000000000)
                           // ((n.nw * n.nwx2 - n.nwx * n.nwx) // 1000000000000)
                           AS BIGINT) AS b0,
               b.b1 + CAST((((n.nw * n.nrx - n.nwx * n.nr) // 1000000000000)
                            * 1000000000000)
                           // ((n.nw * n.nwx2 - n.nwx * n.nwx) // 1000000000000)
                           AS BIGINT) AS b1
        FROM nm{t} n, {prev} b
    )"""
        prev = f"beta{t}"
    return ctes, prev


def _irls_oracle() -> str:
    ctes, last = _irls_iter_ctes()
    return f"""
    WITH {_irls_u_cte()},
    beta0 AS (SELECT CAST(0 AS BIGINT) AS b0, CAST(0 AS BIGINT) AS b1){ctes},
    scored AS (
        SELECT u.y,
               CAST(ROUND(1 / (1 + exp(-(CAST(b.b0 + b.b1 * u.xc AS DOUBLE)
                                         / 1e12))), 9)
                    AS DECIMAL(10,9)) AS p
        FROM u CROSS JOIN {last} b
    )
    SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM u) AS n_users,
           (SELECT CAST(b0 AS DOUBLE) / 1e12 FROM {last}) AS beta0,
           (SELECT CAST(b1 AS DOUBLE) / 1e12 FROM {last}) AS beta1,
           CAST(SUM(CASE WHEN p > 0.5 THEN 1 ELSE 0 END) AS BIGINT) AS n_pred_pos,
           CAST(SUM(y) AS BIGINT) AS n_pos,
           CAST(SUM(CASE WHEN (p > 0.5) = (y = 1) THEN 1 ELSE 0 END) AS DOUBLE)
               / COUNT(*) AS accuracy,
           CAST(SUM(p) AS DOUBLE) / COUNT(*) AS mean_p
    FROM scored
"""


@query("q299_logistic_irls", oracle=_irls_oracle(), tags=("X-87", "A-14"))
def q299_logistic_irls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Logistic regression of conversion on (capped) user activity,
    trained by 3 IRLS/Newton iterations — the canonical GLM fit, run
    the way it distributes: each iteration is ONE mergeable 5-moment
    rollup (sum of w, wx, wx^2, y-p, (y-p)x with w = p(1-p)), and the
    2x2 Newton solve touches only those five numbers. 'Training = a
    group-by per iteration' is the entire scale story; the same shape
    fits billions of rows because only the moment vector crosses the
    shuffle.

    Determinism: beta lives as exact integer pico-units (the q221/q296
    discipline). Per row, z = (b0 + b1*x)/1e12 is one IEEE division of
    an exact int64; the sigmoid is the q203 libm idiom (result rounded
    to 9 dp before anything sums); all five moments are exact decimal
    sums of those rounded terms; the Newton step FLOORs the moments to
    exact nano-integers and solves Cramer's 2x2 entirely in integer
    arithmetic (the pre-shift by 1e12 keeps every product inside
    HUGEINT/decimal(38)); the driver's Python mirror uses truncating
    division (_tdiv) because DuckDB `//` truncates toward zero on
    negative numerators while Python floors. Betas and metrics are raw
    doubles from exact sub-2^53 integers.

    Scale shape: the user rollup is staged once; each of the 3
    iterations plus the final scoring pass is map-only over it ending
    in an ungrouped moment rollup; only the 5-tuple reaches the driver
    per iteration (the X-15 convergence-loop discipline).

    Reference parity: beyond-reference (the reference consumes a
    pretrained torch model; it cannot fit one)."""
    from decimal import ROUND_FLOOR, Decimal

    u = (
        load(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.least(F.count(F.lit(1)).cast("long"), F.lit(_X_CAP)).alias("xc"),
            F.max(
                F.when(
                    (F.col("event_type") == "purchase")
                    & (F.col("value") > _CONV_MIN),
                    1,
                ).otherwise(0)
            ).alias("y"),
        )
        .transform(stage)  # 3 iterations + the scoring pass share it
    )

    def p_col(b0: int, b1: int):
        z = (F.lit(b0) + F.lit(b1) * F.col("xc")).cast("double") / F.lit(1e12)
        return F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-z)), 9).cast(
            "decimal(10,9)"
        )

    b0, b1 = 0, 0
    for _ in range(_IRLS_ITERS):
        p = p_col(b0, b1)
        w = p * (1 - p)
        mom = u.select(
            w.alias("w"),
            (w * F.col("xc").cast("decimal(5,0)")).alias("wx"),
            (w * (F.col("xc") * F.col("xc")).cast("decimal(9,0)")).alias("wx2"),
            (F.col("y") - p).alias("r"),
            ((F.col("y") - p) * F.col("xc").cast("decimal(5,0)")).alias("rx"),
        ).agg(
            F.sum("w").alias("sw"),
            F.sum("wx").alias("swx"),
            F.sum("wx2").alias("swx2"),
            F.sum("r").alias("sr"),
            F.sum("rx").alias("srx"),
        ).first()

        def nano(d) -> int:
            return int(
                (Decimal(d) * 10**9).to_integral_value(rounding=ROUND_FLOOR)
            )

        nw, nwx, nwx2 = nano(mom["sw"]), nano(mom["swx"]), nano(mom["swx2"])
        nr, nrx = nano(mom["sr"]), nano(mom["srx"])
        det = nw * nwx2 - nwx * nwx
        det_s = det // 10**12  # det > 0 for a nondegenerate design
        b0 += _tdiv(_tdiv(nwx2 * nr - nwx * nrx, 10**12) * 10**12, det_s)
        b1 += _tdiv(_tdiv(nw * nrx - nwx * nr, 10**12) * 10**12, det_s)

    p = p_col(b0, b1)
    pred = p > F.lit(0.5).cast("decimal(10,9)")
    scored = u.select("y", p.alias("p"), pred.alias("pred"))
    return scored.agg(
        F.count(F.lit(1)).cast("long").alias("n_users"),
        F.lit(float(b0) / 1e12).alias("beta0"),
        F.lit(float(b1) / 1e12).alias("beta1"),
        F.sum(F.when(F.col("pred"), 1).otherwise(0)).cast("long").alias(
            "n_pred_pos"
        ),
        F.sum("y").cast("long").alias("n_pos"),
        (
            F.sum(
                F.when(F.col("pred") == (F.col("y") == 1), 1).otherwise(0)
            ).cast("double")
            / F.count(F.lit(1))
        ).alias("accuracy"),
        (F.sum("p").cast("double") / F.count(F.lit(1))).alias("mean_p"),
    )


# ---------------------------------------------------------------------------
# X-93: gradient boosting (two stagewise regression stumps, all-integer)
# ---------------------------------------------------------------------------

_GB_ORACLE = f"""
    WITH u AS (
        SELECT user_id,
               LEAST(CAST(COUNT(*) AS BIGINT), {_X_CAP}) AS xc,
               CASE WHEN 7 * SUM(CASE WHEN
                        (CAST(FLOOR(epoch(date_trunc('day', ts))) AS BIGINT)
                         // 86400 + 4) % 7 IN (0, 6) THEN 1 ELSE 0 END)
                        >= 2 * COUNT(*) THEN 1 ELSE 0 END AS f2,
               CAST(SUM(CASE WHEN event_type = 'purchase'
                        THEN CAST(FLOOR(value * 100 + 0.5) AS BIGINT)
                        ELSE 0 END) AS BIGINT) AS y
        FROM events GROUP BY user_id
    ),
    g AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(y) AS BIGINT) AS s
          FROM u),
    r0 AS (
        SELECT u.xc, u.f2, u.y - (SELECT s // n FROM g) AS r
        FROM u
    ),
    xa AS (
        SELECT xc, CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(r) AS BIGINT) AS s
        FROM r0 GROUP BY xc
    ),
    tot AS (SELECT CAST(SUM(n) AS BIGINT) AS nt, CAST(SUM(s) AS BIGINT) AS st
            FROM xa),
    cum AS (
        SELECT xc,
               CAST(SUM(n) OVER (ORDER BY xc) AS BIGINT) AS n_l,
               CAST(SUM(s) OVER (ORDER BY xc) AS BIGINT) AS s_l
        FROM xa
    ),
    sc AS (
        SELECT c.xc AS t1, c.n_l, c.s_l, t.nt - c.n_l AS n_r,
               t.st - c.s_l AS s_r,
               (CAST(c.s_l AS HUGEINT) * c.s_l * (t.nt - c.n_l)
                + CAST(t.st - c.s_l AS HUGEINT) * (t.st - c.s_l) * c.n_l)
                   * 1000000
                   // (CAST(c.n_l AS HUGEINT) * (t.nt - c.n_l)) AS score
        FROM cum c, tot t WHERE c.n_l < t.nt
    ),
    best AS (
        SELECT t1, n_l, s_l, n_r, s_r,
               s_l // n_l AS v_l, s_r // n_r AS v_r,
               ROW_NUMBER() OVER (ORDER BY score DESC, t1) AS rn
        FROM sc
    ),
    r1 AS (
        SELECT q.f2,
               q.r - (CASE WHEN q.xc <= b.t1 THEN b.v_l ELSE b.v_r END) AS r
        FROM r0 q, (SELECT * FROM best WHERE rn = 1) b
    ),
    lv2 AS (
        SELECT CAST(CASE WHEN SUM(CASE WHEN f2 = 0 THEN 1 ELSE 0 END) = 0 THEN 0
                    ELSE CAST(SUM(CASE WHEN f2 = 0 THEN r ELSE 0 END) AS BIGINT)
                         // SUM(CASE WHEN f2 = 0 THEN 1 ELSE 0 END) END AS BIGINT)
                   AS v20,
               CAST(CASE WHEN SUM(CASE WHEN f2 = 1 THEN 1 ELSE 0 END) = 0 THEN 0
                    ELSE CAST(SUM(CASE WHEN f2 = 1 THEN r ELSE 0 END) AS BIGINT)
                         // SUM(CASE WHEN f2 = 1 THEN 1 ELSE 0 END) END AS BIGINT)
                   AS v21
        FROM r1
    ),
    sse AS (
        SELECT
            (SELECT SUM(CAST(r AS HUGEINT) * r) FROM r0) AS e0,
            (SELECT SUM(CAST(r AS HUGEINT) * r) FROM r1) AS e1,
            (SELECT SUM(CAST(q.r - (CASE WHEN q.f2 = 0 THEN l.v20 ELSE l.v21 END)
                             AS HUGEINT)
                        * (q.r - (CASE WHEN q.f2 = 0 THEN l.v20 ELSE l.v21 END)))
             FROM r1 q, lv2 l) AS e2
    )
    SELECT (SELECT s // n FROM g) AS base_cents,
           b.t1 AS split_activity, b.v_l AS leaf_lo_cents, b.v_r AS leaf_hi_cents,
           l.v20 AS leaf_wkday_cents, l.v21 AS leaf_wkend_cents,
           CAST(e.e0 // 1000000 AS BIGINT) AS sse0_div1e6,
           CAST(e.e1 // 1000000 AS BIGINT) AS sse1_div1e6,
           CAST(e.e2 // 1000000 AS BIGINT) AS sse2_div1e6,
           1 - CAST(e.e2 // 1000000 AS DOUBLE) / CAST(e.e0 // 1000000 AS BIGINT)
               AS r2_model
    FROM (SELECT * FROM best WHERE rn = 1) b, lv2 l, sse e
"""


@query("q303_boosted_stumps", oracle=_GB_ORACLE, tags=("X-93", "X-88"))
def q303_boosted_stumps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-round stagewise gradient boosting with regression stumps (L2
    loss): stage 0 fits the global mean of per-user revenue, round 1
    fits the best activity split to the residuals (argmax of
    s_l^2*n_r + s_r^2*n_l over the common denominator — the variance-
    reduction twin of q297's Gini identity), round 2 fits the
    weekend-flag stump to the remaining residuals — the GBM training
    loop as iterated aggregation: each round is ONE rollup + prefix
    scan + argmax, and 'fit to residuals' is a map-only subtraction
    with the previous round's 2-leaf model broadcast.

    Determinism: predictions are truncating integer divisions (Spark
    `div` and DuckDB `//` both round toward zero — verified identical,
    including on the negative residual sums), so every residual is an
    EXACT integer at every stage; split scores are exact integer
    floor-divisions under a (score DESC, threshold) total order; SSEs
    are exact integer sums read out in 1e6 units (< 2^53, conversion-
    safe). The single double is the final R^2 ratio.

    Scale shape: one user-keyed fact rollup; per round one bounded-
    domain rollup (capped activity / binary flag), a window on that
    bounded relation, and a broadcast of the 2-leaf model. Rounds
    compose map-only — the fact table is touched once.

    Reference parity: beyond-reference; extends X-88's classification
    stump to regression + boosting."""
    dow = F.pmod(
        (F.unix_timestamp(F.date_trunc("day", F.col("ts"))) / F.lit(86400))
        .cast("long")
        + 4,
        F.lit(7),
    )
    u = (
        load(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.least(F.count(F.lit(1)).cast("long"), F.lit(_X_CAP)).alias("xc"),
            F.sum(F.when(dow.isin(0, 6), 1).otherwise(0)).alias("wk_ev"),
            F.count(F.lit(1)).alias("n_ev"),
            F.sum(
                F.when(
                    F.col("event_type") == "purchase",
                    F.floor(F.col("value") * 100 + 0.5).cast("long"),
                ).otherwise(0)
            )
            .cast("long")
            .alias("y"),
        )
        .select(
            "xc",
            F.when(7 * F.col("wk_ev") >= 2 * F.col("n_ev"), 1)
            .otherwise(0)
            .alias("f2"),
            "y",
        )
        .transform(stage)  # base fit + both boosting rounds share it
    )
    g = u.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("y").cast("long").alias("s"),
    ).select("n", "s", F.expr("s div n").alias("base"))
    r0 = u.crossJoin(F.broadcast(g)).select(
        "xc", "f2", (F.col("y") - F.col("base")).alias("r"), "base"
    ).transform(stage)  # split search + residual passes share it
    xa = r0.groupBy("xc").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("r").cast("long").alias("s"),
    )
    tot = xa.agg(
        F.sum("n").cast("long").alias("nt"), F.sum("s").cast("long").alias("st")
    )
    w = Window.orderBy("xc").rowsBetween(Window.unboundedPreceding, 0)
    cum = xa.select(
        "xc",
        F.sum("n").over(w).cast("long").alias("n_l"),
        F.sum("s").over(w).cast("long").alias("s_l"),
    )
    d20 = "decimal(20,0)"
    n_r = F.col("nt") - F.col("n_l")
    s_r = F.col("st") - F.col("s_l")
    sc = (
        cum.crossJoin(F.broadcast(tot))
        .filter(F.col("n_l") < F.col("nt"))
        .select(
            F.col("xc").alias("t1"),
            "n_l",
            "s_l",
            n_r.alias("n_r"),
            s_r.alias("s_r"),
            (
                (
                    F.col("s_l").cast(d20) * F.col("s_l") * n_r
                    + s_r.cast(d20) * s_r * F.col("n_l")
                ).cast("decimal(38,0)")
                * F.lit(1000000)
            ).alias("s_num"),
            (F.col("n_l").cast(d20) * n_r).cast("decimal(38,0)").alias("s_den"),
        )
        .select(
            "t1",
            "n_l",
            "s_l",
            "n_r",
            "s_r",
            F.expr("s_num div s_den").alias("score"),
        )
    )
    best = (
        sc.withColumn(
            "rn",
            F.row_number().over(Window.orderBy(F.col("score").desc(), "t1")),
        )
        .filter(F.col("rn") == 1)
        .select(
            "t1",
            F.expr("s_l div n_l").alias("v_l"),
            F.expr("s_r div n_r").alias("v_r"),
        )
    )
    r1 = r0.crossJoin(F.broadcast(best)).select(
        "f2",
        "base",
        "t1",
        "v_l",
        "v_r",
        (
            F.col("r")
            - F.when(F.col("xc") <= F.col("t1"), F.col("v_l")).otherwise(
                F.col("v_r")
            )
        ).alias("r"),
    ).transform(stage)  # leaf fit + the SSE passes share it
    lv2 = r1.agg(
        F.expr(
            "CASE WHEN SUM(CASE WHEN f2 = 0 THEN 1 ELSE 0 END) = 0 THEN 0"
            " ELSE CAST(SUM(CASE WHEN f2 = 0 THEN r ELSE 0 END) AS BIGINT)"
            " div SUM(CASE WHEN f2 = 0 THEN 1 ELSE 0 END) END"
        ).alias("v20"),
        F.expr(
            "CASE WHEN SUM(CASE WHEN f2 = 1 THEN 1 ELSE 0 END) = 0 THEN 0"
            " ELSE CAST(SUM(CASE WHEN f2 = 1 THEN r ELSE 0 END) AS BIGINT)"
            " div SUM(CASE WHEN f2 = 1 THEN 1 ELSE 0 END) END"
        ).alias("v21"),
    )
    sse01 = r0.agg(
        F.sum((F.col("r").cast(d20) * F.col("r")).cast("decimal(38,0)"))
        .cast("decimal(38,0)")
        .alias("e0")
    ).crossJoin(
        r1.agg(
            F.sum((F.col("r").cast(d20) * F.col("r")).cast("decimal(38,0)"))
            .cast("decimal(38,0)")
            .alias("e1")
        )
    )
    r2rel = r1.crossJoin(F.broadcast(lv2)).select(
        (
            F.col("r")
            - F.when(F.col("f2") == 0, F.col("v20")).otherwise(F.col("v21"))
        ).alias("r"),
        "base",
        "t1",
        "v_l",
        "v_r",
        "v20",
        "v21",
    )
    final = (
        r2rel.groupBy("base", "t1", "v_l", "v_r", "v20", "v21")
        .agg(
            F.sum((F.col("r").cast(d20) * F.col("r")).cast("decimal(38,0)"))
            .cast("decimal(38,0)")
            .alias("e2")
        )
        .crossJoin(F.broadcast(sse01))
    )
    e0d = F.expr("CAST(e0 div 1000000 AS BIGINT)")
    e2d = F.expr("CAST(e2 div 1000000 AS BIGINT)")
    return final.select(
        F.col("base").alias("base_cents"),
        F.col("t1").alias("split_activity"),
        F.col("v_l").alias("leaf_lo_cents"),
        F.col("v_r").alias("leaf_hi_cents"),
        F.col("v20").alias("leaf_wkday_cents"),
        F.col("v21").alias("leaf_wkend_cents"),
        e0d.alias("sse0_div1e6"),
        F.expr("CAST(e1 div 1000000 AS BIGINT)").alias("sse1_div1e6"),
        e2d.alias("sse2_div1e6"),
        (F.lit(1) - e2d.cast("double") / e0d).alias("r2_model"),
    )


# ---------------------------------------------------------------------------
# X-99: two-component Poisson mixture by EM (casual vs power users)
# ---------------------------------------------------------------------------

_EM_ITERS = 3


def _em_iter_ctes() -> tuple[str, str]:
    ctes = ""
    prev = "th0"
    for t in range(1, _EM_ITERS + 1):
        ctes += f""",
    rr{t} AS (
        SELECT a.x, a.n,
               CAST(ROUND(1 / (1 + exp(
                   ROUND(ln(CAST(1000000000000 - p.pi1 AS DOUBLE) / p.pi1), 6)
                   + CAST(p.l1 - p.l2 AS DOUBLE) / 1e12
                   + a.x * ROUND(ln(CAST(p.l2 AS DOUBLE) / p.l1), 6))), 9)
                    AS DECIMAL(10,9)) AS r
        FROM xa a CROSS JOIN {prev} p
    ),
    mm{t} AS (
        SELECT CAST(FLOOR(SUM(r * CAST(n AS DECIMAL(12,0))) * 1000000000)
                    AS HUGEINT) AS n9r,
               CAST(FLOOR(SUM(r * CAST(n * x AS DECIMAL(14,0))) * 1000000000)
                    AS HUGEINT) AS n9rx
        FROM rr{t}
    ),
    th{t} AS (
        SELECT CAST((m.n9rx * 1000000000000) // m.n9r AS BIGINT) AS l1,
               CAST(((t.t9x - m.n9rx) * 1000000000000) // (t.n9 - m.n9r)
                    AS BIGINT) AS l2,
               CAST((m.n9r * 1000000000000) // t.n9 AS BIGINT) AS pi1
        FROM mm{t} m, tots t
    )"""
        prev = f"th{t}"
    return ctes, prev


def _em_oracle() -> str:
    ctes, last = _em_iter_ctes()
    return f"""
    WITH u AS (
        SELECT user_id, LEAST(CAST(COUNT(*) AS BIGINT), {_X_CAP}) AS x
        FROM events GROUP BY user_id
    ),
    xa AS (SELECT x, CAST(COUNT(*) AS BIGINT) AS n FROM u GROUP BY x),
    tots AS (
        SELECT CAST(SUM(CAST(n AS HUGEINT)) * 1000000000 AS HUGEINT) AS n9,
               CAST(SUM(CAST(n AS HUGEINT) * x) * 1000000000 AS HUGEINT) AS t9x,
               CAST(SUM(n) AS BIGINT) AS nn
        FROM xa
    ),
    th0 AS (
        SELECT CAST((t9x // n9) * 1000000000000 // 2 AS BIGINT) AS l1,
               CAST((t9x // n9) * 1000000000000 * 2 AS BIGINT) AS l2,
               CAST(500000000000 AS BIGINT) AS pi1
        FROM tots
    ){ctes},
    fin AS (
        SELECT a.x, a.n,
               CAST(ROUND(1 / (1 + exp(
                   ROUND(ln(CAST(1000000000000 - p.pi1 AS DOUBLE) / p.pi1), 6)
                   + CAST(p.l1 - p.l2 AS DOUBLE) / 1e12
                   + a.x * ROUND(ln(CAST(p.l2 AS DOUBLE) / p.l1), 6))), 9)
                    AS DECIMAL(10,9)) AS r
        FROM xa a CROSS JOIN {last} p
    )
    SELECT t.nn AS n_users,
           CAST(p.l1 AS DOUBLE) / 1e12 AS lambda_lo,
           CAST(p.l2 AS DOUBLE) / 1e12 AS lambda_hi,
           CAST(p.pi1 AS DOUBLE) / 1e12 AS pi_lo,
           CAST(SUM(CASE WHEN f.r > 0.5 THEN f.n ELSE 0 END) AS BIGINT)
               AS n_class_lo
    FROM fin f, {last} p, tots t
    GROUP BY t.nn, p.l1, p.l2, p.pi1
"""


@query("q309_poisson_mixture_em", oracle=_em_oracle(), tags=("X-99", "A-14"))
def q309_poisson_mixture_em(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-component Poisson mixture over per-user activity, fit by 3 EM
    iterations — the unsupervised 'casual vs power user' segmentation
    as its own generative model (q263's empirical Bayes shrinks toward
    ONE population; this discovers that there are TWO), and the third
    classic iterative trainer alongside q195's k-means and q299's IRLS,
    all in the same shape: an E-step that is one map-only expression
    and an M-step that is one mergeable rollup.

    Determinism: EM runs on the BOUNDED (activity, count) relation, so
    the E-step evaluates ONE sigmoid per distinct activity value: the
    log-odds d = ln(pi2/pi1) + (l1-l2)/1e12 + x*ln(l2/l1) uses the q203
    pinned-ln idiom on parameters held as exact pico integers, and the
    responsibility rounds to 9 dp (the q299 sigmoid discipline) before
    the exact decimal M-step sums; new parameters are integer floor
    divisions of FLOORed nano-moments (all positive — floor == DuckDB
    // == Python //). The driver mirrors the oracle's integer updates
    exactly (three scalars per iteration cross the boundary, the X-15
    discipline).

    Scale shape: ONE user-keyed fact rollup, one rollup to the bounded
    activity domain; every EM pass runs on that bounded relation.

    Reference parity: beyond-reference; extends the X-87/X-93 training
    family to unsupervised fitting."""
    from decimal import ROUND_FLOOR, Decimal

    u = (
        load(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.least(F.count(F.lit(1)).cast("long"), F.lit(_X_CAP)).alias("x"))
    )
    xa = (
        u.groupBy("x")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .transform(stage)  # every EM pass reads this bounded relation
    )
    tots = xa.agg(
        F.sum("n").cast("long").alias("nn"),
        F.sum(F.col("n") * F.col("x")).cast("long").alias("sx"),
    ).first()
    nn, sx = int(tots["nn"]), int(tots["sx"])
    n9, t9x = nn * 10**9, sx * 10**9
    m = t9x // n9
    l1, l2, pi1 = m * 10**12 // 2, m * 10**12 * 2, 500000000000

    def r_col(l1: int, l2: int, pi1: int):
        d = (
            F.round(F.log(F.lit(float(10**12 - pi1)) / F.lit(float(pi1))), 6)
            + F.lit(float(l1 - l2)) / F.lit(1e12)
            + F.col("x") * F.round(F.log(F.lit(float(l2)) / F.lit(float(l1))), 6)
        )
        return F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(d)), 9).cast(
            "decimal(10,9)"
        )

    for _ in range(_EM_ITERS):
        r = r_col(l1, l2, pi1)
        mom = xa.agg(
            F.sum(r * F.col("n").cast("decimal(12,0)")).alias("sr"),
            F.sum(r * (F.col("n") * F.col("x")).cast("decimal(14,0)")).alias(
                "srx"
            ),
        ).first()

        def nano9(d) -> int:
            return int(
                (Decimal(d) * 10**9).to_integral_value(rounding=ROUND_FLOOR)
            )

        n9r, n9rx = nano9(mom["sr"]), nano9(mom["srx"])
        l1 = (n9rx * 10**12) // n9r
        l2 = ((t9x - n9rx) * 10**12) // (n9 - n9r)
        pi1 = (n9r * 10**12) // n9
    r = r_col(l1, l2, pi1)
    half = F.lit(0.5).cast("decimal(10,9)")
    return xa.agg(
        F.lit(nn).cast("long").alias("n_users"),
        F.lit(float(l1) / 1e12).alias("lambda_lo"),
        F.lit(float(l2) / 1e12).alias("lambda_hi"),
        F.lit(float(pi1) / 1e12).alias("pi_lo"),
        F.sum(F.when(r > half, F.col("n")).otherwise(0))
        .cast("long")
        .alias("n_class_lo"),
    )


# ---------------------------------------------------------------------------
# X-104: data valuation by leave-one-group-out ablation
# ---------------------------------------------------------------------------

_VAL_GROUPS = 8

_VAL_FEAT_SQL = f"""
        SELECT user_id,
               CASE WHEN n_ev < 8 THEN 0 WHEN n_ev < 32 THEN 1 ELSE 2 END AS f1,
               CASE WHEN 2 * wk_ev >= n_ev THEN 1 ELSE 0 END AS f2,
               y,
               CASE WHEN substr(md5('nb:' || CAST(user_id AS VARCHAR)), 1, 1) < 'c'
                    THEN 1 ELSE 0 END AS is_train,
               (instr('0123456789abcdef',
                      substr(md5('val:' || CAST(user_id AS VARCHAR)), 1, 1)) - 1)
                   % {_VAL_GROUPS} AS g
        FROM (
            SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_ev,
                   CAST(SUM(CASE WHEN
                        (CAST(FLOOR(epoch(date_trunc('day', ts))) AS BIGINT)
                         // 86400 + 4) % 7 IN (0, 6) THEN 1 ELSE 0 END)
                        AS BIGINT) AS wk_ev,
                   MAX(CASE WHEN event_type = 'purchase' AND value > {_CONV_MIN}
                       THEN 1 ELSE 0 END) AS y
            FROM events GROUP BY user_id
        )
"""


def _val_param_sql(feat: str, vals: str, k: int) -> str:
    """Per-model Laplace-smoothed log-ratios for one feature, pivoted to
    (m, v, lnp0, lnp1)."""
    return f"""
        SELECT md.m, vv.v,
               CAST(ROUND(ln(CAST(COALESCE(f0.c, 0)
                                  - COALESCE(gg0.c, 0) + 1 AS DOUBLE)
                             / (cm.n0_m + {k})), 6) AS DECIMAL(12,6)) AS lnp0,
               CAST(ROUND(ln(CAST(COALESCE(f1x.c, 0)
                                  - COALESCE(gg1.c, 0) + 1 AS DOUBLE)
                             / (cm.n1_m + {k})), 6) AS DECIMAL(12,6)) AS lnp1
        FROM models md
        CROSS JOIN (SELECT unnest([{vals}]) AS v) vv
        JOIN clsm cm ON cm.m = md.m
        LEFT JOIN (SELECT {feat} AS v, y, CAST(COUNT(*) AS BIGINT) AS c
                   FROM train GROUP BY 1, 2) f0
            ON f0.v = vv.v AND f0.y = 0
        LEFT JOIN (SELECT {feat} AS v, y, CAST(COUNT(*) AS BIGINT) AS c
                   FROM train GROUP BY 1, 2) f1x
            ON f1x.v = vv.v AND f1x.y = 1
        LEFT JOIN (SELECT {feat} AS v, y, g, CAST(COUNT(*) AS BIGINT) AS c
                   FROM train GROUP BY 1, 2, 3) gg0
            ON gg0.v = vv.v AND gg0.y = 0 AND gg0.g = md.m
        LEFT JOIN (SELECT {feat} AS v, y, g, CAST(COUNT(*) AS BIGINT) AS c
                   FROM train GROUP BY 1, 2, 3) gg1
            ON gg1.v = vv.v AND gg1.y = 1 AND gg1.g = md.m
"""


_VAL_ORACLE = f"""
    WITH feat AS ({_VAL_FEAT_SQL}),
    train AS (SELECT * FROM feat WHERE is_train = 1),
    models AS (SELECT unnest(range(-1, {_VAL_GROUPS})) AS m),
    gcls AS (
        SELECT g, CAST(COUNT(*) AS BIGINT) AS n_g,
               CAST(SUM(y) AS BIGINT) AS n1_g
        FROM train GROUP BY g
    ),
    cls AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_tr,
                   CAST(SUM(y) AS BIGINT) AS n1 FROM train),
    clsm AS (
        SELECT md.m,
               c.n_tr - COALESCE(gc.n_g, 0) AS n_m,
               (c.n_tr - COALESCE(gc.n_g, 0))
                   - (c.n1 - COALESCE(gc.n1_g, 0)) AS n0_m,
               c.n1 - COALESCE(gc.n1_g, 0) AS n1_m
        FROM models md
        CROSS JOIN cls c
        LEFT JOIN gcls gc ON gc.g = md.m
    ),
    p1 AS ({_val_param_sql("f1", "0, 1, 2", 3)}),
    p2 AS ({_val_param_sql("f2", "0, 1", 2)}),
    pri AS (
        SELECT m,
               CAST(ROUND(ln(CAST(n0_m + 1 AS DOUBLE) / (n_m + 2)), 6)
                    AS DECIMAL(12,6)) AS pri0,
               CAST(ROUND(ln(CAST(n1_m + 1 AS DOUBLE) / (n_m + 2)), 6)
                    AS DECIMAL(12,6)) AS pri1
        FROM clsm
    ),
    scored AS (
        SELECT md.m, f.y,
               CASE WHEN (r.pri1 + a.lnp1 + b.lnp1)
                         > (r.pri0 + a.lnp0 + b.lnp0)
                    THEN 1 ELSE 0 END AS yhat
        FROM feat f
        CROSS JOIN models md
        JOIN pri r ON r.m = md.m
        JOIN p1 a ON a.m = md.m AND a.v = f.f1
        JOIN p2 b ON b.m = md.m AND b.v = f.f2
        WHERE f.is_train = 0
    ),
    acc AS (
        SELECT m, CAST(COUNT(*) AS BIGINT) AS n_test,
               CAST(SUM(CASE WHEN y = yhat THEN 1 ELSE 0 END) AS BIGINT) AS hits
        FROM scored GROUP BY m
    )
    SELECT a.m AS left_out_group,
           COALESCE(gc.n_g, 0) AS n_train_dropped,
           CAST(a.hits AS DOUBLE) / a.n_test AS accuracy,
           CAST(a.hits - af.full_hits AS DOUBLE) / a.n_test AS delta_vs_full
    FROM acc a
    CROSS JOIN (SELECT hits AS full_hits FROM acc WHERE m = -1) af
    LEFT JOIN gcls gc ON gc.g = a.m
    ORDER BY left_out_group
"""


@query("q314_data_valuation_loo", oracle=_VAL_ORACLE, tags=("X-104", "X-89"))
def q314_data_valuation_loo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data valuation by leave-one-group-out ablation: hash the training
    users into 8 groups, retrain q298's Naive Bayes WITHOUT each group,
    and score every ablated model on the same fixed holdout — the
    accuracy delta per dropped group is that slice's contribution to
    the model (the poor-man's Data Shapley, and the group-level
    workhorse of data-markets/curation pipelines: a group whose removal
    RAISES accuracy is hurting you). The trick that makes it one query
    instead of 8 training jobs: NB's sufficient statistics are counts,
    so every ablated model derives from the full count tables by EXACT
    SUBTRACTION of the group's counts (the q285 total-minus-fold move)
    — no retraining pass ever runs.

    Determinism: splits and groups are md5 hashes; all count tables are
    exact integers; the 9 models' log-params use the q203 pinned-ln
    idiom into decimal(12,6); scoring compares exact 3-term decimal
    sums (q298 discipline); accuracies are raw-double IEEE on exact
    counts.

    Scale shape: ONE user rollup; training is bounded grid rollups;
    the 9-model scoring is a map-only 9x fan-out of the holdout with
    ONLY broadcast parameter joins; one (model)-keyed confusion rollup.

    Reference parity: beyond-reference; the valuation layer on top of
    X-89."""
    dow = F.pmod(
        (F.unix_timestamp(F.date_trunc("day", F.col("ts"))) / F.lit(86400))
        .cast("long")
        + 4,
        F.lit(7),
    )
    feat = (
        load(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_ev"),
            F.sum(F.when(dow.isin(0, 6), 1).otherwise(0))
            .cast("long")
            .alias("wk_ev"),
            F.max(
                F.when(
                    (F.col("event_type") == "purchase")
                    & (F.col("value") > _CONV_MIN),
                    1,
                ).otherwise(0)
            ).alias("y"),
        )
        .select(
            "user_id",
            F.when(F.col("n_ev") < 8, 0)
            .when(F.col("n_ev") < 32, 1)
            .otherwise(2)
            .alias("f1"),
            F.when(2 * F.col("wk_ev") >= F.col("n_ev"), 1).otherwise(0).alias("f2"),
            "y",
            F.when(
                F.substring(
                    F.md5(F.concat(F.lit("nb:"), F.col("user_id").cast("string"))),
                    1,
                    1,
                )
                < "c",
                1,
            )
            .otherwise(0)
            .alias("is_train"),
            (
                (
                    F.instr(
                        F.lit("0123456789abcdef"),
                        F.substring(
                            F.md5(
                                F.concat(
                                    F.lit("val:"),
                                    F.col("user_id").cast("string"),
                                )
                            ),
                            1,
                            1,
                        ),
                    )
                    - 1
                )
                % _VAL_GROUPS
            ).alias("g"),
        )
        .transform(stage)  # count tables + the holdout scorer share it
    )
    train = feat.filter(F.col("is_train") == 1)
    models = spark.createDataFrame(
        [(m,) for m in range(-1, _VAL_GROUPS)], "m int"
    )
    gcls = train.groupBy("g").agg(
        F.count(F.lit(1)).cast("long").alias("n_g"),
        F.sum("y").cast("long").alias("n1_g"),
    )
    cls = train.agg(
        F.count(F.lit(1)).cast("long").alias("n_tr"),
        F.sum("y").cast("long").alias("n1"),
    )
    clsm = (
        models.crossJoin(F.broadcast(cls))
        .join(F.broadcast(gcls), models["m"] == gcls["g"], "left")
        .na.fill({"n_g": 0, "n1_g": 0})
        .select(
            "m",
            (F.col("n_tr") - F.col("n_g")).alias("n_m"),
            (
                (F.col("n_tr") - F.col("n_g")) - (F.col("n1") - F.col("n1_g"))
            ).alias("n0_m"),
            (F.col("n1") - F.col("n1_g")).alias("n1_m"),
        )
    )

    def params(col: str, vals: list[int], k: int) -> DataFrame:
        grid = spark.createDataFrame([(v,) for v in vals], "v int")
        fc = train.groupBy(F.col(col).alias("v"), "y").agg(
            F.count(F.lit(1)).cast("long").alias("c")
        )
        gc = train.groupBy(F.col(col).alias("v"), "y", "g").agg(
            F.count(F.lit(1)).cast("long").alias("c")
        )

        def leg(y: int, out: str) -> DataFrame:
            f = fc.filter(F.col("y") == y).select("v", F.col("c").alias("fc"))
            gl = gc.filter(F.col("y") == y).select(
                "v", F.col("g").alias("m"), F.col("c").alias("gc")
            )
            base = (
                models.crossJoin(F.broadcast(grid))
                .join(F.broadcast(f), "v", "left")
                .join(F.broadcast(gl), ["m", "v"], "left")
                .na.fill({"fc": 0, "gc": 0})
            )
            return base.select(
                "m", "v", (F.col("fc") - F.col("gc")).alias(out)
            )

        cnt = leg(0, "c0").join(F.broadcast(leg(1, "c1")), ["m", "v"]).join(
            F.broadcast(clsm), "m"
        )
        return cnt.select(
            "m",
            "v",
            F.round(
                F.log((F.col("c0") + 1).cast("double") / (F.col("n0_m") + k)), 6
            )
            .cast("decimal(12,6)")
            .alias("lnp0"),
            F.round(
                F.log((F.col("c1") + 1).cast("double") / (F.col("n1_m") + k)), 6
            )
            .cast("decimal(12,6)")
            .alias("lnp1"),
        )

    p1, p2 = params("f1", [0, 1, 2], 3), params("f2", [0, 1], 2)
    pri = clsm.select(
        "m",
        F.round(
            F.log((F.col("n0_m") + 1).cast("double") / (F.col("n_m") + 2)), 6
        )
        .cast("decimal(12,6)")
        .alias("pri0"),
        F.round(
            F.log((F.col("n1_m") + 1).cast("double") / (F.col("n_m") + 2)), 6
        )
        .cast("decimal(12,6)")
        .alias("pri1"),
    )
    scored = (
        feat.filter(F.col("is_train") == 0)
        .crossJoin(F.broadcast(models))
        .join(F.broadcast(pri), "m")
        .join(
            F.broadcast(
                p1.select("m", F.col("v").alias("f1"), F.col("lnp0").alias("a0"),
                          F.col("lnp1").alias("a1"))
            ),
            ["m", "f1"],
        )
        .join(
            F.broadcast(
                p2.select("m", F.col("v").alias("f2"), F.col("lnp0").alias("b0"),
                          F.col("lnp1").alias("b1"))
            ),
            ["m", "f2"],
        )
        .select(
            "m",
            "y",
            F.when(
                (F.col("pri1") + F.col("a1") + F.col("b1"))
                > (F.col("pri0") + F.col("a0") + F.col("b0")),
                1,
            )
            .otherwise(0)
            .alias("yhat"),
        )
    )
    acc = scored.groupBy("m").agg(
        F.count(F.lit(1)).cast("long").alias("n_test"),
        F.sum(F.when(F.col("y") == F.col("yhat"), 1).otherwise(0))
        .cast("long")
        .alias("hits"),
    )
    full = acc.filter(F.col("m") == -1).select(
        F.col("hits").alias("full_hits")
    )
    return (
        acc.crossJoin(F.broadcast(full))
        .join(F.broadcast(gcls), acc["m"] == gcls["g"], "left")
        .na.fill({"n_g": 0})
        .select(
            F.col("m").alias("left_out_group"),
            F.col("n_g").cast("long").alias("n_train_dropped"),
            (F.col("hits").cast("double") / F.col("n_test")).alias("accuracy"),
            (
                (F.col("hits") - F.col("full_hits")).cast("double")
                / F.col("n_test")
            ).alias("delta_vs_full"),
        )
        .transform(pin)
        .orderBy("left_out_group")
    )


# ---------------------------------------------------------------------------
# X-111: cost-sensitive decision threshold for the logistic scorer
# ---------------------------------------------------------------------------

_CT_C_FP = 1  #: cost of acting on a non-converter
_CT_C_FN = 4  #: cost of missing a converter

_CT_ORACLE = f"""
    WITH u AS (
        SELECT user_id, LEAST(CAST(COUNT(*) AS BIGINT), {_X_CAP}) AS xc,
               MAX(CASE WHEN event_type = 'purchase' AND value > {_CONV_MIN}
                   THEN 1 ELSE 0 END) AS y
        FROM events GROUP BY user_id
    ),
    xa AS (
        SELECT xc, CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(y) AS BIGINT) AS pos
        FROM u GROUP BY xc
    ),
    tot AS (SELECT CAST(SUM(n) AS BIGINT) AS nt, CAST(SUM(pos) AS BIGINT) AS post
            FROM xa),
    cum AS (
        SELECT xc,
               CAST(SUM(n) OVER (ORDER BY xc DESC) AS BIGINT) AS n_ge,
               CAST(SUM(pos) OVER (ORDER BY xc DESC) AS BIGINT) AS pos_ge
        FROM xa
    ),
    cost AS (
        SELECT c.xc AS threshold, c.n_ge, c.pos_ge,
               {_CT_C_FP} * (c.n_ge - c.pos_ge)
               + {_CT_C_FN} * (t.post - c.pos_ge) AS total_cost
        FROM cum c, tot t
        UNION ALL
        SELECT NULL, CAST(0 AS BIGINT), CAST(0 AS BIGINT),
               {_CT_C_FN} * t.post
        FROM tot t
    ),
    best AS (
        SELECT threshold, n_ge, pos_ge, total_cost,
               ROW_NUMBER() OVER (ORDER BY total_cost,
                                  COALESCE(threshold, 9223372036854775807)) AS rn
        FROM cost
    )
    SELECT b.threshold AS act_if_activity_ge,
           b.n_ge AS n_acted_on, b.pos_ge AS converters_reached,
           CAST(b.total_cost AS BIGINT) AS total_cost,
           CAST({_CT_C_FN} AS BIGINT) * t.post AS cost_do_nothing,
           CAST({_CT_C_FP} AS BIGINT) * (t.nt - t.post) AS cost_act_on_all
    FROM best b, tot t WHERE b.rn = 1
"""


@query("q321_cost_threshold", oracle=_CT_ORACLE, tags=("X-111", "X-88"))
def q321_cost_threshold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cost-sensitive decision threshold: with asymmetric action costs
    (false positive = 1, missed converter = 4), sweep EVERY 'act if
    activity >= t' policy via a single descending cumulative scan and
    pick the exact cost minimizer — including the degenerate
    never-act/always-act endpoints as explicit alternatives. This is
    the step that turns a SCORE (q299's probabilities are monotone in
    activity) into a DECISION, and the asymmetric-cost generalization
    of q297's accuracy-flavored split: the optimal threshold moves
    when the cost ratio does, which is exactly what this readout
    demonstrates against the two baselines.

    Determinism: reach/conversion counts per threshold come from one
    descending cumulative window over the bounded activity rollup; all
    costs are exact integers; the argmin is a (cost, threshold) total
    order with never-act sorted last via a sentinel. No float exists.

    Scale shape: ONE user rollup, one bounded-domain rollup, one
    window + argmax on that bounded relation (the q297 shape reversed).

    Reference parity: beyond-reference."""
    u = (
        load(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.least(F.count(F.lit(1)).cast("long"), F.lit(_X_CAP)).alias("xc"),
            F.max(
                F.when(
                    (F.col("event_type") == "purchase")
                    & (F.col("value") > _CONV_MIN),
                    1,
                ).otherwise(0)
            ).alias("y"),
        )
    )
    xa = (
        u.groupBy("xc")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("y").cast("long").alias("pos"),
        )
        .transform(stage)
    )
    tot = xa.agg(
        F.sum("n").cast("long").alias("nt"),
        F.sum("pos").cast("long").alias("post"),
    )
    w = Window.orderBy(F.col("xc").desc()).rowsBetween(
        Window.unboundedPreceding, 0
    )
    cum = xa.select(
        "xc",
        F.sum("n").over(w).cast("long").alias("n_ge"),
        F.sum("pos").over(w).cast("long").alias("pos_ge"),
    )
    cost = (
        cum.crossJoin(F.broadcast(tot))
        .select(
            F.col("xc").alias("threshold"),
            "n_ge",
            "pos_ge",
            (
                F.lit(_CT_C_FP) * (F.col("n_ge") - F.col("pos_ge"))
                + F.lit(_CT_C_FN) * (F.col("post") - F.col("pos_ge"))
            ).alias("total_cost"),
        )
        .unionByName(
            tot.select(
                F.lit(None).cast("long").alias("threshold"),
                F.lit(0).cast("long").alias("n_ge"),
                F.lit(0).cast("long").alias("pos_ge"),
                (F.lit(_CT_C_FN) * F.col("post")).alias("total_cost"),
            )
        )
    )
    best = (
        cost.withColumn(
            "rn",
            F.row_number().over(
                Window.orderBy(
                    "total_cost",
                    F.coalesce(F.col("threshold"), F.lit(2**63 - 1)),
                )
            ),
        )
        .filter(F.col("rn") == 1)
    )
    return best.crossJoin(F.broadcast(tot)).select(
        F.col("threshold").alias("act_if_activity_ge"),
        F.col("n_ge").alias("n_acted_on"),
        F.col("pos_ge").alias("converters_reached"),
        F.col("total_cost").cast("long").alias("total_cost"),
        (F.lit(_CT_C_FN) * F.col("post")).cast("long").alias("cost_do_nothing"),
        (F.lit(_CT_C_FP) * (F.col("nt") - F.col("post")))
        .cast("long")
        .alias("cost_act_on_all"),
    )


# ---------------------------------------------------------------------------
# X-113: cross-validated model selection (stump vs constant, 4 folds)
# ---------------------------------------------------------------------------

_CV_FOLDS = 4

_CV_ORACLE = f"""
    WITH u AS (
        SELECT user_id, LEAST(CAST(COUNT(*) AS BIGINT), {_X_CAP}) AS x,
               MAX(CASE WHEN event_type = 'purchase' AND value > {_CONV_MIN}
                   THEN 1 ELSE 0 END) AS y,
               (instr('0123456789abcdef',
                      substr(md5('cv:' || CAST(user_id AS VARCHAR)), 1, 1)) - 1)
                   % {_CV_FOLDS} AS f
        FROM events GROUP BY user_id
    ),
    xf AS (
        SELECT x, f, CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(y) AS BIGINT) AS pos
        FROM u GROUP BY x, f
    ),
    xd AS (SELECT DISTINCT x FROM xf),
    grid AS (
        SELECT xd.x, fo.f, COALESCE(xf.n, 0) AS n, COALESCE(xf.pos, 0) AS pos
        FROM xd
        CROSS JOIN (SELECT unnest(range(0, {_CV_FOLDS})) AS f) fo
        LEFT JOIN xf ON xf.x = xd.x AND xf.f = fo.f
    ),
    cumf AS (
        SELECT x, f,
               CAST(SUM(n) OVER (PARTITION BY f ORDER BY x) AS BIGINT) AS cn,
               CAST(SUM(pos) OVER (PARTITION BY f ORDER BY x) AS BIGINT) AS cp,
               CAST(SUM(n) OVER (PARTITION BY f) AS BIGINT) AS tn,
               CAST(SUM(pos) OVER (PARTITION BY f) AS BIGINT) AS tp
        FROM grid
    ),
    tot AS (
        SELECT x,
               CAST(SUM(cn) AS BIGINT) AS cn_all,
               CAST(SUM(cp) AS BIGINT) AS cp_all
        FROM cumf GROUP BY x
    ),
    gtot AS (
        SELECT CAST(SUM(n) AS BIGINT) AS n_all, CAST(SUM(pos) AS BIGINT) AS p_all
        FROM xf
    ),
    trcum AS (
        SELECT c.f, c.x,
               t.cn_all - c.cn AS n_l, t.cp_all - c.cp AS pos_l,
               g.n_all - c.tn AS n_tr, g.p_all - c.tp AS pos_tr
        FROM cumf c JOIN tot t USING (x), gtot g
    ),
    sc AS (
        SELECT f, x AS t1, n_l, pos_l, n_tr, pos_tr,
               n_tr - n_l AS n_r, pos_tr - pos_l AS pos_r,
               ((CAST(pos_l AS HUGEINT) * pos_l
                 + CAST(n_l - pos_l AS HUGEINT) * (n_l - pos_l)) * (n_tr - n_l)
                + (CAST(pos_tr - pos_l AS HUGEINT) * (pos_tr - pos_l)
                   + CAST((n_tr - n_l) - (pos_tr - pos_l) AS HUGEINT)
                         * ((n_tr - n_l) - (pos_tr - pos_l))) * n_l) * 1000000
                   // (CAST(n_l AS HUGEINT) * (n_tr - n_l)) AS score
        FROM trcum
        WHERE n_l > 0 AND n_l < n_tr
    ),
    best AS (
        SELECT f, t1, n_tr, pos_tr,
               CASE WHEN 2 * pos_l > n_l THEN 1 ELSE 0 END AS maj_l,
               CASE WHEN 2 * pos_r > n_r THEN 1 ELSE 0 END AS maj_r,
               CASE WHEN 2 * pos_tr > n_tr THEN 1 ELSE 0 END AS maj_c,
               ROW_NUMBER() OVER (PARTITION BY f ORDER BY score DESC, t1) AS rn
        FROM sc
    ),
    err AS (
        SELECT b.f, b.t1, b.maj_c,
               CAST(SUM(CASE WHEN xf.x <= b.t1
                        THEN CASE WHEN b.maj_l = 1 THEN xf.n - xf.pos
                                  ELSE xf.pos END
                        ELSE CASE WHEN b.maj_r = 1 THEN xf.n - xf.pos
                                  ELSE xf.pos END END) AS BIGINT) AS err_stump,
               CAST(SUM(CASE WHEN b.maj_c = 1 THEN xf.n - xf.pos
                        ELSE xf.pos END) AS BIGINT) AS err_const,
               CAST(SUM(xf.n) AS BIGINT) AS n_test
        FROM (SELECT * FROM best WHERE rn = 1) b
        JOIN xf ON xf.f = b.f
        GROUP BY b.f, b.t1, b.maj_c
    )
    SELECT f AS fold, t1 AS threshold, n_test, err_stump, err_const,
           CAST(err_stump AS DOUBLE) / n_test AS cv_error_stump,
           CAST(err_const AS DOUBLE) / n_test AS cv_error_const
    FROM err ORDER BY fold
"""


@query("q323_cross_validated_stump", oracle=_CV_ORACLE, tags=("X-113", "X-88", "X-16"))
def q323_cross_validated_stump(spark: SparkSession, sf_dir: str) -> DataFrame:
    """4-fold cross-validated model selection: per fold, train q297's
    decision stump on the OTHER three folds and score it on the held
    fold against the constant (majority-class) baseline — the honest
    out-of-sample comparison q297's in-sample purity cannot give (a
    split always looks better in-sample; CV says whether it
    generalizes). The move that makes it ONE query instead of 4
    training jobs: every fold's training contingency curve DERIVES from
    the global cumulative curve minus the fold's own (the q285/q314
    total-minus-part trick), so the fold fan-out is a bounded grid,
    never a data re-scan.

    Determinism: folds are md5 hashes; all contingency/cumulative
    counts are exact integers on the grid-completed (activity x fold)
    relation; split scores are the q297 exact integer floor-division
    under a per-fold (score DESC, threshold) total order; leaf
    majorities and error counts are pure integer comparisons; the two
    doubles are display-scaled error rates.

    Scale shape: ONE user rollup; the grid is |distinct activity| x 4;
    cumulative windows partition by fold (keyed); evaluation joins the
    4 best rows against the bounded per-fold counts.

    Reference parity: beyond-reference; composes X-88 and X-16 into
    the model-selection protocol."""
    u = (
        load(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.least(F.count(F.lit(1)).cast("long"), F.lit(_X_CAP)).alias("x"),
            F.max(
                F.when(
                    (F.col("event_type") == "purchase")
                    & (F.col("value") > _CONV_MIN),
                    1,
                ).otherwise(0)
            ).alias("y"),
        )
        .select(
            "x",
            "y",
            (
                (
                    F.instr(
                        F.lit("0123456789abcdef"),
                        F.substring(
                            F.md5(
                                F.concat(
                                    F.lit("cv:"), F.col("user_id").cast("string")
                                )
                            ),
                            1,
                            1,
                        ),
                    )
                    - 1
                )
                % _CV_FOLDS
            ).alias("f"),
        )
    )
    xf = (
        u.groupBy("x", "f")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("y").cast("long").alias("pos"),
        )
        .transform(stage)  # grid, totals, and the eval join share it
    )
    xd = xf.select("x").distinct()
    folds = spark.createDataFrame([(f,) for f in range(_CV_FOLDS)], "f int")
    grid = (
        xd.crossJoin(F.broadcast(folds))
        .join(xf, ["x", "f"], "left")
        .na.fill({"n": 0, "pos": 0})
    )
    wf = (
        Window.partitionBy("f")
        .orderBy("x")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wt = Window.partitionBy("f")
    cumf = grid.select(
        "x",
        "f",
        F.sum("n").over(wf).cast("long").alias("cn"),
        F.sum("pos").over(wf).cast("long").alias("cp"),
        F.sum("n").over(wt).cast("long").alias("tn"),
        F.sum("pos").over(wt).cast("long").alias("tp"),
    ).transform(stage)
    tot = cumf.groupBy("x").agg(
        F.sum("cn").cast("long").alias("cn_all"),
        F.sum("cp").cast("long").alias("cp_all"),
    )
    gtot = xf.agg(
        F.sum("n").cast("long").alias("n_all"),
        F.sum("pos").cast("long").alias("p_all"),
    )
    trcum = (
        cumf.join(tot, "x")
        .crossJoin(F.broadcast(gtot))
        .select(
            "f",
            "x",
            (F.col("cn_all") - F.col("cn")).alias("n_l"),
            (F.col("cp_all") - F.col("cp")).alias("pos_l"),
            (F.col("n_all") - F.col("tn")).alias("n_tr"),
            (F.col("p_all") - F.col("tp")).alias("pos_tr"),
        )
    )
    d20 = "decimal(20,0)"
    n_r = F.col("n_tr") - F.col("n_l")
    pos_r = F.col("pos_tr") - F.col("pos_l")
    neg_l = F.col("n_l") - F.col("pos_l")
    neg_r = n_r - pos_r
    sc = (
        trcum.filter((F.col("n_l") > 0) & (F.col("n_l") < F.col("n_tr")))
        .select(
            "f",
            F.col("x").alias("t1"),
            "n_l",
            "pos_l",
            "n_tr",
            "pos_tr",
            n_r.alias("n_r"),
            pos_r.alias("pos_r"),
            (
                (
                    (
                        F.col("pos_l").cast(d20) * F.col("pos_l")
                        + neg_l.cast(d20) * neg_l
                    )
                    * n_r
                    + (pos_r.cast(d20) * pos_r + neg_r.cast(d20) * neg_r)
                    * F.col("n_l")
                ).cast("decimal(38,0)")
                * F.lit(1000000)
            ).alias("s_num"),
            (F.col("n_l").cast(d20) * n_r).cast("decimal(38,0)").alias("s_den"),
        )
        .select(
            "f",
            "t1",
            "n_l",
            "pos_l",
            "n_r",
            "pos_r",
            "n_tr",
            "pos_tr",
            F.expr("CAST(s_num div s_den AS BIGINT)").alias("score"),
        )
    )
    best = (
        sc.withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("f").orderBy(F.col("score").desc(), "t1")
            ),
        )
        .filter(F.col("rn") == 1)
        .select(
            "f",
            "t1",
            F.when(2 * F.col("pos_l") > F.col("n_l"), 1).otherwise(0).alias(
                "maj_l"
            ),
            F.when(2 * F.col("pos_r") > F.col("n_r"), 1).otherwise(0).alias(
                "maj_r"
            ),
            F.when(2 * F.col("pos_tr") > F.col("n_tr"), 1).otherwise(0).alias(
                "maj_c"
            ),
        )
    )
    err = (
        xf.join(F.broadcast(best), "f")
        .groupBy("f", "t1", "maj_c")
        .agg(
            F.sum(
                F.when(
                    F.col("x") <= F.col("t1"),
                    F.when(
                        F.col("maj_l") == 1, F.col("n") - F.col("pos")
                    ).otherwise(F.col("pos")),
                ).otherwise(
                    F.when(
                        F.col("maj_r") == 1, F.col("n") - F.col("pos")
                    ).otherwise(F.col("pos"))
                )
            )
            .cast("long")
            .alias("err_stump"),
            F.sum(
                F.when(F.col("maj_c") == 1, F.col("n") - F.col("pos")).otherwise(
                    F.col("pos")
                )
            )
            .cast("long")
            .alias("err_const"),
            F.sum("n").cast("long").alias("n_test"),
        )
    )
    return (
        err.select(
            F.col("f").cast("long").alias("fold"),
            F.col("t1").alias("threshold"),
            "n_test",
            "err_stump",
            "err_const",
            (F.col("err_stump").cast("double") / F.col("n_test")).alias(
                "cv_error_stump"
            ),
            (F.col("err_const").cast("double") / F.col("n_test")).alias(
                "cv_error_const"
            ),
        )
        .transform(pin)
        .orderBy("fold")
    )
