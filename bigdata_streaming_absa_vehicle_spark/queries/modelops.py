"""Model-version regression diff (SURVEY.md §2K extension X-26): when the
reference's retraining DAG promotes a new champion
(`dags/absa_streaming_lifecycle_full.py:148-149`, `train_retrain.py:38-72`),
the ONLY evidence it records is a single accuracy scalar in
eval_result.json.  A production promotion gate also wants to know *how the
new model disagrees with the old one on live traffic*: per-aspect prediction
churn, chance-corrected agreement (Cohen's kappa), and the per-class shift
report.  These two queries compute exactly that by running the D-02
inference path TWICE (versions v0 and v1 — the stub model is version-keyed,
so v1 is a genuinely different model) over one scan of the corpus.

Determinism: the stub model is md5-derived (SQL-expressible, so the whole
double-inference path is hash-checkable), every count/marginal/product is an
exact integer or decimal(38,0), and each output metric performs ONE final
IEEE division rounded at 6 dp.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pyspark.sql.window import Window as W

from ..functions.ordering import stage
from ..operators.inference import absa_predictions, oracle_absa_pred
from ..schemas import ABSA_ASPECTS
from ..tables import load
from .registry import query

_NORM = "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))"

#: the class-shift report pins one aspect; any would do — Price is index 0
_SHIFT_ASPECT = ABSA_ASPECTS[0]


def _labels_long_oracle() -> str:
    """DuckDB CTE producing (aspect, la, lb): the v0 and v1 stub predictions
    per (doc, aspect) — the long-form twin of the doubled D-02 inference."""
    branches = "\n        UNION ALL\n        ".join(
        f"SELECT '{aspect}' AS aspect, "
        f"{oracle_absa_pred(_NORM, aspect, 'v0')} AS la, "
        f"{oracle_absa_pred(_NORM, aspect, 'v1')} AS lb FROM documents"
        for aspect in ABSA_ASPECTS
    )
    return branches


def _labels_long(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(aspect, la, lb) per (doc, aspect): one corpus scan, two Arrow-batched
    pandas_udf inference calls (D-02, versions v0/v1), then a map-only
    arrays_zip + posexplode — no shuffle until the bounded rollup."""
    docs = load(spark, sf_dir, "documents").select(
        F.trim(F.regexp_replace(F.lower(F.col("text")), r"\s+", " ")).alias("text")
    )
    both = docs.select(
        absa_predictions("text", "v0").alias("pa"),
        absa_predictions("text", "v1").alias("pb"),
    )
    aspects = F.array(*[F.lit(a) for a in ABSA_ASPECTS])
    return both.select(
        F.posexplode(F.arrays_zip(F.col("pa"), F.col("pb"))).alias("i", "z")
    ).select(
        F.element_at(aspects, F.col("i") + 1).alias("aspect"),
        F.col("z.pa").alias("la"),
        F.col("z.pb").alias("lb"),
    )


@query(
    "q177_model_churn",
    oracle=f"""
    WITH lab AS (
        {_labels_long_oracle()}
    ),
    cells AS (
        SELECT aspect, la, lb, COUNT(*) AS c
        FROM lab GROUP BY aspect, la, lb
    ),
    am AS (SELECT aspect, la AS cls, CAST(SUM(c) AS BIGINT) AS a_c
           FROM cells GROUP BY aspect, la),
    bm AS (SELECT aspect, lb AS cls, CAST(SUM(c) AS BIGINT) AS b_c
           FROM cells GROUP BY aspect, lb),
    pe AS (
        SELECT am.aspect,
               CAST(SUM(CAST(a_c AS DECIMAL(38,0)) * CAST(b_c AS DECIMAL(38,0)))
                    AS DECIMAL(38,0)) AS pe_num
        FROM am JOIN bm ON am.aspect = bm.aspect AND am.cls = bm.cls
        GROUP BY am.aspect
    ),
    agg AS (
        SELECT aspect, CAST(SUM(c) AS BIGINT) AS n_docs,
               CAST(SUM(CASE WHEN la = lb THEN c ELSE 0 END) AS BIGINT) AS n_agree
        FROM cells GROUP BY aspect
    )
    SELECT agg.aspect AS aspect, n_docs, n_agree,
           ROUND(CAST(n_docs - n_agree AS DOUBLE) / n_docs, 6) AS churn_rate,
           CASE WHEN CAST(n_docs AS DECIMAL(38,0)) * n_docs = pe_num THEN NULL
                ELSE ROUND(
                    CAST(CAST(n_agree AS DECIMAL(38,0)) * n_docs - pe_num AS DOUBLE)
                    / CAST(CAST(n_docs AS DECIMAL(38,0)) * n_docs - pe_num AS DOUBLE),
                    6) END AS kappa
    FROM agg JOIN pe ON agg.aspect = pe.aspect
    ORDER BY agg.aspect
    """,
    tags=("X-26", "D-02", "A-01"),
)
def q177_model_churn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-aspect prediction churn + Cohen's kappa between model versions
    v0 and v1: the promotion-gate readout the reference's evaluate_model
    step (`train_retrain.py:38-63`) lacks.  churn = fraction of documents
    whose label flips; kappa = (po - pe)/(1 - pe) chance-corrected
    agreement, computed as the all-integer identity
    (n*agree - SUM_c a_c*b_c) / (n^2 - SUM_c a_c*b_c) with decimal(38,0)
    products and ONE final division (NULL when chance agreement is total,
    identically in both engines).

    Scale shape: ONE corpus scan feeds two Arrow-batched pandas_udf calls
    (D-02); arrays_zip+posexplode is map-only; the first groupBy is
    map-side combined onto the BOUNDED (8 aspects x 4x4 classes) cell
    relation, and every marginal/join/window after it runs on that bounded
    relation only — nothing corpus-sized ever reshuffles."""
    cells = (
        _labels_long(spark, sf_dir)
        .groupBy("aspect", "la", "lb")
        .agg(F.count(F.lit(1)).alias("c"))
        .transform(stage)  # bounded 8x16 relation; feeds marginals + totals
    )
    d38 = "decimal(38,0)"
    am = (
        cells.groupBy("aspect", "la")
        .agg(F.sum("c").cast("long").alias("a_c"))
        .alias("am")
    )
    bm = (
        cells.groupBy("aspect", "lb")
        .agg(F.sum("c").cast("long").alias("b_c"))
        .alias("bm")
    )
    pe = (
        am.join(
            bm,
            (F.col("am.aspect") == F.col("bm.aspect"))
            & (F.col("am.la") == F.col("bm.lb")),
        )
        .groupBy(F.col("am.aspect").alias("aspect"))
        .agg(
            F.sum(F.col("a_c").cast(d38) * F.col("b_c").cast(d38))
            .cast(d38)
            .alias("pe_num")
        )
    )
    agg = cells.groupBy("aspect").agg(
        F.sum("c").cast("long").alias("n_docs"),
        F.sum(F.when(F.col("la") == F.col("lb"), F.col("c")).otherwise(0))
        .cast("long")
        .alias("n_agree"),
    )
    n2 = F.col("n_docs").cast(d38) * F.col("n_docs")
    return (
        agg.join(pe, "aspect")
        .select(
            "aspect",
            "n_docs",
            "n_agree",
            F.round(
                (F.col("n_docs") - F.col("n_agree")).cast("double") / F.col("n_docs"), 6
            ).alias("churn_rate"),
            F.when(n2 == F.col("pe_num"), F.lit(None).cast("double"))
            .otherwise(
                F.round(
                    (F.col("n_agree").cast(d38) * F.col("n_docs") - F.col("pe_num"))
                    .cast("double")
                    / (n2 - F.col("pe_num")).cast("double"),
                    6,
                )
            )
            .alias("kappa"),
        )
        .orderBy("aspect")
    )


@query(
    "q178_version_class_shift",
    oracle=f"""
    WITH lab AS (
        SELECT {oracle_absa_pred(_NORM, _SHIFT_ASPECT, "v0")} AS la,
               {oracle_absa_pred(_NORM, _SHIFT_ASPECT, "v1")} AS lb
        FROM documents
    ),
    cells AS (SELECT la, lb, COUNT(*) AS c FROM lab GROUP BY la, lb),
    classes AS (SELECT 0 AS cls UNION ALL SELECT 1 UNION ALL SELECT 2 UNION ALL SELECT 3),
    rep AS (
        SELECT cls,
               CAST(COALESCE((SELECT SUM(c) FROM cells WHERE la = cls), 0) AS BIGINT) AS base_n,
               CAST(COALESCE((SELECT SUM(c) FROM cells WHERE lb = cls), 0) AS BIGINT) AS new_n,
               CAST(COALESCE((SELECT SUM(c) FROM cells WHERE la = cls AND lb = cls), 0) AS BIGINT) AS n_stable
        FROM classes
    )
    SELECT cls, base_n, new_n, n_stable,
           CASE WHEN base_n = 0 THEN NULL
                ELSE ROUND(CAST(n_stable AS DOUBLE) / base_n, 6) END AS retention,
           CASE WHEN new_n = 0 THEN NULL
                ELSE ROUND(CAST(n_stable AS DOUBLE) / new_n, 6) END AS "precision",
           CASE WHEN base_n + new_n = 0 THEN NULL
                ELSE ROUND(CAST(2 * n_stable AS DOUBLE) / (base_n + new_n), 6) END AS f1
    FROM rep
    ORDER BY cls
    """,
    tags=("X-26", "D-02", "J-04"),
)
def q178_version_class_shift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-class shift report for one aspect (Price, index 0) between model
    versions: treating v0 as baseline, per class c — how many docs v0
    labeled c (base_n), how many v1 labels c (new_n), how many stayed
    (n_stable), and retention/precision/F1 of the new model against the
    old.  The class-level view that tells a reviewer WHICH sentiment class
    the candidate model redistributes before promoting it.

    Scale shape: same single-scan double-inference as q177, reduced
    map-side to the bounded 4x4 cell relation; the 4-row class spine is a
    literal LEFT-joined so empty classes still report zeros; every ratio
    is ONE final division over exact integers."""
    ev = _labels_long(spark, sf_dir).where(F.col("aspect") == _SHIFT_ASPECT)
    cells = (
        ev.groupBy("la", "lb")
        .agg(F.count(F.lit(1)).alias("c"))
        .transform(stage)  # bounded 4x4 relation; feeds all three marginals
    )
    base = cells.groupBy(F.col("la").alias("cls")).agg(
        F.sum("c").cast("long").alias("base_n")
    )
    new = cells.groupBy(F.col("lb").alias("cls")).agg(
        F.sum("c").cast("long").alias("new_n")
    )
    stable = (
        cells.where(F.col("la") == F.col("lb"))
        .groupBy(F.col("la").alias("cls"))
        .agg(F.sum("c").cast("long").alias("n_stable"))
    )
    spine = spark.range(4).select(F.col("id").cast("int").alias("cls"))
    rep = (
        spine.join(base, "cls", "left")
        .join(new, "cls", "left")
        .join(stable, "cls", "left")
        .select(
            "cls",
            F.coalesce("base_n", F.lit(0)).cast("long").alias("base_n"),
            F.coalesce("new_n", F.lit(0)).cast("long").alias("new_n"),
            F.coalesce("n_stable", F.lit(0)).cast("long").alias("n_stable"),
        )
    )
    ratio = lambda num, den: F.when(  # noqa: E731
        den == 0, F.lit(None).cast("double")
    ).otherwise(F.round(num.cast("double") / den, 6))
    return rep.select(
        "cls",
        "base_n",
        "new_n",
        "n_stable",
        ratio(F.col("n_stable"), F.col("base_n")).alias("retention"),
        ratio(F.col("n_stable"), F.col("new_n")).alias("precision"),
        ratio(2 * F.col("n_stable"), F.col("base_n") + F.col("new_n")).alias("f1"),
    ).orderBy("cls")


# ---------------------------------------------------------------------------
# X-37: sequence-model backtest — next-event prediction accuracy
# ---------------------------------------------------------------------------

_BT_SPLIT = "2024-01-16"  #: pairs before -> train matrix; on/after -> eval


@query(
    "q197_next_event_accuracy",
    oracle=f"""
    WITH seq AS (
        SELECT user_id, ts, event_type,
               LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   AS prev_type
        FROM events
    ),
    pairs AS (
        SELECT prev_type, event_type AS next_type, ts
        FROM seq WHERE prev_type IS NOT NULL
    ),
    matrix AS (
        SELECT prev_type, next_type, COUNT(*) AS n
        FROM pairs WHERE ts < TIMESTAMP '{_BT_SPLIT}'
        GROUP BY prev_type, next_type
    ),
    pred AS (
        SELECT prev_type, next_type AS predicted
        FROM (SELECT prev_type, next_type,
                     ROW_NUMBER() OVER (PARTITION BY prev_type
                                        ORDER BY n DESC, next_type ASC) AS rn
              FROM matrix) r
        WHERE rn = 1
    )
    SELECT p.prev_type,
           COUNT(*) AS n_pairs,
           CAST(SUM(CASE WHEN p.next_type = d.predicted THEN 1 ELSE 0 END)
                AS BIGINT) AS hits,
           ROUND(CAST(SUM(CASE WHEN p.next_type = d.predicted THEN 1 ELSE 0 END)
                 AS DOUBLE) / COUNT(*), 6) AS accuracy
    FROM pairs p JOIN pred d USING (prev_type)
    WHERE p.ts >= TIMESTAMP '{_BT_SPLIT}'
    GROUP BY p.prev_type
    ORDER BY p.prev_type
    """,
    tags=("X-37", "X-13", "W-02"),
)
def q197_next_event_accuracy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence-model BACKTEST: train the q118 first-order transition
    matrix on pairs before the split date, predict each post-split
    event as the argmax next-type of its predecessor (count desc,
    lexicographic tie-break), and report per-prev-type pair counts,
    hits, and accuracy — the temporal-holdout evaluation that turns the
    descriptive Markov matrix into a measured model, with the same
    leakage discipline as X-16's temporal split (the matrix never sees
    eval-period pairs).

    Scale shape: ONE user-keyed window pass builds all pairs (shared by
    train and eval sides via stage); the matrix and the argmax run on
    the bounded type-pair relation; predictions BROADCAST back onto the
    eval pairs (map-only flag), and the readout rolls up onto <=5 rows."""
    ev = load(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = stage(
        ev.select(
            "user_id",
            "ts",
            "event_type",
            F.lag("event_type").over(w).alias("prev_type"),
        )
        .filter(F.col("prev_type").isNotNull())
        .select("prev_type", F.col("event_type").alias("next_type"), "ts")
    )
    split = F.lit(_BT_SPLIT).cast("timestamp")
    matrix = (
        pairs.filter(F.col("ts") < split)
        .groupBy("prev_type", "next_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    rank_w = W.partitionBy("prev_type").orderBy(F.desc("n"), F.asc("next_type"))
    pred = (
        matrix.withColumn("rn", F.row_number().over(rank_w))
        .filter(F.col("rn") == 1)
        .select("prev_type", F.col("next_type").alias("predicted"))
    )
    hit = F.when(F.col("next_type") == F.col("predicted"), 1).otherwise(0)
    return (
        pairs.filter(F.col("ts") >= split)
        .join(F.broadcast(pred), "prev_type")
        .groupBy("prev_type")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.sum(hit).cast("long").alias("hits"),
            F.round(F.sum(hit).cast("double") / F.count(F.lit(1)), 6).alias(
                "accuracy"
            ),
        )
        .orderBy("prev_type")
    )
