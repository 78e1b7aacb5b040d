"""UDF/UDAF/UDTF query surface (SURVEY.md §2J, D-05/D-06/D-07).

The reference's only UDFs are the two inference ones (certified by
q60/q62); this module certifies the remaining declared UDF *kinds* on
oracle-checkable semantics:

- D-05 grouped-map `applyInPandas` — per-group pandas transform with the
  group delivered whole to one worker (the reference's per-group
  retrain/eval prep shape, train_retrain.py generalized).
- D-06 grouped-agg `pandas_udf` — custom aggregate (embedding centroid,
  the vector-mean building block of X-03 IVF).
- D-07 UDTF / explode — one row to many. Two forms: the built-in
  `posexplode` (the scale path: whole-stage codegen, no Python) and a real
  Python UDTF over the same contract, proving the Spark 4 UDTF plumbing.

Scale notes: applyInPandas shuffles each group to a single task — group
cardinality must exceed executor count and no group may exceed worker
memory (here: groups are order-priorities / labels, thousands of rows
each; at 100 TB you'd salt or pre-aggregate first — documented contract,
not enforced). The grouped-agg UDF does NOT do partial aggregation (unlike
JVM aggregates): all rows of a group move in the shuffle, so prefer
built-in aggregates when semantics allow (q45's centroid-free cosine path).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.partitioning import fan_out
from ..streaming.pipelines import VEHICLE_CLASSES, with_detections
from ..tables import load
from .registry import query
from ..functions.ordering import pin


@query(
    "q66_grouped_map_scale",
    oracle="""
    SELECT o_orderkey, o_orderpriority, o_totalprice,
           CASE WHEN mx = mn THEN 0.0
                ELSE (o_totalprice - mn) / (mx - mn) END AS scaled
    FROM (
        SELECT o_orderkey, o_orderpriority, o_totalprice,
               MIN(o_totalprice) OVER (PARTITION BY o_orderpriority) AS mn,
               MAX(o_totalprice) OVER (PARTITION BY o_orderpriority) AS mx
        FROM orders
    )
    ORDER BY o_orderkey
    """,
    tags=("D-05",),
)
def q66_grouped_map_scale(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D-05: per-group min-max scaling of order totals via applyInPandas.
    Min/max and the (x-min)/(mx-mn) division are IEEE-exact, so the pandas
    path hash-matches the window-function oracle bit-for-bit — the grouped-map
    plumbing (group shuffle, Arrow transfer, schema contract) is what's
    certified."""

    def scale(pdf: pd.DataFrame) -> pd.DataFrame:
        mn, mx = pdf["o_totalprice"].min(), pdf["o_totalprice"].max()
        scaled = (
            (pdf["o_totalprice"] - mn) / (mx - mn) if mx != mn else pd.Series(0.0, index=pdf.index)
        )
        return pd.DataFrame(
            {
                "o_orderkey": pdf["o_orderkey"],
                "o_orderpriority": pdf["o_orderpriority"],
                "o_totalprice": pdf["o_totalprice"],
                "scaled": scaled,
            }
        )

    orders = load(spark, sf_dir, "orders")
    return (
        orders.select("o_orderkey", "o_orderpriority", "o_totalprice")
        .groupBy("o_orderpriority")
        .applyInPandas(
            scale,
            schema="o_orderkey long, o_orderpriority string, o_totalprice double, scaled double",
        )
        .transform(pin).orderBy("o_orderkey")
    )


@query(
    "q67_grouped_agg_centroid",
    oracle="""
    WITH flat AS (
        SELECT label,
               CAST(unnest(range(0, len(embedding))) AS INTEGER) AS pos,
               CAST(unnest(embedding) AS DOUBLE) AS val
        FROM embeddings
    )
    SELECT label, pos,
           ROUND(AVG(val), 6) AS centroid_val,
           COUNT(*) AS n_vectors
    FROM flat GROUP BY label, pos
    ORDER BY label, pos
    """,
    tags=("D-06", "X-03"),
)
def q67_grouped_agg_centroid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D-06: per-label embedding centroid as an array-returning grouped-agg
    pandas UDF (the vector-mean kernel an IVF index builds on), flattened to
    one (label, pos) row per component for the oracle compare. Rounded to
    6 dp: pandas' and DuckDB's float64 summation orders differ harmlessly
    below that."""

    @F.pandas_udf("array<double>")
    def centroid(vecs: pd.Series) -> list:
        mat = np.stack(vecs.to_numpy()).astype(np.float64)
        return mat.mean(axis=0).tolist()

    # Spark forbids mixing group-agg pandas UDFs with JVM aggregates in one
    # agg() (INVALID_PANDAS_UDF_PLACEMENT), so the count is a pandas agg too.
    @F.pandas_udf("long")
    def n_vecs(vecs: pd.Series) -> int:
        return len(vecs)

    emb = load(spark, sf_dir, "embeddings")
    wide = emb.groupBy("label").agg(
        centroid("embedding").alias("centroid"),
        n_vecs("embedding").alias("n_vectors"),
    )
    return (
        wide.select("label", "n_vectors", F.posexplode("centroid").alias("pos", "val"))
        .select("label", "pos", F.round("val", 6).alias("centroid_val"), "n_vectors")
        .transform(pin).orderBy("label", "pos")
    )


def _frame_envelope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events dressed as the vehicle frame envelope (q62's input shape).

    fan_out (guide §2/§2.6, r13): the consumers amplify per-row CPU before
    any exchange — with_detections runs one md5 per (row, class) and q69
    adds a per-row Python UDTF — and the sf0.1 events scan is a single
    parquet split, so that work serialized on one core (opt_sqlprof r13:
    q69's kernel stage = 1 task, 1.79 s of 2.4 s total). No-op on a
    many-split production scan."""
    ev = fan_out(load(spark, sf_dir, "events"))
    return ev.select(
        F.concat(F.lit("CAM_"), (F.col("user_id") % 2).cast("string")).alias("camera_id"),
        F.date_trunc("second", "ts").alias("frame_time"),
        F.base64(F.col("props").cast("binary")).alias("frame_data"),
    )


_CLASSES_LIT = "[" + ",".join(f"'{c}'" for c in VEHICLE_CLASSES) + "]"

_DETECTIONS_ORACLE = f"""
    WITH frames AS (
        SELECT 'CAM_' || CAST(user_id % 2 AS VARCHAR) AS camera_id,
               date_trunc('second', ts) AS frame_time,
               list_filter({_CLASSES_LIT},
                   c -> (CAST(('0x' || substr(md5(md5(props) || c), 1, 4)) AS BIGINT) & 1) = 1
               ) AS picked
        FROM events
    )
    SELECT camera_id, frame_time,
           CAST(unnest(range(0, len(picked))) AS INTEGER) AS pos,
           unnest(picked) AS vehicle
    FROM frames
    WHERE len(picked) > 0
    ORDER BY camera_id, frame_time, pos
"""


@query("q68_detections_exploded", oracle=_DETECTIONS_ORACLE, tags=("D-07",))
def q68_detections_exploded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D-07 scale path: frame -> one row per detected object via the built-in
    posexplode (whole-stage codegen, no Python boundary) — the relational form
    of the reference's UDF-internal detection list (vehicle_consumer.py:96-98)."""
    env = with_detections(_frame_envelope(spark, sf_dir))
    # no size(picked) > 0 pre-filter: posexplode (outer=false) already yields
    # zero rows for empty arrays, and the pushed-down filter would re-evaluate
    # the whole detection expression below the hash projection
    return (
        env.select("camera_id", "frame_time", F.posexplode("picked").alias("pos", "vehicle"))
        .transform(pin).orderBy("camera_id", "frame_time", "pos")
    )


@query("q69_detections_udtf", oracle=_DETECTIONS_ORACLE, tags=("D-07",))
def q69_detections_udtf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D-07 conformance twin: the same frame->objects expansion as a real
    Python UDTF (Spark 4 `udtf`), proving the table-function plumbing. Same
    oracle as q68 — the two must agree; prefer q68's explode in hot paths
    (UDTFs run row-at-a-time in Python)."""

    # useArrow was MEASURED AND REJECTED here (r13, guide §4.3 caveat):
    # with the same fan_out in place, useArrow=True cost ~80 core-seconds
    # for the 100k-row eval vs ~2 with pickled rows (opt_sqlprof r13) —
    # Spark 4.1's Arrow UDTF path serializes each eval()'s tiny yield set
    # as its own Arrow batch, so per-row overhead dwarfs the pickle path
    # for 1-4-row yields. Pickle stays; q68 is the vectorized hot path.
    @F.udtf(returnType="pos int, vehicle string")
    class SplitDetections:
        def eval(self, types_str: str):
            if types_str:
                for i, v in enumerate(types_str.split(",")):
                    yield i, v

    env = with_detections(_frame_envelope(spark, sf_dir))
    flat = env.select(
        "camera_id", "frame_time", F.concat_ws(",", "picked").alias("types_str")
    )
    return (
        flat.lateralJoin(SplitDetections(F.col("types_str").outer()))
        .select("camera_id", "frame_time", "pos", "vehicle")
        .transform(pin).orderBy("camera_id", "frame_time", "pos")
    )
