"""Spatial bucketed-join query surface (SURVEY.md §2K extension X-46):
grid-cell density and a radius (distance) self-join — the proximity
operations a geo-enabled event pipeline runs ("which zones are hot",
"which entities are within R of each other") expressed with the engine's
bucketed-candidate-join discipline: cell binning is map-only, candidates
come from a 3x3 neighbor-cell EQUI-join (never an all-pairs cross), and
the exact distance check runs only on candidates.

The geometry is an md5-derived benchmark point set over the customer
table (the X-15 benchmark-graph precedent: the OPERATOR — cell binning,
neighbor-cell candidate generation, exact verify — is the deliverable
and is data-agnostic; the synthetic coordinates exist so the DuckDB
oracle can generate the identical points). Coordinates are integers on a
10^6-unit planar grid and the metric is exact integer squared Euclidean
distance, so no libm or float ordering exists anywhere.

Cell size == radius R, which makes the 3x3 neighborhood LOSSLESS: two
points within R differ by <= R per axis, so their cell indexes differ by
at most 1 — the naive all-pairs oracle of q216 hash-proves exactly that.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.ordering import pin, stage
from ..operators.dedup import hash64, oracle_hash64
from ..tables import load
from .registry import query

_GRID = 1_000_000  #: coordinate domain: integer units in [0, 1e6)
_R = 50_000  #: radius for the distance join (and the cell edge length)
_TOPK = 20

_POINTS_CTE = f"""
    pts AS (
        SELECT c_custkey AS k,
               {oracle_hash64("gx", "CAST(c_custkey AS VARCHAR)")} % {_GRID} AS x,
               {oracle_hash64("gy", "CAST(c_custkey AS VARCHAR)")} % {_GRID} AS y
        FROM customer
    )"""


def points(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The md5-derived benchmark point set: one integer (x, y) per
    customer key, reproducible in SQL so the oracle generates identical
    points."""
    return load(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("k"),
        (hash64("gx", F.col("c_custkey").cast("string")) % _GRID).alias("x"),
        (hash64("gy", F.col("c_custkey").cast("string")) % _GRID).alias("y"),
    )


@query(
    "q215_spatial_density",
    oracle=f"""
    WITH {_POINTS_CTE}
    SELECT x // {_R} AS cell_x, y // {_R} AS cell_y,
           CAST(COUNT(*) AS BIGINT) AS n_points,
           MIN(k) AS first_key
    FROM pts
    GROUP BY x // {_R}, y // {_R}
    ORDER BY n_points DESC, cell_x, cell_y LIMIT {_TOPK}
    """,
    tags=("X-46", "A-02", "O-05"),
)
def q215_spatial_density(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grid-cell density: points binned into R-sized cells, top-20 hottest
    cells — the heat-map / hotspot readout, and the data the q216 radius
    join's planner would consult to find skewed cells worth salting
    (the spatial analogue of q88's heavy-hitter profile).

    Scale shape: cell binning is map-only integer DIV; ONE map-side-
    combined rollup onto the bounded cell-grid relation (400 cells at
    this R); TakeOrdered top-k, never a global sort."""
    p = points(spark, sf_dir)
    return (
        p.groupBy(
            F.expr(f"x DIV {_R}").alias("cell_x"), F.expr(f"y DIV {_R}").alias("cell_y")
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_points"),
            F.min("k").alias("first_key"),
        )
        .orderBy(F.desc("n_points"), "cell_x", "cell_y")
        .limit(_TOPK)
    )


@query(
    "q216_radius_join",
    oracle=f"""
    WITH {_POINTS_CTE},
    pairs AS (
        SELECT a.k AS ka, b.k AS kb,
               (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y) AS d2
        FROM pts a JOIN pts b ON a.k < b.k
        WHERE (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y)
              <= {_R}::BIGINT * {_R}
    ),
    tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs FROM pairs)
    SELECT ka, kb, d2, n_pairs
    FROM pairs CROSS JOIN tot
    ORDER BY d2, ka, kb LIMIT {_TOPK}
    """,
    tags=("X-46", "J-07"),
)
def q216_radius_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Radius (distance) self-join: every point pair within R, reported as
    the pair count plus the 20 closest pairs — the proximity primitive
    under "nearby entities / duplicate location detection / contact
    tracing" queries. The ORACLE is the naive all-pairs theta-join, so
    the hash match PROVES the bucketed candidate generation below loses
    no pair (cell edge == R makes the 3x3 neighborhood sufficient).

    Scale shape: each point explodes map-only to its 9 neighbor cells
    (bounded fan-out, the q77/q175 bounded-explode reduction of the
    distance predicate); candidates come from an EQUI-join on the cell
    key — quadratic work confined within cells, never an all-pairs
    cross — and each true pair matches on exactly ONE offset (the one
    equal to the cell-index delta), so no dedup pass exists. The exact
    integer d2 filter runs on candidates only; ranking is TakeOrdered;
    the pair count is one ungrouped agg broadcast back. Hot cells are
    the q215 readout; at pathological skew the cell key salts exactly
    like any other join key (J-01's q16c)."""
    p = stage(points(spark, sf_dir))  # feeds both legs of the candidate join
    offsets = F.array(
        *[
            F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
            for dx in (-1, 0, 1)
            for dy in (-1, 0, 1)
        ]
    )
    a = (
        p.select("k", "x", "y", F.explode(offsets).alias("o"))
        .select(
            F.col("k").alias("ka"),
            F.col("x").alias("xa"),
            F.col("y").alias("ya"),
            (F.expr(f"x DIV {_R}") + F.col("o.dx")).alias("cx"),
            (F.expr(f"y DIV {_R}") + F.col("o.dy")).alias("cy"),
        )
    )
    b = p.select(
        F.col("k").alias("kb"),
        F.col("x").alias("xb"),
        F.col("y").alias("yb"),
        F.expr(f"x DIV {_R}").alias("cx"),
        F.expr(f"y DIV {_R}").alias("cy"),
    )
    d2 = (F.col("xa") - F.col("xb")) * (F.col("xa") - F.col("xb")) + (
        F.col("ya") - F.col("yb")
    ) * (F.col("ya") - F.col("yb"))
    pairs = (
        a.join(b, ["cx", "cy"])
        .where(F.col("ka") < F.col("kb"))
        .select("ka", "kb", d2.alias("d2"))
        .where(F.col("d2") <= _R * _R)
        .transform(stage)  # feeds the count AND the top-k
    )
    tot = pairs.agg(F.count(F.lit(1)).cast("long").alias("n_pairs"))
    return (
        pairs.crossJoin(F.broadcast(tot))
        .orderBy("d2", "ka", "kb")
        .limit(_TOPK)
    )
