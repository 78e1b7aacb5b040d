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
from ..functions.partitioning import fan_out
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
    # feeds both legs of the candidate join; fan_out first (guide §2, r13):
    # the checkpoint otherwise materializes at the single-split scan's
    # parallelism and the 9x explode + cell join + exact d2 filter all ran
    # as ONE task (opt_sqlprof r13: 0.79 s of the 1.0 s total)
    p = stage(fan_out(points(spark, sf_dir)))
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


# ---------------------------------------------------------------------------
# X-107: grid-based DBSCAN (density clusters over cells)
# ---------------------------------------------------------------------------

_DB_MINPTS = 25  #: core cell: points in its 3x3 neighborhood >= this
_DB_ROUNDS = 4  #: min-label propagation rounds (declared semantics)


def _dbscan_oracle() -> str:
    prev = "l0"
    iters = ""
    for i in range(1, _DB_ROUNDS + 1):
        iters += f""",
    l{i} AS (
        SELECT cell, MIN(lbl) AS lbl FROM (
            SELECT cell, lbl FROM {prev}
            UNION ALL
            SELECT n.cell_b AS cell, p.lbl
            FROM adj n JOIN {prev} p ON n.cell_a = p.cell
        ) GROUP BY cell
    )"""
        prev = f"l{i}"
    return f"""
    WITH {_POINTS_CTE},
    cells AS (
        SELECT x // {_R} AS cx, y // {_R} AS cy, CAST(COUNT(*) AS BIGINT) AS n
        FROM pts GROUP BY 1, 2
    ),
    offs AS (SELECT a.dx, b.dy
             FROM (SELECT unnest([-1, 0, 1]) AS dx) a,
                  (SELECT unnest([-1, 0, 1]) AS dy) b),
    neigh AS (
        SELECT c.cx, c.cy, CAST(SUM(o.n) AS BIGINT) AS nn, MIN(c.n) AS n
        FROM cells c
        JOIN offs f ON TRUE
        JOIN cells o ON o.cx = c.cx + f.dx AND o.cy = c.cy + f.dy
        GROUP BY c.cx, c.cy
    ),
    core AS (
        SELECT cx, cy, n, cx * {_GRID // _R} + cy AS cell
        FROM neigh WHERE nn >= {_DB_MINPTS}
    ),
    adj AS (
        SELECT a.cell AS cell_a, b.cell AS cell_b
        FROM core a
        JOIN offs f ON TRUE
        JOIN core b ON b.cx = a.cx + f.dx AND b.cy = a.cy + f.dy
    ),
    l0 AS (SELECT cell, cell AS lbl FROM core){iters}
    SELECT l.lbl AS cluster_id,
           CAST(COUNT(*) AS BIGINT) AS n_cells,
           CAST(SUM(c.n) AS BIGINT) AS n_points
    FROM {prev} l JOIN core c USING (cell)
    GROUP BY l.lbl
    ORDER BY n_points DESC, cluster_id
    LIMIT 10
    """


@query("q317_grid_dbscan", oracle=_dbscan_oracle(), tags=("X-107", "X-46", "X-02"))
def q317_grid_dbscan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grid-based DBSCAN over the benchmark point set: a cell is CORE
    when its 3x3 cell neighborhood holds >= minPts points (the
    grid-quantized epsilon-neighborhood, the same approximation
    CLIQUE/STING-family algorithms trade exact radii for), and density
    clusters are connected components of core cells under 8-adjacency,
    labeled by {_DB_ROUNDS} min-label propagation rounds (declared
    k-round semantics — the q278/q268 contract). Readout: the 10
    largest clusters by contained points — the arbitrary-shape hotspot
    reader q215's single-cell density ranking cannot give (a ridge of
    warm cells beats one hot cell).

    Determinism: counts, core flags, cell ids, and min-labels are all
    exact integers; MIN needs no tie-break; no float exists.

    Scale shape: one map-only binning + rollup to the bounded cell
    grid; neighborhood sums and adjacency are 9-way bounded
    cell-relation self-joins; label propagation runs entirely on the
    bounded core-cell relation (the X-02 components discipline on a
    pre-reduced domain).

    Reference parity: beyond-reference; completes X-46 (density,
    radius join) with density CLUSTERING."""
    p = points(spark, sf_dir)
    cells = (
        p.groupBy(
            F.expr(f"x DIV {_R}").alias("cx"), F.expr(f"y DIV {_R}").alias("cy")
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .transform(stage)  # neighborhood sum + core join share it
    )
    offs = spark.createDataFrame(
        [(dx, dy) for dx in (-1, 0, 1) for dy in (-1, 0, 1)], "dx int, dy int"
    )
    shifted = cells.crossJoin(F.broadcast(offs)).select(
        (F.col("cx") + F.col("dx")).alias("cx"),
        (F.col("cy") + F.col("dy")).alias("cy"),
        F.col("n").alias("on"),
    )
    neigh = (
        cells.join(shifted, ["cx", "cy"])
        .groupBy("cx", "cy")
        .agg(F.sum("on").cast("long").alias("nn"), F.min("n").alias("n"))
    )
    core = (
        neigh.filter(F.col("nn") >= _DB_MINPTS)
        .select(
            "cx",
            "cy",
            "n",
            (F.col("cx") * (_GRID // _R) + F.col("cy")).alias("cell"),
        )
        .transform(stage)  # adjacency + the final size rollup share it
    )
    adj = (
        core.select("cx", "cy", F.col("cell").alias("cell_a"))
        .crossJoin(F.broadcast(offs))
        .select(
            (F.col("cx") + F.col("dx")).alias("cx"),
            (F.col("cy") + F.col("dy")).alias("cy"),
            "cell_a",
        )
        .join(core.select("cx", "cy", F.col("cell").alias("cell_b")), ["cx", "cy"])
        .select("cell_a", "cell_b")
    )
    lbl = core.select("cell", F.col("cell").alias("lbl"))
    for _ in range(_DB_ROUNDS):
        prop = adj.join(
            lbl.withColumnRenamed("cell", "pc"), adj.cell_a == F.col("pc")
        ).select(F.col("cell_b").alias("cell"), "lbl")
        lbl = (
            lbl.unionByName(prop).groupBy("cell").agg(F.min("lbl").alias("lbl"))
        )
    return (
        lbl.join(core.select("cell", "n"), "cell")
        .groupBy(F.col("lbl").alias("cluster_id"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_cells"),
            F.sum("n").cast("long").alias("n_points"),
        )
        .transform(pin)
        .orderBy(F.col("n_points").desc(), "cluster_id")
        .limit(10)
    )
