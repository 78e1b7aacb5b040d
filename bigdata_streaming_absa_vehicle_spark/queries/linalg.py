"""Distributed numerical linear algebra (SURVEY.md §2K extension X-86):
top principal direction of the embedding second-moment (Gram) matrix by
power iteration — PCA's workhorse step, expressed the way it actually
scales: each iteration is ONE pass computing the mergeable per-dimension
sums G_j = sum_rows (x.v) * x_j, with the 64-float state vector the only
thing that ever leaves the cluster.

Determinism: the entire iteration runs in EXACT integer arithmetic — the
q221/q291 pico-unit discipline applied to linear algebra. Embedding
components quantize once to ppm integers x6 = round(x * 1e6); per-row
dots x6.v6 and the per-dimension sums are exact int64/decimal;
re-normalization is sign * ((|G_j| * 1e6) div max_j|G_j|) (floor division
on non-negative operands — identical in Spark decimal `div`, DuckDB
HUGEINT `//`, and Python `//`); the Rayleigh eigenvalue collapses to one
exact integer floor-division before any double appears. No float is ever
summed across rows, so no summation-order hazard exists anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.ordering import pin, stage
from ..tables import load
from .registry import query

_PCA_ITERS = 3
_DIM = 64  #: embedding dimensionality of the benchmark table


def _pca_oracle() -> str:
    ctes = ""
    prev = "v0"
    for it in range(1, _PCA_ITERS + 1):
        ctes += f""",
    g{it} AS (
        SELECT e.j, SUM(CAST(s.s_row AS HUGEINT) * e.x6) AS g
        FROM ex e
        JOIN (
            SELECT e2.vec_id, CAST(SUM(e2.x6 * v.v6) AS BIGINT) AS s_row
            FROM ex e2 JOIN {prev} v USING (j)
            GROUP BY e2.vec_id
        ) s USING (vec_id)
        GROUP BY e.j
    ),
    v{it} AS (
        SELECT j,
               (CASE WHEN g < 0 THEN -1 ELSE 1 END)
                   * CAST((abs(g) * 1000000) // (SELECT MAX(abs(g)) FROM g{it})
                          AS BIGINT) AS v6
        FROM g{it}
    )"""
        prev = f"v{it}"
    last_g = f"g{_PCA_ITERS}"
    prev_v = f"v{_PCA_ITERS - 1}"
    return f"""
    WITH ex AS (
        SELECT vec_id, j,
               CAST(ROUND(CAST(embedding[j] AS DOUBLE) * 1e6) AS BIGINT) AS x6
        FROM embeddings CROSS JOIN (SELECT unnest(range(1, {_DIM + 1})) AS j) t
    ),
    v0 AS (SELECT DISTINCT j, CAST(1000000 AS BIGINT) AS v6 FROM ex){ctes},
    ray AS (
        SELECT SUM(CAST(v.v6 AS HUGEINT) * g.g)
                   // SUM(CAST(v.v6 AS HUGEINT) * v.v6) AS num_r
        FROM {last_g} g JOIN {prev_v} v USING (j)
    ),
    tr AS (
        SELECT SUM(x6 * x6) AS trace6,
               CAST(COUNT(DISTINCT vec_id) AS BIGINT) AS n_vectors
        FROM ex
    ),
    sh AS (
        SELECT CAST(r.num_r // t.n_vectors AS BIGINT) AS lam_pico,
               CAST((r.num_r * 1000000000) // t.trace6 AS BIGINT) AS share_ppb
        FROM ray r, tr t
    )
    SELECT v.j AS dim, v.v6 AS loading_ppm,
           CAST(s.lam_pico AS DOUBLE) / 1e12 AS eigenvalue_per_vector,
           CAST(s.share_ppb AS DOUBLE) / 1e9 AS explained_share,
           t.n_vectors
    FROM v{_PCA_ITERS} v, tr t, sh s
    ORDER BY dim
    """


@query("q296_pca_power_iteration", oracle=_pca_oracle(), tags=("X-86", "X-15"))
def q296_pca_power_iteration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top principal direction of the embedding Gram (second-moment)
    matrix by 3 power iterations, with the per-vector
    Rayleigh-quotient eigenvalue and its share of total variance (trace) — the PCA step
    behind whitening, spectral dedup diagnostics, and low-rank
    compression of an embedding corpus, computed the only way that
    works at 100 TB: never materialize the d x d covariance from the
    driver's view; each iteration is the mergeable per-dimension sum
    G_j = sum_rows (x.v) x_j, and only the 64-entry state vector v
    crosses the driver boundary per iteration (the X-15
    pagerank_converge discipline — scalar-bounded driver traffic; the
    uncentered Gram form is deliberate: no mean subtraction keeps every
    operand an exact integer, and the benchmark embeddings are
    near-zero-mean).

    Determinism: all-integer iteration (module docstring); the two
    readout doubles come from exact int64s (< 2^63, so the int-to-
    double conversions are correctly rounded in Spark, DuckDB, and
    Python alike) through a fixed two-division expression; loadings are
    EXACT ppm integers, hash-immune by type.

    Scale shape: the exploded (vec_id, j, x6) relation is staged once;
    per iteration ONE vec_id-keyed rollup (64-term dots) and ONE
    64-key map-side-combined rollup; the normalize and the final
    Rayleigh run on 64 rows / Python ints. Row count never touches the
    driver; d=64 does.

    Reference parity: beyond-reference capability (the reference has
    no vector analytics at all); complements X-03's ANN search (q45)
    and q204's per-dimension profile with the cross-dimension spectrum.
    """
    ex = (
        load(spark, sf_dir, "embeddings")
        .select("vec_id", F.posexplode("embedding").alias("pos", "x"))
        .select(
            "vec_id",
            (F.col("pos") + 1).alias("j"),
            F.round(F.col("x").cast("double") * F.lit(1e6))
            .cast("long")
            .alias("x6"),
        )
        .transform(stage)  # all 3 iterations + the trace share one pass
    )
    v = [10**6] * _DIM  # exact ppm state vector — the only driver state
    prev_v = v
    g_rows: dict[int, int] = {}
    for _ in range(_PCA_ITERS):
        prev_v = v
        vdf = spark.createDataFrame(
            [(j + 1, v[j]) for j in range(_DIM)], "j int, v6 long"
        )
        s = (
            ex.join(F.broadcast(vdf), "j")
            .groupBy("vec_id")
            .agg(F.sum(F.col("x6") * F.col("v6")).cast("long").alias("s_row"))
        )
        g = (
            ex.join(s, "vec_id")
            .groupBy("j")
            .agg(
                F.sum(F.col("s_row").cast("decimal(20,0)") * F.col("x6"))
                .cast("decimal(38,0)")
                .alias("g")
            )
        )
        g_rows = {r["j"]: int(r["g"]) for r in g.collect()}
        maxabs = max(abs(gj) for gj in g_rows.values())
        v = [
            (1 if g_rows[j + 1] >= 0 else -1)
            * ((abs(g_rows[j + 1]) * 10**6) // maxabs)
            for j in range(_DIM)
        ]
    num = sum(prev_v[j] * g_rows[j + 1] for j in range(_DIM))
    den = sum(pv * pv for pv in prev_v)
    num_r = num // den  # 1e12-scale Rayleigh quotient, exact
    tr = ex.agg(
        F.sum((F.col("x6") * F.col("x6")).cast("decimal(38,0)"))
        .cast("decimal(38,0)")
        .alias("trace6"),
        F.countDistinct("vec_id").cast("long").alias("n_vectors"),
    ).first()
    trace6, n_vectors = int(tr["trace6"]), int(tr["n_vectors"])
    lam_pico = num_r // n_vectors
    share_ppb = (num_r * 10**9) // trace6
    lam = float(lam_pico) / 1e12
    share = float(share_ppb) / 1e9
    out = spark.createDataFrame(
        [
            (j + 1, v[j], lam, share, n_vectors)
            for j in range(_DIM)
        ],
        "dim int, loading_ppm long, eigenvalue_per_vector double, "
        "explained_share double, n_vectors long",
    )
    return out.transform(pin).orderBy("dim")
