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


# ---------------------------------------------------------------------------
# X-121: embedding class-separation audit via the exact moment identity
# ---------------------------------------------------------------------------

_SEP_ORACLE = f"""
    WITH ex AS (
        SELECT vec_id, label, j,
               CAST(ROUND(CAST(embedding[j] AS DOUBLE) * 1e6) AS BIGINT) AS x6
        FROM embeddings CROSS JOIN (SELECT unnest(range(1, {_DIM + 1})) AS j) t
    ),
    rows_q AS (
        SELECT vec_id, label, CAST(SUM(x6 * x6) AS HUGEINT) AS q
        FROM ex GROUP BY vec_id, label
    ),
    lbl AS (
        SELECT r.label, CAST(COUNT(*) AS HUGEINT) AS n,
               CAST(SUM(r.q) AS HUGEINT) AS q,
               s.ss
        FROM rows_q r
        JOIN (
            SELECT label, SUM(CAST(sj AS HUGEINT) * sj) AS ss
            FROM (SELECT label, j, CAST(SUM(x6) AS BIGINT) AS sj
                  FROM ex GROUP BY label, j)
            GROUP BY label
        ) s USING (label)
        GROUP BY r.label, s.ss
    ),
    gstat AS (
        SELECT CAST(SUM(n) AS HUGEINT) AS n, CAST(SUM(q) AS HUGEINT) AS q,
               (SELECT SUM(CAST(sj AS HUGEINT) * sj)
                FROM (SELECT j, CAST(SUM(x6) AS BIGINT) AS sj
                      FROM ex GROUP BY j)) AS ss
        FROM lbl
    ),
    intra AS (
        SELECT label, CAST(n AS BIGINT) AS n_vectors,
               CAST((n * q - ss) * 2 // (n * (n - 1)) AS BIGINT)
                   AS intra_mean_sq
        FROM lbl WHERE n >= 2
    ),
    parts AS (
        SELECT (SELECT SUM(n * q - ss) FROM lbl) AS intra_tot,
               (SELECT SUM(CAST(n AS HUGEINT) * (n - 1)) // 2 FROM lbl)
                   AS intra_pairs,
               g.n * g.q - g.ss AS all_tot,
               g.n * (g.n - 1) // 2 AS all_pairs
        FROM gstat g
    ),
    ratio AS (
        SELECT CAST((all_tot - intra_tot) * 2
                    // (2 * (all_pairs - intra_pairs)) AS BIGINT)
                   AS inter_mean_sq,
               CAST(intra_tot * 2 // (2 * intra_pairs) AS BIGINT)
                   AS intra_mean_all
        FROM parts
    )
    SELECT i.label, i.n_vectors, i.intra_mean_sq,
           r.inter_mean_sq,
           CAST(r.inter_mean_sq * 1000000 // r.intra_mean_all AS BIGINT)
               AS separation_micro
    FROM intra i, ratio r
    ORDER BY i.label
"""


@query("q331_embedding_separation", oracle=_SEP_ORACLE, tags=("X-121", "X-86"))
def q331_embedding_separation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding class-separation audit: per label the mean
    intra-class squared distance, next to the global inter-class mean
    and the separation ratio — the silhouette-style 'do the labels
    cluster' readout computed WITHOUT enumerating a single pair: the
    identity sum_{i,k in S} ||x_i - x_k||^2 = 2n*sum||x||^2 - 2||sum x||^2
    collapses every pairwise sum to per-label moments (n, sum x,
    sum||x||^2), so the audit is mergeable aggregation where the naive
    form is quadratic — the measurement a 100 TB embedding pipeline can
    actually afford before/after training (q250's nearest-centroid
    accuracy asks the supervised twin of this unsupervised question).

    Determinism: ppm-quantized components make every moment and every
    pairwise-sum collapse an exact integer; means and the separation
    ratio are integer floor divisions; no float exists anywhere.

    Scale shape: one exploded pass to (label, j) sums and per-row
    ||x||^2 rollups — all mergeable; no pair join exists in the plan.

    Reference parity: beyond-reference; completes the embedding family
    (X-03 search, X-86 spectrum, q204 per-dim profile) with the
    label-geometry audit."""
    ex = (
        load(spark, sf_dir, "embeddings")
        .select(
            "vec_id",
            "label",
            F.posexplode("embedding").alias("pos", "x"),
        )
        .select(
            "vec_id",
            "label",
            (F.col("pos") + 1).alias("j"),
            F.round(F.col("x").cast("double") * F.lit(1e6))
            .cast("long")
            .alias("x6"),
        )
        .transform(stage)  # row-q, label sums, and global sums share it
    )
    d38 = "decimal(38,0)"
    rows_q = ex.groupBy("vec_id", "label").agg(
        F.sum(F.col("x6") * F.col("x6")).cast("long").alias("q")
    )
    lblsum = (
        ex.groupBy("label", "j")
        .agg(F.sum("x6").cast("long").alias("sj"))
        .groupBy("label")
        .agg(
            F.sum((F.col("sj").cast("decimal(19,0)") * F.col("sj")))
            .cast(d38)
            .alias("ss")
        )
    )
    lbl = (
        rows_q.groupBy("label")
        .agg(
            F.count(F.lit(1)).cast(d38).alias("n"),
            F.sum("q").cast(d38).alias("q"),
        )
        .join(lblsum, "label")
        .transform(stage)  # intra rows + the global parts share it
    )
    glob = lbl.agg(
        F.sum("n").cast(d38).alias("n"), F.sum("q").cast(d38).alias("q")
    ).crossJoin(
        F.broadcast(
            ex.groupBy("j")
            .agg(F.sum("x6").cast("long").alias("sj"))
            .agg(
                F.sum(F.col("sj").cast("decimal(19,0)") * F.col("sj"))
                .cast(d38)
                .alias("ss")
            )
        )
    )
    intra = lbl.filter(F.col("n") >= 2).select(
        "label",
        F.col("n").cast("long").alias("n_vectors"),
        F.expr(
            "CAST((n * q - ss) * 2 div (n * (n - 1)) AS BIGINT)"
        ).alias("intra_mean_sq"),
    )
    parts = (
        lbl.agg(
            F.sum(F.expr("n * q - ss")).cast(d38).alias("intra_tot"),
            F.expr("CAST(SUM(n * (n - 1)) AS DECIMAL(38,0)) div 2").alias(
                "intra_pairs"
            ),
        )
        .crossJoin(F.broadcast(glob))
        .select(
            "intra_tot",
            "intra_pairs",
            F.expr("n * q - ss").alias("all_tot"),
            F.expr("CAST(n * (n - 1) AS DECIMAL(38,0)) div 2").alias(
                "all_pairs"
            ),
        )
    )
    ratio = parts.select(
        F.expr(
            "CAST((all_tot - intra_tot) * 2"
            " div (2 * (all_pairs - intra_pairs)) AS BIGINT)"
        ).alias("inter_mean_sq"),
        F.expr("CAST(intra_tot * 2 div (2 * intra_pairs) AS BIGINT)").alias(
            "intra_mean_all"
        ),
    )
    return (
        intra.crossJoin(F.broadcast(ratio))
        .select(
            "label",
            "n_vectors",
            "intra_mean_sq",
            "inter_mean_sq",
            F.expr(
                "CAST(CAST(inter_mean_sq AS DECIMAL(20,0)) * 1000000"
                " div intra_mean_all AS BIGINT)"
            ).alias("separation_micro"),
        )
        .transform(pin)
        .orderBy("label")
    )


# ---------------------------------------------------------------------------
# X-121 (cont.): embedding isotropy audit via the exact sum identity
# ---------------------------------------------------------------------------

_Q2 = (1 << 20) * (1 << 20)  #: Q_SCALE^2 — quantized-unit -> cosine rescale

_ISO_ORACLE = f"""
    WITH q AS (
        SELECT vec_id,
               list_transform(ve, x -> CAST(floor(
                   x / sqrt(list_reduce(list_transform(ve, y -> y*y), (a,b) -> a+b))
                   * {1 << 20} + 0.5) AS BIGINT)) AS qv
        FROM (SELECT vec_id, embedding::DOUBLE[] AS ve FROM embeddings)
    ),
    ex AS (
        SELECT vec_id, u.j AS j, qv[u.j] AS x
        FROM q CROSS JOIN (SELECT unnest(range(1, {_DIM + 1})) AS j) u
    ),
    byj AS (
        SELECT j, CAST(SUM(x) AS HUGEINT) AS s,
               CAST(SUM(CAST(x AS HUGEINT) * x) AS HUGEINT) AS qq
        FROM ex GROUP BY j
    ),
    agg AS (
        SELECT CAST(SUM(s * s) AS HUGEINT) AS ssum,
               CAST(SUM(qq) AS HUGEINT) AS sq,
               (SELECT CAST(COUNT(*) AS BIGINT) FROM q) AS n
        FROM byj
    )
    SELECT n AS n_vectors,
           ROUND(CAST(ssum - sq AS DOUBLE) / n / (n - 1) / {_Q2}, 9)
               AS avg_pairwise_cosine,
           ROUND(sqrt(CAST(ssum AS DOUBLE)) / n / {1 << 20}, 9)
               AS mean_vector_norm
    FROM agg
"""


@query("q362_isotropy_audit", oracle=_ISO_ORACLE, tags=("X-121", "X-03"))
def q362_isotropy_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding isotropy audit: the average pairwise cosine across ALL
    n(n-1) vector pairs and the norm of the mean vector — computed
    WITHOUT any pair enumeration via the exact sum identity
    sum over i!=j of <v_i,v_j> = ||sum v||^2 - sum ||v||^2 over the
    quantized unit vectors. High average cosine / large mean-vector norm
    is representation COLLAPSE (everything points the same way — the
    failure mode that silently breaks cosine retrieval and clustering);
    a healthy space sits near zero. q331 measures between-class
    separation, q204 per-dimension spread; this is the one-row global
    health check run after every embedding-model swap.

    Determinism: all moments are exact integers (component sums and
    squares in decimal(38,0)/HUGEINT); the two readouts divide exact
    operands in a fixed order (one sqrt, IEEE-correctly rounded),
    rescaled by Q_SCALE^2 back to cosine units, rounded 9 dp.

    Scale shape: ONE map-only explode feeds ONE map-side-combined
    rollup onto the 64-row dimension relation; the final identity is an
    ungrouped aggregate of those 64 rows. O(n*d) work, O(d) shuffle,
    one row out, A-14-mergeable across shards — the pair-free discipline
    of q331 applied to the whole space.

    Reference parity: beyond-reference; completes the embedding-QA kit
    (q204 dim profile, q331 separation, q351 PQ codebooks)."""
    from ..operators.similarity import quantized_batched

    q = quantized_batched(load(spark, sf_dir, "embeddings"))
    ex = q.select("vec_id", F.posexplode("qv").alias("pos", "x"))
    byj = ex.groupBy("pos").agg(
        F.sum("x").cast("decimal(38,0)").alias("s"),
        F.sum(F.col("x").cast("decimal(19,0)") * F.col("x"))
        .cast("decimal(38,0)")
        .alias("qq"),
    )
    n_df = q.agg(F.count(F.lit(1)).cast("long").alias("n"))
    agg = byj.agg(
        F.sum(F.col("s") * F.col("s")).cast("decimal(38,0)").alias("ssum"),
        F.sum("qq").cast("decimal(38,0)").alias("sq"),
    ).join(F.broadcast(n_df))
    return agg.select(
        F.col("n").alias("n_vectors"),
        F.round(
            F.expr("CAST(ssum - sq AS DOUBLE)")
            / F.col("n")
            / (F.col("n") - 1)
            / F.lit(float(_Q2)),
            9,
        ).alias("avg_pairwise_cosine"),
        F.round(
            F.sqrt(F.expr("CAST(ssum AS DOUBLE)")) / F.col("n") / F.lit(float(1 << 20)),
            9,
        ).alias("mean_vector_norm"),
    )
