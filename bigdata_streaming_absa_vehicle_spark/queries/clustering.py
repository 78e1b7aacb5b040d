"""Iterative k-means clustering (SURVEY.md §2K extension X-35): Lloyd's
algorithm over the embeddings table in EXACT int64 arithmetic — the
iterative-NUMERIC companion to X-15's PageRank (per-iteration join) and
X-03's IVF (whose coarse quantizer is exactly one Lloyd update step).

The reference app trains its models offline in PyTorch
(projects/absa_streaming/scripts/train_retrain.py); the declared engine
surface needs the in-engine clustering primitive a training-data
pipeline uses for corpus bucketing / diversity sampling, expressed so
every iteration's operands are engine-identical:

- vectors quantize to 2^20 fixed point (the X-03 kernel), so squared
  L2 distances are EXACT int64 sums — argmin cannot flake;
- centroid updates are truncated integer means via the divisible-
  numerator floor-div idiom — each new centroid is again exact int64,
  so the NEXT iteration's distances are exact too (the property that
  makes an unrolled iteration hash-checkable, X-15 precedent).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.ordering import stage
from ..operators.similarity import Q_SCALE, quantized_batched
from ..schemas import EMBEDDING_DIM
from ..tables import load
from .registry import query

_K = 4  #: seed centroids = quantized vectors of vec_id 0..K-1

#: exact int64 squared L2 distance between two quantized arrays (Spark HOF;
#: sum of exact integers, so fold order is irrelevant)
_DIST_SPARK = (
    "aggregate(zip_with({a}, {b}, (x, y) -> (x - y) * (x - y)), "
    "CAST(0 AS BIGINT), (acc, v) -> acc + v)"
)

#: DuckDB twin (1-based list indexing, sequential list_reduce)
_DIST_DUCK = (
    "list_reduce(list_transform(range(1, {dim} + 1), "
    "i -> ({a}[i] - {b}[i]) * ({a}[i] - {b}[i])), (x, y) -> x + y)"
)

#: truncated-toward-zero integer mean: both engines' % truncates toward
#: zero, the numerator becomes n-divisible, and the IEEE division of a
#: divisible numerator is exact (q190 idiom, signed-safe)
_TRUNC_MEAN = "CAST((({s}) - ({s}) % ({n})) / ({n}) AS BIGINT)"


def _oracle(dim: int = EMBEDDING_DIM, k: int = _K) -> str:
    dist = _DIST_DUCK.format(a="v.qv", b="c.cv", dim=dim)

    def assign(vecs: str, cents: str, out: str) -> str:
        return f"""
    {out}_scored AS (
        SELECT v.vec_id, v.qv, c.cid, {dist} AS dist,
               ROW_NUMBER() OVER (PARTITION BY v.vec_id
                                  ORDER BY {dist} ASC, c.cid ASC) AS rn
        FROM {vecs} v CROSS JOIN {cents} c
    ),
    {out} AS (
        SELECT vec_id, qv, cid, dist FROM {out}_scored WHERE rn = 1
    )"""

    def update(assigned: str, out: str) -> str:
        return f"""
    {out}_flat AS (
        SELECT cid, u.i AS pos, qv[u.i] AS val
        FROM {assigned}, UNNEST(range(1, {dim} + 1)) AS u(i)
    ),
    {out}_comp AS (
        SELECT cid, pos,
               {_TRUNC_MEAN.format(s="CAST(SUM(val) AS BIGINT)", n="COUNT(val)")} AS m
        FROM {out}_flat GROUP BY cid, pos
    ),
    {out} AS (
        SELECT cid, list(m ORDER BY pos) AS cv FROM {out}_comp GROUP BY cid
    )"""

    return f"""
    WITH q AS (
        SELECT vec_id,
               list_transform(ve, x -> CAST(floor(
                   x / sqrt(list_reduce(list_transform(ve, y -> y*y), (a,b) -> a+b))
                   * {Q_SCALE} + 0.5) AS BIGINT)) AS qv
        FROM (SELECT vec_id, embedding::DOUBLE[] AS ve FROM embeddings)
    ),
    c0 AS (
        SELECT vec_id AS cid, qv AS cv FROM q WHERE vec_id < {k}
    ),{assign("q", "c0", "a1")},{update("a1", "c1")},{assign("q", "c1", "a2")},{update("a2", "c2")}
    SELECT s.cid,
           s.n_members,
           s.inertia_q,
           c2.cv[1] AS c0,
           c2.cv[2] AS c1
    FROM (
        SELECT cid, COUNT(*) AS n_members,
               CAST(SUM(dist) AS BIGINT) AS inertia_q
        FROM a2 GROUP BY cid
    ) s JOIN c2 USING (cid)
    ORDER BY cid
    """


@query("q195_kmeans_iterations", oracle=_oracle(), tags=("X-35", "X-03", "A-14"))
def q195_kmeans_iterations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two unrolled Lloyd iterations of k-means (K=4, seeds = the first 4
    vectors) over the quantized embedding corpus: assign each vector to
    its nearest centroid by EXACT int64 squared-L2 (tie -> lowest cid),
    recompute centroids as truncated integer component means, repeat;
    report each final cluster's size, exact quantized inertia, and the
    first two centroid components. Every iteration's operands are exact
    integers, so the trajectory is engine-identical — the same property
    X-15 proves for PageRank, here for the EM-style loop.

    Scale shape (textbook MR k-means): centroids are K bounded rows
    COLLECTED INTO ONE ARRAY and broadcast — assignment is MAP-ONLY (an
    array_sort over K exact distances per row, no per-vector shuffle and
    no window); each update is ONE map-side-combined groupBy on
    (cid, pos) — K*dim result rows; per-partition (cid,pos) partial sums
    are A-14-mergeable. Per iteration: one broadcast + one bounded-key
    shuffle, vectors never shuffle at all. The unrolled-2 form is the
    hash-checkable certificate; a convergence loop would add the X-15
    localCheckpoint pattern on the K-row centroid relation."""
    emb = load(spark, sf_dir, "embeddings")
    q = stage(quantized_batched(emb))

    def assign(cents: DataFrame) -> DataFrame:
        carr = cents.agg(
            F.collect_list(F.struct("cid", "cv")).alias("cs")
        )
        dist = _DIST_SPARK.format(a="qv", b="c.cv")
        return (
            q.crossJoin(F.broadcast(carr))
            .select(
                "vec_id",
                "qv",
                F.expr(
                    f"array_sort(transform(cs, c -> struct({dist} AS dist,"
                    " c.cid AS cid)))[0]"
                ).alias("pick"),
            )
            .select("vec_id", "qv", F.col("pick.cid").alias("cid"),
                    F.col("pick.dist").alias("dist"))
        )

    def update(assigned: DataFrame) -> DataFrame:
        comp = (
            assigned.select("cid", F.posexplode("qv").alias("pos", "val"))
            .groupBy("cid", "pos")
            .agg(
                F.expr(
                    _TRUNC_MEAN.format(
                        s="CAST(SUM(val) AS BIGINT)", n="COUNT(val)"
                    )
                ).alias("m")
            )
        )
        return comp.groupBy("cid").agg(
            F.expr(
                "transform(array_sort(collect_list(struct(pos, m))), s -> s.m)"
            ).alias("cv")
        )

    c0 = q.filter(F.col("vec_id") < _K).select(
        F.col("vec_id").alias("cid"), F.col("qv").alias("cv")
    )
    a1 = assign(c0)
    c1 = stage(update(a1))
    a2 = assign(c1)
    c2 = update(a2)
    stats = a2.groupBy("cid").agg(
        F.count(F.lit(1)).alias("n_members"),
        F.sum("dist").cast("long").alias("inertia_q"),
    )
    return (
        stats.join(c2, "cid")
        .select(
            "cid",
            "n_members",
            "inertia_q",
            F.expr("cv[0]").alias("c0"),
            F.expr("cv[1]").alias("c1"),
        )
        .orderBy("cid")
    )


# ---------------------------------------------------------------------------
# X-35 (cont.): product-quantization codebook audit
# ---------------------------------------------------------------------------

_PQ_SUBS = 8  #: 64 dims -> 8 subvectors of 8
_PQ_SUBDIM = EMBEDDING_DIM // _PQ_SUBS
_PQ_CODES = 4  #: codebook seeds = subvectors of vec_id 0..3 (one PQ train step)


def _pq_oracle() -> str:
    dist = _DIST_DUCK.format(a="v.sv", b="c.cv", dim=_PQ_SUBDIM)
    return f"""
    WITH q AS (
        SELECT vec_id,
               list_transform(ve, x -> CAST(floor(
                   x / sqrt(list_reduce(list_transform(ve, y -> y*y), (a,b) -> a+b))
                   * {Q_SCALE} + 0.5) AS BIGINT)) AS qv
        FROM (SELECT vec_id, embedding::DOUBLE[] AS ve FROM embeddings)
    ),
    subs AS (
        SELECT vec_id, u.s AS sub,
               qv[u.s * {_PQ_SUBDIM} + 1 : u.s * {_PQ_SUBDIM} + {_PQ_SUBDIM}] AS sv
        FROM q CROSS JOIN (SELECT unnest(range(0, {_PQ_SUBS})) AS s) u
    ),
    codes AS (
        SELECT sub, vec_id AS cid, sv AS cv FROM subs WHERE vec_id < {_PQ_CODES}
    ),
    scored AS (
        SELECT vec_id, sub, cid, dist FROM (
            SELECT v.vec_id, v.sub, c.cid, {dist} AS dist
            FROM subs v JOIN codes c USING (sub)
        )
    ),
    assigned AS (
        SELECT vec_id, sub, cid, dist FROM (
            SELECT vec_id, sub, cid, dist,
                   ROW_NUMBER() OVER (PARTITION BY vec_id, sub
                                      ORDER BY dist, cid) AS rn
            FROM scored
        ) WHERE rn = 1
    )
    SELECT sub, cid AS code_id,
           CAST(COUNT(*) AS BIGINT) AS n_assigned,
           CAST(SUM(dist) AS BIGINT) AS sse_q,
           ROUND(CAST(SUM(dist) AS DOUBLE) / (COUNT(*) * {_PQ_SUBDIM})
                 / {Q_SCALE * Q_SCALE}, 9) AS mse_unit
    FROM assigned GROUP BY sub, cid ORDER BY sub, code_id
    """


@query("q351_product_quantization", oracle=_pq_oracle(), tags=("X-35", "X-03"))
def q351_product_quantization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization codebook audit: the embedding space split
    into 8 subspaces of 8 dims, each subvector assigned to its nearest
    of 4 codebook entries (seeds = the first 4 vectors' subvectors —
    one PQ training step, the q195 seeding discipline), reporting per
    (subspace, code) the assignment count and exact quantized SSE/MSE —
    the compression-quality readout behind every PQ-based ANN index
    (FAISS-style IVFPQ): an unbalanced code or a high-MSE subspace says
    re-train that codebook. Completes the X-03/X-35 vector stack: q46b
    IVF is the coarse quantizer, this is the fine one.

    Determinism: subvectors come from the exact 2^20 fixed-point
    quantization (X-03 kernel); distances are exact int64 sums (fold
    order irrelevant); assignment ties break toward the lowest code id;
    SSE is an exact integer (diff^2 <= 2^42, x8 dims <= 2^45 per row —
    widen to decimal(38,0) beyond ~2^8 rows-per-partial at extreme
    scale); MSE is rescaled by Q_SCALE^2 back to unit-sphere units
    BEFORE rounding (at the raw 1e10 quantized magnitude a double
    cannot hold 6 decimals and engine rounding diverges), then one
    fixed-order division chain rounds at 9 dp.

    Scale shape: the 8-way subvector fan-out is MAP-ONLY (transform +
    explode, no shuffle); the 32-entry codebook is collected into one
    bounded array per subspace and BROADCAST (the q195 in-plan
    collect_list, no driver round-trip); assignment is map-only
    array_sort over 4 exact distances; ONE map-side-combined rollup
    lands on the bounded 32-row (sub, code) relation. Vectors never
    shuffle — the q195 invariant, preserved under subspace decomposition.

    Reference parity: beyond-reference; extends X-35 (q195 Lloyd) and
    X-03's quantized kernel family (q44/q46b)."""
    emb = load(spark, sf_dir, "embeddings")
    q = quantized_batched(emb)
    subs = (
        q.select(
            "vec_id",
            F.expr(
                f"explode(transform(sequence(0, {_PQ_SUBS - 1}), "
                f"s -> struct(s AS sub, slice(qv, s * {_PQ_SUBDIM} + 1, "
                f"{_PQ_SUBDIM}) AS sv)))"
            ).alias("e"),
        )
        .select("vec_id", F.col("e.sub").alias("sub"), F.col("e.sv").alias("sv"))
        .transform(stage)  # vector leg + codebook leg share one quantize pass
    )
    carr = (
        subs.filter(F.col("vec_id") < _PQ_CODES)
        .select("sub", F.col("vec_id").alias("cid"), F.col("sv").alias("cv"))
        .groupBy("sub")
        .agg(F.collect_list(F.struct("cid", "cv")).alias("cs"))
    )
    dist = _DIST_SPARK.format(a="sv", b="c.cv")
    assigned = (
        subs.join(F.broadcast(carr), "sub")
        .select(
            "vec_id",
            "sub",
            F.expr(
                f"array_sort(transform(cs, c -> struct({dist} AS dist,"
                " c.cid AS cid)))[0]"
            ).alias("pick"),
        )
        .select(
            "vec_id",
            "sub",
            F.col("pick.cid").alias("code_id"),
            F.col("pick.dist").alias("dist"),
        )
    )
    return (
        assigned.groupBy("sub", "code_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_assigned"),
            F.sum("dist").cast("long").alias("sse_q"),
            F.round(
                F.sum("dist").cast("double")
                / (F.count(F.lit(1)) * F.lit(_PQ_SUBDIM))
                / F.lit(float(Q_SCALE) * Q_SCALE),
                9,
            ).alias("mse_unit"),
        )
        .transform(stage)
        .orderBy("sub", "code_id")
    )
