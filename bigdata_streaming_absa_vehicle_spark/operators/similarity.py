"""Similarity search over embedding columns (SURVEY.md §2K, X-03):
exact brute-force cosine top-k as the correctness baseline, and a
hyperplane-LSH bucketed variant as the scale path.

Design notes:
  - cosine is computed JVM-side with higher-order array expressions
    (zip_with + aggregate) in float64; the sequential left-to-right summation
    is bit-identical to DuckDB's list_cosine_similarity on DOUBLE[] —
    verified empirically, so exact top-k is hash-checkable.
  - the LSH planes are derived from md5 (hash64), NOT an RNG, so Spark, the
    DuckDB oracle, and any retry compute the same buckets. Bucket assignment
    is map-only (no explode/shuffle); candidate generation joins on
    (table, bucket) keys.
  - at 100 TB: brute-force top-k shuffles |probes| x |corpus| score triples —
    linear but heavy; the LSH path prunes the corpus to matching buckets
    before any scoring, which is the operator you actually run at scale.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F

from ..schemas import EMBEDDING_DIM

from ..functions.ordering import pin

N_TABLES = 4  # OR-ed hash tables
PLANES_PER_TABLE = 4  # AND-ed bits per table


def _plane_weight(table: int, plane: int, dim: int) -> int:
    """Deterministic pseudo-random weight in [-1000, 1000] from md5 — the
    same value the SQL-side hash64 family would produce, computed once on the
    driver and inlined as a literal (planes are tiny: tables*planes*dim)."""
    h = hashlib.md5(f"plane:{table}:{plane}:{dim}".encode()).hexdigest()
    return int(h[:15], 16) % 2001 - 1000


def plane_weights(
    n_tables: int = N_TABLES, planes_per_table: int = PLANES_PER_TABLE, dim: int = EMBEDDING_DIM
) -> list[list[list[int]]]:
    return [
        [[_plane_weight(t, p, d) for d in range(dim)] for p in range(planes_per_table)]
        for t in range(n_tables)
    ]


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity of two array<double> columns, sequential float64."""
    dot = F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)
    na = F.sqrt(F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x))
    nb = F.sqrt(F.aggregate(F.transform(b, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x))
    return dot / (na * nb)


def _dot_literal(vec_col: Column, weights: list[int]) -> Column:
    """w . vec with the plane weights inlined as an array literal — map-only."""
    warr = F.array(*[F.lit(float(w)) for w in weights])
    return F.aggregate(
        F.zip_with(warr, vec_col, lambda w, x: w * x), F.lit(0.0), lambda acc, x: acc + x
    )


def bucket_columns(vec_col: Column, weights: list[list[list[int]]]) -> list[Column]:
    """One int bucket per hash table: bit p = sign(plane_p . vec)."""
    cols = []
    for t, table in enumerate(weights):
        b = F.lit(0)
        for p, plane in enumerate(table):
            b = b + F.when(_dot_literal(vec_col, plane) >= 0, F.lit(1 << p)).otherwise(0)
        cols.append(b.alias(f"bucket_{t}"))
    return cols


#: fixed-point scale for the quantized cosine kernel: 2^20 per unit component
Q_SCALE = 1 << 20
Q_SCALE_SQ = float(1 << 40)


def quantized_unit_vec(vec_col: Column) -> Column:
    """array<long>: the L2-normalized vector in 2^20 fixed point,
    qi = floor(x_i/||x|| * 2^20 + 0.5). Every step (sequential sum of
    squares, sqrt, divide, floor) is IEEE-identical in Spark and DuckDB, so
    quantized vectors — and hence any integer arithmetic over them — are
    bit-equal across engines AND across summation orders. This is what lets
    the n^2 kernel run as exact int64 numpy matmul instead of interpreted
    per-pair expressions."""
    norm = F.sqrt(
        F.aggregate(F.transform(vec_col, lambda x: x * x), F.lit(0.0), lambda a, x: a + x)
    )
    return F.transform(vec_col, lambda x: F.floor(x / norm * Q_SCALE + 0.5).cast("long"))


def quantized_batched(
    emb: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """(vec_id, qv): quantized_unit_vec computed in Arrow-batched numpy —
    bit-identical to the HOF column (and the DuckDB oracle) because the sum
    of squares is taken with cumsum, which is a strict left-to-right
    sequential fold exactly like list_reduce / F.aggregate (np.sum's pairwise
    summation would NOT match), and the remaining ops (divide, multiply,
    add 0.5, floor) are elementwise IEEE double in both engines. ~40x the
    interpreted per-row HOF fold; property-tested against the HOF twin."""
    import numpy as np
    import pandas as pd

    def quantize(it):
        for pdf in it:
            if pdf.empty:
                continue
            vecs = np.stack([np.asarray(v, dtype=np.float64) for v in pdf[vec_col]])
            norms = np.sqrt(np.cumsum(vecs * vecs, axis=1)[:, -1])
            if not norms.all():
                # a zero vector has no direction: the HOF twin silently casts
                # NaN->0 while DuckDB errors the cast, so there is no parity
                # to preserve — fail loudly instead of emitting INT64_MIN
                bad = pdf[id_col].to_numpy()[norms == 0.0]
                raise ValueError(
                    f"zero-norm embedding(s) {bad[:5].tolist()}: cosine is "
                    "undefined; filter zero vectors upstream"
                )
            qv = np.floor((vecs / norms[:, None]) * Q_SCALE + 0.5).astype(np.int64)
            yield pd.DataFrame(
                {"vec_id": pdf[id_col].to_numpy(dtype=np.int64), "qv": list(qv)}
            )

    # no spread_to_cores here: the numpy quantizer is matmul-cheap, and the
    # downstream joins re-shuffle anyway — an extra round-robin exchange
    # measured net-negative (unlike the md5-loop document kernels)
    return emb.select(
        F.col(id_col), F.col(vec_col).cast("array<double>").alias(vec_col)
    ).mapInPandas(quantize, schema="vec_id long, qv array<long>")


def quantized_neardup_pairs(
    emb: DataFrame,
    threshold: float = 0.4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_blocks: int = 8,
) -> DataFrame:
    """All pairs (a < b) with quantized cosine >= threshold — fully
    distributed block-tile matmul, NO driver collect / corpus broadcast.

    Rows hash into `n_blocks` blocks on vec_id; the B(B+1)/2 block pairs
    form a tiny spark.range relation; each tile (i, j) cogroups block i
    (rows) with block j (columns) into ONE applyInPandas task that runs the
    exact int64 numpy matmul for its tile. Dot products of 2^20-scaled
    64-dim unit vectors stay < 2^46, so the arithmetic is exact and
    order-independent; `cosine` is dot/2^40, within 2^-19 of true cosine —
    the declared semantics, mirrored exactly by the oracle.

    Scale shape: each row is shuffled to ~B+1 tiles, so data movement is
    O(n*B) while the O(n^2) arithmetic spreads evenly over executors and
    driver memory stays O(1). All-pairs-above-threshold is quadratic by
    definition — at corpus scale run banded_neardup_pairs (band-prune +
    exact verify) instead and reserve this as the exact-verify tile engine."""
    import numpy as np
    import pandas as pd

    spark = emb.sparkSession
    q = (
        quantized_batched(emb, id_col, vec_col)
        .withColumn("blk", F.pmod(F.col("vec_id"), F.lit(n_blocks)))
        .localCheckpoint(eager=False)  # consumed by both tile sides — compute once
    )

    bi = spark.range(n_blocks).select(F.col("id").alias("i"))
    bj = spark.range(n_blocks).select(F.col("id").alias("j"))
    tiles = bi.crossJoin(bj).filter(F.col("i") <= F.col("j"))  # B(B+1)/2 rows

    # Both tile sides derive from q, which trips Spark's ambiguous-self-join
    # detector under cogroup — so tag each side and union into ONE grouped
    # relation instead (same shuffle volume, one applyInPandas per tile).
    rows_side = (
        q.alias("qr")
        .join(F.broadcast(tiles.alias("tr")), F.col("qr.blk") == F.col("tr.i"))
        .select(
            F.col("tr.i").alias("i"),
            F.col("tr.j").alias("j"),
            F.lit(0).alias("side"),
            "qr.vec_id",
            "qr.qv",
        )
    )
    cols_side = (
        q.alias("qc")
        .join(F.broadcast(tiles.alias("tc")), F.col("qc.blk") == F.col("tc.j"))
        .select(
            F.col("tc.i").alias("i"),
            F.col("tc.j").alias("j"),
            F.lit(1).alias("side"),
            "qc.vec_id",
            "qc.qv",
        )
    )

    def tile(key, pdf: pd.DataFrame) -> pd.DataFrame:
        left = pdf[pdf["side"] == 0]
        right = pdf[pdf["side"] == 1]
        if left.empty or right.empty:
            return pd.DataFrame({"vec_a": [], "vec_b": [], "cosine_raw": []})
        a_ids = left["vec_id"].to_numpy(dtype=np.int64)
        b_ids = right["vec_id"].to_numpy(dtype=np.int64)
        a_mat = np.stack([np.asarray(v, dtype=np.int64) for v in left["qv"]])
        b_mat = np.stack([np.asarray(v, dtype=np.int64) for v in right["qv"]])
        qcos = (a_mat @ b_mat.T) / Q_SCALE_SQ  # exact int64 dots
        keep = qcos >= threshold
        if key[0] == key[1]:  # diagonal tile: same rows both sides
            keep &= a_ids[:, None] < b_ids[None, :]
        else:  # off-diagonal: blocks disjoint, normalize pair order
            keep &= a_ids[:, None] != b_ids[None, :]
        ai, bj_ = np.nonzero(keep)
        va, vb = a_ids[ai], b_ids[bj_]
        return pd.DataFrame(
            {
                "vec_a": np.minimum(va, vb),
                "vec_b": np.maximum(va, vb),
                "cosine_raw": qcos[ai, bj_],
            }
        )

    pairs = (
        rows_side.unionByName(cols_side)
        .groupBy("i", "j")
        .applyInPandas(tile, schema="vec_a long, vec_b long, cosine_raw double")
    )
    return pairs.select(
        "vec_a", "vec_b", F.round("cosine_raw", 6).alias("cosine")
    ).transform(pin).orderBy("vec_a", "vec_b")


#: banding parameters for the scale-path near-dup (hyperplane signature over
#: the quantized vector, split into bands — candidates share >= 1 band)
N_QBANDS = 4
QBITS_PER_BAND = 6


def _qplane_weight(band: int, bit: int, dim: int) -> int:
    """Deterministic integer plane weight for the banding signature — a
    different md5 family than lsh_topk's planes so the two operators stay
    independent."""
    h = hashlib.md5(f"qplane:{band}:{bit}:{dim}".encode()).hexdigest()
    return int(h[:15], 16) % 2001 - 1000


def qband_weights(
    n_bands: int = N_QBANDS, bits: int = QBITS_PER_BAND, dim: int = EMBEDDING_DIM
) -> list[list[list[int]]]:
    return [
        [[_qplane_weight(b, p, d) for d in range(dim)] for p in range(bits)]
        for b in range(n_bands)
    ]


def _int_dot_literal(qv_col: Column, weights: list[int]) -> Column:
    """w . qv as exact int64 (|w| <= 1000, |qv_i| <= 2^20, dim 64 ->
    |dot| < 2^37): identical in Spark and DuckDB regardless of order."""
    warr = F.array(*[F.lit(w).cast("long") for w in weights])
    return F.aggregate(
        F.zip_with(warr, qv_col, lambda w, x: w * x),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def banded_neardup_pairs(
    emb: DataFrame,
    threshold: float = 0.4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Near-duplicate pairs at scale: band-prune candidates, then exact
    int64-verify ONLY the candidates — the operator you run at 100 TB
    instead of all-pairs.

    Stage 1 (map-only): quantize to 2^20 fixed point, hash into a
    N_QBANDS x QBITS_PER_BAND hyperplane sign signature (integer plane dots
    on the quantized vector — exact, engine-independent).
    Stage 2: explode to (band_idx, band_val, vec_id) and self-join on the
    band key — the candidate shuffle carries ONLY ids + band keys, never
    vectors (the q41 MinHash-LSH shape the plan tests assert).
    Stage 3: join the quantized vectors back for surviving candidates and
    verify with the exact JVM-side int64 fold; keep qcos >= threshold.

    Declared semantics (mirrored by the oracle): pairs sharing >= 1 band
    AND quantized cosine >= threshold — the standard LSH near-dup contract;
    recall vs all-pairs is a tunable of (bands, bits)."""
    import numpy as np
    import pandas as pd

    weights = qband_weights()
    n_bands, bits = len(weights), len(weights[0])
    # (n_bands*bits, dim) int64 plane matrix — tiny, shipped in the closure
    w_mat = np.array(
        [plane for band in weights for plane in band], dtype=np.int64
    )
    pows = (1 << np.arange(bits, dtype=np.int64)).reshape(1, 1, bits)

    q = quantized_batched(emb, id_col, vec_col).localCheckpoint(
        eager=False
    )  # consumed 3x: band signature + both verify sides

    def signature(it):
        # All n_bands*bits plane dots in one exact-int64 matmul per Arrow
        # batch (the interpreted per-row HOF fold is ~40x slower here), then
        # pack sign bits into per-band values. Emitted long-form: one row per
        # (vec_id, band_idx) — the candidate join key.
        for pdf in it:
            if pdf.empty:
                continue
            ids = pdf["vec_id"].to_numpy(dtype=np.int64)
            mat = np.stack([np.asarray(v, dtype=np.int64) for v in pdf["qv"]])
            dots = mat @ w_mat.T  # (n, n_bands*bits), |dot| < 2^37: exact
            bits_on = (dots >= 0).reshape(len(ids), n_bands, bits)
            vals = (bits_on * pows).sum(axis=2)  # (n, n_bands)
            yield pd.DataFrame(
                {
                    "vec_id": np.repeat(ids, n_bands),
                    "band_idx": np.tile(np.arange(n_bands, dtype=np.int64), len(ids)),
                    "band_val": vals.reshape(-1),
                }
            )

    long = q.mapInPandas(signature, schema="vec_id long, band_idx long, band_val long")

    a, b_ = long.alias("a"), long.alias("b")
    # NO distinct here: a pair sharing k bands is verified k times (k <=
    # n_bands, a constant) and deduped AFTER the threshold filter — the
    # survivors are orders of magnitude fewer than the candidates, so one
    # small post-verify exchange replaces a full candidate-set exchange
    # (round-2 verdict item; the plan test pins the exchange count)
    cand = (
        a.join(b_, ["band_idx", "band_val"])
        .filter(F.col("a.vec_id") < F.col("b.vec_id"))
        .select(F.col("a.vec_id").alias("vec_a"), F.col("b.vec_id").alias("vec_b"))
    )
    qa = q.select(F.col("vec_id").alias("vec_a"), F.col("qv").alias("qa"))
    qb = q.select(F.col("vec_id").alias("vec_b"), F.col("qv").alias("qb"))

    def verify(it):
        # Exact int64 row-wise dot per candidate pair, Arrow-batched.
        for pdf in it:
            if pdf.empty:
                continue
            am = np.stack([np.asarray(v, dtype=np.int64) for v in pdf["qa"]])
            bm = np.stack([np.asarray(v, dtype=np.int64) for v in pdf["qb"]])
            qcos = np.einsum("ij,ij->i", am, bm) / Q_SCALE_SQ
            keep = qcos >= threshold
            yield pd.DataFrame(
                {
                    "vec_a": pdf["vec_a"].to_numpy(dtype=np.int64)[keep],
                    "vec_b": pdf["vec_b"].to_numpy(dtype=np.int64)[keep],
                    "qcos": qcos[keep],
                }
            )

    scored = (
        cand.join(qa, "vec_a")
        .join(qb, "vec_b")
        .mapInPandas(verify, schema="vec_a long, vec_b long, qcos double")
    )
    return (
        scored.select("vec_a", "vec_b", F.round("qcos", 6).alias("cosine"))
        .distinct()  # duplicate band hits carry identical qcos
        .transform(pin).orderBy("vec_a", "vec_b")
    )


def oracle_banded_neardup(threshold: float = 0.4) -> str:
    """DuckDB twin of banded_neardup_pairs — same quantization, same integer
    plane family, same band keys, same exact int64 verify."""
    weights = qband_weights()
    dim = EMBEDDING_DIM

    def plane_dot(plane: list[int]) -> str:
        lit = "[" + ", ".join(str(w) for w in plane) + "]"
        return (
            f"list_reduce(list_transform(range(1, {dim + 1}), "
            f"i -> CAST(({lit})[i] AS BIGINT) * qv[i]), (x, y) -> x + y)"
        )

    band_exprs = ",\n               ".join(
        "("
        + " + ".join(
            f"CASE WHEN {plane_dot(plane)} >= 0 THEN {1 << p} ELSE 0 END"
            for p, plane in enumerate(band)
        )
        + f") AS band_{b}"
        for b, band in enumerate(weights)
    )
    band_union = "\n        UNION ALL\n        ".join(
        f"SELECT vec_id, {b} AS band_idx, band_{b} AS band_val FROM wide"
        for b in range(len(weights))
    )
    return f"""
    WITH q AS (
        SELECT vec_id,
               list_transform(ve, x -> CAST(floor(
                   x / sqrt(list_reduce(list_transform(ve, y -> y*y), (a,b) -> a+b))
                   * {Q_SCALE} + 0.5) AS BIGINT)) AS qv
        FROM (SELECT vec_id, embedding::DOUBLE[] AS ve FROM embeddings)
    ), wide AS (
        SELECT vec_id,
               {band_exprs}
        FROM q
    ), bands AS (
        {band_union}
    ), cand AS (
        SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
        FROM bands a
        JOIN bands b ON a.band_idx = b.band_idx AND a.band_val = b.band_val
        WHERE a.vec_id < b.vec_id
    ), scored AS (
        SELECT vec_a, vec_b,
               list_reduce(list_transform(range(1, {dim + 1}),
                                          i -> qa.qv[i] * qb.qv[i]),
                           (x, y) -> x + y) / {Q_SCALE_SQ} AS qcos
        FROM cand
        JOIN q qa ON qa.vec_id = cand.vec_a
        JOIN q qb ON qb.vec_id = cand.vec_b
    )
    SELECT vec_a, vec_b, ROUND(qcos, 6) AS cosine
    FROM scored WHERE qcos >= {threshold}
    ORDER BY vec_a, vec_b
    """


ORACLE_QUANTIZED_NEARDUP = f"""
    WITH q AS (
        SELECT vec_id,
               list_transform(ve, x -> CAST(floor(
                   x / sqrt(list_reduce(list_transform(ve, y -> y*y), (a,b) -> a+b))
                   * {Q_SCALE} + 0.5) AS BIGINT)) AS qv
        FROM (SELECT vec_id, embedding::DOUBLE[] AS ve FROM embeddings)
    )
    SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
           ROUND(list_reduce(list_transform(range(1, len(a.qv) + 1),
                                            i -> a.qv[i] * b.qv[i]),
                             (x, y) -> x + y) / {Q_SCALE_SQ}, 6) AS cosine
    FROM q a JOIN q b ON a.vec_id < b.vec_id
    WHERE list_reduce(list_transform(range(1, len(a.qv) + 1),
                                     i -> a.qv[i] * b.qv[i]),
                      (x, y) -> x + y) / {Q_SCALE_SQ} >= 0.4
    ORDER BY vec_a, vec_b
"""


def cosine_topk(
    corpus: DataFrame,
    probes: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k: every probe scored against the whole corpus, ranked by
    (cosine desc, vec_id asc) for a deterministic tie-break. Probes broadcast."""
    c = corpus.select(
        F.col(id_col).alias("vec_id"), F.col(vec_col).cast("array<double>").alias("vec")
    )
    p = probes.select(
        F.col(id_col).alias("probe_id"), F.col(vec_col).cast("array<double>").alias("pvec")
    )
    scored = (
        c.join(F.broadcast(p), F.col("vec_id") != F.col("probe_id"))
        .select("probe_id", "vec_id", cosine(F.col("pvec"), F.col("vec")).alias("cos"))
    )
    w = W.partitionBy("probe_id").orderBy(F.desc("cos"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("probe_id", "vec_id", F.round("cos", 6).alias("cosine"), "rank")
        .transform(pin).orderBy("probe_id", "rank")
    )


def bucketed_batched(
    df: DataFrame,
    id_col_in: str,
    id_out: str,
    vec_col: str,
    vec_out: str,
    weights: list[list[list[int]]],
) -> DataFrame:
    """(id, vec, bucket_0..T-1) with all T*P plane dots done in one
    Arrow-batched numpy pass. The float dot uses cumsum — a strict
    left-to-right sequential fold, bit-identical to the interpreted
    bucket_columns HOF and DuckDB's list_reduce (np.dot/matmul would
    reorder the accumulation and flip borderline sign bits)."""
    import numpy as np
    import pandas as pd

    w_mat = np.array(
        [plane for table in weights for plane in table], dtype=np.float64
    )  # (T*P, dim)
    nt, pp = len(weights), len(weights[0])
    pows = (1 << np.arange(pp)).astype(np.int32)

    def assign(it):
        for pdf in it:
            if pdf.empty:
                continue
            vecs = np.stack([np.asarray(v, dtype=np.float64) for v in pdf[vec_col]])
            prods = vecs[:, None, :] * w_mat[None, :, :]  # (n, T*P, dim)
            dots = np.cumsum(prods, axis=2)[:, :, -1]  # sequential fold
            bits = (dots >= 0).reshape(-1, nt, pp)
            vals = (bits * pows[None, None, :]).sum(axis=2).astype(np.int32)
            out = {id_out: pdf[id_col_in].to_numpy(np.int64), vec_out: list(vecs)}
            for t in range(nt):
                out[f"bucket_{t}"] = vals[:, t]
            yield pd.DataFrame(out)

    schema = f"{id_out} long, {vec_out} array<double>, " + ", ".join(
        f"bucket_{t} int" for t in range(nt)
    )
    return df.select(
        F.col(id_col_in), F.col(vec_col).cast("array<double>").alias(vec_col)
    ).mapInPandas(assign, schema=schema)


def lsh_topk(
    corpus: DataFrame,
    probes: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ANN top-k: score only corpus vectors sharing >= 1 hash-table bucket
    with the probe. Deterministic (md5-derived planes) so the result is
    hash-checkable; recall vs exact top-k is property-tested separately."""
    weights = plane_weights()
    c = bucketed_batched(corpus, id_col, "vec_id", vec_col, "vec", weights)
    p = bucketed_batched(probes, id_col, "probe_id", vec_col, "pvec", weights)
    # unpivot buckets to (id, table, bucket) and bucket-join IDS ONLY — the
    # candidate dedup must never shuffle the embedding arrays (same shape as
    # the q41/q44b band joins); vectors re-join per surviving candidate.
    # The probe side (queries, small by definition) broadcasts both times —
    # at scale the corpus never shuffles at all for the candidate stage.
    n = len(weights)
    stack = ", ".join(f"{t}, bucket_{t}" for t in range(n))
    c_long = c.selectExpr("vec_id", f"stack({n}, {stack}) AS (tbl, bucket)")
    p_long = p.selectExpr("probe_id", f"stack({n}, {stack}) AS (tbl, bucket)")
    cand = (
        c_long.join(F.broadcast(p_long), ["tbl", "bucket"])
        .filter(F.col("vec_id") != F.col("probe_id"))
        .select("probe_id", "vec_id")
        .dropDuplicates(["probe_id", "vec_id"])
    )
    scored = (
        cand.join(c.select("vec_id", "vec"), "vec_id")
        .join(F.broadcast(p.select("probe_id", "pvec")), "probe_id")
        .select("probe_id", "vec_id", cosine(F.col("pvec"), F.col("vec")).alias("cos"))
    )
    w = W.partitionBy("probe_id").orderBy(F.desc("cos"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("probe_id", "vec_id", F.round("cos", 6).alias("cosine"), "rank")
        .transform(pin).orderBy("probe_id", "rank")
    )


def exact_centroids(emb: DataFrame, key_col: str = "label", vec_col: str = "embedding") -> DataFrame:
    """(cid, cvec): per-key centroid with ORDER-INDEPENDENT component means
    (decimal-exact sums / count), so Spark and the DuckDB oracle compute
    bit-identical centroid vectors regardless of row order — the property
    that makes the IVF path hash-checkable end-to-end."""
    from ..functions.deterministic import dsum

    flat = emb.select(
        F.col(key_col).alias("cid"),
        F.posexplode(F.col(vec_col).cast("array<double>")).alias("pos", "val"),
    )
    per = flat.groupBy("cid", "pos").agg((dsum("val", scale=12) / F.count("val")).alias("m"))
    return per.groupBy("cid").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "m"))), lambda s: s["m"]
        ).alias("cvec")
    )


def ivf_topk(
    corpus: DataFrame,
    probes: DataFrame,
    centroids: DataFrame,
    k: int = 5,
    n_probe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF ANN top-k: assign every corpus vector to its nearest centroid
    (broadcast cross-score + rank-1 — the inverted lists), search only the
    n_probe nearest lists per probe, exact-score the candidates, keep top-k.

    At scale this is the textbook shape: centroid count ~sqrt(n), assignment
    is a map-side broadcast pass, the candidate join shuffles only probed
    cluster ids, and each probe scores |n/C| * n_probe vectors instead of n.
    Deterministic throughout (exact-decimal centroids, (cos desc, id) ties)
    so the whole pipeline hash-matches the oracle."""
    c = corpus.select(
        F.col(id_col).alias("vec_id"), F.col(vec_col).cast("array<double>").alias("vec")
    )
    p = probes.select(
        F.col(id_col).alias("probe_id"), F.col(vec_col).cast("array<double>").alias("pvec")
    )
    assign_w = W.partitionBy("vec_id").orderBy(F.desc("ccos"), F.asc("cid"))
    assigned = (
        c.crossJoin(F.broadcast(centroids))
        .withColumn("ccos", cosine(F.col("vec"), F.col("cvec")))
        .withColumn("rn", F.row_number().over(assign_w))
        .filter(F.col("rn") == 1)
        .select("vec_id", "vec", "cid")
    )
    probe_w = W.partitionBy("probe_id").orderBy(F.desc("ccos"), F.asc("cid"))
    probed = (
        p.crossJoin(F.broadcast(centroids))
        .withColumn("ccos", cosine(F.col("pvec"), F.col("cvec")))
        .withColumn("rn", F.row_number().over(probe_w))
        .filter(F.col("rn") <= n_probe)
        .select("probe_id", "pvec", "cid")
    )
    rank_w = W.partitionBy("probe_id").orderBy(F.desc("cos"), F.asc("vec_id"))
    return (
        probed.join(assigned, "cid")
        .filter(F.col("vec_id") != F.col("probe_id"))
        .select("probe_id", "vec_id", cosine(F.col("pvec"), F.col("vec")).alias("cos"))
        .withColumn("rank", F.row_number().over(rank_w))
        .filter(F.col("rank") <= k)
        .select("probe_id", "vec_id", F.round("cos", 6).alias("cosine"), "rank")
        .transform(pin).orderBy("probe_id", "rank")
    )


def oracle_ivf_topk(probe_filter: str, k: int = 5, n_probe: int = 2) -> str:
    """DuckDB twin of exact_centroids + ivf_topk over `embeddings`."""
    return f"""
    WITH vecs AS (
        SELECT vec_id, embedding::DOUBLE[] AS vec, label FROM embeddings
    ), flat AS (
        SELECT label AS cid,
               unnest(range(0, len(vec))) AS pos,
               unnest(vec) AS val
        FROM vecs
    ), per AS (
        SELECT cid, pos,
               CAST(SUM(CAST(val AS DECIMAL(28,12))) AS DOUBLE) / COUNT(val) AS m
        FROM flat GROUP BY cid, pos
    ), cents AS (
        SELECT cid, list(m ORDER BY pos) AS cvec FROM per GROUP BY cid
    ), assigned AS (
        SELECT vec_id, vec, cid FROM (
            SELECT v.vec_id, v.vec, c.cid,
                   ROW_NUMBER() OVER (PARTITION BY v.vec_id
                       ORDER BY list_cosine_similarity(v.vec, c.cvec) DESC, c.cid) AS rn
            FROM vecs v CROSS JOIN cents c
        ) WHERE rn = 1
    ), probed AS (
        SELECT probe_id, pvec, cid FROM (
            SELECT p.vec_id AS probe_id, p.vec AS pvec, c.cid,
                   ROW_NUMBER() OVER (PARTITION BY p.vec_id
                       ORDER BY list_cosine_similarity(p.vec, c.cvec) DESC, c.cid) AS rn
            FROM vecs p CROSS JOIN cents c
            WHERE {probe_filter.replace('vec_id', 'p.vec_id')}
        ) WHERE rn <= {n_probe}
    ), ranked AS (
        SELECT probe_id, vec_id,
               list_cosine_similarity(pvec, vec) AS cos,
               ROW_NUMBER() OVER (PARTITION BY probe_id
                   ORDER BY list_cosine_similarity(pvec, vec) DESC, vec_id) AS rank
        FROM probed JOIN assigned USING (cid)
        WHERE vec_id <> probe_id
    )
    SELECT probe_id, vec_id, ROUND(cos, 6) AS cosine, rank
    FROM ranked WHERE rank <= {k}
    ORDER BY probe_id, rank
    """


# ---------------------------------------------------------------------------
# DuckDB oracle twins
# ---------------------------------------------------------------------------


def _oracle_plane_dot(plane: list[int]) -> str:
    """list_reduce dot product of an inlined plane literal with `vec`."""
    lit = "[" + ", ".join(f"{w}.0" for w in plane) + "]"
    return (
        f"list_reduce(list_transform(range(1, {len(plane) + 1}), "
        f"i -> ({lit})[i] * vec[i]), (x, y) -> x + y)"
    )


def oracle_cosine_topk(probe_filter: str, k: int = 10) -> str:
    return f"""
    WITH probes AS (
        SELECT vec_id AS probe_id, embedding::DOUBLE[] AS pvec
        FROM embeddings WHERE {probe_filter}
    ), scored AS (
        SELECT probe_id, e.vec_id,
               list_cosine_similarity(pvec, e.embedding::DOUBLE[]) AS cos
        FROM probes, embeddings e
        WHERE e.vec_id <> probe_id
    ), ranked AS (
        SELECT probe_id, vec_id, cos,
               ROW_NUMBER() OVER (PARTITION BY probe_id ORDER BY cos DESC, vec_id) AS rank
        FROM scored
    )
    SELECT probe_id, vec_id, ROUND(cos, 6) AS cosine, rank
    FROM ranked WHERE rank <= {k}
    ORDER BY probe_id, rank
    """


def oracle_lsh_topk(probe_filter: str, k: int = 5) -> str:
    weights = plane_weights()
    bucket_exprs = ",\n               ".join(
        "("
        + " + ".join(
            f"CASE WHEN {_oracle_plane_dot(plane)} >= 0 THEN {1 << p} ELSE 0 END"
            for p, plane in enumerate(table)
        )
        + f") AS bucket_{t}"
        for t, table in enumerate(weights)
    )
    bucket_union = "\n        UNION ALL\n        ".join(
        f"SELECT vec_id, vec, {t} AS tbl, bucket_{t} AS bucket FROM wide"
        for t in range(len(weights))
    )
    return f"""
    WITH vecs AS (
        SELECT vec_id, embedding::DOUBLE[] AS vec FROM embeddings
    ), wide AS (
        SELECT vec_id, vec,
               {bucket_exprs}
        FROM vecs
    ), bucketed AS (
        {bucket_union}
    ), cand AS (
        SELECT DISTINCT p.vec_id AS probe_id, c.vec_id, p.vec AS pvec, c.vec
        FROM bucketed p
        JOIN bucketed c ON p.tbl = c.tbl AND p.bucket = c.bucket
        WHERE p.vec_id IN (SELECT vec_id FROM embeddings WHERE {probe_filter})
          AND c.vec_id <> p.vec_id
    ), ranked AS (
        SELECT probe_id, vec_id,
               list_cosine_similarity(pvec, vec) AS cos,
               ROW_NUMBER() OVER (PARTITION BY probe_id
                                  ORDER BY list_cosine_similarity(pvec, vec) DESC, vec_id) AS rank
        FROM cand
    )
    SELECT probe_id, vec_id, ROUND(cos, 6) AS cosine, rank
    FROM ranked WHERE rank <= {k}
    ORDER BY probe_id, rank
    """
