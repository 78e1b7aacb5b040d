"""Deduplication operators (SURVEY.md §2K, X-01/X-02): exact, MinHash-LSH,
SimHash, n-gram Jaccard.

Everything here is deterministic and engine-portable by construction: the
base hash is md5-derived (hash64(seed, x) = int64(md5(seed || ':' || x)[:15hex])),
which both Spark (`conv(substring(md5(..),1,15),16,10)`) and the DuckDB
oracle (`CAST('0x'||substr(md5(..),1,15) AS BIGINT)`) compute bit-identically
— verified, not assumed. MinHash derives its n hash functions from ONE base
hash per element via affine transforms mod 2^31-1 (exact int64 in both
engines), and SimHash folds all bit counters in a single pass — each element
is md5-hashed exactly once in either operator; md5 is the dominant cost and
naive per-(element, function) formulations measured 4-10x slower. No Python
UDFs: shingling, MinHash, banding and SimHash are higher-order array
expressions; the only shuffles are the id-only LSH bucket join, the candidate
distinct, and the verify re-join.

Scale shape (100 TB): signatures are map-only (no shuffle, no explode);
candidate generation shuffles (band_idx, band_key) — tiny keys, not
documents; exact verification joins token sets only for candidate pairs.
This is the standard shingle->minhash->band->bucket-join pipeline; a full
cross-join never appears.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.ordering import pin

#: defaults tuned for the testdata's planted near-duplicates (3-shingle
#: Jaccard >= 0.5 for planted pairs, < 0.1 background)
N_HASHES = 16
BAND_ROWS = 2  # 8 bands of 2 rows: P(candidate | j) = 1-(1-j^2)^8


def tokens(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.split(F.trim(c), r"\s+")


def shingles(tok_col: Column, k: int = 3) -> Column:
    """k-gram shingles of a token array: ['a b c', 'b c d', ...].
    Caller must filter size(tokens) >= k (sequence() would run backwards)."""
    return F.transform(
        F.sequence(F.lit(1), F.size(tok_col) - (k - 1)),
        lambda i: F.concat_ws(" ", F.slice(tok_col, i, k)),
    )


def hash64(seed: str, col: Column) -> Column:
    """Deterministic 60-bit positive hash from md5 — portable across engines."""
    return F.conv(
        F.substring(F.md5(F.concat(F.lit(f"{seed}:"), col)), 1, 15), 16, 10
    ).cast("long")


#: modulus of the affine MinHash family — prime 2^31-1 keeps a*h+b < 2^62
#: (no int64 overflow in either engine, and DuckDB BIGINT never wraps).
MH_PRIME = 2_147_483_647


def _mh_coeffs(n_hashes: int) -> list[tuple[int, int]]:
    """Deterministic (a_i, b_i) for h_i(x) = (a_i*x + b_i) mod P, md5-derived
    on the driver and inlined as literals."""
    import hashlib as _hl

    def dv(tag: str, i: int, lo: int) -> int:
        return int(_hl.md5(f"mh_{tag}:{i}".encode()).hexdigest()[:15], 16) % (MH_PRIME - lo) + lo

    return [(dv("a", i, 1), dv("b", i, 0)) for i in range(n_hashes)]


def minhash_signature(shingle_col: Column, n_hashes: int = N_HASHES) -> Column:
    """array<long> of n MinHash values; element i is min over shingles of
    h_i(shingle) under the affine family h_i(x) = (a_i*(md5_60(x) mod P) + b_i) mod P.

    One md5 per shingle (the dominant cost), then n_hashes integer affine
    transforms folded into a running element-wise min — vs the naive
    one-md5-per-(shingle, hash-function) formulation (n_hashes x the md5
    work; measured ~4x slower end-to-end at sf0.1)."""
    coeffs = _mh_coeffs(n_hashes)
    a_arr = F.array(*[F.lit(a).cast("long") for a, _ in coeffs])
    b_arr = F.array(*[F.lit(b).cast("long") for _, b in coeffs])
    bases = F.transform(shingle_col, lambda s: hash64("mh", s) % MH_PRIME)
    return F.aggregate(
        bases,
        F.expr(f"array_repeat({MH_PRIME}L, {n_hashes})"),
        lambda acc, h: F.zip_with(
            acc,
            F.zip_with(a_arr, b_arr, lambda a, b: (a * h + b) % MH_PRIME),
            lambda x, y: F.least(x, y),
        ),
    )


def minhash_signature_batched(sh_col: Column | str, n_hashes: int = N_HASHES) -> Column:
    """Arrow-batched numpy twin of :func:`minhash_signature` — identical
    values (exact integer arithmetic: md5-derived base hash mod P, affine
    transforms, element-wise min — no float, no order sensitivity), but
    hashlib+numpy replace the interpreted zip_with/least fold, which is the
    dominant cost at corpus scale after the md5s themselves. Same hash
    family, so the DuckDB oracle is unchanged. Map-only like the HOF
    variant; prefer this in hot paths, the HOF one where a Python runtime
    on executors is unwanted."""
    coeffs = _mh_coeffs(n_hashes)
    a_np = np.array([a for a, _ in coeffs], dtype=np.int64)
    b_np = np.array([b for _, b in coeffs], dtype=np.int64)

    @F.pandas_udf("array<long>")
    def _mh(sh: pd.Series) -> pd.Series:
        out = []
        for arr in sh:
            if len(arr) == 0:
                out.append([MH_PRIME] * n_hashes)
                continue
            h = np.fromiter(
                (int(hashlib.md5(b"mh:" + s.encode()).hexdigest()[:15], 16) for s in arr),
                dtype=np.int64,
                count=len(arr),
            ) % MH_PRIME
            # a < P < 2^31 and h < P, so a*h+b < 2^62: exact int64, same as the JVM
            sigs = ((a_np[None, :] * h[:, None] + b_np[None, :]) % MH_PRIME).min(axis=0)
            out.append(sigs.tolist())
        return pd.Series(out)

    return _mh(F.col(sh_col) if isinstance(sh_col, str) else sh_col)


def _iter_shingle_sets(pdf: pd.DataFrame, id_col: str, text_col: str, shingle_k: int, ws):
    """(doc_id, distinct k-shingles) per row, replicating the declared JVM
    tokenization exactly so the DuckDB oracles are unchanged: strip ASCII
    SPACES only (Spark/DuckDB `trim` do not touch tabs/newlines), split on
    `\\s+` with re.ASCII (Java regex `\\s` is the ASCII class), rows with
    fewer than k tokens dropped. That the shingle-set order differs from
    array_distinct's first-seen order is NOT a concern: every consumer
    (min/majority folds, set intersect/union sizes) is order-insensitive."""
    for did, txt in zip(pdf[id_col], pdf[text_col]):
        if not isinstance(txt, str):
            # NULL document: the JVM twin's tokens column is null, so the
            # size(tokens) >= k filter drops the row — match that silently
            # instead of AttributeError-ing the whole Arrow task
            continue
        toks = ws.split(txt.strip(" "))
        if len(toks) < shingle_k:
            continue
        grams = list(
            dict.fromkeys(
                " ".join(toks[i : i + shingle_k]) for i in range(len(toks) - shingle_k + 1)
            )
        )
        yield did, grams


def _ws_re():
    import re

    return re.compile(r"\s+", re.ASCII)


def spread_to_cores(df: DataFrame) -> DataFrame:
    """Round-robin repartition a frame that has FEWER scan splits than the
    cluster has slots — the testdata tables are single parquet files, so a
    per-row Python kernel would otherwise run on one worker. At scale the
    scan already has thousands of splits and this is a no-op (no shuffle);
    the guard keeps the operator from adding a shuffle where parallelism
    already exists."""
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


def shingle_sigs_batched(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_k: int = 3,
    n_hashes: int = N_HASHES,
) -> DataFrame:
    """(doc_id_, sh_set, sig_arr) in ONE Arrow pass: tokenize, shingle,
    distinct, MinHash — fusing the three map-only stages that dominate q41
    (see _iter_shingle_sets for the tokenization-parity contract)."""
    ws = _ws_re()
    coeffs = _mh_coeffs(n_hashes)
    a_np = np.array([a for a, _ in coeffs], dtype=np.int64)
    b_np = np.array([b for _, b in coeffs], dtype=np.int64)

    def fused(it):
        for pdf in it:
            ids, sets, sigs = [], [], []
            for did, grams in _iter_shingle_sets(pdf, id_col, text_col, shingle_k, ws):
                h = np.fromiter(
                    (
                        int(hashlib.md5(b"mh:" + s.encode()).hexdigest()[:15], 16)
                        for s in grams
                    ),
                    dtype=np.int64,
                    count=len(grams),
                ) % MH_PRIME
                sig = ((a_np[None, :] * h[:, None] + b_np[None, :]) % MH_PRIME).min(axis=0)
                ids.append(did)
                sets.append(grams)
                sigs.append(sig.tolist())
            if ids:  # empty frames carry no dtype for Arrow's list<string>
                yield pd.DataFrame({"doc_id_": ids, "sh_set": sets, "sig_arr": sigs})

    return spread_to_cores(docs.select(F.col(id_col), F.col(text_col))).mapInPandas(
        fused, schema="doc_id_ long, sh_set array<string>, sig_arr array<long>"
    )


def shingle_simhash_batched(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_k: int = 3,
    n_bits: int = 48,
) -> DataFrame:
    """(doc_id, simhash) in ONE Arrow pass: tokenize -> distinct k-shingles
    -> 48-bit SimHash (same md5 'sim' family and majority-vote fold as
    :func:`simhash` / :func:`simhash_batched`, so the oracle SQL is
    unchanged). Map-only; fuses what q42/q42b previously computed as a JVM
    shingle chain feeding a separate pandas UDF."""
    ws = _ws_re()
    shifts = np.arange(n_bits, dtype=np.uint64)

    def fused(it):
        for pdf in it:
            ids, outs = [], []
            for did, grams in _iter_shingle_sets(pdf, id_col, text_col, shingle_k, ws):
                h = np.fromiter(
                    (
                        int(hashlib.md5(b"sim:" + s.encode()).hexdigest()[:15], 16)
                        for s in grams
                    ),
                    dtype=np.uint64,
                    count=len(grams),
                )
                bits = ((h[:, None] >> shifts[None, :]) & 1).astype(np.int32)
                votes = (bits * 2 - 1).sum(axis=0)
                ids.append(did)
                outs.append(int(((votes >= 0).astype(np.int64) << shifts.astype(np.int64)).sum()))
            if ids:
                yield pd.DataFrame({"doc_id": ids, "simhash": outs})

    return spread_to_cores(docs.select(F.col(id_col), F.col(text_col))).mapInPandas(
        fused, schema="doc_id long, simhash long"
    )


def shingle_hashes_batched(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_k: int = 3,
    seed: str = "jac",
) -> DataFrame:
    """(doc_id, hs, sz): 60-bit shingle hashes (hash64 family, same md5
    derivation as the JVM expression) + set size, fused into one Arrow pass
    — the postings input for the inverted-index Jaccard join (q43)."""
    ws = _ws_re()
    prefix = f"{seed}:".encode()

    def fused(it):
        for pdf in it:
            ids, hss, szs = [], [], []
            for did, grams in _iter_shingle_sets(pdf, id_col, text_col, shingle_k, ws):
                ids.append(did)
                hss.append(
                    [int(hashlib.md5(prefix + s.encode()).hexdigest()[:15], 16) for s in grams]
                )
                szs.append(len(grams))
            if ids:
                yield pd.DataFrame({"doc_id": ids, "hs": hss, "sz": szs})

    return spread_to_cores(docs.select(F.col(id_col), F.col(text_col))).mapInPandas(
        fused, schema="doc_id long, hs array<long>, sz int"
    )


def band_keys(n_hashes: int = N_HASHES, rows: int = BAND_ROWS) -> list[Column]:
    """LSH band keys: md5 over each `rows`-slice of the signature columns."""
    keys = []
    for b in range(n_hashes // rows):
        parts = [F.col(f"sig_{b * rows + r}").cast("string") for r in range(rows)]
        keys.append(F.md5(F.concat_ws("_", *parts)).alias(f"band_{b}"))
    return keys


def jaccard(set_a: Column, set_b: Column) -> Column:
    """Jaccard over two distinct-element arrays."""
    return F.size(F.array_intersect(set_a, set_b)).cast("double") / F.size(
        F.array_union(set_a, set_b)
    )


def _shiftright_col(value: Column, amount: Column) -> Column:
    """shiftright with a column shift amount (SQL allows it; the python
    wrapper insists on a literal int)."""
    return F.call_function("shiftright", value, amount)


def _shiftleft_col(value: Column, amount: Column) -> Column:
    return F.call_function("shiftleft", value, amount)


def simhash(element_col: Column, n_bits: int = 48) -> Column:
    """SimHash over an array of elements: bit b is 1 iff the majority of
    element-hashes have bit b set. 48 bits keeps the result in positive int64
    territory in both engines.

    Single-pass fold: elements are md5-hashed ONCE (the dominant cost), then
    a zip_with step merges each hash's n_bits +1/-1 contributions into an
    accumulator array — n md5 + n*n_bits integer ops, vs the naive
    n_bits-aggregates formulation that recomputes md5 per bit (measured 10x+
    slower at sf0.1). Same value either way; the oracle SQL is unchanged."""
    hashes = F.transform(element_col, lambda e: hash64("sim", e))
    bit_idx = F.sequence(F.lit(0), F.lit(n_bits - 1))
    counts = F.aggregate(
        hashes,
        F.expr(f"array_repeat(0L, {n_bits})"),
        lambda acc, h: F.zip_with(
            acc,
            F.transform(
                bit_idx,
                lambda b: F.when(
                    _shiftright_col(h, b).bitwiseAND(F.expr("1L")) == 1, F.lit(1)
                ).otherwise(F.lit(-1)),
            ),
            lambda a, s: a + s,
        ),
    )
    return F.aggregate(
        F.zip_with(
            counts,
            bit_idx,
            lambda c, b: F.when(c >= 0, _shiftleft_col(F.expr("1L"), b)).otherwise(F.expr("0L")),
        ),
        F.expr("0L"),
        lambda acc, x: acc + x,
    )


def simhash_batched(sh_col: Column | str, n_bits: int = 48) -> Column:
    """Arrow-batched numpy twin of :func:`simhash` — bit-identical values
    (verified), ~2.5x faster than the interpreted higher-order fold at sf0.1
    because hashlib+numpy beat Catalyst's per-element lambda evaluation for
    this shape. Same md5 family, so the DuckDB oracle is unchanged. Both
    variants are map-only and scale identically; prefer this one in hot
    paths, the HOF one where a Python runtime on executors is unwanted."""

    @F.pandas_udf("long")
    def _simhash(sh: pd.Series) -> pd.Series:
        shifts = np.arange(n_bits, dtype=np.uint64)
        out = np.empty(len(sh), dtype=np.int64)
        for i, arr in enumerate(sh):
            h = np.fromiter(
                (int(hashlib.md5(b"sim:" + s.encode()).hexdigest()[:15], 16) for s in arr),
                dtype=np.uint64,
                count=len(arr),
            )
            bits = ((h[:, None] >> shifts[None, :]) & 1).astype(np.int32)
            votes = (bits * 2 - 1).sum(axis=0)
            out[i] = int(((votes >= 0).astype(np.int64) << shifts.astype(np.int64)).sum())
        return pd.Series(out)

    return _simhash(F.col(sh_col) if isinstance(sh_col, str) else sh_col)


def minhash_lsh_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.5,
    shingle_k: int = 3,
    n_hashes: int = N_HASHES,
    band_rows: int = BAND_ROWS,
) -> DataFrame:
    """Near-duplicate pairs: shingle -> MinHash -> band -> bucket-join ->
    exact-Jaccard verify. Returns (doc_a, doc_b, jaccard) with doc_a < doc_b,
    jaccard >= threshold, rounded to 6 dp.

    Reference parallel: the reference's dedup fixture is test_data.csv vs its
    identical backup copy (SURVEY.md §5.1); this operator generalizes to
    *near* duplicates at corpus scale.
    """
    # ONE fused Arrow pass (tokenize -> shingle -> distinct -> signature),
    # materialized once and consumed by both the banding branch and the
    # verify re-join
    base = shingle_sigs_batched(docs, id_col, text_col, shingle_k, n_hashes).localCheckpoint(
        eager=False
    )
    # two-step projection: the signature array is aliased once, then referenced
    # n_hashes times — multiple references stop CollapseProject from inlining
    # (and so re-computing) it per extracted element
    sigs = base.select(
        "doc_id_",
        "sh_set",
        *[F.col("sig_arr")[i].alias(f"sig_{i}") for i in range(n_hashes)],
    )
    banded = sigs.select("doc_id_", "sh_set", *band_keys(n_hashes, band_rows))

    n_bands = n_hashes // band_rows
    # unpivot band columns to (doc, band_idx, band_key) rows. IDs AND KEYS
    # ONLY — the shingle sets stay out of the candidate shuffle (at 100 TB the
    # band join must move 24-byte keys, not documents); sets are re-joined in
    # for the verify step below, and only for surviving candidate pairs.
    stack_expr = ", ".join(f"{b}, band_{b}" for b in range(n_bands))
    long_form = banded.selectExpr(
        "doc_id_", f"stack({n_bands}, {stack_expr}) AS (band_idx, band_key)"
    )

    left = long_form.select(F.col("doc_id_").alias("doc_a"), "band_idx", "band_key")
    right = long_form.select(F.col("doc_id_").alias("doc_b"), "band_idx", "band_key")
    candidates = (
        left.join(right, ["band_idx", "band_key"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .dropDuplicates(["doc_a", "doc_b"])
    )
    sets = base.select("doc_id_", "sh_set")
    verify = candidates.join(
        sets.select(F.col("doc_id_").alias("doc_a"), F.col("sh_set").alias("sh_a")), "doc_a"
    ).join(sets.select(F.col("doc_id_").alias("doc_b"), F.col("sh_set").alias("sh_b")), "doc_b")
    return (
        verify.select(
            "doc_a", "doc_b", F.round(jaccard(F.col("sh_a"), F.col("sh_b")), 6).alias("jaccard")
        )
        .filter(F.col("jaccard") >= threshold)
        .transform(pin).orderBy("doc_a", "doc_b")
    )


# ---------------------------------------------------------------------------
# DuckDB oracle twins (same algorithm, same hash family, same constants)
# ---------------------------------------------------------------------------


def oracle_hash64(seed: str, expr: str) -> str:
    return f"CAST(('0x' || substr(md5('{seed}:' || ({expr})), 1, 15)) AS BIGINT)"


def oracle_minhash_lsh_pairs(
    threshold: float = 0.5,
    shingle_k: int = 3,
    n_hashes: int = N_HASHES,
    band_rows: int = BAND_ROWS,
) -> str:
    """DuckDB SQL computing exactly minhash_lsh_pairs() over `documents`."""
    coeffs = _mh_coeffs(n_hashes)
    sig_cols = ",\n           ".join(
        f"list_aggregate(list_transform(bases, h -> ({a} * h + {b}) % {MH_PRIME}), 'min')"
        f" AS sig_{i}"
        for i, (a, b) in enumerate(coeffs)
    )
    n_bands = n_hashes // band_rows
    band_cols = ",\n           ".join(
        "md5(" + " || '_' || ".join(
            f"CAST(sig_{b * band_rows + r} AS VARCHAR)" for r in range(band_rows)
        ) + f") AS band_{b}"
        for b in range(n_bands)
    )
    band_union = "\n        UNION ALL\n        ".join(
        f"SELECT doc_id_, sh_set, {b} AS band_idx, band_{b} AS band_key FROM banded"
        for b in range(n_bands)
    )
    return f"""
    WITH base AS (
        SELECT doc_id AS doc_id_,
               list_distinct([array_to_string(toks[i:i+{shingle_k - 1}], ' ')
                              for i in range(1, len(toks) - {shingle_k - 2})]) AS sh_set
        FROM (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS toks FROM documents)
        WHERE len(toks) >= {shingle_k}
    ), sigs AS (
        SELECT doc_id_, sh_set,
           {sig_cols}
        FROM (
            SELECT doc_id_, sh_set,
                   list_transform(sh_set, s -> {oracle_hash64('mh', 's')} % {MH_PRIME}) AS bases
            FROM base
        )
    ), banded AS (
        SELECT doc_id_, sh_set,
           {band_cols}
        FROM sigs
    ), long_form AS (
        {band_union}
    ), candidates AS (
        SELECT DISTINCT a.doc_id_ AS doc_a, b.doc_id_ AS doc_b
        FROM long_form a JOIN long_form b
          ON a.band_idx = b.band_idx AND a.band_key = b.band_key
        WHERE a.doc_id_ < b.doc_id_
    )
    SELECT doc_a, doc_b,
           ROUND(len(list_intersect(x.sh_set, y.sh_set))::DOUBLE
                 / len(list_distinct(list_concat(x.sh_set, y.sh_set))), 6) AS jaccard
    FROM candidates
    JOIN base x ON x.doc_id_ = doc_a
    JOIN base y ON y.doc_id_ = doc_b
    WHERE len(list_intersect(x.sh_set, y.sh_set))::DOUBLE
          / len(list_distinct(list_concat(x.sh_set, y.sh_set))) >= {threshold}
    ORDER BY doc_a, doc_b
    """
