"""Deduplication operators (SURVEY.md §2K, X-01/X-02): exact, MinHash-LSH,
SimHash, n-gram Jaccard.

Everything here is deterministic and engine-portable by construction: the
hash family is md5-derived (h_seed(x) = int64(md5(seed || ':' || x)[:15hex])),
which both Spark (`conv(substring(md5(..),1,15),16,10)`) and the DuckDB
oracle (`CAST('0x'||substr(md5(..),1,15) AS BIGINT)`) compute bit-identically
— verified, not assumed. No Python UDFs: shingling, MinHash, banding and
SimHash are higher-order array expressions that run inside whole-stage
codegen; the only shuffles are the LSH bucket join and the final distinct.

Scale shape (100 TB): signatures are map-only (no shuffle, no explode);
candidate generation shuffles (band_idx, band_key) — tiny keys, not
documents; exact verification joins token sets only for candidate pairs.
This is the standard shingle->minhash->band->bucket-join pipeline; a full
cross-join never appears.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

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


def minhash_signature(shingle_col: Column, n_hashes: int = N_HASHES) -> list[Column]:
    """n MinHash values; column i is min over shingles of h_i(shingle).
    Map-only: one array-min per hash, no explode, no shuffle."""
    return [
        F.array_min(F.transform(shingle_col, lambda s, i=i: hash64(str(i), s))).alias(f"sig_{i}")
        for i in range(n_hashes)
    ]


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


def simhash(element_col: Column, n_bits: int = 48) -> Column:
    """SimHash over an array of elements: bit b is 1 iff the majority of
    element-hashes have bit b set. 48 bits keeps the result in positive int64
    territory in both engines. Map-only higher-order expression (the bit loop
    unrolls on the driver — shift amounts must be Python ints in PySpark)."""

    def bit_sum(b: int) -> Column:
        # sum over elements of +1/-1 depending on bit b of the element hash
        return F.aggregate(
            element_col,
            F.lit(0),
            lambda acc, e: acc
            + F.when(
                F.shiftright(hash64("sim", e), b).bitwiseAND(F.lit(1)) == 1, 1
            ).otherwise(-1),
        )

    out = F.lit(0).cast("long")
    for b in range(n_bits):
        out = out + F.when(bit_sum(b) >= 0, F.lit(1 << b).cast("long")).otherwise(0)
    return out


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
    toks = tokens(text_col)
    base = (
        docs.select(F.col(id_col).alias("doc_id_"), toks.alias("toks"))
        .filter(F.size("toks") >= shingle_k)
        .select(
            "doc_id_",
            F.array_distinct(shingles(F.col("toks"), shingle_k)).alias("sh_set"),
        )
    )
    sigs = base.select("doc_id_", "sh_set", *minhash_signature(F.col("sh_set"), n_hashes))
    banded = sigs.select("doc_id_", "sh_set", *band_keys(n_hashes, band_rows))

    n_bands = n_hashes // band_rows
    # unpivot band columns to (doc, band_idx, band_key) rows — key-only shuffle
    stack_expr = ", ".join(f"{b}, band_{b}" for b in range(n_bands))
    long_form = banded.selectExpr(
        "doc_id_", "sh_set", f"stack({n_bands}, {stack_expr}) AS (band_idx, band_key)"
    )

    left = long_form.select(
        F.col("doc_id_").alias("doc_a"),
        F.col("sh_set").alias("sh_a"),
        "band_idx",
        "band_key",
    )
    right = long_form.select(
        F.col("doc_id_").alias("doc_b"),
        F.col("sh_set").alias("sh_b"),
        "band_idx",
        "band_key",
    )
    candidates = (
        left.join(right, ["band_idx", "band_key"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", "sh_a", "sh_b")
        .dropDuplicates(["doc_a", "doc_b"])
    )
    return (
        candidates.select(
            "doc_a", "doc_b", F.round(jaccard(F.col("sh_a"), F.col("sh_b")), 6).alias("jaccard")
        )
        .filter(F.col("jaccard") >= threshold)
        .orderBy("doc_a", "doc_b")
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
    sig_cols = ",\n           ".join(
        "list_aggregate(list_transform(sh_set, s -> "
        + oracle_hash64(str(i), "s")
        + f"), 'min') AS sig_{i}"
        for i in range(n_hashes)
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
        FROM base
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
