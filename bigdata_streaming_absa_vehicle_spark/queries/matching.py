"""Approximate string matching (SURVEY.md §2K extension X-19): an
edit-distance similarity join with lossless candidate pruning — the
entity-resolution primitive (product-name / author / address matching)
that a training-data pipeline needs when near-duplicates differ by typos
rather than shared shingles (X-02's MinHash needs token overlap; Levenshtein
catches single-character noise MinHash cannot).

The reference app has no string matching at all (grep: its only string ops
are normalize/regexp, spark_kafka_consumer_dag.py:104-108); this is declared
engine surface for the 100 TB corpus-hygiene use case.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.ordering import pin
from ..tables import load
from .registry import query

_MAX_DIST = 2  #: edit-distance threshold; also the length-band half-width


@query(
    "q137_fuzzy_word_pairs",
    oracle=f"""
    WITH words AS (
        SELECT word, COUNT(*) AS n_occurrences
        FROM (SELECT unnest(string_split(p_name, ' ')) AS word FROM part)
        GROUP BY word
    )
    SELECT a.word AS w1, b.word AS w2,
           levenshtein(a.word, b.word) AS dist,
           a.n_occurrences AS n1, b.n_occurrences AS n2
    FROM words a JOIN words b ON a.word < b.word
    WHERE levenshtein(a.word, b.word) <= {_MAX_DIST}
    ORDER BY w1, w2
    """,
    tags=("X-19",),
)
def q137_fuzzy_word_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance similarity self-join over the part-name vocabulary:
    all unordered word pairs within Levenshtein distance 2, with each
    word's corpus frequency riding along. The oracle computes the naive
    all-pairs join, so the hash PROVES the banded candidate generation
    loses no pair.

    Scale shape: candidates come from an EQUI-join on string length —
    ||a|-|b|| <= k is a necessary condition for edit distance <= k, so
    the left side explodes to the k+1 length buckets [len, len+k] and
    joins the right side's exact length (the same bounded-explode
    equi-reduction as the q77 interval join). Levenshtein runs only on
    candidates, in JVM codegen. The vocabulary relation is an agg over a
    map-only explode of the corpus — bounded by distinct words, not
    corpus rows — and at real corpus scale you add a q-gram prefix
    bucket to the join key; the length band alone already turns the
    quadratic all-pairs into per-bucket work."""
    words = (
        load(spark, sf_dir, "part")
        .select(F.explode(F.split("p_name", " ")).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n_occurrences"))
    )
    left = words.select(
        F.col("word").alias("wa"),
        F.col("n_occurrences").alias("na"),
        F.explode(
            F.array(*[F.length("word") + d for d in range(_MAX_DIST + 1)])
        ).alias("probe_len"),
    )
    right = words.select(
        F.col("word").alias("wb"),
        F.col("n_occurrences").alias("nb"),
        F.length("word").alias("len_b"),
    )
    cand = left.join(right, left.probe_len == right.len_b).filter(F.col("wa") != F.col("wb"))
    pairs = (
        cand.withColumn("dist", F.levenshtein("wa", "wb"))
        .filter(F.col("dist") <= _MAX_DIST)
        .select(
            F.least("wa", "wb").alias("w1"),
            F.greatest("wa", "wb").alias("w2"),
            "dist",
            F.when(F.col("wa") < F.col("wb"), F.col("na")).otherwise(F.col("nb")).alias("n1"),
            F.when(F.col("wa") < F.col("wb"), F.col("nb")).otherwise(F.col("na")).alias("n2"),
        )
        .distinct()  # equal-length pairs are generated from both sides
    )
    return pairs.transform(pin).orderBy("w1", "w2")


# ---------------------------------------------------------------------------
# X-32: entity-resolution blocking — candidate-pair budget before matching
# ---------------------------------------------------------------------------


@query(
    "q192_blocking_keys",
    oracle="""
    WITH keys AS (
        SELECT p_partkey,
               regexp_replace(lower(split_part(p_name, ' ', 1)),
                              '[aeiou]', '', 'g') AS block_key
        FROM part
    ),
    blocks AS (
        SELECT block_key, COUNT(*) AS n_records FROM keys GROUP BY 1
    ),
    tot AS (
        SELECT CAST(SUM(n_records * (n_records - 1)) AS BIGINT) AS pairs2_all
        FROM blocks
    )
    SELECT b.block_key,
           b.n_records,
           CAST((b.n_records * (b.n_records - 1)
                 - (b.n_records * (b.n_records - 1)) % 2) / 2 AS BIGINT)
               AS cand_pairs,
           ROUND(CAST(b.n_records * (b.n_records - 1) AS DOUBLE)
                 / t.pairs2_all, 6) AS pair_share
    FROM blocks b CROSS JOIN tot t
    WHERE b.n_records >= 2
    ORDER BY b.n_records DESC, b.block_key
    LIMIT 40
    """,
    tags=("X-32", "X-28", "A-02"),
)
def q192_blocking_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity-resolution BLOCKING: derive a cheap deterministic blocking
    key (consonant skeleton of the first name token — 'goldenrod' and
    'goldnrod' collide, typo-robust where exact grouping is not) and
    report each block's record count, within-block candidate-pair count
    n(n-1)/2, and its share of the total candidate budget. This is the
    pre-flight for X-19's Levenshtein verify and X-28's survivorship: a
    matcher only ever compares WITHIN blocks, so this table — not the
    corpus size — is the quadratic-work budget, and a hot block at the
    top is the salting signal before any pairs are generated.

    Scale shape: key derivation is map-only codegen (lower/split/
    regexp); one map-side-combined groupBy yields the block histogram;
    pair counts are ARITHMETIC on that bounded relation — no pair is
    ever materialized here. The total broadcasts back from the block
    relation; TakeOrdered keeps the top 40.

    Determinism: counts exact integers; n(n-1) is even so the /2 is an
    exact IEEE division (q190 idiom); one share division rounded 6 dp."""
    keys = load(spark, sf_dir, "part").select(
        F.expr(
            "regexp_replace(lower(split_part(p_name, ' ', 1)), '[aeiou]', '')"
        ).alias("block_key")
    )
    blocks = keys.groupBy("block_key").agg(F.count(F.lit(1)).alias("n_records"))
    tot = blocks.agg(
        F.expr("CAST(SUM(n_records * (n_records - 1)) AS BIGINT)").alias("pairs2_all")
    )
    return (
        blocks.crossJoin(F.broadcast(tot))
        .filter(F.col("n_records") >= 2)
        .select(
            "block_key",
            "n_records",
            F.expr(
                "CAST((n_records * (n_records - 1)"
                " - (n_records * (n_records - 1)) % 2) / 2 AS BIGINT)"
            ).alias("cand_pairs"),
            F.expr(
                "ROUND(CAST(n_records * (n_records - 1) AS DOUBLE)"
                " / pairs2_all, 6)"
            ).alias("pair_share"),
        )
        .orderBy(F.col("n_records").desc(), "block_key")
        .limit(40)
    )
