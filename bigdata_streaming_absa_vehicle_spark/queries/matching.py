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
