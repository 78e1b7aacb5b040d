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

from ..functions.ordering import pin, stage
from ..functions.partitioning import fan_out
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


# ---------------------------------------------------------------------------
# X-32 (cont.): Fellegi-Sunter match scoring over blocked candidate pairs
# ---------------------------------------------------------------------------

#: prior agreement probabilities among TRUE matches (m-probabilities) —
#: fixed documented priors; the u-probabilities (chance agreement among
#: NON-matches) are estimated from the data itself as sum(share^2).
_FS_M = {"brand": 0.9, "type": 0.8, "price": 0.7}
_FS_TOPK = 30
_PRICE_BAND = 1000  #: cents — $10 price-agreement bands


def _fs_oracle() -> str:
    return f"""
    WITH base AS (
        SELECT p_partkey AS k,
               regexp_replace(lower(split_part(p_name, ' ', 1)),
                              '[aeiou]', '', 'g') AS blk,
               p_size AS sz, p_brand AS brand, p_type AS typ,
               CAST(ROUND(p_retailprice * 100) AS BIGINT) // {_PRICE_BAND} AS band
        FROM part
    ),
    ub AS (SELECT CAST(SUM(c * c) AS BIGINT) AS s2, CAST(SUM(c) AS BIGINT) AS n
           FROM (SELECT COUNT(*) AS c FROM base GROUP BY brand)),
    ut AS (SELECT CAST(SUM(c * c) AS BIGINT) AS s2, CAST(SUM(c) AS BIGINT) AS n
           FROM (SELECT COUNT(*) AS c FROM base GROUP BY typ)),
    up AS (SELECT CAST(SUM(c * c) AS BIGINT) AS s2, CAST(SUM(c) AS BIGINT) AS n
           FROM (SELECT COUNT(*) AS c FROM base GROUP BY band)),
    w AS (
        SELECT ROUND(ln({_FS_M['brand']} / (CAST(ub.s2 AS DOUBLE) / ub.n / ub.n)), 6) AS wb_a,
               ROUND(ln((1 - {_FS_M['brand']}) / (1 - CAST(ub.s2 AS DOUBLE) / ub.n / ub.n)), 6) AS wb_d,
               ROUND(ln({_FS_M['type']} / (CAST(ut.s2 AS DOUBLE) / ut.n / ut.n)), 6) AS wt_a,
               ROUND(ln((1 - {_FS_M['type']}) / (1 - CAST(ut.s2 AS DOUBLE) / ut.n / ut.n)), 6) AS wt_d,
               ROUND(ln({_FS_M['price']} / (CAST(up.s2 AS DOUBLE) / up.n / up.n)), 6) AS wp_a,
               ROUND(ln((1 - {_FS_M['price']}) / (1 - CAST(up.s2 AS DOUBLE) / up.n / up.n)), 6) AS wp_d
        FROM ub, ut, up
    ),
    pairs AS (
        SELECT a.k AS x, b.k AS y,
               CASE WHEN a.brand = b.brand THEN 1 ELSE 0 END AS ab,
               CASE WHEN a.typ = b.typ THEN 1 ELSE 0 END AS at,
               CASE WHEN a.band = b.band THEN 1 ELSE 0 END AS ap
        FROM base a JOIN base b ON a.blk = b.blk AND a.sz = b.sz AND a.k < b.k
    )
    SELECT x, y,
           CONCAT(CASE WHEN ab = 1 THEN 'B+' ELSE 'B-' END,
                  CASE WHEN at = 1 THEN 'T+' ELSE 'T-' END,
                  CASE WHEN ap = 1 THEN 'P+' ELSE 'P-' END) AS pattern,
           ROUND((CASE WHEN ab = 1 THEN wb_a ELSE wb_d END
                  + CASE WHEN at = 1 THEN wt_a ELSE wt_d END)
                 + CASE WHEN ap = 1 THEN wp_a ELSE wp_d END, 6) AS fs_score
    FROM pairs CROSS JOIN w
    ORDER BY fs_score DESC, x, y LIMIT {_FS_TOPK}
    """


@query("q208_fellegi_sunter", oracle=_fs_oracle(), tags=("X-32", "J-01"))
def q208_fellegi_sunter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fellegi-Sunter probabilistic match scoring over the q192 blocks:
    each within-block candidate pair gets a log-likelihood-ratio weight
    per field — agree: ln(m/u), disagree: ln((1-m)/(1-u)) — summed into
    the match score that record-linkage thresholds into match / review /
    non-match. m-probabilities are documented priors; u-probabilities
    (chance agreement among non-matches) are estimated FROM THE DATA as
    sum(share^2) per field, which is exactly the probability two random
    records agree. Top-30 pairs by score. The scoring step between
    X-32's blocking and X-28's survivorship merge.

    Scale shape: the candidate join is equi on the (block, size)
    compound key — quadratic work is confined inside blocks, the budget
    q192 prices; the relation carries ids + the three compared fields
    only. The three u-statistics each reduce to a single row on a
    value-bounded rollup and CROSS-broadcast into the pair relation; the
    six weights are computed ONCE there, not per pair. ln at 6 dp (the
    q120 cross-libm precedent); u = s2/n/n divides exact integers in a
    fixed order; ranking is TakeOrdered."""
    base = load(spark, sf_dir, "part").select(
        F.col("p_partkey").alias("k"),
        F.expr(
            "regexp_replace(lower(split_part(p_name, ' ', 1)), '[aeiou]', '')"
        ).alias("blk"),
        F.col("p_size").alias("sz"),
        F.col("p_brand").alias("brand"),
        F.col("p_type").alias("typ"),
        F.expr(f"CAST(ROUND(p_retailprice * 100) AS BIGINT) DIV {_PRICE_BAND}").alias(
            "band"
        ),
        # fan_out BEFORE the checkpoint (r13): part is one tiny split, so the
        # staged relation materialized as 1 partition and the within-block
        # pair join probed 500k candidate pairs + 6-weight scoring on ONE
        # task (785ms of the 1.36s total, opt_sqlprof r13) — the q216
        # explode-over-checkpoint pattern that interleaved A/B kept.
    ).transform(lambda d: stage(fan_out(d)))  # feeds the 3 u-rollups AND both pair legs

    def u_stats(col: str):
        c = base.groupBy(col).agg(F.count(F.lit(1)).alias("c"))
        return c.agg(
            F.sum(F.col("c") * F.col("c")).cast("long").alias("s2"),
            F.sum("c").cast("long").alias("n"),
        )

    def w_pair(u, m: float, tag: str):
        share = u["s2"].cast("double") / u["n"] / u["n"]
        return u.select(
            F.round(F.log(F.lit(m) / share), 6).alias(f"w{tag}_a"),
            F.round(F.log((1 - F.lit(m)) / (1 - share)), 6).alias(f"w{tag}_d"),
        )

    w = (
        w_pair(u_stats("brand"), _FS_M["brand"], "b")
        .crossJoin(w_pair(u_stats("typ"), _FS_M["type"], "t"))
        .crossJoin(w_pair(u_stats("band"), _FS_M["price"], "p"))
    )
    a = base.select(*[F.col(c).alias(f"a_{c}") for c in base.columns])
    b = base.select(*[F.col(c).alias(f"b_{c}") for c in base.columns])
    pairs = a.join(
        b,
        (F.col("a_blk") == F.col("b_blk"))
        & (F.col("a_sz") == F.col("b_sz"))
        & (F.col("a_k") < F.col("b_k")),
    ).select(
        F.col("a_k").alias("x"),
        F.col("b_k").alias("y"),
        (F.col("a_brand") == F.col("b_brand")).cast("int").alias("ab"),
        (F.col("a_typ") == F.col("b_typ")).cast("int").alias("at"),
        (F.col("a_band") == F.col("b_band")).cast("int").alias("ap"),
    )
    agree = lambda flag, wa, wd: F.when(F.col(flag) == 1, F.col(wa)).otherwise(  # noqa: E731
        F.col(wd)
    )
    return (
        pairs.crossJoin(F.broadcast(w))
        .select(
            "x",
            "y",
            F.concat(
                F.when(F.col("ab") == 1, "B+").otherwise("B-"),
                F.when(F.col("at") == 1, "T+").otherwise("T-"),
                F.when(F.col("ap") == 1, "P+").otherwise("P-"),
            ).alias("pattern"),
            F.round(
                (agree("ab", "wb_a", "wb_d") + agree("at", "wt_a", "wt_d"))
                + agree("ap", "wp_a", "wp_d"),
                6,
            ).alias("fs_score"),
        )
        .orderBy(F.desc("fs_score"), "x", "y")
        .limit(_FS_TOPK)
    )


# ---------------------------------------------------------------------------
# X-57: sorted-neighborhood entity-resolution candidates
# ---------------------------------------------------------------------------

from pyspark.sql.window import Window  # noqa: E402  (late import, module tail)

_SN_WINDOW = 3  #: each record pairs with its next w records in sort order

_SN_ORACLE = f"""
    WITH p AS (
        SELECT p_partkey AS k, p_name AS nm,
               string_split(p_name, ' ')[1] AS blk
        FROM part
    ),
    r AS (
        SELECT k, nm, blk,
               ROW_NUMBER() OVER (PARTITION BY blk ORDER BY nm, k) AS rn
        FROM p
    ),
    pairs AS (
        SELECT a.k AS part_a, b.k AS part_b, a.nm AS name_a, b.nm AS name_b,
               CAST(len(list_intersect(string_split(a.nm, ' '),
                                       string_split(b.nm, ' '))) AS BIGINT)
                   AS overlap
        FROM r a JOIN r b
          ON a.blk = b.blk AND b.rn BETWEEN a.rn + 1 AND a.rn + {_SN_WINDOW}
    )
    SELECT part_a, part_b, name_a, name_b, overlap
    FROM pairs WHERE overlap >= 2
    ORDER BY part_a, part_b
"""


@query("q253_sorted_neighborhood", oracle=_SN_ORACLE, tags=("X-57", "X-26", "W-02"))
def q253_sorted_neighborhood(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sorted-neighborhood entity-resolution candidates: records sort by
    name inside first-token blocks, each record pairs with its next
    {_SN_WINDOW} neighbors in sort order, and pairs sharing >= 2 name
    tokens survive as match candidates — the classic SNM complement to
    q192's equality blocking (blocking misses near-keys that sort
    adjacently but hash apart; SNM catches them with a fixed O(w·n) pair
    budget instead of quadratic block interiors).  The (name, key) sort
    is a TOTAL order so the neighborhood — and hence the candidate set —
    is engine-identical.

    Scale shape: blocked-SNM, the distributed form of the method — the
    sort and sliding window run INSIDE first-token blocks, so the window
    is partitioned (no global single-partition sort) and pair generation
    is pure map-side lead(): zero joins, one exchange on the block key.
    Cross-block boundary pairs are forfeited by design (the standard
    trade; multi-pass SNM with a second sort key restores them).
    Token-overlap scoring is exact integer set intersection."""
    p = load(spark, sf_dir, "part").select(
        F.col("p_partkey").alias("k"),
        F.col("p_name").alias("nm"),
        F.split(F.col("p_name"), " ").getItem(0).alias("blk"),
    )
    w = Window.partitionBy("blk").orderBy("nm", "k")
    cols = [p["k"].alias("part_a"), p["nm"].alias("name_a")]
    legs = []
    for j in range(1, _SN_WINDOW + 1):
        legs.append(
            p.select(
                *cols,
                F.lead("k", j).over(w).alias("part_b"),
                F.lead("nm", j).over(w).alias("name_b"),
            ).filter(F.col("part_b").isNotNull())
        )
    pairs = legs[0]
    for leg in legs[1:]:
        pairs = pairs.unionByName(leg)
    scored = pairs.withColumn(
        "overlap",
        F.size(
            F.array_intersect(F.split("name_a", " "), F.split("name_b", " "))
        ).cast("long"),
    )
    return (
        scored.filter(F.col("overlap") >= 2)
        .select("part_a", "part_b", "name_a", "name_b", "overlap")
        .transform(pin)
        .orderBy("part_a", "part_b")
    )
