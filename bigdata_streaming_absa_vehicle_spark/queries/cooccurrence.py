"""Co-occurrence mining & dependence metrics (SURVEY.md §2K extension
X-22): market-basket pair counting with support/lift, and exact mutual
information between two categorical columns — the "what moves together /
which feature is informative" primitives a recommender or
feature-selection pipeline runs before any model training (the
reference's analytics stop at per-class counts, absa streamlit_app.py;
pairwise structure is the declared next derivative here).

Determinism: counts are exact integers end-to-end; support/lift are one
IEEE division each on bit-identical operands; MI follows the q120
precedent — each ln() term is rounded at 6 dp (1-ulp libm differences
cannot move a 6-dp round) and the total accumulates as exact decimal.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.ordering import pin, stage
from ..tables import load
from .registry import query

_TOP_PAIRS = 20


@query(
    "q168_basket_pairs",
    oracle=f"""
    WITH li AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
    n AS (SELECT COUNT(DISTINCT o) AS n_orders FROM li),
    ic AS (SELECT p, COUNT(*) AS cnt FROM li GROUP BY p),
    pairs AS (
        SELECT a.p AS p1, b.p AS p2, COUNT(*) AS pair_count
        FROM li a JOIN li b ON a.o = b.o AND a.p < b.p
        GROUP BY a.p, b.p
    )
    SELECT pr.p1, pr.p2, pr.pair_count,
           c1.cnt AS cnt1, c2.cnt AS cnt2,
           ROUND(CAST(pr.pair_count AS DOUBLE) / n.n_orders, 6) AS support,
           ROUND(CAST(pr.pair_count AS DOUBLE) * n.n_orders
                 / (c1.cnt * c2.cnt), 6) AS lift
    FROM pairs pr
    JOIN ic c1 ON pr.p1 = c1.p
    JOIN ic c2 ON pr.p2 = c2.p
    CROSS JOIN n
    ORDER BY pr.pair_count DESC, pr.p1, pr.p2
    LIMIT {_TOP_PAIRS}
    """,
    tags=("X-22", "J-01", "O-05"),
)
def q168_basket_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket co-occurrence: the top part PAIRS ordered together,
    with per-pair support (share of orders containing both) and lift
    (observed co-rate over the independence expectation) — the a-priori
    first pass of any "frequently bought together" recommender.

    Scale shape: ONE shuffle of the fact — groupBy(order) collects each
    basket as a SET, and the B*(B-1)/2 within-basket pairs (B<=13 here)
    generate MAP-ONLY from the sorted part array via JVM higher-order
    transforms, never a fact self-join (the self-join formulation pays
    two extra shuffles and is kept as the oracle). Item counts and the
    order total derive from the basket relation and BROADCAST back onto
    the bounded pair relation; the final top-k is a TakeOrdered under a
    (count, p1, p2) total order, so no global sort of the pair space
    ever runs."""
    baskets = (
        load(spark, sf_dir, "lineitem")
        .select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p"))
        # hold_width was MEASURED AND REJECTED here (r13): pinning the
        # basket exchange at the conf ceiling so the staged checkpoint
        # stays wide read as a win in per-stage attribution (the pair
        # explode ran on 4 tasks), but interleaved A/B at sf0.1 put the
        # wide variant 1.2x SLOWER end-to-end (2.12s vs 1.75s median of 5,
        # opt_ab_rebalance r13) — the explode is cheap enough that wide
        # checkpoint materialization costs more than the serialism it cures
        .groupBy("o")
        .agg(F.array_sort(F.collect_set("p")).alias("ps"))
        .transform(stage)  # reused by pairs, item counts, total
    )
    n = baskets.agg(F.count(F.lit(1)).alias("n_orders"))
    ic = (
        baskets.select(F.explode("ps").alias("p"))
        .groupBy("p")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    pair_structs = F.expr(
        "flatten(transform(ps, (x, i) -> "
        "transform(slice(ps, i + 2, size(ps)), y -> struct(x AS p1, y AS p2))))"
    )
    pairs = (
        baskets.select(F.explode(pair_structs).alias("pr"))
        .groupBy(F.col("pr.p1").alias("p1"), F.col("pr.p2").alias("p2"))
        .agg(F.count(F.lit(1)).alias("pair_count"))
    )
    enriched = (
        pairs.join(F.broadcast(ic.withColumnRenamed("cnt", "cnt1")), F.col("p1") == F.col("p"))
        .drop("p")
        .join(F.broadcast(ic.withColumnRenamed("cnt", "cnt2")), F.col("p2") == F.col("p"))
        .drop("p")
        .crossJoin(F.broadcast(n))
    )
    return (
        enriched.select(
            "p1",
            "p2",
            "pair_count",
            "cnt1",
            "cnt2",
            F.round(F.col("pair_count").cast("double") / F.col("n_orders"), 6).alias(
                "support"
            ),
            F.round(
                F.col("pair_count").cast("double")
                * F.col("n_orders")
                / (F.col("cnt1") * F.col("cnt2")),
                6,
            ).alias("lift"),
        )
        .orderBy(F.col("pair_count").desc(), "p1", "p2")
        .limit(_TOP_PAIRS)
    )


@query(
    "q165_mutual_information",
    oracle="""
    WITH j AS (
        SELECT event_type AS x, CAST(dayofweek(ts) AS INT) AS y,
               COUNT(*) AS n_xy
        FROM events GROUP BY 1, 2
    ),
    mx AS (SELECT x, SUM(n_xy) AS n_x FROM j GROUP BY x),
    my AS (SELECT y, SUM(n_xy) AS n_y FROM j GROUP BY y),
    t AS (SELECT SUM(n_xy) AS n FROM j),
    terms AS (
        SELECT j.x, j.y, j.n_xy,
               CAST(mx.n_x AS BIGINT) AS n_x, CAST(my.n_y AS BIGINT) AS n_y,
               ROUND((CAST(j.n_xy AS DOUBLE) / t.n)
                     * ln(CAST(j.n_xy AS DOUBLE) * t.n
                          / (CAST(mx.n_x AS DOUBLE) * my.n_y)), 6) AS mi_term
        FROM j JOIN mx USING (x) JOIN my USING (y) CROSS JOIN t
    )
    SELECT x AS event_type, y AS dow, n_xy, n_x, n_y, mi_term,
           CAST(SUM(CAST(mi_term AS DECIMAL(28,6))) OVER () AS DOUBLE) AS mi_total
    FROM terms
    ORDER BY x, y
    """,
    tags=("X-22", "A-01"),
)
def q165_mutual_information(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact mutual information between event_type and day-of-week:
    I(X;Y) = sum p(x,y) * ln(p(x,y) / (p(x)p(y))) over the joint
    contingency table — the model-free dependence measure feature
    selection ranks candidate columns by (MI ~ 0 means the feature
    carries nothing about the target). Emits the full contingency table
    with per-cell MI terms and the total replicated on every row.

    Scale shape: ONE map-side-combined groupBy over the fact produces
    the joint table; marginals and the grand total derive from that
    BOUNDED |X|x|Y| relation (35 cells here), never from a second fact
    scan, and join back via broadcast. Per-cell ln terms round at 6 dp
    (the q120 precedent for cross-libm determinism); the total sums as
    exact decimal over the bounded cell relation."""
    ev = load(spark, sf_dir, "events")
    j = (
        ev.select(
            F.col("event_type").alias("x"),
            (F.dayofweek("ts") - 1).cast("int").alias("y"),
        )
        .groupBy("x", "y")
        .agg(F.count(F.lit(1)).alias("n_xy"))
        .transform(stage)  # bounded cell relation, reused 3x
    )
    mx = j.groupBy("x").agg(F.sum("n_xy").alias("n_x"))
    my = j.groupBy("y").agg(F.sum("n_xy").alias("n_y"))
    t = j.agg(F.sum("n_xy").alias("n"))
    terms = (
        j.join(F.broadcast(mx), "x")
        .join(F.broadcast(my), "y")
        .crossJoin(F.broadcast(t))
        .select(
            "x",
            "y",
            "n_xy",
            "n_x",
            "n_y",
            F.round(
                (F.col("n_xy").cast("double") / F.col("n"))
                * F.log(
                    F.col("n_xy").cast("double")
                    * F.col("n")
                    / (F.col("n_x").cast("double") * F.col("n_y"))
                ),
                6,
            ).alias("mi_term"),
        )
    )
    return (
        terms.select(
            F.col("x").alias("event_type"),
            F.col("y").alias("dow"),
            "n_xy",
            "n_x",
            "n_y",
            "mi_term",
            F.sum(F.col("mi_term").cast("decimal(28,6)"))
            .over(Window.partitionBy())  # bounded cell relation only
            .cast("double")
            .alias("mi_total"),
        )
        .orderBy("event_type", "dow")
    )


@query(
    "q172_user_entropy",
    oracle="""
    WITH c AS (
        SELECT user_id, event_type, COUNT(*) AS n
        FROM events GROUP BY 1, 2
    ),
    u AS (
        SELECT user_id, CAST(SUM(n) AS BIGINT) AS n_u, COUNT(*) AS n_types
        FROM c GROUP BY 1
    ),
    terms AS (
        SELECT c.user_id, u.n_u, u.n_types,
               ROUND((CAST(c.n AS DOUBLE) / u.n_u)
                     * ln(CAST(c.n AS DOUBLE) / u.n_u), 9) AS t
        FROM c JOIN u ON c.user_id = u.user_id
    )
    SELECT user_id, n_u AS n_events, n_types,
           ROUND(-CAST(SUM(CAST(t AS DECIMAL(28,9))) AS DOUBLE), 6) AS entropy
    FROM terms
    GROUP BY user_id, n_u, n_types
    ORDER BY user_id
    """,
    tags=("X-22", "A-01"),
)
def q172_user_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-entity Shannon entropy of the event-type distribution:
    H(user) = -sum p*ln(p) over that user's event mix — the behavioral
    diversity score (0 = single-minded, ln(5) = uniform over all five
    types) that segmentation and bot-detection pipelines compute per
    account; the per-KEY counterpart of q165's global dependence read.

    Scale shape: ONE map-side-combined groupBy reduces the fact to the
    bounded (user x |types|<=5) relation; per-user totals and the
    entropy terms derive from that relation co-partitioned on user_id —
    the fact is scanned once and never rejoined. Per-term ln rounds at
    9 dp (the q120 cross-libm precedent), the per-user sum accumulates
    as exact decimal, and the final negate/round is IEEE-identical."""
    ev = load(spark, sf_dir, "events")
    c = (
        ev.groupBy("user_id", "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .transform(stage)  # bounded rollup, reused by totals AND terms
    )
    u = c.groupBy("user_id").agg(
        F.sum("n").cast("long").alias("n_u"), F.count(F.lit(1)).alias("n_types")
    )
    p = F.col("n").cast("double") / F.col("n_u")
    terms = c.join(u, "user_id").select(
        "user_id", "n_u", "n_types", F.round(p * F.log(p), 9).alias("t")
    )
    return (
        terms.groupBy("user_id", F.col("n_u").alias("n_events"), "n_types")
        .agg(
            F.round(-F.sum(F.col("t").cast("decimal(28,9)")).cast("double"), 6).alias(
                "entropy"
            )
        )
        .transform(pin)
        .orderBy("user_id")
    )


@query(
    "q183_bigram_pmi",
    oracle="""
    WITH toks AS (
        SELECT string_split_regex(trim(text), '\\s+') AS w FROM documents
    ),
    pairs AS (
        SELECT w[i] AS w1, w[i + 1] AS w2
        FROM toks, LATERAL (
            SELECT unnest(generate_series(1, len(w) - 1)) AS i
        )
    ),
    bg AS (
        SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c_xy
        FROM pairs WHERE w1 <> '' AND w2 <> '' GROUP BY w1, w2
    ),
    uni AS (
        SELECT token, CAST(COUNT(*) AS BIGINT) AS c
        FROM (SELECT unnest(w) AS token FROM toks)
        WHERE token <> '' GROUP BY token
    ),
    tot AS (
        SELECT CAST((SELECT SUM(c) FROM uni) AS BIGINT) AS n_tok,
               CAST((SELECT SUM(c_xy) FROM bg) AS BIGINT) AS n_bg
    )
    SELECT w1, w2, c_xy,
           ROUND(ln((CAST(c_xy AS DOUBLE) * n_tok * n_tok)
                    / (CAST(n_bg AS DOUBLE) * u1.c * u2.c)), 6) AS pmi
    FROM bg
    JOIN uni u1 ON bg.w1 = u1.token
    JOIN uni u2 ON bg.w2 = u2.token
    CROSS JOIN tot
    ORDER BY c_xy DESC, w1, w2 LIMIT 50
    """,
    tags=("X-22", "F-09", "O-05"),
)
def q183_bigram_pmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adjacent-bigram collocations ranked by frequency with pointwise
    mutual information: PMI = ln(p(xy) / (p(x)p(y))) tells a tokenizer
    or phrase-mining pass which word pairs stick together beyond chance
    ("new york" high PMI, "of the" high count but low PMI) — the
    corpus-statistics complement to q121's BPE pair counting (BPE ranks
    by raw count; PMI normalizes away unigram frequency).

    Scale shape: bigram construction is a MAP-ONLY JVM higher-order zip
    of each token array with its own tail (fan-out = tokens per doc, no
    self-join); both count rollups are map-side combined onto
    vocabulary-bounded relations; the unigram side BROADCASTS into the
    bigram relation twice; corpus totals broadcast from one bounded agg;
    the final ranking is TakeOrdered top-k, never a global sort.  PMI's
    single ln() runs on identically-parenthesized IEEE operands and is
    rounded at 6 dp (the q120 cross-libm precedent)."""
    toks = load(spark, sf_dir, "documents").select(
        F.split(F.trim(F.col("text")), r"\s+").alias("w")
    )
    pairs = toks.select(
        F.explode(
            F.arrays_zip(
                F.slice(F.col("w"), 1, F.greatest(F.size("w") - 1, F.lit(0))),
                F.slice(F.col("w"), 2, F.greatest(F.size("w") - 1, F.lit(0))),
            )
        ).alias("p")
    ).select(F.col("p.`0`").alias("w1"), F.col("p.`1`").alias("w2"))
    bg = (
        pairs.where((F.col("w1") != "") & (F.col("w2") != ""))
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).cast("long").alias("c_xy"))
        .transform(stage)  # vocab^2-bounded; feeds the total and the report
    )
    uni = (
        toks.select(F.explode("w").alias("token"))
        .where(F.col("token") != "")
        .groupBy("token")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
        .transform(stage)  # vocab-bounded; feeds the total and both join legs
    )
    tot = uni.agg(F.sum("c").cast("long").alias("n_tok")).crossJoin(
        bg.agg(F.sum("c_xy").cast("long").alias("n_bg"))
    )
    u1 = uni.select(F.col("token").alias("w1"), F.col("c").alias("c1"))
    u2 = uni.select(F.col("token").alias("w2"), F.col("c").alias("c2"))
    return (
        bg.join(F.broadcast(u1), "w1")
        .join(F.broadcast(u2), "w2")
        .crossJoin(F.broadcast(tot))
        .select(
            "w1",
            "w2",
            "c_xy",
            F.round(
                F.log(
                    (F.col("c_xy").cast("double") * F.col("n_tok") * F.col("n_tok"))
                    / (F.col("n_bg").cast("double") * F.col("c1") * F.col("c2"))
                ),
                6,
            ).alias("pmi"),
        )
        .orderBy(F.col("c_xy").desc(), "w1", "w2")
        .limit(50)
    )


# ---------------------------------------------------------------------------
# X-42: corpus-LM document scoring (bigram surprisal)
# ---------------------------------------------------------------------------


@query(
    "q203_bigram_surprisal",
    oracle=r"""
    WITH toks AS (
        SELECT doc_id, string_split_regex(trim(text), '\s+') AS w FROM documents
    ),
    pairs AS (
        SELECT doc_id, w[i] AS w1, w[i + 1] AS w2
        FROM toks, LATERAL (
            SELECT unnest(generate_series(1, len(w) - 1)) AS i
        )
        WHERE w[i] <> '' AND w[i + 1] <> ''
    ),
    bg AS (
        SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c12
        FROM pairs GROUP BY w1, w2
    ),
    uni AS (
        SELECT token, CAST(COUNT(*) AS BIGINT) AS c
        FROM (SELECT unnest(w) AS token FROM toks)
        WHERE token <> '' GROUP BY token
    ),
    s AS (
        SELECT w1, w2,
               ROUND(ln(CAST(c AS DOUBLE) / c12), 6) AS s
        FROM bg JOIN uni ON bg.w1 = uni.token
    )
    SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
           CAST(CAST(SUM(CAST(s AS DECIMAL(28,6))) * 1000000000 AS BIGINT)
                // COUNT(*) AS DOUBLE) / 1000000000 AS avg_surprisal
    FROM pairs JOIN s USING (w1, w2)
    GROUP BY doc_id ORDER BY doc_id
    """,
    tags=("X-42", "X-22", "F-09"),
)
def q203_bigram_surprisal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document bigram surprisal under the corpus's own language
    model: every adjacent pair costs -ln p(w2|w1) with p = c(w1 w2) /
    c(w1) estimated from the whole corpus, and a document's score is the
    mean cost over its bigrams — the cheap statistical stand-in for
    model-perplexity quality filtering (gibberish and boilerplate-free
    text scores HIGH-surprisal, templated/repeated text scores low; used
    with q143's shingle novelty it separates 'novel' from 'noise').
    Scoring the training corpus with itself means every bigram has
    count >= 1, so no smoothing constant muddies determinism; docs with
    fewer than two non-empty tokens have no bigrams and drop out.

    Scale shape: bigram construction is q183's MAP-ONLY zip-with-tail
    (fan-out = tokens/doc); both count rollups are map-side combined
    onto vocabulary-bounded relations; the per-bigram cost table joins
    uni->bg vocabulary-side and then BROADCASTS into the doc-pairs
    relation keyed by (w1, w2) — at extreme vocabulary the same join
    co-partitions on the pair key instead, the dataflow is unchanged.
    ln at 6 dp (the q120 cross-libm precedent), per-doc sums in exact
    decimal, one final division on bit-identical operands."""
    toks = load(spark, sf_dir, "documents").select(
        "doc_id", F.split(F.trim(F.col("text")), r"\s+").alias("w")
    )
    pairs = (
        toks.select(
            "doc_id",
            F.explode(
                F.arrays_zip(
                    F.slice(F.col("w"), 1, F.greatest(F.size("w") - 1, F.lit(0))),
                    F.slice(F.col("w"), 2, F.greatest(F.size("w") - 1, F.lit(0))),
                )
            ).alias("p"),
        )
        .select("doc_id", F.col("p.`0`").alias("w1"), F.col("p.`1`").alias("w2"))
        .where((F.col("w1") != "") & (F.col("w2") != ""))
        .transform(stage)  # feeds the LM counts AND the per-doc scoring leg
    )
    bg = pairs.groupBy("w1", "w2").agg(F.count(F.lit(1)).cast("long").alias("c12"))
    uni = (
        toks.select(F.explode("w").alias("token"))
        .where(F.col("token") != "")
        .groupBy("token")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    s = bg.join(uni.withColumnRenamed("token", "w1"), "w1").select(
        "w1",
        "w2",
        F.round(F.log(F.col("c").cast("double") / F.col("c12")), 6).alias("s"),
    )
    return (
        pairs.join(F.broadcast(s), ["w1", "w2"])
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_bigrams"),
            # nano-unit integer floor-div, then one exact-operand double
            # division — ROUND(sum/n, 6) flakes between engines when the
            # mean lands on a representable 6-dp tie (found at sf0.1:
            # 253.802869/74 is exactly 3.4297685), the q214 hazard
            (
                F.expr(
                    "CAST(sum(CAST(s AS DECIMAL(28,6))) * 1000000000 AS BIGINT)"
                    " DIV count(1)"
                ).cast("double")
                / 1_000_000_000
            ).alias("avg_surprisal"),
        )
        .transform(pin)
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# X-22 (cont.): chi-square test of independence (the hypothesis-test
# companion of q165's mutual information)
# ---------------------------------------------------------------------------


@query(
    "q210_chi_square",
    oracle="""
    WITH joint AS (
        SELECT event_type, CAST(dayofweek(ts) + 1 AS INT) AS dow,
               CAST(COUNT(*) AS BIGINT) AS o
        FROM events GROUP BY event_type, dayofweek(ts) + 1
    ),
    r AS (SELECT event_type, CAST(SUM(o) AS BIGINT) AS r FROM joint GROUP BY event_type),
    c AS (SELECT dow, CAST(SUM(o) AS BIGINT) AS c FROM joint GROUP BY dow),
    t AS (SELECT CAST(SUM(o) AS BIGINT) AS t,
                 COUNT(DISTINCT event_type) AS nr, COUNT(DISTINCT dow) AS nc
          FROM joint),
    terms AS (
        SELECT ROUND(CAST((CAST(o AS HUGEINT) * t - CAST(r.r AS HUGEINT) * c.c)
                          * (CAST(o AS HUGEINT) * t - CAST(r.r AS HUGEINT) * c.c)
                          AS DOUBLE)
                     / CAST(CAST(r.r AS HUGEINT) * c.c * t AS DOUBLE), 9) AS term
        FROM joint
        JOIN r USING (event_type)
        JOIN c USING (dow)
        CROSS JOIN t
    )
    SELECT (SELECT CAST((nr - 1) * (nc - 1) AS BIGINT) FROM t) AS dof,
           (SELECT t FROM t) AS n,
           ROUND(CAST(SUM(CAST(term AS DECIMAL(28,9))) AS DOUBLE), 6) AS chi2
    FROM terms
    """,
    tags=("X-22", "A-01"),
)
def q210_chi_square(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson chi-square test of independence between event type and
    day-of-week — the hypothesis-test companion of q165's mutual
    information (MI measures HOW dependent; chi-square against its dof
    says whether the dependence beats sampling noise). Reported as the
    test statistic plus degrees of freedom (the p-value lookup is a
    client-side table; shipping a libm-heavy igamma would break the
    engine's cross-libm discipline for zero analytic gain).

    Determinism: each cell's term (o*T - r*c)^2 / (r*c*T) is a ratio of
    EXACT integers (decimal(38,0) / HUGEINT products), divided once in
    double and rounded 9 dp, then decimal-summed — the q120 precedent.

    Scale shape: ONE map-side-combined rollup reduces the fact to the
    bounded |types| x 7 joint table; marginals and the total derive from
    that relation (never a second fact scan) and join back on the
    bounded keys; one scalar row reaches the driver."""
    ev = load(spark, sf_dir, "events")
    joint = (
        ev.groupBy("event_type", F.dayofweek("ts").alias("dow"))
        .agg(F.count(F.lit(1)).cast("long").alias("o"))
        .transform(stage)  # bounded 5x7 relation, feeds marginals + terms
    )
    r = joint.groupBy("event_type").agg(F.sum("o").cast("long").alias("r"))
    c = joint.groupBy("dow").agg(F.sum("o").cast("long").alias("c"))
    t = joint.agg(
        F.sum("o").cast("long").alias("t"),
        F.count_distinct("event_type").alias("nr"),
        F.count_distinct("dow").alias("nc"),
    )
    d0 = "decimal(38,0)"
    num = F.col("o").cast(d0) * F.col("t") - F.col("r").cast(d0) * F.col("c")
    den = (F.col("r").cast(d0) * F.col("c") * F.col("t")).cast(d0)
    terms = (
        joint.join(F.broadcast(r), "event_type")
        .join(F.broadcast(c), "dow")
        .crossJoin(F.broadcast(t))
        .select(
            "nr",
            "nc",
            "t",
            F.round((num * num).cast("double") / den.cast("double"), 9).alias("term"),
        )
    )
    return terms.groupBy(
        ((F.col("nr") - 1) * (F.col("nc") - 1)).cast("long").alias("dof"),
        F.col("t").alias("n"),
    ).agg(
        F.round(F.sum(F.col("term").cast("decimal(28,9)")).cast("double"), 6).alias(
            "chi2"
        )
    )


# ---------------------------------------------------------------------------
# X-58: item-item collaborative-filtering neighbors (top-k by cosine)
# ---------------------------------------------------------------------------

_CF_TOPK = 3  #: neighbors kept per item

_CF_ORACLE = f"""
    WITH b AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
    pc AS (
        SELECT a.p AS p1, b2.p AS p2, CAST(COUNT(*) AS BIGINT) AS c
        FROM b a JOIN b b2 ON a.o = b2.o AND a.p < b2.p
        GROUP BY 1, 2
    ),
    ic AS (SELECT p, CAST(COUNT(*) AS BIGINT) AS ci FROM b GROUP BY p),
    sym AS (
        SELECT p1 AS i, p2 AS j, c FROM pc
        UNION ALL
        SELECT p2, p1, c FROM pc
    ),
    sc AS (
        SELECT i, j, c, ia.ci AS c_item, ja.ci AS c_neighbor,
               CAST(c AS DOUBLE)
                   / sqrt(CAST(ia.ci AS DOUBLE) * CAST(ja.ci AS DOUBLE)) AS cosine
        FROM sym JOIN ic ia ON sym.i = ia.p JOIN ic ja ON sym.j = ja.p
    )
    SELECT i AS item, rnk, j AS neighbor, c AS c_pair, c_item, c_neighbor, cosine
    FROM (SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY i
                         ORDER BY cosine DESC, j) AS INTEGER) AS rnk
          FROM sc)
    WHERE rnk <= {_CF_TOPK}
    ORDER BY item, rnk
"""


@query("q254_item_neighbors", oracle=_CF_ORACLE, tags=("X-58", "O-05"))
def q254_item_neighbors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Item-item collaborative-filtering neighbor lists: per part, the
    top-{_CF_TOPK} co-purchased parts by cosine similarity
    c_ij / sqrt(c_i * c_j) over order baskets — the precomputed artifact
    a "customers also bought" recommender serves, and the normalized
    refinement of q168's raw pair support/lift (cosine discounts the
    popularity bias that makes bestsellers everyone's neighbor).

    Determinism: all counts are exact integers; each cosine is one IEEE
    sqrt+divide on bit-identical operands, so the scores — and the
    (cosine DESC, neighbor) ranking with its exact-tie fallback — are
    engine-identical without any rounding.

    Scale shape: one shuffle builds the distinct (order, part) basket
    relation; the within-basket pair generator is the q168 map-only
    array transform (never a fact self-join — that formulation is the
    oracle); the symmetric flip is map-only, item counts broadcast onto
    the bounded pair relation twice, and the per-item top-k is the q13
    grouped-top-k window over each item's neighbor candidates."""
    baskets = (
        load(spark, sf_dir, "lineitem")
        .select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p"))
        .groupBy("o")
        .agg(F.array_sort(F.collect_set("p")).alias("ps"))
        .transform(stage)  # reused by pairs + item counts
    )
    pair_structs = F.expr(
        "flatten(transform(ps, (x, i) -> "
        "transform(slice(ps, i + 2, size(ps)), y -> struct(x AS p1, y AS p2))))"
    )
    pc = (
        baskets.select(F.explode(pair_structs).alias("pr"))
        .select(F.col("pr.p1").alias("p1"), F.col("pr.p2").alias("p2"))
        .groupBy("p1", "p2")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    ic = (
        baskets.select(F.explode("ps").alias("p"))
        .groupBy("p")
        .agg(F.count(F.lit(1)).cast("long").alias("ci"))
    )
    sym = pc.select(F.col("p1").alias("i"), F.col("p2").alias("j"), "c").unionByName(
        pc.select(F.col("p2").alias("i"), F.col("p1").alias("j"), "c")
    )
    ia = ic.select(F.col("p").alias("i"), F.col("ci").alias("c_item"))
    ja = ic.select(F.col("p").alias("j"), F.col("ci").alias("c_neighbor"))
    sc = (
        sym.join(F.broadcast(ia), "i")
        .join(F.broadcast(ja), "j")
        .withColumn(
            "cosine",
            F.col("c").cast("double")
            / F.sqrt(F.col("c_item").cast("double") * F.col("c_neighbor").cast("double")),
        )
    )
    rnk = F.row_number().over(
        Window.partitionBy("i").orderBy(F.col("cosine").desc(), "j")
    )
    return (
        sc.withColumn("rnk", rnk)
        .filter(F.col("rnk") <= _CF_TOPK)
        .select(
            F.col("i").alias("item"),
            "rnk",
            F.col("j").alias("neighbor"),
            F.col("c").alias("c_pair"),
            "c_item",
            "c_neighbor",
            "cosine",
        )
        .transform(pin)
        .orderBy("item", "rnk")
    )


# ---------------------------------------------------------------------------
# X-75: frequent triples + association rules (Apriori level 3)
# ---------------------------------------------------------------------------

_TOP_TRIPLES = 20

_TRIPLES_ORACLE = f"""
    WITH li AS MATERIALIZED (SELECT DISTINCT l_orderkey AS o, p_brand AS b
                FROM lineitem JOIN part ON l_partkey = p_partkey),
    n AS (SELECT COUNT(DISTINCT o) AS n_orders FROM li),
    ic AS MATERIALIZED (SELECT b, CAST(COUNT(*) AS BIGINT) AS cnt FROM li GROUP BY b),
    pc AS MATERIALIZED (
        SELECT x.b AS b1, y.b AS b2, CAST(COUNT(*) AS BIGINT) AS cnt
        FROM li x JOIN li y ON x.o = y.o AND x.b < y.b
        GROUP BY 1, 2
    ),
    tc AS MATERIALIZED (
        SELECT x.b AS b1, y.b AS b2, z.b AS b3, CAST(COUNT(*) AS BIGINT) AS cnt
        FROM li x JOIN li y ON x.o = y.o AND x.b < y.b
                  JOIN li z ON x.o = z.o AND y.b < z.b
        GROUP BY 1, 2, 3
    )
    SELECT tc.b1, tc.b2, tc.b3, tc.cnt AS triple_count,
           ROUND(CAST(tc.cnt AS DOUBLE) / n_orders, 6) AS support,
           ROUND(CAST(tc.cnt AS DOUBLE) * n_orders * n_orders
                 / (CAST(c1.cnt AS DOUBLE) * c2.cnt * c3.cnt), 6) AS lift3,
           ROUND(CAST(tc.cnt AS DOUBLE) / p12.cnt, 6) AS conf_12_3,
           ROUND(CAST(tc.cnt AS DOUBLE) / p13.cnt, 6) AS conf_13_2,
           ROUND(CAST(tc.cnt AS DOUBLE) / p23.cnt, 6) AS conf_23_1
    FROM tc
    JOIN ic c1 ON tc.b1 = c1.b
    JOIN ic c2 ON tc.b2 = c2.b
    JOIN ic c3 ON tc.b3 = c3.b
    JOIN pc p12 ON tc.b1 = p12.b1 AND tc.b2 = p12.b2
    JOIN pc p13 ON tc.b1 = p13.b1 AND tc.b3 = p13.b2
    JOIN pc p23 ON tc.b2 = p23.b1 AND tc.b3 = p23.b2
    CROSS JOIN n
    ORDER BY triple_count DESC, tc.b1, tc.b2, tc.b3
    LIMIT {_TOP_TRIPLES}
"""


@query("q271_apriori_triples", oracle=_TRIPLES_ORACLE, tags=("X-75", "X-22", "O-05"))
def q271_apriori_triples(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequent brand TRIPLES with 3-way lift and directional rule
    confidences — Apriori level 3 on order baskets: for each top triple
    {{b1,b2,b3}}, support, lift vs 3-way independence, and the
    confidence of each 2-antecedent rule ({{b1,b2}}->b3 etc., triple
    count over pair count) — the next lattice level above q168's pairs
    and the rule mining any "frequently bought together" bundle engine
    runs before ranking bundles.

    Determinism: all counts are exact integers; support/lift/confidence
    are single IEEE divisions on bit-identical operands rounded 6 dp;
    the top-k is a TakeOrdered under the (count, b1, b2, b3) total order.

    Scale shape: ONE fact shuffle collects each order's distinct-brand
    SET (bounded by the 25-brand domain); the <= C(B,3) within-basket
    triples and C(B,2) pairs generate MAP-ONLY from the sorted array via
    JVM higher-order transforms (never a fact self-join — the 3-way
    self-join is kept as the oracle); item and pair counts re-enter
    BROADCAST onto the bounded triple relation."""
    li = load(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("o"), "l_partkey"
    )
    part = load(spark, sf_dir, "part").select("p_partkey", F.col("p_brand").alias("b"))
    baskets = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        # hold_width was MEASURED AND REJECTED here (r13, same verdict as
        # q168): interleaved A/B at sf0.1 put the pinned-wide basket
        # exchange 1.7x SLOWER end-to-end (2.88s vs 1.67s median of 5,
        # opt_ab_rebalance r13) despite the triple explode profiling as a
        # 5-task stage — AQE's narrow checkpoint is the right call here
        .groupBy("o")
        .agg(F.array_sort(F.collect_set("b")).alias("bs"))
        .transform(stage)  # triples, pairs, item counts, total all read it
    )
    n = baskets.agg(F.count(F.lit(1)).alias("n_orders"))
    ic = (
        baskets.select(F.explode("bs").alias("b"))
        .groupBy("b")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
    pair_structs = F.expr(
        "flatten(transform(bs, (x, i) -> "
        "transform(slice(bs, i + 2, size(bs)), y -> struct(x AS b1, y AS b2))))"
    )
    pc = (
        baskets.select(F.explode(pair_structs).alias("pr"))
        .groupBy(F.col("pr.b1").alias("b1"), F.col("pr.b2").alias("b2"))
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
    triple_structs = F.expr(
        "flatten(flatten(transform(bs, (x, i) -> "
        "transform(slice(bs, i + 2, size(bs)), (y, j) -> "
        "transform(slice(bs, i + j + 3, size(bs)), z -> "
        "struct(x AS b1, y AS b2, z AS b3))))))"
    )
    tc = (
        baskets.select(F.explode(triple_structs).alias("tr"))
        .groupBy(
            F.col("tr.b1").alias("b1"),
            F.col("tr.b2").alias("b2"),
            F.col("tr.b3").alias("b3"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("triple_count"))
    )

    def _ic(alias):
        return F.broadcast(
            ic.select(F.col("b").alias(f"_{alias}"), F.col("cnt").alias(f"c{alias}"))
        )

    def _pc(alias):
        return F.broadcast(
            pc.select(
                F.col("b1").alias(f"_{alias}x"),
                F.col("b2").alias(f"_{alias}y"),
                F.col("cnt").alias(f"p{alias}"),
            )
        )

    e = (
        tc.join(_ic("1"), F.col("b1") == F.col("_1"))
        .join(_ic("2"), F.col("b2") == F.col("_2"))
        .join(_ic("3"), F.col("b3") == F.col("_3"))
        .join(_pc("12"), (F.col("b1") == F.col("_12x")) & (F.col("b2") == F.col("_12y")))
        .join(_pc("13"), (F.col("b1") == F.col("_13x")) & (F.col("b3") == F.col("_13y")))
        .join(_pc("23"), (F.col("b2") == F.col("_23x")) & (F.col("b3") == F.col("_23y")))
        .crossJoin(F.broadcast(n))
    )
    return (
        e.select(
            "b1",
            "b2",
            "b3",
            "triple_count",
            F.round(F.col("triple_count").cast("double") / F.col("n_orders"), 6).alias(
                "support"
            ),
            F.round(
                F.col("triple_count").cast("double")
                * F.col("n_orders")
                * F.col("n_orders")
                / (F.col("c1").cast("double") * F.col("c2") * F.col("c3")),
                6,
            ).alias("lift3"),
            F.round(F.col("triple_count").cast("double") / F.col("p12"), 6).alias(
                "conf_12_3"
            ),
            F.round(F.col("triple_count").cast("double") / F.col("p13"), 6).alias(
                "conf_13_2"
            ),
            F.round(F.col("triple_count").cast("double") / F.col("p23"), 6).alias(
                "conf_23_1"
            ),
        )
        .orderBy(F.col("triple_count").desc(), "b1", "b2", "b3")
        .limit(_TOP_TRIPLES)
    )


# ---------------------------------------------------------------------------
# X-96: spectral token embedding from PPMI co-occurrence (1-D)
# ---------------------------------------------------------------------------

_SPE_K = 30  #: vocabulary size — the bounded PPMI matrix is K x K
_SPE_ITERS = 3


def _spectral_oracle() -> str:
    ctes = ""
    prev = "v0"
    for it in range(1, _SPE_ITERS + 1):
        ctes += f""",
    g{it} AS (
        SELECT m.j, SUM(CAST(v.v6 AS HUGEINT) * m.pmi6) AS g
        FROM ppmi m JOIN {prev} v ON v.j = m.i
        GROUP BY m.j
    ),
    v{it} AS (
        SELECT j,
               (CASE WHEN g < 0 THEN -1 ELSE 1 END)
                   * CAST((abs(g) * 1000000) // (SELECT MAX(abs(g)) FROM g{it})
                          AS BIGINT) AS v6
        FROM g{it}
    )"""
        prev = f"v{it}"
    return rf"""
    WITH dt AS (
        SELECT DISTINCT doc_id, tok
        FROM (SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS tok
              FROM documents)
    ),
    df AS (
        SELECT tok, CAST(COUNT(*) AS BIGINT) AS c FROM dt GROUP BY tok
    ),
    topk AS (
        SELECT tok, c, ROW_NUMBER() OVER (ORDER BY c DESC, tok) AS j
        FROM df QUALIFY j <= {_SPE_K}
    ),
    nn AS (SELECT CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n FROM dt),
    pairs AS (
        SELECT a.j AS i, b.j AS j, CAST(COUNT(*) AS BIGINT) AS cij
        FROM (SELECT d.doc_id, t.j FROM dt d JOIN topk t USING (tok)) a
        JOIN (SELECT d.doc_id, t.j FROM dt d JOIN topk t USING (tok)) b
            USING (doc_id)
        GROUP BY a.j, b.j
    ),
    ppmi AS (
        SELECT p.i, p.j,
               CAST(ROUND(ROUND(ln(CAST(p.cij AS DOUBLE) * nn.n / ta.c / tb.c), 6)
                          * 1e6) AS BIGINT) AS pmi6
        FROM pairs p
        JOIN topk ta ON ta.j = p.i
        JOIN topk tb ON tb.j = p.j, nn
        WHERE ln(CAST(p.cij AS DOUBLE) * nn.n / ta.c / tb.c) > 0
    ),
    v0 AS (SELECT DISTINCT j, CAST(1000000 AS BIGINT) AS v6 FROM ppmi){ctes}
    SELECT t.tok AS token, t.c AS doc_freq, v.v6 AS loading_ppm
    FROM v{_SPE_ITERS} v JOIN topk t USING (j)
    ORDER BY token
    """


@query("q306_spectral_token_embedding", oracle=_spectral_oracle(), tags=("X-96", "X-86"))
def q306_spectral_token_embedding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-dimensional spectral token embedding: the top eigenvector of
    the PPMI (positive pointwise-mutual-information) co-occurrence
    matrix over the 30 most frequent tokens — the count-based word-
    embedding construction (PPMI + truncated spectral factorization is
    the classical equivalent of word2vec) run end-to-end in the engine:
    document-level co-occurrence counts, PPMI weighting, and the q296
    integer power iteration, composed into one certified pipeline.
    Tokens with similar company get similar loadings — the 1-D shadow
    of a trained embedding, and the q183 bigram-PMI machinery promoted
    from pair scores to a factorized representation.

    Determinism: co-occurrence counts are exact integers; each PPMI
    entry is the q291 micro-nat idiom (6-dp-rounded ln scaled to an
    exact integer — the cast cannot tie); the iteration is the X-86
    all-integer normalize (sign * (|g|*1e6 div max|g|)); loadings are
    EXACT ppm integers. PPMI > 0 filtering compares the same double in
    both engines.

    Scale shape: the doc-token relation distinct-reduces BEFORE the
    pair join; pairs are bounded by K^2 per document (K=30, broadcast
    vocabulary), and the PPMI matrix itself is a K x K bounded relation
    — the iteration never touches fact scale (the q221/q296
    rollup-then-iterate order).

    Reference parity: beyond-reference (no representation-learning
    surface in the reference)."""
    dt = (
        load(spark, sf_dir, "documents")
        .select(
            "doc_id",
            F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("tok"),
        )
        .distinct()
        .transform(stage)  # df counts + both pair legs share it
    )
    df = dt.groupBy("tok").agg(F.count(F.lit(1)).cast("long").alias("c"))
    topk = (
        df.withColumn(
            "j", F.row_number().over(Window.orderBy(F.col("c").desc(), "tok"))
        )
        .filter(F.col("j") <= _SPE_K)
        .transform(stage)
    )
    nn = dt.agg(F.countDistinct("doc_id").cast("long").alias("n"))
    leg = dt.join(F.broadcast(topk.select("tok", "j")), "tok").select("doc_id", "j")
    pairs = (
        leg.select("doc_id", F.col("j").alias("i"))
        .join(leg.select("doc_id", F.col("j")), "doc_id")
        .groupBy("i", "j")
        .agg(F.count(F.lit(1)).cast("long").alias("cij"))
    )
    lnarg = (
        F.col("cij").cast("double") * F.col("n") / F.col("c_i") / F.col("c_j")
    )
    ppmi = (
        pairs.join(
            F.broadcast(topk.select(F.col("j").alias("i"), F.col("c").alias("c_i"))),
            "i",
        )
        .join(
            F.broadcast(topk.select("j", F.col("c").alias("c_j"))),
            "j",
        )
        .crossJoin(F.broadcast(nn))
        .filter(F.log(lnarg) > 0)
        .select(
            "i",
            "j",
            F.round(F.round(F.log(lnarg), 6) * F.lit(1e6))
            .cast("long")
            .alias("pmi6"),
        )
        .transform(stage)  # all 3 iterations read the bounded matrix
    )
    v = ppmi.select("j").distinct().select("j", F.lit(10**6).cast("long").alias("v6"))
    for _ in range(_SPE_ITERS):
        g = (
            ppmi.join(v.select(F.col("j").alias("i"), "v6"), "i")
            .groupBy("j")
            .agg(
                F.sum(F.col("v6").cast("decimal(20,0)") * F.col("pmi6"))
                .cast("decimal(38,0)")
                .alias("g")
            )
        )
        mx = g.agg(F.max(F.abs(F.col("g"))).alias("mx"))
        v = g.crossJoin(F.broadcast(mx)).select(
            "j",
            (
                F.when(F.col("g") < 0, -1).otherwise(1)
                * F.expr("CAST(abs(g) * 1000000 div mx AS BIGINT)")
            ).alias("v6"),
        )
    out = v.join(F.broadcast(topk), "j").select(
        F.col("tok").alias("token"),
        F.col("c").alias("doc_freq"),
        F.col("v6").cast("long").alias("loading_ppm"),
    )
    return out.transform(pin).orderBy("token")


# ---------------------------------------------------------------------------
# X-22 extension: ordered event-pair support (sequential pattern mining)
# ---------------------------------------------------------------------------


@query(
    "q340_sequence_pair_support",
    oracle="""
    WITH ft AS (
        SELECT user_id, event_type,
               MIN(ts) AS first_ts, MAX(ts) AS last_ts
        FROM events GROUP BY user_id, event_type
    ),
    pairs AS (
        SELECT a.event_type AS type_a, b.event_type AS type_b,
               CAST(COUNT(*) AS BIGINT) AS support
        FROM ft a JOIN ft b
          ON a.user_id = b.user_id
         AND a.event_type <> b.event_type
         AND a.first_ts < b.last_ts
        GROUP BY a.event_type, b.event_type
    ),
    tot AS (SELECT COUNT(DISTINCT user_id) AS n_users FROM events)
    SELECT type_a, type_b, support,
           ROUND(CAST(support AS DOUBLE) / n_users, 6) AS share
    FROM pairs CROSS JOIN tot
    ORDER BY type_a, type_b
    """,
    tags=("X-22",),
)
def q340_sequence_pair_support(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered event-pair support (the 2-sequence core of sequential
    pattern mining, SPADE/PrefixSpan's first level): for each directed
    type pair (a -> b), the number of users with SOME a-event strictly
    before SOME b-event, and that support as a share of all users. The
    ordered counterpart of q168's unordered basket pairs and the mining
    view of q86's fixed funnel — q86 scores ONE declared path, this
    surfaces which paths have support at all (the input that decides
    what's worth a funnel).

    Semantics: "a before b" for a user <=> min_ts(a) < max_ts(b) — the
    existential pairwise-order test collapses to two timestamps per
    (user, type), so NO per-user sequence scan and no quadratic event
    pairing exists anywhere.

    Determinism: strict timestamp inequality on parquet-identical values;
    support is an exact count; the one division runs on exact integer
    operands and rounds at 6 dp.

    Scale shape: the q168 basket discipline applied to ordered pairs —
    ONE user+type-keyed map-side-combined rollup reduces the fact to
    <= |types| rows per user, one user-keyed rollup collects each user's
    BOUNDED type-stats array (<= |types| structs), and the directed pairs
    generate MAP-ONLY via a JVM higher-order transform over that array
    (fan-out <= |types|^2 per user, never event-count; no self-join
    exists anywhere — plan-asserted join-free); the support rollup lands
    on the bounded |types|(|types|-1) pair relation and the user total
    cross-broadcasts one row. The fact shuffles once; everything after
    moves <= |types| rows per user.

    Reference parity: beyond-reference; extends X-22 (q168 baskets, q183
    bigram PMI) and feeds X-08's funnel (q86) with candidate paths."""
    ev = load(spark, sf_dir, "events")
    arr = (
        ev.groupBy("user_id", "event_type")
        .agg(F.min("ts").alias("first_ts"), F.max("ts").alias("last_ts"))
        .groupBy("user_id")
        .agg(
            F.collect_list(
                F.struct("event_type", "first_ts", "last_ts")
            ).alias("tstats")  # bounded: one entry per event type
        )
    )
    pairs = (
        arr.select(
            F.explode(
                F.expr(
                    """
                    flatten(transform(tstats, a ->
                        transform(
                            filter(tstats, b -> a.event_type != b.event_type
                                               AND a.first_ts < b.last_ts),
                            b -> struct(a.event_type AS type_a,
                                        b.event_type AS type_b))))
                    """
                )
            ).alias("p")
        )
        .groupBy(F.col("p.type_a").alias("type_a"), F.col("p.type_b").alias("type_b"))
        .agg(F.count(F.lit(1)).cast("long").alias("support"))
    )
    tot = ev.agg(F.countDistinct("user_id").alias("n_users"))
    return (
        pairs.join(F.broadcast(tot))
        .select(
            "type_a",
            "type_b",
            "support",
            F.round(F.col("support").cast("double") / F.col("n_users"), 6).alias(
                "share"
            ),
        )
        .transform(pin)
        .orderBy("type_a", "type_b")
    )
