"""Corpus-level and embedding-space diagnostics (SURVEY.md §2K): shingle
novelty / boilerplate scoring (X-04 family), the cross-source shingle
contamination matrix (X-14 pipeline diagnostics), and the label-centroid
cosine matrix over the embeddings table (X-03 family) — the "how healthy
is my training corpus" reports a data pipeline runs after dedup and
before mixing.

Determinism: shingle scores are integer ratios (one final double divide);
centroids and their cosines run in QUANTIZED integer arithmetic (each
float component rounded to 1e-6 on the scan, all sums exact in int64 /
decimal(38,0)), so both engines divide bit-identical operands — no float
summation order exists anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.ordering import pin, stage
from ..operators import dedup as dd
from ..tables import load
from .registry import query

_SH_K = 3  #: shingle width (tokens), matching the X-02 dedup family

_ORACLE_SHINGLES = rf"""
    t AS (
        SELECT doc_id, source, string_split_regex(trim(text), '\s+') AS toks
        FROM documents WHERE text IS NOT NULL
    ),
    g AS (
        SELECT DISTINCT doc_id, source,
               md5(array_to_string(toks[i:(i + {_SH_K - 1})], ' ')) AS sh
        FROM t, UNNEST(range(1, len(toks) - {_SH_K} + 2)) AS u(i)
        WHERE len(toks) >= {_SH_K}
    )"""


def _doc_shingles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, source, sh): md5 of each DISTINCT 3-token shingle per doc."""
    docs = load(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    t = docs.select("doc_id", "source", dd.tokens("text").alias("toks")).filter(
        F.size("toks") >= _SH_K
    )
    return t.select(
        "doc_id",
        "source",
        F.explode(
            F.array_distinct(F.transform(dd.shingles(F.col("toks"), _SH_K), lambda x: F.md5(x)))
        ).alias("sh"),
        # both consumers (q143, q144) read this relation twice (df/sizes agg
        # + the score join); pin so the shingle explode computes once
    ).localCheckpoint(eager=False)


@query(
    "q143_shingle_novelty",
    oracle=f"""
    WITH {_ORACLE_SHINGLES},
    df AS (SELECT sh, COUNT(*) AS df FROM g GROUP BY sh)
    SELECT g.doc_id,
           COUNT(*) AS n_shingles,
           ROUND(CAST(SUM(df.df) AS DOUBLE) / COUNT(*), 6) AS mean_df,
           MAX(df.df) AS max_df,
           ROUND(CAST(COUNT(CASE WHEN df.df = 1 THEN 1 END) AS DOUBLE) / COUNT(*), 6)
               AS novelty
    FROM g JOIN df USING (sh)
    GROUP BY g.doc_id
    ORDER BY g.doc_id
    """,
    tags=("X-04",),
)
def q143_shingle_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document novelty/boilerplate score from shingle document
    frequencies: for each doc, how many distinct 3-token shingles it has,
    their mean and max corpus document-frequency, and the fraction unique
    to this doc (novelty). High mean-df documents are boilerplate
    (templates, navigation chrome) that near-dedup misses because no
    single pair crosses the similarity threshold; they are the first
    thing a corpus-quality pass downweights.

    Scale shape: shingling is map-only (one md5 per distinct shingle);
    the df table is one count-agg on the 16-byte shingle hash; the score
    join re-shuffles only (doc_id, sh_hash) pairs — document text never
    leaves the scan — and the per-doc rollup is map-side combined.
    Integer ratios with one final double divide: no float accumulation."""
    g = _doc_shingles(spark, sf_dir)
    df = g.groupBy("sh").agg(F.count(F.lit(1)).alias("df"))
    return (
        g.join(df, "sh")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.round(F.sum("df").cast("double") / F.count(F.lit(1)), 6).alias("mean_df"),
            F.max("df").alias("max_df"),
            F.round(
                F.count(F.when(F.col("df") == 1, 1)).cast("double") / F.count(F.lit(1)),
                6,
            ).alias("novelty"),
        )
        .transform(pin)
        .orderBy("doc_id")
    )


@query(
    "q144_source_overlap",
    oracle=f"""
    WITH {_ORACLE_SHINGLES},
    s AS (SELECT DISTINCT source, sh FROM g),
    sizes AS (SELECT source, COUNT(*) AS n FROM s GROUP BY source),
    shared AS (
        SELECT a.source AS src_a, b.source AS src_b, COUNT(*) AS n_shared
        FROM s a JOIN s b ON a.sh = b.sh AND a.source < b.source
        GROUP BY a.source, b.source
    )
    SELECT src_a, src_b, n_shared, sa.n AS n_a, sb.n AS n_b,
           ROUND(CAST(n_shared AS DOUBLE) / (sa.n + sb.n - n_shared), 6) AS jaccard
    FROM shared
    JOIN sizes sa ON sa.source = src_a
    JOIN sizes sb ON sb.source = src_b
    ORDER BY src_a, src_b
    """,
    tags=("X-14",),
)
def q144_source_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source contamination matrix: for every pair of corpus
    sources, the count of distinct 3-token shingles they share and the
    Jaccard similarity of their shingle sets — the mixing-time diagnostic
    that tells you two 'independent' crawl sources are actually mirrors
    BEFORE you assign them separate sampling weights (q76) or count them
    as independent evidence in dedup.

    Scale shape: the (source, shingle) relation is distinct-reduced
    FIRST (one shuffle on the 16-byte hash); the pair join then fans each
    shingle out only to the sources that contain it — with S sources a
    shingle contributes at most S(S-1)/2 pair rows, so the output is
    bounded by S² regardless of corpus size, and the per-pair counts are
    map-side combined. Source sizes broadcast back onto the S²-row
    result."""
    g = _doc_shingles(spark, sf_dir)
    # sizes + both pair-join legs read s — pin the distinct once
    s = g.select("source", "sh").distinct().localCheckpoint(eager=False)
    sizes = s.groupBy("source").agg(F.count(F.lit(1)).alias("n"))
    a = s.select(F.col("source").alias("src_a"), "sh")
    b = s.select(F.col("source").alias("src_b"), "sh")
    shared = (
        a.join(b, "sh")
        .filter(F.col("src_a") < F.col("src_b"))
        .groupBy("src_a", "src_b")
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    sa = sizes.select(F.col("source").alias("src_a"), F.col("n").alias("n_a"))
    sb = sizes.select(F.col("source").alias("src_b"), F.col("n").alias("n_b"))
    return (
        shared.join(F.broadcast(sa), "src_a")
        .join(F.broadcast(sb), "src_b")
        .select(
            "src_a",
            "src_b",
            "n_shared",
            "n_a",
            "n_b",
            F.round(
                F.col("n_shared").cast("double")
                / (F.col("n_a") + F.col("n_b") - F.col("n_shared")),
                6,
            ).alias("jaccard"),
        )
        .transform(pin)
        .orderBy("src_a", "src_b")
    )


_CQ = 10**6  #: centroid quantization: components rounded to 1e-6 on the scan


@query(
    "q145_centroid_cosine_matrix",
    oracle=f"""
    WITH flat AS (
        SELECT label,
               CAST(u.i AS INTEGER) AS pos,
               CAST(ROUND(CAST(embedding[u.i + 1] AS DOUBLE) * {_CQ}) AS BIGINT) AS qv
        FROM embeddings, UNNEST(range(0, len(embedding))) AS u(i)
    ),
    cent AS (
        SELECT label, pos, SUM(qv) AS s, COUNT(*) AS n
        FROM flat GROUP BY label, pos
    ),
    pairs AS (
        SELECT a.label AS label_a, b.label AS label_b,
               MIN(a.n) AS n_a, MIN(b.n) AS n_b,
               SUM(CAST(a.s AS DECIMAL(19,0)) * CAST(b.s AS DECIMAL(19,0))) AS dot,
               SUM(CAST(a.s AS DECIMAL(19,0)) * CAST(a.s AS DECIMAL(19,0))) AS na2,
               SUM(CAST(b.s AS DECIMAL(19,0)) * CAST(b.s AS DECIMAL(19,0))) AS nb2
        FROM cent a JOIN cent b ON a.pos = b.pos AND a.label < b.label
        GROUP BY a.label, b.label
    )
    SELECT label_a, label_b, n_a, n_b,
           ROUND(CAST(dot AS DOUBLE)
                 / sqrt(CAST(na2 AS DOUBLE) * CAST(nb2 AS DOUBLE)), 6) AS cosine
    FROM pairs ORDER BY label_a, label_b
    """,
    tags=("X-03",),
)
def q145_centroid_cosine_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise cosine similarity between per-label embedding centroids —
    the class-confusability report (labels whose centroids sit close are
    the ones a classifier will mix up, and the clusters an IVF index
    (q46b) should NOT split across cells). Components are quantized to
    1e-6 integers on the scan, so centroid sums are exact int64, the
    dot/norm accumulations are exact decimal(38,0) integer products, and
    both engines feed bit-identical operands to one final sqrt+divide —
    float summation order never exists. The un-normalized integer sums
    (s, n) stand in for the mean (s/n): cosine is scale-invariant, so
    dividing by n·1e6 cancels and is skipped entirely.

    Scale shape: one shuffle for the (label, pos) component sums
    (map-side combined, output bounded by labels x dims); the pair join
    runs over that bounded relation only — with L labels and D dims it
    is L²D/2 rows no matter how many vectors exist. Nothing about the
    raw embedding table is ever joined or re-shuffled."""
    emb = load(spark, sf_dir, "embeddings")
    flat = emb.select(
        "label", F.posexplode("embedding").alias("pos", "v")
    ).select(
        "label",
        "pos",
        F.round(F.col("v").cast("double") * _CQ).cast("long").alias("qv"),
    )
    # both pair-join legs read cent — pin the (labels x dims) agg so the
    # embeddings scan runs once
    cent = (
        flat.groupBy("label", "pos")
        .agg(F.sum("qv").alias("s"), F.count(F.lit(1)).alias("n"))
        .localCheckpoint(eager=False)
    )
    a = cent.select(
        F.col("label").alias("label_a"), "pos",
        F.col("s").alias("s_a"), F.col("n").alias("n_a_"),
    )
    b = cent.select(
        F.col("label").alias("label_b"), "pos",
        F.col("s").alias("s_b"), F.col("n").alias("n_b_"),
    )
    d19 = "decimal(19,0)"
    pairs = (
        a.join(b, "pos")
        .filter(F.col("label_a") < F.col("label_b"))
        .groupBy("label_a", "label_b")
        .agg(
            F.min("n_a_").alias("n_a"),
            F.min("n_b_").alias("n_b"),
            F.sum(F.col("s_a").cast(d19) * F.col("s_b").cast(d19)).alias("dot"),
            F.sum(F.col("s_a").cast(d19) * F.col("s_a").cast(d19)).alias("na2"),
            F.sum(F.col("s_b").cast(d19) * F.col("s_b").cast(d19)).alias("nb2"),
        )
    )
    return (
        pairs.select(
            "label_a",
            "label_b",
            "n_a",
            "n_b",
            F.round(
                F.col("dot").cast("double")
                / F.sqrt(F.col("na2").cast("double") * F.col("nb2").cast("double")),
                6,
            ).alias("cosine"),
        )
        .transform(pin)
        .orderBy("label_a", "label_b")
    )


# ---------------------------------------------------------------------------
# X-02 companion: asymmetric containment (subset/quote detection)
# ---------------------------------------------------------------------------

_CONT_THR = 0.6  #: containment threshold: >=60% of the sub-doc's shingles
_CONT_MOD = 10  #: probe subset: docs with doc_id % 10 == 0 play the screen


@query(
    "q146_containment_pairs",
    oracle=rf"""
    WITH t AS (
        SELECT doc_id,
               list_distinct([array_to_string(toks[i:i+2], ' ')
                              for i in range(1, len(toks) - 1)]) AS sh
        FROM (SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks FROM documents)
        WHERE len(toks) >= 3
    )
    SELECT s.doc_id AS doc_sub, c.doc_id AS doc_super,
           len(list_intersect(s.sh, c.sh)) AS n_common,
           len(s.sh) AS n_sub,
           ROUND(len(list_intersect(s.sh, c.sh))::DOUBLE / len(s.sh), 6)
               AS containment
    FROM t s JOIN t c ON s.doc_id <> c.doc_id
    WHERE s.doc_id % {_CONT_MOD} = 0
      AND len(list_intersect(s.sh, c.sh))::DOUBLE / len(s.sh) >= {_CONT_THR}
    ORDER BY doc_sub, doc_super
    """,
    tags=("X-02",),
)
def q146_containment_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ASYMMETRIC near-duplicate detection: shingle containment
    C(sub→super) = |sh(sub) ∩ sh(super)| / |sh(sub)| from a probe subset
    (doc_id % 10 == 0) against the whole corpus. Jaccard (q43) misses the
    quote/subset case — a short doc fully embedded in a long one scores
    low Jaccard but containment ≈ 1 — and containment is exactly how
    boilerplate extraction and quote-chain dedup decide which side to
    drop (the contained doc adds nothing).

    Scale shape: identical inverted-index posting join as q43 — probes
    explode to (16-byte hash, id) postings and equi-join the corpus
    postings, so |A∩B| arrives from a codegen'd shuffle join + count and
    zero-overlap pairs never materialize; the denominator is the probe's
    own set size carried on the posting row. Direction costs nothing
    extra: containment divides by the probe size instead of the union."""
    docs = load(spark, sf_dir, "documents")
    base = dd.shingle_hashes_batched(docs, "doc_id", "text", 3, "jac").localCheckpoint(
        eager=False
    )
    probes = base.filter(F.col("doc_id") % _CONT_MOD == 0)
    post_s = probes.select(
        F.col("doc_id").alias("doc_sub"),
        F.col("sz").alias("n_sub"),
        F.explode("hs").alias("h"),
    )
    post_c = base.select(F.col("doc_id").alias("doc_super"), F.explode("hs").alias("h"))
    return (
        post_s.join(post_c, "h")
        .filter(F.col("doc_sub") != F.col("doc_super"))
        .groupBy("doc_sub", "doc_super", "n_sub")
        .agg(F.count(F.lit(1)).alias("n_common"))
        .withColumn(
            "containment",
            F.round(F.col("n_common").cast("double") / F.col("n_sub"), 6),
        )
        .filter(F.col("n_common").cast("double") / F.col("n_sub") >= _CONT_THR)
        .select("doc_sub", "doc_super", "n_common", "n_sub", "containment")
        .transform(pin)
        .orderBy("doc_sub", "doc_super")
    )


# ---------------------------------------------------------------------------
# X-16 companion: sqrt-smoothed corpus mixing plan
# ---------------------------------------------------------------------------

_MIX_BUDGET_NUM, _MIX_BUDGET_DEN = 1, 2  #: token budget = 1/2 of the corpus
_MIX_Q = 10**9  #: sqrt shares quantized to 1e-9 before summing


@query(
    "q147_mixing_plan",
    oracle=f"""
    WITH per_src AS (
        SELECT source, COUNT(*) AS n_docs,
               CAST(SUM(len(string_split_regex(trim(text), '\\s+'))) AS BIGINT) AS n_tokens
        FROM documents WHERE text IS NOT NULL
        GROUP BY source
    ),
    tot AS (SELECT CAST(SUM(n_tokens) AS BIGINT) AS total FROM per_src),
    q AS (
        SELECT source, n_docs, n_tokens,
               CAST(ROUND(sqrt(CAST(n_tokens AS DOUBLE) / tot.total) * {_MIX_Q})
                    AS BIGINT) AS qs,
               tot.total AS total
        FROM per_src, tot
    ),
    qq AS (SELECT CAST(SUM(qs) AS BIGINT) AS qsum FROM q)
    SELECT source, n_docs, n_tokens,
           ROUND(CAST(n_tokens AS DOUBLE) / total, 6) AS token_share,
           ROUND(CAST(qs AS DOUBLE) / qq.qsum, 6) AS target_share,
           ROUND((CAST(qs AS DOUBLE) / qq.qsum)
                 * (CAST(total AS DOUBLE) * {_MIX_BUDGET_NUM} / {_MIX_BUDGET_DEN})
                 / n_tokens, 6) AS epochs
    FROM q, qq
    ORDER BY source
    """,
    tags=("X-16",),
)
def q147_mixing_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sqrt-smoothed corpus mixing plan: per-source token counts, raw
    token share, the sqrt-rebalanced target share (w_i ∝ sqrt(p_i) — the
    standard multilingual/multi-source smoothing that upweights small
    sources without letting any source dominate), and the resulting
    epochs factor against a half-corpus token budget (epochs > 1 means
    that source is upsampled / repeated). This is the table a pretraining
    run's sampler is configured from.

    Scale shape: token counting is map-only into one groupBy on the
    bounded source key; everything after operates on the S-row relation
    with two 1-row scalar cross-joins (both broadcast). The only doubles
    are sqrt and the final divisions — sqrt shares are quantized to 1e-9
    integers BEFORE summing, so the normalization constant is an exact
    integer in both engines and no float accumulation exists."""
    docs = load(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    # the S-row agg feeds both the total and the share computation — pin it
    # so the corpus tokenization scan runs once
    per_src = (
        docs.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.size(dd.tokens("text"))).alias("n_tokens"),
        )
        .localCheckpoint(eager=False)
    )
    tot = per_src.agg(F.sum("n_tokens").alias("total"))
    q = per_src.crossJoin(F.broadcast(tot)).withColumn(
        "qs",
        F.round(
            F.sqrt(F.col("n_tokens").cast("double") / F.col("total")) * _MIX_Q
        ).cast("long"),
    ).localCheckpoint(eager=False)
    qq = q.agg(F.sum("qs").alias("qsum"))
    budget = F.col("total").cast("double") * _MIX_BUDGET_NUM / _MIX_BUDGET_DEN
    return (
        q.crossJoin(F.broadcast(qq))
        .select(
            "source",
            "n_docs",
            "n_tokens",
            F.round(F.col("n_tokens").cast("double") / F.col("total"), 6).alias(
                "token_share"
            ),
            F.round(F.col("qs").cast("double") / F.col("qsum"), 6).alias("target_share"),
            F.round(
                (F.col("qs").cast("double") / F.col("qsum")) * budget / F.col("n_tokens"),
                6,
            ).alias("epochs"),
        )
        .transform(pin)
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# X-04 (cont.): trigram-index substring search (the pg_trgm pattern)
# ---------------------------------------------------------------------------

_TRGM_NEEDLE = "the data"  #: benchmark literal needle (spans a token boundary)


def _trgm_oracle() -> str:
    needle = _TRGM_NEEDLE
    grams = sorted({needle[i : i + 3] for i in range(len(needle) - 2)})
    gram_list = ", ".join("'" + g.replace("'", "''") + "'" for g in grams)
    return f"""
    WITH grams AS (
        SELECT d.doc_id, g.g
        FROM documents d
        CROSS JOIN (SELECT unnest([{gram_list}]) AS g) g
        WHERE instr(lower(d.text), g.g) > 0
    ),
    cand AS (
        SELECT doc_id FROM grams GROUP BY doc_id HAVING COUNT(*) = {len(grams)}
    ),
    verified AS (
        SELECT c.doc_id,
               CASE WHEN instr(lower(d.text), '{needle}') > 0 THEN 1 ELSE 0 END AS hit
        FROM cand c JOIN documents d ON d.doc_id = c.doc_id
    ),
    tot AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_candidates,
               CAST(SUM(hit) AS BIGINT) AS n_matches
        FROM verified
    )
    SELECT v.doc_id, t.n_candidates, t.n_matches
    FROM verified v CROSS JOIN tot t
    WHERE v.hit = 1
    ORDER BY v.doc_id
    """


@query("q236_trigram_search", oracle=_trgm_oracle(), tags=("X-04", "J-05"))
def q236_trigram_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Substring search through a TRIGRAM pre-filter (the pg_trgm /
    search-index pattern): a doc can contain the needle only if it
    contains every trigram of the needle, so candidates come from cheap
    trigram membership and the exact (expensive at scale) substring
    verify runs on candidates only. Reports the matched docs plus the
    candidate/match counts — the selectivity readout that says what the
    index bought. The necessary-condition containment makes the filter
    LOSSLESS (zero false negatives by construction; the oracle verifies
    candidates exactly).

    Scale shape: at 100 TB the per-(doc, gram) relation is the posting
    LIST (built once, reused per query) and candidates come from a
    postings intersection keyed by gram; here the bounded needle-gram
    set (6 literals) turns membership into map-only instr tests — no
    join, no explode of the corpus, one rollup per doc over <=6 rows,
    the exact verify map-only on survivors, counts broadcast back."""
    needle = _TRGM_NEEDLE
    grams = sorted({needle[i : i + 3] for i in range(len(needle) - 2)})
    docs = load(spark, sf_dir, "documents").select(
        "doc_id", F.lower(F.col("text")).alias("t")
    )
    n_present = None
    for g in grams:
        hit = (F.instr(F.col("t"), g) > 0).cast("int")
        n_present = hit if n_present is None else n_present + hit
    cand = docs.withColumn("ng", n_present).filter(F.col("ng") == len(grams))
    verified = cand.select(
        "doc_id", (F.instr(F.col("t"), needle) > 0).cast("int").alias("hit")
    ).transform(stage)  # feeds the counts AND the match list
    tot = verified.agg(
        F.count(F.lit(1)).cast("long").alias("n_candidates"),
        F.sum("hit").cast("long").alias("n_matches"),
    )
    return (
        verified.filter(F.col("hit") == 1)
        .crossJoin(F.broadcast(tot))
        .select("doc_id", "n_candidates", "n_matches")
        .transform(pin)
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# X-74: Heaps'-law vocabulary growth curve (+ fitted exponent)
# ---------------------------------------------------------------------------

_HEAPS_POINTS = 10  #: decile checkpoints over the corpus prefix


def _heaps_oracle() -> str:
    return f"""
    WITH ranked AS (
        SELECT doc_id,
               ROW_NUMBER() OVER (ORDER BY doc_id) AS rk,
               len(string_split_regex(trim(text), '\\s+')) AS n_tok
        FROM documents
    ),
    nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM ranked),
    cps AS (
        SELECT CAST(u.i AS BIGINT) AS cp,
               CAST(CEIL(n * u.i / {_HEAPS_POINTS}.0) AS BIGINT) AS rk_c
        FROM nn, UNNEST(range(1, {_HEAPS_POINTS} + 1)) AS u(i)
    ),
    flat AS (
        SELECT r.rk, t.token
        FROM (SELECT rk, UNNEST(string_split_regex(trim(text), '\\s+')) AS token
              FROM ranked r2 JOIN documents USING (doc_id)
              ) AS t(rk, token)
        JOIN ranked r ON r.rk = t.rk
    ),
    firsts AS (SELECT token, MIN(rk) AS first_rk FROM flat GROUP BY token),
    pts AS (
        SELECT cp, rk_c,
               (SELECT CAST(SUM(n_tok) AS BIGINT) FROM ranked
                WHERE rk <= rk_c) AS n_tokens,
               (SELECT CAST(COUNT(*) AS BIGINT) FROM firsts
                WHERE first_rk <= rk_c) AS vocab
        FROM cps
    ),
    obs AS (
        SELECT cp, rk_c AS n_docs, n_tokens, vocab,
               CAST(ROUND(ln(n_tokens), 6) AS DECIMAL(16,6)) AS x,
               CAST(ROUND(ln(vocab), 6) AS DECIMAL(16,6)) AS y
        FROM pts
    ),
    m AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS k,
               CAST(SUM(x) AS DECIMAL(28,6)) AS sx,
               CAST(SUM(y) AS DECIMAL(28,6)) AS sy,
               CAST(SUM(x * y) AS DECIMAL(38,12)) AS sxy,
               CAST(SUM(x * x) AS DECIMAL(38,12)) AS sxx
        FROM obs
    )
    SELECT cp, n_docs, n_tokens, vocab,
           ROUND((k * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * sy)
                 / (k * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * sx), 6)
               AS heaps_beta
    FROM obs CROSS JOIN m
    ORDER BY cp
    """


@query("q270_heaps_law", oracle=_heaps_oracle(), tags=("X-74", "X-04", "X-31"))
def q270_heaps_law(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heaps'-law vocabulary growth: cumulative token count and distinct
    vocabulary size at {_HEAPS_POINTS} corpus-prefix checkpoints (docs in
    doc_id order), plus the fitted Heaps exponent beta from log-log OLS
    over the checkpoints (V = K * N^beta, typically 0.4-0.6 for natural
    text) — the corpus-health curve that tells a tokenizer-training run
    how fast new types keep appearing (dedup failures and synthetic text
    bend beta away from the natural band; q81's vocabulary is the
    endpoint of exactly this curve).

    Determinism: vocabulary-at-checkpoint counts tokens by their integer
    first-occurrence rank (MIN over exact ranks), token totals are exact
    integers, and the OLS moments use the 6-dp-rounded-ln decimal idiom
    (q256), so the slope divides bit-identical operands.

    Scale shape: one corpus scan explodes tokens into a (token, rank)
    relation reduced map-side to per-token first ranks (ONE token-keyed
    shuffle — the q81 vocabulary shape); per-doc token counts reduce to
    the bounded checkpoint grid via a {_HEAPS_POINTS}-row broadcast
    threshold join; the OLS runs on {_HEAPS_POINTS} rows."""
    from pyspark.sql.window import Window as Wd

    docs = load(spark, sf_dir, "documents").select(
        "doc_id",
        F.row_number().over(Wd.orderBy("doc_id")).alias("rk"),
        F.size(dd.tokens("text")).cast("long").alias("n_tok"),
        dd.tokens("text").alias("toks"),
    ).transform(stage)  # checkpoint grid, firsts, and totals read it
    nn = docs.agg(F.count(F.lit(1)).cast("long").alias("n"))
    cps = (
        spark.range(1, _HEAPS_POINTS + 1)
        .select(F.col("id").cast("long").alias("cp"))
        .crossJoin(F.broadcast(nn))
        .select(
            "cp",
            F.ceil(F.col("n") * F.col("cp") / F.lit(float(_HEAPS_POINTS)))
            .cast("long")
            .alias("rk_c"),
        )
    )
    firsts = (
        docs.select("rk", F.explode("toks").alias("token"))
        .groupBy("token")
        .agg(F.min("rk").alias("first_rk"))
    )
    vocab_at = (
        firsts.crossJoin(F.broadcast(cps))
        .filter(F.col("first_rk") <= F.col("rk_c"))
        .groupBy("cp", "rk_c")
        .agg(F.count(F.lit(1)).cast("long").alias("vocab"))
    )
    tokens_at = (
        docs.select("rk", "n_tok")
        .crossJoin(F.broadcast(cps))
        .filter(F.col("rk") <= F.col("rk_c"))
        .groupBy("cp")
        .agg(F.sum("n_tok").cast("long").alias("n_tokens"))
    )
    obs = (
        vocab_at.join(tokens_at, "cp")
        .select(
            "cp",
            F.col("rk_c").alias("n_docs"),
            "n_tokens",
            "vocab",
            F.round(F.log("n_tokens"), 6).cast("decimal(16,6)").alias("x"),
            F.round(F.log("vocab"), 6).cast("decimal(16,6)").alias("y"),
        )
        .transform(stage)  # the OLS aggregate and the readout both scan it
    )
    m = obs.agg(
        F.count(F.lit(1)).cast("long").alias("k"),
        F.sum("x").cast("decimal(28,6)").alias("sx"),
        F.sum("y").cast("decimal(28,6)").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("decimal(38,12)").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("decimal(38,12)").alias("sxx"),
    )
    beta = F.round(
        (
            F.col("k") * F.col("sxy").cast("double")
            - F.col("sx").cast("double") * F.col("sy")
        )
        / (
            F.col("k") * F.col("sxx").cast("double")
            - F.col("sx").cast("double") * F.col("sx")
        ),
        6,
    )
    return (
        obs.crossJoin(F.broadcast(m))
        .select("cp", "n_docs", "n_tokens", "vocab", beta.alias("heaps_beta"))
        .transform(pin)
        .orderBy("cp")
    )


# ---------------------------------------------------------------------------
# X-74 (cont.): Zipf's-law frequency-rank fit over the vocabulary
# ---------------------------------------------------------------------------

_ZIPF_TOP = 1000  #: fit over the top-N vocabulary (the q81 vocab bound)


def _zipf_oracle() -> str:
    return f"""
    WITH flat AS (
        SELECT UNNEST(string_split_regex(trim(text), '\\s+')) AS token
        FROM documents
    ),
    freq AS (SELECT token, CAST(COUNT(*) AS BIGINT) AS tf FROM flat GROUP BY token),
    ranked AS (
        SELECT token, tf,
               CAST(ROW_NUMBER() OVER (ORDER BY tf DESC, token) AS BIGINT) AS rnk
        FROM freq
    ),
    obs AS (
        SELECT rnk, tf,
               CAST(ROUND(ln(rnk), 6) AS DECIMAL(16,6)) AS x,
               CAST(ROUND(ln(tf), 6) AS DECIMAL(16,6)) AS y
        FROM ranked WHERE rnk <= {_ZIPF_TOP}
    ),
    m AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS k,
               CAST(SUM(x) AS DECIMAL(28,6)) AS sx,
               CAST(SUM(y) AS DECIMAL(28,6)) AS sy,
               CAST(SUM(x * y) AS DECIMAL(38,12)) AS sxy,
               CAST(SUM(x * x) AS DECIMAL(38,12)) AS sxx,
               CAST(SUM(y * y) AS DECIMAL(38,12)) AS syy
        FROM obs
    )
    SELECT k AS n_types,
           (SELECT MAX(tf) FROM obs) AS top_tf,
           ROUND((k * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * sy)
                 / (k * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * sx), 6)
               AS zipf_slope,
           ROUND((k * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * sy)
                 * (k * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * sy)
                 / ((k * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * sx)
                    * (k * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * sy)), 6)
               AS r_squared
    FROM m
    """


@query("q274_zipf_law", oracle=_zipf_oracle(), tags=("X-74", "X-04", "X-31"))
def q274_zipf_law(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf's-law fit over the corpus vocabulary: OLS slope of ln(term
    frequency) on ln(frequency rank) across the top {_ZIPF_TOP} types
    (natural text sits near -1; r² says how power-law-like the corpus
    is) — the frequency-decay companion of q270's Heaps growth curve,
    and the second corpus-law gauge that flags templated/synthetic text
    (which flattens the slope) before it poisons tokenizer training.

    Determinism: term frequencies and ranks are exact integers under the
    (tf DESC, token) total order; both lns enter the moments rounded at
    6 dp as decimals (the q256 idiom), so slope and r² divide
    bit-identical operands, rounded 6 dp.

    Scale shape: one corpus explode + ONE token-keyed rollup (the q81
    vocabulary shape); the rank window is a single sort of the BOUNDED
    top of the vocabulary (TakeOrdered-sized, never the corpus), and the
    OLS is one aggregate over {_ZIPF_TOP} rows; single row out."""
    from pyspark.sql.window import Window as Wd

    flat = load(spark, sf_dir, "documents").select(
        F.explode(dd.tokens("text")).alias("token")
    )
    freq = flat.groupBy("token").agg(F.count(F.lit(1)).cast("long").alias("tf"))
    ranked = freq.withColumn(
        "rnk", F.row_number().over(Wd.orderBy(F.desc("tf"), F.asc("token"))).cast("long")
    ).filter(F.col("rnk") <= _ZIPF_TOP)
    obs = ranked.select(
        "rnk",
        "tf",
        F.round(F.log("rnk"), 6).cast("decimal(16,6)").alias("x"),
        F.round(F.log("tf"), 6).cast("decimal(16,6)").alias("y"),
    ).transform(stage)  # the moment aggregate and top_tf both read it
    m = obs.agg(
        F.count(F.lit(1)).cast("long").alias("k"),
        F.max("tf").alias("top_tf"),
        F.sum("x").cast("decimal(28,6)").alias("sx"),
        F.sum("y").cast("decimal(28,6)").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("decimal(38,12)").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("decimal(38,12)").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast("decimal(38,12)").alias("syy"),
    )
    num = F.col("k") * F.col("sxy").cast("double") - F.col("sx").cast("double") * F.col(
        "sy"
    )
    den_x = F.col("k") * F.col("sxx").cast("double") - F.col("sx").cast(
        "double"
    ) * F.col("sx")
    den_y = F.col("k") * F.col("syy").cast("double") - F.col("sy").cast(
        "double"
    ) * F.col("sy")
    return m.select(
        F.col("k").alias("n_types"),
        "top_tf",
        F.round(num / den_x, 6).alias("zipf_slope"),
        F.round(num * num / (den_x * den_y), 6).alias("r_squared"),
    )


# ---------------------------------------------------------------------------
# X-04 (cont.): lexical-complexity profile per source
# ---------------------------------------------------------------------------

_LEX_ORACLE = """
    WITH toks AS (
        SELECT source,
               UNNEST(string_split_regex(trim(text), '\\s+')) AS token
        FROM documents
    ),
    feat AS (
        SELECT source, token,
               CAST(len(regexp_extract_all(token, '[aeiouy]+')) AS BIGINT) AS syl,
               CAST(length(token) AS BIGINT) AS chars
        FROM toks
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_tokens,
           CAST(COUNT(DISTINCT token) AS BIGINT) AS n_types,
           ROUND(CAST(SUM(syl) AS DOUBLE) / COUNT(*), 6) AS syllables_per_word,
           ROUND(CAST(SUM(CASE WHEN syl >= 3 THEN 1 ELSE 0 END) AS DOUBLE)
                 / COUNT(*), 6) AS complex_word_ratio,
           ROUND(CAST(SUM(chars) AS DOUBLE) / COUNT(*), 6) AS chars_per_word,
           ROUND(CAST(COUNT(DISTINCT token) AS DOUBLE) / COUNT(*), 6)
               AS type_token_ratio
    FROM feat GROUP BY source ORDER BY source
"""


@query("q277_lexical_complexity", oracle=_LEX_ORACLE, tags=("X-04", "A-04"))
def q277_lexical_complexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lexical-complexity profile per source: syllables per word (vowel-
    group runs — the Flesch syllable heuristic), complex-word ratio
    (3+ syllable groups), mean word length, and type-token ratio — the
    readability-adjacent quality features that q48's length/stopword
    stats miss, and the per-source report that flags a source whose text
    is template-simple (low TTR) or jargon-heavy (high complex ratio)
    before it skews a training mix.

    Determinism: syllable, char, and type counts are exact integers from
    identical regexes in both engines; every ratio is one IEEE division
    rounded 6 dp.

    Scale shape: one corpus explode feeding a source-keyed rollup
    (map-side combined; the distinct-token count is the A-04 expand on
    the same key) — bounded |sources| rows out."""
    feat = load(spark, sf_dir, "documents").select(
        "source", F.explode(dd.tokens("text")).alias("token")
    ).select(
        "source",
        "token",
        F.regexp_count(F.col("token"), F.lit("[aeiouy]+")).cast("long").alias("syl"),
        F.length("token").cast("long").alias("chars"),
    )
    cnt = F.count(F.lit(1))
    return (
        feat.groupBy("source")
        .agg(
            cnt.cast("long").alias("n_tokens"),
            F.count_distinct("token").cast("long").alias("n_types"),
            F.round(F.sum("syl").cast("double") / cnt, 6).alias("syllables_per_word"),
            F.round(
                F.sum(F.when(F.col("syl") >= 3, 1).otherwise(0)).cast("double") / cnt,
                6,
            ).alias("complex_word_ratio"),
            F.round(F.sum("chars").cast("double") / cnt, 6).alias("chars_per_word"),
            F.round(F.count_distinct("token").cast("double") / cnt, 6).alias(
                "type_token_ratio"
            ),
        )
        .transform(pin)
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# X-95: cross-source quantile normalization of document lengths
# ---------------------------------------------------------------------------

_QN_BUCKET = 500  #: n_chars bucket width for the pooled two-level prefix


_QN_ORACLE = """
    WITH srcn AS (
        SELECT source, CAST(COUNT(*) AS BIGINT) AS n_s FROM documents GROUP BY 1
    ),
    nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM documents),
    spec AS (
        SELECT s.source, j.j, s.n_s,
               (j.j * s.n_s + 9) // 10 AS r,
               ((j.j * s.n_s + 9) // 10 * nn.n + s.n_s - 1) // s.n_s AS k
        FROM srcn s
        CROSS JOIN (SELECT unnest(range(1, 10)) AS j) j, nn
    ),
    ranked AS (
        SELECT source, n_chars,
               ROW_NUMBER() OVER (PARTITION BY source
                                  ORDER BY n_chars, doc_id) AS rn
        FROM documents
    ),
    va AS (
        SELECT n_chars, CAST(COUNT(*) AS BIGINT) AS cnt
        FROM documents GROUP BY n_chars
    ),
    cum AS (
        SELECT n_chars, CAST(SUM(cnt) OVER (ORDER BY n_chars) AS BIGINT) AS c
        FROM va
    ),
    mapped AS (
        SELECT sp.source, sp.j,
               CAST(MIN(CASE WHEN c.c >= sp.k THEN c.n_chars END) AS BIGINT)
                   AS mapped_chars
        FROM spec sp, cum c
        GROUP BY sp.source, sp.j
    )
    SELECT sp.source, sp.j AS decile,
           CAST(r.n_chars AS BIGINT) AS source_chars,
           m.mapped_chars
    FROM spec sp
    JOIN ranked r ON r.source = sp.source AND r.rn = sp.r
    JOIN mapped m ON m.source = sp.source AND m.j = sp.j
    ORDER BY sp.source, sp.j
"""


@query("q305_quantile_normalization", oracle=_QN_ORACLE, tags=("X-95", "A-12"))
def q305_quantile_normalization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source quantile normalization of document lengths: for each
    source's deciles, the pooled-corpus length at the SAME relative rank
    — the mapping that projects every source's length distribution onto
    the pooled one (the batch-effect remover from genomics, applied to
    the corpus-mixing problem: q147 balances source token BUDGETS, this
    normalizes source SHAPES so a length-biased source stops skewing
    curriculum or packing decisions). Reading source_chars against
    mapped_chars per decile IS the per-source QQ-plot against the pool.

    Determinism: within-source decile ranks r = ceil(j*n_s/10) and the
    pooled target ranks k = ceil(r*N/n_s) are exact integer ceil
    divisions; source order statistics select by (n_chars, doc_id)
    row_number, pooled ones by 'min value whose cumulative count
    reaches k' — every output column is an exact integer.

    Scale shape: within-source ranking is a source-keyed window (never
    ungrouped); the pooled CDF is the q302/q148 two-level bucketed
    prefix sum; the decile spec is a bounded |sources| x 9 relation that
    broadcasts into both lookups.

    Reference parity: beyond-reference; completes the X-16/X-07 corpus-
    assembly family with distribution alignment."""
    docs = load(spark, sf_dir, "documents").select("doc_id", "source", "n_chars")
    docs = docs.transform(stage)  # ranking, counts, and the pooled CDF share it
    from pyspark.sql.window import Window as W

    srcn = docs.groupBy("source").agg(F.count(F.lit(1)).cast("long").alias("n_s"))
    nn = docs.agg(F.count(F.lit(1)).cast("long").alias("n"))
    spec = (
        srcn.crossJoin(F.broadcast(nn))
        .select(
            "source",
            "n_s",
            "n",
            F.explode(F.sequence(F.lit(1), F.lit(9))).alias("j"),
        )
        .select(
            "source",
            "j",
            F.expr("(j * n_s + 9) div 10").alias("r"),
            F.expr("((j * n_s + 9) div 10 * n + n_s - 1) div n_s").alias("k"),
        )
    )
    ranked = docs.select(
        "source",
        "n_chars",
        F.row_number()
        .over(W.partitionBy("source").orderBy("n_chars", "doc_id"))
        .alias("rn"),
    )
    va = (
        docs.groupBy("n_chars")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
        .withColumn("bucket", F.floor(F.col("n_chars") / _QN_BUCKET))
        .transform(stage)
    )
    wb = (
        W.partitionBy("bucket")
        .orderBy("n_chars")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    within = va.select("bucket", "n_chars", F.sum("cnt").over(wb).alias("wc"))
    offs = (
        va.groupBy("bucket")
        .agg(F.sum("cnt").alias("bc"))
        .select(
            "bucket",
            F.sum("bc")
            .over(W.orderBy("bucket").rowsBetween(W.unboundedPreceding, -1))
            .alias("off"),
        )
    )
    cum = within.join(F.broadcast(offs), "bucket").select(
        "n_chars",
        (F.coalesce("off", F.lit(0)) + F.col("wc")).cast("long").alias("c"),
    )
    mapped = (
        cum.crossJoin(F.broadcast(spec))
        .filter(F.col("c") >= F.col("k"))
        .groupBy("source", "j")
        .agg(F.min("n_chars").cast("long").alias("mapped_chars"))
    )
    out = (
        spec.join(
            ranked,
            (ranked["source"] == spec["source"]) & (ranked["rn"] == spec["r"]),
        )
        .select(
            spec["source"],
            "j",
            F.col("n_chars").cast("long").alias("source_chars"),
        )
        .join(mapped, ["source", "j"])
        .select(
            "source",
            F.col("j").alias("decile"),
            "source_chars",
            "mapped_chars",
        )
    )
    return out.transform(pin).orderBy("source", "decile")


# ---------------------------------------------------------------------------
# X-106: extractive summarization (IDF-scored sentence top-k)
# ---------------------------------------------------------------------------

_SUM_PROBE_MOD = 25  #: probe docs: doc_id % this == 0
_SUM_TOPK = 2

_SUM_ORACLE = rf"""
    WITH dt AS (
        SELECT DISTINCT doc_id, tok
        FROM (SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS tok
              FROM documents)
    ),
    nn AS (SELECT CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n FROM dt),
    idf AS (
        SELECT tok,
               CAST(ROUND(ROUND(ln(CAST(nn.n AS DOUBLE) / COUNT(*)), 6) * 1e6)
                    AS BIGINT) AS idf6
        FROM dt, nn GROUP BY tok, nn.n
    ),
    sents AS (
        SELECT doc_id, pos, trim(sent) AS sent
        FROM (
            SELECT doc_id,
                   generate_subscripts(string_split(text, '.'), 1) AS pos,
                   unnest(string_split(text, '.')) AS sent
            FROM documents WHERE doc_id % {_SUM_PROBE_MOD} = 0
        )
        WHERE length(trim(sent)) > 0
    ),
    sw AS (
        SELECT DISTINCT doc_id, pos, tok
        FROM (SELECT doc_id, pos,
                     unnest(string_split_regex(trim(sent), '\s+')) AS tok
              FROM sents)
        WHERE length(tok) > 0
    ),
    scored AS (
        SELECT s.doc_id, s.pos,
               CAST(CAST(SUM(i.idf6) AS HUGEINT) // COUNT(*) AS BIGINT)
                   AS score6
        FROM sw s JOIN idf i USING (tok)
        GROUP BY s.doc_id, s.pos
    ),
    ranked AS (
        SELECT sc.doc_id, sc.pos, sc.score6, se.sent,
               ROW_NUMBER() OVER (PARTITION BY sc.doc_id
                                  ORDER BY sc.score6 DESC, sc.pos) AS rk
        FROM scored sc JOIN sents se ON se.doc_id = sc.doc_id AND se.pos = sc.pos
    )
    SELECT doc_id, rk AS rank, pos AS sentence_pos, score6 AS score_micro,
           substr(sent, 1, 60) AS sentence_head
    FROM ranked WHERE rk <= {_SUM_TOPK}
    ORDER BY doc_id, rank
"""


@query("q316_extractive_summary", oracle=_SUM_ORACLE, tags=("X-106", "X-04"))
def q316_extractive_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extractive summarization: for each probe document, the top-2
    sentences by mean corpus IDF of their distinct words — the
    classical centroid-free summarizer (a sentence full of rare,
    document-specific terms carries the document's information; one
    full of stopwords does not), and the selection step of every
    retrieve-then-summarize pipeline, built from X-04's term-weighting
    machinery promoted from salient TERMS (q74) to salient SENTENCES.

    Determinism: IDF values are q291 micro-nat integers (pinned 6-dp
    ln scaled to exact ints); sentence scores are exact integer
    floor-divided means; ranking is a (score DESC, position) total
    order; sentence text enters the hash through an identical
    substr(1, 60) in both engines.

    Scale shape: the IDF table is one distinct-reduced rollup of the
    full corpus; sentence explode/score runs only on the bounded probe
    set; the per-doc top-2 is the O-05 grouped-top-k plan.

    Reference parity: beyond-reference (the reference has no
    summarization surface)."""
    from pyspark.sql.window import Window as W

    docs = load(spark, sf_dir, "documents")
    dt = (
        docs.select(
            "doc_id",
            F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("tok"),
        )
        .distinct()
        .transform(stage)
    )
    nn = dt.agg(F.countDistinct("doc_id").cast("long").alias("n"))
    idf = (
        dt.groupBy("tok")
        .agg(F.count(F.lit(1)).cast("long").alias("df"))
        .crossJoin(F.broadcast(nn))
        .select(
            "tok",
            F.round(
                F.round(F.log(F.col("n").cast("double") / F.col("df")), 6)
                * F.lit(1e6)
            )
            .cast("long")
            .alias("idf6"),
        )
    )
    sents = (
        docs.filter(F.col("doc_id") % _SUM_PROBE_MOD == 0)
        .select(
            "doc_id",
            F.posexplode(F.split(F.col("text"), r"\.")).alias("pos0", "sent"),
        )
        .select(
            "doc_id",
            (F.col("pos0") + 1).alias("pos"),
            F.trim(F.col("sent")).alias("sent"),
        )
        .filter(F.length(F.col("sent")) > 0)
        .transform(stage)  # word explode + the rank join share it
    )
    sw = (
        sents.select(
            "doc_id",
            "pos",
            F.explode(F.split(F.trim(F.col("sent")), r"\s+")).alias("tok"),
        )
        .filter(F.length("tok") > 0)
        .distinct()
    )
    scored = (
        sw.join(idf, "tok")
        .groupBy("doc_id", "pos")
        .agg(
            F.expr(
                "CAST(CAST(SUM(idf6) AS DECIMAL(38,0)) div COUNT(*) AS BIGINT)"
            ).alias("score6")
        )
    )
    ranked = (
        scored.join(sents, ["doc_id", "pos"])
        .withColumn(
            "rk",
            F.row_number().over(
                W.partitionBy("doc_id").orderBy(F.col("score6").desc(), "pos")
            ),
        )
        .filter(F.col("rk") <= _SUM_TOPK)
    )
    return (
        ranked.select(
            "doc_id",
            F.col("rk").cast("long").alias("rank"),
            F.col("pos").cast("long").alias("sentence_pos"),
            F.col("score6").alias("score_micro"),
            F.substring(F.col("sent"), 1, 60).alias("sentence_head"),
        )
        .transform(pin)
        .orderBy("doc_id", "rank")
    )


# ---------------------------------------------------------------------------
# X-120: near-dup threshold advisor (dedup cost-benefit curve)
# ---------------------------------------------------------------------------

_NT_THRESH = (500000, 600000, 700000, 800000, 900000)  #: micro-Jaccard cuts

_NT_ORACLE = rf"""
    WITH t AS (
        SELECT doc_id,
               list_distinct([array_to_string(toks[i:i+2], ' ')
                              for i in range(1, len(toks) - 1)]) AS sh,
               len(toks) AS n_toks
        FROM (SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks
              FROM documents)
        WHERE len(toks) >= 3
    ),
    post AS (
        SELECT doc_id, len(sh) AS sz, n_toks, unnest(sh) AS s FROM t
    ),
    pairs AS (
        SELECT a.doc_id AS da, b.doc_id AS db, MIN(b.n_toks) AS toks_b,
               CAST(COUNT(*) * 1000000
                    // (MIN(a.sz) + MIN(b.sz) - COUNT(*)) AS BIGINT) AS jm
        FROM post a JOIN post b ON a.s = b.s AND a.doc_id < b.doc_id
        GROUP BY a.doc_id, b.doc_id
    ),
    cand AS (SELECT unnest([{", ".join(str(x) for x in _NT_THRESH)}]) AS thr),
    per AS (
        SELECT c.thr,
               CAST(COUNT(CASE WHEN p.jm >= c.thr THEN 1 END) AS BIGINT)
                   AS n_pairs,
               CAST(COUNT(DISTINCT CASE WHEN p.jm >= c.thr THEN p.db END)
                    AS BIGINT) AS n_docs_removed
        FROM cand c CROSS JOIN pairs p
        GROUP BY c.thr
    ),
    toks AS (
        SELECT c.thr, CAST(COALESCE(SUM(x.n_toks), 0) AS BIGINT) AS tokens_saved
        FROM cand c
        LEFT JOIN (
            SELECT DISTINCT c2.thr AS thr2, p.db, p.toks_b AS n_toks
            FROM cand c2 CROSS JOIN pairs p WHERE p.jm >= c2.thr
        ) x ON x.thr2 = c.thr
        GROUP BY c.thr
    )
    SELECT p.thr AS jaccard_micro_threshold, p.n_pairs, p.n_docs_removed,
           k.tokens_saved
    FROM per p JOIN toks k ON k.thr = p.thr
    ORDER BY jaccard_micro_threshold
"""


@query("q330_dedup_threshold_advisor", oracle=_NT_ORACLE, tags=("X-120", "X-02"))
def q330_dedup_threshold_advisor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup threshold advisor: for each candidate Jaccard cut, how
    many similar pairs fire, how many documents a keep-lowest-id dedup
    would remove, and how many tokens that saves — the cost-benefit
    curve that turns X-02's fixed-threshold dedup into a TUNING
    decision (too low: real content removed; too high: redundancy
    survives; the curve's knee is the answer). Uses the q43/q301
    inverted-index machinery so only shingle-sharing pairs ever
    materialize.

    Determinism: micro-Jaccard scores are exact integer floor
    divisions; per-threshold pair/doc/token counts are exact integers
    over a bounded 5-way candidate fan-out with distinct-reduced
    removed-doc sets.

    Scale shape: postings equi-join generates candidates (zero-overlap
    pairs never exist); the threshold fan-out multiplies the bounded
    PAIR relation, not the corpus.

    Reference parity: beyond-reference; the planning layer over X-02."""
    base = dd.shingle_hashes_batched(
        load(spark, sf_dir, "documents"), "doc_id", "text", 3, "jac"
    ).localCheckpoint(eager=False)
    toks = (
        load(spark, sf_dir, "documents")
        .select(
            "doc_id",
            F.size(F.split(F.trim(F.col("text")), r"\s+")).alias("n_toks"),
        )
    )
    post = base.select(
        "doc_id", F.col("sz").alias("s"), F.explode("hs").alias("h")
    )
    pa = post.select(
        F.col("doc_id").alias("da"), F.col("s").alias("sa"), "h"
    )
    pb = post.select(
        F.col("doc_id").alias("db"), F.col("s").alias("sb"), "h"
    )
    pairs = (
        pa.join(pb, "h")
        .filter(F.col("da") < F.col("db"))
        .groupBy("da", "db", "sa", "sb")
        .agg(F.count(F.lit(1)).cast("long").alias("isz"))
        .select(
            "da",
            "db",
            F.expr(
                "CAST(isz * 1000000 div (sa + sb - isz) AS BIGINT)"
            ).alias("jm"),
        )
        .join(
            F.broadcast(toks.select(F.col("doc_id").alias("db"),
                                    F.col("n_toks").alias("toks_b"))),
            "db",
        )
        .transform(stage)  # all three per-threshold rollups share it
    )
    cands = spark.createDataFrame([(t,) for t in _NT_THRESH], "thr long")
    fan = pairs.crossJoin(F.broadcast(cands))
    per = fan.groupBy("thr").agg(
        F.sum(F.when(F.col("jm") >= F.col("thr"), 1).otherwise(0))
        .cast("long")
        .alias("n_pairs"),
        F.countDistinct(F.when(F.col("jm") >= F.col("thr"), F.col("db")))
        .cast("long")
        .alias("n_docs_removed"),
    )
    saved = (
        fan.filter(F.col("jm") >= F.col("thr"))
        .select("thr", "db", "toks_b")
        .distinct()
        .groupBy("thr")
        .agg(F.sum("toks_b").cast("long").alias("tokens_saved"))
    )
    return (
        cands.join(per, "thr", "left")
        .join(saved, "thr", "left")
        .na.fill({"n_pairs": 0, "n_docs_removed": 0, "tokens_saved": 0})
        .select(
            F.col("thr").alias("jaccard_micro_threshold"),
            "n_pairs",
            "n_docs_removed",
            "tokens_saved",
        )
        .transform(pin)
        .orderBy("jaccard_micro_threshold")
    )


# ---------------------------------------------------------------------------
# X-125: keyness — distinctive terms per source by Dunning's G^2
# ---------------------------------------------------------------------------

_KEY_TOPK = 2

_KEYNESS_ORACLE = rf"""
    WITH flat AS (
        SELECT source, unnest(string_split_regex(trim(text), '\s+')) AS tok
        FROM documents
    ),
    st AS (
        SELECT source, tok, CAST(COUNT(*) AS BIGINT) AS c FROM flat
        GROUP BY source, tok
    ),
    stot AS (SELECT source, CAST(SUM(c) AS BIGINT) AS n_s FROM st GROUP BY source),
    ttot AS (SELECT tok, CAST(SUM(c) AS BIGINT) AS c_t FROM st GROUP BY tok),
    nn AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM st),
    cells AS (
        SELECT s.source, s.tok,
               s.c AS o11, t.c_t - s.c AS o12,
               o.n_s - s.c AS o21, (nn.n - o.n_s) - (t.c_t - s.c) AS o22,
               o.n_s, t.c_t, nn.n
        FROM st s JOIN stot o USING (source) JOIN ttot t USING (tok), nn
    ),
    g2 AS (
        SELECT source, tok, o11, c_t,
               CAST(SUM(CASE WHEN o > 0 THEN
                   CAST(ROUND(2 * o * ROUND(ln(CAST(o AS DOUBLE) * n
                                               / row_t / col_t), 6), 3)
                        AS DECIMAL(28,3)) ELSE 0 END) AS DOUBLE) AS g2
        FROM (
            SELECT source, tok, o11, c_t, n, o, row_t, col_t FROM cells,
            LATERAL (VALUES (o11, n_s, c_t), (o12, n - n_s, c_t),
                            (o21, n_s, n - c_t), (o22, n - n_s, n - c_t))
                AS x(o, row_t, col_t)
        )
        GROUP BY source, tok, o11, c_t
    ),
    ranked AS (
        SELECT source, tok, o11, c_t, g2,
               ROW_NUMBER() OVER (PARTITION BY source
                                  ORDER BY g2 DESC, tok) AS rk
        FROM g2 WHERE o11 * 2 > c_t  -- over-represented in s, not under
    )
    SELECT source, rk AS rank, tok AS token, o11 AS count_in_source,
           c_t AS count_total, g2
    FROM ranked WHERE rk <= {_KEY_TOPK}
    ORDER BY source, rank
"""


@query("q335_source_keyness", oracle=_KEYNESS_ORACLE, tags=("X-125", "X-04"))
def q335_source_keyness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyness analysis: each source's top-2 DISTINCTIVE tokens by
    Dunning's log-likelihood G^2 over the (token in/out, source
    in/out) 2x2 — the corpus-linguistics standard for 'what words make
    this source itself', with a significance footing frequency ratios
    lack (rare tokens can have huge ratios but tiny G^2). The
    source-level companion of q74's per-doc tf-idf salient terms and
    the token-level refinement of q144's source-overlap matrix —
    exactly the readout that catches a contaminated or off-domain
    source before it pollutes a training mix.

    Determinism: all contingency cells are exact integers; each cell's
    2*O*ln(O*N/(row*col)) uses the q203 pinned-ln idiom with the term
    rounded to 3 dp into exact decimal sums (G^2 ~ O(100s): 3 dp is
    far coarser than the 1-ulp libm divergence); ranking is a
    (G^2, token) total order per source restricted to over-represented
    tokens.

    Scale shape: one (source, token) rollup; row/column totals and the
    grand total are rollups of it; the 4-cell expansion is a bounded
    LATERAL/stack fan-out; top-2 per source is the O-05 grouped-top-k.

    Reference parity: beyond-reference."""
    from pyspark.sql.window import Window as W

    flat = load(spark, sf_dir, "documents").select(
        "source",
        F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("tok"),
    )
    st = (
        flat.groupBy("source", "tok")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
        .transform(stage)  # all three totals derive from it
    )
    stot = st.groupBy("source").agg(F.sum("c").cast("long").alias("n_s"))
    ttot = st.groupBy("tok").agg(F.sum("c").cast("long").alias("c_t"))
    nn = st.agg(F.sum("c").cast("long").alias("n"))
    cells = (
        st.join(F.broadcast(stot), "source")
        .join(ttot, "tok")
        .crossJoin(F.broadcast(nn))
        .select(
            "source",
            "tok",
            F.col("c").alias("o11"),
            (F.col("c_t") - F.col("c")).alias("o12"),
            (F.col("n_s") - F.col("c")).alias("o21"),
            ((F.col("n") - F.col("n_s")) - (F.col("c_t") - F.col("c"))).alias(
                "o22"
            ),
            "n_s",
            "c_t",
            "n",
        )
    )
    expanded = cells.select(
        "source",
        "tok",
        "o11",
        "c_t",
        "n",
        F.expr(
            "stack(4, o11, n_s, c_t, o12, n - n_s, c_t,"
            " o21, n_s, n - c_t, o22, n - n_s, n - c_t)"
            " AS (o, row_t, col_t)"
        ),
    )
    term = F.when(
        F.col("o") > 0,
        F.round(
            2
            * F.col("o")
            * F.round(
                F.log(
                    F.col("o").cast("double")
                    * F.col("n")
                    / F.col("row_t")
                    / F.col("col_t")
                ),
                6,
            ),
            3,
        ).cast("decimal(28,3)"),
    ).otherwise(F.lit(0).cast("decimal(28,3)"))
    g2 = (
        expanded.select("source", "tok", "o11", "c_t", term.alias("t"))
        .groupBy("source", "tok", "o11", "c_t")
        .agg(F.sum("t").cast("double").alias("g2"))
    )
    ranked = (
        g2.filter(F.col("o11") * 2 > F.col("c_t"))
        .withColumn(
            "rk",
            F.row_number().over(
                W.partitionBy("source").orderBy(F.col("g2").desc(), "tok")
            ),
        )
        .filter(F.col("rk") <= _KEY_TOPK)
    )
    return (
        ranked.select(
            "source",
            F.col("rk").cast("long").alias("rank"),
            F.col("tok").alias("token"),
            F.col("o11").alias("count_in_source"),
            F.col("c_t").alias("count_total"),
            "g2",
        )
        .transform(pin)
        .orderBy("source", "rank")
    )
