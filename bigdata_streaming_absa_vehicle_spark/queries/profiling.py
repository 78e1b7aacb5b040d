"""Data-profiling and mergeable-aggregation query surface (SURVEY.md §2K
extensions X-11 / A-14 / A-15): the table-health and distributed-correctness
operations a 100 TB lakehouse runs constantly — one-pass column profiling
(ANALYZE TABLE), a shard-partial/merge equivalence proof for mergeable
aggregates, and a Count-Min sketch for mergeable frequency estimation.

Deterministic: exact counts/min/max everywhere, md5-derived CMS hashes
(operators/dedup.hash64, identical in DuckDB SQL), decimal-exact double sums.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.ordering import pin, stage
from ..functions.partitioning import fan_out
from ..operators.dedup import hash64
from ..tables import load
from .registry import query

# ---------------------------------------------------------------------------
# X-11: one-pass column profiler (ANALYZE TABLE)
# ---------------------------------------------------------------------------

#: (column, kind) for the lineitem profile; kind drives which min/max slot fills
_PROFILE_COLS = (
    ("l_orderkey", "num"),
    ("l_partkey", "num"),
    ("l_suppkey", "num"),
    ("l_linenumber", "num"),
    ("l_quantity", "num"),
    ("l_extendedprice", "num"),
    ("l_discount", "num"),
    ("l_tax", "num"),
    ("l_returnflag", "str"),
    ("l_linestatus", "str"),
    ("l_shipdate", "ts"),
)


def _profile_oracle() -> str:
    parts = []
    for c, kind in _PROFILE_COLS:
        if kind == "num":
            mn, mx = f"CAST(MIN({c}) AS DOUBLE)", f"CAST(MAX({c}) AS DOUBLE)"
            ms, xs = "CAST(NULL AS VARCHAR)", "CAST(NULL AS VARCHAR)"
        else:
            expr = f"CAST({c} AS VARCHAR)" if kind == "ts" else c
            mn, mx = "CAST(NULL AS DOUBLE)", "CAST(NULL AS DOUBLE)"
            ms, xs = f"MIN({expr})", f"MAX({expr})"
        parts.append(
            f"SELECT '{c}' AS col_name, COUNT(*) AS n,"
            f" COUNT(*) - COUNT({c}) AS n_null,"
            f" COUNT(DISTINCT {c}) AS n_distinct,"
            f" {mn} AS min_num, {mx} AS max_num,"
            f" {ms} AS min_str, {xs} AS max_str FROM lineitem"
        )
    return "\nUNION ALL\n".join(parts) + "\nORDER BY col_name"


@query("q113_column_profile", oracle=_profile_oracle(), tags=("X-11", "A-04"))
def q113_column_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-pass column profiler — the ANALYZE TABLE / data-quality scan run
    before a table joins a training pipeline: per column, row count, null
    count, exact distinct count, and typed min/max (numeric columns fill
    min_num/max_num, string/timestamp columns min_str/max_str).

    Scale shape (r13, guide §1.2/§2.3/§2.6): ONE wide scan computes
    counts/nulls/min/max in one ungrouped partial+final aggregate (no
    Expand, no sort — grouping-free SortAggregate never sorts), and each
    exact distinct count is its OWN single-column aggregate — a columnar
    scan reads just that column, the single-distinct rewrite dedups
    (partial groupBy(c), final count) with no Expand, and the 11 subtrees
    are independent, so the scheduler runs their stages concurrently
    (§2.6). The r12 shape ran all 11 distincts through ONE multi-distinct
    Expand aggregate: every row replicated n_cols+1 times through a
    12-field grouping key BEFORE the first exchange — 32.6 core-seconds
    of hashing at sf0.1 (opt_sqlprof r13) vs ~6 for the per-column form,
    and at 100 TB the Expand multiplies the full fact through one stage
    while per-column dedups read the same columnar bytes without the
    x12 row amplification. (The r12 mixing measurement stands: folding
    distincts into scan 1 forces the whole Expand through a grouped
    SortAggregate, 22.5 s at sf0.1.) The twelve 1-row results cross-join
    broadcast and explode into the per-column report on the driver-sized
    relation. At 100 TB swap COUNT(DISTINCT) for approx_count_distinct
    and the distincts fold into scan 1 (HLL buffers are hash-aggregable)."""
    li = load(spark, sf_dir, "lineitem")
    aggs = [F.count(F.lit(1)).alias("_n")]
    for c, kind in _PROFILE_COLS:
        aggs.append((F.count(F.lit(1)) - F.count(F.col(c))).alias(f"{c}__nn"))
        if kind == "num":
            aggs.append(F.min(c).cast("double").alias(f"{c}__mn"))
            aggs.append(F.max(c).cast("double").alias(f"{c}__mx"))
        else:
            expr = F.col(c).cast("string") if kind == "ts" else F.col(c)
            aggs.append(F.min(expr).alias(f"{c}__ms"))
            aggs.append(F.max(expr).alias(f"{c}__xs"))
    wide = li.agg(*aggs)
    for c, _ in _PROFILE_COLS:
        wide = wide.crossJoin(
            F.broadcast(li.agg(F.count_distinct(F.col(c)).alias(f"{c}__nd")))
        )
    null_d = F.lit(None).cast("double")
    null_s = F.lit(None).cast("string")
    structs = []
    for c, kind in _PROFILE_COLS:
        structs.append(
            F.struct(
                F.lit(c).alias("col_name"),
                F.col("_n").alias("n"),
                F.col(f"{c}__nn").alias("n_null"),
                F.col(f"{c}__nd").alias("n_distinct"),
                (F.col(f"{c}__mn") if kind == "num" else null_d).alias("min_num"),
                (F.col(f"{c}__mx") if kind == "num" else null_d).alias("max_num"),
                (null_s if kind == "num" else F.col(f"{c}__ms")).alias("min_str"),
                (null_s if kind == "num" else F.col(f"{c}__xs")).alias("max_str"),
            )
        )
    return (
        wide.select(F.explode(F.array(*structs)).alias("p"))
        .select("p.*")
        .orderBy("col_name")
    )


# ---------------------------------------------------------------------------
# A-14: mergeable partial aggregates (shard -> merge == direct)
# ---------------------------------------------------------------------------


@query(
    "q114_partial_agg_merge",
    oracle="""
    SELECT l_returnflag,
           CAST(SUM(CAST(l_quantity AS DECIMAL(28,2))) AS DOUBLE) AS sum_qty,
           COUNT(*) AS n,
           MIN(l_quantity) AS min_qty,
           MAX(l_quantity) AS max_qty,
           ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(28,2))) AS DOUBLE) / COUNT(*), 6) AS avg_qty
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
    tags=("A-14", "A-01"),
)
def q114_partial_agg_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable partial aggregation, certified: the table is split into two
    disjoint shards (l_orderkey parity — standing in for two days of
    partitions, two clusters, or a stream's micro-batches), each shard
    computes PARTIAL aggregates (decimal sum / count / min / max), and the
    partials are MERGED (sum-of-sums, min-of-mins...) with derived stats
    (avg) computed only at the end. The oracle aggregates the table
    directly — a hash match PROVES merge(partials) == direct for this
    aggregate family, the algebraic property every incremental /
    cross-cluster / materialized-view rollup at 100 TB rests on. (q90 is
    the same statement for HLL sketches; this is the exact-aggregate twin.)

    Scale shape: two pruned scans -> per-shard partial agg (map-side
    combined) -> a union'd merge agg over 2x5 tiny rows. The derived avg
    deliberately comes from merged sum/count, never averaged averages."""
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_returnflag", "l_quantity")
    d = F.col("l_quantity").cast("decimal(28,2)")

    def partial(shard: DataFrame) -> DataFrame:
        return shard.groupBy("l_returnflag").agg(
            F.sum(d).alias("p_sum"),
            F.count(F.lit(1)).alias("p_n"),
            F.min("l_quantity").alias("p_min"),
            F.max("l_quantity").alias("p_max"),
        )

    even = partial(li.filter(F.col("l_orderkey") % 2 == 0))
    odd = partial(li.filter(F.col("l_orderkey") % 2 == 1))
    merged = (
        even.unionByName(odd)
        .groupBy("l_returnflag")
        .agg(
            F.sum("p_sum").cast("double").alias("sum_qty"),
            F.sum("p_n").alias("n"),
            F.min("p_min").alias("min_qty"),
            F.max("p_max").alias("max_qty"),
        )
    )
    return (
        merged.select(
            "l_returnflag",
            "sum_qty",
            "n",
            "min_qty",
            "max_qty",
            F.round(F.col("sum_qty") / F.col("n"), 6).alias("avg_qty"),
        )
        .transform(pin)
        .orderBy("l_returnflag")
    )


# ---------------------------------------------------------------------------
# A-15: Count-Min sketch (mergeable frequency estimation)
# ---------------------------------------------------------------------------

_CMS_D = 4  #: hash rows
_CMS_W = 64  #: counters per row


def cms_cells(df: DataFrame, key_col: str) -> DataFrame:
    """Build the CMS cell relation (i, cell, c) for a key column — the
    mergeable core of q115: cells from disjoint shards / micro-batches ADD
    (certified by tests/test_streaming.py's stream-merge test and, for the
    probe path, by the q115 hash)."""
    return (
        df.select(
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(i).alias("i"),
                            (hash64(f"cms{i}", F.col(key_col)) % _CMS_W).alias("cell"),
                        )
                        for i in range(_CMS_D)
                    ]
                )
            ).alias("s")
        )
        .select("s.*")
        .groupBy("i", "cell")
        .agg(F.count(F.lit(1)).alias("c"))
    )


def _cms_hash_sql(i: str, key: str) -> str:
    """DuckDB twin of operators.dedup.hash64(f'cms{i}', key) % W."""
    return (
        f"CAST('0x' || substr(md5('cms' || {i} || ':' || {key}), 1, 15) AS BIGINT)"
        f" % {_CMS_W}"
    )


@query(
    "q115_count_min_sketch",
    oracle=f"""
    WITH cells AS (
        SELECT i.i, {_cms_hash_sql('i.i', 'event_type')} AS cell, COUNT(*) AS c
        FROM events, (SELECT unnest([0,1,2,3]) AS i) i
        GROUP BY i.i, cell
    ),
    keys AS (
        SELECT event_type, COUNT(*) AS exact_n FROM events GROUP BY event_type
    )
    SELECT k.event_type, k.exact_n, MIN(c.c) AS cms_est
    FROM keys k
    JOIN cells c ON c.cell = {_cms_hash_sql('c.i', 'k.event_type')}
    GROUP BY k.event_type, k.exact_n
    ORDER BY k.event_type
    """,
    tags=("A-15", "A-05"),
)
def q115_count_min_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min sketch (d=4 rows x w=64 counters, md5-derived hash family)
    built over the event stream, then probed for every key: est =
    min_i cms[i][h_i(key)] — the mergeable frequency sketch used where
    exact per-key counts don't fit (CMS cells ADD across shards/windows,
    exactly like q90's HLL registers). exact_n rides along so the result
    certifies both the sketch build and the probe; CMS overestimates on
    collisions, and the hash family is deterministic, so the overestimate
    itself is engine-stable and hash-checkable.

    Scale shape: the sketch build is a map-side-combined aggregate onto
    d*w = 256 cells — shuffle volume is O(256), independent of row count;
    the probe joins the (tiny) key list against the 256-cell relation as a
    broadcast. Nothing driver-side."""
    ev = load(spark, sf_dir, "events").select("event_type")
    cells = cms_cells(ev, "event_type")
    keys = ev.groupBy("event_type").agg(F.count(F.lit(1)).alias("exact_n"))
    probes = keys.select(
        "event_type",
        "exact_n",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("i"),
                        (hash64(f"cms{i}", F.col("event_type")) % _CMS_W).alias("cell"),
                    )
                    for i in range(_CMS_D)
                ]
            )
        ).alias("s"),
    ).select("event_type", "exact_n", "s.i", "s.cell")
    return (
        probes.join(F.broadcast(cells), ["i", "cell"])
        .groupBy("event_type", "exact_n")
        .agg(F.min("c").alias("cms_est"))
        .transform(pin)
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# X-11 companion: correlation matrix from exact moments
# ---------------------------------------------------------------------------

#: numeric lineitem columns correlated pairwise (all 2-dp doubles, so their
#: sums and cross-products are exact in decimal at scale 4)
_CORR_COLS = ("l_quantity", "l_extendedprice", "l_discount", "l_tax")


def _corr_oracle() -> str:
    sums = ["COUNT(*) AS n"]
    for c in _CORR_COLS:
        sums.append(f"CAST(SUM(CAST({c} AS DECIMAL(18,2))) AS DOUBLE) AS s_{c}")
        sums.append(
            f"CAST(SUM(CAST({c} AS DECIMAL(18,2)) * CAST({c} AS DECIMAL(18,2))) AS DOUBLE) AS ss_{c}"
        )
    pairs = []
    for i, a in enumerate(_CORR_COLS):
        for b in _CORR_COLS[i + 1 :]:
            sums.append(
                f"CAST(SUM(CAST({a} AS DECIMAL(18,2)) * CAST({b} AS DECIMAL(18,2))) AS DOUBLE)"
                f" AS sp_{a}_{b}"
            )
            pairs.append(
                f"SELECT '{a}' AS col_a, '{b}' AS col_b, n,"
                f" ROUND((n * sp_{a}_{b} - s_{a} * s_{b})"
                f" / sqrt((n * ss_{a} - s_{a} * s_{a}) * (n * ss_{b} - s_{b} * s_{b})), 6) AS r"
                f" FROM m"
            )
    return (
        "WITH m AS (SELECT " + ", ".join(sums) + " FROM lineitem)\n"
        + "\nUNION ALL\n".join(pairs)
        + "\nORDER BY col_a, col_b"
    )


@query("q122_correlation_matrix", oracle=_corr_oracle(), tags=("X-11", "A-08"))
def q122_correlation_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise Pearson correlation matrix over the numeric fact columns,
    computed from EXACT decimal moments (sums, squares, cross-products) in
    one scan — the feature-redundancy screen run before model training.
    The r formula then runs in IEEE double on identical operands in both
    engines; summation order cannot flake it because every sum is decimal.

    Scale shape: ONE ungrouped partial+final aggregate produces all 14
    moments (map-side combined, 1 row crosses the exchange); the 6-pair
    matrix explodes from that single row. This is also how you'd compute
    it incrementally: the moments are A-14-mergeable partials.

    r12 optimization (guide §1.2 per-task work): the 14 decimal-sum
    moments ran every row through BigDecimal multiplies and wide-decimal
    buffers — the aggregate alone measured 1.71 s at sf0.1
    (tools/opt_micro_dsum.py). The moments are now accumulated as EXACT
    scaled-integer (cents) long sums: per row, cents_c = round(c * 100)
    recovers the 2-dp value exactly (every _CORR_COL is a 2-dp decimal
    stored as its nearest double, so c*100 is within ~1e-9 of the
    integer — pinned for every row of every SF by
    tests/test_opt_equivalence.py), and each product cents_a * cents_b
    (<= ~1.1e14) splits into hi = p >> 23 / lo = p & (2^23 - 1) long
    sums so the per-moment totals stay inside int64 up to ~8.8e11 rows
    (max(2^23, 1.1e14 / 2^23) * rows < 2^63 — the 100 TB envelope).
    The single output row reassembles U = H * 2^23 + L in decimal(38,0)
    (exact) and divides by the scale factor in decimal (4-dp value,
    6-dp division scale: exact), so every s_/ss_/sp_ double is
    bit-identical to the old decimal-sum cast. Measured 0.71 s for the
    same 14 moments; q122 end to end 1.41 s -> ~0.65 s median."""
    li = load(spark, sf_dir, "lineitem")
    cents = {c: F.round(F.col(c) * 100).cast("long") for c in _CORR_COLS}
    shift = 23  # balances hi/lo headroom: max rows ~ 2^63 / max(2^23, Pmax/2^23)
    mask = (1 << shift) - 1
    aggs = [F.count(F.lit(1)).alias("n")]
    prods = []  # (name, scale_divisor) assembled from hi/lo after the agg
    for c in _CORR_COLS:
        aggs.append(F.sum(cents[c]).alias(f"S_{c}"))
    pair_list = []
    for c in _CORR_COLS:
        prods.append((f"ss_{c}", cents[c] * cents[c]))
    for i, a in enumerate(_CORR_COLS):
        for b in _CORR_COLS[i + 1 :]:
            prods.append((f"sp_{a}_{b}", cents[a] * cents[b]))
            pair_list.append((a, b))
    for name, p in prods:
        aggs.append(F.sum(F.shiftright(p, shift)).alias(f"H_{name}"))
        aggs.append(F.sum(p.bitwiseAND(F.lit(mask))).alias(f"L_{name}"))
    raw = li.agg(*aggs)
    # reassemble exact decimals on the single result row: sums of cents have
    # scale 2, sums of cents-products scale 4; decimal division at Spark's
    # result scale (6) is exact for both, so the final doubles match the old
    # decimal-sum casts bit for bit.
    cols = [F.col("n")]
    for c in _CORR_COLS:
        cols.append(
            (F.col(f"S_{c}").cast("decimal(38,0)") / F.lit(100)).cast("double").alias(f"s_{c}")
        )
    for name, _ in prods:
        u = (
            F.col(f"H_{name}").cast("decimal(38,0)") * F.lit(1 << shift)
            + F.col(f"L_{name}")
        )
        cols.append((u / F.lit(10000)).cast("double").alias(name))
    wide = raw.select(*cols)
    n = F.col("n")
    structs = []
    for a, b in pair_list:
        sa, sb = F.col(f"s_{a}"), F.col(f"s_{b}")
        ssa, ssb = F.col(f"ss_{a}"), F.col(f"ss_{b}")
        sp = F.col(f"sp_{a}_{b}")
        r = F.round(
            (n * sp - sa * sb) / F.sqrt((n * ssa - sa * sa) * (n * ssb - sb * sb)), 6
        )
        structs.append(
            F.struct(
                F.lit(a).alias("col_a"), F.lit(b).alias("col_b"), n.alias("n"), r.alias("r")
            )
        )
    return (
        wide.select(F.explode(F.array(*structs)).alias("p"))
        .select("p.*")
        .orderBy("col_a", "col_b")
    )


# ---------------------------------------------------------------------------
# A-16: Bloom-filter membership pre-filter (runtime-filter semantics)
# ---------------------------------------------------------------------------

_BF_M = 256  #: filter bits
_BF_K = 3  #: hash functions
_BF_NATION = 7  #: dimension predicate: suppliers of this nation


def _bf_pos_sql(j: int, key: str) -> str:
    """DuckDB twin of the probe-side position extraction: byte j of ONE
    md5-derived 60-bit hash (hash64('bf', key) >> 8j & 255) — one md5 per
    row instead of k, the standard partitioned-hash Bloom compromise."""
    return (
        f"(CAST('0x' || substr(md5('bf:' || CAST({key} AS VARCHAR)), 1, 15) AS BIGINT)"
        f" >> {8 * j}) & {_BF_M - 1}"
    )


_BF_W = _BF_M // 32  #: filter words (32 bits per BIGINT word — see build)


def _bf_word_sql(w: int) -> str:
    """DuckDB build of filter word w: OR of 1<<(pos&31) over dim positions
    landing in that word. 32-bit words because DuckDB raises on the 1<<63
    a 64-bit-word build would need."""
    return (
        "bit_or(CASE WHEN (pos // 32) = "
        f"{w} THEN (1::BIGINT << (pos & 31)) ELSE 0 END) AS w{w}"
    )


def _bf_oracle() -> str:
    pos_union = " UNION ALL ".join(
        f"SELECT {_bf_pos_sql(j, 's_suppkey')} AS pos FROM dim" for j in range(_BF_K)
    )
    words = ", ".join(_bf_word_sql(w) for w in range(_BF_W))

    def probe_bit(j: int) -> str:
        p = f"p{j}"
        word_case = " ".join(
            f"WHEN {w} THEN w{w}" for w in range(_BF_W)
        )
        return f"(((CASE ({p} // 32) {word_case} END) >> ({p} & 31)) & 1) = 1"

    pcols = ", ".join(f"{_bf_pos_sql(j, 'l_suppkey')} AS p{j}" for j in range(_BF_K))
    probe = " AND ".join(probe_bit(j) for j in range(_BF_K))
    return f"""
    WITH dim AS (SELECT s_suppkey FROM supplier WHERE s_nationkey = {_BF_NATION}),
    bits AS (SELECT {words} FROM ({pos_union})),
    probed AS (
        SELECT l_suppkey, l_extendedprice, l_discount, {pcols}
        FROM lineitem
    ),
    cand AS (SELECT l_suppkey, l_extendedprice, l_discount FROM probed, bits WHERE {probe})
    SELECT COUNT(*) AS n_candidates,
           COUNT(CASE WHEN l_suppkey IN (SELECT s_suppkey FROM dim) THEN 1 END)
               AS n_true,
           COUNT(CASE WHEN l_suppkey IN (SELECT s_suppkey FROM dim) THEN NULL ELSE 1 END)
               AS n_false_positive,
           COALESCE(CAST(SUM(CAST(CASE WHEN l_suppkey IN (SELECT s_suppkey FROM dim)
                    THEN l_extendedprice * (1 - l_discount) ELSE 0 END
                    AS DECIMAL(28,6))) AS DOUBLE), 0.0) AS revenue_true
    FROM cand
    """


@query("q138_bloom_prefilter", oracle=_bf_oracle(), tags=("A-16", "J-05"))
def q138_bloom_prefilter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter semi-join pre-filter: build a 256-bit, 3-hash Bloom
    filter over the dimension keys (suppliers of one nation), probe every
    fact row map-only, then resolve candidates exactly — reporting
    candidate count, true-match count, false-positive count, and revenue
    over true matches. The md5-derived hash family makes the filter — and
    therefore the FALSE-POSITIVE count itself — deterministic and
    hash-checkable in both engines, certifying build and probe.

    This is runtime-filter/DPP semantics made explicit: the same
    mechanism Spark applies as `InSubquery`/bloom runtime filters, but as
    a declared operator the pipeline can place anywhere (e.g. ship the
    256-bit filter into a Kafka consumer to drop non-matching events
    before the shuffle).

    Scale shape: the filter build is ONE scan of the dim (positions
    exploded k-per-key) bit_or-aggregated straight into the M/32 filter
    WORDS — shuffle volume O(M) regardless of dim size — and the 64-byte
    result is fetched to the driver and INLINED as a literal array into
    the probe plan, exactly how Spark's own runtime bloom filters
    (BloomFilterMightContain) and InSubqueryExec ship their build-side
    result; the probe is then map-only JVM codegen on the fact scan (ONE
    md5 per row — the k positions are bytes of one 60-bit hash, the
    standard partitioned-hash compromise — then pure shift/mask tests
    against literal words, no array scan, no join, no shuffle, no
    subquery re-evaluation); only surviving candidates pay the exact
    semi-join, which broadcasts the dim. A filter that drops 99% of the
    fact before the join is the difference between a 100 TB shuffle and
    a 1 TB one."""
    dim = (
        load(spark, sf_dir, "supplier")
        .filter(F.col("s_nationkey") == _BF_NATION)
        .select("s_suppkey")
    )

    # Build: one dim scan, k positions per key via explode, bit_or into
    # words.  The aggregate output is ONE bounded row (M/32 longs = the
    # 256-bit filter itself); first() is the runtime-filter build-side
    # fetch — the same driver round-trip Spark's InSubqueryExec /
    # BloomFilterMightContain perform — NOT a data collect: its size is
    # O(M), independent of dim and fact cardinality.
    h = hash64("bf", F.col("s_suppkey").cast("string"))
    pos_arr = F.array(
        *[F.shiftright(h, 8 * j).bitwiseAND(_BF_M - 1) for j in range(_BF_K)]
    )
    word_row = (
        dim.select(F.explode(pos_arr).alias("pos"))
        .agg(
            *[
                F.expr(
                    f"bit_or(CASE WHEN (pos DIV 32) = {w}"
                    " THEN shiftleft(1L, CAST(pos % 32 AS INT)) ELSE 0L END)"
                ).alias(f"w{w}")
                for w in range(_BF_W)
            ]
        )
        .first()
    )
    words = [int(word_row[f"w{w}"] or 0) for w in range(_BF_W)]
    # Probe form: the M filter BITS expanded to a literal boolean array —
    # element_at(bits, pos+1) per probe position, no shift/mask at probe
    # time (measured 2x faster than per-row word shift/mask at sf0.1; the
    # literal array constant-folds once per plan, M booleans ~ 256 bytes).
    bit_lits = ", ".join(
        "true" if (words[p // 32] >> (p % 32)) & 1 else "false" for p in range(_BF_M)
    )
    barr = f"array({bit_lits})"

    # The filter words reach the probe as LITERALS (measured: the same
    # words as scalar subqueries cost ~1 s extra at sf0.1 — the subquery
    # reference in the filter condition defeats codegen common-subexpr
    # elimination), NOT via a cross join — a crossJoin(broadcast(words))
    # plans a BroadcastNestedLoopJoin whose
    # condition is evaluated interpreted, ~2x the whole query's cost; with
    # literal words the probe stays a whole-stage-codegen map filter
    # directly on the fact scan. The 60-bit hash is projected ONCE per row
    # (bh); the k positions are byte extractions from it.
    # fan_out was MEASURED AND REJECTED here (r13): the probe stage
    # profiled as 3 tasks with one 2.1 s straggler, but interleaved A/B at
    # sf0.1 measured the rebalanced variant no faster (1.40s on vs 1.32s
    # off, median of 5, opt_ab_rebalance r13) — one md5 per row is cheap
    # enough that the extra exchange cancels the added width.
    fact = load(spark, sf_dir, "lineitem").select(
        "l_suppkey", "l_extendedprice", "l_discount"
    )
    probed = fact.withColumn(
        "bh",
        F.expr(
            "CAST(conv(substring(md5(concat('bf:', CAST(l_suppkey AS STRING))),"
            " 1, 15), 16, 10) AS BIGINT)"
        ),
    )

    def probe_bit_sql(j: int) -> str:
        # element_at on the literal bit array instead of word shift/mask
        # or an 8-branch CASE: bool-array measured 2x faster than
        # shift/mask, which measured ~4x faster than the CASE form
        pos = f"(shiftright(bh, {8 * j}) & {_BF_M - 1})"
        return f"element_at({barr}, CAST({pos} AS INT) + 1)"

    cand = probed.filter(
        F.expr(" AND ".join(probe_bit_sql(j) for j in range(_BF_K)))
    ).drop("bh")
    marked = cand.join(
        F.broadcast(dim.withColumn("hit", F.lit(1))),
        cand.l_suppkey == dim.s_suppkey,
        "left",
    )
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(28,6)")
    # COUNT forms (never NULL) + coalesced revenue: at tiny SFs the dim can
    # be empty, and a SUM over zero candidate rows must still report 0s
    return marked.agg(
        F.count(F.lit(1)).alias("n_candidates"),
        F.count(F.when(F.col("hit").isNotNull(), 1)).alias("n_true"),
        F.count(F.when(F.col("hit").isNull(), 1)).alias("n_false_positive"),
        F.coalesce(
            F.sum(F.when(F.col("hit").isNotNull(), rev)).cast("double"), F.lit(0.0)
        ).alias("revenue_true"),
    )


# ---------------------------------------------------------------------------
# X-36: snapshot profile drift (schema-health diff between two periods)
# ---------------------------------------------------------------------------

_DRIFT_SPLIT = "2024-01-16"  #: v1 = events before, v2 = events on/after


@query(
    "q196_profile_drift",
    oracle=f"""
    WITH tagged AS (
        SELECT CASE WHEN ts < TIMESTAMP '{_DRIFT_SPLIT}' THEN 'v1' ELSE 'v2' END AS side,
               user_id, event_type, value
        FROM events
    ),
    s AS (
        SELECT side, COUNT(*) AS n,
               COUNT(DISTINCT user_id) AS ndv_user,
               CAST(SUM(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nulls_user,
               COUNT(DISTINCT event_type) AS ndv_type,
               CAST(SUM(CASE WHEN event_type IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nulls_type,
               COUNT(DISTINCT value) AS ndv_value,
               CAST(SUM(CASE WHEN value IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nulls_value
        FROM tagged GROUP BY side
    ),
    long AS (
        SELECT side, n, 'user_id' AS col, ndv_user AS ndv, nulls_user AS nulls FROM s
        UNION ALL
        SELECT side, n, 'event_type', ndv_type, nulls_type FROM s
        UNION ALL
        SELECT side, n, 'value', ndv_value, nulls_value FROM s
    )
    SELECT col,
           MAX(CASE WHEN side = 'v1' THEN n END) AS n_v1,
           MAX(CASE WHEN side = 'v1' THEN ndv END) AS ndv_v1,
           MAX(CASE WHEN side = 'v1' THEN nulls END) AS nulls_v1,
           MAX(CASE WHEN side = 'v2' THEN n END) AS n_v2,
           MAX(CASE WHEN side = 'v2' THEN ndv END) AS ndv_v2,
           MAX(CASE WHEN side = 'v2' THEN nulls END) AS nulls_v2,
           ROUND(CAST(MAX(CASE WHEN side = 'v2' THEN ndv END) AS DOUBLE)
                 / MAX(CASE WHEN side = 'v1' THEN ndv END), 6) AS ndv_ratio
    FROM long
    GROUP BY col
    ORDER BY col
    """,
    tags=("X-36", "X-11", "A-04"),
)
def q196_profile_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Profile drift between two table versions/periods (the q113 column
    profiler applied as a DIFF): one side-tagged scan computes per-period
    row counts, per-column distinct counts and null counts, and the
    reshape emits one row per column with both periods side by side plus
    the NDV ratio — the schema-health gate ("did a column collapse to one
    value? did null rates jump?") a pipeline runs before promoting a new
    snapshot, catching upstream breakage that row counts alone miss.

    Scale shape: ONE fact scan; the three count-distincts ride a single
    side-keyed HashAggregate (the q113 Expand discipline — never one scan
    per column); the reshape (stack + pivot) and the ratio run on the
    bounded 2x3 relation. At 100 TB the only cost is the one Expand'd
    rollup; sides could also merge A-14-style from per-day profiles."""
    ev = load(spark, sf_dir, "events")
    s = (
        ev.select(
            F.when(F.col("ts") < F.lit(_DRIFT_SPLIT).cast("timestamp"), "v1")
            .otherwise("v2")
            .alias("side"),
            "user_id",
            "event_type",
            "value",
        )
        .groupBy("side")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.countDistinct("user_id").alias("ndv_user"),
            F.sum(F.when(F.col("user_id").isNull(), 1).otherwise(0))
            .cast("long")
            .alias("nulls_user"),
            F.countDistinct("event_type").alias("ndv_type"),
            F.sum(F.when(F.col("event_type").isNull(), 1).otherwise(0))
            .cast("long")
            .alias("nulls_type"),
            F.countDistinct("value").alias("ndv_value"),
            F.sum(F.when(F.col("value").isNull(), 1).otherwise(0))
            .cast("long")
            .alias("nulls_value"),
        )
    )
    long = s.selectExpr(
        "side",
        "n",
        "stack(3, 'user_id', ndv_user, nulls_user,"
        " 'event_type', ndv_type, nulls_type,"
        " 'value', ndv_value, nulls_value) AS (col, ndv, nulls)",
    )
    agg = [
        F.max(F.when(F.col("side") == side, F.col(c))).alias(f"{c}_{side}")
        for side in ("v1", "v2")
        for c in ("n", "ndv", "nulls")
    ]
    return (
        long.groupBy("col")
        .agg(*agg)
        .select(
            "col",
            F.col("n_v1"),
            F.col("ndv_v1"),
            F.col("nulls_v1"),
            F.col("n_v2"),
            F.col("ndv_v2"),
            F.col("nulls_v2"),
            F.expr("ROUND(CAST(ndv_v2 AS DOUBLE) / ndv_v1, 6)").alias("ndv_ratio"),
        )
        .orderBy("col")
    )


# ---------------------------------------------------------------------------
# X-40: mergeable quantile sketch (HDR / DDSketch-family log-bucket histogram)
# ---------------------------------------------------------------------------

#: quantile sketch resolution: buckets keep this many leading decimal digits,
#: so the relative bucket width — and the worst-case quantile estimation
#: error — is 10^(1-_HDR_DIGITS) = 1%.
_HDR_DIGITS = 3
_HDR_PS = (50, 90, 99)


def _hdr_oracle() -> str:
    est_cols = ",\n           ".join(
        f"ROUND(CAST(MAX(CASE WHEN p = {p} THEN est_lb END) AS DOUBLE) / 100, 2)"
        f" AS p{p}_est"
        for p in _HDR_PS
    )
    spine = ", ".join(str(p) for p in _HDR_PS)
    return f"""
    WITH c AS (
        SELECT event_type,
               CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS c
        FROM events
    ),
    u AS (
        SELECT event_type, c,
               CAST(power(10, greatest(length(CAST(c AS VARCHAR)) - {_HDR_DIGITS}, 0))
                    AS BIGINT) AS unit
        FROM c
    ),
    b AS (
        SELECT event_type, (c // unit) * unit AS lb, CAST(COUNT(*) AS BIGINT) AS cnt
        FROM u GROUP BY event_type, (c // unit) * unit
    ),
    cum AS (
        SELECT event_type, lb, cnt,
               CAST(SUM(cnt) OVER (PARTITION BY event_type ORDER BY lb) AS BIGINT) AS cum,
               CAST(SUM(cnt) OVER (PARTITION BY event_type) AS BIGINT) AS n
        FROM b
    ),
    est AS (
        SELECT event_type, p, MIN(lb) AS est_lb, MAX(n) AS n
        FROM cum CROSS JOIN (SELECT unnest([{spine}]) AS p) ps
        WHERE cum >= (n * p + 99) // 100
        GROUP BY event_type, p
    )
    SELECT event_type, MAX(n) AS n_events,
           {est_cols}
    FROM est GROUP BY event_type ORDER BY event_type
    """


def hdr_histogram(df: DataFrame) -> DataFrame:
    """(event_type, lb, cnt) log-bucket histogram of an events-shaped
    relation — the MERGEABLE state of the X-40 quantile sketch. One
    map-side-combined groupBy whose integer counts sum across shards,
    days, or micro-batches, so the IDENTICAL code path runs over a batch
    table or a streaming source (complete-mode agg): the live proof of
    the sketch's A-14 claim
    (tests/test_streaming.py::test_hdr_histogram_stream_equals_batch).
    A metrics pipeline keeps this agg running and extracts quantiles
    from the current histogram whenever asked."""
    c = df.select(
        "event_type",
        (F.col("value").cast("decimal(18,2)") * 100).cast("long").alias("c"),
    )
    u = c.withColumn(
        "unit",
        F.pow(
            F.lit(10.0),
            F.greatest(
                F.length(F.col("c").cast("string")) - _HDR_DIGITS, F.lit(0)
            ).cast("double"),
        ).cast("long"),
    )
    return (
        u.select("event_type", F.expr("(c DIV unit) * unit").alias("lb"))
        .groupBy("event_type", "lb")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )


@query("q200_hdr_quantiles", oracle=_hdr_oracle(), tags=("X-40", "A-14"))
def q200_hdr_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable quantile sketch (the HDR-histogram / DDSketch family):
    per-event-type p50/p90/p99 of the value column estimated from a
    log-scale bucket histogram that keeps 3 leading decimal digits of the
    cents value — worst-case relative error 1% (bucket width / bucket
    lower bound <= 10^(1-3)), the estimate reported as the bucket lower
    bound so the bias direction is known. Unlike A-12's exact percentiles
    the bucket counts are A-14-MERGEABLE: per-shard histograms sum with
    no rescan, so a 1000-executor fleet (or a streaming update-mode agg)
    maintains global quantiles by adding integer vectors — the reason
    DDSketch/HDR is what metrics backends actually ship.

    Scale shape: one map-side-combined groupBy reduces the fact to the
    bounded (type x <=900-buckets-per-decade) histogram relation; the
    cumulative scan, rank targets ceil(n*p/100) (exact integer DIV), and
    the per-p min-bucket search all run on that bounded relation. Every
    operand is an exact integer — no libm, no float ordering anywhere.
    Accuracy vs the A-12 exact path is pinned by
    tests/test_round5_properties.py::test_hdr_sketch_error_bound."""
    b = hdr_histogram(load(spark, sf_dir, "events"))
    wcum = (
        Window.partitionBy("event_type")
        .orderBy("lb")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wall = Window.partitionBy("event_type")
    cum = b.select(
        "event_type",
        "lb",
        F.sum("cnt").over(wcum).cast("long").alias("cum"),
        F.sum("cnt").over(wall).cast("long").alias("n"),
    )
    spine = F.explode(F.array(*[F.lit(p) for p in _HDR_PS])).alias("p")
    est = (
        cum.select("event_type", "lb", "cum", "n", spine)
        .where(F.expr("cum >= (n * p + 99) DIV 100"))
        .groupBy("event_type", "p")
        .agg(F.min("lb").alias("est_lb"), F.max("n").alias("n"))
    )
    est_cols = [
        F.round(
            F.max(F.when(F.col("p") == p, F.col("est_lb"))).cast("double") / 100, 2
        ).alias(f"p{p}_est")
        for p in _HDR_PS
    ]
    return (
        est.groupBy("event_type")
        .agg(F.max("n").alias("n_events"), *est_cols)
        .transform(pin)
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# X-43: embedding-corpus dimension profile (whitening / normalization stats)
# ---------------------------------------------------------------------------

_EQ_SCALE = 1 << 20  #: fixed-point scale for exact per-dimension moments


@query(
    "q204_embedding_dim_profile",
    oracle=f"""
    WITH q AS (
        SELECT pos - 1 AS dim,
               CAST(floor(CAST(embedding[pos] AS DOUBLE) * {_EQ_SCALE} + 0.5)
                    AS BIGINT) AS qv
        FROM embeddings, LATERAL (
            SELECT unnest(generate_series(1, len(embedding))) AS pos
        )
    ),
    m AS (
        SELECT dim, CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CAST(qv AS HUGEINT)) AS HUGEINT) AS s,
               CAST(SUM(CAST(qv AS HUGEINT) * qv) AS HUGEINT) AS s2,
               MIN(qv) AS mn, MAX(qv) AS mx
        FROM q GROUP BY dim
    )
    SELECT dim, n,
           ROUND(CAST(s AS DOUBLE) / n / {_EQ_SCALE}, 6) AS mean,
           ROUND(sqrt(CAST(n * s2 - s * s AS DOUBLE)
                      / (CAST(n AS DOUBLE) * (n - 1))) / {_EQ_SCALE}, 6) AS std,
           ROUND(CAST(mn AS DOUBLE) / {_EQ_SCALE}, 6) AS vmin,
           ROUND(CAST(mx AS DOUBLE) / {_EQ_SCALE}, 6) AS vmax
    FROM m ORDER BY dim
    """,
    tags=("X-43", "A-14"),
)
def q204_embedding_dim_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-dimension profile of the embedding corpus — mean, std, min,
    max for each of the 64 dimensions: the whitening/normalization
    statistics an ANN index build (X-03's IVF) or a drift monitor reads
    first, and the X-11 column profiler generalized to vector columns
    (a dimension whose std collapses toward 0 is dead weight in every
    distance computation and a quantization-range bug waiting).

    Determinism: floats quantize to 2^20 fixed point (exact in double:
    a 24-bit float mantissa times 2^20 is exactly representable), all
    moments accumulate as EXACT integers (decimal(38,0) / HUGEINT), and
    the mean/std divisions + sqrt run on bit-identical operands in both
    engines — rounded 6 dp.

    Scale shape: posexplode fans each vector to 64 (dim, value) rows
    map-only; ONE map-side-combined groupBy on the 64-key dim relation
    (partials are A-14-mergeable 5-number tuples, so 64 keys never
    bottleneck — each partition pre-reduces to <=64 rows before the
    exchange); everything after runs on 64 rows."""
    emb = load(spark, sf_dir, "embeddings")
    q = emb.select(
        F.posexplode(
            F.transform(
                F.col("embedding"),
                lambda x: F.floor(x.cast("double") * _EQ_SCALE + 0.5).cast("long"),
            )
        ).alias("dim", "qv")
    )
    d0 = "decimal(38,0)"
    m = q.groupBy("dim").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.col("qv").cast(d0)).cast(d0).alias("s"),
        F.sum(F.col("qv").cast(d0) * F.col("qv")).cast(d0).alias("s2"),
        F.min("qv").alias("mn"),
        F.max("qv").alias("mx"),
    )
    n = F.col("n").cast(d0)
    var_num = n * F.col("s2") - F.col("s") * F.col("s")
    return (
        m.select(
            "dim",
            "n",
            F.round(F.col("s").cast("double") / F.col("n") / _EQ_SCALE, 6).alias(
                "mean"
            ),
            F.round(
                F.sqrt(
                    var_num.cast("double")
                    / (F.col("n").cast("double") * (F.col("n") - 1))
                )
                / _EQ_SCALE,
                6,
            ).alias("std"),
            F.round(F.col("mn").cast("double") / _EQ_SCALE, 6).alias("vmin"),
            F.round(F.col("mx").cast("double") / _EQ_SCALE, 6).alias("vmax"),
        )
        .transform(pin)
        .orderBy("dim")
    )


# ---------------------------------------------------------------------------
# A-15 (cont.): CMS join-size estimation (sketch inner product)
# ---------------------------------------------------------------------------


@query(
    "q218_join_size_estimate",
    oracle=f"""
    WITH ce AS (
        SELECT i.i, {_cms_hash_sql('i.i', 'CAST(user_id AS VARCHAR)')} AS cell,
               CAST(COUNT(*) AS BIGINT) AS c
        FROM events, (SELECT unnest([0,1,2,3]) AS i) i
        GROUP BY i.i, cell
    ),
    co AS (
        SELECT i.i, {_cms_hash_sql('i.i', 'CAST(o_custkey AS VARCHAR)')} AS cell,
               CAST(COUNT(*) AS BIGINT) AS c
        FROM orders, (SELECT unnest([0,1,2,3]) AS i) i
        GROUP BY i.i, cell
    ),
    est AS (
        SELECT ce.i, CAST(SUM(ce.c * co.c) AS HUGEINT) AS dot
        FROM ce JOIN co ON ce.i = co.i AND ce.cell = co.cell
        GROUP BY ce.i
    ),
    exact AS (
        SELECT CAST(SUM(e.c * o.c) AS HUGEINT) AS j
        FROM (SELECT user_id AS k, COUNT(*) AS c FROM events GROUP BY user_id) e
        JOIN (SELECT o_custkey AS k, COUNT(*) AS c FROM orders GROUP BY o_custkey) o
          ON e.k = o.k
    )
    SELECT CAST(exact.j AS BIGINT) AS exact_join_size,
           CAST((SELECT MIN(dot) FROM est) AS BIGINT) AS cms_estimate,
           ROUND(CAST((SELECT MIN(dot) FROM est) AS DOUBLE) / exact.j, 6)
               AS overestimate_factor
    FROM exact
    """,
    tags=("A-15", "A-14"),
)
def q218_join_size_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-cardinality estimation by Count-Min sketch inner product:
    |A ⋈ B| on a key equals sum over keys of cA(k)*cB(k), and the CMS
    inner product min_i sum_cell cmsA[i][cell]*cmsB[i][cell] upper-bounds
    it using only the two 256-cell sketches — the estimator a query
    planner (or a pre-join sanity check: "would this fan out 1000x?")
    evaluates WITHOUT touching either fact table, and the classic
    AMS/CMS result that frequency sketches compose beyond point lookups.
    The exact join size rides along so the result certifies sketch build,
    inner product, and the overestimate factor (deterministic because
    the hash family is — collisions are engine-stable).

    Scale shape: each sketch is q115's map-side-combined 256-cell
    aggregate (shuffle volume O(256), independent of row count) and the
    estimate joins two 256-row relations; ONLY the exact-side
    certification pays the real key-keyed join — at 100 TB you run the
    estimator precisely to avoid that join, and the exact leg drops.
    Sketches ADD across shards (A-14), so per-day sketches estimate any
    day-range join size with no rescan."""
    # fan_out was MEASURED AND REJECTED here (r13): the two sketch builds
    # profiled as 1-task stages (0.96 s + 0.80 s), but interleaved A/B at
    # sf0.1 measured the rebalanced variant 2.5x SLOWER end-to-end (3.95s
    # on vs 1.56s off, median of 5, opt_ab_rebalance r13) — the added
    # exchanges broke the scan reuse between the sketch and exact legs and
    # cost more than the serial hashing they spread.
    ev = load(spark, sf_dir, "events").select(F.col("user_id").cast("string").alias("k"))
    orders = load(spark, sf_dir, "orders").select(F.col("o_custkey").cast("string").alias("k"))
    ce = cms_cells(ev, "k")
    co = cms_cells(orders, "k")
    d0 = "decimal(38,0)"
    est = (
        ce.join(co.withColumnRenamed("c", "c2"), ["i", "cell"])
        .groupBy("i")
        .agg(F.sum(F.col("c").cast(d0) * F.col("c2")).cast(d0).alias("dot"))
        .agg(F.min("dot").cast("long").alias("cms_estimate"))
    )
    exact = (
        ev.groupBy("k")
        .agg(F.count(F.lit(1)).alias("c"))
        .join(orders.groupBy("k").agg(F.count(F.lit(1)).alias("c2")), "k")
        .agg(F.sum(F.col("c").cast(d0) * F.col("c2")).cast("long").alias("exact_join_size"))
    )
    return exact.crossJoin(F.broadcast(est)).select(
        "exact_join_size",
        "cms_estimate",
        F.round(
            F.col("cms_estimate").cast("double") / F.col("exact_join_size"), 6
        ).alias("overestimate_factor"),
    )


# ---------------------------------------------------------------------------
# X-11 (cont.): column-entropy encoding advisor
# ---------------------------------------------------------------------------

#: (column name, engine-portable VARCHAR serialization) — typed pinning so
#: the value domain is identical in both engines (doubles go through exact
#: cents / integral casts, never double->string formatting)
_ENTROPY_COLS = (
    ("l_returnflag", "l_returnflag"),
    ("l_linestatus", "l_linestatus"),
    ("l_quantity", "CAST(CAST(l_quantity AS BIGINT) AS {t})"),
    ("l_discount", "CAST(CAST(ROUND(l_discount * 100) AS BIGINT) AS {t})"),
    ("l_tax", "CAST(CAST(ROUND(l_tax * 100) AS BIGINT) AS {t})"),
    ("l_shipdate", "CAST(CAST(l_shipdate AS DATE) AS {t})"),
    ("l_partkey", "CAST(l_partkey AS {t})"),
)

_DICT_NDV_MAX = 4096  #: dictionary-encoding advisor threshold


def _entropy_oracle() -> str:
    sel = " UNION ALL ".join(
        f"SELECT '{name}' AS col_name, {expr.format(t='VARCHAR')} AS val FROM lineitem"
        for name, expr in _ENTROPY_COLS
    )
    return f"""
    WITH long AS ({sel}),
    vc AS (
        SELECT col_name, val, CAST(COUNT(*) AS BIGINT) AS c
        FROM long GROUP BY col_name, val
    ),
    tot AS (
        SELECT col_name, CAST(SUM(c) AS BIGINT) AS n,
               CAST(COUNT(*) AS BIGINT) AS ndv
        FROM vc GROUP BY col_name
    ),
    terms AS (
        SELECT vc.col_name,
               ROUND((CAST(c AS DOUBLE) / n) * log2(CAST(c AS DOUBLE) / n), 9)
                   AS term
        FROM vc JOIN tot ON vc.col_name = tot.col_name
    )
    SELECT t.col_name, t.n, t.ndv,
           ROUND(-CAST(SUM(term) AS DOUBLE), 6) AS entropy_bits,
           ROUND(log2(CAST(t.ndv AS DOUBLE)), 6) AS uniform_bits,
           t.ndv <= {_DICT_NDV_MAX} AS dict_friendly
    FROM terms JOIN tot t ON terms.col_name = t.col_name
    GROUP BY t.col_name, t.n, t.ndv
    ORDER BY t.col_name
    """


@query("q224_column_entropy", oracle=_entropy_oracle(), tags=("X-11", "A-04"))
def q224_column_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column-entropy encoding advisor: per column, the Shannon entropy of
    its value distribution in bits/value next to the uniform bound
    log2(ndv) and a dictionary-encoding flag — the statistic that
    predicts parquet dictionary/RLE win (entropy far below uniform_bits
    = heavy skew = great compression) and the information-content
    companion to X-11's structural profile. Value domains are TYPED to
    engine-portable strings (money as exact cents, dates as ISO days —
    never double->string formatting, which the engines disagree on).

    Determinism: p = c/n divides exact integers, per-value terms
    p*log2(p) round at 9 dp (the q120 cross-libm precedent) and sum as
    exact decimal; the final negate/round and log2(ndv) run on
    bit-identical operands.

    Scale shape: the 7-way stack explode is scan-rooted CPU
    amplification, so fan_out spreads raw rows first (the q113/q193
    discipline); ONE map-side-combined rollup onto the (col, value)
    relation — bounded by the value domains, not the table; per-column
    totals derive from that relation and broadcast back; the report is
    7 rows."""
    li = fan_out(load(spark, sf_dir, "lineitem"))
    # one scan: each row explodes map-only into its 7 (col, val) legs —
    # a per-leg unionAll re-scans (and re-fans) the table once per column
    # (measured 2.3 s vs 1.1 s at sf0.1)
    legs = F.array(
        *[
            F.struct(
                F.lit(name).alias("col_name"),
                F.expr(expr.format(t="STRING")).alias("val"),
            )
            for name, expr in _ENTROPY_COLS
        ]
    )
    longf = li.select(F.explode(legs).alias("s")).select("s.*")
    vc = longf.groupBy("col_name", "val").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    vc = vc.transform(stage)  # feeds totals AND terms
    tot = vc.groupBy("col_name").agg(
        F.sum("c").cast("long").alias("n"), F.count(F.lit(1)).cast("long").alias("ndv")
    )
    p = F.col("c").cast("double") / F.col("n")
    terms = vc.join(F.broadcast(tot), "col_name").select(
        "col_name", "n", "ndv", F.round(p * F.log2(p), 9).alias("term")
    )
    return (
        terms.groupBy("col_name", "n", "ndv")
        .agg(
            F.round(-F.sum(F.col("term").cast("decimal(28,9)")).cast("double"), 6).alias(
                "entropy_bits"
            )
        )
        .select(
            "col_name",
            "n",
            "ndv",
            "entropy_bits",
            F.round(F.log2(F.col("ndv").cast("double")), 6).alias("uniform_bits"),
            (F.col("ndv") <= _DICT_NDV_MAX).alias("dict_friendly"),
        )
        .transform(pin)
        .orderBy("col_name")
    )


@query(
    "q240_histogram_overlap",
    oracle=f"""
    WITH c AS (
        SELECT CASE WHEN event_id % 2 = 0 THEN 'A' ELSE 'B' END AS half,
               CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS c
        FROM events
    ),
    u AS (
        SELECT half, c,
               CAST(power(10, greatest(length(CAST(c AS VARCHAR)) - {_HDR_DIGITS}, 0))
                    AS BIGINT) AS unit
        FROM c
    ),
    b AS (
        SELECT half, (c // unit) * unit AS lb, CAST(COUNT(*) AS BIGINT) AS cnt
        FROM u GROUP BY half, (c // unit) * unit
    ),
    tot AS (SELECT half, CAST(SUM(cnt) AS BIGINT) AS n FROM b GROUP BY half),
    wide AS (
        SELECT lb,
               MAX(CASE WHEN b.half = 'A' THEN cnt ELSE 0 END) AS ca,
               MAX(CASE WHEN b.half = 'B' THEN cnt ELSE 0 END) AS cb
        FROM b GROUP BY lb
    ),
    terms AS (
        SELECT ROUND(LEAST(
                   CAST(ca AS DOUBLE) / (SELECT n FROM tot WHERE half = 'A'),
                   CAST(cb AS DOUBLE) / (SELECT n FROM tot WHERE half = 'B')
               ), 9) AS t
        FROM wide
    )
    SELECT (SELECT n FROM tot WHERE half = 'A') AS n_a,
           (SELECT n FROM tot WHERE half = 'B') AS n_b,
           CAST((SELECT COUNT(*) FROM wide) AS BIGINT) AS n_buckets,
           ROUND(CAST(SUM(CAST(t AS DECIMAL(28,9))) AS DOUBLE), 6) AS overlap
    FROM terms
    """,
    tags=("X-40", "A-14"),
)
def q240_histogram_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-overlap coefficient between two event-stream halves,
    computed ON THE X-40 SKETCH: overlap = sum over buckets of
    min(p_A, p_B) in [0, 1] (1 = identical distributions) — the
    distribution-similarity read that q120's PSI and q148's KS answer
    with test statistics, here as the intuitive shared-mass number, and
    the payoff of sketch mergeability: two pipelines exchange 10^2-row
    histograms, never samples, to compare distributions. Halves are
    hash-assigned (event parity), so the expected overlap is ~1 and the
    deviation measures sketch-resolution granularity.

    Determinism: bucket counts exact integers; each min() compares two
    exact-operand double divisions; terms round 9 dp then decimal-sum
    (the q120 discipline), final round 6.

    Scale shape: ONE map-side-combined rollup onto the bounded
    (half x buckets) histogram; the pivot, totals, and overlap all run
    on that bounded relation — one scalar row out."""
    ev = load(spark, sf_dir, "events")
    half = F.when(F.col("event_id") % 2 == 0, "A").otherwise("B")
    c = ev.select(
        half.alias("half"),
        (F.col("value").cast("decimal(18,2)") * 100).cast("long").alias("c"),
    )
    u = c.withColumn(
        "unit",
        F.pow(
            F.lit(10.0),
            F.greatest(
                F.length(F.col("c").cast("string")) - _HDR_DIGITS, F.lit(0)
            ).cast("double"),
        ).cast("long"),
    )
    b = (
        u.select("half", F.expr("(c DIV unit) * unit").alias("lb"))
        .groupBy("half", "lb")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
        .transform(stage)  # bounded histogram feeds totals AND the pivot
    )
    tot = b.groupBy("half").agg(F.sum("cnt").cast("long").alias("n"))
    na = tot.filter(F.col("half") == "A").select(F.col("n").alias("n_a"))
    nb = tot.filter(F.col("half") == "B").select(F.col("n").alias("n_b"))
    wide = b.groupBy("lb").agg(
        F.max(F.when(F.col("half") == "A", F.col("cnt")).otherwise(0))
        .cast("long")
        .alias("ca"),
        F.max(F.when(F.col("half") == "B", F.col("cnt")).otherwise(0))
        .cast("long")
        .alias("cb"),
    )
    terms = (
        wide.crossJoin(F.broadcast(na))
        .crossJoin(F.broadcast(nb))
        .select(
            "n_a",
            "n_b",
            F.round(
                F.least(
                    F.col("ca").cast("double") / F.col("n_a"),
                    F.col("cb").cast("double") / F.col("n_b"),
                ),
                9,
            ).alias("t"),
        )
    )
    return terms.groupBy("n_a", "n_b").agg(
        F.count(F.lit(1)).cast("long").alias("n_buckets"),
        F.round(F.sum(F.col("t").cast("decimal(28,9)")).cast("double"), 6).alias(
            "overlap"
        ),
    ).select("n_a", "n_b", "n_buckets", "overlap")


# ---------------------------------------------------------------------------
# X-47: functional-dependency & candidate-key discovery
# ---------------------------------------------------------------------------

#: (table, determinant columns, dependent column) — the audit suite mixes
#: true keys (o_orderkey), composite keys (orderkey+linenumber), and
#: deliberately false dependencies so both verdicts are exercised.
_FD_SUITE = (
    ("customer", ("c_mktsegment",), "c_nationkey"),
    ("lineitem", ("l_orderkey", "l_linenumber"), "l_partkey"),
    ("lineitem", ("l_partkey",), "l_extendedprice"),
    ("orders", ("o_custkey",), "o_orderpriority"),
    ("orders", ("o_orderkey",), "o_custkey"),
)


def _fd_label(tbl: str, det: tuple[str, ...], dep: str) -> str:
    return f"{tbl}: {' + '.join(det)} -> {dep}"


def _fd_oracle() -> str:
    branches = []
    for tbl, det, dep in _FD_SUITE:
        det_cols = ", ".join(det)
        branches.append(
            f"""
        SELECT '{_fd_label(tbl, det, dep)}' AS fd,
               CAST(COUNT(*) AS BIGINT) AS n_groups,
               CAST(COUNT(CASE WHEN nd > 1 THEN 1 END) AS BIGINT)
                   AS violating_groups
        FROM (SELECT {det_cols}, COUNT(DISTINCT {dep}) AS nd
              FROM {tbl} GROUP BY {det_cols})"""
        )
    union = " UNION ALL ".join(branches)
    return f"""
    SELECT fd, n_groups, violating_groups,
           violating_groups = 0 AS holds
    FROM ({union})
    ORDER BY fd
    """


@query("q243_fd_discovery", oracle=_fd_oracle(), tags=("X-47", "A-04"))
def q243_fd_discovery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Functional-dependency / candidate-key audit (Metanome-style FD
    validation, scoped to a declared candidate suite): for each tested
    `determinant -> dependent` pair, the number of determinant groups, the
    groups holding more than one distinct dependent value (violations),
    and the verdict — how a schema-inference or data-contract layer decides
    which "keys" the data actually honors.  The suite mixes a true key
    (o_orderkey), a composite key (l_orderkey+l_linenumber), and
    dependencies expected to FAIL, so both verdicts are exercised and a
    regression in either direction flips a row.

    Scale shape: each FD is ONE two-phase aggregate over a 2-3 column
    pruned projection (partial count-distinct map-side, one shuffle on the
    determinant), reduced to a SINGLE summary row before the 5-row union —
    no full-table data ever crosses more than one exchange, and the
    branches are independent scans that a scheduler runs concurrently.
    Exhaustive lattice search (all column pairs) would be Expand-based;
    the declared-suite form is what a 100 TB contract check actually runs."""
    branches = []
    for tbl, det, dep in _FD_SUITE:
        grouped = (
            load(spark, sf_dir, tbl)
            .select(*det, dep)
            .groupBy(*det)
            .agg(F.countDistinct(dep).alias("nd"))
            .agg(
                F.count(F.lit(1)).cast("long").alias("n_groups"),
                F.count(F.when(F.col("nd") > 1, 1)).cast("long").alias("violating_groups"),
            )
            .select(F.lit(_fd_label(tbl, det, dep)).alias("fd"), "n_groups", "violating_groups")
        )
        branches.append(grouped)
    out = branches[0]
    for b in branches[1:]:
        out = out.unionByName(b)
    return (
        out.withColumn("holds", F.col("violating_groups") == F.lit(0))
        .transform(pin)
        .orderBy("fd")
    )


# ---------------------------------------------------------------------------
# X-48: heavy-tail (power-law) fit of the per-user activity distribution
# ---------------------------------------------------------------------------

_PL_ORACLE = """
    WITH c AS (
        SELECT user_id, CAST(COUNT(*) AS BIGINT) AS c FROM events GROUP BY user_id
    ),
    m AS (SELECT CAST(2 * quantile_cont(c, 0.5) AS BIGINT) AS m2 FROM c),
    s AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_users, MAX(c) AS max_count FROM c),
    t AS (
        SELECT m2, ROUND(ln(CAST(c AS DOUBLE) / ((m2 - 1) / 2.0)), 6) AS t
        FROM c, m WHERE 2 * c >= m2
    ),
    ta AS (
        SELECT m2, CAST(COUNT(*) AS BIGINT) AS n_tail,
               CAST(SUM(CAST(t AS DECIMAL(28,6))) * 1000000 AS BIGINT) AS s6
        FROM t GROUP BY m2
    )
    SELECT n_users, max_count, CAST(m2 AS DOUBLE) / 2 AS xmin, n_tail,
           CASE WHEN s6 > 0 THEN
               1.0 + CAST(n_tail * 1000000000000000 // s6 AS DOUBLE) / 1000000000
           END AS alpha,
           n_tail * 1000000000 // n_users AS tail_share_ppb
    FROM ta, s
"""


@query("q244_powerlaw_tail", oracle=_PL_ORACLE, tags=("X-48", "A-12"))
def q244_powerlaw_tail(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Discrete power-law tail fit of the per-user event-count distribution:
    the Clauset-Shalizi-Newman continuous-MLE estimator
    alpha = 1 + n / sum(ln(x / (xmin - 1/2))) over the tail x >= xmin, with
    xmin pinned to the corpus median so the statistic is scale-factor-free.
    One row: population size, max activity, xmin, tail size/share, alpha —
    the heavy-tail health check behind sampling budgets, skew-join
    salting decisions, and per-user rate limits (alpha near 2 = extreme
    concentration; large alpha = near-uniform load).

    Determinism: the median rides the A-12 exact-percentile path (bit-equal
    to quantile_cont, q75) and is carried as the INTEGER 2*median; each ln
    term runs on identical IEEE operands and is rounded at 6 dp (the
    q183/q203 idiom), summed as exact decimal; the final 1 + n/S division
    is the nano-unit integer floor-div, so no float accumulation anywhere.
    BIGINT headroom: n_tail * 10^15 overflows past ~9e3 users-in-tail —
    at production population sizes widen to DECIMAL(38,0), same idiom.

    Scale shape: one shuffle keyed by user (map-side combined count), then
    the bounded count relation is staged once and reused by three
    single-row aggregates (median, stats, tail sum) that cross-broadcast
    into the final row. Nothing wider than (user_id, count) ever moves."""
    counts = (
        load(spark, sf_dir, "events")
        .select("user_id")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
        .transform(stage)  # reused by median + stats + tail
    )
    med = counts.agg(F.expr("CAST(2 * percentile(c, 0.5) AS BIGINT)").alias("m2"))
    stats = counts.agg(
        F.count(F.lit(1)).cast("long").alias("n_users"),
        F.max("c").alias("max_count"),
    )
    tail = (
        counts.crossJoin(F.broadcast(med))
        .filter(2 * F.col("c") >= F.col("m2"))
        .select(
            "m2",
            F.round(F.log(F.col("c").cast("double") / F.expr("(m2 - 1) / 2.0")), 6).alias("t"),
        )
        .groupBy("m2")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_tail"),
            F.expr("CAST(sum(CAST(t AS DECIMAL(28,6))) * 1000000 AS BIGINT)").alias("s6"),
        )
    )
    return (
        tail.crossJoin(F.broadcast(stats))
        .select(
            "n_users",
            "max_count",
            (F.col("m2").cast("double") / 2).alias("xmin"),
            "n_tail",
            F.when(
                F.col("s6") > 0,
                F.lit(1.0)
                + F.expr("CAST(n_tail * 1000000000000000 DIV s6 AS DOUBLE)") / 1e9,
            ).alias("alpha"),
            F.expr("n_tail * 1000000000 DIV n_users").alias("tail_share_ppb"),
        )
    )


# ---------------------------------------------------------------------------
# X-69: Cramér's V categorical-association matrix
# ---------------------------------------------------------------------------

#: fixed value bands making `value` a third categorical: <50, [50,200), >=200
_V_BAND = "CASE WHEN value < 50 THEN 'low' WHEN value < 200 THEN 'mid' ELSE 'high' END"

_CRAMER_PAIR = """
        SELECT '{a}' AS col_x, '{b}' AS col_y, {a} AS vx, {b} AS vy,
               CAST(SUM(o) AS BIGINT) AS o
        FROM joint GROUP BY 3, 4
"""

_CRAMER_ORACLE = f"""
    WITH joint AS (
        SELECT event_type,
               CAST(dayofweek(ts) + 1 AS INT) AS dow,
               {_V_BAND} AS band,
               CAST(COUNT(*) AS BIGINT) AS o
        FROM events GROUP BY 1, 2, 3
    ),
    cells AS (
        SELECT col_x, col_y, CAST(vx AS VARCHAR) AS vx, CAST(vy AS VARCHAR) AS vy, o
        FROM ({_CRAMER_PAIR.format(a="event_type", b="dow")}) p1
        UNION ALL
        SELECT col_x, col_y, CAST(vx AS VARCHAR), CAST(vy AS VARCHAR), o
        FROM ({_CRAMER_PAIR.format(a="event_type", b="band")}) p2
        UNION ALL
        SELECT col_x, col_y, CAST(vx AS VARCHAR), CAST(vy AS VARCHAR), o
        FROM ({_CRAMER_PAIR.format(a="dow", b="band")}) p3
    ),
    r AS (SELECT col_x, col_y, vx, CAST(SUM(o) AS BIGINT) AS r
          FROM cells GROUP BY 1, 2, 3),
    c AS (SELECT col_x, col_y, vy, CAST(SUM(o) AS BIGINT) AS c
          FROM cells GROUP BY 1, 2, 3),
    t AS (SELECT col_x, col_y, CAST(SUM(o) AS BIGINT) AS t,
                 COUNT(DISTINCT vx) AS nr, COUNT(DISTINCT vy) AS nc
          FROM cells GROUP BY 1, 2),
    terms AS (
        SELECT cells.col_x, cells.col_y, nr, nc, t,
               ROUND(CAST((CAST(o AS HUGEINT) * t - CAST(r.r AS HUGEINT) * c.c)
                          * (CAST(o AS HUGEINT) * t - CAST(r.r AS HUGEINT) * c.c)
                          AS DOUBLE)
                     / CAST(CAST(r.r AS HUGEINT) * c.c * t AS DOUBLE), 9) AS term
        FROM cells
        JOIN r USING (col_x, col_y, vx)
        JOIN c USING (col_x, col_y, vy)
        JOIN t USING (col_x, col_y)
    ),
    chi AS (
        SELECT col_x, col_y, t AS n,
               CAST((nr - 1) * (nc - 1) AS BIGINT) AS dof,
               ROUND(CAST(SUM(CAST(term AS DECIMAL(28,9))) AS DOUBLE), 6) AS chi2,
               CAST(t * least(nr - 1, nc - 1) AS BIGINT) AS vden
        FROM terms GROUP BY 1, 2, 3, 4, 6
    )
    SELECT col_x, col_y, n, dof, chi2,
           ROUND(sqrt(chi2 / vden), 6) AS cramers_v
    FROM chi
    ORDER BY col_x, col_y
"""


@query("q265_cramers_v", oracle=_CRAMER_ORACLE, tags=("X-69", "X-22", "A-01"))
def q265_cramers_v(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cramér's V association matrix over the categorical columns of the
    event stream (event_type x day-of-week x a fixed value band): every
    pair's chi-square normalized to V = sqrt(chi2 / (n * min(r-1, c-1)))
    in [0, 1] — the categorical twin of q122's Pearson matrix and the
    profiler readout that ranks WHICH column pairs are dependent
    (q210 tests one pair; V makes pairs comparable across cardinalities).

    Determinism: every chi-square term is a ratio of exact integer
    products rounded at 9 dp into a decimal sum (the q210 idiom); V is
    one IEEE sqrt+divide on the ROUNDED chi2 and an exact integer
    denominator, rounded at 6 dp.

    Scale shape: ONE map-side-combined fact rollup reduces events to the
    bounded |types| x 7 x 3 joint table; all three pairwise
    marginalizations, their marginals, and the term joins run on that
    staged bounded relation (never a second fact scan); 3 rows out."""
    band = (
        F.when(F.col("value") < 50, "low")
        .when(F.col("value") < 200, "mid")
        .otherwise("high")
    )
    joint = (
        load(spark, sf_dir, "events")
        .groupBy(
            F.col("event_type"),
            F.dayofweek("ts").alias("dow"),
            band.alias("band"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("o"))
        .transform(stage)  # all three pair marginalizations read it
    )
    cells = None
    for ca, cb in (("event_type", "dow"), ("event_type", "band"), ("dow", "band")):
        part = joint.groupBy(
            F.lit(ca).alias("col_x"),
            F.lit(cb).alias("col_y"),
            F.col(ca).cast("string").alias("vx"),
            F.col(cb).cast("string").alias("vy"),
        ).agg(F.sum("o").cast("long").alias("o"))
        cells = part if cells is None else cells.unionAll(part)
    cells = cells.transform(stage)  # marginals + terms read the bounded cells
    r = cells.groupBy("col_x", "col_y", "vx").agg(F.sum("o").cast("long").alias("r"))
    c = cells.groupBy("col_x", "col_y", "vy").agg(F.sum("o").cast("long").alias("c"))
    t = cells.groupBy("col_x", "col_y").agg(
        F.sum("o").cast("long").alias("t"),
        F.count_distinct("vx").alias("nr"),
        F.count_distinct("vy").alias("nc"),
    )
    d0 = "decimal(38,0)"
    num = F.col("o").cast(d0) * F.col("t") - F.col("r").cast(d0) * F.col("c")
    den = (F.col("r").cast(d0) * F.col("c") * F.col("t")).cast(d0)
    terms = (
        cells.join(F.broadcast(r), ["col_x", "col_y", "vx"])
        .join(F.broadcast(c), ["col_x", "col_y", "vy"])
        .join(F.broadcast(t), ["col_x", "col_y"])
        .select(
            "col_x",
            "col_y",
            "nr",
            "nc",
            "t",
            F.round((num * num).cast("double") / den.cast("double"), 9).alias("term"),
        )
    )
    chi = terms.groupBy(
        "col_x",
        "col_y",
        F.col("t").alias("n"),
        ((F.col("nr") - 1) * (F.col("nc") - 1)).cast("long").alias("dof"),
        (F.col("t") * F.least(F.col("nr") - 1, F.col("nc") - 1))
        .cast("long")
        .alias("vden"),
    ).agg(
        F.round(F.sum(F.col("term").cast("decimal(28,9)")).cast("double"), 6).alias(
            "chi2"
        )
    )
    return (
        chi.select(
            "col_x",
            "col_y",
            "n",
            "dof",
            "chi2",
            F.round(F.sqrt(F.col("chi2") / F.col("vden")), 6).alias("cramers_v"),
        )
        .transform(pin)
        .orderBy("col_x", "col_y")
    )


# ---------------------------------------------------------------------------
# A-13 extension: KMV (k-minimum-values) distinct sketch with accuracy audit
# ---------------------------------------------------------------------------

from .audit import _nibble_int  # noqa: E402  (48-bit md5 int, shared idiom)

_KMV_K = 32
_HASH_SPACE = 1 << 48  #: _nibble_int keeps md5's first 12 nibbles


@query(
    "q339_kmv_distinct_sketch",
    oracle=f"""
    WITH hashed AS (
        SELECT event_type,
               {_nibble_int("md5(CAST(user_id AS VARCHAR))")} AS h
        FROM events GROUP BY event_type, user_id
    ),
    uniq AS (SELECT event_type, h FROM hashed GROUP BY event_type, h),
    ranked AS (
        SELECT event_type, h,
               ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY h) AS rn
        FROM uniq
    ),
    sk AS (
        SELECT event_type, MAX(h) AS h_k,
               CAST(COUNT(*) AS BIGINT) AS n_in_sketch
        FROM ranked WHERE rn <= {_KMV_K} GROUP BY event_type
    ),
    ex AS (
        SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_exact
        FROM uniq GROUP BY event_type
    )
    SELECT ex.event_type, ex.n_exact,
           CAST(CASE WHEN sk.n_in_sketch < {_KMV_K} THEN sk.n_in_sketch
                ELSE ({_KMV_K - 1} * {_HASH_SPACE}) // sk.h_k
                END AS BIGINT) AS n_kmv,
           CAST(ABS(CASE WHEN sk.n_in_sketch < {_KMV_K} THEN sk.n_in_sketch
                    ELSE ({_KMV_K - 1} * {_HASH_SPACE}) // sk.h_k
                    END - ex.n_exact) AS BIGINT) AS abs_err
    FROM ex JOIN sk USING (event_type)
    ORDER BY event_type
    """,
    tags=("A-13", "A-14"),
)
def q339_kmv_distinct_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV (k-minimum-values) distinct-count sketch per event type, with
    its accuracy against the exact count in the same readout: keep each
    group's k=32 smallest 48-bit value hashes; the k-th smallest h_k
    estimates the cardinality as (k-1)·2^48 / h_k (uniform order
    statistics), EXACT when the group holds fewer than k values. The
    third mergeable-sketch family beside A-13's HLL (q90) and A-15's
    Count-Min (q115) — KMV is the one that also supports set
    INTERSECTION estimates (q188's overlap machinery) and, unlike HLL,
    its estimate here is pure integer arithmetic: (k-1)·2^48 div h_k,
    no libm anywhere, so the sketch value is engine-exact by
    construction rather than by rounding convention.

    Determinism: the hash domain is md5's first 12 nibbles (the q164
    48-bit idiom, identical SQL in both engines); estimate and error are
    exact integer div/abs.

    Scale shape: the fact reduces map-side to distinct (type, user) then
    distinct (type, h); the rank<=k filter over the per-type window is
    the WindowGroupLimit pattern — Spark 4 pushes the limit into a
    per-partition partial top-k BEFORE the exchange, so only ~k rows per
    partition per group shuffle. The k-minimum set is a commutative
    mergeable partial (union's k smallest = k smallest of each side's k
    smallest — A-14), so per-shard sketches roll up without rescanning;
    that merge is exactly how this sketch runs across 1000 executors.

    Reference parity: beyond-reference; extends A-13 (q90 HLL rollup) and
    the sketch-accuracy scorecard (q200 HDR bound, q218 CMS product,
    q238 MinHash agreement)."""
    ev = load(spark, sf_dir, "events")
    uniq = (
        ev.groupBy("event_type", "user_id")
        .agg(F.count(F.lit(1)).alias("_n"))
        .select(
            "event_type",
            F.expr(_nibble_int("md5(CAST(user_id AS string))")).alias("h"),
        )
        .groupBy("event_type", "h")
        .agg(F.count(F.lit(1)).alias("_c"))
        .select("event_type", "h")
        .transform(stage)  # exact leg + sketch leg share one build
    )
    ranked = uniq.withColumn(
        "rn", F.row_number().over(Window.partitionBy("event_type").orderBy("h"))
    )
    sk = (
        ranked.filter(F.col("rn") <= _KMV_K)
        .groupBy("event_type")
        .agg(
            F.max("h").alias("h_k"),
            F.count(F.lit(1)).cast("long").alias("n_in_sketch"),
        )
    )
    ex = uniq.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_exact")
    )
    est = F.when(
        F.col("n_in_sketch") < _KMV_K, F.col("n_in_sketch")
    ).otherwise(
        F.expr(f"{_KMV_K - 1} * {_HASH_SPACE}L div h_k")
    ).cast("long")
    return (
        ex.join(sk, "event_type")
        .withColumn("n_kmv", est)
        .withColumn(
            "abs_err", F.abs(F.col("n_kmv") - F.col("n_exact")).cast("long")
        )
        .select("event_type", "n_exact", "n_kmv", "abs_err")
        .transform(pin)
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# X-14 (cont.): join-order advisor from key-count profiles
# ---------------------------------------------------------------------------

_JOA_ORACLE = """
    WITH ol AS (
        SELECT CAST(SUM(o.n * l.n) AS BIGINT) AS sz FROM
            (SELECT o_orderkey AS k, CAST(COUNT(*) AS BIGINT) AS n
             FROM orders GROUP BY 1) o
        JOIN
            (SELECT l_orderkey AS k, CAST(COUNT(*) AS BIGINT) AS n
             FROM lineitem GROUP BY 1) l
        USING (k)
    ),
    oc AS (
        SELECT CAST(SUM(o.n * c.n) AS BIGINT) AS sz FROM
            (SELECT o_custkey AS k, CAST(COUNT(*) AS BIGINT) AS n
             FROM orders GROUP BY 1) o
        JOIN
            (SELECT c_custkey AS k, CAST(COUNT(*) AS BIGINT) AS n
             FROM customer GROUP BY 1) c
        USING (k)
    ),
    plans AS (
        SELECT '(orders JOIN lineitem) JOIN customer' AS join_order,
               (SELECT sz FROM ol) AS intermediate_rows
        UNION ALL
        SELECT '(orders JOIN customer) JOIN lineitem' AS join_order,
               (SELECT sz FROM oc) AS intermediate_rows
    )
    SELECT join_order, intermediate_rows,
           CAST(CASE WHEN intermediate_rows =
                     (SELECT MIN(intermediate_rows) FROM plans)
                THEN 1 ELSE 0 END AS BIGINT) AS recommended
    FROM plans ORDER BY join_order
"""


@query("q356_join_order_advisor", oracle=_JOA_ORACLE, tags=("X-14", "A-02"))
def q356_join_order_advisor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-order advisor: for the customer-orders-lineitem chain, the
    EXACT intermediate-result size of each legal first join (|A join B|
    on a key = sum over keys of cA(k)*cB(k)), and the recommendation —
    the cost-based-optimizer decision made visible as a query, computed
    entirely from (key, count) PROFILES so no fact row is ever joined.
    q218 estimates ONE join's size from sketches; this compares the
    orders of a multi-join and picks (Catalyst reorders joins from
    statistics exactly like this; when AQE lacks stats, THIS is the
    query a data engineer runs before hand-ordering a 100 TB join).

    Determinism: exact integer products and sums; the recommendation is
    an exact integer argmin (ties recommend both, deterministically).

    Scale shape: each profile is ONE map-side-combined (key, count)
    rollup — shuffle volume O(|keys|), never fact-payload; the size
    computation joins count relations only; the plan comparison runs on
    2 rows. Profiles are A-14-mergeable across shards/days.

    Reference parity: beyond-reference; completes the planner-diagnostic
    family (q119 fan-out profile, q218 CMS estimate, q329 partition
    advisor, q348 encoding advisor)."""
    o_by_ok = (
        load(spark, sf_dir, "orders")
        .groupBy(F.col("o_orderkey").alias("k"))
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    l_by_ok = (
        load(spark, sf_dir, "lineitem")
        .groupBy(F.col("l_orderkey").alias("k"))
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    o_by_ck = (
        load(spark, sf_dir, "orders")
        .groupBy(F.col("o_custkey").alias("k"))
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    c_by_ck = (
        load(spark, sf_dir, "customer")
        .groupBy(F.col("c_custkey").alias("k"))
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )

    def size(a: DataFrame, b: DataFrame) -> DataFrame:
        an = a.select("k", F.col("n").alias("na"))
        bn = b.select("k", F.col("n").alias("nb"))
        return an.join(bn, "k").agg(
            F.sum(F.col("na") * F.col("nb")).cast("long").alias("sz")
        )

    ol = size(o_by_ok, l_by_ok).select(
        F.lit("(orders JOIN lineitem) JOIN customer").alias("join_order"),
        F.col("sz").alias("intermediate_rows"),
    )
    oc = size(o_by_ck, c_by_ck).select(
        F.lit("(orders JOIN customer) JOIN lineitem").alias("join_order"),
        F.col("sz").alias("intermediate_rows"),
    )
    plans = ol.unionByName(oc)
    w_all = Window.partitionBy()  # bounded: exactly 2 plan rows
    return (
        plans.withColumn(
            "recommended",
            (F.col("intermediate_rows") == F.min("intermediate_rows").over(w_all))
            .cast("long"),
        )
        .transform(pin)
        .orderBy("join_order")
    )


# ---------------------------------------------------------------------------
# X-11 (cont.): dataset card (one datasheet row per warehouse table)
# ---------------------------------------------------------------------------

#: per table: (primary key column, time column or None) — the card's
#: declared metadata inputs
_CARD = {
    "region": ("r_regionkey", None),
    "nation": ("n_nationkey", None),
    "supplier": ("s_suppkey", None),
    "part": ("p_partkey", None),
    "customer": ("c_custkey", None),
    "orders": ("o_orderkey", "o_orderdate"),
    "lineitem": ("l_orderkey", "l_shipdate"),
    "events": ("event_id", "ts"),
    "documents": ("doc_id", None),
    "embeddings": ("vec_id", None),
}


def _card_leg_oracle(t: str, key: str, ts: str | None) -> str:
    newest = (
        f"CAST(FLOOR(epoch(MAX({ts}))) AS BIGINT) // 86400"
        if ts
        else "CAST(NULL AS BIGINT)"
    )
    return f"""
    SELECT '{t}' AS table_name,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(DISTINCT {key}) AS BIGINT) AS key_ndv,
           CAST(CASE WHEN COUNT(*) = COUNT(DISTINCT {key}) THEN 1 ELSE 0 END
                AS BIGINT) AS key_unique,
           {newest} AS newest_day
    FROM {t}"""


@query(
    "q381_dataset_card",
    oracle=" UNION ALL ".join(
        _card_leg_oracle(t, k, ts) for t, (k, ts) in _CARD.items()
    )
    + " ORDER BY table_name",
    tags=("X-11", "X-24"),
)
def q381_dataset_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dataset card: one datasheet row per warehouse table — row count,
    declared-key cardinality and uniqueness verdict, and the newest day
    for time-bearing tables — the 'datasheets for datasets' summary a
    catalog renders on every table page and the one-glance diff between
    two environments (staging card vs prod card = q343/q380 told at
    table granularity). Composes the engine's audits (q353 uniqueness,
    q223 freshness) into the publishable artifact.

    Determinism: counts exact; newest day exact epoch days; timeless
    tables carry NULL identically.

    Scale shape: ONE ungrouped map-side-combined aggregate per table
    (count-distinct rides the scan's Expand), one row each — the whole
    card costs 10 footer-friendly scans and 10 rows, A-14-mergeable so
    per-shard cards roll up.

    Reference parity: beyond-reference; the catalog-layer capstone of
    X-11's profiling family."""
    legs = []
    for t, (key, ts) in _CARD.items():
        df = load(spark, sf_dir, t)
        newest = (
            (F.unix_timestamp(F.date_trunc("day", F.max(ts))) / F.lit(86400))
            .cast("long")
            if ts
            else F.lit(None).cast("long")
        )
        legs.append(
            df.agg(
                F.count(F.lit(1)).cast("long").alias("n_rows"),
                F.countDistinct(key).cast("long").alias("key_ndv"),
                newest.alias("newest_day"),
            ).select(
                F.lit(t).alias("table_name"),
                "n_rows",
                "key_ndv",
                (F.col("n_rows") == F.col("key_ndv")).cast("long").alias(
                    "key_unique"
                ),
                "newest_day",
            )
        )
    out = legs[0]
    for leg in legs[1:]:
        out = out.unionByName(leg)
    return out.transform(pin).orderBy("table_name")


# ---------------------------------------------------------------------------
# X-11 (cont.): row-size profile (storage capacity planning)
# ---------------------------------------------------------------------------


@query(
    "q384_row_size_profile",
    oracle="""
    WITH sized AS (
        SELECT lang, CAST(strlen(text) AS BIGINT) AS b FROM documents
    )
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(b) AS BIGINT) AS total_bytes,
           CAST(MIN(b) AS BIGINT) AS min_bytes,
           quantile_cont(b, 0.5) AS p50_bytes,
           quantile_cont(b, 0.95) AS p95_bytes,
           CAST(MAX(b) AS BIGINT) AS max_bytes
    FROM sized GROUP BY lang ORDER BY lang
    """,
    tags=("X-11", "A-12"),
)
def q384_row_size_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-size profile of the document corpus per language: payload
    byte percentiles (p50/p95), min/max, and exact totals — the
    capacity-planning numbers behind every storage / shuffle-partition
    / maxPartitionBytes decision (q190's compaction bins and q329's
    partition advisor both presuppose someone knows the byte
    distribution; this measures it). p95 >> p50 is the long-document
    skew that makes per-ROW batch sizing wrong for Arrow UDFs — the
    practical reason X-04's chunking (q73) exists.

    Determinism: byte length is exact UTF-8 bytes in both engines (Spark octet_length ≡ DuckDB strlen);
    percentiles are the q75-certified exact interpolation; sums exact.

    Scale shape: byte lengths are map-only; ONE map-side-combined
    rollup per language with exact grouped percentiles (A-12). At
    100 TB the same numbers come from parquet footer statistics first,
    with this scan as the ground-truth calibration.

    Reference parity: beyond-reference; extends X-11 profiling to the
    physical-bytes dimension."""
    sized = load(spark, sf_dir, "documents").select(
        "lang", F.octet_length("text").cast("long").alias("b")
    )
    return (
        sized.groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("b").cast("long").alias("total_bytes"),
            F.min("b").cast("long").alias("min_bytes"),
            F.expr("percentile(b, 0.5)").alias("p50_bytes"),
            F.expr("percentile(b, 0.95)").alias("p95_bytes"),
            F.max("b").cast("long").alias("max_bytes"),
        )
        .transform(pin)
        .orderBy("lang")
    )


# ---------------------------------------------------------------------------
# X-134: exact percentile by two-pass histogram refinement
# ---------------------------------------------------------------------------

_REFINE_W = 1024  #: coarse bucket width (cents) for pass A

_REFINE_ORACLE = f"""
    WITH pv AS (
        SELECT CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS v
        FROM events WHERE event_type = 'purchase'
    ),
    tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS nn FROM pv),
    t(p) AS (VALUES (CAST(0.5 AS DOUBLE)), (CAST(0.95 AS DOUBLE))),
    ks AS (
        SELECT p, nn, CAST(CEIL(p * nn) AS BIGINT) AS k
        FROM t CROSS JOIN tot
    ),
    cnt AS (SELECT v, CAST(COUNT(*) AS BIGINT) AS m FROM pv GROUP BY v),
    c AS (
        SELECT v, CAST(SUM(m) OVER (ORDER BY v) AS BIGINT) AS cum FROM cnt
    ),
    pick AS (
        SELECT ks.p, ks.nn, ks.k, MIN(c.v) AS value_cents
        FROM ks JOIN c ON c.cum >= ks.k
        GROUP BY 1, 2, 3
    )
    SELECT p, nn AS n, k, value_cents // {_REFINE_W} AS bucket, value_cents
    FROM pick
    ORDER BY p
"""


@query("q409_percentile_refinement", oracle=_REFINE_ORACLE, tags=("X-134", "A-12"))
def q409_percentile_refinement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT p50/p95 of purchase cents by TWO-PASS HISTOGRAM REFINEMENT —
    the unbounded-domain scale path for exact order statistics: pass A
    rolls the fact map-side onto coarse width-1024 buckets and locates,
    per target rank k = ceil(p*n), the ONE bucket whose cumulative count
    crosses k; pass B re-scans only rows in the target buckets and takes
    the exact k-th value inside. Neither pass sorts the fact and no
    relation proportional to the number of DISTINCT VALUES is ever
    windowed — which is exactly where q151/q75's compressed-value
    cumulative window stops scaling when the domain is wide (64-bit ids,
    microsecond latencies): this dataflow's intermediate state is
    (domain/1024) bucket counts + two bucket-loads of rows, and extra
    refinement rounds multiply precision, not passes over history.

    The ORACLE is the direct definition (cumulative window over distinct
    values, min v with cum >= k) — certifying algorithm == definition,
    the q250/q286 'clever plan vs naive spec' pattern. The found bucket
    is re-derived in the oracle as value div 1024, which the refinement
    must agree with by construction.

    Determinism: k = ceil(p*n) is one IEEE multiply+ceil of identical
    operands; counts and cumulative counts are exact integers; the k-th
    value is an exact order statistic (no interpolation — the q387
    lesson).

    Reference parity: beyond-reference; joins X-40's mergeable HDR sketch
    (approximate, one pass) as the exact-two-pass alternative."""
    cents = (F.col("value").cast("decimal(18,2)") * 100).cast("long")
    pv = (
        load(spark, sf_dir, "events")
        .filter(F.col("event_type") == "purchase")
        .select(cents.alias("v"))
    )
    tot = pv.agg(F.count(F.lit(1)).cast("long").alias("nn"))
    ks = (
        spark.createDataFrame([(0.5,), (0.95,)], "p double")
        .crossJoin(F.broadcast(tot))
        .select("p", "nn", F.ceil(F.col("p") * F.col("nn")).cast("long").alias("k"))
    )
    # pass A: coarse histogram + cumulative over the BOUNDED bucket relation
    buckets = pv.groupBy(F.expr(f"v DIV {_REFINE_W}").alias("b")).agg(
        F.count(F.lit(1)).cast("long").alias("m")
    )
    wb = Window.orderBy("b").rowsBetween(Window.unboundedPreceding, 0)
    bcum = buckets.select(
        "b",
        F.sum("m").over(wb).cast("long").alias("cum"),
        (F.sum("m").over(wb) - F.col("m")).cast("long").alias("cum_before"),
    )
    targets = (
        ks.join(
            F.broadcast(bcum),
            (F.col("cum") >= F.col("k")) & (F.col("cum_before") < F.col("k")),
        )
        .select("p", "nn", "k", "b", "cum_before")
        .transform(stage)  # pass B's filter and the readout reuse it
    )
    # pass B: exact order statistic INSIDE the one target bucket per p
    inb = (
        pv.join(F.broadcast(targets), F.expr(f"v DIV {_REFINE_W}") == F.col("b"))
        .groupBy("p", "nn", "k", "b", "cum_before", "v")
        .agg(F.count(F.lit(1)).cast("long").alias("m"))
    )
    wv = Window.partitionBy("p").orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    hit = inb.select(
        "p", "nn", "k", "b", "v", (F.col("cum_before") + F.sum("m").over(wv)).alias("cumk")
    ).filter(F.col("cumk") >= F.col("k"))
    return (
        hit.groupBy("p", F.col("nn").alias("n"), "k", F.col("b").alias("bucket"))
        .agg(F.min("v").cast("long").alias("value_cents"))
        .transform(pin)
        .orderBy("p")
    )


_GREFINE_ORACLE = f"""
    WITH pv AS (
        SELECT event_type AS etype,
               CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS v
        FROM events
    ),
    tot AS (
        SELECT etype, CAST(COUNT(*) AS BIGINT) AS nn FROM pv GROUP BY etype
    ),
    t(p) AS (VALUES (CAST(0.5 AS DOUBLE)), (CAST(0.95 AS DOUBLE))),
    ks AS (
        SELECT etype, p, nn, CAST(CEIL(p * nn) AS BIGINT) AS k
        FROM tot CROSS JOIN t
    ),
    cnt AS (
        SELECT etype, v, CAST(COUNT(*) AS BIGINT) AS m FROM pv GROUP BY 1, 2
    ),
    c AS (
        SELECT etype, v,
               CAST(SUM(m) OVER (PARTITION BY etype ORDER BY v) AS BIGINT) AS cum
        FROM cnt
    ),
    pick AS (
        SELECT ks.etype, ks.p, ks.nn, ks.k, MIN(c.v) AS value_cents
        FROM ks JOIN c ON c.etype = ks.etype AND c.cum >= ks.k
        GROUP BY 1, 2, 3, 4
    )
    SELECT etype, p, nn AS n, k, value_cents // {_REFINE_W} AS bucket, value_cents
    FROM pick
    ORDER BY etype, p
"""


@query("q412_grouped_percentile_refinement", oracle=_GREFINE_ORACLE, tags=("X-137", "A-12"))
def q412_grouped_percentile_refinement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PER-GROUP exact p50/p95 by two-pass histogram refinement — q409
    generalized to the grouped form every ops dashboard actually needs
    (p95 latency per endpoint, p50 basket per type): pass A rolls the
    fact onto (group, coarse-bucket) counts and locates each (group,
    rank) target's crossing bucket via a group-partitioned cumulative
    window over the BOUNDED bucket relation; pass B re-scans only rows
    in the per-group target buckets for the exact in-bucket order
    statistic. Per-group state is (domain/1024) counts — groups multiply
    the bucket relation, never fact passes, and both fact touches stay
    map-side-combinable rollups (no per-group sort, no distinct-value
    window over the fact). The ORACLE is the direct per-group definition
    (algorithm == spec, the q409 pattern).

    Determinism: identical to q409 — exact integer counts, k =
    ceil(p*n) one IEEE multiply+ceil per group, exact order statistic,
    no interpolation.

    Reference parity: beyond-reference; the grouped sibling of X-134,
    beside q75's distinct-value grouped percentiles (right for narrow
    domains) and X-40's mergeable sketch (approximate)."""
    cents = (F.col("value").cast("decimal(18,2)") * 100).cast("long")
    pv = load(spark, sf_dir, "events").select(
        F.col("event_type").alias("etype"), cents.alias("v")
    )
    tot = pv.groupBy("etype").agg(F.count(F.lit(1)).cast("long").alias("nn"))
    ps = pv.sparkSession.createDataFrame([(0.5,), (0.95,)], "p double")
    ks = tot.crossJoin(F.broadcast(ps)).select(
        "etype", "p", "nn", F.ceil(F.col("p") * F.col("nn")).cast("long").alias("k")
    )
    buckets = pv.groupBy("etype", F.expr(f"v DIV {_REFINE_W}").alias("b")).agg(
        F.count(F.lit(1)).cast("long").alias("m")
    )
    wb = (
        Window.partitionBy("etype").orderBy("b").rowsBetween(Window.unboundedPreceding, 0)
    )
    bcum = buckets.select(
        "etype",
        "b",
        F.sum("m").over(wb).cast("long").alias("cum"),
        (F.sum("m").over(wb) - F.col("m")).cast("long").alias("cum_before"),
    )
    targets = (
        ks.join(
            F.broadcast(bcum.withColumnRenamed("etype", "betype")),
            (F.col("betype") == F.col("etype"))
            & (F.col("cum") >= F.col("k"))
            & (F.col("cum_before") < F.col("k")),
        )
        .select("etype", "p", "nn", "k", "b", "cum_before")
        .transform(stage)  # pass B's filter and the readout reuse it
    )
    inb = (
        pv.join(
            F.broadcast(targets.withColumnRenamed("etype", "tetype")),
            (F.col("tetype") == F.col("etype"))
            & (F.expr(f"v DIV {_REFINE_W}") == F.col("b")),
        )
        .groupBy("etype", "p", "nn", "k", "b", "cum_before", "v")
        .agg(F.count(F.lit(1)).cast("long").alias("m"))
    )
    wv = (
        Window.partitionBy("etype", "p")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    hit = inb.select(
        "etype", "p", "nn", "k", "b", "v",
        (F.col("cum_before") + F.sum("m").over(wv)).alias("cumk"),
    ).filter(F.col("cumk") >= F.col("k"))
    return (
        hit.groupBy("etype", "p", F.col("nn").alias("n"), "k", F.col("b").alias("bucket"))
        .agg(F.min("v").cast("long").alias("value_cents"))
        .transform(pin)
        .orderBy("etype", "p")
    )
