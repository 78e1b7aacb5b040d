"""Batch relational core: projection, predicates, aggregation, sort/top-k.

SURVEY.md §2B (P-01..P-05), §2D (A-01..A-11), §2E (O-01..O-05). These are the
dashboard-shaped queries the reference computes downstream in Postgres/pandas
(e.g. vehicle streamlit_app.py:91-132) re-expressed as engine-native Spark
plans. All double aggregates use exact-decimal summation (see
functions/deterministic.py) so results are bit-identical to the DuckDB oracle.

Scale notes (100 TB):
  - group-bys here are partial+final hash aggregates (map-side combine) —
    shuffle volume is |groups|, not |rows|.
  - top-k queries compile to TakeOrderedAndProject (no global sort).
  - every scan projects only referenced columns (parquet column pruning) and
    pushes filters into the scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..functions.deterministic import davg, dsum, dsum_expr
from ..functions.deterministic import oracle_davg as odavg
from ..functions.deterministic import oracle_dsum as odsum
from ..tables import load
from .registry import query
from ..functions.ordering import pin

# ---------------------------------------------------------------------------
# P — projection / filtering / derivation
# ---------------------------------------------------------------------------


@query(
    "q01_projection",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_extendedprice, l_returnflag
    FROM lineitem
    ORDER BY l_orderkey, l_linenumber
    """,
    tags=("P-01", "S-03"),
)
def q01_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column select + total-order sort (reference selectExpr/select,
    spark_kafka_consumer_dag.py:47,54). Column pruning reaches the scan."""
    return (
        load(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_linenumber", "l_extendedprice", "l_returnflag")
        .transform(pin).orderBy("l_orderkey", "l_linenumber")
    )


@query(
    "q02_filter_predicate",
    oracle="""
    SELECT event_id, user_id, event_type, value
    FROM events
    WHERE event_type IN ('purchase', 'error') AND value > 100.0
    ORDER BY event_id
    """,
    tags=("P-04",),
)
def q02_filter_predicate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Membership + range predicate (reference class filter
    vehicle_consumer.py:94, lifted out of the UDF into the scan)."""
    ev = load(spark, sf_dir, "events")
    return (
        ev.filter(F.col("event_type").isin("purchase", "error") & (F.col("value") > 100.0))
        .select("event_id", "user_id", "event_type", "value")
        .transform(pin).orderBy("event_id")
    )


@query(
    "q02b_fillna",
    oracle="""
    SELECT doc_id, COALESCE(NULLIF(lang, 'zh'), 'unknown') AS lang_filled
    FROM documents
    ORDER BY doc_id
    """,
    tags=("P-04", "F-13"),
)
def q02b_fillna(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null handling (reference pdf['review'].fillna(''),
    spark_kafka_consumer_dag.py:145) — nullif/coalesce as relational ops."""
    docs = load(spark, sf_dir, "documents")
    return (
        docs.withColumn("lang_filled", F.coalesce(F.nullif("lang", F.lit("zh")), F.lit("unknown")))
        .select("doc_id", "lang_filled")
        .transform(pin).orderBy("doc_id")
    )


@query(
    "q03_derived_cast",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           ROUND(l_extendedprice * (1 - l_discount), 4) AS revenue,
           strftime(l_shipdate, '%Y-%m-%d') AS ship_date,
           CAST(l_linenumber AS VARCHAR) AS line_str
    FROM lineitem
    ORDER BY l_orderkey, l_linenumber
    """,
    tags=("P-02", "P-05"),
)
def q03_derived_cast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """withColumn chains + casts (reference vehicle_consumer.py:118-122)."""
    li = load(spark, sf_dir, "lineitem")
    return (
        li.withColumn("revenue", F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4))
        .withColumn("ship_date", F.date_format("l_shipdate", "yyyy-MM-dd"))
        .withColumn("line_str", F.col("l_linenumber").cast("string"))
        .select("l_orderkey", "l_linenumber", "revenue", "ship_date", "line_str")
        .transform(pin).orderBy("l_orderkey", "l_linenumber")
    )


# ---------------------------------------------------------------------------
# A — aggregation (dashboard queries made engine-native)
# ---------------------------------------------------------------------------


@query(
    "q04_group_sum_multikey",
    oracle=f"""
    SELECT user_id, event_type,
           {odsum('value')} AS total_value,
           COUNT(*) AS n_events
    FROM events
    GROUP BY user_id, event_type
    ORDER BY user_id, event_type
    """,
    tags=("A-01",),
)
def q04_group_sum_multikey(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Total per (camera, vehicle_type) analog — vehicle streamlit_app.py:91-95.
    Partial+final hash agg; shuffle carries one row per group."""
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id", "event_type")
        .agg(dsum("value").alias("total_value"), F.count("*").alias("n_events"))
        .transform(pin).orderBy("user_id", "event_type")
    )


@query(
    "q05_group_count",
    oracle="""
    SELECT lang, COUNT(*) AS n_docs
    FROM documents GROUP BY lang ORDER BY lang
    """,
    tags=("A-02",),
)
def q05_group_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequency count (sentiment value_counts analog, absa streamlit_app.py:76-82)."""
    return load(spark, sf_dir, "documents").groupBy("lang").count().withColumnRenamed("count", "n_docs").transform(pin).orderBy("lang")


@query(
    "q06_grand_totals",
    oracle=f"""
    SELECT {odsum('l_quantity')} AS sum_qty,
           {odsum('l_extendedprice')} AS sum_price,
           COUNT(*) AS n_rows
    FROM lineitem
    """,
    tags=("A-03", "A-07"),
)
def q06_grand_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grand totals (df['count'].sum() analog, vehicle streamlit_app.py:130)."""
    li = load(spark, sf_dir, "lineitem")
    return li.agg(
        dsum("l_quantity").alias("sum_qty"),
        dsum("l_extendedprice").alias("sum_price"),
        F.count("*").alias("n_rows"),
    )


@query(
    "q07_count_distinct",
    oracle="""
    SELECT COUNT(DISTINCT l_suppkey) AS n_supp,
           COUNT(DISTINCT l_partkey) AS n_part,
           COUNT(DISTINCT l_orderkey) AS n_ord
    FROM lineitem
    """,
    tags=("A-04",),
)
def q07_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """nunique() analog (vehicle streamlit_app.py:131-132)."""
    li = load(spark, sf_dir, "lineitem")
    return li.agg(
        F.countDistinct("l_suppkey").alias("n_supp"),
        F.countDistinct("l_partkey").alias("n_part"),
        F.countDistinct("l_orderkey").alias("n_ord"),
    )


@query(
    "q07b_approx_count_distinct",
    oracle="""
    SELECT COUNT(DISTINCT l_orderkey) AS exact_orders, TRUE AS within_tol
    FROM lineitem
    """,
    tags=("A-05",),
)
def q07b_approx_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog++ count-distinct — the 100 TB-scale variant of A-04:
    register merge is commutative hence deterministic. The hash-checked
    contract is the exact count plus an in-engine 5%-tolerance assertion on
    the sketch. Both aggregates run over the pre-distincted keys: HLL
    registers are insensitive to duplicates, so the sketch is identical, and
    one distinct shuffle replaces the Expand(2x) plan Spark emits when an
    exact distinct and another aggregate share one agg()."""
    li = load(spark, sf_dir, "lineitem")
    keys = li.select("l_orderkey").distinct()
    agg = keys.agg(
        F.count("l_orderkey").alias("exact_orders"),
        F.approx_count_distinct("l_orderkey", rsd=0.02).alias("approx_orders"),
    )
    return agg.select(
        "exact_orders",
        (
            F.abs(F.col("approx_orders") - F.col("exact_orders"))
            <= 0.05 * F.col("exact_orders")
        ).alias("within_tol"),
    )


@query(
    "q08_time_bucket",
    oracle=f"""
    SELECT date_trunc('minute', ts) AS minute, event_type,
           COUNT(*) AS n_events, {odsum('value')} AS total_value
    FROM events
    GROUP BY 1, 2
    ORDER BY minute, event_type
    """,
    tags=("A-06", "F-04"),
)
def q08_time_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-minute trend (vehicle streamlit_app.py:111-124) — batch twin of the
    streaming tumbling window (T-05); same result set by construction."""
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy(F.date_trunc("minute", "ts").alias("minute"), "event_type")
        .agg(F.count("*").alias("n_events"), dsum("value").alias("total_value"))
        .transform(pin).orderBy("minute", "event_type")
    )


@query(
    "q09_pricing_summary",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           {odsum('l_quantity')} AS sum_qty,
           {odsum('l_extendedprice')} AS sum_base_price,
           {odsum('l_extendedprice * (1 - l_discount)', 6)} AS sum_disc_price,
           {odsum('(l_extendedprice * (1 - l_discount)) * (1 + l_tax)', 6)} AS sum_charge,
           {odavg('l_quantity')} AS avg_qty,
           {odavg('l_extendedprice')} AS avg_price,
           {odavg('l_discount', 4)} AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2000-01-01 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
    tags=("A-01", "A-03", "A-08", "P-04"),
)
def q09_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship: TPC-H Q1-shaped pricing summary — the dashboard-aggregation
    shape (A-01/A-06) at fact-table scale. One scan, filter pushed to parquet,
    partial+final hash agg over 6 groups: the plan that survives 100 TB."""
    li = load(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2000-01-01 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity").alias("sum_qty"),
            dsum("l_extendedprice").alias("sum_base_price"),
            dsum_expr("l_extendedprice * (1 - l_discount)", 6).alias("sum_disc_price"),
            dsum_expr("(l_extendedprice * (1 - l_discount)) * (1 + l_tax)", 6).alias("sum_charge"),
            davg("l_quantity").alias("avg_qty"),
            davg("l_extendedprice").alias("avg_price"),
            davg("l_discount", 4).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
        .transform(pin).orderBy("l_returnflag", "l_linestatus")
    )


@query(
    "q10_rollup",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           GROUPING(l_returnflag, l_linestatus) AS gid,
           {odsum('l_quantity')} AS sum_qty
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    ORDER BY gid, l_returnflag, l_linestatus
    """,
    tags=("A-09",),
)
def q10_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rollup: per-(flag,status), per-flag, and grand totals in one pass —
    the dashboard computes these as three separate pandas passes
    (vehicle streamlit_app.py:91-132)."""
    li = load(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(F.grouping_id().alias("gid"), dsum("l_quantity").alias("sum_qty"))
        .select("l_returnflag", "l_linestatus", "gid", "sum_qty")
        .transform(pin).orderBy(F.col("gid"), F.col("l_returnflag"), F.col("l_linestatus"))
    )


@query(
    "q11_pivot",
    oracle="""
    SELECT lang,
           COUNT(*) FILTER (WHERE source = 'src0') AS src0,
           COUNT(*) FILTER (WHERE source = 'src1') AS src1,
           COUNT(*) FILTER (WHERE source = 'src2') AS src2,
           COUNT(*) FILTER (WHERE source = 'src3') AS src3,
           COUNT(*) FILTER (WHERE source = 'src4') AS src4
    FROM documents
    GROUP BY lang
    ORDER BY lang
    """,
    tags=("A-10",),
)
def q11_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot (aspects × sentiments matrix analog, absa streamlit_app.py:76-94).
    Fixed pivot value list — no extra pass to discover values, and the plan is
    a single hash agg regardless of input size."""
    docs = load(spark, sf_dir, "documents")
    piv = docs.groupBy("lang").pivot("source", [f"src{i}" for i in range(5)]).count()
    # pivot-count yields null for empty cells; dashboards (and the oracle) want 0
    return piv.select(
        "lang", *[F.coalesce(F.col(c), F.lit(0)).alias(c) for c in piv.columns if c != "lang"]
    ).transform(pin).orderBy("lang")


@query(
    "q23_collect_set",
    oracle="""
    SELECT user_id,
           STRING_AGG(DISTINCT event_type, ',' ORDER BY event_type) AS types_seen
    FROM events
    GROUP BY user_id
    ORDER BY user_id
    """,
    tags=("A-11", "F-09"),
)
def q23_collect_set(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group label set, sorted + comma-joined (reference builds
    'car,bus,...' with ','.join at vehicle_consumer.py:96-98)."""
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id")
        .agg(F.concat_ws(",", F.array_sort(F.collect_set("event_type"))).alias("types_seen"))
        .transform(pin).orderBy("user_id")
    )


# ---------------------------------------------------------------------------
# O — sorts, limits, top-k, sampling
# ---------------------------------------------------------------------------


@query(
    "q12_latest_topn",
    oracle="""
    SELECT event_id, ts, user_id, event_type, value
    FROM events
    ORDER BY ts DESC, event_id DESC
    LIMIT 200
    """,
    tags=("O-01", "O-02"),
)
def q12_latest_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Latest-200 dashboard query (vehicle streamlit_app.py:43-50) with a keyed
    tie-break. Spark plans TakeOrderedAndProject: per-partition top-k then a
    k-merge on the driver — no global sort at any scale."""
    ev = load(spark, sf_dir, "events")
    return (
        ev.select("event_id", "ts", "user_id", "event_type", "value")
        .transform(pin).orderBy(F.desc("ts"), F.desc("event_id"))
        .limit(200)
    )


@query(
    "q13_grouped_topk",
    oracle=f"""
    WITH totals AS (
        SELECT event_type, user_id, {odsum('value')} AS total_value
        FROM events GROUP BY event_type, user_id
    ), ranked AS (
        SELECT *, ROW_NUMBER() OVER (
            PARTITION BY event_type ORDER BY total_value DESC, user_id
        ) AS rn
        FROM totals
    )
    SELECT event_type, user_id, total_value, rn
    FROM ranked WHERE rn <= 5
    ORDER BY event_type, rn
    """,
    tags=("O-05", "W-01"),
)
def q13_grouped_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 users per event type (per-camera busiest-minutes analog).
    Aggregate first (shrinks to |groups| rows), then rank — the window runs
    over the reduced set, not the raw fact table."""
    ev = load(spark, sf_dir, "events")
    totals = ev.groupBy("event_type", "user_id").agg(dsum("value").alias("total_value"))
    w = W.partitionBy("event_type").orderBy(F.desc("total_value"), F.asc("user_id"))
    return (
        totals.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 5)
        .transform(pin).orderBy("event_type", "rn")
    )


@query(
    "q14_global_sort",
    oracle="""
    SELECT o_orderkey, o_totalprice, o_orderdate
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 1000
    """,
    tags=("O-04",),
)
def q14_global_sort(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global sort + limit. With a LIMIT Spark avoids the range-partitioned
    sort-exchange entirely (TakeOrderedAndProject)."""
    return (
        load(spark, sf_dir, "orders")
        .select("o_orderkey", "o_totalprice", "o_orderdate")
        .transform(pin).orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(1000)
    )


@query(
    "q15_keyed_sample",
    oracle="""
    SELECT event_id, event_type, value
    FROM events
    WHERE substr(md5(CAST(event_id AS VARCHAR)), 1, 2) < '20'
    ORDER BY event_id
    """,
    tags=("O-03",),
)
def q15_keyed_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic ~1/8 sample via key hashing — the declared seeded/keyed
    variant of the reference's ORDER BY RANDOM() LIMIT 300 (absa
    streamlit_app.py:42). Hash-stable across engines, runs, and partitionings,
    unlike rand(seed) which depends on partition layout."""
    ev = load(spark, sf_dir, "events")
    return (
        ev.filter(F.substring(F.md5(F.col("event_id").cast("string").cast("binary")), 1, 2) < "20")
        .select("event_id", "event_type", "value")
        .transform(pin).orderBy("event_id")
    )


@query(
    "q75_grouped_percentiles",
    oracle="""
    WITH q AS (
        SELECT event_type, quantile_cont(value, [0.25, 0.5, 0.75, 0.99]) AS qs
        FROM events GROUP BY event_type
    )
    SELECT event_type, qs[1] AS p25, qs[2] AS p50, qs[3] AS p75, qs[4] AS p99
    FROM q ORDER BY event_type
    """,
    tags=("A-12",),
)
def q75_grouped_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A-12 exact grouped percentiles (beyond-reference): Spark's exact
    `percentile` and DuckDB's quantile_cont share the same sort + linear
    interpolation (a + (b-a)*frac in IEEE double), verified bit-exact — no
    rounding needed in the contract. One shuffle on the group key; at scale
    swap in approx_percentile (t-digest) when exactness can yield (that
    variant is A-05's sketch-style tradeoff, kept out of the hash check)."""
    ev = load(spark, sf_dir, "events")
    qs = F.expr("percentile(value, array(0.25, 0.5, 0.75, 0.99))")
    return (
        ev.groupBy("event_type")
        .agg(qs.alias("qs"))
        .select(
            "event_type",
            F.col("qs")[0].alias("p25"),
            F.col("qs")[1].alias("p50"),
            F.col("qs")[2].alias("p75"),
            F.col("qs")[3].alias("p99"),
        )
        .transform(pin).orderBy("event_type")
    )


@query(
    "q151_weighted_median",
    oracle="""
    WITH rel AS (
        SELECT l_returnflag, l_extendedprice AS price,
               CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS w
        FROM lineitem GROUP BY l_returnflag, l_extendedprice
    ),
    cum AS (
        SELECT l_returnflag, price, w,
               CAST(SUM(w) OVER (PARTITION BY l_returnflag ORDER BY price
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
                   AS cw
        FROM rel
    ),
    tot AS (
        SELECT l_returnflag, CAST(SUM(w) AS BIGINT) AS total_weight
        FROM rel GROUP BY l_returnflag
    )
    SELECT c.l_returnflag,
           MIN(c.price) AS weighted_median,
           MIN(t.total_weight) AS total_weight
    FROM cum c JOIN tot t USING (l_returnflag)
    WHERE 2 * c.cw >= t.total_weight
    GROUP BY c.l_returnflag
    ORDER BY c.l_returnflag
    """,
    tags=("A-12", "W-03"),
)
def q151_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted median (A-12 extension): per return flag, the smallest
    price whose cumulative QUANTITY weight reaches half the group's total
    weight — the 'median unit price per unit sold', which plain
    percentile over rows cannot express (a 50-unit line must count 50x a
    1-unit line). The lower weighted median under integer arithmetic:
    the 2*cum >= total comparison is exact, so no interpolation and no
    float anywhere.

    Scale shape: per-(group, price) weight rollup first (shrinks the
    window input to distinct prices), then a PER-GROUP window — partition
    key is the group, never a global sort — and the group totals
    broadcast back. Same plan family as grouped top-k."""
    li = load(spark, sf_dir, "lineitem")
    rel = li.groupBy("l_returnflag", F.col("l_extendedprice").alias("price")).agg(
        F.sum(F.col("l_quantity").cast("long")).alias("w")
    )
    wc = (
        W.partitionBy("l_returnflag")
        .orderBy("price")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    cum = rel.withColumn("cw", F.sum("w").over(wc))
    tot = rel.groupBy("l_returnflag").agg(F.sum("w").alias("total_weight"))
    return (
        cum.join(F.broadcast(tot), "l_returnflag")
        .filter(2 * F.col("cw") >= F.col("total_weight"))
        .groupBy("l_returnflag")
        .agg(
            F.min("price").alias("weighted_median"),
            F.min("total_weight").alias("total_weight"),
        )
        .transform(pin)
        .orderBy("l_returnflag")
    )


# ---------------------------------------------------------------------------
# O-05 (cont.): grouped top-k WITH TIES (the RANK-cut semantics)
# ---------------------------------------------------------------------------


@query(
    "q375_topk_with_ties",
    oracle="""
    WITH qty AS (
        SELECT l_returnflag AS flag, CAST(l_quantity AS BIGINT) AS qty,
               CAST(COUNT(*) AS BIGINT) AS n_lines
        FROM lineitem GROUP BY 1, 2
    ),
    ranked AS (
        SELECT flag, qty, n_lines,
               RANK() OVER (PARTITION BY flag ORDER BY n_lines DESC) AS rk
        FROM qty
    )
    SELECT flag, qty, n_lines, CAST(rk AS BIGINT) AS rk
    FROM ranked WHERE rk <= 3
    ORDER BY flag, rk, qty
    """,
    tags=("O-05", "W-01"),
)
def q375_topk_with_ties(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped top-k WITH TIES (the `FETCH FIRST k ROWS WITH TIES` / RANK
    cut): per return flag, the 3 most frequent quantity values — and
    every value TIED with the 3rd, so the result is a deterministic
    FUNCTION of the data rather than of an arbitrary tie-break. q13's
    row_number cut answers 'give me exactly k'; this answers 'give me
    the top k VALUES' — the semantics a report needs when the cut line
    lands mid-tie (row_number would silently keep an arbitrary tied
    member and drop its equals). Ties are frequent by construction here
    (50 quantity values over thousands of lines), so the semantics
    difference is exercised, not theoretical.

    Determinism: the RANK cut needs no tie-break AT the cut by design
    (equal keys are all kept); presentation order totals with (qty).

    Scale shape: ONE map-side-combined rollup onto the bounded
    (flag, quantity) domain; the RANK window and cut run on that
    bounded relation and compile to the same WindowGroupLimit partial
    top-k as row_number (rank <= k is group-limit eligible in Spark 4).

    Reference parity: beyond-reference; completes O-05's top-k semantics
    family (q13 exact-k, q222 diversified, q352 with-OTHERS, q364
    stability)."""
    from pyspark.sql import Window as W

    qty = (
        load(spark, sf_dir, "lineitem")
        .groupBy(
            F.col("l_returnflag").alias("flag"),
            F.col("l_quantity").cast("long").alias("qty"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_lines"))
    )
    ranked = qty.withColumn(
        "rk",
        F.rank()
        .over(W.partitionBy("flag").orderBy(F.desc("n_lines")))
        .cast("long"),
    )
    return (
        ranked.filter(F.col("rk") <= 3)
        .transform(pin)
        .orderBy("flag", "rk", "qty")
    )


# ---------------------------------------------------------------------------
# A-01 (cont.): salted two-phase aggregation (hot-key skew mechanism)
# ---------------------------------------------------------------------------

_SALT_N = 16


@query(
    "q383_salted_aggregation",
    oracle="""
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
               AS cents
    FROM events GROUP BY event_type ORDER BY event_type
    """,
    tags=("A-01", "J-01"),
)
def q383_salted_aggregation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted two-phase aggregation: the skew-survival form of a grouped
    sum — phase 1 aggregates on (key, salt-of-16) so a hot key's rows
    spread over 16 reducers, phase 2 re-aggregates the 16 partials per
    key. The ORACLE is the plain one-phase group-sum, so the hash match
    IS the proof the decomposition is exact (sums/counts are the A-14
    mergeable pair). Event types here are only 5 keys — exactly the
    cardinality regime where one hot key would otherwise own one
    reducer at 100 TB; q16c salts a JOIN, this salts the AGGREGATION.

    Determinism: the salt is md5-derived from the row's event_id (pure
    function, any spread works because phase 2 re-merges); cents exact.

    Scale shape: phase 1 is map-side combined on (key, salt) — at most
    16x|keys| rows cross the first exchange regardless of skew; phase 2
    shuffles those partials on the bare key. Two small exchanges replace
    one skew-bound one. (Spark's own partial aggregation gives similar
    protection for SUM/COUNT; explicit salting is the pattern that
    also survives exact count-distinct and collect-style aggregates,
    and this query certifies its algebra.)

    Reference parity: beyond-reference; the aggregation twin of q16c's
    salted join under X-09's skew discipline."""
    ev = load(spark, sf_dir, "events").select(
        "event_type",
        F.floor(F.col("value") * 100 + 0.5).cast("long").alias("cents"),
        (F.expr("instr('0123456789abcdef', substr(md5(CAST(event_id AS string)), 1, 1)) - 1")
         % _SALT_N).alias("salt"),
    )
    phase1 = ev.groupBy("event_type", "salt").agg(
        F.count(F.lit(1)).cast("long").alias("n_part"),
        F.sum("cents").cast("long").alias("c_part"),
    )
    return (
        phase1.groupBy("event_type")
        .agg(
            F.sum("n_part").cast("long").alias("n_events"),
            F.sum("c_part").cast("long").alias("cents"),
        )
        .transform(pin)
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# O-01 (cont.): keyset pagination (the seek method vs OFFSET)
# ---------------------------------------------------------------------------

_PAGE_SIZE = 100
_PAGE_SKIP = 200  #: page 3


@query(
    "q385_keyset_pagination",
    oracle=f"""
    SELECT o_orderkey,
           CAST(FLOOR(epoch(o_orderdate)) AS BIGINT) // 86400 AS d,
           CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
    FROM orders
    ORDER BY o_orderdate, o_orderkey
    LIMIT {_PAGE_SIZE} OFFSET {_PAGE_SKIP}
    """,
    tags=("O-01", "O-04"),
)
def q385_keyset_pagination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyset pagination (the seek method): page 3 of the order ledger
    fetched by WHERE (date, key) > last-seen-boundary LIMIT n — while
    the ORACLE fetches the same page with OFFSET/LIMIT, so the hash
    match certifies the two formulations equivalent under the total
    (o_orderdate, o_orderkey) order. The point is the SCALE asymmetry:
    OFFSET must produce and discard every skipped row on every page
    (page N costs O(N·n)), while the seek predicate pushes to the scan
    (PushedFilters on the boundary) and each page costs O(n) — the only
    pagination that survives a 100 TB ledger or a billion-row API.

    Determinism: the boundary is the exact 200th row under a total
    order; struct comparison is lexicographic in both formulations.

    Scale shape: the boundary derives as TakeOrdered(200) + a one-row
    max (here, to keep the query self-contained; in the API flow the
    client supplies it for free), broadcasts, and the page itself is a
    filtered TakeOrdered(n) — no global sort, no skip-scan.

    Reference parity: beyond-reference; completes O-01/O-04's ordering
    family with the pagination pattern every result-serving layer needs."""
    o = load(spark, sf_dir, "orders").select(
        "o_orderkey",
        (F.unix_timestamp(F.col("o_orderdate")) / F.lit(86400))
        .cast("long")
        .alias("d"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    boundary = (
        o.orderBy("d", "o_orderkey")
        .limit(_PAGE_SKIP)
        .agg(F.max(F.struct("d", "o_orderkey")).alias("b"))
    )
    return (
        o.join(F.broadcast(boundary))
        .filter(F.struct("d", "o_orderkey") > F.col("b"))
        .select("o_orderkey", "d", "cents")
        .orderBy("d", "o_orderkey")
        .limit(_PAGE_SIZE)
    )


# ---------------------------------------------------------------------------
# A-10 (cont.): UNPIVOT (wide -> long reshape, the pivot inverse)
# ---------------------------------------------------------------------------


@query(
    "q389_unpivot_roundtrip",
    oracle="""
    WITH wide AS (
        SELECT CAST(FLOOR(epoch(date_trunc('day', ts))) AS BIGINT) // 86400 AS d,
               CAST(COUNT(CASE WHEN event_type = 'click' THEN 1 END) AS BIGINT)
                   AS click,
               CAST(COUNT(CASE WHEN event_type = 'view' THEN 1 END) AS BIGINT)
                   AS view,
               CAST(COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS BIGINT)
                   AS purchase
        FROM events GROUP BY d
    )
    SELECT d, event_type, n FROM wide
    UNPIVOT (n FOR event_type IN (click, view, purchase))
    WHERE n > 0
    ORDER BY d, event_type
    """,
    tags=("A-10", "P-01"),
)
def q389_unpivot_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT — the wide-to-long reshape that inverts A-10's pivot: a
    per-day wide count matrix (one column per event type, built with
    conditional aggregation) melted back to (day, type, n) rows via
    Spark's native unpivot against DuckDB's SQL-standard UNPIVOT
    clause. Reshape is where silent schema bugs live (a dropped column
    vanishes without an error), so the round-trip deserves its own
    hash-checked certification; zero cells are excluded on BOTH sides
    because SQL UNPIVOT drops NULLs while conditional counts produce
    zeros — the classic melt asymmetry made explicit.

    Determinism: exact counts; the melt is a deterministic relabeling.

    Scale shape: the wide build is ONE map-side-combined rollup onto the
    calendar-bounded day relation; unpivot is a MAP-ONLY expand of that
    bounded relation (fan-out = column count, never row count) —
    exactly why long<->wide reshapes are free at 100 TB once the
    aggregation is done.

    Reference parity: beyond-reference; completes A-10 (q11/q61 pivot)
    with the inverse direction."""
    wide = (
        load(spark, sf_dir, "events")
        .groupBy(
            (F.unix_timestamp(F.date_trunc("day", F.col("ts"))) / F.lit(86400))
            .cast("long")
            .alias("d")
        )
        .agg(
            F.count(F.when(F.col("event_type") == "click", 1))
            .cast("long")
            .alias("click"),
            F.count(F.when(F.col("event_type") == "view", 1))
            .cast("long")
            .alias("view"),
            F.count(F.when(F.col("event_type") == "purchase", 1))
            .cast("long")
            .alias("purchase"),
        )
    )
    return (
        wide.unpivot("d", ["click", "view", "purchase"], "event_type", "n")
        .filter(F.col("n") > 0)
        .transform(pin)
        .orderBy("d", "event_type")
    )


# ---------------------------------------------------------------------------
# F-04 (cont.): calendar-truncation semantics certification
# ---------------------------------------------------------------------------


@query(
    "q391_calendar_semantics",
    oracle="""
    WITH days AS (
        SELECT DISTINCT date_trunc('day', ts) AS day_ts FROM events
    )
    SELECT CAST(FLOOR(epoch(day_ts)) AS BIGINT) // 86400 AS d,
           CAST(FLOOR(epoch(date_trunc('week', day_ts))) AS BIGINT) // 86400
               AS iso_week_start_d,
           CAST(dayofweek(day_ts) + 1 AS BIGINT) AS dow_sunday1,
           CAST(isodow(day_ts) AS BIGINT) AS iso_dow,
           CAST(weekofyear(day_ts) AS BIGINT) AS iso_week,
           CAST(quarter(day_ts) AS BIGINT) AS qtr,
           CAST(FLOOR(epoch(date_trunc('month', day_ts))) AS BIGINT) // 86400
               AS month_start_d
    FROM days ORDER BY d
    """,
    tags=("F-04", "P-05"),
)
def q391_calendar_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar-truncation semantics certification: for every distinct
    day in the data, the ISO week start (Monday-anchored date_trunc),
    both day-of-week conventions (Sunday=1 and ISO Monday=1), ISO week
    number, quarter, and month start — hash-matched across engines.
    Calendar functions are where cross-engine migrations silently break
    (week anchors, dow numbering, and week-of-year all have competing
    conventions; Spark's dayofweek is Sunday=1 while DuckDB's dayofweek
    is Sunday=0, mapped explicitly here), and every X-20/X-83 calendar
    query upstream leans on these semantics — this row pins them.

    Determinism: pure integer calendar arithmetic on exact epoch days.

    Scale shape: distinct-day reduction is ONE map-side-combined rollup
    onto the calendar-bounded relation; every truncation is map-only
    codegen on <= |days| rows.

    Reference parity: beyond-reference; the portability contract under
    every time-bucketed operator (F-04/A-06/X-20)."""
    days = (
        load(spark, sf_dir, "events")
        .select(F.date_trunc("day", F.col("ts")).alias("day_ts"))
        .groupBy("day_ts")
        .agg(F.count(F.lit(1)).alias("_n"))
        .select("day_ts")
    )
    epoch_days = lambda c: (F.unix_timestamp(c) / F.lit(86400)).cast("long")
    return (
        days.select(
            epoch_days(F.col("day_ts")).alias("d"),
            epoch_days(F.date_trunc("week", F.col("day_ts"))).alias(
                "iso_week_start_d"
            ),
            F.dayofweek("day_ts").cast("long").alias("dow_sunday1"),
            # ISO dow (Mon=1..Sun=7) from Spark's Sunday=1 convention
            ((F.dayofweek("day_ts") + 5) % 7 + 1).cast("long").alias("iso_dow"),
            F.weekofyear("day_ts").cast("long").alias("iso_week"),
            F.quarter("day_ts").cast("long").alias("qtr"),
            epoch_days(F.date_trunc("month", F.col("day_ts"))).alias(
                "month_start_d"
            ),
        )
        .transform(pin)
        .orderBy("d")
    )


# ---------------------------------------------------------------------------
# O-04 (cont.): NULL-ordering semantics certification
# ---------------------------------------------------------------------------


@query(
    "q393_null_ordering",
    oracle="""
    WITH keyed AS (
        SELECT event_id,
               CASE WHEN value > 450 THEN CAST(FLOOR(value) AS BIGINT) END
                   AS nullable_key
        FROM events
    ),
    ranked AS (
        SELECT event_id, nullable_key,
               ROW_NUMBER() OVER (
                   ORDER BY nullable_key ASC NULLS FIRST, event_id
               ) AS rk_nf,
               ROW_NUMBER() OVER (
                   ORDER BY nullable_key ASC NULLS LAST, event_id
               ) AS rk_nl
        FROM keyed
    )
    SELECT CAST(rk_nf AS BIGINT) AS rk_nf, CAST(rk_nl AS BIGINT) AS rk_nl,
           event_id, nullable_key
    FROM ranked
    WHERE rk_nf <= 10 OR rk_nl <= 10
    ORDER BY event_id
    """,
    tags=("O-04", "F-13"),
)
def q393_null_ordering(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULL-ordering semantics certification: the same nullable sort key
    ranked under explicit NULLS FIRST and NULLS LAST, exporting the rows
    that make either top-10 — pinned because the engines' DEFAULTS
    diverge (Spark sorts ASC NULLS FIRST, DuckDB ASC NULLS LAST), which
    is a classic silent top-k corruption when migrated SQL omits the
    clause: the NULLS FIRST top-10 here is all NULLs, the NULLS LAST
    top-10 all values, and a defaults-reliant query would return one or
    the other depending on the engine. Every ordered operator upstream
    uses non-null keys or explicit clauses; this row certifies the
    machinery that keeps it that way.

    Determinism: explicit NULLS clauses on both engines; tie-break by
    event_id.

    Scale shape: both rankings are global top-k reads over the same
    scan; the WHERE rk<=10 cut compiles to WindowGroupLimit-style
    partial filters; the export is <= 20 rows.

    Reference parity: beyond-reference; the ordering-semantics
    portability contract under O-01/O-04."""
    from pyspark.sql import Window as W

    keyed = load(spark, sf_dir, "events").select(
        "event_id",
        F.when(F.col("value") > 450, F.floor(F.col("value")).cast("long")).alias(
            "nullable_key"
        ),
    )
    rk_nf = F.row_number().over(
        W.partitionBy().orderBy(
            F.col("nullable_key").asc_nulls_first(), F.col("event_id")
        )
    )
    rk_nl = F.row_number().over(
        W.partitionBy().orderBy(
            F.col("nullable_key").asc_nulls_last(), F.col("event_id")
        )
    )
    return (
        keyed.select(
            rk_nf.cast("long").alias("rk_nf"),
            rk_nl.cast("long").alias("rk_nl"),
            "event_id",
            "nullable_key",
        )
        .filter((F.col("rk_nf") <= 10) | (F.col("rk_nl") <= 10))
        .transform(pin)
        .orderBy("event_id")
    )


# ---------------------------------------------------------------------------
# A-06 (cont.): timezone-local day rollup certification
# ---------------------------------------------------------------------------

_TZ = "America/New_York"


@query(
    "q395_timezone_rollup",
    oracle=f"""
    WITH localized AS (
        SELECT CAST(FLOOR(epoch(date_trunc('day',
                   (ts AT TIME ZONE 'UTC') AT TIME ZONE '{_TZ}')))
               AS BIGINT) // 86400 AS local_d,
               CAST(FLOOR(epoch(date_trunc('day', ts))) AS BIGINT) // 86400
                   AS utc_d,
               CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS cents
        FROM events
    )
    SELECT local_d,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(cents) AS BIGINT) AS cents,
           CAST(COUNT(DISTINCT utc_d) AS BIGINT) AS n_utc_days_touched
    FROM localized GROUP BY local_d ORDER BY local_d
    """,
    tags=("A-06", "F-04"),
)
def q395_timezone_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Timezone-local day rollup: the daily ledger re-bucketed into
    America/New_York business days (Spark from_utc_timestamp vs the SQL
    `AT TIME ZONE` pair, both resolving through IANA tzdata) — every
    local day straddles two UTC days, and the n_utc_days_touched column
    shows it, which is exactly the reconciliation surprise ('why don't
    the UTC and local dashboards agree?') this certification pins. Any
    finance/ops close that runs in a business timezone needs this
    rollup to hash-match the warehouse's UTC storage.

    Determinism: both engines resolve the same IANA zone rules on
    identical UTC instants; counts and cents exact.

    Scale shape: the zone shift is map-only codegen; ONE map-side-
    combined rollup onto the calendar-bounded local-day relation (the
    distinct-UTC-day count rides the same shuffle).

    Reference parity: beyond-reference; the timezone leg of F-04/A-06's
    calendar contract (q391 pins truncation anchors, this pins zone
    conversion)."""
    localized = load(spark, sf_dir, "events").select(
        (
            F.unix_timestamp(
                F.date_trunc("day", F.from_utc_timestamp(F.col("ts"), _TZ))
            )
            / F.lit(86400)
        )
        .cast("long")
        .alias("local_d"),
        (F.unix_timestamp(F.date_trunc("day", F.col("ts"))) / F.lit(86400))
        .cast("long")
        .alias("utc_d"),
        F.floor(F.col("value") * 100 + 0.5).cast("long").alias("cents"),
    )
    return (
        localized.groupBy("local_d")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.sum("cents").cast("long").alias("cents"),
            F.countDistinct("utc_d").cast("long").alias("n_utc_days_touched"),
        )
        .transform(pin)
        .orderBy("local_d")
    )
