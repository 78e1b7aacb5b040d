"""Joins (SURVEY.md §2F, J-01..J-07). The reference never joins two DataFrames
— its dashboards read standalone result tables — but the engine surface must
answer dashboard-style rollups over the normalized star schema, and streaming
enrichment replaces the reference's hard-coded Python dict lookups
(consumer_postgres_streaming.py:53).

Scale notes:
  - dimension joins (nation/region/customer at TPC-H ratios) broadcast — no
    shuffle of the fact table; q16b pins the hint, the others let Catalyst +
    AQE decide (autoBroadcastJoinThreshold=32m in the session factory).
  - the star join (q17) joins facts largest-last so AQE can re-order and
    broadcast every dimension; lineitem is shuffled at most once (on
    l_orderkey) at any scale.
  - the theta join (q21) is a broadcast-nested-loop against a tiny bands
    relation — the only safe shape for a non-equi predicate at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.deterministic import dsum, dsum_expr
from ..functions.deterministic import oracle_dsum as odsum
from ..tables import load
from .registry import query
from ..functions.ordering import pin, stage


@query(
    "q16_join_inner",
    oracle=f"""
    SELECT c_mktsegment,
           {odsum('o_totalprice')} AS segment_revenue,
           COUNT(*) AS n_orders
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY c_mktsegment
    ORDER BY c_mktsegment
    """,
    tags=("J-01",),
)
def q16_join_inner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inner equi-join fact->dimension, revenue per market segment."""
    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer")
    return (
        orders.join(cust, orders.o_custkey == cust.c_custkey, "inner")
        .groupBy("c_mktsegment")
        .agg(dsum("o_totalprice").alias("segment_revenue"), F.count("*").alias("n_orders"))
        .transform(pin).orderBy("c_mktsegment")
    )


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skew-salted equi-join: the fact side gets a pseudo-random salt in
    [0, n_salts), the dim side is replicated n_salts times, and the join runs
    on (key, salt) — a hot key's rows spread over n_salts tasks instead of
    one straggler. The salt values never affect the RESULT (every fact row
    still meets its dim row exactly once), so the oracle is the plain join.

    AQE's skew-join splitting handles moderate skew automatically; explicit
    salting is for the pathological keys (one camera id = half the traffic)
    where a single post-split partition still exceeds a task. Dim replication
    costs n_salts x |dim| — use on small-to-medium dims only. Join types
    that preserve unmatched DIM rows (right/full outer) are rejected: the
    replicated dim would surface n_salts copies of each unmatched row."""
    if how in ("right", "rightouter", "right_outer", "full", "outer", "fullouter", "full_outer"):
        raise ValueError(f"salted_join cannot preserve unmatched dim rows (how={how!r})")
    salt = F.pmod(F.hash(*[F.col(c) for c in fact.columns]), F.lit(n_salts))
    fact_s = fact.withColumn("_salt", salt)
    dim_s = dim.withColumn("_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1))))
    return fact_s.join(dim_s, [key, "_salt"], how).drop("_salt")


@query(
    "q16c_salted_join",
    oracle=f"""
    SELECT c_mktsegment,
           {odsum('o_totalprice')} AS segment_revenue,
           COUNT(*) AS n_orders
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY c_mktsegment
    ORDER BY c_mktsegment
    """,
    tags=("J-01",),
)
def q16c_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q16 through the skew-salting path — same oracle, same result, hot-key
    rows spread across 8 tasks (the decomposition you reach for when one key
    dominates and even AQE's split partitions exceed a task)."""
    orders = load(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")
    cust = load(spark, sf_dir, "customer").selectExpr(
        "c_custkey AS o_custkey", "c_mktsegment"
    )
    return (
        salted_join(orders, cust, "o_custkey", n_salts=8)
        .groupBy("c_mktsegment")
        .agg(dsum("o_totalprice").alias("segment_revenue"), F.count("*").alias("n_orders"))
        .transform(pin).orderBy("c_mktsegment")
    )


@query(
    "q16b_broadcast_join",
    oracle=f"""
    SELECT c_mktsegment,
           {odsum('o_totalprice')} AS segment_revenue,
           COUNT(*) AS n_orders
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY c_mktsegment
    ORDER BY c_mktsegment
    """,
    tags=("J-02",),
)
def q16b_broadcast_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same result as q16 with an explicit broadcast hint: the fact table is
    never shuffled for the join — the plan that must hold at 100 TB where
    customer fits in memory but orders does not."""
    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer")
    return (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey, "inner")
        .groupBy("c_mktsegment")
        .agg(dsum("o_totalprice").alias("segment_revenue"), F.count("*").alias("n_orders"))
        .transform(pin).orderBy("c_mktsegment")
    )


@query(
    "q17_star_join",
    oracle=f"""
    SELECT r_name, n_name,
           {odsum('l_extendedprice * (1 - l_discount)', 6)} AS revenue,
           COUNT(*) AS n_lineitems
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    GROUP BY r_name, n_name
    ORDER BY r_name, n_name
    """,
    tags=("J-03",),
)
def q17_star_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-way star join: revenue by region/nation. Dimensions broadcast,
    the single fact-side shuffle is the lineitem⋈orders key exchange."""
    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer")
    nation = load(spark, sf_dir, "nation")
    region = load(spark, sf_dir, "region")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(
            dsum_expr("l_extendedprice * (1 - l_discount)", 6).alias("revenue"),
            F.count("*").alias("n_lineitems"),
        )
        .transform(pin).orderBy("r_name", "n_name")
    )


@query(
    "q18_left_join",
    oracle=f"""
    SELECT c_custkey, c_mktsegment,
           COUNT(o_orderkey) AS n_orders,
           COALESCE({odsum('o_totalprice')}, 0.0) AS customer_revenue
    FROM customer LEFT JOIN orders ON c_custkey = o_custkey
    GROUP BY c_custkey, c_mktsegment
    ORDER BY c_custkey
    """,
    tags=("J-04",),
)
def q18_left_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join keeping order-less customers (n_orders = 0, revenue 0)."""
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey", "c_mktsegment")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.coalesce(dsum("o_totalprice"), F.lit(0.0)).alias("customer_revenue"),
        )
        .transform(pin).orderBy("c_custkey")
    )


@query(
    "q19_semi_join",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer
    WHERE EXISTS (
        SELECT 1 FROM orders
        WHERE o_custkey = c_custkey AND o_totalprice > 400000
    )
    ORDER BY c_custkey
    """,
    tags=("J-05",),
)
def q19_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left semi join (EXISTS): customers with at least one 400k+ order.
    Semi joins ship only the join key of the right side — no payload shuffle."""
    cust = load(spark, sf_dir, "customer")
    big = load(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 400000)
    return (
        cust.join(big, cust.c_custkey == big.o_custkey, "left_semi")
        .select("c_custkey", "c_name")
        .transform(pin).orderBy("c_custkey")
    )


@query(
    "q20_anti_join",
    oracle="""
    SELECT c_mktsegment, COUNT(*) AS n_inactive
    FROM customer
    WHERE NOT EXISTS (
        SELECT 1 FROM orders
        WHERE o_custkey = c_custkey AND o_totalprice > 450000
    )
    GROUP BY c_mktsegment
    ORDER BY c_mktsegment
    """,
    tags=("J-06",),
)
def q20_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left anti join (NOT EXISTS): customers who never placed a 450k+ order,
    by segment (the all-customers-have-orders variant is vacuously empty on
    the testdata)."""
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 450000)
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("n_inactive"))
        .transform(pin).orderBy("c_mktsegment")
    )


PRICE_BANDS = [
    ("band_00_100k", 0.0, 100000.0),
    ("band_100_200k", 100000.0, 200000.0),
    ("band_200_300k", 200000.0, 300000.0),
    ("band_300_400k", 300000.0, 400000.0),
    ("band_400k_up", 400000.0, 1e12),
]


@query(
    "q21_range_join",
    oracle=f"""
    SELECT band,
           COUNT(*) AS n_orders,
           {odsum('o_totalprice')} AS band_revenue
    FROM orders
    JOIN (VALUES
        ('band_00_100k', 0.0, 100000.0),
        ('band_100_200k', 100000.0, 200000.0),
        ('band_200_300k', 200000.0, 300000.0),
        ('band_300_400k', 300000.0, 400000.0),
        ('band_400k_up', 400000.0, 1e12)
    ) AS bands(band, lo, hi)
      ON o_totalprice >= lo AND o_totalprice < hi
    GROUP BY band
    ORDER BY band
    """,
    tags=("J-07",),
)
def q21_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theta/range join against a tiny in-memory bands relation — plans as a
    broadcast nested-loop join, the only non-equi join shape that scales
    (never a cartesian shuffle)."""
    orders = load(spark, sf_dir, "orders")
    # literal relation built JVM-side (VALUES): createDataFrame over a python
    # list plans a Scan ExistingRDD that drags python workers into the query
    rows = ", ".join(f"('{b}', {lo}D, {hi}D)" for b, lo, hi in PRICE_BANDS)
    bands = spark.sql(f"SELECT * FROM VALUES {rows} AS bands(band, lo, hi)")
    return (
        orders.join(
            F.broadcast(bands),
            (orders.o_totalprice >= bands.lo) & (orders.o_totalprice < bands.hi),
        )
        .groupBy("band")
        .agg(F.count("*").alias("n_orders"), dsum("o_totalprice").alias("band_revenue"))
        .transform(pin).orderBy("band")
    )


@query(
    "q70_shipping_priority",
    oracle=f"""
    SELECT l_orderkey,
           {odsum('l_extendedprice * (1 - l_discount)', 6)} AS revenue,
           o_orderdate
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-01-01'
      AND l_shipdate  > TIMESTAMP '1998-01-01'
    GROUP BY l_orderkey, o_orderdate
    ORDER BY revenue DESC, o_orderdate, l_orderkey
    LIMIT 10
    """,
    tags=("J-03", "O-01", "A-01"),
)
def q70_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q3-shaped composite: segment filter -> star join -> revenue
    rollup -> top-10. Filters reach the parquet scans (pushdown), customer
    broadcasts, the final ORDER BY+LIMIT plans top-k — the composite proof
    that the certified operators assemble into classic OLAP unchanged."""
    cust = load(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = load(spark, sf_dir, "orders").filter(F.col("o_orderdate") < "1998-01-01")
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > "1998-01-01")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey)
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_orderkey", "o_orderdate")
        .agg(dsum_expr("l_extendedprice * (1 - l_discount)", 6).alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate")
        .transform(pin).orderBy(F.desc("revenue"), "o_orderdate", "l_orderkey")
        .limit(10)
    )


@query(
    "q71_returned_item_report",
    oracle=f"""
    SELECT c_custkey, c_name,
           {odsum('l_extendedprice * (1 - l_discount)', 6)} AS revenue,
           n_name
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation   ON c_nationkey = n_nationkey
    WHERE l_returnflag = 'R'
      AND o_orderdate >= TIMESTAMP '1997-01-01'
      AND o_orderdate <  TIMESTAMP '1998-01-01'
    GROUP BY c_custkey, c_name, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
    tags=("J-03", "O-01", "A-01"),
)
def q71_returned_item_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q10-shaped composite: lost-revenue ranking over returned items
    in a date window — return-flag and date filters push into the scans,
    nation broadcasts, top-20 plans TakeOrderedAndProject."""
    cust = load(spark, sf_dir, "customer")
    nation = load(spark, sf_dir, "nation")
    orders = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1997-01-01") & (F.col("o_orderdate") < "1998-01-01")
    )
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey)
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(dsum_expr("l_extendedprice * (1 - l_discount)", 6).alias("revenue"))
        .select("c_custkey", "c_name", "revenue", "n_name")
        .transform(pin).orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


@query(
    "q72_asof_join",
    oracle="""
    WITH ev AS (
        SELECT event_id, user_id % 100 AS k, ts FROM events
    ), px AS (
        SELECT o_custkey % 100 AS k,
               o_orderdate::TIMESTAMP AS t,
               max(o_totalprice) AS last_price
        FROM orders GROUP BY 1, 2
    )
    SELECT ev.event_id, ev.k, ev.ts, px.last_price
    FROM ev ASOF LEFT JOIN px ON ev.k = px.k AND ev.ts >= px.t
    ORDER BY event_id
    """,
    tags=("J-11",),
)
def q72_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J-11 as-of join (beyond-reference): each event picks up the most
    recent order price at-or-before its timestamp for its customer bucket.
    One shuffle + in-partition sort via the tagged-union running-last window
    (operators/asof.py) — no range-join candidate blowup; the oracle is
    DuckDB's native ASOF LEFT JOIN, so the semantics are pinned to the
    textbook definition, nulls-before-first-quote included."""
    from ..operators.asof import asof_join

    ev = load(spark, sf_dir, "events").select(
        "event_id", (F.col("user_id") % 100).alias("k"), "ts"
    )
    px = (
        load(spark, sf_dir, "orders")
        .select(
            (F.col("o_custkey") % 100).alias("k"),
            F.col("o_orderdate").cast("timestamp").alias("t"),
            "o_totalprice",
        )
        .groupBy("k", "t")
        .agg(F.max("o_totalprice").alias("last_price"))
    )
    return (
        asof_join(ev, px, "k", "ts", "t", ["last_price"])
        .select("event_id", "k", "ts", "last_price")
        .transform(pin).orderBy("event_id")
    )


@query(
    "q77_interval_join_batch",
    oracle="""
    WITH b AS (
        SELECT user_id AS bu, ts AS buy_ts, event_id AS buy_id
        FROM events WHERE event_type = 'purchase'
    ), c AS (
        SELECT user_id AS cu, ts AS click_ts, event_id AS click_id
        FROM events WHERE event_type = 'click'
    )
    SELECT buy_id, click_id, buy_ts, click_ts
    FROM b JOIN c
      ON bu = cu
     AND click_ts BETWEEN buy_ts - INTERVAL 120 MINUTES AND buy_ts
    ORDER BY buy_id, click_id
    """,
    tags=("J-10",),
)
def q77_interval_join_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J-10 batch twin: purchases matched to the same user's clicks within
    the preceding 120 minutes — the exact pair set the watermarked
    stream-stream join (tests/test_streaming.py::
    test_stream_stream_interval_join, reference anchor SURVEY §2F J-10)
    must converge to, here as a deterministic batch query so the driver
    hash-checks it against DuckDB and the streaming PROP test compares
    against a hash-checked twin rather than an ad-hoc local join.

    Scale shape: bucketed interval join (operators/interval.py) — join key
    (user_id, 120-minute bucket), left side exploded to <= 2 buckets,
    exact BETWEEN post-filter. Candidates are bounded by interval
    co-occupancy instead of per-user all-pairs, and hot users spread
    across their timeline in the shuffle."""
    from ..operators.interval import interval_join

    ev = load(spark, sf_dir, "events")
    buys = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("bu"),
        F.col("ts").alias("buy_ts"),
        F.col("event_id").alias("buy_id"),
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("cu"),
        F.col("ts").alias("click_ts"),
        F.col("event_id").alias("click_id"),
    )
    pairs = interval_join(
        buys, clicks, "bu", "cu", "buy_ts", "click_ts", lower_s=-120 * 60, upper_s=0
    )
    return pairs.select("buy_id", "click_id", "buy_ts", "click_ts").transform(pin).orderBy(
        "buy_id", "click_id"
    )


@query(
    "q89_full_outer_join",
    oracle="""
    WITH p AS (
        SELECT user_id, CAST(ts AS DATE) AS day, COUNT(*) AS n_purchases
        FROM events WHERE event_type = 'purchase' GROUP BY user_id, day
    ),
    e AS (
        SELECT user_id, CAST(ts AS DATE) AS day, COUNT(*) AS n_errors
        FROM events WHERE event_type = 'error' GROUP BY user_id, day
    )
    SELECT COALESCE(p.user_id, e.user_id) AS user_id,
           CAST(COALESCE(p.day, e.day) AS TIMESTAMP) AS day,
           COALESCE(n_purchases, 0) AS n_purchases,
           COALESCE(n_errors, 0) AS n_errors
    FROM p FULL OUTER JOIN e ON p.user_id = e.user_id AND p.day = e.day
    ORDER BY user_id, day
    """,
    tags=("J-12",),
)
def q89_full_outer_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer join (J-12): per-user-day purchase counts against error
    counts, preserving days where only one side has activity — unmatched
    rows genuinely survive from BOTH sides (purchase-only and error-only
    user-days). Shuffle-hash/sort-merge on the composite key; full outer
    cannot broadcast (both sides' unmatched rows must surface), which is
    exactly why the salted-join helper rejects it."""
    ev = load(spark, sf_dir, "events")
    day = F.to_date("ts").alias("day")
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", day)
        .agg(F.count("*").alias("n_purchases"))
    )
    e = (
        ev.filter(F.col("event_type") == "error")
        .groupBy("user_id", day)
        .agg(F.count("*").alias("n_errors"))
    )
    return (
        p.join(e, ["user_id", "day"], "full_outer")
        .select(
            "user_id",
            F.col("day").cast("timestamp").alias("day"),
            F.coalesce("n_purchases", F.lit(0)).alias("n_purchases"),
            F.coalesce("n_errors", F.lit(0)).alias("n_errors"),
        )
        .transform(pin)
        .orderBy("user_id", "day")
    )


@query(
    "q89b_right_outer_join",
    oracle=f"""
    SELECT c_custkey, c_mktsegment,
           COUNT(o_orderkey) AS n_orders,
           COALESCE({odsum('o_totalprice')}, 0.0) AS customer_revenue
    FROM orders RIGHT JOIN customer ON o_custkey = c_custkey
    GROUP BY c_custkey, c_mktsegment
    ORDER BY c_custkey
    """,
    tags=("J-12",),
)
def q89b_right_outer_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Right outer join — q18's mirror with the fact side on the left:
    order-less customers still appear because the RIGHT (customer) side is
    preserved. Catalyst canonicalizes this to the same plan as the left
    join, which is the point: direction is syntax, not execution."""
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    return (
        orders.join(cust, orders.o_custkey == cust.c_custkey, "right")
        .groupBy("c_custkey", "c_mktsegment")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.coalesce(dsum("o_totalprice"), F.lit(0.0)).alias("customer_revenue"),
        )
        .transform(pin)
        .orderBy("c_custkey")
    )


@query(
    "q95_tpch_q5_local_supplier",
    oracle=f"""
    SELECT n_name,
           {odsum('l_extendedprice * (1 - l_discount)', 6)} AS revenue,
           COUNT(*) AS n_lineitems
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE c_nationkey = s_nationkey
      AND r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate <  TIMESTAMP '1997-01-01'
    GROUP BY n_name
    ORDER BY revenue DESC, n_name
    """,
    tags=("J-03",),
)
def q95_tpch_q5_local_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 (local supplier volume): six-way join where customer and
    supplier must share a nation — the canonical join-order benchmark.

    Scale shape: the one genuinely big join (lineitem x orders) shuffles on
    the 8-byte orderkey with the date filter pushed to the orders scan
    FIRST (Catalyst pushes it below the join, shrinking the build side a
    year's worth); supplier/nation/region broadcast; the c_nationkey =
    s_nationkey filter applies post-join as a cheap residual. AQE re-plans
    the orders side to broadcast if the filtered year is small enough."""
    cust = load(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    orders = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1997-01-01")
    ).select("o_orderkey", "o_custkey")
    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    supp = load(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nation = load(spark, sf_dir, "nation")
    region = load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .filter(F.col("c_nationkey") == F.col("s_nationkey"))
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(
            dsum_expr("l_extendedprice * (1 - l_discount)", 6).alias("revenue"),
            F.count("*").alias("n_lineitems"),
        )
        .transform(pin)
        .orderBy(F.desc("revenue"), F.asc("n_name"))
    )


@query(
    "q96_tpch_q3_shipping_priority",
    oracle=f"""
    SELECT l_orderkey,
           {odsum('l_extendedprice * (1 - l_discount)', 6)} AS revenue,
           o_orderdate, o_orderpriority
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1997-03-15'
      AND l_shipdate  > TIMESTAMP '1997-03-15'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, o_orderdate, l_orderkey
    LIMIT 10
    """,
    tags=("J-03", "O-01"),
)
def q96_tpch_q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 (shipping priority): top-10 unshipped orders by revenue for
    one market segment — filter-heavy join + grouped top-k.

    Scale shape: both date filters and the segment filter push to the
    scans; customer (filtered to one segment) broadcasts into orders, the
    orders->lineitem join shuffles on orderkey only after orders shrank;
    the final ORDER BY ... LIMIT 10 is TakeOrderedAndProject — no global
    sort materializes. Revenue is decimal-exact so the DESC order is
    engine-stable; (o_orderdate, l_orderkey) break ties totally."""
    cust = load(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    ).select("c_custkey")
    orders = load(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < "1997-03-15"
    ).select("o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority")
    li = load(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > "1997-03-15"
    ).select("l_orderkey", "l_extendedprice", "l_discount")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(dsum_expr("l_extendedprice * (1 - l_discount)", 6).alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.desc("revenue"), F.asc("o_orderdate"), F.asc("l_orderkey"))
        .limit(10)
    )


# ---------------------------------------------------------------------------
# J-05 (cont.): relational division (the universal-quantifier join)
# ---------------------------------------------------------------------------


@query(
    "q379_relational_division",
    oracle="""
    WITH region_nations AS (
        SELECT n.n_nationkey FROM nation n
        JOIN region r ON r.r_regionkey = n.n_regionkey
        WHERE r.r_name = 'REGION_1'
    ),
    ships_to AS (
        SELECT DISTINCT l.l_suppkey, c.c_nationkey
        FROM lineitem l
        JOIN orders o ON o.o_orderkey = l.l_orderkey
        JOIN customer c ON c.c_custkey = o.o_custkey
        WHERE c.c_nationkey IN (SELECT n_nationkey FROM region_nations)
    ),
    divided AS (
        SELECT l_suppkey FROM ships_to
        GROUP BY l_suppkey
        HAVING COUNT(*) = (SELECT COUNT(*) FROM region_nations)
    )
    SELECT s.s_suppkey, s.s_name,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM region_nations)
               AS n_nations_required
    FROM supplier s JOIN divided d ON d.l_suppkey = s.s_suppkey
    ORDER BY s.s_suppkey
    """,
    tags=("J-05", "A-04"),
)
def q379_relational_division(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Relational DIVISION (the universal quantifier): suppliers who have
    shipped to customers in EVERY nation of one region — the 'for all'
    query shape (Codd's division) that naive SQL writes as a double
    NOT EXISTS and that trips every ORM. Implemented as the count-based
    division: distinct (supplier, nation) pairs restricted to the
    divisor set, grouped per supplier, kept when the distinct-nation
    count equals the divisor's size. The one classical relational
    operator the engine's join family (semi/anti/outer/theta) didn't
    yet name explicitly.

    Determinism: set sizes are exact; the divisor count broadcasts.

    Scale shape: the divisor (region's nations) is tiny and broadcasts
    into the fact as an IN filter that pushes below the joins; the
    distinct (supplier, nation) reduction is ONE map-side-combined
    rollup (the pair domain is |suppliers| x |divisor|, far below the
    fact); the HAVING compares against a broadcast scalar. The double-
    NOT-EXISTS formulation would plan two correlated anti-joins — this
    is the shape a 100 TB division should compile to.

    Reference parity: beyond-reference; completes the join-algebra
    family (J-01..J-12) with division."""
    nations = (
        load(spark, sf_dir, "nation")
        .join(
            F.broadcast(
                load(spark, sf_dir, "region").filter(
                    F.col("r_name") == "REGION_1"
                )
            ),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("n_nationkey")
        .transform(stage)  # filter leg + count leg share one build
    )
    n_required = nations.agg(F.count(F.lit(1)).cast("long").alias("n_req"))
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = load(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    ships_to = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(
            F.broadcast(nations),
            F.col("c_nationkey") == F.col("n_nationkey"),
            "left_semi",
        )
        .groupBy("l_suppkey", "c_nationkey")
        .agg(F.count(F.lit(1)).alias("_n"))
    )
    divided = (
        ships_to.groupBy("l_suppkey")
        .agg(F.count(F.lit(1)).alias("n_nations"))
        .join(F.broadcast(n_required))
        .filter(F.col("n_nations") == F.col("n_req"))
        .select("l_suppkey")
    )
    supp = load(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        supp.join(divided, supp.s_suppkey == F.col("l_suppkey"), "left_semi")
        .join(F.broadcast(n_required))
        .select(
            "s_suppkey", "s_name", F.col("n_req").alias("n_nations_required")
        )
        .transform(pin)
        .orderBy("s_suppkey")
    )


# ---------------------------------------------------------------------------
# J-01 (cont.): null-safe equi-join (the <=> / IS NOT DISTINCT FROM semantics)
# ---------------------------------------------------------------------------


@query(
    "q388_nullsafe_join",
    oracle="""
    WITH a AS (
        SELECT CASE WHEN value > 400 THEN event_type END AS k,
               CAST(COUNT(*) AS BIGINT) AS n_a
        FROM events WHERE event_id % 2 = 0 GROUP BY k
    ),
    b AS (
        SELECT CASE WHEN value > 400 THEN event_type END AS k,
               CAST(COUNT(*) AS BIGINT) AS n_b
        FROM events WHERE event_id % 2 = 1 GROUP BY k
    )
    SELECT COALESCE(a.k, '<NULL>') AS join_key, a.n_a, b.n_b
    FROM a JOIN b ON a.k IS NOT DISTINCT FROM b.k
    ORDER BY join_key
    """,
    tags=("J-01", "F-13"),
)
def q388_nullsafe_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equi-join (`<=>` / IS NOT DISTINCT FROM): two halves of
    the stream aggregated on a DELIBERATELY nullable key (low-value
    events collapse to NULL) and joined so the NULL groups MATCH — the
    semantics an ordinary equi-join silently drops (NULL = NULL is
    never true), which is the classic silent-data-loss bug when a
    dimension key is optional. The NULL row surviving into the result
    IS the certification.

    Determinism: exact counts; the null bucket labels as '<NULL>' for a
    hashable output.

    Scale shape: both sides reduce to bounded (key, count) relations
    before the join; Spark plans `<=>` as an ordinary hash join key
    (null-safe equality is hash-compatible — no fallback to
    nested-loop), which is why this semantics is free at 100 TB.

    Reference parity: beyond-reference; completes J-01's equality
    semantics (plain, salted, and null-safe) with F-13's null
    discipline."""
    ev = load(spark, sf_dir, "events").select(
        "event_id",
        F.when(F.col("value") > 400, F.col("event_type")).alias("k"),
    )
    a = (
        ev.filter(F.col("event_id") % 2 == 0)
        .groupBy("k")
        .agg(F.count(F.lit(1)).cast("long").alias("n_a"))
    )
    b = (
        ev.filter(F.col("event_id") % 2 == 1)
        .groupBy("k")
        .agg(F.count(F.lit(1)).cast("long").alias("n_b"))
    )
    return (
        a.join(b, a["k"].eqNullSafe(b["k"]))
        .select(
            F.coalesce(a["k"], F.lit("<NULL>")).alias("join_key"),
            "n_a",
            "n_b",
        )
        .transform(pin)
        .orderBy("join_key")
    )
