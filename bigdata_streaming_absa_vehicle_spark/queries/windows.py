"""Window functions (SURVEY.md §2G, W-01..W-03): ranking, lag/lead trend
deltas, frame-spec running aggregates. These make the dashboards' pandas
trend math (vehicle streamlit_app.py:111-124) relational.

Scale notes: a window over partitionBy(k) shuffles on k once and sorts within
partitions — no global sort. Where possible the window runs over a
pre-aggregated set (q22w: per-minute rows, not raw events).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..functions.deterministic import oracle_dsum as odsum
from ..tables import load
from .registry import query
from ..functions.ordering import pin

_DECIMAL = "decimal(28,2)"


@query(
    "q22w_lag_delta",
    oracle="""
    WITH per_minute AS (
        SELECT event_type, date_trunc('minute', ts) AS minute, COUNT(*) AS n
        FROM events GROUP BY 1, 2
    )
    SELECT event_type, minute, n,
           n - LAG(n, 1) OVER (PARTITION BY event_type ORDER BY minute) AS delta_vs_prev
    FROM per_minute
    ORDER BY event_type, minute
    """,
    tags=("W-02", "A-06"),
)
def q22w_lag_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-minute count delta vs previous minute — the dashboard's trend line
    (vehicle streamlit_app.py:111-124) as a lag window over the aggregate."""
    ev = load(spark, sf_dir, "events")
    per_minute = ev.groupBy(
        "event_type", F.date_trunc("minute", "ts").alias("minute")
    ).agg(F.count("*").alias("n"))
    w = W.partitionBy("event_type").orderBy("minute")
    return (
        per_minute.withColumn("delta_vs_prev", F.col("n") - F.lag("n", 1).over(w))
        .transform(pin).orderBy("event_type", "minute")
    )


@query(
    "q23w_running_sum",
    oracle=f"""
    SELECT o_custkey, o_orderkey, o_orderdate,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(28,2))) OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS DOUBLE) AS running_spend
    FROM orders
    ORDER BY o_custkey, o_orderdate, o_orderkey
    """,
    tags=("W-03",),
)
def q23w_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running per-customer spend (frame-spec aggregate). Decimal-exact inside
    the frame so the running values hash-match the oracle."""
    orders = load(spark, sf_dir, "orders")
    w = (
        W.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return (
        orders.select(
            "o_custkey",
            "o_orderkey",
            "o_orderdate",
            F.sum(F.col("o_totalprice").cast(_DECIMAL)).over(w).cast("double").alias("running_spend"),
        )
        .transform(pin).orderBy("o_custkey", "o_orderdate", "o_orderkey")
    )


@query(
    "q24w_rank_dense",
    oracle="""
    SELECT c_nationkey, c_custkey, c_acctbal,
           RANK() OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC) AS bal_rank,
           DENSE_RANK() OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC) AS bal_dense_rank
    FROM customer
    ORDER BY c_nationkey, bal_rank, c_custkey
    """,
    tags=("W-01",),
)
def q24w_rank_dense(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rank/dense_rank per nation by account balance."""
    cust = load(spark, sf_dir, "customer")
    w = W.partitionBy("c_nationkey").orderBy(F.desc("c_acctbal"))
    return (
        cust.select(
            "c_nationkey",
            "c_custkey",
            "c_acctbal",
            F.rank().over(w).alias("bal_rank"),
            F.dense_rank().over(w).alias("bal_dense_rank"),
        )
        .transform(pin).orderBy("c_nationkey", "bal_rank", "c_custkey")
    )


@query(
    "q25w_moving_avg",
    oracle=f"""
    WITH per_minute AS (
        SELECT date_trunc('minute', ts) AS minute,
               {odsum('value')} AS minute_value
        FROM events GROUP BY 1
    )
    SELECT minute, minute_value,
           CAST(SUM(CAST(minute_value AS DECIMAL(28,2))) OVER (
               ORDER BY minute ROWS BETWEEN 5 PRECEDING AND CURRENT ROW
           ) AS DOUBLE) AS moving_sum_6
    FROM per_minute
    ORDER BY minute
    """,
    tags=("W-03", "A-06"),
)
def q25w_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """6-bucket moving window over the per-minute series (trend smoothing,
    the batch twin of the T-06 sliding window).

    Scale shape: the unpartitioned window scans the PER-MINUTE rollup — a
    relation bounded by the time domain (minutes in range), not the fact
    table; the facts reduce map-side in the groupBy first."""
    ev = load(spark, sf_dir, "events")
    per_minute = ev.groupBy(F.date_trunc("minute", "ts").alias("minute")).agg(
        F.sum(F.col("value").cast(_DECIMAL)).cast("double").alias("minute_value")
    )
    w = W.orderBy("minute").rowsBetween(-5, W.currentRow)
    return (
        per_minute.withColumn(
            "moving_sum_6",
            F.sum(F.col("minute_value").cast(_DECIMAL)).over(w).cast("double"),
        )
        .transform(pin).orderBy("minute")
    )


@query(
    "q92_rank_family_full",
    oracle="""
    SELECT o_orderkey, o_orderpriority,
           ntile(4) OVER w AS price_quartile,
           percent_rank() OVER w AS pct_rank,
           cume_dist() OVER w AS cume,
           first_value(o_orderkey) OVER wf AS cheapest_key,
           last_value(o_orderkey) OVER wf AS priciest_key,
           nth_value(o_orderkey, 3) OVER wf AS third_key
    FROM orders
    WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey),
           wf AS (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey
                  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    ORDER BY o_orderkey
    """,
    tags=("W-01",),
)
def q92_rank_family_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The rest of the ranking-function family beyond W-01's
    row_number/rank/dense_rank: ntile, percent_rank, cume_dist, and the
    frame-navigation trio first/last/nth_value — all over a (o_totalprice,
    o_orderkey) tie-broken total order so every function is deterministic
    (ntile bucket boundaries and the VALUE functions are order-sensitive;
    a non-total order would flake across engines). One shuffle on the
    partition key, one sort, all eight functions in a single WindowExec."""
    orders = load(spark, sf_dir, "orders")
    w = W.partitionBy("o_orderpriority").orderBy("o_totalprice", "o_orderkey")
    wf = w.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    return (
        orders.select(
            "o_orderkey",
            "o_orderpriority",
            F.ntile(4).over(w).alias("price_quartile"),
            F.percent_rank().over(w).alias("pct_rank"),
            F.cume_dist().over(w).alias("cume"),
            F.first_value("o_orderkey").over(wf).alias("cheapest_key"),
            F.last_value("o_orderkey").over(wf).alias("priciest_key"),
            F.nth_value("o_orderkey", 3).over(wf).alias("third_key"),
        )
        .transform(pin)
        .orderBy("o_orderkey")
    )
