"""Additional TPC-H-shaped analytics over the driver testdata schema
(extends the q95/q96 star-join family and the q97-q99 subquery family):
Q7 volume shipping, Q8 market share, Q13 order-count distribution,
Q14 promo revenue, Q19 disjunctive-predicate join, Q22 adapted.

The testdata is TPC-H-ish, not TPC-H (no partsupp, no l_shipmode/
l_commitdate, no c_phone), so each query keeps its canonical TPC-H *shape*
— the join topology, predicate structure, and aggregation pattern that make
it a planner benchmark — with predicates adapted to the columns that exist.
Doubles aggregate through the decimal-exact helpers so hashes are stable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.deterministic import dsum, dsum_expr, oracle_dsum as odsum
from ..functions.ordering import pin
from ..tables import load
from .registry import query


@query(
    "q107_tpch_q7_volume_shipping",
    oracle=f"""
    SELECT supp_nation, cust_nation, l_year,
           {odsum('volume', 6)} AS revenue,
           COUNT(*) AS n_lineitems
    FROM (
        SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
               year(l_shipdate) AS l_year,
               l_extendedprice * (1 - l_discount) AS volume
        FROM supplier
        JOIN lineitem ON s_suppkey = l_suppkey
        JOIN orders   ON o_orderkey = l_orderkey
        JOIN customer ON c_custkey = o_custkey
        JOIN nation n1 ON s_nationkey = n1.n_nationkey
        JOIN nation n2 ON c_nationkey = n2.n_nationkey
        WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
            OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
          AND l_shipdate >= TIMESTAMP '1995-01-01'
          AND l_shipdate <  TIMESTAMP '1997-01-01'
    )
    GROUP BY supp_nation, cust_nation, l_year
    ORDER BY supp_nation, cust_nation, l_year
    """,
    tags=("J-03",),
)
def q107_tpch_q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 (volume shipping): bilateral trade volume between two
    nations by year — the double-dimension-alias join (nation joined TWICE
    under different roles) with a disjunctive cross-filter.

    Scale shape: the nation pair filter cannot push below either single
    join, but both nation joins BROADCAST (25 rows) so the only shuffles
    are lineitem->orders->customer on their 8-byte keys; the date filter
    pushes to the lineitem scan, halving it before any join. year() stays
    in codegen."""
    n1 = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1995-01-01") & (F.col("l_shipdate") < "1997-01-01")
    ).select("l_orderkey", "l_suppkey", "l_shipdate", "l_extendedprice", "l_discount")
    orders = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cust = load(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    supp = load(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    pair = (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2") | (
        F.col("supp_nation") == "NATION_2"
    ) & (F.col("cust_nation") == "NATION_1")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(pair)
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(
            dsum_expr("l_extendedprice * (1 - l_discount)", 6).alias("revenue"),
            F.count(F.lit(1)).alias("n_lineitems"),
        )
        .transform(pin)
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


@query(
    "q108_tpch_q14_promo_revenue",
    oracle=f"""
    SELECT ROUND(
             100.0 * {odsum("CASE WHEN p_type = 'PROMO' THEN l_extendedprice * (1 - l_discount) ELSE 0 END", 6)}
                   / {odsum('l_extendedprice * (1 - l_discount)', 6)},
             6) AS promo_revenue_pct,
           COUNT(*) AS n_lineitems
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1997-09-01'
      AND l_shipdate <  TIMESTAMP '1997-10-01'
    """,
    tags=("J-01", "A-03"),
)
def q108_tpch_q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 (promo revenue): percentage of one month's revenue from
    promo parts — conditional aggregation over a fact-dimension join,
    reduced to a single row. Both sums are decimal-exact; the ratio is one
    IEEE division identical in both engines.

    Scale shape: the month filter prunes lineitem at the scan; part joins
    on the 8-byte partkey (broadcast when the dim fits, AQE decides);
    conditional SUM is a map-side combine — one row crosses the final
    exchange."""
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1997-09-01") & (F.col("l_shipdate") < "1997-10-01")
    ).select("l_partkey", "l_extendedprice", "l_discount")
    part = load(spark, sf_dir, "part").select("p_partkey", "p_type")
    joined = li.join(part, li.l_partkey == part.p_partkey)
    promo = dsum_expr(
        "CASE WHEN p_type = 'PROMO' THEN l_extendedprice * (1 - l_discount) ELSE 0 END", 6
    )
    total = dsum_expr("l_extendedprice * (1 - l_discount)", 6)
    return joined.agg(
        F.round(F.lit(100.0) * promo / total, 6).alias("promo_revenue_pct"),
        F.count(F.lit(1)).alias("n_lineitems"),
    )


@query(
    "q109_tpch_q19_disjunctive",
    oracle=f"""
    SELECT {odsum('l_extendedprice * (1 - l_discount)', 6)} AS revenue,
           COUNT(*) AS n_lineitems
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#11' AND p_size BETWEEN 1 AND 5  AND l_quantity BETWEEN 1 AND 11)
       OR (p_brand = 'Brand#13' AND p_size BETWEEN 1 AND 10 AND l_quantity BETWEEN 10 AND 20)
       OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 20 AND 30)
    """,
    tags=("J-01", "P-04"),
)
def q109_tpch_q19_disjunctive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 (discounted revenue): an OR of three conjunct groups
    spanning BOTH join sides — the classic disjunctive-predicate planning
    test. A naive planner evaluates the OR as a post-join residual on the
    full join; a good one still pushes the derivable single-side
    implications (p_brand IN (...), p_size >= 1, l_quantity ranges) below
    the join as scan filters.

    Scale shape: Catalyst's constraint propagation extracts the IN-list
    and range bounds to both scans (visible as PushedFilters), the join
    stays a partkey equi-join with the OR as residual, and the result is
    one row — map-side-combined."""
    li = load(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice", "l_discount"
    )
    part = load(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    cond = (
        (F.col("p_brand") == "Brand#11")
        & F.col("p_size").between(1, 5)
        & F.col("l_quantity").between(1, 11)
        | (F.col("p_brand") == "Brand#13")
        & F.col("p_size").between(1, 10)
        & F.col("l_quantity").between(10, 20)
        | (F.col("p_brand") == "Brand#23")
        & F.col("p_size").between(1, 15)
        & F.col("l_quantity").between(20, 30)
    )
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .filter(cond)
        .agg(
            dsum_expr("l_extendedprice * (1 - l_discount)", 6).alias("revenue"),
            F.count(F.lit(1)).alias("n_lineitems"),
        )
    )


@query(
    "q110_tpch_q13_order_distribution",
    oracle="""
    SELECT c_count, COUNT(*) AS custdist
    FROM (
        SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
        FROM customer c
        LEFT JOIN orders o
          ON c.c_custkey = o.o_custkey AND o.o_orderpriority <> '1-URGENT'
        GROUP BY c.c_custkey
    )
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
    tags=("J-04", "A-02"),
)
def q110_tpch_q13_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 (customer order-count distribution): LEFT JOIN with an
    extra non-equi predicate in the ON clause (NOT the WHERE — moving it
    to WHERE would silently drop the zero-order customers), then a
    two-level aggregation: orders per customer, customers per order-count.

    Scale shape: the join shuffles both sides on custkey once; the first
    aggregate reuses that partitioning (no second exchange — count per
    custkey is partition-local after the join), and only the tiny
    (c_count, custdist) histogram crosses the final shuffle."""
    cust = load(spark, sf_dir, "customer").select("c_custkey")
    orders = load(spark, sf_dir, "orders").select("o_custkey", "o_orderkey", "o_orderpriority")
    per_cust = (
        cust.join(
            orders,
            (cust.c_custkey == orders.o_custkey)
            & (orders.o_orderpriority != "1-URGENT"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .transform(pin)
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


@query(
    "q111_tpch_q8_market_share",
    oracle=f"""
    SELECT o_year,
           ROUND({odsum("CASE WHEN supp_nation = 'NATION_3' THEN volume ELSE 0 END", 6)}
                 / {odsum('volume', 6)}, 6) AS mkt_share,
           COUNT(*) AS n_lineitems
    FROM (
        SELECT year(o_orderdate) AS o_year,
               l_extendedprice * (1 - l_discount) AS volume,
               n2.n_name AS supp_nation
        FROM part
        JOIN lineitem ON p_partkey = l_partkey
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation n1 ON c_nationkey = n1.n_nationkey
        JOIN region   ON n1.n_regionkey = r_regionkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation n2 ON s_nationkey = n2.n_nationkey
        WHERE r_name = 'ASIA'
          AND o_orderdate >= TIMESTAMP '1995-01-01'
          AND o_orderdate <  TIMESTAMP '1997-01-01'
          AND p_type = 'ECONOMY'
    )
    GROUP BY o_year
    ORDER BY o_year
    """,
    tags=("J-03", "A-09"),
)
def q111_tpch_q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 (national market share): NATION_3's share of ECONOMY-part
    revenue sold into ASIA by year — an eight-way star join where one
    nation alias filters the CUSTOMER side (via region) and the other
    merely LABELS the supplier side for the conditional sum.

    Scale shape: p_type pushes to the part scan and that filtered dim
    broadcasts into lineitem FIRST (the most selective reduction);
    orders/customer join on their keys; region+both nations broadcast.
    The share division happens on two decimal-exact sums per year."""
    part = load(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY").select("p_partkey")
    li = load(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    orders = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1995-01-01") & (F.col("o_orderdate") < "1997-01-01")
    ).select("o_orderkey", "o_custkey", "o_orderdate")
    cust = load(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n1 = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_regionkey").alias("n1_region")
    )
    region = load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA").select("r_regionkey")
    supp = load(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n2 = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("supp_nation")
    )
    share = dsum_expr(
        "CASE WHEN supp_nation = 'NATION_3' THEN l_extendedprice * (1 - l_discount) ELSE 0 END",
        6,
    )
    total = dsum_expr("l_extendedprice * (1 - l_discount)", 6)
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("n1_key"))
        .join(F.broadcast(region), F.col("n1_region") == F.col("r_regionkey"))
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("n2_key"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            F.round(share / total, 6).alias("mkt_share"),
            F.count(F.lit(1)).alias("n_lineitems"),
        )
        .transform(pin)
        .orderBy("o_year")
    )


@query(
    "q112_tpch_q22_global_sales",
    oracle=f"""
    WITH avg_bal AS (
        SELECT {odsum('c_acctbal', 2)} / COUNT(*) AS a
        FROM customer WHERE c_acctbal > 0.0
    )
    SELECT c_nationkey % 5 AS cntrycode,
           COUNT(*) AS numcust,
           {odsum('c_acctbal', 2)} AS totacctbal
    FROM customer, avg_bal
    WHERE c_acctbal > avg_bal.a
      AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    GROUP BY cntrycode
    ORDER BY cntrycode
    """,
    tags=("J-06", "A-01"),
)
def q112_tpch_q22_global_sales(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 (global sales opportunity): rich customers (balance above
    the positive-balance average — an uncorrelated scalar subquery) who
    have NEVER ordered (anti join), bucketed by country code. The scalar
    average is decimal-exact so the > threshold cannot flake on the last
    bit.

    Scale shape: the scalar aggregate is one row, broadcast into the
    customer scan as a filter; the anti join shuffles customer against
    orders' custkey projection ONLY (two 8-byte columns); the final
    aggregate is 5 groups, map-side combined."""
    cust = load(spark, sf_dir, "customer").select("c_custkey", "c_nationkey", "c_acctbal")
    avg_bal = (
        cust.filter(F.col("c_acctbal") > 0.0)
        .agg((dsum("c_acctbal", 2) / F.count(F.lit(1))).alias("a"))
    )
    orders = load(spark, sf_dir, "orders").select("o_custkey")
    rich = cust.join(F.broadcast(avg_bal)).filter(F.col("c_acctbal") > F.col("a"))
    never_ordered = rich.join(
        orders, rich.c_custkey == orders.o_custkey, "left_anti"
    )
    return (
        never_ordered.groupBy((F.col("c_nationkey") % 5).alias("cntrycode"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            dsum("c_acctbal", 2).alias("totacctbal"),
        )
        .transform(pin)
        .orderBy("cntrycode")
    )


@query(
    "q126_tpch_q9_product_profit",
    oracle=f"""
    SELECT n_name AS supp_nation, l_year,
           {odsum('l_extendedprice * (1 - l_discount) - p_retailprice * 0.08 * l_quantity', 6)}
               AS profit,
           COUNT(*) AS n_lineitems
    FROM (
        SELECT n.n_name, year(o.o_orderdate) AS l_year,
               l.l_extendedprice, l.l_discount, l.l_quantity, p.p_retailprice
        FROM lineitem l
        JOIN part p ON p.p_partkey = l.l_partkey
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        JOIN nation n ON n.n_nationkey = s.s_nationkey
        JOIN orders o ON o.o_orderkey = l.l_orderkey
        WHERE p.p_name LIKE '%gear%'
    )
    GROUP BY supp_nation, l_year
    ORDER BY supp_nation, l_year DESC
    """,
    tags=("J-03", "A-01"),
)
def q126_tpch_q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 (product-type profit): per-nation, per-year profit on one
    part family. The testdata has no partsupp, so supply cost is the
    deterministic proxy p_retailprice * 0.08 (per-row IEEE math, identical
    in both engines); the profit sum takes the decimal detour.

    Scale shape: the p_name LIKE filter prunes part BEFORE its join —
    Catalyst pushes it to the scan, and the filtered dim (plus supplier and
    nation) broadcasts, so the only big shuffle is lineitem->orders on the
    8-byte orderkey. year() stays in codegen; two-column group key."""
    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_quantity", "l_extendedprice", "l_discount"
    )
    part = (
        load(spark, sf_dir, "part")
        .filter(F.col("p_name").like("%gear%"))
        .select("p_partkey", "p_retailprice")
    )
    supp = load(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nation = load(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    orders = load(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy(
            F.col("n_name").alias("supp_nation"),
            F.year("o_orderdate").alias("l_year"),
        )
        .agg(
            dsum_expr(
                "l_extendedprice * (1 - l_discount) - p_retailprice * 0.08 * l_quantity", 6
            ).alias("profit"),
            F.count(F.lit(1)).alias("n_lineitems"),
        )
        .transform(pin)
        .orderBy(F.col("supp_nation"), F.col("l_year").desc())
    )


@query(
    "q127_tpch_q12_priority_class",
    oracle="""
    SELECT l_returnflag AS ship_class,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate <  TIMESTAMP '1998-01-01'
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
    tags=("J-01", "A-01"),
)
def q127_tpch_q12_priority_class(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 (shipping-priority classes): one year of lineitems bucketed
    by return flag (the testdata's stand-in for l_shipmode), counting
    urgent/high-priority orders against the rest — the canonical
    conditional-CASE aggregation over a fact-fact join.

    Scale shape: the ship-date filter pushes to the lineitem scan (one year
    of data read, PushedFilters-asserted for the family); the orders join
    shuffles both sides on the 8-byte orderkey; both CASE-sums are map-side
    combines, so 3 rows cross the final exchange. Integer sums are exact —
    no decimal detour needed."""
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1997-01-01") & (F.col("l_shipdate") < "1998-01-01")
    ).select("l_orderkey", "l_returnflag")
    orders = load(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy(F.col("l_returnflag").alias("ship_class"))
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
        .transform(pin)
        .orderBy("ship_class")
    )


@query(
    "q129_tpch_q16_supplier_count",
    oracle="""
    WITH supply AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem)
    SELECT p_brand, p_type, p_size,
           COUNT(DISTINCT l_suppkey) AS supplier_cnt
    FROM part
    JOIN supply ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#3'
      AND p_type <> 'PROMO'
      AND p_size IN (1, 4, 9, 16, 25, 36, 49)
      AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p_brand, p_type, p_size
    ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
    """,
    tags=("J-06", "A-04"),
)
def q129_tpch_q16_supplier_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 (supplier-relationship count): distinct suppliers able to
    supply each qualifying (brand, type, size) bucket, excluding suppliers
    with negative balances (the testdata's stand-in for the complaints NOT
    IN subquery). No partsupp table, so the supply relation is DISTINCT
    (l_partkey, l_suppkey) from lineitem.

    Scale shape: the pair-distinct is one shuffle on a 16-byte composite
    key; the exclusion list (negative-balance suppliers) is tiny and plans
    as a BROADCAST anti join; part's brand/type/size filters push to its
    scan and the filtered dim broadcasts. The final count-distinct shuffles
    on the 3-column group key only."""
    supply = (
        load(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey").distinct()
    )
    part = (
        load(spark, sf_dir, "part")
        .filter(
            (F.col("p_brand") != "Brand#3")
            & (F.col("p_type") != "PROMO")
            & F.col("p_size").isin(1, 4, 9, 16, 25, 36, 49)
        )
        .select("p_partkey", "p_brand", "p_type", "p_size")
    )
    bad_supp = (
        load(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .select(F.col("s_suppkey").alias("bad_suppkey"))
    )
    return (
        supply.join(
            F.broadcast(bad_supp),
            supply.l_suppkey == bad_supp.bad_suppkey,
            "left_anti",
        )
        .join(F.broadcast(part), supply.l_partkey == part.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
        .transform(pin)
        .orderBy(F.col("supplier_cnt").desc(), "p_brand", "p_type", "p_size")
    )


@query(
    "q139_tpch_q11_important_parts",
    oracle=f"""
    WITH rel AS (
        SELECT l_partkey, l_extendedprice * (1 - l_discount) AS val
        FROM lineitem
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation   ON s_nationkey = n_nationkey
        WHERE n_name = 'NATION_3'
    ),
    tot AS (
        SELECT {odsum('val', 6)} AS total,
               COUNT(DISTINCT l_partkey) AS np
        FROM rel
    )
    SELECT l_partkey, {odsum('val', 6)} AS value
    FROM rel, tot
    GROUP BY l_partkey, tot.total, tot.np
    HAVING {odsum('val', 6)} > 1.5 / tot.np * tot.total
    ORDER BY value DESC, l_partkey
    """,
    tags=("SQ-02", "A-01"),
)
def q139_tpch_q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 (important stock) shape: per-part revenue for one nation's
    suppliers, keeping only parts whose share exceeds a GLOBAL-scalar
    threshold — the uncorrelated scalar subquery in HAVING that forces two
    aggregations over the same filtered relation. The canonical fixed
    fraction is made scale-free (1.5x the mean per-part share, with the
    part count a second scalar from the same subquery) so the query stays
    selective at every SF.

    Scale shape: the filtered relation computes ONCE conceptually —
    per-part agg and grand total are two aggregates over the same scan
    (Catalyst reuses the exchange under AQE); the 1-row total
    cross-joins in as a broadcast, so the HAVING is a map-only filter on
    the per-part agg, never a second pass. Both nation and supplier
    broadcast; the only real shuffle is lineitem on l_partkey."""
    li = load(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    supp = load(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nat = (
        load(spark, sf_dir, "nation")
        .filter(F.col("n_name") == "NATION_3")
        .select("n_nationkey")
    )
    rel = (
        li.join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nat), supp.s_nationkey == nat.n_nationkey)
        .select(
            "l_partkey",
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("val"),
        )
    )
    tot = rel.agg(
        dsum("val", 6).alias("total"),
        F.count_distinct("l_partkey").alias("np"),
    )
    per_part = rel.groupBy("l_partkey").agg(dsum("val", 6).alias("value"))
    return (
        per_part.crossJoin(F.broadcast(tot))
        .filter(F.col("value") > F.lit(1.5) / F.col("np") * F.col("total"))
        .select("l_partkey", "value")
        .transform(pin)
        .orderBy(F.desc("value"), "l_partkey")
    )


@query(
    "q140_tpch_q20_excess_shippers",
    oracle=f"""
    SELECT s_name, ROUND(s_acctbal, 2) AS acctbal
    FROM supplier
    JOIN nation ON s_nationkey = n_nationkey
    WHERE n_name = 'NATION_5'
      AND s_suppkey IN (
          SELECT l_suppkey FROM lineitem
          WHERE l_partkey IN (
              SELECT p_partkey FROM part WHERE p_name LIKE '%widget%'
          )
          GROUP BY l_suppkey, l_partkey
          HAVING {odsum("CASE WHEN l_shipdate >= TIMESTAMP '1996-01-01'"
                        " AND l_shipdate < TIMESTAMP '1997-01-01'"
                        " THEN l_quantity ELSE 0 END", 2)}
                 > 0.3 * {odsum('l_quantity', 2)}
      )
    ORDER BY s_name
    """,
    tags=("SQ-02", "J-05"),
)
def q140_tpch_q20_excess_shippers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 (potential part promotion) shape: the nested
    IN-within-IN with a correlated scalar aggregate — suppliers in one
    nation who, for some widget part, shipped more than 30% of their
    all-time quantity for that part during 1996. The oracle keeps the
    canonical nested-subquery spelling; the engine runs the decorrelated
    form Catalyst would produce: conditional + total sums in ONE grouped
    aggregate over (supplier, part), then a semi-join chain.

    Scale shape: the widget-part filter broadcasts into the lineitem scan
    (a semi-join that prunes before the shuffle); the correlated scalar
    decorrelates into a single (l_suppkey, l_partkey) hash aggregate with
    both sums computed map-side-combined in one pass — never two scans,
    never a per-group subquery; eligible suppliers collapse to a distinct
    8-byte key list that semi-joins the (broadcast nation-filtered)
    supplier dim. Quantity sums go through exact decimal so the 0.3x
    threshold compares bit-identical operands in both engines."""
    parts = (
        load(spark, sf_dir, "part")
        .filter(F.col("p_name").like("%widget%"))
        .select("p_partkey")
    )
    li = load(spark, sf_dir, "lineitem").select(
        "l_suppkey", "l_partkey", "l_quantity", "l_shipdate"
    )
    pair = (
        li.join(F.broadcast(parts), li.l_partkey == parts.p_partkey, "left_semi")
        .groupBy("l_suppkey", "l_partkey")
        .agg(
            dsum_expr(
                "CASE WHEN l_shipdate >= TIMESTAMP '1996-01-01'"
                " AND l_shipdate < TIMESTAMP '1997-01-01'"
                " THEN l_quantity ELSE 0 END",
                2,
            ).alias("qty_1996"),
            dsum("l_quantity", 2).alias("qty_total"),
        )
    )
    eligible = (
        pair.filter(F.col("qty_1996") > 0.3 * F.col("qty_total"))
        .select("l_suppkey")
        .distinct()
    )
    supp = load(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_name", "s_acctbal", "s_nationkey"
    )
    nat = (
        load(spark, sf_dir, "nation")
        .filter(F.col("n_name") == "NATION_5")
        .select("n_nationkey")
    )
    return (
        supp.join(F.broadcast(nat), supp.s_nationkey == nat.n_nationkey)
        .join(eligible, supp.s_suppkey == eligible.l_suppkey, "left_semi")
        .select("s_name", F.round("s_acctbal", 2).alias("acctbal"))
        .transform(pin)
        .orderBy("s_name")
    )


@query(
    "q156_tpch_q4_order_priority",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-07-01'
      AND o_orderdate <  TIMESTAMP '1997-01-01'
      AND EXISTS (
          SELECT 1 FROM lineitem
          WHERE l_orderkey = o_orderkey
            AND l_shipdate > o_orderdate + INTERVAL 60 DAY
      )
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
    tags=("SQ-01",),
)
def q156_tpch_q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 (order-priority checking): orders from one half-year with at
    least one LATE lineitem (shipped >60 days after the order date — the
    testdata's stand-in for l_commitdate < l_receiptdate), counted by
    priority. The canonical EXISTS-with-extra-correlated-predicate shape:
    the subquery correlates on the join key AND references the outer
    relation inside a non-equi comparison.

    Scale shape: decorrelates to a LEFT SEMI join keyed on the 8-byte
    orderkey with the late-shipment comparison as the join's residual
    condition — no fact-side pre-aggregation, no duplicate inflation (semi
    short-circuits on first match). The half-year filter pushes to the
    orders scan; lineitem prunes to (l_orderkey, l_shipdate). Five rows
    cross the final exchange."""
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-07-01") & (F.col("o_orderdate") < "1997-01-01")
    ).select("o_orderkey", "o_orderdate", "o_orderpriority")
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    late = (li.l_orderkey == o.o_orderkey) & (
        li.l_shipdate > F.col("o_orderdate") + F.expr("INTERVAL 60 DAY")
    )
    return (
        o.join(li, late, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .transform(pin)
        .orderBy("o_orderpriority")
    )


@query(
    "q157_tpch_q6_forecast_revenue",
    oracle=f"""
    SELECT {odsum('l_extendedprice * l_discount', 6)} AS revenue,
           COUNT(*) AS n_lineitems
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
    tags=("A-03", "P-04"),
)
def q157_tpch_q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 (forecasting revenue change): the pure scan-filter-aggregate
    query — revenue lost if discounts in a band were eliminated for one
    year of small-quantity lineitems. No joins at all; the planner
    benchmark is predicate pushdown + map-side total.

    Scale shape: all three predicates push to the parquet scan
    (PushedFilters: shipdate range, discount range, quantity bound) and
    the scan prunes to 4 columns; the aggregate is a map-side partial with
    ONE row crossing the exchange. At 100 TB this query is I/O-bound by
    design — exactly what min/max row-group statistics + partition pruning
    on ship date make cheap."""
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01")
        & (F.col("l_shipdate") < "1997-01-01")
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    )
    return li.agg(
        dsum_expr("l_extendedprice * l_discount", 6).alias("revenue"),
        F.count(F.lit(1)).alias("n_lineitems"),
    )


@query(
    "q158_tpch_q18_large_orders",
    oracle="""
    SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
           CAST(SUM(CAST(l_quantity AS DECIMAL(28,2))) AS DOUBLE) AS total_qty
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON o_orderkey = l_orderkey
    WHERE o_orderkey IN (
        SELECT l_orderkey FROM lineitem
        GROUP BY l_orderkey HAVING SUM(l_quantity) > 180
    )
    GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
    ORDER BY o_totalprice DESC, o_orderdate, o_orderkey
    LIMIT 100
    """,
    tags=("SQ-03",),
)
def q158_tpch_q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 (large-volume customers): the 100 priciest orders whose
    total quantity exceeds a threshold, with their customer — the IN
    (GROUP BY ... HAVING) shape feeding a star join and a re-aggregation.

    Scale shape: the HAVING subquery is ONE grouped sum over (l_orderkey,
    l_quantity) — map-side combined, and its survivor set (high-quantity
    orders, a tiny fraction) joins back as a LEFT SEMI on the orderkey,
    so orders and lineitem shrink BEFORE the customer join; the final
    top-100 is TakeOrderedAndProject (per-partition heads, never a global
    sort). The quantity re-sum is exact decimal. Threshold 180 ~ the
    canonical 300-of-7-lines ratio at this generator's 1-50 quantity
    range."""
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(28,2)")).alias("q"))
        .filter(F.col("q") > 180)
        .select("l_orderkey")
    )
    o = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"
    )
    c = load(spark, sf_dir, "customer").select("c_custkey", "c_name")
    return (
        o.join(big, o.o_orderkey == big.l_orderkey, "left_semi")
        .join(li, F.col("o_orderkey") == li.l_orderkey)
        .join(c, F.col("o_custkey") == c.c_custkey)
        .groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(F.sum(F.col("l_quantity").cast("decimal(28,2)")).cast("double").alias("total_qty"))
        .orderBy(F.col("o_totalprice").desc(), "o_orderdate", "o_orderkey")
        .limit(100)
    )


# ---------------------------------------------------------------------------
# A-12 composition: order-fulfillment lag percentiles by priority
# ---------------------------------------------------------------------------


@query(
    "q241_fulfillment_lag",
    oracle="""
    WITH lag AS (
        SELECT o.o_orderpriority AS priority,
               CAST(date_diff('day', CAST(o.o_orderdate AS DATE),
                              MAX(CAST(l.l_shipdate AS DATE))) AS BIGINT) AS lag_days
        FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        GROUP BY o.o_orderkey, o.o_orderpriority, o.o_orderdate
    )
    SELECT priority,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           quantile_cont(lag_days, 0.5) AS p50_days,
           quantile_cont(lag_days, 0.9) AS p90_days,
           CAST(MAX(lag_days) AS BIGINT) AS max_days
    FROM lag GROUP BY priority ORDER BY priority
    """,
    tags=("A-12", "J-01", "A-06"),
)
def q241_fulfillment_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-fulfillment lag: days from order date to the LAST line
    shipment, summarized per order priority with exact p50/p90/max —
    the operational SLA readout ('do URGENT orders actually ship
    faster?') that composes the star join with A-12's exact percentile
    path (q75's quantile_cont bit-equality).

    Scale shape: ONE order-keyed join+rollup collapses lineitem to a
    per-order lag (co-partitioned on the join key, map-side combined
    max); percentiles aggregate the per-order relation grouped on the
    5-value priority key. Integer day lags — only the interpolated
    percentile is double, and that path is proven engine-identical."""
    o = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", F.col("o_orderdate").cast("date").alias("od")
    )
    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", F.col("l_shipdate").cast("date").alias("sd")
    )
    lag = (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("o_orderkey", "o_orderpriority", "od")
        .agg(F.max("sd").alias("last_ship"))
        .select(
            F.col("o_orderpriority").alias("priority"),
            F.datediff(F.col("last_ship"), F.col("od")).cast("long").alias("lag_days"),
        )
    )
    return (
        lag.groupBy("priority")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            F.expr("percentile(lag_days, 0.5)").alias("p50_days"),
            F.expr("percentile(lag_days, 0.9)").alias("p90_days"),
            F.max("lag_days").cast("long").alias("max_days"),
        )
        .transform(pin)
        .orderBy("priority")
    )


# ---------------------------------------------------------------------------
# TPC-H Q17: small-quantity-order revenue (the canonical correlated scalar
# AVG subquery — the query SQ-02's decorrelation pattern is named after)
# ---------------------------------------------------------------------------


@query(
    "q337_tpch_q17_small_quantity",
    oracle="""
    WITH p AS (
        SELECT p_partkey FROM part
        WHERE p_brand = 'Brand#12' AND p_size <= 25
    ),
    li AS (
        SELECT l_partkey, CAST(l_quantity AS BIGINT) AS q, l_extendedprice
        FROM lineitem JOIN p ON l_partkey = p_partkey
    ),
    st AS (
        SELECT l_partkey, SUM(q) AS sum_qty, COUNT(*) AS cnt
        FROM li GROUP BY l_partkey
    )
    SELECT ROUND(CAST(SUM(CAST(li.l_extendedprice AS DECIMAL(28,2))) AS DOUBLE)
                 / 7.0, 6) AS avg_yearly,
           COUNT(*) AS n_small
    FROM li JOIN st USING (l_partkey)
    WHERE 5 * li.q * st.cnt < st.sum_qty
    """,
    tags=("SQ-02",),
)
def q337_tpch_q17_small_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 (small-quantity-order revenue): yearly revenue lost if
    small orders (below 20% of a part's average order quantity) for one
    brand's small parts were no longer taken — the canonical correlated
    scalar AVG subquery, the shape the SQ-02 decorrelation rule is named
    after (p_size <= 25 stands in for the testdata's missing p_container).

    Determinism: quantities are whole numbers, so the 20%-of-average
    threshold `q < 0.2 * sum/cnt` is rewritten as the EXACT integer
    inequality `5*q*cnt < sum` — no division, no float boundary; revenue
    sums through decimal(28,2), and the single /7.0 + round(6) runs on
    identical IEEE operands in both engines.

    Scale shape: the brand filter pushes to the part scan and the survivor
    key set BROADCASTs into a left-semi that prunes lineitem before
    anything aggregates (the per-part stats are computed over the reduced
    relation, never the full fact); stats (one row per selected part) then
    broadcast back, so the whole query shuffles the fact zero times — scan,
    two broadcast joins, map-side-combined partials, one scalar row out.

    Reference parity: beyond the reference's own queries; completes the
    engine's TPC-H planner-shape suite (Q1-Q22 minus the columns the
    testdata lacks) alongside q95/q96/q107-q112/q125-q130/q139/q140/
    q156-q158.
    """
    p = (
        load(spark, sf_dir, "part")
        .filter((F.col("p_brand") == "Brand#12") & (F.col("p_size") <= 25))
        .select("p_partkey")
    )
    li = (
        load(spark, sf_dir, "lineitem")
        .select(
            "l_partkey",
            F.col("l_quantity").cast("long").alias("q"),
            "l_extendedprice",
        )
        .join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"), "left_semi")
    )
    st = li.groupBy("l_partkey").agg(
        F.sum("q").alias("sum_qty"), F.count(F.lit(1)).alias("cnt")
    )
    small = li.join(F.broadcast(st), "l_partkey").filter(
        F.lit(5) * F.col("q") * F.col("cnt") < F.col("sum_qty")
    )
    return small.agg(
        F.round(dsum("l_extendedprice", 2) / F.lit(7.0), 6).alias("avg_yearly"),
        F.count(F.lit(1)).alias("n_small"),
    )
