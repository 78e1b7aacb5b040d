"""Correlated-subquery SQL surface (SURVEY.md §2F, SQ-01..SQ-03): EXISTS,
correlated scalar, and IN+HAVING subqueries in the TPC-H Q4/Q17/Q18 shapes.

These are the one query family that is *authored as SQL*, on purpose: the
engine's SQL front-end must accept the subquery forms users write, and
Catalyst's decorrelation (RewritePredicateSubquery / RewriteCorrelatedScalarSubquery)
must turn them into the join shapes every other §2F row certifies — a
left-semi join for EXISTS/IN, an aggregate-then-join for the correlated
scalar. tests/test_plans.py asserts exactly that: no per-row subquery
execution survives into the physical plan, so at 100 TB these cost one
keyed shuffle each, identical to their hand-decorrelated twins (q19 semi
join, q16 agg join).

Each query is ONE SQL string run verbatim on both Spark and DuckDB —
engine-portable ANSI SQL is itself part of the contract. Determinism notes:
`l_quantity` is integer-valued (driver testdata), so AVG/SUM over it are
exact in IEEE double regardless of accumulation order; money sums go
through the decimal detour (functions/deterministic.py).

Reference anchor: the reference app has no SQL front-end at all (its only
"queries" are pandas over Postgres reads, e.g. the dashboard aggregations at
projects/vehicle_count/streamlit/streamlit_app.py:91-124) — this family is
declared engine surface per SURVEY §2F.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..tables import load
from .registry import query

# 18 = Spark's widest long-backed decimal (see functions/deterministic.py:
# same exact sums in both engines — inputs here are <= ~1.1e5, and both
# engines widen the SUM result type by 10+ digits — with compact primitive
# decimals instead of byte-array decimals in every aggregation buffer).
_PRECISION = 18


def _run_sql(spark: SparkSession, sf_dir: str, sql: str, tables: tuple[str, ...]) -> DataFrame:
    """Register the needed testdata tables as temp views (same names DuckDB
    pre-registers) and run the shared SQL text through Spark's parser."""
    for t in tables:
        load(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(sql)


#: TPC-H Q4 shape on the driver schema (no l_commitdate/l_receiptdate in the
#: testdata, so "late" = shipped >75 days after the order date).
_Q97_SQL = """
    SELECT o.o_orderpriority, COUNT(*) AS n_orders
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1996-04-01 00:00:00'
      AND o.o_orderdate < TIMESTAMP '1996-07-01 00:00:00'
      AND EXISTS (
        SELECT 1 FROM lineitem l
        WHERE l.l_orderkey = o.o_orderkey
          AND l.l_shipdate > o.o_orderdate + INTERVAL 75 DAY)
    GROUP BY o.o_orderpriority
    ORDER BY o.o_orderpriority
"""


@query("q97_exists_subquery", oracle=_Q97_SQL, tags=("SQ-01",))
def q97_exists_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated EXISTS (TPC-H Q4 shape): orders in one quarter with at
    least one line shipped >75 days late, counted per priority. Catalyst
    decorrelates to a left-semi join on l_orderkey (plan-asserted); the date
    filter pushes to the orders scan. At scale: one semi-join shuffle on the
    8-byte order key, lineitem pre-filtered by the pushed ship-date bound."""
    return _run_sql(spark, sf_dir, _Q97_SQL, ("orders", "lineitem"))


#: TPC-H Q17 shape: small-quantity lineitems of one brand, priced against
#: each part's own average order quantity.
_Q98_SQL = f"""
    SELECT CAST(SUM(CAST(l.l_extendedprice AS DECIMAL({_PRECISION},2))) AS DOUBLE) / 7.0
               AS avg_weekly
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand = 'Brand#11'
      AND l.l_quantity < (
        SELECT 0.5 * AVG(l2.l_quantity) FROM lineitem l2
        WHERE l2.l_partkey = l.l_partkey)
"""


@query("q98_scalar_subquery", oracle=_Q98_SQL, tags=("SQ-02",))
def q98_scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery (TPC-H Q17 shape). Catalyst rewrites the
    per-row AVG into one aggregate over lineitem joined back on l_partkey —
    lineitem is scanned twice but shuffled on the same key both times, and
    the brand filter broadcasts through the part join. AVG(l_quantity) is
    exact (integer-valued doubles), so the 0.5*avg threshold is bit-identical
    across engines; the money sum takes the decimal detour."""
    return _run_sql(spark, sf_dir, _Q98_SQL, ("lineitem", "part"))


#: TPC-H Q18 shape: large-volume orders via IN (GROUP BY ... HAVING).
_Q99_SQL = f"""
    SELECT c.c_name, o.o_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice,
           CAST(SUM(CAST(l.l_quantity AS DECIMAL({_PRECISION},2))) AS DOUBLE) AS total_qty
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE o.o_orderkey IN (
        SELECT l_orderkey FROM lineitem
        GROUP BY l_orderkey
        HAVING SUM(l_quantity) > 180)
    GROUP BY c.c_name, o.o_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice
    ORDER BY o.o_totalprice DESC, o.o_orderkey
    LIMIT 100
"""


@query("q99_group_having_in", oracle=_Q99_SQL, tags=("SQ-03",))
def q99_group_having_in(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN + GROUP BY/HAVING subquery (TPC-H Q18 shape): customers behind the
    largest-volume orders. The IN list is itself an aggregate over lineitem;
    Catalyst plans it as an aggregate feeding a left-semi join, then the
    star join and final top-100 (TakeOrderedAndProject). SUM(l_quantity) in
    the HAVING is exact (integer-valued doubles); the output quantity sum
    takes the decimal detour. Tie-break: (o_totalprice DESC, o_orderkey)."""
    return _run_sql(spark, sf_dir, _Q99_SQL, ("customer", "orders", "lineitem"))


#: TPC-H Q2 shape on the driver schema (no partsupp table, so the
#: part-supplier "supply" relation is DISTINCT (l_partkey, l_suppkey) pairs
#: from lineitem with unit cost l_extendedprice / l_quantity).
_Q125_SQL = """
    WITH supply AS (
        SELECT DISTINCT l.l_partkey, l.l_suppkey,
               s.s_name, s.s_acctbal, n.n_name,
               l.l_extendedprice / l.l_quantity AS unit_cost
        FROM lineitem l
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        JOIN nation n ON n.n_nationkey = s.s_nationkey
        JOIN region r ON r.r_regionkey = n.n_regionkey
        WHERE r.r_name = 'EUROPE'
    )
    SELECT DISTINCT p.p_partkey, p.p_name, sp.s_name, sp.n_name,
           ROUND(sp.s_acctbal, 6) AS s_acctbal,
           ROUND(sp.unit_cost, 6) AS unit_cost
    FROM part p
    JOIN supply sp ON sp.l_partkey = p.p_partkey
    WHERE p.p_size <= 10
      AND p.p_type = 'LARGE'
      AND sp.unit_cost = (
        SELECT MIN(sp2.unit_cost) FROM supply sp2
        WHERE sp2.l_partkey = p.p_partkey)
    ORDER BY s_acctbal DESC, sp.n_name, sp.s_name, p.p_partkey
    LIMIT 100
"""


@query("q125_tpch_q2_min_cost_supplier", oracle=_Q125_SQL, tags=("SQ-02", "J-03"))
def q125_tpch_q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape (minimum-cost supplier): for each small LARGE-type
    part, the EUROPE suppliers whose unit cost equals the part's regional
    minimum — a correlated scalar MIN subquery over a four-way star join,
    correlated through the OUTER relation's key.

    Catalyst decorrelates the MIN into one aggregate over the supply CTE
    joined back on partkey; the CTE is planned once per consumer with the
    region/nation joins BROADCAST (25/5 rows), so the only large shuffles
    are the partkey aggregations. The per-row unit-cost division is IEEE-
    identical in both engines, and MIN over doubles is order-independent,
    so the equality predicate is exact. Tie-break (acctbal DESC, nation,
    supplier, partkey) makes the LIMIT deterministic."""
    return _run_sql(
        spark, sf_dir, _Q125_SQL, ("lineitem", "supplier", "nation", "region", "part")
    )


#: TPC-H Q15 shape: top supplier(s) by quarterly revenue via a CTE reused by
#: both the projection and the scalar MAX subquery.
_Q128_SQL = f"""
    WITH revenue AS (
        SELECT l_suppkey AS supplier_no,
               CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                        AS DECIMAL({_PRECISION},6))) AS DOUBLE) AS total_revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
        GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name, r.total_revenue
    FROM supplier s
    JOIN revenue r ON r.supplier_no = s.s_suppkey
    WHERE r.total_revenue = (SELECT MAX(total_revenue) FROM revenue)
    ORDER BY s.s_suppkey
"""


@query("q128_tpch_q15_top_supplier", oracle=_Q128_SQL, tags=("SQ-02", "A-01"))
def q128_tpch_q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 (top supplier): the supplier(s) whose one-quarter revenue
    equals the global maximum — an uncorrelated scalar MAX subquery over a
    shared CTE (TPC-H's CREATE VIEW form).

    The revenue CTE aggregates shipdate-pruned lineitem once per consumer
    on the 8-byte suppkey; the MAX side reduces to ONE row broadcast into
    the filter, and the supplier join is a broadcast too — so the whole
    query is one keyed shuffle plus two broadcasts. The revenue sum takes
    the decimal detour, making the MAX-equality exact across engines."""
    return _run_sql(spark, sf_dir, _Q128_SQL, ("lineitem", "supplier"))


#: TPC-H Q21 shape (no l_commitdate/l_receiptdate: "late" = shipped >60 days
#: after the order date; no multi-line odd suppliers needed beyond that).
_Q130_SQL = """
    SELECT s.s_name, COUNT(*) AS numwait
    FROM supplier s
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    JOIN lineitem l1 ON l1.l_suppkey = s.s_suppkey
    JOIN orders o ON o.o_orderkey = l1.l_orderkey
    WHERE n.n_name = 'NATION_3'
      AND o.o_orderstatus = 'F'
      AND l1.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
      AND EXISTS (
        SELECT 1 FROM lineitem l2
        WHERE l2.l_orderkey = l1.l_orderkey
          AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (
        SELECT 1 FROM lineitem l3
        JOIN orders o3 ON o3.o_orderkey = l3.l_orderkey
        WHERE l3.l_orderkey = l1.l_orderkey
          AND l3.l_suppkey <> l1.l_suppkey
          AND l3.l_shipdate > o3.o_orderdate + INTERVAL 60 DAY)
    GROUP BY s.s_name
    ORDER BY numwait DESC, s.s_name
    LIMIT 100
"""


@query("q130_tpch_q21_waiting_supplier", oracle=_Q130_SQL, tags=("SQ-01", "J-05", "J-06"))
def q130_tpch_q21_waiting_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 (suppliers who kept orders waiting): NATION_3 suppliers who
    shipped late on a finished multi-supplier order where NO other supplier
    was also late — the hardest decorrelation in the TPC-H suite: a
    correlated EXISTS and a correlated NOT EXISTS on the same relation.

    Catalyst plans EXISTS as a left-semi and NOT EXISTS as a left-anti
    join, both shuffled on the same 8-byte l_orderkey as the orders join —
    three same-key shuffles that AQE coalesces off one exchange, no per-row
    subquery execution (plan-asserted for the family). The late predicate
    is a pure timestamp comparison, deterministic in both engines; the
    nation filter broadcasts through supplier."""
    return _run_sql(spark, sf_dir, _Q130_SQL, ("supplier", "nation", "lineitem", "orders"))


# ---------------------------------------------------------------------------
# SQ-01 (cont.): correlated LATERAL subquery with per-row top-k
# ---------------------------------------------------------------------------


@query(
    "q390_lateral_topk",
    oracle="""
    WITH prio AS (SELECT DISTINCT o_orderpriority AS p FROM orders)
    SELECT prio.p AS priority, l.o_orderkey,
           CAST(FLOOR(epoch(l.o_orderdate)) AS BIGINT) // 86400 AS d,
           CAST(ROUND(l.o_totalprice * 100) AS BIGINT) AS cents
    FROM prio,
    LATERAL (
        SELECT o_orderkey, o_orderdate, o_totalprice FROM orders
        WHERE o_orderpriority = prio.p
        ORDER BY o_orderdate DESC, o_orderkey DESC LIMIT 2
    ) l
    ORDER BY priority, o_orderkey
    """,
    tags=("SQ-01", "O-05"),
)
def q390_lateral_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL subquery with per-row ORDER BY + LIMIT: the two
    newest orders for EACH priority class, written as the SQL-standard
    LATERAL join both engines now support — the 'top-k per outer row'
    idiom ORM users reach for first, certified equivalent across
    engines (ties impossible under the (date, key) total order). The
    declarative twin of q13's window formulation: same result, but the
    LATERAL form is what arrives in migrated Postgres/DuckDB SQL, so an
    engine claiming drop-in coverage must accept and optimize it.

    Determinism: the per-group cut orders totally by
    (o_orderdate DESC, o_orderkey DESC).

    Scale shape: Spark decorrelates the lateral limit into the same
    window/group-limit machinery as q13 (DecorrelateInnerQuery) — no
    per-outer-row rescan survives optimization, which is the entire
    point of accepting the syntax: the naive nested-loop reading is
    O(|outer| x |orders|), the plan is one shuffle.

    Reference parity: beyond-reference; completes SQ-01's correlation
    family (EXISTS, scalar, IN) with the LATERAL form."""
    load(spark, sf_dir, "orders").createOrReplaceTempView("q390_orders")
    return spark.sql(
        """
        WITH prio AS (SELECT DISTINCT o_orderpriority AS p FROM q390_orders)
        SELECT prio.p AS priority, l.o_orderkey,
               CAST(unix_timestamp(l.o_orderdate) / 86400 AS BIGINT) AS d,
               CAST(ROUND(l.o_totalprice * 100) AS BIGINT) AS cents
        FROM prio,
        LATERAL (
            SELECT o_orderkey, o_orderdate, o_totalprice FROM q390_orders
            WHERE o_orderpriority = prio.p
            ORDER BY o_orderdate DESC, o_orderkey DESC LIMIT 2
        ) l
        ORDER BY priority, o_orderkey
        """
    )
