"""Data-integrity auditing (SURVEY.md §2K extensions X-24, X-25): a
referential-integrity sweep over every foreign-key edge of the star
schema, and an ORDER-INDEPENDENT mergeable table checksum — the "is the
warehouse internally consistent, and did two pipelines produce the same
table?" primitives every ingest (the reference writes Postgres rows from
streaming batches with no post-hoc verification,
consumer_postgres_streaming.py) needs before anything downstream trusts
the data.

Determinism: all audit outputs are exact integer counts; the checksum is
a SUM of md5-nibble-derived per-row integers — commutative, so identical
for any row order or partitioning, and mergeable across shards/days
(A-14) without rescanning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.ordering import pin, stage
from ..tables import load
from .registry import query

#: (child table, fk column, parent table, pk column) — every FK edge of
#: the star schema (TPC-H-ish subset the testdata carries).
_FK_EDGES = [
    ("lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem", "l_suppkey", "supplier", "s_suppkey"),
    ("orders", "o_custkey", "customer", "c_custkey"),
    ("customer", "c_nationkey", "nation", "n_nationkey"),
    ("supplier", "s_nationkey", "nation", "n_nationkey"),
    ("nation", "n_regionkey", "region", "r_regionkey"),
]

_NIBBLES = 12  #: checksum keeps md5's first 12 hex nibbles (48 bits/row)

#: per-table canonical row serialization (types pinned: ints/strings as-is,
#: money as exact cents) — the same string feeds md5 in both engines.
_CANON = {
    "region": "CAST(r_regionkey AS {t}) || '|' || r_name",
    "nation": "CAST(n_nationkey AS {t}) || '|' || n_name || '|' "
    "|| CAST(n_regionkey AS {t})",
    "supplier": "CAST(s_suppkey AS {t}) || '|' || s_name || '|' "
    "|| CAST(s_nationkey AS {t}) || '|' "
    "|| CAST(CAST(ROUND(s_acctbal * 100) AS BIGINT) AS {t})",
    "part": "CAST(p_partkey AS {t}) || '|' || p_name || '|' || p_brand || '|' "
    "|| p_type || '|' || CAST(p_size AS {t}) || '|' "
    "|| CAST(CAST(ROUND(p_retailprice * 100) AS BIGINT) AS {t})",
}


def _nibble_int(hex_col: str, n: int = _NIBBLES) -> str:
    """SQL (valid in Spark AND DuckDB) turning the first `n` hex nibbles of
    `hex_col` into an integer — the portable hex->int both engines lack as
    a shared builtin."""
    terms = [
        f"CAST(instr('0123456789abcdef', substr({hex_col}, {i + 1}, 1)) - 1 "
        f"AS BIGINT) * {16 ** (n - 1 - i)}"
        for i in range(n)
    ]
    return "(" + " + ".join(terms) + ")"


def _edge_oracle(child: str, fk: str, parent: str, pk: str) -> str:
    return f"""
    SELECT '{child}.{fk}' AS edge,
           (SELECT COUNT(*) FROM {child}) AS child_rows,
           (SELECT COUNT(*) FROM {child} WHERE {fk} IS NULL) AS null_fk,
           (SELECT COUNT(DISTINCT {fk}) FROM {child}) AS distinct_fk,
           (SELECT CAST(COALESCE(SUM(cnt), 0) AS BIGINT)
            FROM (SELECT {fk} AS k, COUNT(*) AS cnt FROM {child}
                  WHERE {fk} IS NOT NULL GROUP BY 1) c
            WHERE NOT EXISTS (SELECT 1 FROM {parent} p WHERE p.{pk} = c.k)
           ) AS orphan_rows
    """


@query(
    "q159_referential_integrity",
    oracle=" UNION ALL ".join(_edge_oracle(*e) for e in _FK_EDGES)
    + " ORDER BY edge",
    tags=("X-24", "J-06", "A-04"),
)
def q159_referential_integrity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity sweep: for every FK edge of the schema,
    child row count, NULL-FK count, distinct FK count, and the number of
    child rows whose FK has NO matching parent (orphans) — the
    constraint check a lakehouse has to run itself because parquet
    enforces nothing. One row per edge; a healthy warehouse reads
    orphan_rows = 0 down the column.

    Scale shape: per edge, the child scan is COLUMN-PRUNED to the single
    FK column and reduced map-side to (key, cnt) BEFORE the existence
    probe, so the anti join moves one row per distinct key, not per
    child row; dimension-sized parents broadcast. The 7 per-edge
    single-row summaries union into a bounded relation."""
    parts = []
    for child, fk, parent, pk in _FK_EDGES:
        c = load(spark, sf_dir, child)
        p = load(spark, sf_dir, parent)
        stats = c.agg(
            F.count(F.lit(1)).alias("child_rows"),
            F.count(F.when(F.col(fk).isNull(), 1)).alias("null_fk"),
            F.countDistinct(fk).alias("distinct_fk"),
        )
        keyed = (
            c.filter(F.col(fk).isNotNull()).groupBy(F.col(fk).alias("k")).count()
        )
        orphans = (
            keyed.join(p.select(F.col(pk).alias("k")), "k", "left_anti")
            .agg(F.coalesce(F.sum("count"), F.lit(0)).cast("long").alias("orphan_rows"))
        )
        parts.append(
            stats.crossJoin(F.broadcast(orphans)).select(
                F.lit(f"{child}.{fk}").alias("edge"),
                "child_rows",
                "null_fk",
                "distinct_fk",
                "orphan_rows",
            )
        )
    out = parts[0]
    for q in parts[1:]:
        out = out.unionAll(q)
    return out.orderBy("edge")


@query(
    "q164_table_checksum",
    oracle=" UNION ALL ".join(
        f"""
    SELECT '{t}' AS table_name, COUNT(*) AS n_rows,
           CAST(CAST(SUM(CAST(h AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS VARCHAR)
               AS checksum
    FROM (SELECT {_nibble_int(f"md5({_CANON[t].format(t='VARCHAR')})")} AS h
          FROM {t})
    """
        for t in sorted(_CANON)
    )
    + " ORDER BY table_name",
    tags=("X-24", "A-14", "F-08"),
)
def q164_table_checksum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-independent table fingerprint: each row serializes to a
    canonical string (types pinned — ints/strings verbatim, money as
    exact cents), hashes to a 48-bit integer (md5's first 12 nibbles),
    and the table checksum is the exact-decimal SUM of row hashes plus
    the row count. Two pipelines produced the same table iff (n_rows,
    checksum) agree — no sort, no row order, no partition layout in the
    contract. The audit primitive behind "did the migration/backfill
    change anything?".

    Scale shape: pure map-side codegen per row, ONE ungrouped map-side-
    combined agg per table — two numbers cross each exchange, and
    because SUM is commutative-mergeable (A-14) per-shard checksums
    roll up without rescanning history. decimal(38,0) accumulation
    holds 2^48-per-row hashes beyond 1e12 rows."""
    parts = []
    for t in sorted(_CANON):
        df = load(spark, sf_dir, t)
        h = F.expr(_nibble_int(f"md5({_CANON[t].format(t='string')})"))
        parts.append(
            df.select(h.cast("decimal(38,0)").alias("h")).agg(
                F.count(F.lit(1)).alias("n_rows"),
                F.sum("h").cast("decimal(38,0)").cast("string").alias("checksum"),
            ).select(F.lit(t).alias("table_name"), "n_rows", "checksum")
        )
    out = parts[0]
    for q in parts[1:]:
        out = out.unionAll(q)
    return out.orderBy("table_name")


_GINI_BUCKET = 10_000_000  #: prefix-sum bucket width over per-customer cents


@query(
    "q173_benford_audit",
    oracle="""
    WITH d AS (
        SELECT CAST(substr(CAST(CAST(ROUND(value * 100) AS BIGINT) AS VARCHAR),
                    1, 1) AS INT) AS digit
        FROM events WHERE value >= 0.01
    ),
    c AS (SELECT digit, COUNT(*) AS n_obs FROM d GROUP BY digit),
    spine AS (SELECT CAST(range AS INT) AS digit FROM range(1, 10)),
    filled AS (
        SELECT s.digit, CAST(COALESCE(c.n_obs, 0) AS BIGINT) AS n_obs
        FROM spine s LEFT JOIN c ON s.digit = c.digit
    ),
    t AS (SELECT CAST(SUM(n_obs) AS BIGINT) AS n FROM filled),
    terms AS (
        SELECT f.digit, f.n_obs, t.n,
               ROUND(log10(1 + 1.0 / f.digit), 6) AS expected_share,
               ROUND(CAST(f.n_obs AS DOUBLE) / t.n, 6) AS obs_share,
               ROUND((f.n_obs - ROUND(log10(1 + 1.0 / f.digit), 6) * t.n)
                     * (f.n_obs - ROUND(log10(1 + 1.0 / f.digit), 6) * t.n)
                     / (ROUND(log10(1 + 1.0 / f.digit), 6) * t.n), 6) AS chi2_term
        FROM filled f CROSS JOIN t
    )
    SELECT digit, n_obs, expected_share, obs_share, chi2_term,
           CAST(SUM(CAST(chi2_term AS DECIMAL(28,6))) OVER () AS DOUBLE)
               AS chi2_total
    FROM terms
    ORDER BY digit
    """,
    tags=("X-25", "A-02"),
)
def q173_benford_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law audit of the value column: the distribution of first
    significant digits against the log10(1+1/d) expectation, with
    per-digit chi-square terms and the total — the classic
    fabricated-data / instrumentation-bug detector for financial and
    metering feeds (organic multiplicative data follows Benford;
    truncated, capped, or synthesized data does not — as here, where a
    bounded-uniform generator fails loudly).

    Scale shape: digit extraction is map-only codegen on the cents
    integer (leading digit is scale-invariant under the x100), ONE
    map-side-combined groupBy reduces the fact to <=9 rows, and the
    digit spine + chi-square run on that bounded relation. Expected
    shares round at 6 dp (the q120 libm precedent) so both engines
    compare identical doubles."""
    ev = load(spark, sf_dir, "events").filter(F.col("value") >= 0.01)
    d = ev.select(
        F.substring(F.round(F.col("value") * 100).cast("long").cast("string"), 1, 1)
        .cast("int")
        .alias("digit")
    )
    c = d.groupBy("digit").agg(F.count(F.lit(1)).alias("n_obs"))
    spine = spark.range(1, 10).select(F.col("id").cast("int").alias("digit"))
    filled = (
        spine.join(F.broadcast(c), "digit", "left")
        .select("digit", F.coalesce("n_obs", F.lit(0)).cast("long").alias("n_obs"))
        .transform(stage)  # bounded 9-row relation, reused by total + terms
    )
    t = filled.agg(F.sum("n_obs").cast("long").alias("n"))
    exp_share = F.round(F.log10(1 + 1.0 / F.col("digit")), 6)
    dev = F.col("n_obs") - exp_share * F.col("n")
    terms = filled.crossJoin(F.broadcast(t)).select(
        "digit",
        "n_obs",
        exp_share.alias("expected_share"),
        F.round(F.col("n_obs").cast("double") / F.col("n"), 6).alias("obs_share"),
        F.round(dev * dev / (exp_share * F.col("n")), 6).alias("chi2_term"),
    )
    return terms.select(
        "digit",
        "n_obs",
        "expected_share",
        "obs_share",
        "chi2_term",
        F.sum(F.col("chi2_term").cast("decimal(28,6)"))
        .over(Window.partitionBy())  # bounded 9-row relation only
        .cast("double")
        .alias("chi2_total"),
    ).orderBy("digit")


@query(
    "q174_revenue_gini",
    oracle=f"""
    WITH rev AS (
        SELECT o_custkey,
               CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS r
        FROM orders GROUP BY o_custkey
    ),
    v AS (SELECT r, COUNT(*) AS c_r FROM rev GROUP BY r),
    cum AS (
        SELECT r, c_r,
               CAST(COALESCE(SUM(c_r) OVER (
                   ORDER BY r ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
               ), 0) AS BIGINT) AS below
        FROM v
    ),
    m AS (
        SELECT CAST(SUM(c_r) AS BIGINT) AS n,
               CAST(SUM(CAST(r AS DECIMAL(19,0)) * c_r) AS DECIMAL(38,0)) AS s,
               CAST(SUM(CAST(r AS DECIMAL(19,0))
                        * (CAST(c_r AS DECIMAL(19,0)) * below
                           + CAST(c_r AS DECIMAL(19,0)) * (c_r + 1) / 2))
                    AS DECIMAL(38,0)) AS w
        FROM cum
    )
    SELECT n AS n_customers,
           ROUND(CAST(s AS DOUBLE) / 100, 2) AS total_revenue,
           ROUND(2 * CAST(w AS DOUBLE) / (CAST(n AS DOUBLE) * CAST(s AS DOUBLE))
                 - CAST(n + 1 AS DOUBLE) / n, 6) AS gini
    FROM m
    """,
    tags=("X-25", "A-14", "W-03"),
)
def q174_revenue_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of revenue concentration across customers — the
    inequality/concentration read ("do 20% of customers carry 80% of
    revenue?") that pricing and risk teams track, computed EXACTLY from
    the rank-weighted sum G = 2*sum(rank_i * x_i)/(n*sum x) - (n+1)/n
    with ties collapsed at the value level: a value v with count c and
    `below` predecessors contributes v*(c*below + c(c+1)/2) — every
    operand an exact integer/decimal (cents), one final division.

    Scale shape: the fact reduces to one per-customer rollup (keyed
    shuffle, map-side combined), then to the DISTINCT-value relation
    bounded by the cents domain; ranks come from the q84/q148 two-level
    bucketed prefix sum over that relation (never a global sort of
    customers), and the moments are A-14-mergeable decimals — three
    numbers cross the final exchange."""
    rev = (
        load(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
            .cast("long")
            .alias("r")
        )
    )
    v = (
        rev.groupBy("r")
        .agg(F.count(F.lit(1)).alias("c_r"))
        .withColumn("bucket", F.expr(f"r DIV {_GINI_BUCKET}"))
    )
    within = v.withColumn(
        "wb",
        F.coalesce(
            F.sum("c_r").over(
                Window.partitionBy("bucket")
                .orderBy("r")
                .rowsBetween(Window.unboundedPreceding, -1)
            ),
            F.lit(0),
        ),
    ).transform(stage)  # feeds bucket totals AND the moment agg
    btot = within.groupBy("bucket").agg(F.sum("c_r").alias("bc"))
    offs = btot.select(
        "bucket",
        F.coalesce(
            F.sum("bc").over(
                Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, -1)
            ),
            F.lit(0),
        ).alias("off"),
    )
    d19 = "decimal(19,0)"
    cum = within.join(F.broadcast(offs), "bucket").select(
        "r", "c_r", (F.col("wb") + F.col("off")).cast("long").alias("below")
    )
    m = cum.agg(
        F.sum("c_r").cast("long").alias("n"),
        F.sum(F.col("r").cast(d19) * F.col("c_r")).cast("decimal(38,0)").alias("s"),
        F.sum(
            F.col("r").cast(d19)
            * (
                F.col("c_r").cast(d19) * F.col("below")
                + F.col("c_r").cast(d19) * (F.col("c_r") + 1) / 2
            )
        )
        .cast("decimal(38,0)")
        .alias("w"),
    )
    return m.select(
        F.col("n").alias("n_customers"),
        F.round(F.col("s").cast("double") / 100, 2).alias("total_revenue"),
        F.round(
            2 * F.col("w").cast("double") / (F.col("n").cast("double") * F.col("s").cast("double"))
            - (F.col("n") + 1).cast("double") / F.col("n"),
            6,
        ).alias("gini"),
    )


#: canonical serialization of an events row (Spark-side only — the
#: stream/batch twin compares Spark to Spark, so unix_micros is fine here).
_EVENTS_CANON = (
    "CAST(event_id AS string) || '|' || CAST(unix_micros(ts) AS string) || '|' "
    "|| CAST(user_id AS string) || '|' || event_type || '|' "
    "|| CAST(CAST(ROUND(value * 100) AS BIGINT) AS string)"
)


def events_checksum(df: DataFrame) -> DataFrame:
    """(n_rows, checksum) of an events-shaped relation via the q164
    order-independent row-hash sum — ONE ungrouped mergeable aggregate,
    so the IDENTICAL code path runs over a batch table or a streaming
    source (complete-mode agg): the live proof of the A-14 mergeability
    claim (tests/test_streaming.py::test_checksum_stream_equals_batch).
    An ingest pipeline keeps this running against its sink and compares
    to the batch checksum of what landed — zero-sort end-to-end audit."""
    h = F.expr(_nibble_int(f"md5({_EVENTS_CANON})"))
    return df.select(h.cast("decimal(38,0)").alias("h")).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("h").cast("decimal(38,0)").cast("string").alias("checksum"),
    )


_K_ANON = 10  #: groups smaller than this violate the release policy


@query(
    "q187_k_anonymity",
    oracle=f"""
    WITH qi AS (
        SELECT event_type,
               CAST(dayofweek(ts) + 1 AS INT) AS dow,
               CAST(hour(ts) AS INT) AS hr,
               user_id
        FROM events
    ),
    grp AS (
        SELECT event_type, dow, hr,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(COUNT(DISTINCT user_id) AS BIGINT) AS l_div
        FROM qi GROUP BY event_type, dow, hr
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_groups,
           CAST(MIN(n) AS BIGINT) AS k_anonymity,
           CAST(MIN(l_div) AS BIGINT) AS l_diversity,
           CAST(SUM(CASE WHEN n < {_K_ANON} THEN 1 ELSE 0 END) AS BIGINT)
               AS n_violating_groups,
           CAST(SUM(CASE WHEN n < {_K_ANON} THEN n ELSE 0 END) AS BIGINT)
               AS n_rows_at_risk,
           ROUND(CAST(SUM(CASE WHEN n < {_K_ANON} THEN n ELSE 0 END) AS DOUBLE)
                 / SUM(n), 6) AS at_risk_frac
    FROM grp
    """,
    tags=("X-29", "A-04", "A-01"),
)
def q187_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity / l-diversity audit before a data release: group the
    table by its quasi-identifier tuple (event_type, day-of-week, hour —
    the attributes an attacker could link externally), then report the
    dataset's k (smallest group size: any record in a group of k is
    hidden among k candidates), its l (fewest distinct sensitive values
    — user_id — in any group), and how many groups/rows fall below the
    k=10 release policy.  The go/no-go readout an anonymization
    pipeline checks after generalizing columns and before export.

    Scale shape: ONE map-side-combined rollup onto the bounded
    QI-domain relation (|types| x 7 x 24; the count-distinct rides the
    same shuffle keyed by the QI), then a single ungrouped agg over that
    bounded relation — one scalar row to the driver."""
    qi = load(spark, sf_dir, "events").select(
        "event_type",
        F.dayofweek("ts").alias("dow"),
        F.hour("ts").alias("hr"),
        "user_id",
    )
    grp = qi.groupBy("event_type", "dow", "hr").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.count_distinct("user_id").cast("long").alias("l_div"),
    )
    viol = F.when(F.col("n") < _K_ANON, F.col("n")).otherwise(0)
    return grp.agg(
        F.count(F.lit(1)).cast("long").alias("n_groups"),
        F.min("n").cast("long").alias("k_anonymity"),
        F.min("l_div").cast("long").alias("l_diversity"),
        F.sum(F.when(F.col("n") < _K_ANON, 1).otherwise(0))
        .cast("long")
        .alias("n_violating_groups"),
        F.sum(viol).cast("long").alias("n_rows_at_risk"),
        F.round(F.sum(viol).cast("double") / F.sum("n"), 6).alias("at_risk_frac"),
    )


# ---------------------------------------------------------------------------
# X-39: deletion-propagation audit (right-to-be-forgotten pre-flight)
# ---------------------------------------------------------------------------

_ERASE_PRED = "c_custkey % 37 = 0"  #: the simulated erasure request set


@query(
    "q199_deletion_audit",
    oracle=f"""
    WITH erase AS (
        SELECT c_custkey FROM customer WHERE {_ERASE_PRED}
    ),
    o AS (
        SELECT o_orderkey, o_custkey FROM orders
        WHERE o_custkey IN (SELECT c_custkey FROM erase)
    )
    SELECT 'customer' AS tbl,
           (SELECT COUNT(*) FROM erase) AS affected_rows,
           (SELECT COUNT(*) FROM erase) AS distinct_keys
    UNION ALL
    SELECT 'orders',
           (SELECT COUNT(*) FROM o),
           (SELECT COUNT(DISTINCT o_custkey) FROM o)
    UNION ALL
    SELECT 'lineitem',
           (SELECT COUNT(*) FROM lineitem
            WHERE l_orderkey IN (SELECT o_orderkey FROM o)),
           (SELECT COUNT(DISTINCT l_orderkey) FROM lineitem
            WHERE l_orderkey IN (SELECT o_orderkey FROM o))
    ORDER BY tbl
    """,
    tags=("X-39", "X-29", "J-05"),
)
def q199_deletion_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deletion-propagation audit (the right-to-be-forgotten pre-flight
    X-29's k-anonymity gate pairs with): given an erasure request set
    (every 37th customer), report how far the cascade reaches — direct
    customer rows, their orders, and the lineitems of those orders —
    as per-table affected-row and distinct-key counts, BEFORE any
    destructive delete runs. A compliance pipeline diffs this against
    the post-delete q159 referential sweep (orphans must be 0).

    Scale shape: the erasure key set is request-sized — it BROADCASTS
    into a semi-join on orders (no fact shuffle); the one genuinely
    large hop, lineitem<-affected orders, is keyed on l_orderkey with
    the order keys reduced to a distinct key relation first, so on
    bucketed tables (S-10) it plans exchange-free; every leg's readout
    is a single row and the union is 3 rows."""
    cust = load(spark, sf_dir, "customer")
    erase = cust.filter(F.expr(_ERASE_PRED)).select("c_custkey")
    o = (
        load(spark, sf_dir, "orders")
        .join(
            F.broadcast(erase),
            F.col("o_custkey") == F.col("c_custkey"),
            "left_semi",
        )
        .select("o_orderkey", "o_custkey")
    )
    o = stage(o)
    li = load(spark, sf_dir, "lineitem").join(
        o.select("o_orderkey").distinct(),
        F.col("l_orderkey") == F.col("o_orderkey"),
        "left_semi",
    )
    c_leg = erase.agg(
        F.count(F.lit(1)).alias("affected_rows"),
        F.count(F.lit(1)).alias("distinct_keys"),
    ).select(F.lit("customer").alias("tbl"), "affected_rows", "distinct_keys")
    o_leg = o.agg(
        F.count(F.lit(1)).alias("affected_rows"),
        F.countDistinct("o_custkey").alias("distinct_keys"),
    ).select(F.lit("orders").alias("tbl"), "affected_rows", "distinct_keys")
    l_leg = li.agg(
        F.count(F.lit(1)).alias("affected_rows"),
        F.countDistinct("l_orderkey").alias("distinct_keys"),
    ).select(F.lit("lineitem").alias("tbl"), "affected_rows", "distinct_keys")
    return c_leg.unionByName(o_leg).unionByName(l_leg).orderBy("tbl")


# ---------------------------------------------------------------------------
# X-25 (cont.): ABC contribution classification (the 80/20 readout)
# ---------------------------------------------------------------------------

_ABC_BUCKET = 100_000  #: prefix-sum bucket width over per-part revenue cents
_ABC_BOUNDS = (70, 90)  #: class A: first 70% of revenue; B: to 90%; C: rest


@query(
    "q206_abc_classification",
    oracle=f"""
    WITH rev AS (
        SELECT l_partkey,
               CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 100)
                             AS BIGINT)) AS BIGINT) AS r
        FROM lineitem GROUP BY l_partkey
    ),
    v AS (SELECT r, CAST(COUNT(*) AS BIGINT) AS c_r FROM rev GROUP BY r),
    tot AS (SELECT CAST(SUM(r * c_r) AS HUGEINT) AS t FROM v),
    cum AS (
        SELECT r, c_r,
               CAST(COALESCE(SUM(r * c_r) OVER (
                   ORDER BY r DESC ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
               ), 0) AS HUGEINT) AS rev_before
        FROM v
    ),
    cls AS (
        SELECT CASE WHEN 100 * rev_before < {_ABC_BOUNDS[0]} * t THEN 'A'
                    WHEN 100 * rev_before < {_ABC_BOUNDS[1]} * t THEN 'B'
                    ELSE 'C' END AS cls,
               c_r, r * c_r AS rc, t
        FROM cum CROSS JOIN tot
    )
    SELECT cls,
           CAST(SUM(c_r) AS BIGINT) AS n_parts,
           ROUND(CAST(SUM(rc) AS DOUBLE) / 100, 2) AS revenue,
           ROUND(CAST(SUM(rc) AS DOUBLE) / CAST(MAX(t) AS DOUBLE), 6) AS revenue_share
    FROM cls GROUP BY cls ORDER BY cls
    """,
    tags=("X-25", "A-14", "W-03"),
)
def q206_abc_classification(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABC contribution classification — the operational form of the 80/20
    question q174's Gini summarizes: rank parts by revenue and split them
    into class A (parts carrying the first 70% of revenue), B (to 90%)
    and C (the tail), reporting each class's part count and revenue
    share. Inventory, procurement, and cache-tiering policies all key off
    exactly this readout. Class boundaries are decided on the revenue
    accumulated STRICTLY ABOVE each distinct value (exact integer compare
    100*rev_before < bound*total), so equal-revenue parts always land in
    the same class and no float boundary exists.

    Scale shape: the fact reduces to one per-part rollup (exact cents),
    then to the DISTINCT-revenue-value relation; the descending prefix
    sum is the q174 value-collapsed form running on that bounded
    relation (never a global part sort at 100 TB — swap in the q84
    two-level bucketed form if the distinct-value relation ever stops
    fitting a partition); moments are A-14-mergeable HUGEINT/decimal."""
    rev = (
        load(spark, sf_dir, "lineitem")
        .groupBy("l_partkey")
        .agg(
            F.sum(
                F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100)
                .cast("long")
            )
            .cast("long")
            .alias("r")
        )
    )
    v = rev.groupBy("r").agg(F.count(F.lit(1)).cast("long").alias("c_r"))
    d0 = "decimal(38,0)"
    v = v.withColumn("rc", (F.col("r").cast(d0) * F.col("c_r")).cast(d0)).transform(
        stage
    )  # feeds the total, the prefix sum, and the class rollup
    tot = v.agg(F.sum("rc").cast(d0).alias("t"))
    cum = v.withColumn(
        "rev_before",
        F.coalesce(
            F.sum("rc").over(
                Window.orderBy(F.desc("r")).rowsBetween(Window.unboundedPreceding, -1)
            ),
            F.lit(0),
        ).cast(d0),
    )
    cls = cum.crossJoin(F.broadcast(tot)).select(
        F.when(100 * F.col("rev_before") < _ABC_BOUNDS[0] * F.col("t"), "A")
        .when(100 * F.col("rev_before") < _ABC_BOUNDS[1] * F.col("t"), "B")
        .otherwise("C")
        .alias("cls"),
        "c_r",
        "rc",
        "t",
    )
    return (
        cls.groupBy("cls")
        .agg(
            F.sum("c_r").cast("long").alias("n_parts"),
            F.round(F.sum("rc").cast("double") / 100, 2).alias("revenue"),
            F.round(
                F.sum("rc").cast("double") / F.max("t").cast("double"), 6
            ).alias("revenue_share"),
        )
        .transform(pin)
        .orderBy("cls")
    )


# ---------------------------------------------------------------------------
# X-24 (cont.): declarative expectation/constraint suite
# ---------------------------------------------------------------------------

#: (rule_id, SQL predicate that a VIOLATING lineitem row satisfies,
#: human-readable rule text) — the declarative contract a producer
#: publishes with the table; evaluated in ONE scan.
_CONSTRAINTS = (
    ("r01_qty_min", "l_quantity < 1", "l_quantity >= 1"),
    ("r02_qty_max", "l_quantity > 50", "l_quantity <= 50"),
    ("r03_price_pos", "l_extendedprice <= 0", "l_extendedprice > 0"),
    ("r04_disc_range", "l_discount < 0 OR l_discount > 0.1", "l_discount in [0, 0.1]"),
    ("r05_tax_range", "l_tax < 0 OR l_tax > 0.08", "l_tax in [0, 0.08]"),
    (
        "r06_flag_enum",
        "l_returnflag NOT IN ('A', 'N', 'R')",
        "l_returnflag in {A, N, R}",
    ),
    ("r07_key_notnull", "l_orderkey IS NULL", "l_orderkey not null"),
    (
        "r08_date_order",
        "l_shipdate IS NULL",
        "l_shipdate not null",
    ),
)


@query(
    "q220_constraint_suite",
    oracle="""
    WITH agg AS (
        SELECT COUNT(*) AS n,
    """
    + ",\n".join(
        f"           CAST(COUNT(*) FILTER (WHERE {pred}) AS BIGINT) AS v{i}"
        for i, (_, pred, _r) in enumerate(_CONSTRAINTS)
    )
    + """
        FROM lineitem
    )
    SELECT rule_id, rule, n_rows, n_violations, n_violations = 0 AS passed
    FROM (
    """
    + "\n        UNION ALL\n".join(
        f"        SELECT '{rid}' AS rule_id, '{rule}' AS rule, n AS n_rows,"
        f" v{i} AS n_violations FROM agg"
        for i, (rid, _p, rule) in enumerate(_CONSTRAINTS)
    )
    + """
    ) ORDER BY rule_id
    """,
    tags=("X-24", "A-03"),
)
def q220_constraint_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative expectation-suite audit (the Great-Expectations /
    dbt-test shape as an engine operator): a published rule set —
    range bounds, enum membership, not-null — evaluated over the fact
    table in ONE pass, reporting per rule the violation count and a
    pass flag. The contract gate a producer runs before publishing a
    table version and a consumer runs before trusting one; the
    row-level complement of q159's referential sweep (q159: keys line
    up across tables; this: values obey the column contracts).

    Scale shape: all 8 rules ride ONE map-side-combined ungrouped
    aggregate (8 conditional counts + the row count — the q193 wide-agg
    discipline), so the audit costs one scan regardless of rule count;
    the per-rule report explodes from the single result row. Partials
    are A-14-mergeable: per-shard violation counts add, so a fleet
    audits shards independently and sums."""
    li = load(spark, sf_dir, "lineitem")
    aggs = [F.count(F.lit(1)).alias("n")]
    for i, (_rid, pred, _rule) in enumerate(_CONSTRAINTS):
        aggs.append(
            F.sum(F.when(F.expr(pred), 1).otherwise(0)).cast("long").alias(f"v{i}")
        )
    wide = li.agg(*aggs)
    structs = [
        F.struct(
            F.lit(rid).alias("rule_id"),
            F.lit(rule).alias("rule"),
            F.col("n").alias("n_rows"),
            F.col(f"v{i}").alias("n_violations"),
            (F.col(f"v{i}") == 0).alias("passed"),
        )
        for i, (rid, _p, rule) in enumerate(_CONSTRAINTS)
    ]
    return (
        wide.select(F.explode(F.array(*structs)).alias("r"))
        .select("r.*")
        .orderBy("rule_id")
    )


# ---------------------------------------------------------------------------
# X-24 (cont.): data-freshness / staleness audit
# ---------------------------------------------------------------------------

#: (table, time column) — every time-bearing fact the warehouse lands
_FRESHNESS = (
    ("events", "ts"),
    ("orders", "o_orderdate"),
    ("lineitem", "l_shipdate"),
)


@query(
    "q223_freshness_audit",
    oracle="""
    WITH per_t AS (
    """
    + "\n        UNION ALL\n".join(
        f"        SELECT '{t}' AS table_name, CAST(COUNT(*) AS BIGINT) AS n_rows,"
        f" MAX(CAST({c} AS DATE)) AS max_day FROM {t}"
        for t, c in _FRESHNESS
    )
    + """
    ),
    ref AS (SELECT MAX(max_day) AS ref_day FROM per_t)
    SELECT table_name, n_rows, CAST(max_day AS TIMESTAMP) AS max_day,
           CAST(date_diff('day', max_day, ref_day) AS BIGINT) AS days_behind
    FROM per_t CROSS JOIN ref
    ORDER BY table_name
    """,
    tags=("X-24", "A-08"),
)
def q223_freshness_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-freshness audit: per time-bearing table, the row count, the
    newest event day, and how many days it trails the freshest table in
    the warehouse — the staleness readout an orchestrator alerts on
    before dashboards quietly serve old data. The reference point is the
    warehouse's own max day (never wall-clock NOW(), which would make
    the result nondeterministic and untestable).

    Scale shape: each table contributes ONE ungrouped map-side-combined
    min/max/count aggregate (parquet footer statistics make these scans
    near-free at 100 TB); the three single-row summaries union into a
    bounded relation and the reference day broadcasts from it."""
    parts = []
    for t, c in _FRESHNESS:
        df = load(spark, sf_dir, t)
        parts.append(
            df.agg(
                F.count(F.lit(1)).cast("long").alias("n_rows"),
                F.max(F.col(c).cast("date")).alias("max_day"),
            ).select(F.lit(t).alias("table_name"), "n_rows", "max_day")
        )
    per_t = parts[0]
    for p in parts[1:]:
        per_t = per_t.unionAll(p)
    per_t = stage(per_t)  # bounded 3-row relation, feeds ref AND the report
    ref = per_t.agg(F.max("max_day").alias("ref_day"))
    return (
        per_t.crossJoin(F.broadcast(ref))
        .select(
            "table_name",
            "n_rows",
            F.col("max_day").cast("timestamp").alias("max_day"),
            F.datediff(F.col("ref_day"), F.col("max_day")).cast("long").alias(
                "days_behind"
            ),
        )
        .transform(pin)
        .orderBy("table_name")
    )


# ---------------------------------------------------------------------------
# X-25 (cont.): concentration curve ("top p% of users carry what share?")
# ---------------------------------------------------------------------------

_CONC_PCTS = (1, 5, 10, 20)


@query(
    "q234_concentration_curve",
    oracle=f"""
    WITH c AS (
        SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n FROM events GROUP BY user_id
    ),
    v AS (SELECT n, CAST(COUNT(*) AS BIGINT) AS c_n FROM c GROUP BY n),
    tot AS (
        SELECT CAST(SUM(c_n) AS BIGINT) AS users, CAST(SUM(n * c_n) AS BIGINT) AS events
        FROM v
    ),
    cum AS (
        SELECT n, c_n,
               CAST(COALESCE(SUM(c_n) OVER (
                   ORDER BY n DESC ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
               ), 0) AS BIGINT) AS users_above,
               CAST(COALESCE(SUM(n * c_n) OVER (
                   ORDER BY n DESC ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
               ), 0) AS BIGINT) AS events_above
        FROM v
    ),
    spine AS (SELECT unnest([{", ".join(str(p) for p in _CONC_PCTS)}]) AS pct),
    pick AS (
        SELECT s.pct,
               (tot.users * s.pct + 99) // 100 AS k,
               MIN(cum.n) AS cut_n
        FROM spine s
        CROSS JOIN tot
        JOIN cum ON cum.users_above + cum.c_n >= (tot.users * s.pct + 99) // 100
        GROUP BY s.pct, (tot.users * s.pct + 99) // 100
    )
    SELECT p.pct, CAST(p.k AS BIGINT) AS top_users,
           CAST(cum.events_above
                + (p.k - cum.users_above) * cum.n AS BIGINT) AS events_covered,
           ROUND(CAST(cum.events_above + (p.k - cum.users_above) * cum.n AS DOUBLE)
                 / tot.events, 6) AS event_share
    FROM pick p
    JOIN cum ON cum.n = p.cut_n
    CROSS JOIN tot
    ORDER BY p.pct
    """,
    tags=("X-25", "W-03", "A-14"),
)
def q234_concentration_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concentration curve points: the share of all events generated by
    the top 1/5/10/20% most-active users — the '80/20' readout stated
    the way capacity and abuse teams ask it (q174's Gini compresses the
    whole curve to one number; this reports the curve at the operating
    points people quote). Within the cut value the tie resolves
    FRACTIONALLY (the top-k includes k - users_above users at the cut
    activity level, each contributing exactly cut_n events), so the
    answer is exact for every k with no arbitrary user ordering.

    Scale shape: the fact reduces to per-user counts, then to the
    DISTINCT-activity-value relation (bounded by the count domain);
    descending prefix sums and the per-percentile search run on that
    bounded relation (the q174/q206 value-collapse discipline — swap in
    the two-level bucketed form if the value domain ever outgrows a
    partition); rank targets are exact integer DIV; 4 rows out."""
    ev = load(spark, sf_dir, "events")
    c = ev.groupBy("user_id").agg(F.count(F.lit(1)).cast("long").alias("n"))
    v = c.groupBy("n").agg(F.count(F.lit(1)).cast("long").alias("c_n")).transform(
        stage
    )  # bounded distinct-activity relation, feeds totals + prefix + search
    tot = v.agg(
        F.sum("c_n").cast("long").alias("users"),
        F.sum(F.col("n") * F.col("c_n")).cast("long").alias("events"),
    )
    wdesc = Window.orderBy(F.desc("n")).rowsBetween(Window.unboundedPreceding, -1)
    cum = v.select(
        "n",
        "c_n",
        F.coalesce(F.sum("c_n").over(wdesc), F.lit(0)).cast("long").alias("users_above"),
        F.coalesce(F.sum(F.col("n") * F.col("c_n")).over(wdesc), F.lit(0))
        .cast("long")
        .alias("events_above"),
    )
    spine = F.explode(F.array(*[F.lit(p) for p in _CONC_PCTS])).alias("pct")
    picked = (
        cum.crossJoin(F.broadcast(tot))
        .select("n", "c_n", "users_above", "events_above", "users", "events", spine)
        .withColumn("k", F.expr("(users * pct + 99) DIV 100"))
        .where(F.col("users_above") + F.col("c_n") >= F.col("k"))
        .groupBy("pct", "k", "users", "events")
        .agg(F.min("n").alias("cut_n"))
    )
    return (
        picked.join(F.broadcast(cum), picked["cut_n"] == cum["n"])
        .select(
            "pct",
            F.col("k").cast("long").alias("top_users"),
            (
                F.col("events_above")
                + (F.col("k") - F.col("users_above")) * F.col("cut_n")
            )
            .cast("long")
            .alias("events_covered"),
            F.round(
                (
                    F.col("events_above")
                    + (F.col("k") - F.col("users_above")) * F.col("cut_n")
                ).cast("double")
                / F.col("events"),
                6,
            ).alias("event_share"),
        )
        .transform(pin)
        .orderBy("pct")
    )


# ---------------------------------------------------------------------------
# X-66: ABC-XYZ inventory matrix (contribution x demand-variability)
# ---------------------------------------------------------------------------

_XYZ_CV = (1, 2)  #: X: CV <= 0.5 (as 2*CV <= 1); Y: CV <= 1.0; Z: rest


_ABCXYZ_ORACLE = f"""
    WITH rev AS (
        SELECT l_partkey,
               CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 100)
                             AS BIGINT)) AS BIGINT) AS r
        FROM lineitem GROUP BY l_partkey
    ),
    v AS (SELECT r, CAST(COUNT(*) AS BIGINT) AS c_r FROM rev GROUP BY r),
    tot AS (SELECT CAST(SUM(r * c_r) AS HUGEINT) AS t FROM v),
    cum AS (
        SELECT r,
               CAST(COALESCE(SUM(r * c_r) OVER (
                   ORDER BY r DESC ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
               ), 0) AS HUGEINT) AS rev_before
        FROM v
    ),
    abc AS (
        SELECT r, CASE WHEN 100 * rev_before < {_ABC_BOUNDS[0]} * t THEN 'A'
                       WHEN 100 * rev_before < {_ABC_BOUNDS[1]} * t THEN 'B'
                       ELSE 'C' END AS abc_cls
        FROM cum CROSS JOIN tot
    ),
    wk AS (SELECT CAST(COUNT(DISTINCT date_trunc('week', o_orderdate)) AS BIGINT)
               AS w FROM orders),
    wdem AS (
        SELECT l_partkey, date_trunc('week', o_orderdate) AS wk,
               CAST(SUM(CAST(CAST(l_quantity AS DECIMAL(18,2)) * 100 AS BIGINT))
                    AS BIGINT) AS wq
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        GROUP BY 1, 2
    ),
    mom AS (
        SELECT l_partkey,
               CAST(SUM(wq) AS BIGINT) AS s,
               CAST(SUM(CAST(wq AS DECIMAL(19,0)) * CAST(wq AS DECIMAL(19,0)))
                    AS DECIMAL(38,0)) AS s2
        FROM wdem GROUP BY l_partkey
    ),
    xyz AS (
        SELECT l_partkey,
               CASE WHEN 4 * (w * s2 - CAST(s AS DECIMAL(19,0)) * s)
                         <= CAST(s AS DECIMAL(19,0)) * s THEN 'X'
                    WHEN (w * s2 - CAST(s AS DECIMAL(19,0)) * s)
                         <= CAST(s AS DECIMAL(19,0)) * s THEN 'Y'
                    ELSE 'Z' END AS xyz_cls
        FROM mom CROSS JOIN wk
    )
    SELECT abc_cls, xyz_cls,
           CAST(COUNT(*) AS BIGINT) AS n_parts,
           ROUND(CAST(SUM(CAST(rev.r AS HUGEINT)) AS DOUBLE) / 100, 2) AS revenue
    FROM rev
    JOIN abc USING (r)
    JOIN xyz USING (l_partkey)
    GROUP BY abc_cls, xyz_cls
    ORDER BY abc_cls, xyz_cls
"""


@query("q262_abc_xyz_matrix", oracle=_ABCXYZ_ORACLE, tags=("X-66", "X-25"))
def q262_abc_xyz_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABC-XYZ inventory matrix: q206's revenue-contribution classes
    crossed with demand-VARIABILITY classes — X: weekly-demand
    coefficient of variation <= 0.5 (steady, forecastable), Y: <= 1.0,
    Z: erratic — the 9-cell grid that drives safety-stock and
    replenishment policy (AX: automate tightly; CZ: make-to-order).
    Variability runs over the FULL week horizon with zero-demand weeks
    counted (sparse weeks are what MAKES demand erratic), via the
    closed-form n*S2 - S^2 with n = total weeks broadcast.

    Determinism: CV thresholds never compute a CV — CV <= 1/2 is the
    exact integer/decimal comparison 4(W*S2 - S^2) <= S^2 (the divisor W
    cancels), so classification has no float boundary; ABC reuses q206's
    strictly-above prefix discipline on distinct revenue values.

    Scale shape: two fact rollups (per-part revenue; per-(part, week)
    demand then per-part moments — all map-side combined), the ABC class
    relation is bounded by DISTINCT revenue values and joins back by
    value, the week count is a single-row broadcast, and the final 9-row
    cross-tab is one grouped pass over the per-part relation."""
    li = load(spark, sf_dir, "lineitem")
    rev = (
        li.groupBy("l_partkey")
        .agg(
            F.sum(
                F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100)
                .cast("long")
            )
            .cast("long")
            .alias("r")
        )
        .transform(stage)  # ABC-by-value join + the final cross-tab read it
    )
    v = rev.groupBy("r").agg(F.count(F.lit(1)).cast("long").alias("c_r"))
    d0 = "decimal(38,0)"
    v = v.withColumn("rc", (F.col("r").cast(d0) * F.col("c_r")).cast(d0)).transform(stage)
    tot = v.agg(F.sum("rc").cast(d0).alias("t"))
    cum = v.withColumn(
        "rev_before",
        F.coalesce(
            F.sum("rc").over(
                Window.orderBy(F.desc("r")).rowsBetween(Window.unboundedPreceding, -1)
            ),
            F.lit(0),
        ).cast(d0),
    )
    abc = cum.crossJoin(F.broadcast(tot)).select(
        "r",
        F.when(100 * F.col("rev_before") < _ABC_BOUNDS[0] * F.col("t"), "A")
        .when(100 * F.col("rev_before") < _ABC_BOUNDS[1] * F.col("t"), "B")
        .otherwise("C")
        .alias("abc_cls"),
    )
    o = load(spark, sf_dir, "orders").select(
        "o_orderkey", F.date_trunc("week", F.col("o_orderdate")).alias("wk")
    )
    wk = o.agg(F.countDistinct("wk").cast("long").alias("w"))
    wdem = (
        li.select("l_orderkey", "l_partkey", "l_quantity")
        .join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("l_partkey", "wk")
        .agg(
            F.sum((F.col("l_quantity").cast("decimal(18,2)") * 100).cast("long"))
            .cast("long")
            .alias("wq")
        )
    )
    d19 = "decimal(19,0)"
    mom = wdem.groupBy("l_partkey").agg(
        F.sum("wq").cast("long").alias("s"),
        F.sum(F.col("wq").cast(d19) * F.col("wq").cast(d19))
        .cast("decimal(38,0)")
        .alias("s2"),
    )
    a_var = F.expr(f"w * s2 - CAST(s AS {d19}) * s")
    s_sq = F.expr(f"CAST(s AS {d19}) * s")
    xyz = mom.crossJoin(F.broadcast(wk)).select(
        "l_partkey",
        F.when(4 * a_var <= s_sq, "X")
        .when(a_var <= s_sq, "Y")
        .otherwise("Z")
        .alias("xyz_cls"),
    )
    return (
        rev.join(abc, "r")
        .join(xyz, "l_partkey")
        .groupBy("abc_cls", "xyz_cls")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_parts"),
            F.round(F.sum(F.col("r").cast(d0)).cast("double") / 100, 2).alias(
                "revenue"
            ),
        )
        .transform(pin)
        .orderBy("abc_cls", "xyz_cls")
    )


# ---------------------------------------------------------------------------
# X-97: t-closeness audit (distributional privacy, beyond q187's k/l)
# ---------------------------------------------------------------------------

_TC_ORACLE = """
    WITH base AS (
        SELECT event_type,
               CAST(dayofweek(ts) + 1 AS INT) AS dow,
               CAST(LEAST(FLOOR(value / 50), 9) AS INT) AS sv
        FROM events
    ),
    gv AS (
        SELECT event_type, dow, sv, CAST(COUNT(*) AS BIGINT) AS c
        FROM base GROUP BY 1, 2, 3
    ),
    gt AS (
        SELECT event_type, dow, CAST(SUM(c) AS BIGINT) AS n_g FROM gv GROUP BY 1, 2
    ),
    vt AS (SELECT sv, CAST(SUM(c) AS BIGINT) AS c_v FROM gv GROUP BY 1),
    nn AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM gv),
    grid AS (
        SELECT g.event_type, g.dow, g.n_g, v.sv, v.c_v,
               COALESCE(x.c, 0) AS c_gv
        FROM gt g CROSS JOIN vt v
        LEFT JOIN gv x ON x.event_type = g.event_type AND x.dow = g.dow
                      AND x.sv = v.sv
    ),
    tv AS (
        SELECT event_type, dow, n_g,
               CAST(SUM(abs(CAST(c_gv AS HUGEINT) * nn.n
                            - CAST(n_g AS HUGEINT) * c_v)) * 1000000
                    // (2 * CAST(n_g AS HUGEINT) * nn.n) AS BIGINT) AS tv_micro
        FROM grid, nn
        GROUP BY event_type, dow, n_g, nn.n
    ),
    worst AS (
        SELECT event_type, dow, tv_micro,
               ROW_NUMBER() OVER (ORDER BY tv_micro DESC, event_type, dow) AS rn
        FROM tv
    )
    SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM tv) AS n_groups,
           CAST(tv_micro AS DOUBLE) / 1e6 AS t_closeness,
           event_type AS worst_event_type, dow AS worst_dow,
           (SELECT CAST(SUM(CASE WHEN tv_micro > 200000 THEN 1 ELSE 0 END)
                        AS BIGINT) FROM tv) AS n_groups_above_02
    FROM worst WHERE rn = 1
"""


@query("q307_t_closeness", oracle=_TC_ORACLE, tags=("X-97", "X-29"))
def q307_t_closeness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """t-closeness audit: for every quasi-identifier group (event_type,
    day-of-week), the total-variation distance between the group's
    sensitive-value distribution (bucketed transaction size) and the
    global one — the privacy criterion BEYOND q187's k/l: a group can
    be large (k-safe) and diverse (l-safe) yet still leak through a
    skewed value distribution ('everyone in this cell buys big'). The
    released-table go/no-go is the max distance and the count of groups
    over the t=0.2 policy.

    Determinism: TV distance per group collapses to the exact integer
    sum |c_gv*N - n_g*c_v| over the value-bucket grid (missing buckets
    grid-completed to 0), floor-divided once to micro resolution — the
    argmax group is a total-order top-1 on exact integers; the single
    double is the micro value scaled at readout.

    Scale shape: ONE fact rollup onto the bounded (QI x bucket) grid;
    group totals, global totals, and the TV sums all live on bounded
    relations; grid completion is a cross join of two bounded sides.

    Reference parity: beyond-reference; completes the X-29 privacy
    family (k-anonymity, l-diversity, now distributional closeness)."""
    base = load(spark, sf_dir, "events").select(
        "event_type",
        F.dayofweek("ts").alias("dow"),
        F.least(F.floor(F.col("value") / 50), F.lit(9)).cast("int").alias("sv"),
    )
    gv = (
        base.groupBy("event_type", "dow", "sv")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
        .transform(stage)  # group totals, value totals, and the grid share it
    )
    gt = gv.groupBy("event_type", "dow").agg(F.sum("c").cast("long").alias("n_g"))
    vt = gv.groupBy("sv").agg(F.sum("c").cast("long").alias("c_v"))
    nn = gv.agg(F.sum("c").cast("long").alias("n"))
    grid = (
        gt.crossJoin(F.broadcast(vt))
        .join(gv, ["event_type", "dow", "sv"], "left")
        .na.fill({"c": 0})
        .crossJoin(F.broadcast(nn))
    )
    d20 = "decimal(20,0)"
    tv = grid.groupBy("event_type", "dow", "n_g", "n").agg(
        F.sum(
            F.abs(
                F.col("c").cast(d20) * F.col("n")
                - F.col("n_g").cast(d20) * F.col("c_v")
            ).cast("decimal(38,0)")
        )
        .cast("decimal(38,0)")
        .alias("ss")
    ).select(
        "event_type",
        "dow",
        F.expr(
            "CAST(ss * 1000000 div (2 * CAST(n_g AS DECIMAL(20,0)) * n)"
            " AS BIGINT)"
        ).alias("tv_micro"),
    ).transform(stage)  # worst-group argmax + both summary aggs share it
    worst = (
        tv.withColumn(
            "rn",
            F.row_number().over(
                Window.orderBy(F.col("tv_micro").desc(), "event_type", "dow")
            ),
        )
        .filter(F.col("rn") == 1)
    )
    summ = tv.agg(
        F.count(F.lit(1)).cast("long").alias("n_groups"),
        F.sum(F.when(F.col("tv_micro") > 200000, 1).otherwise(0))
        .cast("long")
        .alias("n_groups_above_02"),
    )
    return worst.crossJoin(F.broadcast(summ)).select(
        "n_groups",
        (F.col("tv_micro").cast("double") / F.lit(1e6)).alias("t_closeness"),
        F.col("event_type").alias("worst_event_type"),
        F.col("dow").alias("worst_dow"),
        "n_groups_above_02",
    )


# ---------------------------------------------------------------------------
# X-24 (cont.): retention/TTL compliance sweep
# ---------------------------------------------------------------------------

#: published retention policy, days per event type (a config literal — the
#: policy is an input, not data)
_TTL_DAYS = {
    "click": 30,
    "view": 30,
    "error": 90,
    "signup": 365,
    "purchase": 365,
}

_TTL_CASE = "CASE event_type " + " ".join(
    f"WHEN '{t}' THEN {d}" for t, d in sorted(_TTL_DAYS.items())
) + " ELSE 365 END"


@query(
    "q349_ttl_compliance",
    oracle=f"""
    WITH ref AS (
        SELECT CAST(FLOOR(epoch(MAX(date_trunc('day', ts)))) AS BIGINT) // 86400
               AS ref_day
        FROM events
    ),
    rows_ AS (
        SELECT event_type,
               CAST(FLOOR(epoch(date_trunc('day', ts))) AS BIGINT) // 86400 AS d,
               {_TTL_CASE} AS ttl_days
        FROM events
    )
    SELECT event_type,
           CAST(MAX(ttl_days) AS BIGINT) AS ttl_days,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CASE WHEN d < ref_day - ttl_days THEN 1 ELSE 0 END)
                AS BIGINT) AS n_expired,
           ROUND(CAST(SUM(CASE WHEN d < ref_day - ttl_days THEN 1 ELSE 0 END)
                      AS DOUBLE) / COUNT(*), 6) AS expired_share,
           CAST(MAX(ref_day - d) AS BIGINT) AS max_age_days
    FROM rows_ CROSS JOIN ref
    GROUP BY event_type
    ORDER BY event_type
    """,
    tags=("X-24", "X-29"),
)
def q349_ttl_compliance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retention/TTL compliance sweep: against a published per-type
    retention policy (a config literal), count the rows that have
    outlived their TTL and the oldest age present — the deletion-SLA
    audit a privacy/compliance team runs before q199's deletion audit
    verifies the purge actually happened. The reference day is the
    warehouse's own freshest day (the q223 discipline — never
    wall-clock NOW(), which would be untestable).

    Determinism: day arithmetic is exact integer epoch-days; the policy
    CASE is a literal; one exact-ratio division rounds at 6 dp.

    Scale shape: one footer-friendly scan with a map-only policy CASE,
    ONE map-side-combined rollup onto the bounded type relation; the
    reference day cross-broadcasts a single row. At 100 TB with
    day-partitioned layout the expired predicate prunes to partition
    metadata — the audit costs the manifest, not the data.

    Reference parity: beyond-reference; completes X-24's audit kit (q159
    referential, q164 checksum, q220 expectations, q223 freshness, q199
    deletion) with the retention-policy gate."""
    ev = load(spark, sf_dir, "events").select(
        "event_type",
        (F.unix_timestamp(F.date_trunc("day", F.col("ts"))) / F.lit(86400))
        .cast("long")
        .alias("d"),
        F.expr(_TTL_CASE).alias("ttl_days"),
    )
    ref = ev.agg(F.max("d").alias("ref_day"))
    expired = F.col("d") < F.col("ref_day") - F.col("ttl_days")
    return (
        ev.join(F.broadcast(ref))
        .groupBy("event_type")
        .agg(
            F.max("ttl_days").cast("long").alias("ttl_days"),
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.sum(expired.cast("int")).cast("long").alias("n_expired"),
            F.round(
                F.sum(expired.cast("int")).cast("double") / F.count(F.lit(1)), 6
            ).alias("expired_share"),
            F.max(F.col("ref_day") - F.col("d")).cast("long").alias("max_age_days"),
        )
        .transform(pin)
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# X-24 (cont.): candidate-key uniqueness audit (the dbt-test 'unique' rule)
# ---------------------------------------------------------------------------

#: candidate keys under audit: (table, key name, key expression) — the
#: expression template runs in both engines ({t}: string/VARCHAR)
_UNIQ_KEYS = (
    ("events", "event_id", "CAST(event_id AS {t})"),
    ("events", "user_id_ts", "CAST(user_id AS {t}) || '|' || CAST({us}(ts) AS {t})"),
    ("orders", "o_orderkey", "CAST(o_orderkey AS {t})"),
    ("lineitem", "orderkey_linenumber",
     "CAST(l_orderkey AS {t}) || '|' || CAST(l_linenumber AS {t})"),
)


def _uniq_leg_oracle(table: str, key: str, expr: str) -> str:
    e = expr.format(t="VARCHAR", us="epoch_us")
    return f"""
    SELECT '{table}' AS table_name, '{key}' AS key_name,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(DISTINCT {e}) AS BIGINT) AS n_keys,
           CAST(COUNT(*) - COUNT(DISTINCT {e}) AS BIGINT) AS n_excess_rows,
           CAST(CASE WHEN COUNT(*) = COUNT(DISTINCT {e}) THEN 1 ELSE 0 END
                AS BIGINT) AS is_unique
    FROM {table}"""


@query(
    "q353_uniqueness_audit",
    oracle=" UNION ALL ".join(
        _uniq_leg_oracle(t, k, e) for t, k, e in _UNIQ_KEYS
    )
    + " ORDER BY table_name, key_name",
    tags=("X-24", "A-04"),
)
def q353_uniqueness_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Candidate-key uniqueness audit (the dbt `unique` test as an engine
    operator): for each declared candidate key — single-column and
    compound — the row count, distinct-key count, excess-row count, and
    the pass flag. The key-cardinality complement of q159 (which audits
    FK EDGES) and q220 (row-level value contracts): a duplicated primary
    key silently doubles every downstream join and aggregate, so this
    is the first structural gate a warehouse model runs.

    Determinism: exact counts; compound keys serialize through the
    engine-portable canonical templates (integers as-is, timestamps as
    epoch micros — the q164 discipline).

    Scale shape: one scan per audited table (keys on the same table
    share the scan via one wide aggregate where they co-reside — here
    events carries two keys through one count-distinct Expand); each leg
    is ONE ungrouped map-side-combined aggregate, one row out. At scale
    the distinct count swaps to the A-05 approx form for a monitoring
    tier while this exact form stays the release gate.

    Reference parity: beyond-reference; completes X-24 (q159
    referential, q164 checksum, q220 expectations, q223 freshness,
    q349 TTL) with the key-uniqueness rule."""
    legs = []
    # group keys by table so co-resident keys share one scan
    by_table: dict[str, list[tuple[str, str]]] = {}
    for t, k, e in _UNIQ_KEYS:
        by_table.setdefault(t, []).append((k, e))
    for t, keys in by_table.items():
        df = load(spark, sf_dir, t)
        aggs = [F.count(F.lit(1)).cast("long").alias("n_rows")]
        for i, (k, e) in enumerate(keys):
            expr = e.format(t="string", us="unix_micros")
            aggs.append(F.countDistinct(F.expr(expr)).cast("long").alias(f"nk_{i}"))
        one = df.agg(*aggs)
        for i, (k, _e) in enumerate(keys):
            legs.append(
                one.select(
                    F.lit(t).alias("table_name"),
                    F.lit(k).alias("key_name"),
                    "n_rows",
                    F.col(f"nk_{i}").alias("n_keys"),
                    (F.col("n_rows") - F.col(f"nk_{i}"))
                    .cast("long")
                    .alias("n_excess_rows"),
                    F.when(F.col("n_rows") == F.col(f"nk_{i}"), 1)
                    .otherwise(0)
                    .cast("long")
                    .alias("is_unique"),
                )
            )
    out = legs[0]
    for leg in legs[1:]:
        out = out.unionByName(leg)
    return out.transform(pin).orderBy("table_name", "key_name")


# ---------------------------------------------------------------------------
# X-24 (cont.): ingest coverage-gap detection (missing hours per series)
# ---------------------------------------------------------------------------


@query(
    "q354_coverage_gaps",
    oracle="""
    WITH present AS (
        SELECT DISTINCT event_type,
               CAST(FLOOR(epoch(date_trunc('hour', ts))) AS BIGINT) // 3600 AS h
        FROM events
    ),
    bounds AS (
        SELECT event_type, MIN(h) AS lo, MAX(h) AS hi
        FROM present GROUP BY event_type
    ),
    spine AS (
        SELECT b.event_type, u.h
        FROM bounds b, LATERAL (SELECT unnest(range(b.lo, b.hi + 1)) AS h) u
    ),
    missing AS (
        SELECT s.event_type, s.h,
               ROW_NUMBER() OVER (PARTITION BY s.event_type ORDER BY s.h) AS rn
        FROM spine s LEFT JOIN present p
          ON p.event_type = s.event_type AND p.h = s.h
        WHERE p.h IS NULL
    )
    SELECT event_type,
           CAST(MIN(h) AS BIGINT) AS gap_start_h,
           CAST(MAX(h) AS BIGINT) AS gap_end_h,
           CAST(COUNT(*) AS BIGINT) AS gap_hours
    FROM missing
    GROUP BY event_type, h - rn
    ORDER BY event_type, gap_start_h
    """,
    tags=("X-24", "X-21"),
)
def q354_coverage_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ingest coverage-gap detection: for each event type, every run of
    consecutive MISSING hours inside the series' own [first, last] hour
    span — the data-observability readout ('the click pipeline went dark
    for 6 hours on the 14th') that q223's freshness lag cannot see
    (freshness only checks the newest edge; a mid-series outage leaves
    freshness green). Gaps are reported as (start, end, length) islands,
    the shape an incident timeline needs.

    Determinism: hours are exact epoch-hour integers; the calendar spine
    derives from the data's own bounds (the q223 no-wall-clock
    discipline); islands use the gaps-and-islands h - row_number key
    (the q226 discipline) under a total per-type order.

    Scale shape: the fact reduces to distinct (type, hour) in ONE
    map-side-combined rollup — calendar-bounded (more data adds events
    per hour, not hours); the spine explodes from |types| bound rows
    map-only; the anti probe, island window, and gap rollup all run on
    bounded relations. The fact shuffles once.

    Reference parity: beyond-reference; completes the X-24 observability
    kit (q223 freshness edge, q185 out-of-order profile, q349 TTL) with
    mid-series outage detection."""
    ev = load(spark, sf_dir, "events")
    present = (
        ev.select(
            "event_type",
            (F.unix_timestamp(F.date_trunc("hour", F.col("ts"))) / F.lit(3600))
            .cast("long")
            .alias("h"),
        )
        .groupBy("event_type", "h")
        .agg(F.count(F.lit(1)).alias("_n"))
        .select("event_type", "h")
        .transform(stage)  # bounds leg + anti-probe leg share one build
    )
    bounds = present.groupBy("event_type").agg(
        F.min("h").alias("lo"), F.max("h").alias("hi")
    )
    spine = bounds.select(
        "event_type", F.explode(F.sequence("lo", "hi")).alias("h")
    )
    missing = spine.join(present, ["event_type", "h"], "left_anti")
    rn = F.row_number().over(Window.partitionBy("event_type").orderBy("h"))
    islands = missing.withColumn("grp", F.col("h") - rn)
    return (
        islands.groupBy("event_type", "grp")
        .agg(
            F.min("h").cast("long").alias("gap_start_h"),
            F.max("h").cast("long").alias("gap_end_h"),
            F.count(F.lit(1)).cast("long").alias("gap_hours"),
        )
        .drop("grp")
        .transform(pin)
        .orderBy("event_type", "gap_start_h")
    )


# ---------------------------------------------------------------------------
# X-24 / X-29: subject-access request (SAR) extract summary
# ---------------------------------------------------------------------------

_SAR_USERS = (3, 17, 42)  #: the access request's subject ids (an input list)


@query(
    "q357_subject_access_extract",
    oracle=f"""
    WITH ev AS (
        SELECT user_id, 'events' AS table_name,
               CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(COUNT(DISTINCT event_type) AS BIGINT) AS n_kinds,
               CAST(epoch_us(MIN(ts)) AS BIGINT) AS first_us,
               CAST(epoch_us(MAX(ts)) AS BIGINT) AS last_us,
               CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
                   AS total_value_cents
        FROM events WHERE user_id IN {_SAR_USERS}
        GROUP BY user_id
    ),
    o AS (
        SELECT o_custkey AS user_id, 'orders' AS table_name,
               CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(COUNT(DISTINCT o_orderpriority) AS BIGINT) AS n_kinds,
               CAST(epoch_us(MIN(o_orderdate)) AS BIGINT) AS first_us,
               CAST(epoch_us(MAX(o_orderdate)) AS BIGINT) AS last_us,
               CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                   AS total_value_cents
        FROM orders
        WHERE o_custkey IN {_SAR_USERS}
        GROUP BY o_custkey
    )
    SELECT * FROM ev UNION ALL SELECT * FROM o
    ORDER BY user_id, table_name
    """,
    tags=("X-24", "X-29"),
)
def q357_subject_access_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Subject-access request (SAR) extract summary: for each requested
    subject id, every table holding their data with row counts, kind
    counts, the first/last timestamps, and exact value totals — the
    GDPR/CCPA Article-15 inventory a privacy pipeline assembles BEFORE
    q199 verifies deletion. One row per (subject, table); a subject
    absent from a table is simply absent (the lawyer's report needs
    what exists, not a null matrix).

    Determinism: the subject list is an input literal; counts and cents
    are exact; timestamps export as exact epoch micros.

    Scale shape: the subject list is a tiny IN-filter that PUSHES TO THE
    SCAN on every table (PushedFilters: In(user_id, ...) — at 100 TB
    with user-bucketed or z-ordered layout this prunes to a handful of
    files); each table contributes ONE map-side-combined rollup over
    only the subjects' rows; the union is |subjects| x |tables| rows.

    Reference parity: beyond-reference; completes the privacy kit (q187
    k-anonymity, q307 t-closeness, q199 deletion audit, q349 TTL) with
    the access-request side."""
    subj = list(_SAR_USERS)
    ev = (
        load(spark, sf_dir, "events")
        .filter(F.col("user_id").isin(subj))
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.countDistinct("event_type").cast("long").alias("n_kinds"),
            F.unix_micros(F.min("ts")).cast("long").alias("first_us"),
            F.unix_micros(F.max("ts")).cast("long").alias("last_us"),
            F.sum(F.floor(F.col("value") * 100 + 0.5).cast("long"))
            .cast("long")
            .alias("total_value_cents"),
        )
        .select("user_id", F.lit("events").alias("table_name"), "n_rows",
                "n_kinds", "first_us", "last_us", "total_value_cents")
    )
    o = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_custkey").isin(subj))
        .groupBy(F.col("o_custkey").alias("user_id"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.countDistinct("o_orderpriority").cast("long").alias("n_kinds"),
            F.unix_micros(F.min("o_orderdate")).cast("long").alias("first_us"),
            F.unix_micros(F.max("o_orderdate")).cast("long").alias("last_us"),
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
            .cast("long")
            .alias("total_value_cents"),
        )
        .select("user_id", F.lit("orders").alias("table_name"), "n_rows",
                "n_kinds", "first_us", "last_us", "total_value_cents")
    )
    return ev.unionByName(o).transform(pin).orderBy("user_id", "table_name")


# ---------------------------------------------------------------------------
# X-29 (cont.): k-anonymity generalization-ladder advisor
# ---------------------------------------------------------------------------

#: candidate generalizations of the (event_type, dow, hour) QI, each one
#: rung of the Datafly/Incognito lattice: drop or coarsen ONE attribute.
_GEN_LADDER = (
    ("full_qi", "event_type", "dow", "hour"),
    ("hour_to_6h_band", "event_type", "dow", "hour {div} 6"),
    ("drop_hour", "event_type", "dow", "CAST(0 AS INT)"),
    ("drop_dow", "event_type", "CAST(0 AS INT)", "hour"),
    ("drop_type", "'*'", "dow", "hour"),
)
_K_POLICY = 10


def _gen_leg_oracle(name: str, t: str, d: str, h: str) -> str:
    h = h.format(div="//")
    return f"""
    SELECT '{name}' AS generalization,
           CAST(MIN(n) AS BIGINT) AS k,
           CAST(SUM(CASE WHEN n < {_K_POLICY} THEN n ELSE 0 END) AS BIGINT)
               AS rows_below_k,
           CAST(COUNT(*) AS BIGINT) AS n_groups
    FROM (
        SELECT COUNT(*) AS n FROM (
            SELECT event_type,
                   dayofweek(date_trunc('day', ts)) + 1 AS dow,
                   CAST(hour(ts) AS INT) AS hour
            FROM events
        ) GROUP BY {t}, {d}, {h}
    )"""


@query(
    "q365_generalization_advisor",
    oracle=" UNION ALL ".join(
        _gen_leg_oracle(*rung) for rung in _GEN_LADDER
    )
    + " ORDER BY generalization",
    tags=("X-29", "A-02"),
)
def q365_generalization_advisor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity generalization-ladder advisor: for each candidate
    generalization of the quasi-identifier (keep it, coarsen hour to
    6-hour bands, drop hour, drop day-of-week, drop event type — one
    rung of the Datafly/Incognito lattice each), the k the release
    WOULD achieve and the rows still exposed below the k=10 policy —
    the decision table that turns q187's failing verdict into the
    CHEAPEST sufficient fix (generalize as little as utility allows).

    Determinism: exact group counts; rungs are declared literals.

    Scale shape: one map-side-combined rollup per rung onto its bounded
    generalized-QI domain (each strictly SMALLER than q187's full QI
    domain), one ungrouped agg per rung, 5 rows total. At 100 TB the
    rungs share one scan via grouping-sets if desired — declared here as
    independent legs for rung-level pruning.

    Reference parity: beyond-reference; completes the privacy kit (q187
    audit, q307 t-closeness, q365 picks the remediation)."""
    base = load(spark, sf_dir, "events").select(
        "event_type",
        (F.dayofweek(F.date_trunc("day", F.col("ts"))) ).alias("dow"),
        F.hour("ts").cast("int").alias("hour"),
    )
    legs = []
    for name, t, d, h in _GEN_LADDER:
        h = h.format(div="DIV")
        g = base.groupBy(
            F.expr(t).alias("g1"), F.expr(d).alias("g2"), F.expr(h).alias("g3")
        ).agg(F.count(F.lit(1)).alias("n"))
        legs.append(
            g.agg(
                F.min("n").cast("long").alias("k"),
                F.sum(F.when(F.col("n") < _K_POLICY, F.col("n")).otherwise(0))
                .cast("long")
                .alias("rows_below_k"),
                F.count(F.lit(1)).cast("long").alias("n_groups"),
            ).select(
                F.lit(name).alias("generalization"), "k", "rows_below_k", "n_groups"
            )
        )
    out = legs[0]
    for leg in legs[1:]:
        out = out.unionByName(leg)
    return out.transform(pin).orderBy("generalization")


# ---------------------------------------------------------------------------
# X-24 (cont.): Merkle-bucket replica reconciliation
# ---------------------------------------------------------------------------

_MERKLE_BUCKETS = 64


@query(
    "q380_merkle_reconcile",
    oracle=f"""
    WITH v1 AS (
        SELECT o_orderkey,
               CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
        FROM orders
    ),
    v2 AS (
        SELECT o_orderkey,
               CASE WHEN o_orderkey % 997 = 13 THEN cents + 1 ELSE cents END
                   AS cents
        FROM v1
        WHERE o_orderkey % 1009 <> 17
    ),
    h1 AS (
        SELECT o_orderkey % {_MERKLE_BUCKETS} AS bucket,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CAST({_nibble_int("md5(CAST(o_orderkey AS VARCHAR) || ':' || CAST(cents AS VARCHAR))")} AS DECIMAL(20,0))) AS DECIMAL(38,0)) AS ck
        FROM v1 GROUP BY bucket
    ),
    h2 AS (
        SELECT o_orderkey % {_MERKLE_BUCKETS} AS bucket,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CAST({_nibble_int("md5(CAST(o_orderkey AS VARCHAR) || ':' || CAST(cents AS VARCHAR))")} AS DECIMAL(20,0))) AS DECIMAL(38,0)) AS ck
        FROM v2 GROUP BY bucket
    )
    SELECT h1.bucket,
           h1.n AS n_replica_a, h2.n AS n_replica_b,
           CAST(CASE WHEN h1.n <> h2.n THEN 1 ELSE 0 END AS BIGINT)
               AS count_diverged,
           CAST(CASE WHEN h1.ck <> h2.ck THEN 1 ELSE 0 END AS BIGINT)
               AS content_diverged
    FROM h1 JOIN h2 USING (bucket)
    WHERE h1.ck <> h2.ck OR h1.n <> h2.n
    ORDER BY h1.bucket
    """,
    tags=("X-24", "A-14"),
)
def q380_merkle_reconcile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Merkle-bucket replica reconciliation (the anti-entropy pattern of
    Cassandra repair / rsync): both replicas summarize into 64
    key-bucketed (count, order-independent checksum) digests and ONLY
    diverging buckets are reported — replica B simulated with one
    deterministic value flip (key%997=13) and one dropped row
    (key%1009=17), so the expected result is the handful of buckets
    those keys land in. The point at 100 TB: reconciliation exchanges
    64 digest rows, not two tables; only flagged buckets ever need a
    row-level diff (q117's machinery), and a count divergence vs a
    content divergence tell the operator whether rows are MISSING or
    CORRUPTED before any row moves.

    Determinism: the q164 canonical-serialization + 48-bit md5 checksum
    per bucket, widened to decimal BEFORE accumulation (the q343
    overflow lesson); injected defects are pure key arithmetic.

    Scale shape: each replica costs ONE map-side-combined rollup onto
    its bounded 64-bucket digest (A-14-mergeable, so per-shard digests
    roll up); the comparison joins two 64-row relations. Nothing else
    crosses the wire.

    Reference parity: beyond-reference; composes the q164 table
    checksum into the bucketed form that makes it actionable (q164 says
    THE TABLES differ; this says WHERE)."""
    v1 = load(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    ).transform(stage)  # replica A + simulated replica B share one build
    v2 = v1.filter(F.col("o_orderkey") % 1009 != 17).select(
        "o_orderkey",
        F.when(F.col("o_orderkey") % 997 == 13, F.col("cents") + 1)
        .otherwise(F.col("cents"))
        .alias("cents"),
    )
    row_hash = F.expr(
        _nibble_int(
            "md5(CAST(o_orderkey AS string) || ':' || CAST(cents AS string))"
        )
    ).cast("decimal(20,0)")

    def digest(df: DataFrame) -> DataFrame:
        return df.groupBy(
            (F.col("o_orderkey") % _MERKLE_BUCKETS).alias("bucket")
        ).agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(row_hash).cast("decimal(38,0)").alias("ck"),
        )

    h1 = digest(v1).select(
        "bucket", F.col("n").alias("n_replica_a"), F.col("ck").alias("ck_a")
    )
    h2 = digest(v2).select(
        "bucket", F.col("n").alias("n_replica_b"), F.col("ck").alias("ck_b")
    )
    return (
        h1.join(h2, "bucket")
        .filter(
            (F.col("ck_a") != F.col("ck_b"))
            | (F.col("n_replica_a") != F.col("n_replica_b"))
        )
        .select(
            "bucket",
            "n_replica_a",
            "n_replica_b",
            (F.col("n_replica_a") != F.col("n_replica_b"))
            .cast("long")
            .alias("count_diverged"),
            (F.col("ck_a") != F.col("ck_b")).cast("long").alias("content_diverged"),
        )
        .transform(pin)
        .orderBy("bucket")
    )


# ---------------------------------------------------------------------------
# X-24 (cont.): identity-column continuity audit (missing-id islands)
# ---------------------------------------------------------------------------


@query(
    "q394_id_continuity",
    oracle="""
    WITH ids AS (SELECT DISTINCT event_id AS i FROM events),
    bounds AS (SELECT MIN(i) AS lo, MAX(i) AS hi,
                      CAST(COUNT(*) AS BIGINT) AS n FROM ids),
    gaps AS (
        SELECT i AS gap_after,
               nxt - i - 1 AS gap_len
        FROM (SELECT i, LEAD(i) OVER (ORDER BY i) AS nxt FROM ids)
        WHERE nxt IS NOT NULL AND nxt > i + 1
    )
    SELECT b.lo AS first_id, b.hi AS last_id, b.n AS n_present,
           CAST(b.hi - b.lo + 1 - b.n AS BIGINT) AS n_missing,
           CAST((SELECT COUNT(*) FROM gaps) AS BIGINT) AS n_gaps,
           CAST((SELECT COALESCE(MAX(gap_len), 0) FROM gaps) AS BIGINT)
               AS max_gap_len
    FROM bounds b
    """,
    tags=("X-24", "W-02"),
)
def q394_id_continuity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Identity-column continuity audit: are the event ids a contiguous
    sequence? Reports the id range, the exact missing-id count (an
    arithmetic identity: hi - lo + 1 - n, no spine materialized), and
    the gap census (count + longest run of missing ids via one
    lead() pass). A sequence with holes is the single cheapest signal
    of dropped ingest batches or a mis-merged backfill — checked before
    anything row-level because it costs one scan and three numbers.
    The id-space sibling of q354's time-coverage gaps.

    Determinism: exact integer ids; gap tests are exact comparisons.

    Scale shape: the missing COUNT is pure min/max/count arithmetic
    (footer-statistics cheap); the gap census is one global-order
    lead() pass over the distinct-id relation — at 100 TB run it
    per id-range bucket (the q84 two-level discipline) or accept the
    count-only fast path; both legs here share the one reduction.

    Reference parity: beyond-reference; completes X-24's ingest
    forensics (q354 time gaps, q378 parse health, q164 checksums)."""
    from pyspark.sql import Window as W

    ids = (
        load(spark, sf_dir, "events")
        .select(F.col("event_id").alias("i"))
        .groupBy("i")
        .agg(F.count(F.lit(1)).alias("_n"))
        .select("i")
        .transform(stage)  # bounds leg + gap leg share one reduction
    )
    bounds = ids.agg(
        F.min("i").alias("first_id"),
        F.max("i").alias("last_id"),
        F.count(F.lit(1)).cast("long").alias("n_present"),
    )
    nxt = F.lead("i").over(W.partitionBy().orderBy("i"))
    gaps = (
        ids.select("i", nxt.alias("nxt"))
        .filter(F.col("nxt").isNotNull() & (F.col("nxt") > F.col("i") + 1))
        .select((F.col("nxt") - F.col("i") - 1).alias("gap_len"))
    )
    gap_stats = gaps.agg(
        F.count(F.lit(1)).cast("long").alias("n_gaps"),
        F.coalesce(F.max("gap_len"), F.lit(0)).cast("long").alias("max_gap_len"),
    )
    return bounds.join(F.broadcast(gap_stats)).select(
        "first_id",
        "last_id",
        "n_present",
        (F.col("last_id") - F.col("first_id") + 1 - F.col("n_present"))
        .cast("long")
        .alias("n_missing"),
        "n_gaps",
        "max_gap_len",
    )


# ---------------------------------------------------------------------------
# X-133: differentially-private rollup export (truncated discrete Laplace)
# ---------------------------------------------------------------------------

_DP_EPS = 1.0
_DP_TRUNC = 64  #: noise support [-64, 64]; tail mass beyond is ~2e-29


def _dp_noise_cdf() -> list[tuple[int, str]]:
    """(k, cdf-literal) rows of the truncated discrete Laplace CDF at
    epsilon=1: pmf(k) ~ exp(-eps*|k|), renormalized over [-T, T]. Computed
    once on the driver and injected into BOTH engines as the SAME 17-sig-dig
    double literals (the q402 basis-table pattern), so the inverse-CDF pick
    compares bit-identical operands; the last entry is pinned to exactly 1.0
    so every u in (0, 1] selects a k."""
    import math as _m

    alpha = _m.exp(-_DP_EPS)
    ks = list(range(-_DP_TRUNC, _DP_TRUNC + 1))
    pmf = [alpha ** abs(k) for k in ks]
    z = sum(pmf)
    cdf, acc = [], 0.0
    for k, p in zip(ks, pmf):
        acc += p / z
        cdf.append((k, f"{min(acc, 1.0):.17g}"))
    cdf[-1] = (ks[-1], "1.0")
    return cdf


_DP_CDF = _dp_noise_cdf()
_DP_CDF_VALUES = ",\n        ".join(f"({k}, CAST({c} AS DOUBLE))" for k, c in _DP_CDF)
_H48_DP = 1 << 48

_DP_ROLLUP_ORACLE = f"""
    WITH cell AS (
        SELECT event_type AS etype,
               dayofweek(date_trunc('day', ts)) + 1 AS dow,
               CAST(COUNT(*) AS BIGINT) AS n_true
        FROM events GROUP BY 1, 2
    ),
    keyed AS (
        SELECT *,
               (CAST(('0x' || substr(md5('dp408:' || etype || ':'
                                     || CAST(dow AS VARCHAR)), 1, 15))
                     AS BIGINT) % {_H48_DP} + 1) / CAST({_H48_DP} AS DOUBLE) AS u
        FROM cell
    ),
    noise(k, cdf) AS (VALUES
        {_DP_CDF_VALUES}
    ),
    picked AS (
        SELECT keyed.etype, keyed.dow, keyed.n_true, keyed.u,
               CAST(MIN(noise.k) AS BIGINT) AS noise_k
        FROM keyed JOIN noise ON noise.cdf >= keyed.u
        GROUP BY 1, 2, 3, 4
    )
    SELECT etype, dow, n_true, noise_k,
           GREATEST(n_true + noise_k, 0) AS dp_count,
           CAST({_DP_EPS} AS DOUBLE) AS epsilon
    FROM picked
    ORDER BY etype, dow
"""


@query("q408_dp_rollup", oracle=_DP_ROLLUP_ORACLE, tags=("X-133", "A-02"))
def q408_dp_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Differentially-private rollup export: per (event type x day-of-week)
    cell, the true count plus TRUNCATED DISCRETE LAPLACE noise at
    epsilon=1 (sensitivity 1: one event changes one cell count by one),
    clamped at zero by post-processing — the mechanism a platform applies
    before counts leave the trust boundary, completing the privacy kit
    (q184 k-anonymity/l-diversity, q307 t-closeness, q365 generalization
    advisor ASSESS disclosure risk; this one REMOVES it with an epsilon
    budget). Cells are disjoint, so one epsilon covers the whole grid by
    parallel composition.

    Determinism (the certifiable-DP trick): the noise draw is an
    inverse-CDF lookup k = min{{k : CDF(k) >= u}} where u = (h48+1)/2^48
    comes from md5 of the cell key (the q213 exact-ratio idiom — RNG-free,
    backfill-reproducible) and the 129 CDF values are driver-precomputed
    17-sig-digit double literals injected into BOTH engines (the q402
    basis-table pattern), with CDF(64) pinned to exactly 1.0. Every
    operand of the pick is bit-identical across engines.

    Privacy claim, stated precisely (ADVICE r6): the noise is
    DP-CALIBRATED (truncated discrete Laplace at eps=1, sensitivity 1,
    tail mass ~2e-29 from the |k| <= 64 truncation) but, AS CONFIGURED,
    the mechanism is NOT differentially private — the draw is a
    deterministic function of the public cell key under the constant
    salt 'dp408:', so the release is exactly invertible by anyone who
    can recompute the hash. The query certifies the MECHANISM
    (calibration, inverse-CDF pick, post-processing clamp) under a
    replayable seed; a private deployment must substitute a secret,
    non-replayable salt, at which point the (1, ~2e-29)-DP guarantee
    attaches. The epsilon column is the calibration parameter, not an
    achieved-privacy assertion.

    Scale shape: ONE map-side-combined fact rollup onto the bounded
    (type x dow) grid; the inverse-CDF pick is a 129-row broadcast range
    join + min — per-cell cost is O(support), independent of fact size;
    noisy cells are A-14-mergeable AFTER noise only if noise is added
    once at the final merge (hence noise keys off the CELL, not the
    shard).

    Reference parity: beyond-reference; the reference exports raw counts
    to Postgres with no disclosure control."""
    cells = (
        load(spark, sf_dir, "events")
        .groupBy(
            F.col("event_type").alias("etype"),
            (F.dayofweek(F.date_trunc("day", F.col("ts")))).alias("dow"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_true"))
    )
    h48 = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.lit("dp408:"), F.col("etype"), F.lit(":"), F.col("dow").cast("string")
                    )
                ),
                1,
                15,
            ),
            16,
            10,
        ).cast("long")
        % _H48_DP
    )
    keyed = cells.withColumn("u", (h48 + 1) / F.lit(float(_H48_DP)))
    noise = spark.createDataFrame(
        [(k, float(c)) for k, c in _DP_CDF], "k int, cdf double"
    )
    picked = (
        keyed.join(F.broadcast(noise), F.col("cdf") >= F.col("u"))
        .groupBy("etype", "dow", "n_true", "u")
        .agg(F.min("k").cast("long").alias("noise_k"))
    )
    return (
        picked.select(
            "etype",
            "dow",
            "n_true",
            "noise_k",
            F.greatest(F.col("n_true") + F.col("noise_k"), F.lit(0)).alias("dp_count"),
            F.lit(_DP_EPS).cast("double").alias("epsilon"),
        )
        .transform(pin)
        .orderBy("etype", "dow")
    )
