"""Set operations (SURVEY.md §2H, U-01/U-02): union all/distinct, intersect,
except. The reference's ready-made fixture is test_data.csv + test_data_bak.csv
(identical copies merged then deduped); here the same shapes run over the
driver testdata.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..tables import load
from .registry import query
from ..functions.ordering import pin


@query(
    "q26u_union_dedup",
    oracle="""
    WITH unioned AS (
        SELECT doc_id, lang FROM documents WHERE lang = 'en'
        UNION ALL
        SELECT doc_id, lang FROM documents WHERE source = 'src0'
    )
    SELECT lang,
           COUNT(*) AS n_rows,
           COUNT(DISTINCT doc_id) AS n_distinct
    FROM unioned
    GROUP BY lang
    ORDER BY lang
    """,
    tags=("U-01",),
)
def q26u_union_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Union-all of two overlapping selections, counted raw vs deduped —
    the merge-two-backfills shape (U-01), with unionByName so column order
    can never silently misalign."""
    docs = load(spark, sf_dir, "documents")
    a = docs.filter(F.col("lang") == "en").select("doc_id", "lang")
    b = docs.filter(F.col("source") == "src0").select("doc_id", "lang")
    return (
        a.unionByName(b)
        .groupBy("lang")
        .agg(F.count("*").alias("n_rows"), F.countDistinct("doc_id").alias("n_distinct"))
        .transform(pin).orderBy("lang")
    )


@query(
    "q27u_intersect_except",
    oracle="""
    WITH clickers AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'click'),
         buyers   AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase')
    SELECT 'both' AS cohort, user_id FROM (SELECT user_id FROM clickers INTERSECT SELECT user_id FROM buyers)
    UNION ALL
    SELECT 'click_only' AS cohort, user_id FROM (SELECT user_id FROM clickers EXCEPT SELECT user_id FROM buyers)
    ORDER BY cohort, user_id
    """,
    tags=("U-02",),
)
def q27u_intersect_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT and EXCEPT cohorts (clickers vs buyers) tagged and unioned
    into one deterministic result set."""
    ev = load(spark, sf_dir, "events")
    clickers = ev.filter(F.col("event_type") == "click").select("user_id").distinct()
    buyers = ev.filter(F.col("event_type") == "purchase").select("user_id").distinct()
    both = clickers.intersect(buyers).select(F.lit("both").alias("cohort"), "user_id")
    click_only = clickers.subtract(buyers).select(F.lit("click_only").alias("cohort"), "user_id")
    return both.unionByName(click_only).transform(pin).orderBy("cohort", "user_id")


# ---------------------------------------------------------------------------
# U-02 (cont.): bag-semantics set operations (EXCEPT ALL / INTERSECT ALL)
# ---------------------------------------------------------------------------


@query(
    "q392_bag_set_ops",
    oracle="""
    WITH a AS (
        SELECT CAST(l_quantity AS BIGINT) AS qty FROM lineitem
        WHERE l_returnflag = 'R'
    ),
    b AS (
        SELECT CAST(l_quantity AS BIGINT) AS qty FROM lineitem
        WHERE l_returnflag = 'A'
    ),
    ex AS (SELECT qty FROM a EXCEPT ALL SELECT qty FROM b),
    ix AS (SELECT qty FROM a INTERSECT ALL SELECT qty FROM b)
    SELECT 'except_all' AS op, qty, CAST(COUNT(*) AS BIGINT) AS copies
    FROM ex GROUP BY qty
    UNION ALL
    SELECT 'intersect_all' AS op, qty, CAST(COUNT(*) AS BIGINT) AS copies
    FROM ix GROUP BY qty
    ORDER BY op, qty
    """,
    tags=("U-02", "A-02"),
)
def q392_bag_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag-semantics set operations: EXCEPT ALL and INTERSECT ALL over
    two multisets with heavy duplication (per-line quantities of two
    return-flag populations), reported as per-value surviving-copy
    counts. The ALL variants keep MULTIPLICITY — except_all(a, b)
    retains max(count_a - count_b, 0) copies, intersect_all keeps
    min(count_a, count_b) — which is what reconciliation math needs
    (q27u's DISTINCT variants can only say a value exists somewhere;
    these say HOW MANY are unmatched). Both semantics are pinned
    against the SQL-standard clauses.

    Determinism: multiplicities are exact; the copy-count rollup makes
    the result order-free.

    Scale shape: Spark plans both ALL variants as a single aggregate
    computing per-value counts on each side then a multiplicity
    arithmetic — one shuffle per side on the value, no row-pairing
    join; at 100 TB this is count-reconciliation, not row matching.

    Reference parity: beyond-reference; completes U-02 (set semantics)
    with the bag forms."""
    li = load(spark, sf_dir, "lineitem").select(
        "l_returnflag", F.col("l_quantity").cast("long").alias("qty")
    )
    a = li.filter(F.col("l_returnflag") == "R").select("qty")
    b = li.filter(F.col("l_returnflag") == "A").select("qty")
    ex = (
        a.exceptAll(b)
        .groupBy("qty")
        .agg(F.count(F.lit(1)).cast("long").alias("copies"))
        .select(F.lit("except_all").alias("op"), "qty", "copies")
    )
    ix = (
        a.intersectAll(b)
        .groupBy("qty")
        .agg(F.count(F.lit(1)).cast("long").alias("copies"))
        .select(F.lit("intersect_all").alias("op"), "qty", "copies")
    )
    return ex.unionByName(ix).transform(pin).orderBy("op", "qty")
