"""Table-maintenance planning (SURVEY.md §2K extensions X-30, X-31):
the small-file compaction planner (the OPTIMIZE bin-packing step a
lakehouse runs nightly to keep scan-side file counts sane) and
incremental aggregate maintenance (materialized-view delta merge — the
reason a 100 TB warehouse can keep a dashboard rollup fresh without
rescanning the fact table).

The reference app has neither: it appends Postgres rows per micro-batch
(consumer_postgres_streaming.py:143-156) and re-aggregates in the
dashboard on every read (projects/absa_streaming/streamlit/
streamlit_app.py:42) — both of these operators exist precisely to
replace that rescan-the-world pattern at scale.

Determinism: the compaction plan is pure integer arithmetic over a file
manifest; the delta merge is exact integer cents end-to-end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.ordering import pin
from ..tables import load
from .registry import query

_TARGET = 16_000  #: compaction target output size (chars stand in for bytes)

# Exact integer floor-div shared by both engines (DuckDB `/` is float,
# Spark lacks `//`): (x - x % d) / d on a d-divisible numerator is an
# exact IEEE division for x < 2^52, hence engine-identical.
_FLOORDIV = "CAST(({x} - ({x}) % {d}) / {d} AS BIGINT)"


@query(
    "q190_compaction_plan",
    oracle=f"""
    WITH manifest AS (
        SELECT source, doc_id AS file_id, CAST(n_chars AS BIGINT) AS bytes
        FROM documents
    ),
    placed AS (
        SELECT source, file_id, bytes,
               COALESCE(SUM(bytes) OVER (
                   PARTITION BY source ORDER BY file_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                   AS cum_before
        FROM manifest
    )
    SELECT source,
           {_FLOORDIV.format(x="cum_before", d=_TARGET)} AS bin,
           COUNT(*) AS n_files,
           CAST(SUM(bytes) AS BIGINT) AS total_bytes,
           MIN(file_id) AS first_file,
           MAX(file_id) AS last_file
    FROM placed
    GROUP BY 1, 2
    ORDER BY source, bin
    """,
    tags=("X-30", "W-03"),
)
def q190_compaction_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-file compaction planner (OPTIMIZE bin-packing): given a file
    manifest (one row per file: partition key, file id, size — here
    documents stand in, source=partition, n_chars=bytes), assign
    consecutive files within each partition to target-size output bins
    by cumulative offset — bin = floor(bytes_before / target) — and
    report each planned output file's input count, total size, and file
    range. A bin overflows its target by at most one input file, which
    is exactly the greedy packing Delta/Iceberg OPTIMIZE performs.

    Scale shape: this plans over the MANIFEST, never the data — at
    100 TB with 128 MB files that is ~800k rows, thousands of times
    smaller than the table. The one window runs partitioned by the
    table-partition key (compaction never crosses partitions), so no
    single-partition global sort exists; the rewrite itself would then
    stream each bin's files independently."""
    manifest = load(spark, sf_dir, "documents").select(
        "source",
        F.col("doc_id").alias("file_id"),
        F.col("n_chars").cast("long").alias("bytes"),
    )
    w = (
        Window.partitionBy("source")
        .orderBy("file_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    placed = manifest.withColumn(
        "cum_before", F.coalesce(F.sum("bytes").over(w), F.lit(0))
    )
    return (
        placed.groupBy(
            "source",
            F.expr(_FLOORDIV.format(x="cum_before", d=_TARGET)).alias("bin"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_files"),
            F.sum("bytes").cast("long").alias("total_bytes"),
            F.min("file_id").alias("first_file"),
            F.max("file_id").alias("last_file"),
        )
        .orderBy("source", "bin")
    )


@query(
    "q191_incremental_agg_merge",
    oracle="""
    WITH v1 AS (
        SELECT c_custkey, c_nationkey,
               CAST(ROUND(c_acctbal * 100) AS BIGINT) AS cents
        FROM customer
    ),
    v2 AS (
        SELECT c_custkey, c_nationkey,
               CASE WHEN c_custkey % 10 = 0 THEN cents + 10000
                    ELSE cents END AS cents
        FROM v1 WHERE c_custkey % 17 <> 3
        UNION ALL
        SELECT c_custkey + 1000000, c_nationkey, CAST(0 AS BIGINT)
        FROM v1 WHERE c_custkey % 23 = 5
    )
    SELECT c_nationkey,
           COUNT(*) AS n_customers,
           CAST(SUM(cents) AS BIGINT) AS total_cents
    FROM v2
    GROUP BY c_nationkey
    ORDER BY c_nationkey
    """,
    tags=("X-31", "A-14", "A-01"),
)
def q191_incremental_agg_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental materialized-view maintenance: keep a per-nation
    (count, total-cents) rollup of the customer dimension fresh across a
    table version change WITHOUT re-aggregating the new version. The
    Spark side computes base = agg(v1), folds the q117-style changelog
    (every 17th key deleted, every 10th survivor +100.00, every 23rd
    spawning a zero-balance insert) into per-nation deltas
    (D: -1/-cents, U: 0/+10000, I: +1/0), and emits base ⊕ delta; the
    ORACLE aggregates v2 directly — a hash match IS the proof that the
    incremental path equals the full recompute, the A-14 mergeability
    contract applied to view maintenance.

    Scale shape: the base rollup is one map-side-combined groupBy; the
    delta here derives from one column-pruned scan of the changed rows
    (in production it reads the q117/q150 changelog, sized by the CHANGE
    RATE, not the table), reduces to per-nation deltas before any join,
    and the merge joins two nation-keyed bounded relations. A
    fully-deleted group drops out (n=0 filter), matching view semantics."""
    v1 = load(spark, sf_dir, "customer").select(
        "c_custkey",
        "c_nationkey",
        F.expr("CAST(ROUND(c_acctbal * 100) AS BIGINT)").alias("cents"),
    )
    base = v1.groupBy("c_nationkey").agg(
        F.count(F.lit(1)).alias("n1"), F.sum("cents").alias("s1")
    )
    k = F.col("c_custkey")
    deleted = (k % 17) == 3
    updated = ((k % 10) == 0) & ~deleted
    inserted = (k % 23) == 5
    delta = (
        v1.filter(deleted | updated | inserted)
        .select(
            "c_nationkey",
            (
                F.when(deleted, -1).otherwise(0)
                + F.when(inserted, 1).otherwise(0)
            ).alias("dn"),
            (
                F.when(deleted, -F.col("cents"))
                .when(updated, F.lit(10000))
                .otherwise(F.lit(0))
            ).cast("long").alias("ds"),
        )
        .groupBy("c_nationkey")
        .agg(F.sum("dn").alias("dn"), F.sum("ds").alias("ds"))
    )
    return (
        base.join(delta, "c_nationkey", "left_outer")
        .select(
            "c_nationkey",
            (F.col("n1") + F.coalesce(F.col("dn"), F.lit(0))).alias("n_customers"),
            (F.col("s1") + F.coalesce(F.col("ds"), F.lit(0)))
            .cast("long")
            .alias("total_cents"),
        )
        .filter(F.col("n_customers") > 0)
        .orderBy("c_nationkey")
    )


# ---------------------------------------------------------------------------
# X-119: partition-key advisor (workload-weighted pruning benefit)
# ---------------------------------------------------------------------------

_PKA_ORACLE = """
    WITH base AS (
        SELECT event_type,
               (CAST(FLOOR(epoch(date_trunc('day', ts))) AS BIGINT)
                // 86400 + 4) % 7 AS dow,
               CAST(FLOOR(epoch(ts)) AS BIGINT) // 3600 % 24 AS hr
        FROM events
    ),
    tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM base),
    sel AS (
        SELECT
            CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                 AS BIGINT) AS w1,
            CAST(SUM(CASE WHEN dow IN (0, 6) THEN 1 ELSE 0 END) AS BIGINT) AS w2,
            CAST(SUM(CASE WHEN hr < 6 THEN 1 ELSE 0 END) AS BIGINT) AS w3
        FROM base
    ),
    cand AS (
        SELECT 'event_type' AS candidate, s.w1 AS r1, t.n AS r2, t.n AS r3
        FROM sel s, tot t
        UNION ALL
        SELECT 'dow', t.n, s.w2, t.n FROM sel s, tot t
        UNION ALL
        SELECT 'hour_of_day', t.n, t.n, s.w3 FROM sel s, tot t
    )
    SELECT c.candidate, c.r1 AS rows_w1, c.r2 AS rows_w2, c.r3 AS rows_w3,
           CAST(c.r1 + c.r2 + c.r3 AS BIGINT) AS total_rows_read,
           1 - CAST(c.r1 + c.r2 + c.r3 AS DOUBLE) / (3 * t.n) AS skip_frac,
           ROW_NUMBER() OVER (ORDER BY c.r1 + c.r2 + c.r3, c.candidate)
               AS advisor_rank
    FROM cand c, tot t
    ORDER BY advisor_rank
"""


@query("q329_partition_key_advisor", oracle=_PKA_ORACLE, tags=("X-119", "X-12"))
def q329_partition_key_advisor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partition-key advisor: for each candidate partition column
    (event_type, day-of-week, hour-of-day) and a declared 3-query
    workload (purchase scans, weekend scans, night scans), the rows a
    partition-pruned scan would actually read — a predicate prunes only
    when it filters the PARTITION column; every other query reads the
    whole table — ranked by total read cost. The layout decision
    upstream of q116's z-order (choose the coarse partition key first,
    z-order within it) and of q190's compaction planning; at 100 TB
    this choice IS the query bill.

    Determinism: all row counts are exact integers from ONE scan's
    conditional aggregates; the advisor rank is a (cost, candidate)
    total order; the single double is the skip fraction.

    Scale shape: one map-side-combined pass produces every selectivity;
    the candidate relation is 3 rows.

    Reference parity: beyond-reference lakehouse planning."""
    base = load(spark, sf_dir, "events").select(
        "event_type",
        F.pmod(
            (F.unix_timestamp(F.date_trunc("day", F.col("ts"))) / F.lit(86400))
            .cast("long")
            + 4,
            F.lit(7),
        ).alias("dow"),
        F.expr("CAST(FLOOR(unix_timestamp(ts)) AS BIGINT) div 3600 % 24").alias(
            "hr"
        ),
    )
    sel = base.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
        .cast("long")
        .alias("w1"),
        F.sum(F.when(F.col("dow").isin(0, 6), 1).otherwise(0))
        .cast("long")
        .alias("w2"),
        F.sum(F.when(F.col("hr") < 6, 1).otherwise(0)).cast("long").alias("w3"),
    )
    cand = sel.select(
        F.expr(
            "stack(3,"
            " 'event_type', w1, n, n,"
            " 'dow', n, w2, n,"
            " 'hour_of_day', n, n, w3) AS (candidate, r1, r2, r3)"
        ),
        "n",
    )
    from pyspark.sql.window import Window as W

    return (
        cand.select(
            "candidate",
            F.col("r1").cast("long").alias("rows_w1"),
            F.col("r2").cast("long").alias("rows_w2"),
            F.col("r3").cast("long").alias("rows_w3"),
            (F.col("r1") + F.col("r2") + F.col("r3")).cast("long").alias(
                "total_rows_read"
            ),
            (
                F.lit(1)
                - (F.col("r1") + F.col("r2") + F.col("r3")).cast("double")
                / (3 * F.col("n"))
            ).alias("skip_frac"),
        )
        .withColumn(
            "advisor_rank",
            F.row_number().over(W.orderBy("total_rows_read", "candidate")),
        )
        .transform(pin)
        .orderBy("advisor_rank")
    )


# ---------------------------------------------------------------------------
# X-30 (cont.): column-encoding advisor (dictionary / RLE / plain)
# ---------------------------------------------------------------------------

#: canonical per-column value expression ({t}: string/VARCHAR) — value as
#: exact cents so runs/ndv mean the same thing in both engines.
_ENC_COLS = {
    "event_type": "event_type",
    "user_id": "CAST(user_id AS {t})",
    "value_cents": "CAST(CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS {t})",
}


def _enc_run_flag(expr: str) -> str:
    """1 when this row STARTS a run of equal values under the per-day
    (ts, event_id) order — valid in both engines."""
    return (
        f"CASE WHEN LAG({expr}) OVER (PARTITION BY day_ ORDER BY ts, event_id) "
        f"IS DISTINCT FROM {expr} THEN 1 ELSE 0 END"
    )


@query(
    "q348_encoding_advisor",
    oracle=f"""
    WITH base AS (
        SELECT date_trunc('day', ts) AS day_, ts, event_id,
               {", ".join(f"{e.format(t='VARCHAR')} AS c_{i}" for i, e in enumerate(_ENC_COLS.values()))}
        FROM events
    ),
    runs AS (
        SELECT *,
               {", ".join(f"{_enc_run_flag(f'c_{i}')} AS r_{i}" for i in range(len(_ENC_COLS)))}
        FROM base
    ),
    agg AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               {", ".join(
                   f"CAST(COUNT(DISTINCT c_{i}) AS BIGINT) AS nd_{i}, "
                   f"CAST(SUM(r_{i}) AS BIGINT) AS nr_{i}"
                   for i in range(len(_ENC_COLS))
               )}
        FROM runs
    )
    {" UNION ALL ".join(
        f'''SELECT '{c}' AS column_name, n AS n_rows, nd_{i} AS n_distinct,
                   nr_{i} AS n_runs,
                   ROUND(CAST(n AS DOUBLE) / nr_{i}, 6) AS avg_run_len,
                   CASE WHEN 100 * nd_{i} <= n THEN 'DICTIONARY'
                        WHEN 2 * nr_{i} <= n THEN 'RLE'
                        ELSE 'PLAIN' END AS advice
            FROM agg'''
        for i, c in enumerate(_ENC_COLS)
    )}
    ORDER BY column_name
    """,
    tags=("X-30", "X-11"),
)
def q348_encoding_advisor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column-encoding advisor: per column, the statistics a columnar
    writer's encoding chooser needs — distinct count (dictionary
    eligibility) and run count under the table's declared sort order
    (RLE eligibility; runs are measured within day segments ordered by
    (ts, event_id), the layout q116's clustering and q190's compaction
    produce) — plus the verdict via exact integer thresholds: DICTIONARY
    when ndv <= n/100, else RLE when average run length >= 2, else
    PLAIN. The OPTIMIZE-adjacent half of X-30: q190 plans the file bins,
    this advises what to encode inside them (the decision Parquet/ORC
    writers make from exactly these stats). Distinct from q224's
    entropy advisor by construction: entropy is ORDER-FREE information
    content (predicts dictionary win), while run length is an
    ORDER-DEPENDENT layout property (predicts RLE win) that only exists
    relative to the declared sort — the two advisors disagree exactly
    when re-sorting would change the verdict, which is the signal q116's
    clustering acts on.

    Determinism: run starts use IS DISTINCT FROM under a total
    per-segment order; counts are exact; the one ratio rounds at 6 dp;
    advice thresholds are exact integer comparisons (100·ndv <= n,
    2·runs <= n).

    Scale shape: one scan; the three run-flag lags share ONE window
    (partitioned by day — never a single global sort; segment count
    grows with the calendar, so parallelism survives 100 TB); the three
    count-distincts ride one wide ungrouped HashAggregate (the q113
    Expand discipline, never a scan per column); three rows explode from
    the single aggregate row.

    Reference parity: beyond-reference; extends X-30 (q190 compaction
    bins) and X-11/X-119's advisor family (q329 partition keys) down to
    the encoding level."""
    ev = load(spark, sf_dir, "events").select(
        F.date_trunc("day", F.col("ts")).alias("day_"),
        "ts",
        "event_id",
        *[
            F.expr(e.format(t="string")).alias(f"c_{i}")
            for i, e in enumerate(_ENC_COLS.values())
        ],
    )
    runs = ev.select(
        "*",
        *[
            F.expr(_enc_run_flag(f"c_{i}")).alias(f"r_{i}")
            for i in range(len(_ENC_COLS))
        ],
    )
    aggs = [F.count(F.lit(1)).cast("long").alias("n")]
    for i in range(len(_ENC_COLS)):
        aggs.append(F.countDistinct(f"c_{i}").cast("long").alias(f"nd_{i}"))
        aggs.append(F.sum(f"r_{i}").cast("long").alias(f"nr_{i}"))
    agg = runs.agg(*aggs)
    stack = ", ".join(
        f"'{c}', n, nd_{i}, nr_{i}" for i, c in enumerate(_ENC_COLS)
    )
    out = agg.select(
        F.expr(
            f"stack({len(_ENC_COLS)}, {stack}) "
            "AS (column_name, n_rows, n_distinct, n_runs)"
        )
    )
    return (
        out.select(
            "column_name",
            "n_rows",
            "n_distinct",
            "n_runs",
            F.round(F.col("n_rows").cast("double") / F.col("n_runs"), 6).alias(
                "avg_run_len"
            ),
            F.when(100 * F.col("n_distinct") <= F.col("n_rows"), "DICTIONARY")
            .when(2 * F.col("n_runs") <= F.col("n_rows"), "RLE")
            .otherwise("PLAIN")
            .alias("advice"),
        )
        .transform(pin)
        .orderBy("column_name")
    )
