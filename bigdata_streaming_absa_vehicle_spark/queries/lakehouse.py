"""Lakehouse-maintenance query surface (SURVEY.md §2K extensions X-12/X-13):
Z-order clustering for multi-column data skipping, snapshot-diff CDC
(changelog derivation between two table versions), and the event-sequence
transition matrix. These are the table-maintenance / incremental-consumption
operations a 100 TB lakehouse runs nightly.

Deterministic: z-values are pure integer bit arithmetic, the diff op labels
are exact comparisons, transition probabilities divide exact counts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.ordering import pin, stage
from ..tables import load
from .registry import query

# ---------------------------------------------------------------------------
# X-12: Z-order clustering (multi-dimensional data skipping)
# ---------------------------------------------------------------------------

#: Spark SQL / DuckDB twins of the 16-bit interleave z(a, b); a fills even
#: bit positions, b odd.  Pure integer shifts — bit-identical everywhere.
_Z_SPARK = (
    "aggregate(sequence(0, 15), CAST(0 AS BIGINT), (acc, i) -> acc"
    " + shiftleft(shiftright(a, i) & 1, 2*i)"
    " + shiftleft(shiftright(b, i) & 1, 2*i + 1))"
)
_Z_DUCK = (
    "CAST(list_sum(list_transform(range(16), i ->"
    " (((a >> i) & 1) << (2*i)) + (((b >> i) & 1) << (2*i+1)))) AS BIGINT)"
)


@query(
    "q116_zorder_cluster",
    oracle=f"""
    WITH keyed AS (
        SELECT user_id % 1024 AS a, CAST(FLOOR(value) AS BIGINT) AS b
        FROM events
    ),
    z AS (
        SELECT a, b, {_Z_DUCK} AS zval FROM keyed
    )
    SELECT zval >> 12 AS z_bucket,
           COUNT(*) AS n,
           MIN(a) AS min_a, MAX(a) AS max_a,
           MIN(b) AS min_b, MAX(b) AS max_b
    FROM z
    GROUP BY z_bucket
    ORDER BY z_bucket
    """,
    tags=("X-12",),
)
def q116_zorder_cluster(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order clustering: interleave the bits of two filter columns
    (user bucket, value magnitude) into one sort key, then report per
    z-bucket min/max of BOTH dimensions. The point of the result: every
    bucket is bounded in a AND in b simultaneously — so files written in
    z-bucket order support min/max (zone-map) skipping for predicates on
    EITHER column, which a single-column sort can only give to one. This
    is the OPTIMIZE ZORDER BY maintenance op of lakehouse table formats,
    re-expressed as a pure Spark pipeline.

    Scale shape: the z-value is map-only integer bit arithmetic in
    whole-stage codegen; the per-bucket stats are one map-side-combined
    aggregate on ~256 keys. The real write path would range-partition by
    zval (repartitionByRange) and write one file per range — same plan
    plus an exchange that replaces the shuffle this aggregate does."""
    ev = load(spark, sf_dir, "events").select(
        (F.col("user_id") % 1024).alias("a"),
        F.floor(F.col("value")).cast("bigint").alias("b"),
    )
    z = ev.select("a", "b", F.expr(_Z_SPARK).alias("zval"))
    return (
        z.groupBy(F.shiftright("zval", 12).alias("z_bucket"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("a").alias("min_a"),
            F.max("a").alias("max_a"),
            F.min("b").alias("min_b"),
            F.max("b").alias("max_b"),
        )
        .transform(pin)
        .orderBy("z_bucket")
    )


# ---------------------------------------------------------------------------
# X-13: snapshot diff (CDC changelog between two table versions)
# ---------------------------------------------------------------------------


@query(
    "q117_snapshot_diff",
    oracle="""
    WITH old AS (
        SELECT c_custkey, c_name, c_acctbal FROM customer
    ),
    new AS (
        SELECT c_custkey, c_name,
               CASE WHEN c_custkey % 10 = 0 THEN c_acctbal + 100 ELSE c_acctbal END AS c_acctbal
        FROM customer WHERE c_custkey % 17 <> 3
        UNION ALL
        SELECT c_custkey + 1000000, 'ins_' || CAST(c_custkey AS VARCHAR), 0.0
        FROM customer WHERE c_custkey % 23 = 5
    )
    SELECT COALESCE(o.c_custkey, n.c_custkey) AS c_custkey,
           CASE WHEN n.c_custkey IS NULL THEN 'D'
                WHEN o.c_custkey IS NULL THEN 'I'
                ELSE 'U' END AS op,
           o.c_acctbal AS old_acctbal,
           n.c_acctbal AS new_acctbal
    FROM old o FULL OUTER JOIN new n USING (c_custkey)
    WHERE n.c_custkey IS NULL OR o.c_custkey IS NULL
       OR o.c_acctbal <> n.c_acctbal OR o.c_name <> n.c_name
    ORDER BY c_custkey
    """,
    tags=("X-13", "J-12"),
)
def q117_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot diff / CDC derivation: given two versions of a table (the
    new one simulated deterministically — every 17th key deleted, every
    10th rebalanced, every 23rd spawning an insert), emit the minimal
    changelog (op I/U/D with before/after values) a downstream consumer
    needs to incrementally catch up — the engine-side equivalent of a
    table format's change data feed.

    Scale shape: one full-outer join co-partitioned on the primary key is
    the whole cost; on bucketed tables (S-10) it plans with zero
    exchanges. Unchanged rows are filtered AFTER the join by cheap column
    comparison — no row hashing pass, no second scan of either side."""
    old = load(spark, sf_dir, "customer").select("c_custkey", "c_name", "c_acctbal")
    surv = old.filter(F.col("c_custkey") % 17 != 3).select(
        "c_custkey",
        "c_name",
        F.when(F.col("c_custkey") % 10 == 0, F.col("c_acctbal") + 100)
        .otherwise(F.col("c_acctbal"))
        .alias("c_acctbal"),
    )
    ins = old.filter(F.col("c_custkey") % 23 == 5).select(
        (F.col("c_custkey") + 1000000).alias("c_custkey"),
        F.concat(F.lit("ins_"), F.col("c_custkey").cast("string")).alias("c_name"),
        F.lit(0.0).alias("c_acctbal"),
    )
    new = surv.unionByName(ins)
    o = old.alias("o")
    n = new.alias("n")
    joined = o.join(n, F.col("o.c_custkey") == F.col("n.c_custkey"), "full_outer")
    return (
        joined.filter(
            F.col("n.c_custkey").isNull()
            | F.col("o.c_custkey").isNull()
            | (F.col("o.c_acctbal") != F.col("n.c_acctbal"))
            | (F.col("o.c_name") != F.col("n.c_name"))
        )
        .select(
            F.coalesce(F.col("o.c_custkey"), F.col("n.c_custkey")).alias("c_custkey"),
            F.when(F.col("n.c_custkey").isNull(), "D")
            .when(F.col("o.c_custkey").isNull(), "I")
            .otherwise("U")
            .alias("op"),
            F.col("o.c_acctbal").alias("old_acctbal"),
            F.col("n.c_acctbal").alias("new_acctbal"),
        )
        .transform(pin)
        .orderBy("c_custkey")
    )


# ---------------------------------------------------------------------------
# X-13 companion: event-sequence transition matrix
# ---------------------------------------------------------------------------


@query(
    "q118_transition_matrix",
    oracle="""
    WITH seq AS (
        SELECT user_id, event_type,
               LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
        FROM events
    ),
    pairs AS (
        SELECT prev_type, event_type AS next_type, COUNT(*) AS n
        FROM seq WHERE prev_type IS NOT NULL
        GROUP BY prev_type, next_type
    ),
    totals AS (
        SELECT prev_type, SUM(n) AS row_total FROM pairs GROUP BY prev_type
    )
    SELECT p.prev_type, p.next_type, p.n,
           ROUND(CAST(p.n AS DOUBLE) / t.row_total, 6) AS p_next
    FROM pairs p JOIN totals t USING (prev_type)
    ORDER BY prev_type, next_type
    """,
    tags=("X-13", "W-02"),
)
def q118_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-type transition matrix (first-order Markov counts +
    probabilities) over per-user event sequences — the behavioral model
    behind next-action prediction features and funnel design. Ties in the
    per-user order are broken by event_id so the lag sequence is a total
    order; probabilities divide exact counts.

    Scale shape: one shuffle on user_id for the lag window, then a
    map-side-combined aggregate onto the tiny (prev, next) key space; row
    totals broadcast back. Never a self-join of events with itself."""
    from pyspark.sql.window import Window

    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        ev.select(
            F.lag("event_type").over(w).alias("prev_type"),
            F.col("event_type").alias("next_type"),
        )
        .filter(F.col("prev_type").isNotNull())
        .groupBy("prev_type", "next_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    totals = pairs.groupBy("prev_type").agg(F.sum("n").alias("row_total"))
    return (
        pairs.join(F.broadcast(totals), "prev_type")
        .select(
            "prev_type",
            "next_type",
            "n",
            F.round(F.col("n").cast("double") / F.col("row_total"), 6).alias("p_next"),
        )
        .transform(pin)
        .orderBy("prev_type", "next_type")
    )


# ---------------------------------------------------------------------------
# X-13: changelog compaction (apply CDC stream -> current snapshot)
# ---------------------------------------------------------------------------


@query(
    "q150_changelog_compaction",
    oracle="""
    WITH log AS (
        SELECT user_id,
               CASE WHEN event_type = 'error' THEN 'D' ELSE 'U' END AS op,
               ts, event_id, value,
               ROW_NUMBER() OVER (PARTITION BY user_id
                                  ORDER BY ts DESC, event_id DESC) AS rn,
               COUNT(*) OVER (PARTITION BY user_id) AS n_changes
        FROM events
    )
    SELECT user_id, ts AS last_ts, value AS current_value, n_changes
    FROM log WHERE rn = 1 AND op <> 'D'
    ORDER BY user_id
    """,
    tags=("X-13", "W-01"),
)
def q150_changelog_compaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Changelog compaction — the READ side of CDC merge (q117 is the
    write/diff side): collapse an upsert/delete stream to the current
    snapshot by keeping each key's LAST operation under the total order
    (ts, event_id) and dropping keys whose final operation is a delete
    (here: 'error' events play the tombstone). This is what a lakehouse
    table format does on every MERGE-on-read query and what OPTIMIZE
    materializes.

    Scale shape: one shuffle on the key, one in-partition sort for the
    row_number — the same plan as grouped top-k (O-05); no self-join, no
    global sort. At scale the same code compacts per partition-file in
    the background exactly like Delta/Iceberg compaction jobs."""
    ev = load(spark, sf_dir, "events")
    from pyspark.sql.window import Window

    w = Window.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    log = ev.select(
        "user_id",
        F.when(F.col("event_type") == "error", "D").otherwise("U").alias("op"),
        "ts",
        "event_id",
        "value",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy("user_id")).alias("n_changes"),
    )
    return (
        log.filter((F.col("rn") == 1) & (F.col("op") != "D"))
        .select(
            "user_id",
            F.col("ts").alias("last_ts"),
            F.col("value").alias("current_value"),
            "n_changes",
        )
        .transform(pin)
        .orderBy("user_id")
    )


@query(
    "q182_state_as_of",
    oracle="""
    WITH log AS (
        SELECT user_id, event_type, ts, event_id, value,
               ROW_NUMBER() OVER (PARTITION BY user_id
                                  ORDER BY ts DESC, event_id DESC) AS rn,
               CAST(COUNT(*) OVER (PARTITION BY user_id) AS BIGINT) AS n_changes
        FROM events
        WHERE ts < TIMESTAMP '2024-01-15 00:00:00'
    )
    SELECT user_id, ts AS state_ts, event_type AS state_type,
           ROUND(value, 2) AS state_value, n_changes
    FROM log WHERE rn = 1 AND event_type <> 'error'
    ORDER BY user_id
    """,
    tags=("X-13", "W-01", "P-04"),
)
def q182_state_as_of(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time state reconstruction (the time-travel READ): replay
    the changelog only up to T = 2024-01-15 and keep each key's last
    non-tombstone operation under the (ts, event_id) total order — "what
    did this table look like at T", the AS OF query a lakehouse answers
    from old snapshots and this engine answers from the raw log.  The
    q150 compaction is the T = now special case; q149's point-in-time
    JOIN consumes exactly these states, one per label timestamp.

    Scale shape: the ts < T predicate PUSHES TO THE SCAN (parquet
    min/max zone maps skip every file newer than T — the same pruning a
    snapshot read gets from its manifest), then one keyed shuffle + the
    grouped-top-k in-partition sort, identical to q150.  n_changes rides
    the same window partition, so no second scan."""
    from pyspark.sql.window import Window

    ev = load(spark, sf_dir, "events").where(
        F.col("ts") < F.lit("2024-01-15 00:00:00").cast("timestamp")
    )
    w = Window.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    log = ev.select(
        "user_id",
        "event_type",
        "ts",
        "event_id",
        "value",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy("user_id")).cast("long").alias("n_changes"),
    )
    return (
        log.filter((F.col("rn") == 1) & (F.col("event_type") != "error"))
        .select(
            "user_id",
            F.col("ts").alias("state_ts"),
            F.col("event_type").alias("state_type"),
            F.round("value", 2).alias("state_value"),
            "n_changes",
        )
        .transform(pin)
        .orderBy("user_id")
    )


# ---------------------------------------------------------------------------
# X-13 companion: stationary distribution of the transition matrix
# ---------------------------------------------------------------------------

_MK_ITERS = 3

# The power iteration runs in EXACT integer pico-units (scale 1e12):
# p12_ij = (n_ij * 1e12) div row_total_i and x'_j = (sum_i x12_i * p12_ij)
# div 1e12, with div the floor division both engines compute exactly
# (Spark decimal `div`, DuckDB HUGEINT `//` — verified bit-identical).
# The previous form (x/row_total at DECIMAL(28,18) times the bigint
# count, 12-dp double rounds) silently ran at scale SEVEN in Spark:
# decimal(28,18) * bigint overflows precision 38 and Catalyst's
# allowPrecisionLoss reduces the result scale to 7, while DuckDB keeps
# 18 — a ~2e-9 cross-engine drift that q291's boundary-sitting entropy
# readout exposed at sf0.1.
_MK_SQL_PRELUDE = """
    WITH seq AS (
        SELECT user_id, event_type,
               LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   AS prev_type
        FROM events
    ),
    pairs AS (
        SELECT prev_type, event_type AS next_type, CAST(COUNT(*) AS BIGINT) AS n
        FROM seq WHERE prev_type IS NOT NULL
        GROUP BY prev_type, next_type
    ),
    totals AS (
        SELECT prev_type, CAST(SUM(n) AS BIGINT) AS row_total
        FROM pairs GROUP BY prev_type
    ),
    types AS (SELECT DISTINCT prev_type AS event_type FROM pairs),
    nt AS (SELECT COUNT(*) AS k FROM types),
    p12 AS (
        SELECT p.prev_type, p.next_type,
               CAST((CAST(p.n AS HUGEINT) * 1000000000000) // t.row_total
                    AS BIGINT) AS p12
        FROM pairs p JOIN totals t USING (prev_type)
    ),
    x0 AS (
        SELECT event_type,
               (SELECT CAST(CAST(1000000000000 AS HUGEINT) // k AS BIGINT)
                FROM nt) AS x12
        FROM types
    )"""


def _mk_iter_ctes() -> tuple[str, str]:
    """The unrolled x1..xN CTEs; returns (cte_sql, last_cte_name)."""
    it_cte = ""
    prev = "x0"
    for it in range(1, _MK_ITERS + 1):
        it_cte += f""",
    x{it} AS (
        SELECT p.next_type AS event_type,
               CAST(SUM(CAST({prev}.x12 AS HUGEINT) * p.p12) // 1000000000000
                    AS BIGINT) AS x12
        FROM p12 p
        JOIN {prev} ON {prev}.event_type = p.prev_type
        GROUP BY p.next_type
    )"""
        prev = f"x{it}"
    return it_cte, prev


def _stationary_x12(pairs: DataFrame, totals: DataFrame, k: int) -> DataFrame:
    """Spark twin of the oracle CTEs: (event_type, x12) after _MK_ITERS
    exact integer pico-unit power iterations from the uniform start."""
    p12 = pairs.join(F.broadcast(totals), "prev_type").select(
        "prev_type",
        "next_type",
        F.expr(
            "CAST(CAST(n AS DECIMAL(26,0)) * 1000000000000 AS DECIMAL(38,0))"
            " div row_total"
        ).alias("p12"),
    )
    types = pairs.select(F.col("prev_type").alias("event_type")).distinct()
    x = types.select(
        "event_type", F.lit(10**12 // k).cast("long").alias("x12")
    )
    for _ in range(_MK_ITERS):
        contrib = p12.join(
            x, x["event_type"] == F.col("prev_type")
        ).select(
            F.col("next_type"),
            (F.col("x12").cast("decimal(19,0)") * F.col("p12")).alias("c"),
        )
        x = contrib.groupBy(F.col("next_type").alias("event_type")).agg(
            F.expr("CAST(SUM(c) AS DECIMAL(38,0)) div 1000000000000")
            .cast("long")
            .alias("x12")
        )
    return x


def _stationary_oracle() -> str:
    it_cte, prev = _mk_iter_ctes()
    return f"""{_MK_SQL_PRELUDE}{it_cte}
    SELECT event_type, CAST(x12 AS DOUBLE) / 1e12 AS stationary_p
    FROM {prev} ORDER BY event_type
    """


@query("q221_markov_stationary", oracle=_stationary_oracle(), tags=("X-13", "X-15"))
def q221_markov_stationary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stationary distribution of q118's event-type transition matrix via
    3 unrolled power iterations from a uniform start — where the user
    population settles if behavior follows the fitted chain, the
    long-run complement of q118's one-step probabilities and the base
    rate q197's next-event backtest should be judged against. The X-15
    iterative-numeric discipline on a BOUNDED state space, here in
    EXACT integer pico-units: p12 = (n*1e12) div row_total, each step
    x' = (sum x12*p12) div 1e12 — floor divisions both engines compute
    exactly (Spark decimal div, DuckDB HUGEINT //), so NO float exists
    anywhere in the loop and the trajectory is engine-identical by
    construction; the single IEEE division x12/1e12 happens at readout.

    Scale shape: the chain fits with ONE user-keyed window pass + a
    map-side-combined rollup onto the |types|^2 relation; each power
    iteration is a join of two BOUNDED relations (<=25 cells x 5
    states) — at any fact scale the iteration cost is constant, which
    is exactly why the rollup-then-iterate order matters."""
    from pyspark.sql.window import Window

    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        ev.select(
            F.lag("event_type").over(w).alias("prev_type"),
            F.col("event_type").alias("next_type"),
        )
        .filter(F.col("prev_type").isNotNull())
        .groupBy("prev_type", "next_type")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .transform(stage)  # bounded |types|^2 relation drives every iteration
    )
    totals = pairs.groupBy("prev_type").agg(F.sum("n").cast("long").alias("row_total"))
    k = pairs.select("prev_type").distinct().count()  # bounded metadata
    x = _stationary_x12(pairs, totals, k)
    return (
        x.select(
            "event_type",
            (F.col("x12").cast("double") / F.lit(1e12)).alias("stationary_p"),
        )
        .transform(pin)
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# X-13 (cont.): entropy rate of the behavior chain
# ---------------------------------------------------------------------------


def _entropy_rate_oracle() -> str:
    it_cte, prev = _mk_iter_ctes()
    return f"""{_MK_SQL_PRELUDE}{it_cte},
    hrow AS (
        SELECT p.prev_type AS event_type, t.row_total,
               CAST(SUM(CAST(p.n * CAST(ROUND(
                        ROUND(ln(CAST(t.row_total AS DOUBLE) / p.n), 6) * 1e6)
                        AS BIGINT) AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS s6
        FROM pairs p JOIN totals t USING (prev_type)
        GROUP BY 1, 2
    ),
    ent AS (
        SELECT h.event_type, CAST(s.x12 AS DOUBLE) / 1e12 AS pi,
               CAST(h.s6 AS DOUBLE) / h.row_total / 1e6 AS h_state,
               (CAST(s.x12 AS DOUBLE) / 1e12)
                   * (CAST(h.s6 AS DOUBLE) / h.row_total / 1e6) AS term
        FROM hrow h JOIN {prev} s USING (event_type)
    ),
    tot AS (
        SELECT list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                                        list(term ORDER BY event_type)),
                           (a, b) -> a + b) AS er
        FROM ent
    )
    SELECT event_type, pi AS stationary_p,
           h_state AS h_state_nats,
           (SELECT er FROM tot) AS entropy_rate_nats,
           (SELECT ROUND(ln(CAST(k AS DOUBLE)), 6) FROM nt) AS max_entropy_nats
    FROM ent
    ORDER BY event_type
    """


@query("q291_entropy_rate", oracle=_entropy_rate_oracle(), tags=("X-13", "X-22"))
def q291_entropy_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entropy rate of the user-behavior Markov chain: per state the
    conditional next-step entropy H_i = sum_j P_ij ln(1/P_ij), weighted
    by q221's stationary distribution into the chain's entropy rate
    H = sum_i pi_i H_i — the bits-per-step predictability ceiling of
    user behavior (H near ln(K): next actions are noise, sequence
    models can't help; H near 0: behavior is scripted), reported beside
    ln(K) so the gap IS the signal. The information-theoretic readout
    on top of the q118/q221 transition machinery, and the sequence
    counterpart of q172's marginal user entropy.

    Determinism: NO float-to-decimal rounding exists past the pinned
    lns — at sf0.1 the entropy rate lands almost exactly on a 6-dp
    half-way, so a single 1e-9 per-term rounding divergence (Spark's
    exact BigDecimal HALF_UP vs DuckDB's multiply-based ROUND disagree
    on half-way doubles) flipped the canonical readout. Instead each
    6-dp ln becomes an exact integer of micro-nats (the rounded double
    is within an ulp of the integer, so the cast cannot tie), per-state
    sums n*lnr6 are exact decimals, h_state is two correctly-rounded
    IEEE divisions on bit-identical operands, pi comes out of q221's
    all-integer pico-unit iteration (one IEEE division at readout), the
    pi-weighted terms are single IEEE products, and the 5-term total is
    a FIXED-ORDER left
    fold (array_sort + aggregate / list ORDER BY + list_reduce) so FP
    non-associativity cannot reorder it. All readouts are raw doubles,
    bit-identical by construction; the harness canonicalizes both
    frames with the same Python 6-dp rounding.

    Scale shape: ONE user-keyed window pass + map-side rollup onto the
    bounded |types|^2 relation (the q221 plan); the stationary
    iterations, the per-state entropies, and the weighted readout all
    run on that bounded relation."""
    from pyspark.sql.window import Window

    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        ev.select(
            F.lag("event_type").over(w).alias("prev_type"),
            F.col("event_type").alias("next_type"),
        )
        .filter(F.col("prev_type").isNotNull())
        .groupBy("prev_type", "next_type")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .transform(stage)  # iterations + the entropy rollup share it
    )
    totals = pairs.groupBy("prev_type").agg(F.sum("n").cast("long").alias("row_total"))
    k = pairs.select("prev_type").distinct().count()  # bounded metadata
    x = _stationary_x12(pairs, totals, k).select(
        "event_type", (F.col("x12").cast("double") / F.lit(1e12)).alias("x")
    )
    lnr6 = F.round(
        F.round(F.log(F.col("row_total").cast("double") / F.col("n")), 6)
        * F.lit(1e6)
    ).cast("long")
    hrow = (
        pairs.join(F.broadcast(totals), "prev_type")
        .select(
            F.col("prev_type").alias("event_type"),
            "row_total",
            (F.col("n") * lnr6).cast("decimal(38,0)").alias("t6"),
        )
        .groupBy("event_type", "row_total")
        .agg(F.sum("t6").cast("decimal(38,0)").alias("s6"))
        .select(
            "event_type",
            (
                F.col("s6").cast("double") / F.col("row_total") / F.lit(1e6)
            ).alias("h_state"),
        )
    )
    ent = hrow.join(
        F.broadcast(x.withColumnRenamed("x", "pi")), "event_type"
    ).select(
        "event_type",
        "pi",
        "h_state",
        (F.col("pi") * F.col("h_state")).alias("term"),
    )
    terms_sorted = F.array_sort(
        F.collect_list(F.struct("event_type", "term")).over(Window.partitionBy())
    )
    return (
        ent.select(
            "event_type",
            F.col("pi").alias("stationary_p"),
            F.col("h_state").alias("h_state_nats"),
            F.aggregate(
                F.transform(terms_sorted, lambda s: s["term"]),
                F.lit(0.0),
                lambda acc, t: acc + t,
            ).alias("entropy_rate_nats"),
            F.round(F.log(F.lit(float(k))), 6).alias("max_entropy_nats"),
        )
        .transform(pin)
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# X-118: incremental maintenance of a JOIN view (delta algebra certificate)
# ---------------------------------------------------------------------------

_IVM_ORACLE = """
    WITH c0 AS (
        SELECT c_custkey AS ck, c_mktsegment AS seg,
               CASE WHEN c_custkey % 7 = 0 THEN 1 ELSE 0 END AS upd,
               'SEG_' || CAST(c_custkey % 3 AS VARCHAR) AS new_seg
        FROM customer
    ),
    o0 AS (
        SELECT o_orderkey AS ok, o_custkey AS ck,
               CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS cents,
               CASE WHEN o_orderkey % 10 = 0 THEN 1 ELSE 0 END AS is_new
        FROM orders
    ),
    v_old AS (
        SELECT c.seg, CAST(SUM(o.cents) AS BIGINT) AS v
        FROM c0 c JOIN o0 o USING (ck) WHERE o.is_new = 0
        GROUP BY c.seg
    ),
    v_full AS (
        SELECT CASE WHEN c.upd = 1 THEN c.new_seg ELSE c.seg END AS seg,
               CAST(SUM(o.cents) AS BIGINT) AS v
        FROM c0 c JOIN o0 o USING (ck)
        GROUP BY 1
    ),
    d_retract AS (
        SELECT c.seg, CAST(-SUM(o.cents) AS BIGINT) AS dv
        FROM c0 c JOIN o0 o USING (ck)
        WHERE c.upd = 1 AND o.is_new = 0
        GROUP BY c.seg
    ),
    d_insert_seg AS (
        SELECT c.new_seg AS seg, CAST(SUM(o.cents) AS BIGINT) AS dv
        FROM c0 c JOIN o0 o USING (ck)
        WHERE c.upd = 1 AND o.is_new = 0
        GROUP BY c.new_seg
    ),
    d_new_orders AS (
        SELECT CASE WHEN c.upd = 1 THEN c.new_seg ELSE c.seg END AS seg,
               CAST(SUM(o.cents) AS BIGINT) AS dv
        FROM c0 c JOIN o0 o USING (ck)
        WHERE o.is_new = 1
        GROUP BY 1
    ),
    delta AS (
        SELECT seg, CAST(SUM(dv) AS BIGINT) AS dv FROM (
            SELECT * FROM d_retract
            UNION ALL SELECT * FROM d_insert_seg
            UNION ALL SELECT * FROM d_new_orders
        ) GROUP BY seg
    ),
    incr AS (
        SELECT COALESCE(a.seg, b.seg) AS seg,
               COALESCE(a.v, 0) + COALESCE(b.dv, 0) AS v_incr,
               COALESCE(a.v, 0) AS v_before, COALESCE(b.dv, 0) AS dv
        FROM v_old a FULL JOIN delta b ON a.seg = b.seg
    )
    SELECT i.seg AS segment, i.v_before AS view_before_cents,
           i.dv AS delta_cents, CAST(i.v_incr AS BIGINT) AS view_incr_cents,
           COALESCE(f.v, 0) AS view_full_cents,
           CASE WHEN i.v_incr = COALESCE(f.v, 0) THEN 1 ELSE 0 END
               AS exact_match
    FROM incr i FULL JOIN v_full f ON i.seg = f.seg
    WHERE COALESCE(i.v_incr, 0) <> 0 OR COALESCE(f.v, 0) <> 0
    ORDER BY segment
"""


@query("q328_join_view_ivm", oracle=_IVM_ORACLE, tags=("X-118", "X-13", "J-01"))
def q328_join_view_ivm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental maintenance of a JOIN view: revenue-per-segment over
    customer⋈orders, maintained under a simultaneous batch of dimension
    UPDATES (every 7th customer changes segment) and fact INSERTS
    (every 10th order is the new batch) by the delta algebra —
    retract the updated customers' old-segment contributions, insert
    them under the new segment, add the new orders under current
    segments — and CERTIFIED against the full recompute with an
    exact_match column that must be all-1: the IVM correctness
    certificate (the join-view generalization of q191's incremental
    aggregate merge, and the write-side companion of q117's
    snapshot-diff CDC). At 100 TB this is the difference between
    touching the delta and rescanning the world.

    Determinism: every view value is an exact integer cent sum; the
    delta legs union exactly; equality is integer equality — the
    certificate cannot flake.

    Scale shape: the delta legs filter to the changed keys BEFORE
    joining (the deltas drive the join, never the full view); the full
    recompute exists here only as the certificate's other side.

    Reference parity: beyond-reference lakehouse capability."""
    c0 = load(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("ck"),
        F.col("c_mktsegment").alias("seg"),
        F.when(F.col("c_custkey") % 7 == 0, 1).otherwise(0).alias("upd"),
        F.concat(F.lit("SEG_"), (F.col("c_custkey") % 3).cast("string")).alias(
            "new_seg"
        ),
    )
    o0 = load(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("ck"),
        F.floor(F.col("o_totalprice") * 100 + 0.5).cast("long").alias("cents"),
        F.when(F.col("o_orderkey") % 10 == 0, 1).otherwise(0).alias("is_new"),
    )
    j = c0.join(o0, "ck").transform(stage)  # all five legs share one join
    v_old = (
        j.filter(F.col("is_new") == 0)
        .groupBy("seg")
        .agg(F.sum("cents").cast("long").alias("v"))
    )
    cur_seg = F.when(F.col("upd") == 1, F.col("new_seg")).otherwise(F.col("seg"))
    v_full = (
        j.groupBy(cur_seg.alias("seg"))
        .agg(F.sum("cents").cast("long").alias("v"))
    )
    d_retract = (
        j.filter((F.col("upd") == 1) & (F.col("is_new") == 0))
        .groupBy("seg")
        .agg((-F.sum("cents")).cast("long").alias("dv"))
    )
    d_insert = (
        j.filter((F.col("upd") == 1) & (F.col("is_new") == 0))
        .groupBy(F.col("new_seg").alias("seg"))
        .agg(F.sum("cents").cast("long").alias("dv"))
    )
    d_new = (
        j.filter(F.col("is_new") == 1)
        .groupBy(cur_seg.alias("seg"))
        .agg(F.sum("cents").cast("long").alias("dv"))
    )
    delta = (
        d_retract.unionByName(d_insert)
        .unionByName(d_new)
        .groupBy("seg")
        .agg(F.sum("dv").cast("long").alias("dv"))
    )
    incr = v_old.join(delta, "seg", "full_outer").select(
        "seg",
        F.coalesce("v", F.lit(0)).alias("v_before"),
        F.coalesce("dv", F.lit(0)).alias("dv"),
        (F.coalesce("v", F.lit(0)) + F.coalesce("dv", F.lit(0))).alias("v_incr"),
    )
    out = (
        incr.join(v_full.withColumnRenamed("v", "v_full"), "seg", "full_outer")
        .select(
            F.col("seg").alias("segment"),
            F.coalesce("v_before", F.lit(0)).cast("long").alias(
                "view_before_cents"
            ),
            F.coalesce("dv", F.lit(0)).cast("long").alias("delta_cents"),
            F.coalesce("v_incr", F.lit(0)).cast("long").alias("view_incr_cents"),
            F.coalesce("v_full", F.lit(0)).cast("long").alias("view_full_cents"),
            F.when(
                F.coalesce("v_incr", F.lit(0)) == F.coalesce("v_full", F.lit(0)),
                1,
            )
            .otherwise(0)
            .alias("exact_match"),
        )
        .filter(
            (F.col("view_incr_cents") != 0) | (F.col("view_full_cents") != 0)
        )
    )
    return out.transform(pin).orderBy("segment")


# ---------------------------------------------------------------------------
# X-126: absorbing-chain expected lifetime (fundamental-matrix solve)
# ---------------------------------------------------------------------------

_AB_STATES = ("click", "purchase", "signup", "view")  #: transient states
_AB_SINK = "error"  #: absorbing state


def _det4(entry) -> str:
    """24-term expansion of a 4x4 determinant; `entry(r, c)` names the
    (1-based) matrix entry expression."""
    from itertools import permutations

    terms = []
    for perm in permutations(range(1, 5)):
        inv = sum(
            1
            for a in range(4)
            for b in range(a + 1, 4)
            if perm[a] > perm[b]
        )
        sign = "-" if inv % 2 else "+"
        prod = " * ".join(entry(r + 1, perm[r]) for r in range(4))
        terms.append(f"{sign} {prod}")
    return " ".join(terms)


def _ab_solver_sql() -> tuple[str, list[str]]:
    """(det(M), [det(M with col i replaced by ones) for i in 1..4]) as SQL
    expressions over columns m11..m44."""
    base = _det4(lambda r, c: f"m{r}{c}")
    repl = [
        _det4(lambda r, c, i=i: "1" if c == i else f"m{r}{c}")
        for i in range(1, 5)
    ]
    return base, repl


def _ab_oracle() -> str:
    det, reps = _ab_solver_sql()
    st_case = " ".join(
        f"WHEN '{s}' THEN {i + 1}" for i, s in enumerate(_AB_STATES)
    )
    mcols = ", ".join(
        f"CAST(COALESCE(MAX(CASE WHEN i = {r} AND j = {c} THEN q6 END), 0)"
        f" * -1 + (CASE WHEN {r} = {c} THEN 1000000 ELSE 0 END) AS HUGEINT)"
        f" AS m{r}{c}"
        for r in range(1, 5)
        for c in range(1, 5)
    )
    tsel = ", ".join(
        f"CAST((CAST({reps[i]} AS HUGEINT) * 1000000000)"
        f" // ({det}) AS BIGINT) AS t{i + 1}"
        for i in range(4)
    )
    return f"""{_MK_SQL_PRELUDE},
    q AS (
        SELECT CASE p.prev_type {st_case} END AS i,
               CASE p.next_type {st_case} END AS j,
               CAST(p.p12 // 1000000 AS BIGINT) AS q6
        FROM p12 p
        WHERE p.prev_type <> '{_AB_SINK}' AND p.next_type <> '{_AB_SINK}'
    ),
    mm AS (SELECT {mcols} FROM q),
    tt AS (SELECT {tsel} FROM mm),
    err AS (
        SELECT CASE p.prev_type {st_case} END AS i,
               CAST(p.p12 // 1000000 AS BIGINT) AS pe6
        FROM p12 p
        WHERE p.prev_type <> '{_AB_SINK}' AND p.next_type = '{_AB_SINK}'
    )
    SELECT s.state,
           CAST((CASE s.i WHEN 1 THEN t.t1 WHEN 2 THEN t.t2
                 WHEN 3 THEN t.t3 ELSE t.t4 END) AS DOUBLE) / 1e3
               AS expected_steps_to_error,
           CAST(COALESCE(e.pe6, 0) AS DOUBLE) / 1e6 AS p_error_next_step
    FROM (VALUES {", ".join(f"({i + 1}, '{s}')" for i, s in enumerate(_AB_STATES))})
         s(i, state)
    CROSS JOIN tt t
    LEFT JOIN err e ON e.i = s.i
    ORDER BY s.state
    """


@query("q336_absorbing_chain_lifetime", oracle=_ab_oracle(), tags=("X-126", "X-13"))
def q336_absorbing_chain_lifetime(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Absorbing-chain expected lifetime: treating '{_AB_SINK}' as the
    absorbing failure state of the q118/q221 behavior chain, the
    expected number of steps each transient state survives before
    absorption — t = (I-Q)^-1 * 1, the fundamental-matrix readout that
    turns the one-step transition matrix into a LIFETIME number (the
    Markov-structural sibling of q179's empirical survival curve:
    that measures observed lifetimes; this derives them from the
    fitted dynamics, so the two disagreeing is itself a finding).

    Determinism: Q comes from q221's exact pico transitions floored to
    micro units; M = 1e6*I - Q is an exact integer matrix, and the
    solve is CRAMER's rule — det(M) and the four ones-column
    determinants expand as generated 24-term integer polynomials
    (numerically identical in both engines by construction), with the
    expected steps ONE integer floor-division each. The q322 adjugate
    discipline extended from quadratic forms to a linear SOLVE.

    Scale shape: one user-keyed window pass to the bounded transition
    matrix (the q221 plan); the 4x4 algebra is a single-row pivot.

    Reference parity: beyond-reference."""
    from pyspark.sql.window import Window as W

    ev = load(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        ev.select(
            F.lag("event_type").over(w).alias("prev_type"),
            F.col("event_type").alias("next_type"),
        )
        .filter(F.col("prev_type").isNotNull())
        .groupBy("prev_type", "next_type")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .transform(stage)
    )
    totals = pairs.groupBy("prev_type").agg(
        F.sum("n").cast("long").alias("row_total")
    )
    p12 = pairs.join(F.broadcast(totals), "prev_type").select(
        "prev_type",
        "next_type",
        F.expr(
            "CAST(CAST(n AS DECIMAL(26,0)) * 1000000000000 AS DECIMAL(38,0))"
            " div row_total"
        ).alias("p12"),
    ).transform(stage)  # the Q pivot + the error column share it
    st_case = " ".join(
        f"WHEN '{s}' THEN {i + 1}" for i, s in enumerate(_AB_STATES)
    )
    q = p12.filter(
        (F.col("prev_type") != _AB_SINK) & (F.col("next_type") != _AB_SINK)
    ).select(
        F.expr(f"CASE prev_type {st_case} END").alias("i"),
        F.expr(f"CASE next_type {st_case} END").alias("j"),
        F.expr("CAST(p12 div 1000000 AS BIGINT)").alias("q6"),
    )
    mm = q.agg(
        *[
            F.expr(
                f"CAST(COALESCE(MAX(CASE WHEN i = {r} AND j = {c}"
                f" THEN q6 END), 0) * -1"
                f" + (CASE WHEN {r} = {c} THEN 1000000 ELSE 0 END)"
                f" AS DECIMAL(38,0))"
            ).alias(f"m{r}{c}")
            for r in range(1, 5)
            for c in range(1, 5)
        ]
    )
    det, reps = _ab_solver_sql()
    tt = mm.select(
        *[
            F.expr(
                f"CAST((CAST({reps[i]} AS DECIMAL(38,0)) * 1000000000)"
                f" div ({det}) AS BIGINT)"
            ).alias(f"t{i + 1}")
            for i in range(4)
        ]
    )
    err = p12.filter(
        (F.col("prev_type") != _AB_SINK) & (F.col("next_type") == _AB_SINK)
    ).select(
        F.expr(f"CASE prev_type {st_case} END").alias("i"),
        F.expr("CAST(p12 div 1000000 AS BIGINT)").alias("pe6"),
    )
    states = load(spark, sf_dir, "events").sparkSession.createDataFrame(
        [(i + 1, s) for i, s in enumerate(_AB_STATES)], "i int, state string"
    )
    return (
        states.crossJoin(F.broadcast(tt))
        .join(F.broadcast(err), "i", "left")
        .na.fill({"pe6": 0})
        .select(
            "state",
            (
                F.expr(
                    "CASE i WHEN 1 THEN t1 WHEN 2 THEN t2"
                    " WHEN 3 THEN t3 ELSE t4 END"
                ).cast("double")
                / F.lit(1e3)
            ).alias("expected_steps_to_error"),
            (F.col("pe6").cast("double") / F.lit(1e6)).alias(
                "p_error_next_step"
            ),
        )
        .transform(pin)
        .orderBy("state")
    )


# ---------------------------------------------------------------------------
# X-36 extension: schema-drift column matcher (rename detection by content)
# ---------------------------------------------------------------------------

from .audit import _nibble_int  # noqa: E402  (48-bit md5 int, shared idiom)

#: canonical per-column value serialization — the SAME expression template
#: runs in both engines ({t}: string/VARCHAR, {us}: unix_micros/epoch_us).
_DRIFT_CANON = {
    "o_orderkey": "CAST(o_orderkey AS {t})",
    "o_custkey": "CAST(o_custkey AS {t})",
    "o_totalprice": "CAST(CAST(ROUND(o_totalprice * 100) AS BIGINT) AS {t})",
    "o_orderdate": "CAST({us}(o_orderdate) AS {t})",
    "o_orderpriority": "o_orderpriority",
}
#: the simulated v2 migration's renames (content identical, names new)
_DRIFT_RENAME = {
    "o_orderkey": "ok",
    "o_custkey": "customer_ref",
    "o_totalprice": "price_total",
    "o_orderdate": "created_at",
    "o_orderpriority": "priority_class",
}


@query(
    "q343_schema_drift_matcher",
    oracle=f"""
    WITH agg AS (
        SELECT
            {", ".join(
                f"CAST(COUNT({c}) AS BIGINT) AS n_{i}, "
                f"CAST(COUNT(DISTINCT {c}) AS BIGINT) AS nd_{i}, "
                f"CAST(SUM({_nibble_int('md5(' + _DRIFT_CANON[c].format(t='VARCHAR', us='epoch_us') + ')')}) AS DECIMAL(38,0)) AS ck_{i}"
                for i, c in enumerate(_DRIFT_CANON)
            )}
        FROM orders
    ),
    v1 AS (
        {" UNION ALL ".join(
            f"SELECT '{c}' AS v1_column, n_{i} AS n_values, nd_{i} AS n_distinct, ck_{i} AS cksum FROM agg"
            for i, c in enumerate(_DRIFT_CANON)
        )}
    ),
    v2 AS (
        {" UNION ALL ".join(
            f"SELECT '{_DRIFT_RENAME[c]}' AS v2_column, n_{i} AS n_values, nd_{i} AS n_distinct, ck_{i} AS cksum FROM agg"
            for i, c in enumerate(_DRIFT_CANON)
        )}
    )
    SELECT v1.v1_column, v2.v2_column, v1.n_values, v1.n_distinct
    FROM v1 JOIN v2 USING (n_values, n_distinct, cksum)
    ORDER BY v1.v1_column
    """,
    tags=("X-36", "X-11"),
)
def q343_schema_drift_matcher(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-drift column matcher: after a migration renames every column
    of a table (v2 simulated from v1 by the rename map — content
    identical, names new), re-derive the old->new column mapping purely
    from CONTENT fingerprints: per column (non-null count, distinct
    count, order-independent 48-bit md5 checksum — the q164 table
    checksum applied per COLUMN), then an equi-join of the two
    fingerprint sets. The schema-evolution step X-36's profile drift
    assumes away: q196 diffs profiles of columns with matching names;
    this recovers the name mapping when names DON'T match, which is what
    a lakehouse catalog needs before any column-level diff can run.

    Determinism: counts exact; checksum is a commutative decimal sum
    (each 48-bit term widened to decimal BEFORE accumulation — a long
    accumulator overflows past ~32k rows x 2^48) of
    md5-derived integers over engine-identical canonical strings
    (integers as-is, money as exact cents, timestamps as epoch micros).

    Scale shape: ONE scan computes all 15 statistics (the q113 wide-agg
    discipline — the three count-distincts ride one HashAggregate's
    Expand, never one scan per column); the 5-row fingerprint relations
    explode from single aggregate rows and join trivially. Checksums and
    counts are A-14-mergeable, so per-shard column fingerprints roll up
    without rescanning — matching two 100 TB snapshots costs two scans
    total. A fingerprint collision between different columns is
    possible in principle and surfaces as a fan-out row pair — an
    auditable artifact, not a silent mismatch.

    Reference parity: beyond-reference; extends X-36 (q196) and X-24's
    q164 checksum to the schema-evolution use case."""
    o = load(spark, sf_dir, "orders")
    cols = list(_DRIFT_CANON)
    aggs = []
    for i, c in enumerate(cols):
        canon = _DRIFT_CANON[c].format(t="string", us="unix_micros")
        aggs += [
            F.count(c).cast("long").alias(f"n_{i}"),
            F.countDistinct(c).cast("long").alias(f"nd_{i}"),
            F.sum(F.expr(_nibble_int(f"md5({canon})")).cast("decimal(20,0)"))
            .cast("decimal(38,0)")
            .alias(f"ck_{i}"),
        ]
    agg = o.agg(*aggs).transform(stage)  # both sides explode from this row
    stack_v1 = ", ".join(
        f"'{c}', n_{i}, nd_{i}, ck_{i}" for i, c in enumerate(cols)
    )
    stack_v2 = ", ".join(
        f"'{_DRIFT_RENAME[c]}', n_{i}, nd_{i}, ck_{i}" for i, c in enumerate(cols)
    )
    v1 = agg.select(
        F.expr(
            f"stack({len(cols)}, {stack_v1}) AS (v1_column, n_values, n_distinct, cksum)"
        )
    )
    v2 = agg.select(
        F.expr(
            f"stack({len(cols)}, {stack_v2}) AS (v2_column, n_values, n_distinct, cksum)"
        )
    )
    return (
        v1.join(v2, ["n_values", "n_distinct", "cksum"])
        .select("v1_column", "v2_column", "n_values", "n_distinct")
        .transform(pin)
        .orderBy("v1_column")
    )


# ---------------------------------------------------------------------------
# X-13 (cont.): SCD-2 validity-window integrity audit
# ---------------------------------------------------------------------------

_SCD2_AUDIT_ORACLE = """
    WITH versions AS (
        SELECT o_custkey AS k,
               ROW_NUMBER() OVER (PARTITION BY o_custkey
                                  ORDER BY o_orderdate, o_orderkey) AS rn,
               CAST(FLOOR(epoch(o_orderdate)) AS BIGINT) // 86400 AS vf,
               LEAD(CAST(FLOOR(epoch(o_orderdate)) AS BIGINT) // 86400) OVER (
                   PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
               ) AS vt
        FROM orders
    ),
    corrupted AS (
        SELECT k, rn, vf,
               CASE WHEN k % 13 = 0 AND vt IS NOT NULL THEN vt + 10
                    ELSE vt END AS vt
        FROM versions
        WHERE NOT (k % 17 = 0 AND rn = 2)
    ),
    seq AS (
        SELECT k, vf, vt,
               LEAD(vf) OVER (PARTITION BY k ORDER BY vf, rn) AS next_vf
        FROM corrupted
    ),
    viol AS (
        SELECT 'overlap' AS violation, k
        FROM seq WHERE next_vf IS NOT NULL AND vt > next_vf
        UNION ALL
        SELECT 'gap' AS violation, k
        FROM seq WHERE next_vf IS NOT NULL AND vt < next_vf
        UNION ALL
        SELECT 'multiple_current' AS violation, k
        FROM (SELECT k, COUNT(*) FILTER (WHERE vt IS NULL) AS c
              FROM seq GROUP BY k)
        WHERE c <> 1
    )
    SELECT violation,
           CAST(COUNT(DISTINCT k) AS BIGINT) AS n_entities,
           CAST(COUNT(*) AS BIGINT) AS n_rows
    FROM viol GROUP BY violation ORDER BY violation
"""


@query("q372_scd2_integrity", oracle=_SCD2_AUDIT_ORACLE, tags=("X-13", "X-24"))
def q372_scd2_integrity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD-2 validity-window integrity audit: given a versioned dimension
    (validity windows derived from each customer's order dates; defects
    INJECTED deterministically — every 13th key's window stretched 10
    days to create overlaps, every 17th key's second version deleted to
    create gaps, the q117 simulation discipline), report per violation
    class how many entities and version rows break the SCD-2 contract:
    overlapping windows (two versions both 'true' at one instant — the
    q149/q182 as-of joins silently return one of them), gaps (instants
    with NO version), and keys without exactly one open version. The
    dbt-utils-style structural test q106's builder must pass and every
    hand-maintained dimension eventually fails.

    Determinism: windows are exact epoch-day integers under the
    (date, orderkey) total order; the injected defects are pure key
    arithmetic; violations are exact comparisons.

    Scale shape: ONE key-partitioned window pass builds and sequences
    the versions (the same shuffle an SCD-2 MERGE already pays); all
    three violation tests are per-row comparisons against lead()
    neighbors — no self-join; rollup onto <= 3 rows.

    Reference parity: beyond-reference; completes the X-13 lakehouse kit
    (q106 build, q117 diff, q150 compaction, q182 as-of) with the
    structural QA gate."""
    from pyspark.sql import Window as W

    day = (
        F.unix_timestamp(F.col("o_orderdate")) / F.lit(86400)
    ).cast("long")
    wv = W.partitionBy("k").orderBy("vf_src", "o_orderkey")
    versions = (
        load(spark, sf_dir, "orders")
        .select(
            F.col("o_custkey").alias("k"),
            "o_orderkey",
            day.alias("vf_src"),
        )
        .select(
            "k",
            "o_orderkey",
            F.row_number().over(wv).alias("rn"),
            F.col("vf_src").alias("vf"),
            F.lead("vf_src").over(wv).alias("vt"),
        )
    )
    corrupted = versions.filter(
        ~((F.col("k") % 17 == 0) & (F.col("rn") == 2))
    ).select(
        "k",
        "rn",
        "vf",
        F.when(
            (F.col("k") % 13 == 0) & F.col("vt").isNotNull(), F.col("vt") + 10
        )
        .otherwise(F.col("vt"))
        .alias("vt"),
    )
    ws = W.partitionBy("k").orderBy("vf", "rn")
    seq = corrupted.select(
        "k", "vf", "vt", F.lead("vf").over(ws).alias("next_vf")
    ).transform(stage)  # all three violation legs share one build
    overlap = seq.filter(
        F.col("next_vf").isNotNull() & (F.col("vt") > F.col("next_vf"))
    ).select(F.lit("overlap").alias("violation"), "k")
    gap = seq.filter(
        F.col("next_vf").isNotNull() & (F.col("vt") < F.col("next_vf"))
    ).select(F.lit("gap").alias("violation"), "k")
    multi = (
        seq.groupBy("k")
        .agg(F.sum(F.col("vt").isNull().cast("int")).alias("c"))
        .filter(F.col("c") != 1)
        .select(F.lit("multiple_current").alias("violation"), "k")
    )
    viol = overlap.unionByName(gap).unionByName(multi)
    return (
        viol.groupBy("violation")
        .agg(
            F.countDistinct("k").cast("long").alias("n_entities"),
            F.count(F.lit(1)).cast("long").alias("n_rows"),
        )
        .transform(pin)
        .orderBy("violation")
    )
