"""Pipeline-diagnostics query surface (SURVEY.md §2K extension X-14): the
pre-flight checks a 100 TB pipeline runs BEFORE committing to an expensive
plan — join fan-out profiling (will this join explode?), population-stability
drift between time periods (has the feature distribution moved?), and BPE
merge-pair counting (the first tokenizer-training iteration).

Deterministic: integer counts everywhere; the few double expressions (skew
ratio, PSI terms) are IEEE-identical operand-for-operand in both engines,
rounded at 6 dp, and summed through exact decimal.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.ordering import pin, stage
from ..tables import load
from .registry import query

# ---------------------------------------------------------------------------
# X-14: join fan-out profile (explosion detector)
# ---------------------------------------------------------------------------


@query(
    "q119_join_fanout_profile",
    oracle="""
    WITH cl AS (SELECT o_orderkey AS k, COUNT(*) AS c FROM orders GROUP BY k),
    cr AS (SELECT l_orderkey AS k, COUNT(*) AS c FROM lineitem GROUP BY k),
    j AS (
        SELECT COALESCE(cl.c, 0) AS c_l, COALESCE(cr.c, 0) AS c_r
        FROM cl FULL OUTER JOIN cr USING (k)
    )
    SELECT COUNT(*) AS n_keys,
           COUNT(*) FILTER (c_l > 0 AND c_r > 0) AS n_keys_both,
           MAX(c_l) AS max_fanout_l,
           MAX(c_r) AS max_fanout_r,
           CAST(SUM(c_l * c_r) AS BIGINT) AS est_join_rows,
           ROUND(CAST(MAX(c_l * c_r) AS DOUBLE)
                 / (CAST(SUM(c_l * c_r) AS DOUBLE) / COUNT(*)), 6) AS hot_key_ratio
    FROM j
    """,
    tags=("X-14", "A-01"),
)
def q119_join_fanout_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join fan-out profile — the explosion detector run BEFORE a big join:
    per-key multiplicities on both sides, their maxima, the exact output
    cardinality the equi-join would produce (sum over keys of c_l*c_r), and
    how much of it the single hottest key contributes relative to the mean
    (the salting decision input, complementing q88's single-table heavy
    hitters).

    Scale shape: each side collapses to (key, count) via map-side combine
    BEFORE anything joins — the profile join moves two 16-byte relations,
    never fact payloads, and is itself co-partitioned on the key. At
    100 TB this costs two aggregates + one compact join versus discovering
    the explosion mid-shuffle."""
    cl = (
        load(spark, sf_dir, "orders")
        .groupBy(F.col("o_orderkey").alias("k"))
        .agg(F.count(F.lit(1)).alias("c_l"))
    )
    cr = (
        load(spark, sf_dir, "lineitem")
        .groupBy(F.col("l_orderkey").alias("k"))
        .agg(F.count(F.lit(1)).alias("c_r"))
    )
    j = cl.join(cr, "k", "full_outer").select(
        F.coalesce("c_l", F.lit(0)).alias("c_l"),
        F.coalesce("c_r", F.lit(0)).alias("c_r"),
    )
    prod = F.col("c_l") * F.col("c_r")
    return j.agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.count(F.when((F.col("c_l") > 0) & (F.col("c_r") > 0), 1)).alias("n_keys_both"),
        F.max("c_l").alias("max_fanout_l"),
        F.max("c_r").alias("max_fanout_r"),
        F.sum(prod).cast("bigint").alias("est_join_rows"),
        F.round(
            F.max(prod).cast("double") / (F.sum(prod).cast("double") / F.count(F.lit(1))),
            6,
        ).alias("hot_key_ratio"),
    )


# ---------------------------------------------------------------------------
# X-14: population stability index (distribution drift)
# ---------------------------------------------------------------------------

_PSI_SPLIT = "2024-01-15"  #: period A = before, period B = on/after
_PSI_BINS = 10
_PSI_WIDTH = 33  #: value in [0, 327.53] -> floor(value/33) in 0..9


@query(
    "q120_psi_drift",
    oracle=f"""
    WITH binned AS (
        SELECT CAST(FLOOR(value / {_PSI_WIDTH}) AS INT) AS bin,
               CASE WHEN ts < TIMESTAMP '{_PSI_SPLIT}' THEN 'a' ELSE 'b' END AS period
        FROM events
    ),
    counts AS (
        SELECT bin,
               COUNT(*) FILTER (period = 'a') AS n_a,
               COUNT(*) FILTER (period = 'b') AS n_b
        FROM binned GROUP BY bin
    ),
    tot AS (
        SELECT CAST(SUM(n_a) AS DOUBLE) AS t_a, CAST(SUM(n_b) AS DOUBLE) AS t_b,
               COUNT(*) AS k
        FROM counts
    ),
    terms AS (
        SELECT bin, n_a, n_b,
               ROUND(((n_a + 1) / (t_a + k) - (n_b + 1) / (t_b + k))
                     * ln(((n_a + 1) / (t_a + k)) / ((n_b + 1) / (t_b + k))), 6) AS psi_term
        FROM counts, tot
    )
    SELECT bin, n_a, n_b, psi_term,
           CAST(SUM(CAST(psi_term AS DECIMAL(28,6))) OVER () AS DOUBLE) AS psi_total
    FROM terms
    ORDER BY bin
    """,
    tags=("X-14", "A-06"),
)
def q120_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index between two time periods of the value
    distribution — the drift monitor that decides whether a feature (or a
    training corpus slice) still looks like what the model saw. Counts per
    fixed-width bin per period, Laplace-smoothed shares ((n+1)/(total+k),
    so empty bins never divide by zero), per-bin PSI terms at 6 dp, and
    the decimal-exact total replicated on every row (PSI < 0.1 ~ stable,
    > 0.25 ~ drifted).

    Scale shape: one scan, one map-side-combined aggregate onto ~10 bins
    with the period split folded into conditional counts; totals join back
    as a broadcast of a 1-row relation. The window-SUM for psi_total runs
    over 10 rows."""
    ev = load(spark, sf_dir, "events").select(
        F.floor(F.col("value") / _PSI_WIDTH).cast("int").alias("bin"),
        (F.col("ts") < _PSI_SPLIT).alias("is_a"),
    )
    counts = ev.groupBy("bin").agg(
        F.count(F.when(F.col("is_a"), 1)).alias("n_a"),
        F.count(F.when(~F.col("is_a"), 1)).alias("n_b"),
    )
    tot = counts.agg(
        F.sum("n_a").cast("double").alias("t_a"),
        F.sum("n_b").cast("double").alias("t_b"),
        F.count(F.lit(1)).alias("k"),
    )
    p_a = (F.col("n_a") + 1) / (F.col("t_a") + F.col("k"))
    p_b = (F.col("n_b") + 1) / (F.col("t_b") + F.col("k"))
    terms = counts.join(F.broadcast(tot)).select(
        "bin",
        "n_a",
        "n_b",
        F.round((p_a - p_b) * F.log(p_a / p_b), 6).alias("psi_term"),
    )
    from pyspark.sql.window import Window

    return (
        terms.withColumn(
            "psi_total",
            F.sum(F.col("psi_term").cast("decimal(28,6)"))
            .over(Window.partitionBy())
            .cast("double"),
        )
        .transform(pin)
        .orderBy("bin")
    )


# ---------------------------------------------------------------------------
# X-14: BPE merge-pair counting (tokenizer training step)
# ---------------------------------------------------------------------------


@query(
    "q121_bpe_pairs",
    oracle="""
    WITH tok AS (
        SELECT doc_id, string_split_regex(trim(text), '\\s+') AS tk FROM documents
    ),
    pairs AS (
        SELECT unnest(list_transform(range(1, len(tk)), i -> tk[i] || ' ' || tk[i+1])) AS pair
        FROM tok WHERE len(tk) >= 2
    )
    SELECT pair, COUNT(*) AS n
    FROM pairs GROUP BY pair
    ORDER BY n DESC, pair
    LIMIT 20
    """,
    tags=("X-14",),
)
def q121_bpe_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE merge-pair counting — the inner loop of tokenizer training: count
    every adjacent token pair across the corpus and surface the top
    candidates for the next merge (q81's vocabulary builds the alphabet;
    this ranks the merges). Ties break on the pair string so the top-20 is
    a total order.

    Scale shape: pair construction is a JVM higher-order transform over
    the token array (map-only, no posexplode self-join); the count is a
    map-side-combined aggregate on the pair string; ORDER BY+LIMIT plans
    TakeOrderedAndProject — no global sort of the pair space."""
    from ..operators.dedup import tokens

    docs = load(spark, sf_dir, "documents")
    tk = tokens("text")
    pairs = (
        docs.select(tk.alias("tk"))
        .filter(F.size("tk") >= 2)
        .select(
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.size("tk") - 1),
                    lambda i: F.concat_ws(
                        " ", F.element_at("tk", i), F.element_at("tk", i + 1)
                    ),
                )
            ).alias("pair")
        )
    )
    return (
        pairs.groupBy("pair")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("pair"))
        .limit(20)
    )


# ---------------------------------------------------------------------------
# X-14: exact two-sample Kolmogorov-Smirnov drift statistic
# ---------------------------------------------------------------------------

_KS_SPLIT = "2024-01-15"  #: period A = before, period B = from this ts on
_KS_BUCKET = 50.0  #: prefix-sum bucket width over the value domain


@query(
    "q148_ks_drift",
    oracle=f"""
    WITH labeled AS (
        SELECT value,
               CASE WHEN ts < TIMESTAMP '{_KS_SPLIT}' THEN 1 ELSE 0 END AS a
        FROM events
    ),
    rel AS (
        SELECT value, CAST(SUM(a) AS BIGINT) AS cnt_a,
               CAST(SUM(1 - a) AS BIGINT) AS cnt_b
        FROM labeled GROUP BY value
    ),
    tot AS (
        SELECT CAST(SUM(cnt_a) AS BIGINT) AS ta, CAST(SUM(cnt_b) AS BIGINT) AS tb
        FROM rel
    ),
    cum AS (
        SELECT value,
               CAST(SUM(cnt_a) OVER w AS BIGINT) AS ca,
               CAST(SUM(cnt_b) OVER w AS BIGINT) AS cb
        FROM rel
        WINDOW w AS (ORDER BY value ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    ),
    d AS (
        SELECT value,
               ABS(CAST(ca AS DOUBLE) / tot.ta - CAST(cb AS DOUBLE) / tot.tb) AS d
        FROM cum, tot
    ),
    mx AS (SELECT MAX(d) AS mx FROM d)
    SELECT (SELECT ta FROM tot) AS n_a,
           (SELECT tb FROM tot) AS n_b,
           ROUND(mx.mx, 6) AS ks_stat,
           (SELECT MIN(value) FROM d WHERE d.d = mx.mx) AS at_value
    FROM mx
    """,
    tags=("X-14", "W-03"),
)
def q148_ks_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT two-sample Kolmogorov-Smirnov statistic between two time
    periods of the value distribution: max over the value domain of
    |CDF_A(v) - CDF_B(v)|, plus the value where the gap peaks — the
    non-parametric companion to q120's binned PSI (KS needs no bin
    choice and catches shape changes PSI's 10 bins smooth away).

    Scale shape: the cumulative counts use the same TWO-LEVEL prefix sum
    as q84's sequence packing — a within-bucket running sum partitioned
    by floor(value/50) plus a bucket-offset pass over the BOUNDED bucket
    relation — so no single-partition window ever sees the full distinct
    value set. All CDF operands are exact integers; the division and max
    are IEEE-identical in both engines, so even the argmax value is
    hash-stable."""
    ev = load(spark, sf_dir, "events").select(
        "value", (F.col("ts") < _KS_SPLIT).cast("int").alias("a")
    )
    rel = ev.groupBy("value").agg(
        F.sum("a").alias("cnt_a"), F.sum(1 - F.col("a")).alias("cnt_b")
    )
    rel = rel.withColumn("bucket", F.floor(F.col("value") / _KS_BUCKET))
    wb = (
        Window.partitionBy("bucket")
        .orderBy("value")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    within = rel.select(
        "bucket",
        "value",
        F.sum("cnt_a").over(wb).alias("wa"),
        F.sum("cnt_b").over(wb).alias("wb_"),
    ).localCheckpoint(eager=False)  # feeds bucket totals AND the cum join
    btot = rel.groupBy("bucket").agg(
        F.sum("cnt_a").alias("ba"), F.sum("cnt_b").alias("bb")
    )
    # offset = totals of all PRECEDING buckets (bounded relation: one row
    # per bucket, so the ungrouped window is safe — same as q84/q120)
    offs = btot.select(
        "bucket",
        (F.sum("ba").over(Window.orderBy("bucket").rowsBetween(
            Window.unboundedPreceding, -1)) ).alias("oa"),
        (F.sum("bb").over(Window.orderBy("bucket").rowsBetween(
            Window.unboundedPreceding, -1)) ).alias("ob"),
    )
    tot = rel.agg(
        F.sum("cnt_a").alias("ta"), F.sum("cnt_b").alias("tb")
    )
    cum = (
        within.join(F.broadcast(offs), "bucket")
        .crossJoin(F.broadcast(tot))
        .select(
            "value",
            "ta",
            "tb",
            (F.coalesce("oa", F.lit(0)) + F.col("wa")).alias("ca"),
            (F.coalesce("ob", F.lit(0)) + F.col("wb_")).alias("cb"),
        )
    )
    d = cum.select(
        "value",
        "ta",
        "tb",
        F.abs(
            F.col("ca").cast("double") / F.col("ta")
            - F.col("cb").cast("double") / F.col("tb")
        ).alias("d"),
    ).localCheckpoint(eager=False)  # feeds the max AND the argmax filter
    mx = d.agg(F.max("d").alias("mx"))
    return (
        d.crossJoin(F.broadcast(mx))
        .filter(F.col("d") == F.col("mx"))
        .agg(
            F.min("ta").alias("n_a"),
            F.min("tb").alias("n_b"),
            F.round(F.min("mx"), 6).alias("ks_stat"),
            F.min("value").alias("at_value"),
        )
    )


_LATE_BUCKET = 5000  #: arrival-sequence bucket width for the prefix-max


@query(
    "q185_out_of_order_profile",
    oracle="""
    WITH a AS (
        SELECT event_id, epoch_us(ts) AS ts_us FROM events
    ),
    r AS (
        SELECT ts_us,
               MAX(ts_us) OVER (
                   ORDER BY event_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
               ) AS run_max
        FROM a
    ),
    lat AS (
        SELECT CASE WHEN run_max IS NULL OR run_max <= ts_us THEN 0
                    ELSE run_max - ts_us END AS late_us
        FROM r
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CASE WHEN late_us > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_late,
           ROUND(CAST(SUM(CASE WHEN late_us > 0 THEN 1 ELSE 0 END) AS DOUBLE)
                 / COUNT(*), 6) AS late_frac,
           ROUND(quantile_cont(late_us, 0.5) / 1000000.0, 6) AS p50_late_s,
           ROUND(quantile_cont(late_us, 0.95) / 1000000.0, 6) AS p95_late_s,
           ROUND(CAST(MAX(late_us) AS DOUBLE) / 1000000.0, 6) AS max_late_s
    FROM lat
    """,
    tags=("X-14", "T-09", "A-12"),
)
def q185_out_of_order_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Out-of-orderness profile of the event stream: treating event_id as
    the ARRIVAL sequence, an event's lateness is how far behind the
    running event-time high-water mark it arrived — exactly the quantity
    a streaming watermark (T-09) must exceed to avoid dropping data.
    One row out: event count, late count/fraction, and p50/p95/max
    lateness in seconds — read p95 off this profile to SIZE
    withWatermark() instead of guessing.

    Scale shape: the global running max never runs as one partition —
    it is the q84/q148/q167 TWO-LEVEL bucketed prefix pattern with MAX
    instead of SUM: within-bucket exclusive running max, bounded
    per-bucket maxima staged, exclusive bucket-offset max over that
    bounded relation, then greatest() of the two legs map-only.
    Lateness values are exact integer microseconds; the final readout is
    one ungrouped agg (A-12 exact percentiles, proven bit-equal to
    DuckDB quantile_cont by q75)."""
    a = load(spark, sf_dir, "events").select(
        "event_id",
        F.unix_micros("ts").alias("ts_us"),
        F.expr(f"event_id DIV {_LATE_BUCKET}").alias("bucket"),
    )
    w_in = (
        Window.partitionBy("bucket")
        .orderBy("event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    within = a.withColumn("w_max", F.max("ts_us").over(w_in)).transform(stage)
    btot = within.groupBy("bucket").agg(F.max("ts_us").alias("b_max"))
    w_off = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, -1)
    offs = btot.select(
        "bucket", F.max("b_max").over(w_off).alias("off_max")
    )
    run_max = F.greatest(
        F.coalesce(F.col("w_max"), F.lit(-1).cast("long")),
        F.coalesce(F.col("off_max"), F.lit(-1).cast("long")),
    )
    lat = within.join(F.broadcast(offs), "bucket").select(
        F.when(run_max <= F.col("ts_us"), F.lit(0).cast("long"))
        .otherwise(run_max - F.col("ts_us"))
        .alias("late_us")
    )
    return lat.agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.sum(F.when(F.col("late_us") > 0, 1).otherwise(0)).cast("long").alias("n_late"),
        F.round(
            F.sum(F.when(F.col("late_us") > 0, 1).otherwise(0)).cast("double")
            / F.count(F.lit(1)),
            6,
        ).alias("late_frac"),
        F.round(F.expr("percentile(late_us, 0.5)") / 1000000.0, 6).alias("p50_late_s"),
        F.round(F.expr("percentile(late_us, 0.95)") / 1000000.0, 6).alias("p95_late_s"),
        F.round(F.max("late_us").cast("double") / 1000000.0, 6).alias("max_late_s"),
    )


# ---------------------------------------------------------------------------
# X-55: exact 1-D Wasserstein (earth-mover) distance between distributions
# ---------------------------------------------------------------------------

_W1_ORACLE = """
    WITH vals AS (
        SELECT event_type AS et, CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS v,
               CAST(COUNT(*) AS BIGINT) AS c
        FROM events GROUP BY 1, 2
    ),
    tot AS (SELECT et, CAST(SUM(c) AS BIGINT) AS n FROM vals GROUP BY et),
    grid AS (
        SELECT v, LEAD(v) OVER (ORDER BY v) - v AS gap
        FROM (SELECT DISTINCT v FROM vals)
    ),
    cum AS (
        SELECT t.et, g.v, g.gap,
               CAST(SUM(COALESCE(c, 0)) OVER (PARTITION BY t.et ORDER BY g.v
                    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
        FROM grid g
        CROSS JOIN (SELECT DISTINCT et FROM vals) t
        LEFT JOIN vals ON vals.et = t.et AND vals.v = g.v
    ),
    pairs AS (
        SELECT a.et AS type_a, b.et AS type_b, ta.n AS n_a, tb.n AS n_b,
               CAST(SUM(ABS(a.cum * tb.n - b.cum * ta.n) * a.gap) AS BIGINT)
                   AS num
        FROM cum a
        JOIN cum b ON a.v = b.v AND a.et < b.et
        JOIN tot ta ON ta.et = a.et
        JOIN tot tb ON tb.et = b.et
        WHERE a.gap IS NOT NULL
        GROUP BY 1, 2, 3, 4
    )
    SELECT type_a, type_b, n_a, n_b,
           CAST(num AS DOUBLE) / (CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE) * 100.0)
               AS w1_dollars
    FROM pairs ORDER BY type_a, type_b
"""


@query("q251_wasserstein_matrix", oracle=_W1_ORACLE, tags=("X-55", "W-03"))
def q251_wasserstein_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 1-D Wasserstein (earth-mover) distance between every pair of
    event types' value distributions: W1 = integral |CDF_a - CDF_b| dv,
    computed on the merged support grid in cents.  The INTEGRAL drift
    metric completing the divergence toolbox — PSI (q120) needs bins and
    explodes on empty cells, KS (q148) sees only the worst point;
    W1 is bin-free, in the metric's own units (dollars moved per unit
    mass), and is the quantity distribution-shift monitors threshold on.

    Exactness: CDFs stay as integer counts; each grid term
    |cumA*NB - cumB*NA| * gap is exact int64 (common-denominator trick —
    no per-point division), so the pair sums are exact integers and the
    single final division runs on bit-identical operands in both engines
    (int64 headroom: NA*NB*range < 9e18 holds through ~1e6 rows/type at
    this value domain; the 100 TB deployment widens the sum to
    decimal(38,0), same dataflow).

    Scale shape: ONE fact shuffle — the (type, cents) frequency rollup,
    map-side combined, bounded by the value DOMAIN not the row count.
    The support grid (distinct cents), its gap window, the per-type CDF
    windows, and the T² pair join all run post-reduction on that bounded
    relation; type totals broadcast.  The gap window is unpartitioned by
    construction but spans only the bounded grid."""
    vals = (
        load(spark, sf_dir, "events")
        .select(
            F.col("event_type").alias("et"),
            F.floor(F.col("value") * 100 + 0.5).cast("long").alias("v"),
        )
        .groupBy("et", "v")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
        .transform(stage)  # grid, types, totals, and the fill join read it
    )
    tot = vals.groupBy("et").agg(F.sum("c").cast("long").alias("n"))
    grid = (
        vals.select("v")
        .distinct()
        .withColumn("gap", F.lead("v").over(Window.orderBy("v")) - F.col("v"))
    )
    types = vals.select("et").distinct()
    filled = (
        grid.crossJoin(F.broadcast(types))
        .join(vals, ["et", "v"], "left")
        .withColumn("c0", F.coalesce(F.col("c"), F.lit(0)))
    )
    cum = filled.withColumn(
        "cum",
        F.sum("c0")
        .over(
            Window.partitionBy("et").orderBy("v").rowsBetween(
                Window.unboundedPreceding, 0
            )
        )
        .cast("long"),
    ).select("et", "v", "gap", "cum")
    a = cum.select(
        F.col("et").alias("type_a"), "v", "gap", F.col("cum").alias("cum_a")
    ).filter(F.col("gap").isNotNull())
    b = cum.select(F.col("et").alias("type_b"), F.col("v").alias("vb"), F.col("cum").alias("cum_b"))
    ta = tot.select(F.col("et").alias("type_a"), F.col("n").alias("n_a"))
    tb = tot.select(F.col("et").alias("type_b"), F.col("n").alias("n_b"))
    pairs = (
        a.join(b, (a.v == b.vb) & (a.type_a < b.type_b))
        .join(F.broadcast(ta), "type_a")
        .join(F.broadcast(tb), "type_b")
        .groupBy("type_a", "type_b", "n_a", "n_b")
        .agg(
            F.sum(
                F.abs(F.col("cum_a") * F.col("n_b") - F.col("cum_b") * F.col("n_a"))
                * F.col("gap")
            )
            .cast("long")
            .alias("num")
        )
    )
    return (
        pairs.select(
            "type_a",
            "type_b",
            "n_a",
            "n_b",
            (
                F.col("num").cast("double")
                / (F.col("n_a").cast("double") * F.col("n_b").cast("double") * 100.0)
            ).alias("w1_dollars"),
        )
        .transform(pin)
        .orderBy("type_a", "type_b")
    )


# ---------------------------------------------------------------------------
# X-116: watermark impact audit (what each candidate delay would drop)
# ---------------------------------------------------------------------------

#: candidate withWatermark() delays, in seconds
_WM_CANDS = (0, 60, 300, 900, 3600)

_WM_ORACLE = f"""
    WITH a AS (
        SELECT event_id, user_id,
               CAST(FLOOR(epoch(ts)) AS BIGINT) // 3600 AS hr,
               epoch_us(ts) AS ts_us
        FROM events
    ),
    r AS (
        SELECT user_id, hr, ts_us,
               MAX(ts_us) OVER (
                   ORDER BY event_id ROWS BETWEEN UNBOUNDED PRECEDING
                   AND 1 PRECEDING) AS run_max
        FROM a
    ),
    lat AS (
        SELECT user_id, hr,
               CASE WHEN run_max IS NULL OR run_max <= ts_us THEN 0
                    ELSE run_max - ts_us END AS late_us
        FROM r
    ),
    tot AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_events,
               CAST(COUNT(DISTINCT (user_id, hr)) AS BIGINT) AS n_groups
        FROM lat
    ),
    per AS (
        SELECT c.d,
               CAST(COUNT(CASE WHEN l.late_us > CAST(c.d AS BIGINT) * 1000000
                          THEN 1 END) AS BIGINT) AS n_dropped,
               CAST(COUNT(DISTINCT CASE WHEN l.late_us > CAST(c.d AS BIGINT) * 1000000
                          THEN (l.user_id, l.hr) END) AS BIGINT)
                   AS groups_affected
        FROM (SELECT unnest([{", ".join(str(c) for c in _WM_CANDS)}]) AS d) c
        CROSS JOIN lat l
        GROUP BY c.d
    )
    SELECT p.d AS watermark_delay_s, p.n_dropped,
           CAST(p.n_dropped AS DOUBLE) / t.n_events AS drop_frac,
           p.groups_affected,
           CAST(p.groups_affected AS DOUBLE) / t.n_groups AS group_frac
    FROM per p, tot t
    ORDER BY watermark_delay_s
"""


@query("q326_watermark_impact", oracle=_WM_ORACLE, tags=("X-116", "T-09", "X-14"))
def q326_watermark_impact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermark impact audit: for each candidate withWatermark() delay,
    how many events a streaming job would DROP (arrived later than the
    delay behind the event-time high-water mark, q185's lateness) and
    how many (user, hour) window aggregates those drops would corrupt —
    the BUSINESS-impact curve that turns q185's lateness percentiles
    into the actual T-05/T-09 configuration decision: pick the smallest
    delay whose group-corruption share is acceptable.

    Determinism: lateness is the exact integer-microsecond q185
    statistic (two-level bucketed prefix MAX — never a single-partition
    window); per-candidate drop and affected-group counts are exact
    integers over a 5-way bounded fan-out; the two fractions are
    raw-double IEEE on exact counts.

    Scale shape: the lateness relation is computed once and staged; the
    candidate fan-out multiplies by |candidates|=5 only; affected-group
    counting distinct-reduces on (candidate, user, hour).

    Reference parity: beyond-reference; operationalizes T-09 the way
    the reference's fixed 10-second watermark
    (spark_kafka_consumer_dag.py) never could."""
    a = load(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        F.expr("CAST(FLOOR(unix_timestamp(ts)) AS BIGINT) div 3600").alias("hr"),
        F.unix_micros("ts").alias("ts_us"),
        F.expr(f"event_id DIV {_LATE_BUCKET}").alias("bucket"),
    )
    w_in = (
        Window.partitionBy("bucket")
        .orderBy("event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    within = a.withColumn("w_max", F.max("ts_us").over(w_in)).transform(stage)
    btot = within.groupBy("bucket").agg(F.max("ts_us").alias("b_max"))
    w_off = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, -1)
    offs = btot.select("bucket", F.max("b_max").over(w_off).alias("off_max"))
    run_max = F.greatest(
        F.coalesce(F.col("w_max"), F.lit(-1).cast("long")),
        F.coalesce(F.col("off_max"), F.lit(-1).cast("long")),
    )
    lat = (
        within.join(F.broadcast(offs), "bucket")
        .select(
            "user_id",
            "hr",
            F.when(run_max <= F.col("ts_us"), F.lit(0).cast("long"))
            .otherwise(run_max - F.col("ts_us"))
            .alias("late_us"),
        )
        .transform(stage)  # totals + the candidate fan-out share it
    )
    tot = lat.agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.countDistinct("user_id", "hr").cast("long").alias("n_groups"),
    )
    cands = spark.createDataFrame([(c,) for c in _WM_CANDS], "d long")
    per = (
        lat.crossJoin(F.broadcast(cands))
        .groupBy("d")
        .agg(
            F.sum(
                F.when(F.col("late_us") > F.col("d") * 1000000, 1).otherwise(0)
            )
            .cast("long")
            .alias("n_dropped"),
            F.countDistinct(
                F.when(
                    F.col("late_us") > F.col("d") * 1000000,
                    F.concat_ws(":", "user_id", "hr"),
                )
            )
            .cast("long")
            .alias("groups_affected"),
        )
    )
    return (
        per.crossJoin(F.broadcast(tot))
        .select(
            F.col("d").alias("watermark_delay_s"),
            "n_dropped",
            (F.col("n_dropped").cast("double") / F.col("n_events")).alias(
                "drop_frac"
            ),
            "groups_affected",
            (F.col("groups_affected").cast("double") / F.col("n_groups")).alias(
                "group_frac"
            ),
        )
        .transform(pin)
        .orderBy("watermark_delay_s")
    )


# ---------------------------------------------------------------------------
# X-14 (cont.): metric-delta contribution decomposition (root-cause read)
# ---------------------------------------------------------------------------

_DELTA_ORACLE = """
    WITH daily AS (
        SELECT event_type,
               CAST(FLOOR(epoch(date_trunc('day', ts))) AS BIGINT) // 86400 AS d,
               CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
                   AS cents
        FROM events GROUP BY 1, 2
    ),
    target AS (SELECT MAX(d) AS d1 FROM daily),
    sides AS (
        SELECT dd.event_type,
               CAST(SUM(CASE WHEN dd.d = t.d1 THEN dd.cents ELSE 0 END)
                    AS BIGINT) AS rev_now,
               CAST(SUM(CASE WHEN dd.d = t.d1 - 7 THEN dd.cents ELSE 0 END)
                    AS BIGINT) AS rev_base
        FROM daily dd CROSS JOIN target t
        WHERE dd.d = t.d1 OR dd.d = t.d1 - 7
        GROUP BY dd.event_type
    ),
    tot AS (
        SELECT CAST(SUM(rev_now) - SUM(rev_base) AS BIGINT) AS total_delta
        FROM sides
    )
    SELECT s.event_type, s.rev_now, s.rev_base,
           CAST(s.rev_now - s.rev_base AS BIGINT) AS delta_cents,
           CASE WHEN t.total_delta = 0 THEN NULL
                ELSE ROUND(CAST(s.rev_now - s.rev_base AS DOUBLE)
                           / t.total_delta, 6) END AS share_of_total_delta,
           CAST(ROW_NUMBER() OVER (
               ORDER BY ABS(s.rev_now - s.rev_base) DESC, s.event_type
           ) AS BIGINT) AS impact_rank
    FROM sides s CROSS JOIN tot t
    ORDER BY impact_rank
"""


@query("q373_delta_contribution", oracle=_DELTA_ORACLE, tags=("X-14", "A-01"))
def q373_delta_contribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metric-delta contribution decomposition (the Adtributor-style
    root-cause read): the newest day's revenue against the same weekday
    one week earlier, decomposed by segment — each event type's exact
    delta, its share of the total movement, and an impact rank. The
    first question after any q287/q184 anomaly fires is 'WHICH segment
    did it'; segment deltas sum to the total by construction, so the
    table is a complete account of the movement, not a list of
    suspects.

    Determinism: exact day keys and cents; shares divide exact integers
    once (NULL when the total delta is exactly zero — pinned in both
    engines); ranking ties break by segment name.

    Scale shape: ONE map-side-combined fact rollup onto the calendar-
    bounded (type, day) relation; the target day derives from the data
    (q223 no-wall-clock discipline) and broadcasts; the comparison,
    total, shares, and rank all run on <= |types| rows. At 100 TB with
    day-partitioning the two-day filter prunes to two partitions.

    Reference parity: beyond-reference; completes the diagnostics kit
    (q287 consensus flags -> q373 names the segment -> q310 sizes the
    causal impact)."""
    from pyspark.sql import Window as W

    daily = (
        load(spark, sf_dir, "events")
        .groupBy(
            "event_type",
            (F.unix_timestamp(F.date_trunc("day", F.col("ts"))) / F.lit(86400))
            .cast("long")
            .alias("d"),
        )
        .agg(
            F.sum(F.floor(F.col("value") * 100 + 0.5).cast("long"))
            .cast("long")
            .alias("cents")
        )
        .transform(stage)  # target leg + sides leg share one build
    )
    target = daily.agg(F.max("d").alias("d1"))
    sides = (
        daily.join(F.broadcast(target))
        .filter((F.col("d") == F.col("d1")) | (F.col("d") == F.col("d1") - 7))
        .groupBy("event_type")
        .agg(
            F.sum(F.when(F.col("d") == F.col("d1"), F.col("cents")).otherwise(0))
            .cast("long")
            .alias("rev_now"),
            F.sum(
                F.when(F.col("d") == F.col("d1") - 7, F.col("cents")).otherwise(0)
            )
            .cast("long")
            .alias("rev_base"),
        )
    )
    w_all = W.partitionBy()  # bounded: <= |types| rows
    delta = F.col("rev_now") - F.col("rev_base")
    total_delta = F.sum(delta).over(w_all)
    return (
        sides.select(
            "event_type",
            "rev_now",
            "rev_base",
            delta.cast("long").alias("delta_cents"),
            F.when(total_delta == 0, F.lit(None).cast("double"))
            .otherwise(F.round(delta.cast("double") / total_delta, 6))
            .alias("share_of_total_delta"),
            F.row_number()
            .over(w_all.orderBy(F.abs(delta).desc(), "event_type"))
            .cast("long")
            .alias("impact_rank"),
        )
        .transform(pin)
        .orderBy("impact_rank")
    )
