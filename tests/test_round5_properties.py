"""Structural invariants of the round-5 operators (X-18/X-19/X-20/A-16,
corpus diagnostics, mixing plan) — properties the oracle hash can't state
directly, asserted on sf0.001 outputs.
"""

from __future__ import annotations

import pytest

from bigdata_streaming_absa_vehicle_spark.queries import all_queries

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def q(spark):
    def run(name):
        return all_queries()[name].fn(spark, SF_DIR).toPandas()

    return run


def test_triangle_corner_sum_divisible_by_three(q):
    """Each triangle contributes exactly one count to each of its three
    corners, so the corner total is 3x the number of distinct triangles."""
    df = q("q136_triangle_count")
    assert (df.n_triangles >= 1).all()
    assert int(df.n_triangles.sum()) % 3 == 0


def test_fuzzy_pairs_are_canonical_and_banded(q):
    """Pairs come out canonicalized (w1 < w2), within the distance
    threshold, and respect the length-band necessary condition the
    candidate join relies on."""
    df = q("q137_fuzzy_word_pairs")
    assert (df.w1 < df.w2).all()
    assert df.dist.between(1, 2).all()
    assert (abs(df.w1.str.len() - df.w2.str.len()) <= 2).all()
    assert not df.duplicated(["w1", "w2"]).any()


def test_bloom_counts_reconcile(q, spark):
    """candidates = true + false-positive, and the bloom NEVER misses: the
    true-match count equals the exact semi-join count computed without any
    filter (zero false negatives is the Bloom guarantee)."""
    from pyspark.sql import functions as F

    from bigdata_streaming_absa_vehicle_spark.tables import load

    row = q("q138_bloom_prefilter").iloc[0]
    assert row.n_candidates == row.n_true + row.n_false_positive
    dim = (
        load(spark, SF_DIR, "supplier")
        .filter(F.col("s_nationkey") == 7)
        .select("s_suppkey")
    )
    exact = (
        load(spark, SF_DIR, "lineitem")
        .join(dim, F.col("l_suppkey") == F.col("s_suppkey"), "left_semi")
        .count()
    )
    assert row.n_true == exact


def test_containment_bounds_and_probe_subset(q):
    df = q("q146_containment_pairs")
    if len(df):
        assert (df.doc_sub % 10 == 0).all()
        assert df.containment.between(0.6, 1.0).all()
        assert (df.n_common <= df.n_sub).all()


def test_mixing_plan_shares_normalize(q):
    df = q("q147_mixing_plan")
    assert abs(df.token_share.sum() - 1.0) < 1e-4
    assert abs(df.target_share.sum() - 1.0) < 1e-4
    assert (df.epochs > 0).all()
    # sqrt smoothing compresses: small sources gain share, large ones lose
    small, big = df.nsmallest(3, "n_tokens"), df.nlargest(3, "n_tokens")
    assert (small.target_share >= small.token_share).all()
    assert (big.target_share <= big.token_share).all()


def test_ewma_first_observation_equals_value(q):
    """At each user's first day there are no lags, so the renormalized
    EWMA must equal the value itself."""
    df = q("q141_ewma_smoothing").sort_values(["user_id", "day"])
    first = df.groupby("user_id").first()
    assert (abs(first.ewma - first.x) < 1e-6).all()


def test_mad_outliers_bounded(q):
    df = q("q142_mad_outliers")
    assert (df.n_outliers <= df.n_rows).all()
    assert (df["mad"] >= 0).all()


def test_centroid_cosine_full_matrix(q):
    """One row per unordered label pair, cosines in [-1, 1]."""
    df = q("q145_centroid_cosine_matrix")
    labels = set(df.label_a) | set(df.label_b)
    assert len(df) == len(labels) * (len(labels) - 1) // 2
    assert df.cosine.between(-1.0, 1.0).all()


def test_hdr_sketch_error_bound(q, spark, duck):
    """The q200 HDR sketch's quantile estimates must sit within the
    declared 1% relative error below the exact quantile: the reported
    bucket lower bound lb satisfies lb <= exact_q and the true value of
    every sample in the bucket is < lb * (1 + 10^(1-digits)) ... i.e.
    exact_q < lb + bucket width.  Checked against DuckDB's discrete
    quantile (the rank-based definition the sketch targets)."""
    from conftest import duck_sql

    df = q("q200_hdr_quantiles").set_index("event_type")
    exact = duck_sql(
        duck,
        """
        SELECT event_type,
               quantile_disc(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT), 0.50) AS p50,
               quantile_disc(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT), 0.90) AS p90,
               quantile_disc(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT), 0.99) AS p99
        FROM events GROUP BY event_type
        """,
        SF_DIR,
    ).set_index("event_type")
    for et in df.index:
        for p in (50, 90, 99):
            est_cents = round(df.loc[et, f"p{p}_est"] * 100)
            true_cents = exact.loc[et, f"p{p}"]
            assert est_cents <= true_cents, (et, p, est_cents, true_cents)
            assert true_cents < est_cents * 1.01 + 1, (et, p, est_cents, true_cents)


def test_hdr_sketch_is_mergeable(q, spark):
    """Half-corpus sketches must merge to the whole-corpus sketch: the
    histogram is a pure integer-vector sum, so quantiles extracted from
    summed shard histograms equal the single-pass result (A-14 applied
    to quantiles — the property exact percentiles lack)."""
    import pandas as pd
    from pyspark.sql import functions as F

    from bigdata_streaming_absa_vehicle_spark.queries.profiling import (
        _HDR_DIGITS,
        _HDR_PS,
    )
    from bigdata_streaming_absa_vehicle_spark.tables import load as load_t

    # re-derive the bucket histogram per half, sum the halves, extract
    # quantiles in pandas, and compare with the registered single-pass query
    ev = load_t(spark, SF_DIR, "events").select(
        "event_type",
        "event_id",
        (F.col("value").cast("decimal(18,2)") * 100).cast("long").alias("c"),
    )
    u = ev.withColumn(
        "unit",
        F.pow(
            F.lit(10.0),
            F.greatest(F.length(F.col("c").cast("string")) - _HDR_DIGITS, F.lit(0)).cast(
                "double"
            ),
        ).cast("long"),
    ).select("event_type", "event_id", F.expr("(c DIV unit) * unit").alias("lb"))
    halves = []
    for parity in (0, 1):
        h = (
            u.where(F.col("event_id") % 2 == parity)
            .groupBy("event_type", "lb")
            .count()
            .toPandas()
        )
        halves.append(h)
    merged = (
        pd.concat(halves).groupby(["event_type", "lb"], as_index=False)["count"].sum()
    )
    got = q("q200_hdr_quantiles").set_index("event_type")
    for et, grp in merged.groupby("event_type"):
        grp = grp.sort_values("lb")
        n = grp["count"].sum()
        cum = grp["count"].cumsum()
        for p in _HDR_PS:
            target = (n * p + 99) // 100
            est_lb = int(grp.loc[cum >= target, "lb"].iloc[0])
            assert round(got.loc[et, f"p{p}_est"] * 100) == est_lb, (et, p)


def test_pareto_frontier_is_an_antichain(q):
    """q205: along the frontier, strictly increasing price must buy
    strictly increasing size (otherwise the cheaper point would dominate)
    — and no two frontier rows dominate each other."""
    df = q("q205_pareto_frontier").sort_values(["price", "p_partkey"])
    dedup = df.groupby("price")["p_size"].max().reset_index()
    sizes = dedup.sort_values("price")["p_size"].tolist()
    assert sizes == sorted(sizes), sizes
    assert len(set(sizes)) == len(sizes), sizes
    # equal-price frontier rows all carry the same (max) size
    assert (df.groupby("price")["p_size"].nunique() == 1).all()


def test_rfm_scores_partition_all_customers(q, duck):
    """q211: every score is in 1..5 and the grid's customer counts sum to
    the full customer base (each customer lands in exactly one cell)."""
    from conftest import duck_sql

    df = q("q211_rfm_segmentation")
    for c in ("r_score", "f_score", "m_score"):
        assert df[c].between(1, 5).all(), c
    total = duck_sql(
        duck, "SELECT COUNT(DISTINCT o_custkey) AS n FROM orders", SF_DIR
    ).n[0]
    assert df.n_customers.sum() == total


def test_weighted_reservoir_is_k_per_source(q):
    """q213: at most k=5 rows per source, ranks are 1..k contiguous, and
    every sampled doc carries a positive weight."""
    df = q("q213_weighted_reservoir")
    for src, grp in df.groupby("source"):
        assert list(grp.sort_values("rk").rk) == list(range(1, len(grp) + 1)), src
        assert len(grp) <= 5
    assert (df.tokens >= 1).all()


def test_radius_join_pairs_canonical_within_radius(q):
    """q216: reported pairs are canonical (ka < kb) and within R."""
    df = q("q216_radius_join")
    assert (df.ka < df.kb).all()
    assert (df.d2 <= 50_000 * 50_000).all()
    assert df.d2.is_monotonic_increasing


def test_constraint_suite_reports_every_rule(q):
    """q220: one row per declared rule, all scanning the same row count,
    and passed <=> zero violations."""
    from bigdata_streaming_absa_vehicle_spark.queries.audit import _CONSTRAINTS

    df = q("q220_constraint_suite")
    assert len(df) == len(_CONSTRAINTS)
    assert df.n_rows.nunique() == 1
    assert ((df.n_violations == 0) == df.passed).all()


def test_attribution_models_conserve_credit(q):
    """q171 (linear) and q212 (time-decay) split each purchase's one unit
    of credit across the same touchpoint pairing, so their per-channel
    credited_purchases must sum to the same total (the number of
    attributed purchases), up to the 9-dp per-term rounding."""
    lin = q("q171_linear_attribution").credited_purchases.sum()
    dec = q("q212_time_decay_attribution").credited_purchases.sum()
    assert abs(lin - dec) < 1e-3, (lin, dec)


def test_bitmap_retention_equals_set_intersection(q, duck):
    """q227: the bitmap AND+popcount must equal the naive distinct-set
    intersection for every consecutive day pair — the bitmap is exact,
    not a sketch."""
    from conftest import duck_sql

    df = q("q227_bitmap_retention").set_index("day")
    naive = duck_sql(
        duck,
        """
        WITH d AS (SELECT DISTINCT user_id, date_trunc('day', ts) AS day FROM events)
        SELECT a.day AS day, CAST(COUNT(*) AS BIGINT) AS retained
        FROM d a JOIN d b
          ON a.user_id = b.user_id AND b.day = a.day + INTERVAL 1 DAY
        GROUP BY a.day ORDER BY a.day
        """,
        SF_DIR,
    ).set_index("day")
    assert len(df) == len(naive)
    for day in df.index:
        assert df.loc[day, "retained"] == naive.loc[day, "retained"], day


def test_isotonic_fit_is_monotone_and_mean_preserving(spark):
    """The q286 minimax fit must be non-decreasing in the bin index and
    preserve the outcome total (PAV's defining invariants)."""
    from bigdata_streaming_absa_vehicle_spark.queries import all_queries

    q = all_queries()["q286_isotonic_calibration"]
    rows = q.fn(spark, "/root/testdata/sf0.001").collect()
    rates = [r["isotonic_rate"] for r in rows]
    assert rates == sorted(rates), rates
    fit_total = sum(r["isotonic_rate"] * r["n"] for r in rows)
    raw_total = sum(r["raw_rate"] * r["n"] for r in rows)
    assert abs(fit_total - raw_total) / raw_total < 1e-5, (fit_total, raw_total)
