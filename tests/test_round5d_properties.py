"""Mathematical invariants of the X-111..X-126 operator families —
optimality bounds, monotonicity, and the two exact-certificate columns
(IVM match, consistent-hashing minimal disruption), on sf0.001.
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


def test_cost_threshold_beats_both_baselines(q):
    """The sweep includes act-on-all (lowest threshold) and never-act
    (sentinel row), so the optimum can beat neither baseline... by
    losing to it: total_cost <= min of both."""
    df = q("q321_cost_threshold")
    row = df.iloc[0]
    assert row.total_cost <= min(row.cost_do_nothing, row.cost_act_on_all)


def test_cv_errors_are_rates(q):
    """q323: per-fold CV error rates live in [0, 1] over nonempty held
    folds; all four folds report."""
    df = q("q323_cross_validated_stump")
    # a tiny fold can lack any valid split threshold and drop out
    assert 3 <= len(df) <= 4
    assert (df.n_test > 0).all()
    assert ((df.cv_error_stump >= 0) & (df.cv_error_stump <= 1)).all()
    assert ((df.cv_error_const >= 0) & (df.cv_error_const <= 1)).all()


def test_erlang_wait_probability_decreases_with_agents(q):
    """q325: adding agents can only reduce the wait probability."""
    df = q("q325_erlang_c_staffing").sort_values("agents")
    p = df.prob_wait.tolist()
    assert all(0.0 <= x <= 1.0 + 1e-9 for x in p)
    assert all(a >= b - 1e-9 for a, b in zip(p, p[1:]))


def test_watermark_drops_decrease_with_delay(q):
    """q326: a longer watermark delay can only drop fewer events and
    corrupt fewer groups."""
    df = q("q326_watermark_impact").sort_values("watermark_delay_s")
    assert df.n_dropped.is_monotonic_decreasing
    assert df.groups_affected.is_monotonic_decreasing
    assert (df.group_frac <= 1.0).all()


def test_ivm_certificate_is_all_green(q):
    """q328: the incremental view must equal the full recompute on
    every segment — the exact_match column IS the theorem."""
    df = q("q328_join_view_ivm")
    assert len(df) > 0
    assert (df.exact_match == 1).all()


def test_partition_advisor_rank_orders_cost(q):
    """q329: rank 1 is the cheapest candidate; skip fractions are
    valid."""
    df = q("q329_partition_key_advisor").sort_values("advisor_rank")
    costs = df.total_rows_read.tolist()
    assert costs == sorted(costs)
    assert (df.skip_frac <= 1.0).all() and (df.skip_frac >= 0.0).all()


def test_dedup_advisor_curve_is_monotone(q):
    """q330: a stricter threshold fires fewer pairs, removes fewer
    docs, saves fewer tokens."""
    df = q("q330_dedup_threshold_advisor").sort_values(
        "jaccard_micro_threshold"
    )
    assert df.n_pairs.is_monotonic_decreasing
    assert df.n_docs_removed.is_monotonic_decreasing
    assert df.tokens_saved.is_monotonic_decreasing


def test_embedding_separation_is_positive(q):
    """q331: distances are positive and the separation ratio is a
    positive micro integer."""
    df = q("q331_embedding_separation")
    assert (df.intra_mean_sq > 0).all()
    assert (df.inter_mean_sq > 0).all()
    assert (df.separation_micro > 0).all()


def test_neyman_allocation_respects_budget(q):
    """q332: floor-divided allocations cannot exceed the budget in
    total, and every allocation is nonnegative."""
    df = q("q332_neyman_allocation")
    assert (df.neyman_alloc >= 0).all()
    assert int(df.neyman_alloc.sum()) <= 10000
    assert int(df.proportional_alloc.sum()) <= 10000


def test_pps_draws_are_distinct_heavy_users(q):
    """q333: 20 draws, positive inclusion weights; systematic pps from
    a fixed order never repeats a user unless its size spans a stride."""
    df = q("q333_systematic_pps_sample")
    assert len(df) == 20
    assert (df.inclusion_ppm_per_draw > 0).all()


def test_consistent_hashing_minimal_disruption(q):
    """q334: the invariant column — no key moves between two surviving
    nodes — and the leaver owns nothing afterwards."""
    df = q("q334_consistent_hash_rebalance")
    assert (df.keys_stolen_wrongly == 0).all()
    assert 7 not in set(df.node)


def test_keyness_is_nonnegative_and_ranked(q):
    """q335: Dunning G^2 is nonnegative up to the 3-dp per-cell
    rounding; ranks are 1..2 per source."""
    df = q("q335_source_keyness")
    assert (df.g2 > -0.02).all()
    assert set(df["rank"]) <= {1, 2}


def test_absorbing_lifetime_at_least_one_step(q):
    """q336: every transient state survives at least one expected step
    and one-step absorption probabilities are valid."""
    df = q("q336_absorbing_chain_lifetime")
    assert len(df) == 4
    assert (df.expected_steps_to_error >= 1.0).all()
    assert ((df.p_error_next_step >= 0) & (df.p_error_next_step < 1)).all()


def test_mahalanobis_top5_descending(q):
    """q322: the readout is the top-5 by distance, descending."""
    df = q("q322_mahalanobis_anomaly")
    d = df.mahalanobis_sq.tolist()
    assert d == sorted(d, reverse=True)
    assert (df.mahalanobis_sq >= 0).all()
