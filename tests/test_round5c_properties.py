"""Mathematical invariants of the late-round-5 operator families
(X-86..X-110) — properties the oracle hash cannot state directly
(efficiency identities, optimality bounds, monotonicity), asserted on
sf0.001 outputs.
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


def test_shapley_efficiency_identity(q):
    """Shapley values are efficient: they sum to v(full) - v(null).
    The three per-channel micro floor-divisions each lose < 1 micro,
    so the identity holds within 3e-6."""
    df = q("q312_shapley_attribution")
    assert len(df) == 3
    total = float(df.shapley_lift.sum())
    target = float(df.full_minus_null.iloc[0])
    assert abs(total - target) <= 3e-6 + 1e-12, (total, target)


def test_pca_share_and_loadings_bounded(q):
    """The top component explains a positive share of at most 100% of
    the trace; loadings are L-inf normalized so the max |ppm| is
    exactly 1e6."""
    df = q("q296_pca_power_iteration")
    assert len(df) == 64
    share = float(df.explained_share.iloc[0])
    assert 0.0 < share <= 1.0, share
    assert float(df.eigenvalue_per_vector.iloc[0]) > 0
    assert int(df.loading_ppm.abs().max()) == 10**6
    assert (df.loading_ppm.abs() <= 10**6).all()


def test_median_ci_contains_median(q):
    """The order-statistic CI brackets the sample median by
    construction: X_(l) <= median <= X_(u) with l <= n/2 <= u."""
    df = q("q302_median_ci")
    row = df.iloc[0]
    assert row.ci_lo_cents <= row.median_cents <= row.ci_hi_cents
    assert row.lo_rank <= (row.n_users + 1) // 2 <= row.hi_rank


def test_newsvendor_critical_fractile_is_optimal(q):
    """The critical-fractile quantity maximizes empirical replay profit
    among all fixed quantities, so it cannot lose to the mean rule."""
    df = q("q308_newsvendor")
    row = df.iloc[0]
    assert row.profit_star >= row.profit_mean
    assert row.profit_gain == row.profit_star - row.profit_mean


def test_stump_split_never_hurts_purity(q):
    """The best split's purity score S/n is at least the parent's
    (pos^2+neg^2)/n^2 — a split can only concentrate classes."""
    df = q("q297_decision_stump")
    row = df.iloc[0]
    n = row.n_users
    pos = row.pos_left + row.pos_right
    parent = (pos * pos + (n - pos) * (n - pos)) / (n * n)
    assert row.purity_score >= parent - 1e-6, (row.purity_score, parent)
    assert row.n_left + row.n_right == n


def test_always_valid_p_monotone_nonincreasing(q):
    """q311's always-valid p-value is a running min: weakly decreasing
    in time and never above 1."""
    df = q("q311_msprt_monitor").sort_values("day")
    p = df.always_valid_p.tolist()
    assert all(x <= 1.0 + 1e-12 for x in p)
    assert all(a >= b - 1e-15 for a, b in zip(p, p[1:]))


def test_forecast_ensemble_bounded_by_component_sum(q):
    """Per day |y - median(m1,m2,m3)| <= max_i |y - m_i|, so the
    ensemble error sum cannot exceed the component error total."""
    df = q("q313_forecast_ensemble")
    row = df.iloc[0]
    assert row.n_test > 0
    assert (
        row.ae_ensemble
        <= row.ae_seasonal_naive + row.ae_trend + row.ae_dow_mean
    )


def test_data_valuation_full_model_delta_is_zero(q):
    """The m=-1 row IS the full model: its accuracy delta must be
    exactly zero, and every ablated model drops a positive group."""
    df = q("q314_data_valuation_loo")
    full = df[df.left_out_group == -1]
    assert len(full) == 1 and float(full.delta_vs_full.iloc[0]) == 0.0
    assert (df[df.left_out_group >= 0].n_train_dropped > 0).all()


def test_logistic_irls_outputs_are_probability_shaped(q):
    """q299: accuracy and mean predicted probability live in [0, 1];
    predicted positives cannot exceed the population."""
    df = q("q299_logistic_irls")
    row = df.iloc[0]
    assert 0.0 <= row.accuracy <= 1.0
    assert 0.0 < row.mean_p < 1.0
    assert 0 <= row.n_pred_pos <= row.n_users


def test_mixture_em_classes_partition_population(q):
    """q309: mixing weight in (0,1) and the low-activity class is a
    subset of the population."""
    df = q("q309_poisson_mixture_em")
    row = df.iloc[0]
    assert 0.0 < row.pi_lo < 1.0
    assert 0 <= row.n_class_lo <= row.n_users
    assert row.lambda_lo > 0 and row.lambda_hi > 0


def test_retention_rates_are_valid_probabilities(q):
    """q320: every pooled retention rate is a probability and the
    at-risk denominator is constant across offsets."""
    df = q("q320_retention_decay_fit")
    assert len(df) > 0
    assert ((df.retention > 0) & (df.retention <= 1)).all()
    assert df.at_risk.nunique() == 1


def test_dbscan_clusters_ordered_and_labeled_by_member(q):
    """q317: cluster sizes come out largest-first and each label is one
    of its member cells (min-label invariant)."""
    df = q("q317_grid_dbscan")
    sizes = df.n_points.tolist()
    assert sizes == sorted(sizes, reverse=True)
    assert (df.n_cells >= 1).all()


def test_uplift_targeting_order_is_by_uplift(q):
    """q318: target_order ranks segments by descending uplift."""
    df = q("q318_segment_uplift_qini").sort_values("target_order")
    u = df.uplift.tolist()
    assert u == sorted(u, reverse=True)
    assert 1 <= len(df) <= 3  # sf0.001 collapses to one activity segment


def test_causal_impact_r2_bounded(q):
    """q310: the pre-period fit R^2 cannot exceed 1."""
    df = q("q310_causal_impact")
    assert float(df.pre_r2.iloc[0]) <= 1.0 + 1e-12


def test_bellman_ford_partitions_all_nodes(q):
    """q315 and q278 run on the same graph, so their distance
    histograms must partition the same node population; weighted
    distances are nonnegative integers (weights >= 1)."""
    bfs = q("q278_bfs_distance")
    bf = q("q315_bellman_ford_sssp")
    assert int(bf.n_nodes.sum()) == int(bfs.n_nodes.sum())
    assert (bf.distance >= -1).all()
    reached = bf[bf.distance >= 0]
    assert (reached.distance == reached.distance.astype(int)).all()
