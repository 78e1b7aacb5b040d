"""Registry-wide unpartitioned-window lint (VERDICT r6 item 5).

A `Window` with an EMPTY partitionSpec executes on a single task — fine over
a relation already reduced to a bounded domain (a daily grid, a threshold
sweep, a vocabulary top-k, a 35-cell rollup), fatal over an unbounded one
(the fact table, per-document rows) at 100 TB. The discipline existed in
docstring prose; this test makes it mechanical:

- every registry query's OPTIMIZED logical plan is walked for Window nodes
  with an empty partitionSpec;
- queries that plan one must appear in the frozen allowlist below (each
  entry audited: the window's child is a bounded-domain relation, see the
  query's "Scale shape" docstring section);
- the allowlist is a RATCHET: a NEW query planning an unpartitioned window
  fails until it is consciously audited + added, and a stale entry (query
  gone, or window gone after a refactor) fails until removed — so the list
  can only shrink relative to the audited set, never silently grow.
"""

from __future__ import annotations

import pytest

from bigdata_streaming_absa_vehicle_spark.queries import all_queries

SF_DIR = "/root/testdata/sf0.001"

#: queries audited to run their empty-partition window over a BOUNDED child
#: (r6 judge audit of q321/q319-family + r7 ratchet freeze).  Buckets name
#: the bounded domain the window ranks/scans over.
ALLOWED_UNPARTITIONED_WINDOW = frozenset(
    {
        # cumulative scans over a bounded VALUE GRID (daily / threshold /
        # decile / quantile / period grids — cardinality fixed by the domain,
        # not the fact table)
        "q120_psi_drift",
        "q162_gains_table",
        "q166_exact_auc",
        "q167_peak_concurrency",
        "q179_survival_curve",
        "q185_out_of_order_profile",
        "q209_new_user_growth",
        "q234_concentration_curve",
        "q248_rank_churn",
        "q251_wasserstein_matrix",
        "q257_logrank_test",
        "q25w_moving_avg",
        "q264_rank_correlation",
        "q273_markov_attribution",
        "q281_var_cvar",
        "q286_isotonic_calibration",
        "q289_voptimal_segments",
        "q291_entropy_rate",
        "q292_max_drawdown",
        "q297_decision_stump",
        "q302_median_ci",
        "q303_boosted_stumps",
        "q304_seasonal_decomposition",
        "q305_quantile_normalization",
        "q308_newsvendor",
        "q311_msprt_monitor",
        "q313_forecast_ensemble",
        "q318_segment_uplift_qini",
        "q319_xmr_control_chart",
        "q321_cost_threshold",
        "q326_watermark_impact",
        "q333_systematic_pps_sample",
        "q338_ucb1_allocation",
        "q355_slo_burn_rate",
        "q364_topk_stability",
        "q369_calendar_adjusted_growth",
        "q393_null_ordering",
        "q394_id_continuity",
        "q400_mann_whitney",
        "q402_dft_periodogram",
        "q405_ams_f2_sketch",
        "q409_percentile_refinement",
        "q413_signed_rank_test",
        # ranks over a bounded CATEGORY / ENTITY domain (event types x dow
        # cells, brands, partition keys, join orders, segments)
        "q165_mutual_information",
        "q173_benford_audit",
        "q174_revenue_gini",
        "q201_token_budget_selection",
        "q205_pareto_frontier",
        "q206_abc_classification",
        "q235_degree_distribution",
        "q262_abc_xyz_matrix",
        "q270_heaps_law",
        "q274_zipf_law",
        "q275_modularity",
        "q301_rrf_hybrid_retrieval",
        "q306_spectral_token_embedding",
        "q307_t_closeness",
        "q329_partition_key_advisor",
        "q356_join_order_advisor",
        "q360_percent_of_parent",
        "q373_delta_contribution",
        "q401_bh_fdr",
        # vocabulary / token-id assignment over the frequency-truncated
        # vocab (two-level discipline documented in the query docstrings)
        "q81_vocabulary",
        "q82_token_ids",
        "q84_sequence_packing",
        # r13: dense token-id interning over the VOCABULARY relation
        # (dfreq groupBy output — bounded by distinct tokens, not the
        # corpus; the per-doc rank window this replaced ran over the full
        # exploded token relation)
        "q411b_ppjoin_full",
    }
)


def _empty_partition_windows(df) -> int:
    """Count Window nodes with an empty partitionSpec in the optimized
    logical plan (the logical node, not the physical WindowExec, so
    AQE/codegen variation cannot hide one). Implemented as ONE JVM call —
    TreeNode.toJSON serializes the whole tree, and the JSON is scanned in
    Python; the previous per-node py4j walk cost ~366 s across the 424
    registry plans (r13 durations), 6x the next-slowest test."""
    import json

    nodes = json.loads(df._jdf.queryExecution().optimizedPlan().toJSON())
    return sum(
        1
        for n in nodes
        if n.get("class", "").endswith(".Window") and not n.get("partitionSpec")
    )


def test_no_new_unpartitioned_windows_and_no_stale_allowlist(spark):
    spark.conf.set("spark.graft.pin_sorts", "false")  # see through checkpoints
    try:
        offenders = set()
        for name, spec in all_queries().items():
            if _empty_partition_windows(spec.fn(spark, SF_DIR)):
                offenders.add(name)
    finally:
        spark.conf.unset("spark.graft.pin_sorts")
    new = sorted(offenders - ALLOWED_UNPARTITIONED_WINDOW)
    stale = sorted(ALLOWED_UNPARTITIONED_WINDOW - offenders)
    assert not new, (
        "NEW unpartitioned Window over a possibly-unbounded relation — at "
        "100 TB this is a single-task scan.  Partition it, apply the "
        "two-level prefix-sum discipline, or audit the child as bounded and "
        f"add to the allowlist consciously: {new}"
    )
    assert not stale, (
        "stale allowlist entries (query removed or window refactored away) — "
        f"remove them so the ratchet only ever shrinks: {stale}"
    )


def test_allowlisted_queries_document_their_scale_shape():
    """Every allowlisted query must carry a docstring that argues its scale
    behavior (the bounded-domain justification lives there)."""
    specs = all_queries()
    markers = ("scale", "100 tb", "bounded")
    undocumented = [
        n
        for n in ALLOWED_UNPARTITIONED_WINDOW
        if n in specs and not any(m in specs[n].doc.lower() for m in markers)
    ]
    assert not undocumented, (
        "allowlisted unpartitioned-window queries without a scale-shape "
        f"docstring section: {sorted(undocumented)}"
    )


@pytest.mark.parametrize("name", ["q01_projection"])
def test_lint_walker_sees_windows(spark, name):
    """Sanity: the walker detects a deliberately-global window."""
    from pyspark.sql import Window, functions as F

    from bigdata_streaming_absa_vehicle_spark.tables import load

    df = load(spark, SF_DIR, "nation").withColumn(
        "rk", F.row_number().over(Window.orderBy("n_nationkey"))
    )
    assert _empty_partition_windows(df) == 1
