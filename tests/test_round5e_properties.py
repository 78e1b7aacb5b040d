"""Mathematical invariants of the q337-q355 operator batch (TPC-H Q17,
bandit/KMV/sequence mining, training-set ops, lakehouse/audit advisors,
SRE alerting), on sf0.001 plus targeted plan assertions of their
documented scale shapes.
"""

from __future__ import annotations

import contextlib
import io

import pytest

from bigdata_streaming_absa_vehicle_spark.queries import all_queries

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def q(spark):
    def run(name):
        return all_queries()[name].fn(spark, SF_DIR).toPandas()

    return run


def _plan(spark, name, mode="formatted"):
    spark.conf.set("spark.graft.pin_sorts", "false")
    try:
        df = all_queries()[name].fn(spark, SF_DIR)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain(mode)
        return buf.getvalue()
    finally:
        spark.conf.unset("spark.graft.pin_sorts")


# ---------------------------------------------------------------------------
# value invariants
# ---------------------------------------------------------------------------


def test_q337_q17_single_positive_row(q):
    df = q("q337_tpch_q17_small_quantity")
    assert len(df) == 1
    assert df.iloc[0].n_small > 0 and df.iloc[0].avg_yearly > 0


def test_q338_ucb_dominates_mean_and_one_arm_chosen(q):
    df = q("q338_ucb1_allocation")
    # sf0.001 has few enough users that an arm can be empty; 4 at sf>=0.01
    assert 2 <= len(df) <= 4
    assert (df.ucb_score >= df.mean_rate).all()
    assert df.chosen.sum() == 1
    # the chosen arm carries the maximal ucb score
    assert df[df.chosen == 1].ucb_score.iloc[0] == df.ucb_score.max()


def test_q339_kmv_exact_when_small_and_positive(q):
    df = q("q339_kmv_distinct_sketch")
    assert (df.n_kmv > 0).all()
    # sketch is exact by construction below k=32 values
    small = df[df.n_exact < 32]
    assert (small.n_kmv == small.n_exact).all()
    assert (df.abs_err == (df.n_kmv - df.n_exact).abs()).all()


def test_q340_support_bounded_by_users(q, spark):
    df = q("q340_sequence_pair_support")
    from bigdata_streaming_absa_vehicle_spark.tables import load

    n_users = load(spark, SF_DIR, "events").select("user_id").distinct().count()
    assert (df.support <= n_users).all()
    assert (df.share > 0).all() and (df.share <= 1).all()
    # directed pairs over |types|=5: at most 20
    assert len(df) <= 20


def test_q341_hard_negatives_never_share_the_label(q):
    df = q("q341_hard_negative_mining")
    assert (df.neg_label != df.probe_label).all()
    # per probe: exactly k=5, cosine non-increasing in rank
    for _, g in df.groupby("probe_id"):
        assert list(g["rank"]) == [1, 2, 3, 4, 5]
        assert (g.sort_values("rank").cosine.diff().dropna() <= 1e-9).all()


def test_q342_paired_t_consistent_with_sums(q):
    df = q("q342_paired_ttest")
    row = df.iloc[0]
    assert row.n_pairs > 0
    assert abs(row.mean_diff_cents - row.sum_diff_cents / row.n_pairs) < 1e-3


def test_q343_recovers_the_rename_map(q):
    from bigdata_streaming_absa_vehicle_spark.queries.lakehouse import (
        _DRIFT_RENAME,
    )

    df = q("q343_schema_drift_matcher")
    got = dict(zip(df.v1_column, df.v2_column))
    assert got == _DRIFT_RENAME


def test_q344_every_class_cut_to_the_minority_count(q):
    df = q("q344_class_downsample")
    assert (df.n_after == df.n_before.min()).all()
    assert (df.n_after <= df.n_before).all()


def test_q345_exports_only_disagreements_with_positive_margin(q):
    df = q("q345_label_noise_candidates")
    assert (df.predicted != df.label).all()
    assert (df.margin >= 0).all()
    assert (df.votes_pred >= df.votes_own).all()


def test_q346_srm_segments_cover_all_types(q):
    df = q("q346_srm_by_segment")
    assert len(df) == 5
    assert (df.srm_chi2 >= 0).all()
    assert ((df.share_a > 0) & (df.share_a < 1)).all()


def test_q347_window_never_exceeds_14_days(q):
    df = q("q347_rolling_trend")
    assert (df.n_days >= 1).all() and (df.n_days <= 14).all()
    # slope defined whenever the window holds >= 2 distinct days
    assert df[df.n_days >= 2].slope_cents_per_day.notna().all()


def test_q348_advice_is_a_valid_verdict(q):
    df = q("q348_encoding_advisor")
    assert len(df) == 3
    assert set(df.advice) <= {"DICTIONARY", "RLE", "PLAIN"}
    assert (df.avg_run_len >= 1).all()
    assert (df.n_distinct <= df.n_rows).all()
    # the verdict matches the published exact-integer thresholds
    for r in df.itertuples():
        if 100 * r.n_distinct <= r.n_rows:
            assert r.advice == "DICTIONARY"
        elif 2 * r.n_runs <= r.n_rows:
            assert r.advice == "RLE"
        else:
            assert r.advice == "PLAIN"


def test_q349_ttl_policy_and_shares(q):
    from bigdata_streaming_absa_vehicle_spark.queries.audit import _TTL_DAYS

    df = q("q349_ttl_compliance")
    assert dict(zip(df.event_type, df.ttl_days)) == _TTL_DAYS
    assert ((df.expired_share >= 0) & (df.expired_share <= 1)).all()
    assert (df.n_expired <= df.n_rows).all()


def test_q350_bridge_is_exactly_additive(q):
    df = q("q350_revenue_bridge")
    assert len(df) > 0
    resid = (df.volume_effect_cents + df.price_effect_cents - df.delta_cents).abs()
    assert (resid < 1e-2).all()  # additive up to the two 6-dp roundings


def test_q351_pq_assignment_partitions_the_corpus(q, spark):
    from bigdata_streaming_absa_vehicle_spark.tables import load

    df = q("q351_product_quantization")
    n_vec = load(spark, SF_DIR, "embeddings").count()
    per_sub = df.groupby("sub").n_assigned.sum()
    assert (per_sub == n_vec).all()
    assert df.code_id.between(0, 3).all()
    assert (df.mse_unit >= 0).all()


def test_q352_others_reconciles_to_the_full_rollup(q, spark):
    from pyspark.sql import functions as F
    from bigdata_streaming_absa_vehicle_spark.tables import load

    df = q("q352_topk_with_others")
    li = load(spark, SF_DIR, "lineitem").select(
        "l_suppkey", F.round(F.col("l_extendedprice") * 100).cast("long").alias("c")
    )
    s = load(spark, SF_DIR, "supplier").select("s_suppkey", "s_nationkey")
    n = load(spark, SF_DIR, "nation").select("n_nationkey", "n_name")
    totals = (
        li.join(s, li.l_suppkey == s.s_suppkey)
        .join(n, F.col("s_nationkey") == n.n_nationkey)
        .groupBy("n_name")
        .agg(F.sum("c").alias("t"))
        .toPandas()
        .set_index("n_name")
        .t
    )
    got = df.groupby("nation").rev_cents.sum()
    for nation, total in totals.items():
        assert got[nation] == total, nation


def test_q353_audit_verdicts_match_the_data(q):
    df = q("q353_uniqueness_audit")
    assert len(df) == 4
    assert (df.n_excess_rows == df.n_rows - df.n_keys).all()
    by_key = dict(zip(df.key_name, df.is_unique))
    assert by_key["event_id"] == 1
    assert by_key["o_orderkey"] == 1
    # the generator does NOT de-duplicate line numbers within an order —
    # the audit correctly reports the violation (45832 distinct of 60000
    # at sf0.01), which is exactly the failure mode the rule exists for
    assert by_key["orderkey_linenumber"] == 0
    assert int(df[df.key_name == "orderkey_linenumber"].n_excess_rows.iloc[0]) > 0


def test_q354_gaps_are_well_formed_islands(q):
    df = q("q354_coverage_gaps")
    assert (df.gap_hours == df.gap_end_h - df.gap_start_h + 1).all()
    # islands within one series never touch: next start > prior end + 1
    for _, g in df.groupby("event_type"):
        g = g.sort_values("gap_start_h")
        assert (g.gap_start_h.diff().dropna() > 1).all() or len(g) <= 1


def test_q355_page_flag_matches_the_integer_thresholds(q):
    df = q("q355_slo_burn_rate")
    want = (
        (25 * df.errors >= 18 * df.total) & (10 * df.e6 >= 3 * df.t6)
        if "e6" in df.columns
        else None
    )
    # e6/t6 are not output columns; re-derive the fast-window half only
    fast = 25 * df.errors >= 18 * df.total
    assert (df[df.page_flag == 1].index.isin(df[fast].index)).all()
    assert ((df.burn_1h >= 0) & (df.burn_6h >= 0)).all()


# ---------------------------------------------------------------------------
# plan assertions of the documented scale shapes
# ---------------------------------------------------------------------------


def test_q337_fact_never_shuffles_to_a_join(spark):
    """q337: brand keys and per-part stats both broadcast — the only
    hash exchange moves the reduced per-part stats relation, and no
    sort-merge/shuffled-hash join exists."""
    plan = _plan(spark, "q337_tpch_q17_small_quantity")
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan, plan
    assert "BroadcastHashJoin" in plan, plan


def test_q341_hard_negatives_use_windowgrouplimit(spark):
    plan = _plan(spark, "q341_hard_negative_mining")
    assert "WindowGroupLimit" in plan, plan
    assert "SortMergeJoin" not in plan, plan


def test_q344_downsample_floor_broadcasts_no_shuffle_join(spark):
    """q344: the rank bound is a runtime scalar (min class count), so no
    static group-limit exists — the scale guarantee is instead that the
    floor joins back by BROADCAST and nothing sort-merges."""
    plan = _plan(spark, "q344_class_downsample")
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan, plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan, plan


def test_q350_bridge_joins_are_broadcast_only(spark):
    plan = _plan(spark, "q350_revenue_bridge")
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan, plan


def test_q352_single_fact_scan_no_shuffle_join(spark):
    """q352: under the production config (pinning ON) the ranked relation
    is ONE staged build both legs read (Scan ExistingRDD); the fact is
    never scanned twice and nothing sort-merges."""
    df = all_queries()["q352_topk_with_others"].fn(spark, SF_DIR)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("simple")
    plan = buf.getvalue()
    li_scans = [
        l for l in plan.splitlines() if "FileScan" in l and "lineitem" in l
    ]
    assert len(li_scans) <= 1, plan
    assert "SortMergeJoin" not in plan, plan
    assert "ExistingRDD" in plan, plan


def test_q355_is_one_scan(spark):
    plan = _plan(spark, "q355_slo_burn_rate", "simple")
    scans = [l for l in plan.splitlines() if "FileScan parquet" in l]
    assert len(scans) == 1, plan
