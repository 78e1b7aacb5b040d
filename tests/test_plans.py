"""Physical-plan regression tests (SURVEY.md §4.2): the scale properties the
engine depends on — predicate pushdown into parquet, column pruning,
broadcast joins for small dims, partial+final aggregation, top-k instead of
global sort — asserted on the actual executed plans, so a refactor that
silently de-optimizes a query fails CI, not the 100 TB run.
"""

from __future__ import annotations

import contextlib
import io
import re

import pytest
from pyspark.sql import functions as F

from bigdata_streaming_absa_vehicle_spark.queries import all_queries
from bigdata_streaming_absa_vehicle_spark.tables import load

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(autouse=True)
def _unpinned_sorts(spark):
    """Disable the pre-sort localCheckpoint (functions/ordering.pin) so
    explain() shows the real pre-sort pipeline instead of Scan ExistingRDD —
    the physical plan under test is identical with pinning on; the
    checkpoint only changes where the range-sampler reads from."""
    spark.conf.set("spark.graft.pin_sorts", "false")
    yield
    spark.conf.unset("spark.graft.pin_sorts")


def plan_of(df, mode: str = "formatted") -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode)
    return buf.getvalue()


def test_filter_pushdown_reaches_parquet_scan(spark):
    li = load(spark, SF_DIR, "lineitem")
    df = li.filter(F.col("l_returnflag") == "R").select("l_orderkey", "l_quantity")
    plan = plan_of(df)
    assert "PushedFilters" in plan and "l_returnflag" in plan.split("PushedFilters")[1].split("\n")[0], (
        "filter on l_returnflag did not reach the parquet scan:\n" + plan
    )


def test_column_pruning_reaches_parquet_scan(spark):
    li = load(spark, SF_DIR, "lineitem")
    df = li.select("l_orderkey", "l_quantity")
    plan = plan_of(df)
    read_schema = plan.split("ReadSchema:")[1].split("\n")[0]
    assert "l_orderkey" in read_schema and "l_quantity" in read_schema
    assert "l_extendedprice" not in read_schema, (
        "projection did not prune unused columns from the scan:\n" + plan
    )


def test_small_dim_join_broadcasts(spark):
    q = all_queries()["q16b_broadcast_join"]
    plan = plan_of(q.fn(spark, SF_DIR))
    assert "BroadcastHashJoin" in plan, "small-dim join did not broadcast:\n" + plan


def test_star_join_broadcasts_all_dims(spark):
    """J-03: region/nation/customer are tiny next to orders — every dim side
    of the star join should broadcast (no sort-merge exchange of the fact)."""
    q = all_queries()["q17_star_join"]
    plan = plan_of(q.fn(spark, SF_DIR))
    assert "SortMergeJoin" not in plan, "star join fell back to sort-merge:\n" + plan
    assert plan.count("BroadcastHashJoin") >= 3, plan


def test_aggregation_is_partial_plus_final(spark):
    q = all_queries()["q04_group_sum_multikey"]
    plan = plan_of(q.fn(spark, SF_DIR))
    assert plan.count("HashAggregate") >= 2, (
        "groupBy did not plan map-side partial aggregation:\n" + plan
    )


def test_order_by_limit_plans_top_k(spark):
    q = all_queries()["q12_latest_topn"]
    plan = plan_of(q.fn(spark, SF_DIR))
    assert "TakeOrderedAndProject" in plan, (
        "ORDER BY ... LIMIT did not plan top-k (global sort instead):\n" + plan
    )


def test_range_join_is_broadcast_nested_loop(spark):
    """J-07: the only scalable non-equi join shape is broadcasting the tiny
    side; a cartesian shuffle would be quadratic at scale."""
    q = all_queries()["q21_range_join"]
    plan = plan_of(q.fn(spark, SF_DIR))
    assert "BroadcastNestedLoopJoin" in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_partitioned_write_enables_partition_pruning(spark, tmp_path):
    """Result tables written via write_partitioned prune whole partitions at
    plan time — the engine's replacement for the reference's Postgres B-tree
    indexes (db/init.sql:14-15)."""
    from bigdata_streaming_absa_vehicle_spark.tables import write_partitioned

    ev = load(spark, SF_DIR, "events").withColumn("event_date", F.to_date("ts"))
    out = str(tmp_path / "events_by_date")
    write_partitioned(ev, out, ["event_date"])
    one_day = ev.select("event_date").distinct().limit(1).collect()[0][0]
    df = spark.read.parquet(out).filter(F.col("event_date") == F.lit(one_day))
    plan = plan_of(df)
    pf = plan.split("PartitionFilters:")[1].split("\n")[0]
    assert "event_date" in pf, "date filter did not become a partition filter:\n" + plan


def test_lsh_candidate_join_carries_no_document_payload(spark):
    """The MinHash LSH band join must shuffle ids + band keys only — shingle
    sets enter the plan only at the verify re-join (SURVEY §2K scale shape).
    Auto-broadcast is disabled so the band join plans its at-scale shape (a
    shuffle exchange on (band_idx, band_key)) even on the tiny test table."""
    q = all_queries()["q41_minhash_lsh_neardup"]
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = plan_of(q.fn(spark, SF_DIR), mode="extended")
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    physical = plan.split("== Physical Plan ==")[-1]
    exchanges = [l for l in physical.splitlines() if "hashpartitioning(band_idx" in l]
    assert exchanges, "no band-key exchange found in plan:\n" + physical
    # the exchange rows on the candidate side must not carry shingle sets;
    # sh_set may appear only in the verify re-join exchanges (keyed by doc id)
    for line in exchanges:
        assert "sh_set" not in line, "LSH band shuffle carries shingle sets:\n" + line


def test_embedding_neardup_is_distributed_tiles(spark):
    """X-02 scale shape (q44): the exact all-pairs kernel must run as
    grouped block tiles — no driver collect (the plan is pure
    FlatMapGroupsInPandas over shuffled tile keys) and no broadcast of the
    corpus rows (only the tiny tile relation broadcasts)."""
    q = all_queries()["q44_embedding_neardup"]
    plan = plan_of(q.fn(spark, SF_DIR), mode="extended")
    physical = plan.split("== Physical Plan ==")[-1]
    assert "FlatMapGroupsInPandas" in physical, physical
    # the only broadcast is the B(B+1)/2 tile-id relation built from Range
    for seg in physical.split("BroadcastExchange")[1:]:
        assert "qv" not in seg.split("\n")[1], (
            "quantized corpus is being broadcast:\n" + physical
        )


def test_banded_neardup_candidate_join_carries_ids_only(spark):
    """X-02 scale shape (q44b): the band-key candidate join must shuffle
    (band_idx, band_val, vec_id) only — quantized vectors enter the plan at
    the verify re-join, keyed by id, for surviving candidates."""
    q = all_queries()["q44b_banded_neardup"]
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = plan_of(q.fn(spark, SF_DIR), mode="extended")
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    physical = plan.split("== Physical Plan ==")[-1]
    exchanges = [l for l in physical.splitlines() if "hashpartitioning(band_idx" in l]
    assert exchanges, "no band-key exchange found in plan:\n" + physical
    for line in exchanges:
        assert "qv" not in line, "band candidate shuffle carries vectors:\n" + line
    # pair-key dedup must run AFTER verify (on the few survivors), never on
    # the full candidate set: no (vec_a, vec_b) exchange below the verify
    # kernel in the tree (r2 verdict item — one fewer candidate-set exchange)
    import re

    assert "MapInPandas verify" in physical, physical
    below_verify = physical.split("MapInPandas verify", 1)[1]
    assert not re.search(r"hashpartitioning\(vec_a#\d+L, vec_b#", below_verify), (
        "candidate set is exchanged on the pair key before verify:\n" + physical
    )


def test_shuffle_hash_hint_switches_strategy(spark):
    """Join-strategy hints are honored: SHUFFLE_HASH builds a hash map per
    partition (no sort of either side — the right call when one side is
    much smaller but over the broadcast threshold), and results match the
    un-hinted sort-merge join."""
    orders = load(spark, SF_DIR, "orders").select("o_custkey", "o_totalprice")
    cust = load(spark, SF_DIR, "customer").select("c_custkey", "c_mktsegment")
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        hinted = orders.join(
            cust.hint("shuffle_hash"), orders.o_custkey == cust.c_custkey
        )
        plain = orders.join(cust, orders.o_custkey == cust.c_custkey)
        assert "ShuffledHashJoin" in plan_of(hinted)
        assert "SortMergeJoin" in plan_of(plain)
        assert hinted.count() == plain.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_token_encoding_broadcasts_vocabulary(spark):
    """q82: the bounded vocabulary must broadcast into the corpus-side
    token join — encoding is map-only over the corpus."""
    q = all_queries()["q82_token_ids"]
    plan = plan_of(q.fn(spark, SF_DIR))
    assert "BroadcastHashJoin" in plan, plan


def test_decontamination_broadcasts_eval_set(spark):
    """q83: the benchmark shingle set broadcasts; the corpus probe side
    never shuffles document text."""
    q = all_queries()["q83_decontamination"]
    plan = plan_of(q.fn(spark, SF_DIR))
    assert "BroadcastHashJoin" in plan, plan


def test_sequence_packing_single_partition_window_is_bucket_level_only(spark):
    """q84: every single-partition exchange in the plan is BOUNDED — the
    two 1-row max(doc_id) width aggregates (one per branch of the shared
    tokenized frame) and the bucket-offset running sum (capped at
    _PACK_MAX_BUCKETS rows). The corpus-level running sum is partitioned
    by bucket, and the corpus-scale shuffles are keyed by bucket/seq_id."""
    q = all_queries()["q84_sequence_packing"]
    plan = plan_of(q.fn(spark, SF_DIR), "extended")
    phys = plan.split("== Physical Plan ==")[1]
    assert phys.count("Exchange SinglePartition") == 3, phys
    # the corpus windows are hash-partitioned by bucket, never global
    assert "hashpartitioning(bucket" in phys, phys
    for line in phys.splitlines():
        if "Window" in line and "windowspecdefinition" in line:
            assert "bucket" in line, line


def test_heavy_hitters_broadcasts_grand_total(spark):
    """q88: the grand total is a 1-row broadcast nested-loop join, not an
    unpartitioned window over the key space."""
    q = all_queries()["q88_heavy_hitters"]
    plan = plan_of(q.fn(spark, SF_DIR))
    assert "BroadcastNestedLoopJoin" in plan, plan
    assert "Window" not in plan, plan


def test_cube_is_single_expand_pass(spark):
    """q93: CUBE executes as one Expand + hash agg — one shuffle for all
    four granularities, not one scan per level."""
    q = all_queries()["q93_cube_grouping"]
    plan = plan_of(q.fn(spark, SF_DIR), "simple")
    assert plan.count("Expand") >= 1, plan
    assert plan.count("Scan parquet") == 1, plan


def test_tpch_q3_uses_top_k_not_global_sort(spark):
    """q96: ORDER BY ... LIMIT 10 must be TakeOrderedAndProject — no global
    sort materializes."""
    q = all_queries()["q96_tpch_q3_shipping_priority"]
    plan = plan_of(q.fn(spark, SF_DIR))
    assert "TakeOrderedAndProject" in plan, plan


def test_tpch_q5_broadcasts_all_dims(spark):
    """q95: supplier/nation/region all broadcast; the only big shuffle is
    the lineitem-orders-customer spine."""
    q = all_queries()["q95_tpch_q5_local_supplier"]
    plan = plan_of(q.fn(spark, SF_DIR))
    assert plan.count("BroadcastHashJoin") >= 3, plan


def test_exists_subquery_decorrelates_to_semi_join(spark):
    """q97: Catalyst's RewritePredicateSubquery must turn the correlated
    EXISTS into a left-semi join — no per-row subquery node may survive into
    the physical plan (at 100 TB a surviving subquery is a scan per row)."""
    q = all_queries()["q97_exists_subquery"]
    plan = plan_of(q.fn(spark, SF_DIR))
    assert "LeftSemi" in plan, plan
    assert "Subquery" not in plan, plan


def test_scalar_subquery_decorrelates_to_aggregate_join(spark):
    """q98: the correlated scalar AVG becomes one aggregate over lineitem
    joined back on l_partkey — plan shows the aggregate + join, and no
    correlated-subquery node."""
    q = all_queries()["q98_scalar_subquery"]
    plan = plan_of(q.fn(spark, SF_DIR))
    assert "HashAggregate" in plan, plan
    assert "Subquery" not in plan, plan


def test_in_having_subquery_decorrelates_to_semi_join(spark):
    """q99: the IN (GROUP BY ... HAVING) list plans as aggregate -> left-semi
    join feeding the star join, with the final LIMIT as top-k."""
    q = all_queries()["q99_group_having_in"]
    plan = plan_of(q.fn(spark, SF_DIR))
    assert "LeftSemi" in plan, plan
    assert "TakeOrderedAndProject" in plan, plan


def test_zscore_stats_broadcast_not_second_shuffle(spark):
    """q101: the 5-row group stats broadcast back onto the events scan —
    normalization is map-only; the fact table never hash-shuffles."""
    q = all_queries()["q101_group_zscore"]
    plan = plan_of(q.fn(spark, SF_DIR))
    assert "BroadcastHashJoin" in plan, plan
    assert "Exchange hashpartitioning" not in plan, plan


def test_equidepth_bins_broadcast_edges_map_only_assign(spark):
    """q103: decile edges are one aggregate broadcast into a map-only bin
    assignment — no global ntile window over the table."""
    q = all_queries()["q103_equidepth_bins"]
    plan = plan_of(q.fn(spark, SF_DIR))
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan, plan
    assert "Window" not in plan, plan


def test_disjunctive_join_pushes_implied_filters_both_sides(spark):
    """q109 (TPC-H Q19 shape): the OR of conjunct groups must still push its
    derivable single-side implications to BOTH parquet scans."""
    q = all_queries()["q109_tpch_q19_disjunctive"]
    plan = plan_of(q.fn(spark, SF_DIR))
    pushed = [ln for ln in plan.splitlines() if "PushedFilters" in ln]
    assert any("l_quantity" in ln for ln in pushed), plan
    assert any("p_brand" in ln for ln in pushed), plan


def test_scd2_upsert_broadcasts_change_set(spark):
    """q106: both MERGE legs join the change-set as a broadcast — the
    dimension is never hash-shuffled."""
    q = all_queries()["q106_scd2_upsert"]
    plan = plan_of(q.fn(spark, SF_DIR))
    assert plan.count("BroadcastHashJoin") >= 2, plan
    assert "Exchange hashpartitioning" not in plan, plan


def test_time_range_window_single_user_shuffle(spark):
    """q100: one hash exchange on user_id feeding one WindowExec — the
    rolling-hour feature never self-joins."""
    q = all_queries()["q100_time_range_window"]
    plan = plan_of(q.fn(spark, SF_DIR))
    # exactly one hash exchange (user_id -> window); the only other exchange
    # is the presentation sort's range partitioning
    assert plan.count("hashpartitioning") == 1, plan
    assert "Window" in plan, plan
    assert "Join" not in plan, plan


def test_column_profile_no_expand_single_column_distincts(spark):
    """q113 (r13 shape): min/max/nulls in ONE ungrouped wide aggregate and
    each exact distinct as its OWN single-column aggregate — 12 independent
    columnar scans, each pruned to just the column it reads, and NO Expand
    anywhere (the r12 multi-distinct form replicated every row n_cols+1
    times through one Expand before the first exchange — 32.6 core-s of
    hashing at sf0.1 vs ~6 for this form; the 12 subtrees run their stages
    concurrently)."""
    q = all_queries()["q113_column_profile"]
    plan = plan_of(q.fn(spark, SF_DIR), "simple")
    assert plan.count("Scan parquet") == 12, plan
    assert "Expand" not in plan, plan
    assert "HashAggregate" in plan, plan


def test_count_min_sketch_probe_broadcasts_cells(spark):
    """q115: the 256-cell sketch relation broadcasts into the probe join —
    the key list is never hash-shuffled against the sketch."""
    q = all_queries()["q115_count_min_sketch"]
    plan = plan_of(q.fn(spark, SF_DIR))
    assert "BroadcastHashJoin" in plan, plan


def test_snapshot_diff_is_single_full_outer_join(spark):
    """q117: the changelog costs exactly one full-outer join on the key —
    no row-hash pass, no second scan pair beyond old/new."""
    q = all_queries()["q117_snapshot_diff"]
    plan = plan_of(q.fn(spark, SF_DIR), "simple")
    assert "FullOuter" in plan, plan


def test_transition_matrix_no_self_join(spark):
    """q118: lag window + aggregate — events never self-joins; row totals
    come back as a broadcast."""
    q = all_queries()["q118_transition_matrix"]
    plan = plan_of(q.fn(spark, SF_DIR))
    assert "Window" in plan, plan
    assert "SortMergeJoin" not in plan, plan
    assert "BroadcastHashJoin" in plan, plan


def test_join_fanout_profile_joins_counts_not_facts(spark):
    """q119: both sides collapse to (key, count) BEFORE the profile join —
    the join's input aggregates sit below it in the plan, and no fact
    payload column (o_custkey, l_quantity, ...) survives into the join."""
    q = all_queries()["q119_join_fanout_profile"]
    plan = plan_of(q.fn(spark, SF_DIR), "simple")
    join_line = next(l for l in plan.splitlines() if "Join" in l and "FullOuter" in l)
    assert "o_custkey" not in join_line and "l_quantity" not in join_line, plan


def test_bpe_pairs_top_k_not_global_sort(spark):
    """q121: the top-20 merge candidates plan as TakeOrderedAndProject —
    the pair space is never globally sorted."""
    q = all_queries()["q121_bpe_pairs"]
    plan = plan_of(q.fn(spark, SF_DIR))
    assert "TakeOrderedAndProject" in plan, plan


def test_pagerank_bucketed_iteration_join_is_shuffle_free(spark, tmp_path):
    """X-15 scale claim (SURVEY §2K): the per-iteration edge⋈rank join is
    "bucketable to shuffle-free at scale". Prove it like S-10: persist the
    edge list bucketed by src and the rank vector bucketed by doc_id with
    the same bucket count — the iteration join then consumes buckets as
    pre-shuffled input with NO Exchange in its physical plan, so at 100 TB
    the only shuffle left per iteration is the per-dst aggregate."""
    from bigdata_streaming_absa_vehicle_spark.queries.graph import pr_edges
    from bigdata_streaming_absa_vehicle_spark.sources.bucketed import (
        read_bucketed,
        write_bucketed,
    )

    docs = load(spark, SF_DIR, "documents").select("doc_id")
    n = docs.count()
    edges = pr_edges(docs, n)
    ranks = docs.select("doc_id", (F.lit(1.0) / n).alias("pr"))
    write_bucketed(edges, "t_pr_edges_b", ["src"], 4, path=str(tmp_path / "eb"))
    write_bucketed(ranks, "t_pr_ranks_b", ["doc_id"], 4, path=str(tmp_path / "rb"))
    try:
        eb, rb = read_bucketed(spark, "t_pr_edges_b"), read_bucketed(spark, "t_pr_ranks_b")
        prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            j = eb.join(rb, eb.src == rb.doc_id).select(
                "dst", (F.col("pr") / F.col("outdeg")).alias("c")
            )
            plan = j._jdf.queryExecution().executedPlan().toString()
            assert "Exchange" not in plan, plan
            # the full iteration (join + per-dst sum) pays exactly ONE
            # exchange — the unavoidable re-key from src to dst
            step = j.groupBy("dst").agg(F.sum("c").alias("s"))
            step_plan = step._jdf.queryExecution().executedPlan().toString()
            assert step_plan.count("Exchange") == 1, step_plan
            # and the bucketed join computes the same contributions
            plain = edges.join(ranks, edges.src == ranks.doc_id)
            assert j.count() == plain.count() > 0
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    finally:
        spark.sql("DROP TABLE IF EXISTS t_pr_edges_b")
        spark.sql("DROP TABLE IF EXISTS t_pr_ranks_b")


def test_pagerank_convergence_loop_matches_unrolled(spark):
    """The convergence-loop PageRank (graph.pagerank_converge) must walk the
    exact same trajectory as the oracle-certified unrolled q124: after 3
    iterations the vectors are identical (same rounding discipline), deltas
    shrink monotonically toward the fixpoint, and the periodic
    localCheckpoint keeps the loop runnable past the unrolled depth."""
    from bigdata_streaming_absa_vehicle_spark.queries.graph import (
        pagerank_converge,
        q124_pagerank,
    )

    ranks, iters, delta = pagerank_converge(
        spark, SF_DIR, tol=1e-10, max_iters=12, checkpoint_every=3
    )
    assert delta < 1e-10 or iters == 12
    assert iters > 3, "toy graph should not converge in fewer rounds than the unrolled form"
    # re-run capped at the unrolled depth: must equal q124 row-for-row
    ranks3, iters3, _ = pagerank_converge(spark, SF_DIR, tol=0.0, max_iters=3)
    assert iters3 == 3
    unrolled = {r["doc_id"]: r["pr"] for r in q124_pagerank(spark, SF_DIR).collect()}
    looped = {r["doc_id"]: r["pr"] for r in ranks3.collect()}
    assert looped == unrolled
    # ranks stay a probability-ish vector (mass <= 1, dangling mass dropped)
    total = ranks.agg(F.sum("pr")).first()[0]
    assert 0.5 < total <= 1.000001


def test_bloom_probe_is_scan_side_filter(spark):
    """A-16 (q138): the bloom words must reach the probe as INLINE
    LITERALS (the runtime-filter build-side fetch), keeping the probe a
    codegen filter on the fact scan — the words as scalar subqueries
    measured ~1 s extra at sf0.1 (the subquery reference in the filter
    defeats codegen common-subexpression elimination), and a
    crossJoin(broadcast(words)) plans a BroadcastNestedLoopJoin whose
    interpreted condition measured ~2x the whole query. The only join is
    the exact candidate-resolve broadcast hash join."""
    plan = plan_of(all_queries()["q138_bloom_prefilter"].fn(spark, SF_DIR))
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan
    # exactly one join NODE in the tree (the exact resolve BHJ); formatted
    # output repeats the name in the details section, so count tree nodes
    tree = plan.split("\n\n")[0]
    assert tree.count("Join") == 1 and "BroadcastHashJoin" in tree, plan
    # the words are literals in the probe filter, not subquery references
    assert "Subquery" not in tree, plan


def test_fuzzy_join_candidates_are_equi_join(spark):
    """X-19 (q137): candidate generation must be an EQUI join on the
    exploded length band — never a cartesian/theta product with the
    levenshtein in the join condition."""
    plan = plan_of(all_queries()["q137_fuzzy_word_pairs"].fn(spark, SF_DIR))
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert "levenshtein" in plan, plan  # verify runs post-join, in codegen


def test_triangle_joins_are_equi(spark):
    """X-18 (q136): the wedge self-join and the closing-edge join are
    equi-joins on node / pair keys — no cartesian anywhere, and the
    struct-comparison orientation filter stays a filter."""
    plan = plan_of(all_queries()["q136_triangle_count"].fn(spark, SF_DIR))
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_native_runtime_bloom_filter_injects(spark):
    """A-16 companion: Spark's own InjectRuntimeFilter plants a
    might_contain(bloom_filter_agg(...)) probe on the fact side of a
    shuffle join whose dim side carries a selective filter — the
    engine-native version of q138's declared bloom pre-filter. Thresholds
    are floor-gates sized for clusters (10GB application-side scan), so
    the test lowers them to let kb-scale fixtures qualify; the REWRITE
    under test is scale-independent."""
    confs = {
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "100MB",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    prev = {k: spark.conf.get(k) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    try:
        li = load(spark, SF_DIR, "lineitem").select("l_suppkey", "l_extendedprice")
        supp = (
            load(spark, SF_DIR, "supplier")
            .filter(F.col("s_acctbal") > 9000)
            .select("s_suppkey")
        )
        j = li.join(supp, li.l_suppkey == supp.s_suppkey).agg(
            F.sum("l_extendedprice").alias("s")
        )
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "might_contain" in plan.lower() or "bloomfilter" in plan.lower(), plan
    finally:
        for k, v in prev.items():
            spark.conf.set(k, v)


def test_peak_concurrency_windows_are_bucketed_or_per_user(spark):
    """q167: every window in the sweep is partitioned — the sessionize
    windows by user_id, the corpus-level running sum by the day bucket;
    the only unpartitioned window (bucket offsets) orders the BOUNDED
    per-day relation. No window line may lack both keys."""
    q = all_queries()["q167_peak_concurrency"]
    plan = plan_of(q.fn(spark, SF_DIR), "extended")
    phys = plan.split("== Physical Plan ==")[1]
    for line in phys.splitlines():
        if "windowspecdefinition" in line:
            assert "bucket" in line or "user_id" in line, line


def test_twap_is_one_user_shuffle_no_join(spark):
    """q160: one hashpartitioning(user_id) exchange feeds both the lead()
    window and the grouped agg — no join, no second fact shuffle."""
    q = all_queries()["q160_time_weighted_avg"]
    plan = plan_of(q.fn(spark, SF_DIR), "simple")
    assert "Join" not in plan, plan
    assert plan.count("Exchange hashpartitioning") == 1, plan
    assert "user_id" in plan.split("Exchange hashpartitioning")[1].split("\n")[0], plan


def test_basket_pairs_topk_broadcast_counts_equi_selfjoin(spark):
    """q168: the final top-20 is TakeOrderedAndProject (the pair space is
    never globally sorted), item counts come back via broadcast, and the
    candidate generator is a MAP-ONLY higher-order array transform over
    collected baskets — no fact self-join (SortMergeJoin) and no
    cartesian pair explosion exists in the plan."""
    q = all_queries()["q168_basket_pairs"]
    plan = plan_of(q.fn(spark, SF_DIR))
    assert "TakeOrderedAndProject" in plan, plan
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_mutual_information_marginals_broadcast(spark):
    """q165: marginals/total join back onto the bounded cell relation via
    broadcast — no shuffle join anywhere past the single fact rollup."""
    q = all_queries()["q165_mutual_information"]
    plan = plan_of(q.fn(spark, SF_DIR))
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan, plan


def test_referential_integrity_is_seven_anti_joins(spark):
    """q159: one LeftAnti existence probe per FK edge, operating on
    key-count relations (the aggregates sit BELOW the anti joins)."""
    q = all_queries()["q159_referential_integrity"]
    plan = plan_of(q.fn(spark, SF_DIR), "simple")
    assert plan.count("LeftAnti") == 7, plan


def test_table_checksum_no_keyed_shuffle_no_join(spark):
    """q164: each table's checksum is a pure map + ungrouped partial/final
    agg — no join and no hashpartitioning exchange anywhere; the only
    exchanges are the 1-row-per-table SinglePartition finals and the
    4-row presentation sort."""
    q = all_queries()["q164_table_checksum"]
    plan = plan_of(q.fn(spark, SF_DIR))
    assert "Join" not in plan, plan
    assert "Exchange hashpartitioning" not in plan, plan


def test_exact_auc_prefix_sum_is_bucket_partitioned(spark):
    """q166: the negatives-below running sum is partitioned by the score
    bucket; the only unpartitioned window (bucket offsets) runs over the
    bounded bucket relation."""
    q = all_queries()["q166_exact_auc"]
    plan = plan_of(q.fn(spark, SF_DIR), "extended")
    phys = plan.split("== Physical Plan ==")[1]
    for line in phys.splitlines():
        if "windowspecdefinition" in line:
            assert "bucket" in line, line


def test_gains_table_bins_map_only_cum_over_deciles(spark):
    """q162: decile edges broadcast back via a 1-row nested-loop join, bin
    assignment never sorts the fact (no ntile / no rangepartitioning before
    the agg), and the cumulative window runs over the bounded decile
    relation."""
    q = all_queries()["q162_gains_table"]
    plan = plan_of(q.fn(spark, SF_DIR), "extended")
    phys = plan.split("== Physical Plan ==")[1]
    assert "BroadcastNestedLoopJoin" in phys, phys
    assert not re.search(r"\bntile\(", phys), phys
    for line in phys.splitlines():
        if "windowspecdefinition" in line:
            assert "decile" in line, line


def test_negative_sampling_equi_bucket_join_grouped_topk(spark):
    """q163: candidates come from an EQUI join on the hash bucket (never a
    cartesian corpus product) and selection is a per-anchor row_number
    window — the O-05 grouped-top-k shape."""
    q = all_queries()["q163_negative_sampling"]
    plan = plan_of(q.fn(spark, SF_DIR))
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan, plan
    assert "Window" in plan, plan


def test_ab_test_is_user_rollup_then_scalar_agg(spark):
    """q169: one hashpartitioning(user_id) exchange for the per-unit
    conversion rollup, then a single-partition final — no join."""
    q = all_queries()["q169_ab_test_z"]
    plan = plan_of(q.fn(spark, SF_DIR), "simple")
    assert "Join" not in plan, plan
    assert plan.count("Exchange hashpartitioning") == 1, plan


def test_funnel_latency_single_window_no_step_join(spark):
    """q170: "purchase after a view" is a per-row running-min test inside
    one user-partitioned window — no join between funnel steps exists."""
    q = all_queries()["q170_funnel_latency"]
    plan = plan_of(q.fn(spark, SF_DIR), "extended")
    phys = plan.split("== Physical Plan ==")[1]
    assert "SortMergeJoin" not in phys and "ShuffledHashJoin" not in phys, phys
    for line in phys.splitlines():
        if "windowspecdefinition" in line:
            assert "user_id" in line, line


def test_linear_attribution_pairing_is_user_equi_join(spark):
    """q171: the purchase x touch pairing is an equi join on user_id with
    the time bound as a range predicate — never a cartesian pairing; the
    touch-total window is keyed by the purchase id."""
    q = all_queries()["q171_linear_attribution"]
    plan = plan_of(q.fn(spark, SF_DIR), "extended")
    phys = plan.split("== Physical Plan ==")[1]
    assert "CartesianProduct" not in phys and "BroadcastNestedLoopJoin" not in phys, phys
    for line in phys.splitlines():
        if "windowspecdefinition" in line:
            assert "event_id" in line, line


def test_user_entropy_joins_bounded_relations_only(spark):
    """q172: the (user, type) rollup is STAGED (lazy localCheckpoint), so
    the totals branch and the terms branch both read the materialized
    bounded relation instead of re-scanning the fact — with staging on,
    the final plan reads ExistingRDD and touches parquet zero times; and
    no cartesian exists anywhere."""
    q = all_queries()["q172_user_entropy"]
    spark.conf.set("spark.graft.pin_sorts", "true")
    try:
        plan = plan_of(q.fn(spark, SF_DIR), "simple")
    finally:
        spark.conf.set("spark.graft.pin_sorts", "false")
    assert "ExistingRDD" in plan, plan
    assert plan.count("Scan parquet") == 0, plan
    assert "CartesianProduct" not in plan, plan


def test_benford_reduces_fact_before_spine_join(spark):
    """q173: the digit spine joins the ALREADY-AGGREGATED <=9-row digit
    counts via broadcast — the aggregate sits below the join."""
    q = all_queries()["q173_benford_audit"]
    plan = plan_of(q.fn(spark, SF_DIR), "simple")
    join_seen = False
    for line in plan.splitlines():
        if "BroadcastHashJoin" in line:
            join_seen = True
        if join_seen and "HashAggregate" in line and "count" in line:
            break
    else:
        assert join_seen, plan
    assert "CartesianProduct" not in plan, plan


def test_gini_prefix_sum_is_bucket_partitioned(spark):
    """q174: the rank prefix sum over the distinct-cents relation is
    partitioned by the value bucket; the only unpartitioned window
    (bucket offsets) runs over the bounded bucket relation."""
    q = all_queries()["q174_revenue_gini"]
    plan = plan_of(q.fn(spark, SF_DIR), "extended")
    phys = plan.split("== Physical Plan ==")[1]
    for line in phys.splitlines():
        if "windowspecdefinition" in line:
            assert "bucket" in line, line


def test_rolling_active_users_fanout_is_broadcast_explode(spark):
    """q175: the sliding-distinct never plans a range self-join — the
    7-day fan-out is a broadcast nested-loop against the 7-row offset
    relation, and both distincts are keyed hash exchanges."""
    q = all_queries()["q175_rolling_active_users"]
    plan = plan_of(q.fn(spark, SF_DIR), "simple")
    assert "BroadcastNestedLoopJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan


def test_assortativity_is_degree_joins_plus_one_moments_agg(spark):
    """q176: no window, no cartesian — degrees join back by src/dst keys
    and a single partial+final agg carries six numbers."""
    q = all_queries()["q176_degree_assortativity"]
    spark.conf.set("spark.graft.pin_sorts", "true")
    try:
        plan = plan_of(q.fn(spark, SF_DIR), "simple")
    finally:
        spark.conf.set("spark.graft.pin_sorts", "false")
    assert "Window" not in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert plan.count("Exchange SinglePartition") == 1, plan


def test_model_churn_single_scan_bounded_tail(spark):
    """q177: the (aspect, la, lb) cell rollup is STAGED, so the marginal/
    total branches read the materialized bounded relation — with staging
    on, the final plan reads ExistingRDD and touches parquet zero times
    (one corpus scan total, despite four downstream consumers)."""
    q = all_queries()["q177_model_churn"]
    spark.conf.set("spark.graft.pin_sorts", "true")
    try:
        plan = plan_of(q.fn(spark, SF_DIR), "simple")
    finally:
        spark.conf.set("spark.graft.pin_sorts", "false")
    assert "ExistingRDD" in plan, plan
    assert plan.count("Scan parquet") == 0, plan
    assert "CartesianProduct" not in plan, plan


def test_survival_windows_run_after_aggregation(spark):
    """q179: both cumulative windows run over the post-aggregate bounded
    tenure-day relation, never the orders fact — every windowspecdefinition
    sits above the staged per-customer rollup (zero parquet scans reach a
    Window when staging is on), and the scan that does run is pruned to
    the two needed columns."""
    q = all_queries()["q179_survival_curve"]
    df = q.fn(spark, SF_DIR)
    plan = plan_of(df)
    read_schema = plan.split("ReadSchema:")[1].split("\n")[0]
    assert "o_custkey" in read_schema and "o_orderdate" in read_schema
    assert "o_totalprice" not in read_schema, plan
    spark.conf.set("spark.graft.pin_sorts", "true")
    try:
        staged = plan_of(q.fn(spark, SF_DIR), "simple")
    finally:
        spark.conf.set("spark.graft.pin_sorts", "false")
    window_tail = staged.split("Window")[-1] if "Window" in staged else ""
    assert "Scan parquet" not in window_tail.split("ExistingRDD")[0], staged


def test_golden_record_every_exchange_keys_entity_id(spark):
    """q181: all three survivorship legs shuffle on user_id and ONLY on
    user_id — no Exchange in the plan hashes any other key, and no
    cartesian/broadcast-nested-loop exists."""
    q = all_queries()["q181_user_golden_record"]
    plan = plan_of(q.fn(spark, SF_DIR), "simple")
    for line in plan.splitlines():
        if "Exchange hashpartitioning" in line:
            assert "user_id" in line, line
        if "Exchange rangepartitioning" in line:
            assert "user_id" in line, line
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan


def test_state_as_of_pushes_time_travel_predicate(spark):
    """q182: the ts < T time-travel predicate reaches the parquet scan as
    a pushed filter, so zone maps can skip files newer than T."""
    q = all_queries()["q182_state_as_of"]
    plan = plan_of(q.fn(spark, SF_DIR))
    pushed = plan.split("PushedFilters:")[1].split("\n")[0]
    assert "ts" in pushed and ("LessThan" in pushed or "IsNotNull" in pushed), plan


def test_bigram_pmi_unigrams_broadcast_topk_not_global_sort(spark):
    """q183: both unigram join legs are broadcast (the bigram relation
    never sort-merge-joins), and the top-50 is TakeOrdered, not a global
    sort."""
    q = all_queries()["q183_bigram_pmi"]
    plan = plan_of(q.fn(spark, SF_DIR), "simple")
    assert plan.count("BroadcastHashJoin") >= 2, plan
    assert "SortMergeJoin" not in plan, plan
    assert "TakeOrderedAndProject" in plan, plan


def test_seasonal_anomaly_fact_never_shuffles(spark):
    """q184: the cell stats join back into the fact by BROADCAST and both
    rollups are map-side combined — no Exchange in the plan hashes the
    fact (the only hash exchanges carry the bounded 168-cell relation),
    and no sort-merge join exists."""
    q = all_queries()["q184_seasonal_anomaly"]
    plan = plan_of(q.fn(spark, SF_DIR), "simple")
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan
    for line in plan.splitlines():
        if "Exchange hashpartitioning" in line:
            assert "dow" in line and "hr" in line, line


def test_out_of_order_prefix_max_is_bucket_partitioned(spark):
    """q185: the running event-time high-water mark is the two-level
    bucketed prefix MAX — every fact-sized windowspecdefinition is
    partitioned by the arrival bucket; only the bounded bucket-offset
    window is unpartitioned."""
    q = all_queries()["q185_out_of_order_profile"]
    plan = plan_of(q.fn(spark, SF_DIR), "extended")
    phys = plan.split("== Physical Plan ==")[1]
    unpartitioned = [
        line
        for line in phys.splitlines()
        if "windowspecdefinition" in line and "bucket#" not in line
    ]
    # the only unpartitioned window is the bucket-offset pass (reads b_max)
    for line in unpartitioned:
        assert "b_max" in line, line


def test_session_paths_one_user_shuffle_topk(spark):
    """q186: the lag flag, session sum, and per-session collect all ride
    ONE user_id exchange; the final ranking is TakeOrdered, not a global
    sort."""
    q = all_queries()["q186_session_paths"]
    plan = plan_of(q.fn(spark, SF_DIR), "simple")
    assert "TakeOrderedAndProject" in plan, plan
    user_exchanges = [
        line
        for line in plan.splitlines()
        if "Exchange hashpartitioning" in line and "user_id" in line
    ]
    assert len(user_exchanges) == 1, plan


def test_k_anonymity_single_rollup_one_scalar_row(spark):
    """q187: one QI-keyed rollup (the count-distinct Expand stays in
    HashAggregate, never SortAggregate — the q113 regression class) then
    one single-partition exchange for the scalar readout."""
    q = all_queries()["q187_k_anonymity"]
    plan = plan_of(q.fn(spark, SF_DIR), "simple")
    assert "SortAggregate" not in plan, plan
    assert plan.count("Exchange SinglePartition") == 1, plan
    assert "Join" not in plan, plan


def test_sketch_overlap_sketches_not_data_cross_exchanges(spark):
    """q188: the segment legs reduce to single-row sketch aggregates
    before any join — every join in the plan is a broadcast of a
    single-row relation, and no sort-merge join or cartesian of fact
    data exists."""
    q = all_queries()["q188_sketch_overlap"]
    plan = plan_of(q.fn(spark, SF_DIR), "simple")
    assert "SortMergeJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" in plan, plan  # single-row cross joins


def test_compaction_plan_window_is_partitioned_by_source(spark):
    """q190 (X-30): the manifest window must run partitioned by the
    table-partition key — a single-partition global window over the
    manifest would serialize the planner at 100 TB file counts."""
    q = all_queries()["q190_compaction_plan"]
    plan = plan_of(q.fn(spark, SF_DIR), "simple")
    assert "Window" in plan, plan
    assert re.search(r"Exchange hashpartitioning\(source", plan), (
        "manifest window is not partitioned by source:\n" + plan
    )
    assert "Join" not in plan, plan


def test_incremental_merge_joins_aggregated_relations_only(spark):
    """q191 (X-31): both sides of the base-plus-delta merge must be
    per-nation AGGREGATES — the join never sees customer rows, so four
    HashAggregates (partial+final per leg) precede it and the fact
    never re-shuffles after its rollup."""
    q = all_queries()["q191_incremental_agg_merge"]
    plan = plan_of(q.fn(spark, SF_DIR), "simple")
    assert plan.count("HashAggregate") >= 4, plan
    assert "CartesianProduct" not in plan, plan
    # the only sort allowed is the final presentation orderBy plus any
    # SMJ keyed on the bounded nation relation — no fact-sized exchange
    assert re.search(r"Exchange hashpartitioning\(c_custkey", plan) is None, plan


def test_blocking_keys_never_materializes_pairs(spark):
    """q192 (X-32): candidate pairs are arithmetic on the block
    histogram — no self-join of the keyed relation exists; the only
    join is the broadcast of the single-row total."""
    q = all_queries()["q192_blocking_keys"]
    plan = plan_of(q.fn(spark, SF_DIR), "simple")
    assert "SortMergeJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" in plan, plan  # single-row total
    assert "TakeOrderedAndProject" in plan, "top-40 fell back to global sort:\n" + plan


def test_half_sample_replicates_ride_one_ungrouped_agg(spark):
    """q193 (X-33): all 16 replicates (plus the full-sample stats) come
    from ONE map-side-combined ungrouped aggregate over ONE fact scan —
    no 16x row fan-out exists before the exchange (the Generate explodes
    the single RESULT row into the replicate table), no join, and the
    only exchange is the SinglePartition merge of the 34 partials."""
    q = all_queries()["q193_half_sample_ci"]
    plan = plan_of(q.fn(spark, SF_DIR), "simple")
    assert "SortMergeJoin" not in plan, plan
    # with staging on (production default), the one wide aggregate row
    # materializes once and both consumers read it: ONE fact scan total
    spark.conf.set("spark.graft.pin_sorts", "true")
    try:
        staged = plan_of(q.fn(spark, SF_DIR), "simple")
    finally:
        spark.conf.set("spark.graft.pin_sorts", "false")
    assert staged.count("Scan parquet") <= 1, staged
    assert re.search(r"hashpartitioning\(rep", plan) is None, plan
    # the explode (Generate) consumes the aggregated wide row — its input
    # columns are the n_b/s_b aggregate slots, never the fact's cents/h
    gen_line = next(l for l in plan.splitlines() if "Generate" in l)
    assert "n_0#" in gen_line and "cents#" not in gen_line, gen_line
    # and no keyed exchange exists anywhere — only the SinglePartition
    # merges of ungrouped partials (plus the fan_out round-robin)
    assert "Exchange hashpartitioning" not in plan, plan


def test_brier_single_fact_scan_bounded_tail(spark):
    """q194 (X-34): ONE scan of orders feeds the 10-bin rollup; totals
    and decomposition terms run on the bounded bin relation (broadcast
    joins only)."""
    q = all_queries()["q194_brier_calibration"]
    plan = plan_of(q.fn(spark, SF_DIR), "simple")
    assert "SortMergeJoin" not in plan, plan
    assert "SortAggregate" not in plan, plan
    # the 10-bin rollup is STAGED: its one fact scan materializes once and
    # the totals/terms branches read ExistingRDD — zero parquet scans in
    # the final plan (q177 precedent)
    spark.conf.set("spark.graft.pin_sorts", "true")
    try:
        staged = plan_of(q.fn(spark, SF_DIR), "simple")
    finally:
        spark.conf.set("spark.graft.pin_sorts", "false")
    assert "ExistingRDD" in staged, staged
    assert staged.count("Scan parquet") == 0, (
        "brier decomposition re-scanned the fact:\n" + staged
    )


def test_kmeans_assignment_is_map_only_vectors_never_shuffle(spark):
    """q195 (X-35): centroid assignment must be a broadcast + map-only
    array fold — no Window over vectors, no SortMergeJoin anywhere, and
    every Exchange keys on the bounded (cid[, pos]) domain, never on
    vec_id (the vectors themselves must not shuffle)."""
    q = all_queries()["q195_kmeans_iterations"]
    plan = plan_of(q.fn(spark, SF_DIR), "simple")
    assert "SortMergeJoin" not in plan, plan
    assert "Window" not in plan, "assignment fell back to a per-vector window:\n" + plan
    assert re.search(r"Exchange hashpartitioning\(vec_id", plan) is None, (
        "vectors shuffled by vec_id:\n" + plan
    )


def test_profile_drift_single_scan_single_expand_rollup(spark):
    """q196 (X-36): one fact scan; the three count-distincts ride ONE
    side-keyed HashAggregate chain (Expand, never SortAggregate, never
    a scan per column); reshape runs on the bounded relation."""
    q = all_queries()["q196_profile_drift"]
    plan = plan_of(q.fn(spark, SF_DIR), "simple")
    assert plan.count("Scan parquet") == 1, plan
    assert "SortAggregate" not in plan, plan
    assert plan.count("Expand") == 1, plan


def test_next_event_accuracy_predictions_broadcast(spark):
    """q197 (X-37): the trained argmax predictions join the eval pairs
    by BROADCAST (the matrix is type-domain bounded); the only
    fact-sized shuffle is the one user-keyed window pass."""
    q = all_queries()["q197_next_event_accuracy"]
    plan = plan_of(q.fn(spark, SF_DIR), "simple")
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan
    assert plan.count("Exchange hashpartitioning(user_id") <= 2, plan


def test_label_windows_fanout_is_bounded_explode_cokeyed_join(spark):
    """q198 (X-38): the future-window label condition must plan as the
    bounded explode (Generate) + a (user, wk)-keyed join — never a
    time-range BroadcastNestedLoop/cartesian over events."""
    q = all_queries()["q198_label_windows"]
    plan = plan_of(q.fn(spark, SF_DIR), "simple")
    assert "Generate" in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_deletion_audit_erasure_set_broadcasts(spark):
    """q199 (X-39): the erasure key set broadcasts into the orders
    semi-join — the orders fact never shuffles for it; no cartesian
    anywhere."""
    q = all_queries()["q199_deletion_audit"]
    plan = plan_of(q.fn(spark, SF_DIR), "simple")
    assert "BroadcastHashJoin LeftSemi" in plan or re.search(
        r"BroadcastHashJoin.*LeftSemi", plan
    ), plan
    assert "CartesianProduct" not in plan, plan


def test_hdr_quantiles_windows_run_per_type_no_join_of_fact(spark):
    """q200 (X-40): the fact reduces to the bounded histogram in one
    map-side-combined rollup; both cumulative windows are partitioned by
    event_type (never single-partition over the fact), and no join
    touches fact-sized data."""
    q = all_queries()["q200_hdr_quantiles"]
    plan = plan_of(q.fn(spark, SF_DIR), "extended")
    phys = plan.split("== Physical Plan ==")[1]
    assert "SortMergeJoin" not in phys, phys
    assert "CartesianProduct" not in phys, phys
    for line in phys.splitlines():
        if "windowspecdefinition" in line:
            assert "event_type#" in line, line


def test_token_budget_prefix_sum_is_bucketed(spark):
    """q201 (X-41): the corpus-order prefix sum is two-level — every
    doc-sized windowspecdefinition is partitioned by the quality bucket
    qb; only the bounded bucket-offset window is unpartitioned; the
    offsets and the budget scalar come back by broadcast."""
    q = all_queries()["q201_token_budget_selection"]
    plan = plan_of(q.fn(spark, SF_DIR), "extended")
    phys = plan.split("== Physical Plan ==")[1]
    unpartitioned = [
        line
        for line in phys.splitlines()
        if "windowspecdefinition" in line and "qb#" not in line
    ]
    for line in unpartitioned:
        assert "bt#" in line, line
    assert "BroadcastHashJoin" in phys, phys  # bucket offsets
    assert "BroadcastNestedLoopJoin" in phys, phys  # single-row budget


def test_adamic_adar_wedges_carry_ids_only(spark):
    """q202 (X-18): the wedge self-join carries ids only — every parquet
    scan reads just doc_id — the degree weights broadcast, and the final
    ranking is TakeOrdered, never a global sort."""
    q = all_queries()["q202_adamic_adar"]
    plan = plan_of(q.fn(spark, SF_DIR), "formatted")
    assert "CartesianProduct" not in plan, plan
    assert "TakeOrderedAndProject" in plan, plan
    assert "BroadcastHashJoin" in plan, plan
    for seg in plan.split("ReadSchema:")[1:]:
        schema = seg.split("\n")[0]
        assert "text" not in schema, "wedge pipeline reads doc payloads:\n" + schema


def test_bigram_surprisal_cost_table_broadcasts_into_doc_pairs(spark):
    """q203 (X-42): the (w1, w2) -> cost table joins into the doc-pairs
    relation by BROADCAST (the fact-sized leg never sort-merge-joins),
    and no cartesian exists."""
    q = all_queries()["q203_bigram_surprisal"]
    plan = plan_of(q.fn(spark, SF_DIR), "simple")
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastHashJoin" in plan, plan


def test_embedding_profile_is_one_rollup_no_join(spark):
    """q204 (X-43): posexplode is map-only and the ONLY exchange in the
    plan (besides the presentation sort) carries the 64-key dim
    relation; no join anywhere."""
    q = all_queries()["q204_embedding_dim_profile"]
    plan = plan_of(q.fn(spark, SF_DIR), "simple")
    assert "Join" not in plan, plan
    hash_ex = [
        line for line in plan.splitlines() if "Exchange hashpartitioning" in line
    ]
    assert len(hash_ex) == 1 and "dim#" in hash_ex[0], plan


def test_pareto_frontier_fact_broadcast_join_map_only_keep(spark):
    """q205 (X-44): the part scan joins the bounded price-threshold
    relation by BROADCAST (the fact never self-joins, never
    re-shuffles); the prefix max is two-level — price-sized windows are
    partitioned by the price bucket, only the bounded bucket-offset
    window is unpartitioned."""
    q = all_queries()["q205_pareto_frontier"]
    plan = plan_of(q.fn(spark, SF_DIR), "extended")
    phys = plan.split("== Physical Plan ==")[1]
    assert "BroadcastHashJoin" in phys, phys
    assert "SortMergeJoin" not in phys, phys
    unpartitioned = [
        line
        for line in phys.splitlines()
        if "windowspecdefinition" in line and "bucket#" not in line
    ]
    for line in unpartitioned:
        assert "bm#" in line, line


def test_abc_prefix_runs_on_value_collapsed_relation(spark):
    """q206 (X-25): the descending prefix sum runs AFTER two rollups
    (per-part revenue, then distinct-value collapse) — at least four
    HashAggregates (partial+final each) precede it — and the grand
    total joins back as a single-row broadcast."""
    q = all_queries()["q206_abc_classification"]
    plan = plan_of(q.fn(spark, SF_DIR), "simple")
    assert plan.count("HashAggregate") >= 4, plan
    assert "SortMergeJoin" not in plan, plan
    assert "BroadcastNestedLoopJoin" in plan, plan  # single-row total


def test_acf_one_window_pass_partitioned_by_type(spark):
    """q207 (X-20): all lag pairs come from ONE window pass partitioned
    by event_type (no unpartitioned window, no join), and the moments
    rollup is hash-aggregated."""
    q = all_queries()["q207_autocorrelation"]
    plan = plan_of(q.fn(spark, SF_DIR), "extended")
    phys = plan.split("== Physical Plan ==")[1]
    assert "Join" not in phys, phys
    for line in phys.splitlines():
        if "windowspecdefinition" in line:
            assert "event_type#" in line, line
    assert phys.count("Window") <= 2, phys


def test_new_user_growth_reduces_before_bounded_window(spark):
    """q209 (X-21): the fact reduces through the user rollup and the
    day rollup BEFORE the single bounded-relation cumulative window —
    exactly one single-partition exchange (the window over the
    calendar-bounded day relation), and no join."""
    q = all_queries()["q209_new_user_growth"]
    plan = plan_of(q.fn(spark, SF_DIR), "simple")
    assert "Join" not in plan, plan
    assert plan.count("HashAggregate") >= 4, plan
    assert plan.count("Exchange SinglePartition") == 1, plan


def test_fellegi_sunter_weights_computed_once_and_broadcast(spark):
    """q208 (X-32): the u-statistics reduce to single-row aggregates and
    cross-broadcast into the pair relation (BroadcastNestedLoopJoin of
    1-row relations), the candidate join is equi on the compound block
    key, and the ranking is TakeOrdered."""
    q = all_queries()["q208_fellegi_sunter"]
    plan = plan_of(q.fn(spark, SF_DIR), "simple")
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" in plan, plan
    assert "TakeOrderedAndProject" in plan, plan


def test_chi_square_marginals_derive_from_joint_rollup(spark):
    """q210 (X-22): ONE fact scan feeds the joint rollup; marginals and
    the total join back on the bounded relation by broadcast — no
    sort-merge join, no second fact-sized exchange."""
    q = all_queries()["q210_chi_square"]
    plan = plan_of(q.fn(spark, SF_DIR), "simple")
    assert "SortMergeJoin" not in plan, plan
    assert "BroadcastHashJoin" in plan, plan
    # with staging on (production default), the joint rollup materializes
    # once and the marginal/total legs read the checkpoint, not the fact
    spark.conf.set("spark.graft.pin_sorts", "true")
    pinned = plan_of(q.fn(spark, SF_DIR), "simple")
    assert "ExistingRDD" in pinned, pinned
    assert pinned.count("Scan parquet") <= 1, pinned


def test_rfm_edges_broadcast_scoring_map_only(spark):
    """q211 (X-45): the quintile edges and the reference day come back
    as single-row broadcasts; the customer relation is never
    re-shuffled after its rollup (the only hashpartitioning exchange
    carries o_custkey or the tiny score grid), and no window exists."""
    q = all_queries()["q211_rfm_segmentation"]
    plan = plan_of(q.fn(spark, SF_DIR), "simple")
    assert "BroadcastNestedLoopJoin" in plan, plan
    assert "Window" not in plan, plan
    assert "SortMergeJoin" not in plan, plan


def test_radius_join_candidates_from_cell_equi_join(spark):
    """q216 (X-46): candidates come from an EQUI-join on the cell key —
    no CartesianProduct and no theta-only join of the point relations
    exists (the only nested-loop is the single-row count broadcast);
    ranking is TakeOrdered."""
    q = all_queries()["q216_radius_join"]
    plan = plan_of(q.fn(spark, SF_DIR), "simple")
    assert "CartesianProduct" not in plan, plan
    assert "TakeOrderedAndProject" in plan, plan
    joins = [l for l in plan.splitlines() if "Join" in l and "BroadcastNestedLoop" not in l]
    assert any("cx" in l and "cy" in l for l in joins), plan


def test_bitmap_retention_joins_words_not_fact(spark):
    """q227 (X-08): the day-pair join runs over the (day, bucket) bitmap
    relation — every hash exchange carries day/bucket keys (never
    user_id after the one bitmap rollup), and no cartesian exists."""
    q = all_queries()["q227_bitmap_retention"]
    plan = plan_of(q.fn(spark, SF_DIR), "simple")
    assert "CartesianProduct" not in plan, plan
    for line in plan.splitlines():
        if "Exchange hashpartitioning" in line:
            assert "user_id" not in line, line


def test_concentration_curve_value_collapses_before_prefix(spark):
    """q234 (X-25): the descending prefix sums run on the distinct-
    activity-value relation — at least four HashAggregates (per-user
    rollup + value collapse, partial+final each) precede the window, and
    the totals come back as a single-row broadcast."""
    q = all_queries()["q234_concentration_curve"]
    plan = plan_of(q.fn(spark, SF_DIR), "simple")
    assert plan.count("HashAggregate") >= 4, plan
    assert "BroadcastNestedLoopJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan


def test_trigram_search_is_join_free_map_only(spark):
    """q236 (X-04): with the bounded literal needle, membership tests and
    the exact verify are map-only — the only join in the plan is the
    single-row counts broadcast, and the doc scan reads only
    (doc_id, text)."""
    q = all_queries()["q236_trigram_search"]
    plan = plan_of(q.fn(spark, SF_DIR), "simple")
    assert "SortMergeJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" in plan, plan  # single-row counts
    assert "Generate" not in plan, "corpus exploded despite literal needle:\n" + plan


def test_cusum_windows_run_per_series(spark):
    """q237 (X-20): both the cumulative scan and the argmax rank are
    partitioned by event_type — no unpartitioned window touches the
    daily relation — and the series stats join back by broadcast."""
    q = all_queries()["q237_cusum_changepoint"]
    plan = plan_of(q.fn(spark, SF_DIR), "extended")
    phys = plan.split("== Physical Plan ==")[1]
    for line in phys.splitlines():
        if "windowspecdefinition" in line:
            assert "event_type#" in line, line
    assert "BroadcastHashJoin" in phys, phys


def test_minhash_accuracy_rides_banded_pipeline(spark):
    """q238 (X-02): the estimator joins the verified pairs back to the
    signature relation keyed by doc id — no cartesian, and the banded
    candidate exchanges still carry no shingle payloads (the q41
    invariant holds through the composition)."""
    q = all_queries()["q238_minhash_estimator_accuracy"]
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = plan_of(q.fn(spark, SF_DIR), "extended")
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    physical = plan.split("== Physical Plan ==")[-1]
    assert "CartesianProduct" not in physical, physical
    for line in physical.splitlines():
        if "hashpartitioning(band_idx" in line:
            assert "sh_set" not in line, line


def test_fd_discovery_unions_single_row_branches(spark):
    """q243 (X-47): each FD branch reduces to ONE summary row before the
    union — no joins of any kind exist, and every scan is pruned to the
    determinant+dependent columns (no payload column ever loads)."""
    q = all_queries()["q243_fd_discovery"]
    plan = plan_of(q.fn(spark, SF_DIR), "simple")
    assert "Union" in plan, plan
    assert "Join" not in plan and "CartesianProduct" not in plan, plan
    for payload in ("o_totalprice", "l_quantity", "c_acctbal", "c_name"):
        assert payload not in plan, f"unpruned payload column {payload}:\n" + plan


def test_powerlaw_exchanges_carry_only_user_counts(spark):
    """q244 (X-48): the only hash exchange is the per-user count rollup —
    every later stage (median, stats, tail sum) is a single-row
    cross-broadcast over the bounded count relation, so no exchange ever
    carries event payloads (value/event_type/props)."""
    q = all_queries()["q244_powerlaw_tail"]
    plan = plan_of(q.fn(spark, SF_DIR), "simple")
    assert "SortMergeJoin" not in plan, plan
    assert "BroadcastNestedLoopJoin" in plan, plan  # single-row stat broadcasts
    for line in plan.splitlines():
        if "Exchange hashpartitioning" in line:
            for payload in ("value", "event_type", "props", "ts#"):
                assert payload not in line, line


def test_brand_momentum_broadcasts_part_and_windows_post_reduction(spark):
    """q245 (X-49): the part dimension joins by BROADCAST, and both
    windows (month total, trailing-3) are partitioned — no unpartitioned
    window, no cartesian; windows run after the (month, brand) rollup."""
    q = all_queries()["q245_brand_momentum"]
    plan = plan_of(q.fn(spark, SF_DIR), "extended")
    phys = plan.split("== Physical Plan ==")[1]
    assert "BroadcastHashJoin" in phys, phys
    assert "CartesianProduct" not in phys, phys
    for line in phys.splitlines():
        if "windowspecdefinition" in line:
            assert "month#" in line or "brand#" in line, line


def test_capped_backlog_is_single_exchange(spark):
    """q246 (X-50): the Lindley recurrence costs ONE hash exchange — the
    user_id shuffle — because all three windows share the (user, ts,
    event_id) sort and the final rollup groups on the already-co-located
    key. A second hashpartitioning exchange means the window/groupBy
    co-location broke."""
    q = all_queries()["q246_capped_backlog"]
    plan = plan_of(q.fn(spark, SF_DIR), "simple")
    hash_exchanges = [
        l for l in plan.splitlines() if "Exchange hashpartitioning" in l
    ]
    assert len(hash_exchanges) == 1, plan
    assert "user_id" in hash_exchanges[0], hash_exchanges[0]


def test_interval_coverage_is_single_exchange(spark):
    """q247 (X-51): the interval union costs ONE hash exchange — both
    windows share the (user, es, event_id) sort and both rollups group
    the co-located user key (the q246 discipline)."""
    q = all_queries()["q247_interval_coverage"]
    plan = plan_of(q.fn(spark, SF_DIR), "simple")
    hash_exchanges = [
        l for l in plan.splitlines() if "Exchange hashpartitioning" in l
    ]
    assert len(hash_exchanges) == 1, plan
    assert "user_id" in hash_exchanges[0], hash_exchanges[0]


def test_rank_churn_runs_on_bounded_leaderboard(spark):
    """q248 (X-53): after the one (month, brand) fact rollup, every join
    touches only the bounded leaderboard — the part dim and month index
    are broadcast, no cartesian, and no exchange after the rollup carries
    l_-prefixed fact columns."""
    q = all_queries()["q248_rank_churn"]
    plan = plan_of(q.fn(spark, SF_DIR), "simple")
    assert "BroadcastHashJoin" in plan, plan
    assert "CartesianProduct" not in plan, plan
    for line in plan.splitlines():
        if "Exchange hashpartitioning" in line and "l_orderkey" in line:
            raise AssertionError("fact keys leaked past the rollup:\n" + line)


def test_theil_sen_pairs_from_bounded_daily_relation(spark):
    """q249 (X-52): the pairwise slope join's both legs are the bounded
    (type, day) relation — the join keys are event_type (never user/event
    ids), and the fact's only exchange is the daily rollup."""
    q = all_queries()["q249_theil_sen_trend"]
    plan = plan_of(q.fn(spark, SF_DIR), "simple")
    assert "CartesianProduct" not in plan, plan
    for line in plan.splitlines():
        if "Exchange hashpartitioning" in line:
            assert "user_id" not in line and "event_id" not in line, line


def test_nearest_centroid_broadcasts_centroids(spark):
    """q250 (X-54): the centroid relation (labels x dims) reaches the
    component join as a BROADCAST — the embedding table itself is never
    the build side of a shuffle join — and the argmax window partitions
    by vec_id."""
    q = all_queries()["q250_nearest_centroid_eval"]
    plan = plan_of(q.fn(spark, SF_DIR), "extended")
    phys = plan.split("== Physical Plan ==")[1]
    assert "BroadcastHashJoin" in phys, phys
    assert "CartesianProduct" not in phys, phys
    for line in phys.splitlines():
        if "windowspecdefinition" in line:
            assert "vec_id#" in line, line


def test_wasserstein_runs_on_bounded_value_grid(spark):
    """q251 (X-55): after the one (type, cents) frequency rollup, the CDF
    windows partition by type and the pair join keys on grid values — no
    exchange after the rollup carries event ids or users, and the type
    totals broadcast."""
    q = all_queries()["q251_wasserstein_matrix"]
    plan = plan_of(q.fn(spark, SF_DIR), "simple")
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastHashJoin" in plan, plan
    for line in plan.splitlines():
        if "Exchange hashpartitioning" in line:
            assert "user_id" not in line and "event_id" not in line, line


def test_clustering_coefficient_carries_no_payloads(spark):
    """q252 (X-56): the shared wedge pipeline's exchanges carry only node
    ids and degrees — never document text — and the final coefficient join
    adds no cartesian."""
    q = all_queries()["q252_clustering_coefficient"]
    plan = plan_of(q.fn(spark, SF_DIR), "simple")
    assert "CartesianProduct" not in plan, plan
    assert "text" not in plan, "document payload leaked into the graph plan"


def test_sorted_neighborhood_is_join_free_blocked_window(spark):
    """q253 (X-57): blocked SNM is pure map-side lead() — no join of any
    kind exists in the plan, and the sliding window partitions by the
    block key (no global single-partition sort)."""
    q = all_queries()["q253_sorted_neighborhood"]
    plan = plan_of(q.fn(spark, SF_DIR), "extended")
    phys = plan.split("== Physical Plan ==")[1]
    assert "Join" not in phys, phys
    for line in phys.splitlines():
        if "windowspecdefinition" in line:
            assert "blk#" in line, line


def test_item_neighbors_pairs_generate_map_only(spark):
    """q254 (X-58): within-basket pairs come from the array transform —
    no fact self-join (no SortMergeJoin at all; item counts broadcast) —
    and the top-k window partitions by item."""
    q = all_queries()["q254_item_neighbors"]
    plan = plan_of(q.fn(spark, SF_DIR), "extended")
    phys = plan.split("== Physical Plan ==")[1]
    assert "SortMergeJoin" not in phys, phys
    assert "BroadcastHashJoin" in phys, phys
    for line in phys.splitlines():
        if "windowspecdefinition" in line:
            assert "i#" in line.split("windowspecdefinition")[1][:40], line


def test_jackknife_collapses_to_two_moment_aggregate(spark):
    """q255 (X-59): no per-replicate loop exists — one user rollup, a
    single-row totals broadcast (BroadcastNestedLoopJoin), and every hash
    exchange carries user-level keys, never raw event payloads."""
    q = all_queries()["q255_jackknife_ratio_se"]
    plan = plan_of(q.fn(spark, SF_DIR), "simple")
    assert "BroadcastNestedLoopJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan
    for line in plan.splitlines():
        if "Exchange hashpartitioning" in line:
            assert "event_type" not in line and "ts#" not in line, line


def test_elasticity_moments_after_broadcast_part_join(spark):
    """q256 (X-61): the part dimension joins BROADCAST onto the bounded
    per-part quantity relation; the only fact exchange is the l_partkey
    rollup."""
    q = all_queries()["q256_price_elasticity"]
    plan = plan_of(q.fn(spark, SF_DIR), "simple")
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan


def test_logrank_windows_run_on_bounded_lifetime_grid(spark):
    """q257 (X-62): the at-risk cumulative window runs on the per-lifetime
    event grid (bounded by the tenure domain) — no window input carries
    o_orderkey, and cohort totals arrive by broadcast."""
    q = all_queries()["q257_logrank_test"]
    plan = plan_of(q.fn(spark, SF_DIR), "simple")
    assert "BroadcastNestedLoopJoin" in plan, plan
    for line in plan.splitlines():
        if "Exchange hashpartitioning" in line:
            assert "o_orderkey" not in line, line


def test_simpsons_audit_is_integer_rollups_and_broadcasts(spark):
    """q258 (X-60): one user rollup, tercile edges and the paradox flag as
    single-row broadcasts — no sort-merge join anywhere."""
    q = all_queries()["q258_simpsons_audit"]
    plan = plan_of(q.fn(spark, SF_DIR), "simple")
    assert "SortMergeJoin" not in plan, plan
    assert "BroadcastNestedLoopJoin" in plan, plan


def test_leadlag_xcorr_lag_join_on_bounded_daily(spark):
    """q259 (X-63): the lag expansion is a broadcast over the bounded
    daily relation; no exchange after the (type, day) rollup carries
    event ids, and the best-lag window partitions by the pair."""
    q = all_queries()["q259_leadlag_xcorr"]
    plan = plan_of(q.fn(spark, SF_DIR), "extended")
    phys = plan.split("== Physical Plan ==")[1]
    assert "CartesianProduct" not in phys, phys
    for line in phys.splitlines():
        if "Exchange hashpartitioning" in line:
            assert "event_id" not in line and "user_id" not in line, line
        if "windowspecdefinition" in line:
            assert "type_a#" in line, line


def test_capture_recapture_pushes_capture_predicate(spark):
    """q260 (X-65): the purchase/value capture predicate reaches the
    parquet scan, and everything after the user rollup is single-row."""
    q = all_queries()["q260_capture_recapture"]
    plan = plan_of(q.fn(spark, SF_DIR), "formatted")
    assert "PushedFilters" in plan and "event_type" in plan.split("PushedFilters")[1].split("\n")[0], plan
    assert "SortMergeJoin" not in plan, plan


def test_burstiness_is_single_exchange(spark):
    """q261 (X-64): the lag window and the moment rollup share ONE
    user-keyed exchange (the q246 discipline)."""
    q = all_queries()["q261_burstiness"]
    plan = plan_of(q.fn(spark, SF_DIR), "simple")
    hash_exchanges = [
        l for l in plan.splitlines() if "Exchange hashpartitioning" in l
    ]
    assert len(hash_exchanges) == 1, plan
    assert "user_id" in hash_exchanges[0], hash_exchanges[0]


def test_abc_xyz_classifies_without_global_part_sort(spark):
    """q262 (X-66): no global sort of the part relation exists before the
    final presentation sort — the ABC prefix runs on the bounded
    distinct-revenue relation and XYZ is a map-only integer comparison
    after a broadcast of the week count."""
    q = all_queries()["q262_abc_xyz_matrix"]
    plan = plan_of(q.fn(spark, SF_DIR), "simple")
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" in plan, plan  # single-row week/total


def test_eb_shrinkage_is_one_rollup_plus_single_row_broadcast(spark):
    """q263 (X-67): every hash exchange is the user-keyed rollup (it
    renders once per staged branch with pinning off; the run materializes
    it once via stage()); the prior re-enters as a single-row broadcast
    nested-loop cross join — never a second distinct shuffle key."""
    q = all_queries()["q263_eb_shrinkage"]
    plan = plan_of(q.fn(spark, SF_DIR), "simple")
    hash_exchanges = [
        l for l in plan.splitlines() if "Exchange hashpartitioning" in l
    ]
    assert hash_exchanges, plan
    assert all("user_id" in l for l in hash_exchanges), plan
    assert "BroadcastNestedLoopJoin" in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_rank_correlation_runs_on_bounded_daily(spark):
    """q264 (X-68): every hash exchange carries only daily-rollup keys
    (d / tie-group x / y) — the rank windows and the O(days^2)
    concordance join never shuffle event-level rows."""
    q = all_queries()["q264_rank_correlation"]
    plan = plan_of(q.fn(spark, SF_DIR), "simple")
    for l in plan.splitlines():
        if "Exchange hashpartitioning" in l:
            assert any(f"({k}#" in l or f"{k}#" in l for k in ("d", "x", "y")), l
    assert "BroadcastNestedLoopJoin" in plan, plan  # bounded concordance join


def test_cramers_v_single_fact_rollup(spark):
    """q265 (X-69): the fact reduces once to the bounded joint table;
    marginals re-enter via broadcast hash joins, never a second
    event-level shuffle."""
    q = all_queries()["q265_cramers_v"]
    plan = plan_of(q.fn(spark, SF_DIR), "simple")
    assert "BroadcastHashJoin" in plan, plan
    scans = [l for l in plan.splitlines() if "FileScan parquet" in l]
    assert all("events.parquet" in l for l in scans), plan
    for l in plan.splitlines():
        if "Exchange hashpartitioning" in l:
            assert "user_id" not in l and "event_id" not in l, l


def test_price_index_broadcasts_base_month(spark):
    """q266 (X-70): the basket join keys the dimension-scale (month,
    part) relation against a BROADCAST base-month slice — no
    lineitem-level join exists."""
    q = all_queries()["q266_price_index"]
    plan = plan_of(q.fn(spark, SF_DIR), "simple")
    assert "BroadcastHashJoin" in plan, plan
    for l in plan.splitlines():
        if "Exchange hashpartitioning" in l:
            assert "ym" in l or "l_partkey" in l, l


def test_did_is_one_user_rollup_plus_bounds_broadcast(spark):
    """q267 (X-71): the horizon-midpoint bounds enter as a single-row
    broadcast nested-loop cross join; the only hash exchanges are the
    user-keyed panel rollup."""
    q = all_queries()["q267_did_estimator"]
    plan = plan_of(q.fn(spark, SF_DIR), "simple")
    assert "BroadcastNestedLoopJoin" in plan, plan
    assert "CartesianProduct" not in plan, plan
    hash_exchanges = [
        l for l in plan.splitlines() if "Exchange hashpartitioning" in l
    ]
    assert hash_exchanges, plan
    # user-keyed panel rollup + the 2-row per-arm cell rollup only
    assert all("user_id" in l or "arm" in l for l in hash_exchanges), plan


def test_label_propagation_rounds_are_keyed_joins(spark):
    """q268 (X-72): every round is a node-keyed edge⋈label join + vote
    rollup — no cartesian/BNL product anywhere in the unrolled plan."""
    q = all_queries()["q268_label_propagation"]
    plan = plan_of(q.fn(spark, SF_DIR), "simple")
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    scans = [l for l in plan.splitlines() if "FileScan parquet" in l]
    assert all("documents.parquet" in l for l in scans), plan


def test_pinball_backtest_runs_on_bounded_daily(spark):
    """q269 (X-73): one fact rollup to (type, day); the cut and the
    forecast relation re-enter broadcast — no event-level join."""
    q = all_queries()["q269_pinball_backtest"]
    plan = plan_of(q.fn(spark, SF_DIR), "simple")
    assert "BroadcastNestedLoopJoin" in plan, plan  # single-row cut
    assert "BroadcastHashJoin" in plan, plan  # forecasts -> test days
    for l in plan.splitlines():
        if "Exchange hashpartitioning" in l:
            assert "event_type" in l or "quantile" in l, l


def test_heaps_law_single_token_shuffle(spark):
    """q270 (X-74): the only corpus-scale shuffle is the per-token
    first-rank rollup; checkpoint thresholds enter as a 10-row
    broadcast."""
    q = all_queries()["q270_heaps_law"]
    plan = plan_of(q.fn(spark, SF_DIR), "simple")
    assert "BroadcastNestedLoopJoin" in plan, plan  # 10-row checkpoint grid
    assert "CartesianProduct" not in plan, plan
    for l in plan.splitlines():
        if "Exchange hashpartitioning" in l:
            assert any(k in l for k in ("token", "cp", "rk_c")), l


def test_apriori_triples_generate_map_only(spark):
    """q271 (X-75): triples and pairs explode from the per-order sorted
    brand array (JVM higher-order transforms) — the only fact shuffle is
    the basket collect; the part dim joins broadcast; the top-k is a
    TakeOrdered, never a global sort."""
    q = all_queries()["q271_apriori_triples"]
    plan = plan_of(q.fn(spark, SF_DIR), "simple")
    assert "BroadcastHashJoin" in plan, plan
    assert "TakeOrderedAndProject" in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert plan.count("SortMergeJoin") == 0, plan


def test_gumbel_is_bounded_rollup_plus_horizon_broadcast(spark):
    """q272 (X-76): one fact rollup to (type, day) maxima, a per-type
    moment aggregate, and a 3-row broadcast horizon grid."""
    q = all_queries()["q272_gumbel_return_levels"]
    plan = plan_of(q.fn(spark, SF_DIR), "simple")
    assert "BroadcastNestedLoopJoin" in plan, plan  # 3-row horizon grid
    assert "CartesianProduct" not in plan, plan
    for l in plan.splitlines():
        if "Exchange hashpartitioning" in l:
            assert "event_type" in l, l


def test_markov_attribution_iterates_on_bounded_matrix(spark):
    """q273 (X-77): after the user-journey rollup, every iteration joins
    the bounded scenario x transition matrix — no event-level join and
    exactly one user-keyed window exchange family."""
    q = all_queries()["q273_markov_attribution"]
    plan = plan_of(q.fn(spark, SF_DIR), "simple")
    assert "CartesianProduct" not in plan, plan
    scans = [l for l in plan.splitlines() if "FileScan parquet" in l]
    assert all("events.parquet" in l for l in scans), plan


def test_zipf_ranks_only_vocabulary(spark):
    """q274 (X-74): the only corpus-scale shuffle is the token rollup;
    the rank window sorts the vocabulary, never the corpus."""
    q = all_queries()["q274_zipf_law"]
    plan = plan_of(q.fn(spark, SF_DIR), "simple")
    for l in plan.splitlines():
        if "Exchange hashpartitioning" in l:
            assert "token" in l, l
    scans = [l for l in plan.splitlines() if "FileScan parquet" in l]
    assert all("documents.parquet" in l for l in scans), plan


def test_modularity_readout_joins_on_node_keys(spark):
    """q275 (X-72): the modularity readout joins edges to labels on node
    ids and rolls up to communities — no cartesian product; the E total
    enters as a single-row broadcast."""
    q = all_queries()["q275_modularity"]
    plan = plan_of(q.fn(spark, SF_DIR), "simple")
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" in plan, plan  # single-row E


def test_position_attribution_copartitions_on_user(spark):
    """q276 (X-08): the purchase×touch pairing joins on user_id with the
    lookback as a join predicate — the q171 geometry; final rollup on
    the channel key only."""
    q = all_queries()["q276_position_attribution"]
    plan = plan_of(q.fn(spark, SF_DIR), "simple")
    assert "CartesianProduct" not in plan, plan
    assert "user_id" in plan and "SortMergeJoin" in plan or "ShuffledHashJoin" in plan or "BroadcastHashJoin" in plan, plan


def test_lexical_complexity_single_source_rollup(spark):
    """q277 (X-04): one corpus explode feeding a source-keyed rollup —
    every hash exchange carries the source key (the distinct expand
    rides the same key set)."""
    q = all_queries()["q277_lexical_complexity"]
    plan = plan_of(q.fn(spark, SF_DIR), "simple")
    for l in plan.splitlines():
        if "Exchange hashpartitioning" in l:
            assert "source" in l, l
    assert "Generate explode" in plan, plan


def test_bfs_rounds_are_keyed_joins(spark):
    """q278 (X-78): every BFS round is a node-keyed edge⋈frontier join +
    MIN rollup — no cartesian/BNL product in the unrolled plan."""
    q = all_queries()["q278_bfs_distance"]
    plan = plan_of(q.fn(spark, SF_DIR), "simple")
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    scans = [l for l in plan.splitlines() if "FileScan parquet" in l]
    assert all("documents.parquet" in l for l in scans), plan


def test_mantel_haenszel_is_q258_plan_plus_bounded_pool(spark):
    """q279 (X-79): one user-keyed rollup, tercile edges as a single-row
    broadcast, MH pooling over 3 stratum rows — no event-level join."""
    q = all_queries()["q279_mantel_haenszel"]
    plan = plan_of(q.fn(spark, SF_DIR), "simple")
    assert "BroadcastNestedLoopJoin" in plan, plan  # single-row edges
    assert "CartesianProduct" not in plan, plan
    for l in plan.splitlines():
        if "Exchange hashpartitioning" in l:
            assert "user_id" in l or "stratum" in l, l


def test_cold_start_distinct_reduces_before_join(spark):
    """q280 (X-80): every seen-set join keys on an entity id against a
    DISTINCT-reduced train-key relation; the part dim joins broadcast."""
    q = all_queries()["q280_cold_start_coverage"]
    plan = plan_of(q.fn(spark, SF_DIR), "simple")
    assert "BroadcastHashJoin" in plan, plan
    assert "CartesianProduct" not in plan, plan
    keys = ("p_brand", "o_custkey", "l_partkey", "l_suppkey", "tk", "k#")
    for l in plan.splitlines():
        if "Exchange hashpartitioning" in l:
            assert any(k in l for k in keys), l


def test_var_cvar_runs_on_bounded_daily(spark):
    """q281 (X-81): one fact rollup to daily revenue; lag, ranks, and the
    tail join (against the 2-row broadcast VaR relation) all run on the
    bounded loss relation."""
    q = all_queries()["q281_var_cvar"]
    plan = plan_of(q.fn(spark, SF_DIR), "simple")
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" in plan, plan  # rank-range tail join
    for l in plan.splitlines():
        if "Exchange hashpartitioning" in l:
            assert "level" in l or "(d#" in l or "d#" in l, l


def test_hits_half_steps_are_keyed_joins(spark):
    """q282 (X-15): every half-step joins the edge list against the score
    vector on a node key; normalization totals enter as single-row
    broadcasts — no cartesian product."""
    q = all_queries()["q282_hits_scores"]
    plan = plan_of(q.fn(spark, SF_DIR), "simple")
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" in plan, plan  # single-row totals
    scans = [l for l in plan.splitlines() if "FileScan parquet" in l]
    assert all("documents.parquet" in l for l in scans), plan


def test_conformal_reuses_pinball_geometry(spark):
    """q283 (X-73): the pairing is a 7-day-shifted self-join on the
    bounded daily relation; q_hat re-enters broadcast."""
    q = all_queries()["q283_conformal_intervals"]
    plan = plan_of(q.fn(spark, SF_DIR), "simple")
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastHashJoin" in plan, plan  # q_hat -> test days
    for l in plan.splitlines():
        if "Exchange hashpartitioning" in l:
            assert "event_type" in l, l


def test_oof_encoding_derives_all_totals_from_partials(spark):
    """q285 (X-82): one fact rollup to (brand, fold) partials; brand,
    fold, and grand totals DERIVE from that bounded relation and re-enter
    broadcast — exactly one lineitem scan per staged branch, no per-fold
    rescan."""
    q = all_queries()["q285_oof_target_encoding"]
    plan = plan_of(q.fn(spark, SF_DIR), "simple")
    assert "BroadcastHashJoin" in plan, plan
    assert "CartesianProduct" not in plan, plan
    for l in plan.splitlines():
        if "Exchange hashpartitioning" in l:
            assert "brand" in l or "fold" in l, l


def test_crossentropy_scores_via_token_keyed_join(spark):
    """q284 (X-04): the train-count rollup and the held-out scoring join
    both key on the token; N/V constants enter as a single-row
    broadcast; the per-doc rollup keys on doc_id."""
    q = all_queries()["q284_unigram_crossentropy"]
    plan = plan_of(q.fn(spark, SF_DIR), "simple")
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" in plan, plan  # single-row consts
    for l in plan.splitlines():
        if "Exchange hashpartitioning" in l:
            assert "token" in l or "doc_id" in l, l


def test_isotonic_runs_on_bounded_bins(spark):
    """q286 (X-34): one fact scan onto the 10-bin relation; the O(B^3)
    minimax grid runs entirely on broadcast-joined bounded relations."""
    q = all_queries()["q286_isotonic_calibration"]
    plan = plan_of(q.fn(spark, SF_DIR), "simple")
    assert "CartesianProduct" not in plan, plan
    scans = [l for l in plan.splitlines() if "FileScan parquet" in l]
    assert all("orders.parquet" in l for l in scans), plan
    for l in plan.splitlines():
        if "Exchange hashpartitioning" in l:
            assert any(
                k in l for k in ("bin", "j#", "i#", "_groupingexpression")
            ), l


def test_anomaly_consensus_shares_one_daily_rollup(spark):
    """q287 (X-83): all three detectors run on the staged bounded daily
    relation; per-type stats re-enter broadcast — the fact never joins
    at event grain."""
    q = all_queries()["q287_anomaly_consensus"]
    plan = plan_of(q.fn(spark, SF_DIR), "simple")
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastHashJoin" in plan, plan
    for l in plan.splitlines():
        if "Exchange hashpartitioning" in l:
            assert "event_type" in l, l


def test_weekend_effect_is_mergeable_moments(spark):
    """q288 (X-83): one fact rollup to (type, day, weekend-flag), a
    per-(type, flag) moment rollup, and a per-type pivot — exchanges
    carry only those bounded keys."""
    q = all_queries()["q288_weekend_effect"]
    plan = plan_of(q.fn(spark, SF_DIR), "simple")
    assert "CartesianProduct" not in plan, plan
    for l in plan.splitlines():
        if "Exchange hashpartitioning" in l:
            assert "event_type" in l, l


def test_voptimal_dp_runs_on_bounded_grids(spark):
    """q289 (X-84): all dp levels and the backtrack run on O(days^2)
    bounded relations — the only event-grain work is the daily rollup."""
    q = all_queries()["q289_voptimal_segments"]
    plan = plan_of(q.fn(spark, SF_DIR), "simple")
    assert "CartesianProduct" not in plan, plan
    scans = [l for l in plan.splitlines() if "FileScan parquet" in l]
    assert all("events.parquet" in l for l in scans), plan


def test_stratified_kfold_never_windows_whole_class(spark):
    """q290 (X-16): every window partitions on (class, bucket) or rides
    the bounded (class x 256) offset relation — no single-reducer
    per-class window exists in the plan."""
    q = all_queries()["q290_stratified_kfold"]
    plan = plan_of(q.fn(spark, SF_DIR), "simple")
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastHashJoin" in plan, plan
    hash_exchanges = [
        l for l in plan.splitlines() if "Exchange hashpartitioning" in l
    ]
    assert all("class" in l for l in hash_exchanges), plan
    # the event-grain window exchange must carry the bucket alongside class
    assert any("bucket" in l for l in hash_exchanges), plan


def test_entropy_rate_iterates_on_bounded_matrix(spark):
    """q291 (X-13): the q221 plan — one user-keyed window pass to the
    bounded transition matrix; iterations, per-state entropies, and the
    weighted readout all on it."""
    q = all_queries()["q291_entropy_rate"]
    plan = plan_of(q.fn(spark, SF_DIR), "simple")
    assert "CartesianProduct" not in plan, plan
    scans = [l for l in plan.splitlines() if "FileScan parquet" in l]
    assert all("events.parquet" in l for l in scans), plan


def test_max_drawdown_windows_on_bounded_daily(spark):
    """q292 (X-81): one fact rollup to daily flows; every window runs on
    the bounded daily relation."""
    q = all_queries()["q292_max_drawdown"]
    plan = plan_of(q.fn(spark, SF_DIR), "simple")
    assert "CartesianProduct" not in plan, plan
    for l in plan.splitlines():
        if "Exchange hashpartitioning" in l:
            assert "d#" in l, l


def test_nb_overdispersion_is_rollup_unpivot_rollup(spark):
    """q293 (X-79): one user-keyed rollup, a map-only stack unpivot, and
    a 5-row moment rollup — no join in the plan."""
    q = all_queries()["q293_nb_overdispersion"]
    plan = plan_of(q.fn(spark, SF_DIR), "simple")
    assert "Join" not in plan, plan
    hash_exchanges = [
        l for l in plan.splitlines() if "Exchange hashpartitioning" in l
    ]
    assert all("user_id" in l or "event_type" in l for l in hash_exchanges), plan


def test_poisson_bootstrap_fans_out_rollup_not_fact(spark):
    """q294 (X-59): the 64x replica fan-out explodes the USER rollup,
    never the fact table — every hash exchange is keyed by user_id or
    the replica id, and no exchange carries raw event columns."""
    q = all_queries()["q294_poisson_bootstrap_se"]
    plan = plan_of(q.fn(spark, SF_DIR), "simple")
    assert "CartesianProduct" not in plan, plan
    hash_exchanges = [
        l for l in plan.splitlines() if "Exchange hashpartitioning" in l
    ]
    assert all("user_id" in l or "r#" in l for l in hash_exchanges), plan


def test_ols_is_one_moment_rollup(spark):
    """q295 (X-85): one fact rollup to daily, one 9-moment rollup to a
    single row — the only hash exchange is the daily key."""
    q = all_queries()["q295_ols_trend_weekend"]
    plan = plan_of(q.fn(spark, SF_DIR), "simple")
    assert "CartesianProduct" not in plan, plan
    for l in plan.splitlines():
        if "Exchange hashpartitioning" in l:
            assert "d#" in l, l


def test_stump_split_search_runs_on_bounded_relation(spark):
    """q297 (X-88): one user rollup, one x rollup; the cumulative scan
    and argmax never re-shuffle fact-grain data."""
    q = all_queries()["q297_decision_stump"]
    plan = plan_of(q.fn(spark, SF_DIR), "simple")
    assert "CartesianProduct" not in plan, plan
    hash_exchanges = [
        l for l in plan.splitlines() if "Exchange hashpartitioning" in l
    ]
    assert all("user_id" in l or "x#" in l for l in hash_exchanges), plan


def test_naive_bayes_scores_via_broadcast_params(spark):
    """q298 (X-89): the scorer joins ONLY broadcast parameter tables —
    no shuffle join anywhere; the sole hash exchange is the user rollup."""
    q = all_queries()["q298_naive_bayes"]
    plan = plan_of(q.fn(spark, SF_DIR), "simple")
    assert "SortMergeJoin" not in plan, plan
    # user rollup + the bounded (class, feature-value) training rollups
    hash_exchanges = [
        l for l in plan.splitlines() if "Exchange hashpartitioning" in l
    ]
    assert all(
        "user_id" in l or "y#" in l or "c#" in l or "v#" in l
        for l in hash_exchanges
    ), plan


def test_median_ci_uses_two_level_prefix(spark):
    """q302 (X-92): cumulative counts run bucket-partitioned — the
    within-bucket window exchange carries the bucket key, never an
    ungrouped full-domain sort."""
    q = all_queries()["q302_median_ci"]
    plan = plan_of(q.fn(spark, SF_DIR), "simple")
    assert "CartesianProduct" not in plan, plan
    hash_exchanges = [
        l for l in plan.splitlines() if "Exchange hashpartitioning" in l
    ]
    assert any("bucket" in l for l in hash_exchanges), plan


def test_rrf_legs_join_bounded_rank_relations(spark):
    """q301 (X-91): the lexical leg joins postings on the shingle hash
    and the probe side broadcasts; no full-corpus cartesian exists."""
    q = all_queries()["q301_rrf_hybrid_retrieval"]
    plan = plan_of(q.fn(spark, SF_DIR), "simple")
    assert "CartesianProduct" not in plan, plan


def test_boosted_stumps_rounds_are_bounded_rollups(spark):
    """q303 (X-93): both boosting rounds run on bounded-domain rollups
    with the leaf models broadcast back — no fact-grain shuffle join."""
    q = all_queries()["q303_boosted_stumps"]
    plan = plan_of(q.fn(spark, SF_DIR), "simple")
    assert "CartesianProduct" not in plan, plan
    assert "SortMergeJoin" not in plan, plan


def test_seasonal_decomposition_windows_on_daily(spark):
    """q304 (X-94): every window and rollup after the fact pass runs on
    the bounded daily relation."""
    q = all_queries()["q304_seasonal_decomposition"]
    plan = plan_of(q.fn(spark, SF_DIR), "simple")
    assert "CartesianProduct" not in plan, plan
    for l in plan.splitlines():
        if "Exchange hashpartitioning" in l:
            assert "d#" in l or "dow#" in l, l


def test_spectral_embedding_iterates_on_bounded_matrix(spark):
    """q306 (X-96): the PPMI matrix is a bounded K x K relation; the
    doc-token relation distinct-reduces before the pair join and the
    vocabulary broadcasts — no fact-grain cartesian."""
    q = all_queries()["q306_spectral_token_embedding"]
    plan = plan_of(q.fn(spark, SF_DIR), "simple")
    assert "CartesianProduct" not in plan, plan


def test_t_closeness_grid_is_bounded(spark):
    """q307 (X-97): one fact rollup onto the bounded QI x bucket grid;
    every later exchange is keyed by QI columns."""
    q = all_queries()["q307_t_closeness"]
    plan = plan_of(q.fn(spark, SF_DIR), "simple")
    for l in plan.splitlines():
        if "Exchange hashpartitioning" in l:
            assert "event_type" in l or "sv#" in l or "dow#" in l, l


def test_causal_impact_collapses_effect_algebraically(spark):
    """q310 (X-100): one fact rollup to daily; fit/projection/readout
    are single-row aggregates — every exchange is keyed by the day."""
    q = all_queries()["q310_causal_impact"]
    plan = plan_of(q.fn(spark, SF_DIR), "simple")
    assert "CartesianProduct" not in plan, plan
    for l in plan.splitlines():
        if "Exchange hashpartitioning" in l:
            assert "d#" in l, l


def test_msprt_windows_on_bounded_daily(spark):
    """q311 (X-101): cumulative counts window over the bounded
    first-seen-day relation, keyed by user then day."""
    q = all_queries()["q311_msprt_monitor"]
    plan = plan_of(q.fn(spark, SF_DIR), "simple")
    assert "CartesianProduct" not in plan, plan
    hash_exchanges = [
        l for l in plan.splitlines() if "Exchange hashpartitioning" in l
    ]
    assert all(
        "user_id" in l or "d#" in l or "d0#" in l for l in hash_exchanges
    ), plan


def test_data_valuation_scores_via_broadcast_fanout(spark):
    """q314 (X-104): the 9-model scoring fans out the holdout with only
    broadcast parameter joins — no shuffle join reaches the scorer."""
    q = all_queries()["q314_data_valuation_loo"]
    plan = plan_of(q.fn(spark, SF_DIR), "simple")
    assert "SortMergeJoin" not in plan, plan


def test_shapley_lattice_is_single_row_pivot(spark):
    """q312 (X-102): one user rollup onto 8 mask rows; the lattice is a
    single-row pivot — exchanges carry user_id or mask only."""
    q = all_queries()["q312_shapley_attribution"]
    plan = plan_of(q.fn(spark, SF_DIR), "simple")
    hash_exchanges = [
        l for l in plan.splitlines() if "Exchange hashpartitioning" in l
    ]
    assert all("user_id" in l or "mask" in l for l in hash_exchanges), plan


def test_cost_threshold_sweeps_bounded_domain(spark):
    """q321 (X-111): the policy sweep is a window over the bounded
    activity rollup — exchanges carry user_id or the activity key."""
    q = all_queries()["q321_cost_threshold"]
    plan = plan_of(q.fn(spark, SF_DIR), "simple")
    hash_exchanges = [
        l for l in plan.splitlines() if "Exchange hashpartitioning" in l
    ]
    assert all("user_id" in l or "xc#" in l for l in hash_exchanges), plan


def test_mahalanobis_is_one_moment_rollup(spark):
    """q322 (X-112): one fact rollup to daily; the 10-moment row
    broadcasts into a map-only scorer — no shuffle after the day key."""
    q = all_queries()["q322_mahalanobis_anomaly"]
    plan = plan_of(q.fn(spark, SF_DIR), "simple")
    assert "CartesianProduct" not in plan, plan
    for l in plan.splitlines():
        if "Exchange hashpartitioning" in l:
            # the day key appears directly or as the groupBy's derived
            # grouping expression (day computed inline in the groupBy)
            assert "d#" in l or "_groupingexpression" in l, l


def test_cv_stump_windows_partition_by_fold(spark):
    """q323 (X-113): the cumulative curves window per fold (keyed), and
    the held-fold evaluation joins the 4 best rows broadcast."""
    q = all_queries()["q323_cross_validated_stump"]
    plan = plan_of(q.fn(spark, SF_DIR), "simple")
    assert "CartesianProduct" not in plan, plan
    assert any(
        "Exchange hashpartitioning(f#" in l for l in plan.splitlines()
    ), plan


def test_watermark_impact_uses_bucketed_prefix_max(spark):
    """q326 (X-116): the running event-time max is the two-level
    bucketed prefix pattern — a bucket-keyed window exchange exists and
    no ungrouped fact-wide sort window does."""
    q = all_queries()["q326_watermark_impact"]
    plan = plan_of(q.fn(spark, SF_DIR), "simple")
    assert any("bucket" in l for l in plan.splitlines()
               if "Exchange hashpartitioning" in l), plan


def test_partition_advisor_is_single_scan(spark):
    """q329 (X-119): every candidate selectivity comes from ONE events
    scan's conditional aggregates."""
    q = all_queries()["q329_partition_key_advisor"]
    plan = plan_of(q.fn(spark, SF_DIR), "simple")
    scans = [l for l in plan.splitlines() if "FileScan parquet" in l]
    assert len(scans) == 1, plan


def test_sequence_pair_support_is_join_free(spark):
    """q340 (X-22): the ordered-pair generator is a MAP-ONLY higher-order
    array transform over per-user collected type stats — no self-join,
    no shuffle join, no cartesian pairing anywhere; the only join is the
    single-row user-total broadcast."""
    q = all_queries()["q340_sequence_pair_support"]
    plan = plan_of(q.fn(spark, SF_DIR))
    assert "SortMergeJoin" not in plan, plan
    assert "ShuffledHashJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_kmv_sketch_rank_filter_is_group_limited(spark):
    """q339 (A-13): the rank<=k filter over the per-type hash window must
    compile to WindowGroupLimit — Spark's partial per-partition top-k —
    so only ~k rows per partition per group reach the exchange."""
    q = all_queries()["q339_kmv_distinct_sketch"]
    plan = plan_of(q.fn(spark, SF_DIR))
    assert "WindowGroupLimit" in plan, plan


def test_pixel_decode_pipeline_is_map_only(spark):
    """q406 (S-08/X-05): encode->decode is a fused map-only mapInPandas
    chain — no Exchange of the payload column anywhere before the
    presentation sort (payloads must never shuffle; at 100 TB the binary
    column streams through each executor Arrow batch by Arrow batch)."""
    from bigdata_streaming_absa_vehicle_spark.operators import multimodal as mm

    docs = load(spark, SF_DIR, "documents").select("doc_id")

    def encode(batches):
        import pandas as pd

        from bigdata_streaming_absa_vehicle_spark.operators.imagecodec import encode_ppm

        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "payload": [encode_ppm(2, 2, bytes(12)) for _ in range(len(pdf))],
                }
            )

    media = docs.mapInPandas(encode, schema="doc_id long, payload binary")
    plan = plan_of(mm.decode_image_pixels(media))
    assert "Exchange" not in plan, plan
    # the two stages sit ADJACENT in the tree — fused map-only, no barrier
    assert re.search(r"MapInPandas \(\d+\)\n\+- MapInPandas", plan), plan


def test_periodogram_demeaning_is_broadcast_not_reshuffle(spark):
    """q402 (X-129): the mean subtraction joins ONE broadcast scalar row
    onto the bounded daily relation — demeaning must not introduce any
    hash-partitioned exchange of the daily series, and the trig basis
    stays a broadcast join."""
    q = all_queries()["q402_dft_periodogram"]
    plan = plan_of(q.fn(spark, SF_DIR))
    assert "SortMergeJoin" not in plan, plan
    assert "ShuffledHashJoin" not in plan, plan


def test_ppjoin_full_has_no_allpairs_stage_and_broadcast_verify(spark):
    """q411b (X-136, full probe set): the candidate join must be an
    equi-join on the prefix token — no CartesianProduct or
    BroadcastNestedLoopJoin anywhere — and the verification joins bring the
    token arrays in as broadcasts, so candidate pairs never reshuffle after
    the pair-keyed positional aggregate."""
    q = all_queries()["q411b_ppjoin_full"]
    plan = plan_of(q.fn(spark, SF_DIR), mode="extended")
    physical = plan.split("== Physical Plan ==")[-1]
    assert "CartesianProduct" not in physical, physical
    assert "BroadcastNestedLoopJoin" not in physical, physical
    # both verify joins are broadcasts of the token-array relation
    assert physical.count("BroadcastHashJoin") >= 2, physical


def test_jpeg_decode_pipeline_is_fanout_then_map_only(spark):
    """q416/q417/q418 (S-08): synth -> encode -> entropy decode fuse into
    one mapInPandas chain; the only exchanges are the deliberate
    round-robin FAN-OUT of the 8-byte doc-id relation (a single-split
    input would serialize the CPU-bound codec onto one worker) and the
    final presentation sort — never a hash exchange of payloads."""
    import re as _re

    for name in (
        "q416_jpeg_decode",
        "q417_png_decode",
        "q418_jpeg_color_decode",
        "q419_jpeg_progressive_decode",
    ):
        q = all_queries()[name]
        plan = plan_of(q.fn(spark, SF_DIR), mode="extended")
        physical = plan.split("== Physical Plan ==")[-1]
        kinds = _re.findall(r"Exchange (\w+)", physical)
        assert all(
            k.startswith(("rangepartitioning", "RoundRobinPartitioning")) for k in kinds
        ), name + ":\n" + physical
        assert sum(k.startswith("RoundRobinPartitioning") for k in kinds) == 1, (
            name + ":\n" + physical
        )
        assert "MapInPandas" in physical, name + ":\n" + physical
