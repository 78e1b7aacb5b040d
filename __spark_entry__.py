"""Driver contract for the spark-graft builder (PySpark target).

Thin adapter over the engine's query registry
(`bigdata_streaming_absa_vehicle_spark.queries`): every declared operator from
SURVEY.md §2 is one registry entry bundling the PySpark implementation with
its DuckDB oracle SQL, so `queries()` and `oracle_sql()` stay in lockstep by
construction.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from bigdata_streaming_absa_vehicle_spark.queries import all_queries  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H-Q1-shaped pricing summary) on sf0.001."""
    spec = all_queries()["q09_pricing_summary"]
    return spec.fn(spark, "/root/testdata/sf0.001")


# The driver's correctness harness checks the FIRST 50 entries of queries()
# in dict order, so this priority list IS the rotation policy.  Rotation
# history (so full-coverage evidence can be reconstructed without git
# archaeology):
#   - Round 1 (CORRECTNESS_r01.json): registry insertion order[0:50] — the
#     relational/join/scalar surface q01-q42.  15 ERR'd on the events-nanos
#     harness bug (fixed in tables.load); the rest green.
#   - Round 2 (CORRECTNESS_r02.json): front-loaded the 15 round-1-ERR
#     queries + the 24 never-checked LLM-pipeline/inference/window-twin/UDF
#     queries (q42b-q69) + the 5 new operators (q72-q76) + 5 proven
#     flagships.  All 50 green; the 30 round-1-green relational queries sat
#     past the window on their r01 evidence.
#   - Round 3 (CORRECTNESS_r03.json): rotated the 30 round-1-green queries
#     back in (all green again) + first-ever rows for q77-q96.  The sandbox
#     Spark upgrade to 4.1.2 broke the events loader mid-round, so the 10
#     events-based entries ERR'd and the round-3 bench crashed — fixed in
#     tables._canonical_timestamps (dtype-branching loader).
#   - Round 4 (this file): tiered re-certification on the fixed loader, see
#     the tier comments inside _WINDOW_PRIORITY below.  Queries added in
#     round 4 (q100-q123: features/tpch_extra/profiling/lakehouse/
#     diagnostics modules) sit past the window on pytest-oracle evidence at
#     sf0.01 and take first rotation priority in round 5.
_WINDOW_PRIORITY = (
    # -- Round 4 window.  Tier 1: the 14 queries that have NEVER had a green
    # driver row (new in r3 and ERR'd on the events-loader bug, or added past
    # the r3 window).  The loader fix (tables._canonical_timestamps) un-blocks
    # them; first-ever driver signal is the round's top goal (VERDICT r3 §next
    # items 3/4/6). --
    "q77_interval_join_batch",
    "q82_token_ids",
    "q86_funnel",
    "q87_cohort_retention",
    "q88_heavy_hitters",
    "q89_full_outer_join",
    "q89b_right_outer_join",
    "q90_hll_mergeable_rollup",
    "q91_sessionize",
    "q93_cube_grouping",
    "q94_approx_percentiles",
    "q97_exists_subquery",
    "q98_scalar_subquery",
    "q99_group_having_in",
    # -- Tier 2: the 23 events-touching queries whose only driver rows predate
    # the sandbox's Spark 4.1.2 upgrade (judged stale-evidence FAIL(ts) in
    # VERDICT r3) — re-certify them on the current engine. --
    "q02_filter_predicate",
    "q04_group_sum_multikey",
    "q08_time_bucket",
    "q12_latest_topn",
    "q13_grouped_topk",
    "q15_keyed_sample",
    "q22w_lag_delta",
    "q23_collect_set",
    "q25w_moving_avg",
    "q27u_intersect_except",
    "q30b_from_json_struct",
    "q31_json_roundtrip",
    "q36_sigmoid_math",
    "q37_epoch_roundtrip",
    "q52_frame_sample",
    "q62_vehicle_pipeline_batch",
    "q63_tumbling_window_batch",
    "q64_sliding_window_batch",
    "q65_session_window_batch",
    "q68_detections_exploded",
    "q69_detections_udtf",
    "q72_asof_join",
    "q75_grouped_percentiles",
    # -- Tier 3: 13 queries whose operators currently rest on pytest-only
    # evidence (r2 driver rows at best) — one per only-pt operator ID:
    # A-08, X-02, X-03 (exact/LSH/IVF), X-04, X-05, D-02, D-03, D-05,
    # D-06, O-06. --
    "q09_pricing_summary",
    "q41_minhash_lsh_neardup",
    "q44_embedding_neardup",
    "q45_cosine_topk",
    "q46_lsh_ann_topk",
    "q46b_ivf_ann_topk",
    "q47_text_stats",
    "q51_multimodal_decode",
    "q60_absa_inference_batch",
    "q61_absa_sentiment_counts",
    "q66_grouped_map_scale",
    "q67_grouped_agg_centroid",
    "q76_stratified_sample",
)
# Window budget note: 14 + 23 + 13 fill the 50 exactly.  Every query past the
# window holds a green driver row that is still valid on the current engine —
# the 40 r3 greens (none touch events) plus r1/r2 rows for the remaining
# non-events queries (q30, q42-q43, q44b, q48-q50b, q53, q70, q71, q73, q74)
# — and ALL of them are re-hash-checked by the pytest oracle suite at sf0.01
# (the driver's own scale) every session.  If this window comes back green,
# all 104 registry queries have driver evidence valid for the current
# environment.


def _ordered_specs():
    specs = all_queries()
    missing = [n for n in _WINDOW_PRIORITY if n not in specs]
    if missing:
        raise KeyError(f"window priority names not in registry: {missing}")
    rest = [n for n in specs if n not in set(_WINDOW_PRIORITY)]
    return {n: specs[n] for n in (*_WINDOW_PRIORITY, *rest)}


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: spec.fn for name, spec in _ordered_specs().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for each hash-checkable query; non-SQL-expressible
    ops (streaming state, LSH candidate generation) are omitted on purpose —
    the driver records the weaker rows-only check for those."""
    return {
        name: spec.oracle for name, spec in _ordered_specs().items() if spec.oracle is not None
    }
