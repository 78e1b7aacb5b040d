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
# in dict order.  Round 1 checked registry insertion order[0:50], leaving the
# 24 LLM-pipeline/inference/window-twin/UDF queries (q42b-q69) with no hard
# signal.  This priority list front-loads (a) the 15 queries that ERR'd in
# round 1 on the events-nanos harness bug (now fixed in tables.load) and
# (b) the 24 never-checked queries, padding the window to 50 with proven
# flagships.  The 24 round-1-green queries rotate past the window; their green
# CORRECTNESS_r01 rows stand as evidence.
_WINDOW_PRIORITY = (
    # round-1 ERR (events nanos) — must re-verify green
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
    "q30_json_extract",
    "q30b_from_json_struct",
    "q31_json_roundtrip",
    "q36_sigmoid_math",
    "q37_epoch_roundtrip",
    # round-1 never-checked (past the 50-entry window)
    "q42b_simhash_hamming_pairs",
    "q43_ngram_jaccard_pairs",
    "q44_embedding_neardup",
    "q44b_banded_neardup",
    "q45_cosine_topk",
    "q46_lsh_ann_topk",
    "q46b_ivf_ann_topk",
    "q47_text_stats",
    "q48_quality_and_tokens",
    "q49_lang_id",
    "q50_fingerprint",
    "q50b_rolling_fingerprint",
    "q51_multimodal_decode",
    "q52_frame_sample",
    "q53_resize_meta",
    "q60_absa_inference_batch",
    "q61_absa_sentiment_counts",
    "q62_vehicle_pipeline_batch",
    "q63_tumbling_window_batch",
    "q64_sliding_window_batch",
    "q65_session_window_batch",
    "q66_grouped_map_scale",
    "q67_grouped_agg_centroid",
    "q68_detections_exploded",
    "q69_detections_udtf",
    # new this round: as-of join, chunking, salient terms need first signals
    "q72_asof_join",
    "q73_chunking",
    "q74_salient_terms",
    "q75_grouped_percentiles",
    "q76_stratified_sample",
    # proven round-1 flagships padding the window to 50
    "q09_pricing_summary",
    "q41_minhash_lsh_neardup",
    "q42_simhash",
    "q70_shipping_priority",
    "q71_returned_item_report",
)


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
