"""Inference-operator tests (SURVEY.md §4.3.1-2, D-02): per-worker model
cache, version stamping, and the hot-reload contract — a new model version
changes predictions without changing the pipeline graph.
"""

from __future__ import annotations

import os
import time

from pyspark.sql import functions as F

from bigdata_streaming_absa_vehicle_spark.operators.inference import (
    load_model,
    model_version_from_path,
    with_absa_columns,
)
from bigdata_streaming_absa_vehicle_spark.schemas import ABSA_ASPECTS


def _preds(spark, version):
    df = spark.createDataFrame(
        [(str(i), f"review text {i}") for i in range(20)], "id string, text string"
    )
    out = with_absa_columns(df, text_col="text", version=version)
    return out.select("id", *[f"{a}_pred" for a in ABSA_ASPECTS], "model_version").collect()


def test_predictions_versioned_and_deterministic(spark):
    a1 = _preds(spark, "v0")
    a2 = _preds(spark, "v0")
    assert sorted(map(tuple, a1)) == sorted(map(tuple, a2)), "same version must be deterministic"
    assert all(r.model_version == "v0" for r in a1)
    for r in a1:
        for a in ABSA_ASPECTS:
            assert 0 <= r[f"{a}_pred"] <= 3


def test_hot_reload_changes_predictions(spark):
    """§4.3.2: version bump = new model behavior, same graph. The stub model
    is version-keyed, so distinct versions must disagree somewhere."""
    v0 = sorted(map(tuple, _preds(spark, "v0")))
    v1 = sorted(map(tuple, _preds(spark, "v1")))
    assert v0 != v1


def test_worker_model_cache_is_version_keyed():
    m0a, m0b, m1 = load_model("v0"), load_model("v0"), load_model("v1")
    assert m0a is m0b, "same version must hit the cache"
    assert m0a is not m1


def test_evaluate_and_promote_gate():
    """Mirrors the reference's promote-iff-better rule, including its live
    eval_result.json values (acc 0.856 vs best 0.83 -> promote)."""
    from bigdata_streaming_absa_vehicle_spark.operators.inference import evaluate_and_promote

    assert evaluate_and_promote({"acc": 0.856}, {"acc": 0.83})
    assert not evaluate_and_promote({"acc": 0.80}, {"acc": 0.83})
    assert not evaluate_and_promote({"acc": 0.83}, {"acc": 0.83}), "ties must not promote"
    assert evaluate_and_promote({"acc": 0.5}, None), "first model always promotes"


def test_model_version_from_mtime(tmp_path):
    d = tmp_path / "model_dir"
    d.mkdir()
    v1 = model_version_from_path(str(d))
    os.utime(d, (time.time() + 100, time.time() + 100))
    v2 = model_version_from_path(str(d))
    assert v1 != v2, "mtime change must produce a new version string"
    assert model_version_from_path(str(d / "missing")) == "v0"
