"""Batched ML-inference operator (SURVEY.md §4.3.1, D-01/D-02 rewrite).

The reference runs inference two ways: driver-side toPandas() + torch
(spark_kafka_consumer_dag.py:137-175 — a single-node bottleneck, not ported)
and executor-side pandas_udf (consumer_postgres_streaming.py:74-91 — the
pattern standardized here): Arrow-batched columns in, model loaded ONCE per
Python worker via a module-level cache, logits out.

The transformer weights are not in this container, so the bundled model is a
deterministic md5-based stand-in with the exact output contract of the
reference's ABSA head (8 aspects x 4 classes -> argmax labels). Because the
stub is hash-based it is also SQL-expressible, which lets the correctness
gate hash-check the full pandas_udf path against a DuckDB oracle — the Arrow
boundary, batching, and per-worker caching are all real.

Hot reload (§4.3.2): the reference mtime-polls the weights file inside the
driver loop (spark_kafka_consumer_dag.py:111-124). Engine version: the model
version is read per micro-batch in foreachBatch and stamped on rows; workers
reload when the version string changes (cache key = version).
"""

from __future__ import annotations

import hashlib
import os
from dataclasses import dataclass

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..schemas import ABSA_ASPECTS, ABSA_NUM_CLASSES

#: per-worker model cache, keyed by version (reload-on-change, load-once)
_MODEL_CACHE: dict[str, "StubAbsaModel"] = {}


@dataclass(frozen=True)
class StubAbsaModel:
    """Deterministic stand-in for the PhoBERT/XLM-R ABSA head. Replace
    `logits_for` with a real forward pass when torch + weights exist; the
    operator plumbing does not change."""

    version: str

    def logits_for(self, text: str, aspect: str) -> list[int]:
        return [
            int(hashlib.md5(f"{self.version}:{aspect}:{c}:{text}".encode()).hexdigest()[:8], 16)
            for c in range(ABSA_NUM_CLASSES)
        ]

    def predict(self, texts: pd.Series) -> pd.DataFrame:
        def argmax_for(t: str, a: str) -> int:
            logits = self.logits_for(t, a)  # hoisted: one hash pass, not one per candidate
            return max(range(ABSA_NUM_CLASSES), key=lambda c: (logits[c], -c))

        out = {}
        for aspect in ABSA_ASPECTS:
            out[aspect] = texts.map(lambda t, a=aspect: argmax_for(t, a))
        return pd.DataFrame(out)


def load_model(version: str) -> StubAbsaModel:
    """Load-once-per-worker (the pattern at consumer_postgres_streaming.py:76-81
    — lazy global, never serialized into the closure)."""
    model = _MODEL_CACHE.get(version)
    if model is None:
        model = StubAbsaModel(version)
        _MODEL_CACHE[version] = model
    return model


def evaluate_and_promote(
    candidate_metrics: dict[str, float],
    champion_metrics: dict[str, float] | None,
    metric: str = "acc",
) -> bool:
    """The reference's retrain gate (dags/absa_streaming_lifecycle_full.py:38-63:
    promote the candidate iff its eval metric beats the champion's;
    eval_result.json carries {new_model_acc, best_model_acc}). Kept as a pure
    decision function — orchestration (file moves, DAG scheduling) stays
    outside the engine per SURVEY §3.3; the streaming side reacts through the
    version-keyed worker cache (load_model) when the champion file changes."""
    if champion_metrics is None:
        return True
    return candidate_metrics[metric] > champion_metrics[metric]


def model_version_from_path(model_dir: str) -> str:
    """mtime-derived version string, the reference's champion-file scheme
    (spark_kafka_consumer_dag.py:111-124) without driver-side polling loops."""
    try:
        mtime = os.path.getmtime(model_dir)
        return pd.Timestamp(mtime, unit="s").strftime("%Y%m%d-%H%M%S")
    except OSError:
        return "v0"


def absa_predictions(text_col: Column | str, version: str = "v0") -> Column:
    """Arrow-batched inference: text -> array<int> of 8 aspect labels (0..3).
    One pandas_udf call per batch; the model lives in the worker cache."""

    @F.pandas_udf("array<int>")
    def infer(texts: pd.Series) -> pd.Series:
        model = load_model(version)
        preds = model.predict(texts.fillna(""))
        return pd.Series(preds.values.tolist())

    c = F.col(text_col) if isinstance(text_col, str) else text_col
    return infer(c)


def with_absa_columns(df: DataFrame, text_col: str = "text", version: str = "v0") -> DataFrame:
    """The absa_results row shape (FIXTURES.md §B2): one {Aspect}_pred int
    column per aspect + model_version."""
    preds = absa_predictions(text_col, version)
    out = df.withColumn("_preds", preds)
    for i, aspect in enumerate(ABSA_ASPECTS):
        out = out.withColumn(f"{aspect}_pred", F.col("_preds")[i])
    return out.drop("_preds").withColumn("model_version", F.lit(version))


def oracle_absa_pred(text_expr: str, aspect: str, version: str = "v0") -> str:
    """DuckDB twin of the stub model's argmax for one aspect (ties -> lowest
    class index, matching the (-c) tie-break in predict)."""
    hashes = [
        f"CAST(('0x' || substr(md5('{version}:{aspect}:{c}:' || {text_expr}), 1, 8)) AS BIGINT)"
        for c in range(ABSA_NUM_CLASSES)
    ]
    best = f"greatest({', '.join(hashes)})"
    expr = "3"
    for c in range(ABSA_NUM_CLASSES - 2, -1, -1):
        expr = f"CASE WHEN {hashes[c]} = {best} THEN {c} ELSE {expr} END"
    return expr
