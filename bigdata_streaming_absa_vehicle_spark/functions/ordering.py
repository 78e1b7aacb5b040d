"""Presentation-order helper for the determinism contract.

Every registry query ends in a total-order sort so its result hashes
identically across engines and partition layouts. A global `orderBy` plans a
range exchange whose partitioner SAMPLES its child — and outside AQE-
materialized shuffle boundaries that sampling job re-runs the entire
upstream pipeline, so a map-only query (parse -> kernel -> sort) pays its
compute twice.

`ordered()` pins the pre-sort relation with a lazy localCheckpoint: the
sample job materializes it once, the shuffle re-reads the checkpoint, and
the pipeline runs exactly once. Cost is bounded by the RESULT size, not the
input size (use it on the final projected relation only). This is a
presentation concern of the test/driver contract — at production scale you
would not globally sort a full result at all; the operator preceding the
sort is the deliverable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

#: Logical nodes whose recompute is one cheap columnar scan: a pipeline made
#: ONLY of these is column-pruned Project/Filter straight over the relation,
#: so the range-sampler re-running it costs less than checkpointing the full
#: result to RDD storage (guide §5: never materialize what is cheaper to
#: recompute). Anything else — Aggregate, Join, Window, Generate,
#: Repartition, ... — keeps the pin.
_THIN_LOGICAL = frozenset(("Project", "Filter", "LogicalRelation", "SubqueryAlias"))

#: Physical nodes allowed in a thin pipeline. Python UDFs hide inside
#: logical Projects but physical planning extracts them into
#: BatchEvalPython/ArrowEvalPython nodes, so the physical walk rejects them
#: (re-running a Python kernel for the sample pass would double its cost).
_THIN_PHYSICAL = frozenset(("Project", "Filter", "ColumnarToRow"))


def _thin_map_only(df: DataFrame) -> bool:
    """True iff the pre-sort pipeline is pure Project/Filter over one scan
    with no Python eval. Logical walk first (the tree already exists; wide
    pipelines exit at their first Aggregate/Join/... without ever planning),
    then a physical walk — only reached for tiny map-only trees, ~ms to
    plan — to catch extracted *EvalPython nodes."""
    try:
        stack = [df._jdf.queryExecution().logical()]
        while stack:
            n = stack.pop()
            if n.nodeName() not in _THIN_LOGICAL:
                return False
            ch = n.children()
            stack.extend(ch.apply(i) for i in range(ch.size()))
        stack = [df._jdf.queryExecution().sparkPlan()]
        while stack:
            n = stack.pop()
            name = n.nodeName()
            if name not in _THIN_PHYSICAL and not name.startswith("Scan "):
                return False
            ch = n.children()
            stack.extend(ch.apply(i) for i in range(ch.size()))
        return True
    except Exception:  # any plan-introspection surprise: keep the safe pin
        return False


def pin(df: DataFrame) -> DataFrame:
    """Pin the relation ahead of a final orderBy: `df.transform(pin)
    .orderBy(...)` — the range-partitioner's sample pass then reads the
    lazily-materialized checkpoint instead of re-running the pipeline
    (measured ~30-50% off map-heavy queries at sf0.1; an explicit
    repartition-before-sort was tried and measured slower — it pays a full
    extra shuffle).

    A thin-skip mode (`spark.graft.pin_thin=false`) makes pin() a no-op
    for map-only pipelines (pure Project/Filter over the scan, no Python
    eval), letting the range sampler recompute instead of materializing.
    It was MEASURED AND REJECTED as the default (r13): interleaved A/B at
    sf0.1 put the skip 1.2-1.7x SLOWER on the thin cohort (q03 1.22s pin
    vs 1.50s skip, q28 0.32 vs 0.55, q29 0.15 vs 0.19 — median of 5,
    ABBA) — even a "thin" JVM projection (regex, date_format, casts)
    costs more to recompute for the sample pass than the one-shot RDD
    materialization of the result, and for pure column selects the two
    arms tie (q01 0.75 vs 0.73). The r12 A/B record suggesting the
    opposite did not survive re-measurement under arm interleaving.
    The mode stays as a measurement tool, not the default.

    Set `spark.graft.pin_sorts=false` to make this a no-op: the checkpoint
    boundary renders as `Scan ExistingRDD` in explain(), so plan inspection
    (tests/test_plans.py, manual .explain audits) disables it to see the
    pre-sort pipeline — which is the same physical plan that runs beneath
    the checkpoint when pinning is on.

    Do NOT use on streaming DataFrames (checkpointing a stream is the
    engine's job) or anywhere but directly under a final sort."""
    conf = df.sparkSession.conf
    if conf.get("spark.graft.pin_sorts", "true") == "false":
        return df
    if conf.get("spark.graft.pin_thin", "true") == "false" and _thin_map_only(df):
        return df
    return df.localCheckpoint(eager=False)


def ordered(df: DataFrame, *cols) -> DataFrame:
    """Total-order df by cols without re-computing its pipeline for the
    range-partitioner's sample pass."""
    return pin(df).orderBy(*cols)


def stage(df: DataFrame) -> DataFrame:
    """Pin a MID-pipeline relation that multiple downstream branches reuse
    (bucket totals + cum join, max + argmax, both sides of a self-join):
    a lazy localCheckpoint materializes it once instead of once per branch.
    Honors the same `spark.graft.pin_sorts=false` escape hatch as :func:`pin`
    so plan tests (and manual .explain audits) can see through the boundary —
    the physical plan beneath is identical either way. `spark.graft.pin_stages`
    overrides just this helper (measurement isolation: pin-vs-stage effects
    are separable without a code edit); unset, it follows pin_sorts."""
    conf = df.sparkSession.conf
    if conf.get("spark.graft.pin_stages", conf.get("spark.graft.pin_sorts", "true")) == "false":
        return df
    return df.localCheckpoint(eager=False)
