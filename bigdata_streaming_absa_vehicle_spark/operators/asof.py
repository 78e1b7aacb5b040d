"""As-of join (SURVEY.md §2F J-11, beyond-reference): for every left row,
the single most recent right row with right.time <= left.time on the same
key — the time-series join Spark has no built-in for (the reference's
dashboards join latest-state tables by re-querying; this is the general
operator).

Scale shape: the naive formulation is a range join (quadratic candidate
space). This implementation is the standard distributed as-of: union the
two sides tagged, ONE shuffle on the join key, sort within partition by
(time, side) and carry the right side's payload forward with a running
last(ignorenulls) window. Cost = one exchange + one in-partition sort —
the same shape as any keyed window aggregate, linear in rows, no candidate
blowup, AQE-skew-splittable.

Determinism: callers must make the right side unique per (key, time)
(asof_join pre-aggregates with max() when asked) — then the running last()
is independent of tie order among left rows because tied left rows carry
no payload (nulls are ignored) and every right row at t' <= t sorts before
any left row at t (right rows order first on equal timestamps).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_time: str,
    right_time: str,
    value_cols: list[str],
) -> DataFrame:
    """Left as-of join: left columns + value_cols from the latest right row
    with right_time <= left_time (nulls when no prior right row exists).
    `right` must be unique per (key, right_time)."""
    clashes = set(value_cols) & set(left.columns)
    if clashes:
        raise ValueError(
            f"value_cols {sorted(clashes)} collide with left columns — rename "
            "one side; silently overwriting the left column would null it out"
        )
    reserved = {"_t", "_side"} & (set(left.columns) | set(right.columns))
    if reserved:
        raise ValueError(f"columns {sorted(reserved)} are reserved by asof_join")
    l_tagged = left.withColumn("_t", F.col(left_time)).withColumn("_side", F.lit(0))
    for v in value_cols:
        l_tagged = l_tagged.withColumn(v, F.lit(None).cast(right.schema[v].dataType))
    r_tagged = (
        right.select(key, right_time, *value_cols)
        .withColumn("_t", F.col(right_time))
        .withColumn("_side", F.lit(1))
        .drop(right_time)
    )
    u = l_tagged.unionByName(r_tagged, allowMissingColumns=True)
    # right rows sort BEFORE left rows at equal timestamps (_side desc), so a
    # right row at exactly left_time is visible to that left row (<=, not <)
    w = (
        W.partitionBy(key)
        .orderBy(F.col("_t").asc(), F.col("_side").desc())
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    filled = u.select(
        "*", *[F.last(v, ignorenulls=True).over(w).alias(f"_asof_{v}") for v in value_cols]
    )
    out_cols = [c for c in left.columns] + [F.col(f"_asof_{v}").alias(v) for v in value_cols]
    return filled.filter(F.col("_side") == 0).select(*out_cols)
