"""Scan fan-out helper for CPU-amplifying stages.

A parquet scan's task count is bounded by its SPLIT structure, not by
cluster size: one row group (or one file after aggressive compaction)
is one task no matter how many cores sit idle. That is fine when the
stage above the scan is thin (project/filter feeding an exchange — the
shuffle re-spreads the work anyway), but it serializes any stage that
AMPLIFIES per-row CPU before the first exchange: a multi-distinct
Expand (x n_cols rows), a per-row cryptographic hash probe, an
Arrow-batched model UDF. There the single scan task does the whole
table's expensive work alone while the rest of the cluster waits.

`fan_out` inserts one round-robin rebalance exchange — but only when
the scan is actually narrower than the session's parallelism, so on a
healthy many-split production layout it is a no-op choice. The shuffle
moves the RAW rows once (cheap, pre-amplification); the amplified work
then runs cluster-wide. This is the same trade Spark's own
REBALANCE/AQE machinery makes, applied one stage earlier than AQE can
reach (AQE only re-plans BELOW existing exchanges; it cannot widen a
scan-rooted stage).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def fan_out(df: DataFrame, min_factor: int = 2) -> DataFrame:
    """Rebalance `df` to the session's default parallelism iff its current
    plan yields fewer than `parallelism / min_factor` partitions.

    Use directly under a CPU-amplifying map stage (per-row hashing, Expand,
    pandas UDF inference), never under a thin projection feeding a shuffle
    (the shuffle's exchange already re-spreads the work — a fan_out there
    pays a second exchange for nothing).

    The partition probe is plan metadata only (file listing, no job) and
    costs ~80 ms on the driver; the rebalance itself is skipped whenever
    the scan already fans wide, so production plans keep their shape.

    `spark.graft.rebalance=false` turns both fan_out and hold_width into
    no-ops (A/B measurement isolation; also the production escape hatch
    if a deployment prefers pure AQE control)."""
    spark = df.sparkSession
    if spark.conf.get("spark.graft.rebalance", "true") == "false":
        return df
    parallelism = spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() * min_factor <= parallelism:
        return df.repartition(parallelism)
    return df


def hold_width(df: DataFrame, *cols) -> DataFrame:
    """Hash-repartition by `cols` with an EXPLICIT partition count (the
    session's shuffle-partition ceiling) so the same-key groupBy that
    follows shares the one exchange (guide §2.4) while AQE's bytes-based
    coalescing cannot narrow it — explicit-N user repartitions are exempt
    from coalescing.

    Use when the grouped relation feeds CPU-AMPLIFYING consumers (pair /
    triple explodes, per-row kernels), usually through a stage()
    checkpoint: a byte-small grouped result otherwise coalesces to a
    handful of partitions, the checkpoint materializes that narrow, and
    every downstream amplifying stage inherits serial parallelism
    (opt_sqlprof r13: q168's 4M-pair explode ran on 4 tasks, q271's
    triple explode on 5). Scale note: at sizes where the grouped output
    is exchange-filling, AQE would not have coalesced it anyway, so this
    only pins the floor the conf already declares — shuffle bytes are
    unchanged (same keys, same single exchange). Honors the same
    `spark.graft.rebalance=false` escape hatch as :func:`fan_out`."""
    conf = df.sparkSession.conf
    if conf.get("spark.graft.rebalance", "true") == "false":
        return df
    n = int(conf.get("spark.sql.shuffle.partitions", "200"))
    return df.repartition(n, *cols)
