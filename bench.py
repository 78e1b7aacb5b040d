"""Benchmark harness: runs the registered query suite at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON
line: {"metric", "value", "unit", "queries", "sf"}.

Each query is executed to completion with the no-op sink so we measure engine
execution (scan -> shuffle -> agg), not driver-side collection.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from bigdata_streaming_absa_vehicle_spark.queries import all_queries
from bigdata_streaming_absa_vehicle_spark.session import get_spark


def streaming_throughput(spark, sf_dir: str) -> dict[str, float]:
    """Events replayed as a micro-batched stream through the T-05 windowed
    aggregation, end to end — rows/sec to compare against the reference's
    configured ~10 rows/s ingest ceiling (BASELINE.md)."""
    import shutil
    import tempfile

    from bigdata_streaming_absa_vehicle_spark.sources.files import events_stream
    from bigdata_streaming_absa_vehicle_spark.streaming.event_time import tumbling_counts
    from bigdata_streaming_absa_vehicle_spark.tables import load

    from pyspark.sql import functions as F

    from bigdata_streaming_absa_vehicle_spark.schemas import REVIEW_ENVELOPE
    from bigdata_streaming_absa_vehicle_spark.sources.kafka import kafka_payload, parse_envelope
    from bigdata_streaming_absa_vehicle_spark.streaming.pipelines import absa_transform

    def median(xs: list[float]) -> float:
        s = sorted(xs)
        return s[len(s) // 2]

    stats: dict[str, object] = {}
    n_rows = load(spark, sf_dir, "events").count()
    stage = tempfile.mkdtemp(prefix="bench_stream_")
    n_runs = 3  # medians: single-shot rows/s moved ~2x across identical
    # code between rounds (JIT/page-cache warm-up noise); the median of 3
    # makes round-over-round comparison trustworthy (r2 verdict item)
    # Ambient-load telemetry (r6 verdict item 2): the r6 driver bench
    # recorded events throughput at half the r5 number on bit-identical
    # code; quiet-machine reruns recovered it, implicating machine
    # contention the record could not prove.  Record the 1-minute load
    # average around every streaming run so the next regression is
    # attributable from the bench artifact alone: rows/s moving with
    # loadavg is contention; rows/s moving at flat loadavg is a
    # regression.
    loadavg: list[list[float]] = []

    def mark_load() -> None:
        loadavg.append([round(x, 2) for x in os.getloadavg()])

    try:
        # run 0 is an EXCLUDED warmup (r8 verdict item 5): the first
        # streaming query of a session pays JIT/classloading/page-cache
        # costs the steady state never sees (r8 ABSA run 1: 1,614 vs
        # median 2,840 rows/s), which made the artifact's runs list read
        # as a regression.  Its rows/s is recorded separately so the
        # warmup cost stays visible without haunting the median.
        win_runs: list[float] = []
        win_warmup = 0.0
        for run in range(n_runs + 1):
            stream = events_stream(spark, sf_dir, f"{stage}/in{run}", n_files=8)
            mark_load()
            t0 = time.perf_counter()
            q = (
                tumbling_counts(stream)
                .writeStream.format("noop")
                .option("checkpointLocation", f"{stage}/ckpt{run}")
                .outputMode("append")
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination(600)
            rps = round(n_rows / (time.perf_counter() - t0), 1)
            if run == 0:
                win_warmup = rps
            else:
                win_runs.append(rps)
        mark_load()
        stats.update(
            {
                "rows": n_rows,
                "rows_per_sec": median(win_runs),
                "rows_per_sec_runs": win_runs,
                "rows_per_sec_warmup_excluded": win_warmup,
            }
        )

        # ABSA pipeline throughput: serialized review envelopes -> parse ->
        # pandas_udf inference -> noop; the direct comparison point for the
        # reference's ~10 rows/s configured ceiling and 0.25 s/2-row batches.
        docs = load(spark, sf_dir, "documents").select(
            F.col("doc_id").cast("string").alias("id"), F.col("text").alias("review")
        )
        n_docs = docs.count()
        kafka_payload(docs).repartition(8).write.mode("overwrite").parquet(f"{stage}/absa_in")
        absa_runs: list[float] = []
        absa_warmup = 0.0
        for run in range(n_runs + 1):  # run 0 = excluded warmup, as above
            raw = (
                spark.readStream.schema("value binary")
                .option("maxFilesPerTrigger", 2)
                .parquet(f"{stage}/absa_in")
            )
            mark_load()
            t0 = time.perf_counter()
            q2 = (
                absa_transform(parse_envelope(raw, REVIEW_ENVELOPE))
                .writeStream.format("noop")
                .option("checkpointLocation", f"{stage}/absa_ckpt{run}")
                .outputMode("append")
                .trigger(availableNow=True)
                .start()
            )
            q2.awaitTermination(600)
            rps = round(n_docs / (time.perf_counter() - t0), 1)
            if run == 0:
                absa_warmup = rps
            else:
                absa_runs.append(rps)
        mark_load()
        stats.update(
            {
                "absa_rows": n_docs,
                "absa_rows_per_sec": median(absa_runs),
                "absa_rows_per_sec_runs": absa_runs,
                "absa_rows_per_sec_warmup_excluded": absa_warmup,
                # 10 samples: [before events warmup+run1..3, after events,
                #              before absa warmup+run1..3, after absa]
                "loadavg_1m_5m_15m": loadavg,
            }
        )
    finally:
        shutil.rmtree(stage, ignore_errors=True)
    return stats


def _infer_round_tag(repo: str) -> str:
    """Newest driver-recorded BENCH_rNN.json + 1 = the round being built.

    The driver writes BENCH_r{N}.json only at round close, so during round
    N the newest on disk is N-1 and this infers rN; a bench run can
    therefore never write a detail file for a round that already has a
    driver-recorded one.
    """
    import re

    rounds = [
        int(m.group(1))
        for p in os.listdir(repo)
        if (m := re.fullmatch(r"BENCH_r(\d+)\.json", p))
    ]
    return f"r{(max(rounds) + 1 if rounds else 1):02d}"


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(sf_dir.rstrip("/").split("sf")[-1])
    spark = get_spark("bench")

    specs = all_queries()
    # warm the JVM/codegen once with the flagship query, and the Python
    # worker pool once with a trivial Arrow roundtrip — so the first
    # Arrow-batched query in the suite isn't charged the one-time daemon
    # fork/import cost the rest of the suite then reuses
    specs["q09_pricing_summary"].fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
    # ... and touch every base table once so the first query to scan each
    # file measures the engine, not the OS page-cache fill (q01 sorts the
    # events table and sits first alphabetically — it was absorbing the
    # entire cold-read cost of events.parquet, ~2x its warm time at sf0.1)
    from bigdata_streaming_absa_vehicle_spark.tables import TABLE_NAMES, load

    for t in TABLE_NAMES:
        load(spark, sf_dir, t).write.mode("overwrite").format("noop").save()
    spark.range(1000).mapInPandas(
        lambda it: it, schema="id long"
    ).write.mode("overwrite").format("noop").save()
    # ... and the pandas_udf inference path (per-worker model cache): the
    # first ABSA query otherwise pays a second warm-up the suite never
    # re-pays (r2 verdict item — per-query fixed-overhead tail)
    specs["q60_absa_inference_batch"].fn(spark, "/root/testdata/sf0.001").write.mode(
        "overwrite"
    ).format("noop").save()
    # ... and the global-sort path (range-partitioner sampling + sort
    # codegen + the pin() localCheckpoint machinery): none of the warm-ups
    # above compiles a SortExec, so the alphabetically-first timed query
    # (q01, which ends in a pinned orderBy like every registry query) was
    # absorbing that one-time cost — 1.29 s vs ~0.2 s steady-state at sf0.1
    # (r4 verdict item 4).  Same codegen at sf0.001 compiles it for cents.
    specs["q01_projection"].fn(spark, "/root/testdata/sf0.001").write.mode(
        "overwrite"
    ).format("noop").save()

    # NOTE on table caching (r2 verdict suggestion, tried and rejected by
    # measurement): cache()+count() on every base table made the suite ~14%
    # SLOWER at sf0.1 — the InMemoryRelation defeats parquet column pruning
    # (narrow projections scan all cached columns) and skews join-size
    # estimates (q17 star join 1.0 s -> 5.3 s).  The parquet scans are
    # already OS-page-cached on the second read; keep the declarative scans.

    timings: dict[str, float] = {}
    for name in sorted(specs):
        df = specs[name].fn(spark, sf_dir)
        t0 = time.perf_counter()
        df.write.mode("overwrite").format("noop").save()
        timings[name] = round(time.perf_counter() - t0, 4)

    # Regression canary (r5 verdict item 4): the single-shot suite can be
    # skewed by transient machine contention (q31 read 8.5 s in the r5
    # driver bench vs 0.6 s on a quiet re-run of identical code).  For the
    # 20 slowest queries, take two more timed runs and record the
    # median-of-3 alongside the single shot, so the next outlier is
    # attributable the same day: contention shows up as single-shot >>
    # median; a real regression moves the median itself.
    top20 = [n for n, _ in sorted(timings.items(), key=lambda kv: -kv[1])[:20]]
    medians: dict[str, float] = {}
    for name in top20:
        runs = [timings[name]]
        for _ in range(2):
            df = specs[name].fn(spark, sf_dir)
            t0 = time.perf_counter()
            df.write.mode("overwrite").format("noop").save()
            runs.append(round(time.perf_counter() - t0, 4))
        medians[name] = sorted(runs)[1]

    try:
        stream_stats = streaming_throughput(spark, sf_dir)
    except Exception as e:  # the batch suite result must survive a streaming hiccup
        stream_stats = {"error": str(e)[:200]}

    total = round(sum(timings.values()), 4)
    detail = {
        "metric": "suite_wall_clock",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "top20_median_of_3": medians,
        "sf": sf,
        "streaming": stream_stats,
    }
    detail["date"] = time.strftime("%Y-%m-%d %H:%M:%S")
    repo = os.path.dirname(os.path.abspath(__file__))
    # rolling copy for quick diffing + a per-round copy that is never
    # overwritten by later rounds, so full per-query regression diffs stay
    # possible round-over-round (r4 verdict item 6: r4's rolling file
    # clobbered r3's and BENCH_r0N.json keeps only the top-3)
    # Round tag for the never-overwritten per-round copy.  When the env var
    # is absent, DERIVE it as newest driver-recorded BENCH_rNN.json + 1 (the
    # round currently being built) instead of a hard-coded default: r7's
    # stale "r06" literal let a default-env driver run clobber the r06
    # detail record (VERDICT r7 item 2).
    round_tag = os.environ.get("SPARK_GRAFT_ROUND") or _infer_round_tag(repo)
    # The committed quiet record is only written when the run is explicitly
    # declared a record run (SPARK_GRAFT_BENCH_RECORD=1).  Any other
    # invocation — in particular the driver's post-commit run, which lands
    # on a loaded machine and used to overwrite the committed quiet detail
    # three rounds running (VERDICT r7/r8/r9) — goes to a .driver.json side
    # file instead, so the clobber is now impossible by mechanism, not
    # convention (VERDICT r9 item 2).
    record_run = os.environ.get("SPARK_GRAFT_BENCH_RECORD") == "1"
    # smoke runs at other scale factors must not clobber the sf0.1 record
    # the round-over-round regression diffs read
    if sf != 0.1:
        detail_paths = (f"BENCH_DETAIL_sf{sf}.json",)
    elif record_run:
        detail_paths = ("BENCH_DETAIL.json", f"BENCH_DETAIL_{round_tag}.json")
    else:
        detail_paths = (f"BENCH_DETAIL_{round_tag}.driver.json",)
    for path in detail_paths:
        with open(os.path.join(repo, path), "w") as f:
            json.dump(detail, f, indent=1, sort_keys=True)

    # The driver captures only the tail of stdout, so the LAST line must be a
    # SHORT self-contained JSON summary (round 1 recorded parsed=null because
    # the full 74-entry timing dict blew past the capture window).  Per-query
    # detail lives in BENCH_DETAIL.json.
    slowest = sorted(timings.items(), key=lambda kv: -kv[1])[:3]
    summary = {
        "metric": "suite_wall_clock",
        "value": total,
        "unit": "sec",
        "sf": sf,
        "n_queries": len(timings),
        "queries": dict(slowest),  # slowest 3 first; extended below to fill
        # the driver's 2000-char stdout-tail budget (r12 verdict item 8:
        # PERF could compare only the 3 echoed queries; additions-only fix)
        "queries_detail": detail_paths[0],
        "record_run": record_run,
        "streaming_rows_per_sec": stream_stats.get("rows_per_sec"),
        "absa_rows_per_sec": stream_stats.get("absa_rows_per_sec"),
    }
    la = stream_stats.get("loadavg_1m_5m_15m") or []
    if la:
        # ambient-contention telemetry (r6 verdict item 2): 1-min loadavg
        # range across the streaming runs; full samples in BENCH_DETAIL
        summary["streaming_loadavg_1m_range"] = [
            min(x[0] for x in la), max(x[0] for x in la)
        ]
    # Extend `queries` (slowest first) while the LINE still fits the
    # driver's capture: it keeps only the last 2000 chars of stdout and
    # parses the JSON line inside that window, so a line that outgrows it
    # makes the whole bench read as parsed=null (the round-1 failure).
    # 1800 leaves slack for the trailing newline and field-width jitter.
    for name, secs in sorted(timings.items(), key=lambda kv: -kv[1])[3:]:
        summary["queries"][name] = secs
        if len(json.dumps(summary)) > 1800:
            del summary["queries"][name]
            break
    print(json.dumps(summary))
    spark.stop()


if __name__ == "__main__":
    main()
