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

    stats: dict[str, float] = {}
    n_rows = load(spark, sf_dir, "events").count()
    stage = tempfile.mkdtemp(prefix="bench_stream_")
    try:
        stream = events_stream(spark, sf_dir, f"{stage}/in", n_files=8)
        t0 = time.perf_counter()
        q = (
            tumbling_counts(stream)
            .writeStream.format("noop")
            .option("checkpointLocation", f"{stage}/ckpt")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(600)
        wall = time.perf_counter() - t0
        stats.update(
            {"rows": n_rows, "wall_s": round(wall, 4), "rows_per_sec": round(n_rows / wall, 1)}
        )

        # ABSA pipeline throughput: serialized review envelopes -> parse ->
        # pandas_udf inference -> noop; the direct comparison point for the
        # reference's ~10 rows/s configured ceiling and 0.25 s/2-row batches.
        docs = load(spark, sf_dir, "documents").select(
            F.col("doc_id").cast("string").alias("id"), F.col("text").alias("review")
        )
        n_docs = docs.count()
        kafka_payload(docs).repartition(8).write.mode("overwrite").parquet(f"{stage}/absa_in")
        raw = (
            spark.readStream.schema("value binary")
            .option("maxFilesPerTrigger", 2)
            .parquet(f"{stage}/absa_in")
        )
        t0 = time.perf_counter()
        q2 = (
            absa_transform(parse_envelope(raw, REVIEW_ENVELOPE))
            .writeStream.format("noop")
            .option("checkpointLocation", f"{stage}/absa_ckpt")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q2.awaitTermination(600)
        absa_wall = time.perf_counter() - t0
        stats.update(
            {
                "absa_rows": n_docs,
                "absa_wall_s": round(absa_wall, 4),
                "absa_rows_per_sec": round(n_docs / absa_wall, 1),
            }
        )
    finally:
        shutil.rmtree(stage, ignore_errors=True)
    return stats


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
    spark.range(1000).mapInPandas(
        lambda it: it, schema="id long"
    ).write.mode("overwrite").format("noop").save()

    timings: dict[str, float] = {}
    for name in sorted(specs):
        df = specs[name].fn(spark, sf_dir)
        t0 = time.perf_counter()
        df.write.mode("overwrite").format("noop").save()
        timings[name] = round(time.perf_counter() - t0, 4)

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
        "sf": sf,
        "streaming": stream_stats,
    }
    detail_path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_DETAIL.json")
    with open(detail_path, "w") as f:
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
        "queries": dict(slowest),  # slowest 3 only; full dict in BENCH_DETAIL.json
        "queries_detail": "BENCH_DETAIL.json",
        "streaming_rows_per_sec": stream_stats.get("rows_per_sec"),
        "absa_rows_per_sec": stream_stats.get("absa_rows_per_sec"),
    }
    print(json.dumps(summary))
    spark.stop()


if __name__ == "__main__":
    main()
