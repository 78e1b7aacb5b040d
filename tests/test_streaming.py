"""Streaming tests (SURVEY.md §5.2.2-3): every event-time op runs as a real
micro-batched stream (file replay, one file per trigger) and is compared to
its hash-verified batch twin; the kill/resume test reproduces the reference's
fault-injection scheme (simulated crash + checkpoint restart,
spark_kafka_consumer_dag.py:160-162) and asserts exactly-once output through
the idempotent sink.
"""

from __future__ import annotations

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from bigdata_streaming_absa_vehicle_spark.sources.files import events_stream
from bigdata_streaming_absa_vehicle_spark.streaming.event_time import (
    dedup_within_watermark,
    running_totals,
    session_counts,
    sliding_counts,
    tumbling_counts,
)
from bigdata_streaming_absa_vehicle_spark.streaming.sinks import idempotent_parquet_writer
from bigdata_streaming_absa_vehicle_spark.tables import load

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture()
def tmpdir():
    d = tempfile.mkdtemp(prefix="stream_test_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def run_to_memory(spark, stream_df, name, mode="complete"):
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.table(name)


def as_sorted_rows(df, cols):
    return sorted(tuple(r) for r in df.select(*cols).collect())


def test_tumbling_stream_equals_batch_twin(spark, tmpdir):
    stream = events_stream(spark, SF_DIR, f"{tmpdir}/stage", n_files=6)
    result = run_to_memory(spark, tumbling_counts(stream), "tumbling_t")
    batch = tumbling_counts(load(spark, SF_DIR, "events"))
    cols = ["window_start", "window_end", "event_type", "n_events", "total_value"]
    assert as_sorted_rows(result, cols) == as_sorted_rows(batch, cols)


def test_sliding_stream_equals_batch_twin(spark, tmpdir):
    stream = events_stream(spark, SF_DIR, f"{tmpdir}/stage", n_files=4)
    result = run_to_memory(spark, sliding_counts(stream), "sliding_t")
    batch = sliding_counts(load(spark, SF_DIR, "events"))
    cols = ["window_start", "window_end", "n_events"]
    assert as_sorted_rows(result, cols) == as_sorted_rows(batch, cols)


def test_session_stream_equals_batch_twin(spark, tmpdir):
    stream = events_stream(spark, SF_DIR, f"{tmpdir}/stage", n_files=4)
    result = run_to_memory(spark, session_counts(stream), "session_t")
    batch = session_counts(load(spark, SF_DIR, "events"))
    cols = ["session_start", "session_end", "user_id", "n_events"]
    assert as_sorted_rows(result, cols) == as_sorted_rows(batch, cols)


def test_append_mode_watermark_completeness(spark, tmpdir):
    """Append mode emits only watermark-closed windows; everything emitted
    must match the batch twin exactly, and all windows older than
    (max_ts - watermark) must have been emitted (T-09 late-data contract)."""
    stream = events_stream(spark, SF_DIR, f"{tmpdir}/stage", n_files=6)
    emitted = run_to_memory(
        spark, tumbling_counts(stream, watermark="10 minutes"), "append_t", mode="append"
    )
    batch = tumbling_counts(load(spark, SF_DIR, "events"))
    cols = ["window_start", "window_end", "event_type", "n_events", "total_value"]
    emitted_rows = set(as_sorted_rows(emitted, cols))
    batch_rows = set(as_sorted_rows(batch, cols))
    assert emitted_rows <= batch_rows, "append emitted a window that disagrees with batch"
    max_ts = load(spark, SF_DIR, "events").agg(F.max("ts")).collect()[0][0]
    import datetime

    # margin: a window whose end sits exactly at the final watermark may be
    # legitimately held until a next (never-arriving) trigger
    closed_before = max_ts - datetime.timedelta(minutes=11)
    must_emit = {r for r in batch_rows if r[1] < closed_before}
    assert must_emit <= emitted_rows, "a closed window was never emitted"


def test_stateful_dedup_within_watermark(spark, tmpdir):
    """T-08: duplicated sends (the producer-retry scenario) collapse to one
    row per event_id."""
    ev = load(spark, SF_DIR, "events")
    doubled = ev.unionByName(ev)  # every event sent twice
    doubled.repartition(6).write.mode("overwrite").parquet(f"{tmpdir}/stage")
    stream = (
        spark.readStream.schema(ev.schema).option("maxFilesPerTrigger", 1).parquet(f"{tmpdir}/stage")
    )
    deduped = dedup_within_watermark(stream, ["event_id"], watermark="30 days")
    out = f"{tmpdir}/out"
    q = (
        deduped.writeStream.foreachBatch(idempotent_parquet_writer(out))
        .option("checkpointLocation", f"{tmpdir}/ckpt")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.read.parquet(out)
    n_distinct = ev.select("event_id").distinct().count()
    assert got.count() == n_distinct
    assert got.select("event_id").distinct().count() == n_distinct


def test_stream_static_join(spark, tmpdir):
    """J-08: streaming events enriched against a static dimension — same
    result as the batch join."""
    stream = events_stream(spark, SF_DIR, f"{tmpdir}/stage", n_files=4)
    dim = spark.createDataFrame(
        [(i, f"user_{i}", "vip" if i % 3 == 0 else "std") for i in range(15)],
        "user_id long, user_name string, tier string",
    )
    joined = (
        stream.join(F.broadcast(dim), "user_id")
        .groupBy("tier")
        .agg(F.count("*").alias("n"))
    )
    result = run_to_memory(spark, joined, "ssjoin_t")
    batch = (
        load(spark, SF_DIR, "events")
        .join(dim, "user_id")
        .groupBy("tier")
        .agg(F.count("*").alias("n"))
    )
    assert as_sorted_rows(result, ["tier", "n"]) == as_sorted_rows(batch, ["tier", "n"])


def test_running_totals_stateful(spark, tmpdir):
    """T-10: applyInPandasWithState running totals — the final per-user state
    must equal the batch groupBy."""
    stream = events_stream(spark, SF_DIR, f"{tmpdir}/stage", n_files=5)
    totals = running_totals(stream)
    q = (
        totals.writeStream.format("memory")
        .queryName("running_t")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    # update mode re-emits a row per batch; the LAST emit per user is the total
    final = (
        spark.table("running_t")
        .groupBy("user_id")
        .agg(F.max("n_events").alias("n_events"), F.max("total_value").alias("total_value"))
    )
    batch = running_totals(load(spark, SF_DIR, "events"))
    cols = ["user_id", "n_events", "total_value"]
    assert as_sorted_rows(final, cols) == as_sorted_rows(batch, cols)


def test_processing_time_trigger(spark, tmpdir):
    """T-01: the reference's 5 s processing-time cadence
    (spark_kafka_consumer_dag.py:187) — a short-cadence trigger fires
    repeatedly and drains the staged files without availableNow."""
    ev = load(spark, SF_DIR, "events").limit(200)
    ev.repartition(2).write.mode("overwrite").parquet(f"{tmpdir}/stage")
    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{tmpdir}/stage")
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("pt_trigger_t")
        .outputMode("append")
        .trigger(processingTime="1 second")
        .start()
    )
    try:
        import time

        deadline = time.time() + 60
        while time.time() < deadline and spark.table("pt_trigger_t").count() < 200:
            time.sleep(1)
        assert spark.table("pt_trigger_t").count() == 200
        assert len(q.recentProgress) >= 2, "processing-time trigger should fire per batch"
    finally:
        q.stop()


def test_console_preview_sink(spark, capsys):
    """S-06: the per-batch preview the reference prints
    (spark_kafka_consumer_dag.py:156-157)."""
    from bigdata_streaming_absa_vehicle_spark.streaming.sinks import console_preview_writer

    df = load(spark, SF_DIR, "events").limit(3)
    console_preview_writer(num_rows=2)(df, 7)
    out = capsys.readouterr().out
    assert "[batch 7] 3 rows" in out


def test_absa_pipeline_end_to_end_stream(spark, tmpdir):
    """SURVEY §3.1 as a live stream: documents -> kafka-shaped JSON envelope
    (the producer serialization, S-07) -> micro-batched replay -> parse ->
    normalize -> pandas_udf inference -> idempotent sink. The sink contents
    must equal the batch twin (q60's transform), which is itself
    oracle-hash-checked — transitive correctness for the full streaming graph."""
    from pyspark.sql import functions as F

    from bigdata_streaming_absa_vehicle_spark.schemas import REVIEW_ENVELOPE
    from bigdata_streaming_absa_vehicle_spark.sources.kafka import kafka_payload, parse_envelope
    from bigdata_streaming_absa_vehicle_spark.streaming.pipelines import absa_transform

    docs = load(spark, SF_DIR, "documents").select(
        F.col("doc_id").cast("string").alias("id"), F.col("text").alias("review")
    )
    # producer side: serialize to the kafka value envelope, stage as files
    kafka_payload(docs).repartition(4).write.mode("overwrite").parquet(f"{tmpdir}/stage")
    raw = (
        spark.readStream.schema("value binary")
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{tmpdir}/stage")
    )
    result = absa_transform(parse_envelope(raw, REVIEW_ENVELOPE), model_version="v0")
    out = f"{tmpdir}/out"
    q = (
        result.writeStream.foreachBatch(idempotent_parquet_writer(out))
        .option("checkpointLocation", f"{tmpdir}/ckpt")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.read.parquet(out).drop("batch_id")
    batch = absa_transform(docs, model_version="v0")
    cols = sorted(batch.columns)
    assert as_sorted_rows(got, cols) == as_sorted_rows(batch, cols)


def test_vehicle_pipeline_end_to_end_stream(spark, tmpdir):
    """SURVEY §3.2 as a live stream: frame envelopes -> replay -> parse ->
    deterministic detection -> vehicle_counts rows -> idempotent sink; sink
    equals the oracle-hash-checked batch twin (q62's transform)."""
    from pyspark.sql import functions as F

    from bigdata_streaming_absa_vehicle_spark.schemas import FRAME_ENVELOPE
    from bigdata_streaming_absa_vehicle_spark.sources.kafka import kafka_payload, parse_envelope
    from bigdata_streaming_absa_vehicle_spark.streaming.pipelines import vehicle_transform

    ev = load(spark, SF_DIR, "events")
    envelope = ev.select(
        F.concat(F.lit("CAM_"), (F.col("user_id") % 2).cast("string")).alias("camera_id"),
        F.unix_timestamp("ts").cast("double").alias("timestamp"),
        F.base64(F.col("props").cast("binary")).alias("frame_data"),
    )
    kafka_payload(envelope).repartition(4).write.mode("overwrite").parquet(f"{tmpdir}/stage")
    raw = (
        spark.readStream.schema("value binary")
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{tmpdir}/stage")
    )
    result = vehicle_transform(parse_envelope(raw, FRAME_ENVELOPE)).drop("processed_at")
    out = f"{tmpdir}/out"
    q = (
        result.writeStream.foreachBatch(idempotent_parquet_writer(out))
        .option("checkpointLocation", f"{tmpdir}/ckpt")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.read.parquet(out).drop("batch_id")
    batch = vehicle_transform(envelope).drop("processed_at")
    cols = sorted(batch.columns)
    assert as_sorted_rows(got, cols) == as_sorted_rows(batch, cols)


def test_stream_stream_interval_join(spark, tmpdir):
    """J-10 (extension): watermarked stream-stream join — purchases matched
    to the same user's clicks within the preceding 10 minutes, both sides
    replayed as real micro-batched streams. Emitted pairs must be a subset of
    the batch interval join and must cover every pair watermark-closed before
    end of input."""
    from pyspark.sql import functions as F

    ev = load(spark, SF_DIR, "events")
    clicks_b = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("cu"), F.col("ts").alias("click_ts"), F.col("event_id").alias("click_id")
    )
    buys_b = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("bu"), F.col("ts").alias("buy_ts"), F.col("event_id").alias("buy_id")
    )

    from bigdata_streaming_absa_vehicle_spark.sources.files import replay_as_stream

    # quasi-ordered replay (range-partitioned on event time) — a shuffled
    # replay would advance the watermark to ~max on the first batch and
    # declare everything after it late
    clicks = replay_as_stream(
        spark, clicks_b, f"{tmpdir}/clicks", n_files=4, order_col="click_ts"
    ).withWatermark("click_ts", "30 minutes")
    buys = replay_as_stream(
        spark, buys_b, f"{tmpdir}/buys", n_files=4, order_col="buy_ts"
    ).withWatermark("buy_ts", "30 minutes")
    cond = (
        (F.col("cu") == F.col("bu"))
        & (F.col("click_ts") <= F.col("buy_ts"))
        & (F.col("click_ts") >= F.col("buy_ts") - F.expr("INTERVAL 120 MINUTES"))
    )
    joined = clicks.join(buys, cond).select("buy_id", "click_id", "buy_ts")
    result = run_to_memory(spark, joined, "ssj_t", mode="append")
    # the batch side is the driver-hash-checked twin q77 (same pair
    # predicate), so this PROP test anchors to HASH-verified semantics
    from bigdata_streaming_absa_vehicle_spark.queries import all_queries

    batch = all_queries()["q77_interval_join_batch"].fn(spark, SF_DIR)
    got = set(as_sorted_rows(result, ["buy_id", "click_id"]))
    want_rows = batch.collect()
    want = {(r.buy_id, r.click_id) for r in want_rows}
    assert got <= want, "stream-stream join emitted a pair the batch join does not have"
    # append emits a pair once BOTH sides pass the watermark; pairs whose
    # buy_ts sits within (watermark + interval + margin) of end-of-input may
    # legitimately still be buffered when the replay stops
    import datetime

    max_ts = ev.agg(F.max("ts")).collect()[0][0]
    closed_before = max_ts - datetime.timedelta(minutes=30 + 120 + 30)
    must_emit = {(r.buy_id, r.click_id) for r in want_rows if r.buy_ts < closed_before}
    assert must_emit <= got, (
        f"stream-stream join never emitted closed pairs: {sorted(must_emit - got)}"
    )


def test_kill_resume_exactly_once(spark, tmpdir):
    """T-04/S-09: crash mid-stream (the reference's simulated crash,
    spark_kafka_consumer_dag.py:160-162), restart from the checkpoint, and
    assert the idempotent sink holds exactly-once row counts."""
    ev = load(spark, SF_DIR, "events")
    ev.repartition(8).write.mode("overwrite").parquet(f"{tmpdir}/stage")
    out, ckpt = f"{tmpdir}/out", f"{tmpdir}/ckpt"
    sink = idempotent_parquet_writer(out)

    crashed = {"yes": False}

    def crashing_sink(batch_df, batch_id):
        if batch_id == 2 and not crashed["yes"]:
            crashed["yes"] = True
            sink(batch_df, batch_id)  # write THEN crash: replay must not duplicate
            raise RuntimeError("Simulated crash at batch 2")
        sink(batch_df, batch_id)

    def start(fn):
        return (
            spark.readStream.schema(ev.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(f"{tmpdir}/stage")
            .writeStream.foreachBatch(fn)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )

    q = start(crashing_sink)
    with pytest.raises(Exception, match="Simulated crash|STREAM_FAILED"):
        q.awaitTermination(120)
    assert crashed["yes"]

    q2 = start(sink)  # restart from checkpoint, healthy sink
    q2.awaitTermination(120)

    got = spark.read.parquet(out)
    assert got.count() == ev.count(), "crash+resume lost or duplicated rows"
    assert got.select("event_id").distinct().count() == ev.count()


def test_sessionize_stream_equals_batch(spark, tmpdir):
    """T-10/X-08: streaming gaps-and-islands sessionization must emit
    exactly the batch twin's sessions. A far-future flush event per user
    closes every real trailing session deterministically (the flush events'
    own sessions stay open in state and are never emitted)."""
    from bigdata_streaming_absa_vehicle_spark.queries.analytics import sessionize_events
    from bigdata_streaming_absa_vehicle_spark.sources.files import replay_as_stream
    from bigdata_streaming_absa_vehicle_spark.streaming.event_time import (
        sessionize_stream,
    )

    ev = load(spark, SF_DIR, "events").select("event_id", "user_id", "ts")
    flush = (
        ev.groupBy("user_id")
        .agg(F.max("ts").alias("mx"), F.max("event_id").alias("me"))
        .select(
            (F.col("me") + 10_000_000).alias("event_id"),
            "user_id",
            (F.col("mx") + F.expr("INTERVAL 10 DAYS")).alias("ts"),
        )
    )
    # flush must be later than EVERY user's last event AND the global
    # watermark path is irrelevant (NoTimeout) — per-user max + 10 days is
    # far beyond the 30-minute gap
    stream = replay_as_stream(
        spark, ev.unionByName(flush), f"{tmpdir}/stage", n_files=6, order_col="ts"
    )
    q = (
        sessionize_stream(stream, 30)
        .writeStream.format("memory")
        .queryName("sessions_s")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = spark.table("sessions_s")
    want = sessionize_events(ev, 30)
    cols = ["user_id", "session_idx", "n_events", "session_start", "duration_us"]
    assert as_sorted_rows(got, cols) == as_sorted_rows(want, cols)


def test_cms_cells_merge_across_microbatches(spark, tmpdir):
    """A-15 mergeability, streaming form: Count-Min cells built per
    micro-batch and SUMMED across batches must equal the cells built over
    the whole table in one pass — the property that lets a streaming
    pipeline maintain a frequency sketch incrementally (same statement
    q114 makes for exact aggregates and q90 for HLL)."""
    from collections import Counter

    from bigdata_streaming_absa_vehicle_spark.queries.profiling import cms_cells
    from bigdata_streaming_absa_vehicle_spark.tables import load

    merged: Counter = Counter()

    def fn(batch_df, _bid):
        for r in cms_cells(batch_df.select("event_type"), "event_type").collect():
            merged[(r.i, r.cell)] += r.c

    stream = events_stream(spark, SF_DIR, f"{tmpdir}/stage", n_files=5)
    q = (
        stream.writeStream.foreachBatch(fn)
        .option("checkpointLocation", f"{tmpdir}/ckpt")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    whole = {
        (r.i, r.cell): r.c
        for r in cms_cells(
            load(spark, SF_DIR, "events").select("event_type"), "event_type"
        ).collect()
    }
    assert dict(merged) == whole


def test_changelog_compaction_stream_equals_batch(spark, tmpdir):
    """X-13 (q150) streaming twin: keep-latest-per-key is expressible as a
    built-in streaming max(struct(ts, event_id, ...)) aggregate in update
    mode — no custom state code — and the drained stream's final state
    must equal the q150 batch compaction (same (ts, event_id) total
    order, same delete-tombstone semantics)."""
    from bigdata_streaming_absa_vehicle_spark.queries import all_queries

    stream = events_stream(spark, SF_DIR, f"{tmpdir}/stage", n_files=5)
    latest = stream.groupBy("user_id").agg(
        F.max(
            F.struct(
                "ts",
                "event_id",
                F.when(F.col("event_type") == "error", "D").otherwise("U").alias("op"),
                "value",
            )
        ).alias("last"),
        F.count(F.lit(1)).alias("n_changes"),
    )
    q = (
        latest.writeStream.format("memory")
        .queryName("compact_t")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    final = (
        spark.table("compact_t")
        .groupBy("user_id")
        .agg(F.max("last").alias("last"), F.max("n_changes").alias("n_changes"))
        .filter(F.col("last.op") != "D")
        .select(
            "user_id",
            F.col("last.ts").alias("last_ts"),
            F.col("last.value").alias("current_value"),
            "n_changes",
        )
    )
    batch = all_queries()["q150_changelog_compaction"].fn(spark, SF_DIR)
    cols = ["user_id", "last_ts", "current_value", "n_changes"]
    assert as_sorted_rows(final, cols) == as_sorted_rows(batch, cols)


def test_checksum_stream_equals_batch(spark, tmpdir):
    """X-24 (q164) streaming twin: the order-independent checksum is ONE
    mergeable ungrouped aggregate, so the same events_checksum() code
    path drains a file-replayed stream (complete mode) to exactly the
    batch table's (n_rows, checksum) — arrival order, file split, and
    partitioning provably cannot change the fingerprint."""
    from bigdata_streaming_absa_vehicle_spark.queries.audit import events_checksum

    stream = events_stream(spark, SF_DIR, f"{tmpdir}/stage", n_files=5)
    result = run_to_memory(spark, events_checksum(stream), "checksum_t")
    batch = events_checksum(load(spark, SF_DIR, "events"))
    cols = ["n_rows", "checksum"]
    assert as_sorted_rows(result, cols) == as_sorted_rows(batch, cols)


def test_hdr_histogram_stream_equals_batch(spark, tmpdir):
    """X-40 (q200) streaming twin: the quantile sketch's state is ONE
    mergeable groupBy of integer bucket counts, so the same
    hdr_histogram() code path drains a file-replayed stream (complete
    mode) to exactly the batch table's histogram — arrival order, file
    split, and partitioning provably cannot change the sketch, which is
    what makes its quantiles maintainable by a streaming agg."""
    from bigdata_streaming_absa_vehicle_spark.queries.profiling import hdr_histogram

    stream = events_stream(spark, SF_DIR, f"{tmpdir}/stage", n_files=5)
    result = run_to_memory(spark, hdr_histogram(stream), "hdr_t")
    batch = hdr_histogram(load(spark, SF_DIR, "events"))
    cols = ["event_type", "lb", "cnt"]
    assert as_sorted_rows(result, cols) == as_sorted_rows(batch, cols)


def test_stream_stream_left_outer_interval_join(spark, tmpdir):
    """J-10 (extension): the LEFT OUTER watermarked stream-stream join —
    purchases with no click in the preceding 120 minutes must still emit,
    with NULL click columns, once the watermark closes their interval
    (the semantics an enrichment pipeline needs so unmatched facts are
    never silently dropped). Matched pairs anchor to the HASH-verified
    q77 batch twin; null rows must be exactly the batch anti-join side
    for every watermark-closed purchase."""
    import datetime

    from pyspark.sql import functions as F

    from bigdata_streaming_absa_vehicle_spark.queries import all_queries
    from bigdata_streaming_absa_vehicle_spark.sources.files import replay_as_stream

    ev = load(spark, SF_DIR, "events")
    clicks_b = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("cu"),
        F.col("ts").alias("click_ts"),
        F.col("event_id").alias("click_id"),
    )
    buys_b = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("bu"),
        F.col("ts").alias("buy_ts"),
        F.col("event_id").alias("buy_id"),
    )
    clicks = replay_as_stream(
        spark, clicks_b, f"{tmpdir}/loclicks", n_files=4, order_col="click_ts"
    ).withWatermark("click_ts", "30 minutes")
    buys = replay_as_stream(
        spark, buys_b, f"{tmpdir}/lobuys", n_files=4, order_col="buy_ts"
    ).withWatermark("buy_ts", "30 minutes")
    cond = (
        (F.col("cu") == F.col("bu"))
        & (F.col("click_ts") <= F.col("buy_ts"))
        & (F.col("click_ts") >= F.col("buy_ts") - F.expr("INTERVAL 120 MINUTES"))
    )
    joined = buys.join(clicks, cond, "leftOuter").select(
        "buy_id", "click_id", "buy_ts"
    )
    result = run_to_memory(spark, joined, "ssloj_t", mode="append")

    batch = all_queries()["q77_interval_join_batch"].fn(spark, SF_DIR)
    want_rows = batch.collect()
    want_pairs = {(r.buy_id, r.click_id) for r in want_rows}
    matched_buys = {r.buy_id for r in want_rows}
    all_buys = {r.buy_id for r in buys_b.select("buy_id").collect()}

    out = result.collect()
    got_pairs = {(r.buy_id, r.click_id) for r in out if r.click_id is not None}
    got_nulls = {r.buy_id for r in out if r.click_id is None}
    assert got_pairs <= want_pairs, "left-outer emitted a pair the batch join lacks"
    # a NULL row may only appear for a purchase the batch join cannot match
    assert got_nulls <= (all_buys - matched_buys), (
        "left-outer emitted NULL for a purchase that HAS a click match"
    )
    # completeness: every purchase closed well before end-of-input emitted
    # exactly once — matched with its pairs, or as one NULL row
    max_ts = ev.agg(F.max("ts")).collect()[0][0]
    closed_before = max_ts - datetime.timedelta(minutes=30 + 120 + 30)
    closed = {
        r.buy_id
        for r in buys_b.select("buy_id", "buy_ts").collect()
        if r.buy_ts < closed_before
    }
    emitted = got_nulls | {b for b, _ in got_pairs}
    missing = closed - emitted
    assert not missing, f"closed purchases never emitted: {sorted(missing)[:10]}"
    # and no purchase emits BOTH a match and a NULL row
    assert not (got_nulls & {b for b, _ in got_pairs})


def test_msprt_user_state_stream_equals_batch(spark, tmpdir):
    """X-101 (q311) streaming twin: the sequential monitor's state is a
    per-user (first day, arm, converted) aggregate — expressible as a
    built-in streaming groupBy in update mode. The drained stream's
    final state, rolled into per-day cumulative arm stats, must equal
    the q311 batch monitor's count columns exactly (the Lambda and
    always-valid p derive deterministically from them)."""
    from bigdata_streaming_absa_vehicle_spark.queries import all_queries
    from bigdata_streaming_absa_vehicle_spark.queries.evaluation import (
        _ARM_EXPR,
        _CONV_MIN,
    )
    from pyspark.sql.window import Window as W

    stream = events_stream(spark, SF_DIR, f"{tmpdir}/stage", n_files=5)
    day = F.expr(
        "CAST(FLOOR(unix_timestamp(date_trunc('day', ts)) / 86400) AS BIGINT)"
    )
    conv = F.when(
        (F.col("event_type") == "purchase") & (F.col("value") > _CONV_MIN), 1
    ).otherwise(0)
    u = stream.groupBy("user_id").agg(
        F.min(day).alias("d0"), F.max(conv).alias("conv")
    )
    raw = run_to_memory(spark, u, "msprt_state_t", mode="update")
    # update mode re-emits a key on every refinement; final state per user
    state = raw.groupBy("user_id").agg(
        F.min("d0").alias("d0"), F.max("conv").alias("conv")
    )
    state = state.select(
        "d0", "conv", F.expr(_ARM_EXPR.format(t="STRING")).alias("arm")
    )
    byday = state.groupBy(F.col("d0").alias("day")).agg(
        F.sum(F.when(F.col("arm") == "a", 1).otherwise(0)).alias("ua"),
        F.sum(F.when(F.col("arm") == "a", F.col("conv")).otherwise(0)).alias("ca"),
        F.sum(F.when(F.col("arm") == "b", 1).otherwise(0)).alias("ub"),
        F.sum(F.when(F.col("arm") == "b", F.col("conv")).otherwise(0)).alias("cb"),
    )
    w = W.orderBy("day").rowsBetween(W.unboundedPreceding, 0)
    stream_cum = byday.select(
        "day",
        F.sum("ua").over(w).cast("long").alias("n_a"),
        F.sum("ca").over(w).cast("long").alias("conv_a"),
        F.sum("ub").over(w).cast("long").alias("n_b"),
        F.sum("cb").over(w).cast("long").alias("conv_b"),
    )
    batch = all_queries()["q311_msprt_monitor"].fn(spark, SF_DIR)
    cols = ["day", "n_a", "conv_a", "n_b", "conv_b"]
    assert as_sorted_rows(stream_cum, cols) == as_sorted_rows(batch, cols)


def test_slo_hourly_counts_stream_equals_batch(spark, tmpdir):
    """X-24 (q355) streaming twin: the burn-rate readout's state is ONE
    mergeable hourly (errors, total) groupBy, so the same
    hourly_error_counts() code path drains a file-replayed stream
    (complete mode) to exactly the batch table's hourly relation — the
    trailing-window burn computation then runs per micro-batch on that
    bounded state, which is what makes the SRE alert streamable."""
    from bigdata_streaming_absa_vehicle_spark.queries.timeseries import (
        hourly_error_counts,
    )

    stream = events_stream(spark, SF_DIR, f"{tmpdir}/stage", n_files=5)
    result = run_to_memory(spark, hourly_error_counts(stream), "slo_t")
    batch = hourly_error_counts(load(spark, SF_DIR, "events"))
    cols = ["h", "errors", "total"]
    assert as_sorted_rows(result, cols) == as_sorted_rows(batch, cols)


def test_pixel_decode_stream_equals_batch(spark, tmpdir):
    """S-08 streaming twin: decode_image_pixels is a stateless Arrow-batched
    map, so the SAME operator drains a file-replayed media stream (append
    mode) to exactly the batch relation — PNG (sequential, Adam7-paletted
    with tRNS, 1-bit grey), grayscale/color/progressive JPEG (incl. 4:1:1)
    and BMP payloads decode identically under any micro-batch split, and
    undecodable payloads drop in both modes without killing a task."""
    from bigdata_streaming_absa_vehicle_spark.operators.imagecodec import encode_bmp24
    from bigdata_streaming_absa_vehicle_spark.operators.jpegcodec import (
        encode_jpeg_color,
        encode_jpeg_gray,
        encode_jpeg_progressive_gray,
    )
    from bigdata_streaming_absa_vehicle_spark.operators.multimodal import (
        decode_image_pixels,
    )
    from bigdata_streaming_absa_vehicle_spark.operators.pngcodec import (
        encode_png,
        encode_png_indexed,
    )

    rows = []
    for i in range(32):
        kind = i % 8
        if kind == 0:
            w, h = 3 + i % 5, 2 + i % 3
            px = bytes((11 * i + 3 * j) % 256 for j in range(w * h * 3))
            payload = encode_png(w, h, px, channels=3, filters=[(i + y) % 5 for y in range(h)])
        elif kind == 1:
            w, h = 8 * (i % 3 + 1), 8
            px = bytes([100 + i]) * (w * h)  # constant: exact JPEG roundtrip
            payload = encode_jpeg_gray(w, h, px)
        elif kind == 2:
            w, h = 16, 16
            y = bytes([90 + i]) * (w * h)
            c = bytes([128]) * (w // 2 * h // 2)
            payload = encode_jpeg_color(w, h, y, c, c, subsample="420")
        elif kind == 3:
            w, h = 4 + i % 3, 3
            px = bytes((7 * i + j) % 256 for j in range(w * h * 3))
            payload = encode_bmp24(w, h, px)
        elif kind == 4:
            # Adam7-interlaced 2-bit paletted with tRNS alpha (r8 paths)
            w, h = 5 + i % 4, 4
            pal = [((13 * i + 7 * p) % 256, (5 * p) % 256, p * 40 % 256) for p in range(4)]
            idx = bytes((i + j) % 4 for j in range(w * h))
            payload = encode_png_indexed(
                w, h, idx, pal, depth=2, interlace=True, trns=bytes([255, 128, 0])
            )
        elif kind == 5:
            w, h = 9, 3 + i % 4  # 1-bit greyscale
            bits = bytes((i + j) % 2 for j in range(w * h))
            payload = encode_png(w, h, bits, channels=1, depth=1, filters=2)
        elif kind == 6:
            w, h = 16, 8  # progressive grayscale (SOF2)
            px = bytes([60 + i]) * (w * h)
            payload = encode_jpeg_progressive_gray(w, h, px)
        else:
            payload = b"\x00garbage payload %d" % i  # must drop, both modes
        rows.append((i, payload))

    media_batch = spark.createDataFrame(rows, "doc_id long, payload binary")
    stage = f"{tmpdir}/media"
    media_batch.repartition(6).write.mode("overwrite").parquet(stage)
    stream = (
        spark.readStream.schema("doc_id long, payload binary")
        .option("maxFilesPerTrigger", 1)
        .parquet(stage)
    )
    result = run_to_memory(spark, decode_image_pixels(stream), "pixdec_t", mode="append")
    batch = decode_image_pixels(media_batch)
    cols = ["doc_id", "width", "height", "n_channels", "mean_intensity"]
    got, want = as_sorted_rows(result, cols), as_sorted_rows(batch, cols)
    assert got == want
    assert len(got) == 32 - 4  # the four i%8==7 garbage payloads drop
