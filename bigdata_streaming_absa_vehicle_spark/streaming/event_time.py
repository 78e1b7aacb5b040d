"""Event-time operators (SURVEY.md T-05..T-10): tumbling/sliding/session
windows with watermarks, stateful dedup, and arbitrary stateful processing.

The reference computes its per-minute trend in the dashboard AFTER the sink
(vehicle streamlit_app.py:111-124) and has no withWatermark anywhere; here the
same aggregations run in-stream with bounded state. Every operator has a
batch twin (same function, batch DataFrame in) registered with a DuckDB
oracle — the streaming run is then compared against the hash-verified batch
twin (tests/test_streaming.py), the SURVEY §5.2.2 batch-equivalence scheme.

Scale notes: watermarks bound state eviction; the session factory pins the
RocksDB state store so state spills off-heap; window aggs are partial+final
like any groupBy (shuffle carries one row per open (key, window)).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.deterministic import dsum

DEFAULT_WATERMARK = "10 minutes"


def tumbling_counts(
    events: DataFrame,
    window_size: str = "1 minute",
    watermark: str | None = DEFAULT_WATERMARK,
    key: str = "event_type",
) -> DataFrame:
    """T-05: per-(window, key) counts + value sum. Works on a streaming or a
    batch DataFrame — the batch form is the hash-checked twin."""
    src = events.withWatermark("ts", watermark) if watermark and events.isStreaming else events
    return (
        src.groupBy(F.window("ts", window_size).alias("win"), key)
        .agg(F.count("*").alias("n_events"), dsum("value").alias("total_value"))
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            key,
            "n_events",
            "total_value",
        )
    )


def sliding_counts(
    events: DataFrame,
    window_size: str = "10 minutes",
    slide: str = "1 minute",
    watermark: str | None = DEFAULT_WATERMARK,
) -> DataFrame:
    """T-06: sliding windows (each event lands in size/slide windows)."""
    src = events.withWatermark("ts", watermark) if watermark and events.isStreaming else events
    return (
        src.groupBy(F.window("ts", window_size, slide).alias("win"))
        .agg(F.count("*").alias("n_events"))
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "n_events",
        )
    )


def session_counts(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark: str | None = DEFAULT_WATERMARK,
    key: str = "user_id",
) -> DataFrame:
    """T-07: session windows per key (gap-based)."""
    src = events.withWatermark("ts", watermark) if watermark and events.isStreaming else events
    return (
        src.groupBy(F.session_window("ts", gap).alias("win"), key)
        .agg(F.count("*").alias("n_events"))
        .select(
            F.col("win.start").alias("session_start"),
            F.col("win.end").alias("session_end"),
            key,
            "n_events",
        )
    )


def dedup_within_watermark(
    events: DataFrame, keys: list[str] | None = None, watermark: str = DEFAULT_WATERMARK
) -> DataFrame:
    """T-08: stateful dedup for at-least-once producers (the reference's
    producer retries=3 can duplicate sends, vehicle_producer_single.py:92).
    State is evicted once the watermark passes — bounded memory."""
    keys = keys or ["event_id"]
    if events.isStreaming:
        return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(keys)
    return events.dropDuplicates(keys)


#: output schema of running_totals
RUNNING_TOTALS_SCHEMA = "user_id long, n_events long, total_value double"


def running_totals(events: DataFrame) -> DataFrame:
    """T-10: arbitrary stateful op — running per-user totals across batches
    via applyInPandasWithState (RocksDB-backed at scale). The batch twin is a
    plain groupBy, which the equivalence test compares against."""
    if not events.isStreaming:
        return events.groupBy("user_id").agg(
            F.count("*").alias("n_events"), dsum("value").alias("total_value")
        )

    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            # cents-exact accumulation mirroring the batch twin's
            # decimal(28,2) cast, which rounds HALF-UP (away from zero) —
            # pandas' .round() is half-even and diverges on exact half-cents
            # (e.g. 0.125 -> 12 vs the decimal cast's 13)
            import numpy as np

            v = pdf["value"].to_numpy()
            cents = np.sign(v) * np.floor(np.abs(v) * 100.0 + 0.5)
            total += int(cents.sum())
        state.update((n, int(total)))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "total_value": [total / 100.0]}
        )

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=RUNNING_TOTALS_SCHEMA,
        stateStructType="n long, total long",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


#: output schema of sessionize_stream (matches the q91 batch columns)
SESSIONIZE_SCHEMA = (
    "user_id long, session_idx long, n_events long, "
    "session_start timestamp, duration_us long"
)


def sessionize_stream(events: DataFrame, gap_min: int = 30) -> DataFrame:
    """Streaming gaps-and-islands sessionization — the applyInPandasWithState
    twin of queries/analytics.sessionize_events (q91): per-user session ids
    assigned incrementally across micro-batches, each CLOSED session emitted
    exactly once the moment an event lands more than `gap_min` past the
    session's last event.

    State per user is four longs (open-session idx/start/last/count) — a
    RocksDB-backed skew-proof footprint; emission is append-mode (closed
    sessions are immutable facts). A session still open when the stream
    pauses stays in state and closes on the next qualifying event, so
    replay/resume never double-emits (exactly-once via the checkpoint as
    usual). The stream-equals-batch test closes trailing sessions with a
    far-future flush event per user and compares against the hash-checked
    q91 batch twin."""
    if not events.isStreaming:
        from ..queries.analytics import sessionize_events

        return sessionize_events(events, gap_min)

    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    gap_us = gap_min * 60 * 1_000_000

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        idx, start_us, last_us, n = (
            state.get if state.exists else (0, None, None, 0)
        )
        out: list[tuple] = []
        rows = pd.concat(list(pdfs), ignore_index=True)
        rows = rows.sort_values(["ts", "event_id"], kind="mergesort")
        for ts in rows["ts"]:
            # pandas Timestamp.value is ns since epoch
            t_us = ts.value // 1000
            if start_us is None:
                idx, start_us, last_us, n = idx + 1, t_us, t_us, 1
            elif t_us > last_us + gap_us:
                out.append((key[0], idx, n, start_us, last_us - start_us))
                idx, start_us, last_us, n = idx + 1, t_us, t_us, 1
            else:
                last_us, n = max(last_us, t_us), n + 1
        state.update((idx, start_us, last_us, n))
        if out:
            yield pd.DataFrame(
                {
                    "user_id": [o[0] for o in out],
                    "session_idx": [o[1] for o in out],
                    "n_events": [o[2] for o in out],
                    "session_start": pd.to_datetime(
                        [o[3] for o in out], unit="us"
                    ),
                    "duration_us": [o[4] for o in out],
                }
            )

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=SESSIONIZE_SCHEMA,
        stateStructType="idx long, start_us long, last_us long, n long",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def running_totals_tws(events: DataFrame) -> DataFrame:
    """T-10 on the Spark 4 transformWithStateInPandas API: the same
    running per-user totals as :func:`running_totals`, expressed as a
    StatefulProcessor with an explicit ValueState — the successor API to
    applyInPandasWithState (typed state variables, timers, TTL, and
    mandatory RocksDB backing at scale).

    ENV-BLOCKED in this sandbox: the transformWithState driver worker
    imports google.protobuf (state protocol messages), which is not
    installed — the gated activation test
    (tests/test_real_kernels.py::test_transform_with_state_running_totals)
    arms automatically when protobuf appears. The batch path works
    everywhere and equals running_totals' batch twin by construction.

    Callers must set
    spark.sql.streaming.stateStore.providerClass =
    org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider
    (transformWithState refuses the HDFS-backed provider)."""
    if not events.isStreaming:
        return events.groupBy("user_id").agg(
            F.count("*").alias("n_events"), dsum("value").alias("total_value")
        )

    from pyspark.sql.streaming import StatefulProcessor

    class _Totals(StatefulProcessor):
        def init(self, handle) -> None:
            self._agg = handle.getValueState("agg", "n LONG, cents LONG")

        def handleInputRows(self, key, rows, timer_values):
            import numpy as np

            n, cents = self._agg.get() if self._agg.exists() else (0, 0)
            for pdf in rows:
                v = pdf["value"].to_numpy()
                n += len(pdf)
                # cents-exact accumulation, HALF-UP like the batch twin's
                # decimal(28,2) cast (see running_totals)
                cents += int((np.sign(v) * np.floor(np.abs(v) * 100.0 + 0.5)).sum())
            self._agg.update((n, cents))
            yield pd.DataFrame(
                {"user_id": [key[0]], "n_events": [n], "total_value": [cents / 100.0]}
            )

        def close(self) -> None:
            pass

    return events.groupBy("user_id").transformWithStateInPandas(
        _Totals(),
        outputStructType=RUNNING_TOTALS_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )
