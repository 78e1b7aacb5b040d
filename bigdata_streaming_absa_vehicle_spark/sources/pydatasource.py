"""Python DataSource API source (S-11): a deterministic synthetic-events
generator built on Spark 4's `pyspark.sql.datasource` — the extension point
that lets this engine ingest ANY Python-reachable system (REST APIs, queues,
bespoke formats) as a first-class, partitioned Spark source instead of a
driver-side collect-and-parallelize.

The generator itself is the engine's load source: md5-derived fields, so the
same (n_rows, n_partitions, seed) always yields byte-identical data on any
cluster layout — partitions generate independently (no coordination, no
driver bottleneck) and scale to any width.

Reference anchor: the reference's producers synthesize Kafka traffic with
driver-side Python loops (producer.py, vehicle_producer.py); this is the
distributed, deterministic Spark-native equivalent.
"""

from __future__ import annotations

import hashlib

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

SYNTH_SCHEMA = "event_id bigint, user_id bigint, event_type string, value double, ts timestamp"

_TYPES = ("view", "click", "purchase", "signup", "error")
#: epoch micros of 2024-01-01T00:00:00Z — generation is pure arithmetic
_T0_US = 1_704_067_200_000_000


class _RangePartition(InputPartition):
    def __init__(self, start: int, end: int, seed: str):
        self.start, self.end, self.seed = start, end, seed


class SyntheticEventsReader(DataSourceReader):
    def __init__(self, options: dict):
        self.n_rows = int(options.get("n_rows", 1000))
        self.n_parts = int(options.get("n_partitions", 4))
        self.n_users = int(options.get("n_users", 100))
        self.seed = str(options.get("seed", "synth"))

    def partitions(self):
        step = -(-self.n_rows // self.n_parts)
        return [
            _RangePartition(i, min(i + step, self.n_rows), self.seed)
            for i in range(0, self.n_rows, step)
        ]

    def read(self, partition: _RangePartition):
        import datetime

        for i in range(partition.start, partition.end):
            h = hashlib.md5(f"{partition.seed}:{i}".encode()).hexdigest()
            user = int(h[:8], 16) % self.n_users
            etype = _TYPES[int(h[8:10], 16) % len(_TYPES)]
            value = (int(h[10:18], 16) % 1_000_000) / 100.0
            # one event every ~7 seconds of synthetic time, jittered
            t_us = _T0_US + i * 7_000_000 + int(h[18:22], 16) % 1_000_000
            ts = datetime.datetime(1970, 1, 1) + datetime.timedelta(microseconds=t_us)
            yield (i, user, etype, value, ts)


class SyntheticEventsDataSource(DataSource):
    """`spark.read.format("synthetic_events")` after
    `spark.dataSource.register(SyntheticEventsDataSource)`."""

    @classmethod
    def name(cls) -> str:
        return "synthetic_events"

    def schema(self) -> str:
        return SYNTH_SCHEMA

    def reader(self, schema) -> SyntheticEventsReader:
        return SyntheticEventsReader(self.options)


def register(spark) -> None:
    spark.dataSource.register(SyntheticEventsDataSource)
