"""Source/sink builder tests (SURVEY.md S-01/S-02/S-07/S-08): everything a
broker-less container can certify — the envelope parse (the part of the Kafka
source with semantics), the producer-sink serialization round trip, the
declared-schema CSV read, and the binaryFile source.
"""

from __future__ import annotations

import os
import shutil
import tempfile

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from bigdata_streaming_absa_vehicle_spark.schemas import (
    FRAME_ENVELOPE,
    REVIEW_ENVELOPE,
    REVIEW_ENVELOPE_VARIANT,
)
from bigdata_streaming_absa_vehicle_spark.sources.files import read_binary_files, read_csv
from bigdata_streaming_absa_vehicle_spark.sources.kafka import (
    kafka_payload,
    parse_envelope,
    read_stream,
)


@pytest.fixture()
def tmpdir():
    d = tempfile.mkdtemp(prefix="sources_test_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def kafka_shaped(spark, values: list[bytes]):
    """A batch DataFrame with the Kafka envelope columns the parse stage sees."""
    return spark.createDataFrame(
        [Row(key=None, value=v, topic="t", partition=0, offset=i) for i, v in enumerate(values)],
        "key binary, value binary, topic string, partition int, offset long",
    )


def test_parse_envelope_review(spark):
    raw = kafka_shaped(
        spark,
        [b'{"id": "1", "review": "good phone"}', b'{"id": "2", "review": "bad box"}'],
    )
    got = parse_envelope(raw, REVIEW_ENVELOPE).orderBy("id").collect()
    assert [(r.id, r.review) for r in got] == [("1", "good phone"), ("2", "bad box")]


def test_parse_envelope_schema_mismatch_yields_nulls(spark):
    """The reference's producer/consumer schema drift (SURVEY §3.1.1): a
    mismatched envelope parses to nulls, never crashes the stream."""
    raw = kafka_shaped(spark, [b'{"Review": "wrong shape"}'])
    row = parse_envelope(raw, REVIEW_ENVELOPE).collect()[0]
    assert row.id is None and row.review is None
    ok = parse_envelope(raw, REVIEW_ENVELOPE_VARIANT).collect()[0]
    assert ok.Review == "wrong shape"


def test_parse_with_dead_letter_splits_schema_drift(spark):
    """The reference's producer/consumer envelope drift, handled: valid rows
    flatten, drifted rows land in the dead-letter frame with their raw value."""
    from bigdata_streaming_absa_vehicle_spark.sources.kafka import parse_with_dead_letter

    raw = kafka_shaped(
        spark,
        [
            b'{"id": "1", "review": "good"}',
            b'{"Review": "wrong envelope"}',
            b"not json at all",
        ],
    )
    valid, dead = parse_with_dead_letter(raw, REVIEW_ENVELOPE)
    assert [(r.id, r.review) for r in valid.collect()] == [("1", "good")]
    dead_rows = sorted(r.raw_value for r in dead.collect())
    assert dead_rows == ["not json at all", '{"Review": "wrong envelope"}']


def test_kafka_payload_roundtrip(spark):
    """S-07 producer sink serialization: payload -> parse_envelope is identity."""
    src = spark.createDataFrame(
        [("CAM_0", 1700000000.5, "aGVsbG8=")],
        FRAME_ENVELOPE,
    )
    raw = kafka_payload(src).withColumn("topic", F.lit("t"))
    back = parse_envelope(raw, FRAME_ENVELOPE).collect()[0]
    assert (back.camera_id, back.timestamp, back.frame_data) == ("CAM_0", 1700000000.5, "aGVsbG8=")


def test_read_stream_builder_options(spark):
    """S-01 builder carries the reference's options; no broker, so only the
    reader construction is certifiable here (parse semantics above)."""
    reader = read_stream(spark, "broker:9092", "absa-reviews", "earliest", 50)
    assert reader is not None  # options live JVM-side; load() needs a broker


def test_kafka_options_contract_matches_reference():
    """The generated option dict must match the reference consumer's exactly
    (spark_kafka_consumer_dag.py:37-45: kafka.bootstrap.servers, subscribe,
    startingOffsets=latest, maxOffsetsPerTrigger=50) — cheap insurance on
    the one source that can never run against a live broker here."""
    from bigdata_streaming_absa_vehicle_spark.sources.kafka import kafka_options

    assert kafka_options("kafka:9092", "absa-reviews", "latest", 50) == {
        "kafka.bootstrap.servers": "kafka:9092",
        "subscribe": "absa-reviews",
        "startingOffsets": "latest",
        "maxOffsetsPerTrigger": "50",
    }
    # maxOffsetsPerTrigger is optional, exactly as in the reference's
    # vehicle consumer (no trigger bound set there).
    assert kafka_options("kafka:9092", "traffic-frames") == {
        "kafka.bootstrap.servers": "kafka:9092",
        "subscribe": "traffic-frames",
        "startingOffsets": "latest",
    }


def test_read_csv_declared_schema(spark, tmpdir):
    path = os.path.join(tmpdir, "reviews.csv")
    with open(path, "w", encoding="utf-8") as f:
        f.write("id,review\n1,ok product\n2,broken lid\n")
    from pyspark.sql.types import StringType, StructField, StructType

    st = StructType([StructField("id", StringType()), StructField("review", StringType())])
    got = read_csv(spark, path, st).orderBy("id").collect()
    assert [(r.id, r.review) for r in got] == [("1", "ok product"), ("2", "broken lid")]


def test_binary_file_source(spark, tmpdir):
    """S-08: binaryFile exposes (path, length, content) for opaque media."""
    blob = bytes(range(256))
    with open(os.path.join(tmpdir, "frame0.bin"), "wb") as f:
        f.write(blob)
    got = read_binary_files(spark, tmpdir, "*.bin").select("length", "content").collect()[0]
    assert got.length == 256 and bytes(got.content) == blob


def test_read_jdbc_roundtrip_embedded_derby(spark):
    """S-04 end-to-end against the Derby embedded in Spark's own JVM (no
    external DB in the container): write a table over JDBC, read it back
    plain, predicate-partitioned, and stride-partitioned — all three modes
    must agree with the source rows, and the partitioned reads must carry
    the requested parallelism."""
    from bigdata_streaming_absa_vehicle_spark.sources.jdbc import read_jdbc

    url = "jdbc:derby:memory:graftdb;create=true"
    props = {"driver": "org.apache.derby.iapi.jdbc.AutoloadedDriver"}
    src = spark.sql(
        "SELECT id AS K, CAST(id * 10 AS DOUBLE) AS V FROM range(0, 100)"
    )
    src.write.mode("overwrite").jdbc(url, "metrics", properties=props)

    plain = read_jdbc(spark, url, "metrics", props)
    assert plain.count() == 100
    assert {r.K for r in plain.collect()} == set(range(100))

    pred = read_jdbc(
        spark, url, "metrics", props, predicates=["K < 50", "K >= 50"]
    )
    assert pred.rdd.getNumPartitions() == 2
    assert pred.count() == 100

    strided = read_jdbc(
        spark,
        url,
        "metrics",
        props,
        partition_column="K",
        lower_bound=0,
        upper_bound=100,
        num_partitions=4,
    )
    assert strided.rdd.getNumPartitions() == 4
    got = sorted((r.K, r.V) for r in strided.collect())
    assert got == [(i, float(i * 10)) for i in range(100)]

    # Catalyst pushes filters into the remote scan: the one-sided mode guard
    with pytest.raises(ValueError):
        read_jdbc(spark, url, "metrics", props, partition_column="K")
    with pytest.raises(ValueError):
        read_jdbc(
            spark, url, "metrics", props,
            predicates=["K < 1"], partition_column="K",
            lower_bound=0, upper_bound=1, num_partitions=1,
        )


def test_read_jsonl_declared_schema(spark, tmp_path):
    """S-02 (JSONL): declared schema, FAILFAST default, PERMISSIVE quarantine
    of malformed lines into the corrupt column."""
    import pytest

    from bigdata_streaming_absa_vehicle_spark.sources.files import read_jsonl

    p = tmp_path / "docs.jsonl"
    p.write_text(
        '{"doc_id": 1, "text": "alpha beta"}\n'
        '{"doc_id": 2, "text": "gamma"}\n'
        "not json at all\n"
    )
    schema = "doc_id long, text string, _bad string"
    ok = read_jsonl(spark, str(p), schema, mode="PERMISSIVE", corrupt_col="_bad")
    rows = {r.doc_id: (r.text, r._bad) for r in ok.collect()}
    assert rows[1] == ("alpha beta", None) and rows[2] == ("gamma", None)
    assert None in rows and rows[None][1] == "not json at all"

    with pytest.raises(Exception):
        read_jsonl(spark, str(p), "doc_id long, text string").collect()


def test_bucketed_join_skips_shuffle(spark, tmp_path):
    """S-10: both sides bucketed on the join key with the same bucket count
    => the sort-merge join consumes buckets as pre-shuffled input — NO
    Exchange in the physical plan — and results match the plain join."""
    from bigdata_streaming_absa_vehicle_spark.sources.bucketed import (
        read_bucketed,
        write_bucketed,
    )
    from bigdata_streaming_absa_vehicle_spark.tables import load

    orders = load(spark, "/root/testdata/sf0.001", "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    cust = load(spark, "/root/testdata/sf0.001", "customer").select(
        "c_custkey", "c_mktsegment"
    )
    write_bucketed(
        orders, "t_orders_b", ["o_custkey"], 4, path=str(tmp_path / "ob")
    )
    write_bucketed(
        cust, "t_cust_b", ["c_custkey"], 4, path=str(tmp_path / "cb")
    )
    try:
        ob, cb = read_bucketed(spark, "t_orders_b"), read_bucketed(spark, "t_cust_b")
        prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            j = ob.join(cb, ob.o_custkey == cb.c_custkey)
            plan = j._jdf.queryExecution().executedPlan().toString()
            assert "Exchange" not in plan, plan
            # same rows as the un-bucketed join
            plain = orders.join(cust, orders.o_custkey == cust.c_custkey)
            assert j.count() == plain.count() > 0
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    finally:
        spark.sql("DROP TABLE IF EXISTS t_orders_b")
        spark.sql("DROP TABLE IF EXISTS t_cust_b")


def test_python_datasource_synthetic_events(spark):
    """S-11: the Python DataSource API generator — deterministic across
    partition layouts (same rows whether 2 or 8 partitions), correct
    partition fan-out, typed schema."""
    from bigdata_streaming_absa_vehicle_spark.sources import pydatasource

    pydatasource.register(spark)
    a = (
        spark.read.format("synthetic_events")
        .option("n_rows", 500)
        .option("n_partitions", 2)
        .load()
    )
    b = (
        spark.read.format("synthetic_events")
        .option("n_rows", 500)
        .option("n_partitions", 8)
        .load()
    )
    assert a.rdd.getNumPartitions() == 2 and b.rdd.getNumPartitions() == 8
    ra, rb = sorted(a.collect()), sorted(b.collect())
    assert ra == rb and len(ra) == 500
    assert a.schema.simpleString() == (
        "struct<event_id:bigint,user_id:bigint,event_type:string,"
        "value:double,ts:timestamp>"
    )
    # deterministic content: same seed => same first row on every run
    first = ra[0]
    assert first.event_id == 0 and 0 <= first.user_id < 100


def test_partitioned_static_pruning(spark, tmp_path):
    """S-12: a filter on the partition column must reach the scan as a
    PartitionFilter (whole directories pruned at planning time), and the
    partitioned read must return the same rows as the plain filter."""
    from pyspark.sql import functions as F

    from bigdata_streaming_absa_vehicle_spark.sources.partitioned import (
        read_partitioned,
        write_partitioned,
    )
    from bigdata_streaming_absa_vehicle_spark.tables import load

    orders = load(spark, "/root/testdata/sf0.001", "orders").withColumn(
        "o_year", F.year("o_orderdate")
    )
    path = str(tmp_path / "orders_part")
    write_partitioned(orders, path, ["o_year"])

    pt = read_partitioned(spark, path).filter(F.col("o_year") == 1996)
    plan = pt._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "o_year" in plan.split("PartitionFilters")[1][:200], plan
    expected = orders.filter(F.col("o_year") == 1996).count()
    assert pt.count() == expected and expected > 0


def test_partitioned_dynamic_partition_pruning(spark, tmp_path):
    """S-12: joining the partitioned fact on its partition column against a
    FILTERED dim must inject a dynamicpruning expression into the fact
    scan's partition filters — partitions for non-surviving keys are
    skipped at runtime (DPP)."""
    from pyspark.sql import functions as F

    from bigdata_streaming_absa_vehicle_spark.sources.partitioned import (
        read_partitioned,
        write_partitioned,
    )
    from bigdata_streaming_absa_vehicle_spark.tables import load

    orders = load(spark, "/root/testdata/sf0.001", "orders").withColumn(
        "o_year", F.year("o_orderdate")
    )
    fact_path = str(tmp_path / "orders_part")
    dim_path = str(tmp_path / "year_dim")
    write_partitioned(orders, fact_path, ["o_year"])
    # NOTE the dim filter must be a COMPARISON (flag >= 4): the DPP rule
    # only treats binary comparisons / IN / LIKE as "likely selective" — a
    # bare boolean attribute filter does not trigger pruning.
    orders.select("o_year").distinct().withColumn(
        "flag", (F.col("o_year") % 7).cast("int")
    ).write.mode("overwrite").parquet(dim_path)

    prev = spark.conf.get("spark.sql.optimizer.dynamicPartitionPruning.useStats")
    # test tables carry no ANALYZE stats; the stats-based benefit estimate
    # would veto pruning on kb-sized fixtures
    spark.conf.set("spark.sql.optimizer.dynamicPartitionPruning.useStats", "false")
    try:
        fact = read_partitioned(spark, fact_path)
        dim = spark.read.parquet(dim_path).filter(F.col("flag") >= 4)
        j = fact.join(dim, "o_year").groupBy("o_year").count()
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "dynamicpruning" in plan.lower(), plan
        got = {r["o_year"]: r["count"] for r in j.collect()}
        expected = {
            r["o_year"]: r["count"]
            for r in orders.filter((F.col("o_year") % 7) >= 4)
            .groupBy("o_year")
            .count()
            .collect()
        }
        assert got == expected and got
    finally:
        spark.conf.set(
            "spark.sql.optimizer.dynamicPartitionPruning.useStats", prev
        )


def test_merge_schema_evolution_read(spark, tmp_path):
    """S-03 evolution path: two parquet snapshots of the same table with
    DIFFERENT schemas (a column added between writes) read back as one
    relation under mergeSchema — the late column is NULL for old files,
    populated for new ones, and both generations keep their rows. This
    is the schema-evolution read a lakehouse relies on instead of a
    blocking table rewrite."""
    from pyspark.sql import functions as F

    from bigdata_streaming_absa_vehicle_spark.tables import load

    p = load(spark, "/root/testdata/sf0.001", "part")
    v1 = p.select("p_partkey", "p_name", "p_retailprice").filter(
        F.col("p_partkey") % 2 == 0
    )
    v2 = p.select("p_partkey", "p_name", "p_retailprice", "p_size").filter(
        F.col("p_partkey") % 2 == 1
    )
    out = str(tmp_path / "evolved")
    v1.write.parquet(f"{out}/gen=1")
    v2.write.parquet(f"{out}/gen=2")
    merged = spark.read.option("mergeSchema", "true").parquet(out)
    assert "p_size" in merged.columns
    n1, n2 = v1.count(), v2.count()
    assert merged.count() == n1 + n2
    assert merged.filter(F.col("p_size").isNull()).count() == n1
    assert merged.filter(F.col("p_size").isNotNull()).count() == n2


def test_orc_write_read_roundtrip(spark, tmp_path):
    """S-03 sibling: the engine's tables round-trip through ORC (the other
    columnar format Spark ships natively) with schema and values intact —
    an exit ramp for stacks standardized on ORC instead of parquet."""
    from pyspark.sql import functions as F

    from bigdata_streaming_absa_vehicle_spark.tables import load

    src = load(spark, "/root/testdata/sf0.001", "nation")
    out = str(tmp_path / "nation_orc")
    src.write.orc(out)
    back = spark.read.orc(out)
    assert back.schema == src.schema
    key = [f.name for f in src.schema.fields][0]
    assert sorted(back.collect(), key=lambda r: r[key]) == sorted(
        src.collect(), key=lambda r: r[key]
    )


def test_dynamic_partition_overwrite_replaces_only_touched_partitions(spark, tmp_path):
    """S-03/lakehouse write semantics: with partitionOverwriteMode=dynamic,
    an overwrite write REPLACES only the partitions present in the incoming
    batch and leaves every other partition's files untouched — the
    idempotent daily-backfill contract (static mode would truncate the
    whole table)."""
    from pyspark.sql import functions as F

    from bigdata_streaming_absa_vehicle_spark.tables import load

    ev = (
        load(spark, "/root/testdata/sf0.001", "events")
        .withColumn("event_date", F.to_date("ts"))
    )
    out = str(tmp_path / "ev_by_date")
    ev.write.partitionBy("event_date").parquet(out)
    days = [r.event_date for r in ev.select("event_date").distinct().limit(2).collect()]
    target, other = sorted(days)[0], sorted(days)[1]
    before_other = (
        spark.read.parquet(out).filter(F.col("event_date") == other).count()
    )
    # rewrite ONE day with doubled rows under dynamic overwrite
    patch = ev.filter(F.col("event_date") == target)
    patch = patch.unionAll(patch)
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        patch.write.mode("overwrite").partitionBy("event_date").parquet(out)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
    after = spark.read.parquet(out)
    assert after.filter(F.col("event_date") == target).count() == patch.count() // 2 * 2
    assert after.filter(F.col("event_date") == other).count() == before_other, (
        "dynamic overwrite clobbered an untouched partition"
    )
