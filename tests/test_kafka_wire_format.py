"""Wire-format compatibility between the changelog FIXTURE and a real
Kafka broker (SURVEY.md §2.A src_kafka_topic / src_cdc_binlog).

No broker exists in this sandbox, so `sources/kafka.py`'s subscribe paths
cannot be driven end-to-end. What CAN be pinned without kafka-python or the
spark-sql-kafka connector jar is the contract that makes the fixture a
faithful twin: Spark's Kafka source emits a documented fixed schema
(KAFKA_SOURCE_DDL), `kafka._project` maps it to the engine's changelog
record shape, and `cdc_fixture.build_changelog` must land on EXACTLY that
shape — then every operator downstream of _project (unwrap, DLQ split,
upsert materialization, lag monitor) is bit-for-bit indifferent to whether
rows came from a broker or the replay fixture.

Reference parity: topic naming mirrors register-mysql-connector.json:10,12
(`mysql-server.pos_bi_db.<table>`); the JSON envelope mirrors
JsonConverter schemas.enable=true (register-mysql-connector.json:14-17).
"""

import json

from pyspark.sql import functions as F

from cdc_debezium_kafka_airflow_spark.sources import kafka
from cdc_debezium_kafka_airflow_spark.sources.cdc_fixture import (
    TOPIC_PREFIX,
    build_changelog,
)
from cdc_debezium_kafka_airflow_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


def _fields(df):
    return [(f.name, f.dataType.simpleString()) for f in df.schema.fields]


def test_fixture_schema_identical_to_projected_kafka_source(spark):
    """fixture output == _project(real Kafka source schema) output:
    same names, same types, same ORDER."""
    raw = spark.createDataFrame([], schema=kafka.KAFKA_SOURCE_DDL)
    projected = kafka._project(raw)
    fixture = build_changelog(load_table(spark, SF, "events"))
    assert _fields(fixture) == _fields(projected)


def test_kafka_source_ddl_is_the_published_contract(spark):
    """The DDL constant parses and carries the seven documented columns in
    the documented types — a typo here would silently decouple the fixture
    from the broker path."""
    raw = spark.createDataFrame([], schema=kafka.KAFKA_SOURCE_DDL)
    assert _fields(raw) == [
        ("key", "binary"),
        ("value", "binary"),
        ("topic", "string"),
        ("partition", "int"),
        ("offset", "bigint"),
        ("timestamp", "timestamp"),
        ("timestampType", "int"),
    ]


def test_projection_bytes_roundtrip_through_kafka_binary(spark):
    """Byte-compatibility, not just schema-compatibility: serialize fixture
    records INTO the Kafka source shape (key/value as binary, the shape a
    producer would publish) and read them back through _project — the
    round-trip must reproduce the fixture rows exactly, including NULL
    tombstone values."""
    fixture = build_changelog(load_table(spark, SF, "events")).limit(500)
    as_broker = fixture.select(
        F.col("key").cast("binary").alias("key"),
        F.col("value").cast("binary").alias("value"),
        "topic",
        "partition",
        "offset",
        "timestamp",
        F.lit(0).alias("timestampType"),
    )
    assert _fields(as_broker) == _fields(
        spark.createDataFrame([], schema=kafka.KAFKA_SOURCE_DDL)
    )
    back = kafka._project(as_broker)
    orig = {r["offset"]: r for r in fixture.collect()}
    rows = back.collect()
    assert len(rows) == len(orig)
    tombstones = 0
    for r in rows:
        o = orig[r["offset"]]
        assert (
            r["key"],
            r["value"],
            r["topic"],
            r["partition"],
            r["timestamp"],
        ) == (o["key"], o["value"], o["topic"], o["partition"], o["timestamp"])
        if r["value"] is None:
            tombstones += 1
    assert tombstones > 0, "fixture slice must exercise NULL tombstones"


def test_fixture_topics_match_reference_subscribe_pattern(spark):
    """Every fixture topic must be routable by the DEFAULT_TOPIC_PATTERN a
    real deployment subscribes with (register-mysql-connector.json:10,12) —
    otherwise the fixture tests a stream the broker path would not see."""
    import re

    fixture = build_changelog(load_table(spark, SF, "events"))
    topics = [r["topic"] for r in fixture.select("topic").distinct().collect()]
    pat = re.compile(kafka.DEFAULT_TOPIC_PATTERN)
    assert topics and all(pat.fullmatch(t) for t in topics)
    assert all(t.startswith(TOPIC_PREFIX) for t in topics)


def test_fixture_value_is_debezium_envelope_json(spark):
    """The value column of a non-tombstone, non-DLQ record must parse as
    the Debezium JsonConverter envelope ({schema,payload{before,after,
    source,op,ts_ms}}) — the wire format the reference's connectors put on
    the topic."""
    fixture = build_changelog(load_table(spark, SF, "events"))
    good = (
        fixture.filter(F.col("value").isNotNull())
        .filter(F.col("value").startswith('{"schema"'))
        .limit(20)
        .collect()
    )
    assert good
    for r in good:
        env = json.loads(r["value"])
        assert set(env) == {"schema", "payload"}
        payload = env["payload"]
        assert {"source", "op", "ts_ms"} <= set(payload)
        op = payload["op"]
        assert op in ("c", "u", "d", "r")
        # to_json drops NULL struct fields (Spark's ignoreNullFields
        # default), so before/after presence is op-dependent: creates and
        # reads carry only `after`, deletes only `before`, updates both —
        # the de_json_schema path reads through from_json, which restores
        # the absent side as NULL just as Debezium's explicit null does.
        assert ("after" in payload) == (op != "d")
        assert ("before" in payload) == (op in ("u", "d"))
        assert payload["source"]["db"] == "pos_bi_db"


def _register_mock(spark) -> None:
    """Session-idempotent registration (two tests share one session)."""
    from tests.kafka_broker_mock import MockKafkaDataSource

    try:
        spark.dataSource.register(MockKafkaDataSource)
    except Exception as exc:  # already registered by the sibling test
        if "DATA_SOURCE_ALREADY_EXISTS" not in str(exc):
            raise


def test_read_changelog_batch_executes_via_directory_served_mock(
    spark, tmp_path, monkeypatch
):
    """VERDICT r10 task 5: drive sources/kafka.py's BATCH LOAD PATH itself
    — reader construction, subscribePattern, offset bounds, _project —
    without a broker, by pointing kafka.KAFKA_FORMAT at a directory-served
    Python DataSource twin (Spark reserves the literal name "kafka" even
    with no connector jar, so the twin registers beside it). The exact
    envelope bytes round-trip: serve the fixture's UTF-8 value bytes,
    read them back through read_changelog_batch, compare row-for-row."""
    from tests.kafka_broker_mock import MockKafkaDataSource, serve_changelog

    fixture = build_changelog(load_table(spark, SF, "events")).limit(400)
    fix_rows = fixture.collect()
    served = str(tmp_path / "broker")
    serve_changelog(fix_rows, served)
    # a topic OUTSIDE the reference's subscribe pattern must be filtered
    # by the subscription, not the serving layer
    import json as _json

    with open(tmp_path / "broker" / "other-server.foreign_db.x.jsonl", "w") as fh:
        fh.write(
            _json.dumps(
                {
                    "key": None,
                    "value": None,
                    "partition": 0,
                    "offset": 0,
                    "timestamp_us": 0,
                }
            )
            + "\n"
        )

    _register_mock(spark)
    monkeypatch.setattr(kafka, "KAFKA_FORMAT", MockKafkaDataSource.name())
    got = kafka.read_changelog_batch(spark, f"dir://{served}")
    assert _fields(got) == _fields(fixture)
    got_rows = {r["offset"]: r for r in got.collect()}
    assert len(got_rows) == len(fix_rows)
    tombstones = 0
    for o in fix_rows:
        r = got_rows[o["offset"]]
        assert (
            r["key"],
            r["value"],
            r["topic"],
            r["partition"],
            r["timestamp"],
        ) == (o["key"], o["value"], o["topic"], o["partition"], o["timestamp"])
        if r["value"] is None:
            tombstones += 1
    assert tombstones > 0, "slice must exercise NULL tombstones"
    assert not any(
        r["topic"].startswith("other-server") for r in got_rows.values()
    ), "subscribePattern failed to filter the foreign topic"


def test_read_changelog_stream_caps_offsets_per_trigger(
    spark, tmp_path, monkeypatch
):
    """The STREAM load path (subscribePattern + maxOffsetsPerTrigger)
    executes end-to-end against the directory-served mock: micro-batches
    respect the reference's admission cap (batch.size=3000 ->
    maxOffsetsPerTrigger, register-postgres-sink.json:6) and the replay
    delivers every record exactly once."""
    import shutil
    import tempfile

    from tests.kafka_broker_mock import MockKafkaDataSource, serve_changelog

    fixture = build_changelog(load_table(spark, SF, "events")).limit(300)
    fix_rows = fixture.collect()
    served = str(tmp_path / "broker")
    serve_changelog(fix_rows, served)

    _register_mock(spark)
    monkeypatch.setattr(kafka, "KAFKA_FORMAT", MockKafkaDataSource.name())
    stream = kafka.read_changelog_stream(
        spark, f"dir://{served}", max_offsets_per_trigger=120
    )
    batches: list[tuple[int, int]] = []

    def absorb(df, bid):
        batches.append((bid, df.count()))

    # processingTime + processAllAvailable, not availableNow: a Python
    # DataSourceStreamReader under availableNow stops at the FIRST
    # latestOffset call (same note as jobs.state_store_upsert_stream)
    ck = tempfile.mkdtemp(prefix="kafka_mock_ck_")
    q = None
    try:
        q = (
            stream.writeStream.foreachBatch(absorb)
            .option("checkpointLocation", ck)
            .trigger(processingTime="0 seconds")
            .start()
        )
        q.processAllAvailable()
    finally:
        if q is not None:
            q.stop()
        shutil.rmtree(ck, ignore_errors=True)

    counts = [n for _bid, n in batches if n > 0]
    assert sum(counts) == len(fix_rows)
    assert max(counts) <= 120, "maxOffsetsPerTrigger violated"
    assert len(counts) >= 3, "cap should force a multi-batch replay"
