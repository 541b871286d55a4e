"""Real Kafka source wiring (SURVEY.md §2.A `src_kafka_topic`).

No broker exists in the test harness, so nothing here is exercised by tests;
the changelog *fixture* (cdc_fixture.py) reproduces exactly this projection.
Kept import-safe and minimal so a deployment with a broker only needs a
bootstrap string. Topic naming mirrors the reference
(`mysql-server.pos_bi_db.<table>`, register-mysql-connector.json:10,12;
consumed list register-postgres-sink.json:9).

Scale notes: one Spark input partition per Kafka topic-partition; use
``minPartitions`` to fan out hot single-partition topics (the reference
assumes partition 0 only, dags/kafka_latency_monitor.py:49) and
``maxOffsetsPerTrigger`` to mirror the sink's micro-batch cap
(batch.size=3000, register-postgres-sink.json:6).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

DEFAULT_TOPIC_PATTERN = "mysql-server\\.pos_bi_db\\..*"

#: Format token for the readers below. Production value is "kafka"; the
#: broker-less CI (tests/test_kafka_wire_format.py) points this at a
#: directory-served Python DataSource twin (Spark reserves the name
#: "kafka" even when the connector jar is absent, so the twin cannot
#: simply register under it) — every option below (subscribePattern,
#: offset bounds, maxOffsetsPerTrigger) still flows through this module's
#: real code path and is validated by the mock.
KAFKA_FORMAT = "kafka"

#: The column contract Spark's Kafka source emits (Structured Streaming
#: Kafka integration guide — "Each row in the source has the following
#: schema"). ``_project`` consumes exactly this shape; the changelog
#: fixture (cdc_fixture.build_changelog) must land on ``_project``'s
#: OUTPUT shape so every downstream operator is wire-compatible with a
#: real broker. tests/test_kafka_wire_format.py pins both identities.
KAFKA_SOURCE_DDL = (
    "key binary, value binary, topic string, partition int, "
    "offset bigint, timestamp timestamp, timestampType int"
)


def _project(records: DataFrame) -> DataFrame:
    """Kafka source columns -> the engine's changelog record shape."""
    return records.select(
        F.col("offset"),
        F.col("topic"),
        F.col("partition"),
        F.col("key").cast("string").alias("key"),
        F.col("value").cast("string").alias("value"),
        F.col("timestamp"),
    )


def read_changelog_batch(
    spark: SparkSession,
    bootstrap_servers: str,
    topic_pattern: str = DEFAULT_TOPIC_PATTERN,
) -> DataFrame:
    """Bounded replay of the CDC topics (offset-ranged batch read)."""
    return _project(
        spark.read.format(KAFKA_FORMAT)
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribePattern", topic_pattern)
        .option("startingOffsets", "earliest")
        .option("endingOffsets", "latest")
        .load()
    )


def read_changelog_stream(
    spark: SparkSession,
    bootstrap_servers: str,
    topic_pattern: str = DEFAULT_TOPIC_PATTERN,
    max_offsets_per_trigger: int = 3000,
) -> DataFrame:
    """Unbounded CDC topic stream with the reference's micro-batch cap."""
    return _project(
        spark.readStream.format(KAFKA_FORMAT)
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribePattern", topic_pattern)
        .option("startingOffsets", "earliest")
        .option("maxOffsetsPerTrigger", str(max_offsets_per_trigger))
        .load()
    )
