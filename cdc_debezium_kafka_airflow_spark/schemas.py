"""Typed schemas: base tables, the Debezium envelope, monitor documents.

The reference ships schemas inline in every Kafka message (JsonConverter with
``schemas.enable=true``, reference register-mysql-connector.json:22-25); its
effective type surface is integral/double/string/boolean/date/timestamp(ms)
plus one struct level (SURVEY.md §1.3). We declare the envelope explicitly so
``from_json`` gets a fixed StructType and Catalyst can prune nested fields.
"""

from __future__ import annotations

from pyspark.sql import types as T

# --- base tables (match /root/testdata parquet footers; FIXTURES.md) --------

TABLE_NAMES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

# LEGACY on-disk shape (round-1 fixtures): ts was TIMESTAMP(NANOS) read as
# long via parquet.nanosAsLong. Current fixtures store timestamp[us]; readers
# probe the real footer schema and normalize via sources.tables.normalize_ts.
# Kept only for tests that exercise the long-nanos dispatch arm.
EVENTS_RAW_NANOS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.LongType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)

EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)

# --- Debezium envelope (SURVEY.md §1.2) --------------------------------------
# value = {"schema": {...}, "payload": {before, after, source, op, ts_ms}}
# Row image typed as the events row (our synthetic changelog source).

ROW_IMAGE_SCHEMA = EVENTS_SCHEMA

SOURCE_SCHEMA = T.StructType(
    [
        T.StructField("db", T.StringType()),
        T.StructField("table", T.StringType()),
        T.StructField("ts_ms", T.LongType()),
    ]
)

PAYLOAD_SCHEMA = T.StructType(
    [
        T.StructField("before", ROW_IMAGE_SCHEMA),
        T.StructField("after", ROW_IMAGE_SCHEMA),
        T.StructField("source", SOURCE_SCHEMA),
        T.StructField("op", T.StringType()),  # c | u | d | r
        T.StructField("ts_ms", T.LongType()),
    ]
)

ENVELOPE_SCHEMA = T.StructType(
    [
        # minimal stand-in for the inline Connect schema object
        T.StructField(
            "schema",
            T.StructType(
                [
                    T.StructField("type", T.StringType()),
                    T.StructField("name", T.StringType()),
                ]
            ),
        ),
        T.StructField("payload", PAYLOAD_SCHEMA),
    ]
)

# key = {"payload": {"id": <pk>}}  (pk.mode=record_key,
# reference register-postgres-sink.json:17)
KEY_SCHEMA = T.StructType(
    [
        T.StructField(
            "payload",
            T.StructType([T.StructField("id", T.LongType())]),
        )
    ]
)

# --- monitor documents (SURVEY.md §1.5) --------------------------------------

CONNECTOR_STATUS_SCHEMA = T.StructType(
    [
        T.StructField("connector_name", T.StringType()),
        T.StructField(
            "connector",
            T.StructType([T.StructField("state", T.StringType())]),
        ),
        T.StructField(
            "tasks",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("id", T.IntegerType()),
                        T.StructField("state", T.StringType()),
                    ]
                )
            ),
        ),
    ]
)

TOPIC_OFFSETS_SCHEMA = T.StructType(
    [
        T.StructField("topic", T.StringType()),
        T.StructField("partition", T.IntegerType()),
        T.StructField("latest_offset", T.LongType()),
        T.StructField("committed_offset", T.LongType()),
    ]
)
