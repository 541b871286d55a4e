"""Deterministic monitor-input fixtures (connector status docs, topic offsets).

The reference's control plane polls the Connect REST API for connector status
(dags/cdc_health_check_dag.py:51-68) and a Kafka consumer for end/committed
offsets (dags/kafka_latency_monitor.py:60-66). In the test harness those
external systems don't exist, so we derive the same document shapes
deterministically from base tables — every rule is pure arithmetic that the
DuckDB oracles replicate (FIXTURES.md "connector_status" / "topic_offsets").

STATUS SPEC (from ``nation``):
  connector_name  = 'connector_' || n_name
  connector.state = n_nationkey % 7 == 3 -> 'FAILED'
                    n_nationkey % 7 == 5 -> 'PAUSED'
                    else                 -> 'RUNNING'
  tasks           = (n_nationkey % 4) entries; task i state =
                    (n_nationkey + i) % 11 == 2 -> 'FAILED' else 'RUNNING'

OFFSETS SPEC (from ``events`` + two literal edge rows):
  one row per CDC topic (event_type-routed table, cdc_fixture spec):
    latest_offset    = count(*) of that topic's events
    lag_raw          = (length(event_type) * 137) % 700     -- some > 500
    committed_offset = greatest(latest_offset - lag_raw, 0)
  plus literals: ('...empty_topic', latest=0, committed NULL)  -- empty-topic
                 guard (dags/kafka_latency_monitor.py:72-75)
                 ('...idle_topic', 42, 42)                     -- zero lag
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from cdc_debezium_kafka_airflow_spark.sources.cdc_fixture import TOPIC_PREFIX, _table_col


def build_connector_status(nation: DataFrame) -> DataFrame:
    """nation -> connector status documents (CONNECTOR_STATUS_SCHEMA shape)."""
    k = F.col("n_nationkey")
    state = (
        F.when(k % 7 == 3, "FAILED").when(k % 7 == 5, "PAUSED").otherwise("RUNNING")
    )
    n_tasks = (k % 4).cast("int")
    tasks = F.when(n_tasks == 0, F.array().cast("array<struct<id:int,state:string>>")).otherwise(
        F.transform(
            F.sequence(F.lit(0), n_tasks - 1),
            lambda i: F.struct(
                i.cast("int").alias("id"),
                F.when((k + i) % 11 == 2, "FAILED")
                .otherwise("RUNNING")
                .alias("state"),
            ),
        )
    )
    return nation.select(
        F.concat(F.lit("connector_"), F.col("n_name")).alias("connector_name"),
        F.struct(state.alias("state")).alias("connector"),
        tasks.alias("tasks"),
    )


def build_topic_offsets(events: DataFrame) -> DataFrame:
    """events -> per-topic (latest, committed) offset pairs + edge-case rows."""
    spark = events.sparkSession
    # lag_raw derives from the grouping key itself (topic string), so the
    # value is deterministic even when several event_types route to one topic
    # (first(event_type) would be partition-order dependent there)
    per_topic = (
        events.groupBy(F.concat(F.lit(TOPIC_PREFIX), _table_col()).alias("topic"))
        .agg(F.count("*").alias("latest_offset"))
        .select(
            "topic",
            F.lit(0).alias("partition"),
            "latest_offset",
            F.greatest(
                F.col("latest_offset") - F.length("topic") * 137 % 700, F.lit(0)
            ).alias("committed_offset"),
        )
    )
    edges = spark.createDataFrame(
        [
            (TOPIC_PREFIX + "empty_topic", 0, 0, None),
            (TOPIC_PREFIX + "idle_topic", 0, 42, 42),
        ],
        "topic string, partition int, latest_offset long, committed_offset long",
    )
    return per_topic.unionByName(edges)
