"""Alert sink: critical-lag / integrity-mismatch rows become one rendered
alert (the reference's ONE_FAILED -> email fan-in, minus the SMTP hop)."""

from __future__ import annotations

from pyspark.sql import functions as F

from cdc_debezium_kafka_airflow_spark.operators.alerting import AlertSink
from cdc_debezium_kafka_airflow_spark.operators.monitoring import lag_metrics
from cdc_debezium_kafka_airflow_spark.sources.monitor_fixture import (
    build_topic_offsets,
)
from cdc_debezium_kafka_airflow_spark.sources.tables import load_table


def test_alert_fires_on_critical_lag(spark, sf_dir):
    # threshold 10 so over-threshold topics exist even at the smoke SF
    lags = lag_metrics(
        build_topic_offsets(load_table(spark, sf_dir, "events")), threshold=10
    )
    critical = lags.filter(F.col("is_critical"))
    n_critical = critical.count()
    assert n_critical > 0

    sink = AlertSink()
    sink.process_batch(critical)
    assert len(sink.sent) == 1
    alert = sink.sent[0]
    assert alert.n_failures == n_critical
    assert str(n_critical) in alert.subject
    assert "topic=" in alert.body and "lag=" in alert.body


def test_no_alert_on_empty_batch(spark, sf_dir):
    lags = lag_metrics(build_topic_offsets(load_table(spark, sf_dir, "events")))
    sink = AlertSink()
    sink.process_batch(lags.filter(F.lit(False)))
    assert sink.sent == []


def test_alert_as_streaming_foreachbatch(spark, sf_dir):
    """Wired to a real streaming query: critical windows -> alert batches."""
    from cdc_debezium_kafka_airflow_spark.streaming import jobs

    agg = (
        jobs.events_stream(spark, sf_dir)
        .groupBy(F.window("ts", "1 day").alias("w"), "event_type")
        .agg(F.count("*").alias("n_events"))
        .filter(F.col("n_events") > 3)  # 'critical' threshold (smoke-SF sized)
    )
    sink = AlertSink()
    q = (
        agg.writeStream.foreachBatch(sink.foreach_batch())
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    assert len(sink.sent) >= 1
    assert sink.sent[0].n_failures > 0
