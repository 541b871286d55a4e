"""Shared helpers for query modules."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from cdc_debezium_kafka_airflow_spark.session import apply_runtime_confs
from cdc_debezium_kafka_airflow_spark.sources.tables import load_table


def t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load a fixture table with session tuning applied (the driver owns the
    session; timeZone=UTC etc. are runtime-settable so we pin them here)."""
    apply_runtime_confs(spark)
    return load_table(spark, sf_dir, name)
