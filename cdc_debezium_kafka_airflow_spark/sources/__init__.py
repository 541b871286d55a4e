from cdc_debezium_kafka_airflow_spark.sources.tables import load_table, load_tables
from cdc_debezium_kafka_airflow_spark.sources.cdc_fixture import build_changelog

__all__ = ["load_table", "load_tables", "build_changelog"]
