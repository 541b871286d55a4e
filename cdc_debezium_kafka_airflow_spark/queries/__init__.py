"""Query registry: every implemented operator exposed as a named query with a
matching DuckDB oracle (SURVEY.md §2 contract for __spark_entry__.py)."""

from cdc_debezium_kafka_airflow_spark.queries.registry import (
    QUERIES,
    ORACLES,
    get_queries,
    get_oracles,
)

__all__ = ["QUERIES", "ORACLES", "get_queries", "get_oracles"]
