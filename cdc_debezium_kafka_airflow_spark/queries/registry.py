"""Merged query/oracle registry (the __spark_entry__.py contract)."""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from cdc_debezium_kafka_airflow_spark.queries import (
    cdc_queries,
    ext_queries,
    relational,
    relational2,
    format_queries,
    streaming_queries,
    surface_queries,
    surface2_queries,
)

_MODULES = [
    relational,
    relational2,
    cdc_queries,
    ext_queries,
    format_queries,
    streaming_queries,
    surface_queries,
    surface2_queries,
]

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}
for _m in _MODULES:
    for _k in _m.QUERIES:
        if _k in QUERIES:
            raise ValueError(f"duplicate query name: {_k}")
    QUERIES.update(_m.QUERIES)
    ORACLES.update(_m.ORACLES)


def get_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def get_oracles() -> dict[str, str]:
    return dict(ORACLES)
