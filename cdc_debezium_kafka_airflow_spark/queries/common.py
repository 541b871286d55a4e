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


def widen_narrow_scan(df: DataFrame) -> DataFrame:
    """Give an upcoming expensive per-row stage (Python UDTF,
    applyInPandas, or a heavy higher-order-function projection) its full
    core width — scale-adaptively.

    The one-file fixtures scan as a SINGLE split (one parquet row group),
    so an expensive stage fused onto the scan runs serially no matter how
    many cores the session has; a round-robin repartition ahead of it
    trades a few-MB shuffle for core-width parallelism (measured round 12:
    udtf_polymorphic's 100k per-row evals 2.2 s -> ~0.3 s). At production
    scale the scan already carries more splits than cores and this helper
    is a NO-OP — the condition is derived from the plan's own partition
    count, not a local constant (optimization-guide §2: partitioning must
    be scale-adaptive, not tuned to one harness)."""
    width = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < width:
        return df.repartition(width)
    return df
