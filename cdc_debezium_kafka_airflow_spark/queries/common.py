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


def widen_narrow_scan(df: DataFrame, key: tuple | None = None) -> DataFrame:
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
    be scale-adaptive, not tuned to one harness).

    ``key``: optional (sf_dir, table)-style identity for the underlying
    scan. The probe forces a physical planning pass (~60-100 ms per
    fresh plan — ADVICE r12); the answer depends only on the scan's file
    layout and the session width, both stable per fixture directory, so
    keyed callers pay the planning once per process. Keyless calls probe
    every time (correct, just slower)."""
    width = df.sparkSession.sparkContext.defaultParallelism
    if key is not None:
        memo_key = (key, width)
        if memo_key not in _NARROW_SCAN_MEMO:
            _NARROW_SCAN_MEMO[memo_key] = (
                df.rdd.getNumPartitions() < width
            )
        narrow = _NARROW_SCAN_MEMO[memo_key]
    else:
        narrow = df.rdd.getNumPartitions() < width
    if narrow:
        return df.repartition(width)
    return df


#: see widen_narrow_scan — decision memo for the narrow-scan probe; an
#: input-layout property (scan split count vs session width), never data
_NARROW_SCAN_MEMO: dict[tuple, bool] = {}
