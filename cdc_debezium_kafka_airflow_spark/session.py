"""SparkSession construction and per-session tuning.

The reference pins every timestamp to UTC (``database.connectionTimeZone=UTC``,
reference register-mysql-connector.json:14) and narrows decimals to IEEE double
(``decimal.handling.mode=double``, register-mysql-connector.json:17); we mirror
the timezone here and the double convention in the fixtures/oracles.

Scale posture (100 TB design, tested on local[32]):
  - AQE on: runtime partition coalescing, skew-join splitting, dynamic
    broadcast decisions survive a 1000x scale-up where static plans don't.
  - shuffle.partitions sized for the local harness; on a real cluster this is
    overridden (or left to AQE's coalescing with a high initial value).
  - Arrow enabled for the few Pandas-UDF paths (multimodal stubs).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Runtime-settable confs applied to ANY session that runs our queries --
# including the driver-owned session passed into __spark_entry__ callables.
RUNTIME_CONFS: dict[str, str] = {
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # events.parquet stores TIMESTAMP(NANOS): Spark has no nanos timestamp,
    # so read as long and convert (sources/tables.py) — truncation to micros
    # matches DuckDB's ns->us handling.
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    # local[32] harness: 60k-600k rows/table -> a few MB per partition.
    # On a 1000-executor cluster reading 100 TB this is set to O(cores*3)
    # or left high and AQE-coalesced.
    "spark.sql.shuffle.partitions": "32",
}


def apply_runtime_confs(spark: SparkSession) -> SparkSession:
    """Apply runtime-settable tuning to an existing session (driver-owned)."""
    for k, v in RUNTIME_CONFS.items():
        try:
            spark.conf.set(k, v)
        except Exception:
            # Non-settable on this build -> keep going; none are
            # correctness-critical except timeZone, which is settable.
            pass
    return spark


def get_spark(app_name: str = "cdc-spark-engine") -> SparkSession:
    """Build a local session for tests/bench (driver provides its own)."""
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cpus}]")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.sql.shuffle.partitions", "32")
    )
    spark = builder.getOrCreate()
    return apply_runtime_confs(spark)
