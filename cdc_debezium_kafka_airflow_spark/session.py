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
import zipfile

from pyspark.sql import SparkSession

_PYFILES_SHIPPED: set[str] = set()


def session_key(spark: SparkSession) -> str:
    """Stable identity for a live session. id(spark) is NOT stable: after a
    session is stopped and garbage-collected a new SparkSession can reuse the
    same CPython object address, which would silently skip per-session setup
    (addPyFile) and reintroduce executor unpickle failures."""
    try:
        return spark.sparkContext.applicationId
    except Exception:  # spark-connect sessions have no accessible context
        return f"id-{id(spark)}"


def _ship_package(spark: SparkSession) -> None:
    """Make the engine package importable on executor Python workers.

    A driver-owned session may have been created before this repo was on
    PYTHONPATH; pandas-UDF / mapInPandas / applyInPandas functions that
    reference module-level symbols then fail to unpickle on workers. Shipping
    the package via addPyFile fixes that for any session, local or cluster.
    """
    key = session_key(spark)
    if key in _PYFILES_SHIPPED:
        return
    pkg_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    pkg_dir = os.path.join(pkg_root, "cdc_debezium_kafka_airflow_spark")
    cache_dir = os.path.join(pkg_root, ".cache")
    os.makedirs(cache_dir, exist_ok=True)
    zip_path = os.path.join(cache_dir, "engine_pkg.zip")
    src_mtime = max(
        os.path.getmtime(os.path.join(dp, f))
        for dp, _, fs in os.walk(pkg_dir)
        for f in fs
        if f.endswith(".py")
    )
    if not os.path.exists(zip_path) or os.path.getmtime(zip_path) < src_mtime:
        # PID-suffixed tmp: two harness processes rebuilding concurrently
        # must not interleave writes into one tmp file; os.replace keeps
        # the publish atomic either way
        tmp = f"{zip_path}.tmp.{os.getpid()}"
        with zipfile.ZipFile(tmp, "w") as zf:
            for dp, _, fs in os.walk(pkg_dir):
                for f in fs:
                    if f.endswith(".py"):
                        full = os.path.join(dp, f)
                        zf.write(full, os.path.relpath(full, pkg_root))
        os.replace(tmp, zip_path)
    try:
        spark.sparkContext.addPyFile(zip_path)
    except Exception:
        pass  # e.g. spark-connect sessions without an accessible context
    _PYFILES_SHIPPED.add(key)

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
    _ship_package(spark)
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
        # bench.py's job-frontier probe (n_jobs accounting) walks
        # statusTracker job ids; at the default retainedJobs=1000 a single
        # job-heavy query could evict the probe's anchor and stick the
        # frontier (ADVICE r11). UI is off, so the retained metadata is
        # just the status store; a full 344-query bench schedules ~2.2k
        # jobs per sweep — 200k leaves two orders of magnitude headroom.
        .config("spark.ui.retainedJobs", "200000")
        .config("spark.sql.shuffle.partitions", "32")
    )
    spark = builder.getOrCreate()
    return apply_runtime_confs(spark)
