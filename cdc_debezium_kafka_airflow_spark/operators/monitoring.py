"""Monitoring / control-plane dataflow — the Python the reference actually
wrote (five Airflow DAGs), re-expressed as declarative DataFrame programs.

Reference parity (file:line into /root/reference):
  status_health           response_check predicates
                          (dags/cdc_health_check_dag.py:17-34 simple;
                           dags/cdc_health_check_dynamic_dag.py:28-52 ∀-tasks)
  lag_metrics             lag = latest - committed, empty-topic guard,
                          threshold 500
                          (dags/kafka_latency_monitor.py:60-84)
  any_failed              fan-in: any critical topic / failed check -> alert
                          (dags/kafka_latency_dynamic_monitor.py:64-74,
                           TriggerRule.ONE_FAILED)
  integrity_compare       per-table MAX(id) / COUNT(*) source-vs-sink parity
                          (dags/cdc_data_integrity_dynamic_dag.py:48-62;
                           readme.md:41)

All of these are tiny-cardinality dataflows (one row per connector/topic/
table); the Spark value is that the same program shape scales from 9 tables to
thousands, and that array predicates (`forall`) replace the reference's Python
for-loops without leaving the JVM.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def status_health(status: DataFrame) -> DataFrame:
    """Evaluate both reference health predicates per connector.

    healthy_simple: connector RUNNING and task[0] RUNNING (the static DAG's
    check, which misses failures in later tasks).
    healthy_strict: connector RUNNING, tasks non-empty, and ALL tasks RUNNING
    (the dynamic DAG's ∀-tasks loop, as an array higher-order function).
    """
    conn_running = F.col("connector.state") == "RUNNING"
    first_task_running = F.coalesce(
        F.get("tasks", 0)["state"] == "RUNNING", F.lit(False)
    )
    all_tasks_running = (F.size("tasks") > 0) & F.forall(
        "tasks", lambda t: t["state"] == "RUNNING"
    )
    return status.select(
        "connector_name",
        F.col("connector.state").alias("connector_state"),
        F.size("tasks").alias("n_tasks"),
        (conn_running & first_task_running).alias("healthy_simple"),
        (conn_running & all_tasks_running).alias("healthy_strict"),
    )


def lag_metrics(offsets: DataFrame, threshold: int = 500) -> DataFrame:
    """``xf_lag`` + ``flt_lag_threshold``: consumer-lag per topic-partition.

    NULL committed -> 0 (dags/kafka_latency_monitor.py:66); empty topic
    (latest == 0) -> lag 0 (:72-75); critical when lag > threshold (:15).
    """
    lag = F.when(F.col("latest_offset") == 0, F.lit(0)).otherwise(
        F.col("latest_offset") - F.coalesce(F.col("committed_offset"), F.lit(0))
    )
    return offsets.select(
        "topic",
        "partition",
        "latest_offset",
        "committed_offset",
        lag.cast("long").alias("lag"),
        (lag > threshold).alias("is_critical"),
    )


def any_failed(flags: DataFrame, flag_col: str) -> DataFrame:
    """``agg_any_failed`` fan-in: one row (n_failed, any_failed)."""
    return flags.agg(
        F.sum(F.col(flag_col).cast("long")).alias("n_failed"),
        (F.sum(F.col(flag_col).cast("long")) > 0).alias("any_failed"),
    )


def integrity_compare(
    source_keyed: DataFrame, sink_keyed: DataFrame, key_col: str, table_col: str = "table_name"
) -> DataFrame:
    """``agg_max_key``+``xf_null_coalesce``+``cmp_integrity``+``agg_count_xval``.

    Both inputs carry (table_name, key). Per table we compute MAX(key) and
    COUNT(*) on each side, NULL->0 like the reference (integrity DAG :51,:55),
    and join on table name to flag mismatches. Deletes make sink max/count
    legitimately lag the source — exactly the signal the reference alerts on.

    Plan: two partial-aggregated scans to one tiny join — aggregation happens
    before any data crosses the network, so source/sink size is irrelevant.
    """
    src = source_keyed.groupBy(table_col).agg(
        F.coalesce(F.max(key_col), F.lit(0)).alias("src_max"),
        F.count("*").alias("src_count"),
    )
    dst = sink_keyed.groupBy(table_col).agg(
        F.coalesce(F.max(key_col), F.lit(0)).alias("dst_max"),
        F.count("*").alias("dst_count"),
    )
    joined = src.join(dst, on=table_col, how="left").select(
        table_col,
        "src_max",
        F.coalesce("dst_max", F.lit(0)).alias("dst_max"),
        "src_count",
        F.coalesce("dst_count", F.lit(0)).alias("dst_count"),
    )
    return joined.withColumns(
        {
            "max_match": F.col("src_max") == F.col("dst_max"),
            "count_match": F.col("src_count") == F.col("dst_count"),
        }
    )
