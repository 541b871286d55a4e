from __future__ import annotations

from pyspark.sql import functions as F

from cdc_debezium_kafka_airflow_spark.queries.relational2 import (
    agg_approx_distinct,
    stream_session_window,
)


def test_approx_distinct_within_rsd(spark, sf_dir):
    # the query exposes the sketch-vs-exact bound as a boolean so the oracle
    # can compare it; pytest asserts the bound actually held
    rows = agg_approx_distinct(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.approx_within_10pct, (r.l_returnflag, r.exact_orders)


def test_approx_percentile_close_to_exact(spark, sf_dir):
    from cdc_debezium_kafka_airflow_spark.queries.relational2 import (
        agg_approx_percentile,
    )

    rows = agg_approx_percentile(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.approx_within_5pct, (r.o_orderstatus, r.p50_exact)


def test_session_windows_respect_gap(spark, sf_dir):
    # break lineage: the memory-sink view's watermark metadata confuses
    # self-join attribute resolution
    sessions = stream_session_window(spark, sf_dir).localCheckpoint(eager=True)
    # no two sessions of the same user may overlap (end = last ts + gap)
    a = sessions.alias("a")
    b = sessions.alias("b")
    overlaps = a.join(
        b,
        on=[
            F.col("a.user_id") == F.col("b.user_id"),
            F.col("a.session_start") < F.col("b.session_start"),
            F.col("b.session_start") < F.col("a.session_end"),
        ],
    )
    assert overlaps.count() == 0


def test_session_window_boundary_semantics(spark):
    """Pin the exact session_window boundary rule the sessionize_native
    oracle encodes: per-event windows [ts, ts+gap) MERGE when they overlap
    or touch, so an event landing exactly prev+gap still joins the session
    — a new session needs a STRICTLY greater gap."""
    from pyspark.sql import functions as F

    rows = [
        (1, "2024-01-01 00:00:00.000000"),
        (1, "2024-01-01 12:00:00.000001"),  # > gap -> new session
        (2, "2024-01-01 00:00:00.000000"),
        (2, "2024-01-01 12:00:00.000000"),  # == gap: windows TOUCH -> merge
    ]
    df = spark.createDataFrame(rows, "user_id long, s string").select(
        "user_id", F.col("s").cast("timestamp").alias("ts")
    )
    out = (
        df.groupBy(F.session_window("ts", "12 hours"), "user_id")
        .agg(F.count("*").alias("n"))
        .groupBy("user_id")
        .agg(F.count("*").alias("n_sessions"))
        .collect()
    )
    got = {r.user_id: r.n_sessions for r in out}
    assert got == {1: 2, 2: 1}, got
