"""Structured Streaming twins of the batch CDC path.

The reference's streaming plane is Debezium -> Kafka -> JDBC sink with
micro-batching (batch.size=3000 / linger.ms=500 / max buffered 20000,
reference register-postgres-sink.json:6-8). Here:

  - the Kafka topic is replayed from the deterministic changelog fixture via
    the file stream source (same record shape as Spark's Kafka source), and
    `kafka_changelog_stream` shows the real-Kafka wiring (gated: no broker in
    this environment);
  - micro-batching maps to `trigger(processingTime='500 milliseconds')` /
    `availableNow` + `maxOffsetsPerTrigger`-style file limits;
  - the keyed upsert-with-deletes state lives in Spark's state store
    (streaming max_by aggregation) or in `foreachBatch` MERGE for an external
    JDBC warehouse — both included.

State-store scale: the streaming aggregation is keyed on (table_name, key_id),
i.e. state size = live keys, not events seen; RocksDB state store + watermark
TTL bound it on unbounded streams.
"""

from __future__ import annotations

import os
from itertools import count

from pyspark.sql import DataFrame, SparkSession, functions as F

from cdc_debezium_kafka_airflow_spark.sources.tables import load_table, normalize_ts
from cdc_debezium_kafka_airflow_spark.sources.cdc_fixture import build_changelog
from cdc_debezium_kafka_airflow_spark.operators.cdc import (
    parse_envelope,
    split_dlq,
    unwrap,
)

_MEMSINK_IDS = count()

# Reference micro-batch cadence (register-postgres-sink.json:7).
LINGER = "500 milliseconds"


def temp_checkpoint_dir() -> str:
    """Unique throwaway checkpoint location for a single streaming run,
    placed on tmpfs when available.

    Replay-style queries (availableNow over a fixture) never resume, but the
    state store still writes every delta/offset/commit file to the checkpoint
    — on a shared box that disk I/O is the main wall-clock variance (measured
    3.9-8.3s for the same stream-stream join on /tmp vs a stable 3.1-4.5s on
    /dev/shm). The cluster analog: point `spark.sql.streaming.checkpointLocation`
    worker state at fast local SSD, keep only the *resumable* production
    checkpoints on durable storage. Callers must remove the dir when done."""
    import tempfile

    base = "/dev/shm/spark_graft_ck"
    try:
        os.makedirs(base, exist_ok=True)
        return tempfile.mkdtemp(dir=base)
    except OSError:
        return tempfile.mkdtemp(prefix="spark_graft_ck_")


def events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source replay of the events table as a stream, normalized to the
    same canonical ts type as the batch loader.

    The stream schema is probed from the actual parquet footer (a
    driver-side metadata read, no data scan) rather than hardcoded, so a
    fixture re-encoding (long-nanos vs timestamp[us] — it changed between
    rounds) can never silently mis-type the stream: whatever the footer
    says is what the file-stream reads, and ``normalize_ts`` dispatches on
    that dtype exactly like the batch path."""
    path = os.path.join(sf_dir, "events.parquet")
    file_schema = spark.read.parquet(path).schema
    # glob (not a bare file path) so FileStreamSource doesn't inject a
    # file-valued basePath option into the per-batch read
    raw = spark.readStream.schema(file_schema).parquet(
        os.path.join(sf_dir, "events.parqu*")
    )
    return normalize_ts(raw)


def changelog_stream(
    spark: SparkSession, sf_dir: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """Streaming CDC changelog, replayed from a materialized serialized log.

    The serialized records are written to disk ONCE (deterministic content)
    and the stream reads them back — exactly Kafka's role: the broker stores
    serialized bytes, consumers parse each record once. Building the
    changelog inline in the streaming plan instead would let Catalyst
    re-inline the to_json into every downstream from_json/filter (the
    serialize would run up to 4x per record — no cache boundary exists in a
    streaming plan to stop it)."""
    from cdc_debezium_kafka_airflow_spark.sources.cache_util import (
        cache_is_fresh,
        source_fingerprint,
        write_fingerprint,
    )

    tag = os.path.basename(os.path.normpath(sf_dir))
    replay_dir = os.path.join("/root/repo/.cache", f"changelog_{tag}")
    fp = source_fingerprint(sf_dir, "events")
    if not cache_is_fresh(replay_dir, fp):
        from cdc_debezium_kafka_airflow_spark.sources.tables import load_table

        batch = build_changelog(load_table(spark, sf_dir, "events"))
        batch.write.mode("overwrite").parquet(replay_dir)
        write_fingerprint(replay_dir, fp)
    schema = (
        "offset long, topic string, partition int, key string, value string, "
        "timestamp timestamp"
    )
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        # micro-batch cap — the analog of the reference sink's batch.size
        # (register-postgres-sink.json:6) / Kafka's maxOffsetsPerTrigger;
        # with the replay log's 32 files this forces a multi-batch run that
        # exercises cross-batch state merging
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    return reader.parquet(replay_dir)


def kafka_changelog_stream(
    spark: SparkSession,
    bootstrap_servers: str,
    topic_pattern: str = "mysql-server.pos_bi_db.*",
) -> DataFrame:
    """Real-Kafka source wiring (no broker in this harness — not exercised by
    tests, kept import-safe). Mirrors the reference's consumed topic list
    (register-postgres-sink.json:9)."""
    return (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribePattern", topic_pattern)
        .option("startingOffsets", "earliest")
        .load()
        .select(
            F.col("offset"),
            F.col("topic"),
            F.col("partition"),
            F.col("key").cast("string").alias("key"),
            F.col("value").cast("string").alias("value"),
            F.col("timestamp"),
        )
    )


# Historical note: when the CDC stream built its changelog inline
# (to_json -> from_json in ONE streaming plan), PushDownPredicates +
# CollapseProject re-inlined the serialize into every downstream filter and
# projection (measured 4x wall-clock), worked around by a scoped
# excludedRules override. The STRUCTURAL fix is the materialized replay log
# (changelog_stream): the stream reads already-serialized records — exactly
# Kafka's role — so each record is parsed once and there is nothing for the
# optimizer to re-inline. Measured with default rules: identical timings and
# results across all three upsert variants; no planner knobs remain.


def _run_to_memory(df: DataFrame, mode: str, parts: str | None = None) -> DataFrame:
    """Run an availableNow streaming query into a memory sink; return result.

    The memory table lives in driver memory independent of the checkpoint, so
    the throwaway tmpfs checkpoint is removed as soon as the query drains.

    ``parts`` caps ``spark.sql.shuffle.partitions`` for THIS query (restored
    after): a stateful operator opens/commits one state store per shuffle
    partition per trigger, so small-state window aggs (hundreds of groups)
    waste most of their wall-clock on store lifecycle at the session default
    of 32 — measured 6.7s -> 1.05s for the 1-day tumbling agg at sf0.1 with
    parts=8. On a real cluster this is sized to executor cores x
    per-partition state, exactly like the stream-stream join's cap."""
    import shutil

    spark = df.sparkSession
    name = f"memsink_{next(_MEMSINK_IDS)}"
    ck = temp_checkpoint_dir()
    prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
    if parts is not None:
        spark.conf.set("spark.sql.shuffle.partitions", parts)
    try:
        q = (
            df.writeStream.format("memory")
            .queryName(name)
            .outputMode(mode)
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        if parts is not None:
            spark.conf.set("spark.sql.shuffle.partitions", prev_parts)
        shutil.rmtree(ck, ignore_errors=True)
    return spark.table(name)


def windowed_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``stream_tumbling``: 1-day tumbling-window counts/sums per event type,
    computed by a real streaming query (complete mode, availableNow)."""
    agg = (
        events_stream(spark, sf_dir)
        .groupBy(F.window("ts", "1 day").alias("win"), F.col("event_type"))
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
    )
    out = _run_to_memory(agg, "complete", parts="8")
    return out.select(
        F.col("win.start").alias("day_start"),
        "event_type",
        "n_events",
        "sum_value",
    )


def windowed_event_counts_watermarked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``stream_watermark``: same window agg under a 1-day watermark in append
    mode — only closed windows are emitted (late-data bound)."""
    agg = (
        events_stream(spark, sf_dir)
        .withWatermark("ts", "1 day")
        .groupBy(F.window("ts", "1 day").alias("win"), F.col("event_type"))
        .agg(F.count("*").alias("n_events"))
    )
    out = _run_to_memory(agg, "append", parts="8")
    return out.select(
        F.col("win.start").alias("day_start"), "event_type", "n_events"
    )


def chained_window_aggs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``stream_chained_agg``: TWO stateful windowed aggregations chained in
    ONE streaming query (Spark 3.4+ multi-agg streams): hourly counts/sums
    per event type, re-aggregated into daily totals WITHOUT leaving the
    stream — the continuous-rollup topology that otherwise needs two jobs
    and an intermediate topic. Append mode end-to-end: an hourly window
    flows downstream when it closes, a daily window emits when the
    watermark passes its end; the oracle reproduces the final cut
    (day_end <= max(ts) - delay) relationally."""
    ev = events_stream(spark, sf_dir).withWatermark("ts", "1 day")
    hourly = ev.groupBy(
        F.window("ts", "1 hour").alias("hwin"), F.col("event_type")
    ).agg(
        F.count("*").alias("n_events"),
        F.sum(F.round(F.col("value") * 10000).cast("long")).alias(
            "sum_scaled"
        ),
    )
    daily = hourly.groupBy(
        F.window(F.col("hwin"), "1 day").alias("dwin"), F.col("event_type")
    ).agg(
        F.sum("n_events").alias("n_events"),
        F.sum("sum_scaled").alias("sum_scaled"),
        F.count("*").alias("n_hours_active"),
    )
    out = _run_to_memory(daily, "append", parts="8")
    return out.select(
        F.col("dwin.start").alias("day_start"),
        "event_type",
        "n_events",
        (F.col("sum_scaled") / F.lit(10000.0)).alias("sum_value"),
        "n_hours_active",
    )


def stateful_restart_windowed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``stream_stateful_restart``: a WATERMARKED WINDOWED AGGREGATION
    survives a query restart — phase 1 (events before day 15) runs under a
    checkpoint and stops; a NEW query object on the SAME checkpoint ingests
    the rest. Window state and the watermark are restored from the state
    store, so windows spanning the boundary accumulate across both
    processes and the final emitted set is identical to a never-restarted
    run: every 1-day window closed by the end watermark, with full counts.
    (The split is by event time, so phase 2 carries no late data and the
    oracle stays closed-form.)"""
    import shutil

    from cdc_debezium_kafka_airflow_spark.sources.tables import load_table

    tag = os.path.basename(os.path.normpath(sf_dir))
    base = os.path.join("/root/repo/.cache", f"stateful_restart_{tag}")
    shutil.rmtree(base, ignore_errors=True)
    src_dir = os.path.join(base, "source")
    ckpt = os.path.join(base, "checkpoint")
    out_dir = os.path.join(base, "out")

    ev = load_table(spark, sf_dir, "events").select("ts", "event_type")
    # mid-DAY cut: the day-15 window accumulates across BOTH processes, so
    # a dropped/unreread state store would visibly undercount it
    cut = "2024-01-15 12:00:00"
    ev.filter(F.col("ts") < cut).coalesce(2).write.parquet(src_dir)
    schema = spark.read.parquet(src_dir).schema

    def run_once() -> None:
        stream = spark.readStream.schema(schema).parquet(
            os.path.join(src_dir, "*.parquet")
        )
        agg = (
            stream.withWatermark("ts", "1 day")
            .groupBy(F.window("ts", "1 day").alias("win"), F.col("event_type"))
            .agg(F.count("*").alias("n_events"))
            .select(
                F.col("win.start").alias("day_start"),
                "event_type",
                "n_events",
            )
        )
        q = (
            agg.writeStream.format("parquet")
            .outputMode("append")
            .option("path", out_dir)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    run_once()  # phase 1 commits state + offsets, process "dies"
    ev.filter(F.col("ts") >= cut).coalesce(2).write.mode("append").parquet(
        src_dir
    )
    run_once()  # restart: state restored, remaining windows accumulate

    return spark.read.parquet(out_dir)


def dual_sink_medallion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``stream_dual_sink``: ONE trigger feeds TWO sinks — the medallion
    fan-out (bronze: raw append; silver: running per-status aggregate)
    without a second stream or an intermediate topic. foreachBatch is the
    multiplexer: the batch frame is persisted once, written to the bronze
    parquet append AND upserted into the silver summary, then released —
    both sinks see exactly the same micro-batch, and both are
    replay-idempotent: each writes mode=overwrite into a
    batch-id-versioned directory, so a crash-replayed batch replaces its
    own output instead of duplicating it.

    Returns bronze's per-status aggregate UNIONed with silver's content —
    the oracle proves both sinks carry the same truth."""
    import shutil

    from cdc_debezium_kafka_airflow_spark.sources.tables import load_table

    tag = os.path.basename(os.path.normpath(sf_dir))
    base = os.path.join("/root/repo/.cache", f"dual_sink_{tag}")
    shutil.rmtree(base, ignore_errors=True)
    src_dir = os.path.join(base, "source")
    bronze = os.path.join(base, "bronze")
    silver = os.path.join(base, "silver")
    ck = os.path.join(base, "ck")

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    orders.coalesce(4).write.parquet(src_dir)
    schema = spark.read.parquet(src_dir).schema
    stream = spark.readStream.schema(schema).parquet(
        os.path.join(src_dir, "*.parquet")
    )

    def fan_out(batch_df: DataFrame, batch_id: int) -> None:
        # replay idempotence: BOTH sinks write mode=overwrite into a
        # batch-id-versioned directory — a crash-replayed micro-batch
        # REPLACES its own output instead of duplicating it (a plain
        # append would be at-least-once; the manifest-committed Python
        # sink, snk_pydatasource_stream, is the other exactly-once shape)
        batch_df.persist()
        try:
            batch_df.write.mode("overwrite").parquet(
                os.path.join(bronze, f"batch={batch_id}")
            )
            # integer-scaled cents: silver re-sums per-batch sums, and
            # nested double summation is the hash-boundary class ROADMAP #7
            # documents — scaled BIGINTs stay exact through both levels
            agg = batch_df.groupBy("o_orderstatus").agg(
                F.count("*").alias("n_orders"),
                F.sum(
                    F.round(F.col("o_totalprice") * 100).cast("long")
                ).alias("revenue_cents"),
            )
            agg.write.mode("overwrite").parquet(
                os.path.join(silver, f"batch={batch_id}")
            )
        finally:
            batch_df.unpersist()

    q = (
        stream.writeStream.foreachBatch(fan_out)
        .option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    b = (
        spark.read.parquet(bronze)
        .groupBy("o_orderstatus")
        .agg(
            F.count("*").alias("n_orders"),
            F.round(
                F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
                / 100.0,
                2,
            ).alias("revenue"),
        )
        .withColumn("sink", F.lit("bronze"))
    )
    sv = (
        spark.read.parquet(silver)
        .groupBy("o_orderstatus")
        .agg(
            F.sum("n_orders").alias("n_orders"),
            F.round(F.sum("revenue_cents") / 100.0, 2).alias("revenue"),
        )
        .withColumn("sink", F.lit("silver"))
    )
    return b.unionByName(sv)


def stream_stream_interval_join(
    spark: SparkSession, sf_dir: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """Stream-stream INNER join with event-time interval bounds: orders and
    lineitem replayed as two independent file streams, joined on key AND
    ``l_shipdate`` within [o_orderdate, o_orderdate + 120 days].

    The interval condition + both-side watermarks are what make this
    tractable on unbounded streams: each side's state store can evict a row
    once the other side's watermark passes its join-window end, so state
    size is bounded by the 120-day window × arrival rate, not by stream
    length. The watermark here is sized to the replay (nothing may drop —
    the fixture is replayed history, not late data), which keeps the result
    deterministic and oracle-comparable; a live deployment would tighten it
    to its real out-of-orderness bound.

    Returns the streamed join rows aggregated per order priority (the
    aggregation runs as a batch query over the sink — one stateful operator
    per streaming query keeps the append-mode semantics exact).
    """
    o_schema = load_table(spark, sf_dir, "orders").schema
    l_schema = load_table(spark, sf_dir, "lineitem").schema
    reader_o = spark.readStream.schema(o_schema)
    reader_l = spark.readStream.schema(l_schema)
    if max_files_per_trigger is not None:
        reader_o = reader_o.option("maxFilesPerTrigger", str(max_files_per_trigger))
        reader_l = reader_l.option("maxFilesPerTrigger", str(max_files_per_trigger))
    # watermarks require zoned TIMESTAMP; the NTZ source columns are UTC by
    # fixture convention (session tz is pinned UTC in apply_runtime_confs)
    orders = reader_o.parquet(os.path.join(sf_dir, "orders.parqu*")).select(
        "o_orderkey",
        "o_orderpriority",
        F.col("o_orderdate").cast("timestamp").alias("o_orderdate"),
    ).withWatermark("o_orderdate", "3650 days")
    lineitem = reader_l.parquet(os.path.join(sf_dir, "lineitem.parqu*")).select(
        "l_orderkey",
        "l_extendedprice",
        "l_discount",
        F.col("l_shipdate").cast("timestamp").alias("l_shipdate"),
    ).withWatermark("l_shipdate", "3650 days")
    joined = lineitem.join(
        orders,
        F.expr(
            "l_orderkey = o_orderkey"
            " AND l_shipdate >= o_orderdate"
            " AND l_shipdate <= o_orderdate + INTERVAL 120 DAYS"
        ),
    ).select("o_orderpriority", "l_extendedprice", "l_discount")
    # A stream-stream join keeps FOUR state stores per shuffle partition
    # (keyed rows + numValues, each side); per-store open/commit overhead
    # dominates a single-trigger replay, so cap the join's shuffle width —
    # parts=4 measured best at sf0.1 (r09 sweep: 8->4 is another ~18%).
    # An INNER join emits only on match, never on eviction, so the
    # trailing no-data micro-batch buys nothing but a second full state
    # commit — skipping it is semantics-free here (identical 29,071 rows
    # at sf0.1; r08->r09 trim, 5.9s -> 3.0s warm) and MUST NOT be copied
    # to the outer variants, whose null-extended rows only emit in that
    # batch. On a real cluster these knobs are sized to executor cores ×
    # per-partition state, not left at the SQL default (restored after).
    prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
    prev_nd = spark.conf.get("spark.sql.streaming.noDataMicroBatches.enabled")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    spark.conf.set("spark.sql.streaming.noDataMicroBatches.enabled", "false")
    try:
        out = _run_to_memory(joined, "append")
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_parts)
        spark.conf.set(
            "spark.sql.streaming.noDataMicroBatches.enabled", prev_nd
        )
    return out.groupBy("o_orderpriority").agg(
        F.count("*").alias("n_lineitems"),
        F.round(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
        ).alias("revenue"),
    )


def streaming_upsert_state(
    spark: SparkSession, sf_dir: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """``stream_dedup_state``: keyed latest-state CDC materialization running
    in the streaming state store (complete-mode max_by aggregation), then the
    delete filter applied to the materialized result.

    Equivalent to batch ``upsert_materialize`` — the state store holds one
    struct per live (table, key)."""
    unwrapped = unwrap(split_dlq(parse_envelope(changelog_stream(spark, sf_dir, max_files_per_trigger)))[0])
    # Keyed state is small (live keys, ~6.7k at sf0.1) — per-partition
    # state-store lifecycle at the session default of 32 cost more than
    # the agg itself (r08 watch-trio member; 2.4s -> 1.3s with the cap).
    # This is the JVM max_by agg path: the Arrow-volume inversion note on
    # stateful_upsert_apply_in_pandas does NOT apply here.
    out = _run_to_memory(_state_upsert_agg(unwrapped), "complete", parts="8")
    return _drop_deleted(out)


def _state_upsert_agg(unwrapped: DataFrame) -> DataFrame:
    return unwrapped.groupBy("table_name", "key_id").agg(
        F.max_by(F.struct("is_delete", "after"), "offset").alias("last"),
        F.max("offset").alias("last_offset"),
    )


def _drop_deleted(out: DataFrame) -> DataFrame:
    return out.filter(~F.col("last.is_delete")).select(
        "table_name", "last_offset", "last.after.*"
    )


def state_store_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming-state OBSERVABILITY via Spark's state data source: run the
    checkpointed state-store upsert once (availableNow), then read the
    state store back with ``spark.read.format("statestore")`` and project
    the live aggregation buffers.

    This is the engine-native analog of the reference's lag/health probes —
    instead of polling a Connect REST endpoint, an operator can query the
    actual keyed state a streaming job holds (every live (table, key) and
    whether its latest image is a delete) without touching the job. The
    checkpoint is fingerprint-cached like the changelog replay log, so
    repeated audits reuse the committed state.
    """
    from cdc_debezium_kafka_airflow_spark.sources.cache_util import (
        cache_is_fresh,
        source_fingerprint,
        write_fingerprint,
    )

    tag = os.path.basename(os.path.normpath(sf_dir))
    ck = os.path.join("/root/repo/.cache", f"upsert_ck_{tag}")
    fp = source_fingerprint(sf_dir, "events")
    if not cache_is_fresh(ck, fp):
        import shutil

        shutil.rmtree(ck, ignore_errors=True)
        unwrapped = unwrap(
            split_dlq(parse_envelope(changelog_stream(spark, sf_dir)))[0]
        )
        name = f"memsink_{next(_MEMSINK_IDS)}"
        q = (
            _state_upsert_agg(unwrapped)
            .writeStream.format("memory")
            .queryName(name)
            .outputMode("complete")
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        write_fingerprint(ck, fp)
    state = spark.read.format("statestore").load(ck)
    # the value side is the aggregation BUFFER: max_by keeps
    # (valueWithExtremumOrdering=the image struct, extremumOrdering=offset)
    # and the plain max(offset) buffer sits alongside as `max`
    return state.select(
        F.col("key.table_name").alias("table_name"),
        F.col("key.key_id").alias("key_id"),
        F.col("value.max").alias("last_offset"),
        F.col("value.valueWithExtremumOrdering.is_delete").alias("is_delete"),
    )


def pydatasource_stream_upsert(
    spark: SparkSession,
    sf_dir: str,
    max_records_per_batch: int | None = None,
    progress_sink: list | None = None,
) -> DataFrame:
    """The custom Python streaming source driving the JVM state store: the
    ``cdc_changelog`` connector (sources/pydatasource.py) replays the binlog
    in bounded micro-batches (its offsets advance at most
    ``maxRecordsPerBatch`` rows per trigger — by default 4 batches), and the
    keyed max_by aggregation accumulates cross-batch state exactly like the
    file-replay variant. ``processAllAvailable`` drains the source to its
    end before the sink is read (the bounded-advance analog of
    availableNow, which would stop at the FIRST latestOffset call).
    """
    from cdc_debezium_kafka_airflow_spark.sources.pydatasource import (
        ChangelogDataSource,
    )

    spark.dataSource.register(ChangelogDataSource)
    reader = spark.readStream.format("cdc_changelog").option(
        "path", os.path.join(sf_dir, "events.parquet")
    )
    if max_records_per_batch is not None:
        reader = reader.option("maxRecordsPerBatch", str(max_records_per_batch))
    ch = reader.load()
    unwrapped = unwrap(split_dlq(parse_envelope(ch))[0])
    name = f"memsink_{next(_MEMSINK_IDS)}"
    # Same state-store sizing rationale as stream_stream_interval_join: the
    # keyed state is small (~tables × users), so per-store open/commit across
    # the default 32 shuffle partitions × 4 micro-batches dominates. 8 keeps
    # every core busy on the Python source tasks while quartering state
    # overhead (14s -> 8s at sf0.1; restored after).
    import shutil

    prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    ck = temp_checkpoint_dir()
    q = None
    try:
        q = (
            _state_upsert_agg(unwrapped)
            .writeStream.format("memory")
            .queryName(name)
            .outputMode("complete")
            .option("checkpointLocation", ck)
            .trigger(processingTime="0 seconds")
            .start()
        )
        q.processAllAvailable()
        if progress_sink is not None:
            progress_sink.extend(
                p["numInputRows"]
                for p in q.recentProgress
                if p["numInputRows"] > 0
            )
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_parts)
        # stop INSIDE the finally: if processAllAvailable raised, the
        # processingTime stream is still live — removing its checkpoint
        # first would leave a zombie query failing commits in the
        # background of the shared session
        try:
            if q is not None:
                q.stop()
                q.awaitTermination()
        finally:
            shutil.rmtree(ck, ignore_errors=True)
    return _drop_deleted(spark.table(name))


# Shared by the two Python-stateful upsert variants (applyInPandasWithState
# and transformWithStateInPandas): flat input projection, output/state
# schemas, and the update-mode sink reduction to the final image.
_UPSERT_OUT_SCHEMA = (
    "table_name string, key_id long, last_offset long, is_delete boolean, "
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)
_UPSERT_STATE_SCHEMA = (
    "last_offset long, is_delete boolean, event_id long, ts timestamp, "
    "user_id long, event_type string, value double, props string"
)
_UPSERT_OUT_COLS = [
    "table_name", "key_id", "last_offset", "is_delete",
    "event_id", "ts", "user_id", "event_type", "value", "props",
]


def _flat_unwrapped(spark: SparkSession, sf_dir: str,
                    max_files_per_trigger: int | None) -> DataFrame:
    unwrapped = unwrap(
        split_dlq(
            parse_envelope(changelog_stream(spark, sf_dir, max_files_per_trigger))
        )[0]
    )
    return unwrapped.select(
        "table_name", "key_id", "offset", "is_delete",
        F.col("after.event_id").alias("event_id"),
        F.col("after.ts").alias("ts"),
        F.col("after.user_id").alias("user_id"),
        F.col("after.event_type").alias("event_type"),
        F.col("after.value").alias("value"),
        F.col("after.props").alias("props"),
    )


def _best_of_batches(best, pdfs):
    """Fold arrow batches into the winning (max-offset) image tuple.

    Hot path: called once per key per micro-batch across every stateful
    upsert stream. Round-12 trim (guide §4.2): numpy argmax + positional
    `.iat` column access replaces `.loc[idxmax]`, which materialized a
    typed pandas Series per key (~3x the per-group cost); the winning-row
    comparison happens BEFORE the 8-field extraction, so a losing batch
    costs one argmax and nothing else. Same winner: argmax and idxmax both
    return the first maximal position."""
    import pandas as pd

    for pdf in pdfs:
        if len(pdf) == 0:
            continue
        i = int(pdf["offset"].to_numpy().argmax())
        off = int(pdf["offset"].iat[i])
        if best is not None and off <= best[0]:
            continue
        event_id = pdf["event_id"].iat[i]
        ts = pdf["ts"].iat[i]
        user_id = pdf["user_id"].iat[i]
        event_type = pdf["event_type"].iat[i]
        value = pdf["value"].iat[i]
        props = pdf["props"].iat[i]
        best = (
            off,
            bool(pdf["is_delete"].iat[i]),
            None if pd.isna(event_id) else int(event_id),
            None if pd.isna(ts) else ts,
            None if pd.isna(user_id) else int(user_id),
            None if event_type is None else str(event_type),
            None if pd.isna(value) else float(value),
            None if props is None else str(props),
        )
    return best


def _final_upsert_image(out: DataFrame) -> DataFrame:
    """update-mode sink holds one row per key per micro-batch: reduce to the
    final image, then apply delete semantics."""
    final = out.groupBy("table_name", "key_id").agg(
        F.max_by(
            F.struct(
                "is_delete", "event_id", "ts", "user_id", "event_type",
                "value", "props",
            ),
            "last_offset",
        ).alias("last"),
        F.max("last_offset").alias("last_offset"),
    )
    return final.filter(~F.col("last.is_delete")).select(
        "table_name",
        "last_offset",
        F.col("last.event_id").alias("event_id"),
        F.col("last.ts").alias("ts"),
        F.col("last.user_id").alias("user_id"),
        F.col("last.event_type").alias("event_type"),
        F.col("last.value").alias("value"),
        F.col("last.props").alias("props"),
    )


def stateful_upsert_transform_with_state(
    spark: SparkSession, sf_dir: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """Custom stateful streaming operator via ``transformWithStateInPandas``
    (Spark 4's arbitrary-state API, the successor to
    ``applyInPandasWithState``): keyed last-write-wins upsert with delete
    semantics held in a typed ``ValueState`` handle.

    Differences from the older API that matter at scale: state is addressed
    through named typed handles (value/list/map) instead of one opaque
    tuple, TTL is per-state-handle, timers are first-class, and the runtime
    requires the RocksDB state-store provider — the one that keeps state
    off-heap and incrementally checkpointable, i.e. the provider a 100 TB
    deployment runs anyway.

    GATED (like sources/kafka.py): the transformWithState state protocol
    talks protobuf to the JVM state server, and ``google.protobuf`` is not
    installed in this container (no pip) — the wiring is correct and the
    equality test runs wherever protobuf exists
    (tests/test_streaming.py::test_transform_with_state_upsert_equals_batch
    skips cleanly here).
    """
    try:
        from google.protobuf import descriptor  # noqa: F401
    except ImportError as e:
        raise ImportError(
            "transformWithStateInPandas requires the protobuf package "
            "(pip install protobuf) for its state-server protocol"
        ) from e

    import pandas as pd

    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    flat = _flat_unwrapped(spark, sf_dir, max_files_per_trigger)
    state_schema = _UPSERT_STATE_SCHEMA
    out_cols = _UPSERT_OUT_COLS

    class UpsertProcessor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._last = handle.getValueState("last", state_schema)

        def handleInputRows(self, key, rows, timerValues):
            best = tuple(self._last.get()) if self._last.exists() else None
            best = _best_of_batches(best, rows)
            self._last.update(best)
            yield pd.DataFrame([(key[0], key[1]) + best], columns=out_cols)

        def close(self) -> None:
            pass

    latest = flat.groupBy("table_name", "key_id").transformWithStateInPandas(
        statefulProcessor=UpsertProcessor(),
        outputStructType=_UPSERT_OUT_SCHEMA,
        outputMode="update",
        timeMode="none",
    )
    # transformWithState requires RocksDB; cap the state shuffle width like
    # the applyInPandasWithState variant (few hundred keys). Both confs are
    # restored after the run (single-threaded harness assumption, see
    # ADVICE: scope via spark.newSession() if ever run concurrently).
    prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
    prev_provider = spark.conf.get(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.HDFSBackedStateStoreProvider",
    )
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        out = _run_to_memory(latest, "update")
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_parts)
        spark.conf.set(
            "spark.sql.streaming.stateStore.providerClass", prev_provider
        )
    return _final_upsert_image(out)


def stateful_upsert_apply_in_pandas(
    spark: SparkSession, sf_dir: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """Custom stateful streaming operator via ``applyInPandasWithState``:
    keyed last-write-wins upsert with delete semantics, state = one row image
    per live (table, key).

    This is the escape hatch for stateful semantics Spark's built-in
    operators can't express; here it intentionally re-implements
    upsert_materialize so the result is oracle-checkable. Arrow moves each
    key-group batch to Python; state is a single flat tuple per key, so
    state-store size is bounded by live keys, not stream length.
    """
    import pandas as pd

    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    flat = _flat_unwrapped(spark, sf_dir, max_files_per_trigger)

    def update(key, pdfs, state: "GroupState"):
        best = tuple(state.get) if state.exists else None
        best = _best_of_batches(best, pdfs)
        state.update(best)
        yield pd.DataFrame([(key[0], key[1]) + best], columns=_UPSERT_OUT_COLS)

    latest = flat.groupBy("table_name", "key_id").applyInPandasWithState(
        update,
        _UPSERT_OUT_SCHEMA,
        _UPSERT_STATE_SCHEMA,
        "update",
        GroupStateTimeout.NoTimeout,
    )
    # Width re-measured in round 3: the round-2 8-partition cap (then
    # 14s->6s) INVERTED once the parse lineage got cheaper — the Arrow
    # transfer of ~600k rows through the Python state workers now dominates,
    # and wider state shuffles win (8 parts 7.1s, 16 5.3s, 32 4.5s at
    # sf0.1). Keep the session default (32) — per-store overhead is noise
    # next to the Arrow volume.
    out = _run_to_memory(latest, "update")
    return _final_upsert_image(out)


def retrying_foreach_batch(
    fn,
    max_attempts: int = 3,
    backoff_s: float = 0.05,
    attempt_log: list | None = None,
):
    """``ctl_retry``: bounded per-micro-batch retry with exponential backoff
    — the engine-native analog of the reference DAGs' task ``retries`` /
    ``retry_delay`` (reference dags/cdc_health_check_dag.py default_args).
    Where Airflow re-runs a whole task, Structured Streaming's unit of
    recovery is the micro-batch: the wrapper re-invokes the foreachBatch
    body, so the body must be idempotent under replay (the MERGE sink's
    ``last_offset`` guard provides exactly that — partial side effects from
    a failed attempt are absorbed, the same reasoning that makes the sink
    safe under Spark's own at-least-once redelivery). After the final
    attempt the error propagates and fails the query: retry hides TRANSIENT
    faults; persistent faults must surface, not loop. ``attempt_log``
    (driver-side) records each failure for the monitoring surface."""
    import time as _time

    def wrapped(batch: DataFrame, batch_id: int) -> None:
        for attempt in range(1, max_attempts + 1):
            try:
                fn(batch, batch_id)
                return
            except Exception as exc:  # noqa: BLE001 — resilience boundary
                if attempt_log is not None:
                    attempt_log.append(
                        {
                            "batch_id": batch_id,
                            "attempt": attempt,
                            "error": f"{type(exc).__name__}: {exc}"[:200],
                        }
                    )
                if attempt == max_attempts:
                    raise
                _time.sleep(backoff_s * (2 ** (attempt - 1)))

    return wrapped


def foreach_batch_upsert(
    spark: SparkSession,
    sf_dir: str,
    max_files_per_trigger: int | None = None,
    fault_injector=None,
    max_attempts: int = 1,
    attempt_log: list | None = None,
    db_suffix: str = "",
) -> DataFrame:
    """``snk_jdbc_upsert``: micro-batch MERGE into a REAL external JDBC table.

    Each micro-batch collapses to its per-key latest image, stages it over
    ``DataFrameWriter.jdbc``, and executes a genuine ``MERGE INTO`` against
    the target table in an external relational database (embedded Apache
    Derby — the JDBC engine shipped with Spark; in production the URL points
    at MySQL/Postgres and the statement is the dialect's upsert, e.g.
    Postgres ``INSERT ... ON CONFLICT`` — exactly the reference sink,
    register-postgres-sink.json:15-17).

    Cross-batch state lives in the DATABASE, not in driver-held DataFrame
    lineage: the sink survives driver restart, and per-batch merge cost is
    proportional to the batch's key count, not to accumulated history. The
    guard ``s.last_offset > t.last_offset`` makes replayed batches (at-least-
    once delivery) idempotent — the exactly-once-sink pattern.

    ``fault_injector(batch_id, attempt)`` (ctl_retry demo/tests) is called
    mid-protocol — after the stage write, before the MERGE — so an injected
    failure leaves a REAL partial side effect for the retry to absorb;
    ``max_attempts > 1`` wraps the batch body in ``retrying_foreach_batch``.
    """
    tag = os.path.basename(os.path.normpath(sf_dir)) + db_suffix
    # _v2: sink table schema version (join_hash surrogate key). The stage
    # and target tables are TRUNCATE-reused across runs, so a schema change
    # must move to a fresh database — truncate preserves the old columns.
    # Process-scoped path (VERDICT r11 #7): Derby's db boot lock is
    # exclusive per directory; a shared path made concurrent harness
    # processes on one tree fail each other's boots. Restart-survival is
    # unaffected — the db outlives any SparkSession in this process.
    from cdc_debezium_kafka_airflow_spark.sources.cache_util import (
        process_scoped_db_path,
    )

    url = (
        f"jdbc:derby:{process_scoped_db_path(f'derby_sink_v2_{tag}')}"
        ";create=true"
    )
    props = {"driver": "org.apache.derby.jdbc.EmbeddedDriver"}
    cols = [
        "table_name", "key_id", "last_offset", "is_delete",
        "event_id", "ts", "user_id", "event_type", "value", "props",
    ]
    # Spark's Derby dialect maps StringType to CLOB (and binds string values
    # as CLOB, so VARCHAR columns can't be written at all). A CLOB join key
    # forces the MERGE into a per-row-cast nested loop (measured ~4-5s per
    # micro-batch at sf0.1). Fix: a numeric surrogate join key
    # xxhash64(table_name, key_id) — BIGINT, indexable — drives the join;
    # the CLOB-cast equality stays only as a RESIDUAL predicate evaluated on
    # index-matched candidates, so hash collisions cannot corrupt the sink
    # and Derby never cross-compares CLOBs. This is the generic
    # surrogate-hash-key pattern for warehouse MERGEs over wide/string keys.
    #
    # The upsert statement itself is DIALECT-DISPATCHED from the JDBC url
    # (streaming/dialects.py): Derby renders MERGE INTO; a production
    # jdbc:postgresql:// url renders INSERT ... ON CONFLICT — the exact
    # reference sink statement (register-postgres-sink.json:10,15).
    from cdc_debezium_kafka_airflow_spark.streaming.dialects import (
        UpsertDialect,
    )

    dialect = UpsertDialect.for_url(url)
    merge_sql = dialect.upsert_sql(
        "CDC_TARGET", "CDC_STAGE", cols, version_col="last_offset"
    )
    created = {"done": False}
    attempts: dict[int, int] = {}
    # per-batch persisted image, released in an outer finally once the batch
    # is DONE (committed or abandoned after the last retry) — retry attempts
    # in between reuse the cache; a permanently-failed batch must not leak
    # executor storage on a long-running stream.
    cached: dict[int, DataFrame] = {}

    def _write(df: DataFrame, table: str) -> None:
        # truncate=true: Spark TRUNCATEs an existing stage table instead of
        # DROP+CREATE per micro-batch (ROADMAP item 9's persistent-stage-
        # table pattern)
        df.write.option("truncate", "true").jdbc(
            url, table, mode="overwrite", properties=props
        )

    def _exec_sql(sql: str) -> None:
        conn = spark._jvm.java.sql.DriverManager.getConnection(url)
        try:
            st = conn.createStatement()
            st.executeUpdate(sql)
            st.close()
        finally:
            conn.close()

    def merge_batch(batch: DataFrame, batch_id: int) -> None:
        # persist the per-batch image: the stage write consumes it, and a
        # RETRY attempt (ctl_retry) rebuilds the same canonical plan, so the
        # cache serves attempt 2+ instead of re-running the parse lineage.
        # Deliberately NOT unpersisted here on failure — release happens in
        # the outer per-batch finally (after the retry loop gives up or the
        # batch commits), so the cache serves retries without leaking.
        flat = (
            batch.groupBy("table_name", "key_id")
            .agg(
                F.max_by(F.struct("is_delete", "after"), "offset").alias("last"),
                F.max("offset").alias("last_offset"),
            )
            .select(
                F.xxhash64("table_name", "key_id").alias("join_hash"),
                "table_name",
                "key_id",
                "last_offset",
                F.col("last.is_delete").alias("is_delete"),
                F.col("last.after.*"),
            )
            .persist()
        )
        cached[batch_id] = flat
        if not created["done"]:
            _write(flat, "CDC_TARGET")
            try:
                _exec_sql(dialect.key_index_sql("CDC_TARGET"))
            except Exception as exc:
                # only swallow the engine's "object already exists" (a
                # pre-existing index from a truncated prior run); any other
                # DDL failure would leave the upsert unindexed and silently
                # slow, so it must surface.
                if not dialect.is_already_exists(exc):
                    raise
            created["done"] = True
            return
        _write(flat, "CDC_STAGE")
        if fault_injector is not None:
            attempts[batch_id] = attempts.get(batch_id, 0) + 1
            fault_injector(batch_id, attempts[batch_id])
        _exec_sql(merge_sql)

    unwrapped = unwrap(split_dlq(parse_envelope(changelog_stream(spark, sf_dir, max_files_per_trigger)))[0])
    body = (
        merge_batch
        if max_attempts == 1
        else retrying_foreach_batch(
            merge_batch, max_attempts=max_attempts, attempt_log=attempt_log
        )
    )

    def body_release(batch: DataFrame, batch_id: int) -> None:
        # outer finally: the persisted batch image survives intermediate
        # retry attempts (the point of the cache) but is ALWAYS released
        # once the batch commits or is abandoned — no leaked executor
        # storage from permanently-failed batches.
        try:
            body(batch, batch_id)
        finally:
            df = cached.pop(batch_id, None)
            if df is not None:
                df.unpersist()

    import shutil

    ck = temp_checkpoint_dir()
    try:
        q = (
            unwrapped.writeStream.foreachBatch(body_release)
            .outputMode("append")
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        shutil.rmtree(ck, ignore_errors=True)
    back = spark.read.jdbc(url, "CDC_TARGET", properties=props)
    return back.filter(~F.col("is_delete")).select(
        "table_name", "last_offset",
        "event_id", "ts", "user_id", "event_type", "value", "props",
    )


def foreach_batch_upsert_dbapi(
    spark: SparkSession,
    sf_dir: str,
    max_files_per_trigger: int | None = 8,
) -> DataFrame:
    """``snk_jdbc_upsert`` through the SECOND live dialect: the PostgreSQL
    ``INSERT ... ON CONFLICT ... DO UPDATE`` statement — the reference
    deployment's exact production statement (Connect JDBC sink in upsert
    mode, register-postgres-sink.json:15-17) — executed VERBATIM against a
    live engine. No Postgres server exists in this harness; DuckDB speaks
    the same ON CONFLICT dialect (unique-index conflict target, EXCLUDED
    pseudo-row, DO UPDATE ... WHERE guard), so the statement
    ``PostgresOnConflictDialect`` renders runs unmodified over a DB-API
    connection, proving the dialect-dispatch seam with a second engine
    actually driving the SQL (round-4 verdict item 5; the Derby twin
    ``foreach_batch_upsert`` drives MERGE over JDBC).

    Protocol identical to the Derby twin: per-batch latest-image collapse
    (one shuffle), stage, set-based upsert with the ``last_offset``
    newer-wins guard making replays idempotent. The stage transfer here is
    driver-side Arrow->pandas into DuckDB — the harness stand-in for the
    JDBC wire; volume is bounded by the micro-batch, and at production the
    URL points at a real Postgres and the transfer is the JDBC stage write
    (same statement, same guard).
    """
    import duckdb

    from cdc_debezium_kafka_airflow_spark.streaming.dialects import (
        PostgresOnConflictDialect,
    )

    tag = os.path.basename(os.path.normpath(sf_dir))
    db_path = os.path.join("/root/repo/.cache", f"duckdb_sink_{tag}.db")
    for suffix in ("", ".wal"):
        try:
            os.remove(db_path + suffix)
        except OSError:
            pass
    dialect = PostgresOnConflictDialect()
    cols = [
        "table_name", "key_id", "last_offset", "is_delete",
        "event_id", "ts", "user_id", "event_type", "value", "props",
    ]
    upsert_sql = dialect.upsert_sql(
        "CDC_TARGET", "CDC_STAGE", cols, version_col="last_offset"
    )
    con = duckdb.connect(db_path)
    created = {"done": False}

    def merge_batch(batch: DataFrame, batch_id: int) -> None:
        flat = (
            batch.groupBy("table_name", "key_id")
            .agg(
                F.max_by(
                    F.struct("is_delete", "after"), "offset"
                ).alias("last"),
                F.max("offset").alias("last_offset"),
            )
            .select(
                F.xxhash64("table_name", "key_id").alias("join_hash"),
                "table_name",
                "key_id",
                "last_offset",
                F.col("last.is_delete").alias("is_delete"),
                F.col("last.after.*"),
            )
        )
        pdf = flat.toPandas()  # bounded by the micro-batch image
        con.register("stage_df", pdf)
        if not created["done"]:
            con.execute(
                "CREATE TABLE CDC_TARGET AS SELECT * FROM stage_df"
            )
            try:
                con.execute(dialect.key_index_sql("CDC_TARGET"))
            except Exception as exc:
                if not dialect.is_already_exists(exc):
                    raise
            created["done"] = True
        else:
            con.execute(
                "CREATE OR REPLACE TABLE CDC_STAGE AS "
                "SELECT * FROM stage_df"
            )
            con.execute(upsert_sql)
        con.unregister("stage_df")

    unwrapped = unwrap(
        split_dlq(
            parse_envelope(
                changelog_stream(spark, sf_dir, max_files_per_trigger)
            )
        )[0]
    )
    import shutil

    ck = temp_checkpoint_dir()
    try:
        q = (
            unwrapped.writeStream.foreachBatch(merge_batch)
            .outputMode("append")
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        shutil.rmtree(ck, ignore_errors=True)
        back_pdf = con.execute(
            'SELECT "table_name", "last_offset", "event_id", "ts", '
            '"user_id", "event_type", "value", "props" '
            'FROM CDC_TARGET WHERE NOT "is_delete"'
        ).fetch_df()
        con.close()
    return spark.createDataFrame(
        back_pdf,
        "table_name string, last_offset long, event_id long, "
        "ts timestamp, user_id long, event_type string, value double, "
        "props string",
    )


def foreach_batch_scd2(
    spark: SparkSession,
    sf_dir: str,
    max_files_per_trigger: int | None = 8,
) -> DataFrame:
    """STREAMING SCD Type 2 sink: the changelog micro-batches maintain a
    warehouse HISTORY table (validity-interval rows, the standard Debezium
    downstream pattern — the history twin of the upsert sink) in a live
    database, here DuckDB over DB-API (same live-engine seam as
    ``foreach_batch_upsert_dbapi``; production points the same two
    statements at Postgres).

    Set-based two-statement protocol per micro-batch (no per-row logic),
    tolerant of OUT-OF-ORDER arrival (the changelog replay's files are
    hash-partitioned, so a later micro-batch can deliver earlier offsets
    — the same late-data problem a real CDC consumer has):
      1. ACCUMULATE: every batch op (version images AND delete markers)
         lands in the ops table via ``ON CONFLICT DO NOTHING`` on the
         (key, offset) unique index — replays are no-ops;
      2. REPAIR: one windowed ``UPDATE ... FROM`` recomputes the
         validity-interval chain of ONLY the keys the batch touched
         (lead(offset) over each touched key's full accumulated history;
         deletes participate in the window — they close the preceding
         version — but are never current). Cost ∝ touched keys' history,
         never the table; an in-order stream degenerates to the classic
         close-current+insert, and a late op splices itself into the
         chain with its predecessor's valid_to repaired in the same
         statement.

    The oracle is the BATCH SCD2 SQL over the whole log
    (cdc_scd2_history's), so any missed close, double insert, or wrong
    interval across micro-batch boundaries flips the hash.
    """
    import duckdb

    tag = os.path.basename(os.path.normpath(sf_dir))
    db_path = os.path.join("/root/repo/.cache", f"duckdb_scd2_{tag}.db")
    for suffix in ("", ".wal"):
        try:
            os.remove(db_path + suffix)
        except OSError:
            pass
    con = duckdb.connect(db_path)
    created = {"done": False}

    insert_sql = """
        INSERT INTO SCD2_HISTORY
        SELECT join_hash, table_name, key_id, valid_from_offset,
               is_delete, NULL, FALSE,
               event_id, ts, user_id, event_type, value, props
        FROM SCD2_STAGE
        ON CONFLICT DO NOTHING
    """
    # the UPDATE joins on rowid (computed and applied within ONE
    # statement, so rowids are stable): measured 15x over the 4-column
    # key equality join (2.7s -> 0.18s for the sf0.1 protocol); the
    # changed-row guard reads the pre-update values captured in r
    repair_sql = """
        UPDATE SCD2_HISTORY h
        SET valid_to_offset = r.valid_to_offset, is_current = r.is_current
        FROM (
          SELECT rowid AS rid,
                 lead(valid_from_offset) OVER w - 1 AS valid_to_offset,
                 (lead(valid_from_offset) OVER w IS NULL
                  AND NOT is_delete) AS is_current,
                 valid_to_offset AS old_to, is_current AS old_cur
          FROM SCD2_HISTORY
          WHERE join_hash IN (SELECT DISTINCT join_hash FROM SCD2_STAGE)
          WINDOW w AS (PARTITION BY join_hash, table_name, key_id
                       ORDER BY valid_from_offset)
        ) r
        WHERE h.rowid = r.rid
          AND (r.old_to IS DISTINCT FROM r.valid_to_offset
               OR r.old_cur IS DISTINCT FROM r.is_current)
    """

    def scd2_batch(batch: DataFrame, batch_id: int) -> None:
        staged = batch.select(
            F.xxhash64("table_name", "key_id").alias("join_hash"),
            "table_name",
            "key_id",
            F.col("offset").alias("valid_from_offset"),
            "is_delete",
            F.col("after.event_id").alias("event_id"),
            F.col("after.ts").alias("ts"),
            F.col("after.user_id").alias("user_id"),
            F.col("after.event_type").alias("event_type"),
            F.col("after.value").alias("value"),
            F.col("after.props").alias("props"),
        )
        pdf = staged.toPandas()  # bounded by the micro-batch
        con.register("stage_df", pdf)
        if not created["done"]:
            con.execute(
                "CREATE TABLE SCD2_HISTORY ("
                "join_hash BIGINT, table_name VARCHAR, key_id BIGINT, "
                "valid_from_offset BIGINT, is_delete BOOLEAN, "
                "valid_to_offset BIGINT, is_current BOOLEAN, "
                "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, "
                "event_type VARCHAR, value DOUBLE, props VARCHAR)"
            )
            con.execute(
                "CREATE UNIQUE INDEX SCD2_KEY ON SCD2_HISTORY "
                "(join_hash, table_name, key_id, valid_from_offset)"
            )
            created["done"] = True
        con.execute(
            "CREATE OR REPLACE TABLE SCD2_STAGE AS SELECT * FROM stage_df"
        )
        con.execute(insert_sql)
        con.execute(repair_sql)
        con.unregister("stage_df")

    unwrapped = unwrap(
        split_dlq(
            parse_envelope(
                changelog_stream(spark, sf_dir, max_files_per_trigger)
            )
        )[0]
    )
    import shutil

    ck = temp_checkpoint_dir()
    try:
        q = (
            unwrapped.writeStream.foreachBatch(scd2_batch)
            .outputMode("append")
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        shutil.rmtree(ck, ignore_errors=True)
        back_pdf = con.execute(
            "SELECT table_name, key_id, valid_from_offset, "
            "valid_to_offset, is_current, event_id, ts, user_id, "
            "event_type, value, props FROM SCD2_HISTORY "
            "WHERE NOT is_delete"
        ).fetch_df()
        con.close()
    return spark.createDataFrame(
        back_pdf,
        "table_name string, key_id long, valid_from_offset long, "
        "valid_to_offset long, is_current boolean, event_id long, "
        "ts timestamp, user_id long, event_type string, value double, "
        "props string",
    )


def two_gen_replay_dir(spark: SparkSession, sf_dir: str) -> str:
    """Build (fingerprint-cached) the TWO-GENERATION changelog replay log:
    generation 1 = even event_ids with the v1 envelope, generation 2 = odd
    event_ids re-serialized with ``payload.after.ingest_region`` ('eu' for
    even user_id else 'us'). Shared by the mid-stream schema-evolution job
    and the schema-compatibility introspection (cdc_schema_compat)."""
    from cdc_debezium_kafka_airflow_spark.schemas import ENVELOPE_SCHEMA
    from cdc_debezium_kafka_airflow_spark.sources.cache_util import (
        cache_is_fresh,
        source_fingerprint,
        write_fingerprint,
    )
    from cdc_debezium_kafka_airflow_spark.sources.cdc_fixture import (
        JSON_TS_OPTS,
        build_changelog,
    )
    from cdc_debezium_kafka_airflow_spark.sources.tables import load_table

    tag = os.path.basename(os.path.normpath(sf_dir))
    replay_dir = os.path.join("/root/repo/.cache", f"changelog_2gen_{tag}")
    fp = source_fingerprint(sf_dir, "events")
    if not cache_is_fresh(replay_dir, fp):
        events = load_table(spark, sf_dir, "events")
        g1 = build_changelog(events.filter(F.col("event_id") % 2 == 0))
        g1.coalesce(4).write.mode("overwrite").parquet(replay_dir)
        # generation 2: widen payload.after with ingest_region, re-serialize.
        # Tombstones (value null) and malformed (from_json -> null) keep
        # their original value byte-for-byte.
        g2 = build_changelog(events.filter(F.col("event_id") % 2 == 1))
        v = F.from_json("value", ENVELOPE_SCHEMA, JSON_TS_OPTS)
        region = F.when(
            F.get_json_object("key", "$.payload.id").cast("long") % 2 == 0,
            F.lit("eu"),
        ).otherwise(F.lit("us"))
        after = v["payload"]["after"]
        widened = v.withField(
            "payload.after",
            F.when(after.isNotNull(), after.withField("ingest_region", region)),
        )
        g2 = g2.withColumn(
            "value",
            F.when(
                F.col("value").isNotNull() & v["payload"].isNotNull(),
                F.to_json(widened, JSON_TS_OPTS),
            ).otherwise(F.col("value")),
        )
        # second write job => later file mtimes => FileStreamSource schedules
        # generation 2 after generation 1 (the mid-stream part of the demo)
        g2.coalesce(4).write.mode("append").parquet(replay_dir)
        write_fingerprint(replay_dir, fp)
    return replay_dir


def schema_evolving_stream_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema evolution INSIDE a running stream (``auto.evolve=true``,
    reference register-postgres-sink.json:13-14): a two-generation replay
    log where later micro-batches carry a WIDER Debezium envelope — payload
    ``after`` gains an ``ingest_region`` field mid-stream — and the upsert
    sink widens its accumulated state additively (earlier keys get NULL for
    the new column), exactly how a JDBC sink ALTER-TABLE-ADDs on a new
    Connect schema version.

    Mechanics: each micro-batch infers its OWN envelope schema from a sample
    record (``schema_of_json``) — the per-batch analog of Connect reading
    the schema registry version stamped on the record — so generation-2
    batches parse the extra field the fixed v1 StructType would drop. The
    per-batch images fold into driver-held state via ``schema_evolve``
    (additive unionByName) + keyed max_by(offset): last-write-wins across
    generations, union schema at the end.

    Determinism contract (shared with the DuckDB oracle): generation 1 =
    even event_ids (v1 envelope), generation 2 = odd event_ids (after +=
    ingest_region, 'eu' for even user_id else 'us'); tombstones and
    malformed records are dropped by the same rules as the batch path; a
    key is live iff its max-offset record is not a delete; its image came
    from generation 2 iff that max offset is odd.
    """
    from cdc_debezium_kafka_airflow_spark.operators.cdc import schema_evolve
    from cdc_debezium_kafka_airflow_spark.sources.cdc_fixture import (
        JSON_TS_OPTS,
    )

    replay_dir = two_gen_replay_dir(spark, sf_dir)

    schema = (
        "offset long, topic string, partition int, key string, value string, "
        "timestamp timestamp"
    )
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "4")
        .parquet(replay_dir)
    )

    state: dict[str, DataFrame] = {}

    def merge(batch: DataFrame, batch_id: int) -> None:
        rows = batch.filter(F.col("value").isNotNull())
        # per-batch schema version: prefer a sample proving the widest shape
        cand = rows.select("value").filter(
            F.col("value").startswith('{"schema"')
        )
        sample = (
            cand.filter(F.col("value").contains('"ingest_region"'))
            .limit(1)
            .collect()
            or cand.filter(F.col("value").contains('"after"')).limit(1).collect()
            or cand.limit(1).collect()
        )
        if not sample:
            return
        ddl = (
            batch.sparkSession.range(1)
            .select(F.schema_of_json(F.lit(sample[0][0])).alias("s"))
            .first()["s"]
        )
        parsed = rows.withColumn(
            "v", F.from_json("value", ddl, JSON_TS_OPTS)
        ).filter(F.col("v.payload").isNotNull())
        payload_fields = [
            f.name
            for f in parsed.schema["v"].dataType["payload"].dataType.fields
        ]
        sel = [
            F.substring_index("topic", ".", -1).alias("table_name"),
            F.get_json_object("key", "$.payload.id")
            .cast("long")
            .alias("key_id"),
            F.col("offset"),
            F.col("v.payload.op").alias("op"),
        ]
        if "after" in payload_fields:
            sel.append(F.col("v.payload.after.*"))
        cur = parsed.select(*sel).drop("event_id")
        prev = state.get("t")
        if prev is not None:
            cur = schema_evolve(prev, cur)
        state["t"] = (
            cur.groupBy("table_name", "key_id")
            .agg(
                F.max_by(
                    F.struct(
                        *[
                            c
                            for c in cur.columns
                            if c not in ("table_name", "key_id")
                        ]
                    ),
                    "offset",
                ).alias("m")
            )
            .select("table_name", "key_id", "m.*")
            .localCheckpoint(eager=True)
        )

    import shutil

    ck = temp_checkpoint_dir()
    try:
        q = (
            stream.writeStream.foreachBatch(merge)
            .outputMode("append")
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        shutil.rmtree(ck, ignore_errors=True)
    final = state["t"].filter(F.col("op") != "d")
    return final.groupBy("table_name").agg(
        F.count("*").alias("n_live_keys"),
        F.count("ingest_region").alias("n_v2_images"),
    )


def streaming_index_append(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming ANN index maintenance: embeddings arrive as a stream and
    each micro-batch is assigned to its IVF cell (broadcast centroids —
    the index artifact trained ONCE on the corpus snapshot, the real
    index lifecycle) and appended to a cell-partitioned parquet index.
    At 100 TB this is the continuous job that keeps a vector index fresh
    as a training pipeline lands new embeddings: cell id is the storage
    partition key, appends are partition-local, no rebuild.

    Returns a self-audited summary: total indexed rows + a flag comparing
    the streamed index against the one-shot batch assignment — streaming
    accumulation must be EXACTLY the batch result (the same equality
    contract as the CDC upsert twins).
    """
    import shutil

    from cdc_debezium_kafka_airflow_spark.operators.similarity import (
        as_double,
        nearest_cell_assigner,
        normalized,
        train_ivf_centroids,
    )
    from cdc_debezium_kafka_airflow_spark.sources.cache_util import (
        cache_is_fresh,
        source_fingerprint,
        write_fingerprint,
    )
    from cdc_debezium_kafka_airflow_spark.sources.tables import load_table

    tag = os.path.basename(os.path.normpath(sf_dir))
    fp = source_fingerprint(sf_dir, "embeddings")

    # replay source: the corpus as 8 files so the file stream delivers
    # multiple micro-batches (the fixture itself is one file)
    replay_dir = os.path.join("/root/repo/.cache", f"emb_replay_{tag}")
    if not cache_is_fresh(replay_dir, fp):
        load_table(spark, sf_dir, "embeddings").repartition(8).write.mode(
            "overwrite"
        ).parquet(replay_dir)
        write_fingerprint(replay_dir, fp)

    corpus = load_table(spark, sf_dir, "embeddings").select(
        F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("cvec")
    )
    cents = train_ivf_centroids(corpus, k=8, cache_key=fp)
    # the index artifact is 8 x 64 doubles — inline it as expression
    # literals so per-batch assignment is MAP-ONLY (no broadcast exchange,
    # no min_by shuffle; see nearest_cell_expr). The collect is bounded by
    # the centroid count, i.e. the size of the trained index, not the data.
    cent_rows = [
        (r["centroid_id"], r["centroid"]) for r in cents.collect()
    ]

    # build the assigner ONCE — at k=8 it dispatches to the literal-argmin
    # shape whose Column is a plan fragment reused across every
    # micro-batch; at index scale (k in the thousands) the same entry
    # point routes to broadcast join + min_by instead
    assigner = nearest_cell_assigner(
        cent_rows, vec_col="nvec", id_col="vec_id",
        cid_col="cell", d2_col="__d2",
    )

    def assign(df: DataFrame) -> DataFrame:
        v = normalized(
            df.select("vec_id", as_double(F.col("embedding")).alias("vec")),
            "vec",
            "nvec",
        )
        return assigner(v).select("vec_id", "cell")

    index_dir = os.path.join("/root/repo/.cache", f"ann_index_{tag}")
    shutil.rmtree(index_dir, ignore_errors=True)

    file_schema = spark.read.parquet(replay_dir).schema
    # 8 replay files / 4 per trigger = TWO micro-batches — the minimal
    # count that still falsifies cross-batch index accumulation (batch 2
    # must append beside batch 1's partitions, not overwrite); the earlier
    # 4-batch replay exercised that same transition three times over
    stream = (
        spark.readStream.schema(file_schema)
        .option("maxFilesPerTrigger", "4")
        .parquet(replay_dir)
    )

    def append_batch(batch: DataFrame, batch_id: int) -> None:
        # co-locate by the storage partition key before writing: one file
        # per cell per micro-batch instead of (tasks x cells) fragments —
        # at scale this is what keeps a continuously-appended index from
        # dissolving into the small-files problem. Replay idempotence
        # (r11 audit): each micro-batch OVERWRITES its own
        # batch-id-versioned subtree instead of appending at the root —
        # an at-least-once re-delivery replaces its prior output rather
        # than duplicating index rows (same idiom as stream_dual_sink);
        # readers partition-discover batch=*/cell=* and prune on cell
        # exactly as before.
        assign(batch).repartition("cell").write.mode("overwrite").partitionBy(
            "cell"
        ).parquet(os.path.join(index_dir, f"batch={batch_id}"))

    # per-micro-batch assign() shuffles ~corpus/4 rows; 8 partitions keeps
    # the per-batch shuffle overhead proportional to the batch (restored
    # after — same sizing note as stream_stream_interval_join)
    prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    ck = temp_checkpoint_dir()
    try:
        q = (
            stream.writeStream.foreachBatch(append_batch)
            .outputMode("append")
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_parts)
        shutil.rmtree(ck, ignore_errors=True)

    # single-action audit: one full-outer join scans the streamed index and
    # the batch assignment ONCE and yields both the coverage count (non-null
    # streamed side) and the mismatch count in the same aggregation — the
    # previous two-action version (mismatch count, then a separate
    # streamed.count()) re-read the index and re-planned the join.
    streamed = spark.read.parquet(index_dir).select(
        "vec_id", F.col("cell").alias("scell")
    )
    batch_assigned = assign(
        load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    ).withColumnRenamed("cell", "bcell")
    audit = (
        streamed.join(batch_assigned, "vec_id", "full")
        .agg(
            F.count("scell").alias("n_indexed"),
            F.sum(
                (
                    F.col("scell").isNull()
                    | F.col("bcell").isNull()
                    | (F.col("scell") != F.col("bcell"))
                ).cast("long")
            ).alias("n_mismatch"),
        )
        .collect()[0]
    )
    return spark.createDataFrame(
        [(audit.n_indexed, audit.n_mismatch == 0)],
        "n_indexed long, equals_batch_assignment boolean",
    )


def streaming_index_append_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The semantic-dedup -> ANN-index lifecycle over ONE shared stored
    artifact (round-4 verdict item 6): the corpus kept-set
    (``semdedup_cache.corpus_kept_set`` — the SAME artifact, same cache
    key, that ``ext_dedup_semantic_incremental`` verdicts against) SEEDS
    the cell-partitioned index store by a FILE-LEVEL clone — zero
    recompute, partition layout preserved because the artifact is already
    partitioned by assignment cell — and the daily embedding batch
    (vec_id % 10 == 9, the incremental job's batch) then streams in,
    each micro-batch cell-assigned through the shared
    ``nearest_cell_assigner`` and appended partition-locally.

    At 100 TB this is the point of the artifact: the index serves the
    DEDUPED corpus without re-reading or re-assigning it (the seed is a
    metadata/file operation), and only batch-sized work happens per day.

    Single-action audit (one full-outer join, one aggregation): the index
    must hold exactly artifact-rows (as seeds, cell-for-cell) plus
    batch-rows (as appends, in the cell the one-shot assignment gives) —
    emitted as (n_appended, seed_matches_artifact,
    append_matches_assignment).
    """
    import shutil

    from cdc_debezium_kafka_airflow_spark.operators.similarity import (
        as_double,
        nearest_cell_assigner,
        normalized,
        train_ivf_centroids,
    )
    from cdc_debezium_kafka_airflow_spark.sources.cache_util import (
        cache_is_fresh,
        source_fingerprint,
        write_fingerprint,
    )
    from cdc_debezium_kafka_airflow_spark.sources.semdedup_cache import (
        corpus_kept_set,
    )
    from cdc_debezium_kafka_airflow_spark.sources.tables import load_table

    tag = os.path.basename(os.path.normpath(sf_dir))
    fp = source_fingerprint(sf_dir, "embeddings")
    ck = fp + ":inc90"
    e = load_table(spark, sf_dir, "embeddings")
    corpus = e.filter(F.col("vec_id") % 10 != 9)
    batch_df = e.filter(F.col("vec_id") % 10 == 9)

    kept_dir, kept_art = corpus_kept_set(
        spark, sf_dir, corpus=corpus, corpus_tag="inc90",
        n_clusters=8, threshold=0.35, cache_key=ck,
    )

    # batch replay source (4 files -> multiple micro-batches), cached
    replay_dir = os.path.join("/root/repo/.cache", f"emb_batch_replay_{tag}")
    if not cache_is_fresh(replay_dir, fp):
        batch_df.repartition(4).write.mode("overwrite").parquet(replay_dir)
        write_fingerprint(replay_dir, fp)

    # SEED: file-level clone of the kept-set artifact — the index starts
    # as the deduped corpus with zero Spark jobs run. The clone lands
    # under src=seed so the streamed batches' src=batch{N} subtrees (the
    # r11 replay-idempotent layout) sit beside it at ONE partition depth
    # — mixed depths would break Spark's partition discovery.
    index_dir = os.path.join("/root/repo/.cache", f"ann_index_dedup_{tag}")
    shutil.rmtree(index_dir, ignore_errors=True)
    os.makedirs(index_dir)
    shutil.copytree(kept_dir, os.path.join(index_dir, "src=seed"))

    # explicit id/vec columns (r13): same memo key as corpus_kept_set's
    # training above, so this is a memo hit in-run — but it must also
    # train correctly cold (the raw embeddings frame has vec_id/embedding)
    cents = train_ivf_centroids(
        corpus, id_col="vec_id", vec_col="embedding", k=8, cache_key=ck
    )
    cent_rows = [(r["centroid_id"], r["centroid"]) for r in cents.collect()]
    assigner = nearest_cell_assigner(
        cent_rows, vec_col="vec", id_col="vid", cid_col="cell",
        d2_col="__d2",
    )

    def assign(df: DataFrame) -> DataFrame:
        v = normalized(
            df.select(
                F.col("vec_id").alias("vid"),
                as_double(F.col("embedding")).alias("vec"),
            ),
            "vec",
            "nvec",
        ).select("vid", F.col("nvec").alias("vec"))
        return assigner(v).select(
            "vid",
            F.lit(None).cast("long").alias("block_id"),  # not yet verdicted
            F.round(
                F.lit(1.0) - F.col("__d2") / F.lit(2.0), 6
            ).alias("centroid_sim"),
            "vec",
            "cell",
        )

    file_schema = spark.read.parquet(replay_dir).schema
    stream = (
        spark.readStream.schema(file_schema)
        .option("maxFilesPerTrigger", "2")
        .parquet(replay_dir)
    )

    def append_batch(batch: DataFrame, batch_id: int) -> None:
        # replay idempotence (r11 audit): overwrite the batch's own
        # src=batch{N} subtree — re-delivery replaces, never duplicates
        assign(batch).repartition("cell").write.mode("overwrite").partitionBy(
            "cell"
        ).parquet(os.path.join(index_dir, f"src=batch{batch_id}"))

    prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    ckpt = temp_checkpoint_dir()
    try:
        q = (
            stream.writeStream.foreachBatch(append_batch)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_parts)
        shutil.rmtree(ckpt, ignore_errors=True)

    # single-action audit: index vs (artifact ∪ one-shot batch assignment)
    idx = spark.read.parquet(index_dir).select(
        "vid",
        F.col("cell").cast("long").alias("icell"),
        F.col("block_id").isNotNull().alias("is_seed"),
    )
    expected = kept_art.select(
        "vid",
        F.col("cell").cast("long").alias("ecell"),
        F.lit(True).alias("expect_seed"),
    ).unionByName(
        assign(batch_df).select(
            "vid",
            F.col("cell").cast("long").alias("ecell"),
            F.lit(False).alias("expect_seed"),
        )
    )
    row = (
        idx.join(expected, "vid", "full")
        .agg(
            F.sum(
                (F.col("is_seed") == F.lit(False)).cast("long")
            ).alias("n_appended"),
            F.sum(
                (
                    F.col("expect_seed")
                    & (
                        F.col("icell").isNull()
                        | (F.col("icell") != F.col("ecell"))
                        | ~F.coalesce(F.col("is_seed"), F.lit(False))
                    )
                ).cast("long")
            ).alias("seed_bad"),
            F.sum(
                (
                    ~F.coalesce(F.col("expect_seed"), F.lit(True))
                    & (
                        F.col("icell").isNull()
                        | (F.col("icell") != F.col("ecell"))
                        | F.coalesce(F.col("is_seed"), F.lit(True))
                    )
                ).cast("long")
            ).alias("append_bad"),
            F.sum(F.col("ecell").isNull().cast("long")).alias("orphan"),
        )
        .collect()[0]
    )
    return spark.createDataFrame(
        [
            (
                int(row.n_appended or 0),
                (row.seed_bad or 0) == 0 and (row.orphan or 0) == 0,
                (row.append_bad or 0) == 0,
            )
        ],
        "n_appended long, seed_matches_artifact boolean, "
        "append_matches_assignment boolean",
    )


def stream_semdedup_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING SemDeDup ingestion — the THIRD consumer of the shared
    kept-set artifact: embedding micro-batches are verdicted against the
    frozen corpus kept-set (``semdedup_cache.corpus_kept_set`` — the same
    store the batch incremental query audits against and the index job
    seeds from) PLUS the vectors this stream has itself accepted so far,
    which append to a growing accepted-store between micro-batches. This
    is the production ingest loop: corpus artifacts frozen, the day's
    stream self-deduplicating as it lands, accepted survivors immediately
    part of the dedup frontier for the next micro-batch.

    Arrival order differs from the one-shot batch path (earlier-arrived
    vectors win instead of the global centroid-sim order), so the oracle
    is the ORDER-FREE invariant set (semdedup_verdict_audit, shared with
    ext_dedup_semantic_incremental): exact accounting plus witness
    validity for every verdict class. Per-batch cost ∝ batch + accepted
    cells touched; the corpus side is read from the artifact's cell
    partitions, never recomputed.
    """
    import shutil

    from cdc_debezium_kafka_airflow_spark.operators.similarity import (
        as_double,
        normalized,
        semdedup_incremental,
        semdedup_verdict_audit,
    )
    from cdc_debezium_kafka_airflow_spark.sources.cache_util import (
        cache_is_fresh,
        source_fingerprint,
        write_fingerprint,
    )
    from cdc_debezium_kafka_airflow_spark.sources.semdedup_cache import (
        corpus_kept_set,
    )
    from cdc_debezium_kafka_airflow_spark.sources.tables import load_table

    th = 0.35
    tag = os.path.basename(os.path.normpath(sf_dir))
    fp = source_fingerprint(sf_dir, "embeddings")
    ck = fp + ":inc90"
    e = load_table(spark, sf_dir, "embeddings")
    corpus = e.filter(F.col("vec_id") % 10 != 9)
    batch_df = e.filter(F.col("vec_id") % 10 == 9)

    _, kept_art = corpus_kept_set(
        spark, sf_dir, corpus=corpus, corpus_tag="inc90",
        n_clusters=8, threshold=th, cache_key=ck,
    )

    replay_dir = os.path.join("/root/repo/.cache", f"emb_batch_replay_{tag}")
    if not cache_is_fresh(replay_dir, fp):
        batch_df.repartition(4).write.mode("overwrite").parquet(replay_dir)
        write_fingerprint(replay_dir, fp)

    out_dir = os.path.join("/root/repo/.cache", f"semdedup_ingest_{tag}")
    acc_dir = os.path.join(out_dir, "accepted")
    ver_dir = os.path.join(out_dir, "verdicts")
    shutil.rmtree(out_dir, ignore_errors=True)

    acc_schema = (
        "vid long, cell long, block_id long, centroid_sim double, "
        "vec array<double>"
    )

    def ingest_batch(mb: DataFrame, batch_id: int) -> None:
        # replay idempotence (r11 audit): the frontier read EXCLUDES this
        # batch's own batch=N partition — a re-delivered micro-batch must
        # see exactly the frontier its first delivery saw, or its own
        # previously-accepted vectors would re-classify it as duplicates
        if os.path.isdir(acc_dir) and any(
            e.startswith("batch=") for e in os.listdir(acc_dir)
        ):
            accepted = (
                spark.read.schema(acc_schema + ", batch long")
                .parquet(acc_dir)
                .filter(F.col("batch") < batch_id)
                .drop("batch")
            )
            frontier = kept_art.unionByName(accepted)
        else:
            frontier = kept_art
        out = semdedup_incremental(
            corpus, mb, n_clusters=8, threshold=th, cache_key=ck,
            corpus_kept=frontier,
        ).persist()
        # batch-id-versioned overwrite: re-delivery replaces, never
        # duplicates (verdicts and accepted vectors alike)
        out.write.mode("overwrite").parquet(
            os.path.join(ver_dir, f"batch={batch_id}")
        )
        # THIS batch's accepted vectors APPEND to the frontier store for
        # the next micro-batch (the store accumulates across batches)
        batch_new = out.filter(F.col("verdict") == "new").select(
            "vid", F.col("cid").cast("long").alias("cell")
        )
        normed = normalized(
            batch_new.join(
                mb.select(
                    F.col("vec_id").alias("vid"),
                    as_double(F.col("embedding")).alias("raw"),
                ),
                on="vid",
            ),
            "raw",
            "nvec",
        ).select("vid", "cell", F.col("nvec").alias("vec"))
        (
            normed.select(
                "vid",
                "cell",
                F.lit(None).cast("long").alias("block_id"),
                F.lit(None).cast("double").alias("centroid_sim"),
                "vec",
            )
            .write.mode("overwrite")
            .parquet(os.path.join(acc_dir, f"batch={batch_id}"))
        )
        out.unpersist()

    file_schema = spark.read.parquet(replay_dir).schema
    stream = (
        spark.readStream.schema(file_schema)
        .option("maxFilesPerTrigger", "2")
        .parquet(replay_dir)
    )
    ck_dir = temp_checkpoint_dir()
    try:
        q = (
            stream.writeStream.foreachBatch(ingest_batch)
            .outputMode("append")
            .option("checkpointLocation", ck_dir)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        shutil.rmtree(ck_dir, ignore_errors=True)

    # an accepted earlier-micro-batch vector sits on the operator's corpus
    # side of the frontier, so a later arrival matching it is emitted as
    # 'dup_of_corpus' — relabel by witness membership (batch vids are
    # vec_id % 10 == 9 by construction) so the audit's verdict classes
    # stay pure: corpus witnesses from the artifact, batch witnesses from
    # accepted 'new' rows
    out = spark.read.parquet(ver_dir).drop("batch").withColumn(
        "verdict",
        F.when(
            (F.col("verdict") == "dup_of_corpus")
            & (F.col("witness_id") % 10 == 9),
            F.lit("dup_in_batch"),
        ).otherwise(F.col("verdict")),
    )
    v = normalized(
        batch_df.select(
            F.col("vec_id").alias("vid"),
            as_double(F.col("embedding")).alias("vec"),
        ),
        "vec",
        "nvec",
    ).select("vid", F.col("nvec").alias("vec"))
    corpus_kept = kept_art.select(
        F.col("vid").alias("kvid"),
        F.col("cell").alias("kcid"),
        F.col("vec").alias("kvec"),
    )
    n_batch_total = batch_df.agg(
        F.count("*").cast("long").alias("n_batch")
    )
    return semdedup_verdict_audit(out, v, corpus_kept, n_batch_total, th)


def stream_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING eval-set decontamination — the runtime-filter pattern
    applied at ingest time: a 100 TB training corpus doesn't get
    decontaminated in one batch job, it is SCREENED AS IT ARRIVES. The
    benchmark-sized eval shingle set is built once (from the shingle cache)
    into a broadcast Bloom bitset (``build_shingle_bloom_udf`` — shared
    with the batch twin ``ext_decontaminate_bloom``); each micro-batch of
    incoming documents is normalized, content-hash split (only train docs
    proceed), shingled map-side, Bloom-prefiltered map-side, and only the
    survivors hit the exact eval equi-join; per-doc contamination verdicts
    append to the result store.

    Per-doc aggregation is micro-batch-local (a document arrives whole),
    so the streamed result is IDENTICAL to the batch operator's — the
    oracle is ext_decontaminate's exact SQL, and any Bloom false negative,
    split drift, or lost batch flips the hash. Cost per batch ∝ batch
    shingles (map-side) + contaminated survivors (join), never corpus.
    """
    import shutil

    from cdc_debezium_kafka_airflow_spark.operators.dedup import (
        word_shingles,
    )
    from cdc_debezium_kafka_airflow_spark.operators.sampling import (
        build_shingle_bloom_udf,
        content_bucket,
    )
    from cdc_debezium_kafka_airflow_spark.operators.text import (
        normalize_text,
    )
    from cdc_debezium_kafka_airflow_spark.sources.shingle_cache import (
        shingled_documents,
    )

    tag = os.path.basename(os.path.normpath(sf_dir))

    # static side, built once per run: eval shingle counts + the Bloom
    # bitset. eval_sh is persisted — the bloom build collects it and the
    # per-batch joins broadcast it (r13: shingles compute in-run, so an
    # unpersisted frame would re-shingle the corpus per consumer).
    sh_all = shingled_documents(spark, sf_dir, unit="word", k=3)
    eval_sh = (
        sh_all.filter(F.col("bucket") >= 90)
        .select("doc_id", F.explode("shingles").alias("sg"))
        .groupBy("sg")
        .agg(F.countDistinct("doc_id").alias("n_eval_docs"))
    ).persist()
    maybe_contaminated, h1c, h2c = build_shingle_bloom_udf(eval_sh)
    eval_b = F.broadcast(eval_sh)

    # full-text replay source (the quota job's replay projects text away)
    from cdc_debezium_kafka_airflow_spark.sources.cache_util import (
        cache_is_fresh,
        source_fingerprint,
        write_fingerprint,
    )
    from cdc_debezium_kafka_airflow_spark.sources.tables import load_table

    replay_dir = os.path.join("/root/repo/.cache", f"docs_text_replay_{tag}")
    fp = source_fingerprint(sf_dir, "documents")
    if not cache_is_fresh(replay_dir, fp):
        load_table(spark, sf_dir, "documents").select(
            "doc_id", "text"
        ).repartition(4).write.mode("overwrite").parquet(replay_dir)
        write_fingerprint(replay_dir, fp)
    out_dir = os.path.join("/root/repo/.cache", f"stream_decon_{tag}")
    shutil.rmtree(out_dir, ignore_errors=True)

    def decon_batch(batch: DataFrame, batch_id: int) -> None:
        normed = batch.select(
            "doc_id", normalize_text(F.col("text")).alias("t")
        )
        train = normed.filter(content_bucket(F.col("t")) < 90)
        sh = train.select(
            "doc_id", F.explode(word_shingles(F.col("t"), 3)).alias("sg")
        )
        cand = (
            sh.withColumn("_h1", h1c(F.col("sg")))
            .withColumn("_h2", h2c(F.col("sg")))
            .filter(maybe_contaminated(F.col("_h1"), F.col("_h2")))
            .drop("_h1", "_h2")
        )
        flagged = (
            cand.join(eval_b, "sg")
            .groupBy("doc_id")
            .agg(
                F.count("*").cast("long").alias("n_shared_shingles"),
                F.sum("n_eval_docs").cast("long").alias("eval_doc_hits"),
            )
            .filter(F.col("n_shared_shingles") >= 2)
        )
        # replay idempotence (r11 audit): batch-id-versioned overwrite —
        # an at-least-once re-delivery replaces its own verdicts instead
        # of duplicating them in the result store
        flagged.write.mode("overwrite").parquet(
            os.path.join(out_dir, f"batch={batch_id}")
        )

    file_schema = spark.read.parquet(replay_dir).schema
    stream = (
        spark.readStream.schema(file_schema)
        .option("maxFilesPerTrigger", "2")
        .parquet(replay_dir)
    )
    ck = temp_checkpoint_dir()
    try:
        q = (
            stream.writeStream.foreachBatch(decon_batch)
            .outputMode("append")
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        shutil.rmtree(ck, ignore_errors=True)
    return spark.read.parquet(out_dir).select(
        "doc_id", "n_shared_shingles", "eval_doc_hits"
    )


def documents_range_replay_dir(
    spark: SparkSession, sf_dir: str, n_files: int = 2
) -> str:
    """Fingerprint-cached documents replay split into ``n_files`` doc_id
    RANGES written in ascending order (later ranges get later mtimes), so
    the file-stream source delivers micro-batches in global doc_id order —
    the deterministic arrival order the quota job's oracle needs.

    Default is TWO ranges: the minimal replay that still falsifies
    cross-batch quota state (every domain spans both ranges, so batch 2's
    admissions depend on batch 1's carried counters; was 4 — two extra
    applyInPandasWithState triggers per run that proved nothing more)."""
    from cdc_debezium_kafka_airflow_spark.sources.cache_util import (
        cache_is_fresh,
        source_fingerprint,
        write_fingerprint,
    )
    from cdc_debezium_kafka_airflow_spark.sources.tables import load_table

    tag = os.path.basename(os.path.normpath(sf_dir))
    # n_files in the cache tag + empty-table guard: same hardening as
    # events_idrange_replay_dir (ADVICE r08 #4 applied to its sibling).
    replay_dir = os.path.join(
        "/root/repo/.cache", f"docs_range_{tag}_{n_files}"
    )
    fp = source_fingerprint(sf_dir, "documents")
    if not cache_is_fresh(replay_dir, fp):
        docs = load_table(spark, sf_dir, "documents").select(
            "doc_id", "source"
        )
        hi_row = docs.agg(F.max("doc_id")).first()[0]
        if hi_row is None:
            raise ValueError(
                f"documents table at {sf_dir} is empty: cannot build a "
                "doc_id-range replay split"
            )
        hi = hi_row + 1
        step = max(hi // n_files, 1)
        for i in range(n_files):
            lo, up = i * step, (i + 1) * step if i < n_files - 1 else hi
            mode = "overwrite" if i == 0 else "append"
            docs.filter(
                (F.col("doc_id") >= lo) & (F.col("doc_id") < up)
            ).coalesce(1).write.mode(mode).parquet(replay_dir)
        write_fingerprint(replay_dir, fp)
    return replay_dir


def stream_domain_quota(
    spark: SparkSession, sf_dir: str, cap: int = 15
) -> DataFrame:
    """Streaming per-domain admission quota: every arriving document is
    admitted iff its domain has admitted fewer than ``cap`` docs so far —
    the stateful rate-limit/quota pattern (per-tenant ingest caps, crawl
    politeness budgets) as a custom ``applyInPandasWithState`` operator.
    State per domain is ONE counter; rows are processed in deterministic
    arrival order (doc_id-range replay files + per-batch sort), so the
    admitted set is exactly "first ``cap`` per domain by doc_id" and the
    DuckDB oracle recomputes it with a window rank. Unlike the batch
    cap_per_domain (global priority rank), the streaming quota is
    order-of-arrival — both real pipeline shapes."""
    import pandas as pd

    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    replay = documents_range_replay_dir(spark, sf_dir)
    schema = spark.read.parquet(replay).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(os.path.join(replay, "*.parquet"))
    )

    def admit(key, pdfs, state: "GroupState"):
        used = state.get[0] if state.exists else 0
        # the group's rows arrive as MULTIPLE Arrow chunks when a (domain,
        # micro-batch) group exceeds the Arrow batch size — concatenate and
        # sort ONCE so admission order is by doc_id across the whole
        # micro-batch, not per-chunk (a chunk-local sort would let a later
        # chunk's lower doc_id lose its slot to an earlier chunk's higher
        # one). Bounded by the domain's rows in one micro-batch.
        pdf = pd.concat(list(pdfs)).sort_values("doc_id")
        n = len(pdf)
        admitted = [used + i < cap for i in range(n)]
        used += n
        state.update((used,))
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "domain": [key[0]] * n,
                "admitted": admitted,
            }
        )

    out = stream.groupBy("source").applyInPandasWithState(
        admit,
        "doc_id long, domain string, admitted boolean",
        "used long",
        "append",
        GroupStateTimeout.NoTimeout,
    )
    return _run_to_memory(out, "append", parts="8")


def stream_static_dim_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``stream_static_join``: streaming fact enriched against a static
    (batch) dimension table — the canonical CDC-enrichment topology: the
    Kafka event stream carries foreign keys, the warehouse dimension is a
    bounded table, and every micro-batch joins against it without any
    stream-side state (reference joins topic rows to warehouse dims in its
    sink DAGs; see dags/*postgres* load steps).

    Scale posture: the dimension is broadcast, so the join is map-side in
    every trigger — no shuffle of the stream, no state store at all (unlike
    a stream-stream join). A dimension too large to broadcast would instead
    be a storage-partitioned/bucketed join on the key, still stateless.
    Spark re-reads the static side per trigger by default; for a replay
    fixture that is one read, and a production job would cache the dim or
    use a rate-limited refresh.
    """
    from cdc_debezium_kafka_airflow_spark.sources.tables import load_table

    dim = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    ev = events_stream(spark, sf_dir)
    joined = ev.join(F.broadcast(dim), ev.user_id == dim.c_custkey, "inner")
    agg = joined.groupBy("c_mktsegment").agg(
        F.count("*").alias("n_events"),
        F.round(F.sum("value"), 4).alias("sum_value"),
    )
    return _run_to_memory(agg, "complete", parts="8")


def stream_late_data_drop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL late-data drops under a watermark: the events replay is written
    as four files replayed one per micro-batch —

      batch 0: days 1-8 and day 14       (day 14 is what the watermark will
                                          derive from: max(day-14) - 2d
                                          lands inside day 12)
      batch 1: day 15                    (filler — the filter watermark for
                                          batch N derives from data through
                                          batch N-2, so one batch must pass
                                          before batch 0's maximum becomes
                                          the active filter)
      batch 2: days 9-13, arriving LATE  (windows for days 9-11 ended before
                                          the now-active watermark -> their
                                          rows DROP; days 12-13 still open
                                          -> accepted)
      batch 3: days 16-30                (advances the watermark to the end)

    The empirically-pinned Spark semantics this depends on (verified on this
    build with per-batch numRowsDroppedByWatermark): the late filter drops a
    row iff its WINDOW END <= the active watermark (event-time alone below
    the watermark does NOT drop), and the watermark ACTIVE for batch N's
    filter derives from data through batch N-2 (one batch behind the value
    the progress line displays for batch N, which derives from N-1).

    Append-mode 1-day tumbling counts then emit every window closed by the
    final watermark. Unlike stream_watermark (single batch, nothing actually
    late), this exercises the drop path itself; the boundary arithmetic is
    closed-form (watermark = exact max(ts) of the seen prefix minus 2 days),
    so the DuckDB oracle reproduces the dropped cohort and the
    emitted-window cut exactly."""
    import shutil

    from cdc_debezium_kafka_airflow_spark.sources.cache_util import (
        cache_is_fresh,
        source_fingerprint,
        write_fingerprint,
    )
    from cdc_debezium_kafka_airflow_spark.sources.tables import load_table

    tag = os.path.basename(os.path.normpath(sf_dir))
    replay_dir = os.path.join("/root/repo/.cache", f"events_late_{tag}")
    # ":late5" = replay layout version; a layout change must invalidate
    # even when the source fixture hasn't moved
    fp = source_fingerprint(sf_dir, "events") + ":late5"
    if not cache_is_fresh(replay_dir, fp):
        shutil.rmtree(replay_dir, ignore_errors=True)
        e = load_table(spark, sf_dir, "events").select("ts", "event_type")
        d09, d14, d15, d16 = (
            "2024-01-09", "2024-01-14", "2024-01-15", "2024-01-16",
        )
        parts = [
            (F.col("ts") < d09)
            | ((F.col("ts") >= d14) & (F.col("ts") < d15)),
            (F.col("ts") >= d15) & (F.col("ts") < d16),  # filler batch
            (F.col("ts") >= d09) & (F.col("ts") < d14),  # the late cohort
            F.col("ts") >= d16,
        ]
        for i, cond in enumerate(parts):
            mode = "overwrite" if i == 0 else "append"
            e.filter(cond).coalesce(1).write.mode(mode).parquet(replay_dir)
        write_fingerprint(replay_dir, fp)

    schema = spark.read.parquet(replay_dir).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(os.path.join(replay_dir, "*.parquet"))
    )
    agg = (
        stream.withWatermark("ts", "2 days")
        .groupBy(F.window("ts", "1 day").alias("win"), F.col("event_type"))
        .agg(F.count("*").alias("n_events"))
    )
    out = _run_to_memory(agg, "append", parts="8")
    return out.select(
        F.col("win.start").alias("day_start"), "event_type", "n_events"
    )


def stream_checkpoint_recovery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly-once across a QUERY RESTART: phase 1 streams half the orders
    into a transactional parquet file sink (availableNow, checkpointed),
    the query STOPS, the other half lands in the source dir, and a brand-new
    query object resumes from the SAME checkpoint — it must process ONLY the
    unseen files (offset log) and the read-back (through the sink's
    _spark_metadata commit manifest) must equal the plain batch table with
    zero duplicates. A re-processed phase-1 file doubles counts and
    hash-fails the oracle; a skipped phase-2 file undercounts.

    This is the recovery contract the reference delegates to Kafka Connect
    offset storage (docker-compose.yml:104-106 CONNECT_OFFSET_STORAGE);
    Spark's checkpoint (source offsets) + file-sink manifest (committed
    outputs) reproduce it natively."""
    import shutil

    from cdc_debezium_kafka_airflow_spark.sources.tables import load_table

    tag = os.path.basename(os.path.normpath(sf_dir))
    base = os.path.join("/root/repo/.cache", f"ckpt_recovery_{tag}")
    shutil.rmtree(base, ignore_errors=True)
    src_dir = os.path.join(base, "source")
    ckpt = os.path.join(base, "checkpoint")
    out_dir = os.path.join(base, "out")

    orders = load_table(spark, sf_dir, "orders")
    orders.filter(F.col("o_orderkey") % 2 == 0).coalesce(2).write.parquet(
        src_dir
    )
    schema = spark.read.parquet(src_dir).schema

    def run_once() -> None:
        stream = spark.readStream.schema(schema).parquet(
            os.path.join(src_dir, "*.parquet")
        )
        q = (
            stream.writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    run_once()  # phase 1: even keys committed, query gone
    orders.filter(F.col("o_orderkey") % 2 == 1).coalesce(2).write.mode(
        "append"
    ).parquet(src_dir)
    run_once()  # restart: same checkpoint, must pick up ONLY the new files

    back = spark.read.parquet(out_dir)
    return back.groupBy("o_orderstatus").agg(
        F.count("*").alias("n_orders"),
        F.count_distinct("o_orderkey").alias("n_distinct_keys"),
        F.round(F.sum("o_totalprice"), 2).alias("revenue"),
    )


def stream_dim_refresh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing dimension REFRESH mid-stream, the documented
    foreachBatch idiom: the dimension is re-read from storage INSIDE every
    micro-batch (a plan-fixed stream-static join would snapshot the file
    listing once and never see updates). Phase-1 orders join dim v1; the
    dim is overwritten; phase-2 orders join v2 — the output provably
    carries v1 labels for the first half and v2 for the second, which is
    exactly what the closed-form oracle checks.

    Scale posture: the fresh dim read is a tiny broadcast per micro-batch
    (status -> label); the output append rides the same transactional file
    sink + checkpoint as stream_checkpoint_recovery, so the refresh
    pattern composes with exactly-once."""
    import shutil

    from cdc_debezium_kafka_airflow_spark.sources.tables import load_table

    tag = os.path.basename(os.path.normpath(sf_dir))
    base = os.path.join("/root/repo/.cache", f"dim_refresh_{tag}")
    shutil.rmtree(base, ignore_errors=True)
    src_dir = os.path.join(base, "source")
    dim_dir = os.path.join(base, "dim")
    ckpt = os.path.join(base, "checkpoint")
    out_dir = os.path.join(base, "out")

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus"
    )
    statuses = orders.select(
        F.col("o_orderstatus").alias("status")
    ).distinct()

    def write_dim(version: str) -> None:
        statuses.select(
            "status",
            F.concat(F.lit(version + "_"), F.col("status")).alias("label"),
        ).coalesce(1).write.mode("overwrite").parquet(dim_dir)

    def run_once() -> None:
        schema = spark.read.parquet(src_dir).schema
        stream = spark.readStream.schema(schema).parquet(
            os.path.join(src_dir, "*.parquet")
        )

        def join_fresh_dim(batch_df: DataFrame, batch_id: int) -> None:
            dim = batch_df.sparkSession.read.parquet(dim_dir)  # FRESH read
            # batch-id-versioned overwrite (r11 audit): re-delivery
            # replaces this batch's output (re-joined against the
            # CURRENT dim — inherent to the fresh-dim contract) instead
            # of appending a duplicate set; ids stay unique across both
            # run_once() calls because they share one checkpoint
            (
                batch_df.join(
                    F.broadcast(dim),
                    batch_df.o_orderstatus == dim.status,
                )
                .select("o_orderkey", "o_orderstatus", "label")
                .write.mode("overwrite")
                .parquet(os.path.join(out_dir, f"batch={batch_id}"))
            )

        q = (
            stream.writeStream.foreachBatch(join_fresh_dim)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    write_dim("v1")
    orders.filter(F.col("o_orderkey") % 2 == 0).coalesce(2).write.parquet(
        src_dir
    )
    run_once()
    write_dim("v2")  # the dimension changes between micro-batches
    orders.filter(F.col("o_orderkey") % 2 == 1).coalesce(2).write.mode(
        "append"
    ).parquet(src_dir)
    run_once()

    back = spark.read.parquet(out_dir)
    return back.groupBy("o_orderstatus", "label").agg(
        F.count("*").alias("n_orders")
    )


def _outer_join_priority_rollup(
    spark: SparkSession, joined: DataFrame
) -> DataFrame:
    """Shared sink for the outer stream-stream joins: per-micro-batch
    PARTIAL aggregation inside foreachBatch (count/sum/null-count per
    priority — a distributed agg whose output is <=6 rows/batch), combined
    by one final Spark aggregation over the collected partials.

    This replaces the old memory-sink + batch-agg tail, which pulled every
    emitted JOIN ROW (686k at sf0.1 for the full outer) through the driver
    before aggregating — the classic collect-then-reduce anti-pattern, and
    measured 6.4s -> 3.9s at sf0.1 (r09). Partials are collected as Rows,
    not pandas, so an all-NULL revenue group stays NULL through the final
    sum exactly as the oracle's SUM does (NaN round-trips would turn it
    into 0.0). Count/sum are decomposable across batches by construction;
    rounding happens once, on the final total, same as the oracle."""
    partial_schema = (
        "o_orderpriority string, n_lineitems long, rev double,"
        " n_unmatched_orders long"
    )
    # keyed by batch_id: foreachBatch is at-least-once, so a re-delivered
    # micro-batch OVERWRITES its own slot instead of double-counting
    # (ADVICE r09) — the final flatten sums each batch exactly once
    partials: dict[int, list] = {}

    def absorb(batch_df: DataFrame, batch_id: int) -> None:
        partials[batch_id] = (
            batch_df.groupBy("o_orderpriority")
            .agg(
                F.count("l_orderkey").alias("n_lineitems"),
                F.sum(
                    F.col("l_extendedprice") * (1 - F.col("l_discount"))
                ).alias("rev"),
                F.sum(F.col("l_orderkey").isNull().cast("long")).alias(
                    "n_unmatched_orders"
                ),
            )
            .collect()
        )

    ck = temp_checkpoint_dir()
    try:
        q = (
            joined.writeStream.foreachBatch(absorb)
            .outputMode("append")
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        import shutil

        shutil.rmtree(ck, ignore_errors=True)
    flat = [row for _, rows in sorted(partials.items()) for row in rows]
    return (
        spark.createDataFrame(flat, partial_schema)
        .groupBy("o_orderpriority")
        .agg(
            F.sum("n_lineitems").alias("n_lineitems"),
            F.round(F.sum("rev"), 2).alias("revenue"),
            F.sum("n_unmatched_orders").alias("n_unmatched_orders"),
        )
    )


def stream_stream_left_outer_join(
    spark: SparkSession, sf_dir: str, delay: str = "30 days"
) -> DataFrame:
    """Stream-stream LEFT OUTER interval join: orders LEFT JOIN lineitem on
    key + l_shipdate within [o_orderdate, o_orderdate + 120 days]. Matched
    pairs emit immediately (inner semantics); an UNMATCHED order emits with
    null right side only once the joint watermark proves no future lineitem
    can still land in its window — i.e. min(both sides' watermark) has
    passed o_orderdate + 120 days. Orders whose window is still open at
    end-of-replay stay in state and do NOT emit, which is exactly the
    semantics the oracle reproduces: with watermark delay D, the final
    joint watermark is min(max(o_orderdate), max(l_shipdate)) - D.

    Returns per-priority totals: matched lineitem count + revenue, plus the
    count of proven-unmatched orders."""
    o_schema = load_table(spark, sf_dir, "orders").schema
    l_schema = load_table(spark, sf_dir, "lineitem").schema
    orders = (
        spark.readStream.schema(o_schema)
        .parquet(os.path.join(sf_dir, "orders.parqu*"))
        .select(
            "o_orderkey",
            "o_orderpriority",
            F.col("o_orderdate").cast("timestamp").alias("o_orderdate"),
        )
        .withWatermark("o_orderdate", delay)
    )
    lineitem = (
        spark.readStream.schema(l_schema)
        .parquet(os.path.join(sf_dir, "lineitem.parqu*"))
        .select(
            "l_orderkey",
            "l_extendedprice",
            "l_discount",
            F.col("l_shipdate").cast("timestamp").alias("l_shipdate"),
        )
        .withWatermark("l_shipdate", delay)
    )
    joined = orders.join(
        lineitem,
        F.expr(
            "o_orderkey = l_orderkey"
            " AND l_shipdate >= o_orderdate"
            " AND l_shipdate <= o_orderdate + INTERVAL 120 DAYS"
        ),
        "left_outer",
    ).select(
        "o_orderpriority", "l_orderkey", "l_extendedprice", "l_discount"
    )
    prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    try:
        return _outer_join_priority_rollup(spark, joined)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_parts)


def stream_stream_full_outer_join(
    spark: SparkSession, sf_dir: str, delay: str = "30 days"
) -> DataFrame:
    """Stream-stream FULL OUTER interval join — both unmatched sides emit
    null-extended once provably safe. Matched pairs emit with inner
    semantics; an unmatched ORDER emits when the joint watermark passes
    o_orderdate + 120d (no in-window lineitem can still arrive); an
    unmatched LINEITEM emits when the joint watermark passes l_shipdate
    (no order opening a window over it can still arrive — o_orderdate <=
    l_shipdate is the binding constraint). Rows whose eviction point is
    beyond the end-of-replay watermark stay in state and never emit; the
    oracle reproduces both cuts relationally (joint watermark =
    least(max o_orderdate, max l_shipdate) - delay).

    Output: per o_orderpriority (NULL = unmatched lineitems): matched
    lineitem count + revenue (for the NULL group: the unmatched lineitems
    themselves), and the count of proven-unmatched orders."""
    o_schema = load_table(spark, sf_dir, "orders").schema
    l_schema = load_table(spark, sf_dir, "lineitem").schema
    orders = (
        spark.readStream.schema(o_schema)
        .parquet(os.path.join(sf_dir, "orders.parqu*"))
        .select(
            "o_orderkey",
            "o_orderpriority",
            F.col("o_orderdate").cast("timestamp").alias("o_orderdate"),
        )
        .withWatermark("o_orderdate", delay)
    )
    lineitem = (
        spark.readStream.schema(l_schema)
        .parquet(os.path.join(sf_dir, "lineitem.parqu*"))
        .select(
            "l_orderkey",
            "l_extendedprice",
            "l_discount",
            F.col("l_shipdate").cast("timestamp").alias("l_shipdate"),
        )
        .withWatermark("l_shipdate", delay)
    )
    joined = orders.join(
        lineitem,
        F.expr(
            "o_orderkey = l_orderkey"
            " AND l_shipdate >= o_orderdate"
            " AND l_shipdate <= o_orderdate + INTERVAL 120 DAYS"
        ),
        "full_outer",
    ).select(
        "o_orderpriority", "l_orderkey", "l_extendedprice", "l_discount"
    )
    prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    try:
        return _outer_join_priority_rollup(spark, joined)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_parts)


def stream_stream_semi_anti_join(
    spark: SparkSession, sf_dir: str, how: str, delay: str = "30 days"
) -> DataFrame:
    """Stream-stream LEFT SEMI interval join on the same orders-lineitem
    window as the outer variant: an order emits once on its first in-window
    match, so the final distinct set is exactly EXISTS. (``how`` is kept a
    parameter for symmetry, but note Spark does not support a streaming
    LEFT ANTI right side — anti semantics come from the OUTER join's
    null-extended rows, see stream_stream_left_outer's
    n_unmatched_orders.) Returns per-priority order counts."""
    o_schema = load_table(spark, sf_dir, "orders").schema
    l_schema = load_table(spark, sf_dir, "lineitem").schema
    orders = (
        spark.readStream.schema(o_schema)
        .parquet(os.path.join(sf_dir, "orders.parqu*"))
        .select(
            "o_orderkey",
            "o_orderpriority",
            F.col("o_orderdate").cast("timestamp").alias("o_orderdate"),
        )
        .withWatermark("o_orderdate", delay)
    )
    lineitem = (
        spark.readStream.schema(l_schema)
        .parquet(os.path.join(sf_dir, "lineitem.parqu*"))
        .select(
            "l_orderkey",
            F.col("l_shipdate").cast("timestamp").alias("l_shipdate"),
        )
        .withWatermark("l_shipdate", delay)
    )
    joined = orders.join(
        lineitem,
        F.expr(
            "o_orderkey = l_orderkey"
            " AND l_shipdate >= o_orderdate"
            " AND l_shipdate <= o_orderdate + INTERVAL 120 DAYS"
        ),
        how,
    ).select("o_orderkey", "o_orderpriority")
    # Semi emits each order once, on its FIRST in-window match — never on
    # eviction — so like the inner variant the trailing no-data batch is
    # pure state-commit overhead and is skipped (the outer variants need
    # it; see stream_stream_interval_join's note).
    prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
    prev_nd = spark.conf.get("spark.sql.streaming.noDataMicroBatches.enabled")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    spark.conf.set("spark.sql.streaming.noDataMicroBatches.enabled", "false")
    try:
        out = _run_to_memory(joined, "append")
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_parts)
        spark.conf.set(
            "spark.sql.streaming.noDataMicroBatches.enabled", prev_nd
        )
    return out.groupBy("o_orderpriority").agg(
        F.count_distinct("o_orderkey").alias("n_orders")
    )


def stream_session_timeout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arbitrary-state sessionization finalized by EVENT-TIME TIMEOUT — the
    one GroupStateTimeout mode the other stateful jobs don't exercise
    (they run NoTimeout). Per-user sessions (12-hour inactivity gap) are
    built in ``applyInPandasWithState``; a session emits when EITHER the
    user's next event arrives beyond the gap (in-data close) OR the state
    times out because the event-time watermark passed last_ts + gap
    (timeout close — how a production sessionizer emits a user who simply
    left). The replay is three chronological ~10-day slices, one per
    micro-batch, so watermarks genuinely advance BETWEEN batches and the
    timeout path actually fires; Spark's trailing no-data micro-batch
    (noDataMicroBatches, on by default) flushes the last timeouts.

    Cross-close consistency argument (why timeout-close can never disagree
    with gap-close): a timeout for user U fires in batch N only if U has no
    data in N and wm_N > last+gap; chronological files mean U's next event
    ts' >= max(ts of batch N-1's file) >= wm_N + delay > last+gap+delay, so
    the next event would have started a NEW session under gap logic anyway.

    The final cut is closed-form: the LAST session of a user emits iff
    last_ts + gap <= final watermark (max event ts - delay); later sessions
    stay in state forever — exactly what the oracle reproduces.
    """
    import shutil

    import pandas as pd

    from pyspark.sql.streaming.state import GroupStateTimeout
    from cdc_debezium_kafka_airflow_spark.sources.cache_util import (
        cache_is_fresh,
        source_fingerprint,
        write_fingerprint,
    )
    from cdc_debezium_kafka_airflow_spark.sources.tables import load_table

    tag = os.path.basename(os.path.normpath(sf_dir))
    replay_dir = os.path.join("/root/repo/.cache", f"events_sess_{tag}")
    # 8 files per chronological slice + maxFilesPerTrigger=8 — the same
    # replay discipline as txn_consistent_stream: each trigger still
    # consumes exactly ONE slice (identical micro-batch boundaries, so
    # watermark advancement and timeout firing are unchanged), but the
    # slice parses on 8 cores instead of one. Slice-by-slice writes keep
    # modification-time order (the file source's order) across slices;
    # order within a slice is free (the state fn sorts per user anyway).
    # THREE ~10-day slices (was four ~8-day): the timeout-close transition
    # needs the watermark to advance past last_ts+gap BETWEEN batches, which
    # slices 1->2 and 2->3 each provide; the trailing no-data micro-batch
    # still flushes the final timeouts. A fourth slice re-ran the same
    # transition once more for ~1 s of replay overhead. Slice width (10 d)
    # stays far above the 12 h gap, so the cross-close consistency argument
    # in the docstring is unchanged.
    fp = source_fingerprint(sf_dir, "events") + ":sess3x8"
    if not cache_is_fresh(replay_dir, fp):
        shutil.rmtree(replay_dir, ignore_errors=True)
        e = load_table(spark, sf_dir, "events").select(
            "ts", "user_id", "event_id"
        )
        bounds = [
            ("2024-01-01", "2024-01-11"),
            ("2024-01-11", "2024-01-22"),
            ("2024-01-22", "2024-02-01"),
        ]
        for i, (lo, hi) in enumerate(bounds):
            mode = "overwrite" if i == 0 else "append"
            e.filter((F.col("ts") >= lo) & (F.col("ts") < hi)).repartition(
                8
            ).write.mode(mode).parquet(replay_dir)
        write_fingerprint(replay_dir, fp)

    schema = spark.read.parquet(replay_dir).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "8")
        .parquet(os.path.join(replay_dir, "*.parquet"))
    )

    GAP_US = 43_200_000_000  # 12 h — the same gap as sessionize_events,
    GAP_MS = 43_200_000      # so the batch twin cross-validates the stream

    def update(key, pdfs, state):
        # Vectorized session builder (round-12, guide §4.2): the former
        # per-event Python loop + sorted(lambda) cost ~5 µs/event across
        # every event of every batch; np.lexsort + a gap mask + segment
        # boundary arithmetic produce the IDENTICAL session segmentation
        # (lexsort on (us, event_id) is the same total order — event_id is
        # unique — and a session break is exactly `gap > GAP_US` between
        # order-adjacent events, which the boolean mask evaluates for every
        # adjacency at C speed).
        import numpy as np

        if state.hasTimedOut:
            start_us, last_us, n = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "start_us": [start_us],
                    "last_us": [last_us],
                    "n_events": [n],
                }
            )
            return
        rows = pd.concat(list(pdfs), ignore_index=True)
        # microsecond-exact event times, deterministic order
        us = (
            rows["ts"].astype("int64").to_numpy()
        )  # pandas datetime64[us/ns] -> int (us after //1000 if ns)
        if rows["ts"].dtype.str.endswith("[ns]"):
            us = us // 1000
        if len(us) == 0:  # defensive: re-arm existing state unchanged
            if state.exists:
                start_us, last_us, n = state.get
                state.update((start_us, last_us, n))
                state.setTimeoutTimestamp((last_us + 999) // 1000 + GAP_MS)
            return
        order = np.lexsort(
            (rows["event_id"].astype("int64").to_numpy(), us)
        )
        us = us[order]
        # segment starts: index 0, plus every adjacency whose gap exceeds
        # the session gap
        seg_start = np.flatnonzero(
            np.concatenate(([True], (us[1:] - us[:-1]) > GAP_US))
        )
        seg_end = np.append(seg_start[1:] - 1, len(us) - 1)
        starts = us[seg_start].copy()
        lasts = us[seg_end]
        counts = (seg_end - seg_start + 1).astype("int64")
        flushed = None
        if state.exists:
            s0, l0, n0 = state.get
            if us[0] - l0 <= GAP_US:
                # first segment continues the stored session
                starts[0] = s0
                counts[0] += n0
            else:
                # stored session closes by in-data gap, ahead of the rest
                flushed = (s0, l0, n0)
        state.update((int(starts[-1]), int(lasts[-1]), int(counts[-1])))
        # ceil to ms: a floored timeout could fire <1ms before the exact
        # microsecond cut the oracle uses (session_last + gap), flipping a
        # boundary session between engines
        state.setTimeoutTimestamp((int(lasts[-1]) + 999) // 1000 + GAP_MS)
        n_emit = len(starts) - 1
        if flushed is not None or n_emit:
            e_start = starts[:n_emit]
            e_last = lasts[:n_emit]
            e_n = counts[:n_emit]
            if flushed is not None:
                e_start = np.concatenate(([flushed[0]], e_start))
                e_last = np.concatenate(([flushed[1]], e_last))
                e_n = np.concatenate(([flushed[2]], e_n))
            yield pd.DataFrame(
                {
                    "user_id": np.full(len(e_start), key[0], dtype="int64"),
                    "start_us": e_start,
                    "last_us": e_last,
                    "n_events": e_n,
                }
            )

    sessions = (
        stream.withWatermark("ts", "1 hour")
        .groupBy("user_id")
        .applyInPandasWithState(
            update,
            "user_id long, start_us long, last_us long, n_events long",
            "start_us long, last_us long, n long",
            "append",
            GroupStateTimeout.EventTimeTimeout,
        )
    )
    out = _run_to_memory(sessions, "append", parts="8")
    return out.select(
        "user_id",
        F.timestamp_micros(F.col("start_us")).alias("session_start"),
        F.timestamp_micros(F.col("last_us")).alias("session_last"),
        "n_events",
    )


def txn_consistent_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming twin of ``cdc_txn_consistent`` — the transaction gate run
    ACROSS micro-batches (Debezium ``provide.transaction.metadata``
    consumed the way a transactionally-consistent sink must): each batch
    applies only transactions whose commit is proven by the arrival of a
    later transaction, and parks the in-flight tail in a pending buffer
    that the NEXT batch drains once the commit evidence shows up. A
    transaction that straddles a micro-batch boundary is therefore never
    half-applied — its early rows wait in the buffer with its late rows.

    Mechanics: a 3-slice CHRONOLOGICAL replay of the serialized changelog
    (offset terciles, one slice per trigger — the same replay discipline
    as stream_session_timeout, so the gate genuinely advances between
    batches); per batch, pending ∪ batch splits on the running max txn id
    (one bounded 1-row collect), committed rows append to an apply log,
    the tail overwrites the pending buffer. State is bounded by ONE group
    commit × arrival rate — never by history. The final materialization
    over the apply log must hash-equal the batch gate's output (same
    oracle), proving the cross-batch buffering loses and leaks nothing.
    """
    import shutil
    import tempfile

    from cdc_debezium_kafka_airflow_spark.operators.cdc import (
        upsert_materialize,
    )
    from cdc_debezium_kafka_airflow_spark.sources.cache_util import (
        cache_is_fresh,
        source_fingerprint,
        write_fingerprint,
    )
    from cdc_debezium_kafka_airflow_spark.sources.tables import load_table

    tag = os.path.basename(os.path.normpath(sf_dir))
    replay_dir = os.path.join("/root/repo/.cache", f"changelog_chrono_{tag}")
    # 8 files per chronological tercile + maxFilesPerTrigger=8: each trigger
    # consumes exactly one tercile, and the tercile parses on 8 cores instead
    # of one (a single coalesce(1) file made every micro-batch's JSON parse
    # single-threaded — measured 8.3s -> ~5.8s warm at sf0.1). Files written
    # slice-by-slice so modification-time order (the file source's order)
    # preserves chronology ACROSS slices; order within a slice is free.
    # THREE chronological slices, not four: the straddle transition (a
    # transaction's early rows parked in the pending buffer until the next
    # batch proves the commit) fires at every slice BOUNDARY, so 3 slices
    # exercise it twice — the minimal count that still falsifies both the
    # buffer-drain and the buffer-refill paths (4 slices re-ran the same
    # transition a third time for ~1 s/run of pure replay overhead).
    fp = source_fingerprint(sf_dir, "events") + ":chrono3x8"
    if not cache_is_fresh(replay_dir, fp):
        shutil.rmtree(replay_dir, ignore_errors=True)
        batch = build_changelog(load_table(spark, sf_dir, "events"))
        mx = batch.agg(F.max("offset").alias("m")).collect()[0].m
        if mx is None:  # empty source: one empty slice, not a None // 3
            batch.limit(0).write.mode("overwrite").parquet(replay_dir)
        else:
            bounds = [0, mx // 3, (2 * mx) // 3, mx + 1]
            for i in range(3):
                mode = "overwrite" if i == 0 else "append"
                batch.filter(
                    (F.col("offset") >= bounds[i])
                    & (F.col("offset") < bounds[i + 1])
                ).repartition(8).write.mode(mode).parquet(replay_dir)
        write_fingerprint(replay_dir, fp)

    schema = (
        "offset long, topic string, partition int, key string, value string, "
        "timestamp timestamp"
    )
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "8")
        .parquet(os.path.join(replay_dir, "*.parquet"))
    )
    un = unwrap(split_dlq(parse_envelope(stream))[0]).select(
        "table_name",
        "key_id",
        "offset",
        "is_delete",
        "after",
        F.floor(F.col("offset") / 16).cast("long").alias("txn_id"),
    )

    base = tempfile.mkdtemp(prefix="txn_gate_")
    applied_dir = os.path.join(base, "applied")

    def pending_before(batch_id: int) -> str | None:
        """Newest pending_{N} spill with N < batch_id. Disk-derived (not
        a driver-memory dict — r11 audit): a re-delivered or
        restart-replayed batch unions the SAME pending slice its first
        delivery saw, never its own pending_{batch_id} output."""
        best: tuple[int, str] | None = None
        if os.path.isdir(base):
            for entry in os.listdir(base):
                if not entry.startswith("pending_"):
                    continue
                try:
                    n = int(entry.rsplit("_", 1)[1])
                except ValueError:
                    continue
                if n < batch_id and (best is None or n > best[0]):
                    best = (n, os.path.join(base, entry))
        return best[1] if best else None

    def gate(batch: DataFrame, batch_id: int) -> None:
        b = batch
        prev_pend = pending_before(batch_id)
        if prev_pend is not None:
            b = b.unionByName(spark.read.parquet(prev_pend))
        b = b.persist()
        try:
            mx = b.agg(F.max("txn_id").alias("m")).collect()[0].m
            if mx is None:  # empty trailing batch: nothing moves
                return
            # per-batch COMPACTION of the committed slice before it hits the
            # apply log: each key keeps its latest image (delete markers
            # retained — they must still kill earlier batches' images at the
            # final merge), so log writes scale with the batch's KEY count,
            # not its event count — the same reduce the JDBC MERGE sink does
            # before staging. Cross-batch conflicts resolve at the final
            # last-write-wins materialization because max offset rides along.
            (
                b.filter(F.col("txn_id") < mx)
                .groupBy("table_name", "key_id")
                .agg(
                    F.max_by(
                        F.struct("is_delete", "after"), "offset"
                    ).alias("last"),
                    F.max("offset").alias("offset"),
                )
                .select(
                    "table_name",
                    "key_id",
                    "offset",
                    F.col("last.is_delete").alias("is_delete"),
                    F.col("last.after").alias("after"),
                )
                # batch-id-versioned overwrite (r11 audit): a replayed
                # batch — which, via pending_before, re-reads exactly the
                # pending slice its first delivery consumed — REPLACES
                # its own applied slice instead of appending a duplicate
                .write.mode("overwrite")
                .parquet(os.path.join(applied_dir, f"batch={batch_id}"))
            )
            b.filter(F.col("txn_id") == mx).write.mode("overwrite").parquet(
                os.path.join(base, f"pending_{batch_id}")
            )
        finally:
            b.unpersist()

    ck = temp_checkpoint_dir()
    try:
        q = (
            un.writeStream.foreachBatch(gate)
            .outputMode("append")
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        out_schema = (
            "table_name string, n_live_keys bigint, "
            "last_applied_offset bigint, n_inflight_held bigint"
        )
        if not os.path.isdir(applied_dir):
            # zero delivered batches (ADVICE r11): the gate never wrote an
            # applied slice (nor a pending spill — they are written
            # together per batch), so the meaningful answer is the empty
            # rollup, not a PATH_NOT_FOUND on the applied read below
            return spark.createDataFrame([], out_schema)
        applied = spark.read.parquet(applied_dir)
        mat = upsert_materialize(
            applied.select(
                "table_name", "key_id", "offset", "is_delete", "after"
            )
        )
        agg = mat.groupBy("table_name").agg(
            F.count("*").alias("n_live_keys"),
            F.max("last_offset").alias("last_applied_offset"),
        )
        # the newest pending spill = the still-open transaction the gate
        # is holding back at stream end; a zero-batch stream leaves no
        # spill at all (ADVICE r11) — that means nothing is held, not an
        # opaque read-of-None TypeError
        held_path = pending_before(1 << 62)
        if held_path is None:
            held = spark.createDataFrame(
                [], "table_name string, n_inflight_held long"
            )
        else:
            held = (
                spark.read.parquet(held_path)
                .groupBy("table_name")
                .agg(F.count("*").alias("n_inflight_held"))
            )
        out = agg.join(F.broadcast(held), "table_name", "left").select(
            "table_name",
            "n_live_keys",
            "last_applied_offset",
            F.coalesce(F.col("n_inflight_held"), F.lit(0))
            .cast("long")
            .alias("n_inflight_held"),
        )
        rows = out.collect()
    finally:
        shutil.rmtree(ck, ignore_errors=True)
        shutil.rmtree(base, ignore_errors=True)
    return spark.createDataFrame(rows, out.schema)


def streaming_ab_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``stream_ab_ztest``: the experiment readout's sufficient statistics
    maintained as STREAMING state — exact int64-cents moments (n, Σx, Σx²)
    per (event_type, variant) in a complete-mode aggregation, so the z-test
    is answerable from the live state at ANY trigger without re-scanning
    history. This is the moment-form-statistics posture (SCALE.md) running
    continuously: micro-batches fold into 10 integer rows of state; the
    scalar z tree runs on the materialized state, not in the stream."""
    ev = events_stream(spark, sf_dir)
    cents = F.round(F.col("value") * 100).cast("bigint")
    g = ev.groupBy(
        "event_type", (F.col("user_id") % 2).cast("int").alias("variant")
    ).agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum(cents).cast("bigint").alias("s1"),
        F.sum(cents * cents).cast("bigint").alias("s2"),
    )
    return _run_to_memory(g, "complete", parts="8")


def events_idrange_replay_dir(
    spark: SparkSession, sf_dir: str, n_files: int = 3
) -> str:
    """Fingerprint-cached events replay split into event_id RANGES (each
    file spans ALL days), so a file-per-trigger stream delivers
    micro-batches whose per-day bitmaps are genuinely PARTIAL — the
    input that makes cross-batch bitmap mergeability a real claim
    instead of a single-batch tautology."""
    from cdc_debezium_kafka_airflow_spark.sources.cache_util import (
        cache_is_fresh,
        source_fingerprint,
        write_fingerprint,
    )
    from cdc_debezium_kafka_airflow_spark.sources.tables import load_table

    tag = os.path.basename(os.path.normpath(sf_dir))
    # Cache tag carries n_files: two callers with different split counts
    # must not share a directory, or the second silently replays the
    # first's split (ADVICE r08 #4).
    replay_dir = os.path.join(
        "/root/repo/.cache", f"events_idrange_{tag}_{n_files}"
    )
    fp = source_fingerprint(sf_dir, "events")
    if not cache_is_fresh(replay_dir, fp):
        ev = load_table(spark, sf_dir, "events").select(
            "event_id", "ts", "user_id"
        )
        hi_row = ev.agg(F.max("event_id")).first()[0]
        if hi_row is None:
            raise ValueError(
                f"events table at {sf_dir} is empty: cannot build an "
                "event_id-range replay split"
            )
        hi = hi_row + 1
        step = max(hi // n_files, 1)
        for i in range(n_files):
            lo, up = i * step, (i + 1) * step if i < n_files - 1 else hi
            mode = "overwrite" if i == 0 else "append"
            ev.filter(
                (F.col("event_id") >= lo) & (F.col("event_id") < up)
            ).coalesce(1).write.mode(mode).parquet(replay_dir)
        write_fingerprint(replay_dir, fp)
    return replay_dir


def stream_rolling_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming twin of win_rolling_distinct: trailing-7-day exact
    distinct users maintained INCREMENTALLY as micro-batches arrive.

    Each micro-batch (an event_id range spanning all days — the worst
    case for distinct counting, every batch touches every day) collapses
    to its own (day, bucket) -> bitmap frame inside foreachBatch; the
    per-batch bitmap partials are the STATE a production job would MERGE
    into a bitmap table with bitmap_or (snk_jdbc_upsert's machinery) —
    here they accumulate and the final OR-merge + x7 fan-out runs once at
    end-of-replay, proving the bitmaps are cross-batch mergeable: the
    hash must equal the one-shot batch computation exactly. Exact, never
    a sketch; per-batch state is |days x buckets| rows regardless of
    batch size.

    Scale posture: in continuous operation the per-batch partial is a
    MERGE (bitmap_or) into the keyed state table — constant work per
    batch; the rolling readout is the same bitmap fan-out as the batch
    query, over a frame that never grows with event volume."""
    import pandas as pd

    replay = events_idrange_replay_dir(spark, sf_dir)
    file_schema = spark.read.parquet(replay).schema
    stream = normalize_ts(
        spark.readStream.schema(file_schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(os.path.join(replay, "part-*"))
    )
    # keyed by batch_id: at-least-once foreachBatch re-delivery
    # overwrites its own slot, never double-ORs a batch (ADVICE r09)
    partials: dict[int, pd.DataFrame] = {}
    ck = temp_checkpoint_dir()

    def absorb(batch_df: DataFrame, batch_id: int) -> None:
        bm = (
            batch_df.select(
                F.date_trunc("day", "ts").alias("day"), "user_id"
            )
            .groupBy(
                "day", F.expr("bitmap_bucket_number(user_id)").alias("bkt")
            )
            .agg(
                F.expr(
                    "bitmap_construct_agg(bitmap_bit_position(user_id))"
                ).alias("bm")
            )
        )
        partials[batch_id] = bm.toPandas()

    import shutil

    try:
        q = (
            stream.writeStream.foreachBatch(absorb)
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        shutil.rmtree(ck, ignore_errors=True)

    merged_pdf = pd.concat(
        [partials[k] for k in sorted(partials)], ignore_index=True
    )
    state = spark.createDataFrame(merged_pdf)
    bm = state.groupBy("day", "bkt").agg(
        F.expr("bitmap_or_agg(bm)").alias("bm")
    )
    fan = bm.select(
        F.explode(
            F.expr("sequence(day, day + INTERVAL 6 DAY, INTERVAL 1 DAY)")
        ).alias("tday"),
        "day",
        "bkt",
        "bm",
    )
    rolled = fan.groupBy("tday", "bkt").agg(
        F.expr("bitmap_count(bitmap_or_agg(bm))").alias("n7"),
        F.max(
            F.when(F.col("day") == F.col("tday"), F.expr("bitmap_count(bm)"))
        ).alias("n1"),
        F.max(F.when(F.col("day") == F.col("tday"), 1)).alias("own"),
    )
    return (
        rolled.groupBy(F.col("tday").cast("timestamp").alias("day"))
        .agg(
            F.sum("n7").cast("bigint").alias("users_7d"),
            F.sum(F.coalesce(F.col("n1"), F.lit(0)))
            .cast("bigint")
            .alias("users_1d"),
            F.max("own").alias("_own"),
        )
        .where(F.col("_own") == 1)
        .drop("_own")
    )
