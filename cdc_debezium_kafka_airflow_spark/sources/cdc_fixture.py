"""Deterministic Debezium-style changelog derived from the ``events`` table.

This is the engine's stand-in for the reference's Kafka CDC topics
(one topic per table, ``mysql-server.pos_bi_db.<table>``, reference
register-mysql-connector.json:10,12). Every derivation rule below is pure
arithmetic on ``event_id`` so a DuckDB oracle can reproduce the *results* of
downstream operators without re-implementing the JSON round-trip.

THE CHANGELOG SPEC (shared contract with queries/oracles — keep in sync):

  offset     = event_id                       (total order; the reference
                                               assumes single-partition order,
                                               dags/kafka_latency_monitor.py:49)
  table      = CASE event_type                (maps onto 5 of the reference's 9
                 'click'    -> 'ventas'        replicated tables,
                 'view'     -> 'productos'     register-mysql-connector.json:12)
                 'purchase' -> 'detalle_ventas'
                 'signup'   -> 'entidades'
                 else       -> 'pagos_clientes'
  topic      = 'mysql-server.pos_bi_db.' || table
  op         = event_id % 10 in 0..4 -> 'c'   (create)
               event_id % 10 in 5..7 -> 'u'   (update)
               event_id % 10 == 8    -> 'd'   (delete)
               event_id % 10 == 9    -> 'r'   (snapshot read)
  tombstone  = (event_id % 20 == 8)           -> value IS NULL, key kept
               (drop.tombstones=false, reference register-postgres-sink.json:24;
                the other half of the deletes, event_id % 20 == 18, carry a
                full op='d' envelope with after=NULL)
  malformed  = (event_id % 97 == 0 AND event_id % 10 < 8)
               -> value = '{"malformed":' || event_id   (unparseable JSON ->
               DLQ path, errors.tolerance=all, register-postgres-sink.json:18-20)
  key        = '{"payload":{"id":' || user_id || '}}'   (pk.mode=record_key,
               register-postgres-sink.json:17)
  value      = JSON envelope {"schema":{...},"payload":{before,after,source,
               op,ts_ms}} (JsonConverter schemas.enable=true,
               register-mysql-connector.json:22-25)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from cdc_debezium_kafka_airflow_spark.schemas import EVENTS_SCHEMA

TOPIC_PREFIX = "mysql-server.pos_bi_db."

# Microsecond-precision JSON timestamps so the ser/de round-trip is lossless
# against the microsecond source data. (The reference narrows temporals to
# millis — time.precision.mode=connect, register-mysql-connector.json:16 —
# we deliberately keep source precision instead of loss.)
JSON_TS_OPTS = {
    "timestampFormat": "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX",
    # base-table timestamps (orders/lineitem) surface as TIMESTAMP_NTZ
    "timestampNTZFormat": "yyyy-MM-dd'T'HH:mm:ss.SSSSSS",
}

# event_type -> reference table (register-mysql-connector.json:12 names)
EVENT_TYPE_TO_TABLE = {
    "click": "ventas",
    "view": "productos",
    "purchase": "detalle_ventas",
    "signup": "entidades",
    # 'error' and anything else:
}
DEFAULT_TABLE = "pagos_clientes"

# SQL fragments reused by the DuckDB oracles (single source of truth).
SQL_TABLE_CASE = (
    "CASE event_type WHEN 'click' THEN 'ventas' WHEN 'view' THEN 'productos' "
    "WHEN 'purchase' THEN 'detalle_ventas' WHEN 'signup' THEN 'entidades' "
    "ELSE 'pagos_clientes' END"
)
SQL_OP_CASE = (
    "CASE WHEN event_id % 10 <= 4 THEN 'c' WHEN event_id % 10 <= 7 THEN 'u' "
    "WHEN event_id % 10 = 8 THEN 'd' ELSE 'r' END"
)
SQL_IS_MALFORMED = "(event_id % 97 = 0 AND event_id % 10 < 8)"
SQL_IS_TOMBSTONE = "(event_id % 20 = 8)"


def _table_col() -> F.Column:
    expr = None
    for etype, table in EVENT_TYPE_TO_TABLE.items():
        cond = F.col("event_type") == etype
        expr = F.when(cond, table) if expr is None else expr.when(cond, table)
    return expr.otherwise(DEFAULT_TABLE)


def _op_col() -> F.Column:
    m = F.col("event_id") % 10
    return (
        F.when(m <= 4, "c").when(m <= 7, "u").when(m == 8, "d").otherwise("r")
    )


def build_changelog(events: DataFrame) -> DataFrame:
    """events -> Kafka-record-shaped changelog.

    Output columns mirror Spark's Kafka batch source projection:
      (offset long, topic string, partition int, key string, value string,
       timestamp timestamp)
    ``value`` is the serialized Debezium envelope (``ser_json_schema``),
    NULL for tombstones, deliberately-broken JSON for the DLQ fraction.

    Scale: narrow, stateless projection — no shuffle; at 100 TB this is a
    map-only stage fused into whole-stage codegen.
    """
    # the fixture arrives as one parquet file = one input split; spread the
    # JSON serialize/parse work across cores (a real Kafka source is already
    # partitioned, so this shuffle exists only in the replay path)
    events = events.repartition(
        events.sparkSession.sparkContext.defaultParallelism
    )
    row_image = F.struct(*[F.col(f.name) for f in EVENTS_SCHEMA.fields])
    table = _table_col()
    op = _op_col()
    ts_ms = (F.unix_micros(F.col("ts")) / F.lit(1000)).cast("long")

    envelope = F.struct(
        F.struct(
            F.lit("struct").alias("type"),
            F.concat(F.lit(TOPIC_PREFIX), table, F.lit(".Envelope")).alias("name"),
        ).alias("schema"),
        F.struct(
            F.when(op.isin("u", "d"), row_image).alias("before"),
            F.when(op != "d", row_image).alias("after"),
            F.struct(
                F.lit("pos_bi_db").alias("db"),
                table.alias("table"),
                ts_ms.alias("ts_ms"),
            ).alias("source"),
            op.alias("op"),
            ts_ms.alias("ts_ms"),
        ).alias("payload"),
    )

    is_tombstone = (F.col("event_id") % 20) == 8
    is_malformed = ((F.col("event_id") % 97) == 0) & ((F.col("event_id") % 10) < 8)

    value = (
        F.when(is_tombstone, F.lit(None).cast("string"))
        .when(
            is_malformed,
            F.concat(F.lit('{"malformed":'), F.col("event_id").cast("string")),
        )
        .otherwise(F.to_json(envelope, JSON_TS_OPTS))
    )
    key = F.to_json(
        F.struct(F.struct(F.col("user_id").alias("id")).alias("payload"))
    )

    # Pushdown guard (round-12 measurement): a consumer filter that
    # references `value` (split_dlq's parse-failure predicate) is otherwise
    # pushed BELOW the repartition above, inlining the whole
    # to_json+from_json roundtrip into the pre-shuffle stage — which for
    # this one-file fixture is a SINGLE task (one parquet row group = one
    # split), and the optimizer additionally evaluates the inlined
    # serialize twice inside the pushed predicate. Measured at sf0.1:
    # upsert_materialize 1.47 s -> 0.62 s, snk_pydatasource_dlq's write
    # branch 2.28 s -> parallel, ser_json_schema 0.78 s -> 0.56 s. The
    # CASE WHEN spark_partition_id() wrapper is value-identical (partition
    # ids are never negative, so the branch is always taken) but marks the
    # column non-deterministic, the one mechanism the optimizer respects
    # for "do not re-evaluate this below here" (the same fix the
    # optimization guide §4.4 applies to duplicated UDFs; a rand()-based
    # guard does NOT survive — Spark 4.1 constant-folds rand() compared
    # against out-of-range literals).
    # Filters on the cheap columns (topic, offset, timestamp) still push
    # through to the scan. A real Kafka source is already partitioned and
    # does not take this path.
    return events.select(
        F.col("event_id").alias("offset"),
        F.concat(F.lit(TOPIC_PREFIX), table).alias("topic"),
        F.lit(0).alias("partition"),
        key.alias("key"),
        F.when(F.spark_partition_id() >= F.lit(-1), value).alias("value"),
        F.col("ts").alias("timestamp"),
    )
