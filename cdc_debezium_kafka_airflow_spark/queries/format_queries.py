"""Source/sink format coverage: JSON-lines and CSV sources, partitioned
parquet sink. Each query materializes the format once into `.cache/`
(deterministic content) and reads it back through the real reader, so the
format codepath — schema application, type coercion, partition layout — is
what's verified against the oracle."""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

from cdc_debezium_kafka_airflow_spark.queries.common import t
from cdc_debezium_kafka_airflow_spark.queries.cdc_queries import MAT_CTE, _unwrapped
from cdc_debezium_kafka_airflow_spark.operators.cdc import upsert_materialize
from cdc_debezium_kafka_airflow_spark.sources.cache_util import (
    cache_is_fresh,
    source_fingerprint,
    write_fingerprint,
)

QUERIES = {}
ORACLES = {}


def q(name: str, oracle: str | None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def _cache_dir(sf_dir: str, kind: str) -> str:
    tag = os.path.basename(os.path.normpath(sf_dir))
    return os.path.join("/root/repo/.cache", f"{kind}_{tag}")


EVENTS_DDL = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


@q(
    "src_json_lines",
    """
    SELECT event_type, count(*) AS n_events,
           round(sum(value), 4) AS sum_value,
           max(ts) AS max_ts
    FROM events GROUP BY event_type
    """,
)
def src_json_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON-lines source: events written once as .jsonl (µs timestamps),
    read back with an explicit schema — schema-on-read typed parsing, the
    second-most-common lake format after parquet."""
    path = _cache_dir(sf_dir, "events_jsonl")
    fp = source_fingerprint(sf_dir, "events")
    if not cache_is_fresh(path, fp):
        t(spark, sf_dir, "events").write.mode("overwrite").option(
            "timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX"
        ).json(path)
        write_fingerprint(path, fp)
    df = (
        spark.read.schema(EVENTS_DDL)
        .option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX")
        .json(path)
    )
    return df.groupBy("event_type").agg(
        F.count("*").alias("n_events"),
        F.round(F.sum("value"), 4).alias("sum_value"),
        F.max("ts").alias("max_ts"),
    )


@q(
    "src_csv",
    """
    SELECT event_type, count(*) AS n_events,
           round(sum(value), 4) AS sum_value,
           coalesce(max(event_id), 0) AS max_id
    FROM events GROUP BY event_type
    """,
)
def src_csv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CSV source with header + explicit schema + µs timestamp format —
    the quoting/escaping round-trip is exercised by the JSON `props` column
    (embedded quotes and commas)."""
    path = _cache_dir(sf_dir, "events_csv")
    fp = source_fingerprint(sf_dir, "events")
    if not cache_is_fresh(path, fp):
        t(spark, sf_dir, "events").write.mode("overwrite").option(
            "header", "true"
        ).option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSSSS").csv(path)
        write_fingerprint(path, fp)
    df = (
        spark.read.schema(EVENTS_DDL)
        .option("header", "true")
        .option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSSSS")
        .csv(path)
    )
    return df.groupBy("event_type").agg(
        F.count("*").alias("n_events"),
        F.round(F.sum("value"), 4).alias("sum_value"),
        F.coalesce(F.max("event_id"), F.lit(0)).alias("max_id"),
    )


@q(
    "snk_partitioned_parquet",
    f"""
    WITH {MAT_CTE}
    SELECT table_name, count(*) AS n_rows,
           coalesce(max(last_offset), 0) AS max_offset
    FROM mat GROUP BY table_name
    """,
)
def snk_partitioned_parquet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partitioned warehouse sink: the CDC-materialized state written
    `partitionBy(table_name)` (one directory per destination table — the
    lake analog of the reference's per-table Postgres mirrors), then read
    back and profiled per partition. Reading a single partition later is a
    directory prune, not a scan+filter."""
    path = _cache_dir(sf_dir, "warehouse")
    state = upsert_materialize(_unwrapped(spark, sf_dir))
    state.write.mode("overwrite").partitionBy("table_name").parquet(path)
    back = spark.read.parquet(path)
    return back.groupBy("table_name").agg(
        F.count("*").alias("n_rows"),
        F.coalesce(F.max("last_offset"), F.lit(0)).alias("max_offset"),
    )


@q(
    "src_jdbc_federated",
    """
    SELECT n.n_name, count(*) AS n_customers,
           round(sum(c.c_acctbal), 2) AS total_acctbal
    FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
    GROUP BY n.n_name
    """,
)
def src_jdbc_federated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TRUE external-JDBC federation through Spark's real JDBC source: the
    nation dim is written to an EXTERNAL relational database over
    ``DataFrameWriter.jdbc`` (embedded Apache Derby — the one JDBC engine
    shipped in every Spark distribution), read back over
    ``spark.read.jdbc``, and joined with the parquet fact table.

    This is the reference's external-integrity shape — its dynamic DAG reads
    MySQL/Postgres over connections (reference
    dags/cdc_data_integrity_dynamic_dag.py:48-55) — exercised through the
    genuine Spark JDBC codepath: DriverManager on executors, dialect DDL,
    scan-time column pruning. In production the URL points at a served
    MySQL/Postgres and everything else is identical; embedded Derby is the
    sandbox stand-in (single-JVM — fine under local[*], where executors
    share the driver JVM).
    """
    tag = os.path.basename(os.path.normpath(sf_dir))
    # process-scoped: Derby's per-directory boot lock is exclusive, and
    # this db is scratch (NATION_DIM overwritten per run) — see cache_util
    from cdc_debezium_kafka_airflow_spark.sources.cache_util import (
        process_scoped_db_path,
    )

    url = f"jdbc:derby:{process_scoped_db_path(f'derby_fed_{tag}')};create=true"
    props = {"driver": "org.apache.derby.jdbc.EmbeddedDriver"}
    nation = t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    nation.write.jdbc(url, "NATION_DIM", mode="overwrite", properties=props)
    dim = spark.read.jdbc(url, "NATION_DIM", properties=props)
    cust = t(spark, sf_dir, "customer")
    return (
        cust.join(F.broadcast(dim), cust.c_nationkey == dim.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count("*").alias("n_customers"),
            F.round(F.sum("c_acctbal"), 2).alias("total_acctbal"),
        )
    )


@q(
    "src_orc",
    """
    SELECT event_type, count(*) AS n_events,
           round(sum(value), 4) AS sum_value,
           max(ts) AS max_ts
    FROM events GROUP BY event_type
    """,
)
def src_orc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORC source: events written once as ORC (vectorized columnar like
    parquet, with its own predicate-pushdown/indexes), read back through
    Spark's native ORC reader — the third lake format after parquet/JSON."""
    path = _cache_dir(sf_dir, "events_orc")
    fp = source_fingerprint(sf_dir, "events")
    if not cache_is_fresh(path, fp):
        t(spark, sf_dir, "events").write.mode("overwrite").orc(path)
        write_fingerprint(path, fp)
    df = spark.read.orc(path)
    return df.groupBy("event_type").agg(
        F.count("*").alias("n_events"),
        F.round(F.sum("value"), 4).alias("sum_value"),
        F.max("ts").alias("max_ts"),
    )


@q(
    "snk_compacted_warehouse",
    f"""
    WITH {MAT_CTE}
    SELECT table_name, count(*) AS n_rows, CAST(1 AS INT) AS n_files
    FROM mat GROUP BY table_name
    """,
)
def snk_compacted_warehouse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-file compaction — the table-maintenance pass every lake needs:
    the CDC-materialized warehouse is rewritten with ONE file per
    table_name partition (`repartition(partition_col)` pre-shuffles so each
    output task owns a whole partition), then audited by reading BACK the
    directory and counting actual parquet files per partition. The oracle
    pins both the row counts (no data lost/duplicated by the rewrite) and
    the file count contract (exactly 1 per partition — at 100 TB the target
    is a size, e.g. 1 GB, not 1 file; the shape of the job is identical).
    Streaming CDC sinks produce a file per micro-batch per partition — this
    is the nightly job that folds them."""
    import os

    path = _cache_dir(sf_dir, "warehouse_compacted")
    state = upsert_materialize(_unwrapped(spark, sf_dir))
    (
        state.repartition(F.col("table_name"))
        .write.mode("overwrite")
        .partitionBy("table_name")
        .parquet(path)
    )
    back = spark.read.parquet(path)
    counts = back.groupBy("table_name").agg(F.count("*").alias("n_rows"))
    # file audit: count real data files per partition directory
    files = []
    for d in os.listdir(path):
        if d.startswith("table_name="):
            n = len(
                [
                    f
                    for f in os.listdir(os.path.join(path, d))
                    if f.endswith(".parquet")
                ]
            )
            files.append((d.split("=", 1)[1], n))
    fdf = spark.createDataFrame(files, "table_name string, n_files int")
    return counts.join(fdf, "table_name")


@q(
    "ctl_backfill",
    """
    WITH e AS (
      SELECT CAST(date_trunc('day', ts) AS DATE) AS d, value FROM events
    ),
    b AS (
      SELECT min(d) AS d0,
             min(d) + CAST(datediff('day', min(d), max(d)) // 2 AS INT) AS cut
      FROM e
    )
    SELECT strftime(d, '%Y-%m-%d') AS day_str,
           CAST(count(*) AS BIGINT) AS n_events,
           round(sum(value), 4) AS sum_value,
           d > (SELECT cut FROM b) AS backfilled
    FROM e GROUP BY d
    """,
)
def ctl_backfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scheduler backfill / catch-up over a date-partitioned warehouse —
    the Airflow `catchup` semantic (reference dags/cdc_health_check_dag.py:42-44
    pins start_date + cron + catchup=False; a backfill run is the same DAG
    executed for every missing logical date) re-expressed as an idempotent
    partition-level catch-up job:

    1. the "already-run" state: daily rollups for the first half of the
       calendar, written `partitionBy(day_str)`;
    2. the scheduler diff: logical dates present in the SOURCE minus
       partitions present in the WAREHOUSE (a partition-directory listing,
       not a data scan) — the bounded driver-side set that an Airflow
       scheduler itself materializes as DagRuns;
    3. the backfill: source filtered to ONLY the missing dates (predicate
       pushed to the scan), written under DYNAMIC partition overwrite so
       re-running any subset is idempotent — existing partitions are
       untouched (mtime-pinned in pytest), completed backfills no-op.

    Scale posture: each backfilled date is an independent partition write
    (at 100 TB: one cluster job per date or one job for all missing dates,
    both map-side partitioned); the only driver-side state is the date
    diff, bounded by the calendar, exactly like Airflow's own run ledger.
    """
    path = _cache_dir(sf_dir, "backfill_warehouse")
    ev = t(spark, sf_dir, "events").select(
        F.col("ts").cast("date").alias("d"), "value"
    )
    d0, d1 = ev.agg(F.min("d"), F.max("d")).first()  # bounded: 1 row
    import datetime as _dt

    cut = d0 + _dt.timedelta(days=(d1 - d0).days // 2)

    def rollup(frame: DataFrame, backfilled: bool) -> DataFrame:
        return (
            frame.groupBy(F.date_format("d", "yyyy-MM-dd").alias("day_str"))
            .agg(
                F.count("*").alias("n_events"),
                F.round(F.sum("value"), 4).alias("sum_value"),
            )
            .withColumn("backfilled", F.lit(backfilled))
        )

    # 1. the half-built warehouse (the state a paused DAG leaves behind)
    rollup(ev.where(F.col("d") <= F.lit(cut)), False).write.mode(
        "overwrite"
    ).partitionBy("day_str").parquet(path)

    # 2. scheduler diff: source logical dates minus existing partitions
    # partition-column type inference reads day_str back as DATE — cast to
    # string so the diff compares like with like
    have = {
        r.day_str
        for r in spark.read.parquet(path)
        .select(F.col("day_str").cast("string").alias("day_str"))
        .distinct()
        .collect()
    }
    want = {
        r.day_str
        for r in ev.select(
            F.date_format("d", "yyyy-MM-dd").alias("day_str")
        ).distinct().collect()
    }
    missing = sorted(want - have)  # bounded by the calendar

    # 3. idempotent catch-up under dynamic partition overwrite
    if missing:
        prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        try:
            rollup(
                ev.where(
                    F.date_format("d", "yyyy-MM-dd").isin(missing)
                ),
                True,
            ).write.mode("overwrite").partitionBy("day_str").parquet(path)
        finally:
            spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)

    back = spark.read.parquet(path)
    return back.select(
        F.col("day_str").cast("string").alias("day_str"),
        "n_events",
        "sum_value",
        "backfilled",
    )


@q(
    "snk_sorted_export",
    """
    SELECT o_orderstatus,
           CAST(count(*) AS BIGINT) AS n_orders,
           round(sum(o_totalprice), 2) AS revenue,
           min(o_orderdate) AS first_date,
           max(o_orderdate) AS last_date
    FROM orders
    GROUP BY o_orderstatus
    """,
)
def snk_sorted_export(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sorted data-layout export: orders written range-partitioned +
    sorted by (o_orderdate, o_orderkey) — the lakehouse layout that turns
    a date-range query into a file prune (every parquet footer carries a
    disjoint min/max date range, so data skipping eliminates whole files,
    the poor-man's Z-order for a 1-D access pattern).

    Scale posture: `repartitionByRange` samples boundaries (one pass) and
    produces evenly-sized sorted files; there is no global sort on a
    single node. The oracle proves the layout is content-lossless; pytest
    (test_sorted_export_layout) proves the file ranges are disjoint by
    reading the parquet footers.
    """
    path = _cache_dir(sf_dir, "sorted_export")
    orders = t(spark, sf_dir, "orders")
    (
        orders.repartitionByRange(8, "o_orderdate", "o_orderkey")
        .sortWithinPartitions("o_orderdate", "o_orderkey")
        .write.mode("overwrite")
        .parquet(path)
    )
    back = spark.read.parquet(path)
    return back.groupBy("o_orderstatus").agg(
        F.count("*").alias("n_orders"),
        F.round(F.sum("o_totalprice"), 2).alias("revenue"),
        F.min("o_orderdate").alias("first_date"),
        F.max("o_orderdate").alias("last_date"),
    )


@q(
    "join_dpp_pruned",
    """
    WITH dim AS (
      SELECT o_orderpriority AS prio,
             CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                  THEN 'fast' ELSE 'slow' END AS tier
      FROM (SELECT DISTINCT o_orderpriority FROM orders)
    )
    SELECT d.prio,
           CAST(count(*) AS BIGINT) AS n_orders,
           round(sum(o.o_totalprice), 2) AS revenue
    FROM orders o JOIN dim d ON o.o_orderpriority = d.prio
    WHERE d.tier = 'fast'
    GROUP BY d.prio
    """,
)
def join_dpp_pruned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dynamic partition pruning: the fact table is PARTITIONED on the join
    key, the dim carries the selective predicate, and Spark prunes fact
    partitions AT RUNTIME from the dim's broadcast result
    (`SubqueryBroadcast dynamicpruning#...` in the plan) — the star-schema
    scan killer: at 100 TB the fact scan reads only the partitions the
    filtered dim names, with no static filter on the fact at all.

    The fact is materialized once per fixture, partitioned by
    o_orderpriority; the dim (priority -> SLA tier) is a real parquet
    table so the tier filter cannot constant-fold into a static prune.
    """
    fact_path = _cache_dir(sf_dir, "dpp_fact")
    dim_path = _cache_dir(sf_dir, "dpp_dim")
    fp = source_fingerprint(sf_dir, "orders")
    if not cache_is_fresh(fact_path, fp):
        t(spark, sf_dir, "orders").write.mode("overwrite").partitionBy(
            "o_orderpriority"
        ).parquet(fact_path)
        write_fingerprint(fact_path, fp)
    if not cache_is_fresh(dim_path, fp):
        t(spark, sf_dir, "orders").select(
            F.col("o_orderpriority").alias("prio")
        ).distinct().withColumn(
            "tier",
            F.when(
                F.col("prio").isin("1-URGENT", "2-HIGH"), "fast"
            ).otherwise("slow"),
        ).write.mode("overwrite").parquet(dim_path)
        write_fingerprint(dim_path, fp)
    fact = spark.read.parquet(fact_path)
    dim = spark.read.parquet(dim_path).where(F.col("tier") == "fast")
    return (
        fact.join(dim, fact.o_orderpriority == dim.prio)
        .groupBy("prio")
        .agg(
            F.count("*").alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
        )
    )


def _zvalue(qx, qy, bits: int):
    """Interleave two `bits`-wide quantized dims into a Z-curve value —
    pure JVM bit expressions (shiftright/and/shiftleft), codegen-friendly."""
    z = F.lit(0)
    for i in range(bits):
        bx = F.shiftright(qx, i).bitwiseAND(F.lit(1))
        by = F.shiftright(qy, i).bitwiseAND(F.lit(1))
        z = z.bitwiseOR(F.shiftleft(bx, 2 * i + 1)).bitwiseOR(
            F.shiftleft(by, 2 * i)
        )
    return z


@q(
    "snk_zorder_export",
    """
    SELECT o_orderpriority,
           CAST(count(*) AS BIGINT) AS n_orders,
           round(sum(o_totalprice), 2) AS revenue,
           min(o_orderdate) AS first_date,
           max(o_orderdate) AS last_date
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def snk_zorder_export(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton-curve) data layout: orders clustered on BOTH
    o_custkey and o_orderdate by interleaving the bits of their 10-bit
    quantized values — the multi-dimensional generalization of
    snk_sorted_export's 1-D range layout. After the rewrite, every parquet
    footer bounds a small rectangle of the (custkey x date) domain, so
    point/range predicates on EITHER dimension skip most files — the
    OPTIMIZE ZORDER BY operation of lakehouse tables, built from Spark
    primitives.

    Scale posture: quantization bounds come from ONE 1-row aggregate
    (broadcast), the z-value is a map-side bit expression, and
    `repartitionByRange(z)` samples boundaries — no global single-node
    sort anywhere. The oracle proves the rewrite is content-lossless;
    tests/test_backfill.py::test_zorder_export_bounds_both_dims proves
    per-file footers bound BOTH dimensions (vs a 1-D sort which bounds
    only one).
    """
    path = _cache_dir(sf_dir, "zorder_export")
    orders = t(spark, sf_dir, "orders")
    bounds = orders.agg(
        F.min("o_custkey").alias("cmin"),
        F.max("o_custkey").alias("cmax"),
        F.min(F.unix_timestamp("o_orderdate")).alias("dmin"),
        F.max(F.unix_timestamp("o_orderdate")).alias("dmax"),
    )
    bits = 10
    scale = (1 << bits) - 1
    withb = orders.join(F.broadcast(bounds))
    qx = F.floor(
        (F.col("o_custkey") - F.col("cmin"))
        * scale
        / F.greatest(F.col("cmax") - F.col("cmin"), F.lit(1))
    ).cast("int")
    qy = F.floor(
        (F.unix_timestamp("o_orderdate") - F.col("dmin"))
        * scale
        / F.greatest(F.col("dmax") - F.col("dmin"), F.lit(1))
    ).cast("int")
    (
        withb.withColumn("zval", _zvalue(qx, qy, bits))
        .drop("cmin", "cmax", "dmin", "dmax")
        .repartitionByRange(8, "zval")
        .sortWithinPartitions("zval")
        .drop("zval")
        .write.mode("overwrite")
        .parquet(path)
    )
    back = spark.read.parquet(path)
    return back.groupBy("o_orderpriority").agg(
        F.count("*").alias("n_orders"),
        F.round(F.sum("o_totalprice"), 2).alias("revenue"),
        F.min("o_orderdate").alias("first_date"),
        F.max("o_orderdate").alias("last_date"),
    )


@q(
    "snk_wap_publish",
    """
    SELECT o_orderstatus,
           CAST(count(*) AS BIGINT) AS n_orders,
           round(sum(o_totalprice), 2) AS revenue,
           'v1' AS published_version,
           CAST(1 AS BIGINT) AS n_rejected_candidates
    FROM orders
    GROUP BY o_orderstatus
    """,
)
def snk_wap_publish(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Write-Audit-Publish protocol, exercised end-to-end INCLUDING the
    failure path: v1 (the clean orders snapshot) stages, passes the audit
    (non-empty, non-null unique PK), and publishes atomically; v2 — a
    corrupted candidate with duplicated order keys — stages, FAILS the
    uniqueness audit, and must leave the manifest pointing at v1. The
    returned frame aggregates what CONSUMERS actually see through the
    manifest, so the oracle (plain orders) proves the bad candidate never
    leaked and the good snapshot is complete.

    Scale posture: the audit is ONE aggregation pass over the staged
    version (count/null/distinct together); publish is a single atomic
    manifest replace (the object-store conditional-put shape), never a
    data move. Citation: the reference publishes straight into consumer
    tables (register-postgres-sink.json:9-10) with after-the-fact checks
    (dags/cdc_data_integrity_dynamic_dag.py:49-55); WAP is that integrity
    check moved BEFORE visibility.
    """
    from cdc_debezium_kafka_airflow_spark.operators.publish import (
        current_version,
        read_published,
        write_audit_publish,
    )

    root = _cache_dir(sf_dir, "wap_orders")
    orders = t(spark, sf_dir, "orders")

    ok1 = write_audit_publish(orders, root, "v1", "o_orderkey")
    assert ok1, "clean snapshot must publish"

    corrupted = orders.unionAll(orders.limit(50))  # duplicate PKs
    ok2 = write_audit_publish(corrupted, root, "v2", "o_orderkey")
    n_rejected = 0 if ok2 else 1

    published = read_published(spark, root)
    return published.groupBy("o_orderstatus").agg(
        F.count("*").alias("n_orders"),
        F.round(F.sum("o_totalprice"), 2).alias("revenue"),
        F.lit(current_version(root)).alias("published_version"),
        F.lit(n_rejected).cast("long").alias("n_rejected_candidates"),
    )


@q(
    "ddl_warehouse_lifecycle",
    """
    SELECT o_orderstatus,
           count(*) AS n_orders,
           round(sum(o_totalprice), 2) AS revenue,
           CAST(count(CASE WHEN o_orderkey % 2 = 1 THEN 1 END) AS BIGINT)
             AS n_with_priority
    FROM orders
    GROUP BY o_orderstatus
    """,
)
def ddl_warehouse_lifecycle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference sink's auto.create / auto.evolve
    (register-postgres-sink.json:13-14) replayed against Spark's OWN
    catalog with real DDL: CREATE TABLE (v1 schema, no priority column),
    INSERT the v1 generation, ALTER TABLE ADD COLUMNS when the evolved
    generation arrives, INSERT v2 WITH the new column, and serve the
    merged table — pre-DDL rows read NULL priority, exactly Connect's
    additive-evolution semantics, but enforced by a catalog rather than a
    frame union (xf_schema_evolve's in-engine twin).

    Scale note: the DDL is metadata-only (no rewrite of v1 files); the
    INSERTs are ordinary parquet appends under the table location."""
    import shutil

    orders = t(spark, sf_dir, "orders")
    tag = os.path.basename(os.path.normpath(sf_dir))
    tbl = f"wh_orders_{tag.replace('.', '_')}"
    loc = _cache_dir(sf_dir, "ddl_warehouse")
    spark.sql(f"DROP TABLE IF EXISTS {tbl}")
    shutil.rmtree(loc, ignore_errors=True)
    spark.sql(
        f"""
        CREATE TABLE {tbl} (
          o_orderkey BIGINT, o_custkey BIGINT, o_orderstatus STRING,
          o_totalprice DOUBLE, o_orderdate TIMESTAMP
        ) USING PARQUET LOCATION '{loc}'
        """
    )
    v1 = orders.filter(F.col("o_orderkey") % 2 == 0).select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate",
    )
    v1.createOrReplaceTempView("ddl_v1_src")
    spark.sql(f"INSERT INTO {tbl} SELECT * FROM ddl_v1_src")

    spark.sql(f"ALTER TABLE {tbl} ADD COLUMNS (o_orderpriority STRING)")
    v2 = orders.filter(F.col("o_orderkey") % 2 == 1).select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority",
    )
    v2.createOrReplaceTempView("ddl_v2_src")
    spark.sql(f"INSERT INTO {tbl} SELECT * FROM ddl_v2_src")

    return spark.sql(
        f"""
        SELECT o_orderstatus,
               count(*) AS n_orders,
               round(sum(o_totalprice), 2) AS revenue,
               count(o_orderpriority) AS n_with_priority
        FROM {tbl}
        GROUP BY o_orderstatus
        """
    )


@q(
    "ddl_default_values",
    """
    SELECT o_orderstatus,
           CASE WHEN o_orderkey % 2 = 0 THEN 'UNSPECIFIED'
                ELSE o_orderpriority END AS priority_class,
           count(*) AS n_orders
    FROM orders
    GROUP BY 1, 2
    """,
)
def ddl_default_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column EXISTENCE DEFAULTS (Spark 3.4+): ALTER TABLE ADD COLUMN ...
    DEFAULT 'UNSPECIFIED' — rows written BEFORE the DDL read the default
    without any file rewrite (the default lives in table metadata and is
    injected at scan time), rows written after carry real values. This is
    the metadata-only backfill that makes additive schema evolution free
    at 100 TB: zero bytes of the v1 generation move.

    The oracle reproduces the generation split in closed form (even keys
    are v1 = default, odd keys carry their true priority)."""
    import shutil

    orders = t(spark, sf_dir, "orders")
    tag = os.path.basename(os.path.normpath(sf_dir))
    tbl = f"wh_default_{tag.replace('.', '_')}"
    loc = _cache_dir(sf_dir, "ddl_default")
    spark.sql(f"DROP TABLE IF EXISTS {tbl}")
    shutil.rmtree(loc, ignore_errors=True)
    spark.sql(
        f"""
        CREATE TABLE {tbl} (
          o_orderkey BIGINT, o_orderstatus STRING
        ) USING PARQUET LOCATION '{loc}'
        """
    )
    orders.filter(F.col("o_orderkey") % 2 == 0).select(
        "o_orderkey", "o_orderstatus"
    ).createOrReplaceTempView("ddl_def_v1")
    spark.sql(f"INSERT INTO {tbl} SELECT * FROM ddl_def_v1")
    spark.sql(
        f"ALTER TABLE {tbl} ADD COLUMN priority_class STRING"
        f" DEFAULT 'UNSPECIFIED'"
    )
    orders.filter(F.col("o_orderkey") % 2 == 1).select(
        "o_orderkey", "o_orderstatus", "o_orderpriority"
    ).createOrReplaceTempView("ddl_def_v2")
    spark.sql(f"INSERT INTO {tbl} SELECT * FROM ddl_def_v2")
    return spark.sql(
        f"""
        SELECT o_orderstatus, priority_class, count(*) AS n_orders
        FROM {tbl} GROUP BY 1, 2
        """
    )


@q(
    "perf_cache_table",
    """
    WITH seg AS (
      SELECT c_mktsegment, c_custkey FROM customer WHERE c_acctbal > 0
    )
    SELECT s.c_mktsegment,
           count(DISTINCT s.c_custkey) AS n_customers,
           count(o_orderkey) AS n_orders
    FROM seg s JOIN orders ON o_custkey = s.c_custkey
    GROUP BY 1
    """,
)
def perf_cache_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CACHE TABLE: a hot derived relation pinned columnar in executor
    memory (InMemoryTableScan — plan-guarded by
    tests/test_scale_plans.py::test_cache_table_serves_from_memory) and
    served to a consuming join without re-reading parquet. The
    materialized-intermediate pattern the shingle-cache uses on disk,
    here in memory — at 100 TB this is the dashboard/BI accelerator for
    dimensions that fit the cluster's storage memory. The cache is
    dropped before returning so no other query inherits pinned memory."""
    c = t(spark, sf_dir, "customer")
    c.createOrReplaceTempView("cache_cust_base")
    spark.sql("DROP VIEW IF EXISTS cache_seg")
    spark.sql(
        """
        CREATE OR REPLACE TEMPORARY VIEW cache_seg AS
        SELECT c_mktsegment, c_custkey FROM cache_cust_base
        WHERE c_acctbal > 0
        """
    )
    spark.sql("CACHE TABLE cache_seg")
    try:
        o = t(spark, sf_dir, "orders").select("o_custkey", "o_orderkey")
        out = (
            spark.table("cache_seg")
            .join(o, F.col("o_custkey") == F.col("c_custkey"))
            .groupBy("c_mktsegment")
            .agg(
                F.count_distinct("c_custkey").alias("n_customers"),
                F.count("o_orderkey").alias("n_orders"),
            )
        )
        out.count()  # serve while cached (plan pinned in the test)
        return out
    finally:
        spark.sql("UNCACHE TABLE IF EXISTS cache_seg")


@q(
    "snk_bloom_parquet",
    """
    SELECT o_orderstatus,
           count(*) AS n_orders,
           round(sum(o_totalprice), 2) AS revenue
    FROM orders
    WHERE o_orderkey IN (42, 4242, 9000, 12345)
    GROUP BY o_orderstatus
    """,
)
def snk_bloom_parquet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parquet BLOOM FILTERS on the write path
    (parquet.bloom.filter.enabled#col): point-lookup data skipping for
    HIGH-CARDINALITY keys, where min/max footer ranges are useless (every
    file spans nearly the full key domain). At 100 TB, a key-probe
    ("find this order") consults each file's bloom filter and skips files
    that definitely lack the key — the complement of snk_sorted_export's
    range skipping. Sized via expected.ndv so the filter is bits-per-key,
    not the unsized default.

    The oracle proves the bloomed file is content-lossless under a point
    IN-probe; tests/test_backfill.py::test_bloom_parquet_bigger_than_plain
    proves the filters physically exist (file-size delta)."""
    import shutil

    path = _cache_dir(sf_dir, "bloom_orders")
    shutil.rmtree(path, ignore_errors=True)
    orders = t(spark, sf_dir, "orders")
    (
        orders.write.option("parquet.bloom.filter.enabled#o_orderkey", "true")
        .option("parquet.bloom.filter.expected.ndv#o_orderkey", "100000")
        .parquet(path)
    )
    back = spark.read.parquet(path).filter(
        F.col("o_orderkey").isin(42, 4242, 9000, 12345)
    )
    return back.groupBy("o_orderstatus").agg(
        F.count("*").alias("n_orders"),
        F.round(F.sum("o_totalprice"), 2).alias("revenue"),
    )


@q(
    "fn_metadata_columns",
    """
    SELECT o_orderstatus,
           count(*) AS n_orders,
           CAST(1 AS BIGINT) AS n_files,
           round(sum(o_totalprice), 2) AS revenue
    FROM orders
    GROUP BY o_orderstatus
    """,
)
def fn_metadata_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hidden ``_metadata`` columns: every file-source row exposes its
    physical provenance (_metadata.file_path / file_name / row_index) —
    the built-in lineage surface an auditor uses to answer "which file did
    this row come from" without any custom bookkeeping. Here a
    status-partitioned warehouse is read back WITH provenance: the
    partition value is re-derived from the FILE PATH alone (proving the
    hive layout round-trips) and per-partition file counts come from
    counting distinct _metadata.file_name.

    The write coalesces to one file per partition, so n_files is the
    deterministic compaction contract the oracle can check."""
    import shutil

    path = _cache_dir(sf_dir, "meta_orders")
    shutil.rmtree(path, ignore_errors=True)
    orders = t(spark, sf_dir, "orders")
    (
        orders.coalesce(1)
        .write.partitionBy("o_orderstatus")
        .parquet(path)
    )
    back = spark.read.parquet(path).select(
        F.regexp_extract(
            F.col("_metadata.file_path"), r"o_orderstatus=([^/]+)/", 1
        ).alias("path_status"),
        F.col("_metadata.file_name").alias("file_name"),
        "o_totalprice",
    )
    return back.groupBy(F.col("path_status").alias("o_orderstatus")).agg(
        F.count("*").alias("n_orders"),
        F.count_distinct("file_name").alias("n_files"),
        F.round(F.sum("o_totalprice"), 2).alias("revenue"),
    )


@q(
    "src_avro",
    """
    SELECT event_type, count(*) AS n_events,
           round(sum(value), 4) AS sum_value,
           max(ts) AS max_ts,
           CAST(max(length(props)) AS BIGINT) AS max_props_len
    FROM events GROUP BY event_type
    """,
)
def src_avro(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Avro source/sink WITHOUT the spark-avro jar: a pure-Python Avro
    Object Container File codec (public spec subset: zigzag-varint longs,
    IEEE doubles, length-prefixed strings, [null,T] unions,
    timestamp-micros logical type, sync-marked blocks) behind the Python
    DataSource API (sources/avro_py.py). Events are written once through
    the avro_py WRITER (per-task part files + commit manifest), read back
    through the avro_py READER (one task per committed file, Arrow batch
    per file, schema derived from the container header — no schema option
    needed), and aggregated; the oracle runs the same aggregate on the
    original parquet, so a single corrupted varint, wrong union branch, or
    micros drift anywhere in the round-trip flips the hash.

    Closes ROADMAP.md 12b (Debezium shops commonly run Avro on the wire):
    format coverage is now parquet/JSON/CSV/ORC/JDBC/Avro + the DataSource
    API. Scale: the container's block structure supports split reads; this
    connector partitions per FILE (documented), sized by writer tasks."""
    import json as _json
    import shutil

    from cdc_debezium_kafka_airflow_spark.sources.avro_py import (
        AvroDataSource,
        EVENTS_AVRO_SCHEMA,
    )

    spark.dataSource.register(AvroDataSource)
    path = _cache_dir(sf_dir, "events_avro")
    # ":8f": 8 writer tasks -> 8 container files -> 8 parallel decode
    # tasks on the read side (r13, guide §6 — the connector partitions
    # per file, so a single-file store serialized the whole decode on
    # one task)
    fp = source_fingerprint(sf_dir, "events") + ":8f"
    if not cache_is_fresh(path, fp):
        shutil.rmtree(path, ignore_errors=True)
        t(spark, sf_dir, "events").repartition(8).write.format(
            "avro_py"
        ).option(
            "path", path
        ).option(
            "avro_schema", _json.dumps(EVENTS_AVRO_SCHEMA)
        ).mode("append").save()
        write_fingerprint(path, fp)
    df = spark.read.format("avro_py").option("path", path).load()
    return df.groupBy("event_type").agg(
        F.count("*").alias("n_events"),
        F.round(F.sum("value"), 4).alias("sum_value"),
        F.max("ts").alias("max_ts"),
        F.max(F.length("props")).cast("long").alias("max_props_len"),
    )


@q(
    "snk_avro_stream",
    """
    SELECT event_type, count(*) AS n_events,
           round(sum(value), 4) AS sum_value,
           max(ts) AS max_ts
    FROM events GROUP BY event_type
    """,
)
def snk_avro_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING Avro archival sink: the events replay (4 files, 2 per
    micro-batch — two batches keep the per-batch manifest protocol live
    while matching production archival practice of batching bigger;
    per-batch overhead, not encode, is this job's fixed cost) streams
    through the avro_py STREAM writer — per-batch uuid part files + an
    atomically-replaced `_batch-<id>.json` manifest, the exactly-once
    contract — producing a standards-conformant Avro archive (the
    Kafka-topic -> Avro-files job Debezium shops run for long-term
    retention). The encode itself is the vectorized Arrow path
    (write_container_arrow ragged scatter — the round-4 fix for the
    per-record Python encode). Read back through the avro_py reader,
    which resolves ONLY manifest-listed files, and aggregated; the oracle
    runs the same aggregate over the original parquet, so any loss,
    duplicate, or codec corruption across the stream -> archive -> read
    path flips the hash."""
    import json as _json
    import shutil

    from cdc_debezium_kafka_airflow_spark.sources.avro_py import (
        AvroDataSource,
        EVENTS_AVRO_SCHEMA,
    )
    from cdc_debezium_kafka_airflow_spark.streaming.jobs import (
        temp_checkpoint_dir,
    )

    from cdc_debezium_kafka_airflow_spark.sources.cache_util import (
        cache_is_fresh,
        source_fingerprint,
        write_fingerprint,
    )

    spark.dataSource.register(AvroDataSource)
    tag = os.path.basename(os.path.normpath(sf_dir))
    base = os.path.join("/root/repo/.cache", f"avro_stream_{tag}")
    src = os.path.join(base, "src")
    out = os.path.join(base, "out")
    # the 4-file replay source is a derived cache (same pattern as the
    # other replay dirs); only the archive output is rebuilt per run
    fp = source_fingerprint(sf_dir, "events")
    if not cache_is_fresh(src, fp):
        shutil.rmtree(base, ignore_errors=True)
        t(spark, sf_dir, "events").repartition(4).write.parquet(src)
        write_fingerprint(src, fp)
    shutil.rmtree(out, ignore_errors=True)
    schema = spark.read.parquet(src).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "2")
        .parquet(os.path.join(src, "*.parquet"))
    )
    ck = temp_checkpoint_dir()
    try:
        q_ = (
            stream.writeStream.format("avro_py")
            .option("path", out)
            .option("avro_schema", _json.dumps(EVENTS_AVRO_SCHEMA))
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        q_.awaitTermination()
    finally:
        shutil.rmtree(ck, ignore_errors=True)
    back = spark.read.format("avro_py").option("path", out).load()
    return back.groupBy("event_type").agg(
        F.count("*").alias("n_events"),
        F.round(F.sum("value"), 4).alias("sum_value"),
        F.max("ts").alias("max_ts"),
    )


@q(
    "snk_index_compact",
    """
    SELECT CAST(count(*) AS BIGINT) AS n_rows,
           TRUE AS content_identical,
           TRUE AS files_reduced
    FROM embeddings
    """,
)
def snk_index_compact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-files COMPACTION of a continuously-appended cell-partitioned
    store (the OPTIMIZE job every append-mode index/warehouse needs): four
    append rounds fragment each cell into ~4 small files — exactly what
    stream_index_append's per-micro-batch appends produce over a day —
    then the compactor rewrites the store with ONE shuffle keyed on the
    partition column (`repartition("cell")` routes every cell to a single
    task, so `partitionBy` emits one file per cell), byte-preserving the
    rows. The audit proves content identity in ONE full-outer join (no
    row lost, duplicated, or moved across cells) and that the file count
    actually dropped; at 100 TB this job runs per-partition-subset with
    the same plan, and the read-side win is fewer tasks + working
    row-group statistics. Reference parity: the reference's sink tables
    get this from Postgres autovacuum; a lake store must schedule it."""
    import os as _os

    from cdc_debezium_kafka_airflow_spark.operators.similarity import (
        as_double,
        nearest_cell_assigner,
        normalized,
        train_ivf_centroids,
    )
    from cdc_debezium_kafka_airflow_spark.sources.cache_util import (
        source_fingerprint,
    )

    e = t(spark, sf_dir, "embeddings")
    fp = source_fingerprint(sf_dir, "embeddings")
    # explicit id/vec columns (r13): this call used to resolve only via a
    # memo/artifact hit populated by an earlier ANN query — cold training
    # on the raw embeddings table needs the real column names
    cents = train_ivf_centroids(
        e, id_col="vec_id", vec_col="embedding", k=8, cache_key=fp
    )
    cent_rows = [(r["centroid_id"], r["centroid"]) for r in cents.collect()]
    assigner = nearest_cell_assigner(
        cent_rows, vec_col="vec", id_col="vid", cid_col="cell",
        d2_col="__d2",
    )
    v = normalized(
        e.select(
            F.col("vec_id").alias("vid"),
            as_double(F.col("embedding")).alias("vec"),
        ),
        "vec",
        "nvec",
    ).select("vid", F.col("nvec").alias("vec"))
    assigned = assigner(v).select("vid", "vec", "cell")

    frag_dir = _cache_dir(sf_dir, "index_frag")
    compact_dir = _cache_dir(sf_dir, "index_compact")
    import shutil

    shutil.rmtree(frag_dir, ignore_errors=True)
    shutil.rmtree(compact_dir, ignore_errors=True)
    # Fragmentation setup in ONE pass (round 12): the former four
    # append rounds each re-scanned and re-shuffled the assigned frame
    # (4 jobs + a persist to stop lineage recompute). Round-13 (ADVICE):
    # the multi-file-per-cell guarantee must be CORE-COUNT-INDEPENDENT —
    # on a 1-core runner the numbered repartition collapses to one task
    # and hash spread alone would leave exactly one file per cell
    # (nothing to compact, audit fails deterministically). The guarantee
    # now comes from maxRecordsPerFile = ceil(n / (cells * 4)): every
    # task splits its per-cell output at that bound, so the largest cell
    # (>= n/cells rows) always lands in >= ~4 files no matter how many
    # tasks write. The (cell, vid%4) repartition remains purely for write
    # parallelism (user-numbered: an unnumbered one is AQE-coalescible).
    assigned = assigned.persist()
    n_assigned = assigned.count()
    (
        assigned.withColumn("q", F.col("vid") % 4)
        .repartition(
            spark.sparkContext.defaultParallelism, F.col("cell"), F.col("q")
        )
        .drop("q")
        .write.mode("overwrite")
        .option(
            "maxRecordsPerFile", max(1, -(-n_assigned // (8 * 4)))
        )
        .partitionBy("cell")
        .parquet(frag_dir)
    )

    def n_files(d: str) -> int:
        return sum(
            1
            for root, _dirs, files in _os.walk(d)
            for f in files
            if f.endswith(".parquet")
        )

    files_before = n_files(frag_dir)
    store = spark.read.parquet(frag_dir)
    # the compactor: ONE shuffle on the partition key -> one task per
    # cell -> one output file per cell
    store.repartition("cell").write.mode("overwrite").partitionBy(
        "cell"
    ).parquet(compact_dir)
    files_after = n_files(compact_dir)

    before = store.select(
        "vid", F.col("cell").cast("long").alias("bcell")
    )
    after = spark.read.parquet(compact_dir).select(
        "vid", F.col("cell").cast("long").alias("acell")
    )
    row = (
        before.join(after, "vid", "full")
        .agg(
            F.count("*").alias("n_rows"),
            F.sum(
                (
                    F.col("bcell").isNull()
                    | F.col("acell").isNull()
                    | (F.col("bcell") != F.col("acell"))
                ).cast("long")
            ).alias("n_mismatch"),
        )
        .collect()[0]
    )
    return spark.createDataFrame(
        [
            (
                int(row.n_rows),
                (row.n_mismatch or 0) == 0,
                files_after < files_before,
            )
        ],
        "n_rows long, content_identical boolean, files_reduced boolean",
    )


@q(
    "src_xml",
    """
    SELECT event_type, count(*) AS n_events,
           round(sum(value), 4) AS sum_value,
           max(ts) AS max_ts
    FROM events GROUP BY event_type
    """,
)
def src_xml(spark: SparkSession, sf_dir: str) -> DataFrame:
    """XML source — Spark 4 merged the spark-xml datasource into core:
    events written once as row-tagged XML (timestamps micro-exact via
    an explicit timestampFormat, JSON-in-props round-trips through XML
    entity escaping), read back through the NATIVE xml reader with an
    explicit schema. Completes the built-in lake/interchange format
    matrix: parquet / JSON / CSV / ORC / XML + JDBC + the Python
    DataSource connectors (avro_py, cdc_changelog, dlq_jsonl)."""
    path = _cache_dir(sf_dir, "events_xml")
    fp = source_fingerprint(sf_dir, "events")
    ts_fmt = "yyyy-MM-dd'T'HH:mm:ss.SSSSSS"
    if not cache_is_fresh(path, fp):
        (
            t(spark, sf_dir, "events")
            .write.mode("overwrite")
            .format("xml")
            .option("rootTag", "events")
            .option("rowTag", "event")
            .option("timestampFormat", ts_fmt)
            .save(path)
        )
        write_fingerprint(path, fp)
    df = (
        spark.read.format("xml")
        .schema(EVENTS_DDL)
        .option("rowTag", "event")
        .option("timestampFormat", ts_fmt)
        .load(path)
    )
    return df.groupBy("event_type").agg(
        F.count("*").alias("n_events"),
        F.round(F.sum("value"), 4).alias("sum_value"),
        F.max("ts").alias("max_ts"),
    )


@q(
    "src_binaryfile",
    """
    WITH m AS (
      SELECT doc_id,
             CAST(4 + doc_id % 5 AS INT) AS w,
             CAST(3 + doc_id % 4 AS INT) AS h
      FROM documents WHERE doc_id % 3 = 0
    )
    SELECT doc_id,
           CAST(54 + h * ((3 * w + 3) // 4 * 4) AS BIGINT) AS n_bytes,
           w AS width, h AS height,
           3 * list_aggregate(flatten(list_transform(
                 range(0, h), y -> list_transform(range(0, w),
                   x -> (doc_id * 31 + 7 * x + 13 * y) % 256))),
               'sum')
             / (3 * w * h) AS mean_pixel
    FROM m
    """,
)
def src_binaryfile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`binaryFile` source — the media-asset ingest path: one real .bmp
    FILE per image-typed doc is exported once (executor-side
    foreachPartition write, the shape of a media-asset dump), then read
    back through Spark's native binaryFile reader (pathGlobFilter
    pushdown; path/length come from file METADATA — the content column is
    only deserialized by the decode stage). Identity is carried by the
    FILENAME, recovered with a JVM-side regexp; the Arrow-batched decode
    then parses each payload with the same real BMP walk the multimodal
    column path uses. At 100 TB this is exactly how image corpora arrive
    (object-store prefixes of small files): listing parallelizes over
    paths, pathGlobFilter prunes before any read, and per-file decode is
    embarrassingly parallel with no shuffle.

    The oracle predicts byte size, dims, and mean pixel in closed form
    from the deterministic render (ext_multimodal_cols' precedent) — so
    the round-trip proves the bytes on disk, the metadata columns, and
    the decode all agree."""
    import pandas as pd

    from cdc_debezium_kafka_airflow_spark.operators.multimodal import (
        decode_bmp,
        render_bmp,
    )

    path = _cache_dir(sf_dir, "media_bmp")
    fp = source_fingerprint(sf_dir, "documents")
    if not cache_is_fresh(path, fp):
        import shutil

        shutil.rmtree(path, ignore_errors=True)
        os.makedirs(path, exist_ok=True)
        imgs = (
            t(spark, sf_dir, "documents")
            .filter(F.col("doc_id") % 3 == 0)
            .select("doc_id")
        )

        # Driver-side export: a foreachPartition open() would write to
        # EXECUTOR-local disks on a real cluster, leaving the driver-side
        # _SUCCESS/fingerprint marking a partial corpus fresh. The fixture
        # export is id-list-sized (streamed via toLocalIterator, never a
        # full collect), so the driver writes every file to the shared
        # path itself — the same place the markers go. A production-scale
        # media dump would instead target an object store through a
        # shared-filesystem API from the executors.
        for r in imgs.toLocalIterator():
            with open(
                os.path.join(path, f"img_{r.doc_id:08d}.bmp"), "wb"
            ) as fh:
                fh.write(render_bmp(r.doc_id))
        open(os.path.join(path, "_SUCCESS"), "w").close()
        write_fingerprint(path, fp)

    bin_df = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.bmp")
        .load(path)
        .select(
            F.regexp_extract(F.col("path"), r"img_(\d+)\.bmp$", 1)
            .cast("bigint")
            .alias("doc_id"),
            F.col("length").alias("n_bytes"),
            "content",
        )
    )

    def decode(batches):
        for pdf in batches:
            w_l, h_l, m_l = [], [], []
            for data in pdf["content"]:
                w, h, m = decode_bmp(bytes(data))
                w_l.append(w)
                h_l.append(h)
                m_l.append(m)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": pdf["n_bytes"],
                    "width": pd.array(w_l, dtype="int32"),
                    "height": pd.array(h_l, dtype="int32"),
                    "mean_pixel": pd.array(m_l, dtype="float64"),
                }
            )

    return bin_df.mapInPandas(
        decode,
        schema="doc_id long, n_bytes long, width int, height int, "
        "mean_pixel double",
    )
