"""Fixture-encoding canary tests.

The driver's parquet encoding for ``events.ts`` changed between rounds
(round 1: INT64 TIMESTAMP(NANOS) read via ``parquet.nanosAsLong``; round 2+:
``timestamp[us]`` -> Spark TIMESTAMP_NTZ) and every reader that assumed a
fixed on-disk shape broke — loudly in the batch changelog builder
(DATATYPE_MISMATCH) and *silently* in the file-stream reader, which
div-1000'd microseconds and collapsed all events onto 1970-01-20.

These tests pin the invariant every events reader must satisfy regardless
of encoding: ``ts`` is a canonical TimestampType landing in the fixture's
real epoch (2024), and batch / file-stream / python-datasource all agree
exactly. If the driver re-encodes the fixture again, this file fails
loudly instead of letting a silent unit error through.
"""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F
from pyspark.sql import types as T


def _minmax(df, col="ts"):
    row = df.select(F.min(col).alias("lo"), F.max(col).alias("hi")).first()
    return row.lo, row.hi


def test_batch_events_ts_is_canonical_and_in_epoch(spark, sf_dir):
    from cdc_debezium_kafka_airflow_spark.sources.tables import load_table

    e = load_table(spark, sf_dir, "events")
    assert isinstance(e.schema["ts"].dataType, T.TimestampType)
    lo, hi = _minmax(e)
    assert lo.year >= 2020, f"batch min(ts)={lo} — fixture dtype regression?"
    assert hi.year < 2100


def test_file_stream_ts_equals_batch(spark, sf_dir):
    """The round-2 silent-corruption bug: the stream read micros through a
    long-nanos schema and div-1000'd them to 1970. Batch and stream must see
    the exact same min/max ts."""
    from cdc_debezium_kafka_airflow_spark.sources.tables import load_table
    from cdc_debezium_kafka_airflow_spark.streaming import jobs

    stream = jobs.events_stream(spark, sf_dir)
    assert isinstance(stream.schema["ts"].dataType, T.TimestampType)
    agg = stream.groupBy().agg(F.min("ts").alias("lo"), F.max("ts").alias("hi"))
    out = jobs._run_to_memory(agg, "complete").first()
    assert out.lo.year >= 2020, (
        f"stream min(ts)={out.lo} — 1970 means a stale hardcoded stream schema"
    )
    b_lo, b_hi = _minmax(load_table(spark, sf_dir, "events"))
    assert (out.lo, out.hi) == (b_lo, b_hi)


def test_pydatasource_changelog_ts_in_epoch(spark, sf_dir):
    """The python datasource derives record timestamps from the same parquet
    file through its own Arrow path; it must land in the same epoch."""
    import os

    from cdc_debezium_kafka_airflow_spark.sources.pydatasource import (
        ChangelogDataSource,
    )

    spark.dataSource.register(ChangelogDataSource)
    ch = (
        spark.read.format("cdc_changelog")
        .option("path", os.path.join(sf_dir, "events.parquet"))
        .load()
    )
    lo, hi = _minmax(ch, "timestamp")
    assert lo.year >= 2020, f"pydatasource min(timestamp)={lo}"
    assert hi.year < 2100


def test_changelog_builder_ts_ms_in_epoch(spark, sf_dir):
    """ts_ms inside the serialized Debezium envelope must be epoch-millis in
    the fixture's 2024 range (catches a unit slip even when no cast throws)."""
    from cdc_debezium_kafka_airflow_spark.sources.cdc_fixture import (
        build_changelog,
    )
    from cdc_debezium_kafka_airflow_spark.sources.tables import load_table

    log = build_changelog(load_table(spark, sf_dir, "events"))
    lo, hi = _minmax(log, "timestamp")
    assert lo.year >= 2020 and hi.year < 2100
    ms_2020 = 1577836800000
    ms_2100 = 4102444800000
    row = (
        log.select(
            F.get_json_object("value", "$.payload.ts_ms").cast("long").alias("m")
        )
        .filter(F.col("m").isNotNull())
        .agg(F.min("m").alias("lo"), F.max("m").alias("hi"))
        .first()
    )
    assert ms_2020 <= row.lo <= row.hi <= ms_2100


def test_normalize_ts_dispatches_on_dtype(spark):
    """Unit coverage for all three dispatch arms of normalize_ts."""
    from cdc_debezium_kafka_airflow_spark.sources.tables import normalize_ts

    want = datetime.datetime(2024, 3, 1, 12, 0, 0, 123456)
    micros = int(want.replace(tzinfo=datetime.timezone.utc).timestamp() * 1e6)

    # arm 1: legacy long nanos -> div 1000
    d1 = spark.createDataFrame([(micros * 1000 + 789,)], "ts long")
    out1 = normalize_ts(d1)
    assert isinstance(out1.schema["ts"].dataType, T.TimestampType)
    assert out1.first().ts == want  # sub-micro digits truncate

    # arm 2: TIMESTAMP_NTZ -> cast (wall-clock identity under UTC session)
    d2 = spark.createDataFrame([(want,)], "ts timestamp_ntz")
    out2 = normalize_ts(d2)
    assert isinstance(out2.schema["ts"].dataType, T.TimestampType)
    assert out2.first().ts == want

    # arm 3: already canonical -> no-op
    d3 = spark.createDataFrame([(want,)], "ts timestamp")
    out3 = normalize_ts(d3)
    assert out3.schema == d3.schema
    assert out3.first().ts == want


def test_documents_fixture_dtypes(spark, sf_dir):
    """documents: the dedup/text/chunking family assumes a string text
    column whose length matches n_chars. A driver re-encode (binary,
    large_string, dictionary) or a content change breaks every shingle
    cache silently — fail loudly here instead."""
    from cdc_debezium_kafka_airflow_spark.sources.tables import load_table

    from cdc_debezium_kafka_airflow_spark.sources.tables import load_table

    d = load_table(spark, sf_dir, "documents")
    assert isinstance(d.schema["text"].dataType, T.StringType)
    assert isinstance(d.schema["doc_id"].dataType, T.LongType)
    bad = d.filter(
        F.col("text").isNull() | (F.length("text") != F.col("n_chars"))
    ).count()
    assert bad == 0, f"{bad} docs where length(text) != n_chars"


def test_embeddings_fixture_dtypes(spark, sf_dir):
    """embeddings: the similarity family reads array<float|double> through
    as_double; dimensions must be uniform (a ragged or re-typed embedding
    column would quietly skew every distance)."""
    from cdc_debezium_kafka_airflow_spark.operators.similarity import as_double
    from cdc_debezium_kafka_airflow_spark.sources.tables import load_table

    e = load_table(spark, sf_dir, "embeddings")
    dt = e.schema["embedding"].dataType
    assert isinstance(dt, T.ArrayType) and isinstance(
        dt.elementType, (T.FloatType, T.DoubleType)
    ), dt
    dims = (
        e.select(F.size("embedding").alias("d")).distinct().collect()
    )
    assert len(dims) == 1 and dims[0].d > 0, dims
    # normalization path yields finite doubles
    row = e.select(
        F.aggregate(
            as_double(F.col("embedding")),
            F.lit(0.0),
            lambda acc, x: acc + x * x,
        ).alias("sq")
    ).agg(F.min("sq").alias("lo"), F.max("sq").alias("hi")).first()
    assert row.lo >= 0.0 and row.hi == row.hi, row  # no NaN/negative norms


def test_documents_charset_safe_for_delimiter_oracles(spark, sf_dir):
    """Several exact oracles encode per-word symbol sequences as
    delimiter-wrapped strings (the BPE unrolled-CTE oracle uses '|' as the
    symbol separator and '</w>' as the end mark — queries/ext_queries.py:
    _bpe_cte_chain). That trick is sound ONLY while the corpus charset
    cannot collide with the delimiters. The driver regenerates fixtures
    between rounds; if documents.text ever gains '|', '<' or '>', this
    canary fails LOUDLY and points at the oracle to re-encode, instead of
    a silent hash mismatch in a rotation row."""
    from cdc_debezium_kafka_airflow_spark.sources.tables import load_table

    d = load_table(spark, sf_dir, "documents")
    n_bad = d.filter(
        F.col("text").rlike(r"[|<>]")
    ).count()
    assert n_bad == 0, (
        f"{n_bad} documents contain delimiter chars ('|', '<', '>') — "
        "the BPE symbol-string oracle encoding must be changed"
    )


def test_schema_cache_invalidates_on_in_session_re_encode(spark, tmp_path):
    """ADVICE r10: the explicit-schema cache keys on the file's on-disk
    (size, mtime_ns) fingerprint, so a fixture re-encoded at the SAME
    path mid-session re-infers instead of serving the stale schema
    (which would read renamed/added columns back as nulls)."""
    from cdc_debezium_kafka_airflow_spark.sources import tables

    sf = str(tmp_path)
    p = str(tmp_path / "widget.parquet")
    spark.createDataFrame([(1, "a")], "id bigint, name string").write.parquet(p)
    first = tables.load_table(spark, sf, "widget")
    assert [f.name for f in first.schema.fields] == ["id", "name"]
    # cached path: second load must serve the explicit schema
    assert [f.name for f in tables.load_table(spark, sf, "widget").schema.fields] == [
        "id",
        "name",
    ]
    # re-encode in place with a renamed + added column
    spark.createDataFrame(
        [(2, "b", 9.5)], "id bigint, label string, score double"
    ).write.mode("overwrite").parquet(p)
    again = tables.load_table(spark, sf, "widget")
    assert [f.name for f in again.schema.fields] == ["id", "label", "score"]
    row = again.collect()[0]
    assert (row.id, row.label, row.score) == (2, "b", 9.5)
