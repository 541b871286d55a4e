"""Upsert-dialect dispatch (streaming/dialects.py): the Derby MERGE path is
exercised end-to-end by the sink queries (stream_foreachbatch_upsert /
ctl_retry_upsert oracles); these tests pin the dispatch and the exact SQL
each dialect renders — in particular that the Postgres statement is the
reference deployment's ON CONFLICT upsert (register-postgres-sink.json:15).
"""

import pytest

from cdc_debezium_kafka_airflow_spark.streaming.dialects import (
    DerbyMergeDialect,
    PostgresOnConflictDialect,
    UpsertDialect,
)

COLS = [
    "table_name", "key_id", "last_offset", "is_delete",
    "event_id", "ts", "user_id", "event_type", "value", "props",
]


def test_for_url_dispatch():
    assert isinstance(
        UpsertDialect.for_url("jdbc:derby:/x/y;create=true"),
        DerbyMergeDialect,
    )
    assert isinstance(
        UpsertDialect.for_url("jdbc:postgresql://host:5433/data_warehouse"),
        PostgresOnConflictDialect,
    )
    with pytest.raises(ValueError):
        UpsertDialect.for_url("jdbc:mysql://host/db")


def test_derby_merge_sql_exact():
    """Byte-identical to the statement the sink ran before the dialect
    refactor — the oracle-green MERGE must not drift."""
    sql = DerbyMergeDialect().upsert_sql(
        "CDC_TARGET", "CDC_STAGE", COLS, version_col="last_offset"
    )
    wcols = ["join_hash", *COLS]
    qcols = ", ".join(f'"{c}"' for c in wcols)
    expected = (
        'MERGE INTO CDC_TARGET t USING CDC_STAGE s '
        'ON t."join_hash" = s."join_hash" AND t."key_id" = s."key_id" '
        'AND CAST(t."table_name" AS VARCHAR(128)) = '
        'CAST(s."table_name" AS VARCHAR(128)) '
        'WHEN MATCHED AND s."last_offset" > t."last_offset" THEN UPDATE SET '
        + ", ".join(f'"{c}" = s."{c}"' for c in COLS[2:])
        + f" WHEN NOT MATCHED THEN INSERT ({qcols}) VALUES ("
        + ", ".join(f's."{c}"' for c in wcols)
        + ")"
    )
    assert sql == expected


def test_postgres_on_conflict_sql_shape():
    sql = PostgresOnConflictDialect().upsert_sql(
        "CDC_TARGET", "CDC_STAGE", COLS, version_col="last_offset"
    )
    # conflict target must exactly match the unique index the dialect creates
    assert 'ON CONFLICT ("join_hash", "table_name", "key_id")' in sql
    assert sql.startswith('INSERT INTO CDC_TARGET ("join_hash", "table_name"')
    # newer-wins idempotency guard via EXCLUDED
    assert (
        'WHERE EXCLUDED."last_offset" > CDC_TARGET."last_offset"' in sql
    )
    # every non-key business column is updated from the staged row
    for c in COLS[2:]:
        assert f'"{c}" = EXCLUDED."{c}"' in sql
    # key columns are never updated (identity of the row)
    assert '"table_name" = EXCLUDED' not in sql
    assert '"key_id" = EXCLUDED' not in sql
    idx = PostgresOnConflictDialect().key_index_sql("CDC_TARGET")
    assert idx == (
        'CREATE UNIQUE INDEX CDC_TARGET_KEY ON CDC_TARGET '
        '("join_hash", "table_name", "key_id")'
    )


def test_already_exists_detection():
    assert DerbyMergeDialect().is_already_exists(
        Exception("ERROR X0Y32: Index 'CDC_TARGET_KEY' already exists.")
    )
    assert not DerbyMergeDialect().is_already_exists(
        Exception("ERROR 42X05: Table does not exist.")
    )
    pg = PostgresOnConflictDialect()
    assert pg.is_already_exists(Exception('ERROR: relation "x" already exists'))
    assert pg.is_already_exists(Exception("SQLSTATE 42P07"))
    assert not pg.is_already_exists(Exception("deadlock detected"))


def test_postgres_dialect_drives_live_duckdb():
    """The rendered Postgres ON CONFLICT statement must RUN, not just
    render: DuckDB shares the dialect (unique-index conflict target,
    EXCLUDED, DO UPDATE ... WHERE), so the exact string executes against a
    live engine — newer-wins update, stale-version no-op, idempotent
    replay, and the engine's real 'already exists' error all verified."""
    import duckdb

    d = PostgresOnConflictDialect()
    cols = ["table_name", "key_id", "payload", "last_offset"]
    sql = d.upsert_sql("tgt", "stage", cols, "last_offset")
    con = duckdb.connect()
    con.execute(
        'CREATE TABLE tgt ("join_hash" BIGINT, "table_name" VARCHAR, '
        '"key_id" VARCHAR, "payload" VARCHAR, "last_offset" BIGINT)'
    )
    con.execute(d.key_index_sql("tgt"))
    con.execute("CREATE TABLE stage AS SELECT * FROM tgt LIMIT 0")
    con.execute(
        "INSERT INTO stage VALUES (1,'t','k1','v1',10),(2,'t','k2','v2',5)"
    )
    con.execute(sql)
    con.execute("DELETE FROM stage")
    con.execute(
        "INSERT INTO stage VALUES "
        "(1,'t','k1','v1-new',20),(2,'t','k2','v2-stale',3),"
        "(3,'t','k3','v3',7)"
    )
    con.execute(sql)
    want = [
        (1, "t", "k1", "v1-new", 20),  # newer offset won
        (2, "t", "k2", "v2", 5),  # stale offset was a no-op
        (3, "t", "k3", "v3", 7),  # fresh key inserted
    ]
    got = con.execute("SELECT * FROM tgt ORDER BY join_hash").fetchall()
    assert got == want
    con.execute(sql)  # replayed batch: fully idempotent
    assert (
        con.execute("SELECT * FROM tgt ORDER BY join_hash").fetchall()
        == want
    )
    try:
        con.execute(d.key_index_sql("tgt"))
        raise AssertionError("duplicate index DDL should fail")
    except Exception as exc:
        assert d.is_already_exists(exc)
