"""JDBC upsert dialects for the CDC sink.

The reference sink is Kafka Connect's JDBC sink in upsert mode against
Postgres (``insert.mode=upsert`` + ``pk.mode=record_key``, reference
register-postgres-sink.json:15-17); Connect renders the statement per
database dialect — ``INSERT ... ON CONFLICT ... DO UPDATE`` on Postgres,
``MERGE`` on engines that have it. This module is that dispatch for our
foreachBatch sink: one protocol (stage table -> set-based upsert with a
``last_offset`` idempotency guard), one statement renderer per dialect.

BOTH dialects are exercised end-to-end: Derby MERGE over JDBC
(foreach_batch_upsert — the embedded JDBC engine shipped with Spark), and
the Postgres ON CONFLICT statement executed VERBATIM against a live DuckDB
over DB-API (foreach_batch_upsert_dbapi — DuckDB shares Postgres's ON
CONFLICT dialect; no Postgres server exists in this harness, and the
statement is the exact production string a deployment would run).

Shared semantics every dialect must preserve:
  - conflict key = (join_hash, table_name, key_id): the numeric surrogate
    hash drives the index lookup, the raw string keys stay as residual
    equality so hash collisions cannot corrupt the sink;
  - a matched row updates ONLY when the staged ``last_offset`` is newer —
    replayed micro-batches (at-least-once delivery, ctl_retry re-runs)
    become no-ops, which is what makes the sink effectively exactly-once.
"""

from __future__ import annotations


class UpsertDialect:
    """One JDBC engine's rendering of the staged-upsert protocol."""

    name: str = "base"
    jdbc_prefixes: tuple[str, ...] = ()

    @staticmethod
    def for_url(url: str) -> "UpsertDialect":
        for dialect_cls in (DerbyMergeDialect, PostgresOnConflictDialect):
            if any(url.startswith(p) for p in dialect_cls.jdbc_prefixes):
                return dialect_cls()
        raise ValueError(
            f"no upsert dialect for JDBC url {url!r} — "
            "known: derby (MERGE), postgresql (ON CONFLICT)"
        )

    def upsert_sql(
        self, target: str, stage: str, cols: list[str], version_col: str
    ) -> str:
        """Set-based upsert of every staged row into ``target``.

        ``cols`` is the business column list with the two key columns first
        (table_name, key_id); the surrogate ``join_hash`` column is implied.
        ``version_col`` guards updates (newer-wins)."""
        raise NotImplementedError

    def key_index_sql(self, target: str) -> str:
        """DDL creating the index/constraint the upsert's key lookup needs."""
        raise NotImplementedError

    def is_already_exists(self, exc: Exception) -> bool:
        """True if ``exc`` is this engine's 'object already exists' (the one
        benign DDL failure — anything else must surface, or the upsert runs
        unindexed and silently slow)."""
        raise NotImplementedError


class DerbyMergeDialect(UpsertDialect):
    """Apache Derby: standard ``MERGE INTO``.

    Derby-specific: Spark's Derby dialect maps StringType to CLOB, and Derby
    cannot compare CLOB to CLOB in a join predicate without a cast — so
    ``table_name`` equality is evaluated through VARCHAR casts, and only as
    a residual on ``join_hash``-index-matched candidates."""

    name = "derby"
    jdbc_prefixes = ("jdbc:derby:",)

    def upsert_sql(
        self, target: str, stage: str, cols: list[str], version_col: str
    ) -> str:
        wcols = ["join_hash", *cols]
        qcols = ", ".join(f'"{c}"' for c in wcols)
        update_cols = [c for c in cols[2:]]
        return (
            f"MERGE INTO {target} t USING {stage} s "
            'ON t."join_hash" = s."join_hash" AND t."key_id" = s."key_id" '
            'AND CAST(t."table_name" AS VARCHAR(128)) = '
            'CAST(s."table_name" AS VARCHAR(128)) '
            f'WHEN MATCHED AND s."{version_col}" > t."{version_col}" '
            "THEN UPDATE SET "
            + ", ".join(f'"{c}" = s."{c}"' for c in update_cols)
            + f" WHEN NOT MATCHED THEN INSERT ({qcols}) VALUES ("
            + ", ".join(f's."{c}"' for c in wcols)
            + ")"
        )

    def key_index_sql(self, target: str) -> str:
        return (
            f'CREATE INDEX {target}_KEY ON {target} ("join_hash", "key_id")'
        )

    def is_already_exists(self, exc: Exception) -> bool:
        return "X0Y32" in str(exc)  # Derby SQLState: object already exists


class PostgresOnConflictDialect(UpsertDialect):
    """PostgreSQL: ``INSERT ... ON CONFLICT ... DO UPDATE`` — the statement
    the reference deployment runs (Connect JDBC sink in upsert mode against
    jdbc:postgresql://.../data_warehouse, register-postgres-sink.json:10,15).

    ON CONFLICT requires a UNIQUE index on the exact conflict target, so
    ``key_index_sql`` creates one over (join_hash, table_name, key_id);
    EXCLUDED carries the staged row inside DO UPDATE, and the WHERE clause
    is the same newer-wins guard MERGE expresses in WHEN MATCHED AND."""

    name = "postgresql"
    jdbc_prefixes = ("jdbc:postgresql:",)

    def upsert_sql(
        self, target: str, stage: str, cols: list[str], version_col: str
    ) -> str:
        wcols = ["join_hash", *cols]
        qcols = ", ".join(f'"{c}"' for c in wcols)
        update_cols = [c for c in cols[2:]]
        return (
            f"INSERT INTO {target} ({qcols}) "
            f"SELECT {qcols} FROM {stage} "
            'ON CONFLICT ("join_hash", "table_name", "key_id") '
            "DO UPDATE SET "
            + ", ".join(f'"{c}" = EXCLUDED."{c}"' for c in update_cols)
            + f' WHERE EXCLUDED."{version_col}" > {target}."{version_col}"'
        )

    def key_index_sql(self, target: str) -> str:
        return (
            f"CREATE UNIQUE INDEX {target}_KEY ON {target} "
            '("join_hash", "table_name", "key_id")'
        )

    def is_already_exists(self, exc: Exception) -> bool:
        # 42P07: duplicate_table (covers indexes); message fallback for
        # drivers that stringify without the SQLState
        s = str(exc)
        return "42P07" in s or "already exists" in s
