"""Parquet table source (``scan_parquet``).

The reference's source universe is 9 MySQL tables mirrored 1:1 into Postgres
(reference register-mysql-connector.json:12, register-postgres-sink.json:9-10);
our batch tables are the driver-provided parquet fixtures (TESTDATA.md).

Scale notes: `spark.read.parquet` gives vectorized columnar scans with
predicate pushdown + column pruning for free — callers must `select`/`filter`
declaratively (never collect-then-filter) so pruning reaches the scan.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql import types as T


def _nanos_to_timestamp(df: DataFrame, cols: tuple[str, ...] = ("ts",)) -> DataFrame:
    """Convert TIMESTAMP(NANOS)-read-as-long columns (legacy
    ``parquet.nanosAsLong``) to microsecond timestamps. Integer ``div 1000``
    truncation matches DuckDB's ns->us conversion."""
    for c in cols:
        field = next((f for f in df.schema.fields if f.name == c), None)
        if field is not None and isinstance(field.dataType, T.LongType):
            df = df.withColumn(c, F.timestamp_micros(F.expr(f"`{c}` div 1000")))
    return df


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one fixture table: ``{sf_dir}/{name}.parquet``."""
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events":
        df = _nanos_to_timestamp(df)
    return df


def load_tables(spark: SparkSession, sf_dir: str, *names: str) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in names}
