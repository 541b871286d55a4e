"""The main correctness gate: every queries() entry vs its DuckDB oracle at
sf0.001 (the driver runs the same comparison at sf0.01) — row count, column
names, order-insensitive value multiset.

ORACLE DTYPE CHECKLIST (hard-won, rounds 1-5 — run through this for every
NEW query/oracle pair before trusting a green local run):

1. Emit ONLY long / double / string / boolean / timestamp columns — never
   DECIMAL. Spark: ``x / 100.0`` makes DecimalType (the literal is
   Decimal) — divide by ``F.lit(100.0)`` cast double or use
   ``cast("double")``. DuckDB: bare numeric literals (``10.0``,
   ``bucket * 25.0``) are DECIMAL too — wrap in ``CAST(... AS DOUBLE)``.
2. DuckDB ``sum(<integer>)`` returns HUGEINT (-> float64 under Arrow,
   flipping the hash): always ``CAST(sum(x) AS BIGINT)``.
3. Cross-engine floats: integer-scale per row (cents / 1e4 lattices),
   aggregate in EXACT integers, apply ONE closing IEEE op with identical
   parenthesization in both engines. Never round an aggregated double
   sum; round per-row before aggregating if rounding is needed.
4. ``round(x, n)`` display differences: .xx5 values round differently
   across engines' float formatting — if a column can land on the .5
   boundary, scale to integers instead of rounding.
5. Column NAMES must match the oracle exactly (the driver sorts columns
   by name before hashing): alias every aggregate in BOTH the Spark code
   (``.alias("sum_qty")``) and the SQL (``AS sum_qty``).
6. Timestamps: read events via sources/tables.load_table (the fixture's
   ts encoding changes between rounds); keep naive (ntz) semantics on
   both sides.
7. NULL-vs-empty divergences: Spark ``element_at`` returns NULL where
   DuckDB ``split_part`` returns '' — coalesce explicitly (the
   ent_resolution_fuzzy lesson).
8. This pytest compares ``repr`` of fetchall values (catches Decimal
   leaks the Arrow/pandas canonicalization hides); the driver compares
   Arrow-canonicalized hashes — a query must pass BOTH, so run this gate
   locally even when check_oracles.py is green."""

from __future__ import annotations

import math

import duckdb
import pytest

import __spark_entry__ as entrymod

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]

QUERIES = entrymod.queries()
ORACLES = entrymod.oracle_sql()


@pytest.fixture(scope="module")
def con(sf_dir):
    c = duckdb.connect()
    for t in TABLES:
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return c


def _norm(v):
    if isinstance(v, float):
        return "NaN" if math.isnan(v) else round(v, 9) + 0.0
    if isinstance(v, (list, tuple)):
        return tuple(_norm(x) for x in v)
    if hasattr(v, "isoformat"):
        return v.isoformat()
    return v


def _multiset(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(repr(_norm(r[i])) for i in order) for r in rows)


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(name, spark, sf_dir, con):
    sdf = QUERIES[name](spark, sf_dir)
    scols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]
    if name not in ORACLES:
        # rows-only contract: runs, has a stable schema
        assert scols, name
        return
    res = con.execute(ORACLES[name])
    ocols = [d[0] for d in res.description]
    orows = res.fetchall()
    assert sorted(scols) == sorted(ocols)
    assert len(srows) == len(orows)
    assert _multiset(scols, srows) == _multiset(ocols, orows)


def test_every_query_documented_in_coverage():
    """COVERAGE.md is the judge-facing inventory — every queries() entry
    must appear there (and no stale names)."""
    text = open("/root/repo/COVERAGE.md").read()
    missing = [name for name in QUERIES if f"`{name}`" not in text]
    assert not missing, f"queries missing from COVERAGE.md: {missing}"


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 1
    assert set(df.columns) == {"table_name", "n_live_rows", "max_offset", "sum_value"}


def test_comparator_catches_value_and_row_corruption(spark, sf_dir, con):
    """Gate sensitivity: the multiset comparator must FAIL on a single
    perturbed value, a dropped row, and a duplicated row — otherwise every
    green above is meaningless."""
    name = "q1_pricing_summary"
    sdf = QUERIES[name](spark, sf_dir)
    scols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]
    res = con.execute(ORACLES[name])
    ocols = [d[0] for d in res.description]
    orows = res.fetchall()
    assert _multiset(scols, srows) == _multiset(ocols, orows)

    bad_value = [list(r) for r in srows]
    bad_value[0][2] = (bad_value[0][2] or 0) + 0.01
    assert _multiset(scols, [tuple(r) for r in bad_value]) != _multiset(
        ocols, orows
    )
    assert _multiset(scols, srows[1:]) != _multiset(ocols, orows)
    assert _multiset(scols, srows + srows[:1]) != _multiset(ocols, orows)
