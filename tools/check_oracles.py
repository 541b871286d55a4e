"""Local stand-in for the driver's correctness gate: run every queries()
entry on Spark and its oracle_sql() twin on DuckDB, compare row count, schema
(column names), and an order-insensitive value multiset.

Usage: python tools/check_oracles.py [--sf /root/testdata/sf0.01] [names...]
"""

from __future__ import annotations

import argparse
import math
import sys
import traceback

sys.path.insert(0, "/root/repo")

import duckdb

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def norm_cell(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # kill -0.0 and representation noise at the 9th decimal
        return round(v, 9) + 0.0
    if isinstance(v, (list, tuple)):
        return tuple(norm_cell(x) for x in v)
    if hasattr(v, "isoformat"):
        return v.isoformat()
    return v


def df_to_multiset(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = sorted(
        tuple(repr(norm_cell(r[i])) for i in order) for r in rows
    )
    return [cols[i] for i in order], out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.001")
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    import __spark_entry__ as mod
    from cdc_debezium_kafka_airflow_spark.session import get_spark

    spark = get_spark("oracle-check")
    qs = mod.queries()
    oracles = mod.oracle_sql()

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{args.sf}/{t}.parquet'"
        )

    names = args.names or list(qs)
    n_pass = n_fail = 0
    for name in names:
        fn = qs[name]
        try:
            sdf = fn(spark, args.sf)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception:
            print(f"FAIL {name}: spark error")
            traceback.print_exc()
            n_fail += 1
            continue
        if name not in oracles:
            print(f"ROWS-ONLY {name}: {len(srows)} rows, cols={scols}")
            continue
        try:
            res = con.execute(oracles[name])
            ocols = [d[0] for d in res.description]
            orows = res.fetchall()
        except Exception:
            print(f"FAIL {name}: duckdb error")
            traceback.print_exc()
            n_fail += 1
            continue
        sc, sm = df_to_multiset(scols, srows)
        oc, om = df_to_multiset(ocols, orows)
        if sc != oc:
            print(f"FAIL {name}: columns spark={sc} oracle={oc}")
            n_fail += 1
            continue
        if len(sm) != len(om):
            print(f"FAIL {name}: rowcount spark={len(sm)} oracle={len(om)}")
            n_fail += 1
            continue
        if sm != om:
            diffs = [(a, b) for a, b in zip(sm, om) if a != b]
            print(f"FAIL {name}: {len(diffs)} differing rows of {len(sm)}; first:")
            for a, b in diffs[:3]:
                print("  spark :", a)
                print("  oracle:", b)
            n_fail += 1
            continue
        print(f"PASS {name}: {len(sm)} rows")
        n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail, "
          f"{len([n for n in names if n not in oracles])} rows-only")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
