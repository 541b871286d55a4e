#!/usr/bin/env python
"""Repo-wide optimized-plan scan: walk EVERY registered query's optimized
logical plan and report unpartitioned-Window offenders + construction
errors.

This is the committed form of the round-10 offline traversal that proved
tests/test_scale_plans._UNPARTITIONED_WINDOW_ALLOWLIST complete. Re-run
it whenever queries are added or plan-shaping code changes, and fold any
delta into the allowlist (with justification) or fix the plan:

    python tools/scan_plans.py [--sf /root/testdata/sf0.001]

Exit status 1 if any query constructs with an error or a NON-allowlisted
unpartitioned window appears. NOTE: constructing a streaming query RUNS
its bounded replay, so a full scan is a few minutes of wall time — this
is a certification tool, not a unit test (the pytest sweep covers the
curated high-risk subset cheaply).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.001")
    ap.add_argument(
        "--names", nargs="*", default=None, help="subset (default: all)"
    )
    args = ap.parse_args()

    from cdc_debezium_kafka_airflow_spark.queries.registry import QUERIES
    from cdc_debezium_kafka_airflow_spark.session import get_spark
    from tests.test_scale_plans import (
        _UNPARTITIONED_WINDOW_ALLOWLIST,
        _unpartitioned_window_nodes,
    )

    spark = get_spark("scan_plans")
    spark.sparkContext.setLogLevel("ERROR")

    names = args.names or sorted(QUERIES)
    errors: dict[str, str] = {}
    offenders: dict[str, list[str]] = {}
    for i, name in enumerate(names, 1):
        try:
            nodes = _unpartitioned_window_nodes(QUERIES[name](spark, args.sf))
        except Exception as exc:  # never lose the sweep to one query
            errors[name] = f"{type(exc).__name__}: {exc}"
            print(f"[{i}/{len(names)}] ERROR {name}: {errors[name]}")
            continue
        if nodes:
            offenders[name] = nodes
            tag = (
                "allowlisted"
                if name in _UNPARTITIONED_WINDOW_ALLOWLIST
                else "NEW OFFENDER"
            )
            print(f"[{i}/{len(names)}] WINDOW {name} ({tag})")
        spark.catalog.clearCache()

    new = sorted(set(offenders) - set(_UNPARTITIONED_WINDOW_ALLOWLIST))
    stale = sorted(set(_UNPARTITIONED_WINDOW_ALLOWLIST) - set(offenders)) if (
        args.names is None
    ) else []
    print(
        f"\nscanned {len(names)}; construction errors: {len(errors)}; "
        f"unpartitioned-window sites: {len(offenders)} "
        f"({len(new)} new, {len(stale)} stale allowlist entries)"
    )
    for n in new:
        print(f"  NEW: {n}: {offenders[n]}")
    for n in stale:
        print(f"  STALE ALLOWLIST: {n}")
    return 1 if (errors or new or stale) else 0


if __name__ == "__main__":
    raise SystemExit(main())
