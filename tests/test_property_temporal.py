"""Property-based check of the temporal carry-forward operators: for
arbitrary per-user click/purchase timelines (including ts collisions,
empty sides, and boundary-exact gaps), last_touch_attribution and
linear_attribution must equal a brute-force python interval join — the
sort-order boundary tricks (strict <, inclusive >=, id tie-breaks) are
exactly the kind of logic a random generator breaks if it's wrong."""

from __future__ import annotations

import datetime as dt

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from cdc_debezium_kafka_airflow_spark.operators.temporal import (
    last_touch_attribution,
    linear_attribution,
)

BASE = dt.datetime(2024, 1, 1)
LOOKBACK = dt.timedelta(days=7)

# (user, kind, hours-offset); hours in a 3-week span so the 7-day boundary
# is crossed routinely; coarse granularity forces ts collisions
event = st.tuples(
    st.integers(min_value=0, max_value=3),
    st.sampled_from(["click", "purchase"]),
    st.integers(min_value=0, max_value=21 * 24),
)


def _frames(spark, events):
    rows_c, rows_p = [], []
    for i, (u, kind, h) in enumerate(events):
        row = (u, BASE + dt.timedelta(hours=h), i)
        (rows_c if kind == "click" else rows_p).append(row)
    schema = "user_id long, ts timestamp_ntz, event_id long"
    return (
        spark.createDataFrame(rows_c or [], schema),
        spark.createDataFrame(rows_p or [], schema),
        rows_c,
        rows_p,
    )


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(st.lists(event, min_size=0, max_size=40))
def test_last_touch_matches_bruteforce(spark, events):
    clicks, purchases, rows_c, rows_p = _frames(spark, events)
    got = {
        r.purchase_id: (r.click_id, r.seconds_since_click)
        for r in last_touch_attribution(clicks, purchases).collect()
    }
    expect = {}
    for u, pts, pid in rows_p:
        cands = [
            (cts, cid)
            for (cu, cts, cid) in rows_c
            if cu == u and cts < pts and cts >= pts - LOOKBACK
        ]
        if cands:
            cts, cid = max(cands)
            expect[pid] = (cid, int((pts - cts).total_seconds()))
        else:
            expect[pid] = (None, None)
    assert got == expect


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(st.lists(event, min_size=0, max_size=40))
def test_linear_matches_bruteforce(spark, events):
    clicks, purchases, rows_c, rows_p = _frames(spark, events)
    got = {
        r.purchase_id: (r.n_touches, r.credit_per_touch)
        for r in linear_attribution(clicks, purchases).collect()
    }
    expect = {}
    for u, pts, pid in rows_p:
        n = sum(
            1
            for (cu, cts, _cid) in rows_c
            if cu == u and cts < pts and cts >= pts - LOOKBACK
        )
        expect[pid] = (n, round(1.0 / n, 6) if n else None)
    assert got == expect


# dim ops: (key, op, payload-int); facts: (key,) — offsets are list positions
dim_op = st.tuples(
    st.integers(min_value=0, max_value=3),
    st.sampled_from(["set", "set", "del", "fact"]),
    st.integers(min_value=0, max_value=99),
)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(st.lists(dim_op, min_size=0, max_size=50))
def test_point_in_time_lookup_matches_replay(spark, ops):
    from cdc_debezium_kafka_airflow_spark.operators.temporal import (
        point_in_time_lookup,
    )

    dim_rows, fact_rows = [], []
    for off, (key, op, v) in enumerate(ops):
        if op == "fact":
            fact_rows.append((key, off))
        else:
            dim_rows.append((key, off, op == "del", (off, v)))
    dim = spark.createDataFrame(
        dim_rows or [],
        "key_id long, offset long, is_delete boolean, "
        "payload struct<ver:long, v:long>",
    )
    facts = spark.createDataFrame(fact_rows or [], "key_id long, offset long")
    got = {
        (r.key_id, r.fact_offset): (
            (r.payload.ver, r.payload.v) if r.payload is not None else None
        )
        for r in point_in_time_lookup(dim, facts).collect()
    }

    # brute-force replay: live payload per key at each log position
    state: dict[int, tuple] = {}
    expect = {}
    for off, (key, op, v) in enumerate(ops):
        if op == "fact":
            expect[(key, off)] = state.get(key)
        elif op == "del":
            state.pop(key, None)
        else:
            state[key] = (off, v)
    assert got == expect
