"""Property-based check of the CDC core: for arbitrary changelogs,
upsert_materialize must equal a straightforward single-threaded reference
implementation (last-write-wins by offset, deletes drop keys)."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

from cdc_debezium_kafka_airflow_spark.operators.cdc import upsert_materialize

record = st.tuples(
    st.integers(min_value=0, max_value=9),  # key
    st.sampled_from(["c", "u", "r", "d"]),  # op
    st.floats(min_value=-1e6, max_value=1e6, allow_nan=False),
)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(st.lists(record, min_size=0, max_size=60))
def test_upsert_matches_reference_model(spark, records):
    # offsets: list position (unique, total order)
    rows = [
        (i, "t", op, op == "d", key, (key, float(v)) if op != "d" else None)
        for i, (key, op, v) in enumerate(records)
    ]
    schema = (
        "offset long, table_name string, op string, is_delete boolean, "
        "key_id long, after struct<user_id:long, value:double>"
    )
    df = spark.createDataFrame(rows, schema)
    got = {
        (r.table_name, r.user_id): (r.last_offset, r.value)
        for r in upsert_materialize(df).collect()
    }

    # reference model: replay sequentially
    state: dict[int, tuple[int, float]] = {}
    for i, (key, op, v) in enumerate(records):
        if op == "d":
            state.pop(key, None)
        else:
            state[key] = (i, float(v))
    expect = {("t", k): (off, v) for k, (off, v) in state.items()}
    assert got == expect
