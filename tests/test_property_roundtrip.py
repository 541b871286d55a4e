"""Property-based check of the Debezium-envelope JSON round-trip: arbitrary
row content — unicode, quotes, newlines, control-ish chars, NULLs, extreme
doubles — must survive serialize -> parse -> unwrap bit-identically."""

from __future__ import annotations

import datetime

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

from cdc_debezium_kafka_airflow_spark.sources.cdc_fixture import build_changelog
from cdc_debezium_kafka_airflow_spark.operators.cdc import (
    parse_envelope,
    split_dlq,
    unwrap,
)

# strings that stress JSON escaping; avoid surrogates (not valid UTF-8)
nasty_text = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",)), max_size=40
)

event_row = st.tuples(
    nasty_text,  # event_type
    st.one_of(st.none(), st.floats(allow_nan=False, allow_infinity=False)),
    st.one_of(st.none(), nasty_text),  # props
)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(st.lists(event_row, min_size=1, max_size=20))
def test_envelope_roundtrip_arbitrary_content(spark, rows):
    base_ts = datetime.datetime(2024, 1, 1, 12, 0, 0, 123456)
    data = [
        # event_id chosen to always take the clean-envelope path
        # (op='c', no tombstone, no malformed: id % 10 == 1, % 97 != 0)
        (i * 10 + 1, base_ts + datetime.timedelta(seconds=i), i, et, v, p)
        for i, (et, v, p) in enumerate(rows)
    ]
    events = spark.createDataFrame(
        data,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    main, dlq = split_dlq(parse_envelope(build_changelog(events)))
    assert dlq.count() == 0
    back = unwrap(main).select("after.*")
    assert back.exceptAll(events).count() == 0
    assert events.exceptAll(back).count() == 0
