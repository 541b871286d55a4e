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


# ---------------------------------------------------------------------------
# round-5 vectorized Avro encoder vs the row codec (no Spark needed)
# ---------------------------------------------------------------------------

_avro_rows = st.lists(
    st.tuples(
        st.integers(min_value=-(2**63), max_value=2**63 - 1),
        st.datetimes(
            min_value=datetime.datetime(1970, 1, 1),
            max_value=datetime.datetime(2200, 1, 1),
        ).map(lambda d: d.replace(microsecond=(d.microsecond // 1) )),
        st.integers(min_value=-(2**31), max_value=2**31 - 1),
        nasty_text,
        st.floats(allow_nan=False),  # infinities ARE valid Avro doubles
        st.one_of(st.none(), nasty_text),
    ),
    min_size=0,
    max_size=50,
)


@settings(deadline=None, max_examples=60)
@given(rows=_avro_rows)
def test_avro_arrow_encoder_matches_row_codec(tmp_path_factory, rows):
    """Property: for ANY rows, write_container_arrow produces byte-identical
    files to write_container (same sync marker, same blocking) — including
    extreme varints, unicode, nulls, and signed-zero doubles."""
    import pyarrow as pa

    from cdc_debezium_kafka_airflow_spark.sources import avro_py as av

    tmp = tmp_path_factory.mktemp("avro_prop")
    rows = [(a, b, int(c), s, v, p) for a, b, c, s, v, p in rows]
    p_row = str(tmp / "r.avro")
    p_arr = str(tmp / "a.avro")
    sync = b"\x42" * 16
    av.write_container(
        p_row, av.EVENTS_AVRO_SCHEMA, iter(rows), sync, records_per_block=7
    )
    names = [f["name"] for f in av.EVENTS_AVRO_SCHEMA["fields"]]
    types = [pa.int64(), pa.timestamp("us"), pa.int64(), pa.string(),
             pa.float64(), pa.string()]
    arrays = [
        pa.array([r[i] for r in rows], type=types[i])
        for i in range(len(names))
    ]
    batch = pa.RecordBatch.from_arrays(arrays, names=names)
    av.write_container_arrow(
        p_arr, av.EVENTS_AVRO_SCHEMA, iter([batch]), sync,
        records_per_block=7,
    )
    assert open(p_row, "rb").read() == open(p_arr, "rb").read()


@settings(deadline=None, max_examples=40)
@given(
    vals=st.lists(
        st.integers(min_value=-(2**63), max_value=2**63 - 1),
        min_size=1,
        max_size=200,
    )
)
def test_varint_flat_matches_scalar_encoder(vals):
    import numpy as np

    from cdc_debezium_kafka_airflow_spark.sources import avro_py as av

    flat, lens = av._varint_flat(np.array(vals, dtype=np.int64))
    pos = 0
    for v, ln in zip(vals, lens):
        assert flat[pos : pos + ln].tobytes() == av.encode_long(v)
        pos += ln
    assert pos == len(flat)


@settings(deadline=None, max_examples=25)
@given(
    n=st.integers(min_value=1, max_value=600),
    cap=st.integers(min_value=4, max_value=64),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
def test_split_over_cap_properties(n, cap, seed):
    """Property: the recursive cell splitter always yields final blocks of
    <= cap rows, covers every row exactly once, emits strictly negative
    (collision-free) path ids disjoint from any cell id, and is a pure
    function of its input."""
    import numpy as np

    from cdc_debezium_kafka_airflow_spark.operators.similarity import (
        _split_over_cap,
    )

    rng = np.random.default_rng(seed)
    mat = rng.normal(size=(n, 8))
    mat /= np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
    out = np.zeros(n, dtype=np.int64)
    _split_over_cap(mat, np.arange(n), cap, 5 + 1, 0, out)
    if n <= cap:
        assert (out == -(5 + 1)).all()
        return
    sizes: dict[int, int] = {}
    for b in out:
        sizes[int(b)] = sizes.get(int(b), 0) + 1
    assert sum(sizes.values()) == n
    assert max(sizes.values()) <= cap
    assert all(b < 0 for b in sizes)
    out2 = np.zeros(n, dtype=np.int64)
    _split_over_cap(mat, np.arange(n), cap, 5 + 1, 0, out2)
    assert (out == out2).all()


# ---------------------------------------------------------------------------
# canonical_url properties: idempotence + invariance under every variant axis
# ---------------------------------------------------------------------------

_label = st.text(alphabet="abcdefghijklmnopqrstuvwxyz0123456789-", min_size=1, max_size=8).filter(
    lambda s: not s.startswith("-") and not s.endswith("-")
)
_param_key = st.text(alphabet="abcdefghijklmnopqrstuvwxyz", min_size=1, max_size=6).filter(
    lambda s: not s.startswith("utm_")
)

_url_parts = st.tuples(
    st.booleans(),                       # https (else http)
    _label,                              # host label
    st.lists(_label, max_size=3),        # path segments
    st.lists(st.tuples(_param_key, _label), max_size=3, unique_by=lambda kv: kv[0]),
    st.booleans(),                       # add www. variant
    st.booleans(),                       # add default-port variant
    st.booleans(),                       # add trailing-slash variant
    st.booleans(),                       # add utm params variant
    st.booleans(),                       # shuffle param order variant
    st.booleans(),                       # add fragment variant
)


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(_url_parts)
def test_canonical_url_idempotent_and_variant_invariant(spark, parts):
    from cdc_debezium_kafka_airflow_spark.operators.text import canonical_url

    (https, host, segs, params, www, port, slash, utm, shuffle, frag) = parts
    scheme = "https" if https else "http"
    base_host = f"{host}.example.com"
    path = "".join("/" + s for s in segs)
    qs = "&".join(f"{k}={v}" for k, v in params)

    plain = f"{scheme}://{base_host}{path or ''}" + (f"?{qs}" if qs else "")
    # a variant that differs ONLY on canonical-equivalent axes
    v_scheme = scheme.upper() if shuffle else scheme
    v_host = ("WWW." if www else "") + base_host.upper()
    v_port = (":443" if https else ":80") if port else ""
    v_path = path + ("/" if slash and path else "")
    v_params = list(params)
    if shuffle:
        v_params = list(reversed(v_params))
    v_qs = "&".join(f"{k}={v}" for k, v in v_params)
    if utm:
        v_qs = (v_qs + "&" if v_qs else "") + "utm_source=x&utm_medium=y"
    variant = (
        f"{v_scheme}://{v_host}{v_port}{v_path}"
        + (f"?{v_qs}" if v_qs else "")
        + ("#frag" if frag else "")
    )

    df = spark.createDataFrame(
        [(1, plain), (2, variant)], "i long, url string"
    )
    out = {
        r.i: r.cu
        for r in df.select(
            "i", canonical_url(F.col("url")).alias("cu")
        ).collect()
    }
    # variant invariance: both forms name the same resource
    # (host canonicalizes lowercase; plain had it lowercase already)
    assert out[1] == out[2], (plain, variant, out)
    # idempotence: canonicalizing a canonical URL is the identity
    df2 = spark.createDataFrame([(1, out[1])], "i long, url string")
    again = df2.select(canonical_url(F.col("url")).alias("cu")).first().cu
    assert again == out[1], (out[1], again)
