"""Property-based checks for the analytics additions: sessionization
against a single-threaded reference model, and the count-min sketch's
never-undershoot guarantee on arbitrary key distributions."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

GAP_S = 3600  # 1h session gap for the property model

event = st.tuples(
    st.integers(min_value=0, max_value=4),  # user
    st.integers(min_value=0, max_value=200_000),  # ts offset seconds
)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(st.lists(event, min_size=0, max_size=80, unique=True))
def test_sessionize_matches_reference_model(spark, events):
    """For arbitrary (user, ts) streams, the lag-flag-cumsum sessionizer
    must produce exactly the sessions a single-threaded sweep produces:
    same count, same (start, end, n_events) multiset per user."""
    rows = [(u, float(ts)) for u, ts in events]
    df = spark.createDataFrame(rows or [(0, 0.0)], "user_id long, sec double")
    if not rows:
        df = df.limit(0)
    e = df.select(
        "user_id", "sec", F.timestamp_seconds(F.col("sec")).alias("ts")
    )

    from pyspark.sql.window import Window

    w = Window.partitionBy("user_id").orderBy("ts")
    prev = F.lag("ts").over(w)
    new_sess = F.when(
        prev.isNull()
        | ((F.col("ts") - prev) > F.expr(f"INTERVAL {GAP_S} SECONDS")),
        F.lit(1),
    ).otherwise(F.lit(0))
    cum = w.rowsBetween(Window.unboundedPreceding, 0)
    got = (
        e.withColumn("s", new_sess)
        .withColumn("sid", F.sum("s").over(cum))
        .groupBy("user_id", "sid")
        .agg(
            F.min("sec").alias("start"),
            F.max("sec").alias("end"),
            F.count("*").alias("n"),
        )
        .collect()
    )
    got_set = sorted((r.user_id, r.start, r.end, r.n) for r in got)

    by_user: dict[int, list[float]] = {}
    for u, ts in events:
        by_user.setdefault(u, []).append(float(ts))
    expected = []
    for u, tss in by_user.items():
        tss.sort()
        start = prev_ts = tss[0]
        n = 1
        for ts in tss[1:]:
            if ts - prev_ts > GAP_S:
                expected.append((u, start, prev_ts, n))
                start, n = ts, 0
            n += 1
            prev_ts = ts
        expected.append((u, start, prev_ts, n))
    assert got_set == sorted(expected)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    st.lists(
        st.integers(min_value=0, max_value=500), min_size=1, max_size=300
    )
)
def test_cms_never_underestimates(spark, keys):
    """The relational count-min sketch must overestimate or hit exactly —
    for EVERY key, on arbitrary skewed distributions (the CMS guarantee
    the oracle checks only for heavy hitters)."""
    df = spark.createDataFrame([(k,) for k in keys], "k long")
    params = [(0, 31, 7), (1, 37, 11), (2, 41, 13), (3, 43, 17)]
    p, w = 104729, 64  # narrow sketch: collisions guaranteed
    cells = F.array(
        *[
            F.struct(
                F.lit(d).alias("depth"),
                (((F.lit(a) * F.col("k") + F.lit(b)) % p) % w).alias("b"),
            )
            for d, a, b in params
        ]
    )
    cms = (
        df.select(F.explode(cells).alias("c"))
        .groupBy("c.depth", "c.b")
        .agg(F.count("*").alias("n"))
    )
    exact = df.groupBy("k").agg(F.count("*").alias("cnt"))
    probes = exact.select("k", "cnt", F.explode(cells).alias("c")).select(
        "k", "cnt", "c.depth", "c.b"
    )
    est = (
        probes.join(cms, ["depth", "b"])
        .groupBy("k", "cnt")
        .agg(F.min("n").alias("est"))
        .collect()
    )
    assert est, "every key must get an estimate"
    for r in est:
        assert r.est >= r.cnt, (r.k, r.cnt, r.est)
