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


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=47),  # hour slot
            st.integers(min_value=-1000, max_value=1000),  # scaled value
        ),
        min_size=1,
        max_size=30,
        unique_by=lambda t: t[0],
    )
)
def test_gap_fill_matches_reference_interpolation(spark, observed):
    """For arbitrary sparse hourly series, the window-based gap filler must
    equal a single-threaded reference: observed hours keep their value,
    interior gaps interpolate linearly on the hour axis, edges carry the
    nearest observed value."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    base = 1_700_000_000  # fixed epoch anchor (whole hours)
    rows = [
        (float(base + h * 3600), v / 10.0) for h, v in observed
    ]
    df = spark.createDataFrame(rows, "sec double, v double").select(
        F.timestamp_seconds("sec").alias("h"), F.round("v", 6).alias("v")
    )
    hmin = min(h for h, _ in observed)
    hmax = max(h for h, _ in observed)
    grid = spark.createDataFrame(
        [(float(base + h * 3600),) for h in range(hmin, hmax + 1)],
        "sec double",
    ).select(F.timestamp_seconds("sec").alias("h"))
    j = grid.join(df, "h", "left")
    wb = Window.orderBy("h")
    back = wb.rowsBetween(Window.unboundedPreceding, 0)
    fwd = wb.rowsBetween(0, Window.unboundedFollowing)
    obs_h = F.when(F.col("v").isNotNull(), F.col("h"))
    ep = lambda c: F.unix_timestamp(c).cast("double")  # noqa: E731
    f = j.select(
        "h",
        "v",
        F.last("v", ignorenulls=True).over(back).alias("pv"),
        F.last(obs_h, ignorenulls=True).over(back).alias("ph"),
        F.first("v", ignorenulls=True).over(fwd).alias("nv"),
        F.first(obs_h, ignorenulls=True).over(fwd).alias("nh"),
    )
    interp = F.round(
        F.col("pv")
        + (F.col("nv") - F.col("pv"))
        * (ep("h") - ep("ph"))
        / (ep("nh") - ep("ph")),
        6,
    )
    got = {
        int((r[0].timestamp() - base) // 3600): r[1]
        for r in f.select(
            "h",
            F.when(F.col("v").isNotNull(), F.col("v"))
            .when(F.col("pv").isNull(), F.col("nv"))
            .when(F.col("nv").isNull(), F.col("pv"))
            .otherwise(interp)
            .alias("filled"),
        ).collect()
    }

    pts = sorted(observed)
    expected = {}
    for h in range(hmin, hmax + 1):
        exact = next((v for hh, v in pts if hh == h), None)
        if exact is not None:
            expected[h] = round(exact / 10.0, 6)
            continue
        prev = max((p for p in pts if p[0] < h), default=None)
        nxt = min((p for p in pts if p[0] > h), default=None)
        if prev is None:
            expected[h] = round(nxt[1] / 10.0, 6)
        elif nxt is None:
            expected[h] = round(prev[1] / 10.0, 6)
        else:
            pv, nv = round(prev[1] / 10.0, 6), round(nxt[1] / 10.0, 6)
            frac = (h - prev[0]) / (nxt[0] - prev[0])
            expected[h] = round(pv + (nv - pv) * frac, 6)
    assert got == expected
