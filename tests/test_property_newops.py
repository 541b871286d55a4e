"""Property-based checks for the round-6-continuation additions: the
bounded-frame rolling median, the boundary-sweep peak concurrency, and the
basket-array pair generation — each against a single-threaded reference
model on arbitrary inputs (the sessionize-property precedent: the test
re-expresses the operator's expression tree inline and falsifies it
against brute force)."""

from __future__ import annotations

import itertools

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F
from pyspark.sql.window import Window

row = st.tuples(
    st.integers(min_value=0, max_value=3),  # user
    st.integers(min_value=0, max_value=10_000),  # order key (ts proxy)
    st.integers(min_value=0, max_value=500),  # value (scaled int)
)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(st.lists(row, min_size=1, max_size=60, unique_by=lambda r: (r[0], r[1])))
def test_rolling_median_matches_numpy_model(spark, rows):
    """The parity-free pick formula (a[(n+1)/2] + a[n/2+1])/2 over the
    sorted trailing-K frame must equal the textbook median of the same
    trailing window for every row, every frame parity, every user."""
    K = 5  # trailing K+1 rows
    df = spark.createDataFrame(
        [(u, o, v / 4.0) for u, o, v in rows],
        "user_id long, ord long, value double",
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ord")
        .rowsBetween(-K, Window.currentRow)
    )
    arr = F.array_sort(F.collect_list("value").over(w))
    n = F.size(arr)
    lo = F.element_at(arr, ((n + 1) / 2).cast("int"))
    hi = F.element_at(arr, (n / 2).cast("int") + 1)
    got = {
        (r.user_id, r.ord): r.med
        for r in df.select(
            "user_id", "ord", ((lo + hi) / 2).alias("med")
        ).collect()
    }

    by_user: dict[int, list[tuple[int, float]]] = {}
    for u, o, v in rows:
        by_user.setdefault(u, []).append((o, v / 4.0))
    for u, seq in by_user.items():
        seq.sort()
        for i, (o, _v) in enumerate(seq):
            window = sorted(v for _o, v in seq[max(0, i - K) : i + 1])
            m = len(window)
            expect = (window[(m - 1) // 2] + window[m // 2]) / 2
            assert abs(got[(u, o)] - expect) < 1e-12, (u, o)


interval = st.tuples(
    st.integers(min_value=0, max_value=200),  # start
    st.integers(min_value=0, max_value=50),  # duration
)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(st.lists(interval, min_size=1, max_size=60))
def test_peak_concurrency_matches_brute_force(spark, ivs):
    """The +1/-1 boundary-sweep prefix-sum peak must equal the brute-force
    maximum over all boundary instants of the count of HALF-OPEN intervals
    [s, e) covering that instant — including zero-length intervals (which
    cover nothing) and heavy boundary ties."""
    rows = [(s, s + d) for s, d in ivs]
    df = spark.createDataFrame(rows, "s long, e long")
    b = df.select(F.col("s").alias("bt"), F.lit(1).alias("delta")).unionAll(
        df.select(F.col("e").alias("bt"), F.lit(-1).alias("delta"))
    )
    w = Window.orderBy("bt", "delta").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    got = (
        b.select(F.sum("delta").over(w).alias("c"))
        .agg(F.max("c"))
        .collect()[0][0]
    )
    points = sorted({s for s, _ in rows} | {e for _, e in rows})
    expect = max(
        sum(1 for s, e in rows if s <= p < e) for p in points
    )
    assert got == expect


basket_row = st.tuples(
    st.integers(min_value=0, max_value=5),  # order
    st.integers(min_value=0, max_value=8),  # part
)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(st.lists(basket_row, min_size=1, max_size=60))
def test_basket_pair_generation_matches_combinations(spark, rows):
    """The nested-transform HOF pair generator over collect_set basket
    arrays must produce exactly the itertools.combinations multiset of
    ordered pairs per distinct basket — duplicates collapsed, self-pairs
    excluded, (p1 < p2) orientation."""
    df = spark.createDataFrame(rows, "ok long, pk long")
    baskets = df.groupBy("ok").agg(
        F.array_sort(F.collect_set("pk")).alias("parts")
    )
    pair_structs = F.filter(
        F.flatten(
            F.transform(
                F.col("parts"),
                lambda x: F.transform(
                    F.col("parts"),
                    lambda y: F.struct(x.alias("p1"), y.alias("p2")),
                ),
            )
        ),
        lambda s: s["p1"] < s["p2"],
    )
    got = sorted(
        (r.pr.p1, r.pr.p2)
        for r in baskets.select(F.explode(pair_structs).alias("pr")).collect()
    )
    by_order: dict[int, set[int]] = {}
    for ok, pk in rows:
        by_order.setdefault(ok, set()).add(pk)
    expect = sorted(
        pair
        for parts in by_order.values()
        for pair in itertools.combinations(sorted(parts), 2)
    )
    assert got == expect
