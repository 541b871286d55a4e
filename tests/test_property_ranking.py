"""Property-based checks for operators/ranking.py after the round-11
rework: for ARBITRARY (value, group, weight) rows — nulls, negatives,
ties, wide 2^40+ domains — the histogram prefix machinery must equal the
sequential window reference in BOTH coarse modes, keep every row, and
report n/total equal to the emitted rows.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from cdc_debezium_kafka_airflow_spark.operators.ranking import (
    histogram_rank,
    histogram_running_sum,
)

# values mix: small dense (heavy ties), negative, huge-magnitude (wide
# domain for the adaptive mode), and None
value = st.one_of(
    st.integers(min_value=-5, max_value=5),
    st.integers(min_value=-(1 << 41), max_value=1 << 41),
    st.none(),
)
row = st.tuples(
    value,
    st.integers(min_value=0, max_value=2),  # group
    st.integers(min_value=1, max_value=9),  # weight
)


def _reference_rank(rows):
    """Single-threaded model: rank over (value ASC NULLS FIRST, id ASC)
    per group; returns {id: (rank, group_n)}."""
    out = {}
    by_g = {}
    for i, (v, g, _w) in enumerate(rows):
        by_g.setdefault(g, []).append((v, i))
    for g, items in by_g.items():
        items.sort(key=lambda t: (0 if t[0] is None else 1, t[0] or 0, t[1]))
        for rk, (_v, i) in enumerate(items, 1):
            out[i] = (rk, len(items))
    return out


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(st.lists(row, min_size=1, max_size=60))
def test_histogram_rank_equals_reference_both_modes(spark, rows):
    data = [(i, v, g) for i, (v, g, _w) in enumerate(rows)]
    df = spark.createDataFrame(data, "id bigint, v bigint, g bigint")
    ref = _reference_rank(rows)
    for bits in (4, None):
        got = histogram_rank(
            df, "v", "id", group_cols=("g",), rank_col="rk", n_col="n",
            coarse_bits=bits,
        ).collect()
        assert len(got) == len(rows), f"bits={bits}: rows lost"
        for r in got:
            exp_rk, exp_n = ref[r["id"]]
            assert (r["rk"], r["n"]) == (exp_rk, exp_n), (
                f"bits={bits} id={r['id']}: got ({r['rk']},{r['n']}) "
                f"want ({exp_rk},{exp_n})"
            )


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(st.lists(row, min_size=1, max_size=50))
def test_histogram_running_sum_equals_window(spark, rows):
    data = [(i, v, g, w) for i, (v, g, w) in enumerate(rows)]
    df = spark.createDataFrame(data, "id bigint, v bigint, g bigint, w bigint")
    wref = (
        Window.partitionBy("g")
        .orderBy("v", "id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    exp = {
        r["id"]: r["run"]
        for r in df.select("id", F.sum("w").over(wref).alias("run")).collect()
    }
    got = histogram_running_sum(
        df, "v", "id", "w", group_cols=("g",), out_col="run",
        total_col="tot", coarse_bits=None,
    ).collect()
    assert len(got) == len(rows)
    for r in got:
        assert r["run"] == exp[r["id"]], f"id={r['id']}"
