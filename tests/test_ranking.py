"""operators/ranking.py invariants: the histogram prefix machinery must
reproduce the unpartitioned-window answers EXACTLY (rank, ntile bucket,
running sum) while never planning an unpartitioned window itself."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from cdc_debezium_kafka_airflow_spark.operators.ranking import (
    histogram_rank,
    histogram_running_sum,
    ntile_from_rank,
)


def _pseudo_rows(n: int = 600):
    # deterministic values with heavy ties and negatives
    return [
        (i, ((i * 2654435761) % 89) - 44, chr(65 + i % 3))
        for i in range(1, n + 1)
    ]


def _df(spark, n: int = 600):
    return spark.createDataFrame(_pseudo_rows(n), "id bigint, v bigint, g string")


def test_histogram_rank_matches_window_row_number(spark):
    df = _df(spark)
    got = histogram_rank(df, "v", "id", rank_col="rk", n_col="n", coarse_bits=4)
    w = Window.orderBy("v", "id")
    exp = df.select("id", F.row_number().over(w).alias("rk"))
    assert (
        got.alias("a")
        .join(exp.alias("b"), "id")
        .filter("a.rk <> b.rk")
        .count()
        == 0
    )
    assert got.select("n").distinct().collect()[0][0] == 600


def test_ntile_from_rank_matches_ntile_all_k(spark):
    df = _df(spark)
    for k in (5, 7, 10):
        got = histogram_rank(df, "v", "id", rank_col="rk", n_col="n")
        got = got.select("id", ntile_from_rank("rk", "n", k).alias("nt"))
        w = Window.orderBy("v", "id")
        exp = df.select("id", F.ntile(k).over(w).alias("nt"))
        assert (
            got.alias("a")
            .join(exp.alias("b"), "id")
            .filter("a.nt <> b.nt")
            .count()
            == 0
        ), f"k={k}"


def test_ntile_from_rank_n_smaller_than_k(spark):
    tiny = spark.createDataFrame(
        [(1, 5), (2, 3), (3, 3)], "id bigint, v bigint"
    )
    r = histogram_rank(tiny, "v", "id", rank_col="rk", n_col="n")
    got = sorted(
        r.select("id", ntile_from_rank("rk", "n", 5).alias("nt")).collect()
    )
    w = Window.orderBy("v", "id")
    exp = sorted(tiny.select("id", F.ntile(5).over(w).alias("nt")).collect())
    assert got == exp


def test_grouped_rank_and_ntile(spark):
    df = _df(spark)
    got = histogram_rank(
        df, "v", "id", group_cols=("g",), rank_col="rk", n_col="n",
        coarse_bits=3,
    ).select("id", "rk", ntile_from_rank("rk", "n", 5).alias("nt"))
    w = Window.partitionBy("g").orderBy("v", "id")
    exp = df.select(
        "id", F.row_number().over(w).alias("rk"), F.ntile(5).over(w).alias("nt")
    )
    assert (
        got.alias("a")
        .join(exp.alias("b"), "id")
        .filter("a.rk <> b.rk OR a.nt <> b.nt")
        .count()
        == 0
    )


def test_running_sum_matches_window_cumsum(spark):
    df = _df(spark).withColumn("wgt", (F.col("id") % 13) + 1)
    got = histogram_running_sum(
        df, "v", "id", "wgt", out_col="run", total_col="tot", coarse_bits=4
    )
    w = Window.orderBy("v", "id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    exp = df.select("id", F.sum("wgt").over(w).alias("run"))
    assert (
        got.alias("a")
        .join(exp.alias("b"), "id")
        .filter("a.run <> b.run")
        .count()
        == 0
    )
    total = df.agg(F.sum("wgt")).collect()[0][0]
    assert got.select("tot").distinct().collect()[0][0] == total


def test_null_values_kept_and_rank_first(spark):
    # ADVICE r10 (medium): NULL value rows used to be silently dropped
    # by the internal equi-joins while still counted in n/total. They
    # must now be KEPT and rank FIRST (Spark's ASC = NULLS FIRST), with
    # n equal to the emitted row count.
    rows = [(i, v, chr(65 + i % 2)) for i, v in enumerate(
        [5, None, 3, None, 3, 8, None, 1, 5, 2], start=1
    )]
    df = spark.createDataFrame(rows, "id bigint, v bigint, g string")
    for bits in (4, None):
        got = histogram_rank(df, "v", "id", rank_col="rk", n_col="n",
                             coarse_bits=bits)
        assert got.count() == 10, f"bits={bits}: rows lost"
        w = Window.orderBy("v", "id")  # Spark ASC default: nulls first
        exp = df.select("id", F.row_number().over(w).alias("rk"))
        assert (
            got.alias("a").join(exp.alias("b"), "id")
            .filter("a.rk <> b.rk").count() == 0
        ), f"bits={bits}"
        assert got.select("n").distinct().collect()[0][0] == 10
    # grouped + weighted running sum over nullable values
    dfw = df.withColumn("wgt", (F.col("id") % 7) + 1)
    got = histogram_running_sum(
        dfw, "v", "id", "wgt", group_cols=("g",),
        out_col="run", total_col="tot", coarse_bits=None,
    )
    assert got.count() == 10
    wg = Window.partitionBy("g").orderBy("v", "id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    exp = dfw.select("id", F.sum("wgt").over(wg).alias("run"))
    assert (
        got.alias("a").join(exp.alias("b"), "id")
        .filter("a.run <> b.run").count() == 0
    )


def test_adaptive_coarse_wide_domain_matches_window(spark):
    # ADVICE r10 (low): static shift-16 over a 2^40+ span would build a
    # multi-million-row coarse broadcast. coarse_bits=None range-scales
    # the observed domain into <= _ADAPTIVE_BUCKETS buckets and must
    # still reproduce the exact window answers.
    rows = [
        (i, (((i * 2654435761) % 97) - 48) * (1 << 41) + i * 131, chr(65 + i % 3))
        for i in range(1, 401)
    ]
    df = spark.createDataFrame(rows, "id bigint, v bigint, g string")
    got = histogram_rank(df, "v", "id", group_cols=("g",), rank_col="rk",
                         n_col="n", coarse_bits=None)
    w = Window.partitionBy("g").orderBy("v", "id")
    exp = df.select("id", F.row_number().over(w).alias("rk"))
    assert (
        got.alias("a").join(exp.alias("b"), "id")
        .filter("a.rk <> b.rk").count() == 0
    )
    # ungrouped running sum on the same wide domain
    dfw = df.withColumn("wgt", (F.col("id") % 5) + 1)
    run = histogram_running_sum(
        dfw, "v", "id", "wgt", out_col="run", total_col="tot",
        coarse_bits=None,
    )
    w2 = Window.orderBy("v", "id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    exp2 = dfw.select("id", F.sum("wgt").over(w2).alias("run"))
    assert (
        run.alias("a").join(exp2.alias("b"), "id")
        .filter("a.run <> b.run").count() == 0
    )


def test_adaptive_plans_have_no_unpartitioned_window(spark):
    from tests.test_scale_plans import _unpartitioned_window_nodes

    df = _df(spark)
    assert not _unpartitioned_window_nodes(
        histogram_rank(df, "v", "id", group_cols=("g",), coarse_bits=None)
    )
    assert not _unpartitioned_window_nodes(
        histogram_running_sum(
            df.withColumn("wgt", F.lit(2)), "v", "id", "wgt", coarse_bits=None
        )
    )


def test_helper_plans_have_no_unpartitioned_window(spark):
    from tests.test_scale_plans import _unpartitioned_window_nodes

    df = _df(spark)
    assert not _unpartitioned_window_nodes(
        histogram_rank(df, "v", "id", group_cols=("g",))
    )
    assert not _unpartitioned_window_nodes(
        histogram_running_sum(
            df.withColumn("wgt", F.lit(2)), "v", "id", "wgt"
        )
    )
