"""Exact global ranking without a single-partition sort.

The reference delegates its ordering/quantile work to SQL engines
(Postgres `ntile`/`row_number` via Debezium-fed marts — see
/root/reference dags/cdc_postgres_sync_dag.py's downstream contract);
re-expressed here the naive translation is an unpartitioned Spark window
(`Window.orderBy(...)` with no partition spec), which Spark executes by
shuffling EVERY row into one task — the canonical 100-TB straggler
(Spark itself warns ``WindowExec: No Partition Defined``).

``histogram_rank`` produces the EXACT 1-based rank of every row over a
total order ``(value ASC, tie ASC)`` — the same rank ``row_number()``
over an unpartitioned window would assign — with no unpartitioned
window, no driver action, and no persisted state:

1. aggregate onto the VALUE DOMAIN (the histogram — bounded by distinct
   values, not rows);
2. bucket the histogram by a coarse key (``value >> coarse_bits``,
   arithmetic shift = floor division, order-preserving for negatives)
   and compute each coarse bucket's start rank with a broadcast
   inequality self-join over the tiny coarse table (no window at all);
3. running-total WITHIN each coarse bucket (a PARTITIONED window over
   histogram rows) gives each value's start rank;
4. a per-value PARTITIONED window over the tie-break column finishes
   the prefix among rows that share a value (weight 1 → row_number;
   an integral weight column → exact inclusive running sum).

Every window is partitioned; every forced broadcast is provably tiny
(the coarse table is at most ``value_range >> coarse_bits`` rows). The
histogram-side equi-join back onto the data is left unhinted so AQE
broadcasts it when small and shuffles by value when not.

``ntile_from_rank`` then reproduces SQL-standard ``ntile(k)`` bucket
assignment (first ``n % k`` buckets take one extra row) as pure integer
arithmetic from the exact rank — so quantile segmentation queries match
engines like DuckDB/Postgres bit-for-bit without their global sort.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.window import Window

__all__ = ["histogram_rank", "histogram_running_sum", "ntile_from_rank"]


def _histogram_prefix(
    df: DataFrame,
    value_col: str,
    tie_col: str,
    weight,
    group_cols: Sequence[str],
    out_col: str,
    total_col: str,
    coarse_bits: int,
) -> DataFrame:
    """Shared core: ``df`` + ``out_col`` (INCLUSIVE prefix sum of
    ``weight`` over the ``(value ASC, tie ASC)`` total order, per
    ``group_cols`` group) + ``total_col`` (the group's weight total,
    folded out of the histogram — no extra scan). Integral weights keep
    the prefix exact under the re-associated addition order."""
    g = list(group_cols)
    hist = (
        df.groupBy(*g, value_col)
        .agg(F.sum(weight).alias("_cnt"))
        .withColumn("_coarse", F.shiftright(F.col(value_col), coarse_bits))
    )
    ctot = hist.groupBy(*g, "_coarse").agg(F.sum("_cnt").alias("_ccnt"))
    # coarse start offsets AND the group grand total in ONE pass over
    # the tiny coarse table (<= value_range >> coarse_bits rows per
    # group): group-equi broadcast join, conditional sum for the start,
    # unconditional sum for the total — no window, no driver action,
    # and no separate totals aggregation/join later (each saved stage
    # is a whole scheduled job on a high-floor host)
    a = ctot
    b = ctot.select(
        *[F.col(c).alias(f"_b_{c}") for c in g],
        F.col("_coarse").alias("_b_coarse"),
        F.col("_ccnt").alias("_b_ccnt"),
    )
    if g:
        jcond = None
        for c in g:
            eq = F.col(f"_b_{c}") == F.col(c)
            jcond = eq if jcond is None else (jcond & eq)
        joined = a.join(F.broadcast(b), jcond)
    else:
        joined = a.crossJoin(F.broadcast(b))
    cstart = joined.groupBy(*g, "_coarse").agg(
        F.coalesce(
            F.sum(
                F.when(F.col("_b_coarse") < F.col("_coarse"), F.col("_b_ccnt"))
            ),
            F.lit(0),
        ).alias("_cstart"),
        F.sum("_b_ccnt").alias(total_col),
    )
    # per-value start offset: coarse start + running total WITHIN the
    # coarse bucket (partitioned window over histogram rows)
    wv = Window.partitionBy(*(g + ["_coarse"])).orderBy(value_col).rowsBetween(
        Window.unboundedPreceding, -1
    )
    vstart = (
        hist.join(F.broadcast(cstart), g + ["_coarse"])
        .select(
            *g,
            value_col,
            (
                F.col("_cstart") + F.coalesce(F.sum("_cnt").over(wv), F.lit(0))
            ).alias("_vstart"),
            total_col,
        )
    )
    # join start offsets + totals back (unhinted: AQE broadcasts the
    # histogram side when it is small, falls back to a value-keyed
    # shuffle when not), then finish the prefix with a per-value
    # PARTITIONED window
    wt = (
        Window.partitionBy(*(g + [value_col]))
        .orderBy(tie_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        df.join(vstart, g + [value_col])
        .withColumn(out_col, F.col("_vstart") + F.sum(weight).over(wt))
        .drop("_vstart")
    )


def histogram_rank(
    df: DataFrame,
    value_col: str,
    tie_col: str,
    *,
    group_cols: Sequence[str] = (),
    rank_col: str = "rk",
    n_col: str = "n",
    coarse_bits: int = 16,
) -> DataFrame:
    """Return ``df`` + ``rank_col`` (exact 1-based rank over
    ``(value_col ASC, tie_col ASC)`` within each ``group_cols`` group)
    + ``n_col`` (the group's total row count). ``value_col`` must be an
    integral column; negate it for descending order. ``tie_col`` must
    make the order total (a unique id within the group). Rank is the
    prefix sum of weight 1."""
    return _histogram_prefix(
        df,
        value_col,
        tie_col,
        F.lit(1),
        group_cols,
        rank_col,
        n_col,
        coarse_bits,
    )


def histogram_running_sum(
    df: DataFrame,
    value_col: str,
    tie_col: str,
    weight_col: str,
    *,
    group_cols: Sequence[str] = (),
    out_col: str = "running",
    total_col: str = "total",
    coarse_bits: int = 16,
) -> DataFrame:
    """Return ``df`` + ``out_col`` — the INCLUSIVE running total of
    ``weight_col`` over the ``(value ASC, tie ASC)`` order (the exact
    result of ``sum(w) OVER (ORDER BY ... ROWS UNBOUNDED PRECEDING)``)
    — + ``total_col`` (the group's grand total), without an
    unpartitioned window. Use integral weights for bit-exact parity
    with the sequential window (integer addition re-associates
    freely)."""
    return _histogram_prefix(
        df,
        value_col,
        tie_col,
        F.col(weight_col),
        group_cols,
        out_col,
        total_col,
        coarse_bits,
    )


def ntile_from_rank(rank_col: str, n_col: str, k: int) -> Column:
    """SQL-standard ``ntile(k)`` bucket from an exact 1-based rank and
    the partition row count: with ``q = n div k`` and ``r = n % k``, the
    first ``r`` buckets hold ``q + 1`` rows and the rest hold ``q``.
    Pure integer arithmetic — matches ``ntile`` in Spark, DuckDB and
    Postgres over the same total order. ``greatest(q, 1)`` guards the
    ANSI div-by-zero on the (unreachable when ``q = 0``) else branch."""
    q = f"({n_col} div {k})"
    r = f"({n_col} % {k})"
    thr = f"({r} * ({q} + 1))"
    return F.expr(
        f"CAST(CASE WHEN {rank_col} <= {thr} "
        f"THEN ({rank_col} + {q}) div ({q} + 1) "
        f"ELSE {r} + ({rank_col} - {thr} + greatest({q}, 1) - 1) "
        f"div greatest({q}, 1) END AS INT)"
    )
