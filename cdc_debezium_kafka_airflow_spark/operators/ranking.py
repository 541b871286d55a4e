"""Exact global ranking without a single-partition sort.

The reference delegates its ordering/quantile work to the warehouse SQL
engine: the Debezium-fed Postgres mart is the query surface
(/root/reference readme.md:14,23 — "Sincronización automática con JDBC
Sink Connector hacia Postgres"), and its DAGs reach the data only
through hook-issued SQL (dags/cdc_data_integrity_dynamic_dag.py:50);
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

NULL semantics (round 11): rows with a NULL ``value_col`` are KEPT and
rank FIRST — the same order Spark's own ``row_number() OVER (ORDER BY
value)`` assigns (ASC = NULLS FIRST). All internal joins are null-safe
(``<=>``), so ``n_col``/``total_col`` always equal the number of rows
emitted. NOTE for oracle writers: DuckDB/Postgres default to NULLS
LAST on ASC — when ranking a nullable column cross-engine, add
``NULLS FIRST`` to the oracle's ORDER BY (or coalesce on both sides).

Coarse-key modes: ``coarse_bits=<int>`` (default 16) is the static
shift — zero extra stages, but the occupied coarse-bucket count is
``value_span >> coarse_bits``, so it PRESUPPOSES a bounded value
domain (a 2^40 span at 16 bits would broadcast a 2^24-row coarse
table and self-join it). ``coarse_bits=None`` derives the coarse key
from the OBSERVED per-group min/max instead (one extra tiny
aggregation over the histogram + a broadcast join), range-scaling
values into at most ``_ADAPTIVE_BUCKETS`` buckets — use it whenever
the value domain is not provably narrow.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.window import Window

__all__ = ["histogram_rank", "histogram_running_sum", "ntile_from_rank"]

#: coarse-bucket cap for the adaptive (``coarse_bits=None``) mode: at
#: most this many occupied coarse buckets PER GROUP regardless of the
#: value domain, so the coarse self-join is at most K^2 pairs per group
#: and the forced broadcast at most ``groups * K`` rows.
_ADAPTIVE_BUCKETS = 1024


def _ns_eq(cols: Sequence[str], prefix: str):
    """AND-fold of null-safe equalities ``col <=> {prefix}col`` — a
    hash-joinable equi-condition (EqualNullSafe is an equi-key) that,
    unlike ``join(on=[...])``, does not silently drop NULL keys."""
    cond = None
    for c in cols:
        eq = F.col(c).eqNullSafe(F.col(f"{prefix}{c}"))
        cond = eq if cond is None else (cond & eq)
    return cond


def _histogram_prefix(
    df: DataFrame,
    value_col: str,
    tie_col: str,
    weight,
    group_cols: Sequence[str],
    out_col: str,
    total_col: str,
    coarse_bits: int | None,
) -> DataFrame:
    """Shared core: ``df`` + ``out_col`` (INCLUSIVE prefix sum of
    ``weight`` over the ``(value ASC NULLS FIRST, tie ASC)`` total
    order, per ``group_cols`` group) + ``total_col`` (the group's
    weight total, folded out of the histogram — no extra scan).
    Integral weights keep the prefix exact under the re-associated
    addition order. NULL values are kept (null-safe joins throughout)
    and occupy the first-ranked bucket, matching Spark's ASC window
    order; ``total_col``/``n_col`` therefore always equal the emitted
    row/weight total."""
    g = list(group_cols)
    hist = df.groupBy(*g, value_col).agg(F.sum(weight).alias("_cnt"))
    if coarse_bits is None:
        # adaptive coarse key: range-scale each group's values into at
        # most _ADAPTIVE_BUCKETS buckets using the OBSERVED min/max —
        # one extra aggregation over the (already tiny) histogram plus
        # a broadcast join, in exchange for a coarse-bucket count that
        # is bounded for ANY value domain. The double-space transform
        # (cast → subtract min → divide by positive width → floor →
        # least-cap) is monotone non-decreasing, which is all the
        # bucketing needs; NULL values are pinned to the NULL bucket
        # explicitly (F.least would otherwise SKIP the null).
        rng = hist.groupBy(*g).agg(
            F.min(value_col).alias("_r_vmin"), F.max(value_col).alias("_r_vmax")
        )
        if g:
            rng = rng.select(
                *[F.col(c).alias(f"_r_{c}") for c in g], "_r_vmin", "_r_vmax"
            )
            hist = hist.join(F.broadcast(rng), _ns_eq(g, "_r_"))
        else:
            hist = hist.crossJoin(F.broadcast(rng))
        span = (
            F.col("_r_vmax").cast("double")
            - F.col("_r_vmin").cast("double")
            + F.lit(1.0)
        )
        width = span / F.lit(float(_ADAPTIVE_BUCKETS))
        bucket = F.least(
            F.lit(_ADAPTIVE_BUCKETS - 1),
            F.floor(
                (F.col(value_col).cast("double") - F.col("_r_vmin").cast("double"))
                / width
            ),
        ).cast("long")
        hist = hist.withColumn(
            "_coarse",
            F.when(F.col(value_col).isNull(), F.lit(None).cast("long")).otherwise(
                bucket
            ),
        ).drop(*[f"_r_{c}" for c in g], "_r_vmin", "_r_vmax")
    else:
        # static shift (zero extra stages): arithmetic shift = floor
        # division, order-preserving for negatives; shiftright(NULL)
        # stays NULL, so null values form their own coarse bucket.
        # PRECONDITION: the occupied bucket count value_span >>
        # coarse_bits must be small — for unbounded/unknown domains
        # pass coarse_bits=None instead.
        hist = hist.withColumn(
            "_coarse", F.shiftright(F.col(value_col), coarse_bits)
        )
    ctot = hist.groupBy(*g, "_coarse").agg(F.sum("_cnt").alias("_ccnt"))
    # coarse start offsets AND the group grand total in ONE pass over
    # the tiny coarse table (<= value_range >> coarse_bits rows per
    # group statically, <= _ADAPTIVE_BUCKETS adaptively): group-equi
    # broadcast join, conditional sum for the start, unconditional sum
    # for the total — no window, no driver action, and no separate
    # totals aggregation/join later (each saved stage is a whole
    # scheduled job on a high-floor host)
    a = ctot
    b = ctot.select(
        *[F.col(c).alias(f"_b_{c}") for c in g],
        F.col("_coarse").alias("_b_coarse"),
        F.col("_ccnt").alias("_b_ccnt"),
    )
    if g:
        joined = a.join(F.broadcast(b), _ns_eq(g, "_b_"))
    else:
        joined = a.crossJoin(F.broadcast(b))
    # "precedes" under NULLS FIRST: the NULL bucket precedes every
    # non-null bucket and nothing precedes it (SQL `<` alone would
    # silently exclude the NULL bucket from every start offset).
    precedes = (F.col("_b_coarse") < F.col("_coarse")) | (
        F.col("_b_coarse").isNull() & F.col("_coarse").isNotNull()
    )
    cstart = joined.groupBy(*g, "_coarse").agg(
        F.coalesce(
            F.sum(F.when(precedes, F.col("_b_ccnt"))), F.lit(0)
        ).alias("_cstart"),
        F.sum("_b_ccnt").alias(total_col),
    )
    # per-value start offset: coarse start + running total WITHIN the
    # coarse bucket (partitioned window over histogram rows)
    wv = Window.partitionBy(*(g + ["_coarse"])).orderBy(value_col).rowsBetween(
        Window.unboundedPreceding, -1
    )
    ckeys = g + ["_coarse"]
    cs = cstart.select(
        *[F.col(c).alias(f"_c_{c}") for c in ckeys], "_cstart", total_col
    )
    vstart = (
        hist.join(F.broadcast(cs), _ns_eq(ckeys, "_c_"))
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
    vkeys = g + [value_col]
    vs = vstart.select(
        *[F.col(c).alias(f"_v_{c}") for c in vkeys], "_vstart", total_col
    )
    return (
        df.join(vs, _ns_eq(vkeys, "_v_"))
        .drop(*[f"_v_{c}" for c in vkeys])
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
    coarse_bits: int | None = 16,
) -> DataFrame:
    """Return ``df`` + ``rank_col`` (exact 1-based rank over
    ``(value_col ASC NULLS FIRST, tie_col ASC)`` within each
    ``group_cols`` group) + ``n_col`` (the group's total row count,
    NULL-valued rows included — they rank first, as in Spark's own
    ASC window order; DuckDB/Postgres default NULLS LAST, so oracles
    over nullable columns need an explicit NULLS FIRST). ``value_col``
    must be an integral column; negate it for descending order.
    ``tie_col`` must make the order total (a unique id within the
    group). Rank is the prefix sum of weight 1. ``coarse_bits``: static
    shift for provably narrow value domains; ``None`` derives the
    coarse key from the observed range (bounded bucket count for any
    domain, one extra tiny aggregation)."""
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
    coarse_bits: int | None = 16,
) -> DataFrame:
    """Return ``df`` + ``out_col`` — the INCLUSIVE running total of
    ``weight_col`` over the ``(value ASC NULLS FIRST, tie ASC)`` order
    (the exact result of ``sum(w) OVER (ORDER BY ... ROWS UNBOUNDED
    PRECEDING)`` under Spark's ASC null placement) — + ``total_col``
    (the group's grand total, null-valued rows included), without an
    unpartitioned window. Use integral weights for bit-exact parity
    with the sequential window (integer addition re-associates
    freely). ``coarse_bits=None`` switches to the range-derived coarse
    key for unbounded value domains (see ``histogram_rank``)."""
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
