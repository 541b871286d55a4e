"""Temporal / bounded-window join operators (the carry-forward family).

These state inequality-join semantics (the oracle form) but execute as
per-key timeline windows: union the event kinds into one ordered timeline,
carry what the later rows need, and read answers row-locally — O(n log n)
with ONE shuffle on the key, where the literal range join degenerates to a
per-key nested loop. Sort order alone enforces the boundary semantics
(strict vs inclusive), so there are no comparison predicates to get wrong.

Consumers: queries/relational2.py attribution_last_touch /
attribution_linear (reference parity: the warehouse-side marketing
analytics the reference delegates to Postgres, readme.md:23);
queries/cdc_queries.py cdc_scd2_lookup (point_in_time_lookup — the
Kimball Type-2 version lookup). All three are property-tested against
brute-force python references on random timelines
(tests/test_property_temporal.py) in addition to their SQL oracles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window


def last_touch_attribution(
    clicks: DataFrame, purchases: DataFrame, lookback: str = "INTERVAL 7 DAYS"
) -> DataFrame:
    """Credit each purchase to the user's most recent click STRICTLY before
    it and within ``lookback``. Inputs: (user_id, ts, event_id) frames.
    Output: (purchase_id, user_id, purchase_ts, click_id, seconds_since_click)
    with NULLs when nothing qualifies. Ties on ts break to the higher
    event_id; a click at the exact purchase instant does not count
    (purchases sort before same-ts clicks — kind 0 < 1)."""
    mk = F.struct(
        F.col("event_id").alias("click_id"), F.col("ts").alias("click_ts")
    )
    cl = clicks.select(
        "user_id", "ts", F.lit(1).alias("kind"), "event_id", mk.alias("mk")
    )
    pu = purchases.select(
        "user_id",
        "ts",
        F.lit(0).alias("kind"),
        "event_id",
        F.lit(None).cast(cl.schema["mk"].dataType).alias("mk"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "kind", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    tl = cl.unionByName(pu).withColumn(
        "c", F.last("mk", ignorenulls=True).over(w)
    )
    recent = F.col("c").isNotNull() & (
        F.col("c.click_ts") >= F.col("ts") - F.expr(lookback)
    )
    return tl.filter(F.col("kind") == 0).select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("ts").alias("purchase_ts"),
        F.when(recent, F.col("c.click_id")).alias("click_id"),
        F.when(
            recent,
            # symmetric casts make this NTZ/LTZ-agnostic: both operands
            # shift by the same session offset, the difference is invariant
            F.floor(
                (
                    F.unix_micros(F.col("ts").cast("timestamp"))
                    - F.unix_micros(F.col("c.click_ts").cast("timestamp"))
                )
                / F.lit(1000000.0)
            ).cast("bigint"),
        ).alias("seconds_since_click"),
    )


def linear_attribution(
    clicks: DataFrame, purchases: DataFrame, lookback: str = "INTERVAL 7 DAYS"
) -> DataFrame:
    """Share each purchase's credit equally across every click in its
    ``lookback`` window. Bounded-window counts come from the prefix-sum
    difference between two timeline reads: each purchase's window START is
    injected as a synthetic boundary marker at ts − lookback, one running
    click count is carried down the (ts, kind, id)-ordered timeline, and
    the window count is count(at purchase) − count(at its marker). Markers
    (kind 0) sort before same-instant clicks → the >= boundary is
    inclusive; purchases (kind 1) sort before same-instant clicks → the <
    boundary is strict. Output: (purchase_id, user_id, purchase_ts,
    n_touches, credit_per_touch)."""
    cl = clicks.select(
        "user_id",
        "ts",
        F.lit(2).alias("kind"),
        F.lit(None).cast("bigint").alias("pid"),
    )
    starts = purchases.select(
        "user_id",
        (F.col("ts") - F.expr(lookback)).alias("ts"),
        F.lit(0).alias("kind"),
        F.col("event_id").alias("pid"),
    )
    pu = purchases.select(
        "user_id", "ts", F.lit(1).alias("kind"), F.col("event_id").alias("pid")
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "kind", "pid")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    tl = (
        cl.unionByName(starts)
        .unionByName(pu)
        .withColumn("r", F.sum((F.col("kind") == 2).cast("long")).over(w))
    )
    n = F.max(F.when(F.col("kind") == 1, F.col("r"))) - F.max(
        F.when(F.col("kind") == 0, F.col("r"))
    )
    g = (
        tl.filter(F.col("kind") != 2)
        .groupBy("pid")
        .agg(
            F.max("user_id").alias("user_id"),
            F.max(F.when(F.col("kind") == 1, F.col("ts"))).alias(
                "purchase_ts"
            ),
            n.alias("n"),
        )
    )
    return g.select(
        F.col("pid").alias("purchase_id"),
        "user_id",
        "purchase_ts",
        F.col("n").cast("long").alias("n_touches"),
        F.when(F.col("n") > 0, F.round(F.lit(1e0) / F.col("n"), 6)).alias(
            "credit_per_touch"
        ),
    )


def point_in_time_lookup(dim_changes: DataFrame, facts: DataFrame) -> DataFrame:
    """Enrich each fact with the dimension PAYLOAD that was live at the
    fact's offset (the Kimball Type-2 lookup executed as a carry, not an
    interval join). Inputs: ``dim_changes`` = (key_id, offset, is_delete,
    payload struct) — the dimension's ordered change events, deletes with
    any payload; ``facts`` = (key_id, offset). Output: (key_id,
    fact_offset, payload) where payload is NULL for facts inside a
    deleted-key gap or before the key's first version.

    Deletes must RESET the carried value, which ``last(ignorenulls)``
    alone cannot do — so validity rides INSIDE the carried struct (lv
    flag) and resolves row-locally after the carry. Facts and dimension
    changes at the same offset cannot collide (offsets are unique log
    positions); ordering is (offset) within each key — one shuffle,
    O(n log n)."""
    payload_t = dim_changes.schema["payload"].dataType
    mk = F.when(
        ~F.col("is_delete"),
        F.struct(F.lit(True).alias("lv"), F.col("payload").alias("p")),
    ).otherwise(
        F.struct(
            F.lit(False).alias("lv"),
            F.lit(None).cast(payload_t).alias("p"),
        )
    )
    markers = dim_changes.select(
        "key_id", "offset", mk.alias("mk"), F.lit(False).alias("is_fact")
    )
    fa = facts.select(
        "key_id",
        "offset",
        F.lit(None).cast(markers.schema["mk"].dataType).alias("mk"),
        F.lit(True).alias("is_fact"),
    )
    w = (
        Window.partitionBy("key_id")
        .orderBy("offset")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        markers.unionByName(fa)
        .withColumn("c", F.last("mk", ignorenulls=True).over(w))
        .filter(F.col("is_fact"))
        .select(
            "key_id",
            F.col("offset").alias("fact_offset"),
            F.when(F.col("c.lv"), F.col("c.p")).alias("payload"),
        )
    )
