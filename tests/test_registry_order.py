"""Registry-order invariants.

External verification harnesses sample the FIRST 50 queries() entries. From
round 6 the head is a ~10-name sentinel spine (one canary per SURVEY.md §2
family, each already multiply driver-green across CORRECTNESS_r01-r05) and
the other ~40 slots rotate through never-driver-checked ORACLE-BACKED names
so driver confirmation accumulates at ~40 names/round. This test pins that
contract so a refactor can't silently shrink the rotation or let a
no-oracle name burn a slot.
"""

from cdc_debezium_kafka_airflow_spark.queries import registry

WINDOW = 50

# the sentinel spine: one canary per §2 family; see registry._PRIORITY for
# the authoritative order
REQUIRED_IN_WINDOW = {
    "ser_json_schema",
    "de_json_schema_unwrap",
    "upsert_materialize",
    "snk_dlq_audit",
    "cdc_integrity_check",
    "monitor_lag",
    "stream_foreachbatch_upsert",
    "ext_dedup_minhash",
    "ext_sim_topk",
    "ext_multimodal_cols",
}


def test_priority_names_all_registered():
    assert set(registry._PRIORITY) <= set(registry.QUERIES)


def test_window_covers_every_required_sentinel():
    window = list(registry.QUERIES)[:WINDOW]
    missing = REQUIRED_IN_WINDOW - set(window)
    assert not missing, f"sentinels outside the verified window: {sorted(missing)}"


def test_priority_block_leads_registry():
    head = list(registry.QUERIES)[: len(registry._PRIORITY)]
    assert head == registry._PRIORITY


def test_spine_is_small_so_rotation_is_wide():
    """The whole point of the round-6 change: >= 35 window slots rotate."""
    assert len(registry._PRIORITY) <= 15
    assert registry.VERIFIED_WINDOW - len(registry._PRIORITY) >= 35


def test_no_duplicates_and_oracle_keys_subset():
    names = list(registry.QUERIES)
    assert len(names) == len(set(names))
    assert set(registry.ORACLES) <= set(registry.QUERIES)


def test_rotation_slots_are_oracle_backed():
    """A name without an oracle can only yield err=no_oracle — it must
    never occupy a rotation slot (the one red row of CORRECTNESS_r05)."""
    assert set(registry.ROTATION) <= set(registry.ORACLES)


def test_rotation_fills_window_and_is_deterministic():
    """The non-sentinel window slots rotate: they fill the window exactly,
    never collide with the pinned head, come from the name-sorted ring of
    NEVER-DRIVER-CHECKED oracle-backed names (falling back to the whole
    pool only once everything has a past CORRECTNESS row) at the
    round-keyed offset, and a re-import would select the same set."""
    head = list(registry.QUERIES)[: len(registry._PRIORITY)]
    rotation = list(registry.QUERIES)[
        len(registry._PRIORITY) : registry.VERIFIED_WINDOW
    ]
    assert rotation == registry.ROTATION
    assert not set(rotation) & set(registry._PRIORITY)
    assert len(head) + len(rotation) == registry.VERIFIED_WINDOW
    pool = sorted(
        k
        for k in registry.QUERIES
        if k not in set(registry._PRIORITY) and k in registry.ORACLES
    )
    seen = registry._already_verified()
    ring = [k for k in pool if k not in seen] or pool
    slots = registry.VERIFIED_WINDOW - len(registry._PRIORITY)
    off = ((registry._round_key() - 1) * slots) % len(ring)
    assert rotation == [ring[(off + i) % len(ring)] for i in range(slots)]
    # the whole point: while unchecked names exist, every rotated slot
    # must be one of them
    if len(ring) >= slots and ring is not pool:
        assert not set(rotation) & seen
