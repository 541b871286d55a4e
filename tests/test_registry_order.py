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
    """The non-sentinel window slots rotate: ever-red-never-green names
    take GUARANTEED leading slots (a failed driver row needs a fresh one
    NOW), the rest drain the NEVER-GREEN oracle-backed pool in ascending
    order of each name's MODULE driver coverage — so the families with
    the thinnest external evidence fill the window first (VERDICT r08
    task #1) — falling back to a round-keyed offset ring over the whole
    pool only once everything has a green CORRECTNESS row. A re-import
    selects the same set (pure function of repo state)."""
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
    green, red = registry._already_verified()
    slots = registry.VERIFIED_WINDOW - len(registry._PRIORITY)
    red_first = sorted(k for k in pool if k in red)[:slots]
    assert rotation[: len(red_first)] == red_first
    unseen = sorted(
        (k for k in pool if k not in green and k not in red),
        key=lambda k: (
            registry._module_cov[registry._name_module[k]],
            registry._name_module[k],
            k,
        ),
    )
    slots_left = slots - len(red_first)
    if unseen:
        expect_tail = [k for k in unseen if k not in red_first][:slots_left]
    else:
        ring = pool
        off = ((registry._round_key() - 1) * slots) % len(ring)
        expect_tail, i = [], 0
        while len(expect_tail) < slots_left and i < len(ring):
            cand = ring[(off + i) % len(ring)]
            i += 1
            if cand not in red_first and cand not in expect_tail:
                expect_tail.append(cand)
    assert rotation[len(red_first):] == expect_tail
    # the whole point: while never-green names exist, every rotated slot
    # must be one of them
    if len(unseen) >= slots:
        assert not set(rotation) & green


def test_rotation_prefers_least_covered_modules():
    """While the unseen pool is non-empty, the rotated slots must be the
    unseen names whose modules have the LOWEST historical driver
    coverage — a flat alphabetical ring let ext_* crowd out streaming
    (the r08 judge's top complaint)."""
    green, red = registry._already_verified()
    pool = set(registry.ROTATION) | {
        k
        for k in registry.ORACLES
        if k not in set(registry._PRIORITY) and k not in green and k not in red
    }
    unseen_in = [k for k in registry.ROTATION if k not in green and k not in red]
    if not unseen_in:  # drained-pool fallback: nothing to assert
        return
    picked_cov = max(registry._module_cov[registry._name_module[k]] for k in unseen_in)
    skipped = [k for k in pool - set(registry.ROTATION) if k not in green and k not in red]
    for k in skipped:
        assert registry._module_cov[registry._name_module[k]] >= picked_cov - 1e-12


def test_red_rows_do_not_count_as_seen():
    """Round-6 regression: a name whose ONLY driver row failed (r05's
    ext_bpe_tokenize err=no_oracle) must re-enter the window immediately,
    not after the unseen pool drains."""
    assert not registry._row_green({"rows_match": None, "err": "no_oracle"})
    assert not registry._row_green(
        {"rows_match": True, "schema_match": True, "hash_match": False,
         "err": None}
    )
    # rows-only weaker check (hash_match None, no err) still counts green
    assert registry._row_green(
        {"rows_match": True, "schema_match": True, "hash_match": None,
         "err": None}
    )
    green, red = registry._already_verified()
    assert not green & red
