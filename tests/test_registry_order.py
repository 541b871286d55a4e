"""Registry-order invariants.

External verification harnesses sample the FIRST 50 queries() entries, so the
head of the registry must carry one flagship query per SURVEY.md §2 operator
id. This test pins that contract so a refactor can't silently push a §2
operator out of the verified window.
"""

from cdc_debezium_kafka_airflow_spark.queries import registry

WINDOW = 50

# one flagship query per SURVEY §2 op id (plus the LLM-pipeline components
# graded as first-class); see registry._PRIORITY for the authoritative order
REQUIRED_IN_WINDOW = {
    # §2.A sources/sinks/serialization
    "src_cdc_snapshot",
    "ser_json_schema",
    "de_json_schema_unwrap",
    "stream_foreachbatch_upsert",  # snk_jdbc_upsert shape
    "snk_dlq_audit",
    "snk_schema_history",
    "monitor_status_health",  # src_http_status fixture
    "src_sql_passthrough",
    "src_jdbc_federated",  # true external-JDBC federation (embedded Derby)
    # §2.B row transforms + CDC stateful semantics
    "xf_regexrouter",
    "upsert_materialize",
    "xf_schema_evolve",
    # §2.C monitoring
    "cdc_integrity_check",
    "monitor_lag",
    "monitor_fanout_config",
    "monitor_any_failed",
    "ctl_retry_upsert",  # §2.C ctl_retry (bounded-backoff foreachBatch retry)
    # §2.D relational
    "proj_filter",
    "q1_pricing_summary",
    "agg_distinct",
    "agg_rollup_cube",
    "join_inner_hash",
    "join_broadcast",
    "join_left",
    "join_range_asof",
    "win_rank",
    "win_analytic",
    "sort_limit_topk",
    "set_ops",
    "fn_string",  # flagship for the §2 fn_* line; siblings rotate
    "udf_surface",  # flagship for the §2 udf line; UDTF/UDAF rotate
    # §2.D streaming
    "stream_tumbling",
    "stream_watermark",
    "stream_upsert_state",
    "stream_dedup_exact",
    # §2.D LLM-pipeline extensions
    "ext_dedup_exact",
    "ext_dedup_ngram_jaccard",
    "ext_dedup_minhash",
    "ext_sim_topk",
    "ext_sim_ann_bucketed",
    "ext_text_quality",
    "ext_multimodal_cols",
}


def test_priority_names_all_registered():
    assert set(registry._PRIORITY) <= set(registry.QUERIES)


def test_window_covers_every_required_flagship():
    window = list(registry.QUERIES)[:WINDOW]
    missing = REQUIRED_IN_WINDOW - set(window)
    assert not missing, f"§2 flagships outside the verified window: {sorted(missing)}"


def test_priority_block_leads_registry():
    head = list(registry.QUERIES)[: len(registry._PRIORITY)]
    assert head == registry._PRIORITY


def test_no_duplicates_and_oracle_keys_subset():
    names = list(registry.QUERIES)
    assert len(names) == len(set(names))
    assert set(registry.ORACLES) <= set(registry.QUERIES)


def test_rotation_fills_window_and_is_deterministic():
    """The non-flagship window slots rotate: they fill the window exactly,
    never collide with the pinned head, come from the name-sorted ring of
    NEVER-DRIVER-CHECKED names (falling back to the whole pool only once
    everything has a past CORRECTNESS row) at the round-keyed offset, and
    a re-import would select the same set."""
    head = list(registry.QUERIES)[: len(registry._PRIORITY)]
    rotation = list(registry.QUERIES)[
        len(registry._PRIORITY) : registry.VERIFIED_WINDOW
    ]
    assert rotation == registry.ROTATION
    assert not set(rotation) & set(registry._PRIORITY)
    assert len(head) + len(rotation) == registry.VERIFIED_WINDOW
    pool = sorted(
        k for k in registry.QUERIES if k not in set(registry._PRIORITY)
    )
    seen = registry._already_verified()
    ring = [k for k in pool if k not in seen] or pool
    slots = registry.VERIFIED_WINDOW - len(registry._PRIORITY)
    off = ((registry._round_key() - 1) * slots) % len(ring)
    assert rotation == [
        ring[(off + i) % len(ring)] for i in range(slots)
    ]
    # the whole point: while unchecked names exist, every rotated slot
    # must be one of them
    if len(ring) >= slots and ring is not pool:
        assert not set(rotation) & seen
