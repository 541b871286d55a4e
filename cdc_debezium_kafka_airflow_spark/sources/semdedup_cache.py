"""Fingerprint-cached SemDeDup decision log.

Two queries (`ext_dedup_semantic`, `ext_corpus_prune_d4`) start from the
same trained-SemDeDup pass (spherical k-means + within-cluster greedy
prune, operators/similarity.semdedup). Like the shingle table
(sources/shingle_cache.py), the per-vector decision log — (vid, cid,
centroid_sim, kept, witness_id) — is a materialized intermediate: written
once per (corpus version, n_clusters, threshold), invalidated by the
source fingerprint, and shared by every downstream curation job. That is
also the production contract: dedup DECISIONS are an audited artifact a
governance review replays, not something recomputed ad hoc per consumer.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from cdc_debezium_kafka_airflow_spark.sources.cache_util import (
    cache_is_fresh,
    source_fingerprint,
    write_fingerprint,
)


def semdedup_decision_log(
    spark: SparkSession,
    sf_dir: str,
    n_clusters: int = 8,
    threshold: float = 0.35,
) -> DataFrame:
    """The SemDeDup decision log for the embeddings fixture, cached on disk.

    Parameters participate in both the cache path and the fingerprint, so
    a re-tuned threshold can never serve a stale log.
    """
    from cdc_debezium_kafka_airflow_spark.operators.similarity import semdedup
    from cdc_debezium_kafka_airflow_spark.sources.tables import load_table

    tag = os.path.basename(os.path.normpath(sf_dir))
    params = f"k{n_clusters}_t{threshold}"
    cache_dir = os.path.join(
        "/root/repo/.cache", f"semdedup_{params}_{tag}"
    )
    fp = source_fingerprint(sf_dir, "embeddings") + ":" + params
    if not cache_is_fresh(cache_dir, fp):
        e = load_table(spark, sf_dir, "embeddings")
        dec = semdedup(
            e,
            n_clusters=n_clusters,
            threshold=threshold,
            cache_key=source_fingerprint(sf_dir, "embeddings"),
        )
        dec.write.mode("overwrite").parquet(cache_dir)
        write_fingerprint(cache_dir, fp)
    return spark.read.parquet(cache_dir)
