"""Fingerprint-cached per-document shingle materialization.

Four queries (`ext_dedup_ngram_jaccard`, `ext_dedup_clusters`,
`ext_dedup_minhash`, `ext_decontaminate`) each start from the same expensive
map stage: normalize text -> distinct k-gram shingle arrays (interpreted
higher-order functions, the dominant cold cost of the shingle family).
Materializing that stage ONCE per (sf_dir, unit, k) and reading it back as
parquet is the pattern the changelog replay cache already uses — and exactly
what a production 100 TB pipeline does: the shingle table is a materialized
intermediate (recomputed only when the corpus version changes), and every
dedup/decontamination job downstream starts from it.

The cache also carries the content-hash ``bucket`` so split-dependent
consumers (decontamination) derive train/val/test labels without touching
the raw text again.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

from cdc_debezium_kafka_airflow_spark.sources.cache_util import (
    cache_is_fresh,
    source_fingerprint,
    write_fingerprint,
)


def shingled_documents(
    spark: SparkSession, sf_dir: str, unit: str = "word", k: int = 3
) -> DataFrame:
    """Per-document shingle table: (doc_id, source, bucket, shingles).

    ``shingles`` = distinct k-gram array over normalized text (see
    operators.dedup.word_shingles / char_shingles); ``bucket`` = the
    content-hash percent bucket (operators.sampling.content_bucket).
    Written once per fixture version, fingerprint-invalidated.
    """
    from cdc_debezium_kafka_airflow_spark.operators.dedup import (
        char_shingles,
        word_shingles,
    )
    from cdc_debezium_kafka_airflow_spark.operators.sampling import (
        content_bucket,
    )
    from cdc_debezium_kafka_airflow_spark.operators.text import normalize_text
    from cdc_debezium_kafka_airflow_spark.sources.tables import load_table

    tag = os.path.basename(os.path.normpath(sf_dir))
    cache_dir = os.path.join("/root/repo/.cache", f"shingles_{unit}{k}_{tag}")
    fp = source_fingerprint(sf_dir, "documents")
    if not cache_is_fresh(cache_dir, fp):
        docs = load_table(spark, sf_dir, "documents")
        # the fixture is ONE parquet file -> one input partition; the
        # interpreted-HOF shingling is the cost, so spread it across the
        # cluster before computing (a 100 TB corpus arrives pre-partitioned
        # and skips this)
        par = spark.sparkContext.defaultParallelism
        # project normalized text FIRST: expressions referenced inside a
        # higher-order-function lambda re-evaluate per array element
        normed = docs.repartition(par).select(
            "doc_id", "source", normalize_text(F.col("text")).alias("t")
        )
        shingle_fn = word_shingles if unit == "word" else char_shingles
        out = normed.select(
            "doc_id",
            "source",
            content_bucket(F.col("t")).alias("bucket"),
            shingle_fn(F.col("t"), k).alias("shingles"),
        )
        out.write.mode("overwrite").parquet(cache_dir)
        write_fingerprint(cache_dir, fp)
    return spark.read.parquet(cache_dir)
