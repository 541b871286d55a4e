"""Deterministic corpus sampling for training-data pipelines: stratified
downsampling and train/val/test splitting, both gated on a CONTENT hash
rather than an RNG.

Why not ``df.sample`` / ``sampleBy``: Spark's samplers draw from a
partition-seeded RNG, so the selected set changes with partitioning and
cannot be reproduced by another engine (or even another run with a
different partition layout). A training pipeline needs the opposite —
the same document must land in the same split on every run, on every
engine, regardless of how the corpus is partitioned or re-keyed. Gating
on a hash of the normalized text gives exactly that:

  bucket(doc) = int(first 8 hex chars of md5(normalized_text)) % n

- deterministic and partition-independent (pure per-row expression);
- engine-portable (DuckDB: ``CAST('0x' || substr(md5(t),1,8) AS BIGINT)``
  equals Spark's ``conv(substr(md5(t),1,8),16,10)`` — oracle-checked);
- stable under re-keying: doc_ids can be reassigned by an upstream
  re-shard and membership does not move, because the gate never looks
  at the key;
- dedup-consistent: exact duplicates hash to the same bucket, so a
  duplicate pair can never straddle the train/test boundary (the classic
  eval-contamination bug with id- or RNG-based splits).

Scale: both operators are map-only — a 100 TB corpus samples with zero
shuffles, and the gate composes with any downstream agg's single shuffle.
The rate lookup is a literal CASE expression (broadcast-free), and the
whole thing stays inside whole-stage codegen (md5/conv/pmod are JVM
expressions; no Python).

Reference parity: the reference has no sampling surface (it moves every
CDC record); these belong to the extension contract SURVEY.md §2.D
derives from the target workload, like the dedup/similarity operators.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# 8 hex chars = 32 bits: unbiased enough for percent buckets (2^32 % 100
# leaves a 1-in-43M skew) while staying far inside BIGINT range in both
# engines' parsers.
_HEX_CHARS = 8


def content_bucket(text_norm: Column, n_buckets: int = 100) -> Column:
    """Deterministic bucket in [0, n_buckets) from a content hash."""
    h = F.conv(F.substring(F.md5(text_norm), 1, _HEX_CHARS), 16, 10)
    return F.pmod(h.cast("bigint"), F.lit(n_buckets))


def stratified_sample(
    docs: DataFrame,
    text_norm: Column,
    stratum: Column,
    rates_pct: dict[str, int],
    default_pct: int = 100,
) -> DataFrame:
    """Keep each row iff its content bucket falls under its stratum's
    percentage — per-stratum Bernoulli sampling with deterministic
    membership. ``rates_pct`` maps stratum value -> keep-percentage."""
    rate = F.lit(default_pct)
    for value, pct in sorted(rates_pct.items()):
        rate = F.when(stratum == value, F.lit(pct)).otherwise(rate)
    return docs.withColumn("bucket", content_bucket(text_norm)).filter(
        F.col("bucket") < rate
    )


def train_val_test_split(
    docs: DataFrame,
    text_norm: Column,
    val_pct: int = 5,
    test_pct: int = 5,
) -> DataFrame:
    """Label each row train/val/test by content bucket: [0, 100-v-t) ->
    train, then val, then test. Same determinism/contamination guarantees
    as ``stratified_sample``; exact duplicates always share a split."""
    train_hi = 100 - val_pct - test_pct
    b = content_bucket(text_norm)
    return docs.withColumn(
        "split",
        F.when(b < train_hi, F.lit("train"))
        .when(b < train_hi + val_pct, F.lit("val"))
        .otherwise(F.lit("test")),
    )
