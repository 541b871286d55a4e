"""Corpus-curation operators a web-scale training pipeline runs between
ingestion and tokenization: URL canonicalization + per-domain caps
(RefinedWeb-style source balancing) and the deterministic global shuffle
into fixed training shards.

Reference parity: like sampling.py, these belong to the extension contract
SURVEY.md §2.D derives from the target workload — the reference moves every
CDC record and has no curation surface.

Scale notes:
  - URL canonicalization is a pure per-row expression chain (regexp + string
    ops, all JVM, inside whole-stage codegen) — map-only at any corpus size.
  - the per-domain cap is ONE shuffle keyed by domain; hot domains are the
    classic skew key, but the rank-then-filter shape needs only a per-domain
    sort of (priority, id) pairs, and a 100 TB deployment bounds that with
    the standard two-phase trick (pre-filter each partition to its local
    top-``cap`` before the shuffle, exactly like TakeOrderedAndProject) —
    partial_cap_prefilter() below IS that map-side combine.
  - shard assignment is a pure content-hash expression (map-only); only the
    within-shard ordering shuffles, and shard is the write partition key.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F


def canonicalize_url(url: Column) -> tuple[Column, Column]:
    """(domain, url_norm) from a raw URL.

    Steps (each a plain regexp/string expression, mirrored 1:1 in the DuckDB
    oracle): strip scheme -> split host/path at the first '/' -> lowercase
    host, drop a leading 'www.' and any ':port' -> drop query ('?...') and
    fragment ('#...') from the path -> drop the trailing '/'. The result is
    the dedup/cap key a crawl pipeline groups by (host registrable-domain
    nuances like co.uk PSL handling are a lookup-table refinement on top)."""
    no_scheme = F.regexp_replace(url, r"^[A-Za-z][A-Za-z0-9+.-]*://", "")
    host_raw = F.regexp_extract(no_scheme, r"^([^/]*)", 1)
    path_raw = F.regexp_replace(no_scheme, r"^[^/]*", "")
    host = F.regexp_replace(
        F.regexp_replace(F.lower(host_raw), r"^www\.", ""), r":\d+$", ""
    )
    path = F.regexp_replace(
        F.regexp_replace(path_raw, r"[?#].*$", ""), r"/$", ""
    )
    return host, F.concat(host, path)


def partial_cap_prefilter(
    docs: DataFrame, domain: Column, priority: list[Column], cap: int
) -> DataFrame:
    """Map-side combine for cap_per_domain: within each INPUT partition keep
    only the local top-``cap`` rows per domain before the shuffle — rows
    ranked below ``cap`` locally can never rank within ``cap`` globally, so
    this drops shuffle volume for hot domains from |domain| to
    cap x n_partitions without changing the result (the groupBy-partial-agg
    analog for rank-filters, which Spark does not push down itself).

    PRECONDITION: ``priority`` must be a TOTAL order (append a unique id as
    the last tiebreak, as every call site here does). With ties,
    row_number() breaks them arbitrarily per partition, so the local
    top-cap could drop a row the global rank would have kept — the
    local/global equivalence only holds for a unique ordering."""
    part = F.spark_partition_id()
    w = Window.partitionBy(part, domain).orderBy(*priority)
    return (
        docs.withColumn("_lrk", F.row_number().over(w))
        .filter(F.col("_lrk") <= cap)
        .drop("_lrk")
    )


def cap_per_domain(
    docs: DataFrame,
    domain: Column,
    priority: list[Column],
    cap: int,
    prefilter: bool = True,
) -> DataFrame:
    """Keep at most ``cap`` documents per domain, chosen by deterministic
    ``priority`` (content-hash order by convention — reproducible across
    engines and partition layouts, like every sampler in sampling.py).
    Emits every input row with its within-domain ``rank`` and ``kept`` flag
    so the audit (how much did each domain lose) falls out of the same
    pass."""
    d = docs.withColumn("_dom", domain)
    if prefilter:
        # the local prefilter only bounds rows that can still be KEPT; rows
        # it drops are exactly the kept=false tail, so when the full audit
        # frame is wanted the filter stage is skipped (prefilter=True is the
        # production kept-rows path)
        d = partial_cap_prefilter(d, F.col("_dom"), priority, cap)
    w = Window.partitionBy("_dom").orderBy(*priority)
    return (
        d.withColumn("dom_rank", F.row_number().over(w))
        .withColumn("kept", F.col("dom_rank") <= cap)
        .withColumnRenamed("_dom", "domain")
    )


def shard_of(text_norm: Column, n_shards: int) -> Column:
    """Content-hash shard id (hex window DISJOINT from the split bucket's,
    so shard and train/val/test membership stay independent) — the pure
    map-side half of shuffle_shards, shared with the balance audit."""
    h = F.md5(text_norm)
    return F.pmod(
        F.conv(F.substring(h, 9, 8), 16, 10).cast("bigint"), F.lit(n_shards)
    )


def shuffle_shards(
    docs: DataFrame,
    text_norm: Column,
    tiebreak: Column,
    n_shards: int,
) -> DataFrame:
    """Deterministic global shuffle into ``n_shards`` training shards: the
    once-per-corpus randomization a training run consumes sequentially.

    shard = content-hash bucket (hex window DISJOINT from the split bucket's
    so shard and train/val/test membership stay independent), position =
    rank of the full md5 within the shard. No RNG anywhere: the same corpus
    yields the same shard files on every engine and partition layout —
    df.sample/orderBy(rand()) cannot promise either. One shuffle (the
    within-shard sort); shard is the output-file partition key."""
    d = docs.withColumn(
        "shard", shard_of(text_norm, n_shards)
    ).withColumn("_h", F.md5(text_norm))
    w = Window.partitionBy("shard").orderBy(F.col("_h"), tiebreak)
    return d.withColumn("pos", F.row_number().over(w)).drop("_h")
