"""Vector similarity search over an embedding column (``array<float>``).

Two tiers (BASELINE.json:6 extension surface):
  brute_force_topk  exact cosine top-k — the correctness baseline. The small
                    query set is broadcast; the corpus streams through a
                    map-side join, so the only shuffle is the final per-query
                    top-k aggregation over n_queries*k candidate rows.
  bucketed_ann_topk IVF/LSH-style scale path: deterministic sign-bit bucketing
                    of the first B dimensions prunes the corpus ~2^B-fold;
                    same join shape but the equi-join on bucket id lets Spark
                    hash-partition instead of broadcasting a full cross
                    product. At 100 TB the bucket id becomes the partition /
                    cluster key of the stored corpus, so a query touches only
                    its bucket's files (partition pruning).

All arithmetic is JVM-side (`zip_with`/`aggregate` higher-order functions —
no Python UDF). Floats are cast to double *element-wise before* any product
so Spark and the DuckDB oracle accumulate identically; results round to 6
decimals for hash-stable comparison.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.window import Window


def as_double(vec: Column) -> Column:
    return F.transform(vec, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def l2_norm(vec: Column) -> Column:
    return F.sqrt(dot(vec, vec))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def sign_bucket(vec: Column, bits: int = 4) -> Column:
    """Deterministic LSH bucket: bit j set iff vec[j] > 0 (first `bits` dims).

    A fixed-hyperplane random-projection hash (hyperplanes = axis planes).
    """
    acc = F.lit(0)
    for j in range(bits):
        acc = acc + F.when(F.element_at(vec, j + 1) > 0, F.lit(1 << j)).otherwise(0)
    return acc


def auto_bits(
    n_rows: int, dim: int, target_bucket: int = 64, min_bits: int = 2
) -> int:
    """Bucket width scaled to corpus size: smallest ``bits`` whose expected
    bucket holds ~``target_bucket`` vectors (2^bits grows linearly with the
    corpus, so within-bucket all-pairs work stays ~linear in n — a FIXED
    bits goes quadratic at 2^bits times the corpus the default was tuned
    for). Capped at the embedding dim: past that, sign-bucket blocking is
    exhausted and blocking must move to trained IVF cells (``ivf_topk``).

    The DuckDB oracles mirror this formula in SQL — keep them identical:
    least(dim, greatest(2, ceil(log2(n/64.0)))).
    """
    import math

    if n_rows <= target_bucket:
        bits = min_bits
    else:
        bits = math.ceil(math.log2(n_rows / target_bucket))
    return max(min_bits, min(bits, dim))


def _corpus_bits(corpus: DataFrame, vec_col: str) -> int:
    n = corpus.count()
    dim = corpus.select(F.size(vec_col).alias("d")).first()["d"]
    return auto_bits(n, dim)


def _topk_per_query(scored: DataFrame, k: int) -> DataFrame:
    """rank candidates per query: cosine desc, vec_id asc tie-break."""
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "neighbor_id",
            F.round("cosine_sim", 6).alias("cosine_sim"),
            "rank",
        )
    )


def brute_force_topk(
    queries: DataFrame, corpus: DataFrame, k: int = 10
) -> DataFrame:
    """Exact cosine top-k of each query vector against the corpus.

    queries: (query_id long, qvec array<float>); corpus: (neighbor_id, cvec).
    """
    q = queries.select("query_id", as_double("qvec").alias("qvec"))
    c = corpus.select("neighbor_id", as_double("cvec").alias("cvec"))
    scored = (
        c.join(F.broadcast(q))  # map-side: corpus streams, queries broadcast
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            cosine(F.col("qvec"), F.col("cvec")).alias("cosine_sim"),
        )
    )
    return _topk_per_query(scored, k)


def bucketed_ann_topk(
    queries: DataFrame, corpus: DataFrame, k: int = 10, bits: int | None = None
) -> DataFrame:
    """Approximate top-k: candidates restricted to the query's sign bucket.

    ``bits=None`` derives the bucket width from the corpus size
    (see ``auto_bits``) so candidate volume stays ~linear as the corpus
    grows instead of quadratic past a fixed 2^bits."""
    if bits is None:
        bits = _corpus_bits(corpus, "cvec")
    q = queries.select(
        "query_id",
        as_double("qvec").alias("qvec"),
        sign_bucket(F.col("qvec"), bits).alias("bucket"),
    )
    c = corpus.select(
        "neighbor_id",
        as_double("cvec").alias("cvec"),
        sign_bucket(F.col("cvec"), bits).alias("bucket"),
    )
    scored = (
        c.join(F.broadcast(q), on="bucket")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            cosine(F.col("qvec"), F.col("cvec")).alias("cosine_sim"),
        )
    )
    return _topk_per_query(scored, k)


def train_ivf_centroids(
    corpus: DataFrame,
    id_col: str = "neighbor_id",
    vec_col: str = "cvec",
    k: int = 8,
    iters: int = 3,
) -> DataFrame:
    """Deterministic mini k-means (Lloyd) over DataFrame ops -> centroids.

    Init: the k vectors with id % (n/k-ish stride) == 0 — no randomness.
    Each iteration: assign to nearest centroid (broadcast k centroids),
    recompute means. Centroids are ROUNDED to 6 decimals each iteration so
    float summation order can't make assignments flicker between runs —
    iterative algorithms on doubles must quantize shared state to stay
    reproducible. Returns (centroid_id, centroid array<double>).
    """
    v = corpus.select(
        F.col(id_col).alias("vid"), as_double(F.col(vec_col)).alias("vec")
    )
    n = v.count()
    stride = max(n // k, 1)
    centroids = (
        v.filter((F.col("vid") % stride == 0) & (F.col("vid") < stride * k))
        .select((F.col("vid") / stride).cast("int").alias("cid"), F.col("vec").alias("cvec_c"))
    )
    for _ in range(iters):
        assigned = _assign_to_centroids(v, centroids)
        # per-dimension mean: explode positions once, average, re-collect
        assigned_pos = assigned.select(
            "cid", F.posexplode("vec").alias("pos", "x")
        )
        centroids = (
            assigned_pos.groupBy("cid", "pos")
            .agg(F.round(F.avg("x"), 6).alias("m"))
            .groupBy("cid")
            .agg(F.array_sort(F.collect_list(F.struct("pos", "m"))).alias("pm"))
            .select(
                "cid",
                F.transform(F.col("pm"), lambda s: s["m"]).alias("cvec_c"),
            )
        )
        centroids = centroids.localCheckpoint(eager=True)
    return centroids.select(
        F.col("cid").alias("centroid_id"), F.col("cvec_c").alias("centroid")
    )


def _assign_to_centroids(v: DataFrame, centroids: DataFrame) -> DataFrame:
    """Nearest-centroid assignment (broadcast centroids; ties -> lowest id)."""
    joined = v.join(F.broadcast(centroids))
    d2 = F.aggregate(
        F.zip_with("vec", "cvec_c", lambda x, c: (x - c) * (x - c)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    scored = joined.select("vid", "vec", "cid", d2.alias("d2"))
    return (
        scored.groupBy("vid")
        .agg(
            F.min_by(F.struct("cid", "vec"), F.struct("d2", "cid")).alias("b")
        )
        .select("vid", F.col("b.cid").alias("cid"), F.col("b.vec").alias("vec"))
    )


def ivf_topk(
    queries: DataFrame, corpus: DataFrame, k: int = 10, n_centroids: int = 8,
    n_probe: int = 2,
) -> DataFrame:
    """Trained-IVF ANN: assign corpus to k-means cells; each query probes its
    `n_probe` nearest cells only. The production shape: cells are the
    corpus's storage partition key, probes prune the scan ~(k/n_probe)-fold.
    """
    c = corpus.select("neighbor_id", as_double(F.col("cvec")).alias("cvec"))
    cents = train_ivf_centroids(corpus, k=n_centroids)
    # corpus cell assignment
    cv = c.join(F.broadcast(cents))
    d2c = F.aggregate(
        F.zip_with("cvec", "centroid", lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    corpus_cells = (
        cv.select("neighbor_id", "cvec", "centroid_id", d2c.alias("d2"))
        .groupBy("neighbor_id")
        .agg(
            F.min_by(
                F.struct("centroid_id", "cvec"), F.struct("d2", "centroid_id")
            ).alias("b")
        )
        .select(
            "neighbor_id",
            F.col("b.centroid_id").alias("cell"),
            F.col("b.cvec").alias("cvec"),
        )
    )
    # query probes: n_probe nearest cells
    q = queries.select("query_id", as_double(F.col("qvec")).alias("qvec"))
    qv = q.join(F.broadcast(cents))
    d2q = F.aggregate(
        F.zip_with("qvec", "centroid", lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("d2").asc(), F.col("centroid_id").asc()
    )
    probes = (
        qv.select("query_id", "qvec", "centroid_id", d2q.alias("d2"))
        .withColumn("pr", F.row_number().over(w))
        .filter(F.col("pr") <= n_probe)
        .select("query_id", "qvec", F.col("centroid_id").alias("cell"))
    )
    scored = (
        corpus_cells.join(F.broadcast(probes), on="cell")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            cosine(F.col("qvec"), F.col("cvec")).alias("cosine_sim"),
        )
    )
    return _topk_per_query(scored, k)


def embedding_near_dups(
    vectors: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    bits: int | None = None,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (id_a < id_b) within sign
    buckets — the blocked/pruned shape that survives large corpora.

    ``bits=None`` derives the bucket width from the corpus size
    (see ``auto_bits``): within-bucket all-pairs is O(n²/2^bits), so 2^bits
    must track n to keep total candidate work ~linear."""
    if bits is None:
        bits = _corpus_bits(vectors, vec_col)
    v = vectors.select(
        F.col(id_col).alias("vid"),
        as_double(F.col(vec_col)).alias("vec"),
        sign_bucket(as_double(F.col(vec_col)), bits).alias("bucket"),
    )
    a = v.select(
        F.col("vid").alias("id_a"), F.col("vec").alias("vec_a"), "bucket"
    )
    b = v.select(
        F.col("vid").alias("id_b"), F.col("vec").alias("vec_b"), "bucket"
    )
    return (
        a.join(b, on="bucket")
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            F.round(cosine(F.col("vec_a"), F.col("vec_b")), 6).alias("cosine_sim"),
        )
        .filter(F.col("cosine_sim") >= threshold)
    )
