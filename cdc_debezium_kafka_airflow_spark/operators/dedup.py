"""Deduplication operators for training-data pipelines (BASELINE.json:6):
exact, n-gram Jaccard, MinHash+LSH, SimHash, embedding-cosine (the last via
operators.similarity.embedding_near_dups).

Scale shapes:
  exact_dedup          one hash-aggregate shuffle on the fingerprint; at
                       100 TB the md5 collapses arbitrarily long text to 32
                       bytes *before* the shuffle.
  ngram_jaccard_pairs  explode(shingles) -> self-equi-join on (block, shingle)
                       -> count — classic inverted-index join; the block_col
                       bounds the candidate blowup, and per-doc distinct
                       shingle sets are computed map-side.
  minhash_lsh_pairs    Spark ML MinHashLSH (banding via numHashTables);
                       approxSimilarityJoin is an equi-join on band hash, the
                       canonical sub-quadratic near-dup plan.
  simhash              per-token xxhash64 -> 64 signed bit-sums in ONE hash
                       aggregation -> 16-bit band blocking -> hamming<=3 via
                       bit_count(xor). No Python in the loop.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from cdc_debezium_kafka_airflow_spark.operators.text import normalize_text, ws_tokens


def exact_dedup(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Exact duplicate removal on md5(normalized text): keeps the lowest id
    per fingerprint, reports group size. One shuffle."""
    fp = F.md5(normalize_text(F.col(text_col)))
    return (
        df.select(F.col(id_col).alias("doc_id"), fp.alias("fp"))
        .groupBy("fp")
        .agg(F.min("doc_id").alias("doc_id"), F.count("*").alias("n_dups"))
        .select("doc_id", "fp", "n_dups")
    )


def char_shingles(col: Column, k: int = 3) -> Column:
    """Distinct k-char shingles of normalized text (JVM higher-order fns)."""
    n = F.greatest(F.length(col) - (k - 1), F.lit(1))
    return F.array_distinct(
        F.transform(F.sequence(F.lit(1), n), lambda i: F.substring(col, i, k))
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    block_col: str = "source",
    k: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """n-gram Jaccard near-dup pairs (id_a < id_b) within a blocking key.

    jaccard = |A∩B| / (|A| + |B| - |A∩B|) over distinct k-shingles.
    """
    shingled = df.select(
        F.col(id_col).alias("doc_id"),
        F.col(block_col).alias("block"),
        char_shingles(normalize_text(F.col(text_col)), k).alias("shingles"),
    )
    sizes = shingled.select(
        "doc_id", "block", F.size("shingles").alias("set_size")
    )
    exploded = shingled.select(
        "doc_id", "block", F.explode("shingles").alias("shingle")
    )
    inter = (
        exploded.alias("x")
        .join(
            exploded.alias("y"),
            on=[
                F.col("x.block") == F.col("y.block"),
                F.col("x.shingle") == F.col("y.shingle"),
                F.col("x.doc_id") < F.col("y.doc_id"),
            ],
        )
        .groupBy(
            F.col("x.doc_id").alias("id_a"), F.col("y.doc_id").alias("id_b")
        )
        .agg(F.count("*").alias("n_inter"))
    )
    a_sz = sizes.select(
        F.col("doc_id").alias("id_a"), F.col("set_size").alias("size_a")
    )
    b_sz = sizes.select(
        F.col("doc_id").alias("id_b"), F.col("set_size").alias("size_b")
    )
    return (
        inter.join(a_sz, "id_a")
        .join(b_sz, "id_b")
        .select(
            "id_a",
            "id_b",
            F.round(
                F.col("n_inter")
                / (F.col("size_a") + F.col("size_b") - F.col("n_inter")),
                6,
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hash_tables: int = 8,
    max_jaccard_distance: float = 0.6,
    num_features: int = 1 << 18,
    seed: int = 42,
) -> DataFrame:
    """MinHash+LSH near-dup pairs via Spark ML (shingle -> minhash -> band ->
    bucket-join). Deterministic for a fixed seed. Returns
    (id_a, id_b, jaccard_distance) with id_a < id_b."""
    from pyspark.ml.feature import HashingTF, MinHashLSH

    shingled = df.select(
        F.col(id_col).alias("doc_id"),
        char_shingles(normalize_text(F.col(text_col)), 3).alias("shingles"),
    ).filter(F.size("shingles") > 0)
    tf = HashingTF(
        inputCol="shingles", outputCol="features", numFeatures=num_features, binary=True
    )
    feats = tf.transform(shingled)
    lsh = MinHashLSH(
        inputCol="features", outputCol="hashes", numHashTables=num_hash_tables, seed=seed
    )
    model = lsh.fit(feats)
    pairs = model.approxSimilarityJoin(
        feats, feats, max_jaccard_distance, distCol="jaccard_distance"
    )
    return (
        pairs.select(
            F.col("datasetA.doc_id").alias("id_a"),
            F.col("datasetB.doc_id").alias("id_b"),
            F.round("jaccard_distance", 6).alias("jaccard_distance"),
        )
        .filter(F.col("id_a") < F.col("id_b"))
    )


def simhash(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """64-bit SimHash per document from xxhash64(token) bit votes."""
    toks = df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(ws_tokens(normalize_text(F.col(text_col)))).alias("tok"),
    ).withColumn("h", F.xxhash64("tok"))
    votes = toks.groupBy("doc_id").agg(
        *[
            F.sum(
                F.when(F.shiftrightunsigned(F.col("h"), b).bitwiseAND(1) == 1, 1)
                .otherwise(-1)
            ).alias(f"b{b}")
            for b in range(64)
        ]
    )
    sim = F.lit(0).cast("long")
    for b in range(64):
        sim = sim + F.when(
            F.col(f"b{b}") > 0, F.shiftleft(F.lit(1).cast("long"), b)
        ).otherwise(0)
    return votes.select("doc_id", sim.alias("simhash"))


def simhash_near_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
) -> DataFrame:
    """Near-dup pairs with hamming(simhash) <= max_hamming, candidate-blocked
    on 16-bit bands (a pair within hamming<=3 shares at least one of 4 bands
    untouched — pigeonhole)."""
    sh = simhash(df, id_col, text_col)
    bands = sh.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("band"),
                        F.shiftrightunsigned(F.col("simhash"), 16 * j)
                        .bitwiseAND(0xFFFF)
                        .alias("band_key"),
                    )
                    for j in range(4)
                ]
            )
        ).alias("bk"),
    ).select("doc_id", "simhash", "bk.band", "bk.band_key")
    a = bands.alias("a")
    b = bands.alias("b")
    return (
        a.join(
            b,
            on=[
                F.col("a.band") == F.col("b.band"),
                F.col("a.band_key") == F.col("b.band_key"),
                F.col("a.doc_id") < F.col("b.doc_id"),
            ],
        )
        .select(
            F.col("a.doc_id").alias("id_a"),
            F.col("b.doc_id").alias("id_b"),
            F.bit_count(
                F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))
            ).alias("hamming"),
        )
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )
