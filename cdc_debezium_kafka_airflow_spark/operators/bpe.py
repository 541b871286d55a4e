"""Distributed BPE (byte-pair-encoding) merge training — the tokenizer-
construction step of an LLM data pipeline, structured for corpus scale.

The key scale property of BPE training: after ONE corpus-wide pass that
builds the (word, frequency) table, every training round runs over the
VOCABULARY (distinct words), never the corpus again. At 100 TB the word
table is millions of rows (not trillions), so the per-round cost is a
vocab-sized aggregation + a map-only merge application; the driver only
ever sees one argmax row per round.

Round shape:
  pairs   adjacent symbol pairs per word, weighted by word frequency
          (zip_with over the symbol array — JVM-side, no Python)
  best    argmax by (count DESC, pair ASC) — deterministic tie-break
  apply   left-to-right greedy merge of the winning pair inside each
          symbol array (Arrow-batched pandas_udf: per-array sequential
          rewriting is the one genuinely imperative step)

The merge SEQUENCE is the artifact (tokenizers replay it greedily);
tests/test_curation.py pins it against a pure-Python reference
implementation on the same corpus, and determinism across partition
layouts is part of the property tests.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import ArrayType, StringType

from cdc_debezium_kafka_airflow_spark.operators.text import normalize_text

END = "</w>"


def word_freq_table(docs: DataFrame) -> DataFrame:
    """(word, freq) over the normalized corpus — the ONE corpus-wide
    shuffle of the whole training run."""
    words = docs.select(
        F.explode(F.split(normalize_text(F.col("text")), " ")).alias("word")
    ).filter(F.length("word") > 0)
    return words.groupBy("word").agg(F.count("*").alias("freq"))


def init_symbols(words: DataFrame) -> DataFrame:
    """word -> its initial symbol sequence: characters + end-of-word mark."""
    return words.select(
        "word",
        "freq",
        F.concat(
            F.split(F.col("word"), ""), F.array(F.lit(END))
        ).alias("symbols"),
    )


def _pair_counts(symbols: DataFrame) -> DataFrame:
    """Adjacent-pair frequencies, weighted by word freq — JVM zip_with."""
    n = F.size("symbols")
    pairs = F.zip_with(
        F.slice("symbols", 1, n - 1),
        F.slice("symbols", 2, n - 1),
        lambda a, b: F.struct(a.alias("left"), b.alias("right")),
    )
    return (
        symbols.filter(n >= 2)
        .select(F.explode(pairs).alias("p"), "freq")
        .groupBy("p.left", "p.right")
        .agg(F.sum("freq").alias("pair_count"))
    )


def _merge_applier(left: str, right: str):
    merged = left + right

    @F.pandas_udf(ArrayType(StringType()))
    def apply_merge(col: pd.Series) -> pd.Series:
        def one(symbols):
            out = []
            i, n = 0, len(symbols)
            while i < n:
                if (
                    i + 1 < n
                    and symbols[i] == left
                    and symbols[i + 1] == right
                ):
                    out.append(merged)
                    i += 2
                else:
                    out.append(symbols[i])
                    i += 1
            return out

        return col.map(one)

    return apply_merge


def train_bpe(docs: DataFrame, n_merges: int = 8) -> DataFrame:
    """Run `n_merges` BPE rounds; returns the merge table
    (merge_rank, left, right, merged, pair_count) as a DataFrame."""
    spark = docs.sparkSession
    symbols = init_symbols(word_freq_table(docs)).persist()
    merges = []
    try:
        for rank in range(n_merges):
            best = (
                _pair_counts(symbols)
                .orderBy(
                    F.col("pair_count").desc(),
                    F.col("left").asc(),
                    F.col("right").asc(),
                )
                .limit(1)
                .collect()
            )
            if not best or best[0].pair_count < 2:
                break
            left, right, cnt = (
                best[0].left,
                best[0].right,
                best[0].pair_count,
            )
            merges.append((rank, left, right, left + right, cnt))
            nxt = symbols.withColumn(
                "symbols", _merge_applier(left, right)(F.col("symbols"))
            ).persist()
            nxt.count()  # materialize before dropping the parent
            symbols.unpersist()
            symbols = nxt
    finally:
        symbols.unpersist()
    return spark.createDataFrame(
        merges,
        "merge_rank int, left string, right string, merged string, "
        "pair_count long",
    )


_MERGE_CACHE: dict = {}


def train_bpe_cached(docs: DataFrame, cache_key: str, n_merges: int = 8):
    """Train-once memoization per (corpus, n_merges) — the tokenizer
    artifact has an index lifecycle (train once, apply everywhere), same
    convention as the IVF/PQ codebook caches in operators/similarity."""
    key = (cache_key, n_merges)
    if key not in _MERGE_CACHE:
        _MERGE_CACHE[key] = [
            (r.merge_rank, r.left, r.right, r.merged, r.pair_count)
            for r in train_bpe(docs, n_merges).collect()
        ]
    return _MERGE_CACHE[key]


def apply_bpe(words: DataFrame, merges: list) -> DataFrame:
    """Tokenize the (word, freq) VOCABULARY with a trained merge list —
    greedy lowest-rank-first replay, the exact apply rule real BPE
    tokenizers use. Corpus-scale note: tokenization happens once per
    DISTINCT word (vocab-sized Arrow-batched Python), then corpus token
    counts are freq-weighted aggregates — the raw corpus is never
    re-touched."""
    rank_of = {(left, right): rank for rank, left, right, _m, _c in merges}

    @F.pandas_udf(ArrayType(StringType()))
    def tokenize(col: pd.Series) -> pd.Series:
        def one(word):
            symbols = list(word) + [END]
            while len(symbols) >= 2:
                best, best_rank = None, None
                for i in range(len(symbols) - 1):
                    r = rank_of.get((symbols[i], symbols[i + 1]))
                    if r is not None and (best_rank is None or r < best_rank):
                        best, best_rank = i, r
                if best is None:
                    break
                symbols[best : best + 2] = [
                    symbols[best] + symbols[best + 1]
                ]
            return symbols

        return col.map(one)

    return words.select(
        "word", "freq", tokenize(F.col("word")).alias("tokens")
    )
