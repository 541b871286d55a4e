"""Multimodal plumbing: binary columns, metadata, Arrow-batched stub decode."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from cdc_debezium_kafka_airflow_spark.sources.tables import load_table
from cdc_debezium_kafka_airflow_spark.operators.multimodal import (
    _decode_stub,
    attach_media,
    extract_media_features,
)


def test_media_schema(spark, sf_dir):
    m = attach_media(load_table(spark, sf_dir, "documents"))
    assert isinstance(m.schema["media_bytes"].dataType, T.BinaryType)
    meta = m.schema["media_meta"].dataType
    assert isinstance(meta, T.StructType)
    assert {f.name for f in meta.fields} == {"width", "height", "duration_s"}
    assert {r.media_type for r in m.select("media_type").distinct().collect()} == {
        "image", "audio", "video"
    }


def test_feature_extraction_matches_text(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    feats = extract_media_features(attach_media(docs))
    joined = feats.join(docs, on="doc_id")
    # ASCII fixture text: n_bytes == n_chars
    assert joined.filter(F.col("n_bytes") != F.length("text")).count() == 0
    assert feats.filter(
        (F.col("checksum_mod") < 0) | (F.col("checksum_mod") >= 997)
    ).count() == 0


def test_real_decode_is_stubbed():
    with pytest.raises(NotImplementedError):
        _decode_stub("image", b"\x89PNG", real_decode=True)
