"""Multimodal plumbing: binary columns, metadata, Arrow-batched decode.

The image path is REAL: a spec-conformant 24-bpp BMP is rendered at attach
time and the feature stage parses it back (header, bottom-up padded rows).
Audio/video features remain deterministic byte-level stubs (no codecs in
this container).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from cdc_debezium_kafka_airflow_spark.sources.tables import load_table
from cdc_debezium_kafka_airflow_spark.operators.multimodal import (
    _decode_stub,
    attach_media,
    bmp_dims,
    decode_bmp,
    extract_media_features,
    render_bmp,
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


def test_bmp_roundtrip_local():
    """Pure-python render -> decode roundtrip, including the padded-row and
    bottom-up layout (width 4 -> 12-byte rows, no padding; width 5 -> 15
    data bytes padded to 16)."""
    for doc_id in range(0, 40, 3):  # image-typed ids
        data = render_bmp(doc_id)
        w, h = bmp_dims(doc_id)
        row_size = (3 * w + 3) // 4 * 4
        assert len(data) == 54 + row_size * h
        dw, dh, mean = decode_bmp(data)
        assert (dw, dh) == (w, h)
        expect = sum(
            (doc_id * 31 + 7 * x + 13 * y) % 256
            for x in range(w)
            for y in range(h)
        ) / (w * h)
        assert abs(mean - expect) < 1e-9


def test_decode_bmp_rejects_non_bmp():
    with pytest.raises(ValueError):
        decode_bmp(b"\x89PNG\r\n\x1a\n" + b"\x00" * 64)


def test_feature_extraction_real_image_decode(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    feats = extract_media_features(attach_media(docs)).cache()
    imgs = feats.filter(F.col("media_type") == "image")
    others = feats.filter(F.col("media_type") != "image")
    # every image row decoded: dims match the deterministic layout
    bad = imgs.filter(
        (F.col("width") != (F.col("doc_id") % 5 + 4))
        | (F.col("height") != (F.col("doc_id") % 4 + 3))
        | F.col("mean_pixel").isNull()
        | (F.col("mean_pixel") < 0)
        | (F.col("mean_pixel") > 255)
    )
    assert imgs.count() > 0 and bad.count() == 0
    # non-image rows keep byte-level features; ASCII fixture: n_bytes==len
    joined = others.join(docs, on="doc_id")
    assert joined.filter(F.col("n_bytes") != F.length("text")).count() == 0
    assert (
        others.filter(
            (F.col("checksum_mod") < 0) | (F.col("checksum_mod") >= 997)
        ).count()
        == 0
    )
    feats.unpersist()


def test_real_codec_decode_is_stubbed_for_audio_video():
    with pytest.raises(NotImplementedError):
        _decode_stub("audio", b"RIFF", real_decode=True)
