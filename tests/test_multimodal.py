"""Multimodal plumbing: binary columns, metadata, Arrow-batched decode.

The image and audio paths are REAL: a spec-conformant 24-bpp BMP / RIFF-WAVE
16-bit PCM file is rendered at attach time and the feature stage parses it
back (BMP header + bottom-up padded rows; RIFF chunk walk). Video is real
at the same level: an uncompressed RIFF/AVI container of raw-DIB frames is
rendered and its chunk tree walked back (avih header + per-frame '00db'
chunks) — codec-free by construction, so no codec library is needed.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from cdc_debezium_kafka_airflow_spark.sources.tables import load_table
from cdc_debezium_kafka_airflow_spark.operators.multimodal import (
    _avi_pixel,
    _wav_sample,
    attach_media,
    avi_spec,
    bmp_dims,
    decode_avi,
    decode_bmp,
    decode_wav,
    extract_media_features,
    render_avi,
    render_bmp,
    render_wav,
    wav_spec,
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


def test_wav_roundtrip_local():
    """Pure-python render -> decode roundtrip across both sample rates and
    the word-alignment edge (odd data sizes can't occur with int16, but odd
    n keeps the chunk walk honest)."""
    for doc_id in range(1, 40, 3):  # audio-typed ids
        data = render_wav(doc_id)
        rate, n = wav_spec(doc_id)
        assert len(data) == 44 + 2 * n
        drate, dn, amp = decode_wav(data)
        assert (drate, dn) == (rate, n)
        expect = sum(abs(_wav_sample(doc_id, i)) for i in range(n)) / n
        assert amp == expect


def test_decode_wav_rejects_non_wav():
    with pytest.raises(ValueError):
        decode_wav(b"OggS" + b"\x00" * 64)
    with pytest.raises(ValueError):
        # RIFF but not WAVE
        decode_wav(b"RIFF\x04\x00\x00\x00AVI " + b"\x00" * 16)


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
    # audio rows decoded from the real WAV payload
    auds = feats.filter(F.col("media_type") == "audio")
    bad_aud = auds.filter(
        (F.col("sample_rate") != F.when(F.col("doc_id") % 2 == 0, 8000).otherwise(16000))
        | (F.col("n_samples") != (F.col("doc_id") % 57 + 40))
        | (F.col("n_bytes") != 44 + 2 * (F.col("doc_id") % 57 + 40))
        | F.col("mean_abs_amp").isNull()
        | (F.col("mean_abs_amp") < 0)
        | (F.col("mean_abs_amp") > 2048)
    )
    assert auds.count() > 0 and bad_aud.count() == 0
    # video rows decoded from the real AVI container
    vids = others.filter(F.col("media_type") == "video")
    bad_vid = vids.filter(
        (F.col("width") != (F.col("doc_id") % 4 + 4))
        | (F.col("height") != (F.col("doc_id") % 3 + 3))
        | (F.col("n_frames") != (F.col("doc_id") % 4 + 3))
        | (F.col("fps") != 10.0)
        | F.col("mean_pixel").isNull()
        | (F.col("mean_pixel") < 0)
        | (F.col("mean_pixel") > 255)
    )
    assert vids.count() > 0 and bad_vid.count() == 0
    feats.unpersist()


def test_avi_roundtrip_local():
    """Pure-python render -> decode roundtrip for the AVI container: header
    dims/frame-count/fps recovered, per-frame pixel mean matches the
    closed-form generator, and the container size follows the exact RIFF
    layout formula (224 header bytes + per-frame chunks)."""
    for doc_id in range(2, 41, 3):  # video-typed ids
        data = render_avi(doc_id)
        w, h, n = avi_spec(doc_id)
        row_size = (3 * w + 3) // 4 * 4
        assert len(data) == 224 + n * (8 + row_size * h)
        dw, dh, dn, fps, mean = decode_avi(data)
        assert (dw, dh, dn, fps) == (w, h, n, 10.0)
        expect = sum(
            _avi_pixel(doc_id, f, x, y)
            for f in range(n) for y in range(h) for x in range(w)
        ) / (w * h * n)
        assert abs(mean - expect) < 1e-9


def test_decode_avi_rejects_poison():
    import struct as _s

    with pytest.raises(ValueError):
        decode_avi(b"RIFF\x10\x00\x00\x00WAVE" + b"\x00" * 16)
    good = render_avi(2)
    with pytest.raises(ValueError):
        decode_avi(good[: len(good) - 5])  # truncated final frame
    # frame-count mismatch: chop the last whole frame chunk but keep the
    # RIFF and movi sizes consistent so ONLY the avih cross-check catches it
    w, h, n = avi_spec(2)
    fsize = (3 * w + 3) // 4 * 4 * h
    chopped = bytearray(good[: len(good) - (8 + fsize)])
    _s.pack_into("<I", chopped, 4, len(chopped) - 8)
    _s.pack_into("<I", chopped, 216, 4 + (n - 1) * (8 + fsize))
    with pytest.raises(ValueError, match="frame count mismatch"):
        decode_avi(bytes(chopped))


def test_audio_spectrum_matches_independent_fft(spark, sf_dir):
    """audio_spectrum decodes REAL WAV bytes then FFTs; the expected values
    are recomputed here from the closed-form sample generator (never the
    bytes), so agreement proves decode + DSP end-to-end."""
    import numpy as np

    from cdc_debezium_kafka_airflow_spark.operators.multimodal import (
        attach_media,
        audio_spectrum,
        wav_spec,
        _wav_sample,
    )
    from cdc_debezium_kafka_airflow_spark.sources.tables import load_table

    d = load_table(spark, sf_dir, "documents").limit(60)
    got = {r.doc_id: r for r in audio_spectrum(attach_media(d)).collect()}
    assert got, "no audio docs in the sample"
    for doc_id, r in got.items():
        assert doc_id % 3 == 1  # audio modality only
        rate, n = wav_spec(doc_id)
        samples = np.array(
            [_wav_sample(doc_id, i) for i in range(n)], dtype=np.float64
        )
        spec = np.abs(np.fft.rfft(samples))
        k = int(spec[1:].argmax()) + 1
        assert r.dominant_bin == k
        assert r.dominant_freq_hz == round(k * rate / n, 6)
        assert r.spectral_energy == round(float((spec**2).sum() / n), 4)


def test_bmp_decoder_rejects_arbitrary_bytes():
    """Codec robustness: arbitrary byte soup must raise a clean ValueError
    (or parse, for byte strings that happen to be valid) — never crash with
    an unhandled struct/index error. Poison payloads at 100 TB are a
    certainty; the decode stage's failure mode must be catchable so the
    DLQ split can route them."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from cdc_debezium_kafka_airflow_spark.operators.multimodal import (
        decode_bmp,
        decode_bmp_pixels,
        decode_wav,
    )

    @settings(max_examples=200, deadline=None)
    @given(st.binary(min_size=0, max_size=200))
    def fuzz(payload):
        for fn in (decode_bmp, decode_bmp_pixels, decode_wav):
            try:
                fn(payload)
            except (ValueError, struct_error):
                pass  # clean, catchable rejection

    import struct

    struct_error = struct.error
    fuzz()


def test_bmp_decoder_rejects_truncated_real_payload():
    """Truncations of a VALID payload (the realistic corruption) must also
    fail cleanly at every cut point."""
    import struct

    from cdc_debezium_kafka_airflow_spark.operators.multimodal import (
        decode_bmp,
        decode_bmp_pixels,
        decode_wav,
        render_bmp,
        render_wav,
    )

    bmp, wav = render_bmp(42), render_wav(43)
    # any cut strictly inside the pixel data MUST raise (a silent short
    # read would produce a wrong mean) — and full payloads must parse
    for cut in range(0, len(bmp)):
        for fn in (decode_bmp, decode_bmp_pixels):
            try:
                fn(bmp[:cut])
                assert cut >= len(bmp) - 3, (cut, len(bmp))  # padding only
            except (ValueError, struct.error, IndexError):
                pass
    assert decode_bmp(bmp)[2] == decode_bmp(bytes(bmp))[2]
    for cut in range(0, len(wav), 3):
        try:
            decode_wav(wav[:cut])
            assert cut == len(wav)
        except (ValueError, struct.error, IndexError):
            pass
    assert decode_wav(wav)[1] > 0


def test_audio_fingerprint_volume_invariant(spark):
    """The Chromaprint-style sign-bit code must survive volume scaling:
    halving every PCM sample scales all window energies together, so no
    energy comparison flips and the fingerprint is unchanged."""
    import struct as _struct

    from cdc_debezium_kafka_airflow_spark.operators.multimodal import (
        audio_band_energies,
        render_wav,
        _wav_pcm_samples,
    )

    def rescale(data: bytes, factor: int) -> bytes:
        rate, samples = _wav_pcm_samples(data)
        scaled = [int(s) * factor for s in samples]  # ±2048 * 2 fits int16
        pcm = _struct.pack(f"<{len(scaled)}h", *scaled)
        fmt = _struct.pack("<HHIIHH", 1, 1, rate, rate * 2, 2, 16)
        body = b"WAVE" + b"fmt " + _struct.pack("<I", len(fmt)) + fmt
        body += b"data" + _struct.pack("<I", len(pcm)) + pcm
        return b"RIFF" + _struct.pack("<I", len(body)) + body

    rows = []
    for doc_id in (1, 4, 7, 10):
        full = render_wav(doc_id)
        rows.append((doc_id, "audio", bytearray(full)))
        rows.append((doc_id + 1000, "audio", bytearray(rescale(full, 2))))
    media = spark.createDataFrame(
        rows, "doc_id long, media_type string, media_bytes binary"
    )
    en = {r.doc_id: r for r in audio_band_energies(media).collect()}

    def fp(r):
        return (
            4 * (r.e1 > r.e0) + 2 * (r.e2 > r.e1) + (r.e3 > r.e2)
        )

    for doc_id in (1, 4, 7, 10):
        assert fp(en[doc_id]) == fp(en[doc_id + 1000]), doc_id
        # volume really changed: doubled samples -> exactly 4x the energy
        assert en[doc_id + 1000].e0 == 4 * en[doc_id].e0


def test_video_frame_sums_rejects_poison(spark):
    """Truncated AVI containers must raise loudly through the frame-sum
    walker, same contract as decode_avi."""
    from cdc_debezium_kafka_airflow_spark.operators.multimodal import (
        render_avi,
        video_frame_sums,
    )

    good = render_avi(2)
    media = spark.createDataFrame(
        [(2, "video", bytearray(good[: len(good) - 10]))],
        "doc_id long, media_type string, media_bytes binary",
    )
    with pytest.raises(Exception, match="truncated|mismatch"):
        video_frame_sums(media).collect()
