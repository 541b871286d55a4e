"""Multimodal columns: image/audio/video as opaque ``binary`` columns with
typed metadata, processed by Arrow-batched ``mapInPandas``.

The image/audio decode libraries are NOT available in this container, so the
actual decode step is STUBBED behind ``_decode_stub`` (clearly marked, raises
``NotImplementedError`` when a real decode is requested); the Spark-side
plumbing — binary column schema, metadata struct, Arrow batch shape, UDF
signature, partition-preserving mapInPandas — is real and tested.

Scale notes: media bytes stay opaque until the last possible stage (no JVM<->
Python crossing for rows that filters drop earlier); `mapInPandas` streams
Arrow record batches so peak memory is one batch, not one partition; at 100 TB
the media column would live in its own parquet column chunk, column-pruned
away from every query that doesn't touch it.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, functions as F

MEDIA_TYPES = ["image", "audio", "video"]

FEATURE_SCHEMA = (
    "doc_id long, media_type string, n_bytes long, checksum_mod long"
)


def attach_media(documents: DataFrame) -> DataFrame:
    """Attach a synthetic opaque media column + typed metadata to documents.

    media_bytes = utf-8 bytes of the text (deterministic stand-in for real
    image/audio payloads); media_type cycles by doc_id; metadata mirrors the
    (width, height, duration) style sidecar a real pipeline carries.
    """
    mt = F.element_at(
        F.array(*[F.lit(m) for m in MEDIA_TYPES]),
        (F.col("doc_id") % 3 + 1).cast("int"),
    )
    return documents.select(
        "doc_id",
        mt.alias("media_type"),
        F.encode(F.col("text"), "UTF-8").alias("media_bytes"),
        F.struct(
            (F.col("n_chars") % 1920).cast("int").alias("width"),
            (F.col("n_chars") % 1080).cast("int").alias("height"),
            (F.col("n_chars") / 100.0).alias("duration_s"),
        ).alias("media_meta"),
    )


def _decode_stub(media_type: str, data: bytes, real_decode: bool = False):
    """STUB for the real decoder (PIL/librosa/ffmpeg are not installed).

    Returns deterministic fake features: (n_bytes, checksum_mod). A real
    deployment replaces this body with the actual decode + feature extract.
    """
    if real_decode:
        raise NotImplementedError(
            "media decode libraries are not available in this environment; "
            "plug a real decoder in here"
        )
    return len(data), sum(data[:64]) % 997


def extract_media_features(media: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over the opaque media column."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats = [
                _decode_stub(mt, bytes(data))
                for mt, data in zip(pdf["media_type"], pdf["media_bytes"])
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": [f[0] for f in feats],
                    "checksum_mod": [f[1] for f in feats],
                }
            )

    return media.select("doc_id", "media_type", "media_bytes").mapInPandas(
        batches, FEATURE_SCHEMA
    )
