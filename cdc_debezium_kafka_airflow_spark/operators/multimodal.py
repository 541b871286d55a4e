"""Multimodal columns: image/audio/video as opaque ``binary`` columns with
typed metadata, processed by Arrow-batched ``mapInPandas``.

The IMAGE and AUDIO paths are real end-to-end with no external libraries:
image-typed docs carry an actual 24-bpp BMP payload (rendered
deterministically from the doc id at attach time) and the feature stage
PARSES the BMP — file header, BITMAPINFOHEADER, bottom-up padded pixel rows —
to recover width/height and the mean pixel value; audio-typed docs carry a
real RIFF/WAVE 16-bit mono PCM payload and the feature stage walks the RIFF
chunk list (fmt + data) to recover sample rate, sample count, and mean
absolute amplitude. Video codecs are NOT available in this container, so
video keeps deterministic byte-level features (``_decode_stub``, clearly
marked; raises only when a true codec decode is explicitly requested — never
on the default path).

Scale notes: media bytes stay opaque until the last possible stage (no JVM<->
Python crossing for rows that filters drop earlier); `mapInPandas` streams
Arrow record batches so peak memory is one batch, not one partition; at 100 TB
the media column would live in its own parquet column chunk, column-pruned
away from every query that doesn't touch it.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, functions as F

MEDIA_TYPES = ["image", "audio", "video"]

MEDIA_SCHEMA = (
    "doc_id long, media_type string, media_bytes binary, "
    "media_meta struct<width:int, height:int, duration_s:double>"
)

FEATURE_SCHEMA = (
    "doc_id long, media_type string, n_bytes long, checksum_mod long, "
    "width int, height int, mean_pixel double, "
    "sample_rate int, n_samples int, mean_abs_amp double"
)


def bmp_dims(doc_id: int) -> tuple[int, int]:
    """Deterministic tiny image dims per doc (4..8 x 3..6)."""
    return 4 + doc_id % 5, 3 + doc_id % 4


def _pixel(doc_id: int, x: int, y: int) -> int:
    return (doc_id * 31 + 7 * x + 13 * y) % 256


def render_bmp(doc_id: int) -> bytes:
    """A real, spec-conformant 24-bpp BMP (BITMAPINFOHEADER, bottom-up rows,
    4-byte row padding), with pixel (x, y) = (doc_id*31 + 7x + 13y) % 256 in
    all three channels — closed-form content the SQL oracle can predict."""
    w, h = bmp_dims(doc_id)
    row_size = (3 * w + 3) // 4 * 4
    data_size = row_size * h
    header = struct.pack("<2sIHHI", b"BM", 54 + data_size, 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, data_size, 2835, 2835, 0, 0)
    rows = bytearray()
    for y in range(h - 1, -1, -1):  # bottom-up storage order
        row = bytearray()
        for x in range(w):
            v = _pixel(doc_id, x, y)
            row += bytes((v, v, v))  # B, G, R
        row += b"\x00" * (row_size - len(row))
        rows += row
    return header + info + bytes(rows)


def decode_bmp(data: bytes) -> tuple[int, int, float]:
    """REAL BMP decode (no external libs): parse the file header and
    BITMAPINFOHEADER, walk the bottom-up padded pixel rows, return
    (width, height, mean pixel value over all channel bytes)."""
    magic, _file_size, _r1, _r2, offset = struct.unpack_from("<2sIHHI", data, 0)
    if magic != b"BM":
        raise ValueError("not a BMP payload")
    hdr_size, w, h, _planes, bpp = struct.unpack_from("<IiiHH", data, 14)
    if hdr_size < 40 or bpp != 24:
        raise ValueError(f"unsupported BMP variant (hdr={hdr_size}, bpp={bpp})")
    flipped = h < 0  # negative height = top-down storage
    h = abs(h)
    row_size = (3 * w + 3) // 4 * 4
    # truncation guard: a short payload would otherwise yield short row
    # slices and a silently WRONG mean (Python slicing never raises) —
    # poison must be catchable, not quiet
    if w <= 0 or h <= 0 or len(data) < offset + (h - 1) * row_size + 3 * w:
        raise ValueError("truncated or empty BMP pixel data")
    total = 0
    for row_i in range(h):
        base = offset + row_i * row_size
        px = data[base : base + 3 * w]
        total += sum(px)
    _ = flipped  # mean is row-order invariant; kept for parity with spec
    return w, h, total / (3 * w * h)


def wav_spec(doc_id: int) -> tuple[int, int]:
    """Deterministic (sample_rate, n_samples) per audio doc."""
    return (8000, 16000)[doc_id % 2], 40 + doc_id % 57


def _wav_sample(doc_id: int, i: int) -> int:
    """Closed-form int16 PCM sample the SQL oracle can predict."""
    return (doc_id * 37 + 17 * i) % 4096 - 2048


def render_wav(doc_id: int) -> bytes:
    """A real, spec-conformant RIFF/WAVE file: 'fmt ' chunk declaring 16-bit
    mono PCM, then a 'data' chunk of little-endian int16 samples."""
    rate, n = wav_spec(doc_id)
    data = struct.pack(f"<{n}h", *(_wav_sample(doc_id, i) for i in range(n)))
    fmt = struct.pack("<HHIIHH", 1, 1, rate, rate * 2, 2, 16)
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(data: bytes) -> tuple[int, int, float]:
    """REAL WAV decode (no external libs): verify the RIFF/WAVE magic, walk
    the chunk list to the 'fmt ' and 'data' chunks, require 16-bit mono PCM,
    return (sample_rate, n_samples, mean absolute sample amplitude)."""
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, rate, samples = 12, None, None
    while pos + 8 <= len(data):
        cid, size = data[pos : pos + 4], struct.unpack_from("<I", data, pos + 4)[0]
        body = data[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            audio_fmt, channels, rate, _br, _ba, bits = struct.unpack_from(
                "<HHIIHH", body, 0
            )
            if (audio_fmt, channels, bits) != (1, 1, 16):
                raise ValueError(
                    f"unsupported WAV variant (fmt={audio_fmt}, "
                    f"ch={channels}, bits={bits})"
                )
        elif cid == b"data":
            samples = struct.unpack(f"<{size // 2}h", body[: size // 2 * 2])
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if rate is None or samples is None:
        raise ValueError("missing fmt/data chunk")
    n = len(samples)
    return rate, n, sum(abs(s) for s in samples) / n


def _wav_pcm_samples(data: bytes):
    """Shared RIFF chunk walk for the numpy DSP paths: validate the
    container, return (sample_rate, samples as float64 ndarray). The single
    implementation transform_media and audio_spectrum both use — the
    chunk-alignment rules live in exactly one place (decode_wav remains the
    per-sample reference decoder whose mean the oracle checks)."""
    import numpy as np

    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, rate, samples = 12, None, None
    while pos + 8 <= len(data):
        cid = data[pos : pos + 4]
        size = struct.unpack_from("<I", data, pos + 4)[0]
        body = data[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            audio_fmt, channels, rate, _br, _ba, bits = struct.unpack_from(
                "<HHIIHH", body, 0
            )
            if (audio_fmt, channels, bits) != (1, 1, 16):
                raise ValueError(
                    f"unsupported WAV variant (fmt={audio_fmt}, "
                    f"ch={channels}, bits={bits})"
                )
        elif cid == b"data":
            samples = np.frombuffer(
                body[: size // 2 * 2], dtype="<i2"
            ).astype(np.float64)
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if rate is None or samples is None:
        raise ValueError("missing fmt/data chunk")
    return rate, samples


def attach_media(documents: DataFrame) -> DataFrame:
    """Attach an opaque media column + typed metadata to documents.

    image-typed docs (doc_id % 3 == 0) get a REAL rendered BMP payload;
    audio-typed docs (doc_id % 3 == 1) a REAL RIFF/WAVE 16-bit PCM payload;
    video gets utf-8 text bytes (deterministic stand-in — no video encoder
    exists in this container). Rendering happens in an Arrow-batched
    mapInPandas stage, the same ingest-side shape a real pipeline uses to
    attach binary payloads.
    """
    src = documents.select("doc_id", "text", "n_chars")

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {
                "doc_id": [],
                "media_type": [],
                "media_bytes": [],
                "media_meta": [],
            }
            for doc_id, text, n_chars in zip(
                pdf["doc_id"], pdf["text"], pdf["n_chars"]
            ):
                doc_id = int(doc_id)
                mtype = MEDIA_TYPES[doc_id % 3]
                if mtype == "image":
                    payload = render_bmp(doc_id)
                    w, h = bmp_dims(doc_id)
                    meta = {
                        "width": w,
                        "height": h,
                        "duration_s": 0.0,
                    }
                elif mtype == "audio":
                    payload = render_wav(doc_id)
                    rate, n = wav_spec(doc_id)
                    meta = {
                        "width": 0,
                        "height": 0,
                        "duration_s": n / rate,
                    }
                else:
                    payload = str(text).encode("utf-8")
                    meta = {
                        "width": int(n_chars) % 1920,
                        "height": int(n_chars) % 1080,
                        "duration_s": int(n_chars) / 100.0,
                    }
                out["doc_id"].append(doc_id)
                out["media_type"].append(mtype)
                out["media_bytes"].append(payload)
                out["media_meta"].append(meta)
            yield pd.DataFrame(out)

    return src.mapInPandas(batches, MEDIA_SCHEMA)


def _decode_stub(media_type: str, data: bytes, real_decode: bool = False):
    """STUB for the video decoder (ffmpeg is not installed).

    Returns deterministic byte-level features: (n_bytes, checksum_mod). A
    real deployment replaces this body with the actual codec decode +
    feature extract. Never raises on the default path — only when a true
    codec decode is explicitly requested."""
    if real_decode:
        raise NotImplementedError(
            "video decode libraries are not available in this "
            "environment; plug a real decoder in here"
        )
    return len(data), sum(data[:64]) % 997


def extract_media_features(media: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over the opaque media column.

    image rows: REAL BMP parse -> (width, height, mean_pixel).
    audio rows: REAL WAV parse -> (sample_rate, n_samples, mean_abs_amp).
    video rows: byte-level stub features; other modality fields NULL.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = {
                "doc_id": pdf["doc_id"],
                "media_type": pdf["media_type"],
                "n_bytes": [],
                "checksum_mod": [],
                "width": [],
                "height": [],
                "mean_pixel": [],
                "sample_rate": [],
                "n_samples": [],
                "mean_abs_amp": [],
            }
            for mt, data in zip(pdf["media_type"], pdf["media_bytes"]):
                data = bytes(data)
                rows["n_bytes"].append(len(data))
                # means left unrounded: the division operands (exact ints)
                # are identical in the SQL oracle, so the IEEE results are
                # bit-identical with no rounding convention involved
                chk = w = h = mean = rate = n = amp = None
                if mt == "image":
                    w, h, mean = decode_bmp(data)
                elif mt == "audio":
                    rate, n, amp = decode_wav(data)
                else:
                    _, chk = _decode_stub(mt, data)
                rows["checksum_mod"].append(chk)
                rows["width"].append(w)
                rows["height"].append(h)
                rows["mean_pixel"].append(mean)
                rows["sample_rate"].append(rate)
                rows["n_samples"].append(n)
                rows["mean_abs_amp"].append(amp)
            yield pd.DataFrame(rows)

    return media.select("doc_id", "media_type", "media_bytes").mapInPandas(
        batches, FEATURE_SCHEMA
    )


TRANSFORM_SCHEMA = (
    "doc_id long, media_type string, "
    "q00 double, q01 double, q10 double, q11 double, "
    "zero_crossings int, rms double"
)


def transform_media(media: DataFrame, thumb: int = 2) -> DataFrame:
    """Second-stage multimodal transform over DECODED payloads (the
    decode -> resize / decode -> DSP pipeline shape):

    image rows: real BMP decode, then nearest-neighbor resample to a
    ``thumb`` x ``thumb`` grayscale thumbnail — output cell (x, y) samples
    source pixel (x*w//thumb, y*h//thumb); emitted as q00..q11 doubles.
    audio rows: real WAV decode, then zero-crossing count (negative-flag
    changes between consecutive samples) and RMS amplitude (rounded 6).
    video rows are excluded (decode is the documented stub).

    Every output is predictable in closed form from the deterministic
    generators, so the DuckDB oracle re-derives them ANALYTICALLY — a hash
    match proves the byte-level decode + transform round-trip, not just the
    arithmetic."""
    import numpy as np

    if thumb != 2:
        # the output schema (q00..q11) is the 2x2 contract; a different
        # grid needs a schema derived from `thumb`, not a silent subset
        raise ValueError("transform_media emits a fixed 2x2 thumbnail")

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {
                "doc_id": [], "media_type": [],
                "q00": [], "q01": [], "q10": [], "q11": [],
                "zero_crossings": [], "rms": [],
            }
            for doc_id, mt, data in zip(
                pdf["doc_id"], pdf["media_type"], pdf["media_bytes"]
            ):
                if mt == "video":
                    continue
                data = bytes(data)
                q = [[None] * thumb for _ in range(thumb)]
                zc = rms = None
                if mt == "image":
                    w, h, _ = decode_bmp(data)
                    # re-walk the pixel rows for the sampled cells only;
                    # honor the storage direction decode_bmp accepts:
                    # negative biHeight = top-down rows
                    offset = struct.unpack_from("<I", data, 10)[0]
                    raw_h = struct.unpack_from("<i", data, 22)[0]
                    top_down = raw_h < 0
                    row_size = (3 * w + 3) // 4 * 4
                    for ty in range(thumb):
                        for tx in range(thumb):
                            sx, sy = tx * w // thumb, ty * h // thumb
                            file_row = sy if top_down else h - 1 - sy
                            base = offset + file_row * row_size + 3 * sx
                            q[ty][tx] = float(data[base])
                elif mt == "audio":
                    _, samples = _wav_pcm_samples(data)
                    neg = samples < 0
                    zc = int((neg[1:] != neg[:-1]).sum())
                    rms = round(float(np.sqrt((samples**2).mean())), 6)
                out["doc_id"].append(int(doc_id))
                out["media_type"].append(mt)
                out["q00"].append(q[0][0])
                out["q01"].append(q[0][1])
                out["q10"].append(q[1][0])
                out["q11"].append(q[1][1])
                out["zero_crossings"].append(zc)
                out["rms"].append(rms)
            yield pd.DataFrame(out)

    return media.select("doc_id", "media_type", "media_bytes").mapInPandas(
        batches, TRANSFORM_SCHEMA
    )


def audio_spectrum(media: DataFrame) -> DataFrame:
    """FFT features over decoded audio (engine-only — no SQL FFT exists, so
    this is pytest-verified against an independent numpy recompute):
    dominant non-DC rfft bin, its frequency in Hz, and total spectral
    energy. The real decode -> DSP -> feature shape for audio curation
    (silence/tone detection, bandwidth stats)."""
    import numpy as np

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {
                "doc_id": [], "dominant_bin": [],
                "dominant_freq_hz": [], "spectral_energy": [],
            }
            for doc_id, mt, data in zip(
                pdf["doc_id"], pdf["media_type"], pdf["media_bytes"]
            ):
                if mt != "audio":
                    continue
                rate, samples = _wav_pcm_samples(bytes(data))
                n = len(samples)
                spec = np.abs(np.fft.rfft(samples))
                k = int(spec[1:].argmax()) + 1  # skip DC
                out["doc_id"].append(int(doc_id))
                out["dominant_bin"].append(k)
                out["dominant_freq_hz"].append(round(k * rate / n, 6))
                out["spectral_energy"].append(
                    round(float((spec**2).sum() / n), 4)
                )
            yield pd.DataFrame(out)

    return media.select("doc_id", "media_type", "media_bytes").mapInPandas(
        batches,
        "doc_id long, dominant_bin int, dominant_freq_hz double, "
        "spectral_energy double",
    )


def decode_bmp_pixels(data: bytes) -> tuple[int, int, list]:
    """REAL BMP pixel decode (no external libs): returns (w, h, rows) where
    rows[y][x] is the gray value at image coordinate (x, y) — the padded
    bottom-up storage rows are re-flipped into image order."""
    magic, _file_size, _r1, _r2, offset = struct.unpack_from("<2sIHHI", data, 0)
    if magic != b"BM":
        raise ValueError("not a BMP payload")
    hdr_size, w, h, _planes, bpp = struct.unpack_from("<IiiHH", data, 14)
    if hdr_size < 40 or bpp != 24:
        raise ValueError(f"unsupported BMP variant (hdr={hdr_size}, bpp={bpp})")
    top_down = h < 0
    h = abs(h)
    row_size = (3 * w + 3) // 4 * 4
    if w <= 0 or h <= 0 or len(data) < offset + (h - 1) * row_size + 3 * w:
        raise ValueError("truncated or empty BMP pixel data")
    rows = []
    for row_i in range(h):
        base = offset + row_i * row_size
        rows.append([data[base + 3 * x] for x in range(w)])  # B == G == R
    if not top_down:
        rows.reverse()  # bottom-up storage -> image order
    return w, h, rows


def image_ahash(media: DataFrame, grid: int = 4) -> DataFrame:
    """Perceptual average-hash (aHash) per image: decode the REAL BMP
    payload, block-mean the pixels down to a grid x grid thumbnail, set
    bit (by*grid+bx) when the block mean exceeds the global mean — the
    standard near-duplicate image fingerprint (pHash family). Identical
    renders collapse to one hash; small perturbations flip few bits, so
    Hamming-radius grouping finds near-dups without any pairwise compare.

    Scale posture: pure map-side Arrow-batched decode+hash (no shuffle
    here); the caller's groupBy(ahash) is the only exchange and the hash
    is the storage bucketing key at 100 TB. Block/global means are exact
    integer-sum/count doubles, so the SQL oracle reproduces every bit
    from the closed-form pixel content (render_bmp's formula)."""
    src = media.filter(F.col("media_type") == "image").select(
        "doc_id", "media_bytes"
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, hashes = [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["media_bytes"]):
                w, h, rows = decode_bmp_pixels(bytes(payload))
                sums = [[0] * grid for _ in range(grid)]
                counts = [[0] * grid for _ in range(grid)]
                total = 0
                for y in range(h):
                    by = (y * grid) // h
                    for x in range(w):
                        bx = (x * grid) // w
                        v = rows[y][x]
                        sums[by][bx] += v
                        counts[by][bx] += 1
                        total += v
                g = total / (w * h)
                ahash = 0
                for by in range(grid):
                    for bx in range(grid):
                        if counts[by][bx] and sums[by][bx] / counts[by][bx] > g:
                            ahash |= 1 << (by * grid + bx)
                ids.append(int(doc_id))
                hashes.append(ahash)
            yield pd.DataFrame({"doc_id": ids, "ahash": hashes})

    return src.mapInPandas(batches, "doc_id long, ahash long")
