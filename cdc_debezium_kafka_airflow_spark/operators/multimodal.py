"""Multimodal columns: image/audio/video as opaque ``binary`` columns with
typed metadata, processed by Arrow-batched ``mapInPandas``.

The IMAGE and AUDIO paths are real end-to-end with no external libraries:
image-typed docs carry an actual 24-bpp BMP payload (rendered
deterministically from the doc id at attach time) and the feature stage
PARSES the BMP — file header, BITMAPINFOHEADER, bottom-up padded pixel rows —
to recover width/height and the mean pixel value; audio-typed docs carry a
real RIFF/WAVE 16-bit mono PCM payload and the feature stage walks the RIFF
chunk list (fmt + data) to recover sample rate, sample count, and mean
absolute amplitude. VIDEO is real at the same level: video-typed docs carry
an actual uncompressed RIFF/AVI container (hdrl with avih/strh/strf headers,
movi list of raw-DIB ``00db`` frame chunks — the 'DIB ' fourcc is the
codec-free AVI flavor, so no codec library is needed) and the feature stage
walks the container to recover width/height/frame-count/fps and the mean
pixel over all frames. Compressed codecs (H.264 etc.) remain out of scope —
that would need ffmpeg — but the container decode, frame extraction, and
frame-sampling plumbing are the real article.

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
    "doc_id long, media_type string, n_bytes long, "
    "width int, height int, mean_pixel double, "
    "sample_rate int, n_samples int, mean_abs_amp double, "
    "n_frames int, fps double"
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


AVI_FPS = 10


def avi_spec(doc_id: int) -> tuple[int, int, int]:
    """Deterministic (width, height, n_frames) per video doc."""
    return 4 + doc_id % 4, 3 + doc_id % 3, 3 + doc_id % 4


def _avi_pixel(doc_id: int, f: int, x: int, y: int) -> int:
    """Closed-form frame pixel the SQL oracle can predict."""
    return (doc_id * 31 + 7 * x + 13 * y + 19 * f) % 256


def _avi_frame_bytes(doc_id: int, f: int, w: int, h: int) -> bytes:
    """One raw-DIB frame: bottom-up BGR rows, 4-byte row padding (the exact
    BMP pixel-array layout, which is what AVI 'DIB ' frames carry)."""
    row_size = (3 * w + 3) // 4 * 4
    rows = bytearray()
    for y in range(h - 1, -1, -1):
        row = bytearray()
        for x in range(w):
            v = _avi_pixel(doc_id, f, x, y)
            row += bytes((v, v, v))
        row += b"\x00" * (row_size - len(row))
        rows += row
    return bytes(rows)


def render_avi(doc_id: int) -> bytes:
    """A real, spec-conformant uncompressed RIFF/AVI container: LIST hdrl
    (avih MainAVIHeader + one LIST strl with strh 'vids'/'DIB ' and strf =
    BITMAPINFOHEADER), then LIST movi holding one '00db' (uncompressed DIB)
    chunk per frame. 'DIB ' is the codec-free AVI flavor — every byte here
    is plain container structure + raw pixels, no encoder involved."""
    w, h, n = avi_spec(doc_id)
    row_size = (3 * w + 3) // 4 * 4
    fsize = row_size * h  # multiple of 4 -> chunks need no odd-byte pad

    strf = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, fsize, 2835, 2835, 0, 0
    )
    strh = (
        b"vids"
        + b"DIB "
        + struct.pack("<IHHiIIIIIIi", 0, 0, 0, 0, 1, AVI_FPS, 0, n, fsize, 0, -1)
        + struct.pack("<4h", 0, 0, w, h)
    )
    strl = b"LIST" + struct.pack("<I", 4 + 8 + len(strh) + 8 + len(strf))
    strl += b"strl" + b"strh" + struct.pack("<I", len(strh)) + strh
    strl += b"strf" + struct.pack("<I", len(strf)) + strf

    avih = struct.pack(
        "<IIIIIIIIIIIIII",
        1_000_000 // AVI_FPS,  # microseconds per frame
        0, 0, 0, n, 0, 1, fsize, w, h, 0, 0, 0, 0,
    )
    hdrl = b"LIST" + struct.pack("<I", 4 + 8 + len(avih) + len(strl))
    hdrl += b"hdrl" + b"avih" + struct.pack("<I", len(avih)) + avih + strl

    movi_body = b"movi"
    for f in range(n):
        movi_body += b"00db" + struct.pack("<I", fsize)
        movi_body += _avi_frame_bytes(doc_id, f, w, h)
    movi = b"LIST" + struct.pack("<I", len(movi_body)) + movi_body

    body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_avi(data: bytes) -> tuple[int, int, int, float, float]:
    """REAL AVI container decode (no external libs): verify the RIFF/'AVI '
    magic, walk the chunk tree to the avih MainAVIHeader (frame count, fps,
    dimensions) and the movi list, then parse every raw-DIB '00db' frame
    chunk (bottom-up padded rows) to accumulate the pixel mean. Returns
    (width, height, n_frames, fps, mean_pixel). Truncated or structurally
    inconsistent containers raise — poison must be loud."""
    if data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI payload")
    w = h = n_declared = None
    fps = None
    total = 0
    n_pixel_bytes = 0
    n_frames = 0
    pos = 12
    end = 8 + struct.unpack_from("<I", data, 4)[0]
    if end > len(data):
        raise ValueError("truncated AVI container")

    def walk(pos: int, end: int):
        nonlocal w, h, n_declared, fps, total, n_pixel_bytes, n_frames
        while pos + 8 <= end:
            cid = data[pos : pos + 4]
            size = struct.unpack_from("<I", data, pos + 4)[0]
            body_start = pos + 8
            if body_start + size > end:
                raise ValueError("truncated AVI chunk")
            if cid == b"LIST":
                walk(body_start + 4, body_start + size)
            elif cid == b"avih":
                us_per_frame, *_rest = struct.unpack_from("<I", data, body_start)
                n_declared = struct.unpack_from("<I", data, body_start + 16)[0]
                w = struct.unpack_from("<I", data, body_start + 32)[0]
                h = struct.unpack_from("<I", data, body_start + 36)[0]
                fps = 1_000_000 / us_per_frame
            elif cid == b"00db":
                if w is None:
                    raise ValueError("frame chunk before avih header")
                row_size = (3 * w + 3) // 4 * 4
                if size != row_size * h:
                    raise ValueError("frame size disagrees with avih dims")
                for row_i in range(h):
                    base = body_start + row_i * row_size
                    total += sum(data[base : base + 3 * w])
                n_pixel_bytes += 3 * w * h
                n_frames += 1
            pos = body_start + size + (size & 1)  # RIFF odd-size padding

    walk(pos, end)
    if n_declared is None or n_frames != n_declared:
        raise ValueError(
            f"frame count mismatch: header {n_declared}, movi {n_frames}"
        )
    return w, h, n_frames, fps, total / n_pixel_bytes


def attach_media(documents: DataFrame) -> DataFrame:
    """Attach an opaque media column + typed metadata to documents.

    image-typed docs (doc_id % 3 == 0) get a REAL rendered BMP payload;
    audio-typed docs (doc_id % 3 == 1) a REAL RIFF/WAVE 16-bit PCM payload;
    video-typed docs (doc_id % 3 == 2) a REAL uncompressed RIFF/AVI
    container of raw-DIB frames. Rendering happens in an Arrow-batched
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
                    payload = render_avi(doc_id)
                    w, h, n = avi_spec(doc_id)
                    meta = {
                        "width": w,
                        "height": h,
                        "duration_s": n / AVI_FPS,
                    }
                out["doc_id"].append(doc_id)
                out["media_type"].append(mtype)
                out["media_bytes"].append(payload)
                out["media_meta"].append(meta)
            yield pd.DataFrame(out)

    return src.mapInPandas(batches, MEDIA_SCHEMA)


def extract_media_features(media: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over the opaque media column.

    image rows: REAL BMP parse -> (width, height, mean_pixel).
    audio rows: REAL WAV parse -> (sample_rate, n_samples, mean_abs_amp).
    video rows: REAL AVI container parse -> (width, height, n_frames, fps,
    mean_pixel over all frames). Other modality fields NULL.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = {
                "doc_id": pdf["doc_id"],
                "media_type": pdf["media_type"],
                "n_bytes": [],
                "width": [],
                "height": [],
                "mean_pixel": [],
                "sample_rate": [],
                "n_samples": [],
                "mean_abs_amp": [],
                "n_frames": [],
                "fps": [],
            }
            for mt, data in zip(pdf["media_type"], pdf["media_bytes"]):
                data = bytes(data)
                rows["n_bytes"].append(len(data))
                # means left unrounded: the division operands (exact ints)
                # are identical in the SQL oracle, so the IEEE results are
                # bit-identical with no rounding convention involved
                w = h = mean = rate = n = amp = nf = fps = None
                if mt == "image":
                    w, h, mean = decode_bmp(data)
                elif mt == "audio":
                    rate, n, amp = decode_wav(data)
                else:
                    w, h, nf, fps, mean = decode_avi(data)
                rows["width"].append(w)
                rows["height"].append(h)
                rows["mean_pixel"].append(mean)
                rows["sample_rate"].append(rate)
                rows["n_samples"].append(n)
                rows["mean_abs_amp"].append(amp)
                rows["n_frames"].append(nf)
                rows["fps"].append(fps)
            yield pd.DataFrame(rows)

    return media.select("doc_id", "media_type", "media_bytes").mapInPandas(
        batches, FEATURE_SCHEMA
    )


TRANSFORM_SCHEMA = (
    "doc_id long, media_type string, "
    "q00 double, q01 double, q10 double, q11 double, "
    "zero_crossings int, rms double"
)


def _avi_middle_frame(data: bytes) -> tuple[int, int, bytes]:
    """Walk the real AVI container to the middle '00db' frame chunk and
    return (width, height, raw frame payload) — frame sampling without
    decoding every frame (each chunk is skipped by its declared size)."""
    w, h, n, _fps, _mean = decode_avi(data)  # validates structure
    target = n // 2
    seen = 0
    pos, end = 12, 8 + struct.unpack_from("<I", data, 4)[0]
    stack = [(pos, end)]
    while stack:
        pos, end = stack.pop()
        while pos + 8 <= end:
            cid = data[pos : pos + 4]
            size = struct.unpack_from("<I", data, pos + 4)[0]
            body = pos + 8
            if cid == b"LIST":
                stack.append((body + size + (size & 1), end))
                pos, end = body + 4, body + size
                continue
            if cid == b"00db":
                if seen == target:
                    return w, h, data[body : body + size]
                seen += 1
            pos = body + size + (size & 1)
    raise ValueError("middle frame not found")


def transform_media(media: DataFrame, thumb: int = 2) -> DataFrame:
    """Second-stage multimodal transform over DECODED payloads (the
    decode -> resize / decode -> DSP pipeline shape):

    image rows: real BMP decode, then nearest-neighbor resample to a
    ``thumb`` x ``thumb`` grayscale thumbnail — output cell (x, y) samples
    source pixel (x*w//thumb, y*h//thumb); emitted as q00..q11 doubles.
    audio rows: real WAV decode, then zero-crossing count (negative-flag
    changes between consecutive samples) and RMS amplitude (rounded 6).
    video rows: FRAME SAMPLING — the middle '00db' frame is located by
    walking the real AVI container, then thumbnailed exactly like the
    image path (the decode -> frame-sample -> resize pipeline).

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
                data = bytes(data)
                q = [[None] * thumb for _ in range(thumb)]
                zc = rms = None
                if mt == "video":
                    w, h, payload = _avi_middle_frame(data)
                    row_size = (3 * w + 3) // 4 * 4
                    for ty in range(thumb):
                        for tx in range(thumb):
                            sx, sy = tx * w // thumb, ty * h // thumb
                            base = (h - 1 - sy) * row_size + 3 * sx
                            q[ty][tx] = float(payload[base])
                elif mt == "image":
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


def audio_band_energies(media: DataFrame, n_windows: int = 4) -> DataFrame:
    """Per-window signal energies from the REAL WAV decode — the raw
    material of a Philips-robust-hash / Chromaprint style fingerprint
    (those derive sign bits from energy DIFFERENCES between adjacent
    bands; here the bands are equal time windows so the energies stay
    exact integers a SQL oracle can recompute — the FFT twin lives in
    audio_spectrum, pytest-verified, since no SQL FFT exists).

    Window w covers sample indices i with (n_windows*i)//n == w; energy is
    the exact integer sum of squared int16 samples — order-independent,
    so the oracle's aggregation order cannot diverge. Arrow-batched
    mapInPandas; emits one row per audio doc with n_windows energy columns.
    """
    import numpy as np

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out: dict = {"doc_id": []}
            for w in range(n_windows):
                out[f"e{w}"] = []
            for doc_id, mt, data in zip(
                pdf["doc_id"], pdf["media_type"], pdf["media_bytes"]
            ):
                if mt != "audio":
                    continue
                _, samples = _wav_pcm_samples(bytes(data))
                v = np.asarray(samples, dtype=np.int64)
                n = len(v)
                wi = (n_windows * np.arange(n)) // n
                out["doc_id"].append(int(doc_id))
                for w in range(n_windows):
                    out[f"e{w}"].append(int((v[wi == w] ** 2).sum()))
            yield pd.DataFrame(out)

    schema = "doc_id long, " + ", ".join(
        f"e{w} long" for w in range(n_windows)
    )
    return media.select("doc_id", "media_type", "media_bytes").mapInPandas(
        batches, schema
    )


def video_frame_sums(media: DataFrame) -> DataFrame:
    """Per-frame luminance sums + a 2x2 nearest-neighbor thumbnail from the
    REAL AVI chunk-tree walk — one row per (video doc, frame) with the
    exact integer gray-value sum of that frame's pixels (frames are gray
    BGR triplets, so the byte sum is 3x the gray sum, recovered exactly)
    and the thumbnail's 4 sample pixels (same (0,w//2)x(0,h//2) grid as
    transform_media's image path). Downstream scene-cut detection AND
    keyframe extraction are then pure JVM window arithmetic — Python
    appears only where the bytes must be walked, and only ONCE for both
    consumers. Truncated/mismatched containers raise (poison is loud,
    decode_avi's contract)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {
                "doc_id": [], "f": [], "w": [], "h": [], "gray_sum": [],
                "q00": [], "q01": [], "q10": [], "q11": [],
            }
            for doc_id, mt, data in zip(
                pdf["doc_id"], pdf["media_type"], pdf["media_bytes"]
            ):
                if mt != "video":
                    continue
                data = bytes(data)
                if data[:4] != b"RIFF" or data[8:12] != b"AVI ":
                    raise ValueError("not a RIFF/AVI payload")
                w = h = None
                frames: list[int] = []
                end = 8 + struct.unpack_from("<I", data, 4)[0]
                if end > len(data):
                    raise ValueError("truncated AVI container")

                def walk(pos: int, end: int) -> None:
                    nonlocal w, h
                    while pos + 8 <= end:
                        cid = data[pos : pos + 4]
                        size = struct.unpack_from("<I", data, pos + 4)[0]
                        body = pos + 8
                        if body + size > end:
                            raise ValueError("truncated AVI chunk")
                        if cid == b"LIST":
                            walk(body + 4, body + size)
                        elif cid == b"avih":
                            w = struct.unpack_from("<I", data, body + 32)[0]
                            h = struct.unpack_from("<I", data, body + 36)[0]
                        elif cid == b"00db":
                            if w is None:
                                raise ValueError("frame before avih header")
                            row_size = (3 * w + 3) // 4 * 4
                            if size != row_size * h:
                                raise ValueError("frame size mismatch")
                            s3 = 0
                            for row_i in range(h):
                                base = body + row_i * row_size
                                s3 += sum(data[base : base + 3 * w])
                            # bottom-up storage: logical pixel (x, y) lives
                            # at stored row h-1-y (the BMP/DIB layout)
                            quad = tuple(
                                data[
                                    body
                                    + (h - 1 - qy) * row_size
                                    + 3 * qx
                                ]
                                for qy in (0, h // 2)
                                for qx in (0, w // 2)
                            )
                            frames.append((s3 // 3, quad))
                        pos = body + size + (size & 1)

                walk(12, end)
                for f, (gs, quad) in enumerate(frames):
                    out["doc_id"].append(int(doc_id))
                    out["f"].append(f)
                    out["w"].append(int(w))
                    out["h"].append(int(h))
                    out["gray_sum"].append(gs)
                    out["q00"].append(quad[0])
                    out["q01"].append(quad[1])
                    out["q10"].append(quad[2])
                    out["q11"].append(quad[3])
            yield pd.DataFrame(out)

    return media.select("doc_id", "media_type", "media_bytes").mapInPandas(
        batches,
        "doc_id long, f int, w int, h int, gray_sum long, "
        "q00 int, q01 int, q10 int, q11 int",
    )


def audio_block_energies(media: DataFrame, block: int = 8) -> DataFrame:
    """Fixed-size-block signal energies from the REAL WAV decode — one row
    per (audio doc, block of `block` samples) with the exact integer sum of
    squared int16 samples, plus the doc's total sample count. The raw
    material of energy-threshold voice-activity detection (silence/speech
    segmentation): blocks are contiguous sample runs, so segment structure
    downstream is pure window arithmetic. Arrow-batched mapInPandas."""
    import numpy as np

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {"doc_id": [], "b": [], "e": [], "n_samples": []}
            for doc_id, mt, data in zip(
                pdf["doc_id"], pdf["media_type"], pdf["media_bytes"]
            ):
                if mt != "audio":
                    continue
                _, samples = _wav_pcm_samples(bytes(data))
                v = np.asarray(samples, dtype=np.int64)
                n = len(v)
                bi = np.arange(n) // block
                for b in range(int(bi[-1]) + 1 if n else 0):
                    out["doc_id"].append(int(doc_id))
                    out["b"].append(b)
                    out["e"].append(int((v[bi == b] ** 2).sum()))
                    out["n_samples"].append(n)
            yield pd.DataFrame(out)

    return media.select("doc_id", "media_type", "media_bytes").mapInPandas(
        batches, "doc_id long, b int, e long, n_samples long"
    )
