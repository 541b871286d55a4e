"""Pure-Python Avro Object Container File source + sink via Spark 4's
Python DataSource API — closing the format hole left by the spark-avro
module jar being absent from this distribution (ROADMAP.md 12b).

Implements the subset of the PUBLIC Avro 1.x specification
(https://avro.apache.org/docs/current/specification/ — container file
layout, binary encoding) that a Debezium/warehouse pipeline needs:

  - container file: magic ``Obj\\x01``, file-metadata map (``avro.schema``
    JSON + ``avro.codec``), 16-byte sync marker, then data blocks of
    (record count, byte size, records, sync marker);
  - binary encoding: zigzag-varint longs/ints, little-endian IEEE doubles,
    length-prefixed UTF-8 strings/bytes, booleans, nulls;
  - records of primitives, nullable fields as ``["null", T]`` unions
    (branch index + payload), and the ``timestamp-micros`` logical type
    (long micros since epoch <-> naive datetime).

Codec is ``null`` (uncompressed); ``deflate`` (zlib) is accepted on read.

The connector follows this repo's DataSource conventions:
``spark.read.format("avro_py")`` partitions one task per committed file and
yields Arrow RecordBatches per block; ``df.write.format("avro_py")`` has
each task stream its rows to one ``part-<uuid>.avro`` and a driver-side
commit publish the ``_SUCCESS`` manifest naming exactly the committed
files (the same two-phase protocol as the DLQ JSON sink).
"""

from __future__ import annotations

import datetime as _dt
import io
import json
import os
import struct
import zlib

from pyspark.sql.datasource import (
    DataSource,
    DataSourceArrowWriter,
    DataSourceReader,
    DataSourceStreamArrowWriter,
    InputPartition,
    WriterCommitMessage,
)

MAGIC = b"Obj\x01"
_EPOCH = _dt.datetime(1970, 1, 1)
_US = _dt.timedelta(microseconds=1)


# ---------------------------------------------------------------------------
# binary primitives (Avro spec: zigzag varint, IEEE doubles, len-prefixed)
# ---------------------------------------------------------------------------


def encode_long(n: int) -> bytes:
    """Zigzag + base-128 varint (Avro spec 'Binary Encoding > Primitives')."""
    z = (n << 1) ^ (n >> 63)
    out = bytearray()
    while True:
        b = z & 0x7F
        z >>= 7
        if z:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def decode_long(buf: io.BufferedIOBase) -> int:
    shift = 0
    accum = 0
    while True:
        (b,) = buf.read(1)
        accum |= (b & 0x7F) << shift
        if not (b & 0x80):
            break
        shift += 7
    return (accum >> 1) ^ -(accum & 1)


def encode_string(s: str) -> bytes:
    raw = s.encode("utf-8")
    return encode_long(len(raw)) + raw


def decode_string(buf: io.BufferedIOBase) -> str:
    return buf.read(decode_long(buf)).decode("utf-8")


def encode_double(x: float) -> bytes:
    return struct.pack("<d", x)


def decode_double(buf: io.BufferedIOBase) -> float:
    return struct.unpack("<d", buf.read(8))[0]


# ---------------------------------------------------------------------------
# schema-driven record codec (records of primitives + [null, T] unions)
# ---------------------------------------------------------------------------


def _ts_to_micros(v) -> int:
    return (v - _EPOCH) // _US


def _micros_to_ts(us: int) -> _dt.datetime:
    return _EPOCH + us * _US


def _leaf_type(field_schema):
    """(type_name, null_branch) for a primitive or two-branch null union.

    ``null_branch`` is ``None`` for a non-nullable field, else the union
    index of the ``"null"`` branch (0 for ``["null", T]``, 1 for
    ``[T, "null"]``) — the record codec must use the actual index, since
    externally produced files are free to order the branches either way.
    """
    fs = field_schema
    null_branch = None
    if isinstance(fs, list):
        if len(fs) != 2 or "null" not in fs:
            raise ValueError(f"unsupported union: {fs}")
        null_branch = fs.index("null")
        fs = fs[1 - null_branch]
    if isinstance(fs, dict):
        if fs.get("logicalType") == "timestamp-micros":
            return "timestamp-micros", null_branch
        fs = fs["type"]
    return fs, null_branch


def encode_value(type_name: str, v) -> bytes:
    if type_name in ("long", "int"):
        return encode_long(int(v))
    if type_name == "timestamp-micros":
        return encode_long(v if isinstance(v, int) else _ts_to_micros(v))
    if type_name == "double":
        return encode_double(float(v))
    if type_name == "float":
        return struct.pack("<f", float(v))
    if type_name == "string":
        return encode_string(v)
    if type_name == "bytes":
        return encode_long(len(v)) + bytes(v)
    if type_name == "boolean":
        return b"\x01" if v else b"\x00"
    if type_name == "null":
        return b""
    raise ValueError(f"unsupported Avro type: {type_name}")


def decode_value(type_name: str, buf: io.BufferedIOBase):
    if type_name in ("long", "int"):
        return decode_long(buf)
    if type_name == "timestamp-micros":
        return _micros_to_ts(decode_long(buf))
    if type_name == "double":
        return decode_double(buf)
    if type_name == "float":
        return struct.unpack("<f", buf.read(4))[0]
    if type_name == "string":
        return decode_string(buf)
    if type_name == "bytes":
        return buf.read(decode_long(buf))
    if type_name == "boolean":
        return buf.read(1) == b"\x01"
    if type_name == "null":
        return None
    raise ValueError(f"unsupported Avro type: {type_name}")


def encode_record(schema: dict, values) -> bytes:
    out = bytearray()
    for field, v in zip(schema["fields"], values):
        tname, null_branch = _leaf_type(field["type"])
        if null_branch is not None:
            if v is None:
                out += encode_long(null_branch)
                continue
            out += encode_long(1 - null_branch)
        elif v is None:
            raise ValueError(f"null in non-nullable field {field['name']}")
        out += encode_value(tname, v)
    return bytes(out)


def decode_record(schema: dict, buf: io.BufferedIOBase) -> tuple:
    vals = []
    for field in schema["fields"]:
        tname, null_branch = _leaf_type(field["type"])
        if null_branch is not None:
            if decode_long(buf) == null_branch:
                vals.append(None)
                continue
        vals.append(decode_value(tname, buf))
    return tuple(vals)


# ---------------------------------------------------------------------------
# container file
# ---------------------------------------------------------------------------


def write_container(
    path: str,
    schema: dict,
    rows,
    sync: bytes,
    records_per_block: int = 4000,
) -> int:
    """Write one Avro Object Container File (codec null); returns rows."""
    n = 0
    with open(path, "wb") as f:
        f.write(MAGIC)
        meta = {
            "avro.schema": json.dumps(schema).encode(),
            "avro.codec": b"null",
        }
        f.write(encode_long(len(meta)))
        for k, v in sorted(meta.items()):
            f.write(encode_string(k))
            f.write(encode_long(len(v)) + v)
        f.write(encode_long(0))  # map terminator
        f.write(sync)

        block = bytearray()
        count = 0

        def flush():
            nonlocal block, count
            if count:
                f.write(encode_long(count))
                f.write(encode_long(len(block)))
                f.write(block)
                f.write(sync)
            block, count = bytearray(), 0

        for values in rows:
            block += encode_record(schema, values)
            count += 1
            n += 1
            if count >= records_per_block:
                flush()
        flush()
    return n


# ---------------------------------------------------------------------------
# vectorized (Arrow-batch) encoder — byte-identical to the row codec
# ---------------------------------------------------------------------------


def _varint_flat(vals):
    """Vectorized zigzag-varint encode of an int64 array.

    Returns ``(flat, lens)``: ``flat`` is one uint8 array holding every
    row's varint back to back in row order, ``lens`` the per-row byte
    counts — the segment shape the ragged scatter in
    ``_encode_rows_arrow`` assembles from. No per-row Python: the 7-bit
    groups are built as an (n, 10) matrix and masked flat.
    """
    import numpy as np

    v = np.ascontiguousarray(vals, dtype=np.int64)
    n = len(v)
    z = (v.astype(np.uint64) << np.uint64(1)) ^ (
        v >> np.int64(63)
    ).astype(np.uint64)
    lens = np.ones(n, dtype=np.int64)
    t = z >> np.uint64(7)
    while t.any():
        lens += (t != 0).astype(np.int64)
        t >>= np.uint64(7)
    m = np.empty((n, 10), dtype=np.uint8)
    cur = z.copy()
    for i in range(10):
        m[:, i] = (cur & np.uint64(0x7F)).astype(np.uint8)
        cur >>= np.uint64(7)
    cols = np.arange(10, dtype=np.int64)[None, :]
    m |= (cols < (lens - 1)[:, None]).astype(np.uint8) << 7
    flat = m[cols < lens[:, None]]
    return flat, lens


def _prim_np(arr, np_dtype):
    """Values buffer of a primitive Arrow array as numpy (slice-aware)."""
    import numpy as np

    return np.frombuffer(
        arr.buffers()[1], dtype=np_dtype, count=arr.offset + len(arr)
    )[arr.offset :]


def _bool_np(arr):
    """Bit-packed Arrow boolean array as a uint8 0/1 numpy array."""
    import numpy as np

    bits = np.unpackbits(
        np.frombuffer(arr.buffers()[1], dtype=np.uint8), bitorder="little"
    )
    return bits[arr.offset : arr.offset + len(arr)]


def _null_mask(arr):
    import numpy as np

    if arr.null_count == 0:
        return np.zeros(len(arr), dtype=bool)
    return arr.is_null().to_numpy(zero_copy_only=False)


def _string_flat(arr):
    """(flat data bytes, per-row byte lens) of an Arrow string/binary
    array, honoring slice offsets; null rows contribute 0 bytes."""
    import numpy as np
    import pyarrow as pa

    off_dtype = (
        np.int64
        if (
            pa.types.is_large_string(arr.type)
            or pa.types.is_large_binary(arr.type)
        )
        else np.int32
    )
    offsets = np.frombuffer(
        arr.buffers()[1],
        dtype=off_dtype,
        count=arr.offset + len(arr) + 1,
    )[arr.offset :].astype(np.int64)
    data = np.frombuffer(arr.buffers()[2] or b"", dtype=np.uint8)
    lens = np.diff(offsets)
    null = _null_mask(arr)
    if null.any():
        lens = np.where(null, 0, lens)
    if int(lens.sum()) == int(offsets[-1] - offsets[0]) and (
        not null.any()
    ):
        flat = data[offsets[0] : offsets[-1]]
    else:
        # gather only the live extents (null slots may carry garbage)
        starts = offsets[:-1]
        cum = np.concatenate(([0], np.cumsum(lens)[:-1]))
        idx = np.repeat(starts - cum, lens) + np.arange(int(lens.sum()))
        flat = data[idx]
    return flat, lens


def _field_segments(field_schema, col):
    """Encode one Arrow column into a list of (flat, lens) segments whose
    row-order concatenation is exactly the row codec's field encoding."""
    import numpy as np

    tname, null_branch = _leaf_type(field_schema)
    n = len(col)
    segs: list = []
    null = _null_mask(col)
    if null_branch is not None:
        # single-byte zigzag union branch index per row
        branch = np.where(
            null, np.uint8(2 * null_branch), np.uint8(2 * (1 - null_branch))
        ).astype(np.uint8)
        segs.append((branch, np.ones(n, dtype=np.int64)))
    elif null.any():
        raise ValueError(
            f"null in non-nullable field (arrow column {col.type})"
        )

    def mask_out(flat, lens):
        """Zero out null rows: drop their bytes from flat, set len 0."""
        if not null.any():
            return flat, lens
        keep = np.repeat(~null, lens)
        return flat[keep], np.where(null, 0, lens)

    if tname in ("long", "int", "timestamp-micros"):
        import pyarrow as pa

        vals = col
        if tname == "timestamp-micros" or col.type != pa.int64():
            if tname == "int":
                vals = col.cast(pa.int32())
                raw = _prim_np(vals, np.int32).astype(np.int64)
            else:
                vals = col.cast(pa.int64())
                raw = _prim_np(vals, np.int64)
        else:
            raw = _prim_np(vals, np.int64)
        if null.any():
            raw = np.where(null, 0, raw)  # placeholder, masked below
        segs.append(mask_out(*_varint_flat(raw)))
    elif tname == "double":
        raw = _prim_np(col, "<f8")
        flat = np.frombuffer(
            np.ascontiguousarray(raw).tobytes(), dtype=np.uint8
        )
        segs.append(mask_out(flat, np.full(n, 8, dtype=np.int64)))
    elif tname == "float":
        raw = _prim_np(col, "<f4")
        flat = np.frombuffer(
            np.ascontiguousarray(raw).tobytes(), dtype=np.uint8
        )
        segs.append(mask_out(flat, np.full(n, 4, dtype=np.int64)))
    elif tname in ("string", "bytes"):
        flat, lens = _string_flat(col)
        lflat, llens = _varint_flat(lens)
        if null.any():
            keep = np.repeat(~null, llens)
            lflat, llens = lflat[keep], np.where(null, 0, llens)
        segs.append((lflat, llens))
        segs.append((flat, lens))
    elif tname == "boolean":
        flat = _bool_np(col)
        segs.append(mask_out(flat, np.ones(n, dtype=np.int64)))
    elif tname == "null":
        pass
    else:
        raise ValueError(f"unsupported Avro type: {tname}")
    return segs


def _encode_rows_arrow(schema: dict, batch) -> bytes:
    """Encode an Arrow RecordBatch slice as a block body — the byte-exact
    concatenation of ``encode_record`` over its rows, assembled with one
    ragged scatter (no per-row Python; the round-4 scale fix for the
    Python Avro sink's hot path)."""
    import numpy as np

    n = batch.num_rows
    if n == 0:
        return b""
    segments: list = []
    for i, field in enumerate(schema["fields"]):
        segments.extend(_field_segments(field["type"], batch.column(i)))
    lens_mat = np.stack([l for _, l in segments])  # (S, n)
    rec_len = lens_mat.sum(axis=0)
    rec_off = np.concatenate(([0], np.cumsum(rec_len)[:-1]))
    seg_off = np.concatenate(
        (np.zeros((1, n), dtype=np.int64), np.cumsum(lens_mat, axis=0)[:-1])
    )
    out = np.empty(int(rec_len.sum()), dtype=np.uint8)
    for s, (flat, lens) in enumerate(segments):
        total = int(lens.sum())
        if total == 0:
            continue
        starts = rec_off + seg_off[s]
        cum = np.concatenate(([0], np.cumsum(lens)[:-1]))
        idx = np.repeat(starts - cum, lens) + np.arange(total)
        out[idx] = flat
    return out.tobytes()


def write_container_arrow(
    path: str,
    schema: dict,
    batches,
    sync: bytes,
    records_per_block: int = 4000,
) -> int:
    """Arrow-batched twin of ``write_container``: same header, the same
    4000-record blocking and sync markers — byte-identical output for the
    same logical rows (pinned by test_avro_arrow_writer_byte_identical) —
    but each block body is one vectorized ``_encode_rows_arrow`` instead
    of per-row ``struct.pack``. The production wire remains the JVM
    spark-avro module (COVERAGE.md); this keeps the jar-less fallback off
    the bench's weak list."""
    n = 0
    with open(path, "wb") as f:
        f.write(MAGIC)
        meta = {
            "avro.schema": json.dumps(schema).encode(),
            "avro.codec": b"null",
        }
        f.write(encode_long(len(meta)))
        for k, v in sorted(meta.items()):
            f.write(encode_string(k))
            f.write(encode_long(len(v)) + v)
        f.write(encode_long(0))  # map terminator
        f.write(sync)

        block = bytearray()
        count = 0

        def flush():
            nonlocal block, count
            if count:
                f.write(encode_long(count))
                f.write(encode_long(len(block)))
                f.write(block)
                f.write(sync)
            block, count = bytearray(), 0

        for b in batches:
            off = 0
            while off < b.num_rows:
                take = min(records_per_block - count, b.num_rows - off)
                block += _encode_rows_arrow(schema, b.slice(off, take))
                count += take
                off += take
                n += take
                if count >= records_per_block:
                    flush()
        flush()
    return n


def container_schema(path: str) -> dict:
    """Parse just the header's embedded schema (works on empty files)."""
    with open(path, "rb") as f:
        if f.read(4) != MAGIC:
            raise ValueError(f"not an Avro container file: {path}")
        while True:
            cnt = decode_long(f)
            if cnt == 0:
                break
            if cnt < 0:
                cnt = -cnt
                decode_long(f)
            for _ in range(cnt):
                k = decode_string(f)
                v = f.read(decode_long(f))
                if k == "avro.schema":
                    return json.loads(v.decode())
    raise ValueError(f"no avro.schema in {path}")


def _container_blocks(path: str):
    """Yield (schema, decompressed_payload_bytes, record_count) per block
    of an Avro container file (header/codec/sync handling shared by the
    row-wise reference reader and the columnar fast path)."""
    with open(path, "rb") as f:
        if f.read(4) != MAGIC:
            raise ValueError(f"not an Avro container file: {path}")
        meta = {}
        while True:
            cnt = decode_long(f)
            if cnt == 0:
                break
            if cnt < 0:  # spec: negative count followed by byte size
                cnt = -cnt
                decode_long(f)
            for _ in range(cnt):
                k = decode_string(f)
                meta[k] = f.read(decode_long(f))
        schema = json.loads(meta["avro.schema"].decode())
        codec = meta.get("avro.codec", b"null").decode()
        if codec not in ("null", "deflate"):
            raise ValueError(f"unsupported codec: {codec}")
        sync = f.read(16)
        while True:
            head = f.read(1)
            if not head:
                return
            f.seek(-1, os.SEEK_CUR)
            count = decode_long(f)
            size = decode_long(f)
            payload = f.read(size)
            if codec == "deflate":
                payload = zlib.decompress(payload, -15)
            if f.read(16) != sync:
                raise ValueError(f"sync marker mismatch in {path}")
            yield schema, payload, count


def read_container(path: str):
    """Yield (schema, row_tuple) records from an Avro container file.
    Row-at-a-time reference decoder — the byte-identity twin that pins
    ``read_container_columns`` (tests/test_relational4.py)."""
    for schema, payload, count in _container_blocks(path):
        buf = io.BytesIO(payload)
        for _ in range(count):
            yield schema, decode_record(schema, buf)


def read_container_columns(path: str):
    """Column-wise fast-path decode: returns ``(schema, columns)`` where
    ``columns[i]`` is the Python list for field i over ALL blocks — the
    same values ``read_container`` yields row-wise, EXCEPT that
    timestamp-micros fields stay raw int64 epoch-micros (the Arrow
    construction consumes integers directly; the reference reader's
    datetime objects were built per row only to be converted straight
    back). ~3x the reference decoder's throughput (round 13, guide §4.2):
    straight index arithmetic on the block bytes replaces a BytesIO
    ``read(1)`` round-trip per varint byte, values land column-wise with
    no per-row tuple, and the per-field dispatch is precompiled from the
    schema once per file instead of re-resolved per value."""
    schema = None
    cols: list[list] = []
    plan: list[tuple[int, int | None]] = []
    for schema, payload, count in _container_blocks(path):
        if not plan:
            # kind codes: 0 varint long/int, 1 timestamp-micros (raw us),
            # 2 double, 3 float, 4 string, 5 bytes, 6 boolean, 7 null
            kind_of = {
                "long": 0, "int": 0, "timestamp-micros": 1, "double": 2,
                "float": 3, "string": 4, "bytes": 5, "boolean": 6,
                "null": 7,
            }
            for f in schema["fields"]:
                tname, null_branch = _leaf_type(f["type"])
                plan.append((kind_of[tname], null_branch))
                cols.append([])
        unpack_from = struct.unpack_from
        pos = 0
        for _ in range(count):
            for fi, (kind, null_branch) in enumerate(plan):
                if null_branch is not None:
                    accum = 0
                    shift = 0
                    while True:
                        b = payload[pos]
                        pos += 1
                        accum |= (b & 0x7F) << shift
                        if not (b & 0x80):
                            break
                        shift += 7
                    if (accum >> 1) ^ -(accum & 1) == null_branch:
                        cols[fi].append(None)
                        continue
                if kind <= 1:  # zigzag varint (long/int/timestamp-micros)
                    accum = 0
                    shift = 0
                    while True:
                        b = payload[pos]
                        pos += 1
                        accum |= (b & 0x7F) << shift
                        if not (b & 0x80):
                            break
                        shift += 7
                    cols[fi].append((accum >> 1) ^ -(accum & 1))
                elif kind == 2:
                    cols[fi].append(unpack_from("<d", payload, pos)[0])
                    pos += 8
                elif kind == 3:
                    cols[fi].append(unpack_from("<f", payload, pos)[0])
                    pos += 4
                elif kind == 4 or kind == 5:  # length-prefixed str/bytes
                    accum = 0
                    shift = 0
                    while True:
                        b = payload[pos]
                        pos += 1
                        accum |= (b & 0x7F) << shift
                        if not (b & 0x80):
                            break
                        shift += 7
                    n = (accum >> 1) ^ -(accum & 1)
                    raw = payload[pos:pos + n]
                    pos += n
                    cols[fi].append(raw.decode("utf-8") if kind == 4 else raw)
                elif kind == 6:
                    cols[fi].append(payload[pos:pos + 1] == b"\x01")
                    pos += 1
                else:  # null-typed field
                    cols[fi].append(None)
    return schema, cols


# ---------------------------------------------------------------------------
# Spark DataSource plumbing
# ---------------------------------------------------------------------------

EVENTS_AVRO_SCHEMA = {
    "type": "record",
    "name": "event",
    "fields": [
        {"name": "event_id", "type": "long"},
        {
            "name": "ts",
            "type": {"type": "long", "logicalType": "timestamp-micros"},
        },
        {"name": "user_id", "type": "long"},
        {"name": "event_type", "type": "string"},
        {"name": "value", "type": "double"},
        {"name": "props", "type": ["null", "string"]},
    ],
}

EVENTS_AVRO_DDL = (
    "event_id long, ts timestamp_ntz, user_id long, event_type string, "
    "value double, props string"
)

_AVRO_TO_ARROW = {
    "long": "int64",
    "int": "int32",
    "double": "float64",
    "float": "float32",
    "string": "string",
    "boolean": "bool",
    "bytes": "binary",
    "timestamp-micros": "timestamp[us]",
}


class AvroFilePartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


def committed_avro_files(path: str) -> list[str]:
    """Manifest-gated file resolution: batch-write `_SUCCESS`, else the
    stream sink's per-batch `_batch-*.json` manifests, else (no manifest
    protocol in play — externally produced directory) a plain glob."""
    import glob

    manifest = os.path.join(path, "_SUCCESS")
    if os.path.exists(manifest):
        with open(manifest) as f:
            names = json.load(f)["files"]
        return [os.path.join(path, n) for n in names]
    batch_manifests = sorted(glob.glob(os.path.join(path, "_batch-*.json")))
    if batch_manifests:
        files: list[str] = []
        for mf in batch_manifests:
            with open(mf) as f:
                files.extend(
                    os.path.join(path, n) for n in json.load(f)["files"]
                )
        return files
    return sorted(
        os.path.join(path, n)
        for n in os.listdir(path)
        if n.endswith(".avro")
    )


class AvroReader(DataSourceReader):
    def __init__(self, options: dict):
        self.path = options["path"]

    def partitions(self):
        return [AvroFilePartition(p) for p in committed_avro_files(self.path)]

    def read(self, partition: AvroFilePartition):
        import pyarrow as pa

        # columnar fast path (r13): values land in per-field lists with
        # timestamps as raw epoch-micros, which pa.array consumes
        # directly — no row tuples, no datetime round-trip. Pinned
        # value-identical to the row-wise reference reader by
        # tests/test_relational4.py.
        schema, cols = read_container_columns(partition.path)
        if schema is None or not cols or not cols[0]:
            return
        names = [f["name"] for f in schema["fields"]]
        types = [
            pa.type_for_alias(_AVRO_TO_ARROW[_leaf_type(f["type"])[0]])
            for f in schema["fields"]
        ]
        arrays = [
            pa.array(cols[i], type=types[i]) for i in range(len(names))
        ]
        yield pa.RecordBatch.from_arrays(arrays, names=names)


class AvroCommitMessage(WriterCommitMessage):
    def __init__(self, filename: str, n_rows: int):
        self.filename = filename
        self.n_rows = n_rows


class AvroWriter(DataSourceArrowWriter):
    """Task-side: one ``part-<uuid>.avro`` per task (schema from the write
    option), driver-side commit publishes the ``_SUCCESS`` manifest.
    Arrow-batched: tasks hand whole RecordBatches to the vectorized
    encoder, never per-row Python."""

    def __init__(self, options: dict):
        self.path = options["path"]
        self.schema = json.loads(options["avro_schema"])

    def write(self, iterator):
        import uuid

        os.makedirs(self.path, exist_ok=True)
        name = f"part-{uuid.uuid4().hex}.avro"
        n = write_container_arrow(
            os.path.join(self.path, name),
            self.schema,
            iterator,
            uuid.uuid4().bytes,
        )
        return AvroCommitMessage(name, n)

    def commit(self, messages):
        manifest = {
            "files": sorted(m.filename for m in messages),
            "n_rows": sum(m.n_rows for m in messages),
        }
        with open(os.path.join(self.path, "_SUCCESS"), "w") as f:
            f.write(json.dumps(manifest))

    def abort(self, messages):
        for m in messages:
            try:
                os.remove(os.path.join(self.path, m.filename))
            except OSError:
                pass


class AvroDataSource(DataSource):
    """``format("avro_py")``: read/write Avro container files without the
    spark-avro jar. Read side needs no schema option (it comes from the
    file header); write side takes the Avro schema JSON via
    ``option("avro_schema", ...)``."""

    @classmethod
    def name(cls) -> str:
        return "avro_py"

    def schema(self) -> str:
        # derive DDL from the first file's embedded schema
        files = committed_avro_files(self.options["path"])
        schema = container_schema(files[0])
        ddl = []
        for fld in schema["fields"]:
            tname, _ = _leaf_type(fld["type"])
            spark_t = {
                "long": "long",
                "int": "int",
                "double": "double",
                "float": "float",
                "string": "string",
                "boolean": "boolean",
                "bytes": "binary",
                "timestamp-micros": "timestamp_ntz",
            }[tname]
            ddl.append(f"{fld['name']} {spark_t}")
        return ", ".join(ddl)

    def reader(self, schema) -> AvroReader:
        return AvroReader(self.options)

    def writer(self, schema, overwrite: bool) -> AvroWriter:
        return AvroWriter(self.options)

    def streamWriter(self, schema, overwrite: bool) -> "AvroStreamWriter":
        return AvroStreamWriter(self.options)


class AvroStreamWriter(DataSourceStreamArrowWriter):
    """STREAMING Avro sink: every micro-batch's tasks write uuid .avro part
    files; the driver-side ``commit(messages, batchId)`` publishes a
    per-batch manifest ``_batch-<id>.json`` naming exactly the committed
    files (atomic replace), so a replayed batch's orphaned first attempt is
    never visible — the same exactly-once manifest contract as the DLQ
    stream sink, now producing a standards-conformant Avro archive (the
    Kafka-topic -> Avro-files archival job Debezium deployments run).
    Arrow-batched encode (round-4 scale fix): the wire bytes come from
    ``write_container_arrow``'s ragged scatter, not per-record packing."""

    def __init__(self, options: dict):
        self.path = options["path"]
        self.schema = json.loads(options["avro_schema"])

    def write(self, iterator):
        import uuid

        os.makedirs(self.path, exist_ok=True)
        name = f"part-{uuid.uuid4().hex}.avro"
        n = write_container_arrow(
            os.path.join(self.path, name),
            self.schema,
            iterator,
            uuid.uuid4().bytes,
        )
        return AvroCommitMessage(name, n)

    def commit(self, messages, batchId: int) -> None:
        import tempfile

        manifest = {
            "batch_id": batchId,
            "files": sorted(
                m.filename for m in messages if m is not None
            ),
            "n_rows": sum(m.n_rows for m in messages if m is not None),
        }
        fd, tmp = tempfile.mkstemp(dir=self.path, suffix=".tmp")
        with os.fdopen(fd, "w") as f:
            f.write(json.dumps(manifest))
        os.replace(
            tmp, os.path.join(self.path, f"_batch-{batchId}.json")
        )

    def abort(self, messages, batchId: int) -> None:
        for m in messages:
            if m is None:
                continue
            try:
                os.remove(os.path.join(self.path, m.filename))
            except OSError:
                pass


