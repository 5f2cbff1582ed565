"""COLF codec: pure-Python, numpy-vectorized encoder/decoder for the
reference single-file columnar format.

Layout (from /root/reference/SPEC.md; behavior cross-checked against
/root/reference/writer.py and reader.py — reimplemented, not copied):

  preamble : magic b"COLF" | version u8 (=1) | endianness u8 (=1, LE)
             | HeaderSize u32
  header   : SchemaLength u32 | schema JSON (UTF-8)
             | per-column metadata, 25 B each:
               Offset u64 (absolute) | CompressedSize u64
               | UncompressedSize u64 | HasNulls u8
  body     : one zlib-compressed block per column, sequential

Column payload (uncompressed):
  DataType u8 (1=int32, 2=float64, 3=utf8) | HasNulls u8
  | [NullBitmap ceil(n/8) B, LSB-first — only when HasNulls]
  | int32/float64: contiguous LE values, 0/0.0 placeholders for nulls
  | utf8: n u32 LE start offsets (0 for null rows;
    /root/reference/writer.py:131) + concatenated UTF-8 bytes

Divergences from the reference implementation (deliberate, SURVEY.md §7):
- string decode is O(n) via the next-non-null-offset diff, not the
  reference's O(n²) forward scan (reader.py:142-153) — byte-identical
  results on any file the reference writer can produce;
- int32 overflow raises ColfFormatError instead of an opaque
  struct.error (writer.py:111);
- 0-row files are valid (the reference writer crashes on empty input,
  writer.py:153-154, while its reader supports 0 rows, reader.py:239-251).
- valid EMPTY strings round-trip through OUR reader but are outside the
  reference's value domain (its CSV ingest maps ""⇒NULL, writer.py:47-50,
  so its writer never emits one); the reference reader's end-scan
  (reader.py:142-153) cannot distinguish a valid "" from the next
  string's start and misreads such files. Engine-written files
  containing "" are spec-layout-valid but only faithfully readable by
  this codec.

VERSION 2 (engine extension, opt-in; default stays v1 byte-compatible):
  Preamble version byte = 2; readers that only understand v1 (the
  reference's reader.py:54-58 and our own pre-v2 codec) reject it
  LOUDLY — v2 never silently mis-decodes on a v1 reader. The
  container layout (header, 25-byte metadata entries, one compressed
  block per column) is unchanged; only the per-column payload gains a
  third header byte:

    DataType u8 | HasNulls u8 | Encoding u8 | [NullBitmap] | data

  Encodings (chosen adaptively per column at write time, recorded
  both in the payload byte and as "encoding" in the schema JSON):
    0=plain  v1 data layout (always legal, the fallback)
    1=delta  int32: zigzag(delta) values min-width packed as
             u8/u16/u32 (width prefix byte); falls back to plain
             when any zigzag delta needs >4 bytes
    2=bss    float64: byte-stream split (8 planes of the i-th byte
             of each value) — same bytes, zlib-friendlier layout
    3=dict   utf8: code array (min-width u8/u16/u32, width prefix)
             + u32 distinct count + per-distinct u32 start offsets
             + concatenated blob, dictionary sorted bytewise; used
             when distinct <= n/2, else plain
  All encodings are numpy-vectorized both directions; zlib of the
  encoded payload remains the block codec, so selective reads,
  zone-map pruning, and the metadata log work identically for v1
  and v2 files, and a dataset may mix file versions.
"""

from __future__ import annotations

import json
import struct
import zlib
from dataclasses import dataclass, field

import numpy as np

MAGIC = b"COLF"
VERSION = 1
VERSION_V2 = 2
SUPPORTED_VERSIONS = (VERSION, VERSION_V2)
ENDIAN_LE = 1

# v2 per-column encodings (payload byte 2)
ENC_PLAIN = 0
ENC_DELTA = 1  # int32
ENC_BSS = 2    # float64
ENC_DICT = 3   # utf8
ENC_NAMES = {ENC_PLAIN: "plain", ENC_DELTA: "delta",
             ENC_BSS: "bss", ENC_DICT: "dict"}

DT_INT32 = 1
DT_FLOAT64 = 2
DT_UTF8 = 3

TYPE_TAGS = {"int32": DT_INT32, "float64": DT_FLOAT64, "utf8": DT_UTF8}
META_ENTRY_SIZE = 8 + 8 + 8 + 1  # Offset + CompSize + UncompSize + HasNulls

INT32_MIN, INT32_MAX = -(2**31), 2**31 - 1


class ColfFormatError(ValueError):
    """Malformed COLF data or values outside the format's domain."""


def _decompress_block(comp: bytes, column: str, offset: int) -> bytes:
    """zlib-decompress one column block, wrapping corruption in the
    engine's error standard: every decode failure names the column and
    file offset. (The reference wraps only one of its two read paths —
    reader.py wraps the full scan in safe_decompress but its
    read_columns raises bare zlib.error; here the context is
    consistent on every path, round-12 verdict item #5.)"""
    try:
        return zlib.decompress(comp)
    except zlib.error as exc:
        raise ColfFormatError(
            f"corrupt compressed block for column '{column}' at "
            f"offset {offset}: {exc}") from exc


@dataclass
class ColfColumn:
    name: str
    type: str  # int32 | float64 | utf8
    nullable: bool
    encoding: str | None = None  # v2 files only; absent in v1 JSON
    # FIELD ID (Iceberg's schema-evolution key): embedded in the schema
    # JSON as "id" for files written against a dataset with a recorded
    # table schema, so readers resolve columns by identity across
    # renames. Absent (None) in reference-written and pre-evolution
    # files — those resolve through the dataset's name mapping. An
    # extra JSON key is ignored by the reference reader (it indexes
    # "name"/"type" only), keeping v1 files reference-readable.
    fid: int | None = None

    def to_json(self) -> dict:
        doc = {"name": self.name, "type": self.type, "nullable": self.nullable}
        if self.encoding is not None:
            doc["encoding"] = self.encoding
        if self.fid is not None:
            doc["id"] = self.fid
        return doc


@dataclass
class ColfSchema:
    num_rows: int
    columns: list[ColfColumn] = field(default_factory=list)
    version: int = VERSION  # set from the preamble on read

    def to_json_bytes(self) -> bytes:
        doc = {"num_rows": self.num_rows,
               "columns": [c.to_json() for c in self.columns]}
        return json.dumps(doc, separators=(",", ":")).encode("utf-8")

    @classmethod
    def from_json(cls, doc: dict) -> "ColfSchema":
        cols = [ColfColumn(c["name"], c["type"], bool(c.get("nullable", False)),
                           c.get("encoding"), c.get("id"))
                for c in doc.get("columns", [])]
        return cls(num_rows=int(doc.get("num_rows", 0)), columns=cols)


@dataclass
class ColumnMeta:
    offset: int
    comp_size: int
    uncomp_size: int
    has_nulls: bool


# ---------------------------------------------------------------------------
# encode


def _null_bitmap(nulls: np.ndarray) -> bytes:
    """LSB-first 1-bit-per-row bitmap (bit set ⇒ NULL)."""
    return np.packbits(nulls.astype(np.uint8), bitorder="little").tobytes()


def encode_column(values: list, dtype: str) -> tuple[bytes, bool]:
    """Encode Python values (None ⇒ NULL) into an uncompressed COLF
    column payload. Returns (payload, has_nulls)."""
    if dtype not in TYPE_TAGS:
        raise ColfFormatError(f"Unknown COLF type: {dtype}")
    n = len(values)
    nulls = np.fromiter((v is None for v in values), dtype=bool, count=n)
    has_nulls = bool(nulls.any())

    parts = [struct.pack("<BB", TYPE_TAGS[dtype], 1 if has_nulls else 0)]
    if has_nulls:
        parts.append(_null_bitmap(nulls))

    if dtype == "int32":
        arr = np.zeros(n, dtype="<i4")
        if n:
            filled = [0 if v is None else v for v in values]
            lo, hi = (min(filled), max(filled)) if filled else (0, 0)
            if lo < INT32_MIN or hi > INT32_MAX:
                bad = next(v for v in filled if not (INT32_MIN <= v <= INT32_MAX))
                raise ColfFormatError(
                    f"int32 overflow: value {bad} outside [{INT32_MIN}, {INT32_MAX}]")
            arr[:] = filled
        parts.append(arr.tobytes())
    elif dtype == "float64":
        arr = np.zeros(n, dtype="<f8")
        if n:
            arr[:] = [0.0 if v is None else v for v in values]
        parts.append(arr.tobytes())
    else:  # utf8
        offsets = np.zeros(n, dtype="<u4")
        blobs = []
        pos = 0
        for i, v in enumerate(values):
            if v is None:
                continue  # offset stays 0, like the reference writer
            b = v.encode("utf-8") if isinstance(v, str) else bytes(v)
            offsets[i] = pos
            blobs.append(b)
            pos += len(b)
        if pos > 0xFFFFFFFF:
            raise ColfFormatError("utf8 blob exceeds u32 offset space")
        parts.append(offsets.tobytes())
        parts.append(b"".join(blobs))
    return b"".join(parts), has_nulls


# ---------------------------------------------------------------------------
# v2 encodings: numpy-vectorized transforms applied BEFORE zlib. Each
# returns None when the encoding would not be representable/beneficial,
# in which case the caller falls back to the plain (v1) data layout.


def _delta_encode_i32(vals: np.ndarray) -> bytes | None:
    """int32 values (nulls pre-filled with 0) -> width byte + zigzag
    deltas packed at the minimal uniform width. None if any zigzag
    delta needs more than 4 bytes (then plain is smaller anyway)."""
    deltas = np.diff(vals.astype(np.int64), prepend=np.int64(0))
    zz = ((deltas << 1) ^ (deltas >> 63)).astype(np.uint64)
    maxv = int(zz.max()) if zz.size else 0
    if maxv < 1 << 8:
        width = 1
    elif maxv < 1 << 16:
        width = 2
    elif maxv < 1 << 32:
        width = 4
    else:
        return None
    return struct.pack("<B", width) + zz.astype(f"<u{width}").tobytes()


def _delta_decode_i32(data: memoryview, num_rows: int) -> np.ndarray:
    if num_rows == 0:
        return np.zeros(0, dtype="<i4")
    if len(data) < 1:
        raise ColfFormatError("delta block missing width byte")
    width = data[0]
    if width not in (1, 2, 4):
        raise ColfFormatError(f"delta block has invalid width {width}")
    zz = np.frombuffer(data[1:1 + width * num_rows], dtype=f"<u{width}")
    if zz.size < num_rows:
        raise ColfFormatError("Unexpected end of delta data")
    z = zz.astype(np.int64)
    deltas = (z >> 1) ^ -(z & 1)
    return np.cumsum(deltas).astype("<i4")


def _bss_encode_f64(vals: np.ndarray) -> bytes:
    """Byte-stream split: plane i holds byte i of every value."""
    b = np.ascontiguousarray(vals, dtype="<f8").view(np.uint8).reshape(-1, 8)
    return np.ascontiguousarray(b.T).tobytes()


def _bss_decode_f64(data: memoryview, num_rows: int) -> np.ndarray:
    b = np.frombuffer(data[:8 * num_rows], dtype=np.uint8)
    if b.size < 8 * num_rows:
        raise ColfFormatError("Unexpected end of bss data")
    return np.ascontiguousarray(b.reshape(8, num_rows).T).view("<f8").ravel()


def _pack_codes(codes: np.ndarray) -> bytes:
    maxc = int(codes.max()) if codes.size else 0
    width = 1 if maxc < 1 << 8 else 2 if maxc < 1 << 16 else 4
    return struct.pack("<B", width) + codes.astype(f"<u{width}").tobytes()


def _dict_encode_from_parts(codes: np.ndarray, starts: np.ndarray,
                            blob: bytes) -> bytes:
    return b"".join([
        _pack_codes(codes),
        struct.pack("<I", starts.size),
        starts.astype("<u4").tobytes(),
        blob,
    ])


def _dict_encode_utf8(byte_vals: np.ndarray) -> bytes | None:
    """byte_vals: object array of per-row encoded bytes (b"" at null
    rows — codes at null positions are placeholders, masked on read).
    Dictionary is bytewise-sorted (np.unique order), so the same
    values yield the same file bytes from any write path."""
    n = byte_vals.size
    uniq, codes = np.unique(byte_vals, return_inverse=True)
    if uniq.size > max(1, n // 2):
        return None
    lens = np.fromiter((len(v) for v in uniq), dtype=np.int64,
                       count=uniq.size)
    if int(lens.sum()) > 0xFFFFFFFF:
        return None
    starts = np.zeros(uniq.size, dtype=np.int64)
    np.cumsum(lens[:-1], out=starts[1:])
    return _dict_encode_from_parts(codes, starts, b"".join(uniq))


def _dict_decode_utf8(data: memoryview, num_rows: int):
    """Returns (codes ndarray, list of distinct decoded values)."""
    if num_rows == 0:
        return np.zeros(0, dtype=np.int64), []
    if len(data) < 1:
        raise ColfFormatError("dict block missing width byte")
    width = data[0]
    if width not in (1, 2, 4):
        raise ColfFormatError(f"dict block has invalid code width {width}")
    codes = np.frombuffer(data[1:1 + width * num_rows], dtype=f"<u{width}")
    if codes.size < num_rows:
        raise ColfFormatError("Unexpected end of dict codes")
    pos = 1 + width * num_rows
    (n_distinct,) = struct.unpack("<I", data[pos:pos + 4])
    pos += 4
    starts = np.frombuffer(data[pos:pos + 4 * n_distinct], dtype="<u4")
    if starts.size < n_distinct:
        raise ColfFormatError("Unexpected end of dict offsets")
    blob = data[pos + 4 * n_distinct:]
    ends = np.empty(n_distinct, dtype=np.int64)
    if n_distinct:
        ends[:-1] = starts[1:]
        ends[-1] = len(blob)
    values = []
    for s, e in zip(starts.tolist(), ends.tolist()):
        chunk = bytes(blob[s:e])
        try:
            values.append(chunk.decode("utf-8"))
        except UnicodeDecodeError:
            values.append(chunk)  # same bytes fallback as plain utf8
    if codes.size and int(codes.max()) >= max(n_distinct, 1):
        raise ColfFormatError("dict code out of range")
    return codes.astype(np.int64), values


def _as_v2_plain(v1_payload: bytes) -> bytes:
    """Splice the v2 encoding byte into a v1-encoded payload."""
    return v1_payload[:2] + bytes([ENC_PLAIN]) + v1_payload[2:]


def encode_column_v2(values: list, dtype: str) -> tuple[bytes, bool, int]:
    """v2 adaptive encode from Python values. Returns
    (payload, has_nulls, encoding_tag)."""
    if dtype not in TYPE_TAGS:
        raise ColfFormatError(f"Unknown COLF type: {dtype}")
    n = len(values)
    nulls = np.fromiter((v is None for v in values), dtype=bool, count=n)
    has_nulls = bool(nulls.any())

    def _with_header(enc: int, data: bytes) -> bytes:
        parts = [struct.pack("<BBB", TYPE_TAGS[dtype],
                             1 if has_nulls else 0, enc)]
        if has_nulls:
            parts.append(_null_bitmap(nulls))
        parts.append(data)
        return b"".join(parts)

    if dtype == "int32":
        filled = [0 if v is None else v for v in values]
        if filled:
            lo, hi = min(filled), max(filled)
            if lo < INT32_MIN or hi > INT32_MAX:
                bad = next(v for v in filled
                           if not (INT32_MIN <= v <= INT32_MAX))
                raise ColfFormatError(
                    f"int32 overflow: value {bad} outside "
                    f"[{INT32_MIN}, {INT32_MAX}]")
        arr = np.array(filled, dtype=np.int64) if n else np.zeros(0, np.int64)
        data = _delta_encode_i32(arr)
        if data is not None:
            return _with_header(ENC_DELTA, data), has_nulls, ENC_DELTA
    elif dtype == "float64":
        arr = np.zeros(n, dtype="<f8")
        if n:
            arr[:] = [0.0 if v is None else v for v in values]
        return (_with_header(ENC_BSS, _bss_encode_f64(arr)),
                has_nulls, ENC_BSS)
    else:  # utf8
        byte_vals = np.empty(n, dtype=object)
        for i, v in enumerate(values):
            byte_vals[i] = (b"" if v is None else
                            v.encode("utf-8") if isinstance(v, str)
                            else bytes(v))
        data = _dict_encode_utf8(byte_vals) if n else None
        if data is not None:
            return _with_header(ENC_DICT, data), has_nulls, ENC_DICT

    v1_payload, _ = encode_column(values, dtype)
    return _as_v2_plain(v1_payload), has_nulls, ENC_PLAIN


def encode_column_arrow_v2(chunks: list, dtype: str) -> tuple[bytes, bool, int]:
    """v2 adaptive encode from pyarrow chunks — numpy/pyarrow.compute
    vectorized, byte-identical output to encode_column_v2."""
    import pyarrow as pa
    import pyarrow.compute as pc

    if dtype not in TYPE_TAGS:
        raise ColfFormatError(f"Unknown COLF type: {dtype}")
    n = sum(len(c) for c in chunks)
    if n == 0:
        return encode_column_v2([], dtype)
    null_np = np.concatenate([
        c.is_null().to_numpy(zero_copy_only=False) for c in chunks])
    has_nulls = bool(null_np.any())

    def _with_header(enc: int, data: bytes) -> bytes:
        parts = [struct.pack("<BBB", TYPE_TAGS[dtype],
                             1 if has_nulls else 0, enc)]
        if has_nulls:
            parts.append(_null_bitmap(null_np))
        parts.append(data)
        return b"".join(parts)

    if dtype == "int32":
        vals = np.concatenate([
            pc.fill_null(c, 0).to_numpy(zero_copy_only=False)
            for c in chunks]).astype(np.int64)
        data = _delta_encode_i32(vals)
        if data is not None:
            return _with_header(ENC_DELTA, data), has_nulls, ENC_DELTA
    elif dtype == "float64":
        vals = np.concatenate([
            pc.fill_null(c, 0.0).to_numpy(zero_copy_only=False)
            for c in chunks])
        return (_with_header(ENC_BSS, _bss_encode_f64(vals)),
                has_nulls, ENC_BSS)
    else:  # utf8
        arr = pa.chunked_array(
            [c.cast(pa.string()) for c in chunks]).combine_chunks()
        filled = pc.fill_null(arr, "")  # null rows join the "" bucket,
        # exactly like encode_column_v2's b"" placeholder
        uniq = pc.unique(filled)
        if len(uniq) <= max(1, n // 2):
            uniq = uniq.take(pc.array_sort_indices(uniq))
            codes = pc.index_in(filled, value_set=uniq).to_numpy(
                zero_copy_only=False).astype(np.int64)
            offs = np.frombuffer(uniq.buffers()[1], dtype="<i4",
                                 count=len(uniq) + 1,
                                 offset=uniq.offset * 4).astype(np.int64)
            blob_total = int(offs[-1] - offs[0])
            if blob_total <= 0xFFFFFFFF:
                starts = offs[:-1] - offs[0]
                blob = uniq.buffers()[2].to_pybytes()[offs[0]:offs[-1]]
                data = _dict_encode_from_parts(codes, starts, blob)
                return _with_header(ENC_DICT, data), has_nulls, ENC_DICT

    v1_payload, _ = encode_column_arrow(chunks, dtype)
    return _as_v2_plain(v1_payload), has_nulls, ENC_PLAIN


def _write_blocks(path: str, schema: ColfSchema,
                  blocks: list[tuple[bytes, int, bool]],
                  version: int = VERSION) -> None:
    schema_json = schema.to_json_bytes()
    meta_size = META_ENTRY_SIZE * len(schema.columns)
    header_size = 4 + len(schema_json) + meta_size
    # preamble(10) + SchemaLength(4) + schema + metadata, then blocks
    first_block_offset = 10 + 4 + len(schema_json) + meta_size

    with open(path, "wb") as f:
        f.write(MAGIC)
        f.write(struct.pack("<BBI", version, ENDIAN_LE, header_size))
        f.write(struct.pack("<I", len(schema_json)))
        f.write(schema_json)
        offset = first_block_offset
        for comp, uncomp_size, has_nulls in blocks:
            f.write(struct.pack("<QQQB", offset, len(comp), uncomp_size,
                                1 if has_nulls else 0))
            offset += len(comp)
        for comp, _, _ in blocks:
            f.write(comp)


def write_colf(path: str, schema: ColfSchema, columns: dict[str, list],
               version: int = VERSION) -> None:
    """Write one .colf file. ``columns`` maps name -> value list (None
    for NULL); every column must have schema.num_rows values.
    ``version=2`` opts into the adaptive v2 encodings (module
    docstring); the default emits reference-byte-compatible v1."""
    if version not in SUPPORTED_VERSIONS:
        raise ColfFormatError(f"Unsupported write version: {version}")
    blocks: list[tuple[bytes, int, bool]] = []
    out_cols: list[ColfColumn] = []
    for col in schema.columns:
        values = columns[col.name]
        if len(values) != schema.num_rows:
            raise ColfFormatError(
                f"column '{col.name}' has {len(values)} rows, schema says {schema.num_rows}")
        if version == VERSION_V2:
            payload, has_nulls, enc = encode_column_v2(values, col.type)
            out_cols.append(ColfColumn(col.name, col.type, col.nullable,
                                       ENC_NAMES[enc]))
        else:
            payload, has_nulls = encode_column(values, col.type)
            out_cols.append(col)
        blocks.append((zlib.compress(payload), len(payload), has_nulls))
    _write_blocks(path, ColfSchema(schema.num_rows, out_cols), blocks,
                  version=version)


def write_colf_arrow(path: str, schema: ColfSchema,
                     columns: dict[str, list],
                     version: int = VERSION) -> None:
    """Write one .colf file from pyarrow chunks: ``columns`` maps name
    -> list of pa.Array chunks. Same bytes as write_colf, no per-value
    Python (the Spark DataSourceArrowWriter hot path)."""
    if version not in SUPPORTED_VERSIONS:
        raise ColfFormatError(f"Unsupported write version: {version}")
    blocks: list[tuple[bytes, int, bool]] = []
    out_cols: list[ColfColumn] = []
    for col in schema.columns:
        chunks = columns[col.name]
        n = sum(len(c) for c in chunks)
        if n != schema.num_rows:
            raise ColfFormatError(
                f"column '{col.name}' has {n} rows, schema says {schema.num_rows}")
        if version == VERSION_V2:
            payload, has_nulls, enc = encode_column_arrow_v2(chunks, col.type)
            out_cols.append(ColfColumn(col.name, col.type, col.nullable,
                                       ENC_NAMES[enc]))
        else:
            payload, has_nulls = encode_column_arrow(chunks, col.type)
            out_cols.append(col)
        blocks.append((zlib.compress(payload), len(payload), has_nulls))
    _write_blocks(path, ColfSchema(schema.num_rows, out_cols), blocks,
                  version=version)


def encode_column_arrow(chunks: list, dtype: str) -> tuple[bytes, bool]:
    """Encode a column given as a list of pyarrow Arrays (the Spark
    Arrow write path) without materializing Python objects: null mask,
    numeric data, and string offsets/blob all come straight from Arrow
    buffers via numpy. Byte-identical output to encode_column
    (null rows keep offset 0, like /root/reference/writer.py:131)."""
    import pyarrow as pa

    if dtype not in TYPE_TAGS:
        raise ColfFormatError(f"Unknown COLF type: {dtype}")
    n = sum(len(c) for c in chunks)
    if n == 0:
        return encode_column([], dtype)
    null_np = np.concatenate([
        c.is_null().to_numpy(zero_copy_only=False) for c in chunks])
    has_nulls = bool(null_np.any())

    parts = [struct.pack("<BB", TYPE_TAGS[dtype], 1 if has_nulls else 0)]
    if has_nulls:
        parts.append(_null_bitmap(null_np))

    if dtype in ("int32", "float64"):
        import pyarrow.compute as pc

        np_dtype = "<i4" if dtype == "int32" else "<f8"
        fill = 0 if dtype == "int32" else 0.0
        vals = np.concatenate([
            pc.fill_null(c, fill).to_numpy(zero_copy_only=False) for c in chunks])
        parts.append(np.ascontiguousarray(vals, dtype=np_dtype).tobytes())
    else:  # utf8
        offsets_out = np.zeros(n, dtype="<u4")
        blob_parts: list[bytes] = []
        pos = 0
        row0 = 0
        for c in chunks:
            c = c.cast(pa.string())
            m = len(c)
            offs = np.frombuffer(c.buffers()[1], dtype="<i4",
                                 count=m + 1, offset=c.offset * 4)
            valid = ~c.is_null().to_numpy(zero_copy_only=False)
            if (~valid).any() and (offs[1:][~valid] != offs[:-1][~valid]).any():
                # Arrow allows null slots with nonzero extent (garbage
                # bytes); rare — take the value-at-a-time path instead
                all_values = [v for ch in chunks for v in ch.to_pylist()]
                return encode_column(all_values, dtype)
            rel = (offs[:-1] - offs[0] + pos).astype("<u4")
            out_slice = offsets_out[row0:row0 + m]
            out_slice[valid] = rel[valid]
            nbytes = int(offs[-1] - offs[0])
            if nbytes:
                data = c.buffers()[2]
                blob_parts.append(data.to_pybytes()[offs[0]:offs[-1]])
            pos += nbytes
            row0 += m
        if pos > 0xFFFFFFFF:
            raise ColfFormatError("utf8 blob exceeds u32 offset space")
        parts.append(offsets_out.tobytes())
        parts.extend(blob_parts)
    return b"".join(parts), has_nulls


# ---------------------------------------------------------------------------
# decode


def read_header(f) -> tuple[ColfSchema, list[ColumnMeta], int]:
    """Parse and validate preamble + header from an open binary file.
    Returns (schema, metas, header_size)."""
    f.seek(0)
    magic = f.read(4)
    if magic != MAGIC:
        raise ColfFormatError(f"Bad magic: expected {MAGIC!r}, got {magic!r}")
    version, endianness, header_size = struct.unpack("<BBI", f.read(6))
    if version not in SUPPORTED_VERSIONS:
        raise ColfFormatError(
            f"Unsupported version: {version} (expected one of {SUPPORTED_VERSIONS})")
    if endianness != ENDIAN_LE:
        raise ColfFormatError(
            f"Unsupported endianness: {endianness} (only little-endian=1)")
    (schema_len,) = struct.unpack("<I", f.read(4))
    if schema_len <= 0 or schema_len > 10_000_000:
        raise ColfFormatError(f"Suspicious schema length: {schema_len}")
    try:
        doc = json.loads(f.read(schema_len).decode("utf-8"))
    except Exception as e:
        raise ColfFormatError("Failed to parse schema JSON") from e
    schema = ColfSchema.from_json(doc)
    schema.version = version
    metas = []
    for _ in schema.columns:
        raw = f.read(META_ENTRY_SIZE)
        if len(raw) < META_ENTRY_SIZE:
            raise ColfFormatError("Truncated column metadata")
        off, comp, uncomp, has_nulls = struct.unpack("<QQQB", raw)
        metas.append(ColumnMeta(off, comp, uncomp, bool(has_nulls)))
    return schema, metas, header_size


def decode_nulls(payload: memoryview, num_rows: int, has_nulls: bool,
                 base: int = 2) -> tuple[np.ndarray, int]:
    """Returns (null mask, offset of data section within payload).
    ``base`` is the payload header size: 2 for v1, 3 for v2 (extra
    encoding byte)."""
    if not has_nulls:
        return np.zeros(num_rows, dtype=bool), base
    nbytes = (num_rows + 7) // 8
    bitmap = np.frombuffer(payload[base:base + nbytes], dtype=np.uint8)
    mask = np.unpackbits(bitmap, bitorder="little")[:num_rows].astype(bool)
    return mask, base + nbytes


def decode_column(payload: bytes, dtype: str, num_rows: int, has_nulls: bool,
                  version: int = VERSION) -> list:
    """Decode an uncompressed payload to a Python list (None for NULL).

    utf8 string ends come from the next non-null row's start offset
    (else blob end) — O(n), equivalent on reference-writer output to
    reader.py:142-153's quadratic scan."""
    mv = memoryview(payload)
    base = 2 if version == VERSION else 3
    if len(mv) < base:
        raise ColfFormatError(f"Payload shorter than {base}-byte header")
    enc = ENC_PLAIN if version == VERSION else mv[2]
    nulls, data_off = decode_nulls(mv, num_rows, has_nulls, base=base)

    if enc != ENC_PLAIN:
        data = mv[data_off:]
        if enc == ENC_DELTA and dtype == "int32":
            out = _delta_decode_i32(data, num_rows).tolist()
        elif enc == ENC_BSS and dtype == "float64":
            out = _bss_decode_f64(data, num_rows).tolist()
        elif enc == ENC_DICT and dtype == "utf8":
            codes, values = _dict_decode_utf8(data, num_rows)
            vals_np = np.empty(len(values), dtype=object)
            for i, v in enumerate(values):
                vals_np[i] = v
            out = vals_np[codes].tolist() if num_rows else []
        else:
            raise ColfFormatError(
                f"Unknown v2 encoding {enc} for dtype {dtype}")
        if has_nulls:
            for i in np.flatnonzero(nulls).tolist():
                out[i] = None
        return out

    if dtype == "int32":
        arr = np.frombuffer(mv[data_off:data_off + 4 * num_rows], dtype="<i4")
        if arr.size < num_rows:
            raise ColfFormatError("Unexpected end of int32 data")
        out = arr.tolist()
    elif dtype == "float64":
        arr = np.frombuffer(mv[data_off:data_off + 8 * num_rows], dtype="<f8")
        if arr.size < num_rows:
            raise ColfFormatError("Unexpected end of float64 data")
        out = arr.tolist()
    elif dtype == "utf8":
        offs = np.frombuffer(mv[data_off:data_off + 4 * num_rows], dtype="<u4")
        if offs.size < num_rows:
            raise ColfFormatError("Unexpected end of offsets array")
        blob = mv[data_off + 4 * num_rows:]
        valid_idx = np.flatnonzero(~nulls)
        out = [None] * num_rows
        starts = offs[valid_idx]
        ends = np.empty_like(starts)
        ends[:-1] = starts[1:]
        if starts.size:
            ends[-1] = len(blob)
        for i, s, e in zip(valid_idx.tolist(), starts.tolist(), ends.tolist()):
            chunk = bytes(blob[s:e])
            try:
                out[i] = chunk.decode("utf-8")
            except UnicodeDecodeError:
                out[i] = chunk  # reference fallback (reader.py:155-159)
    else:
        raise ColfFormatError(f"Unknown dtype: {dtype}")

    if has_nulls:
        for i in np.flatnonzero(nulls).tolist():
            out[i] = None
    return out


def _mixed_to_string_array(values: list):
    """str/bytes/None list -> pa.StringArray WITHOUT UTF-8 validation:
    the reference's bytes fallback (reader.py:155-159) yields raw
    bytes for non-UTF8 blobs, which pa.array(type=string) would
    reject — build as binary and view as string instead (same buffer
    layout; Spark's UTF8String tolerates the raw bytes)."""
    import pyarrow as pa

    bvals = [v.encode("utf-8") if isinstance(v, str) else v for v in values]
    return pa.array(bvals, type=pa.binary()).view(pa.string())


def decode_column_arrow(payload: bytes, dtype: str, num_rows: int,
                        has_nulls: bool, version: int = VERSION):
    """Decode an uncompressed payload straight to a pyarrow Array —
    numpy views over the payload buffers, no per-value Python. Falls
    back to the list decoder for non-UTF8 string blocks (the reference
    bytes-fallback, reader.py:155-159, has no Arrow representation)."""
    import pyarrow as pa

    mv = memoryview(payload)
    base = 2 if version == VERSION else 3
    if len(mv) < base:
        raise ColfFormatError(f"Payload shorter than {base}-byte header")
    enc = ENC_PLAIN if version == VERSION else mv[2]
    nulls, data_off = decode_nulls(mv, num_rows, has_nulls, base=base)
    mask = nulls if has_nulls else None

    if enc != ENC_PLAIN:
        data = mv[data_off:]
        if enc == ENC_DELTA and dtype == "int32":
            return pa.array(_delta_decode_i32(data, num_rows),
                            type=pa.int32(), mask=mask)
        if enc == ENC_BSS and dtype == "float64":
            return pa.array(_bss_decode_f64(data, num_rows),
                            type=pa.float64(), mask=mask)
        if enc == ENC_DICT and dtype == "utf8":
            codes, values = _dict_decode_utf8(data, num_rows)
            if any(not isinstance(v, str) for v in values):
                # bytes-fallback dictionary entries: no validated Arrow
                # string representation — take the list path
                return _mixed_to_string_array(
                    decode_column(payload, dtype, num_rows, has_nulls,
                                  version=version))
            dict_arr = pa.array(values, type=pa.string())
            codes_pa = pa.array(codes, type=pa.int64(), mask=mask)
            return dict_arr.take(codes_pa)
        raise ColfFormatError(f"Unknown v2 encoding {enc} for dtype {dtype}")

    if dtype == "int32":
        arr = np.frombuffer(mv[data_off:data_off + 4 * num_rows], dtype="<i4")
        if arr.size < num_rows:
            raise ColfFormatError("Unexpected end of int32 data")
        return pa.array(arr, type=pa.int32(), mask=mask)
    if dtype == "float64":
        arr = np.frombuffer(mv[data_off:data_off + 8 * num_rows], dtype="<f8")
        if arr.size < num_rows:
            raise ColfFormatError("Unexpected end of float64 data")
        return pa.array(arr, type=pa.float64(), mask=mask)
    if dtype != "utf8":
        raise ColfFormatError(f"Unknown dtype: {dtype}")

    offs = np.frombuffer(mv[data_off:data_off + 4 * num_rows], dtype="<u4")
    if offs.size < num_rows:
        raise ColfFormatError("Unexpected end of offsets array")
    blob = mv[data_off + 4 * num_rows:]
    # rebuild n+1 Arrow offsets: valid rows get [start, end) from the
    # next valid row's start (else blob end); null rows get 0 extent
    lens = np.zeros(num_rows, dtype=np.int64)
    valid_idx = np.flatnonzero(~nulls)
    if valid_idx.size:
        starts = offs[valid_idx].astype(np.int64)
        ends = np.empty_like(starts)
        ends[:-1] = starts[1:]
        ends[-1] = len(blob)
        lens[valid_idx] = ends - starts
    arrow_offs = np.zeros(num_rows + 1, dtype="<i4")
    np.cumsum(lens, out=arrow_offs[1:])
    data = blob[int(offs[valid_idx[0]]) if valid_idx.size else 0:]
    buffers = [
        pa.py_buffer(np.packbits(~nulls, bitorder="little").tobytes())
        if has_nulls else None,
        pa.py_buffer(arrow_offs.tobytes()),
        pa.py_buffer(bytes(data[:int(arrow_offs[-1])])),
    ]
    arr = pa.Array.from_buffers(pa.string(), num_rows, buffers,
                                null_count=int(nulls.sum()) if has_nulls else 0)
    try:
        arr.validate(full=True)  # rejects non-UTF8 (reference fallback case)
        return arr
    except pa.lib.ArrowInvalid:
        # version must propagate: a v2 ENC_PLAIN block has a 3-byte
        # header base; reparsing with the v1 base would leak the
        # encoding byte into the data (matching the dict-path fallback)
        return _mixed_to_string_array(
            decode_column(payload, dtype, num_rows, has_nulls,
                          version=version))


def read_columns_arrow(path: str, columns: list[str],
                       stripe: int | None = None) -> dict[str, "object"]:
    """Selective read returning pyarrow Arrays (same I/O discipline as
    read_columns: seek + read only the requested blocks). For striped
    v3 files, ``stripe`` selects one stripe (None = whole file)."""
    import pyarrow as pa

    if file_version(path) == VERSION_V3:
        return read_columns_arrow_v3(path, columns, stripe=stripe)
    if stripe not in (None, 0):
        raise ColfFormatError(
            f"stripe {stripe} requested but file is not striped (v3)")
    with open(path, "rb") as f:
        schema, metas, _ = read_header(f)
        index = {c.name: i for i, c in enumerate(schema.columns)}
        out: dict[str, object] = {}
        for name in columns:
            if name not in index:
                raise KeyError(f"Column not found: {name}")
            i = index[name]
            meta = metas[i]
            col = schema.columns[i]
            if meta.comp_size == 0:
                pa_t = {"int32": pa.int32(), "float64": pa.float64(),
                        "utf8": pa.string()}[col.type]
                out[name] = pa.nulls(schema.num_rows, type=pa_t)
                continue
            f.seek(meta.offset)
            comp = f.read(meta.comp_size)
            if len(comp) != meta.comp_size:
                raise ColfFormatError("Failed to read full compressed column block")
            payload = _decompress_block(comp, name, meta.offset)
            out[name] = decode_column_arrow(payload, col.type,
                                            schema.num_rows, meta.has_nulls,
                                            version=schema.version)
        return out


def read_columns(path: str, columns: list[str]) -> dict[str, list]:
    """Selective read: seek to and decode ONLY the requested column
    blocks (the format's raison d'être — reader.py:165-192 semantics:
    KeyError on unknown column, comp_size==0 ⇒ all-NULL)."""
    if file_version(path) == VERSION_V3:
        return {name: arr.to_pylist()
                for name, arr in read_columns_arrow_v3(path, columns).items()}
    with open(path, "rb") as f:
        schema, metas, _ = read_header(f)
        index = {c.name: i for i, c in enumerate(schema.columns)}
        out: dict[str, list] = {}
        for name in columns:
            if name not in index:
                raise KeyError(f"Column not found: {name}")
            i = index[name]
            meta = metas[i]
            if meta.comp_size == 0:
                out[name] = [None] * schema.num_rows
                continue
            f.seek(meta.offset)
            comp = f.read(meta.comp_size)
            if len(comp) != meta.comp_size:
                raise ColfFormatError("Failed to read full compressed column block")
            payload = _decompress_block(comp, name, meta.offset)
            out[name] = decode_column(payload, schema.columns[i].type,
                                      schema.num_rows, meta.has_nulls,
                                      version=schema.version)
        return out


def read_all(path: str) -> dict[str, list]:
    schema = read_schema(path)
    return read_columns(path, [c.name for c in schema.columns])


def read_schema(path: str) -> ColfSchema:
    with open(path, "rb") as f:
        if file_version(path) == VERSION_V3:
            schema, _, _ = read_header_v3(f)
            return schema
        schema, _, _ = read_header(f)
    return schema


# ---------------------------------------------------------------------------
# VERSION 3: striped (splittable) files — engine extension, opt-in.
#
# v1/v2 hold ONE block per column per file, so a file is one scan task
# and one whole-column decompression — the format's biggest limit at
# scale (SURVEY.md §4.3). v3 splits the body into independent
# STRIPES (row groups): each stripe stores its own v2-encoded column
# blocks, so a reader can plan one task per stripe and decode only
# that stripe's rows. Layout:
#
#   preamble : COLF | version u8 (=3) | endianness u8 (=1) | HeaderSize u32
#   header   : SchemaLength u32 | schema JSON (num_rows = file total)
#              | StripeCount u32
#              | per stripe: NumRows u32 + per-column 25-byte metadata
#                (same Offset/CompSize/UncompSize/HasNulls entries,
#                offsets absolute from byte 0)
#   body     : stripes sequential, column blocks sequential within
#
# Column payloads are exactly the v2 format (DataType|HasNulls|
# Encoding|bitmap|data), chosen adaptively PER STRIPE. v1-only
# readers (the reference's reader.py:54-58) reject the version byte
# loudly; nothing about v1/v2 files changes.

VERSION_V3 = 3
STRIPE_META_SIZE = 4  # NumRows u32, then META_ENTRY_SIZE per column


@dataclass
class ColfStripe:
    num_rows: int
    metas: list[ColumnMeta]


def write_colf_arrow_v3(path: str, schema: ColfSchema,
                        columns: dict[str, list],
                        stripe_rows: int) -> int:
    """Write one striped .colf file from pyarrow chunk lists; returns
    the stripe count. Stripes hold ``stripe_rows`` rows each (last one
    short). Encodings are v2-adaptive per stripe per column."""
    import pyarrow as pa

    if stripe_rows < 1:
        raise ColfFormatError("stripe_rows must be >= 1")
    n = schema.num_rows
    combined = {}
    for col in schema.columns:
        chunks = columns[col.name]
        total = sum(len(c) for c in chunks)
        if total != n:
            raise ColfFormatError(
                f"column '{col.name}' has {total} rows, schema says {n}")
        pa_t = {"int32": pa.int32(), "float64": pa.float64(),
                "utf8": pa.string()}[col.type]
        combined[col.name] = (
            pa.chunked_array([c.cast(pa_t) for c in chunks]).combine_chunks()
            if chunks else pa.array([], type=pa_t))
    n_stripes = max(1, (n + stripe_rows - 1) // stripe_rows)
    stripe_blocks: list[list[tuple[bytes, int, bool]]] = []
    stripe_nrows: list[int] = []
    for s in range(n_stripes):
        lo = s * stripe_rows
        hi = min(n, lo + stripe_rows)
        stripe_nrows.append(hi - lo)
        blocks = []
        for col in schema.columns:
            sl = combined[col.name].slice(lo, hi - lo)
            payload, has_nulls, _ = encode_column_arrow_v2([sl], col.type)
            blocks.append((zlib.compress(payload), len(payload), has_nulls))
        stripe_blocks.append(blocks)

    schema_json = ColfSchema(n, [ColfColumn(c.name, c.type, c.nullable)
                                 for c in schema.columns]).to_json_bytes()
    n_cols = len(schema.columns)
    stripes_meta_size = n_stripes * (STRIPE_META_SIZE
                                     + META_ENTRY_SIZE * n_cols)
    header_size = 4 + len(schema_json) + 4 + stripes_meta_size
    first_block_offset = 10 + header_size
    with open(path, "wb") as f:
        f.write(MAGIC)
        f.write(struct.pack("<BBI", VERSION_V3, ENDIAN_LE, header_size))
        f.write(struct.pack("<I", len(schema_json)))
        f.write(schema_json)
        f.write(struct.pack("<I", n_stripes))
        offset = first_block_offset
        for s in range(n_stripes):
            f.write(struct.pack("<I", stripe_nrows[s]))
            for comp, uncomp, has_nulls in stripe_blocks[s]:
                f.write(struct.pack("<QQQB", offset, len(comp), uncomp,
                                    1 if has_nulls else 0))
                offset += len(comp)
        for blocks in stripe_blocks:
            for comp, _, _ in blocks:
                f.write(comp)
    return n_stripes


def read_header_v3(f) -> tuple[ColfSchema, list[ColfStripe], int]:
    """Parse a v3 header (call after read_header raised or by checking
    the version byte; this re-validates from byte 0)."""
    f.seek(0)
    if f.read(4) != MAGIC:
        raise ColfFormatError("Bad magic")
    version, endianness, header_size = struct.unpack("<BBI", f.read(6))
    if version != VERSION_V3:
        raise ColfFormatError(f"Not a v3 file (version={version})")
    if endianness != ENDIAN_LE:
        raise ColfFormatError(f"Unsupported endianness: {endianness}")
    (schema_len,) = struct.unpack("<I", f.read(4))
    if schema_len <= 0 or schema_len > 10_000_000:
        raise ColfFormatError(f"Suspicious schema length: {schema_len}")
    try:
        doc = json.loads(f.read(schema_len).decode("utf-8"))
    except Exception as e:
        raise ColfFormatError("Failed to parse schema JSON") from e
    schema = ColfSchema.from_json(doc)
    schema.version = VERSION_V3
    (n_stripes,) = struct.unpack("<I", f.read(4))
    if n_stripes > 10_000_000:
        raise ColfFormatError(f"Suspicious stripe count: {n_stripes}")
    stripes = []
    total = 0
    for _ in range(n_stripes):
        raw = f.read(STRIPE_META_SIZE)
        if len(raw) < STRIPE_META_SIZE:
            raise ColfFormatError("Truncated stripe metadata")
        (nrows,) = struct.unpack("<I", raw)
        metas = []
        for _ in schema.columns:
            raw = f.read(META_ENTRY_SIZE)
            if len(raw) < META_ENTRY_SIZE:
                raise ColfFormatError("Truncated stripe column metadata")
            off, comp, uncomp, has_nulls = struct.unpack("<QQQB", raw)
            metas.append(ColumnMeta(off, comp, uncomp, bool(has_nulls)))
        stripes.append(ColfStripe(nrows, metas))
        total += nrows
    if total != schema.num_rows:
        raise ColfFormatError(
            f"Stripe rows sum to {total}, schema says {schema.num_rows}")
    return schema, stripes, header_size


def file_version(path: str) -> int:
    with open(path, "rb") as f:
        if f.read(4) != MAGIC:
            raise ColfFormatError("Bad magic")
        (version,) = struct.unpack("<B", f.read(1))
    return version


def read_stripes_info(path: str) -> list[int]:
    """Row counts per stripe (v3); single-stripe view for v1/v2."""
    with open(path, "rb") as f:
        if file_version(path) == VERSION_V3:
            _, stripes, _ = read_header_v3(f)
            return [s.num_rows for s in stripes]
        schema, _, _ = read_header(f)
        return [schema.num_rows]


def read_columns_arrow_v3(path: str, columns: list[str],
                          stripe: int | None = None) -> dict[str, "object"]:
    """Selective stripe read of a v3 file: seek + decompress only the
    requested columns of the requested stripe (all stripes when
    ``stripe`` is None), returning pyarrow Arrays."""
    import pyarrow as pa

    with open(path, "rb") as f:
        schema, stripes, _ = read_header_v3(f)
        index = {c.name: i for i, c in enumerate(schema.columns)}
        for name in columns:
            if name not in index:
                raise KeyError(f"Column not found: {name}")
        wanted_stripes = (range(len(stripes)) if stripe is None
                          else [stripe])
        if stripe is not None and not (0 <= stripe < len(stripes)):
            raise ColfFormatError(
                f"stripe {stripe} out of range (file has {len(stripes)})")
        parts: dict[str, list] = {name: [] for name in columns}
        for si in wanted_stripes:
            st = stripes[si]
            for name in columns:
                i = index[name]
                meta = st.metas[i]
                col = schema.columns[i]
                f.seek(meta.offset)
                comp = f.read(meta.comp_size)
                if len(comp) != meta.comp_size:
                    raise ColfFormatError(
                        "Failed to read full compressed column block")
                payload = _decompress_block(comp, name, meta.offset)
                parts[name].append(decode_column_arrow(
                    payload, col.type, st.num_rows, meta.has_nulls,
                    version=VERSION_V2))
        return {
            name: (pa.chunked_array(arrs).combine_chunks() if len(arrs) != 1
                   else arrs[0])
            for name, arrs in parts.items()
        }
