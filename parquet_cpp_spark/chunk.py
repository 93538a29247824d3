"""Self-describing encoded column-chunk blobs + per-chunk statistics.

A chunk is our analog of the reference's column chunk within a row group
(``/root/reference/src/parquet/metadata.h:90-117``): all values of one column
for one Spark partition, encoded as one binary blob plus metadata columns.
The blob layout mirrors a V1 data page preceded by an optional dictionary
page (``/root/reference/src/parquet/column_writer.cc:354-431``):

    header   := magic "PQS1" | u8 version | u8 codec | u8 phys
                | u8 compression | u8 flags
                | u32 n_rows | u32 n_values | u32 null_count
    sections := [u32 n_slots][u32 len + rep-RLE][u32 len + def-RLE] (LEVELS)
                [u32 type_length]                             (if FLBA)
                [u32 len + dict page][u32 n_dict_values]      (if DICT)
                [u32 len + payload]
                [u32 n_plain_values][u32 len + plain payload] (if FALLBACK)
    sections are block-compressed as a unit when compression != 0, like the
    reference's assembled pages (column_writer.cc:196-212).

Statistics (min/max/null_count) follow ``EncodedStatistics``
(``/root/reference/src/parquet/statistics.h:34-82``), computed vectorized.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from .kernels import (ba, bitpack, bytearray_codecs, delta, dictionary, fsst,
                      plain, rle)
from . import levels as levels_mod

MAGIC = b"PQS1"
VERSION = 2  # v2: u8 block-compression field in the header

# Codec ids reuse the parquet Encoding enum where one exists
# (/root/reference/src/parquet/types.h:97-109); FSST is ours.
PLAIN = 0
PLAIN_DICTIONARY = 2
RLE = 3
DELTA_BINARY_PACKED = 5
DELTA_LENGTH_BYTE_ARRAY = 6
DELTA_BYTE_ARRAY = 7
RLE_DICTIONARY = 8
FSST = 200

CODEC_NAMES = {
    PLAIN: "PLAIN",
    PLAIN_DICTIONARY: "PLAIN_DICTIONARY",
    RLE: "RLE",
    DELTA_BINARY_PACKED: "DELTA_BINARY_PACKED",
    DELTA_LENGTH_BYTE_ARRAY: "DELTA_LENGTH_BYTE_ARRAY",
    DELTA_BYTE_ARRAY: "DELTA_BYTE_ARRAY",
    RLE_DICTIONARY: "RLE_DICTIONARY",
    FSST: "FSST",
}
CODEC_IDS = {v: k for k, v in CODEC_NAMES.items()}

# Physical types (/root/reference/src/parquet/types.h:49-60). INT96 is
# carried as a 12-byte FLBA ("flba:12"), matching its storage layout.
BOOLEAN, INT32, INT64, INT96, FLOAT, DOUBLE, BYTE_ARRAY, FLBA = range(8)
PHYS_NAMES = {INT32: "int32", INT64: "int64", FLOAT: "float",
              DOUBLE: "double", BYTE_ARRAY: "byte_array", BOOLEAN: "boolean",
              FLBA: "flba"}
PHYS_IDS = {v: k for k, v in PHYS_NAMES.items()}

# Block compression codecs, orthogonal to encodings
# (/root/reference/src/parquet/types.h:112-114; page compress
# column_writer.cc:196-212). GZIP here = raw deflate via zlib; SNAPPY /
# LZ4 / ZSTD are used when their Python modules are importable.
UNCOMPRESSED, SNAPPY, GZIP, LZO, BROTLI, LZ4, ZSTD = range(7)
COMPRESSION_NAMES = {UNCOMPRESSED: "UNCOMPRESSED", SNAPPY: "SNAPPY",
                     GZIP: "GZIP", BROTLI: "BROTLI", LZ4: "LZ4",
                     ZSTD: "ZSTD"}
COMPRESSION_IDS = {v: k for k, v in COMPRESSION_NAMES.items()}

FLAG_HAS_LEVELS = 1
FLAG_FALLBACK = 2
FLAG_HAS_NULLS = 4  # flat OPTIONAL column: def-level section present

_HEADER_LEN = 4 + 1 + 1 + 1 + 1 + 1 + 4 + 4 + 4


def _compress(payload: bytes, compression: int) -> bytes:
    if compression == UNCOMPRESSED:
        return payload
    if compression == GZIP:
        import zlib
        return zlib.compress(payload, 6)
    if compression == SNAPPY:
        import snappy
        return snappy.compress(payload)
    if compression == ZSTD:
        import zstandard
        return zstandard.ZstdCompressor().compress(payload)
    if compression == LZ4:
        import lz4.frame
        return lz4.frame.compress(payload)
    raise ValueError(f"unsupported compression {compression}")


def _decompress(payload: bytes, compression: int) -> bytes:
    if compression == UNCOMPRESSED:
        return payload
    if compression == GZIP:
        import zlib
        return zlib.decompress(payload)
    if compression == SNAPPY:
        import snappy
        return snappy.decompress(payload)
    if compression == ZSTD:
        import zstandard
        return zstandard.ZstdDecompressor().decompress(payload)
    if compression == LZ4:
        import lz4.frame
        return lz4.frame.decompress(payload)
    raise ValueError(f"unsupported compression {compression}")


def available_compressions() -> list[int]:
    """UNCOMPRESSED and GZIP always (zlib is stdlib); others if importable."""
    out = [UNCOMPRESSED, GZIP]
    for mod, cid in (("snappy", SNAPPY), ("zstandard", ZSTD),
                     ("lz4.frame", LZ4)):
        try:
            __import__(mod)
            out.append(cid)
        except Exception:
            pass
    return out


@dataclass
class ChunkStats:
    min_val: str | None
    max_val: str | None
    null_count: int


@dataclass
class EncodedChunk:
    codec: int
    phys: int
    n_rows: int
    n_values: int
    raw_bytes: int
    blob: bytes
    encodings: list[str] = field(default_factory=list)
    stats: ChunkStats | None = None

    @property
    def enc_bytes(self) -> int:
        return len(self.blob)

    @property
    def codec_name(self) -> str:
        return CODEC_NAMES[self.codec]


def _sec(payload: bytes) -> bytes:
    return len(payload).to_bytes(4, "little") + payload


def compute_stats(values, phys: str) -> ChunkStats:
    """min/max/null_count as canonical strings (the reference plain-encodes
    min/max; we store a string form for the manifest columns). Skips stats
    whose encoded form exceeds 4096 bytes, like the reference's
    max_statistics_size guard (``column_writer.cc:441-446``)."""
    if phys in ("byte_array", "flba"):
        if len(values) == 0:
            return ChunkStats(None, None, 0)
        if isinstance(values, ba.ByteArrayView):
            mn, mx = ba.minmax(values)
        else:
            mn = min(values)
            mx = max(values)
        if len(mn) > 4096 or len(mx) > 4096:
            return ChunkStats(None, None, 0)
        return ChunkStats(mn.decode("utf-8", "replace"),
                          mx.decode("utf-8", "replace"), 0)
    if phys == "boolean":
        arr = np.asarray(values, dtype=bool)
        if arr.size == 0:
            return ChunkStats(None, None, 0)
        return ChunkStats(str(bool(arr.min())), str(bool(arr.max())), 0)
    arr = np.asarray(values)
    if arr.size == 0:
        return ChunkStats(None, None, 0)
    return ChunkStats(str(arr.min()), str(arr.max()), 0)


def _encode_int_payload(values: np.ndarray, codec: int, phys: str,
                        dict_size_limit: int) -> tuple[bytes, list[str], bool, dict]:
    """Returns (sections, encodings, fallback, extras)."""
    if codec == PLAIN:
        return _sec(plain.encode_fixed(values, phys)), ["PLAIN"], False, {}
    if codec == DELTA_BINARY_PACKED:
        return _sec(delta.encode(values)), ["DELTA_BINARY_PACKED"], False, {}
    if codec == RLE:
        mx = int(values.max()) if len(values) else 0
        mn = int(values.min()) if len(values) else 0
        if mn < 0:
            raise ValueError("RLE direct coding requires non-negative values")
        bw = max(1, bitpack.width_for_max(mx))
        payload = bytes([bw]) + rle.encode(values, bw)
        return _sec(payload), ["RLE"], False, {}
    if codec == RLE_DICTIONARY:
        enc = dictionary.encode(values, phys, dict_size_limit)
        secs = _sec(enc.dict_blob) + enc.n_dict_values.to_bytes(4, "little")
        secs += _sec(enc.indices_blob)
        encodings = ["PLAIN_DICTIONARY", "RLE"]
        if enc.fallback:
            secs += enc.n_plain_values.to_bytes(4, "little")
            secs += _sec(enc.plain_blob)
            encodings = ["PLAIN_DICTIONARY", "PLAIN", "RLE"]
        return secs, encodings, enc.fallback, {"num_entries": enc.num_entries}
    raise ValueError(f"codec {codec} unsupported for {phys}")


def _encode_bytes_payload(values: list[bytes], codec: int,
                          dict_size_limit: int) -> tuple[bytes, list[str], bool]:
    if codec == PLAIN:
        return _sec(plain.encode_byte_array(values)), ["PLAIN"], False
    if codec == DELTA_LENGTH_BYTE_ARRAY:
        return _sec(bytearray_codecs.encode_delta_length(values)), \
            ["DELTA_LENGTH_BYTE_ARRAY"], False
    if codec == DELTA_BYTE_ARRAY:
        return _sec(bytearray_codecs.encode_delta_byte_array(values)), \
            ["DELTA_BYTE_ARRAY"], False
    if codec == FSST:
        return _sec(fsst.encode(values)), ["FSST"], False
    if codec == RLE_DICTIONARY:
        enc = dictionary.encode(values, "byte_array", dict_size_limit)
        secs = _sec(enc.dict_blob) + enc.n_dict_values.to_bytes(4, "little")
        secs += _sec(enc.indices_blob)
        encodings = ["PLAIN_DICTIONARY", "RLE"]
        if enc.fallback:
            secs += enc.n_plain_values.to_bytes(4, "little")
            secs += _sec(enc.plain_blob)
            encodings = ["PLAIN_DICTIONARY", "PLAIN", "RLE"]
        return secs, encodings, enc.fallback
    raise ValueError(f"codec {codec} unsupported for byte_array")


def build_levels_sections(row_lengths: np.ndarray) -> tuple[bytes, int]:
    """Level sections for a list column: (bytes, n_slots). Computed once per
    chunk and shared across codec-runoff candidates (levels don't depend on
    the value codec)."""
    rep, deflev = levels_mod.levels_from_lengths(row_lengths)
    sections = len(rep).to_bytes(4, "little")  # level slot count
    sections += rle.encode_length_prefixed(rep, 1)
    sections += rle.encode_length_prefixed(deflev, 1)
    return sections, len(rep)


def _parse_phys(phys: str) -> tuple[str, int]:
    """'flba:12' -> ('flba', 12); others -> (phys, 0)."""
    if phys.startswith("flba"):
        _, _, ln = phys.partition(":")
        return "flba", int(ln or 0)
    return phys, 0


def _encode_boolean_payload(values: np.ndarray, codec: int) -> tuple[bytes, list[str]]:
    if codec == PLAIN:
        return _sec(plain.encode_boolean(values)), ["PLAIN"]
    if codec == RLE:
        payload = bytes([1]) + rle.encode(values.astype(np.uint8), 1)
        return _sec(payload), ["RLE"]
    if codec in (RLE_DICTIONARY, PLAIN_DICTIONARY):
        # parity with the reference: dictionary-of-boolean is rejected
        # (encoding-test.cc:304-309; ColumnWriter::Make skips dict for
        # BOOLEAN, column_writer.cc:551-590)
        raise ValueError("dictionary encoding not supported for boolean")
    raise ValueError(f"codec {codec} unsupported for boolean")


def _decode_boolean_payload(mv, pos: int, codec: int, n_values: int):
    pos += 4  # section length prefix
    if codec == PLAIN:
        values, _ = plain.decode_boolean(mv, n_values, pos)
        return values
    if codec == RLE:
        bw = mv[pos]
        vals, _ = rle.decode(mv, n_values, bw, pos + 1, out_dtype=np.uint8)
        return vals.astype(bool)
    raise ValueError(f"codec {codec} unsupported for boolean")


def _encode_flba_payload(values: list[bytes], codec: int, type_length: int,
                         dict_size_limit: int) -> tuple[bytes, list[str], bool]:
    if not type_length and values:
        type_length = len(values[0])
    tl = type_length.to_bytes(4, "little")
    if codec == PLAIN:
        return tl + _sec(plain.encode_flba(values, type_length)), \
            ["PLAIN"], False
    if codec == RLE_DICTIONARY:
        enc = dictionary.encode(values, "byte_array", dict_size_limit)
        secs = tl + _sec(enc.dict_blob) + enc.n_dict_values.to_bytes(4, "little")
        secs += _sec(enc.indices_blob)
        encodings = ["PLAIN_DICTIONARY", "RLE"]
        if enc.fallback:
            secs += enc.n_plain_values.to_bytes(4, "little")
            secs += _sec(enc.plain_blob)
            encodings = ["PLAIN_DICTIONARY", "PLAIN", "RLE"]
        return secs, encodings, enc.fallback
    raise ValueError(f"codec {codec} unsupported for flba")


def _decode_flba_payload(mv, pos: int, codec: int, n_values: int,
                         fallback: bool = False):
    type_length = int.from_bytes(mv[pos: pos + 4], "little")
    pos += 4
    if codec == PLAIN:
        pos += 4  # section length prefix
        values, _ = plain.decode_flba(mv, n_values, type_length, pos)
        return values
    if codec == RLE_DICTIONARY:
        return ba.to_list(_decode_bytes_payload(mv, pos, codec, n_values,
                                                fallback))
    raise ValueError(f"codec {codec} unsupported for flba")


def encode_chunk(values, phys: str, codec: int, *,
                 row_lengths: np.ndarray | None = None,
                 dict_size_limit: int = dictionary.DEFAULT_DICT_SIZE_LIMIT,
                 with_stats: bool = True,
                 compression: int = UNCOMPRESSED,
                 valid_mask: np.ndarray | None = None,
                 levels_sections: tuple[bytes, int] | None = None) -> EncodedChunk:
    """Encode one column chunk. ``row_lengths`` is set for the list column
    (tokens): values are the flattened elements and levels are emitted.
    ``compression`` applies a block codec over all sections (the reference
    compresses the assembled page the same way, column_writer.cc:196-212).
    ``phys`` accepts 'flba:N' for FIXED_LEN_BYTE_ARRAY (INT96 == 'flba:12').

    ``valid_mask`` makes a flat column OPTIONAL: values are passed *spaced*
    (one slot per row, nulls arbitrary) and stored dense after mask
    selection — the reference's ``PutSpaced`` contract
    (``encoding.h:68-76``); the mask becomes a def-level stream
    (``column_reader.cc:348-368``) and null_count lands in the stats."""
    has_levels = row_lengths is not None
    phys, type_length = _parse_phys(phys)
    null_count = 0
    if phys == "byte_array":
        values = ba.as_view(values)
    if valid_mask is not None:
        if has_levels:
            raise ValueError("valid_mask applies to flat columns only")
        valid_mask = np.ascontiguousarray(valid_mask, dtype=bool)
        null_count = int((~valid_mask).sum())
        if phys == "byte_array":
            values = ba.take(values, np.flatnonzero(valid_mask))
        elif phys == "flba":
            values = [v for v, ok in zip(values, valid_mask) if ok]
        else:
            values = np.asarray(values)[valid_mask]
    if phys == "byte_array":
        n_values = len(values)
        raw = values.total_bytes + 4 * n_values
    elif phys == "flba":
        n_values = len(values)
        raw = sum(len(v) for v in values)
    elif phys == "boolean":
        values = np.ascontiguousarray(values, dtype=bool)
        n_values = len(values)
        raw = n_values  # reference raw form: 1 byte/bool
    else:
        values = np.ascontiguousarray(values)
        n_values = len(values)
        raw = values.dtype.itemsize * n_values
    n_rows = len(row_lengths) if has_levels else n_values

    sections = b""
    encodings: list[str] = []
    fallback = False
    if has_levels:
        if levels_sections is None:
            levels_sections = build_levels_sections(row_lengths)
        lv_bytes, n_slots = levels_sections
        sections += lv_bytes
        encodings.append("RLE")  # level encoding, as the reference records it
        raw += 2 * n_slots  # levels are int16 in the reference's raw form
    if valid_mask is not None:
        n_rows = len(valid_mask)
        deflev = valid_mask.astype(np.int8)
        sections += n_rows.to_bytes(4, "little")
        sections += rle.encode_length_prefixed(deflev, 1)
        encodings.append("RLE")
        raw += 2 * n_rows

    if phys == "byte_array":
        secs, encs, fallback = _encode_bytes_payload(values, codec,
                                                     dict_size_limit)
    elif phys == "flba":
        secs, encs, fallback = _encode_flba_payload(values, codec,
                                                    type_length,
                                                    dict_size_limit)
    elif phys == "boolean":
        secs, encs = _encode_boolean_payload(values, codec)
    else:
        secs, encs, fallback, _extras = _encode_int_payload(
            values, codec, phys, dict_size_limit)
    sections += secs
    encodings.extend(e for e in encs if e not in encodings)

    if compression != UNCOMPRESSED:
        sections = _compress(sections, compression)

    flags = (FLAG_HAS_LEVELS if has_levels else 0) | \
        (FLAG_FALLBACK if fallback else 0) | \
        (FLAG_HAS_NULLS if valid_mask is not None else 0)
    header = (MAGIC + bytes([VERSION, codec, PHYS_IDS[phys], compression,
                             flags])
              + n_rows.to_bytes(4, "little")
              + n_values.to_bytes(4, "little")
              + null_count.to_bytes(4, "little"))
    stats = compute_stats(values, phys) if with_stats else None
    if stats is not None:
        stats.null_count = null_count
    return EncodedChunk(codec, PHYS_IDS[phys], n_rows, n_values, raw,
                        header + sections, encodings, stats)


@dataclass
class DecodedChunk:
    values: "np.ndarray | list[bytes]"
    row_lengths: np.ndarray | None
    codec: int
    phys: int
    n_rows: int
    n_values: int
    valid_mask: np.ndarray | None = None


def decode_chunk(blob) -> DecodedChunk:
    mv = memoryview(blob)
    if mv.format != "B":
        mv = mv.cast("B")  # pyarrow Buffers expose signed 'b' views
    if bytes(mv[:4]) != MAGIC:
        raise ValueError("bad chunk magic")
    version, codec, phys_id = mv[4], mv[5], mv[6]
    if version == VERSION:
        compression, flags = mv[7], mv[8]
        n_rows = int.from_bytes(mv[9:13], "little")
        n_values = int.from_bytes(mv[13:17], "little")
        header_len = _HEADER_LEN
    elif version == 1:  # pre-compression header (forward compat for resume)
        compression, flags = UNCOMPRESSED, mv[7]
        n_rows = int.from_bytes(mv[8:12], "little")
        n_values = int.from_bytes(mv[12:16], "little")
        header_len = _HEADER_LEN - 1
    else:
        raise ValueError(f"unsupported chunk version {version}")
    phys = PHYS_NAMES[phys_id]

    if compression != UNCOMPRESSED:
        mv = memoryview(_decompress(bytes(mv[header_len:]), compression))
        pos = 0
    else:
        pos = header_len

    row_lengths = None
    if flags & FLAG_HAS_LEVELS:
        n_slots = int.from_bytes(mv[pos: pos + 4], "little")
        pos += 4
        rep, pos = rle.decode_length_prefixed(mv, n_slots, 1, pos)
        deflev, pos = rle.decode_length_prefixed(mv, n_slots, 1, pos)
        row_lengths = levels_mod.lengths_from_levels(rep, deflev)
    valid_mask = None
    if flags & FLAG_HAS_NULLS:
        n_slots = int.from_bytes(mv[pos: pos + 4], "little")
        pos += 4
        dl, pos = rle.decode_length_prefixed(mv, n_slots, 1, pos,
                                             out_dtype=np.uint8)
        valid_mask = dl.astype(bool)

    fallback = bool(flags & FLAG_FALLBACK)
    if phys == "byte_array":
        values = _decode_bytes_payload(mv, pos, codec, n_values, fallback)
    elif phys == "flba":
        values = _decode_flba_payload(mv, pos, codec, n_values, fallback)
    elif phys == "boolean":
        values = _decode_boolean_payload(mv, pos, codec, n_values)
    else:
        values = _decode_int_payload(mv, pos, codec, phys, n_values, fallback)
    return DecodedChunk(values, row_lengths, codec, phys_id, n_rows,
                        n_values, valid_mask)


def _decode_int_payload(mv, pos: int, codec: int, phys: str, n_values: int,
                        fallback: bool = False):
    sec_len = int.from_bytes(mv[pos: pos + 4], "little")
    pos += 4
    if codec == PLAIN:
        values, _ = plain.decode_fixed(mv, n_values, phys, pos)
        return values
    if codec == DELTA_BINARY_PACKED:
        dt = np.int32 if phys == "int32" else np.int64
        values, _ = delta.decode(mv[pos: pos + sec_len], out_dtype=dt)
        return values
    if codec == RLE:
        bw = mv[pos]
        dt = np.int32 if phys == "int32" else np.int64
        values, _ = rle.decode(mv, n_values, bw, pos + 1, out_dtype=dt)
        return values
    if codec == RLE_DICTIONARY:
        dict_blob = bytes(mv[pos: pos + sec_len])
        pos += sec_len
        n_dict_values = int.from_bytes(mv[pos: pos + 4], "little")
        pos += 4
        idx_len = int.from_bytes(mv[pos: pos + 4], "little")
        pos += 4
        indices_blob = bytes(mv[pos: pos + idx_len])
        pos += idx_len
        n_plain = 0
        plain_blob = b""
        if fallback:
            n_plain = int.from_bytes(mv[pos: pos + 4], "little")
            pos += 4
            pl_len = int.from_bytes(mv[pos: pos + 4], "little")
            pos += 4
            plain_blob = bytes(mv[pos: pos + pl_len])
        # dictionary entry count: the dict blob is PLAIN fixed-width
        itemsize = 4 if phys in ("int32", "float") else 8
        num_entries = len(dict_blob) // itemsize
        vals = dictionary.decode(
            None, phys, dict_blob=dict_blob, indices_blob=indices_blob,
            num_entries=num_entries, n_dict_values=n_dict_values,
            plain_blob=plain_blob, n_plain_values=n_plain)
        dt = {"int32": np.int32, "int64": np.int64,
              "float": np.float32, "double": np.float64}[phys]
        return np.asarray(vals).astype(dt, copy=False)
    raise ValueError(f"codec {codec} unsupported for {phys}")


def _decode_bytes_payload(mv, pos: int, codec: int, n_values: int,
                          fallback: bool = False):
    """byte_array payload -> ba.ByteArrayView (columnar; consumers convert
    to Arrow zero-copy or to list[bytes] at the boundary)."""
    sec_len = int.from_bytes(mv[pos: pos + 4], "little")
    pos += 4
    if codec == PLAIN:
        values, _ = plain.decode_byte_array_view(mv, n_values, pos)
        return values
    if codec == DELTA_LENGTH_BYTE_ARRAY:
        values, _ = bytearray_codecs.decode_delta_length_view(mv, pos)
        return values
    if codec == DELTA_BYTE_ARRAY:
        values, _ = bytearray_codecs.decode_delta_byte_array_view(mv, pos)
        return values
    if codec == FSST:
        values, _ = fsst.decode_view(mv, pos)
        return values
    if codec == RLE_DICTIONARY:
        dict_blob = bytes(mv[pos: pos + sec_len])
        pos += sec_len
        n_dict_values = int.from_bytes(mv[pos: pos + 4], "little")
        pos += 4
        idx_len = int.from_bytes(mv[pos: pos + 4], "little")
        pos += 4
        indices_blob = bytes(mv[pos: pos + idx_len])
        pos += idx_len
        n_plain = 0
        plain_blob = b""
        if fallback:
            n_plain = int.from_bytes(mv[pos: pos + 4], "little")
            pos += 4
            pl_len = int.from_bytes(mv[pos: pos + 4], "little")
            pos += 4
            plain_blob = bytes(mv[pos: pos + pl_len])
        num_entries = _count_byte_array_entries(dict_blob)
        return dictionary.decode(
            None, "byte_array", dict_blob=dict_blob, indices_blob=indices_blob,
            num_entries=num_entries, n_dict_values=n_dict_values,
            plain_blob=plain_blob, n_plain_values=n_plain)
    raise ValueError(f"codec {codec} unsupported for byte_array")


def _count_byte_array_entries(blob: bytes) -> int:
    n = 0
    pos = 0
    total = len(blob)
    while pos < total:
        ln = int.from_bytes(blob[pos: pos + 4], "little")
        pos += 4 + ln
        n += 1
    return n
