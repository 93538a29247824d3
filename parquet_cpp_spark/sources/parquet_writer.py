"""Minimal parquet FILE-format writer built on the engine's own kernels.

Write-side mirror of ``sources.parquet_format`` (the golden-file reader):
emits a PAR1 file — V1 data pages, thrift-compact footer — that pyarrow /
parquet-cpp read back. Layout follows the reference's file writer
(``/root/reference/src/parquet/file_writer.cc:270-280``: PAR1 magic, column
chunks, FileMetaData + u32 footer length + PAR1) and the public
parquet-format spec; the thrift compact protocol is implemented here from
that spec, symmetric with the reader in ``parquet_format._Compact``.

Scope (interop parity-plus — the production sink is the chunk/manifest
dataset, SURVEY §1.1): flat schemas, REQUIRED or OPTIONAL leaves, PLAIN or
dictionary encoding (PLAIN dict page + PLAIN_DICTIONARY data pages, the
format-1.0 pairing), UNCOMPRESSED, one row group. Fails loudly on anything
out of scope. Page payloads come from the engine's own kernels (``plain``,
``rle``, ``dictionary``) — this is the same code path the chunk blobs use,
so a pyarrow read-back of this file cross-checks those kernels against a
second, independent implementation.
"""

from __future__ import annotations

import numpy as np

from ..kernels import ba, dictionary, plain, rle

MAGIC = b"PAR1"

# thrift compact element type ids (same table as parquet_format's reader)
_TRUE, _FALSE, _BYTE, _I16, _I32, _I64, _DOUBLE, _BINARY, _LIST = range(1, 10)
_STRUCT = 12

# parquet-format enums
_TYPE_IDS = {"boolean": 0, "int32": 1, "int64": 2, "float": 4, "double": 5,
             "byte_array": 6}
ENC_PLAIN, ENC_PLAIN_DICT, ENC_RLE = 0, 2, 3
_PAGE_DATA, _PAGE_DICT = 0, 2


def _uvarint(buf: bytearray, v: int) -> None:
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            buf.append(b | 0x80)
        else:
            buf.append(b)
            return


def _zigzag(buf: bytearray, v: int) -> None:
    _uvarint(buf, (v << 1) ^ (v >> 63))


def _value(buf: bytearray, ctype: int, val) -> None:
    if ctype in (_TRUE, _FALSE):
        return  # boolean value is carried by the type id itself
    if ctype in (_I16, _I32, _I64):
        _zigzag(buf, int(val))
    elif ctype == _BINARY:
        data = val if isinstance(val, (bytes, bytearray)) else val.encode()
        _uvarint(buf, len(data))
        buf += data
    elif ctype == _LIST:
        etype, items = val
        if len(items) < 15:
            buf.append((len(items) << 4) | etype)
        else:
            buf.append(0xF0 | etype)
            _uvarint(buf, len(items))
        for item in items:
            _value(buf, etype, item)
    elif ctype == _STRUCT:
        _struct(buf, val)
    else:
        raise ValueError(f"unsupported thrift compact type {ctype}")


def _struct(buf: bytearray, fields: list[tuple[int, int, object]]) -> None:
    """fields: (field_id, ctype, value) in ascending field-id order."""
    last = 0
    for fid, ctype, val in fields:
        delta = fid - last
        if 0 < delta <= 15:
            buf.append((delta << 4) | ctype)
        else:
            buf.append(ctype)
            _zigzag(buf, fid)
        _value(buf, ctype, val)
        last = fid
    buf.append(0)  # STOP


def _page_header(page_type: int, raw: int, comp: int,
                 inner_fid: int, inner: list) -> bytes:
    buf = bytearray()
    _struct(buf, [(1, _I32, page_type), (2, _I32, raw), (3, _I32, comp),
                  (inner_fid, _STRUCT, inner)])
    return bytes(buf)


def _plain_values(values, phys: str) -> bytes:
    if phys == "byte_array":
        return plain.encode_byte_array(values)
    if phys == "boolean":
        return plain.encode_boolean(np.asarray(values))
    return plain.encode_fixed(np.asarray(values), phys)


class _Column:
    def __init__(self, name: str, phys: str, values, valid=None,
                 use_dictionary: bool = False):
        if phys not in _TYPE_IDS:
            raise ValueError(f"writer supports {sorted(_TYPE_IDS)}, "
                             f"not {phys!r}")
        self.name = name
        self.phys = phys
        self.valid = None if valid is None \
            else np.asarray(valid, dtype=bool)
        self.n_slots = len(values) if self.valid is None else len(self.valid)
        if self.valid is not None and len(values) != self.n_slots:
            raise ValueError("values must be slot-aligned (one per row, "
                             "nulls included) when valid is given")
        self.use_dictionary = use_dictionary
        # dense values (nulls removed) — the page payload form
        if self.valid is None:
            self.dense = values
        elif phys == "byte_array":
            view = ba.as_view(values)
            self.dense = ba.take(view, np.flatnonzero(self.valid))
        else:
            self.dense = np.asarray(values)[self.valid]


def write_file(path: str, columns: list[tuple], num_rows: int,
               created_by: str = "parquet_cpp_spark") -> None:
    """Write one row group of flat columns as a readable PAR1 file.

    ``columns``: (name, phys, values[, valid[, use_dictionary]]) tuples.
    ``values`` are slot-aligned when ``valid`` is given (entries at null
    slots are ignored); byte_array values may be list[bytes] or a
    ``ba.ByteArrayView``.
    """
    cols = [_Column(*spec) for spec in columns]
    for c in cols:
        if c.n_slots != num_rows:
            raise ValueError(f"column {c.name}: {c.n_slots} slots, "
                             f"expected {num_rows}")

    buf = bytearray(MAGIC)
    chunk_meta = []
    for c in cols:
        levels = b""
        if c.valid is not None:
            levels = rle.encode_length_prefixed(
                c.valid.astype(np.int8), 1)
        dict_page_offset = None
        chunk_start = len(buf)
        if c.use_dictionary:
            enc = dictionary.encode(c.dense, c.phys,
                                    dict_size_limit=1 << 62)
            if enc.fallback:
                raise ValueError("dictionary fallback out of writer scope")
            dict_page_offset = len(buf)
            hdr = _page_header(_PAGE_DICT, len(enc.dict_blob),
                               len(enc.dict_blob), 7,
                               [(1, _I32, enc.num_entries),
                                (2, _I32, ENC_PLAIN_DICT)])
            buf += hdr
            buf += enc.dict_blob
            payload = levels + enc.indices_blob
            encoding = ENC_PLAIN_DICT
            encodings = [ENC_PLAIN_DICT, ENC_RLE]
        else:
            payload = levels + _plain_values(c.dense, c.phys)
            encoding = ENC_PLAIN
            encodings = [ENC_PLAIN, ENC_RLE]
        data_page_offset = len(buf)
        hdr = _page_header(_PAGE_DATA, len(payload), len(payload), 5,
                           [(1, _I32, c.n_slots), (2, _I32, encoding),
                            (3, _I32, ENC_RLE), (4, _I32, ENC_RLE)])
        buf += hdr
        buf += payload
        total = len(buf) - chunk_start
        cmd = [(1, _I32, _TYPE_IDS[c.phys]),
               (2, _LIST, (_I32, encodings)),
               (3, _LIST, (_BINARY, [c.name])),
               (4, _I32, 0),                    # UNCOMPRESSED
               (5, _I64, c.n_slots),
               (6, _I64, total), (7, _I64, total),
               (9, _I64, data_page_offset)]
        if dict_page_offset is not None:
            cmd.append((11, _I64, dict_page_offset))
        chunk_meta.append((c, chunk_start, total, cmd))

    schema = [[(3, _I32, 0), (4, _BINARY, "schema"),
               (5, _I32, len(cols))]]
    for c in cols:
        rep = 1 if c.valid is not None else 0
        schema.append([(1, _I32, _TYPE_IDS[c.phys]), (3, _I32, rep),
                       (4, _BINARY, c.name)])
    chunks = [[(2, _I64, start), (3, _STRUCT, cmd)]
              for _c, start, _total, cmd in chunk_meta]
    total_bytes = sum(t for _c, _s, t, _m in chunk_meta)
    fmd = bytearray()
    _struct(fmd, [(1, _I32, 1),
                  (2, _LIST, (_STRUCT, schema)),
                  (3, _I64, num_rows),
                  (4, _LIST, (_STRUCT, [[(1, _LIST, (_STRUCT, chunks)),
                                         (2, _I64, total_bytes),
                                         (3, _I64, num_rows)]])),
                  (6, _BINARY, created_by)])
    buf += fmd
    buf += len(fmd).to_bytes(4, "little")
    buf += MAGIC
    with open(path, "wb") as f:
        f.write(bytes(buf))
