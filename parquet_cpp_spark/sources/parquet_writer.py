"""Minimal parquet FILE-format writer built on the engine's own kernels.

Write-side mirror of ``sources.parquet_format`` (the golden-file reader):
emits a PAR1 file — V1 data pages, thrift-compact footer — that pyarrow /
parquet-cpp read back. Layout follows the reference's file writer
(``/root/reference/src/parquet/file_writer.cc:270-280``: PAR1 magic, column
chunks, FileMetaData + u32 footer length + PAR1) and the public
parquet-format spec; the thrift compact protocol is implemented here from
that spec, symmetric with the reader in ``parquet_format._Compact``.

Scope (interop parity-plus — the production sink is the chunk/manifest
dataset, SURVEY §1.1): flat REQUIRED/OPTIONAL leaves plus REQUIRED
``list<element>`` columns via rep/def levels (3-level encoding,
``ListColumn``; rep levels delimit rows as in ``column_writer.cc:616-629``
— this is how the engine emits its own headline ``tokens array<int32>``
column as real parquet), PLAIN or dictionary encoding (PLAIN dict page +
PLAIN_DICTIONARY data pages, the format-1.0 pairing) or
DELTA_BINARY_PACKED, multiple row groups, multiple data pages per chunk,
SNAPPY/GZIP/ZSTD page compression, and chunk-level min/max/null_count
statistics (``column_writer.cc`` EncodedStatistics analog). Fails loudly
on anything out of scope. Page payloads come from the engine's own
kernels (``plain``, ``rle``, ``dictionary``) — the same code path the
chunk blobs use, so a pyarrow read-back of this file cross-checks those
kernels against a second, independent implementation.
"""

from __future__ import annotations

import numpy as np

from ..kernels import ba, bytearray_codecs, delta, dictionary, plain, rle
from ..levels import _real_slot_positions, levels_from_nested_lengths

MAGIC = b"PAR1"

# the reference's dictionary_pagesize_limit (properties.h:83): dict growth
# past this triggers the PLAIN fallback mid-chunk
DEFAULT_DICT_SIZE_LIMIT = dictionary.DEFAULT_DICT_SIZE_LIMIT

# thrift compact element type ids (same table as parquet_format's reader)
_TRUE, _FALSE, _BYTE, _I16, _I32, _I64, _DOUBLE, _BINARY, _LIST = range(1, 10)
_STRUCT = 12

# parquet-format enums
_TYPE_IDS = {"boolean": 0, "int32": 1, "int64": 2, "float": 4, "double": 5,
             "byte_array": 6}


def _phys_id(phys: str) -> "tuple[int, int]":
    """(parquet type id, type_length) for a phys string. FLBA is spelled
    ``flba:<N>`` (same grammar as the reader); INT96 is 12 fixed bytes."""
    if phys == "int96":
        return 3, 12
    if phys.startswith("flba:"):
        n = int(phys.split(":")[1])
        if n <= 0:
            raise ValueError(f"bad FLBA width in {phys!r}")
        return 7, n
    if phys in _TYPE_IDS:
        return _TYPE_IDS[phys], 0
    raise ValueError(f"writer supports {sorted(_TYPE_IDS) + ['int96', 'flba:<N>']}, "
                     f"not {phys!r}")


def _is_fixed_bytes(phys: str) -> bool:
    return phys == "int96" or phys.startswith("flba:")


# Temporal annotations over int32/int64 storage (types.h:63-90):
# name -> (converted-type id | None, required phys, isAdjustedToUTC | None).
# The *_ntz timestamps carry NO converted type (the legacy ids imply
# UTC-adjusted instants) — they are expressed purely through the modern
# LogicalType TIMESTAMP(isAdjustedToUTC=false), which Spark surfaces as
# TIMESTAMP_NTZ; the UTC variants write BOTH (legacy readers get the
# converted id, modern readers the logical struct).
_TIME_ANNOTATIONS = {
    "date": (6, "int32", None),
    "time_ms": (7, "int32", None),
    "time_us": (8, "int64", None),
    "timestamp_ms": (9, "int64", True),
    "timestamp_us": (10, "int64", True),
    "timestamp_ntz_ms": (None, "int64", False),
    "timestamp_ntz_us": (None, "int64", False),
}
ENC_PLAIN, ENC_PLAIN_DICT, ENC_RLE, ENC_DELTA_BP = 0, 2, 3, 5
ENC_DELTA_LBA, ENC_DELTA_BA = 6, 7  # byte_array delta encodings
_PAGE_DATA, _PAGE_DICT, _PAGE_DATA_V2 = 0, 2, 3
# parquet-format CompressionCodec ids (reference types.h:105-116). "lz4"
# is the legacy Hadoop-framed codec (id 5) the reference's Lz4Codec and
# parquet-mr implement; "lz4_raw" (id 7) is the modern unframed block.
_CODEC_IDS = {None: 0, "snappy": 1, "gzip": 2, "brotli": 4, "lz4": 5,
              "zstd": 6, "lz4_raw": 7}


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
        if etype == _TRUE:
            # thrift compact bool LIST elements: one byte each,
            # 1 = true, 2 = false (CT_BOOLEAN_TRUE/FALSE)
            buf += bytes(1 if item else 2 for item in items)
            return
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


def _compress(data: bytes, codec: "str | None") -> bytes:
    if codec is None:
        return data
    if codec == "gzip":
        import zlib
        co = zlib.compressobj(wbits=31)  # gzip container, parquet GZIP
        return co.compress(data) + co.flush()
    import pyarrow as pa
    if codec == "lz4":
        # Hadoop LZ4 framing (codec id 5): 4-byte BE decompressed length,
        # 4-byte BE compressed length, one raw LZ4 block — the layout the
        # reference's Lz4Codec and parquet-mr write/expect; Arrow C++
        # reads it via its Lz4HadoopCodec (raw-block fallback)
        block = pa.Codec("lz4_raw").compress(data, asbytes=True)
        return (len(data).to_bytes(4, "big")
                + len(block).to_bytes(4, "big") + block)
    return pa.Codec(codec).compress(data, asbytes=True)


def _plain_values(values, phys: str) -> bytes:
    if phys == "byte_array":
        return plain.encode_byte_array(values)
    if phys == "boolean":
        return plain.encode_boolean(np.asarray(values))
    if _is_fixed_bytes(phys):
        return plain.encode_flba(list(values), _phys_id(phys)[1])
    return plain.encode_fixed(np.asarray(values), phys)


def _stat_bytes(v, phys: str) -> bytes:
    """Single value -> its PLAIN byte form (Statistics min_value/max_value)."""
    if phys == "byte_array":
        return bytes(v)
    if phys == "boolean":
        return bytes([1 if v else 0])
    dt = {"int32": "<i4", "int64": "<i8",
          "float": "<f4", "double": "<f8"}[phys]
    return np.array([v]).astype(dt).tobytes()


def _chunk_stats(dense, phys: str, null_count: int) -> "list | None":
    """Statistics struct fields (null_count + min_value/max_value), or
    None when min/max are undefined (empty chunk, NaN-poisoned floats —
    the reference's NaN rule: stats with NaN extremes are not written)."""
    fields = [(3, _I64, null_count)]
    n = len(dense)
    if n == 0 or _is_fixed_bytes(phys):
        # INT96 sort order is UNKNOWN and DECIMAL-FLBA ordering is signed
        # big-endian (not byte-lexicographic) — the reference refuses
        # untrustworthy stats; so do we: null_count only
        return fields
    if phys == "byte_array":
        view = ba.as_view(dense) if not isinstance(dense, ba.ByteArrayView) \
            else dense
        mn, mx = ba.minmax(view)
    elif phys == "boolean":
        arr = np.asarray(dense, dtype=bool)
        mn, mx = bool(arr.min()), bool(arr.max())
    else:
        arr = np.asarray(dense)
        if phys in ("float", "double") and bool(np.isnan(arr).any()):
            return fields  # null_count only
        mn, mx = arr.min(), arr.max()
    fields += [(5, _BINARY, _stat_bytes(mx, phys)),
               (6, _BINARY, _stat_bytes(mn, phys))]
    return fields


NAN_POISONED = object()  # sentinel: page min/max undefined (NaN stats rule)


_INDEX_BOUND_CAP = 64  # byte_array PageIndex bound truncation cap


def _trunc_min(v: bytes) -> bytes:
    """Prefix-truncate a byte_array lower bound: v[:cap] <= v, and
    a <= b implies trunc(a) <= trunc(b) — pruning stays conservative."""
    return v if len(v) <= _INDEX_BOUND_CAP else v[:_INDEX_BOUND_CAP]


def _trunc_max(v: bytes) -> bytes:
    """Increment-truncate an upper bound (the reference truncates index
    bounds the same way): shortest prefix-with-last-byte-bumped that is
    >= v. An all-0xFF prefix cannot be bumped — keep the full value."""
    if len(v) <= _INDEX_BOUND_CAP:
        return v
    p = bytearray(v[:_INDEX_BOUND_CAP])
    for i in reversed(range(len(p))):
        if p[i] != 0xFF:
            p[i] += 1
            return bytes(p[:i + 1])
    return v


def _column_index_fields(pages, phys: str) -> "list | None":
    """ColumnIndex struct fields (parquet-format PageIndex), or None when
    any page's extremes are NaN-poisoned — the reference's NaN stats rule
    applied to the whole index (readers must not prune on NaN bounds).
    byte_array bounds longer than 64 bytes are truncated (min to a prefix,
    max increment-truncated) so long strings can't bloat the index; the
    boundary order is computed from the EMITTED bounds so readers'
    binary-searched pruning stays consistent with what they see."""
    if any(p["min"] is NAN_POISONED for p in pages):
        return None
    null_pages = [p["min"] is None for p in pages]
    if phys == "byte_array":
        mins = [b"" if p["min"] is None else _trunc_min(bytes(p["min"]))
                for p in pages]
        maxs = [b"" if p["max"] is None else _trunc_max(bytes(p["max"]))
                for p in pages]
        nn = [(mn, mx) for p, mn, mx in zip(pages, mins, maxs)
              if p["min"] is not None]
    else:
        mins = [b"" if p["min"] is None else _stat_bytes(p["min"], phys)
                for p in pages]
        maxs = [b"" if p["max"] is None else _stat_bytes(p["max"], phys)
                for p in pages]
        nn = [(p["min"], p["max"]) for p in pages if p["min"] is not None]

    def _mono(op):
        return all(op(nn[i][0], nn[i + 1][0]) and op(nn[i][1], nn[i + 1][1])
                   for i in range(len(nn) - 1))
    if len(nn) <= 1 or _mono(lambda a, b: a <= b):
        order = 1          # ASCENDING (enables binary-searched pruning)
    elif _mono(lambda a, b: a >= b):
        order = 2          # DESCENDING
    else:
        order = 0          # UNORDERED
    return [(1, _LIST, (_TRUE, null_pages)),
            (2, _LIST, (_BINARY, mins)),
            (3, _LIST, (_BINARY, maxs)),
            (4, _I32, order),
            (5, _LIST, (_I64, [p["null_count"] for p in pages]))]


def _offset_index_fields(pages) -> list:
    """OffsetIndex struct fields: one PageLocation (offset, size incl.
    header, first_row_index) per data page."""
    locs = [[(1, _I64, p["offset"]), (2, _I32, p["size"]),
             (3, _I64, p["first_row"])] for p in pages]
    return [(1, _LIST, (_STRUCT, locs))]


def _slice_dense(dense, phys: str, lo: int, hi: int):
    if phys == "byte_array":
        view = dense if isinstance(dense, ba.ByteArrayView) \
            else ba.as_view(dense)
        return ba.slice_rows(view, lo, hi)
    return dense[lo:hi]


_NP_DTYPES = {"int32": "<i4", "int64": "<i8",
              "float": "<f4", "double": "<f8"}


def _coerce_dense(dense, phys: str, name: str):
    """Coerce numeric dense values to the DECLARED physical dtype.

    The writer's fail-loudly contract: an int32 column fed int64 values
    (or a Python list) must either become real int32 or raise — silently
    keeping the wide dtype makes downstream kernels (delta wrap32, PLAIN
    width) emit pages other readers reject or misread."""
    if phys not in _NP_DTYPES:
        return dense
    arr = np.asarray(dense)
    dt = np.dtype(_NP_DTYPES[phys])
    if arr.dtype == dt:
        return arr
    out = arr.astype(dt)
    if phys in ("int32", "int64") and \
            not np.array_equal(out.astype(arr.dtype, copy=False), arr):
        raise ValueError(
            f"column {name!r}: values do not fit declared physical "
            f"type {phys} (max abs {np.abs(arr).max()})")
    return out


class ListColumn:
    """Spec for a ``list<element>`` column (3-level encoding,
    ``schema.h:43-77``): ``values`` are the flattened elements, ``lengths``
    the per-row element counts; rep 0 delimits a record like the
    reference's REPEATED leaves (``column_writer.cc:616-629``; levels from
    offsets mirror ``arrow/writer.cc:71-262``).

    ``valid`` (per-ROW mask) makes the list itself OPTIONAL: a null slot
    is one level position with def 0, an empty list def 1, elements def 2
    — the ``column_writer-test.cc:387-460`` OPTIONAL-REPEATED shape. Null
    rows must carry length 0. ``element_valid`` (one bool per SLOT) makes
    elements OPTIONAL; ``values`` are then SLOT-aligned (entries at null
    slots ignored) and each null element costs one more def level."""

    def __init__(self, name: str, phys: str, values, lengths,
                 use_dictionary: bool = False, valid=None,
                 element_valid=None):
        self.name = name
        self.phys = phys
        self.values = values
        self.lengths = lengths
        self.use_dictionary = use_dictionary
        self.valid = valid
        self.element_valid = element_valid


class NestedListColumn:
    """Spec for a ``list<list<element>>`` column (max_rep = 2 — the
    chunk format's list-of-list shape, now in the PAR1 writer; levels
    mirror the reference's recursive list walker,
    ``arrow/writer.cc:71-262``, two LIST annotations deep).

    ``outer_lengths[i]``: inner lists in row i; ``inner_lengths``: element
    counts per inner list (flattened, ``outer_lengths.sum()`` entries);
    ``values``: flattened element slots (``inner_lengths.sum()``).
    ``valid`` (per row) / ``inner_valid`` (per inner list) /
    ``element_valid`` (per element slot) make each layer OPTIONAL — every
    optional layer adds one def level (max_def up to 5). Null slots at
    any layer must carry zero extent."""

    def __init__(self, name: str, phys: str, values, outer_lengths,
                 inner_lengths, use_dictionary: bool = False, valid=None,
                 inner_valid=None, element_valid=None):
        self.name = name
        self.phys = phys
        self.values = values
        self.outer_lengths = outer_lengths
        self.inner_lengths = inner_lengths
        self.use_dictionary = use_dictionary
        self.valid = valid
        self.inner_valid = inner_valid
        self.element_valid = element_valid


class StructColumn:
    """Spec for a ``struct<...>`` column (``schema.h:106-303`` group
    nodes; struct round-trips ``arrow/arrow-reader-writer-test.cc:595+``).

    ``fields``: flat leaf tuples ``(fname, phys, values[, fvalid[,
    use_dictionary]])`` — each becomes one leaf chunk with path
    ``name.fname`` — or nested ``(fname, StructColumn)`` pairs
    (struct-in-struct at any depth; the inner spec's ``name`` is ignored,
    its values/masks stay TOP-LEVEL-row aligned, entries under a null
    ancestor ignored). ``valid`` makes the struct OPTIONAL: a struct-null
    row contributes def 0 to every leaf below it; each optional ancestor
    adds one def level. Fields may be nested ``StructColumn``s or
    ``(fname, ListColumn)`` pairs (lists inside structs). Annotations
    (utf8/decimal/temporal) are keyed by the dotted path ``name.fname``
    (full path for nested)."""

    def __init__(self, name: str, fields: list, valid=None):
        self.name = name
        self.fields = list(fields)
        self.valid = valid


class MapColumn:
    """Spec for a ``map<key, value>`` column (MAP converted type; 3-level
    ``key_value`` group, ``schema.h:43-77`` / ``arrow/schema.cc`` map
    path). Two parallel REPEATED leaves share one ``lengths`` array:
    ``keys`` (REQUIRED — parquet map keys cannot be null) and ``values``
    (OPTIONAL when ``value_valid`` is given, slot-aligned like
    ``ListColumn.element_valid``). ``valid`` makes the map itself
    OPTIONAL (null map vs empty map, like ListColumn). Annotation keys:
    ``name.key`` / ``name.value``."""

    def __init__(self, name: str, key_phys: str, keys, value_phys: str,
                 values, lengths, valid=None, value_valid=None,
                 key_use_dictionary: bool = False,
                 value_use_dictionary: bool = False):
        self.name = name
        self.key_phys = key_phys
        self.keys = keys
        self.value_phys = value_phys
        self.values = values
        self.lengths = lengths
        self.valid = valid
        self.value_valid = value_valid
        self.key_use_dictionary = key_use_dictionary
        self.value_use_dictionary = value_use_dictionary


class ListStructColumn:
    """Spec for a ``list<struct<scalar fields>>`` column (max_rep 1): one
    REPEATED leaf per struct field, all sharing one ``lengths`` array —
    the MapColumn two-parallel-leaves pattern generalized to N fields
    (reference: the recursive group walker ``arrow/writer.cc:305-932``
    emits exactly this leaf set for list-of-struct).

    ``fields``: flat leaf tuples ``(fname, phys, values[, fvalid[,
    use_dictionary]])`` with values/fvalid PER ELEMENT SLOT
    (``lengths.sum()`` entries). ``element_valid`` (per slot) makes the
    struct element group OPTIONAL (a null struct inside the list — its
    field values at those slots are ignored); ``valid`` (per row) makes
    the list itself OPTIONAL. Deeper nesting inside the element is out
    of writer scope. Annotation keys: ``name.fname``."""

    def __init__(self, name: str, fields: list, lengths, valid=None,
                 element_valid=None):
        self.name = name
        self.fields = list(fields)
        self.lengths = lengths
        self.valid = valid
        self.element_valid = element_valid


class _Leaf:
    """One schema LEAF in page-writable form: dense (non-null) values plus
    precomputed repetition/definition levels and the row->slot / row->dense
    offset maps. Every supported shape — flat REQUIRED/OPTIONAL, lists
    (OPTIONAL slots / OPTIONAL elements), struct fields, map key/value —
    reduces to this model, which is exactly the reference
    TypedColumnWriter's view of a leaf (``column_writer.cc``: a leaf
    writer receives def/rep arrays plus the value stream, whatever the
    schema tree above looks like)."""

    def __init__(self, path: list, phys: str, dense, *, n_rows: int,
                 use_dictionary: bool = False, max_rep: int = 0,
                 max_def: int = 0, rep=None, deflv=None,
                 lvl_ofs=None, dense_ofs=None):
        self.path = list(path)
        self.name = ".".join(p for p in self.path
                             if p not in ("list", "element", "key_value"))
        self.phys = phys
        self.dense = dense
        self.n_rows = n_rows
        self.use_dictionary = use_dictionary
        self.max_rep = max_rep
        self.max_def = max_def
        self.rep = rep          # int8, one per level slot (None: max_rep=0)
        self.deflv = deflv      # int8, one per level slot (None: max_def=0)
        self.lvl_ofs = lvl_ofs      # row -> first level slot (None: 1/row)
        self.dense_ofs = dense_ofs  # row -> first dense value (None: =row)

    def _lvl_range(self, lo: int, hi: int) -> tuple[int, int]:
        if self.lvl_ofs is None:
            return lo, hi
        return int(self.lvl_ofs[lo]), int(self.lvl_ofs[hi])

    def dense_range(self, lo: int, hi: int) -> tuple[int, int]:
        if self.dense_ofs is None:
            return lo, hi
        return int(self.dense_ofs[lo]), int(self.dense_ofs[hi])

    def row_floor(self, lo: int, hi: int, dense_target: int) -> int:
        """Largest row r in [lo, hi] whose dense start offset <=
        ``dense_target`` — aligns the dict->PLAIN fallback point to a ROW
        boundary so pages stay homogeneous and records never straddle an
        encoding switch."""
        if self.dense_ofs is None:
            return min(hi, dense_target)   # flat REQUIRED: row == dense idx
        r = int(np.searchsorted(self.dense_ofs[lo:hi + 1], dense_target,
                                side="right")) - 1
        return lo + max(r, 0)

    def num_values(self, lo: int, hi: int) -> int:
        """ColumnMetaData.num_values / page-header num_values: LEVEL slots
        in the row range (= rows for flat and struct leaves, level
        positions for repeated leaves — empty/null rows still carry one
        marker slot)."""
        llo, lhi = self._lvl_range(lo, hi)
        return lhi - llo

    def page_levels(self, lo: int, hi: int):
        """(rep, def) int8 array slices for a page (None where absent)."""
        llo, lhi = self._lvl_range(lo, hi)
        r = None if self.rep is None else self.rep[llo:lhi]
        d = None if self.deflv is None else self.deflv[llo:lhi]
        return r, d


def _dense_scalar(values, idx, phys: str, name: str):
    """Extract dense values: ``values`` (slot-aligned when ``idx`` is
    given) -> the non-null value stream in page-payload form."""
    if phys == "byte_array":
        view = values if isinstance(values, ba.ByteArrayView) \
            else ba.as_view(values)
        return view if idx is None else ba.take(view, idx)
    if _is_fixed_bytes(phys):
        width = _phys_id(phys)[1]
        if isinstance(values, np.ndarray):
            # vectorized form: (n, width) uint8 matrix (the sink's
            # decimal path) — row-sliceable, no per-row Python
            if values.ndim != 2 or values.shape[1] != width \
                    or values.dtype != np.uint8:
                raise ValueError(f"column {name}: FLBA matrix must be "
                                 f"(n, {width}) uint8")
            return values if idx is None else \
                np.ascontiguousarray(values[idx])
        # keep a PYTHON list: np.asarray would coerce to '|S<N>' and
        # silently strip trailing NUL bytes on extraction
        vals = list(values) if idx is None else [values[i] for i in idx]
        for v in vals:
            if len(v) != width:
                raise ValueError(f"column {name}: FLBA/INT96 value of "
                                 f"{len(v)} bytes, expected {width}")
        return vals
    arr = np.asarray(values)
    return _coerce_dense(arr if idx is None else arr[idx], phys, name)


def _scalar_leaf(path: list, phys: str, values, present, deflv,
                 max_def: int, use_dictionary: bool) -> _Leaf:
    """Non-repeated leaf (one level slot per row): flat columns and struct
    fields. ``present``: bool mask of rows carrying a dense value (None =
    all); ``deflv``: per-row def levels (None when max_def == 0)."""
    name = ".".join(path)
    _phys_id(phys)  # validates
    if _is_fixed_bytes(phys) and use_dictionary:
        raise ValueError(f"column {name}: dictionary encoding is out of "
                         "scope for FLBA/INT96 (PLAIN only, like the "
                         "reference's fixed-width pages)")
    if present is None:
        n_rows = len(values)
        dense = _dense_scalar(values, None, phys, name)
        dense_ofs = None
    else:
        present = np.asarray(present, dtype=bool)
        n_rows = len(present)
        if phys == "byte_array" and isinstance(values, ba.ByteArrayView):
            n_vals = len(values)
        else:
            n_vals = len(values)
        if n_vals != n_rows:
            raise ValueError(f"column {name}: values must be slot-aligned "
                             "(one per row, nulls included) when a "
                             "validity mask is given")
        dense = _dense_scalar(values, np.flatnonzero(present), phys, name)
        dense_ofs = np.zeros(n_rows + 1, dtype=np.int64)
        np.cumsum(present, out=dense_ofs[1:])
    if deflv is not None:
        deflv = np.ascontiguousarray(deflv, dtype=np.int8)
    return _Leaf(path, phys, dense, n_rows=n_rows,
                 use_dictionary=use_dictionary, max_def=max_def,
                 deflv=deflv, dense_ofs=dense_ofs)


def _list_leaf(path: list, phys: str, values, lengths, list_valid,
               elem_valid, use_dictionary: bool, anc_masks=()) -> _Leaf:
    """REPEATED leaf (list element / map key / map value / list inside a
    struct). def scheme with A = len(anc_masks) optional struct
    ancestors: ancestor cut at depth a -> a, null list slot -> A (0
    without ancestors; only with ``list_valid``), empty list -> ``opt``
    (= A + opt_l), null element -> ``opt``+1 (only with ``elem_valid``),
    present value -> max_def. Rows under a null ancestor must carry
    length 0."""
    name = ".".join(path)
    _phys_id(phys)
    if _is_fixed_bytes(phys):
        raise ValueError(f"column {name}: list<FLBA/INT96> out of "
                         "writer scope")
    lengths = np.ascontiguousarray(lengths, dtype=np.int64)
    if (lengths < 0).any():
        raise ValueError(f"column {name}: negative list length")
    n_rows = len(lengths)
    A = len(anc_masks)
    anc_def = None
    if A:
        # def contribution of optional struct ancestors, outermost first
        anc_ok = np.ones(n_rows, dtype=bool)
        anc_def = np.zeros(n_rows, dtype=np.int8)
        for m in anc_masks:
            anc_ok &= np.asarray(m, dtype=bool)
            anc_def += anc_ok
        if lengths[~anc_ok].any():
            raise ValueError(f"column {name}: rows under a null struct "
                             "ancestor must have length 0")
    opt = A
    if list_valid is not None:
        list_valid = np.asarray(list_valid, dtype=bool)
        if len(list_valid) != n_rows:
            raise ValueError(f"column {name}: valid mask length mismatch")
        if lengths[~list_valid].any():
            raise ValueError(f"column {name}: null list slots must have "
                             "length 0")
        opt += 1
    n_elem_slots = int(lengths.sum())
    max_def = opt + 1 + (1 if elem_valid is not None else 0)
    if elem_valid is not None:
        elem_valid = np.asarray(elem_valid, dtype=bool)
        if len(elem_valid) != n_elem_slots:
            raise ValueError(f"column {name}: element_valid must have one "
                             f"entry per slot ({n_elem_slots})")
    n_vals = len(values) if phys == "byte_array" else len(np.asarray(values))
    if n_vals != n_elem_slots:
        raise ValueError(f"column {name}: {n_vals} elements but lengths "
                         f"sum to {n_elem_slots}")
    # levels: one slot per element, plus one marker slot per empty/null row
    slots = np.maximum(lengths, 1)
    total = int(slots.sum())
    rep = np.ones(total, dtype=np.int8)
    starts = np.zeros(n_rows, dtype=np.int64)
    np.cumsum(slots[:-1], out=starts[1:])
    rep[starts] = 0
    d = np.full(total, max_def, dtype=np.int8)
    if elem_valid is not None and not elem_valid.all():
        real = _real_slot_positions(lengths, slots, starts)
        d[real[~elem_valid]] = opt + 1
    empty = lengths == 0
    if empty.any():
        marks = starts[empty]
        d[marks] = opt
        if list_valid is not None:
            d[marks[~list_valid[empty]]] = A
        if anc_def is not None:
            cut = ~anc_ok[empty]
            d[marks[cut]] = anc_def[empty][cut]
    lvl_ofs = np.zeros(n_rows + 1, dtype=np.int64)
    np.cumsum(slots, out=lvl_ofs[1:])
    elem_cum = np.zeros(n_rows + 1, dtype=np.int64)
    np.cumsum(lengths, out=elem_cum[1:])
    if elem_valid is None:
        dense = _dense_scalar(values, None, phys, name)
        dense_ofs = elem_cum
    else:
        dense = _dense_scalar(values, np.flatnonzero(elem_valid),
                              phys, name)
        vcum = np.zeros(n_elem_slots + 1, dtype=np.int64)
        np.cumsum(elem_valid, out=vcum[1:])
        dense_ofs = vcum[elem_cum]
    return _Leaf(path, phys, dense, n_rows=n_rows,
                 use_dictionary=use_dictionary, max_rep=1, max_def=max_def,
                 rep=rep, deflv=d, lvl_ofs=lvl_ofs, dense_ofs=dense_ofs)


def _list_struct_field_leaf(path: list, phys: str, values, lengths,
                            list_valid, struct_valid, field_valid,
                            use_dictionary: bool) -> _Leaf:
    """One field of a ``list<struct<...>>`` column as a REPEATED leaf.
    def scheme: null list slot -> 0 (with ``list_valid``), empty list ->
    opt_l, null struct element -> opt_l+1 (with ``struct_valid``, per
    element slot), struct present but field null -> opt_l+1+opt_s (with
    ``field_valid``), value -> max_def. Field values at null-struct
    slots are ignored (excluded from the dense stream)."""
    name = ".".join(path)
    _phys_id(phys)
    if _is_fixed_bytes(phys):
        raise ValueError(f"column {name}: list<FLBA/INT96> out of "
                         "writer scope")
    lengths = np.ascontiguousarray(lengths, dtype=np.int64)
    if (lengths < 0).any():
        raise ValueError(f"column {name}: negative list length")
    n_rows = len(lengths)
    opt_l = 0
    if list_valid is not None:
        list_valid = np.asarray(list_valid, dtype=bool)
        if len(list_valid) != n_rows:
            raise ValueError(f"column {name}: valid mask length mismatch")
        if lengths[~list_valid].any():
            raise ValueError(f"column {name}: null list slots must have "
                             "length 0")
        opt_l = 1
    n_elem_slots = int(lengths.sum())
    opt_s = opt_f = 0
    if struct_valid is not None:
        struct_valid = np.asarray(struct_valid, dtype=bool)
        if len(struct_valid) != n_elem_slots:
            raise ValueError(f"column {name}: element_valid must have "
                             f"one entry per slot ({n_elem_slots})")
        opt_s = 1
    if field_valid is not None:
        field_valid = np.asarray(field_valid, dtype=bool)
        if len(field_valid) != n_elem_slots:
            raise ValueError(f"column {name}: field valid mask must have "
                             f"one entry per slot ({n_elem_slots})")
        opt_f = 1
    n_vals = len(values) if phys == "byte_array" else len(np.asarray(values))
    if n_vals != n_elem_slots:
        raise ValueError(f"column {name}: {n_vals} elements but lengths "
                         f"sum to {n_elem_slots}")
    max_def = opt_l + 1 + opt_s + opt_f
    slots = np.maximum(lengths, 1)
    total = int(slots.sum())
    rep = np.ones(total, dtype=np.int8)
    starts = np.zeros(n_rows, dtype=np.int64)
    np.cumsum(slots[:-1], out=starts[1:])
    rep[starts] = 0
    d = np.full(total, max_def, dtype=np.int8)
    real = None
    if (opt_s and not struct_valid.all()) or \
            (opt_f and not field_valid.all()):
        real = _real_slot_positions(lengths, slots, starts)
    # field-null first, struct-null second: a null struct overrides its
    # fields' masks (their values at those slots are meaningless)
    if opt_f and real is not None:
        d[real[~field_valid]] = opt_l + 1 + opt_s
    if opt_s and real is not None:
        d[real[~struct_valid]] = opt_l + 1
    empty = lengths == 0
    if empty.any():
        marks = starts[empty]
        d[marks] = opt_l
        if opt_l:
            d[marks[~list_valid[empty]]] = 0
    lvl_ofs = np.zeros(n_rows + 1, dtype=np.int64)
    np.cumsum(slots, out=lvl_ofs[1:])
    elem_cum = np.zeros(n_rows + 1, dtype=np.int64)
    np.cumsum(lengths, out=elem_cum[1:])
    present = None
    if opt_s:
        present = struct_valid.copy()
        if opt_f:
            present &= field_valid
    elif opt_f:
        present = field_valid
    if present is None:
        dense = _dense_scalar(values, None, phys, name)
        dense_ofs = elem_cum
    else:
        dense = _dense_scalar(values, np.flatnonzero(present), phys, name)
        vcum = np.zeros(n_elem_slots + 1, dtype=np.int64)
        np.cumsum(present, out=vcum[1:])
        dense_ofs = vcum[elem_cum]
    return _Leaf(path, phys, dense, n_rows=n_rows,
                 use_dictionary=use_dictionary, max_rep=1, max_def=max_def,
                 rep=rep, deflv=d, lvl_ofs=lvl_ofs, dense_ofs=dense_ofs)


def _nested_list_leaf(path: list, phys: str, values, outer_lengths,
                      inner_lengths, valid, inner_valid, elem_valid,
                      use_dictionary: bool) -> _Leaf:
    """list<list<element>> leaf: max_rep = 2. def scheme (each optional
    layer adds a level): null outer slot -> 0, empty outer -> opt_o,
    null inner slot -> opt_o+1, empty inner -> opt_o+1+opt_i, null
    element -> opt_o+1+opt_i+1, value -> max_def."""
    name = ".".join(path)
    _phys_id(phys)
    if _is_fixed_bytes(phys):
        raise ValueError(f"column {name}: list<FLBA/INT96> out of "
                         "writer scope")
    outer = np.ascontiguousarray(outer_lengths, dtype=np.int64)
    inner = np.ascontiguousarray(inner_lengths, dtype=np.int64)
    if (outer < 0).any() or (inner < 0).any():
        raise ValueError(f"column {name}: negative list length")
    if int(outer.sum()) != len(inner):
        raise ValueError(f"column {name}: outer_lengths sum "
                         f"{int(outer.sum())} != {len(inner)} inner lists")
    n_rows = len(outer)
    opt_o = opt_i = opt_e = 0
    if valid is not None:
        valid = np.asarray(valid, dtype=bool)
        if outer[~valid].any():
            raise ValueError(f"column {name}: null outer slots must have "
                             "length 0")
        opt_o = 1
    if inner_valid is not None:
        inner_valid = np.asarray(inner_valid, dtype=bool)
        if len(inner_valid) != len(inner):
            raise ValueError(f"column {name}: inner_valid must have one "
                             f"entry per inner list ({len(inner)})")
        if inner[~inner_valid].any():
            raise ValueError(f"column {name}: null inner slots must have "
                             "length 0")
        opt_i = 1
    n_elem_slots = int(inner.sum())
    if elem_valid is not None:
        elem_valid = np.asarray(elem_valid, dtype=bool)
        if len(elem_valid) != n_elem_slots:
            raise ValueError(f"column {name}: element_valid must have one "
                             f"entry per slot ({n_elem_slots})")
        opt_e = 1
    n_vals = len(values) if phys == "byte_array" else len(np.asarray(values))
    if n_vals != n_elem_slots:
        raise ValueError(f"column {name}: {n_vals} elements but "
                         f"inner_lengths sum to {n_elem_slots}")
    max_def = opt_o + opt_i + opt_e + 2

    # base levels for the required/required shape (levels.py list-of-list
    # contract: base def 0 = outer marker, 1 = inner marker, 2 = value),
    # then remap each disjoint slot class onto the optional-aware scheme
    rep, base = levels_from_nested_lengths(outer, inner)
    d = np.empty(len(base), dtype=np.int8)
    vpos = base == 2                       # element slots, element order
    if opt_e:
        d[vpos] = np.where(elem_valid, max_def, opt_o + opt_i + 2)
    else:
        d[vpos] = max_def
    ipos = np.flatnonzero(base == 1)       # empty-inner markers, in order
    if len(ipos):
        empty_inner = np.flatnonzero(inner == 0)
        if opt_i:
            d[ipos] = np.where(inner_valid[empty_inner],
                               opt_o + 1 + opt_i, opt_o + 1)
        else:
            d[ipos] = opt_o + 1
    opos = np.flatnonzero(base == 0)       # empty-outer markers, row order
    if len(opos):
        if opt_o:
            d[opos] = np.where(valid[outer == 0], opt_o, 0)
        else:
            d[opos] = 0

    # row -> level slot / dense value offset maps
    inner_slots = np.maximum(inner, 1)
    row_of_inner = np.repeat(np.arange(n_rows, dtype=np.int64), outer)
    row_slots = np.zeros(n_rows, dtype=np.int64)
    np.add.at(row_slots, row_of_inner, inner_slots)
    row_slots[outer == 0] = 1
    lvl_ofs = np.zeros(n_rows + 1, dtype=np.int64)
    np.cumsum(row_slots, out=lvl_ofs[1:])
    row_elems = np.zeros(n_rows, dtype=np.int64)
    np.add.at(row_elems, row_of_inner, inner)
    elem_cum = np.zeros(n_rows + 1, dtype=np.int64)
    np.cumsum(row_elems, out=elem_cum[1:])
    if elem_valid is None:
        dense = _dense_scalar(values, None, phys, name)
        dense_ofs = elem_cum
    else:
        dense = _dense_scalar(values, np.flatnonzero(elem_valid),
                              phys, name)
        vcum = np.zeros(n_elem_slots + 1, dtype=np.int64)
        np.cumsum(elem_valid, out=vcum[1:])
        dense_ofs = vcum[elem_cum]
    return _Leaf(path, phys, dense, n_rows=n_rows,
                 use_dictionary=use_dictionary, max_rep=2, max_def=max_def,
                 rep=rep, deflv=d, lvl_ofs=lvl_ofs, dense_ofs=dense_ofs)


def _is_nested_struct_field(f) -> bool:
    return len(f) == 2 and isinstance(f[1], StructColumn)


def _is_list_field(f) -> bool:
    return len(f) == 2 and isinstance(f[1], ListColumn)


def _struct_leaves(path: list, anc_masks: list, fields: list) -> list:
    """Recursive struct flattening (struct-in-struct at any depth):
    ``anc_masks`` holds one per-row bool mask per OPTIONAL ancestor group,
    outermost first. A leaf's def level per row counts how many leading
    ancestors (then the field itself) are defined — the
    ``SchemaDescriptor`` def accumulation, ``schema.h:106-303``."""
    if not fields:
        raise ValueError(f"struct column {'.'.join(path)}: no fields")
    leaves = []
    for f in fields:
        if _is_nested_struct_field(f):
            sub = f[1]
            masks = anc_masks + ([np.asarray(sub.valid, dtype=bool)]
                                 if sub.valid is not None else [])
            leaves += _struct_leaves(path + [f[0]], masks, sub.fields)
            continue
        if _is_list_field(f):
            # list<scalar> inside a struct: REPEATED leaf whose def
            # levels start below the optional struct ancestors (the
            # inner ListColumn's name is ignored; lengths/valid stay
            # top-level-row aligned)
            lc = f[1]
            leaves.append(_list_leaf(
                path + [f[0], "list", "element"], lc.phys, lc.values,
                lc.lengths, lc.valid, lc.element_valid,
                lc.use_dictionary, anc_masks=anc_masks))
            continue
        fname, phys, values = f[0], f[1], f[2]
        fvalid = f[3] if len(f) > 3 and f[3] is not None else None
        use_dict = bool(f[4]) if len(f) > 4 else False
        masks = anc_masks + ([np.asarray(fvalid, dtype=bool)]
                             if fvalid is not None else [])
        if not masks:
            leaves.append(_scalar_leaf(path + [fname], phys, values,
                                       None, None, 0, use_dict))
            continue
        defined = np.ones(len(masks[0]), dtype=bool)
        deflv = np.zeros(len(masks[0]), dtype=np.int8)
        for m in masks:
            defined &= m
            deflv += defined
        leaves.append(_scalar_leaf(path + [fname], phys, values, defined,
                                   deflv, len(masks), use_dict))
    return leaves


def _leaves_of(spec) -> list:
    """Top-level column spec -> its leaf chunks in schema DFS order."""
    if hasattr(spec, "pcs_leaves"):
        # general-walker spec (sources.arrow_nested.ArrowColumn or any
        # duck-typed equivalent): the spec owns its leaf construction
        return spec.pcs_leaves()
    if isinstance(spec, ListColumn):
        return [_list_leaf([spec.name, "list", "element"], spec.phys,
                           spec.values, spec.lengths, spec.valid,
                           spec.element_valid, spec.use_dictionary)]
    if isinstance(spec, NestedListColumn):
        return [_nested_list_leaf(
            [spec.name, "list", "element", "list", "element"], spec.phys,
            spec.values, spec.outer_lengths, spec.inner_lengths,
            spec.valid, spec.inner_valid, spec.element_valid,
            spec.use_dictionary)]
    if isinstance(spec, StructColumn):
        anc = [] if spec.valid is None \
            else [np.asarray(spec.valid, dtype=bool)]
        return _struct_leaves([spec.name], anc, spec.fields)
    if isinstance(spec, ListStructColumn):
        if not spec.fields:
            raise ValueError(f"column {spec.name}: no struct fields")
        leaves = []
        for f in spec.fields:
            if len(f) == 2:
                raise ValueError(f"column {spec.name}.{f[0]}: nesting "
                                 "inside a list<struct> element is out "
                                 "of writer scope")
            fvalid = f[3] if len(f) > 3 and f[3] is not None else None
            use_dict = bool(f[4]) if len(f) > 4 else False
            leaves.append(_list_struct_field_leaf(
                [spec.name, "list", "element", f[0]], f[1], f[2],
                spec.lengths, spec.valid, spec.element_valid, fvalid,
                use_dict))
        return leaves
    if isinstance(spec, MapColumn):
        return [
            _list_leaf([spec.name, "key_value", "key"], spec.key_phys,
                       spec.keys, spec.lengths, spec.valid, None,
                       spec.key_use_dictionary),
            _list_leaf([spec.name, "key_value", "value"], spec.value_phys,
                       spec.values, spec.lengths, spec.valid,
                       spec.value_valid, spec.value_use_dictionary)]
    # flat leaf tuple: (name, phys, values[, valid[, use_dictionary]])
    name, phys, values = spec[0], spec[1], spec[2]
    valid = spec[3] if len(spec) > 3 and spec[3] is not None else None
    use_dict = bool(spec[4]) if len(spec) > 4 else False
    if valid is None:
        return [_scalar_leaf([name], phys, values, None, None, 0,
                             use_dict)]
    valid = np.asarray(valid, dtype=bool)
    return [_scalar_leaf([name], phys, values, valid,
                         valid.astype(np.int8), 1, use_dict)]


def _bit_width(max_level: int) -> int:
    return max(1, int(max_level).bit_length())


def _write_chunk(buf: bytearray, c: _Leaf, lo: int, hi: int,
                 page_rows: "int | None", codec: "str | None",
                 write_statistics: bool, delta_encoded: bool = False,
                 data_page_version: int = 1,
                 dict_size_limit: int = DEFAULT_DICT_SIZE_LIMIT,
                 ba_encoding: "str | None" = None) -> list:
    """One column chunk for slot range [lo, hi) -> ColumnMetaData fields."""
    codec_id = _CODEC_IDS[codec]
    dlo, dhi = c.dense_range(lo, hi)
    dense = _slice_dense(c.dense, c.phys, dlo, dhi)
    chunk_start = len(buf)
    # total_uncompressed_size = sum(header + raw page size) per page, the
    # reference's SerializedPageWriter accumulation
    raw_total = 0
    dict_page_offset = None
    enc = None
    split_row = hi
    if sum((c.use_dictionary, delta_encoded, ba_encoding is not None)) > 1:
        raise ValueError(f"column {c.name}: dictionary / delta / "
                         "byte-array-delta encodings are mutually exclusive")
    if ba_encoding is not None and c.phys != "byte_array":
        raise ValueError(f"column {c.name}: DELTA_(LENGTH_)BYTE_ARRAY "
                         f"applies to byte_array, not {c.phys}")
    if c.use_dictionary:
        enc = dictionary.encode(dense, c.phys,
                                dict_size_limit=dict_size_limit)
        if enc.fallback:
            # reference column_writer.cc:498-510: dict grows past the
            # limit -> pages already indexed stay dict-coded, later pages
            # are PLAIN, encodings list carries both. We align the switch
            # to a row boundary (records never straddle encodings).
            split_row = c.row_floor(lo, hi, dlo + enc.n_dict_values)
        if enc.fallback and split_row <= lo:
            # degenerate: the very first row overflows the dict — pure
            # PLAIN chunk, no dict page at all
            enc = None
            encoding = ENC_PLAIN
            encodings = [ENC_PLAIN, ENC_RLE]
        else:
            dict_page_offset = len(buf)
            body = _compress(enc.dict_blob, codec)
            hdr = _page_header(_PAGE_DICT, len(enc.dict_blob), len(body), 7,
                               [(1, _I32, enc.num_entries),
                                (2, _I32, ENC_PLAIN_DICT)])
            buf += hdr
            buf += body
            raw_total += len(hdr) + len(enc.dict_blob)
            encoding = ENC_PLAIN_DICT
            encodings = [ENC_PLAIN_DICT, ENC_PLAIN, ENC_RLE] \
                if enc.fallback else [ENC_PLAIN_DICT, ENC_RLE]
            bw = enc.indices_blob[0]
    elif delta_encoded:
        # DELTA_BINARY_PACKED data pages — the page payload is exactly the
        # kernel's stream (the kernel implements the parquet-format spec),
        # so pyarrow/DuckDB decoding these pages cross-checks kernels/delta
        # against two independent implementations
        if c.phys not in ("int32", "int64"):
            raise ValueError("DELTA_BINARY_PACKED applies to int32/int64")
        encoding = ENC_DELTA_BP
        encodings = [ENC_DELTA_BP, ENC_RLE]
    elif ba_encoding is not None:
        # DELTA_LENGTH_BYTE_ARRAY / DELTA_BYTE_ARRAY data pages in the
        # parquet-format framing (no chunk-format length prefixes; the
        # DELTA_BINARY_PACKED sub-streams self-delimit) — decoded by
        # pyarrow, DuckDB, and parquet-mr, which cross-checks
        # kernels/bytearray_codecs against three independent readers
        encoding = ENC_DELTA_LBA if ba_encoding == "delta_length" \
            else ENC_DELTA_BA
        encodings = [encoding, ENC_RLE]
    else:
        encoding = ENC_PLAIN
        encodings = [ENC_PLAIN, ENC_RLE]

    data_page_offset = len(buf)
    step = max(1, (hi - lo) if page_rows is None else page_rows)
    # a zero-row chunk still emits one empty data page so the footer's
    # data_page_offset points at a real page header; a fallback chunk
    # splits the straddling page at the encoding-switch row
    page_ranges = []
    for plo in range(lo, hi, step) or [lo]:
        phi = min(plo + step, hi)
        if enc is not None and plo < split_row < phi:
            page_ranges += [(plo, split_row), (split_row, phi)]
        else:
            page_ranges.append((plo, phi))
    if not page_ranges:
        page_ranges = [(lo, lo)]
    pages = []  # ColumnIndex/OffsetIndex records, one per DATA page
    for plo, phi in page_ranges:
        page_off = len(buf)
        pdlo, pdhi = c.dense_range(plo, phi)
        if enc is not None and phi <= split_row:
            # per-page indices: re-RLE this page's slice of the chunk's
            # dict codes at the chunk-wide bit width
            codes = enc.codes[pdlo - dlo: pdhi - dlo]
            values_b = bytes([bw]) + rle.encode(codes, bw)
            encoding = ENC_PLAIN_DICT
        elif enc is not None:
            # post-fallback page: PLAIN from the (always dense) values
            values_b = _plain_values(
                _slice_dense(c.dense, c.phys, pdlo, pdhi), c.phys)
            encoding = ENC_PLAIN
        elif delta_encoded:
            # INT32 pages must keep miniblock widths <= 32 (parquet-format
            # convention: deltas wrap mod 2^32, readers accumulate wrapping)
            values_b = delta.encode(
                np.asarray(_slice_dense(c.dense, c.phys, pdlo, pdhi)),
                wrap32=c.phys == "int32")
        elif ba_encoding is not None:
            # per-page independent streams (prefix chain restarts at 0),
            # so page-skipping readers can start at any page
            pg_view = _slice_dense(c.dense, c.phys, pdlo, pdhi)
            values_b = bytearray_codecs.encode_delta_length_spec(pg_view) \
                if ba_encoding == "delta_length" \
                else bytearray_codecs.encode_delta_byte_array_spec(pg_view)
        else:
            values_b = _plain_values(
                _slice_dense(c.dense, c.phys, pdlo, pdhi), c.phys)
        rep_arr, def_arr = c.page_levels(plo, phi)
        n_slots_pg = c.num_values(plo, phi)
        if data_page_version == 2:
            # V2: rep+def levels UNPREFIXED and outside the compressed
            # region, rep first (reference properties.h:363-377 / format
            # v2 pages; level byte lengths in header fields 6/5)
            rep_b = b"" if rep_arr is None \
                else rle.encode(rep_arr, _bit_width(c.max_rep))
            def_b = b"" if def_arr is None \
                else rle.encode(def_arr, _bit_width(c.max_def))
            levels = rep_b + def_b
            vbody = _compress(values_b, codec)
            hdr = _page_header(
                _PAGE_DATA_V2, len(levels) + len(values_b),
                len(levels) + len(vbody), 8,
                [(1, _I32, n_slots_pg),
                 (2, _I32, n_slots_pg - (pdhi - pdlo)),
                 (3, _I32, phi - plo), (4, _I32, encoding),
                 (5, _I32, len(def_b)), (6, _I32, len(rep_b)),
                 (7, _TRUE if codec is not None else _FALSE, None)])
            buf += hdr
            buf += levels
            buf += vbody
            raw_total += len(hdr) + len(levels) + len(values_b)
        else:
            rep_b = b"" if rep_arr is None \
                else rle.encode_length_prefixed(rep_arr,
                                                _bit_width(c.max_rep))
            def_b = b"" if def_arr is None \
                else rle.encode_length_prefixed(def_arr,
                                                _bit_width(c.max_def))
            payload = rep_b + def_b + values_b
            body = _compress(payload, codec)
            hdr = _page_header(_PAGE_DATA, len(payload), len(body), 5,
                               [(1, _I32, n_slots_pg), (2, _I32, encoding),
                                (3, _I32, ENC_RLE), (4, _I32, ENC_RLE)])
            buf += hdr
            buf += body
            raw_total += len(hdr) + len(payload)
        # page-index record (parquet ColumnIndex/OffsetIndex analog of the
        # chunk format's per-page min/max, chunk.py page_index)
        pg_dense = _slice_dense(c.dense, c.phys, pdlo, pdhi)
        if pdhi == pdlo:
            pmin = pmax = None
        elif _is_fixed_bytes(c.phys):
            pmin = pmax = NAN_POISONED   # untrustworthy ordering: no index
        elif c.phys == "byte_array":
            view = pg_dense if isinstance(pg_dense, ba.ByteArrayView) \
                else ba.as_view(pg_dense)
            pmin, pmax = ba.minmax(view)
        else:
            arr = np.asarray(pg_dense)
            if c.phys in ("float", "double") and bool(np.isnan(arr).any()):
                pmin = pmax = NAN_POISONED
            else:
                pmin, pmax = arr.min(), arr.max()
        pages.append({
            "offset": page_off,
            "size": len(buf) - page_off,
            "first_row": plo - lo,
            "null_count": n_slots_pg - (pdhi - pdlo),
            "min": pmin, "max": pmax,
        })

    total_comp = len(buf) - chunk_start
    cmd = [(1, _I32, _phys_id(c.phys)[0]),
           (2, _LIST, (_I32, encodings)),
           (3, _LIST, (_BINARY, c.path)),
           (4, _I32, codec_id),
           (5, _I64, c.num_values(lo, hi)),
           (6, _I64, raw_total), (7, _I64, total_comp),
           (9, _I64, data_page_offset)]
    if dict_page_offset is not None:
        cmd.append((11, _I64, dict_page_offset))
    if write_statistics:
        # def < max_def slots: nulls at any nesting depth plus one marker
        # per empty/null list — level slots minus dense values
        null_count = c.num_values(lo, hi) - (dhi - dlo)
        st = _chunk_stats(dense, c.phys, null_count)
        if st is not None:
            cmd.append((12, _STRUCT, st))
    return [chunk_start, total_comp, cmd, pages]


def write_file(path: str, columns: list[tuple], num_rows: int,
               created_by: str = "parquet_cpp_spark",
               row_group_rows: "int | None" = None,
               page_rows: "int | None" = None,
               compression: "str | None" = None,
               write_statistics: bool = True,
               utf8_columns: "frozenset[str] | set[str]" = frozenset(),
               delta_columns: "frozenset[str] | set[str]" = frozenset(),
               delta_length_columns: "frozenset[str] | set[str]"
               = frozenset(),
               delta_byte_array_columns: "frozenset[str] | set[str]"
               = frozenset(),
               data_page_version: int = 1,
               dict_size_limit: int = DEFAULT_DICT_SIZE_LIMIT,
               write_page_index: bool = True,
               decimal_columns: "dict[str, tuple[int, int]] | None" = None,
               annotations: "dict[str, str] | None" = None,
               key_value_metadata: "dict[str, str] | None" = None,
               bloom_filter_columns: "frozenset[str] | set[str]"
               = frozenset(),
               bloom_fpp: float = 0.01,
               field_ids: "dict[str, int] | None" = None) -> None:
    """Write flat columns as a readable PAR1 file.

    ``field_ids``: optional TOP-LEVEL column name -> parquet field_id
    (SchemaElement field 9 — the id Iceberg-family table formats track
    columns by across renames; pyarrow surfaces it as the
    ``PARQUET:field_id`` field metadata). Emitted on the column's
    top-level schema element only.

    ``columns``: (name, phys, values[, valid[, use_dictionary]]) tuples.
    ``values`` are slot-aligned when ``valid`` is given (entries at null
    slots are ignored); byte_array values may be list[bytes] or a
    ``ba.ByteArrayView``. ``row_group_rows``/``page_rows`` split the file
    into multiple row groups / data pages; ``compression`` is one of
    None/'snappy'/'gzip'/'zstd' (page-body compression, V1 layout).
    byte_array columns named in ``utf8_columns`` carry the UTF8 converted
    type, so schema-strict readers (Spark's JVM reader) surface them as
    strings instead of raw binary. int32/int64 columns named in
    ``delta_columns`` write DELTA_BINARY_PACKED data pages straight from
    ``kernels.delta``; byte_array columns named in
    ``delta_length_columns`` / ``delta_byte_array_columns`` write
    DELTA_LENGTH_BYTE_ARRAY / DELTA_BYTE_ARRAY data pages
    (``kernels.bytearray_codecs`` in the parquet-format page framing —
    the reference's decoders are ``encoding-internal.h:883-975``;
    prefix-sharing DELTA_BYTE_ARRAY is the natural choice for path-like
    string columns such as ``doc_id``). ``data_page_version=2`` writes
    DataPageV2 (def
    levels unprefixed and outside the compressed region).
    FLBA columns are spelled ``phys='flba:<N>'`` (values: N-byte strings,
    PLAIN pages, stats null_count-only — FLBA ordering is type-defined,
    not byte-lexicographic); ``'int96'`` is the 12-byte deprecated
    timestamp layout. ``decimal_columns`` maps an FLBA column name to
    (precision, scale) for the DECIMAL converted type (two's-complement
    big-endian unscaled ints — ``logical.decimal_to_flba`` produces this
    layout). ``annotations`` maps an int column name to a temporal
    converted type — 'date' / 'time_ms' (int32 storage), 'time_us' /
    'timestamp_ms' / 'timestamp_us' (int64 storage) — so readers surface
    real date/timestamp columns (``logical.py`` produces the stored ints).
    ``write_page_index`` (default on) emits the parquet PageIndex —
    per-page ColumnIndex (null_pages/min/max/boundary_order/null_counts)
    and OffsetIndex (page offset/size/first_row) structures between the
    data and the footer, linked from each ColumnChunk — so readers can
    skip pages without touching page headers (the parquet analog of the
    chunk format's per-page min/max, ``chunk.py`` page_index).
    ``bloom_filter_columns`` (leaf names, dotted for nested) embeds a
    STANDARD parquet-format bloom per column chunk — BloomFilterHeader
    (algorithm=BLOCK, hash=XXHASH, uncompressed) + split-block bitset
    sized by ``optimal_num_bytes(exact ndv, bloom_fpp)``, linked via
    ColumnMetaData bloom_filter_offset/length — so a point lookup can
    skip a whole CHUNK before touching its PageIndex
    (``parquet_format.lookup_rows`` consults it; the bloom math is
    ``kernels/bloom.StandardBloomFilter`` over ``kernels/xxh``'s
    Spark-pinned XXH64).
    """
    if data_page_version not in (1, 2):
        raise ValueError("data_page_version must be 1 or 2")
    if compression not in _CODEC_IDS:
        raise ValueError(f"unsupported compression {compression!r} "
                         f"(one of {sorted(k for k in _CODEC_IDS if k)})")
    decimal_columns = dict(decimal_columns or {})
    annotations = dict(annotations or {})
    utf8_columns = set(utf8_columns)
    spec_list = list(columns)
    cols: list[_Leaf] = []
    for s in spec_list:
        if hasattr(s, "pcs_annotations"):
            # general-walker specs harvest utf8/temporal/decimal keys at
            # construction; merge them so callers need not re-plumb them
            s_utf8, s_ann, s_dec = s.pcs_annotations()
            utf8_columns |= s_utf8
            annotations.update(s_ann)
            decimal_columns.update(s_dec)
        cols.extend(_leaves_of(s))
    for c in cols:
        if c.n_rows != num_rows:
            raise ValueError(f"column {c.name}: {c.n_rows} slots, "
                             f"expected {num_rows}")

    ba_enc = {}
    for names, kind in ((delta_length_columns, "delta_length"),
                        (delta_byte_array_columns, "delta_byte_array")):
        for n in names:
            if n in ba_enc:
                raise ValueError(f"column {n!r} named in both "
                                 "delta_length_columns and "
                                 "delta_byte_array_columns")
            ba_enc[n] = kind
    leaf_names = {c.name for c in cols}
    unknown = set(ba_enc) - leaf_names
    if unknown:
        raise ValueError(f"delta byte-array columns not in schema: "
                         f"{sorted(unknown)} (have {sorted(leaf_names)})")

    buf = bytearray(MAGIC)
    rg_step = max(1, num_rows if row_group_rows is None else row_group_rows)
    rg_infos = []                 # per rg: [(start, total, cmd, pages)]
    rg_bounds = []                # per rg: (lo, hi) row range
    for lo in range(0, max(num_rows, 1), rg_step):
        hi = min(lo + rg_step, num_rows)
        per_rg = []
        for c in cols:
            per_rg.append(_write_chunk(buf, c, lo, hi, page_rows,
                                       compression, write_statistics,
                                       c.name in delta_columns,
                                       data_page_version,
                                       dict_size_limit,
                                       ba_encoding=ba_enc.get(c.name)))
        rg_infos.append((per_rg, hi - lo))
        rg_bounds.append((lo, hi))

    # PageIndex region: all ColumnIndex structs, then all OffsetIndex
    # structs, between the last data page and the footer (parquet-mr
    # layout). ColumnChunk fields 4-7 link to them.
    ci_pos: dict = {}
    oi_pos: dict = {}
    if write_page_index:
        for ri, (per_rg, _n) in enumerate(rg_infos):
            for cj, (_s, _t, _cmd, pages) in enumerate(per_rg):
                fields = _column_index_fields(pages, cols[cj].phys)
                if fields is None:
                    continue
                b = bytearray()
                _struct(b, fields)
                ci_pos[(ri, cj)] = (len(buf), len(b))
                buf += b
        for ri, (per_rg, _n) in enumerate(rg_infos):
            for cj, (_s, _t, _cmd, pages) in enumerate(per_rg):
                b = bytearray()
                _struct(b, _offset_index_fields(pages))
                oi_pos[(ri, cj)] = (len(buf), len(b))
                buf += b

    # Bloom region: one BloomFilterHeader + split-block bitset per
    # (row group, bloom column) after the PageIndex, before the footer;
    # ColumnMetaData fields 14/15 link to it (parquet-format bloom spec)
    bf_pos: dict = {}
    if bloom_filter_columns:
        from ..kernels import bloom as bloom_mod
        for cj, c in enumerate(cols):
            if c.name not in bloom_filter_columns:
                continue
            if c.phys not in ("int32", "int64", "byte_array"):
                raise ValueError(f"bloom filter on {c.name!r}: phys "
                                 f"{c.phys} unsupported (int32/int64/"
                                 "byte_array)")
            for ri, (lo, hi) in enumerate(rg_bounds):
                dlo, dhi = c.dense_range(lo, hi)
                dense = _slice_dense(c.dense, c.phys, dlo, dhi)
                if c.phys == "byte_array":
                    vals = ba.to_list(dense) \
                        if isinstance(dense, ba.ByteArrayView) \
                        else [bytes(v) for v in dense]
                    ndv = len(set(vals))
                    bf = bloom_mod.StandardBloomFilter(
                        bloom_mod.optimal_num_bytes(max(ndv, 1), bloom_fpp))
                    bf.insert_bytes(vals)
                else:
                    arr = np.asarray(dense)
                    ndv = len(np.unique(arr))
                    bf = bloom_mod.StandardBloomFilter(
                        bloom_mod.optimal_num_bytes(max(ndv, 1), bloom_fpp))
                    if c.phys == "int32":
                        bf.insert_int32(arr)
                    else:
                        bf.insert_int64(arr)
                bitset = bf.words.tobytes()
                hdr = bytearray()
                # BloomFilterHeader: numBytes + three unions, each a
                # one-field struct holding an empty struct (BLOCK /
                # XXHASH / UNCOMPRESSED)
                _struct(hdr, [(1, _I32, len(bitset)),
                              (2, _STRUCT, [(1, _STRUCT, [])]),
                              (3, _STRUCT, [(1, _STRUCT, [])]),
                              (4, _STRUCT, [(1, _STRUCT, [])])])
                bf_pos[(ri, cj)] = (len(buf), len(hdr) + len(bitset))
                buf += hdr
                buf += bitset

    row_groups = []
    for ri, (per_rg, n_rows_rg) in enumerate(rg_infos):
        chunks = []
        total_bytes = 0
        for cj, (start, total, cmd, _pages) in enumerate(per_rg):
            if (ri, cj) in bf_pos:
                o, ln = bf_pos[(ri, cj)]
                cmd = cmd + [(14, _I64, o), (15, _I32, ln)]
            fields = [(2, _I64, start), (3, _STRUCT, cmd)]
            if (ri, cj) in oi_pos:
                o, ln = oi_pos[(ri, cj)]
                fields += [(4, _I64, o), (5, _I32, ln)]
            if (ri, cj) in ci_pos:
                o, ln = ci_pos[(ri, cj)]
                fields += [(6, _I64, o), (7, _I32, ln)]
            chunks.append(fields)
            total_bytes += total
        row_groups.append([(1, _LIST, (_STRUCT, chunks)),
                           (2, _I64, total_bytes),
                           (3, _I64, n_rows_rg)])

    def _leaf_el(phys: str, repetition: int, leaf_name: str,
                 ann_key: str) -> list:
        """SchemaElement for one leaf, with utf8/temporal/decimal
        annotations keyed by ``ann_key`` (the dotted path for nested
        leaves, the plain column name for flat/list columns)."""
        if ann_key in utf8_columns and phys != "byte_array":
            raise ValueError(f"utf8 annotation on non-byte_array "
                             f"column {ann_key!r}")
        tid, tlen = _phys_id(phys)
        tl_field = [(2, _I32, tlen)] if phys.startswith("flba:") else []
        el = [(1, _I32, tid), *tl_field, (3, _I32, repetition),
              (4, _BINARY, leaf_name)]
        if ann_key in utf8_columns:
            el.append((6, _I32, 0))  # ConvertedType UTF8
        if ann_key in annotations:
            ann = annotations[ann_key]
            if ann not in _TIME_ANNOTATIONS:
                raise ValueError(f"unknown annotation {ann!r} "
                                 f"(one of {sorted(_TIME_ANNOTATIONS)})")
            conv_id, want_phys, utc = _TIME_ANNOTATIONS[ann]
            if phys != want_phys:
                raise ValueError(f"annotation {ann!r} needs {want_phys} "
                                 f"storage, column {ann_key!r} is {phys}")
            if conv_id is not None:
                el.append((6, _I32, conv_id))
            if utc is not None:
                # SchemaElement.logicalType (field 10): union TIMESTAMP
                # (field 8) = {1: isAdjustedToUTC, 2: TimeUnit union
                # (1 MILLIS / 2 MICROS, empty structs)}
                unit_fid = 1 if ann.endswith("_ms") else 2
                ts = [(1, _TRUE if utc else _FALSE, None),
                      (2, _STRUCT, [(unit_fid, _STRUCT, [])])]
                el.append((10, _STRUCT, [(8, _STRUCT, ts)]))
        if ann_key in decimal_columns:
            if not phys.startswith("flba:"):
                raise ValueError(f"decimal annotation on non-FLBA "
                                 f"column {ann_key!r}")
            precision, scale = decimal_columns[ann_key]
            # two's-complement big-endian unscaled ints in fixed bytes —
            # the logical.py decimal->FLBA layout (arrow/writer.cc:572+)
            el += [(6, _I32, 5), (7, _I32, scale), (8, _I32, precision)]
        return el

    # root num_children counts TOP-LEVEL fields (group nodes count once;
    # their leaves hang beneath them), schema.h:106-303 tree shape
    schema = [[(3, _I32, 0), (4, _BINARY, "schema"),
               (5, _I32, len(spec_list))]]
    top_elements: list = []   # (top-level element index, column name)
    for s in spec_list:
        top_elements.append(
            (len(schema), s[0] if isinstance(s, tuple) else s.name))
        if hasattr(s, "pcs_schema"):
            # general-walker spec: it emits its own schema subtree (group
            # skeletons + leaves through _leaf_el for the annotations)
            schema.extend(s.pcs_schema(_leaf_el))
        elif isinstance(s, ListColumn):
            # standard 3-level list shape (schema.h:43-77): a group
            # annotated LIST, one REPEATED middle group, the leaf.
            # Spark/pyarrow/DuckDB all read this as array<element>.
            outer_rep = 1 if s.valid is not None else 0
            elem_rep = 1 if s.element_valid is not None else 0
            schema.append([(3, _I32, outer_rep), (4, _BINARY, s.name),
                           (5, _I32, 1), (6, _I32, 3)])  # ConvertedType LIST
            schema.append([(3, _I32, 2), (4, _BINARY, "list"),
                           (5, _I32, 1)])                # REPEATED group
            schema.append(_leaf_el(s.phys, elem_rep, "element", s.name))
        elif isinstance(s, NestedListColumn):
            # two LIST annotations deep: group(LIST) > repeated list >
            # group element(LIST) > repeated list > leaf element
            outer_rep = 1 if s.valid is not None else 0
            inner_rep = 1 if s.inner_valid is not None else 0
            elem_rep = 1 if s.element_valid is not None else 0
            schema.append([(3, _I32, outer_rep), (4, _BINARY, s.name),
                           (5, _I32, 1), (6, _I32, 3)])  # ConvertedType LIST
            schema.append([(3, _I32, 2), (4, _BINARY, "list"),
                           (5, _I32, 1)])
            schema.append([(3, _I32, inner_rep), (4, _BINARY, "element"),
                           (5, _I32, 1), (6, _I32, 3)])  # inner LIST group
            schema.append([(3, _I32, 2), (4, _BINARY, "list"),
                           (5, _I32, 1)])
            schema.append(_leaf_el(s.phys, elem_rep, "element", s.name))
        elif isinstance(s, StructColumn):
            def _emit_struct(sc: StructColumn, gname: str, dotted: str):
                rep = 1 if sc.valid is not None else 0
                schema.append([(3, _I32, rep), (4, _BINARY, gname),
                               (5, _I32, len(sc.fields))])  # group node
                for f in sc.fields:
                    if _is_nested_struct_field(f):
                        _emit_struct(f[1], f[0], f"{dotted}.{f[0]}")
                        continue
                    if _is_list_field(f):
                        lc = f[1]
                        l_rep = 1 if lc.valid is not None else 0
                        e_rep = 1 if lc.element_valid is not None else 0
                        schema.append([(3, _I32, l_rep), (4, _BINARY,
                                       f[0]), (5, _I32, 1),
                                       (6, _I32, 3)])  # LIST
                        schema.append([(3, _I32, 2), (4, _BINARY, "list"),
                                       (5, _I32, 1)])
                        schema.append(_leaf_el(lc.phys, e_rep, "element",
                                               f"{dotted}.{f[0]}"))
                        continue
                    fname, fphys = f[0], f[1]
                    f_rep = 1 if len(f) > 3 and f[3] is not None else 0
                    schema.append(_leaf_el(fphys, f_rep, fname,
                                           f"{dotted}.{fname}"))
            _emit_struct(s, s.name, s.name)
        elif isinstance(s, ListStructColumn):
            # group(LIST) > repeated list > group element (the struct) >
            # one leaf per field — arrow/schema.cc list-of-struct shape
            outer_rep = 1 if s.valid is not None else 0
            elem_rep = 1 if s.element_valid is not None else 0
            schema.append([(3, _I32, outer_rep), (4, _BINARY, s.name),
                           (5, _I32, 1), (6, _I32, 3)])  # ConvertedType LIST
            schema.append([(3, _I32, 2), (4, _BINARY, "list"),
                           (5, _I32, 1)])
            schema.append([(3, _I32, elem_rep), (4, _BINARY, "element"),
                           (5, _I32, len(s.fields))])    # struct group
            for f in s.fields:
                f_rep = 1 if len(f) > 3 and f[3] is not None else 0
                schema.append(_leaf_el(f[1], f_rep, f[0],
                                       f"{s.name}.{f[0]}"))
        elif isinstance(s, MapColumn):
            # MAP converted type: group(MAP) > repeated key_value
            # (MAP_KEY_VALUE) > required key + value (schema.h:43-77)
            rep = 1 if s.valid is not None else 0
            schema.append([(3, _I32, rep), (4, _BINARY, s.name),
                           (5, _I32, 1), (6, _I32, 1)])   # ConvertedType MAP
            schema.append([(3, _I32, 2), (4, _BINARY, "key_value"),
                           (5, _I32, 2), (6, _I32, 2)])   # MAP_KEY_VALUE
            schema.append(_leaf_el(s.key_phys, 0, "key", f"{s.name}.key"))
            val_rep = 1 if s.value_valid is not None else 0
            schema.append(_leaf_el(s.value_phys, val_rep, "value",
                                   f"{s.name}.value"))
        else:
            name, phys = s[0], s[1]
            rep = 1 if len(s) > 3 and s[3] is not None else 0
            schema.append(_leaf_el(phys, rep, name, name))
    if field_ids:
        unknown = set(field_ids) - {n for _i, n in top_elements}
        if unknown:
            raise ValueError(f"field_ids for absent columns: "
                             f"{sorted(unknown)}")
        for idx, name in top_elements:
            fid = field_ids.get(name)
            if fid is not None:
                # SchemaElement.field_id (field 9) on the TOP-LEVEL
                # element; compact protocol needs ascending field order
                schema[idx].append((9, _I32, int(fid)))
                schema[idx].sort(key=lambda t: t[0])
    fmd = bytearray()
    # column_orders: TYPE_DEFINED_ORDER per leaf — without it readers must
    # ignore min_value/max_value (parquet-format Statistics contract)
    column_orders = [[(1, _STRUCT, [])] for _ in cols]
    fmd_fields = [(1, _I32, 1),
                  (2, _LIST, (_STRUCT, schema)),
                  (3, _I64, num_rows),
                  (4, _LIST, (_STRUCT, row_groups))]
    if key_value_metadata:
        kvs = [[(1, _BINARY, k), (2, _BINARY, v)]
               for k, v in sorted(key_value_metadata.items())]
        fmd_fields.append((5, _LIST, (_STRUCT, kvs)))
    fmd_fields += [(6, _BINARY, created_by),
                   (7, _LIST, (_STRUCT, column_orders))]
    _struct(fmd, fmd_fields)
    buf += fmd
    buf += len(fmd).to_bytes(4, "little")
    buf += MAGIC
    with open(path, "wb") as f:
        f.write(bytes(buf))
