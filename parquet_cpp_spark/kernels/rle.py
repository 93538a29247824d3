"""RLE/bit-packed hybrid codec (parquet-format "RLE/Bit-Packing Hybrid").

This is the core kernel the reference gets from Arrow's vendored
``RleEncoder``/``RleDecoder`` (use sites:
``/root/reference/src/parquet/column_writer.cc:48`` for def/rep levels and
``/root/reference/src/parquet/encoding-internal.h:772`` for dictionary
indices). Stream grammar (parquet-format Encodings.md):

    rle-bit-packed-hybrid := run*
    run := bit-packed-run | rle-run
    bit-packed-run := varint header (LSB==1, header>>1 == number of 8-value
                      groups) + LSB-first bit-packed values (groups*8 values)
    rle-run := varint header (LSB==0, header>>1 == repeat count) +
               repeated value stored in ceil(bit_width/8) little-endian bytes

Encoding policy (deterministic, spec-compliant; byte layout need not match
Arrow's encoder choices — the correctness bar is decoded-value equality):
values are scanned in groups of 8; maximal stretches of uniform groups with a
single value become one RLE run (count = 8*k, extended by an equal tail),
everything else becomes bit-packed literal runs. A trailing partial group is
zero-padded (the decoder stops after ``n`` values). Run detection and packing
are fully vectorized; the per-stretch emission loop is O(#stretches).
"""

from __future__ import annotations

import numpy as np

from . import bitpack
from .varint import decode_uvarint, encode_uvarint

# Cap literal runs at the spec's practical group limit to keep headers small.
_MAX_LITERAL_GROUPS = (1 << 31) - 1


def _value_bytes(bit_width: int) -> int:
    return (bit_width + 7) // 8


def encode(values: np.ndarray, bit_width: int) -> bytes:
    """Encode non-negative ints (< 2**bit_width) to an RLE-hybrid stream."""
    n = len(values)
    if n == 0:
        return b""
    a = np.ascontiguousarray(values).astype(np.uint64, copy=False)
    vbytes = _value_bytes(bit_width)
    out = bytearray()

    n_groups = n // 8
    tail = n - n_groups * 8

    if n_groups == 0:
        # Single partial group: emit one zero-padded literal group.
        padded = np.zeros(8, dtype=np.uint64)
        padded[:n] = a
        out += encode_uvarint((1 << 1) | 1)
        out += bitpack.pack(padded, bit_width)
        return bytes(out)

    g = a[: n_groups * 8].reshape(n_groups, 8)
    uniform = (g == g[:, :1]).all(axis=1)
    gval = g[:, 0]

    # Stretch boundaries: a new stretch starts when uniformity flips, or when
    # two adjacent uniform groups carry different values.
    if n_groups == 1:
        starts = np.array([0], dtype=np.int64)
    else:
        change = uniform[1:] != uniform[:-1]
        change |= uniform[1:] & uniform[:-1] & (gval[1:] != gval[:-1])
        starts = np.concatenate(([0], np.flatnonzero(change) + 1))
    ends = np.concatenate((starts[1:], [n_groups]))

    tail_vals = a[n_groups * 8:]
    tail_done = False

    for s, e in zip(starts.tolist(), ends.tolist()):
        if uniform[s]:
            count = (e - s) * 8
            val = int(gval[s])
            if e == n_groups and tail and bool((tail_vals == gval[s]).all()):
                count += tail
                tail_done = True
            out += encode_uvarint(count << 1)
            out += val.to_bytes(vbytes, "little")
        else:
            ng = e - s
            chunk_vals = g[s:e].ravel()
            off = 0
            while ng > 0:
                take = min(ng, _MAX_LITERAL_GROUPS)
                out += encode_uvarint((take << 1) | 1)
                out += bitpack.pack(chunk_vals[off: off + take * 8], bit_width)
                ng -= take
                off += take * 8

    if tail and not tail_done:
        padded = np.zeros(8, dtype=np.uint64)
        padded[:tail] = tail_vals
        out += encode_uvarint((1 << 1) | 1)
        out += bitpack.pack(padded, bit_width)

    return bytes(out)


def decode(buf, n_values: int, bit_width: int, pos: int = 0,
           out_dtype=np.int64) -> tuple[np.ndarray, int]:
    """Decode ``n_values`` from the stream; returns (values, new_pos)."""
    out = np.empty(n_values, dtype=out_dtype)
    vbytes = _value_bytes(bit_width)
    idx = 0
    mv = memoryview(buf) if not isinstance(buf, memoryview) else buf
    while idx < n_values:
        header, pos = decode_uvarint(mv, pos)
        if header & 1:
            ngroups = header >> 1
            cnt = ngroups * 8
            nb = bitpack.bytes_for(cnt, bit_width)
            vals = bitpack.unpack(mv[pos: pos + nb], cnt, bit_width, out_dtype)
            take = min(cnt, n_values - idx)
            out[idx: idx + take] = vals[:take]
            idx += take
            pos += nb
        else:
            cnt = header >> 1
            if cnt == 0:
                raise ValueError("corrupt RLE stream: zero-length run")
            val = int.from_bytes(mv[pos: pos + vbytes], "little")
            pos += vbytes
            take = min(cnt, n_values - idx)
            out[idx: idx + take] = val
            idx += take
    return out, pos


def encode_length_prefixed(values: np.ndarray, bit_width: int) -> bytes:
    """RLE payload with the u32 little-endian length prefix used for V1 data
    page levels (``/root/reference/src/parquet/column_writer.cc:331-352``)."""
    payload = encode(values, bit_width)
    return len(payload).to_bytes(4, "little") + payload


def decode_length_prefixed(buf, n_values: int, bit_width: int, pos: int = 0,
                           out_dtype=np.int64) -> tuple[np.ndarray, int]:
    """Inverse of :func:`encode_length_prefixed`; skips by the prefix, as the
    reference's ``LevelDecoder::SetData`` does
    (``/root/reference/src/parquet/column_reader.cc:51-59``)."""
    ln = int.from_bytes(buf[pos: pos + 4], "little")
    payload_start = pos + 4
    vals, _ = decode(buf, n_values, bit_width, payload_start, out_dtype)
    return vals, payload_start + ln
