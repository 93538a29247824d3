"""DELTA_BINARY_PACKED — frame-of-reference delta coding for integers.

Format per parquet-format spec, matching the reference's decoder
(``/root/reference/src/parquet/encoding-internal.h:785-878``) and the encoder
semantics in ``/root/reference/benchmarks/decode_benchmark.cc:35-114``:

    header   := varint(block_size) varint(miniblocks_per_block)
                varint(total_value_count) zigzag-varint(first_value)
    block    := zigzag-varint(min_delta)
                bit_width per miniblock (1 byte each, all miniblocks)
                miniblock* (32 deltas each, LSB-first bit-packed at its width)

We use block_size=128 with 4 miniblocks of 32 (the spec default; the
reference harness uses miniblock sizes 8/16/32). Deltas are
``value[i] - value[i-1]``; packed values are ``delta - min_delta`` (always
>= 0). The trailing miniblock is zero-padded; miniblocks wholly past the end
get a width byte of 0 and no data. Encode/decode are vectorized with numpy
(cumsum for reconstruction); the only Python loop is per-miniblock.
"""

from __future__ import annotations

import numpy as np

from . import bitpack
from .varint import (decode_uvarint, decode_zigzag_varint, encode_uvarint,
                     encode_zigzag_varint)

BLOCK_SIZE = 128
MINIBLOCKS = 4
MINI_SIZE = BLOCK_SIZE // MINIBLOCKS  # 32


def encode(values: np.ndarray) -> bytes:
    v = np.ascontiguousarray(values).astype(np.int64, copy=False)
    n = len(v)
    out = bytearray()
    out += encode_uvarint(BLOCK_SIZE)
    out += encode_uvarint(MINIBLOCKS)
    out += encode_uvarint(n)
    out += encode_zigzag_varint(int(v[0]) if n else 0)
    if n <= 1:
        return bytes(out)

    deltas = np.diff(v)  # int64; int32 inputs cannot overflow this
    nd = len(deltas)
    for bstart in range(0, nd, BLOCK_SIZE):
        block = deltas[bstart: bstart + BLOCK_SIZE]
        min_delta = int(block.min())
        adj = (block - min_delta).astype(np.uint64)
        out += encode_zigzag_varint(min_delta)

        widths = []
        packed: list[bytes] = []
        for m in range(MINIBLOCKS):
            mb = adj[m * MINI_SIZE: (m + 1) * MINI_SIZE]
            if len(mb) == 0:
                widths.append(0)
                continue
            w = bitpack.width_for_max(int(mb.max()))
            widths.append(w)
            if w == 0:
                continue
            if len(mb) < MINI_SIZE:
                full = np.zeros(MINI_SIZE, dtype=np.uint64)
                full[: len(mb)] = mb
                mb = full
            packed.append(bitpack.pack(mb, w))
        out += bytes(widths)
        for p in packed:
            out += p
    return bytes(out)


def decode(buf, pos: int = 0, out_dtype=np.int64) -> tuple[np.ndarray, int]:
    mv = memoryview(buf) if not isinstance(buf, memoryview) else buf
    block_size, pos = decode_uvarint(mv, pos)
    miniblocks, pos = decode_uvarint(mv, pos)
    n, pos = decode_uvarint(mv, pos)
    first, pos = decode_zigzag_varint(mv, pos)
    if block_size % miniblocks:
        raise ValueError("corrupt delta header: block_size % miniblocks != 0")
    mini_size = block_size // miniblocks
    out = np.empty(n, dtype=np.int64)
    if n == 0:
        return out.astype(out_dtype, copy=False), pos
    out[0] = first
    nd = n - 1
    if nd == 0:
        return out.astype(out_dtype, copy=False), pos

    deltas = np.empty(nd, dtype=np.int64)
    got = 0
    while got < nd:
        min_delta, pos = decode_zigzag_varint(mv, pos)
        widths = list(mv[pos: pos + miniblocks])
        pos += miniblocks
        for w in widths:
            if got >= nd:
                break
            take = min(mini_size, nd - got)
            if w == 0:
                deltas[got: got + take] = min_delta
            else:
                nb = bitpack.bytes_for(mini_size, w)
                vals = bitpack.unpack(mv[pos: pos + nb], mini_size, w, np.int64)
                deltas[got: got + take] = vals[:take] + min_delta
                pos += nb
            got += take

    np.cumsum(deltas, out=deltas)
    out[1:] = out[0] + deltas
    return out.astype(out_dtype, copy=False), pos
