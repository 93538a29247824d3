"""LSB-first bit-packing, as used by the parquet RLE/bit-packing hybrid.

Semantics follow the parquet-format spec (bit-packed run of the RLE hybrid):
value ``i``'s bit ``j`` lands at bitstream position ``i * bit_width + j``, and
the bitstream is laid out little-endian within bytes. This is the same layout
parquet-cpp gets from Arrow's ``BitWriter`` (see use in
``/root/reference/src/parquet/encoding-internal.h:766-780`` for dictionary
indices and ``/root/reference/src/parquet/column_writer.cc:39-110`` for
levels).

Vectorized via numpy (no per-value Python).
"""

from __future__ import annotations

import numpy as np


def bytes_for(n_values: int, bit_width: int) -> int:
    """Bytes needed to pack ``n_values`` at ``bit_width`` bits each."""
    return (n_values * bit_width + 7) // 8


def pack(values: np.ndarray, bit_width: int) -> bytes:
    """Pack non-negative integers into an LSB-first bitstream.

    Values must fit in ``bit_width`` bits (callers guarantee this; the
    reference computes the width from the max value the same way,
    ``encoding-internal.h:499-503``).
    """
    n = len(values)
    if bit_width == 0 or n == 0:
        return b""
    if bit_width > 64:
        raise ValueError(f"bit_width {bit_width} > 64")
    v = np.ascontiguousarray(values).astype(np.uint64, copy=False)
    shifts = np.arange(bit_width, dtype=np.uint64)
    bits = ((v[:, None] >> shifts) & np.uint64(1)).astype(np.uint8)
    return np.packbits(bits.ravel(), bitorder="little").tobytes()


def unpack(buf: bytes | memoryview, n_values: int, bit_width: int,
           out_dtype=np.int64) -> np.ndarray:
    """Inverse of :func:`pack`. Reads exactly ``bytes_for(n, w)`` bytes."""
    if bit_width == 0 or n_values == 0:
        return np.zeros(n_values, dtype=out_dtype)
    total_bits = n_values * bit_width
    nbytes = (total_bits + 7) // 8
    raw = np.frombuffer(buf, dtype=np.uint8, count=nbytes)
    bits = np.unpackbits(raw, bitorder="little", count=total_bits)
    bits = bits.reshape(n_values, bit_width).astype(np.uint64)
    weights = np.uint64(1) << np.arange(bit_width, dtype=np.uint64)
    vals = bits @ weights
    return vals.astype(out_dtype)


def width_for_max(max_value: int) -> int:
    """bit_width = number of bits to represent max_value (0 for 0)."""
    if max_value < 0:
        raise ValueError("bit-packing requires non-negative values")
    return int(max_value).bit_length()
