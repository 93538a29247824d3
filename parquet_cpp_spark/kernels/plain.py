"""PLAIN encoding — little-endian memcpy of values.

Mirrors ``/root/reference/src/parquet/encoding-internal.h:186-317`` (encode)
and ``:51-137`` (decode): fixed-width types are raw LE arrays, BOOLEAN is
1-bit-packed, BYTE_ARRAY is u32-LE length + bytes per value
(``parquet.thrift:406``), FIXED_LEN_BYTE_ARRAY is the raw bytes.
"""

from __future__ import annotations

import numpy as np

_DTYPES = {
    "int32": np.dtype("<i4"),
    "int64": np.dtype("<i8"),
    "float": np.dtype("<f4"),
    "double": np.dtype("<f8"),
}


def encode_fixed(values: np.ndarray, phys: str) -> bytes:
    dt = _DTYPES[phys]
    return np.ascontiguousarray(values, dtype=dt).tobytes()


def decode_fixed(buf, n_values: int, phys: str, pos: int = 0) -> tuple[np.ndarray, int]:
    dt = _DTYPES[phys]
    arr = np.frombuffer(buf, dtype=dt, count=n_values, offset=pos)
    return arr, pos + n_values * dt.itemsize


def encode_boolean(values: np.ndarray) -> bytes:
    """1 bit per value, LSB-first (reference's BitWriter,
    ``encoding-internal.h:206-281``)."""
    v = np.ascontiguousarray(values, dtype=np.uint8)
    return np.packbits(v, bitorder="little").tobytes()


def decode_boolean(buf, n_values: int, pos: int = 0) -> tuple[np.ndarray, int]:
    nbytes = (n_values + 7) // 8
    raw = np.frombuffer(buf, dtype=np.uint8, count=nbytes, offset=pos)
    bits = np.unpackbits(raw, bitorder="little", count=n_values)
    return bits.astype(bool), pos + nbytes


def encode_byte_array(values: list[bytes]) -> bytes:
    """u32-LE length + payload per value, vectorized via offset arithmetic."""
    n = len(values)
    if n == 0:
        return b""
    lens = np.fromiter((len(v) for v in values), dtype=np.int64, count=n)
    total = int(lens.sum()) + 4 * n
    out = np.empty(total, dtype=np.uint8)
    # Interleave: each item occupies [4-byte len][payload].
    starts = np.zeros(n, dtype=np.int64)
    np.cumsum(lens[:-1] + 4, out=starts[1:])
    len_le = lens.astype("<u4").view(np.uint8).reshape(n, 4)
    for i, (st, ln) in enumerate(zip(starts.tolist(), lens.tolist())):
        out[st: st + 4] = len_le[i]
        out[st + 4: st + 4 + ln] = np.frombuffer(values[i], dtype=np.uint8, count=ln)
    return out.tobytes()


def decode_byte_array(buf, n_values: int, pos: int = 0) -> tuple[list[bytes], int]:
    mv = memoryview(buf)
    out: list[bytes] = []
    for _ in range(n_values):
        ln = int.from_bytes(mv[pos: pos + 4], "little")
        pos += 4
        out.append(bytes(mv[pos: pos + ln]))
        pos += ln
    return out, pos


def encode_flba(values: list[bytes], type_length: int) -> bytes:
    for v in values:
        if len(v) != type_length:
            raise ValueError("FLBA value length mismatch")
    return b"".join(values)


def decode_flba(buf, n_values: int, type_length: int, pos: int = 0) -> tuple[list[bytes], int]:
    mv = memoryview(buf)
    out = [bytes(mv[pos + i * type_length: pos + (i + 1) * type_length])
           for i in range(n_values)]
    return out, pos + n_values * type_length
