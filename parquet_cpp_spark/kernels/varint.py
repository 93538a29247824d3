"""ULEB128 varints + zigzag, as used by the parquet RLE-hybrid headers and
DELTA_BINARY_PACKED headers (see the reference's decoder,
``/root/reference/src/parquet/encoding-internal.h:812-834``)."""

from __future__ import annotations


_SINGLE = [bytes([i]) for i in range(128)]


def encode_uvarint(value: int) -> bytes:
    if 0 <= value < 128:
        return _SINGLE[value]
    if value < 0:
        raise ValueError("uvarint requires non-negative value")
    out = bytearray()
    while True:
        b = value & 0x7F
        value >>= 7
        if value:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def decode_uvarint(buf, pos: int = 0) -> tuple[int, int]:
    """Returns (value, new_pos)."""
    result = 0
    shift = 0
    while True:
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not (b & 0x80):
            return result, pos
        shift += 7
        if shift > 70:
            raise ValueError("uvarint too long / corrupt")


def zigzag_encode(value: int) -> int:
    return (value << 1) ^ (value >> 63) if value < 0 else value << 1


def zigzag_decode(value: int) -> int:
    return (value >> 1) ^ -(value & 1)


def encode_zigzag_varint(value: int) -> bytes:
    return encode_uvarint(zigzag_encode(value))


def decode_zigzag_varint(buf, pos: int = 0) -> tuple[int, int]:
    v, pos = decode_uvarint(buf, pos)
    return zigzag_decode(v), pos


def encode_uvarint_array(values):
    """Vectorized ULEB128 over an int64 array: returns
    (byte matrix (n, G) uint8, validity mask (n, G) bool, lengths (n)).
    Row i's first lengths[i] bytes are value i's varint."""
    import numpy as np

    vals = np.ascontiguousarray(values, dtype=np.uint64)
    n = len(vals)
    n_groups = 5
    if n and int(vals.max()) >> 35:
        n_groups = 10
    shifts = np.arange(n_groups, dtype=np.uint64) * np.uint64(7)
    groups = (vals[:, None] >> shifts[None, :]) & np.uint64(0x7F)
    nonzero = groups != 0
    nonzero[:, 0] = True  # at least one byte
    lens = n_groups - np.argmax(nonzero[:, ::-1], axis=1)
    valid = np.arange(n_groups)[None, :] < lens[:, None]
    cont = valid.copy()
    cont[np.arange(n), lens - 1] = False  # last byte: continuation clear
    bytes_ = (groups | (cont.astype(np.uint64) << np.uint64(7))) \
        .astype(np.uint8)
    return bytes_, valid, lens.astype(np.int64)
