"""XXH64 — the hash of the standardized parquet-format Bloom filter.

The reference repo's bloom (``/root/reference/src/parquet/bloom_filter.h``)
predates the parquet-format standardization and hashes with murmur3
(``kernels/bloom.py`` keeps that variant bit-compatible for the golden
``bloom_filter.bin``). The FOOTER-linked bloom the format later adopted —
BloomFilterHeader{algorithm=BLOCK, hash=XXHASH, compression=UNCOMPRESSED}
— mandates XXH64 with seed 0 over the value's PLAIN byte encoding. This
module implements XXH64 from the public xxHash specification:

- a fully vectorized numpy path for arrays of fixed 4/8-byte keys (the
  int32/int64 column case — one u64 lane per key, no per-row Python);
- a scalar any-length path for byte_array keys.

Pinned against Spark's JVM ``xxhash64`` (Catalyst's XxHash64 is XXH64
seed 42 over the column's 8-byte representation) in
``tests/test_bloom.py`` — an independent implementation on a second
runtime.
"""

from __future__ import annotations

import numpy as np

_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5
_M = (1 << 64) - 1

_U = np.uint64


def _rotl(x, r: int):
    return (x << _U(r)) | (x >> _U(64 - r))


def xxh64_u64(keys: np.ndarray, seed: int = 0) -> np.ndarray:
    """Vectorized XXH64 of each uint64 key's 8 little-endian bytes."""
    with np.errstate(over="ignore"):
        k = np.asarray(keys).astype(np.uint64, copy=False)
        h = _U((seed + _P5 + 8) & _M)
        k1 = _rotl(k * _U(_P2), 31) * _U(_P1)
        h = h ^ k1
        h = _rotl(h, 27) * _U(_P1) + _U(_P4)
        h ^= h >> _U(33)
        h *= _U(_P2)
        h ^= h >> _U(29)
        h *= _U(_P3)
        h ^= h >> _U(32)
        return h


def xxh64_int64(keys: np.ndarray, seed: int = 0) -> np.ndarray:
    return xxh64_u64(np.asarray(keys, dtype=np.int64).view(np.uint64), seed)


def xxh64_int32(keys: np.ndarray, seed: int = 0) -> np.ndarray:
    """XXH64 of each int32 key's 4 LE bytes (the parquet bloom hashes the
    PLAIN encoding, which is 4 bytes for INT32 — NOT widened to 8)."""
    with np.errstate(over="ignore"):
        k = np.asarray(keys, dtype=np.int32).view(np.uint32).astype(np.uint64)
        h = _U((seed + _P5 + 4) & _M)
        h = h ^ (k * _U(_P1))
        h = _rotl(h, 23) * _U(_P2) + _U(_P3)
        h ^= h >> _U(33)
        h *= _U(_P2)
        h ^= h >> _U(29)
        h *= _U(_P3)
        h ^= h >> _U(32)
        return h


def xxh64_bytes(data: bytes, seed: int = 0) -> int:
    """Scalar any-length XXH64 (byte_array bloom keys)."""
    n = len(data)
    pos = 0
    if n >= 32:
        v1 = (seed + _P1 + _P2) & _M
        v2 = (seed + _P2) & _M
        v3 = seed & _M
        v4 = (seed - _P1) & _M

        def rnd(acc, lane):
            acc = (acc + lane * _P2) & _M
            acc = ((acc << 31) | (acc >> 33)) & _M
            return (acc * _P1) & _M

        while pos + 32 <= n:
            v1 = rnd(v1, int.from_bytes(data[pos:pos + 8], "little"))
            v2 = rnd(v2, int.from_bytes(data[pos + 8:pos + 16], "little"))
            v3 = rnd(v3, int.from_bytes(data[pos + 16:pos + 24], "little"))
            v4 = rnd(v4, int.from_bytes(data[pos + 24:pos + 32], "little"))
            pos += 32
        h = (((v1 << 1) | (v1 >> 63)) + ((v2 << 7) | (v2 >> 57))
             + ((v3 << 12) | (v3 >> 52))
             + ((v4 << 18) | (v4 >> 46))) & _M

        def merge(acc, v):
            acc ^= rnd(0, v)
            return (acc * _P1 + _P4) & _M

        h = merge(h, v1)
        h = merge(h, v2)
        h = merge(h, v3)
        h = merge(h, v4)
    else:
        h = (seed + _P5) & _M
    h = (h + n) & _M
    while pos + 8 <= n:
        k1 = int.from_bytes(data[pos:pos + 8], "little")
        k1 = (k1 * _P2) & _M
        k1 = ((k1 << 31) | (k1 >> 33)) & _M
        h ^= (k1 * _P1) & _M
        h = ((h << 27) | (h >> 37)) & _M
        h = (h * _P1 + _P4) & _M
        pos += 8
    if pos + 4 <= n:
        h ^= (int.from_bytes(data[pos:pos + 4], "little") * _P1) & _M
        h = ((h << 23) | (h >> 41)) & _M
        h = (h * _P2 + _P3) & _M
        pos += 4
    while pos < n:
        h ^= (data[pos] * _P5) & _M
        h = ((h << 11) | (h >> 53)) & _M
        h = (h * _P1) & _M
        pos += 1
    h ^= h >> 33
    h = (h * _P2) & _M
    h ^= h >> 29
    h = (h * _P3) & _M
    h ^= h >> 32
    return h
