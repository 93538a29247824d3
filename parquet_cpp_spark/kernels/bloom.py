"""Block-split Bloom filter (Putze et al.), as in the reference.

Mirrors ``/root/reference/src/parquet/bloom_filter.h:119-240`` and the
parquet-format BloomFilter spec: 32-byte blocks of 8 u32 words, one bit set
per word chosen by SALT multipliers from the low 32 hash bits, block chosen
by the high 32 bits; hash = murmur3_x64_128 (first 64 bits), as in
``/root/reference/src/parquet/murmur3.cc``. Serialization =
[u32 num_bytes][u32 hash_id][u32 algorithm_id][bitset]
(``bloom_filter.h:214-216``, ``bloom_filter.cc``).

Insert/check over int64 key arrays are fully vectorized (numpy uint64
wrapping arithmetic); arbitrary byte keys go through the scalar murmur3.
"""

from __future__ import annotations

import math

import numpy as np

# SALT constants from the parquet-format spec / reference bloom_filter.h:152
SALT = np.array([0x47b6137b, 0x44974d91, 0x8824ad5b, 0xa2b7289d,
                 0x705495c7, 0x2df1424b, 0x9efc4947, 0x5c6bfb31],
                dtype=np.uint32)

_C1 = np.uint64(0x87c37b91114253d5)
_C2 = np.uint64(0x4cf5ad432745937f)
_MASK = (1 << 64) - 1

BYTES_PER_BLOCK = 32
MIN_BYTES = 32
MAX_BYTES = 128 * 1024 * 1024


def _rotl64(x: np.ndarray, r: int) -> np.ndarray:
    return (x << np.uint64(r)) | (x >> np.uint64(64 - r))


def _fmix64(k: np.ndarray) -> np.ndarray:
    k = k ^ (k >> np.uint64(33))
    k = k * np.uint64(0xff51afd7ed558ccd)
    k = k ^ (k >> np.uint64(33))
    k = k * np.uint64(0xc4ceb9fe1a85ec53)
    k = k ^ (k >> np.uint64(33))
    return k


# The reference hashes bloom keys with parquet-mr's generated seed, NOT 0
# (murmur3.h:47-49 DEFAULT_SEED = 1361930890); pinned bit-for-bit against
# /root/reference/data/bloom_filter.bin in the golden cross-compat tests.
BLOOM_SEED = 1361930890


def murmur3_64_int64(keys: np.ndarray, seed: int = BLOOM_SEED) -> np.ndarray:
    """murmur3_x64_128 (first 64 bits) of each int64 key's 8 LE bytes —
    vectorized. Matches the scalar path for len=8 inputs."""
    with np.errstate(over="ignore"):
        k1 = keys.astype(np.uint64)
        k1 = k1 * _C1
        k1 = _rotl64(k1, 31)
        k1 = k1 * _C2
        h1 = np.uint64(seed) ^ k1
        h2 = np.full(len(keys), np.uint64(seed), dtype=np.uint64)
        h1 = h1 ^ np.uint64(8)
        h2 = h2 ^ np.uint64(8)
        h1 = h1 + h2
        h2 = h2 + h1
        h1 = _fmix64(h1)
        h2 = _fmix64(h2)
        h1 = h1 + h2
    return h1


def murmur3_64_bytes(key: bytes, seed: int = BLOOM_SEED) -> int:
    """Scalar murmur3_x64_128 (first 64 bits), any length."""
    h1 = h2 = seed & _MASK
    c1, c2 = 0x87c37b91114253d5, 0x4cf5ad432745937f
    n = len(key)
    nblocks = n // 16
    for b in range(nblocks):
        k1 = int.from_bytes(key[b * 16: b * 16 + 8], "little")
        k2 = int.from_bytes(key[b * 16 + 8: b * 16 + 16], "little")
        k1 = (k1 * c1) & _MASK
        k1 = ((k1 << 31) | (k1 >> 33)) & _MASK
        k1 = (k1 * c2) & _MASK
        h1 ^= k1
        h1 = ((h1 << 27) | (h1 >> 37)) & _MASK
        h1 = (h1 + h2) & _MASK
        h1 = (h1 * 5 + 0x52dce729) & _MASK
        k2 = (k2 * c2) & _MASK
        k2 = ((k2 << 33) | (k2 >> 31)) & _MASK
        k2 = (k2 * c1) & _MASK
        h2 ^= k2
        h2 = ((h2 << 31) | (h2 >> 33)) & _MASK
        h2 = (h2 + h1) & _MASK
        h2 = (h2 * 5 + 0x38495ab5) & _MASK
    tail = key[nblocks * 16:]
    k1 = k2 = 0
    if len(tail) > 8:
        k2 = int.from_bytes(tail[8:], "little")
        k2 = (k2 * c2) & _MASK
        k2 = ((k2 << 33) | (k2 >> 31)) & _MASK
        k2 = (k2 * c1) & _MASK
        h2 ^= k2
    if tail:
        k1 = int.from_bytes(tail[:8], "little")
        k1 = (k1 * c1) & _MASK
        k1 = ((k1 << 31) | (k1 >> 33)) & _MASK
        k1 = (k1 * c2) & _MASK
        h1 ^= k1
    h1 ^= n
    h2 ^= n
    h1 = (h1 + h2) & _MASK
    h2 = (h2 + h1) & _MASK

    def fmix(k):
        k ^= k >> 33
        k = (k * 0xff51afd7ed558ccd) & _MASK
        k ^= k >> 33
        k = (k * 0xc4ceb9fe1a85ec53) & _MASK
        k ^= k >> 33
        return k

    h1 = fmix(h1)
    h2 = fmix(h2)
    h1 = (h1 + h2) & _MASK
    return h1


def optimal_num_bytes(ndv: int, fpp: float = 0.01) -> int:
    """OptimalNumOfBits (``bloom_filter.h:164-178``), rounded up to a power
    of two of whole blocks."""
    bits = -8.0 * ndv / math.log(1.0 - fpp ** (1.0 / 8.0))
    nbytes = int(bits) // 8 + 1
    nbytes = max(MIN_BYTES, min(nbytes, MAX_BYTES))
    return 1 << (nbytes - 1).bit_length()  # next power of two


class BlockSplitBloomFilter:
    def __init__(self, num_bytes: int = 1024):
        if num_bytes & (num_bytes - 1) or num_bytes < MIN_BYTES:
            raise ValueError("num_bytes must be a power of two >= 32")
        self.words = np.zeros(num_bytes // 4, dtype=np.uint32)
        self.num_blocks = num_bytes // BYTES_PER_BLOCK

    def _block_and_masks(self, hashes: np.ndarray):
        with np.errstate(over="ignore"):
            # block index = (hash >> 32) & (num_blocks - 1): the
            # reference's rule (bloom_filter.cc:151-154; num_bytes is
            # always a power of two here). Pinned bit-for-bit against the
            # parquet-mr-written /root/reference/data/bloom_filter.bin.
            block = (hashes >> np.uint64(32)) & \
                np.uint64(self.num_blocks - 1)
            key = hashes.astype(np.uint32)
            mul = key[:, None] * SALT[None, :]
            masks = np.uint32(1) << (mul >> np.uint32(27))
        return block.astype(np.int64), masks

    def insert_hashes(self, hashes: np.ndarray) -> None:
        block, masks = self._block_and_masks(hashes)
        idx = (block[:, None] * 8 + np.arange(8)[None, :]).ravel()
        np.bitwise_or.at(self.words, idx, masks.ravel())

    def check_hashes(self, hashes: np.ndarray) -> np.ndarray:
        block, masks = self._block_and_masks(hashes)
        idx = block[:, None] * 8 + np.arange(8)[None, :]
        return ((self.words[idx] & masks) == masks).all(axis=1)

    def insert_int64(self, keys: np.ndarray) -> None:
        self.insert_hashes(murmur3_64_int64(np.asarray(keys, dtype=np.int64)))

    def check_int64(self, keys: np.ndarray) -> np.ndarray:
        return self.check_hashes(
            murmur3_64_int64(np.asarray(keys, dtype=np.int64)))

    def insert_bytes(self, keys: list[bytes]) -> None:
        self.insert_hashes(np.array([murmur3_64_bytes(k) for k in keys],
                                    dtype=np.uint64))

    def check_bytes(self, keys: list[bytes]) -> np.ndarray:
        return self.check_hashes(np.array([murmur3_64_bytes(k) for k in keys],
                                          dtype=np.uint64))

    # serialization: [u32 num_bytes][u32 hash=0 murmur3][u32 alg=0 block]
    # — the parquet-format bloom header layout, pinned bit-for-bit by the
    # golden test that deserializes the reference's own
    # /root/reference/data/bloom_filter.bin, so the hash/alg ids CANNOT be
    # repurposed as a private version. The round-4 seed/block-index change
    # aligned this implementation TO that reference file; the same
    # no-shipped-blobs rationale as chunk.VERSION applies (no deployment
    # persisted pre-alignment blobs — every fixture/golden was regenerated
    # in the same commit). If hashing semantics ever diverge from the
    # parquet-format spec again AFTER blobs have shipped, wrap the blob in
    # a versioned envelope instead of mutating this header.
    def serialize(self) -> bytes:
        bitset = self.words.tobytes()
        return (len(bitset).to_bytes(4, "little")
                + (0).to_bytes(4, "little") + (0).to_bytes(4, "little")
                + bitset)

    @classmethod
    def deserialize(cls, buf) -> "BlockSplitBloomFilter":
        mv = memoryview(buf)
        num_bytes = int.from_bytes(mv[0:4], "little")
        bf = cls.__new__(cls)
        bf.words = np.frombuffer(mv[12: 12 + num_bytes],
                                 dtype=np.uint32).copy()
        bf.num_blocks = num_bytes // BYTES_PER_BLOCK
        return bf


class StandardBloomFilter(BlockSplitBloomFilter):
    """The FOOTER-linked bloom the parquet-format spec standardized
    (BloomFilterHeader algorithm=BLOCK, hash=XXHASH): same Putze
    split-block bitset and SALT word masks as the reference's filter, but

    - hash = XXH64(seed 0) over the value's PLAIN encoding (4 LE bytes
      for INT32, 8 for INT64, raw bytes for BYTE_ARRAY) — ``kernels/xxh``,
      pinned against Spark's JVM XXH64;
    - block index = fixed-point ``((h >> 32) * num_blocks) >> 32``
      (num_bytes any multiple of 32, not just powers of two).

    The reference's pre-standard murmur3 variant above stays bit-frozen
    for the golden ``bloom_filter.bin``; this class is what the PAR1
    writer embeds and ``parquet_format``/``lookup_rows`` consult."""

    def __init__(self, num_bytes: int = 1024):
        if num_bytes % BYTES_PER_BLOCK or num_bytes < MIN_BYTES:
            raise ValueError("num_bytes must be a multiple of 32, >= 32")
        self.words = np.zeros(num_bytes // 4, dtype=np.uint32)
        self.num_blocks = num_bytes // BYTES_PER_BLOCK

    def _block_and_masks(self, hashes: np.ndarray):
        with np.errstate(over="ignore"):
            block = ((hashes >> np.uint64(32))
                     * np.uint64(self.num_blocks)) >> np.uint64(32)
            key = hashes.astype(np.uint32)
            mul = key[:, None] * SALT[None, :]
            masks = np.uint32(1) << (mul >> np.uint32(27))
        return block.astype(np.int64), masks

    def insert_int64(self, keys: np.ndarray) -> None:
        from . import xxh
        self.insert_hashes(xxh.xxh64_int64(keys))

    def check_int64(self, keys: np.ndarray) -> np.ndarray:
        from . import xxh
        return self.check_hashes(xxh.xxh64_int64(keys))

    def insert_int32(self, keys: np.ndarray) -> None:
        from . import xxh
        self.insert_hashes(xxh.xxh64_int32(keys))

    def check_int32(self, keys: np.ndarray) -> np.ndarray:
        from . import xxh
        return self.check_hashes(xxh.xxh64_int32(keys))

    def insert_bytes(self, keys) -> None:
        from . import xxh
        self.insert_hashes(np.array([xxh.xxh64_bytes(bytes(k))
                                     for k in keys], dtype=np.uint64))

    def check_bytes(self, keys) -> np.ndarray:
        from . import xxh
        return self.check_hashes(np.array([xxh.xxh64_bytes(bytes(k))
                                           for k in keys], dtype=np.uint64))

    def serialize(self) -> bytes:
        raise NotImplementedError(
            "standard blooms serialize as BloomFilterHeader thrift + "
            "bitset in the parquet file (sources/parquet_writer)")
