"""String/byte-array codecs: DELTA_LENGTH_BYTE_ARRAY and DELTA_BYTE_ARRAY.

DELTA_LENGTH_BYTE_ARRAY (reference decoder
``/root/reference/src/parquet/encoding-internal.h:883-920``, encoder semantics
``/root/reference/benchmarks/decode_benchmark.cc:116-152``):
    [i32 LE total-lengths-blob-len][DELTA_BINARY_PACKED(lengths)][payload]

DELTA_BYTE_ARRAY — incremental (shared-prefix) string coding (reference
decoder ``encoding-internal.h:925-975``, encoder
``decode_benchmark.cc:154-197``): prefix lengths (vs the previous value) are
DELTA_BINARY_PACKED; suffixes are a DELTA_LENGTH_BYTE_ARRAY stream;
``value[i] = value[i-1][:prefix_len[i]] + suffix[i]``.
"""

from __future__ import annotations

import numpy as np

from . import delta


def encode_delta_length(values: list[bytes]) -> bytes:
    lens = np.fromiter((len(v) for v in values), dtype=np.int64,
                       count=len(values))
    lens_blob = delta.encode(lens)
    payload = b"".join(values)
    return len(lens_blob).to_bytes(4, "little") + lens_blob + payload


def decode_delta_length(buf, pos: int = 0) -> tuple[list[bytes], int]:
    mv = memoryview(buf) if not isinstance(buf, memoryview) else buf
    lens_blob_len = int.from_bytes(mv[pos: pos + 4], "little")
    pos += 4
    lens, _ = delta.decode(mv[pos: pos + lens_blob_len])
    pos += lens_blob_len
    out: list[bytes] = []
    for ln in lens.tolist():
        out.append(bytes(mv[pos: pos + ln]))
        pos += ln
    return out, pos


def _common_prefix_len(a: bytes, b: bytes) -> int:
    m = min(len(a), len(b))
    i = 0
    while i < m and a[i] == b[i]:
        i += 1
    return i


def encode_delta_byte_array(values: list[bytes]) -> bytes:
    n = len(values)
    prefix_lens = np.zeros(n, dtype=np.int64)
    suffixes: list[bytes] = []
    prev = b""
    for i, v in enumerate(values):
        p = _common_prefix_len(prev, v) if i else 0
        prefix_lens[i] = p
        suffixes.append(v[p:])
        prev = v
    prefix_blob = delta.encode(prefix_lens) if n else delta.encode(np.zeros(0, dtype=np.int64))
    suffix_blob = encode_delta_length(suffixes)
    return len(prefix_blob).to_bytes(4, "little") + prefix_blob + suffix_blob


def decode_delta_byte_array(buf, pos: int = 0) -> tuple[list[bytes], int]:
    mv = memoryview(buf) if not isinstance(buf, memoryview) else buf
    prefix_blob_len = int.from_bytes(mv[pos: pos + 4], "little")
    pos += 4
    prefix_lens, _ = delta.decode(mv[pos: pos + prefix_blob_len])
    pos += prefix_blob_len
    suffixes, pos = decode_delta_length(mv, pos)
    out: list[bytes] = []
    prev = b""
    for p, suf in zip(prefix_lens.tolist(), suffixes):
        v = prev[:p] + suf
        out.append(v)
        prev = v
    return out, pos
