"""FSST — Fast Static Symbol Table string compression.

Not present in the reference (parquet-cpp slots DELTA_BYTE_ARRAY in this
niche); required by the north star. Implemented from the public spec:
P. Boncz, T. Neumann, V. Leis, "FSST: Fast Random Access String Compression",
PVLDB 13(11), 2020 — a static table of up to 255 symbols of 1..8 bytes, one
escape code (255) followed by a raw byte, greedy longest-match encoding, and
a table trained by iterative gain counting over a sample.

Determinism: training samples the first ``SAMPLE_BYTES`` of the concatenated
input (no RNG), candidate selection tie-breaks on (gain desc, symbol bytes
asc), so the same chunk always produces the same table on every executor —
required for reproducible encode across retries (SURVEY §7 hard part (c)).

Blob layout (self-contained):
    [u8 n_symbols][n_symbols x (u8 len + bytes)]
    [u32 n_strings]
    [u32 lens_blob_len][DELTA_BINARY_PACKED(encoded byte length per string)]
    [encoded payload]
"""

from __future__ import annotations

import numpy as np

from . import delta

ESCAPE = 255
MAX_SYMBOLS = 255
MAX_SYMBOL_LEN = 8
SAMPLE_BYTES = 1 << 14  # 16 KiB training sample
TRAIN_ITERATIONS = 5


def train(values: list[bytes]) -> list[bytes]:
    """Build a deterministic symbol table from a sample of the input."""
    sample: list[bytes] = []
    budget = SAMPLE_BYTES
    for v in values:
        if budget <= 0:
            break
        sample.append(v[: min(len(v), budget)])
        budget -= len(v)
    symbols: list[bytes] = []
    for _ in range(TRAIN_ITERATIONS):
        tables = _build_tables(symbols)
        sym_count: dict[bytes, int] = {}
        pair_count: dict[bytes, int] = {}
        for s in sample:
            prev: bytes | None = None
            i, ln = 0, len(s)
            while i < ln:
                m = _longest_match(s, i, ln, tables)
                cur = s[i: i + m] if m else s[i: i + 1]
                sym_count[cur] = sym_count.get(cur, 0) + 1
                if prev is not None:
                    cat = prev + cur
                    if len(cat) <= MAX_SYMBOL_LEN:
                        pair_count[cat] = pair_count.get(cat, 0) + 1
                prev = cur
                i += m if m else 1
        gains: dict[bytes, int] = {}
        for sym, cnt in sym_count.items():
            gains[sym] = max(gains.get(sym, 0), cnt * len(sym))
        for sym, cnt in pair_count.items():
            gains[sym] = max(gains.get(sym, 0), cnt * len(sym))
        ranked = sorted(gains.items(), key=lambda kv: (-kv[1], kv[0]))
        symbols = [sym for sym, _ in ranked[:MAX_SYMBOLS]]
    return symbols


def _build_tables(symbols: list[bytes]):
    """length -> {symbol bytes: code}, lengths tried longest-first. Greedy
    longest-match then costs at most len(lengths) (<= 8) dict probes per
    position instead of a scan over all same-first-byte candidates."""
    tables: dict[int, dict[bytes, int]] = {}
    for code, sym in enumerate(symbols):
        tables.setdefault(len(sym), {})[sym] = code
    lengths = sorted(tables, reverse=True)
    return [(L, tables[L]) for L in lengths]


def _longest_match(s: bytes, i: int, ln: int, tables) -> int:
    for L, tab in tables:
        if s[i: i + L] in tab:
            return L
    return 0


def encode(values: list[bytes]) -> bytes:
    symbols = train(values)
    tables = _build_tables(symbols)
    out_parts: list[bytes] = []
    enc_lens = np.empty(len(values), dtype=np.int64)
    for vi, s in enumerate(values):
        buf = bytearray()
        append = buf.append
        i, ln = 0, len(s)
        while i < ln:
            for L, tab in tables:
                code = tab.get(s[i: i + L])
                if code is not None:
                    append(code)
                    i += L
                    break
            else:
                append(ESCAPE)
                append(s[i])
                i += 1
        out_parts.append(bytes(buf))
        enc_lens[vi] = len(buf)

    table = bytearray([len(symbols)])
    for sym in symbols:
        table.append(len(sym))
        table += sym
    lens_blob = delta.encode(enc_lens)
    return (bytes(table)
            + len(values).to_bytes(4, "little")
            + len(lens_blob).to_bytes(4, "little") + lens_blob
            + b"".join(out_parts))


def decode(buf, pos: int = 0) -> tuple[list[bytes], int]:
    mv = memoryview(buf) if not isinstance(buf, memoryview) else buf
    n_symbols = mv[pos]
    pos += 1
    symbols: list[bytes] = []
    for _ in range(n_symbols):
        sl = mv[pos]
        pos += 1
        symbols.append(bytes(mv[pos: pos + sl]))
        pos += sl
    n_strings = int.from_bytes(mv[pos: pos + 4], "little")
    pos += 4
    lens_blob_len = int.from_bytes(mv[pos: pos + 4], "little")
    pos += 4
    enc_lens, _ = delta.decode(mv[pos: pos + lens_blob_len])
    pos += lens_blob_len

    out: list[bytes] = []
    for ln in enc_lens.tolist():
        chunk = mv[pos: pos + ln]
        pos += ln
        parts: list[bytes] = []
        i = 0
        while i < ln:
            c = chunk[i]
            if c == ESCAPE:
                parts.append(bytes(chunk[i + 1: i + 2]))
                i += 2
            else:
                parts.append(symbols[c])
                i += 1
        out.append(b"".join(parts))
    return out, pos
