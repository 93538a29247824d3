"""Logical-type coercions: Arrow/pandas logical values <-> physical columns.

Mirrors the reference's ArrowColumnWriter coercions
(``/root/reference/src/parquet/arrow/writer.cc:572-604``): timestamps are
coerced to the target TIMESTAMP_{MILLIS,MICROS} unit, DATE32 rides as INT32
days, TIME32/64 as INT32/INT64, and decimals become FIXED_LEN_BYTE_ARRAY
big-endian two's-complement at the minimal byte width for their precision
(the reference's ``DecimalSize`` table). INT96 timestamps are handled
elsewhere as ``flba:12`` (chunk.py).

All converters are vectorized numpy; values round-trip bit-exactly.
"""

from __future__ import annotations

import numpy as np

from .kernels import ba


def decimal_byte_width(precision: int) -> int:
    """Minimal FLBA width for a decimal of the given precision — the
    reference's DecimalSize(precision) (arrow/writer.cc)."""
    if not 1 <= precision <= 38:
        raise ValueError(f"decimal precision {precision} out of range")
    # smallest W with 10^precision - 1 <= 2^(8W-1) - 1
    for w in range(1, 17):
        if 10 ** precision - 1 <= (1 << (8 * w - 1)) - 1:
            return w
    return 16


def decimal_to_flba(unscaled: np.ndarray, precision: int) -> tuple[list[bytes], int]:
    """Unscaled int64 decimal values -> big-endian two's-complement FLBA
    bytes of ``decimal_byte_width(precision)`` each (truncated from the
    8-byte big-endian form — sign-correct because the magnitude fits the
    target width by the precision contract)."""
    w = decimal_byte_width(precision)
    arr = np.ascontiguousarray(unscaled, dtype=np.int64)
    if w <= 8:
        be = arr.astype(">i8").view(np.uint8).reshape(len(arr), 8)
        return [bytes(row) for row in be[:, 8 - w:]], w
    # precision > 18: widen with sign bytes
    be = arr.astype(">i8").view(np.uint8).reshape(len(arr), 8)
    pad = np.where(arr[:, None] < 0, 0xFF, 0x00).astype(np.uint8)
    full = np.concatenate([np.repeat(pad, w - 8, axis=1), be], axis=1)
    return [bytes(row) for row in full], w


def flba_to_decimal(values, width: int) -> np.ndarray:
    """Big-endian two's-complement FLBA -> unscaled int64 (vectorized)."""
    view = values if isinstance(values, ba.ByteArrayView) else \
        ba.from_list(list(values))
    n = len(view)
    if n == 0:
        return np.zeros(0, dtype=np.int64)
    mat = view.data.reshape(n, width).astype(np.int64)
    if width > 8:
        # int64 holds only the low 8 bytes: every byte above them must be
        # pure sign extension of bit 63, else the unscaled value (precision
        # 19-38 written by another engine) would silently wrap
        sign = np.where(mat[:, width - 8] >= 128, 0xFF, 0x00)
        if np.any(mat[:, : width - 8] != sign[:, None]):
            raise ValueError(
                "decimal unscaled value exceeds int64; widths > 8 are only "
                "supported when the magnitude fits 8 bytes")
        mat = mat[:, width - 8:]
        width = 8
    # sign-extend from the top byte, then accumulate big-endian
    out = np.where(mat[:, 0] >= 128, mat[:, 0] - 256, mat[:, 0])
    for k in range(1, width):
        out = (out << 8) | mat[:, k]
    return out


_UNIT_NS = {"s": 1_000_000_000, "ms": 1_000_000, "us": 1_000, "ns": 1}


def timestamp_to_int64(values: np.ndarray, unit: str = "us") -> np.ndarray:
    """datetime64[*] -> INT64 at TIMESTAMP_{MILLIS,MICROS} (or s/ns)."""
    if unit not in _UNIT_NS:
        raise ValueError(f"unknown timestamp unit {unit!r}")
    ns = np.ascontiguousarray(values, dtype="datetime64[ns]") \
        .astype(np.int64)
    return ns // _UNIT_NS[unit]


def int64_to_timestamp(values: np.ndarray, unit: str = "us") -> np.ndarray:
    ns = np.ascontiguousarray(values, dtype=np.int64) * _UNIT_NS[unit]
    return ns.astype("datetime64[ns]")


def date32_to_int32(values: np.ndarray) -> np.ndarray:
    """datetime64[D] (or any datetime64) -> INT32 days since epoch."""
    return np.ascontiguousarray(values, dtype="datetime64[D]") \
        .astype(np.int64).astype(np.int32)


def int32_to_date32(values: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(values, dtype=np.int64) \
        .astype("datetime64[D]")


def time_to_int(values: np.ndarray, unit: str = "us") -> np.ndarray:
    """timedelta64 time-of-day -> TIME_MILLIS (int32) / TIME_MICROS
    (int64), per the reference's logical TIME annotations."""
    ns = np.ascontiguousarray(values, dtype="timedelta64[ns]") \
        .astype(np.int64)
    out = ns // _UNIT_NS[unit]
    return out.astype(np.int32) if unit == "ms" else out


def int_to_time(values: np.ndarray, unit: str = "us") -> np.ndarray:
    ns = np.ascontiguousarray(values, dtype=np.int64) * _UNIT_NS[unit]
    return ns.astype("timedelta64[ns]")


def decimal_flba_from_arrow(col) -> tuple[np.ndarray, int, int]:
    """Arrow decimal128 array -> ((n, W) uint8 big-endian two's-complement
    matrix, precision, scale), W = ``decimal_byte_width(precision)``.

    The vectorized sink-side form of the reference's decimal coercion
    (``arrow/writer.cc:572-604``): Arrow stores decimal128 as 16-byte
    little-endian two's-complement; parquet DECIMAL-FLBA wants big-endian
    at minimal width. Byte-reverse the raw buffer and keep the low W
    big-endian bytes — sign-correct because |unscaled| < 10^precision
    fits W bytes by construction; the dropped prefix is verified to be
    pure sign extension (fail-loudly, the ``_coerce_dense`` ethos).
    Null slots (caller masks them) are zero-filled and skip the check.
    """
    import pyarrow as pa

    typ = col.type
    if not pa.types.is_decimal128(typ):
        raise ValueError(f"decimal_flba_from_arrow: {typ} is not decimal128")
    precision, scale = typ.precision, typ.scale
    w = decimal_byte_width(precision)
    n = len(col)
    if col.null_count:
        col = col.fill_null(0)
    buf = col.buffers()[1]
    le = np.frombuffer(buf, dtype=np.uint8, count=16 * n,
                       offset=16 * col.offset).reshape(n, 16)
    be = le[:, ::-1]
    if w < 16 and n:
        sign_fill = np.where(be[:, 16 - w] & 0x80, 0xFF, 0x00) \
            .astype(np.uint8)
        if not (be[:, :16 - w] == sign_fill[:, None]).all():
            raise ValueError(
                f"decimal128({precision},{scale}) value exceeds the "
                f"{w}-byte width implied by its precision")
    return np.ascontiguousarray(be[:, 16 - w:]), precision, scale
