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

# parquet-mr's default geometry. Wider miniblocks (e.g. 2048/8) would cut
# per-block Python header iterations 16x but cost +58% size on run-structured
# token data (a single jump delta poisons the whole miniblock's width) —
# measured, reverted. Keep 128/4: compression is the north-rule bar.
BLOCK_SIZE = 128
MINIBLOCKS = 4
MINI_SIZE = BLOCK_SIZE // MINIBLOCKS  # 32


# deltas per fused super-block. Must be a BLOCK_SIZE multiple. 2^18 deltas
# x 8 B = 2 MiB per int64 temp — spills L2 but stays L3-resident, and the
# 8x larger per-width pack batches cut numpy call overhead enough for a
# measured 1.45x single-core win with unchanged 1->4-proc scaling (0.92);
# 2^20 regresses both. Output is byte-identical for any multiple of
# BLOCK_SIZE (the format chunks per 128-value block regardless).
_SUPER = 1 << 18
# exact integer bit widths via searchsorted on powers of two (no float log2)
_POW2 = np.uint64(1) << np.arange(64, dtype=np.uint64)


def encode(values: np.ndarray, wrap32: bool = False) -> bytes:
    """``wrap32``: force mod-2^32 delta arithmetic for 4-byte inputs even
    when the value span exceeds 2^31 — the parquet-format convention for
    INT32 columns (miniblock widths must stay <= 32; readers reconstruct
    with wrapping accumulation). Off by default: the engine's own chunk
    blobs use the full int64 delta space for wide spans (golden-pinned),
    and the two byte streams differ only in that case."""
    v = np.ascontiguousarray(values)
    n = len(v)
    out = bytearray()
    out += encode_uvarint(BLOCK_SIZE)
    out += encode_uvarint(MINIBLOCKS)
    out += encode_uvarint(n)
    out += encode_zigzag_varint(int(v[0]) if n else 0)
    if n <= 1:
        return bytes(out)
    nd = n - 1

    # Fused cache-blocked pipeline: diff -> per-block min -> per-miniblock
    # width -> ragged bit-pack, all on _SUPER-sized slices so RAM traffic is
    # ~input + output (the host is memory-bandwidth-bound; full-size
    # intermediates would cap multi-core scaling; batching the pack across
    # supers was measured 40% SLOWER — the concat + large gathers cost more
    # than the per-call overhead they save on this DRAM-throttled host).
    # Each miniblock's payload is exactly 4*w bytes (32*w bits,
    # byte-aligned), so concatenating ragged (miniblock, value, bit)-ordered
    # bit matrices in C-order IS the spec stream.
    # Narrow-temp fast path: when the global value span fits 31 bits, every
    # delta and every (delta - min_delta) fits int32 — the whole
    # diff/min/adjust/width pipeline runs on 4-byte temps instead of 8
    # (half the memory traffic of the hot phase on a DRAM-bound host).
    # Output bytes are IDENTICAL: the same integers flow into the same
    # pack/emit, just from a narrower lane (goldens pin this). The span
    # check is one vectorized min/max pass over the input.
    narrow = False
    if v.dtype in (np.dtype(np.int32), np.dtype(np.uint32),
                   np.dtype(np.int16), np.dtype(np.uint16)):
        narrow = wrap32 or int(v.max()) - int(v.min()) < (1 << 31)
    ddt = np.int32 if narrow else np.int64

    for s in range(0, nd, _SUPER):
        e = min(s + _SUPER, nd)
        # subtract with an explicit out-dtype instead of widening the
        # segment first (diff can overflow the input dtype; ddt is chosen
        # so it can't overflow the DELTA dtype)
        deltas = np.subtract(v[s + 1: e + 1], v[s: e], dtype=ddt)
        ns = e - s
        n_blocks = (ns + BLOCK_SIZE - 1) // BLOCK_SIZE
        if ns % BLOCK_SIZE:
            padded = np.zeros(n_blocks * BLOCK_SIZE, dtype=ddt)
            padded[:ns] = deltas
        else:
            padded = deltas
        blocks = padded.reshape(n_blocks, BLOCK_SIZE)
        mins = np.empty(n_blocks, dtype=ddt)
        if ns % BLOCK_SIZE == 0:
            mins[:] = blocks.min(axis=1)
        else:
            if n_blocks > 1:
                mins[:-1] = blocks[:-1].min(axis=1)
            mins[-1] = deltas[(n_blocks - 1) * BLOCK_SIZE:].min()
        # adj = delta - min_delta >= 0; fits the unsigned view of ddt
        adj = (blocks - mins[:, None]).view(
            np.uint32 if narrow else np.uint64)
        if ns % BLOCK_SIZE:
            adj.reshape(-1)[ns:] = 0  # pad never raises a width

        minis = adj.reshape(n_blocks * MINIBLOCKS, MINI_SIZE)
        mini_max = minis.max(axis=1)
        widths = np.searchsorted(_POW2, mini_max.astype(np.uint64),
                                 side="right").astype(np.uint8)
        n_mini_used = (ns + MINI_SIZE - 1) // MINI_SIZE
        widths[n_mini_used:] = 0

        w_max = int(widths.max())
        if w_max:
            # pack miniblocks grouped by width (few distinct widths per
            # super-block): u64 shift/or accumulation, ~1 byte of traffic
            # per packed bit — no per-bit matrices
            wid64 = widths.astype(np.int64)
            mini_bytes = wid64 * (MINI_SIZE // 8)
            byte_off = np.zeros(len(widths), dtype=np.int64)
            np.cumsum(mini_bytes[:-1], out=byte_off[1:])
            distinct = np.unique(widths)
            distinct = distinct[distinct != 0]
            stream = None
            for w in distinct.tolist():
                ids = np.flatnonzero(widths == w)
                # pack as 8-value rows (8w bits stay byte-aligned, so the
                # bitstream is identical): 4x fewer shift/or passes at 4x
                # the row count — ~2x less numpy call overhead, measured.
                # Widths <= 25 ride the u32 packer lane (half the temp
                # traffic; in narrow mode the gather stays uint32
                # end-to-end, no widening copy at all).
                rvals = minis[ids].reshape(-1, 8)
                if w <= 25:
                    rows = bitpack.pack_rows32(
                        rvals.astype(np.uint32, copy=False),
                        w).reshape(len(ids), 4 * w)
                else:
                    rows = bitpack.pack_rows(
                        rvals.astype(np.uint64, copy=False),
                        w).reshape(len(ids), 4 * w)
                if len(distinct) == 1:
                    # uniform-width super-block (the common case for each
                    # data profile): zero-width minis contribute 0 bytes,
                    # so the width-group rows ARE the stream — a straight
                    # view, no per-byte index scatter at all
                    stream = rows.reshape(-1)
                    break
                if stream is None:
                    stream = np.empty(int(mini_bytes.sum()), dtype=np.uint8)
                # intp indices: numpy upcasts narrower index arrays before
                # the scatter (an int32 "saving" costs an extra pass)
                dst = byte_off[ids][:, None] + \
                    np.arange(rows.shape[1], dtype=np.int64)
                stream[dst.reshape(-1)] = rows.reshape(-1)
        else:
            stream = np.zeros(0, dtype=np.uint8)
        out += _emit_blocks(mins.astype(np.int64, copy=False), widths,
                            stream, n_blocks)
    return bytes(out)


# benchmark A/B toggle for the uniform-layout emit path (always-on in
# production; the flag lets the kernel bench time both paths in ONE
# process, the only honest comparison on a contention-noisy host)
_EMIT_UNIFORM_FAST = True


def _emit_blocks(mins: np.ndarray, widths: np.ndarray, stream: np.ndarray,
                 n_blocks: int) -> bytes:
    """Vectorized interleave of [zigzag-varint min_delta][width bytes]
    [payload slice] per block — one scatter instead of a per-block loop.

    Varints are emitted as fixed 5-slot rows with a validity mask (LEB128
    continuation bits computed vectorized), then compacted together with the
    width bytes and the contiguous payload via a single fancy-indexed
    assignment per stream."""
    # zigzag, vectorized (values fit int64; arithmetic shift keeps sign)
    zz = ((mins.astype(np.int64) << 1) ^ (mins.astype(np.int64) >> 63)) \
        .astype(np.uint64)
    # varint bytes: up to 10 groups of 7 bits for uint64, but min_delta of
    # int32 data fits 5 groups; compute needed length per value
    n_groups = 5
    if len(zz) and int(zz.max()) >> 35:
        n_groups = 10
    shifts = (np.arange(n_groups, dtype=np.uint64) * np.uint64(7))
    groups = (zz[:, None] >> shifts[None, :]) & np.uint64(0x7F)
    nonzero = groups != 0
    nonzero[:, 0] = True  # at least one byte
    vlen = n_groups - np.argmax(nonzero[:, ::-1], axis=1)
    valid = np.arange(n_groups)[None, :] < vlen[:, None]
    cont = valid.copy()
    cont[np.arange(len(zz)), vlen - 1] = False  # last byte: no continuation
    vbytes = (groups | (cont.astype(np.uint64) << np.uint64(7))) \
        .astype(np.uint8)

    mb = len(widths) // n_blocks  # miniblocks per block
    pay_per_block = widths.astype(np.int64).reshape(n_blocks, mb) \
        .sum(axis=1) * (MINI_SIZE // 8)
    # Uniform-layout fast path: when every block has the same varint
    # length AND the same payload size (steady delta streams — the common
    # case inside one data profile), the output is a dense (n_blocks,
    # row_len) matrix: three strided column writes replace the per-byte
    # index scatter below (whose int64 index arrays are 8x the payload
    # traffic). Byte output identical.
    if (_EMIT_UNIFORM_FAST and n_blocks > 1 and len(stream)
            and int(vlen.min()) == int(vlen.max())
            and int(pay_per_block.min()) == int(pay_per_block.max())
            and len(stream) == n_blocks * int(pay_per_block[0])):
        vl = int(vlen[0])
        pp = int(pay_per_block[0])
        outm = np.empty((n_blocks, vl + mb + pp), dtype=np.uint8)
        outm[:, :vl] = vbytes[:, :vl]
        outm[:, vl: vl + mb] = widths.reshape(n_blocks, mb)
        outm[:, vl + mb:] = stream.reshape(n_blocks, pp)
        return outm.tobytes()
    block_len = vlen + mb + pay_per_block
    dest0 = np.zeros(n_blocks, dtype=np.int64)
    np.cumsum(block_len[:-1], out=dest0[1:])
    total = int(block_len.sum())
    outb = np.empty(total, dtype=np.uint8)

    # varint bytes: dest = block start + group index (masked)
    vdest = dest0[:, None] + np.arange(n_groups)[None, :]
    outb[vdest[valid]] = vbytes[valid]
    # width bytes: dest = block start + vlen + [0..mb)
    wdest = (dest0 + vlen)[:, None] + np.arange(mb)[None, :]
    outb[wdest.ravel()] = widths
    # payload: dest = block start + vlen + mb + offset within block payload
    if len(stream):
        pay_start = dest0 + vlen + mb
        shift = np.repeat(pay_start, pay_per_block)
        shift -= np.repeat(np.concatenate(([0], np.cumsum(pay_per_block)[:-1])),
                           pay_per_block)
        outb[np.arange(len(stream), dtype=np.int64) + shift] = stream
    return outb.tobytes()


def decode(buf, pos: int = 0, out_dtype=np.int64) -> tuple[np.ndarray, int]:
    mv = memoryview(buf) if not isinstance(buf, memoryview) else buf
    block_size, pos = decode_uvarint(mv, pos)
    miniblocks, pos = decode_uvarint(mv, pos)
    n, pos = decode_uvarint(mv, pos)
    first, pos = decode_zigzag_varint(mv, pos)
    if block_size % miniblocks:
        raise ValueError("corrupt delta header: block_size % miniblocks != 0")
    mini_size = block_size // miniblocks
    # Narrow-lane reconstruction: for 4-byte outputs every step (unpacked
    # adj + min_delta, prefix sum, + first) is exact MOD 2^32, and the true
    # values fit 32 bits — so int32 temps (half the memory traffic of the
    # value matrix + cumsum) produce bit-identical results even when
    # intermediate sums wrap.
    idt = np.int32 if np.dtype(out_dtype).itemsize == 4 else np.int64
    out = np.empty(n, dtype=idt)
    if n == 0:
        return out.astype(out_dtype, copy=False), pos
    out[0] = np.int64(first).astype(idt) if idt == np.int32 else first
    nd = n - 1
    if nd == 0:
        return out.astype(out_dtype, copy=False), pos

    # Pass 1: parse block headers (one per `block_size` deltas), collecting
    # per-miniblock widths and the contiguous payload segments.
    n_blocks = (nd + block_size - 1) // block_size
    mins_l: list[int] = []
    widths_l: list[int] = []
    segments: list = []
    mini_bytes = mini_size // 8
    pad = b"\x00" * miniblocks
    for b in range(n_blocks):
        # zigzag varint, inlined (3 function calls per block add up over
        # the ~n/128 block headers)
        acc = 0
        sh = 0
        while True:
            byte = mv[pos]
            pos += 1
            acc |= (byte & 0x7F) << sh
            if byte < 0x80:
                break
            sh += 7
        m = (acc >> 1) ^ -(acc & 1)
        mins_l.append(m)
        ws = bytes(mv[pos: pos + miniblocks])
        pos += miniblocks
        rem = nd - b * block_size
        if rem <= block_size:  # final block: zero the unused widths
            n_used = (rem + mini_size - 1) // mini_size
            if n_used < miniblocks:
                ws = ws[:n_used] + pad[: miniblocks - n_used]
        widths_l.extend(ws)
        seg_len = sum(ws) * mini_bytes
        segments.append(mv[pos: pos + seg_len])
        pos += seg_len
    mins = np.asarray(mins_l, dtype=np.int64)
    widths = np.asarray(widths_l, dtype=np.int64)

    # Pass 2: group miniblocks by width — every miniblock of width w is
    # exactly w*mini_size/8 bytes and byte-aligned, so all miniblocks of one
    # width decode with one byte-window gather (value i of mini m sits in
    # the 4-byte LE window at payload[B_m + (i*w)//8] >> (i*w)%8). ~4 bytes
    # of traffic per value — no per-bit matrices (DRAM-bound host).
    nmini = n_blocks * miniblocks
    vals = np.zeros((nmini, mini_size), dtype=idt)
    w_max = int(widths.max()) if nmini else 0
    if w_max:
        payload = np.frombuffer(b"".join(segments), dtype=np.uint8)
        padded = np.concatenate([payload, np.zeros(8, dtype=np.uint8)])
        byte_offsets = np.zeros(nmini, dtype=np.int64)
        np.cumsum(widths[:-1] * (mini_size // 8), out=byte_offsets[1:])
        rel = np.arange(mini_size, dtype=np.int64)
        for w in np.unique(widths):
            if w == 0:
                continue
            w = int(w)
            ids = np.flatnonzero(widths == w)
            if w <= 25:
                rel_bit = rel * w
                bytepos = byte_offsets[ids][:, None] + (rel_bit >> 3)[None, :]
                shift = (rel_bit & 7).astype(np.uint32)
                win = padded[bytepos].astype(np.uint32)
                for k in range(1, (w + 14) // 8):
                    win |= padded[bytepos + k].astype(np.uint32) \
                        << np.uint32(8 * k)
                vals[ids] = (win >> shift[None, :]) & np.uint32((1 << w) - 1)
            else:
                nb = w * (mini_size // 8)
                rows = payload[byte_offsets[ids][:, None]
                               + np.arange(nb)[None, :]]
                bits = np.unpackbits(rows, axis=1, bitorder="little") \
                    .reshape(len(ids) * mini_size, w)
                vals[ids] = bitpack.values_from_bits(bits, w, np.int64) \
                    .reshape(len(ids), mini_size).astype(idt)

    deltas = vals.reshape(n_blocks, block_size)
    # mins cast to the narrow lane first: the in-place add then wraps mod
    # 2^32 exactly like the final values do
    np.add(deltas, mins.astype(idt)[:, None], out=deltas)
    deltas = deltas.reshape(-1)[:nd]
    np.cumsum(deltas, out=deltas)
    out[1:] = out[0] + deltas
    return out.astype(out_dtype, copy=False), pos
