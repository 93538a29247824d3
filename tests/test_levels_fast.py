"""Round-8 optimization internals: the run-level level decode
(levels.lengths_from_bit1_streams / rle.bit1_zero_positions) must be
value-identical to the materialize-then-reduce path it replaced, and the
python-task slice planner must keep its floor/cap contract."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from parquet_cpp_spark import levels as levels_mod  # noqa: E402
from parquet_cpp_spark.kernels import rle  # noqa: E402


def _stream(lengths):
    rep, deflev = levels_mod.levels_from_lengths(lengths)
    s = (len(rep).to_bytes(4, "little")
         + rle.encode_length_prefixed(rep, 1)
         + rle.encode_length_prefixed(deflev, 1))
    return s, len(rep), rep, deflev


@pytest.mark.parametrize("kind", range(6))
def test_lengths_from_bit1_streams_matches_levels(kind):
    rng = np.random.default_rng(kind)
    n = int(rng.integers(1, 3000))
    if kind == 0:
        lengths = rng.integers(0, 20, n)
    elif kind == 1:
        lengths = rng.integers(1, 600, n)
    elif kind == 2:
        lengths = np.zeros(n, dtype=np.int64)        # all empty lists
    elif kind == 3:
        lengths = np.full(n, 1)                      # all rep==0 positions
    elif kind == 4:
        lengths = rng.integers(0, 60, n)
        lengths[rng.random(n) < 0.3] = 0             # empty-heavy
    else:
        lengths = np.concatenate([[25000], rng.integers(0, 5, n - 1)])
    lengths = lengths.astype(np.int64)
    s, n_slots, rep, deflev = _stream(lengths)
    got, pos = levels_mod.lengths_from_bit1_streams(memoryview(s), n_slots, 4)
    want = levels_mod.lengths_from_levels(rep, deflev)
    assert np.array_equal(got, want)
    assert np.array_equal(got, lengths)
    assert pos == len(s)


def test_bit1_zero_positions_wide_header_falls_back():
    """A >4-byte LEB128 run header (>= 2^27 values in one run) takes the
    scalar-parser fallback and still returns correct positions."""
    # header bytes 80 80 80 80 02 = varint 2^28 -> RLE run, cnt = 2^27,
    # value byte 0x00; n_values caps the take at 100
    stream = bytes([0x80, 0x80, 0x80, 0x80, 0x02, 0x00])
    zeros = rle.bit1_zero_positions(stream, 100, 0, len(stream))
    assert np.array_equal(zeros, np.arange(100))


def test_bit1_zero_positions_rejects_zero_length_run():
    # header 0x00 = RLE run with cnt 0: corrupt
    stream = bytes([0x00, 0x01])
    with pytest.raises(ValueError, match="zero-length"):
        rle.bit1_zero_positions(stream, 8, 0, len(stream))


def test_plan_slices_contract():
    from parquet_cpp_spark.sources.parquet_direct import (
        MIN_UNITS_PER_SLICE, plan_slices)
    # floor: never below two waves per core when units allow
    assert plan_slices(180, 32, 4) == 64
    # cap: slices_per_core bounds slice count at real scale
    assert plan_slices(1800, 32, 4) == 128
    assert plan_slices(5000, 32, 4) == 128
    # fewer units than the floor: one unit per slice
    assert plan_slices(20, 32, 4) == 20
    assert plan_slices(1, 32, 4) == 1
    # single core keeps the historical slicing (4 slices)
    assert plan_slices(180, 1, 4) == 4
    # amortization only adds slices when each still carries >= MIN units
    n = plan_slices(300, 32, 4)
    assert n == max(64, 300 // MIN_UNITS_PER_SLICE)
