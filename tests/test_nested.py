"""General schema-tree shapes beyond one REQUIRED repeated leaf: nullable
list elements (max_def=2) and list-of-list (max_rep=2), mirroring the
reference's 3-level list encoding (schema.h:43-77) and Arrow nested-list
round-trips (arrow/arrow-reader-writer-test.cc:1137-1928)."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from parquet_cpp_spark import chunk as chunkmod
from parquet_cpp_spark import levels as L

RNG = np.random.default_rng(13)


def test_nullable_levels_roundtrip():
    lengths = RNG.integers(0, 6, 3000).astype(np.int64)
    valid = RNG.random(int(lengths.sum())) > 0.3
    rep, d = L.levels_from_lengths_nullable(lengths, valid)
    l2, v2 = L.nullable_from_levels(rep, d)
    np.testing.assert_array_equal(l2, lengths)
    np.testing.assert_array_equal(v2, valid)


def test_nested_levels_roundtrip():
    outer = RNG.integers(0, 4, 2000).astype(np.int64)
    inner = RNG.integers(0, 5, int(outer.sum())).astype(np.int64)
    rep, d = L.levels_from_nested_lengths(outer, inner)
    o2, i2 = L.nested_from_levels(rep, d)
    np.testing.assert_array_equal(o2, outer)
    np.testing.assert_array_equal(i2, inner)


@pytest.mark.parametrize("outer,inner", [
    ([0, 0], []), ([1], [0]), ([2], [0, 0]), ([3], [2, 0, 1]), ([], []),
    ([0, 2, 0], [3, 0]),
])
def test_nested_levels_edges(outer, inner):
    o = np.array(outer, np.int64)
    i = np.array(inner, np.int64)
    rep, d = L.levels_from_nested_lengths(o, i)
    o2, i2 = L.nested_from_levels(rep, d)
    np.testing.assert_array_equal(o2, o)
    np.testing.assert_array_equal(i2, i)


@pytest.mark.parametrize("codec", [chunkmod.PLAIN,
                                   chunkmod.DELTA_BINARY_PACKED,
                                   chunkmod.RLE_DICTIONARY])
def test_chunk_nullable_list_elements(codec):
    """array<int32?>: dense values + per-slot validity round-trip."""
    lengths = RNG.integers(0, 8, 4000).astype(np.int64)
    n_slots = int(lengths.sum())
    valid = RNG.random(n_slots) > 0.25
    dense = RNG.integers(0, 500, int(valid.sum())).astype(np.int32)
    enc = chunkmod.encode_chunk(dense, "int32", codec,
                                row_lengths=lengths, elem_valid=valid)
    assert enc.stats.null_count == int((~valid).sum())
    dec = chunkmod.decode_chunk(enc.blob)
    np.testing.assert_array_equal(np.asarray(dec.values, np.int32), dense)
    np.testing.assert_array_equal(dec.row_lengths, lengths)
    np.testing.assert_array_equal(dec.valid_mask, valid)


def test_chunk_list_of_list():
    """array<array<int32>> round-trip, including empty inner/outer lists."""
    outer = RNG.integers(0, 4, 3000).astype(np.int64)
    inner = RNG.integers(0, 6, int(outer.sum())).astype(np.int64)
    flat = RNG.integers(0, 1 << 15, int(inner.sum())).astype(np.int32)
    enc = chunkmod.encode_chunk(flat, "int32",
                                chunkmod.DELTA_BINARY_PACKED,
                                row_lengths=outer, inner_lengths=inner)
    dec = chunkmod.decode_chunk(enc.blob)
    np.testing.assert_array_equal(np.asarray(dec.values, np.int32), flat)
    np.testing.assert_array_equal(dec.row_lengths, outer)
    np.testing.assert_array_equal(dec.inner_lengths, inner)


def test_chunk_nullable_byte_array_elements():
    """array<string?> elements through the byte_array kernels."""
    lengths = RNG.integers(0, 5, 1000).astype(np.int64)
    n_slots = int(lengths.sum())
    valid = RNG.random(n_slots) > 0.4
    dense = [f"w{i}".encode() for i in range(int(valid.sum()))]
    enc = chunkmod.encode_chunk(dense, "byte_array", chunkmod.PLAIN,
                                row_lengths=lengths, elem_valid=valid)
    dec = chunkmod.decode_chunk(enc.blob)
    assert dec.values == dense
    np.testing.assert_array_equal(dec.row_lengths, lengths)
    np.testing.assert_array_equal(dec.valid_mask, valid)
