"""Golden-blob decode compatibility (analog of the reference's data/
*.parquet cross-version files, reader-test.cc:41-69): committed blobs from
earlier engine versions must keep decoding to the same values forever.
The expected values are regenerated from the same seed, so this catches
DECODE regressions and accidental format drift independently."""

import os

import numpy as np

from parquet_cpp_spark import chunk as chunkmod

GOLDEN = os.path.join(os.path.dirname(__file__), "golden")
RNG = np.random.default_rng(123)
LENGTHS = RNG.integers(0, 40, 100)
VALS = RNG.integers(0, 30000, int(LENGTHS.sum())).astype(np.int32)


def _blob(name):
    with open(os.path.join(GOLDEN, name), "rb") as f:
        return f.read()


def test_golden_int_blobs_decode():
    for name in ("tokens_dict.blob", "tokens_delta.blob",
                 "tokens_rle_gzip.blob"):
        dec = chunkmod.decode_chunk(_blob(name))
        np.testing.assert_array_equal(np.asarray(dec.values, np.int32),
                                      VALS, err_msg=name)
        np.testing.assert_array_equal(dec.row_lengths, LENGTHS, err_msg=name)


def test_golden_fsst_blob_decodes():
    dec = chunkmod.decode_chunk(_blob("docid_fsst.blob"))
    assert dec.values == [f"corpus/shard{i%9:03d}/doc-{i:08d}".encode()
                          for i in range(300)]


def test_golden_nullable_blob_decodes():
    dec = chunkmod.decode_chunk(_blob("nullable_plain.blob"))
    mask = np.arange(200) % 3 != 0
    np.testing.assert_array_equal(dec.valid_mask, mask)
    np.testing.assert_array_equal(np.asarray(dec.values, np.int32),
                                  np.arange(200, dtype=np.int32)[mask])


def test_golden_nested_list_blob_decodes():
    rng = np.random.default_rng(77)
    outer = rng.integers(0, 4, 300).astype(np.int64)
    inner = rng.integers(0, 5, int(outer.sum())).astype(np.int64)
    vals = rng.integers(0, 1000, int(inner.sum())).astype(np.int32)
    dec = chunkmod.decode_chunk(_blob("nested_delta.blob"))
    np.testing.assert_array_equal(dec.row_lengths, outer)
    np.testing.assert_array_equal(dec.inner_lengths, inner)
    np.testing.assert_array_equal(np.asarray(dec.values, np.int32), vals)


def test_golden_decimal_flba_blob_decodes():
    from parquet_cpp_spark.logical import flba_to_decimal
    dec = chunkmod.decode_chunk(_blob("decimal_flba.blob"))
    want = np.arange(500, dtype=np.int64) * 7919 - 100000
    np.testing.assert_array_equal(flba_to_decimal(dec.values, 6), want)


def test_golden_zstd_paged_blob_decodes():
    # replay the same rng(77) draw sequence the fixture writer used
    rng = np.random.default_rng(77)
    outer = rng.integers(0, 4, 300).astype(np.int64)
    inner = rng.integers(0, 5, int(outer.sum())).astype(np.int64)
    rng.integers(0, 1000, int(inner.sum()))
    want = rng.integers(0, 200, 60000).astype(np.int64)
    dec = chunkmod.decode_chunk(_blob("rle_zstd_paged.blob"))
    np.testing.assert_array_equal(np.asarray(dec.values, np.int64), want)
