"""Corrupt-input robustness matrix, mirroring the reference's deserialize
battery (/root/reference/src/parquet/file-deserialize-test.cc:124-296):
truncated headers and bodies, bad magic/version, inflated counts, corrupt
compressed blocks, and bit flips must all raise — never return wrong data
silently. Decodes that happen to survive a mutation must still round-trip
the original values exactly (a mutation may hit padding)."""

import zlib

import numpy as np
import pytest

from parquet_cpp_spark import chunk as chunkmod
from parquet_cpp_spark.kernels import ba

RNG = np.random.default_rng(99)


def _flavors():
    vals = RNG.integers(0, 5000, 4000).astype(np.int64)
    strs = ba.from_list([f"string-{i % 97}".encode() for i in range(3000)])
    lengths = RNG.integers(0, 7, 900).astype(np.int64)
    lvals = RNG.integers(0, 100, int(lengths.sum())).astype(np.int32)
    out = {
        "plain_int": chunkmod.encode_chunk(vals, "int64", chunkmod.PLAIN,
                                           page_size=None),
        "dict_int": chunkmod.encode_chunk(vals, "int64",
                                          chunkmod.RLE_DICTIONARY,
                                          page_size=None),
        "delta_int": chunkmod.encode_chunk(vals, "int64",
                                           chunkmod.DELTA_BINARY_PACKED,
                                           page_size=None),
        "plain_str": chunkmod.encode_chunk(strs, "byte_array",
                                           chunkmod.PLAIN, page_size=None),
        "fsst_str": chunkmod.encode_chunk(strs, "byte_array",
                                          chunkmod.FSST, page_size=None),
        "gzip_int": chunkmod.encode_chunk(vals, "int64", chunkmod.PLAIN,
                                          compression=chunkmod.GZIP,
                                          page_size=None),
        "list_rle": chunkmod.encode_chunk(lvals, "int32", chunkmod.RLE,
                                          row_lengths=lengths,
                                          page_size=None),
        "paged_int": chunkmod.encode_chunk(vals, "int64", chunkmod.PLAIN,
                                           page_size=4096),
        "paged_dict": chunkmod.encode_chunk(vals, "int64",
                                            chunkmod.RLE_DICTIONARY,
                                            page_size=4096),
    }
    return out


FLAVORS = _flavors()

EXPECT_ERRORS = (ValueError, IndexError, OverflowError, KeyError,
                 zlib.error, struct_err := __import__("struct").error,
                 EOFError)


@pytest.mark.parametrize("flavor", sorted(FLAVORS))
def test_empty_and_magic_and_version(flavor):
    blob = FLAVORS[flavor].blob
    with pytest.raises(EXPECT_ERRORS):
        chunkmod.decode_chunk(b"")
    bad_magic = b"XXXX" + blob[4:]
    with pytest.raises(EXPECT_ERRORS):
        chunkmod.decode_chunk(bad_magic)
    bad_version = blob[:4] + bytes([250]) + blob[5:]
    with pytest.raises(EXPECT_ERRORS):
        chunkmod.decode_chunk(bad_version)


@pytest.mark.parametrize("flavor", sorted(FLAVORS))
@pytest.mark.parametrize("frac", [0.1, 0.3, 0.6, 0.9, 0.99])
def test_truncation_raises(flavor, frac):
    """A prefix of a valid blob must raise, never decode short data."""
    enc = FLAVORS[flavor]
    cut = max(1, int(len(enc.blob) * frac))
    truncated = enc.blob[:cut]
    with pytest.raises(EXPECT_ERRORS):
        dec = chunkmod.decode_chunk(truncated)
        # reaching here with fewer values than declared is silent data loss
        if dec.n_values != enc.n_values or len(dec.values) != enc.n_values:
            raise ValueError("silent short decode")


@pytest.mark.parametrize("flavor", sorted(FLAVORS))
def test_inflated_counts_raise(flavor):
    """Header n_rows/n_values inflated 4x must not fabricate values."""
    enc = FLAVORS[flavor]
    blob = bytearray(enc.blob)
    version = blob[4]
    # n_rows/n_values live at 9..17 for v2/v3 headers
    if version == 1:
        pos = 8
    else:
        pos = 9
    n_rows = int.from_bytes(blob[pos:pos + 4], "little")
    n_vals = int.from_bytes(blob[pos + 4:pos + 8], "little")
    blob[pos:pos + 4] = (n_rows * 4).to_bytes(4, "little")
    blob[pos + 4:pos + 8] = (n_vals * 4).to_bytes(4, "little")
    with pytest.raises(EXPECT_ERRORS):
        dec = chunkmod.decode_chunk(bytes(blob))
        if len(dec.values) != n_vals * 4:
            raise ValueError("silent short decode vs inflated header")


@pytest.mark.parametrize("flavor", ["gzip_int"])
def test_corrupt_compressed_block(flavor):
    enc = FLAVORS[flavor]
    blob = bytearray(enc.blob)
    # flip bytes inside the compressed body (after the 21-byte header)
    for off in range(30, min(60, len(blob))):
        blob[off] ^= 0xFF
    with pytest.raises(EXPECT_ERRORS):
        chunkmod.decode_chunk(bytes(blob))


def _token_chunk_table():
    """Chunk rows (full schema incl. checksum) for one token partition,
    built Spark-free via the Arrow encode operator."""
    import pyarrow as pa

    from parquet_cpp_spark.operators.encode_arrow import make_arrow_encode_fn
    rng = np.random.default_rng(5)
    n = 400
    tbl = pa.table({
        "doc_id": [f"d{i}" for i in range(n)],
        "tokens": [rng.integers(0, 32768,
                                int(rng.integers(1, 40))).astype(np.int32)
                   .tolist() for i in range(n)],
        "n_tok": np.ones(n, dtype=np.int32),
        "source": ["s"] * n,
    })
    fn = make_arrow_encode_fn()
    return pa.Table.from_batches([fn.encode_part(tbl, 0)])


def test_bitflips_detected_by_checksum_layer():
    """A bit flip ANYWHERE in a blob (including inside value payloads,
    where the format itself — like the reference's pages — has no CRC) must
    raise through the checksum-verifying decode, never emit wrong rows."""
    import pyarrow as pa

    from parquet_cpp_spark.operators.decode_arrow import _decode_table
    chunk_tbl = _token_chunk_table()
    # clean table decodes fine under verification
    out = list(_decode_table(chunk_tbl, verify_checksums=True))
    assert sum(b.num_rows for b in out) == 400

    blob_idx = chunk_tbl.column_names.index("blob")
    rng = np.random.default_rng(17)
    for row in range(chunk_tbl.num_rows):
        raw = bytearray(chunk_tbl.column("blob")[row].as_py())
        for _ in range(4):
            blob = bytearray(raw)
            off = int(rng.integers(0, len(blob)))
            blob[off] ^= 1 << int(rng.integers(0, 8))
            blobs = chunk_tbl.column("blob").to_pylist()
            blobs[row] = bytes(blob)
            mutated = chunk_tbl.set_column(
                blob_idx, "blob", pa.array(blobs, type=pa.binary()))
            with pytest.raises(ValueError, match="corrupt chunk"):
                list(_decode_table(mutated, verify_checksums=True))


def test_verify_checksums_requires_column():
    from parquet_cpp_spark.operators.decode_arrow import _decode_table
    chunk_tbl = _token_chunk_table().drop_columns(["checksum"])
    with pytest.raises(ValueError, match="no checksum column"):
        list(_decode_table(chunk_tbl, verify_checksums=True))
