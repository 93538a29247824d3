"""Chunk framing + selector tests: round-trips through the self-describing
blob for every codec, level reconstruction (np.split analog of
RecordReader::DelimitRecords), fallback encoding-list oracle
(/root/reference/src/parquet/column_writer-test.cc:495-505), stats oracle,
and the selector's 'selected <= PLAIN' property."""

import numpy as np
import pytest

from parquet_cpp_spark import chunk as chunkmod
from parquet_cpp_spark import selector
from parquet_cpp_spark.levels import lengths_from_levels, levels_from_lengths

RNG = np.random.default_rng(42)


@pytest.mark.parametrize("codec", [chunkmod.PLAIN, chunkmod.RLE,
                                   chunkmod.DELTA_BINARY_PACKED,
                                   chunkmod.RLE_DICTIONARY])
def test_chunk_roundtrip_int32_flat(codec):
    vals = RNG.integers(0, 1000, 5000).astype(np.int32)
    enc = chunkmod.encode_chunk(vals, "int32", codec)
    dec = chunkmod.decode_chunk(enc.blob)
    np.testing.assert_array_equal(np.asarray(dec.values, dtype=np.int32), vals)
    assert dec.n_rows == 5000 and dec.row_lengths is None


@pytest.mark.parametrize("codec", [chunkmod.PLAIN, chunkmod.RLE_DICTIONARY,
                                   chunkmod.DELTA_LENGTH_BYTE_ARRAY,
                                   chunkmod.DELTA_BYTE_ARRAY, chunkmod.FSST])
def test_chunk_roundtrip_byte_array(codec):
    vals = [f"corpus/shard{i % 5:03d}/doc-{i:010d}".encode() for i in range(800)]
    enc = chunkmod.encode_chunk(vals, "byte_array", codec)
    dec = chunkmod.decode_chunk(enc.blob)
    assert dec.values == vals


def test_chunk_roundtrip_list_column():
    # tokens column: flattened values + row_lengths -> levels
    lengths = RNG.integers(0, 50, 300)
    lengths[::10] = 0  # empty-heavy slice (FIXTURES F2)
    n_values = int(lengths.sum())
    vals = RNG.integers(0, 32768, n_values).astype(np.int32)
    enc = chunkmod.encode_chunk(vals, "int32", chunkmod.RLE_DICTIONARY,
                                row_lengths=lengths)
    assert enc.n_rows == 300 and enc.n_values == n_values
    dec = chunkmod.decode_chunk(enc.blob)
    np.testing.assert_array_equal(dec.row_lengths, lengths)
    np.testing.assert_array_equal(np.asarray(dec.values, dtype=np.int32), vals)
    # row reconstruction = np.split at cumsum (record_reader.cc:144 analog)
    rows = np.split(np.asarray(dec.values), np.cumsum(dec.row_lengths)[:-1])
    assert len(rows) == 300
    np.testing.assert_array_equal(rows[1], vals[lengths[0]: lengths[0] + lengths[1]])


def test_levels_roundtrip():
    lengths = np.array([3, 0, 1, 0, 0, 7, 2])
    rep, deflev = levels_from_lengths(lengths)
    # slots = sum(max(len,1)) = 16; rep==0 exactly once per row
    assert len(rep) == 16 and (rep == 0).sum() == 7
    np.testing.assert_array_equal(lengths_from_levels(rep, deflev), lengths)


def test_chunk_fallback_encoding_list():
    # dict-overflow chunk must record [PLAIN_DICTIONARY, PLAIN, RLE]
    vals = np.arange(100000, dtype=np.int32)
    enc = chunkmod.encode_chunk(vals, "int32", chunkmod.RLE_DICTIONARY,
                                dict_size_limit=1024)
    assert enc.encodings == ["PLAIN_DICTIONARY", "PLAIN", "RLE"]
    dec = chunkmod.decode_chunk(enc.blob)
    np.testing.assert_array_equal(np.asarray(dec.values, dtype=np.int32), vals)


def test_chunk_stats():
    vals = RNG.integers(-500, 500, 1000).astype(np.int32)
    enc = chunkmod.encode_chunk(vals, "int32", chunkmod.PLAIN)
    assert enc.stats.min_val == repr(vals.min())
    assert enc.stats.max_val == repr(vals.max())
    assert enc.stats.null_count == 0


@pytest.mark.parametrize("profile,expected", [
    ("constant", {chunkmod.RLE}),
    ("low-card", {chunkmod.RLE_DICTIONARY, chunkmod.RLE}),
    ("sorted", {chunkmod.DELTA_BINARY_PACKED}),
    ("high-card", {chunkmod.PLAIN, chunkmod.DELTA_BINARY_PACKED,
                   chunkmod.RLE_DICTIONARY}),
])
def test_selector_expected_codec(profile, expected):
    gens = {
        "constant": np.full(50000, 7, dtype=np.int32),
        "low-card": RNG.integers(0, 100, 50000).astype(np.int32),
        "sorted": np.cumsum(RNG.integers(0, 5, 50000)).astype(np.int32),
        "high-card": RNG.integers(-2**31, 2**31, 50000).astype(np.int32),
    }
    assert selector.select_int_codec(gens[profile]) in expected


def test_selector_never_worse_than_plain():
    profiles = [
        np.full(10000, 7, dtype=np.int32),
        RNG.integers(0, 100, 10000).astype(np.int32),
        np.cumsum(RNG.integers(0, 5, 10000)).astype(np.int32),
        RNG.integers(-2**31, 2**31, 10000).astype(np.int32),
        np.tile(np.array([0, 1], dtype=np.int32), 5000),
        np.repeat(np.arange(256, dtype=np.int32), RNG.integers(1, 129, 256)),
    ]
    for vals in profiles:
        enc = selector.encode_best(vals, "int32")
        plain_enc = chunkmod.encode_chunk(vals, "int32", chunkmod.PLAIN)
        assert enc.enc_bytes <= plain_enc.enc_bytes, enc.codec_name


def test_selector_bytes_columns():
    low_card = [f"src-{i % 12}".encode() for i in range(20000)]
    assert selector.select_bytes_codec(low_card) == chunkmod.RLE_DICTIONARY
    enc = selector.encode_best(low_card, "byte_array")
    dec = chunkmod.decode_chunk(enc.blob)
    assert dec.values == low_card


def test_golden_bytes_stable():
    """Freeze blob bytes per codec on a small fixture (FIXTURES F4 golden
    oracle; analog of the reference's data/*.parquet compatibility files)."""
    import hashlib
    import json
    import os
    vals = (np.arange(64, dtype=np.int32) % 8)
    goldens = {}
    for codec in [chunkmod.PLAIN, chunkmod.RLE, chunkmod.DELTA_BINARY_PACKED,
                  chunkmod.RLE_DICTIONARY]:
        enc = chunkmod.encode_chunk(vals, "int32", codec)
        goldens[chunkmod.CODEC_NAMES[codec]] = hashlib.sha256(enc.blob).hexdigest()
    words = [f"w{i % 5}".encode() for i in range(64)]
    for codec in [chunkmod.DELTA_LENGTH_BYTE_ARRAY, chunkmod.DELTA_BYTE_ARRAY,
                  chunkmod.FSST]:
        enc = chunkmod.encode_chunk(words, "byte_array", codec)
        goldens[chunkmod.CODEC_NAMES[codec]] = hashlib.sha256(enc.blob).hexdigest()
    path = os.path.join(os.path.dirname(__file__), "golden", "chunk_hashes.json")
    os.makedirs(os.path.dirname(path), exist_ok=True)
    if not os.path.exists(path):
        with open(path, "w") as f:
            json.dump(goldens, f, indent=1, sort_keys=True)
    with open(path) as f:
        frozen = json.load(f)
    assert goldens == frozen


def test_trim_decoded_rejects_nulls_and_deep_levels():
    """ADVICE r2: partial reads must refuse chunks whose dense values are
    spaced by a valid_mask or deep levels instead of mis-slicing them."""
    vals = np.arange(30, dtype=np.int64)
    mask = (vals % 3 != 0)
    enc = chunkmod.encode_chunk(vals, "int64", chunkmod.PLAIN,
                                valid_mask=mask)
    with pytest.raises(ValueError, match="nulls or nested levels"):
        chunkmod.decode_chunk_rows(enc.blob, 10, 20)


def test_paged_dict_fallback_split_row_aligned():
    """ADVICE r2: the dict->PLAIN split for list columns must land on a row
    boundary so no page spans it (pages are [dict..., plain...])."""
    rng = np.random.default_rng(3)
    # low-cardinality head then high-cardinality tail to force fallback
    head = rng.integers(0, 4, 6000).astype(np.int64)
    tail = rng.integers(0, 1 << 62, 6000).astype(np.int64)
    vals = np.concatenate([head, tail])
    row_lengths = np.full(1200, 10, dtype=np.int64)  # 12000 values
    enc = chunkmod.encode_chunk(vals, "int64", chunkmod.RLE_DICTIONARY,
                                row_lengths=row_lengths,
                                dict_size_limit=1 << 15,
                                page_size=16 << 10)
    pages = chunkmod.page_index(enc.blob)
    codecs = [p["codec"] for p in pages]
    if chunkmod.PLAIN in codecs:  # fallback happened
        first_plain = codecs.index(chunkmod.PLAIN)
        assert all(c == chunkmod.PLAIN for c in codecs[first_plain:])
        # split page boundary is row-aligned by construction of page_index
        assert pages[first_plain]["row_start"] * 10 == sum(
            p["n_values"] for p in pages[:first_plain])
    dec = chunkmod.decode_chunk(enc.blob)
    assert np.array_equal(dec.values, vals)


def test_flba_to_decimal_overflow_raises():
    """ADVICE r2: wide decimals whose magnitude exceeds int64 must raise,
    not wrap."""
    from parquet_cpp_spark import logical
    ok = (123456789).to_bytes(16, "big", signed=True)
    wide = (1 << 70).to_bytes(16, "big", signed=True)
    out = logical.flba_to_decimal([ok, ok], 16)
    assert list(out) == [123456789, 123456789]
    with pytest.raises(ValueError, match="exceeds int64"):
        logical.flba_to_decimal([ok, wide], 16)
    neg = (-(1 << 70)).to_bytes(16, "big", signed=True)
    with pytest.raises(ValueError, match="exceeds int64"):
        logical.flba_to_decimal([neg], 16)
    ok_neg = (-42).to_bytes(16, "big", signed=True)
    assert list(logical.flba_to_decimal([ok_neg], 16)) == [-42]


def test_fsst_trailing_escape_raises():
    """ADVICE r2: a corrupt FSST stream whose string ends in a bare ESCAPE
    (no literal byte after it) must raise, not fabricate a literal."""
    from parquet_cpp_spark.kernels import delta, fsst

    # round-trip sanity: a legitimate trailing ESCAPE literal decodes
    data = [b"xyz" + bytes([fsst.ESCAPE])]
    good = fsst.encode(data)
    view, _ = fsst.decode_view(good)
    assert bytes(view[0]) == data[0]

    # hand-craft a corrupt blob: empty symbol table, one string, enc_len=1,
    # payload = [ESCAPE] — the escape starts at the last byte of the string
    lens_blob = delta.encode(np.array([1], dtype=np.int64))
    corrupt = (bytes([0]) + (1).to_bytes(4, "little")
               + len(lens_blob).to_bytes(4, "little") + lens_blob
               + bytes([fsst.ESCAPE]))
    with pytest.raises(ValueError, match="escape at end"):
        fsst.decode_view(corrupt)


def test_float_stats_skip_nan():
    """NaN never poisons min/max (reference statistics-test NaN cases);
    all-NaN chunks carry no stats."""
    import numpy as np
    f = np.array([1.0, np.nan, -3.0, 2.0], dtype=np.float64)
    enc = chunkmod.encode_chunk(f, "double", chunkmod.PLAIN)
    assert enc.stats.min_val == "-3.0" and enc.stats.max_val == "2.0"
    dec = chunkmod.decode_chunk(memoryview(enc.blob))
    got = np.asarray(dec.values)
    assert np.isnan(got[1]) and got[0] == 1.0   # NaN round-trips as a value
    allnan = np.full(5, np.nan, dtype=np.float32)
    enc2 = chunkmod.encode_chunk(allnan, "float", chunkmod.PLAIN)
    assert enc2.stats.min_val is None and enc2.stats.max_val is None


def test_selector_known_ndv_skips_sampling_same_choice(monkeypatch):
    """Manifest distinct_counts feedback (re-encode of a known column):
    with known_ndv the selector must (a) never run the sampled
    unique/Counter cardinality pass and (b) pick the same codec and
    produce the identical blob as the sampled path on every profile."""
    rng = np.random.default_rng(7)
    profiles = {
        "low_card": rng.integers(0, 128, 60000).astype(np.int32),
        "sorted": np.sort(rng.integers(0, 1 << 20, 60000)).astype(np.int32),
        "runs": np.repeat(rng.integers(0, 50, 1500), 40).astype(np.int32),
        "uniform": rng.integers(0, 1 << 30, 60000).astype(np.int32),
    }
    for name, vals in profiles.items():
        ndv = len(np.unique(vals))
        baseline = selector.encode_best(vals, "int32")
        with monkeypatch.context() as m:
            # selector.np is the global numpy module (kernels share it), so
            # guard the sampled-cardinality path via its dedicated helper
            m.setattr(selector, "_estimate_cardinality",
                      lambda *a, **k: (_ for _ in ()).throw(
                          AssertionError("sampling pass ran")))
            informed = selector.encode_best(vals, "int32", known_ndv=ndv)
        assert informed.codec == baseline.codec, name
        assert informed.blob == baseline.blob, name

    strs = [f"src-{i % 23}".encode() for i in range(30000)]
    base_b = selector.encode_best(strs, "byte_array")
    with monkeypatch.context() as m:
        import collections
        m.setattr(collections, "Counter",
                  lambda *a, **k: (_ for _ in ()).throw(
                      AssertionError("Counter pass ran")))
        inf_b = selector.encode_best(strs, "byte_array", known_ndv=23)
    assert inf_b.codec == base_b.codec
    assert inf_b.blob == base_b.blob
