"""Multimodal tests: REAL pure-numpy decoders (PPM image, WAV PCM16 audio,
concatenated-PPM video) asserted against hand-computed fixtures, plus the
Spark plumbing: schema, byte-capped batching, strict mode, payload pruning."""

import numpy as np
import pytest

pyspark = pytest.importorskip("pyspark")

from parquet_cpp_spark.functions import multimodal

FEAT_DIMS = {"image": 19, "audio": 8, "video": 20}


@pytest.fixture(scope="module")
def spark():
    from parquet_cpp_spark.session import get_spark
    return get_spark(master="local[4]", app_name="pcs-mm",
                     shuffle_partitions=4)


# ---------------------------------------------------- decoder unit fixtures

def test_ppm_roundtrip_hand_computed():
    img = np.array([[[255, 0, 0], [0, 255, 0]],
                    [[0, 0, 255], [255, 255, 255]]], dtype=np.uint8)
    payload = multimodal.encode_ppm(img)
    assert payload.startswith(b"P6\n2 2\n255\n")
    dec, end = multimodal.decode_ppm(payload)
    assert end == len(payload)
    np.testing.assert_array_equal(dec, img)
    feats = multimodal.image_features(img)
    # channel means: each channel sums to 510 over 4 pixels -> 0.5
    np.testing.assert_allclose(feats[:3], [0.5, 0.5, 0.5])
    # grayscale: [[85, 85], [85, 255]]; 4x4 nearest repeats each cell 2x2
    gray = np.array([[85, 85], [85, 255]], dtype=np.float32) / 255.0
    np.testing.assert_allclose(
        feats[3:].reshape(4, 4), np.kron(gray, np.ones((2, 2))), atol=1e-6)


def test_ppm_header_comments_and_corruption():
    img = np.zeros((1, 1, 3), dtype=np.uint8)
    with_comment = b"P6\n# a comment\n1 1\n255\n" + b"\x00\x00\x00"
    dec, _ = multimodal.decode_ppm(with_comment)
    np.testing.assert_array_equal(dec, img)
    with pytest.raises(ValueError, match="not a P6"):
        multimodal.decode_ppm(b"JFIF....")
    with pytest.raises(ValueError, match="truncated PPM pixel"):
        multimodal.decode_ppm(b"P6\n4 4\n255\n\x00\x00")


def test_wav_roundtrip_hand_computed():
    samples = np.full((80, 1), 16384, dtype=np.int16)
    payload = multimodal.encode_wav(samples, 16000)
    dec, rate = multimodal.decode_wav(payload)
    assert rate == 16000
    np.testing.assert_array_equal(dec, samples)
    # constant amplitude 16384 -> RMS 16384 -> normalized 0.5 per window
    np.testing.assert_allclose(multimodal.audio_features(dec),
                               [0.5] * 8, atol=1e-6)
    with pytest.raises(ValueError, match="not a RIFF"):
        multimodal.decode_wav(b"OggS....")


def test_resize_nearest():
    img = np.arange(16, dtype=np.uint8).reshape(4, 4)
    small = multimodal.resize_nearest(img, 2, 2)
    np.testing.assert_array_equal(small, [[0, 2], [8, 10]])
    big = multimodal.resize_nearest(img, 8, 8)
    assert big.shape == (8, 8)
    np.testing.assert_array_equal(big[::2, ::2], img)


def test_video_frame_sampling():
    rng = np.random.default_rng(3)
    frames = [rng.integers(0, 256, (4, 4, 3), dtype=np.uint8)
              for _ in range(7)]
    payload = b"".join(multimodal.encode_ppm(f) for f in frames)
    got = list(multimodal.iter_ppm_frames(payload))
    assert len(got) == 7
    for a, b in zip(got, frames):
        np.testing.assert_array_equal(a, b)
    sampled = multimodal.sample_frames(payload, 3)
    np.testing.assert_array_equal(sampled[0], frames[0])
    np.testing.assert_array_equal(sampled[1], frames[3])
    np.testing.assert_array_equal(sampled[2], frames[6])
    feats = multimodal.video_features(payload)
    assert feats.shape == (20,) and feats[-1] == 3.0


# --------------------------------------------------------- Spark plumbing

def test_feature_extraction_real_decode(spark):
    media = multimodal.synthesize_media(spark, 48)
    feats = multimodal.extract_features(media).collect()
    assert len(feats) == 48
    assert all(r.decode_ok for r in feats)  # every payload decodes for real
    assert {r.kind: r.feat_dim for r in feats} == FEAT_DIMS
    again = multimodal.extract_features(
        multimodal.synthesize_media(spark, 48)).collect()
    a = {r.media_id: r.features for r in feats}
    b = {r.media_id: r.features for r in again}
    assert a == b  # deterministic


def test_undecodable_payloads(spark):
    """Exotic formats: decode_ok=false in default mode, raise in strict."""
    rows = [("x-1", "image", bytearray(b"\xff\xd8JPEG..."), None, None,
             None, None)]
    media = spark.createDataFrame(rows, multimodal.MEDIA_SCHEMA)
    got = multimodal.extract_features(media).collect()
    assert len(got) == 1 and not got[0].decode_ok
    with pytest.raises(Exception, match="not a P6"):
        multimodal.extract_features(media, strict=True).collect()


def test_byte_capped_batches(spark):
    media = multimodal.synthesize_media(spark, 48)
    # tiny cap: still processes everything, just in more sub-batches
    feats = multimodal.extract_features(media, batch_bytes=1024).collect()
    assert len(feats) == 48
    assert all(r.decode_ok for r in feats)


def test_metadata_query_prunes_payload(spark, tmp_path):
    media = multimodal.synthesize_media(spark, 24)
    p = str(tmp_path / "media")
    media.write.parquet(p)
    stats = multimodal.media_stats(spark.read.parquet(p))
    plan = stats._jdf.queryExecution().executedPlan().toString()
    assert "payload" not in plan  # column pruning reached the scan
    assert stats.count() == 3
