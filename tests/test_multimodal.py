"""Multimodal plumbing tests: schema, byte-capped batching, strict-mode
stubs, and payload-column pruning."""

import pytest

pyspark = pytest.importorskip("pyspark")

from parquet_cpp_spark.functions import multimodal


@pytest.fixture(scope="module")
def spark():
    from parquet_cpp_spark.session import get_spark
    return get_spark(master="local[4]", app_name="pcs-mm",
                     shuffle_partitions=4)


def test_feature_extraction_deterministic(spark):
    media = multimodal.synthesize_media(spark, 48)
    feats = multimodal.extract_features(media).collect()
    assert len(feats) == 48
    assert all(r.decode_ok for r in feats)
    assert {r.feat_dim for r in feats} == {8}
    again = multimodal.extract_features(
        multimodal.synthesize_media(spark, 48)).collect()
    a = {r.media_id: r.features for r in feats}
    b = {r.media_id: r.features for r in again}
    assert a == b  # deterministic fakes


def test_strict_mode_marks_not_decoded(spark):
    media = multimodal.synthesize_media(spark, 9)
    feats = multimodal.extract_features(media, strict=True).collect()
    assert len(feats) == 9
    assert not any(r.decode_ok for r in feats)  # stubs refuse, pipeline lives


def test_byte_capped_batches(spark):
    media = multimodal.synthesize_media(spark, 48)
    # tiny cap: still processes everything, just in more sub-batches
    feats = multimodal.extract_features(media, batch_bytes=1024).collect()
    assert len(feats) == 48


def test_metadata_query_prunes_payload(spark, tmp_path):
    media = multimodal.synthesize_media(spark, 24)
    p = str(tmp_path / "media")
    media.write.parquet(p)
    stats = multimodal.media_stats(spark.read.parquet(p))
    plan = stats._jdf.queryExecution().executedPlan().toString()
    assert "payload" not in plan  # column pruning reached the scan
    assert stats.count() == 3
