"""Multimodal binary-column plumbing: schemas, batch shapes, stubbed
decode determinism."""

import pytest

from streaming_cdc_spark.operators.multimodal import (
    attach_fake_media,
    extract_media_features,
    resize_media,
    sample_frames,
)


def media_df(spark):
    docs = spark.createDataFrame(
        [(0, "hello world"), (1, "another blob"), (2, "hello world")],
        "doc_id long, text string",
    )
    return attach_fake_media(docs)


def test_media_schema(spark):
    m = media_df(spark)
    assert dict(m.dtypes) == {"media": "binary", "mime": "string", "media_id": "bigint"}


def test_feature_extraction_deterministic(spark):
    feats = {r["media_id"]: r for r in extract_media_features(media_df(spark)).collect()}
    assert set(feats) == {0, 1, 2}
    assert feats[0]["n_bytes"] == len(b"hello world")
    # identical bytes -> identical fake features
    assert feats[0]["content_sha"] == feats[2]["content_sha"]
    assert feats[0]["width"] == feats[2]["width"]
    assert feats[0] != feats[1]
    for r in feats.values():
        assert 64 <= r["width"] < 256 and 64 <= r["height"] < 256
        assert 1 <= r["n_frames"] <= 30


def test_real_codec_path_is_gated(spark):
    with pytest.raises(Exception) as ei:
        extract_media_features(media_df(spark), use_real_codec=True).collect()
    assert "NotImplementedError" in str(ei.value) or "real image/audio" in str(ei.value)


def test_resize_and_frame_sample(spark):
    m = media_df(spark)
    r = resize_media(m, 224, 224).first()
    assert r["target_w"] == 224 and r["target_h"] == 224
    frames = sample_frames(m, every_n=5).collect()
    assert all(f["frame_index"] % 5 == 0 for f in frames)
    assert {f["media_id"] for f in frames} == {0, 1, 2}
