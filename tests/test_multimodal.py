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
    # r2: fails fast at call time (RuntimeError + install hint) when
    # PIL is absent; decodes for real when it is present
    from streaming_cdc_spark.operators.multimodal import have_pil

    if not have_pil():
        with pytest.raises(RuntimeError, match="pillow"):
            extract_media_features(media_df(spark), use_real_codec=True)
    else:  # pragma: no cover
        assert extract_media_features(media_df(spark), use_real_codec=True).count() > 0


def test_resize_and_frame_sample(spark):
    m = media_df(spark)
    r = resize_media(m, 224, 224).first()
    assert r["target_w"] == 224 and r["target_h"] == 224
    frames = sample_frames(m, every_n=5).collect()
    assert all(f["frame_index"] % 5 == 0 for f in frames)
    assert {f["media_id"] for f in frames} == {0, 1, 2}


def test_real_codec_flag_requires_pil(spark):
    """use_real_codec=True must fail fast with the install hint when
    PIL is absent (and run the real decoder when present)."""
    import pytest

    from streaming_cdc_spark.operators.multimodal import (
        attach_fake_media,
        extract_media_features,
        have_pil,
    )

    docs = spark.createDataFrame([(1, "abc")], "doc_id long, text string")
    media = attach_fake_media(docs)
    if not have_pil():
        with pytest.raises(RuntimeError, match="pillow"):
            extract_media_features(media, use_real_codec=True)
    else:  # pragma: no cover - codec-present environments only
        assert extract_media_features(media, use_real_codec=False).count() == 1


def test_pil_decode_real_image():
    """Real-codec kernel decodes an actual PNG (skips without PIL)."""
    import io

    import pytest

    PIL = pytest.importorskip("PIL")
    from PIL import Image

    from streaming_cdc_spark.operators.multimodal import _pil_decode

    buf = io.BytesIO()
    Image.new("RGB", (12, 7)).save(buf, format="PNG")
    content, w, h, nf = _pil_decode(buf.getvalue())
    assert (w, h, nf) == (12, 7, 1)
    assert 0 <= content < (1 << 31)


def test_auto_codec_keeps_fake_hashes_for_non_images(spark):
    """Default (auto) mode must produce the SAME features as the fake
    path for non-image mimes, PIL or not — media_stats hash stability."""
    from streaming_cdc_spark.operators.multimodal import (
        attach_fake_media,
        extract_media_features,
    )

    docs = spark.createDataFrame([(1, "abc"), (2, "xyz")], "doc_id long, text string")
    media = attach_fake_media(docs)
    auto = {tuple(r) for r in extract_media_features(media).collect()}
    fake = {tuple(r) for r in extract_media_features(media, use_real_codec=False).collect()}
    assert auto == fake
