"""Multimodal (image/audio/video) column plumbing.

Media are opaque ``binary`` columns with typed metadata structs; the
decode / feature-extract / resize / frame-sample steps run as
Arrow-batched ``mapInPandas`` so one Python invocation processes a
whole batch of blobs. The actual codecs (PIL/ffmpeg/...) are NOT in
this container, so the decode kernel is STUBBED: if the real library
is importable it raises NotImplementedError where its call would go;
otherwise a clearly-marked deterministic fake derives features from
the content hash. The Spark-side contract — schemas, batch shapes,
partitioning, UDF signatures — is real and tested.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = "media binary, mime string, media_id long"
FEATURE_SCHEMA = (
    "media_id long, n_bytes int, content_sha int, width int, height int, n_frames int"
)


def attach_fake_media(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Synthesize a binary media column (utf-8 bytes of text) with a
    mime tag — stands in for real image/audio blobs in the synthetic
    tables."""
    return docs.select(
        F.encode(F.col(text_col), "utf-8").alias("media"),
        F.lit("application/x-fake").alias("mime"),
        F.col(id_col).alias("media_id"),
    )


def _fake_decode(blob: bytes) -> tuple[int, int, int, int]:
    """DETERMINISTIC FAKE decode — the codec-absent fallback.
    Features derive from the sha256 of the bytes."""
    h = hashlib.sha256(blob).digest()
    content = int.from_bytes(h[:4], "big") % (1 << 31)
    width = 64 + h[4] % 192
    height = 64 + h[5] % 192
    n_frames = 1 + h[6] % 30
    return content, width, height, n_frames


def _pil_decode(blob: bytes) -> tuple[int, int, int, int]:
    """Real image decode via PIL (imported lazily so the module stays
    importable in codec-free environments). content stays the bytes
    hash; width/height/n_frames come from the decoded image."""
    import io

    from PIL import Image

    h = hashlib.sha256(blob).digest()
    content = int.from_bytes(h[:4], "big") % (1 << 31)
    with Image.open(io.BytesIO(blob)) as img:
        return content, img.width, img.height, getattr(img, "n_frames", 1)


def have_pil() -> bool:
    import importlib.util

    return importlib.util.find_spec("PIL") is not None


def extract_media_features(media: DataFrame, use_real_codec: bool | None = None) -> DataFrame:
    """Decode + feature-extract per blob. Batch shape: one pandas
    DataFrame of blobs in, one feature frame out (Arrow transfer both
    ways).

    use_real_codec: True = decode image/* blobs with PIL (raises
    RuntimeError with an install hint when absent; non-image mimes
    still take the fake path — the flag never feeds text/audio bytes
    to the image decoder); False = deterministic fake; None
    (default) = PIL when importable AND image/* mime, fake
    otherwise — so the same pipeline code runs in codec-free and
    production environments with identical schemas."""
    from streaming_cdc_spark.session import ensure_package_on_executors

    ensure_package_on_executors(media.sparkSession)
    if use_real_codec and not have_pil():
        raise RuntimeError(
            "use_real_codec=True but PIL is not importable — "
            "pip install pillow, or pass use_real_codec=False/None "
            "for the deterministic fake"
        )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        pil_ok = have_pil()
        for pdf in batches:
            rows = []
            for mid, blob, mime in zip(pdf["media_id"], pdf["media"], pdf["mime"]):
                b = bytes(blob)
                # the mime gate applies in BOTH real modes: forcing
                # use_real_codec=True must not shove text/audio bytes
                # into the image decoder (UnidentifiedImageError)
                real = (
                    (use_real_codec or (use_real_codec is None and pil_ok))
                    and str(mime).startswith("image/")
                )
                content, w, h, nf = _pil_decode(b) if real else _fake_decode(b)
                rows.append((int(mid), len(b), content, w, h, nf))
            yield pd.DataFrame(
                rows,
                columns=["media_id", "n_bytes", "content_sha", "width", "height", "n_frames"],
            )

    from streaming_cdc_spark.session import fan_out

    return fan_out(media).mapInPandas(gen, FEATURE_SCHEMA)


def resize_media(media: DataFrame, target_w: int, target_h: int) -> DataFrame:
    """Resize stub: passes blobs through with updated metadata — the
    partition-preserving shape a real resampler would have."""
    return media.withColumn("target_w", F.lit(target_w)).withColumn(
        "target_h", F.lit(target_h)
    )


def sample_frames(media: DataFrame, every_n: int = 10) -> DataFrame:
    """Frame-sample stub: expands each blob to its sampled frame
    indices using the fake frame count (explode = one row per frame,
    the real output shape)."""
    feats = extract_media_features(media)
    return feats.select(
        "media_id",
        F.explode(
            F.sequence(F.lit(0), F.greatest(F.col("n_frames") - 1, F.lit(0)), F.lit(every_n))
        ).alias("frame_index"),
    )
