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
    """DETERMINISTIC FAKE decode — replace with PIL/av in production.
    Features derive from the sha256 of the bytes."""
    h = hashlib.sha256(blob).digest()
    content = int.from_bytes(h[:4], "big") % (1 << 31)
    width = 64 + h[4] % 192
    height = 64 + h[5] % 192
    n_frames = 1 + h[6] % 30
    return content, width, height, n_frames


def extract_media_features(media: DataFrame, use_real_codec: bool = False) -> DataFrame:
    """Decode + feature-extract per blob. Batch shape: one pandas
    DataFrame of blobs in, one feature frame out (Arrow transfer both
    ways)."""
    from streaming_cdc_spark.session import ensure_package_on_executors

    ensure_package_on_executors(media.sparkSession)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if use_real_codec:
                raise NotImplementedError(
                    "real image/audio decoding requires PIL/av, not present "
                    "in this environment; wire the codec here"
                )
            rows = []
            for mid, blob in zip(pdf["media_id"], pdf["media"]):
                b = bytes(blob)
                content, w, h, nf = _fake_decode(b)
                rows.append((int(mid), len(b), content, w, h, nf))
            yield pd.DataFrame(
                rows,
                columns=["media_id", "n_bytes", "content_sha", "width", "height", "n_frames"],
            )

    return media.mapInPandas(gen, FEATURE_SCHEMA)


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
