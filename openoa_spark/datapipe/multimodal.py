"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata.

The decode/feature kernels are STUBS (the container has no image or
audio codecs) — clearly marked below — but the Spark-side contract is
real and tested: schemas, Arrow batch shapes, ``mapInPandas``
signatures, and partition sizing are exactly what a production decode
stage uses; swapping the stub body for PIL/ffmpeg is a one-function
change.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

# Canonical schema for a multimodal asset table.
MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("content", T.BinaryType(), True),
        T.StructField("mime", T.StringType(), True),
        T.StructField("meta", T.MapType(T.StringType(), T.StringType()), True),
    ]
)

IMAGE_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("content_hash", T.LongType(), True),
        T.StructField("feature", T.ArrayType(T.FloatType()), True),
    ]
)


def _decode_image_stub(content: bytes) -> tuple[int, int]:
    """STUB — real impl uses PIL.Image.open(io.BytesIO(content)).size.
    Deterministic fake: dimensions derived from the byte length so
    tests have stable expectations."""
    n = len(content or b"")
    return (64 + n % 256, 64 + (n // 256) % 256)


def image_features(df: DataFrame, batch_hint: int = 1024) -> DataFrame:
    """Extract per-image features via ``mapInPandas`` (Arrow-batched).

    Binary payloads stay in Arrow buffers end-to-end; the output drops
    the payload so downstream stages shuffle only features, which is
    the pattern that keeps a 100 TB image corpus tractable (decode
    once, persist features, never shuffle raw bytes).
    """

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import zlib

        for pdf in batches:
            rows = []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                raw = bytes(content) if content is not None else b""
                w, h = _decode_image_stub(raw)
                rows.append(
                    {
                        "media_id": mid,
                        "width": w,
                        "height": h,
                        "n_bytes": len(raw),
                        "content_hash": zlib.crc32(raw),
                        # STUB feature: 8-dim byte histogram
                        # (deterministic); real impl: CNN/CLIP
                        # embedding batched on GPU. np.frombuffer +
                        # bincount keeps even the stub vectorized —
                        # this loop is the per-item hot path if a real
                        # decoder is dropped in.
                        "feature": np.bincount(
                            np.frombuffer(raw, dtype=np.uint8) & 7,
                            minlength=8,
                        ).astype(float).tolist(),
                    }
                )
            yield pd.DataFrame(
                rows, columns=[f.name for f in IMAGE_FEATURE_SCHEMA.fields]
            )

    return df.select("media_id", "content").mapInPandas(_extract, IMAGE_FEATURE_SCHEMA)


def frame_sample_plan(df: DataFrame, every_n_seconds: float = 1.0) -> DataFrame:
    """Video frame-sampling *plan*: expands per-video metadata into
    (media_id, frame_ts) rows with ``sequence``/``explode`` — pure
    Spark; the per-frame decode is the stubbed kernel above.
    Requires meta['duration_s'].
    """
    dur = F.coalesce(F.element_at("meta", "duration_s").cast("double"), F.lit(0.0))
    n = F.greatest(F.floor(dur / every_n_seconds).cast("int"), F.lit(0))
    return df.select(
        "media_id",
        F.explode(
            F.transform(F.sequence(F.lit(0), n), lambda i: i * every_n_seconds)
        ).alias("frame_ts"),
    )
