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


def default_image_codec(content: bytes) -> tuple[int, int, list[float]]:
    """STUB codec — real impl: PIL.Image.open(io.BytesIO(content)) for
    dimensions + a batched CNN/CLIP embedding for the feature.
    Deterministic fake: dimensions derive from byte length, feature is
    an 8-bin byte histogram (np.frombuffer + bincount keeps even the
    stub vectorized). The contract this codec implements — and that
    tests/test_multimodal_codec.py pins end-to-end with an injected
    fake — is ``bytes -> (width, height, feature list)``; a real
    PIL/ffmpeg drop-in is one :func:`set_image_codec` call.
    """
    n = len(content or b"")
    feature = (
        np.bincount(np.frombuffer(content or b"", dtype=np.uint8) & 7, minlength=8)
        .astype(float)
        .tolist()
    )
    return (64 + n % 256, 64 + (n // 256) % 256, feature)


# Pluggable decode kernel: ``bytes -> (width, height, feature)``.
# None -> default_image_codec. Swapping in a real decoder is a config
# change, not a code change; the Arrow plumbing is identical.
_IMAGE_CODEC = None


def set_image_codec(codec) -> None:
    """Register the image decode kernel used by :func:`image_features`
    (pass None to restore the stub). The codec must be picklable — a
    module-level function or a functools.partial of one."""
    global _IMAGE_CODEC
    _IMAGE_CODEC = codec


def image_features(
    df: DataFrame, batch_hint: int = 1024, codec=None
) -> DataFrame:
    """Extract per-image features via ``mapInPandas`` (Arrow-batched).

    Binary payloads stay in Arrow buffers end-to-end; the output drops
    the payload so downstream stages shuffle only features, which is
    the pattern that keeps a 100 TB image corpus tractable (decode
    once, persist features, never shuffle raw bytes).

    ``codec`` (or a prior :func:`set_image_codec`) supplies the decode
    kernel; the plumbing guarantees it receives raw ``bytes`` per item
    (b"" for NULL payloads) and contributes (width, height, feature)
    while n_bytes/content_hash come from the harness itself.
    """

    from openoa_spark.session import ship_package

    ship_package(df.sparkSession)  # closure refs module-level stub/schema
    decode = codec or _IMAGE_CODEC or default_image_codec

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import zlib

        for pdf in batches:
            rows = []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                raw = bytes(content) if content is not None else b""
                w, h, feature = decode(raw)
                rows.append(
                    {
                        "media_id": mid,
                        "width": w,
                        "height": h,
                        "n_bytes": len(raw),
                        "content_hash": zlib.crc32(raw),
                        "feature": feature,
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


def audio_chunk_plan(
    df: DataFrame, chunk_s: float = 30.0, overlap_s: float = 0.0
) -> DataFrame:
    """Audio chunking *plan*: expands per-clip metadata into
    (media_id, chunk_idx, start_s, end_s) rows — the manifest an
    ASR/audio-embedding stage consumes (e.g. 30 s windows with a small
    overlap so no utterance is cut at every boundary). Pure
    ``sequence``/``explode`` column math over meta['duration_s']; the
    per-chunk decode is the stubbed kernel pattern above. Chunks
    step by ``chunk_s - overlap_s``; the final chunk is truncated at
    the clip end.
    """
    if not 0 <= overlap_s < chunk_s:
        raise ValueError(f"need 0 <= overlap_s < chunk_s, got {overlap_s}")
    step = chunk_s - overlap_s
    dur = F.coalesce(
        F.element_at("meta", "duration_s").cast("double"), F.lit(0.0)
    )
    # chunk i covers [i*step, i*step + chunk_s); last i has i*step < dur
    n = F.greatest(F.ceil(dur / step).cast("int"), F.lit(1))
    return (
        df.select(
            "media_id",
            dur.alias("_dur"),
            F.explode(F.sequence(F.lit(0), n - 1)).alias("chunk_idx"),
        )
        .where(F.col("chunk_idx") * step < F.col("_dur"))
        .select(
            "media_id",
            "chunk_idx",
            (F.col("chunk_idx") * step).alias("start_s"),
            F.least(
                F.col("chunk_idx") * step + chunk_s, F.col("_dur")
            ).alias("end_s"),
        )
    )
