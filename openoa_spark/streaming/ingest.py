"""Structured Streaming operators.

The reference is batch-only (SURVEY §2.12); this module is the scale
extension: continuous telemetry ingestion with the same resample
semantics as the batch operator, expressed as event-time windowed
aggregation with watermarks (late data bounded by ``late_threshold``).

A stream resampled at "10min" with a 30-min watermark produces exactly
the batch ``resample`` result once all late data has arrived — the
unifying contract batch/streaming share.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def stream_resample(
    stream: DataFrame,
    time_col: str,
    freq_seconds: int,
    aggs: dict[str, Column],
    keys: list[str] | None = None,
    late_threshold: str = "30 minutes",
) -> DataFrame:
    """Windowed streaming aggregation mirroring the batch resample.

    Tumbling event-time window of ``freq_seconds``; watermark bounds
    state. Output unnests window.start as the bucket timestamp so the
    schema matches the batch operator's.
    """
    win = F.window(F.col(time_col), f"{freq_seconds} seconds")
    grouped = (
        stream.withWatermark(time_col, late_threshold)
        .groupBy(win, *[F.col(k) for k in (keys or [])])
        .agg(*[c.alias(n) for n, c in aggs.items()])
    )
    return grouped.select(
        F.col("window.start").alias(time_col),
        *[F.col(k) for k in (keys or [])],
        *[F.col(n) for n in aggs],
    )


def file_stream(
    spark,
    path: str,
    schema,
    fmt: str = "parquet",
    max_files_per_trigger: int = 16,
) -> DataFrame:
    """File-source stream over a growing directory (the standard
    bronze-layer ingestion for telemetry landed as parquet)."""
    return (
        spark.readStream.format(fmt)
        .schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .load(path)
    )


def write_stream_to_memory(df: DataFrame, name: str, mode: str = "append"):
    """Test/debug sink: materialize a streaming query into an
    in-memory table; returns the StreamingQuery handle."""
    return (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .start()
    )
