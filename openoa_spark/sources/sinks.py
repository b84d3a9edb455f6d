"""Table sinks with scale-aware layouts.

Bucketing is the 100 TB lever the plain parquet writer lacks: two
tables bucketed by the same key into the same bucket count join with
ZERO shuffle (SortMergeJoin reads co-located buckets), and repeated
aggregations on the bucket key skip their Exchange too. The reference
is single-node pandas and has no counterpart; this is part of the
"scaling is configuration, not rewrite" surface (SURVEY §1.4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    num_buckets: int = 32,
    sort_cols: list[str] | None = None,
    path: str | None = None,
    fmt: str = "parquet",
) -> None:
    """Write ``df`` as a bucketed (and optionally sorted) table.

    Bucket metadata lives in the session catalog (``saveAsTable`` —
    plain ``save`` cannot record bucketing). Size ``num_buckets`` so a
    bucket holds ~128-256 MB at the target scale; joins between tables
    sharing (bucket_cols, num_buckets) run shuffle-free.
    """
    writer = df.write.format(fmt).mode("overwrite").bucketBy(
        num_buckets, *bucket_cols
    )
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    if path is not None:
        writer = writer.option("path", path)
    writer.saveAsTable(table)


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: list[str],
    fmt: str = "parquet",
    max_records_per_file: int | None = None,
) -> None:
    """Write a directory-partitioned dataset (one subdirectory per
    partition value — the layout that makes partition PRUNING free for
    every downstream reader). Keep partition cardinality moderate
    (date, product, site id), never a high-cardinality key."""
    writer = df.write.format(fmt).mode("overwrite").partitionBy(*partition_cols)
    if max_records_per_file:
        writer = writer.option("maxRecordsPerFile", max_records_per_file)
    writer.save(path)


def compact_parquet(
    spark,
    src_path: str,
    dst_path: str,
    target_file_mb: int = 256,
) -> int:
    """Rewrite a parquet dataset into ~``target_file_mb`` files — the
    small-files compaction every long-running ingest needs (a stream
    or hourly batch writer leaves thousands of KB-scale files whose
    per-file open/footer cost dominates scans at 100 TB).

    File count is sized from the ACTUAL on-disk bytes (via the Hadoop
    FileSystem API, so it works on HDFS/S3A, not just local), then one
    round-robin ``repartition(n)`` — a full shuffle, which is the
    point: it rebalances skewed input files into uniform outputs.
    Returns the number of output files written.
    """
    import math

    jvm = spark._jvm
    jsc = spark._jsc
    conf = jsc.hadoopConfiguration()
    p = jvm.org.apache.hadoop.fs.Path(src_path)
    fs = p.getFileSystem(conf)
    total_bytes = fs.getContentSummary(p).getLength()
    n = max(1, math.ceil(total_bytes / (target_file_mb * 1024 * 1024)))
    spark.read.parquet(src_path).repartition(n).write.mode(
        "overwrite"
    ).parquet(dst_path)
    return n
