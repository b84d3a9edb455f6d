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


def upsert_latest(
    spark,
    table_path: str,
    updates: DataFrame,
    keys: list[str],
    order_col: str,
) -> None:
    """Merge-upsert for plain parquet tables (no Delta/Iceberg in the
    container): union the existing table with ``updates`` and keep the
    LATEST row per key by ``order_col`` — the idempotent ingest step a
    long-running telemetry pipeline replays safely (re-delivering a
    batch is a no-op; late corrections win by timestamp).

    Keep-latest is one hash-agg of ``max_by(struct(all columns),
    struct(order_col, is_update))`` — no sort, no window; ties prefer
    the update. Spark cannot overwrite a path it is reading, so the
    merge lands in a staging directory and is swapped in with Hadoop
    FileSystem renames (atomic per directory on HDFS; the same
    pattern object-store committers emulate).
    """
    from pyspark.sql import functions as F

    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    path = jvm.org.apache.hadoop.fs.Path(table_path)
    fs = path.getFileSystem(conf)

    if fs.exists(path):
        existing = spark.read.parquet(table_path).withColumn(
            "_is_update", F.lit(0)
        )
        merged = existing.unionByName(
            updates.withColumn("_is_update", F.lit(1))
        )
    else:
        merged = updates.withColumn("_is_update", F.lit(1))

    cols = [c for c in merged.columns if c != "_is_update"]
    latest = (
        merged.groupBy(*keys)
        .agg(
            F.max_by(
                F.struct(*cols),
                F.struct(F.col(order_col), F.col("_is_update")),
            ).alias("_row")
        )
        .select("_row.*")
    )

    staging = table_path.rstrip("/") + "._staging"
    spath = jvm.org.apache.hadoop.fs.Path(staging)
    fs.delete(spath, True)
    latest.write.parquet(staging)
    old = jvm.org.apache.hadoop.fs.Path(table_path.rstrip("/") + "._old")
    fs.delete(old, True)
    if fs.exists(path):
        fs.rename(path, old)
    fs.rename(spath, path)
    fs.delete(old, True)


def zorder_key(
    cols: list,
    mins: list[float],
    maxs: list[float],
    bits: int = 10,
):
    """Z-order (Morton) key as a pure Column expression: each column is
    linearly bucketed to ``bits`` bits over [min, max], then the bit
    planes are interleaved. Rows close in the key are close in EVERY
    dimension, so a sorted write clusters multi-dimensionally and
    parquet min/max stats prune scans filtered on ANY of the columns —
    the Delta/Iceberg OPTIMIZE ZORDER layout, reproduced as column
    math (linear bucketing; feed quantile-based mins/maxs per col to
    tame skew).
    """
    from pyspark.sql import functions as F

    n_buckets = (1 << bits) - 1
    key = F.lit(0).cast("long")
    for j, (c, lo, hi) in enumerate(zip(cols, mins, maxs)):
        c = F.col(c) if isinstance(c, str) else c
        span = (hi - lo) or 1.0
        bucket = F.least(
            F.greatest(
                F.floor((c.cast("double") - F.lit(lo)) / span * n_buckets),
                F.lit(0),
            ),
            F.lit(n_buckets),
        ).cast("long")
        for i in range(bits):
            key = key.bitwiseOR(
                F.shiftleft(
                    F.shiftright(bucket, i).bitwiseAND(F.lit(1)),
                    i * len(cols) + j,
                )
            )
    return key


def write_zordered(
    df: DataFrame,
    path: str,
    cols: list[str],
    bits: int = 10,
    num_files: int | None = None,
    robust: bool = False,
) -> None:
    """Write ``df`` clustered by the Z-order of ``cols``: one tiny
    bounds aggregate, then ``repartitionByRange`` on the key (range
    exchange — each output file owns a contiguous key range) +
    ``sortWithinPartitions`` so parquet min/max stats are tight per
    row group in every Z-order dimension.

    ``robust=True`` takes the 1st/99th percentile (approxQuantile, one
    extra pass) as bucket bounds instead of min/max: with a skewed or
    outlier-bearing column, a single extreme value would otherwise
    stretch the linear bucketing until all real data shares a handful
    of buckets (outliers clamp to the edge buckets, which is fine —
    they land in the edge files)."""
    from pyspark.sql import functions as F

    if robust:
        casted = df.select(
            *[F.col(c).cast("double").alias(c) for c in cols]
        ).dropna()
        bounds = casted.stat.approxQuantile(cols, [0.01, 0.99], 0.001)
        mins = [b[0] if b else None for b in bounds]
        maxs = [b[1] if b else None for b in bounds]
    else:
        stats = df.agg(
            *[F.min(F.col(c).cast("double")).alias(f"_lo{i}") for i, c in enumerate(cols)],
            *[F.max(F.col(c).cast("double")).alias(f"_hi{i}") for i, c in enumerate(cols)],
        ).first()
        mins = [stats[f"_lo{i}"] for i in range(len(cols))]
        maxs = [stats[f"_hi{i}"] for i in range(len(cols))]
    if any(v is None for v in (*mins, *maxs)):  # empty or all-null input
        df.write.mode("overwrite").parquet(path)
        return
    keyed = df.withColumn("_zkey", zorder_key(cols, mins, maxs, bits))
    n = num_files or df.sparkSession.sparkContext.defaultParallelism
    (
        keyed.repartitionByRange(n, "_zkey")
        .sortWithinPartitions("_zkey")
        .drop("_zkey")
        .write.mode("overwrite")
        .parquet(path)
    )


def overwrite_partitions(
    df: DataFrame, path: str, partition_cols: list[str]
) -> None:
    """Dynamic partition overwrite: replace ONLY the partitions present
    in ``df``, leaving every other partition untouched — the
    incremental-maintenance pattern for derived/aggregate tables (a
    late-arriving day of telemetry re-lands just that day's aggregate;
    history is never rewritten, so refresh cost tracks the delta, not
    the table).

    Static overwrite (Spark's default) would drop ALL partitions
    first; the per-write option scopes the dynamic mode to this write
    without mutating session config.
    """
    (
        df.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(*partition_cols)
        .parquet(path)
    )


def apply_cdc(
    spark,
    table_path: str,
    changes: DataFrame,
    keys: list[str],
    partition_col: str,
    op_col: str = "_op",
    order_col: str | None = None,
) -> None:
    """Partition-scoped CDC merge for plain parquet (the MERGE INTO a
    Delta/Iceberg table would give you, without a table format):
    apply a change batch of upserts and DELETES, rewriting ONLY the
    partitions the batch touches.

    ``changes`` carries the full row schema plus ``op_col``
    ('upsert' | 'delete'); when a key has several change rows the one
    with the greatest ``order_col`` (default: arrival order within the
    batch is undefined — pass an ordering column for multi-change
    batches) wins. Rows in untouched partitions are never read or
    rewritten — merge cost tracks the delta's partition footprint,
    not table size. Re-applying the same batch is idempotent: the
    touched partitions re-merge to the identical state.

    Scale shape: ONE semi-join-pruned read of the touched partitions
    (partition filter pushed down via an IN list when small, else a
    broadcast semi-join), one keep-latest hash aggregate, one dynamic
    partition overwrite.
    """
    from pyspark.sql import functions as F

    ops = [r[0] for r in changes.select(op_col).distinct().collect()]
    bad = set(ops) - {"upsert", "delete"}
    if bad:
        raise ValueError(f"unknown {op_col} values: {sorted(bad)}")

    touched = [
        r[0] for r in changes.select(partition_col).distinct().collect()
    ]
    jvm = spark._jvm
    path = jvm.org.apache.hadoop.fs.Path(table_path)
    fs = path.getFileSystem(spark._jsc.hadoopConfiguration())

    if fs.exists(path):
        existing = (
            spark.read.parquet(table_path)
            .where(F.col(partition_col).isin(touched))
            .withColumn(op_col, F.lit("upsert"))
            .withColumn("_is_change", F.lit(0))
        )
        merged = existing.unionByName(
            changes.withColumn("_is_change", F.lit(1)), allowMissingColumns=False
        )
    else:
        merged = changes.withColumn("_is_change", F.lit(1))

    cols = [c for c in merged.columns if c != "_is_change"]
    # precedence: greatest order_col first (when given), then change
    # rows beat existing rows — NEVER the op string itself (lexical
    # 'upsert' > 'delete' would let a stale row survive its delete)
    ord_cols = ([F.col(order_col)] if order_col else []) + [
        F.col("_is_change")
    ]
    latest = (
        merged.groupBy(*keys)
        .agg(
            F.max_by(
                F.struct(*cols),
                F.struct(*ord_cols),
            ).alias("_row")
        )
        .select("_row.*")
        .where(F.col(op_col) != "delete")
        .drop(op_col)
    )
    latest = latest.localCheckpoint(eager=True)  # fix before the overwrite
    present = {
        r[0] for r in latest.select(partition_col).distinct().collect()
    }
    if present:
        has_marker = fs.exists(path) and any(
            st.isFile() and st.getPath().getName().endswith(".parquet")
            for st in fs.listStatus(path)
        )
        w = latest.write.mode("overwrite").partitionBy(partition_col)
        if has_marker:
            # a previous delete-everything batch left the flat schema
            # marker (see below), so the table is logically EMPTY — a
            # STATIC overwrite (replace everything) is semantically
            # identical here and clears the marker within Spark's own
            # overwrite commit instead of a hand-rolled pre-delete
            # (review r6: deleting the marker BEFORE the dynamic write
            # committed reopened the unreadable-table crash window this
            # function exists to close; static overwrite reduces the
            # exposure to plain parquet's standard non-atomic-overwrite
            # semantics, the baseline everywhere without a table
            # format)
            w.parquet(table_path)
        else:
            (
                w.option("partitionOverwriteMode", "dynamic")
                .parquet(table_path)
            )
    # dynamic overwrite only replaces partitions PRESENT in the output:
    # a partition whose every row was deleted would silently survive —
    # drop those directories explicitly. Directory names carry Spark's
    # percent-escaped partition values (timestamps' ':', spaces, '%',
    # …), so build them with the same escaping — a raw str(v) path
    # would miss exactly the partitions this cleanup exists to remove.
    if fs.exists(path):
        for v in set(touched) - present:
            fs.delete(
                jvm.org.apache.hadoop.fs.Path(
                    f"{table_path.rstrip('/')}/"
                    f"{partition_col}={_escape_partition_value(v)}"
                ),
                True,
            )
        # A batch that deletes EVERY remaining row leaves zero data
        # files: the dynamic overwrite wrote nothing and the cleanup
        # just removed the last directory, so spark.read.parquet(path)
        # would throw UNABLE_TO_INFER_SCHEMA. Keep the table readable-
        # but-empty with one schema-bearing empty file (static write,
        # no partitionBy — the partition column stays as a plain
        # column with its original type).
        dirs_left = any(
            st.isDirectory()
            and st.getPath().getName().startswith(f"{partition_col}=")
            for st in fs.listStatus(path)
        )
        if not dirs_left:
            latest.limit(0).write.mode("overwrite").parquet(table_path)
    elif not present:
        # first-ever batch whose rows were all deletes: still
        # materialize an empty, readable table
        latest.limit(0).write.mode("overwrite").parquet(table_path)


# The characters Spark's ExternalCatalogUtils.escapePathName percent-
# encodes when writing a partition value into a directory name
# (control chars, path separators, glob/URI metacharacters).
_PATH_ESCAPE = (
    {chr(c) for c in range(0x01, 0x20)}
    | set('"#%\'*/:=?\\\x7f{[]^')
)


def _escape_partition_value(v) -> str:
    """Render a partition VALUE exactly as Spark encodes it in the
    partition directory name: ``None`` (and empty string) become the
    Hive default-partition token; every unsafe character becomes
    ``%XX``. Mirrors ExternalCatalogUtils.escapePathName — simple
    scalar types only (str/int/float/date/datetime), matching the
    partition-column types this sink supports."""
    if v is None:
        return "__HIVE_DEFAULT_PARTITION__"
    s = str(v)
    if s == "":
        return "__HIVE_DEFAULT_PARTITION__"
    return "".join(
        f"%{ord(ch):02X}" if ch in _PATH_ESCAPE else ch for ch in s
    )
