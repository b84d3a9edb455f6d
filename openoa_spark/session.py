"""SparkSession factory with scale-aware defaults.

Local mode is a correctness/test vehicle; the config is chosen so the
same code path is the one you would deploy on a real cluster: AQE on
(runtime re-planning, skew-join handling, partition coalescing),
Arrow-backed pandas interchange for the few Pandas-UDF operators, and
UTC session time so timestamp semantics match the reference's naive-UTC
convention (reference: openoa/utils/timeseries.py:82-141 converts
everything to UTC).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_session(
    app_name: str = "openoa-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession.

    Defaults honor the driver environment: ``SPARK_GRAFT_CPUS`` sets
    local parallelism; shuffle partitions default to the core count so
    small-scale runs don't pay 200-task scheduling overhead, while a
    cluster deployment overrides via ``extra_conf`` (at 100 TB you want
    shuffle partitions sized so each task holds ~128-256 MB).
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    master = master or f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = 32 if cpus == "*" else max(int(cpus), 4)
    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
