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


def ship_package(spark) -> None:
    """Make ``openoa_spark`` importable on executor Python workers by
    zipping the package and ``addPyFile``-ing it — the same mechanism
    as ``spark-submit --py-files``, so it works on any cluster
    manager (local workers don't inherit the driver's runtime
    ``sys.path`` mutations). Idempotent per SparkContext. Needed
    before shipping closures that reference package code (e.g. the
    distributed Monte-Carlo paths)."""
    import os
    import tempfile
    import zipfile

    sc = spark.sparkContext
    if getattr(sc, "_openoa_pkg_shipped", False):
        return
    import openoa_spark

    pkg_dir = os.path.dirname(os.path.abspath(openoa_spark.__file__))
    zpath = os.path.join(
        tempfile.gettempdir(), f"openoa_spark_pkg_{os.getpid()}.zip"
    )
    with zipfile.ZipFile(zpath, "w") as z:
        for root, _dirs, files in os.walk(pkg_dir):
            if "__pycache__" in root:
                continue
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    rel = os.path.join(
                        "openoa_spark", os.path.relpath(full, pkg_dir)
                    )
                    z.write(full, rel)
    sc.addPyFile(zpath)
    sc._openoa_pkg_shipped = True


def auto_sim_batch(
    spark,
    n_rows: int,
    cap: int,
    row_width_bytes: int = 400,
    budget_fraction: float = 0.3,
    heap_bytes: int | None = None,
) -> int:
    """Memory-adaptive Monte-Carlo chunk size for the sim-keyed
    batched pipelines (TIE, wake): how many simulations may share one
    rows×sims exploded pass without blowing executor memory.

    The round-8 ×16 scale probe OOM'd the default 8 GiB heap at the
    FIXED default ``sim_batch=25`` — at constant memory, sims-per-
    chunk must shrink as rows grow (SCALING.md, "Round-8 Monte-Carlo
    run stages"). This computes that shrink instead of documenting it:

        batch = clamp( heap × budget_fraction
                       / (n_rows × row_width_bytes), 1, cap )

    - ``heap`` is the live JVM's Runtime.maxMemory() — the actual
      executor/driver heap whatever launcher set it, no conf parsing.
    - ``budget_fraction`` reserves the rest for shuffle buffers, the
      base-table cache, and concurrent task overheads (0.3 ≈ half of
      spark.memory.fraction's 0.6 execution/storage share).
    - ``row_width_bytes`` is the HEAP footprint one exploded sim row
      drags through the chunk pass — not just its UnsafeRow (~160 B
      for 10-20 numeric columns) but its share of the cached derived
      tables (wake caches BOTH plant-grain and turbine-grain frames
      per chunk) and the concurrent agg/sort buffers. Calibrated
      empirically on the wake ×16 probe (640k-row base, 8 GiB heap):
      batch 25 (the fixed r8 default) OOM'd; batch 12 completed with
      a measured 7.31 GiB peak — an effective ~310 B/row at the 0.3
      budget. The 400 B default sizes the same case to batch 9,
      keeping ~15% heap headroom for host jitter.
    - ``cap`` is the user's configured sim_batch: the auto value only
      ever SHRINKS the chunk (keeping small-data behavior and all
      pinned batched==per-sim identities unchanged), and the result
      is bit-identical at any batch size by construction.

    Monotonic: non-increasing in n_rows, non-decreasing in heap.
    """
    heap = heap_bytes
    if heap is None:
        try:
            heap = int(
                spark.sparkContext._jvm.java.lang.Runtime.getRuntime().maxMemory()
            )
        except Exception:  # noqa: BLE001 — no JVM handle (mocks): 8 GiB
            heap = 8 << 30
    budget = heap * budget_fraction
    per_sim = max(int(n_rows), 1) * row_width_bytes
    return max(1, min(int(cap), int(budget // per_sim)))


def spread_small_input(df, min_partitions: int | None = None):
    """Decouple compute parallelism from file layout for CPU-heavy
    expression pipelines (minhash signatures, entropy folds, shingle
    explodes): a small table read from one parquet file arrives as ONE
    partition, so everything downstream of the scan runs on one core
    until the first shuffle — locally that single core dominates the
    wall clock even though the cluster is idle.

    No-op when the scan already yields >= min_partitions (the 100 TB
    case — production inputs split into thousands of tasks via
    spark.sql.files.maxPartitionBytes); otherwise one lightweight
    round-robin exchange of the raw rows, which costs far less than
    the per-row compute it parallelizes. Defaults min_partitions to
    the cluster's default parallelism.
    """
    if min_partitions is None:
        min_partitions = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= min_partitions:
        return df
    return df.repartition(min_partitions)
