"""QA operators: timezone-aware timestamp conversion, DST/offset
annotation, duplicate/gap identification, summary statistics.

Parity targets (behavior only): openoa/utils/qa.py:84-264.

All operators are pure Column expressions or thin wrappers over the
timeseries toolkit — timezone conversion uses Spark's built-in
``to_utc_timestamp`` / ``from_utc_timestamp`` (JVM Olson tz database),
so no per-row Python runs at any scale."""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from openoa_spark.operators.timeseries import (
    duplicate_time_counts,
    find_time_gaps,
)


def convert_datetime_column(
    df: DataFrame,
    time_col: str,
    local_tz: str,
    tz_aware: bool = False,
) -> DataFrame:
    """Parse/annotate a timestamp column: adds ``<col>_utc`` and
    ``<col>_localized`` (wall-clock in ``local_tz``) plus utc_offset /
    is_dst columns. Semantics: qa.py:115-175.

    ``tz_aware=True`` means the strings carry an offset (parsed by
    Spark and normalized to UTC in the session zone); otherwise the
    naive stamps are interpreted as wall-clock time in ``local_tz``.
    """
    t = F.col(time_col)
    parsed = t if dict(df.dtypes).get(time_col) == "timestamp" else F.to_timestamp(t)
    if tz_aware:
        utc = parsed  # session zone is UTC; aware inputs normalize on parse
    else:
        utc = F.to_utc_timestamp(parsed, local_tz)
    out = df.withColumn(f"{time_col}_utc", utc).withColumn(
        f"{time_col}_localized", F.from_utc_timestamp(utc, local_tz)
    )
    return determine_offset_dst(out, f"{time_col}_utc", local_tz)


def determine_offset_dst(df: DataFrame, utc_col: str, local_tz: str) -> DataFrame:
    """Add ``utc_offset`` (hours) and ``is_dst`` columns.

    Semantics: qa.py:84-112 — DST is defined as "offset differs from
    the January (winter) baseline offset"."""
    utc = F.col(utc_col)
    offset_h = (
        F.unix_timestamp(F.from_utc_timestamp(utc, local_tz)) - F.unix_timestamp(utc)
    ) / 3600.0
    jan = F.to_timestamp(F.lit("2021-01-01 00:00:00"))
    base_h = (
        F.unix_timestamp(F.from_utc_timestamp(jan, local_tz)) - F.unix_timestamp(jan)
    ) / 3600.0
    return df.withColumn("utc_offset", offset_h).withColumn(
        "is_dst", offset_h != base_h
    )


def duplicate_time_identification(
    df: DataFrame, time_col: str, id_col: str | None = None
) -> DataFrame:
    """Timestamps (per asset) appearing more than once with their
    counts. Semantics: qa.py:178-213."""
    return duplicate_time_counts(df, time_col, [id_col] if id_col else None)


def gap_time_identification(
    df: DataFrame, time_col: str, freq: str, keys: list[str] | None = None
) -> DataFrame:
    """Expected-calendar-spine timestamps missing from the data.
    Semantics: qa.py:215-250 (delegates to find_time_gaps)."""
    return find_time_gaps(df, time_col, freq, keys=keys)


def describe_exact(
    df: DataFrame,
    value_col: str,
    keys: list[str] | None = None,
    percentiles: tuple[float, ...] = (0.25, 0.5, 0.75),
) -> DataFrame:
    """Grouped summary statistics with EXACT percentiles
    (``percentile`` — linear interpolation, one sort per group inside
    the aggregate) rather than ``summary()``'s approximate sketch.
    Use for gate-checked QA numbers; prefer :func:`describe` (approx)
    when the column is huge and ±0.01% quantile error is acceptable.
    """
    pcts = ", ".join(str(p) for p in percentiles)
    v = F.col(value_col)
    aggs = [
        F.count(value_col).alias("n"),
        F.avg(v).alias("mean"),
        F.stddev_samp(v).alias("std"),
        F.min(v).alias("min"),
        F.expr(f"percentile({value_col}, array({pcts}))").alias("_q"),
        F.max(v).alias("max"),
    ]
    out = df.groupBy(*[F.col(k) for k in (keys or [])]).agg(*aggs)
    qcols = [
        F.col("_q").getItem(i).alias(f"q{int(p * 100)}")
        for i, p in enumerate(percentiles)
    ]
    return out.select(
        *(keys or []), "n", "mean", "std", "min", *qcols, "max"
    )


def describe(df: DataFrame, percentiles: list[str] | None = None) -> DataFrame:
    """Transposed summary statistics of the numeric columns
    (qa.py:252-264 wraps DataFrame.describe). Returns one row per
    input column with count/mean/stddev/min/quartiles/max."""
    stats = ["count", "mean", "stddev", "min", *(percentiles or ["25%", "50%", "75%"]), "max"]
    summary = df.summary(*stats).collect()
    num_cols = [c for c, t in df.dtypes
                if t in ("int", "bigint", "double", "float", "smallint", "tinyint")]
    rows = []
    for c in num_cols:
        row = {"column": c}
        for r in summary:
            v = r[c]
            row[r["summary"]] = float(v) if v is not None else None
        rows.append(row)
    return df.sparkSession.createDataFrame(rows)


def profile_table(df: DataFrame, cols: list[str] | None = None) -> DataFrame:
    """One-PASS data-quality profile: per column, row count, null
    count/fraction, distinct estimate, and min/max rendered as
    strings (type-agnostic). All columns' aggregates ride a single
    scan + single aggregate — profiling 500 columns of a 100 TB table
    costs one job, not 500 (``df.describe`` has the same shape but
    drops non-numerics and nulls; this is the ops-oriented variant).
    """
    cols = cols or df.columns
    aggs = [F.count(F.lit(1)).alias("_n")]
    for c in cols:
        aggs += [
            F.sum(F.col(c).isNull().cast("long")).alias(f"_null_{c}"),
            F.approx_count_distinct(c).alias(f"_dist_{c}"),
            # min/max compare in the NATIVE type (string-casting first
            # would order numerics lexicographically), rendered after
            F.min(F.col(c)).cast("string").alias(f"_min_{c}"),
            F.max(F.col(c)).cast("string").alias(f"_max_{c}"),
        ]
    row = df.agg(*aggs).first()
    n = row["_n"]
    out = [
        {
            "column": c,
            "n_rows": n,
            "n_null": row[f"_null_{c}"],
            "null_frac": (row[f"_null_{c}"] / n) if n else None,
            "approx_distinct": row[f"_dist_{c}"],
            "min_str": row[f"_min_{c}"],
            "max_str": row[f"_max_{c}"],
        }
        for c in cols
    ]
    # explicit schema: with zero rows every None field would otherwise
    # make type inference fail
    return df.sparkSession.createDataFrame(
        out,
        "column string, n_rows bigint, n_null bigint, null_frac double, "
        "approx_distinct bigint, min_str string, max_str string",
    )


def population_stability_index(
    reference: DataFrame,
    current: DataFrame,
    value_col: str,
    n_buckets: int = 10,
    round_digits: int = 6,
) -> DataFrame:
    """Distribution-drift score between two snapshots: bucket the
    CURRENT values by the REFERENCE distribution's exact quantile
    edges, compare bucket proportions, PSI = Σ (p_cur − p_ref) ·
    ln(p_cur / p_ref). The standard monitoring gate (<0.1 stable,
    >0.25 drifted) for feature/label drift between training snapshots.

    Shape: one exact-percentile aggregate on the reference (tiny edge
    list to the driver), then ONE conditional-count aggregate per
    side — no join, no sort. Zero-count buckets are floored at 1e-6
    proportion (the standard PSI regularization, keeps ln finite).
    Returns a single row (psi, n_reference, n_current).
    """
    qs = [i / n_buckets for i in range(1, n_buckets)]
    edges = reference.where(F.col(value_col).isNotNull()).agg(
        F.percentile(F.col(value_col), qs).alias("e")
    ).first()["e"]
    if edges is None:
        raise ValueError("reference has no non-null values")

    def bucket_counts(df):
        v = F.col(value_col)
        b = F.lit(0)
        for e in edges:
            b = b + (v > F.lit(float(e))).cast("int")
        return (
            df.where(v.isNotNull())
            .agg(
                F.count(F.lit(1)).alias("_n"),
                *[
                    F.sum((b == i).cast("long")).alias(f"_b{i}")
                    for i in range(n_buckets)
                ],
            )
            .first()
        )

    r, c = bucket_counts(reference), bucket_counts(current)
    floor = 1e-6
    psi = 0.0
    import math

    for i in range(n_buckets):
        p_ref = max((r[f"_b{i}"] / r["_n"]) if r["_n"] else 0.0, floor)
        p_cur = max((c[f"_b{i}"] / c["_n"]) if c["_n"] else 0.0, floor)
        psi += (p_cur - p_ref) * math.log(p_cur / p_ref)
    spark = reference.sparkSession
    return spark.createDataFrame(
        [(round(psi, round_digits), r["_n"], c["_n"])],
        "psi double, n_reference bigint, n_current bigint",
    )


def ks_statistic(
    reference: DataFrame,
    current: DataFrame,
    value_col: str,
    n_buckets: int = 10,
    round_digits: int = 6,
) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov drift statistic on a reference-
    quantile grid: D = max over the reference's decile edges of
    |F_ref(edge) - F_cur(edge)|. The companion gate to
    :func:`population_stability_index` — PSI weights proportional
    shifts, KS catches a localized CDF gap; monitoring suites run
    both.

    Same scale shape as PSI: one exact-percentile aggregate on the
    reference (edge list to the driver), then ONE conditional-count
    aggregate per side; cumulative sums and the max are integer/driver
    arithmetic. Evaluating D on the quantile grid (not every distinct
    value) keeps the cost independent of cardinality — the classical
    exact KS needs a global sorted merge of both samples, which is the
    kind of single-task global sort this engine avoids; with
    n_buckets=10 the grid statistic lower-bounds exact D and converges
    to it as the grid refines.

    Returns one row (ks, n_reference, n_current).
    """
    qs = [i / n_buckets for i in range(1, n_buckets)]
    edges = reference.where(F.col(value_col).isNotNull()).agg(
        F.percentile(F.col(value_col), qs).alias("e")
    ).first()["e"]
    if edges is None:
        raise ValueError("reference has no non-null values")

    def cum_counts(df):
        v = F.col(value_col)
        return (
            df.where(v.isNotNull())
            .agg(
                F.count(F.lit(1)).alias("_n"),
                *[
                    F.sum((v <= F.lit(float(e))).cast("long")).alias(f"_c{j}")
                    for j, e in enumerate(edges)
                ],
            )
            .first()
        )

    r, c = cum_counts(reference), cum_counts(current)
    d = 0.0
    for j in range(len(edges)):
        f_ref = r[f"_c{j}"] / r["_n"] if r["_n"] else 0.0
        f_cur = c[f"_c{j}"] / c["_n"] if c["_n"] else 0.0
        diff = abs(f_ref - f_cur)
        if diff > d:
            d = diff
    spark = reference.sparkSession
    return spark.createDataFrame(
        [(round(d, round_digits), r["_n"], c["_n"])],
        "ks double, n_reference bigint, n_current bigint",
    )


def table_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: list[str],
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """Snapshot diff between two versions of a keyed table: one row
    per key present in either version, tagged ``added`` / ``removed``
    / ``changed`` / ``unchanged`` — the audit primitive behind corpus
    version reviews ("what moved between crawl N and N+1") and
    safe-deploy checks on dimension reloads.

    Rows compare by an md5 fingerprint over ``compare_cols`` (default:
    all non-key columns, in name order), concatenated with a unit
    separator and a NULL sentinel so (NULL, 'a') never collides with
    ('a', NULL). Scale shape: fingerprints are map-side projections —
    the single shuffle is the full-outer equi-join on the key, and
    only (key, 32-byte hash) rows move, never payload columns.
    """
    if not key_cols:
        raise ValueError("key_cols must be non-empty")
    if compare_cols is None:
        skip = set(key_cols)
        compare_cols = sorted(c for c in old.columns if c not in skip)

    def fp(df: DataFrame, alias: str) -> DataFrame:
        h = F.md5(
            F.concat_ws(
                "\x1f",
                *[
                    F.coalesce(F.col(c).cast("string"), F.lit("\x00"))
                    for c in compare_cols
                ],
            )
        )
        return df.select(*key_cols, h.alias(alias))

    o, n = fp(old, "_h_old"), fp(new, "_h_new")
    j = o.join(n, key_cols, "full_outer")
    status = (
        F.when(F.col("_h_old").isNull(), F.lit("added"))
        .when(F.col("_h_new").isNull(), F.lit("removed"))
        .when(F.col("_h_old") == F.col("_h_new"), F.lit("unchanged"))
        .otherwise(F.lit("changed"))
    )
    return j.select(*key_cols, status.alias("status"))
