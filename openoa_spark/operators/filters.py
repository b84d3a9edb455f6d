"""Flagging / filtering operators — boolean-column producers.

Parity targets (behavior only): openoa/utils/filters.py:21-343. Each
operator returns the input DataFrame with an added boolean flag column
(True = suspect datapoint), composing with ``.where(~flag)`` to drop.

Scale notes:
- range/window flags are pure row expressions (codegen, zero shuffle).
- std_range computes one global aggregate then applies a row expression
  (two jobs, no per-row shuffle).
- unresponsive_flag is a per-asset ordered window — shuffles once on
  the partition keys; state is bounded by one asset's series.
- bin_filter is the groupBy-join-back pattern: aggregate per bin (tiny
  output), broadcast-join stats back onto the fact table.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def range_flag(
    col: Column | str,
    lower: float,
    upper: float,
    flag_null: bool = True,
) -> Column:
    """True where value is OUTSIDE [lower, upper].

    Semantics: filters.py:21-64 (pandas ``~between`` flags NaN too,
    hence ``flag_null`` defaults True).
    """
    c = _c(col)
    inside = (c >= lower) & (c <= upper)
    flag = ~inside
    return F.coalesce(flag, F.lit(flag_null))


def window_range_flag(
    window_col: Column | str,
    window_start: float,
    window_end: float,
    value_col: Column | str,
    value_min: float,
    value_max: float,
) -> Column:
    """True where window_col ∈ [ws, we] AND value_col ∉ [vmin, vmax].

    Semantics: filters.py:157-186 (e.g. power low while wind in
    operating range → derate/curtailment suspect).
    """
    w, v = _c(window_col), _c(value_col)
    in_window = (w >= window_start) & (w <= window_end)
    out_of_range = ~((v >= value_min) & (v <= value_max))
    return F.coalesce(in_window & out_of_range, F.lit(False))


def std_range_flag(df: DataFrame, cols: list[str], threshold: float = 2.0) -> DataFrame:
    """Flag values > threshold sample-std-devs from the column mean.

    Semantics: filters.py:112-154 (ddof=1, NaN-aware). One global
    aggregate (map-side partials) → literal scalars → row expression.
    Adds ``<col>_flag`` per input column.
    """
    stats = df.agg(
        *[F.avg(c).alias(f"{c}_mean") for c in cols],
        *[F.stddev_samp(c).alias(f"{c}_std") for c in cols],
    ).first()
    out = df
    for c in cols:
        mu, sd = stats[f"{c}_mean"], stats[f"{c}_std"]
        out = out.withColumn(
            f"{c}_flag",
            F.coalesce(F.abs(F.col(c) - F.lit(mu)) > F.lit(threshold) * F.lit(sd),
                       F.lit(False)),
        )
    return out


def unresponsive_flag(
    df: DataFrame,
    col: str,
    threshold: int = 3,
    time_col: str = "time",
    keys: list[str] | None = None,
    flag_col: str = "unresponsive_flag",
) -> DataFrame:
    """Flag every row of a run of >= ``threshold`` consecutive identical
    values (frozen-sensor detection).

    Semantics: filters.py:67-109. Run-length encoding with windows:
    change-points (value != previous) start new runs; a cumulative sum
    of change-points yields a run id; runs with count >= threshold are
    flagged in full. Two ordered windows + one small groupBy — all
    partitioned by ``keys`` so nothing global.
    """
    keys = keys or []
    part = keys or [F.lit(1)]
    w = Window.partitionBy(*part).orderBy(time_col)
    prev = F.lag(col).over(w)
    change = F.when(prev.isNull() | (F.col(col) != prev), 1).otherwise(0)
    with_run = df.withColumn("_chg", change).withColumn(
        "_run", F.sum("_chg").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    run_w = Window.partitionBy(*(part + [F.col("_run")]))
    return (
        with_run.withColumn("_runlen", F.count(F.lit(1)).over(run_w))
        .withColumn(flag_col, F.col("_runlen") >= threshold)
        .drop("_chg", "_run", "_runlen")
    )


def bin_filter(
    df: DataFrame,
    bin_col: str,
    value_col: str,
    bin_width: float,
    threshold: float | Column = 2.0,
    center_type: str = "mean",
    threshold_type: str = "std",
    direction: str = "all",
    bin_min: float | None = None,
    bin_max: float | None = None,
    flag_col: str = "bin_flag",
    keys: list[str] | None = None,
    bin_min_col: Column | None = None,
    bin_max_col: Column | None = None,
    median_strategy: str = "bracket",
    std_strategy: str = "native",
) -> DataFrame:
    """Bin ``bin_col`` into fixed-width bins; per bin compute a center
    (mean|median) and deviation (std|mad|scalar); flag values beyond
    center ± threshold·deviation (directionally).

    Semantics: filters.py:189-286. Bin edges follow np.digitize's
    default half-open [lo, hi) convention via floor((x - min)/width).
    Physical plan: per-bin aggregate (tiny — #bins rows) broadcast-
    joined back; MAD ('mad') needs a second per-bin pass (median of
    |x - median|), still bin-grain.

    ``keys`` makes binning per-group (e.g. per turbine: bin stats are
    computed within each asset, the reference idiom at
    turbine_long_term_gross_energy.py:368-378 where the filter runs in
    a per-turbine loop — here one grouped aggregate covers all).
    ``bin_min_col``/``bin_max_col`` allow per-row (per-key) domain
    bounds, e.g. fractions of each turbine's rated power.

    ``std_strategy`` picks the per-bin deviation aggregate for
    threshold_type="std": "native" (default) is F.stddev_samp —
    fastest, but its float partial-merge order varies with the
    partitioning; "sums" derives the same sample std from EXACT
    decimal sums (n, Σx, Σx²), order-independent, so flags are
    bit-stable whatever the batching — required by sim-batched
    Monte-Carlo pipelines (analysis/tie.py) that pin
    batched == per-sim equality.
    """
    from openoa_spark.functions import stats as _stats

    keys = keys or []
    x = F.col(bin_col)
    if bin_min_col is not None:
        lo_c = bin_min_col
    else:
        lo = bin_min if bin_min is not None else df.agg(F.min(bin_col)).first()[0]
        lo_c = F.lit(lo)
    hi_c = bin_max_col if bin_max_col is not None else (
        F.lit(bin_max) if bin_max is not None else None
    )
    in_domain = x >= lo_c if hi_c is None else (x >= lo_c) & (x < hi_c)
    binned = df.withColumn(
        "_bin",
        F.when(in_domain, F.floor((x - lo_c) / F.lit(bin_width))).otherwise(F.lit(None)),
    )

    gb = keys + ["_bin"]
    # Median centers/deviations go through an EXACT bounded-memory
    # grouped median — the SAME plan in both exactness modes (the old
    # split — F.median exact / approx_percentile in fast mode — let
    # bench time a plan whose boundary flags could differ from what
    # the correctness gate checks; and F.median's per-group value
    # buffer is itself the 100-TB OOM hazard). Two strategies, both
    # bit-identical to F.median: "bracket" (default — arbitrary
    # doubles, O(n/accuracy) state) and "histogram" (opt-in for
    # decimal-intent/low-cardinality value columns — ONE scan,
    # O(distinct values per bin) state; a 2-decimal money column
    # qualifies however many rows carry it).
    if median_strategy == "bracket":
        _median_tbl = _stats.grouped_exact_median
    elif median_strategy == "histogram":
        _median_tbl = _stats.grouped_exact_median_histogram
    else:
        raise ValueError(f"unknown median_strategy {median_strategy!r}")
    if center_type == "mean":
        stats = binned.groupBy(*gb).agg(F.avg(value_col).alias("_center"))
    else:
        stats = _median_tbl(binned, gb, value_col, "_center")
    if threshold_type == "std":
        if std_strategy == "native":
            devs = binned.groupBy(*gb).agg(
                F.stddev_samp(value_col).alias("_dev")
            )
        elif std_strategy == "sums":
            v = F.col(value_col)
            devs = (
                binned.groupBy(*gb)
                .agg(
                    F.count(v).cast("double").alias("_dn"),
                    F.sum(v.cast("decimal(38,12)")).cast("double").alias("_dsx"),
                    F.sum((v * v).cast("decimal(38,12)")).cast("double").alias("_dsxx"),
                )
                .select(
                    *gb,
                    F.when(
                        F.col("_dn") >= 2.0,
                        F.sqrt(
                            F.greatest(
                                F.lit(0.0),
                                (
                                    F.col("_dn") * F.col("_dsxx")
                                    - F.col("_dsx") * F.col("_dsx")
                                )
                                / (F.col("_dn") * (F.col("_dn") - 1.0)),
                            )
                        ),
                    ).alias("_dev"),
                )
            )
        else:
            raise ValueError(f"unknown std_strategy {std_strategy!r}")
        stats = stats.join(devs, gb, "inner")
    elif threshold_type == "mad":
        centered = binned.join(F.broadcast(stats), gb, "left").withColumn(
            "_absdev", F.abs(F.col(value_col) - F.col("_center"))
        )
        mads = _median_tbl(centered, gb, "_absdev", "_dev")
        stats = stats.join(mads, gb, "inner")
    elif threshold_type == "scalar":
        stats = stats.withColumn("_dev", F.lit(1.0))
    else:
        raise ValueError(f"unknown threshold_type {threshold_type}")

    joined = binned.join(F.broadcast(stats), gb, "left")
    v, ctr, dev = F.col(value_col), F.col("_center"), F.col("_dev")
    # threshold may be a per-row Column (e.g. a per-sim Monte-Carlo
    # draw when a batched analysis keys the filter by sim)
    thr = threshold if isinstance(threshold, Column) else F.lit(threshold)
    margin = thr * dev
    if direction == "all":
        flag = F.abs(v - ctr) > margin
    elif direction == "above":
        flag = v - ctr > margin
    elif direction == "below":
        flag = ctr - v > margin
    else:
        raise ValueError(f"unknown direction {direction}")
    return (
        joined.withColumn(flag_col, F.coalesce(flag, F.lit(False)))
        .drop("_bin", "_center", "_dev")
    )


def cluster_mahalanobis_2d(
    df: DataFrame,
    col1: str,
    col2: str,
    n_clusters: int = 13,
    distance_threshold: float = 3.0,
    flag_col: str = "cluster_flag",
    seed: int = 42,
    iters: int = 3,
) -> DataFrame:
    """Cluster two columns; flag points whose Mahalanobis distance
    from their cluster centroid exceeds the threshold.

    Semantics: filters.py:289-343 (the reference fits sklearn KMeans
    then scipy-mahalanobis-filters per cluster).

    ``n_clusters <= 1``: single global cluster — means/covariances
    via float covar_samp, fully SQL-expressible (oracle twin
    mahalanobis_flag_lineitem exercises this path, unchanged since
    round 3).

    ``n_clusters > 1`` (round 8): the seeded-float MLlib KMeans is
    replaced by the engine's DETERMINISTIC integer-grid Lloyd
    (datapipe/similarity.py:kmeans_fit — 1e-6-micros arithmetic,
    seeds = the ``n_clusters`` lexicographically-smallest (col1,
    col2) vectors, ties to lowest cid), and the per-cluster 2x2
    covariances are derived from EXACT integer micro-sums (decimal
    accumulation) with the closed-form inverse applied as one fixed
    double expression. Every number is a deterministic function of
    the input multiset, so an independent SQL engine replays the
    flags bit-for-bit — the registry twin mahalanobis_cluster_flag
    unrolls the same chain in DuckDB. KMeans-substitution tolerance
    vs the reference: cluster BOUNDARIES differ from sklearn's
    (different init/fit), so per-point flags near boundaries can
    differ; the micro-grid snap itself perturbs inputs by <= 5e-7
    relative. ``seed`` is accepted for API compatibility and ignored
    (the fit has no randomness); ``iters`` is the Lloyd pass count.

    Scale: assignment passes are map-only over broadcast centroid
    literals; the covariance aggregate is cluster-grain; only k x 2
    centroid ints ever reach the driver.
    """
    clean = df.where(F.col(col1).isNotNull() & F.col(col2).isNotNull())
    x, y = F.col(col1), F.col(col2)
    if n_clusters <= 1:
        # single global cluster: the whole operator is SQL-expressible
        # float aggregation — the oracle twin exercises this path
        clustered = clean.withColumn("_cluster", F.lit(0))
        cov = clustered.groupBy("_cluster").agg(
            F.avg(x).alias("_mx"),
            F.avg(y).alias("_my"),
            F.covar_samp(x, x).alias("_sxx"),
            F.covar_samp(x, y).alias("_sxy"),
            F.covar_samp(y, y).alias("_syy"),
        )
        j = clustered.join(F.broadcast(cov), "_cluster", "left")
        dx, dy = x - F.col("_mx"), y - F.col("_my")
        det = F.col("_sxx") * F.col("_syy") - F.col("_sxy") * F.col("_sxy")
        # closed-form inverse of the 2x2 covariance: [syy -sxy; -sxy sxx]/det
        d2 = (
            dx * (F.col("_syy") * dx - F.col("_sxy") * dy)
            + dy * (F.col("_sxx") * dy - F.col("_sxy") * dx)
        ) / det
        return (
            j.withColumn(
                flag_col,
                F.coalesce(F.sqrt(d2) > distance_threshold, F.lit(False)),
            )
            .drop("_cluster", "_mx", "_my", "_sxx", "_sxy", "_syy")
        )

    from openoa_spark.datapipe.similarity import (
        _argmin_cluster,
        _micros_vec,
        kmeans_fit,
    )

    based = clean.withColumn(
        "_vec", F.array(x.cast("double"), y.cast("double"))
    )
    # seed probe: k may exceed the row count (tiny inputs / the
    # empty-tables invariant) — clamp to what exists. limit+count only
    # (no sort, no row transfer); kmeans_fit collects the actual seeds
    # itself.
    k_eff = based.limit(n_clusters).count()
    if k_eff == 0:
        return clean.withColumn(flag_col, F.lit(False))
    _, centroids = kmeans_fit(
        based, "_vec", "_vec", k=k_eff, iters=iters, wide_d2=True
    )
    clustered = based.withColumn("_mic", _micros_vec("_vec")).withColumn(
        "_cluster", _argmin_cluster(F.col("_mic"), centroids, wide=True)
    )
    # per-cluster 2x2 covariance from EXACT integer micro-sums
    # (factors decimal-cast BEFORE the multiply so nothing overflows
    # bigint); the double-space combination below is one fixed IEEE
    # expression, bit-replayable by the SQL twin
    mx_i, my_i = F.col("_mic")[0], F.col("_mic")[1]
    d19 = "decimal(19,0)"
    cov = clustered.groupBy("_cluster").agg(
        F.count(F.lit(1)).cast("double").alias("_cn"),
        F.sum(mx_i.cast("decimal(38,0)")).cast("double").alias("_tx"),
        F.sum(my_i.cast("decimal(38,0)")).cast("double").alias("_ty"),
        F.sum(mx_i.cast(d19) * mx_i.cast(d19)).cast("double").alias("_txx"),
        F.sum(mx_i.cast(d19) * my_i.cast(d19)).cast("double").alias("_txy"),
        F.sum(my_i.cast(d19) * my_i.cast(d19)).cast("double").alias("_tyy"),
    )
    n = F.col("_cn")
    cov = cov.select(
        "_cluster", "_cn",
        ((F.col("_txx") - F.col("_tx") * F.col("_tx") / n) / (n - 1.0)).alias("_sxx"),
        ((F.col("_txy") - F.col("_tx") * F.col("_ty") / n) / (n - 1.0)).alias("_sxy"),
        ((F.col("_tyy") - F.col("_ty") * F.col("_ty") / n) / (n - 1.0)).alias("_syy"),
    )
    j = clustered.join(F.broadcast(cov), "_cluster", "left")
    # distance from the fitted CENTROID (what the reference measures:
    # kmeans.cluster_centers_, filters.py:326), not the final-label
    # mean — the two differ whenever the last assignment pass moved a
    # point, and that drift is exactly the seam residue that could
    # flip threshold-adjacent flags vs the reference. dx/dy are exact
    # integer micro differences; the covariance stays MEAN-centered
    # (cluster.cov() in the reference).
    cx = F.element_at(
        F.array(*[F.lit(int(c[0])) for c in centroids]), F.col("_cluster") + 1
    )
    cy = F.element_at(
        F.array(*[F.lit(int(c[1])) for c in centroids]), F.col("_cluster") + 1
    )
    dx = (mx_i - cx).cast("double")
    dy = (my_i - cy).cast("double")
    det = F.col("_sxx") * F.col("_syy") - F.col("_sxy") * F.col("_sxy")
    d2 = (
        dx * (F.col("_syy") * dx - F.col("_sxy") * dy)
        + dy * (F.col("_sxx") * dy - F.col("_sxy") * dx)
    ) / det
    flag = F.when(
        (F.col("_cn") >= 2.0) & (det != 0.0),
        F.sqrt(d2) > distance_threshold,
    )
    return (
        j.withColumn(flag_col, F.coalesce(flag, F.lit(False)))
        .drop(
            "_vec", "_mic", "_cluster", "_cn",
            "_sxx", "_sxy", "_syy",
        )
    )


def hampel_flag(
    df: DataFrame,
    value_col: str,
    time_col: str,
    keys: list[str] | None = None,
    order_cols: list[str] | None = None,
    window: int = 5,
    k: float = 3.0,
) -> DataFrame:
    """Hampel despiking filter — the standard SCADA spike detector the
    rolling-MEAN z-score cannot replicate (a spike inflates the mean
    and its own std, masking itself; the rolling MEDIAN ± scaled
    rolling MAD is robust to it): flag rows where
    |x − med| > k · 1.4826 · MAD over a trailing ``window``-row frame.

    Two chained keyed windows with EXACT interpolated percentiles
    (Spark's windowed ``percentile``): pass one computes each row's
    trailing median, pass two the trailing median of the absolute
    deviations — one shuffle on ``keys`` total, both windows reuse the
    same sort. Per-row frame cost is O(window), bounded by the
    parameter, not the data.

    Adds columns ``_roll_med``, ``_roll_mad``, ``<value_col>_flag``.
    """
    from pyspark.sql import Window as W

    keys = keys or []
    order = order_cols or [time_col]
    if not keys:
        raise ValueError(
            "hampel_flag needs partition keys (a keyless ordered window "
            "funnels the table through one task)"
        )
    clobber = {"_roll_med", "_roll_mad", f"{value_col}_flag"} & set(
        df.columns
    )
    if clobber:
        raise ValueError(
            f"hampel_flag output columns already exist: {sorted(clobber)}"
        )
    dev = "_dev"
    while dev in df.columns:
        dev += "_"
    frame = (
        W.partitionBy(*keys).orderBy(*order).rowsBetween(-(window - 1), 0)
    )
    v = F.col(value_col)
    out = df.withColumn(
        "_roll_med", F.percentile(v, F.lit(0.5)).over(frame)
    )
    out = out.withColumn(dev, F.abs(v - F.col("_roll_med")))
    out = out.withColumn(
        "_roll_mad", F.percentile(F.col(dev), F.lit(0.5)).over(frame)
    )
    return out.withColumn(
        f"{value_col}_flag",
        F.col(dev) > F.lit(k) * F.lit(1.4826) * F.col("_roll_mad"),
    ).drop(dev)
