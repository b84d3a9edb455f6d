"""Plot-data builders: the data-producing half of every reference
plot surface (``openoa/utils/plot.py:1-1628`` plus the analysis-class
plot methods), engine-side.

Design: a chart renders at most a few thousand marks, so every
function here reduces the (possibly 100-TB) input to a DRIVER-SIZED
pandas frame with Spark doing the heavy lifting — deterministic hash
downsampling for scatters, hash-aggregate binning for histograms and
curves, bucket-grain aggregates for timeseries. The matplotlib
rendering itself (axes, colors, styling — reference plot.py's other
half) is intentionally thin and optional: ``render_*`` helpers work
when matplotlib is importable and raise a clear error here (the
container has no matplotlib), so the TESTED surface is the data
contract. PLOTTING.md maps each reference plot function to its
builder.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

from openoa_spark.operators.power_curve import iec_binned_curve


def _mpl():
    try:
        import matplotlib.pyplot as plt  # noqa: PLC0415
    except ImportError as e:  # pragma: no cover - env without matplotlib
        raise ImportError(
            "matplotlib is not installed in this environment; use the "
            "*_plot_data builders and render with your own plotting stack"
        ) from e
    return plt


# ------------------------------------------------------------------ windfarm


def windfarm_plot_data(asset: DataFrame) -> pd.DataFrame:
    """plot_windfarm (ref plot.py:161-290): asset map marks. Returns
    one row per asset: id, lat/lon, true-UTM planar x/y (engine
    Krüger projection — same map math the reference gets from pyproj),
    and type. Asset tables are dimension-sized; the collect is the
    chart's own cardinality."""
    from openoa_spark.operators.geometry import utm_from_latlon

    cols = [c for c in ("asset_id", "latitude", "longitude", "type")
            if c in asset.columns]
    return (
        utm_from_latlon(asset.select(*cols), "latitude", "longitude")
        .toPandas()
    )


# --------------------------------------------------------------- power curve


def power_curve_plot_data(
    df: DataFrame,
    ws_col: str,
    power_col: str,
    keys: list[str] | None = None,
    bin_width: float = 0.5,
    max_points: int = 5000,
    flag_col: str | None = None,
) -> dict[str, pd.DataFrame]:
    """plot_power_curve / plot_power_curves (ref plot.py:433,984) and
    TIE's plot_filtered_power_curves (turbine_long_term_gross_energy
    .py:567): scatter + fitted-curve layers.

    - ``scatter``: a DETERMINISTIC hash downsample capped at
      ``max_points`` rows total (xxhash64 of ws⊕power — stable across
      runs and partitionings, no full-table sort). When ``flag_col``
      is given the budget is split equally across its values and each
      stratum gets its own keep fraction, so a rare stratum (typically
      the filtered outliers the plot exists to show) can never sample
      to zero rows.
    - ``curve``: the exact IEC binned mean curve per key (bin-grain
      aggregate, driver-sized by construction).
    """
    keys = keys or []
    sel = [*keys, ws_col, power_col] + ([flag_col] if flag_col else [])
    base = df.select(*sel).where(
        F.col(ws_col).isNotNull() & F.col(power_col).isNotNull()
    )
    strata = [flag_col] if flag_col else []
    if flag_col:
        # one flag-grain aggregate supplies BOTH the total row count
        # and the per-stratum budgets (a separate base.count() would
        # re-scan the table for a number this collect already holds)
        counts = {
            r[0]: r[1]
            for r in base.groupBy(flag_col)
            .agg(F.count(F.lit(1)).alias("_n"))
            .collect()
        }
        n = sum(counts.values())
    else:
        n = base.count()
    if n > max_points:
        h = F.abs(
            F.xxhash64(F.col(ws_col), F.col(power_col), *map(F.col, keys))
        )
        if flag_col:
            # per-stratum budgets by waterfill: start from an equal
            # split, but when a stratum is smaller than its share
            # (e.g. 50 flagged rows vs millions kept) its unused
            # budget is redistributed to the strata that can absorb
            # it — so the plot returns ~max_points rows, not
            # max_points/len(counts) per saturated stratum
            budget = {v: float(cnt) for v, cnt in counts.items()}
            remaining, open_strata = float(max_points), dict(counts)
            while open_strata:
                per = remaining / len(open_strata)
                small = {v: c for v, c in open_strata.items() if c <= per}
                if not small:
                    budget.update({v: per for v in open_strata})
                    break
                for v, c in small.items():
                    budget[v] = float(c)
                    remaining -= c
                    del open_strata[v]
            keep = None
            for v, cnt in counts.items():
                frac = min(1.0, budget[v] / cnt)
                cond = F.col(flag_col).eqNullSafe(F.lit(v)) & (
                    h % 1_000_000 < int(frac * 1_000_000) + 1
                )
                keep = cond if keep is None else (keep | cond)
            base = base.where(keep)
        else:
            # single global hash threshold: keep ~max_points rows
            frac = max_points / n
            base = base.where(h % 1_000_000 < int(frac * 1_000_000) + 1)
    scatter = base.toPandas()
    curve = iec_binned_curve(
        df, ws_col, power_col, bin_width=bin_width, keys=keys + strata
    ).toPandas().sort_values([*keys, *strata, "ws_bin"]).reset_index(drop=True)
    return {"scatter": scatter, "curve": curve}


# ---------------------------------------------------------------- histograms


def column_histograms_data(
    df: DataFrame, columns: list[str], bins: int = 30
) -> pd.DataFrame:
    """column_histograms (ref plot.py:394-430): per-column equal-width
    histograms as ONE long frame (column, bin_left, bin_right, count).
    One min/max aggregate + one unpivoted hash aggregate — never
    collects raw values."""
    bounds = df.agg(
        *[F.min(c).alias(f"lo_{c}") for c in columns],
        *[F.max(c).alias(f"hi_{c}") for c in columns],
    ).first()
    frames = []
    for c in columns:
        lo, hi = float(bounds[f"lo_{c}"]), float(bounds[f"hi_{c}"])
        width = (hi - lo) / bins or 1.0
        b = F.least(
            F.floor((F.col(c) - F.lit(lo)) / F.lit(width)), F.lit(bins - 1)
        )
        h = (
            df.where(F.col(c).isNotNull())
            .groupBy(b.alias("bin"))
            .agg(F.count(F.lit(1)).alias("count"))
            .toPandas()
        )
        h["column"] = c
        h["bin_left"] = lo + h["bin"] * width
        h["bin_right"] = h["bin_left"] + width
        frames.append(h[["column", "bin_left", "bin_right", "count"]])
    return pd.concat(frames, ignore_index=True)


# ------------------------------------------------------------- distributions


def distribution_plot_data(
    samples: np.ndarray | pd.Series | list, n_bins: int = 30
) -> pd.DataFrame:
    """plot_distributions / plot_result_aep_distributions (ref
    plot.py:668, aep.py:1413): histogram of a Monte-Carlo sample
    vector (already driver-sized — per-sim scalars)."""
    x = np.asarray(samples, dtype=float)
    x = x[~np.isnan(x)]
    counts, edges = np.histogram(x, bins=n_bins)
    return pd.DataFrame({
        "bin_left": edges[:-1], "bin_right": edges[1:], "count": counts,
    })


def boxplot_stats(
    samples: np.ndarray | pd.Series | list,
) -> dict[str, float]:
    """plot_boxplot / plot_aep_boxplot (ref plot.py:812, aep.py:1468):
    the five-number summary + whiskers (1.5 IQR, matplotlib's
    convention) the box renders from."""
    x = np.asarray(samples, dtype=float)
    x = x[~np.isnan(x)]
    q1, med, q3 = (float(np.percentile(x, p)) for p in (25, 50, 75))
    iqr = q3 - q1
    lo_w = float(x[x >= q1 - 1.5 * iqr].min())
    hi_w = float(x[x <= q3 + 1.5 * iqr].max())
    return {
        "q1": q1, "median": med, "q3": q3,
        "whisker_low": lo_w, "whisker_high": hi_w,
        "mean": float(x.mean()), "n": int(len(x)),
    }


# ----------------------------------------------------------------- waterfall


def waterfall_plot_data(
    values: list[float], labels: list[str]
) -> pd.DataFrame:
    """plot_waterfall (ref plot.py:896-981, eya_gap_analysis.py:180):
    cumulative bar geometry for a waterfall — first and last bars are
    levels, the middle bars float at the running total. Input is
    EYAGapAnalysis.compile_data()'s list."""
    if len(values) != len(labels):
        raise ValueError("values and labels must align")
    bottoms, heights = [], []
    running = 0.0
    for i, v in enumerate(values):
        if i == 0 or i == len(values) - 1:
            bottoms.append(0.0)
            heights.append(v if i == 0 else running)
            running = v if i == 0 else running
        else:
            new = running + v
            bottoms.append(min(running, new))
            heights.append(abs(v))
            running = new
    return pd.DataFrame({
        "label": labels, "value": values,
        "bottom": bottoms, "height": heights,
    })


# --------------------------------------------------------------- timeseries


def monthly_windspeed_plot_data(
    reanalysis: DataFrame, time_col: str, ws_col: str
) -> pd.DataFrame:
    """plot_monthly_reanalysis_windspeed (ref plot.py:509) and AEP's
    plot_normalized_monthly_reanalysis_windspeed (aep.py:1197): one
    row per (year, month) with the monthly mean wind speed and its
    value normalized by that calendar month's all-years mean — a
    bucket-grain aggregate, collected at chart size."""
    monthly = (
        reanalysis.groupBy(
            F.year(time_col).alias("year"), F.month(time_col).alias("month")
        )
        .agg(F.avg(ws_col).alias("ws"))
        .toPandas()
        .sort_values(["year", "month"])
        .reset_index(drop=True)
    )
    clim = monthly.groupby("month")["ws"].transform("mean")
    monthly["ws_norm"] = monthly["ws"] / clim
    return monthly


def energy_losses_timeseries_plot_data(aggregate: pd.DataFrame) -> pd.DataFrame:
    """plot_plant_energy_losses_timeseries (ref plot.py:594) and AEP's
    plot_aggregate_plant_data_timeseries (aep.py:1360): tidy (period,
    series, value) long frame from the MonteCarloAEP aggregate (one
    row per month/day — already driver-sized)."""
    cols = [c for c in ("energy_gwh", "gross_energy_gwh",
                        "availability_pct", "curtailment_pct")
            if c in aggregate.columns]
    out = aggregate.reset_index()[[aggregate.index.name or "index", *cols]]
    out = out.rename(columns={aggregate.index.name or "index": "period"})
    return out.melt(id_vars="period", var_name="series", value_name="value")


def monthly_losses_plot_data(
    scada_monthly: pd.Series, meter_monthly: pd.Series
) -> pd.DataFrame:
    """ElectricalLosses.plot_monthly_losses (electrical_losses.py:332):
    per-month loss fraction from the two monthly energy series."""
    df = pd.DataFrame({"scada": scada_monthly, "meter": meter_monthly})
    df["loss"] = 1.0 - df["meter"] / df["scada"]
    return df.reset_index()


# -------------------------------------------------------------- wake losses


def wake_losses_plot_data(result, kind: str = "wd") -> pd.DataFrame:
    """WakeLosses.plot_wake_losses_by_wind_direction / _by_wind_speed
    (wake_losses.py:1319,1411; utils plot.py:1081): per-bin mean and
    MC std of the POR and long-term wake-loss arrays from a
    WakeLossesResult (num_sim × n_bins — per-sim scalars, driver-
    sized)."""
    if kind == "wd":
        por, lt = result.wake_losses_por_wd, result.wake_losses_lt_wd
    elif kind == "ws":
        por, lt = result.wake_losses_por_ws, result.wake_losses_lt_ws
    else:
        raise ValueError("kind must be 'wd' or 'ws'")
    por = np.atleast_2d(np.asarray(por, dtype=float))
    lt = np.atleast_2d(np.asarray(lt, dtype=float))
    return pd.DataFrame({
        "bin": np.arange(por.shape[1]),
        "por_mean": np.nanmean(por, axis=0),
        "por_std": np.nanstd(por, axis=0),
        "lt_mean": np.nanmean(lt, axis=0),
        "lt_std": np.nanstd(lt, axis=0),
    })


# ------------------------------------------------------------------- render
#
# The render halves of every mapped reference plot (PLOTTING.md).
# Contract: each renderer consumes ONLY its builder's driver-sized
# output and an optional axes object. matplotlib is imported lazily
# and ONLY when no axes is supplied, so (a) the container without
# matplotlib can still test every renderer end-to-end by injecting a
# recording fake, and (b) in a real deployment `render_x(build_x(df))`
# produces the reference figure. Reference: openoa/utils/plot.py and
# the per-analysis .plot_* methods (lines cited per function).


def _ax(ax):
    if ax is not None:
        return ax
    return _mpl().gca()  # pragma: no cover - no matplotlib here


def _axes_grid(n: int, axes=None):
    """Return a flat list of n axes — the supplied ones (validated)
    or a fresh matplotlib grid."""
    if axes is not None:
        axes = list(axes)
        if len(axes) < n:
            raise ValueError(f"need {n} axes, got {len(axes)}")
        return axes[:n]
    plt = _mpl()  # pragma: no cover - no matplotlib here
    ncols = min(n, 3)  # pragma: no cover
    nrows = -(-n // ncols)  # pragma: no cover
    _, axs = plt.subplots(nrows, ncols, squeeze=False)  # pragma: no cover
    return [a for row in axs for a in row][:n]  # pragma: no cover


def render_power_curve(data: dict[str, pd.DataFrame], ax=None,
                       ws_col: str | None = None,
                       power_col: str | None = None,
                       flag_col: str | None = None):
    """plot_power_curve (ref plot.py:433): hash-capped scatter + the
    exact IEC binned curve. With ``flag_col``, kept and flagged marks
    render as separate series (the filtered-outlier overlay of TIE's
    plot_filtered_power_curves, tie:567)."""
    ax = _ax(ax)
    sc, curve = data["scatter"], data["curve"]
    if ws_col is None or power_col is None:
        non_flag = [c for c in sc.columns if c != flag_col]
        ws_col, power_col = non_flag[-2], non_flag[-1]
    if flag_col and flag_col in sc.columns:
        for val, sub in sc.groupby(flag_col, sort=True):
            ax.scatter(sub[ws_col], sub[power_col], s=4, alpha=0.3,
                       label=f"{flag_col}={val}")
        ax.legend()
    else:
        ax.scatter(sc[ws_col], sc[power_col], s=4, alpha=0.3)
    key_cols = [c for c in curve.columns
                if c not in ("ws_bin", "mean_power", "n")]
    if key_cols:
        for key, sub in curve.groupby(key_cols, sort=True):
            ax.plot(sub["ws_bin"], sub["mean_power"], label=str(key))
    else:
        ax.plot(curve["ws_bin"], curve["mean_power"])
    ax.set_xlabel("wind speed (m/s)")
    ax.set_ylabel("power (kW)")
    return ax


def render_windfarm(data: pd.DataFrame, ax=None, annotate: bool = True):
    """plot_windfarm (ref plot.py:161-290): planar asset map — one
    scatter series per asset type, ids annotated."""
    ax = _ax(ax)
    for typ, sub in data.groupby("type", sort=True):
        ax.scatter(sub["x_m"], sub["y_m"], label=str(typ))
    if annotate:
        for _, r in data.iterrows():
            ax.annotate(str(r["asset_id"]), (r["x_m"], r["y_m"]))
    ax.set_xlabel("easting (m)")
    ax.set_ylabel("northing (m)")
    ax.set_aspect("equal")
    ax.legend()
    return ax


def render_by_id(data: pd.DataFrame, id_col: str, time_col: str,
                 value_col: str, axes=None):
    """plot_by_id (ref plot.py:293-391): one timeseries panel per
    asset from a long (id, time, value) frame (the keyed bucket
    aggregate the registry's resample queries produce)."""
    ids = sorted(data[id_col].unique())
    axs = _axes_grid(len(ids), axes)
    for ax, i in zip(axs, ids):
        sub = data[data[id_col] == i].sort_values(time_col)
        ax.plot(sub[time_col], sub[value_col])
        ax.set_title(str(i))
        ax.set_ylabel(value_col)
    return axs


def render_column_histograms(data: pd.DataFrame, axes=None):
    """column_histograms (ref plot.py:394-430): one bar panel per
    column from the long (column, bin_left, bin_right, count)
    frame."""
    cols = sorted(data["column"].unique())
    axs = _axes_grid(len(cols), axes)
    for ax, c in zip(axs, cols):
        sub = data[data["column"] == c]
        ax.bar(sub["bin_left"], sub["count"],
               width=(sub["bin_right"] - sub["bin_left"]),
               align="edge")
        ax.set_title(c)
        ax.set_ylabel("count")
    return axs


def render_distribution(data: pd.DataFrame, ax=None,
                        xlabel: str = "value"):
    """plot_distributions / plot_result_aep_distributions (ref
    plot.py:668, aep.py:1413): histogram bars of the per-sim
    scalars."""
    ax = _ax(ax)
    ax.bar(data["bin_left"], data["count"],
           width=(data["bin_right"] - data["bin_left"]), align="edge")
    ax.set_xlabel(xlabel)
    ax.set_ylabel("count")
    return ax


def render_boxplot(stats: dict[str, float], ax=None,
                   label: str = ""):
    """plot_boxplot / plot_aep_boxplot (ref plot.py:812,
    aep.py:1468): feed the precomputed five-number summary straight
    into Axes.bxp (no raw data needed — the renderer never recomputes
    statistics)."""
    ax = _ax(ax)
    ax.bxp(
        [
            {
                "med": stats["median"], "q1": stats["q1"],
                "q3": stats["q3"], "whislo": stats["whisker_low"],
                "whishi": stats["whisker_high"], "mean": stats["mean"],
                "label": label, "fliers": [],
            }
        ],
        showmeans=True, showfliers=False,
    )
    return ax


def render_waterfall(data: pd.DataFrame, ax=None):
    """plot_waterfall (ref plot.py:896-981, eya_gap_analysis.py:180):
    floating bars at the builder's cumulative geometry + running-total
    connector steps."""
    ax = _ax(ax)
    x = np.arange(len(data))
    ax.bar(x, data["height"], bottom=data["bottom"])
    run = [float(data["value"].iloc[0])]
    for v in data["value"].iloc[1:-1]:
        run.append(run[-1] + float(v))
    for i, lvl in enumerate(run):
        ax.plot([i - 0.4, i + 1.4], [lvl, lvl])
    ax.set_xticks(x, [str(s) for s in data["label"]])
    return ax


def render_monthly_windspeed(data: pd.DataFrame, ax=None,
                             normalized: bool = False):
    """plot_monthly_reanalysis_windspeed (ref plot.py:509) /
    AEP.plot_normalized_monthly_reanalysis_windspeed (aep.py:1197):
    one line per year across calendar months; ``normalized`` switches
    to the climatology-normalized series."""
    ax = _ax(ax)
    col = "ws_norm" if normalized else "ws"
    for year, sub in data.groupby("year", sort=True):
        sub = sub.sort_values("month")
        ax.plot(sub["month"], sub[col], label=str(year))
    ax.set_xlabel("month")
    ax.set_ylabel("normalized wind speed" if normalized
                  else "wind speed (m/s)")
    ax.legend()
    return ax


def render_energy_losses_timeseries(data: pd.DataFrame, axes=None):
    """plot_plant_energy_losses_timeseries (ref plot.py:594) /
    AEP.plot_aggregate_plant_data_timeseries (aep.py:1360): one panel
    per series from the tidy (period, series, value) frame."""
    series = sorted(data["series"].unique())
    axs = _axes_grid(len(series), axes)
    for ax, s in zip(axs, series):
        sub = data[data["series"] == s].sort_values("period")
        ax.plot(sub["period"], sub["value"])
        ax.set_title(s)
    return axs


def render_monthly_losses(data: pd.DataFrame, ax=None):
    """ElectricalLosses.plot_monthly_losses (electrical_losses.py:332):
    per-month loss fraction line over the scada/meter series."""
    ax = _ax(ax)
    period_col = data.columns[0]
    ax.plot(data[period_col], data["loss"], marker="o")
    ax.set_ylabel("loss fraction")
    return ax


def render_wake_losses(data: pd.DataFrame, ax=None,
                       xlabel: str = "wind direction bin"):
    """WakeLosses.plot_wake_losses_by_wind_direction / _by_wind_speed
    (wake_losses.py:1319,1411; utils plot.py:1081): POR and long-term
    mean lines with ±1 MC-std bands."""
    ax = _ax(ax)
    for prefix, label in (("por", "period of record"),
                          ("lt", "long-term corrected")):
        m, s = data[f"{prefix}_mean"], data[f"{prefix}_std"]
        ax.plot(data["bin"], m, label=label)
        ax.fill_between(data["bin"], m - s, m + s, alpha=0.2)
    ax.set_xlabel(xlabel)
    ax.set_ylabel("wake losses")
    ax.legend()
    return ax


def render_yaw_misalignment(points: pd.DataFrame, params, mean_vane,
                            ax=None,
                            vane_col: str = "vane_bin",
                            power_col: str = "power"):
    """StaticYawMisalignment.plot_yaw_misalignment[_by_turbine]
    (yaw.py:585; utils plot.py:1329): per-vane-bin normalized power
    points, the fitted cosine-exponent curve, and the two vertical
    markers (curve peak vs mean vane angle) whose gap IS the
    misalignment estimate."""
    from openoa_spark.functions.regression import cos_curve

    ax = _ax(ax)
    amp, offset, cos_exp = (float(p) for p in params)
    ax.scatter(points[vane_col], points[power_col], s=10)
    grid = np.linspace(float(points[vane_col].min()),
                       float(points[vane_col].max()), 100)
    ax.plot(grid, cos_curve(grid, amp, offset, cos_exp))
    ax.axvline(offset, linestyle="--")
    ax.axvline(float(mean_vane), linestyle=":")
    ax.set_xlabel("vane angle (deg)")
    ax.set_ylabel("normalized power")
    return ax


def render_daylight_savings(data: pd.DataFrame, time_col: str,
                            power_col: str, axes=None):
    """qa.daylight_savings_plot (ref qa.py:266-466), render half: one
    panel per (year, transition) window of power against the raw
    timestamps — duplicated/missing stamps around the shift show as
    overplots/gaps."""
    groups = sorted(
        {(int(y), str(t)) for y, t in zip(data["year"], data["transition"])}
    )
    axs = _axes_grid(len(groups), axes)
    for ax, (year, trans) in zip(axs, groups):
        sub = data[(data["year"] == year) & (data["transition"] == trans)]
        sub = sub.sort_values(time_col)
        ax.plot(sub[time_col], sub[power_col], marker=".")
        ax.set_title(f"{year} {trans}")
    return axs


def render_wtk_diurnal(data: pd.DataFrame, ax=None):
    """qa.wtk_diurnal_plot (ref qa.py:556-618): the two self-normalized
    hour-of-day profiles (WTK wind speed vs plant power) on one
    axes."""
    ax = _ax(ax)
    sub = data.sort_values("hour")
    ax.plot(sub["hour"], sub["ws_norm"], label="WTK wind speed")
    ax.plot(sub["hour"], sub["power_norm"], label="plant power")
    ax.set_xlabel("hour of day")
    ax.set_ylabel("normalized mean")
    ax.legend()
    return ax


# ------------------------------------------------------------------ qa plots


def daylight_savings_plot_data(
    df: DataFrame,
    time_col: str,
    power_col: str,
    id_col: str,
    local_tz: str,
    hour_window: int = 3,
) -> pd.DataFrame:
    """daylight_savings_plot (ref qa.py:266-466), data half: for ONE
    representative turbine, the rows inside ±``hour_window`` hours of
    every DST offset transition, labeled (year, 'spring'|'fall'), with
    raw / UTC / localized timestamps and power — exactly the marks the
    reference's per-year two-panel figure draws to expose duplicated
    or missing stamps around the shifts.

    Scale shape: annotate offsets (map-only via convert_datetime
    _column), find transition instants with one keyed lag window on
    the single turbine's rows, collect the (tiny, ~2/year) transition
    list, then ONE pushed-down time-range filter gathers the window
    rows — the collect is bounded by transitions × window × frequency.
    """
    from pyspark.sql import Window

    from openoa_spark.operators import qa

    first_id = df.select(F.min(id_col).alias("i")).first()["i"]
    sub = df.where(F.col(id_col) == first_id)
    ann = qa.convert_datetime_column(sub, time_col, local_tz)
    utc_col = f"{time_col}_utc"

    w = Window.orderBy(utc_col)  # single turbine; bounded by plant POR
    trans = (
        ann.select(utc_col, "utc_offset")
        .withColumn("_prev", F.lag("utc_offset").over(w))
        .where(F.col("_prev").isNotNull() & (F.col("utc_offset") != F.col("_prev")))
        .select(
            F.col(utc_col).alias("t"),
            F.when(F.col("utc_offset") > F.col("_prev"), "spring")
            .otherwise("fall").alias("transition"),
        )
        .collect()
    )
    if not trans:
        return pd.DataFrame(
            columns=["year", "transition", time_col, utc_col,
                     f"{time_col}_localized", power_col]
        )
    wsec = hour_window * 3600
    cond = None
    for r in trans:
        c = F.col(utc_col).between(
            F.timestamp_seconds(F.unix_timestamp(F.lit(r["t"])) - wsec),
            F.timestamp_seconds(F.unix_timestamp(F.lit(r["t"])) + wsec),
        )
        cond = c if cond is None else (cond | c)
    out = ann.where(cond).select(
        time_col, utc_col, f"{time_col}_localized", power_col, "is_dst"
    ).toPandas()
    # label each row with its nearest transition
    t_arr = np.array([r["t"] for r in trans], dtype="datetime64[us]")
    labels = np.array([r["transition"] for r in trans])
    idx = np.argmin(
        np.abs(out[utc_col].to_numpy(dtype="datetime64[us]")[:, None] - t_arr),
        axis=1,
    )
    out.insert(0, "transition", labels[idx])
    out.insert(0, "year", pd.DatetimeIndex(out[utc_col]).year)
    return out.sort_values(utc_col).reset_index(drop=True)
