"""Power-curve operators: binned IEC curve + parametric logistic fits.

Parity targets (behavior only): openoa/utils/power_curve/
functions.py:19-200, parametric_forms.py:22-112.

Design: binning/aggregation runs distributed; curve *fitting* operates
on the tiny binned table (≤ a few hundred rows) driver-side with scipy
when available (closed-form/IEC paths need no scipy); *application* of
a fitted curve is a pure Column expression or a broadcast lookup —
never a per-row Python call.
"""

from __future__ import annotations

import bisect

from pyspark.sql import Column, DataFrame, functions as F

from openoa_spark.functions.stats import davg


def iec_binned_curve(
    df: DataFrame,
    ws_col: str,
    power_col: str,
    bin_width: float = 0.5,
    ws_min: float = 0.0,
    ws_max: float = 30.0,
    keys: list[str] | None = None,
) -> DataFrame:
    """IEC 61400-12-1 mean power curve: bin wind speed into
    ``bin_width`` bins (centers at bin_width·(i+0.5)), mean power per
    bin. Semantics: power_curve/functions.py:19-73.

    Returns (ws_bin_center, mean_power, n) — #bins rows. ``keys``
    fits one curve PER KEY GROUP (e.g. per turbine) in the same
    single hash aggregate — a fleet of curves costs exactly one more
    grouping column, not one job per turbine.
    """
    ws = F.col(ws_col)
    keys = keys or []
    in_range = (ws >= ws_min) & (ws < ws_max)
    binned = df.where(in_range & ws.isNotNull() & F.col(power_col).isNotNull())
    b = F.floor((ws - F.lit(ws_min)) / F.lit(bin_width))
    return (
        binned.groupBy(*keys, b.alias("_b"))
        .agg(davg(power_col).alias("mean_power"), F.count(power_col).alias("n"))
        .select(
            *keys,
            (F.lit(ws_min) + (F.col("_b") + 0.5) * F.lit(bin_width)).alias("ws_bin"),
            "mean_power",
            "n",
        )
    )


class BinnedCurve:
    """A fitted binned curve: piecewise-linear interpolation over bin
    centers, applied either driver-side or as a broadcast expression.

    Mirrors the closure returned by the reference's ``IEC`` fit
    (power_curve/functions.py:64-72).
    """

    def __init__(self, centers: list[float], values: list[float]):
        pairs = sorted(zip(centers, values))
        self.xs = [p[0] for p in pairs]
        self.ys = [p[1] for p in pairs]

    @classmethod
    def fit(cls, df: DataFrame, ws_col: str, power_col: str, **kw) -> "BinnedCurve":
        rows = iec_binned_curve(df, ws_col, power_col, **kw).collect()
        return cls([r["ws_bin"] for r in rows], [r["mean_power"] for r in rows])

    def __call__(self, x: float) -> float:
        xs, ys = self.xs, self.ys
        if not xs:
            return float("nan")
        if x <= xs[0]:
            return ys[0]
        if x >= xs[-1]:
            return ys[-1]
        i = bisect.bisect_right(xs, x)
        x0, x1, y0, y1 = xs[i - 1], xs[i], ys[i - 1], ys[i]
        return y0 + (y1 - y0) * (x - x0) / (x1 - x0)

    def expr(self, ws: Column | str) -> Column:
        """Vectorized application as a Catalyst expression: the curve
        table is folded into a literal array + ``width_bucket``-style
        interpolation — stays in codegen, broadcast-free."""
        c = F.col(ws) if isinstance(ws, str) else ws
        xs = F.array(*[F.lit(float(v)) for v in self.xs])
        ys = F.array(*[F.lit(float(v)) for v in self.ys])
        n = len(self.xs)
        idx = F.aggregate(
            xs, F.lit(0), lambda acc, x: F.when(c >= x, acc + 1).otherwise(acc)
        )
        lo = F.greatest(idx - 1, F.lit(0))
        hi = F.least(idx, F.lit(n - 1))
        # element_at is 1-based
        x0 = F.element_at(xs, lo + 1)
        x1 = F.element_at(xs, hi + 1)
        y0 = F.element_at(ys, lo + 1)
        y1 = F.element_at(ys, hi + 1)
        frac = F.when(x1 != x0, (c - x0) / (x1 - x0)).otherwise(F.lit(0.0))
        inner = y0 + (y1 - y0) * frac
        return (
            F.when(c <= F.lit(self.xs[0]), F.lit(self.ys[0]))
            .when(c >= F.lit(self.xs[-1]), F.lit(self.ys[-1]))
            .otherwise(inner)
        )


def logistic5_expr(ws: Column | str, a: float, b: float, c: float, d: float, g: float) -> Column:
    """5-parameter logistic power curve
    d + (a - d) / (1 + (x/c)^b)^g — applied as a pure expression.
    Semantics: power_curve/parametric_forms.py:22-68, including the
    b<0, x==0 singularity (0^b diverges there; the curve's limit — and
    the reference's explicit branch — is the ``d`` asymptote, which
    for the reference's fitted b<0 curves is the near-zero low-wind
    value, its fit bounds placing a at rated power).
    """
    x = F.col(ws) if isinstance(ws, str) else ws
    curve = F.lit(d) + (F.lit(a) - F.lit(d)) / F.pow(
        F.lit(1.0) + F.pow(x / F.lit(c), F.lit(b)), F.lit(g)
    )
    if b < 0:
        return F.when(x == 0.0, F.lit(float(d))).otherwise(curve)
    return curve


def logistic5_capped_expr(
    ws: Column | str,
    a: float,
    b: float,
    c: float,
    d: float,
    g: float,
    lower: float,
    upper: float,
) -> Column:
    """Capped 5-param logistic curve: the logistic value clipped into
    [lower, upper] (power_curve/parametric_forms.py:71-115 — the form
    used when a fitted curve must respect cut-in floor / rated-power
    ceiling). Pure expression: greatest/least over logistic5_expr."""
    return F.least(
        F.greatest(logistic5_expr(ws, a, b, c, d, g), F.lit(float(lower))),
        F.lit(float(upper)),
    )


def fit_logistic5(
    df: DataFrame,
    ws_col: str,
    power_col: str,
    seed: int = 42,
    method: str = "raw",
    raw_bin_width: float = 0.01,
):
    """Least-squares fit of the 5-param logistic curve by differential
    evolution (power_curve/functions.py:76-123 semantics, NumPy DE —
    scipy is not bundled).

    ``method="raw"``: the raw-point fit. Points are pre-aggregated to
    ``raw_bin_width`` (default 0.01 m/s) bins carrying (count, mean):
    the count-weighted SSE over bin means equals the raw-point SSE up
    to a constant (the within-bin variance, independent of the
    parameters), so the optimizer sees the raw objective while only
    #bins rows ever reach the driver — the distributed-scale version
    of "fit on raw points". ``method="binned"`` reproduces the
    bins-first fit on the IEC 0.5 m/s curve (unweighted).

    Returns (params dict, apply-expression factory).
    """
    import numpy as np

    from openoa_spark.functions.regression import differential_evolution_np

    if method == "raw":
        bw = float(raw_bin_width)
        agg = (
            df.where(F.col(ws_col).isNotNull() & F.col(power_col).isNotNull())
            .groupBy((F.round(F.col(ws_col) / bw) * bw).alias("x"))
            .agg(F.count(power_col).alias("w"), F.avg(power_col).alias("y"))
            .collect()
        )
        x = np.array([r["x"] for r in agg])
        y = np.array([r["y"] for r in agg])
        w = np.array([r["w"] for r in agg], dtype=float)
    elif method == "binned":
        binned = iec_binned_curve(df, ws_col, power_col).collect()
        x = np.array([r["ws_bin"] for r in binned])
        y = np.array([r["mean_power"] for r in binned])
        w = np.ones(len(x))
    else:
        raise ValueError('method must be "raw" or "binned"')

    top = float(y.max()) if len(y) else 1.0

    def sse(p):
        a, b, c, d, g = p
        with np.errstate(over="ignore", invalid="ignore"):
            pred = d + (a - d) / (1 + (x / c) ** b) ** g
        r = np.where(np.isfinite(pred), pred - y, 1e12)
        return float((w * r * r).sum())

    bounds = [(0.5 * top, 1.5 * top), (-15.0, -1.0), (2.0, 20.0), (-5.0, 5.0), (0.05, 5.0)]
    best, _ = differential_evolution_np(sse, bounds, seed=seed)
    a, b, c, d, g = (float(v) for v in best)
    params = {"a": a, "b": b, "c": c, "d": d, "g": g}
    return params, lambda col: logistic5_expr(col, a, b, c, d, g)


def fit_logistic5_grouped(
    df: DataFrame,
    key_cols: list[str],
    ws_col: str,
    power_col: str,
    seed: int = 42,
    raw_bin_width: float = 0.01,
) -> DataFrame:
    """Fit one 5-param logistic curve PER KEY GROUP in a single
    ``applyInPandas`` pass — the fleet-scale version of
    :func:`fit_logistic5` (ten thousand turbines = ten thousand
    concurrent DE fits, one per task group, nothing on the driver).

    Each group is first reduced to (bin, count, mean) rows by the same
    count-weighted 0.01 m/s pre-aggregation as the single fit (the
    weighted SSE equals the raw-point SSE up to a parameter-free
    constant), so the Python fit sees O(bins) rows per key no matter
    how much telemetry the group has — the explode-proof shape.
    Returns one row per key: (*keys, a, b, c, d, g, n_points).
    """
    import pandas as pd

    from openoa_spark.functions.regression import differential_evolution_np
    from openoa_spark.session import ship_package

    # the fit closure references package code; make it importable on
    # executor workers regardless of the driver's cwd/PYTHONPATH
    ship_package(df.sparkSession)
    bw = float(raw_bin_width)
    agg = (
        df.where(F.col(ws_col).isNotNull() & F.col(power_col).isNotNull())
        .groupBy(*key_cols, (F.round(F.col(ws_col) / bw) * bw).alias("_x"))
        .agg(F.count(power_col).alias("_w"), F.avg(power_col).alias("_y"))
    )
    out_schema = ", ".join(
        [f"{k} {t}" for k, t in agg.select(*key_cols).dtypes]
        + [f"{c} double" for c in ("a", "b", "c", "d", "g")]
        + ["n_points bigint"]
    )

    def fit(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        x = pdf["_x"].to_numpy(dtype=float)
        y = pdf["_y"].to_numpy(dtype=float)
        w = pdf["_w"].to_numpy(dtype=float)
        top = float(y.max()) if len(y) else 1.0

        def sse(p):
            a_, b_, c_, d_, g_ = p
            with np.errstate(over="ignore", invalid="ignore"):
                pred = d_ + (a_ - d_) / (1 + (x / c_) ** b_) ** g_
            r = np.where(np.isfinite(pred), pred - y, 1e12)
            return float((w * r * r).sum())

        bounds = [(0.5 * top, 1.5 * top), (-15.0, -1.0), (2.0, 20.0),
                  (-5.0, 5.0), (0.05, 5.0)]
        best, _ = differential_evolution_np(sse, bounds, seed=seed)
        row = {k: pdf[k].iloc[0] for k in key_cols}
        row.update(dict(zip("abcdg", (float(v) for v in best))))
        row["n_points"] = int(w.sum())
        return pd.DataFrame([row])

    return agg.groupBy(*key_cols).applyInPandas(fit, out_schema)
