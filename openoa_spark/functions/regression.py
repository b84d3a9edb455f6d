"""Driver-side regression primitives used by the analysis pipelines.

These operate on POST-AGGREGATION arrays (monthly/daily tables of at
most a few thousand rows, collected from Spark): the idiomatic split
is "aggregate in Spark, fit tiny models on the driver, re-apply as
expressions" (survey §4.2). Pure NumPy — the container has no scipy /
statsmodels / sklearn, so OLS is closed-form lstsq and robust
regression is a from-scratch IRLS implementation of the public
Huber-T M-estimator algorithm.

Parity targets (behavior only):
- OLS fit/metrics: sklearn LinearRegression + r2/mse as used at
  openoa/analysis/aep.py:919-927
- Huber RLM: statsmodels sm.RLM(..., M=HuberT(t)) as used at
  openoa/analysis/aep.py:781-789 (MAD scale, weights = min(1, t/|r/s|))
"""

from __future__ import annotations

import numpy as np


def ols_fit(X: np.ndarray, y: np.ndarray) -> tuple[np.ndarray, float]:
    """Least-squares fit y ≈ X @ coef + intercept. Returns (coef, intercept)."""
    X = np.atleast_2d(np.asarray(X, dtype=float))
    if X.shape[0] == 1 and X.shape[1] == len(y):
        X = X.T
    A = np.column_stack([X, np.ones(len(X))])
    sol, *_ = np.linalg.lstsq(A, np.asarray(y, dtype=float), rcond=None)
    return sol[:-1], float(sol[-1])


def ols_predict(X: np.ndarray, coef: np.ndarray, intercept: float) -> np.ndarray:
    X = np.atleast_2d(np.asarray(X, dtype=float))
    if X.shape[1] != len(coef):
        X = X.T
    return X @ np.asarray(coef) + intercept


def r2_score(y: np.ndarray, yhat: np.ndarray) -> float:
    y = np.asarray(y, dtype=float)
    ss_res = float(np.sum((y - yhat) ** 2))
    ss_tot = float(np.sum((y - np.mean(y)) ** 2))
    return 1.0 - ss_res / ss_tot if ss_tot > 0 else 0.0


def mse_score(y: np.ndarray, yhat: np.ndarray) -> float:
    y = np.asarray(y, dtype=float)
    return float(np.mean((y - yhat) ** 2))


def mad_scale(resid: np.ndarray) -> float:
    """Median-absolute-deviation scale estimate, normalized to be
    consistent for the normal distribution (MAD / 0.6745)."""
    return float(np.median(np.abs(resid - np.median(resid))) / 0.6745)


def huber_irls(
    X: np.ndarray,
    y: np.ndarray,
    t: float = 1.345,
    max_iter: int = 50,
    tol: float = 1e-8,
) -> tuple[np.ndarray, float, np.ndarray]:
    """Huber-T robust linear regression via iteratively-reweighted
    least squares. Returns (coef, intercept, final weights).

    Weights: w_i = 1 when |r_i| <= t·s else t·s/|r_i|, with s the MAD
    scale of the residuals — points the M-estimator downweights
    (w < 1) are the outliers the reference flags (aep.py:781-789).
    """
    X = np.atleast_2d(np.asarray(X, dtype=float))
    if X.shape[0] == 1 and X.shape[1] == len(y):
        X = X.T
    y = np.asarray(y, dtype=float)
    A = np.column_stack([X, np.ones(len(X))])
    sol, *_ = np.linalg.lstsq(A, y, rcond=None)
    for _ in range(max_iter):
        resid = y - A @ sol
        s = mad_scale(resid)
        if s <= 0:
            w = np.ones(len(y))
            break
        u = np.abs(resid) / s
        w = np.where(u <= t, 1.0, t / np.maximum(u, 1e-300))
        Aw = A * w[:, None]
        new_sol, *_ = np.linalg.lstsq(Aw.T @ A, Aw.T @ y, rcond=None)
        if np.max(np.abs(new_sol - sol)) < tol * (1.0 + np.max(np.abs(sol))):
            sol = new_sol
            break
        sol = new_sol
    resid = y - A @ sol
    s = mad_scale(resid)
    u = np.abs(resid) / s if s > 0 else np.zeros(len(y))
    w = np.where(u <= t, 1.0, t / np.maximum(u, 1e-300))
    return sol[:-1], float(sol[-1]), w


def bin_outlier_flag(
    bin_values: np.ndarray,
    values: np.ndarray,
    bin_width: float,
    threshold: float,
    bin_min: float | None = None,
    bin_max: float | None = None,
) -> np.ndarray:
    """NumPy twin of operators.filters.bin_filter for driver-side MC
    loops (median center, std deviation, direction='all'): flag points
    with |x − median_bin| > threshold·std_bin. Semantics:
    openoa/utils/filters.py:189-286 (np.digitize right-closed edges)."""
    bv = np.asarray(bin_values, dtype=float)
    x = np.asarray(values, dtype=float)
    lo = np.nanmin(bv) if bin_min is None else bin_min
    hi = np.nanmax(bv) if bin_max is None else bin_max
    edges = np.arange(lo, hi + bin_width, bin_width)
    which = np.digitize(bv, edges)
    flag = np.zeros(len(x), dtype=bool)
    for b in np.unique(which):
        sel = which == b
        if sel.sum() < 2:
            continue
        center = np.nanmedian(x[sel])
        dev = np.nanstd(x[sel], ddof=1)
        flag[sel] = np.abs(x[sel] - center) > threshold * dev
    return flag


def cos_curve(x: np.ndarray, amp: float, offset: float, cos_exp: float) -> np.ndarray:
    """A · cos(deg2rad(x − offset))^exp — the yaw-misalignment power
    performance model (openoa/analysis/yaw_misalignment.py:59-71)."""
    return amp * np.cos(np.deg2rad(x - offset)) ** cos_exp


def cos_curve_fit(
    x: np.ndarray,
    y: np.ndarray,
    p0: tuple[float, float, float] | None = None,
    max_iter: int = 200,
) -> np.ndarray:
    """Least-squares fit of :func:`cos_curve` via a small Levenberg-
    Marquardt loop (scipy.optimize.curve_fit substitute; same p0
    convention as yaw_misalignment.py:575-577). Returns
    [amp, offset_deg, cos_exp]."""
    x = np.asarray(x, dtype=float)
    y = np.asarray(y, dtype=float)
    p = np.array(p0 if p0 is not None else [float(np.max(y)), 0.0, 2.0])
    lam = 1e-3
    r = np.deg2rad(1.0)

    def model_and_jac(p):
        amp, off, ex = p
        c = np.cos(np.deg2rad(x - off))
        c = np.clip(c, 1e-9, None)
        ce = c ** ex
        f = amp * ce
        j = np.empty((len(x), 3))
        j[:, 0] = ce
        j[:, 1] = amp * ex * c ** (ex - 1.0) * np.sin(np.deg2rad(x - off)) * r
        j[:, 2] = amp * ce * np.log(c)
        return f, j

    f, J = model_and_jac(p)
    sse = float(np.sum((y - f) ** 2))
    for _ in range(max_iter):
        resid = y - f
        A = J.T @ J
        g = J.T @ resid
        try:
            step = np.linalg.solve(A + lam * np.diag(np.diag(A)), g)
        except np.linalg.LinAlgError:
            break
        p_new = p + step
        f_new, J_new = model_and_jac(p_new)
        sse_new = float(np.sum((y - f_new) ** 2))
        if sse_new < sse:
            if abs(sse - sse_new) < 1e-12 * (1.0 + sse):
                p, f, J, sse = p_new, f_new, J_new, sse_new
                break
            p, f, J, sse = p_new, f_new, J_new, sse_new
            lam = max(lam / 3.0, 1e-12)
        else:
            lam = min(lam * 5.0, 1e6)
    return p
