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


# ----------------------------------------------------------------
# Driver-side nonlinear regressors for the AEP Monte-Carlo loop.
#
# The MC loop trains on the COLLECTED bucket aggregate (≤240 monthly /
# ≤7.3k daily rows) and refits per simulation on a bootstrap — exactly
# the regime where the reference uses sklearn on the driver
# (openoa/analysis/aep.py:897-959: reg_model etr/gbm/gam with
# once-per-product hyper-optimization). sklearn is not in this
# container, so these are from-scratch NumPy equivalents of the public
# algorithms (extremely-randomized trees, least-squares gradient
# boosting, additive polynomial GAM). MLlib (openoa_spark/ml.py) stays
# the path for models trained on full-resolution distributed data.
# ----------------------------------------------------------------


def _build_tree(X, y, rng, depth, max_depth, min_samples_split, random_splits):
    n, d = X.shape
    if depth >= max_depth or n < min_samples_split or np.ptp(y) == 0.0:
        return (float(np.mean(y)),)
    best = None  # (sse, feat, thr)
    for f in rng.permutation(d):
        xs = X[:, f]
        lo, hi = float(xs.min()), float(xs.max())
        if lo == hi:
            continue
        if random_splits:  # extra-trees: ONE uniform-random threshold
            thrs = (rng.uniform(lo, hi),)
        else:  # gbm: scan interior deciles
            thrs = np.unique(np.quantile(xs, np.linspace(0.1, 0.9, 9)))
        for thr in thrs:
            m = xs <= thr
            nl = int(m.sum())
            if nl == 0 or nl == n:
                continue
            yl, yr = y[m], y[~m]
            sse = float(((yl - yl.mean()) ** 2).sum() + ((yr - yr.mean()) ** 2).sum())
            if best is None or sse < best[0]:
                best = (sse, f, float(thr))
    if best is None:
        return (float(np.mean(y)),)
    _, f, thr = best
    m = X[:, f] <= thr
    return (
        f,
        thr,
        _build_tree(X[m], y[m], rng, depth + 1, max_depth, min_samples_split, random_splits),
        _build_tree(X[~m], y[~m], rng, depth + 1, max_depth, min_samples_split, random_splits),
    )


def _tree_predict(tree, X, out=None, idx=None):
    if out is None:
        out = np.empty(len(X))
        idx = np.arange(len(X))
    if len(tree) == 1:
        out[idx] = tree[0]
        return out
    f, thr, left, right = tree
    m = X[idx, f] <= thr
    _tree_predict(left, X, out, idx[m])
    _tree_predict(right, X, out, idx[~m])
    return out


class ExtraTreesReg:
    """Extremely-randomized trees (Geurts et al. 2006): each split
    picks one uniform-random threshold per candidate feature; trees
    average. No bootstrap (the ET default)."""

    def __init__(self, n_estimators=50, max_depth=8, min_samples_split=4, seed=42):
        self.n_estimators = int(n_estimators)
        self.max_depth = int(max_depth)
        self.min_samples_split = int(min_samples_split)
        self.seed = int(seed)
        self.trees_ = None

    def fit(self, X, y):
        X = np.atleast_2d(np.asarray(X, float))
        y = np.asarray(y, float)
        rng = np.random.default_rng(self.seed)
        self.trees_ = [
            _build_tree(X, y, rng, 0, self.max_depth, self.min_samples_split, True)
            for _ in range(self.n_estimators)
        ]
        return self

    def predict(self, X):
        X = np.atleast_2d(np.asarray(X, float))
        return np.mean([_tree_predict(t, X) for t in self.trees_], axis=0)


class GBMReg:
    """Least-squares gradient boosting (Friedman 2001): stagewise
    shallow trees fit to residuals, shrunk by the learning rate."""

    def __init__(self, n_estimators=50, max_depth=3, learning_rate=0.1,
                 min_samples_split=4, seed=42):
        self.n_estimators = int(n_estimators)
        self.max_depth = int(max_depth)
        self.learning_rate = float(learning_rate)
        self.min_samples_split = int(min_samples_split)
        self.seed = int(seed)
        self.f0_ = 0.0
        self.trees_ = None

    def fit(self, X, y):
        X = np.atleast_2d(np.asarray(X, float))
        y = np.asarray(y, float)
        rng = np.random.default_rng(self.seed)
        self.f0_ = float(np.mean(y))
        pred = np.full(len(y), self.f0_)
        self.trees_ = []
        for _ in range(self.n_estimators):
            tree = _build_tree(
                X, y - pred, rng, 0, self.max_depth, self.min_samples_split, False
            )
            pred += self.learning_rate * _tree_predict(tree, X)
            self.trees_.append(tree)
        return self

    def predict(self, X):
        X = np.atleast_2d(np.asarray(X, float))
        pred = np.full(len(X), self.f0_)
        for t in self.trees_:
            pred += self.learning_rate * _tree_predict(t, X)
        return pred


def natural_cubic_basis(x: np.ndarray, knots: np.ndarray) -> np.ndarray:
    """Natural cubic spline basis (ESL §5.2.1 truncated-power form
    with linearity constraints beyond the boundary knots): columns
    [x, N_1..N_{K-2}] for K knots."""
    K = len(knots)

    def d(k):
        num = np.clip(x - knots[k], 0, None) ** 3 - np.clip(x - knots[-1], 0, None) ** 3
        return num / (knots[-1] - knots[k])

    cols = [x]
    d_last = d(K - 2)
    for k in range(K - 2):
        cols.append(d(k) - d_last)
    return np.column_stack(cols)


def bspline_basis(
    x: np.ndarray, lo: float, hi: float, n_splines: int = 20,
    spline_order: int = 3,
) -> np.ndarray:
    """Cubic B-spline basis on a UNIFORM knot grid over [lo, hi] —
    the P-spline basis of Eilers & Marx (1996), which is also what
    pygam's default ``s()`` term builds (n_splines basis functions,
    spline_order 3, knots equally spaced over the data range with
    order-extension at the edges). Cox–de Boor recursion; values
    beyond [lo, hi] are evaluated at the clipped edge (the caller
    adds the linear extrapolation term, see :class:`PSplineGAM`).
    Returns (len(x), n_splines)."""
    x = np.asarray(x, dtype=float)
    scale = hi - lo
    if scale <= 0:
        scale = 1.0
    t = np.clip((x - lo) / scale, 0.0, 1.0)
    n_inner = n_splines - spline_order + 1  # boundary-knot count
    inner = np.linspace(0.0, 1.0, n_inner)
    diff = inner[1] - inner[0] if n_inner > 1 else 1.0
    aug = np.arange(1, spline_order + 1) * diff
    knots = np.r_[-aug[::-1], inner, 1.0 + aug]
    # (no last-knot nudging needed: t is clipped to [0, 1] and the
    # order-extended last knot sits at 1 + spline_order*diff, so t == 1
    # already lands inside the half-open interval [1, 1 + diff))
    tt = t[:, None]
    # degree-0 (Haar) bases, then the de Boor recursion
    b = ((tt >= knots[:-1]) & (tt < knots[1:])).astype(float)
    maxi = len(knots) - 1
    for m in range(2, spline_order + 2):
        maxi -= 1
        num_l = (tt - knots[:maxi]) * b[:, :maxi]
        den_l = knots[m - 1:maxi + m - 1] - knots[:maxi]
        num_r = (knots[m:maxi + m] - tt) * b[:, 1:maxi + 1]
        den_r = knots[m:maxi + m] - knots[1:maxi + 1]
        b = num_l / den_l + num_r / den_r
    return b


class PSplineGAM:
    """Penalized-B-spline additive model — the model CLASS of the
    reference's pygam ``LinearGAM`` (power_curve/functions.py:34-61,
    153-200), reimplemented from the published P-spline formulation
    (Eilers & Marx 1996, "Flexible smoothing with B-splines and
    penalties") with pygam's defaults: per-feature cubic B-spline
    basis with ``n_splines`` uniform knots over the training range, a
    second-order difference penalty at strength ``lam`` = 0.6 per
    term, an unpenalized intercept, and one penalized-least-squares
    solve (identity link: pygam's PIRLS converges in a single step).
    Predictions beyond a feature's training range follow
    ``extrapolation``: ``"linear"`` (pygam's edge behavior — extend
    the edge tangent) or ``"clip"`` (freeze at the edge value). The
    default is pygam-faithful linear; pipelines that predict far
    outside a SHORT training window should pass "clip" — the edge
    slope of a penalized fit is noise-scale (≈ noise / knot-spacing),
    so extending it across a distance comparable to the training
    range amplifies noise unboundedly (measured: a 60-day TIE fit
    extrapolating over an annual air-density cycle overshot 15×; the
    reference never sees this only because its regression data spans
    years, making extrapolation distances negligible).

    pygam itself is absent in this container, so this cannot be
    diffed against it bit-for-bit; the fidelity envelope
    (tests/test_regression_gam.py) pins behavior on the reference's
    own power-curve shapes instead."""

    def __init__(self, n_splines=20, lam=0.6, spline_order=3,
                 extrapolation="linear", **_ignored):
        if extrapolation not in ("linear", "clip"):
            raise ValueError(f"unknown extrapolation {extrapolation!r}")
        self.n_splines = int(n_splines)
        self.lam = float(lam)
        self.spline_order = int(spline_order)
        self.extrapolation = extrapolation
        self.edges_ = None
        self.coef_ = None

    def _feature_basis(self, xj, lo, hi):
        """Basis + linear extrapolation: rows outside [lo, hi] get the
        edge basis plus (x - edge) times the edge derivative (numeric,
        h = 1e-6 of the range — the basis is piecewise-cubic so the
        one-sided difference at the edge is exact to O(h))."""
        b = bspline_basis(xj, lo, hi, self.n_splines, self.spline_order)
        if self.extrapolation == "clip":
            return b  # bspline_basis already evaluates at the clipped edge
        scale = (hi - lo) or 1.0
        h = 1e-6 * scale
        for side, edge, sgn in (("lo", lo, -1.0), ("hi", hi, 1.0)):
            out = (xj < lo) if side == "lo" else (xj > hi)
            if not out.any():
                continue
            e0 = bspline_basis(
                np.array([edge]), lo, hi, self.n_splines, self.spline_order
            )
            e1 = bspline_basis(
                np.array([edge - sgn * h]), lo, hi,
                self.n_splines, self.spline_order,
            )
            # one-sided tangent expressed in the +x direction:
            # hi: (f(hi) - f(hi-h)) / h; lo: (f(lo) - f(lo+h)) / (-h).
            # (r7 review fix: the old dist*deriv multiplied sgn twice,
            # mirroring the low-side tail instead of extending it)
            slope = (e0 - e1) / (sgn * h)
            b[out] = e0 + (xj[out] - edge)[:, None] * slope
        return b

    def fit(self, X, y):
        X = np.atleast_2d(np.asarray(X, dtype=float))
        if X.shape[0] == 1 and X.shape[1] > 1 and np.ndim(y) and len(y) > 1:
            X = X.T
        y = np.asarray(y, dtype=float)
        p = X.shape[1]
        self.edges_ = [
            (float(np.min(X[:, j])), float(np.max(X[:, j]))) for j in range(p)
        ]
        blocks = [np.ones((len(X), 1))]
        for j in range(p):
            blocks.append(self._feature_basis(X[:, j], *self.edges_[j]))
        B = np.hstack(blocks)
        # block-diagonal 2nd-order difference penalty, intercept free
        k = self.n_splines
        D = np.diff(np.eye(k), n=2, axis=0)
        P = np.zeros((B.shape[1], B.shape[1]))
        for j in range(p):
            s = 1 + j * k
            P[s:s + k, s:s + k] = self.lam * (D.T @ D)
        # tiny ridge for the identifiability null-space the difference
        # penalty leaves (constant/linear per term vs the intercept)
        P += 1e-9 * np.eye(B.shape[1])
        self.coef_ = np.linalg.solve(B.T @ B + P, B.T @ y)
        return self

    def predict(self, X):
        X = np.atleast_2d(np.asarray(X, dtype=float))
        if X.shape[1] != len(self.edges_) and X.shape[0] == len(self.edges_):
            X = X.T
        blocks = [np.ones((len(X), 1))]
        for j, (lo, hi) in enumerate(self.edges_):
            blocks.append(self._feature_basis(X[:, j], lo, hi))
        return np.hstack(blocks) @ self.coef_


def gam_3param_fit(ws, wd, rho, y, extrapolation: str = "clip"):
    """The TIE model seam (reference power_curve/functions.py:153-200
    gam_3param): fit energy on RAW (ws, wd, rho) with the P-spline
    additive model and return a ``(ws, wd, rho) -> prediction``
    callable. Shared by the engine pipeline (analysis/tie.py) and the
    reference-parity injection (tests/refimport.py), so pipeline
    parity holds the model seam identical by construction.

    Default edge extrapolation is CLIPPED, not linear: TIE predicts
    over the full long-term reanalysis span from a (possibly short)
    SCADA POR, and a penalized fit's edge slope is noise-scale — see
    the PSplineGAM docstring for the measured 15× overshoot a linear
    extension produced on a 60-day winter POR. Callers that need the
    reference's pygam behavior (LinearGAM extends the edge tangent)
    can pass ``extrapolation="linear"`` — exposed on
    TurbineLongTermGrossEnergy so the choice is configurable per run
    (r7 ADVICE)."""
    m = PSplineGAM(n_splines=20, extrapolation=extrapolation).fit(
        np.column_stack([
            np.asarray(ws, dtype=float),
            np.asarray(wd, dtype=float),
            np.asarray(rho, dtype=float),
        ]),
        np.asarray(y, dtype=float),
    )

    def predict(ws2, wd2, rho2):
        return m.predict(np.column_stack([
            np.asarray(ws2, dtype=float),
            np.asarray(wd2, dtype=float),
            np.asarray(rho2, dtype=float),
        ]))

    return predict


class PolyGAM:
    """Additive GAM analog (pygam is absent): per-feature standardized
    basis — natural cubic splines with ``n_splines`` quantile knots
    (the reference tunes exactly this hyperparameter,
    machine_learning_setup.py gam range) or a power basis up to
    ``degree`` — jointly ridge-fit. Same role as analysis/tie.py's
    poly-OLS, with the spline basis as the closer pygam substitute."""

    def __init__(self, degree=3, n_splines=None, l2=1e-6, seed=0):
        self.degree = int(degree)
        self.n_splines = int(n_splines) if n_splines is not None else None
        self.l2 = float(l2)
        self.mu_ = None
        self.sd_ = None
        self.knots_ = None
        self.coef_ = None

    def _basis(self, X):
        Z = (X - self.mu_) / self.sd_
        cols = [np.ones(len(X))]
        for j in range(X.shape[1]):
            if self.knots_ is not None and self.knots_[j] is not None:
                cols.append(natural_cubic_basis(Z[:, j], self.knots_[j]))
            else:
                cols.append(
                    np.column_stack([Z[:, j] ** p for p in range(1, self.degree + 1)])
                )
        return np.column_stack(cols)

    def fit(self, X, y):
        X = np.atleast_2d(np.asarray(X, float))
        y = np.asarray(y, float)
        self.mu_ = X.mean(axis=0)
        self.sd_ = np.where(X.std(axis=0) == 0, 1.0, X.std(axis=0))
        if self.n_splines is not None:
            Z = (X - self.mu_) / self.sd_
            self.knots_ = []
            for j in range(X.shape[1]):
                q = np.quantile(Z[:, j], np.linspace(0, 1, self.n_splines))
                q = np.unique(q)
                # splines need ≥3 distinct knots; degenerate features
                # fall back to the power basis
                self.knots_.append(q if len(q) >= 3 else None)
        A = self._basis(X)
        reg = self.l2 * np.eye(A.shape[1])
        reg[0, 0] = 0.0
        self.coef_ = np.linalg.solve(A.T @ A + reg, A.T @ y)
        return self

    def predict(self, X):
        X = np.atleast_2d(np.asarray(X, float))
        return self._basis(X) @ self.coef_


# hyperparameter ranges mirroring the reference's
# machine_learning_setup.py:96-135 (adapted names)
ML_HYPER_RANGES = {
    "etr": {
        "n_estimators": [25, 50, 100],
        "max_depth": [4, 8, 12, 16],
        "min_samples_split": [2, 4, 8],
    },
    "gbm": {
        "n_estimators": [25, 50, 100],
        "max_depth": [2, 3, 4],
        "learning_rate": [0.05, 0.1, 0.2],
    },
    # pygam's tunable is the spline count (machine_learning_setup.py)
    "gam": {"n_splines": [5, 10, 15, 20]},
}


def make_ml_model(reg_model: str, params: dict, seed: int = 42):
    if reg_model == "etr":
        return ExtraTreesReg(seed=seed, **params)
    if reg_model == "gbm":
        return GBMReg(seed=seed, **params)
    if reg_model == "gam":
        return PSplineGAM(**params)
    raise ValueError(f"unknown reg_model {reg_model!r}")


def hyper_optimize_np(
    reg_model: str,
    X: np.ndarray,
    y: np.ndarray,
    n_iter: int = 8,
    k_folds: int = 3,
    seed: int = 42,
) -> dict:
    """Randomized hyperparameter search with K-fold CV mean R² —
    driver-side twin of ml.MachineLearningSetup.hyper_optimize
    (reference aep.py:936-951 runs this once per reanalysis product)."""
    rng = np.random.default_rng(seed)
    space = ML_HYPER_RANGES[reg_model]
    names = sorted(space)
    X = np.atleast_2d(np.asarray(X, float))
    y = np.asarray(y, float)
    n = len(y)
    fold = rng.integers(0, k_folds, n)
    seen, best = set(), None
    for _ in range(n_iter * 3):
        combo = tuple(rng.choice(space[k]) for k in names)
        if combo in seen:
            continue
        seen.add(combo)
        params = {k: (int(v) if float(v).is_integer() and k != "learning_rate" else float(v))
                  for k, v in zip(names, combo)}
        scores = []
        for f in range(k_folds):
            tr, te = fold != f, fold == f
            if te.sum() < 2:
                continue
            m = make_ml_model(reg_model, params, seed=seed)
            m.fit(X[tr], y[tr])
            scores.append(r2_score(y[te], m.predict(X[te])))
        score = float(np.mean(scores)) if scores else -np.inf
        if best is None or score > best[0]:
            best = (score, params)
        if len(seen) >= n_iter:
            break
    return best[1]


def differential_evolution_np(
    fn,
    bounds: list[tuple[float, float]],
    seed: int = 42,
    pop_mult: int = 15,
    max_gen: int = 150,
    mutation: float = 0.8,
    recombination: float = 0.9,
    tol: float = 1e-8,
) -> tuple[np.ndarray, float]:
    """Differential evolution (rand/1/bin, Storn & Price 1997) in pure
    NumPy — scipy is not bundled, and the power-curve fit needs a
    global optimizer because the logistic-5 SSE surface is multimodal.
    Returns (best_x, best_f). Deterministic for a given seed."""
    rng = np.random.default_rng(seed)
    lo = np.array([b[0] for b in bounds], dtype=float)
    hi = np.array([b[1] for b in bounds], dtype=float)
    d = len(bounds)
    npop = pop_mult * d
    X = lo + rng.random((npop, d)) * (hi - lo)
    f = np.array([fn(x) for x in X])
    for _ in range(max_gen):
        for i in range(npop):
            r = rng.choice(npop - 1, 3, replace=False)
            r[r >= i] += 1  # distinct from i
            mutant = np.clip(X[r[0]] + mutation * (X[r[1]] - X[r[2]]), lo, hi)
            cross = rng.random(d) < recombination
            cross[rng.integers(d)] = True
            trial = np.where(cross, mutant, X[i])
            ft = fn(trial)
            if ft <= f[i]:
                X[i], f[i] = trial, ft
        if np.std(f) <= tol * (abs(np.mean(f)) + 1e-12):
            break
    best = int(np.argmin(f))
    return X[best], float(f[best])
