"""Load the reference's pure NumPy/pandas utils for head-to-head parity
tests, without importing the ``openoa`` package __init__ (which pulls
pyproj/attrs analysis machinery this container lacks).

The three modules under test — ``filters``, ``timeseries``,
``met_data_processing`` — are pandas/NumPy code. Their only unmet
imports are:

- ``scipy``: used for ``scipy.linalg.inv``, ``scipy.spatial.distance.
  mahalanobis`` (both trivially NumPy-expressible) and
  ``scipy.constants.g`` (standard gravity, 9.80665 — a published
  constant). Stubbed below with exact equivalents.
- ``sklearn.cluster.KMeans``: only reached by cluster_mahalanobis_2d.
  Stubbed for the deterministic n_clusters=1 case (labels all zero,
  centroid = column means) — parity tests pin that case; k>1 paths are
  covered by the engine's own MLlib tests.

The stubs are registered in ``sys.modules`` once and shared; they are
exact for everything the reference modules call.
"""

from __future__ import annotations

import importlib
import importlib.machinery
import sys
import types

import numpy as np

_REF_ROOT = "/root/reference/openoa"


def _mod(name: str) -> types.ModuleType:
    """Stub module with a valid __spec__ (pyspark probes optional deps
    via importlib.util.find_spec, which raises on spec-less modules)."""
    m = types.ModuleType(name)
    m.__spec__ = importlib.machinery.ModuleSpec(name, loader=None)
    return m


class _StubKMeans:
    """Deterministic n_clusters=1 stand-in for sklearn KMeans."""

    def __init__(self, n_clusters=8, **_kw):
        self.n_clusters = n_clusters

    def fit(self, data):
        if self.n_clusters != 1:
            raise NotImplementedError(
                "reference-parity stub supports n_clusters=1 only"
            )
        x = np.asarray(data, dtype=float)
        self.labels_ = np.zeros(len(x), dtype=int)
        self.cluster_centers_ = x.mean(axis=0, keepdims=True)
        return self


def _mahalanobis(u, v, vi):
    d = np.asarray(u, dtype=float) - np.asarray(v, dtype=float)
    return float(np.sqrt(d @ np.asarray(vi, dtype=float) @ d))


def _install_stubs() -> None:
    if "scipy" in sys.modules and not getattr(
        sys.modules["scipy"], "_parity_stub", False
    ):
        return  # real scipy present; nothing to do
    scipy = _mod("scipy")
    scipy._parity_stub = True
    linalg = _mod("scipy.linalg")
    linalg.inv = np.linalg.inv
    spatial = _mod("scipy.spatial")
    distance = _mod("scipy.spatial.distance")
    distance.mahalanobis = _mahalanobis
    spatial.distance = distance
    constants = _mod("scipy.constants")
    constants.g = 9.80665  # CODATA standard gravity, == scipy.constants.g
    scipy.linalg, scipy.spatial, scipy.constants = linalg, spatial, constants
    sys.modules.update(
        {
            "scipy": scipy,
            "scipy.linalg": linalg,
            "scipy.spatial": spatial,
            "scipy.spatial.distance": distance,
            "scipy.constants": constants,
        }
    )

    if "sklearn" not in sys.modules:
        sklearn = _mod("sklearn")
        cluster = _mod("sklearn.cluster")
        cluster.KMeans = _StubKMeans
        sklearn.cluster = cluster
        sys.modules.update({"sklearn": sklearn, "sklearn.cluster": cluster})

    if "tqdm" not in sys.modules:
        # imputing.py imports tqdm for progress bars only — an
        # identity passthrough is behavior-exact
        tq = _mod("tqdm")
        tq.tqdm = lambda it=None, *a, **kw: it
        sys.modules["tqdm"] = tq


def load_reference_utils():
    """Return (filters, timeseries, met_data_processing) reference
    modules, loading them directly from /root/reference."""
    _install_stubs()
    if "openoa" not in sys.modules:
        # package shells with __path__ so absolute imports inside the
        # modules (`from openoa.utils._converters import ...`) resolve
        # WITHOUT executing the package __init__
        pkg = _mod("openoa")
        pkg.__path__ = [_REF_ROOT]
        upkg = _mod("openoa.utils")
        upkg.__path__ = [f"{_REF_ROOT}/utils"]
        sys.modules["openoa"] = pkg
        sys.modules["openoa.utils"] = upkg
    filters = importlib.import_module("openoa.utils.filters")
    timeseries = importlib.import_module("openoa.utils.timeseries")
    met = importlib.import_module("openoa.utils.met_data_processing")
    return filters, timeseries, met


def load_reference_imputing():
    """Return the reference ``imputing`` module (pandas/NumPy +
    numpy.polynomial only; tqdm stubbed as identity)."""
    load_reference_utils()  # installs stubs + package shells
    return importlib.import_module("openoa.utils.imputing")


def load_reference_qa():
    """Return the reference ``qa`` module. Its QA functions are pure
    pandas/pytz/dateutil (both installed); matplotlib / pyproj /
    h5pyd / openoa.utils.plot are imported at module top only for the
    plotting and WTK helpers, so inert stubs suffice (the parity
    tests never call those)."""
    load_reference_utils()
    stubs = {}
    if "matplotlib" not in sys.modules:
        mpl = _mod("matplotlib")
        plt = _mod("matplotlib.pyplot")
        mpl.pyplot = plt
        stubs.update({"matplotlib": mpl, "matplotlib.pyplot": plt})
    if "pyproj" not in sys.modules:
        pyproj = _mod("pyproj")
        pyproj.Proj = object
        stubs["pyproj"] = pyproj
    if "h5pyd" not in sys.modules:
        h5 = _mod("h5pyd")
        h5.File = object
        stubs["h5pyd"] = h5
    if "openoa.utils.plot" not in sys.modules:
        plot = _mod("openoa.utils.plot")
        plot.set_styling = lambda *a, **kw: None
        stubs["openoa.utils.plot"] = plot
    sys.modules.update(stubs)
    return importlib.import_module("openoa.utils.qa")


def load_reference_parametric_forms():
    """Return the reference ``power_curve.parametric_forms`` module
    (pure NumPy/pandas). A shell package for
    ``openoa.utils.power_curve`` bypasses its __init__, which imports
    the pygam/scipy-backed fitting module this container lacks."""
    load_reference_utils()
    if "openoa.utils.power_curve" not in sys.modules:
        pkg = _mod("openoa.utils.power_curve")
        pkg.__path__ = [f"{_REF_ROOT}/utils/power_curve"]
        sys.modules["openoa.utils.power_curve"] = pkg
    return importlib.import_module(
        "openoa.utils.power_curve.parametric_forms"
    )
