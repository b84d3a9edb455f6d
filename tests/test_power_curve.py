"""Power-curve fitting: IEC binning + logistic-5 DE fit
(reference power_curve/functions.py:40-123)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from openoa_spark.operators import power_curve


@pytest.fixture(scope="module")
def scada(spark):
    rng = np.random.default_rng(3)
    ws = rng.uniform(0.5, 20.0, 6000)
    # true logistic-5: a=100 (rated-ish low for numerics), b=-5, c=8, d=2, g=1
    p = 2.0 + (100.0 - 2.0) / (1.0 + (ws / 8.0) ** -5.0) ** 1.0
    p = p + rng.normal(0, 1.0, len(ws))
    return spark.createDataFrame(
        [(float(a), float(b)) for a, b in zip(ws, p)], ["ws", "power"]
    )


def test_iec_binned_curve(scada):
    out = power_curve.iec_binned_curve(scada, "ws", "power").collect()
    by_bin = {r["ws_bin"]: r["mean_power"] for r in out}
    assert by_bin[8.25] == pytest.approx(53.0, abs=5.0)  # near curve midpoint
    assert by_bin[16.25] > 90.0


@pytest.mark.parametrize("method", ["raw", "binned"])
def test_fit_logistic5_recovers_curve(scada, method):
    params, make_expr = power_curve.fit_logistic5(
        scada, "ws", "power", method=method
    )
    # prediction quality is the contract (logistic-5 has parameter
    # degeneracies, so compare the CURVE, not the parameters)
    grid = scada.sparkSession.createDataFrame(
        [(float(x),) for x in np.arange(3.0, 18.0, 0.5)], ["ws"]
    )
    got = [r["p"] for r in grid.select(make_expr("ws").alias("p")).collect()]
    want = [
        2.0 + 98.0 / (1.0 + (x / 8.0) ** -5.0) for x in np.arange(3.0, 18.0, 0.5)
    ]
    err = float(np.sqrt(np.mean((np.array(got) - np.array(want)) ** 2)))
    assert err < 1.5, (method, params, err)


def test_fit_method_validation(scada):
    with pytest.raises(ValueError, match="method"):
        power_curve.fit_logistic5(scada, "ws", "power", method="nope")


def test_fit_logistic5_grouped_recovers_per_group_curves(spark):
    import numpy as np

    from openoa_spark.operators.power_curve import (
        fit_logistic5_grouped,
        logistic5_expr,
    )

    rng = np.random.default_rng(7)
    rows = []
    truth = {"t1": (2000.0, -8.0, 9.0, 0.0, 1.0),
             "t2": (1500.0, -6.0, 7.5, 0.0, 1.2)}
    for t, (a, b, c, d, g) in truth.items():
        ws = rng.uniform(0.5, 20.0, 800)
        p = d + (a - d) / (1 + (ws / c) ** b) ** g
        p = p + rng.normal(0, 10.0, len(ws))
        rows += [(t, float(w), float(v)) for w, v in zip(ws, p)]
    df = spark.createDataFrame(rows, ["asset_id", "ws", "power"])
    fits = {r["asset_id"]: r
            for r in fit_logistic5_grouped(df, ["asset_id"], "ws", "power").collect()}
    assert set(fits) == {"t1", "t2"}
    # each fitted curve must track its own group's truth closely at
    # mid-range wind speeds (rated power differs by 500 -> distinguishes)
    for t, (a, b, c, d, g) in truth.items():
        f = fits[t]
        for ws in (6.0, 9.0, 12.0, 15.0):
            true_p = d + (a - d) / (1 + (ws / c) ** b) ** g
            fit_p = f["d"] + (f["a"] - f["d"]) / (1 + (ws / f["c"]) ** f["b"]) ** f["g"]
            assert abs(fit_p - true_p) < 0.05 * a + 20, (t, ws, fit_p, true_p)


def test_iec_binned_curve_grouped_matches_separate_fits(spark):
    from openoa_spark.operators.power_curve import iec_binned_curve

    df = spark.createDataFrame(
        [("a", 5.1, 100.0), ("a", 5.3, 120.0), ("b", 5.2, 500.0)],
        ["k", "ws", "p"],
    )
    rows = {(r["k"], r["ws_bin"]): (r["mean_power"], r["n"])
            for r in iec_binned_curve(df, "ws", "p", keys=["k"]).collect()}
    assert rows[("a", 5.25)] == (110.0, 2)
    assert rows[("b", 5.25)] == (500.0, 1)
