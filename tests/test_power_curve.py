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
