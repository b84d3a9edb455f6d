"""Regression-style test of the ElectricalLosses pipeline on a
synthetic plant with a KNOWN 2% electrical loss (the fixture recipe of
FIXTURES.md §2 / the reference's regression golden,
test/regression/electrical_losses.py:29)."""

import datetime as dt

import pytest

from openoa_spark.analysis.electrical_losses import electrical_losses


@pytest.fixture(scope="module")
def plant(spark):
    base = dt.datetime(2020, 1, 1)
    turbines = ["T01", "T02", "T03", "T04"]
    scada_rows = []
    meter_rows = []
    n_intervals = 6 * 24 * 20  # 20 days of 10-min data
    for i in range(n_intervals):
        t = base + dt.timedelta(minutes=10 * i)
        total = 0.0
        for j, a in enumerate(turbines):
            e = 250.0 + 10 * j + (i % 6)  # kWh per 10-min
            scada_rows.append((t, a, e))
            total += e
        meter_rows.append((t, total * 0.98))  # known 2% loss
    # drop a few scada rows on day 5 → that day must be excluded
    day5 = base + dt.timedelta(days=5)
    scada_rows = [
        r for r in scada_rows if not (r[0] >= day5 and r[0] < day5 + dt.timedelta(hours=1) and r[1] == "T01")
    ]
    scada = spark.createDataFrame(scada_rows, ["time", "asset_id", "energy_kwh"])
    meter = spark.createDataFrame(meter_rows, ["time", "energy_kwh"])
    return scada, meter


def test_electrical_losses_exact(plant):
    scada, meter = plant
    res = electrical_losses(scada, meter)
    assert res.n_days == 19  # day 5 excluded for incomplete coverage
    assert res.loss == pytest.approx(0.02, abs=1e-9)


def test_electrical_losses_uq(plant):
    scada, meter = plant
    res = electrical_losses(scada, meter, num_sim=2000, seed=42)
    import statistics

    assert statistics.mean(res.loss_samples) == pytest.approx(0.02, abs=2e-3)
    assert statistics.stdev(res.loss_samples) == pytest.approx(0.007, abs=3e-3)
