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


def test_monthly_meter_threshold_refilter(spark):
    """Monthly path: per-sim coverage-threshold refiltering
    (reference electrical_losses.py:287-318). Two full months at 2%
    loss plus one month with 8% of scada rows missing: high thresholds
    must drop that month, low thresholds keep it with coverage-
    corrected energy — either way the loss estimate stays ~2%."""
    import datetime as dt

    base = dt.datetime(2020, 1, 1)
    turbines = ["T01", "T02"]
    scada_rows, meter_by_month = [], {}
    t = base
    while t < dt.datetime(2020, 4, 1):
        # drop ~8% of February (every 12th interval)
        is_dropped = t.month == 2 and (t.minute // 10 + t.hour * 6) % 12 == 0
        total = 0.0
        for j, a in enumerate(turbines):
            e = 100.0 + 5 * j
            if not is_dropped:
                scada_rows.append((t, a, e))
            total += e
        month = t.replace(day=1, hour=0, minute=0)
        # meter integrates TRUE production (including dropped intervals)
        meter_by_month[month] = meter_by_month.get(month, 0.0) + total * 0.98
        t += dt.timedelta(minutes=10)
    scada = spark.createDataFrame(scada_rows, ["time", "asset_id", "energy_kwh"])
    meter = spark.createDataFrame(
        sorted(meter_by_month.items()), ["time", "energy_kwh"]
    )

    det = electrical_losses(
        scada, meter, monthly_meter=True, correction_threshold=0.95
    )
    # February (92% coverage) excluded at 0.95; Jan+Mar exact
    assert det.n_days == 3  # months in the joined table
    assert det.loss == pytest.approx(0.02, abs=1e-6)

    uq = electrical_losses(
        scada, meter, monthly_meter=True, num_sim=2000,
        uncertainty_correction_threshold=(0.9, 0.995), seed=7,
    )
    # thresholds below 0.92 keep corrected February; above drop it —
    # both give ~2%, so the UQ mean holds at decimal≈2 with spread
    assert uq.loss_mean == pytest.approx(0.02, abs=5e-3)
    assert 0.0 < uq.loss_std < 0.02
