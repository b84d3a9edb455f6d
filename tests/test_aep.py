"""MonteCarloAEP tests: Spark-built aggregate vs a pandas mini-oracle,
plus statistical plausibility of the MC distribution (the reference's
own tolerance discipline — test/regression/long_term_monte_carlo_aep.py
asserts MC means at decimal≈1-3, not exact values)."""

import numpy as np
import pandas as pd
import pytest

from openoa_spark.analysis.aep import MonteCarloAEP
from openoa_spark.plant import PlantData
from tests.windfixtures import ELEC_LOSS, make_aep_tables

META = {
    "latitude": 47.9, "longitude": 5.12, "capacity": 8.0,
    "meter": {"frequency": "h"}, "curtail": {"frequency": "h"},
    "reanalysis": {"era5": {"frequency": "h"}},
}


@pytest.fixture(scope="module")
def tables():
    return make_aep_tables()


@pytest.fixture(scope="module")
def analysis(spark, tables):
    plant = PlantData(
        spark, META, analysis_type=["MonteCarloAEP"],
        meter=spark.createDataFrame(tables["meter"]),
        curtail=spark.createDataFrame(tables["curtail"]),
        reanalysis={"era5": spark.createDataFrame(tables["reanalysis"])},
    )
    mc = MonteCarloAEP(plant, uncertainty_windiness=(1, 2))
    mc.prepare()
    return mc


def test_aggregate_matches_pandas_oracle(analysis, tables):
    agg = analysis.aggregate
    # pandas mini-oracle: monthly sums of the same input arrays
    meter = tables["meter"].set_index("time")
    expected = meter["MMTR_SupWh"].resample("MS").sum() / 1e6
    # trim first/last partial months the same way the pipeline does
    common = agg.index.intersection(expected.index)
    assert len(common) >= 13
    np.testing.assert_allclose(
        agg.loc[common, "energy_gwh"].to_numpy(),
        expected.loc[common].to_numpy(), rtol=1e-9,
    )
    # gross = net + avail + curt
    np.testing.assert_allclose(
        agg["gross_energy_gwh"].to_numpy(),
        (agg["energy_gwh"] + agg["availability_gwh"] + agg["curtailment_gwh"]).to_numpy(),
        rtol=1e-12,
    )
    # partial month 2020-03 (data stops on the 15th) must be trimmed
    assert pd.Timestamp("2020-03-01") not in agg.index


def test_aggregate_trim_and_reanalysis(analysis):
    agg = analysis.aggregate
    assert "era5" in agg.columns
    assert agg["era5"].notna().all()
    # density-corrected monthly ws in a physical range
    assert agg["era5"].between(4, 13).all()


def test_long_term_losses(analysis):
    avail, curt = analysis.long_term_losses
    assert len(avail) == 12 and len(curt) == 12
    # fixture availability ≈ 1% of gross, curtailment ≈ 0.5%
    assert avail.mean() == pytest.approx(0.01, abs=0.003)
    assert curt.mean() == pytest.approx(0.005, abs=0.002)


def test_mc_distribution(analysis, tables):
    res = analysis.run(num_sim=100)
    assert len(res.results) == 100
    # truth: long-term annual gross energy from the generating process
    gross = tables["gross_kwh"]
    annual_gross_gwh = gross.mean() * 8766.0 / 1e6
    net_truth = annual_gross_gwh * (1 - 0.01)  # gross minus availability
    assert res.aep_mean == pytest.approx(net_truth, rel=0.10)
    # UQ spread present but small relative to the mean
    assert 0 < res.aep_std < 0.2 * res.aep_mean
    # r2 of the monthly regression should be high: energy derives from ws
    assert res.results["r2"].median() > 0.5
    assert res.results["avail_pct"].mean() == pytest.approx(0.01, abs=0.004)


def test_outlier_detection_path(analysis):
    analysis_od = MonteCarloAEP(
        analysis.plant, uncertainty_windiness=(1, 2), outlier_detection=True
    )
    res = analysis_od.run(num_sim=20)
    assert np.isfinite(res.results["aep_GWh"]).all()


def test_daily_resolution(spark, tables):
    plant = PlantData(
        spark, META, analysis_type=["MonteCarloAEP"],
        meter=spark.createDataFrame(tables["meter"]),
        curtail=spark.createDataFrame(tables["curtail"]),
        reanalysis={"era5": spark.createDataFrame(tables["reanalysis"])},
    )
    mc = MonteCarloAEP(plant, time_resolution="D", uncertainty_windiness=(1, 2))
    agg = mc.prepare()
    assert len(agg) > 360  # ~440 POR days
    res = mc.run(num_sim=10)
    assert np.isfinite(res.results["aep_GWh"]).all()


def test_ml_regression_models(spark, tables):
    # daily grain preserves the power curve's nonlinearity that monthly
    # averaging washes out — the regime where the reference's
    # reg_model etr/gbm/gam beats the linear fit (aep.py:897-959)
    plant = PlantData(
        spark, META, analysis_type=["MonteCarloAEP"],
        meter=spark.createDataFrame(tables["meter"]),
        curtail=spark.createDataFrame(tables["curtail"]),
        reanalysis={"era5": spark.createDataFrame(tables["reanalysis"])},
    )

    def run(model):
        mc = MonteCarloAEP(
            plant, time_resolution="D", reg_model=model,
            uncertainty_windiness=(1, 2),
        )
        return mc.run(num_sim=6)

    res_lin = run("lin")
    r2 = {"lin": float(res_lin.results["r2"].median())}
    for model in ("etr", "gbm", "gam"):
        res = run(model)
        assert np.isfinite(res.results["aep_GWh"]).all(), model
        r2[model] = float(res.results["r2"].median())
        # nonlinear daily relationship: every ML model must beat lin
        assert r2[model] > r2["lin"], r2
        # and the AEP distribution must stay in the same physical range
        assert res.results["aep_GWh"].mean() == pytest.approx(
            res_lin.results["aep_GWh"].mean(), rel=0.15
        ), model


def test_reg_model_validation(spark, tables):
    plant = PlantData(
        spark, META, analysis_type=["MonteCarloAEP"],
        meter=spark.createDataFrame(tables["meter"]),
        curtail=spark.createDataFrame(tables["curtail"]),
        reanalysis={"era5": spark.createDataFrame(tables["reanalysis"])},
    )
    with pytest.raises(ValueError, match="reg_model"):
        MonteCarloAEP(plant, reg_model="nope")


def test_distributed_run_matches_serial_exactly(analysis):
    """The distributed Monte-Carlo path must be bit-identical to the
    serial one: draws are made up-front, bootstraps are per-sim
    seeded, so batching across executors cannot change results."""
    serial = analysis.run(num_sim=12)
    dist = analysis.run(num_sim=12, distributed=True)
    pd.testing.assert_frame_equal(serial.results, dist.results)


def test_distributed_run_matches_serial_nonlinear(analysis):
    mc = MonteCarloAEP(
        analysis.plant, reg_model="etr", uncertainty_windiness=(1, 2)
    )
    mc.prepare()
    serial = mc.run(num_sim=4)
    dist = mc.run(num_sim=4, distributed=True)
    pd.testing.assert_frame_equal(serial.results, dist.results)
