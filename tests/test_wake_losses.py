"""WakeLosses tests against a fixture whose true wake loss is known
from the generating process."""

import numpy as np
import pytest

from openoa_spark.analysis.wake_losses import WakeLosses
from openoa_spark.plant import PlantData
from tests.windfixtures import make_wake_tables

META = {
    "latitude": 47.9, "longitude": 5.12, "capacity": 8.0,
    "scada": {"frequency": "10min"},
    "reanalysis": {"era5": {"frequency": "h"}},
}


@pytest.fixture(scope="module")
def tables():
    return make_wake_tables(days=30)


@pytest.fixture(scope="module")
def plant(spark, tables):
    return PlantData(
        spark, META, analysis_type=["WakeLosses-scada"],
        scada=spark.createDataFrame(tables["scada"]),
        asset=spark.createDataFrame(tables["asset"]),
        reanalysis={"era5": spark.createDataFrame(tables["reanalysis"])},
    )


@pytest.fixture(scope="module")
def result(plant):
    wl = WakeLosses(plant, UQ=False, num_years_LT=2)
    return wl.run()


def test_por_loss_matches_truth(result, tables):
    # the estimator reconstructs exactly the fixture's generating
    # process (T01 freestream for westerly winds), so POR loss should
    # land very close to truth
    assert result.wake_losses_por[0] == pytest.approx(
        tables["truth_por_loss"], abs=0.02
    )


def test_turbine_losses(result):
    losses = dict(zip(result.turbine_ids, result.turbine_wake_losses_por[0]))
    # T01 is always freestream → ~zero loss; others waked
    assert abs(losses["T01"]) < 0.02
    for t in ("T02", "T03", "T04"):
        assert losses[t] > 0.1


def test_lt_close_to_por(result, tables):
    # reanalysis shares the POR's (ws, wd) distribution → the LT
    # correction should roughly reproduce the POR loss
    assert result.wake_losses_lt[0] == pytest.approx(
        tables["truth_por_loss"], abs=0.05
    )


def test_wd_binned_losses(result):
    wd_bins = np.arange(0.0, 360.0, 5.0)
    eff = result.wake_losses_por_wd[0]
    # westerly bins must show efficiency < 1 (wake losses present)
    west = (wd_bins >= 250) & (wd_bins <= 290)
    assert np.nanmean(eff[west]) < 0.95
    # bins with no data are NaN
    assert np.isnan(eff[(wd_bins >= 0) & (wd_bins <= 180)]).all()


def test_uq_mode(plant):
    wl = WakeLosses(plant, UQ=True, num_sim=3, num_years_LT=(1, 2))
    res = wl.run()
    assert res.wake_losses_por.shape == (3,)
    assert np.isfinite(res.wake_losses_por).all()
    assert res.wake_losses_por.std() < 0.05


def test_batched_sims_equal_per_sim_chunks(plant):
    """Round-7 pin: the sim-keyed batched MC produces the same results
    whatever the chunking — one 3-sim pass vs three 1-sim passes. The
    MC draws happen before batching and the bootstrap is a
    deterministic per-(time, sim) Poisson weight, so only float
    summation order can differ between layouts (plain double sums);
    pinned at 1e-9 relative."""
    a = WakeLosses(plant, UQ=True, num_sim=3, num_years_LT=(1, 2),
                   sim_batch=25).run()
    b = WakeLosses(plant, UQ=True, num_sim=3, num_years_LT=(1, 2),
                   sim_batch=1).run()
    for attr in ("wake_losses_por", "turbine_wake_losses_por",
                 "wake_losses_lt", "turbine_wake_losses_lt",
                 "wake_losses_por_wd", "wake_losses_lt_wd",
                 "wake_losses_por_ws", "wake_losses_lt_ws"):
        np.testing.assert_allclose(
            getattr(a, attr), getattr(b, attr), rtol=1e-9, equal_nan=True,
            err_msg=attr,
        )
