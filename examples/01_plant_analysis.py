"""End-to-end wind-plant analysis walkthrough — the engine-native
version of the reference's example notebooks 00/02/04 (PlantData
intro, AEP, electrical losses) on a deterministic synthetic plant.

Run: python examples/01_plant_analysis.py
(~2 min on local[*]; no network, no external data.)
"""

from __future__ import annotations

import os
import sys

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)
sys.path.insert(0, os.path.join(_ROOT, "tests"))

from openoa_spark.session import get_session  # noqa: E402
from openoa_spark.plant import PlantData  # noqa: E402
from openoa_spark.analysis.aep import MonteCarloAEP  # noqa: E402
from openoa_spark.analysis.electrical_losses import electrical_losses  # noqa: E402
from windfixtures import make_aep_tables, plant_tables  # noqa: E402

META = {
    "latitude": 47.9,
    "longitude": 5.12,
    "capacity": 8.0,
    "scada": {"frequency": "10min"},
    "meter": {"frequency": "10min"},
    "curtail": {"frequency": "10min"},
    "reanalysis": {"era5": {"frequency": "h"}},
}

AEP_META = {
    "latitude": 47.9, "longitude": 5.12, "capacity": 8.0,
    "meter": {"frequency": "h"}, "curtail": {"frequency": "h"},
    "reanalysis": {"era5": {"frequency": "h"}},
}


def main():
    spark = get_session("example-plant-analysis")

    # -- PlantData: load + validate + geometry (notebook 00) --------
    tables = plant_tables(days=30)
    plant = PlantData(
        spark,
        META,
        analysis_type=["MonteCarloAEP", "ElectricalLosses"],
        scada=spark.createDataFrame(tables["scada"]),
        meter=spark.createDataFrame(tables["meter"]),
        curtail=spark.createDataFrame(tables["curtail"]),
        asset=spark.createDataFrame(tables["asset"]),
        reanalysis={"era5": spark.createDataFrame(tables["reanalysis"])},
    )
    print("== PlantData ==")
    print("turbines:", plant.turbine_ids)
    print("nearest turbine to T01:", plant.nearest_turbine("T01"))
    print("freestream turbines @ 270 deg:", plant.get_freestream_turbines(270.0))

    # -- ElectricalLosses (notebook 04) ------------------------------
    scada_e = plant.scada.selectExpr(
        "time", "asset_id", "WTUR_SupWh AS energy_kwh"
    )
    meter_e = plant.meter.selectExpr("time", "MMTR_SupWh AS energy_kwh")
    res = electrical_losses(scada_e, meter_e)
    print("== ElectricalLosses ==")
    print(f"loss {res.loss:.4f} over {res.n_days} full days")
    uq = electrical_losses(scada_e, meter_e, num_sim=500, seed=1)
    import statistics

    print(f"UQ mean {statistics.mean(uq.loss_samples):.4f} "
          f"std {statistics.stdev(uq.loss_samples):.4f}")

    # -- MonteCarloAEP (notebook 02) ---------------------------------
    aep_tables = make_aep_tables()
    aep_plant = PlantData(
        spark, AEP_META, analysis_type=["MonteCarloAEP"],
        meter=spark.createDataFrame(aep_tables["meter"]),
        curtail=spark.createDataFrame(aep_tables["curtail"]),
        reanalysis={"era5": spark.createDataFrame(aep_tables["reanalysis"])},
    )
    mc = MonteCarloAEP(aep_plant, uncertainty_windiness=(1, 2))
    out = mc.run(num_sim=100)
    print("== MonteCarloAEP (monthly linear, 100 sims) ==")
    print(f"AEP mean {out.aep_mean:.2f} GWh  std {out.aep_std:.2f} GWh")
    # sims fan out over the cluster; results are bit-identical
    out_d = mc.run(num_sim=100, distributed=True)
    print(f"distributed AEP mean {out_d.aep_mean:.2f} GWh (== serial)")

    # -- raw SQL over the plant tables -------------------------------
    aep_plant.create_views(prefix="plant_")
    spark.sql(
        "SELECT COUNT(*) AS n, MIN(time) AS t0 FROM plant_meter"
    ).show()


if __name__ == "__main__":
    main()
