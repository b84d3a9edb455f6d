"""EIA metadata fetch (sources/eia.py) with injected I/O fakes —
exercises the real selection / feet→m conversion / merge / series
assembly logic without network or openpyxl."""

import pandas as pd
import pytest

from openoa_spark.sources import eia


def _fake_tables():
    plant = pd.DataFrame(
        {
            "Plant Code": [11111, 22222],
            "City": ["Windville", "Calmtown"],
            "Latitude": [45.1, 30.0],
            "Longitude": [-93.2, -80.0],
            "Balancing Authority Name": ["MISO", "PJM"],
            "Transmission or Distribution System Owner": ["X Co", "Y Co"],
        }
    )
    wind = pd.DataFrame(
        {
            "Plant Code": [11111, 22222],
            "Utility Name": ["U1", "U2"],
            "Plant Name": ["Alpha Wind", "Beta Wind"],
            "State": ["MN", "FL"],
            "County": ["A", "B"],
            "Nameplate Capacity (MW)": [150.0, 80.0],
            "Operating Month": [6, 1],
            "Operating Year": [2012, 2015],
            "Number of Turbines": [75, 40],
            "Predominant Turbine Manufacturer": ["GE", "Vestas"],
            "Predominant Turbine Model Number": ["1.5sle", "V110"],
            "Turbine Hub Height (Feet)": [262.467, 300.0],
        }
    )
    return {"plant.xlsx": plant, "wind.xlsx": wind}


def _read_table(path, sheet):
    return _fake_tables()[path.name]


def _fetch_series(api_key, plant_id):
    assert api_key == "k" * 32
    assert plant_id == "11111"
    return {"2020-01": 30000.0, "2020-02": 28000.0, "2020-03": 35000.0}


def test_fetch_eia_merges_metadata_and_series(tmp_path):
    monthly, meta = eia.fetch_eia(
        "k" * 32, "11111", tmp_path, "plant.xlsx", "Plant", "wind.xlsx",
        "Operable", fetch_series=_fetch_series, read_table=_read_table,
    )
    # 262.467 ft * 0.3048 = 80.0 m (rounded), feet key removed
    assert meta["Turbine Hub Height (m)"] == 80
    assert "Turbine Hub Height (Feet)" not in meta
    assert meta["City"] == "Windville"
    assert meta["Plant Name"] == "Alpha Wind"
    assert list(monthly.columns) == ["eia_monthly_mwh"]
    assert isinstance(monthly.index, pd.DatetimeIndex)
    assert monthly.index.is_monotonic_increasing
    assert float(monthly.loc["2020-02", "eia_monthly_mwh"]) == 28000.0


def test_fetch_eia_unknown_plant_raises(tmp_path):
    with pytest.raises(ValueError, match="not found"):
        eia.fetch_eia(
            "k" * 32, "99999", tmp_path, "plant.xlsx", "Plant", "wind.xlsx",
            "Operable", fetch_series=_fetch_series, read_table=_read_table,
        )


def test_attach_eia_data_populates_plant_slot(tmp_path):
    class FakePlant:
        eia: dict = {}

    p = FakePlant()
    p.eia = {}
    eia.attach_eia_data(
        p, "k" * 32, "11111", tmp_path, "plant.xlsx", "Plant", "wind.xlsx",
        "Operable", fetch_series=_fetch_series, read_table=_read_table,
    )
    assert p.eia["eia_id"] == "11111"
    assert p.eia["meta_data"]["Number of Turbines"] == 75
    assert len(p.eia["monthly_energy"]) == 3
