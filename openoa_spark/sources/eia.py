"""EIA plant-metadata fetch (driver-side) + PlantData attachment.

Parity target (behavior only): openoa/utils/metadata_fetch.py:21-155
(fetch_eia / attach_eia_data). All I/O boundaries are INJECTABLE, the
same pattern as sources/downloader.py: the reference depends on the
``eia`` HTTP wrapper and Excel files read via openpyxl, neither of
which exists in this container. ``read_table`` defaults to
``pd.read_excel(skiprows=1)`` (works when openpyxl is installed) and
``fetch_series`` defaults to the public EIA v2 REST endpoint via
urllib; tests inject deterministic fakes, exercising the real
selection / unit-conversion / assembly logic.

This is metadata-plumbing, not engine work: EIA monthly generation is
a ≤ few-hundred-row series consumed by EYA gap analysis — it stays a
pandas frame on the driver (callers can ``spark.createDataFrame`` it).
"""

from __future__ import annotations

import json
import urllib.parse
import urllib.request
from pathlib import Path
from typing import Callable

import pandas as pd

# columns pulled from the two EIA-860 workbooks
# (metadata_fetch.py:56-75)
PLANT_VARS = [
    "City",
    "Latitude",
    "Longitude",
    "Balancing Authority Name",
    "Transmission or Distribution System Owner",
]
WIND_VARS = [
    "Utility Name",
    "Plant Name",
    "State",
    "County",
    "Nameplate Capacity (MW)",
    "Operating Month",
    "Operating Year",
    "Number of Turbines",
    "Predominant Turbine Manufacturer",
    "Predominant Turbine Model Number",
    "Turbine Hub Height (Feet)",
]

EIA_V2_URL = "https://api.eia.gov/v2/electricity/facility-fuel/data/"


def _default_read_table(path: Path, sheet: str) -> pd.DataFrame:
    try:
        return pd.read_excel(path, sheet_name=sheet, skiprows=1)
    except ImportError as exc:  # pragma: no cover - depends on openpyxl
        raise ImportError(
            "reading EIA-860 .xlsx workbooks requires openpyxl; pass "
            "read_table= to supply a reader (e.g. CSV-backed)"
        ) from exc


def _default_fetch_series(api_key: str, plant_id: str) -> dict[str, float]:
    """Monthly net generation (MWh) for a plant from the public EIA v2
    API. Returns {'YYYY-MM': mwh}."""  # pragma: no cover - network
    params = {
        "api_key": api_key,
        "frequency": "monthly",
        "data[0]": "generation",
        "facets[plantCode][]": str(plant_id),
        "sort[0][column]": "period",
        "sort[0][direction]": "asc",
    }
    with urllib.request.urlopen(
        EIA_V2_URL + "?" + urllib.parse.urlencode(params)
    ) as resp:
        payload = json.loads(resp.read().decode())
    out: dict[str, float] = {}
    for row in payload.get("response", {}).get("data", []):
        out[row["period"]] = out.get(row["period"], 0.0) + float(
            row.get("generation") or 0.0
        )
    return out


def _select_plant(df: pd.DataFrame, plant_id: str, var_list: list[str]) -> dict:
    """Row for ``plant_id`` reduced to ``var_list`` as a plain dict
    (metadata_fetch.py:79-94)."""
    hit = df.loc[df["Plant Code"] == int(plant_id)]
    if hit.shape[0] == 0:
        raise ValueError("Plant ID not found in EIA database")
    return hit[var_list].reset_index(drop=True).T.to_dict()[0]


def fetch_eia(
    api_key: str,
    plant_id: str,
    file_path: str | Path,
    plant_file: str | Path,
    plant_sheet: str,
    wind_file: str | Path,
    wind_sheet: str,
    fetch_series: Callable[[str, str], dict[str, float]] | None = None,
    read_table: Callable[[Path, str], pd.DataFrame] | None = None,
) -> tuple[pd.DataFrame, dict]:
    """EIA monthly net generation series + plant metadata dict.

    Semantics: metadata_fetch.py:21-120 — select the plant's row from
    the plant and wind workbooks, convert hub height feet→m (rounded),
    merge the dicts; fetch the monthly MWh series and return it as a
    single-column DataFrame with a DatetimeIndex.
    """
    file_path = Path(file_path).resolve()
    read_table = read_table or _default_read_table
    fetch_series = fetch_series or _default_fetch_series

    plant_dict = _select_plant(
        read_table(file_path / plant_file, plant_sheet), plant_id, PLANT_VARS
    )
    wind_dict = _select_plant(
        read_table(file_path / wind_file, wind_sheet), plant_id, WIND_VARS
    )
    # convert_feet_to_meter semantics (unit_conversion.py:92-106)
    hub_height_m = round(wind_dict["Turbine Hub Height (Feet)"] * 0.3048)
    wind_dict["Turbine Hub Height (m)"] = hub_height_m
    wind_dict.pop("Turbine Hub Height (Feet)", None)
    out_dict = {**plant_dict, **wind_dict}

    series = fetch_series(api_key, plant_id)
    eia_monthly = pd.DataFrame(
        {"eia_monthly_mwh": list(series.values())},
        index=pd.DatetimeIndex(list(series.keys())),
    ).sort_index()
    return eia_monthly, out_dict


def attach_eia_data(
    project,
    api_key: str,
    plant_id: str,
    file_path: str | Path,
    plant_file: str | Path,
    plant_sheet: str,
    wind_file: str | Path,
    wind_sheet: str,
    fetch_series: Callable[[str, str], dict[str, float]] | None = None,
    read_table: Callable[[Path, str], pd.DataFrame] | None = None,
) -> None:
    """Populate ``project.eia`` (metadata_fetch.py:123-155)."""
    project.eia["api_key"] = api_key
    project.eia["data_dir"] = file_path
    project.eia["eia_id"] = plant_id
    project.eia["monthly_energy"], project.eia["meta_data"] = fetch_eia(
        api_key,
        plant_id,
        file_path,
        plant_file,
        plant_sheet,
        wind_file,
        wind_sheet,
        fetch_series=fetch_series,
        read_table=read_table,
    )
