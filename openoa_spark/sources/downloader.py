"""Driver-side reanalysis/data downloaders + Spark ingestion.

Parity targets (behavior only): openoa/utils/downloader.py:55-484
(download_file, download_zenodo_data, get_era5_monthly,
get_merra2_monthly). Downloading is inherently driver-side, single-
node work; the Spark-side contribution is :func:`read_reanalysis_csv`,
which loads the produced CSV into a canonical reanalysis DataFrame
(the same WMETR_* columns PlantData expects).

The reference depends on cdsapi (ERA5), OPeNDAP (MERRA2) and xarray
(NetCDF). None are in this container, so the month-fetch and
file-parse steps are INJECTABLE callables; the defaults raise a clear
ImportError naming the missing dependency. Tests inject deterministic
fakes — the download loop, caching, concatenation, cropping, renaming,
and CSV contract are all real and tested.
"""

from __future__ import annotations

import datetime
import json
import shutil
import urllib.request
from pathlib import Path
from typing import Callable

import pandas as pd

ZENODO_API = "https://zenodo.org/api/records/"

# canonical column names (schema.py reanalysis table)
_RENAMES = {
    "windspeed_ms": "WMETR_HorWdSpd",
    "temperature_K": "WMETR_EnvTmp",
    "surf_pres_Pa": "WMETR_EnvPres",
}


def download_file(url: str, outfile: str | Path) -> None:
    """Stream ``url`` to ``outfile`` (downloader.py:55-91)."""
    outfile = Path(outfile)
    outfile.parent.mkdir(parents=True, exist_ok=True)
    with urllib.request.urlopen(url) as resp, open(outfile, "wb") as fh:
        shutil.copyfileobj(resp, fh)


def download_zenodo_data(
    record_id: int,
    outfile_path: str | Path,
    filenames: list[str] | None = None,
) -> list[Path]:
    """Download the files of a Zenodo record (downloader.py:94-176).

    ``filenames`` restricts to a subset; existing files whose size
    matches the record entry are skipped (the reference's caching).
    Returns the local paths.
    """
    outdir = Path(outfile_path)
    outdir.mkdir(parents=True, exist_ok=True)
    with urllib.request.urlopen(f"{ZENODO_API}{record_id}") as resp:
        record = json.loads(resp.read().decode())
    paths = []
    for f in record.get("files", []):
        name = f.get("key") or f.get("filename")
        if filenames is not None and name not in filenames:
            continue
        out = outdir / name
        if out.is_file() and f.get("size") == out.stat().st_size:
            paths.append(out)
            continue
        download_file(f["links"]["self"], out)
        paths.append(out)
    return paths


def _default_era5_fetch(date, outfile, lat, lon):  # pragma: no cover
    raise ImportError(
        "ERA5 download requires the cdsapi package and CDS registration "
        "(https://cds.climate.copernicus.eu/api-how-to); pass fetch_month= "
        "to supply a fetcher, or pre-download the files."
    )


def _default_merra2_fetch(date, outfile, lat, lon):  # pragma: no cover
    raise ImportError(
        "MERRA2 download requires NASA GES DISC credentials; pass "
        "fetch_month= to supply a fetcher, or pre-download the files."
    )


def _default_read_month(outfile, lat, lon):  # pragma: no cover
    raise ImportError(
        "Reading NetCDF months requires xarray; pass read_month= to supply "
        "a parser returning a pandas DataFrame indexed by datetime."
    )


def _get_reanalysis_monthly(
    lat: float,
    lon: float,
    save_pathname: str | Path,
    save_filename: str,
    start_date: str,
    end_date: str | None,
    fetch_month: Callable,
    read_month: Callable,
    file_ext: str = "nc",
) -> pd.DataFrame:
    """Shared month-loop: resolve the date range, fetch only missing
    month files, parse + concat + crop, rename to the canonical
    variable names, write ``<save_filename>.csv`` (downloader.py:
    243-333 / 398-484 without the provider client)."""
    save_path = Path(save_pathname).resolve()
    save_path.mkdir(parents=True, exist_ok=True)
    now = datetime.datetime.now() - datetime.timedelta(days=37)
    if end_date is None:
        end_date = f"{now.year}-{now.month:02}"
    start = datetime.datetime.strptime(start_date, "%Y-%m")
    end = datetime.datetime.strptime(end_date, "%Y-%m")
    if start > end:
        raise ValueError("The start_date should be less than or equal to the end_date")
    dates = pd.date_range(start=start, end=end, freq="MS", inclusive="both")

    frames = []
    for date in dates:
        outfile = save_path / f"{save_filename}_{date.year}{date.month:02}.{file_ext}"
        if not outfile.is_file():
            fetch_month(date, outfile, lat, lon)
        frames.append(read_month(outfile, lat, lon))
    df = pd.concat(frames).sort_index()
    df = df.rename(columns=_RENAMES)[list(_RENAMES.values())].dropna()
    df = df.loc[start:end]
    df.index.name = "datetime"
    df.to_csv(save_path / f"{save_filename}.csv", index=True)
    return df


def get_era5_monthly(
    lat: float,
    lon: float,
    save_pathname: str | Path,
    save_filename: str,
    start_date: str = "2000-01",
    end_date: str | None = None,
    fetch_month: Callable = _default_era5_fetch,
    read_month: Callable = _default_read_month,
) -> pd.DataFrame:
    """Monthly ERA5 (10m wind speed, 2m temperature, surface pressure)
    for the nearest node — downloader.py:178-333. Returns the
    concatenated monthly frame and writes ``<save_filename>.csv``."""
    return _get_reanalysis_monthly(
        lat, lon, save_pathname, save_filename, start_date, end_date,
        fetch_month, read_month,
    )


def get_merra2_monthly(
    lat: float,
    lon: float,
    save_pathname: str | Path,
    save_filename: str,
    start_date: str = "2000-01",
    end_date: str | None = None,
    fetch_month: Callable = _default_merra2_fetch,
    read_month: Callable = _default_read_month,
) -> pd.DataFrame:
    """Monthly MERRA-2 (M2IMNXLFO: SPEEDLML, TLML, PS) for the nearest
    node — downloader.py:336-484. Same CSV contract as ERA5."""
    return _get_reanalysis_monthly(
        lat, lon, save_pathname, save_filename, start_date, end_date,
        fetch_month, read_month, file_ext="nc4",
    )


def read_reanalysis_csv(spark, path: str | Path):
    """Load a downloader-produced CSV as a canonical reanalysis
    DataFrame (time + WMETR_* doubles) ready for
    ``PlantData(reanalysis={product: df})``."""
    from pyspark.sql import functions as F

    df = spark.read.option("header", True).csv(str(path))
    cols = [F.to_timestamp("datetime").alias("time")]
    cols += [
        F.col(c).cast("double").alias(c) for c in df.columns if c != "datetime"
    ]
    return df.select(*cols)
