"""Downloader tests: network-free (file:// URLs + injected fetchers)."""

import json

import numpy as np
import pandas as pd
import pytest

from openoa_spark.sources import downloader


def test_download_file_local(tmp_path):
    src = tmp_path / "src.bin"
    src.write_bytes(b"hello spark")
    out = tmp_path / "nested" / "dst.bin"
    downloader.download_file(src.as_uri(), out)
    assert out.read_bytes() == b"hello spark"


def test_download_zenodo_record(tmp_path, monkeypatch):
    data_file = tmp_path / "remote_payload.csv"
    data_file.write_text("a,b\n1,2\n")
    record = {
        "files": [
            {
                "key": "payload.csv",
                "size": data_file.stat().st_size,
                "links": {"self": data_file.as_uri()},
            },
            {"key": "skipme.zip", "size": 3, "links": {"self": "file:///nope"}},
        ]
    }
    records_dir = tmp_path / "records"
    records_dir.mkdir()
    (records_dir / "12345").write_text(json.dumps(record))
    monkeypatch.setattr(downloader, "ZENODO_API", records_dir.as_uri() + "/")
    paths = downloader.download_zenodo_data(
        12345, tmp_path / "out", filenames=["payload.csv"]
    )
    assert [p.name for p in paths] == ["payload.csv"]
    assert (tmp_path / "out" / "payload.csv").read_text() == "a,b\n1,2\n"
    # cached: second call must not re-fetch (self link would still work,
    # but the size check short-circuits)
    again = downloader.download_zenodo_data(
        12345, tmp_path / "out", filenames=["payload.csv"]
    )
    assert again == paths


def _fake_fetch(date, outfile, lat, lon):
    # one "provider file" per month: a csv standing in for the NetCDF
    idx = pd.date_range(date, periods=1, freq="MS")
    pd.DataFrame(
        {
            "windspeed_ms": [7.0 + date.month / 10.0],
            "temperature_K": [280.0 + date.month],
            "surf_pres_Pa": [101325.0],
        },
        index=idx,
    ).to_csv(outfile)


def _fake_read(outfile, lat, lon):
    return pd.read_csv(outfile, index_col=0, parse_dates=True)


def test_get_era5_monthly_loop(tmp_path):
    df = downloader.get_era5_monthly(
        47.9, 5.1, tmp_path, "era5", start_date="2020-01", end_date="2020-06",
        fetch_month=_fake_fetch, read_month=_fake_read,
    )
    assert len(df) == 6
    assert list(df.columns) == ["WMETR_HorWdSpd", "WMETR_EnvTmp", "WMETR_EnvPres"]
    assert df["WMETR_HorWdSpd"].iloc[0] == pytest.approx(7.1)
    # month files cached + concat csv written
    assert (tmp_path / "era5_202003.nc").is_file()
    assert (tmp_path / "era5.csv").is_file()
    # re-run with a poisoned fetcher: cache means it is never called
    def boom(*a):
        raise AssertionError("fetcher called despite cache")

    df2 = downloader.get_era5_monthly(
        47.9, 5.1, tmp_path, "era5", start_date="2020-01", end_date="2020-06",
        fetch_month=boom, read_month=_fake_read,
    )
    pd.testing.assert_frame_equal(df, df2)


def test_get_monthly_validates_dates(tmp_path):
    with pytest.raises(ValueError, match="start_date"):
        downloader.get_era5_monthly(
            0, 0, tmp_path, "x", start_date="2021-02", end_date="2020-01",
            fetch_month=_fake_fetch, read_month=_fake_read,
        )


def test_read_reanalysis_csv_spark(tmp_path, spark):
    downloader.get_merra2_monthly(
        47.9, 5.1, tmp_path, "merra2", start_date="2020-01", end_date="2020-03",
        fetch_month=_fake_fetch, read_month=_fake_read,
    )
    df = downloader.read_reanalysis_csv(spark, tmp_path / "merra2.csv")
    assert df.columns == ["time", "WMETR_HorWdSpd", "WMETR_EnvTmp", "WMETR_EnvPres"]
    assert df.count() == 3
    assert dict(df.dtypes)["WMETR_HorWdSpd"] == "double"
    assert dict(df.dtypes)["time"] == "timestamp"
