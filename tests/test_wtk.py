"""WTK QA readers (sources/wtk.py) with an injected HSDS fake: LCC
projection pinned on Snyder's published test case, grid index lookup,
windowed diurnal profile, and the normalized comparison frame."""

import datetime as dt
import math

import numpy as np
import pytest

from openoa_spark.sources import wtk


def test_lcc_forward_matches_snyder_worked_example():
    # Snyder, USGS PP 1395, LCC spherical numerical example (p. 295):
    # R=1, standard parallels 33 and 45, origin (23, -96); the point
    # (35, -75) projects to x=0.2966785, y=0.2462112.
    x, y = wtk.lcc_forward(
        35.0, -75.0, lat1=33.0, lat2=45.0, lat0=23.0, lon0=-96.0, radius=1.0
    )
    assert x == pytest.approx(0.2966785, abs=1e-6)
    assert y == pytest.approx(0.2462112, abs=1e-6)


class FakeWtk(dict):
    """Minimal dict-like stand-in for the h5pyd WTK file."""


def _fake_file(n_hours=96):
    # grid origin at the projection origin; 3x3 grid of 2 km cells
    # whose lat/lon we back out by brute force isn't needed — only
    # coordinates[0][0] is read for the origin.
    coords = np.empty((3, 3, 2))
    coords[:, :] = (wtk.WTK_LAT0, wtk.WTK_LON0)
    base = dt.datetime(2010, 1, 1)
    stamps = [
        (base + dt.timedelta(hours=h)).isoformat().encode() for h in range(n_hours)
    ]
    # windspeed[t, y, x]: cell (0,0) carries a pure diurnal signal
    ws = np.zeros((n_hours, 3, 3))
    for h in range(n_hours):
        ws[h, 0, 0] = 8.0 + 2.0 * math.sin(2 * math.pi * (h % 24) / 24)
        ws[h, 1, 1] = 99.0  # wrong cell — must not be selected
    return FakeWtk(coordinates=coords, datetime=stamps, windspeed_80m=ws)


def test_coordinate_indices_origin_and_offsets():
    f = _fake_file()
    assert wtk.wtk_coordinate_indices(f, wtk.WTK_LAT0, wtk.WTK_LON0) == (0, 0)
    # ~2 km north: one y-cell; longitude unchanged -> x stays 0
    lat_north = wtk.WTK_LAT0 + 2000.0 / 111_000.0
    iy, ix = wtk.wtk_coordinate_indices(f, lat_north, wtk.WTK_LON0)
    assert (iy, ix) == (1, 0)


def test_diurnal_prep_selects_cell_and_window(spark):
    f = _fake_file()
    out = wtk.wtk_diurnal_prep(
        spark,
        wtk.WTK_LAT0,
        wtk.WTK_LON0,
        wtk_file=f,
        start_date="2010-01-01",
        end_date="2010-01-04",
    ).collect()
    assert [r["hour"] for r in out] == list(range(24))
    for r in out:
        want = 8.0 + 2.0 * math.sin(2 * math.pi * r["hour"] / 24)
        assert r["ws"] == pytest.approx(want, abs=1e-9)  # not the 99.0 cell


def test_diurnal_prep_requires_accessor_and_window(spark):
    with pytest.raises(ImportError, match="h5pyd"):
        wtk.wtk_diurnal_prep(spark, 40.0, -100.0)
    with pytest.raises(IndexError, match="no WTK samples"):
        wtk.wtk_diurnal_prep(
            spark,
            wtk.WTK_LAT0,
            wtk.WTK_LON0,
            wtk_file=_fake_file(),
            start_date="2020-01-01",
            end_date="2020-01-02",
        )


def test_diurnal_comparison_normalizes_both_series(spark):
    f = _fake_file()
    prof = wtk.wtk_diurnal_prep(
        spark, wtk.WTK_LAT0, wtk.WTK_LON0, wtk_file=f,
        start_date="2010-01-01", end_date="2010-01-04",
    )
    base = dt.datetime(2015, 6, 1)
    scada = spark.createDataFrame(
        [
            (base + dt.timedelta(hours=h), t, 1000.0 + 100.0 * (h % 24))
            for h in range(48)
            for t in ("T1", "T2")
        ],
        ["time", "asset_id", "power"],
    )
    out = wtk.wtk_diurnal_comparison(prof, scada, "time", "power").collect()
    assert len(out) == 24
    ws_norm = [r["ws_norm"] for r in out]
    p_norm = [r["power_norm"] for r in out]
    assert sum(ws_norm) / 24 == pytest.approx(1.0, abs=1e-9)
    assert sum(p_norm) / 24 == pytest.approx(1.0, abs=1e-9)
    # power ramps with hour-of-day: normalized profile is increasing
    assert p_norm[0] < p_norm[12] < p_norm[23]
