"""WIND Toolkit (WTK) QA readers — nearest-grid lookup + diurnal
profile.

Parity targets (behavior only): openoa/utils/qa.py:467-619
(wtk_coordinate_indices, wtk_diurnal_prep, and the data half of
wtk_diurnal_plot — the matplotlib rendering stays out of scope).

The reference depends on h5pyd (NREL HSDS) and pyproj, neither in
this container. The HSDS file is an INJECTABLE dict-like accessor
exposing ``coordinates`` (2-D grid of (lat, lon)), ``datetime``
(ISO byte strings), and ``windspeed_80m`` (time × y × x); tests
provide a deterministic fake. The Lambert-conformal-conic projection
the WTK grid uses is implemented directly from the public spherical
LCC forward series (Snyder, "Map Projections — A Working Manual",
USGS PP 1395, eqs. 14-1..15-2) with the grid's published Proj4
parameters, so no pyproj is needed.
"""

from __future__ import annotations

import math
from datetime import datetime
from typing import Callable

from pyspark.sql import DataFrame, functions as F

# the WTK grid's projection (public Proj4 string, qa.py:487-492):
# +proj=lcc +lat_1=30 +lat_2=60 +lat_0=38.47240422490422 +lon_0=-96
# +ellps=sphere (PROJ sphere radius 6370997 m), 2 km cells
WTK_LAT1 = 30.0
WTK_LAT2 = 60.0
WTK_LAT0 = 38.47240422490422
WTK_LON0 = -96.0
WTK_SPHERE_R = 6_370_997.0
WTK_CELL_M = 2000.0


def lcc_forward(
    lat: float,
    lon: float,
    lat1: float = WTK_LAT1,
    lat2: float = WTK_LAT2,
    lat0: float = WTK_LAT0,
    lon0: float = WTK_LON0,
    radius: float = WTK_SPHERE_R,
) -> tuple[float, float]:
    """Spherical Lambert conformal conic forward projection (Snyder
    eqs. 15-1..15-2). Returns (x_m, y_m)."""
    p1, p2, p0 = map(math.radians, (lat1, lat2, lat0))
    phi, lam = math.radians(lat), math.radians(lon - lon0)

    def t(p):
        return math.tan(math.pi / 4 + p / 2)

    if abs(lat1 - lat2) < 1e-12:
        n = math.sin(p1)
    else:
        n = math.log(math.cos(p1) / math.cos(p2)) / math.log(t(p2) / t(p1))
    big_f = math.cos(p1) * t(p1) ** n / n
    rho = radius * big_f / t(phi) ** n
    rho0 = radius * big_f / t(p0) ** n
    return rho * math.sin(n * lam), rho0 - rho * math.cos(n * lam)


def wtk_coordinate_indices(
    wtk_file, latitude: float, longitude: float
) -> tuple[int, int]:
    """Nearest WTK grid (y, x) indices for a plant's lat/lon
    (qa.py:467-498): project plant and grid origin to LCC meters,
    divide the offset by the 2 km cell pitch, round."""
    origin_lat, origin_lon = wtk_file["coordinates"][0][0]
    ox, oy = lcc_forward(float(origin_lat), float(origin_lon))
    px, py = lcc_forward(latitude, longitude)
    ix = int(round((px - ox) / WTK_CELL_M))
    iy = int(round((py - oy) / WTK_CELL_M))
    return (iy, ix)  # reference returns reversed([x, y])


def wtk_diurnal_prep(
    spark,
    latitude: float,
    longitude: float,
    wtk_file=None,
    start_date: str = "2007-01-01",
    end_date: str = "2013-12-31",
    open_file: Callable[[], object] | None = None,
) -> DataFrame:
    """Diurnal (hour-of-day) mean 80 m wind speed at the plant's
    nearest WTK grid cell (qa.py:501-550).

    The HSDS slice is driver-side (one grid cell × a date window —
    tiny); the diurnal aggregation is a Spark groupBy so it composes
    with the engine's other diurnal/calendar profiles. Output:
    (hour, ws) ordered by hour.
    """
    if wtk_file is None:
        if open_file is None:
            raise ImportError(
                "WTK access requires h5pyd + NREL HSDS credentials; pass "
                "wtk_file= (a dict-like accessor) or open_file=."
            )
        wtk_file = open_file()

    iy, ix = wtk_coordinate_indices(wtk_file, latitude, longitude)
    coords = wtk_file["coordinates"]
    try:
        _ = coords[iy][ix]
    except (IndexError, ValueError) as exc:
        raise IndexError(
            f"Project Coordinates (lat, long) = ({latitude}, {longitude}) "
            "are outside the WIND Toolkit domain."
        ) from exc

    stamps = [
        datetime.fromisoformat(
            (s.decode() if isinstance(s, (bytes, bytearray)) else str(s))
            .replace("Z", "")
        )
        for s in wtk_file["datetime"]
    ]
    lo = datetime.fromisoformat(start_date)
    hi = datetime.fromisoformat(end_date)
    window = [i for i, s in enumerate(stamps) if lo <= s <= hi]
    if not window:
        raise IndexError(f"no WTK samples within [{start_date}, {end_date}]")
    first, last = min(window), max(window)
    ws = wtk_file["windspeed_80m"][first : last + 1, iy, ix]

    rows = [
        (stamps[first + k], float(v)) for k, v in enumerate(ws)
    ]
    df = spark.createDataFrame(rows, ["datetime", "ws"])
    return (
        df.groupBy(F.hour("datetime").alias("hour"))
        .agg(F.avg("ws").alias("ws"))
        .orderBy("hour")
    )


def wtk_diurnal_comparison(
    wtk_diurnal: DataFrame,
    scada: DataFrame,
    time_col: str,
    power_col: str,
) -> DataFrame:
    """The data half of wtk_diurnal_plot (qa.py:556-618): plant-total
    power per timestamp → hour-of-day mean → both series normalized
    by their own mean, joined on hour. Plotting stays client-side.
    Output: (hour, ws_norm, power_norm).
    """
    plant_power = scada.groupBy(time_col).agg(
        F.sum(power_col).alias("_p")
    )
    power_diurnal = plant_power.groupBy(
        F.hour(time_col).alias("hour")
    ).agg(F.avg("_p").alias("_power"))

    w_mean = wtk_diurnal.agg(F.avg("ws").alias("_wm"))
    p_mean = power_diurnal.agg(F.avg("_power").alias("_pm"))
    return (
        wtk_diurnal.crossJoin(F.broadcast(w_mean))
        .join(power_diurnal, "hour")
        .crossJoin(F.broadcast(p_mean))
        .select(
            "hour",
            (F.col("ws") / F.col("_wm")).alias("ws_norm"),
            (F.col("_power") / F.col("_pm")).alias("power_norm"),
        )
        .orderBy("hour")
    )
