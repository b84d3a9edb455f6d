"""Plant-geometry operators: all-pairs distance/direction, nearest
neighbors, freestream-turbine detection.

Parity targets (behavior only): openoa/plant.py:1064-1513.

The asset table is a dimension (O(10²) rows): the crossJoin is tiny
and broadcastable; downstream consumers get either a DataFrame of
pairs or a driver-side dict keyed (a, b). Coordinates are plain double
columns (x_m, y_m) — no geometry type needed (survey §1.4).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window, functions as F


# WGS-84 / transverse-Mercator constants (public: IEC/NGA specs and
# the standard Krüger-series formulation, e.g. Karney 2011).
_WGS84_A = 6378137.0
_WGS84_F = 1.0 / 298.257223563
_UTM_K0 = 0.9996
_UTM_FALSE_E = 500_000.0
_UTM_FALSE_N_SOUTH = 10_000_000.0


def utm_zone(longitude_deg: float) -> int:
    """UTM zone number for a longitude — reference semantics
    (plant.py:1085-1090: zone from the plant's mean longitude)."""
    return int((longitude_deg + 180.0) // 6.0) + 1


def utm_from_latlon(
    df: DataFrame,
    lat_col: str = "latitude",
    lon_col: str = "longitude",
    method: str = "utm",
) -> DataFrame:
    """Append planar (x_m, y_m) columns from WGS-84 lat/lon.

    ``method="utm"`` (default): true UTM forward projection via the
    4th-order Krüger series — the same map projection the reference
    gets from pyproj (plant.py:1064-1117), accurate to < 1 mm inside a
    zone. The zone is chosen from the MEAN longitude (one tiny agg on
    the dimension table, matching plant.py:1085 where one zone covers
    the whole plant), then easting/northing are pure JVM Column
    expressions (sinh/cosh/atanh — no UDF).

    ``method="equirect"``: round-1 fallback, equirectangular about the
    centroid (adequate intra-plant, kept for comparison/tests).
    """
    cen = df.agg(F.avg(lat_col).alias("la"), F.avg(lon_col).alias("lo")).first()
    if method == "equirect":
        lat0 = math.radians(cen["la"])
        r = 6371000.0
        return df.withColumn(
            "x_m",
            (F.radians(F.col(lon_col)) - math.radians(cen["lo"]))
            * F.lit(r * math.cos(lat0)),
        ).withColumn(
            "y_m", (F.radians(F.col(lat_col)) - math.radians(cen["la"])) * F.lit(r)
        )
    if method != "utm":
        raise ValueError(f"unknown projection method {method!r}")

    zone = utm_zone(cen["lo"])
    lon0 = math.radians(zone * 6.0 - 183.0)
    false_n = 0.0 if cen["la"] >= 0 else _UTM_FALSE_N_SOUTH

    # Krüger series, driver-side scalar precomputation
    n = _WGS84_F / (2.0 - _WGS84_F)
    big_a = _WGS84_A / (1.0 + n) * (1.0 + n**2 / 4.0 + n**4 / 64.0)
    a1 = n / 2.0 - 2.0 * n**2 / 3.0 + 5.0 * n**3 / 16.0
    a2 = 13.0 * n**2 / 48.0 - 3.0 * n**3 / 5.0
    a3 = 61.0 * n**3 / 240.0
    two_sqrt_n = 2.0 * math.sqrt(n) / (1.0 + n)

    phi = F.radians(F.col(lat_col))
    dlam = F.radians(F.col(lon_col)) - F.lit(lon0)
    sin_phi = F.sin(phi)
    t = F.sinh(
        F.atanh(sin_phi) - F.lit(two_sqrt_n) * F.atanh(F.lit(two_sqrt_n) * sin_phi)
    )
    xi = F.atan2(t, F.cos(dlam))
    eta = F.atanh(F.sin(dlam) / F.sqrt(F.lit(1.0) + t * t))

    series_e = eta
    series_n = xi
    for j, aj in ((1, a1), (2, a2), (3, a3)):
        series_e = series_e + F.lit(aj) * F.cos(F.lit(2.0 * j) * xi) * F.sinh(
            F.lit(2.0 * j) * eta
        )
        series_n = series_n + F.lit(aj) * F.sin(F.lit(2.0 * j) * xi) * F.cosh(
            F.lit(2.0 * j) * eta
        )
    k0a = _UTM_K0 * big_a
    return df.withColumn(
        "x_m", F.lit(_UTM_FALSE_E) + F.lit(k0a) * series_e
    ).withColumn("y_m", F.lit(false_n) + F.lit(k0a) * series_n)


def utm_to_latlon(
    df: DataFrame,
    zone: int,
    northern: bool = True,
    x_col: str = "x_m",
    y_col: str = "y_m",
) -> DataFrame:
    """Inverse UTM: append (latitude, longitude) columns from
    easting/northing — the 4th-order inverse Krüger series, the exact
    mirror of :func:`utm_from_latlon` (< 1 mm round-trip error inside
    a zone). Pure JVM Column expressions; ``zone``/``northern`` are
    the projection parameters the forward pass chose (not derivable
    from coordinates alone)."""
    n = _WGS84_F / (2.0 - _WGS84_F)
    big_a = _WGS84_A / (1.0 + n) * (1.0 + n**2 / 4.0 + n**4 / 64.0)
    b1 = n / 2.0 - 2.0 * n**2 / 3.0 + 37.0 * n**3 / 96.0
    b2 = n**2 / 48.0 + n**3 / 15.0
    b3 = 17.0 * n**3 / 480.0
    d1 = 2.0 * n - 2.0 * n**2 / 3.0 - 2.0 * n**3
    d2 = 7.0 * n**2 / 3.0 - 8.0 * n**3 / 5.0
    d3 = 56.0 * n**3 / 15.0
    lon0 = zone * 6.0 - 183.0
    false_n = 0.0 if northern else _UTM_FALSE_N_SOUTH
    k0a = _UTM_K0 * big_a

    xi = (F.col(y_col) - F.lit(false_n)) / F.lit(k0a)
    eta = (F.col(x_col) - F.lit(_UTM_FALSE_E)) / F.lit(k0a)
    xi_p, eta_p = xi, eta
    for j, bj in ((1, b1), (2, b2), (3, b3)):
        xi_p = xi_p - F.lit(bj) * F.sin(F.lit(2.0 * j) * xi) * F.cosh(
            F.lit(2.0 * j) * eta
        )
        eta_p = eta_p - F.lit(bj) * F.cos(F.lit(2.0 * j) * xi) * F.sinh(
            F.lit(2.0 * j) * eta
        )
    chi = F.asin(F.sin(xi_p) / F.cosh(eta_p))
    lat = chi
    for j, dj in ((1, d1), (2, d2), (3, d3)):
        lat = lat + F.lit(dj) * F.sin(F.lit(2.0 * j) * chi)
    lon = F.lit(math.radians(lon0)) + F.atan2(F.sinh(eta_p), F.cos(xi_p))
    return df.withColumn("latitude", F.degrees(lat)).withColumn(
        "longitude", F.degrees(lon)
    )


def asset_distance_pairs(
    df: DataFrame, id_col: str = "asset_id", x_col: str = "x_m", y_col: str = "y_m"
) -> DataFrame:
    """All ordered pairs (a, b, distance_m), a != b.

    Semantics: plant.py:1229-1258 (dense matrix with inf diagonal —
    here the diagonal is simply absent). crossJoin of a dimension
    table with itself; Catalyst broadcasts both sides.
    """
    a = df.select(
        F.col(id_col).alias("asset_a"), F.col(x_col).alias("_xa"), F.col(y_col).alias("_ya")
    )
    b = df.select(
        F.col(id_col).alias("asset_b"), F.col(x_col).alias("_xb"), F.col(y_col).alias("_yb")
    )
    return (
        a.crossJoin(b)
        .where(F.col("asset_a") != F.col("asset_b"))
        .select(
            "asset_a",
            "asset_b",
            F.sqrt(
                F.pow(F.col("_xb") - F.col("_xa"), 2) + F.pow(F.col("_yb") - F.col("_ya"), 2)
            ).alias("distance_m"),
        )
    )


def asset_direction_pairs(
    df: DataFrame, id_col: str = "asset_id", x_col: str = "x_m", y_col: str = "y_m"
) -> DataFrame:
    """All ordered pairs (a, b, bearing_deg): compass bearing from a to
    b = degrees(atan2(dx, dy)) mod 360. Semantics: plant.py:1294-1338.
    """
    a = df.select(
        F.col(id_col).alias("asset_a"), F.col(x_col).alias("_xa"), F.col(y_col).alias("_ya")
    )
    b = df.select(
        F.col(id_col).alias("asset_b"), F.col(x_col).alias("_xb"), F.col(y_col).alias("_yb")
    )
    bearing = (
        F.degrees(F.atan2(F.col("_xb") - F.col("_xa"), F.col("_yb") - F.col("_ya"))) + 360
    ) % 360
    return (
        a.crossJoin(b)
        .where(F.col("asset_a") != F.col("asset_b"))
        .select("asset_a", "asset_b", bearing.alias("bearing_deg"))
    )


def nearest_neighbor(pairs: DataFrame) -> DataFrame:
    """Per asset_a: the closest asset_b (plant.py:1452-1513).

    row_number over distance with id tiebreak — deterministic.
    """
    w = Window.partitionBy("asset_a").orderBy(F.asc("distance_m"), F.asc("asset_b"))
    return (
        pairs.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .select("asset_a", F.col("asset_b").alias("nearest"), "distance_m")
    )


def freestream_turbines(
    distance_pairs: DataFrame,
    direction_pairs: DataFrame,
    wind_direction_deg: float,
    sector_width_deg: float = 90.0,
    method: str = "sector",
    rotor_diameters: DataFrame | None = None,
) -> list[str]:
    """Turbines with no upstream neighbor that wakes them.

    Semantics: plant.py:1387-1450. ``method="sector"``: turbine i is
    freestream for wd iff for all j: |wrap180(wd − bearing(i→j))| >
    sector/2 — no other turbine upwind within the wake sector.
    ``method="IEC"``: Annex A of IEC 61400-12-1 (2005) — distances are
    normalized by the UPSTREAM turbine's rotor diameter (Dn); j wakes i
    unless Dn > 20, Dn < 0, or (Dn > 2 and |wrap180(wd − bearing)| >
    0.5·(1.3·degrees(atan(2.5/Dn + 0.15)) + 10)). ``rotor_diameters``
    is an (asset_id, rotor_diameter) DataFrame, required for IEC.

    Matrices are dimension-sized; computed distributed, decided on
    collected pairs.
    """
    rel = ((F.lit(wind_direction_deg) - F.col("bearing_deg")) % 360 + 540) % 360 - 180
    if method == "sector":
        upwind = direction_pairs.withColumn("_rel", rel).where(
            F.abs(F.col("_rel")) <= sector_width_deg / 2.0
        )
    elif method == "IEC":
        if rotor_diameters is None:
            raise ValueError("IEC freestream method requires rotor_diameters")
        rd = rotor_diameters.select(
            F.col("asset_id").alias("asset_b"), F.col("rotor_diameter").alias("_rd")
        )
        pairs = direction_pairs.join(
            distance_pairs, ["asset_a", "asset_b"]
        ).join(F.broadcast(rd), "asset_b")
        dn = F.col("distance_m") / F.col("_rd")
        half_width = 0.5 * (
            1.3 * F.degrees(F.atan(2.5 / dn + 0.15)) + 10.0
        )
        upwind = pairs.withColumn("_rel", rel).where(
            (dn <= 20.0)
            & (dn >= 0.0)
            & ((dn <= 2.0) | (F.abs(F.col("_rel")) <= half_width))
        )
    else:
        raise ValueError('freestream method must be "sector" or "IEC"')
    waked = {r["asset_a"] for r in upwind.select("asset_a").distinct().collect()}
    all_assets = {
        r["asset_a"] for r in distance_pairs.select("asset_a").distinct().collect()
    }
    return sorted(all_assets - waked)


def haversine_m(
    lat_a: Column, lon_a: Column, lat_b: Column, lon_b: Column
) -> Column:
    """Great-circle distance in meters (haversine, mean-Earth radius
    6371 km) — the projection-free cross-check for the UTM planar
    distances (agrees to ~0.1% intra-plant; use it when points span
    UTM zones). Pure trig Column expressions."""
    rla, rlo = F.radians(lat_a), F.radians(lon_a)
    rlb, rlob = F.radians(lat_b), F.radians(lon_b)
    dphi, dlam = rlb - rla, rlob - rlo
    h = (
        F.pow(F.sin(dphi / 2), 2)
        + F.cos(rla) * F.cos(rlb) * F.pow(F.sin(dlam / 2), 2)
    )
    return 2.0 * 6371000.0 * F.asin(F.sqrt(h))


def initial_bearing_deg(
    lat_a: Column, lon_a: Column, lat_b: Column, lon_b: Column
) -> Column:
    """Initial great-circle bearing a→b in [0, 360) degrees — the
    spherical twin of the planar direction matrix."""
    rla, rlb = F.radians(lat_a), F.radians(lat_b)
    dlam = F.radians(lon_b) - F.radians(lon_a)
    y = F.sin(dlam) * F.cos(rlb)
    x = F.cos(rla) * F.sin(rlb) - F.sin(rla) * F.cos(rlb) * F.cos(dlam)
    return F.pmod(F.degrees(F.atan2(y, x)), F.lit(360.0))
