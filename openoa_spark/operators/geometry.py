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


def utm_from_latlon(df: DataFrame, lat_col: str = "latitude", lon_col: str = "longitude") -> DataFrame:
    """Append planar (x_m, y_m) columns from WGS-84 lat/lon.

    Equirectangular projection about the centroid — exact enough for
    intra-plant distances (< 50 km); the reference uses pyproj UTM
    (plant.py:1064-1117), unavailable here. Pure expressions after one
    centroid aggregate.
    """
    cen = df.agg(F.avg(lat_col).alias("la"), F.avg(lon_col).alias("lo")).first()
    lat0 = math.radians(cen["la"])
    r = 6371000.0
    return df.withColumn(
        "x_m", (F.radians(F.col(lon_col)) - math.radians(cen["lo"])) * F.lit(r * math.cos(lat0))
    ).withColumn("y_m", (F.radians(F.col(lat_col)) - math.radians(cen["la"])) * F.lit(r))


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
