"""UTM forward projection (Krüger series, operators/geometry.py).

Pins the projection against independent ground truth so the Column-
expression implementation can't drift:
- a published UTM test point (CN Tower, Wikipedia's UTM example)
- the central-meridian invariant, with the meridian arc computed by
  numerical integration of the ellipsoid integrand (independent of
  the series under test)
- southern-hemisphere false northing
- agreement with the equirectangular fallback on a tight cluster
"""

import math

import numpy as np
import pytest

from openoa_spark.operators import geometry as geo


def _project(spark, points, method="utm"):
    df = spark.createDataFrame(points, ["latitude", "longitude"])
    out = geo.utm_from_latlon(df, method=method)
    return {
        (round(r["latitude"], 8), round(r["longitude"], 8)): (r["x_m"], r["y_m"])
        for r in out.collect()
    }


def test_utm_known_point_cn_tower(spark):
    # Published example (Wikipedia, "Universal Transverse Mercator"):
    # CN Tower 43.642567N 79.387139W -> zone 17N, 630084 E, 4833438 N.
    lat, lon = 43.642567, -79.387139
    assert geo.utm_zone(lon) == 17
    (x, y), = _project(spark, [(lat, lon)]).values()
    assert abs(x - 630084.0) < 1.0
    assert abs(y - 4833438.0) < 1.0


def test_utm_central_meridian_invariants(spark):
    # On the central meridian: easting is exactly the 500 km false
    # easting, northing is k0 * meridian arc length. The arc is
    # computed here by brute-force numerical integration — an
    # independent check of the series constants.
    a, f, k0 = 6378137.0, 1 / 298.257223563, 0.9996
    e2 = f * (2 - f)
    lon0 = 9.0  # zone 32 central meridian
    for lat in (12.0, 45.0, 68.5):
        (x, y), = _project(spark, [(lat, lon0)]).values()
        assert abs(x - 500000.0) < 1e-3
        theta = np.linspace(0.0, math.radians(lat), 300_001)
        integrand = a * (1 - e2) / np.power(1 - e2 * np.sin(theta) ** 2, 1.5)
        arc = float(np.trapz(integrand, theta))  # noqa: NPY201 (this numpy lacks trapezoid)
        assert abs(y - k0 * arc) < 0.01, (lat, y, k0 * arc)


def test_utm_southern_hemisphere_false_northing(spark):
    # Sydney-ish point: northing counts down from 10,000,000.
    (x, y), = _project(spark, [(-33.8568, 151.2153)]).values()
    assert 6_000_000.0 < y < 6_300_000.0
    assert 300_000.0 < x < 400_000.0


def test_utm_matches_equirect_on_tight_cluster(spark):
    # A <5 km turbine cluster: pairwise UTM distances must agree with
    # the equirectangular fallback to well under 1% (k0=0.9996 scale
    # plus sphere-R=6371km vs local WGS84 ellipsoid radii — up to
    # ~0.35% at mid-latitudes — are the expected deviations).
    pts = [
        (48.000, 11.000),
        (48.010, 11.000),
        (48.000, 11.015),
        (48.020, 11.030),
    ]
    utm = _project(spark, pts, method="utm")
    eq = _project(spark, pts, method="equirect")
    keys = list(utm)
    for i in range(len(keys)):
        for j in range(i + 1, len(keys)):
            du = math.dist(utm[keys[i]], utm[keys[j]])
            de = math.dist(eq[keys[i]], eq[keys[j]])
            assert du == pytest.approx(de, rel=7e-3)
            assert du > 100.0


def test_utm_unknown_method_raises(spark):
    with pytest.raises(ValueError, match="projection"):
        _project(spark, [(48.0, 11.0)], method="bogus")


def test_utm_round_trip_sub_millimeter(spark):
    from openoa_spark.operators import geometry as geo

    pts = [
        (1, 47.90, 5.12), (2, 47.95, 5.20), (3, 47.80, 5.05),
        (4, -33.86, 151.21),  # southern hemisphere (Sydney)
    ]
    for northern, rows in ((True, pts[:3]), (False, pts[3:])):
        df = spark.createDataFrame(rows, ["id", "latitude", "longitude"])
        zone = geo.utm_zone(
            df.agg({"longitude": "avg"}).first()[0]
        )
        fwd = geo.utm_from_latlon(df, "latitude", "longitude")
        back = geo.utm_to_latlon(
            fwd.drop("latitude", "longitude"), zone, northern=northern
        )
        for r in back.join(
            df.withColumnRenamed("latitude", "lat0")
              .withColumnRenamed("longitude", "lon0"), "id"
        ).collect():
            # 1e-8 deg ~ 1 mm
            assert abs(r["latitude"] - r["lat0"]) < 1e-8, r
            assert abs(r["longitude"] - r["lon0"]) < 1e-8, r


def test_haversine_agrees_with_utm_intra_plant(spark):
    from pyspark.sql import functions as F

    from openoa_spark.operators import geometry as geo

    df = spark.createDataFrame(
        [(1, 47.90, 5.12), (2, 47.95, 5.20)], ["id", "latitude", "longitude"]
    )
    utm = geo.utm_from_latlon(df, "latitude", "longitude")
    a = utm.where("id = 1").first()
    b = utm.where("id = 2").first()
    planar = ((a["x_m"] - b["x_m"]) ** 2 + (a["y_m"] - b["y_m"]) ** 2) ** 0.5
    hav = df.agg(
        F.max(F.when(F.col("id") == 1, F.col("latitude"))).alias("la"),
    )
    row = spark.createDataFrame([(47.90, 5.12, 47.95, 5.20)],
                                ["la", "lo", "lb", "lob"]).select(
        geo.haversine_m(F.col("la"), F.col("lo"), F.col("lb"), F.col("lob"))
          .alias("d"),
        geo.initial_bearing_deg(F.col("la"), F.col("lo"), F.col("lb"),
                                F.col("lob")).alias("brg"),
    ).first()
    # spherical vs projected: within 0.2% over ~8 km
    assert abs(row["d"] - planar) / planar < 0.002
    # bearing roughly NE (north-east quadrant)
    assert 0 < row["brg"] < 90
