"""Unit tests for met-data and unit-conversion expressions, values
cross-checked against the reference's documented semantics
(openoa/utils/met_data_processing.py, unit_conversion.py)."""

import math

import pytest
from pyspark.sql import functions as F

from openoa_spark.functions import met, units


def one(spark, expr, **cols):
    df = spark.createDataFrame([tuple(cols.values())], list(cols.keys()))
    return df.select(expr.alias("out")).first()["out"]


def test_wrap_180(spark):
    df = spark.createDataFrame([(0.0,), (180.0,), (181.0,), (359.0,), (540.0,), (-90.0,)], ["a"])
    out = [r["out"] for r in df.select(met.wrap_180("a").alias("out")).collect()]
    assert out == [0.0, 180.0, -179.0, -1.0, 180.0, -90.0]


def test_wind_direction_from_uv(spark):
    # pure southerly flow: u=0, v=-1 → wind FROM north (0 deg)
    assert one(spark, met.compute_wind_direction(F.col("u"), F.col("v")), u=0.0, v=-1.0) == pytest.approx(0.0)
    # u=-1, v=0 → from east (90)
    assert one(spark, met.compute_wind_direction(F.col("u"), F.col("v")), u=-1.0, v=0.0) == pytest.approx(90.0)


def test_u_v_roundtrip(spark):
    u, v = met.compute_u_v_components(F.lit(8.0), F.lit(37.0))
    wd = met.compute_wind_direction(u, v)
    ws = F.sqrt(u * u + v * v)
    row = spark.range(1).select(wd.alias("wd"), ws.alias("ws")).first()
    assert row["wd"] == pytest.approx(37.0)
    assert row["ws"] == pytest.approx(8.0)


def test_circular_mean_agg(spark):
    df = spark.createDataFrame([(350.0,), (10.0,)], ["a"])
    out = df.agg(met.circular_mean_agg("a").alias("m")).first()["m"]
    assert out == pytest.approx(0.0, abs=1e-9)


def test_air_density_sane(spark):
    rho = one(
        spark,
        met.compute_air_density(F.col("t"), F.col("p")),
        t=288.15,
        p=101325.0,
    )
    assert rho == pytest.approx(1.224, abs=0.01)


def test_shear_exact_powerlaw(spark):
    # ws(z) = 5 * (z/50)^0.2 → alpha recovered exactly
    alpha = 0.2
    ws40 = 5 * (40 / 50) ** alpha
    ws80 = 5 * (80 / 50) ** alpha
    out = one(
        spark,
        met.compute_shear({"a": 40.0, "b": 80.0}),
        a=ws40,
        b=ws80,
    )
    assert out == pytest.approx(alpha)


def test_veer(spark):
    out = one(
        spark,
        met.compute_veer(F.col("l"), 40.0, F.col("u"), 80.0),
        l=350.0,
        u=10.0,
    )
    assert out == pytest.approx(0.5)  # +20 deg over 40 m


def test_power_to_energy(spark):
    out = one(spark, units.convert_power_to_energy(F.col("p"), 600.0), p=1500.0)
    assert out == pytest.approx(250.0)


def test_gross_energy_frac(spark):
    out = one(
        spark,
        units.compute_gross_energy(F.col("n"), F.lit(0.05), F.lit(0.05)),
        n=90.0,
    )
    assert out == pytest.approx(100.0)


def test_gross_energy_invalid_is_null(spark):
    out = one(
        spark,
        units.compute_gross_energy(F.col("n"), F.lit(0.6), F.lit(0.5)),
        n=90.0,
    )
    assert out is None
