"""impute_data polynomial fits (reference utils/imputing.py:34-131)."""

import pytest
from pyspark.sql import functions as F

from openoa_spark.operators import imputing


@pytest.fixture(scope="module")
def series(spark):
    # y = 2x² − 3x + 1 with every 5th target missing
    rows = [(i, float(i % 13)) for i in range(200)]
    ref = spark.createDataFrame(rows, ["k", "x"])
    tgt = ref.select(
        "k",
        F.when(F.col("k") % 5 == 0, None)
        .otherwise(2.0 * F.col("x") * F.col("x") - 3.0 * F.col("x") + 1.0)
        .alias("y"),
    )
    return tgt, ref


def test_impute_linear_on_linear_data(spark):
    ref = spark.createDataFrame([(i, float(i)) for i in range(100)], ["k", "x"])
    tgt = ref.select(
        "k",
        F.when(F.col("k") % 7 == 0, None).otherwise(3.0 * F.col("x") + 2.0).alias("y"),
    )
    out = imputing.impute_data(tgt, ref, "k", "y", "x", degree=1)
    filled = {r["k"]: r["y"] for r in out.collect()}
    assert filled[7] == pytest.approx(3.0 * 7 + 2.0, abs=1e-6)
    assert filled[1] == 3.0 * 1 + 2.0  # present values untouched


def test_impute_quadratic_recovers_poly(series):
    tgt, ref = series
    out = imputing.impute_data(tgt, ref, "k", "y", "x", degree=2)
    filled = {r["k"]: r["y"] for r in out.collect()}
    for k in (5, 10, 65):
        x = float(k % 13)
        assert filled[k] == pytest.approx(2 * x * x - 3 * x + 1, abs=1e-6), k


def test_impute_linear_underfits_quadratic(series):
    tgt, ref = series
    out = imputing.impute_data(tgt, ref, "k", "y", "x", degree=1)
    filled = {r["k"]: r["y"] for r in out.collect()}
    x = 12.0  # far from the mean: a line through a parabola misses badly
    k = 65  # k%13 == 0 → x = 0
    assert abs(filled[k] - 1.0) > 5.0


def test_degree_validation(series):
    tgt, ref = series
    with pytest.raises(ValueError, match="degree"):
        imputing.impute_data(tgt, ref, "k", "y", "x", degree=0)
