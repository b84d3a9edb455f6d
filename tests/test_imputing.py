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


def test_correlation_pairs_numerically_stable_large_mean(spark):
    # mean >> std (daily energy sums ~1e6 with ~1e1 jitter): the
    # shifted-sum formulation must agree with numpy's stable corrcoef
    # to ~1e-9; the unshifted textbook sums lose ~10 digits here.
    import collections
    import itertools

    import numpy as np

    from openoa_spark.operators import imputing

    rng = np.random.default_rng(5)
    rows = []
    for a in range(5):
        base = 1.0e6 + a * 3.0
        for t in range(40):
            rows.append(
                (t, f"A{a}", float(base + 10 * np.sin(t / 3 + a) + rng.normal(0, 2)))
            )
    df = spark.createDataFrame(rows, ["t", "k", "v"])
    got = {
        (r["asset_a"], r["asset_b"]): r["corr"]
        for r in imputing.asset_correlation_pairs(df, "t", "k", "v").collect()
    }
    series = collections.defaultdict(dict)
    for t, k, v in rows:
        series[k][t] = v
    for a, b in itertools.combinations(sorted(series), 2):
        xs = [series[a][t] for t in range(40)]
        ys = [series[b][t] for t in range(40)]
        want = float(np.corrcoef(xs, ys)[0, 1])
        assert got[(a, b)] == pytest.approx(want, abs=1e-9), (a, b)


def test_correlation_pairs_join_strategy_matches_vector(spark):
    import numpy as np

    from openoa_spark.operators import imputing

    rng = np.random.default_rng(9)
    rows = [
        (t, f"A{a}", float(rng.normal(100, 15)))
        for a in range(4)
        for t in range(25)
    ]
    df = spark.createDataFrame(rows, ["t", "k", "v"])
    vec = {
        (r["asset_a"], r["asset_b"]): round(r["corr"], 9)
        for r in imputing.asset_correlation_pairs(
            df, "t", "k", "v", strategy="vector"
        ).collect()
    }
    join = {
        (r["asset_a"], r["asset_b"]): round(r["corr"], 9)
        for r in imputing.asset_correlation_pairs(
            df, "t", "k", "v", strategy="join"
        ).collect()
    }
    assert vec == join


def test_grouped_fit_constant_neighbor_leaves_gap(spark):
    """A neighbor series that is CONSTANT over the fit overlap has
    zero x-variance: the float path's var_samp is exactly 0 -> NULL
    slope -> no fill. The grouped (sim-keyed) path computes the
    denominator from decimal-ROUNDED sums, where the exact zero
    becomes rounding noise — the relative-epsilon guard must map it
    back to NULL instead of filling the gap with noise/noise. Pins
    grouped == ungrouped on this edge."""
    import datetime

    from pyspark.sql import functions as F

    from openoa_spark.operators import imputing

    t0 = datetime.datetime(2020, 1, 1)
    rows = []
    const = 7.1234567891  # >6 decimal digits so decimal(38,6) rounds
    for i in range(40):
        ts = t0 + datetime.timedelta(hours=i)
        rows.append((ts, "A", None if i % 5 == 0 else float(i)))
        rows.append((ts, "B", const))
    df = spark.createDataFrame(rows, "time timestamp, asset string, v double")

    plain = imputing.impute_all_assets_by_correlation(
        df, "time", "asset", "v", r2_threshold=0.0
    )
    grouped = imputing.impute_all_assets_by_correlation(
        df.withColumn("sim", F.lit(0)),
        "time", "asset", "v",
        r2_threshold=0.0, group_cols=["sim"],
    )

    def null_cells(out):
        return sorted(
            (r["asset"], r["time"])
            for r in out.collect()
            if r["v"] is None
        )

    p, g = null_cells(plain), null_cells(grouped.drop("sim"))
    # A has 8 planted gaps; the constant neighbor B gives no usable
    # slope, so they must REMAIN null in both paths (the grouped
    # path's rounding noise must not fill them with noise/noise)
    assert len(p) == 8 and all(a == "A" for a, _ in p), p
    assert g == p


def test_matrix_strategy_refuses_beyond_cell_cap(spark, monkeypatch):
    # r12 (VERDICT item 8): the matrix strategy's driver-side densify
    # and executor broadcast are bounded by _MATRIX_MAX_CELLS — pin
    # that the refusal actually fires (with the cap lowered so the
    # test stays tiny) and names the escape hatches.
    monkeypatch.setattr(imputing, "_MATRIX_MAX_CELLS", 10)
    rows = [(t, f"A{a}", float(t + a)) for a in range(4) for t in range(5)]
    df = spark.createDataFrame(rows, ["t", "k", "v"])
    with pytest.raises(ValueError, match="matrix strategy refuses"):
        imputing.asset_correlation_pairs(df, "t", "k", "v", strategy="matrix")
