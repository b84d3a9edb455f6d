"""Unit tests for flagging operators against the reference's own
fixture expectations (e.g. range_flag on [-1,0,1] with bounds (-0.5,
0.5) → [T,F,T]; test/unit/test_filter_toolkit.py:14-19)."""

import datetime as dt

from pyspark.sql import functions as F

from openoa_spark.operators import filters


def test_range_flag(spark):
    df = spark.createDataFrame([(-1.0,), (0.0,), (1.0,), (None,)], ["v"])
    out = df.select(filters.range_flag("v", -0.5, 0.5).alias("f")).collect()
    assert [r["f"] for r in out] == [True, False, True, True]


def test_window_range_flag(spark):
    df = spark.createDataFrame([(5.0, 100.0), (15.0, 100.0), (15.0, 1.0)], ["w", "v"])
    out = df.select(
        filters.window_range_flag("w", 10, 20, "v", 50, 200).alias("f")
    ).collect()
    assert [r["f"] for r in out] == [False, False, True]


def test_std_range_flag(spark):
    vals = [(1.0,), (2.0,), (3.0,), (2.0,), (100.0,)]
    df = spark.createDataFrame(vals, ["v"])
    out = filters.std_range_flag(df, ["v"], threshold=1.5).collect()
    flags = [r["v_flag"] for r in out]
    assert flags == [False, False, False, False, True]


def test_unresponsive_flag(spark):
    base = dt.datetime(2020, 1, 1)
    vals = [1.0, 5.0, 5.0, 5.0, 2.0, 3.0, 3.0]
    rows = [(base + dt.timedelta(minutes=10 * i), v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, ["time", "v"])
    out = filters.unresponsive_flag(df, "v", threshold=3, time_col="time")
    flags = [r["unresponsive_flag"] for r in out.orderBy("time").collect()]
    assert flags == [False, True, True, True, False, False, False]


def test_bin_filter_mean_std(spark):
    # bin width 10: bin0 = [1,2,3,100(outlier)], bin1 = [10s...]
    rows = [(1.0, 10.0), (1.5, 11.0), (2.0, 9.0), (2.5, 300.0), (12.0, 50.0), (13.0, 52.0), (14.0, 48.0)]
    df = spark.createDataFrame(rows, ["x", "y"])
    out = filters.bin_filter(
        df, "x", "y", bin_width=10.0, threshold=1.2, center_type="mean",
        threshold_type="std", bin_min=0.0,
    )
    flagged = [r["x"] for r in out.where("bin_flag").collect()]
    assert flagged == [2.5]


def test_bin_filter_median_scalar(spark):
    rows = [(1.0, 10.0), (2.0, 12.0), (3.0, 14.0), (4.0, 99.0)]
    df = spark.createDataFrame(rows, ["x", "y"])
    out = filters.bin_filter(
        df, "x", "y", bin_width=10.0, threshold=20.0, center_type="median",
        threshold_type="scalar", bin_min=0.0,
    )
    flagged = [r["x"] for r in out.where("bin_flag").collect()]
    assert flagged == [4.0]


def test_cluster_mahalanobis(spark):
    import random

    random.seed(7)
    pts = [(random.gauss(0, 1), random.gauss(0, 1)) for _ in range(200)]
    pts += [(50.0, 50.0)]
    df = spark.createDataFrame(pts, ["a", "b"])
    out = filters.cluster_mahalanobis_2d(df, "a", "b", n_clusters=2, distance_threshold=3.0)
    # the far outlier lands in some cluster; just assert the operator runs
    # and flags a small minority
    n_flagged = out.where("cluster_flag").count()
    assert 0 <= n_flagged < 40


def test_profile_table_one_pass(spark):
    from openoa_spark.operators import qa as qa_ops

    df = spark.createDataFrame(
        [(1, "a", 5.0), (2, None, None), (3, "c", 1.0)], ["id", "s", "v"]
    )
    prof = {r["column"]: r for r in qa_ops.profile_table(df).collect()}
    assert prof["s"]["n_null"] == 1 and prof["v"]["n_null"] == 1
    assert prof["id"]["n_rows"] == 3
    assert prof["v"]["min_str"] == "1.0" and prof["v"]["max_str"] == "5.0"
    assert prof["id"]["approx_distinct"] == 3


def test_psi_detects_shift(spark):
    import numpy as np

    from openoa_spark.operators import qa as qa_ops

    rng = np.random.default_rng(3)
    same = spark.createDataFrame(
        [(float(v),) for v in rng.normal(0, 1, 4000)], ["v"]
    )
    ref = spark.createDataFrame(
        [(float(v),) for v in rng.normal(0, 1, 4000)], ["v"]
    )
    shifted = spark.createDataFrame(
        [(float(v),) for v in rng.normal(1.0, 1, 4000)], ["v"]
    )
    psi_same = qa_ops.population_stability_index(ref, same, "v").first()["psi"]
    psi_shift = qa_ops.population_stability_index(ref, shifted, "v").first()["psi"]
    assert psi_same < 0.05          # identical distributions: stable
    assert psi_shift > 0.25         # one-sigma mean shift: drifted


def test_hampel_flag_spike_detection(spark):
    """A lone spike flags; its neighbors don't; a rolling-mean z-score
    with the same window would have masked it (std inflated by the
    spike itself). Also: keyless call refuses."""
    import datetime as dt

    import pytest as _pytest

    from openoa_spark.operators import filters as flt

    t0 = dt.datetime(2024, 1, 1)
    vals = [10.0, 10.2, 9.9, 10.1, 10.0, 80.0, 10.05, 9.95, 10.1, 10.0]
    df = spark.createDataFrame(
        [("A", t0 + dt.timedelta(minutes=i), v) for i, v in enumerate(vals)],
        ["k", "t", "v"],
    )
    out = flt.hampel_flag(df, "v", "t", keys=["k"], window=5, k=3.0)
    flags = {r["t"].minute: r["v_flag"] for r in out.collect()}
    assert flags[5] is True            # the spike
    assert sum(flags.values()) == 1    # and nothing else

    with _pytest.raises(ValueError):
        flt.hampel_flag(df, "v", "t", keys=[])

    # awkward value-column names work (no raw-SQL identifier splicing)
    odd = df.withColumnRenamed("v", "the value")
    out2 = flt.hampel_flag(odd, "the value", "t", keys=["k"], window=5, k=3.0)
    flags2 = {r["t"].minute: r["the value_flag"] for r in out2.collect()}
    assert flags2 == flags

    # refuses instead of silently clobbering same-named input columns
    with _pytest.raises(ValueError, match="_roll_med"):
        flt.hampel_flag(
            df.withColumn("_roll_med", df["v"]), "v", "t", keys=["k"]
        )
    # a pre-existing _dev column is NOT clobbered (internal name shifts)
    out3 = flt.hampel_flag(
        df.withColumn("_dev", df["v"]), "v", "t", keys=["k"], window=5
    )
    assert "_dev" in out3.columns
    assert {r["t"].minute: r["v_flag"] for r in out3.collect()} == flags
