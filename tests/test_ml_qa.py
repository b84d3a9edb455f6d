"""ML harness (MLlib randomized CV search) + QA operator tests."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from openoa_spark.ml import MachineLearningSetup
from openoa_spark.operators import qa


def test_hyper_optimize_linear_signal(spark):
    rng = np.random.default_rng(0)
    n = 2000
    x1, x2 = rng.normal(0, 1, n), rng.uniform(-2, 2, n)
    y = 3.0 * x1 - 1.5 * x2 + rng.normal(0, 0.1, n)
    df = spark.createDataFrame(pd.DataFrame({"x1": x1, "x2": x2, "y": y}))
    ml = MachineLearningSetup("linear", feature_cols=["x1", "x2"], label_col="y")
    ml.hyper_optimize(df, n_iter_search=6, num_folds=3)
    assert ml.cv_results[0][0] > 0.99  # near-perfect R² on linear data
    pred = ml.predict(df)
    assert "prediction" in pred.columns
    assert len(ml.hyper_report()) > 0


def test_hyper_optimize_tree(spark):
    rng = np.random.default_rng(1)
    n = 1500
    x = rng.uniform(0, 10, n)
    y = np.sin(x) * 5 + rng.normal(0, 0.2, n)
    df = spark.createDataFrame(pd.DataFrame({"x": x, "y": y}))
    ml = MachineLearningSetup("etr", feature_cols=["x"], label_col="y")
    ml.hyper_optimize(df, n_iter_search=3, num_folds=3)
    assert ml.cv_results[0][0] > 0.9  # trees capture the nonlinearity
    assert set(ml.opt_params) == {"maxDepth", "minInstancesPerNode",
                                  "numTrees", "subsamplingRate"}


def test_unknown_algorithm():
    with pytest.raises(ValueError, match="gam"):
        MachineLearningSetup("gam")


def test_convert_datetime_column(spark):
    df = spark.createDataFrame(
        [("2021-07-01 12:00:00",), ("2021-01-15 12:00:00",)], ["t"]
    )
    out = qa.convert_datetime_column(df, "t", "America/Denver").collect()
    by_month = {r["t_utc"].month: r for r in out}
    # July: MDT = UTC-6 (DST); January: MST = UTC-7
    assert by_month[7]["utc_offset"] == -6.0 and by_month[7]["is_dst"]
    assert by_month[1]["utc_offset"] == -7.0 and not by_month[1]["is_dst"]
    # wall clock 12:00 in Denver in July = 18:00 UTC
    assert by_month[7]["t_utc"].hour == 18


def test_duplicate_and_gap_identification(spark):
    pdf = pd.DataFrame({
        "time": pd.to_datetime(
            ["2021-01-01 00:00", "2021-01-01 01:00", "2021-01-01 01:00",
             "2021-01-01 03:00"]
        ),
        "asset_id": "a",
    })
    df = spark.createDataFrame(pdf)
    dups = qa.duplicate_time_identification(df, "time", "asset_id").collect()
    assert len(dups) == 1 and dups[0]["count"] == 2
    gaps = qa.gap_time_identification(df, "time", "h").collect()
    assert [g["time"].hour for g in gaps] == [2]


def test_describe(spark):
    df = spark.createDataFrame(
        pd.DataFrame({"a": [1.0, 2.0, 3.0, 4.0], "b": ["x"] * 4})
    )
    d = {r["column"]: r for r in qa.describe(df).collect()}
    assert set(d) == {"a"}
    assert d["a"]["count"] == 4 and d["a"]["mean"] == 2.5
    assert d["a"]["min"] == 1.0 and d["a"]["max"] == 4.0


def test_time_series_splits_never_leak_future(spark):
    import datetime as dt

    from pyspark.sql import functions as F

    from openoa_spark.ml import time_series_splits

    rows = [(dt.datetime(2020, 1, 1) + dt.timedelta(hours=h), h)
            for h in range(100)]
    df = spark.createDataFrame(rows, ["t", "v"])
    splits = list(time_series_splits(df, "t", n_splits=4))
    assert len(splits) == 4
    total_test = 0
    for train, test in splits:
        max_train = train.agg(F.max("t")).first()[0]
        min_test = test.agg(F.min("t")).first()[0]
        assert max_train < min_test            # strictly before
        assert test.count() > 0
        total_test += test.count()
    # the test windows tile the post-warmup span without overlap
    assert total_test == sum(t.count() for _, t in splits)
    # later splits train on strictly more history
    assert splits[0][0].count() < splits[-1][0].count()
