"""Plot-DATA builders (openoa_spark/plots.py): the data half of the
reference plot surface, verified against pandas mini-oracles. The
matplotlib rendering half is optional by design (absent here) —
render_* raises a clear ImportError."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from openoa_spark import plots
from tests.windfixtures import make_asset, make_scada


def test_windfarm_plot_data(spark):
    asset = spark.createDataFrame(make_asset())
    out = plots.windfarm_plot_data(asset)
    assert set(out.columns) >= {"asset_id", "latitude", "longitude",
                                "type", "x_m", "y_m"}
    assert len(out) == 5
    turbines = out[out["type"] == "turbine"].sort_values("longitude")
    # 4 turbines on an E-W line 0.0067 deg apart: planar x spacing is
    # ~500 m and monotone
    dx = np.diff(turbines["x_m"].to_numpy())
    assert np.all(dx > 0) and np.allclose(dx, dx[0], rtol=0.01)
    assert 400 < dx[0] < 600


def test_power_curve_plot_data_scatter_and_curve(spark):
    scada = spark.createDataFrame(make_scada(days=10))
    data = plots.power_curve_plot_data(
        scada, "WMET_HorWdSpd", "WTUR_W", max_points=800
    )
    # scatter capped and deterministic across calls
    assert len(data["scatter"]) <= 2 * 800
    again = plots.power_curve_plot_data(
        scada, "WMET_HorWdSpd", "WTUR_W", max_points=800
    )
    pd.testing.assert_frame_equal(data["scatter"], again["scatter"])
    # curve equals the IEC binned means computed directly
    direct = (
        scada.groupBy(F.floor(F.col("WMET_HorWdSpd") / 0.5).alias("b"))
        .agg(F.avg("WTUR_W").alias("m"), F.count("WTUR_W").alias("n"))
        .where(F.col("b") < 60)
        .toPandas()
    )
    got = dict(zip(data["curve"]["ws_bin"], data["curve"]["mean_power"]))
    for _, r in direct.iterrows():
        # engine curve uses the decimal-exact davg; the direct oracle
        # a double avg — agreement to float precision, not bit-exact
        assert got[(r["b"] + 0.5) * 0.5] == pytest.approx(r["m"], rel=1e-6, abs=1e-9)


def test_power_curve_plot_data_flag_stratified(spark):
    scada = spark.createDataFrame(make_scada(days=10)).withColumn(
        "flag", F.col("WTUR_W") < 100.0
    )
    data = plots.power_curve_plot_data(
        scada, "WMET_HorWdSpd", "WTUR_W", max_points=500, flag_col="flag"
    )
    assert set(data["scatter"]["flag"].unique()) == {True, False}
    assert "flag" in data["curve"].columns  # one curve per flag value


def test_power_curve_plot_data_rare_stratum_survives(spark):
    """r5 ADVICE: a rare flagged stratum (the filtered outliers the
    plot exists to show) must never downsample to zero — the budget is
    split per stratum, so 20 flagged rows among 20k survive whole."""
    df = spark.range(0, 20000).select(
        (F.col("id") % 250 / 10.0).alias("ws"),
        (F.col("id") % 2000 * 1.0).alias("p"),
        (F.col("id") < 20).alias("flag"),
    )
    data = plots.power_curve_plot_data(
        df, "ws", "p", max_points=400, flag_col="flag"
    )
    sc = data["scatter"]
    assert (sc["flag"]).sum() == 20          # rare stratum kept whole
    assert (~sc["flag"]).sum() <= 2 * 200    # common stratum capped


def test_column_histograms_data(spark):
    df = spark.range(0, 10000).select(
        (F.col("id") % 100).cast("double").alias("a"),
        (F.col("id") % 7).cast("double").alias("b"),
    )
    out = plots.column_histograms_data(df, ["a", "b"], bins=10)
    assert set(out["column"]) == {"a", "b"}
    for c in ("a", "b"):
        sub = out[out["column"] == c]
        assert sub["count"].sum() == 10000
        assert len(sub) <= 10


def test_distribution_and_boxplot_stats():
    rng = np.random.default_rng(3)
    x = rng.normal(30.0, 2.0, 4000)
    h = plots.distribution_plot_data(x, n_bins=20)
    assert h["count"].sum() == 4000
    assert len(h) == 20
    s = plots.boxplot_stats(x)
    assert s["q1"] < s["median"] < s["q3"]
    assert s["whisker_low"] >= x.min() and s["whisker_high"] <= x.max()
    assert s["median"] == pytest.approx(30.0, abs=0.2)


def test_waterfall_plot_data_geometry():
    # EYA AEP 100, gap components -5 and +2, OA AEP 97
    out = plots.waterfall_plot_data(
        [100.0, -5.0, 2.0, 97.0], ["eya", "a", "b", "oa"]
    )
    assert out.loc[0, "bottom"] == 0.0 and out.loc[0, "height"] == 100.0
    assert out.loc[1, "bottom"] == 95.0 and out.loc[1, "height"] == 5.0
    assert out.loc[2, "bottom"] == 95.0 and out.loc[2, "height"] == 2.0
    # final bar is a level at the running total
    assert out.loc[3, "bottom"] == 0.0 and out.loc[3, "height"] == 97.0
    with pytest.raises(ValueError):
        plots.waterfall_plot_data([1.0], ["x", "y"])


def test_monthly_windspeed_plot_data(spark):
    import datetime as dt

    rows = []
    for year in (2019, 2020):
        for month in (1, 2):
            for d in range(1, 11):
                rows.append((dt.datetime(year, month, d),
                             10.0 + month + (0.5 if year == 2020 else 0.0)))
    df = spark.createDataFrame(rows, ["time", "ws"])
    out = plots.monthly_windspeed_plot_data(df, "time", "ws")
    assert len(out) == 4
    jan = out[out["month"] == 1]
    # climatology normalization: the two Januaries straddle 1.0
    assert jan["ws_norm"].prod() < 1.0001
    assert jan["ws_norm"].mean() == pytest.approx(1.0, abs=0.01)


def test_wake_losses_plot_data():
    from openoa_spark.analysis.wake_losses import WakeLossesResult

    r = WakeLossesResult(
        wake_losses_por=np.array([0.1, 0.12]),
        turbine_wake_losses_por=np.zeros((2, 4)),
        wake_losses_lt=np.array([0.09, 0.11]),
        turbine_wake_losses_lt=np.zeros((2, 4)),
        wake_losses_por_wd=np.array([[0.1, 0.2], [0.2, 0.3]]),
        wake_losses_lt_wd=np.array([[0.05, 0.1], [0.15, 0.2]]),
        wake_losses_por_ws=np.array([[0.0], [0.1]]),
        wake_losses_lt_ws=np.array([[0.0], [0.2]]),
    )
    wd = plots.wake_losses_plot_data(r, kind="wd")
    assert wd["por_mean"].tolist() == [pytest.approx(0.15), pytest.approx(0.25)]
    ws = plots.wake_losses_plot_data(r, kind="ws")
    assert len(ws) == 1
    with pytest.raises(ValueError):
        plots.wake_losses_plot_data(r, kind="nope")


def test_render_raises_without_matplotlib(spark):
    scada = spark.createDataFrame(make_scada(days=2))
    data = plots.power_curve_plot_data(
        scada, "WMET_HorWdSpd", "WTUR_W", max_points=100
    )
    import importlib.util

    if importlib.util.find_spec("matplotlib") is None:
        with pytest.raises(ImportError, match="matplotlib"):
            plots.render_power_curve(data)


def test_daylight_savings_plot_data(spark):
    """Rows within the window of both 2024 America/Denver transitions
    (spring 2024-03-10 09:00Z, fall 2024-11-03 08:00Z), labeled."""
    import datetime as dt

    rows = []
    t = dt.datetime(2024, 3, 9)
    while t < dt.datetime(2024, 11, 5):
        for a in ("T1", "T2"):
            rows.append((t, a, 100.0))
        t += dt.timedelta(hours=1)
    df = spark.createDataFrame(rows, ["time", "asset_id", "power"])
    out = plots.daylight_savings_plot_data(
        df, "time", "power", "asset_id", "America/Denver", hour_window=3
    )
    assert set(out["transition"]) == {"spring", "fall"}
    assert set(out["year"]) == {2024}
    # one turbine only, bounded by 2 transitions x (2x3h+1) stamps
    assert 0 < len(out) <= 2 * 7
    spring = out[out["transition"] == "spring"]
    assert (spring["time_utc"].dt.date == dt.date(2024, 3, 10)).all()
    # no transitions -> empty frame with the contract columns
    flat = spark.createDataFrame(rows[:48], ["time", "asset_id", "power"])
    empty = plots.daylight_savings_plot_data(
        flat, "time", "power", "asset_id", "America/Denver"
    )
    assert empty.empty and "transition" in empty.columns


def test_energy_losses_timeseries_plot_data():
    import pandas as pd

    idx = pd.date_range("2020-01-01", periods=3, freq="MS")
    agg = pd.DataFrame(
        {
            "energy_gwh": [1.0, 1.1, 1.2],
            "gross_energy_gwh": [1.1, 1.2, 1.3],
            "availability_pct": [0.01, 0.02, 0.03],
            "curtailment_pct": [0.005, 0.006, 0.007],
            "unrelated": [9, 9, 9],
        },
        index=idx,
    )
    out = plots.energy_losses_timeseries_plot_data(agg)
    assert set(out.columns) == {"period", "series", "value"}
    assert len(out) == 3 * 4  # unrelated column excluded
    g = out[(out["series"] == "gross_energy_gwh")].sort_values("period")
    assert g["value"].tolist() == [1.1, 1.2, 1.3]


def test_monthly_losses_plot_data():
    import pandas as pd

    idx = pd.date_range("2020-01-01", periods=2, freq="MS")
    scada = pd.Series([100.0, 200.0], index=idx)
    meter = pd.Series([98.0, 194.0], index=idx)
    out = plots.monthly_losses_plot_data(scada, meter)
    assert out["loss"].tolist() == [
        pytest.approx(0.02), pytest.approx(0.03)
    ]
