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
    # r6 ADVICE (waterfill): the rare stratum's unused budget flows to
    # the big stratum — its cap is ~max_points - 20, not max_points/2
    assert (~sc["flag"]).sum() > 250         # got more than a half-split
    assert (~sc["flag"]).sum() <= 2 * 380    # still capped near budget


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


# ------------------------------------------------ render layer (r6)
#
# Every renderer accepts an injected axes object and imports
# matplotlib ONLY when none is given — so the render halves are fully
# testable here (no matplotlib in this container) with a recording
# fake that pins WHAT is drawn from WHICH builder columns.


class FakeAxes:
    def __init__(self):
        self.calls = []

    def __getattr__(self, name):
        def rec(*a, **k):
            self.calls.append((name, a, k))
        return rec

    def of(self, name):
        return [c for c in self.calls if c[0] == name]


def test_render_power_curve_flag_series_and_keyed_curves(spark):
    scada = (
        spark.createDataFrame(make_scada(days=4))
        .withColumn("flag", F.col("WTUR_W") < 50.0)
    )
    data = plots.power_curve_plot_data(
        scada, "WMET_HorWdSpd", "WTUR_W",
        keys=["asset_id"], max_points=10**9, flag_col="flag",
    )
    ax = FakeAxes()
    plots.render_power_curve(
        data, ax=ax, ws_col="WMET_HorWdSpd", power_col="WTUR_W",
        flag_col="flag",
    )
    scat = ax.of("scatter")
    assert len(scat) == 2  # one series per flag stratum
    n_pts = sum(len(c[1][0]) for c in scat)
    assert n_pts == len(data["scatter"])
    # one curve line per (asset, flag) group
    lines = ax.of("plot")
    n_groups = data["curve"].groupby(["asset_id", "flag"]).ngroups
    assert len(lines) == n_groups
    assert ax.of("legend") and ax.of("set_xlabel")


def test_render_windfarm_series_and_annotations():
    data = pd.DataFrame({
        "asset_id": ["t1", "t2", "m1"],
        "x_m": [0.0, 500.0, 250.0],
        "y_m": [0.0, 0.0, 100.0],
        "latitude": [0.0] * 3, "longitude": [0.0] * 3,
        "type": ["turbine", "turbine", "tower"],
    })
    ax = FakeAxes()
    plots.render_windfarm(data, ax=ax)
    assert len(ax.of("scatter")) == 2          # turbine + tower series
    assert len(ax.of("annotate")) == 3         # every asset labeled
    assert ax.of("set_aspect")[0][1] == ("equal",)


def test_render_by_id_one_panel_per_asset():
    data = pd.DataFrame({
        "asset_id": ["a", "a", "b"],
        "day": pd.to_datetime(["2024-01-01", "2024-01-02", "2024-01-01"]),
        "v": [1.0, 2.0, 3.0],
    })
    axs = [FakeAxes(), FakeAxes()]
    out = plots.render_by_id(data, "asset_id", "day", "v", axes=axs)
    assert out == axs
    assert list(axs[0].of("plot")[0][1][1]) == [1.0, 2.0]
    assert list(axs[1].of("plot")[0][1][1]) == [3.0]
    assert axs[0].of("set_title")[0][1] == ("a",)
    with pytest.raises(ValueError, match="need 2 axes"):
        plots.render_by_id(data, "asset_id", "day", "v", axes=[FakeAxes()])


def test_render_column_histograms_bar_heights(spark):
    df = spark.range(0, 1000).select(
        (F.col("id") % 10).cast("double").alias("a"),
        (F.col("id") % 3).cast("double").alias("b"),
    )
    data = plots.column_histograms_data(df, ["a", "b"], bins=5)
    axs = [FakeAxes(), FakeAxes()]
    plots.render_column_histograms(data, axes=axs)
    for ax, col in zip(axs, ("a", "b")):
        sub = data[data["column"] == col]
        heights = list(ax.of("bar")[0][1][1])
        assert heights == sub["count"].tolist()
        assert sum(heights) == 1000


def test_render_distribution_and_boxplot():
    rng = np.random.default_rng(5)
    x = rng.normal(10.0, 1.0, 500)
    hist = plots.distribution_plot_data(x, n_bins=12)
    ax = FakeAxes()
    plots.render_distribution(hist, ax=ax, xlabel="AEP (GWh)")
    name, args, kwargs = ax.of("bar")[0]
    assert list(args[1]) == hist["count"].tolist()
    assert list(kwargs["width"]) == (
        (hist["bin_right"] - hist["bin_left"]).tolist()
    )
    assert ax.of("set_xlabel")[0][1] == ("AEP (GWh)",)

    stats = plots.boxplot_stats(x)
    ax2 = FakeAxes()
    plots.render_boxplot(stats, ax=ax2, label="AEP")
    bxp = ax2.of("bxp")[0][1][0][0]
    assert bxp["med"] == stats["median"]
    assert bxp["whislo"] == stats["whisker_low"]
    assert bxp["whishi"] == stats["whisker_high"]
    assert bxp["mean"] == stats["mean"]


def test_render_waterfall_geometry():
    values = [100.0, -5.0, 3.0, 98.0]
    labels = ["eya", "loss_a", "gain_b", "total"]
    data = plots.waterfall_plot_data(values, labels)
    ax = FakeAxes()
    plots.render_waterfall(data, ax=ax)
    name, args, kwargs = ax.of("bar")[0]
    assert list(args[1]) == data["height"].tolist()
    assert list(kwargs["bottom"]) == data["bottom"].tolist()
    # connector levels are the running totals 100, 95, 98
    levels = [c[1][1][0] for c in ax.of("plot")]
    assert levels == [100.0, 95.0, 98.0]


def test_render_monthly_windspeed_lines_per_year():
    data = pd.DataFrame({
        "year": [2020, 2020, 2021, 2021],
        "month": [1, 2, 1, 2],
        "ws": [8.0, 9.0, 10.0, 7.0],
    })
    data["ws_norm"] = data["ws"] / data.groupby("month")["ws"].transform("mean")
    ax = FakeAxes()
    plots.render_monthly_windspeed(data, ax=ax)
    assert len(ax.of("plot")) == 2
    assert list(ax.of("plot")[0][1][1]) == [8.0, 9.0]
    ax2 = FakeAxes()
    plots.render_monthly_windspeed(data, ax=ax2, normalized=True)
    assert list(ax2.of("plot")[0][1][1]) == data[data["year"] == 2020][
        "ws_norm"].tolist()


def test_render_energy_losses_timeseries_panels():
    agg = pd.DataFrame(
        {
            "energy_gwh": [1.0, 2.0],
            "availability_pct": [0.1, 0.2],
        },
        index=pd.Index(pd.to_datetime(["2024-01-01", "2024-02-01"]),
                       name="period"),
    )
    tidy = plots.energy_losses_timeseries_plot_data(agg)
    axs = [FakeAxes(), FakeAxes()]
    plots.render_energy_losses_timeseries(tidy, axes=axs)
    titles = [a.of("set_title")[0][1][0] for a in axs]
    assert titles == ["availability_pct", "energy_gwh"]
    assert list(axs[1].of("plot")[0][1][1]) == [1.0, 2.0]


def test_render_monthly_losses_values():
    scada = pd.Series([100.0, 200.0],
                      index=pd.to_datetime(["2024-01-01", "2024-02-01"]))
    meter = pd.Series([98.0, 190.0], index=scada.index)
    data = plots.monthly_losses_plot_data(scada, meter)
    ax = FakeAxes()
    plots.render_monthly_losses(data, ax=ax)
    got = list(ax.of("plot")[0][1][1])
    assert got == pytest.approx([0.02, 0.05])


def test_render_wake_losses_lines_and_bands():
    data = pd.DataFrame({
        "bin": [0, 1],
        "por_mean": [0.1, 0.2], "por_std": [0.01, 0.02],
        "lt_mean": [0.15, 0.25], "lt_std": [0.03, 0.04],
    })
    ax = FakeAxes()
    plots.render_wake_losses(data, ax=ax)
    assert len(ax.of("plot")) == 2
    bands = ax.of("fill_between")
    assert len(bands) == 2
    lo, hi = bands[0][1][1], bands[0][1][2]
    assert list(lo) == pytest.approx([0.09, 0.18])
    assert list(hi) == pytest.approx([0.11, 0.22])


def test_render_yaw_misalignment_curve_matches_fit():
    from openoa_spark.functions.regression import cos_curve

    points = pd.DataFrame({
        "vane_bin": [-10.0, -5.0, 0.0, 5.0, 10.0],
        "power": [0.8, 0.95, 1.0, 0.93, 0.78],
    })
    params = (1.0, 2.0, 2.0)
    ax = FakeAxes()
    plots.render_yaw_misalignment(points, params, mean_vane=-1.0, ax=ax)
    assert len(ax.of("scatter")) == 1
    grid, curve = ax.of("plot")[0][1]
    assert list(curve) == pytest.approx(
        list(cos_curve(np.asarray(grid), *params))
    )
    vlines = [c[1][0] for c in ax.of("axvline")]
    assert vlines == [2.0, -1.0]  # fitted peak vs mean vane angle


def test_render_daylight_savings_panels():
    data = pd.DataFrame({
        "year": [2024, 2024, 2024],
        "transition": ["spring", "spring", "fall"],
        "time": pd.to_datetime(
            ["2024-03-10 01:00", "2024-03-10 02:00", "2024-11-03 01:00"]
        ),
        "time_utc": pd.to_datetime(
            ["2024-03-10 08:00", "2024-03-10 09:00", "2024-11-03 08:00"]
        ),
        "power": [1.0, 2.0, 3.0],
    })
    axs = [FakeAxes(), FakeAxes()]
    plots.render_daylight_savings(data, "time", "power", axes=axs)
    titles = [a.of("set_title")[0][1][0] for a in axs]
    assert titles == ["2024 fall", "2024 spring"]
    assert list(axs[1].of("plot")[0][1][1]) == [1.0, 2.0]


def test_render_wtk_diurnal_two_series():
    data = pd.DataFrame({
        "hour": [0, 1, 2],
        "ws_norm": [0.9, 1.0, 1.1],
        "power_norm": [0.8, 1.0, 1.2],
    })
    ax = FakeAxes()
    plots.render_wtk_diurnal(data, ax=ax)
    series = [list(c[1][1]) for c in ax.of("plot")]
    assert series == [[0.9, 1.0, 1.1], [0.8, 1.0, 1.2]]
    labels = [c[2].get("label") for c in ax.of("plot")]
    assert labels == ["WTK wind speed", "plant power"]
