"""Deterministic synthetic wind-plant tables for pipeline tests.

Shapes mirror the reference's regression fixture (ENGIE La Haute
Borne: 4 turbines, 10-min SCADA, hourly reanalysis — see
examples/project_ENGIE.py:9-31) at a reduced time span so the suite
stays fast. All randomness is seeded numpy; the same arrays feed both
the Spark inputs and the pandas mini-oracles in tests.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

RATED_KW = 2000.0
TURBINES = ["T01", "T02", "T03", "T04"]
ELEC_LOSS = 0.02


def power_curve(ws: np.ndarray) -> np.ndarray:
    """Smooth logistic curve, cut-in ~3 m/s, rated by ~13 m/s."""
    p = RATED_KW / (1.0 + np.exp(-(ws - 8.0)))
    return np.where(ws < 3.0, 0.0, np.minimum(p, RATED_KW))


def make_asset() -> pd.DataFrame:
    # 4 turbines on an east-west line, 500 m apart, plus one met tower
    rows = []
    for i, t in enumerate(TURBINES):
        rows.append((t, 47.90, 5.10 + i * 0.0067, RATED_KW, 80.0, 100.0, 400.0, "turbine"))
    rows.append(("MT1", 47.905, 5.11, np.nan, 60.0, np.nan, 400.0, "tower"))
    return pd.DataFrame(
        rows,
        columns=["asset_id", "latitude", "longitude", "rated_power",
                 "hub_height", "rotor_diameter", "elevation", "type"],
    )


def make_scada(days: int = 60, seed: int = 42) -> pd.DataFrame:
    rng = np.random.default_rng(seed)
    times = pd.date_range("2019-01-01", periods=days * 144, freq="10min")
    n = len(times)
    hours = np.arange(n) / 6.0
    base_ws = 8.0 + 3.0 * np.sin(2 * np.pi * hours / (24 * 7)) + rng.normal(0, 1.2, n)
    base_wd = (270.0 + 40.0 * np.sin(2 * np.pi * hours / 96) + rng.normal(0, 8, n)) % 360
    frames = []
    for i, t in enumerate(TURBINES):
        ws = np.clip(base_ws + rng.normal(0, 0.4, n) + 0.1 * i, 0.0, None)
        power = power_curve(ws) * (1.0 + rng.normal(0, 0.01, n))
        frames.append(pd.DataFrame({
            "time": times,
            "asset_id": t,
            "WTUR_W": power,
            "WMET_HorWdSpd": ws,
            "WMET_HorWdDir": base_wd,
            "WMET_HorWdDirRel": rng.normal(0, 3, n) + (2.0 if t == "T02" else 0.0),
            "WROT_BlPthAngVal": np.abs(rng.normal(0, 0.5, n)),
            "WMET_EnvTmp": 10.0 + 8.0 * np.sin(2 * np.pi * hours / 24) + rng.normal(0, 1, n),
        }))
    return pd.concat(frames, ignore_index=True)


def make_meter(scada: pd.DataFrame) -> pd.DataFrame:
    plant = (
        scada.groupby("time", as_index=False)["WTUR_W"].sum()
        .rename(columns={"WTUR_W": "power_kw"})
    )
    plant["MMTR_SupWh"] = plant["power_kw"] * (600.0 / 3600.0) * (1.0 - ELEC_LOSS)
    return plant[["time", "MMTR_SupWh"]]


def make_curtail(scada: pd.DataFrame, seed: int = 7) -> pd.DataFrame:
    rng = np.random.default_rng(seed)
    times = np.sort(scada["time"].unique())
    n = len(times)
    return pd.DataFrame({
        "time": times,
        "IAVL_DnWh": np.abs(rng.normal(2.0, 0.5, n)),
        "IAVL_ExtPwrDnWh": np.abs(rng.normal(1.0, 0.3, n)),
    })


def make_reanalysis(
    years: float = 3.0,
    seed: int = 11,
    start: str = "2017-01-01",
    end: str | None = None,
) -> pd.DataFrame:
    rng = np.random.default_rng(seed)
    if end is not None:
        times = pd.date_range(start, end, freq="h")
    else:
        times = pd.date_range(start, periods=int(years * 365.25 * 24), freq="h")
    n = len(times)
    hours = np.arange(n, dtype=float)
    doy = times.dayofyear.to_numpy().astype(float)
    # weekly + annual-seasonal components: the annual one survives
    # monthly averaging, giving the AEP regression a real signal
    ws = np.clip(
        8.0 + 3.0 * np.sin(2 * np.pi * hours / (24 * 7))
        + 1.5 * np.sin(2 * np.pi * doy / 365.25)
        + rng.normal(0, 1.5, n),
        0.05, None,
    )
    wd = (270.0 + 40.0 * np.sin(2 * np.pi * hours / 96) + rng.normal(0, 10, n)) % 360
    u = -ws * np.sin(np.radians(wd))
    v = -ws * np.cos(np.radians(wd))
    temp_k = 283.0 + 10.0 * np.sin(2 * np.pi * hours / (24 * 365.25)) + rng.normal(0, 1, n)
    pres = 101325.0 + rng.normal(0, 300, n)
    return pd.DataFrame({
        "time": times,
        "WMETR_HorWdSpdU": u,
        "WMETR_HorWdSpdV": v,
        "WMETR_EnvTmp": temp_k,
        "WMETR_EnvPres": pres,
    })


def make_aep_tables(
    rean_start: str = "2017-01-01",
    rean_end: str = "2020-03-31 23:00",
    por_start: str = "2019-01-01",
    por_end: str = "2020-03-15",
    avail_frac: float = 0.01,
    curt_frac: float = 0.005,
) -> dict[str, pd.DataFrame]:
    """Meter/curtail derived hourly from the reanalysis wind speed via
    the plant power curve, so monthly energy truly regresses on the
    monthly reanalysis wind speed (the relationship MonteCarloAEP
    estimates)."""
    rean = make_reanalysis(start=rean_start, end=rean_end)
    ws = np.hypot(rean["WMETR_HorWdSpdU"], rean["WMETR_HorWdSpdV"])
    gross_kwh = len(TURBINES) * power_curve(ws.to_numpy())  # 1-hour buckets
    por = (rean["time"] >= por_start) & (rean["time"] <= por_end)
    meter = pd.DataFrame({
        "time": rean.loc[por, "time"],
        "MMTR_SupWh": gross_kwh[por] * (1.0 - ELEC_LOSS - avail_frac - curt_frac),
    })
    curtail = pd.DataFrame({
        "time": rean.loc[por, "time"],
        "IAVL_DnWh": gross_kwh[por] * avail_frac,
        "IAVL_ExtPwrDnWh": gross_kwh[por] * curt_frac,
    })
    return {"reanalysis": rean, "meter": meter, "curtail": curtail,
            "gross_kwh": pd.Series(gross_kwh, index=rean["time"])}


def make_wake_tables(
    days: int = 30, deficit: float = 0.12, seed: int = 23,
    wd_amplitude: float = 28.0,
) -> dict:
    """SCADA with a known synthetic wake structure: turbines sit on an
    east-west line; whenever the wind has a westerly component
    (|wrap180(wd-270)| <= 45) every turbine except the westernmost T01
    sees ``deficit``-reduced wind speed. Reanalysis shares the same
    (ws, wd) generating process over a 3-year span so the long-term
    correction should reproduce the POR loss. Returns the exact truth
    loss computed from the generating arrays.

    ``wd_amplitude=180`` sweeps the wind direction through the FULL
    rose (the reference WakeLosses' wd-binned result assembly assumes
    every 5° bin is populated, as its ENGIE data is — required for the
    pipeline parity test)."""
    rng = np.random.default_rng(seed)

    # ONE hourly weather series for the whole reanalysis span; the
    # scada period is a slice of it — reanalysis and scada observe the
    # same weather (as in reality), so the scada→reanalysis ws mapping
    # is the identity
    rean_times = pd.date_range("2017-01-01", "2019-12-31 23:00", freq="h")
    n = len(rean_times)
    hours = np.arange(n, dtype=float)
    ws_all = np.clip(8.0 + 2.0 * np.sin(2 * np.pi * hours / (24 * 7))
                     + rng.normal(0, 1.0, n), 4.0, 13.0)
    wd_all = (270.0 + wd_amplitude * np.sin(2 * np.pi * hours / 96.0)
              + rng.normal(0, 3, n)) % 360.0

    # scada: 10-min stamps, hourly-constant met (repeat each hour 6x)
    scada_start = pd.Timestamp("2019-06-01")
    i0 = int((scada_start - rean_times[0]) / pd.Timedelta("1h"))
    ws_h = ws_all[i0:i0 + days * 24]
    wd_h = wd_all[i0:i0 + days * 24]
    times = pd.date_range("2019-06-01", periods=days * 144, freq="10min")
    ws = np.repeat(ws_h, 6)
    wd = np.repeat(wd_h, 6)
    waked = np.abs((wd - 270.0 + 180.0) % 360.0 - 180.0) <= 45.0
    frames = []
    actual_sum = potential_sum = 0.0
    for t in TURBINES:
        is_waked = waked & (t != "T01")
        ws_t = np.where(is_waked, ws * (1.0 - deficit), ws)
        p_t = power_curve(ws_t)
        actual_sum += p_t.sum()
        potential_sum += power_curve(ws).sum()
        frames.append(pd.DataFrame({
            "time": times, "asset_id": t, "WTUR_W": p_t,
            "WMET_HorWdSpd": ws_t, "WMET_HorWdDir": wd,
        }))
    scada = pd.concat(frames, ignore_index=True)
    truth_por_loss = 1.0 - actual_sum / potential_sum

    rean = pd.DataFrame({
        "time": rean_times, "WMETR_HorWdSpd": ws_all, "WMETR_HorWdDir": wd_all,
    })
    return {"scada": scada, "asset": make_asset(), "reanalysis": rean,
            "truth_por_loss": truth_por_loss}


def plant_tables(days: int = 60) -> dict[str, pd.DataFrame]:
    scada = make_scada(days)
    return {
        "asset": make_asset(),
        "scada": scada,
        "meter": make_meter(scada),
        "curtail": make_curtail(scada),
        "reanalysis": make_reanalysis(),
    }


def make_end_to_end_plant(
    por_days: int = 730,
    wake_deficit: float = 0.12,
    avail_frac: float = 0.01,
    curt_frac: float = 0.005,
    yaw_offsets: dict[str, float] | None = None,
    seed: int = 99,
) -> dict:
    """ENGIE-shaped coherent plant: ONE hourly weather process drives a
    4-year reanalysis (2017-2020) and a ``por_days`` 10-min SCADA slice
    (from 2019-01-01), with every planted truth known exactly:

    - wake: westerly sector wakes every turbine but T01 by
      ``wake_deficit`` (structure of make_wake_tables);
    - yaw: per-turbine static vane offset, power x cos^2(vane-offset);
    - electrical loss: meter = plant scada energy x (1 - 0.02);
    - availability/curtailment: uniform ``avail_frac``/``curt_frac``
      of potential energy, recorded in the curtail table;
    - AEP: meter energy derives from the same weather as the
      reanalysis, so the monthly regression has a real signal.

    Returns the tables plus the exact truth values from the
    generating arrays.
    """
    yaw_offsets = yaw_offsets or {"T01": 0.0, "T02": 4.0, "T03": -6.0, "T04": 10.0}
    rng = np.random.default_rng(seed)

    rean_times = pd.date_range("2017-01-01", "2020-12-31 23:00", freq="h")
    n = len(rean_times)
    hours = np.arange(n, dtype=float)
    doy = rean_times.dayofyear.to_numpy().astype(float)
    ws_all = np.clip(
        8.0 + 2.0 * np.sin(2 * np.pi * hours / (24 * 7))
        + 1.2 * np.sin(2 * np.pi * doy / 365.25)
        + rng.normal(0, 1.0, n),
        4.0, 13.0,
    )
    wd_all = (270.0 + 28.0 * np.sin(2 * np.pi * hours / 96.0)
              + rng.normal(0, 3, n)) % 360.0
    temp_k = 283.0 + 10.0 * np.sin(2 * np.pi * doy / 365.25) + rng.normal(0, 1, n)
    pres = 101325.0 + rng.normal(0, 300, n)
    rean = pd.DataFrame({
        "time": rean_times,
        "WMETR_HorWdSpd": ws_all,
        "WMETR_HorWdDir": wd_all,
        "WMETR_HorWdSpdU": -ws_all * np.sin(np.radians(wd_all)),
        "WMETR_HorWdSpdV": -ws_all * np.cos(np.radians(wd_all)),
        "WMETR_EnvTmp": temp_k,
        "WMETR_EnvPres": pres,
    })

    # SCADA: 10-min grid over the POR, weather repeated 6x per hour
    scada_start = pd.Timestamp("2019-01-01")
    i0 = int((scada_start - rean_times[0]) / pd.Timedelta("1h"))
    ws_h = ws_all[i0:i0 + por_days * 24]
    wd_h = wd_all[i0:i0 + por_days * 24]
    temp_h = temp_k[i0:i0 + por_days * 24]
    times = pd.date_range(scada_start, periods=por_days * 144, freq="10min")
    # per-10-min jitter on the repeated hourly wind: real SCADA never
    # reports a frozen value 6x in a row, and the TIE pipeline's
    # unresponsive_flag would (correctly!) flag a constant-repeat
    # series wholesale
    ws = np.clip(
        np.repeat(ws_h, 6) + rng.normal(0, 0.2, por_days * 144), 0.05, None
    )
    wd = np.repeat(wd_h, 6)
    temp10 = np.repeat(temp_h, 6) - 273.15
    waked_sector = np.abs((wd - 270.0 + 180.0) % 360.0 - 180.0) <= 45.0

    produced_factor = 1.0 - avail_frac - curt_frac
    frames = []
    actual_sum = potential_unwaked_sum = 0.0
    plant_pot_kw = np.zeros(len(times))
    for t in TURBINES:
        off = yaw_offsets[t]
        vane = np.clip(rng.normal(0.0, 13.0, len(times)), -30.0, 30.0)
        is_waked = waked_sector & (t != "T01")
        ws_t = np.where(is_waked, ws * (1.0 - wake_deficit), ws)
        yaw_factor = np.cos(np.deg2rad(vane - off)) ** 2
        noise = 1.0 + rng.normal(0, 0.005, len(times))
        pot = power_curve(ws_t) * yaw_factor * noise          # potential kW
        pot_free = power_curve(ws) * yaw_factor * noise       # unwaked twin
        actual_sum += pot.sum()
        potential_unwaked_sum += pot_free.sum()
        plant_pot_kw += pot
        frames.append(pd.DataFrame({
            "time": times, "asset_id": t,
            "WTUR_W": pot * produced_factor,
            "WMET_HorWdSpd": ws_t,
            "WMET_HorWdDir": wd,
            "WMET_HorWdDirRel": vane,
            "WROT_BlPthAngVal": np.zeros(len(times)),
            "WMET_EnvTmp": temp10,
        }))
    scada = pd.concat(frames, ignore_index=True)
    truth_wake_por = 1.0 - actual_sum / potential_unwaked_sum

    plant_prod_kwh = plant_pot_kw * produced_factor / 6.0  # per 10-min
    meter = pd.DataFrame({
        "time": times,
        "MMTR_SupWh": plant_prod_kwh * (1.0 - ELEC_LOSS),
    })
    curtail = pd.DataFrame({
        "time": times,
        "IAVL_DnWh": plant_pot_kw * avail_frac / 6.0,
        "IAVL_ExtPwrDnWh": plant_pot_kw * curt_frac / 6.0,
    })
    return {
        "asset": make_asset(),
        "scada": scada,
        "meter": meter,
        "curtail": curtail,
        "reanalysis": rean,
        "yaw_offsets": yaw_offsets,
        "truth_wake_por": truth_wake_por,
        "truth_elec_loss": ELEC_LOSS,
        "truth_avail": avail_frac,
        "truth_curt": curt_frac,
        # long-term annual net energy truth from the generating process:
        # mean produced power over the POR x hours/year, minus the
        # electrical loss the meter sees
        "truth_net_annual_gwh": (
            plant_prod_kwh.mean() * 6.0 * 8766.0 / 1e6 * (1.0 - ELEC_LOSS)
        ),
        "truth_gross_annual_gwh": plant_pot_kw.mean() * 8766.0 / 1e6,
    }
