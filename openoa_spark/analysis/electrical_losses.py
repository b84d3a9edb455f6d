"""Electrical-losses analysis: the ratio of turbine-level to
revenue-meter energy over concurrent full-coverage periods.

Parity target (behavior only): openoa/analysis/electrical_losses.py:
36-330. Dataflow: scada → per-timestamp plant sum → daily resample
(sum + count) → keep only days with full expected sample count →
inner-join daily meter → loss = 1 − Σmeter/Σscada. Monte-Carlo UQ
scales both energies by sampled uncertainty fractions — the per-sim
work is scalar arithmetic on the two aggregated sums, so UQ runs as a
driver-side vectorized computation over one pair of Spark-computed
totals (the reference re-loops the whole pandas pipeline 20k times;
here the expensive part is computed once).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, functions as F

from openoa_spark.functions.stats import dsum
from openoa_spark.operators.timeseries import resample


@dataclass
class ElectricalLossResult:
    loss: float
    scada_energy: float
    meter_energy: float
    n_days: int
    loss_samples: list | None = None  # UQ distribution when num_sim > 1


def daily_full_coverage_energy(
    scada: DataFrame,
    time_col: str,
    energy_col: str,
    asset_col: str,
    freq_seconds: float,
    n_turbines: int | None = None,
) -> DataFrame:
    """Daily plant energy over days with complete data coverage.

    Expected samples/day = 86400/freq × n_turbines
    (electrical_losses.py:233-251). Output: (day, scada_kwh, n_obs).
    """
    if n_turbines is None:
        n_turbines = scada.select(asset_col).distinct().count()
    expected = int(round(86400.0 / freq_seconds)) * n_turbines
    daily = resample(
        scada,
        time_col,
        "D",
        {"scada_kwh": dsum(energy_col, scale=6), "n_obs": F.count(energy_col)},
        bucket_col="day",
    )
    return daily.where(F.col("n_obs") == expected)


def electrical_losses(
    scada: DataFrame,
    meter: DataFrame,
    time_col: str = "time",
    scada_energy_col: str = "energy_kwh",
    meter_energy_col: str = "energy_kwh",
    asset_col: str = "asset_id",
    freq_seconds: float = 600.0,
    meter_freq_seconds: float = 600.0,
    num_sim: int = 1,
    uncertainty_scada: float = 0.005,
    uncertainty_meter: float = 0.005,
    seed: int = 42,
) -> ElectricalLossResult:
    """End-to-end electrical losses with optional Monte-Carlo UQ.

    Deterministic core (num_sim=1) matches the reference's no-UQ path
    (electrical_losses.py:276-330). With UQ, per-sim loss =
    1 − (meter·m_f)/(scada·s_f) with m_f, s_f ~ N(1, uncertainty) —
    computed vectorized from the single pair of totals.
    """
    daily_scada = daily_full_coverage_energy(
        scada, time_col, scada_energy_col, asset_col, freq_seconds
    )
    daily_meter = resample(
        meter, time_col, "D", {"meter_kwh": dsum(meter_energy_col, scale=6)},
        bucket_col="day",
    )
    joined = daily_scada.join(daily_meter, "day", "inner")
    totals = joined.agg(
        F.sum("scada_kwh").alias("s"),
        F.sum("meter_kwh").alias("m"),
        F.count("*").alias("n"),
    ).first()
    s, m, n = float(totals["s"] or 0.0), float(totals["m"] or 0.0), int(totals["n"])
    loss = 1.0 - m / s if s else float("nan")
    samples = None
    if num_sim > 1:
        import numpy as np

        rng = np.random.default_rng(seed)
        mf = rng.normal(1.0, uncertainty_meter, num_sim)
        sf = rng.normal(1.0, uncertainty_scada, num_sim)
        samples = (1.0 - (m * mf) / (s * sf)).tolist()
    return ElectricalLossResult(loss, s, m, n, samples)
