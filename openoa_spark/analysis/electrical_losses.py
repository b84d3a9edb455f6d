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

    @property
    def loss_mean(self) -> float:
        import numpy as np

        return float(np.mean(self.loss_samples)) if self.loss_samples else self.loss

    @property
    def loss_std(self) -> float:
        import numpy as np

        return float(np.std(self.loss_samples, ddof=1)) if self.loss_samples else 0.0


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
    monthly_meter: bool = False,
    correction_threshold: float = 0.95,
    uncertainty_correction_threshold: tuple[float, float] = (0.9, 0.995),
    seed: int = 42,
) -> ElectricalLossResult:
    """End-to-end electrical losses with optional Monte-Carlo UQ.

    Deterministic core (num_sim=1) matches the reference's no-UQ path
    (electrical_losses.py:276-330). With UQ, per-sim loss =
    1 − (meter·m_f)/(scada·s_f) with m_f, s_f ~ N(1, uncertainty).

    ``monthly_meter=True`` enables the reference's monthly path
    (electrical_losses.py:287-318): daily scada energy is coverage-
    CORRECTED (×expected/count), rolled up to months, and each
    simulation re-filters months whose coverage percent falls below
    that sim's sampled ``correction_threshold``. The monthly table is
    built once in Spark and collected (#months rows); the per-sim
    refilter is then vectorized driver-side — same semantics as the
    reference's per-sim pandas loop without recomputing the dataflow.
    """
    import numpy as np

    n_turbines = scada.select(asset_col).distinct().count()
    expected_daily = int(round(86400.0 / freq_seconds)) * n_turbines
    daily_all = resample(
        scada, time_col, "D",
        {"scada_kwh": dsum(scada_energy_col, scale=6), "n_obs": F.count(scada_energy_col)},
        bucket_col="day",
    )
    rng = np.random.default_rng(seed)

    if monthly_meter:
        # corrected daily energy → monthly rollup with coverage percent
        monthly_scada = (
            daily_all.withColumn(
                "corrected_kwh",
                F.col("scada_kwh") * expected_daily / F.col("n_obs"),
            )
            .groupBy(F.date_trunc("month", "day").alias("month"))
            .agg(
                F.sum("corrected_kwh").alias("scada_kwh"),
                F.sum("n_obs").alias("n_obs"),
            )
            .withColumn(
                "expected_month",
                F.dayofmonth(F.last_day("month")) * expected_daily,
            )
            .withColumn("percent", F.col("n_obs") / F.col("expected_month"))
        )
        monthly_meter_df = resample(
            meter, time_col, "MS", {"meter_kwh": dsum(meter_energy_col, scale=6)},
            bucket_col="month",
        )
        rows = (
            monthly_scada.join(monthly_meter_df, "month", "inner")
            .select("month", "scada_kwh", "meter_kwh", "percent")
            .toPandas()
        )
        if num_sim > 1:
            # reference threshold sampling: integer grid at the coarser
            # operand's decimal resolution (electrical_losses.py:191-204)
            n_dec = max(
                len(str(el).split(".")[1]) for el in uncertainty_correction_threshold
            )
            mult = 10 ** n_dec
            thresholds = (
                rng.integers(
                    int(uncertainty_correction_threshold[0] * mult),
                    int(uncertainty_correction_threshold[1] * mult),
                    num_sim,
                )
                / mult
            )
            mf = rng.normal(1.0, uncertainty_meter, num_sim)
            sf = rng.normal(1.0, uncertainty_scada, num_sim)
        else:  # no-UQ: unit fractions (reference electrical_losses.py:207-212)
            thresholds = np.array([correction_threshold])
            mf = np.ones(1)
            sf = np.ones(1)
        pct = rows["percent"].to_numpy()
        s_kwh = rows["scada_kwh"].to_numpy()
        m_kwh = rows["meter_kwh"].to_numpy()
        keep = pct[None, :] >= thresholds[:, None]  # (num_sim, n_months)
        s_tot = (keep * s_kwh[None, :]).sum(axis=1) * sf
        m_tot = (keep * m_kwh[None, :]).sum(axis=1) * mf
        with np.errstate(divide="ignore", invalid="ignore"):
            losses = 1.0 - m_tot / s_tot
        if num_sim > 1:
            return ElectricalLossResult(
                float(np.mean(losses)), float(s_tot.mean()), float(m_tot.mean()),
                len(rows), losses.tolist(),
            )
        return ElectricalLossResult(
            float(losses[0]), float(s_tot[0]), float(m_tot[0]), len(rows), None
        )

    # sub-monthly meter: full-coverage days only (threshold plays no
    # role — reference electrical_losses.py:316-318)
    daily_scada = daily_all.where(F.col("n_obs") == expected_daily)
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
        mf = rng.normal(1.0, uncertainty_meter, num_sim)
        sf = rng.normal(1.0, uncertainty_scada, num_sim)
        samples = (1.0 - (m * mf) / (s * sf)).tolist()
    return ElectricalLossResult(loss, s, m, n, samples)
