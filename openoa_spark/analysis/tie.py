"""Turbine long-term gross energy (TIE): filter SCADA per turbine,
daily energy with missing-data correction, cross-turbine correlation
imputation, per-turbine (ws, wd, rho) → energy model, applied to
long-term daily reanalysis.

Parity target (behavior only): openoa/analysis/
turbine_long_term_gross_energy.py:46-565.

Spark-first inversions:
- The reference loops turbines in pandas (scada_dict); here every
  per-turbine step is ONE grouped/windowed DataFrame operation over
  the long (time, asset_id) table — the same plan at 4 or 4,000
  turbines.
- Per-turbine model fitting uses groupBy("asset_id").applyInPandas
  (Arrow-batched); the daily reanalysis table it predicts over is
  bucket-grain (~365×years rows), broadcast through the closure.
- The GAM is the engine's P-spline additive model on raw
  (ws, wd, rho) — the same model CLASS as the reference's pygam
  LinearGAM (Eilers-Marx penalized B-splines with pygam's defaults:
  20 cubic splines/feature, 2nd-order difference penalty, λ=0.6),
  reimplemented in NumPy since pygam is unavailable
  (functions/regression.py:PSplineGAM / gam_3param_fit; reference:
  functions.gam_3param at power_curve/functions.py:153-200).
- Stated model tolerance (pinned by tests/test_regression_gam.py::
  test_pspline_power_curve_deviation_envelope on the reference's own
  power-curve shapes): RMS ≤0.6% of rated, ≤0.5% pointwise away from
  slope discontinuities, ≤5% within ±1.5 m/s of a hard rated-power
  knee — any smooth penalized basis, pygam included, rounds the
  corner. Gross-energy numbers from this pipeline carry that envelope
  on top of statistical recovery.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import DoubleType, StringType, StructField, StructType, TimestampType

from openoa_spark.functions import met
from openoa_spark.functions.regression import gam_3param_fit
from openoa_spark.operators import filters
from openoa_spark.operators.imputing import impute_all_assets_by_correlation
from openoa_spark.operators.timeseries import resample
from openoa_spark.plant import PlantData


@dataclass
class TIEResult:
    plant_gross_gwh: np.ndarray  # one entry per sim (or per product, no-UQ)
    inputs: pd.DataFrame         # per-sim sampled parameters
    turbine_lt_gross: pd.DataFrame | None = None  # last sim: (day × turbine) energy

    @property
    def plant_gross_mean(self) -> float:
        return float(np.mean(self.plant_gross_gwh))


@dataclass
class TurbineLongTermGrossEnergy:
    """Parameters mirror turbine_long_term_gross_energy.py:100-130;
    scalar values are used when UQ=False, (min, max) sampling ranges
    when UQ=True."""

    plant: PlantData
    reanalysis_products: list[str] | None = None
    UQ: bool = False
    num_sim: int = 100
    uncertainty_scada: float = 0.005
    wind_bin_threshold: float | tuple[float, float] = (1.0, 3.0)
    max_power_filter: float | tuple[float, float] = (0.8, 0.9)
    correction_threshold: float | tuple[float, float] = (0.85, 0.95)
    seed: int = 42

    _daily_reanalysis_memo: dict = field(init=False, default_factory=dict)

    def __post_init__(self):
        if self.reanalysis_products is None:
            self.reanalysis_products = sorted(self.plant.reanalysis)
        self._freq_s = self.plant.metadata.scada.frequency_seconds or 600.0
        self._expected_count = 86400.0 / self._freq_s

    # ------------------------------------------------------------ stages

    def filter_turbine_data(
        self, wind_bin_thresh: float, max_power_filter: float
    ) -> DataFrame:
        """All-turbine flagging in one DataFrame pass
        (turbine_long_term_gross_energy.py:330-388): range flag on ws,
        frozen-sensor flag, window flag and per-turbine bin flag with
        rated-power-relative bounds."""
        asset = self.plant.asset.where(F.col("type") == "turbine").select(
            "asset_id", "rated_power"
        )
        df = (
            self.plant.scada
            .dropna(subset=["WMET_HorWdSpd", "WTUR_SupWh"])
            .join(F.broadcast(asset), "asset_id", "inner")
        )
        cap = F.col("rated_power")
        df = df.withColumn(
            "_flag_range", filters.range_flag("WMET_HorWdSpd", 0.0, 40.0)
        ).withColumn(
            "_flag_window",
            F.col("WMET_HorWdSpd").between(5.0, 40.0)
            & ~F.col("WTUR_W").between(0.02 * cap, 1.2 * cap),
        )
        df = filters.unresponsive_flag(
            df, "WMET_HorWdSpd", threshold=3, time_col="time",
            keys=["asset_id"], flag_col="_flag_frozen",
        )
        # per-turbine power bins at 6% of rated power, domain
        # [round(1% cap), round(max_power_filter·cap)) — normalized so
        # one scalar-width grouped aggregate handles every turbine
        df = df.withColumn(
            "_p_norm",
            (F.col("WTUR_W") - F.round(0.01 * cap)) / (0.06 * cap),
        )
        hi = (F.round(F.lit(max_power_filter) * cap) - F.round(0.01 * cap)) / (0.06 * cap)
        df = filters.bin_filter(
            df, bin_col="_p_norm", value_col="WMET_HorWdSpd", bin_width=1.0,
            threshold=wind_bin_thresh, center_type="median", threshold_type="std",
            direction="all", keys=["asset_id"],
            bin_min_col=F.lit(0.0), bin_max_col=hi, flag_col="_flag_bin",
        )
        return df.withColumn(
            "_flag_final",
            F.col("_flag_range") | F.col("_flag_window")
            | F.col("_flag_bin") | F.col("_flag_frozen"),
        ).drop("_p_norm")

    def daily_valid_energy(self, filtered: DataFrame, correction_threshold: float) -> DataFrame:
        """Daily per-turbine sums with missing-data correction; days
        below the reported-data threshold dropped, then gap-spine +
        cross-turbine correlation imputation
        (turbine_long_term_gross_energy.py:419-495)."""
        daily = resample(
            filtered.where(~F.col("_flag_final")),
            "time", "D",
            {"_e": F.sum("WTUR_SupWh"), "_n": F.count("WTUR_SupWh")},
            keys=["asset_id"], bucket_col="day",
        )
        daily = daily.withColumn(
            "energy_corrected", F.col("_e") * F.lit(self._expected_count) / F.col("_n")
        ).where(F.col("_n") >= correction_threshold * self._expected_count)
        # full (day × turbine) spine so imputation sees the gaps
        por = self.plant.scada.agg(
            F.date_trunc("day", F.min("time")).alias("lo"),
            F.date_trunc("day", F.max("time")).alias("hi"),
        ).first()
        spine = (
            self.plant.spark.range(1).select(
                F.explode(
                    F.sequence(F.lit(por["lo"]), F.lit(por["hi"]),
                               F.expr("interval 1 day"))
                ).alias("day")
            ).crossJoin(
                self.plant.asset.where(F.col("type") == "turbine").select("asset_id")
            )
        )
        gapped = spine.join(daily.select("day", "asset_id", "energy_corrected"),
                            ["day", "asset_id"], "left")
        imputed = impute_all_assets_by_correlation(
            gapped, "day", "asset_id", "energy_corrected"
        ).withColumnRenamed("energy_corrected", "energy_imputed")
        return imputed.dropna(subset=["energy_imputed"])

    def daily_reanalysis(self, product: str) -> pd.DataFrame:
        """Daily means of u/v/ws/rho with wd recomputed from the daily
        mean components (turbine_long_term_gross_energy.py:390-416);
        memoized per product. Collected: bucket grain."""
        if product in self._daily_reanalysis_memo:
            return self._daily_reanalysis_memo[product]
        df = self.plant.reanalysis[product]
        cols = set(df.columns)
        if not {"WMETR_HorWdSpdU", "WMETR_HorWdSpdV"} <= cols:
            u, v = met.compute_u_v_components("WMETR_HorWdSpd", "WMETR_HorWdDir")
            df = df.withColumn("WMETR_HorWdSpdU", u).withColumn("WMETR_HorWdSpdV", v)
        agg = resample(
            df, "time", "D",
            {
                "u": F.avg("WMETR_HorWdSpdU"), "v": F.avg("WMETR_HorWdSpdV"),
                "ws": F.avg("WMETR_HorWdSpd"), "rho": F.avg("WMETR_AirDen"),
            },
            bucket_col="day",
        ).withColumn("wd", met.compute_wind_direction("u", "v"))
        pdf = agg.toPandas().set_index("day").sort_index()
        self._daily_reanalysis_memo[product] = pdf
        return pdf

    def fit_and_apply(
        self, scada_valid: DataFrame, product: str, scada_fraction: float
    ) -> DataFrame:
        """Per-turbine model fit + long-term prediction in one
        applyInPandas over groupBy(asset_id)
        (turbine_long_term_gross_energy.py:497-565). Returns
        (asset_id, day, gross) over the full reanalysis span."""
        from openoa_spark.session import ship_package

        ship_package(scada_valid.sparkSession)  # closure refs gam_3param_fit
        rean = self.daily_reanalysis(product)
        rean_reset = rean.reset_index()[["day", "ws", "wd", "rho"]]
        schema = StructType([
            StructField("asset_id", StringType()),
            StructField("day", TimestampType()),
            StructField("gross", DoubleType()),
        ])

        def fit_predict(pdf: pd.DataFrame) -> pd.DataFrame:
            t = pdf["asset_id"].iloc[0]
            merged = pdf.merge(rean_reset, on="day", how="inner").dropna(
                subset=["energy_imputed", "ws", "wd", "rho"]
            )
            if len(merged) < 10:
                return pd.DataFrame(columns=["asset_id", "day", "gross"])
            y = merged["energy_imputed"].to_numpy() * scada_fraction
            model = gam_3param_fit(
                merged["ws"].to_numpy(), merged["wd"].to_numpy(),
                merged["rho"].to_numpy(), y,
            )
            pred = np.maximum(
                model(rean_reset["ws"].to_numpy(), rean_reset["wd"].to_numpy(),
                      rean_reset["rho"].to_numpy()),
                0.0,
            )
            return pd.DataFrame({
                "asset_id": t, "day": rean_reset["day"], "gross": pred,
            })

        return (
            scada_valid.select("asset_id", "day", "energy_imputed")
            .groupBy("asset_id")
            .applyInPandas(fit_predict, schema)
        )

    def plant_gross_from_predictions(self, preds: DataFrame) -> float:
        """Monthly sums per turbine → calendar-month mean → total
        (turbine_long_term_gross_energy.py:536-563), in GWh (input kWh)."""
        monthly = resample(
            preds, "day", "MS", {"e": F.sum("gross")},
            keys=["asset_id"], bucket_col="month",
        )
        cal = monthly.groupBy(
            "asset_id", F.month("month").alias("cal_month")
        ).agg(F.avg("e").alias("e_avg"))
        total = cal.agg(F.sum("e_avg")).first()[0]
        return float(total or 0.0) / 1e6

    # ------------------------------------------------------------ run

    def run(self, num_sim: int | None = None) -> TIEResult:
        rng = np.random.default_rng(self.seed)
        if self.UQ:
            n = num_sim or self.num_sim
            inputs = pd.DataFrame({
                "reanalysis_product": rng.choice(self.reanalysis_products, n),
                "scada_data_fraction": rng.normal(1.0, self.uncertainty_scada, n),
                "wind_bin_thresh": rng.integers(
                    int(self.wind_bin_threshold[0] * 100),
                    int(self.wind_bin_threshold[1] * 100), n) / 100.0,
                "max_power_filter": rng.integers(
                    int(self.max_power_filter[0] * 100),
                    int(self.max_power_filter[1] * 100), n) / 100.0,
                "correction_threshold": rng.integers(
                    int(self.correction_threshold[0] * 100),
                    int(self.correction_threshold[1] * 100), n) / 100.0,
            })
        else:
            def _scalar(v, default):
                return float(v) if np.isscalar(v) else default
            inputs = pd.DataFrame({
                "reanalysis_product": self.reanalysis_products,
                "scada_data_fraction": 1.0,
                "wind_bin_thresh": _scalar(self.wind_bin_threshold, 2.0),
                "max_power_filter": _scalar(self.max_power_filter, 0.85),
                "correction_threshold": _scalar(self.correction_threshold, 0.90),
            })

        gross = np.empty(len(inputs))
        preds = None
        filter_memo: dict = {}
        for i, run in inputs.iterrows():
            fkey = (round(run.wind_bin_thresh, 2), round(run.max_power_filter, 2),
                    round(run.correction_threshold, 2))
            if fkey in filter_memo:
                scada_valid = filter_memo[fkey]
            else:
                filtered = self.filter_turbine_data(
                    run.wind_bin_thresh, run.max_power_filter
                )
                scada_valid = self.daily_valid_energy(
                    filtered, run.correction_threshold
                ).cache()
                filter_memo[fkey] = scada_valid
            preds = self.fit_and_apply(
                scada_valid, run.reanalysis_product, run.scada_data_fraction
            )
            gross[i] = self.plant_gross_from_predictions(preds)
        lt = preds.toPandas() if preds is not None else None
        for df in filter_memo.values():
            df.unpersist()
        return TIEResult(gross, inputs, lt)
